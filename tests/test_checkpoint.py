"""Checkpoint/resume semantics (FIXTURES.md F4): interrupted run resumes
without recomputing done partitions; final results identical to an
uninterrupted run; lineage + metrics records per partition."""

import glob
import json
import os

import numpy as np
import pyarrow.compute as pc

from fever_ray.core.udaf import SketchSpec
from fever_ray.io_.checkpoint import done_partitions, run_partitioned_build
from fever_ray.pipelines.flagship import derive_page_columns, run_flagship

SPECS = [
    SketchSpec("hll_urls", "hll", "url", {"p": 12}),
    SketchSpec("cms_langs", "cms", "lang", {"width": 512, "depth": 5}, track=True),
]


def test_resume_skips_done_and_matches_uninterrupted(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    assert len(files) == 4

    # "interrupted" run: only 2 of 4 partitions complete
    ck = str(tmp_path / "ck")
    r1 = run_partitioned_build(files[:2], SPECS, ck, batch_size=256)
    assert len(done_partitions(ck)) == 2

    # resume over the full file list: the 2 done partitions are skipped
    r2 = run_partitioned_build(files, SPECS, ck, batch_size=256)
    completed_inputs = {c["input_path"] for c in r2["completed"]}
    assert completed_inputs == set(files[2:])
    assert len(done_partitions(ck)) == 4

    # uninterrupted control run in a fresh dir → bit-identical sketches
    ck2 = str(tmp_path / "ck2")
    r3 = run_partitioned_build(files, SPECS, ck2, batch_size=256)
    assert np.array_equal(
        r2["sketches"]["hll_urls"].registers, r3["sketches"]["hll_urls"].registers
    )
    assert np.array_equal(
        r2["sketches"]["cms_langs"].table, r3["sketches"]["cms_langs"].table
    )


def test_rerun_is_fully_idempotent(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    ck = str(tmp_path / "ck")
    run_partitioned_build(files, SPECS, ck, batch_size=256)
    digests1 = {k: v["payload_digest"] for k, v in done_partitions(ck).items()}
    r = run_partitioned_build(files, SPECS, ck, batch_size=256)
    assert r["completed"] == []  # nothing recomputed
    digests2 = {k: v["payload_digest"] for k, v in done_partitions(ck).items()}
    assert digests1 == digests2


def test_lineage_and_metrics_records(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    ck = str(tmp_path / "ck")
    r = run_partitioned_build(files, SPECS, ck, batch_size=256)
    assert len(r["lineage"]) == 4
    for rec in r["lineage"]:
        assert rec["input_path"] in files
        assert rec["rows"] > 0
        assert set(rec["sketch_ids"]) == {"hll_urls", "cms_langs"}
        assert len(rec["payload_digest"]) == 40
        assert os.path.exists(rec["payload_path"])
        m = rec["metrics"]
        assert m["rows"] > 0 and m["payload_bytes"] > 0 and m["write_wall_s"] >= 0


def test_checkpointed_flagship_equals_streaming_flagship(ray_session, pages_dir, tmp_path):
    res_stream = run_flagship(pages_dir, batch_size=256)
    res_ck = run_flagship(
        pages_dir, checkpoint_dir=str(tmp_path / "ckf"), batch_size=256
    )
    s1 = {
        r["sketch"]: r for r in res_stream["summary"].to_pylist()
    }
    s2 = {r["sketch"]: r for r in res_ck["summary"].to_pylist()}
    assert set(s1) == set(s2)
    # order-invariant sketches agree exactly; quantile sketches approximately
    for name in ("hll_urls", "hll_hostnames", "cms_hostnames", "cms_langs", "bloom_hostnames"):
        assert s1[name]["estimate"] == s2[name]["estimate"], name
    for name in ("tdigest_html_len", "kll_text_len", "kll_warc_ts"):
        a, b = s1[name]["estimate"], s2[name]["estimate"]
        assert abs(a - b) <= 0.05 * max(abs(a), abs(b)), name


def test_lineage_rows_counts_inputs_not_nonnull(ray_session, tmp_path):
    """Partition 'rows' must be the INPUT row count even when every sketched
    column contains nulls (per-sketch non-null counts undercount)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "url": pa.array(["a", None, "c", None, None, "f"], type=pa.string()),
            "lang": pa.array([None, "en", None, "de", None, "fr"], type=pa.string()),
        }
    )
    src = str(tmp_path / "nully.parquet")
    pq.write_table(t, src)
    r = run_partitioned_build([src], SPECS, str(tmp_path / "ck"), batch_size=256)
    assert len(r["lineage"]) == 1
    assert r["lineage"][0]["rows"] == 6  # not max(3, 3)


def test_cross_job_checkpoint_merge(ray_session, pages_dir, tmp_path, capsys):
    """Two INDEPENDENT partitioned runs over disjoint file sets, merged via
    the cli `merge` path, give register-identical sketches to one run over
    the union — the cross-job mergeability contract (two crawls sketched on
    different days union without re-reading either corpus)."""
    from fever_ray import cli

    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    cka, ckb, cku = (str(tmp_path / d) for d in ("cka", "ckb", "cku"))
    ra = run_partitioned_build(files[:2], SPECS, cka, batch_size=256)
    rb = run_partitioned_build(files[2:], SPECS, ckb, batch_size=256)
    ru = run_partitioned_build(files, SPECS, cku, batch_size=256)

    merged_hll = ra["sketches"]["hll_urls"]
    merged_hll.merge(rb["sketches"]["hll_urls"])
    assert np.array_equal(merged_hll.registers, ru["sketches"]["hll_urls"].registers)
    merged_cms = ra["sketches"]["cms_langs"]
    merged_cms.merge(rb["sketches"]["cms_langs"])
    assert np.array_equal(merged_cms.table, ru["sketches"]["cms_langs"].table)

    # CLI surface: hll_urls in the card equals the union-run estimate
    # (STANDARD_SPECS differ from SPECS — unknown ids warn, hll_urls and
    # cms_langs are shared names so they finalize)
    out = str(tmp_path / "msum")
    rc = cli.main(["merge", "--checkpoints", f"{cka},{ckb}", "--out", out])
    assert rc == 0
    captured = capsys.readouterr().out
    line = json.loads(captured.splitlines()[0])
    assert line["runs"] == 2 and line["partitions"] == 4
    import pyarrow.parquet as pq

    card = pq.read_table(os.path.join(out, "summary.parquet"))
    got = dict(
        zip(card.column("sketch").to_pylist(), card.column("estimate").to_pylist())
    )
    assert abs(got["hll_urls"] - ru["sketches"]["hll_urls"].estimate()) < 1e-9


# ---------------------------------------------------- grouped checkpoints
def test_grouped_checkpoint_resume_and_parity(ray_session, pages_dir, tmp_path):
    """Grouped builds resume exactly like global ones: interrupted run +
    resume yields per-key sketches register-identical to an uninterrupted
    run AND to the non-checkpointed grouped_build path."""
    import glob as _glob

    from fever_ray.core.grouped import grouped_build
    from fever_ray.io_.checkpoint import run_partitioned_grouped_build
    from fever_ray.sketches import sketch_from_bytes

    files = sorted(_glob.glob(pages_dir + "/*.parquet"))
    spec = SketchSpec("hll_urls", "hll", "url", {"p": 12})

    ck = str(tmp_path / "gck")
    run_partitioned_grouped_build(files[:2], "lang", spec, ck, batch_size=256)
    assert len(done_partitions(ck)) == 2
    r2 = run_partitioned_grouped_build(files, "lang", spec, ck, batch_size=256)
    assert {c["input_path"] for c in r2["completed"]} == set(files[2:])
    assert len(done_partitions(ck)) == 4

    ck2 = str(tmp_path / "gck2")
    r3 = run_partitioned_grouped_build(files, "lang", spec, ck2, batch_size=256)
    assert set(r2["groups"]) == set(r3["groups"]) and len(r2["groups"]) >= 2

    import ray.data as rd

    direct = {
        row["key"]: sketch_from_bytes("hll", row["payload"])
        for row in grouped_build(
            rd.read_parquet(files), "lang", spec, batch_size=256
        ).take_all()
    }
    assert set(direct) == set(r2["groups"])
    for k in direct:
        assert np.array_equal(direct[k].registers, r2["groups"][k].registers), k
        assert np.array_equal(direct[k].registers, r3["groups"][k].registers), k

    # lineage: per-partition records with key counts and metrics
    for rec in r2["lineage"]:
        assert rec["sketch_ids"] == ["hll_urls@lang"]
        assert rec["n_keys"] >= 1 and rec["rows"] > 0
        assert os.path.exists(rec["payload_path"])
        assert rec["metrics"]["payload_bytes"] > 0

    # rerun = no-op
    r4 = run_partitioned_grouped_build(files, "lang", spec, ck, batch_size=256)
    assert r4["completed"] == []

    # binding guard: different key or spec name must fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_partitioned_grouped_build(files, "url", spec, ck, batch_size=256)


def test_cli_grouped_merge_equals_union_run(ray_session, pages_dir, tmp_path, capsys):
    """Cross-job GROUPED merge: two runs over disjoint file halves merged
    via `cli merge --grouped hll` must print per-key estimates identical to
    one union run over all files (register merges are bit-identical)."""
    import glob as _glob

    from fever_ray import cli as cli_mod
    from fever_ray.io_.checkpoint import run_partitioned_grouped_build

    files = sorted(_glob.glob(pages_dir + "/*.parquet"))
    spec = SketchSpec("hll_urls", "hll", "url", {"p": 12})
    cka, ckb, cku = (str(tmp_path / d) for d in ("gja", "gjb", "gju"))
    run_partitioned_grouped_build(files[:2], "lang", spec, cka, batch_size=256)
    run_partitioned_grouped_build(files[2:], "lang", spec, ckb, batch_size=256)
    union = run_partitioned_grouped_build(files, "lang", spec, cku, batch_size=256)

    rc = cli_mod.main(["merge", "--checkpoints", f"{cka},{ckb}", "--grouped", "hll"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    head, rows = lines[0], lines[1:]
    assert head["runs"] == 2 and head["keys"] == len(union["groups"])
    for r in rows:
        assert r["estimate"] == union["groups"][r["key"]].estimate(), r["key"]


def test_cli_grouped_merge_quantile_kind_json(ray_session, tmp_path, capsys):
    """`cli merge --grouped tdigest` must print valid JSON: quantile
    finalize payloads carry numpy float scalars, which json.dumps rejects
    without a default= hook (regression test for the default=float fix)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from fever_ray import cli as cli_mod
    from fever_ray.io_.checkpoint import run_partitioned_grouped_build

    rng = np.random.default_rng(7)
    files = []
    for i in range(2):
        t = pa.table(
            {
                "lang": pa.array(["en", "de"] * 100),
                "v": pa.array(rng.normal(100.0, 15.0, 200)),
            }
        )
        f = str(tmp_path / f"vals{i}.parquet")
        _pq.write_table(t, f)
        files.append(f)

    spec = SketchSpec("td_v", "tdigest", "v", {"delta": 100}, value_kind="float")
    ck = str(tmp_path / "gq")
    run_partitioned_grouped_build(files, "lang", spec, ck, batch_size=128)

    rc = cli_mod.main(["merge", "--checkpoints", ck, "--grouped", "tdigest"])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    head, rows = lines[0], lines[1:]
    assert head["keys"] == 2 and {r["key"] for r in rows} == {"en", "de"}
    for r in rows:
        q = r["quantiles"]
        assert q["0.01"] <= q["0.5"] <= q["0.99"]
