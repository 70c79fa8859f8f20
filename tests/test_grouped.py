"""Grouped sketches: per-key estimates vs exact oracles on the page table."""

import duckdb
import numpy as np
import pytest

from fever_ray.core.udaf import SketchSpec
from fever_ray.core.grouped import grouped_build, grouped_estimates
from fever_ray.sketches import sketch_from_bytes


def _exact(pages_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pages AS SELECT * FROM parquet_scan('{pages_dir}/*.parquet')"
    )
    return con.execute(sql).fetchall()


def test_per_lang_distinct_urls(ray_session, pages_dir):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir + "/")
    spec = SketchSpec("hll_per_lang", "hll", "url", {"p": 12})
    out = grouped_estimates(ds, "lang", spec, batch_size=256)
    got = {k: e for k, e in zip(out.column("key").to_pylist(), out.column("estimate").to_pylist())}
    exact = dict(_exact(pages_dir, "SELECT lang, COUNT(DISTINCT url) FROM pages GROUP BY lang"))
    assert set(got) == set(exact)
    for lang, cnt in exact.items():
        bound = 3 * 1.04 / np.sqrt(1 << 12) * cnt + 2
        assert abs(got[lang] - cnt) <= bound, (lang, got[lang], cnt)


def test_per_lang_quantiles(ray_session, pages_dir):
    import ray.data as rd
    import pyarrow.compute as pc

    ds = rd.read_parquet(pages_dir + "/", columns=["lang", "text"])
    ds = ds.map_batches(
        lambda b: b.append_column(
            "text_len", pc.cast(pc.utf8_length(b.column("text")), "int64")
        ),
        batch_format="pyarrow",
    )
    spec = SketchSpec("kll_per_lang", "kll", "text_len", {"k": 200}, value_kind="float")
    out = grouped_estimates(ds, "lang", spec, quantiles=(0.5,), batch_size=256)
    exact = dict(
        _exact(
            pages_dir,
            "SELECT lang, median(length(text)) FROM pages GROUP BY lang",
        )
    )
    got = dict(zip(out.column("key").to_pylist(), out.column("q50").to_pylist()))
    # per-lang medians within a tolerant rank window (small per-group n)
    for lang in exact:
        lens = [r[0] for r in _exact(pages_dir, f"SELECT length(text) FROM pages WHERE lang='{lang}'")]
        lens = np.sort(np.array(lens, dtype=float))
        r = np.searchsorted(lens, got[lang], side="right") / len(lens)
        assert 0.4 <= r <= 0.6, (lang, got[lang], exact[lang], r)


def test_grouped_rows_accounting(ray_session, pages_dir):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir + "/", columns=["lang", "url"])
    spec = SketchSpec("hll2", "hll", "url", {"p": 10})
    merged = grouped_build(ds, "lang", spec, batch_size=256)
    rows = {r["key"]: r["rows"] for r in merged.take_all()}
    exact = dict(_exact(pages_dir, "SELECT lang, COUNT(*) FROM pages GROUP BY lang"))
    assert rows == exact


def test_cube_rollup_merge_equals_direct(ray_session, pages_dir):
    """Merging finest-grain (lang, host) HLL payloads up the lattice gives
    BYTE-identical register state to a direct one-pass per-lang build — the
    materialized-view property q_sketch_cube relies on (HLL merge = register
    max, associative and order-free)."""
    import ray.data as rd
    import pyarrow as pa
    import pyarrow.compute as pc

    def derive(b: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(b.column("url"), r"^https?://([^/]+)/.*$", r"\1")
        cell = pc.binary_join_element_wise(b.column("lang"), pc.cast(host, "string"), "|")
        return pa.table({"cell": cell, "lang": b.column("lang"), "url": b.column("url")})

    ds = rd.read_parquet(pages_dir + "/", columns=["lang", "url"]).map_batches(
        derive, batch_format="pyarrow"
    )
    fine_spec = SketchSpec("hll_cell", "hll", "url", {"p": 10})
    per_lang: dict = {}
    for r in grouped_build(ds, "cell", fine_spec, batch_size=256).take_all():
        lang = r["key"].split("|", 1)[0]
        sk = sketch_from_bytes("hll", r["payload"])
        if lang in per_lang:
            per_lang[lang].merge(sk)
        else:
            per_lang[lang] = sk

    direct_spec = SketchSpec("hll_lang", "hll", "url", {"p": 10})
    direct = {
        r["key"]: sketch_from_bytes("hll", r["payload"])
        for r in grouped_build(ds, "lang", direct_spec, batch_size=256).take_all()
    }
    assert set(per_lang) == set(direct)
    for lang in direct:
        assert per_lang[lang].to_bytes() == direct[lang].to_bytes(), lang


def test_grouped_lc_estimates(ray_session):
    """lc rides the salted grouped path; per-key distinct estimates within
    the published bound, debt column surfaced."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fever_ray.core.grouped import grouped_estimates
    from fever_ray.core.udaf import SketchSpec

    g = np.array(["a"] * 6000 + ["b"] * 2000)
    k = np.concatenate([np.arange(6000) % 500, np.arange(2000) % 100])
    t = pa.table({"g": pa.array(g.tolist()), "k": pa.array(k, pa.int64())})
    out = grouped_estimates(
        rd.from_arrow(t).repartition(5),
        "g",
        SketchSpec("lc", "lc", "k", {"m": 4096}, value_kind="int"),
    )
    got = {r["key"]: r for r in out.to_pylist()}
    from fever_ray.sketches.lc import LinearCounter

    probe = LinearCounter.create(m=4096)
    assert abs(got["a"]["estimate"] - 500) <= 3 * probe.std_error(500) + 1
    assert abs(got["b"]["estimate"] - 100) <= 3 * probe.std_error(100) + 1
    assert got["a"]["debt"] == 0 and got["a"]["rows"] == 6000
