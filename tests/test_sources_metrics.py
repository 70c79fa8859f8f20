"""JSONL source parity with parquet, per-stage metrics emission, and
cross-parallelism sketch equality (FIXTURES.md F4: same job at different
num_cpus → identical order-invariant sketch results)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from fever_ray.core.metrics import instrument, load_metrics
from fever_ray.io_.jsonl import read_event_jsonl, write_event_jsonl


def test_jsonl_source_matches_parquet(ray_session, sf_dir, tmp_path):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    path = write_event_jsonl(t, str(tmp_path / "events.jsonl"))
    ds = read_event_jsonl([path])
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    want = t.to_pandas().sort_values("event_id").reset_index(drop=True)[got.columns]
    import pandas as pd

    got["ts"] = pd.to_datetime(got["ts"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_instrumented_stage_emits_metrics(ray_session, sf_dir, tmp_path):
    import ray.data as rd
    import pyarrow.compute as pc

    mdir = str(tmp_path / "metrics")

    def double(batch):
        return batch.append_column("v2", pc.multiply(batch.column("value"), 2.0))

    ds = rd.read_parquet(f"{sf_dir}/events.parquet").map_batches(
        instrument(double, "double_value", mdir), batch_format="pyarrow"
    )
    n = ds.count()
    m = load_metrics(mdir)
    assert m.num_rows >= 1
    assert sum(m.column("rows_in").to_pylist()) == n
    assert all(s == "double_value" for s in m.column("stage").to_pylist())
    assert all(w >= 0 for w in m.column("wall_s").to_pylist())


SUBPROC = """
import ray, json, sys
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from fever_ray.pipelines.flagship import run_flagship
res = run_flagship({pages!r}, batch_size=256)
out = {{r["sketch"]: r["estimate"] for r in res["summary"].to_pylist()
       if not r["sketch"].startswith(("tdigest", "kll", "req"))}}
req = [r["estimate"] for r in res["summary"].to_pylist() if r["sketch"] == "req_text_len"]
print("REQ::" + json.dumps(req))
print("RESULT::" + json.dumps(out, sort_keys=True))
ray.shutdown()
"""


@pytest.mark.slow
def test_same_results_across_parallelism_levels(pages_dir):
    """Order-invariant sketches must be identical at num_cpus=2 and 4 in
    fresh Ray sessions (the distribution-invariance fixture)."""
    results, reqs = [], []
    for ncpu in (2, 4):
        out = subprocess.run(
            [sys.executable, "-c", SUBPROC.format(ncpu=ncpu, pages=pages_dir)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=300,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT::")]
        assert line, out.stderr[-2000:]
        results.append(json.loads(line[0][8:]))
        rline = [l for l in out.stdout.splitlines() if l.startswith("REQ::")]
        reqs.append(json.loads(rline[0][5:])[0])
    # bit-identical merges (hll/cms/bloom/theta/fd/ams/mg/dd) must be EQUAL;
    # compaction sketches (kll/tdigest/req) are order-SENSITIVE within
    # their published bound — req's median must agree to a few ranks
    assert results[0] == results[1]
    assert abs(reqs[0] - reqs[1]) <= 0.05 * max(abs(reqs[0]), abs(reqs[1]), 1.0)


def test_jsonl_null_heavy_ingest_parity(ray_session, tmp_path):
    """Null-heavy / ragged EVE-style ingest (the reference's
    util/testdata/jsonparse_eve_nulls.json pattern): explicit JSON nulls,
    missing keys, and extra unknown keys must all land as proper Arrow
    nulls / be ignored — never strings like 'None' or parse crashes."""
    path = str(tmp_path / "nulls.jsonl")
    lines = [
        # fully-populated row
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7,
         "event_type": "view", "value": 1.5, "props": "{}"},
        # explicit nulls everywhere but the id
        {"event_id": 2, "ts": None, "user_id": None, "event_type": None,
         "value": None, "props": None},
        # missing keys entirely + an unknown nested extra
        {"event_id": 3, "extra": {"deep": None, "x": [1, None]}},
        # null inside a present string field
        {"event_id": 4, "ts": "2024-01-02T03:04:05", "event_type": "click",
         "props": None, "user_id": 9, "value": 0.0},
    ]
    with open(path, "w") as fh:
        for r in lines:
            fh.write(json.dumps(r) + "\n")
    out = (
        read_event_jsonl([path])
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [1, 2, 3, 4]
    import pandas as pd

    # row 2: explicit nulls -> missing values, not "None" strings
    assert pd.isna(out.loc[1, "event_type"]) and pd.isna(out.loc[1, "value"])
    assert pd.isna(out.loc[1, "ts"]) and pd.isna(out.loc[1, "user_id"])
    # row 3: absent keys -> nulls; unknown 'extra' dropped by projection
    assert pd.isna(out.loc[2, "event_type"]) and "extra" not in out.columns
    # row 4: mixed null/non-null within a row
    assert out.loc[3, "event_type"] == "click" and pd.isna(out.loc[3, "props"])
    assert out.loc[0, "value"] == 1.5
