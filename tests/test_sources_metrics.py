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
       if not r["sketch"].startswith(("tdigest", "kll"))}}
print("RESULT::" + json.dumps(out, sort_keys=True))
ray.shutdown()
"""


@pytest.mark.slow
def test_same_results_across_parallelism_levels(pages_dir):
    """Order-invariant sketches must be identical at num_cpus=2 and 4 in
    fresh Ray sessions (the distribution-invariance fixture)."""
    results = []
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
    assert results[0] == results[1]
