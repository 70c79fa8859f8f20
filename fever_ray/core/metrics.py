"""Per-stage metrics emission — the PerformanceStatsEncoder analog
(/root/reference/util/performance_stats_encoder.go:18-80: structs → influx
line protocol, rate-limited submission).

``instrument(fn, stage, out_dir)`` wraps a map_batches function so every
batch appends one metrics record (stage, rows, bytes, wall seconds, pid)
to a per-worker JSONL file under ``out_dir`` — no cross-worker contention
(one file per pid), readable afterwards as a metrics table via
``load_metrics``.  Checkpointed builds additionally emit per-partition
lineage+metrics in their manifests (io_.checkpoint)."""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa


def instrument(fn, stage: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)

    def wrapped(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        out = fn(batch)
        rec = {
            "stage": stage,
            "rows_in": batch.num_rows,
            "rows_out": out.num_rows,
            "bytes_in": batch.nbytes,
            "wall_s": round(time.perf_counter() - t0, 6),
            "pid": os.getpid(),
        }
        with open(os.path.join(out_dir, f"metrics-{os.getpid()}.jsonl"), "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        return out

    wrapped.__name__ = f"instrumented_{stage}"
    return wrapped


def load_metrics(out_dir: str) -> pa.Table:
    rows = []
    if os.path.isdir(out_dir):
        for f in sorted(os.listdir(out_dir)):
            if f.startswith("metrics-") and f.endswith(".jsonl"):
                with open(os.path.join(out_dir, f)) as fh:
                    rows += [json.loads(line) for line in fh if line.strip()]
    return pa.Table.from_pylist(rows)
