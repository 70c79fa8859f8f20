"""Sinks: rotated (time-partitioned) parquet output and resumable
row-transform writes.

The reference's DB posture is bulk COPY into hourly-rotated unlogged tables
with deferred indexing and a size cap (/root/reference/db/
slurper_postgres.go:164-236, db/sql.go:48-61).  The batch-engine equivalents:

* ``rotated_write``   — time-bucket partitioned parquet directories
  (rotation ≈ partition pruning; "index later" ≈ parquet footer stats).
* ``resumable_transform_write`` — per-input-file transform→write with the
  same atomic manifest protocol as the sketch checkpoints: rerun skips
  finished partitions, so a failed 100 TB job never repeats finished work.
* ``expire_partitions`` — total-size-capped retention (the 500 GB cap,
  slurper_postgres.go:107-143): drop oldest partitions beyond the cap.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .checkpoint import _atomic_write, done_partitions, partition_key


def rotated_write(ds, out_dir: str, ts_col: str = "ts", bucket_s: int = 3600):
    """Write with time-bucket partition dirs: <out_dir>/bucket=<epoch>/..."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())
        b = pc.multiply(
            pc.divide(epoch, pa.scalar(bucket_s * 1_000_000, type=pa.int64())),
            pa.scalar(bucket_s, type=pa.int64()),
        )
        return batch.append_column("bucket", b)

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def expire_partitions(out_dir: str, max_total_bytes: int) -> list[str]:
    """Drop oldest bucket partitions until total size fits the cap.
    Returns removed partition dirs (oldest-first by bucket value)."""
    parts = []
    for name in os.listdir(out_dir):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name.startswith("bucket="):
            size = sum(
                os.path.getsize(os.path.join(p, f)) for f in os.listdir(p)
            )
            parts.append((int(name.split("=", 1)[1]), p, size))
    parts.sort()
    total = sum(s for _, _, s in parts)
    removed = []
    for _, p, size in parts:
        if total <= max_total_bytes:
            break
        for f in os.listdir(p):
            os.remove(os.path.join(p, f))
        os.rmdir(p)
        removed.append(p)
        total -= size
    return removed


def resumable_transform_write(
    input_files: list[str],
    transform,
    out_dir: str,
    batch_size: int | None = 16384,
) -> dict:
    """Apply ``transform(batch)->batch`` to each input file and write one
    output parquet per input, atomically, with a manifest entry per
    partition (presence = done).  Rerun skips finished partitions.
    """
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    done = done_partitions(out_dir)
    done_inputs = {rec["input_path"] for rec in done.values()}
    pending = [f for f in input_files if f not in done_inputs]
    completed = []

    if pending:
        ds = rd.read_parquet(pending, include_paths=True)

        def per_batch(batch: pa.Table) -> pa.Table:
            outs = []
            for part in pc.unique(batch.column("path")).to_pylist():
                sub = batch.filter(pc.equal(batch.column("path"), part))
                out = transform(sub.drop_columns(["path"]))
                outs.append(
                    out.append_column(
                        "__partition", pa.array([part] * out.num_rows, type=pa.string())
                    )
                )
            return pa.concat_tables(outs)

        def write_partition(group: pa.Table) -> pa.Table:
            part = group.column("__partition")[0].as_py()
            key = partition_key(part)
            payload = group.drop_columns(["__partition"])
            path = os.path.join(out_dir, "parts", f"{key}.parquet")
            _atomic_write(path, lambda p: pq.write_table(payload, p))
            manifest = {
                "partition": key,
                "input_path": part,
                "rows": payload.num_rows,
                "payload_path": path,
                "payload_digest": "",
                "sketch_ids": [],
                "metrics": {"rows": payload.num_rows, "payload_bytes": payload.nbytes},
            }
            _atomic_write(
                os.path.join(out_dir, "manifest", f"{key}.json"),
                lambda p: open(p, "w").write(json.dumps(manifest, sort_keys=True)),
            )
            return pa.table(
                {"partition": pa.array([key]), "rows": pa.array([payload.num_rows])}
            )

        completed = (
            ds.map_batches(per_batch, batch_format="pyarrow", batch_size=batch_size)
            .groupby("__partition")
            .map_groups(write_partition, batch_format="pyarrow")
            .take_all()
        )

    return {"completed": completed, "skipped": sorted(done_inputs)}


def plan_range_splitters(ds, col: str, n_parts: int, k: int = 400) -> list[float]:
    """ONE streaming KLL pass over ``col`` → n_parts-1 balanced splitter
    values.  Rank error ε ≈ O(1/k) means each resulting range holds
    n/n_parts ± ε·n rows — the sketch-planned answer to "repartition 100 TB
    by value without sorting it first".  Duplicate splitters (heavy single
    values) collapse, so the realized layout may have fewer, wider parts."""
    from ..core.udaf import SketchSpec, build_sketches

    spec = SketchSpec("kll_split", "kll", col, {"k": k}, value_kind="float")
    sk = build_sketches(ds, [spec])["kll_split"]
    raw = [sk.quantile(i / n_parts) for i in range(1, n_parts)]
    out: list[float] = []
    for v in raw:
        if not out or v > out[-1]:
            out.append(float(v))
    return out


def range_partitioned_write(
    ds,
    col: str,
    out_dir: str,
    n_parts: int = 16,
    splitters: list[float] | None = None,
):
    """Balanced value-RANGE partition layout: <out_dir>/range_id=<i>/...

    Completes the sink triad — `rotated_write` partitions by time,
    `resumable_transform_write` by input shard, this by VALUE RANGE — the
    layout a distributed merge-join or range-pruned scan consumes.  The
    split plan costs one KLL sketch pass (no sort, no shuffle of the
    payload beyond the partitioned write itself); splitters land in
    ``_splitters.json`` so readers can prune ranges by predicate and a
    rerun can reuse the exact plan.  Range i holds the half-open interval
    [splitters[i-1], splitters[i]) — searchsorted side="right", so a value
    equal to a splitter lands in the HIGHER range.  Returns
    {"splitters", "manifest"}.
    """
    import numpy as np

    if splitters is None:
        splitters = plan_range_splitters(ds, col, n_parts)
    edges = np.asarray(splitters, dtype=np.float64)

    def add_range(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(edges, v, side="right").astype(np.int64)
        return batch.append_column("range_id", pa.array(rid, pa.int64()))

    ds.map_batches(add_range, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["range_id"]
    )
    manifest = {"column": col, "splitters": [float(s) for s in edges]}
    _atomic_write(
        os.path.join(out_dir, "_splitters.json"),
        lambda p: open(p, "w").write(json.dumps(manifest, sort_keys=True)),
    )
    return {"splitters": manifest["splitters"], "manifest": manifest}


def prune_range_dirs(out_dir: str, lo: float | None = None, hi: float | None = None) -> list[str]:
    """Reader-side predicate pruning over a `range_partitioned_write`
    layout: which range dirs can contain values in the inclusive [lo, hi]?
    Uses only `_splitters.json` — no parquet footer is opened.  None bounds
    are unbounded.  Returns existing dir paths, range order."""
    import numpy as np

    with open(os.path.join(out_dir, "_splitters.json")) as fh:
        edges = np.asarray(json.load(fh)["splitters"], dtype=np.float64)
    # range i covers [edges[i-1], edges[i]) — mirror the writer's
    # searchsorted(side="right") assignment exactly
    first = 0 if lo is None else int(np.searchsorted(edges, lo, side="right"))
    last = len(edges) if hi is None else int(np.searchsorted(edges, hi, side="right"))
    out = []
    for rid in range(first, last + 1):
        p = os.path.join(out_dir, f"range_id={rid}")
        if os.path.isdir(p):
            out.append(p)
    return out
