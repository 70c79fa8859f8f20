"""Resumable partitioned sketch build: checkpoints, lineage, metrics.

The reference has NO checkpointing — a crash loses all in-flight aggregation
state (SURVEY.md §4; fever's only durability is DB table rotation,
/root/reference/db/slurper_postgres.go:174-205).  The north rule requires
jobs that resume from per-partition checkpoints with lineage + metrics
records per partition.  Design:

* partition = one input parquet file (the natural unit of both work and
  re-work; at 100 TB scale files are ~100s of MB and there are ~10^5-10^6 of
  them — each partition's checkpoint is KBs of sketch blobs).
* one streaming pass over all PENDING files:
      read_parquet(pending, include_paths=True)
      → map_batches(partials)                 (stateless, vectorized)
      → groupby([partition, sketch_id]).map_groups(merge)
      → map_batches(write_partition)          (atomic tmp+rename parquet,
                                               then a manifest JSON whose
                                               presence marks DONE)
* resume = skip files whose manifest entry exists; finalize = two-phase
  merge over ALL partition checkpoint files (done + new).
* every partition write emits one lineage record (input path, row count,
  payload digest, sketch ids) and one metrics record (rows, bytes,
  wall seconds) — queryable parquet/JSONL under <out_dir>/.

Atomicity: payload parquet is written to ``*.tmp-<pid>`` then os.rename'd;
the manifest JSON is written LAST (also via rename), so a partition is
"done" only when its outputs are fully on disk.  Re-running a partition is
idempotent (same deterministic partials → same payload digest).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..core.udaf import SketchSpec, make_merge_fn, make_partials_fn
from ..sketches import sketch_from_bytes

PARTITION_COL = "__partition"
# synthetic partial row carrying a batch's true input row count (summed per
# partition); never written to the sketch payload checkpoint
INPUT_ROWS_ID = "__input_rows"


def partition_key(path: str) -> str:
    return hashlib.sha1(path.encode()).hexdigest()[:16]


def _atomic_write(path: str, writer) -> None:
    tmp = f"{path}.tmp-{os.getpid()}"
    writer(tmp)
    os.rename(tmp, path)


class _WritePartition:
    """map_groups sink: one group = all merged partials of one partition."""

    def __init__(self, out_dir: str, sketch_ids: list[str]):
        self.out_dir = out_dir
        self.sketch_ids = sketch_ids

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t0 = time.perf_counter()
        part = group.column(PARTITION_COL)[0].as_py()
        key = partition_key(part)
        payload_path = os.path.join(self.out_dir, "partials", f"{key}.parquet")
        # split off the synthetic input-row-count row: it carries the
        # partition's true INPUT row count (per-sketch 'rows' are non-null
        # counts of the sketched column, which undercount on nully columns)
        is_count = pc.equal(group.column("sketch_id"), INPUT_ROWS_ID)
        count_rows = group.filter(is_count)
        group = group.filter(pc.invert(is_count))
        payload = group.drop_columns([PARTITION_COL])
        _atomic_write(payload_path, lambda p: pq.write_table(payload, p))
        digest = hashlib.sha1(
            b"".join(sorted(group.column("payload").to_pylist()))
        ).hexdigest()
        if count_rows.num_rows:
            rows = int(pa.compute.sum(count_rows.column("rows")).as_py() or 0)
        else:  # pre-synthetic checkpoints: best-effort non-null max
            rows = int(pa.compute.max(group.column("rows")).as_py() or 0)
        nbytes = sum(len(b) for b in group.column("payload").to_pylist())
        manifest = {
            "partition": key,
            "input_path": part,
            "rows": rows,
            "sketch_ids": sorted(set(group.column("sketch_id").to_pylist())),
            "payload_digest": digest,
            "payload_path": payload_path,
            # metrics record
            "metrics": {
                "rows": rows,
                "payload_bytes": nbytes,
                "write_wall_s": round(time.perf_counter() - t0, 6),
            },
        }
        _atomic_write(
            os.path.join(self.out_dir, "manifest", f"{key}.json"),
            lambda p: open(p, "w").write(json.dumps(manifest, sort_keys=True)),
        )
        return pa.table(
            {
                "partition": pa.array([key]),
                "input_path": pa.array([part]),
                "rows": pa.array([rows], type=pa.int64()),
            }
        )


def done_partitions(out_dir: str) -> dict[str, dict]:
    mdir = os.path.join(out_dir, "manifest")
    out = {}
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if f.endswith(".json"):
                with open(os.path.join(mdir, f)) as fh:
                    rec = json.load(fh)
                out[rec["partition"]] = rec
    return out


def run_partitioned_build(
    input_files: list[str],
    specs: list[SketchSpec],
    out_dir: str,
    fanout: int = 64,
    batch_size: int | None = 16384,
    prepare=None,
) -> dict:
    """Build (or resume) per-partition sketch checkpoints, then merge.

    Returns {"sketches": {name: sketch}, "completed": [...],
    "skipped": [...], "lineage": [...]}.
    """
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, "partials"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    done = done_partitions(out_dir)
    # a checkpoint dir is bound to ONE spec set: resuming with different
    # specs would either crash in the finalize merge (removed sketch) or
    # silently return a sketch built only from post-change files (added
    # sketch) — fail loudly instead
    want_ids = sorted(s.name for s in specs)
    for rec in done.values():
        have = sorted(rec.get("sketch_ids", want_ids))
        if have != want_ids:
            raise ValueError(
                f"checkpoint dir {out_dir!r} was built with sketch specs "
                f"{have}, current specs are {want_ids}; use a fresh "
                "checkpoint dir when the spec set changes"
            )
    done_inputs = {rec["input_path"] for rec in done.values()}
    pending = [f for f in input_files if f not in done_inputs]
    completed = []

    if pending:
        ds = rd.read_parquet(pending, include_paths=True)
        base_partials = make_partials_fn(specs, fanout=fanout)

        def partials_with_partition(batch: pa.Table) -> pa.Table:
            # a batch usually covers one file, but map_batches may coalesce
            # blocks across file boundaries — split by path to stay correct
            import pyarrow.compute as pc

            outs = []
            for part in pc.unique(batch.column("path")).to_pylist():
                sub = batch.filter(pc.equal(batch.column("path"), part))
                sub = sub.drop_columns(["path"])
                n_input = sub.num_rows
                if prepare is not None:
                    sub = prepare(sub)
                out = base_partials(sub)
                count_row = pa.table(
                    {
                        "sketch_id": pa.array([INPUT_ROWS_ID], type=pa.string()),
                        "salt": pa.array([0], type=pa.int32()),
                        "payload": pa.array([b""], type=pa.large_binary()),
                        "rows": pa.array([n_input], type=pa.int64()),
                    }
                )
                out = pa.concat_tables([out, count_row])
                outs.append(
                    out.append_column(
                        PARTITION_COL,
                        pa.array([part] * out.num_rows, type=pa.string()),
                    )
                )
            return pa.concat_tables(outs)

        merge = make_merge_fn(specs)

        def merge_keep_partition(group: pa.Table) -> pa.Table:
            part = group.column(PARTITION_COL)[0].as_py()
            sid0 = group.column("sketch_id")[0].as_py()
            if sid0 == INPUT_ROWS_ID:
                # synthetic count rows: sum, don't sketch-merge
                total = int(pa.compute.sum(group.column("rows")).as_py() or 0)
                merged = pa.table(
                    {
                        "sketch_id": pa.array([INPUT_ROWS_ID], type=pa.string()),
                        "salt": pa.array([0], type=pa.int32()),
                        "payload": pa.array([b""], type=pa.large_binary()),
                        "rows": pa.array([total], type=pa.int64()),
                    }
                )
            else:
                merged = merge(group.drop_columns([PARTITION_COL]))
            return merged.append_column(
                PARTITION_COL, pa.array([part] * merged.num_rows, type=pa.string())
            )

        sink_obj = _WritePartition(out_dir, [s.name for s in specs])

        def sink(group: pa.Table) -> pa.Table:
            return sink_obj(group)
        result = (
            ds.map_batches(
                partials_with_partition,
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
            )
            .groupby([PARTITION_COL, "sketch_id"])
            .map_groups(merge_keep_partition, batch_format="pyarrow")
            .groupby(PARTITION_COL)
            .map_groups(sink, batch_format="pyarrow")
        )
        completed = result.take_all()

    # finalize: merge every partition's checkpoint (small blobs)
    done = done_partitions(out_dir)
    kinds = {s.name: s.kind for s in specs}
    acc: dict[str, object] = {}
    for rec in sorted(done.values(), key=lambda r: r["partition"]):
        t = pq.read_table(rec["payload_path"])
        for row in t.to_pylist():
            sid = row["sketch_id"]
            sk = sketch_from_bytes(kinds[sid], row["payload"])
            if sid in acc:
                acc[sid].merge(sk)
            else:
                acc[sid] = sk
    return {
        "sketches": acc,
        "completed": completed,
        "skipped": sorted(done_inputs),
        "lineage": sorted(done.values(), key=lambda r: r["partition"]),
    }


GROUP_INPUT_ROWS_KEY = "__input_rows"


def run_partitioned_grouped_build(
    input_files: list[str],
    key: str,
    spec: SketchSpec,
    out_dir: str,
    fanout: int = 16,
    batch_size: int | None = 16384,
) -> dict:
    """Resumable GROUPED build: per-partition checkpoints of per-key sketch
    rows (the grouped analog of ``run_partitioned_build``).

    Each pending input file streams through the salted grouped-partials
    path; its merged (key, payload) rows land in ONE atomic parquet plus a
    manifest written last, so resume skips finished files exactly like the
    global path.  Finalize merges the per-partition rows per key — the
    checkpoint blobs are O(keys_in_partition * sketch_size), so this is a
    driver loop over KB-sized tables; at unbounded key cardinality, point
    the same partials parquet at a Dataset ``groupby(key)`` merge instead
    (the files are ordinary parquet — nothing here is driver-only).

    Returns {"groups": {key: sketch}, "completed", "skipped", "lineage"}.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from ..core.grouped import make_grouped_merge_fn, make_grouped_partials_fn

    os.makedirs(os.path.join(out_dir, "partials"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    bind = [f"{spec.name}@{key}"]
    done = done_partitions(out_dir)
    for rec in done.values():
        have = rec.get("sketch_ids", bind)
        if have != bind:
            raise ValueError(
                f"grouped checkpoint dir {out_dir!r} was built with {have}, "
                f"current binding is {bind}; use a fresh checkpoint dir"
            )
    done_inputs = {rec["input_path"] for rec in done.values()}
    pending = [f for f in input_files if f not in done_inputs]
    completed = []

    if pending:
        ds = rd.read_parquet(pending, include_paths=True)
        gpartials = make_grouped_partials_fn(spec, key, fanout=fanout)

        def partials_with_partition(batch: pa.Table) -> pa.Table:
            outs = []
            for part in pc.unique(batch.column("path")).to_pylist():
                sub = batch.filter(pc.equal(batch.column("path"), part))
                n_input = sub.num_rows
                out = gpartials(sub.drop_columns(["path"]))
                count_row = pa.table(
                    {
                        "key": pa.array([GROUP_INPUT_ROWS_KEY], type=pa.string()),
                        "salt": pa.array([0], type=pa.int32()),
                        "payload": pa.array([b""], type=pa.large_binary()),
                        "rows": pa.array([n_input], type=pa.int64()),
                    }
                )
                out = pa.concat_tables([out, count_row])
                outs.append(
                    out.append_column(
                        PARTITION_COL,
                        pa.array([part] * out.num_rows, type=pa.string()),
                    )
                )
            return pa.concat_tables(outs)

        merge = make_grouped_merge_fn(spec)

        def merge_keep_partition(group: pa.Table) -> pa.Table:
            part = group.column(PARTITION_COL)[0].as_py()
            if group.column("key")[0].as_py() == GROUP_INPUT_ROWS_KEY:
                total = int(pa.compute.sum(group.column("rows")).as_py() or 0)
                merged = pa.table(
                    {
                        "key": pa.array([GROUP_INPUT_ROWS_KEY], type=pa.string()),
                        "salt": pa.array([0], type=pa.int32()),
                        "payload": pa.array([b""], type=pa.large_binary()),
                        "rows": pa.array([total], type=pa.int64()),
                    }
                )
            else:
                merged = merge(group.drop_columns([PARTITION_COL]))
            return merged.append_column(
                PARTITION_COL, pa.array([part] * merged.num_rows, type=pa.string())
            )

        def sink(group: pa.Table) -> pa.Table:
            t0 = time.perf_counter()
            part = group.column(PARTITION_COL)[0].as_py()
            pkey = partition_key(part)
            is_count = pc.equal(group.column("key"), GROUP_INPUT_ROWS_KEY)
            count_rows = group.filter(is_count)
            group_rows = group.filter(pc.invert(is_count))
            payload = group_rows.drop_columns([PARTITION_COL])
            payload_path = os.path.join(out_dir, "partials", f"{pkey}.parquet")
            _atomic_write(payload_path, lambda p: pq.write_table(payload, p))
            digest = hashlib.sha1(
                b"".join(sorted(group_rows.column("payload").to_pylist()))
            ).hexdigest()
            rows = (
                int(pa.compute.sum(count_rows.column("rows")).as_py() or 0)
                if count_rows.num_rows
                else 0
            )
            manifest = {
                "partition": pkey,
                "input_path": part,
                "rows": rows,
                "sketch_ids": bind,
                "n_keys": payload.num_rows,
                "payload_digest": digest,
                "payload_path": payload_path,
                "metrics": {
                    "rows": rows,
                    "payload_bytes": sum(
                        len(b) for b in group_rows.column("payload").to_pylist()
                    ),
                    "write_wall_s": round(time.perf_counter() - t0, 6),
                },
            }
            _atomic_write(
                os.path.join(out_dir, "manifest", f"{pkey}.json"),
                lambda p: open(p, "w").write(json.dumps(manifest, sort_keys=True)),
            )
            return pa.table(
                {
                    "partition": pa.array([pkey]),
                    "input_path": pa.array([part]),
                    "rows": pa.array([rows], type=pa.int64()),
                }
            )

        completed = (
            ds.map_batches(
                partials_with_partition,
                batch_format="pyarrow",
                batch_size=batch_size,
                zero_copy_batch=True,
            )
            .groupby([PARTITION_COL, "key", "salt"])
            .map_groups(merge_keep_partition, batch_format="pyarrow")
            .groupby([PARTITION_COL, "key"])
            .map_groups(merge_keep_partition, batch_format="pyarrow")
            .groupby(PARTITION_COL)
            .map_groups(sink, batch_format="pyarrow")
            .take_all()
        )

    done = done_partitions(out_dir)
    groups: dict[str, object] = {}
    for rec in sorted(done.values(), key=lambda r: r["partition"]):
        t = pq.read_table(rec["payload_path"])
        for row in t.to_pylist():
            sk = sketch_from_bytes(spec.kind, row["payload"])
            if row["key"] in groups:
                groups[row["key"]].merge(sk)
            else:
                groups[row["key"]] = sk
    return {
        "groups": groups,
        "completed": completed,
        "skipped": sorted(done_inputs),
        "lineage": sorted(done.values(), key=lambda r: r["partition"]),
    }
