"""Grouped sketches: one sketch per group key (e.g. per-lang quantiles,
per-hostname distinct counts).

The reference's analogue is the per-key aggregation map guarded by a mutex
(/root/reference/processing/flow_profiler.go:93-107 per app_proto,
dns_aggregator.go:145-168 per rrname).  Here the group key is a shuffle key
— but we NEVER shuffle raw rows by a skewed key.  Instead:

    map_batches → per-(batch, key) partial sketch rows   (tiny)
    groupby([key, salt]) merge                           (phase 1: salted,
                                                          bounded group size
                                                          even for 'en'-like
                                                          hot keys)
    groupby(key) merge                                   (phase 2: ≤ fanout
                                                          partials per key)

Rows leave the input stage as serialized sketch blobs, so a Zipf-heavy key
costs O(fanout · sketch_size), not O(rows-in-key) — the explicit skew
handling the north rule demands.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..sketches import sketch_from_bytes
from .udaf import SketchSpec, _update

GROUP_PARTIAL_SCHEMA = pa.schema(
    [
        ("key", pa.string()),
        ("salt", pa.int32()),
        ("payload", pa.large_binary()),
        ("rows", pa.int64()),
    ]
)


def make_grouped_partials_fn(spec: SketchSpec, key: str, fanout: int = 16):
    """Batch → one partial-sketch row per distinct key in the batch."""

    def partials(batch: pa.Table) -> pa.Table:
        # null group keys are DROPPED (documented): stringifying them would
        # merge a null group with rows whose key is the literal 'None'
        keycol = batch.column(key)
        if isinstance(keycol, pa.ChunkedArray):
            keycol = keycol.combine_chunks()
        if keycol.null_count:
            valid = keycol.is_valid()
            batch = batch.filter(valid)
            keycol = keycol.filter(valid)
        keys_np = keycol.to_numpy(zero_copy_only=False).astype(object)
        uniq, inverse = np.unique(keys_np.astype(str), return_inverse=True)
        col = batch.column(spec.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out_keys, out_salts, out_payloads, out_rows = [], [], [], []
        for gi, kval in enumerate(uniq):
            mask = inverse == gi
            sk = spec.make()
            sub = col.filter(pa.array(mask))
            if spec.value_kind == "float":
                vals = sub.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
            elif spec.value_kind == "int":
                vals = sub.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
            else:
                vals = sub.drop_null()
            _update(sk, spec, vals)
            blob = sk.to_bytes()
            out_keys.append(str(kval))
            out_salts.append(zlib.crc32(blob) % fanout)
            out_payloads.append(blob)
            out_rows.append(len(vals))
        return pa.table(
            {
                "key": pa.array(out_keys, type=pa.string()),
                "salt": pa.array(out_salts, type=pa.int32()),
                "payload": pa.array(out_payloads, type=pa.large_binary()),
                "rows": pa.array(out_rows, type=pa.int64()),
            }
        )

    return partials


def make_grouped_merge_fn(spec: SketchSpec):
    def merge(group: pa.Table) -> pa.Table:
        kval = group.column("key")[0].as_py()
        payloads = group.column("payload").to_pylist()
        acc = sketch_from_bytes(spec.kind, payloads[0])
        for blob in payloads[1:]:
            acc.merge(sketch_from_bytes(spec.kind, blob))
        blob = acc.to_bytes()
        return pa.table(
            {
                "key": pa.array([kval], type=pa.string()),
                "salt": pa.array([0], type=pa.int32()),
                "payload": pa.array([blob], type=pa.large_binary()),
                "rows": pa.array(
                    [int(pa.compute.sum(group.column("rows")).as_py() or 0)],
                    type=pa.int64(),
                ),
            }
        )

    return merge


def grouped_build(ds, key: str, spec: SketchSpec, fanout: int = 16, batch_size: int | None = 16384):
    """Returns a (small) Dataset of merged per-key sketch rows."""
    partials = ds.map_batches(
        make_grouped_partials_fn(spec, key, fanout=fanout),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    merge = make_grouped_merge_fn(spec)
    phase1 = partials.groupby(["key", "salt"]).map_groups(merge, batch_format="pyarrow")
    return phase1.groupby("key").map_groups(merge, batch_format="pyarrow")


def grouped_estimates(
    ds,
    key: str,
    spec: SketchSpec,
    quantiles=(0.5, 0.99),
    fanout: int = 16,
    batch_size: int | None = 16384,
) -> pa.Table:
    """grouped_build + finalize into a flat estimates table (driver-side; the
    merged per-key rows are tiny — one row per distinct key)."""
    merged = grouped_build(ds, key, spec, fanout=fanout, batch_size=batch_size)
    keys, cols = [], {}
    rows_out: list[dict] = []
    for row in merged.take_all():
        sk = sketch_from_bytes(spec.kind, row["payload"])
        rec = {"key": row["key"], "rows": row["rows"]}
        if spec.kind == "hll":
            rec["estimate"] = sk.estimate()
        elif spec.kind == "cms":
            rec["total"] = sk.total
        elif spec.kind in ("tdigest", "kll", "req", "dd"):
            for q in quantiles:
                rec[f"q{int(q * 100):02d}"] = float(sk.quantile(q))
        elif spec.kind == "lc":
            rec["estimate"] = sk.estimate()
            rec["debt"] = sk.debt
        rows_out.append(rec)
    rows_out.sort(key=lambda r: r["key"])
    if not rows_out:
        return pa.table({"key": pa.array([], type=pa.string())})
    for k in rows_out[0]:
        cols[k] = [r[k] for r in rows_out]
    return pa.table(cols)
