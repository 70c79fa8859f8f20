"""Sketch-build driver: the engine's replacement for fever's handler/
aggregator core (/root/reference/processing/handler_dispatcher.go:26-171 and
the per-handler mutex-guarded aggregation maps).

Where fever dispatches every event through a single goroutine into N stateful
handlers, we compute ALL requested sketches in ONE streaming pass:

    ds.map_batches(partials_fn)          # stateless tasks, one tiny partial
                                         # row per (block-batch, sketch)
      .groupby(["sketch_id", "salt"])    # phase-1 merge (bounded fan-in,
      .map_groups(merge)                 #   skew-proof: payload-hash salt)
      .groupby("sketch_id").map_groups(merge)   # phase-2 final merge
      → dict[name, Sketch]               # tiny driver-side result

Merges are associative (bit-identical for HLL/CMS/Bloom; within published
bound for quantile sketches), so partial order — and therefore Ray's
scheduling — cannot change results.

At 10^12-doc scale the two-phase merge bounds any single merge group to
``fanout`` payloads (HLL p14 partial = 16 KiB → a group is ≤ fanout·16 KiB),
so the shuffle moves only KBs per block regardless of input size.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

from ..sketches import SKETCH_TYPES, sketch_from_bytes
from ..sketches.bloom import BloomFilter
from ..sketches.cms import CountMin
from ..sketches.ams import AMSSketch
from ..sketches.fd import FrequentDirections
from ..sketches.hll import HyperLogLog
from ..sketches.kll import KLL
from ..sketches.mg import MisraGries
from ..sketches.tdigest import TDigest
from ..sketches.theta import ThetaSketch

PARTIAL_SCHEMA = pa.schema(
    [
        ("sketch_id", pa.string()),
        ("salt", pa.int32()),
        ("payload", pa.large_binary()),
        ("rows", pa.int64()),
    ]
)


@dataclass
class SketchSpec:
    """One sketch over one input column.

    value_kind: 'string' (hash bytes), 'int' (hash the int64 directly),
    'float' (numeric quantile sketches), 'vec' (list<float> embedding
    column as a 2D float64 matrix — the FD matrix sketch).  ``params`` go to the sketch
    constructor (``create``/``initialize``).
    """

    name: str
    kind: str  # hll | cms | tdigest | kll | bloom
    column: str
    params: dict = field(default_factory=dict)
    value_kind: str = "string"
    track: bool = False  # CMS: keep exact candidate keys for top-k

    def make(self):
        cls = SKETCH_TYPES[self.kind]
        if self.kind == "bloom":
            return BloomFilter.initialize(
                self.params.get("n", 1_000_000), self.params.get("p", 1e-6)
            )
        return cls.create(**self.params)

    # theta sketches join the generic update path below


def _column_values(batch: pa.Table, spec: SketchSpec):
    col = batch.column(spec.column)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if spec.value_kind == "vec":
        col = col.drop_null()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return np.zeros((0, 0), dtype=np.float64)
        if isinstance(col, pa.FixedSizeListArray):
            d = col.type.list_size
            flat = col.flatten().to_numpy(zero_copy_only=False)
        else:
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            if not (widths == widths[0]).all():
                raise ValueError(f"{spec.column}: ragged embedding lengths")
            d = int(widths[0])
            flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, d)
    if spec.value_kind == "float":
        return col.drop_null().to_numpy(zero_copy_only=False).astype(np.float64)
    if spec.value_kind == "int":
        return col.drop_null().to_numpy(zero_copy_only=False).astype(np.int64)
    return col.drop_null()


def _update(sketch, spec: SketchSpec, values) -> None:
    if spec.kind == "hll":
        if spec.value_kind == "int":
            sketch.update_ints(values)
        else:
            sketch.update(values)
    elif spec.kind == "cms":
        sketch.update(values, track=spec.track)
    elif spec.kind in ("tdigest", "kll", "req", "dd"):
        sketch.update(values)
    elif spec.kind == "bloom":
        sketch.add(values)
    elif spec.kind == "fd":
        sketch.update(values)
    elif spec.kind == "mg":
        sketch.update(values)
    elif spec.kind == "ams":
        if spec.value_kind == "int":
            sketch.update_ints(values)
        else:
            sketch.update(values)
    elif spec.kind == "theta":
        if spec.value_kind == "int":
            sketch.update_ints(values)
        else:
            sketch.update(values)
    elif spec.kind == "dcms":
        sketch.update(values)
    elif spec.kind == "cbf":
        sketch.add(values)
    elif spec.kind == "lc":
        if spec.value_kind == "int":
            sketch.add_ints(values)
        else:
            sketch.add(values)
    else:
        raise ValueError(spec.kind)


def make_partials_fn(specs: list[SketchSpec], fanout: int = 64):
    """Stateless map_batches function: batch → one partial row per sketch.

    The salt is a pure function of the payload bytes (crc32 % fanout): no
    wall clock, no task identity → deterministic and resume-safe.
    """

    def partials(batch: pa.Table) -> pa.Table:
        from ..sketches.hashing import fnv_pair, splitmix64

        ids, salts, payloads, rows = [], [], [], []
        # hash-reuse: each string column is FNV-hashed ONCE per batch and the
        # pair feeds every hashing sketch over that column (bit-identical
        # with the per-sketch update paths; asserted in tests)
        col_cache: dict[str, tuple] = {}
        for spec in specs:
            sk = spec.make()
            if spec.value_kind == "string" and spec.kind in ("hll", "cms", "bloom"):
                if spec.column not in col_cache:
                    vals = _column_values(batch, spec)
                    col_cache[spec.column] = (vals, *fnv_pair(vals))
                vals, h1, h2 = col_cache[spec.column]
                if spec.kind == "hll":
                    sk.update_hashes(splitmix64(h2))
                elif spec.kind == "cms":
                    sk.update_from_fnv(h2, values=vals if spec.track else None, track=spec.track)
                else:
                    sk.add_hashes(h1, h2)
            else:
                vals = _column_values(batch, spec)
                _update(sk, spec, vals)
            blob = sk.to_bytes()
            ids.append(spec.name)
            salts.append(zlib.crc32(blob) % fanout)
            payloads.append(blob)
            rows.append(len(vals))
        return pa.table(
            {
                "sketch_id": pa.array(ids, type=pa.string()),
                "salt": pa.array(salts, type=pa.int32()),
                "payload": pa.array(payloads, type=pa.large_binary()),
                "rows": pa.array(rows, type=pa.int64()),
            }
        )

    return partials


def make_merge_fn(specs: list[SketchSpec]):
    """Batch/group merge: merges every sketch_id present in the table down to
    one row each.  Associativity makes it valid for ANY grouping of partials
    — a keyed group (map_groups) or an arbitrary coalesced block
    (map_batches) alike."""
    kinds = {s.name: s.kind for s in specs}

    def merge(group: pa.Table) -> pa.Table:
        sids = group.column("sketch_id").to_pylist()
        payloads = group.column("payload").to_pylist()
        rows = group.column("rows").to_pylist()
        accs: dict[str, Any] = {}
        rowsum: dict[str, int] = {}
        for sid, blob, r in zip(sids, payloads, rows):
            sk = sketch_from_bytes(kinds[sid], blob)
            if sid in accs:
                accs[sid].merge(sk)
                rowsum[sid] += r
            else:
                accs[sid] = sk
                rowsum[sid] = r
        out_ids = sorted(accs)
        blobs = [accs[s].to_bytes() for s in out_ids]
        return pa.table(
            {
                "sketch_id": pa.array(out_ids, type=pa.string()),
                "salt": pa.array(
                    [zlib.crc32(b) % 2**31 for b in blobs], type=pa.int32()
                ),
                "payload": pa.array(blobs, type=pa.large_binary()),
                "rows": pa.array([rowsum[s] for s in out_ids], type=pa.int64()),
            }
        )

    return merge


def build_sketches(
    ds,
    specs: list[SketchSpec],
    fanout: int = 64,
    batch_size: int | None = 16384,
    merge_strategy: str = "coalesce",
) -> dict[str, Any]:
    """Run the full partial→merge pipeline; returns {name: sketch}.

    ``ds`` is any ray.data.Dataset containing the spec columns.  The input
    stream is consumed ONCE for all sketches.

    merge_strategy:
      * "coalesce" (default): associativity means NO key shuffle is needed to
        merge global sketches — partials are coalesced into ``fanout`` blocks
        (narrow repartition, no sort), merged per block, then coalesced to
        one block for the final merge.  Two narrow exchanges of KB-sized
        rows; at 10^12-doc scale each merge task still sees ≤ ~partials/fanout
        payloads.
      * "groupby": the salted two-phase groupby/map_groups path (a real
        keyed shuffle with skew-proof salting) — same result bit-for-bit for
        order-invariant sketches; kept for parity/verification and as the
        template the *grouped* (per-key) sketches genuinely need.
    """
    partials = ds.map_batches(
        make_partials_fn(specs, fanout=fanout),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    merge = make_merge_fn(specs)
    if merge_strategy == "coalesce":
        # block-bundled tree merge: map_batches with a row-count batch_size
        # bundles consecutive partial blocks into merge tasks — no
        # repartition, no sort, no blob re-splitting.  Two levels bound the
        # driver-side remainder to ≤ ~(partials/bundle²)·n_specs tiny rows.
        bundle = max(fanout, 8) * max(len(specs), 1)
        phase1 = partials.map_batches(merge, batch_format="pyarrow", batch_size=bundle)
        # second distributed level so the driver-side remainder really is
        # ≤ ~(partials/bundle²)·n_specs rows (one level would pull
        # partials/bundle payload rows into take_all at large scale)
        phase2 = phase1.map_batches(merge, batch_format="pyarrow", batch_size=bundle)
        remainder = pa.Table.from_pylist(
            phase2.take_all(), schema=PARTIAL_SCHEMA
        )
        acc = merge_partial_tables([remainder], specs)
        return acc
    elif merge_strategy == "groupby":
        phase1 = partials.groupby(["sketch_id", "salt"]).map_groups(
            merge, batch_format="pyarrow"
        )
        final_rows = (
            phase1.groupby("sketch_id").map_groups(merge, batch_format="pyarrow").take_all()
        )
    else:
        raise ValueError(merge_strategy)
    out = {}
    for row in final_rows:
        spec = next(s for s in specs if s.name == row["sketch_id"])
        out[spec.name] = sketch_from_bytes(spec.kind, row["payload"])
    return out


def merge_partial_tables(tables: list[pa.Table], specs: list[SketchSpec]) -> dict[str, Any]:
    """Driver-side merge of partial tables (used by the checkpoint/resume
    path, where per-partition partials are read back from parquet)."""
    kinds = {s.name: s.kind for s in specs}
    acc: dict[str, Any] = {}
    for t in tables:
        for row in t.to_pylist():
            sid = row["sketch_id"]
            sk = sketch_from_bytes(kinds[sid], row["payload"])
            if sid in acc:
                acc[sid].merge(sk)
            else:
                acc[sid] = sk
    return acc


def finalize(sketch, spec: SketchSpec, quantiles=(0.01, 0.25, 0.5, 0.75, 0.99)) -> dict:
    """Human/table-friendly summary of one finished sketch."""
    if spec.kind == "hll":
        return {"estimate": sketch.estimate(), "rse": sketch.relative_error}
    if spec.kind == "cms":
        top = sketch.top_k(10) if sketch.candidates else []
        return {"total": sketch.total, "top_k": top, "epsilon": sketch.epsilon}
    if spec.kind in ("tdigest", "kll", "req", "dd"):
        return {"quantiles": {str(q): float(sketch.quantile(q)) for q in quantiles}}
    if spec.kind == "bloom":
        return {"N": sketch.N, "fill_ratio": sketch.fill_ratio}
    if spec.kind == "theta":
        return {"estimate": sketch.estimate(), "rse": sketch.relative_error}
    if spec.kind == "fd":
        return {
            "fnorm_sq": sketch.fnorm_sq,
            "spectral_err_bound": sketch.error_bound(),
            "rows_kept": sketch.n,
        }
    if spec.kind == "ams":
        return {
            "f2_estimate": sketch.estimate_f2(),
            "rel_error_bound": sketch.rel_error_bound(),
            "n": sketch.n,
        }
    if spec.kind == "cbf":
        return {
            "n_add": sketch.n_add,
            "n_remove": sketch.n_remove,
            "fill_ratio": sketch.fill_ratio,
        }
    if spec.kind == "dcms":
        return {
            "total": sketch.total,
            "quantiles": {str(q): int(sketch.quantile(q)) for q in quantiles},
        }
    if spec.kind == "mg":
        return {
            "top_k": sketch.top_k(10),
            "undercount_bound": sketch.error_bound(),
            "n": sketch.n,
        }
    if spec.kind == "lc":
        return {
            "estimate": sketch.estimate(),
            "std_error": sketch.std_error(),
            "debt": sketch.debt,
            "n": sketch.n,
        }
    raise ValueError(spec.kind)
