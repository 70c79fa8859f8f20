"""Per-file Bloom pruning index over a parquet corpus: one DCSO-format
filter per data file answering "can this file contain value X" — the
storage-side point-lookup pruner (a parquet-bloom-filter analog the rest
of the fever tooling can read, because every per-file filter is the same
`sketches.bloom` codec the IoC path uses; reference anchor: fever's
bloom-centric matching, /root/reference/processing/bloom_handler.go,
applied to STORAGE instead of streams).

Scale shape (10^12 rows): the build is ONE streaming pass — corpus
values never shuffle; each batch compresses to a fixed-size partial
filter (m/8 bytes regardless of batch rows) keyed by source file, and
the per-file OR-merge moves only those partials.  A lookup touches the
manifest plus per-file filters (KB each), never the corpus: reading
files whose filter rejects the value is provably unnecessary (no false
negatives), and false positives cost one wasted read at the configured
rate p.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np  # noqa: F401  (kept for symmetry with sibling modules)
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.bloom import BloomFilter
from .checkpoint import _atomic_write, partition_key

MANIFEST = "manifest.json"


def _corpus_files(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    files = sorted(
        glob.glob(os.path.join(input_path, "**", "*.parquet"), recursive=True)
    )
    if not files:
        raise ValueError(f"no parquet files under {input_path}")
    return files


def build_file_bloom_index(
    input_path: str,
    out_dir: str,
    column: str = "url",
    p: float = 1e-6,
) -> dict:
    """One pass over the corpus → ``out_dir/blooms/<key>.bloom`` per data
    file plus ``manifest.json`` mapping each file to (rows, filter path,
    shared n/p parameters).  All filters share one (n, p) sized to the
    LARGEST file so partials merge; rerunning overwrites atomically."""
    import pyarrow.parquet as pq
    import ray.data as rd

    files = _corpus_files(input_path)
    rows_per_file = {f: pq.read_metadata(f).num_rows for f in files}
    cap = max(max(rows_per_file.values()), 1)

    blooms_dir = os.path.join(out_dir, "blooms")
    os.makedirs(blooms_dir, exist_ok=True)

    ds = rd.read_parquet(files, columns=[column], include_paths=True)

    def partial(batch: pa.Table) -> pa.Table:
        paths, blobs = [], []
        pcol = batch.column("path")
        for path in pc.unique(pcol).to_pylist():
            vals = batch.filter(pc.equal(pcol, path)).column(column)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            vals = pc.fill_null(pc.cast(vals, pa.string()), "")
            bf = BloomFilter.initialize(cap, p)
            bf.add(vals)
            paths.append(path)
            blobs.append(bf.to_bytes())
        return pa.table(
            {"path": pa.array(paths, pa.string()),
             "blob": pa.array(blobs, pa.large_binary())}
        )

    def merge_write(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "key": pa.array([], pa.string())})
        path = group.column("path")[0].as_py()
        merged = None
        for blob in group.column("blob").to_pylist():
            bf = BloomFilter.from_bytes(blob)
            merged = bf if merged is None else merged.merge(bf)
        key = partition_key(path)
        _atomic_write(
            os.path.join(blooms_dir, f"{key}.bloom"),
            lambda tmp: merged.save(tmp),
        )
        return pa.table({"path": pa.array([path]), "key": pa.array([key])})

    done = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("path")
        .map_groups(merge_write, batch_format="pyarrow")
        .take_all()  # one tiny row per data file
    )
    entries = {
        r["path"]: {
            "key": r["key"],
            "rows": rows_per_file[r["path"]],
            "bloom": os.path.join("blooms", f"{r['key']}.bloom"),
        }
        for r in done
    }
    manifest = {"column": column, "capacity": cap, "p": p, "files": entries}
    _atomic_write(
        os.path.join(out_dir, MANIFEST),
        lambda tmp: open(tmp, "w").write(json.dumps(manifest, sort_keys=True)),
    )
    return {"files": len(entries), "capacity": cap, "out": out_dir}


def lookup_file_bloom_index(out_dir: str, values: list[str]) -> dict[str, list[str]]:
    """value → candidate data files (filters guarantee no false
    negatives: a file absent from a value's list cannot contain it).
    Touches only the manifest + per-file filters, never the corpus."""
    with open(os.path.join(out_dir, MANIFEST)) as fh:
        manifest = json.load(fh)
    out: dict[str, list[str]] = {v: [] for v in values}
    for path, ent in sorted(manifest["files"].items()):
        bf = BloomFilter.load(os.path.join(out_dir, ent["bloom"]))
        hits = bf.check(pa.array([str(v) for v in values], pa.string()))
        for v, hit in zip(values, hits):
            if hit:
                out[v].append(path)
    return out
