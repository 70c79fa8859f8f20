"""JSON-lines source — the reference's ingest format re-expressed.

fever consumes newline-delimited EVE JSON from sockets/Redis/stdin and
projects ~26 key paths into a flat Entry (/root/reference/util/util.go:
67-285, key table :28-55).  The batch equivalent: ``ray.data.read_json``
(arrow's JSON reader, vectorized, no Python-per-row parsing) plus a
column projection; unknown fields can be retained in a raw column by the
caller if needed (fever's JSONLine carry-through ≈ keep the original file).

``read_event_jsonl`` maps a JSONL event stream onto the engine's event
schema (event_id, ts, user_id, event_type, value, props).
"""

from __future__ import annotations

import pyarrow as pa


EVENT_COLUMNS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def read_event_jsonl(paths, columns: list[str] | None = None):
    """Read newline-delimited JSON events into the standard event schema.

    The heavy lifting is pyarrow's C++ JSON parser via ``read_json`` —
    the Ray-native replacement for fever's hand-rolled 26-key extractor.
    """
    import ray.data as rd

    ds = rd.read_json(paths)

    want = columns or EVENT_COLUMNS

    def project(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in want:
            if name in batch.column_names:
                col = batch.column(name)
                if name == "ts" and not pa.types.is_timestamp(col.type):
                    col = col.cast(pa.timestamp("us"))
                cols[name] = col
            else:
                cols[name] = pa.nulls(batch.num_rows, pa.string())
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)


def write_event_jsonl(table: pa.Table, path: str) -> str:
    """Test/fixture helper: write events as JSONL (ts as ISO string)."""
    import json

    rows = table.to_pylist()
    with open(path, "w") as fh:
        for r in rows:
            if hasattr(r.get("ts"), "isoformat"):
                r["ts"] = r["ts"].isoformat()
            fh.write(json.dumps(r) + "\n")
    return path
