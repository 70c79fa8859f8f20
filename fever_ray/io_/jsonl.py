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

# canonical types for the event schema — missing columns project to TYPED
# nulls (a string-typed null ts/value would conflict with blocks from shards
# that do carry the column and break concat/schema unification)
EVENT_TYPES = {
    "event_id": pa.int64(),
    "ts": pa.timestamp("us"),
    "user_id": pa.int64(),
    "event_type": pa.string(),
    "value": pa.float64(),
    "props": pa.string(),
}


def project_events(batch: pa.Table, want: list[str]) -> pa.Table:
    """Project a parsed batch onto the standard event schema: present
    columns pass through (``ts`` normalized to timestamp[us]); missing
    columns become typed nulls.  Shared by the JSONL / CSV / IPC sources."""
    cols = {}
    for name in want:
        if name in batch.column_names:
            col = batch.column(name)
            if name == "ts" and not pa.types.is_timestamp(col.type):
                col = col.cast(pa.timestamp("us"))
            cols[name] = col
        else:
            cols[name] = pa.nulls(batch.num_rows, EVENT_TYPES.get(name, pa.string()))
    return pa.table(cols)


def read_event_jsonl(paths, columns: list[str] | None = None):
    """Read newline-delimited JSON events into the standard event schema.

    The heavy lifting is pyarrow's C++ JSON parser via ``read_json`` —
    the Ray-native replacement for fever's hand-rolled 26-key extractor.
    """
    import ray.data as rd

    ds = rd.read_json(paths)
    want = columns or EVENT_COLUMNS
    return ds.map_batches(
        lambda b: project_events(b, want),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


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
