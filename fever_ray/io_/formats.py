"""Additional batch source formats — CSV and Arrow IPC (Feather) — mapped
onto the same event/document schemas as the parquet and JSONL paths.

The reference ingests exactly one wire format (EVE JSON lines); a batch
engine replacing it meets pipelines whose upstream drops CSV exports or
Arrow IPC files, so these are first-class sources with parquet-parity
tests (`tests/test_formats.py`).  Both ride Ray Data's native readers
(arrow C++ parsers, vectorized, no Python-per-row work); the projection
helper is shared with the JSONL path's semantics: missing columns become
typed nulls, ``ts`` normalizes to timestamp[us].
"""

from __future__ import annotations

import pyarrow as pa

from .jsonl import EVENT_COLUMNS


def _project_events(batch: pa.Table, want: list[str]) -> pa.Table:
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


def read_event_csv(paths, columns: list[str] | None = None):
    """CSV events → the standard event schema via ``ray.data.read_csv``
    (arrow's C++ CSV reader infers types; ``ts`` is normalized to
    timestamp[us] to match the parquet path)."""
    import ray.data as rd

    want = columns or EVENT_COLUMNS
    return rd.read_csv(paths).map_batches(
        lambda b: _project_events(b, want),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_event_ipc(paths, columns: list[str] | None = None):
    """Arrow IPC / Feather events → the standard event schema.  Ray has no
    built-in IPC reader, so this wraps ``from_arrow_refs``-style reading as
    ``read_binary_files`` + a vectorized in-task decode — each file decodes
    zero-copy inside its read task, preserving streaming/backpressure."""
    import ray.data as rd

    want = columns or EVENT_COLUMNS

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        out = []
        for blob in batch.column("bytes").to_pylist():
            t = ipc.open_file(pa.BufferReader(blob)).read_all()
            out.append(_project_events(t.combine_chunks(), want))
        if not out:
            return _project_events(pa.table({}), want).slice(0, 0)
        return pa.concat_tables(out)

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )


def write_event_csv(table: pa.Table, path: str) -> str:
    """Fixture helper: write events as CSV (ts as ISO strings so arrow's
    CSV type inference round-trips them as timestamps)."""
    import pyarrow.csv as pacsv

    cols = {}
    for name in table.column_names:
        col = table.column(name)
        cols[name] = col
    pacsv.write_csv(pa.table(cols), path)
    return path


def write_event_ipc(table: pa.Table, path: str) -> str:
    """Fixture helper: write events as an Arrow IPC file."""
    import pyarrow.ipc as ipc

    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)
    return path
