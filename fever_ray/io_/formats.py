"""Additional batch source formats — CSV and Arrow IPC (Feather) — mapped
onto the same event/document schemas as the parquet and JSONL paths.

The reference ingests exactly one wire format (EVE JSON lines); a batch
engine replacing it meets pipelines whose upstream drops CSV exports or
Arrow IPC files, so these are first-class sources with parquet-parity
tests (`tests/test_formats.py`).  Both ride Ray Data's native readers
(arrow C++ parsers, vectorized, no Python-per-row work) and share the
JSONL path's projection (`io_.jsonl.project_events`): missing columns
become TYPED nulls and ``ts`` normalizes to timestamp[us], so blocks from
heterogeneous shards always unify.
"""

from __future__ import annotations

import pyarrow as pa

from .jsonl import EVENT_COLUMNS, project_events


def read_event_csv(paths, columns: list[str] | None = None):
    """CSV events → the standard event schema via ``ray.data.read_csv``
    (arrow's C++ CSV reader infers types; ``ts`` is normalized to
    timestamp[us] to match the parquet path)."""
    import ray.data as rd

    want = columns or EVENT_COLUMNS
    return rd.read_csv(paths).map_batches(
        lambda b: project_events(b, want),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def read_event_ipc(paths, columns: list[str] | None = None):
    """Arrow IPC / Feather events → the standard event schema.  Ray has no
    built-in IPC reader, so this wraps ``read_binary_files`` + an in-task
    decode — each file decodes from the Arrow buffer without a Python
    ``bytes`` copy, preserving streaming/backpressure."""
    import ray.data as rd

    want = columns or EVENT_COLUMNS

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = []
        for i in range(len(col)):
            buf = col[i].as_buffer()
            t = ipc.open_file(pa.BufferReader(buf)).read_all()
            out.append(project_events(t.combine_chunks(), want))
        if not out:
            return project_events(pa.table({}), want).slice(0, 0)
        return pa.concat_tables(out)

    return rd.read_binary_files(paths).map_batches(
        decode, batch_format="pyarrow", zero_copy_batch=True
    )


def write_event_csv(table: pa.Table, path: str) -> str:
    """Fixture helper: write events as CSV (the writer renders timestamps
    as ISO strings, which arrow's CSV type inference round-trips)."""
    import pyarrow.csv as pacsv

    pacsv.write_csv(table, path)
    return path


def write_event_ipc(table: pa.Table, path: str) -> str:
    """Fixture helper: write events as an Arrow IPC file."""
    import pyarrow.ipc as ipc

    with ipc.new_file(path, table.schema) as w:
        w.write_table(table)
    return path
