"""DBAPI table sink — the PostgresSlurper re-expressed as a Ray Datasink.

The reference streams events into Postgres with chunked COPY, rotates to
a fresh time-named table on an interval, and builds each table's index
only AFTER rotating away from it (deferred index — COPY into an indexed
table is the classic load killer; /root/reference/db/slurper_postgres.go:
164-236, the index goroutine at :241-263, table-name format at :per-hour).
The batch-native mapping keeps all three semantics, deterministic and
replayable:

* **rotation by EVENT time, not wall clock**: the target table is a pure
  function of the row's timestamp (``prefix_YYYYMMDDHH``), so any
  re-run / resume / out-of-order block lands rows in the same table —
  wall-clock rotation is not reproducible in a batch engine.
* **chunked bulk insert**: each write task groups its blocks by bucket
  vectorized, then ``executemany`` in ``chunk_rows`` slices (the COPY
  chunking analogue; a Postgres ``connect`` can swap in ``COPY`` via the
  ``bulk_load`` hook without touching the sink).
* **deferred index**: ``on_write_complete`` creates the indexes once per
  TOUCHED table after every write task finished — index-after-load.

Works against any DBAPI2 ``connect`` factory.  In this container it is
tested against stdlib ``sqlite3``; a production deployment passes
``functools.partial(psycopg2.connect, dsn)`` (import-tried, not bundled)
and optionally a COPY-based ``bulk_load``.

Scale shape: every Ray write task owns one connection and inserts only
its own blocks (true parallel load on Postgres; serialize with
``concurrency=1`` on sqlite); nothing event-sized touches the driver —
the driver sees only touched-table names.

Reading back needs no custom code: ``ray.data.read_sql(f"SELECT * FROM
{table}", connect)`` over the rotated table list round-trips the data
(Ray's built-in DBAPI source), so the sink + read_sql pair closes the
loop a reference user has with Postgres today.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pyarrow as pa

from ray.data import Datasink

_SQL_TYPES = {
    "int": "INTEGER",
    "float": "REAL",
    "string": "TEXT",
    "timestamp": "TEXT",
    "binary": "BLOB",
    "bool": "INTEGER",
}


def _sql_type(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return _SQL_TYPES["int"]
    if pa.types.is_floating(t):
        return _SQL_TYPES["float"]
    if pa.types.is_timestamp(t):
        return _SQL_TYPES["timestamp"]
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _SQL_TYPES["binary"]
    if pa.types.is_boolean(t):
        return _SQL_TYPES["bool"]
    return _SQL_TYPES["string"]


def _bucket_labels(ts: pa.ChunkedArray | pa.Array, rotation_s: int) -> np.ndarray:
    """Per-row table label seconds-bucketed from EVENT time (us epoch).

    Nulls are rejected up front: to_numpy on a nulled int64 silently
    promotes to float64 NaN, which would surface much later as an opaque
    numpy/int conversion error deep inside a Ray write task instead of a
    clear validation error naming the column."""
    import pyarrow.compute as pc

    if ts.null_count:
        raise ValueError(
            f"dbsink: rotation column contains {ts.null_count} null(s) — "
            "every row needs an event time to pick its table; filter or "
            "fill first"
        )
    us = pc.cast(
        pc.cast(ts, pa.timestamp("us")), pa.int64()
    ).to_numpy(zero_copy_only=False)
    return us // (rotation_s * 1_000_000)


def _fmt_table(prefix: str, bucket: int, rotation_s: int) -> str:
    from datetime import datetime, timezone

    t = datetime.fromtimestamp(bucket * rotation_s, tz=timezone.utc)
    return f"{prefix}_{t.strftime('%Y%m%d%H%M%S')[: 10 if rotation_s >= 3600 else 14]}"


class DBAPITableSink(Datasink):
    """Ray Datasink writing Arrow blocks into time-rotated DBAPI tables.

    Parameters:
      connect     zero-arg picklable factory → DBAPI2 connection
      table_prefix  rotated tables are ``{prefix}_{YYYYMMDDHH}``
      ts_col      event-time column driving rotation (timestamp)
      rotation_s  rotation interval in seconds (3600 = the reference's
                  hourly tables)
      chunk_rows  executemany slice size (the COPY chunk analogue)
      index_cols  per-table indexes created DEFERRED in on_write_complete
      bulk_load   optional hook ``(conn, table, columns, rows)`` replacing
                  executemany (e.g. Postgres COPY); rows is a list of
                  tuples
    """

    def __init__(
        self,
        connect: Callable,
        table_prefix: str = "events",
        ts_col: str = "ts",
        rotation_s: int = 3600,
        chunk_rows: int = 5000,
        index_cols: tuple = ("ts",),
        bulk_load: Callable | None = None,
        paramstyle: str = "?",
    ):
        self._connect = connect
        self.prefix = table_prefix
        self.ts_col = ts_col
        self.rotation_s = int(rotation_s)
        self.chunk_rows = int(chunk_rows)
        self.index_cols = tuple(index_cols)
        self.bulk_load = bulk_load
        self.paramstyle = paramstyle  # "?" sqlite, "%s" psycopg2
        self.result: dict = {}

    # every write task opens its own connection: distributed load
    @property
    def supports_distributed_writes(self) -> bool:
        return True

    # ------------------------------------------------------------------
    def _row_values(self, table: pa.Table) -> list[tuple]:
        import pyarrow.compute as pc

        cols = []
        for name in table.column_names:
            c = table.column(name)
            if pa.types.is_timestamp(c.type):
                # Arrow %S on timestamp[us] already prints the 6-digit
                # fractional part (and %f is NOT supported — it would be
                # emitted literally), so the format stops at %S
                c = pc.strftime(
                    pc.cast(c, pa.timestamp("us")), format="%Y-%m-%dT%H:%M:%S"
                )
            cols.append(c.to_pylist())
        return list(zip(*cols)) if cols else []

    def write(self, blocks: Iterable, ctx) -> list[str]:
        import pandas as pd

        conn = self._connect()
        touched: set[str] = set()
        try:
            cur = conn.cursor()
            for block in blocks:
                if isinstance(block, pd.DataFrame):
                    block = pa.Table.from_pandas(block, preserve_index=False)
                if block.num_rows == 0:
                    continue
                buckets = _bucket_labels(block.column(self.ts_col), self.rotation_s)
                order = np.argsort(buckets, kind="stable")
                sorted_block = block.take(pa.array(order, pa.int64()))
                bs = buckets[order]
                run_starts = np.concatenate(
                    ([0], np.flatnonzero(np.diff(bs)) + 1, [len(bs)])
                )
                for s, e in zip(run_starts[:-1], run_starts[1:]):
                    table_name = _fmt_table(
                        self.prefix, int(bs[s]), self.rotation_s
                    )
                    part = sorted_block.slice(int(s), int(e - s))
                    if table_name not in touched:
                        cols_sql = ", ".join(
                            f'"{f.name}" {_sql_type(f.type)}'
                            for f in part.schema
                        )
                        cur.execute(
                            f'CREATE TABLE IF NOT EXISTS "{table_name}" '
                            f"({cols_sql})"
                        )
                        touched.add(table_name)
                    names = ", ".join(f'"{n}"' for n in part.column_names)
                    rows = self._row_values(part)
                    if self.bulk_load is not None:
                        self.bulk_load(conn, table_name, part.column_names, rows)
                        continue
                    ph = ", ".join([self.paramstyle] * part.num_columns)
                    ins = f'INSERT INTO "{table_name}" ({names}) VALUES ({ph})'
                    for i in range(0, len(rows), self.chunk_rows):
                        cur.executemany(ins, rows[i : i + self.chunk_rows])
            conn.commit()
        finally:
            conn.close()
        return sorted(touched)

    def on_write_complete(self, write_result) -> None:
        # deferred index: the reference indexes a table only after
        # rotating away from it; batch equivalent = after the load
        tables = sorted(
            {t for ret in write_result.write_returns for t in ret}
        )
        conn = self._connect()
        try:
            cur = conn.cursor()
            for t in tables:
                for col in self.index_cols:
                    cur.execute(
                        f'CREATE INDEX IF NOT EXISTS "idx_{t}_{col}" '
                        f'ON "{t}" ("{col}")'
                    )
            conn.commit()
        finally:
            conn.close()
        self.result = {
            "tables": tables,
            "rows": int(write_result.num_rows),
            "indexes": [
                f"idx_{t}_{c}" for t in tables for c in self.index_cols
            ],
        }

    def get_name(self) -> str:
        return f"DBAPITableSink({self.prefix})"


def write_dbapi_tables(ds, sink: DBAPITableSink, concurrency: int | None = None):
    """Write a Dataset through the sink; returns the sink's summary
    (touched tables, rows, deferred indexes)."""
    ds.write_datasink(sink, concurrency=concurrency)
    return sink.result
