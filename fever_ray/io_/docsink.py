"""Document-store sink — the MongoSlurper analogue.

The reference routes each event to one MongoDB collection per event type,
creates the collections CAPPED at a fraction of one global space budget
(unknown types get 1% and a warning), bulk-inserts in chunks, and
declares per-type background indexes
(/root/reference/db/slurper_mongodb.go:14-35 TYPES + size fractions,
:38-165 INDEXES, :196-270 capped create + Bulk loop).

Ray Data form: a :class:`~ray.data.Datasink` whose every write task opens
its own client (distributed load, like ``DBAPITableSink``), groups the
block's rows by the type column, and appends to the per-type capped
collection; indexes are created DEFERRED in ``on_write_complete`` — the
batch equivalent of the reference indexing in the background while
writing.  ``pymongo`` is an optional dependency (absent in this
container): pass any client exposing the tiny surface used here
(``client[db]``, ``db.create_collection``, ``db[coll].insert_many`` /
``create_index``) — tests drive a stub; production passes
``mongo_connect_factory(url)``.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Datasink

# slurper_mongodb.go:14-19 — the per-type collections fever maintains
EVENT_TYPES = (
    "alert", "dns", "fileinfo", "flow",
    "http", "smtp", "ssh", "stats",
    "tls", "misc",
)

# slurper_mongodb.go:24-35 — fraction of the global space cap per
# collection; unknown types fall back to 0.01 with a logged warning
SIZE_FRACTIONS = {
    "dns": 0.25,
    "http": 0.2,
    "flow": 0.25,
    "smtp": 0.05,
    "ssh": 0.05,
    "alert": 0.05,
    "tls": 0.05,
    "stats": 0.02,
    "misc": 0.03,
    "fileinfo": 0.05,
}

# slurper_mongodb.go:38-165, flattened to this engine's flat event rows:
# every collection indexes the timestamp; the per-type extra keys keep the
# reference's lookup intents (rrname, hostname, src/dest pair)
DEFAULT_INDEXES: dict[str, tuple[tuple[str, ...], ...]] = {
    t: (("timestamp",),) for t in EVENT_TYPES
}
DEFAULT_INDEXES.update(
    {
        "dns": (("dns.rrname",), ("timestamp",)),
        "http": (("src_ip", "dest_ip"), ("http.hostname",), ("timestamp",)),
        "flow": (("src_ip", "dest_ip"), ("timestamp",)),
        "alert": (("src_ip", "dest_ip"), ("timestamp",)),
        "fileinfo": (("src_ip", "dest_ip"), ("timestamp",)),
        "tls": (("src_ip", "dest_ip"), ("timestamp",)),
        "smtp": (("src_ip", "dest_ip"), ("timestamp",)),
    }
)

_UNKNOWN_FRACTION = 0.01  # slurper_mongodb.go:198-201


def mongo_connect_factory(url: str) -> Callable:
    """Zero-arg picklable factory → ``pymongo.MongoClient`` (optional
    import, resolved inside the write task like psycopg2 in dbsink)."""

    def connect():
        try:
            import pymongo  # optional dependency
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError(
                "pymongo is not installed; pass a client factory exposing "
                "client[db] / db.create_collection / coll.insert_many"
            ) from e
        return pymongo.MongoClient(url)

    return connect


class MongoDocumentSink(Datasink):
    """Ray Datasink writing blocks into per-event-type capped collections.

    Parameters:
      connect        zero-arg picklable factory → client (pymongo surface)
      database       database name
      type_col       column routing each row to its collection; values
                     outside ``EVENT_TYPES`` land in ``misc`` (counted)
      max_bytes      the GLOBAL space budget; each collection is created
                     capped at ``max_bytes × SIZE_FRACTIONS[type]``
      chunk_docs     insert_many slice size (the Bulk chunk analogue)
      size_fractions / indexes  override the reference defaults
    """

    def __init__(
        self,
        connect: Callable,
        database: str = "fever",
        type_col: str = "event_type",
        max_bytes: int = 1 << 30,
        chunk_docs: int = 1000,
        size_fractions: dict | None = None,
        indexes: dict | None = None,
    ):
        self._connect = connect
        self.database = database
        self.type_col = type_col
        self.max_bytes = int(max_bytes)
        self.chunk_docs = int(chunk_docs)
        self.size_fractions = dict(size_fractions or SIZE_FRACTIONS)
        self.indexes = dict(indexes or DEFAULT_INDEXES)
        self.result: dict = {}

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    # ------------------------------------------------------------------
    def _ensure_capped(self, db, name: str, created: set[str]) -> None:
        if name in created:
            return
        frac = self.size_fractions.get(name, _UNKNOWN_FRACTION)
        try:
            db.create_collection(
                name, capped=True, size=max(1, int(self.max_bytes * frac))
            )
        except Exception as exc:
            # Only the exists-race is benign (any writer may have won it);
            # real connection/auth failures must not be swallowed here or
            # they resurface later as an opaque insert_many error.  pymongo
            # raises CollectionInvalid / "already exists" for the race.
            msg = str(exc).lower()
            if "exist" not in msg and type(exc).__name__ != "CollectionInvalid":
                raise
        created.add(name)

    def write(self, blocks: Iterable, ctx) -> dict:
        import pandas as pd

        client = self._connect()
        db = client[self.database]
        created: set[str] = set()
        per_type: dict[str, int] = {}
        rerouted = 0
        try:
            for block in blocks:
                if isinstance(block, pd.DataFrame):
                    block = pa.Table.from_pandas(block, preserve_index=False)
                if block.num_rows == 0:
                    continue
                types = block.column(self.type_col)
                if isinstance(types, pa.ChunkedArray):
                    types = types.combine_chunks()
                tvals = np.asarray(types.cast(pa.string()).to_pylist(), dtype=object)
                known = np.isin(tvals, EVENT_TYPES)
                rerouted += int((~known).sum())
                tvals = np.where(known, tvals, "misc")
                order = np.argsort(tvals, kind="stable")
                sorted_block = block.take(pa.array(order, pa.int64()))
                tv = tvals[order]
                run_starts = np.concatenate(
                    ([0], np.flatnonzero(tv[1:] != tv[:-1]) + 1, [len(tv)])
                )
                for s, e in zip(run_starts[:-1], run_starts[1:]):
                    name = str(tv[s])
                    self._ensure_capped(db, name, created)
                    part = sorted_block.slice(int(s), int(e - s))
                    docs = part.to_pylist()
                    coll = db[name]
                    for i in range(0, len(docs), self.chunk_docs):
                        coll.insert_many(docs[i : i + self.chunk_docs])
                    per_type[name] = per_type.get(name, 0) + len(docs)
        finally:
            close = getattr(client, "close", None)
            if close is not None:
                close()
        return {"per_type": per_type, "rerouted_to_misc": rerouted}

    def on_write_complete(self, write_result) -> None:
        per_type: dict[str, int] = {}
        rerouted = 0
        for ret in write_result.write_returns:
            for name, n in ret["per_type"].items():
                per_type[name] = per_type.get(name, 0) + n
            rerouted += ret["rerouted_to_misc"]
        # deferred per-type indexes, background like the reference's
        client = self._connect()
        db = client[self.database]
        made = []
        try:
            for name in sorted(per_type):
                for keys in self.indexes.get(name, ()):
                    db[name].create_index(
                        [(k, 1) for k in keys], background=True
                    )
                    made.append(f"{name}:{'+'.join(keys)}")
        finally:
            close = getattr(client, "close", None)
            if close is not None:
                close()
        self.result = {
            "collections": sorted(per_type),
            "rows": int(write_result.num_rows),
            "per_type": per_type,
            "rerouted_to_misc": rerouted,
            "indexes": made,
        }

    def get_name(self) -> str:
        return f"MongoDocumentSink({self.database})"


def write_document_collections(
    ds, sink: MongoDocumentSink, concurrency: int | None = None
):
    """Write a Dataset through the sink; returns the sink's summary
    (collections, per-type counts, deferred indexes)."""
    ds.write_datasink(sink, concurrency=concurrency)
    return sink.result
