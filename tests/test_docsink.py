"""Document-store sink (io_.docsink): per-type collection routing, capped
creation sized from the global budget's per-type fractions, chunked
insert_many, deferred background indexes, unknown types rerouted to misc
and counted — driven against a file-backed stub client (pymongo is an
optional dependency, absent here; slurper_mongodb.go:14-270 analogue)."""

import functools
import glob
import json
import os
import sys

# Ray write tasks cannot import this test module by name — serialize its
# objects (the stub connect factory) by value instead.  Ray pickles with
# its VENDORED cloudpickle, so register there, not with the pypi copy.
from ray import cloudpickle as _rcp

_rcp.register_pickle_by_value(sys.modules[__name__])

import pyarrow as pa

from fever_ray.io_.docsink import (
    MongoDocumentSink,
    SIZE_FRACTIONS,
    write_document_collections,
)


def _stub_factory(root):
    """Zero-arg connect factory over a file-backed pymongo-surface stub.

    The stub classes are defined INSIDE this function so cloudpickle
    serializes them by value — Ray write tasks cannot import the test
    module by name."""

    class StubColl:
        def __init__(self, r, name):
            self.root, self.name = r, name

        def insert_many(self, docs):
            with open(os.path.join(self.root, f"{self.name}.jsonl"), "a") as fh:
                fh.write(json.dumps({"chunk": len(docs)}) + "\n")
                for d in docs:
                    fh.write(
                        json.dumps({k: str(v) for k, v in d.items()}) + "\n"
                    )

        def create_index(self, keys, background=False):
            with open(os.path.join(self.root, "_indexes.jsonl"), "a") as fh:
                fh.write(
                    json.dumps(
                        {"coll": self.name, "keys": keys,
                         "background": background}
                    )
                    + "\n"
                )

    class StubDB:
        def __init__(self, r):
            self.root = r

        def create_collection(self, name, capped=False, size=0):
            path = os.path.join(self.root, "_creates.jsonl")
            # second create of an existing collection raises, like pymongo
            if os.path.exists(path):
                for ln in open(path):
                    if json.loads(ln)["name"] == name:
                        raise RuntimeError(f"collection {name} exists")
            with open(path, "a") as fh:
                fh.write(
                    json.dumps({"name": name, "capped": capped, "size": size})
                    + "\n"
                )

        def __getitem__(self, name):
            return StubColl(self.root, name)

    class StubClient:
        def __init__(self, r):
            self.root = r
            os.makedirs(r, exist_ok=True)

        def __getitem__(self, dbname):
            return StubDB(self.root)

        def close(self):
            pass

    return StubClient(root)


def _events():
    types = (["dns"] * 7 + ["http"] * 5 + ["flow"] * 4 + ["bogus"] * 3) * 10
    return pa.table(
        {
            "event_id": pa.array(range(len(types)), pa.int64()),
            "event_type": pa.array(types),
            "src_ip": pa.array([f"10.0.0.{i % 7}" for i in range(len(types))]),
            "timestamp": pa.array(
                [1_700_000_000_000_000 + i for i in range(len(types))],
                pa.timestamp("us"),
            ),
        }
    )


def test_docsink_routing_capped_chunks_indexes(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "mongo")
    sink = MongoDocumentSink(
        functools.partial(_stub_factory, root),
        database="fever",
        max_bytes=1_000_000,
        chunk_docs=25,
    )
    t = _events()
    res = write_document_collections(
        rd.from_arrow(t).repartition(4), sink, concurrency=1
    )

    # routing: one collection per known type; bogus rerouted to misc
    assert res["per_type"] == {"dns": 70, "http": 50, "flow": 40, "misc": 30}
    assert res["rerouted_to_misc"] == 30
    assert res["rows"] == t.num_rows

    # capped creation: size = global budget x the per-type fraction;
    # misc capped too (unknown types share its cap)
    creates = {
        j["name"]: j for j in map(json.loads, open(f"{root}/_creates.jsonl"))
    }
    assert set(creates) == {"dns", "http", "flow", "misc"}
    for name, j in creates.items():
        assert j["capped"] is True
        assert j["size"] == int(1_000_000 * SIZE_FRACTIONS[name])

    # chunked inserts: no chunk exceeds chunk_docs, all rows land
    for name, want in res["per_type"].items():
        lines = [json.loads(x) for x in open(f"{root}/{name}.jsonl")]
        chunks = [x["chunk"] for x in lines if "chunk" in x]
        docs = [x for x in lines if "chunk" not in x]
        assert sum(chunks) == len(docs) == want
        assert max(chunks) <= 25
        assert all(x["event_type"] in (name, "bogus") for x in docs)

    # deferred background indexes: declared once per (collection, key set)
    idx = [json.loads(x) for x in open(f"{root}/_indexes.jsonl")]
    assert all(x["background"] for x in idx)
    by_coll = {}
    for x in idx:
        by_coll.setdefault(x["coll"], []).append(tuple(k for k, _ in x["keys"]))
    assert by_coll["dns"] == [("dns.rrname",), ("timestamp",)]
    assert ("src_ip", "dest_ip") in by_coll["http"]
    assert by_coll["misc"] == [("timestamp",)]


def test_docsink_existing_collection_is_not_an_error(ray_session, tmp_path):
    """A second run appends — the create-exists race is swallowed the way
    the reference logs-and-continues (slurper_mongodb.go:208-210)."""
    import ray.data as rd

    root = str(tmp_path / "mongo")
    t = _events()
    for _ in range(2):
        sink = MongoDocumentSink(
            functools.partial(_stub_factory, root), chunk_docs=100
        )
        res = write_document_collections(rd.from_arrow(t), sink, concurrency=1)
        assert res["rows"] == t.num_rows
    lines = [json.loads(x) for x in open(f"{root}/dns.jsonl")]
    assert sum(x["chunk"] for x in lines if "chunk" in x) == 140  # 2 runs
