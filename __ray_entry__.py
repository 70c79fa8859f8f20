"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship sketch-build + IoC pipeline on sf0.001 pages.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (plus the training-data-pipeline operators); ``oracle_sql()``
gives the DuckDB-equivalent SQL where the operator is SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing in
here (or in fever_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rd():
    import ray.data as rd

    return rd


def _t(sf_dir: str, name: str, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


# --------------------------------------------------------------------- entry
def entry() -> Any:
    """Flagship pipeline on deterministic sf0.001-scale pages: one streaming
    pass building HLL/CMS/t-digest/KLL/Bloom + the IoC actor-pool matcher."""
    from fever_ray.gen.pages import ensure_pages
    from fever_ray.pipelines.flagship import run_flagship
    from fever_ray.sketches.bloom import BloomFilter

    pages_dir = "/tmp/fever_ray_pages/t1"
    ensure_pages(
        pages_dir,
        n_rows=2000,
        n_files=4,
        seed=42,
        ioc_hosts=("evil0.example.com", "evil1.example.net"),
        ioc_paths=("/oddlyspecific/implant.html",),
        ioc_frac=0.01,
    )
    bf = BloomFilter.initialize(100000, 1e-7)
    bf.add(["evil0.example.com", "evil1.example.net", "/oddlyspecific/implant.html"])
    res = run_flagship(pages_dir, ioc_bloom=bf, batch_size=512)
    return res["summary"]


# ------------------------------------------------------------------- queries
def queries() -> dict[str, Callable[[str], Any]]:
    import fever_ray.ops.aggregates as agg
    import fever_ray.ops.relational as rel
    from fever_ray.core.grouped import grouped_estimates
    from fever_ray.core.udaf import SketchSpec, build_sketches
    from fever_ray.io_.docpages import docs_to_pages
    from fever_ray.ops.alertify import alertify
    from fever_ray.ops.cidr import cidr_match
    from fever_ray.ops.dedup import (
        connected_components,
        dup_ngram_trim,
        dup_ngram_windows,
        embedding_dup_pairs,
        exact_dedup,
        line_dedup,
        minhash_dedup_components,
        simhash_near_dup_pairs,
    )
    from fever_ray.ops.curate import (
        curation_filter,
        domain_cap,
        grouped_order_statistic,
        hash_sample,
        mixture_sample,
        normalize_text,
        normalize_urls,
        per_group_sample,
        quantile_length_filter,
        repeat_corpus,
        split_assign,
        stratified_sample,
        regex_scrub,
        token_repetition,
    )
    from fever_ray.ops.trainprep import (
        benchmark_ngram_set,
        chunk_documents,
        decontaminate,
        epoch_shuffle,
        pack_sequences,
        token_budget_select,
    )
    from fever_ray.ops.extract import extract_text, hostname_of
    from fever_ray.ops.ioc import PageIocMatcher
    from fever_ray.ops.knn import knn_bruteforce, knn_ivf, knn_lsh
    from fever_ray.ops.multimodal import decode_images, resize_images
    from fever_ray.ops.textstats import (
        LangId,
        doc_top_terms,
        fingerprint,
        heavy_ngrams,
        bm25_search,
        inverted_index,
        keyword_search,
        quality_score,
        token_stats,
        top_ngrams,
    )
    from fever_ray.sketches.bloom import BloomFilter

    # ---- fever aggregation handlers over events --------------------------
    def q_event_profiler(sf):
        return agg.event_profiler(_t(sf, "events", ["event_type", "props"]))

    def q_flow_aggregator(sf):
        return agg.flow_aggregator(_t(sf, "events", ["user_id", "event_type", "value", "ts"]))

    def q_unicorn_flow_report(sf):
        return agg.unicorn_flow_report(_t(sf, "events", ["user_id", "event_type", "value"]))

    def q_pareto_front(sf):
        # frontier of purchase users maximizing (n_flows, total_value) —
        # composes the unicorn per-user report with the skyline op; floats
        # entering the dominance compare are the same exact-cents values
        # the unicorn gate already hashes bit-exactly
        from fever_ray.ops.stats import pareto_front

        rep = agg.unicorn_flow_report(
            _t(sf, "events", ["user_id", "event_type", "value"])
        )
        return pareto_front(rep, "n_flows", "total_value")

    def q_dns_aggregator(sf):
        return agg.dns_aggregator(_t(sf, "events", ["event_type", "user_id"]))

    def q_pdns_collector(sf):
        return agg.pdns_collector(_t(sf, "events", ["event_type", "user_id", "ts"]))

    def q_context_collector(sf):
        ds = agg.context_collector(_t(sf, "events", ["event_id", "user_id", "event_type"]))
        return ds

    def q_anti_join(sf):
        # drop every event of users with a high-value error (broadcast
        # anti-join); project the marking column back out so the oracle's
        # column set matches
        ds = agg.context_excluder(
            _t(sf, "events", ["event_id", "user_id", "event_type", "value"]),
            min_value=200.0,
        )
        return ds.map_batches(
            lambda b: b.select(["event_id", "user_id", "event_type"]),
            batch_format="pyarrow",
        )

    def q_heartbeat_injector(sf):
        from ray.data.aggregate import Sum

        ds = agg.heartbeat_injector(_t(sf, "events"))
        partial = ds.map_batches(
            lambda b: pa.TableGroupBy(b.select(["event_type"]), ["event_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "n"]),
            batch_format="pyarrow",
        )
        return partial.groupby("event_type").aggregate(Sum("n", alias_name="n"))

    def q_flow_profiler(sf):
        return agg.flow_profiler(_t(sf, "documents", ["lang", "n_chars"]))

    # ---- relational ------------------------------------------------------
    def q_pricing_summary(sf):
        return rel.pricing_summary(
            _t(
                sf,
                "lineitem",
                [
                    "l_returnflag",
                    "l_linestatus",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                    "l_shipdate",
                ],
            )
        )

    def q_segment_revenue(sf):
        import pyarrow.parquet as pq

        cust = pq.read_table(
            f"{sf}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        return rel.segment_revenue(_t(sf, "orders", ["o_custkey", "o_totalprice"]), cust)

    def q_top_orders(sf):
        return rel.top_k_orders(_t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]), k=10)

    def q_filter_project(sf):
        ds = rel.filter_project(
            _t(
                sf,
                "lineitem",
                ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
            ),
            min_qty=49.0,
        )
        return ds.map_batches(
            lambda b: b.select(["l_orderkey", "l_linenumber", "l_quantity", "revenue"]),
            batch_format="pyarrow",
        )

    def q_left_outer_join(sf):
        right = _t(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
            lambda b: b.filter(pc.greater(b.column("c_acctbal"), 5000.0)).select(
                ["c_custkey", "c_mktsegment"]
            ),
            batch_format="pyarrow",
        )
        joined = rel.partitioned_hash_join(
            _t(sf, "orders", ["o_orderkey", "o_custkey"]),
            right,
            "o_custkey",
            "c_custkey",
            n_buckets=8,
            join_type="left outer",
        )
        return joined.map_batches(
            lambda b: b.select(["o_orderkey", "o_custkey", "c_mktsegment"]),
            batch_format="pyarrow",
        )

    def q_interarrival_histogram(sf):
        # cadence audit: per-user inter-event gaps in seconds, 4h bins
        # over [0, 4 days) with edge bins absorbing the tails
        from fever_ray.ops.windows import interarrival_histogram

        return interarrival_histogram(
            _t(sf, "events", ["event_id", "ts", "user_id"]),
            lo=0, hi=345600, n_bins=24,
        )

    def q_first_records(sf):
        # per-user history head: the 3 earliest events (ts asc, event_id
        # asc tie-break) — first-touch attribution / context truncation
        from fever_ray.ops.relational import first_records

        ev = _t(sf, "events", ["event_id", "ts", "user_id", "event_type"])
        return first_records(ev, "user_id", "ts", "event_id", n=3)

    def q_dup_cluster_sizes(sf):
        # dedup-sizing audit: histogram of byte-identical text cluster
        # sizes (all 1s at small SFs; real 2-clusters appear at sf0.1)
        from fever_ray.ops.dedup import dup_cluster_sizes

        return dup_cluster_sizes(_t(sf, "documents", ["text"]))

    def q_pii_report(sf):
        # pattern census over the events JSON payload (the only fixture
        # column with digits): docs-hit + total occurrences per pattern
        from fever_ray.ops.textstats import pii_report

        return pii_report(
            _t(sf, "events", ["props"]),
            patterns={
                "digit_run": "[0-9]+",
                "two_digits": "[0-9]{2}",
                "field_k": '"k": [0-9]+',
            },
            text_col="props",
        )

    def q_bigram_logloss(sf):
        # KenLM-shaped bigram surprise with unigram backoff, exact bits;
        # reference = docs with doc_id % 3 != 0, score everything (unseen
        # bigrams in the held-out third exercise the backoff path)
        from fever_ray.ops.textstats import bigram_logloss

        docs = _t(sf, "documents", ["doc_id", "text"])
        ref = docs.map_batches(
            lambda b: b.filter(
                pa.array(
                    b.column("doc_id").to_numpy(zero_copy_only=False) % 3 != 0
                )
            ),
            batch_format="pyarrow",
        )
        return bigram_logloss(docs, ref)

    def q_user_retention(sf):
        # day-over-day cohort stickiness: distinct users active per day
        # window and how many return the very next day — exact counts
        from fever_ray.ops.windows import user_retention

        return user_retention(
            _t(sf, "events", ["ts", "user_id"]), size_s=86400
        )

    def q_props_field_stats(sf):
        # typed integer-field pull from the JSON props payload + grouped
        # stats per event type — vectorized RE2 extraction, no row loops
        from fever_ray.ops.aggregates import props_field_stats

        return props_field_stats(
            _t(sf, "events", ["event_type", "props"]), field="k"
        )

    def q_contamination_report(sf):
        # eval-integrity audit: per benchmark doc (every 97th), how many of
        # its distinct word 4-grams occur anywhere in the training corpus
        # (all other docs) — exact integer counts on both sides
        from fever_ray.ops.trainprep import contamination_report

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod97(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 97 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        bench = docs.map_batches(mod97(True), batch_format="pyarrow")
        corpus = docs.map_batches(mod97(False), batch_format="pyarrow")
        return contamination_report(corpus, bench, n=4)

    def q_latest_record(sf):
        # CDC compaction: the newest event row per user (ts desc, event_id
        # desc tie-break) — columns pass through untouched, so the gate
        # hashes raw values on both sides
        from fever_ray.ops.relational import latest_record

        ev = _t(sf, "events", ["event_id", "ts", "user_id", "event_type", "value"])
        return latest_record(ev, "user_id", "ts", "event_id")

    def q_full_outer_join(sf):
        # both-sides-dangling outer join: big orders vs funded customers —
        # key-hash co-partitioning makes per-bucket null padding globally
        # correct; Arrow coalesces the key, mirrored by SQL COALESCE
        left = _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
            lambda b: b.filter(
                pc.greater(b.column("o_totalprice"), 350000.0)
            ).select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow",
        )
        right = _t(sf, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]).map_batches(
            lambda b: b.filter(pc.greater(b.column("c_acctbal"), 1000.0)).select(
                ["c_custkey", "c_mktsegment"]
            ),
            batch_format="pyarrow",
        )
        joined = rel.partitioned_hash_join(
            left, right, "o_custkey", "c_custkey",
            n_buckets=8, join_type="full outer",
        )
        return joined.map_batches(
            lambda b: b.select(["o_orderkey", "o_custkey", "c_mktsegment"]),
            batch_format="pyarrow",
        )

    def q_bucketed_join(sf):
        joined = rel.partitioned_hash_join(
            _t(sf, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
            _t(sf, "customer", ["c_custkey", "c_name"]),
            "o_custkey",
            "c_custkey",
            n_buckets=8,
        )
        return joined.map_batches(
            lambda b: b.select(["o_orderkey", "o_custkey", "c_name"]),
            batch_format="pyarrow",
        )

    def q_revenue_by_nation(sf):
        import pyarrow.parquet as pq

        cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        nat = pq.read_table(f"{sf}/nation.parquet", columns=["n_nationkey", "n_name"])
        return rel.revenue_by_nation(
            _t(sf, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]),
            _t(sf, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]),
            cust,
            nat,
        )

    # ---- text analysis over documents ------------------------------------
    def q_token_stats(sf):
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: token_stats(b).select(["doc_id", "n_tokens", "n_text_chars"]),
            batch_format="pyarrow",
        )

    def q_quality_score(sf):
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: quality_score(b).select(
                ["doc_id", "n_tokens", "stop_ratio", "mean_token_len", "quality_ok"]
            ),
            batch_format="pyarrow",
        )

    def q_lang_id(sf):
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            LangId, batch_format="pyarrow", concurrency=(1, 4)
        ).map_batches(
            lambda b: b.select(["doc_id", "lang_pred"]), batch_format="pyarrow"
        )

    def q_fingerprint(sf):
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: fingerprint(b).select(["doc_id", "content_hash", "simhash"]),
            batch_format="pyarrow",
        )

    def q_content_fingerprint(sf):
        # oracle-gated slice of q_fingerprint: the 64-bit content hash
        # (splitmix64 ∘ FNV-1a) is mirrored bit-exactly in DuckDB SQL via
        # HUGEINT mod-2^64 arithmetic (ASCII corpus: codepoint == utf-8 byte)
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: fingerprint(b).select(["doc_id", "content_hash"]),
            batch_format="pyarrow",
        )

    def _ann_recall_gate(sf, ann_rows, threshold: float):
        """Recall gate for ANN methods (no exact SQL analog exists for the
        pruned search itself): compute exact top-k and the ANN answer
        engine-side; if mean per-query recall ≥ threshold, emit the exact
        top-k rows (bit-stable, matches the brute-force oracle), else emit
        nothing so the gate fails on rows_match.  This turns 'recall ≥ X'
        into a driver-checkable pass/fail signal."""
        bf = knn_bruteforce(
            _t(sf, "embeddings", ["vec_id", "embedding"]), _queries_mat(sf), k=5
        ).to_pandas()
        ann = {(int(r["query_id"]), int(r["vec_id"])) for r in ann_rows}
        recalls = []
        for qi in sorted(set(bf["query_id"])):
            want = {int(v) for v in bf[bf["query_id"] == qi]["vec_id"]}
            got = {v for (q_, v) in ann if q_ == qi}
            recalls.append(len(want & got) / len(want))
        import numpy as _np

        out = bf[["query_id", "vec_id"]].sort_values(["query_id", "vec_id"])
        if _np.mean(recalls) < threshold:
            out = out.iloc[0:0]
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)

    def q_knn_lsh_recall_gate(sf):
        ann = knn_lsh(
            _t(sf, "embeddings", ["vec_id", "embedding"]), _queries_mat(sf),
            k=5, n_planes=4,
        ).take_all()
        return _ann_recall_gate(sf, ann, threshold=0.3)

    def q_knn_ivf_recall_gate(sf):
        ann = knn_ivf(
            _t(sf, "embeddings", ["vec_id", "embedding"]), _queries_mat(sf),
            k=5, n_centroids=8, nprobe=6,
        ).take_all()
        return _ann_recall_gate(sf, ann, threshold=0.6)

    def q_knn_pq_recall_gate(sf):
        # PQ/ADC path: train per-subspace codebooks on a bounded sample,
        # encode the corpus to 8-byte codes, ADC-search the CODES, gate
        # mean recall vs the exact top-5 (same contract as LSH/IVF gates)
        from fever_ray.ops.knn import knn_pq, pq_encode, train_pq_codebooks

        emb = _t(sf, "embeddings", ["vec_id", "embedding"])
        books = train_pq_codebooks(emb, m=16, ksub=256, seed=9, sample_rows=4096)
        codes = pq_encode(emb, books)
        ann = knn_pq(codes, _queries_mat(sf), books, k=5).take_all()
        return _ann_recall_gate(sf, ann, threshold=0.5)

    def q_knn_ivfpq_recall_gate(sf):
        # two-level IVF-PQ (FAISS layout): coarse cells + residual PQ
        # codes, per-cell residual LUTs at search; rows/bytes touched both
        # bounded — the 10^12-vector index shape
        from fever_ray.ops.knn import ivfpq_encode, knn_ivfpq, train_ivfpq

        emb = _t(sf, "embeddings", ["vec_id", "embedding"])
        cents, books = train_ivfpq(
            emb, n_centroids=8, m=16, ksub=256, seed=9, sample_rows=4096
        )
        codes = ivfpq_encode(emb, cents, books)
        ann = knn_ivfpq(
            codes, _queries_mat(sf), cents, books, k=5, nprobe=6
        ).take_all()
        return _ann_recall_gate(sf, ann, threshold=0.5)

    # ---- corpus curation -------------------------------------------------
    def q_hash_sample(sf):
        # deterministic Bernoulli(0.25) split keyed on (doc_id, seed=7);
        # oracle mirrors hash64_ints (splitmix64 stages) bit-exactly
        return hash_sample(_t(sf, "documents", ["doc_id", "source"]), 0.25, seed=7)

    def q_stratified_sample(sf):
        # per-language rebalance: clamp en, keep most de, default for rest —
        # same splitmix64 membership hash as hash_sample, per-stratum
        # threshold chosen by one dictionary-encode per batch
        return stratified_sample(
            _t(sf, "documents", ["doc_id", "lang", "source"]),
            {"en": 0.10, "de": 0.80},
            default=0.35,
            seed=11,
        )

    def q_split_assign(sf):
        return split_assign(
            _t(sf, "documents", ["doc_id", "lang"]),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=13,
        )

    def q_leakage_safe_split(sf):
        from fever_ray.ops.curate import leakage_safe_split

        ds = leakage_safe_split(
            _t(sf, "documents", ["doc_id", "lang", "text"]),
            {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=13,
        )
        return ds.select_columns(["doc_id", "lang", "split"])

    def q_plan_card(sf):
        """Physical-plan decisions (core.plan) hash-gated end-to-end: the
        groupby strategy / partition count / salt fanout the sketch probes
        pick for documents.source and documents.lang.  Below k=64 distinct
        the MG hot share is EXACT and the HLL threshold comparisons sit
        far from their boundaries, so the oracle reproduces every decision
        from exact SQL counts through the same branch arithmetic
        (round-half-up salt = FLOOR(x + 0.5) on both sides)."""
        from fever_ray.core.plan import plan_groupby, probe_column

        cols, strats, parts, salts = [], [], [], []
        for col in ("source", "lang"):
            out = plan_groupby(
                probe_column(_t(sf, "documents", [col]), col), workers=32
            )
            cols.append(col)
            strats.append(out["strategy"])
            parts.append(out["n_parts"])
            salts.append(out["salt_fanout"])
        return pa.table(
            {
                "col": pa.array(cols, pa.string()),
                "strategy": pa.array(strats, pa.string()),
                "n_parts": pa.array(parts, pa.int64()),
                "salt_fanout": pa.array(salts, pa.int64()),
            }
        )

    def q_dbsink_roundtrip(sf):
        """DB table sink round-trip (the PostgresSlurper face,
        io_.dbsink.DBAPITableSink over stdlib sqlite3): the events table
        distributes into time-rotated day tables (rotation is a pure
        function of EVENT time), chunked inserts, deferred indexes —
        then every rotated table reads back and the union must equal the
        source rows exactly (timestamps as the sink's ISO-us strings).
        Reference: slurper_postgres.go:164-236."""
        import functools
        import sqlite3
        import tempfile

        import pandas as pd

        from fever_ray.io_.dbsink import DBAPITableSink, write_dbapi_tables

        with tempfile.TemporaryDirectory() as td:
            db = f"{td}/events.db"
            sink = DBAPITableSink(
                functools.partial(sqlite3.connect, db, 30.0),
                table_prefix="events",
                rotation_s=86400,
                chunk_rows=4096,
                index_cols=("event_id",),
            )
            res = write_dbapi_tables(
                _t(sf, "events", ["event_id", "ts", "event_type", "value"]),
                sink,
                concurrency=1,
            )
            conn = sqlite3.connect(db)
            try:
                df = pd.concat(
                    [
                        pd.read_sql_query(f'SELECT * FROM "{t}"', conn)
                        for t in res["tables"]
                    ],
                    ignore_index=True,
                )
            finally:
                conn.close()
        return df

    def q_docsink_roundtrip(sf):
        """Document-store sink gate (the MongoSlurper face,
        io_.docsink.MongoDocumentSink over a file-backed stub client):
        events route to per-type capped collections — the corpus's event
        vocabulary mapped onto fever's collection names, with one type
        deliberately left unknown so the misc reroute is exercised — and
        the per-collection landed counts must equal the SQL routing
        exactly.  Reference: slurper_mongodb.go:15-110,196-270."""
        import json as _json
        import os as _os
        import tempfile

        from fever_ray.io_.docsink import (
            MongoDocumentSink,
            write_document_collections,
        )

        TYPE_MAP = {"view": "http", "click": "dns", "purchase": "flow",
                    "signup": "smtp"}  # 'error' stays unknown → misc

        def remap(b: pa.Table) -> pa.Table:
            et = b.column("event_type")
            if isinstance(et, pa.ChunkedArray):
                et = et.combine_chunks()
            mapped = pa.array(
                [TYPE_MAP.get(v, v) for v in et.to_pylist()], pa.string()
            )
            return b.set_column(
                b.schema.get_field_index("event_type"), "event_type", mapped
            )

        # file-backed stub defined as CLOSURES (pickled by value — write
        # tasks can't import __ray_entry__ by name)
        def make_stub(root):
            class Coll:
                def __init__(self, name):
                    self.name = name

                def insert_many(self, docs):
                    with open(_os.path.join(root, f"{self.name}.jsonl"), "a") as fh:
                        for d in docs:
                            fh.write(_json.dumps({"event_id": d["event_id"]}) + "\n")

                def create_index(self, keys, background=False):
                    pass

            class DB:
                def create_collection(self, name, capped=False, size=0):
                    pass

                def __getitem__(self, name):
                    return Coll(name)

            class Client:
                def __getitem__(self, dbname):
                    return DB()

                def close(self):
                    pass

            return Client()

        with tempfile.TemporaryDirectory() as td:

            def connect(root=td):
                return make_stub(root)

            sink = MongoDocumentSink(connect, chunk_docs=4096)
            res = write_document_collections(
                _t(sf, "events", ["event_id", "event_type"]).map_batches(
                    remap, batch_format="pyarrow"
                ),
                sink,
                concurrency=1,
            )
            # read the landed files back: the artifact, not the summary,
            # is what the gate hashes
            rows = []
            for name in sorted(res["collections"]):
                with open(_os.path.join(td, f"{name}.jsonl")) as fh:
                    n = sum(1 for _ in fh)
                rows.append({"collection": name, "n": n})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("collection", pa.string()), ("n", pa.int64())]),
        )

    def q_suggest_card(sf):
        """Constraint SUGGESTION card (deequ's ConstraintSuggestion,
        sketch-first — ops.checks.suggest_checks): two streaming passes
        over documents derive not_null tolerances, small accepted-value
        domains (Misra-Gries keys, exact below k), and integer ranges.
        Emitted as (check_name, detail) string rows whose exact values the
        oracle mirrors with COUNT(nulls) / DISTINCT string_agg / MIN..MAX
        — the suggestion engine's whole output is hash-gated."""
        from fever_ray.ops.checks import suggest_checks

        docs = _t(sf, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
        sug = suggest_checks(docs)
        names, details = [], []
        for spec in sug["rowlocal"]:
            if spec["kind"] == "not_null":
                names.append(spec["name"])
                details.append(str(spec["max_violations"]))
            elif spec["kind"] == "in_set":
                names.append(spec["name"])
                details.append(",".join(spec["values"]))
            elif spec["kind"] == "between":
                names.append(spec["name"])
                details.append(f"{spec['lo']}..{spec['hi']}")
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "detail": pa.array(details, pa.string()),
            }
        )

    def q_data_quality(sf):
        # declarative constraint card: completeness + accepted set + range
        # over events, cross-column consistency over documents, key
        # uniqueness, and lineitem→orders referential integrity — six
        # checks, three execution shapes (row-local pass / distinct-pair
        # shuffle / two-sided bucket anti-join)
        from fever_ray.ops.checks import (
            data_quality_card,
            foreign_key_check,
            rowlocal_checks,
            unique_check,
        )

        ev = _t(sf, "events", ["event_id", "user_id", "event_type", "value"])
        docs = _t(sf, "documents", ["text", "n_chars"])
        li = _t(sf, "lineitem", ["l_orderkey"])
        od = _t(sf, "orders", ["o_orderkey"])
        return data_quality_card(
            [
                rowlocal_checks(
                    ev,
                    [
                        {
                            "name": "events.completeness.user_id",
                            "kind": "not_null",
                            "col": "user_id",
                        },
                        {
                            "name": "events.accepted.event_type",
                            "kind": "in_set",
                            "col": "event_type",
                            "values": ["click", "view", "purchase", "signup"],
                        },
                        {
                            "name": "events.range.value",
                            "kind": "between",
                            "col": "value",
                            "lo": 0.0,
                            "hi": 300.0,
                        },
                    ],
                ),
                rowlocal_checks(
                    docs,
                    [
                        {
                            "name": "documents.consistency.n_chars",
                            "kind": "len_eq",
                            "col": "n_chars",
                            "text_col": "text",
                        }
                    ],
                ),
                unique_check(ev, "event_id", name="events.unique.event_id"),
                foreign_key_check(
                    li, "l_orderkey", od, "o_orderkey",
                    name="lineitem.fk.orderkey",
                ),
            ]
        )

    def q_gopher_rules(sf):
        # Gopher rule battery; stopword list drawn from the corpus
        # vocabulary (the published English list is absent from the
        # synthetic word-soup, which would vacuously fail every doc)
        from fever_ray.ops.curate import gopher_rules

        return gopher_rules(
            _t(sf, "documents", ["doc_id", "lang", "text"]),
            min_words=20,
            max_words=80,
            mwl_lo=4,
            mwl_hi=10,
            stopwords=_GOPHER_STOPS,
            min_stop_hits=3,
        )

    def q_rule_violation_samples(sf):
        # audit card for the gopher battery: the 5 smallest doc_ids
        # violating each fired rule bit (same params as q_gopher_rules)
        from fever_ray.ops.curate import rule_violation_samples

        return rule_violation_samples(
            _t(sf, "documents", ["doc_id", "text"]),
            k=5,
            min_words=20,
            max_words=80,
            mwl_lo=4,
            mwl_hi=10,
            stopwords=_GOPHER_STOPS,
            min_stop_hits=3,
        )

    def q_host_boilerplate(sf):
        # per-host frequent-line scrub over synthesized crawl pages: a
        # GLOBAL-FOOTER line on every page (always boilerplate), a
        # per-host BANNER line on even doc_ids only (~half the host's
        # pages — straddles the strict > 1/2 threshold host by host), and
        # the doc's own text (survives)
        from fever_ray.ops.dedup import host_boilerplate

        ds = _t(sf, "documents", ["doc_id", "text", "source"])

        def synth(b: pa.Table) -> pa.Table:
            n = b.num_rows
            ids = b.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idn = ids.to_numpy(zero_copy_only=False)
            src = b.column("source")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            src = pc.fill_null(pc.cast(src, pa.string()), "")
            text = b.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            text = pc.fill_null(pc.cast(text, pa.string()), "")
            banner_full = pc.binary_join_element_wise(
                pa.array(["BANNER-"] * n), src, pa.array(["\n"] * n), ""
            )
            banner = pc.if_else(pa.array(idn % 2 == 0), banner_full, "")
            text2 = pc.binary_join_element_wise(
                pa.array(["GLOBAL-FOOTER\n"] * n), banner, text, ""
            )
            return pa.table({"doc_id": ids, "source": src, "text": text2})

        return host_boilerplate(
            ds.map_batches(synth, batch_format="pyarrow"),
            min_docs=3, frac_num=1, frac_den=2,
        )

    def q_script_mix(sf):
        # unicode-script profile over script-mixed synthesis: every 11th
        # doc gets n_chars+1 Cyrillic chars (flips dominance), everyone
        # gets id%7 Cyrillic + id%5 Greek tails; RE2 \p{Script} counts on
        # both sides
        from fever_ray.ops.textstats import script_mix

        ds = _t(sf, "documents", ["doc_id", "text", "n_chars"])

        def synth_and_profile(b: pa.Table) -> pa.Table:
            n = b.num_rows
            ids = b.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idn = ids.to_numpy(zero_copy_only=False)
            nch = pc.fill_null(b.column("n_chars"), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            text = b.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            text = pc.fill_null(pc.cast(text, pa.string()), "")
            cy = pc.binary_repeat(
                pa.array(["я"] * n),
                pa.array(np.where(idn % 11 == 0, nch + 1, idn % 7), pa.int64()),
            )
            gr = pc.binary_repeat(
                pa.array(["α"] * n), pa.array(idn % 5, pa.int64())
            )
            t2 = pc.binary_join_element_wise(text, cy, gr, "")
            return script_mix(pa.table({"doc_id": ids, "text": t2}))

        return ds.map_batches(
            synth_and_profile, batch_format="pyarrow", zero_copy_batch=True
        )

    def q_change_point(sf):
        # exact integer CUSUM-analogue breakpoint per event_type over
        # hourly counts: argmax |m·P_i − i·T|, ties to the smallest bucket
        from fever_ray.ops.stats import change_point

        return change_point(_t(sf, "events", ["event_type", "ts"]))

    def q_decontaminate(sf):
        # benchmark = every 97th doc (stands in for a held-out eval suite);
        # drop corpus docs sharing any word 4-gram with it
        docs = _t(sf, "documents", ["doc_id", "lang", "source", "text"])

        def mod97(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 97 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        bench = benchmark_ngram_set(
            docs.map_batches(mod97(True), batch_format="pyarrow"), n=4
        )
        corpus = docs.map_batches(mod97(False), batch_format="pyarrow")
        return decontaminate(corpus, bench, n=4).map_batches(
            lambda b: b.select(["doc_id", "lang", "source"]),
            batch_format="pyarrow",
        )

    def q_chunk_documents(sf):
        return chunk_documents(
            _t(sf, "documents", ["doc_id", "text"]), chunk=16, overlap=4
        )

    def q_epoch_shuffle(sf):
        return epoch_shuffle(
            _t(sf, "documents", ["doc_id"]), seed=21, n_buckets=64
        )

    def q_pack_sequences(sf):
        return pack_sequences(
            _t(sf, "documents", ["doc_id", "text"]),
            budget=256,
            seed=17,
            n_buckets=32,
        )

    def q_per_group_sample(sf):
        # exactly 12 docs per listed language (smallest id-hashes) — the
        # deterministic balanced-subset primitive
        return per_group_sample(
            _t(sf, "documents", ["doc_id", "lang"]),
            12,
            ["en", "de", "fr"],
            seed=29,
            key_col="lang",
        )

    def q_group_percentiles(sf):
        # exact per-priority p50/p90 order statistics of o_totalprice via
        # the prefix-histogram walk — no sort shuffle, element-exact so the
        # float values hash-match the oracle's ROW_NUMBER pick bit-for-bit
        return grouped_order_statistic(
            _t(sf, "orders", ["o_orderpriority", "o_totalprice"]),
            "o_orderpriority",
            "o_totalprice",
            qs=[(1, 2), (9, 10)],
            out_cols=["p50_price", "p90_price"],
        )

    def q_quantile_bucket(sf):
        # exact global NTILE(8) over (n_tokens, id-hash, id) — curriculum
        # bucketing without a global sort: value-histogram prefix ranks,
        # heavy values salted across 2^sub_bits cells, one skinny shuffle
        from fever_ray.ops.curate import _token_counts
        from fever_ray.ops.stats import quantile_bucket

        counts = _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: _token_counts(b, "text", "doc_id"),
            batch_format="pyarrow",
        )
        return quantile_bucket(counts, "n_tokens", k=8, seed=21)

    def q_unigram_logloss(sf):
        # CCNet-style LM-surprise quality score: unigram model from the
        # English slice, every doc scored in exact integer bits
        from fever_ray.ops.textstats import unigram_logloss

        docs = _t(sf, "documents", ["doc_id", "text", "lang"])
        ref = docs.filter(expr="lang == 'en'")
        return unigram_logloss(docs, ref)

    def q_pivot_counts(sf):
        # long -> wide activity profile: events per type per user;
        # prefix="" so the column set is data-derived on BOTH sides (the
        # oracle is a dynamic PIVOT) — no fixed event-type domain baked in
        from fever_ray.ops.relational import pivot_counts

        ev = _t(sf, "events", ["user_id", "event_type"])
        return pivot_counts(ev, "user_id", "event_type", prefix="")

    def q_transition_counts(sf):
        # per-user Markov step matrix: consecutive event-type pairs in
        # (ts, event_id) order
        from fever_ray.ops.windows import transition_counts

        ev = _t(sf, "events", ["event_id", "user_id", "ts", "event_type"])
        return transition_counts(ev)

    def q_decayed_counts(sf):
        # recency-weighted activity leaderboard: each event worth
        # 2^(40 - age/3d) — exact power-of-2 decay, no float drift
        from fever_ray.ops.windows import decayed_counts

        ev = _t(sf, "events", ["ts", "user_id"])
        return decayed_counts(
            ev, ref_ts="2024-01-31T00:00:00", half_life_s=3 * 86400
        )

    def q_quantile_bucket_approx(sf):
        # unbounded-domain companion of quantile_bucket: KLL split points
        # (exact order statistics below saturation), zero-shuffle annotate
        from fever_ray.ops.curate import _token_counts
        from fever_ray.ops.stats import quantile_bucket_approx

        counts = _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: _token_counts(b, "text", "doc_id"),
            batch_format="pyarrow",
        )
        return quantile_bucket_approx(counts, "n_tokens", k=8, kll_k=8192)

    def q_corpus_report(sf):
        # one-pass dataset audit card, all integers
        from fever_ray.ops.textstats import corpus_report

        return corpus_report(_t(sf, "documents", ["text", "lang", "source"]))

    def q_winsorize(sf):
        # p5/p95 outlier clipping of token counts; integer dtype preserved
        from fever_ray.ops.curate import _token_counts
        from fever_ray.ops.stats import winsorize

        counts = _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: _token_counts(b, "text", "doc_id"),
            batch_format="pyarrow",
        )
        return winsorize(counts, "n_tokens", lo_q=0.05, hi_q=0.95, kll_k=8192)

    def q_zscore_outliers(sf):
        # distribution-tail audit at 1.5σ over char lengths; the float
        # z-score predicate runs as an exact integer isqrt comparison so
        # the boundary cannot drift vs the oracle's HUGEINT cross-multiply
        from fever_ray.ops.stats import zscore_outliers

        return zscore_outliers(
            _t(sf, "documents", ["doc_id", "n_chars"]), "n_chars",
            k_num=3, k_den=2,
        )

    def q_mad_outliers(sf):
        # robust 1.5-MAD tail over char lengths: median and MAD are exact
        # histogram-refined order statistics, predicate is an integer
        # cross-multiply — the robust sibling of zscore_outliers
        from fever_ray.ops.stats import mad_outliers

        return mad_outliers(
            _t(sf, "documents", ["doc_id", "n_chars"]), "n_chars",
            k_num=3, k_den=2,
        )

    def _docs_tok(sf):
        # shared (source, n_chars, n_tokens) builder for the moments/OLS
        # gates: ONE token rule (spaces+1 == len(string_split)) so the two
        # oracles cannot drift independently
        def add_tok(b):
            # fill_null first: the oracles COALESCE to '' (1 token), and
            # count_substring(NULL)+1 would null n_tokens and trip the
            # moments null guard instead
            txt = pc.fill_null(pc.cast(b.column("text"), pa.string()), "")
            y = pc.add(pc.count_substring(txt, " "), 1)
            return b.append_column("n_tokens", pc.cast(y, pa.int64()))

        return _t(sf, "documents", ["source", "text", "n_chars"]).map_batches(
            add_tok, batch_format="pyarrow"
        )

    def q_group_moments(sf):
        # per-source exact covariance components over (char length, token
        # count) — all-integer second moments, bit-stable at any partial
        # order; the correlation audit for feature drift
        from fever_ray.ops.stats import group_moments

        return group_moments(_docs_tok(sf), "source", "n_chars", "n_tokens")

    def q_weighted_median(sf):
        # token-weighted median char length: "the median TOKEN lives in a
        # doc of what length" — skew-honest where the doc median is not
        from fever_ray.ops.stats import weighted_median

        return weighted_median(_docs_tok(sf), "n_chars", "n_tokens")

    def q_group_regression(sf):
        # per-source OLS token-count-vs-chars fit from the exact moments
        from fever_ray.ops.stats import group_regression

        return group_regression(_docs_tok(sf), "source", "n_chars", "n_tokens")

    def q_group_entropy(sf):
        # per-source language-mix diversity in exact integer bits
        # (n·ilog2(n) − Σ c·ilog2(c)); 0 ⇔ the source collapsed to one lang
        from fever_ray.ops.stats import group_entropy_bits

        return group_entropy_bits(
            _t(sf, "documents", ["source", "lang"]), "source", "lang"
        )

    def q_vocab_coverage(sf):
        # tokenizer-budget audit: the minimal (count desc, token asc)
        # vocabulary prefix whose exact mass reaches half of all token
        # occurrences; the cut is integer cross-multiplied on both sides
        from fever_ray.ops.textstats import vocab_coverage

        return vocab_coverage(
            _t(sf, "documents", ["text"]), p_num=1, p_den=2
        )

    def q_distribution_drift(sf):
        # week-over-week crawl-shape audit: split the corpus on doc_id
        # parity, histogram char lengths on both sides, flag bins whose
        # share moved > 1% via the exact cross-multiplied inequality
        from fever_ray.ops.stats import distribution_drift

        def add_side(b):
            side = pc.cast(
                pc.bit_wise_and(b.column("doc_id"), pa.scalar(1, pa.int64())),
                pa.int64(),
            )
            return b.append_column("side", side)

        docs = _t(sf, "documents", ["doc_id", "n_chars"]).map_batches(
            add_side, batch_format="pyarrow"
        )
        return distribution_drift(
            docs, "n_chars", "side", lo=0, hi=640, n_bins=16,
            t_num=1, t_den=100,
        )

    def q_value_histogram(sf):
        # fixed-bin audit histogram of document char lengths
        from fever_ray.ops.stats import value_histogram

        return value_histogram(
            _t(sf, "documents", ["n_chars"]), "n_chars", lo=0, hi=640,
            n_bins=16,
        )

    def q_importance_resample(sf):
        # DSIR-style score-proportional keep: weight = token count, docs
        # with >= 64 tokens always survive, shorter ones thin out smoothly
        from fever_ray.ops.curate import _token_counts, importance_resample

        counts = _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: _token_counts(b, "text", "doc_id"),
            batch_format="pyarrow",
        )
        return importance_resample(counts, "n_tokens", scale=64, seed=11)

    def q_normalize_urls(sf):
        # synthesize messy crawl URLs from documents (upper-case host,
        # default port, tracking params, fragment) and canonicalize; the
        # oracle builds the identical URLs and mirrors the normalization
        # with the same RE2 engine
        ds = _t(sf, "documents", ["doc_id", "lang", "source"])

        def synth(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idn = ids.to_numpy(zero_copy_only=False)
            idstr = pc.cast(ids, pa.string())
            n = b.num_rows
            src = pc.utf8_upper(pc.cast(b.column("source").combine_chunks()
                                        if isinstance(b.column("source"), pa.ChunkedArray)
                                        else b.column("source"), pa.string()))
            lang = pc.cast(b.column("lang").combine_chunks()
                           if isinstance(b.column("lang"), pa.ChunkedArray)
                           else b.column("lang"), pa.string())
            q = pc.if_else(
                pa.array(idn % 3 == 0),
                pc.binary_join_element_wise(
                    pa.array(["?utm_source=x&fbclid=1&id="] * n), idstr, ""
                ),
                pc.binary_join_element_wise(pa.array(["?id="] * n), idstr, ""),
            )
            frag = pc.if_else(
                pa.array(idn % 2 == 0), pa.array(["#f"] * n), pa.array([""] * n)
            )
            url = pc.binary_join_element_wise(
                pa.array(["HTTPS://WWW."] * n), src,
                pa.array([".Test:443/p/"] * n), lang, q, frag, ""
            )
            return pa.table({"doc_id": ids, "url": url})

        return normalize_urls(
            ds.map_batches(synth, batch_format="pyarrow")
        ).map_batches(
            lambda b: b.select(["doc_id", "url", "url_norm"]),
            batch_format="pyarrow",
        )

    def q_url_canonical_dedup(sf):
        # crawl-style duplicate URLs (same page behind varying tracking
        # junk / fragments / default port) → normalize → keep-min-id per
        # canonical URL; the synth is mirrored byte-for-byte in SQL and
        # both sides normalize through one definition
        from fever_ray.ops.dedup import keyed_dedup

        ds = _t(sf, "documents", ["doc_id", "source"])

        def synth(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idn = ids.to_numpy(zero_copy_only=False)
            n = b.num_rows
            src = pc.utf8_upper(
                pc.cast(
                    b.column("source").combine_chunks()
                    if isinstance(b.column("source"), pa.ChunkedArray)
                    else b.column("source"),
                    pa.string(),
                )
            )
            pathn = pc.cast(pa.array(idn % 50), pa.string())
            junk4 = np.array(["?utm_source=x", "?fbclid=1", "#frag", ""])
            junk = pa.array(junk4[idn % 4], pa.string())
            url = pc.binary_join_element_wise(
                pa.array(["HTTPS://WWW."] * n), src,
                pa.array([".Test:443/p/"] * n), pathn, junk, ""
            )
            return pa.table({"doc_id": ids, "url": url})

        normed = normalize_urls(ds.map_batches(synth, batch_format="pyarrow"))
        return keyed_dedup(normed, "url_norm", id_col="doc_id")

    def q_normalize_text(sf):
        # synthesize unicode-messy text from documents (decomposed e+U+0301
        # prefix, whitespace runs, odd rows get a tab-padded suffix) and
        # canonicalize; the oracle builds the identical mess with chr()
        # concatenation and mirrors NFC (both sides are utf8proc) plus the
        # RE2 whitespace collapse and the explicit space-only trim
        ds = _t(sf, "documents", ["doc_id", "text"])

        def synth(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id")
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            idn = ids.to_numpy(zero_copy_only=False)
            n = b.num_rows
            text = b.column("text")
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
            suffix = pc.if_else(
                pa.array(idn % 2 == 1),
                pa.array(["\t tail  "] * n),
                pa.array([""] * n),
            )
            messy = pc.binary_join_element_wise(
                pa.array(["e\u0301  head\t"] * n),  # decomposed; NFC -> \u00e9
                pc.cast(text, pa.string()),
                suffix,
                "",
            )
            return pa.table({"doc_id": ids, "text": messy})

        return normalize_text(
            ds.map_batches(synth, batch_format="pyarrow")
        ).map_batches(
            lambda b: b.select(["doc_id", "text_norm"]),
            batch_format="pyarrow",
        )

    def q_doc_top_terms(sf):
        # 3 most characteristic tokens per doc by (tf DESC, df ASC, token)
        # — integer tf-idf analog, no float ranking
        return doc_top_terms(_t(sf, "documents", ["doc_id", "text"]), k=3)

    def q_bm25_search(sf):
        # top-15 docs by integer-quantized BM25 (k1=6/5, b=3/4, ilog2
        # idf, 1024x fixed-point) — bit-stable ranked retrieval.  'dup'
        # is the one rare token in the documents vocabulary (idf 4);
        # the common terms quantize to idf 0, so the gate exercises the
        # tf-saturation + length-normalization arithmetic
        return bm25_search(
            _t(sf, "documents", ["doc_id", "text"]),
            "dup line vector",
            k=15,
        )

    def q_keyword_search(sf):
        # exact top-15 docs by total query-term occurrences (integer
        # scores, ties to the smaller id — bit-stable ranking)
        return keyword_search(
            _t(sf, "documents", ["doc_id", "text"]),
            "table window vector",
            k=15,
        )

    def q_inverted_index(sf):
        # token → (df, first-16 postings) index slice; df always counts
        # every document, truncation only bounds the postings string
        return inverted_index(
            _t(sf, "documents", ["doc_id", "text"]), max_postings=16
        )

    def q_cross_dedup(sf):
        # incremental-ingest shape: dedupe the corpus (doc_id % 7 != 0)
        # against an already-ingested reference (doc_id % 7 == 0) by the
        # exact_dedup content hash; only skinny hash rows ever move
        from fever_ray.ops.dedup import cross_dedup

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod7(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 7 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        return cross_dedup(
            docs.map_batches(mod7(False), batch_format="pyarrow"),
            docs.map_batches(mod7(True), batch_format="pyarrow"),
        )

    def q_corpus_intersect(sf):
        # overlap audit (the semi-join flip of cross_dedup): corpus = ALL
        # docs, reference = the mod-3 slice — matched docs are exactly
        # that slice (the corpus has no exact-duplicate texts), a
        # non-empty overlap at every scale
        from fever_ray.ops.dedup import corpus_intersect

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod3(b):
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 3 == 0))

        return corpus_intersect(
            docs, docs.map_batches(mod3, batch_format="pyarrow")
        )

    def q_embedding_cluster(sf):
        # SemDeDup step 1: deterministic hash-sampled centroids + one
        # broadcast-matmul assignment pass (no iterative k-means — pure
        # function of (ids, seed), resume-stable)
        from fever_ray.ops.cluster import embedding_cluster

        return embedding_cluster(
            _t(sf, "embeddings", ["vec_id", "embedding"]), k=8, seed=1
        )

    def q_semdedup(sf):
        # SemDeDup step 2: within-cluster cosine near-dup drop; policy =
        # "a smaller-id >= 0.4-similar row in my cluster drops me"
        from fever_ray.ops.cluster import semdedup

        return semdedup(
            _t(sf, "embeddings", ["vec_id", "embedding"]),
            k=8, threshold=0.4, seed=1,
        )

    def q_knn_graph(sf):
        # cluster-bounded exact kNN self-join: each vector's top-4 cosine
        # neighbors inside its embedding cluster (the tractable form of the
        # all-pairs neighbor graph)
        from fever_ray.ops.cluster import knn_graph

        return knn_graph(
            _t(sf, "embeddings", ["vec_id", "embedding"]),
            n_neighbors=4, k_clusters=8, seed=1,
        )

    def q_semantic_decontaminate(sf):
        # semantic eval-leakage scrub: benchmark = every 11th vector;
        # corpus rows >= 0.4-cosine-close to any benchmark row drop
        from fever_ray.ops.cluster import semantic_decontaminate

        emb = _t(sf, "embeddings", ["vec_id", "embedding"])

        def mod11(eq: bool):
            def f(b):
                ids = b.column("vec_id").to_numpy(zero_copy_only=False)
                hit = ids % 11 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        return semantic_decontaminate(
            emb.map_batches(mod11(False), batch_format="pyarrow"),
            emb.map_batches(mod11(True), batch_format="pyarrow"),
            threshold=0.4,
        )

    def q_window_top_k(sf):
        # trending/leaderboard composition: daily windows x per-key counts
        # x per-window top-3, one shuffle of per-batch partial counts
        from fever_ray.ops.windows import window_top_k

        return window_top_k(
            _t(sf, "events", ["ts", "user_id"]), size_s=86400, k=3
        )

    def q_bpe_train(sf):
        # BPE vocabulary training (Sennrich 2016) in the production shape:
        # one corpus pass -> word histogram; merge rounds touch only the
        # vocab-bounded symbol arrays.  Deterministic merge table (count
        # DESC, lexicographic tie-break); gated rows-only (sequential merge
        # semantics are not SQL-expressible) + reference-parity pytest
        from fever_ray.ops.bpe import bpe_train

        return bpe_train(_t(sf, "documents", ["doc_id", "text"]), num_merges=32)

    def q_bpe_token_counts(sf):
        # tokenize the corpus under the trained merges: broadcast merge
        # list, R vectorized merge passes per batch, no shuffle
        from fever_ray.ops.bpe import bpe_token_counts, bpe_train

        merges = bpe_train(_t(sf, "documents", ["doc_id", "text"]), num_merges=32)
        return bpe_token_counts(_t(sf, "documents", ["doc_id", "text"]), merges)

    def q_linear_score(sf):
        # quality-classifier stage shape: broadcast integer model, per-actor
        # LUT, vectorized hashed-BoW featurization + segment sums; the
        # deterministic stand-in model is SQL-mirrored bit-exactly
        from fever_ray.ops.mlscore import linear_score

        return linear_score(_t(sf, "documents", ["doc_id", "text"]))

    def q_minhash_cross_dedup(sf):
        # fuzzy incremental-ingest shape: same % 7 split as cross_dedup,
        # but a corpus doc is dropped when a NEAR duplicate (shingle
        # Jaccard >= 0.7 via LSH candidates) exists in the reference —
        # catches boilerplate re-renders exact hashing misses
        from fever_ray.ops.dedup import minhash_cross_dedup

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod7(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 7 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        return minhash_cross_dedup(
            docs.map_batches(mod7(False), batch_format="pyarrow"),
            docs.map_batches(mod7(True), batch_format="pyarrow"),
        )

    def q_bloom_cross_dedup(sf):
        # same incremental-ingest shape on a % 5 split, through the
        # DCSO-bloom prefilter + exact-verify path; exactness is
        # independent of the filter's p, so the oracle is the plain
        # anti-join — any false positive the verify stage failed to clear
        # (or false negative, impossible by construction) hash-mismatches
        from fever_ray.ops.dedup import bloom_cross_dedup

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod5(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 5 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        return bloom_cross_dedup(
            docs.map_batches(mod5(False), batch_format="pyarrow"),
            docs.map_batches(mod5(True), batch_format="pyarrow"),
            p=1e-2,
        )

    def q_token_budget_select(sf):
        # "first 8k tokens of the corpus" in seeded shuffle order — docs
        # kept atomically; only the boundary bucket is ever sorted
        return token_budget_select(
            _t(sf, "documents", ["doc_id", "text"]),
            budget=8000,
            seed=23,
            n_buckets=64,
        )

    def q_mixture_sample(sf):
        # exact 3:1:2 source mix over src0/src1/src2: keep k_s = w_s * m
        # rows per source (smallest id-hashes), m = min(n_s // w_s) —
        # all-integer semantics mirrored by the oracle's ROW_NUMBER
        return mixture_sample(
            _t(sf, "documents", ["doc_id", "source"]),
            {"src0": 3, "src1": 1, "src2": 2},
            seed=19,
        )

    def q_repeat_corpus(sf):
        # Dolma-style integer epoch mix: 3 epochs of zh, 2 of fr, es
        # removed, everything else once; copy_id 0..k-1 per row
        return repeat_corpus(
            _t(sf, "documents", ["doc_id", "lang"]),
            {"en": 1, "zh": 3, "fr": 2, "es": 0},
            key_col="lang",
            default=1,
        )

    def q_line_dedup(sf):
        # CCNet-style duplicate-line scrub over synthetic 3-line docs
        # (text \n lang \n source): lang lines are corpus-wide boilerplate
        # (dropped), source lines sit near the threshold, text lines are
        # unique — exercises counting, membership and reassembly
        ds = _t(sf, "documents", ["doc_id", "text", "lang", "source"])

        def mk(b: pa.Table) -> pa.Table:
            cols = [
                b.column(c).combine_chunks() if isinstance(b.column(c), pa.ChunkedArray) else b.column(c)
                for c in ("text", "lang", "source")
            ]
            joined = pc.binary_join_element_wise(
                *[pc.cast(c, pa.string()).fill_null("") for c in cols], "\n"
            )
            return pa.table({"doc_id": b.column("doc_id"), "text": joined})

        return line_dedup(
            ds.map_batches(mk, batch_format="pyarrow"), threshold=30
        )

    def q_dup_ngram_windows(sf):
        # exact substring-window duplication profile (Lee et al. 2021 shape)
        return dup_ngram_windows(
            _t(sf, "documents", ["doc_id", "text"]), n=5
        )

    def q_dup_ngram_trim(sf):
        # the span-removal ACTION of exact substring dedup
        return dup_ngram_trim(_t(sf, "documents", ["doc_id", "text"]), n=5)

    def q_domain_cap(sf):
        ds = domain_cap(_t(sf, "documents", ["doc_id", "source"]), cap=7)
        return ds.map_batches(
            lambda b: b.select(["doc_id", "source"]), batch_format="pyarrow"
        )

    def q_token_repetition(sf):
        return _t(sf, "documents", ["doc_id", "text"]).map_batches(
            lambda b: token_repetition(b).select(
                [
                    "doc_id",
                    "n_tokens",
                    "n_distinct_tokens",
                    "dup_token_ratio",
                    "top_token_frac",
                ]
            ),
            batch_format="pyarrow",
        )

    def q_curation_filter(sf):
        ds = curation_filter(
            _t(sf, "documents", ["doc_id", "text"]),
            min_tokens=40,
            max_tokens=120,
            max_dup_ratio=0.5,
            max_top_frac=0.16,
        )
        return ds.map_batches(
            lambda b: b.select(["doc_id", "len_ok", "rep_ok", "keep"]),
            batch_format="pyarrow",
        )

    def q_regex_scrub(sf):
        # sequential RE2 scrub rules; Arrow and DuckDB share the RE2
        # engine, so replace + non-overlapping match counts mirror exactly
        ds = regex_scrub(
            _t(sf, "documents", ["doc_id", "text"]),
            rules=[(r"[aeiou]+", "*"), (r"[xyz]", "#")],
        )
        return ds.map_batches(
            lambda b: b.select(["doc_id", "scrubbed", "n_redactions"]),
            batch_format="pyarrow",
        )

    def q_top_ngrams(sf):
        # corpus-wide exact bigram counts, top 20, lexicographic tie-break
        return top_ngrams(_t(sf, "documents", ["doc_id", "text"]), n=2, k=20)

    def q_heavy_ngrams(sf):
        # sketch-pruned exact heavy hitters: CMS pass bounds the shuffle,
        # the exact survivor count + HAVING removes all false positives —
        # the answer is exact, so the plain SQL HAVING mirrors it
        return heavy_ngrams(
            _t(sf, "documents", ["doc_id", "text"]),
            n=2, min_count=35, k=20, width=1 << 16, depth=4,
        )

    def q_quantile_length_filter(sf):
        # sketch-driven filter: KLL learns the p10/p90 token-count
        # thresholds in pass 1; below saturation (500 docs < k=1024 buffer)
        # the KLL quantile IS the exact "first rank ≥ q·n" order statistic,
        # which the oracle computes with a window function
        return quantile_length_filter(
            _t(sf, "documents", ["doc_id", "text"]), lo_q=0.1, hi_q=0.9, kll_k=1024
        )

    # ---- dedup family ----------------------------------------------------
    def q_connected_components(sf):
        # deterministic chain graph over the events user ids: edge
        # (u-1, u) whenever u % 10 != 0 → components are the runs of 10
        # consecutive ids.  Oracle: DuckDB recursive CTE computing min
        # reachable id over the symmetric closure — the exact semantic of
        # distributed min-label propagation.
        def edges(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            a = u[u % 10 != 0]
            return pa.table(
                {
                    "doc_a": pa.array(a - 1, type=pa.int64()),
                    "doc_b": pa.array(a, type=pa.int64()),
                }
            )

        e = _t(sf, "events", ["user_id"]).map_batches(edges, batch_format="pyarrow")
        return connected_components(e, num_partitions=8)

    def q_exact_dedup(sf):
        ds = exact_dedup(_t(sf, "documents", ["doc_id", "text"]))
        return ds.map_batches(
            lambda b: b.select(["keep_id", "n_copies"]), batch_format="pyarrow"
        )

    def q_minhash_dedup(sf):
        return minhash_dedup_components(_t(sf, "documents", ["doc_id", "text"]))

    def q_minhash_sigs_dedup(sf):
        # the stored-signature path end-to-end: encode signatures once,
        # derive LSH candidates from the STORED codes (no text touched),
        # then the shared verify+components stages — must equal the inline
        # minhash_dedup result exactly (same oracle SQL)
        from fever_ray.ops.dedup import (
            minhash_candidates_from_sigs, minhash_encode,
        )

        docs = _t(sf, "documents", ["doc_id", "text"])
        sigs = minhash_encode(docs)
        pairs = minhash_candidates_from_sigs(sigs)
        return minhash_dedup_components(docs, pairs=pairs)

    def q_source_dup_report(sf):
        from fever_ray.ops.dedup import source_dup_report

        return source_dup_report(
            _t(sf, "documents", ["doc_id", "source", "text"])
        )

    def q_group_ks_drift(sf):
        # which source's length distribution drifted vs the rest?
        from fever_ray.ops.stats import group_ks_drift

        return group_ks_drift(
            _t(sf, "documents", ["source", "n_chars"]), "source", "n_chars"
        )

    def q_dedup_savings(sf):
        # dedup ROI: bytes kept vs saved by exact dedup (one summary row)
        from fever_ray.ops.dedup import dedup_savings

        return dedup_savings(_t(sf, "documents", ["doc_id", "text"]))

    def q_activity_profile(sf):
        # day-of-week x hour event census (epoch arithmetic both sides)
        from fever_ray.ops.aggregates import tree_groupby

        def partial(b: pa.Table) -> pa.Table:
            us = pc.cast(b.column("ts"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            day = us // 86_400_000_000
            t = pa.table(
                {
                    "dow": pa.array((day + 4) % 7, pa.int64()),
                    "hour": pa.array(
                        (us % 86_400_000_000) // 3_600_000_000, pa.int64()
                    ),
                }
            )
            g = pa.TableGroupBy(t, ["dow", "hour"]).aggregate(
                [([], "count_all")]
            )
            return g.rename_columns(["dow", "hour", "n"])

        return tree_groupby(
            _t(sf, "events", ["ts"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["dow", "hour"],
            [("n", "sum")],
        )

    def q_day_overlap(sf):
        # day-over-day payload overlap (crawl stability curve)
        from fever_ray.ops.dedup import day_overlap

        return day_overlap(_t(sf, "events", ["props", "ts"]), text_col="props")

    def q_content_churn(sf):
        # per-day distinct vs first-seen payloads (recrawl freshness)
        from fever_ray.ops.dedup import content_churn

        return content_churn(
            _t(sf, "events", ["props", "ts"]), text_col="props"
        )

    def q_session_length_histogram(sf):
        # composition gate: sessionize -> exact length histogram
        from fever_ray.ops.aggregates import tree_groupby
        from fever_ray.ops.windows import sessionize

        s = sessionize(_t(sf, "events", ["user_id", "ts"]))

        def partial(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b.select(["n_events"]), ["n_events"]).aggregate(
                [([], "count_all")]
            )
            return t.rename_columns(["n_events", "n_sessions"])

        return tree_groupby(
            s.map_batches(partial, batch_format="pyarrow"),
            ["n_events"],
            [("n_sessions", "sum")],
        )

    def q_template_census(sf):
        # digit-blind payload template census over event props
        from fever_ray.ops.dedup import template_census

        return template_census(_t(sf, "events", ["props"]), "props")

    def q_source_overlap(sf):
        # cross-source shared-content matrix (diagonal = per-source
        # distinct counts, so Jaccard falls out downstream)
        from fever_ray.ops.dedup import source_overlap

        return source_overlap(_t(sf, "documents", ["source", "text"]))

    def q_keeper_election(sf):
        # close the dedup pipeline: elect one canonical doc per minhash
        # cluster under (source priority, doc_id); priority = numeric
        # source suffix mod 5 (ties planted by construction)
        import pyarrow.parquet as pq

        from fever_ray.ops.dedup import keeper_election

        srcs = pc.unique(
            pq.read_table(
                f"{sf}/documents.parquet", columns=["source"]
            ).column("source")
        ).to_pylist()
        pr = {s: int(s[3:]) % 5 for s in srcs}
        clusters = minhash_dedup_components(
            _t(sf, "documents", ["doc_id", "text"])
        )
        return keeper_election(
            clusters, _t(sf, "documents", ["doc_id", "source"]), pr
        )

    def q_containment_pairs(sf):
        from fever_ray.ops.dedup import containment_pairs

        return containment_pairs(_t(sf, "documents", ["doc_id", "text"]))

    def q_containment_capped(sf):
        # candidate-ceiling variant: the exact global df-histogram pre-pass
        # picks the largest effective rarity cap whose PREDICTED pair count
        # fits 2x the corpus row count (a linear budget), and the expansion
        # runs at that cap — the deterministic bound on candidate
        # densification (the 10M step's 171M-pair regime); the oracle
        # mirrors histogram -> windowed cumulative -> MAX(df) selection
        from fever_ray.ops.dedup import containment_pairs

        # 20x rows: tightens to cap_eff 3/3/6 at sf0.001/0.01/0.1 (between
        # the df=2 cliff and the uncapped prediction at every gate scale)
        docs = _t(sf, "documents", ["doc_id", "text"])
        return containment_pairs(docs, max_candidates=20 * docs.count())

    def q_allpairs_similarity(sf):
        # EXACT set-similarity self-join (AllPairs prefix filter): zero
        # false negatives, the recall-complete complement of MinHash LSH
        from fever_ray.ops.dedup import allpairs_similarity_join

        return allpairs_similarity_join(
            _t(sf, "documents", ["doc_id", "text"]), t_num=1, t_den=2
        )

    def q_token_edit_dups(sf):
        # SymSpell deletion-neighborhood candidates + exact vectorized
        # Levenshtein verify; oracle is the semantic nested-loop
        # levenshtein() join over the same vocabulary
        from fever_ray.ops.editsim import token_edit_dups

        return token_edit_dups(_t(sf, "documents", ["text"]), max_dist=2)

    def q_token_variant_clusters(sf):
        # canonical spelling map: components over the variant graph with
        # hash-valued min labels (editsim × graph composition)
        from fever_ray.ops.editsim import token_variant_clusters

        return token_variant_clusters(_t(sf, "documents", ["text"]), max_dist=2)

    def q_cooccurrence_counts(sf):
        # doc-level co-occurrence over the exact top-16 vocabulary; pure
        # integer (pair, both, a, b) counts so PMI-style scores derive
        # outside the engine
        from fever_ray.ops.textstats import cooccurrence_counts

        return cooccurrence_counts(_t(sf, "documents", ["text"]), v=16)

    def q_ngram_novelty(sf):
        # per-doc count of corpus-unique shingles — the diversity dual of
        # the dedup family, same shingle hashes as minhash/containment
        from fever_ray.ops.textstats import ngram_novelty

        return ngram_novelty(_t(sf, "documents", ["doc_id", "text"]))

    def q_triangle_counts(sf):
        # deterministic chain+skip graph over the event user ids: edges
        # (u-1, u) when u%10 != 0 and (u-2, u) when u%10 >= 2, so each
        # consecutive triple inside a run of 10 closes a triangle
        from fever_ray.ops.graph import triangle_counts

        def edges(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            a1 = u[u % 10 != 0]
            a2 = u[u % 10 >= 2]
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([a1 - 1, a2 - 2]), pa.int64()
                    ),
                    "dst": pa.array(np.concatenate([a1, a2]), pa.int64()),
                }
            )

        ev = _t(sf, "events", ["user_id"]).map_batches(
            edges, batch_format="pyarrow"
        )
        return triangle_counts(ev)

    def q_edge_support(sf):
        # k-truss primitive on the same chain+skip graph: per-edge common
        # neighbor counts; zero-support edges drop on both sides (the SQL
        # inner join and the engine's matched-triangles-only credit agree)
        from fever_ray.ops.graph import edge_support

        def edges(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            a1 = u[u % 10 != 0]
            a2 = u[u % 10 >= 2]
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([a1 - 1, a2 - 2]), pa.int64()
                    ),
                    "dst": pa.array(np.concatenate([a1, a2]), pa.int64()),
                }
            )

        ev = _t(sf, "events", ["user_id"]).map_batches(
            edges, batch_format="pyarrow"
        )
        return edge_support(ev)

    def q_k_core(sf):
        # 3-core of a three-family deterministic graph (chain, skip-2,
        # skip-3 inside each run of 10 user ids): simultaneous peeling
        # converges in 2 rounds at every scale; the oracle unrolls 4
        # rounds — post-fixpoint rounds are provable no-ops
        from fever_ray.ops.graph import k_core

        def edges(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            a1 = u[u % 10 != 0]
            a2 = u[u % 10 >= 2]
            a3 = u[u % 10 >= 5]
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([a1 - 1, a2 - 2, a3 - 3]), pa.int64()
                    ),
                    "dst": pa.array(
                        np.concatenate([a1, a2, a3]), pa.int64()
                    ),
                }
            )

        ev = _t(sf, "events", ["user_id"]).map_batches(
            edges, batch_format="pyarrow"
        )
        return k_core(ev, k=3)

    def q_bfs_layers(sf):
        # multi-source BFS over the chain+skip graph (edges (u-1, u) when
        # u%10 != 0, (u-2, u) when u%10 >= 2): components are runs of 10
        # user ids, seeds are the u%100 == 0 users, 3 frontier rounds, so
        # within a seeded run the skip edges reach nodes 1..6 at dists
        # 1,1,2,2,3,3 and nodes 7..9 stay beyond the horizon
        from fever_ray.ops.graph import bfs_layers

        def edges(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            a1 = u[u % 10 != 0]
            a2 = u[u % 10 >= 2]
            return pa.table(
                {
                    "src": pa.array(
                        np.concatenate([a1 - 1, a2 - 2]), pa.int64()
                    ),
                    "dst": pa.array(np.concatenate([a1, a2]), pa.int64()),
                }
            )

        def seeds(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            return pa.table({"node": pa.array(u[u % 100 == 0], pa.int64())})

        ev = _t(sf, "events", ["user_id"])
        return bfs_layers(
            ev.map_batches(edges, batch_format="pyarrow"),
            ev.map_batches(seeds, batch_format="pyarrow"),
            rounds=3,
        )

    def q_group_share(sf):
        from fever_ray.ops.relational import group_share

        return group_share(
            _t(sf, "events", ["event_id", "event_type", "value"])
        )

    def q_zipf_audit(sf):
        # exact log2-bucket OLS moments of the rank-frequency curve
        from fever_ray.ops.textstats import zipf_audit

        return zipf_audit(_t(sf, "documents", ["text"]))

    def q_vocab_growth(sf):
        from fever_ray.ops.textstats import vocab_growth

        return vocab_growth(
            _t(sf, "documents", ["doc_id", "text"]), n_checkpoints=10
        )

    def q_vocab_drift(sf):
        from fever_ray.ops.textstats import vocab_drift

        # 0.1% rate-difference threshold: the parity halves are statistical
        # twins, so only sampling noise crosses it — a mixed flag column
        return vocab_drift(
            _t(sf, "documents", ["doc_id", "text"]), v=20, t_num=1, t_den=1000
        )

    def q_corpus_checksum(sf):
        from fever_ray.ops.textstats import corpus_checksum

        return corpus_checksum(_t(sf, "documents", ["text"]))

    def q_snapshot_diff(sf):
        # two deterministic snapshot derivations of the documents table:
        # old = ids % 5 != 0; new = ids % 7 != 0 with ' v2' appended to the
        # text of ids % 3 == 0 (plants all three statuses at every sf)
        from fever_ray.ops.dedup import snapshot_diff

        def old_side(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % 5 != 0))

        def new_side(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(ids % 7 != 0))
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            txt = b.column("text")
            if isinstance(txt, pa.ChunkedArray):
                txt = txt.combine_chunks()
            appended = pc.binary_join_element_wise(
                txt, pa.array(["v2"] * len(b), pa.string()), " "
            )
            mod = pc.if_else(pa.array(ids % 3 == 0), appended, txt)
            return b.set_column(b.schema.get_field_index("text"), "text", mod)

        docs = lambda: _t(sf, "documents", ["doc_id", "text"])  # noqa: E731
        return snapshot_diff(
            docs().map_batches(old_side, batch_format="pyarrow"),
            docs().map_batches(new_side, batch_format="pyarrow"),
        )

    def q_sorted_neighbor_pairs(sf):
        from fever_ray.ops.dedup import sorted_neighbor_pairs

        return sorted_neighbor_pairs(
            _t(sf, "documents", ["doc_id", "text"]), window=4, same_prefix=8
        )

    def q_embedding_quantize(sf):
        from fever_ray.ops.knn import quantize_embeddings, unpack_quantized

        return unpack_quantized(
            quantize_embeddings(_t(sf, "embeddings", ["vec_id", "embedding"]))
        )

    def q_simhash_pairs(sf):
        return simhash_near_dup_pairs(_t(sf, "documents", ["doc_id", "text"]))

    def q_embedding_dups(sf):
        ds = embedding_dup_pairs(
            _t(sf, "embeddings", ["vec_id", "embedding"]), threshold=0.4, verify_all=True
        )
        rows = ds.take_all()
        # materialize with an explicit schema (an empty Dataset would
        # otherwise lose its column names through to_pandas)
        return pa.Table.from_pylist(
            [{"vec_a": r["vec_a"], "vec_b": r["vec_b"]} for r in rows],
            schema=pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())]),
        )

    # ---- similarity search ----------------------------------------------
    def _queries_mat(sf, n=3):
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf}/embeddings.parquet")
        order = pc.sort_indices(t, sort_keys=[("vec_id", "ascending")])
        t = t.take(order[:n])
        return np.vstack([np.asarray(v) for v in t.column("embedding").to_pylist()])

    def q_knn_bruteforce(sf):
        out = knn_bruteforce(_t(sf, "embeddings", ["vec_id", "embedding"]), _queries_mat(sf), k=5)
        return out.map_batches(
            lambda b: b.select(["query_id", "vec_id"]), batch_format="pyarrow"
        )

    def q_knn_quantized(sf):
        from fever_ray.ops.knn import knn_quantized, quantize_embeddings

        qds = quantize_embeddings(_t(sf, "embeddings", ["vec_id", "embedding"]))
        return knn_quantized(qds, _queries_mat(sf), k=5)

    def q_embedding_project(sf):
        from fever_ray.ops.knn import project_quantized, quantize_embeddings

        return project_quantized(
            quantize_embeddings(_t(sf, "embeddings", ["vec_id", "embedding"])),
            out_dim=8,
        )

    def q_mutual_nn(sf):
        # reciprocal top-1 cosine pairs; integer ids only cross the gate
        from fever_ray.ops.knn import mutual_nn_pairs

        return mutual_nn_pairs(_t(sf, "embeddings", ["vec_id", "embedding"]))

    def q_knn_lsh(sf):
        return knn_lsh(_t(sf, "embeddings", ["vec_id", "embedding"]), _queries_mat(sf), k=5)

    def q_knn_ivf(sf):
        return knn_ivf(
            _t(sf, "embeddings", ["vec_id", "embedding"]),
            _queries_mat(sf),
            k=5,
            n_centroids=8,
            nprobe=4,
        )

    # ---- IoC / matching --------------------------------------------------
    def q_page_ioc_match(sf):
        bf = BloomFilter.initialize(100000, 1e-7)
        bf.add(["src1.example.com", "src3.example.com"])
        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        return pages.map_batches(
            PageIocMatcher,
            fn_constructor_kwargs={"bloom_bytes": bf.to_bytes()},
            batch_format="pyarrow",
            concurrency=(1, 4),
        ).map_batches(
            lambda b: b.select(["url", "ioc", "match_type"]), batch_format="pyarrow"
        )

    def q_bloom_filter_pages(sf):
        """Bloom-selector semi-join filter (flow_extractor.go:93-97 analog):
        keep pages whose hostname is in the filter; rows pass whole."""
        from fever_ray.ops.extract import hostname_of as _hof
        from fever_ray.ops.ioc import make_bloom_selector_fn

        bf = BloomFilter.initialize(100000, 1e-7)
        bf.add(["src0.example.com", "src4.example.com"])
        sel = make_bloom_selector_fn(bf.to_bytes(), column="hostname")
        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        with_host = pages.map_batches(
            lambda b: b.append_column("hostname", _hof(b.column("url"))),
            batch_format="pyarrow",
        )
        return with_host.map_batches(sel, batch_format="pyarrow").map_batches(
            lambda b: b.select(["doc_id", "hostname", "lang"]), batch_format="pyarrow"
        )

    def q_alertify(sf):
        ds = alertify(
            _t(sf, "documents", ["doc_id", "source", "text"]),
            ("src2", "vector window"),
            exact_cols=("source",),
            substr_cols=("text",),
        )
        return ds.map_batches(
            lambda b: b.select(["doc_id", "matched_field", "ioc"]), batch_format="pyarrow"
        )

    def q_cidr_match(sf):
        ds = _t(sf, "events", ["event_id", "user_id"]).map_batches(
            lambda b: b.append_column(
                "ip",
                pc.binary_join_element_wise(
                    pa.array(["10."] * b.num_rows),
                    pc.cast(pc.subtract(b.column("user_id"), pc.multiply(pc.divide(b.column("user_id"), 4), 4)), pa.string()),
                    pa.array([".0.1"] * b.num_rows),
                    "",
                ),
            ),
            batch_format="pyarrow",
        )
        out = cidr_match(ds, ("10.1.0.0/16", "10.0.0.0/8"))
        return out.map_batches(
            lambda b: b.select(["event_id", "ip", "matched_cidr"]), batch_format="pyarrow"
        )

    def q_cidr_match_v6(sf):
        # synthetic v6 literals: 2001:db8:<user_id%4>::<user_id%256 in hex>;
        # ranges exercise the /32 (all), /48 (hi-lane) and /124 (lo-lane) paths
        def add_ip(b: pa.Table) -> pa.Table:
            uid = b.column("user_id")
            group = pc.cast(
                pc.subtract(uid, pc.multiply(pc.divide(uid, 4), 4)), pa.string()
            )
            low = pc.subtract(uid, pc.multiply(pc.divide(uid, 256), 256))
            # hex of 0..255 lower-case, via a small vectorized lookup
            import numpy as np

            lut = np.array([format(i, "x") for i in range(256)], dtype=object)
            low_np = low.to_numpy(zero_copy_only=False).astype(np.int64)
            hexs = pa.array(lut[low_np].tolist(), type=pa.string())
            ip = pc.binary_join_element_wise(
                pa.array(["2001:db8:"] * b.num_rows), group,
                pa.array(["::"] * b.num_rows), hexs, "",
            )
            return b.append_column("ip", ip)

        ds = _t(sf, "events", ["event_id", "user_id"]).map_batches(
            add_ip, batch_format="pyarrow"
        )
        out = cidr_match(
            ds, ("2001:db8::/32", "2001:db8:1::/48", "2001:db8:2::/124")
        )
        return out.map_batches(
            lambda b: b.select(["event_id", "ip", "matched_cidr"]), batch_format="pyarrow"
        )

    # ---- pages pipeline (documents→pages derivation for oracle parity) ---
    def q_extract_text_len(sf):
        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))

        def ext(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "n_extracted_chars": pc.cast(
                        pc.utf8_length(extract_text(b.column("html"))), "int64"
                    ),
                }
            )

        return pages.map_batches(ext, batch_format="pyarrow")

    def q_hostname_counts(sf):
        from ray.data.aggregate import Sum

        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        partial = pages.map_batches(
            lambda b: pa.TableGroupBy(
                pa.table({"hostname": hostname_of(b.column("url"))}), ["hostname"]
            )
            .aggregate([([], "count_all")])
            .rename_columns(["hostname", "n"]),
            batch_format="pyarrow",
        )
        return partial.groupby("hostname").aggregate(Sum("n", alias_name="n"))

    def q_extract_links(sf):
        """href extraction out of raw page html (ops.links): one vectorized
        split per batch, regexp_extract_all semantics (non-overlapping
        left-to-right, closing quote required) — exploded (doc_id, href)
        rows over the deterministically-linked page derivation."""
        from fever_ray.ops import links as links_mod

        return links_mod.extract_links(
            _t(sf, "documents", ["doc_id", "text", "source"])
        )

    def q_host_link_graph(sf):
        """site→site link graph: src host parsed from the page url, dst
        host resolved per href (absolute authority / root-relative → base),
        exact (src, dst, n_links) counts through the bounded coalesce-tree
        — hosts are sites, not pages, so no sort shuffle at any scale."""
        from fever_ray.ops import links as links_mod

        return links_mod.host_link_graph(
            _t(sf, "documents", ["doc_id", "text", "source"])
        )

    def q_link_distinct_sources(sf):
        """Per-destination-host distinct LINKING pages: grouped sparse HLL
        (p=12) over src urls keyed by dst_host — the link-spam profile
        (many links, few distinct sources) that only a sketch answers at
        10^12 pages.  Bound-as-gate: exact per-host distinct counts come
        from the bounded tree (gate scale only; production stops at the
        sketch), and a host row is emitted ONLY if its HLL estimate lands
        within the 3-sigma envelope 3·1.04/√2^12 — so the driver's hash
        gate doubles as the published-error assertion."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.grouped import grouped_estimates
        from fever_ray.ops import links as links_mod

        src_ds = links_mod.link_sources(
            links_mod.linked_pages(_t(sf, "documents", ["doc_id", "text", "source"]))
        ).materialize()  # two passes (sketch + exact) over ~1.5 rows/doc
        est_tbl = grouped_estimates(
            src_ds,
            "dst_host",
            SketchSpec("hll_src", "hll", "url", {"p": 12, "sparse": True}),
            batch_size=4096,
        )
        # exact distinct (dst_host, url) pairs through the bounded tree
        def pair_partial(b: pa.Table) -> pa.Table:
            g = b.group_by(["dst_host", "url"]).aggregate([([], "count_all")])
            return pa.table(
                {
                    "dst_host": g.column("dst_host"),
                    "url": g.column("url"),
                    "one": pa.array(np.ones(g.num_rows, dtype=np.int64)),
                }
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    src_ds.map_batches(pair_partial, batch_format="pyarrow"),
                    ["dst_host", "url"],
                    [("one", "max")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        pairs = pa.concat_tables(parts)
        exact_g = pairs.group_by("dst_host").aggregate([("one", "sum")])
        exact = dict(
            zip(
                exact_g.column("dst_host").to_pylist(),
                [int(v) for v in exact_g.column("one_sum").to_pylist()],
            )
        )
        envelope = 3 * 1.04 / (2**12) ** 0.5
        hosts, n_src = [], []
        for k, est in zip(
            est_tbl.column("key").to_pylist(),
            est_tbl.column("estimate").to_pylist(),
        ):
            n = exact.get(k, 0)
            if n and abs(est - n) <= envelope * n:
                hosts.append(k)
                n_src.append(n)
        return pa.table(
            {
                "dst_host": pa.array(hosts, pa.string()),
                "n_src": pa.array(n_src, pa.int64()),
            }
        )

    def q_reciprocal_hosts(sf):
        """Mutual-citation detection (ops.links.reciprocal_hosts): exact
        per-direction counts from the bounded tree, then ONE vectorized
        sort + reduceat pass matches each unordered pair's two
        orientations.  Edge derivation is arithmetic (source host →
        doc_id%4 host — dense enough to contain reciprocal pairs at every
        sf) so the oracle can mirror it and self-join."""
        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.ops import links as links_mod

        ds = _t(sf, "documents", ["doc_id", "source"])

        def edges(b: pa.Table) -> pa.Table:
            n = b.num_rows
            lit = lambda s: pa.array([s] * n, type=pa.string())  # noqa: E731
            src = pc.binary_join_element_wise(
                b.column("source"), lit(".example.com"), ""
            )
            # (doc_id // 20) % 4: decorrelated from source (= doc_id % 20),
            # so every source links to all four low hosts → reciprocal
            # pairs exist among src0..src3 at every sf
            q20 = pc.divide(b.column("doc_id"), pa.scalar(20, pa.int64()))
            m4 = pc.subtract(
                q20,
                pc.multiply(
                    pc.divide(q20, pa.scalar(4, pa.int64())),
                    pa.scalar(4, pa.int64()),
                ),
            )
            dst = pc.binary_join_element_wise(
                lit("src"), pc.cast(m4, pa.string()), lit(".example.com"), ""
            )
            g = (
                pa.table({"src_host": src, "dst_host": dst})
                .group_by(["src_host", "dst_host"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["src_host", "dst_host", "n_links"]).set_column(
                2, "n_links", g.column("count_all").cast(pa.int64())
            )

        edge_tbl = agg_mod.tree_groupby(
            ds.map_batches(edges, batch_format="pyarrow"),
            ["src_host", "dst_host"],
            [("n_links", "sum")],
        )
        return links_mod.reciprocal_hosts(edge_tbl)

    def q_exact_distinct_users(sf):
        from ray.data.aggregate import Count

        ds = _t(sf, "events", ["user_id"])
        distinct = ds.map_batches(
            lambda b: pa.TableGroupBy(b, ["user_id"]).aggregate([([], "count_all")]).select(["user_id"]),
            batch_format="pyarrow",
        ).groupby("user_id").aggregate(Count(alias_name="_c"))
        import ray

        n = distinct.count()
        return pa.table({"n_distinct_users": pa.array([n], type=pa.int64())})

    # ---- sketches (approximate: no SQL oracle; pytest asserts bounds) ----
    def q_sketch_suite(sf):
        specs = [
            SketchSpec("hll_users", "hll", "user_id", {"p": 14}, value_kind="int"),
            SketchSpec("cms_types", "cms", "event_type", {"width": 2048, "depth": 5}, track=True),
            SketchSpec("kll_value", "kll", "value", {"k": 200}, value_kind="float"),
            SketchSpec("td_value", "tdigest", "value", {"delta": 100}, value_kind="float"),
            SketchSpec("req_value", "req", "value", {"k": 32}, value_kind="float"),
            SketchSpec("dd_value", "dd", "value", {"alpha": 0.01}, value_kind="float"),
            # 17th-session kinds: range-count CMS over exact integer cents
            # (value is 2-dp, < 2^16 cents at every sf) + retractable bloom
            SketchSpec(
                "dcms_cents",
                "dcms",
                "value_cents",
                {"bits": 16, "width": 1024, "depth": 4},
                value_kind="int",
            ),
            SketchSpec("cbf_users", "cbf", "user_id", {"n": 100_000, "p": 1e-4}, value_kind="int"),
            # 19th-session kind: deletion-tolerant distinct (linear counting)
            SketchSpec("lc_users", "lc", "user_id", {"m": 4096}, value_kind="int"),
        ]

        def derive(b: pa.Table) -> pa.Table:
            from fever_ray.ops.aggregates import _cents

            return b.append_column("value_cents", _cents(b.column("value")))

        sk = build_sketches(
            _t(sf, "events", ["user_id", "event_type", "value"]).map_batches(
                derive, batch_format="pyarrow"
            ),
            specs,
            batch_size=8192,
        )
        rows = []
        rows.append({"sketch": "hll_users", "estimate": float(sk["hll_users"].estimate())})
        rows.append({"sketch": "cms_types_total", "estimate": float(sk["cms_types"].total)})
        rows.append({"sketch": "kll_value_p50", "estimate": float(sk["kll_value"].quantile(0.5))})
        rows.append({"sketch": "td_value_p50", "estimate": float(sk["td_value"].quantile(0.5))})
        rows.append({"sketch": "req_value_p99", "estimate": float(sk["req_value"].quantile(0.99))})
        rows.append({"sketch": "dd_value_p50", "estimate": float(sk["dd_value"].quantile(0.5))})
        rows.append(
            {
                "sketch": "dcms_value_p50_cents",
                "estimate": float(sk["dcms_cents"].quantile(0.5)),
            }
        )
        rows.append(
            {"sketch": "cbf_users_n_add", "estimate": float(sk["cbf_users"].n_add)}
        )
        rows.append(
            {"sketch": "lc_users", "estimate": float(sk["lc_users"].estimate())}
        )
        return pa.Table.from_pylist(rows)

    def q_user_overlap_exact(sf):
        """Exact |purchasers ∩ error-users| (the set-algebra oracle the theta
        sketch approximates): batch-level distinct pairs → tree combine →
        single-batch set intersection."""
        import fever_ray.ops.aggregates as agg_mod

        pairs = _t(sf, "events", ["event_type", "user_id"]).map_batches(
            lambda b: agg_mod._distinct(b, ["event_type", "user_id"]),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: agg_mod._distinct(b, ["event_type", "user_id"]),
            batch_format="pyarrow",
            batch_size=65536,
        )

        def final(batch: pa.Table) -> pa.Table:
            d = agg_mod._distinct(batch, ["event_type", "user_id"])
            et = np.array(d.column("event_type").to_pylist())
            uid = np.array(d.column("user_id").to_pylist())
            buyers = set(uid[et == "purchase"].tolist())
            errers = set(uid[et == "error"].tolist())
            return pa.table(
                {
                    "n_purchasers": pa.array([len(buyers)], type=pa.int64()),
                    "n_error_users": pa.array([len(errers)], type=pa.int64()),
                    "n_both": pa.array([len(buyers & errers)], type=pa.int64()),
                }
            )

        return pairs.repartition(1).map_batches(final, batch_format="pyarrow", batch_size=None)

    def q_theta_set_algebra(sf):
        """Theta-sketch estimates of the same set algebra (approximate; no
        SQL oracle — bounds asserted in pytest)."""
        from fever_ray.sketches.theta import ThetaSketch

        ds = _t(sf, "events", ["event_type", "user_id"])

        def partial(batch: pa.Table) -> pa.Table:
            out_rows = []
            for et in ("purchase", "error"):
                sub = batch.filter(pc.equal(batch.column("event_type"), et))
                sk = ThetaSketch.create(k=4096)
                sk.update_ints(sub.column("user_id").to_numpy(zero_copy_only=False))
                out_rows.append({"set_name": et, "payload": sk.to_bytes()})
            return pa.Table.from_pylist(out_rows)

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        acc = {}
        for r in rows:
            sk = ThetaSketch.from_bytes(r["payload"])
            if r["set_name"] in acc:
                acc[r["set_name"]].merge(sk)
            else:
                acc[r["set_name"]] = sk
        a, b = acc["purchase"], acc["error"]
        return pa.table(
            {
                "n_purchasers": pa.array([a.estimate()], type=pa.float64()),
                "n_error_users": pa.array([b.estimate()], type=pa.float64()),
                "n_both": pa.array([a.intersection_estimate(b)], type=pa.float64()),
            }
        )

    def q_interval_join(sf):
        # set-valued event-time range join: every error within the hour
        # AFTER each purchase by the same user; integer-microsecond delta,
        # inclusive bounds both sides
        from fever_ray.ops.windows import interval_join

        ev = _t(sf, "events", ["event_id", "ts", "user_id", "event_type"])

        def typed(kind):
            def f(b):
                m = pc.equal(b.column("event_type"), kind)
                return b.filter(m).select(["event_id", "ts", "user_id"])

            return f

        out = interval_join(
            ev.map_batches(typed("purchase"), batch_format="pyarrow"),
            ev.map_batches(typed("error"), batch_format="pyarrow"),
            key="user_id",
            lo=0,
            hi=3_600_000_000,
        )

        def project(b: pa.Table) -> pa.Table:
            lts = b.column("ts").combine_chunks() if isinstance(
                b.column("ts"), pa.ChunkedArray) else b.column("ts")
            rts = b.column("r_ts").combine_chunks() if isinstance(
                b.column("r_ts"), pa.ChunkedArray) else b.column("r_ts")
            delta = pc.subtract(
                pc.cast(rts, pa.int64()), pc.cast(lts, pa.int64())
            )
            return pa.table(
                {
                    "user_id": b.column("user_id"),
                    "l_event": b.column("event_id"),
                    "r_event": b.column("r_event_id"),
                    "delta_us": delta,
                }
            )

        return out.map_batches(project, batch_format="pyarrow")

    def q_char_bigram_oov(sf):
        # CCNet-style language-model-lite quality signal: per-doc character
        # bigram positions unseen in a reference slice (doc_id % 10 == 0).
        # Integer counts only — the float ratio is the caller's division
        from fever_ray.ops.textstats import char_bigram_oov

        docs = _t(sf, "documents", ["doc_id", "text"])

        def mod10(eq: bool):
            def f(b):
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                hit = ids % 10 == 0
                return b.filter(pa.array(hit if eq else ~hit))

            return f

        return char_bigram_oov(
            docs.map_batches(mod10(False), batch_format="pyarrow"),
            docs.map_batches(mod10(True), batch_format="pyarrow"),
        )

    def _events_user_graph(sf):
        """The deterministic closed graph shared by q_pagerank / q_hits /
        q_personalized_pagerank (and mirrored in their three oracle SQL
        strings — ONE definition here keeps the Python sides in sync):
        node u emits one edge per event, dst = (u*7 + event_id) mod
        n_users + min_user.  Returns (edges_ds, sorted users array)."""
        import ray

        import fever_ray.ops.aggregates as agg_mod

        ds = _t(sf, "events", ["event_id", "user_id"])

        def user_partial(b: pa.Table) -> pa.Table:
            u = np.unique(b.column("user_id").to_numpy(zero_copy_only=False))
            return pa.table(
                {"user_id": pa.array(u, pa.int64()),
                 "c": pa.array(np.ones(len(u), np.int64))}
            )

        ut = pa.concat_tables(
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(user_partial, batch_format="pyarrow"),
                    ["user_id"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        )
        users = np.sort(ut.column("user_id").to_numpy(zero_copy_only=False))
        n_users, mn = len(users), int(users.min())
        nm = ray.put((n_users, mn))

        def mk_edges(b: pa.Table) -> pa.Table:
            nu, m0 = ray.get(nm)
            u = b.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
            e = b.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"src": pa.array(u, pa.int64()),
                 "dst": pa.array((u * 7 + e) % nu + m0, pa.int64())}
            )

        return ds.map_batches(mk_edges, batch_format="pyarrow"), users

    def q_pagerank(sf):
        # integer fixed-point PageRank (3 unrolled iterations, d=85/100)
        # over the deterministic _events_user_graph; pure floor arithmetic
        # both sides, so the oracle (same iterations as SQL CTEs) is
        # bit-exact; top-20 by (pr DESC, node ASC)
        from fever_ray.ops.graph import pagerank

        edges, _users = _events_user_graph(sf)
        pr = pagerank(edges, iterations=3)
        nodes = pr.column("node").to_numpy(zero_copy_only=False)
        r = pr.column("rank").to_numpy(zero_copy_only=False)
        top = np.lexsort((nodes, -r))[:20]
        return pa.table(
            {"node": pa.array(nodes[top], pa.int64()),
             "pr": pa.array(r[top], pa.int64())}
        )

    def q_personalized_pagerank(sf):
        # random-walk-with-restart relevance from the 3 smallest user
        # nodes (deterministic seed set) over the _events_user_graph:
        # restart mass lands only on seeds, 3 unrolled integer
        # iterations; rows with rank 0 drop, top-20 by (ppr DESC, node)
        from fever_ray.ops.graph import pagerank

        edges, users = _events_user_graph(sf)
        pr = pagerank(edges, iterations=3, seeds=[int(v) for v in users[:3]])
        nodes = pr.column("node").to_numpy(zero_copy_only=False)
        r = pr.column("rank").to_numpy(zero_copy_only=False)
        keep = r > 0
        nodes, r = nodes[keep], r[keep]
        top = np.lexsort((nodes, -r))[:20]
        return pa.table(
            {"node": pa.array(nodes[top], pa.int64()),
             "ppr": pa.array(r[top], pa.int64())}
        )

    def q_hits(sf):
        # integer fixed-point HITS hubs/authorities (2 unrolled
        # iterations, divisor-downscale normalization at scale 10^9)
        # over the _events_user_graph; top-20 by (auth DESC, node ASC)
        from fever_ray.ops.graph import hits

        edges, _users = _events_user_graph(sf)
        ht = hits(edges, iterations=2)
        nodes = ht.column("node").to_numpy(zero_copy_only=False)
        a = ht.column("auth").to_numpy(zero_copy_only=False)
        h = ht.column("hub").to_numpy(zero_copy_only=False)
        top = np.lexsort((nodes, -a))[:20]
        return pa.table(
            {"node": pa.array(nodes[top], pa.int64()),
             "auth": pa.array(a[top], pa.int64()),
             "hub": pa.array(h[top], pa.int64())}
        )

    def q_sketch_error_gate(sf):
        """Published-error-bound gate — the north-star contract ("matches
        each sketch's published error bound") as a driver-checkable row
        hash.  Engine side computes BOTH the sketch estimates (one
        build_sketches pass) and the exact answers (distributed: two-level
        distinct, tree-merged counts, prefix-histogram order statistic,
        rank-of-estimate partial sums — nothing corpus-sized on the
        driver).  A check's row (check_name, exact value — bit-stable,
        SQL-mirrorable) is emitted ONLY if its estimate sits inside the
        bound, so any violation hash-fails the gate:

        * HLL p=14:   |est − d|/d ≤ 3·1.04/√2^14           (3σ of the RSE)
        * theta 4096: |est − d|/d ≤ 3/√(k−2)
        * CMS 2048×5: exact ≤ point est ≤ exact + (e/w)·N   (never undercounts)
        * KLL k=200:  median rank error ≤ 1.1% of n         (module bound)
        * t-digest δ=100: median rank error ≤ 2% of n       (conservative
          empirical envelope; t-digest has no worst-case bound)
        * Bloom p=1e-2: ZERO false negatives over every member probe, and
          observed FP rate ≤ 3p over one distinct non-member probe per row
        """
        import ray

        from fever_ray.ops.stats import exact_order_statistic, exact_rank_of

        ds = _t(sf, "events", ["event_id", "user_id", "event_type", "value"])

        def with_uid_str(b: pa.Table) -> pa.Table:
            uid = b.column("user_id")
            if isinstance(uid, pa.ChunkedArray):
                uid = uid.combine_chunks()
            return b.append_column("uid_str", pc.cast(uid, pa.string()))

        ds2 = ds.map_batches(with_uid_str, batch_format="pyarrow")
        specs = [
            SketchSpec("hll_users", "hll", "user_id", {"p": 14}, value_kind="int"),
            SketchSpec("theta_users", "theta", "user_id", {"k": 4096}, value_kind="int"),
            SketchSpec("cms_types", "cms", "event_type", {"width": 2048, "depth": 5}),
            SketchSpec("kll_value", "kll", "value", {"k": 200}, value_kind="float"),
            SketchSpec("td_value", "tdigest", "value", {"delta": 100}, value_kind="float"),
            SketchSpec("bloom_users", "bloom", "uid_str", {"n": 1_000_000, "p": 1e-2}),
        ]
        sk = build_sketches(ds2, specs, batch_size=8192)

        # ---- exact ground truths, all distributed ----
        from ray.data.aggregate import Count

        exact_d = (
            ds.map_batches(
                lambda b: pa.TableGroupBy(b, ["user_id"])
                .aggregate([([], "count_all")])
                .select(["user_id"]),
                batch_format="pyarrow",
            )
            .groupby("user_id")
            .aggregate(Count(alias_name="_c"))
            .count()
        )
        import fever_ray.ops.aggregates as agg_mod

        def type_partial(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b.select(["event_type"]), ["event_type"]).aggregate(
                [([], "count_all")]
            )
            return t.rename_columns(["event_type", "n"])

        tc = pa.concat_tables(
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(type_partial, batch_format="pyarrow"),
                    ["event_type"],
                    [("n", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        )
        tt_names = tc.column("event_type").to_pylist()
        tt_counts = tc.column("n").to_numpy(zero_copy_only=False)
        order = sorted(range(len(tt_names)), key=lambda i: (-tt_counts[i], tt_names[i]))
        top_type, top_count = tt_names[order[0]], int(tt_counts[order[0]])
        n_events = int(tt_counts.sum())

        exact_med = exact_order_statistic(ds, "value", 0.5)

        # ---- the six bound checks ----
        import math as _math

        checks: list[tuple[str, float, bool]] = []
        hll = float(sk["hll_users"].estimate())
        checks.append(
            (
                "hll_distinct_users",
                float(exact_d),
                abs(hll - exact_d) <= 3 * 1.04 / _math.sqrt(2**14) * exact_d,
            )
        )
        theta = float(sk["theta_users"].estimate())
        checks.append(
            (
                "theta_distinct_users",
                float(exact_d),
                abs(theta - exact_d) <= 3 / _math.sqrt(4096 - 2) * exact_d,
            )
        )
        cms_est = int(sk["cms_types"].query([top_type])[0])
        checks.append(
            (
                "cms_top_event_type",
                float(top_count),
                top_count <= cms_est <= top_count + (_math.e / 2048) * n_events,
            )
        )
        for name, sketch, eps in (
            ("kll_value_median", sk["kll_value"], 0.011),
            ("tdigest_value_median", sk["td_value"], 0.02),
        ):
            est = float(sketch.quantile(0.5))
            lt, le, n_v = exact_rank_of(ds, "value", est)
            # the estimate occupies ranks [lt+1, le]; pass if that interval
            # comes within eps·n of the target rank n/2
            dist = max(lt + 1 - 0.5 * n_v, 0.5 * n_v - le, 0.0)
            checks.append((name, float(exact_med), dist <= eps * n_v))

        # ---- bloom membership probes (second streaming pass) ----
        blob = ray.put(sk["bloom_users"].to_bytes())

        def probe_partial(b: pa.Table) -> pa.Table:
            from fever_ray.sketches.bloom import BloomFilter

            bf = BloomFilter.from_bytes(ray.get(blob))
            uid = b.column("uid_str")
            if isinstance(uid, pa.ChunkedArray):
                uid = uid.combine_chunks()
            eid = b.column("event_id")
            if isinstance(eid, pa.ChunkedArray):
                eid = eid.combine_chunks()
            neg = pc.cast(
                pc.add(pc.cast(eid, pa.int64()), 10**9), pa.string()
            )
            fn = int((~bf.check(uid)).sum())
            fp = int(bf.check(neg).sum())
            return pa.table(
                {
                    "g": pa.array([0], pa.int64()),
                    "fn": pa.array([fn], pa.int64()),
                    "fp": pa.array([fp], pa.int64()),
                    "n": pa.array([b.num_rows], pa.int64()),
                }
            )

        pt = pa.concat_tables(
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds2.map_batches(probe_partial, batch_format="pyarrow"),
                    ["g"],
                    [("fn", "sum"), ("fp", "sum"), ("n", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        )
        fn_total = int(pt.column("fn").to_numpy().sum())
        fp_total = int(pt.column("fp").to_numpy().sum())
        n_probe = int(pt.column("n").to_numpy().sum())
        checks.append(
            (
                "bloom_users_membership",
                float(exact_d),
                fn_total == 0 and fp_total <= 3 * 1e-2 * n_probe,
            )
        )

        passed = [(c, v) for c, v, ok in checks if ok]
        return pa.table(
            {
                "check_name": pa.array([c for c, _ in passed], pa.string()),
                "exact_value": pa.array([v for _, v in passed], pa.float64()),
            }
        )

    def q_table_profile(sf):
        # DESCRIBE card over the documents table: per-column rows/nulls/
        # exact distinct/native min-max (stringified) — rows sorted by
        # column name to pin the hash order
        from fever_ray.ops.stats import table_profile

        cols = ["doc_id", "lang", "n_chars", "source"]
        t = table_profile(_t(sf, "documents", cols), cols)
        return t.take(
            pc.sort_indices(t, sort_keys=[("column", "ascending")])
        )

    def q_mg_heavy_tokens(sf):
        """Misra-Gries deterministic heavy-hitter gate (Misra-Gries '82;
        mergeable per Agarwal et al. PODS'12): the token stream explodes
        once, one UDAF pass builds the k=32 MG summary (distributed,
        salted two-phase merge), a second pass tree-counts the bounded
        vocabulary exactly.  Rows = every token with true count >
        n//(k+1) — the set MG GUARANTEES to retain — emitted ONLY if
        each one is present in the summary with residual <= exact <=
        residual + n//(k+1).  Determinism means no failure probability:
        a miss is a bug, not bad luck."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches
        from fever_ray.ops.textstats import _flat_tokens

        ds = _t(sf, "documents", ["text"])

        def explode(b: pa.Table) -> pa.Table:
            flat, _ = _flat_tokens(b, "text")
            return pa.table({"tok": flat})

        toks = ds.map_batches(explode, batch_format="pyarrow")
        sk = build_sketches(
            toks, [SketchSpec("mg", "mg", "tok", {"k": 32})]
        )["mg"]

        def cnt_partial(b: pa.Table) -> pa.Table:
            arr = b.column("tok")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            uk, uc = np.unique(
                arr.to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {"token": pa.array(uk.tolist(), pa.string()),
                 "c": pa.array(uc.astype(np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    toks.map_batches(cnt_partial, batch_format="pyarrow"),
                    ["token"],
                    [("c", "sum")],
                    max_groups=1_000_000,
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ct = pa.concat_tables(parts)
        tok = ct.column("token").to_numpy(zero_copy_only=False)
        c = ct.column("c").to_numpy(zero_copy_only=False)
        bound = sk.error_bound()
        heavy = c > bound
        cand = sk.candidates()
        ok = all(
            t in cand and cand[t] <= f <= cand[t] + bound
            for t, f in zip(tok[heavy].tolist(), c[heavy].tolist())
        )
        if not ok:
            heavy = np.zeros(len(tok), dtype=bool)
        order = np.argsort(tok[heavy])
        return pa.table(
            {
                "token": pa.array(tok[heavy][order], pa.string()),
                "cnt": pa.array(c[heavy][order], pa.int64()),
            }
        )

    def q_ams_f2_gate(sf):
        """AMS/CountSketch published-bound gate (Alon-Matias-Szegedy
        STOC'96, Charikar et al. ICALP'02): one UDAF pass builds the
        r=7 x b=1024 signed-counter sketch over events.user_id; the exact
        F2 = sum of squared per-user counts comes from the bounded-key
        tree (users are a bounded domain).  The single row is emitted
        ONLY if |estimate - F2| <= sqrt(8/b) * F2 — so the driver's gate
        IS the published-bound assertion, and the hash payload is the
        exact integer F2 the oracle mirrors."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "events", ["user_id"])
        sk = build_sketches(
            ds,
            [SketchSpec("ams", "ams", "user_id", {"r": 7, "b": 1024},
                        value_kind="int")],
        )["ams"]

        def cnt_partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b.column("user_id").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {"user_id": pa.array(u, pa.int64()),
                 "c": pa.array(c.astype(np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(cnt_partial, batch_format="pyarrow"),
                    ["user_id"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        c = pa.concat_tables(parts).column("c").to_numpy(zero_copy_only=False)
        f2 = int((c.astype(object) ** 2).sum())  # bigint-safe, then checked
        if f2 >= 2**53:
            raise ValueError("ams_f2_gate: exact F2 exceeds float53 payload")
        est = sk.estimate_f2()
        ok = abs(est - f2) <= sk.rel_error_bound() * f2
        names = ["ams_f2"] if ok else []
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "exact_value": pa.array([float(f2)] * len(names), pa.float64()),
            }
        )

    def q_dynamic_distinct_gate(sf):
        """Fully-dynamic distinct count (linear counting, Whang et al.
        TODS 1990): ONE udaf pass builds TWO LinearCounters — every event
        occurrence, and the error-event occurrences via a nullable derived
        column — then subtract() retracts the error stream, leaving bucket
        occupancy for exactly the users with >=1 surviving event (the HLL-
        impossible operation: distinct counts that honor deletions).  The
        row is emitted only if the retraction left zero debt AND the
        estimate met the published 3-sigma bound; payload = the exact
        surviving distinct count the oracle mirrors."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "events", ["user_id", "event_type"])

        def derive(b: pa.Table) -> pa.Table:
            err = pc.if_else(
                pc.equal(b.column("event_type"), "error"),
                b.column("user_id"),
                pa.scalar(None, pa.int64()),
            )
            return pa.table({"user_id": b.column("user_id"), "user_err": err})

        dd = ds.map_batches(derive, batch_format="pyarrow")
        sk = build_sketches(
            dd,
            [
                SketchSpec("lc_all", "lc", "user_id", {"m": 4096}, value_kind="int"),
                SketchSpec("lc_err", "lc", "user_err", {"m": 4096}, value_kind="int"),
            ],
        )
        lc = sk["lc_all"].subtract(sk["lc_err"])

        def nonerr_partial(b: pa.Table) -> pa.Table:
            keep = b.filter(pc.not_equal(b.column("event_type"), "error"))
            u = np.unique(keep.column("user_id").to_numpy(zero_copy_only=False))
            return pa.table(
                {"user_id": pa.array(u, pa.int64()),
                 "one": pa.array(np.ones(len(u), np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(nonerr_partial, batch_format="pyarrow"),
                    ["user_id"],
                    [("one", "max")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        exact = sum(t.num_rows for t in parts)
        ok = (
            lc.debt == 0
            and abs(lc.estimate() - exact) <= 3 * lc.std_error(exact) + 1
        )
        names = ["dynamic_distinct"] if ok else []
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "n_active": pa.array([exact] * len(names), pa.int64()),
            }
        )

    def q_countsketch_point_gate(sf):
        """CountSketch point-frequency gate (Charikar et al. ICALP'02 §3):
        the same r=7 x b=1024 signed sketch as ams_f2_gate, but queried
        per key — median-of-lanes estimates for EVERY distinct user must
        land within sqrt(8*F2/b) of that user's exact count (exact counts
        + F2 from the bounded-key tree).  The row is emitted only if the
        max-over-keys error meets the bound AND the odd-r median path
        returned exact int64 lane values; the hash payload is the exact
        integer F2 the oracle mirrors."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "events", ["user_id"])
        sk = build_sketches(
            ds,
            [SketchSpec("csk", "ams", "user_id", {"r": 7, "b": 1024},
                        value_kind="int")],
        )["csk"]

        def cnt_partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b.column("user_id").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            return pa.table(
                {"user_id": pa.array(u, pa.int64()),
                 "c": pa.array(c.astype(np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(cnt_partial, batch_format="pyarrow"),
                    ["user_id"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        exact = pa.concat_tables(parts)
        users = exact.column("user_id").to_numpy(zero_copy_only=False)
        counts = exact.column("c").to_numpy(zero_copy_only=False)
        f2 = int((counts.astype(object) ** 2).sum())
        if f2 >= 2**53:
            raise ValueError("countsketch_point_gate: F2 exceeds float53")
        est = sk.query_ints(users)
        ok = (
            est.dtype == np.int64
            and float(np.abs(est - counts).max()) <= sk.point_error_bound(f2)
        )
        names = ["countsketch_point"] if ok else []
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "exact_value": pa.array([float(f2)] * len(names), pa.float64()),
            }
        )

    def q_fd_error_gate(sf):
        """Frequent-Directions published-bound gate (Liberty KDD'13 /
        Ghashami et al. SICOMP'16): one UDAF pass builds the mergeable
        l=16 matrix sketch over the embeddings; a second pass tree-sums
        the EXACT Gram matrix (d x d float64 partials, KB-sized) plus the
        exact integer sum of squared SQ8 codes (the bit-stable payload the
        oracle mirrors).  A check row is emitted ONLY if its guarantee
        holds: AtA - BtB is PSD, its spectral norm is <= 2*||A||_F^2 / l,
        and trace never inflates — so the driver's row/hash gate IS the
        error-bound assertion."""
        from fever_ray.core.udaf import SketchSpec, build_sketches
        from fever_ray.ops.knn import _embedding_matrix

        ds = _t(sf, "embeddings", ["vec_id", "embedding"])
        (first,) = ds.limit(1).take_all()
        d = len(first["embedding"])
        sk = build_sketches(
            ds,
            [SketchSpec("fd", "fd", "embedding", {"l": 16, "d": d},
                        value_kind="vec")],
        )["fd"]

        def part(b: pa.Table) -> pa.Table:
            m = _embedding_matrix(b, "embedding")
            g = m.T @ m
            scale = np.abs(m).max(axis=1)
            safe = np.where(scale == 0.0, 1.0, scale)
            q = np.floor(m * 127.0 / safe[:, None] + 0.5).astype(np.int64)
            return pa.table(
                {
                    "g": pa.array([g.tobytes()], pa.large_binary()),
                    "qss": pa.array([int((q * q).sum())], pa.int64()),
                }
            )

        def combine(b: pa.Table) -> pa.Table:
            gs = b.column("g").to_pylist()
            if not gs:
                return b
            tot = np.zeros((d, d), dtype=np.float64)
            for blob in gs:
                tot += np.frombuffer(blob, dtype=np.float64).reshape(d, d)
            return pa.table(
                {
                    "g": pa.array([tot.tobytes()], pa.large_binary()),
                    "qss": pa.array(
                        [int(b.column("qss").to_numpy().sum())], pa.int64()
                    ),
                }
            )

        (row,) = (
            ds.map_batches(part, batch_format="pyarrow")
            .map_batches(combine, batch_format="pyarrow", batch_size=65536)
            .repartition(1)
            .map_batches(combine, batch_format="pyarrow", batch_size=None)
            .take_all()
        )
        gram = np.frombuffer(row["g"], dtype=np.float64).reshape(d, d)
        qss = float(row["qss"])

        diff = gram - sk.cov()
        ev = np.linalg.eigvalsh(diff)
        tol = 1e-9 * max(sk.fnorm_sq, 1.0)
        checks = [
            ("fd_psd", float(ev.min()) >= -tol),
            ("fd_spectral_bound", float(ev.max()) <= sk.error_bound() + tol),
            ("fd_trace", float(np.trace(sk.cov())) <= float(np.trace(gram)) + tol),
        ]
        passed = sorted(c for c, ok in checks if ok)
        return pa.table(
            {
                "check_name": pa.array(passed, pa.string()),
                "exact_value": pa.array([qss] * len(passed), pa.float64()),
            }
        )

    def q_req_tail_gate(sf):
        """REQ tail-quantile published-bound gate ("Relative Error
        Streaming Quantiles", Cormode/Karnin/Liberty/Thaler/Vesely, PODS
        2021): the token stream explodes once into per-token byte lengths;
        one UDAF pass builds the mergeable k=32 HRA REQ sketch
        (sketches/req.py); a second pass tree-counts the bounded length
        histogram EXACTLY (lengths are a tiny integer domain — the
        histogram is KB-sized).  For each tail q the estimate's exact rank
        interval must come within the module envelope (4/k of the TAIL
        mass, not of n) of the target rank — a (check_name, exact order
        statistic) row is emitted ONLY if the bound holds, so any
        violation hash-fails the driver gate.  At q=0.999 this envelope is
        ~100x tighter than the additive KLL k=200 guarantee — the reason
        the sketch family needs a relative-error member."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches
        from fever_ray.ops.textstats import _flat_tokens

        ds = _t(sf, "documents", ["text"])

        def explode(b: pa.Table) -> pa.Table:
            flat, _ = _flat_tokens(b, "text")
            return pa.table({"l": pc.cast(pc.binary_length(flat), pa.int64())})

        lens = ds.map_batches(explode, batch_format="pyarrow")
        sk = build_sketches(
            lens, [SketchSpec("req", "req", "l", {"k": 32}, value_kind="float")]
        )["req"]

        def hist_partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b.column("l").to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {"l": pa.array(u, pa.int64()), "c": pa.array(c.astype(np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    lens.map_batches(hist_partial, batch_format="pyarrow"),
                    ["l"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        cv = ht.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(lv)
        lv, cv = lv[order], cv[order]
        cum = np.cumsum(cv)
        n = int(cum[-1])

        names, vals = [], []
        for tag, q in (("req_p90", 0.90), ("req_p99", 0.99), ("req_p999", 0.999)):
            target = max(int(np.ceil(q * n)), 1)
            exact = int(lv[int(np.searchsorted(cum, target, side="left"))])
            est = sk.quantile(q)
            il = int(np.searchsorted(lv, est, side="left"))
            ir = int(np.searchsorted(lv, est, side="right"))
            lt = int(cum[il - 1]) if il > 0 else 0  # items strictly < est
            le = int(cum[ir - 1]) if ir > 0 else 0  # items <= est
            # est occupies ranks [lt+1, le]; distance of that interval from
            # the target, then the HRA relative-of-tail envelope
            dist = max(lt + 1 - q * n, q * n - le, 0.0)
            if dist <= (4.0 / 32) * (1.0 - q) * n:
                names.append(tag)
                vals.append(float(exact))
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "exact_value": pa.array(vals, pa.float64()),
            }
        )

    def q_dd_quantile_gate(sf):
        """DDSketch value-relative-error gate (Masson/Rim/Lee, VLDB 2019):
        one UDAF pass builds the alpha=0.01 sketch over per-document text
        byte lengths; a second pass tree-counts the bounded length histogram
        EXACTLY.  The exact order statistic uses the DataDog 0-based rank
        convention floor(q*(n-1)) — mirrored in the oracle SQL — and a
        (check_name, exact_value) row is emitted ONLY if
        |est - exact| <= alpha * exact, so any violation of the published
        VALUE-relative bound hash-fails the driver gate.  Complements
        req_tail_gate (rank-relative) and the KLL/t-digest members
        (rank-additive); DDSketch is the one whose merge is bit-identical
        integer bucket addition (tests assert merge-order byte equality)."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "documents", ["text"])

        def lens(b: pa.Table) -> pa.Table:
            col = pc.fill_null(b.column("text"), "")
            return pa.table({"l": pc.cast(pc.binary_length(col), pa.int64())})

        lds = ds.map_batches(lens, batch_format="pyarrow")
        sk = build_sketches(
            lds, [SketchSpec("dd", "dd", "l", {"alpha": 0.01}, value_kind="float")]
        )["dd"]

        def hist_partial(b: pa.Table) -> pa.Table:
            u, c = np.unique(
                b.column("l").to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {"l": pa.array(u, pa.int64()), "c": pa.array(c.astype(np.int64))}
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    lds.map_batches(hist_partial, batch_format="pyarrow"),
                    ["l"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        cv = ht.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(lv)
        lv, cv = lv[order], cv[order]
        cum = np.cumsum(cv)
        n = int(cum[-1])

        names, vals = [], []
        for tag, q in (("dd_p50", 0.50), ("dd_p90", 0.90), ("dd_p99", 0.99)):
            target0 = int(np.floor(q * (n - 1)))  # 0-based rank, DataDog conv
            exact = float(lv[int(np.searchsorted(cum, target0, side="right"))])
            est = sk.quantile(q)
            ok = (exact == 0.0 and est == 0.0) or abs(est - exact) <= 0.01 * exact
            if ok:
                names.append(tag)
                vals.append(exact)
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "exact_value": pa.array(vals, pa.float64()),
            }
        )

    def q_dd_weighted_gate(sf):
        """Weighted-quantile gate: DDSketch.update_weighted ingests each
        document's text byte length with weight = its token count (the
        space-count+1 convention already oracle-matched by token_stats), so
        the sketch answers "the length distribution as seen by TOKENS" —
        the weighting a token-budgeted pipeline actually samples by.
        Weighted ingest is bit-identical to repeating each value w times
        (tests assert) and costs O(distinct buckets), not O(total weight).
        Exact weighted order statistics from one bounded-key tree (cum
        weight > q*(W-1), the sketch's own rank convention, mirrored in
        the oracle's window SQL); a row is emitted ONLY if
        |est - exact| <= alpha * exact."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.sketches.dd import DDSketch

        ds = _t(sf, "documents", ["text"])

        def lens_w(b: pa.Table) -> pa.Table:
            txt = pc.fill_null(b.column("text"), "")
            l = pc.cast(pc.binary_length(txt), pa.int64())
            stripped = pc.replace_substring(txt, " ", "")
            nsp = pc.subtract(l, pc.cast(pc.binary_length(stripped), pa.int64()))
            w = pc.if_else(pc.equal(l, 0), pa.scalar(0, pa.int64()), pc.add(nsp, 1))
            return pa.table({"l": l, "w": w})

        lw = ds.map_batches(lens_w, batch_format="pyarrow")

        def partial(b: pa.Table) -> pa.Table:
            sk = DDSketch.create(alpha=0.01)
            sk.update_weighted(
                b.column("l").to_numpy(zero_copy_only=False),
                b.column("w").to_numpy(zero_copy_only=False),
            )
            return pa.Table.from_pylist([{"payload": sk.to_bytes()}])

        acc = DDSketch.create(alpha=0.01)
        for r in lw.map_batches(partial, batch_format="pyarrow").take_all():
            acc.merge(DDSketch.from_bytes(r["payload"]))

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(lw, ["l"], [("w", "sum")]).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        wv = ht.column("w").to_numpy(zero_copy_only=False)
        order = np.argsort(lv)
        lv, wv = lv[order], wv[order]
        cum = np.cumsum(wv)
        W = int(cum[-1])

        names, vals = [], []
        for tag, q in (("p50", 0.50), ("p90", 0.90)):
            rank = q * (W - 1)
            exact = float(lv[int(np.searchsorted(cum, rank, side="right"))])
            est = acc.quantile(q)
            if (exact == 0.0 and est == 0.0) or abs(est - exact) <= 0.01 * exact:
                names.append(tag)
                vals.append(exact)
        return pa.table(
            {
                "qtag": pa.array(names, pa.string()),
                "exact_value": pa.array(vals, pa.float64()),
            }
        )

    def q_distinct_sample(sf):
        """Deterministic mergeable distinct-uniform sample (bottom-k / KMV
        sampling, Beyer et al. SIGMOD 2007): the 64 smallest seeded-hash
        values over the DISTINCT user_id domain, with the original keys
        retained — a uniform sample of the key DOMAIN, not the row stream,
        so a user appearing 1000x has the same inclusion probability as one
        appearing once (the property Bernoulli row sampling lacks).  Merge
        = bottom-k union of KB-sized partials, deterministic under any
        split; the oracle mirrors hash64_ints through the shared splitmix
        CTE chain and takes ORDER BY h LIMIT k — bit-exact.  Generalizes
        the reference's per-handler exact side-sets
        (/root/reference/processing/dns_aggregator.go:145-168) into a
        bounded mergeable sample."""
        from fever_ray.sketches.theta import ThetaSketch

        K = 64
        ds = _t(sf, "events", ["user_id"])

        def partial(b: pa.Table) -> pa.Table:
            sk = ThetaSketch.create(k=K, keep_keys=True)
            sk.update_ints(b.column("user_id").to_numpy(zero_copy_only=False))
            return pa.Table.from_pylist([{"payload": sk.to_bytes()}])

        acc = ThetaSketch.create(k=K, keep_keys=True)
        for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
            acc.merge(ThetaSketch.from_bytes(r["payload"]))
        keys = sorted(int(k) for k in acc.sample_keys())
        return pa.table({"user_id": pa.array(keys, pa.int64())})

    def q_per_key_distinct_sample(sf):
        """Grouped bottom-k sampling: 8 deterministic sample doc_ids PER
        LANG via theta keep_keys sketches riding the salted two-phase
        grouped path — per-key uniform domain samples at
        O(keys * k * fanout) state however hot a key is, the bounded
        replacement for 'collect N examples per group' driver loops.
        Oracle: the shared splitmix chain + ROW_NUMBER PARTITION BY lang
        ORDER BY h — bit-exact because the sample is a pure function of
        the seeded hash, not of arrival order."""
        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.sketches.theta import ThetaSketch

        K = 8
        ds = _t(sf, "documents", ["lang", "doc_id"])
        spec = SketchSpec(
            "sample", "theta", "doc_id", {"k": K, "keep_keys": True}, value_kind="int"
        )
        langs, ids = [], []
        for r in grouped_build(ds, "lang", spec).take_all():
            sk = ThetaSketch.from_bytes(r["payload"])
            for kk in sk.sample_keys():
                langs.append(r["key"])
                ids.append(int(kk))
        order = sorted(range(len(ids)), key=lambda i: (langs[i], ids[i]))
        return pa.table(
            {
                "lang": pa.array([langs[i] for i in order], pa.string()),
                "doc_id": pa.array([ids[i] for i in order], pa.int64()),
            }
        )

    def q_theta_overlap_gate(sf):
        """Theta-sketch set-algebra published-bound gate (KMV bottom-k,
        Bar-Yossef et al. RANDOM 2002 / Beyer et al. SIGMOD 2007): one
        streaming pass sketches the purchase-user and error-user id sets
        (per-batch bottom-k partials, KB-sized, merged driver-side —
        bit-identical under any order); |A|, |B|, |A∪B| and |A∩B| are
        estimated from the two sketches alone via the common-theta trick.
        Exact ground truth comes from ONE user-hash bucket shuffle (a user
        never spans buckets, so per-bucket distinct/overlap counts sum
        exactly — no driver-side corpus state).  A (check_name, exact)
        row is emitted ONLY if the estimate meets 3x the published KMV RSE
        1/sqrt(k-1) (+2 floor); intersection error is measured against the
        UNION size, the correct yardstick for common-theta intersections.
        Converts theta_set_algebra's pytest-only bounds into a driver
        hash-gated check — the last registry member without one."""
        from fever_ray.sketches.hashing import hash64_ints
        from fever_ray.sketches.theta import ThetaSketch

        K = 4096
        ds = _t(sf, "events", ["event_type", "user_id"])

        def partial(batch: pa.Table) -> pa.Table:
            rows = []
            for et in ("purchase", "error"):
                sub = batch.filter(pc.equal(batch.column("event_type"), et))
                sk = ThetaSketch.create(k=K)
                sk.update_ints(sub.column("user_id").to_numpy(zero_copy_only=False))
                rows.append({"set_name": et, "payload": sk.to_bytes()})
            return pa.Table.from_pylist(rows)

        acc: dict = {}
        for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
            sk = ThetaSketch.from_bytes(r["payload"])
            if r["set_name"] in acc:
                acc[r["set_name"]].merge(sk)
            else:
                acc[r["set_name"]] = sk
        a, b = acc["purchase"], acc["error"]
        est = {
            "theta_purchasers": a.estimate(),
            "theta_errors": b.estimate(),
            "theta_union": a.union_estimate(b),
            "theta_inter": a.intersection_estimate(b),
        }

        # exact overlap cube: bucket by user hash, per-bucket sets are
        # disjoint across buckets so the four counts sum exactly
        n_b = 64

        def pair_partial(batch: pa.Table) -> pa.Table:
            m = pc.is_in(
                batch.column("event_type"), value_set=pa.array(["purchase", "error"])
            )
            t = batch.filter(m)
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            et = t.column("event_type").to_numpy(zero_copy_only=False).astype(str)
            key = np.char.add(et, np.char.add("@", u.astype(str)))
            _, idx = np.unique(key, return_index=True)
            bucket = (
                hash64_ints(u[idx].astype(np.int64)) % np.uint64(n_b)
            ).astype(np.int32)
            return pa.table(
                {
                    "bucket": pa.array(bucket),
                    "et": pa.array(et[idx], pa.string()),
                    "user": pa.array(u[idx], pa.int64()),
                }
            )

        def bucket_counts(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or g.num_columns == 0:
                # empty map_groups partitions arrive as ZERO-COLUMN tables
                return pa.table(
                    {
                        "n_a": pa.array([], pa.int64()),
                        "n_b": pa.array([], pa.int64()),
                        "n_inter": pa.array([], pa.int64()),
                    }
                )
            et = g.column("et").to_numpy(zero_copy_only=False).astype(str)
            u = g.column("user").to_numpy(zero_copy_only=False)
            buyers = np.unique(u[et == "purchase"])
            errers = np.unique(u[et == "error"])
            return pa.table(
                {
                    "n_a": pa.array([len(buyers)], pa.int64()),
                    "n_b": pa.array([len(errers)], pa.int64()),
                    "n_inter": pa.array(
                        [len(np.intersect1d(buyers, errers, assume_unique=True))],
                        pa.int64(),
                    ),
                }
            )

        totals = {"n_a": 0, "n_b": 0, "n_inter": 0}
        for r in (
            ds.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_counts, batch_format="pyarrow")
            .take_all()
        ):
            for f in totals:
                totals[f] += int(r[f])
        exact = {
            "theta_purchasers": totals["n_a"],
            "theta_errors": totals["n_b"],
            "theta_inter": totals["n_inter"],
            "theta_union": totals["n_a"] + totals["n_b"] - totals["n_inter"],
        }

        rse = 1.0 / np.sqrt(K - 1)
        names, vals = [], []
        for name in sorted(exact):
            yard = exact["theta_union"] if name == "theta_inter" else exact[name]
            if abs(est[name] - exact[name]) <= 3.0 * rse * yard + 2.0:
                names.append(name)
                vals.append(exact[name])
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "exact_value": pa.array(vals, pa.int64()),
            }
        )

    def q_sketch_cube(sf):
        """Sketch cube/rollup: ONE streaming pass builds per-(event_type,
        day) HLL partials (grouped_build — salted two-phase merge); every
        coarser rollup (per type, per day, grand total of distinct users) is
        then derived by MERGING those same finest-grain payloads, never
        re-reading the input — sketches as mergeable materialized views
        (the lattice trick OLAP cubes need at 10^12 rows, where exact
        COUNT(DISTINCT) per cell is a full shuffle per granularity).
        Exact cube for the gate: distinct (user, type, day) triples
        bucket-shuffled by USER hash, so each user lands wholly in one
        bucket and per-bucket distinct counts sum exactly across buckets —
        one shuffle serves all three granularities, no driver-side corpus
        state.  A rollup row is emitted (with the EXACT count) only if the
        merged-sketch estimate meets 3x the published HLL RSE
        (1.04/sqrt(2^14)) with a +2 absolute floor for tiny groups, so the
        driver hash gate doubles as the merge-correctness bound check."""
        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.sketches import sketch_from_bytes
        from fever_ray.sketches.hashing import hash64_ints

        ds = _t(sf, "events", ["ts", "event_type", "user_id"])
        day_us = np.int64(86_400_000_000)

        def derive(b: pa.Table) -> pa.Table:
            ts = b.column("ts")
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            us = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
            day = us // day_us
            et = (
                b.column("event_type")
                .to_numpy(zero_copy_only=False)
                .astype(str)
            )
            cell = np.char.add(np.char.add(et, "|"), day.astype(str))
            return pa.table(
                {
                    "cell": pa.array(cell, pa.string()),
                    "user": b.column("user_id"),
                }
            )

        derived = ds.map_batches(derive, batch_format="pyarrow")
        spec = SketchSpec("hll_u", "hll", "user", {"p": 14}, value_kind="int")
        cell_payloads = [
            (r["key"], r["payload"])
            for r in grouped_build(derived, "cell", spec).take_all()
        ]

        # rollups = merges of the finest-grain payloads only
        def merged_over(group_of):
            acc: dict = {}
            for key, payload in cell_payloads:
                g = group_of(key)
                sk = sketch_from_bytes("hll", payload)
                if g in acc:
                    acc[g].merge(sk)
                else:
                    acc[g] = sk
            return acc

        est = {
            "type": merged_over(lambda k: k.split("|", 1)[0]),
            "day": merged_over(lambda k: k.split("|", 1)[1]),
            "all": merged_over(lambda k: "all"),
        }

        # exact cube: one user-hash bucket shuffle, per-bucket distinct
        # counts are globally exact because a user never spans buckets
        n_b = 64

        def triple_partial(b: pa.Table) -> pa.Table:
            t = derive(b)
            u = t.column("user").to_numpy(zero_copy_only=False)
            c = t.column("cell").to_numpy(zero_copy_only=False).astype(object)
            key = np.char.add(c.astype(str), np.char.add("@", u.astype(str)))
            _, idx = np.unique(key, return_index=True)
            bucket = (
                hash64_ints(u[idx].astype(np.int64)) % np.uint64(n_b)
            ).astype(np.int32)
            return pa.table(
                {
                    "bucket": pa.array(bucket),
                    "cell": pa.array(c[idx].astype(str), pa.string()),
                    "user": pa.array(u[idx], pa.int64()),
                }
            )

        def bucket_counts(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or g.num_columns == 0:
                # empty map_groups partitions arrive as ZERO-COLUMN tables
                return pa.table(
                    {
                        "level": pa.array([], pa.string()),
                        "key": pa.array([], pa.string()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            cells = g.column("cell").to_numpy(zero_copy_only=False).astype(str)
            users = g.column("user").to_numpy(zero_copy_only=False)
            split = np.char.partition(cells, "|")
            lv, kv, cv = [], [], []
            for level, keys in (("type", split[:, 0]), ("day", split[:, 2])):
                pair = np.char.add(keys, np.char.add("@", users.astype(str)))
                _, idx = np.unique(pair, return_index=True)
                uk, cnt = np.unique(keys[idx], return_counts=True)
                lv.extend([level] * len(uk))
                kv.extend(uk.tolist())
                cv.extend(cnt.tolist())
            lv.append("all")
            kv.append("all")
            cv.append(len(np.unique(users)))
            return pa.table(
                {
                    "level": pa.array(lv, pa.string()),
                    "key": pa.array(kv, pa.string()),
                    "c": pa.array(cv, pa.int64()),
                }
            )

        partials = (
            ds.map_batches(triple_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_counts, batch_format="pyarrow")
            .take_all()
        )
        exact: dict = {}
        for r in partials:
            exact[(r["level"], r["key"])] = exact.get((r["level"], r["key"]), 0) + int(r["c"])

        rse = 1.04 / 128.0  # 1.04 / sqrt(2^14)
        out_level, out_key, out_n = [], [], []
        for (level, key), n in sorted(exact.items()):
            sk = est[level].get(key)
            if sk is None:
                continue
            if abs(sk.estimate() - n) <= 3.0 * rse * n + 2.0:
                out_level.append(level)
                out_key.append(key)
                out_n.append(n)
        return pa.table(
            {
                "level": pa.array(out_level, pa.string()),
                "key": pa.array(out_key, pa.string()),
                "n_users": pa.array(out_n, pa.int64()),
            }
        )

    def q_cms_join_size(sf):
        """Join-size estimation WITHOUT executing the join (Cormode &
        Muthukrishnan 2005 §4.2): sketch each side of an equi-join key
        stream into a same-shaped Count-Min, estimate |A ⋈ B| as the
        min-over-rows table inner product — the cardinality-planning
        primitive a distributed optimizer wants at 10^12 rows, where the
        exact answer costs a full shuffle and the sketch costs two
        streaming passes + a KB-sized dot product.  Sides = the events
        stream split by event_id parity, joined on user_id.  Gate: the
        estimate must respect BOTH published guarantees — never below the
        true join size, and ≤ ε·N_a·N_b above it — before the exact join
        size (computed by one bounded-key tree aggregation, integer math)
        is emitted; the driver hash gate is the bound assertion."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "events", ["event_id", "user_id"])
        spec = SketchSpec(
            "cms_u", "cms", "user_id", {"width": 2048, "depth": 5}, value_kind="int"
        )

        def side(par: int):
            def f(b: pa.Table) -> pa.Table:
                return b.filter(pc.equal(pc.bit_wise_and(b.column("event_id"), 1), par))

            return ds.map_batches(f, batch_format="pyarrow")

        cms_a = build_sketches(side(0), [spec], batch_size=8192)["cms_u"]
        cms_b = build_sketches(side(1), [spec], batch_size=8192)["cms_u"]
        est = cms_a.inner_product(cms_b)

        def partial(b: pa.Table) -> pa.Table:
            u = b.column("user_id").to_numpy(zero_copy_only=False)
            par = b.column("event_id").to_numpy(zero_copy_only=False) % 2
            uniq, inv = np.unique(u, return_inverse=True)
            a = np.bincount(inv[par == 0], minlength=len(uniq))
            bb = np.bincount(inv[par == 1], minlength=len(uniq))
            return pa.table(
                {
                    "user": pa.array(uniq, pa.int64()),
                    "a": pa.array(a, pa.int64()),
                    "b": pa.array(bb, pa.int64()),
                }
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(partial, batch_format="pyarrow"),
                    ["user"],
                    [("a", "sum"), ("b", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        t = pa.concat_tables(parts)
        av = t.column("a").to_numpy(zero_copy_only=False).astype(object)
        bv = t.column("b").to_numpy(zero_copy_only=False).astype(object)
        exact = int(np.dot(av, bv))
        n_a, n_b = int(sum(av)), int(sum(bv))

        ok = exact <= est <= exact + cms_a.epsilon * n_a * n_b
        return pa.table(
            {"join_size": pa.array([exact] if ok else [], pa.int64())}
        )

    def q_dyadic_range_gate(sf):
        """Range-count estimation from ONE streaming pass (Cormode &
        Muthukrishnan 2005 §4.3): a dyadic Count-Min over event amounts in
        integer cents answers arbitrary [lo, hi] selectivity questions from
        a KB-scale mergeable summary — the optimizer/histogram primitive at
        10^12 rows, where an exact answer per predicate costs a full scan.
        Exact ground truth per probe range comes from one vectorized
        searchsorted partial per batch + a streaming sum (bounded 5-range
        domain; nothing row-shaped shuffles).  Gate: every range estimate
        must respect BOTH published guarantees — never below the exact
        count and ≤ 2·bits·ε·n above it — before the exact rows are
        emitted; the driver hash gate is the bound assertion."""
        from fever_ray.core.udaf import SketchSpec, build_sketches
        from fever_ray.ops.aggregates import _cents

        ranges = [
            (0, 0, 999),
            (1, 1000, 4999),
            (2, 5000, 9999),
            (3, 10000, 19999),
            (4, 20000, 65535),
        ]
        edges = np.array(
            [r[1] for r in ranges] + [ranges[-1][2] + 1], dtype=np.int64
        )

        ds = _t(sf, "events", ["value"])

        def to_cents(b: pa.Table) -> pa.Table:
            return pa.table({"c": _cents(b.column("value"))})

        cds = ds.map_batches(to_cents, batch_format="pyarrow")
        spec = SketchSpec(
            "dcms_c",
            "dcms",
            "c",
            {"bits": 16, "width": 1024, "depth": 4},
            value_kind="int",
        )
        sk = build_sketches(cds, [spec], batch_size=8192)["dcms_c"]

        def range_partial(b: pa.Table) -> pa.Table:
            c = b.column("c").to_numpy(zero_copy_only=False)
            # ranges are contiguous here, so one searchsorted histogram
            # serves all five (edges = the range lower bounds + final hi+1)
            counts = np.bincount(
                np.searchsorted(edges, c, side="right") - 1,
                minlength=len(ranges) + 1,
            )[: len(ranges)]
            return pa.table(
                {f"r{i}": pa.array([int(counts[i])], pa.int64()) for i in range(len(ranges))}
            )

        sums = cds.map_batches(range_partial, batch_format="pyarrow").sum(
            [f"r{i}" for i in range(len(ranges))]
        )
        exact = [int(sums[f"sum(r{i})"]) for i in range(len(ranges))]

        envelope = 2 * 16 * (np.e / 1024) * sk.total
        ok = all(
            exact[i] <= sk.range_count(lo, hi) <= exact[i] + envelope
            for i, lo, hi in ranges
        )
        idx = list(range(len(ranges))) if ok else []
        return pa.table(
            {
                "range_id": pa.array([ranges[i][0] for i in idx], pa.int64()),
                "lo": pa.array([ranges[i][1] for i in idx], pa.int64()),
                "hi": pa.array([ranges[i][2] for i in idx], pa.int64()),
                "exact_count": pa.array([exact[i] for i in idx], pa.int64()),
            }
        )

    def q_cbf_retraction_gate(sf):
        """Membership with RETRACTION from two streaming passes (counting
        Bloom filter, Fan et al. ToN 2000 §4.3): sketch the full user
        stream and the to-retract (error-event) stream into same-shaped
        counting blooms, subtract — the batch-native generalization of the
        reference's live-mutable indicator set (mgmt BloomAdd), where
        retraction otherwise forces a rebuild over the whole additions
        corpus.  The subtracted filter must show (a) ZERO false negatives —
        every user with a surviving (non-error) event still tests positive
        (a counting-bloom guarantee, not a probability), (b) false
        positives among fully-retracted users within 3x the fill_ratio^k
        expectation, and (c) zero negative-counter debt.  Only then are the
        exact audience counts (one bounded-key tree aggregation) emitted —
        the driver hash gate is the guarantee assertion."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.udaf import SketchSpec, build_sketches

        ds = _t(sf, "events", ["user_id", "event_type"])
        spec = SketchSpec(
            "cbf_u", "cbf", "user_id", {"n": 100_000, "p": 1e-4}, value_kind="int"
        )

        def err_only(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b.column("event_type"), "error"))

        cb_all = build_sketches(ds, [spec], batch_size=8192)["cbf_u"]
        cb_err = build_sketches(
            ds.map_batches(err_only, batch_format="pyarrow"), [spec], batch_size=8192
        )["cbf_u"]
        cb_all.subtract(cb_err)

        def user_flags(b: pa.Table) -> pa.Table:
            u = b.column("user_id").to_numpy(zero_copy_only=False)
            ok = (
                pc.not_equal(b.column("event_type"), "error")
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            uniq, inv = np.unique(u, return_inverse=True)
            f = np.zeros(len(uniq), dtype=np.int64)
            np.maximum.at(f, inv, ok)
            return pa.table(
                {
                    "user": pa.array(uniq, pa.int64()),
                    "f": pa.array(f, pa.int64()),
                }
            )

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    ds.map_batches(user_flags, batch_format="pyarrow"),
                    ["user"],
                    [("f", "max")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        t = pa.concat_tables(parts)
        users = t.column("user").to_numpy(zero_copy_only=False)
        active = t.column("f").to_numpy(zero_copy_only=False).astype(bool)

        hits = cb_all.contains(users)
        no_false_neg = bool(hits[active].all()) if active.any() else True
        fp = int(hits[~active].sum())
        expected_fp = (~active).sum() * cb_all.fill_ratio**cb_all.k
        ok = no_false_neg and fp <= 3 * expected_fp + 2 and cb_all.debt == 0

        n_users, n_active = len(users), int(active.sum())
        return pa.table(
            {
                "n_users": pa.array([n_users] if ok else [], pa.int64()),
                "n_active": pa.array([n_active] if ok else [], pa.int64()),
                "n_retired": pa.array(
                    [n_users - n_active] if ok else [], pa.int64()
                ),
            }
        )

    def q_grouped_tail_per_lang(sf):
        """Grouped REQ tail gate: the per-token byte-length stream keyed by
        lang runs through the salted two-phase grouped-sketch path
        (core/grouped.py — one partial per (batch, lang), groupby merge),
        proving the relative-error member composes with the skew-aware
        grouped machinery.  Exact per-(lang, length) histogram from a
        bounded-key tree; each lang's p99/p999 row is emitted ONLY if the
        grouped sketch's estimate rank-interval meets the 4/k-of-tail
        envelope, so the driver hash gate is the per-group bound
        assertion."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.ops.textstats import _flat_tokens
        from fever_ray.sketches import sketch_from_bytes

        ds = _t(sf, "documents", ["lang", "text"])

        def explode(b: pa.Table) -> pa.Table:
            flat, offs = _flat_tokens(b, "text")
            lang = b.column("lang")
            if isinstance(lang, pa.ChunkedArray):
                lang = lang.combine_chunks()
            reps = np.diff(offs)
            lang_rep = np.repeat(
                lang.to_numpy(zero_copy_only=False).astype(object), reps
            )
            return pa.table(
                {
                    "lang": pa.array(lang_rep, pa.string()),
                    "l": pc.cast(pc.binary_length(flat), pa.int64()),
                }
            )

        lens = ds.map_batches(explode, batch_format="pyarrow")
        spec = SketchSpec("req_l", "req", "l", {"k": 32}, value_kind="float")
        merged = {
            r["key"]: sketch_from_bytes("req", r["payload"])
            for r in grouped_build(lens, "lang", spec).take_all()
        }

        def hist_partial(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b, ["lang", "l"]).aggregate([([], "count_all")])
            return t.rename_columns(["lang", "l", "c"])

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    lens.map_batches(hist_partial, batch_format="pyarrow"),
                    ["lang", "l"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        hl = ht.column("lang").to_numpy(zero_copy_only=False).astype(str)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        cv = ht.column("c").to_numpy(zero_copy_only=False)

        out_lang, out_tail, out_val = [], [], []
        for lang in sorted(set(hl.tolist())):
            m = hl == lang
            order = np.argsort(lv[m])
            ll, cc = lv[m][order], cv[m][order]
            cum = np.cumsum(cc)
            n = int(cum[-1])
            sk = merged.get(lang)
            if sk is None:
                continue
            for tag, q in (("p99", 0.99), ("p999", 0.999)):
                target = max(int(np.ceil(q * n)), 1)
                exact = int(ll[int(np.searchsorted(cum, target, side="left"))])
                est = sk.quantile(q)
                il = int(np.searchsorted(ll, est, side="left"))
                ir = int(np.searchsorted(ll, est, side="right"))
                lt = int(cum[il - 1]) if il > 0 else 0
                le = int(cum[ir - 1]) if ir > 0 else 0
                dist = max(lt + 1 - q * n, q * n - le, 0.0)
                if dist <= (4.0 / 32) * (1.0 - q) * n:
                    out_lang.append(lang)
                    out_tail.append(tag)
                    out_val.append(float(exact))
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "tail": pa.array(out_tail, pa.string()),
                "exact_value": pa.array(out_val, pa.float64()),
            }
        )

    def q_grouped_range_per_lang(sf):
        """Grouped dyadic-CMS gate: per-lang document byte lengths run
        through the salted two-phase grouped-sketch path (core/grouped.py),
        proving the range-count member composes with the skew-aware grouped
        machinery — and since dcms merges are per-level integer table adds,
        each key's merged sketch is bit-identical regardless of how the
        shuffle split the partials.  Exact per-(lang, length) histogram
        from one bounded-key tree; each (lang, range) row is emitted ONLY
        if the group's estimate sat in [exact, exact + 2·bits·ε·n_g] (the
        C&M §4.3 envelope), so the driver hash gate is the per-group bound
        assertion."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.sketches import sketch_from_bytes

        ranges = [(0, 0, 127), (1, 128, 255), (2, 256, 1023)]
        bits, width, depth = 10, 256, 4

        ds = _t(sf, "documents", ["lang", "text"])

        def lens(b: pa.Table) -> pa.Table:
            col = pc.fill_null(b.column("text"), "")
            return pa.table(
                {
                    "lang": b.column("lang"),
                    "l": pc.cast(pc.binary_length(col), pa.int64()),
                }
            )

        lds = ds.map_batches(lens, batch_format="pyarrow")
        spec = SketchSpec(
            "dcms_l",
            "dcms",
            "l",
            {"bits": bits, "width": width, "depth": depth},
            value_kind="int",
        )
        merged = {
            r["key"]: sketch_from_bytes("dcms", r["payload"])
            for r in grouped_build(lds, "lang", spec).take_all()
        }

        def hist_partial(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b, ["lang", "l"]).aggregate([([], "count_all")])
            return t.rename_columns(["lang", "l", "c"])

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    lds.map_batches(hist_partial, batch_format="pyarrow"),
                    ["lang", "l"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        hl = ht.column("lang").to_numpy(zero_copy_only=False).astype(str)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        cv = ht.column("c").to_numpy(zero_copy_only=False)

        out_lang, out_rid, out_n = [], [], []
        for lang in sorted(set(hl.tolist())):
            m = hl == lang
            ll, cc = lv[m], cv[m]
            n_g = int(cc.sum())
            sk = merged.get(lang)
            if sk is None:
                continue
            envelope = 2 * bits * (np.e / width) * n_g
            for rid, lo, hi in ranges:
                exact = int(cc[(ll >= lo) & (ll <= hi)].sum())
                est = sk.range_count(lo, hi)
                if exact <= est <= exact + envelope:
                    out_lang.append(lang)
                    out_rid.append(rid)
                    out_n.append(exact)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "range_id": pa.array(out_rid, pa.int64()),
                "n_docs": pa.array(out_n, pa.int64()),
            }
        )

    def q_grouped_dd_per_lang(sf):
        """Grouped DDSketch gate: per-lang document text byte lengths run
        through the salted two-phase grouped-sketch path (core/grouped.py),
        proving the value-relative member composes with the skew-aware
        grouped machinery — and since DD merges are integer bucket adds,
        the per-key merged sketch is bit-identical regardless of how the
        two-phase shuffle split the partials.  Exact per-(lang, length)
        histogram from one bounded-key tree; each lang's p50/p90 row is
        emitted ONLY if |est - exact| <= alpha * exact (exact order
        statistic at the DataDog 0-based rank floor(q*(n-1)), mirrored in
        the oracle's PARTITION BY window)."""
        import ray

        import fever_ray.ops.aggregates as agg_mod
        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.sketches import sketch_from_bytes

        ds = _t(sf, "documents", ["lang", "text"])

        def lens(b: pa.Table) -> pa.Table:
            col = pc.fill_null(b.column("text"), "")
            return pa.table(
                {
                    "lang": b.column("lang"),
                    "l": pc.cast(pc.binary_length(col), pa.int64()),
                }
            )

        lds = ds.map_batches(lens, batch_format="pyarrow")
        spec = SketchSpec("dd_l", "dd", "l", {"alpha": 0.01}, value_kind="float")
        merged = {
            r["key"]: sketch_from_bytes("dd", r["payload"])
            for r in grouped_build(lds, "lang", spec).take_all()
        }

        def hist_partial(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b, ["lang", "l"]).aggregate([([], "count_all")])
            return t.rename_columns(["lang", "l", "c"])

        parts = [
            t
            for t in ray.get(
                agg_mod.tree_groupby(
                    lds.map_batches(hist_partial, batch_format="pyarrow"),
                    ["lang", "l"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ht = pa.concat_tables(parts)
        hl = ht.column("lang").to_numpy(zero_copy_only=False).astype(str)
        lv = ht.column("l").to_numpy(zero_copy_only=False)
        cv = ht.column("c").to_numpy(zero_copy_only=False)

        out_lang, out_tag, out_val = [], [], []
        for lang in sorted(set(hl.tolist())):
            m = hl == lang
            order = np.argsort(lv[m])
            ll, cc = lv[m][order], cv[m][order]
            cum = np.cumsum(cc)
            n = int(cum[-1])
            sk = merged.get(lang)
            if sk is None:
                continue
            for tag, q in (("p50", 0.50), ("p90", 0.90)):
                target0 = int(np.floor(q * (n - 1)))
                exact = float(ll[int(np.searchsorted(cum, target0, side="right"))])
                est = sk.quantile(q)
                ok = (exact == 0.0 and est == 0.0) or abs(est - exact) <= 0.01 * exact
                if ok:
                    out_lang.append(lang)
                    out_tag.append(tag)
                    out_val.append(exact)
        return pa.table(
            {
                "lang": pa.array(out_lang, pa.string()),
                "qtag": pa.array(out_tag, pa.string()),
                "exact_value": pa.array(out_val, pa.float64()),
            }
        )

    def q_grouped_sketch_per_lang(sf):
        spec = SketchSpec("hll_texts", "hll", "text", {"p": 14})
        out = grouped_estimates(
            _t(sf, "documents", ["lang", "text"]), "lang", spec, batch_size=4096
        )
        # exact at this scale w.h.p. (distinct texts ≪ 1/rse): compare vs SQL
        return pa.table(
            {
                "lang": out.column("key"),
                "n_docs": out.column("rows"),
            }
        )

    # ---- event-time windows / sessions / as-of (SURVEY §2.11) ------------
    def q_window_distinct(sf):
        from fever_ray.ops.windows import window_distinct

        return window_distinct(_t(sf, "events", ["ts", "user_id"]), size_s=3600)

    def q_tumbling_window(sf):
        from fever_ray.ops.windows import tumbling_window

        return tumbling_window(
            _t(sf, "events", ["ts", "event_type", "value"]), size_s=3600
        )

    def q_hopping_window(sf):
        from fever_ray.ops.windows import hopping_window

        return hopping_window(
            _t(sf, "events", ["ts", "event_type", "value"]), size_s=3600, step_s=900
        )

    def q_sessionize(sf):
        from fever_ray.ops.windows import sessionize

        return sessionize(_t(sf, "events", ["user_id", "ts"]), gap_s=1800)

    def q_group_mode(sf):
        from fever_ray.ops.stats import group_mode

        return group_mode(
            _t(sf, "documents", ["lang", "n_chars"]),
            group_col="lang",
            value_col="n_chars",
        )

    def q_rollup_aggregate(sf):
        return rel.rollup_aggregate(
            _t(sf, "documents", ["lang", "source", "n_chars"]),
            keys=["lang", "source"],
            value_col="n_chars",
        )

    def q_melt(sf):
        # wide -> long unpivot of the lineitem money columns (values pass
        # through untouched — bit-exact by construction)
        li = _t(
            sf,
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
             "l_discount", "l_tax"],
        )
        return rel.melt(
            li,
            id_cols=["l_orderkey", "l_linenumber"],
            value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        )

    def q_cube_aggregate(sf):
        return rel.cube_aggregate(
            _t(sf, "documents", ["lang", "source", "n_chars"]),
            keys=["lang", "source"],
            value_col="n_chars",
        )

    def q_group_value_rank(sf):
        from fever_ray.ops.stats import group_value_rank

        return group_value_rank(
            _t(sf, "documents", ["doc_id", "lang", "n_chars"]),
            group_col="lang",
            value_col="n_chars",
        )

    def q_funnel_counts(sf):
        return agg.funnel_counts(
            _t(sf, "events", ["user_id", "ts", "event_type"]),
            steps=("view", "click", "purchase"),
            within_s=86400,
        )

    def q_group_top_k(sf):
        return rel.group_top_k(
            _t(sf, "documents", ["doc_id", "lang", "n_chars"]),
            group_col="lang",
            order_col="n_chars",
            k=3,
        )

    def q_lifecycle_accounting(sf):
        # weekly four-state audience ledger (new/retained/resurrected/
        # churned-into)
        from fever_ray.ops.windows import lifecycle_accounting

        return lifecycle_accounting(
            _t(sf, "events", ["user_id", "ts"]), period_days=7
        )

    def q_bounce_rate(sf):
        # composition gate: sessionize -> per-start-day sessions vs
        # single-event bounces
        from fever_ray.ops.aggregates import tree_groupby
        from fever_ray.ops.windows import sessionize

        s = sessionize(_t(sf, "events", ["user_id", "ts"]))

        def partial(b: pa.Table) -> pa.Table:
            day = np.floor_divide(
                pc.cast(b.column("session_start"), pa.int64()).to_numpy(
                    zero_copy_only=False
                ),
                np.int64(86_400_000_000),
            )
            ne = b.column("n_events").to_numpy(zero_copy_only=False)
            t = pa.table(
                {
                    "day_idx": pa.array(day, pa.int64()),
                    "sessions": pa.array(np.ones(len(day), np.int64)),
                    "bounces": pa.array((ne == 1).astype(np.int64), pa.int64()),
                }
            )
            g = pa.TableGroupBy(t, ["day_idx"]).aggregate(
                [("sessions", "sum"), ("bounces", "sum")]
            )
            return g.rename_columns(["day_idx", "sessions", "bounces"])

        return tree_groupby(
            s.map_batches(partial, batch_format="pyarrow"),
            ["day_idx"],
            [("sessions", "sum"), ("bounces", "sum")],
        )

    def q_lead_lag(sf):
        # does signup volume lead purchase volume? exact daily dot
        from fever_ray.ops.windows import lead_lag_counts

        return lead_lag_counts(
            _t(sf, "events", ["event_type", "ts"]),
            "signup",
            "purchase",
            max_lag=7,
        )

    def q_growth_accounting(sf):
        # per-day event split: new-user vs returning-user traffic
        from fever_ray.ops.windows import growth_accounting

        return growth_accounting(_t(sf, "events", ["user_id", "ts"]))

    def q_max_streak(sf):
        # longest consecutive-active-day streak per user
        from fever_ray.ops.windows import max_streak

        return max_streak(_t(sf, "events", ["user_id", "ts"]))

    def q_cohort_retention(sf):
        # first-seen cohort x days-since-first activity triangle
        from fever_ray.ops.windows import cohort_retention

        return cohort_retention(_t(sf, "events", ["user_id", "ts"]))

    def q_burst_max(sf):
        # worst one-hour event burst per user (rate-limiter audit)
        from fever_ray.ops.windows import burst_max

        return burst_max(_t(sf, "events", ["user_id", "ts"]))

    def q_audience_growth(sf):
        # exact first-seen growth curve over events
        from fever_ray.ops.windows import audience_growth

        return audience_growth(_t(sf, "events", ["user_id", "ts"]))

    def q_mann_whitney(sf):
        # purchase vs click value distributions: exact doubled U
        from fever_ray.ops.stats import mann_whitney

        def tag_side(b: pa.Table) -> pa.Table:
            et = b.column("event_type")
            keep = pc.is_in(et, value_set=pa.array(["purchase", "click"]))
            out = b.filter(keep)
            side = pc.if_else(
                pc.equal(out.column("event_type"), "purchase"),
                pa.scalar(0, pa.int64()),
                pa.scalar(1, pa.int64()),
            )
            return pa.table({"side": side, "value": out.column("value")})

        ev = _t(sf, "events", ["event_type", "value"]).map_batches(
            tag_side, batch_format="pyarrow"
        )
        return mann_whitney(ev, "side", "value")

    def q_rolling_active_users(sf):
        # exact 7-day rolling active-user curve (WAU)
        from fever_ray.ops.windows import rolling_active_users

        return rolling_active_users(
            _t(sf, "events", ["user_id", "ts"]), window_days=7
        )

    def q_rolling_hll_gate(sf):
        """Sliding-window HLL published-bound gate: the per-day-HLL WAU
        curve (`rolling_distinct_hll` — the only affordable rolling
        distinct at 10^12 events) must sit within 3·1.04/sqrt(m)·exact+2
        of the EXACT curve on every window, and cover the identical
        window-end day domain.  If every window passes, the exact table
        is emitted — so the driver's value-hash doubles as the per-window
        error-bound assertion (oracle = the rolling_active_users SQL)."""
        from fever_ray.ops.windows import (
            rolling_active_users,
            rolling_distinct_hll,
        )

        ev = _t(sf, "events", ["user_id", "ts"])
        exact = rolling_active_users(ev, window_days=7)
        ed = {
            int(r["day_idx"]): int(r["active_users"])
            for r in exact.take_all()
        }
        est_t = rolling_distinct_hll(ev, window_days=7, p=14)
        est = dict(
            zip(
                est_t.column("day_idx").to_pylist(),
                est_t.column("est").to_pylist(),
            )
        )
        rse = 1.04 / np.sqrt(2**14)
        ok = set(ed) == set(est) and all(
            abs(est[d] - x) <= 3 * rse * x + 2 for d, x in ed.items()
        )
        days = sorted(ed) if ok else []
        return pa.table(
            {
                "day_idx": pa.array(days, pa.int64()),
                "active_users": pa.array([ed[d] for d in days], pa.int64()),
            }
        )

    def q_top_share(sf):
        # Lorenz point: value mass held by the top 1% of events
        from fever_ray.ops.stats import top_share

        return top_share(_t(sf, "events", ["value"]), "value",
                         top_ppm=10_000)

    def q_time_to_nth(sf):
        # time from first to 5th event per user (activation latency)
        from fever_ray.ops.windows import time_to_nth_event

        return time_to_nth_event(
            _t(sf, "events", ["event_id", "user_id", "ts"]), n=5
        )

    def q_quantile_match(sf):
        # quantile-normalize per-type event values onto the global
        # distribution (exact integer rank/position arithmetic)
        from fever_ray.ops.stats import quantile_match

        return quantile_match(
            _t(sf, "events", ["event_id", "event_type", "value"]),
            "event_type",
            "value",
            "event_id",
        )

    def q_gini_concentration(sf):
        # corpus-concentration audit: Gini of per-source doc counts
        from fever_ray.ops.stats import gini_concentration

        return gini_concentration(_t(sf, "documents", ["source"]))

    def q_priority_sample(sf):
        # DLT priority sampling over orders weighted by price cents
        from fever_ray.ops.curate import priority_sample

        ds = _t(sf, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
                    "w": rel._cents(b.column("o_totalprice")),
                }
            ),
            batch_format="pyarrow",
        )
        return priority_sample(
            ds, k=100, weight_col="w", id_col="o_orderkey", seed=7
        )

    def q_zorder_layout(sf):
        # Morton-interleave (l_partkey, l_suppkey) into z-cells and audit
        # each cell's row count + bounding box — the OPTIMIZE ZORDER shape
        from fever_ray.ops.relational import zorder_layout

        return zorder_layout(
            _t(sf, "lineitem", ["l_partkey", "l_suppkey"]),
            "l_partkey",
            "l_suppkey",
            bits=16,
            cell_shift=20,
        )

    def q_band_join(sf):
        # numeric band self-join: part retail prices within 10 cents —
        # the distance-predicate theta-join, exact integer cents (delta
        # sized so every gate scale has matches: an all-empty Ray Dataset
        # loses its schema through to_pandas, which the column gate reads
        # as zero columns)
        from fever_ray.ops.relational import band_join

        p = _t(sf, "part", ["p_partkey", "p_retailprice"])

        def left(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id_a": pc.cast(b.column("p_partkey"), pa.int64()),
                    "val_a": rel._cents(b.column("p_retailprice")),
                }
            )

        def right(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id_b": pc.cast(b.column("p_partkey"), pa.int64()),
                    "val_b": rel._cents(b.column("p_retailprice")),
                }
            )

        return band_join(
            p.map_batches(left, batch_format="pyarrow"),
            p.map_batches(right, batch_format="pyarrow"),
            delta=10,
            emit="lt",
        )

    def q_rank_fusion(sf):
        # quantized reciprocal-rank fusion of two integer rankings over
        # events: per-type top-50 by amount cents and by recency — fused
        # top-10 per type, pure int64 scores
        from fever_ray.ops.knn import rank_fusion

        ev = _t(sf, "events", ["event_id", "event_type", "ts", "value"])

        def derive(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b.column("event_type"),
                    "event_id": pc.cast(b.column("event_id"), pa.int64()),
                    "c": rel._cents(b.column("value")),
                    "tsu": pc.cast(b.column("ts"), pa.int64()),
                }
            )

        base = ev.map_batches(derive, batch_format="pyarrow").materialize()
        by_value = rel.group_top_k(
            base, "event_type", "c", k=50, id_col="event_id"
        )
        by_recency = rel.group_top_k(
            base, "event_type", "tsu", k=50, id_col="event_id"
        )
        return rank_fusion(
            [by_value, by_recency], k=10,
            query_col="event_type", doc_col="event_id", rank_col="rn",
        )

    def q_running_totals(sf):
        from fever_ray.ops.windows import running_totals

        return running_totals(
            _t(sf, "events", ["event_id", "ts", "user_id", "value"])
        )

    def q_token_budget_mix(sf):
        # DoReMi-style token recipe: 3:1:2 across three sources by TOKENS,
        # every other source dropped
        from fever_ray.ops.trainprep import token_budget_mix

        return token_budget_mix(
            _t(sf, "documents", ["doc_id", "source", "text"]),
            weights={"src0": 3, "src1": 1, "src3": 2},
            budget=6000,
            seed=29,
        )

    def q_group_string_agg(sf):
        # event-sequence materialization: per-user type path in exact
        # (ts, event_id) order
        return rel.group_string_agg(
            _t(sf, "events", ["user_id", "event_type", "ts", "event_id"]),
            key_col="user_id",
            value_col="event_type",
            order_cols=["ts", "event_id"],
        )

    def q_behavior_archetypes(sf):
        # composition gate: distinct (user, type) → ordered type-portfolio
        # string per user (group_string_agg) → bounded archetype census
        # through the coalesce-tree — the behavioral-segment report
        from fever_ray.ops.aggregates import tree_groupby
        from fever_ray.sketches.hashing import bucket_of

        ev = _t(sf, "events", ["user_id", "event_type"])

        def skinny(b: pa.Table) -> pa.Table:
            u = pc.cast(b.column("user_id"), pa.int64())
            t = pa.table(
                {"user_id": u, "event_type": b.column("event_type")}
            )
            t = pa.TableGroupBy(t, ["user_id", "event_type"]).aggregate(
                [([], "count_all")]
            ).drop_columns(["count_all"])
            return t.append_column(
                "bucket",
                pa.array(bucket_of(t.column("user_id"), 32), pa.int32()),
            )

        def dedup_bucket(g: pa.Table) -> pa.Table:
            if g.num_rows == 0 or g.num_columns == 0:
                return pa.table(
                    {
                        "user_id": pa.array([], pa.int64()),
                        "event_type": pa.array([], pa.string()),
                        "ord": pa.array([], pa.string()),
                    }
                )
            t = pa.TableGroupBy(
                g.select(["user_id", "event_type"]),
                ["user_id", "event_type"],
            ).aggregate([([], "count_all")]).drop_columns(["count_all"])
            # gsa selects key+value+order columns distinctly — give the
            # order key its own alias
            return t.append_column("ord", t.column("event_type"))

        distinct = (
            ev.map_batches(skinny, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(dedup_bucket, batch_format="pyarrow")
        )
        seqs = rel.group_string_agg(
            distinct,
            key_col="user_id",
            value_col="event_type",
            order_cols=["ord"],
        )

        def census(b: pa.Table) -> pa.Table:
            t = pa.TableGroupBy(b.select(["agg"]), ["agg"]).aggregate(
                [([], "count_all")]
            )
            return t.rename_columns(["archetype", "n_users"])

        return tree_groupby(
            seqs.map_batches(census, batch_format="pyarrow"),
            ["archetype"],
            [("n_users", "sum")],
            max_groups=1 << 12,
        )

    def q_rolling_window_sum(sf):
        from fever_ray.ops.windows import rolling_window_sum

        return rolling_window_sum(
            _t(sf, "events", ["event_id", "ts", "user_id", "value"]),
            window_rows=5,
        )

    def q_time_range_sum(sf):
        from fever_ray.ops.windows import time_range_sum

        return time_range_sum(
            _t(sf, "events", ["event_id", "ts", "user_id", "value"]),
            window_s=600,
        )

    def q_basket_lift(sf):
        from fever_ray.ops.aggregates import basket_lift

        return basket_lift(
            _t(sf, "events", ["user_id", "ts", "event_type"])
        )

    def q_ks_distance(sf):
        # exact two-sample KS between the event_id-parity halves' value
        # distributions — statistical twins, so d_num is pure sampling
        # noise (a real shift would be ~n² sized)
        from fever_ray.ops.stats import ks_distance

        def tag_side(b: pa.Table) -> pa.Table:
            eid = b.column("event_id").to_numpy(zero_copy_only=False)
            return b.append_column(
                "side", pa.array((eid % 2).astype(np.int64), pa.int64())
            )

        ev = _t(sf, "events", ["event_id", "value"]).map_batches(
            tag_side, batch_format="pyarrow"
        )
        return ks_distance(ev, "side", "value")

    def q_theil_sen_trend(sf):
        from fever_ray.ops.windows import theil_sen_trend

        return theil_sen_trend(
            _t(sf, "events", ["event_id", "user_id", "ts", "value"])
        )

    def q_spearman_corr(sf):
        # per-user exact Spearman of (event time, value cents): integer
        # doubled-average-rank moments, no float in the output
        from fever_ray.ops.windows import spearman_corr

        return spearman_corr(
            _t(sf, "events", ["event_id", "user_id", "ts", "value"])
        )

    def q_locf_fill(sf):
        # the events table has no null values at any sf, so the gap being
        # filled is synthesized deterministically (event_id % 7 < 3 → NULL)
        # identically on both sides
        from fever_ray.ops.windows import locf_fill

        def nullify(b: pa.Table) -> pa.Table:
            eid = b.column("event_id").to_numpy(zero_copy_only=False)
            masked = pc.if_else(
                pa.array(eid % 7 < 3),
                pa.nulls(b.num_rows, pa.float64()),
                pc.cast(b.column("value"), pa.float64()),
            )
            return b.set_column(
                b.schema.get_field_index("value"), "value", masked
            )

        ds = _t(sf, "events", ["event_id", "ts", "user_id", "value"]).map_batches(
            nullify, batch_format="pyarrow"
        )
        return locf_fill(ds)

    def q_conversion_lag_histogram(sf):
        # composition gate: as-of join (purchase ← latest prior signup) →
        # exact integer lag hours → bounded-bin counts via the tree; the
        # attribution-latency curve every funnel report wants
        from fever_ray.ops.aggregates import tree_groupby
        from fever_ray.ops.windows import asof_join

        left = _t(sf, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
            lambda b: b.filter(pc.equal(b.column("event_type"), "purchase")).select(
                ["event_id", "user_id", "ts"]
            ),
            batch_format="pyarrow",
        )
        right = _t(sf, "events", ["user_id", "ts", "event_type"]).map_batches(
            lambda b: (lambda f: f.append_column("ts_copy", f.column("ts")))(
                b.filter(pc.equal(b.column("event_type"), "signup")).select(
                    ["user_id", "ts"]
                )
            ),
            batch_format="pyarrow",
        )
        joined = asof_join(left, right, key="user_id")

        def bins(b: pa.Table) -> pa.Table:
            r = b.column("r_ts_copy")
            if isinstance(r, pa.ChunkedArray):
                r = r.combine_chunks()
            matched = ~np.asarray(r.is_null())
            if not matched.any():
                return pa.table(
                    {"lag_h": pa.array([], pa.int64()),
                     "n": pa.array([], pa.int64())}
                )
            sub = b.filter(pa.array(matched))
            lts = pc.cast(sub.column("ts"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            rts = pc.cast(sub.column("r_ts_copy"), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            lag_h = np.minimum((lts - rts) // 3_600_000_000, 48)
            u, n = np.unique(lag_h, return_counts=True)
            return pa.table(
                {
                    "lag_h": pa.array(u, pa.int64()),
                    "n": pa.array(n.astype(np.int64), pa.int64()),
                }
            )

        return tree_groupby(
            joined.map_batches(bins, batch_format="pyarrow"),
            ["lag_h"],
            [("n", "sum")],
        )

    def q_asof_join(sf):
        from fever_ray.ops.windows import asof_join

        left = _t(sf, "events", ["event_id", "user_id", "ts", "event_type"]).map_batches(
            lambda b: b.filter(pc.equal(b.column("event_type"), "purchase")).select(
                ["event_id", "user_id", "ts"]
            ),
            batch_format="pyarrow",
        )
        right = _t(sf, "events", ["user_id", "ts", "event_type"]).map_batches(
            lambda b: (lambda f: f.append_column("ts_copy", f.column("ts")))(
                b.filter(pc.equal(b.column("event_type"), "signup")).select(
                    ["user_id", "ts"]
                )
            ),
            batch_format="pyarrow",
        )
        return asof_join(
            left, right, key="user_id", ts_col="ts", right_cols=["user_id", "ts", "ts_copy"]
        )

    def q_grouped_sketch_per_host(sf):
        """Per-hostname grouped HLL in SPARSE mode (the 10^12-group-key
        memory path): low-cardinality keys cost tens of bytes per partial."""
        from fever_ray.ops.extract import hostname_of as _hof

        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        with_host = pages.map_batches(
            lambda b: b.append_column("hostname", _hof(b.column("url"))),
            batch_format="pyarrow",
        )
        spec = SketchSpec("hll_per_host", "hll", "url", {"p": 12, "sparse": True})
        out = grouped_estimates(with_host, "hostname", spec, batch_size=4096)
        return pa.table({"hostname": out.column("key"), "n_docs": out.column("rows")})

    def _decoded_pages(sf):
        # shared decode-stage wiring for the two multimodal gates — one
        # place to change the payload column / batch size
        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        return decode_images(
            pages.map_batches(
                lambda b: b.select(["doc_id", "html"]), batch_format="pyarrow"
            ),
            batch_size=64,
        )

    def q_multimodal_decode(sf):
        return _decoded_pages(sf).map_batches(
            lambda b: b.select(["doc_id", "img_width", "img_height"]),
            batch_format="pyarrow",
        )

    def q_audio_decode(sf):
        """Audio-decode stage plumbing gate (DecodeAudioStub, fake lanes):
        sample_rate/n_frames are pure functions of payload byte length —
        the actor-pool schema/fan-in is oracle-checked exactly like
        multimodal_decode; the REAL WAV/AU path is pytest-covered
        (tests/test_ops.py audio tests)."""
        from fever_ray.ops.multimodal import decode_audio

        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))
        return decode_audio(
            pages.map_batches(
                lambda b: b.select(["doc_id", "html"]), batch_format="pyarrow"
            ),
            batch_size=64,
        ).map_batches(
            lambda b: b.select(["doc_id", "sample_rate", "n_frames"]),
            batch_format="pyarrow",
        )

    def q_image_phash_dups(sf):
        """Perceptual-hash image dedup gate (ops.multimodal.image_phash_pairs
        → dedup.hamming_code_pairs): payloads run the pHash actor stage —
        real DCT hashing for decodable images, the deterministic
        hash-chain code otherwise — and pair through the banded Hamming
        core at distance 0.  Dup structure is PLANTED SQL-mirrorably:
        every 97th doc_id gets one of three fixed payloads (id mod 3), so
        pairs = same planted group ∪ identical-text unplanted docs; the
        pHash DCT math itself is pytest-pinned (scale invariance, naive-
        DCT equality) since a transcendental transform has no SQL mirror."""
        from fever_ray.ops.multimodal import image_phash_pairs

        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))

        def plant(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            html = b.column("html").to_pylist()
            for i in np.flatnonzero(ids % 97 == 0):
                html[i] = b"PLANT-%d" % (ids[i] % 3)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "html": pa.array(html, pa.binary()),
                }
            )

        return image_phash_pairs(
            pages.map_batches(
                lambda b: plant(b.select(["doc_id", "html"])),
                batch_format="pyarrow",
            ),
            max_hamming=0,
        )

    def q_code_cross_dedup(sf):
        """Incremental code-dedup gate (dedup.hamming_cross_pairs — the
        minhash_cross shape for stored 64-bit fingerprints): odd doc_ids
        are the NEW batch, even the stored REFERENCE, code = doc_id >> 4,
        radius 0 — so pairs are exactly the odd×even id pairs sharing a
        16-id block, an integer plan the oracle mirrors."""
        from fever_ray.ops.dedup import hamming_cross_pairs

        def side(parity):
            def f(b: pa.Table) -> pa.Table:
                ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                sel = ids[ids % 2 == parity]
                return pa.table(
                    {
                        "doc_id": pa.array(sel, pa.int64()),
                        "code": pa.array(sel >> 4, pa.int64()),
                    }
                )

            return _t(sf, "documents", ["doc_id"]).map_batches(
                f, batch_format="pyarrow"
            )

        return hamming_cross_pairs(side(1), side(0), max_hamming=0)

    def q_audio_dup_gate(sf):
        """Audio near-dup gate (ops.multimodal.audio_dup_pairs →
        dedup.hamming_code_pairs): the same planted-group construction as
        image_phash_dups but through the AUDIO fingerprint stage (its own
        fake-code chain constant, so the two modality code spaces never
        collide); every 89th doc by id mod 3.  The fingerprint DSP itself
        (Hz-anchored Haitsma–Kalker sign bits) is pytest-pinned."""
        from fever_ray.ops.multimodal import audio_dup_pairs

        pages = docs_to_pages(_t(sf, "documents", ["doc_id", "source", "text", "lang"]))

        def plant(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            html = b.column("html").to_pylist()
            for i in np.flatnonzero(ids % 89 == 0):
                html[i] = b"CLIP-%d" % (ids[i] % 3)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "html": pa.array(html, pa.binary()),
                }
            )

        return audio_dup_pairs(
            pages.map_batches(
                lambda b: plant(b.select(["doc_id", "html"])),
                batch_format="pyarrow",
            ),
            max_hamming=0,
        )

    def q_frame_sample(sf):
        # video frame-sampling PLAN (flat_map fan-out through the actor
        # stage): payload = the text bytes, frame count = clip(len/256, 1, 4)
        from fever_ray.ops.multimodal import FrameSampleStub

        def to_payload(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "html": pc.cast(
                        pc.fill_null(pc.cast(b.column("text"), pa.string()), ""),
                        pa.binary(),
                    ),
                }
            )

        return (
            _t(sf, "documents", ["doc_id", "text"])
            .map_batches(to_payload, batch_format="pyarrow")
            .map_batches(
                FrameSampleStub,
                fn_constructor_kwargs={
                    "payload_col": "html",
                    "every_n_bytes": 256,
                    "max_frames": 4,
                },
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
        )

    def q_multimodal_resize(sf):
        out = resize_images(_decoded_pages(sf), max_w=224, max_h=160)
        return out.map_batches(
            lambda b: b.select(
                ["doc_id", "img_width", "img_height", "resize_w", "resize_h"]
            ),
            batch_format="pyarrow",
        )

    return {
        "event_profiler": q_event_profiler,
        "flow_aggregator": q_flow_aggregator,
        "unicorn_flow_report": q_unicorn_flow_report,
        "dns_aggregator": q_dns_aggregator,
        "pdns_collector": q_pdns_collector,
        "context_collector": q_context_collector,
        "anti_join": q_anti_join,
        "heartbeat_injector": q_heartbeat_injector,
        "flow_profiler": q_flow_profiler,
        "pricing_summary": q_pricing_summary,
        "segment_revenue": q_segment_revenue,
        "top_orders": q_top_orders,
        "filter_project": q_filter_project,
        "bucketed_join": q_bucketed_join,
        "full_outer_join": q_full_outer_join,
        "latest_record": q_latest_record,
        "contamination_report": q_contamination_report,
        "props_field_stats": q_props_field_stats,
        "user_retention": q_user_retention,
        "bigram_logloss": q_bigram_logloss,
        "pii_report": q_pii_report,
        "dup_cluster_sizes": q_dup_cluster_sizes,
        "first_records": q_first_records,
        "interarrival_histogram": q_interarrival_histogram,
        "left_outer_join": q_left_outer_join,
        "revenue_by_nation": q_revenue_by_nation,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "content_fingerprint": q_content_fingerprint,
        "knn_lsh_recall_gate": q_knn_lsh_recall_gate,
        "knn_ivf_recall_gate": q_knn_ivf_recall_gate,
        "knn_pq_recall_gate": q_knn_pq_recall_gate,
        "knn_ivfpq_recall_gate": q_knn_ivfpq_recall_gate,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "split_assign": q_split_assign,
        "leakage_safe_split": q_leakage_safe_split,
        "data_quality": q_data_quality,
        "suggest_card": q_suggest_card,
        "dbsink_roundtrip": q_dbsink_roundtrip,
        "docsink_roundtrip": q_docsink_roundtrip,
        "plan_card": q_plan_card,
        "change_point": q_change_point,
        "gopher_rules": q_gopher_rules,
        "rule_violation_samples": q_rule_violation_samples,
        "host_boilerplate": q_host_boilerplate,
        "script_mix": q_script_mix,
        "decontaminate": q_decontaminate,
        "chunk_documents": q_chunk_documents,
        "epoch_shuffle": q_epoch_shuffle,
        "pack_sequences": q_pack_sequences,
        "per_group_sample": q_per_group_sample,
        "group_percentiles": q_group_percentiles,
        "quantile_bucket": q_quantile_bucket,
        "quantile_bucket_approx": q_quantile_bucket_approx,
        "winsorize": q_winsorize,
        "corpus_report": q_corpus_report,
        "value_histogram": q_value_histogram,
        "distribution_drift": q_distribution_drift,
        "vocab_coverage": q_vocab_coverage,
        "group_moments": q_group_moments,
        "group_regression": q_group_regression,
        "weighted_median": q_weighted_median,
        "group_entropy": q_group_entropy,
        "zscore_outliers": q_zscore_outliers,
        "mad_outliers": q_mad_outliers,
        "importance_resample": q_importance_resample,
        "decayed_counts": q_decayed_counts,
        "transition_counts": q_transition_counts,
        "pivot_counts": q_pivot_counts,
        "unigram_logloss": q_unigram_logloss,
        "normalize_urls": q_normalize_urls,
        "url_canonical_dedup": q_url_canonical_dedup,
        "normalize_text": q_normalize_text,
        "doc_top_terms": q_doc_top_terms,
        "bm25_search": q_bm25_search,
        "keyword_search": q_keyword_search,
        "inverted_index": q_inverted_index,
        "cross_dedup": q_cross_dedup,
        "corpus_intersect": q_corpus_intersect,
        "minhash_cross_dedup": q_minhash_cross_dedup,
        "linear_score": q_linear_score,
        "window_top_k": q_window_top_k,
        "semantic_decontaminate": q_semantic_decontaminate,
        "bpe_train": q_bpe_train,
        "bpe_token_counts": q_bpe_token_counts,
        "embedding_cluster": q_embedding_cluster,
        "semdedup": q_semdedup,
        "knn_graph": q_knn_graph,
        "bloom_cross_dedup": q_bloom_cross_dedup,
        "token_budget_select": q_token_budget_select,
        "mixture_sample": q_mixture_sample,
        "repeat_corpus": q_repeat_corpus,
        "line_dedup": q_line_dedup,
        "dup_ngram_windows": q_dup_ngram_windows,
        "dup_ngram_trim": q_dup_ngram_trim,
        "domain_cap": q_domain_cap,
        "token_repetition": q_token_repetition,
        "curation_filter": q_curation_filter,
        "quantile_length_filter": q_quantile_length_filter,
        "top_ngrams": q_top_ngrams,
        "heavy_ngrams": q_heavy_ngrams,
        "regex_scrub": q_regex_scrub,
        "exact_dedup": q_exact_dedup,
        "connected_components": q_connected_components,
        "minhash_dedup": q_minhash_dedup,
        "minhash_sigs_dedup": q_minhash_sigs_dedup,
        "containment_pairs": q_containment_pairs,
        "containment_capped": q_containment_capped,
        "sorted_neighbor_pairs": q_sorted_neighbor_pairs,
        "allpairs_similarity": q_allpairs_similarity,
        "snapshot_diff": q_snapshot_diff,
        "keeper_election": q_keeper_election,
        "source_dup_report": q_source_dup_report,
        "source_overlap": q_source_overlap,
        "template_census": q_template_census,
        "content_churn": q_content_churn,
        "day_overlap": q_day_overlap,
        "session_length_histogram": q_session_length_histogram,
        "dedup_savings": q_dedup_savings,
        "activity_profile": q_activity_profile,
        "group_ks_drift": q_group_ks_drift,
        "corpus_checksum": q_corpus_checksum,
        "vocab_drift": q_vocab_drift,
        "vocab_growth": q_vocab_growth,
        "zipf_audit": q_zipf_audit,
        "group_share": q_group_share,
        "ngram_novelty": q_ngram_novelty,
        "cooccurrence_counts": q_cooccurrence_counts,
        "token_edit_dups": q_token_edit_dups,
        "token_variant_clusters": q_token_variant_clusters,
        "triangle_counts": q_triangle_counts,
        "edge_support": q_edge_support,
        "k_core": q_k_core,
        "bfs_layers": q_bfs_layers,
        "simhash_pairs": q_simhash_pairs,
        "embedding_dups": q_embedding_dups,
        "embedding_quantize": q_embedding_quantize,
        "knn_quantized": q_knn_quantized,
        "embedding_project": q_embedding_project,
        "knn_bruteforce": q_knn_bruteforce,
        "mutual_nn": q_mutual_nn,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "page_ioc_match": q_page_ioc_match,
        "alertify": q_alertify,
        "bloom_filter_pages": q_bloom_filter_pages,
        "cidr_match": q_cidr_match,
        "cidr_match_v6": q_cidr_match_v6,
        "extract_text_len": q_extract_text_len,
        "hostname_counts": q_hostname_counts,
        "extract_links": q_extract_links,
        "host_link_graph": q_host_link_graph,
        "link_distinct_sources": q_link_distinct_sources,
        "reciprocal_hosts": q_reciprocal_hosts,
        "exact_distinct_users": q_exact_distinct_users,
        "sketch_suite": q_sketch_suite,
        "ams_f2_gate": q_ams_f2_gate,
        "countsketch_point_gate": q_countsketch_point_gate,
        "dynamic_distinct_gate": q_dynamic_distinct_gate,
        "mg_heavy_tokens": q_mg_heavy_tokens,
        "table_profile": q_table_profile,
        "fd_error_gate": q_fd_error_gate,
        "req_tail_gate": q_req_tail_gate,
        "dd_quantile_gate": q_dd_quantile_gate,
        "theta_overlap_gate": q_theta_overlap_gate,
        "dd_weighted_gate": q_dd_weighted_gate,
        "distinct_sample": q_distinct_sample,
        "per_key_distinct_sample": q_per_key_distinct_sample,
        "sketch_error_gate": q_sketch_error_gate,
        "hits": q_hits,
        "personalized_pagerank": q_personalized_pagerank,
        "pagerank": q_pagerank,
        "char_bigram_oov": q_char_bigram_oov,
        "interval_join": q_interval_join,
        "user_overlap_exact": q_user_overlap_exact,
        "theta_set_algebra": q_theta_set_algebra,
        "grouped_sketch_per_lang": q_grouped_sketch_per_lang,
        "grouped_tail_per_lang": q_grouped_tail_per_lang,
        "grouped_dd_per_lang": q_grouped_dd_per_lang,
        "grouped_range_per_lang": q_grouped_range_per_lang,
        "sketch_cube": q_sketch_cube,
        "cms_join_size": q_cms_join_size,
        "dyadic_range_gate": q_dyadic_range_gate,
        "cbf_retraction_gate": q_cbf_retraction_gate,
        "grouped_sketch_per_host": q_grouped_sketch_per_host,
        "multimodal_decode": q_multimodal_decode,
        "audio_decode": q_audio_decode,
        "image_phash_dups": q_image_phash_dups,
        "audio_dup_gate": q_audio_dup_gate,
        "code_cross_dedup": q_code_cross_dedup,
        "frame_sample": q_frame_sample,
        "multimodal_resize": q_multimodal_resize,
        "tumbling_window": q_tumbling_window,
        "window_distinct": q_window_distinct,
        "hopping_window": q_hopping_window,
        "sessionize": q_sessionize,
        "running_totals": q_running_totals,
        "rolling_window_sum": q_rolling_window_sum,
        "time_range_sum": q_time_range_sum,
        "locf_fill": q_locf_fill,
        "theil_sen_trend": q_theil_sen_trend,
        "spearman_corr": q_spearman_corr,
        "ks_distance": q_ks_distance,
        "basket_lift": q_basket_lift,
        "conversion_lag_histogram": q_conversion_lag_histogram,
        "behavior_archetypes": q_behavior_archetypes,
        "pareto_front": q_pareto_front,
        "group_string_agg": q_group_string_agg,
        "token_budget_mix": q_token_budget_mix,
        "group_top_k": q_group_top_k,
        "rank_fusion": q_rank_fusion,
        "band_join": q_band_join,
        "zorder_layout": q_zorder_layout,
        "priority_sample": q_priority_sample,
        "audience_growth": q_audience_growth,
        "gini_concentration": q_gini_concentration,
        "burst_max": q_burst_max,
        "cohort_retention": q_cohort_retention,
        "max_streak": q_max_streak,
        "lead_lag": q_lead_lag,
        "growth_accounting": q_growth_accounting,
        "lifecycle_accounting": q_lifecycle_accounting,
        "bounce_rate": q_bounce_rate,
        "quantile_match": q_quantile_match,
        "time_to_nth": q_time_to_nth,
        "top_share": q_top_share,
        "mann_whitney": q_mann_whitney,
        "rolling_active_users": q_rolling_active_users,
        "rolling_hll_gate": q_rolling_hll_gate,
        "funnel_counts": q_funnel_counts,
        "group_value_rank": q_group_value_rank,
        "rollup_aggregate": q_rollup_aggregate,
        "cube_aggregate": q_cube_aggregate,
        "melt": q_melt,
        "group_mode": q_group_mode,
        "asof_join": q_asof_join,
    }


# ---------------------------------------------------------------- oracle SQL
_SQL_M = "18446744073709551616"  # 2^64: all wrapping multiplies reduce mod this


def _sql_mulmod(y: str, mult: str) -> str:
    """64-bit wrapping multiply in DuckDB: two 32-bit HUGEINT halves mod
    2^64 (DuckDB has no wrapping UBIGINT *).  The ONE source of truth for
    every splitmix/FNV oracle chain — keep the generated SQL byte-identical
    across all of them."""
    return (
        f"CAST(((CAST({y} % 4294967296 AS HUGEINT) * {mult}) + "
        f"((CAST({y} >> 32 AS HUGEINT) * {mult}) % 4294967296) * 4294967296) "
        f"% {_SQL_M} AS UBIGINT)"
    )


def _sql_fnv1a_over(expr: str) -> str:
    """FNV-1a 64 over the utf-8 bytes of a string expression (codepoint ==
    byte on this ASCII corpus), as a DuckDB list_reduce chain."""
    return (
        "list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT),"
        f"list_transform(range(1, strlen({expr}) + 1), i -> "
        f"CAST(unicode({expr}[i]) AS UBIGINT))),"
        f"(h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % {_SQL_M} AS UBIGINT))"
    )


def _content_hash_cte(
    base: str = "documents", out: str = "allh", p: str = "c"
) -> str:
    """CTE chain computing the engine's content hash (FNV-1a over text
    bytes → splitmix64 finalizer → int64 reinterpret) for every row of
    ``base`` (any (doc_id, text) source), exposed as ``out``(doc_id,
    content_hash) — the same construction _simhash_sql uses, factored for
    reuse (codepoint == utf-8 byte on this ASCII corpus).  ``p`` prefixes
    the intermediate CTE names so two chains can coexist in one query."""
    m = "18446744073709551616"

    mulmod = _sql_mulmod

    # COALESCE: the engine's hash64 treats NULL text as "" (verified:
    # hash64([None]) == hash64([""])), so the mirror must too — without it
    # strlen(NULL) nulls the whole hash and SUM/compare silently drop rows
    fnv_text = _sql_fnv1a_over("COALESCE(text, '')")
    to_i64 = (
        "CAST(CAST(x AS HUGEINT) - CASE WHEN x >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST({m} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )
    return (
        f"{p}h0 AS (SELECT doc_id, {fnv_text} AS h0 FROM {base}), "
        f"{p}a1 AS (SELECT doc_id, xor(h0, h0 >> 30) AS y FROM {p}h0), "
        f"{p}b1 AS (SELECT doc_id, {mulmod('y', '13787848793156543929')} AS x FROM {p}a1), "
        f"{p}a2 AS (SELECT doc_id, xor(x, x >> 27) AS y FROM {p}b1), "
        f"{p}b2 AS (SELECT doc_id, {mulmod('y', '10723151780598845931')} AS x FROM {p}a2), "
        f"{p}a3 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM {p}b2), "
        f"{out} AS (SELECT doc_id, {to_i64} AS content_hash FROM {p}a3)"
    )


def _per_group_sample_sql(k: int, groups: list, seed: int) -> str:
    """Bit-exact mirror of ops.curate.per_group_sample: per-group
    ROW_NUMBER over the splitmix hash order, rank <= k."""
    in_list = ", ".join(f"'{g}'" for g in groups)
    inner = _splitmix_doc_sql(
        seed, "doc_id, lang", f"lang IN ({in_list})",
        select_expr="doc_id, lang, h",
    )
    return (
        f"WITH r AS (SELECT doc_id, lang, ROW_NUMBER() OVER "
        f"(PARTITION BY lang ORDER BY h) AS rk FROM ({inner}) t) "
        f"SELECT doc_id, lang FROM r WHERE rk <= {k}"
    )


def _url_norm_chain_sql(u_cte: str) -> str:
    """The normalize_urls mirror CTE chain over any ``u``(doc_id, url)
    CTE — exposes the final select producing (doc_id, url, url_norm).
    DuckDB and Arrow share the RE2 regex engine, so the part extraction is
    identical.  Factored so both the normalize_urls gate and the
    canonical-dedup gate normalize through ONE SQL definition."""
    from fever_ray.ops.curate import _TRACKING_PREFIXES, _URL_RE_PARTS

    re_ = _URL_RE_PARTS.replace("'", "''")
    not_tracking = " AND ".join(
        f"NOT starts_with(p, '{t}')" for t in _TRACKING_PREFIXES
    )
    return (
        f"WITH u AS ({u_cte}), "
        f"px AS (SELECT doc_id, url, "
        f"lower(regexp_extract(url, '{re_}', 1)) AS scheme, "
        f"lower(regexp_extract(url, '{re_}', 2)) AS host0, "
        f"regexp_extract(url, '{re_}', 3) AS path0, "
        f"regexp_extract(url, '{re_}', 4) AS query0 FROM u), "
        f"h AS (SELECT doc_id, url, scheme, path0, query0, "
        f"CASE WHEN scheme = 'http' AND host0 LIKE '%:80' "
        f"THEN substr(host0, 1, len(host0) - 3) "
        f"WHEN scheme = 'https' AND host0 LIKE '%:443' "
        f"THEN substr(host0, 1, len(host0) - 4) ELSE host0 END AS host FROM px), "
        f"q AS (SELECT doc_id, url, scheme, host, "
        f"CASE WHEN path0 = '/' THEN '' ELSE path0 END AS path, "
        f"array_to_string(list_filter(string_split(substr(query0, 2), '&'), "
        f"p -> len(p) > 0 AND {not_tracking}), '&') AS qjoin FROM h) "
        f"SELECT doc_id, url, scheme || '://' || host || path || "
        f"CASE WHEN len(qjoin) > 0 THEN '?' || qjoin ELSE '' END AS url_norm "
        f"FROM q"
    )


def _normalize_urls_sql() -> str:
    """Exact mirror of ops.curate.normalize_urls over the same synthesized
    messy URLs."""
    return _url_norm_chain_sql(
        "SELECT doc_id, 'HTTPS://WWW.' || upper(source) || "
        "'.Test:443/p/' || lang || CASE WHEN doc_id % 3 = 0 THEN "
        "'?utm_source=x&fbclid=1&id=' || CAST(doc_id AS VARCHAR) ELSE "
        "'?id=' || CAST(doc_id AS VARCHAR) END || CASE WHEN doc_id % 2 = 0 "
        "THEN '#f' ELSE '' END AS url FROM documents"
    )


_URL_DEDUP_SYNTH_SQL = (
    "SELECT doc_id, 'HTTPS://WWW.' || upper(source) || '.Test:443/p/' || "
    "CAST(doc_id % 50 AS VARCHAR) || CASE doc_id % 4 WHEN 0 THEN "
    "'?utm_source=x' WHEN 1 THEN '?fbclid=1' WHEN 2 THEN '#frag' "
    "ELSE '' END AS url FROM documents"
)


def _url_canonical_dedup_sql() -> str:
    """Mirror of q_url_canonical_dedup: the same synthesized crawl dupes
    (identical page behind varying tracking junk / fragments / default
    port), normalized through the ONE shared chain, then keep-min-id per
    canonical URL with the copy count."""
    return (
        f"WITH n AS ({_url_norm_chain_sql(_URL_DEDUP_SYNTH_SQL)}) "
        "SELECT url_norm, CAST(MIN(doc_id) AS BIGINT) AS keep_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_copies FROM n GROUP BY url_norm"
    )


def _doc_top_terms_sql(k: int) -> str:
    """Exact mirror of ops.textstats.doc_top_terms: per-doc token counts,
    corpus df over distinct (doc, token), rank by (tf DESC, df ASC,
    token)."""
    return (
        f"WITH ex AS (SELECT doc_id, tk AS token, CAST(COUNT(*) AS BIGINT) "
        f"AS tf FROM (SELECT doc_id, unnest(string_split(COALESCE(text, ''), "
        f"' ')) AS tk FROM documents) GROUP BY doc_id, tk), "
        f"d AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM ex "
        f"GROUP BY token), "
        f"r AS (SELECT doc_id, token, tf, df, CAST(ROW_NUMBER() OVER "
        f"(PARTITION BY doc_id ORDER BY tf DESC, df ASC, token ASC) - 1 "
        f"AS BIGINT) AS rk FROM ex JOIN d USING (token)) "
        f"SELECT doc_id, token, tf, df, rk FROM r WHERE rk < {k}"
    )


def _keyword_search_sql(terms: list, k: int) -> str:
    """Exact mirror of ops.textstats.keyword_search: per-doc count of
    query-term token occurrences, top-k by (score DESC, doc_id) — the tie
    order makes the LIMIT set deterministic on both engines."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return (
        f"WITH s AS (SELECT doc_id, CAST(len(list_filter("
        f"string_split(COALESCE(text, ''), ' '), t -> t IN ({in_list}))) "
        f"AS BIGINT) AS score FROM documents) "
        f"SELECT doc_id, score FROM s WHERE score > 0 "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


def _bm25_search_sql(terms: list, k: int) -> str:
    """Exact mirror of ops.textstats.bm25_search: the same all-integer
    BM25 quantization (idf = ilog2((2N+1)//(2df+1)) via strlen(bin(x))-1,
    per-term fixed-point fraction (45056*A*tf) // (20*A*tf + 6*A + 18*dl),
    A = GREATEST(total_tokens // N, 1)), top-k by (score DESC, doc_id)."""
    terms = sorted(set(terms))
    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(SUM(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS df{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(
        f"(strlen(bin((2*n+1) // (2*df{i}+1))) - 1) * "
        f"((45056*a*tf{i}) // (20*a*tf{i} + 6*a + 18*dl))"
        for i in range(len(terms))
    )
    return (
        "WITH ts AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') "
        "AS toks FROM documents), "
        "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(len(toks)) AS BIGINT) AS t FROM ts), "
        f"dfs AS (SELECT {df_cols} FROM ts), "
        "par AS (SELECT n, GREATEST(t // n, 1) AS a, dfs.* FROM st, dfs), "
        f"tf AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_cols} "
        "FROM ts), "
        f"sc AS (SELECT doc_id, CAST({score} AS BIGINT) AS score "
        "FROM tf, par) "
        f"SELECT doc_id, score FROM sc WHERE score > 0 "
        f"ORDER BY score DESC, doc_id LIMIT {k}"
    )


def _ppr_sql(iterations: int, scale: int, n_seeds: int, k: int) -> str:
    """Exact mirror of q_personalized_pagerank: the q_pagerank CTE chain
    with the restart mass confined to the n_seeds smallest src nodes
    (seed base = scale // |seeds|, hold = 0 off-seed)."""
    seed_base = f"({scale} // (SELECT kk FROM ns))"
    ctes = [
        "st AS (SELECT COUNT(DISTINCT user_id) AS n, MIN(user_id) AS mn "
        "FROM events)",
        "e AS (SELECT user_id AS src, (user_id * 7 + event_id) % "
        "(SELECT n FROM st) + (SELECT mn FROM st) AS dst FROM events)",
        "deg AS (SELECT src AS node, COUNT(*) AS c FROM e GROUP BY src)",
        f"sd AS (SELECT node FROM deg ORDER BY node LIMIT {n_seeds})",
        "ns AS (SELECT COUNT(*) AS kk FROM sd)",
        f"r0 AS (SELECT deg.node, CASE WHEN deg.node IN "
        f"(SELECT node FROM sd) THEN {seed_base} ELSE 0 END AS r FROM deg)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        ctes += [
            f"c{i} AS (SELECT e.dst AS node, SUM(r{p}.r // deg.c) AS s "
            f"FROM e JOIN r{p} ON e.src = r{p}.node "
            f"JOIN deg ON e.src = deg.node GROUP BY e.dst)",
            f"r{i} AS (SELECT deg.node, CASE WHEN deg.node IN "
            f"(SELECT node FROM sd) THEN (15 * {seed_base}) // 100 "
            f"ELSE 0 END + (85 * COALESCE(c{i}.s, 0)) // 100 AS r "
            f"FROM deg LEFT JOIN c{i} ON deg.node = c{i}.node)",
        ]
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT node, CAST(r AS BIGINT) AS ppr FROM r{iterations} "
        f"WHERE r > 0 ORDER BY r DESC, node LIMIT {k}"
    )


def _hits_sql(iterations: int, scale: int, k: int) -> str:
    """Exact mirror of ops.graph.hits over q_hits's deterministic events
    graph: the same unrolled power iterations with the divisor-downscale
    normalization v // (max(v) // scale + 1) — all floor arithmetic, so
    HUGEINT sums cast back to the engine's int64 bit-for-bit."""
    ctes = [
        "st AS (SELECT COUNT(DISTINCT user_id) AS n, MIN(user_id) AS mn "
        "FROM events)",
        "e AS (SELECT user_id AS src, (user_id * 7 + event_id) % "
        "(SELECT n FROM st) + (SELECT mn FROM st) AS dst FROM events)",
        "nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        # iteration 1's authority pass reads the constant h0 = scale
        f"a1r AS (SELECT dst AS node, SUM(CAST({scale} AS BIGINT)) AS s "
        "FROM e GROUP BY dst)",
        f"a1 AS (SELECT nd.node, COALESCE(a1r.s, 0) // "
        f"((SELECT MAX(s) FROM a1r) // {scale} + 1) AS a "
        "FROM nd LEFT JOIN a1r USING (node))",
        "h1r AS (SELECT e.src AS node, SUM(a1.a) AS s FROM e "
        "JOIN a1 ON e.dst = a1.node GROUP BY e.src)",
        f"h1 AS (SELECT nd.node, COALESCE(h1r.s, 0) // "
        f"((SELECT MAX(s) FROM h1r) // {scale} + 1) AS h "
        "FROM nd LEFT JOIN h1r USING (node))",
    ]
    for i in range(2, iterations + 1):
        p = i - 1
        ctes += [
            f"a{i}r AS (SELECT e.dst AS node, SUM(h{p}.h) AS s FROM e "
            f"JOIN h{p} ON e.src = h{p}.node GROUP BY e.dst)",
            f"a{i} AS (SELECT nd.node, COALESCE(a{i}r.s, 0) // "
            f"((SELECT MAX(s) FROM a{i}r) // {scale} + 1) AS a "
            f"FROM nd LEFT JOIN a{i}r USING (node))",
            f"h{i}r AS (SELECT e.src AS node, SUM(a{i}.a) AS s FROM e "
            f"JOIN a{i} ON e.dst = a{i}.node GROUP BY e.src)",
            f"h{i} AS (SELECT nd.node, COALESCE(h{i}r.s, 0) // "
            f"((SELECT MAX(s) FROM h{i}r) // {scale} + 1) AS h "
            f"FROM nd LEFT JOIN h{i}r USING (node))",
        ]
    f = iterations
    return (
        "WITH " + ", ".join(ctes) + " "
        f"SELECT node, CAST(a AS BIGINT) AS auth, CAST(h AS BIGINT) AS hub "
        f"FROM a{f} JOIN h{f} USING (node) "
        f"ORDER BY auth DESC, node LIMIT {k}"
    )


def _inverted_index_sql(max_postings: int) -> str:
    """Exact mirror of ops.textstats.inverted_index: distinct (token, doc)
    pairs, df over ALL pairs, postings = first max_postings ids in
    ascending order comma-joined."""
    return (
        f"WITH ex AS (SELECT DISTINCT doc_id, tk AS token FROM "
        f"(SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS tk "
        f"FROM documents)), "
        f"d AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM ex "
        f"GROUP BY token), "
        f"r AS (SELECT token, doc_id, ROW_NUMBER() OVER (PARTITION BY token "
        f"ORDER BY doc_id) AS rk FROM ex), "
        f"p AS (SELECT token, string_agg(CAST(doc_id AS VARCHAR), ',' "
        f"ORDER BY doc_id) AS postings FROM r WHERE rk <= {max_postings} "
        f"GROUP BY token) "
        f"SELECT token, df, postings FROM d JOIN p USING (token)"
    )


def _cross_dedup_sql(modulus: int) -> str:
    """Bit-exact mirror of ops.dedup.cross_dedup with reference = rows
    where doc_id % modulus = 0 and corpus = the rest: corpus survivors are
    docs whose content hash never appears on the reference side."""
    return (
        f"WITH {_content_hash_cte()} "
        f"SELECT doc_id, content_hash FROM allh WHERE doc_id % {modulus} != 0 "
        f"AND content_hash NOT IN "
        f"(SELECT content_hash FROM allh WHERE doc_id % {modulus} = 0)"
    )


def _simhash_sql() -> str:
    """Bit-exact DuckDB mirror of ops.textstats.fingerprint: splitmix64∘FNV-1a
    content hash AND the 64-bit SimHash (per-bit majority vote over token
    hashes), generated programmatically — the splitmix multiplications are
    split into 32-bit halves so HUGEINT never overflows, and each of the 64
    bit-vote terms is an explicit CASE (codepoint == utf-8 byte on this
    ASCII corpus)."""
    m = "18446744073709551616"

    mulmod = _sql_mulmod

    fnv_token = _sql_fnv1a_over("t")
    # COALESCE: the engine's hash64 treats NULL text as "" (verified:
    # hash64([None]) == hash64([""])), so the mirror must too — without it
    # strlen(NULL) nulls the whole hash and SUM/compare silently drop rows
    fnv_text = _sql_fnv1a_over("COALESCE(text, '')")
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * list_sum(list_transform(hs, h -> CAST((h >> {b}) & 1 AS BIGINT))) > n "
        f"THEN CAST({(1 << b) if b < 63 else -(1 << 63)} AS HUGEINT) ELSE 0 END)"
        for b in range(64)
    )
    to_i64 = (
        "CAST(CAST(x AS HUGEINT) - CASE WHEN x >= CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST({m} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )
    return (
        # COALESCE on the split too: the engine fill_nulls to '' before
        # tokenizing, so a NULL-text row simhashes over [''] — a raw
        # string_split(NULL) would zero every bit vote instead
        f"WITH ch0 AS (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS toks, {fnv_text} AS h0 FROM documents), "
        "ca1 AS (SELECT doc_id, toks, xor(h0, h0 >> 30) AS y FROM ch0), "
        f"cb1 AS (SELECT doc_id, toks, {mulmod('y', '13787848793156543929')} AS x FROM ca1), "
        "ca2 AS (SELECT doc_id, toks, xor(x, x >> 27) AS y FROM cb1), "
        f"cb2 AS (SELECT doc_id, toks, {mulmod('y', '10723151780598845931')} AS x FROM ca2), "
        "ca3 AS (SELECT doc_id, toks, xor(x, x >> 31) AS x FROM cb2), "
        f"chash AS (SELECT doc_id, toks, {to_i64} AS content_hash FROM ca3), "
        f"t0 AS (SELECT doc_id, content_hash, len(toks) AS n, list_transform(toks, t -> {fnv_token}) AS hs FROM chash), "
        "t1 AS (SELECT doc_id, content_hash, n, list_transform(hs, h -> xor(h, h >> 30)) AS hs FROM t0), "
        f"t2 AS (SELECT doc_id, content_hash, n, list_transform(hs, y -> {mulmod('y', '13787848793156543929')}) AS hs FROM t1), "
        "t3 AS (SELECT doc_id, content_hash, n, list_transform(hs, x -> xor(x, x >> 27)) AS hs FROM t2), "
        f"t4 AS (SELECT doc_id, content_hash, n, list_transform(hs, y -> {mulmod('y', '10723151780598845931')}) AS hs FROM t3), "
        "t5 AS (SELECT doc_id, content_hash, n, list_transform(hs, x -> xor(x, x >> 31)) AS hs FROM t4) "
        f"SELECT doc_id, content_hash, CAST({bit_terms} AS BIGINT) AS simhash FROM t5"
    )


def _hash_sample_sql(fraction: float, seed: int) -> str:
    """Bit-exact DuckDB mirror of ops.curate.hash_sample: the five-stage
    splitmix64 finalizer over ``doc_id ^ splitmix64(seed) ^ FNV_OFFSET``
    compared against the SAME integer threshold the engine uses (computed
    once by ``sample_threshold``, never re-derived from the float)."""
    import numpy as np

    from fever_ray.ops.curate import sample_threshold
    from fever_ray.sketches.hashing import splitmix64

    thr = sample_threshold(fraction)
    return _splitmix_doc_sql(seed, "doc_id, source", f"h < CAST({thr} AS UBIGINT)")


def _splitmix_ctes(
    seed: int, cols: str, table: str = "documents", id_expr: str = "doc_id",
    prefix: str = "s",
) -> str:
    """CTE-prefix (no WITH) for the five-stage splitmix64 finalizer over
    ``id_expr ^ splitmix64(seed) ^ FNV_OFFSET`` on ``table`` — bit-exact
    mirror of ``hashing.hash64_ints``.  Exposes the hash as ``h`` in CTE
    ``{prefix}5`` alongside ``cols``.  64-bit multiplies run in two 32-bit
    HUGEINT halves mod 2^64 (DuckDB has no wrapping UBIGINT *).  The ONE
    splitmix-over-ints chain every oracle shares."""
    import numpy as np

    from fever_ray.sketches.hashing import splitmix64

    c = int(splitmix64(np.array([seed], dtype=np.uint64))[0]) if seed else 0
    fnv_offset = 0xCBF29CE484222325
    mulmod = _sql_mulmod
    p = prefix
    return (
        f"{p}0 AS (SELECT {cols}, xor(xor(CAST({id_expr} AS UBIGINT), "
        f"CAST({c} AS UBIGINT)), CAST({fnv_offset} AS UBIGINT)) AS x FROM {table}), "
        f"{p}1 AS (SELECT {cols}, xor(x, x >> 30) AS y FROM {p}0), "
        f"{p}2 AS (SELECT {cols}, {mulmod('y', '13787848793156543929')} AS x FROM {p}1), "
        f"{p}3 AS (SELECT {cols}, xor(x, x >> 27) AS y FROM {p}2), "
        f"{p}4 AS (SELECT {cols}, {mulmod('y', '10723151780598845931')} AS x FROM {p}3), "
        f"{p}5 AS (SELECT {cols}, xor(x, x >> 31) AS h FROM {p}4)"
    )


def _splitmix_doc_sql(
    seed: int, cols: str, where_expr: str, select_expr: str | None = None
) -> str:
    """Five-stage splitmix64 over doc_id on the documents table, exposing
    the hash as ``h`` to ``where_expr`` (and ``select_expr``, defaulting to
    ``cols``)."""
    return (
        f"WITH {_splitmix_ctes(seed, cols)} "
        f"SELECT {select_expr or cols} FROM s5 WHERE {where_expr}"
    )


def _stratified_sample_sql(fractions: dict, default: float, seed: int) -> str:
    """Bit-exact mirror of ops.curate.stratified_sample: same splitmix64
    membership hash, per-stratum threshold via CASE (null strata take the
    default, matching the engine's fill_null-to-default code path)."""
    from fever_ray.ops.curate import sample_threshold

    case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN CAST({sample_threshold(f)} AS UBIGINT)"
        for k, f in fractions.items()
    ) + f" ELSE CAST({sample_threshold(default)} AS UBIGINT) END"
    return _splitmix_doc_sql(seed, "doc_id, lang, source", f"h < ({case})")


def _split_case_sql(weights: dict) -> str:
    """CASE expression mapping the splitmix hash ``h`` to a split name via
    the SAME consecutive-uint64-range thresholds _split_bounds computes
    (insertion order, cumulative sample_threshold) — shared by the
    split_assign and leakage_safe_split oracles."""
    from fever_ray.ops.curate import sample_threshold

    total = float(sum(weights.values()))
    names = list(weights)
    acc, arms = 0.0, []
    for name in names[:-1]:
        acc += weights[name] / total
        arms.append(
            f"WHEN h < CAST({sample_threshold(min(acc, 1.0))} AS UBIGINT) "
            f"THEN '{name}'"
        )
    if arms:
        return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END AS split"
    # single split: CASE with zero WHEN arms is a parse error
    return f"'{names[-1]}' AS split"


def _split_assign_sql(weights: dict, seed: int) -> str:
    """Bit-exact mirror of ops.curate.split_assign: consecutive uint64
    hash ranges in the weights' insertion order (same integer thresholds
    via sample_threshold on the cumulative fractions)."""
    return _splitmix_doc_sql(
        seed, "doc_id, lang", "TRUE",
        select_expr=f"doc_id, lang, {_split_case_sql(weights)}",
    )


_GOPHER_STOPS = ("a", "value", "sort", "scan", "key", "fast")


def _gopher_rules_sql(
    min_words: int,
    max_words: int,
    mwl_lo: int,
    mwl_hi: int,
    stopwords: tuple,
    min_stop_hits: int,
) -> str:
    """Bit-exact mirror of ops.curate.gopher_rules over documents: every
    ratio test is the same integer cross-multiply; '...'-occurrence count
    via all-replace strlen delta /3 (left-to-right non-overlapping — the
    same greedy scan pc.count_substring does); line split on chr(10)."""
    hits = " + ".join(
        f"(CASE WHEN list_contains(tk, '{s}') THEN 1 ELSE 0 END)"
        for s in stopwords
    )
    bits = (
        f"(CASE WHEN n_words < {min_words} OR n_words > {max_words} THEN 1 ELSE 0 END) + "
        f"2 * (CASE WHEN wchars < {mwl_lo} * n_words OR wchars > {mwl_hi} * n_words THEN 1 ELSE 0 END) + "
        "4 * (CASE WHEN 10 * syms > n_words THEN 1 ELSE 0 END) + "
        "8 * (CASE WHEN 10 * bl > 9 * n_lines THEN 1 ELSE 0 END) + "
        "16 * (CASE WHEN 10 * el > 3 * n_lines THEN 1 ELSE 0 END) + "
        "32 * (CASE WHEN 5 * alpha_w < 4 * n_words THEN 1 ELSE 0 END) + "
        f"64 * (CASE WHEN hits < {min_stop_hits} THEN 1 ELSE 0 END)"
    )
    return (
        "WITH tl AS (SELECT doc_id, lang, COALESCE(text, '') AS text, "
        "string_split(COALESCE(text, ''), ' ') AS tk, "
        "string_split(COALESCE(text, ''), chr(10)) AS ln FROM documents), "
        "m AS (SELECT doc_id, lang, "
        "CAST(len(tk) AS BIGINT) AS n_words, "
        "CAST(list_sum(list_transform(tk, t -> strlen(t))) AS BIGINT) AS wchars, "
        "CAST(len(list_filter(tk, t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS alpha_w, "
        f"CAST({hits} AS BIGINT) AS hits, "
        "CAST(len(ln) AS BIGINT) AS n_lines, "
        "CAST(len(list_filter(ln, l -> starts_with(l, '-') OR starts_with(l, '•'))) AS BIGINT) AS bl, "
        "CAST(len(list_filter(ln, l -> ends_with(l, '...'))) AS BIGINT) AS el, "
        "CAST(strlen(text) - strlen(replace(text, '#', '')) + "
        "(strlen(text) - strlen(replace(text, '...', ''))) // 3 AS BIGINT) AS syms "
        "FROM tl) "
        f"SELECT doc_id, lang, n_words, CAST({bits} AS BIGINT) AS rule_mask, "
        f"CAST(CASE WHEN {bits} = 0 THEN 1 ELSE 0 END AS BIGINT) AS kept FROM m"
    )


def _script_mix_sql() -> str:
    """Bit-exact mirror of q_script_mix: the same script-mixed synthesis
    (repeat is chr-count based on both sides), per-class char counts via
    RE2 \\p{Script} removal length deltas (length() is CHARS in DuckDB),
    dominant = first-argmax over the fixed class order as a CASE chain."""
    classes = ["latin", "cyrillic", "greek", "han", "arabic"]
    cnt = ", ".join(
        f"CAST(length(t) - length(regexp_replace(t, '\\p{{{c.capitalize()}}}', "
        f"'', 'g')) AS BIGINT) AS n_{c}"
        for c in classes
    )
    dom = (
        "CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND "
        "n_latin >= n_han AND n_latin >= n_arabic THEN 'latin' "
        "WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_han AND "
        "n_cyrillic >= n_arabic THEN 'cyrillic' "
        "WHEN n_greek >= n_han AND n_greek >= n_arabic THEN 'greek' "
        "WHEN n_han >= n_arabic THEN 'han' ELSE 'arabic' END"
    )
    return (
        "WITH s AS (SELECT doc_id, COALESCE(text, '') || "
        "repeat('я', CASE WHEN doc_id % 11 = 0 THEN COALESCE(n_chars, 0) + 1 "
        "ELSE doc_id % 7 END) || repeat('α', doc_id % 5) AS t FROM documents), "
        f"c AS (SELECT doc_id, {cnt} FROM s) "
        "SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han, n_arabic, "
        f"{dom} AS dominant FROM c"
    )


def _data_quality_sql() -> str:
    """Bit-exact mirror of the q_data_quality constraint card: one UNION ALL
    arm per check, violations/n_rows in BIGINT, passed = violations <= 0.
    Null semantics match the engine's documented per-kind contract
    (ops/checks.py _rowlocal_violations): between ignores nulls, in_set and
    len_eq count them as violations, uniqueness counts nulls as ONE distinct
    value (pc.count_distinct mode='all' vs SQL COUNT(DISTINCT) skipping
    them — hence the null-presence correction term)."""

    def arm(name: str, viol: str, n: str) -> str:
        return (
            f"SELECT '{name}' AS check_name, CAST({viol} AS BIGINT) AS violations, "
            f"CAST({n} AS BIGINT) AS n_rows, "
            f"CAST(CASE WHEN {viol} <= 0 THEN 1 ELSE 0 END AS BIGINT) AS passed"
        )

    accepted = "'click', 'view', 'purchase', 'signup'"
    ev = (
        "ev AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS v_null, "
        f"CAST(COALESCE(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN ({accepted}) "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS v_set, "
        "CAST(COALESCE(SUM(CASE WHEN value < 0.0 OR value > 300.0 THEN 1 ELSE 0 END), 0) "
        "AS BIGINT) AS v_rng, "
        "CAST(COUNT(*) - COUNT(DISTINCT event_id) - "
        "CASE WHEN COUNT(*) > COUNT(event_id) THEN 1 ELSE 0 END AS BIGINT) AS v_dup "
        "FROM events)"
    )
    dc = (
        "dc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(CASE WHEN n_chars IS NULL OR text IS NULL OR "
        "n_chars <> length(text) THEN 1 ELSE 0 END), 0) AS BIGINT) AS v FROM documents)"
    )
    fk = (
        "fk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(CASE WHEN l_orderkey IS NULL OR l_orderkey NOT IN "
        "(SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL) "
        "THEN 1 ELSE 0 END), 0) AS BIGINT) AS v FROM lineitem)"
    )
    return (
        f"WITH {ev}, {dc}, {fk} "
        + arm("events.completeness.user_id", "v_null", "n") + " FROM ev UNION ALL "
        + arm("events.accepted.event_type", "v_set", "n") + " FROM ev UNION ALL "
        + arm("events.range.value", "v_rng", "n") + " FROM ev UNION ALL "
        + arm("events.unique.event_id", "v_dup", "n") + " FROM ev UNION ALL "
        + arm("documents.consistency.n_chars", "v", "n") + " FROM dc UNION ALL "
        + arm("lineitem.fk.orderkey", "v", "n") + " FROM fk"
    )


def _leakage_safe_split_sql(weights: dict, seed: int) -> str:
    """Bit-exact mirror of ops.curate.leakage_safe_split: the engine's
    content hash (FNV-1a over text bytes → splitmix64, _content_hash_cte)
    re-mixed through the seeded hash64_ints splitmix chain, then the SAME
    consecutive uint64 range thresholds split_assign uses."""
    m = "18446744073709551616"
    back = (
        "CAST(CAST(content_hash AS HUGEINT) + CASE WHEN content_hash < 0 "
        f"THEN CAST({m} AS HUGEINT) ELSE 0 END AS UBIGINT)"
    )
    return (
        f"WITH {_content_hash_cte()}, "
        f"lj AS (SELECT d.doc_id, d.lang, {back} AS chu "
        "FROM documents d JOIN allh ON d.doc_id = allh.doc_id), "
        f"{_splitmix_ctes(seed, 'doc_id, lang', table='lj', id_expr='chu', prefix='ls')} "
        f"SELECT doc_id, lang, {_split_case_sql(weights)} FROM ls5"
    )


def _decontaminate_sql(n: int, modulus: int) -> str:
    """Exact SQL mirror of ops.trainprep.decontaminate over the documents
    table: benchmark = rows with doc_id % modulus = 0, corpus = the rest;
    drop any corpus doc sharing a word n-gram with the benchmark.  Both
    sides build n-grams by 1-based inclusive list slicing — documents
    shorter than n tokens emit none (empty range), matching the engine."""
    gram = f"array_to_string(tk[i : i + {n - 1}], ' ')"
    explode = f"unnest(range(1, len(tk) - {n} + 2)) AS i"
    return (
        f"WITH bench AS (SELECT DISTINCT {gram} AS g FROM "
        f"(SELECT tk, {explode} FROM (SELECT string_split(text, ' ') AS tk "
        f"FROM documents WHERE doc_id % {modulus} = 0))), "
        f"corpus AS (SELECT doc_id, lang, source, string_split(text, ' ') AS tk "
        f"FROM documents WHERE doc_id % {modulus} <> 0), "
        f"hits AS (SELECT DISTINCT doc_id FROM "
        f"(SELECT doc_id, tk, {explode} FROM corpus) "
        f"WHERE {gram} IN (SELECT g FROM bench)) "
        "SELECT doc_id, lang, source FROM corpus "
        "WHERE doc_id NOT IN (SELECT doc_id FROM hits)"
    )


def _bigram_logloss_sql(oov: int, backoff: int, modulus: int) -> str:
    """Exact SQL mirror of ops.textstats.bigram_logloss with reference =
    documents where doc_id % modulus <> 0, scoring ALL documents.  ilog2 =
    strlen(bin(x))-1; bigram i spans tk[i:i+1] (inclusive 1-based slice)."""
    il = "strlen(bin({x})) - 1"
    return (
        "WITH tl AS MATERIALIZED (SELECT doc_id, "
        "string_split(COALESCE(text, ''), ' ') AS tk FROM documents), "
        f"refd AS (SELECT tk FROM tl WHERE doc_id % {modulus} <> 0), "
        "uni AS MATERIALIZED (SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM (SELECT unnest(tk) AS t FROM refd) GROUP BY t), "
        "tot AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni), "
        "big AS MATERIALIZED (SELECT array_to_string(tk[i : i + 1], ' ') AS g, "
        "tk[i] AS p, CAST(COUNT(*) AS BIGINT) AS c FROM "
        "(SELECT tk, unnest(range(1, len(tk))) AS i FROM refd) GROUP BY 1, 2), "
        "ctx AS MATERIALIZED (SELECT p, CAST(SUM(c) AS BIGINT) AS c FROM big "
        "GROUP BY p), "
        "pos AS (SELECT doc_id, tk[j] AS cur, CASE WHEN j > 1 THEN "
        "array_to_string(tk[j - 1 : j], ' ') END AS g2, j FROM "
        "(SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS j FROM tl)), "
        "cost AS (SELECT p.doc_id, CASE WHEN b.c IS NOT NULL THEN "
        f"({il.format(x='cx.c')}) - ({il.format(x='b.c')}) ELSE "
        f"(CASE WHEN u.c IS NOT NULL THEN "
        f"(SELECT {il.format(x='n')} FROM tot) - ({il.format(x='u.c')}) "
        f"ELSE (SELECT {il.format(x='n')} FROM tot) + {oov} END) + "
        f"(CASE WHEN p.j > 1 THEN {backoff} ELSE 0 END) END AS c "
        "FROM pos p LEFT JOIN uni u ON u.tok = p.cur "
        "LEFT JOIN big b ON b.g = p.g2 "
        "LEFT JOIN ctx cx ON cx.p = b.p) "
        "SELECT c.doc_id, CAST(t.L AS BIGINT) AS n_tokens, "
        "CAST(SUM(c.c) AS BIGINT) AS bits FROM cost c JOIN "
        "(SELECT doc_id, len(tk) AS L FROM tl) t ON t.doc_id = c.doc_id "
        "GROUP BY 1, 2"
    )


def _contamination_report_sql(n: int, modulus: int) -> str:
    """Exact SQL mirror of ops.trainprep.contamination_report: benchmark =
    doc_id % modulus = 0, corpus = the rest; per benchmark doc the count of
    its DISTINCT word n-grams and how many occur anywhere in the corpus.
    Same 1-based list-slice n-gram construction as _decontaminate_sql."""
    gram = f"array_to_string(tk[i : i + {n - 1}], ' ')"
    explode = f"unnest(range(1, len(tk) - {n} + 2)) AS i"
    return (
        f"WITH bg AS MATERIALIZED (SELECT DISTINCT doc_id, {gram} AS g FROM "
        f"(SELECT doc_id, tk, {explode} FROM "
        f"(SELECT doc_id, string_split(text, ' ') AS tk FROM documents "
        f"WHERE doc_id % {modulus} = 0))), "
        f"cg AS MATERIALIZED (SELECT DISTINCT {gram} AS g FROM "
        f"(SELECT tk, {explode} FROM (SELECT string_split(text, ' ') AS tk "
        f"FROM documents WHERE doc_id % {modulus} <> 0))) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(SUM(CASE WHEN g IN (SELECT g FROM cg) THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_hit FROM bg GROUP BY doc_id"
    )


def _chunk_documents_sql(chunk: int, overlap: int) -> str:
    """Exact SQL mirror of ops.trainprep.chunk_documents: sliding token
    windows of size ``chunk``, stride ``chunk - overlap``; a doc of L
    tokens yields 1 window if L <= chunk else (L-chunk+S-1)//S + 1."""
    s = chunk - overlap
    return (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk, "
        "len(string_split(text, ' ')) AS L FROM documents), "
        "e AS (SELECT doc_id, tk, L, unnest(range(0, "
        f"CASE WHEN L <= {chunk} THEN 1 "
        f"ELSE (L - {chunk} + {s} - 1) // {s} + 1 END)) AS i FROM t) "
        "SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, "
        f"array_to_string(tk[i * {s} + 1 : least(i * {s} + {chunk}, L)], ' ') "
        "AS chunk_text, "
        f"least(CAST({chunk} AS BIGINT), L - i * {s}) AS n_tokens FROM e"
    )


def _links_mod():
    from fever_ray.ops import links

    return links


def _token_budget_select_sql(budget: int, seed: int) -> str:
    """Bit-exact mirror of ops.trainprep.token_budget_select: exclusive
    token cumsum over the global (splitmix hash, id) order; keep documents
    whose whole token count still fits the budget.  The engine's
    bucket-prefix construction concatenates hash-ordered buckets, which IS
    this global window order."""
    inner = _splitmix_doc_sql(
        seed,
        "doc_id, text",
        "TRUE",
        select_expr=(
            "doc_id, h, CAST(len(string_split(COALESCE(text, ''), ' ')) "
            "AS BIGINT) AS L"
        ),
    )
    return (
        f"WITH seq AS (SELECT doc_id, L, CAST(COALESCE(SUM(L) OVER "
        f"(ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"1 PRECEDING), 0) AS BIGINT) AS S FROM ({inner}) t) "
        f"SELECT doc_id, L AS n_tokens FROM seq WHERE S + L <= {budget}"
    )


def _mixture_sample_sql(weights: dict, seed: int) -> str:
    """Bit-exact mirror of ops.curate.mixture_sample: per-source
    k_s = w_s * min_s(n_s // w_s) rows with the smallest splitmix64
    id-hashes.  The hash is a bijection, so ROW_NUMBER ordered by h is
    deterministic; sources named in the weights but absent from the corpus
    force m = 0 via the LEFT JOIN + COALESCE(n, 0)."""
    vals = ", ".join(f"('{k}', {int(w)})" for k, w in weights.items())
    in_list = ", ".join(f"'{k}'" for k in weights)
    inner = _splitmix_doc_sql(
        seed,
        "doc_id, source",
        f"source IN ({in_list})",
        select_expr="doc_id, source, h",
    )
    return (
        f"WITH sel AS ({inner}), "
        f"w(source, wt) AS (VALUES {vals}), "
        f"n AS (SELECT source, COUNT(*) AS n FROM sel GROUP BY source), "
        f"m AS (SELECT MIN(COALESCE(n.n, 0) // w.wt) AS m "
        f"FROM w LEFT JOIN n USING (source)), "
        f"r AS (SELECT doc_id, source, ROW_NUMBER() OVER "
        f"(PARTITION BY source ORDER BY h) AS rk FROM sel) "
        f"SELECT r.doc_id, r.source FROM r JOIN w USING (source) "
        f"CROSS JOIN m WHERE r.rk <= w.wt * m.m"
    )


def _repeat_corpus_sql(repeats: dict, default: int) -> str:
    """Exact mirror of ops.curate.repeat_corpus: unnest(range(k)) per row,
    k from a CASE over the key column (null / unlisted keys → default,
    matching the engine's fixed-vocabulary index_in sentinel)."""
    case = (
        "CASE lang "
        + " ".join(f"WHEN '{k}' THEN {int(v)}" for k, v in repeats.items())
        + f" ELSE {int(default)} END"
    )
    return (
        f"SELECT doc_id, lang, CAST(UNNEST(range(0, {case})) AS BIGINT) "
        f"AS copy_id FROM documents"
    )


def _line_dedup_sql(threshold: int) -> str:
    """Exact mirror of ops.dedup.line_dedup over synthetic 3-line docs
    (text || \\n || lang || \\n || source): explode lines with ordinality,
    count corpus-wide, keep lines with count <= threshold, re-aggregate in
    original order, drop documents left empty (GROUP BY only sees docs
    with surviving lines)."""
    return (
        f"WITH docs AS (SELECT doc_id, COALESCE(text, '') || chr(10) || "
        f"COALESCE(lang, '') || chr(10) || COALESCE(source, '') AS text "
        f"FROM documents), "
        f"sp AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM docs), "
        f"ex AS (SELECT doc_id, ls[i] AS ln, i AS ord FROM "
        f"(SELECT doc_id, ls, UNNEST(range(1, len(ls) + 1)) AS i FROM sp)), "
        f"c AS (SELECT ln, COUNT(*) AS n FROM ex GROUP BY ln), "
        f"k AS (SELECT doc_id, ln, ord FROM ex JOIN c USING (ln) "
        f"WHERE n <= {threshold}) "
        f"SELECT doc_id, string_agg(ln, chr(10) ORDER BY ord) AS text, "
        f"CAST(COUNT(*) AS BIGINT) AS n_kept FROM k GROUP BY doc_id"
    )


def _epoch_shuffle_sql(seed: int) -> str:
    """Bit-exact mirror of ops.trainprep.epoch_shuffle: the global ordinal
    is the rank under (splitmix64 id-hash, id) — the engine's
    histogram-prefix construction concatenates hash-ordered buckets, which
    IS this global order."""
    inner = _splitmix_doc_sql(seed, "doc_id", "TRUE", select_expr="doc_id, h")
    return (
        f"SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 "
        f"AS BIGINT) AS shuffle_pos FROM ({inner}) t"
    )


def _quantile_bucket_sql(k: int, seed: int) -> str:
    """Bit-exact mirror of ops.stats.quantile_bucket: the engine's
    cell-prefix ranks concatenate cells ordered by (value, hash-top, hash,
    id) — which IS the plain (value, h, id) order, so the tile is NTILE
    over that composite key."""
    sm = _splitmix_ctes(seed, "doc_id, n_tokens", table="tl")
    return (
        "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
        "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens "
        "FROM documents), "
        + sm
        + f" SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
        f"CAST(NTILE({k}) OVER (ORDER BY n_tokens, h, doc_id) AS BIGINT) "
        "AS tile FROM s5"
    )


def _importance_resample_sql(scale: int, seed: int) -> str:
    """Bit-exact mirror of ops.curate.importance_resample over token
    counts: keep iff (h >> 32) * scale < clamp(n_tokens, 0, scale) * 2^32,
    pure int64 arithmetic on both sides."""
    sm = _splitmix_ctes(seed, "doc_id, n_tokens", table="tl")
    return (
        "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
        "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens "
        "FROM documents), "
        + sm
        + " SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM s5 "
        f"WHERE CAST(h >> 32 AS BIGINT) * {scale} < "
        f"CAST(LEAST(GREATEST(n_tokens, 0), {scale}) AS BIGINT) * 4294967296"
    )


def _token_budget_mix_sql(weights: dict, budget: int, seed: int) -> str:
    """Mirror of ops.trainprep.token_budget_mix: per-source exclusive token
    cumsum over the (splitmix hash, id) order, per-source integer budgets
    w·B // Σw, unlisted sources budget 0 (dropped)."""
    wsum = sum(weights.values())
    case = (
        "CASE source "
        + " ".join(
            f"WHEN '{s}' THEN {(int(w) * int(budget)) // int(wsum)}"
            for s, w in weights.items()
        )
        + " ELSE 0 END"
    )
    inner = _splitmix_doc_sql(
        seed,
        "doc_id, source, text",
        "TRUE",
        select_expr=(
            "doc_id, source, h, CAST(len(string_split(COALESCE(text, ''), "
            "' ')) AS BIGINT) AS L"
        ),
    )
    return (
        f"WITH seq AS (SELECT doc_id, source, L, CAST(COALESCE(SUM(L) OVER "
        f"(PARTITION BY source ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS S FROM ({inner}) t) "
        f"SELECT doc_id, source, L AS n_tokens FROM seq WHERE "
        f"S + L <= {case}"
    )


def _pack_sequences_sql(budget: int, seed: int, n_buckets: int) -> str:
    """Bit-exact mirror of ops.trainprep.pack_sequences: bucket = top
    log2(n_buckets) bits of the id-hash, exclusive token cumsum per bucket
    in id order, pack p covers stream tokens [p*budget, (p+1)*budget)."""
    shift = 64 - (int(n_buckets).bit_length() - 1)
    inner = _splitmix_doc_sql(
        seed,
        "doc_id, text",
        "TRUE",
        select_expr=(
            "doc_id, CAST(h >> " + str(shift) + " AS INTEGER) AS bucket, "
            "CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS L"
        ),
    )
    return (
        f"WITH seq AS (SELECT doc_id, bucket, L, "
        f"CAST(COALESCE(SUM(L) OVER (PARTITION BY bucket ORDER BY doc_id "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
        f"AS S FROM ({inner}) t), "
        f"seg AS (SELECT bucket, doc_id, L, S, "
        f"UNNEST(generate_series(S // {budget}, (S + L - 1) // {budget})) "
        f"AS p FROM seq) "
        f"SELECT bucket, CAST(p AS BIGINT) AS pack_id, doc_id, "
        f"CAST(GREATEST(S, p * {budget}) - S AS BIGINT) AS tok_start, "
        f"CAST(LEAST(S + L, (p + 1) * {budget}) - S AS BIGINT) AS tok_end, "
        f"CAST(LEAST(S + L, (p + 1) * {budget}) - GREATEST(S, p * {budget}) "
        f"AS BIGINT) AS n_tokens FROM seg"
    )


_TOKEN_REPETITION_CTE = (
    # exact per-doc token multiset stats via explode + two groupbys; empty
    # text is defined as zero tokens (the engine's token_stats convention)
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
    "FROM documents WHERE text <> ''), "
    "tc AS (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t), "
    "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, "
    "CAST(count(*) AS BIGINT) AS n_distinct_tokens, "
    "CAST(max(c) AS BIGINT) AS top_c FROM tc GROUP BY doc_id), "
    "rep AS (SELECT d.doc_id, "
    "coalesce(a.n_tokens, 0) AS n_tokens, "
    "coalesce(a.n_distinct_tokens, 0) AS n_distinct_tokens, "
    "CAST(coalesce(a.n_tokens, 0) - coalesce(a.n_distinct_tokens, 0) AS DOUBLE) "
    "/ CAST(greatest(coalesce(a.n_tokens, 0), 1) AS DOUBLE) AS dup_token_ratio, "
    "CAST(coalesce(a.top_c, 0) AS DOUBLE) "
    "/ CAST(greatest(coalesce(a.n_tokens, 0), 1) AS DOUBLE) AS top_token_frac "
    "FROM documents d LEFT JOIN agg a USING (doc_id)) "
)


def _embedding_cluster_ctes(k: int, seed: int) -> str:
    """Shared CTE prefix mirroring ops.cluster.embedding_cluster: the
    five-stage splitmix64 hash of vec_id (bit-exact, splitmix is a
    bijection so the ORDER BY h LIMIT k centroid pick has no ties) and the
    nearest-centroid assignment (cosine DESC, centroid id ASC — the
    engine's argmax-over-id-ordered-centroids tie policy)."""
    chain = _splitmix_ctes(
        seed, "vec_id, embedding", table="embeddings", id_expr="vec_id", prefix="h"
    )
    return (
        f"{chain}, "
        f"c AS (SELECT vec_id AS cid, embedding AS ce FROM h5 ORDER BY h LIMIT {k}), "
        "a AS (SELECT vec_id, cluster_id FROM ("
        "  SELECT e.vec_id, c.cid AS cluster_id, ROW_NUMBER() OVER ("
        "    PARTITION BY e.vec_id "
        "    ORDER BY list_cosine_similarity(c.ce, e.embedding) DESC, c.cid) AS rn "
        "  FROM embeddings e CROSS JOIN c) WHERE rn = 1)"
    )


def _embedding_cluster_sql(k: int, seed: int) -> str:
    return f"WITH {_embedding_cluster_ctes(k, seed)} SELECT vec_id, cluster_id FROM a"


def _semdedup_sql(k: int, seed: int, threshold: float) -> str:
    """Mirror of ops.cluster.semdedup: kept=False iff a smaller-id row of
    the same cluster is >= threshold cosine-similar."""
    return (
        f"WITH {_embedding_cluster_ctes(k, seed)}, "
        "drp AS (SELECT DISTINCT x.vec_id FROM a x "
        "JOIN a y ON x.cluster_id = y.cluster_id AND y.vec_id < x.vec_id "
        "JOIN embeddings ex ON ex.vec_id = x.vec_id "
        "JOIN embeddings ey ON ey.vec_id = y.vec_id "
        f"WHERE list_cosine_similarity(ex.embedding, ey.embedding) >= {threshold}) "
        "SELECT a.vec_id, a.cluster_id, "
        "a.vec_id NOT IN (SELECT vec_id FROM drp) AS kept FROM a"
    )


def _knn_graph_sql(n_neighbors: int, k_clusters: int, seed: int) -> str:
    """Mirror of ops.cluster.knn_graph: per row, the top-n cosine neighbors
    within its cluster, ordered (cosine DESC, neighbor id ASC).

    Tie-fragility note: this oracle gates a float RANKING (numpy float64
    normalized-dot vs DuckDB list_cosine_similarity).  Bit-equal duplicate
    embeddings tie identically on both sides (id tie-break); DISTINCT
    vectors whose cosines to a source differ by less than the cross-engine
    rounding gap (~1e-7 on float32 lists) could rank oppositely.  The gate
    corpora's adjacent-neighbor gaps are orders of magnitude wider
    (verified at sf0.001/0.01/0.1) — same acceptance as knn_bruteforce."""
    return (
        f"WITH {_embedding_cluster_ctes(k_clusters, seed)}, "
        "av AS (SELECT a.vec_id, a.cluster_id, e.embedding "
        "FROM a JOIN embeddings e USING (vec_id)), "
        "nb AS (SELECT x.vec_id, y.vec_id AS neighbor_id, "
        "ROW_NUMBER() OVER (PARTITION BY x.vec_id "
        "ORDER BY list_cosine_similarity(x.embedding, y.embedding) DESC, "
        "y.vec_id) AS nn_rank "
        "FROM av x JOIN av y "
        "ON x.cluster_id = y.cluster_id AND x.vec_id <> y.vec_id) "
        f"SELECT vec_id, neighbor_id, nn_rank FROM nb WHERE nn_rank <= {n_neighbors}"
    )


def _linear_score_sql() -> str:
    """Bit-exact mirror of ops.mlscore.linear_score with the deterministic
    stand-in model: per token, bucket = splitmix64(fnv1a(token)) mod 2^16,
    weight = splitmix64(bucket XOR seed) mod 1001 - 500; per doc, score =
    integer sum of weights (empty text = zero tokens = score 0)."""
    from fever_ray.ops.mlscore import DEFAULT_WEIGHT_SEED

    mulmod = _sql_mulmod
    fnv_token = _sql_fnv1a_over("t")
    m1, m2 = "13787848793156543929", "10723151780598845931"
    seed = str(DEFAULT_WEIGHT_SEED)
    return (
        "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t "
        "FROM documents WHERE text <> ''), "
        f"h0 AS (SELECT doc_id, {fnv_token} AS v FROM tok), "
        "h1 AS (SELECT doc_id, xor(v, v >> 30) AS v FROM h0), "
        f"h2 AS (SELECT doc_id, {mulmod('v', m1)} AS v FROM h1), "
        "h3 AS (SELECT doc_id, xor(v, v >> 27) AS v FROM h2), "
        f"h4 AS (SELECT doc_id, {mulmod('v', m2)} AS v FROM h3), "
        "h5 AS (SELECT doc_id, xor(v, v >> 31) AS v FROM h4), "
        f"b0 AS (SELECT doc_id, xor(v % 65536, CAST({seed} AS UBIGINT)) AS v FROM h5), "
        "w1 AS (SELECT doc_id, xor(v, v >> 30) AS v FROM b0), "
        f"w2 AS (SELECT doc_id, {mulmod('v', m1)} AS v FROM w1), "
        "w3 AS (SELECT doc_id, xor(v, v >> 27) AS v FROM w2), "
        f"w4 AS (SELECT doc_id, {mulmod('v', m2)} AS v FROM w3), "
        "w5 AS (SELECT doc_id, xor(v, v >> 31) AS v FROM w4), "
        "wv AS (SELECT doc_id, CAST(v % 1001 AS BIGINT) - 500 AS wt FROM w5), "
        "s AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM wv GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(s.score, 0) AS score, "
        "COALESCE(s.score, 0) >= 0 AS kept "
        "FROM documents d LEFT JOIN s USING (doc_id)"
    )


def _sm_list_steps(col: str) -> list[str]:
    """The five splitmix64 finalizer stages as elementwise list_transform
    expressions — the ONE source of truth for every list-valued splitmix
    mirror (`_shingle_ctes` and `_minhash_verify_ctes` both chain these)."""
    mulmod = _sql_mulmod
    return [
        f"list_transform({col}, x -> xor(x, x >> 30))",
        f"list_transform({col}, y -> {mulmod('y', '13787848793156543929')})",
        f"list_transform({col}, x -> xor(x, x >> 27))",
        f"list_transform({col}, y -> {mulmod('y', '10723151780598845931')})",
        f"list_transform({col}, x -> xor(x, x >> 31))",
    ]


def _shingle_ctes(base_docs: str) -> list:
    """CTE chain (name, body, materialized) producing per-doc DISTINCT
    position-mixed 3-token shingle hashes as CTE ``shu`` over an arbitrary
    (doc_id, text) source — tokenize → FNV+splitmix per token → shingle
    folds — bit-exact vs the engine's ``_shingle_hash_flat``.  The shared
    prefix of the MinHash verify chain and the containment oracle."""
    m = "18446744073709551616"

    mulmod = _sql_mulmod
    sm_steps = _sm_list_steps

    fnv_token = _sql_fnv1a_over("t")

    ctes: list[tuple[str, str, bool]] = []

    def add(name: str, body: str, mat: bool = False) -> None:
        # mat=True → AS MATERIALIZED: DuckDB inlines CTEs by default, so a
        # CTE referenced twice (self-joins below) re-runs its whole
        # upstream pipeline per reference — materializing the fan-out
        # points cuts the oracle from ~60s to seconds
        ctes.append((name, body, mat))

    def chain(base: str, col: str, prefix: str) -> str:
        prev = base
        for i, expr in enumerate(sm_steps(col)):
            nm = f"{prefix}{i}"
            add(nm, f"SELECT * REPLACE ({expr} AS {col}) FROM {prev}")
            prev = nm
        return prev

    # token hashes ROW-LEVEL: zipped UNNEST → one FNV list_reduce per token
    # row → five scalar splitmix stages (vectorized) → re-aggregate ordered
    add("tok", f"SELECT doc_id, string_split(text, ' ') AS toks FROM ({base_docs})")
    add("trow", "SELECT doc_id, UNNEST(range(1, len(toks) + 1)) AS ti, UNNEST(toks) AS t FROM tok")
    add("th0", f"SELECT doc_id, ti, {fnv_token} AS v FROM trow")
    add("th1", "SELECT doc_id, ti, xor(v, v >> 30) AS v FROM th0")
    add("th2", f"SELECT doc_id, ti, {mulmod('v', '13787848793156543929')} AS v FROM th1")
    add("th3", "SELECT doc_id, ti, xor(v, v >> 27) AS v FROM th2")
    add("th4", f"SELECT doc_id, ti, {mulmod('v', '10723151780598845931')} AS v FROM th3")
    add("th5", "SELECT doc_id, ti, xor(v, v >> 31) AS v FROM th4")
    prev = "tk"
    add("tk", "SELECT doc_id, array_agg(v ORDER BY ti) AS hs FROM th5 GROUP BY doc_id", mat=True)
    add("sf0", f"SELECT doc_id, hs, len(hs) AS L, list_transform(range(1, greatest(len(hs) - 2, 0) + 1), "
               f"i -> xor(hs[i], CAST((CAST(hs[i+1] AS HUGEINT) * 3) % {m} AS UBIGINT))) AS sh FROM {prev}")
    prev = chain("sf0", "sh", "sfa")
    add("sf2", f"SELECT doc_id, hs, L, list_transform(range(1, greatest(L - 2, 0) + 1), "
               f"i -> xor(sh[i], CAST((CAST(hs[i+2] AS HUGEINT) * 5) % {m} AS UBIGINT))) AS sh FROM {prev}")
    prev = chain("sf2", "sh", "sfb")
    add("shu", f"SELECT doc_id, list_distinct(sh) AS sh FROM {prev} WHERE len(sh) > 0", mat=True)
    return ctes


def _minhash_verify_ctes(base_docs: str) -> list:
    """CTE chain (name, body, materialized) mirroring the engine's MinHash
    pipeline over an arbitrary (doc_id, text) source ``base_docs`` —
    the shared `_shingle_ctes` prefix, then 64 seeded MinHash permutations
    (salts hardcoded from the engine's rng(seed=1) stream) → 16-band LSH
    fold → candidate pairs → exact shingle-set Jaccard ≥ 0.7 (the
    ``verify`` CTE).  Every splitmix64 runs as five elementwise
    list_transform stages (an inline expansion would duplicate its
    argument ~72× per application) and the per-permutation mins slice one
    flat (salt × shingle) cross list, so the SQL stays linear in data
    size.  Shared by ``_minhash_dedup_sql`` (recursive component closure
    tail) and ``_minhash_cross_dedup_sql`` (cross-pair anti-join tail)."""
    import numpy as np

    mulmod = _sql_mulmod
    sm_steps = _sm_list_steps

    salts = np.random.default_rng(1).integers(0, 2**63, size=64, dtype=np.uint64)
    salts_list = "[" + ",".join(f"CAST({int(s)} AS UBIGINT)" for s in salts) + "]"

    ctes: list[tuple[str, str, bool]] = _shingle_ctes(base_docs)

    def add(name: str, body: str, mat: bool = False) -> None:
        ctes.append((name, body, mat))

    def chain(base: str, col: str, prefix: str) -> str:
        prev = base
        for i, expr in enumerate(sm_steps(col)):
            nm = f"{prefix}{i}"
            add(nm, f"SELECT * REPLACE ({expr} AS {col}) FROM {prev}")
            prev = nm
        return prev
    # signature stage RELATIONALLY: unnest (doc, shingle) rows × 64 salts,
    # run splitmix as scalar column stages (vectorized C++, ~64× faster
    # than per-row list lambdas), then group back to per-(doc, perm) minima
    add("shrow", "SELECT doc_id, UNNEST(sh) AS x FROM shu")
    add("salt", f"SELECT p, ({salts_list})[p + 1] AS s FROM (SELECT UNNEST(range(0, 64)) AS p)")
    add("cx0", "SELECT doc_id, p, xor(x, s) AS v FROM shrow, salt")
    add("cx1", "SELECT doc_id, p, xor(v, v >> 30) AS v FROM cx0")
    add("cx2", f"SELECT doc_id, p, {mulmod('v', '13787848793156543929')} AS v FROM cx1")
    add("cx3", "SELECT doc_id, p, xor(v, v >> 27) AS v FROM cx2")
    add("cx4", f"SELECT doc_id, p, {mulmod('v', '10723151780598845931')} AS v FROM cx3")
    add("cx5", "SELECT doc_id, p, xor(v, v >> 31) AS v FROM cx4")
    add("sigrow", "SELECT doc_id, p, MIN(v) AS sv FROM cx5 GROUP BY doc_id, p")
    add("sig", "SELECT s0.doc_id, shu.sh, s0.sig FROM "
               "(SELECT doc_id, array_agg(sv ORDER BY p) AS sig FROM sigrow GROUP BY doc_id) s0 "
               "JOIN shu ON shu.doc_id = s0.doc_id")
    add("bd0", "SELECT doc_id, sh, sig, list_transform(range(0, 16), b -> xor(sig[4*b + 1], CAST(1 AS UBIGINT))) AS acc FROM sig")
    prev = chain("bd0", "acc", "bda")
    for r in (1, 2, 3):
        add(f"bd{r}", f"SELECT doc_id, sh, sig, list_transform(range(0, 16), "
                      f"b -> xor(xor(acc[b + 1], sig[4*b + {r+1}]), CAST({r+1} AS UBIGINT))) AS acc FROM {prev}")
        prev = chain(f"bd{r}", "acc", f"bd{r}x")
    add("bandrows", f"SELECT doc_id, sh, u.b AS band_idx, acc[u.b + 1] AS band_hash FROM {prev}, "
                    "(SELECT UNNEST(range(0,16)) AS b) u", mat=True)
    add("cand", "SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bandrows a JOIN bandrows b "
                "ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id")
    add("shset", "SELECT DISTINCT doc_id, sh FROM shu", mat=True)
    add("verify", "SELECT c.da, c.db FROM cand c JOIN shset x ON x.doc_id = c.da "
                  "JOIN shset y ON y.doc_id = c.db "
                  "WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / "
                  "GREATEST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)), 1) >= 0.7", mat=True)
    return ctes


def _minhash_ctes_sql(ctes: list) -> str:
    return ", ".join(
        f"{n} AS {'MATERIALIZED ' if mt else ''}({b})" for n, b, mt in ctes
    )


def _token_variant_clusters_sql() -> str:
    """Mirror of ops.editsim.token_variant_clusters: the levenshtein pair
    set over the ASCII/length-gated vocabulary, token hashes via the
    engine's FNV→splitmix chain reinterpreted signed, recursive min-
    reachable closure — the exact semantic of distributed min-label
    propagation with a hash-valued label."""
    m = "18446744073709551616"
    mulmod = _sql_mulmod
    fnv_t = _sql_fnv1a_over("t")
    to_i64 = (
        "CAST(CAST(x AS HUGEINT) - CASE WHEN x >= "
        "CAST(9223372036854775808 AS UBIGINT) "
        f"THEN CAST({m} AS HUGEINT) ELSE 0 END AS BIGINT)"
    )
    return (
        "WITH RECURSIVE "
        "tok AS MATERIALIZED (SELECT unnest(string_split(COALESCE(text, "
        "''), ' ')) AS t FROM documents), "
        "v AS MATERIALIZED (SELECT t FROM tok WHERE len(t) BETWEEN 1 AND "
        "24 AND len(t) = strlen(t) GROUP BY t), "
        f"vh0 AS (SELECT t, {fnv_t} AS h0 FROM v), "
        "vh1 AS (SELECT t, xor(h0, h0 >> 30) AS y FROM vh0), "
        f"vh2 AS (SELECT t, {mulmod('y', '13787848793156543929')} AS x FROM vh1), "
        "vh3 AS (SELECT t, xor(x, x >> 27) AS y FROM vh2), "
        f"vh4 AS (SELECT t, {mulmod('y', '10723151780598845931')} AS x FROM vh3), "
        "vh5 AS (SELECT t, xor(x, x >> 31) AS x FROM vh4), "
        f"vh AS MATERIALIZED (SELECT t, {to_i64} AS h FROM vh5), "
        "e AS MATERIALIZED (SELECT a.t AS ta, a.h AS ha, b.t AS tb, "
        "b.h AS hb FROM vh a JOIN vh b ON a.t < b.t "
        "AND abs(len(a.t) - len(b.t)) <= 2 AND levenshtein(a.t, b.t) <= 2), "
        "sym AS MATERIALIZED (SELECT ha AS a, hb AS b FROM e "
        "UNION SELECT hb AS a, ha AS b FROM e), "
        "reach AS (SELECT a, b FROM sym "
        "UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a), "
        "nodes AS (SELECT t, h FROM (SELECT ta AS t, ha AS h FROM e "
        "UNION SELECT tb AS t, hb AS h FROM e)) "
        "SELECT n.t AS tok, LEAST(n.h, MIN(r.b)) AS cluster_id "
        "FROM nodes n JOIN reach r ON r.a = n.h GROUP BY n.t, n.h"
    )


def _ngram_novelty_sql() -> str:
    """Mirror of ops.textstats.ngram_novelty: the shared shingle-hash CTE
    prefix, posting sizes per shingle, per-doc counts of posting-size-1
    shingles — pure integers over the identical 64-bit shingle hashes, so
    the gate hashes bit-exactly (collisions included)."""
    ctes = _shingle_ctes("SELECT doc_id, text FROM documents")
    ctes.append(("ex", "SELECT doc_id, UNNEST(sh) AS h FROM shu", True))
    ctes.append(("fr", "SELECT h, COUNT(*) AS c FROM ex GROUP BY h", True))
    ctes.append(
        (
            "nv",
            "SELECT e.doc_id, SUM(CASE WHEN f.c = 1 THEN 1 ELSE 0 END) AS "
            "novel, COUNT(*) AS total FROM ex e JOIN fr f ON e.h = f.h "
            "GROUP BY e.doc_id",
            True,
        )
    )
    return (
        "WITH "
        + _minhash_ctes_sql(ctes)
        + " SELECT d.doc_id, CAST(COALESCE(nv.novel, 0) AS BIGINT) AS "
        "novel_shingles, CAST(COALESCE(nv.total, 0) AS BIGINT) AS "
        "total_shingles FROM documents d LEFT JOIN nv ON d.doc_id = nv.doc_id"
    )


def _containment_pairs_sql(
    thr_num: int = 4, thr_den: int = 5, cap: int = 16,
    max_candidates_sql: str | None = None,
) -> str:
    """Mirror of ops.dedup.containment_pairs: the shared shingle-hash CTE
    prefix, candidates = pairs sharing a rare shingle (posting size in
    [2, cap]), kept iff thr_den·|∩| ≥ thr_num·min(|A|, |B|) — pure
    integers, so the gate hashes bit-exactly.

    ``max_candidates_sql`` mirrors ``containment_pairs(max_candidates=...)``
    (ops/dedup.py containment_cap_eff): df histogram of the rare shingles,
    integer cumulative predicted-pair count ordered by df, effective cap =
    MAX(df) whose cumulative fits the ceiling (COALESCE 1 = zero
    candidates when even df=2 overflows) — the same deterministic
    selection the engine computes from its exact histogram."""
    ctes = _shingle_ctes("SELECT doc_id, text FROM documents")
    ctes.append(
        ("post", "SELECT doc_id, UNNEST(sh) AS x FROM shu", True)
    )
    ctes.append(
        (
            "rare",
            "SELECT x, COUNT(*) AS df FROM post GROUP BY x "
            f"HAVING COUNT(*) BETWEEN 2 AND {cap}",
            True,
        )
    )
    if max_candidates_sql is not None:
        ctes.append(
            (
                "caph",
                "SELECT df, COUNT(*) AS n FROM rare GROUP BY df",
                True,
            )
        )
        ctes.append(
            (
                "cume",
                "SELECT df, SUM(n * df * (df - 1) // 2) "
                "OVER (ORDER BY df) AS cum FROM caph",
                True,
            )
        )
        ctes.append(
            (
                "capeff",
                "SELECT COALESCE(MAX(df), 1) AS c FROM cume "
                f"WHERE cum <= ({max_candidates_sql})",
                True,
            )
        )
        rare_gate = " AND r.df <= (SELECT c FROM capeff)"
    else:
        rare_gate = ""
    ctes.append(
        (
            "cand",
            "SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM post a "
            f"JOIN rare r ON a.x = r.x{rare_gate} JOIN post b ON b.x = a.x "
            "WHERE a.doc_id < b.doc_id",
            True,
        )
    )
    return (
        "WITH "
        + _minhash_ctes_sql(ctes)
        + " SELECT c.da AS doc_a, c.db AS doc_b, "
        "CAST(len(list_intersect(x.sh, y.sh)) AS BIGINT) AS n_common, "
        "CAST(LEAST(len(x.sh), len(y.sh)) AS BIGINT) AS n_small "
        "FROM cand c JOIN shu x ON x.doc_id = c.da "
        "JOIN shu y ON y.doc_id = c.db "
        f"WHERE {thr_den} * len(list_intersect(x.sh, y.sh)) >= "
        f"{thr_num} * LEAST(len(x.sh), len(y.sh))"
    )


def _sorted_neighbor_sql(
    w: int = 4, prefix: int = 16, t_num: int = 1, t_den: int = 2,
    same_prefix: int | None = None,
) -> str:
    """Mirror of ops.dedup.sorted_neighbor_pairs: rank every doc by the
    normalized text prefix (ROW_NUMBER — binary byte collation on both
    engines for this ASCII corpus), join rank-window candidates, verify by
    exact shingle-set Jaccard with the integer cross-multiply — the shared
    `_shingle_ctes` prefix, pure integers, bit-exact."""
    ctes = _shingle_ctes("SELECT doc_id, text FROM documents")
    ctes.append(
        (
            "keyd",
            "SELECT doc_id, substr(lower(replace(COALESCE(text, ''), "
            f"' ', '')), 1, {prefix}) AS k FROM documents",
            True,
        )
    )
    ctes.append(
        (
            "rk",
            "SELECT doc_id, k, ROW_NUMBER() OVER (ORDER BY k, doc_id) AS r "
            "FROM keyd",
            True,
        )
    )
    gate = (
        f" AND substr(a.k, 1, {same_prefix}) = substr(b.k, 1, {same_prefix})"
        if same_prefix
        else ""
    )
    ctes.append(
        (
            "cand",
            "SELECT a.doc_id AS da, b.doc_id AS db FROM rk a JOIN rk b "
            f"ON b.r > a.r AND b.r <= a.r + {w - 1}{gate}",
            True,
        )
    )
    inter = "len(list_intersect(x.sh, y.sh))"
    uni = f"(len(x.sh) + len(y.sh) - {inter})"
    return (
        "WITH "
        + _minhash_ctes_sql(ctes)
        + " SELECT c.da AS doc_a, c.db AS doc_b, "
        f"CAST({inter} AS BIGINT) AS inter, CAST({uni} AS BIGINT) AS uni "
        "FROM cand c JOIN shu x ON x.doc_id = c.da "
        "JOIN shu y ON y.doc_id = c.db "
        f"WHERE {t_den} * {inter} >= {t_num} * {uni}"
    )


def _allpairs_similarity_sql(t_num: int = 1, t_den: int = 2) -> str:
    """Mirror of ops.dedup.allpairs_similarity_join: the shared shingle-hash
    CTE prefix, intersection counts via a token equi-join (only pairs
    sharing ≥1 shingle can pass any t_num ≥ 1 threshold), kept iff
    t_den·|∩| ≥ t_num·|∪| — pure integers, bit-exact.  The
    engine's df-ordered prefix filter is a zero-false-negative candidate
    pruner (Bayardo et al. 2007), so the outputs are set-equal."""
    ctes = _shingle_ctes("SELECT doc_id, text FROM documents")
    ctes.append(("srow", "SELECT doc_id, UNNEST(sh) AS s FROM shu", True))
    ctes.append(
        (
            "cand",
            "SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter "
            "FROM srow a JOIN srow b ON a.s = b.s AND b.doc_id > a.doc_id "
            "GROUP BY a.doc_id, b.doc_id",
            True,
        )
    )
    uni = "(len(x.sh) + len(y.sh) - c.inter)"
    return (
        "WITH "
        + _minhash_ctes_sql(ctes)
        + " SELECT c.da AS doc_a, c.db AS doc_b, "
        f"CAST(c.inter AS BIGINT) AS inter, CAST({uni} AS BIGINT) AS uni "
        "FROM cand c JOIN shu x ON x.doc_id = c.da "
        "JOIN shu y ON y.doc_id = c.db "
        f"WHERE {t_den} * c.inter >= {t_num} * {uni}"
    )


def _minhash_dedup_sql() -> str:
    """Full within-corpus MinHash near-dedup: the shared verify chain plus
    connected components via a recursive-CTE min-reachable closure."""
    ctes = _minhash_verify_ctes("SELECT doc_id, text FROM documents")
    ctes.append((
        "sym",
        "SELECT da AS a, db AS b FROM verify UNION SELECT db AS a, da AS b FROM verify",
        True,
    ))
    return (
        "WITH RECURSIVE "
        + _minhash_ctes_sql(ctes)
        + ", reach AS (SELECT a, b FROM sym UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a) "
        "SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a"
    )


def _minhash_cross_dedup_sql() -> str:
    """Mirror of ops.dedup.minhash_cross_dedup with reference = documents
    whose doc_id % 7 == 0 (the cross_dedup split convention): reference ids
    enter the shared verify chain encoded as -id - 1, and a corpus doc is
    dropped iff a verified cross pair (da < 0 reference side, db >= 0
    corpus side) names it.  The chain verifies within-side candidate pairs
    too (the engine never generates them) — harmless for the final
    cross-pair filter, identical survivor set."""
    base = (
        "SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0 "
        "UNION ALL SELECT -doc_id - 1 AS doc_id, text FROM documents "
        "WHERE doc_id % 7 = 0"
    )
    ctes = _minhash_verify_ctes(base)
    return (
        "WITH "
        + _minhash_ctes_sql(ctes)
        + " SELECT d.doc_id FROM documents d WHERE d.doc_id % 7 <> 0 "
        "AND d.doc_id NOT IN (SELECT db FROM verify WHERE da < 0 AND db >= 0)"
    )


def _k_core_sql(k: int = 3, rounds: int = 4) -> str:
    """Unrolled simultaneous k-core peeling over the three-family graph
    (chain, skip-2, skip-3 per run of 10 user ids).  The engine iterates to
    fixpoint; the fixture graph's peeling depth is 2 at every scale, so 4
    unrolled rounds are provably idempotent past convergence — an extra
    round over a fixpoint edge set reproduces it exactly."""
    # AS MATERIALIZED: each round references the previous edge set three
    # times — inlined CTEs would re-expand the chain ~3^rounds times
    ctes = [
        "un AS MATERIALIZED (SELECT DISTINCT user_id AS u FROM events)",
        "e0 AS MATERIALIZED (SELECT u - 1 AS a, u AS b FROM un WHERE u % 10 <> 0 "
        "UNION SELECT u - 2 AS a, u AS b FROM un WHERE u % 10 >= 2 "
        "UNION SELECT u - 3 AS a, u AS b FROM un WHERE u % 10 >= 5)",
    ]
    for r in range(rounds):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT x AS node, COUNT(*) AS deg FROM "
            f"(SELECT a AS x FROM e{r} UNION ALL SELECT b FROM e{r}) "
            f"GROUP BY x)"
        )
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})"
        )
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT a, b FROM e{r} WHERE "
            f"a IN (SELECT node FROM k{r}) AND "
            f"b IN (SELECT node FROM k{r}))"
        )
    return (
        "WITH " + ", ".join(ctes) +
        f" SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM "
        f"(SELECT a AS x FROM e{rounds} UNION ALL SELECT b FROM e{rounds}) "
        f"GROUP BY x"
    )


def oracle_sql() -> dict[str, str]:
    url_expr = "'https://' || source || '.example.com/doc/' || doc_id || '.html'"
    return {
        "event_profiler": (
            "SELECT event_type, COUNT(*) AS n_events, "
            "CAST(SUM(strlen(props)) AS BIGINT) AS sum_bytes "
            "FROM events GROUP BY event_type"
        ),
        "flow_aggregator": (
            "SELECT user_id, event_type, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value, "
            "COUNT(*) AS n, "
            "MIN(ts) AS first_ts FROM events GROUP BY user_id, event_type"
        ),
        "unicorn_flow_report": (
            "SELECT user_id, COUNT(*) AS n_flows, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value "
            "FROM events WHERE event_type = 'purchase' AND value > 0 GROUP BY user_id"
        ),
        "pareto_front": (
            "WITH agg AS MATERIALIZED (SELECT user_id, COUNT(*) AS n_flows, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)/100 "
            "AS total_value FROM events "
            "WHERE event_type = 'purchase' AND value > 0 GROUP BY user_id) "
            "SELECT user_id, n_flows, total_value FROM agg a "
            "WHERE NOT EXISTS (SELECT 1 FROM agg b "
            "WHERE b.n_flows >= a.n_flows "
            "AND b.total_value >= a.total_value "
            "AND (b.n_flows > a.n_flows OR b.total_value > a.total_value))"
        ),
        "dns_aggregator": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users "
            "FROM events GROUP BY event_type"
        ),
        "pdns_collector": (
            "SELECT event_type, user_id, COUNT(*) AS n, MIN(ts) AS first_ts, "
            "MAX(ts) AS last_ts FROM events GROUP BY event_type, user_id"
        ),
        "context_collector": (
            "SELECT event_id, user_id, event_type FROM events WHERE user_id IN "
            "(SELECT DISTINCT user_id FROM events WHERE event_type = 'error')"
        ),
        "anti_join": (
            "SELECT event_id, user_id, event_type FROM events WHERE user_id NOT IN "
            "(SELECT DISTINCT user_id FROM events "
            "WHERE event_type = 'error' AND value > 200.0)"
        ),
        "heartbeat_injector": (
            "SELECT event_type, COUNT(*) AS n FROM ("
            "SELECT event_type FROM events UNION ALL "
            "SELECT 'heartbeat' AS event_type FROM range(24)) GROUP BY event_type"
        ),
        "hash_sample": _hash_sample_sql(0.25, 7),
        "stratified_sample": _stratified_sample_sql({"en": 0.10, "de": 0.80}, 0.35, 11),
        "split_assign": _split_assign_sql({"train": 0.8, "val": 0.1, "test": 0.1}, 13),
        "leakage_safe_split": _leakage_safe_split_sql(
            {"train": 0.8, "val": 0.1, "test": 0.1}, 13
        ),
        "data_quality": _data_quality_sql(),
        "plan_card": (
            # exact mirror of the planner's branch arithmetic per column:
            # bounded-distinct -> tree (1 part); hot share > 1/32 -> salt
            # LEAST(64, GREATEST(4, FLOOR(((top/n)*32)*2 + 0.5)))
            "WITH stats AS ("
            "  SELECT 'source' AS col, SUM(c) AS n, COUNT(*) AS d, "
            "  MAX(c) AS top FROM (SELECT COUNT(*) AS c FROM documents "
            "  GROUP BY source) "
            "  UNION ALL "
            "  SELECT 'lang', SUM(c), COUNT(*), MAX(c) FROM "
            "  (SELECT COUNT(*) AS c FROM documents GROUP BY lang)"
            ") SELECT col, "
            "CASE WHEN d <= 100000 THEN 'tree_groupby' ELSE "
            "'bucket_map_groups' END AS strategy, "
            "CAST(CASE WHEN d <= 100000 THEN 1 ELSE "
            "GREATEST(64, CEIL(CAST(n AS DOUBLE) / 250000)) END AS BIGINT) "
            "AS n_parts, "
            "CAST(CASE WHEN (CAST(top AS DOUBLE) / n) > (1.0 / 32) THEN "
            "LEAST(64, GREATEST(4, FLOOR(((CAST(top AS DOUBLE) / n) * 32) "
            "* 2 + 0.5))) ELSE 1 END AS BIGINT) AS salt_fanout "
            "FROM stats"
        ),
        "dbsink_roundtrip": (
            # the sink's rotated tables union back to the source events;
            # ts mirrors the sink's Arrow ISO-us strings (duckdb %S is
            # integer seconds, so .%f appends the 6-digit fraction that
            # Arrow's %S already includes)
            "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts, "
            "event_type, value FROM events"
        ),
        "docsink_roundtrip": (
            # the sink's per-collection landed counts: corpus event types
            # mapped onto fever's collection names, unknown ones in misc
            "SELECT CASE event_type WHEN 'view' THEN 'http' "
            "WHEN 'click' THEN 'dns' WHEN 'purchase' THEN 'flow' "
            "WHEN 'signup' THEN 'smtp' ELSE 'misc' END AS collection, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1"
        ),
        "suggest_card": (
            # exact mirror of the suggestion engine's emitted card rows:
            # null tolerances, the small accepted domains (lang/source are
            # far below the 32-value threshold; text never qualifies), and
            # integer min..max ranges for doc_id / n_chars
            "SELECT 'suggested.completeness.' || c AS check_name, "
            "CAST(0 AS VARCHAR) AS detail FROM (VALUES ('doc_id'), "
            "('text'), ('lang'), ('source'), ('n_chars')) AS t(c) "
            "UNION ALL SELECT 'suggested.accepted.lang', (SELECT "
            "string_agg(l, ',' ORDER BY l) FROM (SELECT DISTINCT lang AS l "
            "FROM documents)) "
            "UNION ALL SELECT 'suggested.accepted.source', (SELECT "
            "string_agg(s, ',' ORDER BY s) FROM (SELECT DISTINCT source "
            "AS s FROM documents)) "
            "UNION ALL SELECT 'suggested.range.doc_id', MIN(doc_id) || "
            "'..' || MAX(doc_id) FROM documents "
            "UNION ALL SELECT 'suggested.range.n_chars', MIN(n_chars) || "
            "'..' || MAX(n_chars) FROM documents"
        ),
        "gopher_rules": _gopher_rules_sql(20, 80, 4, 10, _GOPHER_STOPS, 3),
        "rule_violation_samples": (
            # nested-CTE reuse of the ONE gopher mirror: explode fired bits
            # via a 0..6 join, rank ids ascending per bit, keep rn <= 5
            f"WITH g AS ({_gopher_rules_sql(20, 80, 4, 10, _GOPHER_STOPS, 3)}), "
            "e AS (SELECT b.bit AS rule_bit, g.doc_id FROM g JOIN (VALUES "
            "(0),(1),(2),(3),(4),(5),(6)) AS b(bit) ON "
            "((g.rule_mask >> b.bit) & 1) = 1), "
            "r AS (SELECT rule_bit, doc_id, ROW_NUMBER() OVER "
            "(PARTITION BY rule_bit ORDER BY doc_id) AS rn FROM e) "
            "SELECT CAST(rule_bit AS BIGINT) AS rule_bit, doc_id, "
            "CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5"
        ),
        "change_point": (
            # same integer deviation D_i = |m·P_i − i·T| over hour-bucketed
            # per-type counts; ROW_NUMBER picks the first max (smallest
            # bucket), mirroring the engine's first-argmax rule
            "WITH c AS (SELECT event_type, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS cnt FROM events "
            "WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2), "
            "s AS (SELECT event_type, b, CAST(SUM(cnt) OVER w AS BIGINT) AS pfx, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS i, "
            "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m, "
            "CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS tot "
            "FROM c WINDOW w AS (PARTITION BY event_type ORDER BY b)), "
            "d AS (SELECT event_type, b, CAST(abs(m * pfx - i * tot) AS BIGINT) AS dev, "
            "ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY abs(m * pfx - i * tot) DESC, b ASC) AS rk FROM s) "
            "SELECT event_type, b AS cp_bucket, dev FROM d WHERE rk = 1"
        ),
        "decontaminate": _decontaminate_sql(4, 97),
        "contamination_report": _contamination_report_sql(4, 97),
        "bigram_logloss": _bigram_logloss_sql(oov=8, backoff=4, modulus=3),
        "interarrival_histogram": (
            # LEAD gap in whole seconds, then value_histogram's exact bin
            # rule (pre-clip, edge bins absorb out-of-range gaps)
            "WITH d AS (SELECT (epoch_us(LEAD(ts) OVER (PARTITION BY "
            "user_id ORDER BY ts, event_id)) - epoch_us(ts)) // 1000000 "
            "AS ds FROM events), "
            "b AS (SELECT (LEAST(GREATEST(ds, 0), 345599) - 0) * 24 "
            "// 345600 AS bin FROM d WHERE ds IS NOT NULL) "
            "SELECT CAST(bin AS BIGINT) AS bin, "
            "CAST(0 + (bin * 345600 + 23) // 24 AS BIGINT) AS bin_lo, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin"
        ),
        "first_records": (
            "SELECT event_id, ts, user_id, event_type FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events) WHERE rn <= 3"
        ),
        "dup_cluster_sizes": (
            "WITH c AS (SELECT text, COUNT(*) AS sz FROM documents "
            "GROUP BY text) SELECT CAST(sz AS BIGINT) AS cluster_size, "
            "CAST(COUNT(*) AS BIGINT) AS n_clusters FROM c GROUP BY sz"
        ),
        "pii_report": (
            # both engines are RE2 (Arrow count_substring_regex / DuckDB
            # regexp_extract_all), both count non-overlapping matches
            "SELECT pattern, CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_docs, CAST(SUM(c) AS BIGINT) AS n_hits FROM ("
            "SELECT 'digit_run' AS pattern, "
            "len(regexp_extract_all(props, '[0-9]+')) AS c FROM events "
            "UNION ALL SELECT 'two_digits', "
            "len(regexp_extract_all(props, '[0-9]{2}')) FROM events "
            "UNION ALL SELECT 'field_k', "
            "len(regexp_extract_all(props, '\"k\": [0-9]+')) FROM events"
            ") GROUP BY pattern"
        ),
        "user_retention": (
            # distinct (user, day) pairs; retained = same user present in
            # the next day window (LEFT JOIN on w+1, count matches)
            "WITH p AS (SELECT DISTINCT user_id, "
            "CAST(floor(epoch(ts) / 86400) AS BIGINT) AS w FROM events) "
            "SELECT p.w, CAST(COUNT(*) AS BIGINT) AS n_active, "
            "CAST(SUM(CASE WHEN q.user_id IS NOT NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_retained FROM p LEFT JOIN p q "
            "ON q.user_id = p.user_id AND q.w = p.w + 1 GROUP BY p.w"
        ),
        "props_field_stats": (
            # integer field pull from the JSON payload; engine extracts via
            # RE2, oracle via json_extract_string — same typed value
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MIN(k) AS BIGINT) AS "
            "min_k, CAST(MAX(k) AS BIGINT) AS max_k FROM "
            "(SELECT event_type, CAST(json_extract_string(props, '$.k') "
            "AS BIGINT) AS k FROM events) GROUP BY event_type"
        ),
        "chunk_documents": _chunk_documents_sql(16, 4),
        "per_group_sample": _per_group_sample_sql(12, ["en", "de", "fr"], 29),
        # type-1 discrete quantile = value at ROW_NUMBER rank ceil(q*n);
        # ROW_NUMBER is unique so exactly one row matches each rank, and the
        # VALUE at that rank is tie-invariant
        "group_percentiles": (
            "WITH r AS (SELECT o_orderpriority, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice) AS rk, "
            "COUNT(*) OVER (PARTITION BY o_orderpriority) AS n "
            "FROM orders WHERE o_totalprice IS NOT NULL) "
            "SELECT o_orderpriority, "
            "MAX(CASE WHEN rk = (n * 1 + 2 - 1) // 2 THEN o_totalprice END) "
            "AS p50_price, "
            "MAX(CASE WHEN rk = (n * 9 + 10 - 1) // 10 THEN o_totalprice END) "
            "AS p90_price "
            "FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "normalize_urls": _normalize_urls_sql(),
        "url_canonical_dedup": _url_canonical_dedup_sql(),
        # same messy synthesis as the engine (decomposed e+U+0301 prefix,
        # tab-padded odd-row suffix); nfc_normalize is utf8proc on both
        # sides, the collapse is RE2 on both sides, and trim(x, ' ') is the
        # space-only trim normalize_text applies
        "normalize_text": (
            "SELECT doc_id, trim(regexp_replace(nfc_normalize("
            "'e' || chr(769) || '  head' || chr(9) || text || "
            "CASE WHEN doc_id % 2 = 1 THEN chr(9) || ' tail  ' ELSE '' END"
            "), '\\s+', ' ', 'g'), ' ') AS text_norm FROM documents"
        ),
        "doc_top_terms": _doc_top_terms_sql(3),
        "bm25_search": _bm25_search_sql(["dup", "line", "vector"], 15),
        "keyword_search": _keyword_search_sql(["table", "window", "vector"], 15),
        "inverted_index": _inverted_index_sql(16),
        "cross_dedup": _cross_dedup_sql(7),
        "corpus_intersect": (
            # the IN flip of _cross_dedup_sql: whole corpus vs its mod-3
            # slice as the reference
            lambda: (
                f"WITH {_content_hash_cte()} "
                "SELECT doc_id, content_hash FROM allh WHERE "
                "content_hash IN "
                "(SELECT content_hash FROM allh WHERE doc_id % 3 = 0)"
            )
        )(),
        "minhash_cross_dedup": _minhash_cross_dedup_sql(),
        "linear_score": _linear_score_sql(),
        "embedding_cluster": _embedding_cluster_sql(8, 1),
        "semdedup": _semdedup_sql(8, 1, 0.4),
        "knn_graph": _knn_graph_sql(4, 8, 1),
        "bloom_cross_dedup": _cross_dedup_sql(5),
        "token_budget_select": _token_budget_select_sql(8000, 23),
        "token_budget_mix": _token_budget_mix_sql(
            {"src0": 3, "src1": 1, "src3": 2}, 6000, 29
        ),
        "mixture_sample": _mixture_sample_sql({"src0": 3, "src1": 1, "src2": 2}, 19),
        "repeat_corpus": _repeat_corpus_sql({"en": 1, "zh": 3, "fr": 2, "es": 0}, 1),
        "line_dedup": _line_dedup_sql(30),
        "script_mix": _script_mix_sql(),
        "host_boilerplate": (
            # same synthesized pages (global footer + even-id host banner
            # + own text); a line is host-boilerplate iff it hits >= 3
            # distinct docs AND strictly more than half the host's docs
            "WITH docs AS (SELECT doc_id, COALESCE(source, '') AS src, "
            "'GLOBAL-FOOTER' || chr(10) || CASE WHEN doc_id % 2 = 0 THEN "
            "'BANNER-' || COALESCE(source, '') || chr(10) ELSE '' END || "
            "COALESCE(text, '') AS text FROM documents), "
            "sp AS (SELECT doc_id, src, string_split(text, chr(10)) AS ls "
            "FROM docs), "
            "ex AS (SELECT doc_id, src, ls[i] AS ln, i AS ord FROM "
            "(SELECT doc_id, src, ls, UNNEST(range(1, len(ls) + 1)) AS i "
            "FROM sp)), "
            "lc AS (SELECT src, ln, COUNT(DISTINCT doc_id) AS nd FROM ex "
            "GROUP BY src, ln), "
            "hc AS (SELECT src, COUNT(*) AS hd FROM docs GROUP BY src), "
            "bp AS (SELECT src, ln FROM lc JOIN hc USING (src) "
            "WHERE nd >= 3 AND 2 * nd > hd), "
            "k AS (SELECT e.doc_id, e.ln, e.ord FROM ex e WHERE NOT EXISTS "
            "(SELECT 1 FROM bp WHERE bp.src = e.src AND bp.ln = e.ln)), "
            "tot AS (SELECT doc_id, COUNT(*) AS n_lines FROM ex "
            "GROUP BY doc_id) "
            "SELECT k.doc_id, string_agg(k.ln, chr(10) ORDER BY k.ord) AS "
            "text, CAST(COUNT(*) AS BIGINT) AS n_kept, "
            "CAST(ANY_VALUE(tot.n_lines) - COUNT(*) AS BIGINT) AS n_dropped "
            "FROM k JOIN tot ON k.doc_id = tot.doc_id GROUP BY k.doc_id"
        ),
        # window join reproduces the engine's gram construction exactly:
        # single-space split (empty tokens kept), n-token slices re-joined
        # with ' ', docs under n tokens emit nothing
        "dup_ngram_windows": (
            "WITH toks AS (SELECT doc_id, string_split(COALESCE(text,''), ' ')"
            " AS t FROM documents), "
            "pos AS (SELECT doc_id, t, unnest(range(1, len(t)-5+2)) AS i "
            "FROM toks), "
            "wins AS (SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g "
            "FROM pos), "
            "cnt AS (SELECT g, COUNT(*) AS c FROM wins GROUP BY g) "
            "SELECT w.doc_id, COUNT(*) AS total_windows, "
            "CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS dup_windows "
            "FROM wins w JOIN cnt c USING (g) GROUP BY w.doc_id"
        ),
        "epoch_shuffle": _epoch_shuffle_sql(21),
        "quantile_bucket": _quantile_bucket_sql(8, 21),
        "importance_resample": _importance_resample_sql(64, 11),
        "corpus_report": (
            # token model = len(string_split(...)) (empty text -> 1 token,
            # the shared trainprep convention); length() = characters,
            # mirroring utf8_length
            "WITH tl AS (SELECT text, lang, source, "
            "CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) "
            "AS nt, CAST(length(COALESCE(text, '')) AS BIGINT) AS nch "
            "FROM documents) "
            # HAVING drops the min/max rows entirely on an empty corpus,
            # matching the engine (which emits no min/max metrics then)
            "SELECT 'max_tokens' AS metric, CAST(MAX(nt) AS BIGINT) AS "
            "value FROM tl HAVING COUNT(*) > 0 "
            "UNION ALL SELECT 'min_tokens', CAST(MIN(nt) AS BIGINT) FROM tl "
            "HAVING COUNT(*) > 0 "
            "UNION ALL SELECT 'n_chars', CAST(SUM(nch) AS BIGINT) FROM tl "
            "UNION ALL SELECT 'n_distinct_langs', CAST(COUNT(DISTINCT "
            "lang) AS BIGINT) FROM tl "
            "UNION ALL SELECT 'n_distinct_sources', CAST(COUNT(DISTINCT "
            "source) AS BIGINT) FROM tl "
            "UNION ALL SELECT 'n_docs', CAST(COUNT(*) AS BIGINT) FROM tl "
            "UNION ALL SELECT 'n_empty_docs', CAST(COUNT(*) FILTER "
            "(WHERE nch = 0) AS BIGINT) FROM tl "
            "UNION ALL SELECT 'n_tokens', CAST(SUM(nt) AS BIGINT) FROM tl"
        ),
        "winsorize": (
            # below-saturation KLL thresholds are the exact order
            # statistics at "first rank >= q*n"; integer clip both sides
            "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
            "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS "
            "n_tokens FROM documents), "
            "r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) "
            "AS rn, count(*) OVER () AS n FROM tl), "
            "lo AS (SELECT n_tokens AS v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.05 * n) AS BIGINT), 1), n)), "
            "hi AS (SELECT n_tokens AS v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.95 * n) AS BIGINT), 1), n)) "
            "SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CAST(LEAST(GREATEST(n_tokens, (SELECT v FROM lo)), "
            "(SELECT v FROM hi)) AS BIGINT) AS value_clipped FROM tl"
        ),
        "mad_outliers": (
            # exact median/MAD at the engine's "first rank >= ceil(n/2)"
            # rule; pure-integer cross-multiply tail predicate
            "WITH r AS (SELECT n_chars, row_number() OVER (ORDER BY "
            "n_chars) AS rn, count(*) OVER () AS n FROM documents), "
            "med AS (SELECT n_chars AS m FROM r WHERE rn = "
            "GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)), "
            "r2 AS (SELECT abs(n_chars - (SELECT m FROM med)) AS dev "
            "FROM documents), "
            "r3 AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn, "
            "count(*) OVER () AS n FROM r2), "
            "mad AS (SELECT dev AS m FROM r3 WHERE rn = "
            "GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)) "
            "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars "
            "FROM documents WHERE 2 * abs(n_chars - (SELECT m FROM med)) "
            "> 3 * (SELECT m FROM mad)"
        ),
        "zscore_outliers": (
            # exact-integer z-score tail: engine's |N·x−S| > isqrt(⌊k²(N·SS
            # −S²)/k_den²⌋) is the same inequality as this HUGEINT
            # cross-multiply (4·d² > 9·(N·SS−S²) for k = 3/2), so no float
            # ever touches the predicate on either side
            "WITH m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, "
            "CAST(SUM(n_chars) AS HUGEINT) AS s, "
            "SUM(CAST(n_chars AS HUGEINT) * n_chars) AS ss FROM documents) "
            "SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars "
            "FROM documents d, m "
            "WHERE 4 * (m.n * d.n_chars - m.s) * (m.n * d.n_chars - m.s) "
            "> 9 * (m.n * m.ss - m.s * m.s)"
        ),
        "vocab_coverage": (
            # keep a token iff the exact mass strictly BEFORE it (count
            # desc, token asc) has p_den·prefix < p_num·total — the same
            # bigint inequality the engine's class-cut math evaluates
            "WITH tok AS (SELECT UNNEST(string_split(COALESCE(text, ''), "
            "' ')) AS token FROM documents), "
            "c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM tok "
            "WHERE token <> '' GROUP BY token), "
            "r AS (SELECT token, n, SUM(n) OVER (ORDER BY n DESC, token "
            "ROWS UNBOUNDED PRECEDING) AS cum, SUM(n) OVER () AS total "
            "FROM c) "
            "SELECT token, n FROM r WHERE 2 * (cum - n) < 1 * total"
        ),
        "distribution_drift": (
            # same int64 bin rule as value_histogram on both parity halves;
            # drift ⇔ t_den·|n_a·N_b − n_b·N_a| > t_num·N_a·N_b (HUGEINT
            # cross-multiply = the engine's Python-bigint inequality)
            "WITH s AS (SELECT doc_id % 2 AS side, "
            "(LEAST(GREATEST(n_chars, 0), 639) - 0) * 16 // 640 AS bin "
            "FROM documents), "
            "c AS (SELECT bin, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) "
            "AS n_a, SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_b "
            "FROM s GROUP BY bin), "
            "t AS (SELECT SUM(n_a) AS na, SUM(n_b) AS nb FROM c) "
            "SELECT CAST(c.bin AS BIGINT) AS bin, "
            "CAST(0 + (c.bin * 640 + 15) // 16 AS BIGINT) AS bin_lo, "
            "CAST(c.n_a AS BIGINT) AS n_a, CAST(c.n_b AS BIGINT) AS n_b, "
            "CAST(CASE WHEN 100 * ABS(CAST(c.n_a AS HUGEINT) * t.nb - "
            "CAST(c.n_b AS HUGEINT) * t.na) > "
            "CAST(t.na AS HUGEINT) * t.nb THEN 1 ELSE 0 END AS BIGINT) "
            "AS drift FROM c, t"
        ),
        "group_moments": (
            # exact integer second moments per source; y = token count under
            # the len(string_split) convention ('' counts one token) so the
            # engine's spaces+1 kernel is the same function
            "WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS x, "
            "CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS y "
            "FROM documents) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y, "
            "CAST(SUM(x * x) AS BIGINT) AS sum_xx, "
            "CAST(SUM(y * y) AS BIGINT) AS sum_yy, "
            "CAST(SUM(x * y) AS BIGINT) AS sum_xy "
            "FROM d GROUP BY source"
        ),
        "weighted_median": (
            # lower weighted median: smallest v with 2·cum(v) >= W, pure
            # integers on both engines
            "WITH d AS (SELECT CAST(n_chars AS BIGINT) AS v, "
            "CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS w "
            "FROM documents), "
            "h AS (SELECT v, SUM(w) AS w FROM d GROUP BY v), "
            "c AS (SELECT v, SUM(w) OVER (ORDER BY v ROWS UNBOUNDED "
            "PRECEDING) AS cum, SUM(w) OVER () AS tw FROM h) "
            "SELECT CAST(MIN(CASE WHEN 2 * cum >= tw THEN v END) AS BIGINT) "
            "AS median_value, CAST(MAX(tw) AS BIGINT) AS total_weight FROM c"
        ),
        "group_regression": (
            # exact HUGEINT normal equations, then the engine's fixed
            # double expression tree (num/den, (sy - slope·sx)/n)
            "WITH d AS (SELECT source, CAST(n_chars AS BIGINT) AS x, "
            "CAST(len(string_split(COALESCE(text, ''), ' ')) AS BIGINT) AS y "
            "FROM documents), "
            "m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, "
            "SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy, "
            "SUM(CAST(x AS HUGEINT) * x) AS sxx, "
            "SUM(CAST(x AS HUGEINT) * y) AS sxy FROM d GROUP BY source), "
            "s AS (SELECT source, n, sx, sy, n * sxx - sx * sx AS den, "
            "CASE WHEN n * sxx - sx * sx = 0 THEN 0.0 ELSE "
            "CAST(n * sxy - sx * sy AS DOUBLE) / "
            "CAST(n * sxx - sx * sx AS DOUBLE) END AS slope FROM m) "
            "SELECT source, n, slope, CASE WHEN den = 0 THEN "
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) ELSE "
            "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / "
            "CAST(n AS DOUBLE) END AS intercept FROM s"
        ),
        "group_entropy": (
            # integer-bits entropy: ilog2(x) = strlen(bin(x))-1, the same
            # staircase as the engine's frexp kernel — no float log anywhere
            "WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM documents GROUP BY source, lang), "
            "g AS (SELECT source, SUM(c) AS n, "
            "SUM(c * (strlen(bin(c)) - 1)) AS sc FROM c GROUP BY source) "
            "SELECT source, CAST(n AS BIGINT) AS n, "
            "CAST(n * (strlen(bin(n)) - 1) - sc AS BIGINT) AS h_bits_scaled "
            "FROM g"
        ),
        "value_histogram": (
            # same pure-int64 bin arithmetic: clip((v-lo)*nb // span) with
            # edge bins absorbing out-of-range values; bin_lo = exact
            # inclusive lower edge lo + ceil(bin*span/nb)
            # pre-clip before the multiply, mirroring the engine's int64
            # overflow posture
            "WITH b AS (SELECT (LEAST(GREATEST(n_chars, 0), 639) - 0) "
            "* 16 // 640 AS bin FROM documents) "
            "SELECT bin, CAST(0 + (bin * 640 + 15) // 16 AS BIGINT) AS "
            "bin_lo, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY bin"
        ),
        "quantile_bucket_approx": (
            # below-saturation KLL splits ARE exact order statistics at the
            # "first rank >= (i/k)*n" rule; bucket = 1 + #(splits < value),
            # duplicate split ranks (n < k corners) count individually on
            # both sides
            "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
            "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS "
            "n_tokens FROM documents), "
            "r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) "
            "AS rn, count(*) OVER () AS n FROM tl), "
            "sp AS (SELECT r.n_tokens AS v FROM r JOIN (SELECT "
            "UNNEST(range(1, 8)) AS i) u ON r.rn = LEAST(GREATEST(CAST("
            "CEIL((u.i * 1.0 / 8) * r.n) AS BIGINT), 1), r.n)) "
            "SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens, "
            "CAST(1 + (SELECT COUNT(*) FROM sp WHERE sp.v < t.n_tokens) "
            "AS BIGINT) AS bucket FROM tl t"
        ),
        "unigram_logloss": (
            # integer-bits unigram surprise: ilog2(x) = strlen(bin(x))-1
            # mirrors the engine's frexp exponent exactly; OOV tokens cost
            # ilog2(N)+8, and '' from empty/multi-space text is a token on
            # both sides (string_split == pc.split_pattern)
            "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS w FROM documents), "
            "ref AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks "
            "WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = "
            "'en') GROUP BY w), "
            "nt AS (SELECT strlen(bin(CAST(SUM(c) AS BIGINT))) - 1 AS iln "
            "FROM ref) "
            "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "CAST(SUM(CASE WHEN r.c IS NULL THEN nt.iln + 8 ELSE nt.iln - "
            "(strlen(bin(r.c)) - 1) END) AS BIGINT) AS bits "
            "FROM toks t LEFT JOIN ref r USING (w) CROSS JOIN nt "
            "GROUP BY t.doc_id"
        ),
        "pivot_counts": (
            # dynamic PIVOT: the column set derives from the data on both
            # sides, so a slice missing an event type still gate-matches
            "PIVOT (SELECT user_id, event_type FROM events WHERE user_id "
            "IS NOT NULL AND event_type IS NOT NULL) ON event_type "
            "USING COUNT(*) GROUP BY user_id"
        ),
        "transition_counts": (
            "WITH o AS (SELECT user_id, event_type, LEAD(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM "
            "events WHERE user_id IS NOT NULL AND ts IS NOT NULL AND "
            "event_type IS NOT NULL) "
            "SELECT event_type AS from_type, nxt AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM o WHERE nxt IS NOT NULL "
            "GROUP BY event_type, nxt"
        ),
        "decayed_counts": (
            # exact power-of-2 exponential decay: weight halves every 3
            # days, shift floors out past 63 half-lives, future events
            # clamp to full weight — mirrors ops.windows.decayed_counts
            "WITH w AS (SELECT user_id, ((CAST(1 AS BIGINT) << 40) >> "
            "LEAST(GREATEST(epoch_us(TIMESTAMP '2024-01-31 00:00:00') - "
            "epoch_us(ts), 0) // 259200000000, 63)) AS wt FROM events "
            "WHERE ts IS NOT NULL AND user_id IS NOT NULL) "
            "SELECT user_id, CAST(SUM(wt) AS BIGINT) AS score FROM w "
            "GROUP BY user_id"
        ),
        "pack_sequences": _pack_sequences_sql(256, 17, 32),
        "domain_cap": (
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, row_number() OVER "
            "(PARTITION BY source ORDER BY doc_id) AS rn FROM documents) "
            "WHERE rn <= 7"
        ),
        "token_repetition": (
            _TOKEN_REPETITION_CTE
            + "SELECT doc_id, n_tokens, n_distinct_tokens, dup_token_ratio, "
            "top_token_frac FROM rep"
        ),
        "curation_filter": (
            _TOKEN_REPETITION_CTE
            + "SELECT doc_id, "
            "(n_tokens >= 40 AND n_tokens <= 120) AS len_ok, "
            "(dup_token_ratio <= 0.5 AND top_token_frac <= 0.16) AS rep_ok, "
            "(n_tokens >= 40 AND n_tokens <= 120 AND dup_token_ratio <= 0.5 "
            "AND top_token_frac <= 0.16) AS keep FROM rep"
        ),
        "regex_scrub": (
            "WITH s1 AS (SELECT doc_id, regexp_replace(text, '[aeiou]+', '*', 'g') "
            "AS t1, CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS c1 "
            "FROM documents), "
            "s2 AS (SELECT doc_id, regexp_replace(t1, '[xyz]', '#', 'g') AS scrubbed, "
            "c1 + CAST(len(regexp_extract_all(t1, '[xyz]')) AS BIGINT) AS n_redactions "
            "FROM s1) SELECT doc_id, scrubbed, n_redactions FROM s2"
        ),
        "top_ngrams": (
            "WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents "
            "WHERE text <> ''), "
            "bi AS (SELECT unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i+1])) AS ngram FROM toks), "
            "cnt AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM bi "
            "GROUP BY ngram) "
            "SELECT ngram, n FROM cnt ORDER BY n DESC, ngram ASC LIMIT 20"
        ),
        "heavy_ngrams": (
            "WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents "
            "WHERE text <> ''), "
            "bi AS (SELECT unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i+1])) AS ngram FROM toks), "
            "cnt AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM bi "
            "GROUP BY ngram) "
            "SELECT ngram, n FROM cnt WHERE n >= 35 "
            "ORDER BY n DESC, ngram ASC LIMIT 20"
        ),
        "quantile_length_filter": (
            # mirror of the engine's below-saturation KLL quantile rule:
            # threshold = value at the first rank ≥ q·n (searchsorted-left
            # on the weight cumsum, all weights 1 below saturation)
            "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
            "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens "
            "FROM documents), "
            "r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) AS rn, "
            "count(*) OVER () AS n FROM tl), "
            "lo AS (SELECT n_tokens AS v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.1 * n) AS BIGINT), 1), n)), "
            "hi AS (SELECT n_tokens AS v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.9 * n) AS BIGINT), 1), n)) "
            "SELECT doc_id, n_tokens FROM tl WHERE "
            "n_tokens >= (SELECT v FROM lo) AND n_tokens <= (SELECT v FROM hi)"
        ),
        "flow_profiler": (
            "SELECT lang, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents GROUP BY lang"
        ),
        "pricing_summary": (
            # money sums in integer cents (prices 2-dp, disc_price 4-dp) so the
            # distributed partial-sum order can't move the last ulp; one final
            # division by a power of ten is bit-deterministic on both engines
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) "
            "  * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS sum_disc_price, "
            "COUNT(*) AS count_order FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-01' "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "segment_revenue": (
            "SELECT c_mktsegment, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue, "
            "COUNT(*) AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "filter_project": (
            "SELECT l_orderkey, l_linenumber, l_quantity, "
            "l_extendedprice * (1.0 - l_discount) AS revenue "
            "FROM lineitem WHERE l_quantity >= 49.0"
        ),
        "latest_record": (
            # one survivor per user: ts DESC with event_id DESC tie-break —
            # deterministic under any partitioning on both engines
            "SELECT event_id, ts, user_id, event_type, value FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
            "WHERE rn = 1"
        ),
        "full_outer_join": (
            # Arrow's full-outer coalesces the join key into the left name;
            # COALESCE mirrors that so unmatched-right rows carry their key
            "SELECT o_orderkey, COALESCE(o.o_custkey, c.c_custkey) AS "
            "o_custkey, c_mktsegment FROM "
            "(SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_totalprice > 350000) o FULL JOIN "
            "(SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_acctbal > 1000) c ON o.o_custkey = c.c_custkey"
        ),
        "bucketed_join": (
            "SELECT o_orderkey, o_custkey, c_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "left_outer_join": (
            "SELECT o_orderkey, o_custkey, c_mktsegment FROM orders "
            "LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_acctbal > 5000) c ON o_custkey = c_custkey"
        ),
        "revenue_by_nation": (
            # revenue in 10^-4 units (cents × integer discount percent) on
            # BOTH sides so distributed partial-sum order cannot move an ulp
            "SELECT n_name, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 "
            "AS revenue, CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "token_stats": (
            "SELECT doc_id, CASE WHEN strlen(text) = 0 THEN 0 "
            "ELSE strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens, "
            "strlen(text) AS n_text_chars FROM documents"
        ),
        "quality_score": (
            "WITH t AS (SELECT doc_id, text, "
            "  CASE WHEN strlen(text) = 0 THEN 0 "
            "  ELSE strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens, "
            "  CAST(strlen(text) AS DOUBLE) AS n_chars, "
            "  CAST(len(list_filter(string_split(text, ' '), x -> x = 'the')) AS DOUBLE) AS n_the "
            "FROM documents) "
            "SELECT doc_id, n_tokens, "
            "n_the / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) AS stop_ratio, "
            "(n_chars - (CAST(n_tokens AS DOUBLE) - 1.0)) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) AS mean_token_len, "
            "(n_tokens >= 5 AND "
            " (n_chars - (CAST(n_tokens AS DOUBLE) - 1.0)) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) >= 2.0 AND "
            " (n_chars - (CAST(n_tokens AS DOUBLE) - 1.0)) / GREATEST(CAST(n_tokens AS DOUBLE), 1.0) <= 12.0) AS quality_ok "
            "FROM t"
        ),
        "exact_dedup": (
            "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "connected_components": (
            "WITH RECURSIVE e0 AS (SELECT DISTINCT user_id - 1 AS a, user_id AS b "
            "  FROM events WHERE user_id % 10 <> 0), "
            "sym AS (SELECT a, b FROM e0 UNION SELECT e0.b AS a, e0.a AS b FROM e0), "
            "reach AS (SELECT a, b FROM sym "
            "  UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a) "
            "SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a"
        ),
        "embedding_dups": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "embedding_quantize": (
            # same IEEE-double expression tree as the engine
            # (v*127.0)/maxabs + 0.5 then floor — bit-exact, no tolerance
            "WITH m AS (SELECT vec_id, list_max(list_transform(embedding, "
            "v -> abs(CAST(v AS DOUBLE)))) AS s FROM embeddings) "
            "SELECT e.vec_id, "
            "CAST(UNNEST(range(1, len(e.embedding) + 1)) AS BIGINT) AS dim, "
            "UNNEST(list_transform(e.embedding, v -> CASE WHEN m.s = 0 "
            "THEN CAST(0 AS BIGINT) ELSE CAST(FLOOR(CAST(v AS DOUBLE) "
            "* 127.0 / m.s + 0.5) AS BIGINT) END)) AS q "
            "FROM embeddings e JOIN m ON m.vec_id = e.vec_id"
        ),
        "embedding_project": (
            # sign(d, j) = top bit of splitmix64((d-1)·K + (j-1)) — the
            # shared _splitmix_ctes chain over a generated (dim, j) table;
            # per-term |sg·q| <= 127, so the double SUM is exact
            "WITH m AS (SELECT vec_id, list_max(list_transform(embedding, "
            "v -> abs(CAST(v AS DOUBLE)))) AS s FROM embeddings), "
            "ql AS MATERIALIZED (SELECT e.vec_id, CASE WHEN m.s = 0 THEN "
            "list_transform(e.embedding, v -> 0.0) ELSE "
            "list_transform(e.embedding, v -> FLOOR(CAST(v AS DOUBLE) "
            "* 127.0 / m.s + 0.5)) END AS qv "
            "FROM embeddings e JOIN m ON m.vec_id = e.vec_id), "
            "dims AS (SELECT UNNEST(range(1, (SELECT len(embedding) FROM "
            "embeddings LIMIT 1) + 1)) AS di), "
            "js AS (SELECT UNNEST(range(1, 9)) AS ji), "
            "pairs AS (SELECT d.di AS di, j.ji AS ji, "
            "(d.di - 1) * 8 + (j.ji - 1) AS u FROM dims d CROSS JOIN js j), "
            + _splitmix_ctes(0, "di, ji", table="pairs", id_expr="u",
                             prefix="sp")
            + ", signs AS (SELECT di, ji, CASE WHEN h >= "
            "CAST('9223372036854775808' AS UBIGINT) THEN 1 ELSE -1 END "
            "AS sg FROM sp5), "
            "qe AS (SELECT vec_id, UNNEST(range(1, len(qv) + 1)) AS di, "
            "UNNEST(qv) AS q FROM ql) "
            "SELECT qe.vec_id, CAST(s.ji AS BIGINT) AS j, "
            "CAST(SUM(s.sg * qe.q) AS BIGINT) AS r "
            "FROM qe JOIN signs s ON s.di = qe.di GROUP BY qe.vec_id, s.ji"
        ),
        "knn_quantized": (
            # integer code dot products: |dot| <= d·127² << 2^53, so the
            # double-valued list_dot_product is exact and the rank total
            # (score desc, id asc) is tie-safe on both engines
            "WITH m AS (SELECT vec_id, list_max(list_transform(embedding, "
            "v -> abs(CAST(v AS DOUBLE)))) AS s FROM embeddings), "
            "ql AS MATERIALIZED (SELECT e.vec_id, CASE WHEN m.s = 0 THEN "
            "list_transform(e.embedding, v -> 0.0) ELSE "
            "list_transform(e.embedding, v -> FLOOR(CAST(v AS DOUBLE) "
            "* 127.0 / m.s + 0.5)) END AS qv "
            "FROM embeddings e JOIN m ON m.vec_id = e.vec_id), "
            "q AS (SELECT vec_id AS query_id, qv AS qq FROM ql "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id, CAST(score AS BIGINT) AS score FROM ("
            "SELECT q.query_id, e.vec_id, "
            "list_dot_product(q.qq, e.qv) AS score, "
            "ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "ORDER BY list_dot_product(q.qq, e.qv) DESC, e.vec_id) AS rn "
            "FROM q CROSS JOIN ql e) WHERE rn <= 5"
        ),
        "mutual_nn": (
            # directed top-1 by (cosine desc, id asc), kept iff reciprocal;
            # ids-only output keeps the float ranking out of the hash
            "WITH n AS (SELECT a.vec_id AS src, b.vec_id AS nbr, "
            "ROW_NUMBER() OVER (PARTITION BY a.vec_id "
            "ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, "
            "b.vec_id) AS rn "
            "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
            "t AS (SELECT src, nbr FROM n WHERE rn = 1) "
            "SELECT a.src AS id_a, a.nbr AS id_b FROM t a "
            "JOIN t b ON a.nbr = b.src AND b.nbr = a.src WHERE a.src < a.nbr"
        ),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id FROM ("
            "  SELECT q.query_id, e.vec_id, "
            "  list_cosine_similarity(q.qe, e.embedding) AS cos, "
            "  ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "    ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rn "
            "  FROM q CROSS JOIN embeddings e) WHERE rn <= 5"
        ),
        # ANN recall gates: the engine emits the exact top-k only when its
        # LSH/IVF answer reaches the recall threshold, so pass/fail lands in
        # rows_match (see _ann_recall_gate) while values hash against the
        # same exact top-k the brute-force oracle computes.
        "knn_lsh_recall_gate": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id FROM ("
            "  SELECT q.query_id, e.vec_id, "
            "  ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "    ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rn "
            "  FROM q CROSS JOIN embeddings e) WHERE rn <= 5"
        ),
        "knn_ivf_recall_gate": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id FROM ("
            "  SELECT q.query_id, e.vec_id, "
            "  ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "    ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rn "
            "  FROM q CROSS JOIN embeddings e) WHERE rn <= 5"
        ),
        "knn_pq_recall_gate": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id FROM ("
            "  SELECT q.query_id, e.vec_id, "
            "  ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "    ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rn "
            "  FROM q CROSS JOIN embeddings e) WHERE rn <= 5"
        ),
        "knn_ivfpq_recall_gate": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 3) "
            "SELECT query_id, vec_id FROM ("
            "  SELECT q.query_id, e.vec_id, "
            "  ROW_NUMBER() OVER (PARTITION BY q.query_id "
            "    ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id) AS rn "
            "  FROM q CROSS JOIN embeddings e) WHERE rn <= 5"
        ),
        # bit-exact SQL mirror of hash64 = splitmix64(FNV-1a 64): FNV runs as
        # a list_reduce over codepoints (== utf-8 bytes on this ASCII corpus);
        # the two splitmix multiplications are split into 32-bit halves so the
        # HUGEINT intermediate never overflows 128 bits
        "content_fingerprint": (
            "WITH f AS (SELECT doc_id, list_reduce("
            "  list_prepend(CAST(14695981039346656037 AS UBIGINT),"
            "    list_transform(range(1, strlen(text) + 1),"
            "                   i -> CAST(unicode(text[i]) AS UBIGINT))),"
            "  (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) "
            "    % 18446744073709551616 AS UBIGINT)) AS h0 FROM documents), "
            "a1 AS (SELECT doc_id, xor(h0, h0 >> 30) AS y FROM f), "
            "b1 AS (SELECT doc_id, CAST(((CAST(y % 4294967296 AS HUGEINT) * 13787848793156543929) + "
            "  ((CAST(y >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296) "
            "  % 18446744073709551616 AS UBIGINT) AS x FROM a1), "
            "a2 AS (SELECT doc_id, xor(x, x >> 27) AS y FROM b1), "
            "b2 AS (SELECT doc_id, CAST(((CAST(y % 4294967296 AS HUGEINT) * 10723151780598845931) + "
            "  ((CAST(y >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296) "
            "  % 18446744073709551616 AS UBIGINT) AS x FROM a2), "
            "a3 AS (SELECT doc_id, xor(x, x >> 31) AS x FROM b2) "
            "SELECT doc_id, CAST(CAST(x AS HUGEINT) - CASE WHEN x >= CAST(9223372036854775808 AS UBIGINT) "
            "  THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS BIGINT) AS content_hash "
            "FROM a3"
        ),
        # exact mirror of LangId: per-language count of DISTINCT marker
        # tokens; winner = max count with ties to the earlier language in
        # registration order (en, de, fr, es, it, nl, pt); 0 markers → 'und'
        "lang_id": (
            "WITH t AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks "
            "FROM documents), c AS (SELECT doc_id, "
            "len(list_intersect(toks, ['the','and','of','to','is','that','with'])) AS n_en, "
            "len(list_intersect(toks, ['der','die','das','und','ist','nicht','mit'])) AS n_de, "
            "len(list_intersect(toks, ['le','la','les','et','est','pas','avec'])) AS n_fr, "
            "len(list_intersect(toks, ['el','la','los','y','es','no','con'])) AS n_es, "
            "len(list_intersect(toks, ['il','la','gli','e','è','non','con'])) AS n_it, "
            "len(list_intersect(toks, ['de','het','een','en','is','niet','met'])) AS n_nl, "
            "len(list_intersect(toks, ['o','a','os','e','é','não','com'])) AS n_pt FROM t) "
            "SELECT doc_id, CASE "
            "WHEN n_en > 0 AND n_en >= n_de AND n_en >= n_fr AND n_en >= n_es AND n_en >= n_it AND n_en >= n_nl AND n_en >= n_pt THEN 'en' "
            "WHEN n_de > 0 AND n_de > n_en AND n_de >= n_fr AND n_de >= n_es AND n_de >= n_it AND n_de >= n_nl AND n_de >= n_pt THEN 'de' "
            "WHEN n_fr > 0 AND n_fr > n_en AND n_fr > n_de AND n_fr >= n_es AND n_fr >= n_it AND n_fr >= n_nl AND n_fr >= n_pt THEN 'fr' "
            "WHEN n_es > 0 AND n_es > n_en AND n_es > n_de AND n_es > n_fr AND n_es >= n_it AND n_es >= n_nl AND n_es >= n_pt THEN 'es' "
            "WHEN n_it > 0 AND n_it > n_en AND n_it > n_de AND n_it > n_fr AND n_it > n_es AND n_it >= n_nl AND n_it >= n_pt THEN 'it' "
            "WHEN n_nl > 0 AND n_nl > n_en AND n_nl > n_de AND n_nl > n_fr AND n_nl > n_es AND n_nl > n_it AND n_nl >= n_pt THEN 'nl' "
            "WHEN n_pt > 0 AND n_pt > n_en AND n_pt > n_de AND n_pt > n_fr AND n_pt > n_es AND n_pt > n_it AND n_pt > n_nl THEN 'pt' "
            "ELSE 'und' END AS lang_pred FROM c"
        ),
        "page_ioc_match": (
            f"SELECT {url_expr} AS url, source || '.example.com' AS ioc, "
            "'http-host' AS match_type FROM documents "
            "WHERE source IN ('src1', 'src3')"
        ),
        "bloom_filter_pages": (
            "SELECT doc_id, source || '.example.com' AS hostname, lang "
            "FROM documents WHERE source IN ('src0', 'src4')"
        ),
        "alertify": (
            "SELECT doc_id, 'source' AS matched_field, source AS ioc FROM documents "
            "WHERE source = 'src2' "
            "UNION ALL "
            "SELECT doc_id, 'text' AS matched_field, 'vector window' AS ioc "
            "FROM documents WHERE contains(text, 'vector window')"
        ),
        "cidr_match": (
            "SELECT event_id, '10.' || (user_id % 4) || '.0.1' AS ip, "
            "'10.1.0.0/16' AS matched_cidr FROM events WHERE user_id % 4 = 1 "
            "UNION ALL "
            "SELECT event_id, '10.' || (user_id % 4) || '.0.1' AS ip, "
            "'10.0.0.0/8' AS matched_cidr FROM events"
        ),
        "fingerprint": _simhash_sql(),
        "minhash_dedup": _minhash_dedup_sql(),
        "minhash_sigs_dedup": _minhash_dedup_sql(),
        "containment_pairs": _containment_pairs_sql(4, 5, 16),
        "containment_capped": _containment_pairs_sql(
            4, 5, 16,
            max_candidates_sql="SELECT 20 * COUNT(*) FROM documents",
        ),
        "sorted_neighbor_pairs": _sorted_neighbor_sql(4, 16, 1, 2,
                                                      same_prefix=8),
        "allpairs_similarity": _allpairs_similarity_sql(1, 2),
        "group_share": (
            # one double division of the same two exact cent integers on
            # both engines — bit-stable; zero-total groups share 0.0
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events) "
            "SELECT event_id, event_type, "
            "CASE WHEN SUM(c) OVER w = 0 THEN 0.0 ELSE "
            "CAST(c AS DOUBLE) / CAST(SUM(c) OVER w AS DOUBLE) END AS share "
            "FROM e WINDOW w AS (PARTITION BY event_type)"
        ),
        # ROW_NUMBER tie order is moment-invariant: positions 1..V are
        # fixed whatever order equal counts take; ilog2 = strlen(bin)-1
        "zipf_audit": (
            "WITH tok AS (SELECT UNNEST(string_split(COALESCE(text, ''), "
            "' ')) AS t FROM documents), "
            "cnt AS (SELECT t, COUNT(*) AS n FROM tok WHERE t <> '' "
            "GROUP BY t), "
            "r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC) AS rk "
            "FROM cnt), "
            "m AS (SELECT strlen(bin(rk)) - 1 AS x, strlen(bin(n)) - 1 AS y "
            "FROM r) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens, "
            "(SELECT CAST(SUM(n) AS BIGINT) FROM cnt) AS total_occurrences, "
            "CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM(x*x) AS BIGINT) AS sxx, "
            "CAST(SUM(y*y) AS BIGINT) AS syy, "
            "CAST(SUM(x*y) AS BIGINT) AS sxy FROM m"
        ),
        "vocab_growth": (
            # integer-spaced thresholds lo + k·span // (n−1) — the engine
            # computes the identical integers, no float linspace anywhere
            "WITH r AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi "
            "FROM documents), "
            "ck AS (SELECT DISTINCT r.lo + (k.x * (r.hi - r.lo)) // 9 AS c "
            "FROM r, (SELECT UNNEST(range(0, 10)) AS x) k), "
            "tok AS (SELECT doc_id, "
            "UNNEST(string_split(COALESCE(text, ''), ' ')) AS t "
            "FROM documents), "
            "fo AS MATERIALIZED (SELECT t, MIN(doc_id) AS mid FROM tok "
            "WHERE t <> '' GROUP BY t) "
            "SELECT ck.c AS upto_id, "
            "CAST((SELECT COUNT(*) FROM documents d WHERE d.doc_id <= ck.c) "
            "AS BIGINT) AS n_docs, "
            "CAST((SELECT COUNT(*) FROM fo WHERE fo.mid <= ck.c) AS BIGINT) "
            "AS n_distinct FROM ck"
        ),
        "vocab_drift": (
            # relative-rate inequality in HUGEINT (products of two
            # corpus-sized counts overflow BIGINT); top-v rule
            # (total desc, token asc) is a total order on both engines
            "WITH tok AS MATERIALIZED (SELECT doc_id % 2 AS side, "
            "UNNEST(string_split(COALESCE(text, ''), ' ')) AS token "
            "FROM documents), "
            "c AS MATERIALIZED (SELECT token, "
            "CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, "
            "CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b "
            "FROM tok WHERE token <> '' GROUP BY token), "
            "tot AS (SELECT SUM(CAST(n_a AS HUGEINT)) AS na, "
            "SUM(CAST(n_b AS HUGEINT)) AS nb FROM c), "
            "top AS (SELECT token, n_a, n_b FROM c "
            "ORDER BY (n_a + n_b) DESC, token ASC LIMIT 20) "
            "SELECT t.token, t.n_a, t.n_b, CAST(CASE WHEN "
            "1000 * abs(CAST(t.n_a AS HUGEINT) * tot.nb - "
            "CAST(t.n_b AS HUGEINT) * tot.na) > 1 * tot.na * tot.nb "
            "THEN 1 ELSE 0 END AS BIGINT) AS drifted FROM top t, tot"
        ),
        "corpus_checksum": (
            # Σ uint64(content_hash) mod 2^64, reinterpreted int64 — the
            # same mirrored hash chain, summed in HUGEINT
            "WITH " + _content_hash_cte() + ", u AS (SELECT "
            "CAST(content_hash AS HUGEINT) + CASE WHEN content_hash < 0 "
            "THEN CAST('18446744073709551616' AS HUGEINT) ELSE "
            "CAST(0 AS HUGEINT) END AS uh FROM allh) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, CAST("
            "CASE WHEN (COALESCE(SUM(uh), 0) % "
            "CAST('18446744073709551616' AS HUGEINT)) >= "
            "CAST('9223372036854775808' AS HUGEINT) THEN "
            "(COALESCE(SUM(uh), 0) % CAST('18446744073709551616' AS HUGEINT)) "
            "- CAST('18446744073709551616' AS HUGEINT) ELSE "
            "(COALESCE(SUM(uh), 0) % CAST('18446744073709551616' AS HUGEINT)) "
            "END AS BIGINT) AS checksum FROM u"
        ),
        "source_dup_report": (
            # within-source duplication factor keyed on the engine's
            # content hash (same mirrored chain — identical semantics
            # including any 64-bit collision)
            "WITH " + _content_hash_cte() + ", m AS ("
            "SELECT d.source, a.content_hash AS h FROM documents d "
            "JOIN allh a ON a.doc_id = d.doc_id) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct, "
            "CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_docs "
            "FROM m GROUP BY source"
        ),
        # group-vs-rest KS on the dense (group x distinct-value) grid;
        # HUGEINT products, first-max tie broken by MIN(c)
        "group_ks_drift": (
            "WITH e AS (SELECT source AS g, n_chars AS c FROM documents), "
            "v AS (SELECT DISTINCT c FROM e), "
            "gg AS (SELECT DISTINCT g FROM e), "
            "grid AS (SELECT gg.g, v.c FROM gg CROSS JOIN v), "
            "cnt AS (SELECT g, c, COUNT(*) AS n FROM e GROUP BY g, c), "
            "j AS (SELECT grid.g, grid.c, COALESCE(cnt.n, 0) AS n "
            "FROM grid LEFT JOIN cnt ON grid.g = cnt.g AND grid.c = cnt.c), "
            "cum AS (SELECT g, c, SUM(n) OVER (PARTITION BY g ORDER BY c) "
            "AS cg FROM j), "
            "gl AS (SELECT c, SUM(n) AS nn FROM j GROUP BY c), "
            "gcum AS (SELECT c, SUM(nn) OVER (ORDER BY c) AS cc FROM gl), "
            "tot AS (SELECT g, SUM(n) AS ng FROM j GROUP BY g), "
            "tt AS (SELECT SUM(n) AS nt FROM j), "
            "d AS (SELECT cum.g, cum.c, "
            "ABS(CAST(cum.cg AS HUGEINT) * (tt.nt - tot.ng) "
            "- (gcum.cc - cum.cg) * CAST(tot.ng AS HUGEINT)) AS dv "
            "FROM cum JOIN gcum ON cum.c = gcum.c "
            "JOIN tot ON cum.g = tot.g CROSS JOIN tt), "
            "m AS (SELECT g, MAX(dv) AS dmax FROM d GROUP BY g) "
            "SELECT m.g AS source, CAST(tot.ng AS BIGINT) AS n_g, "
            "CAST(CASE WHEN tt.nt = tot.ng THEN -1 ELSE m.dmax END "
            "AS BIGINT) AS d_num, "
            "CAST(CASE WHEN tt.nt = tot.ng THEN (SELECT MIN(c) FROM v) "
            "ELSE (SELECT MIN(c) FROM d WHERE d.g = m.g AND d.dv = m.dmax) "
            "END AS BIGINT) AS at_value "
            "FROM m JOIN tot ON m.g = tot.g CROSS JOIN tt"
        ),
        # copies of equal content have equal byte length, so the keeper
        # length is MIN(strlen) per hash on both sides
        "dedup_savings": (
            "WITH "
            + _content_hash_cte()
            + ", m AS (SELECT a.content_hash AS h, "
            "strlen(COALESCE(d.text, '')) AS ln FROM documents d "
            "JOIN allh a ON a.doc_id = d.doc_id), "
            "g AS (SELECT h, CAST(SUM(ln) AS BIGINT) AS s, "
            "CAST(MIN(ln) AS BIGINT) AS o, COUNT(*) AS n FROM m GROUP BY h) "
            "SELECT CAST(SUM(n) AS BIGINT) AS n_docs, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
            "CAST(SUM(s) AS BIGINT) AS bytes_total, "
            "CAST(SUM(o) AS BIGINT) AS bytes_after, "
            "CAST(SUM(s) - SUM(o) AS BIGINT) AS bytes_saved FROM g"
        ),
        "activity_profile": (
            "SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
            "(epoch_us(ts) % 86400000000) // 3600000000 AS hour, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2"
        ),
        "day_overlap": (
            "WITH "
            + _content_hash_cte(
                base="(SELECT event_id AS doc_id, props AS text "
                "FROM events) ob",
                out="oh",
                p="o",
            )
            + ", m AS (SELECT r.content_hash AS h, "
            "epoch_us(e.ts) // 86400000000 AS day "
            "FROM events e JOIN oh r ON r.doc_id = e.event_id), "
            "d AS (SELECT DISTINCT h, day FROM m), "
            "s AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS distinct_today "
            "FROM d GROUP BY day), "
            "ov AS (SELECT a.day, CAST(COUNT(*) AS BIGINT) AS sh FROM d a "
            "JOIN d b ON a.h = b.h AND b.day = a.day + 1 GROUP BY a.day) "
            "SELECT s.day AS day_idx, s.distinct_today, "
            "CAST(COALESCE(ov.sh, 0) AS BIGINT) AS shared_with_next "
            "FROM s LEFT JOIN ov ON s.day = ov.day"
        ),
        "content_churn": (
            "WITH "
            + _content_hash_cte(
                base="(SELECT event_id AS doc_id, props AS text "
                "FROM events) cb",
                out="ph",
                p="c",
            )
            + ", m AS (SELECT r.content_hash AS h, "
            "epoch_us(e.ts) // 86400000000 AS day "
            "FROM events e JOIN ph r ON r.doc_id = e.event_id), "
            "d AS (SELECT DISTINCT h, day FROM m), "
            "f AS (SELECT h, MIN(day) AS fday FROM d GROUP BY h) "
            "SELECT d.day AS day_idx, "
            "CAST(COUNT(*) AS BIGINT) AS distinct_payloads, "
            "CAST(COUNT(*) FILTER (WHERE d.day = f.fday) AS BIGINT) "
            "AS new_payloads "
            "FROM d JOIN f ON d.h = f.h GROUP BY d.day"
        ),
        "session_length_histogram": (
            # the sessionize oracle chain, reduced to its length histogram
            "WITH o AS (SELECT user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events "
            "FROM s GROUP BY user_id, sid) "
            "SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions "
            "FROM g GROUP BY n_events"
        ),
        # two mirrored hash chains (raw / digit-masked) so the distinct
        # counts share the engine's semantics including any collision;
        # RE2 on both sides makes the masking bit-faithful
        "template_census": (
            "WITH "
            + _content_hash_cte(
                base="(SELECT event_id AS doc_id, props AS text "
                "FROM events) eb",
                out="rawh",
                p="r",
            )
            + ", "
            + _content_hash_cte(
                base="(SELECT event_id AS doc_id, "
                "regexp_replace(props, '[0-9]+', '#', 'g') AS text "
                "FROM events) mb",
                out="maskh",
                p="m",
            )
            + " SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) "
            "AS n_rows, "
            "(SELECT CAST(COUNT(DISTINCT content_hash) AS BIGINT) "
            "FROM rawh) AS distinct_raw, "
            "(SELECT CAST(COUNT(DISTINCT content_hash) AS BIGINT) "
            "FROM maskh) AS distinct_masked, "
            "CAST((SELECT COUNT(DISTINCT content_hash) FROM rawh) - "
            "(SELECT COUNT(DISTINCT content_hash) FROM maskh) AS BIGINT) "
            "AS template_collapse"
        ),
        "source_overlap": (
            # unordered pair matrix over distinct (content hash, source);
            # the diagonal is each source's distinct-content count
            "WITH " + _content_hash_cte() + ", m AS ("
            "SELECT DISTINCT a.content_hash AS h, d.source FROM documents d "
            "JOIN allh a ON a.doc_id = d.doc_id) "
            "SELECT x.source AS src_a, y.source AS src_b, "
            "CAST(COUNT(*) AS BIGINT) AS shared FROM m x "
            "JOIN m y ON x.h = y.h AND x.source <= y.source GROUP BY 1, 2"
        ),
        "keeper_election": (
            # the full minhash-dedup recursive chain nested as a CTE, then
            # the (prio asc, id asc) ROW_NUMBER election
            "WITH clusters AS (" + _minhash_dedup_sql() + "), "
            "m AS (SELECT c.cluster_id, c.doc_id, "
            "CAST(substr(d.source, 4) AS BIGINT) % 5 AS prio "
            "FROM clusters c JOIN documents d ON d.doc_id = c.doc_id), "
            "r AS (SELECT cluster_id, doc_id, ROW_NUMBER() OVER ("
            "PARTITION BY cluster_id ORDER BY prio, doc_id) AS rk, "
            "COUNT(*) OVER (PARTITION BY cluster_id) AS nm FROM m) "
            "SELECT cluster_id, doc_id AS keeper_id, "
            "CAST(nm AS BIGINT) AS n_members FROM r WHERE rk = 1"
        ),
        "snapshot_diff": (
            # changed = the engine's content hash differs — both sides run
            # the same mirrored FNV→splitmix chain, so semantics (including
            # any 64-bit collision) are identical, not just value-equal
            "WITH o AS MATERIALIZED (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 5 <> 0), "
            "nsrc AS MATERIALIZED (SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
            "THEN text || ' v2' ELSE text END AS text FROM documents "
            "WHERE doc_id % 7 <> 0), "
            + _content_hash_cte("o", "oh", "co")
            + ", "
            + _content_hash_cte("nsrc", "nh", "cn")
            + " SELECT COALESCE(oh.doc_id, nh.doc_id) AS doc_id, "
            "CASE WHEN oh.doc_id IS NULL THEN 'added' "
            "WHEN nh.doc_id IS NULL THEN 'removed' ELSE 'changed' END "
            "AS status FROM oh FULL JOIN nh ON oh.doc_id = nh.doc_id "
            "WHERE oh.doc_id IS NULL OR nh.doc_id IS NULL "
            "OR oh.content_hash <> nh.content_hash"
        ),
        "ngram_novelty": _ngram_novelty_sql(),
        "token_edit_dups": (
            # semantic mirror: every distinct ASCII vocabulary token pair
            # within Levenshtein distance 2 (len(t) = strlen(t) is the
            # ASCII gate — byte DP == char distance only there); the
            # engine's deletion-neighborhood candidates are exhaustive for
            # distance <= 2 below the hub-key cap, so the sets agree
            "WITH tok AS MATERIALIZED (SELECT "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS t "
            "FROM documents), "
            "v AS MATERIALIZED (SELECT t, COUNT(*) AS c FROM tok "
            "WHERE len(t) BETWEEN 1 AND 24 AND len(t) = strlen(t) "
            "GROUP BY t) "
            "SELECT a.t AS tok_a, b.t AS tok_b, "
            "CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist, "
            "CAST(a.c AS BIGINT) AS freq_a, CAST(b.c AS BIGINT) AS freq_b "
            "FROM v a JOIN v b ON a.t < b.t "
            "AND abs(len(a.t) - len(b.t)) <= 2 "
            "AND levenshtein(a.t, b.t) <= 2"
        ),
        "token_variant_clusters": _token_variant_clusters_sql(),
        "cooccurrence_counts": (
            # same vocabulary rule as the engine (occurrence count desc,
            # token asc, exact), document-level distinct presence, pairs
            # lexicographic; '' from empty text is a token on both sides
            "WITH tok AS MATERIALIZED (SELECT doc_id, "
            "unnest(string_split(COALESCE(text, ''), ' ')) AS t "
            "FROM documents), "
            "cnt AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t), "
            "v AS MATERIALIZED (SELECT t FROM cnt ORDER BY c DESC, t ASC "
            "LIMIT 16), "
            "p AS MATERIALIZED (SELECT DISTINCT doc_id, t FROM tok "
            "WHERE t IN (SELECT t FROM v)), "
            "pairs AS (SELECT a.t AS tok_a, b.t AS tok_b, COUNT(*) AS "
            "n_both FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.t < b.t "
            "GROUP BY a.t, b.t), "
            "m AS (SELECT t, COUNT(*) AS n FROM p GROUP BY t) "
            "SELECT pr.tok_a, pr.tok_b, CAST(pr.n_both AS BIGINT) AS "
            "n_both, CAST(ma.n AS BIGINT) AS n_a, CAST(mb.n AS BIGINT) AS "
            "n_b FROM pairs pr JOIN m ma ON ma.t = pr.tok_a "
            "JOIN m mb ON mb.t = pr.tok_b"
        ),
        "triangle_counts": (
            # canonical a<b edges; each triangle (x<y<z) found once via
            # the two-wedge + closing-edge join, then credits all corners
            "WITH un AS (SELECT DISTINCT user_id AS u FROM events), "
            "e AS (SELECT u - 1 AS a, u AS b FROM un WHERE u % 10 <> 0 "
            "UNION SELECT u - 2 AS a, u AS b FROM un WHERE u % 10 >= 2), "
            "tri AS (SELECT t1.a AS x, t1.b AS y, t2.b AS z FROM e t1 "
            "JOIN e t2 ON t2.a = t1.b JOIN e t3 ON t3.a = t1.a AND "
            "t3.b = t2.b) "
            "SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM ("
            "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
            "UNION ALL SELECT z FROM tri) GROUP BY node"
        ),
        "k_core": _k_core_sql(k=3, rounds=4),
        "bfs_layers": (
            # min-hop BFS from the u%100==0 seeds, capped at 3 rounds; the
            # recursive UNION dedups (node, dist) pairs so the cyclic skip
            # edges terminate, MIN(dist) per node mirrors the engine's
            # first-frontier-wins rule
            "WITH RECURSIVE un AS MATERIALIZED "
            "(SELECT DISTINCT user_id AS u FROM events), "
            "e AS MATERIALIZED ("
            "SELECT u - 1 AS a, u AS b FROM un WHERE u % 10 <> 0 "
            "UNION SELECT u - 2, u FROM un WHERE u % 10 >= 2 "
            "UNION SELECT u, u - 1 FROM un WHERE u % 10 <> 0 "
            "UNION SELECT u, u - 2 FROM un WHERE u % 10 >= 2), "
            "bfs(node, dist) AS ("
            "SELECT u AS node, 0 AS dist FROM un WHERE u % 100 = 0 "
            "UNION SELECT e.b, bfs.dist + 1 FROM bfs "
            "JOIN e ON e.a = bfs.node WHERE bfs.dist < 3) "
            "SELECT node, CAST(MIN(dist) AS BIGINT) AS dist "
            "FROM bfs GROUP BY node"
        ),
        "edge_support": (
            # per-edge common-neighbor counts over the same chain+skip
            # graph; both adjacency directions unioned, inner joins drop
            # zero-support edges exactly like the engine's matched credit
            "WITH un AS (SELECT DISTINCT user_id AS u FROM events), "
            "e AS (SELECT u - 1 AS a, u AS b FROM un WHERE u % 10 <> 0 "
            "UNION SELECT u - 2 AS a, u AS b FROM un WHERE u % 10 >= 2), "
            "n AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b "
            "FROM e) "
            "SELECT e.a AS lo, e.b AS hi, CAST(COUNT(*) AS BIGINT) AS "
            "support FROM e JOIN n n1 ON n1.a = e.a "
            "JOIN n n2 ON n2.a = e.b AND n2.b = n1.b "
            "GROUP BY e.a, e.b"
        ),
        # SimHash near-dup pairs: all-pairs over the SQL-mirrored simhash —
        # pairs share ≥1 of the 4 16-bit bands AND hamming ≤ 3 (bit_count of
        # the two's-complement xor is bitwise-identical to the uint64 view)
        "simhash_pairs": (
            f"WITH s0 AS ({_simhash_sql()}), "
            "s AS (SELECT doc_id, CAST(CAST(simhash AS HUGEINT) + CASE WHEN simhash < 0 "
            "  THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS UBIGINT) AS u, "
            "  simhash FROM s0) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3 AND ("
            "((a.u >> 0) & 65535) = ((b.u >> 0) & 65535) OR "
            "((a.u >> 16) & 65535) = ((b.u >> 16) & 65535) OR "
            "((a.u >> 32) & 65535) = ((b.u >> 32) & 65535) OR "
            "((a.u >> 48) & 65535) = ((b.u >> 48) & 65535))"
        ),
        "cidr_match_v6": (
            "WITH e AS (SELECT event_id, "
            "'2001:db8:' || (user_id % 4) || '::' || printf('%x', user_id % 256) AS ip, "
            "user_id % 4 AS g, user_id % 256 AS low FROM events) "
            "SELECT event_id, ip, '2001:db8::/32' AS matched_cidr FROM e "
            "UNION ALL "
            "SELECT event_id, ip, '2001:db8:1::/48' AS matched_cidr FROM e WHERE g = 1 "
            "UNION ALL "
            "SELECT event_id, ip, '2001:db8:2::/124' AS matched_cidr FROM e "
            "WHERE g = 2 AND low <= 15"
        ),
        "extract_text_len": (
            "SELECT doc_id, strlen(text) AS n_extracted_chars FROM documents"
        ),
        "hostname_counts": (
            "SELECT source || '.example.com' AS hostname, COUNT(*) AS n "
            "FROM documents GROUP BY source"
        ),
        "exact_distinct_users": (
            "SELECT COUNT(DISTINCT user_id) AS n_distinct_users FROM events"
        ),
        "extract_links": (
            # the engine PARSES hrefs out of html bytes; the oracle parses
            # the same derived html with regexp_extract_all — both sides do
            # real extraction over the shared deterministic link derivation
            f"WITH {_links_mod().LINKED_PAGES_SQL_CTE} "
            "SELECT doc_id, UNNEST(regexp_extract_all(html, "
            "'href=\"([^\"]*)\"', 1)) AS href FROM linked_pages"
        ),
        "reciprocal_hosts": (
            # mirrored arithmetic edge table + orientation self-join;
            # host_a < host_b gives one row per unordered reciprocal pair
            "WITH e AS (SELECT source || '.example.com' AS s, "
            "'src' || ((doc_id // 20) % 4) || '.example.com' AS d, "
            "COUNT(*) AS n FROM documents GROUP BY 1, 2) "
            "SELECT a.s AS host_a, a.d AS host_b, CAST(a.n AS BIGINT) AS "
            "n_ab, CAST(b.n AS BIGINT) AS n_ba FROM e a JOIN e b ON "
            "a.s = b.d AND a.d = b.s WHERE a.s < a.d"
        ),
        "link_distinct_sources": (
            # exact per-dst-host distinct linking pages; host rows exist
            # only if the engine's grouped sparse-HLL estimate met the
            # 3-sigma envelope for that host
            f"WITH {_links_mod().LINKED_PAGES_SQL_CTE}, "
            "links AS (SELECT url, UNNEST(regexp_extract_all(html, "
            "'href=\"([^\"]*)\"', 1)) AS href FROM linked_pages), "
            "hosted AS (SELECT url, CASE WHEN href LIKE '/%' THEN "
            "regexp_extract(url, '^[a-z]+://([^/]+)', 1) ELSE "
            "regexp_extract(href, '^[a-z]+://([^/]+)', 1) END AS dst_host "
            "FROM links) "
            "SELECT dst_host, CAST(COUNT(DISTINCT url) AS BIGINT) AS n_src "
            "FROM hosted GROUP BY dst_host"
        ),
        "host_link_graph": (
            f"WITH {_links_mod().LINKED_PAGES_SQL_CTE}, "
            "links AS (SELECT url, UNNEST(regexp_extract_all(html, "
            "'href=\"([^\"]*)\"', 1)) AS href FROM linked_pages), "
            "hosted AS (SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) "
            "AS src_host, CASE WHEN href LIKE '/%' THEN "
            "regexp_extract(url, '^[a-z]+://([^/]+)', 1) ELSE "
            "regexp_extract(href, '^[a-z]+://([^/]+)', 1) END AS dst_host "
            "FROM links) "
            "SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links "
            "FROM hosted GROUP BY src_host, dst_host"
        ),
        "grouped_tail_per_lang": (
            # exact per-lang tail order statistics of token byte lengths;
            # rows exist only if every grouped REQ estimate met the
            # relative-of-tail envelope (the per-group bound-as-gate)
            "WITH tok AS (SELECT lang, unnest(string_split(COALESCE(text, ''), ' ')) "
            "AS t FROM documents), "
            "r AS (SELECT lang, strlen(t) AS l, "
            "row_number() OVER (PARTITION BY lang ORDER BY strlen(t)) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM tok) "
            "SELECT lang, 'p99' AS tail, CAST(l AS DOUBLE) AS exact_value "
            "FROM r WHERE rn = GREATEST(CAST(CEIL(0.99 * n) AS BIGINT), 1) "
            "UNION ALL SELECT lang, 'p999', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = GREATEST(CAST(CEIL(0.999 * n) AS BIGINT), 1) "
            "ORDER BY lang, tail"
        ),
        "grouped_range_per_lang": (
            # exact per-lang counts of document byte lengths in three probe
            # ranges; engine rows exist only if every group's dyadic-CMS
            # estimate sat in [exact, exact + 2*bits*eps*n_g] (C&M §4.3)
            "WITH l AS (SELECT lang, strlen(COALESCE(text, '')) AS len "
            "FROM documents), "
            "g AS (SELECT DISTINCT lang FROM documents), "
            "r(range_id, lo, hi) AS (VALUES (0, 0, 127), (1, 128, 255), "
            "(2, 256, 1023)) "
            "SELECT g.lang AS lang, CAST(r.range_id AS BIGINT) AS range_id, "
            "CAST(COUNT(l.len) AS BIGINT) AS n_docs "
            "FROM g CROSS JOIN r "
            "LEFT JOIN l ON l.lang = g.lang AND l.len BETWEEN r.lo AND r.hi "
            "GROUP BY g.lang, r.range_id ORDER BY lang, range_id"
        ),
        "grouped_dd_per_lang": (
            # exact per-lang order statistics of document text byte lengths
            # at the DataDog 0-based rank floor(q*(n-1)); rows exist only if
            # every grouped DDSketch met the alpha=0.01 value-relative bound
            "WITH r AS (SELECT lang, strlen(COALESCE(text, '')) AS l, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY strlen(COALESCE(text, ''))) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT lang, 'p50' AS qtag, CAST(l AS DOUBLE) AS exact_value "
            "FROM r WHERE rn = CAST(FLOOR(0.50 * (n - 1)) AS BIGINT) + 1 "
            "UNION ALL SELECT lang, 'p90', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = CAST(FLOOR(0.90 * (n - 1)) AS BIGINT) + 1 "
            "ORDER BY lang, qtag"
        ),
        "grouped_sketch_per_lang": (
            "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang"
        ),
        "cms_join_size": (
            # exact equi-join size of the two parity halves on user_id;
            # engine row exists only if the CMS inner-product estimate sat
            # inside [exact, exact + eps*Na*Nb] (published C&M bound)
            "WITH a AS (SELECT user_id, COUNT(*) AS c FROM events "
            "WHERE event_id % 2 = 0 GROUP BY user_id), "
            "b AS (SELECT user_id, COUNT(*) AS c FROM events "
            "WHERE event_id % 2 = 1 GROUP BY user_id) "
            "SELECT CAST(COALESCE(SUM(a.c * b.c), 0) AS BIGINT) AS join_size "
            "FROM a JOIN b USING (user_id)"
        ),
        "dyadic_range_gate": (
            # exact counts of event amount-cents inside five probe ranges;
            # engine rows exist only if every dyadic-CMS range estimate sat
            # inside [exact, exact + 2*bits*eps*n] (C&M 2005 §4.3 bound)
            "WITH c AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c "
            "FROM events) "
            "SELECT CAST(r.range_id AS BIGINT) AS range_id, "
            "CAST(r.lo AS BIGINT) AS lo, CAST(r.hi AS BIGINT) AS hi, "
            "CAST(COUNT(c.c) AS BIGINT) AS exact_count "
            "FROM (VALUES (0, 0, 999), (1, 1000, 4999), (2, 5000, 9999), "
            "(3, 10000, 19999), (4, 20000, 65535)) r(range_id, lo, hi) "
            "LEFT JOIN c ON c.c BETWEEN r.lo AND r.hi "
            "GROUP BY r.range_id, r.lo, r.hi ORDER BY range_id"
        ),
        "cbf_retraction_gate": (
            # exact audience split after retracting error traffic; engine
            # row exists only if the subtracted counting bloom showed zero
            # false negatives, bounded false positives, and zero debt
            "SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
            "CAST(COUNT(DISTINCT CASE WHEN event_type <> 'error' "
            "THEN user_id END) AS BIGINT) AS n_active, "
            "CAST(COUNT(DISTINCT user_id) - COUNT(DISTINCT CASE WHEN "
            "event_type <> 'error' THEN user_id END) AS BIGINT) AS n_retired "
            "FROM events"
        ),
        "sketch_cube": (
            # exact distinct-user cube at three granularities; engine rows
            # exist only if the merged-HLL rollup estimate met 3x RSE + 2
            "WITH e AS (SELECT event_type AS t, "
            "CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS d, user_id "
            "FROM events) "
            "SELECT 'type' AS level, t AS key, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM e GROUP BY t "
            "UNION ALL SELECT 'day', d, COUNT(DISTINCT user_id) "
            "FROM e GROUP BY d "
            "UNION ALL SELECT 'all', 'all', COUNT(DISTINCT user_id) FROM e "
            "ORDER BY level, key"
        ),
        "grouped_sketch_per_host": (
            "SELECT source || '.example.com' AS hostname, COUNT(*) AS n_docs "
            "FROM documents GROUP BY source"
        ),
        "user_overlap_exact": (
            "SELECT "
            "(SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS n_purchasers, "
            "(SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'error') AS n_error_users, "
            "(SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'purchase' "
            " INTERSECT SELECT user_id FROM events WHERE event_type = 'error')) AS n_both"
        ),
        # theta/KMV is EXACT below saturation (distinct users 150 ≪ k=4096:
        # estimate = len(values), theta = 1.0), so the full sketch path —
        # per-batch build, serialization, merge, intersection clamp — gates
        # against exact set arithmetic; 64-bit hash collisions would fail
        # the gate and are ~1e-15 at this cardinality
        "theta_set_algebra": (
            "SELECT "
            "CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase') AS DOUBLE) AS n_purchasers, "
            "CAST((SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'error') AS DOUBLE) AS n_error_users, "
            "CAST((SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'purchase' "
            " INTERSECT SELECT user_id FROM events WHERE event_type = 'error')) AS DOUBLE) AS n_both"
        ),
        # set-valued range join, inclusive bounds — BETWEEN mirrors the
        # engine's searchsorted left/right pair exactly
        "interval_join": "SELECT l.user_id, l.event_id AS l_event, r.event_id AS r_event, epoch_us(r.ts) - epoch_us(l.ts) AS delta_us FROM events l JOIN events r ON l.user_id = r.user_id AND l.event_type = 'purchase' AND r.event_type = 'error' AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR",
        # bigram OOV vs the doc_id%10==0 reference slice: DISTINCT
        # bigrams of the slice are the model; per-doc position counts
        # and OOV counts are pure integers (byte == char on this ASCII
        # corpus, matching the engine's flat-buffer byte bigrams)
        "char_bigram_oov": 'WITH bg AS (SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS g FROM (SELECT doc_id, text, unnest(range(1, strlen(text))) AS i FROM documents)), model AS (SELECT DISTINCT g FROM bg WHERE doc_id % 10 = 0), sc AS (SELECT doc_id, COUNT(*) AS nb, SUM(CASE WHEN g IN (SELECT g FROM model) THEN 0 ELSE 1 END) AS no FROM bg WHERE doc_id % 10 != 0 GROUP BY doc_id) SELECT d.doc_id, CAST(COALESCE(sc.nb, 0) AS BIGINT) AS n_bigrams, CAST(COALESCE(sc.no, 0) AS BIGINT) AS n_oov FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id WHERE d.doc_id % 10 != 0',
        # integer fixed-point PageRank: same 3 unrolled iterations as
        # the engine, pure floor arithmetic (// is integer division) —
        # bit-exact across engines, unlike float PageRank
        "hits": _hits_sql(2, 10**9, 20),
        "personalized_pagerank": _ppr_sql(3, 10**12, 3, 20),
        "pagerank": 'WITH st AS (SELECT COUNT(DISTINCT user_id) AS n, MIN(user_id) AS mn FROM events), e AS (SELECT user_id AS src, (user_id * 7 + event_id) % (SELECT n FROM st) + (SELECT mn FROM st) AS dst FROM events), deg AS (SELECT src AS node, COUNT(*) AS c FROM e GROUP BY src), r0 AS (SELECT node, 1000000000000 // (SELECT n FROM st) AS r FROM deg), c1 AS (SELECT e.dst AS node, SUM(r0.r // deg.c) AS s FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.node GROUP BY e.dst), r1 AS (SELECT deg.node, (15 * (1000000000000 // (SELECT n FROM st))) // 100 + (85 * COALESCE(c1.s, 0)) // 100 AS r FROM deg LEFT JOIN c1 ON deg.node = c1.node), c2 AS (SELECT e.dst AS node, SUM(r1.r // deg.c) AS s FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.node GROUP BY e.dst), r2 AS (SELECT deg.node, (15 * (1000000000000 // (SELECT n FROM st))) // 100 + (85 * COALESCE(c2.s, 0)) // 100 AS r FROM deg LEFT JOIN c2 ON deg.node = c2.node), c3 AS (SELECT e.dst AS node, SUM(r2.r // deg.c) AS s FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.node GROUP BY e.dst), r3 AS (SELECT deg.node, (15 * (1000000000000 // (SELECT n FROM st))) // 100 + (85 * COALESCE(c3.s, 0)) // 100 AS r FROM deg LEFT JOIN c3 ON deg.node = c3.node) SELECT node, CAST(r AS BIGINT) AS pr FROM r3 ORDER BY r DESC, node LIMIT 20',
        # published-error-bound gate: the engine emits a check's row ONLY
        # when the sketch estimate sits inside its published bound, so the
        # oracle (which always emits all six exact rows) fails rows_match
        # on any bound violation, and the exact values themselves are
        # hash-checked.  Exact values: distinct users, top event-type
        # count, and the "first rank ≥ 0.5·n" median order statistic —
        # the same rank rule quantile_length_filter's oracle uses.
        "table_profile": 'SELECT * FROM (SELECT \'doc_id\' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct, CAST(MIN(doc_id) AS VARCHAR) AS min_v, CAST(MAX(doc_id) AS VARCHAR) AS max_v FROM documents UNION ALL SELECT \'lang\' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_distinct, CAST(MIN(lang) AS VARCHAR) AS min_v, CAST(MAX(lang) AS VARCHAR) AS max_v FROM documents UNION ALL SELECT \'n_chars\' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(COUNT(DISTINCT n_chars) AS BIGINT) AS n_distinct, CAST(MIN(n_chars) AS VARCHAR) AS min_v, CAST(MAX(n_chars) AS VARCHAR) AS max_v FROM documents UNION ALL SELECT \'source\' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_distinct, CAST(MIN(source) AS VARCHAR) AS min_v, CAST(MAX(source) AS VARCHAR) AS max_v FROM documents) ORDER BY "column"',
        "mg_heavy_tokens": (
            # every token with count > n//(k+1) — the set the MG summary
            # deterministically retains; rows exist only if the engine-side
            # residual/undercount checks all held
            "WITH tk AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) "
            "AS token FROM documents), "
            "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tk) "
            "SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk "
            "GROUP BY token HAVING COUNT(*) > (SELECT n FROM n) // 33 "
            "ORDER BY token"
        ),
        "ams_f2_gate": (
            # exact self-join size of the user_id column; the row exists
            # only if the engine-side AMS estimate met sqrt(8/b)*F2
            "SELECT 'ams_f2' AS check_name, CAST(CAST(SUM(c * c) AS BIGINT) "
            "AS DOUBLE) AS exact_value FROM "
            "(SELECT COUNT(*) AS c FROM events GROUP BY user_id)"
        ),
        "dynamic_distinct_gate": (
            # exact distinct users with >=1 surviving (non-error) event;
            # the row exists only if the linear counter, after retracting
            # the error stream, met the TODS 1990 3-sigma bound with zero
            # debt
            "SELECT 'dynamic_distinct' AS check_name, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active "
            "FROM events WHERE event_type <> 'error'"
        ),
        "countsketch_point_gate": (
            # exact F2 of the user_id column; the row exists only if every
            # per-user median-of-lanes estimate met sqrt(8*F2/b)
            "SELECT 'countsketch_point' AS check_name, "
            "CAST(CAST(SUM(c * c) AS BIGINT) AS DOUBLE) AS exact_value FROM "
            "(SELECT COUNT(*) AS c FROM events GROUP BY user_id)"
        ),
        "fd_error_gate": (
            # the integer payload is the exact sum of squared SQ8 codes
            # (same IEEE-double quantization tree as embedding_quantize);
            # the three rows exist only if the engine-side FD bounds held
            "WITH m AS (SELECT vec_id, list_max(list_transform(embedding, "
            "v -> abs(CAST(v AS DOUBLE)))) AS s FROM embeddings), "
            "q AS (SELECT UNNEST(list_transform(e.embedding, v -> "
            "CASE WHEN m.s = 0 THEN CAST(0 AS BIGINT) ELSE "
            "CAST(FLOOR(CAST(v AS DOUBLE) * 127.0 / m.s + 0.5) AS BIGINT) "
            "END)) AS qv FROM embeddings e JOIN m ON m.vec_id = e.vec_id), "
            "t AS (SELECT CAST(SUM(qv * qv) AS DOUBLE) AS v FROM q) "
            "SELECT c AS check_name, v AS exact_value FROM t, "
            "(VALUES ('fd_psd'), ('fd_spectral_bound'), ('fd_trace')) "
            "AS checks(c) ORDER BY check_name"
        ),
        "req_tail_gate": (
            # exact tail order statistics of per-token byte lengths; the
            # rows exist only if the engine-side REQ rank intervals met the
            # relative-of-tail envelope (PODS 2021 HRA posture)
            "WITH tok AS (SELECT unnest(string_split(COALESCE(text, ''), ' ')) "
            "AS t FROM documents), "
            "r AS (SELECT strlen(t) AS l, row_number() OVER (ORDER BY strlen(t)) "
            "AS rn, count(*) OVER () AS n FROM tok) "
            "SELECT 'req_p90' AS check_name, CAST(l AS DOUBLE) AS exact_value "
            "FROM r WHERE rn = GREATEST(CAST(CEIL(0.90 * n) AS BIGINT), 1) "
            "UNION ALL SELECT 'req_p99', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = GREATEST(CAST(CEIL(0.99 * n) AS BIGINT), 1) "
            "UNION ALL SELECT 'req_p999', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = GREATEST(CAST(CEIL(0.999 * n) AS BIGINT), 1) "
            "ORDER BY check_name"
        ),
        "dd_quantile_gate": (
            # exact order statistics of text byte lengths at the DataDog
            # 0-based rank floor(q*(n-1)); rows exist only if the engine-side
            # DDSketch met the alpha=0.01 value-relative bound (VLDB 2019)
            "WITH r AS (SELECT strlen(COALESCE(text, '')) AS l, "
            "row_number() OVER (ORDER BY strlen(COALESCE(text, ''))) AS rn, "
            "count(*) OVER () AS n FROM documents) "
            "SELECT 'dd_p50' AS check_name, CAST(l AS DOUBLE) AS exact_value "
            "FROM r WHERE rn = CAST(FLOOR(0.50 * (n - 1)) AS BIGINT) + 1 "
            "UNION ALL SELECT 'dd_p90', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = CAST(FLOOR(0.90 * (n - 1)) AS BIGINT) + 1 "
            "UNION ALL SELECT 'dd_p99', CAST(l AS DOUBLE) FROM r "
            "WHERE rn = CAST(FLOOR(0.99 * (n - 1)) AS BIGINT) + 1 "
            "ORDER BY check_name"
        ),
        "distinct_sample": (
            # the 64 smallest hash64_ints values over DISTINCT user_ids,
            # via the shared splitmix CTE chain (bit-exact hash mirror)
            "WITH "
            + _splitmix_ctes(0, "user_id", table="events", id_expr="user_id")
            + ", d AS (SELECT DISTINCT user_id, h FROM s5) "
            "SELECT user_id FROM d ORDER BY h LIMIT 64"
        ),
        "per_key_distinct_sample": (
            # 8 smallest hash64_ints doc_ids per lang (splitmix CTE mirror)
            "WITH "
            + _splitmix_ctes(0, "lang, doc_id", table="documents", id_expr="doc_id")
            + ", r AS (SELECT lang, doc_id, row_number() OVER "
            "(PARTITION BY lang ORDER BY h) AS rn FROM s5) "
            "SELECT lang, doc_id FROM r WHERE rn <= 8 ORDER BY lang, doc_id"
        ),
        "dd_weighted_gate": (
            # exact token-weighted order statistics of text byte lengths:
            # smallest length whose cumulative token weight exceeds q*(W-1)
            # (the DDSketch rank convention); rows exist only if the
            # engine-side weighted sketch met the alpha=0.01 bound
            "WITH d AS (SELECT strlen(COALESCE(text, '')) AS l, "
            "CASE WHEN strlen(COALESCE(text, '')) = 0 THEN 0 "
            "ELSE strlen(COALESCE(text, '')) - "
            "strlen(replace(COALESCE(text, ''), ' ', '')) + 1 END AS w "
            "FROM documents), "
            "h AS (SELECT l, SUM(w) AS w FROM d GROUP BY l), "
            "r AS (SELECT l, SUM(w) OVER (ORDER BY l) AS cw, "
            "SUM(w) OVER () AS W FROM h) "
            "SELECT 'p50' AS qtag, CAST(MIN(l) AS DOUBLE) AS exact_value "
            "FROM r WHERE cw > 0.50 * (W - 1) "
            "UNION ALL SELECT 'p90', CAST(MIN(l) AS DOUBLE) FROM r "
            "WHERE cw > 0.90 * (W - 1) "
            "ORDER BY qtag"
        ),
        "theta_overlap_gate": (
            # exact distinct/overlap counts of the purchase/error user sets;
            # rows exist only if the engine-side theta estimates met 3x the
            # published KMV RSE (intersection judged against the union size)
            "SELECT 'theta_errors' AS check_name, "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_value "
            "FROM events WHERE event_type = 'error' "
            "UNION ALL SELECT 'theta_inter', CAST(COUNT(*) AS BIGINT) FROM "
            "(SELECT user_id FROM events WHERE event_type = 'purchase' "
            "INTERSECT SELECT user_id FROM events WHERE event_type = 'error') "
            "UNION ALL SELECT 'theta_purchasers', "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "FROM events WHERE event_type = 'purchase' "
            "UNION ALL SELECT 'theta_union', "
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) "
            "FROM events WHERE event_type IN ('purchase', 'error') "
            "ORDER BY check_name"
        ),
        "sketch_error_gate": (
            "WITH d AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS v FROM events), "
            "t AS (SELECT CAST(MAX(c) AS DOUBLE) AS v FROM "
            "(SELECT COUNT(*) AS c FROM events GROUP BY event_type)), "
            "m AS (SELECT CAST(value AS DOUBLE) AS v FROM "
            "(SELECT value, row_number() OVER (ORDER BY value) AS rn, "
            "count(*) OVER () AS n FROM events WHERE value IS NOT NULL) "
            "WHERE rn = GREATEST(CAST(CEIL(0.5 * n) AS BIGINT), 1)) "
            "SELECT 'hll_distinct_users' AS check_name, v AS exact_value FROM d "
            "UNION ALL SELECT 'theta_distinct_users', v FROM d "
            "UNION ALL SELECT 'bloom_users_membership', v FROM d "
            "UNION ALL SELECT 'cms_top_event_type', v FROM t "
            "UNION ALL SELECT 'kll_value_median', v FROM m "
            "UNION ALL SELECT 'tdigest_value_median', v FROM m"
        ),
        "frame_sample": (
            # the stub's real integer plan: nf = clip(len/256, 1, 4),
            # frame k at offset k·256 — zipped UNNESTs mirror the fan-out
            "WITH d AS (SELECT doc_id, GREATEST(LEAST("
            "strlen(COALESCE(text, '')) // 256, 4), 1) AS nf "
            "FROM documents) "
            "SELECT doc_id, UNNEST(range(0, nf)) AS frame_index, "
            "UNNEST(list_transform(range(0, nf), x -> x * 256)) "
            "AS frame_offset FROM d"
        ),
        "multimodal_decode": (
            # the decode STUB's metadata is a pure function of payload bytes:
            # html = 28-byte prefix + text + 18-byte suffix (docpages.py), so
            # width/height mirror in SQL — the plumbing is oracle-checked even
            # though the codec itself is a documented stub
            "SELECT doc_id, "
            "CAST(16 + ((strlen(text) + 46) % 1024) AS INT) AS img_width, "
            "CAST(16 + (((strlen(text) + 46) // 1024) % 1024) AS INT) AS img_height "
            "FROM documents"
        ),
        "code_cross_dedup": (
            # radius-0 cross pairs = odd/even ids sharing a 16-id block
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM documents a "
            "JOIN documents b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0 "
            "AND a.doc_id // 16 = b.doc_id // 16"
        ),
        "audio_dup_gate": (
            # same construction as image_phash_dups at a different plant
            # modulus: equal fingerprint codes = equal payloads
            "WITH d AS (SELECT doc_id, text, doc_id % 89 = 0 AS planted, "
            "doc_id % 3 AS grp FROM documents) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM d a JOIN d b "
            "ON a.doc_id < b.doc_id AND ((a.planted AND b.planted AND "
            "a.grp = b.grp) OR (NOT a.planted AND NOT b.planted AND "
            "a.text = b.text))"
        ),
        "image_phash_dups": (
            # distance-0 pairs = equal 64-bit codes = equal payloads:
            # the three planted groups (every 97th id, by id mod 3) plus
            # identical-text unplanted docs (html is a pure text template)
            "WITH d AS (SELECT doc_id, text, doc_id % 97 = 0 AS planted, "
            "doc_id % 3 AS grp FROM documents) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM d a JOIN d b "
            "ON a.doc_id < b.doc_id AND ((a.planted AND b.planted AND "
            "a.grp = b.grp) OR (NOT a.planted AND NOT b.planted AND "
            "a.text = b.text))"
        ),
        "audio_decode": (
            # the audio stub's fake lanes are pure byte-length functions:
            # rate = 8000 + (16 + len%1024)*16, frames = (16 + (len//1024)
            # % 1024)*256 with len = strlen(text) + 46 (the html template)
            "SELECT doc_id, "
            "CAST(8000 + (16 + ((strlen(text) + 46) % 1024)) * 16 AS INT) "
            "AS sample_rate, "
            "CAST((16 + (((strlen(text) + 46) // 1024) % 1024)) * 256 "
            "AS BIGINT) AS n_frames FROM documents"
        ),
        "multimodal_resize": (
            # ResizeStub output geometry is exact integer arithmetic
            # (fit-into-224x160, aspect preserved) over the decode stub's dims
            "WITH m AS (SELECT doc_id, "
            "CAST(16 + ((strlen(text) + 46) % 1024) AS BIGINT) AS w, "
            "CAST(16 + (((strlen(text) + 46) // 1024) % 1024) AS BIGINT) AS h "
            "FROM documents) "
            "SELECT doc_id, CAST(w AS INT) AS img_width, CAST(h AS INT) AS img_height, "
            "CAST(CASE WHEN w <= 224 AND h <= 160 THEN w "
            "WHEN w * 160 >= h * 224 THEN 224 "
            "ELSE greatest(1, (w * 160) // h) END AS INT) AS resize_w, "
            "CAST(CASE WHEN w <= 224 AND h <= 160 THEN h "
            "WHEN w * 160 >= h * 224 THEN greatest(1, (h * 224) // w) "
            "ELSE 160 END AS INT) AS resize_h "
            "FROM m"
        ),
        "semantic_decontaminate": (
            "SELECT e.vec_id FROM embeddings e WHERE e.vec_id % 11 <> 0 "
            "AND NOT EXISTS (SELECT 1 FROM embeddings b "
            "WHERE b.vec_id % 11 = 0 AND "
            "list_cosine_similarity(e.embedding, b.embedding) >= 0.4)"
        ),
        "window_top_k": (
            "WITH wc AS (SELECT "
            "make_timestamp(CAST(floor(epoch(ts)/86400)*86400*1000000 AS BIGINT)) "
            "AS window_start, user_id, COUNT(*) AS n FROM events GROUP BY 1, 2), "
            "r AS (SELECT window_start, user_id, CAST(n AS BIGINT) AS n, "
            "ROW_NUMBER() OVER (PARTITION BY window_start "
            "ORDER BY n DESC, user_id) AS rn FROM wc) "
            "SELECT window_start, user_id, n, CAST(rn AS BIGINT) AS rn "
            "FROM r WHERE rn <= 3"
        ),
        "tumbling_window": (
            "SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600*1000000 AS BIGINT)) "
            "AS window_start, event_type, COUNT(*) AS n, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "window_distinct": (
            "SELECT make_timestamp(CAST(floor(epoch(ts)/3600)*3600*1000000 AS BIGINT)) "
            "AS window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct "
            "FROM events GROUP BY 1"
        ),
        "hopping_window": (
            # each event joins the size/step hop offsets of its containing hops
            "SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 * 1000000 AS BIGINT) "
            "  - k.k * 900 * 1000000) AS window_start, "
            "event_type, COUNT(*) AS n, "
            "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value "
            "FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS k) k "
            "GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH o AS (SELECT user_id, ts, "
            "  CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END AS brk "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, CAST(SUM(brk) OVER "
            "  (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id "
            "  FROM o) "
            "SELECT user_id, session_id, MIN(ts) AS session_start, "
            "MAX(ts) AS session_end, COUNT(*) AS n_events FROM s GROUP BY 1, 2"
        ),
        # deterministic mode: highest count, then smallest value
        "group_mode": (
            "SELECT lang, mode, mode_count FROM ("
            "SELECT lang, n_chars AS mode, COUNT(*) AS mode_count, "
            "ROW_NUMBER() OVER (PARTITION BY lang "
            "ORDER BY COUNT(*) DESC, n_chars) AS rn "
            "FROM documents GROUP BY lang, n_chars) WHERE rn = 1"
        ),
        "rollup_aggregate": (
            "SELECT lang, source, COUNT(n_chars) AS n, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars "
            "FROM documents GROUP BY ROLLUP(lang, source)"
        ),
        "cube_aggregate": (
            "SELECT lang, source, COUNT(n_chars) AS n, "
            "CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars "
            "FROM documents GROUP BY CUBE(lang, source)"
        ),
        "melt": (
            "UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax FROM lineitem) "
            "ON l_quantity, l_extendedprice, l_discount, l_tax "
            "INTO NAME variable VALUE value"
        ),
        # histogram-rank: competition ranking (ties share a rank) — SQL RANK
        "group_value_rank": (
            "SELECT doc_id, lang, n_chars, "
            "RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS rank "
            "FROM documents"
        ),
        # span removal: a token survives iff no corpus-duplicated 5-token
        # window covers it; fully-covered docs become '' (COALESCE mirrors
        # the engine's empty-string, never-dropped contract)
        "dup_ngram_trim": (
            "WITH toks AS (SELECT doc_id, string_split(COALESCE(text,''), ' ')"
            " AS t FROM documents), "
            "pos AS (SELECT doc_id, t, unnest(range(1, len(t)-5+2)) AS i "
            "FROM toks), "
            "wins AS (SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS g "
            "FROM pos), "
            "cnt AS (SELECT g FROM wins GROUP BY g HAVING COUNT(*) > 1), "
            "dupw AS (SELECT doc_id, i FROM wins JOIN cnt USING (g)), "
            "tok AS (SELECT doc_id, unnest(t) AS tokv, "
            "unnest(range(1, len(t)+1)) AS p FROM toks), "
            "keep AS (SELECT tok.doc_id, tokv, p FROM tok "
            "WHERE NOT EXISTS (SELECT 1 FROM dupw d WHERE d.doc_id = "
            "tok.doc_id AND d.i <= tok.p AND tok.p <= d.i + 4)) "
            "SELECT t.doc_id, "
            "COALESCE((SELECT string_agg(tokv, ' ' ORDER BY p) FROM keep k "
            "WHERE k.doc_id = t.doc_id), '') AS text_trim, "
            "len(t.t) - COALESCE((SELECT COUNT(*) FROM keep k "
            "WHERE k.doc_id = t.doc_id), 0) AS n_removed "
            "FROM toks t"
        ),
        # greedy earliest-chain funnel with a 1-day conversion window;
        # strictly-after ordering and integer-us window arithmetic mirror
        # the engine exactly
        "funnel_counts": (
            "WITH s1 AS (SELECT user_id, MIN(ts) t1 FROM events "
            "  WHERE event_type='view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) t2 FROM events e "
            "  JOIN s1 USING (user_id) WHERE e.event_type='click' "
            "  AND e.ts > s1.t1 "
            "  AND epoch_us(e.ts) <= epoch_us(s1.t1) + CAST(86400 AS BIGINT)*1000000 "
            "  GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, MIN(e.ts) t3 FROM events e "
            "  JOIN s2 USING (user_id) WHERE e.event_type='purchase' "
            "  AND e.ts > s2.t2 "
            "  AND epoch_us(e.ts) <= epoch_us(s2.t2) + CAST(86400 AS BIGINT)*1000000 "
            "  GROUP BY e.user_id) "
            "SELECT CAST(step AS BIGINT) AS step, event_type, n_users FROM ("
            "  SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS n_users "
            "  FROM s1 "
            "  UNION ALL SELECT 2, 'click', COUNT(*) FROM s2 "
            "  UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3)"
        ),
        "group_top_k": (
            "SELECT lang, doc_id, n_chars, rn FROM ("
            "SELECT lang, doc_id, n_chars, ROW_NUMBER() OVER "
            "(PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        # numeric band self-join on exact integer cents; bucket width
        # delta+1 in the engine affects load only, never output
        "band_join": (
            "WITH p AS (SELECT p_partkey AS k, "
            "CAST(ROUND(p_retailprice * 100) AS BIGINT) AS c FROM part) "
            "SELECT a.k AS id_a, b.k AS id_b, a.c AS val_a, b.c AS val_b "
            "FROM p a JOIN p b ON a.k < b.k AND abs(a.c - b.c) <= 10"
        ),
        # doubled pooled ranks keep every moment integer; the identity
        # 2*U_A = 2*R_A - n_a(n_a+1) holds with average tie ranks
        "mann_whitney": (
            "WITH e AS (SELECT CASE WHEN event_type = 'purchase' THEN 0 "
            "ELSE 1 END AS side, CAST(ROUND(value * 100) AS BIGINT) AS c "
            "FROM events WHERE event_type IN ('purchase', 'click')), "
            "r AS (SELECT side, 2*RANK() OVER (ORDER BY c) "
            "+ COUNT(*) OVER (PARTITION BY c) - 1 AS dr FROM e), "
            "s AS (SELECT SUM(dr) FILTER (WHERE side = 0) AS r2a, "
            "COUNT(*) FILTER (WHERE side = 0) AS na, "
            "COUNT(*) FILTER (WHERE side = 1) AS nb FROM r) "
            "SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b, "
            "CAST(r2a - na*(na+1) AS BIGINT) AS u2_a FROM s"
        ),
        # rolling_hll_gate reuses this exact SQL: the engine emits the
        # exact curve only if every HLL window met its published bound
        "rolling_hll_gate": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "w AS (SELECT DISTINCT user_id, day + g AS day_idx "
            "FROM d, generate_series(0, 6) AS s(g)) "
            "SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS active_users "
            "FROM w GROUP BY day_idx"
        ),
        "rolling_active_users": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "w AS (SELECT DISTINCT user_id, day + g AS day_idx "
            "FROM d, generate_series(0, 6) AS s(g)) "
            "SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS active_users "
            "FROM w GROUP BY day_idx"
        ),
        # boundary ties inside rn <= n_top hold equal values, so the
        # filtered sum is tie-order-invariant
        "top_share": (
            "WITH e AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS c "
            "FROM events), "
            "r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC) AS rn, "
            "COUNT(*) OVER () AS n, SUM(c) OVER () AS tot FROM e) "
            "SELECT CAST(MAX(n) AS BIGINT) AS n_rows, "
            "CAST((MAX(n) * 10000 + 999999) // 1000000 AS BIGINT) AS n_top, "
            "CAST(SUM(c) FILTER (WHERE rn <= (n * 10000 + 999999) // 1000000) "
            "AS BIGINT) AS top_mass, "
            "CAST(MAX(tot) AS BIGINT) AS total_mass FROM r"
        ),
        "time_to_nth": (
            "WITH r AS (SELECT user_id, epoch_us(ts) AS t, "
            "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS rn FROM events) "
            "SELECT a.user_id, CAST(b.t - a.t AS BIGINT) AS latency_us "
            "FROM r a JOIN r b ON a.user_id = b.user_id "
            "AND a.rn = 1 AND b.rn = 5"
        ),
        # ROW_NUMBER tie order inside o is value-invariant: the sorted
        # multiset pins the VALUE at every position
        "quantile_match": (
            "WITH e AS (SELECT event_id, event_type AS g, "
            "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events), "
            "r AS (SELECT event_id, g, c, "
            "RANK() OVER (PARTITION BY g ORDER BY c) AS rk, "
            "COUNT(*) OVER (PARTITION BY g) AS ng, "
            "COUNT(*) OVER () AS n FROM e), "
            "o AS (SELECT c AS gv, ROW_NUMBER() OVER (ORDER BY c) AS pos "
            "FROM e), "
            "t AS (SELECT event_id, g, c, ((rk - 1) * n) // ng + 1 AS tp "
            "FROM r) "
            "SELECT t.event_id, t.g AS event_type, t.c AS value_cents, "
            "o.gv AS norm_cents FROM t JOIN o ON o.pos = t.tp"
        ),
        # churn lands at p+1 whenever the key's next activity misses p+1
        # (or never comes) — mirrors the engine's gap/run-end rule
        "lifecycle_accounting": (
            "WITH e AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS p FROM events), "
            "w AS (SELECT user_id, p, "
            "LAG(p) OVER (PARTITION BY user_id ORDER BY p) AS prev, "
            "LEAD(p) OVER (PARTITION BY user_id ORDER BY p) AS nxt FROM e), "
            "st AS (SELECT p AS period, 0 AS s FROM w WHERE prev IS NULL "
            "UNION ALL SELECT p, 1 FROM w WHERE prev = p - 1 "
            "UNION ALL SELECT p, 2 FROM w "
            "WHERE prev IS NOT NULL AND prev < p - 1 "
            "UNION ALL SELECT p + 1, 3 FROM w "
            "WHERE nxt IS NULL OR nxt > p + 1) "
            "SELECT period, "
            "CAST(COUNT(*) FILTER (WHERE s = 0) AS BIGINT) AS new_users, "
            "CAST(COUNT(*) FILTER (WHERE s = 1) AS BIGINT) AS retained, "
            "CAST(COUNT(*) FILTER (WHERE s = 2) AS BIGINT) AS resurrected, "
            "CAST(COUNT(*) FILTER (WHERE s = 3) AS BIGINT) AS churned "
            "FROM st GROUP BY period"
        ),
        "bounce_rate": (
            # the sessionize oracle chain, reduced to per-start-day
            # session and bounce counts
            "WITH o AS (SELECT user_id, ts, "
            "CASE WHEN lag(ts) OVER w IS NULL OR "
            "ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
            "AS brk FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "g AS (SELECT epoch_us(MIN(ts)) // 86400000000 AS day_idx, "
            "COUNT(*) AS ne FROM s GROUP BY user_id, sid) "
            "SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS sessions, "
            "CAST(COUNT(*) FILTER (WHERE ne = 1) AS BIGINT) AS bounces "
            "FROM g GROUP BY day_idx"
        ),
        # SUM skips the NULLs a missing shifted day leaves, so the dense
        # lag grid zero-fills itself
        "lead_lag": (
            "WITH a AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "WHERE event_type = 'signup' GROUP BY 1), "
            "b AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1), "
            "l AS (SELECT g AS lag FROM generate_series(-7, 7) s(g)) "
            "SELECT l.lag, CAST(COALESCE(SUM(a.n * b.n), 0) AS BIGINT) AS dot "
            "FROM l CROSS JOIN a LEFT JOIN b ON b.day = a.day + l.lag "
            "GROUP BY l.lag"
        ),
        "growth_accounting": (
            "WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day "
            "FROM events), "
            "f AS (SELECT user_id, MIN(day) AS fday FROM e GROUP BY user_id) "
            "SELECT e.day AS day_idx, "
            "CAST(COUNT(*) FILTER (WHERE e.day = f.fday) AS BIGINT) "
            "AS new_user_events, "
            "CAST(COUNT(*) FILTER (WHERE e.day > f.fday) AS BIGINT) "
            "AS returning_user_events "
            "FROM e JOIN f ON e.user_id = f.user_id GROUP BY e.day"
        ),
        # gaps-and-islands: day - ROW_NUMBER is constant within a streak
        "max_streak": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "i AS (SELECT user_id, day, day - ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY day) AS isl FROM d), "
            "s AS (SELECT user_id, isl, COUNT(*) AS len FROM i "
            "GROUP BY user_id, isl) "
            "SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days, "
            "CAST(MAX(len) AS BIGINT) AS best_streak FROM s GROUP BY user_id"
        ),
        "cohort_retention": (
            "WITH a AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day "
            "FROM events), "
            "d AS (SELECT DISTINCT user_id, day FROM a), "
            "f AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id) "
            "SELECT f.cohort AS cohort_day, d.day - f.cohort AS age_days, "
            "CAST(COUNT(*) AS BIGINT) AS active_users "
            "FROM d JOIN f ON d.user_id = f.user_id GROUP BY 1, 2"
        ),
        # RANGE frame over integer microseconds: [t, t + W - 1] inclusive
        # == the engine's half-open [t, t + W); equal-ts peers are in the
        # frame on both sides
        "burst_max": (
            "WITH e AS (SELECT user_id AS k, epoch_us(ts) AS t FROM events), "
            "b AS (SELECT k, COUNT(*) OVER (PARTITION BY k ORDER BY t "
            "RANGE BETWEEN CURRENT ROW AND 3599999999 FOLLOWING) AS c FROM e) "
            "SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(MAX(c) AS BIGINT) AS max_burst FROM b GROUP BY k"
        ),
        "audience_growth": (
            "WITH f AS (SELECT user_id, MIN(epoch_us(ts)) AS fts "
            "FROM events GROUP BY user_id), "
            "d AS (SELECT fts // 86400000000 AS day_idx FROM f), "
            "g AS (SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS new_users "
            "FROM d GROUP BY day_idx) "
            "SELECT day_idx, new_users, "
            "CAST(SUM(new_users) OVER (ORDER BY day_idx) AS BIGINT) "
            "AS cum_users FROM g"
        ),
        # ROW_NUMBER tie order within equal counts is value-invariant in
        # the Gini numerator (equal c across the tie block)
        "gini_concentration": (
            "WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS c "
            "FROM documents GROUP BY source), "
            "r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, source) AS i, "
            "COUNT(*) OVER () AS n, SUM(c) OVER () AS tot FROM c) "
            "SELECT CAST(MAX(n) AS BIGINT) AS n_groups, "
            "CAST(MAX(tot) AS BIGINT) AS total, "
            "CAST(SUM((2*i - n - 1) * c) AS BIGINT) AS gini_num, "
            "CAST(MAX(n) * MAX(tot) AS BIGINT) AS gini_den FROM r"
        ),
        # DLT priority sampling: q = (w << 32) // (1 + (h & 0xFFFFFFFF))
        # over the shared splitmix64 chain; top-k by (q desc, id asc)
        "priority_sample": (
            "WITH "
            + _splitmix_ctes(
                7, "o_orderkey, o_totalprice", table="orders",
                id_expr="o_orderkey",
            )
            + ", w AS (SELECT o_orderkey, "
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS weight, "
            "CAST((CAST(ROUND(o_totalprice * 100) AS HUGEINT) * 4294967296) "
            "// (1 + CAST(h % 4294967296 AS HUGEINT)) AS BIGINT) AS priority "
            "FROM s5) "
            "SELECT o_orderkey, weight, priority FROM w "
            "ORDER BY priority DESC, o_orderkey LIMIT 100"
        ),
        # same mask-doubling Morton spread as the kernel, staged through
        # CTEs (x,y < 2^16 by the engine's loud bound check)
        "zorder_layout": (
            "WITH z0 AS (SELECT CAST(l_partkey AS BIGINT) AS x, "
            "CAST(l_suppkey AS BIGINT) AS y FROM lineitem), "
            "z1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS sx, "
            "(y | (y << 8)) & 16711935 AS sy FROM z0), "
            "z2 AS (SELECT x, y, (sx | (sx << 4)) & 252645135 AS sx, "
            "(sy | (sy << 4)) & 252645135 AS sy FROM z1), "
            "z3 AS (SELECT x, y, (sx | (sx << 2)) & 858993459 AS sx, "
            "(sy | (sy << 2)) & 858993459 AS sy FROM z2), "
            "z4 AS (SELECT x, y, (sx | (sx << 1)) & 1431655765 AS sx, "
            "(sy | (sy << 1)) & 1431655765 AS sy FROM z3), "
            "zz AS (SELECT x, y, (sx | (sy << 1)) >> 20 AS cell FROM z4) "
            "SELECT cell, CAST(COUNT(*) AS BIGINT) AS n, "
            "MIN(x) AS min_x, MAX(x) AS max_x, "
            "MIN(y) AS min_y, MAX(y) AS max_y FROM zz GROUP BY cell"
        ),
        # quantized RRF (Cormack et al. 2009): score = Σ 10^9 // (60 + r)
        # over two per-type top-50 rankings (amount cents, recency) — pure
        # int64 scores, fused top-10 per type, doc-asc tiebreak both sides
        "rank_fusion": (
            "WITH e AS (SELECT event_id, event_type, ts, "
            "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events), "
            "ra AS (SELECT event_type, event_id, ROW_NUMBER() OVER "
            "(PARTITION BY event_type ORDER BY c DESC, event_id) AS r FROM e), "
            "rb AS (SELECT event_type, event_id, ROW_NUMBER() OVER "
            "(PARTITION BY event_type ORDER BY ts DESC, event_id) AS r FROM e), "
            "u AS (SELECT event_type, event_id, 1000000000 // (60 + r) AS s "
            "FROM ra WHERE r <= 50 "
            "UNION ALL SELECT event_type, event_id, 1000000000 // (60 + r) "
            "FROM rb WHERE r <= 50), "
            "f AS (SELECT event_type, event_id, SUM(s) AS s FROM u "
            "GROUP BY event_type, event_id) "
            "SELECT event_type, event_id, score, rn FROM ("
            "SELECT event_type, event_id, CAST(s AS BIGINT) AS score, "
            "ROW_NUMBER() OVER (PARTITION BY event_type "
            "ORDER BY s DESC, event_id) AS rn FROM f) WHERE rn <= 10"
        ),
        # integer-cents running sum (order-independent, same discipline as
        # pricing_summary); gap_us -1 sentinel instead of a nullable int
        # that pandas would float
        "running_totals": (
            "SELECT event_id, user_id, ts, "
            "ROW_NUMBER() OVER w AS rn, "
            "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)/100 "
            "AS run_sum, "
            "COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "behavior_archetypes": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events "
            "WHERE user_id IS NOT NULL), "
            "s AS (SELECT user_id, string_agg(event_type, ',' "
            "ORDER BY event_type) AS a FROM d GROUP BY user_id) "
            "SELECT a AS archetype, CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM s GROUP BY a"
        ),
        "group_string_agg": (
            "SELECT user_id, string_agg(event_type, ',' ORDER BY ts, "
            "event_id) AS agg, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events WHERE user_id IS NOT NULL GROUP BY user_id"
        ),
        "rolling_window_sum": (
            "SELECT event_id, user_id, ts, "
            "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)"
            "/100 AS win_sum, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS win_n "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
        ),
        "time_range_sum": (
            # RANGE window: ORDER BY ts alone (peers share the sum), the
            # tiebreak-independence the engine mirrors by construction
            "SELECT event_id, user_id, ts, "
            "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)"
            "/100 AS win_sum, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS win_n "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING AND CURRENT ROW)"
        ),
        "basket_lift": (
            # baskets = distinct (user, day); lift flag = pure-integer
            # cross-multiply t_den·n_ab·N > t_num·n_a·n_b (11/10)
            "WITH b AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day, event_type AS it "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "AND event_type IS NOT NULL), "
            "nb AS (SELECT COUNT(*) AS n FROM "
            "(SELECT DISTINCT user_id, day FROM b)), "
            "ia AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM b GROUP BY it), "
            "p AS (SELECT x.it AS a, y.it AS b2, "
            "CAST(COUNT(*) AS BIGINT) AS nab FROM b x JOIN b y "
            "ON x.user_id = y.user_id AND x.day = y.day AND x.it < y.it "
            "GROUP BY 1, 2) "
            "SELECT p.a AS item_a, p.b2 AS item_b, i1.n AS n_a, "
            "i2.n AS n_b, p.nab AS n_ab, CAST(nb.n AS BIGINT) AS n_baskets, "
            "CAST(CASE WHEN 10 * p.nab * nb.n > 11 * i1.n * i2.n "
            "THEN 1 ELSE 0 END AS BIGINT) AS lifted "
            "FROM p JOIN ia i1 ON i1.it = p.a "
            "JOIN ia i2 ON i2.it = p.b2, nb"
        ),
        "ks_distance": (
            # D·n_a·n_b = max_v |cum_a·n_b − cum_b·n_a| in HUGEINT;
            # argmax ties break to the smallest value on both engines
            "WITH e AS (SELECT event_id % 2 AS side, "
            "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events), "
            "h AS (SELECT c, SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS na, "
            "SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS nb "
            "FROM e GROUP BY c), "
            "t AS (SELECT SUM(na) AS ta, SUM(nb) AS tb FROM h), "
            "cum AS (SELECT c, SUM(na) OVER w AS ca, SUM(nb) OVER w AS cb "
            "FROM h WINDOW w AS (ORDER BY c ROWS UNBOUNDED PRECEDING)), "
            "g AS (SELECT c, abs(ca * t.tb - cb * t.ta) AS gap FROM cum, t), "
            "emd AS (SELECT SUM(gap * (nxt - c)) AS e FROM (SELECT c, gap, "
            "LEAD(c) OVER (ORDER BY c) AS nxt FROM g) WHERE nxt IS NOT NULL) "
            # empty-side parity: the kernel's documented sentinel is
            # (d_num -1, at_cents 0, emd_num -1.0) whenever a side is empty
            "SELECT CAST(COALESCE(t.ta, 0) AS BIGINT) AS n_a, "
            "CAST(COALESCE(t.tb, 0) AS BIGINT) AS n_b, "
            "CAST(CASE WHEN COALESCE(t.ta, 0) = 0 OR COALESCE(t.tb, 0) = 0 "
            "THEN -1 ELSE (SELECT MAX(gap) FROM g) END AS BIGINT) AS d_num, "
            "CAST(CASE WHEN COALESCE(t.ta, 0) = 0 OR COALESCE(t.tb, 0) = 0 "
            "THEN 0 ELSE (SELECT MIN(c) FROM g WHERE gap = "
            "(SELECT MAX(gap) FROM g)) END AS BIGINT) AS at_cents, "
            "CAST(CASE WHEN COALESCE(t.ta, 0) = 0 OR COALESCE(t.tb, 0) = 0 "
            "THEN -1.0 ELSE (SELECT COALESCE(e, 0) FROM emd) END AS DOUBLE) "
            "AS emd_num FROM t"
        ),
        "spearman_corr": (
            # doubled average ranks (2·RANK() + tie count − 1 is the
            # integer double of the average rank) keep every moment int64
            "WITH e AS (SELECT user_id AS k, epoch_us(ts) AS x, "
            "CAST(ROUND(value * 100) AS BIGINT) AS y FROM events), "
            "r AS (SELECT k, "
            "2*RANK() OVER (PARTITION BY k ORDER BY x) "
            "+ COUNT(*) OVER (PARTITION BY k, x) - 1 AS ax, "
            "2*RANK() OVER (PARTITION BY k ORDER BY y) "
            "+ COUNT(*) OVER (PARTITION BY k, y) - 1 AS ay FROM e) "
            "SELECT k AS user_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*)*SUM(ax*ay) - SUM(ax)*SUM(ay) AS BIGINT) AS num, "
            "CAST(COUNT(*)*SUM(ax*ax) - SUM(ax)*SUM(ax) AS BIGINT) AS den_x, "
            "CAST(COUNT(*)*SUM(ay*ay) - SUM(ay)*SUM(ay) AS BIGINT) AS den_y "
            "FROM r GROUP BY k"
        ),
        "theil_sen_trend": (
            # lower median of exact-cent / exact-microsecond slope doubles;
            # the rank pick is tie-safe because equal ranks hold equal bits
            "WITH e AS (SELECT user_id AS k, ts, "
            "CAST(ROUND(value * 100) AS BIGINT) AS c FROM events), "
            "p AS (SELECT a.k, CAST(b.c - a.c AS DOUBLE) / "
            "CAST(epoch_us(b.ts) - epoch_us(a.ts) AS DOUBLE) AS slope "
            "FROM e a JOIN e b ON a.k = b.k AND a.ts < b.ts), "
            "r AS (SELECT k, slope, ROW_NUMBER() OVER (PARTITION BY k "
            "ORDER BY slope) AS rk, COUNT(*) OVER (PARTITION BY k) AS np "
            "FROM p) "
            "SELECT k AS user_id, CAST(np AS BIGINT) AS n_pairs, slope "
            "FROM r WHERE rk = (np + 1) // 2"
        ),
        "locf_fill": (
            # filled values are bit-copies of input floats, so the float
            # column is hash-safe; leading nulls coalesce to the sentinel
            "WITH e AS (SELECT event_id, user_id, ts, "
            "CASE WHEN event_id % 7 < 3 THEN NULL ELSE value END AS v "
            "FROM events) "
            "SELECT event_id, user_id, ts, "
            "COALESCE(LAST_VALUE(v IGNORE NULLS) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0) "
            "AS value, "
            "CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled "
            "FROM e"
        ),
        "conversion_lag_histogram": (
            # lag is nonneg by the asof condition, so // floor == trunc
            "WITH j AS (SELECT l.ts AS lts, r.ts AS rts FROM "
            "(SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase') l "
            "ASOF LEFT JOIN (SELECT user_id, ts FROM events "
            "WHERE event_type = 'signup') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts) "
            "SELECT CAST(LEAST((epoch_us(lts) - epoch_us(rts)) "
            "// 3600000000, 48) AS BIGINT) AS lag_h, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM j WHERE rts IS NOT NULL GROUP BY 1"
        ),
        "asof_join": (
            "SELECT l.event_id, l.user_id, l.ts, r.ts AS r_ts_copy "
            "FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l "
            "ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
    }
