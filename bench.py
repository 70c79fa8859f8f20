#!/usr/bin/env python
"""Benchmark harness.

Headline: flagship sketch-build throughput (docs/sec) over a deterministic
cached synthetic page corpus (BASELINE.json input shape), plus per-pipeline
timings over $GRAFT_SF_DIR tables.

    python bench.py             # one JSON line on stdout
    python bench.py --scaling   # same pipeline at two parallelism levels in
                                # fresh processes; reports scaling efficiency
    python bench.py --stats     # per-operator ds.stats() for the headline

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32),
BENCH_PAGES_ROWS (default 1000000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "1000000"))
PAGES_DIR = f"/tmp/fever_ray_pages/bench_{PAGES_ROWS}"


EVENTS3M_DIR = "/tmp/fever_ray_pages/bench_events3m"
QUOTES3M_DIR = "/tmp/fever_ray_pages/bench_quotes3m"


def _ensure_events3m():
    """Deterministic 3M-event / 300k-key corpus (+600k-row quote side for
    the as-of join), cached as 32 parquet shards each."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(EVENTS3M_DIR) and os.path.isdir(QUOTES3M_DIR):
        return
    rng = np.random.default_rng(77)
    n, keys, span_us = 3_000_000, 300_000, 30 * 86_400_000_000

    def write(dir_, tbl, files=32):
        os.makedirs(dir_ + ".tmp", exist_ok=True)
        step = tbl.num_rows // files
        for i in range(files):
            lo = i * step
            hi = tbl.num_rows if i == files - 1 else lo + step
            pq.write_table(tbl.slice(lo, hi - lo), f"{dir_}.tmp/p{i:02d}.parquet")
        os.rename(dir_ + ".tmp", dir_)

    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, keys, n), pa.int64()),
            "ts": pa.array(rng.integers(0, span_us, n), pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    write(EVENTS3M_DIR, ev)
    m = 600_000
    qt = pa.table(
        {
            "user_id": pa.array(rng.integers(0, keys, m), pa.int64()),
            "ts": pa.array(rng.integers(0, span_us, m), pa.int64()).cast(
                pa.timestamp("us")
            ),
            "price": pa.array(
                rng.integers(0, 10_000, m).astype(np.float64) / 100.0
            ),
        }
    )
    write(QUOTES3M_DIR, qt)


def _ensure_pages():
    from fever_ray.gen.pages import ensure_pages

    ensure_pages(
        PAGES_DIR,
        n_rows=PAGES_ROWS,
        n_files=64,
        seed=42,
        ioc_hosts=("evil0.example.com", "evil1.example.net"),
        ioc_paths=("/oddlyspecific/implant.html",),
        ioc_frac=0.005,
    )


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    # drop lingering ObjectRefs promptly between entries: long sessions
    # otherwise accumulate object-store state (measured 1.5-2x late-session
    # inflation on the heavy entries)
    import gc

    gc.collect()
    return round(dt, 4)


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    import fever_ray.ops.aggregates as agg
    import fever_ray.ops.relational as rel
    from fever_ray.ops.dedup import (
        exact_dedup,
        minhash_candidate_pairs,
        minhash_dedup_components,
    )
    from fever_ray.ops.knn import knn_bruteforce
    from fever_ray.pipelines.flagship import run_flagship
    from fever_ray.sketches.bloom import BloomFilter

    _ensure_pages()

    # warm-up: page cache AND worker processes (each Ray worker imports
    # fever_ray/pyarrow/numpy on its first UDF — a fixed startup cost that
    # would otherwise be billed to the first timed pipeline)
    rd.read_parquet(PAGES_DIR + "/").count()
    run_flagship(PAGES_DIR, batch_size=8192, extract=True)  # untimed warm run

    timings: dict[str, float] = {}

    # headline: flagship sketch suite over pages (one streaming pass,
    # extract=True = the production path recomputing text from html).
    # best-of-N to damp scheduler/object-store noise on a shared box.
    repeats = int(os.environ.get("BENCH_REPEATS", "1"))
    onb = 64 if PAGES_ROWS >= 500_000 else None
    headline = min(
        _timed(lambda: run_flagship(PAGES_DIR, batch_size=8192, extract=True,
                                    override_num_blocks=onb))
        for _ in range(max(repeats, 1))
    )
    timings["flagship_sketches"] = round(headline, 4)

    if os.environ.get("BENCH_ONLY_HEADLINE"):
        return {
            "metric": "flagship_pages_sketch_build_sec",
            "value": round(headline, 4),
            "unit": "sec",
            "queries": timings,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "pages_rows": PAGES_ROWS,
            "docs_per_sec": int(PAGES_ROWS / headline),
        }

    # sketch cube: one pass of per-(lang, day) HLL partials over 1M pages,
    # every coarser rollup (per lang / per day / global distinct urls)
    # derived by merging the finest-grain payloads — the OLAP-lattice trick
    # at the data scale where exact COUNT(DISTINCT) per granularity would
    # each cost a full shuffle
    def _sketch_cube():
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from fever_ray.core.grouped import grouped_build
        from fever_ray.core.udaf import SketchSpec
        from fever_ray.sketches import sketch_from_bytes

        def derive(b):
            day = (
                pc.cast(pc.cast(b.column("warc_ts"), pa.timestamp("us")), pa.int64())
                .to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            lang = b.column("lang").to_numpy(zero_copy_only=False).astype(str)
            cell = np.char.add(np.char.add(lang, "|"), day.astype(str))
            return pa.table(
                {"cell": pa.array(cell, pa.string()), "url": b.column("url")}
            )

        ds = rd.read_parquet(
            PAGES_DIR + "/", columns=["lang", "warc_ts", "url"]
        ).map_batches(derive, batch_format="pyarrow")
        spec = SketchSpec("hll_urls", "hll", "url", {"p": 12})
        cells = grouped_build(ds, "cell", spec).take_all()
        rollup: dict = {}
        for r in cells:
            for g in (r["key"].split("|", 1)[0], "day:" + r["key"].split("|", 1)[1], "all"):
                sk = sketch_from_bytes("hll", r["payload"])
                if g in rollup:
                    rollup[g].merge(sk)
                else:
                    rollup[g] = sk
        return {g: rollup[g].estimate() for g in rollup}

    timings["sketch_cube_1m_pages"] = _timed(_sketch_cube)

    # quantile card: all four quantile sketches (kll/tdigest/req/dd) over
    # text byte length in ONE streaming UDAF pass — the cli `quantiles` face
    def _quantile_card():
        import pyarrow as pa
        import pyarrow.compute as pc

        from fever_ray.core.udaf import SketchSpec, build_sketches

        def derive(b):
            v = pc.binary_length(pc.fill_null(b.column("text"), ""))
            return pa.table({"v": pc.cast(v, pa.float64())})

        ds = rd.read_parquet(PAGES_DIR + "/", columns=["text"]).map_batches(
            derive, batch_format="pyarrow"
        )
        sk = build_sketches(
            ds,
            [
                SketchSpec("kll", "kll", "v", {"k": 200}, value_kind="float"),
                SketchSpec("tdigest", "tdigest", "v", {"delta": 100}, value_kind="float"),
                SketchSpec("req", "req", "v", {"k": 32}, value_kind="float"),
                SketchSpec("dd", "dd", "v", {"alpha": 0.01}, value_kind="float"),
            ],
        )
        return {n: sk[n].quantile(0.999) for n in sk}

    timings["quantile_card_1m_pages"] = _timed(_quantile_card)

    # IoC matcher over pages (stateless tasks + per-process filter cache)
    from fever_ray.ops.ioc import make_page_ioc_fn

    bf = BloomFilter.initialize(100000, 1e-7)
    bf.add(["evil0.example.com", "evil1.example.net", "/oddlyspecific/implant.html"])
    ioc_fn = make_page_ioc_fn(bf.to_bytes())
    timings["ioc_match"] = _timed(
        lambda: rd.read_parquet(PAGES_DIR + "/", columns=["url"])
        .map_batches(ioc_fn, batch_format="pyarrow", batch_size=16384)
        .materialize()
    )

    # events / lineitem / documents pipelines at GRAFT_SF_DIR
    ev = lambda cols=None: rd.read_parquet(f"{SF_DIR}/events.parquet", columns=cols)  # noqa: E731
    timings["event_profiler"] = _timed(
        lambda: agg.event_profiler(ev(["event_type", "props"])).materialize()
    )
    timings["pdns_collector"] = _timed(
        lambda: agg.pdns_collector(ev(["event_type", "user_id", "ts"])).materialize()
    )
    timings["pricing_summary"] = _timed(
        lambda: rel.pricing_summary(
            rd.read_parquet(
                f"{SF_DIR}/lineitem.parquet",
                columns=[
                    "l_returnflag",
                    "l_linestatus",
                    "l_quantity",
                    "l_extendedprice",
                    "l_discount",
                    "l_shipdate",
                ],
            )
        ).materialize()
    )
    timings["exact_dedup"] = _timed(
        lambda: exact_dedup(
            rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        ).materialize()
    )
    timings["minhash_candidates"] = _timed(
        lambda: minhash_candidate_pairs(
            rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        ).materialize()
    )

    # full MinHash-LSH near-dedup candidates over the 1M-page corpus
    import numpy as np
    from fever_ray.sketches.hashing import hash64

    def _pages_docs():
        import pyarrow as pa

        return rd.read_parquet(PAGES_DIR + "/", columns=["url", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), type=pa.int64()
                    ),
                    "text": b.column("text"),
                }
            ),
            batch_format="pyarrow",
        )

    # FULL near-dedup: candidates → distributed Jaccard verify (bucketed
    # joins) → distributed connected components.  No driver-side text state.
    timings["near_dedup_pages"] = _timed(
        lambda: minhash_dedup_components(
            _pages_docs(), threshold=0.7, num_partitions=min(NUM_CPUS, 32)
        ).materialize()
    )

    import numpy as np
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    queries = np.vstack([np.asarray(v) for v in emb.column("embedding").to_pylist()[:8]])
    timings["knn_bruteforce"] = _timed(
        lambda: knn_bruteforce(
            rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]),
            queries,
            k=10,
        ).materialize()
    )

    # windows / sessions / text analysis breadth (same sf tables)
    from fever_ray.ops.dedup import embedding_dup_pairs
    from fever_ray.ops.textstats import LangId
    from fever_ray.ops.windows import hopping_window, sessionize, tumbling_window

    timings["tumbling_window"] = _timed(
        lambda: tumbling_window(ev(["ts", "event_type", "value"])).materialize()
    )
    timings["hopping_window"] = _timed(
        lambda: hopping_window(
            ev(["ts", "event_type", "value"]), size_s=3600, step_s=900
        ).materialize()
    )
    timings["sessionize"] = _timed(
        lambda: sessionize(ev(["user_id", "ts"]), gap_s=1800).materialize()
    )

    # high-cardinality window ops at 3M rows / 300k keys — the shape where
    # a per-key map_groups would pay per-group sort-shuffle + Python call;
    # both ride ONE coarse key-hash bucket shuffle + vectorized run scans
    _ensure_events3m()
    timings["sessionize_3m_events"] = _timed(
        lambda: sessionize(
            rd.read_parquet(EVENTS3M_DIR + "/", columns=["user_id", "ts"]),
            gap_s=1800,
        ).materialize()
    )
    from fever_ray.ops.windows import asof_join

    timings["asof_3m_events"] = _timed(
        lambda: asof_join(
            rd.read_parquet(EVENTS3M_DIR + "/", columns=["user_id", "ts", "event_id"]),
            rd.read_parquet(QUOTES3M_DIR + "/"),
            key="user_id",
        ).materialize()
    )
    # range join at the same 3M/300k-key scale: every quote within ±5
    # minutes of each event, auto-sized buckets (r4: no fixed-16 default)
    from fever_ray.ops.windows import interval_join

    timings["interval_3m_events"] = _timed(
        lambda: interval_join(
            rd.read_parquet(EVENTS3M_DIR + "/", columns=["user_id", "ts", "event_id"]),
            rd.read_parquet(QUOTES3M_DIR + "/", columns=["user_id", "ts", "price"]),
            key="user_id",
            lo=-300_000_000,
            hi=300_000_000,
        ).materialize()
    )
    timings["lang_id"] = _timed(
        lambda: rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 8))
        .materialize()
    )
    timings["embedding_dups"] = _timed(
        lambda: embedding_dup_pairs(
            rd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]),
            threshold=0.9,
        ).materialize()
    )

    # corpus curation over the full page corpus: exact repetition stats +
    # keep/drop decision per page; text is dropped before materialize so
    # only the decision columns hit the object store
    from fever_ray.ops.curate import curation_filter

    timings["curate_pages"] = _timed(
        lambda: curation_filter(
            rd.read_parquet(PAGES_DIR + "/", columns=["url", "text"]),
            min_tokens=20,
            max_dup_ratio=0.8,
            max_top_frac=0.3,
        )
        .map_batches(
            lambda b: b.select(["url", "n_tokens", "dup_token_ratio", "keep"]),
            batch_format="pyarrow",
        )
        .materialize()
    )

    from fever_ray.ops.textstats import top_ngrams
    from fever_ray.ops.windows import window_distinct

    # exact bigram top-k over the documents table.  NOT the 1M-page corpus:
    # the synthetic page text draws words UNIFORMLY (no Zipf head), so its
    # bigram vocabulary is ~#occurrences and per-batch partials can't
    # compress — that run (59 s) measures a worst-case string shuffle, not
    # the operator; real web text is Zipfian and compresses per batch
    timings["top_ngrams"] = _timed(
        lambda: top_ngrams(
            rd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]),
            n=2,
            k=20,
        ).materialize()
    )
    timings["window_distinct"] = _timed(
        lambda: window_distinct(ev(["ts", "user_id"]), size_s=3600).materialize()
    )

    # new-op scale proofs over the full page corpus: corpus-wide duplicate-
    # line scrub (pages are one line each → measures the line-count shuffle
    # + broadcast membership at 1M lines) and the deterministic token-budget
    # trim (skinny histogram passes + one boundary-bucket sort)
    from fever_ray.ops.dedup import line_dedup
    from fever_ray.ops.trainprep import token_budget_select

    # match='hash' is the web-scale configuration (8-byte keys shuffle, not
    # line text) — the exact-string mode is gate-checked at sf0.01 instead
    timings["line_dedup_pages"] = _timed(
        lambda: line_dedup(
            _pages_docs(), threshold=1, match="hash", broadcast_bytes=512 << 20
        ).materialize()
    )
    timings["token_budget_pages"] = _timed(
        lambda: token_budget_select(
            _pages_docs(), budget=5_000_000, seed=1, n_buckets=256
        ).materialize()
    )

    # per-host boilerplate scrub at 1M pages: distinct-(host,line) partial
    # shuffle + two-stage bucketed combine + broadcast membership scrub.
    # match='hash' is the web-scale configuration (8-byte keys shuffle, not
    # line text — 7.7 s vs 10.1 s exact here); the gate checks exact-string
    # mode at sf0.001/0.01/0.1 and pytest asserts hash == exact output
    from fever_ray.ops.dedup import host_boilerplate
    from fever_ray.ops.extract import hostname_of

    def _pages_hosted():
        return rd.read_parquet(PAGES_DIR + "/", columns=["url", "text"]).map_batches(
            lambda b: b.append_column("host", hostname_of(b.column("url"))),
            batch_format="pyarrow",
        )

    timings["host_boilerplate_pages"] = _timed(
        lambda: host_boilerplate(
            _pages_hosted(), host_col="host", id_col="url", match="hash",
            broadcast_bytes=512 << 20,
        ).materialize()
    )

    # incremental-ingest cross dedup: the 1M-page corpus against its own
    # first shard as the "already ingested" reference — measures the full
    # bloom build + probe + exact-verify path at corpus scale
    from fever_ray.ops.dedup import bloom_cross_dedup

    def _first_shard_docs():
        import glob as _glob

        import pyarrow as pa

        first = sorted(_glob.glob(os.path.join(PAGES_DIR, "*.parquet")))[0]
        return rd.read_parquet(first, columns=["url", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), type=pa.int64()
                    ),
                    "text": b.column("text"),
                }
            ),
            batch_format="pyarrow",
        )

    timings["bloom_cross_dedup_pages"] = _timed(
        lambda: bloom_cross_dedup(
            _pages_docs(), _first_shard_docs(), p=1e-3
        ).materialize()
    )

    # exact substring-window duplication profile at corpus scale (~52M
    # 8-token windows): match='hash' is the web-scale configuration (8-byte
    # window keys shuffle); exact-string mode is gate-checked at sf0.01
    from fever_ray.ops.dedup import dup_ngram_windows

    timings["dup_ngram_pages"] = _timed(
        lambda: dup_ngram_windows(
            _pages_docs(), n=8, match="hash", num_partitions=max(NUM_CPUS * 4, 64)
        ).materialize()
    )

    # broadcast linear-classifier scoring over the full corpus (model LUT
    # per actor, one vectorized hashed-BoW pass per batch, no shuffle)
    from fever_ray.ops.mlscore import linear_score

    timings["linear_score_pages"] = _timed(
        lambda: linear_score(_pages_docs()).materialize()
    )

    # fuzzy incremental dedup: corpus vs its first shard as the "already
    # ingested" reference, through the full minhash band/verify machinery
    # (ids made nonnegative by dropping the hash sign bit)
    from fever_ray.ops.dedup import minhash_cross_dedup

    def _nonneg(ds):
        import pyarrow as pa

        def f(b):
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            nn = (ids.view(np.uint64) >> np.uint64(1)).view(np.int64)
            return b.set_column(
                b.schema.get_field_index("doc_id"), "doc_id",
                pa.array(nn, pa.int64()),
            )

        return ds.map_batches(f, batch_format="pyarrow")

    timings["minhash_cross_dedup_pages"] = _timed(
        lambda: minhash_cross_dedup(
            _nonneg(_pages_docs()), _nonneg(_first_shard_docs()),
            n_parts=max(NUM_CPUS * 4, 64),
        ).materialize()
    )

    # SemDeDup at corpus scale: 1M 64-dim unit vectors synthesized
    # deterministically from the url hash (splitmix stream per doc), 256
    # clusters, slab-blocked within-cluster near-dup drop
    from fever_ray.ops.cluster import semdedup
    from fever_ray.sketches.hashing import splitmix64

    def _pages_embeddings():
        import pyarrow as pa

        def f(b):
            ids = hash64(b.column("url"))
            n = len(ids)
            # 64 splitmix lanes per doc -> approx-gaussian via centered
            # uint mapping; unit-normalized
            lanes = np.empty((n, 64), dtype=np.float64)
            x = ids.copy()
            for j in range(64):
                x = splitmix64(x ^ np.uint64(j + 1))
                lanes[:, j] = (x.astype(np.float64) / 2**64) - 0.5
            lanes /= np.maximum(np.linalg.norm(lanes, axis=1), 1e-12)[:, None]
            return pa.table(
                {
                    "vec_id": pa.array(
                        (ids >> np.uint64(1)).view(np.int64), pa.int64()
                    ),
                    "embedding": pa.ListArray.from_arrays(
                        pa.array(np.arange(0, (n + 1) * 64, 64, dtype=np.int32)),
                        pa.array(lanes.reshape(-1).astype(np.float32)),
                    ),
                }
            )

        return rd.read_parquet(PAGES_DIR + "/", columns=["url"]).map_batches(
            f, batch_format="pyarrow"
        )

    # k scales with corpus (the SemDeDup contract: per-cluster pairwise
    # work is quadratic in cluster size — 1M vectors want ~1k clusters)
    timings["semdedup_1m_vectors"] = _timed(
        lambda: semdedup(_pages_embeddings(), k=1024, threshold=0.9).materialize()
    )

    # daily host leaderboard over the crawl (windows x counts x top-k in
    # one shuffle of per-batch partial counts)
    from fever_ray.ops.extract import hostname_of
    from fever_ray.ops.windows import window_top_k

    def _page_events():
        import pyarrow as pa
        import pyarrow.compute as pc

        def f(b):
            hosts = hostname_of(b.column("url"))
            return pa.table(
                {
                    "ts": pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    "host_id": pa.array(
                        hash64(hosts).view(np.int64), pa.int64()
                    ),
                }
            )

        return rd.read_parquet(
            PAGES_DIR + "/", columns=["url", "warc_ts"]
        ).map_batches(f, batch_format="pyarrow")

    timings["window_top_hosts"] = _timed(
        lambda: window_top_k(
            _page_events(), key_col="host_id", size_s=86400, k=10
        ).materialize()
    )

    # robust Theil-Sen trend over 1M crawl events on a 100k-key entity id
    # (~10 events/key → ~45M exact pairwise slopes corpus-wide); the
    # Zipf HOST key would be all-pairs-infeasible by design — the op's
    # loud max_events_per_key guard exists exactly for that shape
    from fever_ray.ops.windows import theil_sen_trend

    def _valued_events():
        import pyarrow as pa
        import pyarrow.compute as pc

        def f(b):
            h = hash64(b.column("url"))
            return pa.table(
                {
                    "event_id": pa.array(h.view(np.int64), pa.int64()),
                    "ts": pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    "entity_id": pa.array(
                        (h % np.uint64(100_000)).astype(np.int64), pa.int64()
                    ),
                    "value": pa.array(
                        ((h >> np.uint64(8)) % np.uint64(10000)).astype(
                            np.float64
                        )
                        / 100.0,
                        pa.float64(),
                    ),
                }
            )

        return rd.read_parquet(
            PAGES_DIR + "/", columns=["url", "warc_ts"]
        ).map_batches(f, batch_format="pyarrow")

    timings["theil_sen_1m_events"] = _timed(
        lambda: theil_sen_trend(
            _valued_events(), key="entity_id", max_events_per_key=4096,
        ).materialize()
    )

    # exact Spearman moments over the same 1M-event / 100k-key shape:
    # two rank lexsorts per bucket instead of the all-pairs slope set
    from fever_ray.ops.windows import spearman_corr

    timings["spearman_1m_events"] = _timed(
        lambda: spearman_corr(
            _valued_events(), key="entity_id", max_events_per_key=8192,
        ).materialize()
    )

    # unigram LM-surprise scoring: model from the first shard, every page
    # scored (vocab tree-sum + broadcast LUT + one segment-sum pass)
    from fever_ray.ops.textstats import unigram_logloss

    timings["unigram_logloss_pages"] = _timed(
        lambda: unigram_logloss(
            _pages_docs(), _first_shard_docs()
        ).materialize()
    )

    # bigram LM with unigram backoff: two vocab passes + one scoring pass;
    # the per-batch cost over unigram is one extra dictionary-encode probe
    from fever_ray.ops.textstats import bigram_logloss

    timings["bigram_logloss_pages"] = _timed(
        lambda: bigram_logloss(
            _pages_docs(), _first_shard_docs()
        ).materialize()
    )

    # exact global NTILE over page token counts (histogram-prefix ranks,
    # one skinny hash-of-cell shuffle — no global sort)
    from fever_ray.ops.curate import _token_counts
    from fever_ray.ops.stats import quantile_bucket

    timings["quantile_bucket_pages"] = _timed(
        lambda: quantile_bucket(
            _pages_docs().map_batches(
                lambda b: _token_counts(b, "text", "doc_id"),
                batch_format="pyarrow",
            ),
            "n_tokens",
            k=10,
            seed=3,
        ).materialize()
    )

    # recency-decayed host leaderboard (power-of-2 integer decay, partial
    # sums through the coalesce-tree, no sort shuffle)
    from fever_ray.ops.windows import decayed_counts

    timings["decayed_hosts"] = _timed(
        lambda: decayed_counts(
            _page_events(),
            ref_ts="2024-03-01T00:00:00",
            key_col="host_id",
            half_life_s=7 * 86400,
            top_k=100,
        ).materialize()
    )

    # asymmetric containment dedup (rare-shingle candidates + integer
    # cross-multiply verify) — the doc-inside-doc axis at corpus scale
    from fever_ray.ops.dedup import containment_pairs

    timings["containment_pages"] = _timed(
        lambda: containment_pairs(
            _pages_docs(), num_partitions=max(NUM_CPUS * 4, 64)
        ).materialize()
    )

    # per-host event-sequence transition matrix over the crawl timeline
    from fever_ray.ops.windows import transition_counts

    def _page_seq_events():
        import pyarrow as pa
        import pyarrow.compute as pc

        def f(b):
            hosts = hostname_of(b.column("url"))
            ids = hash64(b.column("url")).view(np.int64)
            return pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(
                        hash64(hosts).view(np.int64), pa.int64()
                    ),
                    "ts": pc.cast(b.column("warc_ts"), pa.timestamp("us")),
                    "event_type": b.column("lang"),
                }
            )

        return rd.read_parquet(
            PAGES_DIR + "/", columns=["url", "warc_ts", "lang"]
        ).map_batches(f, batch_format="pyarrow")

    timings["transition_counts_pages"] = _timed(
        lambda: transition_counts(
            _page_seq_events(), num_partitions=max(NUM_CPUS * 2, 32)
        ).materialize()
    )

    # per-doc corpus-unique shingle counts (the diversity dual of dedup —
    # same posting-exchange movement budget as containment_pages)
    from fever_ray.ops.textstats import ngram_novelty

    timings["ngram_novelty_pages"] = _timed(
        lambda: ngram_novelty(
            _pages_docs(), num_partitions=max(NUM_CPUS * 4, 64)
        ).materialize()
    )

    # vocabulary spelling-variant pairs (SymSpell deletion neighborhoods;
    # cost is the corpus token-count pass + vocab-scale key explode)
    from fever_ray.ops.editsim import token_edit_dups

    timings["token_edit_dups_pages"] = _timed(
        lambda: token_edit_dups(
            _pages_docs(), max_dist=2, min_count=2,
            num_partitions=max(NUM_CPUS * 2, 32),
        ).materialize()
    )

    # top-32 token association counts (outer-product partials — no pair
    # rows ship, cost ~ one streaming matmul pass)
    from fever_ray.ops.textstats import cooccurrence_counts

    timings["cooccurrence_pages"] = _timed(
        lambda: cooccurrence_counts(_pages_docs(), v=32).materialize()
    )

    # sorted-neighborhood blocking over the full page corpus: skinny
    # prefix-key range-rank (sample splits) + windowed shingle verify —
    # the SNM complement of the minhash candidates above
    from fever_ray.ops.dedup import sorted_neighbor_pairs

    timings["snm_pairs_pages"] = _timed(
        lambda: sorted_neighbor_pairs(
            _pages_docs(), window=4, same_prefix=8,
            num_partitions=min(NUM_CPUS, 32),
        ).materialize()
    )

    # the same SNM blocking over a REALISTIC-vocabulary corpus (50k-token
    # Zipf pool): the default 60-word corpus makes every text prefix
    # collide — the blocking key's worst case — so this entry measures the
    # design, not the degenerate regime (see BASELINE.md for the measured
    # candidate sparsification)
    from fever_ray.gen.pages import ensure_pages as _ep

    vocab_dir = f"/tmp/fever_ray_pages/bench_{PAGES_ROWS}_vocab50k"
    _ep(vocab_dir, n_rows=PAGES_ROWS, n_files=64, seed=42, vocab_size=50_000)

    def _vocab_docs():
        import pyarrow as pa

        return rd.read_parquet(vocab_dir + "/", columns=["url", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), type=pa.int64()
                    ),
                    "text": b.column("text"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    timings["snm_pairs_zipf_pages"] = _timed(
        lambda: sorted_neighbor_pairs(
            _vocab_docs(), window=4, same_prefix=8,
            num_partitions=min(NUM_CPUS, 32),
        ).materialize()
    )

    # the tri-modal code-dedup core at corpus scale: 1M payloads through
    # the pHash actor stage (fake-code path on html payloads — the hash +
    # banding + Hamming-verify machinery is what this measures; the DCT
    # runs only on decodable images) + the shared banded pairing core
    from fever_ray.ops.multimodal import image_phash_pairs

    def _payload_docs():
        import pyarrow as pa

        return rd.read_parquet(PAGES_DIR + "/", columns=["url", "html"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), pa.int64()
                    ),
                    "html": b.column("html"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    timings["phash_dups_pages"] = _timed(
        lambda: image_phash_pairs(
            _payload_docs(), max_hamming=0, batch_size=4096
        ).materialize()
    )

    # SQ8 quantize + signed JL projection of the 1M synthetic vectors
    # (zero-shuffle: two integer-kernel passes over the embedding stream)
    from fever_ray.ops.knn import project_quantized, quantize_embeddings

    timings["quantize_project_1m_vectors"] = _timed(
        lambda: project_quantized(
            quantize_embeddings(_pages_embeddings()), out_dim=16
        ).materialize()
    )

    # PQ/ADC over the same 1M vectors: sample-train 16x256 codebooks,
    # encode to 16-byte codes (m matmuls per batch), ADC top-10 for 3
    # queries (LUT gathers — no float reconstruction); the 10^12-vector
    # index path
    from fever_ray.ops.knn import knn_pq, pq_encode, train_pq_codebooks

    def _pq_pipeline():
        emb = _pages_embeddings()
        books = train_pq_codebooks(emb, m=16, ksub=256, seed=9,
                                   sample_rows=4096)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 64))
        knn_pq(pq_encode(emb, books), q, books, k=10).materialize()

    timings["pq_adc_1m_vectors"] = _timed(_pq_pipeline)

    # two-level IVF-PQ over the same 1M vectors: coarse cells + residual
    # codes; search gathers only probed-cell rows (bytes AND rows bounded)
    from fever_ray.ops.knn import ivfpq_encode, knn_ivfpq, train_ivfpq

    def _ivfpq_pipeline():
        emb = _pages_embeddings()
        cents, books = train_ivfpq(emb, n_centroids=32, m=16, ksub=256,
                                   seed=9, sample_rows=4096)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 64))
        knn_ivfpq(ivfpq_encode(emb, cents, books), q, cents, books,
                  k=10, nprobe=4).materialize()

    timings["ivfpq_adc_1m_vectors"] = _timed(_ivfpq_pipeline)

    # Frequent-Directions covariance sketch of the same 1M vectors in one
    # UDAF pass (KB partials, salted two-phase merge — no data shuffle)
    from fever_ray.core.udaf import SketchSpec, build_sketches as _bs

    timings["fd_sketch_1m_vectors"] = _timed(
        lambda: _bs(
            _pages_embeddings(),
            [SketchSpec("fd", "fd", "embedding", {"l": 64, "d": 64},
                        value_kind="vec")],
        )
    )

    # fully-dynamic distinct urls at 1M pages: build the linear counter
    # over the whole corpus AND over the first shard's "retraction
    # stream" in passes, subtract, estimate — the GDPR/correction-stream
    # shape (distinct counts that honor deletions) end to end
    def _dynamic_distinct():
        from fever_ray.core.udaf import SketchSpec, build_sketches

        # m sized to the ~1M distinct domain (load ~0.5): the documented
        # linear-space price of deletability — 16 MB partials per block,
        # one per input file, tree-merged
        spec = [SketchSpec("lc_urls", "lc", "url", {"m": 1 << 21})]
        full = build_sketches(
            rd.read_parquet(PAGES_DIR + "/", columns=["url"]), spec,
            batch_size=None,
        )["lc_urls"]
        first = sorted(os.listdir(PAGES_DIR))
        first = [f for f in first if f.endswith(".parquet")][0]
        gone = build_sketches(
            rd.read_parquet(os.path.join(PAGES_DIR, first), columns=["url"]),
            spec, batch_size=None,
        )["lc_urls"]
        return full.subtract(gone).estimate()

    timings["dynamic_distinct_pages"] = _timed(_dynamic_distinct)

    # host link graph over the linked variant of the corpus (≤3 planted
    # anchors/page, ~1.5 links/page avg): vectorized href extraction out of
    # raw html + dst-host resolution + bounded-tree exact edge counts —
    # the whole crawl-graph build as one streaming pass
    from fever_ray.gen.pages import ensure_pages as _ensure_linked
    from fever_ray.ops.links import host_links

    links_dir = f"/tmp/fever_ray_pages/bench_{PAGES_ROWS}_links3"
    _ensure_linked(links_dir, n_rows=PAGES_ROWS, n_files=64, seed=42,
                   links_per_page=3)
    timings["link_graph_pages"] = _timed(
        lambda: host_links(
            rd.read_parquet(links_dir + "/", columns=["url", "html"])
        ).materialize()
    )

    docs_per_sec = int(PAGES_ROWS / headline)
    return {
        "metric": "flagship_pages_sketch_build_sec",
        "value": round(headline, 4),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages_rows": PAGES_ROWS,
        "docs_per_sec": docs_per_sec,
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the in-sandbox
    evidence for the N→4N cluster-scaling criterion)."""

    def run(ncpu: int) -> dict:
        # all knobs go to the CHILD env only: the legs now run BEFORE the
        # main suite, so mutating os.environ here would leak best-of-3 /
        # headline-only / 3M-rows into the full-suite run that follows
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_REPEATS="3",
            BENCH_ONLY_HEADLINE="1",
            BENCH_SKIP_SCALING="1",
            # longer runs damp shared-box noise: scale the corpus up for
            # the efficiency measurement (regenerated once, then cached)
            BENCH_PAGES_ROWS=os.environ.get("SCALE_ROWS", "3000000"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo = int(os.environ.get("SCALE_LO", "4"))
    hi = int(os.environ.get("SCALE_HI", "16"))
    r_lo = run(lo)
    r_hi = run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "pages_rows": r_lo["pages_rows"],
    }


def collect_scaling_legs() -> dict | None:
    """Both scaling legs (best-of-3 inside each fresh process) for the
    default bench output, so every round's BENCH artifact carries the
    evidence instead of prose in BASELINE.md.

    Runs BEFORE the main suite (quiet box, no accumulated object-store /
    spill state — the measured 1.5-2x late-session regime).  Always runs a
    FIXED 3 attempts (no acceptance threshold — retry-if-low selection
    biases any reported statistic upward) and reports the MEDIAN attempt as
    the headline ``eff``; every attempt's efficiency is disclosed in
    ``attempt_effs`` and the best in ``best_eff``.  Never allowed to sink
    the main artifact: any failure returns None."""
    attempts: list[dict] = []
    try:
        for _ in range(3):
            attempts.append(run_scaling())
        by_eff = sorted(attempts, key=lambda s: s["scaling_efficiency"])
        med = by_eff[len(by_eff) // 2]
        return {
            "lo": {"cpus": med["cpus_lo"], "sec": med["sec_lo"],
                   "docs_per_sec": med["docs_per_sec_lo"]},
            "hi": {"cpus": med["cpus_hi"], "sec": med["sec_hi"],
                   "docs_per_sec": med["docs_per_sec_hi"]},
            "eff": med["scaling_efficiency"],
            "best_eff": by_eff[-1]["scaling_efficiency"],
            "attempt_effs": [s["scaling_efficiency"] for s in attempts],
            "pages_rows": med["pages_rows"],
        }
    except Exception as e:  # pragma: no cover - defensive
        sys.stderr.write(f"scaling legs failed: {e}\n")
        return None


def run_stats() -> None:
    """Print the flagship pipeline's per-operator ds.stats() breakdown
    (the evidence behind the tuning decisions in DESIGN.md §7)."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from fever_ray.core.udaf import make_merge_fn, make_partials_fn
    from fever_ray.pipelines.flagship import STANDARD_SPECS, make_derive_fn, pages_dataset

    _ensure_pages()
    rd.read_parquet(PAGES_DIR + "/").count()
    derive = make_derive_fn(True)
    ds = pages_dataset(PAGES_DIR, columns=["url", "warc_ts", "html", "lang"],
                       override_num_blocks=64).map_batches(
        derive, batch_format="pyarrow", batch_size=8192)
    pp = ds.map_batches(make_partials_fn(STANDARD_SPECS), batch_format="pyarrow",
                        batch_size=8192)
    f = pp.map_batches(make_merge_fn(STANDARD_SPECS), batch_format="pyarrow",
                       batch_size=64 * len(STANDARD_SPECS))
    f.take_all()
    print(f.stats())

    # crawl-graph build breakdown (href extraction → edge pre-agg → tree)
    from fever_ray.gen.pages import ensure_pages as _el
    from fever_ray.ops.links import host_links

    links_dir = f"/tmp/fever_ray_pages/bench_{PAGES_ROWS}_links3"
    _el(links_dir, n_rows=PAGES_ROWS, n_files=64, seed=42, links_per_page=3)
    g = host_links(rd.read_parquet(links_dir + "/", columns=["url", "html"]))
    g.take_all()
    print("\n=== link_graph_pages ===")
    print(g.stats())
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = run_scaling()
    elif "--stats" in sys.argv:
        run_stats()
        sys.exit(0)
    else:
        # scaling legs FIRST: they must see a quiet box, not one the
        # 48-entry suite just filled with object-store and spill state
        # (the round-3 driver artifact read 0.791 vs five same-day >=0.808
        # builder runs for exactly this reason)
        scaling = None
        if not (
            os.environ.get("BENCH_SKIP_SCALING")
            or os.environ.get("BENCH_ONLY_HEADLINE")
        ):
            scaling = collect_scaling_legs()
        result = run_bench()
        import ray

        ray.shutdown()
        if scaling is not None:
            result["scaling"] = scaling
    print(json.dumps(result))
