"""Order-of-magnitude scale proof: the heavy dedup/curation family at 10M
pages (10× the per-round bench corpus).

Everything the per-round bench gates runs at 1M pages (sf0.1-equivalent);
the 100-TB design claims — `_auto_parts` partition scaling, bucket caps,
the broadcast-vs-join size gates, posting folds — deserve at least one
order-of-magnitude step to show nothing goes quadratic or single-task.
This script generates a 10M-page corpus (parallel seeded shards — same
generator, same schema) and times the heavy family end-to-end, printing
one JSON line per op plus a final summary line:

    python scale_bench.py                # full 10M (default)
    SCALE_ROWS=2000000 python scale_bench.py   # smaller step
    SCALE_OPS=near_dedup,containment python scale_bench.py

Lives next to bench.py (driver-independent; run manually per round and
record the numbers in BASELINE.md).  Owns its Ray session like bench.py.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

ROWS = int(os.environ.get("SCALE_ROWS", "10000000"))
FILES = int(os.environ.get("SCALE_FILES", "256"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
VOCAB = int(os.environ.get("SCALE_VOCAB", "0"))  # 0 = the 60-word default
DIR = (
    f"/tmp/fever_ray_pages/scale_{ROWS}"
    + (f"_vocab{VOCAB}" if VOCAB else "")
)
ONLY = [s for s in os.environ.get("SCALE_OPS", "").split(",") if s]


def ensure_corpus():
    """Parallel shard generation: one Ray task per shard with the same
    per-shard seeds `write_pages` uses (seed + 1000*i), so the corpus is
    byte-identical to a sequential `write_pages` run — just ~NUM_CPUS×
    faster to build."""
    import ray

    from fever_ray.gen.pages import GEN_VERSION

    marker = os.path.join(DIR, "_DONE")
    stamp = (f"version={GEN_VERSION} rows={ROWS} files={FILES} seed=42 "
             f"vocab={VOCAB} scale\n")
    # pre-vocab caches used a stamp without the vocab field; they are
    # exactly the vocab=0 corpus, so accept them rather than regenerate
    legacy = f"version={GEN_VERSION} rows={ROWS} files={FILES} seed=42 scale\n"
    if os.path.exists(marker) and open(marker).read() in (
        stamp, legacy if not VOCAB else None
    ):
        return
    os.makedirs(DIR, exist_ok=True)

    @ray.remote(num_cpus=1)
    def gen_shard(i: int, rows: int) -> str:
        import pyarrow.parquet as pq

        from fever_ray.gen.pages import generate_pages

        t = generate_pages(rows, seed=42 + 1000 * i, vocab_size=VOCAB)
        p = os.path.join(DIR, f"pages-{i:05d}.parquet")
        pq.write_table(t, p)
        return p

    per = ROWS // FILES
    t0 = time.perf_counter()
    refs = [
        gen_shard.remote(i, per if i < FILES - 1 else ROWS - per * (FILES - 1))
        for i in range(FILES)
    ]
    ray.get(refs)
    with open(marker, "w") as fh:
        fh.write(stamp)
    print(
        json.dumps(
            {"op": "generate", "rows": ROWS, "files": FILES,
             "sec": round(time.perf_counter() - t0, 1)}
        ),
        flush=True,
    )


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fever_ray.sketches.hashing import hash64

    ensure_corpus()

    def docs():
        return rd.read_parquet(DIR + "/", columns=["url", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), pa.int64()
                    ),
                    "text": b.column("text"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    def pages():
        return rd.read_parquet(DIR + "/", columns=["url", "text"])

    # one untimed warm pass (worker imports + page cache)
    pages().count()

    results: dict[str, float] = {}

    def run(name: str, fn):
        if ONLY and name not in ONLY:
            return
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        rows = out.count() if hasattr(out, "count") else None
        results[name] = round(dt, 1)
        print(json.dumps({"op": name, "sec": round(dt, 1), "rows": rows}),
              flush=True)
        del out
        gc.collect()

    from fever_ray.ops.dedup import (
        containment_pairs,
        exact_dedup,
        host_boilerplate,
        minhash_cross_dedup,
        minhash_dedup_components,
    )
    from fever_ray.ops.extract import hostname_of

    nparts = min(NUM_CPUS, 32)

    run("exact_dedup", lambda: exact_dedup(docs()).materialize())
    run(
        "near_dedup",
        # full pipeline: candidates → distributed verify → connected
        # components (the bench near_dedup_pages shape)
        lambda: minhash_dedup_components(
            docs(), threshold=0.7, num_partitions=nparts
        ).materialize(),
    )
    run("containment", lambda: containment_pairs(docs()).materialize())
    # candidate-ceiling variant: the exact df-histogram pre-pass tightens
    # the rarity cap so predicted pairs fit a linear 4x-rows budget — the
    # deterministic bound on the 10M step's candidate densification
    run(
        "containment_capped",
        lambda: containment_pairs(
            docs(), max_candidates=4 * ROWS
        ).materialize(),
    )

    def hosted():
        return rd.read_parquet(DIR + "/", columns=["url", "text"]).map_batches(
            lambda b: b.append_column("host", hostname_of(b.column("url"))),
            batch_format="pyarrow",
        )

    run(
        "host_boilerplate",
        lambda: host_boilerplate(
            hosted(), host_col="host", id_col="url", match="hash",
            broadcast_bytes=512 << 20,
        ).materialize(),
    )

    def nonneg(ds):
        # cross-dedup ids must be non-negative (bench's _nonneg shape)
        def f(b):
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            nn = (ids.view(np.uint64) >> np.uint64(1)).view(np.int64)
            return b.set_column(
                b.schema.get_field_index("doc_id"), "doc_id",
                pa.array(nn, pa.int64()),
            )

        return ds.map_batches(f, batch_format="pyarrow")

    def first_shard_docs():
        import glob as _glob

        first = sorted(_glob.glob(DIR + "/pages-*.parquet"))[:8]
        return rd.read_parquet(first, columns=["url", "text"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), pa.int64()
                    ),
                    "text": b.column("text"),
                }
            ),
            batch_format="pyarrow",
        )

    run(
        "minhash_cross",
        lambda: minhash_cross_dedup(
            nonneg(docs()), nonneg(first_shard_docs()),
            n_parts=max(NUM_CPUS * 4, 64),
        ).materialize(),
    )

    # banded-Hamming pairing core at full code scale: one int64 code per
    # row, every even/odd id pair shares a code → ROWS/2 exact-dup pairs
    # out (linear output, the tri-modal media-dedup movement budget)
    from fever_ray.ops.dedup import hamming_code_pairs
    from fever_ray.sketches.hashing import splitmix64 as _smx

    def code_rows():
        def f(b):
            i = b.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "doc_id": pa.array(i, pa.int64()),
                    "code": pa.array(
                        _smx((i >> 1).astype(np.uint64)).view(np.int64),
                        pa.int64(),
                    ),
                }
            )

        return rd.range(ROWS).map_batches(f, batch_format="pyarrow")

    run(
        "hamming_codes",
        lambda: hamming_code_pairs(code_rows(), max_hamming=0).materialize(),
    )

    from fever_ray.ops.trainprep import epoch_shuffle

    run(
        "epoch_shuffle",
        lambda: epoch_shuffle(
            pages().map_batches(
                lambda b: pa.table(
                    {"doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), pa.int64()
                    )}
                ),
                batch_format="pyarrow",
            ),
            seed=1,
        ).materialize(),
    )

    # SemDeDup over synthetic 64-dim unit vectors (bench's splitmix
    # generator, scaled 10×; k scales with the corpus per the SemDeDup
    # quadratic-in-cluster contract)
    from fever_ray.ops.cluster import semdedup
    from fever_ray.sketches.hashing import splitmix64

    def vecs():
        def f(b):
            ids = hash64(b.column("url"))
            n = len(ids)
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

        return rd.read_parquet(DIR + "/", columns=["url"]).map_batches(
            f, batch_format="pyarrow"
        )

    run(
        "semdedup",
        lambda: semdedup(
            vecs(), k=max(256, ROWS // 1000), threshold=0.9
        ).materialize(),
    )

    # broader heavy family (same invocation shapes as bench.py's 1M
    # entries, for the 10×-step ratio table)
    from fever_ray.ops.curate import curation_filter
    from fever_ray.ops.dedup import (
        dup_ngram_windows,
        line_dedup,
        sorted_neighbor_pairs,
    )
    from fever_ray.ops.editsim import token_edit_dups

    run(
        "line_dedup",
        lambda: line_dedup(
            docs(), threshold=1, match="hash", broadcast_bytes=512 << 20
        ).materialize(),
    )
    run(
        "dup_ngram",
        lambda: dup_ngram_windows(
            docs(), n=8, match="hash", num_partitions=max(NUM_CPUS * 4, 64)
        ).materialize(),
    )
    run(
        "token_edit",
        lambda: token_edit_dups(
            docs(), max_dist=2, min_count=2,
            num_partitions=max(NUM_CPUS * 2, 32),
        ).materialize(),
    )
    run(
        "snm",
        lambda: sorted_neighbor_pairs(
            docs(), window=4, same_prefix=8, num_partitions=nparts
        ).materialize(),
    )
    run(
        "curate",
        lambda: curation_filter(
            pages(), min_tokens=20, max_dup_ratio=0.8, max_top_frac=0.3
        )
        .map_batches(
            lambda b: b.select(["url", "n_tokens", "dup_token_ratio", "keep"]),
            batch_format="pyarrow",
        )
        .materialize(),
    )

    # ANN at 10M vectors: SQ8 quantize+project (zero-shuffle integer
    # passes) and the full IVF-PQ train→encode→ADC-query pipeline (the
    # probed-cell-bounded scale path; centroids scale ~√10×)
    from fever_ray.ops.knn import (
        ivfpq_encode,
        knn_ivfpq,
        project_quantized,
        quantize_embeddings,
        train_ivfpq,
    )

    run(
        "quantize_project",
        lambda: project_quantized(
            quantize_embeddings(vecs()), out_dim=16
        ).materialize(),
    )

    def _ivfpq():
        emb = vecs()
        cents, books = train_ivfpq(emb, n_centroids=96, m=16, ksub=256,
                                   seed=9, sample_rows=8192)
        rng = np.random.default_rng(5)
        q = rng.normal(size=(3, 64))
        return knn_ivfpq(ivfpq_encode(emb, cents, books), q, cents, books,
                         k=10, nprobe=4).materialize()

    run("ivfpq_adc", _ivfpq)

    # ---- event-time windows at 10× the bench's 3M-event entries ----
    EV_ROWS = ROWS * 3  # 30M events at the default 10M-page step
    EV_KEYS = EV_ROWS // 10
    EV_DIR = f"/tmp/fever_ray_pages/scale_events_{EV_ROWS}"
    QT_DIR = f"/tmp/fever_ray_pages/scale_quotes_{EV_ROWS}"

    def ensure_events():
        if os.path.isdir(EV_DIR) and os.path.isdir(QT_DIR):
            return

        span_us = 30 * 86_400_000_000

        @ray.remote(num_cpus=1)
        def gen(dir_, i, n, quotes):
            import pyarrow.parquet as pq

            rng = np.random.default_rng(770 + i)
            if quotes:
                t = pa.table(
                    {
                        "user_id": pa.array(
                            rng.integers(0, EV_KEYS, n), pa.int64()
                        ),
                        "ts": pa.array(
                            rng.integers(0, span_us, n), pa.int64()
                        ).cast(pa.timestamp("us")),
                        "price": pa.array(
                            rng.integers(0, 10_000, n).astype(np.float64)
                            / 100.0
                        ),
                    }
                )
            else:
                t = pa.table(
                    {
                        "event_id": pa.array(
                            np.arange(i * n, (i + 1) * n, dtype=np.int64)
                        ),
                        "user_id": pa.array(
                            rng.integers(0, EV_KEYS, n), pa.int64()
                        ),
                        "ts": pa.array(
                            rng.integers(0, span_us, n), pa.int64()
                        ).cast(pa.timestamp("us")),
                    }
                )
            pq.write_table(t, os.path.join(dir_, f"p{i:03d}.parquet"))

        for d, total, quotes in ((EV_DIR, EV_ROWS, False),
                                 (QT_DIR, EV_ROWS // 5, True)):
            os.makedirs(d + ".tmp", exist_ok=True)
            files = 64
            per = total // files
            ray.get([gen.remote(d + ".tmp", i, per, quotes)
                     for i in range(files)])
            os.rename(d + ".tmp", d)

    if not ONLY or {"sessionize", "asof", "interval"} & set(ONLY):
        ensure_events()
        from fever_ray.ops.windows import asof_join, interval_join, sessionize

        run(
            "sessionize",
            lambda: sessionize(
                rd.read_parquet(EV_DIR + "/", columns=["user_id", "ts"]),
                gap_s=1800,
            ).materialize(),
        )
        run(
            "asof",
            lambda: asof_join(
                rd.read_parquet(EV_DIR + "/",
                                columns=["user_id", "ts", "event_id"]),
                rd.read_parquet(QT_DIR + "/"),
                key="user_id",
            ).materialize(),
        )
        run(
            "interval",
            lambda: interval_join(
                rd.read_parquet(EV_DIR + "/",
                                columns=["user_id", "ts", "event_id"]),
                rd.read_parquet(QT_DIR + "/",
                                columns=["user_id", "ts", "price"]),
                key="user_id",
                lo=-300_000_000,
                hi=300_000_000,
            ).materialize(),
        )

    summary = {
        "metric": "scale_10x_heavy_family_sec",
        "rows": ROWS,
        "files": FILES,
        "num_cpus": NUM_CPUS,
        "ops": results,
    }
    print(json.dumps(summary), flush=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
