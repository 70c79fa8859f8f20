"""CLI driver — the ``ray job submit`` entry point.

Mirrors the reference's cascading config idea (fever's viper/cobra YAML+flags,
/root/reference/cmd/fever/cmds/run.go:611-753) with argparse + optional YAML:
flags override YAML override defaults.

Subcommands:
    run        flagship sketch build (optionally checkpointed/resumable)
    follow     daemon-style tail of a growing shard directory
    dedup      MinHash-LSH near-dedup (clusters + representative corpus)
    curate     sample → exact language mix → duplicate-line scrub →
               keep/drop gauntlet → domain cap → parquet
    index      inverted-index build / exact keyword search
    ioc        bloom/IoC matching over a page table
    bloom      build / inspect a DCSO-format bloom filter artifact
    gen        generate a synthetic page corpus

Example (cluster):
    ray job submit --working-dir . -- python -m fever_ray.cli run \
        --input /data/pages --out /data/out --checkpoint /data/ck
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _maybe_yaml(path: str | None) -> dict:
    if not path:
        return {}
    try:
        import yaml  # type: ignore

        with open(path) as fh:
            return yaml.safe_load(fh) or {}
    except ImportError:
        # YAML lib absent: accept JSON config files too
        with open(path) as fh:
            return json.load(fh)


def _parse_weights(spec: str) -> dict:
    """Parse 'en=3,de=1' into {'en': 3, 'de': 1} (integer weights)."""
    out = {}
    for part in spec.split(","):
        if not part:
            continue
        key, _, val = part.partition("=")
        if not key or not val:
            raise SystemExit(f"bad --mix entry {part!r}: expected key=int")
        try:
            w = int(val)
        except ValueError:
            raise SystemExit(f"bad --mix weight {val!r}: expected an integer")
        if w <= 0:
            raise SystemExit(f"bad --mix weight {val!r}: must be positive")
        out[key] = w
    if not out:
        raise SystemExit("--mix must name at least one key=int pair")
    return out


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if os.environ.get("RAY_ADDRESS", "") in ("", "local"):
            kwargs["address"] = "local"
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_run(args) -> int:
    from .pipelines.flagship import run_flagship
    from .sketches.bloom import BloomFilter

    _init_ray(args.num_cpus)
    if getattr(args, "group_by", None):
        # grouped resumable build: per-key distinct-url HLLs, checkpointed
        # per input file (run_partitioned_grouped_build); rerun = resume
        import glob as _glob

        from .core.udaf import SketchSpec, finalize
        from .io_.checkpoint import run_partitioned_grouped_build

        if not args.checkpoint:
            print("--group-by requires --checkpoint", file=sys.stderr)
            return 2
        files = sorted(
            _glob.glob(os.path.join(args.input, "**", "*.parquet"), recursive=True)
        ) or [args.input]
        spec = SketchSpec("hll_urls", "hll", "url", {"p": 14})
        res = run_partitioned_grouped_build(
            files, args.group_by, spec, args.checkpoint, batch_size=args.batch_size
        )
        print(
            json.dumps(
                {
                    "group_by": args.group_by,
                    "keys": len(res["groups"]),
                    "completed": len(res["completed"]),
                    "skipped": len(res["skipped"]),
                }
            )
        )
        for k in sorted(res["groups"]):
            print(json.dumps({"key": k, **finalize(res["groups"][k], spec)}))
        return 0
    bloom = None
    if args.bloom_file:
        bloom = BloomFilter.load_with_fallback(args.bloom_file, compressed=args.bloom_zipped)
    res = run_flagship(
        args.input,
        out_dir=args.out,
        ioc_bloom=bloom,
        checkpoint_dir=args.checkpoint,
        batch_size=args.batch_size,
    )
    print(res["summary"].to_pandas().to_string(index=False))
    if getattr(args, "amqp_url", None):
        # ship the run's summary (and any per-stage metrics records) to a
        # RabbitMQ exchange — the AMQPSubmitter transport
        # (/root/reference/util/submitter_amqp.go); needs the optional
        # `pika` package at runtime
        from .io_.amqp import AMQPSubmitter, submit_metrics

        sub_ = AMQPSubmitter(
            args.amqp_url, args.amqp_exchange, compress=args.amqp_gzip
        )
        try:
            for row in res["summary"].to_pylist():
                sub_.submit(json.dumps(row, default=str), args.amqp_key)
            n = 1 + (
                submit_metrics(sub_, args.out, key=args.amqp_key)
                if args.out
                else 0
            )
            print(f"amqp: submitted summary + {n - 1} metrics records "
                  f"to {args.amqp_exchange} ({sub_.stats})", file=sys.stderr)
        finally:
            sub_.finish()
    return 0


def cmd_merge(args) -> int:
    """Merge sketch checkpoints from N INDEPENDENT runs into one summary
    card without re-reading any corpus — the cross-job face of the
    mergeable-UDAF contract (two crawls sketched on different days/clusters
    union into one estimate set).  Driver-side sequential merge over the
    per-partition blobs, the same posture as run_partitioned_build's
    finalize: each partition checkpoint is KBs of sketch payloads, so even
    10^5 partitions stream through in MBs.  No Ray session needed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .io_.checkpoint import done_partitions
    from .pipelines.flagship import STANDARD_SPECS, summary_rows
    from .sketches import sketch_from_bytes

    if getattr(args, "grouped", None):
        # grouped-checkpoint mode: payload rows are (key, payload) from
        # run_partitioned_grouped_build; merge per key across all runs
        from .core.udaf import SketchSpec, finalize

        kind = args.grouped
        spec = SketchSpec("merged", kind, "")
        groups: dict = {}
        rows_total, n_parts = 0, 0
        dirs = [d for d in args.checkpoints.split(",") if d]
        for ck in dirs:
            done = done_partitions(ck)
            if not done:
                raise ValueError(f"no completed partitions under {ck}")
            for rec in sorted(done.values(), key=lambda r: r["partition"]):
                n_parts += 1
                rows_total += int(rec.get("rows", 0))
                for row in pq.read_table(rec["payload_path"]).to_pylist():
                    sk = sketch_from_bytes(kind, row["payload"])
                    if row["key"] in groups:
                        groups[row["key"]].merge(sk)
                    else:
                        groups[row["key"]] = sk
        print(
            json.dumps(
                {
                    "runs": len(dirs),
                    "partitions": n_parts,
                    "rows": rows_total,
                    "keys": len(groups),
                }
            )
        )
        for k in sorted(groups):
            # default=float: quantile/top-k finalize payloads can carry
            # numpy scalars, which json refuses to serialize natively
            print(json.dumps({"key": k, **finalize(groups[k], spec)}, default=float))
        return 0

    kinds = {s.name: s.kind for s in STANDARD_SPECS}
    acc: dict = {}
    rows_total, n_parts, skipped = 0, 0, set()
    dirs = [d for d in args.checkpoints.split(",") if d]
    for ck in dirs:
        done = done_partitions(ck)
        if not done:
            raise ValueError(f"no completed partitions under {ck}")
        for rec in sorted(done.values(), key=lambda r: r["partition"]):
            n_parts += 1
            rows_total += int(rec.get("rows", 0))
            for row in pq.read_table(rec["payload_path"]).to_pylist():
                sid = row["sketch_id"]
                kind = kinds.get(sid)
                if kind is None:
                    skipped.add(sid)
                    continue
                sk = sketch_from_bytes(kind, row["payload"])
                if sid in acc:
                    acc[sid].merge(sk)
                else:
                    acc[sid] = sk
    for sid in sorted(skipped):
        print(f"warning: unknown sketch_id {sid} skipped", file=sys.stderr)
    names, kindl, ests, details = summary_rows(
        acc, [s for s in STANDARD_SPECS if s.name in acc]
    )
    summary = pa.table(
        {
            "sketch": pa.array(names, pa.string()),
            "kind": pa.array(kindl, pa.string()),
            "estimate": pa.array(ests, pa.float64()),
            "detail": pa.array(details, pa.string()),
        }
    )
    print(
        json.dumps(
            {"runs": len(dirs), "partitions": n_parts, "rows": rows_total}
        )
    )
    print(summary.to_pandas().to_string(index=False))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        pq.write_table(summary, os.path.join(args.out, "summary.parquet"))
    return 0


def cmd_dedup(args) -> int:
    """Full near-dedup over a page table: MinHash-LSH candidates →
    distributed exact-Jaccard verify → connected components; writes the
    (doc_id, cluster_id) map (and optionally the deduplicated corpus —
    cluster representatives only) as parquet.  With ``--cross-ref DIR`` it
    instead runs the incremental-ingest shape: drop every input page whose
    text content already exists in the reference table, through the
    DCSO-bloom prefilter + exact-verify path (``bloom_cross_dedup``)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .ops.dedup import minhash_dedup_components
    from .sketches.hashing import hash64

    _init_ray(args.num_cpus)

    def pages(path=None):
        return rd.read_parquet(
            path or args.input, columns=["url", "text"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), type=pa.int64()
                    ),
                    "text": b.column("text"),
                    "url": b.column("url"),
                }
            ),
            batch_format="pyarrow",
        )

    if args.cross_ref:
        from .ops.dedup import bloom_cross_dedup, minhash_cross_dedup

        if args.fuzzy:
            # near-match mode: a page is "known" when the reference holds a
            # shingle-Jaccard >= threshold NEAR duplicate, not just an exact
            # copy.  Ids must be nonnegative for the sign-encoded union —
            # drop the url-hash sign bit (still injective per 63-bit hash).
            def nonneg(ds):
                def f(b):
                    ids = b.column("doc_id").to_numpy(zero_copy_only=False)
                    nn = (ids.view(np.uint64) >> np.uint64(1)).view(np.int64)
                    return b.set_column(
                        b.schema.get_field_index("doc_id"), "doc_id",
                        pa.array(nn, pa.int64()),
                    )

                return ds.map_batches(f, batch_format="pyarrow")

            survivors = minhash_cross_dedup(
                nonneg(pages()), nonneg(pages(args.cross_ref)),
                threshold=args.threshold,
            ).materialize()
        else:
            survivors = bloom_cross_dedup(
                pages(), pages(args.cross_ref), p=args.bloom_p
            ).materialize()
        n_in = pages().count()
        n_kept = survivors.count()
        os.makedirs(args.out, exist_ok=True)
        sv_dir = os.path.join(args.out, "survivors")
        survivors.write_parquet(sv_dir)
        print(json.dumps({
            "pages_in": n_in,
            "pages_kept": n_kept,
            "pages_dropped_as_known": n_in - n_kept,
            "survivors_out": sv_dir,
        }))
        return 0

    clusters = minhash_dedup_components(
        pages(), threshold=args.threshold, num_partitions=args.partitions
    ).materialize()
    n_clustered = clusters.count()
    os.makedirs(args.out, exist_ok=True)
    cl_dir = os.path.join(args.out, "clusters")
    clusters.write_parquet(cl_dir)
    summary = {"docs_in_near_dup_clusters": n_clustered, "clusters_out": cl_dir}
    if args.write_deduped:
        import ray

        # drop docs whose cluster representative is another doc (keep the
        # min-id member); broadcast the small drop set
        drop = clusters.map_batches(
            lambda b: b.filter(
                pa.compute.not_equal(b.column("doc_id"), b.column("cluster_id"))
            ).select(["doc_id"]),
            batch_format="pyarrow",
        ).take_all()
        drop_ids = np.unique(np.array([r["doc_id"] for r in drop], dtype=np.int64))
        drop_ref = ray.put(drop_ids)

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, ray.get(drop_ref))))

        out_dir = os.path.join(args.out, "deduped")
        pages().map_batches(keep, batch_format="pyarrow").write_parquet(out_dir)
        summary["deduped_out"] = out_dir
        summary["docs_dropped"] = int(len(drop_ids))
    print(json.dumps(summary))
    return 0


EVENT_TAIL_SPECS = None  # built lazily (SketchSpec import is deferred)


def _event_tail_specs():
    from .core.udaf import SketchSpec

    return [
        SketchSpec("hll_users", "hll", "user_id", {"p": 12}, value_kind="int"),
        SketchSpec("hll_event_types", "hll", "event_type", {"p": 12}),
        SketchSpec(
            "cms_event_types", "cms", "event_type",
            {"width": 1024, "depth": 5}, track=True,
        ),
        SketchSpec("kll_value", "kll", "value", {"k": 200}, value_kind="float"),
    ]


def cmd_follow(args) -> int:
    """Daemon-style tail of a growing shard directory (fever's run loop,
    batch-native): poll → build unseen partitions (checkpointed) → print
    the refreshed suite; stops after --max-iterations or --max-idle-polls.

    ``--tail-journal`` adds the live front door (input_socket.go
    analogue): each poll first cuts the journal's new complete JSONL
    lines into an immutable parquet segment under --input (the spool),
    then the normal checkpointed build picks the segment up — so a writer
    appending events (directly or via io_.tail.SocketLineServer) streams
    into the same resumable pipeline."""
    from .pipelines.follow import follow

    _init_ray(args.num_cpus)
    pattern = args.input if args.input.endswith(".parquet") else os.path.join(
        args.input, "*.parquet"
    )
    pre_poll = None
    prepare = None
    if getattr(args, "tail_journal", None):
        from .io_.tail import cut_segments

        spool = args.input
        os.makedirs(spool, exist_ok=True)
        drainer = None
        if getattr(args, "redis_url", None):
            # queue front door: drain the Redis list into the journal each
            # poll, then the normal cut/build picks the lines up — queue
            # users get the checkpoint/replay semantics for free
            from .io_.tail import RedisQueueDrainer

            drainer = RedisQueueDrainer(
                args.tail_journal,
                url=args.redis_url,
                queue=args.redis_queue,
            )

        def _pre_poll():
            if drainer is not None:
                drainer.drain_until_empty()
            return cut_segments(args.tail_journal, spool)

        pre_poll = _pre_poll
        specs = _event_tail_specs()
    else:
        from .pipelines.flagship import make_derive_fn, specs_for_input

        # narrowed shard dirs (curate output) run the sketches they can derive
        specs, _src = specs_for_input(args.input)
        prepare = make_derive_fn(False)
    for status in follow(
        pattern,
        specs,
        args.checkpoint,
        poll_s=args.poll,
        max_iterations=args.max_iterations,
        max_idle_polls=args.max_idle_polls,
        prepare=prepare,
        pre_poll=pre_poll,
    ):
        ests = {
            name: round(float(sk.estimate()), 1)
            for name, sk in status["sketches"].items()
            if hasattr(sk, "estimate")
        }
        print(
            json.dumps(
                {
                    "iteration": status["iteration"],
                    "new_files": len(status["new_files"]),
                    "total_files": status["total_files"],
                    "estimates": ests,
                }
            )
        )
    return 0


def cmd_curate(args) -> int:
    """Corpus curation pass over a page table: keep/drop decision per page
    (length + repetition gauntlet), optional deterministic hash sample and
    per-domain cap, kept pages written as partitioned parquet."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .ops.curate import curation_filter, domain_cap, hash_sample, mixture_sample
    from .ops.extract import hostname_of

    _init_ray(args.num_cpus)
    mix = _parse_weights(args.mix) if args.mix else None
    cols = ["url", "text"] + (["lang"] if mix else [])
    ds = rd.read_parquet(args.input, columns=cols)
    if args.normalize_text:
        # canonicalize BEFORE any content-keyed step (line dedup, filters)
        # so visually-identical byte variants share keys; the output corpus
        # carries the normalized text (explicit opt-in)
        from .ops.curate import normalize_text

        ds = normalize_text(ds).map_batches(
            lambda b: b.drop_columns(["text"]).rename_columns(
                ["text" if c == "text_norm" else c
                 for c in b.drop_columns(["text"]).column_names]
            ),
            batch_format="pyarrow",
        )
    if (args.sample and args.sample < 1.0) or mix:
        # ids from url hashes: deterministic under re-sharding
        import numpy as np
        import pyarrow as pa

        from .sketches.hashing import hash64

        ds = ds.map_batches(
            lambda b: b.append_column(
                "doc_id",
                pa.array(hash64(b.column("url")).view(np.int64), type=pa.int64()),
            ),
            batch_format="pyarrow",
        )
        if args.sample and args.sample < 1.0:
            ds = hash_sample(ds, args.sample, seed=args.seed)
        if mix:
            # exact integer-ratio language mix over the (sampled) corpus
            ds = mixture_sample(ds, mix, seed=args.seed, key_col="lang")
    if args.line_dedup:
        # corpus-wide duplicate-line scrub (hashed keys — the scale
        # configuration); urls are the row ids, text is rewritten in place
        from .ops.dedup import line_dedup

        ds = line_dedup(
            ds, threshold=args.line_dedup, id_col="url", match="hash"
        ).map_batches(
            lambda b: b.select(["url", "text"]), batch_format="pyarrow"
        )
    if args.host_boilerplate:
        # per-domain nav/footer scrub: strict-majority lines of each host
        # (>= N distinct pages) stripped from that host's pages only; the
        # op consumes ds twice (count + scrub) — pin the chain first
        import pyarrow as pa

        from .ops.dedup import host_boilerplate

        ds = ds.materialize()

        def add_host(b: "pa.Table") -> "pa.Table":
            return b.append_column("host", hostname_of(b.column("url")))

        ds = host_boilerplate(
            ds.map_batches(add_host, batch_format="pyarrow"),
            host_col="host", id_col="url",
            min_docs=int(args.host_boilerplate),
        ).map_batches(
            lambda b: b.select(["url", "text"]), batch_format="pyarrow"
        )
    if args.trim_dupwin is not None:
        # span-removal exact substring dedup (rewrites text in place);
        # hashed keys are the scale configuration, urls are the row ids.
        # Pin the lazy upstream chain first: the op consumes ds twice
        # (count pass + rewrite) and would re-execute it otherwise
        from .ops.dedup import dup_ngram_trim

        ds = ds.materialize()

        def _rewrap(b):
            import pyarrow as _pa

            return _pa.table(
                {"url": b.column("url"), "text": b.column("text_trim")}
            )

        ds = dup_ngram_trim(
            ds, n=args.trim_dupwin, id_col="url", match="hash"
        ).map_batches(_rewrap, batch_format="pyarrow")
    if args.max_dupwin_ratio is not None:
        # corpus-wide duplicated-window pressure: profile every page's
        # n-gram windows (hashed keys — the scale configuration), then
        # broadcast the (small) drop set and scrub with one is_in probe.
        # Pages under n tokens have no windows and trivially pass (the
        # min_tokens gate below owns shortness).
        import pyarrow as pa
        import ray

        from .ops.dedup import dup_ngram_windows

        r = float(args.max_dupwin_ratio)
        # the lazy upstream chain (read / normalize / line-dedup) would
        # otherwise re-execute for the count pass, the profile pass AND the
        # scrub below — pin it once
        ds = ds.materialize()
        prof = dup_ngram_windows(ds, n=args.dupwin_n, id_col="url", match="hash")

        def bad_urls(b: "pa.Table") -> "pa.Table":
            dw = b.column("dup_windows").to_numpy(zero_copy_only=False)
            tw = b.column("total_windows").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(dw > r * tw)).select(["url"])

        bad = prof.map_batches(bad_urls, batch_format="pyarrow").materialize()
        tabs = [t for t in ray.get(bad.to_arrow_refs()) if t.num_rows and t.num_columns]
        bad_arr = (
            pa.concat_tables(tabs).column("url").combine_chunks()
            if tabs
            else pa.array([], pa.string())
        )
        bad_ref = ray.put(bad_arr)

        def scrub_dupwin(b: "pa.Table") -> "pa.Table":
            ba = ray.get(bad_ref)
            if not len(ba) or not b.num_rows:
                return b
            keep = pc.invert(pc.is_in(b.column("url"), value_set=ba))
            if isinstance(keep, pa.ChunkedArray):
                keep = keep.combine_chunks()
            return b.filter(keep)

        ds = ds.map_batches(scrub_dupwin, batch_format="pyarrow")
    if args.max_bits_per_token is not None:
        # CCNet-style LM-perplexity gate in exact integer bits: drop pages
        # whose unigram surprise exceeds B bits/token under the reference
        # model (--lm-ref corpus, defaulting to the corpus itself — "does
        # this page look like the rest of the crawl").  Integer compare
        # bits > B·n_tokens, no float ratio.
        import pyarrow as pa
        import ray

        from .ops.textstats import unigram_logloss

        bmax = int(args.max_bits_per_token)
        ds = ds.materialize()  # scoring + scrub both consume the chain
        ref = (
            rd.read_parquet(args.lm_ref, columns=["text"])
            if args.lm_ref
            else ds
        )
        scores = unigram_logloss(ds, ref, id_col="url")

        def bad_urls_lm(b: "pa.Table") -> "pa.Table":
            bits = b.column("bits").to_numpy(zero_copy_only=False)
            nt = b.column("n_tokens").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(bits > bmax * nt)).select(["url"])

        badlm = scores.map_batches(
            bad_urls_lm, batch_format="pyarrow"
        ).materialize()
        tabs = [
            t
            for t in ray.get(badlm.to_arrow_refs())
            if t.num_rows and t.num_columns
        ]
        badlm_arr = (
            pa.concat_tables(tabs).column("url").combine_chunks()
            if tabs
            else pa.array([], pa.string())
        )
        badlm_ref = ray.put(badlm_arr)

        def scrub_lm(b: "pa.Table") -> "pa.Table":
            ba = ray.get(badlm_ref)
            if not len(ba) or not b.num_rows:
                return b
            keep = pc.invert(pc.is_in(b.column("url"), value_set=ba))
            if isinstance(keep, pa.ChunkedArray):
                keep = keep.combine_chunks()
            return b.filter(keep)

        ds = ds.map_batches(scrub_lm, batch_format="pyarrow")
    ds = curation_filter(
        ds,
        min_tokens=args.min_tokens,
        max_dup_ratio=args.max_dup_ratio,
        max_top_frac=args.max_top_frac,
    )
    kept = ds.filter(expr="keep")
    if args.domain_cap:
        kept = kept.map_batches(
            lambda b: b.append_column("hostname", hostname_of(b.column("url"))),
            batch_format="pyarrow",
        )
        kept = domain_cap(kept, args.domain_cap, key_col="hostname", order_col="url")
    # pages_total is a metadata-only count (no second pipeline execution);
    # the kept set is materialized ONCE and both counted and written from
    # that materialization — counting output-directory globs would include
    # stale files from earlier runs
    n_total = rd.read_parquet(args.input).count()
    kept = kept.materialize()
    n_kept = kept.count()
    summary = {"pages_total": n_total, "pages_kept": n_kept}
    if args.out:
        kept.write_parquet(args.out)
        summary["out"] = args.out
    print(json.dumps(summary))
    return 0


def cmd_slurp(args) -> int:
    """Write a parquet event/page table into time-rotated DBAPI tables
    (the PostgresSlurper face; sqlite file here, Postgres via a connect
    factory in library use).  Prints one JSON summary line."""
    import functools
    import sqlite3

    import ray.data as rd

    from .io_.dbsink import DBAPITableSink, write_dbapi_tables

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.input)
    sink = DBAPITableSink(
        functools.partial(sqlite3.connect, args.db, 30.0),
        table_prefix=args.prefix,
        ts_col=args.ts_col,
        rotation_s=args.rotation,
        chunk_rows=args.chunk_rows,
        index_cols=tuple(args.index.split(",")) if args.index else (),
    )
    # sqlite serializes writers — one task; a Postgres factory runs many
    res = write_dbapi_tables(ds, sink, concurrency=1)
    print(json.dumps({"db": args.db, "tables": len(res["tables"]),
                      "rows": res["rows"], "indexes": len(res["indexes"])}))
    return 0


def cmd_report(args) -> int:
    """One-pass corpus audit card over a page table: doc/token/char
    totals, empty-doc count, token min/max, distinct langs and hosts —
    printed as ONE JSON line."""
    import pyarrow as pa
    import ray.data as rd

    from .ops.extract import hostname_of
    from .ops.textstats import corpus_report

    _init_ray(args.num_cpus)
    pages = rd.read_parquet(args.input, columns=["url", "text", "lang"])

    def with_host(b: "pa.Table") -> "pa.Table":
        return pa.table(
            {
                "text": b.column("text"),
                "lang": b.column("lang"),
                "source": hostname_of(b.column("url")),
            }
        )

    rows = corpus_report(
        pages.map_batches(with_host, batch_format="pyarrow")
    ).take_all()
    print(json.dumps({r["metric"]: r["value"] for r in rows}))
    return 0


def cmd_check(args) -> int:
    """Declarative data-quality constraint card over a page table —
    completeness (url/text), url uniqueness, accepted langs, and
    warc_ts range — one JSON line per check plus a summary line; exit 1
    if any check fails (the CI-gate shape: validate the drop BEFORE a
    training job consumes it)."""
    import ray.data as rd

    from .ops.checks import (
        data_quality_card,
        rowlocal_checks,
        suggest_checks,
        unique_check,
    )

    _init_ray(args.num_cpus)
    pages = rd.read_parquet(args.input, columns=["url", "text", "lang", "warc_ts"])
    if args.suggest:
        # profile → suggest → immediately verify the suggested suite (the
        # profiled corpus must pass its own derived constraints)
        sug = suggest_checks(pages)
        print(json.dumps(sug, sort_keys=True, default=str))
        parts = [rowlocal_checks(pages, sug["rowlocal"])]
        for c in sug["unique_cols"]:
            parts.append(unique_check(pages, c, name=f"suggested.unique.{c}"))
        card = data_quality_card(parts).to_pandas()
        ok = True
        for r in card.sort_values("check_name").itertuples():
            print(
                json.dumps(
                    {
                        "check": r.check_name,
                        "violations": int(r.violations),
                        "n_rows": int(r.n_rows),
                        "passed": bool(r.passed),
                    }
                )
            )
            ok = ok and bool(r.passed)
        print(json.dumps({"checks": len(card), "all_passed": ok}))
        return 0 if ok else 1
    langs = [s for s in (args.langs or "en,de,fr,es,it").split(",") if s]
    specs = [
        {"name": "pages.completeness.url", "kind": "not_null", "col": "url"},
        {"name": "pages.completeness.text", "kind": "not_null", "col": "text"},
        {
            "name": "pages.accepted.lang",
            "kind": "in_set",
            "col": "lang",
            "values": langs,
        },
    ]
    card = data_quality_card(
        [
            rowlocal_checks(pages, specs),
            unique_check(
                pages, "url", name="pages.unique.url",
                max_violations=int(args.max_dup_urls),
            ),
        ]
    ).to_pandas()
    ok = True
    for r in card.sort_values("check_name").itertuples():
        print(
            json.dumps(
                {
                    "check": r.check_name,
                    "violations": int(r.violations),
                    "n_rows": int(r.n_rows),
                    "passed": bool(r.passed),
                }
            )
        )
        ok = ok and bool(r.passed)
    print(json.dumps({"checks": len(card), "all_passed": ok}))
    return 0 if ok else 1


def cmd_cube(args) -> int:
    """Distinct-url sketch cube over a page table: ONE streaming pass of
    per-(lang, crawl-day) HLL partials; per-lang, per-day and global
    rollups derived by merging those payloads (never re-reading the
    corpus).  One JSON line per rollup row.  The CLI face of the
    q_sketch_cube lattice."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .core.grouped import grouped_build
    from .core.udaf import SketchSpec
    from .sketches import sketch_from_bytes

    _init_ray(args.num_cpus)

    def derive(b: "pa.Table") -> "pa.Table":
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
        args.input, columns=["lang", "warc_ts", "url"]
    ).map_batches(derive, batch_format="pyarrow")
    spec = SketchSpec("hll_urls", "hll", "url", {"p": args.p})
    cells = grouped_build(ds, "cell", spec).take_all()
    rollup: dict = {}
    for r in cells:
        lang, day = r["key"].split("|", 1)
        for level, key in (("lang", lang), ("day", day), ("all", "all")):
            sk = sketch_from_bytes("hll", r["payload"])
            if (level, key) in rollup:
                rollup[(level, key)].merge(sk)
            else:
                rollup[(level, key)] = sk
    rse = 1.04 / float(np.sqrt(1 << args.p))
    for (level, key) in sorted(rollup):
        print(
            json.dumps(
                {
                    "level": level,
                    "key": key,
                    "distinct_urls": round(rollup[(level, key)].estimate(), 1),
                    "rse": rse,
                }
            )
        )
    return 0


def cmd_quantiles(args) -> int:
    """One-pass corpus quantile card: all four quantile members of the
    registry (KLL: additive rank error; t-digest: rank error, tight at the
    ends; REQ: multiplicative tail-rank error; DDSketch: value-relative
    error) built over the SAME column in a single streaming UDAF pass,
    printed one JSON line per quantile.  ``family_spread`` is
    (max−min)/mid-mean across the four estimates — four independent error
    models agreeing is a cheap corpus-scale sanity signal that needs no
    exact second pass."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from .core.udaf import SketchSpec, build_sketches

    _init_ray(args.num_cpus)
    col = args.column

    def derive(b: "pa.Table") -> "pa.Table":
        if col == "text_len":
            v = pc.binary_length(pc.fill_null(b.column("text"), ""))
        else:
            v = b.column(col)
        return pa.table({"v": pc.cast(v, pa.float64())})

    src_cols = ["text"] if col == "text_len" else [col]
    ds = rd.read_parquet(args.input, columns=src_cols).map_batches(
        derive, batch_format="pyarrow"
    )
    specs = [
        SketchSpec("kll", "kll", "v", {"k": 200}, value_kind="float"),
        SketchSpec("tdigest", "tdigest", "v", {"delta": 100}, value_kind="float"),
        SketchSpec("req", "req", "v", {"k": 32}, value_kind="float"),
        SketchSpec("dd", "dd", "v", {"alpha": 0.01}, value_kind="float"),
    ]
    sk = build_sketches(ds, specs)
    for q in (0.5, 0.9, 0.99, 0.999):
        ests = {n: float(sk[n].quantile(q)) for n in ("kll", "tdigest", "req", "dd")}
        vals = sorted(ests.values())
        mid = (vals[1] + vals[2]) / 2.0
        spread = (vals[-1] - vals[0]) / max(abs(mid), 1e-12)
        print(
            json.dumps(
                {
                    "q": q,
                    **{k: round(v, 3) for k, v in ests.items()},
                    "family_spread": round(spread, 4),
                }
            )
        )
    return 0


def cmd_profile(args) -> int:
    """Per-column DESCRIBE card over any parquet table, printed as one
    JSON line per column: rows, nulls, exact distinct, native min/max.
    Columns default to every column in the schema."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from .ops.stats import table_profile

    _init_ray(args.num_cpus)
    cols = args.columns.split(",") if args.columns else None
    if cols is None:
        import glob as _glob
        import os as _os

        probe = args.input
        if _os.path.isdir(probe):
            hits = sorted(_glob.glob(_os.path.join(probe, "**", "*.parquet"),
                                     recursive=True))
            if not hits:
                print(json.dumps({"error": f"no parquet under {probe}"}))
                return 1
            probe = hits[0]
        cols = _pq.read_schema(probe).names
    ds = rd.read_parquet(args.input, columns=cols)
    for row in table_profile(ds, cols, distinct_cap=args.distinct_cap).to_pylist():
        print(json.dumps(row))
    return 0


def cmd_layout(args) -> int:
    """Rewrite a parquet corpus into a balanced value-RANGE partitioned
    layout (one dir per range, plan in _splitters.json): one KLL sketch
    pass plans the splitters, no sort.  `text_len` / `html_len` derive on
    the fly for page tables that lack them."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    from .io_.sinks import range_partitioned_write

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.input)
    schema_names = ds.schema().names
    col = args.column
    if col not in schema_names and col in ("text_len", "html_len"):
        from .pipelines.flagship import derive_page_columns

        ds = ds.map_batches(derive_page_columns, batch_format="pyarrow")
    res = range_partitioned_write(ds, col, args.out, n_parts=args.parts)
    import glob as _glob
    import os as _os

    part_dirs = sorted(
        d
        for d in _os.listdir(args.out)
        if _os.path.isdir(_os.path.join(args.out, d)) and d.startswith("range_id=")
    )
    counts = {
        d: sum(
            _pq.read_metadata(f).num_rows
            for f in _glob.glob(_os.path.join(args.out, d, "*.parquet"))
        )
        for d in part_dirs
    }
    print(
        json.dumps(
            {
                "out": args.out,
                "column": col,
                "parts": len(part_dirs),
                "splitters": res["splitters"],
                "rows_min": min(counts.values()) if counts else 0,
                "rows_max": max(counts.values()) if counts else 0,
            }
        )
    )
    return 0


def cmd_audit(args) -> int:
    """Distribution-shape audit over a page table, printed as ONE JSON
    line: per-host concentration (exact Gini + top-1% Lorenz mass over
    host doc counts via byte lengths), digit-blind template collapse,
    and the Zipf rank-frequency slope — the "is this corpus natural
    text or template spam?" card."""
    import pyarrow as pa
    import ray.data as rd

    from .ops.dedup import template_census
    from .ops.extract import hostname_of
    from .ops.stats import gini_concentration, top_share
    from .ops.textstats import zipf_audit

    _init_ray(args.num_cpus)

    def hosted(b: "pa.Table") -> "pa.Table":
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        if text.null_count:
            text = text.fill_null("")  # null text == '' (COALESCE parity)
        return pa.table(
            {
                "source": hostname_of(b.column("url")),
                "text": text,
                # byte length in 2-dp form so top_share's cents map is exact
                "value": pa.compute.cast(
                    pa.compute.binary_length(text), pa.float64()
                ),
            }
        )

    pages = rd.read_parquet(args.input, columns=["url", "text"]).map_batches(
        hosted, batch_format="pyarrow"
    ).materialize()

    (g,) = gini_concentration(pages, "source").take_all()
    (ts_,) = top_share(pages, "value", top_ppm=10_000).take_all()
    (tc,) = template_census(pages, "text").take_all()
    (z,) = zipf_audit(pages, "text").take_all()
    den = g["gini_den"] or 1
    zden = z["n_tokens"] * z["sxx"] - z["sx"] * z["sx"]
    out = {
        "docs": g["total"],
        "hosts": g["n_groups"],
        "host_gini": round(g["gini_num"] / den, 6),
        "top1pct_byte_share": round(ts_["top_mass"] / max(ts_["total_mass"], 1), 6),
        "template_collapse": tc["template_collapse"],
        "distinct_raw": tc["distinct_raw"],
        "distinct_masked": tc["distinct_masked"],
        "zipf_slope": round(
            (z["n_tokens"] * z["sxy"] - z["sx"] * z["sy"]) / zden, 4
        ) if zden else None,
        "vocab": z["n_tokens"],
        "tokens": z["total_occurrences"],
    }
    print(json.dumps(out))
    return 0


def cmd_embaudit(args) -> int:
    """Embedding-column audit as ONE JSON line: Frequent-Directions
    covariance spectrum (top eigenvalues, effective rank = exp(spectral
    entropy), captured-mass fraction), norm statistics, and the SQ8
    quantization scale range — the pre-flight card before ANN indexing
    or semantic dedup.  One UDAF pass (KB partials), nothing
    corpus-sized moves."""
    import numpy as np
    import ray.data as rd

    from .core.udaf import SketchSpec, build_sketches

    _init_ray(args.num_cpus)
    ds = rd.read_parquet(args.input, columns=[args.column])
    # infer d from the first non-null embedding in a bounded probe (an
    # empty corpus or an all-null probe gets a clean JSON error, not a
    # traceback; a null FIRST row must not reject a valid corpus)
    probe = ds.limit(1024).take_all()
    d = next(
        (len(r[args.column]) for r in probe if r.get(args.column) is not None),
        None,
    )
    if d is None:
        print(json.dumps(
            {"error": f"no non-null {args.column!r} rows in the first "
                      f"{len(probe)} rows"}))
        return 1
    sk = build_sketches(
        ds,
        [SketchSpec("fd", "fd", args.column, {"l": args.l, "d": d},
                    value_kind="vec")],
    )["fd"]
    ev = np.linalg.eigvalsh(sk.cov())[::-1]
    ev = np.maximum(ev, 0.0)
    total = sk.fnorm_sq or 1.0
    p = ev[ev > 0] / ev.sum() if ev.sum() > 0 else np.array([1.0])
    eff_rank = float(np.exp(-(p * np.log(p)).sum()))
    out = {
        "dim": d,
        "sketch_l": args.l,
        "fnorm_sq": round(sk.fnorm_sq, 4),
        "top_eigs": [round(float(v), 4) for v in ev[:8]],
        "captured_mass": round(float(ev.sum()) / total, 6),
        "effective_rank": round(eff_rank, 2),
        "spectral_err_bound": round(sk.error_bound(), 4),
    }
    print(json.dumps(out))
    return 0


def cmd_mediadup(args) -> int:
    """Near-duplicate media detection over a binary payload column: pHash
    for images, the spectral fingerprint for audio — one 64-bit code per
    payload through the shared banded-Hamming core.  Payloads no codec
    decodes take the deterministic fallback code, so byte-identical
    payloads (the gen corpora's planted dup pages) pair at distance 0
    even in a library-free container.  Prints ONE JSON line."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .ops.multimodal import audio_dup_pairs, image_phash_pairs
    from .sketches.hashing import hash64

    _init_ray(args.num_cpus)
    from .sketches.hashing import splitmix64

    def keyed(b: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        # id = hash(url) ⊕ mix(ts): re-crawled records (same url, later
        # fetch) stay DISTINCT — a payload-dup pair between two crawls of
        # one page is exactly what this audit reports
        h = hash64(b.column("url"))
        ts = pc.cast(b.column("warc_ts"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ids = (h ^ splitmix64(ts.view(np.uint64))).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "html": b.column(args.column),
            }
        )

    ds = rd.read_parquet(
        args.input, columns=["url", "warc_ts", args.column]
    ).map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    op = image_phash_pairs if args.modality == "image" else audio_dup_pairs
    pairs = op(ds, max_hamming=args.max_hamming).materialize()
    n_pairs = pairs.count()
    sample = [
        {"doc_a": r["doc_a"], "doc_b": r["doc_b"], "hamming": r["hamming"]}
        for r in pairs.limit(5).take_all()
    ]
    if args.out:
        pairs.write_parquet(args.out)
    print(
        json.dumps(
            {
                "modality": args.modality,
                "pairs": n_pairs,
                "max_hamming": args.max_hamming,
                "sample": sample,
                **({"out": args.out} if args.out else {}),
            }
        )
    )
    return 0


def cmd_diff(args) -> int:
    """Snapshot delta between two page tables keyed by url: counts of
    added / removed / changed (content hash) pages as ONE JSON line;
    --out writes the full (doc_id, status) table as parquet.  The
    incremental-recrawl audit — what must re-process after this crawl."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .ops.dedup import snapshot_diff
    from .sketches.hashing import hash64

    _init_ray(args.num_cpus)

    def keyed(path: str):
        def f(b: "pa.Table") -> "pa.Table":
            return pa.table(
                {
                    "doc_id": pa.array(
                        hash64(b.column("url")).view(np.int64), pa.int64()
                    ),
                    "text": b.column("text"),
                }
            )

        return rd.read_parquet(path, columns=["url", "text"]).map_batches(
            f, batch_format="pyarrow"
        )

    # gen corpora plant duplicate urls (near-dup pages), so the CLI diff
    # uses the commutative per-url min-hash reduction
    out = snapshot_diff(
        keyed(args.against), keyed(args.input), on_duplicate="min_hash"
    )
    if args.out:
        out = out.materialize()
        out.write_parquet(args.out)
    counts = {"added": 0, "removed": 0, "changed": 0}
    for b in out.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0 or b.num_columns == 0:
            continue
        for s, n in zip(*np.unique(
            b.column("status").to_numpy(zero_copy_only=False), return_counts=True
        )):
            counts[str(s)] += int(n)
    counts["out"] = args.out or None
    print(json.dumps(counts))
    return 0


def cmd_fileindex(args) -> int:
    """Per-file Bloom pruning index: `--input/--out` builds one
    DCSO-format filter per data file + manifest (one JSON summary line);
    `--lookup <idx> v1 v2 ...` prints one JSON line mapping each value to
    its candidate files (no false negatives; false positives at rate p)."""
    from .io_.fileindex import build_file_bloom_index, lookup_file_bloom_index

    if args.lookup:
        if not args.values:
            print("fileindex --lookup needs at least one value")
            return 2
        print(json.dumps(lookup_file_bloom_index(args.lookup, args.values),
                         sort_keys=True))
        return 0
    if not (args.input and args.out):
        print("fileindex needs --input and --out (build) or --lookup (query)")
        return 2
    _init_ray(args.num_cpus)
    print(json.dumps(build_file_bloom_index(
        args.input, args.out, column=args.column, p=args.p)))
    return 0


def cmd_warc(args) -> int:
    """Crawl-archive ingestion: WARC response records → the standard page
    parquet layout (url, warc_ts, html, text, lang) with text derived by
    the PINNED extractor and lang null (downstream lang_id fills it) —
    after this one pass, every other command runs on the archive."""
    import glob as _glob

    import pyarrow as pa

    from .io_.warc import warc_to_pages_resumable
    from .ops.extract import extract_text

    _init_ray(args.num_cpus)
    files = (
        sorted(
            f
            for pat in ("*.warc", "*.warc.gz")
            for f in _glob.glob(os.path.join(args.input, "**", pat), recursive=True)
        )
        if os.path.isdir(args.input)
        else [args.input]
    )

    lang_id = None
    if args.lang_id:
        from .ops.textstats import LangId

        lang_id = LangId()

    def derive(b: "pa.Table") -> "pa.Table":
        text = extract_text(b.column("html")).cast(pa.large_string())
        if lang_id is not None:
            pred = lang_id(pa.table({"text": text})).column("lang_pred")
            lang = pred.cast(pa.string())
        else:
            lang = pa.array([None] * b.num_rows, pa.string())
        return pa.table(
            {
                "url": b.column("url"),
                "warc_ts": b.column("warc_ts"),
                "html": b.column("html"),
                "text": text,
                "lang": lang,
            }
        )

    res = warc_to_pages_resumable(files, args.out, derive=derive)
    print(
        json.dumps(
            {
                "archives": len(files),
                "completed": len(res["completed"]),
                "skipped": len(res["skipped"]),
                "records": sum(r["rows"] for r in res["completed"]),
                "out": os.path.join(args.out, "parts"),
            }
        )
    )
    return 0


def cmd_plan(args) -> int:
    """Sketch-driven grouped-aggregation planner: ONE streaming pass
    probes the group key (HLL distinct + Misra-Gries heavy hitters), then
    the measured thresholds pick tree_groupby vs bucket_map_groups and a
    salt fanout for Zipf-hot keys.  Prints ONE JSON line with the
    recommendation, the reasons, and every probe number it used."""
    import pyarrow as pa
    import ray.data as rd

    from .core.plan import plan_groupby, probe_column
    from .ops.extract import hostname_of

    _init_ray(args.num_cpus)

    def keyed(path: str, col: str):
        if col == "hostname":
            return rd.read_parquet(path, columns=["url"]).map_batches(
                lambda b: pa.table({"hostname": hostname_of(b.column("url"))}),
                batch_format="pyarrow",
            )
        return rd.read_parquet(path, columns=[col])

    col = args.column
    ds = keyed(args.input, col)
    if args.right_input:
        from .core.plan import plan_join, probe_join

        rcol = args.right_column or col
        rds = keyed(args.right_input, rcol)
        jp = probe_join(ds, col, rds, rcol)
        out = plan_join(
            jp,
            left_bytes=ds.size_bytes(),
            right_bytes=rds.size_bytes(),
            workers=args.workers,
        )
        print(json.dumps(out, sort_keys=True))
        return 0
    probe = probe_column(ds, col, k=args.top)
    print(json.dumps(plan_groupby(probe, workers=args.workers), sort_keys=True))
    return 0


def cmd_links(args) -> int:
    """Host-level link graph out of raw page html: extracts href targets
    (ops.links, one vectorized split per batch), resolves destination
    hosts, and aggregates exact (src_host, dst_host, n_links) edges.
    Prints ONE JSON summary line (links, edges, top in-link hub); --out
    writes the edge table as parquet."""
    import pyarrow as pa
    import ray.data as rd

    from .ops.links import host_links

    _init_ray(args.num_cpus)
    pages = rd.read_parquet(args.input, columns=["url", "html"])
    graph = host_links(pages, max_groups=args.max_edges)
    if args.out:
        graph = graph.materialize()
        graph.write_parquet(args.out)
    edges = [t for t in graph.to_arrow_refs()]
    import ray as _ray

    tabs = [t for t in _ray.get(edges) if t.num_rows and t.num_columns]
    if not tabs:
        print(json.dumps({"links": 0, "edges": 0, "top_hub": None}))
        return 0
    t = pa.concat_tables(tabs)
    import numpy as np

    dst = t.column("dst_host").to_pylist()
    n = t.column("n_links").to_numpy(zero_copy_only=False)
    inlinks: dict = {}
    for d, c in zip(dst, n):
        inlinks[d] = inlinks.get(d, 0) + int(c)
    top = max(sorted(inlinks), key=lambda k: inlinks[k])
    summary = {
        "links": int(n.sum()),
        "edges": t.num_rows,
        "top_hub": top,
        "top_hub_inlinks": inlinks[top],
        "out": args.out,
    }
    if args.pagerank:
        # integer fixed-point PageRank over the CLOSED subgraph: distinct
        # (src, dst) edges restricted (to fixpoint) to dsts that still
        # have out-edges — dropped edge count is reported, dangling mass
        # is not silently invented (ops.graph.pagerank's closure contract)
        import numpy as np
        import ray.data as rd

        from .ops.graph import pagerank

        src = np.asarray(t.column("src_host").to_pylist(), dtype=object)
        dst = np.asarray(t.column("dst_host").to_pylist(), dtype=object)
        keep = np.ones(len(src), dtype=bool)
        while True:
            srcs = set(src[keep].tolist())
            nk = keep & np.fromiter((d in srcs for d in dst), bool, len(dst))
            if (nk == keep).all():
                break
            keep = nk
        summary["pagerank_dropped_edges"] = int((~keep).sum())
        if keep.any():
            hosts = sorted({*src[keep].tolist(), *dst[keep].tolist()})
            hid = {h: i for i, h in enumerate(hosts)}
            e = pa.table(
                {
                    "src": pa.array([hid[s] for s in src[keep]], pa.int64()),
                    "dst": pa.array([hid[d] for d in dst[keep]], pa.int64()),
                }
            )
            pr = pagerank(
                rd.from_arrow(e), "src", "dst", iterations=args.pagerank
            ).to_pandas()
            pr = pr.sort_values(["rank", "node"], ascending=[False, True]).head(10)
            summary["pagerank_top"] = [
                {"host": hosts[int(r.node)], "rank": int(r.rank)}
                for r in pr.itertuples()
            ]
        else:
            summary["pagerank_top"] = []
    print(json.dumps(summary, sort_keys=True))
    return 0


def cmd_index(args) -> int:
    """Inverted-index build and/or keyword search over a page table: token
    → (df, postings) written as partitioned parquet; --query prints the
    top-k matching urls as one JSON line.  Urls ARE the document ids
    (deterministic ranking ties by url), so hits map straight back to
    pages."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from .ops.textstats import inverted_index, keyword_search
    from .sketches.hashing import hash64

    _init_ray(args.num_cpus)
    pages = rd.read_parquet(args.input, columns=["url", "text"])
    if args.out and args.query:
        pages = pages.materialize()  # one scan feeds both passes

    summary = {}
    if args.out:
        # postings hold compact int64 url-hash ids (the corpus-wide doc
        # key used by every other pipeline over pages)
        hashed = pages.map_batches(
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
        idx = inverted_index(hashed, max_postings=args.max_postings).materialize()
        idx.write_parquet(args.out)
        summary.update({"index_tokens": idx.count(), "out": args.out})
    if args.query:
        hits = keyword_search(pages, args.query, k=args.k, id_col="url").take_all()
        summary["hits"] = [
            {"url": r["url"], "score": int(r["score"])} for r in hits
        ]
    if not summary:
        raise SystemExit("index: give --out (build) and/or --query (search)")
    print(json.dumps(summary))
    return 0


def cmd_ioc(args) -> int:
    import ray.data as rd

    from .ops.ioc import PageIocMatcher
    from .sketches.bloom import BloomFilter

    _init_ray(args.num_cpus)
    if getattr(args, "follow", False):
        # daemon matching with a LIVE filter: `bloom add` rewrites the
        # artifact, the running loop reloads it on content change and
        # applies it to every shard from then on (the reference's gRPC
        # BloomAdd/Reload mgmt plane, mgmtserver.go:96-160, with the
        # artifact file as the control channel)
        from .pipelines.iocwatch import ioc_follow

        if not args.out:
            print("ioc --follow requires --out (per-shard match parquet)")
            return 2
        pattern = args.input if args.input.endswith(".parquet") else os.path.join(
            args.input, "*.parquet"
        )
        for status in ioc_follow(
            pattern,
            args.bloom_file,
            args.out,
            poll_s=args.poll,
            max_iterations=args.max_iterations,
            max_idle_polls=args.max_idle_polls,
            blacklist=tuple(args.blacklist.split(",")) if args.blacklist else (),
            alert_prefix=args.alert_prefix,
            compressed=args.bloom_zipped,
        ):
            status["new_files"] = len(status["new_files"])
            print(json.dumps(status), flush=True)
        return 0
    bloom = BloomFilter.load_with_fallback(args.bloom_file, compressed=args.bloom_zipped)
    blacklist = tuple(args.blacklist.split(",")) if args.blacklist else ()
    ds = rd.read_parquet(args.input, columns=["url"]).map_batches(
        PageIocMatcher,
        fn_constructor_kwargs={
            "bloom_bytes": bloom.to_bytes(),
            "blacklist": blacklist,
            "alert_prefix": args.alert_prefix,
        },
        batch_format="pyarrow",
        concurrency=(1, args.concurrency),
    )
    if args.out:
        ds.write_parquet(args.out)
        print(f"matches written to {args.out}")
    else:
        for row in ds.take(args.limit):
            print(json.dumps(row))
    return 0


def cmd_bloom(args) -> int:
    from .sketches.bloom import BloomFilter, build_filter

    if args.action == "serve":
        # live management endpoint on a unix socket — the mgmt-plane wire
        # (mgmt/mgmtserver.go): BloomAdd streams into the LIVE filter,
        # BloomSave atomically flips the artifact generation that
        # `follow --bloom-file` / ioc_follow watch
        import time as _time

        from .io_.mgmt import MgmtServer

        with MgmtServer(args.file, args.socket, compressed=args.zipped) as srv:
            print(json.dumps({"socket": args.socket, "bloom": args.file,
                              **srv.bloom_info()}))
            sys.stdout.flush()
            deadline = (_time.time() + args.duration) if args.duration else None
            try:
                while deadline is None or _time.time() < deadline:
                    _time.sleep(0.2)
            except KeyboardInterrupt:
                pass
            print(json.dumps(srv.stats))
        return 0
    if getattr(args, "socket", None):
        # client face of the mgmt protocol (cmd/fever/cmds/bloom.go:24-69):
        # mutate/inspect the LIVE filter of a running `bloom serve`
        from .io_.mgmt import MgmtClient

        with MgmtClient(args.socket) as clt:
            if args.action == "add":
                values = list(args.values)
                if args.iocs:
                    with open(args.iocs) as fh:
                        values += [ln.strip() for ln in fh if ln.strip()]
                if not values and not sys.stdin.isatty():
                    values = [ln.strip() for ln in sys.stdin if ln.strip()]
                print(json.dumps({"added": clt.bloom_add(values)}))
            elif args.action == "show":
                print(json.dumps(clt.bloom_info()))
            elif args.action == "save":
                clt.bloom_save()
            elif args.action == "reload":
                clt.bloom_reload()
            else:
                print(f"action {args.action} needs no --socket", file=sys.stderr)
                return 2
        return 0
    if args.action in ("save", "reload"):
        print(f"bloom {args.action} requires --socket", file=sys.stderr)
        return 2
    if args.action == "create":
        with open(args.iocs) as fh:
            iocs = [line.strip() for line in fh if line.strip()]
        bf = build_filter(iocs, n=args.capacity or len(iocs), p=args.p)
        bf.save(args.file, compressed=args.zipped)
        print(f"wrote {args.file}: n={bf.n} p={bf.p} k={bf.k} m={bf.m} N={bf.N}")
    elif args.action == "show":
        bf = BloomFilter.load_with_fallback(args.file, compressed=args.zipped)
        print(
            json.dumps(
                {"n": bf.n, "p": bf.p, "k": bf.k, "m": bf.m, "N": bf.N, "fill_ratio": bf.fill_ratio}
            )
        )
    elif args.action == "add":
        # incremental add-then-save on an existing filter file — the batch
        # analog of the reference's live BloomAdd mgmt call
        # (/root/reference/mgmt/mgmtserver.go:118-160): same DCSO byte
        # format in and out, so fever-written files round-trip
        bf = BloomFilter.load_with_fallback(args.file, compressed=args.zipped)
        values = list(args.values)
        if args.iocs:
            with open(args.iocs) as fh:
                values += [line.strip() for line in fh if line.strip()]
        bf.add(values)
        bf.save(args.file, compressed=args.zipped)
        print(f"added {len(values)} values: N={bf.N} fill={bf.fill_ratio:.6g}")
    elif args.action == "check":
        bf = BloomFilter.load_with_fallback(args.file, compressed=args.zipped)
        for v in args.values:
            print(f"{v}\t{bf.check_one(v)}")
    return 0


def cmd_lcount(args) -> int:
    """Deletion-tolerant distinct-counter artifact (linear counting):
    `create` seeds it, `add`/`remove` mutate occurrences in place (multiset
    contract — removals must match prior adds), `ingest --input <parquet>
    --column <col>` streams a whole table in via the one-pass UDAF,
    `show` prints the estimate card.  The distinct analog of `cbloom`:
    counts that honor retraction without a rebuild."""
    import numpy as np

    from .sketches.lc import LinearCounter

    def _vals() -> np.ndarray:
        values = list(args.values)
        if args.iocs:
            with open(args.iocs) as fh:
                values += [line.strip() for line in fh if line.strip()]
        return np.array(values, dtype=object)

    if args.action == "create":
        lc = LinearCounter.create(m=args.m)
        vals = _vals()
        if len(vals):
            lc.add(vals)
        with open(args.file, "wb") as fh:
            fh.write(lc.to_bytes())
        print(f"wrote {args.file}: m={lc.m} n={lc.n}")
        return 0
    with open(args.file, "rb") as fh:
        lc = LinearCounter.from_bytes(fh.read())
    if args.action in ("add", "remove"):
        vals = _vals()
        getattr(lc, args.action)(vals)
        with open(args.file, "wb") as fh:
            fh.write(lc.to_bytes())
        print(
            f"{args.action}: n={lc.n} estimate={lc.estimate():.1f} "
            f"debt={lc.debt}"
        )
    elif args.action == "ingest":
        if not (args.input and args.column):
            print("lcount ingest needs --input and --column")
            return 2
        import ray.data as rd

        from .core.udaf import SketchSpec, build_sketches

        _init_ray(args.num_cpus)
        other = build_sketches(
            rd.read_parquet(args.input, columns=[args.column]),
            [SketchSpec("lc", "lc", args.column, {"m": lc.m})],
        )["lc"]
        if args.retract:
            lc.subtract(other)
        else:
            lc.merge(other)
        with open(args.file, "wb") as fh:
            fh.write(lc.to_bytes())
        print(
            json.dumps(
                {
                    "ingested": other.n,
                    "retract": bool(args.retract),
                    "n": lc.n,
                    "estimate": round(lc.estimate(), 1),
                    "debt": lc.debt,
                }
            )
        )
    elif args.action == "show":
        print(
            json.dumps(
                {
                    "m": lc.m,
                    "n": lc.n,
                    "estimate": round(lc.estimate(), 1),
                    "occupied": lc.occupied,
                    "std_error": round(lc.std_error(), 2),
                    "debt": lc.debt,
                },
                sort_keys=True,
            )
        )
    return 0


def cmd_cbloom(args) -> int:
    """Counting-bloom indicator set: membership with RETRACTION.  Where
    `bloom` manages the DCSO-format artifact (add-only; retraction forces a
    rebuild over the full IoC corpus, as in the reference's mgmt server),
    `cbloom` holds signed counters so `remove` retracts indicators in place
    — no rebuild, no re-read.  Not byte-compatible with DCSO files."""
    import numpy as np

    from .sketches.cbf import CountingBloom

    def _vals() -> np.ndarray:
        values = list(args.values)
        if args.iocs:
            with open(args.iocs) as fh:
                values += [line.strip() for line in fh if line.strip()]
        return np.array(values, dtype=object)

    if args.action == "create":
        cb = CountingBloom.create(n=args.capacity, p=args.p)
        vals = _vals()
        if len(vals):
            cb.add(vals)
        with open(args.file, "wb") as fh:
            fh.write(cb.to_bytes())
        print(f"wrote {args.file}: m={cb.m} k={cb.k} n_add={cb.n_add}")
        return 0
    with open(args.file, "rb") as fh:
        cb = CountingBloom.from_bytes(fh.read())
    if args.action in ("add", "remove"):
        vals = _vals()
        getattr(cb, args.action)(vals)
        with open(args.file, "wb") as fh:
            fh.write(cb.to_bytes())
        verb = "added" if args.action == "add" else "removed"
        print(
            f"{verb} {len(vals)} values: n_add={cb.n_add} "
            f"n_remove={cb.n_remove} fill={cb.fill_ratio:.6g} debt={cb.debt}"
        )
    elif args.action == "show":
        print(
            json.dumps(
                {
                    "m": cb.m,
                    "k": cb.k,
                    "n_add": cb.n_add,
                    "n_remove": cb.n_remove,
                    "fill_ratio": cb.fill_ratio,
                    "debt": cb.debt,
                }
            )
        )
    elif args.action == "check":
        hits = cb.contains(np.array(list(args.values), dtype=object))
        for v, h in zip(args.values, hits):
            print(f"{v}\t{bool(h)}")
    return 0


def cmd_gen(args) -> int:
    from .gen.pages import write_pages

    kwargs = {}
    if args.ioc_hosts:
        kwargs["ioc_hosts"] = tuple(args.ioc_hosts.split(","))
    if args.ioc_paths:
        kwargs["ioc_paths"] = tuple(args.ioc_paths.split(","))
    if args.ioc_frac is not None:
        kwargs["ioc_frac"] = args.ioc_frac
    if args.links_per_page:
        kwargs["links_per_page"] = args.links_per_page
    write_pages(args.out, args.rows, n_files=args.files, seed=args.seed, **kwargs)
    print(f"wrote {args.rows} rows in {args.files} files under {args.out}")
    return 0


def main(argv=None) -> int:
    # allow_abbrev=False: the YAML cascade detects "explicitly given" flags
    # by their literal tokens, so an accepted abbreviation (--thresh for
    # --threshold) would not register as given and YAML would silently
    # override the typed value
    p = argparse.ArgumentParser(
        prog="fever_ray", description=__doc__, allow_abbrev=False
    )
    p.add_argument("--config", help="YAML/JSON config file (flags override)")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", allow_abbrev=False, help="flagship sketch build")
    pr.add_argument("--input", required=True)
    pr.add_argument("--out")
    pr.add_argument("--checkpoint")
    pr.add_argument("--bloom-file", dest="bloom_file")
    pr.add_argument("--bloom-zipped", dest="bloom_zipped", action="store_true")
    pr.add_argument("--batch-size", dest="batch_size", type=int, default=16384)
    pr.add_argument("--num-cpus", dest="num_cpus", type=int)
    pr.add_argument("--group-by", dest="group_by", default=None,
                    help="grouped resumable build: per-key distinct-url "
                    "HLL card keyed by this column (requires --checkpoint)")
    pr.add_argument("--amqp-url", dest="amqp_url",
                    help="submit the run summary + metrics to this RabbitMQ "
                    "broker (amqp:// URL; needs the optional pika package)")
    pr.add_argument("--amqp-exchange", dest="amqp_exchange",
                    default="tdh.metrics")
    pr.add_argument("--amqp-key", dest="amqp_key", default="fever.stats")
    pr.add_argument("--amqp-gzip", dest="amqp_gzip", action="store_true",
                    help="gzip payloads (the reference's UseCompression)")
    pr.set_defaults(fn=cmd_run)

    pmg = sub.add_parser(
        "merge", allow_abbrev=False,
        help="merge sketch checkpoints from independent runs (no corpus re-read)",
    )
    pmg.add_argument("--checkpoints", required=True,
                     help="comma-separated checkpoint dirs from prior runs")
    pmg.add_argument("--out", help="write merged summary.parquet here")
    pmg.add_argument("--grouped", default=None,
                     help="checkpoints are GROUPED (per-key) builds of this "
                     "sketch kind (e.g. hll); prints one JSON line per key")
    pmg.set_defaults(fn=cmd_merge)

    pd_ = sub.add_parser("dedup", allow_abbrev=False, help="MinHash-LSH near-dedup over pages")
    pd_.add_argument("--input", required=True)
    pd_.add_argument("--out", required=True)
    pd_.add_argument("--threshold", type=float, default=0.7)
    pd_.add_argument("--partitions", type=int, default=16)
    pd_.add_argument("--write-deduped", dest="write_deduped", action="store_true",
                     help="also write the corpus keeping one doc per cluster")
    pd_.add_argument("--fuzzy", action="store_true",
                     help="with --cross-ref: drop NEAR duplicates of the "
                          "reference (shingle Jaccard >= --threshold), not "
                          "just exact content matches")
    pd_.add_argument("--cross-ref", dest="cross_ref",
                     help="reference page dir: drop input pages whose text "
                          "already exists there (bloom-prefiltered exact)")
    pd_.add_argument("--bloom-p", dest="bloom_p", type=float, default=1e-3,
                     help="cross-ref prefilter FP rate (exactness unaffected)")
    pd_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pd_.set_defaults(fn=cmd_dedup)

    pc_ = sub.add_parser("curate", allow_abbrev=False, help="keep/drop curation pass over pages")
    pc_.add_argument("--input", required=True)
    pc_.add_argument("--out")
    pc_.add_argument("--sample", type=float, help="deterministic Bernoulli fraction")
    pc_.add_argument("--seed", type=int, default=0)
    pc_.add_argument("--min-tokens", dest="min_tokens", type=int, default=20)
    pc_.add_argument("--max-dup-ratio", dest="max_dup_ratio", type=float, default=0.8)
    pc_.add_argument("--max-top-frac", dest="max_top_frac", type=float, default=0.3)
    pc_.add_argument("--domain-cap", dest="domain_cap", type=int)
    pc_.add_argument("--mix", help="exact integer language mix, e.g. 'en=3,de=1'")
    pc_.add_argument("--line-dedup", dest="line_dedup", type=int,
                     help="drop lines occurring more than N times corpus-wide "
                          "(input urls must be unique — re-crawl dumps with "
                          "repeated urls need an exact dedup first)")
    pc_.add_argument("--normalize-text", dest="normalize_text", action="store_true",
                     help="NFC + whitespace canonicalization before any "
                          "content-keyed step; output carries normalized text")
    pc_.add_argument("--host-boilerplate", dest="host_boilerplate", type=int,
                     help="strip lines present in > half of a HOST's pages "
                          "(and at least N pages) — the per-domain "
                          "nav/footer/cookie-banner scrub; pages scrubbed "
                          "to empty are dropped")
    pc_.add_argument("--max-dupwin-ratio", dest="max_dupwin_ratio", type=float,
                     help="drop pages whose duplicated n-gram-window fraction "
                          "exceeds this (exact-substring dedup pressure, "
                          "Lee et al. 2021 shape)")
    pc_.add_argument("--dupwin-n", dest="dupwin_n", type=int, default=8,
                     help="window size in tokens for --max-dupwin-ratio")
    pc_.add_argument("--trim-dupwin", dest="trim_dupwin", type=int,
                     help="REMOVE every token covered by a corpus-duplicated "
                          "N-token window (exact substring dedup action) "
                          "instead of dropping whole pages")
    pc_.add_argument("--max-bits-per-token", dest="max_bits_per_token",
                     type=int,
                     help="drop pages whose unigram LM surprise exceeds B "
                          "bits/token (integer compare, exact)")
    pc_.add_argument("--lm-ref", dest="lm_ref",
                     help="reference corpus (parquet dir) for the LM gate; "
                          "defaults to the input corpus itself")
    pc_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pc_.set_defaults(fn=cmd_curate)

    psl = sub.add_parser(
        "slurp", allow_abbrev=False,
        help="write a parquet table into time-rotated DBAPI tables "
        "(PostgresSlurper face; sqlite file target)",
    )
    psl.add_argument("--input", required=True)
    psl.add_argument("--db", required=True, help="sqlite database file path")
    psl.add_argument("--prefix", default="events")
    psl.add_argument("--ts-col", dest="ts_col", default="ts")
    psl.add_argument("--rotation", type=int, default=3600)
    psl.add_argument("--chunk-rows", dest="chunk_rows", type=int, default=5000)
    psl.add_argument("--index", default="ts")
    psl.add_argument("--num-cpus", dest="num_cpus", type=int)
    psl.set_defaults(fn=cmd_slurp)

    pq_ = sub.add_parser("report", allow_abbrev=False,
                         help="one-pass corpus audit card as one JSON line")
    pq_.add_argument("--input", required=True)
    pq_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pq_.set_defaults(fn=cmd_report)

    pck = sub.add_parser("check", allow_abbrev=False,
                         help="data-quality constraint card; exit 1 on failure")
    pck.add_argument("--input", required=True)
    pck.add_argument("--langs", help="comma-separated accepted langs")
    pck.add_argument("--max-dup-urls", dest="max_dup_urls", type=int, default=0)
    pck.add_argument("--suggest", action="store_true",
                     help="profile the table, derive a constraint suite "
                          "(deequ-style suggestion), and verify it")
    pck.add_argument("--num-cpus", dest="num_cpus", type=int)
    pck.set_defaults(fn=cmd_check)

    ply = sub.add_parser(
        "layout",
        allow_abbrev=False,
        help="rewrite into a balanced value-range partitioned layout",
    )
    ply.add_argument("--input", required=True)
    ply.add_argument("--column", required=True)
    ply.add_argument("--out", required=True)
    ply.add_argument("--parts", type=int, default=16)
    ply.add_argument("--num-cpus", type=int, default=8)
    ply.set_defaults(fn=cmd_layout)

    pa_ = sub.add_parser("audit", allow_abbrev=False,
                         help="distribution-shape audit card (gini / "
                         "Lorenz / template collapse / Zipf slope)")
    pa_.add_argument("--input", required=True)
    pa_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pa_.set_defaults(fn=cmd_audit)

    pcu = sub.add_parser(
        "cube", allow_abbrev=False,
        help="distinct-url HLL lattice: per-(lang, day) partials → all rollups",
    )
    pcu.add_argument("--input", required=True)
    pcu.add_argument("--p", type=int, default=12, help="HLL precision (2^p registers)")
    pcu.add_argument("--num-cpus", dest="num_cpus", type=int)
    pcu.set_defaults(fn=cmd_cube)

    pqt = sub.add_parser("quantiles", allow_abbrev=False,
                         help="one-pass quantile card from all four "
                         "quantile sketches + cross-family spread")
    pqt.add_argument("--input", required=True)
    pqt.add_argument("--column", default="text_len",
                     help="numeric column, or text_len (derived from text)")
    pqt.add_argument("--num-cpus", dest="num_cpus", type=int)
    pqt.set_defaults(fn=cmd_quantiles)

    pp_ = sub.add_parser("profile", allow_abbrev=False,
                         help="per-column DESCRIBE card (rows / nulls / "
                         "exact distinct / min-max)")
    pp_.add_argument("--input", required=True)
    pp_.add_argument("--columns", default=None,
                     help="comma-separated; default = all columns")
    pp_.add_argument("--distinct-cap", dest="distinct_cap", type=int,
                     default=1 << 20)
    pp_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pp_.set_defaults(fn=cmd_profile)

    pe_ = sub.add_parser("embaudit", allow_abbrev=False,
                         help="embedding-column audit card (FD covariance "
                         "spectrum / effective rank / error bound)")
    pe_.add_argument("--input", required=True)
    pe_.add_argument("--column", default="embedding")
    pe_.add_argument("--l", type=int, default=32,
                     help="FD sketch rows (error bound 2*||A||_F^2 / l)")
    pe_.add_argument("--num-cpus", dest="num_cpus", type=int)
    pe_.set_defaults(fn=cmd_embaudit)

    pdf = sub.add_parser("diff", allow_abbrev=False,
                         help="url-keyed snapshot delta between two page dirs")
    pdf.add_argument("--input", required=True, help="the NEW snapshot")
    pdf.add_argument("--against", required=True, help="the OLD snapshot")
    pdf.add_argument("--out", default=None)
    pdf.add_argument("--num-cpus", dest="num_cpus", type=int)
    pdf.set_defaults(fn=cmd_diff)

    pfx = sub.add_parser(
        "fileindex", allow_abbrev=False,
        help="per-file Bloom pruning index: which data file can contain "
             "value X (build) / candidate files per value (lookup)",
    )
    pfx.add_argument("--input", help="parquet corpus dir (build mode)")
    pfx.add_argument("--out", help="index dir (build mode; required with --input)")
    pfx.add_argument("--column", default="url")
    pfx.add_argument("--p", type=float, default=1e-6)
    pfx.add_argument("--lookup", help="existing index dir to query")
    pfx.add_argument("values", nargs="*", help="values to look up")
    pfx.add_argument("--num-cpus", dest="num_cpus", type=int)
    pfx.set_defaults(fn=cmd_fileindex)

    pwc = sub.add_parser(
        "warc", allow_abbrev=False,
        help="ingest WARC crawl archives into the standard page parquet "
             "layout (pinned extractor derives text)",
    )
    pwc.add_argument("--input", required=True, help="WARC file or dir")
    pwc.add_argument("--out", required=True)
    pwc.add_argument("--lang-id", dest="lang_id", action="store_true",
                     help="fill lang via the marker-table LangId stage "
                          "instead of null")
    pwc.add_argument("--num-cpus", dest="num_cpus", type=int)
    pwc.set_defaults(fn=cmd_warc)

    ppl = sub.add_parser(
        "plan", allow_abbrev=False,
        help="sketch-driven grouped-aggregation planner (probe a group "
             "key, recommend tree / bucket / salted strategy)",
    )
    ppl.add_argument("--input", required=True)
    ppl.add_argument("--column", default="hostname",
                     help="group key; 'hostname' derives from url")
    ppl.add_argument("--workers", type=int, default=32)
    ppl.add_argument("--top", type=int, default=8)
    ppl.add_argument("--right-input", dest="right_input",
                     help="second table: plan a JOIN instead of a groupby")
    ppl.add_argument("--right-column", dest="right_column",
                     help="right join key (defaults to --column)")
    ppl.add_argument("--num-cpus", dest="num_cpus", type=int)
    ppl.set_defaults(fn=cmd_plan)

    plk = sub.add_parser(
        "links", allow_abbrev=False,
        help="host-level link graph from page html (href extraction + "
             "exact edge counts)",
    )
    plk.add_argument("--input", required=True)
    plk.add_argument("--out", help="write the edge table as parquet")
    plk.add_argument("--max-edges", dest="max_edges", type=int,
                     default=1_000_000)
    plk.add_argument("--pagerank", type=int, nargs="?", const=3, default=0,
                     metavar="ITERS",
                     help="also rank hosts: integer PageRank over the "
                          "closed link subgraph (default 3 iterations)")
    plk.add_argument("--num-cpus", dest="num_cpus", type=int)
    plk.set_defaults(fn=cmd_links)

    px = sub.add_parser("index", allow_abbrev=False,
                        help="inverted-index build / keyword search over pages")
    px.add_argument("--input", required=True)
    px.add_argument("--out", help="write the token -> (df, postings) index as parquet")
    px.add_argument("--max-postings", dest="max_postings", type=int, default=1024)
    px.add_argument("--query", help="search terms (space separated) instead of / in addition to building")
    px.add_argument("--k", type=int, default=10)
    px.add_argument("--num-cpus", dest="num_cpus", type=int)
    px.set_defaults(fn=cmd_index)

    pf = sub.add_parser("follow", allow_abbrev=False, help="tail a growing shard dir (daemon analog)")
    pf.add_argument("--input", required=True, help="directory or glob of parquet shards")
    pf.add_argument("--checkpoint", required=True)
    pf.add_argument("--poll", type=float, default=5.0)
    pf.add_argument("--max-iterations", dest="max_iterations", type=int)
    pf.add_argument("--max-idle-polls", dest="max_idle_polls", type=int, default=3)
    pf.add_argument(
        "--tail-journal", dest="tail_journal",
        help="growing JSONL event journal; each poll cuts its new complete "
        "lines into a parquet segment under --input (the spool) first",
    )
    pf.add_argument(
        "--redis-url", dest="redis_url",
        help="drain this Redis list into --tail-journal each poll "
        "(requires redis-py; RedisInput analogue)",
    )
    pf.add_argument(
        "--redis-queue", dest="redis_queue", default="suricata",
        help="Redis list key to drain (default: suricata)",
    )
    pf.add_argument("--num-cpus", dest="num_cpus", type=int)
    pf.set_defaults(fn=cmd_follow)

    pmd = sub.add_parser("mediadup", allow_abbrev=False,
                         help="near-dup media pairs (pHash / audio fingerprint)")
    pmd.add_argument("--input", required=True, help="parquet dir of pages")
    pmd.add_argument("--column", default="html", help="binary payload column")
    pmd.add_argument("--modality", choices=("image", "audio"), default="image")
    pmd.add_argument("--max-hamming", dest="max_hamming", type=int, default=6)
    pmd.add_argument("--out", help="write the pair table as parquet")
    pmd.add_argument("--num-cpus", dest="num_cpus", type=int)
    pmd.set_defaults(fn=cmd_mediadup)

    pi = sub.add_parser("ioc", allow_abbrev=False, help="IoC matching over pages")
    pi.add_argument("--input", required=True)
    pi.add_argument("--bloom-file", dest="bloom_file", required=True)
    pi.add_argument("--bloom-zipped", dest="bloom_zipped", action="store_true")
    pi.add_argument("--blacklist", default="")
    pi.add_argument("--alert-prefix", dest="alert_prefix", default="BLF")
    pi.add_argument("--out")
    pi.add_argument("--limit", type=int, default=20)
    pi.add_argument("--concurrency", type=int, default=8)
    pi.add_argument(
        "--follow", action="store_true",
        help="daemon mode: poll --input for new shards, reload --bloom-file "
        "on content change (the live BloomAdd/Reload mgmt analogue)",
    )
    pi.add_argument("--poll", type=float, default=5.0)
    pi.add_argument("--max-iterations", dest="max_iterations", type=int)
    pi.add_argument("--max-idle-polls", dest="max_idle_polls", type=int, default=3)
    pi.add_argument("--num-cpus", dest="num_cpus", type=int)
    pi.set_defaults(fn=cmd_ioc)

    pb = sub.add_parser("bloom", allow_abbrev=False, help="bloom artifact management")
    pb.add_argument(
        "action",
        choices=["create", "add", "show", "check", "serve", "save", "reload"],
    )
    pb.add_argument("file")
    pb.add_argument("values", nargs="*")
    pb.add_argument("--iocs", help="one IoC per line (create)")
    pb.add_argument("--capacity", type=int)
    pb.add_argument("--p", type=float, default=1e-6)
    pb.add_argument("--zipped", action="store_true")
    pb.add_argument(
        "--socket",
        help="mgmt unix socket: serve = listen here; add/show/save/reload = "
        "talk to a running serve (the fever bloom mgmt verbs)",
    )
    pb.add_argument(
        "--duration", type=float, default=0.0,
        help="serve: exit after N seconds (0 = until interrupted)",
    )
    pb.set_defaults(fn=cmd_bloom)

    pcb = sub.add_parser(
        "cbloom",
        allow_abbrev=False,
        help="counting-bloom indicator set (membership with retraction)",
    )
    pcb.add_argument("action", choices=["create", "add", "remove", "check", "show"])
    pcb.add_argument("file")
    pcb.add_argument("values", nargs="*")
    pcb.add_argument("--iocs", help="one indicator per line")
    pcb.add_argument("--capacity", type=int, default=100_000)
    pcb.add_argument("--p", type=float, default=1e-4)
    pcb.set_defaults(fn=cmd_cbloom)

    plc = sub.add_parser(
        "lcount",
        allow_abbrev=False,
        help="deletion-tolerant distinct counter artifact (linear counting)",
    )
    plc.add_argument("action", choices=["create", "add", "remove", "ingest", "show"])
    plc.add_argument("file")
    plc.add_argument("values", nargs="*")
    plc.add_argument("--iocs", help="one value per line")
    plc.add_argument("--m", type=int, default=1 << 16)
    plc.add_argument("--input", help="parquet dir (ingest mode)")
    plc.add_argument("--column", help="column to count (ingest mode)")
    plc.add_argument("--retract", action="store_true",
                     help="ingest as a RETRACTION stream (subtract)")
    plc.add_argument("--num-cpus", dest="num_cpus", type=int)
    plc.set_defaults(fn=cmd_lcount)

    pg = sub.add_parser("gen", allow_abbrev=False, help="generate synthetic pages")
    pg.add_argument("--out", required=True)
    pg.add_argument("--rows", type=int, default=10000)
    pg.add_argument("--files", type=int, default=4)
    pg.add_argument("--seed", type=int, default=42)
    pg.add_argument("--ioc-hosts", dest="ioc_hosts", help="comma-separated hostnames to plant")
    pg.add_argument("--ioc-paths", dest="ioc_paths", help="comma-separated url paths to plant")
    pg.add_argument("--ioc-frac", dest="ioc_frac", type=float, help="fraction of pages carrying a planted IoC")
    pg.add_argument("--links-per-page", dest="links_per_page", type=int,
                    default=0,
                    help="plant up to N intra-corpus anchors per page")
    pg.set_defaults(fn=cmd_gen)

    args = p.parse_args(argv)
    cfg = _maybe_yaml(args.config)
    # cascade: explicit flags > YAML > parser defaults.  "Explicit" means
    # the long option appeared on the command line — comparing against the
    # parsed value can't distinguish "--batch-size 16384" from the default
    # 16384, which previously made YAML unable to set any flag whose
    # argparse default is non-falsy.
    tokens = list(sys.argv[1:] if argv is None else argv)
    given = {t.split("=", 1)[0] for t in tokens if t.startswith("--")}
    for k, v in cfg.items():
        dest = k.replace("-", "_")
        if not hasattr(args, dest):
            continue
        if "--" + dest.replace("_", "-") not in given:
            setattr(args, dest, v)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        print(f"error: input not found: {e}", file=sys.stderr)
        return 2
    except (ValueError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
