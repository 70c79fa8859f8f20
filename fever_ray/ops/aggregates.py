"""Ray-Data-native equivalents of fever's aggregation handlers (SURVEY §2.6),
expressed over the driver's ``events`` table (event_id, ts, user_id,
event_type, value, props) — the closest analogue of fever's event stream.

Each function takes a ray.data.Dataset and returns a Dataset; hot paths
pre-aggregate inside map_batches (one partial row per key per batch) before
the shuffle, so the groupby moves partials, not raw rows — the
partial+final shape every fever aggregator already has (copy-and-reset
flush under mutex, e.g. /root/reference/processing/flow_aggregator.go:80-148)
re-expressed as a real distributed combine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col) -> pa.ChunkedArray:
    """Exact integer cents from a 2-dp float column: makes distributed sums
    order-independent (float partial-sum order moves the last ulp, which a
    value-hash correctness gate catches)."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def _uncents(col) -> pa.ChunkedArray:
    return pc.divide(pc.cast(col, pa.float64()), 100.0)


def _distinct(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Within-batch exact distinct of key tuples (vectorized C++ hash agg).
    NB: pyarrow's aggregate([]) is a no-op, so count_all anchors the group."""
    t = pa.TableGroupBy(batch.select(keys), keys).aggregate([([], "count_all")])
    return t.drop_columns(["count_all"])


def tree_groupby(
    partials_ds,
    keys: list[str],
    aggs: list[tuple[str, str]],
    max_groups: int | None = None,
):
    """Exact grouped aggregation WITHOUT a sort shuffle.

    sum/count/min/max are associative, so per-batch partial tables can be
    re-combined by bundling blocks through ``map_batches`` (the same
    coalesce-tree the sketch merge uses) instead of Ray's sort-based
    ``groupby`` — partial rows are (key, partial-agg) and each combine level
    runs pyarrow's C++ hash aggregation.

    Valid when the distinct-key count is bounded (fits one task's memory) —
    the profile/report aggregations here have 10-10^5 keys.  For unbounded
    key spaces use ``Dataset.groupby`` (a real shuffle) or a sketch.
    ``max_groups`` turns that assumption into a LOUD error at the first
    combine level that exceeds it — inside the tree, before any oversized
    table can reach the final single-task combine or the driver.

    ``aggs``: [(col, fn)] with fn ∈ {sum, min, max}; re-apply the SAME fn at
    every level (count must already be a partial count re-aggregated by sum).
    """

    def combine(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch, keys).aggregate(aggs)
        if max_groups is not None and t.num_rows > max_groups:
            raise ValueError(
                f"tree_groupby: {t.num_rows} distinct {keys} groups in one "
                f"combine (> max_groups={max_groups}) — the key domain is "
                "not bounded enough for the coalesce-tree; use a shuffle "
                "groupby or a sketch"
            )
        return t.rename_columns(keys + [c for c, _ in aggs])

    level1 = partials_ds.map_batches(
        combine, batch_format="pyarrow", batch_size=65536
    )
    # repartition(1) (narrow: rows are tiny partials) guarantees the final
    # combine sees everything in one batch → globally unique keys
    return level1.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )


def event_profiler(events_ds, strategy: str = "tree"):
    """fever EventProfiler (processing/event_profiler.go:127-134): per
    event_type count + total payload bytes (props length here)."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "props_bytes", pc.cast(pc.binary_length(batch.column("props")), "int64")
        )
        t = pa.TableGroupBy(batch.select(["event_type", "props_bytes"]), ["event_type"]).aggregate(
            [("props_bytes", "sum"), ("props_bytes", "count")]
        )
        return t.rename_columns(["event_type", "sum_bytes", "n_events"])

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        return tree_groupby(
            partials, ["event_type"], [("sum_bytes", "sum"), ("n_events", "sum")]
        )
    from ray.data.aggregate import Sum

    return partials.groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_bytes", alias_name="sum_bytes")
    )


def flow_aggregator(events_ds, strategy: str = "tree"):
    """fever FlowAggregator (processing/flow_aggregator.go:111-148): grouped
    sums + first-seen timestamp.  Key here: (user_id, event_type)."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("val_c", _cents(batch.column("value")))
        t = pa.TableGroupBy(
            batch.select(["user_id", "event_type", "val_c", "ts"]),
            ["user_id", "event_type"],
        ).aggregate([("val_c", "sum"), ("val_c", "count"), ("ts", "min")])
        return t.rename_columns(["user_id", "event_type", "val_c", "n", "first_ts"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "sum_value": _uncents(batch.column("val_c")),
                "n": batch.column("n"),
                "first_ts": batch.column("first_ts"),
            }
        )

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        out = tree_groupby(
            partials,
            ["user_id", "event_type"],
            [("val_c", "sum"), ("n", "sum"), ("first_ts", "min")],
        )
    else:
        from ray.data.aggregate import Min, Sum

        out = partials.groupby(["user_id", "event_type"]).aggregate(
            Sum("val_c", alias_name="val_c"),
            Sum("n", alias_name="n"),
            Min("first_ts", alias_name="first_ts"),
        )
    return out.map_batches(finish, batch_format="pyarrow")


def unicorn_flow_report(events_ds, event_type: str = "purchase", strategy: str = "tree"):
    """fever UnicornAggregator (processing/unicorn_aggregator.go:202-218):
    pre-filter (proto==TCP && bytes>0 → here event_type==purchase &&
    value>0), then per-key count + sum."""

    def fil(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch.column("event_type"), event_type),
            pc.greater(batch.column("value"), 0.0),
        )
        return batch.filter(mask)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column("val_c", _cents(batch.column("value")))
        t = pa.TableGroupBy(batch.select(["user_id", "val_c"]), ["user_id"]).aggregate(
            [("val_c", "count"), ("val_c", "sum")]
        )
        return t.rename_columns(["user_id", "n_flows", "val_c"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "n_flows": batch.column("n_flows"),
                "total_value": _uncents(batch.column("val_c")),
            }
        )

    partials = events_ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        partial, batch_format="pyarrow"
    )
    if strategy == "tree":
        out = tree_groupby(
            partials, ["user_id"], [("n_flows", "sum"), ("val_c", "sum")]
        )
    else:
        from ray.data.aggregate import Sum

        out = partials.groupby("user_id").aggregate(
            Sum("n_flows", alias_name="n_flows"), Sum("val_c", alias_name="val_c")
        )
    return out.map_batches(finish, batch_format="pyarrow")


def dns_aggregator(events_ds, strategy: str = "tree"):
    """fever DNSAggregator (processing/dns_aggregator.go:145-168): per-key
    exact distinct sets.  Here: distinct users per event_type, computed as a
    two-level exact distinct (dedup pairs first, then count) — the scalable
    exact form; HLL replaces it when keys explode (see grouped sketches)."""
    pairs = events_ds.map_batches(
        lambda b: _distinct(b, ["event_type", "user_id"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if strategy == "tree":
        # distinct is idempotent+associative → same coalesce-tree combine
        dedup1 = pairs.map_batches(
            lambda b: _distinct(b, ["event_type", "user_id"]),
            batch_format="pyarrow",
            batch_size=65536,
        )

        def final(batch: pa.Table) -> pa.Table:
            d = _distinct(batch, ["event_type", "user_id"])
            t = pa.TableGroupBy(d.select(["event_type"]), ["event_type"]).aggregate(
                [([], "count_all")]
            )
            return t.rename_columns(["event_type", "n_distinct_users"])

        return dedup1.repartition(1).map_batches(
            final, batch_format="pyarrow", batch_size=None
        )
    from ray.data.aggregate import Count

    distinct_pairs = pairs.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_c")
    )
    return (
        distinct_pairs.drop_columns(["_c"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n_distinct_users"))
    )


def pdns_collector(events_ds, strategy: str = "tree"):
    """fever PDNSCollector (processing/pdns_collector.go:123-223): two-level
    rrname → answer-tuple counts.  Here: (event_type, user_id) counts with
    first/last seen — the flattened form of the nested count map."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(
            batch.select(["event_type", "user_id", "ts"]), ["event_type", "user_id"]
        ).aggregate([("ts", "count"), ("ts", "min"), ("ts", "max")])
        return t.rename_columns(["event_type", "user_id", "n", "first_ts", "last_ts"])

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        return tree_groupby(
            partials,
            ["event_type", "user_id"],
            [("n", "sum"), ("first_ts", "min"), ("last_ts", "max")],
        )
    from ray.data.aggregate import Max, Min, Sum

    return partials.groupby(["event_type", "user_id"]).aggregate(
        Sum("n", alias_name="n"),
        Min("first_ts", alias_name="first_ts"),
        Max("last_ts", alias_name="last_ts"),
    )


def context_collector(events_ds, mark_type: str = "error"):
    """fever ContextCollector (processing/context_collector.go:88-133):
    ship every event of a flow once the flow is 'marked' by an alert.
    Batch form: semi-join of all events against the marked-key set.

    The marked set is collected first (small: distinct keys with alerts) and
    broadcast into the filter stage via ray.put — a broadcast semi-join, no
    shuffle of the big side."""
    import ray

    marked = events_ds.map_batches(
        lambda b: _distinct(
            b.filter(pc.equal(b.column("event_type"), mark_type)), ["user_id"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).unique("user_id")
    import numpy as np

    marked_ref = ray.put(np.unique(np.asarray(marked, dtype=np.int64)))

    def semi(batch: pa.Table) -> pa.Table:
        keys = ray.get(marked_ref)  # sorted unique int64 array
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        mask = np.isin(uid, keys)  # vectorized sorted-membership semi-join
        return batch.filter(pa.array(mask))

    return events_ds.map_batches(semi, batch_format="pyarrow", zero_copy_batch=True)


def context_excluder(events_ds, mark_type: str = "error", min_value: float | None = None):
    """Broadcast ANTI-join — the complement of ``context_collector``: drop
    every event of any flow that was marked (fever's suppression-list /
    whitelist shape: the reference filters flagged flows OUT via its bloom
    blacklist, bloom_handler.go blacklist branch).  Same broadcast pattern,
    negated mask — still no shuffle of the big side.  ``min_value``
    optionally narrows the marking predicate (type AND value > threshold)."""
    import ray

    def mark(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), mark_type)
        if min_value is not None:
            m = pc.and_(m, pc.greater(b.column("value"), min_value))
        return _distinct(b.filter(m), ["user_id"])

    marked = events_ds.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True
    ).unique("user_id")
    import numpy as np

    marked_ref = ray.put(np.unique(np.asarray(marked, dtype=np.int64)))

    def anti(batch: pa.Table) -> pa.Table:
        keys = ray.get(marked_ref)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        mask = ~np.isin(uid, keys)
        return batch.filter(pa.array(mask))

    return events_ds.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)


def heartbeat_injector(events_ds, n_heartbeats: int = 24):
    """fever HeartbeatInjector (processing/heartbeat_injector.go:67-119):
    deterministic synthetic canary rows unioned into the stream."""
    import ray.data as rd

    base_ts = 1704067200_000_000  # 2024-01-01T00:00:00Z
    rows = [
        {
            "event_id": -1 - i,
            "ts": base_ts + i * 3600_000_000,
            "user_id": -1,
            "event_type": "heartbeat",
            "value": 0.0,
            "props": "{}",
        }
        for i in range(n_heartbeats)
    ]
    hb = rd.from_items(rows).map_batches(
        lambda b: b.set_column(
            b.column_names.index("ts"),
            "ts",
            b.column("ts").cast(pa.timestamp("us")),
        ),
        batch_format="pyarrow",
    )
    return events_ds.union(hb)


def flow_profiler(docs_ds, strategy: str = "tree"):
    """fever FlowProfiler (processing/flow_profiler.go:93-107): per app_proto
    packet/byte sums → here per-lang doc count + char sum over documents."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select(["lang", "n_chars"]), ["lang"]).aggregate(
            [("n_chars", "count"), ("n_chars", "sum")]
        )
        return t.rename_columns(["lang", "n_docs", "sum_chars"])

    partials = docs_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        return tree_groupby(
            partials, ["lang"], [("n_docs", "sum"), ("sum_chars", "sum")]
        )
    from ray.data.aggregate import Sum

    return partials.groupby("lang").aggregate(
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
    )


def funnel_counts(
    events_ds,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
    num_partitions: int | None = None,
):
    """Ordered conversion funnel: for each prefix of ``steps``, how many
    keys (users) completed it IN ORDER — step k counts users with an
    earliest-chain timestamp t_k = min ts of a step-k event STRICTLY after
    t_{k-1}, and (with ``within_s``) no later than t_{k-1} + window —
    the usual product-analytics conversion window.  The greedy earliest
    chain is the standard funnel semantics; note that with a window it is
    a deterministic, well-defined policy (not a search over all chains).

    Output rows: (``step`` int64 1-based, ``event_type``, ``n_users``
    int64), one per step.

    The reference's UnicornAggregator counts single event types per flush
    (/root/reference/processing/unicorn_aggregator.go); this is the
    multi-step sequential generalization.

    Scale shape (10^12 events): the input is pre-filtered to funnel step
    types and projected to (key, ts, step-index); one key-hash-bucket
    shuffle co-locates each user's rows, where ALL steps resolve in S
    vectorized np.minimum.at passes (no per-user loop); each bucket emits S
    partial counts and a bounded ``tree_groupby`` sums them — the final
    result is |steps| rows, nothing user-sized leaves the buckets.
    """
    import numpy as np

    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts

    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps!r}")
    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    step_list = list(steps)

    def tag(batch: pa.Table) -> pa.Table:
        tc = batch.column(type_col)
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        mask = pc.is_in(tc, value_set=pa.array(step_list, pa.string()))
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        t = batch.select([key, ts_col, type_col]).filter(mask)
        tc = t.column(type_col)
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        sidx = pc.index_in(tc, value_set=pa.array(step_list, pa.string()))
        kc = t.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        return pa.table(
            {
                key: kc,
                "ts_us": pc.cast(t.column(ts_col), pa.int64()),
                "sidx": pc.cast(sidx, pa.int8()),
                "bucket": pa.array(bucket_of(kc, n_parts), pa.int32()),
            }
        )

    SENT = np.iinfo(np.int64).max

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"step": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        ucodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        nu = int(ucodes.max()) + 1
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        sidx = g.column("sidx").to_numpy(zero_copy_only=False)
        t_prev = np.full(nu, np.int64(-(2**62)), dtype=np.int64)  # -inf
        counts = np.zeros(len(step_list), dtype=np.int64)
        win = None if within_s is None else np.int64(within_s) * 1_000_000
        for k in range(len(step_list)):
            tk = np.full(nu, SENT, dtype=np.int64)
            tp = t_prev[ucodes]
            m = (sidx == k) & (ts > tp)
            if win is not None and k > 0:
                m &= ts <= tp + win
            np.minimum.at(tk, ucodes[m], ts[m])
            counts[k] = int((tk != SENT).sum())
            t_prev = tk
            if counts[k] == 0:
                break  # later steps cannot complete
        return pa.table(
            {
                "step": pa.array(np.arange(1, len(step_list) + 1, dtype=np.int64)),
                "n": pa.array(counts, pa.int64()),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    # zero-count seed: a corpus with no step events still yields one row
    # per step (the oracle's UNION ALL of COUNT(*) always does)
    import ray.data as _rd

    seed = _rd.from_arrow(
        pa.table(
            {
                "step": pa.array(np.arange(1, len(step_list) + 1, dtype=np.int64)),
                "n": pa.array(np.zeros(len(step_list), dtype=np.int64)),
            }
        )
    )
    out = tree_groupby(partials.union(seed), ["step"], [("n", "sum")])

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("step").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "step": b.column("step"),
                type_col: pa.array([step_list[int(i) - 1] for i in s], pa.string()),
                "n_users": b.column("n"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def json_int_field(batch: pa.Table, col: str, field: str, out: str) -> pa.Table:
    """Typed integer-field extraction from a flat-JSON string column — the
    vectorized hot-path sibling of the io_/jsonl full parser for the
    common case of pulling ONE scalar out of an event ``props`` payload
    (fever parses full EVE JSON at ingest; per-field pulls inside a
    pipeline should not re-parse whole objects row by row).

    Pattern-based (RE2 via ``pc.extract_regex``): matches ``"field": int``
    anywhere in the string; a row with no match or a non-integer value is
    a LOUD error — silently nulling malformed telemetry is how bad data
    walks into a training mix."""
    import numpy as np

    v = batch.column(col)
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if v.null_count:
        raise ValueError(f"json_int_field: {col} contains nulls")
    pat = f'"{field}"\\s*:\\s*(?P<v>-?[0-9]+)'
    m = pc.extract_regex(pc.cast(v, pa.string()), pat)
    # validity lives on the STRUCT; the child field shows '' for misses
    n_bad = int(pc.sum(pc.cast(pc.is_null(m), pa.int64())).as_py() or 0)
    if n_bad:
        raise ValueError(
            f"json_int_field: {n_bad} rows of {col} have no "
            f'integer "{field}" field — malformed payloads must be filtered '
            "explicitly, not silently dropped"
        )
    return batch.append_column(out, pc.cast(m.field("v"), pa.int64()))


def props_field_stats(events_ds, field: str = "k", group_col: str = "event_type"):
    """Grouped integer stats (n, sum, min, max) of a JSON props field —
    the 'what is this payload field doing per event type' audit, one
    streaming pass: vectorized field extraction + per-batch Arrow hash
    aggregation, tree-combined over the bounded event-type key space."""
    import numpy as np
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        b = json_int_field(batch, "props", field, "k")
        t = pa.table(
            {
                group_col: b.column(group_col),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "sum_k": b.column("k"),
                "min_k": b.column("k"),
                "max_k": b.column("k"),
            }
        )
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("n", "sum"), ("sum_k", "sum"), ("min_k", "min"), ("max_k", "max")]
        )
        return g.rename_columns([group_col, "n", "sum_k", "min_k", "max_k"])

    out = tree_groupby(
        events_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [group_col],
        [("n", "sum"), ("sum_k", "sum"), ("min_k", "min"), ("max_k", "max")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "sum_k": pa.array([], pa.int64()),
                    "min_k": pa.array([], pa.int64()),
                    "max_k": pa.array([], pa.int64()),
                }
            )
        return batch.take(
            pc.sort_indices(batch, sort_keys=[(group_col, "ascending")])
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def basket_lift(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    item_col: str = "event_type",
    basket_s: int = 86400,
    t_num: int = 11,
    t_den: int = 10,
    max_items: int = 64,
    num_partitions: int = 32,
):
    """Market-basket association over (key, time-bucket) baskets — the
    classic co-occurrence/lift mining (Agrawal 1993) on event streams:
    a basket is every event of ``key_col`` within one ``basket_s``
    window; for each unordered item pair (a < b) report basket counts
    and whether lift = n_ab·N / (n_a·n_b) exceeds ``t_num/t_den`` — the
    pure-integer cross-multiply ``t_den·n_ab·N > t_num·n_a·n_b``, so the
    flag is bit-stable.  Output rows: (item_a, item_b, n_a, n_b, n_ab,
    n_baskets, lifted) — pairs with n_ab = 0 emit nothing.

    Scale shape: the item domain is BOUNDED (loud ``max_items`` guard) so
    items become bits: distinct (basket, item) rows reduce per batch,
    one basket-hash bucket shuffle co-locates each basket, per bucket a
    sort + np.bitwise_or.reduceat folds baskets into uint64 masks and
    every pair count is one vectorized popcount pass; only ≤ |items|²
    partial rows tree-combine.  Null key/ts/item rows are skipped."""
    import ray
    import ray.data as rd

    from ..sketches.hashing import bucket_of, hash64_ints

    if t_num < 0 or t_den < 1:
        raise ValueError("basket_lift: bad lift threshold")
    if basket_s <= 0:
        raise ValueError("basket_lift: basket_s must be > 0")
    if not (1 <= max_items <= 64):
        raise ValueError(
            f"basket_lift: max_items must be 1..64 (one uint64 mask bit "
            f"per item — a 65th item would silently shift to zero), got "
            f"{max_items}"
        )

    # pass 0: the global item dictionary (bounded domain — the
    # stratified_sample contract), sorted for a deterministic bit order
    def item_partial(batch: pa.Table) -> pa.Table:
        # dictionary from BASKET-ELIGIBLE rows only (null key/ts rows can
        # never form a basket — counting their items could trip the
        # max_items guard on a domain the kernel never sees)
        mask = pa.array(
            ~(
                np.asarray(batch.column(key_col).is_null())
                | np.asarray(batch.column(ts_col).is_null())
            )
        )
        it = batch.column(item_col).filter(mask)
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        u = pc.unique(it.drop_null())
        return pa.table({"it": u, "one": pa.array([1] * len(u), pa.int64())})

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                events_ds.map_batches(
                    item_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["it"],
                [("one", "sum")],
                max_groups=max_items * 4,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    empty = pa.table(
        {
            "item_a": pa.array([], pa.string()),
            "item_b": pa.array([], pa.string()),
            "n_a": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "n_ab": pa.array([], pa.int64()),
            "n_baskets": pa.array([], pa.int64()),
            "lifted": pa.array([], pa.int64()),
        }
    )
    if not tabs:
        return rd.from_arrow(empty)
    items = sorted(
        pa.concat_tables(tabs).column("it").to_pylist()
    )
    if len(items) > max_items:
        raise ValueError(
            f"basket_lift: {len(items)} distinct items exceed max_items "
            f"{max_items} — the bitmask kernel holds 64; bucket the items"
        )
    item_idx = {v: i for i, v in enumerate(items)}
    idx_ref = ray.put(item_idx)
    K = len(items)

    def basket_rows(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        lk = cached_get(idx_ref)
        narrow = batch.select([key_col, ts_col, item_col])
        mask = pa.array(
            ~(
                np.asarray(narrow.column(key_col).is_null())
                | np.asarray(narrow.column(ts_col).is_null())
                | np.asarray(narrow.column(item_col).is_null())
            )
        )
        narrow = narrow.filter(mask)
        if narrow.num_rows == 0:
            return pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "day": pa.array([], pa.int64()),
                    "bit": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        key = pc.cast(narrow.column(key_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        ts = pc.cast(
            pc.cast(narrow.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        day = ts // np.int64(basket_s * 1_000_000)
        it = narrow.column(item_col)
        if isinstance(it, pa.ChunkedArray):
            it = it.combine_chunks()
        enc = it.dictionary_encode()
        bits_dict = np.array(
            [lk[v] for v in enc.dictionary.to_pylist()], dtype=np.int64
        )
        bit = bits_dict[enc.indices.to_numpy(zero_copy_only=False)]
        # basket identity stays the EXACT (key, day) pair — a hashed
        # basket id could merge two baskets (2^-64, but the oracle would
        # diverge); the hash is only the co-location bucket
        order = np.lexsort((bit, day, key))
        k2, d2, b2 = key[order], day[order], bit[order]
        keep = np.empty(len(k2), bool)
        if len(k2):
            keep[0] = True
            keep[1:] = (
                (k2[1:] != k2[:-1]) | (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])
            )
        k2, d2, b2 = k2[keep], d2[keep], b2[keep]
        bh = hash64_ints(k2.astype(np.uint64) ^ hash64_ints(d2))
        return pa.table(
            {
                "k": pa.array(k2, pa.int64()),
                "day": pa.array(d2, pa.int64()),
                "bit": pa.array(b2, pa.int64()),
                "bucket": pa.array(
                    (bh % np.uint64(num_partitions)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def pair_partial(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "pid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        kk = g.column("k").to_numpy(zero_copy_only=False)
        dd = g.column("day").to_numpy(zero_copy_only=False)
        bit = g.column("bit").to_numpy(zero_copy_only=False)
        order = np.lexsort((bit, dd, kk))
        kk, dd, bits = kk[order], dd[order], bit[order]
        keep = np.empty(len(kk), bool)
        keep[0] = True
        keep[1:] = (
            (kk[1:] != kk[:-1]) | (dd[1:] != dd[:-1]) | (bits[1:] != bits[:-1])
        )
        kk, dd, bits = kk[keep], dd[keep], bits[keep]
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (kk[1:] != kk[:-1]) | (dd[1:] != dd[:-1]))
            )
        )
        masks = np.bitwise_or.reduceat(
            np.uint64(1) << bits.astype(np.uint64), starts
        )
        out_pid = [np.array([K * K], np.int64)]  # pid K*K = basket count
        out_n = [np.array([len(masks)], np.int64)]
        for i in range(K):
            has_i = (masks >> np.uint64(i)) & np.uint64(1)
            ni = int(has_i.sum())
            if ni:
                out_pid.append(np.array([K * K + 1 + i], np.int64))
                out_n.append(np.array([ni], np.int64))
            for j in range(i + 1, K):
                nij = int((has_i & (masks >> np.uint64(j))).sum())
                if nij:
                    out_pid.append(np.array([i * K + j], np.int64))
                    out_n.append(np.array([nij], np.int64))
        return pa.table(
            {
                "pid": pa.array(np.concatenate(out_pid), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    combined = [
        t
        for t in ray.get(
            tree_groupby(
                events_ds.map_batches(
                    basket_rows, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("bucket")
                .map_groups(pair_partial, batch_format="pyarrow"),
                ["pid"],
                [("n", "sum")],
                max_groups=(max_items + 2) * (max_items + 2),
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not combined:
        return rd.from_arrow(empty)
    agg = pa.concat_tables(combined)
    pid = agg.column("pid").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    lut = dict(zip(pid.tolist(), n.tolist()))
    N = lut.get(K * K, 0)
    rows = {"item_a": [], "item_b": [], "n_a": [], "n_b": [], "n_ab": [],
            "n_baskets": [], "lifted": []}
    for i in range(K):
        for j in range(i + 1, K):
            nab = lut.get(i * K + j, 0)
            if not nab:
                continue
            na = lut.get(K * K + 1 + i, 0)
            nbv = lut.get(K * K + 1 + j, 0)
            rows["item_a"].append(items[i])
            rows["item_b"].append(items[j])
            rows["n_a"].append(na)
            rows["n_b"].append(nbv)
            rows["n_ab"].append(nab)
            rows["n_baskets"].append(N)
            rows["lifted"].append(
                int(t_den * nab * N > t_num * na * nbv)
            )
    return rd.from_arrow(
        pa.table(
            {
                "item_a": pa.array(rows["item_a"], pa.string()),
                "item_b": pa.array(rows["item_b"], pa.string()),
                "n_a": pa.array(rows["n_a"], pa.int64()),
                "n_b": pa.array(rows["n_b"], pa.int64()),
                "n_ab": pa.array(rows["n_ab"], pa.int64()),
                "n_baskets": pa.array(rows["n_baskets"], pa.int64()),
                "lifted": pa.array(rows["lifted"], pa.int64()),
            }
        )
    )
