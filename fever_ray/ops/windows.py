"""Event-time windowing + sessionization + as-of join.

The reference's windows are processing-time tumbling flushes per aggregator
(SURVEY §2.11; e.g. /root/reference/processing/flow_aggregator.go:152-170 —
a timer goroutine, no event time, no watermarks).  In a batch Ray Data
engine, windows become event-time bucket KEYS — strictly stronger semantics
(late data lands in the right window by construction):

* ``tumbling_window``  — GROUP BY (bucket(ts), key) with the usual
  partial+combine shape; bucket = floor(epoch/size).
* ``sessionize``       — fever's flow-context grouping
  (context_collector.go:95-133 keys events by flow_id and closes on a
  terminal event / TTL) generalized: per-key gap-based session windows via
  ``groupby(key).map_groups`` over ts-sorted groups.
* ``asof_join``        — each left row matched to the latest right row with
  ts ≤ left.ts per key: bucketed co-group + a sorted-run ``searchsorted``
  Arrow kernel per bucket (the custom-operator pattern: partitioning
  assumption = one key's rows fit a group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .aggregates import _cents, _uncents, tree_groupby
from .dedup import _arrow_schema


def tumbling_window(events_ds, ts_col: str = "ts", key: str | None = "event_type",
                    size_s: int = 3600, value_col: str = "value",
                    strategy: str = "tree"):
    """Per-(window, key) count + sum over ``value_col``.

    Window id = floor(epoch_seconds / size_s) * size_s (window start epoch).
    """
    keys = ["window_start"] + ([key] if key else [])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())  # microseconds
        win = pc.multiply(
            pc.divide(epoch, pa.scalar(size_s * 1_000_000, type=pa.int64())),
            pa.scalar(size_s * 1_000_000, type=pa.int64()),
        ).cast(pa.timestamp("us"))
        batch = batch.append_column("window_start", win)
        batch = batch.append_column("val_c", _cents(batch.column(value_col)))
        t = pa.TableGroupBy(batch.select(keys + ["val_c"]), keys).aggregate(
            [("val_c", "count"), ("val_c", "sum")]
        )
        return t.rename_columns(keys + ["n", "val_c"])

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        out = tree_groupby(partials, keys, [("n", "sum"), ("val_c", "sum")])
    else:
        from ray.data.aggregate import Sum

        out = partials.groupby(keys).aggregate(
            Sum("n", alias_name="n"), Sum("val_c", alias_name="val_c")
        )
    return out.map_batches(_finish_sum_value, batch_format="pyarrow")


def window_distinct(events_ds, ts_col: str = "ts", size_s: int = 3600,
                    key_col: str = "user_id"):
    """Per-tumbling-window EXACT distinct keys — the windows × distinct
    composition (e.g. hourly unique users).  Two-level distinct like
    ``dns_aggregator``: per-batch (window, key) dedup bounds the shuffle by
    distinct pairs per batch, a second dedup level collapses across
    batches, and the final count runs over the (windows × keys)-bounded
    pair set.  At key-explosion scale the grouped-HLL path replaces the
    exact count; this is the exact form the oracle can gate."""

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64())
        win = pc.multiply(
            pc.divide(epoch, pa.scalar(size_s * 1_000_000, type=pa.int64())),
            pa.scalar(size_s * 1_000_000, type=pa.int64()),
        ).cast(pa.timestamp("us"))
        t = pa.table({"window_start": win, key_col: batch.column(key_col)})
        return t.group_by(["window_start", key_col]).aggregate([])

    pairs = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    dedup1 = pairs.map_batches(
        lambda b: b.group_by(["window_start", key_col]).aggregate([]),
        batch_format="pyarrow",
        batch_size=65536,
    )

    def final(batch: pa.Table) -> pa.Table:
        d = batch.group_by(["window_start", key_col]).aggregate([])
        t = pa.TableGroupBy(d.select(["window_start"]), ["window_start"]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns(["window_start", "n_distinct"])

    return dedup1.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None
    )


def window_top_k(events_ds, ts_col: str = "ts", key_col: str = "user_id",
                 size_s: int = 86400, k: int = 3, num_partitions: int = 32):
    """Per-tumbling-window top-``k`` keys by event count — the trending /
    leaderboard composition (windows × grouped counts × per-group top-k).

    Output rows: (window_start timestamp[us], key_col, n int64, rn int64
    1-based rank); ties break toward the smaller key, so the result is a
    pure function of the data.  ``key_col`` must be integer-typed.

    Scale shape: per-batch (window, key) partial counts bound the ONE
    shuffle by distinct pairs per batch (not events); buckets co-locate
    whole windows (hash of window id), and the per-bucket kernel finishes
    count summing AND top-k ranking in the same vectorized pass — nothing
    window-count-sized ever reaches the driver."""
    size_us = np.int64(size_s) * np.int64(1_000_000)

    from ..sketches.hashing import bucket_of

    def partial(batch: pa.Table) -> pa.Table:
        # null ts or key rows are SKIPPED (the build_sketches null
        # contract; the oracle corpora are null-free — a null key would
        # otherwise decode as INT64_MIN and outrank real keys)
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(key_col))
            )
        )
        if batch.num_rows == 0:
            return pa.table(
                {"w": pa.array([], pa.int64()), "key": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64()), "bucket": pa.array([], pa.int32())}
            )
        epoch = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        win = (epoch // size_us) * size_us
        keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((keys, win))
        ws, ks = win[order], keys[order]
        starts = np.concatenate(
            ([0], np.nonzero((np.diff(ws) != 0) | (np.diff(ks) != 0))[0] + 1)
        )
        ends = np.append(starts[1:], len(ws))
        return pa.table(
            {
                "w": pa.array(ws[starts], pa.int64()),
                "key": pa.array(ks[starts], pa.int64()),
                "n": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "bucket": pa.array(bucket_of(ws[starts], num_partitions), pa.int32()),
            }
        )

    def topk_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "window_start": pa.array([], pa.timestamp("us")),
                key_col: pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or group.num_columns == 0:
            return empty
        w = group.column("w").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        # final sums per (window, key): sorted runs + prefix-sum diffs
        order = np.lexsort((key, w))
        ws, ks, ns = w[order], key[order], n[order]
        starts = np.concatenate(
            ([0], np.nonzero((np.diff(ws) != 0) | (np.diff(ks) != 0))[0] + 1)
        )
        cs = np.concatenate(([0], np.cumsum(ns)))
        ends = np.append(starts[1:], len(ns))
        tot = cs[ends] - cs[starts]
        uw, uk = ws[starts], ks[starts]
        # rank within window by (count DESC, key ASC): one lexsort + run-rank
        order2 = np.lexsort((uk, -tot, uw))
        w2, k2, t2 = uw[order2], uk[order2], tot[order2]
        wstart = np.concatenate(([0], np.nonzero(np.diff(w2) != 0)[0] + 1))
        run_id = np.cumsum(np.concatenate(([0], (np.diff(w2) != 0).astype(np.int64))))
        rn = np.arange(len(w2), dtype=np.int64) - wstart[run_id] + 1
        keep = rn <= k
        return pa.table(
            {
                "window_start": pa.array(w2[keep], pa.int64()).cast(pa.timestamp("us")),
                key_col: pa.array(k2[keep], pa.int64()),
                "n": pa.array(t2[keep], pa.int64()),
                "rn": pa.array(rn[keep], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(topk_bucket, batch_format="pyarrow")
    )


def _finish_sum_value(batch: pa.Table) -> pa.Table:
    """Replace the integer-cents partial column with the float sum_value."""
    cols = {n: batch.column(n) for n in batch.column_names if n != "val_c"}
    cols["sum_value"] = _uncents(batch.column("val_c"))
    return pa.table(cols)


def hopping_window(events_ds, ts_col: str = "ts", key: str | None = "event_type",
                   size_s: int = 3600, step_s: int = 900, value_col: str = "value",
                   strategy: str = "tree"):
    """Hopping (sliding) windows: window starts at every multiple of
    ``step_s``; an event at t belongs to each window with start in
    (t - size_s, t].  Each row fans out to size/step window replicas
    (vectorized np.repeat), then the usual partial+combine.
    """
    assert size_s % step_s == 0, "step must divide size"
    n_hops = size_s // step_s
    keys = ["window_start"] + ([key] if key else [])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        step_us = step_s * 1_000_000
        base = (epoch // step_us) * step_us  # latest window start containing t
        n = len(epoch)
        # fan out: window_start = base - k*step for k in 0..n_hops-1
        ks = np.tile(np.arange(n_hops, dtype=np.int64) * step_us, n)
        starts = np.repeat(base, n_hops) - ks
        rep_idx = np.repeat(np.arange(n, dtype=np.int64), n_hops)
        # project to the needed columns BEFORE the n_hops-way fan-out —
        # taking the full table would replicate every payload column
        # n_hops times only to drop them in the select below
        narrow = batch.select(([key] if key else []) + [value_col])
        rep = narrow.take(pa.array(rep_idx))
        rep = rep.append_column(
            "window_start", pa.array(starts, type=pa.int64()).cast(pa.timestamp("us"))
        )
        rep = rep.append_column("val_c", _cents(rep.column(value_col)))
        t = pa.TableGroupBy(rep.select(keys + ["val_c"]), keys).aggregate(
            [("val_c", "count"), ("val_c", "sum")]
        )
        return t.rename_columns(keys + ["n", "val_c"])

    partials = events_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if strategy == "tree":
        out = tree_groupby(partials, keys, [("n", "sum"), ("val_c", "sum")])
    else:
        from ray.data.aggregate import Sum

        out = partials.groupby(keys).aggregate(
            Sum("n", alias_name="n"), Sum("val_c", alias_name="val_c")
        )
    return out.map_batches(_finish_sum_value, batch_format="pyarrow")


def sessionize(events_ds, key: str = "user_id", ts_col: str = "ts",
               gap_s: int = 1800, num_partitions: int | None = None):
    """Gap-based session windows per key — fever's flow-context grouping
    (context_collector.go:39-143; its TTL cap is our gap) as event-time
    sessions.

    Returns one row per session: (key, session_id, session_start,
    session_end, n_events).  session_id = per-key ordinal (0-based by start
    time).

    Scale shape: ONE shuffle of (key-hash % P) coarse buckets — NOT a
    per-key ``map_groups`` (high-cardinality keys would pay a per-group
    sort-shuffle + Python call each); inside a bucket one np.lexsort +
    vectorized gap/run scan emits every key's sessions at once (the
    ``running_totals`` kernel shape).  Partitioning assumption: one
    BUCKET fits a worker — P scales with input blocks via ``_auto_parts``.
    """
    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts, _key_runs

    gap_us = gap_s * 1_000_000
    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    key_type = _arrow_schema(events_ds).field(key).type

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(
                    f"sessionize: {c} contains nulls — filter or fill first"
                )
        return narrow.append_column(
            "bucket", pa.array(bucket_of(batch.column(key), n_parts), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "session_id": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.timestamp("us")),
                    "session_end": pa.array([], pa.timestamp("us")),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        ts = pc.cast(
            g.column(ts_col).cast(pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, kcodes))
        tO = ts[order]
        starts_term = _key_runs(kcodes[order])
        run_start = starts_term[:-1]
        n = len(order)
        # a session opens at every key boundary and at every within-key gap
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        np.greater(tO[1:] - tO[:-1], gap_us, out=new_sess[1:])
        new_sess[run_start] = True
        s_start = np.flatnonzero(new_sess)
        s_stop = np.append(s_start[1:], n)  # exclusive
        # per-key ordinal: sessions are contiguous per key run
        first_sess_of_run = np.searchsorted(s_start, run_start)
        sess_per_run = np.diff(np.append(first_sess_of_run, len(s_start)))
        sid = np.arange(len(s_start), dtype=np.int64) - np.repeat(
            first_sess_of_run, sess_per_run
        )
        return pa.table(
            {
                key: kc.take(pa.array(order[s_start], pa.int64())),
                "session_id": pa.array(sid, pa.int64()),
                "session_start": pa.array(tO[s_start], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "session_end": pa.array(tO[s_stop - 1], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "n_events": pa.array(s_stop - s_start, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _bucket_exchange(both, n_buckets: int, join_bucket, empty: pa.Table,
                     max_cells: int = 256):
    """Two-stage raw-task exchange replacing ``groupby("__bucket")
    .map_groups(join_bucket)`` for the co-grouped join kernels.

    Why not the Dataset groupby: at 300M+ rows the union's tag maps and
    the sort operator interlock inside one streaming execution — the
    maps sit backpressured holding both sides' full output (23.5 GB)
    while the sort admits nothing and CPUs idle (measured round 5; a
    lazy repartition and an explicit 30 GB resource budget both leave
    the same wedge, and a pinned materialize of the union overflows
    store + spill).  The exchange does what the sort would, with raw
    tasks: each tagged block splits by ``__bucket % K`` into K pieces
    (``num_returns`` fan-out — pieces stream straight to their reducer,
    nothing is globally pinned), and each cell task concatenates its
    pieces and runs ``join_bucket`` once.  Correctness does not depend
    on one-bucket-per-cell: the kernels co-group keys internally
    (dictionary codes), and ``__bucket = hash(key) % n_buckets`` keeps
    every key wholly inside one cell.  Every row moves exactly once;
    K ≤ ``max_cells`` bounds the fan-out width while cells stay
    key-complete for any n_buckets."""
    import ray
    import ray.data as rd

    K = max(1, min(max_cells, n_buckets))

    @ray.remote(num_cpus=0.5)
    def split(tab: pa.Table, K_: int):
        if not tab.num_rows or not tab.num_columns:
            return [None] * K_ if K_ > 1 else None
        b = (
            tab.column("__bucket").to_numpy(zero_copy_only=False)
            % K_
        )
        order = np.argsort(b, kind="stable")
        t = tab.take(pa.array(order))
        bs = b[order]
        bounds = np.searchsorted(bs, np.arange(K_ + 1))
        out = [
            t.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
            if bounds[k + 1] > bounds[k]
            else None
            for k in range(K_)
        ]
        return out if K_ > 1 else out[0]

    @ray.remote(num_cpus=1)
    def reduce_cell(*pieces):
        tabs = [p for p in pieces if p is not None and p.num_rows]
        if not tabs:
            return empty
        return join_bucket(pa.concat_tables(tabs))

    refs = both.to_arrow_refs()
    piece_refs = [split.options(num_returns=K).remote(r, K) for r in refs]
    if K == 1:
        piece_refs = [[r] for r in piece_refs]
    outs = [
        reduce_cell.remote(*[pr[k] for pr in piece_refs]) for k in range(K)
    ]
    return rd.from_arrow_refs(outs)


def _union_cogroup(both, n_buckets: int, join_bucket, empty: pa.Table,
                   exchange_rows: int = 16_000_000):
    """Run ``join_bucket`` over every ``__bucket`` co-group of the tagged
    union, picking the shuffle mechanism by MEASURED size: the union is
    materialized (which also breaks the tag-map/sort backpressure
    interlock — see `_bucket_exchange`), its row count read for free,
    and unions past ``exchange_rows`` take the raw-task exchange while
    smaller ones keep the Dataset groupby (the exchange's fan-out
    overhead costs ~1.5 s at 3M rows where the sort shuffle is already
    fast — measured round 5)."""
    both = both.materialize()
    if both.count() > exchange_rows:
        return _bucket_exchange(both, n_buckets, join_bucket, empty)
    return both.groupby("__bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def asof_join(left_ds, right_ds, key: str, ts_col: str = "ts",
              n_buckets: int | None = None, direction: str = "backward",
              right_cols: list[str] | None = None):
    """As-of join: for each left row, the latest right row with
    right.ts <= left.ts (direction='backward'; 'forward' = earliest right
    row with right.ts >= left.ts) sharing ``key``.

    Implementation: hash-bucket both sides on key, union with a side tag,
    co-group per bucket; inside a bucket both sides sort by (key-code, ts)
    once and one vectorized ``searchsorted`` per left key-run finds each
    row's match — the same sorted-run Arrow kernel as ``sessionize`` /
    ``interval_join``, no pandas conversion anywhere (ties on right.ts
    resolve to the last row in stable input order, pd.merge_asof's rule).
    Unmatched left rows keep their exact integer dtypes; the ``r_*``
    columns are null for them.  Partitioning assumption: one bucket fits a
    worker.  n_buckets defaults to ``_auto_parts`` over the LARGER side
    (the ops/dedup.py pattern), so rows/bucket stays roughly constant as
    the input grows instead of one bucket owning 1/16 of everything; salt
    hot keys upstream if needed.
    """
    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts

    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join: direction must be 'backward' or 'forward', got "
            f"{direction!r}"
        )

    if n_buckets is None:
        n_buckets = max(
            _auto_parts(left_ds, floor=16), _auto_parts(right_ds, floor=16)
        )

    def _bucket_of(col) -> np.ndarray:
        return bucket_of(col, n_buckets)

    def tag(side, cols):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(cols)
            b = _bucket_of(batch.column(key))
            batch = batch.append_column("__bucket", pa.array(b, type=pa.int32()))
            return batch.append_column("__side", pa.array([side] * batch.num_rows))

        return fn

    lschema = _arrow_schema(left_ds)
    l_cols = list(lschema.names)
    r_cols = right_cols if right_cols else list(_arrow_schema(right_ds).names)
    if key not in r_cols:
        r_cols = [key] + r_cols
    if ts_col not in r_cols:
        r_cols = r_cols + [ts_col]

    # pad to a common schema for union
    def pad(cols_needed, src_cols, side):
        base = tag(side, src_cols)

        def fn(batch: pa.Table) -> pa.Table:
            batch = base(batch)
            for name in cols_needed:
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(batch.num_rows, all_types[name])
                    )
            return batch.select(sorted(batch.column_names))

        return fn

    all_types = {}
    for f in lschema:
        all_types[f.name] = f.type
    for f in _arrow_schema(right_ds):
        if f.name not in all_types:
            all_types[f.name] = f.type
    # right-side value columns get a suffix to avoid collision (except key/ts)
    r_value_cols = [c for c in r_cols if c not in (key, ts_col)]
    union_cols = set(l_cols) | {key, ts_col} | {f"r_{c}" for c in r_value_cols}

    def prep_right(batch: pa.Table) -> pa.Table:
        batch = batch.select(r_cols)
        for c in r_value_cols:
            batch = batch.rename_columns(
                [f"r_{n}" if n == c else n for n in batch.column_names]
            )
        return batch

    right_renamed = right_ds.map_batches(prep_right, batch_format="pyarrow")
    for c in r_value_cols:
        all_types[f"r_{c}"] = all_types[c]

    left_t = left_ds.map_batches(
        pad(union_cols, l_cols, "l"), batch_format="pyarrow"
    )
    right_t = right_renamed.map_batches(
        pad(union_cols, [key, ts_col] + [f"r_{c}" for c in r_value_cols], "r"),
        batch_format="pyarrow",
    )

    # output = left columns (sorted-name order, matching the old pandas
    # column order) + r_-prefixed right value columns, null where unmatched
    out_l = sorted(l_cols)
    out_types = {c: all_types[c] for c in out_l}
    for c in r_value_cols:
        out_types[f"r_{c}"] = all_types[c]
    out_names = out_l + [f"r_{c}" for c in r_value_cols]
    empty = pa.table({c: pa.nulls(0, out_types[c]) for c in out_names})
    backward = direction == "backward"

    def _ts_i64(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a = col.to_numpy(zero_copy_only=False)
        return a.view(np.int64) if a.dtype.kind == "M" else a.astype(np.int64)

    def join_bucket(g: pa.Table) -> pa.Table:
        # ONE merged lexsort over both sides + a segment-reset running max
        # replaces the r4 per-key-run searchsorted loop (measured 4.1x on a
        # 200k/70k/20k-key bucket, bit-identical incl. tie rules): sort
        # (key-code, 2*ts + side) so at equal (key, ts) right rows precede
        # left rows, then forward-fill each right row's merged position
        # within its key segment — for every left row the filled value IS
        # its backward match (last right with rts <= lts; equal-ts ties
        # take the last row in stable input order, pd.merge_asof's rule).
        # The 2*ts+side packing assumes |ts| < 2^62 (any epoch unit fits);
        # seg*(n+1) fits int64 for any bucket under ~3e9 rows.
        if not g.num_rows or not g.num_columns:
            # empty map_groups partitions arrive as ZERO-COLUMN tables
            return empty
        side = g.column("__side")
        lt = g.filter(pc.equal(side, "l"))
        nl = lt.num_rows
        if not nl:
            return empty
        rt = g.filter(pc.equal(side, "r"))
        nr = rt.num_rows
        codes = (
            pc.dictionary_encode(
                pa.concat_arrays(
                    [lt.column(key).combine_chunks(),
                     rt.column(key).combine_chunks()]
                )
            ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        lts = _ts_i64(lt.column(ts_col))
        if not nr:
            lorder = np.lexsort((lts, codes))
            match = np.zeros(0, np.int64)
            valid = np.zeros(nl, dtype=bool)
        else:
            rts = _ts_i64(rt.column(ts_col))
            n = nl + nr
            tm = np.concatenate([lts, rts])
            fm = np.zeros(n, np.int64)
            fm[:nl] = 1  # rights sort before lefts at equal (key, ts)
            if backward:
                order = np.lexsort((tm * 2 + fm, codes))
            else:
                # forward = backward on -ts; equal-ts rights additionally
                # reverse input order so the running MAX picks the FIRST
                # input row (searchsorted side='left' semantics)
                tb = np.zeros(n, np.int64)
                tb[nl:] = -np.arange(nr, dtype=np.int64)
                order = np.lexsort((tb, (-tm) * 2 + fm, codes))
            is_left = order < nl
            p = np.arange(n, dtype=np.int64)
            val = np.where(is_left, 0, p + 1)
            km_s = codes[order]
            seg = np.zeros(n, np.int64)
            seg[1:] = np.cumsum(np.diff(km_s) != 0)
            base = seg * (n + 1)
            ff = np.maximum.accumulate(base + val) - base
            ffl = ff[is_left]
            valid = ffl > 0
            merged_idx = np.where(valid, ffl - 1, 0)
            right_orig = np.where(valid, order[merged_idx] - nl, 0)
            left_orig = order[is_left]
            if backward:
                # scan order restricted to lefts already IS the stable
                # (key, ts) output order — no second sort
                lorder, match = left_orig, right_orig
            else:
                match_orig = np.full(nl, -1, np.int64)
                match_orig[left_orig] = np.where(valid, right_orig, -1)
                lorder = np.lexsort((lts, codes[:nl]))
                match = match_orig[lorder]
                valid = match >= 0
                match = np.where(valid, match, 0)
        l_take = pa.array(lorder, pa.int64())
        cols = {}
        for c in out_l:
            cols[c] = pc.take(lt.column(c), l_take)
        if nr:
            r_take = pa.array(match, pa.int64(), mask=~valid)
            for c in r_value_cols:
                cols[f"r_{c}"] = pc.take(rt.column(f"r_{c}"), r_take)
        else:
            for c in r_value_cols:
                cols[f"r_{c}"] = pa.nulls(nl, out_types[f"r_{c}"])
        return pa.table(cols)

    return _union_cogroup(
        left_t.union(right_t), n_buckets, join_bucket, empty
    )


# ------------------------------------------------------------ interval join
def interval_join(
    left_ds,
    right_ds,
    key: str,
    ts_col: str = "ts",
    lo: int = 0,
    hi: int = 0,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    n_buckets: int | None = None,
):
    """Event-time range join: for each left row, EVERY right row sharing
    ``key`` with ``right.ts − left.ts ∈ [lo, hi]`` microseconds (inclusive
    both ends) — the "context events within Δ of a trigger" shape the
    reference's flow-context cache serves point-wise
    (/root/reference/processing/context_collector.go), generalized to a
    set-valued window.  Complements ``asof_join`` (nearest single match).

    Output: left columns + right value columns prefixed ``r_`` (+ ``r_ts``)
    — one row per qualifying (left, right) pair.

    Implementation: hash-bucket both sides on ``key``, union with a side
    tag, co-group per bucket; inside a bucket both sides sort by
    (key-code, ts) once, then per key-run TWO vectorized ``searchsorted``
    calls bound each left row's right-match span and one repeat/cumsum
    range expansion materializes all pairs — no per-row Python, the only
    Python loop is per DISTINCT KEY in the bucket (the coarse-partition +
    vectorized-runs posture of the dedup family).  Partitioning
    assumption: one bucket's rows fit a worker; n_buckets defaults to
    ``_auto_parts`` over the LARGER side (the asof_join rule) so
    rows/bucket stays roughly constant as the input grows; salt hot keys
    upstream if needed.
    """
    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts

    if lo > hi:
        raise ValueError(f"interval_join: lo ({lo}) > hi ({hi})")
    if n_buckets is None:
        n_buckets = max(
            _auto_parts(left_ds, floor=16), _auto_parts(right_ds, floor=16)
        )

    def _bucket_of(col) -> np.ndarray:
        return bucket_of(col, n_buckets)

    lschema = _arrow_schema(left_ds)
    rschema = _arrow_schema(right_ds)
    l_cols = left_cols or list(lschema.names)
    if key not in l_cols:
        l_cols = [key] + l_cols
    if ts_col not in l_cols:
        l_cols = l_cols + [ts_col]
    r_cols = right_cols or list(rschema.names)
    if key not in r_cols:
        r_cols = [key] + r_cols
    if ts_col not in r_cols:
        r_cols = r_cols + [ts_col]
    r_value_cols = [c for c in r_cols if c != key]

    types = {f.name: f.type for f in lschema}
    for f in rschema:
        types.setdefault(f.name, f.type)
    out_names = l_cols + [f"r_{c}" for c in r_value_cols]
    out_types = {**{c: types[c] for c in l_cols},
                 **{f"r_{c}": types[c] for c in r_value_cols}}
    union_names = sorted(set(out_names))

    def tag(side: str, cols: list[str], rename_r: bool):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(cols)
            if rename_r:
                batch = batch.rename_columns(
                    [c if c == key else f"r_{c}" for c in batch.column_names]
                )
            b = _bucket_of(batch.column(key))
            for name in union_names:
                if name not in batch.column_names:
                    batch = batch.append_column(
                        name, pa.nulls(batch.num_rows, out_types[name])
                    )
            batch = batch.select(union_names)
            batch = batch.append_column("__bucket", pa.array(b, pa.int32()))
            return batch.append_column(
                "__side", pa.array([side] * batch.num_rows)
            )

        return fn

    left_t = left_ds.map_batches(tag("l", l_cols, False), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag("r", r_cols, True), batch_format="pyarrow")

    empty = pa.table(
        {c: pa.nulls(0, out_types[c]) for c in out_names}
    )

    def _ts_i64(col) -> np.ndarray:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a = col.to_numpy(zero_copy_only=False)
        return a.view(np.int64) if a.dtype.kind == "M" else a.astype(np.int64)

    def join_bucket(g: pa.Table) -> pa.Table:
        if not g.num_rows or not g.num_columns:
            # empty map_groups partitions arrive as ZERO-COLUMN tables
            return empty
        side = g.column("__side")
        lt = g.filter(pc.equal(side, "l"))
        rt = g.filter(pc.equal(side, "r"))
        if not lt.num_rows or not rt.num_rows:
            return empty
        keys = pa.concat_arrays(
            [
                lt.column(key).combine_chunks().cast(pa.string())
                if pa.types.is_string(lschema.field(key).type)
                else lt.column(key).combine_chunks(),
                rt.column(key).combine_chunks().cast(pa.string())
                if pa.types.is_string(lschema.field(key).type)
                else rt.column(key).combine_chunks(),
            ]
        )
        codes = pc.dictionary_encode(keys).indices.to_numpy(zero_copy_only=False)
        nl = lt.num_rows
        lc, rc = codes[:nl].astype(np.int64), codes[nl:].astype(np.int64)
        lts = _ts_i64(lt.column(ts_col))
        rts = _ts_i64(rt.column(f"r_{ts_col}"))  # right cols carry the r_ prefix
        lorder = np.lexsort((lts, lc))
        rorder = np.lexsort((rts, rc))
        lc, lts = lc[lorder], lts[lorder]
        rc, rts = rc[rorder], rts[rorder]

        los = np.zeros(nl, dtype=np.int64)
        his = np.zeros(nl, dtype=np.int64)
        run_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(lc) != 0) + 1, [nl])
        )
        for a, b in zip(run_starts[:-1], run_starts[1:]):
            cs = int(np.searchsorted(rc, lc[a]))
            ce = int(np.searchsorted(rc, lc[a], side="right"))
            blk = rts[cs:ce]
            los[a:b] = cs + np.searchsorted(blk, lts[a:b] + lo, side="left")
            his[a:b] = cs + np.searchsorted(blk, lts[a:b] + hi, side="right")
        counts = his - los
        tot = int(counts.sum())
        if tot == 0:
            return empty
        li = np.repeat(np.arange(nl, dtype=np.int64), counts)
        offs = np.zeros(nl + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        ri = np.ones(tot, dtype=np.int64)
        # seed with row 0's span start even when its count is 0: the
        # boundary deltas telescope through zero-count rows (np.add.at
        # stacks multiple boundaries on one index), exactly as in
        # trainprep._gather_byte_ranges
        ri[0] = los[0]
        nz = offs[1:-1]
        keep = nz < tot
        deltas = (los[1:] - (los[:-1] + counts[:-1]))
        np.add.at(ri, nz[keep], deltas[keep])
        np.cumsum(ri, out=ri)

        l_take = pa.array(lorder[li], pa.int64())
        r_take = pa.array(rorder[ri], pa.int64())
        cols = {}
        for c in l_cols:
            cols[c] = pc.take(lt.column(c), l_take)
        for c in r_value_cols:
            cols[f"r_{c}"] = pc.take(rt.column(f"r_{c}"), r_take)
        return pa.table(cols)

    return _union_cogroup(
        left_t.union(right_t), n_buckets, join_bucket, empty
    )


def _window_tag_fn(key, ts_col, id_col, value_col, n_parts, op: str):
    """Shared projection+bucket stage of the per-key window ops
    (`running_totals`, `rolling_window_sum`): narrow to the four columns,
    validate loudly, append the key-hash bucket.

    Guards (shared so the two bit-identity-critical kernels cannot
    drift): ``ts_col`` must be timestamp[us] (the int64 cast downstream
    re-emits us-epoch — any other unit would silently scale timestamps),
    and key/ts/value/id must be null-free — SQL's window null semantics
    (SUM skips NULL values but COUNT(*) doesn't; NULL keys form ONE
    partition) are not what NaN-poisoned cumsums produce, so a null here
    is a silent-divergence bug, not data."""
    from ..sketches.hashing import bucket_of

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([id_col, key, ts_col, value_col])
        tst = narrow.schema.field(ts_col).type
        if not (
            pa.types.is_timestamp(tst) and tst.unit == "us" and tst.tz is None
        ):
            raise ValueError(
                f"{op}: {ts_col} must be naive timestamp[us], got {tst} — "
                "cast first (the kernel re-emits naive us-epoch, so a "
                "tz-aware input would silently lose its zone)"
            )
        for c in (key, ts_col, value_col, id_col):
            if narrow.column(c).null_count:
                raise ValueError(
                    f"{op}: {c} contains nulls — SQL window null semantics "
                    "(SUM skips NULL, NULL keys form one partition) are "
                    "not mirrored by the vectorized kernel; filter or "
                    "fill first"
                )
        return narrow.append_column(
            "bucket", pa.array(bucket_of(batch.column(key), n_parts), pa.int32())
        )

    return tag


def _key_sort_runs(g: pa.Table, key, ts_col, id_col):
    """The ONE (key, ts, id) tie-order rule of every per-key window
    kernel: sort — dictionary codes give lexsort an integer key column
    even for string keys — and detect key-run boundaries via the shared
    `dedup._key_runs`.  Returns (kc, ids, ts, order, run_start,
    run_len); factored so the bit-identity-critical kernels
    (`running_totals`, `rolling_window_sum`, `time_range_sum`,
    `locf_fill`) cannot drift."""
    from .dedup import _key_runs

    ids = g.column(id_col).to_numpy(zero_copy_only=False)
    kc = g.column(key)
    if isinstance(kc, pa.ChunkedArray):
        kc = kc.combine_chunks()
    kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ts, kcodes))
    starts_term = _key_runs(kcodes[order])
    return kc, ids, ts, order, starts_term[:-1], np.diff(starts_term)


def _sorted_key_runs(g: pa.Table, key, ts_col, id_col, value_col):
    """`_key_sort_runs` plus exact cents from the shared `_cents` map,
    everything gathered into sorted order.  Returns (kc, order, tO, iO,
    cO, run_start, run_len)."""
    kc, ids, ts, order, run_start, run_len = _key_sort_runs(
        g, key, ts_col, id_col
    )
    cents = _cents(g.column(value_col)).to_numpy(zero_copy_only=False)
    return kc, order, ts[order], ids[order], cents[order], run_start, run_len


def running_totals(events_ds, key: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", id_col: str = "event_id",
                   num_partitions: int | None = None):
    """Per-key cumulative window analytics — the SQL
    ``SUM(...) OVER (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` family as one vectorized pass:

    * ``rn``       — 1-based row number within the key's event-time order
    * ``run_sum``  — running sum of ``value_col`` (exact integer cents
      internally, so the result is order-independent and bit-stable — the
      same discipline as ``pricing_summary``)
    * ``gap_us``   — microseconds since the key's previous event
      (-1 sentinel on each key's first event; avoids a nullable-int column
      that pandas would silently float)

    The reference has no window functions; this is the event-time
    generalization of its per-flow counters
    (/root/reference/processing/flow_aggregator.go:129-170), which only
    ever exposed the FINAL totals per flush — here every row carries its
    prefix aggregate.

    Scale shape: one shuffle of (key-hash % P) coarse buckets; inside a
    bucket one np.lexsort + run-boundary cumsum handles every key at once
    (no per-key map_groups).  Partitioning assumption: one BUCKET of rows
    fits a worker — P scales with input blocks.  Output rows == input rows,
    streamed back out; nothing materializes on the driver.
    """
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    id_type = base_schema.field(id_col).type
    tag = _window_tag_fn(key, ts_col, id_col, value_col, n_parts,
                         "running_totals")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    key: pa.array([], key_type),
                    # ts is always re-emitted as us-epoch timestamps below
                    ts_col: pa.array([], pa.timestamp("us")),
                    "rn": pa.array([], pa.int64()),
                    "run_sum": pa.array([], pa.float64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        kc, order, tO, iO, cO, run_start, run_len = _sorted_key_runs(
            g, key, ts_col, id_col, value_col
        )
        n = len(order)
        cs = np.cumsum(cO)
        prev = np.where(run_start > 0, cs[run_start - 1], 0)
        run_sum_c = cs - np.repeat(prev, run_len)
        rn = np.arange(n, dtype=np.int64) - np.repeat(run_start, run_len) + 1
        starts = np.zeros(n, dtype=bool)
        starts[run_start] = True
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        np.subtract(tO[1:], tO[:-1], out=gap[1:])
        gap[starts] = -1
        return pa.table(
            {
                id_col: pa.array(iO),
                key: kc.take(pa.array(order, pa.int64())),
                ts_col: pa.array(tO, pa.int64()).cast(pa.timestamp("us")),
                "rn": pa.array(rn, pa.int64()),
                "run_sum": pa.array(run_sum_c.astype(np.float64) / 100.0, pa.float64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def decayed_counts(
    events_ds,
    ref_ts: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    half_life_s: int = 86400,
    k_bits: int = 40,
    top_k: int | None = None,
):
    """Exponential recency-weighted activity score per key — the trending /
    "what's hot now" aggregate: each event contributes
    ``2^(k_bits - age_buckets)`` where ``age_buckets = floor(age /
    half_life_s)``, so an event loses exactly half its weight every
    half-life.  Pure power-of-2 integer weights make the score EXACT and
    order-independent (float exponential decay drifts by summation order
    and can never be bit-stable across engines).

    Output rows: (``key_col``, ``score`` int64), descending (score, then
    ascending key) and truncated to ``top_k`` when given.  Events at or
    after ``ref_ts`` count at full weight (age clamps to 0); events older
    than 63 half-lives contribute 0 (the shift floors out) — both edges
    are deterministic, documented semantics, not accidents.  Null ts/key
    rows are skipped (the sketch-build null contract).

    Scale shape: weights are computed per batch in one vectorized pass and
    pre-summed per key (pyarrow hash aggregation), so the exchange carries
    (key, partial-score) rows through the bounded-key coalesce-tree
    (`tree_groupby`) — no sort shuffle, nothing event-sized moves.  The
    bounded-distinct-key assumption is tree_groupby's documented contract;
    an unbounded key space needs `Dataset.groupby` or a CMS sketch
    instead."""
    if not 1 <= k_bits <= 62:
        raise ValueError(f"decayed_counts: k_bits must be in [1, 62], got {k_bits}")
    if half_life_s < 1:
        raise ValueError(
            f"decayed_counts: half_life_s must be >= 1, got {half_life_s}"
        )
    ref_us = np.datetime64(ref_ts, "us").astype(np.int64)
    hl_us = np.int64(half_life_s) * np.int64(1_000_000)
    full = np.int64(1) << np.int64(k_bits)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(ts_col)),
                pc.is_valid(batch.column(key_col)),
            )
        )
        if batch.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        epoch = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        age = np.maximum(ref_us - epoch, np.int64(0))
        b = np.minimum(age // hl_us, np.int64(63))
        w = full >> b
        t = pa.table(
            {
                key_col: pc.cast(batch.column(key_col), pa.int64()),
                "score": pa.array(w, pa.int64()),
                "cnt": pa.array(np.ones(len(w), np.int64)),
            }
        )
        return (
            pa.TableGroupBy(t, [key_col])
            .aggregate([("score", "sum"), ("cnt", "sum")])
            .rename_columns([key_col, "score", "cnt"])
        )

    scores = tree_groupby(
        events_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [key_col],
        [("score", "sum"), ("cnt", "sum")],
    )
    # any per-key score can reach cnt * 2^k_bits; weights are non-negative,
    # so every partial sum is <= the final sum and this single conservative
    # check excludes int64 wrap anywhere in the tree (the SQL mirror's
    # HUGEINT sum errors on its BIGINT cast — wrapping silently here would
    # diverge from it)
    cnt_cap = ((1 << 63) - 1) // int(full)

    def rank(batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            max_cnt = pc.max(batch.column("cnt")).as_py()
            if max_cnt is not None and max_cnt > cnt_cap:
                raise ValueError(
                    f"decayed_counts: a key has {max_cnt} events — "
                    f"score could exceed int64 at k_bits={k_bits}; "
                    "lower k_bits to widen the safe event budget"
                )
        batch = batch.drop_columns(["cnt"])
        idx = pc.sort_indices(
            batch,
            sort_keys=[("score", "descending"), (key_col, "ascending")],
        )
        out = batch.take(idx)
        return out.slice(0, top_k) if top_k is not None else out

    # tree_groupby already ends in a single small batch (bounded keys)
    return scores.map_batches(rank, batch_format="pyarrow", batch_size=None)


def transition_counts(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Markov transition matrix over per-key event sequences: for every
    key, order events by (ts, id) and count each consecutive
    (from_type → to_type) step — the user-journey / session-flow
    analytics every event pipeline wants (SQL: LEAD() OVER (PARTITION BY
    key ORDER BY ts, id) + groupby).

    Output rows: (``from_type``, ``to_type``, ``n`` int64).  The (ts, id)
    composite order makes simultaneous events deterministic; transitions
    never cross keys.  Null key/ts/type rows are skipped (the sketch-build
    null contract).

    Scale shape: ONE key-hash coarse-bucket shuffle of skinny (key, ts,
    id, type) rows (`running_totals`' budget); inside a bucket one lexsort
    + boundary mask finds every key's consecutive pairs at once, and the
    (from, to) pairs pre-aggregate per bucket before the bounded
    (|types|²) coalesce-tree sum."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([id_col, key, ts_col, type_col])
        if not pa.types.is_integer(narrow.schema.field(id_col).type):
            raise ValueError(
                f"transition_counts: {id_col} must be integer-typed — the "
                "tie-break sort needs exact int64 ids"
            )
        # null id rows must go too: ONE null makes to_numpy produce
        # float64, collapsing ids above 2^53 and corrupting the tie order
        narrow = narrow.filter(
            pc.and_(
                pc.and_(
                    pc.is_valid(narrow.column(key)),
                    pc.is_valid(narrow.column(ts_col)),
                ),
                pc.and_(
                    pc.is_valid(narrow.column(type_col)),
                    pc.is_valid(narrow.column(id_col)),
                ),
            )
        )
        return narrow.append_column(
            "bucket", pa.array(bucket_of(narrow.column(key), n_parts), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows < 2 or g.num_columns == 0:
            return empty
        keys = g.column(key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kenc = keys.dictionary_encode()
        kc = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        ev = pc.cast(g.column(id_col), pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column(type_col)
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        tenc = types.dictionary_encode()
        tdic = tenc.dictionary
        tc = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ev, ts, kc))
        kc, tc = kc[order], tc[order]
        # pairwise same-key mask derived from the shared run detector
        from .dedup import _key_runs

        same_key = np.ones(len(kc) - 1, dtype=bool)
        same_key[_key_runs(kc)[1:-1] - 1] = False
        if not same_key.any():
            return empty
        frm = tc[:-1][same_key]
        to = tc[1:][same_key]
        # pre-aggregate per bucket: the exchange carries |types|² rows max
        pair = frm * np.int64(len(tdic)) + to
        uk, uc = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "from_type": tdic.take(
                    pa.array((uk // len(tdic)).astype(np.int64))
                ).cast(pa.string()),
                "to_type": tdic.take(
                    pa.array((uk % len(tdic)).astype(np.int64))
                ).cast(pa.string()),
                "n": pa.array(uc, pa.int64()),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(partials, ["from_type", "to_type"], [("n", "sum")])


def rolling_window_sum(
    events_ds,
    window_rows: int,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Moving-window aggregate — SQL ``SUM(v) OVER (PARTITION BY key ORDER
    BY ts, id ROWS BETWEEN W-1 PRECEDING AND CURRENT ROW)`` plus the
    matching COUNT: every row carries the sum/count of its key's last
    ``window_rows`` events, the smoothing / burst-detection primitive
    (`running_totals`' cumulative form bounded to a sliding tail).

    Exact integer cents internally (prefix-sum DIFFERENCES, so the moving
    sum is order-independent and bit-stable); one final division emits
    float64.  Output rows == input rows.

    Scale shape: identical to `running_totals` — ONE key-hash
    coarse-bucket shuffle, one lexsort + prefix sum per bucket; the
    window bound costs one extra vectorized subtraction (cs[i] −
    cs[i−W]), not a second pass."""
    if window_rows < 1:
        raise ValueError(
            f"rolling_window_sum: window_rows must be >= 1, got {window_rows}"
        )
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    id_type = base_schema.field(id_col).type
    W = int(window_rows)
    tag = _window_tag_fn(key, ts_col, id_col, value_col, n_parts,
                         "rolling_window_sum")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    key: pa.array([], key_type),
                    # ts re-emitted as us-epoch (the tag guard pinned [us])
                    ts_col: pa.array([], pa.timestamp("us")),
                    "win_sum": pa.array([], pa.float64()),
                    "win_n": pa.array([], pa.int64()),
                }
            )
        kc, order, tO, iO, cO, run_start, run_len = _sorted_key_runs(
            g, key, ts_col, id_col, value_col
        )
        n = len(order)
        rs_rep = np.repeat(run_start, run_len)
        pos = np.arange(n, dtype=np.int64)
        # window start index: the later of (run start, i - W + 1)
        wstart = np.maximum(rs_rep, pos - np.int64(W - 1))
        cs = np.concatenate(([np.int64(0)], np.cumsum(cO)))
        win_sum_c = cs[pos + 1] - cs[wstart]
        win_n = pos + 1 - wstart
        return pa.table(
            {
                id_col: pa.array(iO),
                key: kc.take(pa.array(order, pa.int64())),
                ts_col: pa.array(tO, pa.int64()).cast(pa.timestamp("us")),
                "win_sum": pa.array(
                    win_sum_c.astype(np.float64) / 100.0, pa.float64()
                ),
                "win_n": pa.array(win_n, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def time_range_sum(
    events_ds,
    window_s: int,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Event-TIME moving-window aggregate — SQL ``SUM(v) OVER (PARTITION
    BY key ORDER BY ts RANGE BETWEEN INTERVAL W SECONDS PRECEDING AND
    CURRENT ROW)`` plus the matching COUNT: every row carries the
    sum/count of its key's events in the trailing ``window_s`` seconds —
    the rate-limit / burst-detection primitive (`rolling_window_sum`
    bounds by ROW count; real abuse windows are bounded by TIME).

    RANGE semantics, not ROWS: the window is every row of the key whose
    ts lies in ``[ts_i − W, ts_i]`` INCLUSIVE of ts-peers of the current
    row (SQL peer-group rule), so duplicate timestamps get identical
    sums on both engines and the result is tiebreak-independent by
    construction.  Exact integer cents inside, one final division.

    Scale shape: identical to `rolling_window_sum` — ONE key-hash
    coarse-bucket shuffle, one lexsort per bucket; the time bound costs
    two vectorized searchsorteds over a run-strided composite (run_id ×
    stride + ts) that keeps every key's run disjoint, so NO per-key loop.
    Output rows == input rows, streamed back out."""
    if window_s < 0:
        raise ValueError(
            f"time_range_sum: window_s must be >= 0, got {window_s}"
        )
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    id_type = base_schema.field(id_col).type
    W = int(window_s) * 1_000_000  # ts is pinned timestamp[us] by the tag
    tag = _window_tag_fn(key, ts_col, id_col, value_col, n_parts,
                         "time_range_sum")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    key: pa.array([], key_type),
                    ts_col: pa.array([], pa.timestamp("us")),
                    "win_sum": pa.array([], pa.float64()),
                    "win_n": pa.array([], pa.int64()),
                }
            )
        kc, order, tO, iO, cO, run_start, run_len = _sorted_key_runs(
            g, key, ts_col, id_col, value_col
        )
        n = len(order)
        n_runs = len(run_start)
        tmin = tO.min()
        rel = tO - tmin
        # disjoint per-run lanes: stride > rel_max + W keeps a query point
        # (rel_i − W) inside its own run's lane even when it dips below 0
        stride = int(rel.max()) + W + 2
        if (n_runs + 1) * stride >= 2**63:
            raise ValueError(
                "time_range_sum: bucket ts-span x key-run count overflows "
                "the int64 composite — raise num_partitions"
            )
        run_ids = np.repeat(
            np.arange(n_runs, dtype=np.int64), run_len
        )
        comp = run_ids * np.int64(stride) + rel
        lo = np.searchsorted(comp, comp - np.int64(W), side="left")
        hi = np.searchsorted(comp, comp, side="right")
        cs = np.concatenate(([np.int64(0)], np.cumsum(cO)))
        win_sum_c = cs[hi] - cs[lo]
        return pa.table(
            {
                id_col: pa.array(iO),
                key: kc.take(pa.array(order, pa.int64())),
                ts_col: pa.array(tO, pa.int64()).cast(pa.timestamp("us")),
                "win_sum": pa.array(
                    win_sum_c.astype(np.float64) / 100.0, pa.float64()
                ),
                "win_n": pa.array(hi - lo, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def locf_fill(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    sentinel: float = -1.0,
    num_partitions: int | None = None,
):
    """Last-observation-carried-forward gap fill — SQL ``LAST_VALUE(v
    IGNORE NULLS) OVER (PARTITION BY key ORDER BY ts, id)``: every null
    value becomes its key's most recent non-null observation; a key's
    LEADING nulls (nothing observed yet) become ``sentinel`` so the
    output column is null-free and hash-stable.  The sensor/telemetry
    repair primitive the reference's flow cache implies but never
    exposes (stale flow context reuse, flow_context cache TTL).

    Filled values are bit-COPIES of input values (no arithmetic), so
    float payloads stay exact.  Output rows == input rows, plus
    ``filled`` (1 when this row's value was carried or sentineled).

    Scale shape: `running_totals`' budget — ONE key-hash coarse-bucket
    shuffle, per bucket one lexsort + a single np.maximum.accumulate of
    last-valid indices; run resets are free (a previous run's index is
    provably < this run's start, so it masks to sentinel)."""
    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    id_type = base_schema.field(id_col).type

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([id_col, key, ts_col, value_col])
        tst = narrow.schema.field(ts_col).type
        if not (
            pa.types.is_timestamp(tst) and tst.unit == "us" and tst.tz is None
        ):
            raise ValueError(
                f"locf_fill: {ts_col} must be naive timestamp[us], got {tst}"
            )
        for c in (key, ts_col, id_col):
            if narrow.column(c).null_count:
                raise ValueError(
                    f"locf_fill: {c} contains nulls — only {value_col} may "
                    "be null (the gap being filled); filter key/ts/id "
                    "nulls first"
                )
        return narrow.append_column(
            "bucket", pa.array(bucket_of(batch.column(key), n_parts), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    key: pa.array([], key_type),
                    ts_col: pa.array([], pa.timestamp("us")),
                    value_col: pa.array([], pa.float64()),
                    "filled": pa.array([], pa.int64()),
                }
            )
        kc, ids, ts, order, run_start, run_len = _key_sort_runs(
            g, key, ts_col, id_col
        )
        vcol = g.column(value_col)
        if isinstance(vcol, pa.ChunkedArray):
            vcol = vcol.combine_chunks()
        valid = ~np.asarray(vcol.is_null())
        vals = vcol.cast(pa.float64()).fill_null(0.0).to_numpy(
            zero_copy_only=False
        )
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        validO = valid[order]
        last_valid = np.maximum.accumulate(np.where(validO, pos, -1))
        rs_rep = np.repeat(run_start, run_len)
        in_run = last_valid >= rs_rep
        src = np.where(in_run, last_valid, 0)
        out_vals = np.where(in_run, vals[order][src], np.float64(sentinel))
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                key: kc.take(pa.array(order, pa.int64())),
                ts_col: pa.array(ts[order], pa.int64()).cast(
                    pa.timestamp("us")
                ),
                value_col: pa.array(out_vals, pa.float64()),
                "filled": pa.array((~validO).astype(np.int64), pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def user_retention(
    events_ds,
    ts_col: str = "ts",
    key_col: str = "user_id",
    size_s: int = 86400,
    num_partitions: int = 32,
):
    """Consecutive-window retention: per tumbling window w, how many
    distinct keys were active, and how many of those are ALSO active in
    window w+1 — the cohort stickiness curve (users, hosts, crawl
    domains).  Output rows: (``w`` int64 window index = ⌊epoch/size_s⌋,
    ``n_active``, ``n_retained`` int64), exact.

    Scale shape: one hash-of-key shuffle co-locates each key's (key,
    window) pairs; per bucket a vectorized dedup + sorted-run scan finds
    adjacent-window presence (no per-user Python); per-window partial
    counts tree-combine over the bounded window domain.  The raw event
    stream is reduced to distinct (key, window) pairs inside the first
    map_batches — duplicates never shuffle."""
    import ray

    from ..sketches.hashing import hash64_ints
    from .aggregates import tree_groupby

    if size_s <= 0:
        raise ValueError(f"user_retention: size_s must be > 0, got {size_s}")
    P = int(num_partitions)

    def pairs(batch: pa.Table) -> pa.Table:
        for name in (ts_col, key_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"user_retention: {name} contains nulls — filter first"
                )
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tv = ts.to_numpy(zero_copy_only=False)
        if not np.issubdtype(tv.dtype, np.datetime64):
            raise ValueError(f"user_retention: {ts_col} must be a timestamp")
        w = tv.astype("datetime64[us]").view(np.int64) // (
            np.int64(size_s) * np.int64(1_000_000)
        )
        k = (
            batch.column(key_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        pair = np.unique(np.stack([k, w]), axis=1)
        bucket = (
            hash64_ints(pair[0]) % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {
                "k": pa.array(pair[0], pa.int64()),
                "w": pa.array(pair[1], pa.int64()),
                "b": pa.array(bucket, pa.int32()),
            }
        )

    def bucket_counts(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "w": pa.array([], pa.int64()),
                "a": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return out_empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        o = np.lexsort((w, k))
        k, w = k[o], w[o]
        keep = np.concatenate(([True], (np.diff(k) != 0) | (np.diff(w) != 0)))
        k, w = k[keep], w[keep]
        # same key AND next window exactly one ahead == retained out of w[i]
        ret = np.zeros(len(k), dtype=bool)
        if len(k) > 1:
            ret[:-1] = (k[1:] == k[:-1]) & (w[1:] == w[:-1] + 1)
        uw, inv = np.unique(w, return_inverse=True)
        n_active = np.bincount(inv, minlength=len(uw)).astype(np.int64)
        n_ret = np.bincount(inv[ret], minlength=len(uw)).astype(np.int64)
        return pa.table(
            {
                "w": pa.array(uw, pa.int64()),
                "a": pa.array(n_active),
                "r": pa.array(n_ret),
            }
        )

    partials = (
        events_ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(bucket_counts, batch_format="pyarrow")
    )
    out = tree_groupby(partials, ["w"], [("a", "sum"), ("r", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return pa.table(
                {
                    "w": pa.array([], pa.int64()),
                    "n_active": pa.array([], pa.int64()),
                    "n_retained": pa.array([], pa.int64()),
                }
            )
        out_t = batch.rename_columns(["w", "n_active", "n_retained"])
        return out_t.take(
            pc.sort_indices(out_t, sort_keys=[("w", "ascending")])
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def interarrival_histogram(
    events_ds,
    ts_col: str = "ts",
    key_col: str = "user_id",
    tiebreak_col: str = "event_id",
    lo: int = 0,
    hi: int = 345600,
    n_bins: int = 24,
    num_partitions: int = 32,
):
    """Distribution of per-key inter-event gaps (seconds) — the cadence /
    liveness audit (is this crawler polling hourly or dumping once a
    week?).  Each key's events sort by (ts, tiebreak); consecutive deltas
    bin with ``value_histogram``'s exact int64 rule (out-of-range gaps
    land in the edge bins, every gap counted).  Output rows: (``bin``,
    ``bin_lo`` int64 seconds, ``n`` int64).

    Scale shape: ONE hash-of-key shuffle of skinny (key, ts, tiebreak)
    rows; per bucket one lexsort + run-boundary diff produces every key's
    deltas at once; per-bucket bincount partials tree-combine over ≤n_bins
    keys.  Keys/timestamps must be non-null (loud)."""
    import ray

    from ..sketches.hashing import hash64_ints
    from .aggregates import tree_groupby

    if hi <= lo or not 1 <= n_bins <= (1 << 20):
        raise ValueError(
            f"interarrival_histogram: need hi > lo and 1 <= n_bins <= 2^20, "
            f"got [{lo}, {hi}) x {n_bins}"
        )
    P = int(num_partitions)
    lo_i, hi_i, nb = np.int64(lo), np.int64(hi), np.int64(n_bins)
    span = hi_i - lo_i

    def project(batch: pa.Table) -> pa.Table:
        for name in (ts_col, key_col, tiebreak_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"interarrival_histogram: {name} contains nulls"
                )
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        tv = ts.to_numpy(zero_copy_only=False)
        if not np.issubdtype(tv.dtype, np.datetime64):
            raise ValueError(
                f"interarrival_histogram: {ts_col} must be a timestamp"
            )
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(k),
                "t": pa.array(tv.astype("datetime64[us]").view(np.int64)),
                "tb": pa.array(
                    batch.column(tiebreak_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "b": pa.array(
                    (hash64_ints(k) % np.uint64(P)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def bucket_hist(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
        )
        if not group.num_rows or not group.num_columns:
            return out_empty
        k = group.column("k").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        tb = group.column("tb").to_numpy(zero_copy_only=False)
        o = np.lexsort((tb, t, k))
        k, t = k[o], t[o]
        same = k[1:] == k[:-1]
        if not same.any():
            return out_empty
        delta_s = (t[1:][same] - t[:-1][same]) // np.int64(1_000_000)
        v = np.clip(delta_s, lo_i, hi_i - np.int64(1))
        b = (v - lo_i) * nb // span
        uk, uc = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(uk, pa.int64()),
             "n": pa.array(uc.astype(np.int64), pa.int64())}
        )

    out = tree_groupby(
        events_ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(bucket_hist, batch_format="pyarrow"),
        ["bin"],
        [("n", "sum")],
        max_groups=n_bins,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return pa.table(
                {
                    "bin": pa.array([], pa.int64()),
                    "bin_lo": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        edge = lo_i + (b * span + nb - np.int64(1)) // nb
        t = pa.table(
            {
                "bin": batch.column("bin"),
                "bin_lo": pa.array(edge, pa.int64()),
                "n": batch.column("n"),
            }
        )
        return t.take(pc.sort_indices(t, sort_keys=[("bin", "ascending")]))

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def theil_sen_trend(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    max_events_per_key: int = 1024,
    num_partitions: int | None = None,
):
    """Per-key Theil-Sen robust trend — the (lower) MEDIAN of all pairwise
    slopes ``(v_j − v_i)/(t_j − t_i)`` over the key's events: the
    outlier-proof "is this metric drifting?" estimator (one wild spike
    moves an OLS slope arbitrarily; it moves the median of slopes not at
    all).  Same-timestamp pairs are excluded (slope undefined); keys with
    no valid pair emit nothing.  Output rows: (key, ``n_pairs`` int64,
    ``slope`` float64) where slope = exact-cent / exact-microsecond
    deltas through ONE double division each — bit-stable, and the median
    pick is an order statistic over identical doubles on any engine.

    Scale shape: `running_totals`' budget (one key-hash bucket shuffle,
    one lexsort per bucket) plus a d-loop over in-run pair distances —
    vectorized across ALL keys at once per distance, so per-bucket cost
    is O(Σ m_k²) with NO per-key Python.  Quadratic-in-key-size is the
    estimator's nature; ``max_events_per_key`` turns a heavy key into a
    loud error instead of a silent task blow-up."""
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    tag = _window_tag_fn(key, ts_col, id_col, value_col, n_parts,
                         "theil_sen_trend")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "n_pairs": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                }
            )
        kc, order, tO, iO, cO, run_start, run_len = _sorted_key_runs(
            g, key, ts_col, id_col, value_col
        )
        maxlen = int(run_len.max())
        if maxlen > max_events_per_key:
            raise ValueError(
                f"theil_sen_trend: a key has {maxlen} events — the "
                f"all-pairs slope set is quadratic; raise "
                f"max_events_per_key ({max_events_per_key}) deliberately "
                "or pre-aggregate"
            )
        n = len(order)
        pos = np.arange(n, dtype=np.int64)
        rs_rep = np.repeat(run_start, run_len)
        len_rep = np.repeat(run_len, run_len)
        pos_in = pos - rs_rep
        run_id = np.repeat(np.arange(len(run_start), dtype=np.int64), run_len)
        # rows sorted by remaining in-run partners: distance d pairs exist
        # only for rows with rem > d, so each d-iteration touches exactly
        # the still-active suffix — total mask work equals the pair count
        # (a full-bucket mask per d would be O(n·maxlen) under key skew)
        rem = len_rep - pos_in
        by_rem = np.argsort(rem, kind="stable")
        rem_sorted = rem[by_rem]
        sl_parts, rid_parts = [], []
        for d in range(1, maxlen):
            start = int(np.searchsorted(rem_sorted, d + 1, side="left"))
            if start == n:
                break
            i = by_rem[start:]
            j = i + d
            dt = tO[j] - tO[i]
            nz = dt != 0
            i, j, dt = i[nz], j[nz], dt[nz]
            if len(i) == 0:
                continue
            sl_parts.append(
                (cO[j] - cO[i]).astype(np.float64) / dt.astype(np.float64)
            )
            rid_parts.append(run_id[i])
        if not sl_parts:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "n_pairs": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                }
            )
        slopes = np.concatenate(sl_parts)
        rids = np.concatenate(rid_parts)
        o = np.lexsort((slopes, rids))
        rids_s, slopes_s = rids[o], slopes[o]
        uniq, starts = np.unique(rids_s, return_index=True)
        cnts = np.diff(np.concatenate((starts, [len(rids_s)])))
        pick = starts + (cnts + 1) // 2 - 1
        keys_out = kc.take(
            pa.array(order[run_start[uniq]], pa.int64())
        )
        return pa.table(
            {
                key: keys_out,
                "n_pairs": pa.array(cnts, pa.int64()),
                "slope": pa.array(slopes_s[pick], pa.float64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _doubled_avg_ranks(v: np.ndarray, run_start: np.ndarray,
                       run_len: np.ndarray) -> np.ndarray:
    """Doubled average ranks of ``v`` WITHIN each key run (runs contiguous,
    lengths ``run_len``): rank ties by their average position, doubled so
    the result stays integer — a tie block occupying 1-based in-run
    positions s+1..s+c has average rank s + (c+1)/2, i.e. doubled rank
    2s + c + 1 (the SQL mirror is ``2*RANK() + COUNT(*) OVER (key, v)
    − 1``).  Vectorized across ALL runs at once: one lexsort, one
    boundary diff, one repeat — no per-key Python.  Returns int64 ranks
    aligned to the INPUT row order."""
    n = len(v)
    rid = np.repeat(np.arange(len(run_start), dtype=np.int64), run_len)
    o = np.lexsort((v, rid))
    vs, rids = v[o], rid[o]
    pos_in = np.arange(n, dtype=np.int64) - np.repeat(run_start, run_len)
    new_block = np.empty(n, dtype=bool)
    new_block[0] = True
    np.not_equal(vs[1:], vs[:-1], out=new_block[1:])
    new_block[1:] |= rids[1:] != rids[:-1]
    starts = np.flatnonzero(new_block)
    cnts = np.diff(np.concatenate((starts, [n])))
    doubled = 2 * pos_in[starts] + cnts + 1
    out = np.empty(n, dtype=np.int64)
    out[o] = np.repeat(doubled, cnts)
    return out


def spearman_corr(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    max_events_per_key: int = 8192,
    num_partitions: int | None = None,
):
    """Per-key EXACT Spearman rank correlation between event time and
    value — the nonparametric "does this key's metric drift
    monotonically?" audit (Pearson on ranks: immune to outliers and any
    monotone rescaling, the standard drift test when the value scale is
    arbitrary).  Ties get average ranks; to stay bit-stable the kernel
    works in DOUBLED ranks (2·avg is always integer) and emits the three
    integer moments of the correlation instead of the float quotient:

        rho = num / sqrt(den_x · den_y)
        num   = n·Σ(ax·ay) − Σax·Σay      (ax, ay doubled ranks)
        den_x = n·Σax² − (Σax)²,  den_y likewise

    All three are exact int64 (guarded: den ≤ 4n⁴ needs n ≤ ~38k;
    ``max_events_per_key`` raises loudly well before).  den = 0 (constant
    column, e.g. a single-event key) leaves rho undefined — callers see
    it explicitly instead of a NaN-poisoned float.  Output rows:
    (key, n int64, num, den_x, den_y int64).

    Scale shape: `running_totals`' budget — one key-hash bucket shuffle
    of a skinny 4-column projection, then ONE lexsort per rank column per
    bucket, vectorized across all keys (`_doubled_avg_ranks`); per-run
    sums via np.add.reduceat.  Nothing materializes on the driver."""
    from .dedup import _auto_parts

    if max_events_per_key > 38_000:
        raise ValueError(
            "spearman_corr: max_events_per_key > 38000 overflows the exact "
            "int64 moments (den grows as 4n^4)"
        )
    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    tag = _window_tag_fn(key, ts_col, id_col, value_col, n_parts,
                         "spearman_corr")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "n": pa.array([], pa.int64()),
                    "num": pa.array([], pa.int64()),
                    "den_x": pa.array([], pa.int64()),
                    "den_y": pa.array([], pa.int64()),
                }
            )
        kc, order, tO, iO, cO, run_start, run_len = _sorted_key_runs(
            g, key, ts_col, id_col, value_col
        )
        maxlen = int(run_len.max())
        if maxlen > max_events_per_key:
            raise ValueError(
                f"spearman_corr: a key has {maxlen} events — raise "
                f"max_events_per_key ({max_events_per_key}) deliberately "
                "(int64-exact up to ~38k) or pre-aggregate"
            )
        ax = _doubled_avg_ranks(tO, run_start, run_len)
        ay = _doubled_avg_ranks(cO, run_start, run_len)
        n_k = run_len.astype(np.int64)
        sx = np.add.reduceat(ax, run_start)
        sy = np.add.reduceat(ay, run_start)
        sxx = np.add.reduceat(ax * ax, run_start)
        syy = np.add.reduceat(ay * ay, run_start)
        sxy = np.add.reduceat(ax * ay, run_start)
        num = n_k * sxy - sx * sy
        den_x = n_k * sxx - sx * sx
        den_y = n_k * syy - sy * sy
        keys_out = kc.take(pa.array(order[run_start], pa.int64()))
        return pa.table(
            {
                key: keys_out,
                "n": pa.array(n_k, pa.int64()),
                "num": pa.array(num, pa.int64()),
                "den_x": pa.array(den_x, pa.int64()),
                "den_y": pa.array(den_y, pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def audience_growth(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
    max_days: int = 100_000,
):
    """First-seen audience growth curve: per calendar day, how many keys
    appear for the FIRST time and the cumulative distinct-key total — the
    "are we still acquiring?" audit (exact running distinct count via
    first-touch attribution, no HLL needed because each key contributes
    exactly once, on its first day).

    Output rows: (day_idx, new_users, cum_users), all int64; ``day_idx``
    = first-event microseconds // 86_400_000_000 (epoch days).

    Scale shape: per-batch per-key min-ts partials (C++ hash agg) shrink
    the shuffle to distinct-keys-per-batch rows; ONE key-hash bucket
    shuffle finishes the per-key min; per-bucket day counts are partials
    into the bounded-day `tree_groupby`; the cumulative sum runs once
    over the ≤``max_days`` final table.  The corpus never shuffles."""
    from ..sketches.hashing import hash64_ints
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)
    P = int(num_partitions)

    def local_min(batch: pa.Table) -> pa.Table:
        if batch.column(key).null_count or batch.column(ts_col).null_count:
            raise ValueError(
                f"audience_growth: {key}/{ts_col} must be null-free"
            )
        tst = batch.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"audience_growth: {ts_col} must be timestamp[us], got {tst}"
            )
        t = pa.table(
            {
                key: batch.column(key),
                "fts": pc.cast(batch.column(ts_col), pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, [key]).aggregate([("fts", "min")])
        g = g.rename_columns([key, "fts"])
        kv = g.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (hash64_ints(kv) % np.uint64(P)).astype(np.int32)
        return g.append_column("bucket", pa.array(b, pa.int32()))

    def bucket_days(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "new_users": pa.array([], pa.int64()),
                }
            )
        m = pa.TableGroupBy(g.select([key, "fts"]), [key]).aggregate(
            [("fts", "min")]
        )
        fts = m.column("fts_min").to_numpy(zero_copy_only=False)
        day = np.floor_divide(fts, US_PER_DAY)
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table(
            {
                "day_idx": pa.array(uniq, pa.int64()),
                "new_users": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    days = tree_groupby(
        events_ds.map_batches(
            local_min, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bucket")
        .map_groups(bucket_days, batch_format="pyarrow"),
        ["day_idx"],
        [("new_users", "sum")],
        max_groups=max_days,
    )

    def cumulate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "new_users": pa.array([], pa.int64()),
                    "cum_users": pa.array([], pa.int64()),
                }
            )
        day = batch.column("day_idx").to_numpy(zero_copy_only=False)
        nu = batch.column("new_users").to_numpy(zero_copy_only=False)
        o = np.argsort(day, kind="stable")
        return pa.table(
            {
                "day_idx": pa.array(day[o], pa.int64()),
                "new_users": pa.array(nu[o], pa.int64()),
                "cum_users": pa.array(np.cumsum(nu[o]), pa.int64()),
            }
        )

    # tree_groupby's final combine is a single batch; cumulate keeps it so
    return days.map_batches(cumulate, batch_format="pyarrow", batch_size=None)


def burst_max(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 3_600_000_000,
    num_partitions: int | None = None,
):
    """Peak burst rate per key: the maximum number of the key's events
    inside ANY half-open window ``[t, t + window_us)`` anchored at one of
    its events — the rate-limiter / scraping-detector audit (a mean rate
    hides bursts; the max-anchored window is the exact worst case, since
    the optimum window can always be slid left onto an event).

    Output rows: (key, n_events int64, max_burst int64).

    Scale shape: `running_totals`' budget — ONE key-hash bucket shuffle
    of the (key, ts) projection; per bucket one lexsort, then BOTH window
    endpoints come from two vectorized searchsorteds over a per-run
    base-offset transform (each run's timestamps shifted onto a disjoint
    integer interval, so one global binary search serves every key at
    once — no per-key loop); per-run max via maximum.reduceat."""
    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts, _key_runs

    if window_us <= 0:
        raise ValueError(f"burst_max: window_us must be positive, got {window_us}")
    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type
    W = np.int64(window_us)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"burst_max: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"burst_max: {c} contains nulls — filter first")
        return narrow.append_column(
            "bucket", pa.array(bucket_of(narrow.column(key), n_parts), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "n_events": pa.array([], pa.int64()),
                    "max_burst": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        ts = pc.cast(g.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, kcodes))
        tsO = ts[order]
        starts_term = _key_runs(kcodes[order])
        run_start, run_len = starts_term[:-1], np.diff(starts_term)
        # disjoint per-run intervals: one global searchsorted serves all keys
        rs_rep = np.repeat(run_start, run_len)
        rel = tsO - tsO[rs_rep]
        span = np.int64(rel.max()) if len(rel) else np.int64(0)
        stride = span + W + np.int64(2)
        run_id = np.repeat(np.arange(len(run_start), dtype=np.int64), run_len)
        if int(stride) * len(run_start) >= (1 << 62):
            raise ValueError(
                "burst_max: per-run offset transform exceeds int64 — raise "
                "num_partitions (too many keys x too wide a time span in "
                "one bucket)"
            )
        tt = rel + run_id * stride
        lo = np.searchsorted(tt, tt, side="left")
        hi = np.searchsorted(tt, tt + W, side="left")
        burst = hi - lo
        per_run_max = np.maximum.reduceat(burst, run_start)
        keys_out = kc.take(pa.array(order[run_start], pa.int64()))
        return pa.table(
            {
                key: keys_out,
                "n_events": pa.array(run_len.astype(np.int64), pa.int64()),
                "max_burst": pa.array(per_run_max.astype(np.int64), pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def cohort_retention(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
    max_cells: int = 1 << 20,
):
    """Cohort retention triangle: for every (cohort_day, age_days) cell,
    how many keys whose FIRST event fell on ``cohort_day`` were active
    (≥1 event) exactly ``age_days`` days later — the standard product /
    crawl-freshness stickiness matrix (each cohort row read across is its
    survival curve; age 0 is the cohort size).  Activity is distinct
    (key, day), so event volume never inflates retention.

    Output rows: (cohort_day, age_days, active_users), all int64;
    days are epoch days (microseconds // 86_400_000_000).

    Scale shape: ONE key-hash bucket shuffle of the (key, epoch-day)
    projection — a key's whole history lands in one bucket, so its
    cohort day and distinct activity days resolve in the same vectorized
    run walk (lexsort + `_key_runs`, no per-key Python); per-bucket
    (cohort, age) counts tree-combine over the bounded day×day cell
    domain (loud ``max_cells``)."""
    from ..sketches.hashing import bucket_of
    from .dedup import _key_runs
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)
    P = int(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"cohort_retention: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"cohort_retention: {c} contains nulls")
        day = np.floor_divide(
            pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({key: narrow.column(key), "day": pa.array(day, pa.int64())})
        # within-batch distinct shrinks the shuffle to (key, day) pairs
        t = pa.TableGroupBy(t, [key, "day"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column(key), P), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "cohort_day": pa.array([], pa.int64()),
                    "age_days": pa.array([], pa.int64()),
                    "active_users": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, kcodes))
        ks, ds_ = kcodes[o], day[o]
        pair_starts = _key_runs(ks, ds_)[:-1]  # distinct (key, day)
        kp, dp = ks[pair_starts], ds_[pair_starts]
        user_starts_term = _key_runs(kp)
        user_starts, user_len = user_starts_term[:-1], np.diff(user_starts_term)
        cohort = np.repeat(dp[user_starts], user_len)
        age = dp - cohort
        if len(dp) and (dp.min() < 0 or int(age.max()) >= (1 << 20)):
            raise ValueError(
                "cohort_retention: pre-1970 timestamps or a >2900-year "
                "span break the packed (cohort, age) cell key"
            )
        cell = cohort * np.int64(1 << 20) + age  # age < 2^20 days (~2900 yr)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cohort_day": pa.array(uniq >> np.int64(20), pa.int64()),
                "age_days": pa.array(uniq & np.int64((1 << 20) - 1), pa.int64()),
                "active_users": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials,
        ["cohort_day", "age_days"],
        [("active_users", "sum")],
        max_groups=max_cells,
    )


def time_to_nth_event(
    events_ds,
    n: int,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_partitions: int | None = None,
):
    """Activation latency: microseconds from each key's FIRST event to its
    n-th (event-time order, ties by id) — the time-to-activation /
    time-to-Nth-purchase funnel metric.  Keys with fewer than ``n``
    events emit nothing (not-yet-activated is absence, not a sentinel).
    Output rows: (key, latency_us int64) — exact integer timestamp
    deltas, n = 1 gives all-zero latencies by definition.

    Scale shape: `running_totals`' budget — one key-hash bucket shuffle
    of the skinny projection, one lexsort per bucket, positions 0 and
    n−1 of each run picked vectorized."""
    from .dedup import _auto_parts

    if n < 1:
        raise ValueError(f"time_to_nth_event: n must be >= 1, got {n}")
    from ..sketches.hashing import bucket_of

    n_parts = num_partitions or _auto_parts(events_ds, floor=32)
    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([id_col, key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"time_to_nth_event: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (id_col, key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"time_to_nth_event: {c} contains nulls")
        return narrow.append_column(
            "bucket",
            pa.array(bucket_of(narrow.column(key), n_parts), pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "latency_us": pa.array([], pa.int64()),
                }
            )
        kc, ids, ts, order, run_start, run_len = _key_sort_runs(
            g, key, ts_col, id_col
        )
        keep = run_len >= n
        if not keep.any():
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "latency_us": pa.array([], pa.int64()),
                }
            )
        first = run_start[keep]
        nth = first + (n - 1)
        tsO = ts[order]
        return pa.table(
            {
                key: kc.take(pa.array(order[first], pa.int64())),
                "latency_us": pa.array(tsO[nth] - tsO[first], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def rolling_active_users(
    events_ds,
    window_days: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
    max_days: int = 100_000,
):
    """Exact rolling N-day active-user curve (WAU/MAU family): for every
    window-end day d, how many distinct keys had ≥1 event in
    ``[d − window_days + 1, d]`` — the stickiness denominator (DAU/WAU)
    computed EXACTLY, no HLL.  A window-end day appears iff some key was
    active in its window, i.e. days range to last_active + window − 1.

    Output rows: (day_idx, active_users), int64 epoch days.

    Scale shape: within-batch distinct (key, day) pairs, ONE key-hash
    bucket shuffle; per bucket each key's distinct days expand to ≤
    window_days window-ends, de-duplicated per key vectorized (expansion
    is on DISTINCT days, so worst case window_days × distinct pairs of
    skinny ints); per-bucket (day, count) partials tree-combine over the
    bounded day domain."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby
    from .dedup import _key_runs

    if window_days < 1:
        raise ValueError(
            f"rolling_active_users: window_days must be >= 1, got {window_days}"
        )
    US_PER_DAY = np.int64(86_400_000_000)
    P = int(num_partitions)
    W = int(window_days)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"rolling_active_users: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"rolling_active_users: {c} contains nulls")
        day = np.floor_divide(
            pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({key: narrow.column(key), "day": pa.array(day, pa.int64())})
        t = pa.TableGroupBy(t, [key, "day"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column(key), P), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "active_users": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, kcodes))
        ks, ds_ = kcodes[o], day[o]
        starts = _key_runs(ks, ds_)[:-1]  # distinct (key, day)
        kp, dp = ks[starts].astype(np.int64), ds_[starts]
        # expand each active day to its W window-ends, dedupe per key
        ke = np.repeat(kp, W)
        we = np.repeat(dp, W) + np.tile(np.arange(W, dtype=np.int64), len(dp))
        o2 = np.lexsort((we, ke))
        ke, we = ke[o2], we[o2]
        s2 = _key_runs(ke, we)[:-1]  # distinct (key, window_end)
        uniq, cnt = np.unique(we[s2], return_counts=True)
        return pa.table(
            {
                "day_idx": pa.array(uniq, pa.int64()),
                "active_users": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials, ["day_idx"], [("active_users", "sum")], max_groups=max_days
    )


def max_streak(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
):
    """Longest consecutive-active-day streak per key (plus the active-day
    count) — the habit/stickiness metric, the gaps-and-islands problem
    done distributed: a streak is a maximal run of distinct epoch days
    with day-to-day gap exactly 1.

    Output rows: (key, active_days, best_streak), int64.

    Scale shape: within-batch distinct (key, day), ONE key-hash bucket
    shuffle; per bucket one lexsort, then streak boundaries are
    ``diff(day) != 1 OR new key`` — maximal-run lengths via two
    flatnonzero diffs, per-key max via maximum.reduceat; no per-key
    Python."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby
    from .dedup import _key_runs

    US_PER_DAY = np.int64(86_400_000_000)
    P = int(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"max_streak: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"max_streak: {c} contains nulls")
        day = np.floor_divide(
            pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({key: narrow.column(key), "day": pa.array(day, pa.int64())})
        t = pa.TableGroupBy(t, [key, "day"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column(key), P), pa.int32())
        )

    base_schema = _arrow_schema(events_ds)
    key_type = base_schema.field(key).type

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key: pa.array([], key_type),
                    "active_days": pa.array([], pa.int64()),
                    "best_streak": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, kcodes))
        ks, ds_ = kcodes[o], day[o]
        starts = _key_runs(ks, ds_)[:-1]  # distinct (key, day), sorted
        kp, dp = ks[starts], ds_[starts]
        # streak boundary: key change OR day gap != 1
        n = len(kp)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (kp[1:] != kp[:-1]) | (np.diff(dp) != 1)
        s_starts = np.flatnonzero(brk)
        s_len = np.diff(np.concatenate((s_starts, [n])))
        # per-key max over its streaks: streaks are contiguous per key
        key_starts_term = _key_runs(kp)
        key_starts, key_days = key_starts_term[:-1], np.diff(key_starts_term)
        # map each streak to its key run: streak starts are a superset of
        # key starts, so searchsorted aligns them
        first_streak_of_key = np.searchsorted(s_starts, key_starts)
        best = np.maximum.reduceat(s_len, first_streak_of_key)
        keys_out = kc.take(pa.array(o[starts[key_starts]], pa.int64()))
        return pa.table(
            {
                key: keys_out,
                "active_days": pa.array(key_days.astype(np.int64), pa.int64()),
                "best_streak": pa.array(best.astype(np.int64), pa.int64()),
            }
        )

    return (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def lead_lag_counts(
    events_ds,
    type_a: str,
    type_b: str,
    max_lag: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_days: int = 100_000,
):
    """Lead-lag volume analysis: for every lag k in [−max_lag, max_lag],
    the exact integer dot product Σ_d n_a(d)·n_b(d+k) of the two event
    types' daily-count series — does A's volume LEAD B's (argmax at
    k > 0) or trail it?  The integer core of cross-correlation, emitted
    raw so any normalization stays caller-side and bit-stable.

    Output rows: (lag, dot), int64, one row per lag (0 when the shifted
    series never overlap).

    Scale shape: per-batch (day, type) count partials tree-combine over
    the bounded day domain; the closing kernel is a 2×days table and a
    (2·max_lag+1)-step vectorized shift-multiply.  The corpus never
    shuffles."""
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)
    if max_lag < 0:
        raise ValueError(f"lead_lag_counts: max_lag must be >= 0, got {max_lag}")

    def partial(batch: pa.Table) -> pa.Table:
        tst = batch.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"lead_lag_counts: {ts_col} must be timestamp[us], got {tst}"
            )
        et = batch.column(type_col)
        keep = pc.is_in(et, value_set=pa.array([type_a, type_b]))
        b2 = batch.filter(keep)
        if b2.num_rows == 0:
            return pa.table(
                {
                    "day": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        day = np.floor_divide(
            pc.cast(b2.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        side = pc.if_else(
            pc.equal(b2.column(type_col), type_a),
            pa.scalar(0, pa.int64()),
            pa.scalar(1, pa.int64()),
        )
        t = pa.table(
            {
                "day": pa.array(day, pa.int64()),
                "side": side,
                "n": pa.array(np.ones(len(day), np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["day", "side"]).aggregate([("n", "sum")])
        return g.rename_columns(["day", "side", "n"])

    hist = tree_groupby(
        events_ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["day", "side"],
        [("n", "sum")],
        max_groups=max_days * 2,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {"lag": pa.array([], pa.int64()), "dot": pa.array([], pa.int64())}
            )
        day = batch.column("day").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        lo, hi = int(day.min()), int(day.max())
        width = hi - lo + 1
        a = np.zeros(width, dtype=np.int64)
        b = np.zeros(width, dtype=np.int64)
        a[day[side == 0] - lo] = n[side == 0]
        b[day[side == 1] - lo] = n[side == 1]
        lags = np.arange(-max_lag, max_lag + 1, dtype=np.int64)
        dots = []
        for k in lags:
            if k >= 0:
                dots.append(int(np.dot(a[: width - k or None], b[k:])))
            else:
                dots.append(int(np.dot(a[-k:], b[: width + k])))
        return pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "dot": pa.array(np.array(dots, np.int64), pa.int64()),
            }
        )

    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def growth_accounting(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    num_partitions: int = 64,
    max_days: int = 100_000,
):
    """Growth accounting split: per epoch day, how many events came from
    NEW keys (first-ever activity that day) vs RETURNING keys — the
    "is traffic growth acquisition or retention?" audit, event-weighted
    (the user-weighted variants are `audience_growth` and
    `cohort_retention`).

    Output rows: (day_idx, new_user_events, returning_user_events), int64.

    Scale shape: ONE key-hash bucket shuffle of (key, day) rows (a key's
    whole history co-locates, so its first day resolves in-bucket), per
    bucket one lexsort + run walk splits counts, bounded-day tree
    combine."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)
    P = int(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"growth_accounting: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"growth_accounting: {c} contains nulls")
        day = np.floor_divide(
            pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({key: narrow.column(key), "day": pa.array(day, pa.int64())})
        # pre-aggregate (key, day) event counts inside the batch
        g = pa.TableGroupBy(t, [key, "day"]).aggregate([([], "count_all")])
        g = g.rename_columns([key, "day", "n"])
        return g.append_column(
            "bucket", pa.array(bucket_of(g.column(key), P), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "new_user_events": pa.array([], pa.int64()),
                    "returning_user_events": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, kcodes))
        ks, ds_, ns = kcodes[o], day[o], n[o]
        # per-(key, day) totals first (batches may repeat pairs)
        from .dedup import _key_runs

        pstarts_term = _key_runs(ks, ds_)
        pstarts = pstarts_term[:-1]
        psums = np.add.reduceat(ns, pstarts)
        kp, dp = ks[pstarts], ds_[pstarts]
        kstarts = _key_runs(kp)[:-1]
        first_day = np.zeros(len(kp), dtype=np.int64)
        first_day[:] = np.repeat(dp[kstarts], np.diff(_key_runs(kp)))
        is_new = dp == first_day
        out = {}
        for flag, name in ((True, "new"), (False, "ret")):
            m = is_new == flag
            u2, inv = np.unique(dp[m], return_inverse=True)
            sums = np.zeros(len(u2), dtype=np.int64)
            np.add.at(sums, inv, psums[m])
            out[name] = (u2, sums)
        all_days = np.unique(dp)
        newv = np.zeros(len(all_days), dtype=np.int64)
        retv = np.zeros(len(all_days), dtype=np.int64)
        nu, nsum = out["new"]
        ru, rsum = out["ret"]
        newv[np.searchsorted(all_days, nu)] = nsum
        retv[np.searchsorted(all_days, ru)] = rsum
        return pa.table(
            {
                "day_idx": pa.array(all_days, pa.int64()),
                "new_user_events": pa.array(newv, pa.int64()),
                "returning_user_events": pa.array(retv, pa.int64()),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials,
        ["day_idx"],
        [("new_user_events", "sum"), ("returning_user_events", "sum")],
        max_groups=max_days,
    )


def lifecycle_accounting(
    events_ds,
    key: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
    num_partitions: int = 64,
    max_periods: int = 100_000,
):
    """Lifecycle growth accounting (the four-state audience ledger): per
    activity period p, how many keys are NEW (first-ever activity),
    RETAINED (also active in p−1), RESURRECTED (active before, but not
    in p−1), and how many CHURNED INTO p (active in p−1, not in p) —
    new + retained + resurrected = active(p), and the ledger telescopes:
    active(p) − active(p−1) = new + resurrected − churned.

    Output rows: (period, new_users, retained, resurrected, churned),
    int64; ``period`` = epoch-day // period_days.

    Scale shape: ONE key-hash bucket shuffle of within-batch-distinct
    (key, period) pairs; a key's whole period list co-locates, so all
    four states classify from one sorted run walk (gap == 1 → retained,
    gap > 1 → resurrected + a churn at prev+1, run start → new, run end
    → a churn at last+1); bounded-period tree combine."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby
    from .dedup import _key_runs

    if period_days < 1:
        raise ValueError(
            f"lifecycle_accounting: period_days must be >= 1, got {period_days}"
        )
    US_PER_P = np.int64(86_400_000_000) * np.int64(period_days)
    P = int(num_partitions)

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key, ts_col])
        tst = narrow.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"lifecycle_accounting: {ts_col} must be timestamp[us], got {tst}"
            )
        for c in (key, ts_col):
            if narrow.column(c).null_count:
                raise ValueError(f"lifecycle_accounting: {c} contains nulls")
        per = np.floor_divide(
            pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_P,
        )
        t = pa.table({key: narrow.column(key), "p": pa.array(per, pa.int64())})
        t = pa.TableGroupBy(t, [key, "p"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column(key), P), pa.int32())
        )

    cols = ("new_users", "retained", "resurrected", "churned")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"period": pa.array([], pa.int64())}
                | {c: pa.array([], pa.int64()) for c in cols}
            )
        kc = g.column(key)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        per = g.column("p").to_numpy(zero_copy_only=False)
        o = np.lexsort((per, kcodes))
        ks, ps = kcodes[o], per[o]
        starts = _key_runs(ks, ps)[:-1]
        kp, pp = ks[starts], ps[starts]
        n = len(kp)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = kp[1:] != kp[:-1]
        gap1 = np.zeros(n, dtype=bool)
        gapn = np.zeros(n, dtype=bool)
        if n > 1:
            same = kp[1:] == kp[:-1]
            d = np.diff(pp)
            gap1[1:] = same & (d == 1)
            gapn[1:] = same & (d > 1)
        # churn lands at prev+1 for every gap>1 step AND at last+1 of
        # every key (the key may return later — that's the resurrection)
        last = np.empty(n, dtype=bool)
        last[:-1] = kp[1:] != kp[:-1]
        last[-1] = True
        churn_p = np.concatenate((pp[np.flatnonzero(gapn) - 1] + 1,
                                  pp[last] + 1))
        tallies = {}
        for name, mask_p in (
            ("new_users", pp[first]),
            ("retained", pp[gap1]),
            ("resurrected", pp[gapn]),
            ("churned", churn_p),
        ):
            u, c = np.unique(mask_p, return_counts=True)
            tallies[name] = (u, c)
        all_p = np.unique(np.concatenate([u for u, _ in tallies.values()]))
        out = {"period": pa.array(all_p, pa.int64())}
        for name in cols:
            v = np.zeros(len(all_p), dtype=np.int64)
            u, c = tallies[name]
            v[np.searchsorted(all_p, u)] = c
            out[name] = pa.array(v, pa.int64())
        return pa.table(out)

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials,
        ["period"],
        [(c, "sum") for c in cols],
        max_groups=max_periods,
    )


def rolling_distinct_hll(
    events_ds,
    window_days: int = 7,
    key: str = "user_id",
    ts_col: str = "ts",
    p: int = 14,
    max_days: int = 100_000,
):
    """Sliding W-day distinct-key ESTIMATE from per-day mergeable HLLs —
    the sketch counterpart of ``rolling_active_users``.  Exact rolling
    distinct needs each key's day set co-located (one corpus-keyed
    shuffle); the HLL version needs only per-(batch, day) 16 KB partials
    merged per day, then each of the W·days window merges is a register
    max on the driver — at 10^12 events this is the only affordable
    WAU/MAU curve, within the published ±1.04/√m bound per window.

    Output rows: (day_idx int64, est float64) — one per window-end day,
    same day domain as ``rolling_active_users`` (every d with activity in
    [d−W+1, d], i.e. up to last_active + W − 1).

    Scale shape: one streaming pass (grouped per-day HLL partials, salted
    two-phase merge, bounded-day guard), per-day sketches to the driver
    (days ≤ max_days · 16 KB), W-day merges driver-side."""
    from ..core.grouped import grouped_build
    from ..core.udaf import SketchSpec
    from ..sketches import sketch_from_bytes

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    US_PER_DAY = np.int64(86_400_000_000)

    def derive(batch: pa.Table) -> pa.Table:
        if batch.column(key).null_count or batch.column(ts_col).null_count:
            raise ValueError(
                f"rolling_distinct_hll: {key}/{ts_col} must be null-free"
            )
        tst = batch.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"rolling_distinct_hll: {ts_col} must be timestamp[us], got {tst}"
            )
        day = (
            pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            )
            // US_PER_DAY
        )
        return pa.table(
            {
                "day": pa.array(day.astype(np.int64), pa.int64()),
                key: batch.column(key),
            }
        )

    spec = SketchSpec("h", "hll", key, {"p": p}, value_kind="int")
    merged = grouped_build(
        events_ds.map_batches(derive, batch_format="pyarrow"), "day", spec
    ).take_all()
    if len(merged) > max_days:
        raise ValueError(
            f"rolling_distinct_hll: {len(merged)} distinct days > "
            f"max_days={max_days}"
        )
    by_day = {
        int(r["key"]): sketch_from_bytes("hll", r["payload"]) for r in merged
    }
    if not by_day:
        return pa.table(
            {
                "day_idx": pa.array([], pa.int64()),
                "est": pa.array([], pa.float64()),
            }
        )
    days = np.array(sorted(by_day), dtype=np.int64)
    ends = np.unique(
        (days[:, None] + np.arange(window_days, dtype=np.int64)).ravel()
    )
    out_d, out_e = [], []
    for d in ends.tolist():
        acc = None
        for dd in range(d - window_days + 1, d + 1):
            sk = by_day.get(dd)
            if sk is None:
                continue
            if acc is None:
                from ..sketches.hll import HyperLogLog

                acc = HyperLogLog.from_bytes(sk.to_bytes())  # copy
            else:
                acc.merge(sk)
        if acc is not None:
            out_d.append(d)
            out_e.append(acc.estimate())
    return pa.table(
        {
            "day_idx": pa.array(out_d, pa.int64()),
            "est": pa.array(out_e, pa.float64()),
        }
    )
