"""Distributed EXACT scalar statistics — the ground truth the sketches are
graded against.

The north-star contract requires each sketch estimate to sit inside its
published error bound (HLL ±1.04/√m, CMS ε–δ, KLL/t-digest rank error);
grading that needs exact answers computed at the same scale WITHOUT
driver-side materialization:

* ``exact_order_statistic`` — the value at 1-based rank ``ceil(q·n)`` of a
  numeric column, via iterative prefix-histogram refinement over an
  order-preserving uint64 mapping of the values (the single-column sibling
  of ``curate._exact_group_hash_select``): each round one tree-merged
  2^refine_bits histogram narrows the candidate stripe ×2^refine_bits, so
  a 10^12-row column needs ~4 histogram passes and one bounded collect.
* ``exact_rank_of`` — (#rows < x, #rows ≤ x) as tree-merged partial sums:
  turns "is this sketch's quantile within ε·n ranks of q·n" into two
  integers.

Both stream skinny single-column projections; nothing corpus-sized reaches
the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIGN = np.uint64(1) << np.uint64(63)


def _to_ordered_u64(vals: np.ndarray) -> np.ndarray:
    """Order-preserving bijection into uint64 (so histogram refinement can
    bisect on bit prefixes).  float64 uses the IEEE-754 total-order trick
    (flip all bits of negatives, flip the sign bit of non-negatives);
    int64 uses offset-binary.  NaNs must be removed by the caller."""
    if np.issubdtype(vals.dtype, np.floating):
        b = np.ascontiguousarray(vals, dtype=np.float64).view(np.uint64)
        return np.where(b >> np.uint64(63) == 1, ~b, b | _SIGN)
    b = np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)
    return b ^ _SIGN


def _from_ordered_u64(u: np.uint64, floating: bool):
    """Inverse of ``_to_ordered_u64`` for one scalar."""
    u = np.uint64(u)
    if floating:
        b = ~u if (u & _SIGN) == 0 else u & ~_SIGN
        return float(np.uint64(b).view(np.float64))
    return int((u ^ _SIGN).view(np.int64))


def exact_order_statistic(
    ds,
    col: str,
    q: float,
    refine_bits: int = 16,
    collect_cap: int = 1 << 18,
    max_levels: int = 4,
):
    """EXACT value at 1-based rank ``max(ceil(q·n), 1)`` of ``ds[col]``
    (nulls and NaNs excluded) — the same "first rank ≥ q·n" rule
    ``quantile_length_filter``'s oracle mirrors with a window function.

    Distributed shape: one materialized skinny uint64 projection, then
    ≤ ``max_levels`` tree-merged histogram passes (2^refine_bits buckets,
    driver state = one cumsum per pass) narrow the stripe holding the
    target rank; the final stripe (≤ ``collect_cap`` rows, or whatever the
    level budget reached) is collected and partitioned exactly.  No sort,
    no full-column driver pull."""
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    if not 1 <= refine_bits <= 32:
        raise ValueError(f"refine_bits must be in [1, 32], got {refine_bits}")
    max_levels = min(max_levels, 64 // refine_bits)
    import ray

    from .aggregates import tree_groupby

    schema_field = ds.schema().base_schema.field(col)
    floating = pa.types.is_floating(schema_field.type)

    def project(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.drop_null().to_numpy(zero_copy_only=False)
        if floating:
            vals = vals[~np.isnan(vals)]
        return pa.table({"u": pa.array(_to_ordered_u64(vals), pa.uint64())})

    skinny = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = skinny.count()
    if n == 0:
        raise ValueError(f"exact_order_statistic: no non-null values in {col!r}")
    rank = max(int(math.ceil(q * n)), 1)

    n_buckets = 1 << refine_bits
    prefix, cnt, level = 0, n, 0
    while cnt > collect_cap and level < max_levels:
        shift = np.uint64(64 - (level + 1) * refine_bits)
        pshift = np.uint64(64 - level * refine_bits)
        pref = np.uint64(prefix)

        def hist_partial(batch: pa.Table, _s=shift, _ps=pshift, _p=pref) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            if _ps < 64:  # level > 0: keep only the active stripe
                u = u[(u >> _ps) == _p]
            b = ((u >> _s) & np.uint64(n_buckets - 1)).astype(np.int64)
            uk, uc = np.unique(b, return_counts=True)
            return pa.table(
                {"k": pa.array(uk, pa.int64()), "n": pa.array(uc, pa.int64())}
            )

        hist = pa.concat_tables(
            t
            for t in ray.get(
                tree_groupby(
                    skinny.map_batches(hist_partial, batch_format="pyarrow"),
                    ["k"],
                    [("n", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        )
        hk = hist.column("k").to_numpy(zero_copy_only=False)
        hn = hist.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(hk)
        hk, hn = hk[order], hn[order]
        cum = np.cumsum(hn)
        j = int(np.searchsorted(cum, rank))  # first bucket reaching the rank
        rank -= int(cum[j - 1]) if j else 0
        cnt = int(hn[j])
        prefix = (prefix << refine_bits) | int(hk[j])
        level += 1

    pshift = np.uint64(64 - level * refine_bits)
    pref = np.uint64(prefix)

    def stripe(batch: pa.Table, _ps=pshift, _p=pref) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        if _ps < 64:
            u = u[(u >> _ps) == _p]
        return pa.table({"u": pa.array(u, pa.uint64())})

    parts = [
        t.column("u").to_numpy(zero_copy_only=False)
        for t in ray.get(
            skinny.map_batches(stripe, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    ]
    vals = np.concatenate(parts)
    target = np.partition(vals, rank - 1)[rank - 1]
    return _from_ordered_u64(target, floating)


def exact_rank_of(ds, col: str, x: float) -> tuple[int, int, int]:
    """(#rows < x, #rows ≤ x, n) over non-null non-NaN values of ``ds[col]``
    — one streaming pass of per-batch partial sums, tree-combined.  The
    rank interval a value occupies: [lt+1, le]."""
    import ray

    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.drop_null().to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.floating):
            vals = vals[~np.isnan(vals)]
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "lt": pa.array([int((vals < x).sum())], pa.int64()),
                "le": pa.array([int((vals <= x).sum())], pa.int64()),
                "n": pa.array([len(vals)], pa.int64()),
            }
        )

    out = pa.concat_tables(
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
                ["g"],
                [("lt", "sum"), ("le", "sum"), ("n", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    )
    lt = int(out.column("lt").to_numpy().sum())
    le = int(out.column("le").to_numpy().sum())
    n = int(out.column("n").to_numpy().sum())
    return lt, le, n


def _group_value_hist(ds, group_col: str, value_col: str, opname: str,
                      partial_cap: int = 1 << 30):
    """Shared (group, value)-count histogram pass for the histogram-family
    grouped operators: per-batch combiner partials, materialized and
    size-checked BEFORE the bounded tree combine (an unbounded value domain
    then fails fast instead of OOMing the single repartition(1) task), then
    a tree-merged exact count per (group, value).

    Floating group columns are rejected up front: a NaN group is non-null
    yet never equal to itself, so it can neither join nor key a broadcast
    lookup.  Nulls in either column are rejected per batch."""
    from .aggregates import tree_groupby

    if pa.types.is_floating(ds.schema().base_schema.field(group_col).type):
        raise ValueError(
            f"{opname}: floating {group_col} unsupported as a group key "
            "(NaN groups are never equal to themselves) — cast or bucket it"
        )

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        if t.column(value_col).null_count:
            raise ValueError(
                f"{opname}: {value_col} contains nulls — filter or fill first"
            )
        if t.column(group_col).null_count:
            raise ValueError(
                f"{opname}: {group_col} contains nulls — filter or fill first"
            )
        return (
            pa.TableGroupBy(t, [group_col, value_col])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, value_col, "n"])
        )

    partials = ds.map_batches(
        hist_partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    pb = partials.size_bytes() or 0
    if pb > partial_cap:
        raise ValueError(
            f"{opname}: (group, value) partials total {pb} bytes "
            f"(> {partial_cap}) — the value domain is not bounded enough for "
            "the histogram construction; bucket the values first"
        )
    return tree_groupby(partials, [group_col, value_col], [("n", "sum")])


def group_value_rank(
    ds,
    group_col: str,
    value_col: str,
    descending: bool = False,
    out_col: str = "rank",
    broadcast_cap: int = 64 << 20,
):
    """Per-row competition rank (SQL ``RANK() OVER (PARTITION BY group
    ORDER BY value)``) computed WITHOUT shuffling the corpus: one skinny
    (group, value)-histogram pass tree-combines per-batch counts, the
    prefix-summed histogram is broadcast once, and every batch resolves its
    rows' ranks with a vectorized searchsorted probe.  Ties share a rank
    (competition ranking) — exactly SQL RANK, which is what a histogram can
    answer; ROW_NUMBER tie-breaking would need a real per-group sort.

    Requires a bounded (group × distinct-value) domain — integer scores,
    lengths, bucketed floats (the histogram must fit ``broadcast_cap``);
    raises otherwise rather than silently degrading.  Scale shape
    (10^12 rows): only histogram partials move; output rows stream out of
    the same map_batches that read them.

    The same construction as ``curate.grouped_order_statistic`` (exact
    per-group percentiles) but inverted: that broadcasts rank targets and
    returns k values; this broadcasts the whole value CDF and annotates
    every row.  Nulls in ``value_col`` are rejected (rank is undefined).
    """
    import ray

    hist_ds = _group_value_hist(
        ds, group_col, value_col, "group_value_rank",
        partial_cap=broadcast_cap * 16,
    ).materialize()
    if (hist_ds.size_bytes() or 0) > broadcast_cap:
        raise ValueError(
            "group_value_rank: (group, value) histogram exceeds the broadcast "
            f"cap ({hist_ds.size_bytes()} > {broadcast_cap} bytes) — the value "
            "domain is not bounded enough for the histogram-rank construction; "
            "bucket the values first or use a sort-based rank"
        )
    tabs = [
        t for t in ray.get(hist_ds.to_arrow_refs()) if t.num_rows and t.num_columns
    ]
    lookup: dict = {}
    if tabs:
        hist = pa.concat_tables(tabs)
        groups = hist.column(group_col).to_numpy(zero_copy_only=False)
        vals = hist.column(value_col).to_numpy(zero_copy_only=False)
        cnts = hist.column("n").to_numpy(zero_copy_only=False)
        for g in np.unique(groups):
            m = groups == g
            gv, gc = vals[m], cnts[m]
            order = np.argsort(gv, kind="mergesort")
            gv, gc = gv[order], gc[order]
            if descending:
                # rank 1 = largest value: starts are suffix sums
                starts = np.concatenate(
                    ([np.int64(1)], 1 + np.cumsum(gc[::-1])[:-1])
                )[::-1].copy()
            else:
                starts = np.concatenate(([np.int64(1)], 1 + np.cumsum(gc)[:-1]))
            lookup[g if not isinstance(g, np.generic) else g.item()] = (gv, starts)
    lookup_ref = ray.put(lookup)

    def annotate(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        gcol = batch.column(group_col)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        g_np = gcol.to_numpy(zero_copy_only=False)
        v_np = batch.column(value_col).to_numpy(zero_copy_only=False)
        rank = np.empty(len(g_np), dtype=np.int64)
        enc = gcol.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        for ci, gval in enumerate(enc.dictionary.to_pylist()):
            m = codes == ci
            gv, starts = lk[gval]
            rank[m] = starts[np.searchsorted(gv, v_np[m])]
        return batch.append_column(out_col, pa.array(rank, pa.int64()))

    return ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)


def group_mode(ds, group_col: str, value_col: str):
    """Exact per-group MODE with a deterministic tie policy (highest count,
    then smallest value): one skinny (group, value)-count tree pass, then
    an argmax per group over the bounded histogram — the corpus never
    shuffles and nothing corpus-sized reaches the driver.

    Output rows: (``group_col``, ``mode`` = the winning value,
    ``mode_count`` int64).  Same bounded-(group x distinct-value)-domain
    assumption as :func:`group_value_rank`; nulls in either column are
    rejected (a null mode is undefined).
    """
    hist = _group_value_hist(ds, group_col, value_col, "group_mode")

    def argmax(batch: pa.Table) -> pa.Table:
        # deterministic winner per group: sort (count desc, value asc) and
        # take the first run element per group
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                (group_col, "ascending"),
                ("n", "descending"),
                (value_col, "ascending"),
            ],
        )
        s = batch.take(idx)
        gc = s.column(group_col)
        if isinstance(gc, pa.ChunkedArray):
            gc = gc.combine_chunks()
        codes = gc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        first = np.empty(len(codes), dtype=bool)
        if len(codes):
            first[0] = True
            first[1:] = codes[1:] != codes[:-1]
        keep = pa.array(first)
        return pa.table(
            {
                group_col: gc.filter(keep),
                "mode": s.column(value_col).filter(keep)
                if not isinstance(s.column(value_col), pa.ChunkedArray)
                else s.column(value_col).combine_chunks().filter(keep),
                "mode_count": s.column("n").filter(keep)
                if not isinstance(s.column("n"), pa.ChunkedArray)
                else s.column("n").combine_chunks().filter(keep),
            }
        )

    return hist.repartition(1).map_batches(
        argmax, batch_format="pyarrow", batch_size=None
    )


def quantile_bucket(
    ds,
    value_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    sub_bits: int = 4,
    n_parts: int = 64,
    max_cells: int = 1 << 20,
):
    """Exact global NTILE(``k``) over ``(value, splitmix64(id, seed), id)``
    WITHOUT a global sort — the curriculum / difficulty-bucketing primitive
    ("put every document in its global quality decile") at corpus scale.

    Output rows: (``id_col``, ``value_col``, ``tile`` int64 in 1..k), tile
    sizes exactly NTILE's (the first ``n % k`` tiles hold ``n // k + 1``
    rows).  The id-hash tie order makes equal values split across tiles
    deterministically and partition-invariantly — SQL-mirrorable as
    ``NTILE(k) OVER (ORDER BY value, h, id)``.

    Scale shape (10^12 rows): the classic histogram-prefix rank
    construction (``epoch_shuffle``'s), generalized to a value sort key:

    1. one pass projects skinny (id, v, h) rows and their CELL — the pair
       (ordered-uint64 of v, top ``sub_bits`` bits of h).  Cells are
       lexicographically ordered exactly like the global sort order, and
       the hash sub-key SALTS heavy values: a value owning half the corpus
       spreads over 2^sub_bits cells instead of one sort partition;
    2. per-cell counts tree-reduce (bounded by the group_value_rank-style
       value-domain budget: distinct values × 2^sub_bits ≤ ``max_cells``);
       the driver prefix-sums them into each cell's global start rank —
       KBs–MBs, broadcast once;
    3. the ONLY shuffle moves skinny (id, v, cell) rows into ``n_parts``
       hash-of-cell partitions; each partition sorts locally by
       (cell, h, id), run-detects cells, and emits
       ``start[cell] + arange(run)`` ranks → tiles by pure NTILE integer
       arithmetic.  The corpus text never moves.

    Nulls (and float NaNs) in ``value_col`` are rejected — their NTILE
    position is engine-defined, so a null row silently binned would be a
    portability bug, not a feature.
    """
    if k < 1:
        raise ValueError(f"quantile_bucket: k must be >= 1, got {k}")
    if not 0 <= sub_bits <= 16:
        raise ValueError(
            f"quantile_bucket: sub_bits must be in [0, 16], got {sub_bits}"
        )
    if not 1 <= n_parts <= (1 << 20):
        raise ValueError(
            f"quantile_bucket: n_parts must be in [1, 2^20], got {n_parts}"
        )
    import ray

    from ..sketches.hashing import hash64_ints, splitmix64
    from .aggregates import tree_groupby

    seed = int(seed)
    schema = ds.schema()
    if schema is None:
        # an empty dataset behind a repartition reports no schema at all —
        # there is nothing to rank and no value type to preserve
        raise ValueError(
            "quantile_bucket: input dataset has no schema (empty behind a "
            "repartition?) — nothing to bucket"
        )
    vfield = schema.base_schema.field(value_col)
    floating = pa.types.is_floating(vfield.type)
    sub_shift = np.uint64(64 - sub_bits) if sub_bits else None

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.null_count:
            raise ValueError(
                f"quantile_bucket: {id_col} contains nulls — a null id has "
                "no hash (NaN→uint64 is platform-defined); filter first"
            )
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"quantile_bucket: {value_col} contains nulls — filter or "
                "fill first"
            )
        vals = v.to_numpy(zero_copy_only=False)
        if floating and np.isnan(vals).any():
            raise ValueError(
                f"quantile_bucket: {value_col} contains NaNs — filter first"
            )
        vu = _to_ordered_u64(vals)
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        sub = (
            (h >> sub_shift).astype(np.int32)
            if sub_bits
            else np.zeros(len(h), dtype=np.int32)
        )
        # coarse shuffle partition: all rows of one (vu, sub) cell co-locate
        with np.errstate(over="ignore"):
            part = splitmix64(vu + np.uint64(0x9E3779B97F4A7C15) * sub.astype(np.uint64))
        return pa.table(
            {
                id_col: ids,
                value_col: v,
                "vu": pa.array(vu, pa.uint64()),
                "sub": pa.array(sub, pa.int32()),
                "h": pa.array(h, pa.uint64()),
                "part": pa.array((part % np.uint64(n_parts)).astype(np.int32), pa.int32()),
            }
        )

    skinny = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def cell_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["vu", "sub"])
        return (
            pa.TableGroupBy(t, ["vu", "sub"])
            .aggregate([([], "count_all")])
            .rename_columns(["vu", "sub", "n"])
        )

    cells_t = [
        t
        for t in ray.get(
            tree_groupby(
                skinny.map_batches(cell_partial, batch_format="pyarrow"),
                ["vu", "sub"],
                [("n", "sum")],
                # enforced INSIDE the tree: a high-cardinality value column
                # errors at the first oversized combine, before any
                # corpus-sized cell table can reach one task or the driver
                max_groups=max_cells,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    starts_lookup: dict = {}
    n_total = 0
    if cells_t:
        cells = pa.concat_tables(cells_t)
        if cells.num_rows > max_cells:
            raise ValueError(
                f"quantile_bucket: {cells.num_rows} (value, salt) cells "
                f"(> {max_cells}) — the value domain is not bounded enough "
                "for the histogram-rank construction; bucket the values "
                "first or lower sub_bits"
            )
        cv = cells.column("vu").to_numpy(zero_copy_only=False)
        cs = cells.column("sub").to_numpy(zero_copy_only=False)
        cn = cells.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((cs, cv))  # global sort order of the cells
        cv, cs, cn = cv[order], cs[order], cn[order]
        starts = np.concatenate(([np.int64(0)], np.cumsum(cn)[:-1]))
        n_total = int(cn.sum())
        starts_lookup = {
            (int(a), int(b)): int(s) for a, b, s in zip(cv, cs, starts)
        }
    lk_ref = ray.put((starts_lookup, n_total))

    q, rem = divmod(n_total, k)
    thresh = np.int64(rem * (q + 1))
    qq = np.int64(max(q, 1))  # q == 0 ⇒ every rank is below thresh anyway

    def rank_part(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    value_col: pa.array([], vfield.type),
                    "tile": pa.array([], pa.int64()),
                }
            )
        from ..core.bcast import cached_get

        # the starts dict is pickled state (never zero-copy): deserialize
        # once per worker process, not once per map_groups call
        lk, _n = cached_get(lk_ref)
        idx = pc.sort_indices(
            group,
            sort_keys=[
                ("vu", "ascending"),
                ("sub", "ascending"),
                ("h", "ascending"),
                (id_col, "ascending"),
            ],
        )
        s = group.take(idx)
        vu = s.column("vu").to_numpy(zero_copy_only=False)
        sub = s.column("sub").to_numpy(zero_copy_only=False)
        m = len(vu)
        run_start = np.empty(m, dtype=bool)
        run_start[0] = True
        run_start[1:] = (vu[1:] != vu[:-1]) | (sub[1:] != sub[:-1])
        run_idx = np.flatnonzero(run_start)
        run_lens = np.diff(np.append(run_idx, m))
        base = np.array(
            [lk[(int(vu[i]), int(sub[i]))] for i in run_idx], dtype=np.int64
        )
        rank = np.repeat(base, run_lens) + (
            np.arange(m, dtype=np.int64) - np.repeat(run_idx, run_lens)
        )
        tile = np.where(
            rank < thresh,
            rank // np.int64(q + 1),
            np.int64(rem) + (rank - thresh) // qq,
        ) + 1
        return pa.table(
            {
                id_col: s.column(id_col),
                value_col: s.column(value_col),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    return skinny.groupby("part").map_groups(rank_part, batch_format="pyarrow")


def quantile_bucket_approx(
    ds,
    value_col: str,
    k: int,
    id_col: str = "doc_id",
    kll_k: int = 2048,
):
    """Approximate k-bucket quantile annotate for UNBOUNDED value domains —
    the scale companion of `quantile_bucket`, which requires a bounded
    (value × salt) cell budget.  Two passes, neither shuffles:

    1. one mergeable-KLL pass learns the k−1 split points (KB partials,
       coalesce-tree merge); below the sketch's saturation point the
       splits are EXACT order statistics (value at the first rank
       ≥ (i/k)·n — what the SQL oracle computes at gate scale), above it
       they carry KLL's published rank-error bound, the right trade at
       10^12 rows where a ±ε-rank boundary is indistinguishable in effect;
    2. the split array rides the closure into a plain map_batches
       annotate: bucket = 1 + #(splits < value) (ties land in the FIRST
       bucket whose split equals the value — deterministic).

    Unlike exact NTILE, bucket POPULATIONS are only approximately n/k
    (equal values cannot be split across buckets, and split error adds at
    saturation); what is guaranteed is that the assignment is a pure
    function of (value, learned splits).  Values must be numeric and
    below 2^53 in magnitude (split comparison happens in float64 — the
    KLL's own value domain); nulls/NaNs are rejected loudly."""
    if k < 1:
        raise ValueError(f"quantile_bucket_approx: k must be >= 1, got {k}")
    from ..core.udaf import SketchSpec, build_sketches

    schema = ds.schema()
    if schema is None:
        raise ValueError(
            "quantile_bucket_approx: input dataset has no schema (empty "
            "behind a repartition?) — nothing to bucket"
        )
    vtype = schema.base_schema.field(value_col).type
    floating = pa.types.is_floating(vtype)

    spec = SketchSpec(
        name="qb", kind="kll", column=value_col,
        params={"k": kll_k}, value_kind="float",
    )
    sk = build_sketches(ds, [spec])["qb"]
    if sk.n == 0:
        splits = np.zeros(0, np.float64)
    else:
        splits = np.array(
            [sk.quantile(i / k) for i in range(1, k)], dtype=np.float64
        )

    def annotate(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"quantile_bucket_approx: {value_col} contains nulls — "
                "filter or fill first"
            )
        vals = v.to_numpy(zero_copy_only=False)
        if floating and np.isnan(vals).any():
            raise ValueError(
                f"quantile_bucket_approx: {value_col} contains NaNs — "
                "filter first"
            )
        vf = vals.astype(np.float64)
        bucket = np.searchsorted(splits, vf, side="left") + 1
        return pa.table(
            {
                id_col: ids,
                value_col: v,
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)


def winsorize(
    ds,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    id_col: str = "doc_id",
    kll_k: int = 2048,
):
    """Outlier clipping at learned quantiles — the robust-statistics prep
    step (cap document lengths at p99 before mean/variance, tame crawl
    spam before per-host aggregates): annotate every row with
    ``value_clipped = min(max(v, p_lo), p_hi)`` where the two thresholds
    come from one mergeable-KLL pass (`quantile_length_filter`'s budget:
    KB partials, no shuffle; exact order statistics below saturation,
    published rank-error bound above).  Clipping preserves the input
    dtype — integer columns stay integers, so the result value-hashes.
    Values must be below 2^53 in magnitude (the KLL stores doubles, so a
    larger int64 threshold would round to a value not in the data — the
    same limit `quantile_bucket_approx` documents).
    Output rows: (id, value, value_clipped)."""
    if not 0.0 <= lo_q <= hi_q <= 1.0:
        raise ValueError(
            f"winsorize: need 0 <= lo_q <= hi_q <= 1, got {lo_q}, {hi_q}"
        )
    from ..core.udaf import SketchSpec, build_sketches

    schema = ds.schema()
    if schema is None:
        raise ValueError(
            "winsorize: input dataset has no schema (empty behind a "
            "repartition?)"
        )
    vtype = schema.base_schema.field(value_col).type
    floating = pa.types.is_floating(vtype)

    spec = SketchSpec(
        name="w", kind="kll", column=value_col,
        params={"k": kll_k}, value_kind="float",
    )
    sk = build_sketches(ds, [spec])["w"]
    if sk.n == 0:
        raise ValueError(f"winsorize: no non-null values in {value_col!r}")
    lo_v, hi_v = sk.quantile(lo_q), sk.quantile(hi_q)

    def clip(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"winsorize: {value_col} contains nulls — filter or fill "
                "first"
            )
        vals = v.to_numpy(zero_copy_only=False)
        if floating and np.isnan(vals).any():
            raise ValueError(f"winsorize: {value_col} contains NaNs")
        # thresholds are float64 copies of actual data values (KLL stores
        # doubles), so casting back to the input dtype is exact
        lo = np.asarray(lo_v, dtype=np.float64).astype(vals.dtype)
        hi = np.asarray(hi_v, dtype=np.float64).astype(vals.dtype)
        clipped = np.clip(vals, lo, hi)
        return pa.table(
            {
                id_col: batch.column(id_col),
                value_col: v,
                "value_clipped": pa.array(clipped).cast(vtype),
            }
        )

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


def mad_outliers(
    ds,
    value_col: str,
    k_num: int = 3,
    k_den: int = 1,
    id_col: str = "doc_id",
):
    """Robust distribution-tail audit: rows whose integer value deviates
    from the MEDIAN by more than ``k_num/k_den`` times the median absolute
    deviation — the outlier rule that survives the outliers themselves
    (one 10^9-char document shifts a mean/σ z-score but not the MAD).
    Median and MAD are the exact "first rank ≥ ⌈n/2⌉" order statistics
    (two `exact_order_statistic` histogram-refinement passes, no sort),
    and the tail predicate is the pure-integer cross-multiply
    ``k_den·|x − med| > k_num·MAD`` — bit-stable against the SQL window
    mirror at any partition order.

    Output rows: (id_col int64, value_col int64)."""
    if k_den <= 0 or k_num <= 0:
        raise ValueError(
            f"mad_outliers: need k_num, k_den > 0, got {k_num}/{k_den}"
        )
    schema = ds.schema()
    if schema is None:
        raise ValueError("mad_outliers: input dataset has no schema")
    if not pa.types.is_integer(schema.base_schema.field(value_col).type):
        raise ValueError(
            f"mad_outliers: {value_col} must be an integer column for the "
            "exact cross-multiply predicate"
        )
    med = int(exact_order_statistic(ds, value_col, 0.5))

    def deviation(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"mad_outliers: {value_col} contains nulls — filter first"
            )
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return pa.table({"dev": pa.array(np.abs(vals - med), pa.int64())})

    mad = int(
        exact_order_statistic(
            ds.map_batches(deviation, batch_format="pyarrow", zero_copy_batch=True),
            "dev",
            0.5,
        )
    )
    kn, kd = np.int64(k_num), np.int64(k_den)
    med_i, mad_i = np.int64(med), np.int64(mad)

    def tail(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keep = kd * np.abs(vals - med_i) > kn * mad_i
        mask = pa.array(keep)
        return pa.table(
            {
                id_col: batch.column(id_col).filter(mask),
                value_col: pa.array(vals[keep], pa.int64()),
            }
        )

    return ds.map_batches(tail, batch_format="pyarrow", zero_copy_batch=True)


def value_histogram(
    ds,
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
):
    """Fixed-bin integer histogram — the corpus-audit distribution plot
    (token-count / score / size distributions) as one streaming pass:
    ``bin = clip((v − lo) · n_bins // (hi − lo), 0, n_bins−1)`` in pure
    int64 arithmetic (under/overflow values land in the edge bins, so
    every row is counted).  Output rows: (``bin`` int64, ``bin_lo``
    int64 inclusive lower edge, ``n`` int64), only non-empty bins.

    Scale shape: per-batch bincount partials → bounded coalesce-tree sum;
    nothing shuffles, the driver never sees row data."""
    if hi <= lo:
        raise ValueError(f"value_histogram: need hi > lo, got [{lo}, {hi})")
    if not 1 <= n_bins <= (1 << 20):
        raise ValueError(
            f"value_histogram: n_bins must be in [1, 2^20], got {n_bins}"
        )
    if (int(hi) - int(lo)) * int(n_bins) >= (1 << 62):
        raise ValueError(
            "value_histogram: span * n_bins would overflow int64 — narrow "
            "the range or use fewer bins"
        )
    lo_i, hi_i, nb = np.int64(lo), np.int64(hi), np.int64(n_bins)
    span = hi_i - lo_i

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"value_histogram: {value_col} contains nulls — filter first"
            )
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64)
        # pre-clip into [lo, hi-1] BEFORE the multiply: a huge outlier
        # times nb would silently wrap int64 and land in the WRONG edge
        # bin (the span*nb guard above bounds the post-clip product)
        vals = np.clip(vals, lo_i, hi_i - np.int64(1))
        b = (vals - lo_i) * nb // span
        uk, uc = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(uk, pa.int64()), "n": pa.array(uc, pa.int64())}
        )

    from .aggregates import tree_groupby

    hist = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["bin"],
        [("n", "sum")],
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
        # exact inclusive lower edge: smallest in-range v with
        # (v - lo)·nb // span == b, i.e. lo + ceil(b·span / nb)
        edge = lo_i + (b * span + nb - np.int64(1)) // nb
        out = pa.table(
            {
                "bin": batch.column("bin"),
                "bin_lo": pa.array(edge, pa.int64()),
                "n": batch.column("n"),
            }
        )
        return out.take(pc.sort_indices(out, sort_keys=[("bin", "ascending")]))

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


def zscore_outliers(
    ds,
    value_col: str,
    k_num: int = 3,
    k_den: int = 1,
    id_col: str = "doc_id",
):
    """Rows whose integer value sits more than ``k_num/k_den`` population
    standard deviations from the mean — the classic distribution-tail
    audit (freak document lengths, runaway event counts) computed so the
    float predicate is GATE-STABLE: ``|x − μ| > k·σ`` is evaluated as the
    exact integer comparison ``|N·x − S| > isqrt(⌊k²·(N·SS − S²)/k_den²⌋)``
    (S = Σx, SS = Σx², all exact), so no engine-vs-oracle partial-sum
    order or sqrt rounding can flip a boundary row.  The SQL mirror is
    the HUGEINT cross-multiply of the same inequality.

    Scale shape: pass 1 is per-batch (n, Σx, Σx²) scalar partials — Σx²
    carried as two int64 lanes (hi/lo 32 bits) so the tree-sum cannot
    wrap — tree-combined to one row; pass 2 streams a vectorized int64
    filter with the three scalars closed over.  Nothing shuffles; the
    driver sees only scalar partials.

    Output rows: (id_col int64, value_col int64).  Values must satisfy
    |v| < 2^20 (keeps every intermediate exactly representable; raise
    the lanes if a wider domain is ever needed)."""
    import ray

    from .aggregates import tree_groupby

    if k_den <= 0 or k_num <= 0:
        raise ValueError(
            f"zscore_outliers: need k_num, k_den > 0, got {k_num}/{k_den}"
        )
    _CAP = np.int64(1) << np.int64(20)
    _MASK = np.int64((1 << 32) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            raise ValueError(
                f"zscore_outliers: {value_col} contains nulls — filter first"
            )
        vals = v.to_numpy(zero_copy_only=False)
        if not np.issubdtype(vals.dtype, np.integer):
            raise ValueError(
                f"zscore_outliers: {value_col} must be an integer column "
                f"(got {vals.dtype}); exact tail detection needs integer "
                "moment sums"
            )
        vals = vals.astype(np.int64, copy=False)
        if len(vals) and np.abs(vals).max() >= _CAP:
            raise ValueError(
                f"zscore_outliers: |{value_col}| must be < 2^20 so Σx² "
                "stays exactly representable in the two-lane carry"
            )
        ss = int(np.sum(vals * vals, dtype=np.int64))
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([len(vals)], pa.int64()),
                "s": pa.array([int(vals.sum(dtype=np.int64))], pa.int64()),
                "ss_hi": pa.array([ss >> 32], pa.int64()),
                "ss_lo": pa.array([ss & int(_MASK)], pa.int64()),
            }
        )

    parts = pa.concat_tables(
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["g"],
                [("n", "sum"), ("s", "sum"), ("ss_hi", "sum"), ("ss_lo", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    )
    n = int(parts.column("n").to_numpy().sum())
    if n == 0:
        raise ValueError(f"zscore_outliers: no rows in {value_col!r}")
    s = int(parts.column("s").to_numpy().sum())
    ss = (int(parts.column("ss_hi").to_numpy().sum()) << 32) + int(
        parts.column("ss_lo").to_numpy().sum()
    )
    # d² > ⌊k_num²·(N·SS − S²) / k_den²⌋  ⇔  |d| > isqrt(that) , all exact
    var_scaled = k_num * k_num * (n * ss - s * s)
    if var_scaled < 0:
        raise AssertionError("zscore_outliers: negative scaled variance")
    bound = math.isqrt(var_scaled // (k_den * k_den))
    if n * (1 << 20) >= (1 << 62):
        raise ValueError(
            "zscore_outliers: N·max|x| would overflow the int64 filter — "
            "shard the input"
        )
    n_i, s_i, b_i = np.int64(n), np.int64(s), np.int64(bound)

    def tail(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        d = n_i * vals - s_i
        keep = np.abs(d) > b_i
        mask = pa.array(keep)
        return pa.table(
            {
                id_col: batch.column(id_col).filter(mask),
                value_col: pa.array(vals[keep], pa.int64()),
            }
        )

    return ds.map_batches(tail, batch_format="pyarrow", zero_copy_batch=True)


def group_moments(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    max_groups: int = 100_000,
):
    """Per-group EXACT second-moment components over two integer feature
    columns — (n, Σx, Σy, Σx², Σy², Σxy) — the covariance / correlation
    audit a curation run uses to spot feature drift (are long documents
    also token-dense? did the quality score decouple from length in one
    source?).  Everything is integer arithmetic so the result is bit-stable
    under any partial-sum order; the caller derives cov/corr floats from
    the exact components if it wants them.

    Scale shape: one per-batch Arrow hash-aggregation compresses each block
    to ≤groups rows of partial sums (products ≤2^40 per element, per-block
    sums ≤2^62 for blocks under 4M rows), carried through the coalesce-tree
    as hi/lo 32-bit lanes so re-summing across any number of blocks cannot
    wrap, then reassembled with Python ints on the bounded final table.
    Raises loudly if a total leaves int64 (the BIGINT output domain) or the
    key count exceeds ``max_groups``.

    Values must satisfy 0 ≤ v < 2^20 (same exactness budget as
    ``zscore_outliers``)."""
    import ray

    from .aggregates import tree_groupby

    _CAP = np.int64(1) << np.int64(20)
    _MASK = np.int64((1 << 32) - 1)
    sums = ("sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows > (1 << 22):
            raise ValueError(
                "group_moments: block > 4M rows would overflow the "
                "per-block product sums — lower target_max_block_size"
            )
        cols = {}
        for name in (x_col, y_col):
            v = batch.column(name)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            if v.null_count:
                raise ValueError(
                    f"group_moments: {name} contains nulls — filter first"
                )
            a = v.to_numpy(zero_copy_only=False)
            if not np.issubdtype(a.dtype, np.integer):
                raise ValueError(
                    f"group_moments: {name} must be integer (got {a.dtype})"
                )
            a = a.astype(np.int64, copy=False)
            if len(a) and (a.min() < 0 or a.max() >= _CAP):
                raise ValueError(
                    f"group_moments: need 0 <= {name} < 2^20 so products "
                    "stay exactly representable"
                )
            cols[name] = a
        x, y = cols[x_col], cols[y_col]
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "n": pa.array(np.ones(len(x), np.int64)),
                "sum_x": pa.array(x),
                "sum_y": pa.array(y),
                "sum_xx": pa.array(x * x),
                "sum_yy": pa.array(y * y),
                "sum_xy": pa.array(x * y),
            }
        )
        g = pa.TableGroupBy(t, group_col).aggregate(
            [("n", "sum")] + [(s, "sum") for s in sums]
        )
        g = g.rename_columns([group_col, "n"] + list(sums))
        # split each sum into hi/lo 32-bit lanes: the tree re-sums lanes
        # independently, so block count can never wrap the carried totals
        out = {group_col: g.column(group_col), "n": g.column("n")}
        for s in sums:
            v = g.column(s).to_numpy(zero_copy_only=False)
            out[s + "_hi"] = pa.array(v >> np.int64(32), pa.int64())
            out[s + "_lo"] = pa.array(v & _MASK, pa.int64())
        return pa.table(out)

    aggs = [("n", "sum")]
    for s in sums:
        aggs += [(s + "_hi", "sum"), (s + "_lo", "sum")]
    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=None,
                ),
                [group_col],
                aggs,
                max_groups=max_groups,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:  # empty corpus: no groups, stable schema
        return pa.table(
            {group_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            | {s: pa.array([], pa.int64()) for s in sums}
        )
    parts = pa.concat_tables(tabs)
    out = {group_col: parts.column(group_col), "n": parts.column("n")}
    for s in sums:
        hi = parts.column(s + "_hi").to_numpy(zero_copy_only=False)
        lo = parts.column(s + "_lo").to_numpy(zero_copy_only=False)
        vals = [(int(h) << 32) + int(l) for h, l in zip(hi, lo)]
        if any(v >= (1 << 63) for v in vals):
            raise ValueError(
                f"group_moments: {s} total leaves int64 — rescale the "
                "feature or shard the corpus"
            )
        out[s] = pa.array(vals, pa.int64())
    return pa.table(out)


def group_entropy_bits(
    ds,
    group_col: str,
    value_col: str,
    max_groups: int = 1_000_000,
):
    """Per-group label diversity as EXACT integer bits: for each group with
    member counts c_v over the distinct values of ``value_col``, emits

        h_bits_scaled = n·ilog2(n) − Σ_v c_v·ilog2(c_v)      (ilog2 = ⌊log2⌋)

    — n times the staircase lower bound of the Shannon entropy of the
    group's value distribution (0 ⇔ single-valued; grows with spread).  The
    integer-bits form is the same gate-stable trick as ``unigram_logloss``:
    no float log ever runs, so engine and SQL (`strlen(bin(c))-1`) agree
    bit-for-bit at any scale.  Use it to audit source/label mix collapse —
    a shard whose lang entropy drops to 0 is a crawler bug.

    Scale shape: per-batch (group, value) Arrow count partials (each block
    compresses to its group×value vocabulary), tree-combined sums, then a
    vectorized per-group finish on the bounded final table.  The
    group×value key domain must be bounded (``max_groups`` makes the
    violation loud inside the tree)."""
    import ray

    from .textstats import _ilog2_exact
    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        for name in (group_col, value_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"group_entropy_bits: {name} contains nulls — filter "
                    "or fill first (SQL GROUP BY null parity is a trap)"
                )
        t = batch.select([group_col, value_col])
        g = pa.TableGroupBy(t, [group_col, value_col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([group_col, value_col, "c"])

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True,
                    batch_size=None,
                ),
                [group_col, value_col],
                [("c", "sum")],
                max_groups=max_groups,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:  # empty corpus: no groups, stable schema
        return pa.table(
            {
                group_col: pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "h_bits_scaled": pa.array([], pa.int64()),
            }
        )
    parts = pa.concat_tables(tabs)
    c = parts.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
    if len(c) and c.max() >= (1 << 53):
        raise ValueError(
            "group_entropy_bits: a count exceeds 2^53 — frexp ilog2 is no "
            "longer exact; shard the group"
        )
    terms = c * _ilog2_exact(c)
    gt = pa.table(
        {
            group_col: parts.column(group_col),
            "n": pa.array(c),
            "sc": pa.array(terms),
        }
    )
    fin = pa.TableGroupBy(gt, group_col).aggregate(
        [("n", "sum"), ("sc", "sum")]
    ).rename_columns([group_col, "n", "sc"])
    n = fin.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    sc = fin.column("sc").to_numpy(zero_copy_only=False).astype(np.int64)
    h = n * _ilog2_exact(n) - sc
    return pa.table(
        {
            group_col: fin.column(group_col),
            "n": pa.array(n),
            "h_bits_scaled": pa.array(h),
        }
    )


def distribution_drift(
    ds,
    value_col: str,
    side_col: str,
    lo: int,
    hi: int,
    n_bins: int,
    t_num: int = 1,
    t_den: int = 50,
):
    """Two-subcorpus histogram comparison — the data-drift audit that
    answers "did this week's crawl change shape vs last week's?" without a
    single float: both sides are binned with ``value_histogram``'s exact
    int64 rule, and a bin is flagged as drifted when the absolute share
    difference exceeds ``t_num/t_den``, evaluated as the cross-multiplied
    integer inequality

        t_den · |n_a·N_b − n_b·N_a| > t_num · N_a · N_b

    (Python bigints on the bounded final table — the products pass int64
    long before the inputs do).  ``side_col`` must be 0 (subcorpus a) or
    1 (subcorpus b); rows: (bin, bin_lo, n_a, n_b, drift∈{0,1}), only bins
    non-empty on at least one side.

    Scale shape: per-batch two-lane bincount partials → coalesce-tree sum
    over ≤n_bins keys → driver finish on the tiny table.  Nothing
    shuffles."""
    if hi <= lo:
        raise ValueError(f"distribution_drift: need hi > lo, got [{lo}, {hi})")
    if not 1 <= n_bins <= (1 << 20):
        raise ValueError(
            f"distribution_drift: n_bins must be in [1, 2^20], got {n_bins}"
        )
    if (int(hi) - int(lo)) * int(n_bins) >= (1 << 62):
        raise ValueError(
            "distribution_drift: span * n_bins would overflow int64"
        )
    if t_num <= 0 or t_den <= 0:
        raise ValueError(
            f"distribution_drift: need t_num, t_den > 0, got {t_num}/{t_den}"
        )
    lo_i, hi_i, nb = np.int64(lo), np.int64(hi), np.int64(n_bins)
    span = hi_i - lo_i

    def partial(batch: pa.Table) -> pa.Table:
        for name in (value_col, side_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"distribution_drift: {name} contains nulls — filter first"
                )
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vals = v.to_numpy(zero_copy_only=False).astype(np.int64)
        side = (
            batch.column(side_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(side) and (side.min() < 0 or side.max() > 1):
            raise ValueError(
                f"distribution_drift: {side_col} must be 0 or 1"
            )
        # same pre-clip-before-multiply posture as value_histogram
        vals = np.clip(vals, lo_i, hi_i - np.int64(1))
        b = (vals - lo_i) * nb // span
        uk, inv = np.unique(b, return_inverse=True)
        n_a = np.bincount(inv[side == 0], minlength=len(uk)).astype(np.int64)
        n_b = np.bincount(inv[side == 1], minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "bin": pa.array(uk, pa.int64()),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
            }
        )

    import ray

    from .aggregates import tree_groupby

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["bin"],
                [("n_a", "sum"), ("n_b", "sum")],
                max_groups=n_bins,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        raise ValueError(
            "distribution_drift: empty input — shares are undefined"
        )
    parts = pa.concat_tables(tabs)
    bins = parts.column("bin").to_numpy(zero_copy_only=False)
    a = parts.column("n_a").to_numpy(zero_copy_only=False)
    b = parts.column("n_b").to_numpy(zero_copy_only=False)
    na, nb_tot = int(a.sum()), int(b.sum())
    if na == 0 or nb_tot == 0:
        raise ValueError(
            f"distribution_drift: one side is empty (N_a={na}, N_b={nb_tot}) "
            "— shares are undefined; check the split column"
        )
    drift = [
        1
        if t_den * abs(int(ai) * nb_tot - int(bi) * na) > t_num * na * nb_tot
        else 0
        for ai, bi in zip(a, b)
    ]
    edge = lo_i + (bins * span + nb - np.int64(1)) // nb
    order = np.argsort(bins, kind="stable")
    return pa.table(
        {
            "bin": pa.array(bins[order], pa.int64()),
            "bin_lo": pa.array(edge[order], pa.int64()),
            "n_a": pa.array(a[order], pa.int64()),
            "n_b": pa.array(b[order], pa.int64()),
            "drift": pa.array(np.asarray(drift, np.int64)[order]),
        }
    )


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D MAX-skyline: row i survives iff no row has
    (x ≥ xi AND y ≥ yi) with a strict improvement somewhere.  Equal (x, y)
    duplicates all survive (neither strictly dominates).  One lexsort +
    per-x-group max + exclusive suffix max — O(n log n), dtype-pure (no
    float sentinel, so int64 metrics never round)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((y, x))  # x asc, y asc within ties
    xs, ys = x[order], y[order]
    new = np.empty(n, bool)
    new[0] = True
    np.not_equal(xs[1:], xs[:-1], out=new[1:])
    gidx = np.cumsum(new) - 1
    ngroups = int(gidx[-1]) + 1
    last_idx = np.flatnonzero(np.concatenate((new[1:], [True])))
    maxy = ys[last_idx]  # per x-group max, ascending-x group order
    keep_group = np.empty(ngroups, bool)
    keep_group[-1] = True
    if ngroups > 1:
        sfx = np.maximum.accumulate(maxy[::-1])[::-1]  # inclusive suffix max
        np.greater(maxy[:-1], sfx[1:], out=keep_group[:-1])
    keep_sorted = keep_group[gidx] & (ys == maxy[gidx])
    mask = np.empty(n, bool)
    mask[order] = keep_sorted
    return mask


def pareto_front(ds, x_col: str, y_col: str, max_front: int = 1_000_000):
    """Pareto frontier (SQL NOT-EXISTS skyline) over two MAXIMIZED metrics
    — the multi-objective data-selection primitive (quality vs length,
    coverage vs cost): keep every row no other row dominates.  All input
    columns ride through on surviving rows.

    Scale shape: local skyline per block (the global frontier is a subset
    of the union of local frontiers — dominance is transitive, so any
    globally dominated row is dominated by a row that survives its own
    block), then ONE final skyline over the coalesced candidates.  The
    candidate set is frontier-sized, not corpus-sized; a loud
    ``max_front`` guard refuses degenerate diagonal inputs instead of
    silently funnelling the corpus through one task."""

    def local(batch: pa.Table) -> pa.Table:
        for c in (x_col, y_col):
            if batch.column(c).null_count:
                raise ValueError(
                    f"pareto_front: {c} contains nulls — dominance is "
                    "undefined; filter or fill first"
                )
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_skyline_mask(x, y)))

    cand = ds.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n = cand.count()
    if n == 0:
        return cand
    if n > max_front:
        raise ValueError(
            f"pareto_front: {n} local-frontier candidates exceed max_front "
            f"{max_front} — near-diagonal metrics; bucket one axis first"
        )
    return cand.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )


def group_regression(
    ds,
    group_col: str,
    x_col: str,
    y_col: str,
    max_groups: int = 100_000,
):
    """Per-group ordinary-least-squares fit y = slope·x + intercept with
    EXACT normal equations — the scaling-law / feature-drift fit (does
    token count still grow linearly with byte length in every source?):
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) where numerator and
    denominator are exact Python bigints from `group_moments`' lane-safe
    sums, so the only floats are ONE correctly-rounded int→double cast
    per operand and a fixed expression tree — any engine evaluating the
    same tree lands on the same bits.  Degenerate groups (constant x,
    denominator 0) report slope 0.0 and intercept = mean y.

    Output rows: (group, n, slope float64, intercept float64).

    Scale shape: inherits `group_moments`' (one per-batch hash
    aggregation, hi/lo-lane coalesce-tree, bounded-group guard); the fit
    itself runs once over the ≤max_groups final table."""
    moments = group_moments(
        ds, group_col, x_col, y_col, max_groups=max_groups
    )  # a bounded pa.Table (≤ max_groups rows)

    def fit(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "slope": pa.array([], pa.float64()),
                    "intercept": pa.array([], pa.float64()),
                }
            )
        n = batch.column("n").to_pylist()
        sx = batch.column("sum_x").to_pylist()
        sy = batch.column("sum_y").to_pylist()
        sxx = batch.column("sum_xx").to_pylist()
        sxy = batch.column("sum_xy").to_pylist()
        slopes, intercepts = [], []
        for ni, sxi, syi, sxxi, sxyi in zip(n, sx, sy, sxx, sxy):
            num = ni * sxyi - sxi * syi      # exact bigints
            den = ni * sxxi - sxi * sxi
            if den == 0:
                sl = 0.0
                ic = float(syi) / float(ni)
            else:
                sl = float(num) / float(den)
                ic = (float(syi) - sl * float(sxi)) / float(ni)
            slopes.append(sl)
            intercepts.append(ic)
        return pa.table(
            {
                group_col: batch.column(group_col),
                "n": batch.column("n"),
                "slope": pa.array(slopes, pa.float64()),
                "intercept": pa.array(intercepts, pa.float64()),
            }
        )

    return fit(moments)


def ks_distance(
    ds,
    side_col: str,
    value_col: str,
    max_values: int = 1 << 22,
):
    """EXACT two-sample Kolmogorov-Smirnov distance between the value
    distributions of side 0 and side 1 — the nonparametric "did the
    distribution move?" test (no bins to choose, unlike a histogram
    drift): D = max_v |F_a(v) − F_b(v)| computed as the INTEGER
    ``d_num = max_v |c_a(v)·n_b − c_b(v)·n_a|`` over cumulative counts,
    so D = d_num / (n_a·n_b) exactly and the argmax value ``at_cents``
    (smallest value attaining it) is deterministic.  Values are exact
    integer cents via the shared `_cents` map.

    Output: one row (n_a, n_b, d_num, at_cents, emd_num) — the first
    four int64, plus the exact 1-D earth-mover (Wasserstein-1) distance
    as ``emd_num = Σ_k gap(v_k)·(v_{k+1} − v_k)`` so EMD = emd_num /
    (n_a·n_b) cents: the mass-transport complement of the sup-norm D
    (a small level shift everywhere moves EMD but barely moves D).
    ``emd_num`` is computed in Python bigints and emitted as the
    correctly-rounded float64 of that integer — both engines round the
    SAME integer, so it still hashes bit-exactly.  Either side empty →
    d_num = −1 sentinel (distances undefined), n counts still reported.

    Scale shape: per-batch (cents, side) count partials tree-combine over
    the bounded distinct-value domain (loud ``max_values`` guard — the
    `group_value_rank` contract); the final kernel is one sort + two
    cumsums over distinct values.  The corpus never shuffles."""
    import ray
    import ray.data as rd

    from .aggregates import _cents, tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(side_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if s.null_count or batch.column(value_col).null_count:
            raise ValueError(
                f"ks_distance: {side_col}/{value_col} must be null-free"
            )
        side = s.to_numpy(zero_copy_only=False).astype(np.int64)
        if ((side != 0) & (side != 1)).any():
            raise ValueError("ks_distance: side_col must be 0/1")
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        out = []
        for sv in (0, 1):
            vals = c[side == sv]
            if len(vals) == 0:
                continue
            u, n = np.unique(vals, return_counts=True)
            out.append(
                pa.table(
                    {
                        "v": pa.array(u, pa.int64()),
                        "n_a": pa.array(
                            n if sv == 0 else np.zeros(len(u), np.int64),
                            pa.int64(),
                        ),
                        "n_b": pa.array(
                            n if sv == 1 else np.zeros(len(u), np.int64),
                            pa.int64(),
                        ),
                    }
                )
            )
        if not out:
            return pa.table(
                {
                    "v": pa.array([], pa.int64()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["v"],
                [("n_a", "sum"), ("n_b", "sum")],
                max_groups=max_values,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    # the final kernel needs EVERY distinct value in one cumsum — the
    # value table is bounded by max_values, so one driver-side concat
    combined = (
        pa.concat_tables(tabs)
        if tabs
        else pa.table(
            {
                "v": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
            }
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "n_a": pa.array([0], pa.int64()),
                    "n_b": pa.array([0], pa.int64()),
                    "d_num": pa.array([-1], pa.int64()),
                    "at_cents": pa.array([0], pa.int64()),
                    "emd_num": pa.array([-1.0], pa.float64()),
                }
            )
        v = batch.column("v").to_numpy(zero_copy_only=False)
        ca = batch.column("n_a").to_numpy(zero_copy_only=False)
        cb = batch.column("n_b").to_numpy(zero_copy_only=False)
        o = np.argsort(v, kind="stable")
        v, ca, cb = v[o], ca[o], cb[o]
        na, nb = int(ca.sum()), int(cb.sum())
        if na == 0 or nb == 0:
            return pa.table(
                {
                    "n_a": pa.array([na], pa.int64()),
                    "n_b": pa.array([nb], pa.int64()),
                    "d_num": pa.array([-1], pa.int64()),
                    "at_cents": pa.array([0], pa.int64()),
                    "emd_num": pa.array([-1.0], pa.float64()),
                }
            )
        # |cum_a·n_b − cum_b·n_a| stays under n·max(n) — guard the int64
        # product domain loudly
        if max(na, nb) > (1 << 31):
            raise ValueError(
                "ks_distance: side sizes overflow the int64 cross-multiply "
                "— widen to bigint lanes"
            )
        gap = np.abs(np.cumsum(ca) * nb - np.cumsum(cb) * na)
        d = int(gap.max())
        at = int(v[int(np.argmax(gap))])  # argmax = first/smallest value
        # exact Wasserstein-1 numerator in Python bigints (gap·Δv terms
        # can pass 2^63), emitted as the rounded double of ONE integer
        emd = float(
            sum(
                int(g) * int(dv)
                for g, dv in zip(gap[:-1].tolist(), np.diff(v).tolist())
            )
        )
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "d_num": pa.array([d], pa.int64()),
                "at_cents": pa.array([at], pa.int64()),
                "emd_num": pa.array([emd], pa.float64()),
            }
        )

    return rd.from_arrow(finish(combined))


def weighted_median(
    ds,
    value_col: str,
    weight_col: str,
    max_values: int = 1 << 22,
):
    """EXACT lower weighted median — the smallest value v with
    ``2·cumweight(v) ≥ W`` (pure integers, so the boundary can never
    drift): the token-weighted corpus statistic ("the median TOKEN sits
    in a doc of what length?") that an unweighted median badly misstates
    under length skew.  Output: one row (``median_value``,
    ``total_weight`` int64); zero total weight → sentinel (−1, 0).

    Scale shape: per-batch (value, Σweight) histogram partials
    tree-combine over the bounded distinct-value domain (loud
    ``max_values``), one sort + cumsum finishes on the driver-side
    bounded table — the corpus never shuffles."""
    import ray
    import ray.data as rd

    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        for c in (value_col, weight_col):
            if batch.column(c).null_count:
                raise ValueError(f"weighted_median: {c} contains nulls")
        v = pc.cast(batch.column(value_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        w = pc.cast(batch.column(weight_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if (w < 0).any():
            raise ValueError("weighted_median: negative weights")
        u, inv = np.unique(v, return_inverse=True)
        ws = np.zeros(len(u), np.int64)
        np.add.at(ws, inv, w)
        return pa.table(
            {"v": pa.array(u, pa.int64()), "w": pa.array(ws, pa.int64())}
        )

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["v"],
                [("w", "sum")],
                max_groups=max_values,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        return rd.from_arrow(
            pa.table(
                {
                    "median_value": pa.array([-1], pa.int64()),
                    "total_weight": pa.array([0], pa.int64()),
                }
            )
        )
    big = pa.concat_tables(tabs)
    v = big.column("v").to_numpy(zero_copy_only=False)
    w = big.column("w").to_numpy(zero_copy_only=False)
    o = np.argsort(v, kind="stable")
    v, w = v[o], w[o]
    W = int(w.sum())
    if W == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "median_value": pa.array([-1], pa.int64()),
                    "total_weight": pa.array([0], pa.int64()),
                }
            )
        )
    cum = np.cumsum(w)
    idx = int(np.searchsorted(2 * cum, W, side="left"))
    return rd.from_arrow(
        pa.table(
            {
                "median_value": pa.array([int(v[idx])], pa.int64()),
                "total_weight": pa.array([W], pa.int64()),
            }
        )
    )


def gini_concentration(
    ds,
    group_col: str = "source",
    max_groups: int = 1_000_000,
):
    """EXACT Gini coefficient of the row-count distribution over
    ``group_col`` — the corpus-concentration audit (is the crawl 90%
    one domain?).  With per-group counts c_1 ≤ … ≤ c_n,

        G = Σ_i (2i − n − 1)·c_i  /  (n · Σ_i c_i)  =  gini_num / gini_den

    both emitted as exact integers (G = 0 all-equal, → 1−1/n fully
    concentrated); equal counts make the numerator contribution
    order-invariant, so ties cost nothing.  Output: ONE row
    (n_groups, total, gini_num, gini_den), all int64.

    Scale shape: per-batch per-group count partials through the
    bounded-key `tree_groupby` (loud ``max_groups`` guard); the closing
    kernel is one sort over ≤ max_groups count rows.  int64 overflow is
    checked in Python bigints before the cast."""
    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select([group_col]), [group_col]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns([group_col, "c"])

    counts = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
        [("c", "sum")],
        max_groups=max_groups,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "n_groups": pa.array([], pa.int64()),
                    "total": pa.array([], pa.int64()),
                    "gini_num": pa.array([], pa.int64()),
                    "gini_den": pa.array([], pa.int64()),
                }
            )
        c = np.sort(batch.column("c").to_numpy(zero_copy_only=False))
        n = len(c)
        i = np.arange(1, n + 1, dtype=object)  # bigint lane: no silent wrap
        num = int(np.sum((2 * i - n - 1) * c.astype(object)))
        den = int(n) * int(c.sum())
        if not (-(1 << 63) <= num < (1 << 63)) or den >= (1 << 63):
            raise ValueError(
                "gini_concentration: moments exceed int64 — reduce "
                "max_groups or pre-scale counts"
            )
        return pa.table(
            {
                "n_groups": pa.array([n], pa.int64()),
                "total": pa.array([int(c.sum())], pa.int64()),
                "gini_num": pa.array([num], pa.int64()),
                "gini_den": pa.array([den], pa.int64()),
            }
        )

    return counts.map_batches(finish, batch_format="pyarrow", batch_size=None)


def quantile_match(
    ds,
    group_col: str,
    value_col: str,
    id_col: str,
    broadcast_cap: int = 64 << 20,
):
    """Quantile normalization (distribution matching): each row's value is
    replaced by the GLOBAL distribution's value at the row's within-group
    quantile position — the cross-source feature-alignment transform
    (microarray quantile normalization / domain-shift correction): after
    it, every group has (up to tie granularity) the same marginal
    distribution.  Integer-exact construction:

        rank = competition RANK of v within its group (ties share)
        target_pos = ((rank − 1) · N) // n_g + 1        (1-based, ≤ N)
        norm = the target_pos-th smallest value GLOBALLY

    Output rows: (id_col, group_col, value_cents, norm_cents), value as
    exact integer cents via the shared `_cents` map.

    Scale shape: `group_value_rank`'s budget — ONE skinny (group, cents)
    histogram tree-combine (loud ``broadcast_cap``), broadcast once; the
    global CDF is the group-sum of the same histogram; every batch then
    annotates itself with two vectorized searchsorted probes and streams
    out.  The corpus never shuffles."""
    import ray

    from .aggregates import _cents

    cents_name = "__qm_cents"

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                cents_name: _cents(batch.column(value_col)),
            }
        )

    cds = ds.map_batches(to_cents, batch_format="pyarrow", zero_copy_batch=True)
    hist_ds = _group_value_hist(
        cds, group_col, cents_name, "quantile_match",
        partial_cap=broadcast_cap * 16,
    ).materialize()
    if (hist_ds.size_bytes() or 0) > broadcast_cap:
        raise ValueError(
            "quantile_match: (group, value) histogram exceeds the broadcast "
            f"cap ({hist_ds.size_bytes()} > {broadcast_cap} bytes) — bucket "
            "the values first"
        )
    tabs = [
        t for t in ray.get(hist_ds.to_arrow_refs()) if t.num_rows and t.num_columns
    ]
    if not tabs:
        raise ValueError("quantile_match: empty input")
    hist = pa.concat_tables(tabs)
    groups = np.asarray(hist.column(group_col).to_pylist(), dtype=object)
    vals = hist.column(cents_name).to_numpy(zero_copy_only=False)
    cnts = hist.column("n").to_numpy(zero_copy_only=False)
    # global CDF over sorted distinct values
    gv_order = np.argsort(vals, kind="mergesort")
    gvs = vals[gv_order]
    gu, gstarts = np.unique(gvs, return_index=True)
    gcnt = np.add.reduceat(cnts[gv_order], gstarts)
    gcum = np.cumsum(gcnt)
    N = int(gcum[-1])
    # per-group sorted values + rank starts (competition rank)
    per_group: dict = {}
    for g in np.unique(groups.astype(str)):
        m = groups.astype(str) == g
        v, c = vals[m], cnts[m]
        o = np.argsort(v, kind="mergesort")
        v, c = v[o], c[o]
        starts = np.concatenate(([np.int64(1)], 1 + np.cumsum(c)[:-1]))
        per_group[g] = (v, starts, int(c.sum()))
    bcast = ray.put((per_group, gu, gcum, N))

    def annotate(batch: pa.Table) -> pa.Table:
        pg, g_vals, g_cum, n_total = ray.get(bcast)
        gcol = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        c = batch.column(cents_name).to_numpy(zero_copy_only=False)
        rank = np.empty(len(c), dtype=np.int64)
        ng = np.empty(len(c), dtype=np.int64)
        for g in np.unique(gcol.astype(str)):
            m = gcol.astype(str) == g
            v, starts, tot = pg[g]
            rank[m] = starts[np.searchsorted(v, c[m])]
            ng[m] = tot
        tp = (rank - 1) * np.int64(n_total) // ng + np.int64(1)
        norm = g_vals[np.searchsorted(g_cum, tp, side="left")]
        return pa.table(
            {
                id_col: batch.column(id_col),
                group_col: batch.column(group_col),
                "value_cents": pa.array(c, pa.int64()),
                "norm_cents": pa.array(norm, pa.int64()),
            }
        )

    return cds.map_batches(annotate, batch_format="pyarrow", zero_copy_batch=True)


def top_share(
    ds,
    value_col: str,
    top_ppm: int = 10_000,
    max_distinct: int = 1 << 22,
):
    """Lorenz concentration point: what share of the total value mass do
    the top ``top_ppm`` parts-per-million of rows hold (top 1% =
    10_000 ppm)?  The "does 1% of the crawl carry half the tokens?"
    audit — the pointwise complement of `gini_concentration` (that
    integrates inequality over bounded groups; this reads one point of
    the Lorenz curve over UNBOUNDED row counts).  n_top rounds up:
    ``n_top = (N·ppm + 999_999) // 1_000_000`` — at least one row
    whenever N > 0.  The boundary tie block contributes pro-rata by
    count, which is value-exact because tied rows hold equal values.

    Output: ONE row (n_rows, n_top, top_mass, total_mass), all int64,
    values as exact integer cents via the shared `_cents` map.

    Scale shape: per-batch (cents → count) histogram partials
    tree-combine over the bounded distinct-value domain (loud
    ``max_distinct``); the closing kernel is one sort + cumsum over
    distinct values.  The corpus never shuffles."""
    from .aggregates import _cents, tree_groupby

    if not (0 < top_ppm <= 1_000_000):
        raise ValueError(
            f"top_share: top_ppm must be in (0, 1e6], got {top_ppm}"
        )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.column(value_col).null_count:
            raise ValueError(f"top_share: {value_col} contains nulls")
        c = _cents(batch.column(value_col))
        t = pa.table({"c": c})
        g = pa.TableGroupBy(t, ["c"]).aggregate([([], "count_all")])
        return g.rename_columns(["c", "n"])

    hist = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["c"],
        [("n", "sum")],
        max_groups=max_distinct,
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "n_rows": pa.array([], pa.int64()),
                    "n_top": pa.array([], pa.int64()),
                    "top_mass": pa.array([], pa.int64()),
                    "total_mass": pa.array([], pa.int64()),
                }
            )
        c = batch.column("c").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        o = np.argsort(-c, kind="stable")
        cs, ns = c[o].astype(object), n[o].astype(object)
        N = int(n.sum())
        n_top = (N * top_ppm + 999_999) // 1_000_000
        cum = np.cumsum(ns)
        k = int(np.searchsorted(cum, n_top, side="left"))
        full_mass = int(np.sum(cs[:k] * ns[:k]))
        before = int(cum[k - 1]) if k else 0
        partial_mass = (n_top - before) * int(cs[k]) if n_top > before else 0
        top_mass = full_mass + partial_mass
        total = int(np.sum(cs * ns))
        for v, name in ((top_mass, "top_mass"), (total, "total_mass")):
            if not (-(1 << 63) <= v < (1 << 63)):
                raise ValueError(f"top_share: {name} exceeds int64")
        return pa.table(
            {
                "n_rows": pa.array([N], pa.int64()),
                "n_top": pa.array([int(n_top)], pa.int64()),
                "top_mass": pa.array([top_mass], pa.int64()),
                "total_mass": pa.array([total], pa.int64()),
            }
        )

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


def mann_whitney(
    ds,
    side_col: str,
    value_col: str,
    max_values: int = 1 << 22,
):
    """EXACT two-sample Mann-Whitney U — the nonparametric "is one group's
    distribution shifted?" location test (the rank companion of
    `ks_distance`'s shape test): with sides A = 0 and B = 1,

        u2_a = 2·#{(a, b): a > b} + #{(a, b): a = b}   (doubled U_A)

    so U_A = u2_a / 2 exactly and the rank-biserial effect size is
    r = u2_a / (n_a·n_b) − 1.  All outputs integer: (n_a, n_b, u2_a);
    u2_b falls out as 2·n_a·n_b − u2_a.  Values are exact integer cents
    via the shared `_cents` map; either side empty → u2_a = −1 sentinel.

    Scale shape: identical to `ks_distance` — per-batch (cents, side)
    count partials tree-combine over the bounded distinct-value domain
    (loud ``max_values``); the closing kernel is one sort + a cumulative
    count per side over distinct values.  The corpus never shuffles."""
    from .aggregates import _cents, tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column(side_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if s.null_count or batch.column(value_col).null_count:
            raise ValueError(
                f"mann_whitney: {side_col}/{value_col} must be null-free"
            )
        side = s.to_numpy(zero_copy_only=False).astype(np.int64)
        if ((side != 0) & (side != 1)).any():
            raise ValueError("mann_whitney: side_col must be 0/1")
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "c": pa.array(c, pa.int64()),
                "side": pa.array(side, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["c", "side"]).aggregate([([], "count_all")])
        return g.rename_columns(["c", "side", "n"])

    hist = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["c", "side"],
        [("n", "sum")],
        max_groups=max_values,
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = ("n_a", "n_b", "u2_a")
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in cols})
        c = batch.column("c").to_numpy(zero_copy_only=False)
        side = batch.column("side").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        vals = np.unique(c)
        ca = np.zeros(len(vals), dtype=np.int64)
        cb = np.zeros(len(vals), dtype=np.int64)
        pos = np.searchsorted(vals, c)
        np.add.at(ca, pos[side == 0], n[side == 0])
        np.add.at(cb, pos[side == 1], n[side == 1])
        n_a, n_b = int(ca.sum()), int(cb.sum())
        if n_a == 0 or n_b == 0:
            u2 = -1
        else:
            cum_b_less = np.concatenate(([0], np.cumsum(cb)[:-1]))
            gt = int(np.sum(ca.astype(object) * cum_b_less.astype(object)))
            eq = int(np.sum(ca.astype(object) * cb.astype(object)))
            u2 = 2 * gt + eq
            if u2 >= (1 << 63):
                raise ValueError("mann_whitney: u2_a exceeds int64")
        return pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "u2_a": pa.array([u2], pa.int64()),
            }
        )

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


def group_ks_drift(
    ds,
    group_col: str,
    value_col: str,
    broadcast_cap: int = 64 << 20,
):
    """Per-group drift leaderboard: for EVERY group, the exact two-sample
    Kolmogorov-Smirnov distance between the group's value distribution
    and the REST of the corpus — "which source drifted?" asked once per
    source instead of once per hand-picked pair (`ks_distance` is the
    two-sided primitive; this sweeps it across a bounded group domain).
    Integer form per group g with n_g rows, complement size m = N − n_g:

        d_num(g) = max_v |c_g(v)·m − (C(v) − c_g(v))·n_g|

    so D_g = d_num / (n_g·m) exactly; ``at_value`` is the smallest value
    attaining the max (deterministic).  Groups equal to the whole corpus
    (m = 0) report d_num = −1 sentinel.  Output rows:
    (group, n_g, d_num, at_value), int64.

    Scale shape: ONE bounded (group, value) histogram tree-combine (the
    `_group_value_hist` contract, loud ``broadcast_cap``); the closing
    kernel is a per-group scatter + two cumsums over the distinct-value
    union — Python-bigint lanes, int64-checked on emit.  The corpus
    never shuffles."""
    hist_ds = _group_value_hist(
        ds, group_col, value_col, "group_ks_drift",
        partial_cap=broadcast_cap * 16,
    ).materialize()
    if (hist_ds.size_bytes() or 0) > broadcast_cap:
        raise ValueError(
            "group_ks_drift: (group, value) histogram exceeds the cap "
            f"({hist_ds.size_bytes()} > {broadcast_cap} bytes) — bucket first"
        )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {
            group_col: pa.string(), "n_g": pa.int64(),
            "d_num": pa.int64(), "at_value": pa.int64(),
        }
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({k: pa.array([], t) for k, t in cols.items()})
        groups = np.asarray(batch.column(group_col).to_pylist(), dtype=object)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cnts = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.unique(vals)
        pos = np.searchsorted(V, vals)
        total = np.zeros(len(V), dtype=object)
        gnames = np.unique(groups.astype(str))
        gvecs = {}
        for g in gnames:
            m = groups.astype(str) == g
            vec = np.zeros(len(V), dtype=object)
            np.add.at(vec, pos[m], cnts[m])
            gvecs[g] = np.cumsum(vec)
            total += vec
        C = np.cumsum(total)
        N = int(C[-1])
        out_g, out_n, out_d, out_at = [], [], [], []
        for g in gnames:
            cg = gvecs[g]
            n_g = int(cg[-1])
            mrest = N - n_g
            if mrest == 0 or n_g == 0:
                out_g.append(g); out_n.append(n_g)
                out_d.append(-1); out_at.append(int(V[0]))
                continue
            d_vec = np.abs(cg * mrest - (C - cg) * n_g)
            k = int(np.argmax(d_vec))  # first max = smallest value
            d = int(d_vec[k])
            if d >= (1 << 63):
                raise ValueError("group_ks_drift: d_num exceeds int64")
            out_g.append(g); out_n.append(n_g)
            out_d.append(d); out_at.append(int(V[k]))
        return pa.table(
            {
                group_col: pa.array(out_g, pa.string()),
                "n_g": pa.array(out_n, pa.int64()),
                "d_num": pa.array(out_d, pa.int64()),
                "at_value": pa.array(out_at, pa.int64()),
            }
        )

    return hist_ds.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def table_profile(ds, columns: list, distinct_cap: int = 1 << 20):
    """DESCRIBE card: one row per column — ``(column, n_rows, n_null,
    n_distinct, min_v, max_v)`` with min/max rendered as strings (the
    native-type extremum stringified, matching SQL ``CAST(MIN(c) AS
    VARCHAR)``).  The first profiling query every new table gets.

    EXACT distinct per column, valid while each column's distinct count
    fits one combine task (``distinct_cap`` raises loudly past it) — the
    gate/profile regime.  At 10^12 rows with unbounded columns, the HLL
    card (`sketch_suite`) is the scale path; this operator is its exact
    counterpart for bounded domains.

    Shape: one streaming pass PER COLUMN over only that column's batches
    (callers pass a pruned dataset): per-batch partials carry each batch's
    distinct values once with (count, nullcount, marker) — the
    `corpus_report` bounded-marker posture — then one bounded coalesce
    tree finishes distincts, nulls and native min/max together.  Nothing
    row-shaped shuffles."""
    from .aggregates import tree_groupby

    if not columns:
        raise ValueError("table_profile: need at least one column")

    rows = []
    for col in columns:

        def partial(batch: pa.Table, _c=col) -> pa.Table:
            arr = batch.column(_c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            nn = arr.null_count
            vals = arr.drop_null()
            # distinct markers: each batch contributes its unique values
            uniq = pc.unique(vals)
            k = len(uniq)
            if k:
                return pa.table(
                    {
                        "v": uniq,
                        "rows_": pa.array([n] + [0] * (k - 1), pa.int64()),
                        "nulls_": pa.array([nn] + [0] * (k - 1), pa.int64()),
                    }
                )
            return pa.table(
                {
                    "v": pa.array([None], arr.type),
                    "rows_": pa.array([n], pa.int64()),
                    "nulls_": pa.array([nn], pa.int64()),
                }
            )

        parts = tree_groupby(
            ds.select_columns([col]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["v"],
            [("rows_", "sum"), ("nulls_", "sum")],
            max_groups=distinct_cap,
        ).take_all()
        vs = [r["v"] for r in parts if r["v"] is not None]
        n_rows = sum(r["rows_"] for r in parts)
        n_null = sum(r["nulls_"] for r in parts)
        # native-type extrema, stringified last — matches SQL
        # CAST(MIN(c) AS VARCHAR) for the int/string columns this targets
        rows.append(
            {
                "column": col,
                "n_rows": n_rows,
                "n_null": n_null,
                "n_distinct": len(vs),
                "min_v": str(min(vs)) if vs else None,
                "max_v": str(max(vs)) if vs else None,
            }
        )
    return pa.table(
        {
            "column": pa.array([r["column"] for r in rows], pa.string()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
            "n_null": pa.array([r["n_null"] for r in rows], pa.int64()),
            "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
            "min_v": pa.array([r["min_v"] for r in rows], pa.string()),
            "max_v": pa.array([r["max_v"] for r in rows], pa.string()),
        }
    )


def change_point(
    ds,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_us: int = 3_600_000_000,
    max_groups: int = 1 << 22,
):
    """Exact single change-point per key over a bucketed event-count
    series — the drift/breakpoint audit (CUSUM's offline analogue; Page
    1954, Pettitt 1979's count form): for each key, bucket its events into
    ``bucket_us`` bins, and over the ORDERED observed buckets b_1..b_m with
    counts c_i, prefix sums P_i and total T, report the bucket maximizing
    the exact integer deviation

        D_i = |m·P_i − i·T|

    (the cumulative count's largest departure from the uniform-rate line —
    fractions cleared by scaling with m·T, so the comparison is pure
    int64).  Ties break to the SMALLEST bucket.  Output rows: (key,
    cp_bucket int64, dev int64) — cp_bucket is the bin index (epoch
    microseconds // bucket_us).

    Null keys/timestamps are excluded (a null contributes to no series).

    Scale shape: per-batch (key, bucket) partial counts bound the exchange
    by distinct pairs per batch; the tree-summed table is bounded by
    #keys × #buckets (time-span-bounded, NOT corpus-bounded — guarded via
    ``max_groups``), so the final lexsort + segmented prefix-scan kernel
    runs on a small table.  The int64 products m·P and i·T are guarded
    loudly (they wrap only past ~2^62 row-buckets)."""
    from .aggregates import tree_groupby

    if bucket_us <= 0:
        raise ValueError(f"change_point: bucket_us must be positive, got {bucket_us}")
    B = np.int64(bucket_us)

    def partial(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key_col, ts_col]).drop_null()
        ts = pc.cast(narrow.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = pa.table(
            {
                key_col: narrow.column(key_col),
                "b": pa.array(ts // B, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, [key_col, "b"]).aggregate([([], "count_all")])
        return g.select([key_col, "b", "count_all"]).rename_columns(
            [key_col, "b", "cnt"]
        )

    summed = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, "b"],
        [("cnt", "sum")],
        max_groups=max_groups,
    )

    key_type = ds.schema().base_schema.field(key_col).type

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], key_type),
                "cp_bucket": pa.array([], pa.int64()),
                "dev": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0 or batch.num_columns == 0:
            return empty
        kc = batch.column(key_col)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        dic = kc.dictionary_encode()
        kcodes = dic.indices.to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((b, kcodes))
        kO, bO, cO = kcodes[order], b[order], cnt[order]
        n = len(kO)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.not_equal(kO[1:], kO[:-1], out=new_run[1:])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        # per-run prefix sums: global cumsum minus the run's base
        csum = np.cumsum(cO)
        base = np.concatenate(([0], csum[starts[1:] - 1]))
        pfx = csum - base[run_id]
        tot = np.add.reduceat(cO, starts)
        ends = np.concatenate((starts[1:], [n]))
        m = (ends - starts).astype(np.int64)
        i = np.arange(n, dtype=np.int64) - starts[run_id] + 1
        if len(m) and float(m.max()) * float(tot.max()) >= 2.0**62:
            raise ValueError(
                "change_point: m*T exceeds the exact int64 domain — "
                "coarsen bucket_us or shard by key range"
            )
        dev = np.abs(m[run_id] * pfx - i * tot[run_id])
        segmax = np.maximum.reduceat(dev, starts)
        is_max = dev == segmax[run_id]
        # first max per run = smallest bucket (rows are bucket-ascending)
        _, first = np.unique(run_id[is_max], return_index=True)
        pick = np.flatnonzero(is_max)[first]
        keys_out = pc.take(dic.dictionary, pa.array(kO[pick], pa.int32()))
        return pa.table(
            {
                key_col: pc.cast(keys_out, key_type),
                "cp_bucket": pa.array(bO[pick], pa.int64()),
                "dev": pa.array(dev[pick], pa.int64()),
            }
        )

    return summed.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
