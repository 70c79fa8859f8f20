"""General relational operators over the TPC-H-ish tables — proof that the
engine covers the generic query shapes (scan/filter/project/aggregate/join/
sort/limit) a reference user needs, each in its scale-correct Ray Data form:

* filters/projections pushed into the read or vectorized map_batches
* aggregations pre-combined per batch before the shuffle
* small-side joins broadcast via ray.put (no shuffle of the big side)
* top-k via sort+limit on a pre-reduced candidate set
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Exact integer cents from a 2-dp decimal stored as float64.  x*100 is
    within an ulp of an integer for 2-dp money values, so the rounding mode
    can never flip a .5 — both engines land on the same integer."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


def pricing_summary(lineitem_ds, cutoff: str = "1998-09-01"):
    """TPC-H Q1 shape: filter by ship date, grouped sums/counts/means.

    Money sums run in integer cents (disc_price in 10^-4 units: cents ×
    integer discount percent) so partial-sum order is irrelevant — float
    accumulation order differs across engines/partitionings and moves the
    last ulp, which a value-hash gate catches.  One final division by a
    power of ten converts back to float64 bit-deterministically.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), pa.scalar(cutoff).cast(pa.timestamp("us")))
        )
        qty_c = _cents(batch.column("l_quantity"))
        price_c = _cents(batch.column("l_extendedprice"))
        disc_pct = _cents(batch.column("l_discount"))  # 0..100 integer percent
        disc_price_4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        t = pa.TableGroupBy(
            pa.table(
                {
                    "l_returnflag": batch.column("l_returnflag"),
                    "l_linestatus": batch.column("l_linestatus"),
                    "qty_c": qty_c,
                    "price_c": price_c,
                    "disc4": disc_price_4,
                }
            ),
            ["l_returnflag", "l_linestatus"],
        ).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc4", "sum"), ("qty_c", "count")]
        )
        return t.rename_columns(
            ["l_returnflag", "l_linestatus", "qty_c", "price_c", "disc4", "n"]
        )

    from ray.data.aggregate import Sum

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty_c", alias_name="qty_c"),
        Sum("price_c", alias_name="price_c"),
        Sum("disc4", alias_name="disc4"),
        Sum("n", alias_name="count_order"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "sum_qty": pc.divide(pc.cast(batch.column("qty_c"), pa.float64()), 100.0),
                "sum_base_price": pc.divide(
                    pc.cast(batch.column("price_c"), pa.float64()), 100.0
                ),
                "sum_disc_price": pc.divide(
                    pc.cast(batch.column("disc4"), pa.float64()), 10000.0
                ),
                "count_order": batch.column("count_order"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def segment_revenue(orders_ds, customer_table: pa.Table):
    """Broadcast hash join: orders ⋈ customer (small side) → revenue per
    market segment.  The customer table rides the object store once via
    ray.put; each batch does a vectorized dictionary lookup — the broadcast
    semi-join pattern fever uses for its bloom/trie lookups (SURVEY §2.7),
    generalized to carry payload columns."""
    import ray

    cust_ref = ray.put(
        customer_table.select(["c_custkey", "c_mktsegment"]).combine_chunks()
    )

    def join(batch: pa.Table) -> pa.Table:
        lookup = ray.get(cust_ref)
        # vectorized C++ hash join against the broadcast small side (inner:
        # orders without a customer drop out, matching the SQL inner join)
        joined = batch.select(["o_custkey", "o_totalprice"]).join(
            lookup, keys="o_custkey", right_keys="c_custkey", join_type="inner"
        )
        joined = joined.append_column("rev_c", _cents(joined.column("o_totalprice")))
        t = pa.TableGroupBy(
            joined.select(["c_mktsegment", "rev_c"]), ["c_mktsegment"]
        ).aggregate([("rev_c", "sum"), ("rev_c", "count")])
        return t.rename_columns(["c_mktsegment", "rev_c", "n_orders"])

    from ray.data.aggregate import Sum

    partials = orders_ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("c_mktsegment").aggregate(
        Sum("rev_c", alias_name="rev_c"), Sum("n_orders", alias_name="n_orders")
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch.column("c_mktsegment"),
                "revenue": pc.divide(pc.cast(batch.column("rev_c"), pa.float64()), 100.0),
                "n_orders": batch.column("n_orders"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("c_mktsegment")


def top_k_orders(orders_ds, k: int = 10):
    """Global top-k by price: per-batch top-k candidates (vectorized
    partial-sort) → tiny global sort+limit.  Never full-sorts the input."""

    def batch_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        )
        return batch.take(idx).select(["o_orderkey", "o_custkey", "o_totalprice"])

    candidates = orders_ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True)
    return candidates.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(k)


def filter_project(lineitem_ds, min_qty: float = 45.0):
    """Predicate + projection pushdown shape: the read is pruned to the
    needed columns by the caller; the filter is a vectorized kernel."""

    def fil(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("l_quantity"), min_qty)
        out = batch.filter(m)
        return out.append_column(
            "revenue",
            pc.multiply(out.column("l_extendedprice"), pc.subtract(1.0, out.column("l_discount"))),
        )

    return lineitem_ds.map_batches(fil, batch_format="pyarrow", zero_copy_batch=True)


def partitioned_hash_join(left_ds, right_ds, left_key: str, right_key: str,
                          n_buckets: int = 16, join_type: str = "inner"):
    """Both-sides-large join: explicit bucketed hash join — add
    bucket=hash(key)%B to both sides, co-group per bucket, join inside
    map_groups.  Documented partitioning assumption: bucket count B chosen so
    one bucket of the smaller side fits a worker's heap; hot keys can be
    salted into sub-buckets (not needed for these fixtures).

    ``join_type`` passes through to the per-bucket Arrow join ("inner",
    "left outer", ...): co-partitioning by key hash keeps every outer-join
    variant correct — an unmatched left row's bucket provably holds no
    match anywhere, so null-padding locally equals the global result."""
    import numpy as np

    from ..sketches.hashing import hash64_ints

    def add_bucket(key):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            b = (hash64_ints(k) % np.uint64(n_buckets)).astype(np.int32)
            return batch.append_column("__bucket", pa.array(b, type=pa.int32()))

        return fn

    left_b = left_ds.map_batches(add_bucket(left_key), batch_format="pyarrow", zero_copy_batch=True)
    right_b = right_ds.map_batches(add_bucket(right_key), batch_format="pyarrow", zero_copy_batch=True)

    # union needs one schema: pad each side with the other's columns (nulls),
    # tagged with provenance, then co-group by bucket and join per group
    lschema = left_b.schema().base_schema
    rschema = right_b.schema().base_schema
    l_names = [n for n in lschema.names if n != "__bucket"]
    r_names = [n for n in rschema.names if n != "__bucket"]

    def pad(other_schema, side):
        def fn(batch: pa.Table) -> pa.Table:
            for f in other_schema:
                if f.name not in batch.column_names:
                    batch = batch.append_column(f.name, pa.nulls(batch.num_rows, f.type))
            batch = batch.append_column("__side", pa.array([side] * batch.num_rows))
            return batch.select(sorted(batch.column_names))

        return fn

    left_tag = left_b.map_batches(pad(rschema, "l"), batch_format="pyarrow")
    right_tag = right_b.map_batches(pad(lschema, "r"), batch_format="pyarrow")

    def join_group(group: pa.Table) -> pa.Table:
        lt = group.filter(pc.equal(group.column("__side"), "l")).select(l_names)
        rt = group.filter(pc.equal(group.column("__side"), "r")).select(r_names)
        return lt.join(rt, keys=left_key, right_keys=right_key, join_type=join_type)

    both = left_tag.union(right_tag)
    return both.groupby("__bucket").map_groups(join_group, batch_format="pyarrow")


def revenue_by_nation(
    lineitem_ds,
    orders_ds,
    customer_table: pa.Table,
    nation_table: pa.Table,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    broadcast_bytes: int = 256 << 20,
    num_partitions: int = 16,
):
    """TPC-H Q5-shaped multi-join: lineitem ⋈ orders ⋈ customer ⋈ nation →
    revenue per nation for orders placed in [date_lo, date_hi).

    Join plan, inner-to-outer by size:

    1. customer ⋈ nation happens on the driver (pa.Table.join) — nation is
       25 rows and customer arrives as a pre-read table; the product is a
       custkey → n_name dimension.  Precondition (documented): this
       dimension fits a worker heap.  When customer itself is corpus-scale,
       feed it through ``partitioned_hash_join`` instead.
    2. orders is date-filtered and projected INSIDE the read stage, then
       each batch hash-joins against the broadcast dimension (one ray.put,
       vectorized C++ join per batch — no shuffle of orders).
    3. lineitem ⋈ annotated-orders is the only potentially big-big join.
       Adaptive gate: if the annotated order table fits ``broadcast_bytes``
       it is broadcast as a sorted (orderkey, nation-code) pair and each
       lineitem batch does a searchsorted membership + np.add.at partial
       aggregation — zero shuffle of lineitem, partials are 25-row tables.
       Past the gate it falls back to ``Dataset.join`` (hash shuffle) with
       the same per-batch partial aggregation after the join; either way
       the final groupby moves ≤ 25 rows × #blocks.

    Revenue runs in 10^-4 units (cents × integer discount percent) so
    partial-sum order cannot move the last ulp — see ``pricing_summary``.
    """
    import numpy as np
    import ray

    names = nation_table.column("n_name").to_pylist()

    dim = (
        customer_table.select(["c_custkey", "c_nationkey"])
        .join(
            nation_table.select(["n_nationkey", "n_name"]),
            keys="c_nationkey",
            right_keys="n_nationkey",
            join_type="inner",
        )
        .select(["c_custkey", "n_name"])
        .combine_chunks()
    )
    # one-time prep on the driver: sorted custkeys + int32 nation codes, so
    # each orders batch does a searchsorted probe instead of rebuilding an
    # acero hash table over the whole dimension per batch
    ck = dim.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    dim_codes = (
        pc.index_in(dim.column("n_name"), pa.array(names, pa.string()))
        .to_numpy(zero_copy_only=False)
        .astype(np.int32)
    )
    corder = np.argsort(ck, kind="stable")
    dim_ref = ray.put((ck[corder], dim_codes[corder]))
    lo = pa.scalar(date_lo).cast(pa.timestamp("us"))
    hi = pa.scalar(date_hi).cast(pa.timestamp("us"))

    def annotate_orders(batch: pa.Table) -> pa.Table:
        keys_s, codes_s = ray.get(dim_ref)
        keep = pc.and_(
            pc.greater_equal(batch.column("o_orderdate"), lo),
            pc.less(batch.column("o_orderdate"), hi),
        )
        batch = batch.filter(keep)
        k = batch.column("o_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(keys_s, k)
        idx_c = np.minimum(idx, max(len(keys_s) - 1, 0))
        hit = (keys_s[idx_c] == k) if len(keys_s) else np.zeros(len(k), bool)
        return pa.table(
            {
                "o_orderkey": batch.column("o_orderkey").filter(pa.array(hit)),
                "n_code": pa.array(codes_s[idx_c[hit]], pa.int32()),
            }
        )

    ann = orders_ds.map_batches(
        annotate_orders, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def rev4_of(batch: pa.Table) -> np.ndarray:
        price_c = _cents(batch.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        disc_pct = _cents(batch.column("l_discount")).to_numpy(zero_copy_only=False)
        return price_c * (100 - disc_pct)

    def partial_to_table(sums: np.ndarray, counts: np.ndarray) -> pa.Table:
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "n_name": pa.array([names[i] for i in nz], pa.string()),
                "rev4": pa.array(sums[nz], pa.int64()),
                "n_items": pa.array(counts[nz], pa.int64()),
            }
        )

    if (ann.size_bytes() or 0) <= broadcast_bytes:
        # broadcast path: sorted orderkeys + nation codes ride the object
        # store once; lineitem never shuffles.  Stay zero-copy Arrow end to
        # end — no pylist round-trip of a table that can be 100s of MB.
        tabs = [t for t in ray.get(ann.to_arrow_refs()) if t.num_rows]
        if tabs:
            at = pa.concat_tables(tabs)
            ok = (
                at.column("o_orderkey")
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            codes = (
                at.column("n_code")
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int32)
            )
        else:
            ok = np.zeros(0, np.int64)
            codes = np.zeros(0, np.int32)
        order = np.argsort(ok, kind="stable")
        pair_ref = ray.put((ok[order], codes[order]))

        def partial_bcast(batch: pa.Table) -> pa.Table:
            keys_s, codes_s = ray.get(pair_ref)
            k = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            rev4 = rev4_of(batch)
            idx = np.searchsorted(keys_s, k)
            idx_c = np.minimum(idx, max(len(keys_s) - 1, 0))
            hit = (keys_s[idx_c] == k) if len(keys_s) else np.zeros(len(k), bool)
            c = codes_s[idx_c[hit]]
            sums = np.zeros(len(names), np.int64)
            np.add.at(sums, c, rev4[hit])
            counts = np.bincount(c, minlength=len(names)).astype(np.int64)
            return partial_to_table(sums, counts)

        partials = lineitem_ds.map_batches(
            partial_bcast, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # scale path: ONE hash-shuffle join (the dimension join above never
        # shuffles), annotated orders repartitioned first so the join input
        # is not hundreds of near-empty blocks.  The small side is
        # materialized so the join execution holds no upstream AllToAll —
        # on CPU-tight clusters an extra exchange competing with the join's
        # aggregator actors inside one streaming execution can stall
        # (CLAUDE.md join pitfalls); ann is orderkey+code rows, cheap.
        def li_proj(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_orderkey": batch.column("l_orderkey"),
                    "rev4": pa.array(rev4_of(batch), pa.int64()),
                }
            )

        li = lineitem_ds.map_batches(li_proj, batch_format="pyarrow", zero_copy_batch=True)
        joined = li.join(
            ann.repartition(num_partitions).materialize(),
            join_type="inner",
            num_partitions=num_partitions,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def partial_joined(batch: pa.Table) -> pa.Table:
            c = batch.column("n_code").to_numpy(zero_copy_only=False).astype(np.int32)
            rev4 = batch.column("rev4").to_numpy(zero_copy_only=False)
            sums = np.zeros(len(names), np.int64)
            np.add.at(sums, c, rev4)
            counts = np.bincount(c, minlength=len(names)).astype(np.int64)
            return partial_to_table(sums, counts)

        partials = joined.map_batches(partial_joined, batch_format="pyarrow")

    # ≤25 bounded keys with associative sums → tree_groupby (block-bundled
    # combine), never a sort shuffle (CLAUDE.md bounded-key rule)
    from .aggregates import tree_groupby

    out = tree_groupby(partials, ["n_name"], [("rev4", "sum"), ("n_items", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": batch.column("n_name"),
                "revenue": pc.divide(pc.cast(batch.column("rev4"), pa.float64()), 10000.0),
                "n_items": batch.column("n_items"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("n_name")


def group_top_k(
    ds,
    group_col: str,
    order_col: str,
    k: int = 3,
    id_col: str = "doc_id",
    descending: bool = True,
    num_partitions: int | None = None,
):
    """Exact top-``k`` rows PER GROUP by (``order_col``, ``id_col``
    tiebreak) without ever sorting the full dataset — the grouped
    generalization of :func:`top_k_orders`.

    Output rows: (group_col, id_col, order_col, ``rn`` int64 1-based rank).
    ``order_col`` must be numeric; ties break ascending on ``id_col``, so
    the result is a pure function of the data.

    Scale shape (10^12 rows): each batch keeps at most k rows per group it
    touches (vectorized lexsort + run-rank — no per-group loop), so the
    shuffle moves <= k x groups-per-batch rows, not the corpus; the final
    per-group combine runs the same kernel inside coarse group-hash
    buckets.  Skew-immune: a group's candidate set is <= k x num_batches
    regardless of its row count.

    Reference anchor: fever's alertify keeps only the first-N matches per
    indicator (/root/reference/cmds/alertify.go limit flag); this is that
    contract as a distributed grouped operator.
    """
    import numpy as np

    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_parts = num_partitions or _auto_parts(ds, floor=32)
    schema = ds.schema().base_schema
    group_type = schema.field(group_col).type
    id_type = schema.field(id_col).type
    order_type = schema.field(order_col).type

    def _empty(with_rn: bool) -> pa.Table:
        cols = {
            group_col: pa.array([], group_type),
            id_col: pa.array([], id_type),
            order_col: pa.array([], order_type),
        }
        if with_rn:
            cols["rn"] = pa.array([], pa.int64())
        return pa.table(cols)

    def _topk(t: pa.Table, with_rn: bool) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _empty(with_rn)
        gc = t.column(group_col)
        if isinstance(gc, pa.ChunkedArray):
            gc = gc.combine_chunks()
        gcodes = gc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        o = t.column(order_col).to_numpy(zero_copy_only=False)
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        if descending:
            # bit-inverse for integers: exact monotone-descending remap with
            # no INT64_MIN overflow and correct unsigned handling (plain -o
            # wraps uint columns mod 2^64 and mis-ranks them)
            okey = ~o if np.issubdtype(o.dtype, np.integer) else -o
        else:
            okey = o
        order = np.lexsort((i, okey, gcodes))
        gs = gcodes[order]
        starts = np.empty(len(gs), dtype=bool)
        starts[0] = True
        np.not_equal(gs[1:], gs[:-1], out=starts[1:])
        run_start = np.flatnonzero(starts)
        run_len = np.diff(np.append(run_start, len(gs)))
        rank = np.arange(len(gs), dtype=np.int64) - np.repeat(run_start, run_len) + 1
        keep = rank <= k
        kept = order[keep]
        cols = {
            group_col: gc.take(pa.array(kept, pa.int64())),
            id_col: pa.array(i[kept]),
            order_col: pa.array(o[kept]),
        }
        if with_rn:
            cols["rn"] = pa.array(rank[keep], pa.int64())
        return pa.table(cols)

    def partial(batch: pa.Table) -> pa.Table:
        t = _topk(batch.select([group_col, id_col, order_col]), with_rn=False)
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column(group_col), n_parts), pa.int32())
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return _empty(with_rn=True)
        return _topk(group.select([group_col, id_col, order_col]), with_rn=True)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(final, batch_format="pyarrow")
    )


def rollup_aggregate(ds, keys: list[str], value_col: str):
    """Multi-level subtotals — SQL ``GROUP BY ROLLUP(k1, k2, ...)``: one
    row per finest group plus subtotal rows (coarser key prefixes padded
    with typed nulls) up to the grand total.

    Output: (*keys, ``n`` int64, ``sum_<value_col>`` int64).  ``value_col``
    must be integral (exact order-independent sums; route money through
    cents first, like ``pricing_summary``).

    Scale shape: ONE corpus pass computes the finest-level partials
    (per-batch combiner → bounded tree merge); every coarser level is then
    derived by re-aggregating the finest result, which is
    (distinct-key-combination)-sized, not corpus-sized.  The rollup itself
    runs in a single map_batches over that small table.

    Reference anchor: fever's aggregators each flush ONE fixed grouping
    (e.g. flow_aggregator.go per (user, type)); this composes the whole
    subtotal lattice from the same single pass.
    """
    if not keys:
        raise ValueError("rollup_aggregate: keys must be non-empty")
    batch, key_types = _finest_key_partials(ds, keys, value_col)
    levels = [
        _subtotal_level(batch, keys, keys[:lvl], key_types, f"sum_{value_col}")
        for lvl in range(len(keys), -1, -1)
    ]
    import ray.data as rd

    return rd.from_arrow(pa.concat_tables(levels))


def _finest_key_partials(ds, keys: list[str], value_col: str):
    """Shared ROLLUP/CUBE core: the finest-level (keys, n, s) table from
    ONE corpus pass (per-batch combiner → bounded tree merge), collected to
    the driver — key-combination-sized by the callers' contract.  Returns
    (batch, key_types); empty input yields an empty typed table so the
    grand-total row can still be emitted."""
    schema = ds.schema()
    if schema is not None:
        base = schema.base_schema
        key_types = {k: base.field(k).type for k in keys}
    else:
        # an empty dataset behind a repartition reports no schema at all;
        # the grand-total row must still exist, so pad keys as typed nulls
        key_types = {k: pa.null() for k in keys}

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select(keys + [value_col]), keys).aggregate(
            [(value_col, "count"), (value_col, "sum")]
        )
        return t.rename_columns(keys + ["n", "s"])

    from .aggregates import tree_groupby

    finest = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys,
        [("n", "sum"), ("s", "sum")],
    )
    import ray

    tabs = [
        t
        for t in ray.get(finest.materialize().to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if tabs:
        batch = pa.concat_tables(tabs).combine_chunks()
    else:
        batch = pa.table(
            {
                **{k: pa.array([], key_types[k]) for k in keys},
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
    return batch, key_types


def _subtotal_level(
    batch: pa.Table,
    keys: list[str],
    kept: list[str],
    key_types: dict,
    sum_col: str,
) -> pa.Table:
    """One grouping-set row block: re-aggregate the finest table by
    ``kept``, padding the dropped keys with typed nulls."""
    if kept == keys:
        g = batch
    elif kept:
        g = pa.TableGroupBy(batch.select(kept + ["n", "s"]), kept).aggregate(
            [("n", "sum"), ("s", "sum")]
        ).rename_columns(kept + ["n", "s"])
    else:
        # grand total: COUNT of nothing is 0, but SUM of nothing (or of
        # all-null values) is NULL — exactly SQL's semantics; coercing
        # the sum to 0 would diverge from the ROLLUP/CUBE oracle
        n = pc.sum(batch.column("n")).as_py()
        sm = pc.sum(batch.column("s")).as_py()
        g = pa.table(
            {
                "n": pa.array([0 if n is None else n], pa.int64()),
                "s": pa.array([sm], pa.int64()),
            }
        )
    cols = {}
    for k in keys:
        cols[k] = (
            g.column(k) if k in kept else pa.nulls(g.num_rows, type=key_types[k])
        )
    cols["n"] = g.column("n")
    cols[sum_col] = g.column("s")
    return pa.table(cols)


def cube_aggregate(ds, keys: list[str], value_col: str):
    """Every grouping set — SQL ``GROUP BY CUBE(k1, ..., kd)``: one row
    per finest group plus subtotals for ALL 2^d key subsets (dropped keys
    padded with typed nulls) down to the grand total.

    Output: (*keys, ``n`` int64, ``sum_<value_col>`` int64) — the same
    contract as `rollup_aggregate` (integral values; money through cents
    first), whose prefix lattice this generalizes to the full subset
    lattice.

    Scale shape: identical to ROLLUP — ONE corpus pass produces the
    finest-level partials through the bounded coalesce-tree; all 2^d - 1
    coarser levels re-aggregate that key-combination-sized table, never
    the corpus.  ``d`` is capped (2^d blocks of output) loudly."""
    if not keys:
        raise ValueError("cube_aggregate: keys must be non-empty")
    if len(keys) > 6:
        raise ValueError(
            f"cube_aggregate: {len(keys)} keys = {1 << len(keys)} grouping "
            "sets — refusing past 6 keys; use explicit grouping sets"
        )
    batch, key_types = _finest_key_partials(ds, keys, value_col)
    sum_col = f"sum_{value_col}"
    levels = []
    d = len(keys)
    # masks from full set down to empty, bit i ↔ keys[i]; subset order is
    # deterministic (descending mask) so output is partition-invariant
    for mask in range((1 << d) - 1, -1, -1):
        kept = [k for i, k in enumerate(keys) if mask & (1 << i)]
        levels.append(_subtotal_level(batch, keys, kept, key_types, sum_col))
    import ray.data as rd

    return rd.from_arrow(pa.concat_tables(levels))


def pivot_counts(
    ds,
    key_col: str,
    pivot_col: str,
    max_pivot: int = 64,
    prefix: str = "n_",
):
    """Long → wide count pivot: one row per ``key_col`` value, one int64
    column ``{prefix}{v}`` per distinct ``pivot_col`` value ``v`` (sorted
    name order), holding COUNT(*) of that (key, value) pair — the
    per-entity activity-profile reshape (events per type per user,
    documents per language per source).  Absent combinations are 0, not
    null: the row is a complete profile vector.

    Null pivot values are skipped (the sketch-build null contract — a null
    category is not a category); null KEYS are skipped for the same
    reason.  The pivot domain must be bounded: more than ``max_pivot``
    distinct values raises loudly (a schema with thousands of generated
    columns is an error, not a result — use the long groupby form then).

    Scale shape: per-batch (key, pivot) partial counts bound the exchange
    by distinct pairs per batch; the coalesce-tree (`tree_groupby`) sums
    them without a sort shuffle, and the wide reshape runs once on the
    final pair-count table (keys × values rows — bounded by the same
    contract that made tree_groupby valid)."""
    import numpy as np

    from .aggregates import tree_groupby

    pschema = ds.schema()
    # schema-less (empty-behind-repartition) inputs can only yield the
    # bare-key empty table; null type matches _finest_key_partials' choice
    key_type = (
        pschema.base_schema.field(key_col).type
        if pschema is not None
        else pa.null()
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(key_col)),
                pc.is_valid(batch.column(pivot_col)),
            )
        )
        t = batch.select([key_col, pivot_col])
        out = pa.TableGroupBy(t, [key_col, pivot_col]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns([key_col, pivot_col, "n"])

    pairs = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col, pivot_col],
        [("n", "sum")],
    )

    def reshape(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # pivot columns are data-dependent, so an empty input can only
            # yield the bare key column — but at least in the input's dtype
            return pa.table({key_col: pa.array([], key_type)})
        pv = batch.column(pivot_col)
        if isinstance(pv, pa.ChunkedArray):
            pv = pv.combine_chunks()
        names = sorted(str(v) for v in pc.unique(pv).to_pylist())
        if len(names) > max_pivot:
            raise ValueError(
                f"pivot_counts: {len(names)} distinct {pivot_col} values "
                f"(> max_pivot={max_pivot}) — refusing to generate that "
                "many columns; use the long (key, value, n) form instead"
            )
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kenc = keys.dictionary_encode()
        krows = kenc.dictionary
        kidx = kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        name_of = {n: j for j, n in enumerate(names)}
        pidx = np.array(
            [name_of[str(v)] for v in pv.to_pylist()], dtype=np.int64
        )
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        wide = np.zeros((len(krows), len(names)), dtype=np.int64)
        wide[kidx, pidx] = n
        cols = {key_col: krows}
        for j, name in enumerate(names):
            cols[f"{prefix}{name}"] = pa.array(wide[:, j], pa.int64())
        out = pa.table(cols)
        return out.take(pc.sort_indices(out, sort_keys=[(key_col, "ascending")]))

    # tree_groupby ends in one small batch (bounded key × pivot domain)
    return pairs.map_batches(reshape, batch_format="pyarrow", batch_size=None)


def melt(
    ds,
    id_cols: list[str],
    value_cols: list[str],
    var_col: str = "variable",
    val_col: str = "value",
    drop_null_values: bool = True,
):
    """Wide → long reshape (SQL UNPIVOT, pandas melt): one output row per
    (input row × value column), carrying ``id_cols``, the source column's
    name in ``var_col``, and its value in ``val_col`` — the inverse of
    `pivot_counts` and the standard prep for per-metric grouped analysis.

    All ``value_cols`` must share one Arrow type (silent casts would
    corrupt exact integer/decimal semantics — cast explicitly first).
    Values pass through untouched, so downstream hashes/compares see the
    original bits.  ``drop_null_values=True`` (default) skips rows whose
    value is NULL — SQL UNPIVOT's semantics, and what the oracle mirrors;
    pass False for pandas-melt behavior (null rows kept).

    Scale shape: embarrassingly parallel — each batch emits its own long
    block (one zero-copy column slice per value column, the variable
    name as a dictionary broadcast); no shuffle, no driver state, output
    is |value_cols| × input rows streamed."""
    if not value_cols:
        raise ValueError("melt: value_cols must be non-empty")
    import numpy as np

    def long_form(batch: pa.Table) -> pa.Table:
        vtypes = {str(batch.schema.field(c).type) for c in value_cols}
        if len(vtypes) > 1:
            raise ValueError(
                f"melt: value_cols mix types {sorted(vtypes)} — cast to a "
                "common type first"
            )
        blocks = []
        for c in value_cols:
            block = batch
            if drop_null_values and batch.column(c).null_count:
                block = batch.filter(pc.is_valid(batch.column(c)))
            n = block.num_rows
            cols = {k: block.column(k) for k in id_cols}
            cols[var_col] = pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, np.int32)), pa.array([c])
            ).cast(pa.string())
            cols[val_col] = block.column(c)
            blocks.append(pa.table(cols))
        return pa.concat_tables(blocks)

    return ds.map_batches(long_form, batch_format="pyarrow", zero_copy_batch=True)


def group_string_agg(
    ds,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    sep: str = ",",
):
    """Ordered per-key concatenation — SQL ``string_agg(value, sep ORDER
    BY ...)`` / Spark ``collect_list`` + join: one row per key with its
    values joined in ``order_cols`` order (plus ``n`` int64, the element
    count) — the session-path / event-sequence materialization step.

    The order columns make the result a pure function of the data;
    callers must include a tiebreaker (e.g. an id) if the leading order
    column can repeat.  Null values become empty strings inside the
    concatenation (SQL string_agg SKIPS nulls — pass pre-filtered input
    for that semantic; the engine keeps row parity with n).

    Scale shape: ONE key-hash coarse-bucket shuffle of the projected
    rows; per bucket one lexsort + run detection + a single vectorized
    ListArray/binary_join build handles every key at once (the
    `line_dedup` reassembly kernel).  Partitioning assumption: one
    bucket fits a worker — a single key's values always co-locate, so a
    pathological key bounded only by corpus size needs a different
    aggregate (sketch or sample)."""
    import numpy as np

    from ..sketches.hashing import bucket_of
    from .dedup import _auto_parts, _key_runs

    n_parts = _auto_parts(ds, floor=32)
    schema = ds.schema()
    key_type = (
        schema.base_schema.field(key_col).type
        if schema is not None
        else pa.null()
    )

    def tag(batch: pa.Table) -> pa.Table:
        narrow = batch.select([key_col, value_col, *order_cols])
        narrow = narrow.filter(pc.is_valid(narrow.column(key_col)))
        return narrow.append_column(
            "bucket",
            pa.array(bucket_of(narrow.column(key_col), n_parts), pa.int32()),
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    key_col: pa.array([], key_type),
                    "agg": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        kc = g.column(key_col)
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        kcodes = kc.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        # np.lexsort sorts by the LAST key first: key column last (most
        # significant), then order_cols[0], ..., order_cols[-1] — so
        # iterate order_cols FORWARD while inserting at the front
        sort_arrays = [kcodes]
        for oc in order_cols:
            col = g.column(oc)
            if col.null_count:
                raise ValueError(
                    f"group_string_agg: order column {oc} contains nulls — "
                    "one null turns the sort key into float64/object "
                    "(collapsing 64-bit order or crashing lexsort); filter "
                    "or fill first"
                )
            if pa.types.is_timestamp(col.type):
                col = pc.cast(col, pa.int64())
            sort_arrays.insert(0, col.to_numpy(zero_copy_only=False))
        order = np.lexsort(tuple(sort_arrays))
        vals = pc.cast(g.column(value_col), pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = vals.take(pa.array(order, pa.int64()))
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        if vals.null_count:
            vals = vals.fill_null("")
        kO = kcodes[order]
        starts = _key_runs(kO)
        la = pa.ListArray.from_arrays(
            pa.array(starts.astype(np.int32)), vals
        )
        return pa.table(
            {
                key_col: kc.take(pa.array(order[starts[:-1]], pa.int64())),
                "agg": pc.binary_join(la, sep),
                "n": pa.array(np.diff(starts), pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def latest_record(
    ds,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    num_partitions: int = 32,
):
    """CDC-style compaction: for every key keep the single newest row —
    ORDER BY ts DESC with a deterministic ``tiebreak_col`` DESC so equal
    timestamps cannot make the survivor partition-dependent.  All non-key
    columns ride along untouched (no arithmetic → value-hash safe).

    Scale shape: one skinny hash-of-key shuffle into ``num_partitions``
    coarse buckets, then a vectorized lexsort + first-of-run pick per
    bucket (the house pattern for high-cardinality grouped argmax — a
    per-key ``map_groups`` or a sort shuffle would both be 5-10x slower at
    web scale).  Keys and timestamps must be non-null (loud error)."""
    import numpy as np

    from ..sketches.hashing import hash64_ints

    P = int(num_partitions)

    def add_bucket(batch: pa.Table) -> pa.Table:
        for name in (key_col, ts_col, tiebreak_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"latest_record: {name} contains nulls — filter first "
                    "(null order is engine-specific and gate-fragile)"
                )
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(k.dtype, np.integer):
            raise ValueError(
                f"latest_record: {key_col} must be an integer key column"
            )
        b = (hash64_ints(k.astype(np.int64)) % np.uint64(P)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def pick_bucket(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table({})
        group = group.drop_columns(["__bucket"])
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).to_numpy(zero_copy_only=False)
        tb = group.column(tiebreak_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.view(np.int64)
        # lexsort is last-key-primary: key asc, then ts desc, then tie desc
        order = np.lexsort((-tb.astype(np.int64), -ts, k))
        firsts = order[
            np.concatenate(([True], np.diff(k[order]) != 0))
        ]
        return group.take(pa.array(np.sort(firsts)))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(pick_bucket, batch_format="pyarrow")
    )


def first_records(
    ds,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    n: int = 3,
    num_partitions: int = 32,
):
    """Per-key history head: the ``n`` EARLIEST rows of every key (ts asc,
    ``tiebreak_col`` asc) — the per-user context-truncation / first-touch
    attribution primitive, deterministic under any partitioning.  Same
    coarse-bucket + vectorized lexsort shape as :func:`latest_record`;
    the run scan keeps positions 0..n-1 of each key run instead of
    position 0 of the reversed order."""
    import numpy as np

    from ..sketches.hashing import hash64_ints

    if n < 1:
        raise ValueError(f"first_records: n must be >= 1, got {n}")
    P = int(num_partitions)

    def add_bucket(batch: pa.Table) -> pa.Table:
        for name in (key_col, ts_col, tiebreak_col):
            if batch.column(name).null_count:
                raise ValueError(
                    f"first_records: {name} contains nulls — filter first"
                )
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(k.dtype, np.integer):
            raise ValueError(
                f"first_records: {key_col} must be an integer key column"
            )
        b = (hash64_ints(k.astype(np.int64)) % np.uint64(P)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def pick_bucket(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table({})
        group = group.drop_columns(["__bucket"])
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).to_numpy(zero_copy_only=False)
        tb = group.column(tiebreak_col).to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.view(np.int64)
        order = np.lexsort((tb.astype(np.int64), ts, k))
        ks = k[order]
        starts = np.concatenate(([True], np.diff(ks) != 0))
        # position within each key run; keep pos < n
        run_id = np.cumsum(starts) - 1
        run_start = np.flatnonzero(starts)
        pos = np.arange(len(ks), dtype=np.int64) - run_start[run_id]
        keep = order[pos < n]
        return group.take(pa.array(np.sort(keep)))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(pick_bucket, batch_format="pyarrow")
    )


def group_share(
    ds,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    max_groups: int = 1 << 16,
):
    """Per-row share of the group total — SQL ``v / SUM(v) OVER (PARTITION
    BY g)`` — the mixture-reporting annotate (what fraction of its
    source's value does this row carry?).  Share = one double division of
    two exact integer-cent values, so any engine dividing the same pair
    lands on the same bits; rows in a zero-total group share 0.0 (not
    NaN), documented semantics.

    Scale shape: the corpus never shuffles — per-batch (group, cents)
    partials tree-combine over the BOUNDED group domain (loud max_groups
    guard), the tiny totals table broadcasts once, and every batch
    annotates with one vectorized code lookup.  Output rows == input
    rows, streamed out of the same map_batches that read them."""
    import ray

    from ..core.bcast import cached_get
    from ..ops.aggregates import _cents, tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if g.null_count or batch.column(value_col).null_count:
            raise ValueError(
                f"group_share: {group_col}/{value_col} must be null-free"
            )
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # np.add.at keeps the partial sums in exact int64 (bincount's
        # float64 weights would cap exactness at 2^53)
        sums = np.zeros(len(enc.dictionary), np.int64)
        np.add.at(sums, codes, c)
        return pa.table(
            {group_col: enc.dictionary, "c": pa.array(sums, pa.int64())}
        )

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True),
                [group_col],
                [("c", "sum")],
                max_groups=max_groups,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    totals: dict = {}
    for t in tabs:
        for k, v in zip(t.column(group_col).to_pylist(),
                        t.column("c").to_pylist()):
            totals[k] = totals.get(k, 0) + int(v)
    tot_ref = ray.put(totals)

    def annotate(batch: pa.Table) -> pa.Table:
        lk = cached_get(tot_ref)
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        c = _cents(batch.column(value_col)).to_numpy(zero_copy_only=False)
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        tot = np.array(
            [lk[k] for k in enc.dictionary.to_pylist()], dtype=np.int64
        )
        den = tot[codes]
        share = np.where(
            den == 0, 0.0, c.astype(np.float64) / np.where(den == 0, 1, den)
        )
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                group_col: g,
                "share": pa.array(share, pa.float64()),
            }
        )

    return ds.map_batches(
        annotate, batch_format="pyarrow", zero_copy_batch=True
    )


def band_join(
    left_ds,
    right_ds,
    delta: int,
    left_id: str = "id_a",
    left_val: str = "val_a",
    right_id: str = "id_b",
    right_val: str = "val_b",
    num_partitions: int | None = None,
    emit: str = "all",
):
    """Numeric band join: every (left, right) pair with
    ``|left_val − right_val| ≤ delta`` — the distance-predicate theta-join
    (price-match audits, sensor alignment, near-equal feature linkage)
    that an equi-join engine cannot express.  Values must be integers
    (cents / micros discipline) so the predicate is bit-stable.

    ``emit="lt"`` keeps only pairs with left id < right id — the self-join
    mode (skips mirror duplicates and self-pairs when both sides are the
    same table).

    Output: (left_id, right_id, left_val, right_val), pure int64.

    Scale shape (10^12 rows): band bucketing — bucket(v) = v // (delta+1)
    (floor division, negatives included); a match implies bucket distance
    ≤ 1, so LEFT rows replicate into {b−1, b, b+1} (3× a skinny (id, val)
    projection, never payload columns) while RIGHT rows land once in their
    own bucket; ONE bucket-hash co-partition brings each candidate pair
    together exactly once (the right row's bucket is unique), and the
    per-bucket kernel is two vectorized searchsorteds over the sorted
    right values + one repeat/arange expansion — no Python pair loop.
    Bucket width delta+1 keeps per-bucket row counts ∝ value density ×
    delta; heavily repeated values in one band are the caller's output
    size, not a partitioning failure."""
    import numpy as np

    from ..sketches.hashing import hash64_ints
    from .dedup import _auto_parts  # circular-safe: ops package peers

    if delta < 0:
        raise ValueError(f"band_join: delta must be >= 0, got {delta}")
    if emit not in ("all", "lt"):
        raise ValueError(f"band_join: emit must be 'all' or 'lt', got {emit!r}")
    n_parts = num_partitions or max(
        _auto_parts(left_ds, floor=32), _auto_parts(right_ds, floor=32)
    )
    width = np.int64(delta + 1)

    def project(id_col, val_col, replicate: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            vals = batch.column(val_col).to_numpy(zero_copy_only=False)
            if not np.issubdtype(vals.dtype, np.integer):
                raise TypeError(
                    f"band_join: {val_col} must be integer-typed, got "
                    f"{vals.dtype} (use the cents/micros discipline)"
                )
            vals = vals.astype(np.int64)
            b = np.floor_divide(vals, width)
            if replicate:
                ids = np.concatenate([ids, ids, ids])
                vals = np.concatenate([vals, vals, vals])
                b = np.concatenate([b - 1, b, b + 1])
            part = (hash64_ints(b) % np.uint64(n_parts)).astype(np.int32)
            return pa.table(
                {
                    "id": pa.array(ids, pa.int64()),
                    "val": pa.array(vals, pa.int64()),
                    "band": pa.array(b, pa.int64()),
                    "side": pa.array(
                        np.zeros(len(ids), np.int8) if replicate
                        else np.ones(len(ids), np.int8),
                        pa.int8(),
                    ),
                    "part": pa.array(part, pa.int32()),
                }
            )

        return fn

    both = left_ds.map_batches(
        project(left_id, left_val, True), batch_format="pyarrow",
        zero_copy_batch=True,
    ).union(
        right_ds.map_batches(
            project(right_id, right_val, False), batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    empty = pa.table(
        {
            left_id: pa.array([], pa.int64()),
            right_id: pa.array([], pa.int64()),
            left_val: pa.array([], pa.int64()),
            right_val: pa.array([], pa.int64()),
        }
    )

    def match(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        side = g.column("side").to_numpy(zero_copy_only=False)
        ids = g.column("id").to_numpy(zero_copy_only=False)
        vals = g.column("val").to_numpy(zero_copy_only=False)
        band = g.column("band").to_numpy(zero_copy_only=False)
        lm = side == 0
        rm = ~lm
        if not lm.any() or not rm.any():
            return empty
        # both sides sorted by (band, val); matching runs per shared band —
        # rv is sorted only WITHIN a band run, so probes are per-run
        # searchsorteds (vectorized across the run's left rows; the run
        # loop is the codebase's standard bucket-run pattern)
        r_ord = np.lexsort((vals[rm], band[rm]))
        rb, rv, rid = band[rm][r_ord], vals[rm][r_ord], ids[rm][r_ord]
        l_ord = np.lexsort((vals[lm], band[lm]))
        lb, lv, lid = band[lm][l_ord], vals[lm][l_ord], ids[lm][l_ord]
        # run starts on each side; align shared bands via searchsorted
        r_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(rb) != 0) + 1, [len(rb)])
        )
        l_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(lb) != 0) + 1, [len(lb)])
        )
        r_bands = rb[r_starts[:-1]]
        l_bands = lb[l_starts[:-1]]
        common, li, ri = np.intersect1d(l_bands, r_bands, return_indices=True)
        out_l_parts, out_lv_parts, out_r_parts, out_rv_parts = [], [], [], []
        for ci in range(len(common)):
            ls, le = l_starts[li[ci]], l_starts[li[ci] + 1]
            rs, re = r_starts[ri[ci]], r_starts[ri[ci] + 1]
            run_rv = rv[rs:re]
            lo = rs + np.searchsorted(run_rv, lv[ls:le] - delta, side="left")
            hi = rs + np.searchsorted(run_rv, lv[ls:le] + delta, side="right")
            cnt = hi - lo
            keep = cnt > 0
            if not keep.any():
                continue
            lo_k, cnt_k = lo[keep], cnt[keep]
            total = int(cnt_k.sum())
            take = np.repeat(lo_k, cnt_k) + (
                np.arange(total, dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(cnt_k[:-1]))), cnt_k)
            )
            out_l_parts.append(np.repeat(lid[ls:le][keep], cnt_k))
            out_lv_parts.append(np.repeat(lv[ls:le][keep], cnt_k))
            out_r_parts.append(rid[take])
            out_rv_parts.append(rv[take])
        if not out_l_parts:
            return empty
        out_l = np.concatenate(out_l_parts)
        out_lv = np.concatenate(out_lv_parts)
        out_r = np.concatenate(out_r_parts)
        out_rv = np.concatenate(out_rv_parts)
        if emit == "lt":
            m = out_l < out_r
            out_l, out_r, out_lv, out_rv = out_l[m], out_r[m], out_lv[m], out_rv[m]
        return pa.table(
            {
                left_id: pa.array(out_l, pa.int64()),
                right_id: pa.array(out_r, pa.int64()),
                left_val: pa.array(out_lv, pa.int64()),
                right_val: pa.array(out_rv, pa.int64()),
            }
        )

    return (
        both.groupby("part")
        .map_groups(match, batch_format="pyarrow")
    )


def _morton_spread16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each uint64 so bit i lands at position 2i
    (the classic mask-doubling interleave — public-domain bit-twiddling
    folklore, e.g. Morton 1966 / graphics gems)."""
    v = v & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def zorder_layout(
    ds,
    x_col: str,
    y_col: str,
    bits: int = 16,
    cell_shift: int = 8,
    max_cells: int = 1_000_000,
):
    """Z-order (Morton) clustering audit — the data-layout operator behind
    multi-dimensional file clustering (Delta/Iceberg OPTIMIZE ZORDER):
    interleave the bits of two bounded non-negative integer columns into
    one locality-preserving key, assign each row to the fixed-width
    z-cell ``cell = z >> cell_shift`` (a cell is the file/block a writer
    would emit), and report each cell's row count and bounding box —
    small per-cell (min,max) ranges on BOTH dimensions are exactly what
    makes later two-column range scans prune files.

    Output rows: (cell, n, min_x, max_x, min_y, max_y), pure int64.

    Scale shape: embarrassingly parallel — the Morton key is a per-row
    bit-twiddle (`_morton_spread16`, vectorized uint64), per-batch
    partials group by cell locally, and the bounded-cell tree combine
    (`tree_groupby`, loud ``max_cells`` guard) merges (sum, min, max)
    partials without any sort shuffle.  Values outside [0, 2^bits) raise
    loudly — silent masking would corrupt the interleave order."""
    from .aggregates import tree_groupby

    if not (1 <= bits <= 16):
        raise ValueError(f"zorder_layout: bits must be in [1, 16], got {bits}")
    if not (0 <= cell_shift < 2 * bits):
        raise ValueError(
            f"zorder_layout: cell_shift must be in [0, {2 * bits}), got "
            f"{cell_shift}"
        )
    limit = np.int64(1) << np.int64(bits)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        for name, v in ((x_col, x), (y_col, y)):
            if len(v) and (v.min() < 0 or v.max() >= limit):
                raise ValueError(
                    f"zorder_layout: {name} outside [0, 2^{bits}) — widen "
                    "bits or rescale; masking would corrupt z-order"
                )
        z = _morton_spread16(x.astype(np.uint64)) | (
            _morton_spread16(y.astype(np.uint64)) << np.uint64(1)
        )
        cell = (z >> np.uint64(cell_shift)).astype(np.int64)
        t = pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "n": pa.array(np.ones(len(cell), np.int64)),
                "min_x": pa.array(x, pa.int64()),
                "max_x": pa.array(x, pa.int64()),
                "min_y": pa.array(y, pa.int64()),
                "max_y": pa.array(y, pa.int64()),
            }
        )
        g = pa.TableGroupBy(t, ["cell"]).aggregate(
            [("n", "sum"), ("min_x", "min"), ("max_x", "max"),
             ("min_y", "min"), ("max_y", "max")]
        )
        return g.rename_columns(["cell", "n", "min_x", "max_x", "min_y", "max_y"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return tree_groupby(
        partials,
        ["cell"],
        [("n", "sum"), ("min_x", "min"), ("max_x", "max"),
         ("min_y", "min"), ("max_y", "max")],
        max_groups=max_cells,
    )
