"""General relational operators over the TPC-H-ish tables — proof that the
engine covers the generic query shapes (scan/filter/project/aggregate/join/
sort/limit) a reference user needs, each in its scale-correct Ray Data form:

* filters/projections pushed into the read or vectorized map_batches
* aggregations pre-combined per batch before the shuffle
* small-side joins broadcast via ray.put (no shuffle of the big side)
* top-k via sort+limit on a pre-reduced candidate set
"""

from __future__ import annotations

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


def partitioned_hash_join(left_ds, right_ds, left_key: str, right_key: str, n_buckets: int = 16):
    """Both-sides-large join: explicit bucketed hash join — add
    bucket=hash(key)%B to both sides, co-group per bucket, join inside
    map_groups.  Documented partitioning assumption: bucket count B chosen so
    one bucket of the smaller side fits a worker's heap; hot keys can be
    salted into sub-buckets (not needed for these fixtures)."""
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
        return lt.join(rt, keys=left_key, right_keys=right_key, join_type="inner")

    both = left_tag.union(right_tag)
    return both.groupby("__bucket").map_groups(join_group, batch_format="pyarrow")
