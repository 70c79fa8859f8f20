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


def pricing_summary(lineitem_ds, cutoff: str = "1998-09-01"):
    """TPC-H Q1 shape: filter by ship date, grouped sums/counts/means."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), pa.scalar(cutoff).cast(pa.timestamp("us")))
        )
        disc_price = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(1.0, batch.column("l_discount"))
        )
        batch = batch.append_column("disc_price", disc_price)
        t = pa.TableGroupBy(
            batch.select(
                ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "disc_price"]
            ),
            ["l_returnflag", "l_linestatus"],
        ).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return t.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "n"]
        )

    from ray.data.aggregate import Sum

    partials = lineitem_ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("n", alias_name="count_order"),
    )
    return out.sort(["l_returnflag", "l_linestatus"])


def segment_revenue(orders_ds, customer_table: pa.Table):
    """Broadcast hash join: orders ⋈ customer (small side) → revenue per
    market segment.  The customer table rides the object store once via
    ray.put; each batch does a vectorized dictionary lookup — the broadcast
    semi-join pattern fever uses for its bloom/trie lookups (SURVEY §2.7),
    generalized to carry payload columns."""
    import numpy as np
    import ray

    cust = {
        int(k): seg
        for k, seg in zip(
            customer_table.column("c_custkey").to_pylist(),
            customer_table.column("c_mktsegment").to_pylist(),
        )
    }
    cust_ref = ray.put(cust)

    def join(batch: pa.Table) -> pa.Table:
        lookup = ray.get(cust_ref)
        keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        segs = [lookup.get(int(k)) for k in keys]
        batch = batch.append_column("c_mktsegment", pa.array(segs, type=pa.string()))
        batch = batch.filter(pc.is_valid(batch.column("c_mktsegment")))
        t = pa.TableGroupBy(
            batch.select(["c_mktsegment", "o_totalprice"]), ["c_mktsegment"]
        ).aggregate([("o_totalprice", "sum"), ("o_totalprice", "count")])
        return t.rename_columns(["c_mktsegment", "revenue", "n_orders"])

    from ray.data.aggregate import Sum

    partials = orders_ds.map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
    return (
        partials.groupby("c_mktsegment")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .sort("c_mktsegment")
    )


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
