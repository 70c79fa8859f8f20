"""Sketch-driven grouped-aggregation planner (core.plan)."""

import numpy as np
import pyarrow as pa

from fever_ray.core.plan import (
    BOUNDED_KEYS_MAX,
    ColumnProbe,
    plan_groupby,
    probe_column,
)


def test_probe_column_matches_exact_stats(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    # Zipf-hot key universe: key0 dominates
    keys = np.array([f"k{z}" for z in (rng.zipf(1.5, 30_000) % 500)])
    ds = rd.from_arrow(pa.table({"key": pa.array(keys.tolist(), pa.string())}))
    p = probe_column(ds.repartition(8), "key")
    n_exact = len(keys)
    d_exact = len(set(keys.tolist()))
    vals, counts = np.unique(keys, return_counts=True)
    top_exact = vals[counts.argmax()]
    share_exact = counts.max() / n_exact
    assert p.n_rows == n_exact
    assert abs(p.n_distinct_est - d_exact) <= 3 * 1.04 / np.sqrt(2**14) * d_exact + 2
    assert p.top_keys[0][0] == top_exact
    # MG undercounts by at most n/(k+1)
    assert abs(p.hot_share - share_exact) <= (1 / 65) + 1e-9
    assert p.top_keys[0][1] <= counts.max()


def test_plan_thresholds_and_salting():
    # bounded + cold → tree, no salt
    cold = ColumnProbe("c", 10_000_000, 5_000.0, [("a", 1000)], 0.0001)
    out = plan_groupby(cold, workers=32)
    assert out["strategy"] == "tree_groupby" and out["salt_fanout"] == 1
    # unbounded → coarse buckets sized to rows
    big = ColumnProbe("c", 100_000_000, 5e7, [("a", 10)], 0.0)
    out = plan_groupby(big, workers=32)
    assert out["strategy"] == "bucket_map_groups"
    assert out["n_parts"] == max(64, 100_000_000 // 250_000)
    # hot key → salted fanout scales with the share, clamped to [4, 64]
    hot = ColumnProbe("c", 1_000_000, 200.0, [("h", 400_000)], 0.4)
    out = plan_groupby(hot, workers=32)
    assert out["strategy"] == "tree_groupby"
    assert out["salt_fanout"] == min(64, max(4, round(0.4 * 32 * 2)))
    # just over the bounded edge flips strategy
    edge = ColumnProbe("c", 10**9, BOUNDED_KEYS_MAX + 1.0, [], 0.0)
    assert plan_groupby(edge)["strategy"] == "bucket_map_groups"
    # empty probe: no crash, no salt
    empty = ColumnProbe("c", 0, 0.0, [], 0.0)
    out = plan_groupby(empty)
    assert out["salt_fanout"] == 1


def test_probe_int_column(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table({"v": pa.array(np.arange(20_000) % 7, pa.int64())})
    )
    p = probe_column(ds, "v", value_kind="int")
    assert p.n_rows == 20_000
    assert round(p.n_distinct_est) == 7
    # 7 near-uniform keys each hold ~14% — more than a 1/32 worker share,
    # so the planner salts to spread few-key partials across the pool
    out = plan_groupby(p, workers=32)
    assert out["salt_fanout"] == round((1 / 7) * 32 * 2)
    # with 4 workers a 1/7 share is NOT hot: no salt
    assert plan_groupby(p, workers=4)["salt_fanout"] == 1


def test_probe_join_size_bound_and_decisions(ray_session):
    import ray.data as rd

    from fever_ray.core.plan import plan_join, probe_join

    rng = np.random.default_rng(11)
    lk = np.array([f"k{v}" for v in rng.integers(0, 50, 8000)])
    rk = np.array([f"k{v}" for v in rng.integers(0, 50, 3000)])
    lds = rd.from_arrow(pa.table({"key": pa.array(lk.tolist(), pa.string())}))
    rds = rd.from_arrow(pa.table({"key": pa.array(rk.tolist(), pa.string())}))
    jp = probe_join(lds, "key", rds, "key")
    # exact inner-join size = sum over keys of cl*cr
    lu, lc = np.unique(lk, return_counts=True)
    ru, rc = np.unique(rk, return_counts=True)
    rmap = dict(zip(ru.tolist(), rc.tolist()))
    exact = int(sum(c * rmap.get(k, 0) for k, c in zip(lu.tolist(), lc.tolist())))
    # CMS inner product NEVER undercounts, over by <= eps*Nl*Nr
    assert jp["join_size_est"] >= exact
    assert jp["join_size_est"] <= exact + jp["join_size_bound"]
    # small known side -> broadcast; unknown sizes -> bucketed
    out = plan_join(jp, left_bytes=10 << 20, right_bytes=1 << 20)
    assert out["strategy"] == "broadcast_lookup"
    out = plan_join(jp)
    assert out["strategy"] == "bucketed_hash_join"
    # oversized sides -> bucketed with row-scaled parts
    out = plan_join(jp, left_bytes=1 << 40, right_bytes=1 << 40)
    assert out["strategy"] == "bucketed_hash_join"
    # hot-key side flagged + blowup flag on hot x hot self-join
    hot = np.array(["h"] * 9000 + ["c"] * 1000)
    hds = rd.from_arrow(pa.table({"key": pa.array(hot.tolist(), pa.string())}))
    jph = probe_join(hds, "key", hds, "key")
    outh = plan_join(jph, left_bytes=1 << 30, right_bytes=1 << 30, workers=32)
    assert set(outh["skewed_sides"]) == {"left", "right"}
    assert outh["blowup"]  # 9000^2 >> 4 * 10000
