"""Distributed exact statistics (ops.stats) — the ground truth the
sketch-error gate grades against."""

import math

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.stats import (
    _from_ordered_u64,
    _to_ordered_u64,
    exact_order_statistic,
    exact_rank_of,
)


def test_ordered_u64_is_monotone_bijection():
    rng = np.random.default_rng(0)
    v = np.concatenate(
        [rng.normal(size=2000), [-0.0, 0.0, 1e308, -1e308, 5e-324, -5e-324]]
    )
    u = _to_ordered_u64(v)
    back = np.array([_from_ordered_u64(x, True) for x in np.sort(u)])
    # -0.0 == 0.0 compares equal, so value order round-trips exactly
    np.testing.assert_array_equal(np.sort(v), back)

    iv = rng.integers(-(2**62), 2**62, size=2000)
    ui = _to_ordered_u64(iv)
    np.testing.assert_array_equal(
        np.sort(iv), np.array([_from_ordered_u64(x, False) for x in np.sort(ui)])
    )


def test_exact_order_statistic_vs_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    v = rng.normal(size=50_001) * 100
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(8)
    sv = np.sort(v)
    # collect_cap small enough to force real histogram refinement rounds
    for q in (0.5, 0.1, 0.9, 1.0, 0.001):
        got = exact_order_statistic(ds, "value", q, collect_cap=2048)
        want = sv[max(int(math.ceil(q * len(v))), 1) - 1]
        assert got == want, q


def test_exact_order_statistic_int_nulls_and_ties(ray_session):
    import ray.data as rd

    v = pa.array([5, 1, 1, 1, None, 9, 9, 3, None], pa.int64())
    ds = rd.from_arrow(pa.table({"x": v}))
    # 7 non-null values sorted: 1 1 1 3 5 9 9 → rank ceil(0.5*7)=4 → 3
    assert exact_order_statistic(ds, "x", 0.5) == 3
    assert exact_order_statistic(ds, "x", 1.0) == 9


def test_exact_order_statistic_empty_raises(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([None, None], pa.float64())}))
    with pytest.raises(ValueError):
        exact_order_statistic(ds, "x", 0.5)


def test_exact_rank_of(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    v = rng.integers(0, 50, size=9999).astype(np.float64)
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(4)
    for x in (0.0, 25.0, 24.5, 49.0, 100.0, -1.0):
        lt, le, n = exact_rank_of(ds, "value", x)
        assert n == len(v)
        assert lt == int((v < x).sum())
        assert le == int((v <= x).sum())


def test_sketch_error_gate_emits_all_checks(ray_session):
    """All six bound checks pass on the deterministic sf0.001 events table
    (each estimate is far inside its published bound — measured ≤0.3% for
    the 2.4-4.7% gates)."""
    import __ray_entry__ as entry

    out = entry.queries()["sketch_error_gate"]("/root/testdata/sf0.001")
    rows = {r["check_name"]: r["exact_value"] for r in out.to_pylist()}
    assert set(rows) == {
        "hll_distinct_users",
        "theta_distinct_users",
        "cms_top_event_type",
        "kll_value_median",
        "tdigest_value_median",
        "bloom_users_membership",
    }
    assert rows["hll_distinct_users"] == rows["theta_distinct_users"] > 0
