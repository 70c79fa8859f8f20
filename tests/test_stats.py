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


def test_group_value_rank_vs_duckdb(ray_session):
    """Ties, descending mode, and string groups vs the RANK() oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from fever_ray.ops.stats import group_value_rank
    from tests.strict_compare import canon

    rng = np.random.default_rng(7)
    n = 8000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array([f"l{g}" for g in rng.integers(0, 6, n)]),
            "n_chars": pa.array(rng.integers(0, 50, n).astype("int64")),
        }
    )
    con = duckdb.connect()
    con.register("d", t)
    for desc in (False, True):
        got = group_value_rank(
            ray_session.data.from_arrow(t).repartition(5),
            group_col="lang",
            value_col="n_chars",
            descending=desc,
        ).to_pandas()
        want = con.execute(
            "SELECT doc_id, lang, n_chars, RANK() OVER (PARTITION BY lang "
            f"ORDER BY n_chars {'DESC' if desc else ''}) AS rank FROM d"
        ).fetchdf()
        pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)


def test_group_value_rank_rejects_nulls(ray_session):
    import pyarrow as pa
    import pytest as _pytest

    from fever_ray.ops.stats import group_value_rank

    t = pa.table({"g": ["a", "b"], "v": pa.array([1, None], pa.int64())})
    with _pytest.raises(Exception, match="null"):
        group_value_rank(
            ray_session.data.from_arrow(t), group_col="g", value_col="v"
        ).materialize()


def test_group_mode_tie_policy(ray_session):
    """Ties resolve to the smallest value; counts exact across partitions."""
    import pyarrow as pa

    from fever_ray.ops.stats import group_mode

    t = pa.table(
        {
            "g": ["a"] * 6 + ["b"] * 3,
            "v": pa.array([5, 5, 3, 3, 9, 1, 7, 7, 2], pa.int64()),
        }
    )
    got = (
        group_mode(ray_session.data.from_arrow(t).repartition(4), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # group a: 5 and 3 both occur twice -> smallest value (3) wins
    assert got["g"].tolist() == ["a", "b"]
    assert got["mode"].tolist() == [3, 7]
    assert got["mode_count"].tolist() == [2, 2]


def test_group_value_rank_rejects_float_groups(ray_session):
    from fever_ray.ops.stats import group_value_rank

    t = pa.table({"g": pa.array([1.0, float("nan")]), "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="floating"):
        group_value_rank(ray_session.data.from_arrow(t), "g", "v")


def _ntile_reference(vals, ids, seed, k):
    """Local NTILE replica: rank under (value, splitmix id-hash, id)."""
    from fever_ray.sketches.hashing import hash64_ints

    h = hash64_ints(np.asarray(ids, dtype=np.int64), seed=seed)
    order = np.lexsort((ids, h, vals))
    n = len(vals)
    q, rem = divmod(n, k)
    tile = np.empty(n, dtype=np.int64)
    r = np.arange(n)
    thresh = rem * (q + 1)
    tile[order] = np.where(
        r < thresh, r // (q + 1), rem + (r - thresh) // max(q, 1)
    ) + 1
    return tile


def test_quantile_bucket_exact_with_heavy_skew(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket

    rng = np.random.default_rng(3)
    n = 9973
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)
    # one value owns ~60% of the corpus — the salted-cell path must still
    # produce exact NTILE ranks
    vals = np.where(rng.random(n) < 0.6, 7, rng.integers(0, 40, n)).astype(
        np.int64
    )
    ds = rd.from_arrow(pa.table({"doc_id": ids, "v": vals})).repartition(7)
    out = (
        quantile_bucket(ds, "v", k=10, seed=5, sub_bits=3, n_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _ntile_reference(vals, ids, 5, 10)
    order = np.argsort(ids)
    np.testing.assert_array_equal(out["doc_id"].to_numpy(), ids[order])
    np.testing.assert_array_equal(out["v"].to_numpy(), vals[order])
    np.testing.assert_array_equal(out["tile"].to_numpy(), want[order])
    # NTILE size contract: first n % k tiles hold one extra row
    sizes = out.groupby("tile").size()
    q, rem = divmod(n, 10)
    assert (sizes.loc[1 : rem] == q + 1).all()
    assert (sizes.loc[rem + 1 :] == q).all()


def test_quantile_bucket_partition_invariance_and_edges(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket

    ids = np.arange(113, dtype=np.int64)
    vals = (ids * 37 % 11).astype(np.float64) / 3.0
    t = pa.table({"doc_id": ids, "score": vals})
    outs = []
    for parts in (1, 13):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            quantile_bucket(ds, "score", k=4, seed=9)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    # k > n: every row its own tile, tiles 1..n each of size 1
    small = rd.from_arrow(pa.table({"doc_id": ids[:5], "score": vals[:5]}))
    tiles = (
        quantile_bucket(small, "score", k=64, seed=1)
        .to_pandas()["tile"]
        .sort_values()
        .to_numpy()
    )
    np.testing.assert_array_equal(tiles, np.arange(1, 6))


def test_quantile_bucket_rejects_nulls_and_nans(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket

    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "v": pa.array([1.0, None])})
    )
    with pytest.raises(Exception, match="null"):
        quantile_bucket(ds, "v", k=2).materialize()
    ds2 = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "v": pa.array([1.0, float("nan")])})
    )
    with pytest.raises(Exception, match="NaN"):
        quantile_bucket(ds2, "v", k=2).materialize()
    with pytest.raises(ValueError, match="k must be"):
        quantile_bucket(ds, "v", k=0)


def test_quantile_bucket_cell_budget_trips_inside_tree(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket

    ids = np.arange(3000, dtype=np.int64)
    t = pa.table({"doc_id": ids, "v": ids})  # every value distinct
    with pytest.raises(Exception, match="max_groups|value domain"):
        quantile_bucket(
            rd.from_arrow(t), "v", k=4, max_cells=100, sub_bits=0
        ).materialize()
    with pytest.raises(ValueError, match="n_parts"):
        quantile_bucket(rd.from_arrow(t), "v", k=4, n_parts=0)


def test_quantile_bucket_approx_below_saturation_is_exact(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket_approx

    rng = np.random.default_rng(11)
    n = 900  # < kll_k: splits are exact order statistics
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 200, n)
    ds = rd.from_arrow(
        pa.table({"doc_id": ids, "v": pa.array(vals, pa.int64())})
    ).repartition(6)
    k = 7
    out = (
        quantile_bucket_approx(ds, "v", k=k, kll_k=2048)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # local replica of the below-saturation rule
    sv = np.sort(vals)
    splits = np.array(
        [sv[max(int(np.ceil((i / k) * n)), 1) - 1] for i in range(1, k)],
        dtype=np.float64,
    )
    want = np.searchsorted(splits, vals.astype(np.float64), side="left") + 1
    np.testing.assert_array_equal(out["bucket"].to_numpy(), want)
    np.testing.assert_array_equal(out["v"].to_numpy(), vals)
    assert out["bucket"].min() >= 1 and out["bucket"].max() <= k
    # buckets are monotone in value
    srt = out.sort_values(["v", "doc_id"])
    assert (np.diff(srt["bucket"].to_numpy()) >= 0).all()


def test_quantile_bucket_approx_partition_invariant_and_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_bucket_approx

    ids = np.arange(300, dtype=np.int64)
    vals = (ids * 13 % 37).astype(np.float64)
    t = pa.table({"doc_id": ids, "v": vals})
    outs = [
        quantile_bucket_approx(rd.from_arrow(t).repartition(p), "v", k=5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for p in (1, 11)
    ]
    assert outs[0].equals(outs[1])
    with pytest.raises(ValueError, match="k must be"):
        quantile_bucket_approx(rd.from_arrow(t), "v", k=0)
    tn = pa.table({"doc_id": [1], "v": pa.array([float("nan")])})
    with pytest.raises(Exception, match="NaN"):
        quantile_bucket_approx(
            rd.from_arrow(tn), "v", k=2
        ).materialize()


def test_winsorize_and_value_histogram(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import value_histogram, winsorize

    rng = np.random.default_rng(5)
    n = 800
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(0, 1000, n)
    vals[:5] = 10_000  # outliers
    ds = rd.from_arrow(pa.table({"doc_id": ids, "v": pa.array(vals, pa.int64())}))
    out = (
        winsorize(ds, "v", lo_q=0.05, hi_q=0.95)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sv = np.sort(vals)
    lo = sv[max(int(np.ceil(0.05 * n)), 1) - 1]
    hi = sv[max(int(np.ceil(0.95 * n)), 1) - 1]
    np.testing.assert_array_equal(
        out["value_clipped"].to_numpy(), np.clip(vals, lo, hi)
    )
    assert out["value_clipped"].dtype == np.int64
    assert out["value_clipped"].max() == hi  # outliers got capped
    with pytest.raises(ValueError, match="lo_q"):
        winsorize(ds, "v", lo_q=0.9, hi_q=0.1)

    hist = value_histogram(ds, "v", lo=0, hi=1000, n_bins=10).to_pandas()
    b = np.clip((vals - 0) * 10 // 1000, 0, 9)
    want = dict(zip(*np.unique(b, return_counts=True)))
    got = dict(zip(hist["bin"], hist["n"]))
    assert got == {int(k): int(v) for k, v in want.items()}
    assert int(hist["n"].sum()) == n  # out-of-range rows land in edge bins
    # exact inclusive lower edges
    np.testing.assert_array_equal(
        hist["bin_lo"].to_numpy(),
        (hist["bin"].to_numpy() * 1000 + 9) // 10,
    )
    with pytest.raises(ValueError, match="hi > lo"):
        value_histogram(ds, "v", lo=5, hi=5, n_bins=4)


def test_value_histogram_huge_outlier_lands_in_edge_bin(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import value_histogram

    t = pa.table(
        {"doc_id": [1, 2, 3], "v": pa.array([5, 1 << 60, -(1 << 60)], pa.int64())}
    )
    out = value_histogram(rd.from_arrow(t), "v", lo=0, hi=10, n_bins=5).to_pandas()
    got = dict(zip(out["bin"], out["n"]))
    # pre-clip keeps the multiply in range: huge values hit the EDGE bins
    assert got == {0: 1, 2: 1, 4: 1}
    with pytest.raises(ValueError, match="overflow"):
        value_histogram(rd.from_arrow(t), "v", lo=0, hi=1 << 61, n_bins=8)


def test_zscore_outliers_exact_vs_numpy_reference(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import zscore_outliers

    rng = np.random.default_rng(3)
    # heavy-tailed ints with deliberate boundary clustering: many values
    # sit exactly at / next to the k·σ frontier once N·x−S is integer
    v = np.concatenate(
        [
            rng.integers(0, 200, size=5000),
            rng.integers(900, 1000, size=37),  # the tail
        ]
    ).astype(np.int64)
    ids = np.arange(len(v), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "x": v})).repartition(7)
    got = (
        zscore_outliers(ds, "x", k_num=3, k_den=2, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # exact rational reference: 4·(N·x−S)² > 9·(N·SS−S²) in python ints
    N, S, SS = len(v), int(v.sum()), int((v.astype(object) ** 2).sum())
    keep = np.array(
        [4 * (N * int(x) - S) ** 2 > 9 * (N * SS - S * S) for x in v]
    )
    assert got["doc_id"].tolist() == ids[keep].tolist()
    assert got["x"].tolist() == v[keep].tolist()
    assert keep.sum() > 0  # the fixture actually exercises the tail
    # partition invariance: same rows from a different block split
    got2 = (
        zscore_outliers(
            rd.from_arrow(pa.table({"doc_id": ids, "x": v})).repartition(3),
            "x",
            k_num=3,
            k_den=2,
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got2["doc_id"].tolist() == got["doc_id"].tolist()


def test_zscore_outliers_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import zscore_outliers

    fl = rd.from_arrow(pa.table({"doc_id": [1], "x": pa.array([1.5])}))
    with pytest.raises(Exception, match="integer column"):
        zscore_outliers(fl, "x").take_all()
    nul = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "x": pa.array([1, None], pa.int64())})
    )
    with pytest.raises(Exception, match="nulls"):
        zscore_outliers(nul, "x").take_all()
    big = rd.from_arrow(
        pa.table({"doc_id": [1], "x": pa.array([1 << 21], pa.int64())})
    )
    with pytest.raises(Exception, match="2\\^20"):
        zscore_outliers(big, "x").take_all()
    with pytest.raises(ValueError, match="k_num"):
        zscore_outliers(fl, "x", k_num=0)


def test_mad_outliers_exact_vs_reference(ray_session):
    import math as _math

    import ray.data as rd

    from fever_ray.ops.stats import mad_outliers

    rng = np.random.default_rng(9)
    # a huge outlier cluster that would wreck a mean/sigma rule but not MAD
    v = np.concatenate(
        [rng.integers(100, 120, size=4000), np.full(50, 100000, np.int64)]
    ).astype(np.int64)
    ids = np.arange(len(v), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "x": v})).repartition(5)
    got = sorted(
        r["doc_id"]
        for r in mad_outliers(ds, "x", k_num=3, k_den=1).take_all()
    )
    sv = np.sort(v)
    med = int(sv[max(_math.ceil(0.5 * len(v)), 1) - 1])
    dev = np.sort(np.abs(v - med))
    mad = int(dev[max(_math.ceil(0.5 * len(v)), 1) - 1])
    want = sorted(ids[np.abs(v - med) > 3 * mad].tolist())
    assert got == want
    assert set(got) >= set(range(4000, 4050))  # the planted cluster is caught
    # partition invariance
    got2 = sorted(
        r["doc_id"]
        for r in mad_outliers(
            rd.from_arrow(pa.table({"doc_id": ids, "x": v})).repartition(2),
            "x", k_num=3, k_den=1,
        ).take_all()
    )
    assert got2 == got


def test_mad_outliers_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import mad_outliers

    fl = rd.from_arrow(pa.table({"doc_id": [1], "x": pa.array([1.5])}))
    with pytest.raises(ValueError, match="integer column"):
        mad_outliers(fl, "x")
    ok = rd.from_arrow(pa.table({"doc_id": [1], "x": pa.array([3], pa.int64())}))
    with pytest.raises(ValueError, match="k_num"):
        mad_outliers(ok, "x", k_num=0)


def test_group_moments_exact_vs_numpy(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import group_moments

    rng = np.random.default_rng(11)
    g = rng.choice(["a", "b", "c"], size=5000)
    x = rng.integers(0, 1000, size=5000)
    y = rng.integers(0, 1000, size=5000)
    ds = rd.from_arrow(
        pa.table({"g": g, "x": pa.array(x, pa.int64()), "y": pa.array(y, pa.int64())})
    ).repartition(7)
    out = group_moments(ds, "g", "x", "y").to_pandas().set_index("g").sort_index()
    for key in "abc":
        m = g == key
        assert out.loc[key, "n"] == int(m.sum())
        assert out.loc[key, "sum_x"] == int(x[m].sum())
        assert out.loc[key, "sum_xx"] == int((x[m].astype(object) ** 2).sum())
        assert out.loc[key, "sum_xy"] == int((x[m].astype(object) * y[m]).sum())
        assert out.loc[key, "sum_yy"] == int((y[m].astype(object) ** 2).sum())


def test_group_moments_lane_carry_and_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import group_moments

    # values near the 2^20 cap across many blocks: per-block products sum
    # past 2^32, so the hi/lo lanes must actually carry
    n = 4096
    v = np.full(n, (1 << 20) - 1, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"g": ["k"] * n, "x": pa.array(v), "y": pa.array(v)})
    ).repartition(16)
    out = group_moments(ds, "g", "x", "y").to_pandas()
    want = n * ((1 << 20) - 1) ** 2
    assert int(out["sum_xx"][0]) == want == int(out["sum_xy"][0])

    bad = rd.from_arrow(
        pa.table({"g": ["k"], "x": pa.array([1 << 20], pa.int64()),
                  "y": pa.array([0], pa.int64())})
    )
    with pytest.raises(Exception, match="2\\^20"):
        group_moments(bad, "g", "x", "y")
    neg = rd.from_arrow(
        pa.table({"g": ["k"], "x": pa.array([-1], pa.int64()),
                  "y": pa.array([0], pa.int64())})
    )
    with pytest.raises(Exception, match="2\\^20"):
        group_moments(neg, "g", "x", "y")
    nul = rd.from_arrow(
        pa.table({"g": ["k"], "x": pa.array([None], pa.int64()),
                  "y": pa.array([0], pa.int64())})
    )
    with pytest.raises(Exception, match="null"):
        group_moments(nul, "g", "x", "y")


def test_group_entropy_bits_staircase(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import group_entropy_bits

    # single-valued group -> 0 bits; uniform 4-way over 8 rows ->
    # 8*3 - 4*(2*1) = 16 exactly (all counts are powers of two)
    t = pa.table(
        {
            "g": ["mono"] * 6 + ["quad"] * 8,
            "v": ["x"] * 6 + ["a", "a", "b", "b", "c", "c", "d", "d"],
        }
    )
    out = (
        group_entropy_bits(rd.from_arrow(t).repartition(5), "g", "v")
        .to_pandas()
        .set_index("g")
    )
    assert int(out.loc["mono", "h_bits_scaled"]) == 0
    assert int(out.loc["mono", "n"]) == 6
    assert int(out.loc["quad", "h_bits_scaled"]) == 16

    nul = rd.from_arrow(pa.table({"g": ["k"], "v": pa.array([None], pa.string())}))
    with pytest.raises(Exception, match="null"):
        group_entropy_bits(nul, "g", "v")


def test_distribution_drift_planted_shift(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import distribution_drift

    # side a: values centered low; side b: identical except bin 3 mass
    # moved to bin 0 — exactly bins 0 and 3 must flag at a 5% threshold
    a_vals = [5] * 40 + [15] * 30 + [25] * 20 + [35] * 10
    b_vals = [5] * 50 + [15] * 30 + [25] * 20
    t = pa.table(
        {
            "v": pa.array(a_vals + b_vals, pa.int64()),
            "side": pa.array([0] * len(a_vals) + [1] * len(b_vals), pa.int64()),
        }
    )
    out = (
        distribution_drift(
            rd.from_arrow(t).repartition(6), "v", "side",
            lo=0, hi=40, n_bins=4, t_num=1, t_den=20,
        )
        .to_pandas()
        .set_index("bin")
    )
    assert list(out.index) == [0, 1, 2, 3]
    # shares: a = 40/30/20/10%, b = 50/30/20/0% -> |diff| = 10,0,0,10
    assert out["drift"].tolist() == [1, 0, 0, 1]
    assert out["n_a"].tolist() == [40, 30, 20, 10]
    assert out["n_b"].tolist() == [50, 30, 20, 0]
    assert out["bin_lo"].tolist() == [0, 10, 20, 30]


def test_distribution_drift_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import distribution_drift

    one_side = rd.from_arrow(
        pa.table({"v": pa.array([1, 2], pa.int64()),
                  "side": pa.array([0, 0], pa.int64())})
    )
    with pytest.raises(Exception, match="one side is empty"):
        distribution_drift(one_side, "v", "side", lo=0, hi=4, n_bins=2)
    bad_side = rd.from_arrow(
        pa.table({"v": pa.array([1, 2], pa.int64()),
                  "side": pa.array([0, 2], pa.int64())})
    )
    with pytest.raises(Exception, match="must be 0 or 1"):
        distribution_drift(bad_side, "v", "side", lo=0, hi=4, n_bins=2)


def test_pareto_front_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import pareto_front

    rng = np.random.default_rng(13)
    n = 800
    x = rng.integers(0, 60, n)
    y = rng.integers(0, 60, n)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "id": pa.array(ids),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        }
    )
    want = set()
    for i in range(n):
        dominated = np.any(
            (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
        )
        if not dominated:
            want.add(int(ids[i]))
    for parts in (1, 9):
        out = pareto_front(
            rd.from_arrow(t).repartition(parts), "x", "y"
        ).take_all()
        assert {r["id"] for r in out} == want and len(out) == len(want)
    # duplicates of a frontier point all survive; strictly-worse same-x drops
    t2 = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "x": pa.array([5, 5, 5, 9], pa.int64()),
            "y": pa.array([9, 9, 2, 1], pa.int64()),
        }
    )
    out2 = {r["id"] for r in pareto_front(rd.from_arrow(t2), "x", "y").take_all()}
    assert out2 == {1, 2, 4}
    with pytest.raises(ValueError, match="max_front"):
        pareto_front(rd.from_arrow(t), "x", "y", max_front=2).take_all()
    tnull = pa.table(
        {
            "id": pa.array([1], pa.int64()),
            "x": pa.array([None], pa.int64()),
            "y": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="nulls"):
        pareto_front(rd.from_arrow(tnull), "x", "y").take_all()
    assert pareto_front(rd.from_arrow(t.slice(0, 0)), "x", "y").count() == 0


def test_group_regression_exact_fit_and_degenerate(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import group_regression

    rng = np.random.default_rng(31)
    gs, xs, ys = [], [], []
    for g, slope, icpt in (("a", 3, 7), ("b", -2, 2100)):
        for _ in range(200):
            x = int(rng.integers(0, 1000))
            noise = int(rng.integers(-5, 6))
            gs.append(g)
            xs.append(x)
            ys.append(max(slope * x + icpt + noise, 0))
    # degenerate group: constant x
    for yv in (10, 20, 33):
        gs.append("const")
        xs.append(42)
        ys.append(yv)
    t = pa.table(
        {
            "g": pa.array(gs),
            "x": pa.array(xs, pa.int64()),
            "y": pa.array(ys, pa.int64()),
        }
    )
    def want_for(g):
        ix = [i for i, gg in enumerate(gs) if gg == g]
        n = len(ix)
        sx = sum(xs[i] for i in ix); sy = sum(ys[i] for i in ix)
        sxx = sum(xs[i] ** 2 for i in ix)
        sxy = sum(xs[i] * ys[i] for i in ix)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            return (n, 0.0, float(sy) / float(n))
        sl = float(num) / float(den)
        return (n, sl, (float(sy) - sl * float(sx)) / float(n))

    for parts in (1, 6):
        out = {
            r["g"]: (r["n"], r["slope"], r["intercept"])
            for r in group_regression(
                rd.from_arrow(t).repartition(parts), "g", "x", "y"
            ).to_pylist()
        }
        assert out == {g: want_for(g) for g in ("a", "b", "const")}
    # fitted slopes recover the planted lines to within the noise
    assert abs(out["a"][1] - 3) < 0.1 and abs(out["b"][1] + 2) < 0.1
    assert out["const"] == (3, 0.0, 21.0)


def test_ks_distance_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import ks_distance

    rng = np.random.default_rng(61)
    # side 0 ~ uniform cents [0, 1000); side 1 shifted by +150 cents
    a = rng.integers(0, 1000, 400)
    b = rng.integers(150, 1150, 300)
    side = np.concatenate([np.zeros(400, np.int64), np.ones(300, np.int64)])
    vals = np.concatenate([a, b]) / 100.0
    t = pa.table(
        {
            "side": pa.array(side, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    allv = np.unique(np.concatenate([a, b]))
    gaps = np.array(
        [abs((a <= v).sum() * 300 - (b <= v).sum() * 400) for v in allv]
    )
    want_d = int(gaps.max())
    want_at = int(allv[int(np.argmax(gaps))])
    want_emd = float(
        sum(int(g) * int(dv) for g, dv in zip(gaps[:-1], np.diff(allv)))
    )
    for parts in (1, 6):
        row = ks_distance(
            rd.from_arrow(t).repartition(parts), "side", "value"
        ).take_all()[0]
        assert (
            row["n_a"], row["n_b"], row["d_num"], row["at_cents"],
            row["emd_num"],
        ) == (400, 300, want_d, want_at, want_emd)
    # the planted +150-cent shift is visible in EMD ~ shift·n_a·n_b
    assert abs(want_emd / (400 * 300) - 150) < 20
    # identical sides -> D = 0; empty side -> sentinel
    t2 = pa.table(
        {
            "side": pa.array([0, 1, 0, 1], pa.int64()),
            "value": pa.array([1.0, 1.0, 2.0, 2.0], pa.float64()),
        }
    )
    r2 = ks_distance(rd.from_arrow(t2), "side", "value").take_all()[0]
    assert r2["d_num"] == 0 and r2["emd_num"] == 0.0
    t3 = t2.filter(pa.array([True, False, True, False]))
    r3 = ks_distance(rd.from_arrow(t3), "side", "value").take_all()[0]
    assert (r3["n_b"], r3["d_num"], r3["emd_num"]) == (0, -1, -1.0)
    with pytest.raises(Exception, match="side_col"):
        ks_distance(
            rd.from_arrow(
                pa.table(
                    {
                        "side": pa.array([2], pa.int64()),
                        "value": pa.array([1.0]),
                    }
                )
            ),
            "side",
            "value",
        ).take_all()


def test_weighted_median_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import weighted_median

    rng = np.random.default_rng(91)
    v = rng.integers(0, 500, 800)
    w = rng.integers(0, 20, 800)
    t = pa.table(
        {"v": pa.array(v, pa.int64()), "w": pa.array(w, pa.int64())}
    )
    order = np.argsort(v, kind="stable")
    W = int(w.sum())
    cum = 0
    want = None
    seen = {}
    for vi in sorted(set(v.tolist())):
        seen[vi] = int(w[v == vi].sum())
    for vi in sorted(seen):
        cum += seen[vi]
        if 2 * cum >= W:
            want = vi
            break
    for parts in (1, 6):
        row = weighted_median(
            rd.from_arrow(t).repartition(parts), "v", "w"
        ).take_all()[0]
        assert (row["median_value"], row["total_weight"]) == (want, W)
    # all-zero weights -> sentinel
    t0 = pa.table(
        {"v": pa.array([1, 2], pa.int64()), "w": pa.array([0, 0], pa.int64())}
    )
    r0 = weighted_median(rd.from_arrow(t0), "v", "w").take_all()[0]
    assert (r0["median_value"], r0["total_weight"]) == (-1, 0)
    with pytest.raises(Exception, match="negative"):
        weighted_median(
            rd.from_arrow(
                pa.table(
                    {"v": pa.array([1], pa.int64()),
                     "w": pa.array([-1], pa.int64())}
                )
            ),
            "v", "w",
        ).take_all()


def test_gini_concentration_exact(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import gini_concentration

    # all-equal counts -> gini 0
    t = pa.table({"source": pa.array(["a"] * 5 + ["b"] * 5 + ["c"] * 5)})
    (r,) = gini_concentration(rd.from_arrow(t)).take_all()
    assert (r["n_groups"], r["total"], r["gini_num"]) == (3, 15, 0)

    # fully concentrated: one group holds everything but singletons
    t2 = pa.table({"source": pa.array(["big"] * 97 + ["s1", "s2", "s3"])})
    (r2,) = gini_concentration(rd.from_arrow(t2)).take_all()
    # brute force: sorted counts [1,1,1,97]
    c = np.array([1, 1, 1, 97])
    n = 4
    want = int(np.sum((2 * np.arange(1, 5) - n - 1) * c))
    assert r2["gini_num"] == want and r2["gini_den"] == n * 100
    assert 0.7 < r2["gini_num"] / r2["gini_den"] < 1.0

    # random counts vs brute force, partition invariance
    rng = np.random.default_rng(8)
    srcs = [f"s{i}" for i in rng.integers(0, 40, size=4000)]
    t3 = pa.table({"source": pa.array(srcs)})
    vals, cnts = np.unique(np.array(srcs), return_counts=True)
    cs = np.sort(cnts)
    nn = len(cs)
    want_num = int(np.sum((2 * np.arange(1, nn + 1) - nn - 1) * cs))
    for parts in (1, 7):
        (r3,) = gini_concentration(
            rd.from_arrow(t3).repartition(parts)
        ).take_all()
        assert (r3["n_groups"], r3["total"], r3["gini_num"], r3["gini_den"]) \
            == (nn, 4000, want_num, nn * 4000)

    with pytest.raises(Exception, match="max_groups|groups"):
        gini_concentration(rd.from_arrow(t3), max_groups=5).take_all()


def test_quantile_match_distribution_alignment(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import quantile_match

    rng = np.random.default_rng(17)
    # group A: small values; group B: shifted+scaled — after matching,
    # both land on the pooled distribution
    na, nb = 400, 600
    va = np.round(rng.normal(10, 2, na), 2)
    vb = np.round(rng.normal(50, 8, nb), 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(na + nb, dtype=np.int64)),
            "event_type": pa.array(["A"] * na + ["B"] * nb),
            "value": pa.array(np.concatenate((va, vb)), pa.float64()),
        }
    )
    for parts in (1, 5):
        out = quantile_match(
            rd.from_arrow(t).repartition(parts),
            "event_type", "value", "event_id",
        ).take_all()
        assert len(out) == na + nb
        got = {r["event_id"]: r for r in out}
        # brute force
        allc = np.round(np.concatenate((va, vb)) * 100).astype(np.int64)
        gsorted = np.sort(allc)
        for gname, idxs in (("A", range(na)), ("B", range(na, na + nb))):
            gc = allc[list(idxs)]
            gs = np.sort(gc)
            ng = len(gc)
            for i in idxs:
                rk = int(np.searchsorted(gs, allc[i], "left")) + 1
                tp = (rk - 1) * (na + nb) // ng + 1
                assert got[i]["norm_cents"] == int(gsorted[tp - 1]), i
                assert got[i]["value_cents"] == int(allc[i])
    # alignment property: each group's normalized median sits near the
    # pooled median even though raw medians differ by 40
    med = np.median(gsorted)
    for gname, idxs in (("A", range(na)), ("B", range(na, na + nb))):
        gm = np.median([got[i]["norm_cents"] for i in idxs])
        assert abs(gm - med) < 300  # within 3.0 units of the pooled median


def test_top_share_lorenz_point(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import top_share

    # 100 rows: one whale of 99.00, ninety-nine of 0.01 → top 1% = 1 row
    vals = np.concatenate(([99.0], np.full(99, 0.01)))
    t = pa.table({"value": pa.array(vals, pa.float64())})
    (r,) = top_share(rd.from_arrow(t), "value", top_ppm=10_000).take_all()
    assert (r["n_rows"], r["n_top"], r["top_mass"], r["total_mass"]) == (
        100, 1, 9900, 9900 + 99,
    )

    # boundary tie block: ppm picks 2 of 4 equal values → pro-rata exact
    t2 = pa.table({"value": pa.array([5.0, 5.0, 5.0, 5.0], pa.float64())})
    (r2,) = top_share(rd.from_arrow(t2), "value", top_ppm=500_000).take_all()
    assert (r2["n_top"], r2["top_mass"], r2["total_mass"]) == (2, 1000, 2000)

    # negatives sort below; top mass takes the largest values first
    t3 = pa.table({"value": pa.array([-1.0, 2.0, 3.0], pa.float64())})
    (r3,) = top_share(rd.from_arrow(t3), "value", top_ppm=670_000).take_all()
    # ceil(3 * 0.67) = 3 -> all rows, including the negative one
    assert (r3["n_top"], r3["top_mass"]) == (3, 400)
    (r3b,) = top_share(rd.from_arrow(t3), "value", top_ppm=500_000).take_all()
    assert (r3b["n_top"], r3b["top_mass"]) == (2, 500)

    # partition invariance on random data vs brute force
    rng = np.random.default_rng(4)
    v = np.round(rng.exponential(20, 5000), 2)
    t4 = pa.table({"value": pa.array(v, pa.float64())})
    c = np.round(v * 100).astype(np.int64)
    cs = np.sort(c)[::-1]
    n_top = (5000 * 10_000 + 999_999) // 1_000_000
    want = int(cs[:n_top].sum())
    for parts in (1, 8):
        (r4,) = top_share(
            rd.from_arrow(t4).repartition(parts), "value", top_ppm=10_000
        ).take_all()
        assert (r4["n_top"], r4["top_mass"], r4["total_mass"]) == (
            n_top, want, int(c.sum()),
        )

    with pytest.raises(ValueError, match="top_ppm"):
        top_share(rd.from_arrow(t4), "value", top_ppm=0)


def test_mann_whitney_exact_u(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import mann_whitney

    rng = np.random.default_rng(9)
    na, nb = 300, 450
    va = np.round(rng.normal(20, 5, na), 2)
    vb = np.round(rng.normal(22, 5, nb), 2)
    t = pa.table(
        {
            "side": pa.array([0] * na + [1] * nb, pa.int64()),
            "value": pa.array(np.concatenate((va, vb)), pa.float64()),
        }
    )
    ca = np.round(va * 100).astype(np.int64)
    cb = np.round(vb * 100).astype(np.int64)
    gt = sum(int((a > cb).sum()) for a in ca)
    eq = sum(int((a == cb).sum()) for a in ca)
    want = 2 * gt + eq
    for parts in (1, 6):
        (r,) = mann_whitney(
            rd.from_arrow(t).repartition(parts), "side", "value"
        ).take_all()
        assert (r["n_a"], r["n_b"], r["u2_a"]) == (na, nb, want)
    # complement identity and rank-biserial bounds
    assert 0 <= want <= 2 * na * nb
    # one side empty -> sentinel
    t2 = pa.table({"side": pa.array([0, 0], pa.int64()),
                   "value": pa.array([1.0, 2.0], pa.float64())})
    (r2,) = mann_whitney(rd.from_arrow(t2), "side", "value").take_all()
    assert r2["u2_a"] == -1
    bad = pa.table({"side": pa.array([2], pa.int64()),
                    "value": pa.array([1.0], pa.float64())})
    with pytest.raises(Exception, match="0/1"):
        mann_whitney(rd.from_arrow(bad), "side", "value").take_all()


def test_group_ks_drift_leaderboard(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import group_ks_drift

    rng = np.random.default_rng(19)
    # three sources: two share a distribution, one is shifted
    va = rng.integers(0, 50, 400)
    vb = rng.integers(0, 50, 500)
    vc = rng.integers(30, 80, 300)  # the drifted one
    g = ["a"] * 400 + ["b"] * 500 + ["c"] * 300
    v = np.concatenate((va, vb, vc)).astype(np.int64)
    t = pa.table({"source": pa.array(g), "n_chars": pa.array(v)})

    def brute(gname):
        m = np.array([x == gname for x in g])
        V = np.unique(v)
        cg = np.array([(v[m] <= x).sum() for x in V], dtype=np.int64)
        cr = np.array([(v[~m] <= x).sum() for x in V], dtype=np.int64)
        ng, mr = int(m.sum()), int((~m).sum())
        dv = np.abs(cg * mr - cr * ng)
        k = int(np.argmax(dv))
        return ng, int(dv[k]), int(V[k])

    for parts in (1, 5):
        got = {
            r["source"]: (r["n_g"], r["d_num"], r["at_value"])
            for r in group_ks_drift(
                rd.from_arrow(t).repartition(parts), "source", "n_chars"
            ).take_all()
        }
        assert got == {gn: brute(gn) for gn in ("a", "b", "c")}
    # the planted drifted source has the largest normalized D
    dnorm = {
        gn: got[gn][1] / (got[gn][0] * (1200 - got[gn][0])) for gn in got
    }
    assert max(dnorm, key=dnorm.get) == "c"

    # single-group corpus -> sentinel
    t2 = pa.table({"source": pa.array(["x", "x"]),
                   "n_chars": pa.array([1, 2], pa.int64())})
    (r2,) = group_ks_drift(rd.from_arrow(t2), "source", "n_chars").take_all()
    assert r2["d_num"] == -1


def test_table_profile_card(ray_session):
    import pyarrow as pa

    from fever_ray.ops.stats import table_profile

    t = pa.table(
        {
            "id": pa.array([3, 1, 2, None, 10], pa.int64()),
            "tag": pa.array(["b", None, "a", "a", None]),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(3)
    out = {
        r["column"]: r
        for r in table_profile(ds, ["id", "tag"]).to_pylist()
    }
    assert out["id"]["n_rows"] == 5 and out["id"]["n_null"] == 1
    assert out["id"]["n_distinct"] == 4
    # native-type extrema: int 10 > 3 even though '10' < '3' as strings
    assert (out["id"]["min_v"], out["id"]["max_v"]) == ("1", "10")
    assert out["tag"]["n_null"] == 2 and out["tag"]["n_distinct"] == 2
    assert (out["tag"]["min_v"], out["tag"]["max_v"]) == ("a", "b")
    with pytest.raises(ValueError):
        table_profile(ds, [])
    with pytest.raises(Exception, match="max_groups|groups"):
        # distinct cap must fail loudly, not OOM the combine
        table_profile(ds, ["id"], distinct_cap=2)


def test_cli_profile_card(ray_session, tmp_path, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fever_ray import cli as cli_mod

    t = pa.table(
        {
            "id": pa.array([1, 2, 2, None], pa.int64()),
            "s": pa.array(["x", "y", "y", "y"]),
        }
    )
    pq.write_table(t, tmp_path / "t.parquet")
    rc = cli_mod.main(["profile", "--input", str(tmp_path / "t.parquet")])
    assert rc == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    by = {r["column"]: r for r in lines}
    assert by["id"]["n_null"] == 1 and by["id"]["n_distinct"] == 2
    assert by["s"]["n_distinct"] == 2 and by["s"]["max_v"] == "y"


# ------------------------------------------------------------- change_point


def test_change_point_planted_shift(ray_session):
    """A rate shift from 1/hour to 20/hour at hour 50 must put the exact
    max-deviation bucket at (or immediately before) the shift, invariant
    under block layout; ties break to the smallest bucket."""
    import ray.data as rd

    from fever_ray.ops.stats import change_point

    hours = list(range(50)) + [h for h in range(50, 60) for _ in range(20)]
    ts = pa.array(
        [h * 3_600_000_000 + 7 for h in hours], pa.timestamp("us")
    )
    t = pa.table(
        {
            "event_type": pa.array(["a"] * len(hours), pa.string()),
            "ts": ts,
        }
    )
    out = change_point(rd.from_arrow(t).repartition(5)).to_pandas()
    assert len(out) == 1
    # brute force the same statistic
    b = np.array(hours)
    buckets, cnt = np.unique(b, return_counts=True)
    pfx = np.cumsum(cnt)
    m, tot = len(buckets), int(cnt.sum())
    dev = np.abs(m * pfx - np.arange(1, m + 1) * tot)
    best = int(buckets[int(np.argmax(dev))])
    assert int(out.cp_bucket[0]) == best == 49
    assert int(out.dev[0]) == int(dev.max())
    # partition invariance
    out2 = change_point(rd.from_arrow(t).repartition(13)).to_pandas()
    assert out.equals(out2)


def test_change_point_ties_and_nulls(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import change_point

    # two keys; key 'u' is perfectly uniform → every D_i except the last is
    # equal (D_m = 0 only when... compute brute force); null rows ignored
    t = pa.table(
        {
            "event_type": pa.array(["u", "u", "u", None, "v"], pa.string()),
            "ts": pa.array(
                [0, 3_600_000_000, 7_200_000_000, 0, None],
                pa.timestamp("us"),
            ),
        }
    )
    out = (
        change_point(rd.from_arrow(t))
        .to_pandas()
        .set_index("event_type")
    )
    # 'v' has only a null ts -> no series at all; 'u': m=3, T=3,
    # D = |3*1-1*3|, |3*2-2*3|, |3*3-3*3| = 0,0,0 -> tie -> smallest bucket
    assert list(out.index) == ["u"]
    assert int(out.loc["u", "cp_bucket"]) == 0 and int(out.loc["u", "dev"]) == 0


def test_change_point_validation(ray_session):
    import ray.data as rd

    from fever_ray.ops.stats import change_point

    ds = rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(["a"], pa.string()),
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
    )
    with pytest.raises(ValueError):
        change_point(ds, bucket_us=0)
