"""Theta/KMV sketch: distinct estimates, set algebra (∪ ∩ \\) vs exact,
merge-order bit-identity, deterministic bottom-k sampling, UDAF integration."""

import numpy as np
import pytest

from fever_ray.sketches.theta import ThetaSketch


def _keys(n, prefix="k"):
    return [f"{prefix}-{i}" for i in range(n)]


def test_exact_below_saturation():
    t = ThetaSketch.create(k=1024)
    t.update(_keys(500))
    t.update(_keys(500))  # duplicates
    assert t.estimate() == 500.0


@pytest.mark.parametrize("n", [10000, 100000])
def test_estimate_within_bound(n):
    t = ThetaSketch.create(k=4096)
    t.update(_keys(n))
    rse = 1.0 / np.sqrt(4096 - 1)
    assert abs(t.estimate() - n) <= 4 * rse * n, t.estimate()


def test_set_algebra_vs_exact():
    # A = 0..29999, B = 20000..49999 → |A∩B| = 10000, |A\B| = 20000, |A∪B| = 50000
    a = ThetaSketch.create(k=4096)
    b = ThetaSketch.create(k=4096)
    a.update([f"x-{i}" for i in range(30000)])
    b.update([f"x-{i}" for i in range(20000, 50000)])
    rse = 1.0 / np.sqrt(4095)
    assert abs(a.intersection_estimate(b) - 10000) <= 6 * rse * 50000
    assert abs(a.difference_estimate(b) - 20000) <= 6 * rse * 50000
    assert abs(a.union_estimate(b) - 50000) <= 4 * rse * 50000


def test_merge_bit_identical_any_order():
    parts = []
    for i in range(5):
        t = ThetaSketch.create(k=512)
        t.update(_keys(3000, prefix=f"p{i}"))
        parts.append(t.to_bytes())

    def merged(order):
        acc = ThetaSketch.create(k=512)
        for i in order:
            acc.merge(ThetaSketch.from_bytes(parts[i]))
        return acc

    m1, m2 = merged([0, 1, 2, 3, 4]), merged([4, 2, 0, 3, 1])
    assert np.array_equal(m1.values, m2.values)
    assert abs(m1.estimate() - 15000) <= 4 / np.sqrt(511) * 15000


def test_bottom_k_sample_deterministic_and_uniform_ish():
    t1 = ThetaSketch.create(k=256, keep_keys=True)
    t2 = ThetaSketch.create(k=256, keep_keys=True)
    keys = _keys(10000)
    t1.update(keys)
    for chunk in np.array_split(np.array(keys, dtype=object), 7):
        t2.update(list(chunk))
    # same sample regardless of ingestion chunking (merge-invariance)
    assert t1.sample_keys() == t2.sample_keys()
    assert len(t1.sample_keys()) == 256
    # sample round-trips serialization
    t3 = ThetaSketch.from_bytes(t1.to_bytes())
    assert t3.sample_keys() == t1.sample_keys()


def test_roundtrip_without_keys():
    t = ThetaSketch.create(k=64)
    t.update(_keys(1000))
    back = ThetaSketch.from_bytes(t.to_bytes())
    assert np.array_equal(back.values, t.values)
    assert back.keys is None
    assert back.estimate() == t.estimate()


def test_theta_in_udaf_driver(ray_session, pages_dir):
    import duckdb
    import ray.data as rd

    from fever_ray.core.udaf import SketchSpec, build_sketches

    ds = rd.read_parquet(pages_dir + "/", columns=["url"])
    sk = build_sketches(
        ds, [SketchSpec("theta_urls", "theta", "url", {"k": 1024})], batch_size=256
    )
    est = sk["theta_urls"].estimate()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT COUNT(DISTINCT url) FROM parquet_scan('{pages_dir}/*.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) <= 4 / np.sqrt(1023) * exact + 2
