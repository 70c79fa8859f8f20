"""Sparse-mode HLL: equivalence with dense, promotion, serialization size,
grouped-build integration (the 10^12-group-key memory story)."""

import numpy as np

from fever_ray.core.udaf import SketchSpec
from fever_ray.core.grouped import grouped_estimates
from fever_ray.sketches import HyperLogLog


def _keys(n, prefix="k"):
    return [f"{prefix}-{i}" for i in range(n)]


def test_sparse_equals_dense_registers_and_estimate():
    for n in (5, 100, 3000, 20000):
        d = HyperLogLog.create(p=12)
        s = HyperLogLog.create(p=12, sparse=True)
        d.update(_keys(n))
        s.update(_keys(n))
        assert np.array_equal(s.dense_registers(), d.registers), n
        assert s.estimate() == d.estimate(), n


def test_sparse_promotes_to_dense():
    s = HyperLogLog.create(p=10, sparse=True)
    assert s.is_sparse
    s.update(_keys(5000))  # >> m/4 = 256 distinct registers
    assert not s.is_sparse


def test_sparse_blob_is_small_for_low_cardinality():
    s = HyperLogLog.create(p=14, sparse=True)
    s.update(_keys(20))
    blob = s.to_bytes()
    assert len(blob) < 200  # vs 16 KiB dense
    back = HyperLogLog.from_bytes(blob)
    assert back.is_sparse
    assert np.array_equal(back.sparse_idx, s.sparse_idx)
    assert np.array_equal(back.sparse_rho, s.sparse_rho)
    assert back.estimate() == s.estimate()


def test_mixed_merges_all_orders():
    dense = HyperLogLog.create(p=10)
    dense.update(_keys(500, "a"))
    sp1 = HyperLogLog.create(p=10, sparse=True)
    sp1.update(_keys(30, "b"))
    sp2 = HyperLogLog.create(p=10, sparse=True)
    sp2.update(_keys(40, "c"))

    ref = HyperLogLog.create(p=10)
    for pref, n in (("a", 500), ("b", 30), ("c", 40)):
        ref.update(_keys(n, pref))

    # dense ← sparse, sparse ← dense, sparse ← sparse
    m1 = HyperLogLog.from_bytes(dense.to_bytes())
    m1.merge(sp1).merge(sp2)
    assert np.array_equal(m1.dense_registers(), ref.registers)

    m2 = HyperLogLog.from_bytes(sp1.to_bytes())
    m2.merge(sp2)
    assert m2.is_sparse  # still small
    m2.merge(dense)
    assert np.array_equal(m2.dense_registers(), ref.registers)


def test_grouped_build_with_sparse_hll(ray_session, pages_dir):
    import duckdb
    import ray.data as rd

    ds = rd.read_parquet(pages_dir + "/", columns=["lang", "url"])
    dense_spec = SketchSpec("d", "hll", "url", {"p": 12})
    sparse_spec = SketchSpec("s", "hll", "url", {"p": 12, "sparse": True})
    out_d = grouped_estimates(ds, "lang", dense_spec, batch_size=256)
    out_s = grouped_estimates(ds, "lang", sparse_spec, batch_size=256)
    d = dict(zip(out_d.column("key").to_pylist(), out_d.column("estimate").to_pylist()))
    s = dict(zip(out_s.column("key").to_pylist(), out_s.column("estimate").to_pylist()))
    assert d == s  # identical estimates through the whole distributed path
