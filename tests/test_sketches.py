"""HLL / CMS / t-digest / KLL: error bounds vs exact oracles, merge-order
invariance, serialization round-trips (FIXTURES.md F3/F4)."""

import numpy as np
import pytest

from fever_ray.sketches import CountMin, HyperLogLog, KLL, TDigest


# ---------------------------------------------------------------- HLL
def _hll_keys(n, seed=0):
    return [f"u{seed}-{i}" for i in range(n)]


@pytest.mark.parametrize("n", [100, 5000, 200000])
def test_hll_within_3sigma(n):
    h = HyperLogLog.create(p=14)
    h.update(_hll_keys(n))
    est = h.estimate()
    bound = 3 * 1.04 / np.sqrt(h.m)
    assert abs(est - n) <= max(bound * n, 1.0), (est, n)


def test_hll_duplicates_dont_count():
    h = HyperLogLog.create(p=12)
    keys = _hll_keys(1000)
    for _ in range(5):
        h.update(keys)
    assert abs(h.estimate() - 1000) <= 3 * 1.04 / np.sqrt(h.m) * 1000 + 1


def test_hll_merge_bit_identical_any_order():
    parts = []
    for i in range(5):
        h = HyperLogLog.create(p=12)
        h.update(_hll_keys(2000, seed=i))
        parts.append(h.to_bytes())

    def merged(order):
        acc = HyperLogLog.create(p=12)
        for i in order:
            acc.merge(HyperLogLog.from_bytes(parts[i]))
        return acc

    a = merged([0, 1, 2, 3, 4])
    b = merged([4, 2, 0, 3, 1])
    assert np.array_equal(a.registers, b.registers)
    # merged estimate ≈ union cardinality (all disjoint → 10000)
    assert abs(a.estimate() - 10000) <= 3 * 1.04 / np.sqrt(a.m) * 10000


def test_hll_int_updates_match_distinct():
    h = HyperLogLog.create(p=14)
    vals = np.arange(50000) % 7000
    h.update_ints(vals)
    assert abs(h.estimate() - 7000) <= 3 * 1.04 / np.sqrt(h.m) * 7000


def test_hll_roundtrip():
    h = HyperLogLog.create(p=10)
    h.update(_hll_keys(500))
    back = HyperLogLog.from_bytes(h.to_bytes())
    assert back.p == 10 and np.array_equal(back.registers, h.registers)


# ---------------------------------------------------------------- CMS
def test_cms_never_undercounts_and_bounded_overcount():
    rng = np.random.default_rng(3)
    zipf = rng.zipf(1.3, size=50000)
    keys = [f"host{z}" for z in zipf]
    cms = CountMin.create(width=2048, depth=5)
    cms.update(keys, track=True)
    uniq, exact = np.unique(keys, return_counts=True)
    est = cms.query(list(uniq))
    assert (est.astype(np.int64) >= exact).all()
    # ε = e/width; allow the full ε·N overcount bound
    eps_n = np.e / 2048 * len(keys)
    frac_ok = np.mean(est.astype(np.int64) - exact <= eps_n)
    assert frac_ok >= 1 - np.exp(-5) * 10  # w.h.p. bound with slack


def test_cms_weighted_updates_and_total():
    cms = CountMin.create(width=512, depth=4)
    cms.update(["a", "b"], counts=[10, 5])
    cms.update(["a"], counts=[7])
    assert cms.query_one("a") >= 17
    assert cms.total == 22


def test_cms_merge_bit_identical_and_topk():
    parts = []
    for i in range(4):
        c = CountMin.create(width=1024, depth=5)
        c.update([f"k{j}" for j in range(20) for _ in range(j + 1)], track=True)
        parts.append(c.to_bytes())

    def merged(order):
        acc = CountMin.create(width=1024, depth=5)
        for i in order:
            acc.merge(CountMin.from_bytes(parts[i]))
        return acc

    a, b = merged([0, 1, 2, 3]), merged([2, 3, 0, 1])
    assert np.array_equal(a.table, b.table)
    assert a.total == b.total
    top = a.top_k(3)
    assert [t[0] for t in top] == ["k19", "k18", "k17"]
    assert top[0][1] >= 4 * 20


def test_cms_roundtrip():
    c = CountMin.create(width=256, depth=3)
    c.update(["x", "y", "x"], track=True)
    back = CountMin.from_bytes(c.to_bytes())
    assert np.array_equal(back.table, c.table)
    assert back.total == 3 and set(back.candidates) == {"x", "y"}


# ---------------------------------------------------------------- quantiles
QS = [0.01, 0.25, 0.5, 0.75, 0.99]


def _rank_error(sketch_vals, data, qs):
    data_sorted = np.sort(data)
    errs = []
    for q, v in zip(qs, sketch_vals):
        true_rank = np.searchsorted(data_sorted, v, side="right") / len(data_sorted)
        errs.append(abs(true_rank - q))
    return max(errs)


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "bimodal"])
def test_tdigest_rank_error(dist):
    rng = np.random.default_rng(11)
    if dist == "lognormal":
        data = rng.lognormal(8, 1.5, size=100000)
    elif dist == "uniform":
        data = rng.uniform(0, 1, size=100000)
    else:
        data = np.concatenate([rng.normal(0, 1, 50000), rng.normal(100, 1, 50000)])
    td = TDigest.create(delta=100)
    for chunk in np.array_split(data, 20):
        td.update(chunk)
    err = _rank_error(td.quantiles(QS), data, QS)
    assert err < 0.02, err


def test_tdigest_merge_within_bound():
    rng = np.random.default_rng(5)
    data = rng.lognormal(8, 1.5, size=60000)
    chunks = np.array_split(data, 6)
    parts = []
    for ch in chunks:
        td = TDigest.create(delta=100)
        td.update(ch)
        parts.append(td.to_bytes())

    def merged(order):
        acc = TDigest.create(delta=100)
        for i in order:
            acc.merge(TDigest.from_bytes(parts[i]))
        return acc

    for order in ([0, 1, 2, 3, 4, 5], [5, 3, 1, 0, 2, 4]):
        err = _rank_error(merged(order).quantiles(QS), data, QS)
        assert err < 0.03, (order, err)


def test_tdigest_extremes_and_roundtrip():
    td = TDigest.create()
    td.update([5.0, 1.0, 9.0])
    assert td.quantile(0.0) == 1.0 and td.quantile(1.0) == 9.0
    back = TDigest.from_bytes(td.to_bytes())
    assert back.quantile(0.5) == td.quantile(0.5)


def test_kll_rank_error():
    rng = np.random.default_rng(13)
    data = rng.lognormal(8, 1.5, size=100000)
    kll = KLL.create(k=200)
    for chunk in np.array_split(data, 25):
        kll.update(chunk)
    err = _rank_error(kll.quantiles(QS), data, QS)
    assert err < 2.296 / 200 + 0.005, err


def test_kll_merge_within_bound_any_order():
    rng = np.random.default_rng(17)
    data = rng.normal(0, 10, size=80000)
    chunks = np.array_split(data, 8)
    parts = []
    for i, ch in enumerate(chunks):
        k = KLL.create(k=200, seed=100 + i)
        k.update(ch)
        parts.append(k.to_bytes())

    def merged(order):
        acc = KLL.create(k=200)
        for i in order:
            acc.merge(KLL.from_bytes(parts[i]))
        return acc

    for order in ([0, 1, 2, 3, 4, 5, 6, 7], [7, 2, 5, 0, 6, 1, 4, 3]):
        err = _rank_error(merged(order).quantiles(QS), data, QS)
        assert err < 0.025, (order, err)


def test_kll_nan_skipped_and_roundtrip():
    k = KLL.create(k=50)
    k.update([1.0, np.nan, 3.0])
    assert k.n == 2
    back = KLL.from_bytes(k.to_bytes())
    assert back.n == 2 and back.quantile(1.0) == 3.0


def test_cms_conservative_update_tightens_overcount():
    rng = np.random.default_rng(9)
    zipf = rng.zipf(1.2, size=30000)
    keys = [f"h{z}" for z in zipf]
    plain = CountMin.create(width=256, depth=4)
    cons = CountMin.create(width=256, depth=4)
    for chunk in np.array_split(np.array(keys, dtype=object), 10):
        plain.update(list(chunk))
        cons.update(list(chunk), conservative=True)
    uniq, exact = np.unique(keys, return_counts=True)
    e_plain = plain.query(list(uniq)).astype(np.int64)
    e_cons = cons.query(list(uniq)).astype(np.int64)
    # both never undercount; conservative strictly tightens total overcount
    assert (e_plain >= exact).all()
    assert (e_cons >= exact).all()
    over_plain = int((e_plain - exact).sum())
    over_cons = int((e_cons - exact).sum())
    assert over_cons < over_plain, (over_cons, over_plain)
    assert cons.total == plain.total == len(keys)


def test_cms_conservative_partials_merge_additively_and_never_undercount():
    rng = np.random.default_rng(4)
    keys = [f"k{v}" for v in rng.integers(0, 50, 20000)]
    merged = CountMin.create(width=128, depth=4)
    for chunk in np.array_split(np.array(keys, dtype=object), 6):
        part = CountMin.create(width=128, depth=4)
        part.update(list(chunk), conservative=True)
        merged.merge(part)
    uniq, exact = np.unique(keys, return_counts=True)
    est = merged.query(list(uniq)).astype(np.int64)
    assert (est >= exact).all()
    assert merged.total == len(keys)


def test_cms_conservative_update_int_and_bytes_keys():
    """Conservative updates must land in the SAME counters query() reads:
    int ndarrays hash via hash64_ints, bytes without str coercion (the str
    round-trip previously zeroed every int-key conservative estimate)."""
    from fever_ray.sketches.cms import CountMin

    cms = CountMin.create(width=512, depth=4)
    keys = np.array([7, 7, 42, 1000], dtype=np.int64)
    cms.update(keys, conservative=True)
    est = cms.query(keys)
    assert est[0] >= 2 and est[1] >= 2  # duplicate aggregated
    assert est[2] >= 1 and est[3] >= 1

    cms2 = CountMin.create(width=512, depth=4)
    bkeys = [b"\xff\xfe-not-utf8", b"plain"]
    cms2.update(bkeys, conservative=True)  # must not raise UnicodeDecodeError
    assert (cms2.query(bkeys) >= 1).all()


def test_tdigest_nan_values_with_weights():
    """The NaN mask must apply to values AND caller weights together."""
    from fever_ray.sketches.tdigest import TDigest

    td = TDigest.create(delta=50)
    vals = np.array([1.0, np.nan, 3.0, np.nan, 5.0])
    w = np.array([1.0, 99.0, 1.0, 99.0, 1.0])
    td.update(vals, weights=w)
    td._flush()
    # NaN rows (and their big weights) dropped as a pair: total weight == 3
    assert td.total == pytest.approx(3.0)
    assert td.quantile(0.5) == pytest.approx(3.0, abs=2.0)


def test_theta_merge_keyless_drops_key_tracking():
    """Merging a keyless sketch into a keyed one must not desynchronize
    values/keys — key tracking is dropped instead."""
    from fever_ray.sketches.theta import ThetaSketch

    keyed = ThetaSketch.create(k=64, keep_keys=True)
    keyed.update(["a", "b", "c"])
    keyless = ThetaSketch.create(k=64)
    keyless.update(["d", "e"])
    keyed.merge(keyless)
    assert keyed.keys is None
    assert keyed.estimate() == pytest.approx(5.0)


def _fd_spectral_err(A, sk):
    return float(np.linalg.eigvalsh(A.T @ A - sk.cov()).max())


def test_fd_error_bound_and_psd():
    from fever_ray.sketches.fd import FrequentDirections

    rng = np.random.default_rng(7)
    # planted low-rank + noise: the regime FD is for
    A = rng.normal(size=(2000, 48)) @ np.diag(
        np.concatenate([np.full(4, 8.0), np.full(44, 0.3)])
    )
    sk = FrequentDirections.create(l=12, d=48)
    for i in range(0, len(A), 256):
        sk.update(A[i : i + 256])
    assert sk.n <= 24
    ev = np.linalg.eigvalsh(A.T @ A - sk.cov())
    assert ev.min() >= -1e-6 * sk.fnorm_sq        # AtA - BtB is PSD
    assert ev.max() <= sk.error_bound() + 1e-9    # published 2||A||_F^2 / l
    assert np.trace(sk.cov()) <= np.trace(A.T @ A) * (1 + 1e-12)


def test_fd_merge_preserves_bound_and_mass():
    from fever_ray.sketches.fd import FrequentDirections

    rng = np.random.default_rng(11)
    A = rng.normal(size=(1500, 32))
    whole = FrequentDirections.create(l=10, d=32)
    whole.update(A)
    # any split/merge order keeps the SAME published bound over total mass
    for splits, seed in [(3, 0), (7, 1), (11, 2)]:
        parts = np.array_split(A, splits)
        order = np.random.default_rng(seed).permutation(splits)
        acc = FrequentDirections.create(l=10, d=32)
        for j in order:
            p = FrequentDirections.create(l=10, d=32)
            p.update(parts[j])
            acc.merge(p)
        assert acc.fnorm_sq == pytest.approx(whole.fnorm_sq)
        assert _fd_spectral_err(A, acc) <= acc.error_bound()


def test_fd_low_rank_is_near_exact():
    from fever_ray.sketches.fd import FrequentDirections

    rng = np.random.default_rng(3)
    # rank-3 stream with sketch size 8: shrink never destroys signal mass
    A = rng.normal(size=(400, 3)) @ rng.normal(size=(3, 20))
    sk = FrequentDirections.create(l=8, d=20)
    sk.update(A)
    exact = A.T @ A
    assert np.abs(exact - sk.cov()).max() <= 1e-6 * np.abs(exact).max()


def test_fd_serialization_roundtrip_and_validation():
    from fever_ray.sketches.fd import FrequentDirections

    rng = np.random.default_rng(5)
    sk = FrequentDirections.create(l=6, d=9)
    sk.update(rng.normal(size=(100, 9)))
    back = FrequentDirections.from_bytes(sk.to_bytes())
    assert (back.l, back.d, back.n, back.fnorm_sq) == (
        sk.l, sk.d, sk.n, sk.fnorm_sq
    )
    np.testing.assert_array_equal(back.buf[: back.n], sk.buf[: sk.n])
    pd_ = sk.principal_directions(2)
    assert pd_.shape == (2, 9)
    with pytest.raises(ValueError):
        FrequentDirections.create(l=1, d=4)
    with pytest.raises(ValueError):
        sk.update(rng.normal(size=(5, 4)))       # wrong width
    with pytest.raises(ValueError):
        sk.merge(FrequentDirections.create(l=6, d=4))
    with pytest.raises(ValueError):
        FrequentDirections.from_bytes(b"nope" + b"\0" * 40)


def test_ams_f2_within_published_bound():
    from fever_ray.sketches.ams import AMSSketch

    rng = np.random.default_rng(13)
    keys = (rng.zipf(1.3, size=100_000) % 3000).astype(np.int64)
    sk = AMSSketch.create(r=7, b=1024, seed=0)
    sk.update_ints(keys)
    c = np.bincount(keys).astype(np.float64)
    f2 = float((c * c).sum())
    assert abs(sk.estimate_f2() - f2) <= sk.rel_error_bound() * f2
    assert sk.n == len(keys)


def test_ams_merge_is_bit_identical_and_weighted():
    from fever_ray.sketches.ams import AMSSketch

    rng = np.random.default_rng(19)
    keys = rng.integers(0, 500, size=20_000)
    whole = AMSSketch.create(r=5, b=256, seed=3)
    whole.update_ints(keys)
    for splits in (2, 7):
        acc = AMSSketch.create(r=5, b=256, seed=3)
        for part in np.array_split(keys, splits):
            p = AMSSketch.create(r=5, b=256, seed=3)
            p.update_ints(part)
            acc.merge(p)
        np.testing.assert_array_equal(acc.counters, whole.counters)
    # weight w == w repeats, exactly
    wsk = AMSSketch.create(r=5, b=256, seed=3)
    wsk.update_ints(np.array([7, 9]), weights=np.array([3, 2]))
    rsk = AMSSketch.create(r=5, b=256, seed=3)
    rsk.update_ints(np.array([7, 7, 7, 9, 9]))
    np.testing.assert_array_equal(wsk.counters, rsk.counters)
    # string path works too
    ssk = AMSSketch.create(r=5, b=256, seed=3)
    ssk.update(["a", "b", "a"])
    assert ssk.n == 3


def test_ams_countsketch_point_estimates_within_bound():
    """Charikar point queries: odd-r median is exact int64, every key's
    estimate lands within the √(8·F₂/b) lane bound, and a merged sketch
    answers bit-identically to the whole-stream sketch."""
    from fever_ray.sketches.ams import AMSSketch

    rng = np.random.default_rng(23)
    keys = (rng.zipf(1.4, size=80_000) % 2000).astype(np.int64)
    sk = AMSSketch.create(r=7, b=1024, seed=0)
    sk.update_ints(keys)
    exact = np.bincount(keys, minlength=2000).astype(np.int64)
    probe = np.arange(2000, dtype=np.int64)
    est = sk.query_ints(probe)
    assert est.dtype == np.int64  # odd r → exact lane value
    f2 = float((exact.astype(np.float64) ** 2).sum())
    assert np.abs(est - exact).max() <= sk.point_error_bound(f2)
    # heavy keys recover well; unbiased two-sided errors stay small
    top = np.argsort(-exact)[:20]
    assert np.abs(est[top] - exact[top]).max() <= sk.point_error_bound(f2)
    # merge invariance: split stream → identical point answers
    acc = AMSSketch.create(r=7, b=1024, seed=0)
    for part in np.array_split(keys, 5):
        p = AMSSketch.create(r=7, b=1024, seed=0)
        p.update_ints(part)
        acc.merge(p)
    np.testing.assert_array_equal(acc.query_ints(probe), est)
    # string path agrees with its own ingest; even r → float midpoint
    ssk = AMSSketch.create(r=4, b=256, seed=1)
    ssk.update(["x"] * 50 + ["y"] * 3)
    sest = ssk.query(["x", "y", "zz"])
    assert sest.dtype == np.float64
    assert abs(sest[0] - 50) <= ssk.point_error_bound(50 * 50 + 9)


def test_ams_roundtrip_and_validation():
    from fever_ray.sketches.ams import AMSSketch

    sk = AMSSketch.create(r=3, b=64, seed=1)
    sk.update_ints(np.arange(1000) % 37)
    back = AMSSketch.from_bytes(sk.to_bytes())
    assert (back.r, back.b, back.seed, back.n) == (sk.r, sk.b, sk.seed, sk.n)
    np.testing.assert_array_equal(back.counters, sk.counters)
    with pytest.raises(ValueError):
        AMSSketch.create(r=0, b=64)
    with pytest.raises(ValueError):
        AMSSketch.create(r=3, b=100)        # not a power of two
    with pytest.raises(ValueError):
        sk.merge(AMSSketch.create(r=3, b=128, seed=1))
    with pytest.raises(ValueError):
        AMSSketch.from_bytes(b"nope" + b"\0" * 40)


def test_mg_deterministic_guarantee_under_shrink_and_merge():
    """Heavy skew + k far below the key domain: every key with
    f > n/(k+1) must survive with residual in [f - n/(k+1), f], under
    any partitioning/merge order (PODS'12 mergeability)."""
    from fever_ray.sketches.mg import MisraGries

    rng = np.random.default_rng(41)
    # 2000-key domain, heavy head
    keys = np.array([f"k{int(v) % 2000}" for v in rng.zipf(1.2, 80_000)])
    exact = {}
    for key in keys.tolist():
        exact[key] = exact.get(key, 0) + 1
    for splits, seed in [(1, 0), (9, 1), (40, 2)]:
        acc = MisraGries.create(k=24)
        parts = np.array_split(keys, splits)
        for j in np.random.default_rng(seed).permutation(splits):
            p = MisraGries.create(k=24)
            p.update(parts[j])
            acc.merge(p)
        assert acc.n == len(keys)
        assert len(acc.counts) <= 24
        bound = acc.error_bound()
        cand = acc.candidates()
        for key, f in exact.items():
            if f > bound:
                assert key in cand
                assert cand[key] <= f <= cand[key] + bound
            if key in cand:
                assert cand[key] <= f          # never overcounts


def test_mg_weighted_equals_repeats_and_topk_order():
    from fever_ray.sketches.mg import MisraGries

    a = MisraGries.create(k=8)
    a.update(["x", "y"], weights=[5, 2])
    b = MisraGries.create(k=8)
    b.update(["x"] * 5 + ["y"] * 2)
    assert a.counts == b.counts and a.n == b.n
    assert a.top_k(2) == [("x", 5), ("y", 2)]
    with pytest.raises(ValueError):
        a.update(["z"], weights=[0])
    with pytest.raises(ValueError):
        a.merge(MisraGries.create(k=9))
    with pytest.raises(ValueError):
        MisraGries.create(k=0)


def test_mg_serialization_roundtrip():
    from fever_ray.sketches.mg import MisraGries

    sk = MisraGries.create(k=4)
    sk.update(["a", "b", "a", "c", "d", "e", "a", "b"] * 10)
    back = MisraGries.from_bytes(sk.to_bytes())
    assert back.counts == sk.counts
    assert (back.k, back.n, back.decremented) == (sk.k, sk.n, sk.decremented)
    with pytest.raises(ValueError):
        MisraGries.from_bytes(b"nope" + b"\0" * 40)


def test_mg_serialization_hostile_keys():
    """Keys containing NUL bytes and the empty-string key (null text
    tokenizes to '') must survive the partial roundtrip exactly — a
    separator-joined encoding silently corrupted both."""
    from fever_ray.sketches.mg import MisraGries

    sk = MisraGries.create(k=8)
    sk.update(["a\x00b", "c", "", "", "a\x00b"])
    back = MisraGries.from_bytes(sk.to_bytes())
    assert back.counts == {"a\x00b": 2, "c": 1, "": 2}
    # bytes and str ingestion of the same logical key share one counter
    sk2 = MisraGries.create(k=8)
    sk2.update([b"host.example"])
    sk2.update(["host.example"])
    assert sk2.counts == {"host.example": 2}


def test_ams_weighted_n_is_stream_mass():
    from fever_ray.sketches.ams import AMSSketch

    a = AMSSketch.create(r=3, b=64, seed=0)
    a.update_ints(np.array([7, 9]), weights=np.array([3, 2]))
    b = AMSSketch.create(r=3, b=64, seed=0)
    b.update_ints(np.array([7, 7, 7, 9, 9]))
    assert a.n == b.n == 5
    np.testing.assert_array_equal(a.counters, b.counters)


def test_fd_empty_and_allnull_batches_are_noops():
    from fever_ray.sketches.fd import FrequentDirections

    sk = FrequentDirections.create(l=4, d=8)
    sk.update(np.zeros((0, 8)))
    sk.update(np.zeros((0, 0)))  # the shape _column_values fabricates
    assert sk.n == 0 and sk.fnorm_sq == 0.0
    rng = np.random.default_rng(0)
    m = rng.normal(size=(10, 8))
    sk.update(m)
    assert 0 < sk.n <= 8  # buffer-fill count, post-shrink
    assert sk.fnorm_sq == pytest.approx(float((m * m).sum()))


def test_udaf_finalize_covers_new_kinds():
    from fever_ray.core.udaf import SketchSpec, finalize
    from fever_ray.sketches.ams import AMSSketch
    from fever_ray.sketches.fd import FrequentDirections
    from fever_ray.sketches.mg import MisraGries

    fd = FrequentDirections.create(l=4, d=8)
    fd.update(np.ones((5, 8)))
    out = finalize(fd, SketchSpec("x", "fd", "c"))
    assert out["fnorm_sq"] == 40.0 and out["spectral_err_bound"] == 20.0
    ams = AMSSketch.create(r=3, b=64)
    ams.update_ints(np.array([1, 1, 2]))
    out = finalize(ams, SketchSpec("x", "ams", "c"))
    assert out["n"] == 3 and out["f2_estimate"] >= 0
    mg = MisraGries.create(k=4)
    mg.update(["a", "a", "b"])
    out = finalize(mg, SketchSpec("x", "mg", "c"))
    assert out["top_k"][0] == ("a", 2) and out["n"] == 3


# ---------------------------------------------------------------- REQ
def _tail_rank_err(sk, data, qs):
    """max distance from q to the estimate's rank INTERVAL, / (1-q).

    A repeated value occupies a rank interval [lo, hi]; any rank inside it
    is attributable to the value itself, not to sketch error (the same
    convention as ops.stats.exact_rank_of in the driver gate)."""
    srt = np.sort(data)
    worst = 0.0
    for q in qs:
        est = sk.quantile(q)
        lo = np.searchsorted(srt, est, side="left") / len(data)
        hi = np.searchsorted(srt, est, side="right") / len(data)
        dist = max(q - hi, lo - q, 0.0)
        worst = max(worst, dist / (1.0 - q))
    return worst


def test_req_exact_below_capacity():
    from fever_ray.sketches.req import REQ

    sk = REQ.create(k=32)
    vals = np.arange(100, dtype=np.float64)
    sk.update(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert sk.quantile(q) in vals
    assert sk.quantile(0.0) == 0.0 and sk.quantile(1.0) == 99.0
    # exact ranks while nothing has been compacted
    assert sk.rank(49.0) == pytest.approx(0.5)


@pytest.mark.parametrize("dist", ["lognormal", "zipf_heavy"])
def test_req_tail_relative_error(dist):
    from fever_ray.sketches.req import REQ

    rng = np.random.default_rng(29)
    if dist == "lognormal":
        data = rng.lognormal(3.0, 2.0, 300000)
    else:
        # heavy discrete head + extreme sparse tail (adversarial for
        # additive-error sketches: the tail is 0.1% of the mass)
        data = np.concatenate(
            [np.repeat(1.0, 299000), rng.pareto(0.5, 1000) * 1e6]
        )
        rng.shuffle(data)
    sk = REQ.create(k=32)
    for chunk in np.array_split(data, 37):
        sk.update(chunk)
    qs = (0.99, 0.999, 0.9999)
    err = _tail_rank_err(sk, data, qs)
    assert err <= 4.0 / 32, err  # the module's documented envelope


def test_req_merge_within_bound_any_order():
    from fever_ray.sketches.req import REQ

    rng = np.random.default_rng(31)
    data = rng.lognormal(5.0, 1.5, 240000)
    chunks = np.array_split(data, 12)
    parts = []
    for i, ch in enumerate(chunks):
        p = REQ.create(k=32, seed=500 + i)
        p.update(ch)
        parts.append(p.to_bytes())

    from fever_ray.sketches.req import REQ as R

    def merged(order):
        acc = R.create(k=32)
        for i in order:
            acc.merge(R.from_bytes(parts[i]))
        return acc

    for order in (list(range(12)), [11, 3, 7, 0, 9, 5, 2, 10, 1, 8, 4, 6]):
        m = merged(order)
        assert m.n == len(data)
        assert _tail_rank_err(m, data, (0.99, 0.999)) <= 4.0 / 32, order


def test_req_beats_kll_deep_in_the_tail():
    """The reason REQ exists: at q=0.9999 the additive-KLL envelope is
    ~110x wider than the observed REQ error at comparable size."""
    from fever_ray.sketches.req import REQ

    rng = np.random.default_rng(37)
    data = rng.lognormal(0.0, 3.0, 400000)
    sk = REQ.create(k=32)
    sk.update(data)
    q = 0.9999
    srt = np.sort(data)
    r = np.searchsorted(srt, sk.quantile(q), side="right") / len(data)
    # REQ's observed error at the deep tail stays below 0.3·(1-q);
    # KLL k=200's GUARANTEE is only 2.296/200 ≈ 115·(1-q) here
    assert abs(r - q) <= 0.3 * (1 - q)


def test_req_nan_update_after_merge_roundtrip():
    from fever_ray.sketches.req import REQ

    a = REQ.create(k=16)
    a.update([1.0, np.nan, 3.0])
    assert a.n == 2
    b = REQ.create(k=16)
    b.update(np.arange(1000, dtype=np.float64))
    a.merge(b)
    a.update([5000.0])  # updates remain legal after a merge
    assert a.n == 1003 and a.max_val == 5000.0
    back = REQ.from_bytes(a.to_bytes())
    assert back.n == a.n
    assert back.quantile(0.5) == a.quantile(0.5)
    assert back.quantile(1.0) == 5000.0
    with pytest.raises(ValueError):
        back.merge(REQ.create(k=32))
    with pytest.raises(ValueError):
        REQ.from_bytes(b"XXXX" + a.to_bytes()[4:])


def test_req_compactor_growth_is_sublinear():
    """Capacity grows O(sqrt(log n)) per level — the sketch stays KB-sized
    while n grows 100x (the property that makes partials cheap to ship)."""
    from fever_ray.sketches.req import REQ

    rng = np.random.default_rng(41)
    small, big = REQ.create(k=32), REQ.create(k=32)
    small.update(rng.normal(0, 1, 10000))
    big.update(rng.normal(0, 1, 1000000))
    assert len(big.to_bytes()) < 12 * len(small.to_bytes())
    assert len(big.to_bytes()) < 64 * 1024


# ---------------------------------------------------------------- DDSketch
@pytest.mark.parametrize("dist", ["lognormal", "uniform_wide"])
def test_dd_value_relative_error_bound(dist):
    """VLDB 2019 guarantee: |est - exact order statistic| <= alpha * exact,
    for every quantile (value-relative, not rank-relative)."""
    from fever_ray.sketches.dd import DDSketch

    rng = np.random.default_rng(43)
    if dist == "lognormal":
        data = rng.lognormal(4.0, 2.5, 200000)
    else:
        data = rng.uniform(1e-3, 1e9, 200000)
    sk = DDSketch.create(alpha=0.01)
    for chunk in np.array_split(data, 23):
        sk.update(chunk)
    srt = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        est = sk.quantile(q)
        exact = srt[int(q * (len(data) - 1))]
        assert abs(est - exact) <= 0.01 * abs(exact) * (1 + 1e-9), q


def test_dd_merge_bit_identical_any_order():
    """The property no other quantile sketch in the registry has: merge is
    integer bucket addition, so EVERY merge order yields the same bytes AND
    equals the single-pass build — true merge-order invariance."""
    from fever_ray.sketches.dd import DDSketch

    rng = np.random.default_rng(47)
    data = np.concatenate(
        [rng.lognormal(3, 2, 90000), np.zeros(700), -rng.lognormal(1, 1, 4000)]
    )
    rng.shuffle(data)
    single = DDSketch.create(alpha=0.02)
    single.update(data)
    parts = []
    for ch in np.array_split(data, 9):
        p = DDSketch.create(alpha=0.02)
        p.update(ch)
        parts.append(p.to_bytes())

    def merged(order):
        acc = DDSketch.create(alpha=0.02)
        for i in order:
            acc.merge(DDSketch.from_bytes(parts[i]))
        return acc.to_bytes()

    fwd = merged(list(range(9)))
    assert fwd == merged([8, 2, 5, 0, 7, 3, 1, 6, 4])
    assert fwd == single.to_bytes()


def test_dd_zero_negative_and_nan_handling():
    from fever_ray.sketches.dd import DDSketch

    sk = DDSketch.create(alpha=0.01)
    sk.update([-100.0, -1.0, 0.0, 0.0, np.nan, 1.0, 100.0])
    assert sk.n == 6 and sk.zero_count == 2
    assert sk.quantile(0.0) == pytest.approx(-100.0, rel=0.01)
    # ranks 2 and 3 of 6 are the zeros
    assert sk.quantile(0.45) == 0.0
    assert sk.quantile(1.0) == pytest.approx(100.0, rel=0.01)
    med = sk.quantile(0.5)
    assert med == 0.0 or med == pytest.approx(1.0, rel=0.01)


def test_dd_collapse_bounds_store_and_keeps_upper_quantiles():
    from fever_ray.sketches.dd import DDSketch

    rng = np.random.default_rng(53)
    data = rng.lognormal(0.0, 2.0, 150000)  # ~450 natural buckets at alpha=.02
    sk = DDSketch.create(alpha=0.02, max_bins=256)
    for ch in np.array_split(data, 11):
        sk.update(ch)
    assert sk.collapsed and sk.num_bins <= 256
    assert sk.n == len(data)
    srt = np.sort(data)
    # quantiles ABOVE the collapse boundary keep the full guarantee; the
    # boundary here lands near q~0.25, so the median and tail survive
    for q in (0.5, 0.9, 0.99):
        exact = srt[int(q * (len(data) - 1))]
        assert abs(sk.quantile(q) - exact) <= 0.02 * exact * (1 + 1e-9)


def test_dd_roundtrip_and_alpha_mismatch():
    from fever_ray.sketches.dd import DDSketch

    sk = DDSketch.create(alpha=0.01)
    sk.update(np.arange(1, 5000, dtype=np.float64))
    back = DDSketch.from_bytes(sk.to_bytes())
    assert back.to_bytes() == sk.to_bytes()
    assert back.quantile(0.5) == sk.quantile(0.5)
    with pytest.raises(ValueError):
        back.merge(DDSketch.create(alpha=0.05))
    with pytest.raises(ValueError):
        DDSketch.from_bytes(b"XXXX" + sk.to_bytes()[4:])
    with pytest.raises(ValueError):
        DDSketch.create(alpha=1.5)
    assert np.isnan(DDSketch.create().quantile(0.5))


def test_dd_weighted_equals_repeats_bit_identical():
    """update_weighted(v, w) must produce the same BYTES as updating each
    value w times — including zero/negative values, zero weights (no-ops)
    and NaNs (dropped with their weights)."""
    from fever_ray.sketches.dd import DDSketch

    rng = np.random.default_rng(61)
    vals = np.concatenate(
        [rng.lognormal(3, 2, 500), [0.0, -4.5, np.nan], rng.uniform(-10, 10, 50)]
    )
    w = rng.integers(0, 9, size=len(vals)).astype(np.int64)
    a = DDSketch.create(alpha=0.01)
    a.update_weighted(vals, w)
    b = DDSketch.create(alpha=0.01)
    keep = ~np.isnan(vals)
    b.update(np.repeat(vals[keep], w[keep]))
    assert a.to_bytes() == b.to_bytes()
    assert a.n == int(w[keep].sum())
    with pytest.raises(ValueError):
        a.update_weighted([1.0, 2.0], [1])
    with pytest.raises(ValueError):
        a.update_weighted([1.0], [-1])


def test_dd_store_size_is_log_of_dynamic_range():
    """Store size tracks log(max/min)/log(gamma), independent of n — the
    KB-scale-partials property (VLDB 2019 §2.2)."""
    from fever_ray.sketches.dd import DDSketch

    rng = np.random.default_rng(59)
    small, big = DDSketch.create(alpha=0.01), DDSketch.create(alpha=0.01)
    small.update(rng.lognormal(3, 1, 10000))
    big.update(rng.lognormal(3, 1, 1000000))
    assert len(big.to_bytes()) < 2 * len(small.to_bytes())
    assert len(big.to_bytes()) < 32 * 1024


def test_cms_inner_product_join_size_bounds():
    """Inner-product estimate (C&M 2005 §4.2): never undercounts the true
    join size, overcount ≤ ε·Na·Nb, dimension mismatch rejected, and the
    estimate is invariant to how each side's stream was split (merge first
    or update straight through)."""
    rng = np.random.default_rng(7)
    a_keys = rng.integers(0, 500, size=4000)
    b_keys = rng.integers(0, 500, size=6000)
    ca, cb = np.bincount(a_keys, minlength=500), np.bincount(b_keys, minlength=500)
    true = int(np.dot(ca.astype(object), cb.astype(object)))

    A = CountMin.create(width=2048, depth=5)
    A.update(a_keys.astype(np.int64))
    B1 = CountMin.create(width=2048, depth=5)
    B2 = CountMin.create(width=2048, depth=5)
    B1.update(b_keys[:2500].astype(np.int64))
    B2.update(b_keys[2500:].astype(np.int64))
    B = CountMin.create(width=2048, depth=5)
    B.update(b_keys.astype(np.int64))

    est = A.inner_product(B)
    assert est >= true
    assert est - true <= A.epsilon * len(a_keys) * len(b_keys)
    assert B1.merge(B2).table.tolist() == B.table.tolist()
    assert A.inner_product(B1) == est

    import pytest as _pytest

    with _pytest.raises(ValueError):
        A.inner_product(CountMin.create(width=1024, depth=5))


# ---------------------------------------------------------------- dyadic CMS
def test_dcms_decompose_tiles_exactly():
    """Every canonical dyadic cover tiles [lo, hi] with no gap, no overlap,
    and at most 2*bits nodes."""
    from fever_ray.sketches.dcms import dyadic_decompose

    rng = np.random.default_rng(11)
    bits = 10
    for _ in range(200):
        lo, hi = sorted(int(x) for x in rng.integers(0, 1 << bits, 2))
        nodes = dyadic_decompose(lo, hi, bits)
        assert len(nodes) <= 2 * bits
        covered = np.zeros(1 << bits, dtype=bool)
        for level, prefix in nodes:
            a, b = prefix << level, ((prefix + 1) << level) - 1
            assert not covered[a : b + 1].any(), "overlap"
            covered[a : b + 1] = True
        assert covered[lo : hi + 1].all() and covered.sum() == hi - lo + 1
    assert dyadic_decompose(5, 4, bits) == []
    assert dyadic_decompose(0, (1 << bits) - 1, bits) == [(bits, 0)]


def test_dcms_range_never_undercounts_within_bound():
    """C&M §4.3: range estimate >= exact always; overcount <= 2*bits*eps*n
    (holds deterministically here with a comfortable margin on Zipf data)."""
    from fever_ray.sketches.dcms import DyadicCountMin

    rng = np.random.default_rng(5)
    bits = 14
    data = np.minimum(
        (rng.zipf(1.3, 60000) - 1) + rng.integers(0, 512, 60000), (1 << bits) - 1
    ).astype(np.int64)
    sk = DyadicCountMin.create(bits=bits, width=512, depth=4)
    for chunk in np.array_split(data, 7):
        sk.update(chunk)
    assert sk.total == len(data)
    bound = 2 * bits * sk._level_view(0).epsilon * len(data)
    for _ in range(60):
        lo, hi = sorted(int(x) for x in rng.integers(0, 1 << bits, 2))
        exact = int(((data >= lo) & (data <= hi)).sum())
        est = sk.range_count(lo, hi)
        assert est >= exact, (lo, hi)
        assert est - exact <= bound, (lo, hi)
    # full-universe range is exact (served by the tracked total)
    assert sk.range_count(0, (1 << bits) - 1) == len(data)


def test_dcms_quantile_additive_rank_error():
    """quantile(q) binary-searches the prefix rank: the returned value's
    exact rank must sit within the accumulated overcount envelope."""
    from fever_ray.sketches.dcms import DyadicCountMin

    rng = np.random.default_rng(9)
    bits = 14
    data = rng.integers(0, 1 << bits, 80000).astype(np.int64)
    sk = DyadicCountMin.create(bits=bits, width=1024, depth=4)
    sk.update(data)
    srt = np.sort(data)
    envelope = 2 * bits * sk._level_view(0).epsilon * len(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        x = sk.quantile(q)
        exact_rank = int((data <= x).sum())
        target = int(np.ceil(q * len(data)))
        # rank(x) >= target and rank never undercounts -> exact rank can sit
        # below target only by the overcount; above by one value's mass
        assert exact_rank >= target - envelope
        lower_exact = int((data <= x - 1).sum()) if x else 0
        assert lower_exact < target


def test_dcms_merge_bit_identical_any_order_and_weighted():
    """Merge = per-level integer table add: any merge order equals the
    single-pass build byte-for-byte; weighted update == repeats."""
    from fever_ray.sketches.dcms import DyadicCountMin

    rng = np.random.default_rng(3)
    data = rng.integers(0, 1 << 12, 30000).astype(np.int64)
    single = DyadicCountMin.create(bits=12, width=256, depth=4)
    single.update(data)
    parts = []
    for ch in np.array_split(data, 8):
        p = DyadicCountMin.create(bits=12, width=256, depth=4)
        p.update(ch)
        parts.append(p.to_bytes())

    def merged(order):
        acc = DyadicCountMin.create(bits=12, width=256, depth=4)
        for i in order:
            acc.merge(DyadicCountMin.from_bytes(parts[i]))
        return acc.to_bytes()

    fwd = merged(list(range(8)))
    assert fwd == merged([7, 1, 4, 0, 6, 2, 5, 3]) == single.to_bytes()

    uniq, counts = np.unique(data, return_counts=True)
    w = DyadicCountMin.create(bits=12, width=256, depth=4)
    w.update(uniq, counts=counts)
    assert w.to_bytes() == single.to_bytes()


def test_dcms_roundtrip_and_guards():
    from fever_ray.sketches.dcms import DyadicCountMin
    from fever_ray.sketches import sketch_from_bytes

    sk = DyadicCountMin.create(bits=8, width=64, depth=3)
    sk.update(np.array([1, 5, 200, 255], dtype=np.int64))
    rt = sketch_from_bytes("dcms", sk.to_bytes())
    assert rt.to_bytes() == sk.to_bytes()
    assert rt.range_count(0, 255) == 4

    with pytest.raises(ValueError):
        sk.update(np.array([-1], dtype=np.int64))
    with pytest.raises(ValueError):
        sk.update(np.array([256], dtype=np.int64))
    with pytest.raises(ValueError):
        sk.merge(DyadicCountMin.create(bits=9, width=64, depth=3))
    with pytest.raises(ValueError):
        DyadicCountMin.create(bits=0)


# ---------------------------------------------------------------- counting bloom
def test_cbf_no_false_negatives_and_fp_rate():
    """Summary Cache §4.3: after valid add/remove traffic, every remaining
    key tests positive (no false negatives); removed-support keys test
    positive only at ~fill_ratio^k."""
    from fever_ray.sketches.cbf import CountingBloom

    keep = np.array([f"keep-{i}" for i in range(20000)], dtype=object)
    drop = np.array([f"drop-{i}" for i in range(20000)], dtype=object)
    cb = CountingBloom.create(n=25000, p=1e-3)
    cb.add(keep)
    cb.add(drop)
    cb.remove(drop)
    assert cb.contains(keep).all()
    assert cb.debt == 0
    fp = int(cb.contains(drop).sum())
    expected = len(drop) * cb.fill_ratio**cb.k
    assert fp <= 3 * expected + 10, (fp, expected)


def test_cbf_subtract_equals_elementwise_removes():
    """Retraction as sketch algebra: subtracting a filter built over the
    retraction stream is byte-identical to removing those keys one by one."""
    from fever_ray.sketches.cbf import CountingBloom

    rng = np.random.default_rng(17)
    allk = np.array([f"k{i}" for i in range(5000)], dtype=object)
    retr = allk[rng.random(5000) < 0.3]
    a = CountingBloom.create(n=5000, p=1e-3)
    a.add(allk)
    r = CountingBloom.create(n=5000, p=1e-3)
    r.add(retr)
    b = CountingBloom.from_bytes(a.to_bytes())
    a.remove(retr)
    b.subtract(r)
    assert a.to_bytes() == b.to_bytes()


def test_cbf_merge_commutes_with_removals_any_order():
    """Signed counters: partials where removals precede the matching
    insertions (negative transients) still merge to the same bytes as the
    sequential build — add/remove fully commute across partials."""
    from fever_ray.sketches.cbf import CountingBloom

    keys = np.array([f"x{i}" for i in range(4000)], dtype=object)
    gone = keys[:1500]

    seq = CountingBloom.create(n=4000, p=1e-3)
    seq.add(keys)
    seq.remove(gone)

    p1 = CountingBloom.create(n=4000, p=1e-3)
    p1.remove(gone)  # removals land in a DIFFERENT partial than the adds
    assert p1.debt > 0  # transient negative mass is expected on a partial
    p2 = CountingBloom.create(n=4000, p=1e-3)
    p2.add(keys)
    assert p1.merge(p2).to_bytes() == seq.to_bytes()
    assert p1.debt == 0


def test_cbf_weighted_int_keys_roundtrip_and_guards():
    from fever_ray.sketches import sketch_from_bytes
    from fever_ray.sketches.cbf import CountingBloom

    ids = np.arange(1000, dtype=np.int64)
    cb = CountingBloom.create(n=2000, p=1e-3)
    cb.add(ids, counts=np.full(1000, 3, dtype=np.int64))
    cb.remove(ids[:500], counts=np.full(500, 3, dtype=np.int64))
    assert not cb.contains(ids[:500]).any() or cb.contains(ids[:500]).sum() < 20
    assert cb.contains(ids[500:]).all()

    rt = sketch_from_bytes("cbf", cb.to_bytes())
    assert rt.to_bytes() == cb.to_bytes()
    assert (rt.contains(ids) == cb.contains(ids)).all()

    with pytest.raises(ValueError):
        cb.merge(CountingBloom.create(n=999, p=1e-3))
    with pytest.raises(ValueError):
        cb.add(ids, counts=np.array([-1] * 1000))
    with pytest.raises(ValueError):
        CountingBloom.create(n=0)


def test_linear_counter_dynamic_distinct():
    """Whang et al. linear counting: estimate within the published bound,
    retraction via remove/subtract is EXACT (insert A∪B then subtract B ==
    insert A bit-identically), merge order invariant."""
    from fever_ray.sketches.lc import LinearCounter

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1500, size=40_000)   # heavy duplication
    lc = LinearCounter.create(m=4096, seed=1)
    lc.add_ints(keys)
    exact = len(np.unique(keys))
    assert abs(lc.estimate() - exact) <= 3 * lc.std_error(exact) + 1
    assert lc.debt == 0 and lc.n == len(keys)
    # full retraction empties the sketch exactly
    lc.remove_ints(keys)
    assert lc.occupied == 0 and lc.n == 0 and lc.estimate() == 0.0
    # subtract(stream B) == never having inserted B (bit-identical counts)
    a = rng.integers(0, 800, size=10_000)
    b = rng.integers(0, 800, size=5_000)
    both = LinearCounter.create(m=1024, seed=3)
    both.add_ints(np.concatenate([a, b]))
    sk_b = LinearCounter.create(m=1024, seed=3)
    sk_b.add_ints(b)
    both.subtract(sk_b)
    only_a = LinearCounter.create(m=1024, seed=3)
    only_a.add_ints(a)
    np.testing.assert_array_equal(both.counts, only_a.counts)
    # merge = concatenated stream, any split
    whole = LinearCounter.create(m=1024, seed=3)
    whole.add_ints(a)
    acc = LinearCounter.create(m=1024, seed=3)
    for part in np.array_split(a, 7):
        p = LinearCounter.create(m=1024, seed=3)
        p.add_ints(part)
        acc.merge(p)
    np.testing.assert_array_equal(acc.counts, whole.counts)
    # string path + roundtrip + guards
    s = LinearCounter.create(m=64, seed=0)
    s.add(["x", "y", "x"])
    assert s.n == 3
    back = LinearCounter.from_bytes(s.to_bytes())
    np.testing.assert_array_equal(back.counts, s.counts)
    assert (back.m, back.seed, back.n) == (s.m, s.seed, s.n)
    s.remove(["zz"])  # removal never inserted → debt surfaces
    assert s.debt == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        LinearCounter.create(m=100)
    with _pytest.raises(ValueError):
        s.merge(LinearCounter.create(m=128, seed=0))
    # saturation cap (every bucket occupied) returns the documented cap
    full = LinearCounter.create(m=4, seed=0)
    full.counts[:] = 1
    assert full.estimate() == 4 * np.log(4)


def test_linear_counter_udaf_pass():
    """lc rides the one-pass UDAF like every other kind."""
    import pyarrow as pa
    import ray.data as rd

    from fever_ray.core.udaf import SketchSpec, build_sketches, finalize
    from fever_ray.sketches.lc import LinearCounter

    t = pa.table({"k": pa.array((np.arange(3000) % 700), pa.int64())})
    sk = build_sketches(
        rd.from_arrow(t).repartition(5),
        [SketchSpec("lc_k", "lc", "k", {"m": 4096}, value_kind="int")],
    )["lc_k"]
    assert isinstance(sk, LinearCounter)
    assert abs(sk.estimate() - 700) <= 3 * sk.std_error(700) + 1
    card = finalize(sk, SketchSpec("lc_k", "lc", "k", {"m": 4096}, value_kind="int"))
    assert card["debt"] == 0 and card["n"] == 3000


def test_ams_even_r_median_no_int64_overflow():
    # even-r midpoint must go float64 BEFORE the sum: two extreme int64
    # lane values would wrap silently under numpy int64 addition
    import numpy as np

    from fever_ray.sketches.ams import AMSSketch

    sk = AMSSketch.create(r=2, b=8, seed=0)
    big = np.iinfo(np.int64).max // 2 + 7
    sk.counters[:] = 0
    sk.counters[0, :] = big
    sk.counters[1, :] = big
    est = sk.query(np.array(["k1", "k2"]))
    assert est.dtype == np.float64
    # both lanes read ±big; the midpoint magnitude is big, not a wrapped
    # negative garbage value
    assert np.all(np.abs(est) <= float(big) + 1.0)
    assert np.all(np.isfinite(est))
