"""Property-based tests (hypothesis) for the sketch kernels: FNV scalar
parity on arbitrary bytes, DCSO codec round-trips on arbitrary parameters,
merge-union invariants, quantile rank bounds on arbitrary floats."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fever_ray.sketches import BloomFilter, CountMin, HyperLogLog, KLL
from fever_ray.sketches.hashing import fnv_pair


def _fnv1_ref(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF) ^ b
    return h


def _fnv1a_ref(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


@settings(max_examples=50, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=20))
def test_fnv_vectorized_equals_scalar(batch):
    h1, h2 = fnv_pair(batch)
    for b, a1, a2 in zip(batch, h1, h2):
        assert int(a1) == _fnv1_ref(b)
        assert int(a2) == _fnv1a_ref(b)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10**7),
    p=st.floats(min_value=1e-12, max_value=0.5, allow_nan=False),
)
def test_bloom_codec_roundtrip_any_params(n, p):
    bf = BloomFilter.initialize(n, p)
    bf.add([b"some-key"])
    back = BloomFilter.from_bytes(bf.to_bytes())
    assert (back.n, back.p, back.k, back.m, back.N) == (bf.n, bf.p, bf.k, bf.m, bf.N)
    assert np.array_equal(back.v, bf.v)
    assert back.check_one(b"some-key")


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.text(min_size=0, max_size=30), min_size=0, max_size=50),
        min_size=1,
        max_size=6,
    )
)
def test_bloom_merge_equals_single_filter(parts):
    """Union of per-part filters == one filter over all values (same params)."""
    merged = BloomFilter.initialize(1000, 1e-4)
    single = BloomFilter.initialize(1000, 1e-4)
    for part in parts:
        bf = BloomFilter.initialize(1000, 1e-4)
        bf.add(part)
        merged.merge(bf)
        single.add(part)
    assert np.array_equal(merged.v, single.v)
    assert merged.N == single.N


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.text(min_size=1, max_size=20), min_size=0, max_size=100),
        min_size=1,
        max_size=5,
    )
)
def test_hll_cms_merge_equals_single_pass(parts):
    m_h, s_h = HyperLogLog.create(p=10), HyperLogLog.create(p=10)
    m_c, s_c = CountMin.create(width=128, depth=4), CountMin.create(width=128, depth=4)
    for part in parts:
        h = HyperLogLog.create(p=10)
        h.update(part)
        m_h.merge(h)
        s_h.update(part)
        c = CountMin.create(width=128, depth=4)
        c.update(part)
        m_c.merge(c)
        s_c.update(part)
    assert np.array_equal(m_h.registers, s_h.registers)
    assert np.array_equal(m_c.table, s_c.table)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
        ),
        min_size=10,
        max_size=2000,
    )
)
def test_kll_rank_bound_arbitrary_data(data):
    k = KLL.create(k=100)
    k.update(np.array(data))
    arr = np.sort(np.array(data))
    for q in (0.1, 0.5, 0.9):
        v = k.quantile(q)
        lo = np.searchsorted(arr, v, side="left") / len(arr)
        hi = np.searchsorted(arr, v, side="right") / len(arr)
        # true rank interval of the returned value must be within eps of q
        eps = 2.296 / 100 + 1.0 / len(arr) + 1e-9
        assert lo - eps <= q <= hi + eps, (q, v, lo, hi)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=300))
def test_cms_point_estimates_never_undercount(keys):
    keys = [f"k{v}" for v in keys]
    cms = CountMin.create(width=64, depth=4)
    cms.update(keys)
    uniq, counts = np.unique(keys, return_counts=True)
    est = cms.query(list(uniq))
    assert (est.astype(np.int64) >= counts).all()
    assert cms.total == len(keys)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=0, max_size=60
    )
)
def test_rank_within_key_matches_bruteforce(pairs):
    from fever_ray.ops.curate import _rank_within_key

    codes = np.array([p[0] for p in pairs], dtype=np.int64)
    order = np.array([p[1] for p in pairs], dtype=np.int64)
    got = _rank_within_key(codes, order)
    # brute force: rank of i within its key group by (order, position)
    for i in range(len(pairs)):
        better = sum(
            1
            for j in range(len(pairs))
            if codes[j] == codes[i]
            and (order[j], j) < (order[i], i)
        )
        assert got[i] == better


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=20
    )
)
def test_token_repetition_matches_counter(texts):
    import collections

    import pyarrow as pa

    from fever_ray.ops.curate import token_repetition

    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = token_repetition(t)
    for i, text in enumerate(texts):
        toks = text.split(" ") if text != "" else []
        c = collections.Counter(toks)
        n = len(toks)
        assert out.column("n_tokens")[i].as_py() == n
        assert out.column("n_distinct_tokens")[i].as_py() == len(c)
        top = max(c.values()) if c else 0
        denom = max(n, 1)
        assert out.column("top_token_frac")[i].as_py() == top / denom
        assert out.column("dup_token_ratio")[i].as_py() == (n - len(c)) / denom


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=64), min_size=1, max_size=40))
def test_batch_simhash_matches_scalar(texts_bytes):
    """Tiled batch SimHash equals the per-doc scalar formulation."""
    import pyarrow as pa

    from fever_ray.sketches.hashing import hash64
    from fever_ray.sketches.minhash import batch_simhash, simhash

    texts = [b.decode("latin-1").replace("\x00", "") for b in texts_bytes]
    arr = pa.array(texts, pa.string())
    got = batch_simhash(arr)
    for i, text in enumerate(texts):
        toks = text.split(" ")
        ref = simhash(hash64(toks))
        assert int(got[i]) == int(ref)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(list("abcdef") + ["tok1", "tok2", ""]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_window_hash_structure_matches_grams(docs, n):
    """The rolling polynomial window keys must induce EXACTLY the equality
    structure of the literal gram strings (token sequences with a tiny
    vocabulary maximize repeats — the adversarial case where the old
    period-9 rotation schedule collided distinct n>=10 windows)."""
    import pyarrow as pa

    from fever_ray.ops.dedup import _window_hashes
    from fever_ray.ops.trainprep import _doc_ngrams

    batch = pa.table({"text": pa.array([" ".join(t) for t in docs], pa.string())})
    grams, rows_g = _doc_ngrams(batch, n, "text")
    res = _window_hashes(batch, n, "text")
    if grams is None:
        assert res[0] is None
        return
    keys, rows_h, starts = res
    assert rows_h.tolist() == rows_g.tolist()
    assert len(keys) == len(grams) == len(starts)
    # tokens cannot contain spaces, so gram string <-> token sequence is a
    # bijection: key equality must equal gram equality in BOTH directions
    by_gram = {}
    for g, k in zip(grams.to_pylist(), keys.tolist()):
        by_gram.setdefault(g, set()).add(k)
    assert all(len(ks) == 1 for ks in by_gram.values())  # same gram, same key
    all_keys = [next(iter(ks)) for ks in by_gram.values()]
    assert len(set(all_keys)) == len(by_gram)  # distinct grams, distinct keys


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=True, width=64),
        min_size=2,
        max_size=60,
    )
)
def test_ordered_u64_preserves_float_order(vals):
    """The order-preserving uint64 map (quantile_bucket / order-statistic
    backbone) must rank arbitrary floats exactly like the floats."""
    from fever_ray.ops.stats import _to_ordered_u64

    a = np.array(vals, dtype=np.float64)
    u = _to_ordered_u64(a)
    ai = np.argsort(a, kind="stable")
    ui = np.argsort(u, kind="stable")
    # same multiset ordering: sorted values agree positionally
    np.testing.assert_array_equal(a[ai], a[ui])


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=30))
def test_allpairs_by_runlen_matches_itertools(lens):
    """Vectorized by-run-length triu expansion (containment / triangle
    pair generation) equals the brute-force per-run combinations, for any
    run-length multiset and cap."""
    from itertools import combinations

    from fever_ray.ops.dedup import _allpairs_by_runlen

    ids = []
    runs = []
    nxt = 0
    for L in lens:
        run = list(range(nxt, nxt + L))
        nxt += L + 3  # gaps so ids are distinct across runs
        runs.append(run)
        ids.extend(run)
    starts = np.concatenate(
        ([0], np.cumsum([len(r) for r in runs]))
    ).astype(np.int64)
    ids_arr = np.array(ids, dtype=np.int64)
    for cap in (2, 3, 16):
        a, b = _allpairs_by_runlen(ids_arr, starts, cap)
        got = sorted(zip(a.tolist(), b.tolist()))
        want = sorted(
            p
            for r in runs
            if 2 <= len(r) <= cap
            for p in combinations(r, 2)
        )
        assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=80),
)
def test_ntile_arithmetic_matches_reference(k, vals):
    """The closed-form tile formula quantile_bucket applies to global
    ranks equals a direct NTILE partition for any n, k."""
    n = len(vals)
    rank = np.arange(n, dtype=np.int64)
    q, rem = divmod(n, k)
    thresh = np.int64(rem * (q + 1))
    qq = np.int64(max(q, 1))
    tile = np.where(
        rank < thresh, rank // np.int64(q + 1),
        np.int64(rem) + (rank - thresh) // qq,
    ) + 1
    # direct construction: first rem tiles get q+1 ranks, rest get q
    want = np.repeat(
        np.arange(1, k + 1),
        [q + 1 if i < rem else q for i in range(k)],
    )
    np.testing.assert_array_equal(tile, want[:n])
    if n:
        sizes = np.bincount(tile, minlength=k + 1)[1:]
        assert sizes.max() - sizes[sizes > 0].min() <= 1


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 50)),
        min_size=0,
        max_size=120,
    )
)
def test_skyline_mask_equals_bruteforce(points):
    from fever_ray.ops.stats import _skyline_mask

    x = np.array([p[0] for p in points], dtype=np.int64)
    y = np.array([p[1] for p in points], dtype=np.int64)
    mask = _skyline_mask(x, y)
    for i in range(len(points)):
        dominated = any(
            (x[j] >= x[i]) and (y[j] >= y[i]) and (x[j] > x[i] or y[j] > y[i])
            for j in range(len(points))
        )
        assert mask[i] == (not dominated)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=60,
    )
)
def test_prefix_fold_is_order_preserving(strings):
    import pyarrow as pa

    from fever_ray.ops.dedup import _prefix_fold

    arr = pa.array(strings, pa.string())
    folds = _prefix_fold(arr)
    enc = [s.encode() for s in strings]
    for i in range(len(strings)):
        for j in range(len(strings)):
            # fold strictly orders whenever the first 8 bytes differ, and
            # never inverts the byte-lexicographic order
            if folds[i] < folds[j]:
                assert enc[i] < enc[j]
            if enc[i][:8] != enc[j][:8]:
                assert (folds[i] < folds[j]) == (enc[i][:8] < enc[j][:8])


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 1 << 40), min_size=0, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_shingle_blob_table_matches_per_doc_unique(doc_shingles):
    """The vectorized lexsort+mask blob build is bit-identical to the
    per-doc np.unique loop it replaced (on arbitrary shingle multisets)."""
    import pyarrow as pa

    from fever_ray.ops.dedup import _blob_offsets_data

    # rebuild the kernel's tail directly from synthetic (sh, sh_off)
    sh = np.array(
        [v for doc in doc_shingles for v in doc], dtype=np.uint64
    )
    sh_off = np.cumsum([0] + [len(d) for d in doc_shingles]).astype(np.int64)
    ndocs = len(doc_shingles)
    seg_len = np.diff(sh_off)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), seg_len)
    order = np.lexsort((sh, doc_idx))
    dd, sd = doc_idx[order], sh[order]
    keep = np.empty(len(sd), bool)
    if len(sd):
        keep[0] = True
        keep[1:] = (dd[1:] != dd[:-1]) | (sd[1:] != sd[:-1])
    uniq_d, uniq_s = dd[keep], sd[keep]
    counts = np.bincount(uniq_d, minlength=ndocs).astype(np.int64)
    byte_off = np.concatenate(([0], np.cumsum(counts * 8))).astype(np.int64)
    blob_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), ndocs,
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(uniq_s.tobytes())],
    )
    off, dat = _blob_offsets_data(blob_arr)
    for i, doc in enumerate(doc_shingles):
        got = dat[off[i] : off[i + 1]]
        want = np.unique(np.array(doc, dtype=np.uint64))
        assert np.array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(0, 40), min_size=1, max_size=400),
    k=st.integers(2, 12),
    n_splits=st.integers(1, 7),
)
def test_mg_guarantee_any_stream_any_split(keys, k, n_splits):
    """Misra-Gries invariants hold for EVERY stream and partitioning:
    residual never overcounts, undercount <= n//(k+1), every key above
    the bound retained, total counters <= k."""
    from fever_ray.sketches.mg import MisraGries

    arr = np.array([f"k{v}" for v in keys])
    acc = MisraGries.create(k=k)
    for part in np.array_split(arr, min(n_splits, len(arr))):
        if len(part) == 0:
            continue
        p = MisraGries.create(k=k)
        p.update(part)
        acc.merge(p)
    assert acc.n == len(keys)
    assert len(acc.counts) <= k
    exact = {}
    for key in arr.tolist():
        exact[key] = exact.get(key, 0) + 1
    bound = acc.error_bound()
    for key, f in exact.items():
        got = acc.counts.get(key, 0)
        assert got <= f
        assert f - got <= bound
        if f > bound:
            assert key in acc.counts


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=300),
    n_splits=st.integers(1, 6),
    seed=st.integers(0, 3),
)
def test_ams_split_merge_bit_identical(keys, n_splits, seed):
    from fever_ray.sketches.ams import AMSSketch

    arr = np.array(keys, dtype=np.int64)
    whole = AMSSketch.create(r=3, b=64, seed=seed)
    whole.update_ints(arr)
    acc = AMSSketch.create(r=3, b=64, seed=seed)
    for part in np.array_split(arr, min(n_splits, len(arr))):
        if len(part) == 0:
            continue
        p = AMSSketch.create(r=3, b=64, seed=seed)
        p.update_ints(part)
        acc.merge(p)
    np.testing.assert_array_equal(acc.counters, whole.counters)
    assert acc.n == whole.n == len(arr)
    back = AMSSketch.from_bytes(acc.to_bytes())
    np.testing.assert_array_equal(back.counters, whole.counters)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 200),
    d=st.integers(1, 12),
    l=st.integers(2, 8),
    seed=st.integers(0, 10),
    n_splits=st.integers(1, 5),
)
def test_fd_bound_any_matrix_any_split(n, d, l, seed, n_splits):
    """FD published guarantee for every random matrix and split: PSD
    difference, spectral error <= 2||A||_F^2/l, exact Frobenius mass."""
    from fever_ray.sketches.fd import FrequentDirections

    A = np.random.default_rng(seed).normal(size=(n, d))
    acc = FrequentDirections.create(l=l, d=d)
    for part in np.array_split(A, min(n_splits, n)):
        p = FrequentDirections.create(l=l, d=d)
        p.update(part)
        acc.merge(p)
    assert abs(acc.fnorm_sq - float((A * A).sum())) <= 1e-9 * max(acc.fnorm_sq, 1.0)
    ev = np.linalg.eigvalsh(A.T @ A - acc.cov())
    tol = 1e-9 * max(acc.fnorm_sq, 1.0)
    assert ev.min() >= -tol
    assert ev.max() <= acc.error_bound() + tol


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1e12,
                max_value=1e12,
                allow_nan=False,
                allow_infinity=False,
            ),
            min_size=0,
            max_size=300,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_dd_merge_equals_single_pass_any_split(parts):
    """DDSketch invariants under ARBITRARY streams and splits: merged bytes
    == single-pass bytes (integer bucket addition is split-invariant), n and
    zero_count preserved, and every quantile answer obeys the alpha
    value-relative bound against the exact order statistic."""
    from fever_ray.sketches.dd import DDSketch

    single = DDSketch.create(alpha=0.02)
    merged = DDSketch.create(alpha=0.02)
    for part in parts:
        arr = np.array(part, dtype=np.float64)
        single.update(arr)
        p = DDSketch.create(alpha=0.02)
        p.update(arr)
        merged.merge(DDSketch.from_bytes(p.to_bytes()))
    assert merged.to_bytes() == single.to_bytes()
    data = np.concatenate([np.array(p, dtype=np.float64) for p in parts])
    assert single.n == len(data)
    if len(data) == 0:
        return
    srt = np.sort(data)
    for q in (0.1, 0.5, 0.9):
        est = single.quantile(q)
        exact = srt[int(q * (len(data) - 1))]
        if exact == 0.0:
            assert est == 0.0
        else:
            assert abs(est - exact) <= 0.02 * abs(exact) * (1 + 1e-9), (q, est, exact)


# ------------------------------------------------------------- dyadic CMS
@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1023), min_size=1, max_size=400),
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=0, max_value=1023),
    st.integers(min_value=1, max_value=5),
)
def test_dcms_never_undercounts_under_arbitrary_splits(vals, a, b, n_splits):
    """For ANY value stream, ANY split into partials, and ANY probe range:
    merged estimate >= exact count, and the merge is split-invariant
    byte-for-byte (integer table adds)."""
    from fever_ray.sketches.dcms import DyadicCountMin

    lo, hi = min(a, b), max(a, b)
    arr = np.array(vals, dtype=np.int64)
    single = DyadicCountMin.create(bits=10, width=64, depth=3)
    single.update(arr)
    merged = DyadicCountMin.create(bits=10, width=64, depth=3)
    for chunk in np.array_split(arr, min(n_splits, len(arr))):
        p = DyadicCountMin.create(bits=10, width=64, depth=3)
        p.update(chunk)
        merged.merge(p)
    assert merged.to_bytes() == single.to_bytes()
    exact = int(((arr >= lo) & (arr <= hi)).sum())
    assert merged.range_count(lo, hi) >= exact
    assert merged.total == len(arr)


# ---------------------------------------------------------- counting bloom
@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=32), min_size=1, max_size=120),
    st.data(),
)
def test_cbf_no_false_negatives_under_arbitrary_remove_subsets(keys, data):
    """For ANY insert stream and ANY multiset-valid removal subset applied
    in ANY partial: zero false negatives on the surviving support and zero
    debt after the full merge."""
    from fever_ray.sketches.cbf import CountingBloom

    arr = np.array(keys, dtype=object)
    n_rm = data.draw(st.integers(min_value=0, max_value=len(arr)))
    rm = arr[:n_rm]  # removal of a true prefix multiset is always valid

    seq = CountingBloom.create(n=max(len(arr), 8), p=1e-3)
    seq.add(arr)
    seq.remove(rm)

    # removals in their own partial, merged in FIRST (remove-before-add)
    p_rm = CountingBloom.create(n=max(len(arr), 8), p=1e-3)
    p_rm.remove(rm)
    p_add = CountingBloom.create(n=max(len(arr), 8), p=1e-3)
    p_add.add(arr)
    merged = p_rm.merge(p_add)
    assert merged.to_bytes() == seq.to_bytes()
    assert merged.debt == 0

    from collections import Counter

    survivors = Counter(keys)
    survivors.subtract(Counter(keys[:n_rm]))
    alive = np.array([k for k, c in survivors.items() if c > 0], dtype=object)
    if len(alive):
        assert merged.contains(alive).all()
