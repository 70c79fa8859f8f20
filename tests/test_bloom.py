"""Bloom filter: DCSO parameter derivation, codec round-trip, fever fallback
semantics (/root/reference/processing/bloom_handler.go:104-117), merge."""

import gzip
import io
import math
import struct

import numpy as np
import pytest

from fever_ray.sketches.bloom import BloomFilter, BloomKTooHighError, build_filter


def test_initialize_parameter_derivation():
    # m = ceil(|n ln p| / ln(2)^2), k = ceil(ln2 * m / n) — DCSO/bloom Initialize
    bf = BloomFilter.initialize(100000, 1e-7)  # fever test params, bloom_handler_test.go:282
    m_expected = int(abs(math.ceil(100000 * math.log(1e-7) / (math.log(2) ** 2))))
    assert bf.m == m_expected
    assert bf.k == int(math.ceil(math.log(2) * bf.m / 100000))
    assert len(bf.v) == int(math.ceil(bf.m / 64.0))
    assert bf.N == 0


def test_add_check_no_false_negatives():
    bf = BloomFilter.initialize(10000, 1e-4)
    planted = [f"evil-{i}.example.com" for i in range(5000)]
    bf.add(planted)
    assert bf.N == 5000
    assert bf.check(planted).all()


def test_false_positive_rate_near_p():
    p = 0.01
    bf = BloomFilter.initialize(20000, p)
    bf.add([f"member-{i}" for i in range(20000)])
    probes = [f"nonmember-{i}" for i in range(20000)]
    fp = float(bf.check(probes).mean())
    assert fp < 3 * p


def test_serialization_round_trip_plain_and_gzip(tmp_path):
    bf = BloomFilter.initialize(1000, 1e-4)
    bf.add(["alpha", "beta", "gamma"])
    bf.data = b"trailing-metadata"
    blob = bf.to_bytes()
    back = BloomFilter.from_bytes(blob)
    assert (back.n, back.p, back.k, back.m, back.N) == (bf.n, bf.p, bf.k, bf.m, bf.N)
    assert np.array_equal(back.v, bf.v)
    assert back.data == b"trailing-metadata"

    path = str(tmp_path / "f.bloom.gz")
    bf.save(path, compressed=True)
    back2 = BloomFilter.load(path, compressed=True)
    assert np.array_equal(back2.v, bf.v)
    assert back2.check_one("alpha") and not back2.check_one("zeta")


def test_file_layout_is_dcso_format():
    """Header = little-endian n:u64 p:f64 k:u64 m:u64 N:u64, then M u64 words."""
    bf = BloomFilter.initialize(100, 0.01)
    bf.add(["x"])
    blob = bf.to_bytes()
    n, p, k, m, N = struct.unpack("<QdQQQ", blob[:40])
    assert (n, k, m, N) == (bf.n, bf.k, bf.m, 1)
    assert p == bf.p
    words = np.frombuffer(blob[40 : 40 + 8 * len(bf.v)], dtype="<u8")
    assert np.array_equal(words, bf.v)


def test_empty_file_fallback(tmp_path):
    """fever: empty filter file → empty Initialize(100, 1e-8) default."""
    path = str(tmp_path / "empty.bloom")
    open(path, "wb").close()
    bf = BloomFilter.load_with_fallback(path)
    assert (bf.n, bf.p, bf.N) == (100, 0.00000001, 0)


def test_corrupt_k_too_high_fallback(tmp_path):
    """fever: 'value of k is too high' error → empty default filter."""
    path = str(tmp_path / "corrupt.bloom")
    with open(path, "wb") as fh:
        fh.write(struct.pack("<QdQQQ", 1, 0.5, 10**6, 64, 0))
        fh.write(b"\x00" * 8)
    with pytest.raises(BloomKTooHighError):
        BloomFilter.load(path)
    bf = BloomFilter.load_with_fallback(path)
    assert (bf.n, bf.p) == (100, 0.00000001)


def test_merge_is_union_and_order_invariant():
    parts = []
    for i in range(4):
        bf = BloomFilter.initialize(1000, 1e-4)
        bf.add([f"part{i}-key{j}" for j in range(100)])
        parts.append(bf)

    def merged(order):
        acc = BloomFilter.initialize(1000, 1e-4)
        for i in order:
            acc.merge(BloomFilter.from_bytes(parts[i].to_bytes()))
        return acc

    a = merged([0, 1, 2, 3])
    b = merged([3, 1, 0, 2])
    assert np.array_equal(a.v, b.v)
    assert a.N == b.N == 400
    for i in range(4):
        assert a.check([f"part{i}-key{j}" for j in range(100)]).all()


def test_double_hash_indices_use_uint64_wraparound():
    """(h1 + i*h2) mod m must wrap mod 2^64 exactly like Go uint64 math."""
    bf = BloomFilter.initialize(100, 0.01)
    idx = bf._indices(["wraparound-test-key"])
    from fever_ray.sketches.hashing import fnv_pair

    h1, h2 = fnv_pair(["wraparound-test-key"])
    for i in range(bf.k):
        expect = ((int(h1[0]) + i * int(h2[0])) % (1 << 64)) % bf.m
        assert int(idx[0, i]) == expect


def test_build_filter_helper():
    bf = build_filter(["a", "b"], p=1e-4)
    assert bf.check(["a", "b"]).all()
