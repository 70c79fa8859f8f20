"""FNV test vectors + vectorization equivalence for the hashing kernels."""

import numpy as np
import pyarrow as pa

from fever_ray.sketches.hashing import fnv1_64, fnv1a_64, fnv_pair, hash64

# Published FNV 64-bit test vectors (Fowler/Noll/Vo reference values, also in
# Go's hash/fnv tests): offset basis for "", and classic vectors for "a", "foobar".
FNV1_VECTORS = {
    b"": 0xCBF29CE484222325,
    b"a": 0xAF63BD4C8601B7BE,
    b"b": 0xAF63BD4C8601B7BD,
    b"foobar": 0x340D8765A4DDA9C2,
}
FNV1A_VECTORS = {
    b"": 0xCBF29CE484222325,
    b"a": 0xAF63DC4C8601EC8C,
    b"b": 0xAF63DF4C8601F1A5,
    b"foobar": 0x85944171F73967E8,
}


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


def test_fnv1_known_vectors():
    keys = list(FNV1_VECTORS)
    out = fnv1_64(keys)
    for k, h in zip(keys, out):
        assert int(h) == FNV1_VECTORS[k], k


def test_fnv1a_known_vectors():
    keys = list(FNV1A_VECTORS)
    out = fnv1a_64(keys)
    for k, h in zip(keys, out):
        assert int(h) == FNV1A_VECTORS[k], k


def test_matches_scalar_reference_on_random_strings():
    rng = np.random.default_rng(7)
    keys = [bytes(rng.integers(0, 256, size=int(n)).astype(np.uint8)) for n in rng.integers(0, 300, size=200)]
    h1, h2 = fnv_pair(keys)
    for k, a, b in zip(keys, h1, h2):
        assert int(a) == _fnv1_ref(k)
        assert int(b) == _fnv1a_ref(k)


def test_arrow_input_matches_list_input():
    keys = ["example.com", "", "a/b/c?q=1", "Ünïcode-дом", "x" * 500]
    arr = pa.array(keys, type=pa.string())
    assert np.array_equal(fnv1_64(arr), fnv1_64(keys))
    assert np.array_equal(fnv1a_64(pa.array(keys, type=pa.large_string())), fnv1a_64(keys))
    # sliced (non-zero offset) arrays hash identically
    sliced = pa.array(["pad"] + keys).slice(1)
    assert np.array_equal(fnv1_64(sliced), fnv1_64(keys))


def test_nulls_hash_as_empty():
    arr = pa.array(["a", None, "b"])
    out = fnv1_64(arr)
    assert int(out[1]) == FNV1_VECTORS[b""]


def test_hash64_distribution_and_seeds():
    keys = [f"key-{i}" for i in range(10000)]
    h0 = hash64(keys)
    h1 = hash64(keys, seed=1)
    assert len(np.unique(h0)) == len(keys)  # no collisions at this scale
    assert not np.array_equal(h0, h1)
    # rough uniformity: top bit set ~half the time
    frac = np.mean((h0 >> np.uint64(63)).astype(float))
    assert 0.45 < frac < 0.55
