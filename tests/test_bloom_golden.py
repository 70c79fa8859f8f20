"""Golden DCSO-codec fixture (FIXTURES.md F2 last bullet): a checked-in
filter blob pins the byte format — any change to the FNV kernels, parameter
derivation, bit layout, or serialization breaks these assertions."""

import hashlib
import os

import numpy as np

from fever_ray.sketches.bloom import BloomFilter

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden.bloom")
FIXTURE_GZ = FIXTURE + ".gz"

GOLDEN_SHA1 = "9c75565d6b03cbfc022aab5e3d0953495e629117"


def _planted():
    return [f"ioc-{i}.example.com" for i in range(100)] + [
        "/oddlyspecific",
        "foo.bar.de/odd",
        "http://foo.bar.de/odd",
    ]


def test_golden_blob_loads_with_pinned_params():
    bf = BloomFilter.load(FIXTURE)
    assert (bf.n, bf.p, bf.k, bf.m, bf.N) == (1000, 0.0001, 14, 19170, 103)
    assert bf.data == b"fever_ray golden fixture v1"
    assert bf.check(_planted()).all()
    assert not bf.check_one("definitely-not-planted.example.org")


def test_golden_blob_gzip_variant():
    bf = BloomFilter.load(FIXTURE_GZ, compressed=True)
    plain = BloomFilter.load(FIXTURE)
    assert np.array_equal(bf.v, plain.v)
    assert bf.data == plain.data


def test_rebuilding_reproduces_identical_bytes():
    """The codec + hashing must regenerate the fixture bit-for-bit."""
    bf = BloomFilter.initialize(1000, 0.0001)
    bf.add(_planted()[:100])
    bf.add(_planted()[100:])
    bf.data = b"fever_ray golden fixture v1"
    assert hashlib.sha1(bf.to_bytes()).hexdigest() == GOLDEN_SHA1
    with open(FIXTURE, "rb") as fh:
        assert fh.read() == bf.to_bytes()
