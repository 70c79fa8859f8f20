"""Bloom filter, byte-format compatible with DCSO/bloom filter files.

The reference (DCSO/fever) checks indicator-of-compromise strings against a
Bloom filter loaded from a file produced by the public ``github.com/DCSO/bloom``
library v0.2.3 (/root/reference/go.mod:6; load site
/root/reference/processing/bloom_handler.go:104-117 with an empty-filter
fallback for empty / "k too high" files).  This module re-implements that
filter from the library's public format so filters built here are readable by
the reference toolchain and vice versa:

* ``Initialize(n, p)`` parameter derivation:
  ``m = ceil(|n * ln(p)| / ln(2)^2)``, ``M = ceil(m/64)``,
  ``k = ceil(ln(2) * m / n)``.
* Double hashing (Kirsch–Mitzenmacher): index_i = (h1 + i*h2) mod m with
  h1 = FNV-1 64, h2 = FNV-1a 64 (Go stdlib ``hash/fnv``; uint64 wraparound).
* Bit array of ``M`` little-endian uint64 words; bit ``x`` lives at word
  ``x >> 6``, bit ``x & 63``.
* File layout, little-endian: n:u64, p:f64, k:u64, m:u64, N:u64, then the
  ``M`` uint64 words, then an arbitrary trailing ``Data`` blob until EOF.
  Optionally gzip-wrapped (fever's ``--bloom-zipped``).
* Readers reject files whose ``k`` exceeds a sanity cap with an error whose
  message contains "value of k (number of hash functions) is too high" —
  fever string-matches on exactly that text (bloom_handler.go:110).

All membership operations are vectorized over numpy batches.
"""

from __future__ import annotations

import gzip
import io
import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .hashing import fnv_pair

_MAX_K = 256  # sanity cap for deserialization (corrupt-file detection)

_HEADER = struct.Struct("<QdQQQ")  # n, p, k, m, N


class BloomKTooHighError(ValueError):
    def __init__(self) -> None:
        super().__init__("value of k (number of hash functions) is too high")


@dataclass
class BloomFilter:
    """DCSO-file-compatible Bloom filter with vectorized add/check/merge."""

    n: int
    p: float
    k: int
    m: int
    N: int
    v: np.ndarray  # uint64 words, len M = ceil(m/64)
    data: bytes = b""

    # -- construction ------------------------------------------------------
    @classmethod
    def initialize(cls, n: int, p: float) -> "BloomFilter":
        """Parameter derivation mirroring DCSO/bloom ``Initialize(n, p)``."""
        if n <= 0:
            raise ValueError("n must be positive")
        if not (0.0 < p < 1.0):
            raise ValueError("p must be in (0, 1)")
        m = int(abs(math.ceil(float(n) * math.log(p) / (math.log(2.0) ** 2))))
        big_m = int(math.ceil(m / 64.0))
        k = int(math.ceil(math.log(2.0) * m / n))
        return cls(n=n, p=p, k=k, m=m, N=0, v=np.zeros(big_m, dtype=np.uint64))

    @classmethod
    def empty_default(cls) -> "BloomFilter":
        """The fallback filter fever builds for empty/corrupt files
        (``bloom.Initialize(100, 0.00000001)``, bloom_handler.go:108)."""
        return cls.initialize(100, 0.00000001)

    # -- hashing -----------------------------------------------------------
    def _indices(self, values) -> np.ndarray:
        """(n_values, k) bit indices via double hashing, uint64 wraparound."""
        return self._indices_from_hashes(*fnv_pair(values))

    def _indices_from_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        with np.errstate(over="ignore"):
            return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m)

    # -- operations --------------------------------------------------------
    def add(self, values) -> None:
        """Insert a batch of byte strings (list/ndarray/pyarrow array)."""
        num = len(values)
        if num == 0:
            return
        self.add_hashes(*fnv_pair(values))

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        """Insert pre-computed (FNV-1, FNV-1a) hash pairs (hash-reuse path;
        bit-identical with ``add`` on the corresponding byte strings)."""
        num = len(h1)
        if num == 0:
            return
        idx = self._indices_from_hashes(h1, h2)
        words = (idx >> np.uint64(6)).ravel()
        bits = (np.uint64(1) << (idx & np.uint64(63))).ravel()
        np.bitwise_or.at(self.v, words.astype(np.int64), bits)
        self.N += num

    def check(self, values) -> np.ndarray:
        """Vectorized membership test → bool ndarray."""
        num = len(values)
        if num == 0:
            return np.zeros(0, dtype=bool)
        return self.check_hashes(*fnv_pair(values))

    def check_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """Membership for pre-computed (FNV-1, FNV-1a) hash pairs — the
        probe mirror of ``add_hashes`` (bit-identical with ``check`` on the
        corresponding byte strings; ``check`` routes through here)."""
        num = len(h1)
        if num == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices_from_hashes(h1, h2)
        words = (idx >> np.uint64(6)).astype(np.int64)
        bits = np.uint64(1) << (idx & np.uint64(63))
        return ((self.v[words] & bits) != 0).all(axis=1)

    def check_one(self, value) -> bool:
        return bool(self.check([value])[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Associative, commutative union (same-parameter filters only)."""
        if (self.n, self.k, self.m) != (other.n, other.k, other.m):
            raise ValueError("cannot merge Bloom filters with different parameters")
        self.v |= other.v
        self.N += other.N
        return self

    # -- serialization (DCSO/bloom file format) ----------------------------
    def to_bytes(self) -> bytes:
        out = io.BytesIO()
        self.write(out)
        return out.getvalue()

    def write(self, fh) -> None:
        fh.write(_HEADER.pack(self.n, self.p, self.k, self.m, self.N))
        fh.write(self.v.astype("<u8").tobytes())
        if self.data:
            fh.write(self.data)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        return cls.read(io.BytesIO(blob))

    @classmethod
    def read(cls, fh) -> "BloomFilter":
        header = fh.read(_HEADER.size)
        if len(header) == 0:
            raise EOFError("empty bloom filter file")
        if len(header) < _HEADER.size:
            raise ValueError("truncated bloom filter header")
        n, p, k, m, N = _HEADER.unpack(header)
        if k > _MAX_K:
            raise BloomKTooHighError()
        big_m = int(math.ceil(m / 64.0))
        body = fh.read(8 * big_m)
        if len(body) < 8 * big_m:
            raise ValueError("truncated bloom filter bit array")
        v = np.frombuffer(body, dtype="<u8").astype(np.uint64)
        data = fh.read()
        return cls(n=n, p=p, k=k, m=m, N=N, v=v, data=data or b"")

    def save(self, path: str, compressed: bool = False) -> None:
        if compressed:
            # fixed mtime → byte-deterministic artifact
            with open(path, "wb") as raw, gzip.GzipFile(
                fileobj=raw, mode="wb", mtime=0
            ) as fh:
                self.write(fh)
        else:
            with open(path, "wb") as fh:
                self.write(fh)

    @classmethod
    def load(cls, path: str, compressed: bool = False) -> "BloomFilter":
        opener = gzip.open if compressed else open
        with opener(path, "rb") as fh:
            return cls.read(fh)

    @classmethod
    def load_with_fallback(cls, path: str, compressed: bool = False) -> "BloomFilter":
        """fever's load semantics (bloom_handler.go:104-117): an empty file or
        a corrupt one whose k is implausibly high falls back to an empty
        default filter instead of failing."""
        try:
            return cls.load(path, compressed=compressed)
        except (EOFError, BloomKTooHighError):
            return cls.empty_default()

    # -- introspection -----------------------------------------------------
    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.v.view(np.uint8)).sum()) / float(self.m)

    def __contains__(self, value) -> bool:
        return self.check_one(value)


def build_filter(values, n: int | None = None, p: float = 1e-6) -> BloomFilter:
    """Build a filter sized for ``values`` (or explicit capacity ``n``)."""
    values = list(values) if not hasattr(values, "__len__") else values
    cap = n if n is not None else max(len(values), 1)
    bf = BloomFilter.initialize(cap, p)
    bf.add(values)
    return bf
