"""Counting Bloom filter: set membership with DELETION support.

Algorithm: Fan, Cao, Almeida & Broder, "Summary Cache: a scalable wide-area
web cache sharing protocol" (IEEE/ACM ToN 2000), §4.3 — a Bloom filter whose
bits are counters, so removals decrement where insertions incremented.

This is the batch-native answer to the reference's LIVE-mutable indicator
set (/root/reference/mgmt/mgmtserver.go:118-160 streams BloomAdd into a
running filter; retraction there needs a full rebuild): with counters,
retraction is SKETCH ALGEBRA — build one filter over the additions stream
and one over the retractions stream (two ordinary streaming passes), then
``subtract`` the second from the first.  No rebuild, no re-read of the
additions corpus.

Counters are signed int64 so additions and removals commute across
distributed partials: merge = elementwise counter ADD (bit-identical under
any merge order — the HLL/CMS/Bloom class), and a PARTIAL may transiently
hold negative counters if its removals outnumber its local insertions; only
the fully merged filter's counters are meaningful.  Standard counting-Bloom
semantics apply: removing an element never inserted is undefined (counters
can go globally negative — ``debt`` exposes that loudly).

Guarantees (with every removal matching a prior insertion):

* NO false negatives: a key with remaining multiset count ≥ 1 always tests
  positive (its k counters each hold ≥ its remaining count).
* False positives at the plain-Bloom rate over the REMAINING support:
  expected fpr ≈ fill_ratio^k where fill_ratio = fraction of counters ≥ 1.

Hash family: the same seeded splitmix64/FNV lanes as Count-Min (one
independent hash per lane), NOT the DCSO bloom codec's pinned
Kirsch-Mitzenmacher pair — this sketch is not byte-compatible with
DCSO/bloom files and must not be conflated with ``sketches.bloom``.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from .hashing import hash64, hash64_ints

_MAGIC = b"FRCB"


@dataclass
class CountingBloom:
    m: int  # number of counters
    k: int  # hash lanes
    counters: np.ndarray  # (m,) int64
    n_add: int = 0
    n_remove: int = 0

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, n: int = 100_000, p: float = 1e-4) -> "CountingBloom":
        """Size for ``n`` expected distinct remaining keys at false-positive
        rate ``p`` (the standard Bloom dimensioning)."""
        if not (0.0 < p < 1.0) or n <= 0:
            raise ValueError(f"need n > 0 and 0 < p < 1, got n={n} p={p}")
        m = int(math.ceil(-n * math.log(p) / (math.log(2.0) ** 2)))
        k = max(1, int(round(m / n * math.log(2.0))))
        return cls(m=m, k=k, counters=np.zeros(m, dtype=np.int64))

    # ----------------------------------------------------------------- lanes
    def _lanes(self, values) -> np.ndarray:
        """(k, n) counter indices; one independent seeded hash per lane.

        Dtype dispatch must be CONSISTENT between add/remove and contains
        (the round-1 CMS conservative-update lesson): int inputs — ndarray
        OR plain Python list — always take the int hash family, everything
        else the byte-string family."""
        if isinstance(values, list):
            arr = np.asarray(values)
            values = arr if np.issubdtype(arr.dtype, np.integer) else values
        hasher = hash64
        if isinstance(values, np.ndarray) and np.issubdtype(values.dtype, np.integer):
            hasher = hash64_ints
        idx = np.empty((self.k, len(values)), dtype=np.int64)
        for lane in range(self.k):
            idx[lane] = (hasher(values, seed=lane + 1) % np.uint64(self.m)).astype(
                np.int64
            )
        return idx

    # --------------------------------------------------------------- updates
    def _apply(self, values, counts, sign: int) -> None:
        n = len(values)
        if n == 0:
            return
        if counts is None:
            counts = np.ones(n, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
            if len(counts) != n:
                raise ValueError("values/counts length mismatch")
            if (counts < 0).any():
                raise ValueError("counts must be non-negative")
        idx = self._lanes(values)
        delta = sign * counts
        for lane in range(self.k):
            np.add.at(self.counters, idx[lane], delta)
        if sign > 0:
            self.n_add += int(counts.sum())
        else:
            self.n_remove += int(counts.sum())

    def add(self, values, counts=None) -> None:
        """Insert a batch of keys (optionally with multiplicities)."""
        self._apply(values, counts, 1)

    def remove(self, values, counts=None) -> None:
        """Retract a batch of previously inserted keys."""
        self._apply(values, counts, -1)

    # --------------------------------------------------------------- queries
    def contains(self, values) -> np.ndarray:
        """Boolean membership per key: all k lanes hold counter ≥ 1."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._lanes(values)
        ok = self.counters[idx[0]] >= 1
        for lane in range(1, self.k):
            ok &= self.counters[idx[lane]] >= 1
        return ok

    @property
    def fill_ratio(self) -> float:
        """Fraction of counters ≥ 1 (expected fpr ≈ fill_ratio ** k)."""
        return float((self.counters >= 1).sum()) / self.m

    @property
    def debt(self) -> int:
        """Total negative counter mass — nonzero on a FULLY MERGED filter
        means removals of never-inserted keys (a usage error); transiently
        nonzero on partials is expected and harmless."""
        neg = self.counters[self.counters < 0]
        return int(-neg.sum())

    # ---------------------------------------------------------------- merges
    def merge(self, other: "CountingBloom") -> "CountingBloom":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge counting blooms with different m/k")
        self.counters += other.counters
        self.n_add += other.n_add
        self.n_remove += other.n_remove
        return self

    def subtract(self, other: "CountingBloom") -> "CountingBloom":
        """Retract an entire filter's insertions in one step: the retraction
        stream sketched independently (same m/k), then subtracted here."""
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot subtract counting blooms with different m/k")
        self.counters -= other.counters
        self.n_remove += other.n_add
        # a subtracted filter's own removals cancel back in as additions
        self.n_add += other.n_remove
        return self

    # -------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        head = struct.pack("<QIQQ", self.m, self.k, self.n_add, self.n_remove)
        return _MAGIC + head + self.counters.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountingBloom":
        if blob[:4] != _MAGIC:
            raise ValueError("not a counting-bloom blob")
        m, k, n_add, n_remove = struct.unpack("<QIQQ", blob[4:32])
        body = np.frombuffer(blob[32 : 32 + 8 * m], dtype="<i8")
        return cls(
            m=int(m),
            k=int(k),
            counters=body.copy(),
            n_add=int(n_add),
            n_remove=int(n_remove),
        )
