"""Linear counting — distinct-count estimation over FULLY DYNAMIC streams.

HLL registers only grow: once a key raises a register there is no way to
take it back, so a pipeline that retracts records (crawl revocations,
GDPR deletes, reconciliation against a correction stream) cannot keep a
distinct-count sketch current without a rebuild.  Linear counting (Whang,
Vander-Zanden, Taylor, ACM TODS 1990) fixes that with signed bucket
counters:

* every occurrence of key k adds +1 to bucket h(k); a removal adds −1;
* bucket b is OCCUPIED iff its net count ≠ 0 — duplicates inflate the
  count but never the occupancy, and removing every copy of a key empties
  its bucket again (multiset semantics: removals must match prior
  insertions, the same contract as the counting Bloom `cbf`);
* distinct estimate n̂ = −m·ln(V) where V = fraction of empty buckets —
  the MLE under Poisson bucket occupancy (TODS 1990 eq. 2), with relative
  std error √m·√(e^t − t − 1)/n at load t = n/m (eq. 12).

Merge is elementwise counter addition — associative, commutative,
BIT-IDENTICAL under any partial order (the hll/cms/bloom/cbf class) — and
``subtract`` retracts an entire independently-sketched stream, mirroring
`cbf.subtract`.  Space is Θ(m) with m sized to the distinct domain
(load ≤ ~1 for single-digit % error), the documented trade versus HLL's
loglog space: you pay linear space to buy deletability.

The reference keeps exact per-key maps and cannot retract anything once
flushed; at 10^12 keys with a correction stream only this shape answers.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import hash64, hash64_ints

_MAGIC = b"FRLC"


class LinearCounter:
    __slots__ = ("m", "seed", "counts", "n")

    def __init__(self, m: int, seed: int, counts: np.ndarray, n: int):
        self.m = m
        self.seed = seed
        self.counts = counts
        self.n = n  # net stream mass (inserts − removals)

    @classmethod
    def create(cls, m: int = 4096, seed: int = 0) -> "LinearCounter":
        if m < 2 or (m & (m - 1)):
            raise ValueError(f"LinearCounter: m must be a power of two >= 2, got {m}")
        return cls(m, seed, np.zeros(m, dtype=np.int64), 0)

    # -- ingestion ----------------------------------------------------------

    def _ingest(self, h: np.ndarray, sign: int) -> None:
        bucket = (h & np.uint64(self.m - 1)).astype(np.int64)
        np.add.at(self.counts, bucket, np.int64(sign))
        self.n += sign * len(h)

    def add(self, values) -> None:
        self._ingest(hash64(values, seed=self.seed), 1)

    def remove(self, values) -> None:
        """Retract occurrences previously added (multiset contract)."""
        self._ingest(hash64(values, seed=self.seed), -1)

    def add_ints(self, values: np.ndarray) -> None:
        self._ingest(
            hash64_ints(np.asarray(values, dtype=np.int64), seed=self.seed), 1
        )

    def remove_ints(self, values: np.ndarray) -> None:
        self._ingest(
            hash64_ints(np.asarray(values, dtype=np.int64), seed=self.seed), -1
        )

    # -- merge / retraction -------------------------------------------------

    def merge(self, other: "LinearCounter") -> "LinearCounter":
        if (self.m, self.seed) != (other.m, other.seed):
            raise ValueError(
                f"LinearCounter: merge mismatch ({self.m},{self.seed}) vs "
                f"({other.m},{other.seed})"
            )
        self.counts += other.counts
        self.n += other.n
        return self

    def subtract(self, other: "LinearCounter") -> "LinearCounter":
        """Retract a whole independently-sketched stream (cbf.subtract
        analog): counts -= other.counts.  Valid when other's stream is a
        sub-multiset of what this sketch ingested."""
        if (self.m, self.seed) != (other.m, other.seed):
            raise ValueError("LinearCounter: subtract parameter mismatch")
        self.counts -= other.counts
        self.n -= other.n
        return self

    # -- estimates ----------------------------------------------------------

    @property
    def occupied(self) -> int:
        return int(np.count_nonzero(self.counts))

    @property
    def debt(self) -> int:
        """Total negative mass — nonzero means removals that were never
        inserted (a contract violation worth asserting on)."""
        neg = self.counts[self.counts < 0]
        return int(-neg.sum())

    def estimate(self) -> float:
        """n̂ = −m·ln(empty/m); saturated (no empty buckets) returns the
        birthday-bound cap m·ln(m) — resize m, the estimate is meaningless
        there (documented linear-counting limit, TODS 1990 §4)."""
        empty = self.m - self.occupied
        if empty <= 0:
            return float(self.m * math.log(self.m))
        return float(-self.m * math.log(empty / self.m))

    def std_error(self, n: float | None = None) -> float:
        """Published absolute std error of n̂ at load t = n/m (TODS 1990
        eq. 12): σ = √m·√(e^t − t − 1).  Pass the exact n when gating,
        else the sketch's own estimate is used."""
        if n is None:
            n = self.estimate()
        t = max(float(n), 1.0) / self.m
        return float(math.sqrt(self.m * (math.exp(t) - t - 1.0)))

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Sparse when < m/8 buckets are occupied (a per-block partial
        touches at most block_rows buckets, so partial blobs are KB-sized
        however large m is — the grouped-sparse-HLL trick); dense
        otherwise.  Both shapes deserialize to the same counters."""
        nz = np.flatnonzero(self.counts)
        if len(nz) * 2 < self.m // 8:
            return (
                _MAGIC
                + struct.pack("<iiqbq", self.m, self.seed, self.n, 1, len(nz))
                + nz.astype("<i8").tobytes()
                + self.counts[nz].astype("<i8").tobytes()
            )
        return (
            _MAGIC
            + struct.pack("<iiqbq", self.m, self.seed, self.n, 0, 0)
            + self.counts.astype("<i8").tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "LinearCounter":
        if blob[:4] != _MAGIC:
            raise ValueError("not a LinearCounter blob")
        m, seed, n, sparse, k = struct.unpack("<iiqbq", blob[4:29])
        if sparse:
            idx = np.frombuffer(blob[29 : 29 + 8 * k], dtype="<i8")
            vals = np.frombuffer(blob[29 + 8 * k : 29 + 16 * k], dtype="<i8")
            counts = np.zeros(m, dtype=np.int64)
            counts[idx] = vals
        else:
            counts = np.frombuffer(blob[29 : 29 + 8 * m], dtype="<i8").astype(
                np.int64
            )
        return cls(m, seed, counts, n)
