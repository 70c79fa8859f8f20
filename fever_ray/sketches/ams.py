"""AMS / CountSketch second-moment (F₂) estimator.

Estimates F₂ = Σ_k f_k² — the self-join size of a key column (equivalently
the collision mass that governs hash-join partition sizing and repeated-key
skew) — in O(r·b) integer counters:

* Alon, Matias, Szegedy, "The space complexity of approximating the
  frequency moments" (STOC 1996): the ±1-signed sum sketch Z = Σ s(k)·f_k
  has E[Z²] = F₂ and Var[Z²] ≤ 2F₂².
* Charikar, Chen, Farach-Colton, "Finding frequent items in data streams"
  (ICALP 2002): bucketizing into b counters per lane (CountSketch rows)
  gives each lane estimate Σ_j C_j² with E = F₂, Var ≤ 2F₂²/b — i.e. a
  single lane is within ε·F₂ for ε = √(8/b) with probability ≥ 3/4, and
  the MEDIAN over r independent lanes drives the failure probability down
  exponentially in r (the standard median-of-means boost).

Everything is deterministic (hash/sign lanes derive from splitmix64 with
fixed lane seeds) and the counters are plain int64, so ``merge`` is
elementwise addition — associative, commutative, and BIT-IDENTICAL under
any partial order, like HLL/CMS/Bloom.  int64 never overflows below
|stream| < 2^63 absolute updates.

The reference keeps exact per-key multiplicity maps wherever it needs this
quantity (e.g. the flow/DNS aggregation maps under a mutex); at 10^12 keys
only a sketch answers.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import hash64, hash64_ints, splitmix64

_MAGIC = b"FRAM"


class AMSSketch:
    __slots__ = ("r", "b", "seed", "counters", "n")

    def __init__(self, r: int, b: int, seed: int, counters: np.ndarray, n: int):
        self.r = r
        self.b = b
        self.seed = seed
        self.counters = counters
        self.n = n

    @classmethod
    def create(cls, r: int = 7, b: int = 1024, seed: int = 0) -> "AMSSketch":
        if r < 1:
            raise ValueError(f"AMSSketch: r must be >= 1, got {r}")
        if b < 2 or (b & (b - 1)):
            raise ValueError(f"AMSSketch: b must be a power of two >= 2, got {b}")
        return cls(r, b, seed, np.zeros((r, b), dtype=np.int64), 0)

    # -- ingestion ----------------------------------------------------------

    def _lane(self, h: np.ndarray, lane: int) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, sign) for one lane — the ONE derivation shared by ingest
        and point query so the two can never disagree on placement."""
        hl = splitmix64(h ^ np.uint64((self.seed << 8) ^ (lane * 2 + 1)))
        bucket = (hl & np.uint64(self.b - 1)).astype(np.int64)
        sign = np.where((hl >> np.uint64(63)).astype(np.int64) == 1, 1, -1)
        return bucket, sign

    def _ingest_hashes(self, h: np.ndarray, weights=None) -> None:
        for lane in range(self.r):
            # independent bucket/sign lanes: one extra splitmix per lane
            bucket, sign = self._lane(h, lane)
            if weights is not None:
                sign = sign * weights
            np.add.at(self.counters[lane], bucket, sign)
        # n is the STREAM MASS: weighted updates count their weight sum, so
        # weighted and repeat ingestion of the same stream agree on n too
        self.n += int(weights.sum()) if weights is not None else len(h)

    def update(self, values, weights=None) -> None:
        """Ingest string/bytes keys (optionally int64 weights per key)."""
        if weights is not None:
            weights = np.asarray(weights, dtype=np.int64)
        self._ingest_hashes(hash64(values), weights)

    def update_ints(self, values: np.ndarray, weights=None) -> None:
        if weights is not None:
            weights = np.asarray(weights, dtype=np.int64)
        self._ingest_hashes(
            hash64_ints(np.asarray(values, dtype=np.int64)), weights
        )

    def merge(self, other: "AMSSketch") -> "AMSSketch":
        if (self.r, self.b, self.seed) != (other.r, other.b, other.seed):
            raise ValueError(
                "AMSSketch: merge parameter mismatch "
                f"({self.r},{self.b},{self.seed}) vs "
                f"({other.r},{other.b},{other.seed})"
            )
        self.counters += other.counters
        self.n += other.n
        return self

    # -- queries -------------------------------------------------------------

    def estimate_f2(self) -> float:
        """Median over lanes of Σ_j C_j² — the F₂ (self-join size) estimate."""
        lane_est = (self.counters.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(lane_est))

    def rel_error_bound(self) -> float:
        """Single-lane 3/4-probability relative error √(8/b); the median of
        r lanes fails only if ≥ half the lanes fail (prob ≤ (1/4)^(r/2))."""
        return float(np.sqrt(8.0 / self.b))

    def _query_hashes(self, h: np.ndarray) -> np.ndarray:
        ests = np.empty((self.r, len(h)), dtype=np.int64)
        for lane in range(self.r):
            bucket, sign = self._lane(h, lane)
            ests[lane] = sign * self.counters[lane][bucket]
        ests.sort(axis=0, kind="stable")
        if self.r % 2:
            # odd r: the median IS a lane value — exact int64, no float
            return ests[self.r // 2]
        mid = self.r // 2
        # float64 BEFORE the sum: two extreme int64 lane values can
        # overflow int64 (numpy wraps silently)
        return (ests[mid - 1].astype(np.float64) + ests[mid]) / 2.0

    def query(self, values) -> np.ndarray:
        """CountSketch point-frequency estimates (Charikar, Chen,
        Farach-Colton ICALP'02 §3): per key, the median over r lanes of
        sign·counter.  Each lane is UNBIASED (E = f_k; the ±1 signs cancel
        every other key in expectation) with Var ≤ F₂/b, so a lane lands
        within √(8·F₂/b) of the true count with probability ≥ 7/8
        (Chebyshev), and the median of r lanes fails only if ≥ r/2 lanes
        fail — probability ≤ exp(−r/6) by Chernoff.  Unlike Count-Min the
        estimate is two-sided (can undercount) but unbiased, which makes
        it the right primitive for signed/compensated counts.  Odd ``r``
        returns exact int64 lane values (bit-stable); even ``r`` returns
        the float midpoint."""
        return self._query_hashes(hash64(values))

    def query_ints(self, values: np.ndarray) -> np.ndarray:
        return self._query_hashes(hash64_ints(np.asarray(values, dtype=np.int64)))

    def point_error_bound(self, f2: float) -> float:
        """|estimate − f_k| ≤ √(8·F₂/b) per lane with prob ≥ 7/8; pass the
        EXACT F₂ when available (gates), else ``estimate_f2()``."""
        return float(np.sqrt(8.0 * f2 / self.b))

    # -- serialization -------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<iiqq", self.r, self.b, self.seed, self.n)
        return _MAGIC + head + self.counters.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "AMSSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not an AMSSketch blob")
        r, b, seed, n = struct.unpack("<iiqq", blob[4:28])
        counters = (
            np.frombuffer(blob[28: 28 + r * b * 8], dtype=np.int64)
            .reshape(r, b)
            .copy()
        )
        return cls(r, b, seed, counters, n)
