"""Dyadic-range Count-Min: range-count estimates over an integer domain.

Algorithm: Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005), §4.3 (range
queries / dyadic decomposition).  One Count-Min table per dyadic level
``l = 0 .. bits-1``; level ``l`` counts the prefix key ``value >> l``.  Any
range ``[lo, hi]`` inside the ``[0, 2^bits)`` universe decomposes into at
most ``2*bits`` canonical dyadic nodes, so a range-count estimate is the sum
of that many CMS point queries.

Guarantees (inherited from CMS, one table per level holding the same n
items):

* NEVER undercounts — every node query overcounts or is exact, so the sum
  over the decomposition overcounts or is exact.
* overcount ≤ 2·bits·ε·n per range with probability ≥ 1 − 2·bits·δ, where
  ε = e/width and δ = e^−depth (union bound over the ≤ 2·bits node queries).

Merge = per-level elementwise table add → bit-identical under any merge
order (the HLL/CMS/Bloom class, not the quantile class).

This is the classic optimizer/selectivity primitive ("how many rows fall in
[a, b]?") and, via binary search on the prefix rank, an ε·n-additive
quantile sketch over integer values — the reference engine answers such
questions only by exact in-memory maps (/root/reference/processing/
unicorn_aggregator.go:157-165), which do not exist at 10^12 rows.

Sizing note: memory = bits·depth·width·8 bytes PER PARTIAL (e.g. the
default 16·4·1024 = 512 KiB).  That is fine for per-batch partials at a few
hundred KB, but wide configs (bits=32, width=64k) belong on the
per-partition checkpoint path, not per-16k-row-batch partials.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .cms import CountMin

_MAGIC = b"FRDY"


def dyadic_decompose(lo: int, hi: int, bits: int) -> list[tuple[int, int]]:
    """Canonical dyadic cover of the inclusive integer range [lo, hi] within
    the [0, 2^bits) universe: at most 2·bits (level, prefix) nodes, where
    node (l, p) covers [p << l, ((p+1) << l) - 1]."""
    if lo > hi:
        return []
    if lo < 0 or hi >= (1 << bits):
        raise ValueError(f"range [{lo}, {hi}] outside [0, 2^{bits})")
    out: list[tuple[int, int]] = []
    level = 0
    while lo <= hi and level < bits:
        if lo & 1:
            out.append((level, lo))
            lo += 1
        if not (hi & 1):
            out.append((level, hi))
            hi -= 1
        lo >>= 1
        hi >>= 1
        level += 1
    if lo <= hi:
        # survived past the top level: lo == hi == 0 → the whole universe
        out.append((bits, 0))
    return out


@dataclass
class DyadicCountMin:
    bits: int
    width: int
    depth: int
    tables: np.ndarray  # (bits, depth, width) uint64
    total: int = 0

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, bits: int = 16, width: int = 1024, depth: int = 4) -> "DyadicCountMin":
        if not (1 <= bits <= 62):
            raise ValueError(f"bits must be in [1, 62], got {bits}")
        return cls(
            bits=bits,
            width=width,
            depth=depth,
            tables=np.zeros((bits, depth, width), dtype=np.uint64),
        )

    def _level_view(self, level: int) -> CountMin:
        """A zero-copy CountMin view over one level's table (shares hashing
        and query code with the point sketch — no reimplementation)."""
        return CountMin(width=self.width, depth=self.depth, table=self.tables[level])

    # ---------------------------------------------------------------- update
    def update(self, values, counts=None) -> None:
        """Ingest a batch of non-negative int64 values (optionally weighted).

        Vectorized: duplicates are pre-aggregated once with np.unique, then
        each of the ``bits`` levels applies one hashed scatter-add over the
        unique prefixes (coarser levels have fewer uniques)."""
        vals = np.asarray(values, dtype=np.int64)
        if len(vals) == 0:
            return
        if counts is None:
            counts = np.ones(len(vals), dtype=np.uint64)
        else:
            counts = np.asarray(counts, dtype=np.uint64)
            if len(counts) != len(vals):
                raise ValueError("values/counts length mismatch")
        if vals.min() < 0 or vals.max() >= (1 << self.bits):
            raise ValueError(
                f"values outside [0, 2^{self.bits}): "
                f"[{vals.min()}, {vals.max()}] — raise bits or clip upstream"
            )
        uniq, inverse = np.unique(vals, return_inverse=True)
        agg = np.zeros(len(uniq), dtype=np.uint64)
        np.add.at(agg, inverse, counts)
        for level in range(self.bits):
            prefixes = uniq >> level
            if level:
                # collapse prefixes that became equal at this coarser level
                prefixes, inv2 = np.unique(prefixes, return_inverse=True)
                cagg = np.zeros(len(prefixes), dtype=np.uint64)
                np.add.at(cagg, inv2, agg)
            else:
                cagg = agg
            cm = self._level_view(level)
            cols = cm._cols(prefixes)
            for d in range(self.depth):
                np.add.at(self.tables[level, d], cols[d], cagg)
        self.total += int(counts.sum())

    # --------------------------------------------------------------- queries
    def range_count(self, lo: int, hi: int) -> int:
        """Estimated number of ingested values in the inclusive [lo, hi].
        Never undercounts; overcount ≤ 2·bits·ε·total w.h.p."""
        est = 0
        for level, prefix in dyadic_decompose(int(lo), int(hi), self.bits):
            if level >= self.bits:
                est += self.total
            else:
                # int64 ndarray so the query hits the SAME int hash family
                # as update() (list input would route to the string hasher)
                q = np.array([prefix], dtype=np.int64)
                est += int(self._level_view(level).query(q)[0])
        return est

    def rank(self, x: int) -> int:
        """Estimated count of values ≤ x (prefix range count)."""
        if x < 0:
            return 0
        return self.range_count(0, min(int(x), (1 << self.bits) - 1))

    def quantile(self, q: float) -> int:
        """Smallest x whose estimated rank reaches ⌈q·total⌉ — an
        ε·bits-additive-rank quantile over the integer domain."""
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"q must be in [0, 1], got {q}")
        if self.total == 0:
            return 0
        target = max(1, int(np.ceil(q * self.total)))
        lo, hi = 0, (1 << self.bits) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if self.rank(mid) >= target:
                hi = mid
            else:
                lo = mid + 1
        return lo

    # ----------------------------------------------------------------- merge
    def merge(self, other: "DyadicCountMin") -> "DyadicCountMin":
        if (self.bits, self.width, self.depth) != (other.bits, other.width, other.depth):
            raise ValueError("cannot merge dyadic CMS with different dimensions")
        self.tables += other.tables
        self.total += other.total
        return self

    # -------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        head = struct.pack("<IIIQ", self.bits, self.width, self.depth, self.total)
        return _MAGIC + head + self.tables.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DyadicCountMin":
        if blob[:4] != _MAGIC:
            raise ValueError("not a dyadic-CMS blob")
        bits, width, depth, total = struct.unpack("<IIIQ", blob[4:24])
        body = np.frombuffer(blob[24 : 24 + 8 * bits * depth * width], dtype="<u8")
        return cls(
            bits=bits,
            width=width,
            depth=depth,
            tables=body.reshape(bits, depth, width).copy(),
            total=int(total),
        )
