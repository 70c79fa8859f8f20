"""KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016), numpy buffers.

Complements the t-digest with a sketch that has *worst-case* rank-error
guarantees: for parameter k the additive rank error is O(1/k) with high
probability (ε ≈ 2.296/k at 99% confidence for the standard variant; see
also "Relative Error Streaming Quantiles", PODS 2021, for the follow-up
family).  Default k=200 → ~1.1% rank error.

Structure: a stack of compactors; items at level i carry weight 2^i.  A full
level is sorted and every other item (random parity, seeded RNG) is promoted
to level i+1.  Level capacities decay geometrically (c = 2/3) from the top.

Merge: concatenate per-level buffers then re-compact — associative within
the error bound (asserted in tests by permuting merge orders).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"FRKL"
_C = 2.0 / 3.0


def _capacity(k: int, height: int, level: int) -> int:
    depth = height - level - 1
    return max(int(np.ceil(k * (_C**depth))), 2)


@dataclass
class KLL:
    k: int = 200
    compactors: list = field(default_factory=lambda: [np.zeros(0)])
    n: int = 0
    min_val: float = np.inf
    max_val: float = -np.inf
    seed: int = 0xF5EE

    @classmethod
    def create(cls, k: int = 200, seed: int = 0xF5EE) -> "KLL":
        return cls(k=k, seed=seed)

    @property
    def height(self) -> int:
        return len(self.compactors)

    def _total_capacity(self) -> int:
        return sum(_capacity(self.k, self.height, lv) for lv in range(self.height))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def update(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.n += len(vals)
        self.min_val = min(self.min_val, float(vals.min()))
        self.max_val = max(self.max_val, float(vals.max()))
        self.compactors[0] = np.concatenate([self.compactors[0], vals])
        self._compress()

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for lv in range(self.height):
                if len(self.compactors[lv]) > _capacity(self.k, self.height, lv):
                    self._compact_level(lv)
                    break
            else:
                break

    def _compact_level(self, lv: int) -> None:
        buf = np.sort(self.compactors[lv], kind="stable")
        # deterministic-but-unbiased parity choice: seeded by sketch seed,
        # level, and a running counter folded from n (no wall clock / global RNG)
        rng = np.random.default_rng((self.seed, lv, self.n, len(buf)))
        offset = int(rng.integers(0, 2))
        promoted = buf[offset::2]
        if len(buf) % 2 == 1:
            # odd item count: keep the unpaired last item at this level
            self.compactors[lv] = buf[-1:]
            promoted = buf[offset : len(buf) - 1 : 2]
        else:
            self.compactors[lv] = np.zeros(0)
        if lv + 1 == self.height:
            self.compactors.append(np.zeros(0))
        self.compactors[lv + 1] = np.concatenate([self.compactors[lv + 1], promoted])

    def merge(self, other: "KLL") -> "KLL":
        if other.n == 0:
            return self
        self.n += other.n
        self.min_val = min(self.min_val, other.min_val)
        self.max_val = max(self.max_val, other.max_val)
        while self.height < other.height:
            self.compactors.append(np.zeros(0))
        for lv in range(other.height):
            self.compactors[lv] = np.concatenate(
                [self.compactors[lv], other.compactors[lv]]
            )
        self._compress()
        return self

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for lv, buf in enumerate(self.compactors):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), float(2**lv)))
        if not items:
            return np.zeros(0), np.zeros(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        if q <= 0:
            return self.min_val
        if q >= 1:
            return self.max_val
        items, weights = self._items_weights()
        cum = np.cumsum(weights)
        target = q * cum[-1]
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(items) - 1)
        return float(items[i])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    def rank(self, x: float) -> float:
        """Approximate normalized rank of x."""
        if self.n == 0:
            return float("nan")
        items, weights = self._items_weights()
        mask = items <= x
        return float(weights[mask].sum() / weights.sum())

    @property
    def epsilon(self) -> float:
        return 2.296 / self.k

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<iqddqi", self.k, self.n, self.min_val, self.max_val, self.seed, self.height
        )
        parts = [_MAGIC, head]
        for buf in self.compactors:
            parts.append(struct.pack("<q", len(buf)))
            parts.append(np.asarray(buf, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        if blob[:4] != _MAGIC:
            raise ValueError("not a KLL blob")
        k, n, mn, mx, seed, height = struct.unpack("<iqddqi", blob[4:44])
        off = 44
        compactors = []
        for _ in range(height):
            (ln,) = struct.unpack("<q", blob[off : off + 8])
            off += 8
            compactors.append(
                np.frombuffer(blob[off : off + 8 * ln], dtype="<f8").astype(np.float64)
            )
            off += 8 * ln
        return cls(
            k=k, compactors=compactors, n=n, min_val=mn, max_val=mx, seed=seed
        )
