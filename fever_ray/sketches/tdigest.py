"""t-digest quantile sketch (merging-digest variant, numpy).

Replaces exact per-key distribution tracking the reference cannot do at all
(it only keeps sums — e.g. flow byte counters, /root/reference/processing/
flow_profiler.go:93-107); we add real quantiles over html/text byte lengths
and warc_ts skew.

Algorithm: Dunning & Ertl, "Computing extremely accurate quantiles using
t-digests" (arXiv:1902.04023), the *merging* variant: buffered points are
sorted and merged into a bounded list of (mean, weight) centroids under the
k1 scale function k(q) = (δ/2π)·asin(2q−1), which bounds each centroid's
k-size to 1 and concentrates resolution at the tails.

Merge = concatenate centroid lists + re-compress.  Not bit-identical under
re-ordering (like any t-digest), but rank error stays within the documented
bound; merge-order invariance is asserted *within bound* in tests.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"FRTD"


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2.0 * np.pi)) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


@dataclass
class TDigest:
    delta: float = 100.0
    means: np.ndarray = field(default_factory=lambda: np.zeros(0))
    weights: np.ndarray = field(default_factory=lambda: np.zeros(0))
    total: float = 0.0
    min_val: float = np.inf
    max_val: float = -np.inf
    _buf: list = field(default_factory=list)

    @classmethod
    def create(cls, delta: float = 100.0) -> "TDigest":
        return cls(delta=delta)

    def update(self, values, weights=None) -> None:
        vals = np.asarray(values, dtype=np.float64)
        # one NaN mask applied to BOTH arrays — filtering only vals would
        # desynchronize the (vals, weights) pair buffered for _flush
        keep = ~np.isnan(vals)
        vals = vals[keep]
        if len(vals) == 0:
            return
        w = (
            np.ones(len(vals))
            if weights is None
            else np.asarray(weights, dtype=np.float64)[keep]
        )
        self._buf.append((vals, w))
        if sum(len(v) for v, _ in self._buf) > 16 * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        vals = np.concatenate([v for v, _ in self._buf] + [self.means])
        ws = np.concatenate([w for _, w in self._buf] + [self.weights])
        self._buf = []
        self._compress(vals, ws)

    def _compress(self, vals: np.ndarray, ws: np.ndarray) -> None:
        order = np.argsort(vals, kind="stable")
        vals, ws = vals[order], ws[order]
        total = float(ws.sum())
        self.total = total
        self.min_val = min(self.min_val, float(vals[0]))
        self.max_val = max(self.max_val, float(vals[-1]))
        # vectorized clustering under the k1 scale function: each point's
        # mid-rank q maps to k(q); points sharing floor(k) form one centroid,
        # which bounds every centroid's k-size by 1 (the t-digest invariant)
        # without a per-point Python loop.
        q_mid = (np.cumsum(ws) - ws / 2.0) / total
        k = _k1(q_mid, self.delta)
        bucket = np.floor(k).astype(np.int64)
        # reduce per bucket (buckets are contiguous because vals are sorted)
        change = np.nonzero(np.diff(bucket))[0] + 1
        starts = np.concatenate(([0], change))
        wsum = np.add.reduceat(ws, starts)
        vsum = np.add.reduceat(vals * ws, starts)
        self.means = vsum / wsum
        self.weights = wsum

    def merge(self, other: "TDigest") -> "TDigest":
        other._flush()
        if other.total > 0 or other._buf:
            self._buf.append((other.means.copy(), other.weights.copy()))
            self.min_val = min(self.min_val, other.min_val)
            self.max_val = max(self.max_val, other.max_val)
            self._flush()
        return self

    def quantile(self, q: float) -> float:
        self._flush()
        if self.total == 0:
            return float("nan")
        if q <= 0:
            return self.min_val
        if q >= 1:
            return self.max_val
        target = q * self.total
        cum = np.cumsum(self.weights) - self.weights / 2.0
        # linear interpolation between centroid means, clamped to [min,max]
        x = float(np.interp(target, cum, self.means))
        return float(np.clip(x, self.min_val, self.max_val))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    def cdf(self, x: float) -> float:
        self._flush()
        if self.total == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(x, self.means, cum) / self.total)

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        self._flush()
        head = struct.pack(
            "<dddqd", self.delta, self.min_val, self.max_val, len(self.means), self.total
        )
        return (
            _MAGIC
            + head
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        if blob[:4] != _MAGIC:
            raise ValueError("not a t-digest blob")
        delta, mn, mx, n, total = struct.unpack("<dddqd", blob[4:44])
        n = int(n)
        means = np.frombuffer(blob[44 : 44 + 8 * n], dtype="<f8").astype(np.float64)
        weights = np.frombuffer(blob[44 + 8 * n : 44 + 16 * n], dtype="<f8").astype(
            np.float64
        )
        return cls(
            delta=delta,
            means=means,
            weights=weights,
            total=total,
            min_val=mn,
            max_val=mx,
        )
