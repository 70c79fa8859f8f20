"""DDSketch — relative-error quantiles with EXACTLY mergeable state.

"DDSketch: A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
Guarantees" (Masson, Rim, Lee — VLDB 2019).  The value axis is cut into
geometric buckets: index(x) = ceil(log_gamma(x)) with
gamma = (1 + alpha) / (1 - alpha), so every bucket's midpoint estimate
2 * gamma^i / (gamma + 1) is within a multiplicative alpha of EVERY value in
the bucket.  Any quantile answered from the bucket histogram is therefore
within relative error alpha of the exact order statistic — a VALUE-relative
guarantee, orthogonal to KLL's additive rank error and REQ's
tail-rank-relative error.

Why this member completes the quantile family: the store is a plain integer
histogram, so MERGE IS BUCKET-COUNT ADDITION — bit-identical and associative
with no coin flips, unlike t-digest (centroid order) and KLL/REQ (compaction
coins).  A 10^12-doc build can tree-merge partials in any order and every
ordering yields the same bytes (tests assert).  The price is that the size
is O(log(max/min)/log gamma) buckets, which for web byte lengths
(1..2^40, alpha=0.01) is ~2800 buckets of 12 bytes — still KB-scale.

Values <= 0: zeros are counted exactly in ``zero_count``; negatives go to a
mirrored store keyed on -x (paper sec. 2.3).  An optional collapse of the
LOWEST positive buckets bounds the store (``max_bins``); once collapsing has
triggered, merges remain within-bound but are no longer guaranteed
bit-identical — the default cap is high enough that the fever_ray pipelines
never collapse, and ``collapsed`` records if it ever happened.

Replaces the reference's sum-only profiling counters
(/root/reference/processing/flow_profiler.go:93-107) with a mergeable
relative-error quantile summary.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"FRDD"


def _empty_store() -> dict:
    return {"keys": np.zeros(0, np.int64), "counts": np.zeros(0, np.int64)}


def _store_add(store: dict, keys: np.ndarray, counts: np.ndarray) -> None:
    """Merge (keys, counts) pairs into a sorted-key store (pure int adds)."""
    if len(keys) == 0:
        return
    allk = np.concatenate([store["keys"], keys])
    allc = np.concatenate([store["counts"], counts])
    uk, inv = np.unique(allk, return_inverse=True)
    uc = np.zeros(len(uk), np.int64)
    np.add.at(uc, inv, allc)
    store["keys"], store["counts"] = uk, uc


@dataclass
class DDSketch:
    """Relative-error quantile sketch over float64 values (alpha-accurate)."""

    alpha: float = 0.01
    max_bins: int = 4096
    pos: dict = field(default_factory=_empty_store)
    neg: dict = field(default_factory=_empty_store)
    zero_count: int = 0
    n: int = 0
    collapsed: bool = False

    @classmethod
    def create(cls, alpha: float = 0.01, max_bins: int = 4096) -> "DDSketch":
        if not (0.0 < alpha < 1.0):
            raise ValueError("alpha must be in (0, 1)")
        return cls(alpha=alpha, max_bins=max_bins)

    @property
    def gamma(self) -> float:
        return (1.0 + self.alpha) / (1.0 - self.alpha)

    @property
    def _log_gamma(self) -> float:
        return float(np.log1p(self.alpha) - np.log1p(-self.alpha))

    # ------------------------------------------------------------------ ingest
    def _index(self, vals: np.ndarray) -> np.ndarray:
        return np.ceil(np.log(vals) / self._log_gamma).astype(np.int64)

    def update(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.n += len(vals)
        self.zero_count += int((vals == 0.0).sum())
        p = vals[vals > 0.0]
        if len(p):
            k, c = np.unique(self._index(p), return_counts=True)
            _store_add(self.pos, k, c.astype(np.int64))
        m = vals[vals < 0.0]
        if len(m):
            k, c = np.unique(self._index(-m), return_counts=True)
            _store_add(self.neg, k, c.astype(np.int64))
        self._maybe_collapse()

    def update_weighted(self, values, weights) -> None:
        """Weighted ingest: integer weight w counts as w occurrences of the
        value — bit-identical to ``update(np.repeat(values, weights))``
        (tests assert), but O(distinct buckets) instead of O(total weight).
        The weighted-quantile primitive (e.g. token-weighted length
        distributions) at corpus scale."""
        vals = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.int64)
        if len(w) != len(vals):
            raise ValueError("values/weights length mismatch")
        if (w < 0).any():
            raise ValueError("weights must be non-negative")
        mask = ~np.isnan(vals) & (w > 0)
        vals, w = vals[mask], w[mask]
        if len(vals) == 0:
            return
        self.n += int(w.sum())
        self.zero_count += int(w[vals == 0.0].sum())

        def _acc(store, v, vw):
            idx = self._index(v)
            uk, inv = np.unique(idx, return_inverse=True)
            uc = np.zeros(len(uk), np.int64)
            np.add.at(uc, inv, vw)
            _store_add(store, uk, uc)

        p = vals > 0.0
        if p.any():
            _acc(self.pos, vals[p], w[p])
        m = vals < 0.0
        if m.any():
            _acc(self.neg, -vals[m], w[m])
        self._maybe_collapse()

    def _maybe_collapse(self) -> None:
        # collapse the LOWEST positive buckets (nearest zero) into one so the
        # UPPER quantiles keep their guarantee — paper's collapsing variant
        st = self.pos
        over = len(st["keys"]) - self.max_bins
        if over <= 0:
            return
        self.collapsed = True
        spill = int(st["counts"][: over + 1].sum())
        st["keys"] = st["keys"][over:]
        st["counts"] = st["counts"][over:].copy()
        st["counts"][0] = spill

    # ------------------------------------------------------------------ merge
    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(self.alpha - other.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        self.n += other.n
        self.zero_count += other.zero_count
        self.collapsed = self.collapsed or other.collapsed
        _store_add(self.pos, other.pos["keys"], other.pos["counts"])
        _store_add(self.neg, other.neg["keys"], other.neg["counts"])
        self._maybe_collapse()
        return self

    # ------------------------------------------------------------------ query
    def _bucket_value(self, key: np.ndarray) -> np.ndarray:
        g = self.gamma
        return 2.0 * np.power(g, key.astype(np.float64)) / (g + 1.0)

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        q = min(max(q, 0.0), 1.0)
        rank = q * (self.n - 1)  # 0-based target rank, DataDog convention
        # walk: negatives (descending magnitude = ascending value), zeros, pos
        nk, nc = self.neg["keys"], self.neg["counts"]
        cum = 0
        if len(nk):
            # ascending value order = descending key order for the neg store
            rc = np.cumsum(nc[::-1])
            if rank < rc[-1]:
                i = int(np.searchsorted(rc, rank, side="right"))
                return -float(self._bucket_value(nk[::-1][i : i + 1])[0])
            cum = int(rc[-1])
        if rank < cum + self.zero_count:
            return 0.0
        cum += self.zero_count
        pk, pcnt = self.pos["keys"], self.pos["counts"]
        pc = np.cumsum(pcnt) + cum
        i = int(np.searchsorted(pc, rank, side="right"))
        i = min(i, len(pk) - 1)
        return float(self._bucket_value(pk[i : i + 1])[0])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in qs])

    @property
    def num_bins(self) -> int:
        return len(self.pos["keys"]) + len(self.neg["keys"])

    # -------------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<dqqqBqq",
            self.alpha,
            self.max_bins,
            self.zero_count,
            self.n,
            1 if self.collapsed else 0,
            len(self.pos["keys"]),
            len(self.neg["keys"]),
        )
        return b"".join(
            [
                _MAGIC,
                head,
                np.ascontiguousarray(self.pos["keys"], "<i8").tobytes(),
                np.ascontiguousarray(self.pos["counts"], "<i8").tobytes(),
                np.ascontiguousarray(self.neg["keys"], "<i8").tobytes(),
                np.ascontiguousarray(self.neg["counts"], "<i8").tobytes(),
            ]
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DDSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a DDSketch blob")
        alpha, max_bins, zc, n, col, np_, nn = struct.unpack("<dqqqBqq", blob[4:53])
        off = 53

        def arr(ln):
            nonlocal off
            a = np.frombuffer(blob[off : off + 8 * ln], dtype="<i8").astype(np.int64)
            off += 8 * ln
            return a

        pos = {"keys": arr(np_), "counts": arr(np_)}
        neg = {"keys": arr(nn), "counts": arr(nn)}
        return cls(
            alpha=alpha,
            max_bins=int(max_bins),
            pos=pos,
            neg=neg,
            zero_count=int(zc),
            n=int(n),
            collapsed=bool(col),
        )
