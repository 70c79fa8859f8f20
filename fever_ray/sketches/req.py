"""REQ quantile sketch — Relative Error Streaming Quantiles (PODS 2021).

Complements KLL: KLL's guarantee is an ADDITIVE rank error (eps * n), which
is useless deep in a tail — at q=0.999 over 10^12 docs the KLL envelope is
~10^10 ranks wide.  The REQ sketch (Cormode, Karnin, Liberty, Thaler,
Vesely, "Relative Error Streaming Quantiles", PODS 2021) guarantees a
MULTIPLICATIVE error on high ranks: in high-ranks-accurate (HRA) mode the
rank estimate of x errs by at most eps * (n - rank(x)) with high
probability, so the q=0.999 envelope is 1000x tighter than the median's.
That is exactly the shape a web-corpus audit needs: p99.9 html byte
lengths, tail latencies, the "how big is the biggest 0.1%%" question.

Structure (follows the paper's relative-compactor, same skeleton as the
Apache DataSketches ReqSketch, reimplemented from the published
description): a stack of compactors; items at level L weigh 2^L.  Each
compactor's buffer is split into numSections sections of sectionSize items;
compaction only ever touches the LOW end of the sorted buffer and always
protects the top half plus a schedule-dependent number of whole sections.
The schedule (how many sections join compaction #C) follows the number of
trailing ones in C's binary representation, so sections nearer the
protected top are compacted geometrically less often — that is what turns
the additive KLL bound into a relative one.  Every time a compactor has
performed 2^(numSections-1) compactions, numSections doubles and
sectionSize shrinks by sqrt(2) (never below 4), growing capacity
O(sqrt(log n)) as the paper requires.

Merge: per-level buffer concatenation, adopting the wider section layout of
the two sides, then re-compress — associative within the error bound
(permutation tests assert it).  The promotion coin is seeded by
(seed, level, compaction-state), never the wall clock, so builds are
deterministic and resume-safe.

Replaces the reference's per-handler percentile-free profiling counters
(/root/reference/processing/flow_profiler.go:93-107 keeps only sums) with a
mergeable tail-quantile summary.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = b"FRRQ"
_SQRT2 = float(np.sqrt(2.0))
_MIN_SECTION = 4
_INIT_SECTIONS = 3


def _even(x: float) -> int:
    e = int(round(x / 2.0)) * 2
    return max(e, 2)


def _trailing_ones(c: int) -> int:
    t = 0
    while c & 1:
        t += 1
        c >>= 1
    return t


@dataclass
class _Compactor:
    section_size: float
    num_sections: int
    state: int  # compaction counter (drives the section schedule)
    buf: np.ndarray

    @property
    def capacity(self) -> int:
        return 2 * self.num_sections * _even(self.section_size)

    def copy(self) -> "_Compactor":
        return _Compactor(self.section_size, self.num_sections, self.state, self.buf.copy())


@dataclass
class REQ:
    """High-ranks-accurate REQ sketch over float64 values."""

    k: int = 32  # initial section size (even); bigger = tighter tails
    compactors: list = field(default_factory=list)
    n: int = 0
    min_val: float = np.inf
    max_val: float = -np.inf
    seed: int = 0x9E0

    @classmethod
    def create(cls, k: int = 32, seed: int = 0x9E0) -> "REQ":
        k = _even(max(k, _MIN_SECTION))
        sk = cls(k=k, seed=seed)
        sk.compactors.append(sk._new_compactor())
        return sk

    def _new_compactor(self) -> _Compactor:
        return _Compactor(float(self.k), _INIT_SECTIONS, 0, np.zeros(0))

    # ------------------------------------------------------------------ ingest
    def update(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return
        self.n += len(vals)
        self.min_val = min(self.min_val, float(vals.min()))
        self.max_val = max(self.max_val, float(vals.max()))
        c0 = self.compactors[0]
        c0.buf = np.concatenate([c0.buf, vals])
        self._compress()

    def _compress(self) -> None:
        lv = 0
        while lv < len(self.compactors):
            c = self.compactors[lv]
            if len(c.buf) >= c.capacity:
                self._compact_level(lv)
                # a compaction can overflow lv+1; loop continues upward
            lv += 1

    def _compact_level(self, lv: int) -> None:
        c = self.compactors[lv]
        buf = np.sort(c.buf, kind="stable")
        sec = _even(c.section_size)
        # sections joining this compaction: 1 + trailing ones of the state
        # counter, capped — the low sections every time, higher (more
        # protected) sections geometrically less often (paper sec. 3)
        secs = min(_trailing_ones(c.state) + 1, c.num_sections)
        # protected region: the top half of nominal capacity plus every
        # section NOT in this compaction
        protect = c.capacity // 2 + (c.num_sections - secs) * sec
        compact_n = len(buf) - protect
        if compact_n < 2:
            compact_n = 2
        compact_n -= compact_n & 1  # even count so pairs are whole
        low = buf[:compact_n]
        keep = buf[compact_n:]
        rng = np.random.default_rng((self.seed, lv, c.state, len(buf)))
        offset = int(rng.integers(0, 2))
        promoted = low[offset::2]
        c.buf = keep
        c.state += 1
        if c.state >= (1 << (c.num_sections - 1)) and c.section_size > _MIN_SECTION:
            c.section_size = max(c.section_size / _SQRT2, float(_MIN_SECTION))
            c.num_sections *= 2
            c.state = 0
        if lv + 1 == len(self.compactors):
            self.compactors.append(self._new_compactor())
        up = self.compactors[lv + 1]
        up.buf = np.concatenate([up.buf, promoted])

    # ------------------------------------------------------------------ merge
    def merge(self, other: "REQ") -> "REQ":
        if self.k != other.k:
            raise ValueError("cannot merge REQ sketches with different k")
        if other.n == 0:
            return self
        self.n += other.n
        self.min_val = min(self.min_val, other.min_val)
        self.max_val = max(self.max_val, other.max_val)
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(self._new_compactor())
        for lv, oc in enumerate(other.compactors):
            c = self.compactors[lv]
            # adopt the more-evolved section layout (wider, finer sections)
            # so the merged schedule is at least as protective as either side
            if oc.num_sections > c.num_sections:
                c.num_sections = oc.num_sections
                c.section_size = oc.section_size
            c.state = max(c.state, oc.state)
            if len(oc.buf):
                c.buf = np.concatenate([c.buf, oc.buf])
        self._compress()
        return self

    # ------------------------------------------------------------------ query
    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for lv, c in enumerate(self.compactors):
            if len(c.buf):
                items.append(c.buf)
                weights.append(np.full(len(c.buf), float(2**lv)))
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
        """Approximate normalized rank of x (fraction of items <= x)."""
        if self.n == 0:
            return float("nan")
        items, weights = self._items_weights()
        mask = items <= x
        return float(weights[mask].sum() / weights.sum())

    def tail_epsilon(self, q: float) -> float:
        """Conservative envelope on |est_rank - q| RELATIVE to the tail mass.

        The paper's guarantee is eps * (n - rank) with eps = O(1/k) up to a
        sqrt(log(eps n)) factor; the constant here (4/k, floored at 0.01
        absolute-of-tail) is a deliberately generous envelope validated
        empirically in tests at 1e5-1e6 scale (same posture as the t-digest
        module's empirical bound — documented, then gated).
        """
        return max(4.0 / self.k, 0.01) * (1.0 - q)

    # -------------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<iqddqi",
            self.k,
            self.n,
            self.min_val,
            self.max_val,
            self.seed,
            len(self.compactors),
        )
        parts = [_MAGIC, head]
        for c in self.compactors:
            parts.append(struct.pack("<diqq", c.section_size, c.num_sections, c.state, len(c.buf)))
            parts.append(np.asarray(c.buf, dtype="<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "REQ":
        if blob[:4] != _MAGIC:
            raise ValueError("not a REQ blob")
        k, n, mn, mx, seed, height = struct.unpack("<iqddqi", blob[4:44])
        off = 44
        comps = []
        for _ in range(height):
            ss, ns, st, ln = struct.unpack("<diqq", blob[off : off + 28])
            off += 28
            buf = np.frombuffer(blob[off : off + 8 * ln], dtype="<f8").astype(np.float64)
            off += 8 * ln
            comps.append(_Compactor(ss, int(ns), int(st), buf))
        return cls(k=k, compactors=comps, n=n, min_val=mn, max_val=mx, seed=seed)
