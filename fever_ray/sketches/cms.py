"""Count-Min sketch for heavy-hitter / frequency estimation.

Replaces the reference's unbounded in-memory count maps (e.g. the flow
report's per-(dest_ip, hostname) proxy map, /root/reference/processing/
unicorn_aggregator.go:157-165, and per-tuple flow counts) whose key space is
unbounded at web scale.

Algorithm: Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005).  A depth×width
uint64 matrix; point estimate = min over rows; overcount ≤ ε·N with
probability ≥ 1−δ where ε = e/width, δ = e^−depth.

Merge = elementwise matrix add (associative/commutative, bit-identical under
any merge order).  A small exact heap of candidate heavy keys can ride along
(``track`` updates) so top-k recovery doesn't need a second pass.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from .hashing import hash64, hash64_ints, splitmix64

_MAGIC = b"FRCM"


@dataclass
class CountMin:
    width: int
    depth: int
    table: np.ndarray  # (depth, width) uint64
    total: int = 0
    # optional exact candidate set for top-k recovery (merged by union+max-est)
    candidates: dict = field(default_factory=dict)

    @classmethod
    def create(cls, width: int = 2048, depth: int = 5) -> "CountMin":
        return cls(width=width, depth=depth, table=np.zeros((depth, width), dtype=np.uint64))

    @classmethod
    def from_error(cls, epsilon: float, delta: float) -> "CountMin":
        width = int(math.ceil(math.e / epsilon))
        depth = int(math.ceil(math.log(1.0 / delta)))
        return cls.create(width=width, depth=depth)

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _cols(self, values) -> np.ndarray:
        """(depth, n) column indices; one independent hash family per row.

        Plain Python lists of ints coerce to the int hash family so update
        and query can never dispatch differently for the same keys (list
        inputs previously crashed in the byte hasher, so this changes no
        behavior that ever worked)."""
        if isinstance(values, list):
            arr = np.asarray(values)
            values = arr if np.issubdtype(arr.dtype, np.integer) else values
        hasher = hash64
        if isinstance(values, np.ndarray) and np.issubdtype(values.dtype, np.integer):
            hasher = hash64_ints
        cols = np.empty((self.depth, len(values)), dtype=np.int64)
        for d in range(self.depth):
            cols[d] = (hasher(values, seed=d + 1) % np.uint64(self.width)).astype(np.int64)
        return cols

    def _cols_from_fnv(self, h2: np.ndarray) -> np.ndarray:
        """Column indices from a pre-computed FNV-1a base hash — replicates
        ``hash64(values, seed=d+1)`` exactly (hash-reuse fast path)."""
        cols = np.empty((self.depth, len(h2)), dtype=np.int64)
        with np.errstate(over="ignore"):
            for d in range(self.depth):
                seed_arr = np.full(len(h2), np.uint64(d + 1))
                h = splitmix64(h2 ^ splitmix64(seed_arr))
                cols[d] = (h % np.uint64(self.width)).astype(np.int64)
        return cols

    def update_from_fnv(self, h2: np.ndarray, values=None, track: bool = False) -> None:
        """Add one count per pre-hashed key (bit-identical with ``update``).
        ``values`` supplies the original strings when ``track=True``."""
        n = len(h2)
        if n == 0:
            return
        counts = np.ones(n, dtype=np.uint64)
        cols = self._cols_from_fnv(h2)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], counts)
        self.total += n
        if track and values is not None:
            for kk in _unique_list(values):
                self.candidates[kk if isinstance(kk, (str, bytes)) else str(kk)] = None

    def update(self, values, counts=None, track: bool = False, conservative: bool = False) -> None:
        """Add a batch of keys with optional per-key counts.

        ``track=True`` also records the (unique) keys of this batch in the
        exact candidate dict for later top-k recovery.

        ``conservative=True`` applies conservative update (Estan & Varghese,
        SIGCOMM 2002): each key's counters only rise to min-estimate+count,
        which tightens the overcount on skewed streams.  Partials updated
        conservatively still merge ADDITIVELY (each partial never
        undercounts its share, so the sum never undercounts the total); the
        merged bound sits between plain CMS and a fully sequential
        conservative stream."""
        n = len(values)
        if n == 0:
            return
        if counts is None:
            counts = np.ones(n, dtype=np.uint64)
        else:
            counts = np.asarray(counts, dtype=np.uint64)
        if conservative:
            self._update_conservative(values, counts)
        else:
            cols = self._cols(values)
            for d in range(self.depth):
                np.add.at(self.table[d], cols[d], counts)
            self.total += int(counts.sum())
        if track:
            for v in _unique_list(values):
                self.candidates[v if isinstance(v, (str, bytes)) else str(v)] = None

    def _update_conservative(self, values, counts: np.ndarray) -> None:
        # aggregate duplicate keys first so each unique key is applied once.
        # The key dtype must survive aggregation: _cols hashes integer
        # ndarrays with hash64_ints and str/bytes with hash64, so a str
        # round-trip here would land int keys in different counters than
        # query() reads (and crash on non-UTF-8 bytes).
        if isinstance(values, np.ndarray) and np.issubdtype(values.dtype, np.integer):
            uniq, inverse = np.unique(values, return_inverse=True)
        else:
            vals = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
            index: dict = {}
            inverse = np.empty(len(vals), dtype=np.int64)
            for i, v in enumerate(vals):
                inverse[i] = index.setdefault(v, len(index))
            uniq = list(index)
        agg = np.zeros(len(uniq), dtype=np.uint64)
        np.add.at(agg, inverse, counts)
        cols = self._cols(uniq)
        est = self.table[0][cols[0]].copy()
        for d in range(1, self.depth):
            np.minimum(est, self.table[d][cols[d]], out=est)
        target = est + agg
        for d in range(self.depth):
            np.maximum.at(self.table[d], cols[d], target)
        self.total += int(counts.sum())

    def query(self, values) -> np.ndarray:
        """Point estimates (min over depth rows) → uint64 ndarray."""
        if len(values) == 0:
            return np.zeros(0, dtype=np.uint64)
        cols = self._cols(values)
        ests = np.empty((self.depth, len(cols[0])), dtype=np.uint64)
        for d in range(self.depth):
            ests[d] = self.table[d][cols[d]]
        return ests.min(axis=0)

    def query_one(self, value) -> int:
        return int(self.query([value])[0])

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge CMS with different dimensions")
        self.table += other.table
        self.total += other.total
        for k in other.candidates:
            self.candidates[k] = None
        return self

    def inner_product(self, other: "CountMin") -> int:
        """Join-size / inner-product estimate a·b = Σ_key f_a(key)·f_b(key)
        (Cormode & Muthukrishnan 2005 §4.2): min over rows of the row-wise
        dot product of the two tables.  Requires identical dimensions (the
        seeded hash family is a pure function of width/depth/row, so two
        same-shaped sketches built anywhere share it).  Guarantees:
        NEVER undercounts (every row's dot product = true a·b plus
        nonnegative cross-collision mass), and overcounts by ≤ ε·N_a·N_b
        with probability ≥ 1−δ (ε = e/width, δ = e^−depth).  uint64 tables
        are dotted in Python ints — no float rounding, no overflow."""
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot inner-product CMS with different dimensions")
        best = None
        for d in range(self.depth):
            v = int(
                np.dot(
                    self.table[d].astype(object), other.table[d].astype(object)
                )
            )
            best = v if best is None else min(best, v)
        return int(best or 0)

    def top_k(self, k: int) -> list[tuple[str, int]]:
        """Top-k candidates by estimated count (requires tracked updates)."""
        keys = list(self.candidates)
        if not keys:
            return []
        ests = self.query(keys)
        order = np.argsort(-ests.astype(np.int64), kind="stable")
        return [(keys[i], int(ests[i])) for i in order[:k]]

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        cand = "\x00".join(self.candidates).encode("utf-8", "surrogateescape")
        head = struct.pack("<IIQI", self.width, self.depth, self.total, len(cand))
        return _MAGIC + head + self.table.astype("<u8").tobytes() + cand

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMin":
        if blob[:4] != _MAGIC:
            raise ValueError("not a CMS blob")
        width, depth, total, clen = struct.unpack("<IIQI", blob[4:24])
        body = np.frombuffer(blob[24 : 24 + 8 * width * depth], dtype="<u8")
        table = body.astype(np.uint64).reshape(depth, width)
        cand_blob = blob[24 + 8 * width * depth : 24 + 8 * width * depth + clen]
        cands = {}
        if cand_blob:
            for kk in cand_blob.decode("utf-8", "surrogateescape").split("\x00"):
                cands[kk] = None
        return cls(width=width, depth=depth, table=table, total=total, candidates=cands)


def _tolist(values):
    if hasattr(values, "to_pylist"):
        return values.to_pylist()
    if isinstance(values, np.ndarray):
        return values.tolist()
    return list(values)


def _unique_list(values):
    """Distinct values with dedup done in C (pyarrow/numpy), not Python."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            return pc.unique(values).to_pylist()
    except ImportError:
        pass
    if isinstance(values, np.ndarray):
        return np.unique(values).tolist()
    return list(dict.fromkeys(values))
