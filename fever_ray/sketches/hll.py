"""HyperLogLog distinct-count sketch (dense, numpy registers).

Replaces the reference's exact distinct-sets (e.g. the DNS aggregator's
per-rrname distinct src/dst IP sets, /root/reference/processing/
dns_aggregator.go:145-168) which do not scale to 10^12 keys.

Algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm" (AofA 2007), with 64-bit
hashing (so no large-range correction is needed) and linear counting for the
small range, as in Heule et al. (HLL++, EDBT 2013) practice.

Relative standard error ≈ 1.04 / sqrt(m), m = 2^p registers.  p=14 →
m=16384 → ~0.81% RSE.

Merge = elementwise register max: associative, commutative, idempotent —
bit-identical results under any merge order (tested).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass

import numpy as np

from .hashing import hash64, hash64_ints

_MAGIC = b"FRHL"
_MAGIC_SPARSE = b"FRHS"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass
class HyperLogLog:
    """Dense by default; ``create(p, sparse=True)`` starts in sparse mode —
    (idx, rho) pairs instead of the 2^p register array — and auto-promotes
    to dense past m/4 distinct registers.  Sparse mode is what makes
    per-key grouped HLLs affordable at 10^12 group keys: a low-cardinality
    key's partial is tens of bytes, not 2^p.

    Dense materialization of a sparse sketch is bit-identical to the sketch
    having been dense all along (max per register), so merge invariants and
    estimates are unchanged (tested)."""

    p: int
    registers: np.ndarray | None  # uint8, len m = 2^p (None while sparse)
    sparse_idx: np.ndarray | None = None  # sorted unique int32 register ids
    sparse_rho: np.ndarray | None = None  # uint8 max-rho per id

    @classmethod
    def create(cls, p: int = 14, sparse: bool = False) -> "HyperLogLog":
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        if sparse:
            return cls(
                p=p,
                registers=None,
                sparse_idx=np.zeros(0, dtype=np.int32),
                sparse_rho=np.zeros(0, dtype=np.uint8),
            )
        return cls(p=p, registers=np.zeros(1 << p, dtype=np.uint8))

    @property
    def m(self) -> int:
        return 1 << self.p

    @property
    def is_sparse(self) -> bool:
        return self.registers is None

    def _densify(self) -> None:
        if self.registers is None:
            regs = np.zeros(self.m, dtype=np.uint8)
            if len(self.sparse_idx):
                regs[self.sparse_idx] = self.sparse_rho
            self.registers = regs
            self.sparse_idx = None
            self.sparse_rho = None

    def dense_registers(self) -> np.ndarray:
        """The dense register view (materializes without changing mode)."""
        if self.registers is not None:
            return self.registers
        regs = np.zeros(self.m, dtype=np.uint8)
        if len(self.sparse_idx):
            regs[self.sparse_idx] = self.sparse_rho
        return regs

    def _sparse_absorb(self, idx: np.ndarray, rho: np.ndarray) -> None:
        """Merge (idx, rho) observations into sparse state (max per id),
        promoting to dense past m/4 distinct registers."""
        all_idx = np.concatenate([self.sparse_idx, idx.astype(np.int32)])
        all_rho = np.concatenate([self.sparse_rho, rho.astype(np.uint8)])
        order = np.lexsort((-all_rho.astype(np.int64), all_idx))
        all_idx, all_rho = all_idx[order], all_rho[order]
        first = np.concatenate(([True], np.diff(all_idx) != 0))
        self.sparse_idx = all_idx[first]
        self.sparse_rho = all_rho[first]  # max rho = first in (-rho) order
        if len(self.sparse_idx) > self.m // 4:
            self._densify()

    def _update_hashes(self, h: np.ndarray) -> None:
        p64 = np.uint64(self.p)
        idx = (h >> (np.uint64(64) - p64)).astype(np.int64)
        # remaining 64-p bits, shifted left; rho = #leading zeros + 1
        w = h << p64
        # leading zero count of w within the full 64-bit word; w==0 → 64-p zeros
        # rho = position of first 1-bit from the left, 1-based, capped.
        nz = w != 0
        lz = np.full(len(h), np.uint64(64 - self.p), dtype=np.uint64)
        if nz.any():
            # log2 of the highest set bit: 63 - floor(log2(w))
            hw = w[nz]
            # float64 log2 is exact enough for bit position of uint64 values
            top = np.zeros(len(hw), dtype=np.uint64)
            hi = (hw >> np.uint64(32)).astype(np.uint64)
            lo32 = (hw & np.uint64(0xFFFFFFFF)).astype(np.uint64)
            use_hi = hi != 0
            top[use_hi] = 32 + np.floor(np.log2(hi[use_hi].astype(np.float64))).astype(np.uint64)
            top[~use_hi] = np.floor(np.log2(np.maximum(lo32[~use_hi], 1).astype(np.float64))).astype(np.uint64)
            lz_nz = np.uint64(63) - top
            lz[nz] = np.minimum(lz_nz, np.uint64(64 - self.p))
        rho = (lz + np.uint64(1)).astype(np.uint8)
        if self.registers is None:
            self._sparse_absorb(idx, rho)
        else:
            np.maximum.at(self.registers, idx, rho)

    def update(self, values) -> None:
        """Add a batch of byte strings (list / ndarray / pyarrow array)."""
        if len(values) == 0:
            return
        self._update_hashes(hash64(values))

    def update_hashes(self, h: np.ndarray) -> None:
        """Add pre-computed ``hash64`` values (hash-reuse fast path; must be
        the same hash family as ``update`` for bit-identical registers)."""
        if len(h):
            self._update_hashes(h)

    def update_ints(self, values: np.ndarray) -> None:
        if len(values) == 0:
            return
        self._update_hashes(hash64_ints(values))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("cannot merge HLLs with different precision")
        if self.is_sparse and other.is_sparse:
            self._sparse_absorb(other.sparse_idx, other.sparse_rho)
        elif self.is_sparse:
            self._densify()
            np.maximum(self.registers, other.registers, out=self.registers)
        elif other.is_sparse:
            if len(other.sparse_idx):
                np.maximum.at(self.registers, other.sparse_idx, other.sparse_rho)
        else:
            np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.dense_registers().astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.dense_registers() == 0))
            if zeros:
                return m * math.log(m / zeros)
        return float(e)

    @property
    def relative_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # -- serialization -----------------------------------------------------
    def to_bytes(self) -> bytes:
        if self.is_sparse:
            n = len(self.sparse_idx)
            return (
                _MAGIC_SPARSE
                + struct.pack("<BI", self.p, n)
                + self.sparse_idx.astype("<i4").tobytes()
                + self.sparse_rho.tobytes()
            )
        return _MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        if blob[:4] == _MAGIC_SPARSE:
            p, n = struct.unpack("<BI", blob[4:9])
            idx = np.frombuffer(blob[9 : 9 + 4 * n], dtype="<i4").astype(np.int32)
            rho = np.frombuffer(blob[9 + 4 * n : 9 + 5 * n], dtype=np.uint8).copy()
            return cls(p=p, registers=None, sparse_idx=idx, sparse_rho=rho)
        if blob[:4] != _MAGIC:
            raise ValueError("not an HLL blob")
        p = struct.unpack("<B", blob[4:5])[0]
        regs = np.frombuffer(blob[5 : 5 + (1 << p)], dtype=np.uint8).copy()
        return cls(p=p, registers=regs)
