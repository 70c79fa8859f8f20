"""Theta / KMV (k-minimum-values) sketch: mergeable distinct counting WITH
set algebra — union, intersection, and difference estimates that HLL cannot
provide — plus a deterministic bottom-k sample as a free by-product.

Public algorithm: Bar-Yossef et al., "Counting distinct elements in a data
stream" (RANDOM 2002) / Beyer et al., "On synopses for distinct-value
estimation under multiset operations" (SIGMOD 2007), as popularized by the
Apache DataSketches theta sketch family.

State: the k smallest distinct 64-bit hash values seen.  With hashes mapped
to (0,1], theta = k-th smallest value and the unbiased estimate is
(k-1)/theta.  Merge = union of value sets, keep k smallest → associative
and bit-identical under any merge order.  Intersection/difference estimate
via the common-theta trick: work under theta = min(theta_a, theta_b).

Because the "sample" of k minimum hashes is a uniform random sample of the
distinct keys (seeded hash — deterministic across runs), attaching the
original keys optionally yields a mergeable distinct-uniform SAMPLE — the
engine's deterministic sampling operator.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from .hashing import hash64, hash64_ints

_MAGIC = b"FRTH"
_MAX64 = float(2**64)


@dataclass
class ThetaSketch:
    k: int
    values: np.ndarray  # sorted uint64 hash values, len ≤ k
    keys: list | None = None  # optional retained keys (bottom-k sample)
    seed: int = 0

    @classmethod
    def create(cls, k: int = 4096, keep_keys: bool = False, seed: int = 0) -> "ThetaSketch":
        return cls(
            k=k,
            values=np.zeros(0, dtype=np.uint64),
            keys=[] if keep_keys else None,
            seed=seed,
        )

    # ------------------------------------------------------------------ core
    def _ingest(self, h: np.ndarray, raw_keys=None) -> None:
        if len(h) == 0:
            return
        if self.keys is not None and raw_keys is not None:
            merged = np.concatenate([self.values, h])
            key_pool = list(self.keys) + list(raw_keys)
            order = np.argsort(merged, kind="stable")
            merged = merged[order]
            key_pool = [key_pool[i] for i in order]
            keep_vals, keep_keys, seen = [], [], set()
            for v, kk in zip(merged, key_pool):
                iv = int(v)
                if iv not in seen:
                    seen.add(iv)
                    keep_vals.append(iv)
                    keep_keys.append(kk)
                if len(keep_vals) == self.k:
                    break
            self.values = np.array(keep_vals, dtype=np.uint64)
            self.keys = keep_keys
        else:
            merged = np.unique(np.concatenate([self.values, h]))
            self.values = merged[: self.k]

    def update(self, values) -> None:
        h = hash64(values, seed=self.seed)
        raw = None
        if self.keys is not None:
            raw = values.to_pylist() if hasattr(values, "to_pylist") else list(values)
        self._ingest(h, raw)

    def update_ints(self, values: np.ndarray) -> None:
        h = hash64_ints(np.asarray(values), seed=self.seed)
        raw = list(np.asarray(values)) if self.keys is not None else None
        self._ingest(h, raw)

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k or self.seed != other.seed:
            raise ValueError("cannot merge theta sketches with different k/seed")
        if self.keys is not None and other.keys is None:
            # merging a keyless sketch would update values but not keys,
            # silently desynchronizing sample_keys(); drop key tracking
            # instead (union semantics survive, sampled keys do not)
            self.keys = None
        self._ingest(other.values, other.keys if self.keys is not None else None)
        return self

    # -------------------------------------------------------------- estimates
    @property
    def theta(self) -> float:
        """Sampling threshold in (0, 1]."""
        if len(self.values) < self.k:
            return 1.0
        return (float(self.values[-1]) + 1.0) / _MAX64

    def estimate(self) -> float:
        if len(self.values) < self.k:
            return float(len(self.values))  # exact below saturation
        return (self.k - 1) / self.theta

    @property
    def relative_error(self) -> float:
        return 1.0 / np.sqrt(self.k - 1)

    @staticmethod
    def _common(a: "ThetaSketch", b: "ThetaSketch") -> tuple[np.ndarray, np.ndarray, float]:
        theta = min(a.theta, b.theta)
        # integer clamp: float math near 1.0 would round to 2^64 and overflow
        cut = np.uint64(min(int(theta * _MAX64), 2**64 - 1))
        return (
            a.values[a.values < cut],
            b.values[b.values < cut],
            theta,
        )

    def intersection_estimate(self, other: "ThetaSketch") -> float:
        va, vb, theta = self._common(self, other)
        n_common = len(np.intersect1d(va, vb, assume_unique=True))
        return n_common / theta

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """|self \\ other| (a-not-b)."""
        va, vb, theta = self._common(self, other)
        n_only = len(np.setdiff1d(va, vb, assume_unique=True))
        return n_only / theta

    def union_estimate(self, other: "ThetaSketch") -> float:
        u = ThetaSketch(k=self.k, values=self.values.copy(), seed=self.seed)
        u.merge(ThetaSketch(k=other.k, values=other.values.copy(), seed=other.seed))
        return u.estimate()

    def sample_keys(self) -> list:
        """The retained bottom-k keys: a deterministic uniform sample of the
        distinct keys (requires keep_keys=True)."""
        if self.keys is None:
            raise ValueError("sketch was built without keep_keys")
        return list(self.keys)

    # ---------------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        keys_blob = b""
        has_keys = self.keys is not None
        if has_keys:
            enc = "\x00".join(str(kk) for kk in self.keys).encode("utf-8", "surrogateescape")
            keys_blob = enc
        head = struct.pack("<iqiq", self.k, self.seed, int(has_keys), len(self.values))
        return (
            _MAGIC
            + head
            + self.values.astype("<u8").tobytes()
            + struct.pack("<q", len(keys_blob))
            + keys_blob
        )

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        if blob[:4] != _MAGIC:
            raise ValueError("not a theta sketch blob")
        k, seed, has_keys, n = struct.unpack("<iqiq", blob[4:28])
        off = 28
        values = np.frombuffer(blob[off : off + 8 * n], dtype="<u8").astype(np.uint64)
        off += 8 * n
        (klen,) = struct.unpack("<q", blob[off : off + 8])
        off += 8
        keys = None
        if has_keys:
            raw = blob[off : off + klen].decode("utf-8", "surrogateescape")
            keys = raw.split("\x00") if raw else []
        return cls(k=k, values=values, keys=keys, seed=seed)
