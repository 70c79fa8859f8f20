"""Frequent Directions matrix sketch (mergeable low-rank covariance).

The matrix analog of the stream sketches in this package: maintain a small
``ℓ × d`` matrix B summarizing a tall row stream A (embeddings) such that

    0 ⪯ AᵀA − BᵀB   and   ‖AᵀA − BᵀB‖₂ ≤ 2‖A‖_F² / ℓ

— Liberty, "Simple and deterministic matrix sketching" (KDD 2013), with the
mergeability result of Ghashami, Liberty, Phillips, Woodruff, "Frequent
Directions: Simple and Deterministic Matrix Sketching" (SIAM J. Comput.
2016): merging two FD sketches (concatenate rows, re-shrink) preserves the
bound with the combined ‖A‖_F², so partials merge associatively-within-bound
under any grouping — the same contract the quantile sketches satisfy.

Implementation: a ``2ℓ``-row buffer; when full, one thin SVD and the
standard spectral shrink ``s' = sqrt(max(s² − s_ℓ², 0))`` keeps ℓ rows
(the ℓ-th is exactly zeroed).  The exact squared Frobenius mass of
everything ever ingested is tracked alongside (float64 — used only for the
error-bound denominator, never for value-hashed output).

Replaces what the reference has no answer for at all: a covariance /
principal-subspace summary of an embedding column that a 10^12-row corpus
can compute in one streaming pass with KB-sized partials.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FRFD"


class FrequentDirections:
    __slots__ = ("l", "d", "buf", "n", "fnorm_sq")

    def __init__(self, l: int, d: int, buf: np.ndarray, n: int, fnorm_sq: float):
        self.l = l
        self.d = d
        self.buf = buf
        self.n = n
        self.fnorm_sq = fnorm_sq

    @classmethod
    def create(cls, l: int = 16, d: int = 64) -> "FrequentDirections":
        if l < 2:
            raise ValueError(f"FrequentDirections: l must be >= 2, got {l}")
        if d < 1:
            raise ValueError(f"FrequentDirections: d must be >= 1, got {d}")
        return cls(l, d, np.zeros((2 * l, d), dtype=np.float64), 0, 0.0)

    # -- ingestion ---------------------------------------------------------

    def _shrink(self) -> None:
        # thin SVD of the filled rows; zero out the l-th singular value
        s_vt = np.linalg.svd(self.buf[: self.n], full_matrices=False)
        s, vt = s_vt[1], s_vt[2]
        if len(s) <= self.l:
            # rank below the sketch size: keep as-is, just compact
            b = s[:, None] * vt
            self.buf[: len(s)] = b
            self.buf[len(s):] = 0.0
            self.n = len(s)
            return
        delta = s[self.l - 1] ** 2
        s2 = np.sqrt(np.maximum(s[: self.l] ** 2 - delta, 0.0))
        self.buf[: self.l] = s2[:, None] * vt[: self.l]
        self.buf[self.l:] = 0.0
        self.n = self.l

    def _ingest(self, mat: np.ndarray) -> None:
        mat = np.asarray(mat, dtype=np.float64)
        if mat.ndim == 2 and len(mat) == 0:
            return  # empty/all-null batch — any width, including (0, 0)
        if mat.ndim != 2 or mat.shape[1] != self.d:
            raise ValueError(
                f"FrequentDirections: expected (*, {self.d}) rows, got {mat.shape}"
            )
        cap = self.buf.shape[0]
        i = 0
        while i < len(mat):
            take = min(cap - self.n, len(mat) - i)
            self.buf[self.n: self.n + take] = mat[i: i + take]
            self.n += take
            i += take
            if self.n == cap:
                self._shrink()

    def update(self, mat: np.ndarray) -> None:
        """Ingest a batch of rows (n × d); accumulates their Frobenius mass."""
        mat = np.asarray(mat, dtype=np.float64)
        if mat.size:
            self.fnorm_sq += float((mat * mat).sum())
        self._ingest(mat)

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (self.l, self.d) != (other.l, other.d):
            raise ValueError(
                f"FrequentDirections: merge shape mismatch "
                f"({self.l},{self.d}) vs ({other.l},{other.d})"
            )
        self._ingest(other.buf[: other.n])
        self.fnorm_sq += other.fnorm_sq
        return self

    # -- queries -----------------------------------------------------------

    def cov(self) -> np.ndarray:
        """BᵀB — the sketched Gram/covariance matrix (d × d)."""
        b = self.buf[: self.n]
        return b.T @ b

    def error_bound(self) -> float:
        """Published spectral-error guarantee: ‖AᵀA − BᵀB‖₂ ≤ this."""
        return 2.0 * self.fnorm_sq / self.l

    def principal_directions(self, k: int) -> np.ndarray:
        """Top-k right singular vectors of the sketch (k × d)."""
        if not 1 <= k <= self.d:
            raise ValueError(f"k must be 1..{self.d}, got {k}")
        vt = np.linalg.svd(self.buf[: self.n], full_matrices=False)[2]
        out = np.zeros((k, self.d))
        out[: min(k, vt.shape[0])] = vt[: min(k, vt.shape[0])]
        return out

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<iiqd", self.l, self.d, self.n, self.fnorm_sq)
        return _MAGIC + head + self.buf[: self.n].tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        if blob[:4] != _MAGIC:
            raise ValueError("not a FrequentDirections blob")
        l, d, n, fn = struct.unpack("<iiqd", blob[4:28])
        sk = cls.create(l, d)
        if n:
            sk.buf[:n] = np.frombuffer(
                blob[28: 28 + n * d * 8], dtype=np.float64
            ).reshape(n, d)
        sk.n = n
        sk.fnorm_sq = fn
        return sk
