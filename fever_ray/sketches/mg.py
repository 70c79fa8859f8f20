"""Misra–Gries deterministic heavy-hitter summary.

The DETERMINISTIC counterpart of the CMS top-k tracker: k counters over a
key stream such that every stored count satisfies

    f_key − n/(k+1)  ≤  count(key)  ≤  f_key

and — the recall guarantee — EVERY key with true frequency f_key > n/(k+1)
is present in the summary.  No hashing, no failure probability.

* Misra, Gries, "Finding repeated elements" (Sci. Comp. Prog. 1982).
* Mergeability with the SAME error bound over the combined stream length:
  Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable summaries"
  (PODS 2012): merge = add counters, then subtract the (k+1)-st largest
  count from all and drop non-positives.

Batch ingestion is vectorized: one np.unique collapses the batch to
(key, count) pairs, counters merge as a dict update, and one decrement
step restores the k-counter invariant — O(batch + k log k), no Python
loop over rows.

Where the reference keeps exact per-key maps behind a mutex (e.g. the
flow/DNS aggregators), this summary answers "which hostnames dominate the
crawl?" at 10^12 rows with k integers per partition and a deterministic
error certificate.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FRMG"


class MisraGries:
    __slots__ = ("k", "counts", "n", "decremented")

    def __init__(self, k: int, counts: dict, n: int, decremented: int):
        self.k = k
        self.counts = counts          # key (str) -> residual count (int)
        self.n = n                    # total stream length ingested
        self.decremented = decremented  # total mass removed by decrements

    @classmethod
    def create(cls, k: int = 64) -> "MisraGries":
        if k < 1:
            raise ValueError(f"MisraGries: k must be >= 1, got {k}")
        return cls(k, {}, 0, 0)

    # -- ingestion -----------------------------------------------------------

    def _shrink(self) -> None:
        """Restore |counts| <= k by the batched decrement: subtract the
        (k+1)-st largest count from everyone, drop non-positive."""
        if len(self.counts) <= self.k:
            return
        vals = np.fromiter(self.counts.values(), dtype=np.int64)
        # the (k+1)-st largest value
        thresh = int(np.partition(vals, len(vals) - self.k - 1)[
            len(vals) - self.k - 1
        ])
        if thresh <= 0:
            return
        kept = {
            key: c - thresh for key, c in self.counts.items() if c > thresh
        }
        self.decremented += int(
            np.minimum(vals, thresh).sum()
        )
        self.counts = kept

    def update(self, values, weights=None) -> None:
        """Ingest a batch of keys (str/bytes arrow array, numpy array or
        list), optionally with positive int64 weights."""
        arr = np.asarray(
            values.to_numpy(zero_copy_only=False)
            if hasattr(values, "to_numpy")
            else values
        )
        if len(arr) == 0:
            return
        uk, inv = np.unique(arr, return_inverse=True)
        if weights is None:
            uc = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        else:
            w = np.asarray(weights, dtype=np.int64)
            if (w <= 0).any():
                raise ValueError("MisraGries: weights must be positive")
            uc = np.bincount(inv, weights=w.astype(np.float64),
                             minlength=len(uk)).astype(np.int64)
        for key, c in zip(uk.tolist(), uc.tolist()):
            if isinstance(key, str):
                ks = key
            elif isinstance(key, bytes):
                # decode, don't repr: the same host ingested via a binary
                # column and a string column must land in ONE counter
                ks = key.decode("utf-8", "surrogateescape")
            else:
                ks = str(key)
            self.counts[ks] = self.counts.get(ks, 0) + c
        self.n += int(uc.sum())
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError(
                f"MisraGries: merge k mismatch {self.k} vs {other.k}"
            )
        for key, c in other.counts.items():
            self.counts[key] = self.counts.get(key, 0) + c
        self.n += other.n
        self.decremented += other.decremented
        self._shrink()
        return self

    # -- queries ---------------------------------------------------------------

    def error_bound(self) -> int:
        """Deterministic per-key undercount bound: count(key) >= f_key − this,
        and every key with f_key > this is present."""
        return self.n // (self.k + 1)

    def candidates(self) -> dict:
        """key -> residual count (lower bound on the true frequency)."""
        return dict(self.counts)

    def top_k(self, m: int) -> list:
        """The m largest (key, residual count) pairs, count desc / key asc."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:m]

    # -- serialization -----------------------------------------------------------

    def to_bytes(self) -> bytes:
        # length-prefixed key encoding: keys may legitimately contain any
        # byte (NUL included — whitespace-split crawl tokens) and the empty
        # string is a real key, so a separator-joined blob would corrupt
        items = sorted(self.counts.items())
        enc = [k.encode("utf-8", "surrogateescape") for k, _ in items]
        lens = np.array([len(e) for e in enc], dtype=np.int64)
        keys_blob = b"".join(enc)
        vals = np.array([c for _, c in items], dtype=np.int64)
        head = struct.pack(
            "<iqqqq", self.k, self.n, self.decremented, len(items), len(keys_blob)
        )
        return _MAGIC + head + lens.tobytes() + keys_blob + vals.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        if blob[:4] != _MAGIC:
            raise ValueError("not a MisraGries blob")
        k, n, dec, m, kb = struct.unpack("<iqqqq", blob[4:40])
        lens = np.frombuffer(blob[40: 40 + m * 8], dtype=np.int64)
        off = 40 + m * 8
        keys = []
        for ln in lens.tolist():
            keys.append(blob[off: off + ln].decode("utf-8", "surrogateescape"))
            off += ln
        vals = np.frombuffer(blob[off: off + m * 8], dtype=np.int64)
        counts = {key: int(c) for key, c in zip(keys, vals)}
        return cls(k, counts, n, dec)
