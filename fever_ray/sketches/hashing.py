"""Vectorized 64-bit hashing kernels (numpy, no Python-per-row loops).

Two families:

* ``fnv1_64`` / ``fnv1a_64`` / ``fnv_pair``: bit-exact FNV-1 / FNV-1a 64-bit
  (same as Go's stdlib ``hash/fnv`` ``New64``/``New64a``) — required for
  byte-format compatibility with DCSO/bloom filter files (the reference loads
  them in /root/reference/processing/bloom_handler.go:104; the library is
  github.com/DCSO/bloom v0.2.3, /root/reference/go.mod:6, which hashes with
  stdlib FNV + Kirsch–Mitzenmacher double hashing).
* ``hash64``: a well-mixed 64-bit hash for sketch use (HLL/CMS/MinHash):
  FNV-1a followed by the splitmix64 finalizer (public constants from
  Steele et al., "Fast splittable pseudorandom number generators", OOPSLA'14).
  FNV alone has weak avalanche in the low bits; the finalizer fixes that.

All kernels are vectorized over a batch of variable-length byte strings:
the per-row cost is O(max_len) numpy ops over the whole batch, not a Python
loop per row.  Inputs come zero-copy from Arrow string/binary arrays.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)

# splitmix64 finalizer constants
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def _flat_bytes(values) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """View a batch of byte strings as (flat uint8 buffer, starts, lens) —
    zero-copy for Arrow arrays, one join for Python lists.

    Accepts a ``pyarrow`` string/large_string/binary array, a numpy object
    array of ``bytes``, or a list of ``bytes``/``str``.  Nulls hash as empty
    strings (callers mask them out when the semantics require it).
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.cast(pa.large_binary())
        if values.null_count:
            values = values.fill_null(b"")
        data_buf = values.buffers()[2]
        buf = (
            np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None
            else np.zeros(0, dtype=np.uint8)
        )
        offsets = np.frombuffer(values.buffers()[1], dtype=np.int64)
        offsets = offsets[values.offset : values.offset + len(values) + 1]
        return buf, offsets[:-1], np.diff(offsets)
    bs = [v.encode("utf-8") if isinstance(v, str) else (v or b"") for v in values]
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    buf = np.frombuffer(b"".join(bs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
    return buf, starts, lens


def _fnv_sorted(values, want1: bool, want2: bool):
    """Shared FNV driver: process rows sorted by length so byte position j
    touches only the still-active suffix — total work is O(total bytes)
    gathers + arithmetic, with no padded (n, max_len) matrix and no
    per-position masking (measured ~7× faster than the padded loop on
    short-token batches)."""
    buf, starts, lens = _flat_bytes(values)
    n = len(lens)
    h1 = np.full(n, _FNV64_OFFSET, dtype=np.uint64) if want1 else None
    h2 = np.full(n, _FNV64_OFFSET, dtype=np.uint64) if want2 else None
    if n == 0:
        return h1, h2
    order = np.argsort(lens, kind="stable")
    starts_s = starts[order]
    lens_s = lens[order]
    L = int(lens_s[-1])
    with np.errstate(over="ignore"):
        for j in range(L):
            a0 = int(np.searchsorted(lens_s, j, side="right"))
            b = buf[starts_s[a0:] + j].astype(np.uint64)
            if want1:
                h1[a0:] = (h1[a0:] * _FNV64_PRIME) ^ b  # FNV-1: h = h*p ^ b
            if want2:
                h2[a0:] = (h2[a0:] ^ b) * _FNV64_PRIME  # FNV-1a: h = (h^b)*p
    # h1/h2 are ordered by sorted position; scatter back to input order
    if want1:
        out1 = np.empty(n, dtype=np.uint64)
        out1[order] = h1
        h1 = out1
    if want2:
        out2 = np.empty(n, dtype=np.uint64)
        out2[order] = h2
        h2 = out2
    return h1, h2


def fnv_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Return (FNV-1 64, FNV-1a 64) of each byte string, vectorized.

    Bit-exact with Go ``hash/fnv`` ``New64``/``New64a`` Sum64 over the same
    bytes (verified against published FNV test vectors in tests).
    """
    return _fnv_sorted(values, True, True)


def fnv1_64(values) -> np.ndarray:
    return _fnv_sorted(values, True, False)[0]


def fnv1a_64(values) -> np.ndarray:
    return _fnv_sorted(values, False, True)[1]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: strong avalanche mixing of 64-bit values."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(30)
        x *= _SM64_M1
        x ^= x >> np.uint64(27)
        x *= _SM64_M2
        x ^= x >> np.uint64(31)
    return x


def hash64(values, seed: int = 0) -> np.ndarray:
    """Well-mixed 64-bit hash of a batch of byte strings (sketch-grade).

    Not DCSO-format-bound; used by HLL/CMS/MinHash/SimHash.  ``seed`` derives
    an independent hash family member.
    """
    h = fnv1a_64(values)
    if seed:
        with np.errstate(over="ignore"):
            h = h ^ splitmix64(np.full(len(h), np.uint64(seed & 0xFFFFFFFFFFFFFFFF)))
    return splitmix64(h)


def hash64_ints(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Well-mixed 64-bit hash of an int array (no byte conversion)."""
    x = np.asarray(values).astype(np.uint64)
    with np.errstate(over="ignore"):
        if seed:
            x = x ^ splitmix64(np.full(len(x), np.uint64(seed & 0xFFFFFFFFFFFFFFFF)))
        return splitmix64(x ^ _FNV64_OFFSET)


def bucket_of(arr, n_parts: int) -> np.ndarray:
    """int32 shuffle-bucket ids for an Arrow column or integer ndarray:
    FNV of the values mod ``n_parts`` (integer columns hash via
    :func:`hash64_ints`, strings / binary via :func:`hash64`).  The single
    definition of the key-to-coarse-bucket rule every bucketed shuffle in
    ops/ shares."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, np.ndarray):
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError("bucket_of ndarray input must be integer-typed")
        hb = hash64_ints(arr.astype(np.int64))
    elif pa.types.is_integer(arr.type):
        hb = hash64_ints(arr.to_numpy(zero_copy_only=False).astype(np.int64))
    else:
        hb = hash64(arr)
    return (hb % np.uint64(n_parts)).astype(np.int32)
