"""MinHash signatures + SimHash fingerprints for near-duplicate detection.

Used by ``fever_ray.ops.dedup``: shingle → minhash → LSH band buckets is the
scale path for near-dedup over the document/page tables (Broder, "On the
resemblance and containment of documents", 1997; LSH banding per Leskovec,
Rajaraman, Ullman, "Mining of Massive Datasets" ch. 3).

All kernels are vectorized per batch; per-document work is numpy over the
document's shingle hash array.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64, splitmix64

_PRIME = np.uint64(0xFFFFFFFFFFFFFFC5)  # large 64-bit prime for affine rehash


def shingle_hashes(text: str, n: int = 5, word: bool = True) -> np.ndarray:
    """Hashes of the n-gram shingle set of one document (uint64, unique)."""
    if word:
        toks = text.split()
        grams = [" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))]
    else:
        grams = [text[i : i + n] for i in range(max(len(text) - n + 1, 0))]
    if not grams:
        grams = [text]
    return np.unique(hash64(grams))


def minhash_signature(shingles: np.ndarray, num_perm: int = 128, seed: int = 1) -> np.ndarray:
    """MinHash signature of a shingle-hash set via affine rehash family.

    h_i(x) = splitmix64(x ^ r_i); signature_i = min_x h_i(x).
    Deterministic given ``seed``; signatures of disjoint batches merge by
    elementwise min (used for set-union semantics).
    """
    rng = np.random.default_rng(seed)
    salts = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        # (num_perm, n_shingles) via broadcasting, then min over shingles
        mixed = splitmix64(shingles[None, :] ^ salts[:, None])
    return mixed.min(axis=1)


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Estimated Jaccard similarity from two signatures."""
    return float(np.mean(sig_a == sig_b))


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band bucket hashes: split signature into ``bands`` groups of
    ``rows`` and hash each group → (bands,) uint64."""
    assert bands * rows <= len(sig)
    groups = sig[: bands * rows].reshape(bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros(bands, dtype=np.uint64)
        for r in range(rows):
            acc = splitmix64(acc ^ groups[:, r] ^ np.uint64(r + 1))
    return acc


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> np.uint64:
    """64-bit SimHash fingerprint (Charikar 2002) of a token-hash multiset."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    w = np.ones(len(token_hashes)) if weights is None else np.asarray(weights, dtype=np.float64)
    score = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if score[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return out


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
