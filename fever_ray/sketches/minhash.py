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


def _tokenize_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a batch of texts in C: returns (flat token hash
    array, doc offsets into it)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array([t if t is not None else "" for t in texts], type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts.cast(pa.string()), "")
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # a sliced/offset list array's offsets may not start at 0
    offsets = offsets - offsets[0]
    tok_h = hash64(flat)
    return tok_h, offsets


def _shingle_hash_flat(tok_h: np.ndarray, offsets: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashes of n-token shingles for every doc, flattened, plus per-doc
    shingle offsets.  A shingle hash combines n consecutive token hashes
    with a position-mixed fold (multiset semantics; min over a multiset
    equals min over the set, so MinHash is unaffected by duplicates)."""
    total = len(tok_h)
    if total == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(len(offsets), dtype=np.int64)
    with np.errstate(over="ignore"):
        sh = tok_h.copy()
        for j in range(1, n):
            shifted = np.empty_like(tok_h)
            shifted[: total - j] = tok_h[j:]
            shifted[total - j :] = 0
            sh = splitmix64(sh ^ (shifted * np.uint64(2 * j + 1)))
    # valid shingle start positions per doc: doc_start .. doc_end - n
    doc_lens = np.diff(offsets)
    sh_lens = np.maximum(doc_lens - n + 1, 0)
    sh_offsets = np.concatenate(([0], np.cumsum(sh_lens))).astype(np.int64)
    # keep the first sh_lens[d] positions of each doc, fully vectorized
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], doc_lens)
    keep = pos_in_doc < np.repeat(sh_lens, doc_lens)
    return sh[keep], sh_offsets


def batch_minhash_signatures(
    texts, n: int = 3, num_perm: int = 64, seed: int = 1
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signatures for a whole batch, fully
    vectorized: one C tokenize, one vectorized token-hash pass, n-1 folds
    for shingles, then num_perm mix+segmented-min passes (reduceat).
    Docs with no shingles get the empty signature (all max)."""
    tok_h, offsets = _tokenize_batch(texts)
    sh, sh_offsets = _shingle_hash_flat(tok_h, offsets, n)
    n_docs = len(offsets) - 1
    rng = np.random.default_rng(seed)
    salts = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    total = len(sh)
    if total == 0:
        return sig
    # Tile the flat shingle array into L2-sized chunks and run ALL
    # permutations per tile: the mix+reduceat passes are pure streaming, so
    # the untiled loop reads the whole shingle array from DRAM num_perm
    # times (the stage is memory-bandwidth-bound, measured ~2.5× slower);
    # tiled, each shingle is loaded from DRAM once and the per-perm passes
    # hit cache.  Bit-identical: min over a doc's shingles = min over the
    # tile-wise partial mins.
    TILE = 1 << 15
    with np.errstate(over="ignore"):
        for t0 in range(0, total, TILE):
            t1 = min(t0 + TILE, total)
            tile = sh[t0:t1]
            d0 = int(np.searchsorted(sh_offsets, t0, side="right") - 1)
            d1 = int(np.searchsorted(sh_offsets, t1, side="left"))
            local = np.clip(sh_offsets[d0:d1] - t0, 0, t1 - t0)
            view = sig[d0:d1]
            for p in range(num_perm):
                mixed = splitmix64(tile ^ salts[p])
                # reduceat quirk: zero-length segments return the element at
                # the start index — those docs are globally empty and are
                # reset to the empty signature below
                mins = np.minimum.reduceat(mixed, local)
                np.minimum(view[:, p], mins, out=view[:, p])
    empty = np.diff(sh_offsets) == 0
    if empty.any():
        sig[empty, :] = np.iinfo(np.uint64).max
    return sig


def batch_simhash(texts) -> np.ndarray:
    """(n_docs,) 64-bit SimHash fingerprints, vectorized: per-bit weighted
    sums via segmented reduceat over the flat token-hash array."""
    tok_h, offsets = _tokenize_batch(texts)
    n_docs = len(offsets) - 1
    total = len(tok_h)
    if total == 0:
        return np.zeros(n_docs, dtype=np.uint64)
    doc_lens = np.diff(offsets)
    nonempty = doc_lens > 0
    # Tiled like batch_minhash_signatures (and for the same reason): 64
    # per-bit passes over the flat token-hash array are memory-bandwidth
    # bound untiled (measured 5.3× slower); per tile all 64 bit-counts run
    # in cache and per-doc ones-counts accumulate additively across tiles.
    TILE = 1 << 15
    ones = np.zeros((n_docs, 64), dtype=np.int64)
    for t0 in range(0, total, TILE):
        t1 = min(t0 + TILE, total)
        tile = tok_h[t0:t1]
        d0 = int(np.searchsorted(offsets, t0, side="right") - 1)
        d1 = int(np.searchsorted(offsets, t1, side="left"))
        local = np.clip(offsets[d0:d1] - t0, 0, t1 - t0)
        # reduceat quirk: zero-length segments return the element at the
        # start index — zero their partial sums explicitly
        seg_len = np.diff(np.concatenate((local, [t1 - t0])))
        view = ones[d0:d1]
        for b in range(64):
            bits = ((tile >> np.uint64(b)) & np.uint64(1)).astype(np.int32)
            part = np.add.reduceat(bits, local)
            np.add(view[:, b], np.where(seg_len > 0, part, 0), out=view[:, b])
    # score = ones - zeros = 2*ones - len; bit set iff score > 0
    score = 2 * ones - doc_lens[:, None]
    bits = (score > 0) & nonempty[:, None]
    return (
        bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)[None, :]
    ).sum(axis=1, dtype=np.uint64)


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
