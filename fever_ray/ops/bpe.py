"""Byte-pair-encoding tokenizer training + application (Sennrich et al.
2016, arXiv:1508.07909) — the "train a vocabulary on the corpus" step of
an LLM data pipeline, in the production shape:

* ONE corpus pass builds the (word, count) histogram — the corpus never
  participates in the merge loop.  Web-scale vocabularies are millions of
  distinct words while corpora are trillions of tokens; every subsequent
  round touches only the histogram.
* each merge round is two vectorized kernels over the symbol arrays of
  the word table: adjacent-pair counting (flat shifted-equality over the
  concatenated symbol buffer, word boundaries masked, weighted by word
  count) and non-overlapping left-to-right merge application (run-parity
  selection over consecutive match positions — "aaaa" merging (a,a)
  becomes "aa aa", matching the reference semantics).  No per-symbol
  Python anywhere.
* determinism: merge choice is (count DESC, left id ASC, right id ASC);
  symbol ids are assigned in sorted order (chars) and merge order (new
  symbols), so the trained merge table is a pure function of the corpus —
  invariant under partitioning and resume.

``bpe_train`` keeps the histogram distributed as a Dataset; per round the
pair-count partials (≤ distinct-pairs-per-batch rows each) are combined
on the driver — bounded by vocabulary, not corpus, the same budget as
``knn.train_ivf_centroids``'s driver-side training step.

``bpe_apply`` broadcasts the trained merge list once (ray.put) and
re-tokenizes any corpus with the same vectorized merge kernel, R passes
per batch.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)

_BOUNDARY = np.uint64(0xFFFFFFFFFFFFFFFF)  # never a (left<<32|right) pair key


def _pair_counts(flat: np.ndarray, word_ends: np.ndarray, weights: np.ndarray):
    """Weighted adjacent-pair counts over concatenated symbol-id arrays.

    ``flat`` int64 symbol ids; ``word_ends`` = cumulative word lengths
    (offsets[1:]); ``weights`` = per-word counts expanded to per-position
    via repeat by the caller.  Returns (unique uint64 pair keys, counts).
    Pairs spanning word boundaries are masked out."""
    if len(flat) < 2:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    left = flat[:-1].astype(np.uint64)
    right = flat[1:].astype(np.uint64)
    keys = (left << np.uint64(32)) | right
    # position i pairs (flat[i], flat[i+1]); it is invalid when i+1 starts a
    # new word, i.e. i+1 is in word_ends (ends are exclusive)
    valid = np.ones(len(keys), dtype=bool)
    ends_inside = word_ends[(word_ends > 0) & (word_ends < len(flat))]
    valid[ends_inside - 1] = False
    keys = np.where(valid, keys, _BOUNDARY)
    uniq, inv = np.unique(keys, return_inverse=True)
    agg = np.zeros(len(uniq), np.int64)
    np.add.at(agg, inv, weights[:-1] * valid)
    if len(uniq) and uniq[-1] == _BOUNDARY:
        uniq, agg = uniq[:-1], agg[:-1]
    return uniq, agg


def _apply_merge(flat: np.ndarray, offsets: np.ndarray, left: int, right: int,
                 new_id: int):
    """Replace non-overlapping left-to-right (left,right) adjacencies with
    ``new_id`` across concatenated symbol arrays — fully vectorized.

    Overlap rule (reference BPE): in a run of consecutive match positions
    (only possible when left == right, e.g. 'aaaa' merging (a,a)), keep
    every other position starting from the first.  Returns (new flat, new
    offsets)."""
    n = len(flat)
    if n < 2:
        return flat, offsets
    m = (flat[:-1] == left) & (flat[1:] == right)
    # word-boundary mask: position i invalid when i+1 is a word start
    ends_inside = offsets[1:-1]
    ends_inside = ends_inside[(ends_inside > 0) & (ends_inside <= n - 1)]
    m[ends_inside - 1] = False
    pos = np.nonzero(m)[0]
    if not len(pos):
        return flat, offsets
    if left == right:
        # run-parity: consecutive positions overlap (share a symbol) — keep
        # even offsets within each run of step-1 positions
        run_start = np.concatenate(([True], np.diff(pos) > 1))
        run_id = np.cumsum(run_start) - 1
        run_first = pos[run_start]
        keep = ((pos - run_first[run_id]) % 2) == 0
        pos = pos[keep]
    out = flat.copy()
    out[pos] = new_id
    drop = np.zeros(n, dtype=bool)
    drop[pos + 1] = True
    # offsets shrink by the number of merges inside each word
    word_of = np.searchsorted(offsets[1:], pos, side="right")
    shrink = np.zeros(len(offsets) - 1, np.int64)
    np.add.at(shrink, word_of, 1)
    new_offsets = offsets.copy()
    new_offsets[1:] -= np.cumsum(shrink)
    return out[~drop], new_offsets


def _word_histogram(ds, text_col: str):
    """One corpus pass → driver (word, count) arrays.  Per batch: flat
    token split + np.unique partials; driver combine is vocabulary-bounded
    (distinct words), not corpus-bounded."""
    from .textstats import _flat_tokens

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch, text_col)
        arr = flat.to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(arr[arr != ""], return_counts=True)
        return pa.table(
            {"word": pa.array(uniq, pa.string()),
             "c": pa.array(counts, pa.int64())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not parts:
        return np.array([], dtype=object), np.zeros(0, np.int64)
    words = np.array([r["word"] for r in parts], dtype=object)
    counts = np.array([r["c"] for r in parts], dtype=np.int64)
    uniq, inv = np.unique(words, return_inverse=True)
    agg = np.zeros(len(uniq), np.int64)
    np.add.at(agg, inv, counts)
    return uniq, agg


class _SymbolTable:
    """Deterministic symbol-id assignment: chars sorted (= codepoint order)
    first, merged symbols in merge order after.  Equal STRINGS are equal
    symbols — a token reachable by two merge paths ('a'+'bc' and 'ab'+'c')
    keeps one id, matching reference string-keyed BPE."""

    def __init__(self, chars):
        self.syms = sorted(chars)
        self.index = {s: i for i, s in enumerate(self.syms)}

    def add(self, s: str) -> int:
        if s in self.index:
            return self.index[s]
        self.index[s] = len(self.syms)
        self.syms.append(s)
        return self.index[s]


def _encode_words(words, lens: np.ndarray):
    """words (object array of str) + per-word char lengths → (flat int64
    codepoint-rank symbol ids, offsets, base codepoints).  Fully
    vectorized: one join, one utf-32 decode, one searchsorted — no
    per-char Python."""
    offsets = np.concatenate(([0], np.cumsum(lens.astype(np.int64))))
    joined = "".join(words)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    base = np.unique(cp)
    flat = np.searchsorted(base, cp).astype(np.int64)
    return flat, offsets, base


def bpe_train(ds, num_merges: int = 64, text_col: str = "text") -> pa.Table:
    """documents → trained BPE merge table (merge_rank, left, right, token,
    pair_count), deterministic.

    Scale shape: one corpus pass (the histogram); every merge round is
    vocabulary-bounded vectorized work.  Stops early when no pair occurs
    twice."""
    empty = pa.table(
        {
            "merge_rank": pa.array([], pa.int64()),
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "token": pa.array([], pa.string()),
            "pair_count": pa.array([], pa.int64()),
        }
    )
    words, counts = _word_histogram(ds, text_col)
    if not len(words):
        return empty
    lens = np.array([len(w) for w in words], dtype=np.int64)
    flat, offsets, base = _encode_words(words, lens)
    table = _SymbolTable([chr(c) for c in base])
    weights = np.repeat(counts, np.diff(offsets)) if len(flat) else np.zeros(0, np.int64)

    if len(table.syms) + num_merges >= (1 << 32):
        raise ValueError("bpe_train: symbol space exceeds 32-bit pair packing")
    ranks, lefts, rights, tokens, pair_counts = [], [], [], [], []
    for r in range(num_merges):
        keys, agg = _pair_counts(flat, offsets[1:], weights)
        if not len(keys) or agg.max() < 2:
            break
        # (count DESC, then lexicographically smallest (left, right) STRING
        # pair): portable contract, independent of internal id assignment;
        # only the max-count ties are decoded
        top_keys = keys[agg == agg.max()]
        _, _, l, rt = min(
            (table.syms[int(k >> np.uint64(32))],
             table.syms[int(k & np.uint64(0xFFFFFFFF))],
             int(k >> np.uint64(32)), int(k & np.uint64(0xFFFFFFFF)))
            for k in top_keys
        )
        tok = table.syms[l] + table.syms[rt]
        new_id = table.add(tok)
        ranks.append(r)
        lefts.append(table.syms[l])
        rights.append(table.syms[rt])
        tokens.append(tok)
        pair_counts.append(int(agg.max()))
        flat, offsets = _apply_merge(flat, offsets, l, rt, new_id)
        weights = np.repeat(counts, np.diff(offsets)) if len(flat) else np.zeros(0, np.int64)

    return pa.table(
        {
            "merge_rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "token": pa.array(tokens, pa.string()),
            "pair_count": pa.array(pair_counts, pa.int64()),
        }
    )


class BpeTokenizer:
    """Actor stage: re-tokenize text with a trained merge table, counting
    BPE tokens per doc.  The merge list resolves ONCE per actor; per batch
    the same vectorized merge kernel runs R passes over the batch's
    concatenated symbol arrays."""

    def __init__(self, merges, id_col: str = "doc_id", text_col: str = "text"):
        import ray

        m = ray.get(merges) if isinstance(merges, ray.ObjectRef) else merges
        if isinstance(m, pa.Table):
            m = list(zip(
                m.column("left").to_pylist(),
                m.column("right").to_pylist(),
                m.column("token").to_pylist(),
            ))
        self.merges = m
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .textstats import _flat_tokens

        words, word_offs = _flat_tokens(batch, self.text_col)
        warr = words.to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets, base = _encode_words(warr, lens)
        # chars map by codepoint rank (vectorized encode); merge tokens get
        # ids appended in merge order — a merge whose component is absent
        # from the batch can have no occurrence and is skipped (its token
        # then cannot occur as a later component either)
        id_of = {chr(c): i for i, c in enumerate(base)}
        next_id = len(base)
        for l, r, tok in self.merges:
            li, ri = id_of.get(l), id_of.get(r)
            if li is None or ri is None:
                continue
            ti = id_of.get(tok)
            if ti is None:
                id_of[tok] = ti = next_id
                next_id += 1
            flat, offsets = _apply_merge(flat, offsets, li, ri, ti)
        # per-doc totals: offsets IS the prefix sum of per-word symbol
        # counts (offsets[0] == 0 throughout), so doc sums are two gathers
        doc_tokens = offsets[word_offs[1:]] - offsets[word_offs[:-1]]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_bpe_tokens": pa.array(doc_tokens.astype(np.int64), pa.int64()),
            }
        )


def bpe_token_counts(
    ds, merges, id_col: str = "doc_id", text_col: str = "text",
    concurrency=(1, 8), batch_size: int = 4096,
):
    """documents → (id, n_bpe_tokens) under a trained merge table.  The
    merge table broadcasts once; no shuffle."""
    import ray

    ref = ray.put(merges)
    return ds.map_batches(
        BpeTokenizer,
        fn_constructor_kwargs=dict(merges=ref, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
