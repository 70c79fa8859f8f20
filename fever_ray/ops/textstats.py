"""Text-analysis operators over the documents/pages tables: token counting,
quality scoring, language ID (n-gram/stopword heuristic), document
fingerprinting.  These are the training-data-pipeline operators layered on
the same engine (ops beyond the reference's inventory; the reference's
closest relative is its per-event profiling, SURVEY §2.6).

All hot paths are vectorized pyarrow/numpy; the language-ID stage is a
callable class (actor pool) whose stopword tables are built once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64
from ..sketches.minhash import simhash


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + char stats, all SQL-mirrorable kernels:
    n_tokens = #spaces + 1 on space-normalized text; avg token length from
    char counts."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.cast(pc.utf8_length(text), "int64")
    # single-space-separated generator text: tokens = spaces + 1 (0 for empty)
    n_spaces = pc.cast(
        pc.count_substring(text, " "), "int64"
    )
    n_tokens = pc.if_else(
        pc.equal(n_chars, 0), pa.scalar(0, type=pa.int64()), pc.add(n_spaces, 1)
    )
    batch = batch.append_column("n_tokens", n_tokens)
    batch = batch.append_column("n_text_chars", n_chars)
    return batch


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality components (each SQL-mirrorable) + a composite score:
    stop_ratio (occurrences of ' the ' per token), mean token length,
    and the composite = n_tokens>=5 AND mean_token_len in [2, 12]."""
    batch = token_stats(batch, text_col)
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_tokens = batch.column("n_tokens")
    n_chars = batch.column("n_text_chars")
    nt = pc.cast(n_tokens, "float64")
    denom = pc.max_element_wise(nt, pa.scalar(1.0))
    # 'the' as a whole token: double every space first so consecutive
    # occurrences (" the the ") don't share a delimiter — non-overlapping
    # count_substring then counts exact whole-token occurrences
    doubled = pc.replace_substring(text.cast(pa.string()), pattern=" ", replacement="  ")
    padded = pc.binary_join_element_wise(
        pa.array([" "] * len(text)), doubled, pa.array([" "] * len(text)), ""
    )
    n_the = pc.cast(pc.count_substring(padded, " the "), "float64")
    stop_ratio = pc.divide(n_the, denom)
    mean_tok_len = pc.divide(
        pc.subtract(pc.cast(n_chars, "float64"), pc.subtract(nt, 1.0)), denom
    )
    good = pc.and_(
        pc.greater_equal(n_tokens, 5),
        pc.and_(
            pc.greater_equal(mean_tok_len, 2.0), pc.less_equal(mean_tok_len, 12.0)
        ),
    )
    batch = batch.append_column("stop_ratio", stop_ratio)
    batch = batch.append_column("mean_token_len", mean_tok_len)
    batch = batch.append_column("quality_ok", good)
    return batch


# language → characteristic stopwords (tiny deterministic tables; a real
# deployment would load fastText-style models in the actor __init__)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "that", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit"},
    "fr": {"le", "la", "les", "et", "est", "pas", "avec"},
    "es": {"el", "la", "los", "y", "es", "no", "con"},
    "it": {"il", "la", "gli", "e", "è", "non", "con"},
    "nl": {"de", "het", "een", "en", "is", "niet", "met"},
    "pt": {"o", "a", "os", "e", "é", "não", "com"},
}


class LangId:
    """Heuristic language ID as an actor-pool stage: marker tables compiled
    once per actor (__init__), scoring fully vectorized and exact-string
    (no hashing, so oracle parity is collision-free).

    Scoring pass per batch: ONE dictionary-encode of the flat token array,
    then one np.unique over packed (doc, code) pairs gives each distinct
    (doc, word) once; batch-vocabulary codes matching a marker word fan out
    to their (possibly several) languages and accumulate with np.add.at —
    i.e. counts[doc, lang] = #distinct markers of lang present, identical
    to the previous per-marker string-equality formulation but without 49
    full-array comparison passes (DRAM-bound; measured ~4× slower).
    Winner = max distinct-marker count, ties to the earlier language in
    registration order; zero markers → 'und'."""

    def __init__(self) -> None:
        self.lang_order = list(_LANG_MARKERS)
        self.marker_words = [sorted(_LANG_MARKERS[lang]) for lang in self.lang_order]
        # word → list of language indices (markers overlap across languages)
        self.word_langs: dict[str, list[int]] = {}
        for li, words in enumerate(self.marker_words):
            for w in words:
                self.word_langs.setdefault(w, []).append(li)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.utf8_lower(pc.cast(text, pa.string())), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        n_docs = len(toks)
        doc_lens = np.diff(offsets)
        counts = np.zeros((n_docs, len(self.lang_order)), dtype=np.int64)
        if len(flat):
            dic = flat.dictionary_encode()
            codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = dic.dictionary.to_pylist()
            # batch-local vocab → language fan-out (vocab is tiny vs tokens)
            code_langs = [
                (c, li)
                for c, w in enumerate(vocab)
                if w in self.word_langs
                for li in self.word_langs[w]
            ]
            if code_langs:
                # keep only marker-code tokens before the unique (marker
                # tokens are a tiny fraction of the stream)
                is_marker = np.zeros(len(vocab), dtype=bool)
                is_marker[[c for c, _ in code_langs]] = True
                keep = is_marker[codes]
                doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
                pair = np.unique((doc_idx[keep] << np.int64(32)) | codes[keep])
                p_doc = (pair >> np.int64(32)).astype(np.int64)
                p_code = (pair & np.int64(0xFFFFFFFF)).astype(np.int64)
                # ≤ #markers entries; each == pass runs over the small
                # unique (doc, marker-word) pair set only
                for c, li in code_langs:
                    m = p_code == c
                    if m.any():
                        np.add.at(counts[:, li], p_doc[m], 1)
        best_n = counts.max(axis=1)
        best_ix = counts.argmax(axis=1)  # first max → earliest language wins ties
        langs = np.asarray(self.lang_order, dtype=object)
        preds = np.where(best_n > 0, langs[best_ix], "und")
        return batch.append_column(
            "lang_pred", pa.array(preds.tolist(), type=pa.string())
        )


def _bucketed_ngram_sum(partials, n_parts: int = 32, key: str = "ngram",
                        val: str = "n"):
    """Keyed sum of (ngram, n) partial rows via a coarse key-hash bucket
    shuffle + one Arrow hash-aggregation per bucket.  Replaces
    ``groupby(key).aggregate(Sum)``, whose sort shuffle pays
    input_blocks × output_partitions slicing overhead — measured 12.8 s
    for 1.3M partial rows in 256 blocks at 1M pages vs ~1 s bucketed
    (the line_dedup coarse-bucket rule, applied to the vocabulary sum
    every n-gram audit rides)."""
    from ..sketches.hashing import bucket_of

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "gb", pa.array(bucket_of(batch.column(key), n_parts), pa.int32())
        )

    def bucket_sum(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table(
                {key: pa.array([], pa.string()), val: pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(group.select([key, val]), key).aggregate(
            [(val, "sum")]
        )
        return g.select([key, f"{val}_sum"]).rename_columns([key, val])

    return (
        partials.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gb")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )


def top_ngrams(ds, n: int = 2, k: int = 20, text_col: str = "text"):
    """Corpus-wide top-k token n-grams by exact count — the vocabulary /
    phrase-frequency profile every corpus audit starts with.

    Scale shape: per-batch partial counts first (one dictionary-encode +
    bincount per batch, so the shuffle carries the BATCH VOCABULARY, not
    one row per n-gram occurrence), then a keyed sum, then per-block top-k
    candidate pruning into a tiny global sort+limit.  Ties break
    lexicographically so results are deterministic under any partitioning.
    Per-batch top-k pruning before the sum would be WRONG (a globally
    frequent n-gram can be locally rare everywhere) — pruning happens only
    after the global counts exist."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        # per-batch vocabulary partials via the shared _gram_counts kernel;
        # empty text contributes no tokens (its split yields [''] — a
        # 1-token doc that can't form an n-gram for n >= 2; for n == 1 it
        # counts '' like the SQL mirror does, a corner the caller filters)
        grams, counts = _gram_counts(batch, n, text_col)
        if grams is None:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        return pa.table({"ngram": grams, "n": pa.array(counts, pa.int64())})

    summed = _bucketed_ngram_sum(
        # ~32k-doc bundles: per-block (4k-doc) batches compress their
        # vocabulary 8x worse AND leave 256 skinny blocks feeding the
        # bucket shuffle, whose cost scales with input_blocks x
        # partitions (the editsim rule; measured there 14.0s -> ~2s)
        ds.map_batches(
            partial_counts,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=32768,
        )
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("n", "descending"), ("ngram", "ascending")],
        )
        return batch.take(idx)

    candidates = summed.map_batches(block_topk, batch_format="pyarrow")
    return candidates.sort(["n", "ngram"], descending=[True, False]).limit(k)


def _gram_counts(batch: pa.Table, n: int, text_col: str):
    """Per-batch unique n-gram strings + occurrence counts (the shared
    kernel of top_ngrams / heavy_ngrams): split → positional joins →
    in-document validity mask → dictionary-encode + bincount."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(pc.cast(text, pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    doc_lens = np.diff(offsets)
    total = len(flat)
    if total < n:
        return None, None
    parts = [flat.slice(j, total - n + 1) for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = pc.binary_join_element_wise(grams, p, " ")
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], doc_lens)
    valid = (pos_in_doc <= np.repeat(doc_lens, doc_lens) - n)[: total - n + 1]
    grams = grams.filter(pa.array(valid))
    if len(grams) == 0:
        return None, None
    dic = grams.dictionary_encode()
    counts = np.bincount(
        dic.indices.to_numpy(zero_copy_only=False), minlength=len(dic.dictionary)
    ).astype(np.int64)
    return dic.dictionary, counts


class _HeavySurvivorFilter:
    """Actor-pool pass-2 stage of ``heavy_ngrams``: the merged CMS
    deserializes ONCE per actor (__init__), then each batch emits only the
    n-grams whose CMS estimate clears ``min_count`` — CMS never
    undercounts, so no true heavy hitter is ever dropped here."""

    def __init__(self, cms_ref, n: int, min_count: int, text_col: str):
        import ray

        from ..sketches.cms import CountMin

        self.cms = CountMin.from_bytes(ray.get(cms_ref))
        self.n = n
        self.min_count = min_count
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        grams, counts = _gram_counts(batch, self.n, self.text_col)
        if grams is None:
            return empty
        est = self.cms.query(hash64(grams))
        keep = est >= np.uint64(self.min_count)
        if not keep.any():
            return empty
        return pa.table(
            {
                "ngram": grams.filter(pa.array(keep)),
                "n": pa.array(counts[keep], pa.int64()),
            }
        )


def heavy_ngrams(
    ds,
    n: int = 2,
    min_count: int = 100,
    k: int = 20,
    text_col: str = "text",
    width: int = 1 << 20,
    depth: int = 4,
):
    """EXACT heavy-hitter n-grams (count ≥ min_count, top-k) for corpora
    whose n-gram vocabulary is too large to shuffle — the scale path where
    ``top_ngrams``'s exact global groupby stops compressing (uniform-ish
    tails, 10^9+ distinct n-grams).

    Sketch-pruned exactness in two streaming passes:

    1. A mergeable Count-Min over n-gram hashes (fixed width×depth memory
       per partial, coalesce-tree merge — no keyed shuffle).
    2. An actor-pool filter keeps only n-grams whose CMS estimate clears
       ``min_count`` (CMS never undercounts ⇒ ZERO false negatives; the
       overcount ε·N admits some extras), then an exact groupby counts the
       SURVIVORS only and the final ``HAVING count ≥ min_count`` + top-k
       removes the false positives.  The result is therefore EXACT — the
       sketch only bounds the shuffle, never the answer — which is what
       lets the SQL oracle gate it bit-for-bit.

    Sizing rule (measured): pruning power collapses when the CMS saturates
    — expected collision inflation is ≈ total_count / width per cell, so
    pick ``width`` ≫ total_count / min_count.  On Zipf-distributed text
    (real web corpora) that is cheap because min_count targets the head;
    on a HEADLESS corpus (uniform synthetic text) no width prunes — every
    key's true count sits near the mean, which is the regime where
    heavy-hitter mining itself is meaningless (measured: a 2^21-wide CMS
    over 16M near-uniform bigrams passes everything through)."""
    import ray

    from ray.data.aggregate import Sum

    from ..sketches.cms import CountMin

    def cms_partial(batch: pa.Table) -> pa.Table:
        grams, counts = _gram_counts(batch, n, text_col)
        cms = CountMin.create(width, depth)
        if grams is not None:
            cms.update(hash64(grams), counts=counts)
        return pa.table({"payload": pa.array([cms.to_bytes()], pa.large_binary())})

    def merge_blobs(batch: pa.Table) -> pa.Table:
        blobs = batch.column("payload").to_pylist()
        acc = CountMin.from_bytes(blobs[0])
        for b in blobs[1:]:
            acc.merge(CountMin.from_bytes(b))
        return pa.table({"payload": pa.array([acc.to_bytes()], pa.large_binary())})

    partials = ds.map_batches(cms_partial, batch_format="pyarrow", zero_copy_batch=True)
    # one tree level bundles 8 partials per merge task; the driver folds the
    # small remainder
    level1 = partials.map_batches(merge_blobs, batch_format="pyarrow", batch_size=8)
    rows = level1.take_all()
    if not rows:
        # empty input dataset (e.g. a glob that matched nothing)
        import ray.data as rd

        return rd.from_arrow(
            pa.table({"ngram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        )
    acc = CountMin.from_bytes(rows[0]["payload"])
    for r in rows[1:]:
        acc.merge(CountMin.from_bytes(r["payload"]))
    cms_ref = ray.put(acc.to_bytes())

    survivors = ds.map_batches(
        _HeavySurvivorFilter,
        fn_constructor_kwargs={
            "cms_ref": cms_ref,
            "n": n,
            "min_count": min_count,
            "text_col": text_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    summed = _bucketed_ngram_sum(survivors)

    def exact_filter_topk(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater_equal(batch.column("n"), pa.scalar(min_count, pa.int64()))
        )
        idx = pc.select_k_unstable(
            batch,
            k=min(k, batch.num_rows),
            sort_keys=[("n", "descending"), ("ngram", "ascending")],
        )
        return batch.take(idx)

    return (
        summed.map_batches(exact_filter_topk, batch_format="pyarrow")
        .sort(["n", "ngram"], descending=[True, False])
        .limit(k)
    )


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprints: fnv-based content hash (exact-dup key)
    and SimHash over the token multiset (near-dup key) — both fully
    vectorized across the batch."""
    from ..sketches.minhash import batch_simhash

    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    content_hash = hash64(text).astype(np.int64)
    sims = batch_simhash(text)
    batch = batch.append_column("content_hash", pa.array(content_hash, type=pa.int64()))
    batch = batch.append_column("simhash", pa.array(sims.view(np.int64), type=pa.int64()))
    return batch


def _flat_tokens(batch: pa.Table, text_col: str):
    """Whitespace-split of ``text_col`` → (flat token StringArray, per-doc
    offsets int64[nrows+1] rebased to 0).  Null text behaves as empty (one
    '' token) — the shared tokenize prologue for the index/search/tf-idf
    family (same token model as trainprep._split_tokens)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.cast(text, pa.string())
    if text.null_count:
        text = text.fill_null("")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return toks.flatten(), offsets - offsets[0]


def inverted_index(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 1024,
    num_partitions: int | None = None,
):
    """Distributed inverted-index build: one output row per distinct token —
    (``token``, ``df`` = number of documents containing it, ``postings`` =
    the first ``max_postings`` containing doc ids in ascending order, as a
    comma-joined string).  The retrieval-side primitive of a training-data
    stack (nearest public relative: block-max postings construction in any
    search engine), and the df table doubles as the IDF source for
    tf-idf-style quality scoring.

    Shape (10^12 docs): per-batch dedup to unique (token, doc) pairs — a
    document contributes each token once regardless of repetition — then
    ONE shuffle of those skinny pairs into coarse token-hash buckets
    (`groupby(bucket).map_groups`, the measured-fast shape at unbounded key
    cardinality; never ``groupby(token)`` directly).  Each bucket builds
    its slice of the index fully vectorized: one sort, run detection,
    within-run ranks, one ListArray + binary_join for ALL postings strings
    at once.  Truncation to ``max_postings`` is explicit in ``df`` (which
    always counts every document) — no silent caps."""
    if max_postings < 1:
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    from ..sketches.hashing import hash64
    from .dedup import _auto_parts

    n_parts = num_partitions or _auto_parts(ds, floor=32)

    def pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, offsets = _flat_tokens(batch, text_col)
        row = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets)
        )
        # unique (token, doc) pairs within the batch: sort token hashes per
        # row and drop equal-neighbor repeats (exact token dedup per doc
        # needs string compare only among equal hashes — collision-free in
        # practice, and a collision only costs a duplicate pair, which the
        # bucket-side run detection removes anyway)
        th = hash64(flat)
        order = np.lexsort((th, row))
        keep = np.ones(len(flat), dtype=bool)
        if len(flat) > 1:
            keep[1:] = (row[order][1:] != row[order][:-1]) | (
                th[order][1:] != th[order][:-1]
            )
            # hash equality is only a CANDIDATE for duplicate: verify with
            # the actual strings so a collision can never LOSE a pair (a
            # surviving duplicate is collapsed exactly on the bucket side)
            j = np.flatnonzero(~keep)
            if len(j):
                same = pc.equal(
                    pc.take(flat, pa.array(order[j], pa.int64())),
                    pc.take(flat, pa.array(order[j - 1], pa.int64())),
                ).to_numpy(zero_copy_only=False)
                keep[j[~same.astype(bool)]] = True
        sel = order[keep]
        tok_u = pc.take(flat, pa.array(sel, pa.int64()))
        bucket = (hash64(tok_u) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "token": tok_u,
                id_col: pc.take(ids, pa.array(row[sel], pa.int64())),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    def build_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("token", "ascending"), (id_col, "ascending")]
        )
        toks = pc.take(group.column("token"), order).combine_chunks()
        ids = pc.take(group.column(id_col), order).combine_chunks()
        n = len(toks)
        if n == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "postings": pa.array([], pa.string()),
                }
            )
        if n > 1:
            tnew = pc.not_equal(toks.slice(1), toks.slice(0, n - 1))
            inew = pc.not_equal(ids.slice(1), ids.slice(0, n - 1))
            new_run = np.concatenate(
                ([True], tnew.to_numpy(zero_copy_only=False).astype(bool))
            )
            # cross-batch duplicate (token, doc) pairs collapse here
            dup_pair = np.concatenate(
                (
                    [False],
                    ~tnew.to_numpy(zero_copy_only=False).astype(bool)
                    & ~inew.to_numpy(zero_copy_only=False).astype(bool),
                )
            )
            if dup_pair.any():
                keep = ~dup_pair
                toks = toks.filter(pa.array(keep))
                ids = ids.filter(pa.array(keep))
                new_run = new_run[keep]
                n = len(toks)
        else:
            new_run = np.ones(1, dtype=bool)
        starts = np.flatnonzero(new_run)
        bounds = np.concatenate((starts, [n]))
        df = np.diff(bounds)
        # within-run rank → postings truncation mask
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, df)
        post_keep = rank < max_postings
        kept_per_run = np.minimum(df, max_postings)
        post_off = np.zeros(len(df) + 1, dtype=np.int64)
        np.cumsum(kept_per_run, out=post_off[1:])
        id_strs = pc.cast(ids.filter(pa.array(post_keep)), pa.string())
        la = pa.ListArray.from_arrays(pa.array(post_off, pa.int32()), id_strs)
        return pa.table(
            {
                "token": pc.take(toks, pa.array(starts, pa.int64())),
                "df": pa.array(df, pa.int64()),
                "postings": pc.binary_join(la, ","),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(build_bucket, batch_format="pyarrow")
    )


def keyword_search(ds, query, k: int = 10, id_col: str = "doc_id", text_col: str = "text"):
    """Exact keyword retrieval: top-``k`` documents by total occurrences of
    the query terms (token-level exact match; ties broken by ascending id;
    zero-score documents never rank).  Integer scores — no float ranking
    drift, so results are bit-stable across engines and cluster sizes.

    Shape (10^12 docs): the query term set is tiny by nature and broadcast
    by closure; each batch does one vectorized ``pc.is_in`` over its flat
    token array + one segment-sum, keeps its local top-k candidates
    (``pc.select_k_unstable``), and the global answer is a k-row sort —
    the same never-full-sort construction as ``top_k_orders``."""
    if isinstance(query, str):
        terms = [t for t in query.split(" ") if t != ""]
    else:
        terms = [t for t in query if t]
    if not terms:
        raise ValueError("query must contain at least one term")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    term_set = pa.array(sorted(set(terms)), pa.string())

    def score_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, offsets = _flat_tokens(batch, text_col)
        hit = pc.is_in(flat, value_set=term_set).to_numpy(
            zero_copy_only=False
        )
        ck = np.zeros(len(hit) + 1, dtype=np.int64)
        np.cumsum(hit, out=ck[1:])
        score = ck[offsets[1:]] - ck[offsets[:-1]]
        t = pa.table(
            {id_col: ids, "score": pa.array(score, pa.int64())}
        ).filter(pa.array(score > 0))
        if t.num_rows == 0:
            return t
        idx = pc.select_k_unstable(
            t,
            k=min(k, t.num_rows),
            sort_keys=[("score", "descending"), (id_col, "ascending")],
        )
        return t.take(idx)

    candidates = ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return candidates.sort(["score", id_col], descending=[True, False]).limit(k)


def bm25_search(
    ds, query, k: int = 10, id_col: str = "doc_id", text_col: str = "text"
):
    """Relevance-ranked keyword retrieval: top-``k`` documents by an
    integer-quantized BM25 score — ``keyword_search``'s raw occurrence
    count upgraded with the two corrections every ranked-retrieval stack
    needs (rare terms count more, long documents count less), while
    keeping the scores pure int64 so the ranking is bit-stable across
    engines and cluster sizes (the float-RANKING fragility rule).

    Exact integer quantization of classic BM25 (k1 = 1.2, b = 0.75 as
    rationals 6/5 and 3/4; token model = the corpus-wide split-on-space
    standard, null text = one '' token):

        A       = total_tokens // n_docs              (integer avgdl)
        idf(t)  = ilog2((2*N + 1) // (2*df_t + 1))    (floor log2; 0 for
                                                       ubiquitous terms)
        s(d, t) = idf(t) * (45056*A*tf) // (20*A*tf + 6*A + 18*dl)
        score(d) = Σ_t s(d, t)

    where the per-term fraction is tf*(k1+1) / (tf + k1*(1-b+b*dl/A))
    multiplied through by 20*A (clearing both rationals) and scaled by
    1024 before the floor division (45056 = 44*1024).  Every operation is
    int64 (``//`` = floor on the all-positive operands), so the DuckDB
    mirror reproduces it bit-for-bit via ``strlen(bin(x))-1`` for ilog2.

    Shape (10^12 docs): pass 1 streams ONE partial row per batch (n_docs,
    n_tokens, per-term df — the query has a handful of terms by nature)
    through the bounded coalesce-tree; the driver folds the single stats
    row into ~m integers.  Pass 2 is `keyword_search`'s construction:
    vectorized per-term ``pc.equal`` + segment sums per batch, local
    ``select_k_unstable``, global k-row sort.  Nothing corpus-sized ever
    moves.  Fever parity: ranked retrieval over the matched-indicator
    corpus generalizes the bloom ioc-matcher's boolean hit model
    (/root/reference/processing/bloom_handler.go match emission) to
    scored hits."""
    from .aggregates import tree_groupby

    if isinstance(query, str):
        terms = [t for t in query.split(" ") if t != ""]
    else:
        terms = [t for t in query if t]
    if not terms:
        raise ValueError("query must contain at least one term")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = sorted(set(terms))
    term_arrs = [pa.array([t], pa.string()) for t in terms]

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, offsets = _flat_tokens(batch, text_col)
        cols = {
            "g": pa.array([0], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
            "toks": pa.array([len(flat)], pa.int64()),
        }
        for i, ta in enumerate(term_arrs):
            hit = pc.is_in(flat, value_set=ta).to_numpy(zero_copy_only=False)
            ck = np.zeros(len(hit) + 1, dtype=np.int64)
            np.cumsum(hit, out=ck[1:])
            per_doc = ck[offsets[1:]] - ck[offsets[:-1]]
            cols[f"df{i}"] = pa.array([int((per_doc > 0).sum())], pa.int64())
        return pa.table(cols)

    stat_cols = ["n", "toks"] + [f"df{i}" for i in range(len(terms))]
    (st,) = tree_groupby(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        ["g"],
        [(c, "sum") for c in stat_cols],
    ).take_all()
    n_docs, total_tokens = st["n"], st["toks"]
    if n_docs == 0:
        raise ValueError("bm25_search: empty corpus")
    avgdl = max(total_tokens // n_docs, 1)
    idf = [
        int((2 * n_docs + 1) // (2 * st[f"df{i}"] + 1)).bit_length() - 1
        for i in range(len(terms))
    ]

    def score_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, offsets = _flat_tokens(batch, text_col)
        dl = offsets[1:] - offsets[:-1]
        score = np.zeros(batch.num_rows, dtype=np.int64)
        for i, ta in enumerate(term_arrs):
            if idf[i] == 0:
                continue
            hit = pc.is_in(flat, value_set=ta).to_numpy(zero_copy_only=False)
            ck = np.zeros(len(hit) + 1, dtype=np.int64)
            np.cumsum(hit, out=ck[1:])
            tf = ck[offsets[1:]] - ck[offsets[:-1]]
            score += idf[i] * (
                (45056 * avgdl * tf) // (20 * avgdl * tf + 6 * avgdl + 18 * dl)
            )
        t = pa.table(
            {id_col: ids, "score": pa.array(score, pa.int64())}
        ).filter(pa.array(score > 0))
        if t.num_rows == 0:
            return t
        idx = pc.select_k_unstable(
            t,
            k=min(k, t.num_rows),
            sort_keys=[("score", "descending"), (id_col, "ascending")],
        )
        return t.take(idx)

    candidates = ds.map_batches(
        score_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return candidates.sort(["score", id_col], descending=[True, False]).limit(k)


def _doc_token_tf(batch: pa.Table, id_col: str, text_col: str):
    """Per-batch (row index, token, tf) triples: one dictionary-encode of
    the flat token stream + one np.unique over packed (row, code) pairs —
    each distinct (doc, token) once with its in-doc count."""
    flat, offsets = _flat_tokens(batch, text_col)
    if len(flat) == 0:
        return (
            np.zeros(0, np.int64),
            pa.array([], pa.string()),
            np.zeros(0, np.int64),
        )
    row = np.repeat(np.arange(batch.num_rows, dtype=np.int64), np.diff(offsets))
    dic = flat.dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # 24 bits of vocab per batch is ample (vocab ≤ tokens ≤ batch budget);
    # guard explicitly rather than silently corrupt the packing
    if len(dic.dictionary) > (1 << 24):
        raise ValueError("batch vocabulary exceeds 2^24 — lower batch_size")
    pair, tf = np.unique((row << np.int64(24)) | codes, return_counts=True)
    p_row = (pair >> np.int64(24)).astype(np.int64)
    p_code = (pair & np.int64((1 << 24) - 1)).astype(np.int64)
    tokens = pc.take(dic.dictionary, pa.array(p_code, pa.int64()))
    return p_row, tokens, tf.astype(np.int64)


def doc_top_terms(
    ds,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
):
    """The ``k`` most CHARACTERISTIC tokens of each document: rank per doc
    by (tf DESC, df ASC, token ASC) — frequent in the document, rare in
    the corpus — and emit (id, token, tf, df, rk).  This is the tf-idf
    keyword extraction every corpus audit wants, in pure integer order
    (no ``log`` floats, so the ranking is bit-stable and SQL-mirrorable).

    Shape (10^12 docs): pass 1 builds the corpus document-frequency table
    with the inverted-index movement budget (per-batch distinct (doc,
    token) combiner → coarse-bucket map_groups sum).  Pass 2:

    * broadcast path: when the df vocabulary fits ``broadcast_bytes``
      (two columns, token + int64 — web vocabularies are GBs, not TBs),
      each batch joins locally via one ``pc.index_in`` and ranks its own
      documents with a single 4-key Arrow sort + run detection.  No
      second shuffle at all.
    * join fallback: union-tag (doc, token, tf) rows with the df rows by
      token-hash bucket, attach df per bucket, then coarse-partition by
      doc hash and run the identical rank kernel per partition.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from ..sketches.hashing import hash64, hash64_ints
    from .dedup import _auto_parts

    import ray

    n_parts = num_partitions or _auto_parts(ds, floor=32)

    def df_partial(batch: pa.Table) -> pa.Table:
        _, tokens, _ = _doc_token_tf(batch, id_col, text_col)
        t = pa.TableGroupBy(pa.table({"token": tokens}), ["token"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["token", "df"])
        tok = t.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        bucket = (hash64(tok) % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def df_bucket(group: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(group.select(["token", "df"]), ["token"]).aggregate(
            [("df", "sum")]
        )
        return t.rename_columns(["token", "df"])

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(df_bucket, batch_format="pyarrow")
        .materialize()
    )

    def rank_table(t: pa.Table, doc_key: str) -> pa.Table:
        """(doc_key, token, tf, df) rows → per-doc (tf DESC, df ASC, token)
        rank, rows with rank < k.  One multi-key Arrow sort + run
        detection — never a per-document loop."""
        n = t.num_rows
        if n == 0:
            return t.append_column("rk", pa.array([], pa.int64()))
        order = pc.sort_indices(
            t,
            sort_keys=[
                (doc_key, "ascending"),
                ("tf", "descending"),
                ("df", "ascending"),
                ("token", "ascending"),
            ],
        )
        t = t.take(order)
        d = t.column(doc_key)
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        if n > 1:
            neq = pc.not_equal(d.slice(1), d.slice(0, n - 1))
            new_doc = np.concatenate(
                ([True], neq.to_numpy(zero_copy_only=False).astype(bool))
            )
        else:
            new_doc = np.ones(1, dtype=bool)
        starts = np.flatnonzero(new_doc)
        runs = np.diff(np.concatenate((starts, [n])))
        rk = np.arange(n, dtype=np.int64) - np.repeat(starts, runs)
        t = t.append_column("rk", pa.array(rk, pa.int64()))
        return t.filter(pa.array(rk < k))

    df_bytes = df_ds.size_bytes() or 0
    if df_bytes <= broadcast_bytes:
        tabs = [
            t for t in ray.get(df_ds.to_arrow_refs()) if t.num_rows and t.num_columns
        ]
        vocab = (
            pa.concat_tables(tabs)
            if tabs
            else pa.table(
                {"token": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        )
        vocab_ref = ray.put(
            (vocab.column("token").combine_chunks(),
             vocab.column("df").to_numpy(zero_copy_only=False))
        )

        def rank_batch(batch: pa.Table) -> pa.Table:
            vtok, vdf = ray.get(vocab_ref)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            p_row, tokens, tf = _doc_token_tf(batch, id_col, text_col)
            pos_arr = pc.index_in(tokens, value_set=vtok)
            if pos_arr.null_count:  # df pass and rank pass saw different data
                raise ValueError(
                    "doc_top_terms: token absent from the corpus df vocabulary "
                    "— upstream dataset is not deterministic across executions"
                )
            pos = pos_arr.to_numpy(zero_copy_only=False).astype(np.int64)
            t = pa.table(
                {
                    "_row": pa.array(p_row, pa.int64()),
                    "token": tokens,
                    "tf": pa.array(tf, pa.int64()),
                    "df": pa.array(vdf[pos], pa.int64()),
                }
            )
            t = rank_table(t, "_row")
            rows = t.column("_row")
            out = pa.table(
                {
                    id_col: pc.take(ids, rows),
                    "token": t.column("token"),
                    "tf": t.column("tf"),
                    "df": t.column("df"),
                    "rk": t.column("rk"),
                }
            )
            return out

        return ds.map_batches(rank_batch, batch_format="pyarrow", zero_copy_batch=True)

    # -------- join fallback: df vocabulary exceeds a worker's heap ------
    logger = __import__("logging").getLogger(__name__)
    logger.info(
        "doc_top_terms: df table %.1f MB > broadcast cap %.1f MB — bucketed "
        "join path over %d partitions",
        df_bytes / 2**20, broadcast_bytes / 2**20, n_parts,
    )

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        p_row, tokens, tf = _doc_token_tf(batch, id_col, text_col)
        bucket = (hash64(tokens) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(p_row, pa.int64())),
                "token": tokens,
                "tf": pa.array(tf, pa.int64()),
                "df": pa.array(np.zeros(len(tf), np.int64), pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
                "is_df": pa.array(np.zeros(len(tf), dtype=bool)),
            }
        )

    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()

    def df_rows(batch: pa.Table) -> pa.Table:
        tok = batch.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        n = len(tok)
        bucket = (hash64(tok) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                id_col: pa.nulls(n, id_type),
                "token": tok,
                "tf": pa.array(np.zeros(n, np.int64), pa.int64()),
                "df": batch.column("df"),
                "bucket": pa.array(bucket, pa.int32()),
                "is_df": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        is_df = group.column("is_df")
        dft = group.filter(is_df)
        rows = group.filter(pc.invert(is_df))
        vtok = dft.column("token").combine_chunks()
        vdf = dft.column("df").to_numpy(zero_copy_only=False)
        pos_arr = pc.index_in(rows.column("token"), value_set=vtok)
        if pos_arr.null_count:  # df pass and tf pass saw different data
            raise ValueError(
                "doc_top_terms: token absent from its df bucket — upstream "
                "dataset is not deterministic across executions"
            )
        pos = pos_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = rows.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            dpart = hash64_ints(
                ids.to_numpy(zero_copy_only=False).astype(np.int64)
            )
        else:
            dpart = hash64(ids)
        return pa.table(
            {
                id_col: ids,
                "token": rows.column("token"),
                "tf": rows.column("tf"),
                "df": pa.array(vdf[pos], pa.int64()),
                "dpart": pa.array(
                    (dpart % np.uint64(n_parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    joined = (
        ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)
        .union(df_ds.map_batches(df_rows, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(attach_df, batch_format="pyarrow")
    )

    def rank_part(group: pa.Table) -> pa.Table:
        t = rank_table(group.select([id_col, "token", "tf", "df"]), id_col)
        return t

    return joined.groupby("dpart").map_groups(rank_part, batch_format="pyarrow")


# ------------------------------------------------ bigram OOV quality score
def _batch_bigram_codes(texts):
    """(codes uint16 per in-doc bigram position, doc lens in bigrams) —
    character bigrams as ``byte[i]·256 + byte[i+1]`` over the flat zero-copy
    buffer, doc-boundary positions masked out.  Byte == character on the
    ASCII corpora these quality scores target; callers needing full UTF-8
    should normalize first (``curate.normalize_text``)."""
    from ..sketches.hashing import _flat_bytes

    buf, starts, lens = _flat_bytes(texts)
    n_bi = np.maximum(lens - 1, 0)
    if len(buf) < 2:
        return np.zeros(0, np.int32), n_bi
    codes = buf[:-1].astype(np.int32) * 256 + buf[1:]
    # valid bigram start positions: every byte of a doc except its last
    # (empty docs own no byte; the buffer's final byte falls off codes[])
    keep = np.ones(len(buf) - 1, dtype=bool)
    last = starts[lens > 0] + lens[lens > 0] - 1
    keep[last[last < len(buf) - 1]] = False
    return codes[keep], n_bi


def char_bigram_oov(ds, ref_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Character-bigram out-of-vocabulary rate — the CCNet-style "does this
    document look like the reference corpus" quality signal, in exact
    integer form: per document, (total bigram positions, positions whose
    bigram never occurs in the reference).  Gibberish / binary junk /
    wrong-script text scores high n_oov; callers filter on
    ``n_oov / n_bigrams``.

    Counts stay integers (no float ratio) so the result value-hashes
    bit-exactly against a SQL mirror.

    Scale shape: the reference model is the DISTINCT bigram set — at most
    65,536 codes regardless of corpus size — built with per-batch np.unique
    partials tree-combined, broadcast as a 64 KB boolean table via
    ``ray.put``; scoring is one vectorized pass (flat-buffer bigram codes,
    ``np.add.reduceat`` per-doc segment sums).  Nothing shuffles."""
    import ray

    from .aggregates import tree_groupby

    def vocab_partial(batch: pa.Table) -> pa.Table:
        codes, _ = _batch_bigram_codes(batch.column(text_col))
        uk = np.unique(codes)
        return pa.table(
            {"g": pa.array(uk, pa.int32()),
             "c": pa.array(np.ones(len(uk), np.int64))}
        )

    parts = [
        t
        for t in ray.get(
            tree_groupby(
                ref_ds.map_batches(
                    vocab_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["g"],
                [("c", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    lut = np.zeros(65536, dtype=bool)
    if parts:
        vocab = pa.concat_tables(parts).column("g").to_numpy(zero_copy_only=False)
        lut[vocab] = True
    lut_ref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        known = ray.get(lut_ref)
        codes, n_bi = _batch_bigram_codes(batch.column(text_col))
        oov = (~known[codes]).astype(np.int64)
        # per-doc segment sums as prefix-sum differences (empty segments
        # come out 0 for free, unlike reduceat's repeat-previous quirk)
        cs = np.concatenate(([0], np.cumsum(oov)))
        ends = np.cumsum(n_bi)
        n_oov = cs[ends] - cs[ends - n_bi]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_bigrams": pa.array(n_bi, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def _ilog2_exact(x: np.ndarray) -> np.ndarray:
    """floor(log2(x)) for positive int64 via frexp — exact below 2^53
    (float log2 rounds at power-of-2 boundaries; frexp's exponent cannot)."""
    return (np.frexp(x.astype(np.float64))[1] - 1).astype(np.int64)


def unigram_logloss(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_penalty_bits: int = 8,
    max_vocab: int = 1 << 22,
):
    """Unigram LM surprise in exact integer bits — the CCNet/KenLM
    perplexity-filter shape ("does a language model trained on the
    reference corpus find this document likely?") without floats: each
    token costs ``ilog2(N) - ilog2(count(token))`` bits under the
    reference unigram model (N = reference token total), unseen tokens
    cost ``ilog2(N) + oov_penalty_bits``.  Per document the op emits
    (``n_tokens``, ``bits``); callers filter on bits/n_tokens, the
    integer analog of per-token log-loss.  Integer log2 keeps the score
    partition-invariant and bit-mirrorable in SQL (``strlen(bin(c))-1``)
    where float log-probs never hash-match across engines.

    Tokenization is the corpus-wide standard split-on-space (empty text
    scores as the single token '' — the `top_ngrams` n=1 corner, mirrored
    by SQL ``string_split``).

    Scale shape: the model is the reference VOCABULARY with counts —
    per-batch dictionary-encode partials (the shuffle carries batch
    vocab, not occurrences), coalesce-tree summed, driver-collected under
    a loud ``max_vocab`` cap and broadcast ONCE via ``ray.put`` (a
    per-process cache un-pickles it once per worker, not per batch).
    Scoring is one vectorized pass per batch: dictionary-encode, one
    model probe per DISTINCT batch token, prefix-sum segment sums per
    doc.  The corpus never shuffles."""
    import ray

    from .aggregates import tree_groupby

    if oov_penalty_bits < 0:
        raise ValueError(
            f"unigram_logloss: oov_penalty_bits must be >= 0, got "
            f"{oov_penalty_bits}"
        )

    def vocab_partial(batch: pa.Table) -> pa.Table:
        grams, counts = _gram_counts(batch, 1, text_col)
        if grams is None:
            return pa.table(
                {"tok": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        return pa.table({"tok": grams, "c": pa.array(counts, pa.int64())})

    parts = [
        t
        for t in ray.get(
            tree_groupby(
                ref_ds.map_batches(
                    vocab_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["tok"],
                [("c", "sum")],
                # enforce the cap INSIDE the combine tree — an unbounded
                # token domain errors before the full vocab can reach one
                # task or the driver
                max_groups=max_vocab,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not parts:
        raise ValueError("unigram_logloss: reference corpus has no tokens")
    vocab_t = pa.concat_tables(parts)
    if vocab_t.num_rows > max_vocab:
        raise ValueError(
            f"unigram_logloss: reference vocabulary {vocab_t.num_rows} "
            f"exceeds max_vocab={max_vocab} — raise the cap or min-count "
            "prune the reference first"
        )
    counts = vocab_t.column("c").to_numpy(zero_copy_only=False)
    n_total = int(counts.sum())
    il_n = int(_ilog2_exact(np.array([n_total]))[0])
    tok_bits = il_n - _ilog2_exact(counts)
    model = dict(zip(vocab_t.column("tok").to_pylist(), tok_bits.tolist()))
    oov_bits = il_n + int(oov_penalty_bits)
    model_ref = ray.put((model, oov_bits))

    def score(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        # the model dict is pickled state (never zero-copy): one unpickle
        # per worker process, not per batch
        lut, oov = cached_get(model_ref)
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.cast(text, pa.string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        enc = flat.dictionary_encode()
        dic = enc.dictionary.to_pylist()
        per_code = np.fromiter(
            (lut.get(t, oov) for t in dic), dtype=np.int64, count=len(dic)
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(per_code[codes])))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(np.diff(offs), pa.int64()),
                "bits": pa.array(cs[offs[1:]] - cs[offs[:-1]], pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def corpus_report(
    ds,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
):
    """One-pass corpus audit card — the summary every dataset release
    starts with, as (``metric``, ``value`` int64) rows:

    ``n_docs, n_tokens, n_chars, n_empty_docs, min_tokens, max_tokens,
    n_distinct_langs, n_distinct_sources``

    (token model = the corpus-wide split-on-space standard; empty text
    counts 1 token, the `top_ngrams` corner).  Pure integers, so the
    whole card value-hashes against its SQL mirror.

    Scale shape: ONE streaming pass emits per-batch partial rows —
    scalar sums/mins/maxes plus one marker row per DISTINCT lang/source
    seen in the batch (bounded domains, the `stratified_sample`
    contract) — and the bounded coalesce-tree reduces them; the final
    kernel folds markers into distinct counts.  Nothing corpus-sized
    moves, no shuffle."""
    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        if text.null_count:
            text = text.fill_null("")
        ntok = pc.add(pc.count_substring(text, " "), 1)
        nt = ntok.to_numpy(zero_copy_only=False).astype(np.int64)
        nch = (
            pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        metrics = [
            ("n_docs", len(nt), len(nt), len(nt)),
            ("n_tokens", int(nt.sum()), 0, 0),
            ("n_chars", int(nch.sum()), 0, 0),
            ("n_empty_docs", int((nch == 0).sum()), 0, 0),
        ]
        if len(nt):
            metrics.append(("min_tokens", 0, int(nt.min()), 0))
            metrics.append(("max_tokens", 0, 0, int(nt.max())))
        for col, pfx in ((lang_col, "__lang__"), (source_col, "__src__")):
            vals = batch.column(col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            for v in pc.unique(vals.drop_null()).to_pylist():
                metrics.append((f"{pfx}{v}", 0, 0, 0))
        m, s, mn, mx = zip(*metrics) if metrics else ((), (), (), ())
        return pa.table(
            {
                "metric": pa.array(list(m), pa.string()),
                "s": pa.array(list(s), pa.int64()),
                "mn": pa.array(list(mn), pa.int64()),
                "mx": pa.array(list(mx), pa.int64()),
            }
        )

    import ray.data as rd

    # zero-seed the scalar metrics: an empty corpus yields zero batches,
    # so without this the final kernel never runs and the card vanishes
    # instead of reporting zeros
    seed = pa.table(
        {
            "metric": pa.array(
                ["n_docs", "n_tokens", "n_chars", "n_empty_docs"], pa.string()
            ),
            "s": pa.array([0] * 4, pa.int64()),
            "mn": pa.array([0] * 4, pa.int64()),
            "mx": pa.array([0] * 4, pa.int64()),
        }
    )
    combined = tree_groupby(
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).union(rd.from_arrow(seed)),
        ["metric"],
        [("s", "sum"), ("mn", "min"), ("mx", "max")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        out: dict[str, int] = {
            "n_docs": 0, "n_tokens": 0, "n_chars": 0, "n_empty_docs": 0,
            "n_distinct_langs": 0, "n_distinct_sources": 0,
        }
        if batch.num_rows and batch.num_columns:
            ms = batch.column("metric").to_pylist()
            ss = batch.column("s").to_numpy(zero_copy_only=False)
            mns = batch.column("mn").to_numpy(zero_copy_only=False)
            mxs = batch.column("mx").to_numpy(zero_copy_only=False)
            for i, m in enumerate(ms):
                if m.startswith("__lang__"):
                    out["n_distinct_langs"] += 1
                elif m.startswith("__src__"):
                    out["n_distinct_sources"] += 1
                elif m == "min_tokens":
                    out["min_tokens"] = int(mns[i])
                elif m == "max_tokens":
                    out["max_tokens"] = int(mxs[i])
                else:
                    out[m] = int(ss[i])
        names = sorted(out)
        return pa.table(
            {
                "metric": pa.array(names, pa.string()),
                "value": pa.array([out[n] for n in names], pa.int64()),
            }
        )

    return combined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def ngram_novelty(ds, n_shingle: int = 3, num_partitions: int | None = None):
    """Per-document n-gram novelty — how much of a doc is text the rest of
    the corpus has never seen (the diversity/curation dual of the dedup
    family: near-dups score ~0, fresh content scores ~total).  For each
    doc: ``novel_shingles`` = its distinct n-token shingles whose corpus
    posting size is exactly 1, ``total_shingles`` = its distinct shingle
    count.  Shingle hashes are the same position-mixed token-hash folds
    the MinHash/containment paths use, so the SQL mirror (the factored
    ``_shingle_ctes`` prefix) agrees bit-for-bit, hash collisions
    included.

    Scale shape: ``total_shingles`` never shuffles at all (distinct
    shingle counts are known at post time and ship as per-doc rows);
    the novelty exchange ships ONLY batch-locally-unique shingles plus
    one weighted sentinel per locally-duplicated distinct shingle (a
    shingle the batch saw twice can never be novel) — a run's Σw == 1
    iff the true corpus posting size is 1, so the result is bit-exact
    while most of the (sh, doc) posting exchange stays home (measured
    46M → 7M rows at 1M pages).  Zero-shingle docs (< n tokens) ride
    the seen rows with w=0, so every input doc_id appears in the
    output.  The corpus text never moves.  Requires corpus-unique
    ``doc_id`` (the `exact_dedup` contract); input columns
    (doc_id, text).

    Output rows: (doc_id, novel_shingles, total_shingles), all int64."""
    from .dedup import (
        _auto_parts,
        _blob_offsets_data,
        _key_runs,
        _shingle_blob_table,
    )

    n_parts = num_partitions or _auto_parts(ds)
    pu = np.uint64(n_parts)
    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def post(batch: pa.Table) -> pa.Table:
        """Two row kinds in one schema (``kind`` int8):

        * 0 — posting rows for NOVELTY: only batch-locally-UNIQUE
          shingles ship as (sh, doc, w=1); a batch-locally-duplicated
          shingle can never be novel, so its rows fold into ONE
          (sh, doc=0, w=2) sentinel.  A run's Σw equals 1 iff the true
          corpus posting size is 1 (any other batch's contribution adds
          ≥1) — bit-exact novelty with most of the posting exchange
          never shuffled.
        * 1 — per-doc seen rows (doc, w=distinct shingle count), keyed
          by mixed doc id: ``total_shingles`` needs no shingle shuffle
          at all (it's known at post time), and shingle-less docs ride
          along as w=0.
        """
        t = _shingle_blob_table(batch, n_shingle, None)
        off, dat = _blob_offsets_data(t.column("sh"))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        counts = np.diff(off)
        doc = np.repeat(ids, counts)
        uniq, inv, cnt = np.unique(dat, return_inverse=True, return_counts=True)
        solo = cnt[inv] == 1
        sent = uniq[cnt > 1]
        sh_out = np.concatenate([dat[solo], sent])
        doc_out = np.concatenate([doc[solo], np.zeros(len(sent), np.int64)])
        w_out = np.concatenate(
            [
                np.ones(int(solo.sum()), np.int32),
                np.full(len(sent), 2, np.int32),
            ]
        )
        part = (sh_out % pu).astype(np.int32)
        kind = np.zeros(len(sh_out), np.int8)
        # per-doc seen rows (one per input doc, shingle-less included)
        with np.errstate(over="ignore"):
            dpart = ((ids.astype(np.uint64) * _MIX) % pu).astype(np.int32)
        return pa.table(
            {
                "sh": pa.array(
                    np.concatenate([sh_out.view(np.int64), np.zeros(len(ids), np.int64)]),
                    pa.int64(),
                ),
                "doc": pa.array(np.concatenate([doc_out, ids]), pa.int64()),
                "w": pa.array(
                    np.concatenate([w_out, counts.astype(np.int32)]), pa.int32()
                ),
                "kind": pa.array(
                    np.concatenate([kind, np.ones(len(ids), np.int8)]), pa.int8()
                ),
                "part": pa.array(np.concatenate([part, dpart]), pa.int32()),
            }
        )

    def _doc_partial_table(doc: np.ndarray, novel: np.ndarray, seen: np.ndarray):
        return pa.table(
            {
                "doc": pa.array(doc, pa.int64()),
                "novel": pa.array(novel, pa.int64()),
                "seen": pa.array(seen, pa.int64()),
                "dp": pa.array(
                    (doc.astype(np.uint64) % pu).astype(np.int32), pa.int32()
                ),
            }
        )

    def bucket(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return _doc_partial_table(
                np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64)
            )
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        posting = kind == 0
        rsh = group.column("sh").to_numpy(zero_copy_only=False)[posting]
        rdoc, rw = doc[posting], w[posting]
        order = np.argsort(rsh, kind="stable")
        rsh, rdoc, rw = rsh[order], rdoc[order], rw[order]
        starts = _key_runs(rsh)
        # a run's Σw is the exact corpus posting size truncated at ≥2 —
        # exactly 1 iff globally novel, in which case the run is that one
        # weight-1 row and its doc takes the credit
        eff = (
            np.add.reduceat(rw, starts[:-1])
            if len(rw)
            else np.zeros(0, np.int64)
        )
        novel_rows = np.repeat(eff == 1, np.diff(starts))
        sdoc, sw = doc[~posting], w[~posting]
        udoc, inv = np.unique(
            np.concatenate([rdoc[novel_rows], sdoc]), return_inverse=True
        )
        nn = int(novel_rows.sum())
        novel = np.bincount(inv[:nn], minlength=len(udoc)).astype(np.int64)
        seen = np.bincount(
            inv[nn:], weights=sw, minlength=len(udoc)
        ).astype(np.int64)
        return _doc_partial_table(udoc, novel, seen)

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "novel_shingles": pa.array([], pa.int64()),
                "total_shingles": pa.array([], pa.int64()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        novel = group.column("novel").to_numpy(zero_copy_only=False)
        seen = group.column("seen").to_numpy(zero_copy_only=False)
        udoc, inv = np.unique(doc, return_inverse=True)
        return pa.table(
            {
                "doc_id": pa.array(udoc, pa.int64()),
                "novel_shingles": pa.array(
                    np.bincount(inv, weights=novel, minlength=len(udoc)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "total_shingles": pa.array(
                    np.bincount(inv, weights=seen, minlength=len(udoc)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    return (
        # big post batches maximize the local-duplicate fold (a shingle
        # only folds when one batch sees it twice)
        ds.map_batches(post, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=131072)
        .groupby("part")
        .map_groups(bucket, batch_format="pyarrow")
        .groupby("dp")
        .map_groups(combine, batch_format="pyarrow")
    )


def cooccurrence_counts(ds, v: int = 16, text_col: str = "text"):
    """Document-level token co-occurrence over the corpus's exact top-``v``
    vocabulary — the association-mining audit (what appears together?)
    behind PMI/NPMI tables, emitted as pure integers so the caller can
    form any association score without the engine ever touching a float:
    for every vocabulary pair that co-occurs at least once,
    (tok_a, tok_b, n_both, n_a, n_b) with tok_a < tok_b lexicographically,
    n_both = #docs containing both, n_a / n_b = #docs containing each.

    Scale shape: vocabulary selection reuses `top_ngrams`' exact
    pre-combined count pass (ties break count-desc-then-token-asc, so the
    vocabulary is deterministic under any partitioning); the counting
    pass then ships NO pair rows at all — each batch contributes one
    v×v boolean-presence outer product M'M (counts < 2^53, exact in the
    float64 matmul), flattened to ≤ v(v+1)/2 skinny partial rows and
    tree-summed.  The only corpus-sized movement is the vocabulary
    groupby that `top_ngrams` already pays."""
    from .aggregates import tree_groupby

    if not 2 <= v <= 256:
        raise ValueError(
            f"cooccurrence_counts: v must be in [2, 256] (v² partial rows "
            f"per batch), got {v}"
        )
    vocab = [
        r["ngram"] for r in top_ngrams(ds, n=1, k=v, text_col=text_col).take_all()
    ]
    nv = len(vocab)
    vocab_arr = pa.array(vocab, pa.string())

    def presence_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "i": pa.array([], pa.int32()),
                "j": pa.array([], pa.int32()),
                "n": pa.array([], pa.int64()),
            }
        )
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(pc.cast(text, pa.string()), ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        if len(flat) == 0:
            return empty
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]
        doc_lens = np.diff(offsets)
        codes = (
            pc.fill_null(pc.index_in(flat, value_set=vocab_arr), -1)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        doc_idx = np.repeat(np.arange(len(doc_lens), dtype=np.int64), doc_lens)
        hit = codes >= 0
        # row slabs bound the presence matrix at 64k×v (whole-block batches
        # with a wide vocabulary would otherwise allocate rows×v at once);
        # C accumulates across slabs, still ONE partial per block
        c = np.zeros((nv, nv), dtype=np.float64)
        d_hit, c_hit = doc_idx[hit], codes[hit]
        slab = 1 << 16
        for d0 in range(0, len(doc_lens), slab):
            d1 = min(d0 + slab, len(doc_lens))
            # d_hit is non-decreasing (tokens arrive in doc order)
            lo, hi = np.searchsorted(d_hit, (d0, d1))
            m = np.zeros((d1 - d0, nv), dtype=np.float64)
            m[d_hit[lo:hi] - d0, c_hit[lo:hi]] = 1.0
            c += m.T @ m
        c = c.astype(np.int64)
        iu, ju = np.triu_indices(nv)
        n = c[iu, ju]
        keep = n > 0
        return pa.table(
            {
                "i": pa.array(iu[keep].astype(np.int32), pa.int32()),
                "j": pa.array(ju[keep].astype(np.int32), pa.int32()),
                "n": pa.array(n[keep], pa.int64()),
            }
        )

    summed = tree_groupby(
        ds.map_batches(
            presence_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        ["i", "j"],
        [("n", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "n_both": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows or not batch.num_columns:
            return empty
        i = batch.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        j = batch.column("j").to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        marg = np.zeros(nv, dtype=np.int64)
        diag = i == j
        marg[i[diag]] = n[diag]
        off = ~diag
        if not off.any():
            return empty
        ia, jb, nb = i[off], j[off], n[off]
        ta = pa.array([vocab[x] for x in ia], pa.string())
        tb = pa.array([vocab[x] for x in jb], pa.string())
        # vocabulary order is count-ranked; the output contract (and the
        # SQL mirror) wants lexicographic pair order
        lo = pc.min_element_wise(ta, tb)
        hi = pc.max_element_wise(ta, tb)
        swap = pc.greater(ta, tb).to_numpy(zero_copy_only=False)
        na = np.where(swap, marg[jb], marg[ia])
        nbm = np.where(swap, marg[ia], marg[jb])
        return pa.table(
            {
                "tok_a": lo,
                "tok_b": hi,
                "n_both": pa.array(nb, pa.int64()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nbm, pa.int64()),
            }
        )

    # the summed table is ≤ v(v+1)/2 rows — one partition finishes it
    return summed.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def vocab_coverage(ds, p_num: int = 1, p_den: int = 2, text_col: str = "text"):
    """The minimal vocabulary prefix covering ≥ ``p_num/p_den`` of all token
    occurrences — tokens ranked by (count desc, token asc); a token is kept
    iff the exact mass BEFORE it satisfies ``p_den·prefix < p_num·total``
    (the integer form of prefix < p·total, so the boundary can never drift
    vs the SQL window mirror).  This is the tokenizer-budget question —
    "how small a vocab still covers half the corpus?" — answered exactly.

    Scale shape: per-block vocabulary-compressed count partials (shared
    ``_gram_counts`` kernel, n=1) → one keyed shuffle for exact global
    counts → a tree-combined counts-of-counts table (distinct count VALUES,
    thousands at web scale — Zipf keeps it tiny relative to the vocab) →
    Python-bigint cut math on the driver → two vectorized filters over the
    counts dataset (the full classes, plus one sort+limit over the single
    boundary class).  The corpus-sized token stream never leaves the
    shuffle; the driver holds only (count, class-size) pairs.

    Output rows: (token string, n int64) — exactly the selected prefix."""
    import ray
    from ray.data.aggregate import Sum

    from .aggregates import tree_groupby

    if p_num <= 0 or p_den <= 0 or p_num > p_den:
        raise ValueError(
            f"vocab_coverage: need 0 < p_num/p_den <= 1, got {p_num}/{p_den}"
        )

    def partial_counts(batch: pa.Table) -> pa.Table:
        grams, counts = _gram_counts(batch, 1, text_col)
        if grams is None:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        t = pa.table({"token": grams, "n": pa.array(counts, pa.int64())})
        # '' (from empty text) is not a vocabulary token on either side
        return t.filter(pc.not_equal(t.column("token"), ""))

    counts = _bucketed_ngram_sum(
        ds.map_batches(
            partial_counts,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=32768,
        ),
        key="token",
    )
    counts = counts.materialize()  # reused three times below

    def class_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        uc, ut = np.unique(n, return_counts=True)
        return pa.table(
            {"c": pa.array(uc, pa.int64()), "t": pa.array(ut, pa.int64())}
        )

    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                counts.map_batches(class_partial, batch_format="pyarrow"),
                ["c"],
                [("t", "sum")],
                max_groups=1 << 22,
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:  # zero-token corpus: zero partials reach the tree
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    classes = pa.concat_tables(tabs)
    cs = classes.column("c").to_numpy(zero_copy_only=False)
    ts = classes.column("t").to_numpy(zero_copy_only=False)
    order = np.argsort(-cs, kind="stable")
    cs, ts = cs[order], ts[order]
    total = sum(int(c) * int(t) for c, t in zip(cs, ts))
    if total == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    target = p_num * total  # compare against p_den * prefix, all bigint
    before = 0
    full_min_c = None  # smallest count value whose class is fully kept
    boundary = None  # (count value, #tokens kept from it)
    for c, t in zip(cs, ts):
        c_i, t_i = int(c), int(t)
        room = target - p_den * before
        if room <= 0:
            break
        m = min(t_i, -((-room) // (p_den * c_i)))  # ceildiv, clamped
        if m == t_i:
            full_min_c = c_i
        else:
            boundary = (c_i, m)
            break
        before += c_i * t_i
    parts = []
    if full_min_c is not None:
        fm = full_min_c
        parts.append(
            counts.map_batches(
                lambda b, _fm=fm: b.filter(pc.greater_equal(b.column("n"), _fm)),
                batch_format="pyarrow",
            )
        )
    if boundary is not None and boundary[1] > 0:
        c_b, m = boundary
        parts.append(
            counts.map_batches(
                lambda b, _c=c_b: b.filter(pc.equal(b.column("n"), _c)),
                batch_format="pyarrow",
            )
            .sort("token")
            .limit(m)
        )
    if not parts:
        return pa.table(
            {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    out = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
    return out.map_batches(
        lambda b: b.select(["token", "n"]), batch_format="pyarrow"
    )


def bigram_logloss(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_penalty_bits: int = 8,
    backoff_penalty_bits: int = 4,
    max_vocab: int = 1 << 22,
):
    """Bigram LM surprise with unigram backoff, in exact integer bits —
    the KenLM-shaped upgrade of :func:`unigram_logloss`: token t after
    context p costs

        seen bigram (p, t):   ilog2(ctx(p)) − ilog2(count(p, t))
        unseen bigram:        unigram_cost(t) + backoff_penalty_bits
        document-first token: unigram_cost(t)

    where ``ctx(p) = Σ_t count(p, t)`` (occurrences of p as a bigram
    context in the reference) and ``unigram_cost`` is exactly the
    unigram op's ``ilog2(N) − ilog2(count)`` / OOV rule.  Per document:
    (``n_tokens``, ``bits``).  Integer ilog2 keeps the score partition-
    invariant and SQL-mirrorable; a float KenLM score can never be
    value-hash gated across engines.

    Scale shape: two reference vocabulary passes (unigram + bigram counts,
    batch-vocabulary partials through the coalesce-tree under loud
    ``max_vocab`` caps); ctx counts derive from the bigram vocabulary on
    the driver (vocab-sized); the three LUTs broadcast once via
    ``ray.put`` + per-process cache.  Scoring is one streaming pass —
    dictionary-encoded probes per DISTINCT batch gram, cumsum segment
    sums per doc; the corpus never shuffles."""
    import ray

    from .aggregates import tree_groupby

    if oov_penalty_bits < 0 or backoff_penalty_bits < 0:
        raise ValueError(
            "bigram_logloss: penalty bits must be >= 0, got "
            f"oov={oov_penalty_bits} backoff={backoff_penalty_bits}"
        )

    def vocab_partial(n):
        def f(batch: pa.Table) -> pa.Table:
            grams, counts = _gram_counts(batch, n, text_col)
            if grams is None:
                return pa.table(
                    {"tok": pa.array([], pa.string()),
                     "c": pa.array([], pa.int64())}
                )
            return pa.table({"tok": grams, "c": pa.array(counts, pa.int64())})

        return f

    def collect_vocab(n):
        parts = [
            t
            for t in ray.get(
                tree_groupby(
                    ref_ds.map_batches(
                        vocab_partial(n), batch_format="pyarrow",
                        zero_copy_batch=True,
                    ),
                    ["tok"],
                    [("c", "sum")],
                    max_groups=max_vocab,
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        return pa.concat_tables(parts) if parts else None

    uni_t = collect_vocab(1)
    if uni_t is None:
        raise ValueError("bigram_logloss: reference corpus has no tokens")
    big_t = collect_vocab(2)

    uni_c = uni_t.column("c").to_numpy(zero_copy_only=False)
    n_total = int(uni_c.sum())
    il_n = int(_ilog2_exact(np.array([n_total]))[0])
    uni_lut = dict(
        zip(uni_t.column("tok").to_pylist(), (il_n - _ilog2_exact(uni_c)).tolist())
    )
    oov_bits = il_n + int(oov_penalty_bits)

    if big_t is not None and big_t.num_rows:
        grams = big_t.column("tok")
        big_c = big_t.column("c").to_numpy(zero_copy_only=False)
        # ctx(p) = Σ count(p, ·): group the (vocab-sized) bigram table by
        # its first token — driver-side, bounded by max_vocab
        first = pc.list_element(pc.split_pattern(grams, " "), 0)
        ctx_t = pa.TableGroupBy(
            pa.table({"p": first, "c": big_t.column("c")}), "p"
        ).aggregate([("c", "sum")])
        ctx_keys = ctx_t.column("p").to_pylist()
        ctx_il = _ilog2_exact(
            ctx_t.column("c_sum").to_numpy(zero_copy_only=False)
        )
        ctx_lut = dict(zip(ctx_keys, ctx_il.tolist()))
        big_il = _ilog2_exact(big_c)
        big_lut = {
            g: int(ctx_lut[g[: g.index(" ")]]) - int(b)
            for g, b in zip(grams.to_pylist(), big_il.tolist())
        }
    else:
        big_lut = {}
    model_ref = ray.put((uni_lut, big_lut, oov_bits, int(backoff_penalty_bits)))

    def score(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        uni, big, oov, backoff = cached_get(model_ref)
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.cast(text, pa.string()), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        total = len(flat)
        # unigram cost per position (the universal fallback)
        enc = flat.dictionary_encode()
        dic = enc.dictionary.to_pylist()
        per_code = np.fromiter(
            (uni.get(t, oov) for t in dic), dtype=np.int64, count=len(dic)
        )
        cost = per_code[
            enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ]
        doc_lens = np.diff(offs)
        if total > 1:
            # bigram overlay for non-first positions
            prev = flat.slice(0, total - 1)
            cur = flat.slice(1, total - 1)
            grams2 = pc.binary_join_element_wise(prev, cur, " ")
            pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(
                offs[:-1], doc_lens
            )
            non_first = pos_in_doc[1:] > 0  # mask over positions 1..total-1
            genc = grams2.dictionary_encode()
            gdic = genc.dictionary.to_pylist()
            gb = np.fromiter(
                (big.get(g, np.iinfo(np.int64).min) for g in gdic),
                dtype=np.int64,
                count=len(gdic),
            )
            gcost = gb[
                genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            ]
            seen = gcost != np.iinfo(np.int64).min
            use_big = non_first & seen
            tail = cost[1:]
            tail = np.where(use_big, gcost, tail + np.where(non_first, backoff, 0))
            cost = np.concatenate((cost[:1], tail))
        cs = np.concatenate(([0], np.cumsum(cost)))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(doc_lens, pa.int64()),
                "bits": pa.array(cs[offs[1:]] - cs[offs[:-1]], pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def pii_report(ds, patterns: dict[str, str] | None = None, text_col: str = "text"):
    """Compliance-audit pattern census: for each named RE2 pattern (emails,
    IPv4 literals, long digit runs by default), how many documents contain
    it and how many total occurrences exist — the report a PII-scrub run
    (``regex_scrub``) is sized from.  Output rows: (``pattern`` string,
    ``n_docs``, ``n_hits`` int64).  Counting only — the scrub itself stays
    in ``regex_scrub``.

    Scale shape: per batch one ``pc.count_substring_regex`` pass per
    pattern (compiled RE2 inside Arrow, no Python per row), scalar
    partials per pattern, bounded coalesce-tree; nothing shuffles.
    Patterns must be RE2-and-SQL-portable (no lookaround)."""
    import ray

    from .aggregates import tree_groupby

    if patterns is None:
        patterns = {
            "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
            "ipv4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
            "digits16": "[0-9]{16}",
        }
    if not patterns:
        raise ValueError("pii_report: need at least one pattern")
    items = sorted(patterns.items())

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        names, docs, hits = [], [], []
        for name, pat in items:
            c = pc.count_substring_regex(text, pat)
            cv = c.to_numpy(zero_copy_only=False)
            cv = np.nan_to_num(cv).astype(np.int64)
            names.append(name)
            docs.append(int((cv > 0).sum()))
            hits.append(int(cv.sum()))
        return pa.table(
            {
                "pattern": pa.array(names, pa.string()),
                "n_docs": pa.array(docs, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    out = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["pattern"],
        [("n_docs", "sum"), ("n_hits", "sum")],
        max_groups=len(items),
    )

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return pa.table(
                {
                    "pattern": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        return batch.take(
            pc.sort_indices(batch, sort_keys=[("pattern", "ascending")])
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def corpus_checksum(ds, text_col: str = "text"):
    """Order-independent corpus content checksum — the replication /
    resumable-write validator (two corpora match iff same multiset of
    content hashes): one row (``n_rows``, ``checksum``) where checksum =
    Σ uint64(content_hash) mod 2^64 reinterpreted int64.  Addition mod
    2^64 is commutative-associative, so ANY block layout, shard order or
    resume path yields the same value — the property a checksum of a
    distributed write must have.

    Scale shape: one streaming pass; each batch contributes a single
    partial row with the hash sum split into four 16-bit lanes (a lane
    total stays < 2^16·n_rows, so the int64 coalesce-tree cannot wrap
    below ~2^47 rows — guarded loudly), zero-seeded so an empty corpus
    reports (0, 0) instead of vanishing."""
    import ray.data as rd

    from ..sketches.hashing import hash64
    from .aggregates import tree_groupby

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = hash64(pc.cast(text, pa.string()).fill_null(""))
        lanes = [
            int(((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).sum(dtype=np.uint64))
            for k in range(4)
        ]
        return pa.table(
            {
                "k": pa.array(["chk"], pa.string()),
                "n": pa.array([len(h)], pa.int64()),
                "l0": pa.array([lanes[0]], pa.int64()),
                "l1": pa.array([lanes[1]], pa.int64()),
                "l2": pa.array([lanes[2]], pa.int64()),
                "l3": pa.array([lanes[3]], pa.int64()),
            }
        )

    seed = pa.table(
        {
            "k": pa.array(["chk"], pa.string()),
            "n": pa.array([0], pa.int64()),
            "l0": pa.array([0], pa.int64()),
            "l1": pa.array([0], pa.int64()),
            "l2": pa.array([0], pa.int64()),
            "l3": pa.array([0], pa.int64()),
        }
    )
    combined = tree_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(rd.from_arrow(seed)),
        ["k"],
        [("n", "sum"), ("l0", "sum"), ("l1", "sum"), ("l2", "sum"),
         ("l3", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = int(batch.column("n")[0].as_py())
        if n >= 1 << 47:
            raise ValueError(
                "corpus_checksum: row count approaches the 16-bit-lane "
                "overflow bound — widen the lane split"
            )
        total = 0
        for k in range(4):
            total += int(batch.column(f"l{k}")[0].as_py()) << (16 * k)
        total %= 1 << 64
        if total >= 1 << 63:
            total -= 1 << 64
        return pa.table(
            {
                "n_rows": pa.array([n], pa.int64()),
                "checksum": pa.array([total], pa.int64()),
            }
        )

    return combined.map_batches(finish, batch_format="pyarrow", batch_size=None)


def vocab_drift(
    ds,
    v: int = 50,
    t_num: int = 1,
    t_den: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-``v`` vocabulary frequency shift between the two doc_id-parity
    halves of a corpus — the token-level dual of `distribution_drift`
    (crawl-snapshot vocabulary audits: which high-frequency words moved?).
    Output rows: (token, ``n_a``, ``n_b``, ``drifted``) for the global
    top-``v`` tokens under the deterministic (total count desc, token asc)
    rule; drifted ⇔ ``t_den·|n_a·N_b − n_b·N_a| > t_num·N_a·N_b`` where
    N_a/N_b are the WHOLE-side token totals — the exact relative-rate
    inequality in Python bigints (products of two corpus-sized counts
    overflow int64), never a float ratio.

    Scale shape: per-batch side-split `_gram_counts` partials → one keyed
    shuffle for exact per-token (n_a, n_b) → local top-v per block + one
    final top-v over the v·n_blocks union (selection under a total order
    commutes with union); side totals tree-combine as scalars.  The token
    stream never leaves the shuffle; the driver holds v rows."""
    import ray
    import ray.data as rd

    from ..sketches.hashing import bucket_of

    if v < 1 or t_num < 0 or t_den < 1:
        raise ValueError("vocab_drift: bad v / threshold params")
    n_parts = 64

    def partial_counts(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        out = []
        for side, mask in ((0, ids % 2 == 0), (1, ids % 2 == 1)):
            sub = batch.filter(pa.array(mask))
            grams, counts = _gram_counts(sub, 1, text_col)
            if grams is None:
                continue
            t = pa.table(
                {
                    "token": grams,
                    "n_a": pa.array(counts if side == 0 else counts * 0,
                                    pa.int64()),
                    "n_b": pa.array(counts if side == 1 else counts * 0,
                                    pa.int64()),
                }
            )
            out.append(t.filter(pc.not_equal(t.column("token"), "")))
        if not out:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                }
            )
        return pa.concat_tables(out)

    # exact global counts via the coarse-bucket pattern (a plain
    # groupby(token) pays the high-cardinality sort-shuffle tax on a
    # corpus-sized vocabulary — the CLAUDE-rule measured 5x)
    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(bucket_of(batch.column("token"), n_parts), pa.int32()),
        )

    def combine(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                }
            )
        return (
            pa.TableGroupBy(g.select(["token", "n_a", "n_b"]), ["token"])
            .aggregate([("n_a", "sum"), ("n_b", "sum")])
            .rename_columns(["token", "n_a", "n_b"])
        )

    counts = (
        ds.map_batches(
            partial_counts,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(combine, batch_format="pyarrow")
        .materialize()
    )

    def local_topv(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                    "tot": pa.array([], pa.int64()),
                }
            )
        if "tot" in batch.schema.names:  # second (final) application
            t = batch
        else:
            t = batch.append_column(
                "tot", pc.add(batch.column("n_a"), batch.column("n_b"))
            )
        order = pc.sort_indices(
            t, sort_keys=[("tot", "descending"), ("token", "ascending")]
        )
        return t.take(order[:v])

    # side totals over the WHOLE vocabulary (not just top-v)
    tot_parts = counts.map_batches(
        lambda b: pa.table(
            {
                "na": pa.array(
                    [int(b.column("n_a").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "nb": pa.array(
                    [int(b.column("n_b").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all()
    na = sum(r["na"] for r in tot_parts)
    nb = sum(r["nb"] for r in tot_parts)

    top = (
        counts.map_batches(local_topv, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topv, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    tokens = [r["token"] for r in top]
    nas = [int(r["n_a"]) for r in top]
    nbs = [int(r["n_b"]) for r in top]
    drift = [
        int(t_den * abs(a * nb - b * na) > t_num * na * nb)
        for a, b in zip(nas, nbs)
    ]
    return rd.from_arrow(
        pa.table(
            {
                "token": pa.array(tokens, pa.string()),
                "n_a": pa.array(nas, pa.int64()),
                "n_b": pa.array(nbs, pa.int64()),
                "drifted": pa.array(drift, pa.int64()),
            }
        )
    )


def vocab_growth(
    ds,
    n_checkpoints: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 64,
):
    """Vocabulary growth curve (Heaps' law audit): after ingesting the
    first k documents in ``id_col`` order, how many distinct tokens has
    the corpus seen?  Reported at ``n_checkpoints`` evenly spaced doc-id
    thresholds (the max id always included) — the "is new data still
    adding new vocabulary?" collection-stopping signal.  Output rows:
    (``upto_id``, ``n_docs``, ``n_distinct`` — all int64, exact).

    Scale shape: per-batch vocabulary-compressed (token, min id) partials
    → ONE coarse token-hash bucket shuffle, per bucket a vectorized
    first-occurrence min per token; each bucket then reduces to ≤
    ``n_checkpoints`` counts via searchsorted against the broadcast
    thresholds, and the tiny per-bucket count vectors tree-sum.  Doc
    counts per threshold ride the same pass from per-batch id partials.
    The token stream never leaves its shuffle; the driver holds
    checkpoint vectors."""
    import ray
    import ray.data as rd

    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    if n_checkpoints < 1:
        raise ValueError("vocab_growth: n_checkpoints must be >= 1")

    # pass 0: id range + doc counts (skinny scalar partials)
    def id_partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(ids) == 0:
            return pa.table(
                {"k": pa.array([], pa.string()),
                 "mn": pa.array([], pa.int64()),
                 "mx": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "k": pa.array(["ids"], pa.string()),
                "mn": pa.array([int(ids.min())], pa.int64()),
                "mx": pa.array([int(ids.max())], pa.int64()),
            }
        )

    ids_only = ds.select_columns([id_col])
    tabs = [
        t
        for t in ray.get(
            tree_groupby(
                ids_only.map_batches(
                    id_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["k"],
                [("mn", "min"), ("mx", "max")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        return rd.from_arrow(
            pa.table(
                {
                    "upto_id": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                }
            )
        )
    head = pa.concat_tables(tabs)
    lo = int(pc.min(head.column("mn")).as_py())
    hi = int(pc.max(head.column("mx")).as_py())
    # evenly spaced inclusive thresholds in PURE integer arithmetic
    # (lo + k·span // (n−1)) — float linspace would need bit-matched
    # rounding in any SQL mirror; k = n−1 lands exactly on hi
    if n_checkpoints == 1:
        ck = np.array([hi], np.int64)
    else:
        span = hi - lo
        ck = np.unique(
            lo
            + (np.arange(n_checkpoints, dtype=np.int64) * span)
            // (n_checkpoints - 1)
        )
    ck_ref = ray.put(ck)

    def tok_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "mid": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        ids = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        toks = pc.split_pattern(
            pc.fill_null(pc.cast(batch.column(text_col), pa.string()), ""),
            " ",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_rep = np.repeat(ids, counts)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # per-batch compress: min doc id per distinct token
        order = np.lexsort((doc_rep, codes))
        cO, dO = codes[order], doc_rep[order]
        first = np.concatenate(([True], cO[1:] != cO[:-1]))
        t = pa.table(
            {
                "token": enc.dictionary.take(
                    pa.array(cO[first], pa.int64())
                ),
                "mid": pa.array(dO[first], pa.int64()),
            }
        )
        t = t.filter(pc.not_equal(t.column("token"), ""))
        return t.append_column(
            "bucket",
            pa.array(bucket_of(t.column("token"), num_partitions), pa.int32()),
        )

    def bucket_counts(g: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        cks = cached_get(ck_ref)
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "ci": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        tok = g.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        codes = tok.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        mid = g.column("mid").to_numpy(zero_copy_only=False)
        order = np.lexsort((mid, codes))
        cO, mO = codes[order], mid[order]
        first = np.concatenate(([True], cO[1:] != cO[:-1]))
        firsts = mO[first]  # global first-occurrence id per token
        # distinct tokens with first id <= threshold, per checkpoint
        counts = np.searchsorted(np.sort(firsts), cks, side="right")
        return pa.table(
            {
                "ci": pa.array(
                    np.arange(len(cks), dtype=np.int64), pa.int64()
                ),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    vt = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    tok_partial, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("bucket")
                .map_groups(bucket_counts, batch_format="pyarrow"),
                ["ci"],
                [("n", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    vocab_n = np.zeros(len(ck), np.int64)
    if vt:
        vtab = pa.concat_tables(vt)
        vocab_n[vtab.column("ci").to_numpy(zero_copy_only=False)] = (
            vtab.column("n").to_numpy(zero_copy_only=False)
        )

    # doc counts per threshold: one more skinny pass of per-batch
    # id-histogram partials against the same thresholds
    def doc_partial(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        cks = cached_get(ck_ref)
        ids = np.sort(
            pc.cast(batch.column(id_col), pa.int64()).to_numpy(
                zero_copy_only=False
            )
        )
        counts = np.searchsorted(ids, cks, side="right")
        return pa.table(
            {
                "ci": pa.array(np.arange(len(cks), dtype=np.int64), pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    dt = [
        t
        for t in ray.get(
            tree_groupby(
                ids_only.map_batches(
                    doc_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["ci"],
                [("n", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    docs_n = np.zeros(len(ck), np.int64)
    if dt:
        dtab = pa.concat_tables(dt)
        docs_n[dtab.column("ci").to_numpy(zero_copy_only=False)] = (
            dtab.column("n").to_numpy(zero_copy_only=False)
        )
    return rd.from_arrow(
        pa.table(
            {
                "upto_id": pa.array(ck, pa.int64()),
                "n_docs": pa.array(docs_n, pa.int64()),
                "n_distinct": pa.array(vocab_n, pa.int64()),
            }
        )
    )


def _ilog2_rangesum(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Σ_{r=a..b} floor(log2 r) and Σ floor(log2 r)² over
    inclusive 1-based rank ranges: decompose by bit-length bands
    [2^k, 2^{k+1}−1] — exact integers, O(64) passes."""
    s1 = np.zeros(len(a), dtype=np.int64)
    s2 = np.zeros(len(a), dtype=np.int64)
    for k in range(63):
        lo = 1 << k
        hi = (1 << (k + 1)) - 1
        n = np.maximum(
            0, np.minimum(b, hi) - np.maximum(a, lo) + 1
        ).astype(np.int64)
        s1 += n * k
        s2 += n * k * k
    return s1, s2


def zipf_audit(ds, text_col: str = "text"):
    """Zipf rank-frequency audit: the EXACT integer OLS moments of
    (x, y) = (⌊log2 rank⌋, ⌊log2 count⌋) over the corpus vocabulary —
    natural text follows count ∝ rank^(−s) with s ≈ 1, so the fitted
    slope (n·Sxy − Sx·Sy)/(n·Sxx − Sx²) ≈ −s; template spam and
    synthetic filler bend it.  The log2-bucket multiset is tie-order
    invariant (positions 1..V are fixed whatever order equal counts
    take), so the moments hash bit-exactly.

    Output: ONE row (n_tokens, total_occurrences, sx, sy, sxx, syy,
    sxy), all int64.

    Scale shape: `vocab_coverage`'s budget — per-block compressed token
    count partials (`_gram_counts`), one keyed shuffle for exact global
    counts, a tree-combined counts-of-counts table (tiny under Zipf),
    then closed-form bit-length band sums per count class
    (`_ilog2_rangesum`) — the vocabulary itself never reaches the
    driver, only (count, class-size) pairs."""
    import ray
    from ray.data.aggregate import Sum

    from .aggregates import tree_groupby

    def partial_counts(batch: pa.Table) -> pa.Table:
        grams, counts = _gram_counts(batch, 1, text_col)
        if grams is None:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        t = pa.table({"token": grams, "n": pa.array(counts, pa.int64())})
        return t.filter(pc.not_equal(t.column("token"), ""))

    counts = _bucketed_ngram_sum(
        ds.map_batches(
            partial_counts, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=32768,
        ),
        key="token",
    )

    def class_partial(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        uc, ut = np.unique(n, return_counts=True)
        return pa.table(
            {"c": pa.array(uc, pa.int64()), "t": pa.array(ut, pa.int64())}
        )

    classes_ds = tree_groupby(
        counts.map_batches(class_partial, batch_format="pyarrow"),
        ["c"],
        [("t", "sum")],
        max_groups=1 << 22,
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = ("n_tokens", "total_occurrences", "sx", "sy", "sxx", "syy",
                "sxy")
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({k: pa.array([], pa.int64()) for k in cols})
        cs = batch.column("c").to_numpy(zero_copy_only=False)
        ts = batch.column("t").to_numpy(zero_copy_only=False)
        o = np.argsort(-cs, kind="stable")
        cs, ts = cs[o], ts[o]
        ends = np.cumsum(ts)
        starts = ends - ts + 1  # 1-based inclusive rank ranges per class
        # exact ilog2 via frexp (counts and ranks are far below 2^53)
        y = (np.frexp(cs.astype(np.float64))[1] - 1).astype(np.int64)
        s1, s2 = _ilog2_rangesum(starts, ends)
        V = int(ends[-1])
        vals = {
            "n_tokens": V,
            "total_occurrences": int(np.sum(cs * ts)),
            "sx": int(s1.sum()),
            "sy": int(np.sum(y * ts)),
            "sxx": int(s2.sum()),
            "syy": int(np.sum(y * y * ts)),
            "sxy": int(np.sum(y * s1)),
        }
        return pa.table({k: pa.array([v], pa.int64()) for k, v in vals.items()})

    return classes_ds.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


_SCRIPT_CLASSES = (
    ("latin", r"\p{Latin}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("greek", r"\p{Greek}"),
    ("han", r"\p{Han}"),
    ("arabic", r"\p{Arabic}"),
)


def script_mix(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-document Unicode-SCRIPT character profile — the writing-system
    counterpart of stopword-marker language ID: counts of Latin / Cyrillic
    / Greek / Han / Arabic characters (RE2 ``\\p{Script}`` classes, so a
    DuckDB mirror running the same RE2 counts identically) plus the
    ``dominant`` script elected by first-argmax over that fixed class
    order.  Mixed-script pages (Latin shell + CJK body, transliteration
    spam, mojibake) separate cleanly from single-script ones.

    Embarrassingly parallel: five vectorized regex count kernels per
    batch, integer outputs, no shuffle, no per-row Python.
    """
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(pc.cast(text, pa.string()), "")
    cols: dict = {id_col: ids}
    counts = []
    for name, pat in _SCRIPT_CLASSES:
        c = (
            pc.count_substring_regex(text, pattern=pat)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        counts.append(c)
        cols[f"n_{name}"] = pa.array(c, pa.int64())
    dom = np.argmax(np.stack(counts), axis=0)
    names = np.array([n for n, _ in _SCRIPT_CLASSES])
    cols["dominant"] = pa.array(names[dom], pa.string())
    return pa.table(cols)
