"""Corpus-curation operators for training-data pipelines: deterministic
hash sampling, per-domain caps, token-repetition statistics (Gopher-style
repetition signals), and a composite keep/drop curation filter.

These extend the engine beyond the reference's inventory the same way the
dedup family does (the reference's nearest relative is its per-event
profiling / flow filtering, SURVEY §2.6-2.7): every operator is a
map_batches kernel or a bounded two-phase groupby, never a full-corpus
shuffle of raw text.

Scale notes (10^12 docs):

* ``hash_sample`` is embarrassingly parallel — one vectorized hash pass per
  batch, no shuffle, deterministic under any partitioning (membership
  depends only on the id, not on block layout), so a resumed or re-sharded
  run selects the identical sample.
* ``domain_cap`` pre-prunes inside each batch to ≤ cap rows per key before
  the groupby, so the shuffle carries at most cap × (#distinct keys per
  block) rows — bounded by cap × #domains overall, never by corpus size.
* ``token_repetition`` is one dictionary-encode + one np.unique per batch;
  no Python-per-row loop, no shuffle.
* ``curation_filter`` composes the per-batch kernels; the decision columns
  are emitted per document so downstream stages can filter, audit, or
  invert the decision without recomputation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64_ints, splitmix64

__all__ = [
    "hash_sample",
    "importance_resample",
    "stratified_sample",
    "split_assign",
    "leakage_safe_split",
    "sample_threshold",
    "domain_cap",
    "token_repetition",
    "curation_filter",
    "gopher_rules",
    "quantile_length_filter",
    "RegexScrub",
    "regex_scrub",
    "mixture_sample",
    "repeat_corpus",
    "normalize_urls",
    "per_group_sample",
    "grouped_order_statistic",
]


def sample_threshold(fraction: float) -> int:
    """Exact uint64 threshold for a Bernoulli(fraction) hash sample.

    Computed once in integer arithmetic so the engine and any SQL mirror
    compare against the *same* integer (float rounding happens here, in one
    place, not per row)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return min(int(fraction * 2.0**64), 2**64 - 1)


def hash_sample(ds, fraction: float, seed: int = 0, id_col: str = "doc_id"):
    """Deterministic Bernoulli sample: keep rows where
    ``hash64_ints(id, seed) < fraction * 2^64``.

    Membership is a pure function of (id, seed) — stable across reruns,
    re-partitioning and cluster size, which is what makes held-out splits
    and ablation subsets reproducible at 100 TB.  One vectorized splitmix64
    pass per batch; no shuffle, no driver state."""
    thr = np.uint64(sample_threshold(fraction))
    seed = int(seed)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds,
    fractions: dict,
    default: float = 0.0,
    seed: int = 0,
    id_col: str = "doc_id",
    key_col: str = "lang",
):
    """Per-stratum deterministic Bernoulli sample: keep each row with the
    fraction configured for its ``key_col`` value (``default`` for strata
    not listed, including null keys) — the language/domain re-balancing
    step every training-data mix applies (upsample rare languages, clamp
    dominant ones).

    Same determinism contract as ``hash_sample``: membership is a pure
    function of (id, seed, stratum fraction) — independent of block layout,
    cluster size and resume point.  One vectorized hash pass + one
    dictionary-encode per batch; no shuffle, no driver state."""
    thr_map = {k: np.uint64(sample_threshold(f)) for k, f in fractions.items()}
    default_thr = np.uint64(sample_threshold(default))
    seed = int(seed)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        dic = enc.dictionary.to_pylist()
        per_code = np.array(
            [thr_map.get(v, default_thr) for v in dic] + [default_thr],
            dtype=np.uint64,
        )
        idx = enc.indices
        if idx.null_count:  # null stratum → default fraction
            idx = idx.fill_null(len(dic))
        codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(h < per_code[codes]))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _split_bounds(weights: dict) -> tuple[np.ndarray, pa.Array]:
    """Consecutive [lo, hi) uint64 hash-range edges proportional to
    ``weights`` (insertion order; normalized).  The last range is clamped to
    2^64 so rounding can never leave an unassigned tail.  Shared by
    :func:`split_assign` and :func:`leakage_safe_split` so both partition
    the hash space identically."""
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative with a positive sum: {weights}")
    total = float(sum(weights.values()))
    names = list(weights)
    edges, acc = [], 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        edges.append(sample_threshold(min(acc, 1.0)))
    return np.array(edges, dtype=np.uint64), pa.array(names, pa.string())


def split_assign(
    ds,
    weights: dict,
    seed: int = 0,
    id_col: str = "doc_id",
    out_col: str = "split",
):
    """Deterministic train/val/test assignment: append ``out_col`` naming the
    split each row falls into, by partitioning the 64-bit id-hash space into
    consecutive ranges proportional to ``weights`` (insertion order; values
    need not sum to 1 — they are normalized).

    The assignment is a pure function of (id, seed) — stable across reruns,
    re-partitioning and cluster size, so a 100 TB corpus can be split once
    and every downstream job (or a resumed one) sees the identical
    partition.  One vectorized hash + one searchsorted per batch; no
    shuffle."""
    bounds, labels = _split_bounds(weights)
    seed = int(seed)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        code = np.searchsorted(bounds, h, side="right").astype(np.int32)
        return batch.append_column(
            out_col, pc.take(labels, pa.array(code, pa.int32()))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def leakage_safe_split(
    ds,
    weights: dict,
    seed: int = 0,
    text_col: str = "text",
    out_col: str = "split",
):
    """Train/val/test assignment keyed on CONTENT, not id: the split is a
    pure function of (content hash, seed), so byte-identical documents land
    in the same split no matter which shard, snapshot, or crawl copy they
    arrived in — the split-level guarantee exact dedup gives within a split
    (Dodge et al. 2021 documented benchmark rows leaking across C4 splits
    precisely because assignment was row-keyed).

    Versus :func:`split_assign` (id-keyed): that one is right when ids are
    already dedup-canonical; this one is right BEFORE dedup, or when the
    same content recurs under many ids across crawls.  Same consecutive
    uint64 hash ranges (shared :func:`_split_bounds`), so the two operators
    produce identically-calibrated split fractions.

    Scale shape: one vectorized content hash (FNV-1a → splitmix64, the
    engine-wide ``hash64``) + one seeded ``hash64_ints`` mix + one
    searchsorted per batch; embarrassingly parallel, no shuffle, resumable
    under any re-partitioning."""
    from ..sketches.hashing import hash64

    bounds, labels = _split_bounds(weights)
    seed = int(seed)

    def assign(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ch = hash64(pc.cast(text, pa.string()).fill_null(""))
        h = hash64_ints(ch, seed=seed)
        code = np.searchsorted(bounds, h, side="right").astype(np.int32)
        return batch.append_column(
            out_col, pc.take(labels, pa.array(code, pa.int32()))
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def _rank_within_key(key_codes: np.ndarray, order: np.ndarray) -> np.ndarray:
    """0-based rank of each row within its key group, ordered by ``order``
    (ties broken by original position via stable sort).  Fully vectorized:
    one lexsort + one run-length subtraction."""
    n = len(key_codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    perm = np.lexsort((order, key_codes))
    sk = key_codes[perm]
    run_start = np.zeros(n, dtype=np.int64)
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.not_equal(sk[1:], sk[:-1], out=new_run[1:])
    run_start[new_run] = np.flatnonzero(new_run)
    np.maximum.accumulate(run_start, out=run_start)
    rank_sorted = np.arange(n, dtype=np.int64) - run_start
    rank = np.empty(n, dtype=np.int64)
    rank[perm] = rank_sorted
    return rank


def domain_cap(ds, cap: int, key_col: str = "source", order_col: str = "doc_id"):
    """Keep at most ``cap`` rows per key, deterministically the ones with the
    smallest ``order_col`` values (ties impossible for unique ids; otherwise
    first-seen wins) — the per-domain quota every crawl-curation pipeline
    applies so one mega-site cannot dominate the corpus.

    Two phases: (1) a local map_batches prune keeps ≤ cap rows per key per
    batch, so phase (2)'s groupby shuffles at most cap × #domains rows —
    the raw corpus never moves."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")

    def local_prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        codes = keys.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        order = batch.column(order_col).to_numpy(zero_copy_only=False)
        rank = _rank_within_key(codes.astype(np.int64), order)
        return batch.filter(pa.array(rank < cap))

    def global_head(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
        return group.take(idx[:cap])

    return (
        ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .map_groups(global_head, batch_format="pyarrow")
    )


def token_repetition(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document token-repetition signals (the Gopher/C4 repetition
    family, computed exactly):

    * ``n_tokens``          — space-separated token count (0 for empty text)
    * ``n_distinct_tokens`` — exact distinct token count
    * ``dup_token_ratio``   — (n_tokens − n_distinct) / n_tokens
    * ``top_token_frac``    — occurrences of the most frequent token / n_tokens

    Fully vectorized: one dictionary-encode of the flat token array + one
    np.unique over (doc, token-code) pairs + segmented reductions.  Exact
    string identity (no hashing) keeps SQL-oracle parity collision-free."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(pc.cast(text, pa.string()), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_docs = len(toks)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = offsets - offsets[0]
    doc_lens = np.diff(offsets)
    flat = toks.flatten()

    n_distinct = np.zeros(n_docs, dtype=np.int64)
    top_count = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), doc_lens)
        # (doc, code) packed into one int64: codes are batch-local (< 2^31)
        pair = (doc_idx << np.int64(32)) | codes.astype(np.int64)
        uniq, counts = np.unique(pair, return_counts=True)
        doc_of = (uniq >> np.int64(32)).astype(np.int64)
        n_distinct = np.bincount(doc_of, minlength=n_docs)
        starts = np.flatnonzero(
            np.concatenate(([True], doc_of[1:] != doc_of[:-1]))
        )
        if len(starts):
            seg_max = np.maximum.reduceat(counts, starts)
            top_count[doc_of[starts]] = seg_max

    # empty text splits to [''] — define it as zero tokens (matches
    # textstats.token_stats) and zero ratios
    empty = np.asarray(
        pc.equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    )
    n_tokens = np.where(empty, 0, doc_lens)
    n_distinct = np.where(empty, 0, n_distinct)
    top_count = np.where(empty, 0, top_count)
    denom = np.maximum(n_tokens, 1).astype(np.float64)
    dup_ratio = (n_tokens - n_distinct).astype(np.float64) / denom
    top_frac = top_count.astype(np.float64) / denom

    batch = batch.append_column("n_tokens", pa.array(n_tokens, type=pa.int64()))
    batch = batch.append_column(
        "n_distinct_tokens", pa.array(n_distinct, type=pa.int64())
    )
    batch = batch.append_column("dup_token_ratio", pa.array(dup_ratio, type=pa.float64()))
    batch = batch.append_column("top_token_frac", pa.array(top_frac, type=pa.float64()))
    return batch


def _token_counts(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """(id, n_tokens) per row: #spaces + 1 on space-normalized text, 0 for
    empty — the same formula as textstats.token_stats (and its SQL mirror
    ``strlen(text) - strlen(replace(text, ' ', '')) + 1``)."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_chars = pc.cast(pc.utf8_length(text), "int64")
    n_tokens = pc.if_else(
        pc.equal(n_chars, 0),
        pa.scalar(0, type=pa.int64()),
        pc.add(pc.cast(pc.count_substring(text, " "), "int64"), 1),
    )
    return pa.table({id_col: batch.column(id_col), "n_tokens": n_tokens})


def quantile_length_filter(
    ds,
    lo_q: float = 0.1,
    hi_q: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    kll_k: int = 1024,
):
    """Sketch-driven adaptive length filter: keep documents whose token
    count lies between the corpus's lo_q and hi_q quantiles — the thresholds
    are LEARNED from the data in a first streaming pass, not hardcoded.

    Two passes, both scale-clean:

    1. One `build_sketches` pass folds every document's token count into a
       mergeable KLL sketch (KB-sized partials, coalesce-tree merge — no
       keyed shuffle).  Below the sketch's saturation point (n ≤ its buffer
       capacity) the returned quantile is the EXACT order statistic
       ``sorted[first rank ≥ q·n]`` — which is what the SQL oracle gates at
       test scale; above it, the thresholds carry KLL's published rank-error
       bound (the right trade at 10^12 docs, where a ±ε-rank threshold is
       indistinguishable in effect).
    2. The two scalar thresholds ride the closure into a plain map_batches
       filter — no broadcast table, no join, no second aggregation.
    """
    from ..core.udaf import SketchSpec, build_sketches

    counts = ds.map_batches(
        lambda b: _token_counts(b, text_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    spec = SketchSpec(
        name="len", kind="kll", column="n_tokens",
        params={"k": kll_k}, value_kind="float",
    )
    sk = build_sketches(counts, [spec])["len"]
    lo_v = sk.quantile(lo_q)
    hi_v = sk.quantile(hi_q)

    def filt(batch: pa.Table) -> pa.Table:
        t = _token_counts(batch, text_col, id_col)
        n = t.column("n_tokens")
        keep = pc.and_(
            pc.greater_equal(n, pa.scalar(lo_v)), pc.less_equal(n, pa.scalar(hi_v))
        )
        return t.filter(keep)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


class RegexScrub:
    """Actor-pool scrub stage — the PII-redaction shape: an ordered list of
    (pattern, replacement) rules applied sequentially to a text column,
    emitting the scrubbed text plus a per-document redaction count.

    Patterns are RE2 (Arrow's regex engine — the same engine DuckDB uses,
    which is what makes the SQL oracle bit-exact); they are validated once
    per actor in __init__, and each rule is ONE vectorized C++ pass per
    batch (count, then replace).  Counts are non-overlapping matches
    against the text as it stands when the rule runs (sequential
    semantics), so rule order is part of the contract."""

    def __init__(
        self,
        rules: list[tuple[str, str]],
        text_col: str = "text",
        out_col: str = "scrubbed",
    ):
        if not rules:
            raise ValueError("RegexScrub needs at least one (pattern, replacement)")
        probe = pa.array([""], type=pa.string())
        for pat, repl in rules:
            pc.count_substring_regex(probe, pat)  # raises on invalid RE2
            # also probe the rewrite: an invalid replacement (e.g. a \9
            # backref) would otherwise surface per batch inside the actor
            # pool, after work has been done
            pc.replace_substring_regex(probe, pattern=pat, replacement=repl)
        self.rules = list(rules)
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        counts = np.zeros(len(text), dtype=np.int64)
        for pat, repl in self.rules:
            counts += pc.cast(
                pc.count_substring_regex(text, pat), pa.int64()
            ).to_numpy(zero_copy_only=False)
            text = pc.replace_substring_regex(text, pattern=pat, replacement=repl)
        batch = batch.append_column(self.out_col, text)
        batch = batch.append_column(
            "n_redactions", pa.array(counts, type=pa.int64())
        )
        return batch


def regex_scrub(ds, rules: list[tuple[str, str]], text_col: str = "text"):
    """Apply ``RegexScrub`` as an actor-pool map_batches stage."""
    return ds.map_batches(
        RegexScrub,
        fn_constructor_kwargs={"rules": rules, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def curation_filter(
    ds,
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 1_000_000,
    max_dup_ratio: float = 0.6,
    max_top_frac: float = 0.2,
):
    """Composite keep/drop curation decision per document — the standard
    web-corpus gauntlet (length bounds + repetition caps) as ONE vectorized
    pass.  Emits boolean reason columns (``len_ok``, ``rep_ok``) plus the
    conjunction ``keep`` so audits can see *why* a document was dropped;
    filtering is the caller's one-liner ``.filter(pc.field("keep"))``."""

    def decide(batch: pa.Table) -> pa.Table:
        batch = token_repetition(batch, text_col)
        n_tokens = batch.column("n_tokens")
        len_ok = pc.and_(
            pc.greater_equal(n_tokens, min_tokens),
            pc.less_equal(n_tokens, max_tokens),
        )
        rep_ok = pc.and_(
            pc.less_equal(batch.column("dup_token_ratio"), max_dup_ratio),
            pc.less_equal(batch.column("top_token_frac"), max_top_frac),
        )
        batch = batch.append_column("len_ok", len_ok)
        batch = batch.append_column("rep_ok", rep_ok)
        batch = batch.append_column("keep", pc.and_(len_ok, rep_ok))
        return batch

    return ds.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)


def _key_codes(keys, names: list) -> tuple[np.ndarray, int]:
    """Dictionary-encode a key column against a FIXED vocabulary ``names``:
    returns (codes int64 with len(names) meaning 'not listed', sentinel).
    One vectorized index_in per batch — no Python per row."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    idx = pc.index_in(keys, value_set=pa.array(names, pa.string()))
    sentinel = len(names)
    if idx.null_count:  # unlisted or null key → sentinel
        idx = idx.fill_null(sentinel)
    return idx.to_numpy(zero_copy_only=False).astype(np.int64), sentinel


def mixture_sample(
    ds,
    weights: dict,
    seed: int = 0,
    id_col: str = "doc_id",
    key_col: str = "source",
    refine_bits: int = 12,
    collect_cap: int = 2_000_000,
    max_levels: int = 5,
):
    """Exact source re-weighting to a target mixture — downsample each
    source so the output composition matches integer ratio ``weights``
    (e.g. ``{"web": 7, "books": 2, "code": 1}`` → a 7:2:1 mix).

    Semantics (all-integer, so the result is bit-exact and SQL-mirrorable):
    with ``n_s`` rows per source and weight ``w_s``, the mix scale is
    ``m = min_s(n_s // w_s)`` and EXACTLY ``k_s = w_s * m`` rows are kept
    per source — the ``k_s`` rows with the smallest ``splitmix64(id, seed)``
    hash.  The id-hash is a bijection, so ranks are unique and membership is
    a pure function of (corpus ids, seed): stable across reruns,
    re-partitioning and cluster size.  Sources not named in ``weights`` are
    dropped; a named source missing from the corpus makes ``m = 0`` (an
    impossible mix → empty result) rather than silently re-normalizing.

    Scale shape (10^12 docs): the exact per-source ``k_s``-th smallest hash
    is found by iterative histogram refinement over a skinny materialized
    (key, hash) projection — the same prefix-histogram construction as
    ``epoch_shuffle``, recursing ``refine_bits`` bits per level until the
    boundary stripe holds ≤ ``collect_cap`` rows, then one driver-side
    ``np.partition`` of that stripe.  Each level is one map_batches count
    pass + a KB-sized tree_groupby; nothing corpus-sized ever reaches the
    driver and the raw text never moves (the final filter re-hashes ids in
    place).  At 10^12 rows, two levels of 12 bits bound the collected
    stripe to ~60k rows per source.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    for k, w in weights.items():
        if not isinstance(w, (int, np.integer)) or w <= 0:
            raise ValueError(f"weights must be positive integers, got {k!r}: {w!r}")
    names = list(weights)
    w_arr = np.array([weights[k] for k in names], dtype=np.int64)

    def k_of_n(n_per: np.ndarray) -> np.ndarray:
        m = int((n_per // w_arr).min()) if len(names) else 0
        return w_arr * m

    return _exact_group_hash_select(
        ds, names, k_of_n, seed, id_col, key_col,
        refine_bits, collect_cap, max_levels,
    )


def _grouped_kth_smallest(
    skinny,
    k_per: "np.ndarray",
    n_per: "np.ndarray",
    refine_bits: int,
    collect_cap: int,
    max_levels: int,
) -> "np.ndarray":
    """EXACT ``k_per[i]``-th smallest ``h`` per code ``i`` over a
    materialized skinny (``code`` int32, ``h`` uint64) dataset, by the
    iterative prefix-histogram refinement documented on ``mixture_sample``.
    Returns uint64 thresholds: groups with ``k >= n`` get the max uint64
    (keep-all), groups with ``k <= 0`` get 0 and are the caller's problem
    (mask with ``k_per > 0``).  Shared by the hash-selection samplers and
    ``grouped_order_statistic`` — the histogram walk never sees WHAT the
    uint64 means (id hash vs order-mapped value)."""
    import ray

    from .aggregates import tree_groupby

    max_levels = min(max_levels, 64 // refine_bits)
    n_names = len(n_per)
    # Per-source exact k-th smallest hash by prefix-histogram refinement.
    # State per source: hash-prefix of the active stripe, remaining 1-based
    # rank within it, and the stripe's row count.
    thr = np.zeros(n_names, dtype=np.uint64)  # keep h <= thr
    keep_any = k_per > 0
    full = k_per >= n_per  # keep-all sources need no refinement
    thr[full] = np.uint64(0xFFFFFFFFFFFFFFFF)
    active = [i for i in range(n_names) if keep_any[i] and not full[i]]
    prefix = {i: 0 for i in active}  # high-bit prefix value at current level
    rank = {i: int(k_per[i]) for i in active}
    cnt = {i: int(n_per[i]) for i in active}
    level = 0
    n_buckets = 1 << refine_bits

    while active and level < max_levels and sum(cnt[i] for i in active) > collect_cap:
        shift = np.uint64(64 - (level + 1) * refine_bits)
        pshift = np.uint64(64 - level * refine_bits)
        pref_arr = np.zeros(n_names, dtype=np.uint64)
        act_mask = np.zeros(n_names, dtype=bool)
        for i in active:
            pref_arr[i] = prefix[i]
            act_mask[i] = True
        amask_ref = ray.put((act_mask, pref_arr))

        def hist_partial(batch: pa.Table, _s=shift, _ps=pshift) -> pa.Table:
            am, pf = ray.get(amask_ref)
            code = batch.column("code").to_numpy(zero_copy_only=False)
            h = batch.column("h").to_numpy(zero_copy_only=False)
            sel = am[code]
            if _ps < 64:  # level > 0: row must sit in its source's stripe
                sel &= (h >> _ps) == pf[code]
            code, h = code[sel], h[sel]
            b = ((h >> _s) & np.uint64(n_buckets - 1)).astype(np.int64)
            key = code.astype(np.int64) * n_buckets + b
            uk, uc = np.unique(key, return_counts=True)
            return pa.table(
                {"k": pa.array(uk, pa.int64()), "n": pa.array(uc, pa.int64())}
            )

        hist = pa.concat_tables(
            ray.get(
                tree_groupby(
                    skinny.map_batches(hist_partial, batch_format="pyarrow"),
                    ["k"],
                    [("n", "sum")],
                ).to_arrow_refs()
            )
        )
        hk = hist.column("k").to_numpy(zero_copy_only=False)
        hn = hist.column("n").to_numpy(zero_copy_only=False)
        for i in list(active):
            sel = (hk // n_buckets) == i
            bk, bn = hk[sel] % n_buckets, hn[sel]
            order = np.argsort(bk)
            bk, bn = bk[order], bn[order]
            cum = np.cumsum(bn)
            j = int(np.searchsorted(cum, rank[i]))  # first bucket reaching rank
            rank[i] -= int(cum[j - 1]) if j else 0
            cnt[i] = int(bn[j])
            prefix[i] = (prefix[i] << refine_bits) | int(bk[j])
        level += 1

    if active:  # collect the boundary stripes and partition exactly
        shift = np.uint64(64 - level * refine_bits)
        pref_arr = np.zeros(n_names, dtype=np.uint64)
        act_mask = np.zeros(n_names, dtype=bool)
        for i in active:
            pref_arr[i] = prefix[i]
            act_mask[i] = True
        amask_ref = ray.put((act_mask, pref_arr))

        def stripe(batch: pa.Table, _s=shift) -> pa.Table:
            am, pf = ray.get(amask_ref)
            code = batch.column("code").to_numpy(zero_copy_only=False)
            h = batch.column("h").to_numpy(zero_copy_only=False)
            sel = am[code]
            if _s < 64:
                sel &= (h >> _s) == pf[code]
            return pa.table(
                {
                    "code": pa.array(code[sel], pa.int32()),
                    "h": pa.array(h[sel], pa.uint64()),
                }
            )

        st = pa.concat_tables(
            ray.get(
                skinny.map_batches(stripe, batch_format="pyarrow").to_arrow_refs()
            )
        )
        sc = st.column("code").to_numpy(zero_copy_only=False)
        sh = st.column("h").to_numpy(zero_copy_only=False)
        for i in active:
            hs = sh[sc == i]
            thr[i] = np.partition(hs, rank[i] - 1)[rank[i] - 1]

    return thr


def _exact_group_hash_select(
    ds,
    names: list,
    k_of_n,
    seed: int,
    id_col: str,
    key_col: str,
    refine_bits: int,
    collect_cap: int,
    max_levels: int,
):
    """Shared exact-selection core (mixture_sample / per_group_sample): for
    each listed key ``s`` keep EXACTLY ``k_s = k_of_n(counts)[s]`` rows —
    the ones with the smallest ``splitmix64(id, seed)`` hashes — via the
    iterative prefix-histogram refinement documented on mixture_sample.
    Unlisted / null keys are dropped; membership is a pure function of
    (corpus ids, seed)."""
    if not 1 <= refine_bits <= 32:
        raise ValueError(f"refine_bits must be in [1, 32], got {refine_bits}")
    # past 64 consumed bits the stripe cannot shrink further (duplicate ids
    # share a hash) — clamp instead of shifting by a negative amount
    max_levels = min(max_levels, 64 // refine_bits)
    import ray

    from .aggregates import tree_groupby

    seed = int(seed)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        codes, sentinel = _key_codes(batch.column(key_col), names)
        keep = codes != sentinel
        return pa.table(
            {
                "code": pa.array(codes[keep], pa.int32()),
                "h": pa.array(h[keep], pa.uint64()),
            }
        )

    skinny = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select(["code"]), ["code"]).aggregate(
            [([], "count_all")]
        )
        return t.rename_columns(["code", "n"])

    counts = pa.concat_tables(
        ray.get(
            tree_groupby(
                skinny.map_batches(count_partial, batch_format="pyarrow"),
                ["code"],
                [("n", "sum")],
            ).to_arrow_refs()
        )
    )
    n_per = np.zeros(len(names), dtype=np.int64)
    if counts.num_rows:
        n_per[counts.column("code").to_numpy(zero_copy_only=False)] = (
            counts.column("n").to_numpy(zero_copy_only=False)
        )
    k_per = np.minimum(np.asarray(k_of_n(n_per), dtype=np.int64), n_per)

    thr = _grouped_kth_smallest(
        skinny, k_per, n_per, refine_bits, collect_cap, max_levels
    )
    keep_any = k_per > 0
    thr_ref = ray.put((thr, keep_any))

    def final_filter(batch: pa.Table) -> pa.Table:
        t, ka = ray.get(thr_ref)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
        codes, sentinel = _key_codes(batch.column(key_col), names)
        listed = codes != sentinel
        codes[~listed] = 0  # dummy index; masked out below
        keep = listed & ka[codes] & (h <= t[codes])
        return batch.filter(pa.array(keep))

    return ds.map_batches(final_filter, batch_format="pyarrow", zero_copy_batch=True)


def repeat_corpus(
    ds,
    repeats: dict,
    key_col: str = "lang",
    default: int = 1,
    out_col: str = "copy_id",
):
    """Integer per-source epoch upsampling: emit each row ``k`` times with a
    ``copy_id`` column 0..k-1, where ``k = repeats.get(row[key_col],
    default)`` — the Dolma/OLMo-style "N epochs of source X" mix primitive
    (k = 0 removes a source entirely).

    Pure map_batches explode (np.repeat + one arange), no shuffle, no
    driver state; deterministic under any partitioning.  Downstream
    training preps (``epoch_shuffle``/``pack_sequences``) can treat
    (id, copy_id) as the effective document key."""
    for k, v in repeats.items():
        if not isinstance(v, (int, np.integer)) or v < 0:
            raise ValueError(f"repeats must be non-negative integers, got {k!r}: {v!r}")
    if not isinstance(default, (int, np.integer)) or default < 0:
        raise ValueError(f"default must be a non-negative integer, got {default!r}")
    names = list(repeats)
    reps = np.array([repeats[k] for k in names] + [default], dtype=np.int64)

    def explode(batch: pa.Table) -> pa.Table:
        codes, _ = _key_codes(batch.column(key_col), names)
        k = reps[codes]
        n = batch.num_rows
        row = np.repeat(np.arange(n, dtype=np.int64), k)
        cstart = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(k, out=cstart[1:])
        copy = np.arange(int(cstart[-1]), dtype=np.int64) - np.repeat(cstart[:-1], k)
        out = batch.take(pa.array(row, pa.int64()))
        return out.append_column(out_col, pa.array(copy, pa.int64()))

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


_URL_RE_PARTS = (
    # scheme://host[:port]/path[?query][#fragment] — RE2-safe, no backrefs;
    # named groups (Arrow's extract_regex requires them; RE2 numbers them
    # 1..5 for the DuckDB mirror's regexp_extract)
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]*)"
    r"(?P<path>[^?#]*)(?P<query>\?[^#]*)?(?P<frag>#.*)?$"
)

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid", "ref_src")


def normalize_urls(ds, url_col: str = "url", out_col: str = "url_norm"):
    """Canonical URL form for dedup/grouping: lowercase scheme+host, strip
    the fragment, strip default ports (:80 http / :443 https), drop
    known tracking query parameters (utm_*, fbclid, gclid, …), drop a
    trailing '?' left by an emptied query, and collapse a trailing '/' on
    an otherwise-empty path.  Appends ``out_col``; rows that do not parse
    as absolute URLs pass through unchanged (normalization must never
    lose a row).

    Pure map_batches over Arrow string kernels (RE2 extract + vectorized
    rebuilds) — no shuffle, no Python per row; the canonical key is what
    exact_dedup / domain_cap / cross_dedup should group on when the corpus
    carries crawl-style URLs."""

    def norm(batch: pa.Table) -> pa.Table:
        url = batch.column(url_col)
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        url = pc.cast(url, pa.string())
        s = pc.fill_null(url, "")
        ex = pc.extract_regex(s, _URL_RE_PARTS)
        ok = pc.is_valid(ex).to_numpy(zero_copy_only=False)
        scheme = pc.utf8_lower(pc.coalesce(pc.struct_field(ex, 0), ""))
        host = pc.utf8_lower(pc.coalesce(pc.struct_field(ex, 1), ""))
        path = pc.coalesce(pc.struct_field(ex, 2), "")
        query = pc.coalesce(pc.struct_field(ex, 3), "")
        # default ports (regex strips run row-wise; the if_else gates them)
        host = pc.if_else(
            pc.and_(pc.equal(scheme, "http"), pc.ends_with(host, pattern=":80")),
            pc.replace_substring_regex(host, pattern=":80$", replacement=""),
            host,
        )
        host = pc.if_else(
            pc.and_(pc.equal(scheme, "https"), pc.ends_with(host, pattern=":443")),
            pc.replace_substring_regex(host, pattern=":443$", replacement=""),
            host,
        )
        # query: drop tracking params (split on '&' after removing the
        # leading '?', filter, re-join)
        qbody = pc.replace_substring_regex(query, pattern=r"^\?", replacement="")
        parts = pc.split_pattern(qbody, "&")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        keep = np.ones(len(flat), dtype=bool)
        for pref in _TRACKING_PREFIXES:
            keep &= ~pc.starts_with(flat, pattern=pref).to_numpy(
                zero_copy_only=False
            )
        keep &= pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        ck = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(keep, out=ck[1:])
        kept_n = ck[offs[1:]] - ck[offs[:-1]]
        new_off = np.zeros(len(parts) + 1, dtype=np.int64)
        np.cumsum(kept_n, out=new_off[1:])
        la = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(pa.array(keep))
        )
        qjoin = pc.binary_join(la, "&")
        new_query = pc.if_else(
            pc.greater(pc.utf8_length(qjoin), 0),
            pc.binary_join_element_wise(
                pa.array(["?"] * len(parts)), qjoin, ""
            ),
            "",
        )
        # path: '' and '/' both canonicalize to '' (host root)
        path = pc.if_else(pc.equal(path, "/"), "", path)
        rebuilt = pc.binary_join_element_wise(
            scheme, pa.array(["://"] * batch.num_rows), host, path, new_query, ""
        )
        out = pc.if_else(pa.array(ok), rebuilt, s)
        return batch.append_column(out_col, out)

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


def per_group_sample(
    ds,
    k: int,
    groups: list,
    seed: int = 0,
    id_col: str = "doc_id",
    key_col: str = "lang",
    refine_bits: int = 12,
    collect_cap: int = 2_000_000,
    max_levels: int = 5,
):
    """EXACTLY ``min(k, n_s)`` rows per listed group — the balanced-subset
    primitive (per-language eval sets, per-domain audits): for each group
    keep the ``k`` rows with the smallest ``splitmix64(id, seed)`` hashes.
    Unlike the Bernoulli ``stratified_sample`` (expected counts), the
    result size is deterministic; like it, membership is a pure function of
    (ids, seed) — stable across reruns, re-partitioning and cluster size.

    Groups not listed are dropped.  Same scale shape as
    ``mixture_sample``: the per-group k-th-smallest hash comes from the
    shared prefix-histogram refinement core — nothing corpus-sized reaches
    the driver, and the raw text never moves."""
    if not isinstance(k, (int, np.integer)) or k < 1:
        raise ValueError(f"k must be a positive integer, got {k!r}")
    if not groups:
        raise ValueError("groups must name at least one key")
    names = list(groups)

    def k_of_n(n_per: np.ndarray) -> np.ndarray:
        return np.full(len(names), int(k), dtype=np.int64)

    return _exact_group_hash_select(
        ds, names, k_of_n, seed, id_col, key_col,
        refine_bits, collect_cap, max_levels,
    )


# ----------------------------------------------------- text canonicalization
def normalize_text(
    ds,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    collapse_whitespace: bool = True,
):
    """Unicode + whitespace canonicalization — the text-side companion of
    ``normalize_urls`` and the step that should run BEFORE any exact/near
    dedup so that byte-different but visually-identical documents ("e"+
    U+0301 vs precomposed U+00E9, tab runs vs single spaces) hash to the
    same content key.

    * ``form``: Unicode normalization form (NFC default — canonicalizes
      combining sequences without NFKC's lossy compatibility folds).
      Arrow's own ``utf8_normalize`` is NOT used: in this pyarrow build it
      decomposes under every form, including NFC/NFKC (observed: NFC of
      U+00E9 returns e+U+0301), so composition goes through a two-tier
      path instead — a vectorized ``string_is_ascii`` mask skips the
      overwhelmingly-ASCII majority of web text untouched, and only the
      non-ASCII minority is normalized with ``unicodedata.normalize``
      (CPython's C implementation; its quickcheck returns already-NFC
      strings without copying).  DuckDB's ``nfc_normalize`` (utf8proc)
      agrees with unicodedata on canonical composition; both track the
      Unicode canonical data, so the oracle mirror is exact for NFC.
    * ``collapse_whitespace``: every ASCII-whitespace run (RE2 ``\\s+``)
      becomes one space, then single leading/trailing spaces are trimmed
      (``utf8_trim`` on " " exactly — NOT unicode trim — so the DuckDB
      ``trim(x, ' ')`` mirror stays bit-identical on inputs whose edges
      carry non-ASCII whitespace).

    map_batches with no shuffle; the only per-row work is one C call per
    NON-ASCII row (a cost proportional to the non-ASCII minority, not the
    corpus).  Null texts stay null.  Appends ``out_col``; the input column
    is untouched (the pinned-extractor invariant means we never rewrite
    ``text`` in place — see ops/extract.py).
    """
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        s = batch.column(text_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        is_ascii = pc.string_is_ascii(s)
        need = pc.and_kleene(pc.invert(is_ascii), pc.is_valid(s))
        idx = np.flatnonzero(need.to_numpy(zero_copy_only=False))
        out = s
        if len(idx):
            fixed = [
                unicodedata.normalize(form, v)
                for v in pc.take(s, pa.array(idx, pa.int64())).to_pylist()
            ]
            scattered = [None] * len(s)
            for i, v in zip(idx, fixed):
                scattered[i] = v
            out = pc.if_else(
                pc.fill_null(need, False), pa.array(scattered, type=s.type), s
            )
        if collapse_whitespace:
            out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
            out = pc.utf8_trim(out, characters=" ")
        return batch.append_column(out_col, out)

    return ds.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------ exact grouped percentiles
_ORD_SIGN = np.uint64(1) << np.uint64(63)


def _ord_encode(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 code for int/uint/float values:
    ``a < b  <=>  encode(a) < encode(b)`` (unsigned compare).  Integers
    flip the sign bit; floats use the IEEE-754 total-order map (negative
    values bit-complemented, non-negatives get the sign bit set), under
    which -0.0 orders just below +0.0 and the inverse map reproduces the
    exact input bits.  NaNs must be filtered by the caller."""
    if v.dtype.kind == "u":
        return v.astype(np.uint64)
    if v.dtype.kind == "i":
        return v.astype(np.int64).view(np.uint64) ^ _ORD_SIGN
    if v.dtype.kind == "f":
        u = v.astype(np.float64).view(np.uint64)
        return np.where((u & _ORD_SIGN) != 0, ~u, u | _ORD_SIGN)
    raise TypeError(f"unsupported value dtype {v.dtype} (need int/uint/float)")


def _ord_decode(u: np.ndarray, kind: str) -> np.ndarray:
    """Inverse of ``_ord_encode`` (kind ∈ {'u','i','f'})."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    if kind == "u":
        return u
    if kind == "i":
        return (u ^ _ORD_SIGN).view(np.int64)
    if kind == "f":
        return np.where((u & _ORD_SIGN) != 0, u ^ _ORD_SIGN, ~u).view(np.float64)
    raise TypeError(f"unsupported kind {kind!r}")


def grouped_order_statistic(
    ds,
    key_col: str,
    value_col: str,
    qs: list = ((1, 2),),
    out_cols: list | None = None,
    refine_bits: int = 16,
    collect_cap: int = 2_000_000,
    max_levels: int = 4,
) -> pa.Table:
    """EXACT per-group discrete quantiles WITHOUT a sort shuffle.

    For each distinct ``key_col`` value with ``n`` valid rows and each
    rational quantile ``q = num/den`` in ``qs``, returns the
    ``ceil(q*n)``-th smallest ``value_col`` element — the type-1 discrete
    quantile, always an actual element of the group (never interpolated),
    so the result is bit-identical to any exact engine's k-th order
    statistic (SQL mirror: ``row_number() OVER (PARTITION BY key ORDER BY
    val) = (n*num + den - 1) // den``).

    How it scales: values map to order-preserving uint64 codes
    (``_ord_encode``) — stored sign-bit-biased as int64 so Arrow's signed
    min/max/shuffle agree with encode order — one skinny (code, h)
    projection is materialized, and each quantile reuses the exact
    samplers' iterative prefix-histogram refinement
    (``_grouped_kth_smallest``): per level ONE vectorized histogram pass
    over 16-byte rows, the driver holding only #groups × 2^refine_bits
    counters.  A grouped exact median over 10^12 rows is ~``max_levels``
    cheap passes — no global ``sort``, no per-group materialization.
    Group cardinality must be bounded (one counter row per group on the
    driver), the same contract as ``tree_groupby``.

    Null keys/values (and float NaNs) are dropped; groups with no valid
    rows are absent.  Output: one row per group, sorted by key, columns
    ``[key_col] + out_cols`` (default names ``q{num}_{den}``), value
    column in the input's exact dtype.

    This generalizes the reference's streaming percentile reporting
    (/root/reference/processing/event_profiler.go keeps per-tag latency
    tallies) — exact, grouped, and distributed.
    """
    import ray

    from .aggregates import tree_groupby

    qs = [(int(n), int(d)) for n, d in qs]
    for num, den in qs:
        if not 0 < num <= den:
            raise ValueError(f"quantile must satisfy 0 < num <= den, got {num}/{den}")
    if out_cols is None:
        out_cols = [f"q{num}_{den}" for num, den in qs]
    if len(out_cols) != len(qs):
        raise ValueError("out_cols must match qs length")

    schema = ds.schema()
    vtype = schema.types[schema.names.index(value_col)]
    if not isinstance(vtype, pa.DataType):
        # pandas-block datasets surface numpy / pandas-extension dtypes (or
        # None for extension arrays) — probe one Arrow row for the real type
        try:
            vtype = pa.from_numpy_dtype(getattr(vtype, "numpy_dtype", vtype))
        except (TypeError, ValueError):
            probe = ds.limit(1).take_batch(1, batch_format="pyarrow")
            vtype = probe.schema.field(value_col).type
    if pa.types.is_floating(vtype):
        kind = "f"
    elif pa.types.is_unsigned_integer(vtype):
        kind = "u"
    elif pa.types.is_integer(vtype):
        kind = "i"
    else:
        raise TypeError(f"value column {value_col!r} must be numeric, got {vtype}")

    canon = {"f": pa.float64(), "i": pa.int64(), "u": pa.uint64()}[kind]

    def project(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        # canonical cast so the encode map always matches `kind`, whatever
        # width (or pandas-extension detour) the batch arrived with
        vals = pc.cast(batch.column(value_col), canon)
        valid = pc.and_kleene(pc.is_valid(keys), pc.is_valid(vals))
        if kind == "f":
            valid = pc.and_kleene(
                valid, pc.invert(pc.is_nan(pc.fill_null(vals, 0.0)))
            )
        valid = pc.fill_null(valid, False)
        keys = pc.filter(keys, valid)
        v = pc.filter(vals, valid)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        h = _ord_encode(v.to_numpy(zero_copy_only=False))
        # sign-bit bias: signed(h ^ SIGN) preserves unsigned encode order,
        # so the int64 column Ray can move still min/maxes correctly
        hs = (h ^ _ORD_SIGN).view(np.int64)
        return pa.table({"key": keys, "h": pa.array(hs, pa.int64())})

    skinny1 = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch, ["key"]).aggregate(
            [([], "count_all"), ("h", "max")]
        )
        return t.rename_columns(["key", "n", "mx"])

    counts = pa.concat_tables(
        ray.get(
            tree_groupby(
                skinny1.map_batches(count_partial, batch_format="pyarrow"),
                ["key"],
                [("n", "sum"), ("mx", "max")],
            ).to_arrow_refs()
        )
    )
    if not counts.num_rows:
        ktype = schema.types[schema.names.index(key_col)]
        empty = {key_col: pa.array([], ktype)}
        for c in out_cols:
            empty[c] = pa.array([], vtype)
        return pa.table(empty)
    counts = counts.sort_by("key")
    names_arr = counts.column("key").combine_chunks()
    n_per = counts.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    max_u = (
        counts.column("mx").to_numpy(zero_copy_only=False).view(np.uint64)
        ^ _ORD_SIGN
    )

    def to_codes(batch: pa.Table, _na=names_arr) -> pa.Table:
        hs = batch.column("h").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "code": pc.index_in(batch.column("key"), value_set=_na).cast(
                    pa.int32()
                ),
                "h": pa.array(hs.view(np.uint64) ^ _ORD_SIGN, pa.uint64()),
            }
        )

    skinny = skinny1.map_batches(to_codes, batch_format="pyarrow").materialize()

    out = {key_col: names_arr}
    for (num, den), col in zip(qs, out_cols):
        k_per = (n_per * num + den - 1) // den
        k_per = np.minimum(np.maximum(k_per, 1), n_per)
        need_walk = k_per < n_per
        thr = _grouped_kth_smallest(
            skinny,
            np.where(need_walk, k_per, 0),  # k<=0 groups skipped by the walk
            n_per,
            refine_bits,
            collect_cap,
            max_levels,
        )
        thr = thr.copy()
        thr[~need_walk] = max_u[~need_walk]  # k == n: the group max, exactly
        vals = _ord_decode(thr, kind)
        out[col] = pa.array(vals).cast(vtype)
    return pa.table(out)


def importance_resample(
    ds,
    weight_col: str,
    scale: int,
    seed: int = 0,
    id_col: str = "doc_id",
):
    """Score-proportional deterministic sampling — the data-selection step
    (DSIR / classifier-gated corpus mixing) where each document is kept
    with probability ``clamp(weight, 0, scale) / scale`` instead of a flat
    rate: high-quality (or target-domain-similar) docs survive, low-scored
    docs thin out smoothly rather than at a hard threshold.

    Membership is a pure function of (id, seed, weight): keep iff
    ``(hash64(id, seed) >> 32) * scale < clamp(weight) * 2^32`` — 32-bit
    probability resolution in exact int64 arithmetic (no float rounding, so
    the SQL mirror agrees bit-for-bit and membership is stable across
    block layout, cluster size and resume point, the `hash_sample`
    contract).  Weights must be an integer column (float weights are not
    portable across engines); ``weight >= scale`` always keeps,
    ``weight <= 0`` always drops.  One vectorized hash pass per batch; no
    shuffle, no driver state."""
    scale = int(scale)
    if not 1 <= scale < (1 << 31):
        raise ValueError(
            f"importance_resample: scale must be in [1, 2^31), got {scale}"
        )
    seed = int(seed)
    szero = np.int64(0)
    sfull = np.int64(scale)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.null_count:
            raise ValueError(
                f"importance_resample: {id_col} contains nulls — a null id "
                "has no hash (NaN→uint64 is platform-defined); filter first"
            )
        w = batch.column(weight_col)
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        if not pa.types.is_integer(w.type):
            raise ValueError(
                f"importance_resample: {weight_col} must be an integer "
                f"column, got {w.type} — float keep-probabilities are not "
                "portable; quantize the score first"
            )
        if w.null_count:
            raise ValueError(
                f"importance_resample: {weight_col} contains nulls — a "
                "null weight has no defined keep probability; fill first"
            )
        h32 = (
            hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
            >> np.uint64(32)
        ).astype(np.int64)
        wv = np.clip(
            w.to_numpy(zero_copy_only=False).astype(np.int64), szero, sfull
        )
        # both sides < 2^63: h32 <= 2^32-1, scale < 2^31, wv <= scale
        return batch.filter(pa.array(h32 * sfull < (wv << np.int64(32))))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def priority_sample(
    ds,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
):
    """Weight-proportional k-sample via PRIORITY SAMPLING (Duffield, Lund
    & Thorup, JACM 2007) in deterministic integer form: each row gets
    priority ``q = (w << 32) // (1 + (hash64_ints(id, seed) & 0xFFFFFFFF))``
    — the integer analog of q = w/u with u uniform in (0,1] derived from
    the id hash — and the global top-k by (q desc, id asc) is the sample.
    Heavier rows win proportionally more often, membership depends only
    on (id, seed) — never on block layout — so a resumed or re-sharded
    run selects the identical sample, and DLT's estimator (weight w if
    w > τ else τ, τ = the (k+1)-th priority) applies downstream.

    Weights must be positive int64 (cents discipline) below 2^31 — the
    shifted product must stay in int64; both bounds raise loudly.

    Output rows: (id_col, weight, priority), pure int64.

    Scale shape: one vectorized hash + divide per batch, per-batch local
    top-k (`select_k_unstable`), then a tiny global sort+limit over ≤
    k × #blocks candidate rows.  No shuffle of the corpus."""
    from ..sketches.hashing import hash64_ints

    if k <= 0:
        raise ValueError(f"priority_sample: k must be positive, got {k}")

    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        if not np.issubdtype(w.dtype, np.integer):
            raise TypeError(
                f"priority_sample: {weight_col} must be integer-typed "
                "(cents discipline)"
            )
        w = w.astype(np.int64)
        if len(w) and (w.min() <= 0 or w.max() >= (1 << 31)):
            raise ValueError(
                f"priority_sample: weights must be in [1, 2^31) — got "
                f"[{w.min()}, {w.max()}]"
            )
        u = (hash64_ints(ids, seed=seed) & np.uint64(0xFFFFFFFF)).astype(
            np.int64
        ) + np.int64(1)
        q = (w << np.int64(32)) // u
        t = pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "weight": pa.array(w, pa.int64()),
                "priority": pa.array(q, pa.int64()),
            }
        )
        idx = pc.select_k_unstable(
            t,
            k=min(k, t.num_rows),
            sort_keys=[("priority", "descending"), (id_col, "ascending")],
        )
        return t.take(idx)

    return (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["priority", id_col], descending=[True, False])
        .limit(k)
    )


def gopher_rules(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    mwl_lo: int = 3,
    mwl_hi: int = 10,
    sym_num: int = 1,
    sym_den: int = 10,
    bullet_num: int = 9,
    bullet_den: int = 10,
    ell_num: int = 3,
    ell_den: int = 10,
    alpha_num: int = 4,
    alpha_den: int = 5,
    stopwords: tuple = ("the", "be", "to", "of", "and", "that", "have", "with"),
    min_stop_hits: int = 2,
    keep_cols: tuple = ("lang",),
):
    """Gopher document-quality rules (Rae et al. 2021, Table A1) as ONE
    vectorized pass — the published rule battery web-scale curation
    pipelines run before training:

    bit 0  word count outside [min_words, max_words]
    bit 1  mean word length outside [mwl_lo, mwl_hi]
    bit 2  symbol-to-word ratio ('#' + '...' occurrences) > sym_num/sym_den
    bit 3  bullet-line ratio ('-'/'•'-led lines) > bullet_num/bullet_den
    bit 4  ellipsis-ended-line ratio > ell_num/ell_den
    bit 5  alpha-word ratio (words containing a letter) < alpha_num/alpha_den
    bit 6  fewer than ``min_stop_hits`` DISTINCT ``stopwords`` present

    Output rows: (id, *keep_cols, n_words, rule_mask, kept) — ``rule_mask``
    is the int64 OR of violated bits, ``kept`` = 1 iff mask == 0.  Every
    ratio test is an integer cross-multiply, so the SQL mirror agrees
    bit-for-bit (no float ever touches a decision).

    Scale shape: embarrassingly parallel — one split + flat-buffer
    reduceat cascade per batch (tokens and lines never leave the task),
    no shuffle; the per-doc decision columns stream out so downstream
    stages can filter, audit, or invert without recomputation (same
    posture as ``curation_filter``)."""
    from .textstats import _flat_tokens

    stopwords = tuple(stopwords)

    def decide(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out_cols = [id_col, *keep_cols]
        if n == 0:
            base = {c: batch.column(c) for c in out_cols}
            base["n_words"] = pa.array([], pa.int64())
            base["rule_mask"] = pa.array([], pa.int64())
            base["kept"] = pa.array([], pa.int64())
            return pa.table(base)
        flat, off = _flat_tokens(batch, text_col)
        starts = off[:-1]
        n_words = np.diff(off).astype(np.int64)
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        word_chars = np.add.reduceat(tok_lens, starts).astype(np.int64)
        alpha = (
            pc.match_substring_regex(flat, "[a-zA-Z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        alpha_words = np.add.reduceat(alpha, starts).astype(np.int64)
        hits = np.zeros(n, dtype=np.int64)
        for s in stopwords:
            eq = pc.equal(flat, s).to_numpy(zero_copy_only=False).astype(np.int64)
            hits += np.add.reduceat(eq, starts) > 0
        # line structure (same fill-null-as-empty text the tokenizer saw)
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.fill_null(pc.cast(text, pa.string()), "")
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        loff = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        loff = loff - loff[0]
        lflat = lines.flatten()
        n_lines = np.diff(loff).astype(np.int64)
        lstarts = loff[:-1]
        bullet = pc.or_(
            pc.starts_with(lflat, "-"), pc.starts_with(lflat, "•")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        bullet_lines = np.add.reduceat(bullet, lstarts).astype(np.int64)
        ell = (
            pc.ends_with(lflat, "...")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        ell_lines = np.add.reduceat(ell, lstarts).astype(np.int64)
        n_sym = (
            pc.count_substring(text, "#").to_numpy(zero_copy_only=False)
            + pc.count_substring(text, "...").to_numpy(zero_copy_only=False)
        ).astype(np.int64)

        mask = np.zeros(n, dtype=np.int64)
        mask |= ((n_words < min_words) | (n_words > max_words)) * 1
        mask |= (
            (word_chars < mwl_lo * n_words) | (word_chars > mwl_hi * n_words)
        ) * 2
        mask |= (sym_den * n_sym > sym_num * n_words) * 4
        mask |= (bullet_den * bullet_lines > bullet_num * n_lines) * 8
        mask |= (ell_den * ell_lines > ell_num * n_lines) * 16
        mask |= (alpha_den * alpha_words < alpha_num * n_words) * 32
        mask |= (hits < min_stop_hits) * 64

        base = {c: batch.column(c) for c in out_cols}
        base["n_words"] = pa.array(n_words, pa.int64())
        base["rule_mask"] = pa.array(mask, pa.int64())
        base["kept"] = pa.array((mask == 0).astype(np.int64), pa.int64())
        return pa.table(base)

    return ds.map_batches(decide, batch_format="pyarrow", zero_copy_batch=True)


def rule_violation_samples(
    ds,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 7,
    **gopher_kwargs,
):
    """Audit samples for the :func:`gopher_rules` battery: for every rule
    bit that fired anywhere in the corpus, the ``k`` SMALLEST document ids
    violating that rule — the deterministic "show me examples of what rule
    N drops" card a curation reviewer asks for before shipping a filter
    config.

    Output rows: (``rule_bit`` int64 0..6, ``id_col``, ``rn`` int64 1-based
    rank within the bit).  Bits that never fire emit no rows.

    Scale shape (10^12 docs): the mask pass is the gopher_rules one-pass
    kernel (no shuffle); the explode emits only VIOLATING (bit, id) pairs,
    then :func:`~fever_ray.ops.relational.group_top_k` prunes each batch to
    <= k ids per bit before its bounded shuffle — the exchange carries at
    most 7k rows per batch regardless of corpus size, and a rule that fires
    on every document costs the same as one that fires on none.
    """
    from .relational import group_top_k

    scored = gopher_rules(ds, id_col=id_col, text_col=text_col,
                          keep_cols=(), **gopher_kwargs)

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        idn = ids.to_numpy(zero_copy_only=False)
        mask = t.column("rule_mask").to_numpy(zero_copy_only=False)
        bits_out, ids_out = [], []
        for b in range(n_bits):
            idx = np.flatnonzero((mask >> b) & 1)
            if len(idx):
                bits_out.append(np.full(len(idx), b, dtype=np.int64))
                ids_out.append(idn[idx])
        if not bits_out:
            return pa.table({
                "rule_bit": pa.array([], pa.int64()),
                id_col: pa.array([], ids.type),
                "ord_id": pa.array([], pa.int64()),
            })
        allb = np.concatenate(bits_out)
        alli = np.concatenate(ids_out)
        return pa.table({
            "rule_bit": pa.array(allb, pa.int64()),
            id_col: pa.array(alli),
            "ord_id": pa.array(alli.astype(np.int64), pa.int64()),
        })

    exploded = scored.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = group_top_k(
        exploded, "rule_bit", "ord_id", k=k, id_col=id_col, descending=False
    )
    return ranked.map_batches(
        lambda t: t.select(["rule_bit", id_col, "rn"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
