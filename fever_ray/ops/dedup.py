"""Deduplication family over document/page tables — the core training-data
pipeline operators:

* exact_dedup        — content-hash partition + per-group min-id keeper
* minhash_lsh        — shingle → MinHash → LSH band buckets → verified
                       Jaccard pairs → connected components (min-label
                       propagation via groupby rounds)
* simhash_dedup      — 64-bit SimHash + banded buckets → Hamming-verified
* ngram_jaccard      — exact n-gram Jaccard verification kernel
* embedding_dups     — cosine-similarity near-dup pairs over an embedding
                       column (brute force per LSH bucket)

Scale notes (10^12 docs): every family shuffles only (key, small-payload)
rows — content hashes, signatures, band buckets — never raw text.  The
reference's only dedup is exact side-sets inside one process
(/root/reference/processing/dns_aggregator.go:145-168); these operators are
its web-scale generalization.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64, hash64_ints, splitmix64
from ..sketches.minhash import (
    band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash,
    hamming_distance,
)

logger = logging.getLogger(__name__)


def _auto_parts(ds, floor: int = 64, per_file: int = 2) -> int:
    """Coarse-partition count for bucket processing, scaled with input size.

    A fixed count means one map_groups partition holds 1/N of ALL band rows
    regardless of corpus size — a single-task memory ceiling.  Scaling with
    the input file count keeps per-partition rows roughly constant (each
    parquet shard contributes ~rows/shard × bands band rows spread over
    ``per_file`` partitions per shard)."""
    try:
        files = ds.input_files()
        if files:
            return max(floor, per_file * len(files))
    except Exception:
        pass
    return floor


def _coalesce_for_shuffle(ds, max_blocks: int = 256):
    """Ray's sort shuffle degrades SUPER-linearly in INPUT block count —
    measured (round 5, identity shuffle of 100M skinny rows into 64
    partitions): 200 input blocks 2.6 s, 1024 blocks 144.8 s (56×), and
    coalescing 1024 → 128 first costs one narrow 1.3 s pass after which
    the shuffle reads 2.2 s.  Call on SKINNY partial tables right before
    a bucket groupby; materializes to read the block count (the blocks
    are about to be pinned by the shuffle anyway)."""
    ds = ds.materialize()
    if ds.num_blocks() > max_blocks:
        ds = ds.repartition(max_blocks)
    return ds


def _arrow_schema(ds) -> pa.Schema:
    """``ds.schema().base_schema`` as a real ``pa.Schema``.

    Parquet-backed datasets hand back Arrow schemas directly; datasets born
    from ``from_pandas`` / ``from_items`` carry a ``PandasBlockSchema``
    (names + numpy dtypes, no ``.field``) — map it through
    ``pa.from_numpy_dtype`` so callers can use one code path (the
    ``_pair_reduce_bucketed`` fallback, shared)."""
    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return sch

    def conv(t):
        if t is None or getattr(t, "kind", None) == "O":
            return pa.string()  # pandas object column: strings in practice
        return pa.from_numpy_dtype(t)

    return pa.schema([(n, conv(t)) for n, t in zip(sch.names, sch.types)])


def _chain_pairs(ids_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Linear fallback for an oversized bucket: adjacent-id chain pairs.
    Preserves connectivity (every member still reaches the bucket's min id
    through the verified-edge graph) while emitting O(k) instead of O(k²)
    pairs."""
    return ids_sorted[:-1], ids_sorted[1:]


def _key_runs(*keys: np.ndarray) -> np.ndarray:
    """Run boundaries of consecutive equal key tuples in presorted arrays:
    returns ``starts`` with one extra terminal entry, so buckets are
    ``zip(starts[:-1], starts[1:])``.  Shared by the minhash / simhash /
    embedding bucket-verification paths so their run detection cannot
    drift."""
    n = len(keys[0])
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for arr in keys:
        change |= np.diff(arr) != 0
    return np.concatenate(([0], np.flatnonzero(change) + 1, [n])).astype(np.int64)


# ------------------------------------------------------------------ exact
def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    h = hash64(text).astype(np.int64)
    return batch.append_column("content_hash", pa.array(h, type=pa.int64()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                n_parts: int | None = None):
    """Keep the min-id row per distinct content. Returns (content keeper id,
    n_copies) plus the text hash.  Shuffle key = 64-bit content hash, so the
    shuffle moves (hash, id) pairs, not text.

    Reduce shape: content_hash is effectively UNIQUE per row (dup fraction
    aside), so ``groupby(content_hash).aggregate`` is the documented
    high-cardinality-key tax — measured 39.8 s at 10M pages/32 cpus where
    the whole minhash near-dedup took 24 s.  The coarse hash-bucket
    groupby + one vectorized sort/reduceat per bucket (the
    `_bucketed_ngram_sum` rule) replaces it: same (content_hash, keep_id,
    n_copies) rows bit-exactly, ~n_parts bounded-size partitions."""
    nb = n_parts or _auto_parts(ds, floor=64)
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch, ["content_hash"]).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        t = t.rename_columns(["content_hash", "keep_id", "n_copies"])
        h = t.column("content_hash").to_numpy(zero_copy_only=False)
        pb = (
            splitmix64(h.view(np.uint64)) % np.uint64(nb)
        ).astype(np.int32)
        return t.append_column("pb", pa.array(pb, pa.int32()))

    def combine(g: pa.Table) -> pa.Table:
        if not g.num_rows or not g.num_columns:
            return pa.table(
                {
                    "content_hash": pa.array([], pa.int64()),
                    "keep_id": pa.array([], pa.int64()),
                    "n_copies": pa.array([], pa.int64()),
                }
            )
        h = g.column("content_hash").to_numpy(zero_copy_only=False)
        k = g.column("keep_id").to_numpy(zero_copy_only=False)
        n = g.column("n_copies").to_numpy(zero_copy_only=False)
        o = np.argsort(h, kind="stable")
        h, k, n = h[o], k[o], n[o]
        first = np.concatenate(([0], np.flatnonzero(h[1:] != h[:-1]) + 1))
        return pa.table(
            {
                "content_hash": pa.array(h[first], pa.int64()),
                "keep_id": pa.array(np.minimum.reduceat(k, first), pa.int64()),
                "n_copies": pa.array(
                    np.add.reduceat(n, first).astype(np.int64), pa.int64()
                ),
            }
        )

    # batch_size bundles the skinny partial rows before the bucket shuffle
    # (the block-tax rule: shuffle cost scales with input_blocks × parts);
    # _coalesce_for_shuffle guards the 100M-scale block-count cliff (1024
    # partial blocks made the 64-partition shuffle 146 s; coalesced, 3.5 s)
    partials = _coalesce_for_shuffle(
        hashed.map_batches(partial, batch_format="pyarrow", batch_size=32768)
    )
    return partials.groupby("pb").map_groups(combine, batch_format="pyarrow")


# ------------------------------------------------------------------ minhash
def _band_fold(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """(n_docs, num_perm) signatures → (n_docs, bands) band hashes via the
    splitmix row fold — THE band-key definition; the stored-signature path
    must produce bit-equal keys to the inline path, so both call this."""
    from ..sketches.hashing import splitmix64

    n_docs = len(sigs)
    groups = sigs[:, : bands * rows].reshape(n_docs, bands, rows)
    with np.errstate(over="ignore"):
        acc = np.zeros((n_docs, bands), dtype=np.uint64)
        for r in range(rows):
            acc = splitmix64(acc ^ groups[:, :, r] ^ np.uint64(r + 1))
    return acc


class MinHashSignatures:
    """Actor stage: per-doc shingle → MinHash signature + LSH band rows.

    Emits exploded (band, band_hash, doc_id) rows ready for the bucket
    groupby.  num_perm/bands/rows and the shingle width are pinned
    parameters of the dedup job."""

    def __init__(self, n_shingle: int = 3, num_perm: int = 64, bands: int = 16, seed: int = 1):
        assert num_perm % bands == 0
        self.n = n_shingle
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.seed = seed

    def signature(self, text: str) -> np.ndarray:
        from ..sketches.minhash import batch_minhash_signatures

        return batch_minhash_signatures(
            [text], n=self.n, num_perm=self.num_perm, seed=self.seed
        )[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches.minhash import batch_minhash_signatures

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = batch_minhash_signatures(
            batch.column("text"), n=self.n, num_perm=self.num_perm, seed=self.seed
        )  # (n_docs, num_perm), fully vectorized
        # docs too short to shingle share the empty (all-max) signature —
        # dropping them prevents a quadratic all-pairs bucket of short docs
        has_sig = sigs[:, 0] != np.iinfo(np.uint64).max
        ids = ids[has_sig]
        sigs = sigs[has_sig]
        n_docs = len(ids)
        # band hashes for the whole batch: fold each band's rows (vectorized
        # across docs; loop only over rows-per-band, typically 4)
        acc = _band_fold(sigs, self.bands, self.rows)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs), type=pa.int32()
                ),
                "band_hash": pa.array(
                    acc.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
            }
        )


def minhash_candidate_pairs(
    ds, n_shingle=3, num_perm=64, bands=16,
    n_parts: int | None = None, max_bucket: int = 8192,
    cross_only: bool = False,
):
    """documents → candidate near-dup pairs (doc_a < doc_b) via LSH buckets.

    The signature stage is stateless (no loaded artifact), so it runs as
    plain tasks — no actor-pool spin-up.

    ``n_parts`` (default: scaled with input file count, see ``_auto_parts``)
    bounds per-partition rows at scale.  Buckets larger than ``max_bucket``
    would emit O(k²) pairs (a near-constant bucket is usually boilerplate
    text); they fall back to a connectivity-preserving adjacent-id chain and
    the count is logged — no silent truncation.

    ``cross_only`` is the two-corpus mode used by ``minhash_cross_dedup``:
    doc ids encode corpus membership in their sign (reference ids negative,
    corpus ids nonnegative) and only opposite-sign pairs are emitted —
    ``doc_a`` is always the (negative) reference id, ``doc_b`` the corpus
    id, so the ``doc_a < doc_b`` convention holds unchanged.  Oversized
    buckets pair every corpus doc with the single smallest reference id
    instead of the full cross product (bounded output, logged; below
    ``max_bucket`` the candidate set matches the SQL mirror exactly)."""
    signer = MinHashSignatures(n_shingle=n_shingle, num_perm=num_perm, bands=bands)

    def sign(batch: pa.Table) -> pa.Table:
        return signer(batch)

    # ~32k-doc bundles: the signature stage emits 16 skinny band rows per
    # doc, and the band-bucket sort shuffle downstream pays input_blocks x
    # partitions (the block-tax rule in CLAUDE.md) — 256 read blocks would
    # feed it 256 near-identical skinny blocks
    band_rows = ds.map_batches(sign, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=32768)

    if n_parts is None:
        n_parts = _auto_parts(ds)
    return _pairs_from_band_rows(band_rows, n_parts, max_bucket, cross_only)



def _pairs_from_band_rows(band_rows, n_parts: int, max_bucket: int = 8192,
                          cross_only: bool = False):
    """(band, band_hash, doc_id) rows -> deduped candidate pairs with
    n_bands — the shared pair-generation core behind the inline path
    (minhash_candidate_pairs) and the stored-signature path
    (minhash_candidates_from_sigs).  See the caller docstrings for the
    coarse-partition / max_bucket semantics."""
    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        part = (bh.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("band", "ascending"), ("band_hash", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bh = g.column("band_hash").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
            )
        starts = _key_runs(band, bh)
        a_out, b_out = [], []
        n_over = over_rows = 0
        # singleton buckets dominate a mostly-unique corpus — iterating
        # Python over millions of them just to `continue` was the hot cost
        # of this kernel; select the multi-member runs vectorized first.
        # Same trap one level up: a bucket whose members are all one
        # corpus side (cross mode) or all one doc id (re-ingested url →
        # identical signature) emits nothing, and re-crawled corpora have
        # ~1e5 such buckets per partition set — compute eligibility
        # vectorized so the Python loop touches only emitting buckets.
        lens = np.diff(starts)
        run_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        if cross_only:
            negs = np.bincount(run_idx, weights=ids < 0, minlength=len(lens))
            eligible = (lens >= 2) & (negs > 0) & (negs < lens)
        else:
            newid = np.empty(n, bool)
            newid[0] = True
            newid[1:] = ids[1:] != ids[:-1]  # ids sorted within each run
            newid[starts[:-1]] = True
            uniq_lens = np.bincount(run_idx, weights=newid, minlength=len(lens))
            eligible = uniq_lens >= 2
        for mi in np.nonzero(eligible)[0]:
            s, e = starts[mi], starts[mi + 1]
            k = e - s
            if cross_only:
                uids = np.unique(ids[s:e])
                neg = uids[uids < 0]
                pos = uids[uids >= 0]
                if not len(neg) or not len(pos):
                    continue
                if k > max_bucket:
                    # bounded fallback: cap the reference side so the bucket
                    # emits <= ~max_bucket pairs (smallest encoded ids,
                    # deterministic).  Recall in oversized buckets can drop —
                    # a corpus doc's true near-dup reference may be cut —
                    # so the cap and count are logged, never silent.
                    n_over += 1
                    over_rows += k
                    neg = neg[: max(1, max_bucket // len(pos))]
                a_out.append(np.repeat(neg, len(pos)))
                b_out.append(np.tile(pos, len(neg)))
                continue
            if k > max_bucket:
                n_over += 1
                over_rows += k
                uids = np.unique(ids[s:e])
                if len(uids) > 1:
                    ca, cb = _chain_pairs(uids)
                    a_out.append(ca)
                    b_out.append(cb)
                continue
            # duplicate doc ids (same id seen twice in a bucket) would emit
            # degenerate (x, x) pairs — drop to unique ids first
            uids = np.unique(ids[s:e])
            k = len(uids)
            if k <= 1:
                continue
            iu, ju = np.triu_indices(k, k=1)
            a_out.append(uids[iu])
            b_out.append(uids[ju])
        if n_over:
            logger.warning(
                "minhash LSH: %d bucket(s) over max_bucket=%d (%d rows total) "
                "fell back to chain pairs", n_over, max_bucket, over_rows,
            )
        if not a_out:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), type=pa.int64()),
            }
        )

    pairs = (
        band_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pyarrow")
    )
    # dedup pairs produced by multiple bands; count how many bands agree
    return _pair_reduce_bucketed(pairs, "count", "n_bands", n_parts=n_parts)


_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hamming_pair_reduce(pairs, n_parts: int):
    """Min-hamming reduce for the banded-code verify cores, regime-gated
    on the MEASURED pair-row count rather than a caller declaration:
    media/code dup sets are usually output-sized (near-empty → the
    streamed aggregate wins by ~0.5 s flat, the r4 embedding_dups rule),
    but a heavily-duplicated corpus emits each dup pair once per band —
    at 100M half-duplicated codes that is 200M rows, where the streamed
    ``groupby.aggregate`` measured ~13 min and the bucketed reduce
    minutes (the high-cardinality-aggregate rule).  The pairs table is
    materialized by the verify shuffle anyway, so the count is free;
    reduce partitions scale with the measured pair volume."""
    pairs = pairs.materialize()
    n_pair_rows = pairs.count()
    return _pair_reduce_bucketed(
        pairs, "min", "hamming", value_col="hamming",
        n_parts=max(n_parts, int(-(-n_pair_rows // 2_000_000))),
        output_sized=n_pair_rows <= 4_000_000,
    )


def _pair_reduce_bucketed(pairs, mode: str, alias: str,
                          value_col: str | None = None, n_parts: int = 64,
                          key_a: str = "doc_a", key_b: str = "doc_b",
                          output_sized: bool = False):
    """One row per (doc_a, doc_b) with count/min/max of ``value_col`` —
    the coarse-bucket replacement for ``groupby([a, b]).aggregate(...)``
    on high-cardinality pair keys (the CLAUDE-rule shape: Dataset
    groupby-aggregate pays the same sort-shuffle tax as map_groups there;
    a pair-hash bucket shuffle + one vectorized lexsort/reduceat per
    bucket was measured 5.5x on 16M skinny candidate rows).  Column names
    match the aggregate it replaces: (doc_a, doc_b, alias).

    ``output_sized=True`` declares the pair set OUTPUT-sized (verified
    near-dup pairs — orders of magnitude below the candidate stream) and
    flips to the plain streamed ``groupby.aggregate``: at that size the
    bucketed path's extra chained all-to-all costs more than it saves
    (interleaved 5×2 A/B on the embedding_dups bench, near-empty pairs:
    bucketed 1.27-1.35 s vs streamed aggregate 0.79-0.87 s — the r02→r03
    regression; a mid-chain materialize size-gate read the same 1.3 s,
    so the gate itself was the cost).  CANDIDATE-sized pair streams
    (minhash band counts) must keep the bucketed path."""
    if output_sized:
        from ray.data.aggregate import Count, Max, Min

        agg = (
            Count(alias_name=alias)
            if mode == "count"
            else (Min if mode == "min" else Max)(value_col, alias_name=alias)
        )
        return pairs.groupby([key_a, key_b]).aggregate(agg)

    pu = np.uint64(n_parts)

    def tag(batch: pa.Table) -> pa.Table:
        a = batch.column(key_a).to_numpy(zero_copy_only=False)
        b = batch.column(key_b).to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            pb = splitmix64(a.view(np.uint64) * _PAIR_MIX + b.view(np.uint64))
        return batch.append_column(
            "pb", pa.array((pb % pu).astype(np.int32), pa.int32())
        )

    val_type = None
    if value_col is not None:
        sch = pairs.schema().base_schema
        if hasattr(sch, "field"):
            val_type = sch.field(value_col).type
        else:  # PandasBlockSchema (from_pandas inputs): names + np dtypes
            val_type = pa.from_numpy_dtype(
                sch.types[list(sch.names).index(value_col)]
            )

    def reduce_bucket(group: pa.Table) -> pa.Table:
        cols = {
            key_a: pa.array([], pa.int64()),
            key_b: pa.array([], pa.int64()),
            alias: pa.array(
                [], pa.int64() if val_type is None else val_type
            ),
        }
        if not group.num_rows or not group.num_columns:
            return pa.table(cols)
        a = group.column(key_a).to_numpy(zero_copy_only=False)
        b = group.column(key_b).to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        starts = _key_runs(a, b)
        lens = np.diff(starts)
        if mode == "count":
            agg = lens.astype(np.int64)
        else:
            v = group.column(value_col).to_numpy(zero_copy_only=False)[o]
            red = np.minimum if mode == "min" else np.maximum
            agg = red.reduceat(v, starts[:-1])
        first = starts[:-1]
        return pa.table(
            {
                key_a: pa.array(a[first], pa.int64()),
                key_b: pa.array(b[first], pa.int64()),
                alias: pa.array(agg),
            }
        )

    return (
        # batch_size bundles the skinny pair rows (the block-tax rule):
        # upstream verify stages emit one block per partition, many nearly
        # empty, and the sort shuffle pays input_blocks × n_parts slicing
        # overhead even on few rows
        pairs.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=32768)
        .groupby("pb")
        .map_groups(reduce_bucket, batch_format="pyarrow")
    )


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact n-gram (word-shingle) Jaccard similarity — the verification
    kernel for candidate pairs."""
    sa = set(shingle_hashes(text_a, n=n).tolist())
    sb = set(shingle_hashes(text_b, n=n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _shingle_blob_table(batch: pa.Table, n: int, cand_sorted: np.ndarray | None) -> pa.Table:
    """(doc_id, sh) rows: per-doc SORTED UNIQUE shingle hashes packed into a
    large_binary blob (acero hash joins don't carry list columns, and a
    binary blob round-trips zero-copy via np.frombuffer).

    Shingle hashes are the same position-mixed token-hash folds the MinHash
    signature stage uses, so "same shingle" means exactly "same n-token
    window" — Jaccard over these sets equals Jaccard over string n-gram
    sets modulo 64-bit hash collisions."""
    from ..sketches.minhash import _shingle_hash_flat, _tokenize_batch

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    # one blob per doc id within the batch: duplicate ids (e.g. the same url
    # ingested twice) would multiply join fan-out quadratically downstream
    _, first_idx = np.unique(ids, return_index=True)
    if len(first_idx) != len(ids):
        batch = batch.take(pa.array(np.sort(first_idx)))
        ids = ids[np.sort(first_idx)]
    if cand_sorted is not None:
        mask = np.isin(ids, cand_sorted)
        if not mask.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "sh": pa.array([], pa.large_binary())}
            )
        batch = batch.filter(pa.array(mask))
        ids = ids[mask]
    tok_h, offsets = _tokenize_batch(batch.column("text"))
    sh, sh_off = _shingle_hash_flat(tok_h, offsets, n)
    # per-doc sorted-unique, vectorized: one lexsort over (doc, shingle)
    # plus a first-occurrence mask replaces a per-doc np.unique loop
    # (bit-identical — np.unique is sorted-unique — and ~10x at whole-
    # corpus candidate sets)
    ndocs = len(sh_off) - 1
    seg_len = np.diff(sh_off)
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), seg_len)
    order = np.lexsort((sh, doc_idx))
    dd, sd = doc_idx[order], sh[order]
    keep = np.empty(len(sd), bool)
    if len(sd):
        keep[0] = True
        keep[1:] = (dd[1:] != dd[:-1]) | (sd[1:] != sd[:-1])
    uniq_d, uniq_s = dd[keep], sd[keep]
    counts = np.bincount(uniq_d, minlength=ndocs).astype(np.int64)
    byte_off = np.concatenate(([0], np.cumsum(counts * 8))).astype(np.int64)
    blob_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        ndocs,
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(uniq_s.tobytes())],
    )
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "sh": blob_arr})


def _blob_offsets_data(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (element offsets, uint64 data) view of a large_binary
    column of packed uint64 arrays."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.uint64)
    off = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, np.uint8)[: off[-1]].view(np.uint64) if buf else np.zeros(0, np.uint64)
    return off // 8, data


_EMPTY_CSR = (
    np.zeros(0, np.int64),
    np.zeros(1, np.int64),
    np.zeros(0, np.uint64),
)


def _csr_from_tables(tabs):
    """(ids_sorted, offs, flat) CSR of a list of blob tables, Arrow
    buffers end-to-end: a per-row Python round-trip would cost ~69 s for
    944k blobs; the zero-copy offsets view + one vectorized segment
    gather does the same re-ordering in ~2 s."""
    tabs = [t for t in tabs if t is not None and t.num_rows and t.num_columns]
    if not tabs:
        return _EMPTY_CSR
    big = pa.concat_tables(tabs)
    ids = big.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    off_e, dat = _blob_offsets_data(big.column("sh"))
    lens = np.diff(off_e)
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    ln = lens[order]
    offs = np.concatenate(([0], np.cumsum(ln))).astype(np.int64)
    total = int(offs[-1])
    idx = np.repeat(off_e[:-1][order], ln) + (
        np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], ln)
    )
    flat = dat[idx]
    return ids_sorted, offs, flat


def _csr_from_blob_ds(sh_ds):
    """Whole-Dataset CSR (broadcast fast path — caller has size-gated
    this under the broadcast cap, so one driver-side copy is fine)."""
    import ray

    return _csr_from_tables(ray.get(sh_ds.to_arrow_refs()))


def _intersect_with_csr(ids_a_csr, off_a, dat_a, ids_b_csr, off_b, dat_b,
                        a, b, out_fn, batch):
    ia = np.searchsorted(ids_a_csr, a)
    ib = np.searchsorted(ids_b_csr, b)
    n = len(a)
    # per-pair np.intersect1d loop: blobs are ~46 elements, so each
    # intersect is a tiny 92-element sort — measured 6.8x FASTER than a
    # flat gather + one 12M-element lexsort per block (the big sort's
    # random-gather pattern is DRAM-bound; don't "vectorize" this one)
    inter = np.zeros(n, np.int64)
    la = np.zeros(n, np.int64)
    lb = np.zeros(n, np.int64)
    for i in range(n):
        xa = dat_a[off_a[ia[i]] : off_a[ia[i] + 1]]
        xb = dat_b[off_b[ib[i]] : off_b[ib[i] + 1]]
        la[i], lb[i] = len(xa), len(xb)
        inter[i] = len(np.intersect1d(xa, xb, assume_unique=True))
    return out_fn(batch, inter, la, lb)


def _verify_pairs_with_blobs(
    pairs, sh_ds, out_fn, num_partitions: int, broadcast_bytes: int
):
    """Shared candidate-pair verification core: pull each pair's two
    shingle blobs and hand (batch, |∩|, |A|, |B|) to ``out_fn``.

    Small side → CSR broadcast fast path (one ray.put of the packed
    blobs, verification in plain map_batches — each hash join costs a
    shuffle-actor pool spin-up that dwarfs the work on sparse
    candidates).  Above ``broadcast_bytes`` → SLABBED CSR: the sorted
    candidate-id range splits into K ≈ ceil(bytes/broadcast_bytes)
    contiguous slabs, each ray.put once (a per-NODE plasma copy at
    cluster scale, read zero-copy by every task); pairs shuffle ONCE on
    (slab_a, slab_b, pair-hash) and each group verifies against exactly
    two slabs.  This replaces the old two-hash-join fallback, which
    attached both blobs to EVERY pair — at 10M pages / 171M candidate
    pairs that materialized ~80 GB mid-join and OOM-killed the shuffle
    aggregator actors; the slabbed path moves each blob exactly once and
    the pair shuffle stays skinny (two int64s + int32).  Shared by
    `verified_minhash_edges` (Jaccard) and `containment_pairs`
    (containment) so these fixes live in exactly one place."""
    import ray

    from ..core.bcast import cached_get

    import os as _os
    import time as _time

    _trace = _os.environ.get("FEVER_RAY_TIMING")
    _t0 = _time.time()
    blob_bytes = sh_ds.size_bytes() or 0
    if blob_bytes <= broadcast_bytes:
        csr_ref = ray.put(_csr_from_blob_ds(sh_ds))
        if _trace:
            print(f"[verify] CSR build+put: {_time.time()-_t0:.2f}s")

        def verify_broadcast(batch: pa.Table) -> pa.Table:
            ids_s, off, dat = cached_get(csr_ref)
            a = batch.column("doc_a").to_numpy(zero_copy_only=False)
            b = batch.column("doc_b").to_numpy(zero_copy_only=False)
            return _intersect_with_csr(
                ids_s, off, dat, ids_s, off, dat, a, b, out_fn, batch
            )

        return pairs.map_batches(verify_broadcast, batch_format="pyarrow")

    # ---- slabbed CSR path ----
    # Built WITHOUT materializing the blob store on the driver (the old
    # slicing held O(total blob bytes) driver RSS — a single-node ceiling
    # on exactly the above-broadcast-cap path).  Pass 1 collects only the
    # skinny (doc_id, element count) metadata per block; the driver cuts
    # the sorted id range into BYTE-balanced slab bounds; pass 2 splits
    # each block by slab and assembles each slab's CSR in worker tasks
    # (num_returns fan-out → each blob byte moves exactly twice, in
    # parallel, never through the driver).
    blk_refs = sh_ds.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _ids_lens(tab):
        if not tab.num_rows or not tab.num_columns:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        ids = tab.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        off_e, _ = _blob_offsets_data(tab.column("sh"))
        return ids, np.diff(off_e).astype(np.int64)

    meta = ray.get([_ids_lens.remote(r) for r in blk_refs])
    ids_all = (
        np.concatenate([m[0] for m in meta])
        if meta
        else np.zeros(0, np.int64)
    )
    lens_all = (
        np.concatenate([m[1] for m in meta])
        if meta
        else np.zeros(0, np.int64)
    )
    ids_srt = np.sort(ids_all)
    cum = np.cumsum(lens_all[np.argsort(ids_all, kind="stable")] * 8)
    total_bytes = int(cum[-1]) if len(cum) else 0
    K = max(2, int(-(-total_bytes // broadcast_bytes)))
    targets = np.arange(1, K) * (total_bytes / K)
    cut_rows = np.unique(
        np.concatenate(
            ([0], np.searchsorted(cum, targets), [len(ids_srt)])
        )
    )
    K = max(2, len(cut_rows) - 1)
    if len(cut_rows) - 1 < 2:  # degenerate tiny input: row-balanced halves
        cut_rows = np.array([0, len(ids_srt) // 2, len(ids_srt)])
    bounds = np.empty(K, np.int64)  # first id of each slab
    for k in range(K):
        s = int(cut_rows[k])
        bounds[k] = ids_srt[s] if s < len(ids_srt) else np.iinfo(np.int64).max

    @ray.remote(num_cpus=0.5)
    def _split_block(tab, bounds_, K_):
        if not tab.num_rows or not tab.num_columns:
            return [None] * K_ if K_ > 1 else None
        ids = tab.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sl = np.searchsorted(bounds_, ids, side="right") - 1
        out = []
        for k in range(K_):
            rows = np.flatnonzero(sl == k)
            out.append(tab.take(pa.array(rows)) if len(rows) else None)
        return out if K_ > 1 else out[0]

    @ray.remote(num_cpus=0.5)
    def _build_slab(*pieces):
        return _csr_from_tables(pieces)

    bounds_ref = ray.put(bounds)
    piece_refs = [
        _split_block.options(num_returns=K).remote(r, bounds_ref, K)
        for r in blk_refs
    ]
    slab_refs = [
        _build_slab.remote(*[pr[k] for pr in piece_refs]) for k in range(K)
    ]
    if _trace:
        print(f"[verify] slabbed CSR scheduled: {_time.time()-_t0:.2f}s "
              f"(K={K}, {total_bytes >> 20} MB)")
    # sub-split each (slab_a, slab_b) cell so parallelism isn't capped at
    # K² when most pairs land in few cells
    m = max(1, num_partitions // (K * K) + 1)
    mm = np.uint64(m)

    def tag_cells(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        sa = np.searchsorted(bounds, a, side="right") - 1
        sb = np.searchsorted(bounds, b, side="right") - 1
        with np.errstate(over="ignore"):
            h = splitmix64(a.view(np.uint64) * _PAIR_MIX + b.view(np.uint64))
        cell = ((sa * K + sb).astype(np.int64) * m
                + (h % mm).astype(np.int64))
        return batch.append_column("__cell", pa.array(cell, pa.int64()))

    # every caller materializes `pairs` before verification, so schema()
    # is metadata — the typed empty keeps empty map_groups partitions
    # from emitting a mismatched (zero-column) schema
    empty_in = pa.table(
        {f.name: pa.nulls(0, f.type) for f in _arrow_schema(pairs)}
    )
    zero = np.zeros(0, np.int64)

    def verify_cell(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return out_fn(empty_in, zero, zero, zero)
        cell = int(group.column("__cell")[0].as_py()) // m
        sa, sb = cell // K, cell % K
        ids_a, off_a, dat_a = cached_get(slab_refs[sa])
        ids_b, off_b, dat_b = cached_get(slab_refs[sb])
        group = group.drop_columns(["__cell"])
        a = group.column("doc_a").to_numpy(zero_copy_only=False)
        b = group.column("doc_b").to_numpy(zero_copy_only=False)
        return _intersect_with_csr(
            ids_a, off_a, dat_a, ids_b, off_b, dat_b, a, b, out_fn, group
        )

    return (
        pairs.map_batches(tag_cells, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=32768)
        .groupby("__cell")
        .map_groups(verify_cell, batch_format="pyarrow")
    )


def _dedup_blobs_by_id(blob_ds, num_partitions: int):
    """Exactly ONE blob row per doc id across batches (re-ingested ids
    would multiply the verify join fan-out): a coarse id-hash bucket
    shuffle + vectorized first-per-id pick.  A per-id
    ``groupby("doc_id").map_groups`` pays the high-cardinality sort-
    shuffle tax (~1M groups at whole-corpus candidate sets); the
    bucketed form is the CLAUDE-rule coarse-bucket pattern."""
    from ..sketches.hashing import bucket_of

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "bucket",
            pa.array(bucket_of(batch.column("doc_id"), num_partitions),
                     pa.int32()),
        )

    def first_per_id(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "sh": pa.array([], pa.large_binary()),
                }
            )
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        _, first = np.unique(ids, return_index=True)
        return g.select(["doc_id", "sh"]).take(
            pa.array(np.sort(first), pa.int64())
        )

    return (
        blob_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(first_per_id, batch_format="pyarrow")
    )


def _candidate_ids(pairs) -> np.ndarray:
    """Sorted unique doc ids named by a (doc_a, doc_b) pair Dataset — the
    blob-stage prefilter set.  Arrow refs end-to-end: take_all() of the
    per-batch unique partials round-trips every id through a Python dict
    (measured tens of seconds at millions of pairs)."""
    import ray

    def batch_ids(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch.column("doc_a").to_numpy(zero_copy_only=False),
                    batch.column("doc_b").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"doc_id": pa.array(u, pa.int64())})

    tabs = [
        t
        for t in ray.get(
            pairs.map_batches(batch_ids, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        return np.zeros(0, np.int64)
    return np.unique(
        np.concatenate(
            [t.column("doc_id").to_numpy(zero_copy_only=False) for t in tabs]
        )
    )


def _jaccard_out_fn(threshold: float):
    """Jaccard metric tail for `_verify_pairs_with_blobs`: two empty sets
    are identical (jaccard 1.0), exactly the per-pair loop it replaced."""

    def out(batch: pa.Table, inter, la, lb) -> pa.Table:
        union = np.maximum(la + lb - inter, 1)
        jac = np.where((la == 0) & (lb == 0), 1.0, inter / union)
        keep = jac >= threshold
        sel = batch.select(["doc_a", "doc_b"]).filter(pa.array(keep))
        return sel.append_column("jaccard", pa.array(jac[keep], pa.float64()))

    return out


def verified_minhash_edges(
    ds, threshold: float = 0.7, n_shingle=3, num_perm=64, bands=16,
    num_partitions: int = 16, n_parts: int | None = None,
    broadcast_bytes: int = 256 << 20, cross_only: bool = False,
    pairs=None,
):
    """Candidate pairs → exact-Jaccard-verified edge Dataset (doc_a, doc_b,
    jaccard), fully distributed:

    1. LSH candidate pairs (small: only docs sharing a band).
    2. Per-doc shingle-set blobs for CANDIDATE docs only — the candidate id
       set (ids only, 8 B each) is broadcast via ray.put and applied as an
       np.isin prefilter inside the blob stage, so the shuffle below moves
       candidate blobs, never the corpus.  (If the candidate id set ever
       outgrew driver memory, drop the prefilter and let the inner join do
       the filtering — same result, full-shingle shuffle.)
    3. Two distributed hash joins pull sh_a/sh_b onto each pair; a
       vectorized kernel computes exact Jaccard per pair (np.intersect1d
       over presorted unique arrays — no Python sets, no driver state).
    """
    import ray

    # repartition before the joins: the pair-gen groupby emits one (mostly
    # empty) block per coarse partition, and Ray's hash-shuffle join stalls
    # when fed hundreds of near-empty input blocks; the candidate set is
    # small, so a narrow coalesce to num_partitions blocks is cheap
    if pairs is None:
        pairs = minhash_candidate_pairs(
            ds, n_shingle=n_shingle, num_perm=num_perm, bands=bands,
            n_parts=n_parts, cross_only=cross_only,
        )
    # caller-supplied pairs (e.g. from stored signatures) take the same
    # coalesce so the joins below never see hundreds of near-empty blocks
    pairs = pairs.repartition(num_partitions).materialize()
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if pairs.count() == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    # candidate doc ids in ONE narrow pass (per-batch np.unique partials,
    # tiny driver merge) — cheaper than two groupby shuffles via unique()
    cand_ids = _candidate_ids(pairs)
    cand_ref = ray.put(cand_ids)

    def blobs(batch: pa.Table) -> pa.Table:
        return _shingle_blob_table(batch, n_shingle, ray.get(cand_ref))

    sh_ds = (
        _dedup_blobs_by_id(
            ds.map_batches(blobs, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=32768),
            num_partitions,
        )
        .repartition(num_partitions)
        .materialize()
    )

    return _verify_pairs_with_blobs(
        pairs, sh_ds, _jaccard_out_fn(threshold), num_partitions,
        broadcast_bytes,
    )


def connected_components(edges_ds, num_partitions: int = 16, max_rounds: int = 64):
    """Distributed connected components over an undirected edge Dataset
    (doc_a, doc_b) → (doc_id, cluster_id = component min id).

    Min-label propagation WITH pointer jumping: each round (1) every node
    takes the min of its own and its neighbors' labels (one hash join over
    the symmetric edge list), then (2) jumps to its label's label (one hash
    join of the label table against itself) — the doubling step that makes
    path graphs converge in O(log diameter) rounds instead of O(diameter).
    Labels are monotonically non-increasing, so SUM(label) strictly
    decreases until the fixpoint — a cheap O(1)-size convergence probe.
    Every per-round structure is edge/node-sized, never corpus-sized; each
    join is materialized on its own (two shuffle-aggregator pools inside one
    streaming execution can deadlock small clusters)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges_sym = (
        edges_ds.map_batches(sym, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    if edges_sym.count() == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
        )

    labels = (
        edges_sym.groupby("src")
        .aggregate(Min("dst", alias_name="min_dst"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b.column("src"),
                    "label": pc.min_element_wise(b.column("src"), b.column("min_dst")),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev = labels.sum("label")
    for _ in range(max_rounds):
        # (1) neighbor propagation: label(x) ← min(label(x), label(N(x)))
        msgs = edges_sym.join(
            labels, join_type="inner", num_partitions=num_partitions,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("dst"), "label": b.column("label")}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(num_partitions)
            .materialize()
        )
        cur = labels.sum("label")
        if cur == prev:
            # neighbor-prop fixpoint ⇒ labels constant within every
            # component ⇒ converged; skip the jump join
            break
        prev = cur
        # (2) pointer jump: label(x) ← min(label(x), label(label(x)))
        jtab = labels.map_batches(
            lambda b: pa.table({"jnode": b.column("node"), "jlabel": b.column("label")}),
            batch_format="pyarrow",
        )
        labels = (
            labels.join(
                jtab, join_type="inner", num_partitions=num_partitions,
                on=("label",), right_on=("jnode",),
            )
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b.column("node"),
                        "label": pc.min_element_wise(
                            b.column("label"), b.column("jlabel")
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
            .materialize()
        )
        cur = labels.sum("label")
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("node"), "cluster_id": b.column("label")}),
        batch_format="pyarrow",
    )


def minhash_dedup_components(
    ds, threshold: float = 0.7, n_shingle=3, num_perm=64, bands=16,
    num_partitions: int = 16, n_parts: int | None = None, pairs=None,
):
    """Full near-dedup: candidates → distributed exact-Jaccard verify →
    distributed connected components → Dataset (doc_id, cluster_id = min
    doc id of its component).

    Nothing materializes on the driver except the candidate-id broadcast
    and an O(1) convergence probe per label-propagation round; texts never
    leave the cluster (only candidate shingle-set blobs move through the
    verify joins).  The at-scale generalization of the reference's
    in-process side-set dedup (dns_aggregator.go:145-168)."""
    edges = verified_minhash_edges(
        ds, threshold=threshold, n_shingle=n_shingle, num_perm=num_perm,
        bands=bands, num_partitions=num_partitions, n_parts=n_parts,
        pairs=pairs,
    )
    return connected_components(edges, num_partitions=num_partitions)


# ------------------------------------------------------------------ simhash
class SimHashFingerprints:
    """Actor stage: 64-bit SimHash per doc + 4×16-bit band keys for
    bucketing (docs within Hamming distance ≤3 share ≥1 band — pigeonhole)."""

    def __init__(self, n_bands: int = 4):
        self.n_bands = n_bands
        self.band_bits = 64 // n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches.minhash import batch_simhash

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch_simhash(batch.column("text"))  # vectorized whole batch
        n_docs = len(ids)
        bands = np.arange(self.n_bands, dtype=np.uint64)
        mask = np.uint64((1 << self.band_bits) - 1)
        with np.errstate(over="ignore"):
            keys = (fps[:, None] >> (bands[None, :] * np.uint64(self.band_bits))) & mask
        fp_i64 = fps.view(np.int64)  # two's-complement reinterpretation
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.n_bands), type=pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.n_bands, dtype=np.int32), n_docs),
                    type=pa.int32(),
                ),
                "band_key": pa.array(keys.reshape(-1).astype(np.int64), type=pa.int64()),
                "simhash": pa.array(np.repeat(fp_i64, self.n_bands), type=pa.int64()),
            }
        )


def hamming_code_pairs(
    code_ds, max_hamming: int = 3, n_parts: int | None = None,
    max_bucket: int = 8192, n_bands: int | None = None,
    id_col: str = "doc_id", code_col: str = "code",
):
    """Banded 64-bit-code blocking + exact Hamming verification — the
    simhash pipeline's pairing core made CODE-GENERIC: any 64-bit
    locality-preserving fingerprint (text SimHash, image pHash, audio
    chromaprint-style codes) pairs through the same machinery.  Input:
    one (id, code int64) row per item; codes within Hamming distance
    ``n_bands − 1`` (pigeonhole) share ≥1 band key and get
    exact-verified.

    ``n_bands`` defaults to the MINIMAL pigeonhole banding — the
    smallest divisor of 64 that is ≥ ``max_hamming + 1`` — because the
    output is provably invariant to extra bands (they only rediscover
    the same pairs; the min-reduce dedups them) while each extra band
    both multiplies the shuffled rows and NARROWS the band keys: at
    100M codes, fixed 4 bands = 16-bit keys = 65k distinct keys/band,
    so every bucket held ~1.5k rows and in-bucket verification went
    quadratic (~3×10¹¹ hamming evals, measured ~16 min); the minimal
    1 band at max_hamming=0 keys buckets on the FULL 64-bit code.

    Same scale guards as the minhash path: ``n_parts`` scales with input
    size (one map_groups partition must never hold a fixed fraction of
    ALL band rows) and buckets over ``max_bucket`` fall back to
    Hamming-verified adjacent-id chains with a logged count instead of
    O(k²) work.  Output: (doc_a, doc_b, hamming), min-reduced over
    bands (regime-gated on measured pair volume)."""
    if n_bands is None:
        n_bands = next(
            b for b in (1, 2, 4, 8, 16, 32, 64) if b >= max_hamming + 1
        )
    if 64 % n_bands:
        raise ValueError(f"hamming_code_pairs: n_bands must divide 64, got {n_bands}")
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"hamming_code_pairs: n_bands={n_bands} cannot guarantee recall "
            f"at max_hamming={max_hamming} (pigeonhole needs >= "
            f"{max_hamming + 1} bands)"
        )
    band_bits = 64 // n_bands
    if n_parts is None:
        n_parts = _auto_parts(code_ds)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        fps = (
            batch.column(code_col)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        n_docs = len(ids)
        bands = np.arange(n_bands, dtype=np.uint64)
        mask = np.uint64((1 << band_bits) - 1)
        with np.errstate(over="ignore"):
            keys = (fps[:, None] >> (bands[None, :] * np.uint64(band_bits))) & mask
        fp_i64 = fps.view(np.int64)  # two's-complement reinterpretation
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n_bands), type=pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(n_bands, dtype=np.int32), n_docs),
                    type=pa.int32(),
                ),
                "band_key": pa.array(
                    keys.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                "code": pa.array(np.repeat(fp_i64, n_bands), type=pa.int64()),
            }
        )

    rows = code_ds.map_batches(
        band_rows, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    )

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch.column("band_key").to_numpy(zero_copy_only=False)
        part = (bk.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def verify_partition(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("band", "ascending"), ("band_key", "ascending"), ("doc_id", "ascending")],
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bk = g.column("band_key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        fps = g.column("code").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(ids)
        a_out, b_out, d_out = [], [], []
        n_over = over_rows = 0
        if n:
            starts = _key_runs(band, bk)
            # skip the singleton-run majority vectorized (see the minhash
            # pairs_in_partition note)
            lens = np.diff(starts)
            for mi in np.nonzero(lens >= 2)[0]:
                s, e = starts[mi], starts[mi + 1]
                k = e - s
                if k > max_bucket:
                    # boilerplate band: Hamming-verified adjacent chain
                    n_over += 1
                    over_rows += k
                    ca, cb = _chain_pairs(ids[s:e])
                    da = hamming_distance(fps[s:e][:-1], fps[s:e][1:])
                    keep = (da <= max_hamming) & (ca != cb)
                    if keep.any():
                        xa, xb = ca[keep], cb[keep]
                        a_out.append(np.minimum(xa, xb))
                        b_out.append(np.maximum(xa, xb))
                        d_out.append(da[keep])
                    continue
                iu, ju = np.triu_indices(k, k=1)
                da = hamming_distance(fps[s:e][iu], fps[s:e][ju])
                keep = (da <= max_hamming) & (ids[s:e][iu] != ids[s:e][ju])
                if keep.any():
                    xa, xb = ids[s:e][iu][keep], ids[s:e][ju][keep]
                    a_out.append(np.minimum(xa, xb))
                    b_out.append(np.maximum(xa, xb))
                    d_out.append(da[keep])
        if n_over:
            logger.warning(
                "hamming code bands: %d bucket(s) over max_bucket=%d (%d rows total) "
                "fell back to chain verification", n_over, max_bucket, over_rows,
            )
        if not a_out:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), type=pa.int64()),
                "hamming": pa.array(np.concatenate(d_out).astype(np.int64), type=pa.int64()),
            }
        )

    pairs = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    return _hamming_pair_reduce(pairs, n_parts)


def simhash_near_dup_pairs(
    ds, max_hamming: int = 3, n_parts: int | None = None, max_bucket: int = 8192,
):
    """Banded SimHash blocking + exact Hamming verification per bucket —
    text fingerprinting (`sketches.minhash.batch_simhash`) feeding the
    generic `hamming_code_pairs` core."""

    def fp(batch: pa.Table) -> pa.Table:
        from ..sketches.minhash import batch_simhash

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch_simhash(batch.column("text"))  # vectorized whole batch
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "code": pa.array(fps.view(np.int64), pa.int64()),
            }
        )

    codes = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
    return hamming_code_pairs(
        codes, max_hamming=max_hamming,
        n_parts=n_parts or _auto_parts(ds), max_bucket=max_bucket,
    )


# ------------------------------------------------------------------ embeddings
def embedding_dup_pairs(
    ds, threshold: float = 0.95, n_planes: int = 8, n_tables: int = 8,
    verify_all: bool = False, n_parts: int | None = None, max_bucket: int = 4096,
):
    """Near-dup pairs by embedding cosine similarity — banded multi-table
    random-hyperplane LSH + exact in-bucket verification.

    Scale path: ``n_tables`` independent hyperplane tables of ``n_planes``
    sign bits each; two vectors with cosine ≥ threshold collide in ≥1 table
    w.h.p. (p_plane = 1 - θ/π per plane; recall measured vs verify_all in
    tests).  Buckets are processed the same way as the MinHash path: coarse
    hash partitions + vectorized run detection (never one Python call per
    tiny bucket), matrices rebuilt zero-copy from the list column
    (knn._embedding_matrix reshape), oversized buckets fall back to the
    connectivity-preserving adjacent chain with a logged count.

    ``verify_all`` forces a single bucket (exact all-pairs brute force) for
    small inputs/oracles — and exempts it from ``max_bucket``, since the
    caller explicitly asked for the exact quadratic verification."""
    from .knn import _embedding_matrix, _normalize

    if verify_all:
        n_tables = 1
        max_bucket = np.iinfo(np.int64).max
    if n_parts is None:
        n_parts = _auto_parts(ds)

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = _normalize(_embedding_matrix(batch))
        n, d = mat.shape
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if verify_all:
            sig = np.zeros((n, 1), dtype=np.int64)
        else:
            # seeded plane tensor regenerated per task: deterministic and
            # cheaper than broadcasting (d × n_tables·n_planes floats)
            pl = np.random.default_rng(7).standard_normal((d, n_tables * n_planes))
            bits = (mat @ pl) > 0
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            sig = (
                bits.reshape(n, n_tables, n_planes).astype(np.int64) * weights
            ).sum(axis=2)
        tables = np.tile(np.arange(n_tables, dtype=np.int32), n)
        rep = np.repeat(np.arange(n, dtype=np.int64), n_tables)
        flat = mat[rep].reshape(-1)
        return pa.table(
            {
                "vec_id": pa.array(ids[rep], type=pa.int64()),
                "table": pa.array(tables, type=pa.int32()),
                "bucket": pa.array(sig.reshape(-1), type=pa.int64()),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, type=pa.float64()), d
                ),
            }
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False).astype(np.uint64)
        tb = batch.column("table").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((bk * np.uint64(0x9E3779B97F4A7C15) ^ tb) % np.uint64(n_parts)).astype(
            np.int32
        )
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def verify_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
        n = group.num_rows
        if n == 0:
            return empty
        order = pc.sort_indices(
            group,
            sort_keys=[("table", "ascending"), ("bucket", "ascending"), ("vec_id", "ascending")],
        )
        g = group.take(order)
        tb = g.column("table").to_numpy(zero_copy_only=False)
        bk = g.column("bucket").to_numpy(zero_copy_only=False)
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        vec_col = g.column("vec")
        if isinstance(vec_col, pa.ChunkedArray):
            vec_col = vec_col.combine_chunks()
        d = vec_col.type.list_size
        mat = np.asarray(vec_col.values).reshape(n, d)
        starts = _key_runs(tb, bk)
        a_out, b_out, c_out = [], [], []
        n_over = over_rows = 0
        lens = np.diff(starts)
        for mi in np.nonzero(lens >= 2)[0]:
            s, e = starts[mi], starts[mi + 1]
            k = e - s
            sub = mat[s:e]
            sub_ids = ids[s:e]
            if k > max_bucket:
                n_over += 1
                over_rows += k
                ca, cb = sub_ids[:-1], sub_ids[1:]
                cs = np.einsum("ij,ij->i", sub[:-1], sub[1:])
                # a duplicated vec_id would chain-pair with itself at
                # cosine 1.0 — drop degenerate pairs, order (min, max)
                keep = (cs >= threshold) & (ca != cb)
                xa, xb = ca[keep], cb[keep]
                a_out.append(np.minimum(xa, xb))
                b_out.append(np.maximum(xa, xb))
                c_out.append(cs[keep])
                continue
            sims = sub @ sub.T
            iu, ju = np.triu_indices(k, k=1)
            sv = sims[iu, ju]
            keep = (sv >= threshold) & (sub_ids[iu] != sub_ids[ju])
            if keep.any():
                xa, xb = sub_ids[iu[keep]], sub_ids[ju[keep]]
                a_out.append(np.minimum(xa, xb))
                b_out.append(np.maximum(xa, xb))
                c_out.append(sv[keep])
        if n_over:
            logger.warning(
                "embedding LSH: %d bucket(s) over max_bucket=%d (%d rows total) "
                "fell back to chain verification", n_over, max_bucket, over_rows,
            )
        if not a_out:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "vec_b": pa.array(np.concatenate(b_out), type=pa.int64()),
                "cosine": pa.array(np.concatenate(c_out), type=pa.float64()),
            }
        )

    pairs = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    return _pair_reduce_bucketed(
        pairs, "max", "cosine", value_col="cosine", n_parts=n_parts,
        key_a="vec_a", key_b="vec_b", output_sized=True,
    )


# ------------------------------------------------------------- line dedup
def _split_lines(batch: pa.Table, text_col: str, sep: str):
    """Split ``text_col`` on ``sep`` → (ids-aligned ListArray of lines,
    flat line StringArray, per-doc offsets int64[nrows+1])."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.cast(text, pa.string())
    if text.null_count:  # null text behaves as empty (one '' line)
        text = text.fill_null("")
    lines = pc.split_pattern(text, sep)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    offsets = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return lines, lines.flatten(), offsets - offsets[0]


def line_dedup(
    ds,
    threshold: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
    match: str = "exact",
):
    """CCNet/MassiveText-style duplicate-line removal: drop every line that
    occurs more than ``threshold`` times across the WHOLE corpus (boiler-
    plate — nav bars, cookie banners, license footers), re-join the
    surviving lines per document, and drop documents left with no lines.

    Output rows: (id_col, text_col rewritten, ``n_kept`` int64).  With
    ``match='exact'`` (default) matching is EXACT line-string equality — no
    hash-collision false drops; ``match='hash'`` counts 64-bit line hashes
    instead (what CCNet itself does): pass 1 shuffles 8-byte keys rather
    than line text — the right trade at web scale, with a ~n²/2⁶⁴
    collision false-drop risk documented here.  Either way the result is a
    pure function of the corpus, independent of partitioning.
    ``id_col`` must uniquely identify rows (the standard corpus contract —
    run ``exact_dedup`` first if it may not): the join-fallback path groups
    by it, so colliding ids would merge documents there.

    Scale shape (10^12 docs): pass 1 shuffles (line-key, partial-count)
    pairs pre-aggregated per batch — the classic combiner — so only unique
    keys-per-batch move (8 bytes each under ``match='hash'``).  The
    duplicate-line set (count > threshold) is then applied in one of two
    ways:

    * broadcast path (default): when the dup set fits ``broadcast_bytes``,
      ``ray.put`` it once and scrub every batch with one vectorized
      membership probe (``pc.is_in`` / sorted ``searchsorted``) + offset
      rebuild — the corpus text never shuffles.
    * join fallback: explode (doc_id, ord, line) rows, co-partition with
      the dup set by line hash, per-bucket anti-join, then reassemble per
      document — two shuffles that DO move corpus text, the honest cost
      when the boilerplate set itself is beyond a worker's heap.
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    if match not in ("exact", "hash"):
        raise ValueError(f"match must be 'exact' or 'hash', got {match!r}")
    import ray

    hashed = match == "hash"
    key = "lh" if hashed else "ln"
    n_parts = num_partitions or _auto_parts(ds, floor=32)

    # Count pass: per-batch combiner → COARSE bucket map_groups (each key
    # lands wholly in one bucket, so per-bucket sums are exact) with the
    # duplicate filter fused in — the groupby().aggregate(Sum) shape is
    # 5-10× slower at line-count cardinality (measured 27.7 s vs this on
    # 5M partial rows), same lesson as the LSH band stage.
    def count_partial(batch: pa.Table) -> pa.Table:
        _, flat, _ = _split_lines(batch, text_col, sep)
        if hashed:
            # int64 view: Ray's sort shuffle round-trips int64 keys
            # losslessly, while uint64 > 2^63-1 trips Arrow conversion
            uk, uc = np.unique(hash64(flat).view(np.int64), return_counts=True)
            bucket = (uk.view(np.uint64) % np.uint64(n_parts)).astype(np.int32)
            return pa.table(
                {
                    "lh": pa.array(uk, pa.int64()),
                    "n": pa.array(uc, pa.int64()),
                    "bucket": pa.array(bucket, pa.int32()),
                }
            )
        t = pa.TableGroupBy(pa.table({"ln": flat}), ["ln"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["ln", "n"])
        ln = t.column("ln")
        if isinstance(ln, pa.ChunkedArray):
            ln = ln.combine_chunks()
        bucket = (hash64(ln) % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def dup_bucket(group: pa.Table) -> pa.Table:
        if hashed:
            lh = group.column("lh").to_numpy(zero_copy_only=False)
            n = group.column("n").to_numpy(zero_copy_only=False)
            uk, inv = np.unique(lh, return_inverse=True)
            tot = np.zeros(len(uk), dtype=np.int64)
            np.add.at(tot, inv, n)
            return pa.table({"lh": pa.array(uk[tot > threshold], pa.int64())})
        t = pa.TableGroupBy(group.select(["ln", "n"]), ["ln"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["ln", "n"])
        return t.filter(pc.greater(t.column("n"), threshold)).select(["ln"])

    dup = (
        ds.map_batches(count_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(dup_bucket, batch_format="pyarrow")
        .materialize()
    )

    dup_bytes = dup.size_bytes() or 0
    if dup_bytes <= broadcast_bytes:
        # empty map_groups partitions surface as zero-column tables
        tabs = [
            t for t in ray.get(dup.to_arrow_refs()) if t.num_rows and t.num_columns
        ]
        if not tabs:
            tabs = [
                pa.table({key: pa.array([], pa.int64() if hashed else pa.string())})
            ]
        dup_arr = pa.concat_tables(tabs).column(key)
        if hashed:  # sorted int64-view keys → searchsorted membership probes
            dup_ref = ray.put(
                np.sort(dup_arr.combine_chunks().to_numpy(zero_copy_only=False))
            )
        else:
            dup_ref = ray.put(dup_arr.combine_chunks())

        def scrub(batch: pa.Table) -> pa.Table:
            dup_set = ray.get(dup_ref)
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            _, flat, offsets = _split_lines(batch, text_col, sep)
            if len(dup_set) and hashed:
                lh = hash64(flat).view(np.int64)
                pos = np.searchsorted(dup_set, lh)
                pos[pos == len(dup_set)] = 0
                keep_np = dup_set[pos] != lh
                keep = pa.array(keep_np)
            elif len(dup_set):
                keep = pc.invert(pc.is_in(flat, value_set=dup_set))
                keep_np = keep.to_numpy(zero_copy_only=False)
            else:
                keep = pa.array(np.ones(len(flat), dtype=bool))
                keep_np = np.ones(len(flat), dtype=bool)
            ck = np.zeros(len(flat) + 1, dtype=np.int64)
            np.cumsum(keep_np, out=ck[1:])
            n_kept = ck[offsets[1:]] - ck[offsets[:-1]]
            new_off = np.zeros(batch.num_rows + 1, dtype=np.int64)
            np.cumsum(n_kept, out=new_off[1:])
            la = pa.ListArray.from_arrays(
                pa.array(new_off, pa.int32()), flat.filter(keep)
            )
            joined = pc.binary_join(la, sep)
            out = pa.table(
                {
                    id_col: ids,
                    text_col: joined,
                    "n_kept": pa.array(n_kept, pa.int64()),
                }
            )
            return out.filter(pa.array(n_kept > 0))

        return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)

    # -------- join fallback: dup set exceeds a worker's heap ----------
    logger.info(
        "line_dedup: dup set %.1f MB > broadcast cap %.1f MB — bucketed join "
        "path over %d partitions",
        dup_bytes / 2**20, broadcast_bytes / 2**20, n_parts,
    )
    # the dup side carries no ids — its sentinel columns must match the
    # corpus id type exactly or the union's schemas collide
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()

    def _id_part(ids: pa.Array) -> np.ndarray:
        """Reassembly partition of each id: hash-partition so every doc's
        surviving lines land in exactly one coarse bucket."""
        if pa.types.is_integer(ids.type):
            h = hash64_ints(ids.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            h = hash64(ids)
        return (h % np.uint64(n_parts)).astype(np.int32)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        _, flat, offsets = _split_lines(batch, text_col, sep)
        doc_lens = np.diff(offsets)
        row = np.repeat(np.arange(batch.num_rows, dtype=np.int64), doc_lens)
        ordn = np.arange(len(flat), dtype=np.int64) - np.repeat(
            offsets[:-1], doc_lens
        )
        lh = hash64(flat)
        bucket = (lh % np.uint64(n_parts)).astype(np.int32)
        cols = {
            id_col: pc.take(ids, pa.array(row, pa.int64())),
            "ord": pa.array(ordn, pa.int64()),
            "ln": flat,
            "bucket": pa.array(bucket, pa.int32()),
            "is_dup": pa.array(np.zeros(len(flat), dtype=bool)),
        }
        if hashed:
            cols["lh"] = pa.array(lh.view(np.int64), pa.int64())
        return pa.table(cols)

    def mark_dup(batch: pa.Table) -> pa.Table:
        kv = batch.column(key)
        if isinstance(kv, pa.ChunkedArray):
            kv = kv.combine_chunks()
        n = len(kv)
        if hashed:
            lh = kv.to_numpy(zero_copy_only=False).view(np.uint64)
        else:
            lh = hash64(kv)
        bucket = (lh % np.uint64(n_parts)).astype(np.int32)
        cols = {
            id_col: pa.nulls(n, id_type),
            "ord": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "ln": pa.nulls(n, pa.string()) if hashed else kv,
            "bucket": pa.array(bucket, pa.int32()),
            "is_dup": pa.array(np.ones(n, dtype=bool)),
        }
        if hashed:
            cols["lh"] = pa.array(lh.view(np.int64), pa.int64())
        return pa.table(cols)

    lines_ds = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    dup_tagged = dup.map_batches(mark_dup, batch_format="pyarrow")

    def anti(group: pa.Table) -> pa.Table:
        is_dup = group.column("is_dup")
        dup_keys = group.filter(is_dup).column(key)
        keep_rows = group.filter(pc.invert(is_dup))
        if len(dup_keys):
            mask = pc.invert(
                pc.is_in(keep_rows.column(key), value_set=dup_keys.combine_chunks())
            )
            keep_rows = keep_rows.filter(mask)
        ids = keep_rows.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return keep_rows.select([id_col, "ord", "ln"]).append_column(
            "dpart", pa.array(_id_part(ids), pa.int32())
        )

    kept = (
        lines_ds.union(dup_tagged)
        .groupby("bucket")
        .map_groups(anti, batch_format="pyarrow")
    )

    def reassemble_part(group: pa.Table) -> pa.Table:
        """All documents of one coarse partition rebuilt in ONE vectorized
        pass: sort by (id, ord), detect doc runs, one ListArray +
        binary_join — never a per-document Python call."""
        n = group.num_rows
        order = pc.sort_indices(
            group, sort_keys=[(id_col, "ascending"), ("ord", "ascending")]
        )
        ids = pc.take(group.column(id_col), order).combine_chunks()
        lines = pc.take(group.column("ln"), order).combine_chunks()
        if n > 1:
            neq = pc.not_equal(ids.slice(1), ids.slice(0, n - 1))
            new_doc = np.concatenate(
                ([True], neq.to_numpy(zero_copy_only=False).astype(bool))
            )
        else:
            new_doc = np.ones(n, dtype=bool)
        starts = np.flatnonzero(new_doc)
        offsets = np.concatenate((starts, [n]))
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), lines)
        return pa.table(
            {
                id_col: pc.take(ids, pa.array(starts, pa.int64())),
                text_col: pc.binary_join(la, sep),
                "n_kept": pa.array(np.diff(offsets).astype(np.int64), pa.int64()),
            }
        )

    return (
        kept.groupby("dpart")
        .map_groups(reassemble_part, batch_format="pyarrow")
    )


# ------------------------------------------------------------ cross dedup
def _sorted_unique_column(mat_ds, col: str) -> np.ndarray:
    """Collect a MATERIALIZED skinny dataset's integer column into one
    sorted-unique driver array — the broadcast side of a probe anti-join."""
    import ray

    parts = [
        t.column(col).to_numpy(zero_copy_only=False)
        for t in ray.get(mat_ds.to_arrow_refs())
        if t.num_rows
    ]
    return np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)


def _broadcast_anti_probe(
    skinny, key_col: str, values: np.ndarray, keep_matches: bool = False
):
    """Drop (default) or KEEP (``keep_matches=True`` — the semi-join /
    intersect direction) every row of ``skinny`` whose ``key_col`` appears
    in the sorted array ``values``: ray.put once, ONE searchsorted probe
    per batch, no shuffle — the shared broadcast half of the cross-dedup
    family.  Both sides must be signed ints (mixed int64/uint64 would
    upcast to float64 and lose 64-bit precision — see CLAUDE.md)."""
    import ray

    ref = ray.put(values)

    def scrub(batch: pa.Table) -> pa.Table:
        rs = ray.get(ref)
        if not len(rs):
            return batch.slice(0, 0) if keep_matches else batch
        h = batch.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rs, h)
        pos[pos == len(rs)] = 0
        hit = rs[pos] == h
        return batch.filter(pa.array(hit if keep_matches else ~hit))

    return skinny.map_batches(scrub, batch_format="pyarrow")


def cross_dedup(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
):
    """Incremental / cross-corpus exact dedup: drop every document of ``ds``
    whose content already appears in ``ref_ds`` — the "dedupe this crawl
    against everything we already have" step of an incremental ingestion
    pipeline (and the doc-level complement of ``decontaminate``).

    Output rows: (id_col, ``content_hash`` int64) of the SURVIVORS — text
    never enters any shuffle; callers re-attach payloads by joining back on
    the id.  Matching is by the same 64-bit content hash ``exact_dedup``
    partitions on (FNV-1a + splitmix64 finalizer over the raw text bytes).

    Scale shape (10^12 docs): both sides project to skinny hash rows first.

    * broadcast path: when the reference hash set fits ``broadcast_bytes``
      (8 bytes/doc — ~100 M reference docs per GB), it rides ``ray.put``
      once, sorted, and every corpus batch probes it with one
      ``searchsorted`` — no shuffle at all.
    * join fallback: union-tag the two skinny (hash) streams, co-partition
      by hash, per-bucket anti-join — the shuffle carries (id, hash) pairs
      only, never text.
    """

    return _cross_content_match(
        ds, ref_ds, id_col, text_col, broadcast_bytes, num_partitions,
        keep_matches=False,
    )


def corpus_intersect(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
):
    """Exact corpus intersection — the semi-join flip of ``cross_dedup``:
    keep every document of ``ds`` whose content ALSO appears in
    ``ref_ds`` (overlap audits between crawls/releases, "how much of
    this vendor dump do we already have", contamination measurement at
    doc granularity).  Output rows: (id_col, ``content_hash``) of the
    MATCHED docs; same movement budget as ``cross_dedup`` (skinny hash
    rows; broadcast probe under ``broadcast_bytes``, bucketed semi-join
    above it — text never shuffles)."""
    return _cross_content_match(
        ds, ref_ds, id_col, text_col, broadcast_bytes, num_partitions,
        keep_matches=True,
    )


def _cross_content_match(
    ds, ref_ds, id_col, text_col, broadcast_bytes, num_partitions,
    keep_matches: bool,
):
    """Shared cross_dedup / corpus_intersect core (anti vs semi is one
    flag through the probe/join helpers)."""

    def corpus_hash(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_col)
        return t.select([id_col, "content_hash"])

    def ref_hash(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_col)
        h = t.column("content_hash")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        return pa.table(
            {"content_hash": pa.array(
                np.unique(h.to_numpy(zero_copy_only=False)), pa.int64()
            )}
        )

    skinny = ds.map_batches(corpus_hash, batch_format="pyarrow", zero_copy_batch=True)
    ref_h = ref_ds.map_batches(
        ref_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    ref_bytes = ref_h.size_bytes() or 0
    if ref_bytes <= broadcast_bytes:
        return _broadcast_anti_probe(
            skinny, "content_hash",
            _sorted_unique_column(ref_h, "content_hash"),
            keep_matches=keep_matches,
        )

    # -------- join fallback: reference hash set exceeds a worker's heap
    n_parts = num_partitions or _auto_parts(ds, floor=32)
    logger.info(
        "cross content match: ref hashes %.1f MB > broadcast cap %.1f MB — "
        "bucketed %s-join over %d partitions",
        ref_bytes / 2**20, broadcast_bytes / 2**20,
        "semi" if keep_matches else "anti", n_parts,
    )
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()
    return _hash_anti_join(
        skinny, ref_h, id_col, id_type, n_parts, keep_matches=keep_matches
    )


def minhash_cross_dedup(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n_shingle: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    num_partitions: int = 16,
    n_parts: int | None = None,
    broadcast_bytes: int = 256 << 20,
):
    """Fuzzy incremental dedup: drop every document of ``ds`` whose NEAR
    duplicate (exact shingle-set Jaccard ≥ ``threshold``, LSH-candidated)
    already exists in ``ref_ds`` — the MinHash generalization of
    ``cross_dedup`` for the "dedupe this crawl against everything we already
    have, catching boilerplate re-renders too" step.

    Construction: reference ids are encoded into the negative half-plane
    (``-id - 1``, injective for ``id >= 0``; both corpora must use
    nonnegative ids) and the two corpora stream through the SAME distributed
    signature → band-bucket → verify machinery as ``minhash_dedup`` with
    ``cross_only=True``, so only opposite-corpus pairs are generated and
    verified.  Within-corpus duplicates are deliberately left alone
    (run ``minhash_dedup_components`` for those).

    Output rows: (id_col,) of the SURVIVORS.  Scale shape: the shuffles
    carry band rows and candidate shingle blobs only; matched-id removal is
    a broadcast searchsorted probe when the matched set fits
    ``broadcast_bytes`` and a bucketed anti-join otherwise.
    """

    def corpus_side(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("minhash_cross_dedup requires nonnegative ids")
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64), pa.int64()),
             "text": batch.column(text_col)}
        )

    def ref_side(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) and ids.min() < 0:
            raise ValueError("minhash_cross_dedup requires nonnegative ids")
        return pa.table(
            {"doc_id": pa.array(-ids.astype(np.int64) - 1, pa.int64()),
             "text": batch.column(text_col)}
        )

    union = ds.map_batches(
        corpus_side, batch_format="pyarrow", zero_copy_batch=True
    ).union(ref_ds.map_batches(ref_side, batch_format="pyarrow", zero_copy_batch=True))

    edges = verified_minhash_edges(
        union, threshold=threshold, n_shingle=n_shingle, num_perm=num_perm,
        bands=bands, num_partitions=num_partitions, n_parts=n_parts,
        broadcast_bytes=broadcast_bytes, cross_only=True,
    )

    # matched corpus ids = the nonnegative endpoint of every verified edge
    def matched_ids(batch: pa.Table) -> pa.Table:
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({"matched": pa.array(np.unique(b[b >= 0]), pa.int64())})

    matched = edges.map_batches(matched_ids, batch_format="pyarrow").materialize()

    # survivors keep the caller's id dtype (cross_dedup contract: callers
    # re-attach payloads by joining back on the id) — sign-encoding above is
    # internal only
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()

    skinny = ds.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow", zero_copy_batch=True
    )

    matched_bytes = matched.size_bytes() or 0
    if matched_bytes <= broadcast_bytes:
        return _broadcast_anti_probe(
            skinny, id_col, _sorted_unique_column(matched, "matched")
        )

    # anti-join fallback: reuse the shared bucketed core by carrying the id
    # itself as the join key column ("content_hash" is just the key name the
    # shared kernel partitions on); partition count scales with input size —
    # this path only triggers when the matched set outgrows a worker's heap
    n_anti = max(num_partitions, _auto_parts(ds, floor=32))
    logger.info(
        "minhash_cross_dedup: matched ids %.1f MB > broadcast cap — bucketed "
        "anti-join over %d partitions", matched_bytes / 2**20, n_anti,
    )
    keyed = skinny.map_batches(
        lambda b: b.append_column("content_hash", b.column(id_col).cast(pa.int64())),
        batch_format="pyarrow",
    )
    ref_h = matched.map_batches(
        lambda b: pa.table({"content_hash": b.column("matched").cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    out = _hash_anti_join(keyed, ref_h, id_col, id_type, n_anti)
    return out.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )


def _hash_anti_join(
    skinny, ref_h, id_col, id_type, n_parts: int, keep_matches: bool = False
):
    """Bucketed anti-join core shared by ``cross_dedup`` and
    ``bloom_cross_dedup``: union-tag the skinny corpus (id, content_hash)
    stream with the reference hash stream, co-partition by hash, drop
    corpus rows whose hash appears on the reference side of the bucket
    (or KEEP exactly those with ``keep_matches=True`` — the semi-join).
    The shuffle carries (id, hash) pairs only — never text."""

    def tag_corpus(batch: pa.Table) -> pa.Table:
        h = batch.column("content_hash").to_numpy(zero_copy_only=False)
        bucket = (h.view(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "content_hash": batch.column("content_hash"),
                "bucket": pa.array(bucket, pa.int32()),
                "is_ref": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            }
        )

    def tag_ref(batch: pa.Table) -> pa.Table:
        h = batch.column("content_hash").to_numpy(zero_copy_only=False)
        bucket = (h.view(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                id_col: pa.nulls(batch.num_rows, id_type),
                "content_hash": batch.column("content_hash"),
                "bucket": pa.array(bucket, pa.int32()),
                "is_ref": pa.array(np.ones(batch.num_rows, dtype=bool)),
            }
        )

    def anti(group: pa.Table) -> pa.Table:
        is_ref = group.column("is_ref")
        ref_keys = group.filter(is_ref).column("content_hash")
        keep = group.filter(pc.invert(is_ref))
        if len(ref_keys):
            hit = pc.is_in(
                keep.column("content_hash"),
                value_set=ref_keys.combine_chunks(),
            )
            keep = keep.filter(hit if keep_matches else pc.invert(hit))
        elif keep_matches:
            keep = keep.slice(0, 0)
        return keep.select([id_col, "content_hash"])

    return (
        skinny.map_batches(tag_corpus, batch_format="pyarrow")
        .union(ref_h.map_batches(tag_ref, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(anti, batch_format="pyarrow")
    )


# per-process probe cache for the stateless-task bloom prefilter (see
# ops/ioc.py:270 for the pattern rationale)
_BLOOM_PROBE_CACHE: dict = {}


# ------------------------------------------ bloom-prefiltered cross dedup
def bloom_cross_dedup(
    ds,
    ref_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    p: float = 1e-3,
    bloom=None,
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
):
    """``cross_dedup`` with a DCSO-Bloom prefilter on the reference side —
    same contract (EXACT survivors as (id_col, ``content_hash``) rows; the
    corpus text never shuffles), different scale shape:

    * the reference compresses to a Bloom filter over content hashes
      (~1.44·log2(1/p) bits/key — 1.8 bytes at the p=1e-3 default, vs
      8 bytes/key for ``cross_dedup``'s sorted raw hashes), stretching the
      no-shuffle broadcast regime ~4.5× for the same ``broadcast_bytes``;
    * a corpus row that MISSES the filter is a definite survivor (Bloom
      filters have no false negatives) and exits through a pure
      map_batches path; only true duplicates plus a p-fraction of false
      positives enter the exact verification join, so the join input is
      |dups| + p·|corpus| rows instead of |corpus|;
    * ``bloom``: optionally a prebuilt ``BloomFilter`` from a previous
      ingest (DCSO file format — build/save/load via sketches.bloom or the
      CLI), letting an incremental crawl skip re-hashing the reference
      corpus into a filter every run.  Keys are the (content_hash,
      splitmix64(content_hash)) pair inserted with ``add_hashes`` — a
      hash-pair filter, NOT FNV-of-text, so probe it with ``check_hashes``,
      not ``check``.

    Exactness does not depend on ``p``; p only trades filter size against
    verification-join input.  Verification of the flagged minority uses a
    reversed broadcast when the candidate hash set is small (scan the
    reference once against the broadcast candidates — the reference being
    too big for broadcast is the reason the bloom path exists), else the
    shared ``_hash_anti_join``.

    Scale posture (10^12 docs): the skinny probed projection (id, hash,
    flag ≈ 17 B/doc) is materialized once so the survivor split does not
    recompute the text hash pass; the object store spills it.  Falls back
    to plain ``cross_dedup`` shape when the filter itself would not fit
    ``broadcast_bytes``.
    """
    import ray

    from ..sketches.bloom import BloomFilter
    from ..sketches.hashing import splitmix64

    def corpus_hash(batch: pa.Table) -> pa.Table:
        return add_content_hash(batch, text_col).select([id_col, "content_hash"])

    def ref_hash(batch: pa.Table) -> pa.Table:
        t = add_content_hash(batch, text_col)
        h = t.column("content_hash")
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        return pa.table(
            {"content_hash": pa.array(
                np.unique(h.to_numpy(zero_copy_only=False)), pa.int64()
            )}
        )

    skinny = ds.map_batches(corpus_hash, batch_format="pyarrow", zero_copy_batch=True)
    ref_h = ref_ds.map_batches(
        ref_hash, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except Exception:
        id_type = pa.int64()

    if bloom is None:
        n_ref = int(ref_h.count())
        bf = BloomFilter.initialize(max(n_ref, 1), p)
        if bf.m // 8 > broadcast_bytes:
            logger.info(
                "bloom_cross_dedup: filter for n=%d at p=%g needs %.1f MB > "
                "broadcast cap — plain bucketed anti-join instead",
                n_ref, p, bf.m / 8 / 2**20,
            )
            n_parts = num_partitions or _auto_parts(ds, floor=32)
            return _hash_anti_join(skinny, ref_h, id_col, id_type, n_parts)
        # stream reference blocks through the driver one at a time; each
        # add is one vectorized add_hashes call (the blocks were already
        # per-batch deduped by ref_hash)
        for blk in ref_h.to_arrow_refs():
            t = ray.get(blk)
            if not t.num_rows:
                continue
            h = t.column("content_hash").to_numpy(zero_copy_only=False)
            h = np.ascontiguousarray(h).view(np.uint64)
            bf.add_hashes(h, splitmix64(h))
        bloom = bf
    bloom_bytes = bloom.to_bytes()
    blob_ref = ray.put(bloom_bytes)
    # stateless tasks + per-process content-keyed cache (the ioc-matcher
    # pattern, ops/ioc.py:270): each worker deserializes the filter on
    # first touch and reuses it — actor pools pay ~2 s of spin-up that
    # dwarfs the probe work on short runs, with identical semantics
    import hashlib

    cache_key = ("bloom_cross", hashlib.sha1(bloom_bytes).hexdigest())

    def probe(batch: pa.Table) -> pa.Table:
        bf_ = _BLOOM_PROBE_CACHE.get(cache_key)
        if bf_ is None:
            bf_ = BloomFilter.from_bytes(ray.get(blob_ref))
            _BLOOM_PROBE_CACHE.clear()
            _BLOOM_PROBE_CACHE[cache_key] = bf_
        h = batch.column("content_hash").to_numpy(zero_copy_only=False)
        h = np.ascontiguousarray(h).view(np.uint64)
        hit = bf_.check_hashes(h, splitmix64(h))
        return batch.append_column("maybe_dup", pa.array(hit))

    probed = skinny.map_batches(probe, batch_format="pyarrow").materialize()

    def keep_clear(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(b.column("maybe_dup"))).select(
            [id_col, "content_hash"]
        )

    def keep_cand(b: pa.Table) -> pa.Table:
        return b.filter(b.column("maybe_dup")).select([id_col, "content_hash"])

    clear = probed.map_batches(keep_clear, batch_format="pyarrow")
    cand = probed.map_batches(keep_cand, batch_format="pyarrow").materialize()

    cand_bytes = cand.size_bytes() or 0
    if cand_bytes <= broadcast_bytes:
        # reversed broadcast semi-join: the candidate hash set is the small
        # side here — ship IT, scan the (large) reference once, and collect
        # which candidate hashes really occur (bounded by |cand|)
        parts = [
            t.column("content_hash").to_numpy(zero_copy_only=False)
            for t in ray.get(cand.to_arrow_refs())
            if t.num_rows
        ]
        cand_sorted = (
            np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
        )
        cand_ref = ray.put(cand_sorted)

        def matched(batch: pa.Table) -> pa.Table:
            cs = ray.get(cand_ref)
            h = batch.column("content_hash").to_numpy(zero_copy_only=False)
            if not len(cs) or not len(h):
                return pa.table({"content_hash": pa.array([], pa.int64())})
            pos = np.searchsorted(cs, h)
            pos[pos == len(cs)] = 0
            hits = h[cs[pos] == h]
            return pa.table({"content_hash": pa.array(np.unique(hits), pa.int64())})

        mparts = [
            t.column("content_hash").to_numpy(zero_copy_only=False)
            for t in ray.get(
                ref_h.map_batches(matched, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows
        ]
        dup_sorted = (
            np.unique(np.concatenate(mparts)) if mparts else np.zeros(0, np.int64)
        )
        dup_ref = ray.put(dup_sorted)

        def scrub(batch: pa.Table) -> pa.Table:
            dh = ray.get(dup_ref)
            if not len(dh) or not batch.num_rows:
                return batch
            h = batch.column("content_hash").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dh, h)
            pos[pos == len(dh)] = 0
            return batch.filter(pa.array(dh[pos] != h))

        survivors = cand.map_batches(scrub, batch_format="pyarrow")
    else:
        n_parts = num_partitions or _auto_parts(ds, floor=32)
        logger.info(
            "bloom_cross_dedup: %.1f MB of candidates > broadcast cap — "
            "bucketed anti-join over %d partitions",
            cand_bytes / 2**20, n_parts,
        )
        survivors = _hash_anti_join(cand, ref_h, id_col, id_type, n_parts)

    return clear.union(survivors)


def _poly_mults(n: int) -> np.ndarray:
    """[P^(n-1), ..., P^1, P^0] mod 2^64 for the window-key polynomial —
    computed in Python ints (no numpy scalar-overflow warnings), P = the
    FNV-1a 64-bit prime (odd, high multiplicative order, shared with the
    byte hashers)."""
    from ..sketches.hashing import _FNV64_PRIME

    p = int(_FNV64_PRIME)
    out, m = [], 1
    for _ in range(n):
        out.append(m)
        m = (m * p) & 0xFFFFFFFFFFFFFFFF
    return np.array(out[::-1], dtype=np.uint64)


def _window_hashes(batch: pa.Table, n: int, text_col: str, pre=None):
    """64-bit window keys for the hash-mode dup-window family WITHOUT
    materializing the joined n-gram strings: hash each token once, then
    combine each window's n token hashes as a polynomial in _POLY
    (key = splitmix64(sum th[i+j] * P^(n-1-j) mod 2^64)) — order-sensitive
    and position-injective (distinct multipliers per position, so equal
    tokens at different offsets can never cancel the way a repeating
    rotation schedule would), ~1.7x cheaper than hashing gram strings
    (measured; the ~n x corpus bytes of grams are never built).

    Returns (uint64 keys, row index per key, flat window-start positions),
    with the same sub-n-token-document semantics as
    ``trainprep._doc_ngrams`` — the valid mask is the shared
    ``trainprep._window_valid``, so gram-path and hash-path index spaces
    are one definition.  ``pre`` = an already-computed ``(flat tokens,
    offsets)`` pair to skip re-tokenizing."""
    from .trainprep import _split_tokens, _window_valid

    if pre is not None:
        flat, offsets = pre
    else:
        _, flat, offsets = _split_tokens(batch, text_col)
    total = len(flat)
    if total < n:
        return None, None, None
    doc_lens = np.diff(offsets)
    th = hash64(flat)
    m = total - n + 1
    mults = _poly_mults(n)
    acc = np.zeros(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            acc += th[j : m + j] * mults[j]
    from ..sketches.hashing import splitmix64

    keys = splitmix64(acc)
    valid = _window_valid(offsets, n)
    if not valid.any():
        return None, None, None
    rows = np.repeat(np.arange(len(doc_lens), dtype=np.int64), doc_lens)[:m][valid]
    return keys[valid], rows, np.flatnonzero(valid)


def _dup_key_set(ds, n: int, text_col: str, n_parts: int, hashed: bool):
    """Pass 1 shared by :func:`dup_ngram_windows` and
    :func:`dup_ngram_trim`: the set of window keys occurring more than once
    corpus-wide.  Each batch emits its DISTINCT keys once and its
    within-batch duplicates once more, so per-bucket dup detection is a
    pure sorted-run scan — no count column ever moves."""
    from .trainprep import _doc_ngrams

    key_type = pa.int64() if hashed else pa.string()

    def key_partial(batch: pa.Table) -> pa.Table:
        if hashed:
            kh, _rows, _starts = _window_hashes(batch, n, text_col)
        else:
            grams, _rows = _doc_ngrams(batch, n, text_col)
        if _rows is None:
            return pa.table(
                {"k": pa.array([], key_type), "bucket": pa.array([], pa.int32())}
            )
        if hashed:
            uk, uc = np.unique(kh, return_counts=True)
            ks = np.concatenate([uk, uk[uc > 1]])
            karr = pa.array(ks.view(np.int64), pa.int64())
            hb = ks
        else:
            t = (
                pa.TableGroupBy(pa.table({"g": grams}), ["g"])
                .aggregate([([], "count_all")])
                .rename_columns(["g", "c"])
            )
            g = t.column("g")
            if isinstance(g, pa.ChunkedArray):
                g = g.combine_chunks()
            mask = pc.greater(t.column("c"), 1)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            dup_local = g.filter(mask)
            if isinstance(dup_local, pa.ChunkedArray):
                dup_local = dup_local.combine_chunks()
            karr = pa.concat_arrays([g, dup_local])
            hb = hash64(karr)
        bucket = (hb % np.uint64(n_parts)).astype(np.int32)
        return pa.table({"k": karr, "bucket": pa.array(bucket, pa.int32())})

    def dup_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table({"k": pa.array([], key_type)})
        kc = group.column("k")
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if hashed:
            ks = np.sort(kc.to_numpy(zero_copy_only=False))
            dup_mask = np.empty(len(ks), dtype=bool)
            dup_mask[:-1] = ks[:-1] == ks[1:]
            dup_mask[-1] = False
            first_of_run = np.empty(len(ks), dtype=bool)
            first_of_run[0] = True
            first_of_run[1:] = ks[1:] != ks[:-1]
            out = ks[dup_mask & first_of_run]
            return pa.table({"k": pa.array(out, pa.int64())})
        idx = pc.sort_indices(kc)
        ks = kc.take(idx)
        eq_next = pc.equal(ks.slice(0, len(ks) - 1), ks.slice(1)).to_numpy(
            zero_copy_only=False
        )
        neq_prev = np.empty(len(ks), dtype=bool)
        neq_prev[0] = True
        neq_prev[1:] = ~eq_next
        dup_mask = np.zeros(len(ks), dtype=bool)
        dup_mask[:-1] = eq_next
        keep = dup_mask & neq_prev
        return pa.table({"k": ks.filter(pa.array(keep))})

    return (
        # ~32k-doc bundles: bigger batches compress repeated window keys
        # better AND feed the bucket shuffle fewer blocks (sort-shuffle
        # cost scales with input_blocks x partitions — the editsim rule)
        ds.map_batches(key_partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(dup_bucket, batch_format="pyarrow")
    )


def dup_ngram_windows(
    ds,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    match: str = "exact",
    broadcast_bytes: int = 256 << 20,
):
    """Per-document substring-duplication profile: for every document with
    at least ``n`` whitespace tokens, count how many of its word ``n``-gram
    windows occur MORE THAN ONCE across the whole corpus (including repeats
    within one document) — the distributed n-gram-join analogue of
    suffix-array exact-substring dedup (Lee et al. 2021, arXiv:2107.06499).

    Output rows: (``id_col``, total_windows int64, dup_windows int64).
    Downstream policy — drop when dup_windows/total_windows exceeds a
    budget, or route to span trimming — composes with
    ``curate.curation_filter``.

    ``match='exact'`` keys on the literal window string (zero collision
    risk; the count shuffle moves ~n x corpus bytes — the honest exact
    cost); ``match='hash'`` keys on a rolling polynomial of the window's per-token
    64-bit hashes (see ``_window_hashes``; 8-byte shuffle keys, the
    web-scale trade, ~pairs^2/2^64 collision odds).
    Either way the result is a pure function of the corpus, independent of
    partitioning.

    Scale shape (10^12 docs) — the same two-regime design as
    :func:`line_dedup`:

    * count pass: each batch emits its DISTINCT window keys once (and its
      within-batch duplicates twice), so duplicate detection in the coarse
      key-hash buckets is a pure sorted-run scan — no count column, no
      per-key arithmetic.  Only keys move, never (doc, key) pairs.
    * broadcast regime (the normal case — duplicated boilerplate windows
      are a small fraction of a real corpus): the dup-key set is ray.put
      once; pass 2 recomputes each batch's windows and takes one vectorized
      membership probe + per-doc segment sum.  A document is one row, so
      the profile finishes INSIDE map_batches — zero further shuffle.
      (``ds`` is consumed twice: materialize expensive lazy chains first.)
    * join fallback (dup set beyond a worker's heap): shuffle per-batch
      pre-aggregated (doc, key, multiplicity) rows into key-hash buckets
      where global counts and per-doc dup partials are computed together,
      then sum the skinny partials in doc-hash buckets.

    Reference anchor: generalizes fever's exact side-set dedup
    (/root/reference/processing/dns_aggregator.go:145-168) from fixed keys
    to sliding text windows.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if match not in ("exact", "hash"):
        raise ValueError(f"match must be 'exact' or 'hash', got {match!r}")
    import ray

    from .trainprep import _doc_ngrams

    hashed = match == "hash"
    n_parts = num_partitions or _auto_parts(ds, floor=32)
    id_type = ds.schema().base_schema.field(id_col).type
    key_type = pa.int64() if hashed else pa.string()

    dup = _dup_key_set(ds, n, text_col, n_parts, hashed).materialize()
    dup_bytes = dup.size_bytes() or 0
    if dup_bytes <= broadcast_bytes:
        tabs = [
            t for t in ray.get(dup.to_arrow_refs()) if t.num_rows and t.num_columns
        ]
        dup_arr = (
            pa.concat_tables(tabs).column("k").combine_chunks()
            if tabs
            else pa.array([], key_type)
        )
        if hashed:
            dup_ref = ray.put(np.sort(dup_arr.to_numpy(zero_copy_only=False)))
        else:
            dup_ref = ray.put(dup_arr)

        def profile(batch: pa.Table) -> pa.Table:
            if hashed:
                kh_u, rows, _starts = _window_hashes(batch, n, text_col)
            else:
                grams, rows = _doc_ngrams(batch, n, text_col)
            if rows is None:
                return pa.table(
                    {
                        id_col: pa.array([], id_type),
                        "total_windows": pa.array([], pa.int64()),
                        "dup_windows": pa.array([], pa.int64()),
                    }
                )
            dup_keys = ray.get(dup_ref)
            if hashed:
                # int64 view on BOTH sides: searchsorted on mixed
                # int64/uint64 would upcast to float64 and lose bits
                kh = kh_u.view(np.int64)
                if len(dup_keys):
                    pos = np.searchsorted(dup_keys, kh)
                    pos[pos == len(dup_keys)] = 0
                    is_dup = dup_keys[pos] == kh
                else:
                    is_dup = np.zeros(len(kh), dtype=bool)
            else:
                is_dup = (
                    pc.is_in(grams, value_set=dup_keys)
                    .to_numpy(zero_copy_only=False)
                    if len(dup_keys)
                    else np.zeros(len(grams), dtype=bool)
                )
            present = np.unique(rows)
            remap = np.searchsorted(present, rows)
            tw = np.zeros(len(present), dtype=np.int64)
            dw = np.zeros(len(present), dtype=np.int64)
            np.add.at(tw, remap, 1)
            np.add.at(dw, remap, is_dup.astype(np.int64))
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            return pa.table(
                {
                    id_col: ids.take(pa.array(present, pa.int64())),
                    "total_windows": pa.array(tw, pa.int64()),
                    "dup_windows": pa.array(dw, pa.int64()),
                }
            )

        return ds.map_batches(profile, batch_format="pyarrow", zero_copy_batch=True)

    logger.info(
        "dup_ngram_windows: %.1f MB of duplicated windows > broadcast cap — "
        "bucketed (doc, key) join over %d partitions",
        dup_bytes / 2**20,
        n_parts,
    )
    return _dup_ngram_join_path(
        ds, n, id_col, text_col, n_parts, hashed, id_type, key_type
    )


def _dup_ngram_join_path(ds, n, id_col, text_col, n_parts, hashed, id_type, key_type):
    """Join-regime fallback for :func:`dup_ngram_windows`: shuffle per-batch
    pre-aggregated (doc, window-key, multiplicity) rows into key-hash
    buckets (global counts + per-doc dup partials in one vectorized
    map_groups), then sum the skinny partials in doc-hash buckets."""
    from .trainprep import _doc_ngrams

    def partial(batch: pa.Table) -> pa.Table:
        if hashed:
            kh_u, rows, _starts = _window_hashes(batch, n, text_col)
        else:
            grams, rows = _doc_ngrams(batch, n, text_col)
        if rows is None:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "k": pa.array([], key_type),
                    "m": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.take(pa.array(rows, pa.int64()))
        k = pa.array(kh_u.view(np.int64), pa.int64()) if hashed else grams
        t = (
            pa.TableGroupBy(pa.table({id_col: ids, "k": k}), [id_col, "k"])
            .aggregate([([], "count_all")])
            .rename_columns([id_col, "k", "m"])
        )
        kc = t.column("k")
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if hashed:
            bucket = (
                kc.to_numpy(zero_copy_only=False).view(np.uint64) % np.uint64(n_parts)
            ).astype(np.int32)
        else:
            bucket = (hash64(kc) % np.uint64(n_parts)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def bucket_stats(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "tw": pa.array([], pa.int64()),
                    "dw": pa.array([], pa.int64()),
                    "b2": pa.array([], pa.int32()),
                }
            )
        kc = group.column("k")
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        if hashed:
            codes = kc.to_numpy(zero_copy_only=False)
            uk, inv = np.unique(codes, return_inverse=True)
            nu = len(uk)
        else:
            enc = kc.dictionary_encode()
            inv = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            nu = len(enc.dictionary)
        m = group.column("m").to_numpy(zero_copy_only=False)
        tot = np.zeros(nu, dtype=np.int64)
        np.add.at(tot, inv, m)
        dup_m = np.where(tot[inv] > 1, m, 0)
        ida = group.column(id_col)
        if isinstance(ida, pa.ChunkedArray):
            ida = ida.combine_chunks()
        denc = ida.dictionary_encode()
        dinv = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uid = denc.dictionary
        tw = np.zeros(len(uid), dtype=np.int64)
        dw = np.zeros(len(uid), dtype=np.int64)
        np.add.at(tw, dinv, m)
        np.add.at(dw, dinv, dup_m)
        if pa.types.is_integer(uid.type):
            hb = hash64_ints(uid.to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            hb = hash64(uid)
        return pa.table(
            {
                id_col: uid,
                "tw": pa.array(tw, pa.int64()),
                "dw": pa.array(dw, pa.int64()),
                "b2": pa.array((hb % np.uint64(n_parts)).astype(np.int32), pa.int32()),
            }
        )

    def doc_sum(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], id_type),
                    "total_windows": pa.array([], pa.int64()),
                    "dup_windows": pa.array([], pa.int64()),
                }
            )
        return (
            pa.TableGroupBy(group.select([id_col, "tw", "dw"]), [id_col])
            .aggregate([("tw", "sum"), ("dw", "sum")])
            .rename_columns([id_col, "total_windows", "dup_windows"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pyarrow")
        .groupby("b2")
        .map_groups(doc_sum, batch_format="pyarrow")
    )


def dup_ngram_trim(
    ds,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    match: str = "exact",
    broadcast_bytes: int = 256 << 20,
):
    """The ACTION half of exact substring dedup (Lee et al. 2021): remove
    every token covered by any corpus-duplicated ``n``-gram window and
    re-join the survivors — :func:`dup_ngram_windows` tells you how
    duplicated a document is, this rewrites it.

    Output rows: (``id_col``, ``text_trim``, ``n_removed`` int64), one per
    input document (documents under ``n`` tokens pass through unchanged;
    a fully-covered document becomes the empty string, not a dropped row).

    Same key modes as the profile: ``'exact'`` probes literal window
    strings (zero collision risk — a 2^-64 hash collision here would trim
    REAL text), ``'hash'`` probes rolling token-hash keys (the web-scale
    configuration).  The duplicated-window set must fit ``broadcast_bytes``
    — on real corpora it is the boilerplate fraction, orders of magnitude
    smaller than the corpus; beyond the cap this raises rather than
    silently degrading (the join-regime rewrite would co-shuffle text and
    is intentionally not hidden behind the same name).

    NOTE: consumes ``ds`` twice (count pass, then the rewrite) — pass a
    materialized dataset or one whose lineage is cheap to re-execute (a
    plain parquet read); the CLI pins its lazy curate chain first.

    Scale shape: the count pass is the profile's (window KEYS only move);
    the rewrite is then embarrassingly parallel — one membership probe, a
    difference-array coverage cumsum, and a vectorized ListArray rebuild +
    binary_join per batch.  Corpus text never shuffles.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if match not in ("exact", "hash"):
        raise ValueError(f"match must be 'exact' or 'hash', got {match!r}")
    import ray

    from .trainprep import _doc_ngrams, _split_tokens

    hashed = match == "hash"
    id_type = ds.schema().base_schema.field(id_col).type

    n_parts = num_partitions or _auto_parts(ds, floor=32)
    dup = _dup_key_set(ds, n, text_col, n_parts, hashed).materialize()
    dup_bytes = dup.size_bytes() or 0
    if dup_bytes > broadcast_bytes:
        raise ValueError(
            f"dup_ngram_trim: duplicated-window set is {dup_bytes} bytes "
            f"(> {broadcast_bytes}) — not boilerplate-sized; raise the cap "
            "or pre-filter with dup_ngram_windows"
        )
    tabs = [t for t in ray.get(dup.to_arrow_refs()) if t.num_rows and t.num_columns]
    key_type = pa.int64() if hashed else pa.string()
    dup_arr = (
        pa.concat_tables(tabs).column("k").combine_chunks()
        if tabs
        else pa.array([], key_type)
    )
    dup_ref = ray.put(
        np.sort(dup_arr.to_numpy(zero_copy_only=False)) if hashed else dup_arr
    )

    def trim(batch: pa.Table) -> pa.Table:
        _, flat, offsets = _split_tokens(batch, text_col)
        total = len(flat)
        doc_lens = np.diff(offsets)
        ndocs = len(doc_lens)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        m = total - n + 1
        covered = np.zeros(total, dtype=bool)
        if m > 0:
            if hashed:
                keys_u, _rows, starts = _window_hashes(
                    batch, n, text_col, pre=(flat, offsets)
                )
                if starts is None:
                    starts = np.zeros(0, dtype=np.int64)
            else:
                grams, _rows = _doc_ngrams(batch, n, text_col, pre=(flat, offsets))
                from .trainprep import _window_valid

                starts = np.flatnonzero(_window_valid(offsets, n))
            if len(starts):
                dup_keys = ray.get(dup_ref)
                if hashed:
                    keys = keys_u.view(np.int64)
                    if len(dup_keys):
                        p = np.searchsorted(dup_keys, keys)
                        p[p == len(dup_keys)] = 0
                        is_dup = dup_keys[p] == keys
                    else:
                        is_dup = np.zeros(len(keys), dtype=bool)
                else:
                    is_dup = (
                        pc.is_in(grams, value_set=dup_keys).to_numpy(
                            zero_copy_only=False
                        )
                        if len(dup_keys)
                        else np.zeros(len(grams), dtype=bool)
                    )
                dstarts = starts[is_dup]
                if len(dstarts):
                    diff = np.zeros(total + 1, dtype=np.int32)
                    np.add.at(diff, dstarts, 1)
                    np.add.at(diff, dstarts + n, -1)
                    covered = np.cumsum(diff[:-1]) > 0
        kept = ~covered
        tok_doc = np.repeat(np.arange(ndocs, dtype=np.int64), doc_lens)
        kept_counts = np.bincount(tok_doc[kept], minlength=ndocs)
        new_offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        kept_flat = flat.filter(pa.array(kept))
        lst = pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), kept_flat)
        joined = pc.binary_join(lst, " ")
        return pa.table(
            {
                id_col: ids,
                "text_trim": joined,
                "n_removed": pa.array(doc_lens - kept_counts, pa.int64()),
            }
        )

    return ds.map_batches(trim, batch_format="pyarrow", zero_copy_batch=True)


def _allpairs_by_runlen(ids_sorted: np.ndarray, starts: np.ndarray, cap: int):
    """All (a < b) id pairs within each presorted run, skipping runs longer
    than ``cap``: runs are grouped BY LENGTH so the expansion is one
    matrix gather + one precomputed triu template per distinct length
    (≤ cap iterations total) — no per-run Python."""
    lens = np.diff(starts)
    out_a: list = []
    out_b: list = []
    for L in np.unique(lens):
        if L < 2 or L > cap:
            continue
        rs = starts[:-1][lens == L]
        mat = ids_sorted[rs[:, None] + np.arange(int(L))[None, :]]
        iu, ju = np.triu_indices(int(L), k=1)
        out_a.append(mat[:, iu].ravel())
        out_b.append(mat[:, ju].ravel())
    if not out_a:
        z = np.zeros(0, np.int64)
        return z, z.copy()
    return np.concatenate(out_a), np.concatenate(out_b)


def containment_cap_eff(
    ds,
    n_shingle: int = 3,
    rare_cap: int = 16,
    max_candidates: int | None = None,
    num_partitions: int | None = None,
) -> tuple[int, int]:
    """EXACT global shingle document-frequency histogram → the largest
    effective rarity cap whose predicted candidate count fits a ceiling.

    Returns ``(cap_eff, predicted_pairs)`` where ``cap_eff`` is the
    largest ``c ≤ rare_cap`` such that ``Σ_{df=2..c} n_df · C(df, 2) ≤
    max_candidates`` (``n_df`` = number of shingles with global posting
    size exactly ``df``).  The prediction is an upper bound on the
    partitioned expansion (local pair dedup only removes rows), so the
    ceiling is HARD; ``cap_eff`` can land at 1 (zero candidates) when even
    the df=2 pairs exceed the budget — deterministic, and mirrored
    verbatim by the SQL oracle (histogram → windowed cumulative → max df).

    Cost: one skinny shuffle of per-batch (shingle, clipped local count)
    folded rows — each distinct shingle travels once per batch instead of
    once per (shingle, doc) posting, and counts clip at ``rare_cap + 1``
    (a clipped count is already provably over-cap, and totals ≤ rare_cap
    are sums of unclipped values, so the histogram below the cap is
    exact)."""
    n_parts = num_partitions or _auto_parts(ds)
    pu = np.uint64(n_parts)
    clip = rare_cap + 1

    def fold(batch: pa.Table) -> pa.Table:
        t = _shingle_blob_table(batch, n_shingle, None)
        _off, dat = _blob_offsets_data(t.column("sh"))
        uniq, cnt = np.unique(dat, return_counts=True)
        return pa.table(
            {
                "sh": pa.array(uniq.view(np.int64), pa.int64()),
                "c": pa.array(
                    np.minimum(cnt, clip).astype(np.int32), pa.int32()
                ),
                "part": pa.array((uniq % pu).astype(np.int32), pa.int32()),
            }
        )

    def hist(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"df": pa.array([], pa.int32()), "n": pa.array([], pa.int64())}
        )
        if not group.num_rows or not group.num_columns:
            return empty
        sh = group.column("sh").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(sh, kind="stable")
        starts = _key_runs(sh[order])
        tot = np.minimum(np.add.reduceat(c[order], starts[:-1]), clip)
        df, n = np.unique(tot[(tot >= 2) & (tot <= rare_cap)],
                          return_counts=True)
        return pa.table(
            {
                "df": pa.array(df.astype(np.int32), pa.int32()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    parts = (
        ds.map_batches(fold, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=131072)
        .groupby("part")
        .map_groups(hist, batch_format="pyarrow")
        .take_all()
    )  # ≤ (rare_cap - 1) rows per partition — KB-sized
    counts = np.zeros(rare_cap + 1, np.int64)
    for row in parts:
        counts[int(row["df"])] += int(row["n"])
    dfs = np.arange(rare_cap + 1, dtype=np.int64)
    cum = np.cumsum(counts * (dfs * (dfs - 1) // 2))
    if max_candidates is None:
        return rare_cap, int(cum[rare_cap])
    fit = np.flatnonzero(cum <= max_candidates)
    cap_eff = int(fit[-1]) if len(fit) else 1
    cap_eff = max(cap_eff, 1)
    return min(cap_eff, rare_cap), int(cum[min(cap_eff, rare_cap)])


def containment_pairs(
    ds,
    thr_num: int = 4,
    thr_den: int = 5,
    n_shingle: int = 3,
    rare_cap: int = 16,
    num_partitions: int | None = None,
    broadcast_bytes: int = 512 << 20,
    max_candidates: int | None = None,
):
    """One-sided near-dup detection: pairs whose shingle-set CONTAINMENT
    ``|A ∩ B| / min(|A|, |B|)`` is ≥ ``thr_num / thr_den`` — the
    doc-inside-doc case (an article reposted inside a boilerplate shell,
    a quote-wrapped copy) where symmetric Jaccard stays low because the
    wrapper inflates the union, so MinHash-LSH never candidates it.

    Output rows: (doc_a, doc_b, n_common, n_small) — doc_a < doc_b, ALL
    int64 (the threshold test is the integer cross-multiply
    ``thr_den·|∩| ≥ thr_num·min``, so no float touches the result and the
    SQL mirror agrees bit-for-bit).

    Candidate generation: two docs are candidated iff they share a RARE
    shingle (global posting size in [2, rare_cap]).  A contained doc
    shares ALL its shingles with its container, so the pair is found
    unless every one of its shingles is boilerplate-frequent (> rare_cap
    docs) — the documented recall trade; frequent shingles are useless
    candidate keys (quadratic pair blowup), the same cap-bounded-bucket
    posture as the LSH paths.  Requires corpus-unique doc ids (the
    `exact_dedup` contract).

    Scale shape: the posting exchange is ONE hash-of-shingle shuffle of
    skinny (shingle, doc) rows — the `dup_ngram_windows` movement budget;
    per-partition pair expansion is vectorized run detection + a
    by-run-length triu gather; a second skinny shuffle dedups pairs
    (hash-of-pair partitions); verification reuses the candidate-only
    blob machinery with the CSR broadcast fast path and the bucketed
    join fallback above ``broadcast_bytes``.  The corpus text never
    moves.

    Candidate growth is PROVABLY LINEAR in corpus size: every posting row
    belongs to at most one rare run of length ≤ rare_cap, so expansion
    emits ≤ (rare_cap − 1)/2 pairs per posting row (7.5× at the default
    cap) no matter how pathological the shingle distribution — there is
    no quadratic regime.  ``max_candidates`` additionally bounds the
    CONSTANT: an exact global df-histogram pre-pass
    (:func:`containment_cap_eff`, one extra skinny shuffle) picks the
    largest effective cap whose predicted pair count fits the ceiling and
    the expansion runs at that cap — deterministic, SQL-mirrorable, and a
    documented recall trade exactly like ``rare_cap`` itself."""
    import ray
    import ray.data as rd

    if not (0 < thr_num <= thr_den):
        raise ValueError(
            f"containment_pairs: need 0 < thr_num <= thr_den, got "
            f"{thr_num}/{thr_den}"
        )
    if rare_cap < 2:
        raise ValueError(
            f"containment_pairs: rare_cap must be >= 2, got {rare_cap}"
        )
    cap_eff = rare_cap
    if max_candidates is not None:
        cap_eff, _pred = containment_cap_eff(
            ds, n_shingle, rare_cap, max_candidates, num_partitions
        )
    n_parts = num_partitions or _auto_parts(ds)
    pu = np.uint64(n_parts)
    tnum = np.int64(thr_num)
    tden = np.int64(thr_den)

    def post(batch: pa.Table) -> pa.Table:
        t = _shingle_blob_table(batch, n_shingle, None)
        off, dat = _blob_offsets_data(t.column("sh"))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, np.diff(off))
        # batch-local frequent fold: a shingle seen more than rare_cap
        # times in THIS BATCH ALONE is provably frequent globally (local
        # count is a lower bound), so its rows can never survive the
        # partition-side run cap — replace them with ONE weighted sentinel
        # row (w = cap+1) that still drives the run's effective length
        # over the cap.  Bit-exact equivalence; measured 73% of posting
        # rows at 1M pages never enter the shuffle.
        uniq, inv, cnt = np.unique(dat, return_inverse=True, return_counts=True)
        freq = cnt > rare_cap
        if freq.any():
            keep = ~freq[inv]
            sent = uniq[freq]
            sh_out = np.concatenate([dat[keep], sent])
            doc_out = np.concatenate(
                [doc[keep], np.zeros(len(sent), np.int64)]
            )
            w_out = np.concatenate(
                [
                    np.ones(int(keep.sum()), np.int32),
                    np.full(len(sent), rare_cap + 1, np.int32),
                ]
            )
        else:
            sh_out, doc_out = dat, doc
            w_out = np.ones(len(dat), np.int32)
        return pa.table(
            {
                "sh": pa.array(sh_out.view(np.int64), pa.int64()),
                "doc": pa.array(doc_out, pa.int64()),
                "w": pa.array(w_out, pa.int32()),
                # shingle hashes are already splitmix-mixed — their low
                # bits partition uniformly
                "part": pa.array((sh_out % pu).astype(np.int32), pa.int32()),
            }
        )

    _P2 = np.uint64(0x9E3779B97F4A7C15)

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int32()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        sh = group.column("sh").to_numpy(zero_copy_only=False)
        doc = group.column("doc").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, sh))
        sh, doc, w = sh[order], doc[order], w[order]
        starts = _key_runs(sh)
        # a run's EFFECTIVE length (sentinel weights included) is the
        # exact global posting size; runs over the cap drop whole — the
        # surviving rows are all weight-1, so pair expansion is unchanged
        lens = np.diff(starts)
        eff = np.add.reduceat(w, starts[:-1])
        keep_run = eff <= cap_eff
        if not keep_run.all():
            doc = doc[np.repeat(keep_run, lens)]
            starts = np.concatenate(
                ([0], np.cumsum(lens[keep_run]))
            ).astype(np.int64)
        a, b = _allpairs_by_runlen(doc, starts, cap_eff)
        if not len(a):
            return empty
        # local pair dedup (the same pair can arise from many shared rare
        # shingles in this partition)
        o2 = np.lexsort((b, a))
        a, b = a[o2], b[o2]
        first = np.concatenate(
            ([True], (np.diff(a) != 0) | (np.diff(b) != 0))
        )
        a, b = a[first], b[first]
        with np.errstate(over="ignore"):
            p2 = splitmix64(a.view(np.uint64) * _P2 + b.view(np.uint64))
        return pa.table(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "p2": pa.array((p2 % pu).astype(np.int32), pa.int32()),
            }
        )

    import os as _os
    import time as _time

    _trace = _os.environ.get("FEVER_RAY_TIMING")
    _t0 = _time.time()
    # NOTE: candidates are NOT globally deduped here — the same pair can
    # arise from rare shingles in two different partitions (~2% of rows at
    # 1M pages), and a full candidate-table shuffle to remove them costs
    # more than verifying them twice; duplicates verify to IDENTICAL rows
    # and the post-verify dedup below (dup-density-bounded input) is tiny.
    pairs = (
        # big post batches (~131k docs → ~6M posting rows) give the
        # batch-local frequent fold enough mass to fire: per-batch
        # expected count of a truly-frequent shingle crosses the cap, so
        # its rows fold to one sentinel (46M → 17M shuffled rows at 1M
        # pages); at cluster scale tasks ≈ blocks/8, still embarrassingly
        # parallel
        ds.map_batches(post, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=131072)
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pyarrow")
        .repartition(max(n_parts // 8, 8))
        .materialize()
    )
    if _trace:
        print(f"[containment] pairs phase: {_time.time()-_t0:.2f}s")
        _t0 = _time.time()
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_common": pa.array([], pa.int64()),
            "n_small": pa.array([], pa.int64()),
        }
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    cand_ids = _candidate_ids(pairs)
    cand_ref = ray.put(cand_ids)
    if _trace:
        print(f"[containment] candidate ids: {_time.time()-_t0:.2f}s "
              f"({len(cand_ids)} docs)")
        _t0 = _time.time()

    sh_ds = (
        ds.map_batches(
            lambda b: _shingle_blob_table(b, n_shingle, ray.get(cand_ref)),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=32768,
        )
        .repartition(max(n_parts // 8, 8))
        .materialize()
    )
    if _trace:
        print(f"[containment] blob rebuild: {_time.time()-_t0:.2f}s")

    def containment_out(batch: pa.Table, inter, la, lb) -> pa.Table:
        small = np.minimum(la, lb)
        keep = tden * inter >= tnum * small
        out = batch.select(["doc_a", "doc_b", "p2"]).filter(pa.array(keep))
        out = out.append_column("n_common", pa.array(inter[keep], pa.int64()))
        return out.append_column("n_small", pa.array(small[keep], pa.int64()))

    verified = _verify_pairs_with_blobs(
        pairs, sh_ds, containment_out, max(n_parts // 8, 8), broadcast_bytes
    )

    def final_dedup(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return empty
        a = group.column("doc_a").to_numpy(zero_copy_only=False)
        b = group.column("doc_b").to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        first = np.concatenate(
            ([True], (np.diff(a[o]) != 0) | (np.diff(b[o]) != 0))
        )
        return group.select(
            ["doc_a", "doc_b", "n_common", "n_small"]
        ).take(pa.array(o[first], pa.int64()))

    return verified.groupby("p2").map_groups(
        final_dedup, batch_format="pyarrow"
    )


def dup_cluster_sizes(ds, text_col: str = "text", num_partitions: int = 32):
    """Exact-duplicate cluster-size histogram — the audit a dedup run is
    sized from ("how much of the corpus is 2x copies vs one 10k-copy
    boilerplate blob?").  Output rows: (``cluster_size``, ``n_clusters``
    int64), cluster = byte-identical ``text_col``.

    Scale shape: ONE hash-of-content shuffle co-locates identical texts
    (the same movement budget as ``exact_dedup`` — text rows ship once);
    per bucket an Arrow hash-aggregation counts each distinct text, and
    only (size, count) pairs leave the bucket; the bounded
    counts-of-counts domain tree-combines.  No driver row data."""
    import numpy as np
    import ray

    from ..sketches.hashing import hash64
    from .aggregates import tree_groupby

    P = int(num_partitions)

    def add_bucket(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if t.null_count:
            raise ValueError(
                f"dup_cluster_sizes: {text_col} contains nulls — filter first"
            )
        h = hash64(t)
        return pa.table(
            {
                text_col: t,
                "__bucket": pa.array(
                    (h % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    def sizes_in_bucket(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table(
                {"sz": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        g = pa.TableGroupBy(group.select([text_col]), text_col).aggregate(
            [([], "count_all")]
        )
        sz = g.column("count_all").to_numpy(zero_copy_only=False)
        uk, uc = np.unique(sz, return_counts=True)
        return pa.table(
            {"sz": pa.array(uk.astype(np.int64), pa.int64()),
             "n": pa.array(uc.astype(np.int64), pa.int64())}
        )

    out = tree_groupby(
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(sizes_in_bucket, batch_format="pyarrow"),
        ["sz"],
        [("n", "sum")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        t = batch.rename_columns(["cluster_size", "n_clusters"])
        return t.take(
            pa.compute.sort_indices(t, sort_keys=[("cluster_size", "ascending")])
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _prefix_fold(arr) -> np.ndarray:
    """Big-endian uint64 fold of each string's first 8 bytes (zero-padded).
    Order-PRESERVING, not a hash: fold(a) < fold(b) implies a < b in byte
    lexicographic order, and equal folds always land in one range bucket,
    so bucketing on the fold can never split a tie group of the full-key
    sort.  Vectorized over the Arrow buffers — 8 masked gather passes, no
    per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    if arr.null_count:
        raise ValueError("_prefix_fold: nulls — coalesce keys first")
    otype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], otype)[arr.offset : arr.offset + n + 1]
    starts = off[:-1].astype(np.int64)
    lens = (off[1:] - off[:-1]).astype(np.int64)
    dbuf = arr.buffers()[2]
    data = (
        np.frombuffer(dbuf, np.uint8) if dbuf is not None else np.zeros(0, np.uint8)
    )
    out = np.zeros(n, np.uint64)
    for j in range(8):
        active = lens > j
        if not active.any():
            break
        out[active] |= data[starts[active] + j].astype(np.uint64) << np.uint64(
            8 * (7 - j)
        )
    return out


def sorted_neighbor_pairs(
    ds,
    window: int = 4,
    prefix_chars: int = 16,
    t_num: int = 1,
    t_den: int = 2,
    n_shingle: int = 3,
    n_buckets: int | None = None,
    block_rows: int = 1 << 15,
    num_partitions: int = 16,
    broadcast_bytes: int = 512 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    same_prefix: int | None = None,
):
    """Sorted-neighborhood near-dup blocking (Hernandez & Stolfo 1995, the
    record-linkage classic): sort every doc by a normalized content key
    (first ``prefix_chars`` chars of lowercased, space-stripped text, byte
    order), slide a ``window``-row window down the sorted order, and
    exact-verify each in-window pair by shingle-set Jaccard — kept iff
    ``t_den·|∩| ≥ t_num·|∪|`` with both sides non-empty (pure integers,
    bit-stable).  Output rows: (doc_a, doc_b, inter, uni), doc_a = the
    lower-SORT-RANK doc.  The blocking complement of MinHash LSH: catches
    shared-prefix boilerplate families LSH bands can miss, O(N·window)
    candidates instead of band fan-out.

    Scale shape (10^12 docs): the corpus never shuffles — a skinny
    (id, key, fold) projection is range-bucketed on an order-preserving
    8-byte fold (sample-derived split points, so buckets balance under any
    key skew; splits affect LOAD only, never output), per bucket ONE
    Arrow sort + histogram-prefix offsets assign exact dense global ranks
    (`epoch_shuffle`'s construction), and in-window pairing is a dense
    rank-block scan with a ``window−1``-row overlap duplication — every
    structure past the first pass is O(N) skinny rows.  Verification
    reuses `_verify_pairs_with_blobs` (candidate blobs broadcast under
    ``broadcast_bytes``, bucketed joins above).

    ``same_prefix`` (1..8) is the classic SNM blocking-key refinement:
    an in-window pair is a candidate only when the two keys share their
    first ``same_prefix`` characters.  Without it EVERY doc lands in
    ~window pairs and the exact verify touches the whole corpus; with it
    only same-family neighbors verify — the knob that keeps the verify
    stage candidate-sparse at web scale."""
    import ray
    import ray.data as rd

    from .aggregates import tree_groupby

    if window < 2:
        raise ValueError(
            f"sorted_neighbor_pairs: window must be >= 2, got {window}"
        )
    if prefix_chars < 1 or t_num < 0 or t_den < 1:
        raise ValueError("sorted_neighbor_pairs: bad key/threshold params")
    W = int(window)
    C = int(block_rows)
    if C < W:
        raise ValueError(
            f"sorted_neighbor_pairs: block_rows {C} must be >= window {W}"
        )
    if same_prefix is not None and not (1 <= same_prefix <= 8):
        raise ValueError(
            f"sorted_neighbor_pairs: same_prefix must be 1..8 (the fold "
            f"carries 8 key bytes), got {same_prefix}"
        )
    pf_shift = np.uint64(8 * (8 - same_prefix)) if same_prefix else None
    nb = n_buckets or _auto_parts(ds, floor=32)

    def keyed(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        norm = pc.replace_substring(
            pc.utf8_lower(pc.fill_null(txt, "")), " ", ""
        )
        key = pc.utf8_slice_codeunits(norm, 0, prefix_chars)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "k": key,
                "fold": pa.array(_prefix_fold(key), pa.uint64()),
            }
        )

    skinny = ds.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    total = skinny.count()
    empty_pairs = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
        }
    )
    if total == 0:
        return rd.from_arrow(empty_pairs)

    # sample-derived range splits: ~32 evenly-strided folds per batch →
    # balanced buckets under arbitrary key skew; output is split-invariant
    # (ranks are exact whatever the bucket boundaries)
    def fold_sample(batch: pa.Table) -> pa.Table:
        f = np.sort(batch.column("fold").to_numpy(zero_copy_only=False))
        step = max(1, len(f) // 32)
        return pa.table({"fold": pa.array(f[::step][:32], pa.uint64())})

    sample = np.sort(
        np.concatenate(
            [
                t.column("fold").to_numpy(zero_copy_only=False)
                for t in ray.get(
                    skinny.map_batches(
                        fold_sample, batch_format="pyarrow"
                    ).to_arrow_refs()
                )
                if t.num_rows and t.num_columns
            ]
        )
    )
    picks = sample[
        np.linspace(0, len(sample) - 1, num=max(nb - 1, 1)).astype(np.int64)
    ]
    splits = np.unique(picks)
    splits_ref = ray.put(splits)

    def tag_bucket(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        sp = cached_get(splits_ref)
        f = batch.column("fold").to_numpy(zero_copy_only=False)
        b = np.searchsorted(sp, f, side="right").astype(np.int32)
        return batch.append_column("bucket", pa.array(b, pa.int32()))

    bucketed = skinny.map_batches(
        tag_bucket, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,  # bundle skinny blocks before the bucket sort
    ).materialize()

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        counts = np.bincount(b, minlength=len(splits) + 1)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int32), pa.int32()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    counts_t = pa.concat_tables(
        [
            t
            for t in ray.get(
                tree_groupby(
                    bucketed.map_batches(count_partial, batch_format="pyarrow"),
                    ["bucket"],
                    [("n", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
    )
    full = np.zeros(len(splits) + 1, dtype=np.int64)
    full[counts_t.column("bucket").to_numpy(zero_copy_only=False)] = (
        counts_t.column("n").to_numpy(zero_copy_only=False)
    )
    offsets = np.zeros(len(splits) + 1, dtype=np.int64)
    np.cumsum(full[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                    "pf": pa.array([], pa.uint64()),
                }
            )
        off = cached_get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("k", "ascending"), (id_col, "ascending")]
        )
        ids = pc.take(group.column(id_col), order)
        b = int(group.column("bucket")[0].as_py())
        pos = off[b] + np.arange(group.num_rows, dtype=np.int64)
        # pf: the blocking-key prefix lane (all-zero when ungated, so the
        # pairing stage's equality test is a provable no-op then)
        if pf_shift is not None:
            fold = pc.take(group.column("fold"), order).to_numpy(
                zero_copy_only=False
            )
            pf = fold >> pf_shift
        else:
            pf = np.zeros(group.num_rows, np.uint64)
        return pa.table(
            {
                id_col: ids,
                "r": pa.array(pos, pa.int64()),
                "pf": pa.array(pf, pa.uint64()),
            }
        )

    ranked = bucketed.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )

    # dense-rank block pairing: block b owns ranks [bC, (b+1)C); rows whose
    # rank sits in the next block's first window−1 slots duplicate back so
    # every in-window pair is built exactly once, by its LOW-rank owner
    def tag_block(batch: pa.Table) -> pa.Table:
        r = batch.column("r").to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        pf = batch.column("pf").to_numpy(zero_copy_only=False)
        blk = r // C
        dup = (r % C <= W - 2) & (blk > 0)
        return pa.table(
            {
                id_col: pa.array(np.concatenate([ids, ids[dup]]), pa.int64()),
                "r": pa.array(np.concatenate([r, r[dup]]), pa.int64()),
                "pf": pa.array(np.concatenate([pf, pf[dup]]), pa.uint64()),
                "blk": pa.array(
                    np.concatenate([blk, blk[dup] - 1]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def pair_block(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        r = g.column("r").to_numpy(zero_copy_only=False)
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        pf = g.column("pf").to_numpy(zero_copy_only=False)
        o = np.argsort(r, kind="stable")
        r, ids, pf = r[o], ids[o], pf[o]
        b = int(g.column("blk")[0].as_py())
        owned = r < (b + 1) * C
        a_out, b_out = [], []
        for d in range(1, W):
            if d >= len(r):
                break
            # blocking-key gate: pf is all-zero when ungated, so the
            # equality test keeps every pair then
            ok = owned[:-d] & (pf[:-d] == pf[d:])
            a_out.append(ids[:-d][ok])
            b_out.append(ids[d:][ok])
        if not a_out:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    pairs = (
        ranked.map_batches(tag_block, batch_format="pyarrow")
        .groupby("blk")
        .map_groups(pair_block, batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty_pairs)

    cand_ids = _candidate_ids(pairs)
    cand_ref = ray.put(cand_ids)

    def blobs(batch: pa.Table) -> pa.Table:
        return _shingle_blob_table(batch, n_shingle, ray.get(cand_ref))

    sh_ds = (
        _dedup_blobs_by_id(
            ds.map_batches(blobs, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=32768),
            num_partitions,
        )
        .repartition(num_partitions)
        .materialize()
    )

    def out_fn(batch: pa.Table, inter, la, lb) -> pa.Table:
        uni = la + lb - inter
        keep = (la > 0) & (lb > 0) & (inter * t_den >= uni * t_num)
        sel = batch.select(["doc_a", "doc_b"]).filter(pa.array(keep))
        return sel.append_column(
            "inter", pa.array(inter[keep], pa.int64())
        ).append_column("uni", pa.array(uni[keep], pa.int64()))

    return _verify_pairs_with_blobs(
        pairs, sh_ds, out_fn, num_partitions, broadcast_bytes
    )


def snapshot_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    on_duplicate: str = "error",
):
    """Snapshot delta audit — the CDC complement of `latest_record`: given
    two corpus versions, emit one row per differing id with ``status`` in
    {'added', 'removed', 'changed'} (changed = content hash differs;
    identical rows emit nothing).  The incremental-recrawl primitive: what
    must re-embed / re-dedup after this crawl?

    Scale shape: each side reduces to skinny (id, content_hash) rows
    inside its first map_batches — text never shuffles; ONE id-hash
    co-partitioning of both sides together, per bucket a vectorized
    searchsorted alignment.  Duplicate ids within a side are rejected
    loudly by default (a snapshot id is a key; silently picking one
    would make the diff layout-dependent); ``on_duplicate="min_hash"``
    instead reduces each side to the per-id MINIMUM content hash — a
    commutative rule, so still layout-independent (the recrawled-twice-
    in-one-snapshot case)."""
    from ..sketches.hashing import bucket_of

    n_parts = num_partitions or _auto_parts(old_ds, floor=32)

    def skinny(side: int):
        def f(batch: pa.Table) -> pa.Table:
            if batch.column(id_col).null_count:
                raise ValueError(f"snapshot_diff: {id_col} contains nulls")
            h = add_content_hash(batch, text_col)
            ids = pc.cast(h.column(id_col), pa.int64())
            t = pa.table(
                {
                    id_col: ids,
                    "h": h.column("content_hash"),
                    "side": pa.array(
                        np.full(len(ids), side, np.int8), pa.int8()
                    ),
                }
            )
            return t.append_column(
                "bucket", pa.array(bucket_of(ids, n_parts), pa.int32())
            )

        return f

    both = old_ds.map_batches(
        skinny(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        new_ds.map_batches(skinny(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def diff_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "status": pa.array([], pa.string()),
            }
        )
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        ids = g.column(id_col).to_numpy(zero_copy_only=False)
        h = g.column("h").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        om, nm = side == 0, side == 1
        oi, oh = ids[om], h[om]
        ni, nh = ids[nm], h[nm]
        oo, no = np.argsort(oi, kind="stable"), np.argsort(ni, kind="stable")
        oi, oh, ni, nh = oi[oo], oh[oo], ni[no], nh[no]
        if on_duplicate == "min_hash":
            if len(oi):
                starts = np.flatnonzero(
                    np.concatenate(([True], oi[1:] != oi[:-1]))
                )
                oi = oi[starts]
                oh = np.minimum.reduceat(oh, starts)
            if len(ni):
                starts = np.flatnonzero(
                    np.concatenate(([True], ni[1:] != ni[:-1]))
                )
                ni = ni[starts]
                nh = np.minimum.reduceat(nh, starts)
        else:
            for a, nm_ in ((oi, "old"), (ni, "new")):
                if len(a) > 1 and (a[1:] == a[:-1]).any():
                    d = int(a[np.flatnonzero(a[1:] == a[:-1])[0]])
                    raise ValueError(
                        f"snapshot_diff: duplicate {id_col} {d} in the {nm_} "
                        "snapshot — snapshot ids must be unique "
                        "(on_duplicate='min_hash' reduces instead)"
                    )
        if len(oi):
            pos = np.minimum(np.searchsorted(oi, ni), len(oi) - 1)
            in_old = oi[pos] == ni
            hash_diff = oh[pos] != nh
        else:
            in_old = np.zeros(len(ni), bool)
            hash_diff = in_old
        added = ni[~in_old]
        changed = ni[in_old & hash_diff]
        if len(ni):
            posn = np.minimum(np.searchsorted(ni, oi), len(ni) - 1)
            in_new = ni[posn] == oi
        else:
            in_new = np.zeros(len(oi), bool)
        removed = oi[~in_new]
        out_ids = np.concatenate([added, removed, changed])
        status = np.concatenate(
            [
                np.full(len(added), "added", object),
                np.full(len(removed), "removed", object),
                np.full(len(changed), "changed", object),
            ]
        )
        if len(out_ids) == 0:
            return empty
        o = np.argsort(out_ids, kind="stable")
        return pa.table(
            {
                id_col: pa.array(out_ids[o], pa.int64()),
                "status": pa.array(status[o], pa.string()),
            }
        )

    return both.groupby("bucket").map_groups(
        diff_bucket, batch_format="pyarrow"
    )


def keeper_election(
    clusters_ds,
    meta_ds,
    priority: dict,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    attr_col: str = "source",
    num_partitions: int = 16,
    broadcast_bytes: int = 64 << 20,
):
    """Canonical-document election — the step that CLOSES a near-dedup
    pipeline: given (doc, cluster) membership rows and a source-priority
    map, keep exactly one doc per cluster under the deterministic
    (priority asc, doc_id asc) rule and report the rest as drops.
    Output rows: (``cluster_col``, ``keeper_id``, ``n_members``).

    Unknown ``attr_col`` values are a loud error (a silent default
    priority would elect nondeterministically as the map evolves).

    Scale shape: clusters are SPARSE by construction (only near-dup docs
    appear), so the (id → cluster) map broadcasts once as two sorted
    arrays under ``broadcast_bytes`` — a loud error above it, because
    falling back silently to a corpus shuffle would hide the real
    problem (a dedup that matched everything); the corpus meta table
    streams once through a searchsorted probe, and the skinny (cluster,
    prio, id) member rows take ONE coarse cluster-hash bucket shuffle +
    per-bucket lexsort first-of-run election."""
    import ray

    from ..core.bcast import cached_get
    from ..sketches.hashing import bucket_of

    mat = clusters_ds.materialize()
    if (mat.size_bytes() or 0) > broadcast_bytes:
        raise ValueError(
            "keeper_election: cluster map exceeds broadcast_bytes — the "
            "dedup matched a non-sparse fraction of the corpus; raise the "
            "cap deliberately or investigate the threshold"
        )
    tabs = [
        t
        for t in ray.get(mat.to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if not tabs:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    cluster_col: pa.array([], pa.int64()),
                    "keeper_id": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                }
            )
        )
    big = pa.concat_tables(tabs)
    ids = big.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    cl = big.column(cluster_col).to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(ids, kind="stable")
    ids_s, cl_s = ids[o], cl[o]
    # the broadcast probe returns ONE cluster per doc, so membership must
    # be a function doc -> cluster (connected components guarantee it);
    # overlapping clusters (e.g. raw LSH bands) would silently lose their
    # second membership — reject instead
    dup = np.flatnonzero(ids_s[1:] == ids_s[:-1])
    if len(dup):
        raise ValueError(
            f"keeper_election: doc {int(ids_s[dup[0]])} appears in more "
            "than one cluster — membership must be disjoint (run connected "
            "components first)"
        )
    map_ref = ray.put((ids_s, cl_s))
    prio_ref = ray.put(dict(priority))

    def members(batch: pa.Table) -> pa.Table:
        ids_s, cl_s = cached_get(map_ref)
        pr = cached_get(prio_ref)
        d = pc.cast(batch.column(id_col), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pos = np.searchsorted(ids_s, d)
        pos_c = np.minimum(pos, len(ids_s) - 1)
        hit = ids_s[pos_c] == d
        if not hit.any():
            return pa.table(
                {
                    cluster_col: pa.array([], pa.int64()),
                    "prio": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        sub = batch.filter(pa.array(hit))
        attr = sub.column(attr_col)
        if isinstance(attr, pa.ChunkedArray):
            attr = attr.combine_chunks()
        enc = attr.dictionary_encode()
        try:
            dict_prio = np.array(
                [pr[v] for v in enc.dictionary.to_pylist()], dtype=np.int64
            )
        except KeyError as e:
            raise ValueError(
                f"keeper_election: {attr_col} value {e.args[0]!r} has no "
                "priority — extend the map; a silent default would elect "
                "nondeterministically"
            ) from None
        prio = dict_prio[enc.indices.to_numpy(zero_copy_only=False)]
        clusters = cl_s[pos_c[hit]]
        return pa.table(
            {
                cluster_col: pa.array(clusters, pa.int64()),
                "prio": pa.array(prio, pa.int64()),
                id_col: pa.array(d[hit], pa.int64()),
                "bucket": pa.array(
                    bucket_of(clusters, num_partitions), pa.int32()
                ),
            }
        )

    def elect(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    cluster_col: pa.array([], pa.int64()),
                    "keeper_id": pa.array([], pa.int64()),
                    "n_members": pa.array([], pa.int64()),
                }
            )
        c = g.column(cluster_col).to_numpy(zero_copy_only=False)
        p = g.column("prio").to_numpy(zero_copy_only=False)
        d = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((d, p, c))
        cO, dO = c[order], d[order]
        starts = np.flatnonzero(
            np.concatenate(([True], cO[1:] != cO[:-1]))
        )
        n_members = np.diff(np.concatenate((starts, [len(cO)])))
        return pa.table(
            {
                cluster_col: pa.array(cO[starts], pa.int64()),
                "keeper_id": pa.array(dO[starts], pa.int64()),
                "n_members": pa.array(n_members, pa.int64()),
            }
        )

    return (
        meta_ds.map_batches(members, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(elect, batch_format="pyarrow")
    )


def source_dup_report(
    ds,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 32,
    max_groups: int = 1 << 16,
):
    """Per-source duplication audit — the release-card complement of
    `dup_cluster_sizes`: for every ``group_col`` value report
    (``n_docs``, ``n_distinct`` contents, ``n_dup_docs`` = docs beyond
    their content's first copy **within the source**) — which ingest
    feed is re-sending content?  Exact integers keyed on the engine's
    content hash.

    Scale shape: per-batch (group, hash) distinct partials → ONE coarse
    hash-keyed bucket shuffle (text never moves), per bucket vectorized
    run counting collapses to ≤ groups-per-bucket rows, then the bounded
    group domain tree-combines (loud max_groups)."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    def skinny(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if g.null_count:
            raise ValueError(f"source_dup_report: {group_col} contains nulls")
        h = add_content_hash(batch, text_col).column("content_hash")
        t = pa.table({group_col: g, "h": h})
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column("h"), num_partitions), pa.int32())
        )

    def per_bucket(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                }
            )
        g = b.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        h = b.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((h, codes))
        cO, hO = codes[order], h[order]
        first = np.concatenate(
            ([True], (cO[1:] != cO[:-1]) | (hO[1:] != hO[:-1]))
        )
        n_docs = np.bincount(cO, minlength=len(enc.dictionary))
        n_dist = np.bincount(cO[first], minlength=len(enc.dictionary))
        return pa.table(
            {
                group_col: enc.dictionary,
                "n_docs": pa.array(n_docs.astype(np.int64), pa.int64()),
                "n_distinct": pa.array(n_dist.astype(np.int64), pa.int64()),
            }
        )

    combined = tree_groupby(
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow"),
        [group_col],
        [("n_docs", "sum"), ("n_distinct", "sum")],
        max_groups=max_groups,
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table(
                {
                    group_col: pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_dup_docs": pa.array([], pa.int64()),
                }
            )
        nd = b.column("n_docs").to_numpy(zero_copy_only=False)
        ns = b.column("n_distinct").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                group_col: b.column(group_col),
                "n_docs": b.column("n_docs"),
                "n_distinct": b.column("n_distinct"),
                "n_dup_docs": pa.array(nd - ns, pa.int64()),
            }
        )

    return combined.map_batches(finish, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------- exact all-pairs simjoin
def _explode_blob_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, sh-blob) rows → skinny (tok, doc_id, set_len) rows, one per
    distinct shingle per doc, zero-copy from the packed blob buffers."""
    off, dat = _blob_offsets_data(batch.column("sh"))
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(off)
    return pa.table(
        {
            "tok": pa.array(dat.view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, lens), pa.int64()),
            "set_len": pa.array(np.repeat(lens.astype(np.int64), lens), pa.int64()),
        }
    )


def allpairs_similarity_join(
    ds,
    t_num: int = 1,
    t_den: int = 2,
    n_shingle: int = 3,
    num_partitions: int | None = None,
    max_bucket: int = 1 << 16,
    broadcast_bytes: int = 512 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """EXACT set-similarity self-join with prefix filtering (AllPairs,
    Bayardo, Ma & Srikant, WWW 2007; prefix filter per Chaudhuri et al.
    2006 / PPJoin, Xiao et al. 2008): every pair of docs whose shingle-set
    Jaccard satisfies ``t_den·|∩| ≥ t_num·|∪|`` (both sets non-empty),
    with ZERO false negatives — the exact complement of the MinHash-LSH
    path, which trades recall for speed.  Output rows: (doc_a, doc_b,
    inter, uni), doc_a < doc_b, pure integers (bit-stable on any engine).

    Prefix filter: under ANY global total order on tokens, J(A,B) ≥ t
    implies |A∩B| ≥ ⌈t·|x|⌉ for BOTH sets (if the smaller set S < t·L the
    ratio is already < t), so A and B must share a token within each
    one's first ``|x| − ⌈t·|x|⌉ + 1`` tokens — candidates are exactly the
    pairs co-occurring under some prefix token.  The order used is
    (document-frequency asc, token asc) — the canonical AllPairs order:
    prefixes hold each doc's RAREST tokens, so prefix-token buckets stay
    tiny on natural corpora.

    Scale shape (10^12 docs): the corpus tokenizes ONCE into per-doc
    sorted-unique shingle blobs (`_shingle_blob_table` — the same hashes
    the MinHash oracle mirrors); everything after is skinny ≤24-byte rows:
    (1) one tok-hash bucket shuffle computes every token's exact global df
    locally (bucketing by token makes each token's rows complete within
    one bucket — no df join), (2) one doc-hash bucket shuffle sorts each
    doc's tokens by (df, tok) and keeps the prefix, (3) one tok-hash
    bucket shuffle emits co-occurrence pairs per prefix-token run, (4) a
    pair-hash bucket dedup, (5) exact verification via the shared
    `_verify_pairs_with_blobs` core (blob broadcast under
    ``broadcast_bytes``, bucketed joins above).  Text never shuffles.
    A prefix-token bucket larger than ``max_bucket`` raises loudly
    (exactness forbids the chain-pair fallback the LSH path uses): such a
    bucket means > max_bucket docs share a rarest-token — run exact_dedup
    first or raise the cap."""
    import ray
    import ray.data as rd

    from ..sketches.hashing import bucket_of

    if not (1 <= t_num <= t_den):
        raise ValueError(
            f"allpairs_similarity_join: need 1 <= t_num <= t_den, got "
            f"{t_num}/{t_den}"
        )
    n_parts = num_partitions or _auto_parts(ds, floor=32)

    def blobs(batch: pa.Table) -> pa.Table:
        return _shingle_blob_table(batch, n_shingle, None)

    sh_ds = (
        _dedup_blobs_by_id(
            ds.map_batches(blobs, batch_format="pyarrow", zero_copy_batch=True),
            n_parts,
        )
        .repartition(max(4, n_parts // 4))
        .materialize()
    )

    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "inter": pa.array([], pa.int64()),
            "uni": pa.array([], pa.int64()),
        }
    )

    tok_rows = sh_ds.map_batches(_explode_blob_rows, batch_format="pyarrow")

    def tag_tok(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part",
            pa.array(
                bucket_of(
                    batch.column("tok").to_numpy(zero_copy_only=False), n_parts
                ),
                pa.int32(),
            ),
        )

    def df_annotate(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "tok": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "set_len": pa.array([], pa.int64()),
                }
            )
        tok = g.column("tok").to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="stable")
        starts = _key_runs(tok[order])
        lens = np.diff(starts)
        df_sorted = np.repeat(lens, lens)
        df = np.empty(len(tok), np.int64)
        df[order] = df_sorted
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "tok": g.column("tok"),
                "df": pa.array(df, pa.int64()),
                "set_len": g.column("set_len"),
            }
        )

    df_rows = (
        tok_rows.map_batches(tag_tok, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_annotate, batch_format="pyarrow")
    )

    def tag_doc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part",
            pa.array(
                bucket_of(
                    batch.column("doc_id").to_numpy(zero_copy_only=False),
                    n_parts,
                ),
                pa.int32(),
            ),
        )

    def prefix_rows(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"tok": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
            )
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tok = g.column("tok").to_numpy(zero_copy_only=False)
        df = g.column("df").to_numpy(zero_copy_only=False)
        L = g.column("set_len").to_numpy(zero_copy_only=False)
        order = np.lexsort((tok, df, doc))
        d_s, t_s, L_s = doc[order], tok[order], L[order]
        starts = _key_runs(d_s)
        lens = np.diff(starts)
        rank = np.arange(len(d_s), dtype=np.int64) - np.repeat(starts[:-1], lens)
        # prefix length |d| − ⌈t·|d|⌉ + 1, pure integers
        p = L_s - (t_num * L_s + t_den - 1) // t_den + 1
        keep = rank < p
        return pa.table(
            {
                "tok": pa.array(t_s[keep], pa.int64()),
                "doc_id": pa.array(d_s[keep], pa.int64()),
            }
        )

    prefixes = (
        df_rows.map_batches(tag_doc, batch_format="pyarrow")
        .groupby("part")
        .map_groups(prefix_rows, batch_format="pyarrow")
    )

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        tok = g.column("tok").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, tok))
        t_s, d_s = tok[order], doc[order]
        starts = _key_runs(t_s)
        lens = np.diff(starts)
        a_out, b_out = [], []
        for mi in np.nonzero(lens >= 2)[0]:
            s, e = starts[mi], starts[mi + 1]
            k = e - s
            if k > max_bucket:
                raise ValueError(
                    f"allpairs_similarity_join: {k} docs share a prefix "
                    f"token (> max_bucket={max_bucket}); exact output would "
                    f"be O(k²) pairs — exact_dedup the corpus first or "
                    f"raise max_bucket"
                )
            uids = d_s[s:e]  # unique within a run: blobs are id-deduped
            iu, ju = np.triu_indices(k, k=1)
            a_out.append(uids[iu])
            b_out.append(uids[ju])
        if not a_out:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
            }
        )

    cand = (
        prefixes.map_batches(tag_tok, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )

    def tag_pair(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        key = splitmix64(a * np.uint64(0x9E3779B97F4A7C15) + b)
        return batch.append_column(
            "part", pa.array((key % np.uint64(n_parts)).astype(np.int32), pa.int32())
        )

    def uniq_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
            )
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a_s, b_s = a[order], b[order]
        keep = np.empty(len(a_s), bool)
        keep[0] = True
        keep[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        return pa.table(
            {
                "doc_a": pa.array(a_s[keep], pa.int64()),
                "doc_b": pa.array(b_s[keep], pa.int64()),
            }
        )

    pairs = (
        cand.map_batches(tag_pair, batch_format="pyarrow")
        .groupby("part")
        .map_groups(uniq_pairs, batch_format="pyarrow")
        .repartition(max(4, n_parts // 4))
        .materialize()
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    def out(batch: pa.Table, inter, la, lb) -> pa.Table:
        uni = la + lb - inter
        keep = (t_den * inter) >= (t_num * uni)
        sel = batch.select(["doc_a", "doc_b"]).filter(pa.array(keep))
        return sel.append_column(
            "inter", pa.array(inter[keep], pa.int64())
        ).append_column("uni", pa.array(uni[keep], pa.int64()))

    return _verify_pairs_with_blobs(
        pairs, sh_ds, out, max(4, n_parts // 4), broadcast_bytes
    )


def source_overlap(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    num_partitions: int = 32,
    max_pairs: int = 1 << 20,
):
    """Cross-source shared-content matrix — which crawls/feeds duplicate
    which?  For every unordered source pair (a ≤ b): the number of
    DISTINCT contents present in both (keyed on the engine content hash);
    the diagonal (a == b) carries each source's distinct-content count,
    so per-pair Jaccard = shared / (diag_a + diag_b − shared) falls out
    and the output is non-empty even on corpora with no cross-source
    duplication.  Output rows: (src_a, src_b, shared int64).

    Scale shape: per-batch (hash, group) distinct partials (text never
    leaves the batch), ONE content-hash bucket shuffle co-locates each
    hash, per bucket a vectorized run walk over (hash, lexicographic
    group code) emits i ≤ j pair partials (run length ≤ #sources), and
    the bounded pair domain tree-combines (loud ``max_pairs``)."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    def skinny(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if g.null_count:
            raise ValueError(f"source_overlap: {group_col} contains nulls")
        h = add_content_hash(batch, text_col).column("content_hash")
        t = pa.table({group_col: g, "h": h})
        t = pa.TableGroupBy(t, [group_col, "h"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket",
            pa.array(bucket_of(t.column("h"), num_partitions), pa.int32()),
        )

    def per_bucket(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_a": pa.array([], pa.string()),
                "src_b": pa.array([], pa.string()),
                "shared": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or b.num_columns == 0:
            return empty
        t = pa.TableGroupBy(
            b.select([group_col, "h"]), [group_col, "h"]
        ).aggregate([([], "count_all")])
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        h = t.column("h").to_numpy(zero_copy_only=False)
        # lexicographic integer codes: np.unique returns sorted uniques
        u, codes = np.unique(g.astype(str), return_inverse=True)
        o = np.lexsort((codes, h))
        hs, cs = h[o], codes[o]
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(hs) != 0) + 1, [len(hs)])
        )
        run_len = np.diff(starts)
        maxlen = int(run_len.max()) if len(run_len) else 0
        pos = np.arange(len(hs), dtype=np.int64)
        rs_rep = np.repeat(starts[:-1], run_len)
        rem = np.repeat(run_len, run_len) - (pos - rs_rep)
        by_rem = np.argsort(rem, kind="stable")
        rem_sorted = rem[by_rem]
        a_parts, b_parts = [], []
        for d in range(0, maxlen):  # d = 0 emits the diagonal
            start = int(np.searchsorted(rem_sorted, d + 1, side="left"))
            if start == len(hs):
                break
            i = by_rem[start:]
            a_parts.append(cs[i])
            b_parts.append(cs[i + d])
        ca = np.concatenate(a_parts)
        cb = np.concatenate(b_parts)
        key = ca.astype(np.int64) * np.int64(len(u)) + cb
        uniq_k, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "src_a": pa.array(u[(uniq_k // len(u))], pa.string()),
                "src_b": pa.array(u[(uniq_k % len(u))], pa.string()),
                "shared": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    partials = (
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials, ["src_a", "src_b"], [("shared", "sum")], max_groups=max_pairs
    )


def template_census(
    ds,
    text_col: str = "text",
    pattern: str = "[0-9]+",
    replacement: str = "#",
    num_partitions: int = 32,
):
    """Number-blind template census: how many distinct payloads remain
    after masking every digit run — the boilerplate detector for content
    that differs only in counters/ids/timestamps (pagination shells,
    structured event payloads).  A large ``distinct_raw −
    distinct_masked`` gap means the corpus is template spam, which raw
    exact-dedup cannot see.

    Output: ONE row (n_rows, distinct_raw, distinct_masked,
    template_collapse = distinct_raw − distinct_masked), all int64.
    Masking runs RE2 (`pc.replace_substring_regex`) — the same regex
    engine DuckDB's ``regexp_replace`` uses, so a SQL mirror is
    bit-faithful.

    Scale shape: per-batch both hashes + within-batch distinct, ONE
    hash-bucket shuffle of skinny (kind, hash) pairs (text never moves),
    per-bucket distinct counts per kind, 3-row tree combine.  Row counts
    ride the same tree as a summed partial."""
    from ..sketches.hashing import bucket_of, hash64
    from .aggregates import tree_groupby

    def skinny(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        masked = pc.replace_substring_regex(
            text, pattern=pattern, replacement=replacement
        )
        hr = np.unique(hash64(text).astype(np.int64))
        hm = np.unique(hash64(masked).astype(np.int64))
        kind = np.concatenate(
            (
                np.zeros(len(hr), np.int8),
                np.ones(len(hm), np.int8),
                np.full(1, 2, np.int8),
            )
        )
        h = np.concatenate((hr, hm, np.zeros(1, np.int64)))
        cnt = np.concatenate(
            (np.zeros(len(hr) + len(hm), np.int64),
             np.full(1, batch.num_rows, np.int64))
        )
        t = pa.table(
            {
                "kind": pa.array(kind, pa.int8()),
                "h": pa.array(h, pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column("h"), num_partitions), pa.int32())
        )

    def per_bucket(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table(
                {"kind": pa.array([], pa.int8()), "n": pa.array([], pa.int64())}
            )
        kind = b.column("kind").to_numpy(zero_copy_only=False)
        h = b.column("h").to_numpy(zero_copy_only=False)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        out_k, out_n = [], []
        for kv in (0, 1):
            m = kind == kv
            if m.any():
                out_k.append(kv)
                out_n.append(len(np.unique(h[m])))
        m2 = kind == 2
        if m2.any():
            out_k.append(2)
            out_n.append(int(cnt[m2].sum()))
        return pa.table(
            {
                "kind": pa.array(np.array(out_k, np.int8), pa.int8()),
                "n": pa.array(np.array(out_n, np.int64), pa.int64()),
            }
        )

    totals = tree_groupby(
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["kind"],
        [("n", "sum")],
        max_groups=8,
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = ("n_rows", "distinct_raw", "distinct_masked",
                "template_collapse")
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        d = {int(k): int(v) for k, v in zip(kind, n)}
        raw, masked, rows = d.get(0, 0), d.get(1, 0), d.get(2, 0)
        return pa.table(
            {
                "n_rows": pa.array([rows], pa.int64()),
                "distinct_raw": pa.array([raw], pa.int64()),
                "distinct_masked": pa.array([masked], pa.int64()),
                "template_collapse": pa.array([raw - masked], pa.int64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow", batch_size=None)


def content_churn(
    ds,
    text_col: str = "text",
    ts_col: str = "ts",
    num_partitions: int = 32,
    max_days: int = 100_000,
):
    """Content churn per crawl day: for every epoch day, how many DISTINCT
    payloads appeared, and how many of those were globally FIRST seen that
    day — the recrawl-freshness audit (new_payloads / distinct_payloads ≈
    novelty rate; a collapsing rate says the crawler is refetching).
    Keyed on the engine content hash; output rows
    (day_idx, distinct_payloads, new_payloads), all int64.

    Scale shape: per-batch distinct (hash, day) partials (payload text
    never shuffles), ONE hash-bucket shuffle co-locates each hash's
    full history, per bucket one lexsort resolves both the per-day
    distinct count and each hash's first day, bounded-day tree combine."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)

    def skinny(batch: pa.Table) -> pa.Table:
        tst = batch.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"content_churn: {ts_col} must be timestamp[us], got {tst}"
            )
        if batch.column(ts_col).null_count:
            raise ValueError(f"content_churn: {ts_col} contains nulls")
        h = add_content_hash(batch, text_col).column("content_hash")
        day = np.floor_divide(
            pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({"h": h, "day": pa.array(day, pa.int64())})
        t = pa.TableGroupBy(t, ["h", "day"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column("h"), num_partitions), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "distinct_payloads": pa.array([], pa.int64()),
                    "new_payloads": pa.array([], pa.int64()),
                }
            )
        h = g.column("h").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, h))
        hs, ds_ = h[o], day[o]
        starts = _key_runs(hs, ds_)[:-1]  # distinct (hash, day)
        hp, dp = hs[starts], ds_[starts]
        h_starts = _key_runs(hp)[:-1]  # first (hash, day) per hash
        all_days, all_cnt = np.unique(dp, return_counts=True)
        new_days, new_cnt = np.unique(dp[h_starts], return_counts=True)
        newc = np.zeros(len(all_days), dtype=np.int64)
        newc[np.searchsorted(all_days, new_days)] = new_cnt
        return pa.table(
            {
                "day_idx": pa.array(all_days, pa.int64()),
                "distinct_payloads": pa.array(
                    all_cnt.astype(np.int64), pa.int64()
                ),
                "new_payloads": pa.array(newc, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials,
        ["day_idx"],
        [("distinct_payloads", "sum"), ("new_payloads", "sum")],
        max_groups=max_days,
    )


def dedup_savings(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    len_col: str | None = None,
    num_partitions: int = 32,
):
    """Dedup ROI report: ONE row (n_docs, n_distinct, bytes_total,
    bytes_after, bytes_saved) — what does exact dedup actually buy in
    storage/compute before you run it?  ``bytes_after`` keeps one copy
    per distinct content; copies of the same content have equal length,
    so the keeper's length is exact no matter which copy survives.
    Lengths come from ``len_col`` if given (pre-computed char counts),
    else ``binary_length(text_col)``.

    Scale shape: per-batch per-hash (count, length-sum, one-length)
    partials, ONE hash-bucket shuffle of skinny int rows, per-bucket
    per-hash finalize, then a 5-integer tree sum.  Text never moves."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    def skinny(batch: pa.Table) -> pa.Table:
        h = add_content_hash(batch, text_col).column("content_hash")
        if len_col is not None:
            ln = pc.cast(batch.column(len_col), pa.int64())
        else:
            ln = pc.cast(pc.binary_length(batch.column(text_col)), pa.int64())
        t = pa.table({"h": h, "ln": ln})
        g = pa.TableGroupBy(t, ["h"]).aggregate(
            [("ln", "sum"), ("ln", "min"), ([], "count_all")]
        )
        g = g.rename_columns(["h", "ln_sum", "ln_one", "n"])
        return g.append_column(
            "bucket", pa.array(bucket_of(g.column("h"), num_partitions), pa.int32())
        )

    def per_bucket(b: pa.Table) -> pa.Table:
        cols = ("n_docs", "n_distinct", "bytes_total", "bytes_after")
        if b.num_rows == 0 or b.num_columns == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        g = pa.TableGroupBy(b.select(["h", "ln_sum", "ln_one", "n"]), ["h"]).aggregate(
            [("ln_sum", "sum"), ("ln_one", "min"), ("n", "sum")]
        )
        ln_sum = g.column("ln_sum_sum").to_numpy(zero_copy_only=False)
        ln_one = g.column("ln_one_min").to_numpy(zero_copy_only=False)
        n = g.column("n_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([int(n.sum())], pa.int64()),
                "n_distinct": pa.array([g.num_rows], pa.int64()),
                "bytes_total": pa.array([int(ln_sum.sum())], pa.int64()),
                "bytes_after": pa.array([int(ln_one.sum())], pa.int64()),
            }
        )

    totals = (
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = ("n_docs", "n_distinct", "bytes_total", "bytes_after",
                "bytes_saved")
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        vals = {
            c: int(batch.column(c).to_numpy(zero_copy_only=False).sum())
            for c in ("n_docs", "n_distinct", "bytes_total", "bytes_after")
        }
        return pa.table(
            {
                "n_docs": pa.array([vals["n_docs"]], pa.int64()),
                "n_distinct": pa.array([vals["n_distinct"]], pa.int64()),
                "bytes_total": pa.array([vals["bytes_total"]], pa.int64()),
                "bytes_after": pa.array([vals["bytes_after"]], pa.int64()),
                "bytes_saved": pa.array(
                    [vals["bytes_total"] - vals["bytes_after"]], pa.int64()
                ),
            }
        )

    return totals.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def day_overlap(
    ds,
    text_col: str = "text",
    ts_col: str = "ts",
    num_partitions: int = 32,
    max_days: int = 100_000,
):
    """Day-over-day content overlap curve: for every epoch day d, the
    number of DISTINCT payloads active on d and the number also active
    on d+1 — the crawl-stability audit (shared/distinct ≈ how much of
    today's content will still be there tomorrow; a cliff marks a source
    swap or a crawler fault).  Keyed on the engine content hash.

    Output rows: (day_idx, distinct_today, shared_with_next), int64;
    one row per active day, zero-overlap days included.

    Scale shape: `content_churn`'s budget — per-batch distinct
    (hash, day) partials, ONE hash-bucket shuffle co-locates each hash's
    day set, per bucket one lexsort finds adjacent-day co-presence as
    ``same hash AND gap == 1`` runs, bounded-day tree combine."""
    from ..sketches.hashing import bucket_of
    from .aggregates import tree_groupby

    US_PER_DAY = np.int64(86_400_000_000)

    def skinny(batch: pa.Table) -> pa.Table:
        tst = batch.schema.field(ts_col).type
        if not (pa.types.is_timestamp(tst) and tst.unit == "us"):
            raise ValueError(
                f"day_overlap: {ts_col} must be timestamp[us], got {tst}"
            )
        if batch.column(ts_col).null_count:
            raise ValueError(f"day_overlap: {ts_col} contains nulls")
        h = add_content_hash(batch, text_col).column("content_hash")
        day = np.floor_divide(
            pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
                zero_copy_only=False
            ),
            US_PER_DAY,
        )
        t = pa.table({"h": h, "day": pa.array(day, pa.int64())})
        t = pa.TableGroupBy(t, ["h", "day"]).aggregate([([], "count_all")])
        t = t.drop_columns(["count_all"])
        return t.append_column(
            "bucket", pa.array(bucket_of(t.column("h"), num_partitions), pa.int32())
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    "day_idx": pa.array([], pa.int64()),
                    "distinct_today": pa.array([], pa.int64()),
                    "shared_with_next": pa.array([], pa.int64()),
                }
            )
        h = g.column("h").to_numpy(zero_copy_only=False)
        day = g.column("day").to_numpy(zero_copy_only=False)
        o = np.lexsort((day, h))
        hs, ds_ = h[o], day[o]
        starts = _key_runs(hs, ds_)[:-1]  # distinct (hash, day)
        hp, dp = hs[starts], ds_[starts]
        all_days, all_cnt = np.unique(dp, return_counts=True)
        # adjacent co-presence: consecutive distinct rows of the SAME hash
        # exactly one day apart
        both = (hp[1:] == hp[:-1]) & (np.diff(dp) == 1)
        sh_days, sh_cnt = np.unique(dp[:-1][both], return_counts=True)
        shared = np.zeros(len(all_days), dtype=np.int64)
        shared[np.searchsorted(all_days, sh_days)] = sh_cnt
        return pa.table(
            {
                "day_idx": pa.array(all_days, pa.int64()),
                "distinct_today": pa.array(all_cnt.astype(np.int64), pa.int64()),
                "shared_with_next": pa.array(shared, pa.int64()),
            }
        )

    partials = (
        ds.map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return tree_groupby(
        partials,
        ["day_idx"],
        [("distinct_today", "sum"), ("shared_with_next", "sum")],
        max_groups=max_days,
    )


def keyed_dedup(ds, key_col: str, id_col: str = "doc_id"):
    """Keep the min-id row per distinct KEY VALUE — the canonical-key
    dedup (e.g. canonical-URL dedup after ``curate.normalize_urls``:
    crawl copies of one page behind tracking junk collapse to the first
    id).  Returns (key, keep_id, n_copies).

    Scale shape: per-batch pyarrow hash-aggregation compresses each block
    to per-distinct-key (min id, count) partials before ONE keyed shuffle
    — the exchange carries distinct keys per batch, never rows.  For
    corpus-sized key domains where the key string is long, hash the key
    first (``exact_dedup``'s posture) and carry the hash."""
    from ray.data.aggregate import Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select([key_col, id_col]), key_col).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return t.select(
            [key_col, f"{id_col}_min", f"{id_col}_count"]
        ).rename_columns([key_col, "keep_id", "n_copies"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .aggregate(
            Min("keep_id", alias_name="keep_id"),
            Sum("n_copies", alias_name="n_copies"),
        )
    )


def host_boilerplate(
    ds,
    host_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 3,
    frac_num: int = 1,
    frac_den: int = 2,
    broadcast_bytes: int = 256 << 20,
    num_partitions: int | None = None,
    match: str = "exact",
):
    """HOST-scoped frequent-line removal (the RefinedWeb/CCNet per-domain
    boilerplate scrub): a line is boilerplate for a host iff it appears in
    at least ``min_docs`` DISTINCT documents of that host AND in strictly
    more than ``frac_num/frac_den`` of the host's documents; every such
    line is stripped from that host's documents only.  The same cookie
    banner on two unrelated hosts is judged independently — the per-domain
    generalization of the corpus-global :func:`line_dedup`.

    Output rows: (id_col, text_col rewritten, ``n_kept`` int64,
    ``n_dropped`` int64); documents left with no lines are dropped.  Both
    threshold tests are integer cross-multiplies (no float touches a
    decision).  With ``match='exact'`` (default) matching is exact
    (host, line)-string equality — no hash-collision false drops; with
    ``match='hash'`` the count shuffle and the boilerplate set carry
    64-bit hashes of line||sep||host instead of strings (the web-scale
    configuration, same trade :func:`line_dedup` documents: ~n²/2⁶⁴
    collision false-drop risk).  Either way the result is a pure function
    of the corpus, independent of partitioning.

    Scale shape (10^12 docs): pass 1 ships per-batch-combined partials
    only — distinct (host, line) pairs with their distinct-doc counts
    (within-doc duplicate lines collapse before anything moves) plus one
    (host, n_docs) row per host per batch.  Stage-1 buckets by line-key
    hash (skew-free) and fuses the ``min_docs`` prune, so stage 2 —
    bucketed by host hash to marry candidates with their host totals —
    carries only already-frequent candidates plus tiny host rows.  The
    final boilerplate set broadcasts once (``ray.put``) and the scrub pass
    is one vectorized membership probe + offset rebuild per batch; corpus
    text never shuffles.  A boilerplate set beyond ``broadcast_bytes``
    raises loudly — the bucketed-join fallback shape is the one
    :func:`line_dedup` already implements.
    """
    import ray

    from ..sketches.hashing import hash64

    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    if frac_num < 0 or frac_den < 1:
        raise ValueError(f"bad frac {frac_num}/{frac_den}")
    if match not in ("exact", "hash"):
        raise ValueError(f"match must be 'exact' or 'hash', got {match!r}")
    hashed = match == "hash"
    n_parts = num_partitions or _auto_parts(ds, floor=32)
    n2 = max(32, n_parts // 4)

    def _key(ln: pa.Array, src: pa.Array) -> pa.Array:
        # line||sep||host is injective: lines cannot contain the sep they
        # were split on, so the first sep always delimits the line part
        return pc.binary_join_element_wise(ln, src, sep)

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if hashed:
            empty = pa.table({
                "sh": pa.array([], pa.int64()),
                "kh": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "is_count": pa.array([], pa.int8()),
                "bucket": pa.array([], pa.int32()),
            })
        else:
            empty = pa.table({
                "src": pa.array([], pa.string()),
                "ln": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "is_count": pa.array([], pa.int8()),
                "bucket": pa.array([], pa.int32()),
            })
        if n == 0:
            return empty
        _, flat, offsets = _split_lines(batch, text_col, sep)
        doc_lens = np.diff(offsets)
        row = np.repeat(np.arange(n, dtype=np.int64), doc_lens)
        src = batch.column(host_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = pc.fill_null(pc.cast(src, pa.string()), "")
        sd = src.dictionary_encode()
        scode = sd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ld = flat.dictionary_encode()
        codes = ld.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        K = max(1, len(ld.dictionary))
        # per-doc distinct lines, then distinct-doc counts per (host, line)
        up = np.unique(row * K + codes)
        ucode = up % K
        skey = scode[up // K] * K + ucode
        uk, cnt = np.unique(skey, return_counts=True)
        ln_arr = ld.dictionary.take(pa.array(uk % K, pa.int64()))
        src_arr = sd.dictionary.take(pa.array(uk // K, pa.int64()))
        hs, hc = np.unique(scode, return_counts=True)
        hsrc = sd.dictionary.take(pa.array(hs, pa.int64()))
        if hashed:
            # only hashed keys of the DEDUPED pairs ever move: the key is
            # computed on <= distinct-(host,line)-per-batch strings locally
            kh = hash64(_key(ln_arr, src_arr)).view(np.int64)
            sh_dict = hash64(sd.dictionary).view(np.int64)
            sh_lines = sh_dict[uk // K]
            lines_t = pa.table({
                "sh": pa.array(sh_lines, pa.int64()),
                "kh": pa.array(kh, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
                "is_count": pa.array(np.zeros(len(uk), np.int8), pa.int8()),
                "bucket": pa.array(
                    (kh.view(np.uint64) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            })
            shh = sh_dict[hs]
            hosts_t = pa.table({
                "sh": pa.array(shh, pa.int64()),
                "kh": pa.array(np.zeros(len(hs), np.int64), pa.int64()),
                "n": pa.array(hc, pa.int64()),
                "is_count": pa.array(np.ones(len(hs), np.int8), pa.int8()),
                "bucket": pa.array(
                    (shh.view(np.uint64) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            })
            return pa.concat_tables([lines_t, hosts_t])
        lb = (hash64(_key(ln_arr, src_arr)) % np.uint64(n_parts)).astype(np.int32)
        lines_t = pa.table({
            "src": src_arr,
            "ln": ln_arr,
            "n": pa.array(cnt, pa.int64()),
            "is_count": pa.array(np.zeros(len(uk), np.int8), pa.int8()),
            "bucket": pa.array(lb, pa.int32()),
        })
        hb = (hash64(hsrc) % np.uint64(n_parts)).astype(np.int32)
        hosts_t = pa.table({
            "src": hsrc,
            "ln": pa.array([""] * len(hs), pa.string()),
            "n": pa.array(hc, pa.int64()),
            "is_count": pa.array(np.ones(len(hs), np.int8), pa.int8()),
            "bucket": pa.array(hb, pa.int32()),
        })
        return pa.concat_tables([lines_t, hosts_t])

    kc, sc = ("kh", "sh") if hashed else ("ln", "src")
    ktype = pa.int64() if hashed else pa.string()

    def _empty_cand() -> pa.Table:
        return pa.table({
            sc: pa.array([], ktype),
            kc: pa.array([], ktype),
            "n": pa.array([], pa.int64()),
            "is_count": pa.array([], pa.int8()),
        })

    def combine1(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return _empty_cand()
        t = pa.TableGroupBy(
            group.select([sc, kc, "is_count", "n"]), [sc, kc, "is_count"]
        ).aggregate([("n", "sum")]).rename_columns([sc, kc, "is_count", "n"])
        isc = t.column("is_count")
        nn = t.column("n")
        # fuse the min_docs prune for line rows; host rows pass through
        keep = pc.or_(
            pc.equal(isc, pa.scalar(1, pa.int8())),
            pc.greater_equal(nn, min_docs),
        )
        t = t.filter(keep)
        out = t.select([sc, kc, "n", "is_count"])
        scol = out.column(sc)
        if isinstance(scol, pa.ChunkedArray):
            scol = scol.combine_chunks()
        if hashed:
            b2 = (
                scol.to_numpy(zero_copy_only=False).view(np.uint64)
                % np.uint64(n2)
            ).astype(np.int32)
        else:
            b2 = (hash64(scol) % np.uint64(n2)).astype(np.int32)
        return out.append_column("bucket", pa.array(b2, pa.int32()))

    def combine2(group: pa.Table) -> pa.Table:
        empty = pa.table({sc: pa.array([], ktype), kc: pa.array([], ktype)})
        if group.num_rows == 0 or group.num_columns == 0:
            return empty
        isc = group.column("is_count").to_numpy(zero_copy_only=False)
        hosts = group.filter(pa.array(isc == 1))
        cands = group.filter(pa.array(isc == 0))
        if cands.num_rows == 0 or hosts.num_rows == 0:
            return empty
        nd = cands.column("n").to_numpy(zero_copy_only=False)
        # every candidate's host row is in this bucket by construction
        if hashed:
            hsh = hosts.column(sc).to_numpy(zero_copy_only=False)
            order = np.argsort(hsh)
            hsh_s = hsh[order]
            hd_s = hosts.column("n").to_numpy(zero_copy_only=False)[order]
            pos = np.searchsorted(hsh_s, cands.column(sc).to_numpy(zero_copy_only=False))
            keep = frac_den * nd > frac_num * hd_s[pos]
        else:
            hsrc = hosts.column(sc)
            if isinstance(hsrc, pa.ChunkedArray):
                hsrc = hsrc.combine_chunks()
            hd = hosts.column("n").to_numpy(zero_copy_only=False)
            idx = pc.index_in(cands.column(sc), value_set=hsrc)
            idxn = idx.to_numpy(zero_copy_only=False)
            keep = frac_den * nd > frac_num * hd[idxn]
        out = cands.filter(pa.array(keep))
        return out.select([sc, kc])

    bp = (
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=32768)
        .groupby("bucket")
        .map_groups(combine1, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine2, batch_format="pyarrow")
        .materialize()
    )
    bp_bytes = bp.size_bytes() or 0
    if bp_bytes > broadcast_bytes:
        raise RuntimeError(
            f"host_boilerplate: boilerplate set {bp_bytes / 2**20:.1f} MB "
            f"exceeds the broadcast cap {broadcast_bytes / 2**20:.1f} MB; "
            "raise broadcast_bytes or add a bucketed-join scrub (the shape "
            "line_dedup's join fallback implements)"
        )
    tabs = [
        t for t in ray.get(bp.to_arrow_refs()) if t.num_rows and t.num_columns
    ]
    if tabs and hashed:
        bpt = pa.concat_tables(tabs)
        keys = np.sort(
            bpt.column("kh").combine_chunks().to_numpy(zero_copy_only=False)
            if isinstance(bpt.column("kh"), pa.ChunkedArray)
            else bpt.column("kh").to_numpy(zero_copy_only=False)
        )
    elif hashed:
        keys = np.array([], dtype=np.int64)
    elif tabs:
        bpt = pa.concat_tables(tabs)
        keys = _key(
            bpt.column("ln").combine_chunks()
            if isinstance(bpt.column("ln"), pa.ChunkedArray)
            else bpt.column("ln"),
            bpt.column("src").combine_chunks()
            if isinstance(bpt.column("src"), pa.ChunkedArray)
            else bpt.column("src"),
        )
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
    else:
        keys = pa.array([], pa.string())
    bp_ref = ray.put(keys)

    def scrub(batch: pa.Table) -> pa.Table:
        bp_set = ray.get(bp_ref)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        src = batch.column(host_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        src = pc.fill_null(pc.cast(src, pa.string()), "")
        _, flat, offsets = _split_lines(batch, text_col, sep)
        doc_lens = np.diff(offsets)
        if len(bp_set):
            row = np.repeat(np.arange(batch.num_rows, dtype=np.int64), doc_lens)
            srep = src.take(pa.array(row, pa.int64()))
            keyed = _key(flat, srep)
            if hashed:  # sorted int64-view keys → searchsorted probes
                lh = hash64(keyed).view(np.int64)
                pos = np.searchsorted(bp_set, lh)
                pos[pos == len(bp_set)] = 0
                keep_np = bp_set[pos] != lh
                keep = pa.array(keep_np)
            else:
                keep = pc.invert(pc.is_in(keyed, value_set=bp_set))
                keep_np = keep.to_numpy(zero_copy_only=False)
        else:
            keep = pa.array(np.ones(len(flat), dtype=bool))
            keep_np = np.ones(len(flat), dtype=bool)
        ck = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(keep_np, out=ck[1:])
        n_kept = ck[offsets[1:]] - ck[offsets[:-1]]
        new_off = np.zeros(batch.num_rows + 1, dtype=np.int64)
        np.cumsum(n_kept, out=new_off[1:])
        la = pa.ListArray.from_arrays(
            pa.array(new_off, pa.int32()), flat.filter(keep)
        )
        out = pa.table({
            id_col: ids,
            text_col: pc.binary_join(la, sep),
            "n_kept": pa.array(n_kept, pa.int64()),
            "n_dropped": pa.array(doc_lens - n_kept, pa.int64()),
        })
        return out.filter(pa.array(n_kept > 0))

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def minhash_encode(
    ds,
    n_shingle: int = 3,
    num_perm: int = 64,
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Compute-once MinHash signature storage: (id_col, ``mh_sig``
    fixed_size_binary(num_perm·8)) per document — the signature pass is
    the dominant cost of near-dedup over raw text, so incremental
    pipelines store signatures once and re-derive LSH candidates from
    them on every later run/snapshot (the ``pq_encode`` posture applied
    to dedup).  Docs too short to shingle are DROPPED (same contract as
    the inline path — they cannot near-dup match anything).

    One streaming pass, no shuffle; packing is a zero-copy buffer view."""
    from ..sketches.minhash import batch_minhash_signatures

    def enc(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        sigs = batch_minhash_signatures(
            batch.column(text_col), n=n_shingle, num_perm=num_perm, seed=seed
        )
        has_sig = sigs[:, 0] != np.iinfo(np.uint64).max
        ids = ids.filter(pa.array(has_sig))
        sigs = np.ascontiguousarray(sigs[has_sig])
        arr = pa.Array.from_buffers(
            pa.binary(num_perm * 8), len(sigs),
            [None, pa.py_buffer(sigs.tobytes())],
        )
        return pa.table({id_col: ids, "mh_sig": arr})

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def minhash_band_rows_from_sigs(
    sig_ds, num_perm: int = 64, bands: int = 16, id_col: str = "doc_id"
):
    """Stored signatures → (band, band_hash, doc_id) rows BIT-EQUAL to
    the inline ``MinHashSignatures`` stage (both fold through
    ``_band_fold``), so every downstream pair/verify stage is shared."""
    assert num_perm % bands == 0
    rows = num_perm // bands

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch.column("mh_sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = col.buffers()[1]
        off = col.offset * num_perm * 8
        sigs = np.frombuffer(buf, dtype=np.uint64)[
            off // 8: off // 8 + len(col) * num_perm
        ].reshape(len(col), num_perm)
        acc = _band_fold(sigs, bands, rows)
        n_docs = len(ids)
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n_docs),
                    type=pa.int32(),
                ),
                "band_hash": pa.array(
                    acc.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            }
        )

    return sig_ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def minhash_candidates_from_sigs(
    sig_ds,
    num_perm: int = 64,
    bands: int = 16,
    n_parts: int | None = None,
    max_bucket: int = 8192,
    cross_only: bool = False,
    id_col: str = "doc_id",
):
    """LSH candidate pairs from STORED signatures — identical output to
    :func:`minhash_candidate_pairs` over the same corpus (pytest asserts),
    without touching any text: the re-run cost of incremental near-dedup
    drops from re-shingling the corpus to streaming 8·num_perm-byte rows."""
    band_rows = minhash_band_rows_from_sigs(
        sig_ds, num_perm=num_perm, bands=bands, id_col=id_col
    )
    if n_parts is None:
        n_parts = _auto_parts(sig_ds)
    return _pairs_from_band_rows(band_rows, n_parts, max_bucket, cross_only)


def hamming_cross_pairs(
    new_codes, ref_codes, max_hamming: int = 3, n_parts: int | None = None,
    max_bucket: int = 8192, n_bands: int | None = None,
    id_col: str = "doc_id", code_col: str = "code",
):
    """Incremental 64-bit-code near-dup: pairs between a NEW batch and an
    already-ingested REFERENCE code store — `minhash_cross_dedup`'s shape
    for the fingerprint family (image pHash / audio / SimHash codes are
    tiny durable artifacts; store them once, match every new crawl batch
    against history without re-reading any payload).

    Same banded machinery as `hamming_code_pairs`, with a side tag: only
    (new, ref) pairs emit — new×new and ref×ref are the respective
    self-dedup jobs' business.  Output: (doc_a=new id, doc_b=ref id,
    hamming), min-reduced over bands.

    ``n_bands`` defaults to the minimal pigeonhole banding (the
    `hamming_code_pairs` rule — extra bands are provably redundant and
    narrow the band keys into the quadratic-bucket regime at scale)."""
    if n_bands is None:
        n_bands = next(
            b for b in (1, 2, 4, 8, 16, 32, 64) if b >= max_hamming + 1
        )
    if 64 % n_bands:
        raise ValueError(f"hamming_cross_pairs: n_bands must divide 64, got {n_bands}")
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"hamming_cross_pairs: n_bands={n_bands} cannot guarantee recall "
            f"at max_hamming={max_hamming} (pigeonhole needs >= "
            f"{max_hamming + 1} bands)"
        )
    band_bits = 64 // n_bands
    if n_parts is None:
        n_parts = max(_auto_parts(new_codes), _auto_parts(ref_codes))

    def band_rows(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            fps = (
                batch.column(code_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
                .view(np.uint64)
            )
            n_docs = len(ids)
            bands = np.arange(n_bands, dtype=np.uint64)
            mask = np.uint64((1 << band_bits) - 1)
            with np.errstate(over="ignore"):
                keys = (
                    fps[:, None] >> (bands[None, :] * np.uint64(band_bits))
                ) & mask
            return pa.table(
                {
                    "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
                    "band": pa.array(
                        np.tile(np.arange(n_bands, dtype=np.int32), n_docs),
                        pa.int32(),
                    ),
                    "band_key": pa.array(
                        keys.reshape(-1).astype(np.int64), pa.int64()
                    ),
                    "code": pa.array(
                        np.repeat(fps.view(np.int64), n_bands), pa.int64()
                    ),
                    "side": pa.array(
                        np.full(n_docs * n_bands, side, np.int8), pa.int8()
                    ),
                }
            )

        return fn

    rows = new_codes.map_batches(
        band_rows(0), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    ).union(
        ref_codes.map_batches(
            band_rows(1), batch_format="pyarrow", zero_copy_batch=True,
            batch_size=32768,
        )
    )

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch.column("band_key").to_numpy(zero_copy_only=False)
        part = (bk.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def verify_partition(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        order = pc.sort_indices(
            group,
            sort_keys=[("band", "ascending"), ("band_key", "ascending"),
                       ("side", "ascending"), ("doc_id", "ascending")],
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bk = g.column("band_key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        fps = g.column("code").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        a_out, b_out, d_out = [], [], []
        n_over = over_rows = 0
        starts = _key_runs(band, bk)
        lens = np.diff(starts)
        for mi in np.nonzero(lens >= 2)[0]:
            s, e = starts[mi], starts[mi + 1]
            # side-sorted run: new rows first, then ref rows
            ns = int(np.searchsorted(side[s:e], 1))
            nr = (e - s) - ns
            if not ns or not nr:
                continue
            if ns * nr > max_bucket * max_bucket:
                # boilerplate band both sides: cap via the chain rule —
                # pair each new row with ONE adjacent ref row
                n_over += 1
                over_rows += e - s
                k = min(ns, nr)
                na, rb = ids[s : s + k], ids[s + ns : s + ns + k]
                da = hamming_distance(fps[s : s + k], fps[s + ns : s + ns + k])
                keep = da <= max_hamming
                if keep.any():
                    a_out.append(na[keep])
                    b_out.append(rb[keep])
                    d_out.append(da[keep])
                continue
            iu, ju = np.meshgrid(
                np.arange(ns), np.arange(nr), indexing="ij"
            )
            iu, ju = iu.ravel(), ju.ravel()
            da = hamming_distance(fps[s + iu], fps[s + ns + ju])
            keep = da <= max_hamming
            if keep.any():
                a_out.append(ids[s + iu][keep])
                b_out.append(ids[s + ns + ju][keep])
                d_out.append(da[keep])
        if n_over:
            logger.warning(
                "hamming cross bands: %d bucket(s) over the pair cap "
                "(%d rows total) fell back to chain pairing", n_over, over_rows,
            )
        if not a_out:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), pa.int64()),
                "hamming": pa.array(
                    np.concatenate(d_out).astype(np.int64), pa.int64()
                ),
            }
        )

    pairs = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    return _hamming_pair_reduce(pairs, n_parts)
