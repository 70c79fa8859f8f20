"""Training-set preparation operators: benchmark decontamination and
context-window chunking.

Both operate on whitespace-token documents (the same token model as
``ops.textstats`` / the MinHash shingles) and are pure map_batches kernels —
no shuffle, no driver-side state beyond one broadcast benchmark set.

Scale notes (10^12 docs):

* ``decontaminate`` — the eval-benchmark n-gram blocklist every serious
  pretraining mix applies (drop any document sharing an n-gram with a
  held-out benchmark).  The benchmark side is SMALL by nature (eval suites
  are MBs); its unique n-gram strings are broadcast once via ``ray.put``
  and each corpus batch does one vectorized C++ set-membership probe
  (``pyarrow.compute.is_in``) over its n-grams.  Exact string matching —
  no hash-collision false positives — and the corpus side never shuffles.
* ``chunk_documents`` — fixed-size sliding token windows (size ``chunk``,
  overlap ``overlap``), the context-window prep step for embedding /
  training jobs.  Output rows are (doc_id, chunk_id, chunk_text, n_tokens).
  The kernel never re-joins tokens: chunk strings are gathered straight
  out of the original text buffer by byte range (tokens are
  single-space-separated, so token byte offsets are one cumsum), giving
  O(output bytes) per batch with no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "benchmark_ngram_set",
    "decontaminate",
    "chunk_documents",
    "epoch_shuffle",
    "pack_sequences",
    "token_budget_select",
]


def _split_tokens(batch: pa.Table, text_col: str):
    """Whitespace-split of ``text_col`` → (flat tokens StringArray,
    per-doc token offsets int64[nrows+1])."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.cast(text, pa.string())
    if text.null_count:  # null text behaves as empty (one '' token)
        text = text.fill_null("")
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return text, toks.flatten(), offsets - offsets[0]


def _window_valid(offsets: np.ndarray, n: int):
    """Boolean mask over flat window-start positions [0, total-n]: True iff
    the n-token window starting there lies wholly inside one document —
    THE single definition both the string-gram and rolling-hash window
    paths (and the trim rewrite) share, so their index spaces can never
    drift apart.  Total-safe: fewer than n tokens overall yields the empty
    mask (a negative slice bound would otherwise silently return a
    wrong-length array)."""
    doc_lens = np.diff(offsets)
    total = int(offsets[-1])
    if total < n:
        return np.zeros(0, dtype=bool)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], doc_lens)
    return (pos_in_doc <= np.repeat(doc_lens, doc_lens) - n)[: total - n + 1]


def _doc_ngrams(batch: pa.Table, n: int, text_col: str, pre=None):
    """All word n-grams of a batch → (grams StringArray, row index of each
    gram int64).  Documents with fewer than ``n`` tokens emit nothing (a
    sub-n-gram document cannot be contaminated — mirrors the SQL oracle's
    empty ``range``).  Same positional-join construction as
    ``textstats._gram_counts``.  ``pre`` = an already-computed
    ``(flat tokens, offsets)`` pair to skip re-tokenizing."""
    if pre is not None:
        flat, offsets = pre
    else:
        _, flat, offsets = _split_tokens(batch, text_col)
    doc_lens = np.diff(offsets)
    total = len(flat)
    if total < n:
        return None, None
    parts = [flat.slice(j, total - n + 1) for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = pc.binary_join_element_wise(grams, p, " ")
    valid = _window_valid(offsets, n)
    if not valid.any():
        return None, None
    rows = np.repeat(np.arange(len(doc_lens), dtype=np.int64), doc_lens)[
        : total - n + 1
    ][valid]
    return grams.filter(pa.array(valid)), rows


def benchmark_ngram_set(ds, n: int = 8, text_col: str = "text") -> pa.Array:
    """Unique word n-grams of a (small) benchmark dataset, as one Arrow
    string array ready to broadcast.

    Partial-unique per batch, union on the driver — the shuffle-free shape
    for a side that is MBs (eval benchmarks), NOT for corpus-scale inputs."""
    pieces = []

    def partial(batch: pa.Table) -> pa.Table:
        grams, _ = _doc_ngrams(batch, n, text_col)
        if grams is None:
            return pa.table({"g": pa.array([], pa.string())})
        return pa.table({"g": pc.unique(grams)})

    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            pieces.append(b.column("g").combine_chunks())
    if not pieces:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_arrays(pieces))


def decontaminate(
    ds,
    benchmark_grams,
    n: int = 8,
    text_col: str = "text",
    mode: str = "drop",
):
    """Remove (or flag) every document sharing at least one word ``n``-gram
    with a benchmark set — the test-set-contamination scrub applied before
    training.

    ``benchmark_grams`` is the output of :func:`benchmark_ngram_set` (an
    Arrow string array) or an ``ObjectRef`` to one.  ``mode='drop'`` filters
    contaminated documents out; ``mode='flag'`` appends a boolean
    ``contaminated`` column instead (for auditing / inverse selection).

    Matching is EXACT string membership (``pc.is_in`` against the broadcast
    set) — a hash pre-filter would risk collision false-drops, and the
    benchmark side is small enough that the exact set broadcasts whole."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be 'drop' or 'flag', got {mode!r}")
    import ray

    ref = (
        benchmark_grams
        if isinstance(benchmark_grams, ray.ObjectRef)
        else ray.put(benchmark_grams)
    )

    def scrub(batch: pa.Table) -> pa.Table:
        value_set = ray.get(ref)
        hit_rows = np.zeros(batch.num_rows, dtype=bool)
        if len(value_set):
            grams, rows = _doc_ngrams(batch, n, text_col)
            if grams is not None:
                hits = pc.is_in(grams, value_set=value_set)
                hit_rows[np.unique(rows[hits.to_numpy(zero_copy_only=False)])] = True
        if mode == "flag":
            return batch.append_column("contaminated", pa.array(hit_rows))
        return batch.filter(pa.array(~hit_rows))

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def _gather_byte_ranges(
    values: np.ndarray, starts: np.ndarray, lengths: np.ndarray
) -> pa.Array:
    """Build a StringArray whose i-th element is ``values[starts[i] :
    starts[i]+lengths[i]]`` — one vectorized gather (no per-row Python).

    The gather index is the classic repeat/cumsum range-expansion: for each
    output element, indices start[i], start[i]+1, … are generated by one
    np.arange over the total output size plus per-element offsets."""
    out_offsets = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(lengths, out=out_offsets[1:])
    total = int(out_offsets[-1])
    if total == 0:
        return pa.array([""] * len(starts), pa.string())
    # delta[k] jumps from the end of range k-1 to the start of range k;
    # np.add.at because zero-length elements stack boundaries on one index
    # (the deltas telescope, so summing them lands on the right start)
    idx = np.ones(total, dtype=np.int64)
    idx[0] = starts[0]
    nz = out_offsets[1:-1]  # boundaries between consecutive output elements
    keep = nz < total
    np.add.at(idx, nz[keep], (starts[1:] - starts[:-1] - lengths[:-1])[keep])
    np.cumsum(idx, out=idx)
    data = values[idx]
    if out_offsets[-1] <= np.iinfo(np.int32).max:
        return pa.StringArray.from_buffers(
            len(starts),
            pa.py_buffer(out_offsets.astype(np.int32).tobytes()),
            pa.py_buffer(data.tobytes()),
        )
    return pa.LargeStringArray.from_buffers(
        len(starts), pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(data.tobytes())
    )


def chunk_documents(
    ds,
    chunk: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Explode each document into fixed-size sliding token windows —
    (doc_id, chunk_id, chunk_text, n_tokens) rows with window size
    ``chunk`` and stride ``chunk - overlap``.

    Window starts are 0, S, 2S, …; a document of L tokens yields
    ``1`` window if L ≤ chunk else ``(L - chunk + S - 1) // S + 1`` (every
    token is covered; the last window may be shorter than ``chunk``).
    Deterministic, order-free, embarrassingly parallel — the one subtlety
    is the string kernel: chunk text is gathered from the ORIGINAL text
    buffer by byte range (token start bytes are one cumsum of token length
    + 1 separator), never by re-joining token arrays."""
    if chunk <= 0:
        raise ValueError(f"chunk must be positive, got {chunk}")
    if not 0 <= overlap < chunk:
        raise ValueError(f"overlap must be in [0, chunk), got {overlap}")
    stride = chunk - overlap

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text, flat, offsets = _split_tokens(batch, text_col)
        doc_lens = np.diff(offsets)  # ≥1: '' splits to ['']
        tok_bytes = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # byte offset of each token within its document: global cumsum of
        # (token bytes + 1 separator), re-based per document
        gcum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(tok_bytes + 1, out=gcum[1:])
        tok_start_in_doc = gcum[:-1] - np.repeat(gcum[offsets[:-1]], doc_lens)

        n_chunks = np.where(
            doc_lens <= chunk, 1, (doc_lens - chunk + stride - 1) // stride + 1
        ).astype(np.int64)
        row = np.repeat(np.arange(len(doc_lens), dtype=np.int64), n_chunks)
        cstart = np.zeros(len(n_chunks) + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=cstart[1:])
        chunk_id = np.arange(int(cstart[-1]), dtype=np.int64) - np.repeat(
            cstart[:-1], n_chunks
        )
        tok_a = chunk_id * stride
        tok_b = np.minimum(tok_a + chunk, doc_lens[row])

        # byte range of [tok_a, tok_b) within each document, then rebased to
        # the text array's value buffer
        ga = offsets[:-1][row] + tok_a
        gb = offsets[:-1][row] + tok_b - 1
        byte_a = tok_start_in_doc[ga]
        byte_b = tok_start_in_doc[gb] + tok_bytes[gb]
        # StringArray exposes no .offsets property — read the raw int32
        # offsets buffer (values are absolute into the data buffer, so the
        # array's slice offset only shifts WHERE we read, not what we add)
        text_off = np.frombuffer(text.buffers()[1], dtype=np.int32)[
            text.offset : text.offset + len(text) + 1
        ].astype(np.int64)
        doc_base = text_off[:-1][row]
        buf = np.frombuffer(text.buffers()[2], dtype=np.uint8)
        chunk_text = _gather_byte_ranges(buf, doc_base + byte_a, byte_b - byte_a)

        return pa.table(
            {
                id_col: pc.take(ids, pa.array(row, pa.int64())),
                "chunk_id": pa.array(chunk_id, pa.int64()),
                "chunk_text": chunk_text,
                "n_tokens": pa.array(tok_b - tok_a, pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

def _bucket_of(ids: pa.Array, seed: int, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(hash, bucket) for an int id column: bucket = top log2(n_buckets)
    bits of the splitmix64 id-hash, so bucket order == hash order (bucket i
    holds a contiguous keyspace slice below bucket i+1)."""
    from ..sketches.hashing import hash64_ints

    h = hash64_ints(ids.to_numpy(zero_copy_only=False), seed=seed)
    if n_buckets == 1:  # >> 64 is undefined; one bucket means bucket 0
        return h, np.zeros(len(h), dtype=np.int32)
    shift = np.uint64(64 - int(n_buckets).bit_length() + 1)
    return h, (h >> shift).astype(np.int32)


def _check_pow2(n_buckets: int) -> None:
    if n_buckets < 1 or n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")


def epoch_shuffle(ds, seed: int = 0, n_buckets: int = 1024, id_col: str = "doc_id"):
    """Deterministic seeded global shuffle order — THE training-epoch
    primitive: every document gets an exact global ordinal ``shuffle_pos``
    equal to its rank under ``(splitmix64(id, seed), id)``.  A different
    ``seed`` is a fresh epoch permutation; the mapping is a pure function of
    (id, seed) — independent of block layout, cluster size and resume point.

    Output rows: (id_col, shuffle_pos int64).

    Scale shape (10^12 docs): the corpus text NEVER moves — only a skinny
    (id, hash, bucket) projection is shuffled.  Exact global ranks come from
    the classic histogram-prefix construction:

    1. one map_batches pass projects (id, h, bucket) where bucket = top
       log2(n_buckets) hash bits (bucket order == hash order),
    2. per-bucket counts tree-reduce to an ``n_buckets``-row table; the
       driver turns it into exclusive prefix offsets (KBs, broadcast),
    3. ``groupby(bucket).map_groups`` sorts each bucket by (h, id) and adds
       ``offset[bucket] + arange`` — the only shuffle, and it carries 20
       bytes/row.

    Choose ``n_buckets`` so corpus/n_buckets skinny rows fit one task.
    """
    _check_pow2(n_buckets)
    import ray

    from .aggregates import tree_groupby

    seed = int(seed)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h, bucket = _bucket_of(ids, seed, n_buckets)
        return pa.table(
            {
                id_col: ids,
                "h": pa.array(h, pa.uint64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    from .dedup import _coalesce_for_shuffle

    # _coalesce_for_shuffle: the sort shuffle's input-block-count cliff
    # (measured round 5: 1024 skinny blocks made a 64-partition shuffle
    # 56x slower than 200 blocks; coalescing costs one narrow pass)
    skinny = _coalesce_for_shuffle(
        ds.map_batches(
            project, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=32768,
        )
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        counts = np.bincount(b, minlength=n_buckets)
        nz = np.flatnonzero(counts)
        return pa.table(
            {
                "bucket": pa.array(nz.astype(np.int32), pa.int32()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    counts_t = (
        tree_groupby(
            skinny.map_batches(count_partial, batch_format="pyarrow"),
            ["bucket"],
            [("n", "sum")],
        )
        .to_arrow_refs()
    )
    counts_t = pa.concat_tables([t for t in ray.get(counts_t)])
    full = np.zeros(n_buckets, dtype=np.int64)
    if counts_t.num_rows:
        full[counts_t.column("bucket").to_numpy(zero_copy_only=False)] = (
            counts_t.column("n").to_numpy(zero_copy_only=False)
        )
    offsets = np.zeros(n_buckets, dtype=np.int64)
    np.cumsum(full[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def rank_bucket(group: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        ids = pc.take(group.column(id_col), order)
        b = int(group.column("bucket")[0].as_py())
        pos = off[b] + np.arange(group.num_rows, dtype=np.int64)
        return pa.table({id_col: ids, "shuffle_pos": pa.array(pos, pa.int64())})

    return skinny.groupby("bucket").map_groups(rank_bucket, batch_format="pyarrow")


def pack_sequences(
    ds,
    budget: int,
    seed: int = 0,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """GPT-style sequence-packing PLAN: concatenate per-bucket token streams
    (documents in id order within their hash bucket) and cut packs every
    ``budget`` tokens — documents straddle pack boundaries, every token is
    used, no padding waste.  Emits one row per (document × pack) segment:

        (bucket int32, pack_id int64, id_col, tok_start, tok_end, n_tokens)

    ``tok_start``/``tok_end`` are within-document token offsets of the
    segment landing in ``pack_id`` (local to the bucket).  The plan is a
    pure function of (ids, texts, seed) — stable across reruns and cluster
    sizes — and closed-form from the per-bucket exclusive token cumsum, so
    assembly (gathering actual text) can run later as a bucketed join
    without recomputing anything.

    Scale shape: only (id, token-count, bucket) rows shuffle — the text
    never moves; per-bucket groups hold corpus/n_buckets skinny rows (scale
    ``n_buckets`` with the corpus).  Token counts are one vectorized
    ``count_substring`` per batch (whitespace token model shared with
    ``chunk_documents`` — null text counts as one empty token).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    _check_pow2(n_buckets)
    seed = int(seed)
    budget = int(budget)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        if text.null_count:
            text = text.fill_null("")
        ntok = pc.add(pc.count_substring(text, " "), 1)
        _, bucket = _bucket_of(ids, seed, n_buckets)
        return pa.table(
            {
                id_col: ids,
                "L": pc.cast(ntok, pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    skinny = ds.map_batches(project, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=32768)

    def pack_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        ids = pc.take(group.column(id_col), order)
        L = pc.take(group.column("L"), order).to_numpy(zero_copy_only=False)
        b = group.column("bucket")[0].as_py()
        S = np.zeros(len(L), dtype=np.int64)
        np.cumsum(L[:-1], out=S[1:])
        p0 = S // budget
        p1 = (S + L - 1) // budget
        nseg = p1 - p0 + 1
        row = np.repeat(np.arange(len(L), dtype=np.int64), nseg)
        cstart = np.zeros(len(L) + 1, dtype=np.int64)
        np.cumsum(nseg, out=cstart[1:])
        p = (
            np.arange(int(cstart[-1]), dtype=np.int64)
            - np.repeat(cstart[:-1], nseg)
            + p0[row]
        )
        seg_a = np.maximum(S[row], p * budget) - S[row]
        seg_b = np.minimum(S[row] + L[row], (p + 1) * budget) - S[row]
        return pa.table(
            {
                "bucket": pa.array(np.full(len(row), b, np.int32), pa.int32()),
                "pack_id": pa.array(p, pa.int64()),
                id_col: pc.take(ids, pa.array(row, pa.int64())),
                "tok_start": pa.array(seg_a, pa.int64()),
                "tok_end": pa.array(seg_b, pa.int64()),
                "n_tokens": pa.array(seg_b - seg_a, pa.int64()),
            }
        )

    return skinny.groupby("bucket").map_groups(pack_bucket, batch_format="pyarrow")


def token_budget_select(
    ds,
    budget: int,
    seed: int = 0,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Deterministic token-budget trim: walk documents in the seeded
    epoch-shuffle order (rank under ``(splitmix64(id, seed), id)``) and keep
    each document whose whole token count still fits the running ``budget``
    — "give me exactly the first 10 B tokens of this corpus, reproducibly".
    Documents are kept atomically (a doc that would straddle the boundary is
    dropped, as are all later ones).  Output rows: (id_col, ``n_tokens``).

    Scale shape (10^12 docs): the same histogram-prefix construction as
    ``epoch_shuffle``, but with per-bucket TOKEN sums — and because bucket
    order == hash order, the driver's exclusive prefix classifies every
    bucket up front:

    * fully-kept buckets (prefix + bucket total ≤ budget) stream straight
      through a map_batches filter — no shuffle, no sort;
    * the ONE boundary bucket (prefix < budget < prefix + total) is sorted
      exactly by (h, id) in a single map_groups task — ~corpus/n_buckets
      skinny rows, the only shuffle in the whole operator;
    * fully-dropped buckets never move at all.

    Token counts use the whitespace token model shared with
    ``pack_sequences`` (null text = one empty-string token, L ≥ 1)."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    _check_pow2(n_buckets)
    import ray

    from .aggregates import tree_groupby

    seed = int(seed)
    budget = int(budget)

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        if text.null_count:
            text = text.fill_null("")
        ntok = pc.add(pc.count_substring(text, " "), 1)
        h, bucket = _bucket_of(ids, seed, n_buckets)
        return pa.table(
            {
                id_col: ids,
                "h": pa.array(h, pa.uint64()),
                "L": pc.cast(ntok, pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    skinny = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    ).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch.select(["bucket", "L"]), ["bucket"]).aggregate(
            [("L", "sum")]
        )
        return t.rename_columns(["bucket", "tok"])

    sums = pa.concat_tables(
        ray.get(
            tree_groupby(
                skinny.map_batches(sum_partial, batch_format="pyarrow"),
                ["bucket"],
                [("tok", "sum")],
            ).to_arrow_refs()
        )
    )
    totals = np.zeros(n_buckets, dtype=np.int64)
    if sums.num_rows:
        totals[sums.column("bucket").to_numpy(zero_copy_only=False)] = (
            sums.column("tok").to_numpy(zero_copy_only=False)
        )
    offsets = np.zeros(n_buckets, dtype=np.int64)
    np.cumsum(totals[:-1], out=offsets[1:])

    full_keep = offsets + totals <= budget  # every doc in these buckets fits
    boundary = np.flatnonzero((offsets < budget) & ~full_keep & (totals > 0))
    # offsets are monotone, so at most one bucket can straddle the budget
    b_star = int(boundary[0]) if len(boundary) else -1
    keep_ref = ray.put(full_keep)

    def emit_full(batch: pa.Table) -> pa.Table:
        fk = ray.get(keep_ref)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(fk[b]))
        return pa.table({id_col: t.column(id_col), "n_tokens": t.column("L")})

    kept = skinny.map_batches(emit_full, batch_format="pyarrow")
    if b_star < 0:
        return kept

    b_off = int(offsets[b_star])

    def trim_boundary(batch: pa.Table) -> pa.Table:
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        g = batch.filter(pa.array(b == b_star))
        order = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        ids = pc.take(g.column(id_col), order)
        L = pc.take(g.column("L"), order).to_numpy(zero_copy_only=False)
        S = b_off + np.cumsum(L) - L  # exclusive prefix within the stream
        fit = S + L <= budget
        return pa.table(
            {id_col: ids.combine_chunks(), "n_tokens": pa.array(L, pa.int64())}
        ).filter(pa.array(fit))

    # one boundary bucket → repartition(1) narrows it into a single sort task
    bdry = (
        skinny.map_batches(
            lambda t: t.filter(
                pa.array(t.column("bucket").to_numpy(zero_copy_only=False) == b_star)
            ),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(trim_boundary, batch_format="pyarrow", batch_size=None)
    )
    return kept.union(bdry)


def token_budget_mix(
    ds,
    weights: dict,
    budget: int,
    seed: int = 0,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
):
    """Token-weighted data recipe (the DoReMi/source-mixing shape): give
    each source ``s`` a TOKEN budget ``b_s = weights[s]·budget // Σw`` and
    keep, per source, the first documents of the seeded epoch-shuffle
    order whose whole token counts still fit — "2 parts web, 1 part code,
    by tokens not documents, reproducibly".  Sources absent from
    ``weights`` are dropped entirely (an explicit recipe lists its
    ingredients).  Output rows: (id_col, source_col, ``n_tokens``).

    Scale shape: `token_budget_select`'s histogram-prefix construction,
    widened one key — per-(source, bucket) token sums tree-reduce
    (bounded by |sources| × n_buckets), the driver classifies every
    bucket per source up front, fully-kept buckets stream through a
    map_batches filter, and only each source's ONE boundary bucket is
    sorted (a map_groups task per source).  One corpus pass + one skinny
    boundary shuffle regardless of how many sources the recipe mixes."""
    if budget < 0:
        raise ValueError(f"token_budget_mix: budget must be >= 0, got {budget}")
    if not weights or any(
        not isinstance(w, int) or isinstance(w, bool) or w < 0
        for w in weights.values()
    ):
        raise ValueError(
            "token_budget_mix: weights must be non-empty non-negative "
            "INTEGERS — float ratios silently truncate (1.5 -> 1, and a "
            "sub-1 total divides by zero); scale them to integers first"
        )
    _check_pow2(n_buckets)
    import ray

    from .aggregates import tree_groupby

    seed = int(seed)
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("token_budget_mix: weights sum to zero")
    budgets = {s: (int(w) * int(budget)) // int(wsum) for s, w in weights.items()}

    def project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        text = pc.cast(text, pa.string())
        if text.null_count:
            text = text.fill_null("")
        ntok = pc.add(pc.count_substring(text, " "), 1)
        h, bucket = _bucket_of(ids, seed, n_buckets)
        return pa.table(
            {
                id_col: ids,
                source_col: batch.column(source_col),
                "h": pa.array(h, pa.uint64()),
                "L": pc.cast(ntok, pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    skinny = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    ).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(
            batch.select([source_col, "bucket", "L"]), [source_col, "bucket"]
        ).aggregate([("L", "sum")])
        return t.rename_columns([source_col, "bucket", "tok"])

    sums_t = [
        t
        for t in ray.get(
            tree_groupby(
                skinny.map_batches(sum_partial, batch_format="pyarrow"),
                [source_col, "bucket"],
                [("tok", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    # per-source bucket classification (the token_budget_select driver
    # step, one source at a time over the bounded |sources|×n_buckets sums)
    plan: dict = {}
    if sums_t:
        sums = pa.concat_tables(sums_t)
        src_arr = sums.column(source_col).to_pylist()
        bk = sums.column("bucket").to_numpy(zero_copy_only=False)
        tk = sums.column("tok").to_numpy(zero_copy_only=False)
        for s, b_s in budgets.items():
            m = np.array([x == s for x in src_arr], dtype=bool)
            totals = np.zeros(n_buckets, dtype=np.int64)
            totals[bk[m]] = tk[m]
            offsets = np.zeros(n_buckets, dtype=np.int64)
            np.cumsum(totals[:-1], out=offsets[1:])
            full_keep = offsets + totals <= b_s
            bdry = np.flatnonzero((offsets < b_s) & ~full_keep & (totals > 0))
            b_star = int(bdry[0]) if len(bdry) else -1
            plan[s] = (full_keep, b_star, int(offsets[b_star]) if b_star >= 0 else 0, b_s)
    plan_ref = ray.put(plan)

    def emit_full(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        mask = np.zeros(batch.num_rows, dtype=bool)
        for code, sval in enumerate(enc.dictionary.to_pylist()):
            ent = pl.get(sval)
            if ent is None:
                continue  # source not in the recipe → dropped
            sel = codes == code
            mask[sel] = ent[0][b[sel]]
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                id_col: t.column(id_col),
                source_col: t.column(source_col),
                "n_tokens": t.column("L"),
            }
        )

    kept = skinny.map_batches(emit_full, batch_format="pyarrow")

    def is_boundary(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        src = batch.column(source_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = src.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column("bucket").to_numpy(zero_copy_only=False)
        mask = np.zeros(batch.num_rows, dtype=bool)
        for code, sval in enumerate(enc.dictionary.to_pylist()):
            ent = pl.get(sval)
            if ent is None or ent[1] < 0:
                continue
            sel = codes == code
            mask[sel] = b[sel] == ent[1]
        return batch.filter(pa.array(mask))

    def trim_boundary(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                source_col: pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        pl = ray.get(plan_ref)
        sval = group.column(source_col)[0].as_py()
        ent = pl.get(sval)
        if ent is None:
            return empty
        _, _, b_off, b_s = ent
        order = pc.sort_indices(
            group, sort_keys=[("h", "ascending"), (id_col, "ascending")]
        )
        g = group.take(order)
        L = g.column("L").to_numpy(zero_copy_only=False)
        S = b_off + np.cumsum(L) - L
        fit = S + L <= b_s
        t = g.filter(pa.array(fit))
        return pa.table(
            {
                id_col: t.column(id_col),
                source_col: t.column(source_col),
                "n_tokens": t.column("L"),
            }
        )

    bdry = (
        skinny.map_batches(is_boundary, batch_format="pyarrow")
        .groupby(source_col)
        .map_groups(trim_boundary, batch_format="pyarrow")
    )
    return kept.union(bdry)


def contamination_report(
    corpus_ds,
    bench_ds,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bench_grams: int = 1 << 24,
):
    """Per-benchmark-document contamination audit: for every benchmark doc,
    how many of its DISTINCT word n-grams appear anywhere in the training
    corpus — the report a decontamination decision is made from (drop the
    benchmark? scrub the corpus? ship as-is because overlap is two boilerplate
    grams?).  Output rows: (``id_col``, ``n_grams``, ``n_hit`` int64), one
    per benchmark doc with ≥ 1 n-gram; the fraction n_hit/n_grams is the
    caller's to derive — no float leaves the op.

    Scale shape: the benchmark side is eval-suite-sized (MBs) and collects
    to the driver ONCE as (doc, gram-id) pairs over a deduplicated gram
    vocabulary; the vocabulary broadcasts via ``ray.put``; the CORPUS
    streams one pass — per batch, ``pc.index_in`` marks which benchmark
    grams occur, and only hit gram-ids (≤ |vocab| rows) enter the
    tree-combine.  The corpus-sized gram stream never shuffles and never
    reaches the driver.  ``max_bench_grams`` keeps an oversized "benchmark"
    loud instead of silently broadcasting gigabytes."""
    import ray

    from .aggregates import tree_groupby

    # 1. benchmark (doc, distinct-gram) pairs, collected — the small side
    def bench_partial(batch: pa.Table) -> pa.Table:
        grams, rows = _doc_ngrams(batch, n, text_col)
        if grams is None:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "g": pa.array([], pa.string())}
            )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        dic = grams.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False)
        pair = np.stack([ids[rows], codes])
        uniq = np.unique(pair, axis=1)
        return pa.table(
            {
                id_col: pa.array(uniq[0], pa.int64()),
                "g": dic.dictionary.take(pa.array(uniq[1])),
            }
        )

    pieces = [
        b
        for b in bench_ds.map_batches(
            bench_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow")
        if b.num_rows
    ]
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_grams": pa.array([], pa.int64()),
            "n_hit": pa.array([], pa.int64()),
        }
    )
    if not pieces:
        return empty
    pairs = pa.concat_tables(pieces)
    # batches may repeat (doc, gram) if a doc spans chunks — dedup globally
    dic = pairs.column("g").combine_chunks().dictionary_encode()
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = pairs.column(id_col).to_numpy(zero_copy_only=False)
    pair = np.unique(np.stack([ids, codes]), axis=1)
    doc_of, code_of = pair[0], pair[1]
    vocab = dic.dictionary
    if len(vocab) > max_bench_grams:
        raise ValueError(
            f"contamination_report: benchmark has {len(vocab)} distinct "
            f"n-grams (> max_bench_grams={max_bench_grams}) — that is not "
            "an eval-suite-sized side; decontaminate in the other direction"
        )
    vocab_ref = ray.put(vocab)

    # 2. corpus pass: which benchmark gram-ids occur anywhere?
    def hits_partial(batch: pa.Table) -> pa.Table:
        vs = ray.get(vocab_ref)
        grams, _ = _doc_ngrams(batch, n, text_col)
        if grams is None:
            return pa.table({"gi": pa.array([], pa.int64())})
        pos = pc.index_in(grams, value_set=vs).drop_null()
        hit = np.unique(pos.to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table(
            {
                "gi": pa.array(hit, pa.int64()),
                "one": pa.array(np.ones(len(hit), np.int64)),
            }
        )

    parts = [
        t
        for t in ray.get(
            tree_groupby(
                corpus_ds.map_batches(
                    hits_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["gi"],
                [("one", "max")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    hit_codes = (
        np.sort(
            pa.concat_tables(parts).column("gi").to_numpy(zero_copy_only=False)
        )
        if parts
        else np.array([], np.int64)
    )

    # 3. per-benchmark-doc totals — bounded driver work on the small side
    is_hit = np.isin(code_of, hit_codes)
    ud, inv = np.unique(doc_of, return_inverse=True)
    n_grams = np.bincount(inv, minlength=len(ud)).astype(np.int64)
    n_hit = np.bincount(inv[is_hit], minlength=len(ud)).astype(np.int64)
    return pa.table(
        {
            id_col: pa.array(ud, pa.int64()),
            "n_grams": pa.array(n_grams),
            "n_hit": pa.array(n_hit),
        }
    )
