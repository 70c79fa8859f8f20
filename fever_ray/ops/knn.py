"""Similarity search over an embedding column (list<float>).

* ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once via ray.put; every batch computes a vectorized matmul and emits only
  its local top-k candidates; a tiny global reduce finishes.  This is the
  accuracy baseline AND the per-bucket kernel of the scale path.
* ``knn_lsh`` — random-hyperplane LSH variant: data and queries are
  bucketed by sign-pattern signatures (multi-probe over Hamming-1
  neighbors); brute force runs only inside matching buckets.  Recall < 1 by
  design; measured against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _embedding_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # list<float> with fixed length → (n, d) via flat values reshape
    offsets = np.diff(arr.offsets.to_numpy(zero_copy_only=False))
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    if len(set(offsets.tolist())) == 1:
        return flat.reshape(len(arr), int(offsets[0])).astype(np.float64)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in arr.to_pylist()])


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    return mat / np.maximum(n, 1e-12)[:, None]


def knn_bruteforce(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """Exact cosine top-k for each query row; returns a pa.Table
    (query_id, vec_id, cosine) with per-query descending rank order.

    Per batch: (q × d) @ (d × n) matmul + argpartition top-k → only
    n_queries*k candidate rows leave each batch."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(batch))
        sims = qm @ mat.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx[qi]].tolist())
            out_s.extend(sims[qi, idx[qi]].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True)

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "cosine"], descending=[False, True])
    )


def train_ivf_centroids(
    ds, n_centroids: int = 16, sample_rows: int = 2048, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Train an IVF coarse quantizer: seeded mini k-means over a driver-side
    sample (the sample is small by construction; training cost is O(sample ×
    centroids), independent of corpus size)."""
    sample = []
    for batch in ds.iter_batches(batch_size=sample_rows, batch_format="pyarrow"):
        sample.append(_normalize(_embedding_matrix(batch)))
        if sum(len(s) for s in sample) >= sample_rows:
            break
    x = np.vstack(sample)[:sample_rows]
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_ivf(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    seed: int = 5,
):
    """IVF ANN: vectors partition into Voronoi cells of a trained coarse
    quantizer; each query scans only its ``nprobe`` nearest cells.

    The centroid matrix is broadcast (ray.put); per batch the cell
    assignment and the per-cell query scan are pure matmuls.  Returns the
    brute-force output schema; recall < 1 by design (measured in tests)."""
    import ray

    cents = train_ivf_centroids(ds, n_centroids=n_centroids, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    # cell → probing queries
    probe: dict[int, list[int]] = {}
    for qi in range(len(q)):
        for c in q_cells[qi]:
            probe.setdefault(int(c), []).append(qi)
    ctx = ray.put({"q": q, "cents": cents, "probe": probe})

    def local(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(batch))
        cells = np.argmax(mat @ c["cents"].T, axis=1)
        out_q, out_id, out_s = [], [], []
        for cell in np.unique(cells):
            qids = c["probe"].get(int(cell))
            if not qids:
                continue
            mask = cells == cell
            sub, sub_ids = mat[mask], ids[mask]
            sims = c["q"][qids] @ sub.T
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            for row, qi in enumerate(qids):
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[idx[row]].tolist())
                out_s.extend(sims[row, idx[row]].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = (
            pa.TableGroupBy(group, ["query_id", "vec_id"]).aggregate([("cosine", "max")])
        ).rename_columns(["query_id", "vec_id", "cosine"])
        order = pc.sort_indices(
            group, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "cosine"], descending=[False, True])
    )


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes) > 0
    sig = np.zeros(len(mat), dtype=np.int64)
    for j in range(bits.shape[1]):
        sig |= bits[:, j].astype(np.int64) << j
    return sig


def knn_lsh(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    seed: int = 11,
):
    """LSH-bucketed ANN: vectors land in sign-pattern buckets; each query
    probes its own bucket (+ all Hamming-1 neighbors with multiprobe).
    Returns the same (query_id, vec_id, cosine) schema as brute force."""
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    q_sigs = _signatures(q, planes)

    # query → probed buckets
    probe: dict[int, list[int]] = {}
    for qi, s in enumerate(q_sigs):
        buckets = [int(s)]
        if multiprobe:
            buckets += [int(s) ^ (1 << j) for j in range(n_planes)]
        for b in buckets:
            probe.setdefault(b, []).append(qi)

    ctx = ray.put({"q": q, "planes": planes, "probe": probe})

    def local(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = _normalize(_embedding_matrix(batch))
        sigs = _signatures(mat, c["planes"])
        out_q, out_id, out_s = [], [], []
        for b in np.unique(sigs):
            qids = c["probe"].get(int(b))
            if not qids:
                continue
            mask = sigs == b
            sub = mat[mask]
            sub_ids = ids[mask]
            sims = c["q"][qids] @ sub.T
            kk = min(k, sims.shape[1])
            idx = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            for row, qi in enumerate(qids):
                out_q.extend([qi] * kk)
                out_id.extend(sub_ids[idx[row]].tolist())
                out_s.extend(sims[row, idx[row]].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # a vector may reach the same query via several probes → dedup first
        group = (
            pa.TableGroupBy(group, ["query_id", "vec_id"]).aggregate([("cosine", "max")])
        ).rename_columns(["query_id", "vec_id", "cosine"])
        order = pc.sort_indices(
            group, sort_keys=[("cosine", "descending"), ("vec_id", "ascending")]
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "cosine"], descending=[False, True])
    )



def _blob_codes(qcol) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (element byte-offsets, int8 data) view of a packed-code
    large_binary column (`quantize_embeddings` output)."""
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    n = len(qcol)
    if n == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.int8)
    off = np.frombuffer(qcol.buffers()[1], np.int64)[
        qcol.offset : qcol.offset + n + 1
    ]
    return off, np.frombuffer(qcol.buffers()[2], np.int8)


def _codes_matrix(qcol) -> np.ndarray:
    """(n, d) int64 matrix of uniform-width packed codes — blobs are
    adjacent by construction, so one contiguous slice reshapes (the int8
    sibling of `_embedding_matrix`)."""
    off, data = _blob_codes(qcol)
    n = len(off) - 1
    if n == 0:
        return np.zeros((0, 0), np.int64)
    d = int(off[1] - off[0])
    return data[off[0] : off[-1]].reshape(n, d).astype(np.int64)


def quantize_embeddings(ds, id_col: str = "vec_id", col: str = "embedding",
                        levels: int = 127):
    """Symmetric per-vector int8 quantization — the storage/ANN substrate
    (int8 dot products run 4× denser than float32; SQ8 in FAISS terms):
    ``q_d = floor(v_d · levels / max|v| + 0.5)`` (round-half-up, exact
    IEEE double arithmetic with a fixed expression tree, so any engine
    evaluating the same tree reproduces it bit-for-bit), ``scale`` =
    max|v| as a bit-COPY of one input component.  An all-zero vector
    quantizes to all zeros with scale 0.

    Output rows: (``id_col``, ``scale`` float64, ``q`` large_binary —
    the int8 codes packed; ``unpack_quantized`` explodes them).  Pure
    zero-shuffle map_batches over the `_embedding_matrix` zero-copy
    reshape; at 10^12 vectors this is the stage that shrinks the corpus
    4×, so it must never materialize anything."""
    if not (1 <= levels <= 127):
        raise ValueError(f"quantize_embeddings: levels must be 1..127, got {levels}")

    def quant(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(batch.column(id_col), pa.int64())
        m = _embedding_matrix(batch, col)
        scale = np.abs(m).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.floor(m * float(levels) / safe[:, None] + 0.5).astype(np.int8)
        n, d = q.shape
        flat = q.tobytes()
        offs = np.arange(0, (n + 1) * d, d, dtype=np.int64)
        blob = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat)],
        )
        return pa.table(
            {
                id_col: ids,
                "scale": pa.array(scale, pa.float64()),
                "q": blob,
            }
        )

    return ds.map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)


def unpack_quantized(qds, id_col: str = "vec_id"):
    """Explode `quantize_embeddings` blobs into (id, dim 1-based, q int64)
    rows — the audit/gate view of the packed codes (and the join shape for
    SQL engines that can't read int8 blobs).  Zero-shuffle."""
    def unpack(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        qcol = batch.column("q")
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        if len(qcol) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        off, data = _blob_codes(qcol)
        lens = off[1:] - off[:-1]
        rep_ids = np.repeat(ids, lens)
        # dim: 1-based position within each blob
        pos = np.arange(int(lens.sum()), dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        dims = pos - np.repeat(starts, lens) + 1
        # blob i spans [off[i], off[i+1]) — adjacent by construction, so
        # the concatenation of all blobs is one contiguous slice
        vals = data[off[0] : off[-1]]
        return pa.table(
            {
                id_col: pa.array(rep_ids, pa.int64()),
                "dim": pa.array(dims, pa.int64()),
                "q": pa.array(vals.astype(np.int64), pa.int64()),
            }
        )

    return qds.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)


def knn_quantized(qds, queries: np.ndarray, k: int = 10,
                  id_col: str = "vec_id", levels: int = 127):
    """Integer top-k over `quantize_embeddings` codes — the SQ8 ANN path:
    queries quantize with the SAME rule, score = Σ q_query·q_vec (pure
    int64, exact, so ranking is bit-stable and ties break deterministically
    by ascending id — no float boundary anywhere).  Raw code dot products
    rank by cosine only up to per-vector scale spread; that approximation
    IS the documented operator (FAISS SQ8 with symmetric max-abs scaling
    makes the same trade), and recall vs the float brute force is what the
    tests pin.

    Output rows: (query_id = query row index, id_col, score int64),
    per-query (score desc, id asc) order.

    Scale shape: queries broadcast once; per batch the packed int8 blobs
    reshape zero-copy to (n, d) and ONE integer matmul + lexsort top-k
    leaves n_q·k rows per batch; the global merge groups k·n_blocks skinny
    rows."""
    import ray

    qf = np.asarray(queries, dtype=np.float64)
    scale = np.abs(qf).max(axis=1)
    safe = np.where(scale == 0.0, 1.0, scale)
    qcodes = np.floor(qf * float(levels) / safe[:, None] + 0.5).astype(np.int64)
    q_ref = ray.put(qcodes)

    def local_topk(batch: pa.Table) -> pa.Table:
        from ..core.bcast import cached_get

        qm = cached_get(q_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        qcol = batch.column("q")
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        n = len(qcol)
        if n == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        codes = _codes_matrix(qcol)
        sims = qm @ codes.T  # (n_q, n) int64
        kk = min(k, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # total order (score desc, id asc): exact-tie safe at the
            # boundary, unlike a bare argpartition on scores
            o = np.lexsort((ids, -sims[qi]))[:kk]
            out_q.append(np.full(kk, qi, np.int64))
            out_id.append(ids[o])
            out_s.append(sims[qi, o])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )

    candidates = qds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    )

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group, sort_keys=[("score", "descending"), (id_col, "ascending")]
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "score", id_col], descending=[False, True, False])
    )


def project_quantized(qds, out_dim: int = 16, id_col: str = "vec_id"):
    """Signed random projection (integer Johnson-Lindenstrauss / SimHash
    generalization) over `quantize_embeddings` codes: output component
    r_j = Σ_d sign(d, j)·q_d where sign(d, j) = +1 iff the top bit of
    splitmix64((d−1)·K + (j−1)) is set, else −1 — the projection matrix is
    a pure FUNCTION of (dim, j), never stored or shipped, and every value
    is exact int64 (|r| ≤ d·127), so the reduction is reproducible
    bit-for-bit on any engine with the same hash.

    Output rows: (``id_col``, ``j`` 1-based output dim, ``r`` int64) —
    the K-dim sketch that LSH/clustering stages consume at 4-16× less
    width.  Zero-shuffle: one integer matmul per batch against the
    (d × K) sign matrix rebuilt per batch (d·K hashes — trivial)."""
    from ..sketches.hashing import hash64_ints

    if out_dim < 1:
        raise ValueError(f"project_quantized: out_dim must be >= 1, got {out_dim}")
    K = int(out_dim)

    def proj(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        qcol = batch.column("q")
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        n = len(qcol)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "j": pa.array([], pa.int64()),
                    "r": pa.array([], pa.int64()),
                }
            )
        codes = _codes_matrix(qcol)
        d = codes.shape[1]
        h = hash64_ints(np.arange(d * K, dtype=np.int64))
        signs = np.where(
            (h >> np.uint64(63)).astype(bool), np.int64(1), np.int64(-1)
        ).reshape(d, K)
        r = codes @ signs  # (n, K) int64
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, K), pa.int64()),
                "j": pa.array(np.tile(np.arange(1, K + 1, dtype=np.int64), n),
                              pa.int64()),
                "r": pa.array(r.reshape(-1), pa.int64()),
            }
        )

    return qds.map_batches(proj, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------- rank fusion
def rank_fusion(
    rankings,
    k: int = 10,
    rrf_k: int = 60,
    scale: int = 10**9,
    num_partitions: int = 32,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
):
    """Quantized reciprocal-rank fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009) over R ranked candidate lists: fused score(q, d) =
    Σ_r ``scale // (rrf_k + rank_r(q, d))`` (missing docs contribute 0),
    output = exact top-``k`` per query under (score desc, doc asc).

    The floor-division quantization makes every score a pure int64 — no
    float fraction sums whose order could drift across engines — while
    preserving RRF's ordering for any realistic depth (adjacent 1/(60+r)
    gaps at r ≤ 10^4 are ≥ 10^-8·scale/10 apart at scale=10^9).

    Scale shape (10^12 docs): each ranking is already a top-N per query
    (n_queries × N skinny rows — the output of `knn_quantized` /
    `group_top_k`-style stages, never the corpus); fusion is one
    (query, doc)-hash bucket shuffle with a vectorized per-bucket sum
    (lexsort + reduceat), then the skew-immune `group_top_k` kernel picks
    per-query winners.  Rank 0/negative rows are rejected loudly —
    a 0 rank would divide scale by rrf_k and silently dominate."""
    import ray.data as rd

    from ..sketches.hashing import splitmix64
    from .relational import group_top_k

    if not rankings:
        raise ValueError("rank_fusion: need at least one ranking")
    if k < 1 or rrf_k < 0 or scale < 1:
        raise ValueError("rank_fusion: bad k/rrf_k/scale")

    def contrib(batch: pa.Table) -> pa.Table:
        r = batch.column(rank_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(r) and r.min() < 1:
            raise ValueError("rank_fusion: ranks must be >= 1")
        s = scale // (rrf_k + r)
        return pa.table(
            {
                query_col: batch.column(query_col),
                doc_col: pc.cast(batch.column(doc_col), pa.int64()),
                "score": pa.array(s, pa.int64()),
            }
        )

    parts = rankings[0].map_batches(contrib, batch_format="pyarrow")
    for more in rankings[1:]:
        parts = parts.union(more.map_batches(contrib, batch_format="pyarrow"))

    from ..sketches.hashing import hash64, hash64_ints

    def tag(batch: pa.Table) -> pa.Table:
        q = batch.column(query_col)
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        hq = (
            hash64_ints(q.to_numpy(zero_copy_only=False).astype(np.int64))
            if pa.types.is_integer(q.type)
            else hash64(q)
        )
        d = batch.column(doc_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        key = splitmix64(hq + d * np.uint64(0x9E3779B97F4A7C15))
        return batch.append_column(
            "part",
            pa.array((key % np.uint64(num_partitions)).astype(np.int32), pa.int32()),
        )

    def bucket_sum(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return pa.table(
                {
                    query_col: pa.array([], pa.string()),
                    doc_col: pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        t = pa.TableGroupBy(g.select([query_col, doc_col, "score"]),
                            [query_col, doc_col]).aggregate([("score", "sum")])
        return t.rename_columns([query_col, doc_col, "score"])

    fused = (
        parts.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_sum, batch_format="pyarrow")
    )
    return group_top_k(
        fused, query_col, "score", k=k, id_col=doc_col, descending=True,
        num_partitions=num_partitions,
    )


def mutual_nn_pairs(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_broadcast_rows: int = 200_000,
    num_partitions: int = 64,
):
    """Reciprocal nearest-neighbor pairs: (a, b) such that b is a's single
    closest cosine neighbor AND a is b's — the mutual-top-1 criterion of
    bitext mining (Artetxe & Schwenk 2019 margin-scoring precursor) and a
    high-precision near-dup signal (mutuality kills the hubness false
    positives a one-directional top-1 keeps).  Ties break by smaller
    neighbor id, so the directed top-1 is deterministic; output rows
    (id_a, id_b) with id_a < id_b, pure int64, each mutual pair once.

    Scale shape: the normalized corpus matrix is broadcast ONCE via
    ray.put (id-sorted so np.argmax's first-max rule IS the id
    tie-break); every batch computes one (batch × corpus) matmul and
    emits a single directed edge per row — no per-row Python.  Total
    compute is the exact O(N²·d) of the problem statement, so the loud
    ``max_broadcast_rows`` gate bounds COMPUTE as much as memory; beyond
    it, run the same mutual filter over `cluster.knn_graph`'s
    cluster-bounded top-1 edges instead (IVF approximation).  The mutual
    filter is ONE skinny (lo, hi)-hash bucket shuffle; a canonical pair
    appears at most twice, and exactly-twice == mutual (vectorized
    run-length check per bucket)."""
    import ray

    from ..sketches.hashing import hash64_ints

    blocks = [
        t for t in ray.get(ds.select_columns([id_col, emb_col]).to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if not blocks:
        raise ValueError("mutual_nn_pairs: empty input")
    ids = np.concatenate(
        [b.column(id_col).to_numpy(zero_copy_only=False) for b in blocks]
    ).astype(np.int64)
    if len(ids) > max_broadcast_rows:
        raise ValueError(
            f"mutual_nn_pairs: {len(ids)} rows exceeds the broadcast regime "
            f"({max_broadcast_rows}); use cluster.knn_graph top-1 edges + "
            "the same mutual filter (IVF-bounded approximation)"
        )
    mat = np.vstack([_normalize(_embedding_matrix(b, emb_col)) for b in blocks])
    order = np.argsort(ids, kind="stable")
    ids_sorted, mat_sorted = ids[order], mat[order]
    if len(ids_sorted) > 1 and (np.diff(ids_sorted) == 0).any():
        raise ValueError(f"mutual_nn_pairs: duplicate {id_col} values")
    bcast = ray.put((ids_sorted, mat_sorted))

    def top1(batch: pa.Table) -> pa.Table:
        bids, bmat = ray.get(bcast)
        rid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rmat = _normalize(_embedding_matrix(batch, emb_col))
        sims = rmat @ bmat.T
        # self-exclusion: every row id exists in the broadcast by construction
        self_col = np.searchsorted(bids, rid)
        sims[np.arange(len(rid)), self_col] = -np.inf
        nbr = bids[np.argmax(sims, axis=1)]  # first max == smallest id on ties
        lo = np.minimum(rid, nbr)
        hi = np.maximum(rid, nbr)
        part = (hash64_ints(lo * np.int64(31) + hi) % np.uint64(num_partitions)
                ).astype(np.int32)
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "part": pa.array(part, pa.int32()),
            }
        )

    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def mutual(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or g.num_columns == 0:
            return empty
        lo = g.column("lo").to_numpy(zero_copy_only=False)
        hi = g.column("hi").to_numpy(zero_copy_only=False)
        o = np.lexsort((hi, lo))
        lo, hi = lo[o], hi[o]
        same = np.empty(len(lo), dtype=bool)
        same[0] = False
        same[1:] = (lo[1:] == lo[:-1]) & (hi[1:] == hi[:-1])
        keep = same  # second of the pair marks mutuality (multiplicity 2 max)
        return pa.table(
            {
                "id_a": pa.array(lo[keep], pa.int64()),
                "id_b": pa.array(hi[keep], pa.int64()),
            }
        )

    if len(ids) == 1:
        import ray.data as rd

        return rd.from_arrow(empty)
    return (
        ds.map_batches(top1, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(mutual, batch_format="pyarrow")
    )


# --------------------------------------------------------------- product quant
def train_pq_codebooks(
    ds,
    m: int = 8,
    ksub: int = 16,
    sample_rows: int = 2048,
    iters: int = 10,
    seed: int = 9,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., TPAMI 2011): the
    d dims split into ``m`` contiguous subspaces, each with its own
    ``ksub``-centroid mini k-means over a driver-side sample — the sample
    is bounded by construction (same posture as :func:`train_ivf_centroids`),
    so training cost is independent of corpus size.  Returns float64
    codebooks of shape (m, ksub, d // m)."""
    x = _driver_sample(ds, sample_rows)
    return _train_books(x, m, ksub, iters, np.random.default_rng(seed))


def _driver_sample(ds, sample_rows: int) -> np.ndarray:
    """Bounded normalized sample for quantizer training (first
    ``sample_rows`` rows — cost independent of corpus size)."""
    sample = []
    for batch in ds.iter_batches(batch_size=sample_rows, batch_format="pyarrow"):
        sample.append(_normalize(_embedding_matrix(batch)))
        if sum(len(s) for s in sample) >= sample_rows:
            break
    return np.vstack(sample)[:sample_rows]


def _train_books(
    x: np.ndarray, m: int, ksub: int, iters: int, rng: np.random.Generator
) -> np.ndarray:
    """Per-subspace mini k-means over training rows ``x`` → (m, ksub,
    d // m) codebooks (the PQ core, reused by IVF-PQ on residuals)."""
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        k_eff = min(ksub, len(xs))
        cents = xs[rng.choice(len(xs), size=k_eff, replace=False)]
        for _ in range(iters):
            d2 = (
                (xs * xs).sum(1)[:, None]
                - 2.0 * xs @ cents.T
                + (cents * cents).sum(1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k_eff):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if k_eff < ksub:  # degenerate tiny sample: pad by repetition
            cents = np.vstack([cents, np.repeat(cents[:1], ksub - k_eff, axis=0)])
        books[j] = cents
    return books


def _pq_assign(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, d) → (n, m) uint8 nearest-centroid codes, one matmul per
    subspace (argmin of the expanded L2 — the ||x||² term is rank-constant
    and dropped)."""
    m, ksub, dsub = books.shape
    codes = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        scores = 2.0 * xs @ c.T - (c * c).sum(1)[None, :]
        codes[:, j] = np.argmax(scores, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds, books: np.ndarray, id_col: str = "vec_id"):
    """Encode every vector to its m-byte PQ code: (id_col, ``pq_code``
    fixed_size_binary(m)).  64-dim float32 → 8 bytes is a 32× storage
    cut — the representation a 10^12-vector index actually stores.

    The codebooks broadcast once (ray.put); per batch the assignment is m
    matmuls and the packing is one zero-copy buffer view (no per-row
    Python)."""
    import ray

    m = books.shape[0]
    b_ref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        bks = ray.get(b_ref)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        x = _normalize(_embedding_matrix(batch))
        codes = _pq_assign(x, bks)
        arr = pa.Array.from_buffers(
            pa.binary(m), len(codes), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({id_col: ids, "pq_code": arr})

    # bundle: the encode output feeds downstream shuffles (block-tax rule)
    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=32768)


def knn_pq(
    qds,
    queries: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
):
    """ADC (asymmetric distance) top-k over PQ codes: each query
    precomputes an (m, ksub) lookup table of exact sub-distances to every
    codebook entry; a batch's approximate distance is m LUT gathers + a
    sum — no float reconstruction ever materializes.  Output schema
    matches :func:`knn_bruteforce` with ``adc_cosine`` = 1 - d²/2 (the
    cosine the quantized vector approximates); recall < 1 by design
    (gate-checked against the exact top-k like LSH/IVF)."""
    import ray

    m, ksub, dsub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # LUT[qi, j, c] = ||q_sub - c||² for subspace j, centroid c
    lut = np.empty((len(q), m, ksub), dtype=np.float64)
    for j in range(m):
        qs = q[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        lut[:, j, :] = (
            (qs * qs).sum(1)[:, None]
            - 2.0 * qs @ c.T
            + (c * c).sum(1)[None, :]
        )
    ctx = ray.put({"lut": lut, "m": m})

    def local_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx)
        lut_, m_ = c["lut"], c["m"]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        codes = _codes_matrix_fixed(batch.column("pq_code"), m_)
        jj = np.arange(m_)[:, None]
        out_q, out_id, out_s = [], [], []
        kk = min(k, len(ids))
        for qi in range(len(lut_)):
            dist = lut_[qi][jj, codes.T].sum(axis=0)  # (n,)
            idx = np.argpartition(dist, kth=kk - 1)[:kk]
            out_q.extend([qi] * kk)
            out_id.extend(ids[idx].tolist())
            out_s.extend((1.0 - dist[idx] / 2.0).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "adc_cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = qds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    )

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("adc_cosine", "descending"), ("vec_id", "ascending")],
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "adc_cosine"], descending=[False, True])
    )


def _codes_matrix_fixed(qcol, m: int) -> np.ndarray:
    """fixed_size_binary(m) column → (n, m) uint8 view (zero-copy)."""
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    buf = qcol.buffers()[1]
    off = qcol.offset * m
    return np.frombuffer(buf, dtype=np.uint8)[off:off + len(qcol) * m].reshape(
        len(qcol), m
    )


# ------------------------------------------------------------------- IVF-PQ
def train_ivfpq(
    ds,
    n_centroids: int = 16,
    m: int = 16,
    ksub: int = 256,
    sample_rows: int = 4096,
    iters: int = 10,
    seed: int = 9,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the two-level IVF-PQ quantizer (the FAISS IVFPQ layout —
    Jégou et al. 2011 §V): a coarse k-means partitions space into Voronoi
    cells; a PQ codebook is trained on the RESIDUALS x − centroid(x),
    which concentrate near the origin and quantize far better than raw
    vectors.  Returns (centroids (C, d), books (m, ksub, d//m)) — both
    from one bounded driver-side sample, cost independent of corpus
    size."""
    x = _driver_sample(ds, sample_rows)
    rng = np.random.default_rng(seed)
    k_eff = min(n_centroids, len(x))
    cents = x[rng.choice(len(x), size=k_eff, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(k_eff):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    assign = np.argmax(x @ cents.T, axis=1)
    books = _train_books(x - cents[assign], m, ksub, iters, rng)
    return cents, books


def ivfpq_encode(ds, cents: np.ndarray, books: np.ndarray, id_col: str = "vec_id"):
    """Encode every vector to (``cell`` int32, ``pq_code``
    fixed_size_binary(m)) — the cell id from the coarse quantizer, the
    code from PQ over the residual.  One coarse matmul + m residual
    matmuls per batch; packing is a zero-copy buffer view."""
    import ray

    m = books.shape[0]
    ref = ray.put((cents, books))

    def enc(batch: pa.Table) -> pa.Table:
        cs, bks = ray.get(ref)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        x = _normalize(_embedding_matrix(batch))
        cell = np.argmax(x @ cs.T, axis=1)
        codes = _pq_assign(x - cs[cell], bks)
        arr = pa.Array.from_buffers(
            pa.binary(m), len(codes), [None, pa.py_buffer(codes.tobytes())]
        )
        return pa.table({
            id_col: ids,
            "cell": pa.array(cell.astype(np.int32), pa.int32()),
            "pq_code": arr,
        })

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=32768)


def knn_ivfpq(
    qds,
    queries: np.ndarray,
    cents: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
):
    """ADC search over IVF-PQ codes: each query probes its ``nprobe``
    nearest cells with a PER-CELL lookup table built from the query's
    residual against that cell — only rows in probed cells are gathered,
    and the per-row cost is m uint8 gathers + a sum.  At 10^12 vectors
    this is the index layout that bounds both bytes touched (16-byte
    codes) and rows touched (nprobe/C of the corpus).  Output schema
    matches :func:`knn_pq`; recall gate-checked like LSH/IVF/PQ."""
    import ray

    m, ksub, dsub = books.shape
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_cells = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    # LUT[(qi, cell)] lazily per probed pair: r = q - cent; table (m, ksub)
    luts: dict[tuple[int, int], np.ndarray] = {}
    probe: dict[int, list[int]] = {}
    for qi in range(len(q)):
        for c in q_cells[qi]:
            c = int(c)
            probe.setdefault(c, []).append(qi)
            r = q[qi] - cents[c]
            lut = np.empty((m, ksub), dtype=np.float64)
            for j in range(m):
                rs = r[j * dsub:(j + 1) * dsub]
                cb = books[j]
                lut[j] = (rs * rs).sum() - 2.0 * cb @ rs + (cb * cb).sum(1)
            luts[(qi, c)] = lut
    ctx = ray.put({"luts": luts, "probe": probe, "m": m})

    def local_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(ctx)
        luts_, probe_, m_ = c["luts"], c["probe"], c["m"]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        codes = _codes_matrix_fixed(batch.column("pq_code"), m_)
        jj = np.arange(m_)[:, None]
        out_q, out_id, out_s = [], [], []
        for cl in np.unique(cell):
            cl = int(cl)
            if cl not in probe_:
                continue
            sel = np.flatnonzero(cell == cl)
            sub = codes[sel]
            for qi in probe_[cl]:
                dist = luts_[(qi, cl)][jj, sub.T].sum(axis=0)
                kk = min(k, len(sel))
                idx = np.argpartition(dist, kth=kk - 1)[:kk]
                out_q.extend([qi] * kk)
                out_id.extend(ids[sel[idx]].tolist())
                out_s.extend((1.0 - dist[idx] / 2.0).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "adc_cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    candidates = qds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=32768,
    )

    def global_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("adc_cosine", "descending"), ("vec_id", "ascending")],
        )
        return group.take(order[:k])

    return (
        candidates.groupby("query_id")
        .map_groups(global_topk, batch_format="pyarrow")
        .sort(["query_id", "adc_cosine"], descending=[False, True])
    )
