"""Embedding-space clustering + semantic deduplication (SemDeDup,
Abbas et al. 2023, arXiv:2303.09540): cluster the corpus in embedding
space with a cheap coarse quantizer, then search for semantic duplicates
ONLY within each cluster — the scale trick that turns an O(N²) all-pairs
cosine search into per-cluster work.

Ray-Data shape:

* centroid selection is deterministic hash sampling (the k corpus rows
  with the smallest ``hash64_ints(id, seed)`` — splitmix64 is a bijection,
  so distinct ids never tie): one narrow pass emitting per-batch local
  top-k candidates, a k×n_batches driver merge, one broadcast.  No
  iterative k-means here — assignments stay a pure function of
  (ids, seed), SQL-mirrorable and stable under re-partitioning/resume
  (swap in ``knn.train_ivf_centroids`` when assignment quality matters
  more than bit-reproducibility).
* assignment is one stateless vectorized pass: normalized (n×d) @ (d×k)
  matmul per batch against the broadcast centroid matrix, argmax with
  smallest-centroid-id tie policy.
* the dedup step shuffles (id, cluster, embedding) rows — embeddings,
  never documents — grouped by cluster; within a cluster the pairwise
  cosine matrix is computed in row blocks (memory O(block × cluster),
  compute O(cluster²·d) — the SemDeDup contract: pick k large enough
  that clusters stay small; oversized clusters are logged).

Drop policy: a row is dropped iff some SMALLER-id row in the same
cluster is ≥ ``threshold``-similar — deterministic, order-independent,
exactly expressible in SQL (EXISTS smaller-id near neighbor), unlike
greedy chain-representative policies.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from ..sketches.hashing import hash64_ints
from .knn import _embedding_matrix, _normalize

logger = logging.getLogger(__name__)


def _hash_topk_rows(ds, k: int, seed: int, id_col: str, emb_col: str):
    """The k corpus rows with the smallest splitmix id hash → (ids sorted
    ascending, centroid matrix in that order).  Two narrow passes: each
    batch emits ≤k local candidates (id + embedding + hash), then a coarse
    re-reduce bounds the driver merge to k rows per 64k-candidate batch —
    without it the driver would collect k×n_blocks embeddings, linear in
    corpus size."""

    def _keep_k_smallest(t: pa.Table, h: np.ndarray) -> pa.Table:
        kk = min(k, t.num_rows)
        if kk == 0:
            return t
        idx = np.argpartition(h, kk - 1)[:kk]
        return t.take(pa.array(idx))

    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = hash64_ints(ids, seed=seed)
        t = batch.select([id_col, emb_col]).append_column(
            "h", pa.array(h.view(np.int64), pa.int64())
        )
        return _keep_k_smallest(t, h)

    def rereduce(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        return _keep_k_smallest(batch, h)

    cand = (
        ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(rereduce, batch_format="pyarrow", batch_size=65536)
        .take_all()
    )
    if not cand:
        raise ValueError("embedding_cluster: empty input")
    ids = np.array([r[id_col] for r in cand], dtype=np.int64)
    hs = np.array([r["h"] for r in cand], dtype=np.int64).view(np.uint64)
    order = np.argsort(hs, kind="stable")[: min(k, len(ids))]
    sel = sorted(order.tolist(), key=lambda i: ids[i])  # centroid order = id asc
    cid = ids[sel]
    cmat = np.vstack([np.asarray(cand[i][emb_col], dtype=np.float64) for i in sel])
    return cid, cmat


def embedding_cluster(
    ds, k: int = 8, seed: int = 1, id_col: str = "vec_id", emb_col: str = "embedding",
    keep_embedding: bool = False,
):
    """embeddings → (id_col, cluster_id) nearest-centroid assignment.

    ``cluster_id`` is the centroid row's own id (interpretable, join-able).
    Ties on cosine break toward the smallest centroid id (centroids are
    ordered id-ascending and np.argmax takes the first maximum)."""
    import ray

    cid, cmat = _hash_topk_rows(ds, k, seed, id_col, emb_col)
    c_ref = ray.put((cid, _normalize(cmat)))

    def assign(batch: pa.Table) -> pa.Table:
        cids, cn = ray.get(c_ref)
        ids = batch.column(id_col)
        mat = _normalize(_embedding_matrix(batch, emb_col))
        sims = mat @ cn.T  # (n, k)
        best = np.argmax(sims, axis=1)
        out = pa.table(
            {id_col: ids, "cluster_id": pa.array(cids[best], pa.int64())}
        )
        if keep_embedding:
            out = out.append_column(emb_col, batch.column(emb_col))
        return out

    # bundle before the cluster_id groupby (block-tax rule, CLAUDE.md)
    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=32768)


def _sorted_cluster_matrix(
    group: pa.Table, id_col: str, emb_col: str, warn_cluster: int, op: str
):
    """Shared per-cluster preamble for the pairwise kernels: sort the group
    id-ascending (both tie policies depend on it), warn once on oversized
    clusters (pairwise work is O(n²) — raise k to shrink clusters), return
    (sorted group, int64 ids, normalized float64 matrix)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
    g = group.take(order)
    if g.num_rows > warn_cluster:
        logger.warning(
            "%s: cluster %s holds %d rows (> %d) — pairwise work is O(n²); "
            "raise k to shrink clusters",
            op, g.column("cluster_id")[0].as_py(), g.num_rows, warn_cluster,
        )
    ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    return g, ids, _normalize(_embedding_matrix(g, emb_col))


def semdedup(
    ds, k: int = 8, threshold: float = 0.9, seed: int = 1,
    id_col: str = "vec_id", emb_col: str = "embedding",
    block: int = 4096, warn_cluster: int = 65536,
):
    """embeddings → (id_col, cluster_id, kept): semantic dedup within
    embedding clusters.  kept=False iff a smaller-id row of the SAME
    cluster has cosine ≥ ``threshold``.

    The cluster groupby shuffles (id, cluster, embedding) rows only.
    Within a cluster, similarity runs in ``block``-row slabs against the
    id-sorted prefix, so peak memory is O(block × cluster) while the
    matmuls stay vectorized."""
    assigned = embedding_cluster(
        ds, k=k, seed=seed, id_col=id_col, emb_col=emb_col, keep_embedding=True
    )

    def drop_near_dups(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "cluster_id": pa.array([], pa.int64()),
                 "kept": pa.array([], pa.bool_())}
            )
        g, _, mat = _sorted_cluster_matrix(
            group, id_col, emb_col, warn_cluster, "semdedup"
        )
        n = g.num_rows
        dropped = np.zeros(n, dtype=bool)
        for s in range(0, n, block):
            e = min(s + block, n)
            sims = mat[s:e] @ mat[:e].T  # rows s..e vs ALL ids <= their own
            hit = sims >= threshold
            # zero the diagonal-and-above inside the slab (only j < i counts)
            hit[np.arange(e - s)[:, None] + s <= np.arange(e)[None, :]] = False
            dropped[s:e] = hit.any(axis=1)
        return pa.table(
            {
                id_col: g.column(id_col),
                "cluster_id": g.column("cluster_id"),
                "kept": pa.array(~dropped),
            }
        )

    return assigned.groupby("cluster_id").map_groups(
        drop_near_dups, batch_format="pyarrow"
    )


def _topk_tiebreak_rows(sims: np.ndarray, kk: int) -> np.ndarray:
    """Per row of ``sims``: column indices of the ``kk`` largest values,
    ordered (value desc, column asc) — EXACT tie semantics at argpartition
    cost.  Fast path: argpartition to kk candidates + a kk-wide sort.  A
    row needs the full stable-argsort fallback only when values EQUAL to
    its kth-largest straddle the partition boundary (ties there mean the
    kept candidate set is ambiguous — common only for exact-duplicate
    vectors)."""
    n, m = sims.shape
    rows = np.arange(n)[:, None]
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
    cand = sims[rows, part]
    kth = cand.min(axis=1)
    # boundary ambiguity: more values == kth exist in the row than were kept
    eq_total = (sims == kth[:, None]).sum(axis=1)
    eq_kept = (cand == kth[:, None]).sum(axis=1)
    fix = np.nonzero(eq_total > eq_kept)[0]
    # order candidates (value desc, column asc): sort columns first (they
    # come out of argpartition unordered), then stable-sort by -value
    col_order = np.argsort(part, axis=1, kind="stable")
    part = part[rows, col_order]
    cand = cand[rows, col_order]
    val_order = np.argsort(-cand, axis=1, kind="stable")
    out = part[rows, val_order]
    for r in fix:  # rare: exact-duplicate pileup at the boundary
        out[r] = np.argsort(-sims[r], kind="stable")[:kk]
    return out


def semantic_decontaminate(
    ds, bench_ds, threshold: float = 0.95,
    id_col: str = "vec_id", emb_col: str = "embedding",
    broadcast_bytes: int = 256 << 20,
):
    """Drop every corpus row whose embedding is ≥ ``threshold``
    cosine-similar to ANY benchmark row — the semantic complement of the
    n-gram ``trainprep.decontaminate`` (catches paraphrased eval leakage
    exact n-grams miss).

    Scale shape: benchmarks are small (thousands of eval rows), so the
    benchmark matrix broadcasts once via ray.put and every corpus batch
    runs ONE (n×d)@(d×m) matmul + row-max — the corpus never shuffles.
    Output rows: (id_col,) survivors.  Raises if the benchmark matrix
    exceeds ``broadcast_bytes`` (a benchmark that big is a bug, not a
    scale path)."""
    import ray

    bench_rows = bench_ds.take_all()
    if not bench_rows:
        return ds.map_batches(
            lambda b: b.select([id_col]), batch_format="pyarrow", zero_copy_batch=True
        )
    bmat = _normalize(
        np.vstack([np.asarray(r[emb_col], dtype=np.float64) for r in bench_rows])
    )
    if bmat.nbytes > broadcast_bytes:
        raise ValueError(
            f"semantic_decontaminate: benchmark matrix {bmat.nbytes} B exceeds "
            f"broadcast cap {broadcast_bytes} B"
        )
    b_ref = ray.put(bmat)

    def scrub(batch: pa.Table) -> pa.Table:
        bm = ray.get(b_ref)
        mat = _normalize(_embedding_matrix(batch, emb_col))
        hit = (mat @ bm.T).max(axis=1) >= threshold
        return batch.select([id_col]).filter(pa.array(~hit))

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def knn_graph(
    ds, n_neighbors: int = 5, k_clusters: int = 8, seed: int = 1,
    id_col: str = "vec_id", emb_col: str = "embedding", block: int = 4096,
):
    """embeddings → (id_col, neighbor_id, nn_rank): each row's exact cosine
    top-``n_neighbors`` WITHIN its embedding cluster — the cluster-bounded
    kNN self-join (the all-pairs O(N²) graph is intractable at corpus
    scale; clustering bounds each row's search to its cluster, the same
    approximation SemDeDup/IVF make).  Rows whose cluster holds no other
    member emit nothing.

    Rank order: cosine descending, neighbor id ascending on exact ties —
    deterministic and SQL-mirrorable.  The pairwise kernel is slab-blocked
    like ``semdedup``."""
    assigned = embedding_cluster(
        ds, k=k_clusters, seed=seed, id_col=id_col, emb_col=emb_col,
        keep_embedding=True,
    )

    def topk_in_cluster(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "nn_rank": pa.array([], pa.int64())}
        )
        if group.num_rows <= 1 or group.num_columns == 0:
            return empty
        g, ids, mat = _sorted_cluster_matrix(
            group, id_col, emb_col, 65536, "knn_graph"
        )
        n = len(ids)
        kk = min(n_neighbors, n - 1)
        out_src, out_nbr, out_rank = [], [], []
        for s in range(0, n, block):
            e = min(s + block, n)
            sims = mat[s:e] @ mat.T  # slab rows vs whole cluster
            rows = np.arange(s, e)
            sims[np.arange(e - s), rows] = -np.inf  # self is not a neighbor
            # top-k by (cosine desc, id asc): ids are sorted ascending, so
            # column order IS id order and the tie-break helper applies
            idx = _topk_tiebreak_rows(sims, kk)
            out_src.append(np.repeat(ids[rows], kk))
            out_nbr.append(ids[idx].reshape(-1))
            out_rank.append(np.tile(np.arange(1, kk + 1, dtype=np.int64), e - s))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_src), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_nbr), pa.int64()),
                "nn_rank": pa.array(np.concatenate(out_rank), pa.int64()),
            }
        )

    return assigned.groupby("cluster_id").map_groups(
        topk_in_cluster, batch_format="pyarrow"
    )
