"""SemDeDup family: deterministic centroid pick, nearest-centroid
assignment, within-cluster near-dup drop (slab-blocked pairwise kernel)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.cluster import embedding_cluster, semdedup


def _vec_table(mat: np.ndarray, ids=None) -> pa.Table:
    ids = np.arange(len(mat), dtype=np.int64) if ids is None else np.asarray(ids)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([row.tolist() for row in mat],
                                  pa.list_(pa.float32())),
        }
    )


@pytest.fixture(scope="module")
def clustered_vectors():
    rng = np.random.default_rng(3)
    # 3 well-separated gaussian blobs in 16d, unit-normalized
    centers = rng.normal(size=(3, 16)) * 10
    # noise sigma=3: same-blob cosine ~ |c|^2/(|c|^2 + 9d) ~ 0.92, safely
    # below the 0.995 dup threshold (incidental max ~0.993); planted 1e-3 perturbations stay ~1.0
    mat = np.vstack([centers[i % 3] + rng.normal(size=16) * 3 for i in range(240)])
    # planted near-dups: rows 240..249 are tiny perturbations of rows 0..9
    dups = mat[:10] + rng.normal(size=(10, 16)) * 1e-3
    mat = np.vstack([mat, dups])
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    return mat.astype(np.float32)


def test_embedding_cluster_assignment(ray_session, clustered_vectors):
    import ray.data as rd

    out = embedding_cluster(rd.from_arrow(_vec_table(clustered_vectors)), k=6, seed=1)
    rows = out.take_all()
    assert len(rows) == 250
    cids = {r["cluster_id"] for r in rows}
    assert len(cids) <= 6
    by_id = {r["vec_id"]: r["cluster_id"] for r in rows}
    # a near-identical copy must land in its original's cluster
    for i in range(10):
        assert by_id[240 + i] == by_id[i]
    # centroid rows assign to themselves (cosine 1 with their own centroid)
    for c in cids:
        assert by_id[c] == c


def test_embedding_cluster_partition_invariant(ray_session, clustered_vectors):
    import ray.data as rd

    t = _vec_table(clustered_vectors)
    a = {r["vec_id"]: r["cluster_id"]
         for r in embedding_cluster(rd.from_arrow(t).repartition(1), k=5).take_all()}
    b = {r["vec_id"]: r["cluster_id"]
         for r in embedding_cluster(rd.from_arrow(t).repartition(13), k=5).take_all()}
    assert a == b


def test_semdedup_drops_planted_near_dups(ray_session, clustered_vectors):
    import ray.data as rd

    # block=16 forces multiple slabs per cluster — exercises the blocked
    # prefix-matmul path, not just the single-slab case
    out = semdedup(
        rd.from_arrow(_vec_table(clustered_vectors)), k=6, threshold=0.995, block=16
    ).take_all()
    kept = {r["vec_id"]: r["kept"] for r in out}
    assert len(kept) == 250
    for i in range(10):
        assert kept[i] is True        # the smaller-id original survives
        assert kept[240 + i] is False  # its near-copy is dropped
    # nothing else is 0.995-similar in random blobs
    assert sum(not v for v in kept.values()) == 10


def test_semdedup_matches_bruteforce_policy(ray_session, clustered_vectors):
    import ray.data as rd

    t = _vec_table(clustered_vectors)
    thr = 0.8
    out = semdedup(rd.from_arrow(t), k=4, threshold=thr, block=32)
    rows = out.take_all()
    cl = {r["vec_id"]: r["cluster_id"] for r in rows}
    mat = clustered_vectors.astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = mat @ mat.T
    for r in rows:
        i = r["vec_id"]
        expect_drop = any(
            sims[i, j] >= thr and cl[j] == cl[i] for j in range(i)
        )
        assert r["kept"] == (not expect_drop), f"vec {i}"


def test_knn_graph_matches_bruteforce_within_cluster(ray_session, clustered_vectors):
    import ray.data as rd
    from fever_ray.ops.cluster import knn_graph

    t = _vec_table(clustered_vectors)
    out = knn_graph(rd.from_arrow(t), n_neighbors=3, k_clusters=4, block=32).take_all()
    cl = {
        r["vec_id"]: r["cluster_id"]
        for r in embedding_cluster(rd.from_arrow(t), k=4).take_all()
    }
    mat = clustered_vectors.astype(np.float64)
    mat = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = mat @ mat.T
    got = {}
    for r in out:
        got.setdefault(r["vec_id"], []).append((r["nn_rank"], r["neighbor_id"]))
    for i in range(len(mat)):
        peers = [j for j in range(len(mat)) if j != i and cl[j] == cl[i]]
        want = sorted(peers, key=lambda j: (-sims[i, j], j))[:3]
        nbrs = [n for _, n in sorted(got.get(i, []))]
        assert nbrs == want, f"vec {i}"


def test_knn_graph_exact_duplicate_tie_breaks_by_id(ray_session):
    import ray.data as rd
    from fever_ray.ops.cluster import knn_graph

    # three IDENTICAL vectors: cosine ties must resolve toward smaller ids
    v = np.array([0.6, 0.8], dtype=np.float32)
    t = _vec_table(np.vstack([v, v, v]), ids=[5, 9, 2])
    out = knn_graph(rd.from_arrow(t), n_neighbors=2, k_clusters=1).take_all()
    nbrs = {r["vec_id"]: [] for r in out}
    for r in sorted(out, key=lambda r: (r["vec_id"], r["nn_rank"])):
        nbrs[r["vec_id"]].append(r["neighbor_id"])
    assert nbrs == {2: [5, 9], 5: [2, 9], 9: [2, 5]}


def test_topk_tiebreak_rows_matches_stable_argsort():
    # quantized random values force heavy exact ties, including duplicate
    # pileups straddling the argpartition boundary (the repair path)
    from fever_ray.ops.cluster import _topk_tiebreak_rows

    rng = np.random.default_rng(7)
    for trial in range(20):
        m = rng.integers(4, 40)
        kk = int(rng.integers(1, m))
        sims = rng.integers(0, 4, size=(8, m)).astype(np.float64)
        got = _topk_tiebreak_rows(sims.copy(), kk)
        want = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        assert np.array_equal(got, want), (trial, m, kk)


def test_knn_graph_duplicate_pileup_beyond_k(ray_session):
    # four IDENTICAL vectors, top-2: the candidate set at the boundary is
    # ambiguous for argpartition — the repair path must pick smallest ids
    import ray.data as rd
    from fever_ray.ops.cluster import knn_graph

    v = np.array([0.6, 0.8], dtype=np.float32)
    t = _vec_table(np.vstack([v, v, v, v]), ids=[7, 3, 11, 5])
    out = knn_graph(rd.from_arrow(t), n_neighbors=2, k_clusters=1).take_all()
    nbrs = {}
    for r in sorted(out, key=lambda r: (r["vec_id"], r["nn_rank"])):
        nbrs.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    assert nbrs == {3: [5, 7], 5: [3, 7], 7: [3, 5], 11: [3, 5]}


def test_semantic_decontaminate(ray_session, clustered_vectors):
    import ray.data as rd
    from fever_ray.ops.cluster import semantic_decontaminate

    t = _vec_table(clustered_vectors)
    # benchmark = originals 0..9; their planted near-copies 240..249 must
    # drop; everything else survives at a 0.995 threshold
    bench_rows = [i for i in range(10)]
    corpus = pa.table(
        {
            "vec_id": pa.array([i for i in range(10, 250)], pa.int64()),
            "embedding": t.column("embedding").take(
                pa.array([i for i in range(10, 250)])
            ),
        }
    )
    bench = pa.table(
        {
            "vec_id": pa.array(bench_rows, pa.int64()),
            "embedding": t.column("embedding").take(pa.array(bench_rows)),
        }
    )
    kept = {
        r["vec_id"]
        for r in semantic_decontaminate(
            rd.from_arrow(corpus), rd.from_arrow(bench), threshold=0.995
        ).take_all()
    }
    for i in range(10):
        assert 240 + i not in kept
    assert set(range(10, 240)) <= kept

    # empty benchmark: everything survives
    kept2 = {
        r["vec_id"]
        for r in semantic_decontaminate(
            rd.from_arrow(corpus), rd.from_arrow(bench.slice(0, 0)), threshold=0.5
        ).take_all()
    }
    assert kept2 == set(range(10, 250))


def test_embedding_cluster_empty_input_raises(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(_vec_table(np.zeros((0, 8), dtype=np.float32)))
    with pytest.raises(Exception):
        embedding_cluster(empty, k=3)
