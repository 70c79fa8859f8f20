"""Integer fixed-point PageRank (ops.graph)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.graph import pagerank


def _local_pagerank(src, dst, iterations, scale=10**12, num=85, den=100):
    """Driver-side reference of the exact integer update rule."""
    nodes = np.unique(src)
    idx = {int(v): i for i, v in enumerate(nodes)}
    deg = np.zeros(len(nodes), dtype=np.int64)
    for s in src:
        deg[idx[int(s)]] += 1
    n = len(nodes)
    base = scale // n
    hold = ((den - num) * base) // den
    r = np.full(n, base, dtype=np.int64)
    for _ in range(iterations):
        share = r // deg
        s_in = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            s_in[idx[int(d)]] += share[idx[int(s)]]
        r = hold + (num * s_in) // den
    return nodes, r


def _edges_ds(ray_session, src, dst, parts=4):
    t = pa.table(
        {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
    )
    return ray_session.data.from_arrow(t).repartition(parts)


def test_pagerank_matches_local_reference(ray_session):
    rng = np.random.default_rng(11)
    n = 60
    src = np.repeat(np.arange(n), 5)
    dst = (src * 7 + rng.integers(0, 10_000, size=len(src))) % n
    got = pagerank(_edges_ds(ray_session, src, dst), iterations=3)
    nodes, want = _local_pagerank(src, dst, 3)
    np.testing.assert_array_equal(
        got.column("node").to_numpy(zero_copy_only=False), nodes
    )
    np.testing.assert_array_equal(
        got.column("rank").to_numpy(zero_copy_only=False), want
    )


def test_pagerank_partition_invariant(ray_session):
    """Floor arithmetic + associative integer sums ⇒ identical ranks under
    any partitioning of the edge stream."""
    rng = np.random.default_rng(5)
    src = np.repeat(np.arange(30), 4)
    dst = (src + rng.integers(1, 29, size=len(src))) % 30
    a = pagerank(_edges_ds(ray_session, src, dst, parts=1), iterations=4)
    b = pagerank(_edges_ds(ray_session, src, dst, parts=7), iterations=4)
    assert a.equals(b)


def test_pagerank_sink_heavy_node_ranks_highest(ray_session):
    # every node points at node 0; node 0 points at itself
    src = np.arange(20)
    dst = np.zeros(20, dtype=np.int64)
    out = pagerank(_edges_ds(ray_session, src, dst), iterations=3)
    r = out.column("rank").to_numpy(zero_copy_only=False)
    nodes = out.column("node").to_numpy(zero_copy_only=False)
    assert nodes[np.argmax(r)] == 0
    assert r[np.argmax(r)] > 10 * np.median(r)


def test_pagerank_zero_iterations_uniform(ray_session):
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    out = pagerank(_edges_ds(ray_session, src, dst), iterations=0)
    r = out.column("rank").to_numpy(zero_copy_only=False)
    assert (r == 10**12 // 4).all()


def test_pagerank_open_graph_raises(ray_session):
    # dst 99 never appears as a src → alignment must hard-fail, not skip
    with pytest.raises(Exception):
        pagerank(
            _edges_ds(ray_session, np.array([0, 1]), np.array([1, 99])),
            iterations=1,
        )


def test_pagerank_empty(ray_session):
    out = pagerank(
        _edges_ds(ray_session, np.array([], np.int64), np.array([], np.int64), 1),
        iterations=2,
    )
    assert out.num_rows == 0


def _brute_triangles(edges):
    """Per-node triangle counts by brute force over canonical edges."""
    from itertools import combinations

    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for a, b in es:
        for c in adj[a] & adj[b]:
            if c > b:  # count each triangle once (a < b < c ordering)
                for v in (a, b, c):
                    out[v] = out.get(v, 0) + 1
    return out


def test_triangle_counts_matches_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.graph import triangle_counts

    rng = np.random.default_rng(9)
    n_nodes = 60
    m = 420
    a = rng.integers(0, n_nodes, m)
    b = rng.integers(0, n_nodes, m)
    # duplicates, reversed duplicates and self-loops included on purpose
    t = pa.table(
        {
            "src": pa.array(np.concatenate([a, b[:50]]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a[:50]]), pa.int64()),
        }
    )
    outs = []
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            {
                r["node"]: r["n_triangles"]
                for r in triangle_counts(ds, num_partitions=8).take_all()
            }
        )
    want = _brute_triangles(zip(a.tolist() + b[:50].tolist(),
                                b.tolist() + a[:50].tolist()))
    assert outs[0] == want
    assert outs[0] == outs[1]
    assert sum(want.values()) % 3 == 0 and sum(want.values()) > 0


def test_triangle_counts_edges_and_guard(ray_session):
    import ray.data as rd

    from fever_ray.ops.graph import triangle_counts

    # one explicit triangle + a dangling edge + a self loop
    t = pa.table(
        {
            "src": pa.array([1, 2, 1, 3, 4], pa.int64()),
            "dst": pa.array([2, 3, 3, 4, 4], pa.int64()),
        }
    )
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(rd.from_arrow(t)).take_all()
    }
    assert got == {1: 1, 2: 1, 3: 1}
    # a 40-star around node 0 with all spokes interconnected would need
    # out-degree 39 somewhere; cap 4 must trip loudly
    hub = pa.table(
        {
            "src": pa.array(np.repeat(0, 40), pa.int64()),
            "dst": pa.array(np.arange(1, 41), pa.int64()),
        }
    )
    full = pa.concat_tables(
        [
            hub,
            pa.table(
                {
                    "src": pa.array(np.repeat(np.arange(1, 41), 40), pa.int64()),
                    "dst": pa.array(np.tile(np.arange(1, 41), 40), pa.int64()),
                }
            ),
        ]
    )
    with pytest.raises(Exception, match="out-degree"):
        triangle_counts(
            rd.from_arrow(full), max_out_degree=4
        ).materialize()


def test_edge_support_clique_and_bridge(ray_session):
    import ray.data as rd

    from fever_ray.ops.graph import edge_support

    # 4-clique {0,1,2,3}: every clique edge has support 2; bridge 3-9
    # closes no triangle -> absent from the output entirely
    src = [0, 0, 0, 1, 1, 2, 3]
    dst = [1, 2, 3, 2, 3, 3, 9]
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(3)
    out = edge_support(ds).to_pandas().sort_values(["lo", "hi"]).reset_index(drop=True)
    got = {(int(r["lo"]), int(r["hi"])): int(r["support"]) for _, r in out.iterrows()}
    want = {(a, b): 2 for a, b in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]}
    assert got == want

    # duplicate + reversed edges dedup before counting; self-loops drop
    noisy = rd.from_arrow(
        pa.table({"src": pa.array(src + [1, 3, 5], pa.int64()),
                  "dst": pa.array(dst + [0, 3, 5], pa.int64())})
    )
    out2 = edge_support(noisy).to_pandas()
    got2 = {(int(r["lo"]), int(r["hi"])): int(r["support"]) for _, r in out2.iterrows()}
    assert got2 == want

    empty = edge_support(
        rd.from_arrow(pa.table({"src": pa.array([7], pa.int64()),
                                "dst": pa.array([7], pa.int64())}))
    )
    assert empty.count() == 0
    # Ray's to_pandas drops columns on zero-row datasets; schema() keeps them
    assert sorted(empty.schema().names) == ["hi", "lo", "support"]


def test_k_core_peels_pendant_chain(ray_session):
    import ray.data as rd

    from fever_ray.ops.graph import k_core

    # 4-clique {0,1,2,3} + pendant chain 3-10-11-12: the chain peels
    # inward over multiple rounds; the 3-core is exactly the clique
    src = [0, 0, 0, 1, 1, 2, 3, 10, 11]
    dst = [1, 2, 3, 2, 3, 3, 10, 11, 12]
    ds = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ).repartition(3)
    out = k_core(ds, k=3).to_pandas().sort_values("node").reset_index(drop=True)
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["deg"].tolist() == [3, 3, 3, 3]

    # k above the max core -> everything peels, schema survives
    gone = k_core(rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    ), k=4)
    assert gone.count() == 0
    assert sorted(gone.schema().names) == ["deg", "node"]

    with pytest.raises(Exception, match="k must be"):
        k_core(ds, k=0)


def _seeds_ds(ray_session, nodes, parts=2):
    t = pa.table({"node": pa.array(nodes, pa.int64())})
    return ray_session.data.from_arrow(t).repartition(parts)


def test_bfs_layers_path_and_cycle(ray_session):
    from fever_ray.ops.graph import bfs_layers

    # path 0-1-2-3-4 plus a 3-cycle 10-11-12 reachable from 4 via (4,10),
    # and an unreachable island 20-21
    src = [0, 1, 2, 3, 4, 10, 11, 12, 20]
    dst = [1, 2, 3, 4, 10, 11, 12, 10, 21]
    out = (
        bfs_layers(
            _edges_ds(ray_session, src, dst),
            _seeds_ds(ray_session, [0]),
            rounds=10,
        )
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 10: 5, 11: 6, 12: 6}


def test_bfs_layers_undirected_and_multi_seed_min_dist(ray_session):
    from fever_ray.ops.graph import bfs_layers

    # edges stored one direction only; BFS must walk both ways.
    # two seeds — every node takes the MINIMUM distance.
    src = [5, 4, 3, 2, 1]
    dst = [4, 3, 2, 1, 0]
    out = (
        bfs_layers(
            _edges_ds(ray_session, src, dst),
            _seeds_ds(ray_session, [0, 5, 5]),
            rounds=10,
        )
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert out == {0: 0, 5: 0, 1: 1, 4: 1, 2: 2, 3: 2}


def test_bfs_layers_rounds_cap_and_isolated_seed(ray_session):
    from fever_ray.ops.graph import bfs_layers

    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 4]
    out = (
        bfs_layers(
            _edges_ds(ray_session, src, dst),
            _seeds_ds(ray_session, [0, 99]),  # 99 touches no edge
            rounds=2,
        )
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    # dist > rounds rows are absent; isolated seed still reports dist 0
    assert out == {0: 0, 99: 0, 1: 1, 2: 2}


def test_bfs_layers_zero_rounds_and_empty(ray_session):
    from fever_ray.ops.graph import bfs_layers

    out = (
        bfs_layers(
            _edges_ds(ray_session, [0], [1]),
            _seeds_ds(ray_session, [7]),
            rounds=0,
        )
        .to_pandas()
    )
    assert out["node"].tolist() == [7] and out["dist"].tolist() == [0]
    empty = bfs_layers(
        _edges_ds(ray_session, [0], [1]),
        _seeds_ds(ray_session, np.array([], np.int64)),
        rounds=3,
    ).to_pandas()
    assert len(empty) == 0


def _local_hits(src, dst, iterations, scale=10**9):
    """Driver-side reference of the exact integer HITS update rule."""
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        ar = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            ar[idx[int(d)]] += h[idx[int(s)]]
        a = ar // (int(ar.max()) // scale + 1)
        hr = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            hr[idx[int(s)]] += a[idx[int(d)]]
        h = hr // (int(hr.max()) // scale + 1)
    return nodes, a, h


def test_hits_matches_local_reference(ray_session):
    from fever_ray.ops.graph import hits

    rng = np.random.default_rng(17)
    src = np.repeat(np.arange(40), 4)
    dst = (src * 3 + rng.integers(0, 1000, size=len(src))) % 55  # open graph
    got = hits(_edges_ds(ray_session, src, dst), iterations=2)
    nodes, a, h = _local_hits(src, dst, 2)
    np.testing.assert_array_equal(
        got.column("node").to_numpy(zero_copy_only=False), nodes
    )
    np.testing.assert_array_equal(
        got.column("auth").to_numpy(zero_copy_only=False), a
    )
    np.testing.assert_array_equal(
        got.column("hub").to_numpy(zero_copy_only=False), h
    )


def test_hits_partition_invariant(ray_session):
    from fever_ray.ops.graph import hits

    rng = np.random.default_rng(23)
    src = np.repeat(np.arange(25), 3)
    dst = (src + rng.integers(1, 24, size=len(src))) % 25
    a = hits(_edges_ds(ray_session, src, dst, parts=1), iterations=3)
    b = hits(_edges_ds(ray_session, src, dst, parts=9), iterations=3)
    assert a.equals(b)


def test_hits_star_hub_and_authority(ray_session):
    from fever_ray.ops.graph import hits

    # node 0 points at everyone (pure hub); everyone points at node 1
    # (pure authority, beyond 0's fan-out)
    src = np.concatenate([np.zeros(10, np.int64), np.arange(2, 12)])
    dst = np.concatenate([np.arange(1, 11), np.ones(10, np.int64)])
    out = hits(_edges_ds(ray_session, src, dst), iterations=2)
    nodes = out.column("node").to_numpy(zero_copy_only=False)
    a = out.column("auth").to_numpy(zero_copy_only=False)
    h = out.column("hub").to_numpy(zero_copy_only=False)
    assert nodes[a.argmax()] == 1   # the in-degree magnet is the top authority
    assert nodes[h.argmax()] == 0   # the fan-out node is the top hub
    with pytest.raises(ValueError):
        hits(_edges_ds(ray_session, src, dst), iterations=0)


def _local_ppr(src, dst, seeds, iterations, scale=10**12, num=85, den=100):
    nodes = np.unique(src)
    idx = {int(v): i for i, v in enumerate(nodes)}
    deg = np.zeros(len(nodes), dtype=np.int64)
    for s in src:
        deg[idx[int(s)]] += 1
    n = len(nodes)
    base = scale // len(seeds)
    mask = np.zeros(n, dtype=np.int64)
    for s in seeds:
        mask[idx[int(s)]] = 1
    hold = mask * (((den - num) * base) // den)
    r = mask * base
    for _ in range(iterations):
        share = r // deg
        s_in = np.zeros(n, dtype=np.int64)
        for s, d in zip(src, dst):
            s_in[idx[int(d)]] += share[idx[int(s)]]
        r = hold + (num * s_in) // den
    return nodes, r


def test_personalized_pagerank_matches_local_reference(ray_session):
    rng = np.random.default_rng(31)
    n = 50
    src = np.repeat(np.arange(n), 4)
    dst = (src * 7 + rng.integers(0, 10_000, size=len(src))) % n
    seeds = [0, 3, 11]
    got = pagerank(_edges_ds(ray_session, src, dst), iterations=3, seeds=seeds)
    nodes, want = _local_ppr(src, dst, seeds, 3)
    np.testing.assert_array_equal(
        got.column("node").to_numpy(zero_copy_only=False), nodes
    )
    np.testing.assert_array_equal(
        got.column("rank").to_numpy(zero_copy_only=False), want
    )


def test_personalized_pagerank_mass_stays_near_seeds(ray_session):
    # two disconnected 5-cycles; seeding in the first leaves the second
    # with exactly zero mass
    c1 = np.arange(5)
    c2 = np.arange(5, 10)
    src = np.concatenate([c1, c2])
    dst = np.concatenate([(c1 + 1) % 5, (c2 - 5 + 1) % 5 + 5])
    out = pagerank(_edges_ds(ray_session, src, dst), iterations=4, seeds=[0])
    nodes = out.column("node").to_numpy(zero_copy_only=False)
    r = out.column("rank").to_numpy(zero_copy_only=False)
    assert r[nodes < 5].sum() > 0
    assert (r[nodes >= 5] == 0).all()
    with pytest.raises(ValueError):
        pagerank(_edges_ds(ray_session, src, dst), seeds=[99])
    with pytest.raises(ValueError):
        pagerank(_edges_ds(ray_session, src, dst), seeds=[])
