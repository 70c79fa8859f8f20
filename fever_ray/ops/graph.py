"""Iterative graph algorithms over edge datasets.

``connected_components`` (ops/dedup.py) covers the unbounded-node,
shuffle-per-round posture; this module adds the bounded-node iterative
family — PageRank-style power iteration where the per-round state (one
integer per node) fits a broadcast, so each round is ONE streaming pass
over the edges with tree-combined partial sums and no shuffle.

Everything is integer fixed-point: floor arithmetic is associative-safe
under any partial-sum grouping AND reproducible by a SQL engine unrolling
the same iterations, so the result can be value-hash gated — float
PageRank can never be bit-stable across engines or partitionings.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

logger = logging.getLogger(__name__)


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
    seeds=None,
):
    """Integer fixed-point PageRank over a CLOSED edge set (every dst also
    appears as a src — the caller's edge construction guarantees it, e.g.
    by mapping dst into the node id range).  Returns (node, rank) for every
    node; rank units are fixed-point with total initial mass ``scale``.

    Update rule (pure int64 floor arithmetic, mirrored exactly in SQL):

        base   = scale // n
        share  = r[j] // outdeg[j]
        r'[i]  = ((den-num)·base) // den + (num · Σ_{j→i} share[j]) // den

    ``seeds`` switches on PERSONALIZED PageRank (random walk with
    restart): the initial mass and the per-round restart mass land only
    on the seed nodes (base = scale // len(seeds) on seeds, 0 elsewhere)
    — the standard seed-relative relevance ranking ("what is near these
    nodes?").  Seeds must be existing src nodes; the arithmetic stays
    all-integer so the seeded variant value-hashes too.

    Scale shape (10^9+ edges): the edge list streams once per iteration —
    per-batch contribution sums grouped by dst (np.add.at over the unique
    dsts of the batch), tree-combined to one (node, sum) table; driver
    state is ONE int64 per node, broadcast per round.  Bounded node sets
    (hosts, users, domains: ≤10^8) are the target — the same posture as
    the grouped-sketch key spaces.  For unbounded nodes, re-express each
    round as a groupby shuffle (the connected_components posture).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not 0 < damping_num <= damping_den:
        raise ValueError("damping must satisfy 0 < num <= den")
    import ray

    from .aggregates import tree_groupby

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col)
        d = batch.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return pa.table(
            {
                "src": pa.array(s.to_numpy(zero_copy_only=False).astype(np.int64)),
                "dst": pa.array(d.to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )

    skinny = edges_ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        uk, uc = np.unique(s, return_counts=True)
        return pa.table(
            {"node": pa.array(uk, pa.int64()), "c": pa.array(uc, pa.int64())}
        )

    deg_parts = [
        t
        for t in ray.get(
            tree_groupby(
                skinny.map_batches(deg_partial, batch_format="pyarrow"),
                ["node"],
                [("c", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not deg_parts:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )
    degt = pa.concat_tables(deg_parts)
    nodes = degt.column("node").to_numpy(zero_copy_only=False)
    deg = degt.column("c").to_numpy(zero_copy_only=False)
    order = np.argsort(nodes)
    nodes, deg = np.ascontiguousarray(nodes[order]), np.ascontiguousarray(deg[order])
    n = len(nodes)
    if n == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "rank": pa.array([], pa.int64())}
        )

    base = scale // n
    if seeds is None:
        hold = ((damping_den - damping_num) * base) // damping_den
        r = np.full(n, base, dtype=np.int64)
    else:
        sd = np.unique(np.asarray(list(seeds), dtype=np.int64))
        if len(sd) == 0:
            raise ValueError("pagerank: seeds must be non-empty when given")
        pos = np.searchsorted(nodes, sd)
        if (pos >= n).any() or (nodes[np.minimum(pos, n - 1)] != sd).any():
            raise ValueError("pagerank: seed not in the src node set")
        seed_mass = scale // len(sd)
        mask = np.zeros(n, dtype=np.int64)
        mask[pos] = 1
        hold = mask * (((damping_den - damping_num) * seed_mass) // damping_den)
        r = mask * seed_mass

    for _ in range(iterations):
        share = r // deg
        state = ray.put((nodes, share))

        def contrib(batch: pa.Table) -> pa.Table:
            nd, sh = ray.get(state)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            si = np.searchsorted(nd, s)  # closed graph: every src is a node
            uk, inv = np.unique(d, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sums, inv, sh[si])
            return pa.table(
                {"node": pa.array(uk, pa.int64()), "s": pa.array(sums, pa.int64())}
            )

        c_parts = [
            t
            for t in ray.get(
                tree_groupby(
                    skinny.map_batches(contrib, batch_format="pyarrow"),
                    ["node"],
                    [("s", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        ct = pa.concat_tables(c_parts) if c_parts else pa.table(
            {"node": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
        )
        s_aligned = np.zeros(n, dtype=np.int64)
        if ct.num_rows:
            cn = ct.column("node").to_numpy(zero_copy_only=False)
            cs = ct.column("s").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(nodes, cn)
            # dsts outside the node set would corrupt the alignment — the
            # closed-graph precondition makes this a hard error, not a skip
            if (pos >= n).any() or (nodes[np.minimum(pos, n - 1)] != cn).any():
                raise ValueError(
                    "pagerank: edge dst not in the src node set (open graph)"
                )
            s_aligned[pos] = cs
        r = hold + (damping_num * s_aligned) // damping_den

    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank": pa.array(r, pa.int64())}
    )


def hits(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 2,
    scale: int = 10**9,
):
    """Integer fixed-point HITS (hubs & authorities) over a directed edge
    set — PageRank's companion link-analysis ranking (Kleinberg 1999),
    here with the power iteration quantized so the result value-hashes:

        a_raw[i] = Σ_{j→i} h[j]          (sum of in-neighbor hub scores)
        a[i]     = a_raw[i] // (max(a_raw) // scale + 1)
        h_raw[j] = Σ_{j→i} a[i]          (sum of out-neighbor authorities)
        h[j]     = h_raw[j] // (max(h_raw) // scale + 1)

    starting from h ≡ scale.  The divisor-downscale normalization replaces
    the classic L2 norm: it is pure int64 floor arithmetic (no product
    ever exceeds max_degree·scale, so nothing overflows), it preserves the
    within-round ranking exactly, and a SQL engine unrolling the same
    iterations reproduces every bit.  Returns (node, auth, hub) for every
    node in src ∪ dst.

    Scale shape (10^9+ edges): identical posture to ``pagerank`` — the
    edge list streams twice per iteration (dst-grouped then src-grouped
    partial sums through the bounded coalesce-tree); driver state is two
    int64 per node, broadcast per round.  Bounded node sets (hosts,
    users, domains ≤ 10^8) are the target; unbounded nodes want the
    shuffle-per-round `connected_components` posture instead."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    import ray

    from .aggregates import tree_groupby

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col)
        d = batch.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return pa.table(
            {
                "src": pa.array(s.to_numpy(zero_copy_only=False).astype(np.int64)),
                "dst": pa.array(d.to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )

    skinny = edges_ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def node_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch.column("src").to_numpy(zero_copy_only=False),
                    batch.column("dst").to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {"node": pa.array(u, pa.int64()), "c": pa.array(np.ones(len(u), np.int64))}
        )

    n_parts = [
        t
        for t in ray.get(
            tree_groupby(
                skinny.map_batches(node_partial, batch_format="pyarrow"),
                ["node"],
                [("c", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    empty = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "auth": pa.array([], pa.int64()),
            "hub": pa.array([], pa.int64()),
        }
    )
    if not n_parts:
        return empty
    nodes = np.sort(
        pa.concat_tables(n_parts).column("node").to_numpy(zero_copy_only=False)
    )
    nodes = np.ascontiguousarray(nodes)
    n = len(nodes)
    if n == 0:
        return empty

    def _edge_sum(vals: np.ndarray, group_col: str, read_col: str) -> np.ndarray:
        """One streaming pass: Σ vals[read_col's node] grouped by group_col,
        aligned back onto the sorted node vector (missing keys → 0)."""
        state = ray.put((nodes, vals))

        def contrib(batch: pa.Table) -> pa.Table:
            nd, v = ray.get(state)
            g = batch.column(group_col).to_numpy(zero_copy_only=False)
            r = batch.column(read_col).to_numpy(zero_copy_only=False)
            ri = np.searchsorted(nd, r)  # node set is closed over src ∪ dst
            uk, inv = np.unique(g, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.int64)
            np.add.at(sums, inv, v[ri])
            return pa.table(
                {"node": pa.array(uk, pa.int64()), "s": pa.array(sums, pa.int64())}
            )

        parts = [
            t
            for t in ray.get(
                tree_groupby(
                    skinny.map_batches(contrib, batch_format="pyarrow"),
                    ["node"],
                    [("s", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        out = np.zeros(n, dtype=np.int64)
        if parts:
            ct = pa.concat_tables(parts)
            cn = ct.column("node").to_numpy(zero_copy_only=False)
            cs = ct.column("s").to_numpy(zero_copy_only=False)
            out[np.searchsorted(nodes, cn)] = cs
        return out

    h = np.full(n, scale, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iterations):
        a_raw = _edge_sum(h, "dst", "src")
        a = a_raw // (int(a_raw.max()) // scale + 1)
        h_raw = _edge_sum(a, "src", "dst")
        h = h_raw // (int(h_raw.max()) // scale + 1)

    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "auth": pa.array(a, pa.int64()),
            "hub": pa.array(h, pa.int64()),
        }
    )


def _canonical_edges(edges_ds, src_col: str, dst_col: str, P: int):
    """Canonical distinct undirected edge set as a materialized Dataset of
    (lo, hi) int64 rows: self-loops drop, (a, b)/(b, a)/duplicates collapse
    in a skinny hash-of-pair shuffle.  Shared by the wedge-join family and
    ``k_core``."""
    from ..sketches.hashing import splitmix64

    pu = np.uint64(P)
    _C = np.uint64(0x9E3779B97F4A7C15)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col)
        d = batch.column(dst_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        sv = s.to_numpy(zero_copy_only=False).astype(np.int64)
        dv = d.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = sv != dv  # self-loops add no structure
        sv, dv = sv[keep], dv[keep]
        lo = np.minimum(sv, dv)
        hi = np.maximum(sv, dv)
        with np.errstate(over="ignore"):
            part = splitmix64(lo.view(np.uint64) * _C + hi.view(np.uint64))
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "ep": pa.array((part % pu).astype(np.int32), pa.int32()),
            }
        )

    def dedup_edges(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return pa.table(
                {"lo": pa.array([], pa.int64()), "hi": pa.array([], pa.int64())}
            )
        lo = group.column("lo").to_numpy(zero_copy_only=False)
        hi = group.column("hi").to_numpy(zero_copy_only=False)
        o = np.lexsort((hi, lo))
        lo, hi = lo[o], hi[o]
        first = np.concatenate(([True], (np.diff(lo) != 0) | (np.diff(hi) != 0)))
        return pa.table(
            {"lo": pa.array(lo[first], pa.int64()),
             "hi": pa.array(hi[first], pa.int64())}
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ep")
        .map_groups(dedup_edges, batch_format="pyarrow")
        .materialize()
    )


def _wedge_matches(
    edges_ds,
    src_col: str,
    dst_col: str,
    num_partitions: int,
    max_out_degree: int,
    credit,
    credit_empty: pa.Table,
    opname: str,
):
    """Shared degree-ordered wedge-join pipeline of ``triangle_counts`` /
    ``edge_support``: canonicalize+dedup edges, orient by (degree, id)
    rank, expand wedges per source partition, hash-join wedges against the
    directed edge set per (x, y) partition, then hand each partition's
    matched-triangle table ``hit`` (columns x, y, center) to ``credit`` to
    turn into partial rows.  Returns the credited Dataset, or None for an
    edgeless graph."""
    import ray

    from ..ops.aggregates import tree_groupby
    from ..ops.dedup import _key_runs
    from ..sketches.hashing import splitmix64

    P = int(num_partitions)
    pu = np.uint64(P)
    _C = np.uint64(0x9E3779B97F4A7C15)

    edges = _canonical_edges(edges_ds, src_col, dst_col, P)

    # undirected degrees → (degree, id) rank per node, broadcast once
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch.column("lo").to_numpy(zero_copy_only=False),
                batch.column("hi").to_numpy(zero_copy_only=False),
            ]
        )
        uk, uc = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(uk, pa.int64()), "c": pa.array(uc, pa.int64())}
        )

    deg_parts = [
        t
        for t in ray.get(
            tree_groupby(
                edges.map_batches(deg_partial, batch_format="pyarrow"),
                ["node"],
                [("c", "sum")],
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    if not deg_parts:
        return None
    degt = pa.concat_tables(deg_parts)
    nodes = degt.column("node").to_numpy(zero_copy_only=False)
    deg = degt.column("c").to_numpy(zero_copy_only=False)
    o = np.argsort(nodes)
    nodes, deg = np.ascontiguousarray(nodes[o]), np.ascontiguousarray(deg[o])
    rank = np.empty(len(nodes), dtype=np.int64)
    rank[np.lexsort((nodes, deg))] = np.arange(len(nodes), dtype=np.int64)
    rank_ref = ray.put((nodes, rank))

    def orient(batch: pa.Table) -> pa.Table:
        ns, rk = ray.get(rank_ref)  # numpy pair — zero-copy from plasma
        lo = batch.column("lo").to_numpy(zero_copy_only=False)
        hi = batch.column("hi").to_numpy(zero_copy_only=False)
        rlo = rk[np.searchsorted(ns, lo)]
        rhi = rk[np.searchsorted(ns, hi)]
        sw = rhi < rlo
        u = np.where(sw, hi, lo)
        v = np.where(sw, lo, hi)
        rv = np.where(sw, rlo, rhi)
        with np.errstate(over="ignore"):
            p2 = splitmix64(u.view(np.uint64) * _C + v.view(np.uint64))
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "rv": pa.array(rv, pa.int64()),
                "wp": pa.array(
                    (splitmix64(u.view(np.uint64)) % pu).astype(np.int32),
                    pa.int32(),
                ),
                "mp": pa.array((p2 % pu).astype(np.int32), pa.int32()),
            }
        )

    directed = edges.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges_in_partition(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                "x": pa.array([], pa.int64()),
                "y": pa.array([], pa.int64()),
                "center": pa.array([], pa.int64()),
                "mp": pa.array([], pa.int32()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return out_empty
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        rv = group.column("rv").to_numpy(zero_copy_only=False)
        o = np.lexsort((rv, u))
        u, v = u[o], v[o]
        starts = _key_runs(u)
        lens = np.diff(starts)
        if lens.max(initial=0) > max_out_degree:
            raise ValueError(
                f"{opname}: a node has out-degree {int(lens.max())} "
                f"after degree orientation (> max_out_degree="
                f"{max_out_degree}) — wedge expansion would explode; raise "
                "the cap only with the memory to match"
            )
        xs, ys, cs = [], [], []
        for L in np.unique(lens):
            if L < 2:
                continue
            rs = starts[:-1][lens == L]
            mat = v[rs[:, None] + np.arange(int(L))[None, :]]
            iu, ju = np.triu_indices(int(L), k=1)
            xs.append(mat[:, iu].ravel())
            ys.append(mat[:, ju].ravel())
            cs.append(np.repeat(u[rs], len(iu)))
        if not xs:
            return out_empty
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        c = np.concatenate(cs)
        with np.errstate(over="ignore"):
            p2 = splitmix64(x.view(np.uint64) * _C + y.view(np.uint64))
        return pa.table(
            {
                "x": pa.array(x, pa.int64()),
                "y": pa.array(y, pa.int64()),
                "center": pa.array(c, pa.int64()),
                "mp": pa.array((p2 % pu).astype(np.int32), pa.int32()),
            }
        )

    wedges = (
        directed.groupby("wp")
        .map_groups(wedges_in_partition, batch_format="pyarrow")
        .materialize()
    )

    # union-tag co-group: wedges and directed edges meet in hash-of-(x, y)
    # buckets; Arrow's hash join finds closing edges, then each matched
    # triangle credits its three corners
    def tag_wedge(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": batch.column("x"),
                "y": batch.column("y"),
                "center": batch.column("center"),
                "kind": pa.array(
                    np.zeros(batch.num_rows, np.int8), pa.int8()
                ),
                "mp": batch.column("mp"),
            }
        )

    def tag_edge(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": batch.column("u"),
                "y": batch.column("v"),
                "center": pa.nulls(batch.num_rows, pa.int64()),
                "kind": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
                "mp": batch.column("mp"),
            }
        )

    tagged = wedges.map_batches(tag_wedge, batch_format="pyarrow").union(
        directed.map_batches(tag_edge, batch_format="pyarrow")
    )

    def match_partition(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return credit_empty
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        w = group.filter(pa.array(kind == 0)).select(["x", "y", "center"])
        e = group.filter(pa.array(kind == 1)).select(["x", "y"])
        if not w.num_rows or not e.num_rows:
            return credit_empty
        hit = w.join(e, keys=["x", "y"], join_type="inner")
        if not hit.num_rows:
            return credit_empty
        return credit(hit)

    return tagged.groupby("mp").map_groups(
        match_partition, batch_format="pyarrow"
    )


def triangle_counts(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 32,
    max_out_degree: int = 1 << 16,
):
    """Per-node triangle counts over an undirected simple graph — the
    clustering / community-density primitive (how socially embedded is
    this host / author / near-dup cluster).  Output rows: (``node``,
    ``n_triangles`` int64) for every node in ≥ 1 triangle; each triangle
    credits all three corners once.

    Algorithm: the classic degree-ordered wedge join (``_wedge_matches``).
    Edges canonicalize (lo, hi), self-loops drop, duplicates dedup in a
    skinny hash-of-pair shuffle; every edge then orients from its
    lower-(degree, id)-rank endpoint, which bounds out-degree by O(√m) on
    any graph; wedges (two out-neighbors of one source, rank-ordered)
    match against the directed edge set in hash-of-(x, y) buckets via
    Arrow's C++ hash join.

    Scale shape: degrees ride the bounded-node broadcast contract this
    module shares with `pagerank` (one rank per node, ray.put once);
    wedge expansion is the by-run-length triu gather (no per-run Python);
    the ONLY corpus-scale exchanges move skinny (node, node) pairs.
    ``max_out_degree`` turns a hub that defeats the √m bound into a loud
    error instead of a silent wedge explosion."""
    from ..ops.aggregates import tree_groupby

    empty = pa.table(
        {"node": pa.array([], pa.int64()), "n_triangles": pa.array([], pa.int64())}
    )

    def credit(hit: pa.Table) -> pa.Table:
        tri_nodes = np.concatenate(
            [
                hit.column("x").to_numpy(zero_copy_only=False),
                hit.column("y").to_numpy(zero_copy_only=False),
                hit.column("center").to_numpy(zero_copy_only=False),
            ]
        )
        uk, uc = np.unique(tri_nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(uk, pa.int64()), "t": pa.array(uc, pa.int64())}
        )

    credit_empty = pa.table(
        {"node": pa.array([], pa.int64()), "t": pa.array([], pa.int64())}
    )
    matches = _wedge_matches(
        edges_ds, src_col, dst_col, num_partitions, max_out_degree,
        credit, credit_empty, "triangle_counts",
    )
    if matches is None:
        import ray.data as rd

        return rd.from_arrow(empty)
    counts = tree_groupby(matches, ["node"], [("t", "sum")])

    def finish(batch: pa.Table) -> pa.Table:
        if not batch.num_rows or not batch.num_columns:
            return empty
        out = batch.rename_columns(["node", "n_triangles"])
        return out.take(
            pc.sort_indices(out, sort_keys=[("node", "ascending")])
        )

    return counts.map_batches(finish, batch_format="pyarrow", batch_size=None)


def edge_support(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 32,
    max_out_degree: int = 1 << 16,
):
    """Per-edge triangle support — for every undirected edge (lo, hi), the
    number of common neighbors of its endpoints.  This is the k-truss /
    link-strength primitive: an edge with zero support connects otherwise
    unrelated communities (drop it to split clusters), high support means
    the relation is triangulated by independent witnesses.  Output rows:
    (``lo``, ``hi``, ``support`` int64) for edges in ≥ 1 triangle (the
    SQL mirror's inner join drops zero-support edges the same way).

    Shares ``_wedge_matches``; each matched triangle credits its THREE
    constituent edges (canonical min/max ids).  The per-edge key space is
    corpus-sized, so the final combine is a hash-of-pair bucketed
    ``map_groups`` with a vectorized run-length sum — not the bounded-key
    coalesce-tree ``triangle_counts`` uses for its node keys."""
    from ..sketches.hashing import splitmix64

    P = int(num_partitions)
    _C = np.uint64(0x9E3779B97F4A7C15)
    empty = pa.table(
        {
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "support": pa.array([], pa.int64()),
        }
    )

    def _pair_runs(lo, hi, t):
        o = np.lexsort((hi, lo))
        lo, hi, t = lo[o], hi[o], t[o]
        first = np.concatenate(
            ([True], (np.diff(lo) != 0) | (np.diff(hi) != 0))
        )
        idx = np.flatnonzero(first)
        sums = np.add.reduceat(t, idx)
        return lo[idx], hi[idx], sums

    def credit(hit: pa.Table) -> pa.Table:
        x = hit.column("x").to_numpy(zero_copy_only=False)
        y = hit.column("y").to_numpy(zero_copy_only=False)
        c = hit.column("center").to_numpy(zero_copy_only=False)
        lo = np.concatenate(
            [np.minimum(x, y), np.minimum(c, x), np.minimum(c, y)]
        )
        hi = np.concatenate(
            [np.maximum(x, y), np.maximum(c, x), np.maximum(c, y)]
        )
        lo, hi, sums = _pair_runs(lo, hi, np.ones(len(lo), np.int64))
        with np.errstate(over="ignore"):
            bp = splitmix64(lo.view(np.uint64) * _C + hi.view(np.uint64))
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "t": pa.array(sums, pa.int64()),
                "bp": pa.array(
                    (bp % np.uint64(P)).astype(np.int32), pa.int32()
                ),
            }
        )

    credit_empty = pa.table(
        {
            "lo": pa.array([], pa.int64()),
            "hi": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()),
            "bp": pa.array([], pa.int32()),
        }
    )
    matches = _wedge_matches(
        edges_ds, src_col, dst_col, num_partitions, max_out_degree,
        credit, credit_empty, "edge_support",
    )
    if matches is None:
        import ray.data as rd

        return rd.from_arrow(empty)

    def combine_bucket(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return empty
        lo, hi, sums = _pair_runs(
            group.column("lo").to_numpy(zero_copy_only=False),
            group.column("hi").to_numpy(zero_copy_only=False),
            group.column("t").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "support": pa.array(sums, pa.int64()),
            }
        )

    return matches.groupby("bp").map_groups(
        combine_bucket, batch_format="pyarrow"
    )


def k_core(
    edges_ds,
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 32,
    max_rounds: int = 64,
):
    """The k-core of an undirected simple graph: iteratively peel EVERY
    node of degree < k (simultaneous removal per round) until fixpoint —
    the standard graph-cleaning primitive (drop weakly-attached hosts /
    near-dup satellites before community work).  Output rows: (``node``,
    ``deg`` int64) for surviving nodes with their degree inside the core
    subgraph.

    Scale shape: shares this module's bounded-node contract (pagerank,
    triangle_counts) — per-round degrees are tree-combined (node, count)
    partials, the surviving-node set broadcasts once per round via
    ``ray.put``, and edge filtering is a vectorized ``np.isin`` streaming
    pass.  Rounds are data-dependent but bounded by the peeling depth
    (``max_rounds`` makes a pathological graph loud, not hung); each round
    is ONE pass over the remaining edges with no shuffle."""
    import ray
    import ray.data as rd

    from ..ops.aggregates import tree_groupby

    if k < 1:
        raise ValueError(f"k_core: k must be >= 1, got {k}")
    empty = pa.table(
        {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )

    edges = _canonical_edges(edges_ds, src_col, dst_col, int(num_partitions))

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch.column("lo").to_numpy(zero_copy_only=False),
                batch.column("hi").to_numpy(zero_copy_only=False),
            ]
        )
        uk, uc = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(uk, pa.int64()), "c": pa.array(uc, pa.int64())}
        )

    def degrees(eds):
        parts = [
            t
            for t in ray.get(
                tree_groupby(
                    eds.map_batches(deg_partial, batch_format="pyarrow"),
                    ["node"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        if not parts:
            return None, None
        t = pa.concat_tables(parts)
        return (
            t.column("node").to_numpy(zero_copy_only=False),
            t.column("c").to_numpy(zero_copy_only=False),
        )

    for _ in range(max_rounds):
        nodes, deg = degrees(edges)
        if nodes is None:
            return rd.from_arrow(empty)
        weak = nodes[deg < k]
        if len(weak) == 0:
            out = pa.table(
                {"node": pa.array(nodes, pa.int64()),
                 "deg": pa.array(deg, pa.int64())}
            )
            return rd.from_arrow(
                out.take(pc.sort_indices(out, sort_keys=[("node", "ascending")]))
            )
        weak_ref = ray.put(np.sort(weak))

        def drop_weak(batch: pa.Table, _ref=weak_ref) -> pa.Table:
            w = ray.get(_ref)
            lo = batch.column("lo").to_numpy(zero_copy_only=False)
            hi = batch.column("hi").to_numpy(zero_copy_only=False)
            keep = ~(np.isin(lo, w) | np.isin(hi, w))
            return batch.filter(pa.array(keep))

        edges = edges.map_batches(
            drop_weak, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    raise ValueError(
        f"k_core: no fixpoint after {max_rounds} rounds — raise max_rounds "
        "for a graph with this peeling depth"
    )


def bfs_layers(
    edges_ds,
    seeds_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    rounds: int = 6,
):
    """Multi-source BFS layer assignment over an undirected graph: every
    node reachable from the seed set within ``rounds`` hops gets one
    ``(node, dist)`` row with dist = MINIMUM hop count (seeds at 0, even
    seeds that touch no edge).  Nodes farther than ``rounds`` hops (or
    unreachable) emit nothing — the op is "expand exactly ``rounds``
    frontiers", so a SQL engine unrolling the same number of rounds
    reproduces it bit-exactly.

    The classic crawl-frontier / contamination-blast-radius primitive
    (how far does a seed set of known-bad hosts spread through the link
    graph) — the reference's IOC matchers only ever test direct hits;
    this is the transitive closure they stop short of.

    Scale shape: shares this module's bounded-node contract (pagerank,
    k_core) — the frontier and visited sets broadcast once per round via
    ``ray.put``, each round is ONE vectorized ``np.isin`` streaming pass
    over the (materialized-once) edge list with tree-combined unique-node
    partials, and no shuffle anywhere.  Early-exits when a frontier
    empties: extra rounds past convergence are provable no-ops."""
    import ray
    import ray.data as rd

    from ..core.bcast import cached_get
    from ..ops.aggregates import tree_groupby

    if rounds < 0:
        raise ValueError(f"bfs_layers: rounds must be >= 0, got {rounds}")

    def _uniq(ds, cols):
        def part(batch: pa.Table) -> pa.Table:
            vals = np.concatenate(
                [
                    batch.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
                    for c in cols
                ]
            )
            u = np.unique(vals)
            return pa.table(
                {"node": pa.array(u, pa.int64()),
                 "c": pa.array(np.ones(len(u), np.int64), pa.int64())}
            )

        parts = [
            t
            for t in ray.get(
                tree_groupby(
                    ds.map_batches(part, batch_format="pyarrow"),
                    ["node"],
                    [("c", "sum")],
                ).to_arrow_refs()
            )
            if t.num_rows and t.num_columns
        ]
        if not parts:
            return np.empty(0, np.int64)
        return np.sort(
            np.concatenate(
                [t.column("node").to_numpy(zero_copy_only=False) for t in parts]
            )
        )

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.array(
                    batch.column(src_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
                "b": pa.array(
                    batch.column(dst_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    edges = edges_ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    seeds = _uniq(seeds_ds, [seed_col])
    out_nodes = [seeds]
    out_dists = [np.zeros(len(seeds), np.int64)]
    visited = seeds
    frontier = seeds
    for d in range(1, rounds + 1):
        if len(frontier) == 0:
            break
        f_ref = ray.put(frontier)
        v_ref = ray.put(visited)

        def expand(batch: pa.Table, _f=f_ref, _v=v_ref) -> pa.Table:
            f = cached_get(_f)
            v = cached_get(_v)
            a = batch.column("a").to_numpy(zero_copy_only=False)
            b = batch.column("b").to_numpy(zero_copy_only=False)
            nxt = np.unique(
                np.concatenate([b[np.isin(a, f)], a[np.isin(b, f)]])
            )
            nxt = nxt[~np.isin(nxt, v)]
            return pa.table(
                {"node": pa.array(nxt, pa.int64()),
                 "c": pa.array(np.ones(len(nxt), np.int64), pa.int64())}
            )

        frontier = _uniq(
            edges.map_batches(expand, batch_format="pyarrow"), ["node"]
        )
        if len(frontier) == 0:
            break
        out_nodes.append(frontier)
        out_dists.append(np.full(len(frontier), d, np.int64))
        visited = np.union1d(visited, frontier)

    node = np.concatenate(out_nodes)
    dist = np.concatenate(out_dists)
    o = np.argsort(node, kind="stable")
    return rd.from_arrow(
        pa.table(
            {"node": pa.array(node[o], pa.int64()),
             "dist": pa.array(dist[o], pa.int64())}
        )
    )
