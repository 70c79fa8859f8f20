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

logger = logging.getLogger(__name__)


def pagerank(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
):
    """Integer fixed-point PageRank over a CLOSED edge set (every dst also
    appears as a src — the caller's edge construction guarantees it, e.g.
    by mapping dst into the node id range).  Returns (node, rank) for every
    node; rank units are fixed-point with total initial mass ``scale``.

    Update rule (pure int64 floor arithmetic, mirrored exactly in SQL):

        base   = scale // n
        share  = r[j] // outdeg[j]
        r'[i]  = ((den-num)·base) // den + (num · Σ_{j→i} share[j]) // den

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
    hold = ((damping_den - damping_num) * base) // damping_den
    r = np.full(n, base, dtype=np.int64)

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
