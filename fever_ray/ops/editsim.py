"""Edit-distance near-duplicate tokens — SymSpell-style spelling-variant
detection over the corpus vocabulary.

``token_edit_dups`` finds every pair of distinct vocabulary tokens within
Levenshtein distance ``max_dist`` (1 or 2): the typo/variant clustering
step of a curation pipeline (fold "recieve" into "receive" before
frequency features, collapse host spellings before per-domain caps).

Reference motivation: the reference's bloom-based indicator matching
(/root/reference/processing/bloom_handler.go) is EXACT membership; a
curation engine also needs the fuzzy sibling.  This is not a port — the
candidate rule is the public SymSpell deletion-neighborhood scheme
(Garbe 2012): tokens within edit distance k share at least one string
obtainable by deleting ≤ k characters from each, so candidates are pairs
sharing a deletion-key and NO token ever compares against the whole
vocabulary.

Scale shape: the corpus contributes one dictionary-encoded token-count
partial per batch (the `top_ngrams` posture — the shuffle carries batch
vocabularies, not occurrences); the vocabulary then explodes into ≤
1 + L + L(L−1)/2 deletion-key rows per token (L ≤ ``max_len``), hashed
POLYNOMIALLY so key generation is a fully vectorized prefix/suffix-array
computation over a padded byte matrix — no per-token Python, no variant
strings ever materialize.  Key buckets longer than ``bucket_cap`` are
dropped with the same documented-recall posture as `containment_pairs`'
rare-shingle cap (hub keys are low-signal and quadratic).  Candidate
pairs dedup through one skinny hash-of-pair shuffle and verify with a
vectorized full-matrix Levenshtein DP (576 elementwise steps for
``max_len`` 24, whatever the pair count).

Output rows: (tok_a, tok_b, dist, freq_a, freq_b) — tok_a < tok_b
lexicographically, dist ∈ [1, max_dist], freqs = corpus occurrence
counts.  Tokens are restricted to ASCII (byte-level DP == character
Levenshtein only there; the SQL mirror applies the same
``len(t) = strlen(t)`` filter).
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import _flat_bytes, bucket_of, hash64

logger = logging.getLogger(__name__)

# polynomial base: the (odd, hence mod-2^64 invertible) FNV-64 prime
_POLY = np.uint64(0x100000001B3)
_POLY_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_OFF = np.uint64(0xCBF29CE484222325)  # FNV offset basis
_PAIR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _pad_matrix(tokens: pa.Array, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, max_len) zero-padded uint8 byte matrix + int64 lengths."""
    buf, starts, lens = _flat_bytes(tokens)
    n = len(lens)
    m = np.zeros((n, max_len), dtype=np.uint8)
    if lens.sum():
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        # bytes past the pad width are truncated; returned lens stay TRUE
        # lengths so length gates still see the real value
        fit = pos < max_len
        m[np.repeat(np.arange(n), lens)[fit], pos[fit]] = buf[
            (np.repeat(starts, lens) + pos)[fit]
        ]
    return m, lens.astype(np.int64)


def _del_keys(
    m: np.ndarray, lens: np.ndarray, max_dist: int
) -> tuple[np.ndarray, np.ndarray]:
    """Polynomial hashes of every ≤``max_dist``-deletion variant of every
    row of the padded byte matrix, plus the source row index of each key.

    A variant string s always hashes to OFF·B^len(s) + Σ s[j]·B^(len−1−j)
    (mod 2^64) no matter which token produced it, so equal variant
    strings collide by construction; unequal ones collide only with
    hash probability — harmless, candidates are verified exactly."""
    n, L = m.shape
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    mu = m.astype(np.uint64)
    powv = np.empty(L + 1, np.uint64)
    powv[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for k in range(L):
            powv[k + 1] = powv[k] * _POLY
        # prefix values WITH offset basis: P[:, k] = value of first k bytes
        pref = np.empty((n, L + 1), np.uint64)
        pref[:, 0] = _OFF
        for k in range(L):
            pref[:, k + 1] = pref[:, k] * _POLY + mu[:, k]
        # suffix values at final-position weight: T[:, k] = Σ_{j≥k} b_j·B^(len−1−j)
        suf = np.zeros((n, L + 1), np.uint64)
        for k in range(L - 1, -1, -1):
            active = lens > k
            w = np.where(active, powv[np.maximum(lens - 1 - k, 0)], np.uint64(0))
            suf[:, k] = suf[:, k + 1] + mu[:, k] * w

        keys = [pref[np.arange(n), lens]]  # 0 deletions: the token itself
        idx = [np.arange(n, dtype=np.int64)]

        # single deletions: V1(i) = P[i]·B^(len−1−i) + T[i+1]
        ii = np.arange(L, dtype=np.int64)
        e1 = lens[:, None] - 1 - ii[None, :]
        ok1 = e1 >= 0
        v1 = pref[:, :L] * powv[np.maximum(e1, 0)] + suf[:, 1:]
        r1, c1 = np.nonzero(ok1)
        keys.append(v1[r1, c1])
        idx.append(r1.astype(np.int64))

        if max_dist >= 2:
            # double deletions i<j: V2 = P[i]·B^(len−2−i)
            #   + (T[i+1]−T[j])·B⁻¹ + T[j+1]
            iu, ju = np.triu_indices(L, k=1)
            e2 = lens[:, None] - 2 - iu[None, :]
            ok2 = ju[None, :] < lens[:, None]
            v2 = (
                pref[:, iu] * powv[np.maximum(e2, 0)]
                + (suf[:, iu + 1] - suf[:, ju]) * _POLY_INV
                + suf[:, ju + 1]
            )
            r2, c2 = np.nonzero(ok2)
            keys.append(v2[r2, c2])
            idx.append(r2.astype(np.int64))
    return np.concatenate(keys), np.concatenate(idx)


def _lev_clipped(
    ma: np.ndarray, la: np.ndarray, mb: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Exact Levenshtein distance for every (row of ma, row of mb) pair —
    full DP over the padded width, vectorized across pairs; rows past a
    pair's own length freeze so the final row is dp[la] for every pair."""
    n, L = ma.shape
    prev = np.broadcast_to(np.arange(L + 1, dtype=np.int64), (n, L + 1)).copy()
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = ma[:, i - 1]
        for j in range(1, L + 1):
            sub = prev[:, j - 1] + (ai != mb[:, j - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j], cur[:, j - 1]) + 1, sub)
        alive = (i <= la)[:, None]
        prev = np.where(alive, cur, prev)
    return prev[np.arange(n), lb]


def token_edit_dups(
    ds,
    max_dist: int = 2,
    min_count: int = 1,
    min_len: int = 1,
    max_len: int = 24,
    bucket_cap: int = 256,
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """See module docstring.  ``max_dist`` must be 1 or 2."""
    from .dedup import _auto_parts, _key_runs, _allpairs_by_runlen

    if max_dist not in (1, 2):
        raise ValueError(f"token_edit_dups: max_dist must be 1 or 2, got {max_dist}")
    if not 1 <= min_len <= max_len <= 64:
        raise ValueError(
            f"token_edit_dups: need 1 <= min_len <= max_len <= 64, got "
            f"[{min_len}, {max_len}]"
        )
    n_parts = num_partitions or _auto_parts(ds)
    pu = np.uint64(n_parts)

    def tok_partial(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(pc.cast(text, pa.string()), ""), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if len(flat) == 0:
            return empty
        dic = flat.dictionary_encode()
        counts = np.bincount(
            dic.indices.to_numpy(zero_copy_only=False),
            minlength=len(dic.dictionary),
        ).astype(np.int64)
        toks_u = dic.dictionary
        return pa.table(
            {
                "tok": toks_u,
                "n": pa.array(counts, pa.int64()),
                "part": pa.array(bucket_of(toks_u, n_parts), pa.int32()),
            }
        )

    def vocab_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok": pa.array([], pa.string()),
                "freq": pa.array([], pa.int64()),
                "kpart": pa.array([], pa.int32()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        order = pc.sort_indices(group, sort_keys=[("tok", "ascending")])
        g = group.take(order)
        toks = g.column("tok").combine_chunks()
        n = g.column("n").to_numpy(zero_copy_only=False)
        th = hash64(toks)
        starts = _key_runs(th.view(np.int64))
        freq = np.add.reduceat(n, starts[:-1])
        firsts = pa.array(starts[:-1], pa.int64())
        toks_u = toks.take(firsts)
        keep_f = freq >= min_count
        # length + ASCII gates (byte DP == char Levenshtein only on ASCII)
        m, lens = _pad_matrix(toks_u, max_len + 1)
        keep = (
            keep_f
            & (lens >= min_len)
            & (lens <= max_len)
            & (m.max(axis=1) < 128)
        )
        if not keep.any():
            return empty
        toks_k = toks_u.filter(pa.array(keep))
        return pa.table(
            {
                "tok": toks_k,
                "freq": pa.array(freq[keep], pa.int64()),
                # spread key generation across the cluster by token hash
                "kpart": pa.array(
                    (th[starts[:-1]][keep] % pu).astype(np.int32), pa.int32()
                ),
            }
        )

    def emit_keys(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.array([], pa.int64()),
                "tok": pa.array([], pa.string()),
                "freq": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if not batch.num_rows or not batch.num_columns:
            return empty
        toks = batch.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        m, lens = _pad_matrix(toks, max_len)
        keys, idx = _del_keys(m, lens, max_dist)
        return pa.table(
            {
                "key": pa.array(keys.view(np.int64), pa.int64()),
                "tok": toks.take(pa.array(idx, pa.int64())),
                "freq": batch.column("freq").take(pa.array(idx, pa.int64())),
                "part": pa.array((keys % pu).astype(np.int32), pa.int32()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "freq_a": pa.array([], pa.int64()),
                "freq_b": pa.array([], pa.int64()),
                "p2": pa.array([], pa.int32()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        key = group.column("key").to_numpy(zero_copy_only=False)
        order = np.argsort(key, kind="stable")
        key = key[order]
        starts = _key_runs(key)
        runlen = np.diff(starts)
        n_over = int((runlen > bucket_cap).sum())
        if n_over:
            logger.warning(
                "token_edit_dups: dropping %d deletion-key buckets longer "
                "than bucket_cap=%d (hub keys; raise bucket_cap to trade "
                "cost for recall)",
                n_over,
                bucket_cap,
            )
        ia, ib = _allpairs_by_runlen(order.astype(np.int64), starts, bucket_cap)
        if not len(ia):
            return empty
        toks = group.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        th = hash64(toks)
        # same-token pairs arise when two deletion variants of the same
        # token collide (e.g. deleting either of a double letter)
        distinct = th[ia] != th[ib]
        ia, ib = ia[distinct], ib[distinct]
        if not len(ia):
            return empty
        ta, tb = toks.take(pa.array(ia, pa.int64())), toks.take(pa.array(ib, pa.int64()))
        swap = pc.greater(ta, tb).to_numpy(zero_copy_only=False)
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        fa = group.column("freq").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            p2 = ((th[ia2] * _PAIR_MIX + th[ib2]) % pu).astype(np.int32)
        return pa.table(
            {
                "tok_a": toks.take(pa.array(ia2, pa.int64())),
                "tok_b": toks.take(pa.array(ib2, pa.int64())),
                "freq_a": pa.array(fa[ia2], pa.int64()),
                "freq_b": pa.array(fa[ib2], pa.int64()),
                "p2": pa.array(p2, pa.int32()),
            }
        )

    def dedup_verify(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tok_a": pa.array([], pa.string()),
                "tok_b": pa.array([], pa.string()),
                "dist": pa.array([], pa.int64()),
                "freq_a": pa.array([], pa.int64()),
                "freq_b": pa.array([], pa.int64()),
            }
        )
        if not group.num_rows or not group.num_columns:
            return empty
        ta = group.column("tok_a")
        tb = group.column("tok_b")
        if isinstance(ta, pa.ChunkedArray):
            ta = ta.combine_chunks()
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        ha, hb = hash64(ta).view(np.int64), hash64(tb).view(np.int64)
        o = np.lexsort((hb, ha))
        starts = _key_runs(ha[o], hb[o])
        firsts = o[starts[:-1]]
        sel = pa.array(firsts, pa.int64())
        g = group.take(sel)
        ta, tb = g.column("tok_a").combine_chunks(), g.column("tok_b").combine_chunks()
        ma, la = _pad_matrix(ta, max_len)
        mb, lb = _pad_matrix(tb, max_len)
        d = _lev_clipped(ma, la, mb, lb)
        keep = d <= max_dist
        if not keep.any():
            return empty
        mask = pa.array(keep)
        return pa.table(
            {
                "tok_a": ta.filter(mask),
                "tok_b": tb.filter(mask),
                "dist": pa.array(d[keep], pa.int64()),
                "freq_a": g.column("freq_a").filter(mask),
                "freq_b": g.column("freq_b").filter(mask),
            }
        )

    return (
        # whole-block batches: the token-count partial is a vocabulary
        # compressor (same reasoning as top_ngrams)
        # ~32k-doc bundles (not per-block batches): Ray's sort shuffle
        # pays input_blocks x partitions slicing overhead per stage, so
        # 256 read blocks cost ~12s of pure scheduling across this
        # 4-shuffle chain — AND a 4k-doc batch compresses its vocabulary
        # 8x worse than a 32k one.  Measured 14.0s -> ~2s at 1M pages.
        ds.map_batches(
            tok_partial,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=32768,
        )
        .groupby("part")
        .map_groups(vocab_bucket, batch_format="pyarrow")
        .groupby("kpart")
        .map_groups(emit_keys, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby("p2")
        .map_groups(dedup_verify, batch_format="pyarrow")
    )


def token_variant_clusters(
    ds,
    max_dist: int = 2,
    min_count: int = 1,
    min_len: int = 1,
    max_len: int = 24,
    bucket_cap: int = 256,
    text_col: str = "text",
    num_partitions: int | None = None,
):
    """Canonical spelling map: connected components over the
    `token_edit_dups` variant graph — "recieve", "receive" and "receeve"
    all land in one cluster so a curation pass can rewrite variants to a
    single canonical form.  Cluster id = the component's minimum token
    hash (the same splitmix-finalized FNV the SQL mirror computes, signed
    int64 order on BOTH sides), so the label is deterministic without
    shipping strings through the component rounds.

    Output rows: (tok, cluster_id int64) for every token that appears in
    at least one variant pair; tokens with no variant stay out of the map
    (a rewrite pass treats absence as identity).

    Scale shape: pairs are vocabulary-scale (see `token_edit_dups`);
    components run min-label propagation with pointer jumping over skinny
    hash edges; the string↔hash map rides the pair rows themselves, so
    the join back is one bucketed union-tag groupby — the corpus is read
    once, by the vocabulary pass."""
    import ray.data as rd

    from .dedup import _auto_parts, _key_runs, connected_components

    n_parts = num_partitions or _auto_parts(ds)
    pairs = token_edit_dups(
        ds,
        max_dist=max_dist,
        min_count=min_count,
        min_len=min_len,
        max_len=max_len,
        bucket_cap=bucket_cap,
        text_col=text_col,
        num_partitions=num_partitions,
    ).materialize()
    empty = pa.table(
        {"tok": pa.array([], pa.string()), "cluster_id": pa.array([], pa.int64())}
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    def edges(batch: pa.Table) -> pa.Table:
        ta = batch.column("tok_a")
        tb = batch.column("tok_b")
        return pa.table(
            {
                "doc_a": pa.array(hash64(ta).view(np.int64), pa.int64()),
                "doc_b": pa.array(hash64(tb).view(np.int64), pa.int64()),
            }
        )

    # materialize: the component rounds end in a hash join, and a pending
    # join fused into the union+groupby below can deadlock a small cluster
    # (the CLAUDE.md two-joins-one-execution rule).  The variant graph is
    # vocabulary-scale, so the component shuffle wants FEW partitions —
    # a join with hundreds of near-empty blocks stalls small clusters
    comp = connected_components(
        pairs.map_batches(edges, batch_format="pyarrow"),
        num_partitions=max(8, min(n_parts // 8, 32)),
    ).materialize()

    def node_rows(batch: pa.Table) -> pa.Table:
        ta = batch.column("tok_a")
        tb = batch.column("tok_b")
        if isinstance(ta, pa.ChunkedArray):
            ta = ta.combine_chunks()
        if isinstance(tb, pa.ChunkedArray):
            tb = tb.combine_chunks()
        toks = pa.concat_arrays([ta, tb])
        h = hash64(toks).view(np.int64)
        # local dedup (each endpoint appears once per incident pair)
        o = np.argsort(h, kind="stable")
        firsts = o[_key_runs(h[o])[:-1]]
        sel = pa.array(firsts, pa.int64())
        hu = h[firsts]
        return pa.table(
            {
                "h": pa.array(hu, pa.int64()),
                "tok": toks.take(sel),
                "cluster": pa.array(np.zeros(len(hu), np.int64), pa.int64()),
                "kind": pa.array(np.zeros(len(hu), np.int8), pa.int8()),
                "bp": pa.array(
                    (hu.view(np.uint64) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def comp_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "h": batch.column("doc_id"),
                "tok": pa.array([""] * len(h), pa.string()),
                "cluster": batch.column("cluster_id"),
                "kind": pa.array(np.ones(len(h), np.int8), pa.int8()),
                "bp": pa.array(
                    (h.view(np.uint64) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        if not group.num_rows or not group.num_columns:
            return empty
        h = group.column("h").to_numpy(zero_copy_only=False)
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        cl = group.column("cluster").to_numpy(zero_copy_only=False)
        is_node = kind == 0
        nh = h[is_node]
        ch, cc = h[~is_node], cl[~is_node]
        o = np.argsort(ch, kind="stable")
        ch, cc = ch[o], cc[o]
        pos = np.searchsorted(ch, nh)
        if len(ch) == 0 or not np.array_equal(ch[np.minimum(pos, len(ch) - 1)], nh):
            raise AssertionError(
                "token_variant_clusters: a pair endpoint is missing from "
                "the component labels — connected_components contract broken"
            )
        # duplicate node rows across buckets can't happen (bp is a pure
        # function of h and nodes were deduped per batch) — but the same
        # node CAN arrive from different pair batches; dedup here
        no = np.argsort(nh, kind="stable")
        keep = no[_key_runs(nh[no])[:-1]]
        toks = group.column("tok")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        node_idx = np.flatnonzero(is_node)
        return pa.table(
            {
                "tok": toks.take(pa.array(node_idx[keep], pa.int64())),
                "cluster_id": pa.array(cc[pos[keep]], pa.int64()),
            }
        )

    union = pairs.map_batches(node_rows, batch_format="pyarrow").union(
        comp.map_batches(comp_rows, batch_format="pyarrow")
    )
    return union.groupby("bp").map_groups(attach, batch_format="pyarrow")
