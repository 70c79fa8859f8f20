"""token_edit_dups: SymSpell deletion-neighborhood completeness, exact
vectorized Levenshtein, ASCII/length gates, partition invariance."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.editsim import (
    _OFF,
    _POLY,
    _del_keys,
    _lev_clipped,
    _pad_matrix,
)


def _ref_hash(s: bytes) -> int:
    v = int(_OFF)
    for b in s:
        v = (v * int(_POLY) + b) % (1 << 64)
    return v


def _ref_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        nd = [i]
        for j, cb in enumerate(b, 1):
            nd.append(min(dp[j] + 1, nd[j - 1] + 1, dp[j - 1] + (ca != cb)))
        dp = nd
    return dp[-1]


def test_del_keys_match_bruteforce_variant_hashes():
    toks = ["part", "sort", "hash", "batch", "a", "agg", "xx", "zzzz"]
    m, lens = _pad_matrix(pa.array(toks), 24)
    keys, idx = _del_keys(m, lens, 2)
    for t_i, t in enumerate(toks):
        b = t.encode()
        vs = {b}
        vs |= {b[:i] + b[i + 1 :] for i in range(len(b))}
        vs |= {
            b[:i] + b[i + 1 : j] + b[j + 1 :]
            for i in range(len(b))
            for j in range(i + 1, len(b))
        }
        want = sorted(_ref_hash(v) for v in vs)
        got = sorted({int(k) for k, ix in zip(keys, idx) if ix == t_i})
        assert got == want, t


def test_lev_clipped_matches_reference_dp():
    rng = np.random.default_rng(5)
    alpha = list("abcde")
    strs = [
        "".join(rng.choice(alpha, size=rng.integers(0, 9)))
        for _ in range(60)
    ]
    pairs = [
        (strs[i], strs[j])
        for i, j in rng.integers(0, len(strs), size=(120, 2))
    ]
    ma, la = _pad_matrix(pa.array([p[0] for p in pairs]), 24)
    mb, lb = _pad_matrix(pa.array([p[1] for p in pairs]), 24)
    got = _lev_clipped(ma, la, mb, lb).tolist()
    assert got == [_ref_lev(a, b) for a, b in pairs]


def test_token_edit_dups_end_to_end_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.editsim import token_edit_dups

    texts = [
        "receive recieve reciive believe beleive",
        "window window widow meadow",
        "the thé naïve cat",  # non-ASCII tokens must be excluded
        "receive receive window",
        "superlongtoken" * 3 + " ok",  # > 24 bytes excluded
    ]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(3)
    got = {
        (r["tok_a"], r["tok_b"]): (r["dist"], r["freq_a"], r["freq_b"])
        for r in token_edit_dups(ds, max_dist=2).take_all()
    }
    from collections import Counter

    occ = Counter(t for x in texts for t in x.split(" "))
    vocab = {
        t: c
        for t, c in occ.items()
        if 1 <= len(t.encode()) <= 24 and all(ord(ch) < 128 for ch in t)
    }
    want = {}
    for a, b in itertools.combinations(sorted(vocab), 2):
        d = _ref_lev(a, b)
        if 1 <= d <= 2:
            want[(a, b)] = (d, vocab[a], vocab[b])
    assert got == want
    assert ("believe", "beleive") not in got  # ordering is lexicographic
    assert got[("beleive", "believe")][0] == 2
    assert got[("widow", "window")] == (1, occ["widow"], occ["window"])
    assert not any("thé" in p or "naïve" in p for p in got)
    # partition invariance
    got2 = {
        (r["tok_a"], r["tok_b"]): (r["dist"], r["freq_a"], r["freq_b"])
        for r in token_edit_dups(ds.repartition(1), max_dist=2).take_all()
    }
    assert got2 == got


def test_token_edit_dups_distance_one_and_fuzz(ray_session):
    """Deletion-neighborhood candidates are COMPLETE: on a random corpus
    the engine finds exactly the brute-force pair set (max_dist=1)."""
    import ray.data as rd

    from fever_ray.ops.editsim import token_edit_dups

    rng = np.random.default_rng(17)
    alpha = list("abc")
    vocab = sorted(
        {
            "".join(rng.choice(alpha, size=rng.integers(1, 6)))
            for _ in range(80)
        }
    )
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(30)]
    present = sorted({t for x in texts for t in x.split(" ")})
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    got = {
        (r["tok_a"], r["tok_b"])
        for r in token_edit_dups(ds, max_dist=1, bucket_cap=4096).take_all()
    }
    want = {
        (a, b)
        for a, b in itertools.combinations(present, 2)
        if _ref_lev(a, b) == 1
    }
    assert got == want and len(want) > 0


def test_token_edit_dups_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.editsim import token_edit_dups

    ds = rd.from_arrow(pa.table({"text": ["a b"]}))
    with pytest.raises(ValueError, match="max_dist"):
        token_edit_dups(ds, max_dist=3)
    with pytest.raises(ValueError, match="min_len"):
        token_edit_dups(ds, min_len=0)


def test_token_variant_clusters_vs_local_components(ray_session):
    import ray.data as rd

    from fever_ray.ops.editsim import token_edit_dups, token_variant_clusters
    from fever_ray.sketches.hashing import hash64

    texts = [
        "receive recieve receeve believe beleive",
        "window widow meadow xylophone",
    ]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    got = {
        r["tok"]: r["cluster_id"]
        for r in token_variant_clusters(ds, max_dist=2).take_all()
    }
    # local reference: union-find over the engine's own pair set, min
    # signed-int64 token hash as the label
    pairs = [
        (r["tok_a"], r["tok_b"]) for r in token_edit_dups(ds, max_dist=2).take_all()
    ]
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    comp: dict = {}
    for t in parent:
        comp.setdefault(find(t), []).append(t)
    want = {}
    for members in comp.values():
        label = min(int(hash64(pa.array([t])).view(np.int64)[0]) for t in members)
        for t in members:
            want[t] = label
    assert got == want
    # the typo family really is one cluster; the unrelated token is absent
    assert len({got["receive"], got["recieve"], got["receeve"]}) == 1
    assert "xylophone" not in got
    # partition invariance
    got2 = {
        r["tok"]: r["cluster_id"]
        for r in token_variant_clusters(ds.repartition(1), max_dist=2).take_all()
    }
    assert got2 == got


def test_token_variant_clusters_empty_pairs(ray_session):
    import ray.data as rd

    from fever_ray.ops.editsim import token_variant_clusters

    ds = rd.from_arrow(pa.table({"text": ["completely distinct alphabetical zoo"]}))
    out = token_variant_clusters(ds, max_dist=1).take_all()
    assert out == []
