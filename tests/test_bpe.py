"""BPE trainer/tokenizer vs an obviously-correct pure-Python reference
(Sennrich-style: dict word histogram, overlapping pair stats, left-to-right
non-overlapping merge application, (count DESC, left ASC, right ASC) ties)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.bpe import (
    BpeTokenizer,
    _apply_merge,
    _pair_counts,
    bpe_token_counts,
    bpe_train,
)


# ---------------------------------------------------------------- reference
def _ref_word_merge(sym: tuple, left: str, right: str, tok: str) -> tuple:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
            out.append(tok)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def ref_bpe_train(texts, num_merges):
    hist = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                hist[w] = hist.get(w, 0) + 1
    vocab = {tuple(w): c for w, c in hist.items()}
    merges = []
    for _ in range(num_merges):
        stats = {}
        for sym, c in vocab.items():
            for a, b in zip(sym[:-1], sym[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        best_count = max(stats.values())
        if best_count < 2:
            break
        l, r = min(p for p, c in stats.items() if c == best_count)
        tok = l + r
        merges.append((l, r, tok, best_count))
        vocab = {
            _ref_word_merge(sym, l, r, tok): c for sym, c in vocab.items()
        }
    return merges


def ref_tokenize(text, merges):
    n = 0
    for w in text.split(" "):
        sym = tuple(w)
        for l, r, tok, _ in merges:
            sym = _ref_word_merge(sym, l, r, tok)
        n += len(sym)
    return n


def _docs(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(13)
    words = ["banana", "bandana", "cabana", "anan", "nana", "aa", "aaaa", "xyz"]
    return [
        " ".join(rng.choice(words, size=int(rng.integers(1, 12))))
        for _ in range(120)
    ] + ["", "aaaa aaaa aa", "banana banana banana"]


def test_bpe_train_matches_reference(ray_session, corpus):
    got = bpe_train(_docs(corpus), num_merges=20)
    want = ref_bpe_train(corpus, 20)
    rows = got.to_pylist()
    assert len(rows) == len(want)
    for row, (l, r, tok, c) in zip(rows, want):
        assert (row["left"], row["right"], row["token"], row["pair_count"]) == (
            l, r, tok, c
        ), row


def test_bpe_train_partition_invariant(ray_session, corpus):
    a = bpe_train(_docs(corpus).repartition(1), num_merges=12).to_pylist()
    b = bpe_train(_docs(corpus).repartition(11), num_merges=12).to_pylist()
    assert a == b


def test_bpe_overlap_semantics(ray_session):
    # 'aaaa' x3 + 'aa': pair (a,a) counted per adjacency (overlapping),
    # applied left-to-right non-overlapping: 'aaaa' -> ('aa','aa')
    out = bpe_train(_docs(["aaaa aaaa aaaa aa"]), num_merges=2).to_pylist()
    assert out[0]["left"] == "a" and out[0]["right"] == "a"
    assert out[0]["pair_count"] == 3 * 3 + 1
    # second merge operates on ('aa','aa') pairs: 3 occurrences
    assert out[1]["token"] == "aaaa" and out[1]["pair_count"] == 3


def test_bpe_tokenizer_matches_reference(ray_session, corpus):
    merges = bpe_train(_docs(corpus), num_merges=20)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(_docs(corpus), merges).take_all()
    }
    ref = ref_bpe_train(corpus, 20)
    for i, text in enumerate(corpus):
        assert counts[i] == ref_tokenize(text, ref), (i, text)


def test_bpe_tokenizer_unseen_chars(ray_session, corpus):
    merges = bpe_train(_docs(corpus), num_merges=10)
    new = ["qqq banana unseen chars", ""]
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_counts(_docs(new), merges).take_all()
    }
    ref = ref_bpe_train(corpus, 10)
    for i, text in enumerate(new):
        assert counts[i] == ref_tokenize(text, ref)


# ------------------------------------------------- property-based kernels
from hypothesis import given, settings, strategies as st


def _ref_pair_counts(words_syms, weights):
    stats = {}
    for sym, w in zip(words_syms, weights):
        for a, b in zip(sym[:-1], sym[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + w
    return stats


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 5), max_size=8),  # word symbol ids
            st.integers(1, 9),                        # word count
        ),
        max_size=10,
    )
)
def test_pair_counts_property(words):
    syms = [w for w, _ in words]
    counts = [c for _, c in words]
    lens = np.array([len(s) for s in syms], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = np.array([x for s in syms for x in s], dtype=np.int64)
    weights = np.repeat(np.array(counts, dtype=np.int64), lens)
    keys, agg = _pair_counts(flat, offsets[1:], weights)
    got = {(int(k >> np.uint64(32)), int(k & np.uint64(0xFFFFFFFF))): int(c)
           for k, c in zip(keys, agg)}
    assert got == _ref_pair_counts([tuple(s) for s in syms], counts)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.lists(st.integers(0, 3), max_size=10), max_size=8),
    st.integers(0, 3),
    st.integers(0, 3),
)
def test_apply_merge_property(syms, left, right):
    lens = np.array([len(s) for s in syms], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = np.array([x for s in syms for x in s], dtype=np.int64)
    nf, no = _apply_merge(flat, offsets, left, right, 99)
    want = [
        list(_ref_word_merge(tuple(s), left, right, 99))
        for s in syms
    ]
    # reference merge works on symbols; ints compare fine
    want_flat = [x for s in want for x in s]
    assert nf.tolist() == want_flat
    assert no.tolist() == np.concatenate(
        ([0], np.cumsum([len(s) for s in want]))
    ).tolist()


def test_pair_counts_kernel_boundaries():
    # words: [1,2], [2,1], [] , [1] -> pairs (1,2) and (2,1), no cross-word
    flat = np.array([1, 2, 2, 1, 1], dtype=np.int64)
    offsets = np.array([0, 2, 4, 4, 5], dtype=np.int64)
    w = np.repeat(np.array([5, 3, 9, 7]), np.diff(offsets))
    keys, agg = _pair_counts(flat, offsets[1:], w)
    got = {(int(k >> np.uint64(32)), int(k & np.uint64(0xFFFFFFFF))): int(c)
           for k, c in zip(keys, agg)}
    assert got == {(1, 2): 5, (2, 1): 3}


def test_apply_merge_kernel_runs():
    # 'aaaaa' (run of 5): left-to-right merges positions 0,2 -> a a a a a
    # becomes X X a (X=merged)
    flat = np.array([0, 0, 0, 0, 0], dtype=np.int64)
    offsets = np.array([0, 5], dtype=np.int64)
    nf, no = _apply_merge(flat, offsets, 0, 0, 9)
    assert nf.tolist() == [9, 9, 0]
    assert no.tolist() == [0, 3]
