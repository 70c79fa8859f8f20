"""mixture_sample / repeat_corpus / line_dedup — exactness, determinism,
and both membership paths (broadcast and bucketed-join fallback)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.curate import mixture_sample, repeat_corpus
from fever_ray.ops.dedup import line_dedup
from fever_ray.sketches.hashing import hash64_ints


def _mk_docs(ray, n=600, n_src=3, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.arange(n, dtype=np.int64)
    src = np.array([f"s{int(i)}" for i in rng.integers(0, n_src, n)])
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "source": pa.array(src),
            "text": pa.array([f"doc {i} body" for i in ids]),
        }
    )
    return ray.data.from_arrow(t).repartition(7), t


def _expected_mixture(t, weights, seed):
    """Brute-force oracle: per-source k_s = w_s * min(n_s // w_s) smallest
    hashes."""
    ids = t.column("doc_id").to_numpy()
    src = t.column("source").to_pylist()
    h = hash64_ints(ids, seed=seed)
    n = {s: src.count(s) for s in set(src)}
    m = min(n.get(s, 0) // w for s, w in weights.items())
    keep = set()
    for s, w in weights.items():
        k = w * m
        hs = sorted((h[i], ids[i]) for i in range(len(ids)) if src[i] == s)
        keep.update(int(i) for _, i in hs[:k])
    return keep


def test_mixture_sample_exact_counts(ray_session):
    ds, t = _mk_docs(ray_session)
    weights = {"s0": 3, "s1": 1, "s2": 2}
    out = mixture_sample(ds, weights, seed=11).take_all()
    got = {int(r["doc_id"]) for r in out}
    assert got == _expected_mixture(t, weights, 11)
    # composition is exactly w_s * m per source
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    m = min(per[s] // w for s, w in weights.items())
    assert per == {s: w * m for s, w in weights.items()}


def test_mixture_sample_refinement_levels(ray_session):
    """Force the histogram refinement loop (tiny collect_cap) — result must
    be identical to the direct path."""
    ds, t = _mk_docs(ray_session, n=400)
    weights = {"s0": 2, "s1": 1}
    a = {
        int(r["doc_id"])
        for r in mixture_sample(ds, weights, seed=5).take_all()
    }
    b = {
        int(r["doc_id"])
        for r in mixture_sample(
            ds, weights, seed=5, collect_cap=8, refine_bits=4, max_levels=10
        ).take_all()
    }
    assert a == b == _expected_mixture(t, weights, 5)


def test_mixture_sample_missing_source_empty(ray_session):
    ds, _ = _mk_docs(ray_session, n=50)
    out = mixture_sample(ds, {"s0": 1, "nope": 1}, seed=0).take_all()
    assert out == []  # impossible mix → empty, not silently renormalized


def test_mixture_sample_keep_all_source(ray_session):
    """A weight so large one source is the binding constraint and another
    keeps every row (k_s == n_s)."""
    ds, t = _mk_docs(ray_session, n=300)
    src = t.column("source").to_pylist()
    counts = {s: src.count(s) for s in set(src)}
    # make s0 keep-all: w_s0 = n_s0, w_s1 = 1 → m = min(1, n_s1) = 1
    weights = {"s0": counts["s0"], "s1": 1}
    out = mixture_sample(ds, weights, seed=3).take_all()
    got = {int(r["doc_id"]) for r in out}
    assert got == _expected_mixture(t, weights, 3)
    per = {}
    for r in out:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per["s0"] == counts["s0"]  # every s0 row kept
    assert per["s1"] == 1


def test_mixture_sample_rejects_bad_weights(ray_session):
    ds, _ = _mk_docs(ray_session, n=10)
    with pytest.raises(ValueError):
        mixture_sample(ds, {})
    with pytest.raises(ValueError):
        mixture_sample(ds, {"s0": 0})
    with pytest.raises(ValueError):
        mixture_sample(ds, {"s0": 1.5})


def test_repeat_corpus_counts_and_copy_ids(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en", "zh", "fr", None]),
        }
    )
    ds = ray_session.data.from_arrow(t)
    out = repeat_corpus(
        ds, {"en": 1, "zh": 3, "fr": 0}, key_col="lang", default=2
    ).take_all()
    by_id = {}
    for r in out:
        by_id.setdefault(int(r["doc_id"]), []).append(int(r["copy_id"]))
    assert by_id == {1: [0], 2: [0, 1, 2], 4: [0, 1]}  # fr dropped; null→default


def test_repeat_corpus_rejects_negative(ray_session):
    ds = ray_session.data.from_arrow(pa.table({"lang": pa.array(["en"])}))
    with pytest.raises(ValueError):
        repeat_corpus(ds, {"en": -1})
    with pytest.raises(ValueError):
        repeat_corpus(ds, {"en": 1}, default=-2)


def _line_fixture(ray):
    texts = [
        "unique one\nBOILER\nunique two",  # boiler dropped
        "BOILER\nBOILER2",  # fully boilerplate → doc dropped
        "solo line\nBOILER2",
        "BOILER\nanother solo",
        "",  # empty text: '' line is unique here → survives
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    return ray.data.from_arrow(t).repartition(3)


EXPECTED_LINES = {
    0: ("unique one\nunique two", 2),
    2: ("solo line", 1),
    3: ("another solo", 1),
    4: ("", 1),
}


def test_line_dedup_broadcast_path(ray_session):
    ds = _line_fixture(ray_session)
    out = line_dedup(ds, threshold=1).take_all()
    got = {int(r["doc_id"]): (r["text"], int(r["n_kept"])) for r in out}
    assert got == EXPECTED_LINES


def test_line_dedup_join_fallback_identical(ray_session):
    ds = _line_fixture(ray_session)
    out = line_dedup(ds, threshold=1, broadcast_bytes=0).take_all()
    got = {int(r["doc_id"]): (r["text"], int(r["n_kept"])) for r in out}
    assert got == EXPECTED_LINES


def test_line_dedup_threshold_two_keeps_pairs(ray_session):
    ds = _line_fixture(ray_session)
    out = line_dedup(ds, threshold=2).take_all()
    got = {int(r["doc_id"]): (r["text"], int(r["n_kept"])) for r in out}
    # BOILER appears 3x (> 2, dropped); BOILER2 appears 2x (kept)
    assert got[1] == ("BOILER2", 1)
    assert got[2] == ("solo line\nBOILER2", 2)
    assert got[0] == ("unique one\nunique two", 2)


def test_line_dedup_word_separator(ray_session):
    """sep=' ' degenerates to corpus-wide word dedup — exercises the same
    kernel on a dense duplicate set."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c", "b c d"]),
        }
    )
    ds = ray_session.data.from_arrow(t)
    out = line_dedup(ds, threshold=1, sep=" ").take_all()
    got = {int(r["doc_id"]): (r["text"], int(r["n_kept"])) for r in out}
    assert got == {0: ("a", 1), 1: ("d", 1)}


def test_line_dedup_string_ids_fallback(ray_session):
    """The join fallback must handle non-int64 id columns (the dup-side
    sentinel has to match the corpus id type)."""
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "text": pa.array(["x\nBOILER", "BOILER\ny", "BOILER"]),
        }
    )
    ds = ray_session.data.from_arrow(t)
    for bb in (256 << 20, 0):  # broadcast and fallback must agree
        out = line_dedup(ds, threshold=1, broadcast_bytes=bb).take_all()
        got = {r["doc_id"]: (r["text"], int(r["n_kept"])) for r in out}
        assert got == {"a": ("x", 1), "b": ("y", 1)}


def test_mixture_sample_rejects_bad_refine_bits(ray_session):
    ds, _ = _mk_docs(ray_session, n=10)
    with pytest.raises(ValueError):
        mixture_sample(ds, {"s0": 1}, refine_bits=0)
    with pytest.raises(ValueError):
        mixture_sample(ds, {"s0": 1}, refine_bits=40)


def test_token_budget_select_exact(ray_session):
    """Kept set equals the brute-force prefix walk in (hash, id) order;
    docs are atomic (a straddling doc is dropped)."""
    from fever_ray.ops.trainprep import token_budget_select

    rng = np.random.default_rng(3)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 40, n)]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ds = ray_session.data.from_arrow(t).repartition(5)

    L = np.array([x.count(" ") + 1 for x in texts], dtype=np.int64)
    h = hash64_ints(ids, seed=9)
    order = np.lexsort((ids, h))
    for budget in (0, 137, 1000, int(L.sum()), int(L.sum()) + 5):
        out = token_budget_select(ds, budget, seed=9, n_buckets=16).take_all()
        got = {int(r["doc_id"]): int(r["n_tokens"]) for r in out}
        expect, acc = {}, 0
        for i in order:
            if acc + L[i] <= budget:
                expect[int(ids[i])] = int(L[i])
                acc += L[i]
            else:
                break  # atomic docs: the straddler and everything after drop
        assert got == expect, f"budget={budget}"


def test_token_budget_select_rejects_negative(ray_session):
    from fever_ray.ops.trainprep import token_budget_select

    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1]), "text": pa.array(["x"])})
    )
    with pytest.raises(ValueError):
        token_budget_select(ds, -1)


def test_line_dedup_hash_mode_matches_exact(ray_session):
    """match='hash' must agree with exact mode on a collision-free corpus,
    on both membership paths."""
    ds = _line_fixture(ray_session)
    for bb in (256 << 20, 0):
        out = line_dedup(ds, threshold=1, match="hash", broadcast_bytes=bb).take_all()
        got = {int(r["doc_id"]): (r["text"], int(r["n_kept"])) for r in out}
        assert got == EXPECTED_LINES, f"broadcast_bytes={bb}"
    with pytest.raises(ValueError):
        line_dedup(ds, match="fuzzy")


def test_cross_dedup_both_paths(ray_session):
    """Corpus docs whose text appears in the reference are dropped; both
    membership paths agree; duplicate content WITHIN the corpus survives
    (cross-dedup is not self-dedup)."""
    from fever_ray.ops.dedup import cross_dedup

    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["alpha", "beta", "alpha", "gamma"]),
        }
    )
    ref = pa.table(
        {
            "doc_id": pa.array([100, 101], pa.int64()),
            "text": pa.array(["beta", "delta"]),
        }
    )
    cds = ray_session.data.from_arrow(corpus).repartition(2)
    rds = ray_session.data.from_arrow(ref)
    for bb in (256 << 20, 0):
        out = cross_dedup(cds, rds, broadcast_bytes=bb).take_all()
        ids = sorted(int(r["doc_id"]) for r in out)
        assert ids == [1, 3, 4], f"broadcast_bytes={bb}"  # beta dropped


def test_cross_dedup_empty_ref_keeps_all(ray_session):
    from fever_ray.ops.dedup import cross_dedup

    cds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["a", "b"])})
    )
    rds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = cross_dedup(cds, rds).take_all()
    assert sorted(int(r["doc_id"]) for r in out) == [1, 2]


def test_inverted_index_exact(ray_session):
    from fever_ray.ops.textstats import inverted_index

    t = pa.table(
        {
            "doc_id": pa.array([3, 1, 2], pa.int64()),
            "text": pa.array(["b a b", "a c", "a a d"]),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(2)
    out = inverted_index(ds, max_postings=2).take_all()
    got = {r["token"]: (int(r["df"]), r["postings"]) for r in out}
    assert got == {
        "a": (3, "1,2"),  # df counts all 3 docs; postings truncated to 2
        "b": (1, "3"),
        "c": (1, "1"),
        "d": (1, "2"),
    }
    with pytest.raises(ValueError):
        inverted_index(ds, max_postings=0)


def test_keyword_search_ranking(ray_session):
    from fever_ray.ops.textstats import keyword_search

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["cat cat dog", "cat", "bird", "dog cat cat"]  # 4 ties 1
            ),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(2)
    out = keyword_search(ds, "cat dog", k=2).take_all()
    # scores: doc1=3, doc4=3, doc2=1, doc3=0 → top-2 = [1, 4] (tie → id)
    assert [(int(r["doc_id"]), int(r["score"])) for r in out] == [(1, 3), (4, 3)]
    # zero-score docs never rank even when k is larger
    out = keyword_search(ds, ["bird"], k=10).take_all()
    assert [(int(r["doc_id"]), int(r["score"])) for r in out] == [(3, 1)]
    with pytest.raises(ValueError):
        keyword_search(ds, "")
    with pytest.raises(ValueError):
        keyword_search(ds, "cat", k=0)


def _bm25_expected(texts, terms, k):
    """Pure-Python mirror of the integer BM25 quantization (test oracle)."""
    toks = [t.split(" ") for t in texts]
    n, total = len(toks), sum(len(tk) for tk in toks)
    a = max(total // n, 1)
    out = []
    for i, tk in enumerate(toks):
        dl, score = len(tk), 0
        for t in sorted(set(terms)):
            df = sum(1 for d in toks if t in d)
            idf = ((2 * n + 1) // (2 * df + 1)).bit_length() - 1
            tf = tk.count(t)
            score += idf * ((45056 * a * tf) // (20 * a * tf + 6 * a + 18 * dl))
        if score > 0:
            out.append((score, i + 1))
    out.sort(key=lambda p: (-p[0], p[1]))
    return [(doc, s) for s, doc in out[:k]]


def test_bm25_search_ranking(ray_session):
    from fever_ray.ops.textstats import bm25_search

    texts = [
        "dog fox",                      # short, one query term
        "cat " * 19 + "cat",            # long cat-spam (20 cats, dl 20)
        "bird",                         # rare term, shortest doc
        "dog cat mouse mouse mouse",    # medium
        "mouse " * 7 + "mouse",         # no query terms at all
    ] + ["cat filler filler"] * 4 + ["filler filler"] * 4
    # 13 docs, 56 tokens, avgdl 4; df: cat 6 (idf 1), dog 2 (idf 2),
    # bird 1 (idf 3) — three distinct idf levels from the integer log
    t = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(3)
    out = bm25_search(ds, "cat dog bird", k=8).take_all()
    got = [(int(r["doc_id"]), int(r["score"])) for r in out]
    assert got == _bm25_expected(texts, ["cat", "dog", "bird"], 8)
    # rare-term boost: the bird doc must beat the cat-spam doc even
    # though the spam doc has 20 query-term occurrences to its 1
    ranks = {d: i for i, (d, _) in enumerate(got)}
    assert ranks[3] < ranks[2]
    # zero-score docs never rank
    assert 5 not in ranks
    with pytest.raises(ValueError):
        bm25_search(ds, "")
    with pytest.raises(ValueError):
        bm25_search(ds, "cat", k=0)


def test_doc_top_terms_both_paths(ray_session):
    from fever_ray.ops.textstats import doc_top_terms

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "x x common rare",  # tf(x)=2; common df=2; rare df=1
                    "common common zz",
                ]
            ),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(2)
    for bb in (256 << 20, 0):  # broadcast and join fallback must agree
        out = doc_top_terms(ds, k=2, broadcast_bytes=bb).take_all()
        got = {
            (int(r["doc_id"]), int(r["rk"])): (r["token"], int(r["tf"]), int(r["df"]))
            for r in out
        }
        assert got == {
            (1, 0): ("x", 2, 1),  # highest tf wins
            (1, 1): ("rare", 1, 1),  # tf tie → smaller df
            (2, 0): ("common", 2, 2),
            (2, 1): ("zz", 1, 1),
        }, f"broadcast_bytes={bb}"
    with pytest.raises(ValueError):
        doc_top_terms(ds, k=0)


def test_cli_curate_mix_and_line_dedup(ray_session, pages_dir, tmp_path, capsys):
    import json

    from fever_ray import cli as cli_mod

    rc = cli_mod.main(
        [
            "curate",
            "--input", pages_dir,
            "--mix", "en=1",
            "--line-dedup", "1",
            "--min-tokens", "1",
            "--out", str(tmp_path / "kept"),
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < out["pages_kept"] <= out["pages_total"]


def test_cli_index_build_and_search(ray_session, pages_dir, tmp_path, capsys):
    import json

    import duckdb

    from fever_ray import cli as cli_mod

    idx_dir = tmp_path / "idx"
    rc = cli_mod.main(
        ["index", "--input", pages_dir, "--out", str(idx_dir), "--max-postings", "4"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index_tokens"] > 0
    top = duckdb.connect().execute(
        f"select token from '{idx_dir}/*.parquet' order by df desc limit 1"
    ).fetchone()[0]
    rc = cli_mod.main(["index", "--input", pages_dir, "--query", top, "--k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 3
    assert out["hits"][0]["score"] >= out["hits"][-1]["score"]


def test_cli_audit_card(ray_session, pages_dir, capsys):
    import json

    from fever_ray import cli as cli_mod

    rc = cli_mod.main(["audit", "--input", pages_dir])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 2000
    assert out["hosts"] > 1
    assert 0.0 <= out["host_gini"] < 1.0
    assert 0.0 < out["top1pct_byte_share"] <= 1.0
    assert out["distinct_masked"] <= out["distinct_raw"] <= out["docs"]
    # natural-ish synthetic text: Zipf slope should be negative
    assert out["zipf_slope"] < 0
    assert out["vocab"] > 0 and out["tokens"] > out["vocab"]


def test_cli_mix_parse_errors():
    import pytest as _pytest

    from fever_ray.cli import _parse_weights

    assert _parse_weights("en=3,de=1") == {"en": 3, "de": 1}
    with _pytest.raises(SystemExit):
        _parse_weights("en")
    with _pytest.raises(SystemExit):
        _parse_weights("en=x")
    with _pytest.raises(SystemExit):
        _parse_weights("")


def test_normalize_urls_cases(ray_session):
    from fever_ray.ops.curate import normalize_urls

    urls = [
        "HTTPS://WWW.Example.COM:443/path?utm_source=a&x=1&fbclid=zz#frag",
        "http://Host.net:80/",
        "http://host.net:8080/p?gclid=1",
        "https://a.b/p/q?id=7",
        "not a url at all",
        "ftp://Files.example.org:21/pub",
    ]
    t = pa.table(
        {"doc_id": pa.array(np.arange(6, dtype=np.int64)), "url": pa.array(urls)}
    )
    out = normalize_urls(ray_session.data.from_arrow(t)).take_all()
    got = {int(r["doc_id"]): r["url_norm"] for r in out}
    assert got == {
        0: "https://www.example.com/path?x=1",  # port+utm+fbclid+frag gone
        1: "http://host.net",  # default port + lone slash gone
        2: "http://host.net:8080/p",  # non-default port kept, query emptied
        3: "https://a.b/p/q?id=7",  # already canonical
        4: "not a url at all",  # unparseable → unchanged passthrough
        5: "ftp://files.example.org:21/pub",  # non-http port untouched
    }


def test_per_group_sample_exact(ray_session):
    from fever_ray.ops.curate import per_group_sample

    ds, t = _mk_docs(ray_session, n=400)
    out = per_group_sample(ds, 10, ["s0", "s1"], seed=7, key_col="source").take_all()
    per = {}
    for r in out:
        per.setdefault(r["source"], set()).add(int(r["doc_id"]))
    assert set(per) == {"s0", "s1"} and all(len(v) == 10 for v in per.values())
    # brute-force: smallest 10 hashes per listed group
    ids = t.column("doc_id").to_numpy()
    src = t.column("source").to_pylist()
    h = hash64_ints(ids, seed=7)
    for g in ("s0", "s1"):
        hs = sorted((h[i], int(ids[i])) for i in range(len(ids)) if src[i] == g)
        assert per[g] == {i for _, i in hs[:10]}
    # k larger than the group → whole group, deterministic
    out = per_group_sample(ds, 10**6, ["s2"], seed=7, key_col="source").take_all()
    assert len(out) == src.count("s2")
    with pytest.raises(ValueError):
        per_group_sample(ds, 0, ["s0"])
    with pytest.raises(ValueError):
        per_group_sample(ds, 5, [])


def test_bloom_cross_dedup_matches_cross_dedup(ray_session):
    """Bloom-prefiltered cross dedup is EXACT: it agrees with cross_dedup
    on a 600-doc corpus with planted cross-duplicates, on every path
    combination (broadcast verify, bucketed-anti-join verify, and the
    too-big-filter fallback)."""
    from fever_ray.ops.dedup import bloom_cross_dedup, cross_dedup

    n = 600
    texts = [f"document body {i % 350} padding" for i in range(n)]
    corpus = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )
    # reference shares every third content and adds its own
    ref_texts = [f"document body {i} padding" for i in range(0, 350, 3)] + [
        "only in the reference"
    ]
    ref = pa.table(
        {
            "doc_id": pa.array(range(1000, 1000 + len(ref_texts)), pa.int64()),
            "text": pa.array(ref_texts),
        }
    )
    cds = ray_session.data.from_arrow(corpus).repartition(4)
    rds = ray_session.data.from_arrow(ref).repartition(2)

    want = sorted(int(r["doc_id"]) for r in cross_dedup(cds, rds).take_all())
    assert 0 < len(want) < n  # the fixture really removes something

    for kwargs in (
        {},                                   # broadcast verify
        {"broadcast_bytes": 2 << 10},         # filter fits nothing → fallback
        {"p": 0.5},                           # high-FP filter: verify must save it
    ):
        out = bloom_cross_dedup(cds, rds, **kwargs).take_all()
        got = sorted(int(r["doc_id"]) for r in out)
        assert got == want, kwargs


def test_bloom_cross_dedup_prebuilt_filter_roundtrip(ray_session, tmp_path):
    """A filter built in one run and reloaded from its DCSO file drives the
    next run to the same exact answer (the incremental-ingest path)."""
    from fever_ray.ops.dedup import add_content_hash, bloom_cross_dedup
    from fever_ray.sketches.bloom import BloomFilter
    from fever_ray.sketches.hashing import splitmix64

    ref = pa.table(
        {
            "doc_id": pa.array([10, 11], pa.int64()),
            "text": pa.array(["shared one", "shared two"]),
        }
    )
    corpus = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["shared one", "fresh", "shared two"]),
        }
    )
    h = (
        add_content_hash(ref)
        .column("content_hash")
        .to_numpy(zero_copy_only=False)
        .view(np.uint64)
    )
    bf = BloomFilter.initialize(1000, 1e-4)
    bf.add_hashes(h, splitmix64(h))
    path = str(tmp_path / "ref.bloom")
    bf.save(path)

    cds = ray_session.data.from_arrow(corpus)
    rds = ray_session.data.from_arrow(ref)
    out = bloom_cross_dedup(cds, rds, bloom=BloomFilter.load(path)).take_all()
    assert sorted(int(r["doc_id"]) for r in out) == [2]


def test_bloom_check_hashes_bit_identity():
    """check_hashes(fnv_pair(v)) ≡ check(v) — the probe fast path can never
    drift from the string path."""
    from fever_ray.sketches.bloom import BloomFilter
    from fever_ray.sketches.hashing import fnv_pair

    bf = BloomFilter.initialize(500, 1e-3)
    ins = [f"key-{i}".encode() for i in range(100)]
    bf.add(ins)
    probe = ins + [f"other-{i}".encode() for i in range(100)]
    np.testing.assert_array_equal(bf.check(probe), bf.check_hashes(*fnv_pair(probe)))
    assert bf.check(ins).all()


def test_cli_embaudit_card(ray_session, tmp_path, capsys):
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fever_ray import cli as cli_mod

    rng = np.random.default_rng(9)
    # planted 2D subspace in 16 dims: effective rank must read ~2
    basis = rng.normal(size=(2, 16))
    vecs = rng.normal(size=(600, 2)) @ basis
    t = pa.table(
        {
            "vec_id": pa.array(range(600), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    pq.write_table(t, tmp_path / "emb.parquet")
    rc = cli_mod.main(["embaudit", "--input", str(tmp_path / "emb.parquet"),
                       "--l", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["dim"] == 16
    assert out["effective_rank"] < 3.0
    assert out["top_eigs"][1] > 100 * max(out["top_eigs"][2], 1e-9)
    assert out["fnorm_sq"] > 0


def test_cli_quantiles_card(ray_session, pages_dir, capsys):
    """All four quantile sketches over the same column in one pass; the
    median estimates must tightly agree (cross-family spread), and every
    line must carry all four members."""
    import json

    from fever_ray import cli as cli_mod

    rc = cli_mod.main(["quantiles", "--input", pages_dir])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["q"] for l in lines] == [0.5, 0.9, 0.99, 0.999]
    for l in lines:
        for member in ("kll", "tdigest", "req", "dd"):
            assert l[member] > 0
    # at the median all four error models are tight: spread under 2%
    assert lines[0]["family_spread"] < 0.02
    # estimates are ordered sanely across quantiles per member
    for member in ("kll", "tdigest", "req", "dd"):
        vals = [l[member] for l in lines]
        assert vals == sorted(vals)
