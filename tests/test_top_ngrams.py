"""top_ngrams: exact global counts (no per-batch pruning before the sum),
deterministic tie-break, partition invariance, trigram support."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.textstats import top_ngrams


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _oracle(sf_dir, n, k):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{sf_dir}/documents.parquet')"
    )
    gram = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return con.execute(
        f"WITH toks AS (SELECT string_split(text,' ') AS t FROM documents WHERE text <> ''), "
        f"bi AS (SELECT unnest(list_transform(range(1, len(t) - {n - 2}), i -> {gram})) AS ngram FROM toks), "
        "cnt AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY ngram) "
        f"SELECT ngram, n FROM cnt ORDER BY n DESC, ngram ASC LIMIT {k}"
    ).fetchall()


@pytest.mark.parametrize("n", [2, 3])
def test_top_ngrams_vs_oracle(docs_ds, sf_dir, n):
    got = [(r["ngram"], r["n"]) for r in top_ngrams(docs_ds, n=n, k=15).take_all()]
    assert got == _oracle(sf_dir, n, 15)


def test_partition_invariance(docs_ds, sf_dir):
    a = [(r["ngram"], r["n"]) for r in top_ngrams(docs_ds, n=2, k=10).take_all()]
    b = [
        (r["ngram"], r["n"])
        for r in top_ngrams(docs_ds.repartition(11), n=2, k=10).take_all()
    ]
    assert a == b


def test_cross_doc_ngrams_not_counted(ray_session):
    """The last token of one doc never pairs with the first of the next."""
    import ray.data as rd

    t = pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(["a b", "c d"])}
    )
    out = {(r["ngram"], r["n"]) for r in top_ngrams(rd.from_arrow(t), n=2, k=10).take_all()}
    assert out == {("a b", 1), ("c d", 1)}


def test_heavy_ngrams_zipf_matches_bruteforce(ray_session):
    """On Zipf-distributed text (the real-web regime heavy_ngrams targets)
    the sketch-pruned result equals brute-force heavy hitters exactly, and
    the CMS pass prunes the survivor shuffle hard."""
    import collections

    import numpy as np
    import ray.data as rd

    from fever_ray.ops.textstats import heavy_ngrams

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(2000)]
    texts = []
    for _ in range(1500):
        ids = np.minimum(rng.zipf(1.3, size=40) - 1, len(vocab) - 1)
        texts.append(" ".join(vocab[i] for i in ids))
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )

    counter = collections.Counter()
    for text in texts:
        toks = text.split(" ")
        counter.update(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    min_count = 30
    want = sorted(
        ((g, c) for g, c in counter.items() if c >= min_count),
        key=lambda gc: (-gc[1], gc[0]),
    )[:20]

    got = [
        (r["ngram"], r["n"])
        for r in heavy_ngrams(
            rd.from_arrow(t).repartition(6),
            n=2,
            min_count=min_count,
            k=20,
            width=1 << 16,
            depth=4,
        ).take_all()
    ]
    assert got == want and len(got) == 20


def test_char_bigram_oov_kernel_and_pipeline(ray_session):
    """Flat-buffer bigram extraction matches a per-string reference on
    boundary-heavy layouts (empty docs, len-1 docs, doc joins); OOV counts
    against a reference corpus are exact integers."""
    import numpy as np
    import pyarrow as pa

    from fever_ray.ops.textstats import _batch_bigram_codes, char_bigram_oov

    texts = pa.array(["abc", "", "x", "abzz", "", "qq", None])
    codes, nbi = _batch_bigram_codes(texts)
    want = []
    for t in texts.to_pylist():
        t = t or ""
        want += [ord(t[i]) * 256 + ord(t[i + 1]) for i in range(len(t) - 1)]
    assert codes.tolist() == want
    assert nbi.tolist() == [2, 0, 0, 3, 0, 1, 0]

    ref = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["the cat sat on a mat"])})
    )
    cor = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                  "text": pa.array(["the cat", "zzqq!!", "", "a"])})
    ).repartition(3)
    out = {r["doc_id"]: (r["n_bigrams"], r["n_oov"])
           for r in char_bigram_oov(cor, ref).take_all()}
    assert out == {10: (6, 0), 11: (5, 5), 12: (0, 0), 13: (0, 0)}


def test_unigram_logloss_exact_vs_local_model(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import _ilog2_exact, unigram_logloss

    ref_texts = ["the cat sat", "the dog sat on the mat", "cat and dog"]
    cor_texts = ["the cat", "unseen words here", "", "the the the"]
    ref = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": ref_texts})
    ).repartition(2)
    cor = rd.from_arrow(
        pa.table({"doc_id": [10, 11, 12, 13], "text": cor_texts})
    ).repartition(3)
    out = {
        r["doc_id"]: (r["n_tokens"], r["bits"])
        for r in unigram_logloss(cor, ref, oov_penalty_bits=8).take_all()
    }
    # local model
    from collections import Counter

    model = Counter(" ".join(ref_texts).split(" "))
    n = sum(model.values())  # 12 tokens
    iln = int(_ilog2_exact(np.array([n]))[0])

    def bits(text):
        toks = text.split(" ")
        return sum(
            iln + 8 if t not in model else iln - int(_ilog2_exact(np.array([model[t]]))[0])
            for t in toks
        ), len(toks)

    for did, text in zip([10, 11, 12, 13], cor_texts):
        b, nt = bits(text)
        assert out[did] == (nt, b), (did, out[did], (nt, b))
    # empty text is the single token '' (OOV here)
    assert out[12] == (1, iln + 8)


def test_unigram_logloss_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import unigram_logloss

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                    "text": pa.array([], pa.string())}))
    cor = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="no tokens"):
        unigram_logloss(cor, empty)
    # the cap now trips INSIDE the combine tree (max_groups) before any
    # driver collection; the driver-side max_vocab check remains a backstop
    with pytest.raises(Exception, match="max_groups|max_vocab"):
        unigram_logloss(cor, cor, max_vocab=0)
    with pytest.raises(ValueError, match="oov_penalty"):
        unigram_logloss(cor, cor, oov_penalty_bits=-1)


def test_corpus_report_exact_and_empty(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import corpus_report

    t = pa.table(
        {
            "text": ["a b c", "", "d e", "a b c"],
            "lang": ["en", "en", "de", None],
            "source": ["s1", "s2", "s1", "s1"],
        }
    )
    got = {
        r["metric"]: r["value"]
        for r in corpus_report(rd.from_arrow(t).repartition(3)).take_all()
    }
    # empty text = 1 token (the shared trainprep split model)
    assert got == {
        "n_docs": 4, "n_tokens": 3 + 1 + 2 + 3, "n_chars": 5 + 0 + 3 + 5,
        "n_empty_docs": 1, "min_tokens": 1, "max_tokens": 3,
        "n_distinct_langs": 2, "n_distinct_sources": 2,
    }
    empty = pa.table(
        {
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
        }
    )
    gote = {
        r["metric"]: r["value"]
        for r in corpus_report(rd.from_arrow(empty)).take_all()
    }
    assert gote["n_docs"] == 0 and gote["n_distinct_langs"] == 0
    assert "min_tokens" not in gote  # no rows -> no min/max metrics


def test_ngram_novelty_planted_corpus(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import ngram_novelty
    from fever_ray.sketches.minhash import _shingle_hash_flat, _tokenize_batch

    texts = [
        "alpha beta gamma delta epsilon zeta",   # 0: duplicated below
        "alpha beta gamma delta epsilon zeta",   # 1: exact dup of 0
        "one two three four five six seven",     # 2: fully unique
        "alpha beta gamma NINE ten eleven",      # 3: shares a prefix shingle with 0/1
        "tiny doc",                              # 4: < 3 tokens → no shingles
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    ).repartition(3)
    got = {
        r["doc_id"]: (r["novel_shingles"], r["total_shingles"])
        for r in ngram_novelty(ds, n_shingle=3).take_all()
    }
    # reference over the SAME position-mixed shingle-fold hashes the
    # dedup family uses (zero shingles for docs shorter than n tokens)
    tok_h, offs = _tokenize_batch(texts)
    sh, sh_off = _shingle_hash_flat(tok_h, offs, 3)
    sets = [
        set(sh[s:e].tolist()) for s, e in zip(sh_off[:-1], sh_off[1:])
    ]
    from collections import Counter

    freq = Counter(h for s in sets for h in s)
    want = {
        i: (sum(1 for h in s if freq[h] == 1), len(s))
        for i, s in enumerate(sets)
    }
    assert got == want
    assert got[0] == (0, 4) and got[1] == (0, 4)   # dups: nothing novel
    assert got[2] == (5, 5)                        # unique doc: all novel
    assert got[4] == (0, 0)                        # shingle-less sentinel
    # partition invariance
    got2 = {
        r["doc_id"]: (r["novel_shingles"], r["total_shingles"])
        for r in ngram_novelty(ds.repartition(1), n_shingle=3).take_all()
    }
    assert got2 == got


def test_cooccurrence_counts_vs_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    from fever_ray.ops.textstats import cooccurrence_counts

    texts = [
        "cat dog cat fish",      # cat counts twice for vocab, once for docs
        "dog fish bird",
        "cat bird bird bird",
        "wolf owl",              # outside top-4 vocab
        "dog cat",
    ]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(3)
    got = {
        (r["tok_a"], r["tok_b"]): (r["n_both"], r["n_a"], r["n_b"])
        for r in cooccurrence_counts(ds, v=4).take_all()
    }
    # brute force: vocab = top-4 tokens by occurrence (desc, token asc)
    from collections import Counter

    occ = Counter(t for x in texts for t in x.split(" "))
    vocab = [t for t, _ in sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:4]]
    docsets = [set(x.split(" ")) & set(vocab) for x in texts]
    want = {}
    for a, b in itertools.combinations(sorted(vocab), 2):
        nb = sum(1 for s in docsets if a in s and b in s)
        if nb:
            na = sum(1 for s in docsets if a in s)
            n_b = sum(1 for s in docsets if b in s)
            want[(a, b)] = (nb, na, n_b)
    assert got == want and len(got) > 0
    # partition invariance
    got2 = {
        (r["tok_a"], r["tok_b"]): (r["n_both"], r["n_a"], r["n_b"])
        for r in cooccurrence_counts(ds.repartition(1), v=4).take_all()
    }
    assert got2 == got
    with pytest.raises(ValueError, match="v must be"):
        cooccurrence_counts(ds, v=1)


def test_vocab_coverage_boundary_ties_break_lexicographically(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import vocab_coverage

    # counts: aa=4, plus {bb,cc,dd,ee}=2 each -> total 12.  p=1/2 -> target
    # mass 6: keep aa (prefix 0) then the lexicographically first equal-count
    # token bb (prefix 4); cc has prefix 6, 2*6 !< 12 -> cut exactly there
    docs = ["aa aa aa aa", "bb bb cc cc", "dd dd ee ee"]
    ds = rd.from_arrow(pa.table({"text": docs})).repartition(3)
    out = vocab_coverage(ds, p_num=1, p_den=2).to_pandas()
    got = sorted(zip(out["token"], out["n"]))
    assert got == [("aa", 4), ("bb", 2)]

    # p = 1 keeps the whole vocabulary
    full = vocab_coverage(rd.from_arrow(pa.table({"text": docs})), 1, 1).to_pandas()
    assert sorted(full["token"]) == ["aa", "bb", "cc", "dd", "ee"]

    # empty / ''-only corpus -> empty selection, stable schema
    empty = vocab_coverage(rd.from_arrow(pa.table({"text": ["", ""]})), 1, 2)
    edf = empty.to_pandas() if hasattr(empty, "to_pandas") else empty
    assert len(edf) == 0 and list(sorted(edf.columns)) == ["n", "token"]

    with pytest.raises(Exception, match="p_num/p_den"):
        vocab_coverage(ds, 3, 2)


def test_bigram_logloss_hand_computed(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import bigram_logloss

    # ref: uni a=3,b=2,c=1 (N=6, ilog2=2) -> cost a=1,b=1,c=2, oov=10;
    # bigrams "a b":2,"b a":1,"a c":1; ctx a=3,b=1 ->
    # cost("a b")=1-1=0, cost("b a")=0-0=0, cost("a c")=1-0=1
    ref = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a b a b", "a c"]})
    ).repartition(2)
    score = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12], pa.int64()),
                "text": ["a b x c", "a", "a c a b"],
            }
        )
    ).repartition(2)
    out = (
        bigram_logloss(score, ref, oov_penalty_bits=8, backoff_penalty_bits=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 10: a(1) + "a b"(0) + b-x unseen: oov(10)+backoff(4) + x-c unseen:
    # c(2)+backoff(4) = 21
    assert out.loc[10, "n_tokens"] == 4 and out.loc[10, "bits"] == 21
    # doc 11: first token only -> uni(a) = 1
    assert out.loc[11, "n_tokens"] == 1 and out.loc[11, "bits"] == 1
    # doc 12: a(1) + "a c"(1) + "c a" unseen: a(1)+4 + "a b"(0) = 7
    assert out.loc[12, "n_tokens"] == 4 and out.loc[12, "bits"] == 7


def test_pii_report_counts_docs_and_hits(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import pii_report

    docs = [
        "reach me at bob@x.org or sue@y.io thanks",
        "server 10.0.0.1 and 192.168.0.7 up",
        "plain text with nothing to find",
        "card 1234567890123456 leaked to bob@x.org",
    ]
    out = (
        pii_report(rd.from_arrow(pa.table({"text": docs})).repartition(2))
        .to_pandas()
        .set_index("pattern")
    )
    assert out.loc["email", "n_docs"] == 2 and out.loc["email", "n_hits"] == 3
    assert out.loc["ipv4", "n_docs"] == 1 and out.loc["ipv4", "n_hits"] == 2
    assert out.loc["digits16", "n_docs"] == 1 and out.loc["digits16", "n_hits"] == 1

    with pytest.raises(Exception, match="at least one"):
        pii_report(rd.from_arrow(pa.table({"text": docs})), patterns={})


def test_corpus_checksum_order_independent_and_exact(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import corpus_checksum
    from fever_ray.sketches.hashing import hash64

    texts = [f"doc number {i} body {'x' * (i % 17)}" for i in range(500)]
    t = pa.table({"text": pa.array(texts)})
    want = int(hash64(pa.array(texts)).sum(dtype=np.uint64))
    if want >= 1 << 63:
        want -= 1 << 64
    outs = []
    for parts in (1, 11):
        row = corpus_checksum(rd.from_arrow(t).repartition(parts)).take_all()
        assert len(row) == 1
        outs.append((row[0]["n_rows"], row[0]["checksum"]))
    assert outs[0] == outs[1] == (500, want)
    # empty corpus reports zeros; a one-char change moves the checksum
    empty = corpus_checksum(rd.from_arrow(t.slice(0, 0))).take_all()
    assert (empty[0]["n_rows"], empty[0]["checksum"]) == (0, 0)
    t2 = pa.table({"text": pa.array(texts[:-1] + [texts[-1] + "!"])})
    row2 = corpus_checksum(rd.from_arrow(t2)).take_all()
    assert row2[0]["checksum"] != want


def test_vocab_drift_vs_bruteforce(ray_session):
    import ray.data as rd
    from collections import Counter

    from fever_ray.ops.textstats import vocab_drift

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    ids, texts = [], []
    for i in range(300):
        # even docs skew toward the low vocab ids, odd toward the high —
        # plants real drift in the head tokens
        lo, hi = (0, 18) if i % 2 == 0 else (12, 30)
        texts.append(" ".join(vocab[rng.integers(lo, hi)] for _ in range(25)))
        ids.append(i)
    t = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    for i, txt in zip(ids, texts):
        (ca if i % 2 == 0 else cb).update(txt.split())
    na, nb = sum(ca.values()), sum(cb.values())
    # token rates are ~1/18, so drift needs a threshold below that:
    # 2% rate difference separates the exclusive tokens from the overlap
    allt = sorted(
        set(ca) | set(cb), key=lambda w: (-(ca[w] + cb[w]), w)
    )[:18]
    want = {
        w: (
            ca[w],
            cb[w],
            int(50 * abs(ca[w] * nb - cb[w] * na) > 1 * na * nb),
        )
        for w in allt
    }
    for parts in (1, 7):
        out = {
            r["token"]: (r["n_a"], r["n_b"], r["drifted"])
            for r in vocab_drift(
                rd.from_arrow(t).repartition(parts), v=18, t_num=1, t_den=50
            ).take_all()
        }
        assert out == want
    assert any(d for _, _, d in want.values())  # drift actually planted
    assert not all(d for _, _, d in want.values())


def test_vocab_growth_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import vocab_growth

    rng = np.random.default_rng(81)
    vocab = [f"t{i}" for i in range(60)]
    ids = np.arange(10, 210, dtype=np.int64)  # non-zero-based ids
    texts = [
        " ".join(vocab[rng.integers(0, min(5 + i, 60))] for _ in range(12))
        for i in range(200)
    ]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ck = np.unique(10 + (np.arange(7, dtype=np.int64) * (209 - 10)) // 6)
    want = []
    for c in ck:
        seen = set()
        nd = 0
        for i, txt in zip(ids, texts):
            if i <= c:
                nd += 1
                seen.update(txt.split())
        want.append((int(c), nd, len(seen)))
    for parts in (1, 6):
        out = [
            (r["upto_id"], r["n_docs"], r["n_distinct"])
            for r in vocab_growth(
                rd.from_arrow(t).repartition(parts), n_checkpoints=7
            ).take_all()
        ]
        assert sorted(out) == want
    # growth curve is monotone and ends at the full vocabulary
    nds = [w[2] for w in want]
    assert nds == sorted(nds) and nds[-1] == len(
        {w for txt in texts for w in txt.split()}
    )


def test_zipf_audit_moments_and_slope(ray_session):
    import ray.data as rd

    from fever_ray.ops.textstats import _ilog2_rangesum, zipf_audit

    # range-sum helper vs brute force
    rng = np.random.default_rng(3)
    a = rng.integers(1, 1000, 50).astype(np.int64)
    b = a + rng.integers(0, 500, 50)
    s1, s2 = _ilog2_rangesum(a, b)
    for i in range(50):
        xs = np.arange(a[i], b[i] + 1)
        il = np.frexp(xs.astype(np.float64))[1] - 1
        assert s1[i] == il.sum() and s2[i] == (il * il).sum()

    # synthetic Zipf corpus: token k appears ~C/k times -> slope ~ -1
    docs = []
    C = 2048
    toks = []
    for k in range(1, 257):
        toks += [f"w{k}"] * (C // k)
    rng.shuffle(toks)
    for i in range(0, len(toks), 50):
        docs.append({"text": " ".join(toks[i : i + 50])})
    for parts in (1, 4):
        (r,) = zipf_audit(
            rd.from_items(docs).repartition(parts)
        ).take_all()
        n, sx, sy, sxx, sxy = (
            r["n_tokens"], r["sx"], r["sy"], r["sxx"], r["sxy"]
        )
        assert n == 256
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert -1.3 < slope < -0.7, slope
        # brute-force moment check
        counts = np.array([C // k for k in range(1, 257)])
        order = np.argsort(-counts, kind="stable")
        cs = counts[order]
        rk = np.arange(1, 257)
        x = np.frexp(rk.astype(np.float64))[1] - 1
        y = np.frexp(cs.astype(np.float64))[1] - 1
        assert (sx, sy, sxx, sxy) == (
            int(x.sum()), int(y.sum()), int((x * x).sum()), int((x * y).sum())
        )
