"""Training-prep operator tests: benchmark decontamination (planted
contamination + partition invariance), context-window chunking (exact
reconstruction + window arithmetic + byte-gather edge cases), and
deterministic split assignment (coverage, proportions, invariance)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.curate import split_assign
from fever_ray.ops.trainprep import (
    _gather_byte_ranges,
    benchmark_ngram_set,
    chunk_documents,
    decontaminate,
)


@pytest.fixture(scope="module")
def toy_ds(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(range(8), pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "quick brown fox jumps somewhere else entirely",
                "completely unrelated words in this line",
                "",
                "one",
                "the quick brown fox again",  # shares 'the quick brown fox'
                "a b",
                "x " * 50,  # trailing space → empty final token
            ],
        }
    )
    return rd.from_arrow(t)


# ---------------------------------------------------------------- gather


def test_gather_byte_ranges_edges():
    buf = np.frombuffer(b"abcdefgh", dtype=np.uint8)
    # zero-length elements interleaved (duplicate boundary indices) and
    # out-of-order starts
    out = _gather_byte_ranges(
        buf,
        np.array([4, 0, 0, 2, 7], dtype=np.int64),
        np.array([2, 0, 0, 3, 1], dtype=np.int64),
    )
    assert out.to_pylist() == ["ef", "", "", "cde", "h"]
    # all-empty
    assert _gather_byte_ranges(
        buf, np.array([3], dtype=np.int64), np.array([0], dtype=np.int64)
    ).to_pylist() == [""]
    # leading zero-length before a real range
    out = _gather_byte_ranges(
        buf,
        np.array([0, 5], dtype=np.int64),
        np.array([0, 3], dtype=np.int64),
    )
    assert out.to_pylist() == ["", "fgh"]


# ---------------------------------------------------------- decontaminate


def test_decontaminate_planted(toy_ds):
    import ray.data as rd

    bench = benchmark_ngram_set(
        rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([100], pa.int64()),
                    "text": ["the quick brown fox ran far away"],
                }
            )
        ),
        n=4,
    )
    # docs 0 and 5 share the 4-gram 'the quick brown fox'; doc 1 shares only
    # shorter overlaps ('quick brown fox jumps' is not in the benchmark)
    kept = sorted(decontaminate(toy_ds, bench, n=4).to_pandas()["doc_id"])
    assert kept == [1, 2, 3, 4, 6, 7]
    flagged = decontaminate(toy_ds, bench, n=4, mode="flag").to_pandas()
    assert sorted(flagged.loc[flagged["contaminated"], "doc_id"]) == [0, 5]
    # partition invariance: same verdicts under any block layout
    kept2 = sorted(
        decontaminate(toy_ds.repartition(5), bench, n=4).to_pandas()["doc_id"]
    )
    assert kept == kept2


def test_decontaminate_empty_benchmark(toy_ds):
    bench = pa.array([], pa.string())
    assert len(decontaminate(toy_ds, bench, n=4).to_pandas()) == 8


def test_decontaminate_bad_mode(toy_ds):
    with pytest.raises(ValueError):
        decontaminate(toy_ds, pa.array([], pa.string()), mode="purge")


# ------------------------------------------------------- chunk_documents


def test_chunk_reconstruction(toy_ds):
    """Non-overlapping chunks concatenate back to the exact original text."""
    out = (
        chunk_documents(toy_ds, chunk=3, overlap=0)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    orig = {r["doc_id"]: r["text"] for r in toy_ds.take_all()}
    for doc_id, grp in out.groupby("doc_id"):
        assert " ".join(grp["chunk_text"]) == orig[doc_id]
        # chunk ids are dense from 0
        assert list(grp["chunk_id"]) == list(range(len(grp)))
        # all but the last chunk are full
        assert all(n == 3 for n in grp["n_tokens"][:-1])


def test_chunk_overlap_window_arithmetic(ray_session):
    import ray.data as rd

    text = " ".join(f"t{i}" for i in range(10))
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
    )
    out = (
        chunk_documents(ds, chunk=4, overlap=2)
        .to_pandas()
        .sort_values("chunk_id")
    )
    # L=10, S=2 → (10-4+1)//2+1 = 4 windows at starts 0,2,4,6
    assert list(out["chunk_text"]) == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6 t7",
        "t6 t7 t8 t9",
    ]
    assert list(out["n_tokens"]) == [4, 4, 4, 4]


def test_chunk_validation(toy_ds):
    with pytest.raises(ValueError):
        chunk_documents(toy_ds, chunk=0)
    with pytest.raises(ValueError):
        chunk_documents(toy_ds, chunk=4, overlap=4)


def test_chunk_null_text(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a b", None], pa.string()),
            }
        )
    )
    out = chunk_documents(ds, chunk=2).to_pandas().sort_values("doc_id")
    assert list(out["chunk_text"]) == ["a b", ""]


# ---------------------------------------------------------- split_assign


def test_split_assign_coverage_and_invariance(ray_session):
    import ray.data as rd

    n = 20000
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(n), pa.int64())}))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(ds, w, seed=13).to_pandas()
    counts = out["split"].value_counts()
    assert set(counts.index) == set(w)
    for name, frac in w.items():
        sd = (n * frac * (1 - frac)) ** 0.5
        assert abs(counts[name] - n * frac) <= 5 * sd, (name, counts[name])
    # pure function of (id, seed): block layout cannot move a row
    out2 = split_assign(ds.repartition(7), w, seed=13).to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # weights needn't sum to 1 — ratios are what matters
    out3 = split_assign(ds, {"train": 8, "val": 1, "test": 1}, seed=13).to_pandas()
    merged = out.merge(out3, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_split_assign_validation(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        split_assign(ds, {})
    with pytest.raises(ValueError):
        split_assign(ds, {"a": -0.5, "b": 1.0})
    with pytest.raises(ValueError):
        split_assign(ds, {"a": 0.0})
    # single split: everything lands there
    out = split_assign(ds, {"all": 1.0}).to_pandas()
    assert list(out["split"]) == ["all"]


def test_split_assign_sql_single_split():
    """The oracle generator must emit parseable SQL for one split (a CASE
    with zero WHEN arms is a DuckDB parse error)."""
    import duckdb

    import __ray_entry__ as entry

    sql = entry._split_assign_sql({"all": 1.0}, seed=7)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, 'en' AS lang"
    )
    rows = con.execute(sql).fetchall()
    con.close()
    assert [r[-1] for r in rows] == ["all"]


# ---------------------------------------------------- leakage_safe_split


def test_leakage_safe_split_duplicates_coassign(ray_session):
    """Byte-identical texts MUST land in the same split regardless of id,
    shard, or block layout — the invariant that makes the split leakage-safe
    before dedup; and the fractions stay calibrated like split_assign's."""
    import ray.data as rd

    from fever_ray.ops.curate import leakage_safe_split

    n = 12000
    # each distinct text appears under 3 unrelated ids, interleaved
    texts = [f"doc body {i % (n // 3)} words here" for i in range(n)]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(ds, w, seed=13).to_pandas()
    per_text = out.groupby("text")["split"].nunique()
    assert (per_text == 1).all(), "duplicate content straddled splits"
    # calibration over the n//3 DISTINCT contents (the unit being assigned)
    distinct = out.drop_duplicates("text")["split"].value_counts()
    m = n // 3
    for name, frac in w.items():
        sd = (m * frac * (1 - frac)) ** 0.5
        assert abs(distinct.get(name, 0) - m * frac) <= 5 * sd, name
    # partition invariance: a pure function of (content, seed)
    out2 = leakage_safe_split(ds.repartition(7), w, seed=13).to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()
    # null text hashes like "" (the engine-wide hash64 null rule)
    ds_null = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([None, ""], pa.string()),
            }
        )
    )
    outn = leakage_safe_split(ds_null, w, seed=13).to_pandas()
    assert outn["split"].nunique() == 1


# ---------------------------------------------------------- epoch_shuffle


def test_epoch_shuffle_exact_global_ranks(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import epoch_shuffle
    from fever_ray.sketches.hashing import hash64_ints

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = epoch_shuffle(ds, seed=5, n_buckets=16).to_pandas()
    assert len(out) == n
    # exact permutation of 0..n-1
    assert sorted(out["shuffle_pos"]) == list(range(n))
    # matches the brute-force rank under (hash, id)
    h = hash64_ints(ids, seed=5)
    order = np.lexsort((ids, h))
    want = np.empty(n, dtype=np.int64)
    want[order] = np.arange(n)
    got = out.set_index("doc_id")["shuffle_pos"]
    assert (got.loc[ids].to_numpy() == want).all()
    # pure function of (id, seed): block layout cannot move a rank
    out2 = epoch_shuffle(ds.repartition(7), seed=5, n_buckets=16).to_pandas()
    merged = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shuffle_pos_a"] == merged["shuffle_pos_b"]).all()
    # a different seed is a different permutation
    out3 = epoch_shuffle(ds, seed=6, n_buckets=16).to_pandas()
    merged = out.merge(out3, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shuffle_pos_a"] != merged["shuffle_pos_b"]).any()


def test_epoch_shuffle_validation(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import epoch_shuffle

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError):
        epoch_shuffle(ds, n_buckets=12)
    out = epoch_shuffle(ds, n_buckets=1).to_pandas()
    assert sorted(out["shuffle_pos"]) == [0, 1]


# ---------------------------------------------------------- pack_sequences


def _brute_pack(ids, texts, budget, seed, n_buckets):
    from fever_ray.ops.trainprep import _bucket_of

    _, buckets = _bucket_of(pa.array(ids, pa.int64()), seed, n_buckets)
    rows = []
    for b in sorted(set(buckets)):
        sel = [i for i in np.argsort(ids, kind="stable") if buckets[i] == b]
        pos = 0
        for i in sel:
            t = texts[i] if texts[i] is not None else ""
            L = t.count(" ") + 1
            start = 0
            while start < L:
                p = (pos + start) // budget
                seg_end = min(L, (p + 1) * budget - pos)
                rows.append((b, p, ids[i], start, seg_end, seg_end - start))
                start = seg_end
            pos += L
    return rows


def test_pack_sequences_matches_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import pack_sequences

    rng = np.random.default_rng(3)
    n = 400
    ids = np.arange(n, dtype=np.int64)
    texts = [
        None if i % 37 == 0 else " ".join(["w"] * int(rng.integers(1, 40)))
        for i in range(n)
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    out = pack_sequences(ds, budget=16, seed=2, n_buckets=8).to_pandas()
    got = sorted(
        zip(out["bucket"], out["pack_id"], out["doc_id"], out["tok_start"],
            out["tok_end"], out["n_tokens"])
    )
    want = sorted(_brute_pack(list(ids), texts, 16, 2, 8))
    assert got == want
    # every token of every doc is covered exactly once
    per_doc = out.groupby("doc_id")["n_tokens"].sum()
    for i in range(n):
        L = (texts[i] or "").count(" ") + 1
        assert per_doc[i] == L
    # packs are full (== budget) except possibly the last pack per bucket
    pack_tot = out.groupby(["bucket", "pack_id"])["n_tokens"].sum().reset_index()
    last = pack_tot.groupby("bucket")["pack_id"].max()
    for _, r in pack_tot.iterrows():
        if r["pack_id"] != last[r["bucket"]]:
            assert r["n_tokens"] == 16
    # layout-invariant
    out2 = pack_sequences(ds.repartition(5), budget=16, seed=2, n_buckets=8).to_pandas()
    got2 = sorted(
        zip(out2["bucket"], out2["pack_id"], out2["doc_id"], out2["tok_start"],
            out2["tok_end"], out2["n_tokens"])
    )
    assert got2 == want


def test_pack_sequences_validation(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import pack_sequences

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["a b c"])}))
    with pytest.raises(ValueError):
        pack_sequences(ds, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(ds, budget=8, n_buckets=3)


def test_token_budget_mix_recipe_properties(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import token_budget_mix
    from fever_ray.sketches.hashing import hash64_ints

    rng = np.random.default_rng(31)
    n = 1200
    ids = np.arange(n, dtype=np.int64)
    srcs = np.array(["web", "code", "books", "junk"])[rng.integers(0, 4, n)]
    texts = [" ".join(["w"] * int(k)) for k in rng.integers(1, 30, n)]
    t = pa.table(
        {"doc_id": ids, "source": pa.array(srcs.tolist()), "text": texts}
    )
    weights = {"web": 2, "code": 1, "books": 1}
    budget = 4000
    outs = []
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            sorted(
                (r["doc_id"], r["source"], r["n_tokens"])
                for r in token_budget_mix(
                    ds, weights, budget, seed=5, n_buckets=64
                ).take_all()
            )
        )
    assert outs[0] == outs[1]
    rows = outs[0]
    # unlisted sources never appear
    assert all(s != "junk" for _, s, _ in rows)
    ntok = {int(i): len(tx.split(" ")) for i, tx in zip(ids, texts)}
    h = hash64_ints(ids, seed=5)
    for s, w in weights.items():
        b_s = w * budget // sum(weights.values())
        kept = [i for i, ss, _ in rows if ss == s]
        total = sum(ntok[i] for i in kept)
        assert total <= b_s
        # prefix property: kept docs are exactly the hash-order prefix of
        # the source whose whole counts fit
        src_ids = ids[srcs == s]
        order = src_ids[np.lexsort((src_ids, h[srcs == s]))]
        cum, want = 0, []
        for i in order:
            if cum + ntok[int(i)] > b_s:
                break
            cum += ntok[int(i)]
            want.append(int(i))
        assert sorted(kept) == sorted(want)
    with pytest.raises(ValueError, match="weights"):
        token_budget_mix(rd.from_arrow(t), {}, 100)
    with pytest.raises(ValueError, match="budget"):
        token_budget_mix(rd.from_arrow(t), weights, -1)


def test_contamination_report_planted_overlap(ray_session):
    import ray.data as rd

    from fever_ray.ops.trainprep import contamination_report

    # bench doc 1: 5 tokens -> 4 distinct 2-grams, "b c" and "c d" planted
    # in the corpus -> 2 hits.  bench doc 2: no overlap.  bench doc 3:
    # 1 token -> no grams -> absent from the report.
    bench = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": ["a b c d e", "x y z", "q"],
            }
        )
    ).repartition(2)
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11], pa.int64()),
                "text": ["u b c d w b c", "nothing shared here at all"],
            }
        )
    ).repartition(2)
    out = (
        contamination_report(corpus, bench, n=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_grams"] == 4 and out.loc[1, "n_hit"] == 2
    assert out.loc[2, "n_grams"] == 2 and out.loc[2, "n_hit"] == 0

    # duplicate grams inside one bench doc count once
    rep = rd.from_arrow(
        pa.table({"doc_id": pa.array([5], pa.int64()), "text": ["b c b c b c"]})
    )
    out2 = contamination_report(corpus, rep, n=2).to_pandas()
    # distinct grams of "b c b c b c": "b c", "c b" -> both hit ("c b"? no)
    assert int(out2["n_grams"][0]) == 2 and int(out2["n_hit"][0]) == 1
