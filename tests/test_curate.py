"""Curation-operator tests: deterministic hash sampling (partition
invariance + fraction bounds), per-domain caps (vs a DuckDB window oracle +
bounded shuffle), token repetition stats (vs an exact explode/groupby
oracle), and the composite curation filter."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.curate import (
    _rank_within_key,
    curation_filter,
    domain_cap,
    hash_sample,
    quantile_length_filter,
    sample_threshold,
    token_repetition,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


@pytest.fixture(scope="module")
def docs_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def test_sample_threshold_exact():
    assert sample_threshold(0.0) == 0
    assert sample_threshold(0.25) == 1 << 62
    assert sample_threshold(0.5) == 1 << 63
    assert sample_threshold(1.0) == 2**64 - 1
    with pytest.raises(ValueError):
        sample_threshold(1.5)


def test_hash_sample_partition_invariant(docs_ds):
    """Membership depends only on (id, seed): any re-partitioning selects
    the identical id set, and different seeds select different sets."""
    a = sorted(
        r["doc_id"] for r in hash_sample(docs_ds, 0.3, seed=7).take_all()
    )
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs_ds.repartition(7), 0.3, seed=7).take_all()
    )
    assert a == b and len(a) > 0
    c = sorted(r["doc_id"] for r in hash_sample(docs_ds, 0.3, seed=8).take_all())
    assert a != c
    n = docs_ds.count()
    # Bernoulli(0.3): 4-sigma band
    sd = (0.3 * 0.7 * n) ** 0.5
    assert abs(len(a) - 0.3 * n) < 4 * sd + 1


def test_domain_cap_vs_oracle(docs_ds, sf_dir):
    got = sorted(
        (r["source"], r["doc_id"])
        for r in domain_cap(docs_ds, cap=3).take_all()
    )
    want = sorted(
        _duck(
            sf_dir,
            "SELECT source, doc_id FROM (SELECT source, doc_id, "
            "row_number() OVER (PARTITION BY source ORDER BY doc_id) rn "
            "FROM documents) WHERE rn <= 3",
        )
    )
    assert got == want


def test_domain_cap_local_prune_bounds_shuffle(ray_session):
    """The per-batch prune guarantees ≤ cap rows per key leave any batch —
    a skewed key costs cap × n_blocks shuffle rows, never its row count."""
    import ray.data as rd

    from fever_ray.ops.curate import domain_cap as dc

    n = 5000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(["hot"] * (n - 10) + [f"s{i}" for i in range(10)]),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    out = dc(ds, cap=5).take_all()
    per_key = {}
    for r in out:
        per_key[r["source"]] = per_key.get(r["source"], 0) + 1
    assert per_key["hot"] == 5
    assert all(v <= 5 for v in per_key.values())
    # hot key keeps its 5 smallest doc_ids
    hot = sorted(r["doc_id"] for r in out if r["source"] == "hot")
    assert hot == [0, 1, 2, 3, 4]


def test_rank_within_key_stable_ties():
    codes = np.array([1, 1, 1, 0], dtype=np.int64)
    order = np.array([7, 7, 3, 9], dtype=np.int64)
    # ties on order broken by original position (stable lexsort)
    assert _rank_within_key(codes, order).tolist() == [1, 2, 0, 0]


def test_token_repetition_vs_oracle(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    got = (
        token_repetition(t)
        .select(
            ["doc_id", "n_tokens", "n_distinct_tokens", "dup_token_ratio", "top_token_frac"]
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rows = _duck(
        sf_dir,
        "WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t "
        "FROM documents WHERE text <> ''), "
        "tc AS (SELECT doc_id, t, count(*) c FROM tok GROUP BY doc_id, t), "
        "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n, CAST(count(*) AS BIGINT) d, "
        "CAST(max(c) AS BIGINT) tc FROM tc GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(a.n,0), coalesce(a.d,0), "
        "CAST(coalesce(a.n,0)-coalesce(a.d,0) AS DOUBLE)/CAST(greatest(coalesce(a.n,0),1) AS DOUBLE), "
        "CAST(coalesce(a.tc,0) AS DOUBLE)/CAST(greatest(coalesce(a.n,0),1) AS DOUBLE) "
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id",
    )
    for i, (doc_id, n, d, dup, top) in enumerate(rows):
        assert got.loc[i, "doc_id"] == doc_id
        assert got.loc[i, "n_tokens"] == n
        assert got.loc[i, "n_distinct_tokens"] == d
        assert got.loc[i, "dup_token_ratio"] == dup
        assert got.loc[i, "top_token_frac"] == top


def test_token_repetition_edge_cases():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "a", "a a a a", "a b a b c"]),
        }
    )
    out = token_repetition(t)
    assert out.column("n_tokens").to_pylist() == [0, 1, 4, 5]
    assert out.column("n_distinct_tokens").to_pylist() == [0, 1, 1, 3]
    assert out.column("dup_token_ratio").to_pylist() == [0.0, 0.0, 0.75, 0.4]
    assert out.column("top_token_frac").to_pylist() == [0.0, 1.0, 1.0, 0.4]


def test_quantile_length_filter_exact_below_saturation(docs_ds, sf_dir):
    """Below the KLL buffer capacity the learned thresholds are the exact
    'first rank ≥ q·n' order statistics — verified against a window-function
    oracle, with the input repartitioned so the merge path is exercised."""
    got = sorted(
        (r["doc_id"], r["n_tokens"])
        for r in quantile_length_filter(
            docs_ds.repartition(5), lo_q=0.25, hi_q=0.75, kll_k=1024
        ).take_all()
    )
    want = sorted(
        _duck(
            sf_dir,
            "WITH tl AS (SELECT doc_id, CASE WHEN text = '' THEN 0 ELSE "
            "strlen(text) - strlen(replace(text, ' ', '')) + 1 END AS n_tokens "
            "FROM documents), "
            "r AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens) rn, "
            "count(*) OVER () n FROM tl), "
            "lo AS (SELECT n_tokens v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.25 * n) AS BIGINT), 1), n)), "
            "hi AS (SELECT n_tokens v FROM r WHERE rn = "
            "LEAST(GREATEST(CAST(CEIL(0.75 * n) AS BIGINT), 1), n)) "
            "SELECT doc_id, n_tokens FROM tl WHERE "
            "n_tokens >= (SELECT v FROM lo) AND n_tokens <= (SELECT v FROM hi)",
        )
    )
    assert got == want and len(got) > 0


def test_curation_filter_reasons(docs_ds):
    out = curation_filter(
        docs_ds, min_tokens=40, max_tokens=120, max_dup_ratio=0.5, max_top_frac=0.16
    ).take_all()
    assert len(out) == docs_ds.count()
    for r in out:
        assert r["keep"] == (r["len_ok"] and r["rep_ok"])
        assert r["len_ok"] == (40 <= r["n_tokens"] <= 120)
        assert r["rep_ok"] == (
            r["dup_token_ratio"] <= 0.5 and r["top_token_frac"] <= 0.16
        )
    kept = sum(1 for r in out if r["keep"])
    assert 0 < kept < len(out)


def test_regex_scrub_pii_rules(docs_ds):
    """Email/phone-shaped scrub rules on synthetic rows: sequential rule
    semantics, per-doc redaction counts, invalid patterns rejected."""
    import ray.data as rd

    from fever_ray.ops.curate import RegexScrub, regex_scrub

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.com and c.d@e.org today",
                    "call 555-123-4567 twice 555-000-1111",
                    "nothing sensitive",
                ]
            ),
        }
    )
    rules = [
        (r"[\w.]+@[\w.]+", "<email>"),
        (r"\d{3}-\d{3}-\d{4}", "<phone>"),
    ]
    out = sorted(
        regex_scrub(rd.from_arrow(t), rules).take_all(), key=lambda r: r["doc_id"]
    )
    assert out[0]["scrubbed"] == "mail <email> and <email> today"
    assert out[0]["n_redactions"] == 2
    assert out[1]["scrubbed"] == "call <phone> twice <phone>"
    assert out[1]["n_redactions"] == 2
    assert out[2]["scrubbed"] == "nothing sensitive"
    assert out[2]["n_redactions"] == 0

    with pytest.raises(Exception):
        RegexScrub([("([unclosed", "x")])
    with pytest.raises(ValueError):
        RegexScrub([])


def test_regex_scrub_rejects_bad_replacement():
    """Invalid rewrite patterns fail at construction, not per batch in the
    actor pool."""
    from fever_ray.ops.curate import RegexScrub

    with pytest.raises(Exception):
        RegexScrub([(r"(\d+)", r"\9")])


def test_stratified_sample_rates_and_invariance(docs_ds, sf_dir):
    from fever_ray.ops.curate import sample_threshold, stratified_sample

    fr = {"en": 0.10, "de": 0.80}
    out = stratified_sample(docs_ds, fr, default=0.35, seed=11).to_pandas()
    base = docs_ds.to_pandas()
    for lang, f in [("en", 0.10), ("de", 0.80), ("fr", 0.35)]:
        n_in = (base["lang"] == lang).sum()
        n_out = (out["lang"] == lang).sum()
        # Bernoulli(f) over n_in trials: 5-sigma band
        sd = max((n_in * f * (1 - f)) ** 0.5, 1.0)
        assert abs(n_out - n_in * f) <= 5 * sd, (lang, n_out, n_in)
    # membership is a pure function of (doc_id, seed): repartitioning the
    # input must select the identical id set
    out2 = stratified_sample(
        docs_ds.repartition(7), fr, default=0.35, seed=11
    ).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_stratified_sample_null_and_unknown_strata(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import stratified_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(2000), pa.int64()),
            "lang": pa.array(
                [None if i % 3 == 0 else ("xx" if i % 3 == 1 else "en") for i in range(2000)]
            ),
        }
    )
    ds = rd.from_arrow(t)
    # default=0 → null and unknown strata are dropped entirely
    kept = stratified_sample(ds, {"en": 1.0}, default=0.0, seed=3).to_pandas()
    assert set(kept["lang"]) == {"en"}
    assert len(kept) == sum(1 for i in range(2000) if i % 3 == 2)
    # default=1 → every row survives
    all_rows = stratified_sample(ds, {"en": 1.0}, default=1.0, seed=3).to_pandas()
    assert len(all_rows) == 2000


def test_normalize_text_nfc_and_whitespace(ray_session):
    import ray.data as rd
    import unicodedata

    from fever_ray.ops.curate import normalize_text

    dec = "e" + chr(0x301) + "cole"          # decomposed
    pre = chr(0xE9) + "cole"                 # precomposed NFC
    nbsp = chr(0xA0)
    vals = [
        dec + "  du\t\tweb ",                # composes + collapses
        pre + " du web",                     # already canonical: unchanged
        "  plain   ascii\n\ntext\t",
        "",
        None,
        nbsp + "x" + nbsp,                   # non-ASCII ws: NOT collapsed/trimmed
    ]
    t = pa.table({"text": pa.array(vals, pa.large_string())})
    out = normalize_text(rd.from_arrow(t)).take_all()
    got = [r["text_norm"] for r in out]
    assert got[0] == pre + " du web"
    assert got[0].encode().startswith(b"\xc3\xa9")   # composed bytes
    assert got[1] == pre + " du web"
    assert got[2] == "plain ascii text"
    assert got[3] == ""
    assert got[4] is None
    assert got[5] == nbsp + "x" + nbsp
    # canonical-equal inputs now hash identically (the dedup motivation)
    assert got[0] == got[1] == unicodedata.normalize("NFC", got[0])


def test_normalize_text_duckdb_mirror(ray_session):
    """trim/collapse/NFC parity with the oracle expression on messy rows."""
    import ray.data as rd

    from fever_ray.ops.curate import normalize_text

    vals = [
        "e" + chr(0x301) + "  head\t mid  tail ",
        " ascii  only ",
        chr(0xE9) + chr(0xA0) + " edge" + chr(0xA0),
    ]
    t = pa.table({"text": pa.array(vals, pa.large_string())})
    got = [r["text_norm"] for r in normalize_text(rd.from_arrow(t)).take_all()]
    con = duckdb.connect()
    for v, g in zip(vals, got):
        (want,) = con.execute(
            "SELECT trim(regexp_replace(nfc_normalize(?), '\\s+', ' ', 'g'), ' ')",
            [v],
        ).fetchone()
        assert g == want, (v.encode(), g.encode(), want.encode())


def test_grouped_order_statistic_exact(ray_session):
    """Exact per-group type-1 quantiles vs a numpy sort truth — negatives,
    heavy ties, nulls, NaNs, int and float columns, deep refinement forced
    (tiny collect_cap) and the k==n (max) edge."""
    import pandas as pd
    import ray.data as rd

    from fever_ray.ops.curate import grouped_order_statistic

    rng = np.random.default_rng(11)
    n = 20_000
    keys = rng.choice(["a", "b", "c"], size=n)
    ints = rng.integers(-(10**9), 10**9, size=n)
    ints[rng.random(n) < 0.3] = -7  # heavy tie mass, negative
    floats = np.round(rng.normal(0, 100, size=n), 2)
    floats[rng.random(n) < 0.01] = np.nan
    null_mask = rng.random(n) < 0.02
    t = pa.table(
        {
            "k": pa.array(keys),
            "vi": pa.array(
                [None if m else int(v) for m, v in zip(null_mask, ints)],
                pa.int64(),
            ),
            "vf": pa.array(floats, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    qs = [(1, 2), (9, 10), (1, 1)]
    cols = ["p50", "p90", "pmax"]

    for col in ("vi", "vf"):
        res = grouped_order_statistic(
            ds, "k", col, qs=qs, out_cols=cols,
            refine_bits=4, collect_cap=64, max_levels=16,
        )
        assert res.column("k").to_pylist() == ["a", "b", "c"]
        vals = t.column(col).to_numpy(zero_copy_only=False)
        for (num, den), cname in zip(qs, cols):
            got = dict(zip(res.column("k").to_pylist(),
                           res.column(cname).to_pylist()))
            for g in "abc":
                v = vals[keys == g]
                v = v[~pd.isna(v)]
                v = np.sort(v.astype(np.float64))
                v = v[~np.isnan(v)]
                kk = max(1, min((len(v) * num + den - 1) // den, len(v)))
                assert float(got[g]) == float(v[kk - 1]), (col, num, den, g)


def test_grouped_order_statistic_duckdb_mirror(ray_session, sf_dir):
    """The ROW_NUMBER rank-pick SQL used by the oracle is bit-identical to
    the walk's k-th smallest element on real table data."""
    import ray.data as rd

    from fever_ray.ops.curate import grouped_order_statistic

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    res = grouped_order_statistic(
        ds, "o_orderpriority", "o_totalprice",
        qs=[(1, 2), (9, 10)], out_cols=["p50", "p90"],
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM parquet_scan('{sf_dir}/orders.parquet')"
    )
    want = con.execute(
        "WITH r AS (SELECT o_orderpriority, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) rk, "
        "COUNT(*) OVER (PARTITION BY o_orderpriority) n FROM orders) "
        "SELECT o_orderpriority, "
        "MAX(CASE WHEN rk = (n + 1) // 2 THEN o_totalprice END), "
        "MAX(CASE WHEN rk = (n * 9 + 9) // 10 THEN o_totalprice END) "
        "FROM r GROUP BY 1 ORDER BY 1"
    ).fetchall()
    got = list(
        zip(
            res.column("o_orderpriority").to_pylist(),
            res.column("p50").to_pylist(),
            res.column("p90").to_pylist(),
        )
    )
    assert [tuple(r) for r in want] == got


def test_grouped_order_statistic_empty_and_validation(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import grouped_order_statistic

    t = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    res = grouped_order_statistic(rd.from_arrow(t), "k", "v")
    assert res.num_rows == 0 and res.column_names == ["k", "q1_2"]
    with pytest.raises(ValueError):
        grouped_order_statistic(rd.from_arrow(t), "k", "v", qs=[(0, 2)])
    with pytest.raises(ValueError):
        grouped_order_statistic(rd.from_arrow(t), "k", "v", qs=[(3, 2)])
    s = pa.table({"k": ["x"], "v": ["not numeric"]})
    with pytest.raises(TypeError):
        grouped_order_statistic(rd.from_arrow(s), "k", "v")


def _local_importance_keep(ids, weights, scale, seed):
    from fever_ray.sketches.hashing import hash64_ints

    h32 = (hash64_ints(np.asarray(ids, np.int64), seed=seed) >> np.uint64(32)).astype(
        np.int64
    )
    w = np.clip(np.asarray(weights, np.int64), 0, scale)
    return h32 * np.int64(scale) < (w << np.int64(32))


def test_importance_resample_exact_and_partition_invariant(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import importance_resample

    rng = np.random.default_rng(8)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(-5, 130, n)  # below 0, inside, and above scale=100
    t = pa.table({"doc_id": ids, "w": w})
    outs = []
    for parts in (1, 11):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            importance_resample(ds, "w", scale=100, seed=7)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])
    keep = _local_importance_keep(ids, w, 100, 7)
    np.testing.assert_array_equal(outs[0]["doc_id"].to_numpy(), ids[keep])
    # clamp contract: weight >= scale always kept, weight <= 0 always dropped
    got = set(outs[0]["doc_id"])
    assert all(i in got for i in ids[w >= 100])
    assert all(i not in got for i in ids[w <= 0])
    # keep rate tracks E[p] = mean(clamp(w)/scale) within a few percent
    expect = np.clip(w, 0, 100).sum() / (100 * n)
    assert abs(len(got) / n - expect) < 0.03


def test_importance_resample_rejects_bad_inputs(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import importance_resample

    t = pa.table({"doc_id": [1, 2], "w": pa.array([0.5, 1.0])})
    with pytest.raises(Exception, match="integer"):
        importance_resample(rd.from_arrow(t), "w", scale=10).materialize()
    t2 = pa.table({"doc_id": [1, 2], "w": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="null"):
        importance_resample(rd.from_arrow(t2), "w", scale=10).materialize()
    with pytest.raises(ValueError, match="scale"):
        importance_resample(rd.from_arrow(t2), "w", scale=0)
    with pytest.raises(ValueError, match="scale"):
        importance_resample(rd.from_arrow(t2), "w", scale=1 << 31)


def test_priority_sample_determinism_and_weighting(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import priority_sample
    from fever_ray.sketches.hashing import hash64_ints

    n = 5000
    ids = np.arange(n, dtype=np.int64)
    # two weight classes: 10x heavier rows in the top half
    w = np.where(ids < n // 2, 10, 100).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})

    k = 400
    outs = []
    for parts in (1, 8):
        rows = priority_sample(
            rd.from_arrow(t).repartition(parts), k=k, weight_col="w", seed=3
        ).take_all()
        outs.append(sorted((r["doc_id"], r["weight"], r["priority"]) for r in rows))
    assert outs[0] == outs[1] and len(outs[0]) == k  # layout-invariant

    # brute-force reference: q = (w << 32) // (1 + low32(hash))
    u = (hash64_ints(ids, seed=3) & np.uint64(0xFFFFFFFF)).astype(np.int64) + 1
    q = (w << np.int64(32)) // u
    order = np.lexsort((ids, -q))[:k]
    want = sorted(
        (int(ids[i]), int(w[i]), int(q[i])) for i in order
    )
    assert outs[0] == want

    # weight-proportional: heavy rows (~91% of mass) dominate the sample
    heavy = sum(1 for _, wt, _ in outs[0] if wt == 100)
    assert heavy > 0.75 * k

    # DLT inclusion-probability estimator: q = (w << 32) // u IS w/u'
    # in weight units (u' = u/2^32); with tau = the (k+1)-th priority,
    # sum(max(w, tau)) over the k kept rows is unbiased for total weight
    tau = float(np.sort(q)[::-1][k])
    est = sum(max(float(wt), tau) for _, wt, _ in outs[0])
    assert abs(est - w.sum()) / w.sum() < 0.15

    with pytest.raises(ValueError, match="k must be"):
        priority_sample(rd.from_arrow(t), k=0, weight_col="w")
    bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "w": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="weights must be"):
        priority_sample(rd.from_arrow(bad), k=1, weight_col="w").take_all()
    badf = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "w": pa.array([1.0], pa.float64())})
    with pytest.raises(Exception, match="integer-typed"):
        priority_sample(rd.from_arrow(badf), k=1, weight_col="w").take_all()


# -------------------------------------------------------------- gopher_rules


def test_gopher_rules_each_bit(ray_session):
    """One crafted doc per rule: exactly that bit set (plus whatever the
    doc structurally also violates), kept only when mask == 0."""
    import ray.data as rd

    from fever_ray.ops.curate import gopher_rules

    stop = ("the", "of")
    good = "the quick brown foxes of doom " * 10  # 60 words, alpha, stops
    docs = {
        0: good.strip(),                                # clean → kept
        1: "the of " + "word " * 3,                     # 5+... words → bit0
        2: "the of " + "a " * 58,                       # mean len < 3 → bit1
        3: ("the of " + "ok " * 48).strip() + " " + "#" * 1 + " " + "... ... ... ... ... ...",
        4: "- " + good.strip().replace(" ", "\n- "),    # all bullet lines → bit3
        5: good.strip().replace(" ", "...\n") + "...",  # all lines end ... → bit4
        6: "the of " + "123 456 " * 25,                 # digits → bit5
        7: "quick brown foxes jump high " * 10,         # no stopwords → bit6
    }
    t = pa.table(
        {
            "doc_id": pa.array(sorted(docs), pa.int64()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
        }
    )
    out = (
        gopher_rules(
            rd.from_arrow(t),
            min_words=50,
            max_words=100,
            mwl_lo=3,
            mwl_hi=10,
            stopwords=stop,
            min_stop_hits=2,
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert int(out.loc[0, "rule_mask"]) == 0 and int(out.loc[0, "kept"]) == 1
    assert int(out.loc[1, "rule_mask"]) & 1
    assert int(out.loc[2, "rule_mask"]) & 2
    assert int(out.loc[3, "rule_mask"]) & 4
    assert int(out.loc[4, "rule_mask"]) & 8
    assert int(out.loc[5, "rule_mask"]) & 16
    assert int(out.loc[6, "rule_mask"]) & 32
    assert int(out.loc[7, "rule_mask"]) == 64
    assert (out.loc[out.rule_mask != 0, "kept"] == 0).all()


def test_gopher_rules_null_and_empty(ray_session):
    import ray.data as rd

    from fever_ray.ops.curate import gopher_rules

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "lang": pa.array(["en", "en"], pa.string()),
            "text": pa.array([None, ""], pa.string()),
        }
    )
    out = gopher_rules(rd.from_arrow(t)).to_pandas()
    # null behaves exactly as '' (one empty token): same mask for both
    assert out.rule_mask.nunique() == 1
    assert (out.kept == 0).all() and (out.n_words == 1).all()


def test_rule_violation_samples_topk_per_bit(ray_session):
    """k-smallest ids per fired bit: a bit with more violators than k
    truncates at k (ascending ids, rn 1..k), a bit with fewer emits them
    all, a never-fired bit emits nothing — across multiple blocks so the
    partial-prune + final combine path is exercised."""
    import ray.data as rd

    from fever_ray.ops.curate import rule_violation_samples

    stop = ("the", "of")
    good = ("the quick brown foxes of doom " * 10).strip()  # clean
    short = "the of word"                                   # bit0 only
    nostop = "quick brown foxes jump high " * 10            # bit6 only
    rows = []
    # ids 0..7: short docs (bit0 violators, 8 > k)
    for i in range(8):
        rows.append((i, short))
    # ids 100..101: stopword-free docs (bit6, 2 < k)
    rows.append((100, nostop.strip()))
    rows.append((101, nostop.strip()))
    # ids 200..203: clean
    for i in range(200, 204):
        rows.append((i, good))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = (
        rule_violation_samples(
            rd.from_arrow(t).repartition(4),
            k=3,
            min_words=50,
            max_words=100,
            mwl_lo=3,
            mwl_hi=10,
            stopwords=stop,
            min_stop_hits=2,
        )
        .to_pandas()
        .sort_values(["rule_bit", "rn"])
        .reset_index(drop=True)
    )
    b0 = out[out.rule_bit == 0]
    assert list(b0.doc_id) == [0, 1, 2] and list(b0.rn) == [1, 2, 3]
    b6 = out[out.rule_bit == 6]
    assert list(b6.doc_id) == [100, 101] and list(b6.rn) == [1, 2]
    # the short docs also fire the stopword bit? no — they contain both
    # stops; bits 1-5 never fire on this fixture
    assert set(out.rule_bit) <= {0, 6}
