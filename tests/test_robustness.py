"""Null/degenerate-input robustness (FIXTURES.md F5, modeled on the
reference's null-heavy parser fixtures util/testdata/jsonparse_eve_nulls.json)
+ matcher-path equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.core.udaf import SketchSpec, build_sketches
from fever_ray.ops.extract import extract_text, hostname_of
from fever_ray.ops.ioc import IocMatcher, PageIocMatcher, make_page_ioc_fn
from fever_ray.gen.pages import PAGES_SCHEMA
from fever_ray.sketches.bloom import BloomFilter


def dirty_pages_table() -> pa.Table:
    """Nulls, empties, dup urls with differing ts, zero-length url."""
    rows = [
        {"url": "https://a.com/x", "warc_ts": 1, "html": b"<p>ok</p>", "text": "ok", "lang": "en"},
        {"url": "https://a.com/x", "warc_ts": 2, "html": b"<p>ok</p>", "text": "ok", "lang": "en"},
        {"url": "", "warc_ts": 3, "html": b"", "text": "", "lang": "de"},
        {"url": None, "warc_ts": None, "html": None, "text": None, "lang": None},
        {"url": "https://b.com/", "warc_ts": 4, "html": b"<html></html>", "text": "", "lang": None},
    ]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def test_sketch_build_skips_nulls(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(dirty_pages_table())
    specs = [
        SketchSpec("hll", "hll", "url", {"p": 10}),
        SketchSpec("cms", "cms", "lang", {"width": 256, "depth": 4}, track=True),
        SketchSpec("bloom", "bloom", "url", {"n": 100, "p": 1e-4}),
    ]
    sk = build_sketches(ds, specs, batch_size=2)
    # nulls skipped: 4 non-null urls (3 distinct incl. ""), 3 non-null langs
    assert sk["bloom"].N == 4
    assert sk["cms"].total == 3
    assert set(sk["cms"].candidates) == {"en", "de"}
    est = sk["hll"].estimate()
    assert 2 <= est <= 4.5


def test_extract_and_hostname_handle_degenerate_rows():
    t = dirty_pages_table()
    out = extract_text(t.column("html"))
    assert out.to_pylist() == ["ok", "ok", "", None, ""]
    hosts = hostname_of(t.column("url"))
    assert hosts.to_pylist() == ["a.com", "a.com", None, None, "b.com"]


def test_ioc_matcher_on_dirty_batch():
    bf = BloomFilter.initialize(1000, 1e-5)
    bf.add(["a.com"])
    m = PageIocMatcher(bf.to_bytes())
    out = m(dirty_pages_table())
    # both dup rows alert on hostname a.com; null/empty rows never alert
    assert out.num_rows == 2
    assert set(out.column("ioc").to_pylist()) == {"a.com"}


def test_empty_batch_everywhere():
    empty = dirty_pages_table().slice(0, 0)
    bf = BloomFilter.initialize(100, 1e-4)
    m = PageIocMatcher(bf.to_bytes())
    assert m(empty).num_rows == 0
    assert len(extract_text(empty.column("html"))) == 0


def test_stateless_fn_equals_actor_path(ray_session, pages_dir):
    import ray.data as rd

    bf = BloomFilter.initialize(100000, 1e-7)
    bf.add(["evil0.example.com", "/oddlyspecific/implant.html"])
    actor_out = (
        rd.read_parquet(pages_dir + "/", columns=["url"])
        .map_batches(
            PageIocMatcher,
            fn_constructor_kwargs={"bloom_bytes": bf.to_bytes()},
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    fn = make_page_ioc_fn(bf.to_bytes())
    fn_out = (
        rd.read_parquet(pages_dir + "/", columns=["url"])
        .map_batches(fn, batch_format="pyarrow")
        .take_all()
    )
    key = lambda r: (r["url"], r["ioc"], r["match_type"], r["signature"])  # noqa: E731
    assert sorted(map(key, actor_out)) == sorted(map(key, fn_out))
    assert len(fn_out) > 0


def test_tls_dns_null_fields():
    bf = BloomFilter.initialize(1000, 1e-5)
    bf.add(["evil.sni"])
    m = IocMatcher(bf.to_bytes())
    batch = pa.table(
        {
            "event_type": ["tls", "tls", "dns"],
            "tls_sni": ["evil.sni", None, None],
            "tls_fingerprint": [None, None, None],
            "dns_rrname": [None, None, None],
            "dns_type": [None, None, "query"],
        }
    )
    out = m(batch)
    assert out.num_rows == 1
    assert out.column("ioc")[0].as_py() == "evil.sni"


def test_cli_yaml_sets_nonfalsy_default_flags(tmp_path, monkeypatch):
    """Config cascade: flags > YAML > defaults — including flags whose
    argparse default is non-falsy (batch_size etc.), which the old merge
    could never set from YAML."""
    import json as _json

    from fever_ray import cli as cli_mod

    cfg = tmp_path / "cfg.json"
    cfg.write_text(_json.dumps({"batch-size": 1234, "limit": 7}))
    captured = {}

    def fake_ioc(args):
        captured["batch"] = getattr(args, "batch_size", None)
        captured["limit"] = args.limit
        return 0

    monkeypatch.setattr(cli_mod, "cmd_ioc", fake_ioc)
    # re-build parser wiring around the patched handler
    rc = cli_mod.main(
        ["--config", str(cfg), "ioc", "--input", "x", "--bloom-file", "y", "--limit", "9"]
    )
    assert rc == 0
    assert captured["limit"] == 9  # explicit flag wins over YAML
    rc = cli_mod.main(["--config", str(cfg), "ioc", "--input", "x", "--bloom-file", "y"])
    assert rc == 0
    assert captured["limit"] == 7  # YAML beats the non-falsy argparse default


def test_flagship_on_narrowed_page_table(ray_session, tmp_path):
    """run_flagship over a curate-style narrowed table (url+text only) runs
    the sketches its columns support instead of crashing on the full-schema
    read; extract=True still demands html loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from fever_ray.pipelines.flagship import run_flagship

    t = pa.table(
        {
            "url": [f"https://h{i % 5}.com/p{i}" for i in range(200)],
            "text": [f"some text body number {i}" for i in range(200)],
        }
    )
    d = tmp_path / "narrow"
    d.mkdir()
    pq.write_table(t, d / "part-0.parquet")
    res = run_flagship(str(d), batch_size=64)
    names = set(res["summary"].column("sketch").to_pylist())
    assert "hll_urls" in names and "kll_text_len" in names
    assert "kll_warc_ts" not in names and "tdigest_html_len" not in names
    with _pytest.raises(ValueError, match="html"):
        run_flagship(str(d), batch_size=64, extract=True)


def test_specs_for_input_edge_shapes(ray_session, tmp_path):
    """Empty landing dir -> full suite assumed (follow keeps polling);
    glob inputs accepted; non-page tables rejected loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from fever_ray.pipelines.flagship import STANDARD_SPECS, specs_for_input

    empty = tmp_path / "landing"
    empty.mkdir()
    specs, src = specs_for_input(str(empty))
    assert [s.name for s in specs] == [s.name for s in STANDARD_SPECS]
    assert src is None

    d = tmp_path / "shards"
    d.mkdir()
    pq.write_table(
        pa.table({"url": ["https://a.com/x"], "text": ["hi"]}),
        d / "part-0.parquet",
    )
    specs_g, src_g = specs_for_input(str(d / "part-*.parquet"))
    assert src_g == {"url", "text"}
    assert any(s.name == "hll_urls" for s in specs_g)

    wrong = tmp_path / "clusters"
    wrong.mkdir()
    pq.write_table(
        pa.table({"doc_id": [1], "cluster_id": [1]}), wrong / "c.parquet"
    )
    with _pytest.raises(ValueError, match="wrong input"):
        specs_for_input(str(wrong))


def test_new_ops_on_degenerate_documents(ray_session):
    """Fifth-session ops on null/empty/dup-heavy inputs: no crashes,
    sane contracts (FIXTURES.md F5 posture)."""
    import ray.data as rd

    from fever_ray.ops.bpe import bpe_token_counts, bpe_train
    from fever_ray.ops.dedup import minhash_cross_dedup
    from fever_ray.ops.mlscore import linear_score

    rows = [
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": "a"},
        {"doc_id": 3, "text": "a a a a a a a a"},
        {"doc_id": 4, "text": "   "},
        {"doc_id": 5, "text": "same words here"},
        {"doc_id": 6, "text": "same words here"},
    ]
    docs = rd.from_items(rows)

    scores = {r["doc_id"]: r for r in linear_score(docs).take_all()}
    assert len(scores) == 7
    assert scores[0]["score"] == 0 and scores[1]["score"] == 0
    assert scores[5]["score"] == scores[6]["score"]

    merges = bpe_train(docs, num_merges=8)
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(docs, merges).take_all()}
    assert counts[0] == 0 and counts[1] == 0
    assert counts[5] == counts[6] > 0

    # cross-dedup where the reference is the dup text: 5 and 6 drop, the
    # degenerate rows survive (nothing shingleable matches)
    ref = rd.from_items([{"doc_id": 0, "text": "same words here"}])
    kept = {r["doc_id"] for r in minhash_cross_dedup(
        docs, ref, threshold=0.5, n_shingle=2).take_all()}
    assert 5 not in kept and 6 not in kept
    assert {0, 1, 2, 3, 4} <= kept


def test_semdedup_family_on_degenerate_vectors(ray_session):
    import ray.data as rd

    from fever_ray.ops.cluster import knn_graph, semdedup

    # all-identical vectors: one cluster, everything but the smallest id
    # dropped; knn_graph still emits each row's neighbors
    t = pa.table(
        {
            "vec_id": pa.array([3, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0]] * 3, pa.list_(pa.float32())
            ),
        }
    )
    out = {r["vec_id"]: r["kept"]
           for r in semdedup(rd.from_arrow(t), k=2, threshold=0.99).take_all()}
    assert out == {1: True, 2: False, 3: False}
    g = knn_graph(rd.from_arrow(t), n_neighbors=2, k_clusters=2).take_all()
    assert len(g) == 6  # 3 rows x 2 neighbors

    # zero vectors: _normalize guards divide-by-zero; cosine 0 pairs keep
    z = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[0.0, 0.0], [0.0, 0.0]], pa.list_(pa.float32())),
        }
    )
    outz = {r["vec_id"]: r["kept"]
            for r in semdedup(rd.from_arrow(z), k=1, threshold=0.5).take_all()}
    assert outz[0] is True
