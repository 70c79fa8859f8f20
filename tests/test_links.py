"""Link extraction + host link graph (ops.links)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops import links as L


def _docs(ids, texts=None, sources=None):
    n = len(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts or ["t"] * n, pa.string()),
            "source": pa.array(sources or ["src0"] * n, pa.string()),
        }
    )


def test_extract_hrefs_matches_re_findall_property():
    """Engine extraction == re.findall('href=\"([^\"]*)\"') on adversarial
    strings, including restart-inside-capture soup the split fast path
    must repair (unclosed candidate followed by another href=)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rx = re.compile(r'href="([^"]*)"')
    alphabet = st.sampled_from(['href="', '"', "a", "<a ", "=", " ", "hre"])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.lists(alphabet, max_size=12).map("".join), max_size=6))
    def run(docs):
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "html": pa.array(docs, pa.string()),
            }
        )
        out = L.extract_hrefs_batch(t)
        got = list(
            zip(out.column("doc_id").to_pylist(), out.column("href").to_pylist())
        )
        want = [(i, m) for i, d in enumerate(docs) for m in rx.findall(d)]
        assert got == want

    run()


def test_extract_hrefs_restart_inside_capture():
    """The documented split-vs-regex divergence case is repaired."""
    cases = {
        'href="ahref="b"': ["ahref="],
        'href="ahref="b" href="c"': ["ahref=", "c"],
        'href="x" href="nope': ["x"],
        'href="': [],
    }
    for s, want in cases.items():
        t = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "html": pa.array([s], pa.string())}
        )
        assert L.extract_hrefs_batch(t).column("href").to_pylist() == want, s


def test_extract_hrefs_regexp_semantics():
    """Matches regexp_extract_all('href=\"([^\"]*)\"'): left-to-right,
    closing quote required, empty href kept, in-text matches count."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "html": pa.array(
                [
                    '<a href="https://a.test/x">1</a><a href="/rel">2</a>',
                    "no links at all",
                    '<a href="">empty</a> then broken <a href="oops',
                    'text href="https://in-text.test/p" raw',
                ],
                pa.string(),
            ),
        }
    )
    out = L.extract_hrefs_batch(t)
    assert out.column("doc_id").to_pylist() == [1, 1, 3, 4]
    assert out.column("href").to_pylist() == [
        "https://a.test/x",
        "/rel",
        "",
        "https://in-text.test/p",
    ]


def test_extract_hrefs_null_and_binary_html():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array(
                [b'<a href="https://x/y">z</a>', None], pa.large_binary()
            ),
        }
    )
    out = L.extract_hrefs_batch(t)
    assert out.column("doc_id").to_pylist() == [1]
    assert out.column("href").to_pylist() == ["https://x/y"]


def test_host_of_absolute_relative_other():
    href = pa.array(
        ["https://h9.example.org/p/1.html", "/local/3.html", "ftp1://x", "garbage", ""],
        pa.string(),
    )
    base = pa.array(["base.example"] * 5, pa.string())
    assert L.host_of(href, base).to_pylist() == [
        "h9.example.org",
        "base.example",
        "",  # scheme must be [a-z]+ only — digits don't match, like the oracle
        "",
        "",
    ]


def test_host_of_matches_regex_mirror_property():
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    rx = re.compile(r"^[a-z]+://([^/]+)")
    alphabet = st.sampled_from(["https://", "h", "/", ":", ".", "x", "9", "ftp"])

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.lists(alphabet, max_size=8).map("".join), max_size=8))
    def run(hrefs):
        got = L.host_of(
            pa.array(hrefs, pa.string()), pa.array(["B"] * len(hrefs), pa.string())
        ).to_pylist()
        want = []
        for h in hrefs:
            if h.startswith("/"):
                want.append("B")
            else:
                m = rx.match(h)
                want.append(m.group(1) if m else "")
        assert got == want

    run()


def test_linked_pages_derivation_planted_shapes():
    pages = L.docs_to_linked_pages_batch(_docs([0, 1, 2, 3, 5]))
    htmls = pages.column("html").to_pylist()
    assert 'href="/local/0.html"' in htmls[0] and "example.org" not in htmls[0]
    assert htmls[1].count("href=") == 1  # 1 % 3 == 1 absolute anchor
    assert htmls[2].count("href=") == 2
    assert "href=" not in htmls[3]  # 3 % 3 == 0 and 3 % 5 != 0 → zero links
    assert htmls[4].count("href=") == 3  # 5: two absolute + relative


def test_host_link_graph_exact_vs_brute(ray_session):
    import ray.data as rd

    docs = _docs(list(range(60)), sources=[f"src{i % 4}" for i in range(60)])
    ds = rd.from_arrow(docs).repartition(7)
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in L.host_link_graph(ds).take_all()
    }
    # brute force from the single-batch kernels
    pages = L.docs_to_linked_pages_batch(docs)
    links = L.extract_hrefs_batch(pages, keep=("doc_id",))
    ids = links.column("doc_id").to_numpy(zero_copy_only=False)
    src = [f"src{int(i) % 4}.example.com" for i in ids]
    dst = L.host_of(links.column("href"), pa.array(src, pa.string())).to_pylist()
    exact: dict = {}
    for s, d in zip(src, dst):
        exact[(s, d)] = exact.get((s, d), 0) + 1
    assert got == exact
    assert sum(got.values()) == links.num_rows


def test_gen_linked_pages_anchor_contract():
    """gen --links-per-page plants only intra-corpus anchors with empty
    inner text (pinned-extractor invariant asserted inside the generator),
    and i % (k+1) anchors per page exactly."""
    from fever_ray.gen.pages import generate_pages

    t = generate_pages(300, seed=5, links_per_page=3, dup_frac=0.0)
    out = L.extract_hrefs_batch(t, keep=("url",))
    assert out.num_rows == sum(i % 4 for i in range(300))
    corpus_urls = set(t.column("url").to_pylist())
    assert set(out.column("href").to_pylist()) <= corpus_urls
    # default output (no flag) has zero hrefs
    t0 = generate_pages(300, seed=5, dup_frac=0.0)
    assert L.extract_hrefs_batch(t0, keep=("url",)).num_rows == 0


def test_reciprocal_hosts_kernel(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "src_host": ["a", "b", "a", "c", "b", "d"],
            "dst_host": ["b", "a", "c", "a", "b", "a"],
            "n_links": pa.array([3, 2, 5, 7, 1, 9], pa.int64()),
        }
    )
    out = L.reciprocal_hosts(rd.from_arrow(t)).take_all()
    got = {(r["host_a"], r["host_b"]): (r["n_ab"], r["n_ba"]) for r in out}
    # (a,b) both ways, (a,c) both ways; b self-loop dropped; d→a one-way
    assert got == {("a", "b"): (3, 2), ("a", "c"): (5, 7)}
    # empty edge table → typed empty output, schema preserved
    empty = L.reciprocal_hosts(
        rd.from_arrow(t.slice(0, 0))
    )
    et = empty.take_all()
    assert et == []


def test_extract_links_partition_invariance(ray_session):
    import ray.data as rd

    docs = _docs(list(range(100)))
    a = L.extract_links(rd.from_arrow(docs).repartition(1)).take_all()
    b = L.extract_links(rd.from_arrow(docs).repartition(13)).take_all()
    key = lambda r: (r["doc_id"], r["href"])  # noqa: E731
    assert sorted(map(key, a)) == sorted(map(key, b))
