"""Pinned extractor v1 spec tests + generator invariant + URL decomposition."""

import pyarrow as pa
import pyarrow.compute as pc

from fever_ray.gen.pages import build_html, generate_pages
from fever_ray.ops.extract import (
    extract_text,
    hostname_of,
    split_url,
    synthesize_full_url,
)


def _x(html: str) -> str:
    return extract_text(pa.array([html.encode()], type=pa.binary()))[0].as_py()


def test_basic_template():
    html = build_html("my title", ["para one", "para two"]).decode()
    assert _x(html) == "my title\npara one\npara two"


def test_script_style_comment_dropped():
    assert _x("<p>keep</p><script>drop();</script><style>p{}</style><!-- no -->") == "keep"
    assert _x("<script a=b>\nmulti\nline\n</script><p>x</p>") == "x"


def test_block_tags_become_newlines_inline_tags_vanish():
    assert _x("<h1>head</h1><p>a <b>bold</b> word</p>") == "head\na bold word"
    assert _x("line1<br/>line2<br>line3") == "line1\nline2\nline3"


def test_entities_decoded_in_pinned_order():
    assert _x("<p>a &lt;tag&gt; &amp; &quot;quote&quot; &#39;s</p>") == "a <tag> & \"quote\" 's"


def test_whitespace_collapse_and_strip():
    assert _x("  <p>  a  </p>\n\n<p>b</p>  ") == "a\nb"
    assert _x("") == ""


def test_null_and_string_inputs():
    out = extract_text(pa.array(["<p>x</p>", None], type=pa.string()))
    assert out[0].as_py() == "x"
    assert out[1].as_py() is None


def test_generator_invariant_full_table():
    t = generate_pages(300, seed=7)
    ext = extract_text(t.column("html"))
    assert ext.to_pylist() == t.column("text").to_pylist()
    # bytes-identical, not just str-equal
    a = ext.cast(pa.large_binary()).to_pylist()
    b = t.column("text").cast(pa.large_binary()).to_pylist()
    assert a == b


def test_generator_determinism():
    t1 = generate_pages(100, seed=99)
    t2 = generate_pages(100, seed=99)
    assert t1.equals(t2)


def test_synthesize_full_url():
    host = ["foo.bar.de", "foo.bar.de"]
    url = ["/path", "http://other.de/x"]
    out = synthesize_full_url(host, url).to_pylist()
    assert out == ["http://foo.bar.de/path", "http://other.de/x"]


def test_split_url_go_parity():
    full = [
        "http://foo.bar.de/oddlyspecific",
        "http://foo.bar.de:123/baz?q=1#frag",
        "http://host.de",
        "http://host.de/a%20b",
        "not-a-url",
    ]
    parts = split_url(full)
    assert parts["host"].to_pylist() == [
        "foo.bar.de",
        "foo.bar.de:123",
        "host.de",
        "host.de",
        None,
    ]
    assert parts["path"].to_pylist() == [
        "/oddlyspecific",
        "/baz",
        "",
        "/a b",  # percent-decoded like Go url.Parse
        None,
    ]


def test_hostname_of_strips_port_and_scheme():
    out = hostname_of(["https://a.b.c:8443/x?y=1", "http://plain.org/"]).to_pylist()
    assert out == ["a.b.c", "plain.org"]


def test_generate_pages_vocab_mode_opt_in_only():
    """vocab_size>0 (the realistic-vocabulary SNM regime) keeps the pinned
    extractor invariant and is deterministic; the DEFAULT output stream is
    untouched (every cache/fixture depends on those exact draws)."""
    import numpy as np

    from fever_ray.gen.pages import generate_pages
    from fever_ray.ops.extract import extract_text

    a = generate_pages(300, seed=11, vocab_size=50_000)
    b = generate_pages(300, seed=11, vocab_size=50_000)
    assert a.equals(b)
    # many distinct tokens (the point of the mode) vs the 60-word default
    toks = set()
    for t in a.column("text").to_pylist():
        toks.update(t.split())
    assert len(toks) > 2000
    # pinned-extractor invariant holds in the new mode too
    ex = extract_text(a.column("html")).cast(a.column("text").type)
    assert ex.to_pylist() == a.column("text").to_pylist()
    # default mode: byte-identical with and without the new argument
    assert generate_pages(300, seed=11).equals(
        generate_pages(300, seed=11, vocab_size=0)
    )
