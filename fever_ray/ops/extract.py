"""Pinned HTML→text extractor (v1) and vectorized URL decomposition.

The north rule requires a *byte-identical* extracted text per url versus the
pinned reference extractor — so this module IS the reference extractor: a
pure function of the html bytes, versioned, with an exact specification.
Any change to the transform chain below is a new EXTRACTOR_VERSION.

Everything is vectorized with pyarrow.compute (RE2 regexes run in C over the
whole column); only rows containing '%' escapes take a scalar fallback path
in URL decoding.

URL semantics mirror what the reference does to HTTP fields
(/root/reference/processing/bloom_handler.go:184-199): synthesize a full URL
("http://" + host + url unless the url field already contains "://"), parse
it, and derive host+path / path candidate strings, where the path excludes
query and fragment (Go net/url ``URL.Path`` semantics, including percent-
decoding).
"""

from __future__ import annotations

from urllib.parse import unquote

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXTRACTOR_VERSION = "v1"

# tags whose close (or self-close) becomes a newline; all other tags vanish
_BLOCK_CLOSE_RE = r"(?i)</(?:p|h1|h2|h3|h4|h5|h6|li|title|div|tr|blockquote|pre)>|<br[ ]*/?>"
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]*>"
# horizontal whitespace runs around newlines collapse into one newline;
# remaining newline runs collapse; result is stripped.
_NL_COLLAPSE_RE = r"[ \t\r\f\v]*\n[ \t\r\f\v\n]*"


def extract_text(
    html: pa.Array | pa.ChunkedArray, target_chunk_bytes: int | None = None
) -> pa.Array:
    """Pinned extractor v1: html (binary/string) → text (string).

    Specification (applied in exactly this order):
      1. decode as UTF-8 (invalid bytes are not expected from the generator;
         arbitrary inputs should be sanitized upstream)
      2. drop <script>...</script>, <style>...</style>, <!-- comments -->
      3. closing block tags (p, h1-h6, li, title, div, tr, blockquote, pre)
         and <br> become '\n'
      4. every remaining tag is removed
      5. HTML entities &lt; &gt; &quot; &#39; then &amp; are decoded
      6. whitespace around newlines collapses to a single '\n'; leading and
         trailing whitespace is stripped

    Implementation detail (NOT part of the spec — per-row results are
    unchanged): with ``target_chunk_bytes`` set, the 12-kernel chain runs
    over column slices of that size so intermediates stay cache-resident
    instead of streaming DRAM 12× per pass.  Measured ~14% faster
    single-threaded at 1 MB slices but a wash under multi-core contention
    on this box, so the default stays monolithic; the knob exists for
    hosts where the cache-residency win survives parallelism.
    """
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    n = len(html)
    if target_chunk_bytes and n and html.nbytes > 2 * target_chunk_bytes:
        n_chunks = max(1, html.nbytes // target_chunk_bytes)
        step = max(1, n // int(n_chunks))
        outs = [
            _extract_text_one(html.slice(s0, min(step, n - s0)))
            for s0 in range(0, n, step)
        ]
        return pa.concat_arrays(outs) if len(outs) > 1 else outs[0]
    return _extract_text_one(html)


def _extract_text_one(html: pa.Array) -> pa.Array:
    s = html
    if pa.types.is_binary(s.type) or pa.types.is_large_binary(s.type):
        s = s.cast(pa.large_string())
    elif pa.types.is_string(s.type):
        s = s.cast(pa.large_string())
    s = pc.replace_substring_regex(s, pattern=_SCRIPT_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_STYLE_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_COMMENT_RE, replacement="")
    s = pc.replace_substring_regex(s, pattern=_BLOCK_CLOSE_RE, replacement="\n")
    s = pc.replace_substring_regex(s, pattern=_TAG_RE, replacement="")
    # entity decode: every entity starts with '&', so one allocation-free
    # scan gates all five replace passes (each otherwise copies the whole
    # column — 10 GB of memory traffic per GB of html skipped when absent);
    # byte-identical with the unconditional chain by construction
    if pc.any(pc.match_substring(s, "&")).as_py():
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
            s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=_NL_COLLAPSE_RE, replacement="\n")
    s = pc.utf8_trim_whitespace(s)
    return s.cast(pa.large_string())


_URL_PARTS_RE = r"^(?P<scheme>[^:/?#]+)://(?P<host>[^/?#]*)(?P<path>[^?#]*)"


def synthesize_full_url(host, url) -> pa.Array:
    """fever bloom_handler.go:184-189: use the url field as-is when it already
    contains '://', else 'http://' + host + url."""
    host = _as_str_array(host)
    url = _as_str_array(url)
    has_scheme = pc.match_substring(url, "://")
    prefix = pa.array(np.full(len(host), "http://"), type=pa.string())
    concat = pc.binary_join_element_wise(prefix, host, url, "")
    return pc.if_else(has_scheme, url, concat)


def split_url(full_url) -> dict[str, pa.Array]:
    """Decompose full URLs into host (authority, incl. port) and path
    (percent-decoded, query/fragment stripped) — Go net/url.Parse parity for
    the pieces fever uses.  Returns dict of arrays; unparseable rows → null.
    """
    full_url = _as_str_array(full_url)
    parts = pc.extract_regex(full_url, pattern=_URL_PARTS_RE)
    host = pc.struct_field(parts, "host")
    path = pc.struct_field(parts, "path")
    # percent-decode path only where needed (scalar fallback, rare)
    has_pct = pc.fill_null(pc.match_substring(path, "%"), False)
    if pc.any(has_pct).as_py():
        idx = np.nonzero(has_pct.to_numpy(zero_copy_only=False))[0]
        py = path.to_pylist()
        for i in idx:
            if py[i] is not None:
                py[i] = unquote(py[i])
        path = pa.array(py, type=pa.string())
    return {"host": host, "path": path}


def hostname_of(url) -> pa.Array:
    """Registered hostname (authority without port) of a URL column."""
    url = _as_str_array(url)
    parts = pc.extract_regex(url, pattern=_URL_PARTS_RE)
    host = pc.struct_field(parts, "host")
    # strip :port
    return pc.replace_substring_regex(host, pattern=r":[0-9]+$", replacement="")


def _as_str_array(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(arr, type=pa.string())
    if pa.types.is_large_string(arr.type):
        return arr.cast(pa.string())
    return arr
