"""HTML link extraction and the host-level link graph.

The reference extracts structured fields out of raw event payloads (the
26-key EVE projection, /root/reference/util/json.go) and aggregates them by
host; the webtext analog is pulling ``<a href>`` targets out of raw page
html and rolling them up into a host→host link graph — the substrate for
crawl-frontier scheduling, link-spam audits, and PageRank over sites.

Everything here is Arrow-kernel vectorized (split_pattern / list_flatten /
extract_regex) — no per-row Python in any hot path:

* ``extract_hrefs_batch``: html → exploded (id, href) rows.  Semantics are
  exactly the non-overlapping left-to-right matches of ``href="([^"]*)"``
  (the DuckDB ``regexp_extract_all`` oracle): split on the literal
  ``href="``, keep each candidate's prefix before the next ``"``, drop
  candidates with no closing quote.
* ``host_of``: absolute links parse the authority out of ``scheme://host/``
  (RE2 ``^[a-z]+://([^/]+)``); root-relative links (``/path``) resolve to
  the base host; anything else yields ``""`` (mirrors DuckDB's
  ``regexp_extract`` empty-string-on-no-match).
* ``host_link_graph``: (src_host, dst_host, n_links) through the bounded
  coalesce-tree — the host domain is bounded (sites, not pages), so no
  sort shuffle; at 10^12 pages the exploded link rows stream through
  stateless tasks and only KB-sized per-host partials move.

For oracle parity the linked-page derivation (``docs_to_linked_pages``)
plants anchors deterministically from doc_id arithmetic (SQL-mirrorable,
like io_.docpages): doc_id % 3 absolute anchors to
``https://h{t%23}.example.org/p/{t}.html`` with t = (doc_id·31 + 17·k) %
9973, plus one root-relative ``/local/{doc_id}.html`` anchor when
doc_id % 5 == 0 — so the corpus has zero-link docs, multi-link docs, and
both absolute and relative shapes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LINK_MOD = 9973
LINK_HOSTS = 23


def _str(col):
    """Combine chunks and cast binary → string (zero-copy where possible)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        col = col.cast(pa.large_string() if pa.types.is_large_binary(col.type) else pa.string())
    return col


def docs_to_linked_pages_batch(batch: pa.Table) -> pa.Table:
    """documents → pages whose html carries deterministic planted anchors.

    Same construction rules as io_.docpages (url/base html) plus the anchor
    suffixes described in the module docstring; the SQL mirror is
    ``linked_pages_sql_cte``."""
    n = batch.num_rows
    lit = lambda s: pa.array([s] * n, type=pa.string())  # noqa: E731
    doc_id = batch.column("doc_id")
    if isinstance(doc_id, pa.ChunkedArray):
        doc_id = doc_id.combine_chunks()
    ids = doc_id.to_numpy(zero_copy_only=False).astype(np.int64)

    def anchor_abs(k: int) -> pa.Array:
        t = (ids * 31 + 17 * k) % LINK_MOD
        full = pc.binary_join_element_wise(
            lit('<a href="https://h'),
            pc.cast(pa.array(t % LINK_HOSTS), pa.string()),
            lit(".example.org/p/"),
            pc.cast(pa.array(t), pa.string()),
            lit('.html">x</a>'),
            "",
        )
        return pc.if_else(pa.array(ids % 3 >= k), full, lit(""))

    rel = pc.if_else(
        pa.array(ids % 5 == 0),
        pc.binary_join_element_wise(
            lit('<a href="/local/'),
            pc.cast(doc_id, pa.string()),
            lit('.html">l</a>'),
            "",
        ),
        lit(""),
    )
    url = pc.binary_join_element_wise(
        lit("https://"),
        batch.column("source"),
        lit(".example.com/doc/"),
        pc.cast(doc_id, pa.string()),
        lit(".html"),
        "",
    )
    html = pc.binary_join_element_wise(
        lit("<html><head></head><body><p>"),
        batch.column("text"),
        lit("</p>"),
        anchor_abs(1),
        anchor_abs(2),
        rel,
        lit("</body></html>"),
        "",
    )
    return pa.table(
        {"doc_id": doc_id, "url": url, "html": html.cast(pa.large_string())}
    )


LINKED_PAGES_SQL_CTE = (
    "linked_pages AS (SELECT doc_id, "
    "'https://' || source || '.example.com/doc/' || doc_id || '.html' AS url, "
    "'<html><head></head><body><p>' || text || '</p>' || "
    "CASE WHEN doc_id % 3 >= 1 THEN '<a href=\"https://h' || "
    f"(((doc_id * 31 + 17) % {LINK_MOD}) % {LINK_HOSTS}) || '.example.org/p/' || "
    f"((doc_id * 31 + 17) % {LINK_MOD}) || '.html\">x</a>' ELSE '' END || "
    "CASE WHEN doc_id % 3 >= 2 THEN '<a href=\"https://h' || "
    f"(((doc_id * 31 + 34) % {LINK_MOD}) % {LINK_HOSTS}) || '.example.org/p/' || "
    f"((doc_id * 31 + 34) % {LINK_MOD}) || '.html\">x</a>' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN '<a href=\"/local/' || doc_id || "
    "'.html\">l</a>' ELSE '' END || "
    "'</body></html>' AS html FROM documents)"
)


def extract_hrefs_batch(
    batch: pa.Table, html_col: str = "html", keep: tuple[str, ...] = ("doc_id",)
) -> pa.Table:
    """html → exploded (keep..., href) rows, one per href=\"...\" match.

    Vectorized: ONE split on the literal ``href=\"`` per batch, candidate
    selection by offset mask, ONE max_splits=1 split on ``\"`` for the
    closing quote.  Rows whose candidate never closes its quote are dropped
    (regexp semantics).  O(total html bytes), no Python loop over rows."""
    html = pc.fill_null(_str(batch.column(html_col)), "")  # null page = no links
    parts = pc.split_pattern(html, 'href="')
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(parts)
    n_flat = len(flat)
    # element j of row i is a candidate iff j > 0 (text before the first
    # href=" is never a link target)
    starts = np.cumsum(lens) - lens
    cand_mask = np.ones(n_flat, dtype=bool)
    cand_mask[starts] = False
    parent = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)[cand_mask]
    cand = flat.filter(pa.array(cand_mask))
    two = pc.split_pattern(cand, '"', max_splits=1)
    closed = pc.equal(pc.list_value_length(two), 2).to_numpy(zero_copy_only=False)
    # regexp consumes its whole match, so when a candidate segment has NO
    # closing quote the regex capture would run PAST the next href="
    # boundary — the split path restarts there.  A row diverges exactly
    # when some NON-FINAL candidate is unclosed (an unclosed final
    # candidate matches nothing on both sides); re-do just those rows
    # with the real regex (rare path: attribute soup, exactness first)
    is_last = np.zeros(len(cand), dtype=bool)
    if len(cand):
        is_last[np.flatnonzero(np.r_[parent[1:] != parent[:-1], True])] = True
    bad_rows = np.unique(parent[(~closed) & ~is_last])
    href = pc.list_element(two, 0).filter(pa.array(closed))
    parent_c = parent[closed]
    if len(bad_rows):
        import re

        rx = re.compile(r'href="([^"]*)"')
        keep_mask = ~np.isin(parent_c, bad_rows)
        href = href.filter(pa.array(keep_mask))
        parent_c = parent_c[keep_mask]
        html_py = html.take(pa.array(bad_rows)).to_pylist()
        extra_parent, extra_href = [], []
        for r, h in zip(bad_rows.tolist(), html_py):
            for m in rx.findall(h):
                extra_parent.append(r)
                extra_href.append(m)
        parent_c = np.concatenate(
            [parent_c, np.asarray(extra_parent, np.int64)]
        )
        href = pa.concat_arrays(
            [href.cast(pa.string()), pa.array(extra_href, pa.string())]
        )
        order = np.argsort(parent_c, kind="stable")
        parent_c = parent_c[order]
        href = href.take(pa.array(order))
    cols = {c: batch.column(c).take(pa.array(parent_c)) for c in keep}
    cols["href"] = href.cast(pa.string())
    return pa.table(cols)


def host_of(href, base_host) -> pa.Array:
    """Per-link destination host: absolute → RE2-parsed authority,
    root-relative → the base host, otherwise ''."""
    href = _str(href)
    base_host = _str(base_host)
    m = pc.extract_regex(href, r"^[a-z]+://(?P<host>[^/]+)")
    parsed = pc.struct_field(m, "host")
    parsed = pc.fill_null(parsed, "")
    rel = pc.starts_with(href, "/")
    return pc.if_else(rel, base_host, parsed).cast(pa.string())


def linked_pages(docs_ds):
    return docs_ds.map_batches(
        docs_to_linked_pages_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def extract_links(docs_ds):
    """documents → exploded (doc_id, href) link rows."""
    return linked_pages(docs_ds).map_batches(
        extract_hrefs_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def host_links(pages_ds, max_groups: int = 1_000_000):
    """(src_host, dst_host, n_links) over any dataset with (url, html) —
    src parsed from the page url, dst resolved per link; exact counts
    through the bounded coalesce-tree (hosts are sites, not pages)."""
    from .aggregates import tree_groupby

    def edges(batch: pa.Table) -> pa.Table:
        links = extract_hrefs_batch(batch, keep=("url",))
        src = host_of(links.column("url"), links.column("url"))  # urls absolute
        dst = host_of(links.column("href"), src)
        # per-batch pre-aggregation in pyarrow's C++ hash groupby: the tree
        # then moves one skinny row per (src, dst) pair, never per link
        g = (
            pa.table({"src_host": src, "dst_host": dst})
            .group_by(["src_host", "dst_host"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["src_host", "dst_host", "n_links"]).set_column(
            2, "n_links", g.column("count_all").cast(pa.int64())
        )

    return tree_groupby(
        pages_ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True),
        ["src_host", "dst_host"],
        [("n_links", "sum")],
        max_groups=max_groups,
    )


def host_link_graph(docs_ds, max_groups: int = 1_000_000):
    """documents → deterministic linked pages → host link graph (the
    oracle-gated derivation path; real corpora go through host_links)."""
    return host_links(linked_pages(docs_ds), max_groups=max_groups)


def reciprocal_hosts(edges_ds):
    """Host pairs linked in BOTH directions (mutual-citation / link-ring
    signal), one row per unordered pair with both direction counts.

    Input is a host_links edge table — already one skinny row per (src,
    dst) pair, bounded by the site universe, so after the tree combine the
    whole table is ONE block and the reversal join is a single vectorized
    kernel: sort the (min,max,dir) triples once, match adjacent runs.  At
    an unbounded edge universe, hash-bucket by the unordered pair first
    (same kernel per bucket)."""

    def detect(batch: pa.Table) -> pa.Table:
        src = batch.column("src_host").to_numpy(zero_copy_only=False).astype(str)
        dst = batch.column("dst_host").to_numpy(zero_copy_only=False).astype(str)
        n = batch.column("n_links").to_numpy(zero_copy_only=False)
        fwd = src < dst  # canonical orientation; self-loops are not pairs
        valid = src != dst
        a = np.where(fwd, src, dst)[valid]
        b = np.where(fwd, dst, src)[valid]
        f = fwd[valid]
        n = n[valid]
        key = np.char.add(np.char.add(a, "\x00"), b)
        order = np.argsort(key, kind="stable")
        key, a, b, f, n = key[order], a[order], b[order], f[order], n[order]
        if len(key) == 0:
            return pa.table(
                {
                    "host_a": pa.array([], pa.string()),
                    "host_b": pa.array([], pa.string()),
                    "n_ab": pa.array([], pa.int64()),
                    "n_ba": pa.array([], pa.int64()),
                }
            )
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        n_ab = np.add.reduceat(np.where(f, n, 0), starts)
        n_ba = np.add.reduceat(np.where(f, 0, n), starts)
        both = (n_ab > 0) & (n_ba > 0)
        return pa.table(
            {
                "host_a": pa.array(a[starts][both].tolist(), pa.string()),
                "host_b": pa.array(b[starts][both].tolist(), pa.string()),
                "n_ab": pa.array(n_ab[both].astype(np.int64)),
                "n_ba": pa.array(n_ba[both].astype(np.int64)),
            }
        )

    return edges_ds.map_batches(detect, batch_format="pyarrow", batch_size=None)


def link_sources(pages_ds):
    """Exploded (dst_host, url) rows — one per link, url = the SOURCE page.

    Feed this to a grouped HLL over ``url`` keyed by ``dst_host`` for the
    per-site distinct-inlinking-pages profile (link-spam surfaces as a
    host with many links but few distinct sources) — at 10^12 pages only
    the sketch answers; KB-sized per-host partials move, never urls."""

    def f(batch: pa.Table) -> pa.Table:
        links = extract_hrefs_batch(batch, keep=("url",))
        src = host_of(links.column("url"), links.column("url"))
        dst = host_of(links.column("href"), src)
        return pa.table({"dst_host": dst, "url": links.column("url")})

    return pages_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
