"""Deterministic documents→pages derivation (SQL-mirrorable).

The driver's correctness gate runs DuckDB oracles over the fixed views
(documents, events, ...), so page-shaped queries need a page table that BOTH
sides can derive exactly:

    url     = 'https://' || source || '.example.com/doc/' || doc_id || '.html'
    warc_ts = TIMESTAMP '2024-01-01 00:00:00' + doc_id seconds
    html    = '<html><head></head><body><p>' || text || '</p></body></html>'
    text    = text   (and extract_text(html) == text by construction)
    lang    = lang

(The richer Zipf/IoC/near-dup page generator for tests and benches lives in
``fever_ray.gen.pages``; this one exists for oracle parity.)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

BASE_TS_US = 1704067200_000_000  # 2024-01-01T00:00:00

PAGES_FROM_DOCS_SQL_URL = (
    "'https://' || source || '.example.com/doc/' || doc_id || '.html'"
)


def docs_to_pages_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    lit = lambda s: pa.array([s] * n, type=pa.string())  # noqa: E731
    doc_id_str = pc.cast(batch.column("doc_id"), pa.string())
    url = pc.binary_join_element_wise(
        lit("https://"),
        batch.column("source"),
        lit(".example.com/doc/"),
        doc_id_str,
        lit(".html"),
        "",
    )
    text = batch.column("text")
    html = pc.binary_join_element_wise(
        lit("<html><head></head><body><p>"),
        text,
        lit("</p></body></html>"),
        "",
    )
    ts = pc.add(
        pc.multiply(batch.column("doc_id"), pa.scalar(1_000_000, type=pa.int64())),
        pa.scalar(BASE_TS_US, type=pa.int64()),
    ).cast(pa.timestamp("us"))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "url": url,
            "warc_ts": ts,
            "html": html.cast(pa.binary()),
            "text": text.cast(pa.large_string()),
            "lang": batch.column("lang"),
        }
    )


def docs_to_pages(docs_ds):
    return docs_ds.map_batches(
        docs_to_pages_batch, batch_format="pyarrow", zero_copy_batch=True
    )
