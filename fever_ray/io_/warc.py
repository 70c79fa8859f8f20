"""Minimal WARC (ISO 28500 / WARC/1.0) source + writer for web-page tables.

Common Crawl ships as WARC — gzip'd concatenation of records, each:

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    Content-Length: <payload bytes>\\r\\n
    \\r\\n
    <payload>\\r\\n\\r\\n

``read_warc_pages`` maps WARC response records straight onto the engine's
page schema (url, warc_ts, html) so every pipeline here can consume a
crawl archive without a pre-conversion step; non-response records
(warcinfo, request, metadata) are skipped, exactly like the reference
ingests only the EVE event lines it understands (and like
``io_.flowevent``, the one other wire codec kept for archive parity).

Scale shape: ONE file = one read task (``read_binary_files`` keeps Ray's
per-file parallelism; crawl archives are many ~1 GB segments, which IS
the right distribution axis).  Record parsing is a linear bytes scan with
``bytes.find`` — O(archive bytes), no copies beyond the payload slices —
and payload bytes land zero-copy into the Arrow binary column.  Gzip
members decompress as one stream (GzipFile reads concatenated members,
the Common-Crawl layout).
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


def parse_warc_bytes(blob: bytes) -> pa.Table:
    """Parse one WARC file's bytes → (url, warc_ts, html) table.

    Tolerant scan: malformed records raise ValueError with the byte
    offset (crawl archives are append-only — a truncated tail is a real
    error, not something to silently drop).
    """
    if blob[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as fh:
            blob = fh.read()
    urls, ts_us, payloads = [], [], []
    pos = 0
    n = len(blob)
    while pos < n:
        if blob[pos : pos + 5] != b"WARC/":
            raise ValueError(f"WARC: bad record magic at byte {pos}")
        hdr_end = blob.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError(f"WARC: unterminated header block at byte {pos}")
        headers = {}
        for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"WARC: missing/bad Content-Length at byte {pos}")
        body = hdr_end + 4
        if body + clen > n:
            raise ValueError(f"WARC: truncated payload at byte {body}")
        if headers.get(b"warc-type") == b"response":
            urls.append(headers.get(b"warc-target-uri", b"").decode("utf-8"))
            date = headers.get(b"warc-date", b"").decode("ascii")
            ts_us.append(_parse_warc_date_us(date))
            payloads.append(blob[body : body + clen])
        pos = body + clen
        if blob[pos : pos + 4] == _CRLF2:
            pos += 4
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(ts_us, dtype=np.int64), pa.timestamp("us", tz="UTC")
            ),
            "html": pa.array(payloads, pa.binary()),
        }
    )


def _parse_warc_date_us(s: str) -> int:
    """``2024-01-01T00:00:00Z`` (± fractional seconds) → unix microseconds.
    Exact integer timedelta division — no float seconds, no wall clock."""
    from datetime import datetime, timedelta, timezone

    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (dt - epoch) // timedelta(microseconds=1)


def read_warc_pages(paths):
    """WARC file(s)/dir → Dataset of (url, warc_ts, html) response pages."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=False)

    def parse(batch: pa.Table) -> pa.Table:
        tabs = [
            parse_warc_bytes(b.as_py() if hasattr(b, "as_py") else b)
            for b in batch.column("bytes")
        ]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return parse_warc_bytes(b"")
        return pa.concat_tables(tabs)

    return ds.map_batches(parse, batch_format="pyarrow")


def warc_to_pages_resumable(
    input_files: list[str], out_dir: str, derive=None
) -> dict:
    """Resumable WARC → page-parquet conversion: one output parquet + one
    manifest entry per ARCHIVE FILE (atomic tmp+rename, presence = done),
    so a crashed 100 TB ingest rerun skips finished archives — the same
    contract as ``run_partitioned_build``.  ``derive(table)->table``
    post-processes each archive's parsed pages (e.g. pinned-extractor
    text derivation)."""
    import ray
    import ray.data as rd

    from .checkpoint import _atomic_write, done_partitions, partition_key

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    done = done_partitions(out_dir)
    done_inputs = {rec["input_path"] for rec in done.values()}
    pending = [f for f in input_files if f not in done_inputs]
    completed = []
    if pending:
        import json

        import pyarrow.parquet as pq

        ds = rd.read_binary_files(pending, include_paths=True)

        def convert(batch: pa.Table) -> pa.Table:
            rows_out, keys_out = [], []
            for path_v, blob in zip(
                batch.column("path").to_pylist(), batch.column("bytes")
            ):
                out = parse_warc_bytes(
                    blob.as_py() if hasattr(blob, "as_py") else blob
                )
                if derive is not None:
                    out = derive(out)
                key = partition_key(path_v)
                ppath = os.path.join(out_dir, "parts", f"{key}.parquet")
                _atomic_write(ppath, lambda p: pq.write_table(out, p))
                manifest = {
                    "partition": key,
                    "input_path": path_v,
                    "rows": out.num_rows,
                    "payload_path": ppath,
                    "payload_digest": "",
                    "sketch_ids": [],
                    "metrics": {"rows": out.num_rows, "payload_bytes": out.nbytes},
                }
                _atomic_write(
                    os.path.join(out_dir, "manifest", f"{key}.json"),
                    lambda p: open(p, "w").write(json.dumps(manifest, sort_keys=True)),
                )
                rows_out.append(out.num_rows)
                keys_out.append(key)
            return pa.table(
                {
                    "partition": pa.array(keys_out, pa.string()),
                    "rows": pa.array(np.asarray(rows_out, np.int64)),
                }
            )

        completed = [
            r for t in ray.get(
                ds.map_batches(convert, batch_format="pyarrow").to_arrow_refs()
            )
            if t.num_rows and t.num_columns
            for r in t.to_pylist()
        ]
    return {
        "completed": completed,
        "skipped": sorted(done_inputs & set(input_files)),
        "out": out_dir,
    }


def write_warc(table: pa.Table, path: str, compress: bool = False) -> str:
    """Page table → one WARC file of response records (round-trip tested
    against the reader; the test-fixture generator for crawl-archive
    ingestion)."""
    buf = io.BytesIO()
    urls = table.column("url").to_pylist()
    ts = table.column("warc_ts").cast(pa.timestamp("us", tz="UTC")).cast(pa.int64()).to_pylist()
    htmls = table.column("html").to_pylist()
    for u, t, h in zip(urls, ts, htmls):
        if isinstance(h, str):
            h = h.encode("utf-8")
        if u != u.strip() or "\r" in u or "\n" in u:
            # header values cannot carry surrounding whitespace or CRLF —
            # readers strip them (ours included); refuse loudly instead of
            # writing a record that cannot round-trip
            raise ValueError(f"write_warc: url not header-safe: {u!r}")
        secs, us = divmod(int(t), 1_000_000)
        from datetime import datetime, timezone

        stamp = datetime.fromtimestamp(secs, tz=timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S"
        )
        if us:
            stamp += f".{us:06d}"
        stamp += "Z"
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + u.encode("utf-8") + b"\r\n"
            b"WARC-Date: " + stamp.encode("ascii") + b"\r\n"
            b"Content-Length: " + str(len(h)).encode("ascii") + b"\r\n"
            b"\r\n"
        )
        buf.write(hdr)
        buf.write(h)
        buf.write(_CRLF2)
    blob = buf.getvalue()
    if compress:
        blob = gzip.compress(blob)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(blob)
    return path
