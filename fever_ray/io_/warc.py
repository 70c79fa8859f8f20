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
the right distribution axis).  Record parsing is an incremental stream
scan — header block, then exactly Content-Length payload bytes — so a
gzip'd segment is never fully decompressed into one resident bytes
object (peak extra memory ≈ one record + a 1 MB read buffer).  Gzip
members decompress as one stream (GzipFile reads concatenated members,
the Common-Crawl layout).

Real crawl archives (Common Crawl) store the FULL HTTP response —
status line + headers + body — as the payload of response records,
flagged ``Content-Type: application/http; msgtype=response``.  For such
records the HTTP header block is stripped (everything through the first
``\\r\\n\\r\\n`` inside the payload) so the ``html`` column carries only
the body; bare payloads (no application/http content-type — this
module's own writer) pass through untouched, keeping the round-trip
contract intact.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


class _RecordStream:
    """Buffered reader over a (possibly Gzip) stream: header-block and
    exact-length reads without ever materializing the whole archive."""

    _CHUNK = 1 << 20

    def __init__(self, fh):
        self.fh = fh
        self.buf = bytearray()
        self.off = 0  # absolute offset (decompressed bytes) of buf[0]

    def _fill(self, n: int) -> bool:
        while len(self.buf) < n:
            chunk = self.fh.read(max(self._CHUNK, n - len(self.buf)))
            if not chunk:
                return False
            self.buf += chunk
        return True

    def peek(self, n: int) -> bytes:
        self._fill(n)
        return bytes(self.buf[:n])

    def skip(self, n: int) -> None:
        del self.buf[:n]
        self.off += n

    def read_exact(self, n: int):
        """n bytes, or None at EOF (buffer untouched on failure)."""
        if not self._fill(n):
            return None
        out = bytes(self.buf[:n])
        self.skip(n)
        return out

    def read_until_crlf2(self):
        """Bytes up to (excluding) the next CRLFCRLF, consuming the
        delimiter too; None if EOF arrives first."""
        start = 0
        while True:
            i = self.buf.find(_CRLF2, max(0, start - 3))
            if i >= 0:
                out = bytes(self.buf[:i])
                self.skip(i + 4)
                return out
            start = len(self.buf)
            chunk = self.fh.read(self._CHUNK)
            if not chunk:
                return None
            self.buf += chunk


def parse_warc_bytes(blob: bytes) -> pa.Table:
    """Parse one WARC file's bytes → (url, warc_ts, html) table.

    Tolerant scan: malformed records raise ValueError with the byte
    offset (crawl archives are append-only — a truncated tail is a real
    error, not something to silently drop).
    """
    if blob[:2] == b"\x1f\x8b":
        fh = gzip.GzipFile(fileobj=io.BytesIO(blob))
    else:
        fh = io.BytesIO(blob)
    with fh:
        return _parse_warc_stream(_RecordStream(fh))


def _parse_warc_stream(st: _RecordStream) -> pa.Table:
    urls, ts_us, payloads = [], [], []
    while True:
        head = st.peek(5)
        if not head:
            break
        if head != b"WARC/":
            raise ValueError(f"WARC: bad record magic at byte {st.off}")
        rec_off = st.off
        hdr = st.read_until_crlf2()
        if hdr is None:
            raise ValueError(f"WARC: unterminated header block at byte {rec_off}")
        headers = {}
        for line in hdr.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"WARC: missing/bad Content-Length at byte {rec_off}")
        body_off = st.off
        payload = st.read_exact(clen)
        if payload is None:
            raise ValueError(f"WARC: truncated payload at byte {body_off}")
        if headers.get(b"warc-type") == b"response":
            if (
                headers.get(b"content-type", b"").split(b";")[0].strip()
                == b"application/http"
            ):
                # real crawl archives: payload is the full HTTP response;
                # html is the body after the HTTP header block
                i = payload.find(_CRLF2)
                if i >= 0:
                    payload = payload[i + 4 :]
            urls.append(headers.get(b"warc-target-uri", b"").decode("utf-8"))
            date = headers.get(b"warc-date", b"").decode("ascii")
            ts_us.append(_parse_warc_date_us(date))
            payloads.append(payload)
        if st.peek(4) == _CRLF2:
            st.skip(4)
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
