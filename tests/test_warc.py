"""WARC source: round-trip parity with the page table, gzip members,
non-response skipping, truncation errors (io_.warc)."""

import gzip

import pyarrow as pa
import pytest

from fever_ray.io_.warc import parse_warc_bytes, read_warc_pages, write_warc


def _pages(n=50, seed=3):
    from fever_ray.gen.pages import generate_pages

    return generate_pages(n, seed=seed, dup_frac=0.0)


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    t = _pages()
    for compress in (False, True):
        p = write_warc(t, str(tmp_path / f"a{int(compress)}.warc"), compress=compress)
        back = parse_warc_bytes(open(p, "rb").read())
        assert back.column("url").to_pylist() == t.column("url").to_pylist()
        assert back.column("html").to_pylist() == t.column("html").to_pylist()
        assert (
            back.column("warc_ts").cast(pa.int64()).to_pylist()
            == t.column("warc_ts").cast(pa.int64()).to_pylist()
        )


def test_warc_skips_non_response_records():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nblah\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://x/\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    resp = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/page\r\n"
        b"WARC-Date: 2024-02-03T04:05:06.000123Z\r\n"
        b"Content-Length: 6\r\n\r\n<html>\r\n\r\n"
    )
    out = parse_warc_bytes(info + req + resp)
    assert out.num_rows == 1
    assert out.column("url")[0].as_py() == "https://x/page"
    assert out.column("html")[0].as_py() == b"<html>"
    # exact microsecond timestamp (integer arithmetic, no float seconds)
    us = out.column("warc_ts").cast(pa.int64())[0].as_py()
    assert us % 1_000_000 == 123


def test_warc_malformed_inputs_raise():
    with pytest.raises(ValueError, match="magic"):
        parse_warc_bytes(b"NOTWARC\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc_bytes(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    ok = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nshort"
    with pytest.raises(ValueError, match="truncated"):
        parse_warc_bytes(ok)
    assert parse_warc_bytes(b"").num_rows == 0


def test_read_warc_pages_dataset_parity(ray_session, tmp_path):
    t = _pages(120, seed=8)
    # shard across three files, one gzip'd (mixed archive layouts)
    write_warc(t.slice(0, 40), str(tmp_path / "s0.warc"))
    write_warc(t.slice(40, 40), str(tmp_path / "s1.warc"), compress=True)
    write_warc(t.slice(80, 40), str(tmp_path / "s2.warc"))
    ds = read_warc_pages(str(tmp_path))
    got = ds.take_all()
    by_url = {r["url"]: r for r in got}
    assert len(got) == 120
    urls = t.column("url").to_pylist()
    htmls = t.column("html").to_pylist()
    for u, h in zip(urls, htmls):
        assert by_url[u]["html"] == h
    # the pinned extractor runs unchanged on WARC-sourced html
    import ray.data as rd  # noqa: F401

    from fever_ray.ops.extract import extract_text

    sample = got[0]
    idx = urls.index(sample["url"])
    assert (
        extract_text(pa.array([sample["html"]], pa.binary()))[0].as_py()
        == t.column("text")[idx].as_py()
    )


def test_warc_resumable_conversion(ray_session, tmp_path):
    from fever_ray.io_.warc import warc_to_pages_resumable

    t = _pages(60, seed=12)
    f0 = write_warc(t.slice(0, 30), str(tmp_path / "a.warc"))
    f1 = write_warc(t.slice(30, 30), str(tmp_path / "b.warc"), compress=True)
    out = str(tmp_path / "out")
    r1 = warc_to_pages_resumable([f0, f1], out)
    assert len(r1["completed"]) == 2 and not r1["skipped"]
    # rerun: both archives skip, outputs untouched
    r2 = warc_to_pages_resumable([f0, f1], out)
    assert not r2["completed"] and len(r2["skipped"]) == 2
    import pyarrow.parquet as pq
    import glob

    parts = sorted(glob.glob(f"{out}/parts/*.parquet"))
    assert len(parts) == 2
    back = pa.concat_tables([pq.read_table(p) for p in parts])
    assert sorted(back.column("url").to_pylist()) == sorted(
        t.column("url").to_pylist()
    )
    # a NEW archive converts incrementally without touching the old two
    f2 = write_warc(t.slice(0, 10), str(tmp_path / "c.warc"))
    r3 = warc_to_pages_resumable([f0, f1, f2], out)
    assert len(r3["completed"]) == 1 and len(r3["skipped"]) == 2


def test_warc_payload_containing_record_markers_roundtrips():
    """Content-Length framing means payload bytes that LOOK like record
    boundaries (CRLFCRLF, WARC/ magic) must pass through untouched."""
    evil = [
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n",
        b'href="x" Content-Length: 9\r\n\r\n',
        b"",
        b"\x00\x01\xff\xfe binary \r\n",
    ]
    t = pa.table(
        {
            "url": pa.array([f"https://x/{i}" for i in range(len(evil))]),
            "warc_ts": pa.array(
                [1704067200_000_000 + i for i in range(len(evil))],
                pa.timestamp("us", tz="UTC"),
            ),
            "html": pa.array(evil, pa.binary()),
        }
    )
    import io as _io

    for compress in (False, True):
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            p = write_warc(t, f"{d}/e.warc", compress=compress)
            back = parse_warc_bytes(open(p, "rb").read())
            assert back.column("html").to_pylist() == evil
            assert back.column("url").to_pylist() == t.column("url").to_pylist()


def test_warc_fuzz_roundtrip_property():
    """Hypothesis: any (url, ts, payload) table round-trips through
    write_warc/parse_warc_bytes byte-exactly, payload content arbitrary."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(
                    alphabet=st.characters(
                        codec="utf-8", exclude_characters="\r\n"
                    ),
                    max_size=20,
                ).map(lambda u: u.strip()),
                st.integers(0, 2**48),
                st.binary(max_size=200),
            ),
            max_size=5,
        )
    )
    def run(rows):
        import tempfile

        t = pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "html": pa.array([r[2] for r in rows], pa.binary()),
            }
        )
        with tempfile.TemporaryDirectory() as d:
            p = write_warc(t, f"{d}/f.warc")
            back = parse_warc_bytes(open(p, "rb").read())
        assert back.column("html").to_pylist() == [r[2] for r in rows]
        assert back.column("url").to_pylist() == [r[0] for r in rows]
        assert back.column("warc_ts").cast(pa.int64()).to_pylist() == [
            r[1] for r in rows
        ]

    run()


def test_warc_writer_rejects_header_unsafe_urls():
    t = pa.table(
        {
            "url": pa.array([" padded "], pa.string()),
            "warc_ts": pa.array([0], pa.timestamp("us", tz="UTC")),
            "html": pa.array([b"x"], pa.binary()),
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="header-safe"):
            write_warc(t, f"{d}/bad.warc")


def test_warc_application_http_payload_strips_header_block():
    # Common-Crawl-style response record: payload is the FULL HTTP response
    # (status line + headers + body) flagged application/http — only the
    # body may reach the html column.
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Server: nginx\r\n"
        b"\r\n"
        b"<html><body>real body</body></html>"
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/cc\r\n"
        b"WARC-Date: 2024-02-03T04:05:06Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    out = parse_warc_bytes(rec)
    assert out.column("html")[0].as_py() == b"<html><body>real body</body></html>"
    # bare payload (no application/http content-type) passes through whole —
    # the writer round-trip contract
    bare = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/bare\r\n"
        b"WARC-Date: 2024-02-03T04:05:06Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    out2 = parse_warc_bytes(bare)
    assert out2.column("html")[0].as_py() == http
    # headerless application/http payload (no CRLFCRLF): kept as-is
    rec3 = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x/nohdr\r\n"
        b"WARC-Date: 2024-02-03T04:05:06Z\r\n"
        b"Content-Type: application/http\r\n"
        b"Content-Length: 5\r\n\r\nnaked\r\n\r\n"
    )
    assert parse_warc_bytes(rec3).column("html")[0].as_py() == b"naked"


def test_warc_streaming_gzip_large_record_boundaries():
    # records sized around the 1 MB stream-buffer chunk to cross refill
    # boundaries inside header and payload reads
    big = b"x" * ((1 << 20) + 12345)
    t = pa.table(
        {
            "url": pa.array(["https://a/1", "https://a/2", "https://a/3"]),
            "warc_ts": pa.array([1, 2, 3], pa.timestamp("us", tz="UTC")),
            "html": pa.array([big, b"tiny", big[: 1 << 20]], pa.binary()),
        }
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = write_warc(t, f"{d}/big.warc.gz", compress=True)
        back = parse_warc_bytes(open(p, "rb").read())
        assert back.column("html").to_pylist() == t.column("html").to_pylist()
        assert back.column("url").to_pylist() == t.column("url").to_pylist()
