"""mgmt control-plane analogue (io_.mgmt): unix-socket line-JSON server
speaking the BloomAdd/BloomInfo/BloomSave/BloomReload verbs of
mgmt/mgmtserver.go + mgmt.proto, the `fever bloom` client face, the
add-during-reload race, and the save→iocwatch generation handoff."""

import json
import threading

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fever_ray.io_.mgmt import MgmtClient, MgmtServer
from fever_ray.sketches.bloom import BloomFilter, build_filter


@pytest.fixture
def served(tmp_path):
    bloom_path = str(tmp_path / "iocs.bloom")
    build_filter(["seed.example.com"], n=10_000, p=1e-7).save(bloom_path)
    sock = str(tmp_path / "mgmt" / "fever.sock")
    with MgmtServer(bloom_path, sock) as srv:
        yield srv, sock, bloom_path


def test_alive_echo(served):
    _, sock, _ = served
    with MgmtClient(sock) as c:
        assert c.alive("hello") == "hello"


def test_bloom_info_fields(served):
    """MgmtBloomInfoResponse parity: capacity/elements/bits/hashfuncs/
    fpprob (mgmtserver.go:96-117)."""
    srv, sock, bloom_path = served
    with MgmtClient(sock) as c:
        info = c.bloom_info()
    bf = BloomFilter.load_with_fallback(bloom_path)
    assert info["has_bloom"] is True
    assert info["capacity"] == bf.n
    assert info["elements"] == bf.N
    assert info["bits"] == bf.m
    assert info["hashfuncs"] == bf.k
    assert info["fpprob"] == bf.p


def test_add_hits_live_filter_not_disk(served):
    """BloomAdd mutates the LIVE filter; the artifact only changes on
    BloomSave (mgmtserver.go:118-160)."""
    srv, sock, bloom_path = served
    with MgmtClient(sock) as c:
        assert c.bloom_add(["evil-new.example.net"]) == 1
    assert srv.check("evil-new.example.net")
    assert not BloomFilter.load_with_fallback(bloom_path).check_one(
        "evil-new.example.net"
    )
    with MgmtClient(sock) as c:
        c.bloom_save()
    assert BloomFilter.load_with_fallback(bloom_path).check_one(
        "evil-new.example.net"
    )


def test_add_streams_many(served):
    srv, sock, _ = served
    iocs = [f"bulk-{i}.example.org" for i in range(5000)]
    with MgmtClient(sock) as c:
        assert c.bloom_add(iocs) == 5000
        info = c.bloom_info()
    assert info["elements"] >= 5000
    assert srv.check("bulk-0.example.org") and srv.check("bulk-4999.example.org")


def test_reload_discards_unsaved_adds(served):
    """BloomReload replaces the in-memory filter from disk — live adds
    that were never saved are gone (the reference semantics)."""
    srv, sock, _ = served
    with MgmtClient(sock) as c:
        c.bloom_add(["ephemeral.example.com"])
        assert srv.check("ephemeral.example.com")
        c.bloom_reload()
    assert not srv.check("ephemeral.example.com")
    assert srv.check("seed.example.com")  # the saved generation survives


def test_concurrent_add_during_reload(served):
    """One client streams adds while another fires reloads: every request
    is answered, the server never corrupts the filter, and every add
    AFTER the last reload is present (adds serialize with reload on the
    state lock; earlier adds may legitimately be discarded by a reload)."""
    srv, sock, _ = served
    added_total = []
    errors = []

    def adder(tag):
        try:
            with MgmtClient(sock) as c:
                for j in range(20):
                    added_total.append(
                        c.bloom_add([f"race-{tag}-{j}-{i}" for i in range(50)])
                    )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def reloader():
        try:
            with MgmtClient(sock) as c:
                for _ in range(10):
                    c.bloom_reload()
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=adder, args=(t,)) for t in "ab"] + [
        threading.Thread(target=reloader)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    assert sum(added_total) == 2 * 20 * 50  # every add acked
    # the server still serves coherently post-race
    with MgmtClient(sock) as c:
        c.bloom_add(["post-race.example.com"])
        assert c.bloom_info()["has_bloom"]
    assert srv.check("post-race.example.com")
    assert srv.check("seed.example.com")


def test_malformed_request_reports_error_and_keeps_serving(served):
    _, sock, _ = served
    import socket as pysock

    s = pysock.socket(pysock.AF_UNIX, pysock.SOCK_STREAM)
    s.connect(sock)
    s.sendall(b"this is not json\n")
    rfile = s.makefile("rb")
    assert "error" in json.loads(rfile.readline())
    s.sendall(b'{"cmd": "alive", "alive": "still-up"}\n')
    assert json.loads(rfile.readline())["echo"] == "still-up"
    s.close()
    with MgmtClient(sock) as c:  # unknown cmd surfaces as RuntimeError
        with pytest.raises(RuntimeError):
            c._call({"cmd": "nonsense"})


def test_save_is_atomic_generation_flip(served, tmp_path):
    """bloom_save goes through tmp+rename: no partially-written artifact
    is ever observable at the destination path."""
    srv, sock, bloom_path = served
    import os

    before = os.stat(bloom_path).st_ino
    with MgmtClient(sock) as c:
        c.bloom_add(["gen2.example.com"])
        c.bloom_save()
    after = os.stat(bloom_path).st_ino
    assert before != after  # rename, not in-place write
    assert not list(tmp_path.glob("*.tmp.*"))  # no tmp litter


def test_mgmt_save_feeds_iocwatch_generation(served, ray_session, tmp_path):
    """End-to-end mgmt→daemon handoff: a follower is mid-stream; the mgmt
    client streams a new indicator and saves; the follower's NEXT poll
    reports reloaded=True and matches the new indicator in NEW shards
    only — history is not rescanned (the BloomAdd+Save→live-matcher
    contract, mapped through the artifact file)."""
    from fever_ray.pipelines.iocwatch import ioc_follow

    srv, sock, bloom_path = served
    land = tmp_path / "landing"
    land.mkdir()
    out = str(tmp_path / "matches")

    def shard(name, urls):
        pq.write_table(
            pa.table({"url": pa.array(urls, pa.string())}),
            str(land / name),
        )

    shard("s1.parquet", ["http://seed.example.com/a", "http://late.example.net/x"])
    it = ioc_follow(str(land / "*.parquet"), bloom_path, out,
                    poll_s=0, max_idle_polls=1)
    s1 = next(it)
    assert s1["matches"] == 1 and not s1["reloaded"]

    with MgmtClient(sock) as c:
        c.bloom_add(["late.example.net"])
        c.bloom_save()

    shard("s2.parquet", ["http://late.example.net/y", "http://benign.test/"])
    s2 = next(it)
    assert s2["reloaded"] is True
    assert s2["bloom_sha"] != s1["bloom_sha"]
    assert s2["matches"] == 1        # new shard under the new generation
    assert s2["total_matches"] == 2  # s1 NOT rescanned (late.../x unmatched)
