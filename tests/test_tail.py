"""Live-tail ingestion (io_.tail): byte-offset segment cutting is
incremental + idempotent, the unix-socket line server lands exactly the
complete lines it was sent, and a follow loop over the spool converges to
the batch answer over the same lines (input_socket.go analogue)."""

import glob
import json
import os
import socket
import time

import numpy as np
import pyarrow.parquet as pq

from fever_ray.io_.tail import SocketLineServer, cut_segments, spooled_offset


def _event_line(i: int) -> bytes:
    return json.dumps(
        {
            "event_id": i,
            "ts": f"2024-01-01T00:{i % 60:02d}:00",
            "user_id": i % 7,
            "event_type": ["view", "click", "purchase"][i % 3],
            "value": i / 4.0,
            "props": "{}",
        }
    ).encode()


def _append(journal, lines, partial: bytes = b""):
    with open(journal, "ab") as fh:
        for ln in lines:
            fh.write(ln + b"\n")
        fh.write(partial)


def test_cut_segments_incremental_idempotent(tmp_path):
    journal = str(tmp_path / "events.jsonl")
    spool = str(tmp_path / "spool")
    _append(journal, [_event_line(i) for i in range(10)])
    r1 = cut_segments(journal, spool)
    assert r1["rows"] == 10 and r1["start"] == 0
    # idempotent: nothing new → no-op
    assert cut_segments(journal, spool)["rows"] == 0
    # a partial trailing line waits for its newline
    _append(journal, [_event_line(i) for i in range(10, 15)], partial=b'{"event_id"')
    r2 = cut_segments(journal, spool)
    assert r2["rows"] == 5 and r2["start"] == r1["end"]
    _append(journal, [], partial=b": 99}\n")
    r3 = cut_segments(journal, spool)
    assert r3["rows"] == 1
    # the spool IS the state: offset re-derives from filenames
    assert spooled_offset(spool) == os.path.getsize(journal)
    # all segments concatenate to exactly the journal's 16 events
    rows = sum(
        pq.read_table(p).num_rows for p in glob.glob(spool + "/seg_*.parquet")
    )
    assert rows == 16


def test_socket_server_lands_complete_lines(tmp_path):
    sock = str(tmp_path / "ingest.sock")
    journal = str(tmp_path / "events.jsonl")
    with SocketLineServer(sock, journal, max_line_bytes=1 << 16) as srv:
        c1 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c1.connect(sock)
        c2 = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c2.connect(sock)
        for i in range(0, 20, 2):
            c1.sendall(_event_line(i) + b"\n")
            c2.sendall(_event_line(i + 1) + b"\n")
        # split send: one line delivered in two writes must still land whole
        half = _event_line(20)
        c1.sendall(half[:7])
        time.sleep(0.3)
        c1.sendall(half[7:] + b"\n")
        # an oversized line is dropped and counted, not landed
        c2.sendall(b"x" * (1 << 17) + b"\n")
        c2.sendall(_event_line(21) + b"\n")
        c1.close()
        c2.close()
        deadline = time.time() + 10
        while time.time() < deadline and srv.stats()["lines"] < 22:
            time.sleep(0.05)
        st = srv.stats()
    assert st["lines"] == 22
    assert st["oversized_dropped"] == 1
    landed = open(journal, "rb").read().splitlines()
    assert len(landed) == 22
    ids = sorted(json.loads(ln)["event_id"] for ln in landed)
    assert ids == list(range(22))
    out = cut_segments(journal, str(tmp_path / "spool"))
    assert out["rows"] == 22


def test_follow_tail_converges_to_batch(ray_session, tmp_path):
    from fever_ray.core.udaf import SketchSpec
    from fever_ray.io_.checkpoint import run_partitioned_build
    from fever_ray.pipelines.follow import follow

    specs = [
        SketchSpec("hll_et", "hll", "event_type", {"p": 12}),
        SketchSpec("cms_et", "cms", "event_type", {"width": 256, "depth": 5},
                   track=True),
    ]
    journal = str(tmp_path / "events.jsonl")
    spool = str(tmp_path / "spool")
    ck = str(tmp_path / "ck")

    it = follow(
        spool + "/seg_*.parquet",
        specs,
        ck,
        poll_s=0,
        max_idle_polls=1,
        pre_poll=lambda: cut_segments(journal, spool),
    )
    # writer appends → tail cuts a segment → the checkpointed build sees it
    _append(journal, [_event_line(i) for i in range(40)])
    s1 = next(it)
    assert len(s1["new_files"]) == 1
    _append(journal, [_event_line(i) for i in range(40, 100)])
    s2 = next(it)
    assert len(s2["new_files"]) == 1 and len(s2["skipped_files"]) == 1

    # converges to the batch answer over the SAME lines, bit-identically
    batch_journal = str(tmp_path / "all.jsonl")
    _append(batch_journal, [_event_line(i) for i in range(100)])
    bspool = str(tmp_path / "bspool")
    cut_segments(batch_journal, bspool)
    control = run_partitioned_build(
        sorted(glob.glob(bspool + "/seg_*.parquet")), specs,
        str(tmp_path / "ck2"),
    )
    assert np.array_equal(
        s2["sketches"]["hll_et"].registers,
        control["sketches"]["hll_et"].registers,
    )
    assert np.array_equal(
        s2["sketches"]["cms_et"].table, control["sketches"]["cms_et"].table
    )
    # idle journal → the generator terminates via max_idle_polls
    assert list(it) == []


def test_cut_segments_fuzz_random_append_patterns(tmp_path):
    """Any sequence of appends (partial lines, multi-line bursts, empty
    appends) cuts into segments whose concatenation is exactly the
    journal's complete lines, with no duplicates and no loss."""
    import numpy as np

    rng = np.random.default_rng(23)
    journal = str(tmp_path / "j.jsonl")
    spool = str(tmp_path / "spool")
    written = []
    pending = b""
    next_id = 0
    for _ in range(40):
        burst = rng.integers(0, 4)
        chunk = b""
        for _ in range(burst):
            ln = _event_line(next_id)
            written.append(next_id)
            next_id += 1
            chunk += ln + b"\n"
        # sometimes leave a dangling partial line
        if rng.random() < 0.4:
            nxt = _event_line(next_id)
            cut = int(rng.integers(1, len(nxt)))
            with open(journal, "ab") as fh:
                fh.write(pending + chunk + nxt[:cut])
            pending = b""
            # complete it immediately on the next append
            with open(journal, "ab") as fh:
                fh.write(nxt[cut:] + b"\n")
            written.append(next_id)
            next_id += 1
        else:
            with open(journal, "ab") as fh:
                fh.write(pending + chunk)
            pending = b""
        if rng.random() < 0.7:
            cut_segments(journal, spool)
    cut_segments(journal, spool)
    rows = []
    for p in sorted(glob.glob(spool + "/seg_*.parquet")):
        rows += pq.read_table(p).column("event_id").to_pylist()
    assert rows == written  # order, completeness, no duplicates
    assert spooled_offset(spool) == os.path.getsize(journal)


def test_socket_server_counts_truncated_eof_fragment(tmp_path):
    """A client that disconnects without a trailing newline loses the
    fragment (its newline can never arrive) — the loss must be counted,
    not silent (ADVICE r3: SocketLineServer dropped it uncounted)."""
    sock = str(tmp_path / "ingest.sock")
    journal = str(tmp_path / "events.jsonl")
    with SocketLineServer(sock, journal, max_line_bytes=1 << 16) as srv:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        c.connect(sock)
        c.sendall(_event_line(1) + b"\n")
        c.sendall(b'{"event_id": 2')  # never terminated
        time.sleep(0.3)
        c.close()
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            s = srv.stats()
            if s["truncated_dropped"] == 1 and s["lines"] == 1:
                break
            time.sleep(0.05)
        s = srv.stats()
    assert s["lines"] == 1
    assert s["truncated_dropped"] == 1
    # a clean close right after a newline is NOT counted as truncation
    assert s["oversized_dropped"] == 0


class _FakePipeline:
    """Minimal redis-py pipeline: queued RPOPs answered transactionally."""

    def __init__(self, store):
        self._store = store
        self._ops = []

    def rpop(self, key):
        self._ops.append(key)

    def execute(self):
        out = []
        for key in self._ops:
            q = self._store.get(key, [])
            out.append(q.pop() if q else None)
        self._ops = []
        return out


class _FakeRedis:
    """In-memory stand-in for the redis-py surface RedisQueueDrainer
    uses: lpush producers, RPOP/BRPOP consumers (list tail = oldest)."""

    def __init__(self):
        self.store: dict[str, list[bytes]] = {}

    def lpush(self, key, *vals):
        self.store.setdefault(key, [])
        for v in vals:
            self.store[key].insert(0, v if isinstance(v, bytes) else str(v).encode())

    def pipeline(self, transaction=True):
        return _FakePipeline(self.store)

    def brpop(self, key, timeout=1):
        q = self.store.get(key, [])
        return (key.encode(), q.pop()) if q else None

    def llen(self, key):
        return len(self.store.get(key, []))


def test_redis_drainer_queue_to_journal_converges_to_batch(ray_session, tmp_path):
    """Queue drain → durable journal → cut → checkpointed follow build
    equals the batch answer over the same events (the RedisInput
    analogue inherits SocketLineServer's replay semantics for free)."""
    from fever_ray.core.udaf import SketchSpec
    from fever_ray.io_.checkpoint import run_partitioned_build
    from fever_ray.io_.tail import RedisQueueDrainer
    from fever_ray.pipelines.follow import follow

    specs = [SketchSpec("hll_et", "hll", "event_type", {"p": 12})]
    journal = str(tmp_path / "events.jsonl")
    spool = str(tmp_path / "spool")

    fake = _FakeRedis()
    for i in range(60):
        fake.lpush("suricata", _event_line(i))
    dr = RedisQueueDrainer(journal, client=fake, queue="suricata", batch_size=16)
    assert dr.queue_length() == 60

    it = follow(
        spool + "/seg_*.parquet",
        specs,
        str(tmp_path / "ck"),
        poll_s=0,
        max_idle_polls=1,
        pre_poll=lambda: (dr.drain_until_empty(), cut_segments(journal, spool))[-1],
    )
    s1 = next(it)
    assert len(s1["new_files"]) == 1
    assert dr.queue_length() == 0 and dr.stats()["lines"] == 60

    # second wave through the BRPOP (non-pipelined) mode
    for i in range(60, 100):
        fake.lpush("suricata", _event_line(i))
    dr.use_pipelining = False
    s2 = next(it)
    assert dr.stats()["lines"] == 100
    assert list(it) == []  # drained queue → idle → terminate

    # byte-exact batch control over the same 100 events
    batch_journal = str(tmp_path / "all.jsonl")
    _append(batch_journal, [_event_line(i) for i in range(100)])
    bspool = str(tmp_path / "bspool")
    cut_segments(batch_journal, bspool)
    control = run_partitioned_build(
        sorted(glob.glob(bspool + "/seg_*.parquet")), specs,
        str(tmp_path / "ck2"),
    )
    assert np.array_equal(
        s2["sketches"]["hll_et"].registers,
        control["sketches"]["hll_et"].registers,
    )


def test_redis_drainer_drops_and_counts_malformed(tmp_path):
    """Oversized elements and embedded-newline elements would corrupt the
    journal's line framing — dropped AND counted, never landed."""
    from fever_ray.io_.tail import RedisQueueDrainer

    fake = _FakeRedis()
    fake.lpush("q", b"ok-1", b"x" * 200, b"bad\nsplit", b"", b"ok-2")
    dr = RedisQueueDrainer(
        str(tmp_path / "j.jsonl"), client=fake, queue="q",
        batch_size=8, max_line_bytes=100,
    )
    assert dr.drain_once() == 2
    s = dr.stats()
    assert s["lines"] == 2 and s["malformed_dropped"] == 3
    data = open(tmp_path / "j.jsonl", "rb").read()
    # FIFO order preserved (lpush head, rpop tail)
    assert data == b"ok-1\nok-2\n"


def test_redis_drainer_run_loop_stops_and_counts(tmp_path):
    """run(max_drains=N) drains everything queued without sleeping when
    batches keep landing, and stops on the stop event."""
    import threading

    from fever_ray.io_.tail import RedisQueueDrainer

    fake = _FakeRedis()
    for i in range(30):
        fake.lpush("q", _event_line(i))
    dr = RedisQueueDrainer(
        str(tmp_path / "j.jsonl"), client=fake, queue="q",
        batch_size=10, backoff_s=0,
    )
    assert dr.run(max_drains=4) == 30  # 3 full batches + 1 empty
    stop = threading.Event()
    stop.set()
    assert dr.run(stop=stop) == 0
