"""Live-tail ingestion — the reference's socket front door, batch-native.

fever's primary ingest is a unix-socket line server: an accept loop whose
scanner pushes each newline-delimited EVE JSON event into the processing
channel (/root/reference/input/input_socket.go:25-186; the oversized-line
guard doubles the scanner buffer at :95-103).  The Ray-Data-native
equivalent keeps the byte-stream front door but lands it durably before
processing, because replayable files — not sockets — are what a
distributed engine can checkpoint against:

* :class:`SocketLineServer` — the accept-loop analogue: listens on a unix
  domain socket, scans COMPLETE lines out of each connection (partial
  trailing lines wait for their newline; oversized lines are dropped and
  counted, like the reference's ErrTooLong warn path), and appends them to
  an append-only JOURNAL file under a lock.  The journal is the durable
  replacement for the in-memory EventChan — nothing is lost on a crash.
* :func:`cut_segments` — byte-offset tail of the growing journal: parses
  every complete line beyond the last cut into an Arrow table and writes
  it as ONE immutable parquet segment (atomic tmp+rename).  Offsets are
  derived from the segment filenames already in the spool, so the spool
  directory IS the checkpoint — a crash between cut and anything else
  re-cuts the same byte range into the same filename (idempotent), and a
  rerun after success is a no-op.

``follow(..., pre_poll=lambda: cut_segments(journal, spool))`` over the
spool glob then closes the loop: writer process appends lines (directly
or via the socket server) → segments appear → the checkpointed
incremental build (`io_.checkpoint.run_partitioned_build`) picks up only
the new segments → every yield's merged suite converges to the batch
answer over the same lines.  Scale shape: the journal/cut runs on ONE
ingest node per stream; segments are ordinary immutable shards, so the
heavy work (parse → partials → merge) distributes exactly like any other
corpus — 100 TB of history and a live tail share one code path.
"""

from __future__ import annotations

import glob as _glob
import io
import os
import socket
import threading

import pyarrow as pa

SEG_PREFIX = "seg_"


def _append_journal(path: str, blob: bytes) -> None:
    """One locked journal append, safe across WRITER OBJECTS and
    PROCESSES: a socket server and a queue drainer (or two processes)
    may share one journal, and two interleaved partial writes would
    corrupt line framing — flock serializes the append; the in-object
    threading locks only guard counters."""
    import fcntl

    with open(path, "ab") as fh:
        fcntl.flock(fh, fcntl.LOCK_EX)
        try:
            fh.write(blob)
            fh.flush()
        finally:
            fcntl.flock(fh, fcntl.LOCK_UN)



def _parse_event_lines(chunk: bytes) -> pa.Table:
    """Default line parser: newline-delimited JSON → the standard event
    schema (pyarrow's C++ JSON reader — no Python-per-row parsing)."""
    import pyarrow.json as pj

    from .jsonl import EVENT_COLUMNS, project_events

    tab = pj.read_json(io.BytesIO(chunk))
    return project_events(tab, EVENT_COLUMNS)


def spooled_offset(spool_dir: str) -> int:
    """Byte offset of the journal already cut into segments (0 for a fresh
    spool).  Derived from segment filenames — the spool IS the state."""
    end = 0
    for p in _glob.glob(os.path.join(spool_dir, f"{SEG_PREFIX}*.parquet")):
        name = os.path.basename(p)[len(SEG_PREFIX) : -len(".parquet")]
        try:
            _, hi = name.split("_")
            end = max(end, int(hi))
        except ValueError:
            continue
    return end


def cut_segments(
    journal_path: str,
    spool_dir: str,
    parse=None,
    min_bytes: int = 1,
) -> dict:
    """One tail step: journal bytes beyond the spooled offset (complete
    lines only) → one immutable parquet segment.  Returns
    ``{"rows", "start", "end", "segment"}`` (rows 0 = nothing new).

    Crash-safe by construction: the segment filename encodes the exact
    byte range, `_atomic_write` renames last, and offsets re-derive from
    the files present — every failure mode re-runs into the identical
    segment or skips it.
    """
    import pyarrow.parquet as pq

    from .checkpoint import _atomic_write

    os.makedirs(spool_dir, exist_ok=True)
    start = spooled_offset(spool_dir)
    if not os.path.exists(journal_path):
        return {"rows": 0, "start": start, "end": start, "segment": None}
    with open(journal_path, "rb") as fh:
        fh.seek(start)
        data = fh.read()
    last_nl = data.rfind(b"\n")
    if last_nl < 0 or last_nl + 1 < min_bytes:
        return {"rows": 0, "start": start, "end": start, "segment": None}
    chunk = data[: last_nl + 1]
    end = start + len(chunk)
    table = (parse or _parse_event_lines)(chunk)
    seg = os.path.join(spool_dir, f"{SEG_PREFIX}{start:020d}_{end:020d}.parquet")
    _atomic_write(seg, lambda p: pq.write_table(table, p))
    return {"rows": table.num_rows, "start": start, "end": end, "segment": seg}


class SocketLineServer:
    """Unix-domain-socket line ingest (input_socket.go:41-114 analogue):
    accept loop + per-connection line scanner, appending complete lines to
    the journal under a lock.  Lines beyond ``max_line_bytes`` are dropped
    and counted (`stats()["oversized_dropped"]`) — the bounded version of
    the reference's grow-the-buffer-and-warn path, chosen because an
    unbounded line is an attack surface at a public ingest edge."""

    def __init__(self, sock_path: str, journal_path: str,
                 max_line_bytes: int = 32 << 20):
        self.sock_path = sock_path
        self.journal_path = journal_path
        self.max_line_bytes = max_line_bytes
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._listener: socket.socket | None = None
        self._lines = 0
        self._bytes = 0
        self._oversized = 0
        self._truncated = 0

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "SocketLineServer":
        if os.path.exists(self.sock_path):
            os.unlink(self.sock_path)
        os.makedirs(os.path.dirname(self.journal_path) or ".", exist_ok=True)
        self._listener = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._listener.bind(self.sock_path)
        self._listener.listen(8)
        self._listener.settimeout(0.2)  # the reference's 1s accept deadline
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        if self._listener is not None:
            self._listener.close()
        if os.path.exists(self.sock_path):
            os.unlink(self.sock_path)

    def __enter__(self) -> "SocketLineServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def stats(self) -> dict:
        with self._lock:
            return {
                "lines": self._lines,
                "bytes": self._bytes,
                "oversized_dropped": self._oversized,
                # fragments lost because a client closed without a trailing
                # newline — that newline can never arrive, so the bytes are
                # unrecoverable; counted so lossy producers are observable
                "truncated_dropped": self._truncated,
            }

    # -- internals -----------------------------------------------------------
    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._listener.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            t = threading.Thread(
                target=self._handle_conn, args=(conn,), daemon=True
            )
            t.start()
            # prune finished handlers so _threads stays O(live connections),
            # not O(connections ever accepted)
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _handle_conn(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        pending = bytearray()
        overflow = False  # inside an oversized line: discard until newline
        try:
            while not self._stop.is_set():
                try:
                    data = conn.recv(1 << 20)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not data:
                    break
                pending += data
                nl = pending.rfind(b"\n")
                if nl < 0:
                    if len(pending) > self.max_line_bytes:
                        overflow = True
                        pending.clear()
                    continue
                complete, rest = pending[: nl + 1], pending[nl + 1 :]
                self._append_lines(bytes(complete), overflow)
                overflow = False
                pending = bytearray(rest)
                if len(pending) > self.max_line_bytes:
                    overflow = True
                    pending.clear()
        finally:
            if pending and not overflow:
                # EOF with an unterminated fragment: its newline can never
                # arrive, so the bytes are dropped — but counted, because
                # a silently lossy edge is how producers ship bugs
                with self._lock:
                    self._truncated += 1
            conn.close()

    def _append_lines(self, complete: bytes, leading_overflow: bool) -> None:
        lines = complete.split(b"\n")[:-1]
        keep = []
        for i, ln in enumerate(lines):
            if (i == 0 and leading_overflow) or len(ln) > self.max_line_bytes:
                with self._lock:
                    self._oversized += 1
                continue
            keep.append(ln)
        if not keep:
            return
        blob = b"\n".join(keep) + b"\n"
        _append_journal(self.journal_path, blob)
        with self._lock:
            self._lines += len(keep)
            self._bytes += len(blob)


class RedisQueueDrainer:
    """RedisInput analogue — drain a Redis LIST of JSON events into the
    SAME durable journal :class:`SocketLineServer` appends to, so queue
    users inherit the ``cut_segments`` checkpoint/replay semantics for
    free (/root/reference/input/input_redis.go:28-327).

    Drain modes mirror the reference: pipelined ``MULTI`` + batch_size ×
    ``RPOP`` + ``EXEC`` (input_redis.go:63-136, the high-throughput path)
    or blocking ``BRPOP`` with a 1 s timeout (:138-161), with the same
    0.5 s back-off on an empty queue in :meth:`run`.  Elements are whole
    events (no partial-line reassembly — the queue frames them); an
    element that is oversized or carries an embedded newline would
    corrupt the journal's line framing, so it is dropped AND counted
    (``stats()['malformed_dropped']``), never silently.

    ``client`` is injectable (anything with the redis-py ``pipeline`` /
    ``rpop`` / ``brpop`` / ``llen`` surface — tests use an in-memory
    fake); when omitted, ``redis`` is imported lazily (optional
    dependency, absent in this container) and connected from ``url``.
    """

    def __init__(
        self,
        journal_path: str,
        client=None,
        url: str = "redis://localhost:6379/0",
        queue: str = "suricata",
        batch_size: int = 256,
        use_pipelining: bool = True,
        max_line_bytes: int = 32 << 20,
        backoff_s: float = 0.5,
    ):
        if client is None:
            try:
                import redis  # optional dependency
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "redis-py is not installed; pass client= (any object "
                    "with the redis-py pipeline/rpop/brpop surface) or "
                    "install redis"
                ) from e
            client = redis.Redis.from_url(url)
        self.client = client
        self.journal_path = journal_path
        self.queue = queue
        self.batch_size = batch_size
        self.use_pipelining = use_pipelining
        self.max_line_bytes = max_line_bytes
        self.backoff_s = backoff_s
        self._lock = threading.Lock()
        self._lines = 0
        self._bytes = 0
        self._malformed = 0

    @staticmethod
    def _as_bytes(v) -> bytes:
        return v if isinstance(v, (bytes, bytearray)) else str(v).encode()

    def _pop_batch(self) -> list[bytes]:
        if self.use_pipelining:
            p = self.client.pipeline(transaction=True)
            for _ in range(self.batch_size):
                p.rpop(self.queue)
            out = []
            for v in p.execute():
                if v is None:
                    # first nil means the queue drained mid-batch; the
                    # remaining replies are nil too (reference breaks at
                    # the first nil the same way, input_redis.go:121-128)
                    break
                out.append(self._as_bytes(v))
            return out
        r = self.client.brpop(self.queue, timeout=1)
        return [self._as_bytes(r[1])] if r else []

    def drain_once(self) -> int:
        """One pop batch → journal append.  Returns lines landed (0 =
        queue empty; caller decides whether to back off or stop)."""
        vals = self._pop_batch()
        if not vals:
            return 0
        keep = []
        for v in vals:
            v = bytes(v).strip(b"\n")
            if not v or len(v) > self.max_line_bytes or b"\n" in v:
                with self._lock:
                    self._malformed += 1
                continue
            keep.append(v)
        if keep:
            blob = b"\n".join(keep) + b"\n"
            os.makedirs(
                os.path.dirname(self.journal_path) or ".", exist_ok=True
            )
            _append_journal(self.journal_path, blob)
            with self._lock:
                self._lines += len(keep)
                self._bytes += len(blob)
        return len(keep)

    def drain_until_empty(self, max_batches: int | None = None) -> int:
        """Drain back-to-back batches until the queue reads empty (the
        per-poll shape for ``follow --redis-url``: land everything queued,
        then let the normal cut/build poll proceed)."""
        total = 0
        n = 0
        while True:
            got = self.drain_once()
            total += got
            n += 1
            if not got or (max_batches is not None and n >= max_batches):
                return total

    def run(self, stop: threading.Event | None = None,
            max_drains: int | None = None) -> int:
        """Reference-style loop: drain, back off ``backoff_s`` when the
        queue is empty, until ``stop`` is set (or ``max_drains`` pop
        batches for tests).  Returns total lines landed."""
        import time as _time

        total = 0
        drains = 0
        while not (stop is not None and stop.is_set()):
            got = self.drain_once()
            total += got
            drains += 1
            if max_drains is not None and drains >= max_drains:
                break
            if not got:
                # BRPOP already blocked for its timeout; the pipelined
                # path needs the explicit back-off (input_redis.go:19)
                if self.use_pipelining and self.backoff_s:
                    _time.sleep(self.backoff_s)
        return total

    def queue_length(self) -> int | None:
        """Best-effort LLEN (the reference's perf-stats counter,
        input_redis.go:196-227); None when the client can't answer."""
        try:
            return int(self.client.llen(self.queue))
        except Exception:
            return None

    def stats(self) -> dict:
        with self._lock:
            return {
                "lines": self._lines,
                "bytes": self._bytes,
                "malformed_dropped": self._malformed,
            }
