"""Live management control plane — the mgmt gRPC analogue.

fever exposes a gRPC service on a unix socket that mutates the Bloom
filter of a RUNNING process (/root/reference/mgmt/mgmtserver.go:96-160,
mgmt.proto:34-40): ``BloomAdd`` streams indicators into the live filter,
``BloomInfo`` reports its parameters, ``BloomSave`` persists it to the
artifact file, ``BloomReload`` replaces it from disk; a ``fever bloom
add/show/save/reload`` CLI speaks the protocol
(/root/reference/cmd/fever/cmds/bloom.go:24-69).

This module keeps those semantics over a dependency-free newline-JSON
protocol on a unix socket (no gRPC/protobuf in this stack — the wire is
different by design, the VERBS and state machine are the same):

* one JSON object per request line, one JSON response line per request;
* ``bloom_add`` streams: after the command line the client sends raw
  indicator lines terminated by an empty line (bufio.Scanner → stream.Send
  in the reference CLI), and the response carries ``added`` — the count
  mirror of MgmtBloomAddResponse;
* ``bloom_save`` writes the DCSO artifact ATOMICALLY (tmp+rename), which
  is precisely the handshake :func:`..pipelines.iocwatch.ioc_follow`
  watches: save → content hash flips → the follower matches all LATER
  shards against the new generation without rescanning history;
* ``bloom_reload`` re-reads the artifact, DISCARDING un-saved live adds
  (the reference semantics: reload replaces the in-memory filter).

Adds/save/reload serialize on one lock, so a client adding concurrently
with a reload never corrupts the filter — each add lands in whichever
generation is live when it acquires the lock.
"""

from __future__ import annotations

import json
import os
import socket
import socketserver
import threading
from typing import Iterable

from ..sketches.bloom import BloomFilter

__all__ = ["MgmtServer", "MgmtClient"]


class MgmtServer:
    """Unix-socket management server for a DCSO bloom artifact.

    ``state`` mirrors mgmtserver.go's State.BloomHandler: the live
    in-memory filter plus the artifact path it saves to / reloads from."""

    def __init__(self, bloom_path: str, socket_path: str,
                 compressed: bool = False):
        self.bloom_path = bloom_path
        self.socket_path = socket_path
        self.compressed = compressed
        self._bf = BloomFilter.load_with_fallback(bloom_path,
                                                  compressed=compressed)
        self._lock = threading.Lock()
        self._srv: socketserver.ThreadingUnixStreamServer | None = None
        self._thread: threading.Thread | None = None
        self.stats = {"adds": 0, "saves": 0, "reloads": 0, "requests": 0}

    # -- filter ops (the MgmtServiceServer verbs) --------------------------
    def bloom_info(self) -> dict:
        with self._lock:
            bf = self._bf
            return {
                "has_bloom": True,
                "capacity": bf.n,
                "elements": bf.N,
                "bits": bf.m,
                "hashfuncs": bf.k,
                "fpprob": bf.p,
                "fill_ratio": bf.fill_ratio,
            }

    def bloom_add(self, iocs: Iterable[str]) -> int:
        """Add a batch of indicators to the LIVE filter; lock held per
        batch so an interleaved reload takes effect between batches, never
        inside one (mgmtserver.go:118-140 adds per stream message)."""
        iocs = [i for i in iocs if i]
        if not iocs:
            return 0
        with self._lock:
            self._bf.add(iocs)
            self.stats["adds"] += len(iocs)
        return len(iocs)

    def bloom_save(self) -> None:
        """Persist the live filter to the artifact — atomic tmp+rename so
        a concurrent ioc_follow poll reads either the old or the new
        generation, never a torn file."""
        with self._lock:
            blob_bf = self._bf
            tmp = f"{self.bloom_path}.tmp.{os.getpid()}"
            blob_bf.save(tmp, compressed=self.compressed)
            os.replace(tmp, self.bloom_path)
            self.stats["saves"] += 1

    def bloom_reload(self) -> None:
        with self._lock:
            self._bf = BloomFilter.load_with_fallback(
                self.bloom_path, compressed=self.compressed
            )
            self.stats["reloads"] += 1

    def check(self, value: str) -> bool:
        """Live-filter membership (what the in-process matcher consults)."""
        with self._lock:
            return self._bf.check_one(value)

    # -- wire --------------------------------------------------------------
    def _handle_conn(self, rfile, wfile) -> None:
        for raw in rfile:
            line = raw.decode("utf-8", "replace").strip()
            if not line:
                continue
            self.stats["requests"] += 1
            try:
                req = json.loads(line)
                cmd = req.get("cmd")
                if cmd == "alive":
                    resp = {"echo": req.get("alive", "")}
                elif cmd == "bloom_info":
                    resp = self.bloom_info()
                elif cmd == "bloom_add":
                    if "iocs" in req:  # one-shot form
                        resp = {"added": self.bloom_add(req["iocs"])}
                    else:  # streamed form: raw lines until an empty line
                        added = 0
                        chunk: list[str] = []
                        for ioc_raw in rfile:
                            ioc = ioc_raw.decode("utf-8", "replace").rstrip("\r\n")
                            if ioc == "":
                                break
                            chunk.append(ioc)
                            if len(chunk) >= 512:  # vectorized adds, lock
                                added += self.bloom_add(chunk)  # per chunk
                                chunk = []
                        added += self.bloom_add(chunk)
                        resp = {"added": added}
                elif cmd == "bloom_save":
                    self.bloom_save()
                    resp = {}
                elif cmd == "bloom_reload":
                    self.bloom_reload()
                    resp = {}
                else:
                    resp = {"error": f"unknown cmd {cmd!r}"}
            except Exception as exc:  # malformed request: report, keep serving
                resp = {"error": str(exc)}
            wfile.write((json.dumps(resp) + "\n").encode())
            wfile.flush()

    def start(self) -> "MgmtServer":
        outer = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                outer._handle_conn(self.rfile, self.wfile)

        sock_dir = os.path.dirname(self.socket_path)
        if sock_dir:
            # mgmtserver.go:75 creates the socket dir (0750) on demand
            os.makedirs(sock_dir, mode=0o750, exist_ok=True)
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)

        class Server(socketserver.ThreadingMixIn,
                     socketserver.UnixStreamServer):
            daemon_threads = True
            allow_reuse_address = True

        self._srv = Server(self.socket_path, Handler)
        self._thread = threading.Thread(
            target=self._srv.serve_forever, kwargs={"poll_interval": 0.05},
            daemon=True,
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None
        if os.path.exists(self.socket_path):  # SetUnlinkOnClose(true)
            os.unlink(self.socket_path)

    def __enter__(self) -> "MgmtServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


class MgmtClient:
    """Line-JSON client for :class:`MgmtServer` — the `fever bloom`
    command-face (cmd/fever/cmds/bloom.go:24-69)."""

    def __init__(self, socket_path: str, timeout: float = 10.0):
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.settimeout(timeout)
        self._sock.connect(socket_path)
        self._rfile = self._sock.makefile("rb")

    def _send(self, obj: dict) -> None:
        self._sock.sendall((json.dumps(obj) + "\n").encode())

    def _recv(self) -> dict:
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("mgmt server closed the connection")
        resp = json.loads(line)
        if "error" in resp:
            raise RuntimeError(resp["error"])
        return resp

    def _call(self, obj: dict) -> dict:
        self._send(obj)
        return self._recv()

    def alive(self, s: str = "ping") -> str:
        return self._call({"cmd": "alive", "alive": s})["echo"]

    def bloom_info(self) -> dict:
        return self._call({"cmd": "bloom_info"})

    def bloom_add(self, iocs: Iterable[str]) -> int:
        """Stream indicators the way `fever bloom add` streams stdin lines
        (one per message), then close-and-receive the count."""
        self._send({"cmd": "bloom_add"})
        buf = []
        for ioc in iocs:
            ioc = str(ioc).strip()
            if ioc:
                buf.append(ioc + "\n")
            if len(buf) >= 1024:
                self._sock.sendall("".join(buf).encode())
                buf.clear()
        buf.append("\n")  # empty line = end of stream (CloseAndRecv)
        self._sock.sendall("".join(buf).encode())
        return self._recv()["added"]

    def bloom_save(self) -> None:
        self._call({"cmd": "bloom_save"})

    def bloom_reload(self) -> None:
        self._call({"cmd": "bloom_reload"})

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()

    def __enter__(self) -> "MgmtClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
