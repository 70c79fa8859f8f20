"""Cache-backed enrichment — the RDNSHandler / HostNamerRDNS analog
(/root/reference/processing/rdns_handler.go:22-141, util/hostnamer_rdns.go:
14-51: enrich src/dst IPs with reverse-DNS names through a TTL cache, with
an optional private-range gate).

Ray Data form: an actor-pool stage whose per-actor TTL cache amortizes
lookups across batches.  The lookup function is pluggable; network lookups
don't exist in this sandbox, so the default resolver is a deterministic
pure function (clearly a stand-in — swap ``resolver`` for a real
``socket.gethostbyaddr`` wrapper in production).  The RFC1918 gate mirrors
the reference's ``only-private`` option (rdns_handler.go:39-58)."""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from .cidr import ipv4_to_uint32

_PRIVATE_RANGES = (
    (np.uint32(0x0A000000), np.uint32(0xFF000000)),  # 10/8
    (np.uint32(0xAC100000), np.uint32(0xFFF00000)),  # 172.16/12
    (np.uint32(0xC0A80000), np.uint32(0xFFFF0000)),  # 192.168/16
)


def default_fake_resolver(ip: str) -> str:
    """Deterministic stand-in for reverse DNS (no network in sandbox)."""
    return "host-" + ip.replace(".", "-") + ".internal.example"


def system_rdns_resolver(ip: str, timeout_s: float = 2.0) -> str:
    """REAL reverse DNS via the system resolver (``socket.gethostbyaddr``
    → /etc/hosts + configured nameservers) — the production counterpart
    of the reference's ``net.LookupAddr`` wrapper
    (util/hostnamer_rdns.go:28-46).  Raises on failure so
    ``CachedEnricher``'s except path caches the miss, exactly like the
    reference caches failed lookups.  Pass
    ``CachedEnricher(resolver=system_rdns_resolver)`` for live
    resolution; the deterministic fake stays the default because a
    network dependency must be opted into, never silently on.

    ``timeout_s`` is enforced by running the lookup on a worker thread
    with a real deadline: ``socket.setdefaulttimeout`` would only bound
    Python-created sockets, NOT the libc resolver behind
    ``gethostbyaddr`` (a dead nameserver would stall ~30 s regardless),
    and mutating process-global socket state races other threads.  On
    timeout the orphaned thread finishes in the background (daemon; the
    libc call cannot be cancelled) — the CALLER is unblocked, which is
    the property the actor pool needs."""
    import socket
    import threading

    box: list = []

    def work():
        try:
            box.append(socket.gethostbyaddr(ip))
        except Exception as e:  # surfaced to the caller below
            box.append(e)

    # daemon thread (not ThreadPoolExecutor: its workers are non-daemon
    # and atexit-joined, so a hung libc call would stall process exit)
    t = threading.Thread(target=work, daemon=True, name=f"rdns-{ip}")
    t.start()
    t.join(timeout_s)
    if not box:
        raise TimeoutError(f"rdns lookup for {ip} exceeded {timeout_s}s")
    if isinstance(box[0], Exception):
        raise box[0]
    return box[0][0]


class CachedEnricher:
    """Actor stage: per-actor TTL cache + vectorized private-range gate.

    Cache semantics mirror HostNamerRDNS: entries expire after ``ttl_s``;
    expired entries are re-resolved on next access."""

    def __init__(
        self,
        ip_col: str = "ip",
        out_col: str = "rdns",
        resolver=None,
        ttl_s: float = 300.0,
        only_private: bool = False,
    ):
        self.ip_col = ip_col
        self.out_col = out_col
        self.resolver = resolver or default_fake_resolver
        self.ttl_s = ttl_s
        self.only_private = only_private
        self.cache: dict[str, tuple[float, str]] = {}
        self.hits = 0
        self.misses = 0

    def _lookup(self, ip: str) -> str | None:
        now = time.monotonic()
        hit = self.cache.get(ip)
        if hit is not None and now - hit[0] < self.ttl_s:
            self.hits += 1
            return hit[1]
        self.misses += 1
        try:
            name = self.resolver(ip)
        except Exception:
            name = None
        self.cache[ip] = (now, name)
        return name

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.ip_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ips = col.to_pylist()
        if self.only_private:
            vals, valid = ipv4_to_uint32(col)
            gate = np.zeros(len(ips), dtype=bool)
            for base, mask in _PRIVATE_RANGES:
                gate |= valid & ((vals & mask) == base)
        else:
            gate = np.ones(len(ips), dtype=bool)
        out = [
            self._lookup(ip) if (g and ip) else None for ip, g in zip(ips, gate)
        ]
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def enrich_rdns(ds, ip_col="ip", resolver=None, only_private=False, concurrency=None):
    return ds.map_batches(
        CachedEnricher,
        fn_constructor_kwargs={
            "ip_col": ip_col,
            "resolver": resolver,
            "only_private": only_private,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
