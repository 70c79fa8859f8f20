"""Cached enrichment (RDNS analog) and multi-route forwarding tests."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from fever_ray.ops.enrich import CachedEnricher, default_fake_resolver, enrich_rdns
from fever_ray.ops.forward import multi_forward


def test_cached_enricher_cache_and_gate():
    m = CachedEnricher(only_private=True)
    batch = pa.table({"ip": ["10.1.2.3", "8.8.8.8", "10.1.2.3", "192.168.0.1", None]})
    out = m(batch)
    got = out.column("rdns").to_pylist()
    assert got[0] == "host-10-1-2-3.internal.example"
    assert got[1] is None  # public IP gated out
    assert got[2] == got[0]
    assert got[3] == "host-192-168-0-1.internal.example"
    assert got[4] is None
    # second occurrence of 10.1.2.3 must be a cache hit; the gated public
    # IP never reaches the resolver at all
    assert m.hits == 1
    assert m.misses == 2


def test_enricher_resolver_failure_is_null():
    def boom(ip):
        raise RuntimeError("nope")

    m = CachedEnricher(resolver=boom)
    out = m(pa.table({"ip": ["1.2.3.4"]}))
    assert out.column("rdns").to_pylist() == [None]


def test_enrich_rdns_over_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"ip": f"10.0.0.{i % 8}"} for i in range(64)])
    out = enrich_rdns(ds, only_private=True).take_all()
    assert len(out) == 64
    assert all(r["rdns"].startswith("host-10-0-0-") for r in out)


def test_multi_forward_routes(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    routes = multi_forward(
        ds,
        {
            "alerts": ("error",),
            "commerce": ("purchase", "signup"),
            "everything": "all",
        },
        str(tmp_path / "fwd"),
    )
    n_all = ds.count()
    t_alerts = pq.read_table(routes["alerts"])
    t_commerce = pq.read_table(routes["commerce"])
    t_every = pq.read_table(routes["everything"])
    assert set(t_alerts.column("event_type").to_pylist()) == {"error"}
    assert set(t_commerce.column("event_type").to_pylist()) <= {"purchase", "signup"}
    assert t_every.num_rows == n_all
    assert t_alerts.num_rows + t_commerce.num_rows < n_all


def test_system_rdns_resolver_real_lookup(ray_session):
    """The REAL resolver path (socket.gethostbyaddr): loopback resolves
    via /etc/hosts even in a network-less sandbox; an address with no
    PTR record caches as a miss — the reference's failed-lookup cache
    entry (hostnamer_rdns.go:28-46)."""
    import pyarrow as pa

    from fever_ray.ops.enrich import CachedEnricher, system_rdns_resolver

    enr = CachedEnricher(
        ip_col="ip", out_col="rdns", resolver=system_rdns_resolver
    )
    out = enr(pa.table({"ip": ["127.0.0.1", "203.0.113.7", "127.0.0.1"]}))
    names = out.column("rdns").to_pylist()
    assert names[0] == names[2] == "localhost"
    assert names[1] is None
    # second 127.0.0.1 came from the TTL cache, and the miss is cached too
    assert enr.hits == 1 and enr.misses == 2
