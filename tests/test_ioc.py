"""Ports of fever's BloomHandler golden tests
(/root/reference/processing/bloom_handler_test.go) against our vectorized
IocMatcher: URL match priority (:593-863), blacklist suppression (:865-975),
planted positives with re-rolled negatives (:280-470), invalid DNS type
(:977-1014)."""

import numpy as np
import pyarrow as pa

from fever_ray.sketches.bloom import BloomFilter
from fever_ray.ops.ioc import IocMatcher, PageIocMatcher


def matcher(iocs, blacklist=(), n=100000, p=0.0000001, prefix="FOO BAR"):
    bf = BloomFilter.initialize(n, p)
    bf.add(list(iocs))
    return IocMatcher(bf.to_bytes(), blacklist=tuple(blacklist), alert_prefix=prefix)


def http_batch(rows):
    return pa.table(
        {
            "event_type": pa.array(["http"] * len(rows)),
            "http_host": pa.array([r[0] for r in rows]),
            "http_url": pa.array([r[1] for r in rows]),
            "http_method": pa.array(["GET"] * len(rows)),
        }
    )


E1 = ("foo.bar.de", "http://foo.bar.de/oddlyspecific")  # full URL in url field
E2 = ("foo.bar.de", "/oddlyspecific")  # bare path
E3 = ("foo.bar.com", "/oddlyspecific")  # different host


def n_alerts(m, rows):
    return m(http_batch(rows)).num_rows


def test_url_priority_e1_full_url_field():
    # bloom_handler_test.go:700-760 — e1 expectations
    assert n_alerts(matcher(["/oddlyspecific"]), [E1]) == 1
    assert n_alerts(matcher(["foo.bar.de/oddlyspecific"]), [E1]) == 1
    assert n_alerts(matcher(["http://foo.bar.de/oddlyspecific"]), [E1]) == 1
    assert n_alerts(matcher(["https://foo.bar.de/oddlyspecific"]), [E1]) == 0
    assert n_alerts(matcher(["https://foo.bar.com/oddlyspecific"]), [E1]) == 0
    assert n_alerts(matcher(["/"]), [E1]) == 0


def test_url_priority_e2_bare_path():
    assert n_alerts(matcher(["/oddlyspecific"]), [E2]) == 1
    assert n_alerts(matcher(["foo.bar.de/oddlyspecific"]), [E2]) == 1
    assert n_alerts(matcher(["http://foo.bar.de/oddlyspecific"]), [E2]) == 1
    assert n_alerts(matcher(["https://foo.bar.de/oddlyspecific"]), [E2]) == 0
    assert n_alerts(matcher(["https://foo.bar.com/oddlyspecific"]), [E2]) == 0
    assert n_alerts(matcher(["/"]), [E2]) == 0


def test_url_priority_e3_other_host():
    assert n_alerts(matcher(["/oddlyspecific"]), [E3]) == 1
    assert n_alerts(matcher(["foo.bar.de/oddlyspecific"]), [E3]) == 0
    assert n_alerts(matcher(["http://foo.bar.de/oddlyspecific"]), [E3]) == 0
    assert n_alerts(matcher(["https://foo.bar.de/oddlyspecific"]), [E3]) == 0
    assert n_alerts(matcher(["https://foo.bar.com/oddlyspecific"]), [E3]) == 0
    assert n_alerts(matcher(["/"]), [E3]) == 0


def test_priority_order_single_url_alert():
    """All three candidates in the filter → exactly one http-url alert, for
    the highest-priority candidate (fullURL)."""
    m = matcher(
        ["http://foo.bar.de/oddlyspecific", "foo.bar.de/oddlyspecific", "/oddlyspecific"]
    )
    out = m(http_batch([E1]))
    assert out.num_rows == 1
    assert out.column("ioc")[0].as_py() == "http://foo.bar.de/oddlyspecific"
    assert out.column("match_type")[0].as_py() == "http-url"


def test_host_match_is_independent_of_url_match():
    m = matcher(["foo.bar.de", "/oddlyspecific"])
    out = m(http_batch([E1]))
    assert out.num_rows == 2
    got = {(r["match_type"], r["ioc"]) for r in out.to_pylist()}
    assert got == {("http-host", "foo.bar.de"), ("http-url", "/oddlyspecific")}


def test_blacklist_suppression():
    # bloom_handler_test.go:865-975: filter has '/oddlyspecific' and '/',
    # blacklist ['/'] — e1 alerts once, url='/' page never alerts
    m = matcher(["/oddlyspecific", "/"], blacklist=["/"], n=1000, p=0.0001)
    assert n_alerts(m, [E1]) == 1
    assert n_alerts(m, [("foo.bar.de", "/")]) == 0
    assert n_alerts(m, [E1]) == 1  # repeatable


def test_blacklisted_winner_does_not_fall_through():
    """fullURL in filter AND blacklisted → alert suppressed AND lower-priority
    candidates are NOT consulted (else-if semantics, bloom_handler.go:199-235)."""
    m = matcher(
        ["http://foo.bar.de/oddlyspecific", "/oddlyspecific"],
        blacklist=["http://foo.bar.de/oddlyspecific"],
    )
    assert n_alerts(m, [E1]) == 0


def test_alert_signatures_match_reference_templates():
    m = matcher(["foo.bar.de"], prefix="FOO BAR")
    out = m(http_batch([E1]))
    row = out.to_pylist()[0]
    assert row["signature"] == "FOO BAR Possibly bad HTTP host: foo.bar.de"
    assert row["category"] == "Potentially Bad Traffic"
    assert row["action"] == "allowed"

    m2 = matcher(["/oddlyspecific"])
    row2 = m2(http_batch([E2])).to_pylist()[0]
    assert (
        row2["signature"]
        == "FOO BAR Possibly bad HTTP URL: GET | foo.bar.de | /oddlyspecific"
    )


def dns_batch(rows):
    return pa.table(
        {
            "event_type": pa.array(["dns"] * len(rows)),
            "dns_rrname": pa.array([r[0] for r in rows]),
            "dns_type": pa.array([r[1] for r in rows]),
        }
    )


def test_dns_req_resp_and_invalid_type():
    m = matcher(["evil.domain"])
    out = m(dns_batch([("evil.domain", "query"), ("evil.domain", "answer"), ("evil.domain", "foobar"), ("ok.domain", "query")]))
    got = [(r["match_type"], r["ioc"]) for r in out.to_pylist()]
    assert got == [("dns-req", "evil.domain"), ("dns-resp", "evil.domain")]
    sigs = [r["signature"] for r in out.to_pylist()]
    assert sigs[0] == "FOO BAR Possibly bad DNS lookup to evil.domain"
    assert sigs[1] == "FOO BAR Possibly bad DNS response for evil.domain"


def tls_batch(rows):
    return pa.table(
        {
            "event_type": pa.array(["tls"] * len(rows)),
            "tls_sni": pa.array([r[0] for r in rows]),
            "tls_fingerprint": pa.array([r[1] for r in rows]),
        }
    )


def test_tls_sni_else_fingerprint():
    m = matcher(["bad.sni", "aa:bb:cc"])
    out = m(tls_batch([("bad.sni", "aa:bb:cc"), ("ok.sni", "aa:bb:cc"), ("ok.sni", "dd:ee")]))
    got = [(r["match_type"], r["ioc"]) for r in out.to_pylist()]
    # row 0: SNI wins (else-if), fingerprint NOT also alerted
    assert got == [("tls-sni", "bad.sni"), ("tls-fingerprint", "aa:bb:cc")]


def test_planted_positives_rerolled_negatives():
    """Port of the randomized strategy (bloom_handler_test.go:280-470):
    every planted indicator alerts at least once; negatives are re-rolled
    against the filter so FPs cannot break the assertion."""
    rng = np.random.default_rng(21)
    planted_hosts = [f"evil{i}.example.com" for i in range(50)]
    planted_paths = [f"/malware-{i}" for i in range(50)]
    bf = BloomFilter.initialize(100000, 0.0000001)
    bf.add(planted_hosts)
    bf.add(planted_paths)
    m = IocMatcher(bf.to_bytes(), alert_prefix="FOO BAR")

    def reroll():
        while True:
            cand = f"benign{rng.integers(0, 10**9)}.example.org"
            if not bf.check_one(cand) and not bf.check_one(f"http://{cand}/ok") and not bf.check_one(f"{cand}/ok") and not bf.check_one("/ok"):
                return cand

    rows = []
    for h in planted_hosts:
        rows.append((h, "/ok"))
    for p in planted_paths:
        rows.append((reroll(), p))
    for _ in range(100):
        rows.append((reroll(), "/ok"))
    out = m(http_batch(rows))
    iocs = set(out.column("ioc").to_pylist())
    for h in planted_hosts:
        assert h in iocs
    for p in planted_paths:
        assert p in iocs
    # negatives: no alert rows beyond the planted ones
    assert out.num_rows == len(planted_hosts) + len(planted_paths)


def test_page_ioc_matcher_over_pages():
    from fever_ray.gen.pages import generate_pages

    t = generate_pages(
        2000,
        seed=3,
        ioc_hosts=("evil0.example.com",),
        ioc_paths=("/oddlyspecific/implant.html",),
        ioc_frac=0.02,
    )
    bf = BloomFilter.initialize(100000, 0.0000001)
    bf.add(["evil0.example.com", "/oddlyspecific/implant.html"])
    m = PageIocMatcher(bf.to_bytes(), alert_prefix="BLF")
    out = m(t)
    mts = set(zip(out.column("match_type").to_pylist(), out.column("ioc").to_pylist()))
    assert ("http-host", "evil0.example.com") in mts
    assert ("http-url", "/oddlyspecific/implant.html") in mts
    # every alerted url row really carries the ioc
    for r in out.to_pylist():
        if r["match_type"] == "http-host":
            assert "evil0.example.com" in r["url"]
        else:
            assert "/oddlyspecific/implant.html" in r["url"]


def test_empty_and_degenerate_filter():
    bf = BloomFilter.empty_default()
    m = IocMatcher(bf.to_bytes())
    assert m(http_batch([E1, E2, E3])).num_rows == 0
