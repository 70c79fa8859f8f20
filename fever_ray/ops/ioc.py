"""Bloom/IoC matcher — a Ray Data actor-pool stage reproducing the match
semantics of the reference's BloomHandler
(/root/reference/processing/bloom_handler.go:165-289) in vectorized form.

Semantics pinned by the reference's golden tests (bloom_handler_test.go:
593-863 URL priority, :865-975 blacklist suppression, :280-470 planted
positives / re-rolled negatives):

* http events — two independent checks:
    1. host check: HTTPHost in filter → one "http-host" alert;
    2. url check, *else-if priority*: synthesize fullURL (use the url field
       verbatim when it contains "://", else "http://"+host+url), then test
       fullURL → host+path → path; ONLY the first member of the filter wins
       (match selection ignores the blacklist — a blacklisted winner
       suppresses the alert and does NOT fall through).
* dns events — rrname in filter → "dns-req" when type=="query",
  "dns-resp" when type=="answer", any other type → no alert (logged).
* tls events — sni in filter → "tls-sni", ELSE fingerprint in filter →
  "tls-fingerprint".
* blacklisted IoCs never alert (applies per candidate string).

Alert synthesis mirrors util/alertifier_providers.go:13-73 signature
templates and the default "Potentially Bad Traffic"/"allowed" fields.

The matcher is a callable class: pass it to
``ds.map_batches(IocMatcher, fn_constructor_kwargs=..., concurrency=N,
batch_format="pyarrow")`` — the filter bytes are deserialized ONCE per actor
in ``__init__`` (broadcast small side; no shuffle), and every batch is a
vectorized membership test.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.bloom import BloomFilter
from .extract import split_url, synthesize_full_url

# signature templates — util/alertifier_providers.go
SIGNATURES = {
    "http-url": "%s Possibly bad HTTP URL: %s",
    "http-host": "%s Possibly bad HTTP host: %s",
    "dns-req": "%s Possibly bad DNS lookup to %s",
    "dns-resp": "%s Possibly bad DNS response for %s",
    "tls-sni": "%s Possibly bad TLS SNI: %s",
    "tls-fingerprint": "%s Possibly bad TLS Fingerprint: %s",
}
ALERT_CATEGORY = "Potentially Bad Traffic"
ALERT_ACTION = "allowed"
DEFAULT_ALERT_PREFIX = "BLF"  # fever's --bloom-alert-prefix default (run.go)

MATCH_SCHEMA = pa.schema(
    [
        ("row_index", pa.int64()),
        ("ioc", pa.string()),
        ("match_type", pa.string()),
        ("signature", pa.string()),
        ("category", pa.string()),
        ("action", pa.string()),
    ]
)


class IocMatcher:
    """Vectorized IoC matcher over batches of http/dns/tls-shaped records."""

    def __init__(
        self,
        bloom_bytes: bytes,
        blacklist: tuple[str, ...] = (),
        alert_prefix: str = DEFAULT_ALERT_PREFIX,
    ) -> None:
        self.bloom = BloomFilter.from_bytes(bloom_bytes)
        self.blacklist = frozenset(blacklist)
        self.prefix = alert_prefix

    # ---------------------------------------------------------------- util
    def _check(self, arr: pa.Array) -> np.ndarray:
        """Membership mask; null/empty rows never match (empty string could
        be a legitimate filter member in theory, but fever never inserts it)."""
        mask = self.bloom.check(arr)
        valid = pc.fill_null(pc.utf8_length(pc.fill_null(arr, "")), 0).to_numpy(
            zero_copy_only=False
        ) > 0
        return mask & valid

    def _not_blacklisted(self, arr: pa.Array, mask: np.ndarray) -> np.ndarray:
        if not self.blacklist or not mask.any():
            return mask
        vals = arr.to_pylist()
        bl = np.fromiter(
            ((vals[i] in self.blacklist) if mask[i] else False for i in range(len(vals))),
            dtype=bool,
            count=len(vals),
        )
        return mask & ~bl

    # ------------------------------------------------------------- matchers
    def match_http(
        self, host, url, method=None
    ) -> tuple[np.ndarray, list[tuple[int, str, str]]]:
        """Returns (any_match_mask, [(row, ioc, match_type), ...])."""
        host = _arr(host)
        url = _arr(url)
        n = len(host)
        out: list[tuple[int, str, str]] = []

        # 1. independent host check (bloom_handler.go:170-180)
        host_hit = self._not_blacklisted(host, self._check(host))
        for i in np.nonzero(host_hit)[0]:
            out.append((int(i), host[int(i)].as_py(), "http-host"))

        # 2. URL priority chain (bloom_handler.go:184-235)
        full = synthesize_full_url(host, url)
        parts = split_url(full)
        host_path = pc.binary_join_element_wise(
            pc.fill_null(parts["host"], ""), pc.fill_null(parts["path"], ""), ""
        )
        path = parts["path"]
        parse_ok = pc.is_valid(parts["host"]).to_numpy(zero_copy_only=False)

        m_full = self._check(full) & parse_ok
        m_hostpath = self._check(host_path) & parse_ok & ~m_full
        m_path = self._check(pc.fill_null(path, "")) & parse_ok & ~m_full & ~m_hostpath

        # winner selection is blacklist-agnostic; suppression happens after
        for cand, mask in ((full, m_full), (host_path, m_hostpath), (path, m_path)):
            eff = self._not_blacklisted(cand, mask)
            for i in np.nonzero(eff)[0]:
                out.append((int(i), cand[int(i)].as_py(), "http-url"))

        any_mask = np.zeros(n, dtype=bool)
        for i, _, _ in out:
            any_mask[i] = True
        return any_mask, out

    def match_dns(self, rrname, dns_type) -> tuple[np.ndarray, list[tuple[int, str, str]]]:
        rrname = _arr(rrname)
        dns_type = _arr(dns_type)
        hit = self._not_blacklisted(rrname, self._check(rrname))
        ty = dns_type.to_pylist()
        out = []
        for i in np.nonzero(hit)[0]:
            i = int(i)
            if ty[i] == "query":
                out.append((i, rrname[i].as_py(), "dns-req"))
            elif ty[i] == "answer":
                out.append((i, rrname[i].as_py(), "dns-resp"))
            # invalid DNS type → no alert (bloom_handler.go:257-261)
        mask = np.zeros(len(rrname), dtype=bool)
        for i, _, _ in out:
            mask[i] = True
        return mask, out

    def match_tls(self, sni, fingerprint) -> tuple[np.ndarray, list[tuple[int, str, str]]]:
        sni = _arr(sni)
        fingerprint = _arr(fingerprint)
        m_sni = self._check(sni)
        m_fp = self._check(fingerprint) & ~m_sni  # else-if: SNI wins
        out = []
        for i in np.nonzero(self._not_blacklisted(sni, m_sni))[0]:
            out.append((int(i), sni[int(i)].as_py(), "tls-sni"))
        for i in np.nonzero(self._not_blacklisted(fingerprint, m_fp))[0]:
            out.append((int(i), fingerprint[int(i)].as_py(), "tls-fingerprint"))
        mask = np.zeros(len(sni), dtype=bool)
        for i, _, _ in out:
            mask[i] = True
        return mask, out

    # ----------------------------------------------------------- batch entry
    def __call__(self, batch: pa.Table) -> pa.Table:
        """Event-table dispatch: one output row per alert, carrying all input
        columns of the matched row plus ioc/match_type/signature columns.

        Expects an ``event_type`` column plus the per-type field columns
        (http_host, http_url, http_method, dns_rrname, dns_type, tls_sni,
        tls_fingerprint) — fever's Entry projection re-expressed columnar.
        """
        et = batch.column("event_type").to_pylist() if "event_type" in batch.column_names else None
        matches: list[tuple[int, str, str]] = []

        def col(name):
            if name in batch.column_names:
                c = batch.column(name)
                return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return pa.array([""] * batch.num_rows, type=pa.string())

        if et is None or any(t == "http" for t in et):
            _, ms = self.match_http(col("http_host"), col("http_url"))
            matches += [m for m in ms if et is None or et[m[0]] == "http"]
        if et is not None and any(t == "dns" for t in et):
            _, ms = self.match_dns(col("dns_rrname"), col("dns_type"))
            matches += [m for m in ms if et[m[0]] == "dns"]
        if et is not None and any(t == "tls" for t in et):
            _, ms = self.match_tls(col("tls_sni"), col("tls_fingerprint"))
            matches += [m for m in ms if et[m[0]] == "tls"]

        matches.sort()
        rows = [m[0] for m in matches]
        sub = batch.take(pa.array(rows, type=pa.int64()))
        iocs = [m[1] for m in matches]
        mtypes = [m[2] for m in matches]
        sigs = []
        method = col("http_method").to_pylist()
        hosts = col("http_host").to_pylist()
        urls = col("http_url").to_pylist()
        for (i, ioc, mt) in matches:
            if mt == "http-url":
                # provider formats "{method} | {host} | {url}" as the value
                val = f"{method[i]} | {hosts[i]} | {urls[i]}"
            else:
                val = ioc
            sigs.append(SIGNATURES[mt] % (self.prefix, val))
        sub = sub.append_column("ioc", pa.array(iocs, type=pa.string()))
        sub = sub.append_column("match_type", pa.array(mtypes, type=pa.string()))
        sub = sub.append_column("signature", pa.array(sigs, type=pa.string()))
        sub = sub.append_column(
            "category", pa.array([ALERT_CATEGORY] * len(rows), type=pa.string())
        )
        sub = sub.append_column(
            "action", pa.array([ALERT_ACTION] * len(rows), type=pa.string())
        )
        return sub


class PageIocMatcher(IocMatcher):
    """IoC matching over the web-page table: each page acts as one http-shaped
    record with host = hostname(url) and url = path part — the engine's
    flagship stateful actor stage.

    Output: one row per (page, alert) with url, ioc, match_type, signature.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        url = batch.column("url")
        url = url.combine_chunks() if isinstance(url, pa.ChunkedArray) else url
        parts = split_url(url)
        host = pc.replace_substring_regex(
            pc.fill_null(parts["host"], ""), pattern=r":[0-9]+$", replacement=""
        )
        # path+query acts as the HTTPUrl field: reconstruct it from the url
        tail = pc.replace_substring_regex(
            url.cast(pa.string()), pattern=_SCHEME_HOST_RE, replacement=""
        )
        tail = pc.if_else(pc.equal(tail, ""), pa.scalar("/"), tail)
        _, matches = self.match_http(host, tail)
        rows = pa.array([m[0] for m in matches], type=pa.int64())
        out = pa.table(
            {
                "url": url.take(rows),
                "ioc": pa.array([m[1] for m in matches], type=pa.string()),
                "match_type": pa.array([m[2] for m in matches], type=pa.string()),
                "signature": pa.array(
                    [
                        SIGNATURES[m[2]]
                        % (self.prefix, m[1] if m[2] == "http-host" else f"GET | {host[m[0]].as_py()} | {tail[m[0]].as_py()}")
                        for m in matches
                    ],
                    type=pa.string(),
                ),
            }
        )
        return out


_SCHEME_HOST_RE = r"^[^:/?#]+://[^/?#]*"

# process-level matcher cache for the stateless-task path: Ray worker
# processes are reused across tasks, so the filter is deserialized once per
# process (same amortization as an actor pool, none of the pool startup)
_MATCHER_CACHE: dict = {}


def make_page_ioc_fn(bloom_bytes: bytes, blacklist: tuple = (), alert_prefix: str = DEFAULT_ALERT_PREFIX):
    """Stateless map_batches fn for page IoC matching.

    The filter bytes ride the object store ONCE (ray.put) and each worker
    process builds the matcher on first touch.  Prefer this over the actor
    pool when runs are short-lived (no pool spin-up) — semantics identical.
    """
    import hashlib

    import ray

    blob_ref = ray.put(bloom_bytes)
    # key the per-process cache on CONTENT, not the ObjectRef: a fresh ref
    # per invocation would add one deserialized filter per call to every
    # worker process, never evicted
    cache_key = (
        hashlib.sha1(bloom_bytes).hexdigest(), tuple(blacklist), alert_prefix
    )

    def match_pages(batch: pa.Table) -> pa.Table:
        m = _MATCHER_CACHE.get(cache_key)
        if m is None:
            m = PageIocMatcher(
                ray.get(blob_ref), blacklist=tuple(blacklist), alert_prefix=alert_prefix
            )
            _MATCHER_CACHE[cache_key] = m
        return m(batch)

    return match_pages


def make_bloom_selector_fn(bloom_bytes: bytes, column: str = "hostname"):
    """Bloom-selector FILTER (the reference's flow-extractor gate,
    /root/reference/processing/flow_extractor.go:93-97: keep a record iff a
    key field is in the filter) — a bloom-accelerated semi-join that passes
    whole rows through.  Stateless tasks + per-process filter cache."""
    import ray

    blob_ref = ray.put(bloom_bytes)
    cache_key = ("selector", blob_ref.hex(), column)

    def select(batch: pa.Table) -> pa.Table:
        bloom = _MATCHER_CACHE.get(cache_key)
        if bloom is None:
            from ..sketches.bloom import BloomFilter as _BF

            bloom = _BF.from_bytes(ray.get(blob_ref))
            _MATCHER_CACHE[cache_key] = bloom
        col = batch.column(column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mask = bloom.check(pc.fill_null(col, ""))
        return batch.filter(pa.array(mask))

    return select


def _arr(x) -> pa.Array:
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if not isinstance(x, pa.Array):
        return pa.array(x, type=pa.string())
    if pa.types.is_null(x.type):
        # all-null columns infer as null type; treat as null strings
        return pa.nulls(len(x), pa.string())
    return x
