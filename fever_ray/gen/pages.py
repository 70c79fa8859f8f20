"""Deterministic Common-Crawl-style web-page table generator (FIXTURES.md F1).

Schema fixed by BASELINE.json input_hint:
    url:string, warc_ts:timestamp[us,UTC], html:binary, text:large_string,
    lang:string

Properties engineered for the test suite:
* hostnames drawn Zipf-skewed from a bounded pool → CMS heavy-hitter and
  skewed-groupby fixtures; exact per-host counts recoverable.
* a controlled fraction of exact-duplicate urls (and texts) → dedup fixtures.
* html sizes lognormal → non-trivial t-digest/KLL byte-length quantiles.
* ``text`` is EXACTLY ``ops.extract.extract_text(html)`` (the pinned v1
  extractor); the generator asserts this invariant on a sample at build time.
* optional planted IoCs (hostnames and paths) for bloom-matcher fixtures,
  mirroring the reference's planted-positive test strategy
  (/root/reference/processing/bloom_handler_test.go:280-470).

Everything derives from one integer seed; no wall-clock anywhere.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ops.extract import extract_text

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cedar dune ember flint garnet harbor inlet "
    "jasper kelp lagoon mesa nectar onyx prairie quartz ridge summit tundra "
    "umber vale willow zenith arbor birch canyon delta2 estuary fjord glacier"
).split()

_LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "ja", "it", "nl", "pl", "tr"]
_TLDS = ["com", "org", "net", "io", "de", "fr"]

BASE_TS_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def _zipf_indices(rng: np.random.Generator, n: int, pool: int, s: float = 1.1) -> np.ndarray:
    """Zipf(s)-distributed indices in [0, pool) via inverse-CDF sampling."""
    ranks = np.arange(1, pool + 1, dtype=np.float64)
    probs = ranks**-s
    probs /= probs.sum()
    return rng.choice(pool, size=n, p=probs)


def build_html(title: str, paras: list[str]) -> bytes:
    """The page template; extract_text() of this is exactly
    ``title + "\\n" + "\\n".join(paras)``."""
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f'<html><head><title>{title}</title><meta charset="utf-8"/>'
        f"<script>var t={len(title)};</script>"
        f'<style>p {{margin: 0 auto;}}</style></head>'
        f"<body><!-- generated page -->{body}</body></html>"
    ).encode("utf-8")


def generate_pages(
    n_rows: int,
    seed: int = 42,
    n_hosts: int = 200,
    dup_frac: float = 0.05,
    ioc_hosts: tuple[str, ...] = (),
    ioc_paths: tuple[str, ...] = (),
    ioc_frac: float = 0.01,
    links_per_page: int = 0,
    vocab_size: int = 0,
) -> pa.Table:
    """Generate one deterministic page table.

    ``ioc_hosts`` pages get a planted hostname; ``ioc_paths`` pages get a
    planted path — both at rate ``ioc_frac`` (split among the indicators).

    ``links_per_page`` > 0 (opt-in; default output unchanged) appends
    row i % (links_per_page+1) empty-bodied anchors to each page, each
    targeting another page's url in the same corpus (deterministic index
    arithmetic) — empty anchor text keeps the pinned-extractor invariant
    byte-identical.

    ``vocab_size`` > 0 (opt-in; default output unchanged) switches word
    drawing from the 60-word uniform pool to a ``vocab_size``-token pool
    with Zipf(1.05)-weighted draws — the natural-text regime.  The tiny
    default vocabulary makes every text prefix collide, which defeats
    prefix blocking (SNM) by construction; this mode measures blocking
    designs under realistic sparsification instead of their worst case.
    """
    rng = np.random.default_rng(seed)
    w = np.array(_WORDS)
    if vocab_size:
        w = np.array(
            [
                _WORDS[i] if i < len(_WORDS)
                else f"{_WORDS[i % len(_WORDS)]}{i // len(_WORDS)}"
                for i in range(vocab_size)
            ],
            dtype=object,
        )
        ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
        p = ranks**-1.05
        cum = np.cumsum(p / p.sum())

        def wdraw(size):
            return np.minimum(
                np.searchsorted(cum, rng.random(size), side="right"),
                vocab_size - 1,
            )

    else:
        # EXACT historical RNG stream: every pre-existing cache/fixture
        # depends on these draws being byte-identical
        def wdraw(size):
            return rng.integers(0, len(w), size)

    # hostname pool, Zipf-ranked
    pool = np.array(
        [f"{w[i % len(w)]}{i}.{_TLDS[i % len(_TLDS)]}" for i in range(n_hosts)]
    )
    host_idx = _zipf_indices(rng, n_rows, n_hosts)
    # object dtype: fixed-width numpy strings would silently truncate
    # planted IoC values longer than the pool's itemsize
    hosts = pool[host_idx].astype(object)

    # paths
    pw1 = w[wdraw(n_rows)]
    pw2 = w[wdraw(n_rows)]
    pnum = rng.integers(0, 10000, n_rows)
    paths = np.array(
        [f"/{a}/{b}-{c}.html" for a, b, c in zip(pw1, pw2, pnum)], dtype=object
    )

    # plant IoCs
    n_ioc = int(n_rows * ioc_frac)
    if ioc_hosts and n_ioc:
        sel = rng.choice(n_rows, size=n_ioc, replace=False)
        hosts[sel] = np.array(ioc_hosts)[np.arange(n_ioc) % len(ioc_hosts)]
    if ioc_paths and n_ioc:
        sel = rng.choice(n_rows, size=n_ioc, replace=False)
        paths[sel] = np.array(ioc_paths)[np.arange(n_ioc) % len(ioc_paths)]

    urls = np.array([f"https://{h}{p}" for h, p in zip(hosts, paths)])

    # exact duplicates: overwrite a suffix fraction with earlier rows
    n_dup = int(n_rows * dup_frac)
    if n_dup:
        src = rng.integers(0, n_rows - n_dup, n_dup)
        urls[n_rows - n_dup :] = urls[src]
        hosts[n_rows - n_dup :] = hosts[src]

    # timestamps: base + lognormal skewed offsets (seconds)
    offs = rng.lognormal(mean=10.0, sigma=1.5, size=n_rows)
    ts = BASE_TS_US + (offs * 1e6).astype(np.int64)

    # languages: Zipf over the code list (en dominant)
    langs = np.array(_LANGS)[_zipf_indices(rng, n_rows, len(_LANGS), s=1.4)]

    # text bodies: lognormal paragraph counts/sizes
    n_paras = np.clip(rng.lognormal(1.2, 0.8, n_rows), 1, 60).astype(np.int64)
    titles = [f"{a} {b} {c}" for a, b, c in zip(pw1, pw2, hosts)]
    texts = []
    htmls = []
    # pre-draw a flat pool of paragraph word indices for speed
    for i in range(n_rows):
        k = int(n_paras[i])
        widx = wdraw((k, 12))
        paras = [" ".join(w[row]) for row in widx]
        texts.append(titles[i] + "\n" + "\n".join(paras))
        htmls.append(build_html(titles[i], paras))

    if links_per_page:
        # deterministic intra-corpus anchors: page i links to pages
        # (i*2654435761 + 97*j) % n_rows for j in 1..(i % (k+1)); inserted
        # before </body> with EMPTY inner text so extract_text(html) stays
        # byte-identical to `text` (the pinned invariant below still runs).
        # Applied BEFORE the dup copy so duplicate pages stay byte-copies.
        close = "</body></html>"
        for i in range(n_rows):
            k = i % (links_per_page + 1)
            if not k:
                continue
            tgt = (i * 2654435761 + 97 * np.arange(1, k + 1)) % n_rows
            anchors = "".join(f'<a href="{urls[t]}"></a>' for t in tgt)
            h = htmls[i].decode("utf-8")
            assert h.endswith(close)
            htmls[i] = (h[: -len(close)] + anchors + close).encode("utf-8")

    # duplicate texts/html for the dup suffix too (same page content)
    if n_dup:
        for j, s in enumerate(src):
            texts[n_rows - n_dup + j] = texts[s]
            htmls[n_rows - n_dup + j] = htmls[s]

    table = pa.table(
        {
            "url": pa.array(urls.tolist(), type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.large_string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        },
        schema=PAGES_SCHEMA,
    )

    # pinned-extractor invariant on a deterministic sample
    sample = table.slice(0, min(64, n_rows))
    extracted = extract_text(sample.column("html"))
    if extracted.cast(pa.large_string()).to_pylist() != sample.column("text").to_pylist():
        raise AssertionError("generator violated the pinned-extractor invariant")
    return table


def write_pages(
    out_dir: str,
    n_rows: int,
    n_files: int = 4,
    seed: int = 42,
    **kwargs,
) -> list[str]:
    """Write the table as ``n_files`` parquet shards (deterministic split).

    Returns the shard paths.  Shards have distinct seeds so partition-level
    merge tests see different data per file.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = n_rows // n_files
    for i in range(n_files):
        rows = per if i < n_files - 1 else n_rows - per * (n_files - 1)
        t = generate_pages(rows, seed=seed + 1000 * i, **kwargs)
        p = os.path.join(out_dir, f"pages-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


GEN_VERSION = "g1"  # bump when generator output changes → caches regenerate


def ensure_pages(
    out_dir: str, n_rows: int, n_files: int = 4, seed: int = 42, **kwargs
) -> str:
    """Idempotent cached generation (used by tests/bench/entry).

    The marker records the generator version and parameters; a mismatch
    (e.g. the generator changed between rounds) regenerates the corpus."""
    marker = os.path.join(out_dir, "_DONE")
    # links_per_page joins the stamp only when set so every pre-existing
    # cache (built from the links-free stamp format) stays valid
    lp = kwargs.get("links_per_page", 0)
    extra = f" links={lp}" if lp else ""
    vs = kwargs.get("vocab_size", 0)
    extra += f" vocab={vs}" if vs else ""
    stamp = f"version={GEN_VERSION} rows={n_rows} files={n_files} seed={seed}{extra}\n"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == stamp:
                return out_dir
        # stale cache from an older generator: rebuild
        for f in os.listdir(out_dir):
            os.remove(os.path.join(out_dir, f))
    write_pages(out_dir, n_rows, n_files=n_files, seed=seed, **kwargs)
    with open(marker, "w") as fh:
        fh.write(stamp)
    return out_dir
