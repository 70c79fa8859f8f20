"""End-to-end sketch-build over Ray Data: estimates vs exact oracles computed
with duckdb/pyarrow on the same parquet (FIXTURES.md F3), and equality with
the serially-built sketches (merge path correctness)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq
import pytest

from fever_ray.core.udaf import SketchSpec, build_sketches, finalize


@pytest.fixture(scope="module")
def pages_sketches(ray_session, pages_dir):
    import ray.data as rd
    import pyarrow.compute as pc

    ds = rd.read_parquet(pages_dir + "/")

    def derive(batch):
        batch = batch.append_column(
            "text_len", pc.cast(pc.utf8_length(batch.column("text")), "int64")
        )
        batch = batch.append_column(
            "html_len", pc.cast(pc.binary_length(batch.column("html")), "int64")
        )
        from fever_ray.ops.extract import hostname_of

        batch = batch.append_column("hostname", hostname_of(batch.column("url")))
        return batch

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    specs = [
        SketchSpec("hll_urls", "hll", "url", {"p": 14}),
        SketchSpec("hll_hosts", "hll", "hostname", {"p": 14}),
        SketchSpec("cms_hosts", "cms", "hostname", {"width": 2048, "depth": 5}, track=True),
        SketchSpec("cms_langs", "cms", "lang", {"width": 2048, "depth": 5}, track=True),
        SketchSpec("td_html_len", "tdigest", "html_len", {"delta": 100}, value_kind="float"),
        SketchSpec("kll_text_len", "kll", "text_len", {"k": 200}, value_kind="float"),
        SketchSpec("bloom_urls", "bloom", "url", {"n": 10000, "p": 1e-6}),
    ]
    sketches = build_sketches(ds, specs, batch_size=256)
    return sketches, specs


def _exact(pages_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pages AS SELECT * FROM parquet_scan('{pages_dir}/*.parquet')"
    )
    return con.execute(sql).fetchall()


def test_hll_estimates_within_bound(pages_sketches, pages_dir):
    sketches, _ = pages_sketches
    exact_urls = _exact(pages_dir, "SELECT COUNT(DISTINCT url) FROM pages")[0][0]
    exact_hosts = _exact(
        pages_dir,
        "SELECT COUNT(DISTINCT regexp_extract(url, '^[a-z]+://([^/:]+)', 1)) FROM pages",
    )[0][0]
    for name, exact in (("hll_urls", exact_urls), ("hll_hosts", exact_hosts)):
        est = sketches[name].estimate()
        bound = 3 * 1.04 / np.sqrt(sketches[name].m) * exact + 2
        assert abs(est - exact) <= bound, (name, est, exact)


def test_cms_counts_and_heavy_hitters(pages_sketches, pages_dir):
    sketches, _ = pages_sketches
    cms = sketches["cms_langs"]
    exact = dict(_exact(pages_dir, "SELECT lang, COUNT(*) FROM pages GROUP BY lang"))
    n = sum(exact.values())
    assert cms.total == n
    for lang, cnt in exact.items():
        est = cms.query_one(lang)
        assert est >= cnt
        assert est <= cnt + np.e / 2048 * n + 1
    # heaviest language recovered as top candidate
    top = cms.top_k(1)[0][0]
    assert top == max(exact, key=exact.get)


def test_quantile_sketches_within_rank_bound(pages_sketches, pages_dir):
    sketches, _ = pages_sketches
    rows = _exact(pages_dir, "SELECT octet_length(html), length(text) FROM pages")
    html_len = np.array([r[0] for r in rows], dtype=float)
    text_len = np.array([r[1] for r in rows], dtype=float)

    def max_rank_err(sk, data):
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        ds_sorted = np.sort(data)
        errs = []
        for q in qs:
            v = sk.quantile(q)
            r = np.searchsorted(ds_sorted, v, side="right") / len(ds_sorted)
            errs.append(abs(r - q))
        return max(errs)

    # discrete length columns have heavy ties, which inflate measured rank
    # error beyond the continuous-distribution bound; allow tie slack
    assert max_rank_err(sketches["td_html_len"], html_len) < 0.035
    assert max_rank_err(sketches["kll_text_len"], text_len) < 0.035


def test_bloom_built_distributed_has_no_false_negatives(pages_sketches, pages_dir):
    sketches, _ = pages_sketches
    bloom = sketches["bloom_urls"]
    urls = [r[0] for r in _exact(pages_dir, "SELECT DISTINCT url FROM pages")]
    assert bloom.check(urls).all()
    assert bloom.N == _exact(pages_dir, "SELECT COUNT(url) FROM pages")[0][0]


def test_distributed_equals_serial_for_mergeable_sketches(pages_sketches, pages_dir):
    """HLL/CMS are order-invariant: the Ray-built sketch must be bit-identical
    to a serial single-pass build over the same rows."""
    import glob

    from fever_ray.core.udaf import SketchSpec
    from fever_ray.sketches import CountMin, HyperLogLog

    sketches, _ = pages_sketches
    serial_hll = HyperLogLog.create(p=14)
    serial_cms = CountMin.create(width=2048, depth=5)
    for f in sorted(glob.glob(pages_dir + "/*.parquet")):
        t = pq.read_table(f, columns=["url", "lang"])
        serial_hll.update(t.column("url").combine_chunks())
        serial_cms.update(t.column("lang").combine_chunks(), track=True)
    assert np.array_equal(serial_hll.registers, sketches["hll_urls"].registers)
    assert np.array_equal(serial_cms.table, sketches["cms_langs"].table)
    assert serial_cms.total == sketches["cms_langs"].total


def test_finalize_summaries(pages_sketches):
    sketches, specs = pages_sketches
    for spec in specs:
        out = finalize(sketches[spec.name], spec)
        assert isinstance(out, dict) and out


def test_fd_via_build_sketches_meets_bound(ray_session):
    """kind='fd' + value_kind='vec': the distributed UDAF path (partials,
    salted two-phase merge) must satisfy the published FD guarantee over
    a list<float> embedding column, with nulls dropped."""
    import pyarrow as pa

    from fever_ray.core.udaf import SketchSpec, build_sketches

    rng = np.random.default_rng(29)
    A = rng.normal(size=(900, 24)) @ np.diag(
        np.concatenate([np.full(3, 6.0), np.full(21, 0.4)])
    )
    vecs = [row.tolist() for row in A] + [None] * 7
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(5)
    sk = build_sketches(
        ds,
        [SketchSpec("fd", "fd", "embedding", {"l": 8, "d": 24},
                    value_kind="vec")],
    )["fd"]
    A32 = A.astype(np.float32).astype(np.float64)  # storage roundtrip
    assert sk.fnorm_sq == pytest.approx(float((A32 * A32).sum()), rel=1e-9)
    ev = np.linalg.eigvalsh(A32.T @ A32 - sk.cov())
    assert ev.min() >= -1e-6 * sk.fnorm_sq
    assert ev.max() <= sk.error_bound()


def test_dcms_via_build_sketches_range_bound(ray_session):
    """kind='dcms' + value_kind='int': the distributed UDAF path (partials,
    salted two-phase merge) must keep the never-undercount + 2*bits*eps*n
    range guarantee, and equal the serial build bit-exactly (integer adds)."""
    import pyarrow as pa

    from fever_ray.core.udaf import SketchSpec, build_sketches
    from fever_ray.sketches.dcms import DyadicCountMin

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 1 << 12, 40000).astype(np.int64)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    ds = ray_session.data.from_arrow(t).repartition(6)
    spec = SketchSpec(
        "dcms_v", "dcms", "v", {"bits": 12, "width": 512, "depth": 4},
        value_kind="int",
    )
    sk = build_sketches(ds, [spec])["dcms_v"]

    serial = DyadicCountMin.create(bits=12, width=512, depth=4)
    serial.update(vals)
    assert sk.to_bytes() == serial.to_bytes()

    bound = 2 * 12 * (np.e / 512) * len(vals)
    for lo, hi in ((0, 100), (512, 1023), (100, 3900)):
        exact = int(((vals >= lo) & (vals <= hi)).sum())
        est = sk.range_count(lo, hi)
        assert exact <= est <= exact + bound
