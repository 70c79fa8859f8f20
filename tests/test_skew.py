"""Skew handling: Zipf-hot group keys through the salted two-phase grouped
build — the hot key's merge work is split across salt sub-groups and the
final per-key results still match exact oracles."""

import duckdb
import numpy as np

from fever_ray.core.grouped import grouped_build, grouped_estimates, make_grouped_partials_fn
from fever_ray.core.udaf import SketchSpec
from fever_ray.ops.extract import hostname_of


def _with_hostname(batch):
    # NB: defined at module level for the direct (non-Ray) test below; Ray
    # stages use the lambda wrapper so the function serializes by value
    return batch.append_column("hostname", hostname_of(batch.column("url")))


def _hostname_stage(ds):
    from fever_ray.ops.extract import hostname_of as _hof

    return ds.map_batches(
        lambda b: b.append_column("hostname", _hof(b.column("url"))),
        batch_format="pyarrow",
    )


def test_per_hostname_grouped_hll_zipf(ray_session, pages_dir):
    """~200 Zipf-ranked hostnames (generator pool): per-host distinct-URL
    HLL estimates match exact counts within 3σ, including the hot head."""
    import ray.data as rd

    ds = _hostname_stage(rd.read_parquet(pages_dir + "/", columns=["url"]))
    spec = SketchSpec("hll_urls_per_host", "hll", "url", {"p": 12})
    out = grouped_estimates(ds, "hostname", spec, batch_size=128, fanout=8)
    got = dict(zip(out.column("key").to_pylist(), out.column("estimate").to_pylist()))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pages AS SELECT * FROM parquet_scan('{pages_dir}/*.parquet')"
    )
    exact = dict(
        con.execute(
            "SELECT regexp_extract(url, '^[a-z]+://([^/:]+)', 1) AS h, "
            "COUNT(DISTINCT url) FROM pages GROUP BY h"
        ).fetchall()
    )
    assert set(got) == set(exact)
    bound = 3 * 1.04 / np.sqrt(1 << 12)
    for host, cnt in exact.items():
        assert abs(got[host] - cnt) <= bound * cnt + 2, (host, got[host], cnt)
    # the head of the Zipf really is hot (sanity that skew exists)
    counts = sorted(exact.values(), reverse=True)
    assert counts[0] >= 10 * counts[len(counts) // 2]


def test_salt_splits_hot_key(ray_session, pages_dir):
    """Phase-1 groups are (key, salt): the hot key's partials must land in
    multiple salt buckets, bounding any single merge group."""
    import pyarrow.parquet as pq

    spec = SketchSpec("hll", "hll", "url", {"p": 10})
    fn = make_grouped_partials_fn(spec, "hostname", fanout=8)
    t = _with_hostname(pq.read_table(sorted(__import__("glob").glob(pages_dir + "/*.parquet"))[0]))
    # simulate many small batches (what map_batches does with batch_size)
    salts_by_key = {}
    for start in range(0, t.num_rows, 64):
        out = fn(t.slice(start, 64))
        for k, s in zip(out.column("key").to_pylist(), out.column("salt").to_pylist()):
            salts_by_key.setdefault(k, set()).add(s)
    hot = max(salts_by_key, key=lambda k: len(salts_by_key[k]))
    assert len(salts_by_key[hot]) >= 3  # hot key spread over several buckets


def test_grouped_build_rows_match_groupby_oracle(ray_session, pages_dir):
    import ray.data as rd
    import duckdb

    ds = _hostname_stage(rd.read_parquet(pages_dir + "/", columns=["url"]))
    spec = SketchSpec("hll", "hll", "url", {"p": 10})
    merged = grouped_build(ds, "hostname", spec, batch_size=128)
    rows = {r["key"]: r["rows"] for r in merged.take_all()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW pages AS SELECT * FROM parquet_scan('{pages_dir}/*.parquet')"
    )
    exact = dict(
        con.execute(
            "SELECT regexp_extract(url, '^[a-z]+://([^/:]+)', 1), COUNT(*) "
            "FROM pages GROUP BY 1"
        ).fetchall()
    )
    assert rows == exact
