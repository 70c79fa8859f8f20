"""Operator-level tests: aggregates vs duckdb oracles on the driver tables,
CIDR matching, alertify, textstats, multimodal stubs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import fever_ray.ops.aggregates as agg
from fever_ray.ops.alertify import ExactMatcher, alertify
from fever_ray.ops.cidr import CidrMatcher, cidr_match, ipv4_to_uint32
from fever_ray.ops.multimodal import (
    DecodeImageStub,
    FrameSampleStub,
    _fake_decode,
    decode_images,
)
from fever_ray.ops.textstats import LangId, fingerprint, quality_score, token_stats


def _duck(sf_dir, sql):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchall()


@pytest.fixture(scope="module")
def events_ds(ray_session, sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet")


def test_event_profiler(events_ds, sf_dir):
    out = {r["event_type"]: r for r in agg.event_profiler(events_ds).take_all()}
    exact = _duck(
        sf_dir,
        "SELECT event_type, COUNT(*), SUM(strlen(props)) FROM events GROUP BY event_type",
    )
    for et, n, sb in exact:
        assert out[et]["n_events"] == n
        assert out[et]["sum_bytes"] == sb


def test_flow_aggregator(events_ds, sf_dir):
    rows = agg.flow_aggregator(events_ds).take_all()
    got = {(r["user_id"], r["event_type"]): r for r in rows}
    exact = _duck(
        sf_dir,
        "SELECT user_id, event_type, SUM(value), COUNT(*), MIN(ts) FROM events GROUP BY 1,2",
    )
    assert len(got) == len(exact)
    for uid, et, sv, n, mts in exact:
        r = got[(uid, et)]
        assert abs(r["sum_value"] - sv) < 1e-6
        assert r["n"] == n
        assert r["first_ts"] == mts


def test_unicorn_flow_report(events_ds, sf_dir):
    rows = agg.unicorn_flow_report(events_ds).take_all()
    got = {r["user_id"]: r for r in rows}
    exact = _duck(
        sf_dir,
        "SELECT user_id, COUNT(*), SUM(value) FROM events "
        "WHERE event_type='purchase' AND value>0 GROUP BY user_id",
    )
    assert len(got) == len(exact)
    for uid, n, sv in exact:
        assert got[uid]["n_flows"] == n
        assert abs(got[uid]["total_value"] - sv) < 1e-6


def test_dns_aggregator_distinct(events_ds, sf_dir):
    rows = agg.dns_aggregator(events_ds).take_all()
    got = {r["event_type"]: r["n_distinct_users"] for r in rows}
    exact = dict(
        _duck(sf_dir, "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1")
    )
    assert got == exact


def test_pdns_collector(events_ds, sf_dir):
    rows = agg.pdns_collector(events_ds).take_all()
    got = {(r["event_type"], r["user_id"]): r for r in rows}
    exact = _duck(
        sf_dir,
        "SELECT event_type, user_id, COUNT(*), MIN(ts), MAX(ts) FROM events GROUP BY 1,2",
    )
    assert len(got) == len(exact)
    for et, uid, n, mn, mx in exact:
        r = got[(et, uid)]
        assert (r["n"], r["first_ts"], r["last_ts"]) == (n, mn, mx)


def test_context_collector_semi_join(events_ds, sf_dir):
    out = agg.context_collector(events_ds, mark_type="error").take_all()
    got_ids = sorted(r["event_id"] for r in out)
    exact = [
        r[0]
        for r in _duck(
            sf_dir,
            "SELECT event_id FROM events WHERE user_id IN "
            "(SELECT DISTINCT user_id FROM events WHERE event_type='error') ORDER BY event_id",
        )
    ]
    assert got_ids == exact


def test_heartbeat_injector(events_ds, sf_dir):
    n0 = events_ds.count()
    out = agg.heartbeat_injector(events_ds, n_heartbeats=24)
    assert out.count() == n0 + 24
    hb = [r for r in out.take_all() if r["event_type"] == "heartbeat"]
    assert len(hb) == 24


def test_flow_profiler_docs(ray_session, sf_dir):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    rows = agg.flow_profiler(docs).take_all()
    got = {r["lang"]: (r["n_docs"], r["sum_chars"]) for r in rows}
    exact = {
        r[0]: (r[1], r[2])
        for r in _duck(sf_dir, "SELECT lang, COUNT(*), SUM(n_chars) FROM documents GROUP BY 1")
    }
    assert got == exact


# ------------------------------------------------------------------ cidr
def test_ipv4_to_uint32():
    vals, valid = ipv4_to_uint32(["10.0.0.1", "255.255.255.255", "1.2.3.999", "junk", None])
    assert vals[0] == (10 << 24) + 1
    assert vals[1] == 0xFFFFFFFF
    assert valid.tolist() == [True, True, False, False, False]


def test_cidr_matcher_semantics():
    batch = pa.table(
        {
            "ip": ["10.3.7.1", "10.4.0.1", "192.168.1.5", "10.3.0.0", "8.8.8.8"],
            "row": [0, 1, 2, 3, 4],
        }
    )
    m = CidrMatcher(("10.3.0.0/16", "# comment", "10.0.0.0/8", "8.8.8.8"), ip_col="ip")
    out = m(batch)
    got = sorted(zip(out.column("row").to_pylist(), out.column("matched_cidr").to_pylist()))
    # row 0 and 3 are in BOTH 10.3/16 and 10/8 → one match row per range
    assert got == [
        (0, "10.0.0.0/8"),
        (0, "10.3.0.0/16"),
        (1, "10.0.0.0/8"),
        (3, "10.0.0.0/8"),
        (3, "10.3.0.0/16"),
        (4, "8.8.8.8/32"),
    ]


def test_cidr_over_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"ip": f"10.{i % 4}.0.1", "i": i} for i in range(100)])
    out = cidr_match(ds, ("10.1.0.0/16",)).take_all()
    assert len(out) == 25
    assert all(r["matched_cidr"] == "10.1.0.0/16" for r in out)


# ------------------------------------------------------------------ alertify
def test_exact_matcher():
    batch = pa.table(
        {
            "host": ["evil.com", "ok.com", "evil.com"],
            "url": ["/x", "/implant/yes", "/y"],
        }
    )
    m = ExactMatcher(("evil.com", "implant"), exact_cols=("host",), substr_cols=("url",))
    out = m(batch)
    got = sorted(zip(out.column("matched_field").to_pylist(), out.column("ioc").to_pylist()))
    assert got == [("host", "evil.com"), ("host", "evil.com"), ("url", "implant")]


def test_alertify_limit(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"host": "evil.com"} for _ in range(50)])
    out = alertify(ds, ("evil.com",), exact_cols=("host",), limit=5, concurrency=1).take_all()
    assert len(out) == 5


# ------------------------------------------------------------------ textstats
def test_token_stats_and_quality():
    batch = pa.table({"text": ["a bb ccc", "", "the cat in the hat", "x"]})
    out = quality_score(batch)
    assert out.column("n_tokens").to_pylist() == [3, 0, 5, 1]
    assert out.column("n_text_chars").to_pylist() == [8, 0, 18, 1]
    # ' the ' as whole token occurs twice → wait: 'the cat in the hat' has 2
    assert out.column("stop_ratio").to_pylist()[2] == pytest.approx(2 / 5)
    assert out.column("quality_ok").to_pylist() == [False, False, True, False]


def test_lang_id_heuristic():
    batch = pa.table(
        {
            "text": [
                "the cat and the dog is that with",
                "der hund und die katze ist nicht mit",
                "le chat et la maison est avec",
                "zzz qqq www",
            ]
        }
    )
    out = LangId()(batch)
    assert out.column("lang_pred").to_pylist() == ["en", "de", "fr", "und"]


def test_fingerprint_determinism_and_near_dup():
    batch = pa.table(
        {
            "text": [
                "alpha bravo charlie delta echo foxtrot golf hotel",
                "alpha bravo charlie delta echo foxtrot golf hotels",
                "completely different words entirely here now ok yes",
            ]
        }
    )
    out1 = fingerprint(batch)
    out2 = fingerprint(batch)
    assert out1.column("simhash").to_pylist() == out2.column("simhash").to_pylist()
    s = out1.column("simhash").to_pylist()
    from fever_ray.sketches.minhash import hamming_distance

    d_near = hamming_distance(np.array([s[0]], dtype=np.int64).astype(np.uint64),
                              np.array([s[1]], dtype=np.int64).astype(np.uint64))[0]
    d_far = hamming_distance(np.array([s[0]], dtype=np.int64).astype(np.uint64),
                             np.array([s[2]], dtype=np.int64).astype(np.uint64))[0]
    assert d_near < d_far


# ------------------------------------------------------------------ multimodal
def test_decode_stub_strict_raises():
    m = DecodeImageStub(strict=True)
    with pytest.raises(NotImplementedError):
        m(pa.table({"html": [b"x"]}))


def test_decode_stub_deterministic_schema(ray_session, pages_dir):
    import ray.data as rd

    ds = rd.read_parquet(pages_dir + "/", columns=["url", "html"])
    out = decode_images(ds, batch_size=64)

    # features are a pure function of the payload; row order varies with
    # block scheduling AND the same url can carry different html (IoC
    # planting collides hot hosts onto one path) — so compare the full
    # sorted multiset of result tuples, not row order or a url-keyed dict
    def rows(d):
        return sorted(
            (r["url"], r["img_width"], r["img_height"], tuple(r["img_features"]))
            for r in d.take_all()
        )

    t1 = rows(out)
    t2 = rows(
        decode_images(
            rd.read_parquet(pages_dir + "/", columns=["url", "html"]), batch_size=64
        )
    )
    assert t1 == t2
    schema = out.schema()
    assert "img_width" in schema.names and "img_features" in schema.names
    assert all(len(feats) == 8 for (_, _, _, feats) in t1)


def test_frame_sample_stub():
    m = FrameSampleStub(payload_col="html", every_n_bytes=10, max_frames=3)
    out = m(pa.table({"html": [b"x" * 35, b"y"], "id": [1, 2]}))
    rows = out.to_pylist()
    assert [r["id"] for r in rows] == [1, 1, 1, 2]
    assert [r["frame_index"] for r in rows] == [0, 1, 2, 0]


def test_ipv6_prefix_lanes_edges():
    """Two-uint64-lane masks at the prefix-length edge cases (/0, /48, /64,
    /65, /124, /128) vs ipaddress ground truth."""
    import ipaddress

    import numpy as np

    from fever_ray.ops.cidr import _prefix_lanes, ipv6_lanes

    cases = [
        ("::/0", ["::", "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff", "2001:db8::1"], []),
        ("2001:db8::/48", ["2001:db8:0:1::5", "2001:db8::"], ["2001:db9::", "2001:db8:1::"]),
        ("2001:db8::/64", ["2001:db8::ffff:ffff:ffff:ffff"], ["2001:db8:0:1::"]),
        ("2001:db8::/65", ["2001:db8::1", "2001:db8:0:0:7fff::"], ["2001:db8:0:0:8000::"]),
        ("2001:db8::/124", ["2001:db8::e"], ["2001:db8::10"]),
        ("2001:db8::42/128", ["2001:db8::42"], ["2001:db8::43"]),
    ]
    for cidr, inside, outside in cases:
        net = ipaddress.ip_network(cidr, strict=False)
        _, hb, lb, hm, lm = (cidr,) + _prefix_lanes(net)
        ips = inside + outside
        hi, lo, ok = ipv6_lanes(ips)
        assert ok.all()
        hit = ((hi & hm) == hb) & ((lo & lm) == lb)
        want = np.array([ipaddress.ip_address(s) in net for s in ips])
        assert (hit == want).all(), (cidr, list(zip(ips, hit, want)))


def test_ipv6_lanes_invalid_inputs():
    from fever_ray.ops.cidr import ipv6_lanes

    hi, lo, ok = ipv6_lanes(["2001:db8::1", "not-an-ip", "10.0.0.1", ""])
    assert list(ok) == [True, False, False, False]


def test_resize_stub_geometry():
    from fever_ray.ops.multimodal import ResizeStub

    m = ResizeStub(max_w=224, max_h=160, width_col="w", height_col="h")
    t = m(
        pa.table(
            {
                "w": pa.array([100, 448, 100, 2240, 10, 10000], pa.int32()),
                "h": pa.array([100, 320, 1600, 160, 10000, 10], pa.int32()),
            }
        )
    )
    got = list(zip(t.column("resize_w").to_pylist(), t.column("resize_h").to_pylist()))
    assert got == [
        (100, 100),   # fits → unchanged
        (224, 160),   # exact 2x shrink, width-bound
        (10, 160),    # tall: height-bound, 100*160//1600
        (224, 16),    # wide: width-bound, 160*224//2240
        (1, 160),     # extreme tall never hits 0
        (224, 1),     # extreme wide never hits 0
    ]
    with pytest.raises(ValueError):
        ResizeStub(max_w=0, max_h=10)


def test_revenue_by_nation_paths_match(ray_session, sf_dir):
    import duckdb
    import ray.data as rd
    import pyarrow.parquet as pq

    from fever_ray.ops.relational import revenue_by_nation

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])

    def run(bb):
        return revenue_by_nation(
            rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice", "l_discount"],
            ),
            rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate"],
            ),
            cust,
            nat,
            broadcast_bytes=bb,
            # 4 partitions on the 4-CPU test session: partition count is
            # perf-only (results are partition-invariant) and a 16-way
            # exchange on 4 CPUs has intermittently stalled mid-suite
            num_partitions=4,
        ).to_pandas()

    bcast = run(256 << 20)
    joined = run(0)  # force the Dataset.join scale path
    pd.testing.assert_frame_equal(
        bcast.reset_index(drop=True), joined.reset_index(drop=True), check_exact=True
    )
    con = duckdb.connect()
    for name in ("lineitem", "orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{sf_dir}/{name}.parquet')"
        )
    oracle = con.execute(
        "SELECT n_name, CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS n_items FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name ORDER BY n_name"
    ).df()
    pd.testing.assert_frame_equal(
        bcast.reset_index(drop=True), oracle, check_exact=True, check_dtype=False
    )


def test_group_top_k_vs_duckdb(ray_session):
    """Skewed groups + heavy ties + many partitions: exact per-group top-k
    equals the ROW_NUMBER oracle."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from fever_ray.ops.relational import group_top_k
    from tests.strict_compare import canon

    rng = np.random.default_rng(3)
    n = 20000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            # zipf-ish skew: one giant group, many tiny ones
            "lang": pa.array(
                ["g%d" % min(g, 30) for g in rng.zipf(1.3, n)], pa.string()
            ),
            # tiny value domain -> constant rank ties, broken by doc_id
            "n_chars": pa.array(rng.integers(0, 5, n).astype("int64")),
        }
    )
    got = group_top_k(
        ray_session.data.from_arrow(t).repartition(9),
        group_col="lang",
        order_col="n_chars",
        k=4,
        num_partitions=5,
    ).to_pandas()
    con = duckdb.connect()
    con.register("d", t)
    want = con.execute(
        "SELECT lang, doc_id, n_chars, rn FROM (SELECT lang, doc_id, n_chars,"
        " ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)"
        " AS rn FROM d) WHERE rn <= 4"
    ).fetchdf()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)


def test_funnel_counts_window_and_order(ray_session):
    """Hand-built fixture: out-of-order steps don't count, conversion
    window cuts late conversions, repeated steps use the earliest chain."""
    import pyarrow as pa

    from fever_ray.ops.aggregates import funnel_counts

    US = 1_000_000

    def ev(uid, t_s, typ):
        return {"user_id": uid, "ts": t_s * US, "event_type": typ}

    rows = [
        # u1: clean in-order funnel inside the window
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "purchase"),
        # u2: click BEFORE view -> stops after view
        ev(2, 10, "click"), ev(2, 20, "view"),
        # u3: click too late (window 60 s)
        ev(3, 0, "view"), ev(3, 100, "click"),
        # u4: purchase exactly at the window edge (inclusive)
        ev(4, 0, "view"), ev(4, 30, "click"), ev(4, 90, "purchase"),
        # u5: equal timestamps do NOT chain (strictly-after)
        ev(5, 0, "view"), ev(5, 0, "click"),
        # u6: earliest chain wins — first click at 5 s, purchase within ITS
        # window even though a later click exists
        ev(6, 0, "view"), ev(6, 5, "click"), ev(6, 50, "click"),
        ev(6, 64, "purchase"),
    ]
    t = pa.Table.from_pylist(rows)
    t = t.set_column(1, "ts", t.column("ts").cast(pa.timestamp("us")))
    got = (
        funnel_counts(
            ray_session.data.from_arrow(t).repartition(3),
            steps=("view", "click", "purchase"),
            within_s=60,
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("step")
    )
    assert got["n_users"].tolist() == [6, 3, 3]
    assert got["event_type"].tolist() == ["view", "click", "purchase"]


def test_funnel_counts_no_matching_events(ray_session):
    """A corpus slice with none of the step types still yields one
    zero-count row per step (matches the oracle's UNION ALL of COUNT(*))."""
    import pyarrow as pa

    from fever_ray.ops.aggregates import funnel_counts

    t = pa.table(
        {
            "user_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([0, 1_000_000], pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["error", "signup"], pa.string()),
        }
    )
    got = (
        funnel_counts(ray_session.data.from_arrow(t), steps=("view", "click"))
        .to_pandas()
        .sort_values("step")
    )
    assert got["step"].tolist() == [1, 2]
    assert got["n_users"].tolist() == [0, 0]


def test_group_top_k_unsigned_and_int64min(ray_session):
    """Descending rank must be exact for uint64 order columns (plain -o
    wraps mod 2^64) and for INT64_MIN (plain -o overflows)."""
    import pyarrow as pa

    from fever_ray.ops.relational import group_top_k

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(4, dtype=np.int64)),
            "g": pa.array(["a"] * 4, pa.string()),
            "v": pa.array(
                np.array([0, 1, 2**63 + 5, 7], dtype=np.uint64), pa.uint64()
            ),
        }
    )
    got = (
        group_top_k(
            ray_session.data.from_arrow(t), group_col="g", order_col="v",
            k=2, id_col="doc_id",
        )
        .to_pandas()
        .sort_values("rn")
    )
    assert got["doc_id"].tolist() == [2, 3]  # largest two values

    t2 = pa.table(
        {
            "doc_id": pa.array(np.arange(3, dtype=np.int64)),
            "g": pa.array(["a"] * 3, pa.string()),
            "v": pa.array(
                np.array([np.iinfo(np.int64).min, -1, 4], dtype=np.int64)
            ),
        }
    )
    got2 = (
        group_top_k(
            ray_session.data.from_arrow(t2), group_col="g", order_col="v",
            k=3, id_col="doc_id",
        )
        .to_pandas()
        .sort_values("rn")
    )
    assert got2["doc_id"].tolist() == [2, 1, 0]


def test_rollup_aggregate_levels(ray_session):
    """Subtotal lattice vs DuckDB GROUP BY ROLLUP — including a NULL finest
    group, which coexists with (and is distinct from) the subtotal rows."""
    import pyarrow as pa

    from fever_ray.ops.relational import rollup_aggregate
    from tests.strict_compare import canon

    t = pa.table(
        {
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", None],
            "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    got = rollup_aggregate(
        ray_session.data.from_arrow(t).repartition(3), keys=["a", "b"],
        value_col="v",
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute(
        "SELECT a, b, COUNT(v) AS n, CAST(SUM(v) AS BIGINT) AS sum_v "
        "FROM t GROUP BY ROLLUP(a, b)"
    ).fetchdf()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)


def test_rollup_aggregate_degenerate_inputs(ray_session):
    """SQL edge semantics: SUM of nothing / of all nulls is NULL while
    COUNT is 0, and the grand-total row exists even on empty input."""
    import duckdb as _duckdb
    import pyarrow as pa

    from fever_ray.ops.relational import rollup_aggregate
    from tests.strict_compare import canon

    cases = [
        pa.table(  # all values null
            {"a": ["x", "y"], "b": ["p", "q"], "v": pa.array([None, None], pa.int64())}
        ),
        pa.table(  # empty input
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "v": pa.array([], pa.int64())}
        ),
    ]
    for t in cases:
        got = rollup_aggregate(
            ray_session.data.from_arrow(t), keys=["a", "b"], value_col="v"
        ).to_pandas()
        con = _duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT a, b, COUNT(v) AS n, CAST(SUM(v) AS BIGINT) AS sum_v "
            "FROM t GROUP BY ROLLUP(a, b)"
        ).fetchdf()
        pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)


def test_pivot_counts_exact_and_edges(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import pivot_counts

    t = pa.table(
        {
            "k": pa.array([1, 1, 2, 2, 2, None, 3], pa.int64()),
            "cat": pa.array(["a", "b", "a", "a", None, "a", "c"]),
        }
    )
    out = pivot_counts(rd.from_arrow(t).repartition(3), "k", "cat").to_pandas()
    assert list(out.columns) == ["k", "n_a", "n_b", "n_c"]
    rows = {r.k: (r.n_a, r.n_b, r.n_c) for r in out.itertuples()}
    # null key and null pivot rows are skipped; absent combos are 0
    assert rows == {1: (1, 1, 0), 2: (2, 0, 0), 3: (0, 0, 1)}
    # rows come out key-sorted
    assert list(out["k"]) == [1, 2, 3]
    with pytest.raises(Exception, match="max_pivot"):
        pivot_counts(
            rd.from_arrow(t), "k", "cat", max_pivot=2
        ).materialize()


def test_pivot_counts_partition_invariant(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import pivot_counts

    rng = np.random.default_rng(12)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, 4000), pa.int64()),
            "cat": pa.array(
                np.array(["x", "y", "z", "w"])[rng.integers(0, 4, 4000)]
            ),
        }
    )
    outs = [
        pivot_counts(rd.from_arrow(t).repartition(p), "k", "cat")
        .to_pandas()
        .reset_index(drop=True)
        for p in (1, 17)
    ]
    assert outs[0].equals(outs[1])
    assert int(outs[0][["n_w", "n_x", "n_y", "n_z"]].sum().sum()) == 4000


def test_cube_aggregate_full_lattice(ray_session):
    """All 2^d grouping sets vs DuckDB GROUP BY CUBE, including a NULL
    finest group and the degenerate empty/all-null inputs."""
    import pyarrow as pa

    from fever_ray.ops.relational import cube_aggregate
    from tests.strict_compare import canon

    cases = [
        pa.table(
            {
                "a": ["x", "x", "y", "y", "y", None],
                "b": ["p", "q", "p", "p", None, "q"],
                "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            }
        ),
        pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "v": pa.array([], pa.int64())}
        ),
    ]
    for t in cases:
        got = cube_aggregate(
            ray_session.data.from_arrow(t).repartition(2), keys=["a", "b"],
            value_col="v",
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT a, b, COUNT(v) AS n, CAST(SUM(v) AS BIGINT) AS sum_v "
            "FROM t GROUP BY CUBE(a, b)"
        ).fetchdf()
        pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)
    with pytest.raises(ValueError, match="keys"):
        cube_aggregate(ray_session.data.from_arrow(cases[0]), [], "v")
    with pytest.raises(ValueError, match="grouping"):
        cube_aggregate(
            ray_session.data.from_arrow(cases[0]),
            ["a", "b", "a", "b", "a", "b", "a"],
            "v",
        )


def test_melt_roundtrip_and_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import melt

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([10, 20], pa.int64()),
            "b": pa.array([30, 40], pa.int64()),
        }
    )
    out = (
        melt(rd.from_arrow(t).repartition(2), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["id", "variable", "value"]
    assert out.values.tolist() == [
        [1, "a", 10], [1, "b", 30], [2, "a", 20], [2, "b", 40]
    ]
    mixed = pa.table(
        {"id": [1], "a": pa.array([1], pa.int64()), "b": pa.array([1.0])}
    )
    with pytest.raises(Exception, match="mix types"):
        melt(rd.from_arrow(mixed), ["id"], ["a", "b"]).materialize()
    with pytest.raises(ValueError, match="value_cols"):
        melt(rd.from_arrow(t), ["id"], [])


def test_melt_null_semantics(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import melt

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([10, None], pa.int64()),
            "b": pa.array([None, 40], pa.int64()),
        }
    )
    # default drops null values (UNPIVOT semantics — what the oracle does)
    out = (
        melt(rd.from_arrow(t), ["id"], ["a", "b"])
        .to_pandas()
        .sort_values(["id", "variable"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [[1, "a", 10], [2, "b", 40]]
    # pandas-melt mode keeps them
    kept = melt(
        rd.from_arrow(t), ["id"], ["a", "b"], drop_null_values=False
    ).to_pandas()
    assert len(kept) == 4 and kept["value"].isna().sum() == 2


def test_group_string_agg_order_and_nulls(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import group_string_agg

    # o2 deliberately DISAGREES with o1 so a wrong order-column
    # significance (o2-primary) cannot coincidentally pass
    t = pa.table(
        {
            "k": pa.array([2, 1, 1, 2, None, 1], pa.int64()),
            "v": pa.array(["c", "a", None, "d", "x", "b"]),
            "o1": pa.array([5, 1, 2, 4, 0, 3], pa.int64()),
            "o2": pa.array([0, 9, 8, 7, 0, 6], pa.int64()),
        }
    )
    outs = []
    for parts in (1, 4):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            sorted(
                (r["k"], r["agg"], r["n"])
                for r in group_string_agg(
                    ds, "k", "v", order_cols=["o1", "o2"]
                ).take_all()
            )
        )
    # null keys skip; null values become '' (row parity kept via n)
    assert outs[0] == [(1, "a,,b", 3), (2, "d,c", 2)]
    assert outs[0] == outs[1]
    # ties on o1 break by o2 (o1 primary, o2 secondary)
    tt = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "v": pa.array(["A", "B", "C"]),
            "o1": pa.array([1, 1, 0], pa.int64()),
            "o2": pa.array([2, 1, 5], pa.int64()),
        }
    )
    out = group_string_agg(
        rd.from_arrow(tt), "k", "v", order_cols=["o1", "o2"]
    ).take_all()
    assert [(r["k"], r["agg"]) for r in out] == [(1, "C,B,A")]
    tn = pa.table(
        {
            "k": pa.array([1], pa.int64()),
            "v": pa.array(["x"]),
            "o1": pa.array([None], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="nulls"):
        group_string_agg(
            rd.from_arrow(tn), "k", "v", order_cols=["o1"]
        ).materialize()


def test_partitioned_hash_join_full_outer_both_sides_dangle(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import partitioned_hash_join

    left = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array([1, 2, 3], pa.int64()),
                "k": pa.array([10, 11, 99], pa.int64()),
            }
        )
    ).repartition(2)
    right = rd.from_arrow(
        pa.table(
            {
                "rk": pa.array([11, 12], pa.int64()),
                "seg": pa.array(["A", "B"]),
            }
        )
    ).repartition(2)
    out = (
        partitioned_hash_join(left, right, "k", "rk", n_buckets=4,
                              join_type="full outer")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # matched (11), left-dangling (10, 99 -> seg null), right-dangling
    # (12 -> lid null, key coalesced into k)
    assert len(out) == 4
    by_k = {int(r["k"]): r for _, r in out.iterrows()}
    assert by_k[11]["seg"] == "A" and int(by_k[11]["lid"]) == 2
    assert pd.isna(by_k[10]["seg"]) and pd.isna(by_k[99]["seg"])
    assert pd.isna(by_k[12]["lid"]) and by_k[12]["seg"] == "B"


def test_latest_record_tiebreaks_deterministically(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import latest_record

    ts = pa.array(
        np.array([100, 200, 200, 50, 50, 50], dtype="datetime64[us]").astype(
            "datetime64[us]"
        ),
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "eid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": ts,
            "uid": pa.array([7, 7, 7, 8, 8, 8], pa.int64()),
            "tag": pa.array(list("abcdef")),
        }
    )
    out = (
        latest_record(rd.from_arrow(t).repartition(4), "uid", "ts", "eid")
        .to_pandas()
        .sort_values("uid")
        .reset_index(drop=True)
    )
    # uid 7: ts tie at 200 -> higher eid (3) wins; uid 8: all tie -> eid 6
    assert out["eid"].tolist() == [3, 6]
    assert out["tag"].tolist() == ["c", "f"]

    nul = rd.from_arrow(
        pa.table(
            {
                "eid": pa.array([1], pa.int64()),
                "ts": pa.array([None], pa.timestamp("us")),
                "uid": pa.array([7], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        latest_record(nul, "uid", "ts", "eid").materialize()


def test_json_int_field_and_props_stats(ray_session):
    import ray.data as rd

    from fever_ray.ops.aggregates import json_int_field, props_field_stats

    t = pa.table(
        {
            "props": ['{"k": 69}', '{"k":-3, "z": 1}', '{"a": 1, "k": 0}'],
            "event_type": ["a", "a", "b"],
        }
    )
    out = json_int_field(t, "props", "k", "k")
    assert out.column("k").to_pylist() == [69, -3, 0]

    with pytest.raises(Exception, match="no\\s+integer"):
        json_int_field(
            pa.table({"props": ['{"k": "str"}'], "event_type": ["a"]}),
            "props", "k", "k",
        )

    stats = (
        props_field_stats(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .set_index("event_type")
    )
    assert stats.loc["a", "n"] == 2 and stats.loc["a", "sum_k"] == 66
    assert stats.loc["a", "min_k"] == -3 and stats.loc["a", "max_k"] == 69
    assert stats.loc["b", "n"] == 1 and stats.loc["b", "sum_k"] == 0


def test_first_records_keeps_n_earliest(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import first_records

    us = 1_000_000
    ts = pa.array(np.array([3, 1, 2, 2, 9, 9], dtype=np.int64) * us,
                  pa.timestamp("us"))
    t = pa.table(
        {
            "eid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": ts,
            "uid": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
        }
    )
    out = (
        first_records(rd.from_arrow(t).repartition(3), "uid", "ts", "eid", n=2)
        .to_pandas()
        .sort_values(["uid", "eid"])
        .reset_index(drop=True)
    )
    # uid 7 earliest two: ts1(eid2), ts2 tie -> eid3 (not 4, not ts3's eid1)
    # uid 8: both rows tie at ts9 -> eid5 then eid6, n=2 keeps both
    assert out["eid"].tolist() == [2, 3, 5, 6]

    with pytest.raises(Exception, match="n must be"):
        first_records(rd.from_arrow(t), "uid", "ts", "eid", n=0)


def test_group_share_exact_and_zero_total(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import group_share

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "event_type": pa.array(["a", "a", "a", "z", "z"]),
            "value": pa.array([1.25, 2.50, 1.25, 0.0, 0.0], pa.float64()),
        }
    )
    for parts in (1, 4):
        out = {
            r["event_id"]: (r["event_type"], r["share"])
            for r in group_share(
                rd.from_arrow(t).repartition(parts)
            ).take_all()
        }
        assert out == {
            1: ("a", 125 / 500),
            2: ("a", 250 / 500),
            3: ("a", 125 / 500),
            4: ("z", 0.0),  # zero-total group shares 0, not NaN
            5: ("z", 0.0),
        }
    tnull = t.set_column(1, "event_type", pa.array(["a", None, "a", "z", "z"]))
    with pytest.raises(Exception, match="null"):
        group_share(rd.from_arrow(tnull)).take_all()


def test_basket_lift_vs_bruteforce(ray_session):
    import ray.data as rd
    from itertools import combinations

    from fever_ray.ops.aggregates import basket_lift

    rng = np.random.default_rng(71)
    items = ["view", "cart", "buy", "refund"]
    rows = []
    for u in range(30):
        for day in range(5):
            # cart and buy co-occur strongly; refund is rare/independent
            basket = {"view"}
            if rng.random() < 0.5:
                basket |= {"cart"}
                if rng.random() < 0.8:
                    basket |= {"buy"}
            if rng.random() < 0.1:
                basket |= {"refund"}
            for it in basket:
                # duplicate events inside a basket must not double count
                for _ in range(int(rng.integers(1, 3))):
                    rows.append(
                        (u, day * 86400_000_000 + int(rng.integers(0, 86400_000_000)), it)
                    )
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    baskets: dict = {}
    for u, ts, it in rows:
        baskets.setdefault((u, ts // 86400_000_000), set()).add(it)
    N = len(baskets)
    cnt = {it: sum(1 for b in baskets.values() if it in b) for it in items}
    want = {}
    for a, b in combinations(sorted(items), 2):
        nab = sum(1 for s in baskets.values() if a in s and b in s)
        if nab:
            want[(a, b)] = (
                cnt[a], cnt[b], nab, N,
                int(10 * nab * N > 11 * cnt[a] * cnt[b]),
            )
    for parts in (1, 7):
        out = {
            (r["item_a"], r["item_b"]): (
                r["n_a"], r["n_b"], r["n_ab"], r["n_baskets"], r["lifted"]
            )
            for r in basket_lift(
                rd.from_arrow(t).repartition(parts), num_partitions=8
            ).take_all()
        }
        assert out == want
    # the planted association is flagged, the independent one is not
    assert want[("buy", "cart")][4] == 1
    assert want[("refund", "view")][4] == 0


# ------------------------------------------------------------------ band join
def test_band_join_matches_brute_force(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import band_join

    rng = np.random.default_rng(11)
    lv = rng.integers(-50, 50, size=300)
    rv = rng.integers(-50, 50, size=200)
    left = rd.from_items(
        [{"id_a": i, "val_a": int(v)} for i, v in enumerate(lv)]
    ).repartition(5)
    right = rd.from_items(
        [{"id_b": 1000 + i, "val_b": int(v)} for i, v in enumerate(rv)]
    ).repartition(3)
    for delta in (0, 3, 7):
        got = sorted(
            (r["id_a"], r["id_b"], r["val_a"], r["val_b"])
            for r in band_join(left, right, delta=delta,
                               num_partitions=9).take_all()
        )
        want = sorted(
            (i, 1000 + j, int(a), int(b))
            for i, a in enumerate(lv)
            for j, b in enumerate(rv)
            if abs(int(a) - int(b)) <= delta
        )
        assert got == want, delta
        assert len(got) > 0


def test_band_join_lt_self_join(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import band_join

    vals = [10, 11, 13, 13, 100]
    a = rd.from_items([{"id_a": i, "val_a": v} for i, v in enumerate(vals)])
    b = rd.from_items([{"id_b": i, "val_b": v} for i, v in enumerate(vals)])
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in band_join(a, b, delta=2, emit="lt").take_all()
    )
    assert got == [(0, 1), (1, 2), (1, 3), (2, 3)]


def test_band_join_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import band_join

    ds = rd.from_items([{"id_a": 1, "val_a": 1.5}])
    ds2 = rd.from_items([{"id_b": 1, "val_b": 1}])
    with pytest.raises(ValueError, match="delta"):
        band_join(ds, ds2, delta=-1)
    with pytest.raises(ValueError, match="emit"):
        band_join(ds, ds2, delta=1, emit="gt")
    with pytest.raises(Exception, match="integer-typed"):
        band_join(ds, ds2, delta=1).take_all()


def test_zorder_layout_morton_and_cells(ray_session):
    import ray.data as rd

    from fever_ray.ops.relational import _morton_spread16, zorder_layout

    # spread vs the naive per-bit reference
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 16, size=200, dtype=np.uint64)
    naive = np.zeros_like(v)
    for i in range(16):
        naive |= ((v >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
    assert (_morton_spread16(v) == naive).all()

    x = rng.integers(0, 256, size=5000, dtype=np.int64)
    y = rng.integers(0, 256, size=5000, dtype=np.int64)
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    out = {
        r["cell"]: r
        for r in zorder_layout(
            rd.from_arrow(t).repartition(4), "x", "y", bits=8, cell_shift=8
        ).take_all()
    }
    # brute-force reference
    zz = np.zeros(len(x), dtype=np.int64)
    for i in range(8):
        zz |= (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1))
    cells = zz >> 8
    assert sum(r["n"] for r in out.values()) == len(x)
    for c in np.unique(cells):
        m = cells == c
        r = out[int(c)]
        assert (r["n"], r["min_x"], r["max_x"], r["min_y"], r["max_y"]) == (
            int(m.sum()), int(x[m].min()), int(x[m].max()),
            int(y[m].min()), int(y[m].max()),
        )
    # z-cell locality: a cell = z >> 8 spans a 16x16 tile at bits=8
    for r in out.values():
        assert r["max_x"] - r["min_x"] <= 15
        assert r["max_y"] - r["min_y"] <= 15

    with pytest.raises(ValueError, match="bits"):
        zorder_layout(rd.from_arrow(t), "x", "y", bits=17)
    with pytest.raises(ValueError, match="cell_shift"):
        zorder_layout(rd.from_arrow(t), "x", "y", bits=8, cell_shift=16)
    bad = pa.table({"x": pa.array([-1], pa.int64()), "y": pa.array([0], pa.int64())})
    with pytest.raises(Exception, match="outside"):
        zorder_layout(rd.from_arrow(bad), "x", "y", bits=8).materialize()


def test_script_mix_counts_and_dominance():
    """Crafted mixed-script docs: per-class counts exact, dominance flips
    with the majority script, all-equal ties elect by class order."""
    import pyarrow as pa

    from fever_ray.ops.textstats import script_mix

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "hello world",          # pure latin
                    "яяяя ab",              # cyrillic-dominant
                    "αα 漢漢漢",             # han-dominant over greek
                    "",                     # empty → all zero → latin
                    "ب漢",                  # han vs arabic tie → han (order)
                ],
                pa.string(),
            ),
        }
    )
    out = script_mix(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_latin"] == 10 and out.loc[1, "dominant"] == "latin"
    assert out.loc[2, "n_cyrillic"] == 4 and out.loc[2, "n_latin"] == 2
    assert out.loc[2, "dominant"] == "cyrillic"
    assert out.loc[3, "n_greek"] == 2 and out.loc[3, "n_han"] == 3
    assert out.loc[3, "dominant"] == "han"
    assert out.loc[4, "dominant"] == "latin" and out.loc[4, "n_latin"] == 0
    assert out.loc[5, "n_arabic"] == 1 and out.loc[5, "n_han"] == 1
    assert out.loc[5, "dominant"] == "han"


def _bmp_bytes(px: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (bottom-up rows)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # BGR, flipped
    data = rows.tobytes()
    off = 54
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + data


def _ppm_bytes(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n# test\n{w} {h}\n255\n".encode() + px.tobytes()


def test_decode_real_codec_bmp_ppm_exact_pixels():
    """codec='auto' decodes BMP and PPM for REAL (pure-numpy, no image
    library needed): exact dimensions + channel means from the pixels."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    m = DecodeImageStub(codec="auto")
    out = m(pa.table({"html": [_bmp_bytes(px), _ppm_bytes(px), b"<html>not an image</html>"]}))
    w = out.column("img_width").to_pylist()
    h = out.column("img_height").to_pylist()
    feats = np.asarray(out.column("img_features").to_pylist(), dtype=np.float32)
    assert w[:2] == [7, 7] and h[:2] == [5, 5]
    for i in range(2):
        np.testing.assert_allclose(
            feats[i, :3],
            px.reshape(-1, 3).mean(axis=0) / 255.0,
            rtol=1e-5,
        )
    # both containers hold the SAME pixels → identical features
    np.testing.assert_array_equal(feats[0], feats[1])
    # the undecodable html row fell back to the deterministic fake
    fake_w, fake_h, fake_f = _fake_decode([b"<html>not an image</html>"])
    assert (w[2], h[2]) == (int(fake_w[0]), int(fake_h[0]))
    np.testing.assert_array_equal(feats[2], fake_f[0])


def test_decode_strict_auto_raises_on_undecodable():
    m = DecodeImageStub(codec="auto", strict=True)
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    # decodable rows pass strict
    ok = m(pa.table({"html": [_ppm_bytes(px)]}))
    assert ok.column("img_width").to_pylist() == [2]
    with pytest.raises(NotImplementedError):
        m(pa.table({"html": [b"definitely not an image"]}))


def test_decode_real_codec_pil_path():
    """Green when PIL is importable, skipped otherwise (the container has
    no image library; the optional-import path is exercised wherever one
    exists)."""
    pytest.importorskip("PIL")
    import io as _io

    from PIL import Image

    px = np.full((4, 6, 3), 128, dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    m = DecodeImageStub(codec="auto")
    out = m(pa.table({"html": [buf.getvalue()]}))
    assert out.column("img_width").to_pylist() == [6]
    assert out.column("img_height").to_pylist() == [4]


def _ppm_frame(w, h, val):
    import numpy as np

    px = np.full((h, w, 3), val, dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def test_video_codec_splits_concatenated_ppm_frames(tmp_path):
    """VideoCodec's whole pipe path driven by a FAKE ffmpeg executable
    that emits two concatenated P6 frames — the plumbing (probe, stdin
    pipe, frame split via the shared netpbm scanner) is real even where
    the binary is a stand-in; a real ffmpeg slots in unchanged."""
    import os
    import stat

    from fever_ray.ops.multimodal import VideoCodec

    out = tmp_path / "frames.bin"
    out.write_bytes(_ppm_frame(4, 3, 10) + _ppm_frame(2, 2, 200))
    fake = tmp_path / "ffmpeg"
    fake.write_text(f"#!/bin/sh\ncat {out}\n")
    os.chmod(fake, os.stat(fake).st_mode | stat.S_IXUSR)

    vc = VideoCodec(binary=str(fake))
    assert vc.has_ffmpeg
    frames = vc.extract_frames(b"\x00fake-container-bytes", max_frames=4)
    assert [(w, h) for (w, h, _) in frames] == [(4, 3), (2, 2)]
    assert frames[0][2].shape == (3, 4, 3) and frames[0][2][0, 0, 0] == 10.0
    assert frames[1][2][0, 0, 0] == 200.0
    # max_frames truncates the split
    assert len(vc.extract_frames(b"x", max_frames=1)) == 1
    # garbage output → None (caller falls back to the stub)
    fake.write_text("#!/bin/sh\nprintf 'not-a-ppm'\n")
    assert vc.extract_frames(b"x") is None


def test_frame_sample_auto_real_frames_and_fallback(tmp_path):
    """codec='auto': decodable payloads emit their REAL frame count and
    geometry; undecodable ones keep the stub fan-out with fake metadata;
    the default codec='fake' output schema is unchanged (oracle safety);
    no ffmpeg at all → pure fallback; strict raises."""
    import os
    import stat

    import pytest

    from fever_ray.ops.multimodal import FrameSampleStub

    out = tmp_path / "frames.bin"
    out.write_bytes(_ppm_frame(4, 3, 10) + _ppm_frame(2, 2, 200))
    fake = tmp_path / "ffmpeg"
    # the stand-in decodes only payloads that reach it non-empty (always),
    # so route: real frames for every row in this table
    fake.write_text(f"#!/bin/sh\ncat {out}\n")
    os.chmod(fake, os.stat(fake).st_mode | stat.S_IXUSR)

    t = pa.table({"html": [b"v" * 35, b"w"], "id": [1, 2]})
    m = FrameSampleStub(
        payload_col="html", every_n_bytes=10, max_frames=3,
        codec="auto", ffmpeg_binary=str(fake),
    )
    rows = m(t).to_pylist()
    # both payloads decode to 2 real frames each (not the 3/1 stub counts)
    assert [r["id"] for r in rows] == [1, 1, 2, 2]
    assert [(r["frame_width"], r["frame_height"]) for r in rows] == [
        (4, 3), (2, 2), (4, 3), (2, 2),
    ]
    assert all(len(r["frame_features"]) == 8 for r in rows)

    # no binary anywhere → stub counts, fake metadata, same schema
    m2 = FrameSampleStub(
        payload_col="html", every_n_bytes=10, max_frames=3,
        codec="auto", ffmpeg_binary="/nonexistent/ffmpeg",
    )
    rows2 = m2(t).to_pylist()
    assert [r["id"] for r in rows2] == [1, 1, 1, 2]
    assert "frame_width" in rows2[0]

    with pytest.raises(NotImplementedError, match="ffmpeg"):
        FrameSampleStub(
            payload_col="html", codec="auto", strict=True,
            ffmpeg_binary="/nonexistent/ffmpeg",
        )(t)

    # the oracle-gated default is byte-identical in shape: no frame_width
    legacy = FrameSampleStub(payload_col="html", every_n_bytes=10, max_frames=3)(t)
    assert legacy.column_names == ["id", "frame_index", "frame_offset"]


def test_video_codec_real_ffmpeg_if_present():
    """Green only where a real ffmpeg exists (skipped in this container):
    a synthesized rawvideo clip round-trips through extract_frames."""
    import shutil
    import subprocess

    import pytest

    if shutil.which("ffmpeg") is None:
        pytest.skip("no ffmpeg binary in environment")
    from fever_ray.ops.multimodal import VideoCodec

    mk = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i",
         "testsrc=size=64x48:rate=4:duration=1", "-f", "avi", "pipe:1"],
        capture_output=True,
    )
    frames = VideoCodec().extract_frames(mk.stdout, max_frames=3)
    assert frames is not None and len(frames) == 3
    assert all((w, h) == (64, 48) for (w, h, _) in frames)


def _wav_bytes(rate=8000, freq=440.0, secs=0.25, ch=1, bits=16):
    import struct

    import numpy as np

    n = int(rate * secs)
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t)
    if ch == 2:
        x = np.stack([x, 0.5 * x], axis=1)
    else:
        x = x[:, None]
    if bits == 16:
        data = (x * 32767).astype("<i2").tobytes()
        afmt = 1
    elif bits == 8:
        data = ((x * 127) + 128).astype(np.uint8).tobytes()
        afmt = 1
    else:
        data = x.astype("<f4").tobytes()
        afmt = 3
        bits = 32
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", afmt, ch, rate, rate * block, block, bits)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_audio_codec_decodes_wav_and_au():
    """Library-free WAV/AU decode: sample rate, shape, amplitude, and the
    spectral centroid of a pure tone land where physics says."""
    import struct

    import numpy as np

    from fever_ray.ops.multimodal import AudioCodec, _audio_features

    ac = AudioCodec()
    for bits in (8, 16, 32):
        rate, x = ac.decode(_wav_bytes(bits=bits))
        assert rate == 8000 and x.shape == (2000, 1)
        assert 0.68 < np.sqrt((x**2).mean()) < 0.74  # sine RMS ≈ 1/√2
    rate, x = ac.decode(_wav_bytes(ch=2))
    assert x.shape == (2000, 2) and abs(x[:, 1].std() / x[:, 0].std() - 0.5) < 0.01
    # a 440 Hz tone's spectral centroid ≈ 440 Hz (normalized by rate/2)
    f = _audio_features(8000, ac.decode(_wav_bytes(freq=440.0))[1])
    assert abs(f[4] * 4000 - 440) < 15
    assert abs(f[0] - 0.25) < 1e-3  # duration

    # AU: big-endian 16-bit, encoding 3
    pcm = (np.sin(2 * np.pi * 440 * np.arange(2000) / 8000) * 32767).astype(">i2")
    au = (b".snd" + struct.pack(">IIIII", 24, len(pcm) * 2, 3, 8000, 1)
          + pcm.tobytes())
    rate, x = ac.decode(au)
    assert rate == 8000 and x.shape == (2000, 1)

    # garbage / truncated → None
    assert ac.decode(b"RIFFxxxxWAVE") is None
    assert ac.decode(b"\x00" * 64) is None


def test_decode_audio_stage_real_and_fallback(ray_session):
    """DecodeAudioStub(codec='auto') through the actor pool: WAV payloads
    get real rate/frames/features, non-audio payloads fall back to the
    deterministic fake; default codec='fake' never inspects bytes."""
    import numpy as np
    import ray.data as rd

    from fever_ray.ops.multimodal import decode_audio

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "html": pa.array([_wav_bytes(rate=16000, secs=0.5), b"<html>x</html>"],
                             pa.binary()),
        }
    )
    rows = sorted(
        decode_audio(rd.from_arrow(t), codec="auto").take_all(),
        key=lambda r: r["doc_id"],
    )
    assert rows[0]["sample_rate"] == 16000 and rows[0]["n_frames"] == 8000
    assert len(rows[0]["audio_features"]) == 8
    # the html row took the fake lanes (rate derives from fake width)
    assert rows[1]["sample_rate"] != 16000

    import pytest

    from fever_ray.ops.multimodal import DecodeAudioStub

    with pytest.raises(NotImplementedError, match="audio"):
        DecodeAudioStub(payload_col="html", codec="auto", strict=True)(t)


def test_phash_invariance_and_discrimination():
    """pHash math: exact invariance under integer upscale + mild noise of
    a textured image; unrelated images land near Hamming 32 (random
    bits); DCT matches the naive O(N²) definition."""
    import numpy as np

    from fever_ray.ops.multimodal import _dct2, phash64

    rng = np.random.default_rng(5)
    x = rng.random((32, 32))

    def naive_dct1(v):
        n = v.shape[-1]
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        return v @ (2 * np.cos(np.pi * (2 * i + 1) * k / (2 * n))).T

    assert np.abs(naive_dct1(naive_dct1(x).T).T - _dct2(x)).max() < 1e-9

    base = rng.integers(0, 256, (32, 32, 3)).astype(np.float64)
    h0 = int(phash64(base))
    assert h0 != 0
    for s in (2, 3):
        hs = int(phash64(np.kron(base, np.ones((s, s, 1)))))
        assert bin(h0 ^ hs).count("1") == 0
    noisy = np.clip(
        np.kron(base, np.ones((2, 2, 1))) + rng.normal(0, 4, (64, 64, 3)),
        0, 255,
    )
    assert bin(h0 ^ int(phash64(noisy))).count("1") <= 2
    other = int(phash64(rng.integers(0, 256, (32, 32, 3)).astype(np.float64)))
    assert bin(h0 ^ other).count("1") > 15


def test_image_phash_pairs_finds_visual_dups(ray_session):
    """End-to-end: BMP payloads through the pHash actor stage + the
    generic banded Hamming core — an image and its 2x upscale pair at
    distance 0; an unrelated image pairs with neither; non-image
    payloads (fake-code fallback) pair only when byte-identical."""
    import numpy as np
    import ray.data as rd

    from fever_ray.ops.multimodal import image_phash_pairs

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    up = np.kron(img, np.ones((2, 2, 1))).astype(np.uint8)
    other = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "html": pa.array(
                [
                    _bmp_bytes(img.astype(np.float32)),
                    _bmp_bytes(up.astype(np.float32)),
                    _bmp_bytes(other.astype(np.float32)),
                    b"<html>same bytes</html>",
                    b"<html>same bytes</html>",
                ],
                pa.binary(),
            ),
        }
    )
    rows = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in image_phash_pairs(
            rd.from_arrow(t), max_hamming=4
        ).take_all()
    )
    assert (1, 2, 0) in rows            # visual dup (scale-invariant)
    assert (4, 5, 0) in rows            # byte-identical fallback codes
    assert all(3 not in (a, b) for a, b, _ in rows)


def test_audio_fingerprint_invariance_and_discrimination():
    """Clip-level 64-bit audio fingerprint: Hz-anchored band-difference
    signs are stable across sample rate and level for the same material,
    far for different material (the Haitsma-Kalker sign trick, condensed
    to one code per clip)."""
    import numpy as np

    from fever_ray.ops.multimodal import audio_fingerprint64

    def tone_seq(rate, freqs, amp=0.8):
        segs = [
            amp * np.sin(2 * np.pi * f * np.arange(rate // 4) / rate)
            for f in freqs
        ]
        return np.concatenate(segs)[:, None]

    f1 = [220, 440, 880, 330, 660, 550, 990, 415]
    a = int(audio_fingerprint64(8000, tone_seq(8000, f1)))
    b = int(audio_fingerprint64(16000, tone_seq(16000, f1, amp=0.3)))
    c = int(audio_fingerprint64(8000, tone_seq(8000, list(reversed(f1)))))
    assert bin(a ^ b).count("1") <= 12   # same material, rate+level changed
    assert bin(a ^ c).count("1") >= 25   # different material
    rng = np.random.default_rng(2)
    noise = int(audio_fingerprint64(8000, rng.normal(0, 0.3, (16000, 1))))
    assert bin(a ^ noise).count("1") >= 25


def test_audio_dup_pairs_finds_reencodes(ray_session):
    """End-to-end: a clip and its 16 kHz re-encode pair within radius;
    different material doesn't; byte-identical non-audio payloads pair
    at 0 via the fallback codes."""
    import numpy as np
    import ray.data as rd

    from fever_ray.ops.multimodal import audio_dup_pairs

    def tone_wav(rate, freqs):
        import struct

        segs = [
            0.8 * np.sin(2 * np.pi * f * np.arange(rate // 4) / rate)
            for f in freqs
        ]
        x = np.concatenate(segs)
        data = (x * 32767).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    f1 = [220, 440, 880, 330, 660, 550, 990, 415]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "html": pa.array(
                [
                    tone_wav(8000, f1),
                    tone_wav(16000, f1),           # re-encode of clip 1
                    tone_wav(8000, list(reversed(f1))),
                    b"not audio at all",
                    b"not audio at all",
                ],
                pa.binary(),
            ),
        }
    )
    rows = sorted(
        (r["doc_a"], r["doc_b"])
        for r in audio_dup_pairs(rd.from_arrow(t), max_hamming=12).take_all()
    )
    assert (1, 2) in rows
    assert (4, 5) in rows
    assert all(3 not in p for p in rows)


def test_codecs_never_crash_on_garbage():
    """The image/audio/netpbm decoders run on UNTRUSTED payload bytes:
    any input must yield None (or a valid decode), never an exception —
    hypothesis fuzz over raw bytes plus magic-prefixed garbage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fever_ray.ops.multimodal import AudioCodec, ImageCodec

    ic, ac = ImageCodec(), AudioCodec()
    prefixes = [b"", b"BM", b"P6", b"P5", b"RIFF", b"RIFFxxxxWAVE",
                b".snd", b"P6\n"]

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=256), st.sampled_from(prefixes))
    def check(body, prefix):
        payload = prefix + body
        out = ic.decode(payload)
        assert out is None or (len(out) == 3 and out[2].ndim == 3)
        aout = ac.decode(payload)
        assert aout is None or (len(aout) == 2 and aout[1].ndim == 2)

    check()
