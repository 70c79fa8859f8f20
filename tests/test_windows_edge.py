"""Window-operator edge cases not covered by the driver-gate queries:
string-key as-of joins (bucket hashing must not assume integer keys) and
hopping-window payload-column pruning."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.windows import asof_join, hopping_window


@pytest.fixture()
def rd(ray_session):
    import ray.data as rd

    return rd


def test_asof_join_string_keys(rd):
    left = rd.from_arrow(
        pa.table(
            {
                "user_id": ["a", "b", "a", "c"],
                "ts": pa.array([10, 20, 30, 40], pa.timestamp("us")),
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "user_id": ["a", "b", "a"],
                "ts": pa.array([5, 15, 25], pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0]),
            }
        )
    )
    rows = sorted(
        (r["event_id"], r["r_value"])
        for r in asof_join(left, right, key="user_id").take_all()
    )
    # each left row takes the latest right row at-or-before its ts for the
    # SAME key; key "c" has no right side → missing (NaN via merge_asof)
    assert rows[:3] == [(1, 1.0), (2, 2.0), (3, 3.0)]
    assert rows[3][0] == 4 and (rows[3][1] is None or np.isnan(rows[3][1]))


def test_hopping_window_ignores_payload_columns(rd):
    """Wide payload columns ride through unharmed (they are pruned before
    the n_hops fan-out) and results are identical with or without them."""
    base = {
        "ts": pa.array([0, 900_000_000, 1_800_000_000], pa.timestamp("us")),
        "event_type": ["a", "a", "b"],
        "value": pa.array([1.0, 2.0, 3.0]),
    }
    slim = rd.from_arrow(pa.table(base))
    wide = rd.from_arrow(
        pa.table({**base, "payload": pa.array([b"x" * 10_000] * 3, pa.binary())})
    )
    canon = lambda ds: sorted(
        (str(r["window_start"]), r["event_type"], r["n"], r["sum_value"])
        for r in hopping_window(ds, size_s=3600, step_s=900).take_all()
    )
    assert canon(slim) == canon(wide) and len(canon(slim)) > 0


def test_interval_join_matches_bruteforce(ray_session):
    """Every (left, right) pair with same key and right.ts − left.ts in
    [lo, hi] inclusive — checked pair-exactly against an all-pairs
    reference, across partitionings, with negative lo and zero-count
    left rows interleaved."""
    import numpy as np
    import pyarrow as pa

    from fever_ray.ops.windows import interval_join

    rng = np.random.default_rng(42)
    nl, nr = 300, 500
    lk = rng.integers(0, 9, nl)
    rk = rng.integers(0, 11, nr)  # some right keys never match
    lt = rng.integers(0, 5_000, nl)
    rt = rng.integers(0, 5_000, nr)
    left = pa.table({"k": pa.array(lk, pa.int64()), "ts": pa.array(lt, pa.int64()),
                     "lid": pa.array(np.arange(nl), pa.int64())})
    right = pa.table({"k": pa.array(rk, pa.int64()), "ts": pa.array(rt, pa.int64()),
                      "rid": pa.array(np.arange(nr), pa.int64())})
    lo, hi = -40, 250
    want = sorted(
        (int(i), int(j))
        for i in range(nl)
        for j in range(nr)
        if lk[i] == rk[j] and lo <= rt[j] - lt[i] <= hi
    )
    for lparts, rparts in ((1, 1), (5, 3)):
        out = interval_join(
            ray_session.data.from_arrow(left).repartition(lparts),
            ray_session.data.from_arrow(right).repartition(rparts),
            key="k", lo=lo, hi=hi, n_buckets=4,
        ).take_all()
        got = sorted((r["lid"], r["r_rid"]) for r in out)
        assert got == want, (lparts, rparts, len(got), len(want))
    assert len(want) > 100  # the fixture exercises real fan-out


def test_interval_join_string_keys_and_empty(ray_session):
    import pyarrow as pa

    from fever_ray.ops.windows import interval_join

    left = pa.table({"k": pa.array(["a", "b"]), "ts": pa.array([10, 20], pa.int64()),
                     "lid": pa.array([1, 2], pa.int64())})
    right = pa.table({"k": pa.array(["a", "a", "c"]),
                      "ts": pa.array([12, 300, 11], pa.int64()),
                      "rid": pa.array([7, 8, 9], pa.int64())})
    out = interval_join(
        ray_session.data.from_arrow(left),
        ray_session.data.from_arrow(right),
        key="k", lo=0, hi=5,
    ).take_all()
    assert [(r["lid"], r["r_rid"], r["r_ts"]) for r in out] == [(1, 7, 12)]
    none = interval_join(
        ray_session.data.from_arrow(left),
        ray_session.data.from_arrow(right.slice(0, 0)),
        key="k", lo=0, hi=5,
    ).take_all()
    assert none == []


def test_running_totals_string_keys_vs_duckdb(ray_session):
    """String partition keys, duplicate timestamps (tie-broken by id),
    single-event keys, and negative values — bit-exact vs the DuckDB
    window-function oracle."""
    import duckdb
    import pandas as pd

    from fever_ray.ops.windows import running_totals
    from tests.strict_compare import canon

    rng = np.random.default_rng(11)
    n = 5000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                rng.integers(0, 500, n).astype("int64") * 1_000_000,
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(
                ["u%03d" % u for u in rng.integers(0, 40, n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.normal(0, 50, n), 2), pa.float64()
            ),
        }
    )
    got = running_totals(
        ray_session.data.from_arrow(t), num_partitions=7
    ).to_pandas()
    con = duckdb.connect()
    con.register("ev", t)
    want = con.execute(
        """
        SELECT event_id, user_id, ts,
          ROW_NUMBER() OVER w AS rn,
          CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS DOUBLE)/100
            AS run_sum,
          COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(canon(got), canon(want), check_exact=True)


def test_window_top_k_matches_bruteforce_and_ties(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fever_ray.ops.windows import window_top_k

    rng = np.random.default_rng(21)
    n = 5000
    ts = np.sort(rng.integers(0, 10 * 86_400_000_000, size=n))
    users = rng.integers(0, 25, size=n)
    t = pa.table(
        {
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(users, pa.int64()),
        }
    )
    out = window_top_k(rd.from_arrow(t), size_s=86400, k=3).take_all()
    # brute force
    import collections

    per_win = collections.defaultdict(collections.Counter)
    for tsv, u in zip(ts, users):
        per_win[(tsv // 86_400_000_000) * 86_400_000_000][int(u)] += 1
    want = {}
    for w, ctr in per_win.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want[w] = [(u, c, i + 1) for i, (u, c) in enumerate(ranked)]
    # naive-datetime arithmetic (tz-independent; .timestamp() would apply
    # the local zone and shift every key on a non-UTC machine)
    import datetime as dtm

    epoch0 = dtm.datetime(1970, 1, 1)
    got = collections.defaultdict(list)
    for r in sorted(out, key=lambda r: (r["window_start"], r["rn"])):
        w = (r["window_start"] - epoch0) // dtm.timedelta(microseconds=1)
        got[w].append((r["user_id"], r["n"], r["rn"]))
    assert dict(got) == want

    # partition invariance
    out2 = window_top_k(rd.from_arrow(t).repartition(13), size_s=86400, k=3).take_all()
    key = lambda rows: sorted(
        (r["window_start"], r["user_id"], r["n"], r["rn"]) for r in rows
    )
    assert key(out2) == key(out)

    # null ts / null key rows are skipped, never ranked
    tn = pa.table(
        {
            "ts": pa.array([0, None, 86_400_000_000], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([7, 8, None], pa.int64()),
        }
    )
    outn = window_top_k(rd.from_arrow(tn), size_s=86400, k=3).take_all()
    assert [(r["user_id"], r["n"], r["rn"]) for r in outn] == [(7, 1, 1)]


def test_decayed_counts_exact_vs_local_reference(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import decayed_counts

    rng = np.random.default_rng(4)
    n = 4000
    ref = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
    # ages spanning future events, in-range, and far past the 63-halflife
    # floor-out (half_life=1h here so old events hit the shift clamp)
    epochs = ref - rng.integers(-7200, 70 * 3600, n) * 1_000_000
    keys = rng.integers(0, 23, n)
    t = pa.table(
        {
            "ts": pa.array(epochs, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(keys, pa.int64()),
        }
    )
    out = decayed_counts(
        rd.from_arrow(t).repartition(9),
        ref_ts="2024-01-31T00:00:00",
        half_life_s=3600,
        k_bits=40,
    ).to_pandas()
    # local replica
    age = np.maximum(ref - epochs, 0)
    b = np.minimum(age // (3600 * 1_000_000), 63)
    w = (np.int64(1) << np.int64(40)) >> b
    want = {}
    for k_, w_ in zip(keys, w):
        want[int(k_)] = want.get(int(k_), 0) + int(w_)
    got = dict(zip(out["user_id"], out["score"]))
    assert got == want
    # output ordering contract: score DESC then key ASC
    pairs = list(zip(out["score"].tolist(), out["user_id"].tolist()))
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_decayed_counts_edges_topk_and_nulls(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import decayed_counts

    t = pa.table(
        {
            "ts": pa.array(
                [
                    np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64),
                    np.datetime64("2024-02-05T00:00:00", "us").astype(np.int64),
                    None,
                    np.datetime64("2024-01-30T00:00:00", "us").astype(np.int64),
                ],
                pa.int64(),
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([1, 2, 3, None], pa.int64()),
        }
    )
    out = decayed_counts(
        rd.from_arrow(t), ref_ts="2024-01-31T00:00:00", half_life_s=86400
    ).take_all()
    # age-0 event and a FUTURE event both get full weight; null rows skip
    assert [(r["user_id"], r["score"]) for r in out] == [
        (1, 1 << 40),
        (2, 1 << 40),
    ]
    outk = decayed_counts(
        rd.from_arrow(t),
        ref_ts="2024-01-31T00:00:00",
        half_life_s=86400,
        top_k=1,
    ).take_all()
    assert [(r["user_id"], r["score"]) for r in outk] == [(1, 1 << 40)]
    with pytest.raises(ValueError, match="k_bits"):
        decayed_counts(rd.from_arrow(t), ref_ts="2024-01-31", k_bits=63)
    with pytest.raises(ValueError, match="half_life"):
        decayed_counts(rd.from_arrow(t), ref_ts="2024-01-31", half_life_s=0)


def test_decayed_counts_overflow_guard(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import decayed_counts

    # k_bits=62 -> cnt_cap = 1, so two events on one key must trip the
    # conservative wrap guard (the SQL mirror errors on its BIGINT cast)
    t = pa.table(
        {
            "ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([5, 5], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="int64"):
        decayed_counts(
            rd.from_arrow(t), ref_ts="1970-01-01T00:00:10", k_bits=62
        ).materialize()


def test_transition_counts_exact_vs_local(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import transition_counts

    rng = np.random.default_rng(13)
    n = 3000
    users = rng.integers(0, 40, n)
    ts = rng.integers(0, 10_000, n) * 1_000_000
    types = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types),
        }
    )
    outs = []
    for parts in (1, 8):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            {
                (r["from_type"], r["to_type"]): r["n"]
                for r in transition_counts(ds, num_partitions=8).take_all()
            }
        )
    # local replica: sort by (user, ts, id), count adjacent same-user pairs
    order = np.lexsort((eid, ts, users))
    us, tys = users[order], types[order]
    want = {}
    for i in range(n - 1):
        if us[i] == us[i + 1]:
            k = (tys[i], tys[i + 1])
            want[k] = want.get(k, 0) + 1
    assert outs[0] == want
    assert outs[0] == outs[1]
    assert sum(want.values()) == n - len(np.unique(users))


def test_transition_counts_nulls_and_single_events(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import transition_counts

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "user_id": pa.array([7, 7, None, 8, 9], pa.int64()),
            "ts": pa.array([0, 1_000_000, 2_000_000, None, 4_000_000],
                           pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(["x", "y", "x", "x", None]),
        }
    )
    out = transition_counts(rd.from_arrow(t)).take_all()
    # only user 7 has two valid events; null key/ts/type rows skip
    assert [(r["from_type"], r["to_type"], r["n"]) for r in out] == [
        ("x", "y", 1)
    ]


def test_rolling_window_sum_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import rolling_window_sum

    rng = np.random.default_rng(21)
    n = 2000
    users = rng.integers(0, 25, n)
    ts = rng.integers(0, 5_000, n) * 1_000_000
    vals = np.round(rng.uniform(0, 50, n), 2)
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    outs = []
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            {
                r["event_id"]: (r["win_sum"], r["win_n"])
                for r in rolling_window_sum(
                    ds, window_rows=4, num_partitions=8
                ).take_all()
            }
        )
    assert outs[0] == outs[1] and len(outs[0]) == n
    # brute force in integer cents
    cents = np.round(vals * 100).astype(np.int64)
    order = np.lexsort((eid, ts, users))
    by_user: dict = {}
    want = {}
    for i in order:
        hist = by_user.setdefault(users[i], [])
        hist.append(cents[i])
        w = hist[-4:]
        want[int(eid[i])] = (sum(w) / 100.0, len(w))
    assert outs[0] == want
    with pytest.raises(ValueError, match="window_rows"):
        rolling_window_sum(rd.from_arrow(t), window_rows=0)


def test_window_ops_reject_nulls_and_wrong_ts_unit(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import rolling_window_sum, running_totals

    tnull = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([1, None], pa.int64()),
            "ts": pa.array([0, 1], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([1.0, 2.0]),
        }
    )
    for op in (running_totals, rolling_window_sum):
        kwargs = {"window_rows": 3} if op is rolling_window_sum else {}
        with pytest.raises(Exception, match="nulls"):
            op(rd.from_arrow(tnull), **kwargs).materialize()
    tms = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([0], pa.int64()).cast(pa.timestamp("ms")),
            "value": pa.array([1.0]),
        }
    )
    with pytest.raises(Exception, match="timestamp"):
        running_totals(rd.from_arrow(tms)).materialize()


def test_user_retention_adjacent_windows_only(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import user_retention

    # windows (size 10s): u1 in w0,w1,w3 (retained w0->w1 only);
    # u2 in w0 only; u3 in w1,w2.  Duplicate events must not double count.
    us = 1_000_000
    ts = pa.array(
        np.array(
            [5, 5, 15, 35, 7, 12, 25, 18],
            dtype=np.int64,
        ) * us,
        pa.timestamp("us"),
    )
    uid = pa.array([1, 1, 1, 1, 2, 3, 3, 3], pa.int64())
    ds = rd.from_arrow(pa.table({"ts": ts, "user_id": uid})).repartition(3)
    out = (
        user_retention(ds, size_s=10)
        .to_pandas()
        .set_index("w")
        .sort_index()
    )
    # w0: active {1,2}, retained {1}; w1: active {1,3}, retained {3};
    # w2: active {3}, retained {} ; w3: active {1}
    assert out.loc[0, "n_active"] == 2 and out.loc[0, "n_retained"] == 1
    assert out.loc[1, "n_active"] == 2 and out.loc[1, "n_retained"] == 1
    assert out.loc[2, "n_active"] == 1 and out.loc[2, "n_retained"] == 0
    assert out.loc[3, "n_active"] == 1 and out.loc[3, "n_retained"] == 0

    nul = rd.from_arrow(
        pa.table({"ts": pa.array([None], pa.timestamp("us")),
                  "user_id": pa.array([1], pa.int64())})
    )
    with pytest.raises(Exception, match="null"):
        user_retention(nul).materialize()


def test_interarrival_histogram_within_key_only(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import interarrival_histogram

    us = 1_000_000
    # user 7: gaps 5s, 10s; user 8: single event (no gap); cross-user
    # adjacency (8's event between 7's) must contribute nothing
    ts = pa.array(np.array([0, 5, 15, 7], dtype=np.int64) * us,
                  pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": ts,
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        }
    )
    out = (
        interarrival_histogram(
            rd.from_arrow(t).repartition(3), lo=0, hi=16, n_bins=4
        )
        .to_pandas()
        .set_index("bin")
    )
    # bins of 4s: gap 5 -> bin 1, gap 10 -> bin 2
    assert out.loc[1, "n"] == 1 and out.loc[2, "n"] == 1
    assert out["n"].sum() == 2
    assert out.loc[1, "bin_lo"] == 4 and out.loc[2, "bin_lo"] == 8


def test_time_range_sum_vs_bruteforce_with_ts_peers(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import time_range_sum

    rng = np.random.default_rng(33)
    n = 2000
    users = rng.integers(0, 25, n)
    # coarse second grid so duplicate timestamps (SQL peer groups) are common
    ts = rng.integers(0, 300, n) * 1_000_000
    vals = np.round(rng.uniform(0, 50, n), 2)
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    W_S = 30
    outs = []
    for parts in (1, 9):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            {
                r["event_id"]: (r["win_sum"], r["win_n"])
                for r in time_range_sum(
                    ds, window_s=W_S, num_partitions=8
                ).take_all()
            }
        )
    assert outs[0] == outs[1] and len(outs[0]) == n
    # brute force: ALL rows of the key with ts in [ts_i - W, ts_i],
    # inclusive of ts-peers regardless of event_id order
    cents = np.round(vals * 100).astype(np.int64)
    want = {}
    for i in range(n):
        m = (users == users[i]) & (ts >= ts[i] - W_S * 1_000_000) & (ts <= ts[i])
        want[int(eid[i])] = (int(cents[m].sum()) / 100.0, int(m.sum()))
    assert outs[0] == want
    with pytest.raises(ValueError, match="window_s"):
        time_range_sum(rd.from_arrow(t), window_s=-1)


def test_time_range_sum_zero_window_is_peer_group(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import time_range_sum

    # W=0: each row still sums its full ts-peer group (SQL RANGE rule),
    # never just itself
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "ts": pa.array([5, 5, 9, 5], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([1.0, 2.0, 4.0, 8.0], pa.float64()),
        }
    )
    out = {
        r["event_id"]: (r["win_sum"], r["win_n"])
        for r in time_range_sum(
            rd.from_arrow(t), window_s=0, num_partitions=4
        ).take_all()
    }
    assert out == {1: (3.0, 2), 2: (3.0, 2), 3: (4.0, 1), 4: (8.0, 1)}


def test_locf_fill_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import locf_fill

    rng = np.random.default_rng(44)
    n = 1500
    users = rng.integers(0, 20, n)
    ts = rng.integers(0, 4000, n) * 1_000_000
    vals = np.round(rng.uniform(0, 50, n), 2)
    null_mask = rng.random(n) < 0.4
    eid = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(
                np.where(null_mask, np.nan, vals), pa.float64()
            ).to_pylist(),
        }
    )
    # rebuild with REAL nulls (NaN != NULL)
    t = t.set_column(
        3, "value",
        pa.array([None if m else v for m, v in zip(null_mask, vals)],
                 pa.float64()),
    )
    outs = []
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        outs.append(
            {
                r["event_id"]: (r["value"], r["filled"])
                for r in locf_fill(ds, num_partitions=8).take_all()
            }
        )
    assert outs[0] == outs[1] and len(outs[0]) == n
    order = np.lexsort((eid, ts, users))
    last: dict = {}
    want = {}
    for i in order:
        u = users[i]
        if not null_mask[i]:
            last[u] = vals[i]
            want[int(eid[i])] = (vals[i], 0)
        else:
            want[int(eid[i])] = (last.get(u, -1.0), 1)
    assert outs[0] == want


def test_locf_fill_leading_nulls_and_guards(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import locf_fill

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "ts": pa.array([0, 1, 2, 0], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([None, 3.5, None, None], pa.float64()),
        }
    )
    out = {
        r["event_id"]: (r["value"], r["filled"])
        for r in locf_fill(
            rd.from_arrow(t), sentinel=-9.0, num_partitions=4
        ).take_all()
    }
    assert out == {1: (-9.0, 1), 2: (3.5, 0), 3: (3.5, 1), 4: (-9.0, 1)}
    bad = t.set_column(
        1, "user_id", pa.array([7, None, 7, 8], pa.int64())
    )
    with pytest.raises(Exception, match="nulls"):
        locf_fill(rd.from_arrow(bad)).materialize()


def test_theil_sen_trend_vs_bruteforce_and_robustness(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import theil_sen_trend

    rng = np.random.default_rng(55)
    rows = []
    eid = 0
    # user 1: clean slope 2 cents/us over ts grid; one wild outlier spike
    for t in range(10):
        v = 2 * t + (5000 if t == 5 else 0)
        rows.append((1, t, v / 100.0))
    # user 2: duplicate timestamps only -> no valid pair, emits nothing
    rows.append((2, 7, 1.0))
    rows.append((2, 7, 2.0))
    # user 3: two points
    rows.append((3, 0, 0.0))
    rows.append((3, 4, 2.0))
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )

    def brute(uid):
        ev = [(r[1], round(r[2] * 100)) for r in rows if r[0] == uid]
        ev.sort()
        sl = [
            (cb - ca) / (tb - ta)
            for i, (ta, ca) in enumerate(ev)
            for tb, cb in ev[i + 1 :]
            if tb != ta
        ]
        sl.sort()
        return (len(sl), sl[(len(sl) + 1) // 2 - 1]) if sl else None

    for parts in (1, 5):
        out = {
            r["user_id"]: (r["n_pairs"], r["slope"])
            for r in theil_sen_trend(
                rd.from_arrow(t).repartition(parts), num_partitions=4
            ).take_all()
        }
        assert out == {u: brute(u) for u in (1, 3)}
    # robustness: the median slope shrugs off the planted spike
    assert abs(out[1][1] - 2.0) < 1e-9
    assert out[3] == (1, 50.0)  # 200 cents over 4 us
    with pytest.raises(Exception, match="max_events_per_key"):
        theil_sen_trend(
            rd.from_arrow(t), max_events_per_key=4, num_partitions=2
        ).take_all()


def test_spearman_corr_exact_and_vs_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    from fever_ray.ops.windows import spearman_corr

    rng = np.random.default_rng(77)
    n_users, per = 12, 40
    uid = np.repeat(np.arange(1, n_users + 1, dtype=np.int64), per)
    # coarse grids force plenty of ties in BOTH rank columns
    ts = rng.integers(0, 15, size=len(uid)).astype(np.int64)
    val = rng.integers(0, 9, size=len(uid)).astype(np.int64) / 100.0
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(uid), dtype=np.int64)),
            "user_id": pa.array(uid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
        }
    )
    for parts in (1, 7):
        rows = {
            r["user_id"]: r
            for r in spearman_corr(
                rd.from_arrow(t).repartition(parts), num_partitions=4
            ).take_all()
        }
        assert set(rows) == set(range(1, n_users + 1))
        df = pd.DataFrame({"u": uid, "x": ts, "y": val})
        for u, g in df.groupby("u"):
            r = rows[u]
            assert r["n"] == len(g)
            # moments -> rho must equal Pearson over tie-average ranks
            # (the Spearman definition; scipy is absent in-container)
            rho = r["num"] / np.sqrt(float(r["den_x"]) * float(r["den_y"]))
            rx = g["x"].rank(method="average").to_numpy()
            ry = g["y"].rank(method="average").to_numpy()
            want = np.corrcoef(rx, ry)[0, 1]
            assert abs(rho - want) < 1e-12, (u, rho, want)

    # hand case with ties: x=(1,1,2,3), y=(5,5,5,7) doubled ranks
    # ax=(3,3,6,8), ay=(4,4,4,8): n=4, num/den by hand
    t2 = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "user_id": pa.array([9, 9, 9, 9], pa.int64()),
            "ts": pa.array([1, 1, 2, 3], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([0.05, 0.05, 0.05, 0.07], pa.float64()),
        }
    )
    (r,) = spearman_corr(rd.from_arrow(t2), num_partitions=2).take_all()
    ax, ay = np.array([3, 3, 6, 8]), np.array([4, 4, 4, 8])
    assert r["num"] == 4 * (ax * ay).sum() - ax.sum() * ay.sum()
    assert r["den_x"] == 4 * (ax * ax).sum() - ax.sum() ** 2
    assert r["den_y"] == 4 * (ay * ay).sum() - ay.sum() ** 2

    # single-event key: all moments 0 (rho undefined, explicit not NaN)
    t3 = pa.table(
        {
            "event_id": pa.array([0], pa.int64()),
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([5], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([1.0], pa.float64()),
        }
    )
    (r3,) = spearman_corr(rd.from_arrow(t3), num_partitions=2).take_all()
    assert (r3["n"], r3["num"], r3["den_x"], r3["den_y"]) == (1, 0, 0, 0)

    with pytest.raises(Exception, match="max_events_per_key"):
        spearman_corr(
            rd.from_arrow(t), max_events_per_key=4, num_partitions=2
        ).take_all()
    with pytest.raises(ValueError, match="38000"):
        spearman_corr(rd.from_arrow(t), max_events_per_key=50_000)


def test_audience_growth_first_touch_curve(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import audience_growth

    US = 86_400_000_000
    rng = np.random.default_rng(11)
    n_users = 300
    rows_u, rows_t = [], []
    first_day = {}
    for u in range(n_users):
        fd = int(rng.integers(0, 10))
        first_day[u] = fd
        # first event on day fd, plus later noise events (never earlier)
        rows_u.append(u)
        rows_t.append(fd * US + int(rng.integers(0, US)))
        for _ in range(int(rng.integers(0, 4))):
            rows_u.append(u)
            rows_t.append((fd + int(rng.integers(0, 5))) * US
                          + int(rng.integers(0, US)))
    # clamp the planted first event to the day start so noise can't precede
    t = pa.table(
        {
            "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
            "ts": pa.array(np.array(rows_t, dtype=np.int64)).cast(
                pa.timestamp("us")
            ),
        }
    )
    from collections import Counter

    per_day = Counter(first_day.values())
    want, cum = [], 0
    for d in sorted(per_day):
        cum += per_day[d]
        want.append((d, per_day[d], cum))
    for parts in (1, 6):
        got = [
            (r["day_idx"], r["new_users"], r["cum_users"])
            for r in audience_growth(
                rd.from_arrow(t).repartition(parts), num_partitions=4
            ).take_all()
        ]
        assert got == want
    assert got[-1][2] == n_users

    bad = pa.table(
        {
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([1], pa.int64()),
        }
    )
    with pytest.raises(Exception, match="timestamp"):
        audience_growth(rd.from_arrow(bad)).take_all()


def test_burst_max_vs_bruteforce(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import burst_max

    rng = np.random.default_rng(13)
    W = 100  # us window for the fixture
    uid = np.repeat(np.arange(20, dtype=np.int64), 50)
    ts = rng.integers(0, 2000, size=len(uid)).astype(np.int64)
    # plant a dense burst for user 3 and duplicate timestamps for user 5
    ts[uid == 3] = np.concatenate(
        (np.arange(40, dtype=np.int64) + 500, rng.integers(0, 2000, 10))
    )
    ts[uid == 5][:10] = 777  # no-op on a copy; set via mask assignment
    m5 = np.flatnonzero(uid == 5)[:10]
    ts[m5] = 777
    t = pa.table(
        {
            "user_id": pa.array(uid),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
        }
    )

    def brute(u):
        tv = np.sort(ts[uid == u])
        return max(
            int(np.searchsorted(tv, a + W, "left")
                - np.searchsorted(tv, a, "left"))
            for a in tv
        )

    for parts in (1, 6):
        got = {
            r["user_id"]: (r["n_events"], r["max_burst"])
            for r in burst_max(
                rd.from_arrow(t).repartition(parts),
                window_us=W,
                num_partitions=4,
            ).take_all()
        }
        assert got == {u: (50, brute(u)) for u in range(20)}
    assert got[3][1] >= 40  # planted burst found
    assert got[5][1] >= 10  # duplicate timestamps all counted

    with pytest.raises(ValueError, match="positive"):
        burst_max(rd.from_arrow(t), window_us=0)
    bad = pa.table(
        {"user_id": pa.array([1], pa.int64()), "ts": pa.array([1], pa.int64())}
    )
    with pytest.raises(Exception, match="timestamp"):
        burst_max(rd.from_arrow(bad)).take_all()


def test_cohort_retention_triangle(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import cohort_retention

    US = 86_400_000_000
    rng = np.random.default_rng(23)
    rows_u, rows_t = [], []
    truth = {}
    for u in range(150):
        fd = int(rng.integers(0, 6))
        active = {fd} | {
            fd + int(a) for a in rng.integers(0, 12, size=rng.integers(0, 6))
        }
        truth[u] = (fd, active)
        for d in active:
            # several events per active day must not inflate the count
            for _ in range(int(rng.integers(1, 3))):
                rows_u.append(u)
                rows_t.append(d * US + int(rng.integers(0, US)))
    t = pa.table(
        {
            "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
            "ts": pa.array(np.array(rows_t, dtype=np.int64)).cast(
                pa.timestamp("us")
            ),
        }
    )
    from collections import Counter

    want = Counter()
    for fd, active in truth.values():
        for d in active:
            want[(fd, d - fd)] += 1
    for parts in (1, 5):
        got = {
            (r["cohort_day"], r["age_days"]): r["active_users"]
            for r in cohort_retention(
                rd.from_arrow(t).repartition(parts), num_partitions=4
            ).take_all()
        }
        assert got == dict(want)
    # age-0 cells sum to the number of users
    assert sum(v for (c, a), v in got.items() if a == 0) == len(truth)

    bad = pa.table(
        {
            "user_id": pa.array([1], pa.int64()),
            "ts": pa.array([-US], pa.int64()).cast(pa.timestamp("us")),
        }
    )
    with pytest.raises(Exception, match="pre-1970"):
        cohort_retention(rd.from_arrow(bad)).take_all()


def test_time_to_nth_event(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import time_to_nth_event

    # user 1: 6 events; user 2: exactly 3; user 3: 2 (below n) ; ties on
    # ts broken by event_id
    t = pa.table(
        {
            "event_id": pa.array(np.arange(11, dtype=np.int64)),
            "user_id": pa.array([1] * 6 + [2] * 3 + [3] * 2, pa.int64()),
            "ts": pa.array(
                [50, 10, 10, 30, 90, 70, 5, 5, 8, 100, 200], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    for parts in (1, 4):
        got = {
            r["user_id"]: r["latency_us"]
            for r in time_to_nth_event(
                rd.from_arrow(t).repartition(parts), n=3, num_partitions=3
            ).take_all()
        }
        # user 1 sorted ts: 10,10,30,... -> 30-10 = 20
        # user 2 sorted ts: 5,5,8 -> 8-5 = 3 ; user 3 absent
        assert got == {1: 20, 2: 3}
    all1 = time_to_nth_event(rd.from_arrow(t), n=1).take_all()
    assert {r["user_id"]: r["latency_us"] for r in all1} == {1: 0, 2: 0, 3: 0}
    with pytest.raises(ValueError, match="n must be"):
        time_to_nth_event(rd.from_arrow(t), n=0)


def test_rolling_active_users_wau(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import rolling_active_users

    US = 86_400_000_000
    rng = np.random.default_rng(29)
    rows_u, rows_t = [], []
    active = {}
    for u in range(80):
        days = set(rng.integers(0, 15, size=rng.integers(1, 6)).tolist())
        active[u] = days
        for d in days:
            for _ in range(int(rng.integers(1, 3))):  # multi-event days
                rows_u.append(u)
                rows_t.append(d * US + int(rng.integers(0, US)))
    t = pa.table(
        {
            "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
            "ts": pa.array(np.array(rows_t, dtype=np.int64)).cast(
                pa.timestamp("us")
            ),
        }
    )
    W = 7
    from collections import Counter

    want = Counter()
    for u, days in active.items():
        wends = {d + g for d in days for g in range(W)}
        for wd in wends:
            want[wd] += 1
    for parts in (1, 5):
        got = {
            r["day_idx"]: r["active_users"]
            for r in rolling_active_users(
                rd.from_arrow(t).repartition(parts),
                window_days=W,
                num_partitions=4,
            ).take_all()
        }
        assert got == dict(want)
    # window of 1 day == daily active users
    got1 = {
        r["day_idx"]: r["active_users"]
        for r in rolling_active_users(rd.from_arrow(t), window_days=1).take_all()
    }
    dau = Counter()
    for u, days in active.items():
        for d in days:
            dau[d] += 1
    assert got1 == dict(dau)
    with pytest.raises(ValueError, match="window_days"):
        rolling_active_users(rd.from_arrow(t), window_days=0)


def test_max_streak_gaps_and_islands(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import max_streak

    US = 86_400_000_000
    rng = np.random.default_rng(37)
    rows_u, rows_t = [], []
    truth = {}
    for u in range(100):
        days = sorted(set(rng.integers(0, 30, size=rng.integers(1, 12)).tolist()))
        truth[u] = days
        for d in days:
            for _ in range(int(rng.integers(1, 3))):
                rows_u.append(u)
                rows_t.append(d * US + int(rng.integers(0, US)))
    t = pa.table(
        {
            "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
            "ts": pa.array(np.array(rows_t, dtype=np.int64)).cast(
                pa.timestamp("us")
            ),
        }
    )

    def brute(days):
        best = cur = 1
        for a, b in zip(days, days[1:]):
            cur = cur + 1 if b - a == 1 else 1
            best = max(best, cur)
        return len(days), best

    for parts in (1, 5):
        got = {
            r["user_id"]: (r["active_days"], r["best_streak"])
            for r in max_streak(
                rd.from_arrow(t).repartition(parts), num_partitions=4
            ).take_all()
        }
        assert got == {u: brute(d) for u, d in truth.items()}


def test_lead_lag_counts_planted_lead(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import lead_lag_counts

    US = 86_400_000_000
    rng = np.random.default_rng(41)
    rows_t, rows_ty = [], []
    # signups on day d drive purchases on day d+2 (planted lead of +2)
    base = rng.integers(1, 20, size=12)
    for d, n in enumerate(base):
        for _ in range(int(n)):
            rows_t.append(d * US + int(rng.integers(0, US)))
            rows_ty.append("signup")
        for _ in range(int(n) * 3):
            rows_t.append((d + 2) * US + int(rng.integers(0, US)))
            rows_ty.append("purchase")
    t = pa.table(
        {
            "event_type": pa.array(rows_ty),
            "ts": pa.array(np.array(rows_t, dtype=np.int64)).cast(
                pa.timestamp("us")
            ),
        }
    )
    for parts in (1, 4):
        got = {
            r["lag"]: r["dot"]
            for r in lead_lag_counts(
                rd.from_arrow(t).repartition(parts), "signup", "purchase",
                max_lag=4,
            ).take_all()
        }
        assert set(got) == set(range(-4, 5))
        # brute force
        a = np.zeros(30, np.int64)
        b = np.zeros(30, np.int64)
        for d, n in enumerate(base):
            a[d] += n
            b[d + 2] += 3 * n
        for k in range(-4, 5):
            if k >= 0:
                want = int(np.dot(a[: 30 - k], b[k:]))
            else:
                want = int(np.dot(a[-k:], b[: 30 + k]))
            assert got[k] == want, k
    assert max(got, key=got.get) == 2  # the planted lead

    with pytest.raises(ValueError, match="max_lag"):
        lead_lag_counts(rd.from_arrow(t), "signup", "purchase", max_lag=-1)


def test_growth_accounting_split(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import growth_accounting

    US = 86_400_000_000
    # u1: first day 0 (2 events), returns day 2 (1 event)
    # u2: first day 2 (3 events)  ; u3: first day 0 (1 event)
    plan = [(1, 0), (1, 0), (1, 2), (2, 2), (2, 2), (2, 2), (3, 0)]
    t = pa.table(
        {
            "user_id": pa.array([u for u, _ in plan], pa.int64()),
            "ts": pa.array(
                [d * US + i for i, (_, d) in enumerate(plan)], pa.int64()
            ).cast(pa.timestamp("us")),
        }
    )
    for parts in (1, 3):
        got = {
            r["day_idx"]: (r["new_user_events"], r["returning_user_events"])
            for r in growth_accounting(
                rd.from_arrow(t).repartition(parts), num_partitions=3
            ).take_all()
        }
        assert got == {0: (3, 0), 2: (3, 1)}


def test_lifecycle_accounting_ledger(ray_session):
    import ray.data as rd

    from fever_ray.ops.windows import lifecycle_accounting

    US_W = 86_400_000_000 * 7
    # u1 weeks {0,1,3}: new@0, ret@1, churn@2, res@3, churn@4
    # u2 weeks {1}:      new@1, churn@2
    # u3 weeks {0,1,2}:  new@0, ret@1, ret@2, churn@3
    plan = {1: [0, 1, 3], 2: [1], 3: [0, 1, 2]}
    rows_u, rows_t = [], []
    for u, weeks in plan.items():
        for w in weeks:
            rows_u.append(u)
            rows_t.append(w * US_W + u * 1000)
    t = pa.table(
        {
            "user_id": pa.array(np.array(rows_u, np.int64)),
            "ts": pa.array(np.array(rows_t, np.int64)).cast(pa.timestamp("us")),
        }
    )
    want = {
        0: (2, 0, 0, 0),
        1: (1, 2, 0, 0),
        2: (0, 1, 0, 2),  # u3 retained; u1+u2 churned into 2
        3: (0, 0, 1, 1),  # u1 resurrected (prev=1 < 2); u3 churned into 3
        4: (0, 0, 0, 1),
    }
    for parts in (1, 3):
        got = {
            r["period"]: (
                r["new_users"], r["retained"], r["resurrected"], r["churned"]
            )
            for r in lifecycle_accounting(
                rd.from_arrow(t).repartition(parts), num_partitions=3
            ).take_all()
        }
        assert got == want
    # ledger identity: active(p) - active(p-1) == new + res - churn(p)
    active = {0: 2, 1: 3, 2: 1, 3: 1, 4: 0}
    for p in range(1, 5):
        n, r, s, c = want[p]
        assert active[p] - active[p - 1] == n + s - c


def test_rolling_distinct_hll_matches_exact_domain_and_bound(ray_session):
    import numpy as np
    import pyarrow as pa

    from fever_ray.ops.windows import (
        rolling_active_users,
        rolling_distinct_hll,
    )

    rng = np.random.default_rng(7)
    n = 4000
    day = rng.integers(0, 20, size=n)  # 20 active days
    us = day * 86_400_000_000 + rng.integers(0, 86_400_000_000, size=n)
    t = pa.table(
        {
            "user_id": pa.array(rng.integers(0, 900, size=n), pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
        }
    )
    ds = ray_session.data.from_arrow(t).repartition(5)
    exact = {
        int(r["day_idx"]): int(r["active_users"])
        for r in rolling_active_users(ds, window_days=7).take_all()
    }
    est_t = rolling_distinct_hll(ds, window_days=7, p=12)
    est = dict(
        zip(
            est_t.column("day_idx").to_pylist(),
            est_t.column("est").to_pylist(),
        )
    )
    assert set(exact) == set(est)  # identical window-end day domain
    rse = 1.04 / np.sqrt(2**12)
    for d, x in exact.items():
        assert abs(est[d] - x) <= 4 * rse * x + 2, (d, est[d], x)
    # window_days=1 degenerates to per-day distinct
    one = rolling_distinct_hll(ds, window_days=1, p=12)
    assert len(one) == 20
    with pytest.raises(ValueError):
        rolling_distinct_hll(ds, window_days=0)
    with pytest.raises(Exception, match="max_days"):
        rolling_distinct_hll(ds, window_days=7, max_days=3)


def test_asof_join_from_pandas_blocks(rd):
    """Datasets born from pandas blocks carry a PandasBlockSchema (no
    .field); the schema-dependent window ops must take the _arrow_schema
    fallback, not AttributeError (ADVICE r3 flagged sessionize)."""
    import pandas as pd

    from fever_ray.ops.windows import sessionize

    left = rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [1, 2, 1],
                "ts": pd.to_datetime([10, 20, 30], unit="s").astype(
                    "datetime64[us]"
                ),
                "event_id": [1, 2, 3],
            }
        )
    )
    right = rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [1, 2],
                "ts": pd.to_datetime([5, 25], unit="s").astype("datetime64[us]"),
                "value": [1.0, 2.0],
            }
        )
    )
    rows = sorted(
        (r["event_id"], r["r_value"])
        for r in asof_join(left, right, key="user_id").take_all()
    )
    assert rows == [(1, 1.0), (2, None), (3, 1.0)]
    # sessionize over a pandas-block dataset exercises the same fallback
    sess = sessionize(left, key="user_id", ts_col="ts", gap_s=5).take_all()
    assert sum(r["n_events"] for r in sess) == 3


def test_asof_join_forward_direction(rd):
    """direction='forward': earliest right row with ts >= left.ts; ties
    and absent keys behave symmetrically to backward."""
    left = rd.from_arrow(
        pa.table(
            {
                "user_id": [1, 1, 2],
                "ts": pa.array([10, 40, 10], pa.timestamp("us")),
                "event_id": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "user_id": [1, 1, 2],
                "ts": pa.array([15, 30, 5], pa.timestamp("us")),
                "value": pa.array([1.0, 2.0, 3.0]),
            }
        )
    )
    from fever_ray.ops.windows import asof_join as aj

    rows = sorted(
        (r["event_id"], r["r_value"])
        for r in aj(left, right, key="user_id", direction="forward").take_all()
    )
    # event 1 (ts=10) → right ts=15; event 2 (ts=40) → none after; event 3
    # (user 2, ts=10) → none at-or-after 10
    assert rows == [(1, 1.0), (2, None), (3, None)]

    import pytest

    with pytest.raises(ValueError, match="direction"):
        aj(left, right, key="user_id", direction="nearest")


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_tie_heavy_matches_pandas(rd, direction):
    """Adversarial fixture for the merged-scan kernel (round 5): many
    duplicate (key, ts) rows on BOTH sides so equal-timestamp tie rules
    decide the matched ROW IDENTITY, pinned against pd.merge_asof (the
    semantics the kernel mirrors: backward ties take the last right row
    in stable input order, forward ties the first)."""
    import pandas as pd

    rng = np.random.default_rng(41)
    nl, nr, nkey, nts = 600, 500, 7, 11  # dense collisions by construction
    lk = rng.integers(0, nkey, nl).astype(np.int64)
    lt = rng.integers(0, nts, nl).astype(np.int64)
    rk = rng.integers(0, nkey, nr).astype(np.int64)
    rt = rng.integers(0, nts, nr).astype(np.int64)
    left = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(lk, pa.int64()),
                "ts": pa.array(lt, pa.int64()).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(nl), pa.int64()),
            }
        )
    ).repartition(5)
    right = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(rk, pa.int64()),
                "ts": pa.array(rt, pa.int64()).cast(pa.timestamp("us")),
                "ridx": pa.array(np.arange(nr), pa.int64()),
            }
        )
    ).repartition(3)
    got = {
        r["event_id"]: r["r_ridx"]
        for r in asof_join(
            left, right, key="user_id", direction=direction
        ).take_all()
    }
    lt_f = pd.DataFrame({"user_id": lk, "ts": lt, "event_id": np.arange(nl)})
    rt_f = pd.DataFrame({"user_id": rk, "ts": rt, "ridx": np.arange(nr)})
    want = pd.merge_asof(
        lt_f.sort_values("ts", kind="mergesort"),
        rt_f.sort_values("ts", kind="mergesort"),
        on="ts",
        by="user_id",
        direction=direction,
    )
    want_map = {
        int(e): (None if pd.isna(x) else int(x))
        for e, x in zip(want["event_id"], want["ridx"])
    }
    assert got == want_map  # exact matched-row identity, not just values


def test_bucket_exchange_equals_groupby_path(rd, monkeypatch):
    """The raw-task bucket exchange (the >16M-row shuffle mechanism,
    round 5) forced on SMALL inputs must be bit-equal to the Dataset
    groupby path for asof AND interval — same kernels, different
    exchange; key-completeness per cell is the only requirement."""
    import fever_ray.ops.windows as W
    from fever_ray.ops.windows import interval_join

    rng = np.random.default_rng(53)
    nl, nr, nkey = 800, 600, 37
    left = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(rng.integers(0, nkey, nl), pa.int64()),
                "ts": pa.array(
                    rng.integers(0, 500, nl), pa.int64()
                ).cast(pa.timestamp("us")),
                "event_id": pa.array(np.arange(nl), pa.int64()),
            }
        )
    ).repartition(7)
    right = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(rng.integers(0, nkey, nr), pa.int64()),
                "ts": pa.array(
                    rng.integers(0, 500, nr), pa.int64()
                ).cast(pa.timestamp("us")),
                "price": pa.array(rng.integers(0, 9999, nr).astype(np.float64)),
            }
        )
    ).repartition(3)

    def run_both(fn):
        groupby_rows = sorted(
            tuple(sorted(r.items())) for r in fn().take_all()
        )
        orig = W._union_cogroup
        monkeypatch.setattr(
            W, "_union_cogroup",
            lambda both, nb, jb, empty: orig(both, nb, jb, empty,
                                             exchange_rows=0),
        )
        try:
            exchange_rows = sorted(
                tuple(sorted(r.items())) for r in fn().take_all()
            )
        finally:
            monkeypatch.setattr(W, "_union_cogroup", orig)
        return groupby_rows, exchange_rows

    for fn in (
        lambda: W.asof_join(left, right, key="user_id"),
        lambda: W.asof_join(left, right, key="user_id", direction="forward"),
        lambda: interval_join(
            left, right, key="user_id", lo=-50, hi=50
        ),
    ):
        g, e = run_both(fn)
        assert g == e and len(g) > 0
