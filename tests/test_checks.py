"""Data-quality constraint-card tests: planted violations of every check
kind, null semantics per the documented contract, and partition invariance
(the card is exact under any block layout)."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.checks import (
    data_quality_card,
    foreign_key_check,
    rowlocal_checks,
    unique_check,
)


def _card(ds_card) -> dict:
    df = ds_card.to_pandas()
    return {
        r.check_name: (int(r.violations), int(r.n_rows), int(r.passed))
        for r in df.itertuples()
    }


def test_rowlocal_planted_violations(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "uid": pa.array([1, None, 3, None, 5], pa.int64()),
            "kind": pa.array(["a", "b", "zz", None, "a"], pa.string()),
            "val": pa.array([0.0, -1.0, 5.0, 300.0, 300.01], pa.float64()),
            "n_chars": pa.array([2, 3, None, 1, 0], pa.int64()),
            "text": pa.array(["ab", "abc", "x", None, ""], pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    card = _card(
        rowlocal_checks(
            ds,
            [
                {"name": "c.null", "kind": "not_null", "col": "uid"},
                {
                    "name": "c.set",
                    "kind": "in_set",
                    "col": "kind",
                    "values": ["a", "b"],
                },
                {
                    "name": "c.rng",
                    "kind": "between",
                    "col": "val",
                    "lo": 0.0,
                    "hi": 300.0,
                    "max_violations": 2,
                },
                {
                    "name": "c.len",
                    "kind": "len_eq",
                    "col": "n_chars",
                    "text_col": "text",
                },
            ],
        )
    )
    assert card["c.null"] == (2, 5, 0)
    # 'zz' out of set + null kind → 2 violations
    assert card["c.set"] == (2, 5, 0)
    # -1.0 and 300.01 violate; 300.0 is inclusive; 2 <= max_violations → pass
    assert card["c.rng"] == (2, 5, 1)
    # rows: (2,'ab') ok, (3,'abc') ok, (None,'x') viol, (1,None) viol,
    # (0,'') ok → 2
    assert card["c.len"] == (2, 5, 0)


def test_unique_and_fk_exact_counts(ray_session):
    import ray.data as rd

    ids = pa.table(
        {"k": pa.array([1, 2, 2, 3, 3, 3, None, None], pa.int64())}
    )
    ds = rd.from_arrow(ids).repartition(4)
    # distinct (mode=all): {1,2,3,null} = 4 → violations = 8 - 4 = 4
    card = _card(unique_check(ds, "k", name="u"))
    assert card["u"] == (4, 8, 0)

    left = rd.from_arrow(
        pa.table({"fk": pa.array([1, 1, 2, 9, 9, 9, None], pa.int64())})
    ).repartition(3)
    right = rd.from_arrow(
        pa.table({"pk": pa.array([1, 2, 3], pa.int64())})
    ).repartition(2)
    # rows 9,9,9 (absent) + None (references nothing) → 4 violations of 7
    card = _card(foreign_key_check(left, "fk", right, "pk", name="f"))
    assert card["f"] == (4, 7, 0)
    # empty right side: every left row violates
    empty_right = rd.from_arrow(pa.table({"pk": pa.array([], pa.int64())}))
    card = _card(
        foreign_key_check(left, "fk", empty_right, "pk", name="f0")
    )
    assert card["f0"] == (7, 7, 0)


def test_card_partition_invariance(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 5000
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, 2000, n), pa.int64()),
            "v": pa.array(rng.normal(10, 5, n), pa.float64()),
        }
    )
    specs = [{"name": "rng", "kind": "between", "col": "v", "lo": 0.0, "hi": 20.0}]
    cards = []
    for parts in (2, 17):
        ds = rd.from_arrow(t).repartition(parts)
        cards.append(
            _card(
                data_quality_card(
                    [rowlocal_checks(ds, specs), unique_check(ds, "k", name="u")]
                )
            )
        )
    assert cards[0] == cards[1]
    # brute-force cross-check
    v = t.column("v").to_numpy()
    k = t.column("k").to_numpy()
    assert cards[0]["rng"][0] == int(((v < 0.0) | (v > 20.0)).sum())
    assert cards[0]["u"][0] == n - len(np.unique(k))


def test_rowlocal_validation(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"a": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        rowlocal_checks(ds, [])
    with pytest.raises(ValueError):
        rowlocal_checks(
            ds,
            [
                {"name": "x", "kind": "not_null", "col": "a"},
                {"name": "x", "kind": "not_null", "col": "a"},
            ],
        )
    with pytest.raises(ValueError):
        data_quality_card([])


def test_suggest_checks_derives_passing_suite(ray_session):
    """Suggestion engine: small domains become exact in_set, null
    tolerances equal observed nulls, integer ranges are exact min/max, a
    near-unique key is flagged — and the profiled table PASSES its own
    suggested suite."""
    import ray.data as rd

    from fever_ray.ops.checks import suggest_checks

    n = 5000
    rng = np.random.default_rng(9)
    lang = np.array(["en", "de", "fr"])[rng.integers(0, 3, n)]
    val = rng.integers(-50, 1000, n)
    key = np.arange(n)  # fully unique
    text = np.array([f"t{i}" for i in range(n)], dtype=object)
    text[::100] = None  # 50 nulls
    t = pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "val": pa.array(val, pa.int64()),
            "text": pa.array(text.tolist(), pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    sug = suggest_checks(ds)
    by_name = {s["name"]: s for s in sug["rowlocal"]}
    assert by_name["suggested.accepted.lang"]["values"] == ["de", "en", "fr"]
    assert by_name["suggested.completeness.text"]["max_violations"] == 50
    assert by_name["suggested.completeness.key"]["max_violations"] == 0
    r = by_name["suggested.range.val"]
    assert (r["lo"], r["hi"]) == (int(val.min()), int(val.max()))
    rk = by_name["suggested.range.key"]
    assert (rk["lo"], rk["hi"]) == (0, n - 1)
    # key and text are distinct≈non-null-rows → suggested unique; the
    # 3-value lang and 1050-value val columns are not
    assert sug["unique_cols"] == ["key", "text"]
    # the suite it suggested passes on the table that produced it
    card = _card(rowlocal_checks(ds, sug["rowlocal"]))
    assert all(p for (_, _, p) in card.values())
    # and a planted regression (more nulls than profiled) fails it
    worse = pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "lang": pa.array(["xx"] * n, pa.string()),
            "val": pa.array(val, pa.int64()),
            "text": pa.array([None] * n, pa.string()),
        }
    )
    card2 = _card(rowlocal_checks(rd.from_arrow(worse), sug["rowlocal"]))
    assert card2["suggested.completeness.text"][2] == 0  # failed
    assert card2["suggested.accepted.lang"][2] == 0


def test_suggest_checks_int64_range_exact_past_2_53(ray_session):
    # between bounds on large int64 ids must come from the exact int64
    # lanes — float64 rounds 2^62+1 and 2^62+3 to the same value
    import ray.data as rd

    from fever_ray.ops.checks import rowlocal_checks, suggest_checks

    lo_true = (1 << 62) + 1
    hi_true = (1 << 62) + 3
    t = pa.table({"bigid": pa.array([lo_true, hi_true, lo_true + 1], pa.int64())})
    sug = suggest_checks(rd.from_arrow(t))
    spec = {s["name"]: s for s in sug["rowlocal"]}["suggested.range.bigid"]
    assert spec["lo"] == lo_true and spec["hi"] == hi_true
    # the suggested suite passes on the profiled corpus itself
    card = rowlocal_checks(rd.from_arrow(t), [spec]).to_pandas()
    assert int(card["violations"].iloc[0]) == 0
