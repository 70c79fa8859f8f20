"""Declarative data-quality constraint checks (deequ-style) — the
validation card a 100 TB ingest runs BEFORE training jobs consume a drop:
completeness, accepted values, value ranges, cross-column consistency,
key uniqueness, and referential integrity, each emitted as one card row
``(check_name, violations, n_rows, passed)`` in exact int64.

The reference's nearest relative is its per-event sanity filtering
(SURVEY §2.6 profilers count malformed/out-of-range events before
aggregation); this generalizes that into a declarative suite.

Scale shape (10^12 rows):

* Row-local checks (``rowlocal_checks``) are ONE streaming pass per table
  computing every check's violation count per batch — partial rows are
  (#checks) wide, tree-summed; nothing shuffles.
* ``unique_check`` ships only per-batch-DISTINCT (key, count) pairs into a
  coarse hash-bucket shuffle (the exchange is bounded by distinct keys per
  batch, not rows); per-bucket distinct/row partials tree-sum.
* ``foreign_key_check`` ships per-batch-distinct (key, count) pairs from
  BOTH sides into the same bucket shuffle; a bucket holds every occurrence
  of its key range from both tables, so the absent-key row count is exact.
  Neither table's payload columns ever move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import bucket_of

__all__ = [
    "rowlocal_checks",
    "unique_check",
    "foreign_key_check",
    "data_quality_card",
]

_CARD_SCHEMA = pa.schema(
    [
        ("check_name", pa.string()),
        ("violations", pa.int64()),
        ("n_rows", pa.int64()),
        ("passed", pa.int64()),
    ]
)


def _card_row(name: str, violations: int, n_rows: int, max_violations: int) -> pa.Table:
    return pa.table(
        {
            "check_name": pa.array([name], pa.string()),
            "violations": pa.array([int(violations)], pa.int64()),
            "n_rows": pa.array([int(n_rows)], pa.int64()),
            "passed": pa.array(
                [1 if violations <= max_violations else 0], pa.int64()
            ),
        }
    )


def _combine_chunks(col):
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _rowlocal_violations(batch: pa.Table, spec: dict) -> int:
    """Exact violation count of one row-local check over one batch.

    Kinds (null semantics are part of each check's contract and mirrored
    verbatim in the SQL oracles):

    * ``not_null``  — violations = null count of ``col``.
    * ``in_set``    — null or value outside ``values`` violates.
    * ``between``   — value < lo or value > hi violates; null does NOT
                      (completeness is a separate check).
    * ``len_eq``    — ``col`` != strlen(``text_col``) violates; a null on
                      either side violates (the pair is inconsistent).
    """
    kind = spec["kind"]
    col = _combine_chunks(batch.column(spec["col"]))
    if kind == "not_null":
        return col.null_count
    if kind == "in_set":
        ok = pc.is_in(col, value_set=pa.array(spec["values"], col.type))
        return len(col) - pc.sum(ok).as_py() if len(col) else 0
    if kind == "between":
        bad = pc.or_(
            pc.less(col, spec["lo"]), pc.greater(col, spec["hi"])
        )
        n = pc.sum(pc.fill_null(bad, False)).as_py()
        return int(n or 0)
    if kind == "len_eq":
        text = _combine_chunks(batch.column(spec["text_col"]))
        same = pc.equal(col, pc.utf8_length(pc.cast(text, pa.string())))
        ok = pc.sum(pc.fill_null(same, False)).as_py()
        return len(col) - int(ok or 0)
    raise ValueError(f"unknown row-local check kind: {kind!r}")


def rowlocal_checks(ds, specs: list[dict]):
    """All row-local checks over one table in ONE streaming pass.

    Each spec: ``{"name", "kind", "col", ...}`` (see
    :func:`_rowlocal_violations`), optional ``"max_violations"`` (default
    0) deciding ``passed``.  Returns the card dataset (one row per check).
    """
    from .aggregates import tree_groupby

    if not specs:
        raise ValueError("rowlocal_checks needs at least one check spec")
    names = [s["name"] for s in specs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    maxv = {s["name"]: int(s.get("max_violations", 0)) for s in specs}

    def partial(batch: pa.Table) -> pa.Table:
        viol = [_rowlocal_violations(batch, s) for s in specs]
        return pa.table(
            {
                "check_name": pa.array(names, pa.string()),
                "violations": pa.array([int(v) for v in viol], pa.int64()),
                "n_rows": pa.array([batch.num_rows] * len(specs), pa.int64()),
            }
        )

    # zero-seed so an empty table still reports every check (0 violations
    # over 0 rows passes — vacuous truth, same as SQL's SUM-over-empty)
    seed = pa.table(
        {
            "check_name": pa.array(names, pa.string()),
            "violations": pa.array([0] * len(specs), pa.int64()),
            "n_rows": pa.array([0] * len(specs), pa.int64()),
        }
    )
    import ray.data as rd

    partials = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).union(rd.from_arrow(seed))
    summed = tree_groupby(
        partials,
        ["check_name"],
        [("violations", "sum"), ("n_rows", "sum")],
        max_groups=len(specs),
    )

    def finish(batch: pa.Table) -> pa.Table:
        v = batch.column("violations").to_numpy(zero_copy_only=False)
        cap = np.array(
            [maxv[n] for n in batch.column("check_name").to_pylist()],
            dtype=np.int64,
        )
        return batch.append_column(
            "passed", pa.array((v <= cap).astype(np.int64), pa.int64())
        )

    return summed.map_batches(finish, batch_format="pyarrow")


ACCEPT_SET_MAX = 32  # suggest in_set only when the domain is this small
UNIQUE_MIN_RATIO = 0.98  # suggest uniqueness when distinct ≈ non-null rows


def suggest_checks(ds, columns: list[str] | None = None) -> dict:
    """Constraint suggestion (deequ's ConstraintSuggestion re-expressed
    sketch-first): TWO streaming passes over the table derive a constraint
    suite that the profiled corpus itself passes —

    * pass 1 (exact, tree-summed KB partials): per column n, nulls, and
      numeric/timestamp min/max → ``not_null`` (tolerance = observed null
      count, guarding regressions beyond today's level) and ``between``.
    * pass 2 (ONE udaf pass for every column): HLL(p=14) distinct + k=64
      Misra-Gries — a string domain with ≤ ``ACCEPT_SET_MAX`` distinct
      values becomes ``in_set`` (MG with ≤ k distinct keys never
      decrements, so its key set IS the exact domain), and a column whose
      distinct estimate ≈ its non-null count is suggested for
      ``unique_check``.

    Returns {"rowlocal": [specs...], "unique_cols": [...], "profile":
    {col: {n, nulls, distinct_est, ...}}} — specs feed straight into
    :func:`rowlocal_checks`."""
    from ..core.udaf import SketchSpec, build_sketches
    from .aggregates import tree_groupby

    schema = ds.schema()
    names = list(schema.names)
    types = dict(zip(names, schema.types))
    if columns is None:
        columns = names
    num_cols = [
        c
        for c in columns
        if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
    ]
    ts_cols = [c for c in columns if pa.types.is_timestamp(types[c])]
    str_cols = [
        c
        for c in columns
        if pa.types.is_string(types[c]) or pa.types.is_large_string(types[c])
    ]

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = _combine_chunks(batch.column(c))
            # None (Arrow null) for non-range columns: min/max skip nulls,
            # while a NaN would poison the float min/max combine
            rec = {
                "col": c,
                "n": batch.num_rows,
                "nulls": col.null_count,
                "lo": None,
                "hi": None,
                "lo_i": None,
                "hi_i": None,
            }
            if c in num_cols or c in ts_cols:
                v = col.drop_null()
                if len(v):
                    if c in ts_cols:
                        v = v.cast(pa.int64())
                    mn, mx = pc.min(v).as_py(), pc.max(v).as_py()
                    rec["lo"] = float(mn)
                    rec["hi"] = float(mx)
                    if c in ts_cols or pa.types.is_integer(types[c]):
                        # exact int64 lanes: float64 rounds past the true
                        # min/max for |values| > 2^53 (large id/hash cols)
                        rec["lo_i"] = int(mn)
                        rec["hi_i"] = int(mx)
            rows.append(rec)
        return pa.table(
            {
                "col": pa.array([r["col"] for r in rows], pa.string()),
                "n": pa.array([r["n"] for r in rows], pa.int64()),
                "nulls": pa.array([r["nulls"] for r in rows], pa.int64()),
                "lo": pa.array([r["lo"] for r in rows], pa.float64()),
                "hi": pa.array([r["hi"] for r in rows], pa.float64()),
                "lo_i": pa.array([r["lo_i"] for r in rows], pa.int64()),
                "hi_i": pa.array([r["hi_i"] for r in rows], pa.int64()),
            }
        )

    import ray

    parts = [
        t
        for t in ray.get(
            tree_groupby(
                ds.map_batches(
                    stats_partial, batch_format="pyarrow", zero_copy_batch=True
                ),
                ["col"],
                [
                    ("n", "sum"),
                    ("nulls", "sum"),
                    ("lo", "min"),
                    ("hi", "max"),
                    ("lo_i", "min"),
                    ("hi_i", "max"),
                ],
                max_groups=len(columns),
            ).to_arrow_refs()
        )
        if t.num_rows and t.num_columns
    ]
    stats = {r["col"]: r for r in pa.concat_tables(parts).to_pylist()}

    specs_sk = []
    for c in str_cols:
        specs_sk.append(SketchSpec(f"hll:{c}", "hll", c, {"p": 14}))
        specs_sk.append(SketchSpec(f"mg:{c}", "mg", c, {"k": 64}))
    for c in num_cols:
        kind = "int" if pa.types.is_integer(types[c]) else "string"
        if kind == "int":
            specs_sk.append(
                SketchSpec(f"hll:{c}", "hll", c, {"p": 14}, value_kind="int")
            )
    sketches = build_sketches(ds, specs_sk) if specs_sk else {}

    rowlocal: list[dict] = []
    unique_cols: list[str] = []
    profile: dict = {}
    for c in columns:
        st = stats[c]
        nonnull = st["n"] - st["nulls"]
        prof = {"n": st["n"], "nulls": st["nulls"]}
        rowlocal.append(
            {
                "name": f"suggested.completeness.{c}",
                "kind": "not_null",
                "col": c,
                "max_violations": int(st["nulls"]),
            }
        )
        hll = sketches.get(f"hll:{c}")
        if hll is not None:
            d = float(hll.estimate())
            prof["distinct_est"] = d
            if nonnull and d >= UNIQUE_MIN_RATIO * nonnull:
                unique_cols.append(c)
            mg = sketches.get(f"mg:{c}")
            if mg is not None and d <= ACCEPT_SET_MAX:
                values = sorted(mg.candidates())
                prof["domain"] = values
                rowlocal.append(
                    {
                        "name": f"suggested.accepted.{c}",
                        "kind": "in_set",
                        "col": c,
                        "values": values,
                    }
                )
        if (c in num_cols or c in ts_cols) and st["lo"] is not None:
            lo, hi = st["lo"], st["hi"]
            if st.get("lo_i") is not None:
                # integer/timestamp columns: the exact int64 lanes, not the
                # float64 shadow (lossy past 2^53)
                lo, hi = int(st["lo_i"]), int(st["hi_i"])
            prof["lo"], prof["hi"] = lo, hi
            if c in num_cols:
                rowlocal.append(
                    {
                        "name": f"suggested.range.{c}",
                        "kind": "between",
                        "col": c,
                        "lo": lo,
                        "hi": hi,
                    }
                )
        profile[c] = prof
    return {"rowlocal": rowlocal, "unique_cols": unique_cols, "profile": profile}


def _distinct_count_partial(batch: pa.Table, col: str, n_parts: int) -> pa.Table:
    """Compress a batch to per-distinct (bucket, key, cnt) rows — the only
    rows the uniqueness / FK shuffles ever move."""
    g = pa.TableGroupBy(batch.select([col]), col).aggregate([([], "count_all")])
    # select by NAME: TableGroupBy key/aggregate column order varies across
    # pyarrow versions
    g = g.select([col, "count_all"]).rename_columns([col, "cnt"])
    b = bucket_of(g.column(col), n_parts)
    return g.append_column("_b", pa.array(b, pa.int32()))


def unique_check(
    ds,
    col: str,
    name: str,
    max_violations: int = 0,
    n_parts: int = 64,
):
    """Exact key-uniqueness card row: violations = rows − distinct(col).

    Null keys count as one distinct value (SQL ``COUNT(DISTINCT)`` ignores
    nulls, so the oracle mirror must count them separately — see the
    generated SQL).  Shuffle carries per-batch-distinct (key, cnt) pairs
    only; each bucket owns a disjoint key range, so per-bucket
    (Σcnt, #distinct) partials sum exactly."""

    def partial(batch: pa.Table) -> pa.Table:
        return _distinct_count_partial(batch, col, n_parts)

    def per_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or group.num_columns == 0:
            return pa.table(
                {
                    "rows_part": pa.array([], pa.int64()),
                    "distinct_part": pa.array([], pa.int64()),
                }
            )
        keys = _combine_chunks(group.column(col))
        rows = int(pc.sum(group.column("cnt")).as_py() or 0)
        distinct = pc.count_distinct(keys, mode="all").as_py()
        return pa.table(
            {
                "rows_part": pa.array([rows], pa.int64()),
                "distinct_part": pa.array([int(distinct)], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    tot = parts.sum(["rows_part", "distinct_part"]) or {}
    rows = int(tot.get("sum(rows_part)") or 0)
    distinct = int(tot.get("sum(distinct_part)") or 0)
    import ray.data as rd

    return rd.from_arrow(_card_row(name, rows - distinct, rows, max_violations))


def foreign_key_check(
    left_ds,
    left_col: str,
    right_ds,
    right_col: str,
    name: str,
    max_violations: int = 0,
    n_parts: int = 64,
):
    """Exact referential-integrity card row: violations = LEFT rows whose
    key has no match in RIGHT (null left keys violate — they reference
    nothing).  Both sides compress to per-batch-distinct (key, cnt) pairs
    before the one bucket shuffle; a bucket sees every occurrence of its
    key range from both tables, so the anti-join count is exact and the
    exchange is bounded by distinct keys, never rows."""

    def tag(side: int):
        col = left_col if side == 0 else right_col

        def fn(batch: pa.Table) -> pa.Table:
            t = _distinct_count_partial(batch, col, n_parts)
            if side == 1:
                t = t.rename_columns([left_col, "cnt", "_b"])
            return t.append_column(
                "_side", pa.array([side] * t.num_rows, pa.int32())
            )

        return fn

    left = left_ds.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    )
    right = right_ds.map_batches(
        tag(1), batch_format="pyarrow", zero_copy_batch=True
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "viol_part": pa.array([], pa.int64()),
                "rows_part": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0 or group.num_columns == 0:
            return empty
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lmask = side == 0
        if not lmask.any():
            return empty
        lt = group.filter(pa.array(lmask))
        keys = _combine_chunks(lt.column(left_col))
        cnt = lt.column("cnt").to_numpy(zero_copy_only=False)
        rows = int(cnt.sum())
        rmask = ~lmask
        if rmask.any():
            rkeys = pc.unique(
                _combine_chunks(group.filter(pa.array(rmask)).column(left_col))
            )
            hit = pc.fill_null(pc.is_in(keys, value_set=rkeys), False)
            viol = int(cnt[~hit.to_numpy(zero_copy_only=False)].sum())
        else:
            viol = rows
        return pa.table(
            {
                "viol_part": pa.array([viol], pa.int64()),
                "rows_part": pa.array([rows], pa.int64()),
            }
        )

    parts = (
        left.union(right).groupby("_b").map_groups(per_bucket, batch_format="pyarrow")
    )
    tot = parts.sum(["viol_part", "rows_part"]) or {}
    viol = int(tot.get("sum(viol_part)") or 0)
    rows = int(tot.get("sum(rows_part)") or 0)
    import ray.data as rd

    return rd.from_arrow(_card_row(name, viol, rows, max_violations))


def data_quality_card(parts: list):
    """Union the per-check card datasets into one card."""
    if not parts:
        raise ValueError("data_quality_card needs at least one part")
    return parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
