"""Strict (bit-exact) gate mimic: run queries() vs oracle_sql() at a given
sf and compare values EXACTLY after sorting columns by name — the same
comparison shape the driver's hash gate uses.  Run directly:

    python tests/strict_compare.py [sf_dir] [query ...]

Exits non-zero if any checked query differs.  Unlike test_entry_parity's
rtol-tolerant compare, this catches dtype and last-ulp drift before the
driver does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def oracle_df(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Return a list of human-readable diffs; empty == exact match."""
    problems: list[str] = []
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        return [f"columns {list(got.columns)} != {list(want.columns)}"]
    if len(got) != len(want):
        return [f"rows {len(got)} != {len(want)}"]
    for c in got.columns:
        g, w = got[c], want[c]
        if str(g.dtype) != str(w.dtype):
            problems.append(f"col {c}: dtype {g.dtype} != {w.dtype}")
            continue
        if pd.api.types.is_float_dtype(g):
            ga, wa = g.to_numpy(), w.to_numpy()
            eq = (ga == wa) | (np.isnan(ga) & np.isnan(wa))
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} value diffs, first at row {i}: "
                    f"{ga[i]!r} != {wa[i]!r}"
                )
        else:
            eq = (g.to_numpy() == w.to_numpy()) | (g.isna() & w.isna()).to_numpy()
            if not np.asarray(eq).all():
                i = int(np.argmin(np.asarray(eq)))
                problems.append(
                    f"col {c}: {int((~np.asarray(eq)).sum())} value diffs, first at "
                    f"row {i}: {g.iloc[i]!r} != {w.iloc[i]!r}"
                )
    return problems


def main() -> int:
    import json
    import time

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--timing"]
    timing = "--timing" in argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args[1:] or sorted(n for n in queries if n in oracles)
    bad = 0
    records = {}
    t_start = time.perf_counter()
    for name in names:
        if name not in oracles:
            print(f"{name}: SKIP (no oracle)")
            continue
        t0 = time.perf_counter()
        # per-query isolation: one crashing query must not zero the sweep
        try:
            got = to_df(queries[name](sf_dir))
        except Exception as e:
            bad += 1
            print(f"{name}: CRASH {type(e).__name__}: {e}")
            records[name] = {"status": "crash", "error": f"{type(e).__name__}: {e}"}
            continue
        t_ray = time.perf_counter() - t0
        want = oracle_df(sf_dir, oracles[name])
        t_sql = time.perf_counter() - t0 - t_ray
        problems = compare(name, got, want)
        stamp = f"  [ray {t_ray:.2f}s sql {t_sql:.2f}s]" if timing else ""
        records[name] = {
            "status": "exact" if not problems else "fail",
            "rows": int(len(got)),
            "ray_sec": round(t_ray, 3),
            "sql_sec": round(t_sql, 3),
        }
        if problems:
            bad += 1
            records[name]["diffs"] = problems
            print(f"{name}: FAIL{stamp}", flush=True)
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name}: exact{stamp}", flush=True)
    total_s = time.perf_counter() - t_start
    if timing:
        print(f"TOTAL {total_s:.1f}s for {len(names)} queries")
    if json_out:
        summary = {
            "sf_dir": sf_dir,
            "n_queries": len(names),
            "n_exact": sum(1 for r in records.values() if r["status"] == "exact"),
            "n_fail": bad,
            "total_sec": round(total_s, 1),
            "queries": records,
        }
        with open(json_out, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
