"""Driver-parity harness: run every ``queries()`` entry at sf0.001 and
compare row-count + schema + order-insensitive values against
``oracle_sql()`` via DuckDB — the same check CORRECTNESS_r{N}.json records.
Entries without an oracle get the weaker rows-only check."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _oracle_df(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(ray_session, sf_dir, name):
    got = _normalize(_to_df(QUERIES[name](sf_dir)))
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(got) >= 0
        return
    want = _normalize(_oracle_df(sf_dir, ORACLES[name]))
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) >= 1
    assert set(["sketch", "kind", "estimate", "detail"]).issubset(df.columns)
