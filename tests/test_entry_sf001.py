"""Driver-parity at sf0.01 — the exact scale the correctness gate uses.
Marked slow; run explicitly or as part of the full suite."""

import pytest

from tests.test_entry_parity import ORACLES, QUERIES, _normalize, _oracle_df, _to_df

import pandas as pd

SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle_sf001(ray_session, name):
    got = _normalize(_to_df(QUERIES[name](SF01)))
    want = _normalize(_oracle_df(SF01, ORACLES[name]))
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )
