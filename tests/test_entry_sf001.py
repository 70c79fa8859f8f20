"""Driver-parity at sf0.01 — the exact scale the correctness gate uses.

Round-1 lesson: the gate hashes VALUES (including dtype), so a tolerant
rtol compare let six dtype/ulp mismatches ship red.  This test is now
bit-exact via tests/strict_compare.compare — any dtype or last-ulp drift
fails here before the driver sees it."""

import pytest

from tests.strict_compare import compare, oracle_df, to_df
from tests.test_entry_parity import ORACLES, QUERIES

SF01 = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle_sf001(ray_session, name):
    got = to_df(QUERIES[name](SF01))
    want = oracle_df(SF01, ORACLES[name])
    problems = compare(name, got, want)
    assert not problems, f"{name}: " + "; ".join(problems)
