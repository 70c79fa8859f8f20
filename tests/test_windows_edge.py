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
