"""CSV / Arrow-IPC source parity: the same events land with the same
values and the same downstream aggregate results as the parquet path."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fever_ray.io_.formats import (
    read_event_csv,
    read_event_ipc,
    write_event_csv,
    write_event_ipc,
)


@pytest.fixture(scope="module")
def event_fixture(ray_session, sf_dir, tmp_path_factory):
    t = pq.read_table(f"{sf_dir}/events.parquet")
    d = tmp_path_factory.mktemp("formats")
    csv_path = str(d / "events.csv")
    ipc_path = str(d / "events.arrow")
    write_event_csv(t, csv_path)
    write_event_ipc(t, ipc_path)
    return t, csv_path, ipc_path


def _canon(df):
    return (
        df.sort_values("event_id")
        .reset_index(drop=True)
        .reindex(sorted(df.columns), axis=1)
    )


def test_csv_parquet_parity(event_fixture):
    t, csv_path, _ = event_fixture
    got = _canon(read_event_csv(csv_path).to_pandas())
    want = _canon(t.to_pandas())
    # CSV round-trips every value; ts normalized to us either way
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["value"].tolist() == want["value"].tolist()
    assert (got["ts"] == want["ts"]).all()


def test_ipc_parquet_parity(event_fixture):
    t, _, ipc_path = event_fixture
    got = _canon(read_event_ipc(ipc_path).to_pandas())
    want = _canon(t.to_pandas())
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert got["props"].tolist() == want["props"].tolist()
    assert (got["ts"] == want["ts"]).all()


def test_csv_source_feeds_aggregators(event_fixture, sf_dir):
    """Downstream parity: the dns_aggregator result over the CSV source is
    identical to the parquet source's."""
    import ray.data as rd

    import fever_ray.ops.aggregates as agg

    _, csv_path, _ = event_fixture
    via_csv = sorted(
        (r["event_type"], r["n_distinct_users"])
        for r in agg.dns_aggregator(read_event_csv(csv_path)).take_all()
    )
    via_parquet = sorted(
        (r["event_type"], r["n_distinct_users"])
        for r in agg.dns_aggregator(
            rd.read_parquet(f"{sf_dir}/events.parquet")
        ).take_all()
    )
    assert via_csv == via_parquet


def test_missing_columns_become_nulls(ray_session, tmp_path):
    p = str(tmp_path / "partial.csv")
    with open(p, "w") as fh:
        fh.write("event_id,event_type\n1,click\n2,view\n")
    out = read_event_csv(p).take_all()
    assert [r["event_id"] for r in out] == [1, 2]
    assert all(r["value"] is None and r["props"] is None for r in out)


def test_heterogeneous_ipc_shards_unify(ray_session, tmp_path):
    """A shard missing ts/value projects TYPED nulls, so blocks from mixed
    shards concat and unify instead of raising on schema conflict."""
    import pyarrow as pa

    full = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "event_type": pa.array(["click"]),
            "value": pa.array([1.5], pa.float64()),
        }
    )
    partial = pa.table(
        {"event_id": pa.array([2], pa.int64()), "event_type": pa.array(["view"])}
    )
    write_event_ipc(full, str(tmp_path / "a.arrow"))
    write_event_ipc(partial, str(tmp_path / "b.arrow"))
    out = read_event_ipc(str(tmp_path)).take_all()
    rows = {r["event_id"]: r for r in out}
    assert rows[1]["value"] == 1.5 and rows[1]["ts"] is not None
    assert rows[2]["value"] is None and rows[2]["ts"] is None
