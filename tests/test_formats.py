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


# ------------------------------------------------------------ file bloom index
def test_file_bloom_index_prunes_files(ray_session, tmp_path):
    """Each file's urls resolve to (at least) that file; a value present
    in two files lists both; an absent value prunes everything at p=1e-6
    (no false negatives is the hard guarantee, checked for every planted
    value); rebuild overwrites atomically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fever_ray.io_.fileindex import (
        build_file_bloom_index, lookup_file_bloom_index,
    )

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    files = {}
    for i in range(3):
        urls = [f"https://f{i}.com/p{j}" for j in range(50)]
        if i > 0:
            urls.append("https://shared.example/x")  # in files 1 and 2
        path = str(corpus / f"part-{i}.parquet")
        pq.write_table(pa.table({"url": pa.array(urls)}), path)
        files[i] = (path, urls)

    out = build_file_bloom_index(str(corpus), str(tmp_path / "idx"), column="url")
    assert out["files"] == 3

    probes = ["https://f0.com/p7", "https://f2.com/p49",
              "https://shared.example/x", "https://absent.example/none"]
    got = lookup_file_bloom_index(str(tmp_path / "idx"), probes)
    assert files[0][0] in got["https://f0.com/p7"]
    assert files[2][0] in got["https://f2.com/p49"]
    assert set(got["https://shared.example/x"]) >= {files[1][0], files[2][0]}
    assert got["https://absent.example/none"] == []
    # every planted url must hit its own file (no false negatives)
    for i, (path, urls) in files.items():
        sample = lookup_file_bloom_index(str(tmp_path / "idx"), urls[:5])
        assert all(path in v for v in sample.values())
    # rebuild is idempotent
    out2 = build_file_bloom_index(str(corpus), str(tmp_path / "idx"), column="url")
    assert out2["files"] == 3
