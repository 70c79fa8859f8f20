"""Rotated writes, retention cap, resumable transform-write."""

import glob
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from fever_ray.io_.sinks import expire_partitions, resumable_transform_write, rotated_write


def test_rotated_write_and_expiry(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "rotated")
    rotated_write(rd.read_parquet(f"{sf_dir}/events.parquet"), out, ts_col="ts", bucket_s=86400)
    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(buckets) > 1
    # round-trip row count
    total = pq.read_table(out).num_rows
    assert total == rd.read_parquet(f"{sf_dir}/events.parquet").count()
    # retention: cap to roughly half → oldest buckets removed
    sizes = sum(
        os.path.getsize(p) for p in glob.glob(out + "/bucket=*/*")
    )
    removed = expire_partitions(out, max_total_bytes=sizes // 2)
    assert removed
    remaining = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert remaining and remaining[0] > buckets[0]  # oldest gone


def test_resumable_transform_write(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    out = str(tmp_path / "rw")

    def transform(batch):
        return batch.select(["url", "lang"]).filter(
            pc.equal(batch.column("lang"), "en")
        )

    r1 = resumable_transform_write(files[:2], transform, out, batch_size=256)
    assert len(r1["completed"]) == 2
    r2 = resumable_transform_write(files, transform, out, batch_size=256)
    assert len(r2["completed"]) == 2  # only the two new ones
    assert len(r2["skipped"]) == 2
    # all four partitions now present; contents correct
    parts = glob.glob(out + "/parts/*.parquet")
    assert len(parts) == 4
    t = pq.read_table(parts[0])
    assert set(t.column_names) == {"url", "lang"}
    assert set(t.column("lang").to_pylist()) <= {"en"}
