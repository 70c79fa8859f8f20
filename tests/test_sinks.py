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


def test_range_partitioned_write_balance_and_pruning(ray_session, tmp_path):
    """Sketch-planned value-range layout: one KLL pass picks splitters, the
    write lands one dir per range; every row sits inside its dir's value
    interval (prunable by predicate), partitions are balanced within the
    sketch's rank-error slack, and an explicit splitter plan reproduces the
    layout exactly."""
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fever_ray.io_.sinks import plan_range_splitters, range_partitioned_write

    rng = np.random.default_rng(23)
    vals = rng.lognormal(4.0, 1.0, 40000)  # skewed — equal-width would fail
    ds = rd.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)

    out = str(tmp_path / "ranged")
    n_parts = 8
    res = range_partitioned_write(ds, "v", out, n_parts=n_parts)
    edges = np.array(res["splitters"])
    assert (np.diff(edges) > 0).all() and len(edges) <= n_parts - 1

    # manifest round-trips
    manifest = json.loads(open(os.path.join(out, "_splitters.json")).read())
    assert manifest["column"] == "v" and manifest["splitters"] == res["splitters"]

    # every row inside its dir's interval; partitions balanced
    sizes = {}
    for d in sorted(os.listdir(out)):
        if not d.startswith("range_id="):
            continue
        rid = int(d.split("=", 1)[1])
        t = pq.read_table(os.path.join(out, d))
        v = t.column("v").to_numpy()
        if rid > 0:
            assert (v >= edges[rid - 1]).all()
        if rid < len(edges):
            assert (v < edges[rid]).all()
        sizes[rid] = t.num_rows
    assert sum(sizes.values()) == len(vals)
    assert len(sizes) == n_parts
    assert max(sizes.values()) <= 2 * len(vals) / n_parts  # balanced-ish

    # an explicit plan reproduces the exact same assignment
    out2 = str(tmp_path / "ranged2")
    res2 = range_partitioned_write(ds, "v", out2, splitters=res["splitters"])
    assert res2["splitters"] == res["splitters"]
    for rid, n in sizes.items():
        assert pq.read_table(os.path.join(out2, f"range_id={rid}")).num_rows == n

    # the plan itself is one sketch pass and deterministic
    again = plan_range_splitters(ds, "v", n_parts)
    assert again == res["splitters"]

    # reader-side pruning from _splitters.json alone: complete (every dir
    # holding a match is returned) and tight (only interval-overlapping
    # dirs), mirroring the writer's boundary convention exactly
    from fever_ray.io_.sinks import prune_range_dirs

    lo, hi = float(np.quantile(vals, 0.3)), float(np.quantile(vals, 0.6))
    pruned = {os.path.basename(d) for d in prune_range_dirs(out, lo, hi)}
    expect = set()
    for rid, _ in sizes.items():
        d_lo = edges[rid - 1] if rid > 0 else -np.inf
        d_hi = edges[rid] if rid < len(edges) else np.inf
        if d_lo <= hi and lo < d_hi:
            expect.add(f"range_id={rid}")
    assert pruned == expect
    assert len(prune_range_dirs(out)) == n_parts  # unbounded = everything
