"""Follow-mode (growing-directory tail) semantics: each iteration
processes only unseen shards, the merged suite always reflects every
shard ever seen, a restart resumes from the manifest, and an idle
directory terminates via max_idle_polls."""

import glob
import shutil

import numpy as np

from fever_ray.core.udaf import SketchSpec
from fever_ray.io_.checkpoint import run_partitioned_build
from fever_ray.pipelines.follow import follow

SPECS = [
    SketchSpec("hll_urls", "hll", "url", {"p": 12}),
    SketchSpec("cms_langs", "cms", "lang", {"width": 512, "depth": 5}, track=True),
]


def test_follow_incremental_matches_batch(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    assert len(files) == 4
    land = tmp_path / "landing"
    land.mkdir()
    ck = str(tmp_path / "ck")

    # land the first two shards, start following
    for f in files[:2]:
        shutil.copy(f, land)
    it = follow(str(land / "*.parquet"), SPECS, ck, poll_s=0, max_idle_polls=1)
    s1 = next(it)
    assert s1["iteration"] == 1
    assert len(s1["new_files"]) == 2 and s1["total_files"] == 2

    # two more shards arrive; the next iteration processes ONLY them
    for f in files[2:]:
        shutil.copy(f, land)
    s2 = next(it)
    assert sorted(s2["new_files"]) == sorted(
        str(land / f.split("/")[-1]) for f in files[2:]
    )
    assert len(s2["skipped_files"]) == 2

    # the merged suite equals a one-shot batch build over all four shards
    control = run_partitioned_build(
        sorted(glob.glob(str(land / "*.parquet"))), SPECS, str(tmp_path / "ck2")
    )
    assert np.array_equal(
        s2["sketches"]["hll_urls"].registers,
        control["sketches"]["hll_urls"].registers,
    )
    assert np.array_equal(
        s2["sketches"]["cms_langs"].table, control["sketches"]["cms_langs"].table
    )

    # nothing new → idle poll limit ends the generator
    assert list(it) == []


def test_follow_restart_resumes(ray_session, pages_dir, tmp_path):
    files = sorted(glob.glob(pages_dir + "/*.parquet"))
    land = tmp_path / "landing"
    land.mkdir()
    for f in files:
        shutil.copy(f, land)
    ck = str(tmp_path / "ck")

    s1 = next(follow(str(land / "*.parquet"), SPECS, ck, poll_s=0, max_iterations=1))
    assert len(s1["new_files"]) == 4

    # a "restarted daemon" reports the resumed state without recomputation
    s2 = next(follow(str(land / "*.parquet"), SPECS, ck, poll_s=0, max_iterations=1))
    assert s2["new_files"] == []
    assert len(s2["skipped_files"]) == 4
    assert np.array_equal(
        s1["sketches"]["hll_urls"].registers, s2["sketches"]["hll_urls"].registers
    )
