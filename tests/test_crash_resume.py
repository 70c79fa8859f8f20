"""Hard-kill crash safety: SIGKILL a checkpointed build mid-run in a real
subprocess, then resume in-process — completed partitions survive, nothing
is recomputed twice, and the final sketches are bit-identical to an
uninterrupted control build."""

import glob
import os
import signal
import subprocess
import sys
import time

import numpy as np

from fever_ray.core.udaf import SketchSpec
from fever_ray.io_.checkpoint import done_partitions, run_partitioned_build

SPECS = [
    SketchSpec("hll_urls", "hll", "url", {"p": 12}),
    SketchSpec("cms_langs", "cms", "lang", {"width": 512, "depth": 5}, track=True),
]

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from fever_ray.core.udaf import SketchSpec
from fever_ray.io_.checkpoint import run_partitioned_build
SPECS = [
    SketchSpec("hll_urls", "hll", "url", {{"p": 12}}),
    SketchSpec("cms_langs", "cms", "lang", {{"width": 512, "depth": 5}}, track=True),
]
import glob
files = sorted(glob.glob({pages!r} + "/*.parquet"))
run_partitioned_build(files, SPECS, {ck!r}, batch_size=64)
print("CHILD_DONE", flush=True)
"""


def test_sigkill_mid_build_then_resume(ray_session, pages_dir, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = str(tmp_path / "ck")
    files = sorted(glob.glob(pages_dir + "/*.parquet"))

    # start the build in a real subprocess and SIGKILL it as soon as at
    # least one (but not every) partition manifest exists
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD.format(repo=repo, pages=pages_dir, ck=ck)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
    )
    killed = False
    deadline = time.time() + 120
    while time.time() < deadline:
        n_done = len(done_partitions(ck))
        if 0 < n_done < len(files):
            os.kill(proc.pid, signal.SIGKILL)
            killed = True
            break
        if proc.poll() is not None:
            break  # finished before we could interrupt — still a valid run
        time.sleep(0.05)
    proc.wait(timeout=60)

    surviving = set(done_partitions(ck))
    if killed:
        assert 0 < len(surviving) < len(files) + 1

    # resume in-process: only the missing partitions are computed
    r = run_partitioned_build(files, SPECS, ck, batch_size=64)
    resumed_done = set(done_partitions(ck))
    assert len(resumed_done) == len(files)
    assert surviving <= resumed_done
    recomputed = {c["partition"] for c in r["completed"]}
    assert recomputed.isdisjoint(surviving)

    # control: uninterrupted build → bit-identical sketches
    ctl = run_partitioned_build(files, SPECS, str(tmp_path / "ck2"), batch_size=64)
    assert np.array_equal(
        r["sketches"]["hll_urls"].registers, ctl["sketches"]["hll_urls"].registers
    )
    assert np.array_equal(
        r["sketches"]["cms_langs"].table, ctl["sketches"]["cms_langs"].table
    )
