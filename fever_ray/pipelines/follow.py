"""Follow mode — the batch-native analog of the reference's daemon loop.

fever runs forever, consuming an endless EVE stream and flushing
aggregates on a timer (/root/reference/cmd/fever/cmds/run.go:34-601 wires
the channels; flush timers at :647-650).  The Ray Data equivalent of an
endless stream is a GROWING DIRECTORY of immutable shard files (the shape
object-store landing zones actually have): ``follow`` polls an input glob,
pushes every unseen shard through the checkpointed partitioned build
(`io_.checkpoint.run_partitioned_build` — atomic per-partition partials,
manifest-last, so a crash mid-iteration resumes exactly), and yields the
freshly merged sketch suite after each iteration.

Properties that matter at scale:

* **Incremental**: an iteration costs O(new shards); finished partitions
  are never recomputed (manifest skip).
* **Crash-safe**: kill -9 between or during iterations loses nothing —
  the next call resumes from the manifest, identical results.
* **Merge-fresh**: the global suite is re-merged from ALL partition
  partials each iteration (partials are KB-sized; the merge is driver-side
  over manifest-listed blobs), so every yield reflects every shard ever
  seen — the analog of fever's periodic aggregate flush.
"""

from __future__ import annotations

import glob as _glob
import time
from typing import Callable, Iterator

from ..core.udaf import SketchSpec
from ..io_.checkpoint import run_partitioned_build


def follow(
    input_glob: str,
    specs: list[SketchSpec],
    out_dir: str,
    poll_s: float = 5.0,
    max_iterations: int | None = None,
    max_idle_polls: int | None = None,
    prepare: Callable | None = None,
    pre_poll: Callable | None = None,
) -> Iterator[dict]:
    """Yield one status dict per iteration:

    ``{"iteration", "new_files", "skipped_files", "total_files",
    "sketches": {name: sketch}}``

    Stops after ``max_iterations`` yields, or after ``max_idle_polls``
    consecutive polls that found no new files (both None = run forever,
    fever-style).  ``poll_s`` sleeps only between *idle* polls, so a test
    can drive it with ``poll_s=0``.  ``pre_poll`` (if given) runs before
    every glob — the live-tail hook (`io_.tail.cut_segments`) that turns a
    growing journal into new spool shards for this loop to find.
    """
    from ..io_.checkpoint import done_partitions

    iteration = 0
    idle = 0
    first = True
    while True:
        if pre_poll is not None:
            pre_poll()
        files = sorted(_glob.glob(input_glob))
        # cheap pre-check: when every globbed file is already in the
        # manifest (and we've reported at least once), skip the build —
        # otherwise every idle poll would re-read and re-merge EVERY
        # partition's partials just to discard the result
        if not first:
            done_inputs = {r["input_path"] for r in done_partitions(out_dir).values()}
            if all(f in done_inputs for f in files):
                idle += 1
                if max_idle_polls is not None and idle >= max_idle_polls:
                    return
                if poll_s:
                    time.sleep(poll_s)
                continue
        result = run_partitioned_build(files, specs, out_dir, prepare=prepare)
        new = result["completed"]
        # the first poll always yields (reports the resumed state even when
        # nothing is new); afterwards only progress yields
        if new or first:
            first = False
            idle = 0
            iteration += 1
            yield {
                "iteration": iteration,
                "new_files": sorted(r["input_path"] for r in new),
                "skipped_files": list(result["skipped"]),
                "total_files": len(files),
                "sketches": result["sketches"],
            }
            if max_iterations is not None and iteration >= max_iterations:
                return
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return
            if poll_s:
                time.sleep(poll_s)
