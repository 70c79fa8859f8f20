"""Daemon IoC matching with a live indicator filter — the mgmt-plane
analogue.

fever mutates the Bloom filter of a RUNNING process over gRPC
(BloomAdd streams indicators into the live filter, BloomSave/BloomReload
persist/replace it — /root/reference/mgmt/mgmtserver.go:96-160,118-160)
and events seen AFTER the mutation match the new indicators; history is
not rescanned.  The batch-native mapping keeps exactly those semantics
with the artifact FILE as the control plane:

* ``cli bloom add`` (the BloomAdd analogue) rewrites the DCSO artifact;
* :func:`ioc_follow` — a poll loop over a growing shard directory that
  (a) re-reads the artifact whenever its content hash changes (the
  Reload analogue — no restart), and (b) matches ONLY unseen shards,
  each against the filter that was live when it arrived (fever's
  stream-position semantics), checkpointed via per-shard manifest
  entries that record the filter generation for lineage.

Crash-safe: matches land atomically per shard (tmp+rename, manifest
last), so a kill -9 anywhere resumes without duplicate or lost match
rows — the same contract as ``io_.checkpoint.run_partitioned_build``.
"""

from __future__ import annotations

import glob as _glob
import hashlib
import json
import os
import time
from typing import Iterator

from ..io_.checkpoint import _atomic_write, partition_key


def _bloom_generation(path: str) -> tuple[str, bytes]:
    """Content hash + bytes of the artifact (hash, not mtime: an add that
    produces identical bytes is not a reload)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    return hashlib.sha1(blob).hexdigest(), blob


def _done(out_dir: str) -> dict[str, dict]:
    done = {}
    for p in _glob.glob(os.path.join(out_dir, "manifest", "*.json")):
        with open(p) as fh:
            rec = json.load(fh)
        done[rec["partition"]] = rec
    return done


def ioc_follow(
    input_glob: str,
    bloom_path: str,
    out_dir: str,
    poll_s: float = 5.0,
    max_iterations: int | None = None,
    max_idle_polls: int | None = None,
    blacklist: tuple = (),
    alert_prefix: str = "Possibly bad traffic",
    compressed: bool = False,
) -> Iterator[dict]:
    """Yield one status dict per iteration:

    ``{"iteration", "new_files", "matches", "bloom_sha", "reloaded",
    "total_matches"}``

    ``matches`` counts only this iteration's rows; ``total_matches`` sums
    the manifest.  A changed artifact between iterations sets
    ``reloaded`` and applies to every shard from that iteration on; if it
    changes during an idle stretch (no new files), a reload-only status
    row (``new_files=[]``) is yielded so the generation change is never
    silently absorbed.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..ops.ioc import PageIocMatcher
    from ..sketches.bloom import BloomFilter

    page_match_schema = pa.schema(
        [
            ("url", pa.string()),
            ("ioc", pa.string()),
            ("match_type", pa.string()),
            ("signature", pa.string()),
        ]
    )

    os.makedirs(os.path.join(out_dir, "parts"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    iteration = 0
    idle = 0
    first = True
    last_sha: str | None = None
    while True:
        sha, blob = _bloom_generation(bloom_path)
        reloaded = last_sha is not None and sha != last_sha
        bloom_bytes = BloomFilter.load_with_fallback(
            bloom_path, compressed=compressed
        ).to_bytes()
        done = _done(out_dir)
        done_inputs = {r["input_path"] for r in done.values()}
        files = sorted(_glob.glob(input_glob))
        pending = [f for f in files if f not in done_inputs]
        if not pending and not first:
            if not reloaded:
                idle += 1
                if max_idle_polls is not None and idle >= max_idle_polls:
                    return
                if poll_s:
                    time.sleep(poll_s)
                # NOT a yield: an idle poll with an unchanged corpus AND
                # unchanged filter reports nothing, fever-style (flush
                # timers fire on data).  last_sha deliberately NOT
                # advanced here — it tracks the last REPORTED generation,
                # so an artifact rewritten during an idle stretch still
                # surfaces as reloaded=True on the next yield.
                continue
            # the artifact changed during an idle stretch: fall through
            # and yield a reload-only status row (new_files=[]) so the
            # filter-generation change is observable without data

        n_matches = 0
        if pending:
            # one Ray task per shard: match + atomic write + manifest all
            # INSIDE the task (the warc_to_pages_resumable contract), so
            # a 1000-shard backlog drains with full cluster parallelism
            # and a crash mid-backlog resumes at the manifest boundary.
            # A raw task (not a Dataset stage) because the unit of work
            # is one-file-one-atomic-sink — per-file write+rename+manifest
            # has no map_batches shape.
            bloom_ref = ray.put(bloom_bytes)

            @ray.remote
            def match_shard(path: str) -> int:
                import pyarrow.parquet as _pq

                m = PageIocMatcher(
                    ray.get(bloom_ref), blacklist=blacklist,
                    alert_prefix=alert_prefix,
                )
                src = _pq.read_table(path, columns=["url"])
                table = (
                    m(src)
                    if src.num_rows
                    else pa.table(
                        {f.name: pa.array([], f.type) for f in page_match_schema}
                    )
                )
                key = partition_key(path)
                ppath = os.path.join(out_dir, "parts", f"{key}.parquet")
                _atomic_write(ppath, lambda p: pq.write_table(table, p))
                manifest = {
                    "partition": key,
                    "input_path": path,
                    "rows": table.num_rows,
                    "payload_path": ppath,
                    "bloom_sha": sha,
                    "metrics": {"matches": table.num_rows},
                }
                _atomic_write(
                    os.path.join(out_dir, "manifest", f"{key}.json"),
                    lambda p: open(p, "w").write(
                        json.dumps(manifest, sort_keys=True)
                    ),
                )
                return table.num_rows

            # bounded in-flight window: a huge backlog must not flood the
            # scheduler or hold every shard's matches in flight at once
            window = 64
            futs: list = []
            for f in pending:
                futs.append(match_shard.remote(f))
                if len(futs) >= window:
                    done, futs = ray.wait(futs, num_returns=1)
                    n_matches += ray.get(done[0])
            n_matches += sum(ray.get(futs))

        first = False
        idle = 0
        iteration += 1
        done = _done(out_dir)
        yield {
            "iteration": iteration,
            "new_files": pending,
            "matches": n_matches,
            "bloom_sha": sha,
            "reloaded": reloaded,
            "total_matches": sum(r["rows"] for r in done.values()),
        }
        last_sha = sha
        if max_iterations is not None and iteration >= max_iterations:
            return
        if poll_s:
            time.sleep(poll_s)
