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
    ``reloaded`` and applies to every shard from that iteration on.
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
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return
            if poll_s:
                time.sleep(poll_s)
            # NOT a yield: an idle poll with an unchanged corpus reports
            # nothing, fever-style (flush timers fire on data)
            last_sha = sha
            continue

        n_matches = 0
        if pending:
            matcher = PageIocMatcher(
                bloom_bytes, blacklist=blacklist, alert_prefix=alert_prefix
            )

            def match_shard(batch: pa.Table) -> pa.Table:
                # one shard per task (read_parquet include_paths guides
                # the split below); matching itself is the standard
                # vectorized matcher
                return matcher(batch)

            for f in pending:
                out = []
                for t in (
                    rd.read_parquet(f, columns=["url"])
                    .map_batches(match_shard, batch_format="pyarrow")
                    .to_arrow_refs()
                ):
                    tab = ray.get(t)
                    if tab.num_rows and tab.num_columns:
                        out.append(tab)
                table = (
                    pa.concat_tables(out) if out
                    else pa.table(
                        {f.name: pa.array([], f.type) for f in page_match_schema}
                    )
                )
                key = partition_key(f)
                ppath = os.path.join(out_dir, "parts", f"{key}.parquet")
                _atomic_write(ppath, lambda p: pq.write_table(table, p))
                manifest = {
                    "partition": key,
                    "input_path": f,
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
                n_matches += table.num_rows

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
