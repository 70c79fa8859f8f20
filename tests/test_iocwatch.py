"""Live-filter daemon IoC matching (pipelines.iocwatch): new shards match
against the filter live at arrival, a mutated artifact is picked up
without restart (BloomAdd/Reload mgmt analogue), history is not
rescanned, and a restarted daemon resumes from the manifest."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from fever_ray.pipelines.iocwatch import ioc_follow
from fever_ray.sketches.bloom import build_filter, BloomFilter


def _shard(path, urls):
    pq.write_table(pa.table({"url": pa.array(urls, pa.string())}), str(path))


URLS_1 = [
    "http://evil-a.test/x1",
    "http://benign.test/ok",
    "http://evil-b.test/y1",
]
URLS_2 = [
    "http://evil-a.test/x2",
    "http://evil-b.test/y2",
    "http://benign.test/ok2",
]


def test_ioc_follow_live_reload_and_resume(ray_session, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    bloom_path = str(tmp_path / "iocs.bloom")
    out = str(tmp_path / "matches")
    build_filter(["evil-a.test"], n=1000, p=1e-7).save(bloom_path)

    _shard(land / "s1.parquet", URLS_1)
    it = ioc_follow(
        str(land / "*.parquet"), bloom_path, out, poll_s=0, max_idle_polls=1
    )
    s1 = next(it)
    assert s1["iteration"] == 1 and len(s1["new_files"]) == 1
    # only evil-a matches under the initial filter
    assert s1["matches"] == 1 and not s1["reloaded"]

    # the mgmt-plane mutation: add an indicator to the artifact while the
    # daemon runs — NO restart
    bf = BloomFilter.load_with_fallback(bloom_path)
    bf.add(["evil-b.test"])
    bf.save(bloom_path)

    _shard(land / "s2.parquet", URLS_2)
    s2 = next(it)
    assert s2["reloaded"] is True
    assert s2["bloom_sha"] != s1["bloom_sha"]
    # shard2 matches BOTH indicators; shard1 is NOT rescanned (fever's
    # stream-position semantics: mutations apply to future traffic)
    assert s2["matches"] == 2
    assert s2["total_matches"] == 3
    assert list(it) == []  # idle → terminate

    # every match row records which filter generation caught it
    manifests = sorted((tmp_path / "matches" / "manifest").glob("*.json"))
    recs = [json.loads(p.read_text()) for p in manifests]
    shas = {r["input_path"].split("/")[-1]: r["bloom_sha"] for r in recs}
    assert shas["s1.parquet"] == s1["bloom_sha"]
    assert shas["s2.parquet"] == s2["bloom_sha"]

    # restarted daemon resumes: nothing new → zero-work first report with
    # the manifest total intact
    s3 = next(
        ioc_follow(
            str(land / "*.parquet"), bloom_path, out, poll_s=0, max_iterations=1
        )
    )
    assert s3["new_files"] == [] and s3["matches"] == 0
    assert s3["total_matches"] == 3

    # the match parquet itself carries the urls
    parts = sorted((tmp_path / "matches" / "parts").glob("*.parquet"))
    rows = pa.concat_tables([pq.read_table(str(p)) for p in parts])
    urls = sorted(rows.column("url").to_pylist())
    assert urls == [
        "http://evil-a.test/x1",
        "http://evil-a.test/x2",
        "http://evil-b.test/y2",
    ]


def test_ioc_follow_reload_during_idle_is_reported(ray_session, tmp_path):
    """An artifact rewritten while the corpus is idle must surface as a
    reload-only status row (new_files=[]) — idle polls must not absorb
    the generation change (ADVICE r3: last_sha advanced on idle)."""
    land = tmp_path / "landing"
    land.mkdir()
    bloom_path = str(tmp_path / "iocs.bloom")
    out = str(tmp_path / "matches")
    build_filter(["evil-a.test"], n=1000, p=1e-7).save(bloom_path)

    _shard(land / "s1.parquet", URLS_1)
    it = ioc_follow(
        str(land / "*.parquet"), bloom_path, out, poll_s=0, max_idle_polls=3
    )
    s1 = next(it)
    assert s1["matches"] == 1 and not s1["reloaded"]

    # rewrite the artifact with NO new shards: the next status row must
    # report the reload even though there is nothing to scan
    bf = BloomFilter.load_with_fallback(bloom_path)
    bf.add(["evil-b.test"])
    bf.save(bloom_path)
    s2 = next(it)
    assert s2["reloaded"] is True
    assert s2["new_files"] == [] and s2["matches"] == 0
    assert s2["bloom_sha"] != s1["bloom_sha"]
    # and the generation is not re-reported on the next data iteration
    _shard(land / "s2.parquet", URLS_2)
    s3 = next(it)
    assert s3["reloaded"] is False and s3["matches"] == 2
