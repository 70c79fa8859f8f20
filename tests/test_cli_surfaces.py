"""CLI drive tests for the 19th-session surfaces: links (+ --pagerank),
plan (groupby + join), warc (+ --lang-id, resume), lcount, check --suggest.
All through cli.main with the session Ray (cli._init_ray is guarded)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fever_ray import cli


@pytest.fixture(scope="module")
def linked_dir(ray_session, tmp_path_factory):
    from fever_ray.gen.pages import write_pages

    d = str(tmp_path_factory.mktemp("cli") / "lp")
    write_pages(d, 4000, n_files=4, seed=11, links_per_page=3)
    return d


def _line(capsys) -> dict:
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_links_summary_graph_and_pagerank(linked_dir, tmp_path, capsys):
    out = str(tmp_path / "graph")
    rc = cli.main(["links", "--input", linked_dir, "--out", out, "--pagerank"])
    assert rc == 0
    line = _line(capsys)
    assert line["links"] > 0 and line["edges"] > 0
    # Zipf corpus: the rank-1 host dominates both in-links and PageRank
    assert line["top_hub"].startswith("alpha0")
    assert line["pagerank_top"][0]["host"].startswith("alpha0")
    ranks = [r["rank"] for r in line["pagerank_top"]]
    assert ranks == sorted(ranks, reverse=True)
    # edge table written and consistent with the summary
    edges = pq.read_table(
        [os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")]
    )
    assert edges.num_rows == line["edges"]
    assert int(pa.compute.sum(edges.column("n_links")).as_py()) == line["links"]


def test_cli_plan_groupby_and_join(linked_dir, capsys):
    rc = cli.main(["plan", "--input", linked_dir, "--column", "hostname"])
    assert rc == 0
    g = _line(capsys)
    assert g["strategy"] == "tree_groupby" and g["salt_fanout"] >= 4
    assert "alpha0" in g["probe"]["top_keys"][0][0]
    rc = cli.main(
        ["plan", "--input", linked_dir, "--column", "hostname",
         "--right-input", linked_dir]
    )
    assert rc == 0
    j = _line(capsys)
    assert j["blowup"] and set(j["skewed_sides"]) == {"left", "right"}
    assert j["join_size_est"] > 0


def test_cli_warc_roundtrip_resume_langid(ray_session, tmp_path, capsys):
    from fever_ray.gen.pages import generate_pages
    from fever_ray.io_.warc import write_warc

    t = generate_pages(200, seed=6)
    arch = tmp_path / "arch"
    write_warc(t.slice(0, 100), str(arch / "a.warc"))
    write_warc(t.slice(100, 100), str(arch / "b.warc"), compress=True)
    out = str(tmp_path / "wp")
    rc = cli.main(["warc", "--input", str(arch), "--out", out, "--lang-id"])
    assert rc == 0
    first = _line(capsys)
    assert first["completed"] == 2 and first["records"] == 200
    rc = cli.main(["warc", "--input", str(arch), "--out", out])
    assert rc == 0
    again = _line(capsys)
    assert again["completed"] == 0 and again["skipped"] == 2
    parts = [os.path.join(out, "parts", f) for f in os.listdir(out + "/parts")]
    back = pa.concat_tables([pq.read_table(p) for p in parts])
    assert back.num_rows == 200
    # lang filled (word-salad gen text classifies 'und'), text = extractor
    assert set(back.column("lang").to_pylist()) == {"und"}
    assert sorted(back.column("url").to_pylist()) == sorted(
        t.column("url").to_pylist()
    )


def test_cli_lcount_ingest_retract_cycle(ray_session, linked_dir, tmp_path, capsys):
    f = str(tmp_path / "d.lc")
    assert cli.main(["lcount", "create", f, "a", "b", "c"]) == 0
    capsys.readouterr()
    assert cli.main(
        ["lcount", "ingest", f, "--input", linked_dir, "--column", "url"]
    ) == 0
    mid = _line(capsys)
    assert mid["ingested"] == 4000 and mid["estimate"] > 3000
    assert cli.main(
        ["lcount", "ingest", f, "--input", linked_dir, "--column", "url",
         "--retract"]
    ) == 0
    end = _line(capsys)
    assert end["retract"] and end["n"] == 3 and end["debt"] == 0
    assert cli.main(["lcount", "show", f]) == 0
    assert _line(capsys)["estimate"] == 3.0


def test_cli_check_suggest_passes_own_suite(ray_session, linked_dir, capsys):
    rc = cli.main(["check", "--input", linked_dir, "--suggest"])
    assert rc == 0
    lines = [json.loads(s) for s in capsys.readouterr().out.strip().splitlines()]
    assert lines[-1]["all_passed"] and lines[-1]["checks"] >= 4
    sug = lines[0]
    assert "lang" in sug["profile"] and len(sug["profile"]["lang"]["domain"]) == 12


def test_cli_follow_tail_journal(ray_session, tmp_path, capsys):
    journal = str(tmp_path / "events.jsonl")
    spool = str(tmp_path / "spool")
    with open(journal, "w") as fh:
        for i in range(200):
            fh.write(
                json.dumps(
                    {
                        "event_id": i,
                        "ts": f"2024-01-01T00:{i % 60:02d}:00",
                        "user_id": i % 11,
                        "event_type": ["view", "click"][i % 2],
                        "value": i / 2.0,
                        "props": "{}",
                    }
                )
                + "\n"
            )
    rc = cli.main(
        ["follow", "--input", spool, "--checkpoint", str(tmp_path / "ck"),
         "--tail-journal", journal, "--poll", "0", "--max-iterations", "1"]
    )
    assert rc == 0
    line = _line(capsys)
    assert line["new_files"] == 1
    assert round(line["estimates"]["hll_users"]) == 11
    # append + rerun resumes: only the new segment processed
    with open(journal, "a") as fh:
        fh.write(
            json.dumps(
                {"event_id": 999, "ts": "2024-01-01T01:00:00", "user_id": 99,
                 "event_type": "view", "value": 0.0, "props": "{}"}
            )
            + "\n"
        )
    rc = cli.main(
        ["follow", "--input", spool, "--checkpoint", str(tmp_path / "ck"),
         "--tail-journal", journal, "--poll", "0", "--max-iterations", "1"]
    )
    assert rc == 0
    line = _line(capsys)
    assert line["new_files"] == 1 and line["total_files"] == 2
    assert round(line["estimates"]["hll_users"]) == 12


def test_cli_ioc_follow_live_reload(ray_session, tmp_path, capsys):
    from fever_ray.sketches.bloom import BloomFilter, build_filter

    land = tmp_path / "land"
    land.mkdir()
    bloom = str(tmp_path / "iocs.bloom")
    build_filter(["evil-a.test"], n=1000, p=1e-7).save(bloom)
    pq.write_table(
        pa.table({"url": ["http://evil-a.test/1", "http://evil-b.test/1"]}),
        str(land / "s1.parquet"),
    )
    args = ["ioc", "--input", str(land), "--bloom-file", bloom, "--follow",
            "--out", str(tmp_path / "m"), "--poll", "0",
            "--max-iterations", "1"]
    assert cli.main(args) == 0
    assert _line(capsys)["matches"] == 1
    # live mgmt mutation between polls
    bf = BloomFilter.load_with_fallback(bloom)
    bf.add(["evil-b.test"])
    bf.save(bloom)
    pq.write_table(
        pa.table({"url": ["http://evil-b.test/2"]}), str(land / "s2.parquet")
    )
    assert cli.main(args) == 0
    line = _line(capsys)
    assert line["matches"] == 1 and line["total_matches"] == 2


def test_cli_slurp_rotated_tables(ray_session, tmp_path, capsys):
    import sqlite3

    import numpy as np

    src = str(tmp_path / "ev.parquet")
    n = 300
    ts = 1_700_000_000_000_000 + np.arange(n, dtype=np.int64) * 3_600_000_000 // 4
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(np.linspace(0, 1, n)),
            }
        ),
        src,
    )
    db = str(tmp_path / "s.db")
    rc = cli.main(["slurp", "--input", src, "--db", db, "--rotation", "86400"])
    assert rc == 0
    line = _line(capsys)
    assert line["rows"] == n and line["tables"] >= 3
    conn = sqlite3.connect(db)
    tabs = [r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'").fetchall()]
    assert len(tabs) == line["tables"]
    total = sum(conn.execute(f'SELECT COUNT(*) FROM "{t}"').fetchone()[0]
                for t in tabs)
    assert total == n
    conn.close()


def test_cli_mediadup_finds_planted_payload_dups(linked_dir, tmp_path, capsys):
    """mediadup at distance 0 over a gen corpus: the planted 5% duplicate
    pages (re-crawled urls, distinct (url, ts) ids) pair via the
    fallback codes; the pair table round-trips through --out."""
    out = str(tmp_path / "dup_pairs")
    rc = cli.main(
        ["mediadup", "--input", linked_dir, "--max-hamming", "0",
         "--out", out]
    )
    assert rc == 0
    line = _line(capsys)
    n = 4000
    # ~5% of rows are payload copies; each contributes >= 1 pair
    assert line["pairs"] >= int(n * 0.04)
    assert all(s["hamming"] == 0 for s in line["sample"])
    t = pq.read_table(out)
    assert t.num_rows == line["pairs"]
    assert set(t.column_names) == {"doc_a", "doc_b", "hamming"}

    rc = cli.main(
        ["mediadup", "--input", linked_dir, "--modality", "audio",
         "--max-hamming", "0"]
    )
    assert rc == 0
    assert _line(capsys)["pairs"] >= int(n * 0.04)


def test_cli_bloom_mgmt_serve_and_client(tmp_path, capsys):
    """`bloom serve --socket` + the client verbs (add/show/save/reload over
    the socket) — the fever bloom mgmt CLI face (cmd/fever/cmds/bloom.go),
    server run in a thread the way a daemon would host it."""
    import threading

    from fever_ray.io_.mgmt import MgmtServer
    from fever_ray.sketches.bloom import BloomFilter, build_filter

    f = str(tmp_path / "iocs.bloom")
    build_filter(["seed.test"], n=1000, p=1e-7).save(f)
    sock = str(tmp_path / "mgmt.sock")
    with MgmtServer(f, sock):
        assert cli.main(["bloom", "add", f, "live.test", "--socket", sock]) == 0
        assert _line(capsys)["added"] == 1
        assert cli.main(["bloom", "show", f, "--socket", sock]) == 0
        info = _line(capsys)
        assert info["has_bloom"] and info["elements"] >= 2
        # live add not yet on disk; save flips the artifact generation
        assert not BloomFilter.load_with_fallback(f).check_one("live.test")
        assert cli.main(["bloom", "save", f, "--socket", sock]) == 0
        assert BloomFilter.load_with_fallback(f).check_one("live.test")
        assert cli.main(["bloom", "reload", f, "--socket", sock]) == 0
    # save/reload without a socket is a usage error, not a silent no-op
    assert cli.main(["bloom", "save", f]) == 2


def test_cli_bloom_serve_duration_smoke(tmp_path, capsys):
    """`bloom serve --duration` exits on its own and prints the info line
    plus a stats line (usable under a process supervisor)."""
    from fever_ray.sketches.bloom import build_filter

    f = str(tmp_path / "iocs.bloom")
    build_filter(["seed.test"], n=100, p=1e-6).save(f)
    sock = str(tmp_path / "mgmt.sock")
    rc = cli.main(["bloom", "serve", f, "--socket", sock, "--duration", "0.3"])
    assert rc == 0
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert lines[0]["socket"] == sock and lines[0]["has_bloom"]
    assert "requests" in lines[-1]
