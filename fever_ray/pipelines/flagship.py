"""Flagship pipeline: the engine's end-to-end showcase.

    read_parquet(pages)                                (columnar, pruned)
      → map_batches(derive: hostname, text_len, html_len)   (stateless,
                                                        vectorized pyarrow)
      → ONE pass building ALL standard sketches         (mergeable UDAFs)
      + PageIocMatcher actor pool                       (bloom broadcast once
                                                        per actor)
      → summary table + match table

This is the Ray-Data-native re-expression of fever's main loop
(/root/reference/cmd/fever/cmds/run.go:598-600: one goroutine dispatching
each event to every registered handler): instead of dispatching rows to
handlers, every batch flows once through a vectorized stage that feeds all
sketches, and the stateful bloom matcher is an actor pool.
"""

from __future__ import annotations

import glob
import logging
import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from ..core.udaf import SketchSpec, build_sketches, finalize
from ..io_.checkpoint import run_partitioned_build
from ..ops.extract import extract_text, hostname_of
from ..ops.ioc import PageIocMatcher
from ..sketches.bloom import BloomFilter

STANDARD_SPECS = [
    SketchSpec("hll_urls", "hll", "url", {"p": 14}),
    SketchSpec("hll_hostnames", "hll", "hostname", {"p": 14}),
    SketchSpec("cms_hostnames", "cms", "hostname", {"width": 2048, "depth": 5}, track=True),
    SketchSpec("cms_langs", "cms", "lang", {"width": 2048, "depth": 5}, track=True),
    SketchSpec("tdigest_html_len", "tdigest", "html_len", {"delta": 100}, value_kind="float"),
    SketchSpec("kll_text_len", "kll", "text_len", {"k": 200}, value_kind="float"),
    # REQ: multiplicative tail-rank error (PODS 2021) — the p99.9+ member
    # KLL's additive bound can't serve at corpus scale
    SketchSpec("req_text_len", "req", "text_len", {"k": 32}, value_kind="float"),
    # DDSketch: value-relative error with bit-identical merges (VLDB 2019)
    SketchSpec("dd_text_len", "dd", "text_len", {"alpha": 0.01}, value_kind="float"),
    SketchSpec("kll_warc_ts", "kll", "warc_ts_us", {"k": 200}, value_kind="float"),
    # bloom partial = m/8 bytes PER BATCH partial; size n to the expected
    # DISTINCT key count (hostname pool), not the row count — at 10^12 docs
    # hostname-scale filters should be built per-partition (checkpoint path)
    # or via the groupby strategy, not per 16k-row batch
    SketchSpec("bloom_hostnames", "bloom", "hostname", {"n": 200_000, "p": 1e-6}),
    SketchSpec("theta_urls", "theta", "url", {"k": 4096}),
]


def derive_page_columns(batch: pa.Table, extract: bool = False) -> pa.Table:
    """Stateless vectorized derivations; drops the wide html payload AFTER
    computing its length (project early — html never reaches the shuffle).

    ``extract=True`` runs the pinned html→text extractor (the production
    path at 100 TB, where ``text`` doesn't pre-exist) and derives text
    stats from the extracted bytes.

    Tolerates NARROWED page tables (e.g. the output of ``cli curate``,
    which carries only url+text): each derived column appears only when
    its source column exists; ``run_flagship`` filters the sketch specs to
    what was derivable.  ``extract=True`` still requires html."""
    cols = set(batch.column_names)
    if extract and "html" not in cols:
        raise ValueError(
            "derive_page_columns: extract=True requires an 'html' column"
        )
    text = None
    if extract:
        text = extract_text(batch.column("html"))
    elif "text" in cols:
        text = batch.column("text")
    if "html" in cols:
        batch = batch.append_column(
            "html_len", pc.cast(pc.binary_length(batch.column("html")), "int64")
        )
    if text is not None:
        batch = batch.append_column(
            "text_len", pc.cast(pc.utf8_length(text), "int64")
        )
    if "url" in cols and "hostname" not in cols:
        batch = batch.append_column("hostname", hostname_of(batch.column("url")))
    if "warc_ts" in cols:
        batch = batch.append_column(
            "warc_ts_us", batch.column("warc_ts").cast(pa.int64())
        )
    return batch.drop_columns(
        [c for c in ("html", "text") if c in batch.column_names]
    )


def make_derive_fn(extract: bool = False):
    def derive(batch: pa.Table) -> pa.Table:
        return derive_page_columns(batch, extract=extract)

    return derive


def pages_dataset(path: str, columns=None, override_num_blocks: int | None = None):
    import ray.data as rd

    if os.path.isdir(path):
        path = path.rstrip("/") + "/"
    kwargs = {}
    if override_num_blocks:
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=columns, **kwargs)


def specs_for_input(pages_path: str, extract: bool = False):
    """Filter the standard sketch suite to what the INPUT can derive:
    narrowed page tables (e.g. cli curate output with only url+text) run
    the sketches their columns support instead of crashing on the
    full-schema read.  Returns (specs, source-column set); raises when
    ``extract=True`` finds no html, or when NO sketch has a source column
    (a wrong --input should fail loudly, not succeed doing nothing).
    Shared by ``run_flagship`` and the CLI ``follow`` loop.

    Accepts a directory, a single file, or a glob; schema comes from one
    parquet footer (cheap).  When NOTHING matches yet (tailing an empty
    landing directory), the full suite is assumed and ``src`` is None —
    the pre-change behavior, so ``follow`` keeps polling instead of
    crashing before the first shard lands."""
    import glob as _glob

    import pyarrow.parquet as pq

    pat = (
        os.path.join(pages_path, "*.parquet")
        if os.path.isdir(pages_path)
        else pages_path
    )
    files = sorted(_glob.glob(pat))
    if not files:
        return list(STANDARD_SPECS), None
    src = set(pq.read_schema(files[0]).names)
    if extract and "html" not in src:
        raise ValueError(
            f"extract=True requires an 'html' column in {pages_path!r} "
            f"(columns: {sorted(src)})"
        )
    avail = set(src)
    if "html" in src:
        avail.add("html_len")
    if "text" in src or (extract and "html" in src):
        avail.add("text_len")
    if "url" in src:
        avail.add("hostname")
    if "warc_ts" in src:
        avail.add("warc_ts_us")
    specs = [sp for sp in STANDARD_SPECS if sp.column in avail]
    if not specs:
        raise ValueError(
            f"specs_for_input: {pages_path!r} has none of the page-table "
            f"source columns (found: {sorted(src)}) — wrong input?"
        )
    dropped = [sp.name for sp in STANDARD_SPECS if sp.column not in avail]
    if dropped:
        logging.getLogger(__name__).info(
            "specs_for_input: %r lacks source columns for %s — running the "
            "%d remaining sketches", pages_path, dropped, len(specs)
        )
    return specs, src


def summary_rows(sketches: dict, specs) -> tuple[list, list, list, list]:
    """Finalize a {name: sketch} dict into the summary-card column lists
    (shared by run_flagship and the cross-job ``cli merge`` surface)."""
    names, kinds, ests, details = [], [], [], []
    for spec in specs:
        sk = sketches.get(spec.name)
        if sk is None:
            continue
        d = finalize(sk, spec)
        names.append(spec.name)
        kinds.append(spec.kind)
        if spec.kind in ("hll", "theta"):
            ests.append(float(d["estimate"]))
        elif spec.kind == "cms":
            ests.append(float(d["total"]))
        elif spec.kind == "bloom":
            ests.append(float(d["N"]))
        else:
            ests.append(float(d["quantiles"]["0.5"]))
        details.append(json.dumps(d, sort_keys=True, default=str))
    return names, kinds, ests, details


def run_flagship(
    pages_path: str,
    out_dir: str | None = None,
    ioc_bloom: BloomFilter | None = None,
    checkpoint_dir: str | None = None,
    batch_size: int | None = 16384,
    ioc_concurrency: int | None = None,
    extract: bool = False,
    override_num_blocks: int | None = None,
) -> dict:
    """Returns {"summary": pa.Table, "matches": pa.Table | None, ...}.

    ``extract=True`` runs the pinned extractor on html (production path);
    ``override_num_blocks`` pins the read parallelism (≈2× CPU count avoids
    both tiny-block overhead and parallelism starvation)."""
    specs, src = specs_for_input(pages_path, extract=extract)
    if ioc_bloom is not None and src is not None and "url" not in src:
        raise ValueError(
            f"run_flagship: IoC matching needs a 'url' column, absent from "
            f"{pages_path!r} (columns: {sorted(src)})"
        )
    derive = make_derive_fn(extract)

    if checkpoint_dir:
        # checkpointed path reads raw files; derivation runs inside the
        # partial fn via the prepare hook
        files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
        result = run_partitioned_build(
            files,
            specs,
            checkpoint_dir,
            batch_size=batch_size,
            prepare=derive,
        )
        sketches = result["sketches"]
        lineage = result["lineage"]
    else:
        # prune at the read: extract mode recomputes text from html, so the
        # stored text column never leaves storage (and vice versa html's
        # length is still needed, so html stays either way)
        if extract:
            # keep derive sources AND any pre-derived spec column the input
            # already carries (e.g. a materialized hostname with no url)
            spec_cols = {sp.column for sp in specs}
            columns = [
                c
                for c in sorted(src)
                if c in ("url", "warc_ts", "html", "lang") or c in spec_cols
            ]
        else:
            columns = None
        ds = pages_dataset(
            pages_path, columns=columns, override_num_blocks=override_num_blocks
        ).map_batches(
            derive,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
        sketches = build_sketches(ds, specs, batch_size=batch_size)
        lineage = []

    # sketch summary table
    names, kinds, ests, details = summary_rows(sketches, specs)

    matches_table = None
    matches_path = None
    if ioc_bloom is not None:
        mds = pages_dataset(pages_path, columns=["url"]).map_batches(
            PageIocMatcher,
            fn_constructor_kwargs={"bloom_bytes": ioc_bloom.to_bytes()},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=ioc_concurrency or (1, 8),
            zero_copy_batch=True,
        )
        if out_dir:
            # at scale matches can be millions of rows — stream them to
            # partitioned parquet instead of materializing on the driver;
            # the count comes from the written file footers (metadata-only)
            import pyarrow.parquet as pq

            matches_path = os.path.join(out_dir, "matches")
            os.makedirs(matches_path, exist_ok=True)
            mds.write_parquet(matches_path)
            n_matches = sum(
                pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(matches_path, "*.parquet"))
            )
        else:
            matches_table = pa.Table.from_pylist(
                mds.take_all(),
                schema=pa.schema(
                    [
                        ("url", pa.string()),
                        ("ioc", pa.string()),
                        ("match_type", pa.string()),
                        ("signature", pa.string()),
                    ]
                ),
            )
            n_matches = matches_table.num_rows
        names.append("ioc_matches")
        kinds.append("bloom-match")
        ests.append(float(n_matches))
        details.append(json.dumps({"n_matches": n_matches}))

    summary = pa.table(
        {
            "sketch": pa.array(names, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "estimate": pa.array(ests, type=pa.float64()),
            "detail": pa.array(details, type=pa.string()),
        }
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(summary, os.path.join(out_dir, "summary.parquet"))
    return {
        "summary": summary,
        "matches": matches_table,
        "matches_path": matches_path,
        "lineage": lineage,
    }
