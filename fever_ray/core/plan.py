"""Sketch-driven physical planning for grouped aggregation.

The engine has three grouped-aggregation strategies whose crossover points
were MEASURED on this box (BASELINE.md / CLAUDE.md rules of thumb):

* ``tree_groupby`` — block-bundled associative combine, no sort shuffle.
  Exact and fastest, but every combine task holds the whole key universe:
  valid only for BOUNDED key counts.
* ``bucket_map_groups`` — ONE hash-of-key coarse-bucket shuffle + a
  vectorized per-bucket combine.  The unbounded-key path (measured 5.5×
  faster than ``groupby().aggregate(Sum)`` at 5M skinny rows).
* ``salted_two_phase`` — per-key sketch/aggregate partials with a
  payload-hash salt, then a second tiny keyed merge: the skew-proof path
  when one Zipf-hot key would otherwise pin a single task
  (cost O(fanout · payload), never O(rows_in_key)).

Choosing between them needs exactly three numbers a sketch pass already
provides: row count, distinct-key estimate (HLL), and the hottest key's
share (CMS + tracked candidates).  ``probe_column`` computes them in ONE
streaming pass; ``plan_groupby`` applies the measured thresholds and
returns a machine-usable recommendation with every input it used — the
optimizer-statistics loop (sketch → plan) closed inside the engine, the
way warehouse optimizers use NDV/MCV statistics, but over 100 TB inputs
where only sketches can supply them.

The reference has no planner (fever's aggregation maps are all unbounded
in-memory dicts, /root/reference/processing/unicorn_aggregator.go:157-165);
this is the piece that decides which of OUR replacements stands in."""

from __future__ import annotations

from dataclasses import asdict, dataclass

from .udaf import SketchSpec, build_sketches

# Measured crossover points (see BASELINE.md; CLAUDE.md rules of thumb).
BOUNDED_KEYS_MAX = 100_000  # tree combine holds all keys: bound per task
TARGET_ROWS_PER_BUCKET = 250_000  # coarse-bucket sizing for map_groups
HOT_KEY_WORKER_SHARE = 1.0  # hot if top key > (1/workers) of all rows
MIN_SALT, MAX_SALT = 4, 64


@dataclass
class ColumnProbe:
    column: str
    n_rows: int
    n_distinct_est: float
    top_keys: list  # [(key, est_count), ...] best-effort heavy hitters
    hot_share: float  # top-1 estimated share of all rows (0 when empty)


def probe_column(ds, column: str, value_kind: str = "string", k: int = 8) -> ColumnProbe:
    """ONE streaming sketch pass over ``column``: HLL(p=14) distinct
    estimate + Misra-Gries heavy hitters (BOUNDED state at any key
    cardinality, unlike tracked-CMS candidate sets — undercount ≤
    n/(k+1) cannot flip the order-of-magnitude hot-share decision).
    KB-sized partials, coalesce-tree merge — safe at any input size."""
    sketches = build_sketches(
        ds,
        [
            SketchSpec("hll", "hll", column, {"p": 14}, value_kind=value_kind),
            SketchSpec("mg", "mg", column, {"k": 64}, value_kind=value_kind),
        ],
    )
    hll, mg = sketches["hll"], sketches["mg"]
    top = [(kk, int(v)) for kk, v in mg.top_k(k)]
    n_rows = int(mg.n)
    hot = (top[0][1] / n_rows) if (top and n_rows) else 0.0
    return ColumnProbe(
        column=column,
        n_rows=n_rows,
        n_distinct_est=float(hll.estimate()),
        top_keys=top,
        hot_share=float(hot),
    )


BROADCAST_CAP_BYTES = 256 << 20  # ray.put lookup side must fit worker heaps
JOIN_CMS = {"width": 4096, "depth": 5}


def probe_join(
    left_ds,
    left_key: str,
    right_ds,
    right_key: str,
    value_kind: str = "string",
) -> dict:
    """One sketch pass per join side: the column probe (HLL distinct + MG
    hot share) plus a same-seeded CMS per side, whose inner product is the
    C&M §4.2 join-SIZE estimate (never undercounts; over by ≤ ε·N_l·N_r).
    All state is KB-sized regardless of either side's row count."""
    probes = {}
    cms = {}
    for side, ds, col in (("left", left_ds, left_key), ("right", right_ds, right_key)):
        sk = build_sketches(
            ds,
            [
                SketchSpec("hll", "hll", col, {"p": 14}, value_kind=value_kind),
                SketchSpec("mg", "mg", col, {"k": 64}, value_kind=value_kind),
                SketchSpec("cms", "cms", col, dict(JOIN_CMS), value_kind=value_kind),
            ],
        )
        top = [(kk, int(v)) for kk, v in sk["mg"].top_k(8)]
        n = int(sk["mg"].n)
        probes[side] = ColumnProbe(
            column=col,
            n_rows=n,
            n_distinct_est=float(sk["hll"].estimate()),
            top_keys=top,
            hot_share=(top[0][1] / n) if (top and n) else 0.0,
        )
        cms[side] = sk["cms"]
    return {
        "left": probes["left"],
        "right": probes["right"],
        "join_size_est": int(cms["left"].inner_product(cms["right"])),
        "join_size_bound": float(
            cms["left"].epsilon * probes["left"].n_rows * probes["right"].n_rows
        ),
    }


def plan_join(
    jp: dict,
    left_bytes: int | None = None,
    right_bytes: int | None = None,
    workers: int = 32,
    broadcast_cap_bytes: int = BROADCAST_CAP_BYTES,
) -> dict:
    """Pick the physical join from the two-sided probe.

    Measured rules (CLAUDE.md / BASELINE.md): a provably-small side rides
    ``ray.put`` once and joins per batch inside map_batches (no
    shuffle-actor spin-up); otherwise a bucketed hash join, with small
    inputs repartitioned to ~n_parts blocks first (hundreds of near-empty
    blocks stall the shuffle).  The CMS inner product sizes the OUTPUT —
    a join that explodes (hot×hot) is flagged before it runs."""
    left, right = jp["left"], jp["right"]
    reasons = []
    sides_bytes = {"left": left_bytes, "right": right_bytes}
    known = {s: b for s, b in sides_bytes.items() if b is not None}
    small_side = min(known, key=known.get) if known else None
    if small_side is not None and known[small_side] <= broadcast_cap_bytes:
        strategy = "broadcast_lookup"
        n_parts = 1
        reasons.append(
            f"{small_side} side ≈{known[small_side] >> 20} MiB ≤ "
            f"{broadcast_cap_bytes >> 20} MiB cap: ray.put once, per-batch "
            "lookup inside map_batches — no shuffle-actor spin-up"
        )
    else:
        strategy = "bucketed_hash_join"
        rows = left.n_rows + right.n_rows
        n_parts = max(64, -(-rows // TARGET_ROWS_PER_BUCKET))
        reasons.append(
            ("no side fits the broadcast cap" if known else "side sizes unknown")
            + f": hash-bucket both sides {n_parts} ways; repartition any "
            "small input to ~n_parts blocks first (near-empty-block stall)"
        )
    hot_threshold = HOT_KEY_WORKER_SHARE / max(workers, 1)
    skewed = [
        s for s, p in (("left", left), ("right", right)) if p.hot_share > hot_threshold
    ]
    for s in skewed:
        p = left if s == "left" else right
        reasons.append(
            f"{s} side hot key {p.top_keys[0][0]!r} ≈{p.hot_share:.1%}: "
            "salt its bucket or pre-aggregate before the exchange"
        )
    out_est = jp["join_size_est"]
    blowup = out_est > 4 * max(left.n_rows, right.n_rows, 1)
    if blowup:
        reasons.append(
            f"estimated output {out_est} rows ≥ 4x the larger input — "
            "many-to-many key: expect an exploding join, pre-aggregate or "
            "semi-filter first"
        )
    return {
        "strategy": strategy,
        "n_parts": int(n_parts),
        "workers": workers,
        "join_size_est": out_est,
        "join_size_bound": jp["join_size_bound"],
        "skewed_sides": skewed,
        "blowup": bool(blowup),
        "reasons": reasons,
        "left": asdict(left),
        "right": asdict(right),
    }


def plan_groupby(probe: ColumnProbe, workers: int = 32) -> dict:
    """Apply the measured thresholds to one column probe.

    Returns {strategy, n_parts, salt_fanout, reasons, probe} where
    strategy ∈ {tree_groupby, bucket_map_groups} and salt_fanout > 1
    signals the salted two-phase variant for per-key SKETCH payloads
    (associative per-key state); exact row-holding aggregations under a
    hot key should instead pre-combine inside map_batches."""
    reasons = []
    bounded = probe.n_distinct_est <= BOUNDED_KEYS_MAX
    if bounded:
        strategy = "tree_groupby"
        n_parts = 1
        reasons.append(
            f"distinct≈{probe.n_distinct_est:.0f} ≤ {BOUNDED_KEYS_MAX}: "
            "bounded key universe fits every combine task — block-bundled "
            "associative combine, no sort shuffle"
        )
    else:
        strategy = "bucket_map_groups"
        n_parts = max(64, -(-probe.n_rows // TARGET_ROWS_PER_BUCKET))
        reasons.append(
            f"distinct≈{probe.n_distinct_est:.0f} > {BOUNDED_KEYS_MAX}: "
            f"coarse-bucket shuffle, {n_parts} buckets of ≤"
            f"{TARGET_ROWS_PER_BUCKET} rows (groupby().aggregate is the "
            "measured 5.5x-slower fallback)"
        )
    hot_threshold = HOT_KEY_WORKER_SHARE / max(workers, 1)
    salt_fanout = 1
    if probe.hot_share > hot_threshold and probe.n_rows:
        # size the salt so the hot key's partials spread over enough
        # subtasks to re-balance the pool, bounded to the measured range.
        # floor(x + 0.5) (round-half-up) instead of Python's banker round:
        # the same IEEE arithmetic is SQL-mirrorable (FLOOR(x + 0.5))
        salt_fanout = int(
            min(MAX_SALT, max(MIN_SALT, int(probe.hot_share * workers * 2 + 0.5)))
        )
        top_key = probe.top_keys[0][0] if probe.top_keys else "?"
        reasons.append(
            f"hot key {top_key!r} holds ≈{probe.hot_share:.1%} of rows "
            f"(> 1/{workers} worker share): salt per-key partials "
            f"{salt_fanout} ways (salted two-phase merge)"
        )
    return {
        "strategy": strategy,
        "n_parts": int(n_parts),
        "salt_fanout": salt_fanout,
        "workers": workers,
        "reasons": reasons,
        "probe": asdict(probe),
    }
