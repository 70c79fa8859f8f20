"""Exact / substring IoC matching — the Ray Data form of the reference's
``fever alertify`` batch CLI (/root/reference/cmd/fever/cmds/alertify.go:
59-128): exact string equality on host-like fields, substring containment on
URL-like fields, with an optional alert limit.

Unlike the bloom matcher this needs no filter artifact — the IoC list is
small and exact, broadcast as a plain set (exact) plus a vectorized
multi-substring pass (contains)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class ExactMatcher:
    """Actor stage: exact-field + substring matching against an IoC list."""

    def __init__(
        self,
        iocs: tuple[str, ...],
        exact_cols: tuple[str, ...] = (),
        substr_cols: tuple[str, ...] = (),
        limit: int | None = None,
    ):
        self.iocs = tuple(iocs)
        self.exact = frozenset(iocs)
        self.exact_cols = exact_cols
        self.substr_cols = substr_cols
        self.limit = limit
        self.emitted = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for col in self.exact_cols:
            vals = batch.column(col)
            mask = pc.is_in(vals, value_set=pa.array(self.iocs, type=pa.string()))
            mask = pc.fill_null(mask, False)
            if pc.any(mask).as_py():
                sub = batch.filter(mask)
                outs.append(
                    sub.append_column("matched_field", pa.array([col] * sub.num_rows))
                    .append_column("ioc", sub.column(col).cast(pa.string()))
                )
        for col in self.substr_cols:
            vals = batch.column(col).cast(pa.string())
            for ioc in self.iocs:
                mask = pc.fill_null(pc.match_substring(vals, ioc), False)
                if pc.any(mask).as_py():
                    sub = batch.filter(mask)
                    outs.append(
                        sub.append_column(
                            "matched_field", pa.array([col] * sub.num_rows)
                        ).append_column("ioc", pa.array([ioc] * sub.num_rows))
                    )
        if not outs:
            empty = batch.slice(0, 0)
            return empty.append_column("matched_field", pa.array([], type=pa.string())).append_column(
                "ioc", pa.array([], type=pa.string())
            )
        out = pa.concat_tables(outs)
        if self.limit is not None:
            # per-actor alert budget (the CLI's --alert-limit is global; in a
            # distributed run the budget is enforced per actor, documented)
            room = max(self.limit - self.emitted, 0)
            out = out.slice(0, room)
            self.emitted += out.num_rows
        return out


def alertify(ds, iocs, exact_cols=(), substr_cols=(), limit=None, concurrency=None):
    return ds.map_batches(
        ExactMatcher,
        fn_constructor_kwargs={
            "iocs": tuple(iocs),
            "exact_cols": tuple(exact_cols),
            "substr_cols": tuple(substr_cols),
            "limit": limit,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
