"""Multi-route forwarding — the MultiForwardShipper analog
(/root/reference/processing/multi_forward.go:27-263: fan one event stream
out to N outputs, each with a per-output event-type allowlist or 'all').

Batch form: the input Dataset fans out into one filtered child per route
(datasets are cheap to reuse — the read is shared by the streaming
executor when materialized once, or re-read per route for huge inputs),
each child writing its own partitioned parquet sink.  Reliability model:
instead of the reference's bounded-buffer drops and reconnect loops, Ray
task retries + idempotent overwrite-by-path writes."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def multi_forward(
    ds,
    routes: dict[str, tuple[str, ...] | str],
    out_root: str,
    type_col: str = "event_type",
) -> dict[str, str]:
    """routes: {route_name: ('typeA', 'typeB') | 'all'} → writes each route
    to <out_root>/<route_name>/ and returns {route_name: path}."""
    out = {}
    for name, allow in routes.items():
        path = os.path.join(out_root, name)
        if allow == "all":
            child = ds
        else:
            allowed = tuple(allow)

            def make_filter(allowed_types):
                def fil(batch: pa.Table) -> pa.Table:
                    mask = pc.is_in(
                        batch.column(type_col),
                        value_set=pa.array(list(allowed_types), type=pa.string()),
                    )
                    return batch.filter(pc.fill_null(mask, False))

                return fil

            child = ds.map_batches(
                make_filter(allowed), batch_format="pyarrow", zero_copy_batch=True
            )
        child.write_parquet(path)
        out[name] = path
    return out
