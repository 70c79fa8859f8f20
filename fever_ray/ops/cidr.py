"""CIDR containment matcher — the Ray Data form of fever's IPHandler
(/root/reference/processing/ip_handler.go:43-171): a PATRICIA-trie longest-
prefix lookup per event, emitting one alert per containing range.

Here the range list is broadcast into actor state (built once per actor in
``__init__``), and containment is a vectorized mask per range: ranges are
few (a blocklist), rows are many, so O(n_ranges) vectorized passes beat a
per-row trie walk.  Like the reference, a row inside MULTIPLE ranges emits
one match row per containing range (ip_handler.go:128-160)."""

from __future__ import annotations

import ipaddress

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_IPV4_RE = r"^(?P<a>\d+)\.(?P<b>\d+)\.(?P<c>\d+)\.(?P<d>\d+)$"


def ipv4_to_uint32(ips) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized dotted-quad → uint32 (+validity mask)."""
    if not isinstance(ips, (pa.Array, pa.ChunkedArray)):
        ips = pa.array(ips, type=pa.string())
    if isinstance(ips, pa.ChunkedArray):
        ips = ips.combine_chunks()
    parts = pc.extract_regex(ips, pattern=_IPV4_RE)
    valid = pc.is_valid(parts).to_numpy(zero_copy_only=False)
    out = np.zeros(len(ips), dtype=np.uint32)
    if valid.any():
        vals = np.zeros(len(ips), dtype=np.uint64)
        for i, f in enumerate(("a", "b", "c", "d")):
            col = pc.struct_field(parts, f)
            # vectorized octet cast: cap absurd digit runs first so the
            # uint64 cast can't overflow, then range-check ≤ 255
            too_long = pc.fill_null(pc.greater(pc.utf8_length(col), 3), True)
            col = pc.if_else(too_long, "999", pc.fill_null(col, "0"))
            nums = pc.cast(col, pa.uint64()).to_numpy(zero_copy_only=False)
            ok = nums <= 255
            valid &= ok
            vals |= (nums & np.uint64(0xFF)) << np.uint64(8 * (3 - i))
        out = vals.astype(np.uint32)
    return out, valid


def _prefix_lanes(net: ipaddress.IPv6Network) -> tuple[np.uint64, np.uint64, np.uint64, np.uint64]:
    """(hi_base, lo_base, hi_mask, lo_mask): a 128-bit prefix as two uint64
    lanes — the same two-word compare cidranger does for v6
    (/root/reference/processing/ip_handler.go:91,128-160 handles v6 ranges
    through the same trie; here it's two vectorized lane masks)."""
    base = int(net.network_address)
    p = net.prefixlen
    hi_bits = min(p, 64)
    lo_bits = max(p - 64, 0)
    # mask arithmetic in Python ints (numpy rejects mixed int/uint64 ops)
    hi_mask = ((1 << 64) - (1 << (64 - hi_bits))) & 0xFFFFFFFFFFFFFFFF
    lo_mask = ((1 << 64) - (1 << (64 - lo_bits))) & 0xFFFFFFFFFFFFFFFF
    return (
        np.uint64((base >> 64) & hi_mask),
        np.uint64((base & 0xFFFFFFFFFFFFFFFF) & lo_mask),
        np.uint64(hi_mask),
        np.uint64(lo_mask),
    )


def ipv6_lanes(ips) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(hi, lo, validity) uint64 lanes for a string column of IPv6 literals.

    Parsing canonicalization (``::`` compression, embedded v4 forms) needs
    a real parser, so UNIQUE strings are parsed once per batch in Python
    and scattered back — web traffic repeats addresses heavily, and only
    rows containing ':' reach this path at all."""
    if not isinstance(ips, (pa.Array, pa.ChunkedArray)):
        ips = pa.array(ips, type=pa.string())
    if isinstance(ips, pa.ChunkedArray):
        ips = ips.combine_chunks()
    n = len(ips)
    hi = np.zeros(n, dtype=np.uint64)
    lo = np.zeros(n, dtype=np.uint64)
    valid = np.zeros(n, dtype=bool)
    strs = np.asarray(ips.to_pylist(), dtype=object)
    uniq, inv = np.unique(strs.astype(str), return_inverse=True)
    u_hi = np.zeros(len(uniq), dtype=np.uint64)
    u_lo = np.zeros(len(uniq), dtype=np.uint64)
    u_ok = np.zeros(len(uniq), dtype=bool)
    for i, s in enumerate(uniq):
        try:
            v = int(ipaddress.IPv6Address(s))
        except (ipaddress.AddressValueError, ValueError):
            continue
        u_hi[i] = (v >> 64) & 0xFFFFFFFFFFFFFFFF
        u_lo[i] = v & 0xFFFFFFFFFFFFFFFF
        u_ok[i] = True
    hi[:] = u_hi[inv]
    lo[:] = u_lo[inv]
    valid[:] = u_ok[inv]
    return hi, lo, valid


class CidrMatcher:
    """Actor-pool stage: ranges parsed once per actor; vectorized containment
    for both IPv4 (uint32) and IPv6 (two uint64 lanes).

    File format parity with the reference: one CIDR (or bare IP) per line,
    '#' comments ignored (ip_handler.go:80-100); v6 ranges handled like
    ip_handler.go:91 does via cidranger."""

    def __init__(self, cidrs: tuple[str, ...], ip_col: str = "ip"):
        self.ranges = []
        self.ranges6 = []
        for line in cidrs:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if "/" not in line:
                line += "/128" if ":" in line else "/32"
            net = ipaddress.ip_network(line, strict=False)
            if net.version == 6:
                self.ranges6.append((str(net),) + _prefix_lanes(net))
            else:
                self.ranges.append(
                    (
                        str(net),
                        np.uint32(int(net.network_address)),
                        np.uint32(0xFFFFFFFF << (32 - net.prefixlen) & 0xFFFFFFFF),
                    )
                )
        self.ip_col = ip_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.ip_col)
        outs = []
        if self.ranges:
            ips, valid = ipv4_to_uint32(col)
            for cidr, base, mask in self.ranges:
                hit = valid & ((ips & mask) == base)
                if hit.any():
                    sub = batch.filter(pa.array(hit))
                    outs.append(
                        sub.append_column(
                            "matched_cidr", pa.array([cidr] * sub.num_rows, type=pa.string())
                        )
                    )
        if self.ranges6:
            # only rows containing ':' can be v6 literals; parse just those
            maybe6 = pc.match_substring(
                pc.fill_null(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, ""),
                ":",
            ).to_numpy(zero_copy_only=False)
            if maybe6.any():
                idx = np.flatnonzero(maybe6)
                sub6 = batch.take(pa.array(idx))
                hi, lo, valid6 = ipv6_lanes(sub6.column(self.ip_col))
                for cidr, hb, lb, hm, lm in self.ranges6:
                    hit = valid6 & ((hi & hm) == hb) & ((lo & lm) == lb)
                    if hit.any():
                        s = sub6.filter(pa.array(hit))
                        outs.append(
                            s.append_column(
                                "matched_cidr", pa.array([cidr] * s.num_rows, type=pa.string())
                            )
                        )
        if not outs:
            empty = batch.slice(0, 0)
            return empty.append_column(
                "matched_cidr", pa.array([], type=pa.string())
            )
        return pa.concat_tables(outs)


def cidr_match(ds, cidrs: tuple[str, ...], ip_col: str = "ip", concurrency=None):
    return ds.map_batches(
        CidrMatcher,
        fn_constructor_kwargs={"cidrs": cidrs, "ip_col": ip_col},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
        zero_copy_batch=True,
    )
