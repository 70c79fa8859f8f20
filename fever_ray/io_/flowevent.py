"""fever FlowEvent binary codec — byte-compatible with the reference's
little-endian wire format (/root/reference/types/flow_event.go:138-279):

    format   u8   bit0 = valid, bit1 = IPv6, bits2-5 = version (1)
    ts       u64  unix nanoseconds, little-endian
    src_ip   4 or 16 bytes (network order, like Go net.IP)
    src_port u16 LE
    dest_ip  4 or 16 bytes
    dest_port u16 LE
    pkts_to_server  u32 LE
    pkts_to_client  u32 LE
    bytes_to_server u32 LE
    bytes_to_client u32 LE
    flags    u16 LE  (bit0 TCP, bit1 UDP — flow_event.go:31-34)

This is the one reference format with golden round-trip tests that parquet
does not replace; the codec exists for wire parity (e.g. reading an
archived fever flow stream into a Dataset).  Encoding/decoding is
vectorized per batch via packed numpy structured dtypes; mixed v4/v6
streams fall back to a record scan.
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pyarrow as pa

FORMAT_V4 = 0b101  # valid + version 1
FORMAT_V6 = 0b111  # valid + ipv6 + version 1
FLAG_TCP = 1 << 0
FLAG_UDP = 1 << 1

def read_flow_stream(paths):
    """Ray Dataset over archived fever flow-event files: one decode task per
    file (files are the natural partition; a 100 TB archive is many files)."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [paths]

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as fh:
                tables.append(decode_flow_events(fh.read()))
        return pa.concat_tables(tables)

    files = rd.from_items([{"path": p} for p in paths])
    return files.map_batches(load, batch_format="pyarrow", batch_size=1)


def _record_dtype(ip_len: int) -> np.dtype:
    return np.dtype(
        [
            ("format", "u1"),
            ("ts", "<u8"),
            ("src_ip", "u1", (ip_len,)),
            ("src_port", "<u2"),
            ("dest_ip", "u1", (ip_len,)),
            ("dest_port", "<u2"),
            ("pkts_to_server", "<u4"),
            ("pkts_to_client", "<u4"),
            ("bytes_to_server", "<u4"),
            ("bytes_to_client", "<u4"),
            ("flags", "<u2"),
        ]
    )


DTYPE_V4 = _record_dtype(4)  # 39 bytes
DTYPE_V6 = _record_dtype(16)  # 63 bytes


def _ip_bytes(ip_strs: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(n, 16) packed address bytes + is_ipv6 mask (unique-parse per batch)."""
    arr = np.asarray(ip_strs, dtype=object).astype(str)
    uniq, inv = np.unique(arr, return_inverse=True)
    packed = np.zeros((len(uniq), 16), dtype=np.uint8)
    is6 = np.zeros(len(uniq), dtype=bool)
    for i, s in enumerate(uniq):
        a = ipaddress.ip_address(s)
        b = a.packed
        packed[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        is6[i] = a.version == 6
    return packed[inv], is6[inv]


def encode_flow_events(batch: pa.Table) -> bytes:
    """Encode a batch to the fever wire format.  Expected columns:
    ts_ns (uint64 nanoseconds), src_ip/dest_ip (strings), src_port/
    dest_port, pkts_to_server/pkts_to_client/bytes_to_server/
    bytes_to_client, proto (string, 'TCP'/'UDP' set flag bits)."""
    n = batch.num_rows
    if n == 0:
        return b""
    ts = batch.column("ts_ns").to_numpy(zero_copy_only=False).astype(np.uint64)
    src, src6 = _ip_bytes(batch.column("src_ip").to_pylist())
    dst, dst6 = _ip_bytes(batch.column("dest_ip").to_pylist())
    if not np.array_equal(src6, dst6):
        raise ValueError("source and destination IP versions differ within a row")
    proto = np.asarray(batch.column("proto").to_pylist(), dtype=object)
    flags = np.zeros(n, dtype=np.uint16)
    flags |= np.where(proto == "TCP", FLAG_TCP, 0).astype(np.uint16)
    flags |= np.where(proto == "UDP", FLAG_UDP, 0).astype(np.uint16)

    def col(name):
        return batch.column(name).to_numpy(zero_copy_only=False).astype(np.uint32)

    out = []
    for is6_val, dtype, ip_len in ((False, DTYPE_V4, 4), (True, DTYPE_V6, 16)):
        mask = src6 == is6_val
        if not mask.any():
            continue
        rec = np.zeros(int(mask.sum()), dtype=dtype)
        rec["format"] = FORMAT_V6 if is6_val else FORMAT_V4
        rec["ts"] = ts[mask]
        rec["src_ip"] = src[mask, :ip_len]
        rec["dest_ip"] = dst[mask, :ip_len]
        rec["src_port"] = col("src_port")[mask].astype(np.uint16)
        rec["dest_port"] = col("dest_port")[mask].astype(np.uint16)
        for f in ("pkts_to_server", "pkts_to_client", "bytes_to_server", "bytes_to_client"):
            rec[f] = col(f)[mask]
        rec["flags"] = flags[mask]
        out.append((np.flatnonzero(mask), rec, dtype.itemsize))
    if len(out) == 1:
        return out[0][1].tobytes()
    # interleave back into original row order (mixed v4/v6 stream)
    chunks: list[bytes] = [b""] * n
    for idx, rec, size in out:
        raw = rec.tobytes()
        for j, row in enumerate(idx):
            chunks[row] = raw[j * size : (j + 1) * size]
    return b"".join(chunks)


def _decode_homogeneous(buf: bytes, dtype: np.dtype, fmt: int) -> np.ndarray | None:
    if len(buf) % dtype.itemsize:
        return None
    rec = np.frombuffer(buf, dtype=dtype)
    if not (rec["format"] == fmt).all():
        return None
    return rec


def decode_flow_events(buf: bytes) -> pa.Table:
    """Decode a fever flow stream back to an Arrow table (round-trip inverse
    of encode_flow_events).  Homogeneous v4/v6 streams decode zero-copy via
    one frombuffer; mixed streams scan record-by-record."""
    recs4 = []
    recs6 = []
    order = []
    rec = _decode_homogeneous(buf, DTYPE_V4, FORMAT_V4)
    if rec is not None:
        recs4, order = [rec], [(False, len(rec))]
    else:
        rec = _decode_homogeneous(buf, DTYPE_V6, FORMAT_V6)
        if rec is not None:
            recs6, order = [rec], [(True, len(rec))]
        else:
            # mixed: scan format bytes to split into homogeneous runs
            pos = 0
            n = len(buf)
            rows = []
            while pos < n:
                fmt = buf[pos]
                if not fmt & 0x01:
                    raise ValueError(f"invalid format byte at offset {pos}: {fmt:#x}")
                is6 = bool(fmt & 0x02)
                dtype = DTYPE_V6 if is6 else DTYPE_V4
                if pos + dtype.itemsize > n:
                    raise ValueError("truncated flow event stream")
                r = np.frombuffer(buf, dtype=dtype, count=1, offset=pos)
                rows.append((is6, r))
                pos += dtype.itemsize
            for is6, r in rows:
                (recs6 if is6 else recs4).append(r)
                order.append((is6, 1))
    cols: dict[str, list] = {
        k: []
        for k in (
            "ts_ns", "src_ip", "src_port", "dest_ip", "dest_port",
            "pkts_to_server", "pkts_to_client", "bytes_to_server",
            "bytes_to_client", "proto", "is_ipv6",
        )
    }
    i4 = i6 = 0
    it4 = np.concatenate([r for r in recs4]) if recs4 else None
    it6 = np.concatenate([r for r in recs6]) if recs6 else None
    for is6, count in order:
        rec = it6[i6 : i6 + count] if is6 else it4[i4 : i4 + count]
        if is6:
            i6 += count
        else:
            i4 += count
        for r in rec:
            src = bytes(r["src_ip"])
            dst = bytes(r["dest_ip"])
            cols["ts_ns"].append(int(r["ts"]))
            cols["src_ip"].append(str(ipaddress.ip_address(src)))
            cols["dest_ip"].append(str(ipaddress.ip_address(dst)))
            cols["src_port"].append(int(r["src_port"]))
            cols["dest_port"].append(int(r["dest_port"]))
            cols["pkts_to_server"].append(int(r["pkts_to_server"]))
            cols["pkts_to_client"].append(int(r["pkts_to_client"]))
            cols["bytes_to_server"].append(int(r["bytes_to_server"]))
            cols["bytes_to_client"].append(int(r["bytes_to_client"]))
            flags = int(r["flags"])
            cols["proto"].append(
                "TCP" if flags & FLAG_TCP else ("UDP" if flags & FLAG_UDP else "")
            )
            cols["is_ipv6"].append(is6)
    return pa.table(
        {
            "ts_ns": pa.array(cols["ts_ns"], type=pa.uint64()),
            "src_ip": pa.array(cols["src_ip"], type=pa.string()),
            "src_port": pa.array(cols["src_port"], type=pa.uint32()),
            "dest_ip": pa.array(cols["dest_ip"], type=pa.string()),
            "dest_port": pa.array(cols["dest_port"], type=pa.uint32()),
            "pkts_to_server": pa.array(cols["pkts_to_server"], type=pa.uint32()),
            "pkts_to_client": pa.array(cols["pkts_to_client"], type=pa.uint32()),
            "bytes_to_server": pa.array(cols["bytes_to_server"], type=pa.uint32()),
            "bytes_to_client": pa.array(cols["bytes_to_client"], type=pa.uint32()),
            "proto": pa.array(cols["proto"], type=pa.string()),
            "is_ipv6": pa.array(cols["is_ipv6"], type=pa.bool_()),
        }
    )
