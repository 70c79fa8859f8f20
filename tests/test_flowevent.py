"""FlowEvent wire-codec parity (/root/reference/types/flow_event.go:138-279
and its round-trip test flow_event_test.go): little-endian layout, v4/v6
format bits, TCP/UDP flag bits, marshal→unmarshal equality, and a
hand-computed golden byte string pinning the layout."""

import struct

import pyarrow as pa
import pytest

from fever_ray.io_.flowevent import (
    DTYPE_V4,
    DTYPE_V6,
    FORMAT_V4,
    FORMAT_V6,
    decode_flow_events,
    encode_flow_events,
)


def _batch(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
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
        }
    )


ROW_V4 = {
    "ts_ns": 1512733888000000000,
    "src_ip": "8.8.8.8",
    "src_port": 53,
    "dest_ip": "10.0.0.1",
    "dest_port": 51323,
    "pkts_to_server": 3,
    "pkts_to_client": 4,
    "bytes_to_server": 123,
    "bytes_to_client": 4567,
    "proto": "UDP",
}
ROW_V6 = {
    "ts_ns": 1512733888000000001,
    "src_ip": "2001:db8:85a3::8a2e:370:7334",
    "src_port": 443,
    "dest_ip": "2001:db8::1",
    "dest_port": 55000,
    "pkts_to_server": 10,
    "pkts_to_client": 20,
    "bytes_to_server": 1000,
    "bytes_to_client": 2000,
    "proto": "TCP",
}


def test_record_sizes_match_reference_layout():
    # 1 + 8 + ip + 2 + ip + 2 + 4*4 + 2
    assert DTYPE_V4.itemsize == 39
    assert DTYPE_V6.itemsize == 63


def test_golden_v4_bytes():
    """Layout pinned against a struct.pack'd reference record (the same
    field order/widths flow_event.go Marshal writes)."""
    buf = encode_flow_events(_batch([ROW_V4]))
    want = (
        bytes([FORMAT_V4])
        + struct.pack("<Q", ROW_V4["ts_ns"])
        + bytes([8, 8, 8, 8])
        + struct.pack("<H", 53)
        + bytes([10, 0, 0, 1])
        + struct.pack("<H", 51323)
        + struct.pack("<IIII", 3, 4, 123, 4567)
        + struct.pack("<H", 2)  # UDP = bit1
    )
    assert buf == want


def test_roundtrip_v4_v6_and_mixed():
    for rows in ([ROW_V4], [ROW_V6], [ROW_V4, ROW_V6, ROW_V4]):
        buf = encode_flow_events(_batch(rows))
        out = decode_flow_events(buf).to_pylist()
        assert len(out) == len(rows)
        for got, want in zip(out, rows):
            for k in want:
                if k in ("src_ip", "dest_ip"):
                    import ipaddress

                    assert ipaddress.ip_address(got[k]) == ipaddress.ip_address(want[k])
                else:
                    assert got[k] == want[k], k
        assert [r["is_ipv6"] for r in out] == [":" in r["src_ip"] for r in rows]


def test_format_bits():
    b4 = encode_flow_events(_batch([ROW_V4]))
    b6 = encode_flow_events(_batch([ROW_V6]))
    assert b4[0] == FORMAT_V4 == 0b101
    assert b6[0] == FORMAT_V6 == 0b111


def test_mixed_ip_versions_within_row_rejected():
    bad = dict(ROW_V4, dest_ip="2001:db8::1")
    with pytest.raises(ValueError):
        encode_flow_events(_batch([bad]))


def test_truncated_stream_rejected():
    buf = encode_flow_events(_batch([ROW_V4]))
    with pytest.raises(ValueError):
        decode_flow_events(buf[:-1] + b"")


def test_empty():
    assert encode_flow_events(_batch([ROW_V4]).slice(0, 0)) == b""
    assert decode_flow_events(b"").num_rows == 0


def test_read_flow_stream_dataset(ray_session, tmp_path):
    from fever_ray.io_.flowevent import read_flow_stream

    p1 = str(tmp_path / "a.fev")
    p2 = str(tmp_path / "b.fev")
    open(p1, "wb").write(encode_flow_events(_batch([ROW_V4, ROW_V4])))
    open(p2, "wb").write(encode_flow_events(_batch([ROW_V6])))
    out = read_flow_stream([p1, p2]).take_all()
    assert len(out) == 3
    assert sum(r["is_ipv6"] for r in out) == 1
