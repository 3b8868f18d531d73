"""ISO-BMFF box codec: round-trip, 64-bit largesize, to-end-of-file
boxes, version-1 mvhd, and loud failure on malformed structure.
Cross-engine parity of the Spark probe runs in ``test_oracle_queries``
(`q_probe_video`)."""

from __future__ import annotations

import struct

import pytest

from streaminglens_spark.functions.mp4 import (
    _box,
    _full,
    encode_minimal_mp4,
    parse_mp4,
)


def test_roundtrip():
    blob = encode_minimal_mp4(1000, 4321, [(320, 240), (640, 480)], b"xyz" * 10)
    p = parse_mp4(blob)
    assert p["brand"] == "isom"
    assert (p["timescale"], p["duration"]) == (1000, 4321)
    assert p["n_tracks"] == 2
    assert (p["width"], p["height"]) == (640, 480)  # largest track wins
    assert p["mdat_bytes"] == 30


def test_largesize_box():
    inner = b"payload"
    big = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(inner)) + inner
    )
    blob = encode_minimal_mp4(1000, 1, [(16, 16)], b"") + big
    p = parse_mp4(blob)
    assert p["mdat_bytes"] == 0 + len(inner)


def test_size_zero_extends_to_eof():
    tail = struct.pack(">I", 0) + b"mdat" + b"abcdef"
    blob = encode_minimal_mp4(1000, 1, [(16, 16)], b"") + tail
    assert parse_mp4(blob)["mdat_bytes"] == 6


def test_mvhd_v1_parses():
    mvhd = _box(
        b"mvhd",
        _full(
            1,
            struct.pack(">QQIQ", 0, 0, 90000, 1 << 33)  # 64-bit duration
            + b"\x00" * 80,
        ),
    )
    p = parse_mp4(_box(b"moov", mvhd))
    assert p["timescale"] == 90000
    assert p["duration"] == 1 << 33


@pytest.mark.parametrize(
    "blob",
    [
        b"\x00\x00\x00\x05",                      # truncated header
        struct.pack(">I", 4) + b"free",           # size < header
        struct.pack(">I", 100) + b"mdat" + b"x",  # size past EOF
    ],
)
def test_malformed_raises(blob):
    with pytest.raises(ValueError):
        parse_mp4(blob)


def test_probe_strict_false_degrades(spark):
    from streaminglens_spark.functions.multimodal import probe_video

    bad = spark.createDataFrame(
        [(1, bytearray(b"not an mp4 at all"))], "doc_id long, payload binary"
    )
    rows = probe_video(bad, strict=False).collect()
    assert rows[0]["brand"] == "unparseable"
    with pytest.raises(Exception):
        probe_video(bad, strict=True).collect()
