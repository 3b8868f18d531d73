"""Minimal ISO-BMFF (MP4) box codec -- stdlib-only, the video leg of the
multimodal triad (PNG image codec ``png.py``, WAV audio codec ``wav.py``).

What is real here: the CONTAINER layer.  ISO/IEC 14496-12 structures an
MP4 as a stream of length-prefixed boxes (``[size u32]['ftyp'|'moov'|
...]``, containers recursing), and everything a data pipeline needs for
triage -- brand, duration, track count, display dimensions, media
payload size -- lives in that layer as plain big-endian integers; no
entropy decoding required.  ``parse_mp4`` walks any box stream
(including 64-bit ``largesize`` and to-end-of-file boxes), recurses
into ``moov``/``trak``, and reads ``ftyp``/``mvhd`` (v0 and v1)/
``tkhd``/``mdat``.  Sample decoding (the codec proper) is out of scope
-- the documented boundary, exactly like ``frame_sample``'s byte-level
sampling.

``encode_minimal_mp4`` writes a conforming box stream (ftyp + moov
[mvhd + per-track trak/tkhd] + mdat) so the fixture corpus can carry
REAL parseable video containers whose fields derive deterministically
from (doc_id, text) -- the ``q_decode_audio`` oracle pattern: the
DuckDB oracle recomputes every field from the generating formula
without any parser, so a parser that misreads sizes, versions or
fixed-point dims hash-mismatches.
"""

from __future__ import annotations

import struct


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, payload: bytes) -> bytes:
    return struct.pack(">B", version) + b"\x00\x00\x00" + payload


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_minimal_mp4(
    timescale: int,
    duration: int,
    track_dims: list[tuple[int, int]],
    media: bytes,
) -> bytes:
    """Conforming ftyp + moov(mvhd, trak(tkhd)*) + mdat stream."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mvhd = _box(
        b"mvhd",
        _full(
            0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">i", 0x00010000)  # rate 1.0
            + struct.pack(">h", 0x0100)      # volume 1.0
            + b"\x00" * 10                   # reserved
            + _UNITY_MATRIX
            + b"\x00" * 24                   # pre_defined
            + struct.pack(">I", len(track_dims) + 1),  # next_track_ID
        ),
    )
    traks = b""
    for i, (w, h) in enumerate(track_dims):
        tkhd = _box(
            b"tkhd",
            _full(
                0,
                struct.pack(">IIII", 0, 0, i + 1, 0)   # times, track_ID, rsvd
                + struct.pack(">I", duration)
                + b"\x00" * 8                           # reserved
                + struct.pack(">hhhh", 0, 0, 0, 0)      # layer/group/vol/rsvd
                + _UNITY_MATRIX
                + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
            ),
        )
        traks += _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", media)
    return ftyp + moov + mdat


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def parse_mp4(data: bytes) -> dict:
    """Walk the box stream; returns {brand, timescale, duration,
    n_tracks, width, height (largest track), mdat_bytes}.  Raises
    ``ValueError`` on malformed structure (truncated box, size < 8)."""
    out = {
        "brand": None,
        "timescale": None,
        "duration": None,
        "n_tracks": 0,
        "width": 0,
        "height": 0,
        "mdat_bytes": 0,
    }

    def walk(buf: bytes, lo: int, hi: int) -> None:
        pos = lo
        while pos < hi:
            if hi - pos < 8:
                raise ValueError(f"truncated box header at {pos}")
            size = struct.unpack(">I", buf[pos : pos + 4])[0]
            btype = buf[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if hi - pos < 16:
                    raise ValueError(f"truncated largesize at {pos}")
                size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
                body = pos + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            if size < body - pos or pos + size > hi:
                raise ValueError(f"bad box size {size} at {pos}")
            end = pos + size
            if btype == b"ftyp":
                out["brand"] = buf[body : body + 4].decode("ascii", "replace")
            elif btype == b"mvhd":
                ver = buf[body]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", buf[body + 20 : body + 32])
                else:
                    ts, dur = struct.unpack(">II", buf[body + 12 : body + 20])
                out["timescale"], out["duration"] = ts, dur
            elif btype == b"tkhd":
                out["n_tracks"] += 1
                ver = buf[body]
                off = (body + 4) + (32 if ver == 1 else 20) + 8 + 8 + 36
                w16, h16 = struct.unpack(">II", buf[off : off + 8])
                w, h = w16 >> 16, h16 >> 16
                if w * h > out["width"] * out["height"]:
                    out["width"], out["height"] = w, h
            elif btype == b"mdat":
                out["mdat_bytes"] += end - body
            if btype in _CONTAINERS:
                walk(buf, body, end)
            pos = end

    walk(data, 0, len(data))
    return out
