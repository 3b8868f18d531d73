"""Minimal pure-stdlib PNG codec (8-bit grayscale, non-interlaced).

Backs the real decode path of ``multimodal.decode_image`` (r3 verdict ask
#7): the container ships no image libraries, but PNG's container format is
just zlib + CRC32 + per-scanline filters -- all stdlib.  The encoder emits
filter-0 scanlines; the decoder implements all five standard filter types
(None/Sub/Up/Average/Paeth, PNG spec §9), so it decodes any conforming
8-bit grayscale PNG, not merely its own output.

This is a codec for the *pipeline plumbing* (schema, Arrow batching,
oracle-checkable pixel stats) -- not a general image library: one channel,
8-bit depth, no interlace, no ancillary-chunk interpretation.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray_png(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale PNG from row-major ``pixels`` (len == width*height).
    Deterministic output (fixed zlib level, filter 0 scanlines)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    idat = zlib.compress(raw, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_gray_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse + inflate + unfilter an 8-bit grayscale PNG; returns
    (width, height, row-major pixels).  Raises ValueError on anything that
    is not a conforming non-interlaced 8-bit grayscale PNG."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        crc_expect = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc_expect:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit grayscale, "
                    f"got depth={depth} color={color} interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("decompressed size mismatch")
    # r15 fast path (guide §4.2): filter-0-only images -- every PNG this
    # repo's encoder emits -- need no unfiltering at all, just the
    # per-scanline filter byte stripped.  One strided numpy copy replaces
    # the per-row Python loop; any other filter type falls through to the
    # spec-complete path below.  numpy is already a hard dependency of
    # every caller (Arrow batches); the stdlib path remains complete.
    try:
        import numpy as _np

        arr = _np.frombuffer(raw, dtype=_np.uint8).reshape(height, stride)
        if not arr[:, 0].any():
            return width, height, arr[:, 1:].tobytes()
    except ImportError:  # pragma: no cover - stdlib-only environment
        pass
    out = bytearray(width * height)
    prev = bytes(width)
    for y in range(height):
        ftype = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ftype == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                a = line[x - 1] if x else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        out[y * width : (y + 1) * width] = line
        prev = bytes(line)
    return width, height, bytes(out)
