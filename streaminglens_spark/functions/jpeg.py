"""Minimal real JFIF/JPEG marker-stream codec (round-5 continued
extension): the image-container sibling of ``mp4.py`` -- encode and
parse the MARKER layer (SOI, APP0/JFIF, COM, SOF0, EOI) that an
image-triage probe reads: dimensions, component count, JFIF version and
pixel density, comment payload size.

Scope, stated precisely: this is the metadata layer only -- the encoder
emits no SOS/entropy-coded data, so the output is not a decodable
picture, exactly as ``mp4.py`` writes real boxes without encoding video
samples.  The parser walks real marker segments with length fields and
bounds checks; a truncated or non-JFIF stream raises ``ValueError``
(never fake metadata).  Everything is pure stdlib ``struct``.
"""

from __future__ import annotations

import struct

SOI = b"\xff\xd8"
EOI = b"\xff\xd9"
APP0 = 0xE0
COM = 0xFE
SOF0 = 0xC0


def encode_minimal_jpeg(
    width: int,
    height: int,
    n_components: int,
    xdensity: int,
    ydensity: int,
    comment: bytes,
) -> bytes:
    """SOI + APP0(JFIF 1.2, dpi densities) + COM(comment) + SOF0(8-bit,
    dims, components) + EOI."""
    if not (0 < width < 65536 and 0 < height < 65536):
        raise ValueError("jpeg: dims must fit 16 bits and be positive")
    if not 1 <= n_components <= 4:
        raise ValueError("jpeg: 1..4 components")
    # COM segment length field is 16-bit and includes its own 2 bytes
    if len(comment) > 65533:
        raise ValueError("jpeg: comment exceeds 65533 bytes (COM length field)")
    if not (0 <= xdensity < 65536 and 0 <= ydensity < 65536):
        raise ValueError("jpeg: densities must fit 16 bits")
    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(
        ">HH", xdensity, ydensity
    ) + b"\x00\x00"
    out = [SOI]
    out.append(b"\xff" + bytes([APP0]) + struct.pack(">H", 2 + len(app0)) + app0)
    out.append(b"\xff" + bytes([COM]) + struct.pack(">H", 2 + len(comment)) + comment)
    comps = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(n_components)
    )
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([n_components]) + comps
    out.append(b"\xff" + bytes([SOF0]) + struct.pack(">H", 2 + len(sof)) + sof)
    out.append(EOI)
    return b"".join(out)


def parse_jpeg(blob: bytes) -> dict:
    """Walk the marker stream; returns jfif_major/minor, x/ydensity,
    width, height, n_components, comment_bytes.  Raises ``ValueError``
    on missing SOI/EOI, truncated segments, non-JFIF APP0, or a missing
    SOF0."""
    if len(blob) < 4 or blob[:2] != SOI:
        raise ValueError("jpeg: missing SOI")
    pos = 2
    found = {}
    while True:
        if pos + 2 > len(blob):
            raise ValueError("jpeg: ran off the end before EOI")
        if blob[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if pos != len(blob):
                raise ValueError("jpeg: trailing bytes after EOI")
            break
        if pos + 2 > len(blob):
            raise ValueError("jpeg: truncated segment length")
        (seglen,) = struct.unpack(">H", blob[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(blob):
            raise ValueError("jpeg: segment overruns blob")
        body = blob[pos + 2 : pos + seglen]
        pos += seglen
        if marker == APP0:
            if body[:5] != b"JFIF\x00" or len(body) < 12:
                raise ValueError("jpeg: APP0 is not JFIF")
            found["jfif_major"] = body[5]
            found["jfif_minor"] = body[6]
            found["xdensity"], found["ydensity"] = struct.unpack(
                ">HH", body[8:12]
            )
        elif marker == COM:
            found["comment_bytes"] = len(body)
        elif marker == SOF0:
            if len(body) < 6:
                raise ValueError("jpeg: SOF0 too short")
            found["height"], found["width"] = struct.unpack(">HH", body[1:5])
            nc = body[5]
            if len(body) != 6 + 3 * nc:
                raise ValueError("jpeg: SOF0 component table size mismatch")
            found["n_components"] = nc
    if "width" not in found:
        raise ValueError("jpeg: no SOF0 frame header")
    if "jfif_major" not in found:
        raise ValueError("jpeg: no JFIF APP0")
    found.setdefault("comment_bytes", 0)
    return found
