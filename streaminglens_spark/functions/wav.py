"""Minimal stdlib RIFF/WAVE PCM codec (round-5 extension) -- the audio
sibling of ``functions/png``: real container parsing, real sample
decoding, zero third-party dependencies, so the multimodal audio path is
a REAL decode (a wrong decoder hash-mismatches the codec-free oracle),
not a stub.

Scope: 16-bit signed little-endian PCM, mono, one ``data`` chunk -- the
canonical uncompressed WAV.  Anything else (compressed formats, multi-
channel, 8/24-bit) raises ``ValueError`` so ``decode_audio(strict=True)``
fails loudly instead of faking samples.

Format reference: RIFF container (chunks are [id:4][size:4le][payload],
odd sizes padded), ``fmt `` chunk = PCM header, ``data`` chunk = samples.
Public format (Microsoft/IBM RIFF 1991); no reference-repo counterpart
(the reference has no media handling).
"""

from __future__ import annotations

import struct


def encode_pcm16_wav(sample_rate: int, samples: list[int]) -> bytes:
    """Conforming mono 16-bit PCM WAV from integer samples (each clamped
    to int16 range by the caller; values out of range raise here)."""
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} out of int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH",
        1,                 # audio format: PCM
        1,                 # channels: mono
        sample_rate,
        sample_rate * 2,   # byte rate
        2,                 # block align
        16,                # bits per sample
    )
    chunks = b"".join(
        [
            b"fmt ",
            struct.pack("<I", len(fmt)),
            fmt,
            b"data",
            struct.pack("<I", len(data)),
            data,
            b"" if len(data) % 2 == 0 else b"\x00",  # RIFF pad
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_pcm16_wav(data: bytes) -> tuple[int, list[int]]:
    """(sample_rate, samples) from a mono 16-bit PCM WAV; ``ValueError``
    on any malformed or unsupported payload."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (csize,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, sr, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported audio format {audio_fmt} (not PCM)")
            if channels != 1:
                raise ValueError(f"unsupported channel count {channels}")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
            sample_rate = sr
        elif cid == b"data":
            if csize % 2 != 0:
                raise ValueError("odd data-chunk size for 16-bit samples")
            samples = list(struct.unpack(f"<{csize // 2}h", body))
        pos += 8 + csize + (csize % 2)  # odd chunks are padded
    if sample_rate is None:
        raise ValueError("missing fmt chunk")
    if samples is None:
        raise ValueError("missing data chunk")
    return sample_rate, samples
