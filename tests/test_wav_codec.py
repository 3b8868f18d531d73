"""Stdlib WAV/PCM codec (r5): round-trip identity, container edge cases,
and strict-mode decode behavior.  End-to-end decode verification runs in
test_oracle_queries (q_decode_audio's codec-free oracle)."""

from __future__ import annotations

import struct

import pytest

from streaminglens_spark.functions.wav import decode_pcm16_wav, encode_pcm16_wav


def test_round_trip_identity():
    samples = [0, 1, -1, 100, -100, 32767, -32768, 12345, -12345]
    for sr in (8000, 16000, 44100):
        sr2, got = decode_pcm16_wav(encode_pcm16_wav(sr, samples))
        assert (sr2, got) == (sr, samples)


def test_odd_sample_count_padding():
    # 3 samples -> 6 data bytes (even); 1 sample -> 2 bytes; the RIFF pad
    # path triggers only for odd chunk sizes, which 16-bit data never has,
    # but a foreign odd-size chunk must still be skipped correctly
    samples = [7, -7, 7]
    wav = encode_pcm16_wav(8000, samples)
    # inject an odd-sized junk chunk between fmt and data
    pos = 12 + 8 + 16  # after fmt chunk
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = wav[:pos] + junk + wav[pos:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    sr, got = decode_pcm16_wav(patched)
    assert (sr, got) == (8000, samples)


def test_empty_samples():
    sr, got = decode_pcm16_wav(encode_pcm16_wav(8000, []))
    assert (sr, got) == (8000, [])


def test_out_of_range_sample_rejected():
    with pytest.raises(ValueError, match="int16"):
        encode_pcm16_wav(8000, [40000])


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda w: b"", "RIFF"),
        (lambda w: w[:10], "RIFF"),
        (lambda w: b"OggS" + w[4:], "RIFF"),
        (lambda w: w[:-4], "truncated"),
        # stereo fmt
        (
            lambda w: w[: 12 + 8] + w[12 + 8 : 12 + 8 + 2] + b"\x02\x00" + w[12 + 8 + 4 :],
            "channel",
        ),
    ],
)
def test_malformed_rejected(mutate, msg):
    wav = encode_pcm16_wav(8000, [1, 2, 3, 4])
    with pytest.raises(ValueError, match=msg):
        decode_pcm16_wav(mutate(wav))


def test_decode_audio_strict_raises_on_garbage(spark):
    from streaminglens_spark.functions.multimodal import (
        AUDIO_SCHEMA,
        decode_audio,
    )

    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"not a wav"), (8000, 4, "wav", 9))],
        AUDIO_SCHEMA,
    )
    with pytest.raises(Exception, match="RIFF"):
        decode_audio(media, strict=True).collect()
    rows = decode_audio(media, strict=False).collect()
    assert rows[0]["decoder"] == "undecodable"


# ------------------------------------------------- real resize (image side)

def test_resize_image_identity_and_downsample(spark):
    """Small canvases (longest side <= 16) pass through unchanged
    (out dims == dims, md5 == original bytes' md5); large ones downsample
    with the longest side capped at 16 and aspect preserved."""
    import hashlib

    from pyspark.sql import functions as F

    from streaminglens_spark.functions.multimodal import (
        attach_png_blob,
        resize_image,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = {r["doc_id"]: r for r in
           resize_image(attach_png_blob(docs.filter(F.col("doc_id") < 60))).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.filter(F.col("doc_id") < 60).collect()}
    for doc_id, r in out.items():
        w, h = doc_id % 64 + 1, doc_id % 48 + 1
        assert (r["width"], r["height"]) == (w, h)
        assert max(r["out_width"], r["out_height"]) <= 16
        if max(w, h) <= 16:
            assert (r["out_width"], r["out_height"]) == (w, h)
            raw = texts[doc_id].encode()
            pix = (raw * ((w * h) // len(raw) + 1))[: w * h]
            assert r["resized_md5"] == hashlib.md5(pix).hexdigest()
        else:
            # integer aspect preservation: out = max(1, side*16 // longest)
            side = max(w, h)
            assert r["out_width"] == max(1, (w * 16) // side)
            assert r["out_height"] == max(1, (h * 16) // side)


def test_audio_frames_cover_waveform_exactly(spark):
    """Frame invariants over the real decode: frames tile the waveform
    with no gap/overlap (sum of frame_n == n_samples), every frame but
    the last is full, per-doc totals of sum_sq match the whole-waveform
    decode (energy is additive over a partition of the samples)."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.multimodal import (
        AUDIO_FRAME_LEN,
        attach_wav_blob,
        audio_frames,
        decode_audio,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 80)
    media = attach_wav_blob(docs)
    frames = audio_frames(media).collect()
    whole = {r["doc_id"]: r for r in decode_audio(media).collect()}
    per_doc: dict[int, list] = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert per_doc.keys() == whole.keys()
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r["frame_idx"])
        w = whole[doc_id]
        assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
        assert sum(r["frame_n"] for r in rows) == w["n_samples"]
        assert all(r["frame_n"] == AUDIO_FRAME_LEN for r in rows[:-1])
        assert sum(r["sum_sq"] for r in rows) == w["sum_sq"]
        assert max(r["peak_abs"] for r in rows) == w["peak_abs"]
        # within-frame sign changes can only MISS the cross-boundary ones
        assert sum(r["zero_cross"] for r in rows) <= w["zero_cross"]
        assert w["zero_cross"] - sum(r["zero_cross"] for r in rows) < len(rows)
