"""JFIF marker-stream codec + probe (r5 continued), and the real-stream
vocab-drift monitor (stream-static via foreachBatch).  Oracle parity for
q_probe_image lives in test_oracle_queries.py."""

from __future__ import annotations

import json
import os

import pytest

from streaminglens_spark.functions.jpeg import (
    encode_minimal_jpeg,
    parse_jpeg,
)
from tests.conftest import hidden_tmp, SF_DIR


# ------------------------------------------------------------- pure codec

def test_jpeg_round_trip():
    blob = encode_minimal_jpeg(640, 480, 3, 96, 72, b"hello world")
    p = parse_jpeg(blob)
    assert (p["width"], p["height"], p["n_components"]) == (640, 480, 3)
    assert (p["jfif_major"], p["jfif_minor"]) == (1, 2)
    assert (p["xdensity"], p["ydensity"]) == (96, 72)
    assert p["comment_bytes"] == 11


def test_jpeg_rejects_malformed():
    good = encode_minimal_jpeg(8, 8, 1, 72, 72, b"x")
    cases = [
        b"",                                # empty
        b"\x00\x00" + good[2:],             # missing SOI
        good[:-2],                          # missing EOI
        good[:10],                          # truncated mid-segment
        good + b"\x00",                     # trailing junk after EOI
        good.replace(b"JFIF\x00", b"EXIF\x00"),  # non-JFIF APP0
    ]
    for blob in cases:
        with pytest.raises(ValueError):
            parse_jpeg(blob)


def test_jpeg_requires_sof():
    # build a stream with SOI + APP0 + EOI only
    full = encode_minimal_jpeg(8, 8, 1, 72, 72, b"")
    app0_end = full.index(b"\xff\xfe")  # COM marker start
    no_sof = full[:app0_end] + b"\xff\xd9"
    with pytest.raises(ValueError):
        parse_jpeg(no_sof)


def test_jpeg_encode_validates():
    with pytest.raises(ValueError):
        encode_minimal_jpeg(0, 8, 1, 72, 72, b"")
    with pytest.raises(ValueError):
        encode_minimal_jpeg(8, 8, 5, 72, 72, b"")


def test_probe_lenient_vs_strict(spark):
    from streaminglens_spark.functions.multimodal import probe_image

    good = encode_minimal_jpeg(16, 16, 1, 72, 72, b"ok")
    rows = [(0, "image_jpeg", bytearray(good), {"n_bytes": len(good)}),
            (1, "image_jpeg", bytearray(good[:8]), {"n_bytes": 8})]
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, payload binary,"
        " meta map<string,bigint>",
    )
    out = {r["doc_id"]: r for r in probe_image(media, strict=False).collect()}
    assert out[0]["width"] == 16 and out[1]["width"] == 0
    with pytest.raises(Exception):
        probe_image(media, strict=True).collect()


# --------------------------------------------- streaming drift monitoring

def test_stream_vocab_drift_against_baseline(spark, tmp_path):
    """vocab_drift runs stream-side: each micro-batch is diffed against a
    STATIC baseline inside foreachBatch; a batch drawn from the baseline
    itself scores near zero and an alien-vocabulary batch scores near
    the 2000-permille ceiling -- the live data-drift alarm."""
    from streaminglens_spark.functions.snapshot import vocab_drift

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    baseline = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in docs.limit(40).collect()],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    os.makedirs(src)
    batches = [
        [(r["doc_id"], r["text"]) for r in baseline.limit(20).collect()],
        [(10_000 + i, " ".join(f"alien{i}x{j}" for j in range(20)))
         for i in range(20)],
    ]
    for i, rows in enumerate(batches):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(hidden_tmp(path), path)

    verdicts = {}

    def monitor(batch_df, batch_id):
        rows = vocab_drift(baseline, batch_df).collect()
        if rows:
            sample = batch_df.select("doc_id").first()["doc_id"]
            verdicts[int(sample >= 10_000)] = rows[0]["total_l1_permille"]

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .writeStream.foreachBatch(monitor)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert set(verdicts) == {0, 1}
    assert verdicts[0] < 600, verdicts       # same-vocabulary batch
    assert verdicts[1] > 1500, verdicts      # alien batch near ceiling


def test_encode_rejects_oversize_comment_and_density():
    """ADVICE r5: oversize COM payloads / densities must raise ValueError,
    not struct.error (COM length field is 16-bit incl. its own 2 bytes)."""
    with pytest.raises(ValueError, match="comment"):
        encode_minimal_jpeg(16, 16, 1, 72, 72, b"x" * 65534)
    # 65533 is the exact cap and must round-trip
    blob = encode_minimal_jpeg(16, 16, 1, 72, 72, b"x" * 65533)
    assert parse_jpeg(blob)["comment_bytes"] == 65533
    with pytest.raises(ValueError, match="densit"):
        encode_minimal_jpeg(16, 16, 1, 65536, 72, b"")
    with pytest.raises(ValueError, match="densit"):
        encode_minimal_jpeg(16, 16, 1, 72, -1, b"")


def test_attach_jpeg_blob_truncates_giant_document(spark):
    """A >=64 KiB document must not crash the encode job: the COM payload
    truncates at 65533 bytes and the probe reports the capped size."""
    from streaminglens_spark.functions.multimodal import attach_jpeg_blob, probe_image

    docs = spark.createDataFrame(
        [(7, "y" * 70_000)], "doc_id long, text string"
    )
    row = probe_image(attach_jpeg_blob(docs)).collect()[0]
    assert row.comment_bytes == 65533
