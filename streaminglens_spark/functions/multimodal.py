"""Multimodal column handling (north-star extension).

Media are opaque ``BINARY`` payload columns plus a typed metadata struct --
the schema pattern a 100 TB training-data pipeline uses (payloads stay
byte-opaque to Catalyst; metadata is columnar and prunable/filterable).

Since the fixture tables carry no real media, ``attach_blob`` derives a
deterministic payload from ``documents.text`` (identical bytes in the
DuckDB oracle via ``CAST(text AS BLOB)``), with a synthetic header that the
"codec" parses.  The decode / resize / frame-sample operators implement the
REAL Spark plumbing -- ``mapInPandas`` over Arrow batches, schema-stable
output, partition-preserving -- with the codec itself stubbed:
``decode_image`` uses Pillow when importable, else a clearly-marked
deterministic fake (this container ships no image libs; see
``NotImplementedError`` path for strict mode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary,"
    " meta struct<width: bigint, height: bigint, format: string, n_bytes: bigint>"
)

DECODED_SCHEMA = (
    "doc_id bigint, width bigint, height bigint, format string,"
    " mean_byte double, decoder string"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, offset_byte bigint, frame_hash string"


def attach_blob(documents: DataFrame) -> DataFrame:
    """Derive a (payload BINARY, meta STRUCT) media column pair from text:
    payload = UTF-8 bytes; meta.width/height from deterministic arithmetic;
    format cycles png/jpeg/webp."""
    n = F.length("text").cast("long")
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("webp")
    )
    return documents.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.col("doc_id") % 64 + 1).cast("long").alias("width"),
            (F.col("doc_id") % 48 + 1).cast("long").alias("height"),
            fmt.alias("format"),
            n.alias("n_bytes"),
        ).alias("meta"),
    )


def blob_meta(documents: DataFrame) -> DataFrame:
    """SQL-expressible metadata extraction over the binary column:
    byte length + md5 checksum + declared format (the scan-side projection
    a pipeline runs before any decode)."""
    media = attach_blob(documents)
    return media.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        (F.col("meta.width") * F.col("meta.height")).cast("long").alias("n_pixels"),
    )


def media_meta(documents: DataFrame) -> DataFrame:
    """Combined scan-side media metadata: ``blob_meta``'s checksum/format
    projection plus ``resize_meta``'s resize plan in ONE single-pass
    projection (no join -- both halves are pure column ops over the same
    ``attach_blob`` row, so Catalyst folds them into one scan)."""
    media = attach_blob(documents)
    w = F.col("meta.width")
    h = F.col("meta.height")
    side = F.greatest(w, h)
    scale = F.when(side > 16, F.lit(16) / side).otherwise(F.lit(1.0))
    return media.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        (w * h).cast("long").alias("n_pixels"),
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("long").alias("out_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("long").alias("out_height"),
    )


def decode_image(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode the payload via ``mapInPandas`` (Arrow-batched, schema-stable).

    Real deployments decode with Pillow/libvips here; this container has no
    image codecs, so the fallback is a deterministic fake decoder that
    reads the synthetic header (meta struct) and computes the payload's
    mean byte value -- keeping batch shape, schema and partitioning
    identical to the real thing.  ``strict=True`` raises
    ``NotImplementedError`` instead of faking.
    """
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if strict and not has_pil:
        raise NotImplementedError(
            "image decode requires Pillow; install it or use strict=False "
            "(deterministic fake decoder)"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
                "format": [m["format"] for m in pdf["meta"]],
                "mean_byte": [
                    (sum(p) / len(p)) if len(p) else 0.0 for p in pdf["payload"]
                ],
                "decoder": ["pillow" if has_pil else "fake"] * len(pdf),
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, DECODED_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Resize planning as a pure column op (no decode needed): compute the
    scaled dimensions that keep aspect ratio with the longest side capped --
    the metadata half of a resize stage; the pixel half plugs into
    ``decode_image``'s mapInPandas slot."""
    w = F.col("meta.width")
    h = F.col("meta.height")
    side = F.greatest(w, h)
    scale = F.when(side > max_side, F.lit(max_side) / side).otherwise(F.lit(1.0))
    return media.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("long").alias("out_width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("long").alias("out_height"),
    )


def frame_sample(media: DataFrame, every_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads via ``mapInPandas``: emit up
    to ``max_frames`` evenly-spaced "frames" (byte slices) per payload --
    the row-expanding UDF shape (one input row -> N output rows) that real
    frame extraction uses."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, offs, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k in range(min(max_frames, max(n // every_bytes, 1))):
                    off = k * every_bytes
                    chunk = bytes(payload[off : off + every_bytes])
                    ids.append(doc_id)
                    idxs.append(k)
                    offs.append(off)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "offset_byte": offs, "frame_hash": hashes}
            )

    return media.mapInPandas(sample, FRAME_SCHEMA)
