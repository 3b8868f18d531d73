"""Streaming HLL sketch: the windowed register aggregation must produce
IDENTICAL estimates whether the rows arrive as one batch DataFrame or as a
multi-file stream (incremental state merge) -- the mergeability property
that makes the sketch the right distinct-count shape for continuous
ingest.  Also pins the single-stateful-agg plan contract (64 conditional-
max registers in one groupBy, estimate as a stateless projection)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.functions.sketch import hll_distinct, hll_distinct_windowed
from tests.conftest import hidden_tmp

HOUR_MS = 3_600_000


def _rows():
    # 3 hours, 2 event types, overlapping user sets; user ids chosen so
    # several land in the same HLL bucket (register max must merge)
    out = []
    for hr in range(3):
        for i in range(40):
            out.append({"ms": hr * HOUR_MS + i * 1000, "event_type": "a", "user_id": (i * 7) % 90})
            out.append({"ms": hr * HOUR_MS + i * 1000, "event_type": "b", "user_id": (i * 13) % 50})
    return out


def test_streaming_hll_equals_batch(spark, tmp_path):
    rows = _rows()
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)
    # three files -> three micro-batches; each window's rows are SPLIT
    # across files so the register state genuinely merges across batches
    for part in range(3):
        path = os.path.join(src_dir, f"f{part}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in rows[part::3]:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)

    schema = "ms long, event_type string, user_id long"
    prep = lambda df: df.withColumn("ets", F.timestamp_millis(F.col("ms")))  # noqa: E731

    stream = hll_distinct_windowed(
        prep(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src_dir)
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start_ms"], r["event_type"]): (r["hll_estimate"], r["zero_buckets"])
            for r in spark.table("hll_stream").collect()
        }
    finally:
        q.stop()

    batch = hll_distinct_windowed(prep(spark.read.json(src_dir)))
    want = {
        (r["window_start_ms"], r["event_type"]): (r["hll_estimate"], r["zero_buckets"])
        for r in batch.collect()
    }
    assert got == want
    assert len(got) == 6  # 3 windows x 2 types


def test_windowed_estimate_matches_flat_sketch(spark):
    """One window spanning all rows == the flat per-type sketch: the
    windowed register math must be bit-identical to hll_distinct."""
    rows = _rows()
    df = spark.createDataFrame(
        [(r["ms"], r["event_type"], r["user_id"]) for r in rows],
        "ms long, event_type string, user_id long",
    )
    windowed = hll_distinct_windowed(
        df.withColumn("ets", F.timestamp_millis(F.col("ms"))), window_dur="1 day"
    )
    flat = hll_distinct(df)
    got = {r["event_type"]: (r["hll_estimate"], r["zero_buckets"]) for r in windowed.collect()}
    want = {r["event_type"]: (r["hll_estimate"], r["zero_buckets"]) for r in flat.collect()}
    assert got == want


def test_streaming_hdr_windowed_equals_batch(spark, tmp_path):
    """r5: the windowed HDR bucket build is additive, so a 3-micro-batch
    stream (each window's rows split across batches) must emit cell counts
    bit-identical to one batch over the same rows."""
    from streaminglens_spark.functions.sketch import hdr_windowed

    rows = []
    for hr in range(3):
        for i in range(60):
            # heavy-tail-ish values spanning fine and coarse buckets
            rows.append(
                {
                    "ms": hr * HOUR_MS + i * 1000,
                    "event_type": "a" if i % 2 == 0 else "b",
                    "value": ((i * 37) % 7) * (10 ** (i % 5)) / 100.0,
                }
            )
    src_dir = str(tmp_path / "hdrin")
    os.makedirs(src_dir)
    for part in range(3):
        path = os.path.join(src_dir, f"f{part}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in rows[part::3]:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)

    schema = "ms long, event_type string, value double"
    prep = lambda df: df.withColumn("ets", F.timestamp_millis(F.col("ms")))  # noqa: E731

    stream = hdr_windowed(
        prep(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(src_dir)
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("hdr_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start_ms"], r["event_type"], r["lo"], r["w"]): r["cnt"]
            for r in spark.table("hdr_stream").collect()
        }
    finally:
        q.stop()

    batch = hdr_windowed(prep(spark.read.json(src_dir)))
    want = {
        (r["window_start_ms"], r["event_type"], r["lo"], r["w"]): r["cnt"]
        for r in batch.collect()
    }
    assert got == want and got
    assert sum(got.values()) == len(rows)  # every event lands in one cell
