"""Partition-sizing and watermark-delay advisors (r5 continued).
Oracle hash parity lives in test_oracle_queries.py."""

from __future__ import annotations

import datetime

from streaminglens_spark.functions.advisor import (
    TARGET_PARTITION_BYTES,
    partition_advisor,
    watermark_advisor,
)
from streaminglens_spark import registry
from tests.conftest import SF_DIR


def test_partition_advisor_golden(spark):
    # 3 rows, 300 MB payload -> 3 shuffle partitions at 128 MB, 1 file
    rows = [(i, "x" * (100 * 1024 * 1024 // 1024)) for i in range(3)]
    # (use 100 KB strings scaled: fake bytes via many rows instead)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["n_rows"] == 3
    assert r["data_bytes"] == 3 * (100 * 1024 * 1024 // 1024)
    assert r["rec_shuffle_partitions"] == 1  # 300 KB << 128 MB
    assert r["rows_per_partition"] == 3


def test_partition_advisor_scales_with_bytes(spark):
    # synthesize row count x string length crossing one target boundary
    n = 40
    chunk = TARGET_PARTITION_BYTES // 16  # 8 MB
    rows = [(i, "y" * chunk) for i in range(n)]  # 320 MB total
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["data_bytes"] == n * chunk
    assert r["rec_shuffle_partitions"] == 3  # ceil(320/128)
    assert r["rec_output_files"] == 1
    assert r["rows_per_partition"] == n // 3


def test_partition_advisor_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["n_rows"] == 0 and r["data_bytes"] == 0
    assert r["rec_shuffle_partitions"] == 1 and r["rec_output_files"] == 1


def test_watermark_advisor_golden(spark):
    base = datetime.datetime(2024, 1, 1)

    def ts(s):
        return base + datetime.timedelta(seconds=s)

    # user 1 arrival order: ts 10, 20, 5 (late by 15 s), 30
    rows = [
        (0, ts(10), 1, "a", 0.0, "{}"),
        (1, ts(20), 1, "a", 0.0, "{}"),
        (2, ts(5), 1, "a", 0.0, "{}"),
        (3, ts(30), 1, "a", 0.0, "{}"),
        # user 2: perfectly ordered
        (4, ts(1), 2, "a", 0.0, "{}"),
        (5, ts(2), 2, "a", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r["delay_ms"]: r
        for r in watermark_advisor(
            df, delays_ms=(0, 10_000, 20_000)
        ).collect()
    }
    assert out[0]["n_events"] == 6
    assert out[0]["n_late"] == 1          # the 15 s-late event
    assert out[10_000]["n_late"] == 1     # still later than 10 s
    assert out[20_000]["n_late"] == 0     # 20 s watermark absorbs it
    assert out[0]["permille"] == 1000 // 6


def test_watermark_advisor_monotone_on_fixture(spark):
    rows = sorted(
        registry.q_watermark_advisor(spark, SF_DIR).collect(),
        key=lambda r: r["delay_ms"],
    )
    lates = [r["n_late"] for r in rows]
    assert lates == sorted(lates, reverse=True), lates
    assert all(r["n_events"] == rows[0]["n_events"] for r in rows)
