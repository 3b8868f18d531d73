"""Streaming semantics beyond the happy path: watermark late-data handling
on the engine's event-time windows, and the scheduler bridge under TWO
concurrent queries (the reference fixture's core scenario, live)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from tests.conftest import hidden_tmp

HOUR_MS = 3_600_000


def test_tumbling_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling agg with a 10-minute watermark: a window is
    emitted once the watermark passes its end, and a late row older than
    the watermark is dropped (never merged, never re-emitted)."""
    src_dir = str(tmp_path / "in")
    os.makedirs(src_dir)

    def write_file(name: str, rows: list[dict]) -> None:
        path = os.path.join(src_dir, name)
        with open(hidden_tmp(path), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)  # atomic appearance

    stream = (
        spark.readStream.schema("user_id long, ms long, cents long")
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
        .withColumn("ets", F.timestamp_millis(F.col("ms")))
        .withWatermark("ets", "10 minutes")
        .groupBy(F.window("ets", "1 hour").alias("w"))
        .agg(F.sum("cents").alias("sum_cents"), F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("win_start_s"), "sum_cents", "n")
    )

    write_file("f1.json", [
        {"user_id": 1, "ms": 10 * 60_000, "cents": 100},   # 00:10
        {"user_id": 2, "ms": 20 * 60_000, "cents": 250},   # 00:20
    ])
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_tumbling")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance event time far past hour 0: watermark -> 02:20
        write_file("f2.json", [{"user_id": 3, "ms": 150 * 60_000, "cents": 70}])
        q.processAllAvailable()
        # a LATE row for hour 0, older than the watermark -> dropped
        write_file("f3.json", [{"user_id": 4, "ms": 30 * 60_000, "cents": 999}])
        q.processAllAvailable()
        # one more batch so any (incorrect) re-emission would surface
        write_file("f4.json", [{"user_id": 5, "ms": 300 * 60_000, "cents": 10}])
        q.processAllAvailable()

        rows = spark.sql("SELECT * FROM wm_tumbling").collect()
        hour0 = [r for r in rows if r["win_start_s"] == 0]
        assert len(hour0) == 1, f"hour-0 window emitted {len(hour0)} times"
        # the late 999-cent row was dropped: only f1's two rows aggregated
        assert hour0[0]["n"] == 2 and hour0[0]["sum_cents"] == 350
    finally:
        q.stop()


def test_streaming_exact_dedup_with_watermark(spark, tmp_path):
    """Streaming counterpart of dedup_exact: dropDuplicates on the content
    fingerprint with a watermark bounding state -- duplicates arriving in
    LATER micro-batches are suppressed; a duplicate older than the
    watermark is dropped as late data (state for it was already evicted)."""
    src_dir = str(tmp_path / "docs")
    os.makedirs(src_dir)

    def write_file(name, rows):
        p = os.path.join(src_dir, name)
        with open(hidden_tmp(p), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(p), p)

    stream = (
        spark.readStream.schema("doc_id long, text string, ms long")
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
        .withColumn("ets", F.timestamp_millis(F.col("ms")))
        .withColumn("md5_fp", F.md5(F.col("text").cast("binary")))
        .withWatermark("ets", "10 minutes")
        .dropDuplicates(["md5_fp"])
        .select("doc_id", "md5_fp")
    )
    write_file("f1.json", [
        {"doc_id": 1, "text": "alpha", "ms": 10 * 60_000},
        {"doc_id": 2, "text": "beta", "ms": 11 * 60_000},
        {"doc_id": 3, "text": "alpha", "ms": 12 * 60_000},  # in-batch dup
    ])
    q = (
        stream.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # cross-batch duplicate: suppressed by state
        write_file("f2.json", [{"doc_id": 4, "text": "beta", "ms": 13 * 60_000}])
        q.processAllAvailable()
        rows = {r["doc_id"] for r in spark.sql("SELECT * FROM stream_dedup").collect()}
        assert rows == {1, 2}, rows  # one row per distinct text, first wins
    finally:
        q.stop()


def test_live_control_plane_stays_bounded_over_many_ticks(spark):
    """A18/A19 live: across 30 ticks of a growing stream, the captured
    progress rows and the results buffer stay bounded by the retention
    configs -- control-plane memory cannot grow with stream lifetime."""
    from streaminglens_spark.config import StreamingLensConfig
    from streaminglens_spark.streaming.live import LiveAnalyzer, ProgressCapture
    from tests.test_streaming import _Clock, _fake_progress

    cap = ProgressCapture()
    clock = _Clock()
    a = LiveAnalyzer(
        spark,
        cap,
        config=StreamingLensConfig({
            "streamingLens.maxAnalysisTimeSeconds": "120",
            "streamingLens.maxResultsRetention": "5",
            "streamingLens.maxBatchesRetention": "4",
        }),
        clock=clock,
    )
    base = 1_700_000_000_000
    for b in range(30):
        cap.rows.append(_fake_progress("q1", b, base + b * 60_000))
        clock.advance(301)
        a.tick()
    assert len(a.results) <= 5, "A19 ring buffer overflowed"
    # A18: progress rows of purged batches evicted; only a bounded tail kept
    assert len(cap.snapshot()) <= 2 * 4 + 1, f"purge left {len(cap.snapshot())} rows"
    assert max(r[3] for r in cap.snapshot()) == 29  # newest retained


def test_scheduler_bridge_two_concurrent_queries(spark):
    """Two streams at once: S4 parses each job to its own query, A4's range
    slice runs per (query, batch), and tick() yields results for BOTH
    queries from real scheduler telemetry."""
    from streaminglens_spark.config import StreamingLensConfig
    from streaminglens_spark.streaming.live import LiveAnalyzer, attach, detach
    from streaminglens_spark.streaming.scheduler import (
        attach_scheduler,
        detach_scheduler,
    )

    cap = attach(spark)
    sched = attach_scheduler(spark)
    queries = []
    try:
        for name in ("left_stream", "right_stream"):
            queries.append(
                spark.readStream.format("rate-micro-batch")
                .option("rowsPerBatch", 10)
                .load()
                .writeStream.foreachBatch(lambda df, bid: df.count())
                .queryName(name)
                .start()
            )
        deadline = time.time() + 120
        while time.time() < deadline:
            jobs, _, _, _ = sched.snapshot_rows()
            qids = {j[0] for j in jobs}
            progress_qids = {r[0] for r in cap.snapshot()}
            if len(qids) >= 2 and len(progress_qids) >= 2:
                break
            time.sleep(0.5)
        for q in queries:
            q.stop()

        jobs, _, _, _ = sched.snapshot_rows()
        assert len({j[0] for j in jobs}) == 2, "jobs of both queries captured"

        class _Clock:
            def __call__(self):
                return time.time() + 3600

        analyzer = LiveAnalyzer(
            spark,
            cap,
            config=StreamingLensConfig({"streamingLens.maxAnalysisTimeSeconds": "120"}),
            scheduler_capture=sched,
            clock=_Clock(),
        )
        results = analyzer.tick()
        by_query = {}
        for r in results:
            by_query.setdefault(r["query_id"], []).append(r)
        assert len(by_query) == 2, f"expected both queries analyzed: {by_query.keys()}"
    finally:
        for q in queries:
            if q.isActive:
                q.stop()
        detach(spark, cap)
        detach_scheduler(spark, sched)
