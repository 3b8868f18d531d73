"""Scheduler-telemetry bridge tests: real job/stage/task capture from a live
local stream, making critical-path analysis non-degenerate without any
injected telemetry provider (VERDICT r1 item 2)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streaminglens_spark.config import StreamingLensConfig
from streaminglens_spark.streaming.live import (
    LiveAnalyzer,
    ProgressCapture,
    attach,
    detach,
)
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


def test_scheduler_provider_batch_equivalence(spark):
    """Batch/live equivalence extended to jobs-backed analysis: a
    SchedulerCapture loaded with the fixture-derived telemetry produces,
    through tick(), exactly the rows the batch pipeline computes over the
    same tables."""
    from streaminglens_spark.config import StreamingLensConfig
    from streaminglens_spark.operators.pipeline import results_table
    from streaminglens_spark.sources.loaders import load_table
    from streaminglens_spark.streaming.scheduler import SchedulerCapture
    from streaminglens_spark.telemetry import Telemetry, derive_telemetry

    t = derive_telemetry(spark, load_table(spark, "/root/testdata/sf0.001", "events"))

    cap = ProgressCapture()
    cap.rows = [
        (
            r["query_id"], r["query_name"], r["run_id"], r["batch_id"], r["ts_ms"],
            r["num_input_rows"], r["processed_rps"], list(r["sources"]), r["sink"],
        )
        for r in t.progress.collect()
    ]
    sched = SchedulerCapture()
    for r in t.jobs.collect():
        sched._jobs[r["job_id"]] = {
            "query_id": r["query_id"], "batch_id": r["batch_id"],
            "sql_exec_id": r["sql_exec_id"], "start_ms": r["start_ms"],
            "end_ms": r["end_ms"], "description": r["description"],
        }
    for r in t.stages.collect():
        sched._stage_job[r["stage_id"]] = r["job_id"]
        sched._stage_meta[r["stage_id"]] = (list(r["parent_ids"]), r["num_tasks"])
        sched._stage_span[r["stage_id"]] = (r["start_ms"], r["end_ms"])
    for r in t.tasks.collect():
        sched._tasks.append(
            (r["task_id"], r["stage_id"], r["job_id"], r["executor_id"],
             r["launch_ms"], r["finish_ms"], r["duration_ms"], r["failed"])
        )
    for r in t.executors.collect():
        sched._executors[r["executor_id"]] = {
            "host": r["host"], "cores": r["cores"],
            "start_ms": r["start_ms"], "end_ms": r["end_ms"],
        }

    class _Clock:
        def __call__(self):
            return 1_900_000_000.0

    cfg = StreamingLensConfig({"streamingLens.maxAnalysisTimeSeconds": "120"})
    analyzer = LiveAnalyzer(
        spark, cap, config=cfg, scheduler_capture=sched, clock=_Clock()
    )
    live = {(r["query_id"], r["batch_id"]): r for r in analyzer.tick()}

    empty_sla = spark.createDataFrame([], "query_key string, sla_ms bigint")
    batch = {
        (r["query_id"], r["batch_id"]): r.asDict()
        for r in results_table(
            Telemetry(
                progress=t.progress, jobs=t.jobs, stages=t.stages,
                tasks=t.tasks, executors=t.executors, sla_config=empty_sla,
            ),
            default_sla_ms=cfg.expected_micro_batch_sla_millis,
        ).collect()
    }
    assert set(live) == set(batch)
    assert live == batch


def test_scheduler_purge_below():
    """A18 on the scheduler side: purged batches drop their jobs, stages and
    tasks; other queries' rows survive."""
    from streaminglens_spark.streaming.scheduler import SchedulerCapture

    cap = SchedulerCapture()
    for jid, (qid, bid) in enumerate([("q1", 0), ("q1", 5), ("q2", 0)]):
        cap._jobs[jid] = {
            "query_id": qid, "batch_id": bid, "sql_exec_id": None,
            "start_ms": 0, "end_ms": 1, "description": "d",
        }
        cap._stage_job[jid * 10] = jid
        cap._stage_meta[jid * 10] = ([], 1)
        cap._stage_span[jid * 10] = (0, 1)
        cap._tasks.append((jid * 100, jid * 10, jid, "e", 0, 1, 1, False))
    cap.purge_below("q1", 4)
    jobs, stages, tasks, _ = cap.snapshot_rows()
    assert {j[2] for j in jobs} == {1, 2}  # q1 batch 0 purged
    assert {s[0] for s in stages} == {10, 20}
    assert {t[2] for t in tasks} == {1, 2}


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
