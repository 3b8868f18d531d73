"""Round-4 advice fixes: negative-input div-bucketing semantics, the
critical-path row-type tag, the dup-corpus id-space guard, tracked cache
release, and the once-per-sink gauge warning.

Div-bucketing finding (r3 advice item 4): the advice assumed DuckDB's
``//`` floors while Spark's ``div`` truncates.  Measured, DuckDB's INTEGER
``//`` (and ``epoch_ms``) truncate toward zero exactly like Spark -- the
engines already agree on negative inputs, and flooring the Spark side
would have CREATED the divergence.  The operators therefore keep
truncating semantics (self-consistent: interval bucketing stays complete,
histogram upper bounds stay valid, for every sign) and these tests pin
the cross-engine agreement with negative cents / pre-epoch timestamps."""

from __future__ import annotations

import logging

import duckdb
import pytest

from pyspark.sql import functions as F

from streaminglens_spark import cache
from streaminglens_spark.functions.joins import interval_join
from streaminglens_spark.functions.sketch import hist_quantiles
from streaminglens_spark.operators.critical_path import critical_path_per_job
from streaminglens_spark.operators.windows import time_rollup


# ------------------------------------------------------- floor-div semantics

def test_hist_quantiles_negative_cents_match_duckdb(spark):
    """Negative values must match the DuckDB ``//`` formulation bit-exactly
    (both engines truncate integer division toward zero -- measured)."""
    vals = [-12.34, -5.0, -0.01, 0.0, 0.01, 4.99, 5.0, 7.5, -7.5]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    got = {
        r["event_type"]: (r["n"], r["p50_ub_cents"], r["p95_ub_cents"])
        for r in hist_quantiles(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"('a', {v})" for v in vals)
        + ") t(event_type, value)"
    )
    want = con.execute("""
        WITH b AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) // 500 AS bin,
                   COUNT(*) AS c
            FROM e GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bin, c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM b
        )
        SELECT event_type, CAST(MAX(n) AS BIGINT),
               CAST((MIN(CASE WHEN cum * 100 >= 50 * n THEN bin END) + 1) * 500
                    AS BIGINT),
               CAST((MIN(CASE WHEN cum * 100 >= 95 * n THEN bin END) + 1) * 500
                    AS BIGINT)
        FROM cum GROUP BY 1
    """).fetchall()
    con.close()
    assert got == {r[0]: (r[1], r[2], r[3]) for r in want}
    # hand-check under truncating bins [-2,-1,-1,0,0,0,0,1,1]: p50 (5th
    # value) is in bin 0 -> ub 500; p95 in bin 1 -> ub 1000.  Every value
    # still satisfies value < its bin's upper bound, negatives included.
    assert got["a"] == (9, 500, 1000)


def test_time_rollup_pre_epoch_match_duckdb(spark):
    """Pre-1970 timestamps (negative epoch ms) must produce the same
    day/hour cells as DuckDB's ``%`` + ``//`` pair (both truncating)."""
    ns = [-90_000_000_000_000, -1_000_000, 0, 3_600_000_000_000]
    df = spark.createDataFrame(
        [(i, 1, "t", t, 1.0) for i, t in enumerate(ns)],
        "event_id long, user_id long, event_type string, ts long, value double",
    )
    got = {
        (r["day_idx"], r["hr"], r["gid"]): (r["n_events"], r["sum_cents"])
        for r in time_rollup(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"({t} // 1000000)" for t in ns)
        + ") t(ms)"
    )
    want = con.execute("""
        SELECT ms // 86400000 AS day_idx,
               (ms % 86400000) // 3600000 AS hr,
               CAST(GROUPING(ms // 86400000, (ms % 86400000) // 3600000)
                    AS BIGINT) AS gid,
               COUNT(*) AS n, CAST(SUM(100) AS BIGINT) AS cents
        FROM e GROUP BY ROLLUP(1, 2)
    """).fetchall()
    con.close()
    assert got == {(r[0], r[1], r[2]): (r[3], r[4]) for r in want}


def test_interval_join_pre_epoch_buckets(spark):
    """Pre-1970 interval/point pairs must still match: trunc(ms/W) is
    monotone, so an interval's bucket range covers every contained point's
    bucket for negative ms too (bucket 0 is double-width, which affects
    load spread, never completeness)."""
    points = spark.createDataFrame(
        [(1, -3_700_000), (2, -50), (3, 50)], "pid long, ms long"
    )
    intervals = spark.createDataFrame(
        [(100, -3_800_000, -3_600_000), (200, -100, 100)],
        "iid long, start_ms long, end_ms long",
    )
    got = {
        (r["pid"], r["iid"]) for r in interval_join(points, intervals).collect()
    }
    assert got == {(1, 100), (2, 200), (3, 200)}


# -------------------------------------------------- critical-path row typing

def test_critical_path_null_task_duration_not_misread(spark):
    """A task row with NULL duration is schema-legal; before the explicit
    row-type tag it was parsed as a STAGE row and clobbered the real
    stage's parents (r3 advice)."""
    stages = spark.createDataFrame(
        [(1, 2, [1]), (1, 1, [])],
        "job_id long, stage_id long, parent_ids array<bigint>",
    )
    tasks = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 20), (1, 2, None)],
        "job_id long, stage_id long, duration_ms long",
    )
    rows = {r["job_id"]: r["critical_ms"] for r in
            critical_path_per_job(stages, tasks).collect()}
    assert rows == {1: 30}  # 20 (stage 2) + 10 (parent stage 1)


def test_critical_path_task_only_job_is_zero(spark):
    """A job_id present in tasks but absent from stages has an empty DAG:
    critical time 0, not a ValueError from max() on an empty dict."""
    stages = spark.createDataFrame(
        [(1, 1, [])], "job_id long, stage_id long, parent_ids array<bigint>"
    )
    tasks = spark.createDataFrame(
        [(1, 1, 10), (7, 99, 50)], "job_id long, stage_id long, duration_ms long"
    )
    rows = {r["job_id"]: r["critical_ms"] for r in
            critical_path_per_job(stages, tasks).collect()}
    assert rows == {1: 10, 7: 0}


# ----------------------------------------------------- dup-corpus id guard

def test_minhash_rejects_oversized_doc_ids(spark):
    """r5 (r4 verdict #3): the guard is a per-row raise_error inside the
    hashing stage -- construction stays fully lazy (no Spark job), and the
    FIRST action fails loudly with the offending id."""
    from streaminglens_spark.functions.dedup import DUP_SHIFT, minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(DUP_SHIFT + 1, "some document text here")], "doc_id long, text string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("minhash-construct-guard", "laziness probe")
    try:
        pairs = minhash_lsh_pairs(docs)
        assert (
            sc.statusTracker().getJobIdsForGroup("minhash-construct-guard") == []
        ), "building minhash_lsh_pairs must not run any Spark job"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    with pytest.raises(Exception, match="DUP_SHIFT"):
        pairs.collect()


# ------------------------------------------------------- tracked cache pool

def test_release_caches_unpersists(spark):
    df = spark.createDataFrame([(1,)], "x long")
    tracked = cache.track(df)
    tracked.count()
    assert tracked.storageLevel.useMemory
    released = cache.release_caches()
    assert released >= 1
    assert not tracked.storageLevel.useMemory
    assert cache.release_caches() == 0  # idempotent


def test_tracked_caches_context(spark):
    df = spark.createDataFrame([(2,)], "x long")
    with cache.tracked_caches():
        t = cache.track(df)
        t.count()
        assert t.storageLevel.useMemory
    assert not t.storageLevel.useMemory


# ---------------------------------------------- gauge sink failure logging

def test_gauge_sink_failure_warns_once(spark, caplog):
    from streaminglens_spark.streaming.live import LiveAnalyzer

    class Capture:
        def snapshot(self):
            return []

    analyzer = LiveAnalyzer.__new__(LiveAnalyzer)
    analyzer.capture = Capture()
    analyzer.results = [
        {"query_id": "q", "batch_id": 1, "sla_ms": 1, "batch_running_ms": 1,
         "critical_ms": 1, "state_id": 2, "analysis_ms": 1}
    ]
    analyzer.scheduler_capture = None

    def broken(_name, _gauges):
        raise RuntimeError("sink down")

    analyzer.gauge_sinks = [broken]
    analyzer._warned_sinks = set()
    analyzer.extra_gauges = {}
    with caplog.at_level(logging.WARNING, logger="streaminglens_spark"):
        analyzer._publish_gauges()
        analyzer._publish_gauges()
    warns = [r for r in caplog.records if "gauge sink" in r.getMessage()]
    assert len(warns) == 1  # once per sink, then quiet
