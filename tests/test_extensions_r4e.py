"""Round-4e extensions: contiguous row-id assignment without a global
sort, and the watermarked stream-stream interval join.

Oracle hash-equality for q_assign_row_ids runs in test_oracle_queries
(LOCAL_ORACLE); this file pins goldens, plan shape, and the streaming
join's batch-equivalence + bounded state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.functions.ids import assign_row_ids
from streaminglens_spark.plans.audit import formatted_plan
from streaminglens_spark.sources.loaders import load_table
from streaminglens_spark.streaming.enrich import stream_interval_join
from tests.conftest import hidden_tmp, SF_DIR


# ---------------------------------------------------------- assign_row_ids

def test_row_ids_dense_and_order_stable(spark):
    # sparse, shuffled, negative keys -> ids are still the global rank
    keys = [7, -3, 1000, 0, 999, -100, 42]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {r["doc_id"]: r["row_id"] for r in assign_row_ids(df).collect()}
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


def test_row_ids_fixture_matches_global_rank(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = assign_row_ids(docs)
    n = docs.count()
    assert out.count() == n
    stats = out.agg(
        F.min("row_id"), F.max("row_id"), F.countDistinct("row_id")
    ).collect()[0]
    assert tuple(stats) == (0, n - 1, n)
    # order-stability: row_id sorted == doc_id sorted
    rows = out.orderBy("row_id").collect()
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)


def test_row_ids_no_global_sort_of_the_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    plan = formatted_plan(assign_row_ids(docs))
    # the big-side rank must be partitioned by shard; the only
    # single-partition exchange allowed is the n_shards-row offsets window
    assert "hashpartitioning(_shard" in plan
    assert plan.count("Exchange SinglePartition") <= 1


def test_row_ids_single_shard_degenerate(spark):
    # hi == lo: every row lands in shard 0 and ids still come out right
    df = spark.createDataFrame([(5,)], "doc_id long")
    assert assign_row_ids(df).collect()[0]["row_id"] == 0


# ----------------------------------------------------- stream interval join

def test_stream_interval_join_matches_batch_with_bounded_state(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    sample = (
        events.orderBy("event_id")
        .limit(80)
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        )
        .collect()
    )
    # split into left (even idx) / right (odd idx) halves
    left_rows = [r for i, r in enumerate(sample) if i % 2 == 0]
    right_rows = [r for i, r in enumerate(sample) if i % 2 == 1]
    horizon = 3_600_000 * 24 * 30  # wide enough to actually match pairs

    # batch truth: the naive theta-join spec
    lb = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ms"]) for r in left_rows],
        "l_event_id long, l_user long, l_ms long",
    )
    rb = spark.createDataFrame(
        [(r["event_id"], r["user_id"], r["ms"]) for r in right_rows],
        "r_event_id long, r_user long, r_ms long",
    )
    truth = {
        (r["l_event_id"], r["r_event_id"])
        for r in lb.join(
            rb,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ms") >= F.col("l_ms"))
            & (F.col("r_ms") < F.col("l_ms") + horizon),
        ).collect()
    }
    assert truth  # the fixture must exercise real matches

    def write_stream_dir(name, rows):
        src = str(tmp_path / name)
        os.makedirs(src)
        for i in range(2):
            path = os.path.join(src, f"f{i}.json")
            with open(hidden_tmp(path), "w") as f:
                for r in rows[i * len(rows) // 2 : (i + 1) * len(rows) // 2]:
                    f.write(
                        json.dumps(
                            {
                                "event_id": r["event_id"],
                                "user_id": r["user_id"],
                                "ms": r["ms"],
                            }
                        )
                        + "\n"
                    )
            os.rename(hidden_tmp(path), path)
        return src

    def read_stream(src, ts_name):
        return (
            spark.readStream.schema("event_id long, user_id long, ms long")
            .json(src)
            .select(
                "event_id",
                "user_id",
                F.timestamp_millis(F.col("ms")).alias(ts_name),
            )
        )

    lsrc = write_stream_dir("left", left_rows)
    rsrc = write_stream_dir("right", right_rows)
    joined = stream_interval_join(
        read_stream(lsrc, "lts"),
        read_stream(rsrc, "rts"),
        horizon_ms=horizon,
        # generous watermark: THIS test is about correctness equality only
        # (bounded-ness asserted below).  The eviction contract -- short
        # watermark, late batch, numRowsRemoved > 0 and shrinking state --
        # is exercised in tests/test_streaming_sessions.py::
        # test_stream_interval_join_watermark_evicts_state.
        watermark="365 days",
    )

    got: set[tuple] = set()

    def sink(df, batch_id):
        for r in df.collect():
            got.add((r["l_event_id"], r["r_event_id"]))

    q = joined.writeStream.foreachBatch(sink).queryName("ivj").start()
    try:
        q.processAllAvailable()
        assert got == truth
        # the join is genuinely stateful (unlike the as-of enrichment) and
        # state holds at most what was ingested
        ops = q.lastProgress["stateOperators"]
        assert ops and ops[0]["numRowsTotal"] <= len(sample)
    finally:
        q.stop()
