"""Executor concurrency sweep and cores lookup (reference A11, A12, S7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def job_executors(tasks: DataFrame) -> DataFrame:
    """S7 -- distinct executors that ran tasks of each job
    (reference ``listener/StreamingAppListener.scala:93-107``)."""
    return tasks.select("job_id", "executor_id").distinct()


def sliced_executors(
    sliced: DataFrame, job_execs: DataFrame, executors: DataFrame
) -> DataFrame:
    """A4's executor slice: executors used by the batch's (range-swept) jobs,
    via left-semi joins (reference ``common/MicroBatchContext.scala:123-129``).
    Returns one row per (query_id, batch_id, executor...)."""
    batch_execs = (
        sliced.select("query_id", "batch_id", "job_id")
        .join(job_execs, "job_id")
        .select("query_id", "batch_id", "executor_id")
        .distinct()
    )
    return batch_execs.join(F.broadcast(executors), "executor_id")


def max_concurrency(batch_executors: DataFrame, bounds: DataFrame) -> DataFrame:
    """A11 -- max concurrent executors per batch
    (reference ``common/MicroBatchContext.scala:35-78``):

    - flatten spans to (start, +1), (end, -1) events,
    - open spans (end NULL / 0) corrected to the batch end,
    - sort by time with +1 before -1 on ties (``:72-77``),
    - running sum, max, floored at 1 (local mode has no executor events).

    The window partitions by (query_id, batch_id): per-batch event counts are
    tiny even at 100 TB total telemetry, so no single-partition bottleneck.
    """
    with_end = batch_executors.join(
        bounds.select("query_id", "batch_id", F.col("end_ms").alias("batch_end_ms")),
        ["query_id", "batch_id"],
    ).withColumn("corr_end", F.coalesce("end_ms", F.col("batch_end_ms")))
    starts = with_end.select(
        "query_id", "batch_id", F.col("start_ms").alias("t"), F.lit(1).alias("delta")
    )
    ends = with_end.select(
        "query_id", "batch_id", F.col("corr_end").alias("t"), F.lit(-1).alias("delta")
    )
    events = starts.unionByName(ends)
    w = (
        Window.partitionBy("query_id", "batch_id")
        .orderBy(F.col("t"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = events.withColumn("running", F.sum("delta").over(w))
    return running.groupBy("query_id", "batch_id").agg(
        F.greatest(F.max("running"), F.lit(1)).cast("long").alias("max_concurrent")
    )


def executor_cores(batch_executors: DataFrame, bounds: DataFrame) -> DataFrame:
    """A12 -- executor cores per batch.  The reference reads the cores of the
    "last" executor in hash-map order (nondeterministic,
    ``common/MicroBatchContext.scala:80-87``); the engine pins a deterministic
    definition: the executor with the greatest (start_ms, executor_id).
    Default 1 when the slice has no executors."""
    w = Window.partitionBy("query_id", "batch_id").orderBy(
        F.col("start_ms").desc(), F.col("executor_id").desc()
    )
    last = (
        batch_executors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", "batch_id", "cores")
    )
    return (
        bounds.filter(F.col("valid"))
        .select("query_id", "batch_id")
        .join(last, ["query_id", "batch_id"], "left")
        .select(
            "query_id", "batch_id", F.coalesce("cores", F.lit(1)).cast("long").alias("cores")
        )
    )
