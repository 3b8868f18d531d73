"""Core micro-batch analysis operators (reference A1, A4-A7).

Each operator is a pure DataFrame -> DataFrame transform; Catalyst fuses the
chain.  All are keyed by (query_id, batch_id) so every shuffle partitions on
the batch key -- at 100 TB of telemetry this scales horizontally: no global
windows, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_bounds(progress: DataFrame) -> DataFrame:
    """A1 -- estimate micro-batch wall-clock bounds from progress.

    Reference ``analyzer/StreamingQueryAnalyzer.scala:118-129``:
    ``end = (start + (numInputRows / processedRowsPerSecond) * 1000).toLong``
    (double math truncated), and ``(0, 0)`` when the batch moved no rows
    (the NONEWBATCHES path at ``:102-113``).
    """
    valid = (F.col("num_input_rows") != 0) & (F.col("processed_rps") != 0)
    end = (
        F.col("ts_ms") + (F.col("num_input_rows") / F.col("processed_rps")) * 1000
    ).cast("long")
    return progress.select(
        "query_id",
        "batch_id",
        valid.alias("valid"),
        F.when(valid, F.col("ts_ms")).otherwise(F.lit(0)).cast("long").alias("start_ms"),
        F.when(valid, end).otherwise(F.lit(0)).cast("long").alias("end_ms"),
        (F.when(valid, end).otherwise(F.lit(0)) - F.when(valid, F.col("ts_ms")).otherwise(0))
        .cast("long")
        .alias("batch_running_ms"),
    )


def batch_slice(jobs: DataFrame) -> DataFrame:
    """A4 -- per-batch telemetry slice, preserving the reference's
    *range* (not membership) semantics: all jobs whose id falls in
    ``[min, max]`` of the batch's own jobs are swept in, including jobs of
    concurrently-running other queries
    (reference ``common/MicroBatchContext.scala:89-121``).

    The ranges side is tiny (one row per batch) -- broadcast it so the
    range-predicate join never shuffles the big ``jobs`` table.
    """
    own = jobs.groupBy("query_id", "batch_id").agg(
        F.min("job_id").alias("lo"), F.max("job_id").alias("hi")
    )
    swept = F.broadcast(own).join(
        jobs.select(
            F.col("job_id"),
            F.col("sql_exec_id"),
            F.col("start_ms"),
            F.col("end_ms"),
        ),
        on=[F.col("job_id") >= F.col("lo"), F.col("job_id") <= F.col("hi")],
    )
    return swept.select(
        "query_id", "batch_id", "job_id", "sql_exec_id", "start_ms", "end_ms"
    )


def exec_groups(sliced: DataFrame) -> DataFrame:
    """A5 -- jobs sharing ``sql.execution.id`` form one group; jobs without
    one become singleton groups (reference ``helper/JobOverlapHelper.scala:35-56``,
    set-difference at ``:40-43`` == a null-key branch here).
    """
    return sliced.withColumn(
        "group_key",
        F.when(
            F.col("sql_exec_id").isNotNull(),
            F.concat(F.lit("exec-"), F.col("sql_exec_id").cast("string")),
        ).otherwise(F.concat(F.lit("job-"), F.col("job_id").cast("string"))),
    )


def islands(grouped: DataFrame) -> DataFrame:
    """A6 -- serial-split islanding inside each exec group.

    Reference ``helper/JobOverlapHelper.scala:83-106``: jobs sorted by start
    time; a new sublist starts when ``prev.endTime < cur.startTime``.
    CRITICAL quirk: ``prev`` is the *previous job in start order* (the last
    appended element), NOT the running max end -- a long first job does not
    keep later pairs together.  So this is ``lag(end_ms)``, not a cumulative
    max.  Touching spans (prev.end == cur.start) stay together (strict <).

    Start-time ties: the reference's ``sortWith(a.start < b.start)`` is a
    stable sort over map-iteration order (nondeterministic); we pin
    ``(start_ms, job_id)`` and document the divergence (SURVEY §4.1).
    """
    w = Window.partitionBy("query_id", "batch_id", "group_key").orderBy("start_ms", "job_id")
    prev_end = F.lag("end_ms").over(w)
    split = F.when(prev_end < F.col("start_ms"), 1).otherwise(0)
    return grouped.withColumn(
        "island_id",
        F.sum(split).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def job_walltime(islanded: DataFrame) -> DataFrame:
    """A7 -- wall-clock time spent in jobs: per final island
    ``max(end) - min(start)``, summed per batch
    (reference ``helper/JobOverlapHelper.scala:72-75``)."""
    per_island = islanded.groupBy("query_id", "batch_id", "group_key", "island_id").agg(
        (F.max("end_ms") - F.min("start_ms")).alias("island_ms")
    )
    return per_island.groupBy("query_id", "batch_id").agg(
        F.sum("island_ms").cast("long").alias("job_walltime_ms")
    )


def duration_anomalies(progress: DataFrame, k: int = 3) -> DataFrame:
    """Batch-duration anomaly flags per query (round-5 extension of the
    reference's monitoring domain -- the reference thresholds each batch
    against a FIXED SLA; this flags batches that are outliers against
    the query's OWN duration distribution, the complementary signal when
    no SLA is configured or the workload drifts).

    Test: ``(d - mean)^2 > k^2 * variance``, evaluated as the
    cross-multiplied INTEGER comparison ``(d*n - S)^2 > k^2 * (n*Q -
    S^2)`` over exact int64 sums (S = sum of durations, Q = sum of
    squares, both exact; the mixture-sample determinism rule), computed
    in decimal(38,0) so no scale of n/durations can overflow -- the
    flag is bit-deterministic across engines and partitionings.  Only
    VALID batches (the reference's NONEWBATCHES exclusion) participate.
    Zero-variance queries flag nothing (0 > 0 is false).

    Spark shape: one groupBy(query_id) for the O(#queries) stats table,
    broadcast back, flag map-only -- two passes, no window, no state.
    Returns (query_id, batch_id, duration_ms, is_anomaly)."""
    b = batch_bounds(progress).filter(F.col("valid"))
    d = F.col("batch_running_ms")
    stats = b.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(d).cast("long").alias("_s"),
        F.sum(d * d).cast("long").alias("_q"),
    )
    dec = "decimal(38,0)"
    n, s, q = (F.col(c).cast(dec) for c in ("_n", "_s", "_q"))
    dev = d.cast(dec) * n - s
    return (
        b.join(F.broadcast(stats), "query_id")
        .select(
            "query_id",
            "batch_id",
            d.alias("duration_ms"),
            (dev * dev > F.lit(k * k) * (n * q - s * s)).alias("is_anomaly"),
        )
    )


SLA_ROUND_MS = 500


def recommend_sla(progress: DataFrame, round_ms: int = SLA_ROUND_MS) -> DataFrame:
    """Data-driven SLA recommendation per query (round-5 extension of
    the reference's config surface: the reference ASKS the user for
    ``expectedMicroBatchSLAMillis`` and classifies against it; this
    derives the number the user should configure from the query's own
    history -- the answer to the reference docs' "how do I pick my
    SLA?").

    Method: exact integer duration quantiles per query (p50/p95/p99 as
    the smallest duration with ``cum*100 >= p*n`` -- the hist_quantiles
    pick rule applied to exact per-key sorted durations, affordable
    because a query's batch history is small by construction), then
    ``recommended_sla_ms`` = p99 rounded UP to the next ``round_ms``
    multiple (ceiling division -- a pure integer rule, so the whole
    output is oracle-hash-exact).  Only VALID batches participate.

    Spark shape: one groupBy(query_id) over (duration, count) pairs with
    a sorted-array fold -- same mergeable shape as the KMV two-level
    merge; no window, no global sort.  Returns (query_id, n_batches,
    p50_ms, p95_ms, p99_ms, recommended_sla_ms)."""
    b = batch_bounds(progress).filter(F.col("valid"))
    d = F.col("batch_running_ms")
    per = (
        b.groupBy("query_id", d.alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
    )
    # cumulative pick over the sorted (duration, count) runs: aggregate
    # carries (cum, n, p50, p95, p99) through one fold -- all integers
    n_total = F.aggregate(
        F.col("dc"), F.lit(0).cast("long"), lambda acc, x: acc + x["c"]
    )
    def pick(p):
        return F.aggregate(
            F.col("dc"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("long").alias("v"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x["c"]).alias("cum"),
                F.when(
                    acc["v"].isNull()
                    & ((acc["cum"] + x["c"]) * 100 >= F.lit(p) * F.col("_n")),
                    x["d"],
                )
                .otherwise(acc["v"])
                .alias("v"),
            ),
        )["v"]

    out = per.withColumn("_n", n_total).select(
        "query_id",
        F.col("_n").alias("n_batches"),
        pick(50).alias("p50_ms"),
        pick(95).alias("p95_ms"),
        pick(99).alias("p99_ms"),
    )
    return out.withColumn(
        "recommended_sla_ms",
        # integer ceiling division -- no float path (durations are
        # non-negative by construction, so the +r-1 form is exact)
        F.expr(f"((p99_ms + {round_ms} - 1) div {round_ms}) * {round_ms}").cast(
            "long"
        ),
    )
