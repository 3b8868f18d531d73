"""Reporting layer: discounted aggregation, recommendation buckets,
source-specific advice, gauges, JSON events, formatting
(reference A13-A17, A19-A21, A24)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DISCOUNT = 0.95  # streamingLens.reporter.discountFactor (StreamingLensConfig.scala:60)
MAX_RESULTS_RETENTION = 30  # StreamingLensConfig.scala:42

GAUGES = (
    # gauge name, results column  (metrics/StreamingLensMetricsReporter.scala:41-70)
    ("expectedMicroBatchSLAMillis", "sla_ms"),
    ("batchRunningTimeMillis", "batch_running_ms"),
    ("criticalTimeMillis", "critical_ms"),
    ("streamingQueryState", "state_id"),
    ("analysisTimeMillis", "analysis_ms"),
)


def results_topk(results: DataFrame, k: int = MAX_RESULTS_RETENTION) -> DataFrame:
    """A19 -- the results ring buffer: newest k results per query
    (reference ``QueryInsightsManager.scala:241-243``)."""
    w = Window.partitionBy("query_id").orderBy(F.col("batch_id").desc())
    return (
        results.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def discounted_state(results: DataFrame, last_reported_batch: int = -1) -> DataFrame:
    """A13 -- exponentially-discounted aggregate state over the buffered
    results (reference ``helper/StreamingLensReportingHelper.scala:180-197``):
    over buffer entries with ``batchId > lastReportedBatch`` and
    ``state != 0``, ordered oldest->newest with exponents n..1 (newest gets
    exponent 1), output ``sum(state * d^k) / sum(d^k)``; empty -> 0.0.

    The fold is reproduced as a sequential ``aggregate`` over a sorted array
    so the floating-point summation order matches the reference's foldLeft
    (and the DuckDB oracle's list_reduce) exactly; the result is rounded to
    6 decimals as the comparison contract.

    Plan (r3): a single sorted-struct fold -- (batch_id, state_id) pairs are
    collected per query and one ``aggregate`` with a struct accumulator
    computes numerator, denominator and position together.  This replaces
    r2's two window passes (row_number + count) and per-row weight column;
    the addition order and every float operation are identical
    (oldest->newest, weight ``pow(d, n - i)`` for 0-based i == the old
    ``pow(d, n - rn + 1)``), so the oracle SQL is unchanged.
    """
    buf = results_topk(results)
    eligible = buf.filter(
        (F.col("batch_id") > last_reported_batch) & (F.col("state_id") != 0)
    )
    per_query = eligible.groupBy("query_id").agg(
        F.array_sort(F.collect_list(F.struct("batch_id", "state_id"))).alias("terms")
    )
    n = F.size("terms")
    acc0 = F.struct(
        F.lit(0.0).alias("num"), F.lit(0.0).alias("den"), F.lit(0).alias("i")
    )
    folded = F.aggregate(
        F.col("terms"),
        acc0,
        lambda acc, x: F.struct(
            (acc["num"] + x["state_id"] * F.pow(F.lit(DISCOUNT), n - acc["i"])).alias("num"),
            (acc["den"] + F.pow(F.lit(DISCOUNT), n - acc["i"])).alias("den"),
            (acc["i"] + F.lit(1)).alias("i"),
        ),
    )
    agg = per_query.select(
        "query_id",
        F.round(folded["num"] / folded["den"], 6).alias("aggregated_state"),
    )
    # queries whose buffer had no eligible entries aggregate to 0.0
    # (reference returns 0.0 on an empty stateList, :182-184)
    return (
        buf.select("query_id")
        .distinct()
        .join(agg, "query_id", "left")
        .select("query_id", F.coalesce("aggregated_state", F.lit(0.0)).alias("aggregated_state"))
    )


def _source_reco_over(src: F.Column) -> F.Column:
    # helper/StreamingLensReportingHelper.scala:148-159
    return (
        F.when(src.contains("Kafka"),
               "Increase maxOffsetsPerTrigger to ingest more data through Kafka Source<br>")
        .when(src.contains("File"),
              "Increase maxFilesPerTrigger to ingest more data through File Source<br>")
        .otherwise("Tune source configurations to ingest more data<br>")
    )


def _source_reco_unhealthy(src: F.Column) -> F.Column:
    # helper/StreamingLensReportingHelper.scala:160-172
    return (
        F.when(src.contains("Kafka"),
               "Increase kafka partitions to ingest more data in parallel<br>")
        .when(src.contains("Kinesis"),
              "Increase number of kinesis shards to ingest more data in parallel<br>")
        .otherwise("Tune source configurations to increase parallelism<br>")
    )


def latest_sources(progress: DataFrame) -> DataFrame:
    """sourcesDesc is overwritten with each progress event
    (``QueryInsightsManager.scala:85-88``), so reporting sees the sources of
    the latest batch."""
    w = Window.partitionBy("query_id").orderBy(F.col("batch_id").desc())
    return (
        progress.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("query_id", "query_name", "run_id", "sources")
    )


def source_recommendations(progress: DataFrame) -> DataFrame:
    """A15 -- substring-matched per-source advice, for both branches that use
    it (reference ``helper/StreamingLensReportingHelper.scala:143-175``)."""
    latest = latest_sources(progress).select("query_id", F.explode("sources").alias("source"))
    over = latest.select(
        "query_id",
        F.lit("OVERPROVISIONED").alias("for_state"),
        "source",
        _source_reco_over(F.col("source")).alias("recommendation"),
    )
    unhealthy = latest.select(
        "query_id",
        F.lit("UNHEALTHY").alias("for_state"),
        "source",
        _source_reco_unhealthy(F.col("source")).alias("recommendation"),
    )
    return over.unionByName(unhealthy)


def state_buckets(
    results: DataFrame, progress: DataFrame, last_reported_batch: int = -1
) -> DataFrame:
    """A14 -- bucket the aggregated state and render the recommendation text
    (reference ``helper/StreamingLensReportingHelper.scala:103-141``).

    Bucket gap quirk: values in (0, 1) -- reachable only when ERROR(-1)
    results participate -- hit a MatchError in the reference which is
    swallowed by ``sendEvent``'s catch; the engine mirrors this by emitting
    NO row for such queries.
    """
    agg = discounted_state(results, last_reported_batch)
    srcs = latest_sources(progress)
    joined = agg.join(srcs, "query_id", "left")

    over_src = F.aggregate(
        F.transform(F.col("sources"), _source_reco_over), F.lit(""), lambda a, x: F.concat(a, x)
    )
    unhealthy_src = F.aggregate(
        F.transform(F.col("sources"), _source_reco_unhealthy), F.lit(""), lambda a, x: F.concat(a, x)
    )
    a = F.col("aggregated_state")
    state = (
        F.when(a == 0.0, "NO NEW BATCHES")
        .when((a >= 1) & (a <= 1.5), "NEEDS ATTENTION")
        .when((a > 1.5) & (a <= 2.5), "GOOD")
        .when((a > 2.5) & (a <= 3.5), "NEEDS ATTENTION")
        .when(a > 3.5, "AT RISK")
    )
    reco = (
        F.when(a == 0.0, F.lit("Streaming Query State: NO NEW BATCHES<br>"))
        .when(
            (a >= 1) & (a <= 1.5),
            F.concat(
                F.lit("Streaming Query State: OVERPROVISIONED<br>Recommendations:<br>> "),
                over_src,
                F.lit(
                    "> Decrease the value of trigger Interval to process latest data<br>"
                    "> You can decrease the number of executors if more than one to reduce cost<br>"
                ),
            ),
        )
        .when(
            (a > 1.5) & (a <= 2.5),
            F.lit(
                "Streaming Query State: OPTIMUM<br>Recommendations:<br>"
                "Streaming Pipeline doing Okay. No Recommendations<br>"
            ),
        )
        .when(
            (a > 2.5) & (a <= 3.5),
            F.lit(
                "Streaming Query State: UNDERPROVISIONED<br>Recommendations:<br>"
                "Scale up to ensure your pipeline doesn't fall behind<br>"
            ),
        )
        .when(
            a > 3.5,
            F.concat(
                F.lit("Streaming Query State: UNHEALTHY<br>Recommendations:<br>> "),
                unhealthy_src,
                F.lit(
                    "> Use more efficient nodes<br>"
                    "> Increase shuffle partitions if query has aggregations<br>"
                ),
            ),
        )
    )
    return (
        joined.withColumn("state", state)
        .withColumn("recommendation", reco)
        .filter(F.col("state").isNotNull())  # bucket-gap (0,1): no event
        .select("query_id", "aggregated_state", "state", "recommendation")
    )


def event_json(results: DataFrame, progress: DataFrame) -> DataFrame:
    """A17 -- the insights event rendered as JSON
    (reference ``helper/StreamingLensReportingHelper.scala:80-92``): fields
    eventId, name, runId, eventTimeMillis, state, displayText.  Rendered
    compact with a fixed key order; eventTimeMillis (wall clock in the
    reference) is pinned to the query's max batch ts for determinism;
    eventId starts at 0."""
    buckets = state_buckets(results, progress)
    meta = latest_sources(progress)
    times = progress.groupBy("query_id").agg(F.max("ts_ms").alias("event_time_ms"))
    return (
        buckets.join(meta, "query_id")
        .join(times, "query_id")
        .select(
            "query_id",
            F.concat(
                F.lit('{"eventId":0,"name":'),
                F.when(
                    F.col("query_name").isNotNull(),
                    F.concat(F.lit('"'), F.col("query_name"), F.lit('"')),
                ).otherwise(F.lit("null")),
                F.lit(',"runId":"'),
                F.col("run_id"),
                F.lit('","eventTimeMillis":'),
                F.col("event_time_ms").cast("string"),
                F.lit(',"state":"'),
                F.col("state"),
                F.lit('","displayText":"'),
                F.col("recommendation"),
                F.lit('"}'),
            ).alias("event_json"),
        )
    )


def last_gauges(results: DataFrame, progress: DataFrame) -> DataFrame:
    """A20 -- Dropwizard-style gauges reading the newest buffered result per
    query (reference ``metrics/StreamingLensMetricsReporter.scala:41-70``),
    melted to (source_name, gauge, value) rows.  Source name is
    ``spark.streaming.<queryName ?? queryId>`` (``:35``)."""
    w = Window.partitionBy("query_id").orderBy(F.col("batch_id").desc())
    last = results.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    named = last.join(
        progress.select("query_id", "query_name").distinct(), "query_id", "left"
    ).withColumn(
        "source_name",
        F.concat(F.lit("spark.streaming."), F.coalesce("query_name", "query_id")),
    )
    melted = None
    for gauge, col in GAUGES:
        part = named.select(
            "source_name", F.lit(gauge).alias("gauge"), F.col(col).cast("long").alias("value")
        )
        melted = part if melted is None else melted.unionByName(part)
    return melted


def fmt_duration(ms: F.Column) -> F.Column:
    """A21 -- millis -> '%02ds %03dms' (reference
    ``QueryInsightsManager.scala:228-232``; truncating TimeUnit division)."""
    secs = (ms - ms % 1000) / 1000
    return F.format_string("%02ds %03dms", secs.cast("long"), (ms % 1000).cast("long"))


def fmt_durations(results: DataFrame) -> DataFrame:
    return results.select(
        "query_id",
        "batch_id",
        fmt_duration(F.col("batch_running_ms")).alias("brt_fmt"),
        fmt_duration(F.col("critical_ms")).alias("ct_fmt"),
    )


def insight_text(results: DataFrame) -> DataFrame:
    """A24 -- the boxed driver-log insight block
    (reference ``QueryInsightsManager.scala:206-232``)."""
    bar = "|" * 18
    head = f" {bar} StreamingLens Inisights {'|' * 25}"
    foot = f" {'|' * 68}"
    return results.select(
        "query_id",
        "batch_id",
        F.concat_ws(
            "\n",
            F.lit(head),
            F.concat(F.lit(" BatchId: "), F.col("batch_id").cast("string")),
            F.concat(F.lit(" Analysis Time: "), fmt_duration(F.col("analysis_ms"))),
            F.concat(F.lit(" Expected Micro Batch SLA: "), fmt_duration(F.col("sla_ms"))),
            F.concat(F.lit(" Batch Running Time: "), fmt_duration(F.col("batch_running_ms"))),
            F.concat(F.lit(" Critical Time: "), fmt_duration(F.col("critical_ms"))),
            F.concat(F.lit(" Streaming Query State: "), F.col("state")),
            F.lit(foot),
        ).alias("insight"),
    )
