"""Deterministic telemetry derivation: ``events`` -> telemetry tables.

The reference's "database" is a set of driver-local mutable maps filled by a
``SparkListener`` (reference ``StreamingAppTracker.scala:33-42``,
``listener/StreamingAppListener.scala:39-217``).  In batch/oracle mode our
engine derives equivalent *relational* telemetry tables from the fixture
``events`` table with pure, integer-only column arithmetic, so that the exact
same tables can be produced by DuckDB SQL (see ``oracle/prelude.py``) and
every downstream operator is hash-checkable against the oracle.

Derivation spec (all times are epoch millis BIGINT; ``//`` is integer div):

batches   : batch_id = event_id // 100; base_ms = min(unix_millis(ts));
            n = count(*) per batch
progress  : par = batch_id % 2
            query_id  = '00000000-0000-0000-0000-00000000000' || par
            query_name= 'clickstream' when par = 0 else NULL
            run_id    = '11111111-1111-1111-1111-11111111111' || par
            num_input_rows = 0 when batch_id % 7 = 3 else n * (1 + batch_id % 4)
            processed_rps  = 0.0 when batch_id % 7 = 3
                             else double(50 + (batch_id % 10) * 25)
            sources  = [one of KafkaV2/FileStreamSource/KinesisSource/
                        MemoryStream by batch_id % 4]   (A15 matching)
            sink     = 'ForeachBatchSink'
jobs      : j in 0..3 per batch; pair = batch_id // 2
            job_id = pair * 8 + j * 2 + par     -- ids of the two concurrent
                                                -- queries interleave (A4 quirk)
            m3 = batch_id % 3 ; m5 = (batch_id % 5 == 0)
            start/end offsets from base_ms (ms):
              j=0: [0, 2500 if m5 else 1000]
              j=1: [500 if m3=0 else 1000 if m3=1 else 1600, start + (400 if m5 else 800)]
              j=2: [1200, 2000]
              j=3: [2100, 2900]
            exec group g: j in {0,1} -> 1 ; j=2 -> 1 if m5 else 2 ; j=3 -> NULL
            sql_exec_id = batch_id * 10 + g
            description = reference's ``spark.job.description`` format
            (4-field when the query is named, else 3-field;
             reference ``common/BatchDescription.scala:28-39``)
            This exercises: overlapping pairs (m3=0), touching spans (m3=1,
            start == prev end stays in one island -- strict '<' at reference
            ``helper/JobOverlapHelper.scala:91``), disjoint pairs (m3=2), and
            the lag-vs-cummax island quirk (m5: j0 covers j1 yet a split still
            happens because only the *previous* job's end is compared).
stages    : k in 0..3 per job (diamond DAG for A8):
            stage_id = job_id * 4 + k
            parents: k=0 -> [] ; k=1,2 -> [job_id*4] ; k=3 -> [job_id*4+1, job_id*4+2]
            num_tasks = 2 + k; span = [job_start + k*200, job_start + k*200 + 180]
tasks     : t in 0..num_tasks-1:
            task_id = stage_id * 10 + t
            executor_id = 'exec-' || ((job_id % 3) + (t % 2))   -- 0..3
            duration_ms = 100 + ((stage_id * 7 + t * 13) % 150)
            launch = stage_start + t*10 ; finish = launch + duration
            failed = ((stage_id + t) % 23 == 0)
executors : i in 0..3: executor_id = 'exec-' || i ; host = 'host-' || (i % 2)
            cores = 2 + (i % 3)
            start_ms = global_min_ms + i*500
            end_ms   = NULL when i = 3 else global_max_ms + 5000
            (open span -> corrected to batch end by A11, reference
             ``common/MicroBatchContext.scala:60-64``)
sla_config: ('clickstream', 4000)  -- named-query override; the unnamed query
            falls back to the 120000 ms default
            (reference ``config/StreamingLensConfig.scala:54-55``)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

UUID0 = "00000000-0000-0000-0000-00000000000"  # + parity digit
RUN0 = "11111111-1111-1111-1111-11111111111"  # + parity digit
DEFAULT_SLA_MS = 120_000  # StreamingLensConfig.scala:54-55
CLICKSTREAM_SLA_MS = 4_000

SOURCES_BY_MOD4 = [
    "KafkaV2[Subscribe[topic-0]]",
    "FileStreamSource[file:/data/in]",
    "KinesisSource[stream-a]",
    "MemoryStream[0]",
]


@dataclass
class Telemetry:
    """The derived telemetry bundle (engine-side mirror of the reference's
    StreamingAppTracker maps, reference ``StreamingAppTracker.scala:33-42``)."""

    progress: DataFrame
    jobs: DataFrame
    stages: DataFrame
    tasks: DataFrame
    executors: DataFrame
    sla_config: DataFrame

    def register(self, spark: SparkSession, prefix: str = "") -> None:
        for name in ("progress", "jobs", "stages", "tasks", "executors", "sla_config"):
            getattr(self, name).createOrReplaceTempView(prefix + name)


def _ts_ms(events: DataFrame) -> F.Column:
    """events.ts -> epoch millis.  With spark.sql.legacy.parquet.nanosAsLong
    the TIMESTAMP(NANOS) column arrives as BIGINT nanos; DuckDB's
    ``epoch_ms(ts)`` on the same file truncates identically (measured: both
    engines truncate toward zero, even pre-1970 -- the r3 advice premise
    that DuckDB floors holds only for non-integer operands)."""
    dtype = dict(events.dtypes)["ts"]
    if dtype == "bigint":
        return F.expr("ts div 1000000")
    if dtype.startswith("timestamp_ntz"):
        # micros parquet without UTC adjustment (e.g. DuckDB output); the
        # session TZ is pinned UTC so the cast is the identity instant
        return F.unix_millis(F.col("ts").cast("timestamp"))
    return F.unix_millis("ts")


def _batches(events: DataFrame) -> DataFrame:
    """One row per batch: (batch_id, base_ms, n, max_ms).  This is the ONLY
    aggregation over raw events; every derived table is a narrow transform
    of it, so ``derive_telemetry`` persists it and the whole telemetry
    bundle costs a single events scan + exchange per action."""
    return (
        events.select(
            (F.col("event_id") / F.lit(100)).cast("long").alias("batch_id"),
            _ts_ms(events).alias("ms"),
        )
        .groupBy("batch_id")
        .agg(
            F.min("ms").alias("base_ms"),
            F.count(F.lit(1)).alias("n"),
            F.max("ms").alias("max_ms"),
        )
    )


def derive_progress(events: DataFrame, batches: DataFrame | None = None) -> DataFrame:
    b = batches if batches is not None else _batches(events)
    par = F.col("batch_id") % 2
    nonew = (F.col("batch_id") % 7) == 3
    src = F.lit(None).cast("string")
    mod4 = F.col("batch_id") % 4
    for i, s in enumerate(SOURCES_BY_MOD4):
        src = F.when(mod4 == i, F.lit(s)).otherwise(src)
    return b.select(
        F.concat(F.lit(UUID0), par.cast("string")).alias("query_id"),
        F.when(par == 0, F.lit("clickstream")).cast("string").alias("query_name"),
        F.concat(F.lit(RUN0), par.cast("string")).alias("run_id"),
        F.col("batch_id"),
        F.col("base_ms").alias("ts_ms"),
        F.when(nonew, F.lit(0))
        .otherwise(F.col("n") * (1 + F.col("batch_id") % 4))
        .cast("long")
        .alias("num_input_rows"),
        F.when(nonew, F.lit(0.0))
        .otherwise((F.lit(50) + (F.col("batch_id") % 10) * 25).cast("double"))
        .alias("processed_rps"),
        F.array(src).alias("sources"),
        F.lit("ForeachBatchSink").alias("sink"),
    )


def derive_jobs(events: DataFrame, batches: DataFrame | None = None) -> DataFrame:
    b = batches if batches is not None else _batches(events)
    j = F.col("j")
    bid = F.col("batch_id")
    par = bid % 2
    pair = (bid / 2).cast("long")
    m3 = bid % 3
    m5 = (bid % 5) == 0

    s_off = (
        F.when(j == 0, F.lit(0))
        .when(j == 1, F.when(m3 == 0, 500).when(m3 == 1, 1000).otherwise(1600))
        .when(j == 2, F.lit(1200))
        .otherwise(F.lit(2100))
    )
    e_off = (
        F.when(j == 0, F.when(m5, 2500).otherwise(1000))
        .when(j == 1, s_off + F.when(m5, 400).otherwise(800))
        .when(j == 2, F.lit(2000))
        .otherwise(F.lit(2900))
    )
    grp = (
        F.when(j.isin(0, 1), F.lit(1))
        .when(j == 2, F.when(m5, 1).otherwise(2))
        .otherwise(F.lit(None))
    )
    query_id = F.concat(F.lit(UUID0), par.cast("string"))
    run_id = F.concat(F.lit(RUN0), par.cast("string"))
    named = par == 0
    # spark.job.description formats parsed by S4
    # (reference common/BatchDescription.scala:28-39)
    desc4 = F.concat(
        F.lit("clickstream<br/>id = "),
        query_id,
        F.lit("<br/>runId = "),
        run_id,
        F.lit("<br/>batch = "),
        bid.cast("string"),
    )
    desc3 = F.concat(
        F.lit("id = "),
        query_id,
        F.lit("<br/>runId = "),
        run_id,
        F.lit("<br/>batch = "),
        bid.cast("string"),
    )
    return (
        b.select("batch_id", "base_ms", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"))
        .select(
            query_id.alias("query_id"),
            bid.alias("batch_id"),
            (pair * 8 + j * 2 + par).cast("long").alias("job_id"),
            F.when(grp.isNotNull(), bid * 10 + grp).cast("long").alias("sql_exec_id"),
            (F.col("base_ms") + s_off).cast("long").alias("start_ms"),
            (F.col("base_ms") + e_off).cast("long").alias("end_ms"),
            F.when(named, desc4).otherwise(desc3).alias("description"),
        )
    )


def derive_stages(jobs: DataFrame) -> DataFrame:
    k = F.col("k")
    jid = F.col("job_id")
    s0 = (jid * 4).cast("long")
    parents = (
        F.when(k == 0, F.array().cast("array<bigint>"))
        .when(k.isin(1, 2), F.array(s0))
        .otherwise(F.array(s0 + 1, s0 + 2))
    )
    return jobs.select(
        "job_id", "start_ms", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k")
    ).select(
        (jid * 4 + k).cast("long").alias("stage_id"),
        jid.alias("job_id"),
        parents.alias("parent_ids"),
        (F.lit(2) + k).cast("long").alias("num_tasks"),
        (F.col("start_ms") + k * 200).cast("long").alias("start_ms"),
        (F.col("start_ms") + k * 200 + 180).cast("long").alias("end_ms"),
    )


def derive_tasks(stages: DataFrame) -> DataFrame:
    t = F.col("t")
    sid = F.col("stage_id")
    dur = (F.lit(100) + (sid * 7 + t * 13) % 150).cast("long")
    return stages.select(
        "stage_id",
        "job_id",
        "start_ms",
        F.explode(F.sequence(F.lit(0), (F.col("num_tasks") - 1).cast("int"))).alias("t"),
    ).select(
        (sid * 10 + t).cast("long").alias("task_id"),
        sid.alias("stage_id"),
        F.col("job_id"),
        F.concat(F.lit("exec-"), ((F.col("job_id") % 3) + (t % 2)).cast("string")).alias(
            "executor_id"
        ),
        (F.col("start_ms") + t * 10).cast("long").alias("launch_ms"),
        (F.col("start_ms") + t * 10 + dur).cast("long").alias("finish_ms"),
        dur.alias("duration_ms"),
        ((sid + t) % 23 == 0).alias("failed"),
    )


def derive_executors(events: DataFrame, batches: DataFrame | None = None) -> DataFrame:
    if batches is not None:
        # min of per-batch mins / max of per-batch maxes == global bounds
        g = batches.agg(F.min("base_ms").alias("lo"), F.max("max_ms").alias("hi"))
    else:
        g = events.select(_ts_ms(events).alias("ms")).agg(
            F.min("ms").alias("lo"), F.max("ms").alias("hi")
        )
    i = F.col("i")
    return g.select(F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"), "lo", "hi").select(
        F.concat(F.lit("exec-"), i.cast("string")).alias("executor_id"),
        F.concat(F.lit("host-"), (i % 2).cast("string")).alias("host"),
        (F.lit(2) + i % 3).cast("long").alias("cores"),
        (F.col("lo") + i * 500).cast("long").alias("start_ms"),
        F.when(i == 3, F.lit(None)).otherwise(F.col("hi") + 5000).cast("long").alias("end_ms"),
    )


def derive_sla_config(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [("clickstream", CLICKSTREAM_SLA_MS)], "query_key string, sla_ms bigint"
    )


def derive_telemetry(spark: SparkSession, events: DataFrame) -> Telemetry:
    # NOTE: the shared batches subtree is deliberately NOT persisted --
    # measured at sf0.1, caching it materializes 32 fixed partitions that
    # block AQE's partition coalescing through every downstream exchange and
    # roughly doubles chain wall-time (2.5s -> 3.3s for results_table);
    # recomputing the narrow aggregate per branch is cheaper than the cache
    # barrier on every target scale
    batches = _batches(events)
    jobs = derive_jobs(events, batches)
    stages = derive_stages(jobs)
    return Telemetry(
        progress=derive_progress(events, batches),
        jobs=jobs,
        stages=stages,
        tasks=derive_tasks(stages),
        executors=derive_executors(events, batches),
        sla_config=derive_sla_config(spark),
    )
