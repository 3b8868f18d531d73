"""Critical-path analysis (reference A8, A9).

A8 reproduces sparklens 0.3.1 ``JobTimeSpan.computeCriticalTimeForJob`` (the
reference imports it at ``helper/JobOverlapHelper.scala:22,77-81``): starting
from the job's MAX stage id, walk the stage DAG rootward; each stage
contributes its max single-task duration; a stage's critical time is its own
weight plus the max over its parents; missing parents contribute 0.

Spark mapping: a bounded iterative loop of self-joins (DAG depth is small --
single-digit for real Spark jobs), each iteration a hash join partitioned by
stage_id.  No driver-side data; scales to arbitrarily many jobs since the
loop length depends only on DAG *depth*, not job count.
"""

from __future__ import annotations

from functools import reduce

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stage_weights(stages: DataFrame, tasks: DataFrame) -> DataFrame:
    """Per-stage node weight = max single-task duration (sparklens
    ``taskExecutionTimes.max``): with infinite executors a stage cannot
    finish faster than its slowest task."""
    w = tasks.groupBy("stage_id").agg(F.max("duration_ms").alias("w"))
    return stages.select("job_id", "stage_id", "parent_ids").join(w, "stage_id", "left").select(
        "job_id", "stage_id", "parent_ids", F.coalesce("w", F.lit(0)).cast("long").alias("w")
    )


def critical_path_per_job(
    stages: DataFrame, tasks: DataFrame, impl: str = "pandas", max_depth: int = 64
) -> DataFrame:
    """A8 -- longest rootward path from the max stage id, per job.

    Returns (job_id, critical_ms).

    Two implementations, same semantics:

    - ``pandas`` (default): one shuffle collecting each job's (tiny) stage
      DAG into an array, then an Arrow-batched pandas UDF does a memoized
      DAG walk -- thousands of jobs per Python batch, so per-job Python
      overhead is amortized.  Scales with the *number* of jobs.
    - ``joins``: a bounded loop of JVM-side self-joins (one per DAG depth
      level).  No Python anywhere; use for adversarially deep/wide DAGs or
      UDF-free deployments.
    """
    if impl == "pandas":
        return _critical_path_pandas(stages, tasks)
    return _critical_path_joins(stages, tasks, max_depth)


def _critical_path_pandas(stages: DataFrame, tasks: DataFrame) -> DataFrame:
    """Single-shuffle plan: stage rows and task rows are unioned keyed by
    ``job_id`` and collected in ONE ``groupBy`` (the only exchange); the
    Arrow-batched walk computes per-stage max task duration in Python while
    it builds the DAG.  The r2 plan paid three exchanges
    (tasks->stage_id agg, stages join, job_id collect) for the same result;
    max-of-ints in Python is exact, so semantics are unchanged."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def walk(dags: pd.Series) -> pd.Series:
        out = []
        for dag in dags:
            nodes: dict[int, list[int]] = {}
            weights: dict[int, int] = {}
            for r in dag:
                # rt is an explicit row-type tag (0=stage, 1=task): a task
                # row with a NULL duration (schema-legal; only the REST path
                # filters them) must not be mistaken for a stage row.
                if r["rt"] == 0:  # stage row
                    nodes[int(r["stage_id"])] = (
                        [] if r["parent_ids"] is None else [int(p) for p in r["parent_ids"]]
                    )
                elif r["d"] is not None:  # task row: running max = stage weight
                    sid = int(r["stage_id"])
                    d = int(r["d"])
                    if d > weights.get(sid, -1):
                        weights[sid] = d
            memo: dict[int, int] = {}

            def crit(sid: int) -> int:
                # sparklens JobTimeSpan.criticalTime: missing stage -> (0, [])
                if sid in memo:
                    return memo[sid]
                if sid in nodes:
                    w, parents = weights.get(sid, 0), nodes[sid]
                else:
                    w, parents = 0, []
                v = w + (max((crit(p) for p in parents), default=0) if parents else 0)
                memo[sid] = v
                return v

            # A job with task rows but no stage rows (possible when tasks
            # carry their own job_id) has an empty DAG: critical time 0
            # rather than max() raising on an empty dict.
            out.append(crit(max(nodes)) if nodes else 0)
        return pd.Series(out)

    stg = stages.select(
        F.lit(0).alias("rt"),
        "job_id",
        "stage_id",
        "parent_ids",
        F.lit(None).cast("long").alias("d"),
    )
    if "job_id" in tasks.columns:
        keyed = tasks.select("job_id", "stage_id", "duration_ms")
    else:
        # tasks without a job key: attribute via the stage->job index (S2)
        keyed = tasks.select("stage_id", "duration_ms").join(
            stages.select("stage_id", "job_id"), "stage_id"
        )
    tsk = keyed.select(
        F.lit(1).alias("rt"),
        "job_id",
        "stage_id",
        F.lit(None).cast("array<bigint>").alias("parent_ids"),
        F.col("duration_ms").alias("d"),
    )
    dags = stg.unionByName(tsk).groupBy("job_id").agg(
        F.collect_list(F.struct("rt", "stage_id", "parent_ids", "d")).alias("dag")
    )
    return dags.select("job_id", walk(F.col("dag")).alias("critical_ms"))


def _critical_path_joins(stages: DataFrame, tasks: DataFrame, max_depth: int) -> DataFrame:
    from ..cache import track

    # tracked persist (released by the caller via cache.release_caches());
    # the returned plan still reads it, so it cannot be unpersisted here
    nodes = track(stage_weights(stages, tasks))
    rn = Window.partitionBy("job_id").orderBy(F.col("stage_id").desc())
    frontier = (
        nodes.withColumn("_rn", F.row_number().over(rn))
        .filter(F.col("_rn") == 1)
        .select("job_id", "stage_id", "parent_ids", F.col("w").alias("cum"))
        .persist()
    )

    terminals: list[DataFrame] = []
    for _ in range(max_depth):
        terminals.append(
            frontier.filter(F.size("parent_ids") == 0).select("job_id", "cum")
        )
        expanded = (
            frontier.filter(F.size("parent_ids") > 0)
            .select("job_id", F.explode("parent_ids").alias("pid"), "cum")
            .join(
                # sparklens walks the *per-job* stageMap: key by (job_id, stage)
                nodes.select(
                    "job_id",
                    F.col("stage_id").alias("pid"),
                    F.col("parent_ids").alias("p_parents"),
                    F.col("w").alias("pw"),
                ),
                on=["job_id", "pid"],
                how="left",
            )
            .select(
                "job_id",
                F.col("pid").alias("stage_id"),
                # missing parent stage: weight 0, no parents (sparklens getOrElse)
                F.coalesce("p_parents", F.array().cast("array<bigint>")).alias("parent_ids"),
                (F.col("cum") + F.coalesce("pw", F.lit(0))).alias("cum"),
            )
            .persist()
        )
        if expanded.isEmpty():
            frontier.unpersist()
            break
        frontier.unpersist()
        frontier = expanded

    all_terminal = reduce(lambda a, b: a.unionByName(b), terminals)
    out = all_terminal.groupBy("job_id").agg(F.max("cum").cast("long").alias("critical_ms"))
    return out


def critical_time(
    bounds: DataFrame,
    walltime: DataFrame,
    islanded: DataFrame,
    crit_per_job: DataFrame,
) -> DataFrame:
    """A9 -- ``criticalTime = driverTime + criticalPathTime`` where
    ``driverTime = (batchEnd - batchStart) - sum(island wall-clock)`` and
    ``criticalPathTime = sum over islands of max(per-job critical time)``
    (reference ``analyzer/StreamingCriticalPathAnalyzer.scala:30-49``).

    Only analyzed batches (valid bounds) get a critical time.
    """
    cp = (
        islanded.join(crit_per_job, "job_id", "left")
        .withColumn("jc", F.coalesce("critical_ms", F.lit(0)))
        .groupBy("query_id", "batch_id", "group_key", "island_id")
        .agg(F.max("jc").alias("island_crit"))
        .groupBy("query_id", "batch_id")
        .agg(F.sum("island_crit").cast("long").alias("critical_path_ms"))
    )
    analyzed = bounds.filter(F.col("valid"))
    return (
        analyzed.join(walltime, ["query_id", "batch_id"], "left")
        .join(cp, ["query_id", "batch_id"], "left")
        .select(
            "query_id",
            "batch_id",
            "batch_running_ms",
            (
                F.col("batch_running_ms")
                - F.coalesce("job_walltime_ms", F.lit(0))
                + F.coalesce("critical_path_ms", F.lit(0))
            )
            .cast("long")
            .alias("critical_ms"),
        )
    )
