"""End-to-end analysis pipeline: telemetry -> per-batch results table.

Engine equivalent of reference EP3 (``QueryInsightsManager`` ->
``StreamingQueryAnalyzer`` -> ``StreamingCriticalPathAnalyzer``): one
deterministic DataFrame chain
``progress -> bounds -> slice -> groups -> islands -> walltime/critical ->
state -> results``.  Every batch in ``progress`` yields exactly one results
row; batches that moved no rows follow the NONEWBATCHES path with zeroed
times (reference ``analyzer/StreamingQueryAnalyzer.scala:102-113``).

``analysis_ms`` is the reference's measured wall-clock analysis time
(``StreamingQueryAnalyzer.scala:80-87``); in deterministic batch/oracle mode
the engine pins it to 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..telemetry import Telemetry
from .analysis import batch_bounds, batch_slice, exec_groups, islands, job_walltime
from .classify import DEFAULT_SLA_MS, classify, resolve_sla
from .critical_path import critical_path_per_job, critical_time


def results_table(t: Telemetry, default_sla_ms: int = DEFAULT_SLA_MS) -> DataFrame:
    """Full per-batch results (reference ``common/results/*.scala`` schema:
    query_id, batch_id, analysis_ms, sla_ms, batch_running_ms, critical_ms,
    state_id, state)."""
    bounds = batch_bounds(t.progress)
    islanded = islands(exec_groups(batch_slice(t.jobs)))
    walltime = job_walltime(islanded)
    crit_job = critical_path_per_job(t.stages, t.tasks)
    crit = critical_time(bounds, walltime, islanded, crit_job)
    sla = resolve_sla(t.progress, t.sla_config, default_ms=default_sla_ms)
    classified = classify(crit, sla)

    nonew = (
        bounds.filter(~F.col("valid"))
        .join(F.broadcast(sla), "query_id")
        .select(
            "query_id",
            "batch_id",
            "sla_ms",
            F.lit(0).cast("long").alias("batch_running_ms"),
            F.lit(0).cast("long").alias("critical_ms"),
            F.lit(0).cast("int").alias("state_id"),
            F.lit("NONEWBATCHES").alias("state"),
        )
    )
    return (
        classified.unionByName(nonew)
        .select(
            "query_id",
            "batch_id",
            F.lit(0).cast("long").alias("analysis_ms"),
            "sla_ms",
            "batch_running_ms",
            "critical_ms",
            "state_id",
            "state",
        )
    )
