"""Engine-native sinks.

The reference's only sinks are the driver log, a Dropwizard registry and a
reflection-loaded JSON reporter (all reproduced as queries/reporters).  The
engine adds the sink a 100 TB deployment actually needs: partitioned Parquet
for the results/telemetry tables, laid out so downstream reads prune on the
analysis keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_results(results: DataFrame, path: str, mode: str = "append") -> None:
    """Results partitioned by query_id: per-query reads (gauges, reporting,
    retention audits) touch one partition; batch_id ordering stays within
    partitions."""
    results.write.mode(mode).partitionBy("query_id").parquet(path)


def read_results(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_telemetry(t, base_path: str, mode: str = "overwrite") -> None:
    """Materialize the telemetry bundle -- the at-scale alternative to
    re-deriving per query (PERF.md): jobs/stages/tasks partitioned by the
    keys every downstream operator joins or groups on."""
    t.progress.write.mode(mode).partitionBy("query_id").parquet(f"{base_path}/progress")
    t.jobs.write.mode(mode).partitionBy("query_id").parquet(f"{base_path}/jobs")
    t.stages.write.mode(mode).parquet(f"{base_path}/stages")
    t.tasks.write.mode(mode).parquet(f"{base_path}/tasks")
    t.executors.write.mode(mode).parquet(f"{base_path}/executors")
    t.sla_config.write.mode(mode).parquet(f"{base_path}/sla_config")
