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


# --- exactly-once foreachBatch sink (round-5 extension) ----------------------

_COMMIT_MARKER = "_COMMITTED"


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via py4j -- scheme-aware (file://, hdfs://,
    s3a://), so the idempotence protocol works wherever the cluster
    writes, not just the local FS."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, hpath


def idempotent_batch_sink(path: str):
    """``foreachBatch`` function giving EXACTLY-ONCE parquet output on
    top of Structured Streaming's at-least-once replay contract: each
    micro-batch lands in ``<path>/batch_id=<id>`` and is sealed with an
    atomic ``_COMMITTED`` marker AFTER the write completes.  A replayed
    batch (restart between sink completion and checkpoint commit -- the
    standard duplicate window) sees its marker and SKIPS; a half-written
    directory (crash mid-write, no marker) is silently rewritten by
    ``mode("overwrite")`` on replay.  Batch-id in the directory name
    doubles as partition pruning for downstream incremental readers.

    This is the engine-native spelling of the "foreachBatch + batchId
    dedup" recipe the Structured Streaming guide prescribes for
    non-transactional stores; no driver state beyond the marker files,
    so it survives driver restarts and concurrent readers."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        out = f"{path}/batch_id={batch_id}"
        fs, _ = _hadoop_fs(spark, out)
        jvm = spark._jvm
        marker = jvm.org.apache.hadoop.fs.Path(f"{out}/{_COMMIT_MARKER}")
        if fs.exists(marker):
            return  # replayed batch: output already committed
        batch_df.write.mode("overwrite").parquet(out)
        fs.create(marker, True).close()

    return sink


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Union of the COMMITTED batch directories only: a half-written
    batch (no marker) is invisible to readers -- the read side of the
    exactly-once contract.  One driver-side listing of ``path`` (O(number
    of batches), the same cost every file source pays)."""
    fs, hpath = _hadoop_fs(spark, path)
    dirs = []
    for status in fs.listStatus(hpath):
        p = status.getPath()
        if not status.isDirectory() or not p.getName().startswith("batch_id="):
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            f"{p.toString()}/{_COMMIT_MARKER}"
        )
        if fs.exists(marker):
            dirs.append(p.toString())
    if not dirs:
        raise ValueError(f"read_committed: no committed batches under {path}")
    return spark.read.option("basePath", path).parquet(*dirs)


# --- deterministic training-shard export (round-5 extension) -----------------

def write_training_shards(
    df: DataFrame, path: str, key: str = "doc_id", n_shards: int = 32
) -> None:
    """Export a corpus in its deterministic training order: the
    data-loader handoff.  ``corpus_shuffle`` assigns every row its
    hash-order position and round-robin shard (a pure function of the
    key -- re-running the export reproduces byte-identical shard
    contents); rows are then clustered by shard and sorted by position
    WITHIN each shard task, so every ``shard=N`` directory reads back in
    exact training order with a plain sequential parquet scan -- the
    loader never sorts, seeks or shuffles.  Round-robin interleaving
    means every shard sees the same source/time mixture in expectation,
    so data-parallel workers consuming distinct shards train on
    exchangeable streams."""
    from ..functions.sampling import corpus_shuffle

    order = corpus_shuffle(df.select(key), key=key, n_shards=n_shards)
    (
        df.join(order, key)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def read_training_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard in training order (partition pruning: only shard=N is
    read; file order is the write order, so the scan IS the order)."""
    return spark.read.parquet(path).filter(f"shard = {shard}")
