"""Plan-shaping helpers for compute-dense map stages.

``scan_parallel`` exists because compute-dense projections (argmax folds
over broadcast centroid arrays, k x dim multiply-adds per row; bigram
explodes; PQ encode folds) run at SCAN parallelism: Spark assigns one task
per file split, and a small single-row-group parquet file -- the local
fixture shape -- yields 1-2 splits no matter how
``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` are tuned
(row groups are the unit of parquet splitting).  The stage's cost is CPU,
not IO, so it serializes on one core while 31 idle: measured at sf1,
``ivf_topk`` 5.9 s -> 1.9 s and ``kmeans_fit`` ~15 s -> 4.0 s from this
guard alone.

On a real cluster a 100 TB table has thousands of splits, the guard's
predicate (scan partitions < default parallelism) is false, and this is a
no-op -- it never adds a shuffle at scale; it only fixes the small-file
degenerate case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_parallel(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to cluster-default parallelism iff its scan
    yields fewer partitions -- use UNDER a compute-dense projection whose
    per-row cost dwarfs one extra (tiny) shuffle of its input.

    Result-neutral by construction: callers' downstream aggregates are
    order-independent (integer-quantized sums) and their rankings carry
    total tie-breaks, so row placement never changes values.  Streaming
    DataFrames are returned unchanged (micro-batch sizing governs their
    parallelism; ``.rdd`` is illegal on them)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
