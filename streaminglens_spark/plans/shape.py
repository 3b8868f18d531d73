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


# logical operators that imply an exchange somewhere below: their output
# already runs at shuffle parallelism, AND probing `.rdd` on such a plan
# under AQE would EXECUTE the upstream query stages at plan-build time
# (AdaptiveSparkPlanExec materializes stages to report partitioning) --
# the real action would then recompute them (r7 review finding).
_SHUFFLE_NODES = (
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "Distinct",
    "Deduplicate",
    "Repartition",
    "RepartitionByExpression",
    "Intersect",
    "Except",
)


def _has_shuffle_below(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(f"{node} " in plan or f"{node}\n" in plan for node in _SHUFFLE_NODES)


def scan_parallel(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to cluster-default parallelism iff its scan
    yields fewer partitions -- use UNDER a compute-dense projection whose
    per-row cost dwarfs one extra (tiny) shuffle of its input.

    Result-neutral by construction: callers' downstream aggregates are
    order-independent (integer-quantized sums) and their rankings carry
    total tie-breaks, so row placement never changes values.  Streaming
    DataFrames are returned unchanged (micro-batch sizing governs their
    parallelism; ``.rdd`` is illegal on them).  Inputs whose ANALYZED
    plan already contains a shuffle-inducing operator are also returned
    unchanged: their output runs at shuffle parallelism anyway, and the
    ``.rdd`` partition probe on such a plan would execute the upstream
    AQE query stages at plan-build time only for the action to recompute
    them."""
    if df.isStreaming:
        return df
    if _has_shuffle_below(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
