"""Sequential control-plane state machines (reference A2, A18).

These are the two reference behaviors that are genuinely sequential per
query: the min-batches analysis gate and the telemetry retention purge.  The
idiomatic Spark shape for per-key sequential state is grouped-map
``applyInPandas`` -- each query's (small) progress history is processed as
one vectorizable group, and queries scale out across executors exactly like
``applyInPandasWithState`` would in live streaming mode.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_BATCHES_DEFAULT = 1  # StreamingLensConfig.scala:40
MAX_BATCHES_RETENTION = 10  # StreamingLensConfig.scala:44


def batch_gate(progress: DataFrame, min_batches: int = MIN_BATCHES_DEFAULT) -> DataFrame:
    """A2 -- analyze only when ``batchId - lastAnalyzedBatchId >= minBatches``
    (reference ``analyzer/StreamingQueryAnalyzer.scala:132-136``).
    ``lastAnalyzedBatchId`` starts at -1 and advances ONLY on successful
    analysis, i.e. when the batch also had valid bounds
    (``StreamingQueryAnalyzer.scala:81``: updated inside the analysis future).
    Returns (query_id, batch_id, analyzed)."""

    def machine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("batch_id")
        last = -1
        out = []
        for b, valid in zip(pdf["batch_id"], pdf["valid"]):
            passes = b - last >= min_batches
            if passes and valid:
                last = b
            out.append(passes and valid)
        return pd.DataFrame(
            {"query_id": pdf["query_id"], "batch_id": pdf["batch_id"], "analyzed": out}
        )

    src = progress.select(
        "query_id",
        "batch_id",
        ((F.col("num_input_rows") != 0) & (F.col("processed_rps") != 0)).alias("valid"),
    )
    return src.groupBy("query_id").applyInPandas(
        machine, "query_id string, batch_id bigint, analyzed boolean"
    )


def purge_set(progress: DataFrame, jobs: DataFrame,
              retention: int = MAX_BATCHES_RETENTION) -> DataFrame:
    """A18 -- retention purge trigger points
    (reference ``QueryInsightsManager.scala:234-240``,
    ``StreamingAppTracker.scala:44-74``): after each progress event with
    ``numInputRows != 0`` and ``batchId - lastPurgedBatch >= retention``, all
    jobs up to the batch's max job id (plus their stages and index entries)
    are deleted; ``lastPurgedBatch`` starts at -1.  Zero-row batches never
    purge (``:235``).

    Returns one row per purge trigger: (query_id, purge_batch_id,
    purge_hi_job) where purge_hi_job is the max job id of the triggering
    batch -- everything at or below it is evicted.
    """

    def machine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("batch_id")
        last = -1
        rows = []
        for b, nir in zip(pdf["batch_id"], pdf["num_input_rows"]):
            if nir != 0 and b - last >= retention:
                rows.append((b,))
                last = b
        qid = pdf["query_id"].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {"query_id": [qid] * len(rows), "purge_batch_id": [r[0] for r in rows]}
        )

    src = progress.select("query_id", "batch_id", "num_input_rows")
    purges = src.groupBy("query_id").applyInPandas(
        machine, "query_id string, purge_batch_id bigint"
    )
    hi = jobs.groupBy("query_id", "batch_id").agg(F.max("job_id").alias("purge_hi_job"))
    return purges.join(
        hi.withColumnRenamed("batch_id", "purge_batch_id"),
        ["query_id", "purge_batch_id"],
    ).select("query_id", "purge_batch_id", "purge_hi_job")
