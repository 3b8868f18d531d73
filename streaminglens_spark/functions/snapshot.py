"""Corpus snapshot diff (round-5 continued extension): dataset
governance for a training corpus -- between two snapshots (yesterday's
parquet and today's), which documents were added, removed, changed, or
untouched?  Every serious data pipeline audits exactly this before a
training run: an unexpected mass-change is a bug upstream (a scraper
regression, an overwritten partition) that silently poisons a run.

Spark shape: both sides reduce to (doc_id, md5) projections at scan time
(columns pruned to id + text), then ONE full-outer hash join on doc_id
-- the only shuffle; the status classification is a null/equality case
over the joined row.  At 100 TB both sides hash-partition by doc_id; if
snapshots are written bucketed by doc_id the join is co-located and
shuffle-free.  The summary is a partial-aggregated groupBy over four
status values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fp(df: DataFrame, col: str) -> DataFrame:
    return df.select("doc_id", F.md5(F.col("text").cast("binary")).alias(col))


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Row-level diff: (doc_id, status, old_md5, new_md5) with status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    o = _fp(old, "old_md5")
    n = _fp(new, "new_md5")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", status.alias("status"), "old_md5", "new_md5"
    )


def corpus_diff_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """(status, n_docs) -- the four-row audit table a pipeline gates on
    (e.g. alert when changed + removed exceeds a tolerance)."""
    return corpus_diff(old, new).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
