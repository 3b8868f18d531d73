"""Contiguous global row-id assignment (round-4 extension).

Every training-data pipeline eventually needs stable, dense 0..n-1 row ids
(shard manifests, sample bookkeeping, join-back keys).  The naive Spark
spellings both fail at 100 TB: ``row_number() OVER (ORDER BY key)`` is a
single-partition global sort (one executor sees the whole corpus), and
``monotonically_increasing_id`` is neither dense nor order-stable.

The scale-correct shape is the classic two-pass zipWithIndex, expressed
declaratively so Catalyst runs it:

1. range-bucket the key into ``n_shards`` ordered shards (the min/max
   bounds come from one tiny aggregate, attached via a broadcast
   cross-join -- fully lazy, no driver action);
2. rank locally inside each shard (the ONLY real shuffle, and each
   partition sorts only its own shard);
3. count rows per shard (map-side partial agg), prefix-sum the counts
   (``n_shards`` rows -- a single-partition window over a TINY table is
   fine), broadcast the offsets back;
4. ``row_id = shard_offset + local_rank - 1``.

Because shards are ordered ranges of the key, shard-offset + local-rank
reproduces the global ``row_number() OVER (ORDER BY key)`` exactly --
which is the DuckDB oracle.

Precondition: the order key must be unique (ties would make the rank, and
therefore the ids, nondeterministic); ``doc_id`` is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ID_N_SHARDS = 32


def assign_row_ids(
    df: DataFrame, order_col: str = "doc_id", n_shards: int = ID_N_SHARDS
) -> DataFrame:
    """Dense deterministic 0..n-1 ids in ``order_col`` order, no global
    sort.  Returns the input columns' key plus ``row_id``."""
    bounds = df.agg(
        F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
    )
    k = F.col(order_col)
    span = F.col("_hi") - F.col("_lo") + 1
    sharded = df.select(order_col).crossJoin(F.broadcast(bounds)).select(
        order_col,
        F.floor(((k - F.col("_lo")) * n_shards) / span).cast("int").alias("_shard"),
    )
    local = sharded.withColumn(
        "_rank",
        F.row_number().over(Window.partitionBy("_shard").orderBy(order_col)),
    )
    counts = sharded.groupBy("_shard").agg(F.count(F.lit(1)).alias("_cnt"))
    offsets = counts.select(
        "_shard",
        (
            F.sum("_cnt").over(
                Window.orderBy("_shard").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_cnt")
        ).alias("_offset"),
    )
    return local.join(F.broadcast(offsets), "_shard").select(
        order_col,
        (F.col("_offset") + F.col("_rank") - 1).cast("long").alias("row_id"),
    )
