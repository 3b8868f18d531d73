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

Preconditions:

- the order key must be unique (ties would make the rank, and therefore
  the ids, nondeterministic); ``doc_id`` is.
- BALANCE (not correctness) under the default ``strategy="range"``
  assumes roughly uniform key density: shards are equal-width VALUE
  ranges, so a clustered key (e.g. a timestamp corpus with a hot day)
  lands most rows in few shards and the per-shard sort degrades toward
  the global sort this function exists to avoid.  Ids stay correct
  either way (pinned by the skew test in ``tests/test_advice_r5.py``).
  For clustered keys use ``strategy="sampled"`` (r5): shard boundaries
  come from quantiles of a deterministic hash-sample of the keys -- the
  RangePartitioner idea expressed declaratively (Spark's own
  ``RangePartitioner`` samples and collects boundaries on the driver;
  here the boundaries stay in the plan as a broadcast
  ``n_shards - 1``-element array and the per-row shard is a monotone
  count of boundaries below the key, so ANY boundary set yields correct
  ids and the sample only buys balance).  The sample is keyed by the
  affine hash of the key (engine-independent, no RNG), its quantiles
  come from one ``ntile`` window over the SAMPLE only (bounded:
  ``~sample_frac * n`` rows sort on one task -- size the fraction so
  that fits, e.g. 1e-5 at 10^10 rows), and an empty sample degrades to
  one shard -- still correct, just unbalanced.  Balance is pinned by
  ``tests/test_ids_sampled.py`` on a 90%-hot-range clustered key.

Overflow safety (r4 advice): the shard expression runs in decimal(38,0) --
``(k - lo) * n_shards`` exceeds int64 once the key span passes ~2^58
(snowflake/hash-style ids), where int64 arithmetic would wrap to negative
shards and silently DROP rows at the offsets join.  The result is also
clamped to ``[0, n_shards-1]``: decimal division rounds at scale-6, so
``k = hi`` on a huge span could otherwise round up to shard == n_shards.
With the clamp every row matches an offsets row by construction -- no
silent loss path remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ID_N_SHARDS = 32
ID_SAMPLE_FRAC = 0.05  # local-test default; at 10^10 rows use ~1e-5


def _sampled_boundaries(
    df: DataFrame, order_col: str, n_shards: int, sample_frac: float
) -> F.Column:
    """1-row DataFrame holding the sorted ``<= n_shards - 1`` boundary
    keys: quantile maxima of a deterministic affine-hash sample.  Hash
    arithmetic runs in decimal(38,0) so snowflake-scale keys cannot
    overflow (the r4-advice lesson applied to the sample predicate)."""
    from .sketch import HASH_A, HASH_B, HASH_P

    dec = "decimal(38,0)"
    h = (
        F.lit(HASH_A).cast(dec) * F.col(order_col).cast(dec) + F.lit(HASH_B)
    ) % F.lit(HASH_P)
    sample = df.select(order_col).filter(h < F.lit(int(sample_frac * HASH_P)))
    # ntile over the SAMPLE only: a bounded single-partition sort by
    # construction (sample_frac chooses the bound), not a corpus sort
    tiles = sample.select(
        F.col(order_col),
        F.ntile(n_shards).over(Window.orderBy(order_col)).alias("_t"),
    )
    return (
        tiles.filter(F.col("_t") < n_shards)
        .groupBy("_t")
        .agg(F.max(order_col).alias("_mx"))
        .agg(F.array_sort(F.collect_list("_mx")).alias("_bnds"))
    )


def assign_row_ids(
    df: DataFrame,
    order_col: str = "doc_id",
    n_shards: int = ID_N_SHARDS,
    strategy: str = "range",
    sample_frac: float = ID_SAMPLE_FRAC,
) -> DataFrame:
    """Dense deterministic 0..n-1 ids in ``order_col`` order, no global
    sort.  Returns the input columns' key plus ``row_id``.

    ``strategy="range"`` (default): equal-width value-range shards --
    zero extra passes, right for dense keys.  ``strategy="sampled"``:
    shard boundaries from a hash-sample's quantiles -- one cheap extra
    scan, right for clustered/sparse keys.  The ids are IDENTICAL under
    either strategy (sharding is monotone in the key either way, and the
    final id is shard_offset + local_rank); only the balance differs."""
    if strategy not in ("range", "sampled"):
        raise ValueError(f"strategy must be 'range' or 'sampled', got {strategy!r}")
    # NULL-key guard (lazy, per-row -- the minhash DUP_SHIFT pattern):
    # min/max ignore NULLs and window ordering sorts them first, so a NULL
    # key would silently receive an arbitrary-looking rank instead of
    # failing; the contract (unique, hence non-null, key) is enforced at
    # the first action with a loud error
    guarded = F.when(F.col(order_col).isNotNull(), F.col(order_col)).otherwise(
        F.raise_error(
            F.lit(
                f"assign_row_ids: NULL {order_col} -- the order key must be "
                "unique and non-null for ids to be deterministic"
            )
        )
    )
    df = df.select(guarded.alias(order_col))
    if strategy == "range":
        bounds = df.agg(
            F.min(order_col).alias("_lo"), F.max(order_col).alias("_hi")
        )
        dec = "decimal(38,0)"
        k = F.col(order_col).cast(dec)
        lo = F.col("_lo").cast(dec)
        span = F.col("_hi").cast(dec) - lo + 1
        raw_shard = F.floor(((k - lo) * n_shards) / span)
        sharded = df.select(order_col).crossJoin(F.broadcast(bounds)).select(
            order_col,
            F.least(F.lit(n_shards - 1), F.greatest(F.lit(0), raw_shard))
            .cast("int")
            .alias("_shard"),
        )
    else:
        bnds = _sampled_boundaries(df, order_col, n_shards, sample_frac)
        # shard = #(boundaries strictly below the key): monotone in the
        # key for ANY boundary array (correctness never depends on the
        # sample), bounded by n_shards - 1, O(n_shards) JVM comparisons
        # per row against the broadcast literal array
        sharded = df.select(order_col).crossJoin(F.broadcast(bnds)).select(
            order_col,
            F.size(
                F.filter(F.col("_bnds"), lambda b: b < F.col(order_col))
            ).alias("_shard"),
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
