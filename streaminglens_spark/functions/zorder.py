"""Z-order (Morton-curve) data layout (round-5 continued extension): the
multi-dimensional clustering trick behind Delta/Iceberg ``OPTIMIZE
ZORDER BY`` -- interleave the bits of two sort dimensions so that rows
close in EITHER dimension land close in the one-dimensional sort order,
giving every output shard a tight bounding box in BOTH dimensions.

Why a 100 TB pipeline wants it: parquet/ORC readers skip files by
min/max column statistics.  A corpus sorted by one key has perfect
pruning on that key and none on any other; Z-ordering by (key_a, key_b)
makes per-file ranges tight on BOTH, so selective range predicates on
either column skip most files.  The curve is a pure bit-permutation --
no sampling, no RNG -- so the layout is deterministic and engine-exact.

Implementation: the 32-bit Morton value is an UNROLLED sum of 32
literal-shift terms (`((x >> i) & 1) << 2i | ((y >> i) & 1) << (2i+1)`
for i in 0..15) -- plain integer arithmetic with literal shift counts,
expressible identically in Spark and the DuckDB oracle, no higher-order
function, no variable shifts.  ``zorder_stats`` then buckets the curve
into equal Z-ranges (the file-boundary proxy) and reports each shard's
row count and per-dimension bounding box; the locality test pins that
the average per-shard box is a small fraction of the global range in
BOTH dimensions (a single-column sort fails that for the other column).

Scale shape: the z-value is map-only; the per-shard stats are one
partial-aggregated groupBy on a 4-bit key.  A production writer would
``repartitionByRange(zval)`` and write -- the stats table here IS the
min/max skipping index that write would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension bits; z-value < 2^32
N_SHARDS = 16


def zvalue(x: F.Column, y: F.Column) -> F.Column:
    """32-bit Morton interleave of the low 16 bits of two non-negative
    integral columns (x takes even bit positions, y odd)."""
    x = x.cast("long")
    y = y.cast("long")
    total = F.lit(0).cast("long")
    for i in range(Z_BITS):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        total = total + xb * F.lit(1 << (2 * i)) + yb * F.lit(1 << (2 * i + 1))
    return total


def zvalue_sql(x: str, y: str) -> str:
    """The identical interleave as a DuckDB SQL expression."""
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


BUCKET_BITS = 8  # rank buckets per dimension; z-value < 2^16


def _rank_buckets(df: DataFrame, col: str, bits: int) -> DataFrame:
    """(value, bucket) for every distinct value of ``col``: bucket =
    ``(rank - 1) * 2^bits div n_distinct`` -- the equi-depth mapping that
    spreads ANY value distribution across the full bucket range (Delta's
    OPTIMIZE ZORDER does the same with range-partition ids; a raw-value
    interleave wastes its bits on whichever dimension has the narrower
    range -- measured: user_id < 150 left the x boxes uncompressed).

    The window sorts the DISTINCT-VALUE table only: bounded by dimension
    cardinality, not corpus size.  For a high-cardinality continuous
    dimension, pre-bucket it (e.g. timestamps to minutes) so this table
    stays small enough to broadcast -- the caller's knob, same contract
    as ids.py's sampled boundaries."""
    from pyspark.sql import Window

    vals = df.select(col).distinct()
    w = Window.orderBy(F.col(col))
    wn = Window.partitionBy()
    bucket = F.expr(
        f"(_rnk * {1 << bits}) div _n"
    )
    return (
        vals.select(
            col,
            (F.row_number().over(w) - 1).cast("long").alias("_rnk"),
            F.count(F.lit(1)).over(wn).cast("long").alias("_n"),
        )
        .select(col, bucket.cast("long").alias(f"_b_{col}"))
    )


def zorder_stats(
    df: DataFrame, x: str, y: str, n_shards: int = N_SHARDS
) -> DataFrame:
    """Equal-Z-range shard statistics over RANK-BUCKETED dimensions:
    (shard, n_rows, min/max of both original dimensions) -- the min/max
    skipping index a Z-ordered write produces.  Each dimension is first
    mapped to its equi-depth rank bucket (0..2^8-1) via a broadcast
    distinct-value table, then the buckets are Morton-interleaved and cut
    into ``n_shards`` equal Z-ranges.  Bucketing never affects
    correctness of the stats, only how tight the boxes get."""
    bx = _rank_buckets(df, x, BUCKET_BITS)
    by = _rank_buckets(df, y, BUCKET_BITS)
    width = (1 << (2 * BUCKET_BITS)) // n_shards
    z = zvalue(F.col(f"_b_{x}"), F.col(f"_b_{y}"))
    return (
        df.join(F.broadcast(bx), x)
        .join(F.broadcast(by), y)
        .withColumn("_z", z)
        .groupBy(F.expr(f"_z div {width}").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(x).cast("long").alias("min_x"),
            F.max(x).cast("long").alias("max_x"),
            F.min(y).cast("long").alias("min_y"),
            F.max(y).cast("long").alias("max_y"),
        )
    )
