"""Table profiling (round-5 extension): per-column data-quality stats --
the "look before you train" pass every ingest runs (null rates surface
broken joins, distinct counts surface key/categorical confusion, min/max
surface sentinel values and unit mistakes).

Spark shape: ONE ``stack`` unpivot to (col_name, val-as-string) rows --
a map-only generator, no Python -- then one groupBy(col_name) carrying
count / null-count / distinct / min / max.  One shuffle for the whole
profile no matter how many columns; at 100 TB this is exactly one scan
of the table (column pruning still applies: only profiled columns are
read).

Values are profiled through their STRING casts: this makes the operator
type-generic and engine-exact (Spark and DuckDB both print doubles via
shortest-round-trip), at the documented cost that min/max are
lexicographic on the cast -- the right contract for a profiler (it
answers "what does this column look like", not "what is the numeric
max"; numeric aggregates belong to typed queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_val, max_val) for each
    profiled column; distinct/min/max ignore NULLs (the SQL convention
    both engines share)."""
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {pairs})").alias("col_name", "val")
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).cast("long").alias("n_nulls"),
        F.countDistinct("val").cast("long").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


def key_skew_stats(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Join-key skew diagnosis (round-5 continued extension): the
    measurement that decides between a plain shuffle join, AQE's skew
    split, and the ``salted_join`` rewrite -- "how hot is the hottest
    key?" answered BEFORE the 100 TB shuffle is launched, from one cheap
    aggregation over the key column.

    Returns the top-``k`` keys by frequency: (rank, key_value, cnt,
    permille) where permille = ``cnt * 1000 div total`` (exact integer;
    a key at >= ~50 permille of a trillion-row table cannot fit one
    partition and needs salting).  Spark shape: one groupBy(key).count
    with map-side combine, distributed TakeOrdered for the top-k (never
    a global sort -- the ranking window runs over the k survivors only,
    the ``vocab_topk`` idiom), total via a broadcast 1-row aggregate."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("long").alias("_total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key_value").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key_value").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "rank",
            "key_value",
            "cnt",
            F.expr("cnt * 1000 div _total").cast("long").alias("permille"),
        )
    )
