"""Sampled-boundary row-id sharding (r5): the RangePartitioner-shaped
upgrade for clustered/sparse keys.  Correctness never depends on the
sample (ids must equal the exact global row_number under EVERY strategy);
balance is what the sample buys, and the clustered-key case pins it."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from streaminglens_spark.functions.ids import assign_row_ids


def _ids_ok(df, out, order_col):
    want = {
        k: i
        for i, k in enumerate(
            sorted(r[0] for r in df.select(order_col).collect())
        )
    }
    got = {r[order_col]: r["row_id"] for r in out.collect()}
    assert got == want


def _clustered(spark, n=4000):
    """90% of keys in a hot range [0, 400), 10% spread to 10^9 -- the
    hot-day timestamp shape that breaks equal-width ranges."""
    hot = np.arange(0, int(n * 0.9))
    cold = (np.arange(int(n * 0.1), dtype=np.int64) * 2_777_777) + 10_000_000
    keys = np.concatenate([hot, cold])
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": keys.astype(np.int64)})
    )


def test_sampled_ids_match_exact_rank(spark):
    df = _clustered(spark)
    out = assign_row_ids(df, strategy="sampled")
    _ids_ok(df, out, "doc_id")


def test_sampled_and_range_identical(spark):
    df = _clustered(spark)
    a = {r["doc_id"]: r["row_id"] for r in assign_row_ids(df).collect()}
    b = {
        r["doc_id"]: r["row_id"]
        for r in assign_row_ids(df, strategy="sampled").collect()
    }
    assert a == b


def test_sampled_balances_clustered_key(spark):
    """On the 90%-hot-range key, equal-width ranges put ~90% of rows in
    one shard; sampled boundaries must cap the largest shard near the
    ideal n/n_shards."""
    from streaminglens_spark.functions.ids import _sampled_boundaries

    df = _clustered(spark)
    n = df.count()
    n_shards = 32
    bnds = _sampled_boundaries(df, "doc_id", n_shards, 0.05).collect()[0]["_bnds"]
    assert 1 <= len(bnds) <= n_shards - 1
    shard = df.select(
        F.size(
            F.filter(
                F.array(*[F.lit(int(b)) for b in bnds]),
                lambda b: b < F.col("doc_id"),
            )
        ).alias("s")
    )
    counts = [r["c"] for r in shard.groupBy("s").agg(F.count("*").alias("c")).collect()]
    ideal = n / n_shards
    assert max(counts) <= 4 * ideal, (max(counts), ideal)
    # the equal-width strategy for contrast: its shard 0 spans the whole
    # hot range plus more, swallowing >= 90% of the rows in one shard
    lo, hi = 0, 10_000_000 + (int(n * 0.1) - 1) * 2_777_777
    width = (hi - lo + 1) // n_shards
    eq_counts = (
        df.groupBy((F.col("doc_id") / width).cast("int").alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    assert max(r["c"] for r in eq_counts) >= 0.9 * n


def test_sampled_huge_span_keys(spark):
    """Snowflake-scale keys: the sample-predicate hash runs in decimal,
    so spans past 2^58 cannot overflow; ids still exact."""
    keys = [0, 1, 2, (1 << 62) + 7, (1 << 62) + 9, (1 << 61), 5, 99]
    df = spark.createDataFrame([(int(k),) for k in keys], "doc_id long")
    out = assign_row_ids(df, strategy="sampled", n_shards=4)
    _ids_ok(df, out, "doc_id")


def test_sampled_empty_sample_degrades_correctly(spark):
    """A fraction small enough to sample nothing: one shard, still exact."""
    df = spark.createDataFrame([(int(k),) for k in range(50)], "doc_id long")
    out = assign_row_ids(df, strategy="sampled", sample_frac=1e-9)
    _ids_ok(df, out, "doc_id")


def test_bad_strategy_raises(spark):
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="strategy"):
        assign_row_ids(df, strategy="quantile")
