"""Per-cluster embedding outliers (r12): value parity vs the DuckDB
oracle runs in the two-SF sweep; this file pins the two-level window's
kept-set equivalence to the naive per-cell window, the boundary
property (every flagged cosine <= every unflagged cosine in its cell),
centroid reuse, and the all-JVM broadcast plan."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.functions.similarity import (
    _fold_assign,
    _as_double,
    _norm,
    embed_outliers,
    kmeans_fit,
)
from streaminglens_spark.plans.audit import python_udf_count, uses_broadcast_join

from .conftest import SF_DIR


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_two_level_matches_single_window(spark):
    """The skew-safe (cell, bucket) pre-rank must be kept-set identical
    to the naive single per-cell window -- each bucket's bottom-n is a
    superset contribution of the cell's bottom-n."""
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iters=5)
    got = sorted(map(tuple, embed_outliers(emb, centroids=cents).collect()))
    base = _fold_assign(
        emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
            "nrm", _norm(F.col("v"))
        ),
        cents,
    )
    w = Window.partitionBy("cell").orderBy(F.col("cscore").asc(), "vec_id")
    naive = sorted(
        map(
            tuple,
            base.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select(
                F.col("cell").cast("int"),
                "vec_id",
                F.round("cscore", 6).alias("cosine"),
                F.col("rank").cast("long"),
            )
            .collect(),
        )
    )
    assert got == naive


def test_flagged_are_the_farthest(spark):
    """Boundary property per cell: the worst flagged cosine is no
    better than the best unflagged cosine."""
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iters=5)
    flagged = embed_outliers(emb, centroids=cents)
    assign = _fold_assign(
        emb.select("vec_id", _as_double("embedding").alias("v")).withColumn(
            "nrm", _norm(F.col("v"))
        ),
        cents,
    ).select("cell", "vec_id", F.round("cscore", 6).alias("cosine"))
    rest = assign.join(
        flagged.select("cell", "vec_id"), ["cell", "vec_id"], "left_anti"
    )
    hi = {r["cell"]: r["m"] for r in
          flagged.groupBy("cell").agg(F.max("cosine").alias("m")).collect()}
    lo = {r["cell"]: r["m"] for r in
          rest.groupBy("cell").agg(F.min("cosine").alias("m")).collect()}
    assert hi, "no cells flagged"
    for cell, worst_flagged in hi.items():
        if cell in lo:
            assert worst_flagged <= lo[cell], (cell, worst_flagged, lo[cell])


def test_plan_is_jvm_broadcast(spark):
    df = registry.q_embed_outliers(spark, SF_DIR)
    assert python_udf_count(df) == 0
    assert uses_broadcast_join(df)
