"""Incremental centroid refit (r6 verdict ask #3): ``kmeans_update`` folds
a new batch into fitted centroids via the additive vector-mass shards --
mini-batch k-means over O(k x dim) rows, corpus never rescanned.

Evidence pinned here:
- exactness on a hand-computable case (weighted mean, integer arithmetic);
- bit-identity for cells receiving no new mass;
- shard-merge invariance (split batch == one-shot batch);
- recall on a drifted corpus within a pinned margin of a FULL refit
  (the expensive alternative the update replaces).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaminglens_spark.functions.similarity import (
    ann_index_stats,
    ann_topk,
    ann_vector_shard,
    cosine_topk,
    kmeans_fit,
    kmeans_update,
    merge_vector_shards,
    recall_at_k,
)

SF_DIR = "/root/testdata/sf0.001"


def _cents(spark, rows):
    df = spark.createDataFrame(rows, "cell int, cv array<double>")
    return df.withColumn(
        "cnrm",
        F.sqrt(
            F.aggregate(
                F.transform("cv", lambda x: x * x), F.lit(0.0), lambda a, v: a + v
            )
        ),
    )


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_update_is_exact_weighted_mean(spark):
    # cell 0 centroid (1, 0) fitted over 4 corpus vectors; new batch: two
    # vectors (0.5, 0.5) land in cell 0 (cosine vs (1,0) beats (0,1)? both
    # 0.707 -- ties to the LOWER cell, so cell 0).  Expected update:
    # (4*(1,0) + (0.5,0.5)+(0.5,0.5)) / 6 = (5/6, 1/6).
    cents = _cents(spark, [(0, [1.0, 0.0]), (1, [0.0, 1.0])])
    corpus = _mkcorpus(spark)
    baseline = spark.createDataFrame(
        [(0, 4, 1.0), (1, 3, 1.0)], "cell int, n_vecs long, mean_score double"
    )
    new_batch = _emb(spark, [(10, 0, [0.5, 0.5]), (11, 0, [0.5, 0.5])])
    shard = ann_vector_shard(new_batch, cents)
    out = {r["cell"]: r for r in kmeans_update(cents, baseline, shard).collect()}
    assert out[0]["cv"] == pytest.approx([5.0 / 6.0, 1.0 / 6.0], abs=1e-6)
    # cell 1 untouched: bit-identical, not approximately equal
    assert out[1]["cv"] == [0.0, 1.0]


def _mkcorpus(spark):
    return _emb(spark, [(i, 0, [1.0, 0.0]) for i in range(4)])


def test_no_new_mass_keeps_centroids_bit_identical(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(emb, k=4, iters=2)
    baseline = ann_index_stats(emb, cents)
    empty = emb.filter(F.col("vec_id") < 0)  # no rows
    shard = ann_vector_shard(empty, cents)
    updated = kmeans_update(cents, baseline, shard)
    a = {r["cell"]: r["cv"] for r in cents.collect()}
    b = {r["cell"]: r["cv"] for r in updated.collect()}
    assert a == b  # exact, no float round-trip


def test_shard_merge_invariance(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = kmeans_fit(emb, k=4, iters=2)
    batch = emb.filter(F.col("vec_id") % 3 == 0)
    one_shot = ann_vector_shard(batch, cents)
    merged = merge_vector_shards(
        ann_vector_shard(batch.filter(F.col("vec_id") % 2 == 0), cents).unionByName(
            ann_vector_shard(batch.filter(F.col("vec_id") % 2 == 1), cents)
        )
    )
    a = {r["cell"]: (r["n_new"], r["vsum"]) for r in one_shot.collect()}
    b = {r["cell"]: (r["n_new"], r["vsum"]) for r in merged.collect()}
    assert a == b  # BIGINT sums: bit-equal, any split


def test_recall_within_margin_of_full_refit_on_drifted_corpus(spark):
    """Corpus fitted once; a drifted new batch (deterministic transform of
    the fixture vectors) arrives.  The incremental update's ANN recall on
    the combined corpus must be within 0.15 of a FULL kmeans refit over
    the union -- at a tiny fraction of the cost (O(k x dim) update vs a
    full-corpus Lloyd rescan)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    # drifted batch: flip sign of the first 16 dims and shift -- a cluster
    # structure the original fit never saw; ids offset past the corpus
    drift = emb.select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        "label",
        F.transform(
            "embedding",
            lambda x, i: F.when(i < 16, -x + F.lit(0.3)).otherwise(x).cast("float"),
        ).alias("embedding"),
    )
    union = emb.unionByName(drift)

    fitted = kmeans_fit(emb, k=8, iters=5).persist()
    fitted.count()
    baseline = ann_index_stats(emb, fitted)
    shard = ann_vector_shard(drift, fitted)
    updated = kmeans_update(fitted, baseline, shard).persist()
    updated.count()
    refit = kmeans_fit(union, k=8, iters=5).persist()
    refit.count()

    exact = cosine_topk(union, n_queries=5, k=10)
    r_updated = recall_at_k(ann_topk(union, centroids=updated), exact)
    r_refit = recall_at_k(ann_topk(union, centroids=refit), exact)
    for df in (fitted, updated, refit):
        df.unpersist()
    assert r_updated >= r_refit - 0.15, (r_updated, r_refit)
    assert r_updated >= 0.5, r_updated


def test_micro_form_matches_double_form(spark):
    """micro=True is the integer serialization of the double update:
    every micro value is within half a unit of cv * 1e6, and untouched
    cells are exactly round(cv * 1e6)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    newb = emb.filter(F.col("vec_id") % 5 == 4)
    from streaminglens_spark.functions.similarity import ann_index_stats

    cents = kmeans_fit(corpus, k=4, iters=2).persist()
    cents.count()
    baseline = ann_index_stats(corpus, cents)
    shard = ann_vector_shard(newb, cents)
    dbl = {r["cell"]: r["cv"] for r in
           kmeans_update(cents, baseline, shard).collect()}
    mic = {r["cell"]: r["cv_micro"] for r in
           kmeans_update(cents, baseline, shard, micro=True).collect()}
    cents.unpersist()
    assert dbl.keys() == mic.keys()
    for cell in dbl:
        for d, m in zip(dbl[cell], mic[cell]):
            assert abs(d * 1_000_000 - m) <= 0.5 + 1e-6, (cell, d, m)
