"""SemDeDup semantic dedup: planted-twin recall (the actual dedup use
case), brute-force subset/threshold contracts, the documented hard-case
recall floor, and composition with cluster formation.  Cross-engine
parity runs in ``test_oracle_queries`` (`q_semantic_dedup`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.similarity import (
    _as_double,
    _dot,
    _norm,
    semantic_dedup_pairs,
)
from tests.conftest import SF_DIR

TWIN_SHIFT = 10_000


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _twin_corpus(spark, n_twins=50):
    """Corpus + exact copies of the first n_twins vectors under shifted
    ids: every copy is a TRUE semantic duplicate (cosine exactly 1)."""
    base = _emb(spark)
    twins = base.filter(F.col("vec_id") < n_twins).select(
        (F.col("vec_id") + TWIN_SHIFT).alias("vec_id"), "embedding", "label"
    )
    return base.unionByName(twins), n_twins


def test_planted_twins_all_found(spark):
    corpus, n = _twin_corpus(spark)
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in semantic_dedup_pairs(corpus, threshold=0.9).collect()
    }
    for i in range(n):
        assert (i, i + TWIN_SHIFT) in got, i
        assert got[(i, i + TWIN_SHIFT)] == 1.0


def test_planted_twins_survive_skew_subblocking(spark):
    """Identical vectors share every LSH bucket, so the oversized-cell
    sub-block guard cannot separate a twin from its original."""
    corpus, n = _twin_corpus(spark)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in semantic_dedup_pairs(corpus, threshold=0.9, max_block=20).collect()
    }
    for i in range(n):
        assert (i, i + TWIN_SHIFT) in got, i


def _brute_pairs(spark, threshold):
    e = _emb(spark).select(
        "vec_id", _as_double("embedding").alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    rows = (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "c",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("c") >= threshold)
        .select("vec_a", "vec_b")
        .collect()
    )
    return {(r["vec_a"], r["vec_b"]) for r in rows}


def test_subset_of_brute_force_and_hard_case_floor(spark):
    """Every emitted pair is a true >= threshold pair (blocking can only
    MISS, never invent), and the hard-case recall (near-orthogonal
    scatter, no semantic twins) stays above the documented floor."""
    truth = _brute_pairs(spark, 0.3)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in semantic_dedup_pairs(_emb(spark), threshold=0.3).collect()
    }
    assert got <= truth
    recall = len(got & truth) / len(truth)
    assert recall >= 0.25, recall  # measured 0.33; docstring's honest number


def test_composes_with_cluster_formation(spark):
    """pairs -> dedup_clusters: every planted twin forms a 2-cluster
    whose canonical keeper is the original id."""
    from streaminglens_spark.functions.dedup import dedup_clusters

    corpus, n = _twin_corpus(spark, n_twins=20)
    pairs = semantic_dedup_pairs(corpus, threshold=0.9).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    clusters = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(pairs).collect()
    }
    for i in range(n):
        assert clusters[i] == (i, 2)
        assert clusters[i + TWIN_SHIFT] == (i, 2)
