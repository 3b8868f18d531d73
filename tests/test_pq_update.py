"""Incremental PQ codebook refit (the kmeans_update recipe per subspace):
``pq_update`` folds a flagged new batch into the codebooks via additive
per-codeword subvector-mass shards -- exact weighted mean, bit-identity
for untouched codewords, shard-merge invariance, and a reconstruction
guarantee on a drifted batch (updated codebooks quantize it strictly
better than stale ones, within a margin of a full refit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaminglens_spark.functions.pq import (
    merge_pq_shards,
    pq_cell_stats,
    pq_error_stats,
    pq_fit,
    pq_update,
    pq_vector_shard,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_update_is_exact_weighted_mean(spark):
    # m=2 subspaces of dim 2; sub 0 has codewords (1,0) and (0,1); two new
    # 4-dim vectors whose sub-0 slice (0.5, 0.5) encodes to codeword 0
    # (tie on L2 -> lower cell).  n_base=4: expect (4*(1,0)+2*(0.5,0.5))/6.
    cb = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]), (0, 1, [0.0, 1.0]),
            (1, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0]),
        ],
        "sub int, cell int, cv array<double>",
    )
    stats = spark.createDataFrame(
        [(0, 0, 4), (0, 1, 3), (1, 0, 4), (1, 1, 3)],
        "sub int, cell int, n_vecs long",
    )
    new_batch = _emb(
        spark,
        [(10, 0, [0.5, 0.5, 0.0, 1.0]), (11, 0, [0.5, 0.5, 0.0, 1.0])],
    )
    shard = pq_vector_shard(new_batch, cb, m=2, sub_dim=2)
    out = {
        (r["sub"], r["cell"]): r["cv"]
        for r in pq_update(cb, stats, shard).collect()
    }
    assert out[(0, 0)] == pytest.approx([5.0 / 6.0, 1.0 / 6.0], abs=1e-6)
    # sub 1: the new slices (0.0, 1.0) encode to codeword 1
    assert out[(1, 1)] == pytest.approx([0.0, 1.0], abs=1e-6)
    # untouched codewords: bit-identical
    assert out[(0, 1)] == [0.0, 1.0]
    assert out[(1, 0)] == [1.0, 0.0]


def test_shard_merge_invariance(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = pq_fit(emb.filter(F.col("vec_id") < 200))
    batch = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 320))
    one_shot = pq_vector_shard(batch, cb)
    merged = merge_pq_shards(
        pq_vector_shard(batch.filter(F.col("vec_id") % 2 == 0), cb).unionByName(
            pq_vector_shard(batch.filter(F.col("vec_id") % 2 == 1), cb)
        )
    )
    a = {(r["sub"], r["cell"]): (r["n_new"], r["svsum"]) for r in one_shot.collect()}
    b = {(r["sub"], r["cell"]): (r["n_new"], r["svsum"]) for r in merged.collect()}
    assert a == b


def test_no_new_mass_keeps_codebooks_bit_identical(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = pq_fit(emb.filter(F.col("vec_id") < 150))
    stats = pq_cell_stats(emb.filter(F.col("vec_id") < 150), cb)
    empty = emb.filter(F.col("vec_id") < 0)
    updated = pq_update(cb, stats, pq_vector_shard(empty, cb))
    a = {(r["sub"], r["cell"]): r["cv"] for r in cb.collect()}
    b = {(r["sub"], r["cell"]): r["cv"] for r in updated.collect()}
    assert a == b


def test_updated_codebooks_reconstruct_drifted_batch_better(spark):
    """OOD batch (negated + shifted vectors): after pq_increment would
    flag the drift, pq_update's codebooks must quantize the new batch
    strictly better than the stale ones, and within 2x of a full refit
    over corpus + batch -- without ever rescanning the corpus."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 300)
    n = 300
    drift = emb.filter(F.col("vec_id") < 150).select(
        (F.col("vec_id") + F.lit(n)).alias("vec_id"),
        "label",
        F.transform(
            "embedding", lambda x: (-x + F.lit(0.4)).cast("float")
        ).alias("embedding"),
    )
    cb = pq_fit(corpus).persist()
    cb.count()
    stats = pq_cell_stats(corpus, cb)
    updated = pq_update(cb, stats, pq_vector_shard(drift, cb)).persist()
    updated.count()
    refit = pq_fit(corpus.unionByName(drift)).persist()
    refit.count()

    def total_err(codebooks):
        rows = pq_error_stats(drift, codebooks).collect()
        return sum(r["mean_err"] * r["n_vecs"] for r in rows)

    stale, upd, full = total_err(cb), total_err(updated), total_err(refit)
    for df in (cb, updated, refit):
        df.unpersist()
    assert upd < stale, (upd, stale)
    assert upd <= 2.0 * full, (upd, full)


def test_micro_form_matches_double_form(spark):
    """pq_update micro=True is the integer serialization of the double
    update: within half a micro-unit everywhere, exact on untouched
    codewords."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    newb = emb.filter(F.col("vec_id") % 5 == 4)
    cb = pq_fit(corpus).persist()
    cb.count()
    stats = pq_cell_stats(corpus, cb)
    shard = pq_vector_shard(newb, cb)
    dbl = {(r["sub"], r["cell"]): r["cv"]
           for r in pq_update(cb, stats, shard).collect()}
    mic = {(r["sub"], r["cell"]): r["cv_micro"]
           for r in pq_update(cb, stats, shard, micro=True).collect()}
    cb.unpersist()
    assert dbl.keys() == mic.keys()
    for key in dbl:
        for d, m in zip(dbl[key], mic[key]):
            assert abs(d * 1_000_000 - m) <= 0.5 + 1e-6, (key, d, m)
