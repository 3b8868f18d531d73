"""Incremental embedding-index maintenance (r5 verdict ask #5).

`q_ann_increment` itself is oracle-hash-checked by test_oracle_queries;
these tests pin the semantic contracts: sketch-only state sizes, the
drift trigger firing on a genuinely shifted batch, and assignment
consistency with the batch index path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.similarity import (
    ann_assign,
    ann_increment,
    ann_index_stats,
    ivf_centroids,
)
from tests.conftest import SF_DIR_001


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")


def test_baseline_is_o_k_rows(spark):
    """The persisted state is O(cells), never O(corpus)."""
    emb = _emb(spark)
    cents = ivf_centroids(emb)
    stats = ann_index_stats(emb, cents).collect()
    n_cells = cents.count()
    assert len(stats) == n_cells
    assert sum(r.n_vecs for r in stats) == emb.count()


def test_no_drift_on_same_distribution_split(spark):
    """An interleaved split of the SAME corpus must not look like drift.
    The margin is widened to 0.15 here because the fixture's per-cell
    new-batch counts are ~10, so split noise alone reaches ~0.09 at
    sf0.01; at production per-cell counts the default 0.05 margin is the
    right sensitivity (noise shrinks as 1/sqrt(n))."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    new = emb.filter(F.col("vec_id") % 5 == 4)
    cents = ivf_centroids(corpus)
    out = ann_increment(
        new, cents, ann_index_stats(corpus, cents), drift_margin=0.15
    ).collect()
    assert out, "expected one row per cell"
    flagged = [r.cell for r in out if r.drift_flagged]
    assert flagged == [], f"same-distribution split flagged drift: {flagged}"


def test_score_drift_trigger(spark):
    """Score drift, isolated from the fixture's weak cluster geometry:
    two orthogonal one-hot centroids with a healthy 0.9 baseline, then a
    new batch orthogonal to BOTH (cosine 0 to every cell).  Every cell
    receiving new vectors must be drift_flagged."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0], 1.0), (1, [0.0, 1.0, 0.0, 0.0], 1.0)],
        "cell int, cv array<double>, cnrm double",
    )
    # unequal baseline shares (10% / 90%): cell 0 receiving 100% of the
    # new mass is a 10x share jump, comfortably over the 3x growth ratio
    baseline = spark.createDataFrame(
        [(0, 2, 0.9), (1, 18, 0.9)],
        "cell int, n_vecs long, mean_score double",
    )
    new = spark.createDataFrame(
        [(100, [0.0, 0.0, 1.0, 0.0]), (101, [0.0, 0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = ann_increment(new, cents, baseline).collect()
    hit = [r for r in out if r.n_new > 0]
    assert hit
    assert all(r.drift_flagged for r in hit), out
    # ties break to the lower cell: the orthogonal batch piles into cell 0,
    # so the mass-imbalance trigger fires there too
    by_cell = {r.cell: r for r in out}
    assert by_cell[0].n_new == 2 and by_cell[0].growth_flagged
    assert by_cell[1].n_new == 0 and not by_cell[1].growth_flagged
    assert by_cell[1].new_mean is None and not by_cell[1].drift_flagged


def test_growth_trigger_fires_on_concentrated_batch(spark):
    """Out-of-distribution data under argmax assignment concentrates into
    few cells even when best-of-k scores stay unremarkable: a
    constant-vector batch lands in ONE cell, whose share of new mass
    (100% vs ~10% baseline) must trip growth_flagged."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    const = emb.filter(F.col("vec_id") % 5 == 4).withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(1.0 AS FLOAT))")
    )
    cents = ivf_centroids(corpus)
    out = ann_increment(const, cents, ann_index_stats(corpus, cents)).collect()
    landed = [r for r in out if r.n_new > 0]
    assert len(landed) == 1, "constant batch must land in exactly one cell"
    assert landed[0].growth_flagged, landed
    others = [r for r in out if r.n_new == 0]
    assert not any(r.growth_flagged for r in others)


def test_increment_assignment_matches_full_index(spark):
    """Sketch-only increment must give each new vector the same cell a
    full index rebuild (same centroids) would -- incremental maintenance
    cannot silently re-cluster."""
    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    new = emb.filter(F.col("vec_id") % 5 == 4)
    cents = ivf_centroids(corpus)
    inc = {r.vec_id: r.cell for r in ann_assign(new, cents).collect()}
    full = {
        r.vec_id: r.cell
        for r in ann_assign(emb, cents).collect()
        if r.vec_id % 5 == 4
    }
    assert inc == full


# ---------------------------------------------------- PQ increment

def test_pq_increment_drift_fires_on_scaled_batch(spark):
    """Quantization error is ABSOLUTE (squared L2 residual): a 10x-scaled
    batch encoded against corpus-fit codebooks must blow past the 1.5x
    error ratio in every subspace, while a same-distribution split stays
    unflagged at a widened ratio."""
    from streaminglens_spark.functions.pq import (
        pq_error_stats,
        pq_fit,
        pq_increment,
    )

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    cb = pq_fit(corpus).persist()
    cb.count()
    baseline = pq_error_stats(corpus, cb)
    try:
        same = emb.filter(F.col("vec_id") % 5 == 4)
        out_same = pq_increment(same, cb, baseline, err_ratio=3.0).collect()
        assert out_same and not any(r.drift_flagged for r in out_same), out_same

        scaled = same.withColumn(
            "embedding", F.expr("transform(embedding, x -> x * CAST(10.0 AS FLOAT))")
        )
        out_scaled = pq_increment(scaled, cb, baseline).collect()
        hit = [r for r in out_scaled if r.n_new > 0]
        assert hit and all(r.drift_flagged for r in hit), out_scaled
    finally:
        cb.unpersist()


def test_pq_encode_with_error_matches_plain_encode(spark):
    """The error-carrying encode must emit the identical codes as
    pq_encode -- the increment path cannot drift from the index format."""
    from streaminglens_spark.functions.pq import (
        pq_encode,
        pq_encode_with_error,
        pq_fit,
    )

    emb = _emb(spark).filter(F.col("vec_id") < 100)
    cb = pq_fit(emb).persist()
    cb.count()
    try:
        plain = {(r.vec_id, r.sub): r.code for r in pq_encode(emb, cb).collect()}
        withe = {
            (r.vec_id, r.sub): (r.code, r.err)
            for r in pq_encode_with_error(emb, cb).collect()
        }
        assert plain == {k: v[0] for k, v in withe.items()}
        assert all(v[1] >= 0.0 for v in withe.values())
    finally:
        cb.unpersist()


# ------------------------------------------- additive baseline shards

def test_ann_stats_shards_merge_exactly(spark):
    """Per-batch additive shards folded with merge_ann_stats must be
    BIT-identical to the one-shot baseline over the union -- incremental
    ingest cannot drift the refit decision."""
    from streaminglens_spark.functions.similarity import (
        ann_stats_shard,
        merge_ann_stats,
    )

    emb = _emb(spark)
    cents = ivf_centroids(emb).persist()
    cents.count()
    try:
        shards = [
            ann_stats_shard(emb.filter(F.col("vec_id") % 3 == i), cents)
            for i in range(3)
        ]
        allsh = shards[0].unionByName(shards[1]).unionByName(shards[2])
        merged = {
            (r.cell, r.n_vecs, r.mean_score)
            for r in merge_ann_stats(allsh).collect()
        }
        oneshot = {
            (r.cell, r.n_vecs, r.mean_score)
            for r in ann_index_stats(emb, cents).collect()
        }
        assert merged == oneshot
    finally:
        cents.unpersist()


def test_ann_increment_accepts_merged_baseline(spark):
    """The sharded baseline drops into ann_increment unchanged: same
    schema, same verdicts as the one-shot baseline."""
    from streaminglens_spark.functions.similarity import (
        ann_stats_shard,
        merge_ann_stats,
    )

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") % 5 != 4)
    new = emb.filter(F.col("vec_id") % 5 == 4)
    cents = ivf_centroids(corpus).persist()
    cents.count()
    try:
        sharded = merge_ann_stats(
            ann_stats_shard(corpus.filter(F.col("vec_id") % 2 == 0), cents)
            .unionByName(
                ann_stats_shard(corpus.filter(F.col("vec_id") % 2 == 1), cents)
            )
        )
        a = {tuple(r) for r in ann_increment(new, cents, sharded).collect()}
        b = {
            tuple(r)
            for r in ann_increment(
                new, cents, ann_index_stats(corpus, cents)
            ).collect()
        }
        assert a == b
    finally:
        cents.unpersist()
