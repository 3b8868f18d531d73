"""r12 sampled quantizer fit: the measured fix for the sf10 probe's
first linear wall (the full-corpus k-means fit, ~linear in vectors --
PERF.md).  Value parity vs the DuckDB oracle runs in the standard
two-SF sweep (test_oracle_queries); this file pins the contracts that
make sampling SAFE: fraction=1.0 is bit-identical to the unsampled
fit, full-probe search with sampled centroids is still EXACT, the
recall floor at the fixture's extreme sample ratio, laziness, and the
all-JVM plan."""

from __future__ import annotations

from streaminglens_spark import registry
from streaminglens_spark.functions.similarity import (
    ann_topk,
    cosine_topk,
    ivf_topk,
    kmeans_fit,
    recall_at_k,
)
from streaminglens_spark.plans.audit import python_udf_count
from streaminglens_spark.sources.loaders import load_table

from .conftest import SF_DIR


def _emb(spark, sf_dir=SF_DIR):
    return load_table(spark, sf_dir, "embeddings")


def test_fraction_one_is_bit_identical_to_unsampled(spark):
    """The hash filter at threshold P keeps the whole space, so
    sample_fraction=1.0 must reproduce the unsampled fit exactly --
    sampling is a strict generalization, not a parallel code path."""
    emb = _emb(spark)
    full = sorted(map(tuple, kmeans_fit(emb, k=8, iters=5).collect()))
    one = sorted(
        map(tuple, kmeans_fit(emb, k=8, iters=5, sample_fraction=1.0).collect())
    )
    assert full == one


def test_full_probe_with_sampled_centroids_is_exact(spark):
    """Centroid quality affects only WHERE vectors land; probing every
    cell searches every vector, so full-probe IVF over a sampled fit
    must equal the exact brute-force top-k -- the invariant that makes
    the sampled fit safe to deploy (recall is tunable back via nprobe,
    never silently lost)."""
    emb = _emb(spark)
    cents = kmeans_fit(emb, k=8, iters=5, sample_fraction=0.25)
    n_cells = cents.count()
    approx = ivf_topk(emb, k=5, nprobe=n_cells, centroids=cents)
    exact = cosine_topk(emb, n_queries=5, k=5)
    a = sorted(map(tuple, approx.select("query_vec_id", "neighbor_id").collect()))
    e = sorted(map(tuple, exact.select("query_vec_id", "neighbor_id").collect()))
    assert a == e


def test_sampled_fit_recall_floor(spark):
    """Recall@10 of the q_sampled_fit tail vs the exact top-k.  The
    fixture's 0.25 sample is only ~125 vectors for 8 cells -- an
    extreme ratio a real deployment never sees (measured 0.66 sf0.001
    / 0.76 sf0.01 vs 0.92/0.94 for the full fit); the floor pins the
    tradeoff stays bounded, the full-probe test pins it recoverable."""
    emb = _emb(spark)
    exact = cosine_topk(emb, n_queries=5, k=10)
    approx = registry.q_sampled_fit(spark, SF_DIR)
    assert recall_at_k(approx, exact) >= 0.6


def test_sampled_fit_stays_jvm_and_lazy(spark):
    """Same contract as q_shared_fit: zero Python eval nodes, and
    building the DataFrame runs no more jobs than the bare table load
    (the fit must not execute before the driver's timer starts)."""
    sc = spark.sparkContext
    sc.setJobGroup("sampled-fit-load", "load-jobs baseline")
    try:
        _emb(spark)
        n_load = len(sc.statusTracker().getJobIdsForGroup("sampled-fit-load"))
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    sc.setJobGroup("sampled-fit-laziness", "laziness probe")
    try:
        df = registry.q_sampled_fit(spark, SF_DIR)
        n_build = len(
            sc.statusTracker().getJobIdsForGroup("sampled-fit-laziness")
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert n_build <= n_load, (
        f"building q_sampled_fit ran {n_build} jobs vs {n_load} for the "
        "bare table load -- the sampled fit must stay lazy"
    )
    assert python_udf_count(df) == 0
    assert df.count() > 0


def test_sample_floor_guard_raises_on_undersized_fitset(spark):
    """r12 advice #2: a sample that yields fewer than k rows must fail
    LOUDLY at first action instead of silently initializing fewer
    centroids (or, when empty, returning an empty centroid table that
    makes downstream ann_topk quietly return nothing)."""
    import pytest
    from pyspark.sql.utils import PythonException

    emb = _emb(spark)
    # a 3-row corpus sampled at 1.0 still has < k=8 rows -> guard fires
    tiny = emb.limit(3)
    cents = kmeans_fit(tiny, k=8, iters=1, sample_fraction=1.0)
    with pytest.raises(Exception, match="fitset has only"):
        cents.collect()
    # build-time validation of the fraction itself
    with pytest.raises(ValueError, match="sample_fraction"):
        kmeans_fit(emb, k=8, iters=1, sample_fraction=0.0)
    with pytest.raises(ValueError, match="sample_fraction"):
        kmeans_fit(emb, k=8, iters=1, sample_fraction=1.5)
    # the unsampled path must carry NO guard join (laziness + plan pins
    # for q_shared_fit depend on the default plan staying unchanged)
    plan = kmeans_fit(emb, k=8, iters=1)._jdf.queryExecution().executedPlan().toString()
    assert "_fit_ok" not in plan
