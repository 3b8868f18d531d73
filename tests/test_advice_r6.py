"""Round-7 advice regression tests (ADVICE.md r6):

1. ``track`` is idempotent -- an already-persisted DataFrame is neither
   re-persisted nor double-registered, and ``ivf_topk`` skips its eager
   ``count()`` when the caller owns the centroid materialization (the
   q_shared_fit fit-once path).
2. The argmax fold validates the centroid ``cell`` dtype ONCE at
   plan-build time: a non-integral cell column raises TypeError instead
   of silently NULLing every assignment (the old inner ``cast('int')``
   produced an empty result for string-labelled centroids).
3. ``ann_increment`` joins baseline and new-batch stats FULL OUTER: new
   mass landing in a cell that held zero corpus vectors surfaces with
   n_corpus = 0 and growth_flagged TRUE instead of being dropped.
4. ``oracle.compare`` degrades columns with unmapped type spellings
   (struct/map/engine-specific) to a values-only check with a warning
   instead of failing on the spelling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaminglens_spark import cache
from streaminglens_spark.functions.similarity import (
    ann_assign_fold,
    ann_increment,
    ann_stats_shard,
    ivf_topk,
    merge_ann_stats,
)
from streaminglens_spark.oracle.compare import _kind, compare

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ track idempotence

def test_track_skips_already_persisted(spark):
    df = spark.range(10)
    df.persist()
    try:
        df.count()
        before = len(cache._PERSISTED)
        out = cache.track(df)
        assert out is df
        assert len(cache._PERSISTED) == before, "caller-persisted df re-registered"
    finally:
        df.unpersist()


def test_ivf_topk_caller_owned_centroids_not_double_tracked(spark):
    from streaminglens_spark.functions.similarity import ivf_centroids

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = ivf_centroids(emb).persist()
    try:
        cents.count()
        before = len(cache._PERSISTED)
        out = ivf_topk(emb, centroids=cents)
        assert len(cache._PERSISTED) == before, "caller-owned centroids re-tracked"
        assert out.count() > 0
    finally:
        cents.unpersist()


# ------------------------------------------------- cell dtype validation

def test_fold_rejects_string_cells(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(10)
    dim = len(emb.select("embedding").first()[0])
    cents = spark.createDataFrame(
        [("a", [0.1] * dim, 1.0), ("b", [0.2] * dim, 1.0)],
        "cell string, cv array<double>, cnrm double",
    )
    with pytest.raises(TypeError, match="integral"):
        ann_assign_fold(emb, cents)
    with pytest.raises(TypeError, match="integral"):
        ivf_topk(emb, centroids=cents)


def test_fold_accepts_bigint_cells(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    from streaminglens_spark.functions.similarity import ivf_centroids

    cents = ivf_centroids(emb).withColumn("cell", F.col("cell").cast("bigint"))
    out = ann_assign_fold(emb, cents)
    assert out.filter(F.col("cell").isNull()).count() == 0
    assert out.count() == 50


# ------------------------------------------------- ann_increment full outer

def _mk_emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")


def test_ann_increment_surfaces_empty_cell_mass(spark):
    # two centroids; the corpus only ever lands in cell 0, the new batch
    # only in cell 1 (a cell with zero corpus vectors) -- the old left
    # join dropped that row entirely.
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0], 1.0), (1, [0.0, 1.0], 1.0)],
        "cell int, cv array<double>, cnrm double",
    )
    corpus = _mk_emb(spark, [(i, 0, [1.0, 0.01 * i]) for i in range(5)])
    new_batch = _mk_emb(spark, [(100 + i, 1, [0.01 * i, 1.0]) for i in range(4)])

    from streaminglens_spark.functions.similarity import ann_index_stats

    out = ann_increment(new_batch, cents, ann_index_stats(corpus, cents))
    rows = {r["cell"]: r for r in out.collect()}
    assert set(rows) == {0, 1}, "cell 1 (empty baseline) must appear"
    r1 = rows[1]
    assert r1["n_corpus"] == 0
    assert r1["n_new"] == 4
    assert r1["base_mean"] is None
    assert r1["growth_flagged"] is True, "mass into an empty cell is growth"
    assert r1["drift_flagged"] is False
    r0 = rows[0]
    assert r0["n_corpus"] == 5 and r0["n_new"] == 0


def test_ann_increment_full_outer_matches_merged_shards(spark):
    # the additive-shard route must agree with the one-shot baseline on
    # the full-outer semantics too
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0], 1.0), (1, [0.0, 1.0], 1.0)],
        "cell int, cv array<double>, cnrm double",
    )
    corpus = _mk_emb(spark, [(i, 0, [1.0, 0.02 * i]) for i in range(6)])
    new_batch = _mk_emb(spark, [(50, 1, [0.0, 1.0]), (51, 1, [0.1, 1.0])])
    merged = merge_ann_stats(ann_stats_shard(corpus, cents))
    out = {r["cell"]: r for r in ann_increment(new_batch, cents, merged).collect()}
    assert out[1]["n_corpus"] == 0 and out[1]["n_new"] == 2
    assert out[1]["growth_flagged"] is True


# --------------------------------------------------- compare type degrade

def test_kind_unmapped_returns_none():
    # r8 (r7 ADVICE upgrade): struct/map spellings now PARSE to canonical
    # kinds instead of degrading -- equal logical types compare equal
    # across engines (the full matrix lives in tests/test_advice_r7.py)
    assert _kind("struct<a:bigint>") == _kind("STRUCT(a BIGINT)") is not None
    assert _kind("map<string,bigint>") == _kind("MAP(VARCHAR, BIGINT)")
    assert _kind("array<struct<a:bigint>>") == _kind("STRUCT(a BIGINT)[]")
    # genuinely unknown types still degrade
    assert _kind("interval") is None
    # mapped kinds unchanged
    assert _kind("BIGINT") == "int64"
    assert _kind("array<bigint>") == "list<int64>"


def test_compare_degrades_unmapped_types_to_values_only(spark, duck):
    # identical values AND (r8) identical canonical struct kinds: the
    # typed check now covers the struct column instead of warning it away
    sdf = spark.createDataFrame([(1,)], "a long").select(
        "a", F.struct(F.lit(2).cast("long").alias("x")).alias("s")
    )
    res = compare(sdf, duck, "SELECT 1::BIGINT AS a, {'x': 2::BIGINT} AS s")
    assert res["ok"], res
    assert "s" not in res.get("type_unchecked", {}), (
        "struct spellings now canonicalize; the typed check must cover s"
    )
    # a genuine TYPE divergence inside the struct fails the typed check
    res_t = compare(sdf, duck, "SELECT 1::BIGINT AS a, {'x': 3::INTEGER} AS s")
    assert not res_t["ok"] and "s" in res_t.get("type_diff", {}), res_t
    # a genuine value mismatch inside the struct still fails
    res2 = compare(sdf, duck, "SELECT 1::BIGINT AS a, {'x': 3::BIGINT} AS s")
    assert not res2["ok"]
