"""Pins for the five r7 ADVICE findings (VERDICT round 7):

1. (medium) oracle/compare._kind canonicalizes struct/map spellings by
   PARSING both engines' syntax instead of skipping the typed check;
2. (low) plans/shape._has_shuffle_below walks the logical plan tree --
   node-name lookalikes in string literals no longer disable the
   parallelism fix, and Expand-shaped plans no longer slip past it;
3. (low) similarity.semantic_decontaminate validates the eval vec_id
   range at plan-build time (the int cast is non-ANSI and would wrap);
4. (low) bpe._word_table never caps below the session's shuffle width
   (pinned in tests/test_bpe_sampled.py);
5. (low) annmaint monitors take shard_path for exactly-once persistence
   + restore (pinned in tests/test_streaming_annmaint.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaminglens_spark.oracle.compare import _kind


def test_kind_canonicalizes_struct_spellings():
    spark_t = "struct<a:bigint,b:array<int>>"
    duck_t = "STRUCT(a BIGINT, b INTEGER[])"
    assert _kind(spark_t) is not None, "struct must not skip the typed check"
    assert _kind(spark_t) == _kind(duck_t)


def test_kind_catches_divergence_inside_struct():
    # the driver-hash sensitivity class the check exists for: same field
    # names, different integer widths -- must compare UNEQUAL, not skip
    assert _kind("struct<a:bigint>") != _kind("STRUCT(a INTEGER)")
    # HUGEINT inside a struct is the q_pack_sequences class
    assert _kind("struct<s:bigint>") != _kind("STRUCT(s HUGEINT)")


def test_kind_canonicalizes_map_and_nested():
    assert _kind("map<string,bigint>") == _kind("MAP(VARCHAR, BIGINT)")
    assert _kind("array<struct<x:double>>") == _kind("STRUCT(x DOUBLE)[]")
    # quoted DuckDB field names (reserved words like "left")
    assert _kind('STRUCT("left" VARCHAR)') == _kind("struct<left:string>")


def test_kind_still_degrades_unknown_types():
    assert _kind("interval day to second") is None


def test_shuffle_probe_ignores_literals_and_sees_expand(spark):
    from streaminglens_spark.plans.shape import _has_shuffle_below

    df = spark.range(10)
    # false-positive class: node names inside a string literal
    assert not _has_shuffle_below(
        df.withColumn("x", F.lit("Sort Join Window Aggregate "))
    )
    assert not _has_shuffle_below(
        df.filter(F.lit("a Sort b") != F.lit("x"))
    )
    # false-negative class: shuffle-inducing nodes the substring list
    # missed (cube analyzes to Aggregate+Expand; groupBy applyInPandas
    # plans FlatMapGroupsInPandas)
    assert _has_shuffle_below(df.cube("id").count())
    assert _has_shuffle_below(df.repartition(4))
    assert _has_shuffle_below(df.distinct())


def test_semantic_decontaminate_rejects_wide_eval_ids(spark):
    from streaminglens_spark.functions.similarity import semantic_decontaminate

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    ev_bad = spark.createDataFrame(
        [(2**31, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="int32"):
        semantic_decontaminate(emb, ev_bad)
    # in-range ids still work
    ev_ok = spark.createDataFrame(
        [(5, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = semantic_decontaminate(emb, ev_ok).collect()
    assert out[0]["nearest_eval_id"] == 5
