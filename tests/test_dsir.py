"""DSIR importance resampling (r12): value parity vs the DuckDB oracle
runs in the standard two-SF sweep (test_oracle_queries); this file pins
the discriminative sanity (target-slice docs outscore the pool), the
deterministic top-k contract, and the plan shape (all-JVM, broadcast
weight row, TakeOrdered selection -- no global sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.functions.dsir import DSIR_KEEP_N, dsir_scores, dsir_select
from streaminglens_spark.plans.audit import (
    formatted_plan,
    python_udf_count,
    uses_broadcast_join,
)

from .conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_target_slice_outscores_pool(spark):
    """The importance score must discriminate: the mean score of the
    target-language docs (whose features DEFINE p_target) has to beat
    the mean score of everything else -- if it doesn't, the log-ratio
    is wired backwards."""
    docs = _docs(spark)
    scored = dsir_scores(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").alias("is_en")),
        "doc_id",
    )
    rows = {
        r["is_en"]: r["m"]
        for r in scored.groupBy("is_en")
        .agg(F.avg("score_micro").alias("m"))
        .collect()
    }
    assert rows[True] > rows[False], (
        f"target-slice mean {rows[True]} must exceed pool mean {rows[False]}"
    )


def test_select_is_topk_of_scores(spark):
    """dsir_select == the KEEP_N highest (score DESC, doc_id) rows of
    dsir_scores -- the deterministic top-k variant, bit-for-bit."""
    docs = _docs(spark)
    sel = sorted(
        map(tuple, dsir_select(docs).collect()),
        key=lambda t: t[0],
    )
    allrows = sorted(
        map(tuple, dsir_scores(docs).collect()),
        key=lambda t: (-t[2], t[0]),
    )[:DSIR_KEEP_N]
    assert sel == sorted(allrows, key=lambda t: t[0])
    assert len(sel) == DSIR_KEEP_N


def test_empty_text_scores_zero(spark):
    """A featureless doc's importance weight is an empty product = 1,
    so its log-score must be exactly 0 (and it must survive scoring,
    not vanish on a join)."""
    docs = spark.createDataFrame(
        [(1, "", "de"), (2, "alpha beta", "en"), (3, "alpha beta", "fr")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in dsir_scores(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_feats"] == 1  # split('') yields one empty token
    assert rows[2]["score_micro"] == rows[3]["score_micro"]  # same text


def test_plan_is_jvm_broadcast_takeordered(spark):
    """Scoring stays JVM-side with the weight row broadcast, and the
    selection plans as TakeOrderedAndProject -- per-partition heads,
    never a global Sort + Exchange over the corpus."""
    df = registry.q_dsir_select(spark, SF_DIR)
    assert python_udf_count(df) == 0
    assert uses_broadcast_join(df)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]
