"""Per-source quality governance rollup (r12): value parity vs the
oracle (which composes the three audited per-doc oracle SQLs by joins
-- a different algorithm) runs in the two-SF sweep; this file pins the
single-scan expressions against the per-doc OPERATORS bit-for-bit, the
column arithmetic, and the one-exchange plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.functions.text import (
    c4_corpus,
    c4_keep_expr,
    c4_rules,
    c4_text_expr,
    gopher_keep_expr,
    gopher_rules,
    quality_classifier,
    source_quality_report,
)
from streaminglens_spark.plans.audit import exchange_count, python_udf_count

from .conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_keep_exprs_match_operators(spark):
    """The factored keep expressions must equal the audited per-doc
    operators' keep columns on every fixture doc -- the contract that
    lets the report run single-scan without forking rule logic."""
    docs = _docs(spark)
    expr_side = docs.select(
        "doc_id",
        gopher_keep_expr(F.col("text")).alias("g"),
        c4_keep_expr(c4_text_expr(F.col("doc_id"), F.col("text"))).alias("c"),
    )
    g_op = {r["doc_id"]: r["keep"] for r in gopher_rules(docs).collect()}
    c_op = {r["doc_id"]: r["keep"] for r in c4_rules(c4_corpus(docs)).collect()}
    for r in expr_side.collect():
        assert r["g"] == g_op[r["doc_id"]]
        assert r["c"] == c_op[r["doc_id"]]


def test_report_counts_match_joined_operators(spark):
    """The rollup's counts must equal counting the per-doc operators'
    verdicts grouped by source -- same numbers, different plan.  The
    injected form is opt-in via c4_text (r12 advice #1); this pin uses
    it because the per-doc C4 operator truth runs on c4_corpus."""
    docs = _docs(spark)
    got = {
        r["source"]: r.asDict()
        for r in source_quality_report(docs, c4_text=c4_text_expr).collect()
    }
    g = gopher_rules(docs).select("doc_id", F.col("keep").alias("g"))
    c = c4_rules(c4_corpus(docs)).select("doc_id", F.col("keep").alias("c"))
    q = quality_classifier(docs).select("doc_id", F.col("keep").alias("q"))
    truth = {
        r["source"]: r.asDict()
        for r in docs.select("doc_id", "source")
        .join(g, "doc_id").join(c, "doc_id").join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("g").cast("int")).cast("long").alias("gopher_keep"),
            F.sum(F.col("c").cast("int")).cast("long").alias("c4_keep"),
            F.sum(F.col("q").cast("int")).cast("long").alias("clf_keep"),
            F.sum((F.col("g") & F.col("c") & F.col("q")).cast("int"))
            .cast("long").alias("all_keep"),
        )
        .collect()
    }
    assert got == truth
    total = sum(v["n_docs"] for v in got.values())
    assert total == docs.count()
    for v in got.values():
        assert v["all_keep"] <= min(v["gopher_keep"], v["c4_keep"], v["clf_keep"])


def test_report_default_scores_raw_corpus(spark):
    """r12 advice #1: the exported operator's DEFAULT c4_keep must score
    the caller's raw text (what a real governance run ships), not the
    fixture's synthetic boilerplate injection -- the injected form is
    opt-in via c4_text."""
    docs = _docs(spark)
    got = {
        r["source"]: r.asDict() for r in source_quality_report(docs).collect()
    }
    c = c4_rules(docs).select("doc_id", F.col("keep").alias("c"))
    truth = {
        r["source"]: (r["c4_keep"], r["n_docs"])
        for r in docs.select("doc_id", "source")
        .join(c, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("c").cast("int")).cast("long").alias("c4_keep"),
        )
        .collect()
    }
    assert set(got) == set(truth)
    for s, v in got.items():
        assert (v["c4_keep"], v["n_docs"]) == truth[s]
    injected = {
        r["source"]: r["c4_keep"]
        for r in source_quality_report(docs, c4_text=c4_text_expr).collect()
    }
    # the fixture injection pollutes pages on purpose -- raw keep counts
    # must not be below the injected ones anywhere
    assert any(got[s]["c4_keep"] != injected[s] for s in got) or all(
        got[s]["c4_keep"] >= injected[s] for s in got
    )


def test_report_plan_is_single_scan(spark):
    """One corpus scan, zero Python; exchanges = the tiny groupBy plus
    at most the scan_parallel round-robin (present only when the
    fixture parquet is fewer splits than default parallelism)."""
    df = registry.q_source_quality_report(spark, SF_DIR)
    assert 1 <= exchange_count(df) <= 2
    assert python_udf_count(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("parquet") <= 1 or plan.count("Scan parquet") <= 1
