"""r10 flagship composition (q_ingest_e2e): cleanup -> domain cap ->
quality budgets -> packing -> manifest as ONE plan.  The value hash vs
the composed DuckDB oracle runs in the standard two-SF sweep
(test_oracle_queries); this file pins the PLAN -- the composition seam
must stay bounded (the persisted-spine pattern) -- and the cross-stage
accounting invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.plans.audit import exchange_count

from .conftest import SF_DIR


def test_ingest_e2e_plan_is_bounded(spark):
    """Un-persisted, every multi-consumption seam replicated the whole
    six-stage cleanup subtree (measured 279 exchanges); with the slim
    spine persists the composed plan stays at the v2 pipeline's own
    budget plus a handful of id-keyed joins."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry.q_ingest_e2e(spark, SF_DIR)
        n = exchange_count(df)
        assert n <= 25, n
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_ingest_e2e_manifest_accounts_for_admitted_tokens(spark):
    """Cross-stage invariant: the manifest's filled tokens sum to exactly
    the admitted docs' cleaned-token total (packing neither drops nor
    double-counts), and no sequence overfills seq_len."""
    from streaminglens_spark.functions.corpus import corpus_pipeline_v2, ingest_e2e
    from streaminglens_spark.functions.text import (
        PACK_SEQ_LEN,
        boilerplate_corpus,
        dirty_corpus,
        pii_corpus,
    )

    raw = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 1000)
    )
    injected = boilerplate_corpus(dirty_corpus(pii_corpus(raw)))
    budgets = dict(registry.TOKEN_BUDGETS)
    manifest = ingest_e2e(
        injected, raw.select("doc_id", "source"), budgets,
        n_per_domain=registry.E2E_DOMAIN_CAP,
    )
    rows = manifest.collect()
    assert rows, "flagship produced an empty manifest"
    assert all(r["filled"] <= PACK_SEQ_LEN for r in rows)
    filled_total = sum(r["filled"] for r in rows)

    # recompute the admitted token total independently (the stages the
    # engine path composes, re-run stepwise)
    from streaminglens_spark.functions.sampling import quality_budget_sample
    from streaminglens_spark.functions.urls import (
        canonicalize_urls,
        domain_cap,
        url_corpus,
    )

    v2 = corpus_pipeline_v2(injected)
    survivors = v2.filter(F.col("final_keep")).select(
        "doc_id", "score_milli",
        (F.col("n_tokens") - F.col("n_removed")).cast("long").alias(
            "clean_tokens"),
    )
    canon = canonicalize_urls(url_corpus(survivors)).select("doc_id", "domain")
    capped = domain_cap(
        survivors.join(canon, "doc_id"), registry.E2E_DOMAIN_CAP
    ).join(raw.select("doc_id", "source"), "doc_id")
    admitted = quality_budget_sample(
        capped, "source", "doc_id", budgets, tokens_col="clean_tokens"
    ).filter(F.col("clean_tokens") > 0)
    want = admitted.agg(F.sum("clean_tokens")).collect()[0][0]
    assert filled_total == want
