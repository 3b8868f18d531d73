"""Winnowing minimizer fingerprints (r5 continued): the MOSS guarantee
(shared runs of w + k - 1 tokens share a minimizer), edge documents, the
pair-generation join, and the map-only plan shape.  Cross-engine hash
parity lives in test_oracle_queries.py (q_winnow on LOCAL_ORACLE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.winnow import (
    WINNOW_K,
    WINNOW_W,
    _minimizer_sets,
    winnow_fingerprints,
    winnow_pairs,
)
from streaminglens_spark.plans.audit import formatted_plan, python_udf_count
from streaminglens_spark import registry
from tests.conftest import SF_DIR


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_shares_a_minimizer(spark):
    """Two docs sharing a (w + k - 1)-token run must share >= 1 minimizer
    -- the winnowing guarantee -- even when everything around the run
    differs."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = W + K - 1 tokens
    rows = [
        (0, f"one two three {shared} four five six"),
        (1, f"red green blue {shared} cyan magenta yellow"),
    ]
    sets = {r["doc_id"]: set(r["mins"]) for r in _minimizer_sets(_df(spark, rows)).collect()}
    assert sets[0] & sets[1], "winnowing guarantee violated"


def test_disjoint_vocab_no_overlap(spark):
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "k l m n o p q r s t"),
    ]
    sets = {r["doc_id"]: set(r["mins"]) for r in _minimizer_sets(_df(spark, rows)).collect()}
    assert not (sets[0] & sets[1])


def test_edge_docs(spark):
    rows = [
        (0, ""),               # 1 empty token -> no grams
        (1, "one two"),        # < k tokens -> no grams
        (2, "one two three"),  # exactly one gram -> 1 minimizer
        (3, "a b c d e"),      # 3 grams < w -> whole-doc window, 1 min
    ]
    out = {r["doc_id"]: r for r in winnow_fingerprints(_df(spark, rows)).collect()}
    assert out[0]["n_grams"] == 0 and out[0]["fp_md5"] is None
    assert out[1]["n_grams"] == 0 and out[1]["n_minimizers"] == 0
    assert out[2]["n_grams"] == 1 and out[2]["n_minimizers"] == 1
    assert out[3]["n_grams"] == 3 and out[3]["n_minimizers"] == 1


def test_sketch_is_smaller_than_gram_set(spark):
    """Density: the minimizer set compresses the gram set (expected
    ~2/(w+1) of distinct grams on random-ish text)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    agg = (
        _minimizer_sets(docs)
        .agg(F.sum("n_grams").alias("g"), F.sum(F.size("mins")).alias("m"))
        .first()
    )
    assert 0 < agg["m"] < agg["g"]


def test_pairs_finds_planted_passage(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"one two three {shared} four five six"),
        (1, f"red green blue {shared} cyan magenta yellow"),
        (2, "totally different words everywhere here now okay fine"),
    ]
    pairs = winnow_pairs(_df(spark, rows), min_shared=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 1)}
    assert pairs[0]["n_shared"] >= 1


def test_fingerprint_plan_map_only(spark):
    """Fingerprint extraction must be a map-only projection: no KEYED
    shuffle, no Python.  The r7 scan-parallelism guard may add one
    round-robin exchange on the single-split fixture scan (a no-op on
    any real multi-split scan) -- that is parallelism, not data movement
    by key, so the pin allows it and forbids hash/single-partition
    exchanges."""
    df = registry.q_winnow(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan[:800]
    assert "Exchange SinglePartition" not in plan, plan[:800]
    assert python_udf_count(df) == 0


def test_guarantee_threshold_constant():
    assert WINNOW_W + WINNOW_K - 1 == 6


def test_long_doc_stays_linear(spark):
    """Regression pin for the let-binding in _minimizer_sets: without it,
    projection collapsing re-evaluates the gram array per window and one
    20k-token doc takes ~74 s (O(n^2)); with it, ~4 s.  The generous
    bound only trips on the quadratic regression."""
    import time

    words = " ".join(f"w{i % 97}" for i in range(20000))
    df = _df(spark, [(0, words)])
    t0 = time.time()
    row = winnow_fingerprints(df).collect()[0]
    assert row["n_grams"] == 19998 and row["n_minimizers"] > 0
    assert time.time() - t0 < 30, "quadratic re-evaluation regression"
