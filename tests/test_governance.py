"""Perplexity-band filter + corpus snapshot diff (r5 continued).
Cross-engine hash parity lives in test_oracle_queries.py (both on
LOCAL_ORACLE); these pin band semantics and diff classification."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.lm import ppl_band_filter
from streaminglens_spark.functions.snapshot import corpus_diff, corpus_diff_summary
from streaminglens_spark import registry
from tests.conftest import SF_DIR


def test_ppl_band_drops_both_tails(spark):
    """The dominant template (lowest surprisal: its bigrams ARE the
    corpus mode) falls below the band, unique-bigram noise docs fall
    above it, and the varied middle docs stay -- the CCNet
    keep-the-middle contract.  Low surprisal requires the doc's bigrams
    to be the corpus's most frequent, so the template must be the
    MAJORITY of the fixture."""
    template = "the cat sat on the mat again today and then the cat sat"
    rows = [(i, template) for i in range(60)]
    # middle docs: moderately repeating vocabulary, varied order
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "iota", "kappa", "sigma", "omega"]
    for i in range(60, 95):
        words = [vocab[(i * 3 + j * j) % len(vocab)] for j in range(12)]
        rows.append((i, " ".join(words)))
    for i in range(95, 100):  # noise: every bigram unique to its doc
        rows.append((i, " ".join(f"junk{i}x{j}" for j in range(10))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in ppl_band_filter(df).collect()}
    assert not any(out[i]["keep"] for i in range(60)), "templates kept"
    assert not any(out[i]["keep"] for i in range(95, 100)), "noise kept"
    middle_kept = sum(1 for i in range(60, 95) if out[i]["keep"])
    assert middle_kept >= 28, f"only {middle_kept}/35 middle docs kept"


def test_ppl_band_fixture_fraction(spark):
    """On the fixture corpus the 50-950 permille band keeps the bulk
    (HDR bucket granularity makes the edges coarse, not the middle)."""
    rows = registry.q_ppl_filter(spark, SF_DIR).collect()
    frac = sum(1 for r in rows if r["keep"]) / len(rows)
    assert 0.6 < frac < 0.97, frac


def test_corpus_diff_golden(spark):
    old = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "b"), (2, "x"), (3, "d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert out == {0: "removed", 1: "unchanged", 2: "changed", 3: "added"}
    summary = {
        r["status"]: r["n_docs"]
        for r in corpus_diff_summary(old, new).collect()
    }
    assert summary == {"removed": 1, "unchanged": 1, "changed": 1, "added": 1}


def test_corpus_diff_md5_sides(spark):
    old = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "b")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert rows[0]["new_md5"] is None and rows[0]["old_md5"] is not None
    assert rows[1]["old_md5"] is None and rows[1]["new_md5"] is not None


def test_corpus_diff_fixture_has_all_transitions(spark):
    out = registry.q_corpus_diff(spark, SF_DIR)
    statuses = {r["status"] for r in out.select("status").distinct().collect()}
    assert statuses == {"added", "removed", "changed", "unchanged"}
    # identity: every old doc appears exactly once as non-added
    n_old = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    n_non_added = out.filter(F.col("status") != "added").count()
    assert n_non_added == n_old


def test_source_overlap_golden(spark):
    """Two sources sharing one exact 3-gram, a third sharing nothing."""
    from streaminglens_spark.functions.snapshot import source_overlap_matrix

    rows = [
        (0, "alpha beta gamma delta", "s1"),
        (1, "x alpha beta gamma y", "s2"),
        (2, "p q r s t u", "s3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["src_a"], r["src_b"]): r for r in source_overlap_matrix(df).collect()}
    assert set(out) == {("s1", "s2")}
    r = out[("s1", "s2")]
    # s1 grams: {alpha beta gamma, beta gamma delta}; s2 grams:
    # {x alpha beta, alpha beta gamma, beta gamma y} -> one shared gram
    assert r["shared"] == 1
    assert r["grams_a"] == 2 and r["grams_b"] == 3
    assert r["jaccard_permille"] == 1000 // 4  # 1 / (2 + 3 - 1)


def test_source_overlap_symmetric_jaccard(spark):
    from streaminglens_spark.functions.snapshot import source_overlap_matrix

    rows = [
        (0, "a b c d e", "s1"),
        (1, "a b c d e", "s2"),  # identical text -> jaccard 1000
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = source_overlap_matrix(df).collect()[0]
    assert r["jaccard_permille"] == 1000
    assert r["shared"] == r["grams_a"] == r["grams_b"] == 3


def test_vocab_drift_identical_snapshots_zero(spark):
    from streaminglens_spark.functions.snapshot import vocab_drift

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b d")], "doc_id long, text string"
    )
    rows = vocab_drift(df, df).collect()
    assert rows and all(r["total_l1_permille"] == 0 for r in rows)
    assert all(r["drift_permille"] == 0 for r in rows)


def test_vocab_drift_known_shift(spark):
    """old = {a: 2, b: 2}; new = {a: 4}: |2/4-4/4| + |2/4-0| = 1.0 ->
    1000 permille; 'b' is the top mover (500 each, tie by token)."""
    from streaminglens_spark.functions.snapshot import vocab_drift

    old = spark.createDataFrame(
        [(0, "a b"), (1, "a b")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(0, "a a"), (1, "a a")], "doc_id long, text string"
    )
    rows = vocab_drift(old, new).collect()
    assert rows[0]["total_l1_permille"] == 1000
    by_tok = {r["token"]: r for r in rows}
    assert by_tok["a"]["drift_permille"] == 500
    assert by_tok["b"]["drift_permille"] == 500
    assert rows[0]["token"] == "a"  # tie broken by token asc
