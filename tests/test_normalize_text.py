"""Whitespace/control normalization pass (r5): idempotence, clean-text
identity, per-artifact removal goldens, and the zero-shuffle/no-Python
plan contract.  Cross-engine byte parity versus the identical DuckDB
regexp chain is covered by ``test_oracle_queries`` (`q_normalize_text`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.text import dirty_corpus, normalize_text
from tests.conftest import SF_DIR


def _norm_rows(spark, df):
    return {
        r["doc_id"]: (r["raw_len"], r["clean_len"], r["clean_md5"])
        for r in normalize_text(df).collect()
    }


def test_idempotent(spark):
    """normalize(normalize(x)) == normalize(x): safe to re-run over
    partially-cleaned shards.  Round-trip through the actual cleaned
    STRING (not just the digest) by recomputing the chain on a corpus
    whose text is already clean."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dirty = dirty_corpus(docs)
    # materialize cleaned text by rebuilding the same chain normalize_text
    # hashes, then feed it back through as a corpus
    s = F.col("text")
    s = F.regexp_replace(s, r"\r\n?", "\n")
    s = F.regexp_replace(s, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    s = F.regexp_replace(s, r"\t", " ")
    s = F.regexp_replace(s, r" +\n", "\n")
    s = F.regexp_replace(s, r"\n +", "\n")
    s = F.regexp_replace(s, r"  +", " ")
    s = F.regexp_replace(s, r"\n{3,}", "\n\n")
    s = F.regexp_replace(s, r"^[ \n]+|[ \n]+$", "")
    cleaned = dirty.select("doc_id", s.alias("text"))
    once = _norm_rows(spark, dirty)
    twice = _norm_rows(spark, cleaned)
    for doc_id, (_, clen, cmd5) in once.items():
        r2 = twice[doc_id]
        assert r2[0] == clen and r2[1] == clen and r2[2] == cmd5, doc_id


def test_clean_text_is_fixed_point(spark):
    """The fixture corpus is already normalized: the pass must be the
    identity on it (raw_len == clean_len, md5 == md5(text))."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    out = normalize_text(docs)
    bad = out.filter(F.col("raw_len") != F.col("clean_len")).count()
    assert bad == 0
    joined = out.join(
        docs.select("doc_id", F.md5(F.col("text").cast("binary")).alias("want")),
        "doc_id",
    )
    assert joined.filter(F.col("clean_md5") != F.col("want")).count() == 0


def test_artifact_goldens(spark):
    cases = [
        # (dirty, clean)
        ("a\r\nb\rc", "a\nb\nc"),
        ("a\x07b\x1fc\x7fd", "abcd"),
        ("a\tb", "a b"),
        ("a   \n   b", "a\nb"),
        ("a    b", "a b"),
        ("a\n\n\n\n\nb", "a\n\nb"),
        ("   a b  ", "a b"),
        ("\n\n  x  \n\n", "x"),
        ("", ""),
        ("already clean\n\ntwo paras", "already clean\n\ntwo paras"),
    ]
    df = spark.createDataFrame(
        [(i, d) for i, (d, _) in enumerate(cases)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["clean_len"], r["clean_md5"]) for r in
           normalize_text(df).collect()}
    want = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(cases)], "doc_id long, text string"
    ).select(
        "doc_id",
        F.length("text").alias("clean_len"),
        F.md5(F.col("text").cast("binary")).alias("clean_md5"),
    ).collect()
    for r in want:
        assert got[r["doc_id"]] == (r["clean_len"], r["clean_md5"]), r["doc_id"]


def test_plan_map_only(spark):
    """Zero exchanges, no Python UDF: the pass must stay a map-only
    JVM-regexp scan (the repo's stay-JVM-side rule for hot-path text)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = normalize_text(dirty_corpus(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_incremental_boilerplate_index_matches_batch(spark):
    """The minhash_index pattern for the chrome pass: per-batch line
    indexes merged additively equal the whole-corpus counts, and
    stripping against the merged index is bit-identical to the one-shot
    strip_boilerplate_text."""
    from streaminglens_spark.functions.text import (
        boilerplate_corpus,
        boilerplate_index,
        merge_boilerplate_index,
        strip_boilerplate_text,
        strip_boilerplate_with_index,
    )

    docs = boilerplate_corpus(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    )
    n_total = docs.count()
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = merge_boilerplate_index(*[boilerplate_index(b) for b in batches])
    whole = {r["line"]: r["n_in"] for r in boilerplate_index(docs).collect()}
    got = {r["line"]: r["n_in"] for r in merged.collect()}
    assert got == whole
    a = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean"])
        for r in strip_boilerplate_with_index(docs, merged, n_total).collect()
    }
    b = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean"])
        for r in strip_boilerplate_text(docs).collect()
    }
    assert a == b


def test_gopher_rules_each_rule_fires_independently(spark):
    """r10 Gopher-rule bundle: one crafted doc violates exactly one rule
    each; verdicts are per-rule auditable and keep is their conjunction.
    All thresholds are integer cross-multiplications, so the verdicts
    are engine-exact by construction."""
    from streaminglens_spark.functions.text import gopher_rules

    good = "the quick brown fox jumps over the lazy dog today"
    docs = spark.createDataFrame(
        [
            (0, good),                                   # passes all
            (1, "too few"),                              # word count < 5
            (2, "a a a a a a a a a a"),                  # mean len < 3
            (3, "the 123 456 789 012 345 678 901 234"),  # <80% alphabetic
            (4, "zebra quagga okapi tapir dugong numbat wombat"),  # no stopwords
            (5, "the #tag #tag #tag ... of ..."),        # symbols > 10%
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[0]["keep"]
    assert not rows[1]["r_word_count"] and not rows[1]["keep"]
    assert not rows[2]["r_mean_len"] and not rows[2]["keep"]
    assert not rows[3]["r_alpha"] and not rows[3]["keep"]
    assert not rows[4]["r_stopwords"] and not rows[4]["keep"]
    assert not rows[5]["r_symbols"] and not rows[5]["keep"]
    # non-violated rules still pass on the violating docs (auditable)
    assert rows[1]["r_alpha"] and rows[2]["r_word_count"]


def test_gopher_rules_empty_and_empty_text(spark):
    from streaminglens_spark.functions.text import gopher_rules

    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    r = gopher_rules(docs).collect()[0]
    assert r["n_words"] == 0 and not r["keep"]
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert gopher_rules(empty).count() == 0
