"""Round-4c text-pipeline extensions: within-doc repetition metrics, PII
redaction, corpus-frequency boilerplate removal.

Oracle hash-equality at sf0.001 runs in test_oracle_queries (LOCAL_ORACLE);
this file pins hand-computed goldens, edge cases, and plan shapes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from streaminglens_spark.functions.text import (
    boilerplate_corpus,
    pii_corpus,
    pii_redact,
    repetition_stats,
    strip_boilerplate,
)
from streaminglens_spark.plans.audit import exchange_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------- repetition

def test_repetition_golden(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(spark, [(1, "a a b"), (2, "x"), (3, "a b a b a")])
        ).collect()
    }
    # doc 1: n=3, distinct=2, top token 'a' x2; bigrams ['a a','a b'] max 1
    assert out[1]["n_tokens"] == 3
    assert out[1]["dup_token_frac"] == round(1 - 2 / 3, 6)
    assert out[1]["top_token_frac"] == round(2 / 3, 6)
    assert out[1]["top_bigram_frac"] == 0.5
    # doc 2: single token -> bigram fraction is NULL, dup 0, top 1.0
    assert out[2]["n_tokens"] == 1
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_token_frac"] == 1.0
    assert out[2]["top_bigram_frac"] is None
    # doc 3: 'a b a b a' -> 'a' x3 of 5; bigrams [ab, ba, ab, ba] -> 2 of 4
    assert out[3]["top_token_frac"] == 0.6
    assert out[3]["top_bigram_frac"] == 0.5


def test_repetition_is_map_only(spark):
    df = repetition_stats(_docs(spark, [(1, "a b c")]))
    assert exchange_count(df) == 0  # zero-shuffle: the 100 TB contract


# ---------------------------------------------------------------------- PII

def test_pii_injection_and_redaction_golden(spark):
    # doc_id 0 hits all three injectors (0 mod anything == 0)
    out = pii_redact(pii_corpus(_docs(spark, [(0, "hello world"), (1, "plain")]))).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_emails"] == 1
    assert by_id[0]["n_phones"] == 1
    assert by_id[0]["n_ips"] == 1
    assert by_id[1]["n_emails"] == 0 and by_id[1]["n_phones"] == 0 and by_id[1]["n_ips"] == 0
    expected = "hello world contact <EMAIL> call <PHONE> host <IP>"
    assert by_id[0]["clean_md5"] == hashlib.md5(expected.encode()).hexdigest()
    assert by_id[0]["clean_len"] == len(expected)
    assert by_id[1]["clean_md5"] == hashlib.md5(b"plain").hexdigest()


def test_pii_redaction_removes_every_match(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    red = pii_redact(pii_corpus(docs))
    # counts: every doc_id % 3 == 0 has exactly one email, etc.
    agg = red.agg(
        F.sum("n_emails").alias("e"), F.sum("n_phones").alias("p"), F.sum("n_ips").alias("i")
    ).collect()[0]
    n = docs.count()
    assert agg["e"] == sum(1 for d in range(n) if d % 3 == 0)
    assert agg["p"] == sum(1 for d in range(n) if d % 5 == 0)
    assert agg["i"] == sum(1 for d in range(n) if d % 7 == 0)


def test_pii_redact_is_map_only(spark):
    df = pii_redact(_docs(spark, [(1, "x")]))
    assert exchange_count(df) == 0


# -------------------------------------------------------------- boilerplate

def test_boilerplate_removed_content_kept(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = strip_boilerplate(boilerplate_corpus(docs))
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in cleaned.collect():
        # chrome lines hit >= 25% of docs each, far over the 5% threshold,
        # so every doc should reduce to exactly its original text (the
        # word-salad line is shared only within small dup groups)
        assert r["n_kept"] == 1, r
        want = orig[r["doc_id"]]
        assert r["clean_md5"] == hashlib.md5(want.encode()).hexdigest()


def test_boilerplate_all_lines_removed_doc_survives_empty(spark):
    # one doc consists ONLY of the frequent line -> survives with text ''
    # min_doc_frac=0.5 over 10 docs: the nav line (10 docs) is frequent,
    # each 'body i' line (1 doc) is not
    rows = [(i, "nav home about contact\nbody %d" % i) for i in range(9)]
    rows.append((9, "nav home about contact"))
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(_docs(spark, rows), min_doc_frac=0.5).collect()
    }
    assert out[9]["n_lines"] == 1 and out[9]["n_kept"] == 0
    assert out[9]["clean_md5"] == hashlib.md5(b"").hexdigest()
    assert out[0]["n_kept"] == 1  # 'body 0' kept, nav line stripped
    assert out[0]["clean_md5"] == hashlib.md5(b"body 0").hexdigest()


def test_boilerplate_threshold_boundary(spark):
    # line in exactly min_doc_frac of docs IS boilerplate (>= semantics)
    rows = [(i, "shared line\nuniq %d" % i) for i in range(5)]
    rows += [(5 + i, "uniq %d" % (5 + i)) for i in range(5)]
    out = strip_boilerplate(_docs(spark, rows), min_doc_frac=0.5)
    kept = {r["doc_id"]: r["n_kept"] for r in out.collect()}
    assert all(v == 1 for v in kept.values())
