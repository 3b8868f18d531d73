"""URL canonicalization: hand-computed goldens for every rule, the
map-only plan pin, and idempotence on already-canonical URLs.
Cross-engine parity runs in ``test_oracle_queries`` (`q_canon_urls`,
`q_domain_stats`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.urls import (
    canonicalize_urls,
    domain_stats,
    url_corpus,
)
from tests.conftest import SF_DIR


def _canon(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, url string")
    return {r["doc_id"]: r for r in canonicalize_urls(df).collect()}


def test_rule_goldens(spark):
    cases = {
        # scheme+host lowercase, www strip, path case preserved
        0: ("HTTPS://WWW.ExAmple.COM/Docs/Page", "https://example.com/Docs/Page"),
        # default ports drop per scheme
        1: ("http://a.com:80/x", "http://a.com/x"),
        2: ("https://a.com:443/x", "https://a.com/x"),
        # non-default port survives; so does http:443
        3: ("http://a.com:8080/x", "http://a.com:8080/x"),
        4: ("http://a.com:443/x", "http://a.com:443/x"),
        # fragment drops
        5: ("https://a.com/x#frag", "https://a.com/x"),
        # trailing slashes drop (root path becomes empty)
        6: ("https://a.com/x///", "https://a.com/x"),
        7: ("https://a.com/", "https://a.com"),
        # tracking params: leading / middle / trailing / only
        8: ("https://a.com/x?utm_source=f&id=1", "https://a.com/x?id=1"),
        9: ("https://a.com/x?id=1&utm_medium=m&k=2", "https://a.com/x?id=1&k=2"),
        10: ("https://a.com/x?id=1&gclid=z", "https://a.com/x?id=1"),
        11: ("https://a.com/x?fbclid=q", "https://a.com/x"),
        # param order preserved; non-tracking 'reference' not confused
        # with the exact param name 'ref'
        12: ("https://a.com/x?b=2&a=1", "https://a.com/x?b=2&a=1"),
        13: ("https://a.com/x?reference=1", "https://a.com/x?reference=1"),
        # a param merely ENDING in a tracking name keeps its tail (the
        # boundary-anchoring regression: 'href' must not lose 'ref=1')
        14: ("https://a.com/x?href=1", "https://a.com/x?href=1"),
        15: ("https://a.com/x?subref=2&id=3", "https://a.com/x?subref=2&id=3"),
        # ...while the exact names are dropped in any position
        16: ("https://a.com/x?ref=1&id=2", "https://a.com/x?id=2"),
        17: ("https://a.com/x?id=2&ref=1", "https://a.com/x?id=2"),
    }
    got = _canon(spark, [(i, u) for i, (u, _) in cases.items()])
    for i, (_, want) in cases.items():
        assert got[i]["canon_url"] == want, (i, got[i]["canon_url"], want)


def test_domain_extraction(spark):
    got = _canon(spark, [(0, "https://WWW.Sub.Site9.ExAmple.COM:8443/p")])
    assert got[0]["domain"] == "sub.site9.example.com"
    assert got[0]["reg_domain"] == "example.com"
    assert got[0]["canon_url"] == "https://sub.site9.example.com:8443/p"


def test_idempotent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    once = canonicalize_urls(url_corpus(docs))
    again = canonicalize_urls(
        once.select("doc_id", F.col("canon_url").alias("url"))
    )
    joined = once.select("doc_id", "canon_url").join(
        again.select("doc_id", F.col("canon_url").alias("c2")), "doc_id"
    )
    assert joined.filter(F.col("canon_url") != F.col("c2")).count() == 0


def test_plan_map_only(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        canonicalize_urls(url_corpus(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_domain_stats_counts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = {r["domain"]: r for r in
           domain_stats(canonicalize_urls(url_corpus(docs))).collect()}
    assert len(out) == 7  # site0..site6
    assert sum(r["n_docs"] for r in out.values()) == docs.count()
    for r in out.values():
        assert r["n_unique_urls"] <= r["n_docs"]
        assert r["n_reg_domains"] == 1  # all under example.com
