"""SimHash near-dup pairing local oracle: the byte-band blocking + hamming
verify, hash-checked against DuckDB.  In the driver's 50-query surface as of
round 3 (``q_simhash_pairs``); the SQL lives in the registry and this test
re-runs it at a second scale factor."""

from __future__ import annotations

import pytest

from streaminglens_spark.functions.dedup import simhash_pairs
from streaminglens_spark.oracle.compare import compare, duckdb_connect
from streaminglens_spark.registry import LOCAL_ORACLE, ORACLE

SIMHASH_PAIRS_SQL = {**ORACLE, **LOCAL_ORACLE}["q_simhash_pairs"]  # rotation-proof


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_simhash_pairs_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb_connect(sf_dir)
    try:
        r = compare(simhash_pairs(docs), con, SIMHASH_PAIRS_SQL)
        assert r["ok"], {k: v for k, v in r.items() if k != "spark_cols"}
        # every doc has an exact +100000 copy -> at least n hamming-0 pairs
        assert r["spark_rows"] >= docs.count()
    finally:
        con.close()


def test_simhash_band_blocking_is_exact_for_3_bits(spark):
    """Pigeonhole completeness: every pair within hamming 3 shares a byte
    band, so blocking loses nothing vs brute force on a small slice."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.dedup import dup_corpus, simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    sigs = simhash(dup_corpus(docs))
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("h") <= 3)
        .collect()
    }
    blocked = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs).collect()}
    # brute ran on the same corpus; band blocking covers it completely
    assert brute <= blocked