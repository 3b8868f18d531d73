"""SimHash near-dup pairing local oracle (driver surface full at 50): the
byte-band blocking + hamming verify, hash-checked against DuckDB."""

from __future__ import annotations

import pytest

from streaminglens_spark.functions.dedup import simhash_pairs
from streaminglens_spark.oracle.compare import compare, duckdb_connect

SIMHASH_PAIRS_SQL = """
WITH corpus AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000, text FROM documents
),
toks AS (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM corpus
),
hashed AS (
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(tok) + 1),
                       i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 2147483647) AS h
    FROM toks
),
bits AS (
    SELECT doc_id, i.i,
           SUM(CASE WHEN (h // (CAST(1 AS BIGINT) << CAST(i.i AS INT))) % 2 = 1
                    THEN 1 ELSE -1 END) AS s
    FROM hashed CROSS JOIN (SELECT UNNEST(range(0, 32)) AS i) i
    GROUP BY 1, 2
),
sigs AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
),
bands AS (
    SELECT doc_id, simhash, b.b AS band,
           (simhash // (CAST(1 AS BIGINT) << CAST(8 * b.b AS INT))) % 256 AS val
    FROM sigs CROSS JOIN (SELECT UNNEST(range(0, 4)) AS b) b
),
cand AS (
    SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
           xor(l.simhash, r.simhash) AS x
    FROM bands l JOIN bands r ON l.band = r.band AND l.val = r.val
    WHERE l.doc_id < r.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(x) AS INT) AS hamming
FROM cand WHERE bit_count(x) <= 3
"""


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