"""BM25 inverted-index keyword search over the corpus (round-5 continued
extension): the retrieval side of a training-data stack -- data curation
teams grep 100 TB corpora for topical slices ("find docs about X to
up/down-sample"), dedup auditors pull candidate sets by content, and
RAG-ish pipelines need lexical retrieval next to the ANN surface
(``functions/similarity.py``); Okapi BM25 over an inverted index is the
standard engine for all of them.

Scoring is Lucene-shaped BM25 (k1 = 1.2, b = 0.75, the
``BM25Similarity`` defaults) with the non-negative idf variant
``idf = log((N + 1) / (df + 0.5))`` -- but evaluated ENTIRELY in integer
arithmetic so the scores are engine-exact (see ``intlog.py``):

- ``idf_fp   = log2_fp(2N + 2) - log2_fp(2df + 1)``  (micro-bits; the
  0.5-shifted ratio times 2/2 clears the halves into odd integers);
- ``tf part  = tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))`` with
  ``avgdl = L / N`` (L = total corpus tokens): multiplying through by
  ``10 * L`` turns it into the exact rational
  ``22 * tf * L / (10 * tf * L + 3 * L + 9 * dl * N)``;
- ``score_fp = sum over matched terms of
  (idf_fp * 22 * tf * L) // (10*tf*L + 3*L + 9*dl*N)`` -- one exact
  floor division per (doc, term), computed in decimal(38,0) via
  ``dec_div`` (the products pass int64 once ``L`` does; ~1e25 at a
  100 TB corpus, well inside 38 digits), mirrored as HUGEINT ``//`` in
  the DuckDB oracle.

Spark shape (scale audit): one explode + groupBy builds the postings
list (shuffle 1, map-side combine); doc length is a window over the
postings partitioned by doc_id (shuffle 2 -- never a second corpus
scan); the query-term table is a BROADCAST semi-filter, so only postings
of query terms move after that; per-term df is an O(#query-terms)
aggregate; N and L ride in via a broadcast of a 1-row aggregate (lazy,
no driver action); top-k ranking windows partition by query_id (bounded
by the query list, never a global sort).  Zero Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .intlog import dec, dec_div, log2_fp

TOP_K = 10


def build_postings(documents: DataFrame) -> DataFrame:
    """Inverted-index postings: (term, doc_id, tf, dl) -- term frequency
    plus the containing document's token length.  The dl window rides the
    postings table (vocab-compressed), not the raw token stream."""
    toks = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    w = Window.partitionBy("doc_id")
    return postings.withColumn("dl", F.sum("tf").over(w))


def bm25_search(
    documents: DataFrame, queries: list[tuple[str, str]], k: int = TOP_K
) -> DataFrame:
    """Top-``k`` documents per query by integer-exact BM25.

    ``queries``: (query_id, query_text) pairs; multi-term queries are
    whitespace-split, duplicate terms in one query count once (the
    standard bag-of-distinct-terms treatment).  Returns (query_id, rank,
    doc_id, score_fp) with rank 1..k by (score desc, doc_id asc) --
    integer scores make the tie-break total and engine-independent."""
    spark = documents.sparkSession
    qterms = (
        spark.createDataFrame(queries, "query_id string, qtext string")
        .select("query_id", F.explode(F.split(F.col("qtext"), " ")).alias("term"))
        .distinct()
    )
    postings = build_postings(documents)
    # corpus stats: 1-row aggregate, attached lazily via broadcast
    stats = documents.select(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("n_tokens"),
    )
    # broadcast semi-filter: only query-term postings continue
    matched = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    df_tbl = matched.groupBy("term").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    idf_fp = log2_fp(F.lit(2) * F.col("n_docs") + 2) - log2_fp(
        F.lit(2) * F.col("df") + 1
    )
    num = dec(idf_fp) * 22 * dec(F.col("tf")) * dec(F.col("n_tokens"))
    den = (
        dec(10) * dec(F.col("tf")) * dec(F.col("n_tokens"))
        + dec(3) * dec(F.col("n_tokens"))
        + dec(9) * dec(F.col("dl")) * dec(F.col("n_docs"))
    )
    scored = (
        matched.join(F.broadcast(df_tbl), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("term_score", dec_div(num, den).cast("long"))
    )
    doc_scores = scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").cast("long").alias("score_fp")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp").desc(), F.col("doc_id").asc()
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score_fp")
    )
