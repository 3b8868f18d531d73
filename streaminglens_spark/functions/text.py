"""Text-analysis operators over the ``documents`` table (north-star
extensions, SURVEY §2d / BASELINE.json).

All hot-path logic uses built-in higher-order functions (JVM-side,
whole-stage-codegen) -- no Python UDFs -- so these scale to 100 TB corpora.
The character-fold hash is a portable polynomial hash (base 31, mod 2^31-1)
chosen because it is bit-reproducible in any SQL engine; a production
deployment would swap in ``xxhash64`` (same shape, one builtin call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# tiny deterministic stopword lexicons for n-gram-free language ID
LANG_LEXICON = {
    "en": ("the", "and", "of", "to", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "les", "et", "des", "un", "une"),
}


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def char_fold_hash(col: F.Column) -> F.Column:
    """Polynomial rolling hash over the string's characters:
    ``h = (h * 31 + ascii(c)) mod (2^31 - 1)`` -- a sequential fold, so the
    result is bit-identical in Spark and DuckDB."""
    chars = F.transform(F.split(col, ""), F.ascii)  # O(n), not substr-per-char
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % HASH_MOD
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring statistics per document: token count, average token
    length, stopword ratio, type-token ratio."""
    toks = _tokens()
    n = F.size(toks)
    tok_len_sum = F.aggregate(
        F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_txt"),
        n.cast("long").alias("n_tokens"),
        F.round(tok_len_sum / n.cast("double"), 6).alias("avg_token_len"),
        F.round(n_stop / n.cast("double"), 6).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / n.cast("double"), 6).alias("type_token_ratio"),
    )


def token_count(documents: DataFrame) -> DataFrame:
    """Whitespace token count plus a BPE-ish regex token count
    (alnum runs -- the subword-tokenizer budget estimate)."""
    return documents.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z0-9]+")).cast("long").alias("n_re_tokens"),
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprints: md5 (exact-dup key) + portable polynomial
    rolling hash (cheap locality-free fingerprint)."""
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("md5_fp"),
        char_fold_hash(F.col("text")).alias("poly_fp"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Composite document-quality score in [0, 1] from the text statistics
    (length band + stopword presence + lexical diversity), the filter a
    training-data pipeline thresholds on.  All components are exact
    rationals rounded at the end, so the score is bit-reproducible."""
    toks = _tokens()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n.cast(
        "double"
    )
    ttr = F.size(F.array_distinct(toks)) / n.cast("double")
    len_score = (
        F.when((n >= 20) & (n <= 200), F.lit(1.0))
        .when(n < 20, n / F.lit(20.0))
        .otherwise(F.lit(200.0) / n)
    )
    # stopword sweet spot ~5-40%: too few = keyword spam, too many = filler
    stop_score = F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.4), 1.0).otherwise(0.5)
    score = F.round((len_score * 0.4 + stop_score * 0.3 + ttr * 0.3), 6)
    return documents.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(ttr, 6).alias("ttr"),
        score.alias("quality"),
        (score >= 0.5).alias("keep"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-lexicon language ID: argmax of per-language lexicon hits
    (tie -> lexicographically first language; no hits -> 'und')."""
    spark = documents.sparkSession
    lex_rows = [(lang, w) for lang, words in LANG_LEXICON.items() for w in words]
    lexicon = spark.createDataFrame(lex_rows, "lex_lang string, word string")
    toks = documents.select("doc_id", F.explode(_tokens()).alias("word"))
    hits = (
        toks.join(F.broadcast(lexicon), "word")
        .groupBy("doc_id", "lex_lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("lex_lang").asc())
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("lex_lang").alias("pred"))
    )
    return documents.select("doc_id").join(best, "doc_id", "left").select(
        "doc_id", F.coalesce("pred", F.lit("und")).alias("pred_lang")
    )


def tf_idf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document top-k terms by TF-IDF (round-4 extension): the inverted
    corpus statistic every retrieval / quality pipeline needs.

    Spark shape: explode to (doc, term) postings, ONE groupBy for term
    frequencies, one for document frequencies (tiny: O(vocab), broadcast
    back), then a per-doc top-k window.  At 100 TB the df table stays
    O(vocab) and broadcastable; the posting explode is the linear scan.

    Scoring: the LOG-FREE variant ``tf * N / df`` -- one division of
    exactly-computed integers, so the score is bit-identical across
    engines/partitionings (the repo's oracle-exactness rule; ``ln`` has no
    cross-engine ulp guarantee).  Relative order per document differs from
    the log form only in how strongly rare terms dominate; callers wanting
    classic idf apply ``log`` to the emitted ``n_docs/df`` ratio
    themselves.  Ties break lexicographically for determinism.
    Returns (doc_id, term, tf, df, score) with k rows per document."""
    postings = documents.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    tf = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = documents.select(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"), 6),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )
