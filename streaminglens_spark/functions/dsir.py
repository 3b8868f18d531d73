"""DSIR-style importance resampling (r12 extension): select the pool
documents whose hashed-n-gram distribution is closest to a TARGET slice
-- the published data-selection recipe (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling") re-expressed Spark-first
and integer-exact.

Method: features are the quality classifier's hashed unigram+bigram
buckets (``qc_feats_expr``, ``dim`` buckets).  Two bag-of-features
models are fit -- the target slice (``lang = target_lang``) and the
full pool -- with add-1 smoothing; a document's importance score is the
sum over its feature OCCURRENCES of the per-bucket log-likelihood ratio

    w(b) = log2 p_target(b) - log2 p_pool(b)
         = log2(c_t(b)+1) - log2(N_t+dim) - log2(c_q(b)+1) + log2(N_q+dim)

computed in micro-bits with the repo's ``log2_fp`` (pure integer
bin/shift/LUT -- no libm, so Spark and DuckDB agree bit-for-bit; the
float ``ln`` is exactly the place a value-hash comparison would die).
Selection is the paper's deterministic top-k variant: keep the
``keep_n`` highest scores (ties to the lower doc_id).

Spark shape, designed for the 100 TB pool:

- fit: ONE corpus scan -- posexplode-free feature explode into a
  ``groupBy(bucket)`` that map-side combines to at most ``dim`` rows
  per partition (the shuffle is O(partitions x dim), never O(tokens));
- the dense weight array: a ``dim``-row literal spine left-joined with
  the counts, totals attached via a broadcast single-row crossJoin
  (the ``mixture_sample`` scalar pattern) -- all lazy, O(dim) rows;
- scoring: ZERO-shuffle map-only -- the weight array broadcasts as one
  row and the per-document score is an ``F.aggregate`` fold over the
  feature array inside a single projection (the ``quality_classifier``
  shape, but with data-dependent weights);
- selection: ``orderBy(...).limit(keep_n)`` plans as
  TakeOrderedAndProject -- per-partition top-k then a driver merge of
  k-row heads, never a global sort.

At a real deployment the fit side runs over ``hash_sample`` of the pool
(the fit is statistics -- the same argument as the sampled quantizer
fit); the fixture-scale contract fits on everything so the oracle can
replay it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .intlog import log2_fp
from .text import QC_DIM, qc_feats_expr

#: fixture-scale keep budget for q_dsir_select (a production run derives
#: this from the token budget -- see functions/sampling.token_budget)
DSIR_KEEP_N = 100


def dsir_bucket_counts(
    documents: DataFrame,
    target_lang: str = "en",
    dim: int = QC_DIM,
) -> DataFrame:
    """The per-bucket feature-occurrence counts (bucket, c_t, c_q) --
    ONE corpus scan, map-side-combined groupBy bounded by ``dim``.
    Counts are ADDITIVE: counts of a union of corpora are the
    bucket-wise sums of per-corpus counts, which is what makes the
    adaptive streaming refit (``streaming/dsirstream.py``) an O(dim)
    ledger fold.

    The feature hash is a per-CHARACTER fold (CPU-dense, the r7
    lesson), so the projection must not run at (possibly single-split)
    scan parallelism -- ``scan_parallel`` guards it (measured at sf1:
    the unguarded form ran the 50k-doc hash single-task)."""
    from ..plans.shape import scan_parallel

    fx = scan_parallel(documents.select("lang", "text")).select(
        (F.col("lang") == target_lang).alias("is_target"),
        F.explode(qc_feats_expr(F.col("text"), dim)).alias("bucket"),
    )
    return fx.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.count(F.lit(1)).alias("c_q"),
    )


def dsir_weights_from_counts(
    spark, counts: DataFrame, dim: int = QC_DIM
) -> DataFrame:
    """Turn (bucket, c_t, c_q) counts into the ONE-ROW dense weight
    array: densified over the full bucket spine (never-seen buckets
    carry the smoothed default), totals attached as a broadcast scalar
    row, add-1 smoothed log-likelihood ratios in integer micro-bits.
    With EMPTY counts every weight is exactly 0 (log2(1/dim) cancels
    across the ratio) -- the documented cold-start: no evidence, no
    discrimination."""
    spine = spark.range(dim).select(F.col("id").alias("bucket"))
    dense = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_t", F.lit(0)).cast("long").alias("c_t"),
            F.coalesce("c_q", F.lit(0)).cast("long").alias("c_q"),
        )
    )
    totals = dense.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_q").alias("n_q")
    )
    weights = dense.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            log2_fp(F.col("c_t") + 1)
            - log2_fp(F.col("n_t") + dim)
            - log2_fp(F.col("c_q") + 1)
            + log2_fp(F.col("n_q") + dim)
        ).alias("w"),
    )
    return weights.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "w"))),
            lambda s: s["w"],
        ).alias("warr")
    )


def dsir_fit(
    documents: DataFrame,
    target_lang: str = "en",
    dim: int = QC_DIM,
) -> DataFrame:
    """Fit the per-bucket log-likelihood-ratio weights: ONE corpus scan
    (``dsir_bucket_counts``) folded into the dense weight array
    (``dsir_weights_from_counts``).  Returns a ONE-ROW DataFrame with
    ``warr`` -- the dense bucket-ascending weight array (micro-bits,
    exact BIGINTs) -- the frozen model a scorer broadcasts (the
    fit-offline / score-on-arrival recipe ``pq_encode``/
    ``ann_assign_fold`` established)."""
    return dsir_weights_from_counts(
        documents.sparkSession,
        dsir_bucket_counts(documents, target_lang=target_lang, dim=dim),
        dim=dim,
    )


def dsir_score_with(
    documents: DataFrame, weights: DataFrame, dim: int = QC_DIM
) -> DataFrame:
    """Score documents against FROZEN fitted weights (``dsir_fit``'s
    one-row ``warr`` table): a pure projection after the one-row
    broadcast -- zero shuffle over the corpus, and because each row's
    score depends only on itself and the frozen weights, the SAME
    projection scores a streaming micro-batch bit-identically to the
    batch operator (``streaming/dsirstream.py``).  Preserves every
    input column and appends (n_feats, score_micro).  The per-character
    feature hash is CPU-dense, so the corpus side runs under the
    ``scan_parallel`` guard (a no-op on multi-split scans and on
    streaming inputs -- values are row-local, so placement never
    changes them)."""
    from ..plans.shape import scan_parallel

    fs = qc_feats_expr(F.col("text"), dim)
    cols = list(documents.columns)
    documents = scan_parallel(documents)
    return documents.crossJoin(F.broadcast(weights)).select(
        *cols,
        F.size(fs).cast("long").alias("n_feats"),
        F.aggregate(
            fs,
            F.lit(0).cast("long"),
            lambda acc, b: acc + F.element_at("warr", (b + 1).cast("int")),
        ).alias("score_micro"),
    )


def dsir_scores(
    documents: DataFrame,
    target_lang: str = "en",
    dim: int = QC_DIM,
) -> DataFrame:
    """Per-document DSIR importance scores over the FULL pool
    (fit + score composed).

    Returns (doc_id, n_feats, score_micro): ``score_micro`` is the
    summed per-occurrence log-likelihood ratio in micro-bits (exact
    BIGINT -- order-independent), ``n_feats`` the feature count.  Docs
    with no features (empty text) score 0 (an empty product has
    importance weight 1)."""
    warr = dsir_fit(documents, target_lang=target_lang, dim=dim)
    return dsir_score_with(documents, warr, dim=dim).select(
        "doc_id", "n_feats", "score_micro"
    )


def dsir_select(
    documents: DataFrame,
    target_lang: str = "en",
    dim: int = QC_DIM,
    keep_n: int = DSIR_KEEP_N,
) -> DataFrame:
    """The deterministic top-k DSIR selection: the ``keep_n``
    most-target-like pool documents by importance score, ties to the
    lower doc_id.  Plans as TakeOrderedAndProject (per-partition heads,
    no global sort)."""
    return (
        dsir_scores(documents, target_lang=target_lang, dim=dim)
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(keep_n)
    )
