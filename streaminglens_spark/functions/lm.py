"""Bigram language-model surprisal scoring (round-5 continued extension):
the CCNet/Gopher "perplexity filter" stage of a pretraining pipeline --
score every document by how surprising its token stream is under a
language model, then keep the middle of the distribution (very low
surprisal = boilerplate/templates, very high = lorem-ipsum noise, OCR
garbage, wrong-language text).

Production stacks score against a KenLM n-gram model; the engine-native
form here trains the counts and scores the corpus in ONE job: an add-one
smoothed bigram model

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)

where ``c`` are exact corpus counts, ``c(w1)`` is the context count (the
number of bigrams starting with ``w1`` -- the row sum of the count
matrix) and ``V`` the vocabulary size (distinct tokens participating in
any bigram).  Per-document surprisal is the cross-entropy sum

    bits(doc) = sum over bigrams of log2(1 / p(w2 | w1))

evaluated ENTIRELY in integer micro-bits via ``intlog.log2_fp``:
``s = log2_fp(c(w1) + V) - log2_fp(c(w1 w2) + 1)`` -- no float log, so
the scores are bit-identical in any engine (the property the DuckDB
oracle hashes).  Self-scoring against the corpus's own counts is the
deterministic degenerate of train-then-apply; ``apply`` against a
persisted count table is the same join shape.

Scale audit: bigram formation is a map-only array transform (one corpus
scan, the ``qc_feats_expr`` guard for single-token docs); ``c12`` is one
hash groupBy with map-side combine (shuffle 1); ``c1`` reduces the
already-vocab-sized ``c12`` (cheap); scoring joins the bigram instances
to ``c12`` on (w1, w2) (shuffle 2 -- both sides hash-partitioned by the
bigram key) and to ``c1`` on w1 (shuffle 3, vocab-sized build side);
``V`` rides in as a broadcast 1-row aggregate, lazily.  The final
per-doc rollup hash-partitions by doc_id.  Zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .intlog import log2_fp


def doc_bigrams(documents: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) -- one row per adjacent token pair; single-token
    and empty documents contribute no rows (and are absent from the
    surprisal output; a doc with no bigrams has no defined cross-entropy).

    r7: tokenize/explode at full parallelism -- the split + pair-build +
    explode + map-side partial agg all run in the scan stage, which a
    single-row-group fixture file serializes onto 1-2 cores (no-op on a
    real multi-split scan)."""
    from ..plans.shape import scan_parallel

    documents = scan_parallel(documents.select("doc_id", "text"))
    toks = F.split(F.col("text"), " ")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return documents.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def bigram_counts(documents: DataFrame) -> DataFrame:
    """The trained model: (w1, w2, c12, c1) exact corpus counts -- the
    table an incremental pipeline persists and later batches score
    against (counts are additive, so shards/days merge by summation)."""
    c12 = doc_bigrams(documents).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    return c12.join(c1, "w1")


def bigram_surprisal(documents: DataFrame) -> DataFrame:
    """Per-document integer cross-entropy under the corpus's own add-one
    bigram model.  Returns (doc_id, n_bigrams, total_micro_bits,
    mean_micro_bits) for every doc with >= 1 bigram; mean is the exact
    integer floor (total and count are both int64-safe: <= 64 micro-bits
    per bigram times document length).

    Plan (r5 perf pass): the corpus bigram stream is pre-aggregated to
    per-(doc, w1, w2) counts ``k`` -- the model aggregation and the
    scoring join then read the same canonicalized subtree
    (exchange-reuse eligible), and every later stage carries
    doc-DISTINCT bigrams instead of raw instances (``sum(k * s)`` equals
    the per-instance sum exactly; a repetitive corpus compresses hard).
    The naive shape (instance-level join + second corpus explode for the
    model) measured 43.4 s at sf1; this one 31.4 s (the remaining cost
    is the irreducible instance-stream shuffle into the first
    pre-aggregation).  Same values, same oracle."""
    from ..cache import track

    dbc = doc_bigrams(documents).groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    # r15 (guide §2.3): the model table is read by THREE pruning-divergent
    # consumers (c1, vocab, the scoring join), and per-branch column
    # pruning makes their dbc subtrees canonicalize differently, so
    # exchange reuse does NOT kick in -- the bigram explode ran 3x per
    # action (profiled: three Generate+Exchange stages of 1.8-2.9 s each
    # at sf0.1).  Persisting c12 -- O(distinct corpus bigrams), far
    # smaller than the per-doc dbc table whose persist REGRESSED in r14
    # -- lets the model/vocab branches read the cache; only the scoring
    # join's dbc branch and the cache build still explode (3x -> 2x).
    c12 = track(
        dbc.groupBy("w1", "w2").agg(F.sum("k").cast("long").alias("c12"))
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    model = c12.join(c1, "w1")
    vocab = (
        model.select(F.col("w1").alias("w"))
        .unionByName(model.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    s = log2_fp(F.col("c1") + F.col("v")) - log2_fp(F.col("c12") + 1)
    return (
        dbc.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "k", s.alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("s")).cast("long").alias("total_micro_bits"),
            F.expr("sum(k * s) div sum(k)").cast("long").alias("mean_micro_bits"),
        )
    )


def ppl_band_filter(
    documents: DataFrame,
    lo_pm: int = 50,
    hi_pm: int = 950,
    p_bits: int = 7,
) -> DataFrame:
    """The CCNet keep-the-middle decision: filter documents by their
    surprisal PERCENTILE BAND -- the bottom tail is templates/boilerplate
    the model has memorized, the top tail is noise/OCR garbage/wrong
    language; training data wants the middle.

    Thresholds come from the HDR log-bucket sketch over the per-doc mean
    surprisal (``functions/sketch.hdr_quantiles``'s bucketing): bucket
    edges are integer shifts, rank selection is the integer permille
    test, so the KEPT SET is a deterministic engine-exact function of the
    corpus -- no float percentile, no sampling.  ``t_lo``/``t_hi`` are
    the upper bounds of the first buckets reaching ``lo_pm``/``hi_pm``
    permille; keep = ``t_lo <= mean < t_hi`` (relative threshold error
    <= 2^-p_bits, the HDR contract).

    Scale shape: scoring is ``bigram_surprisal``'s plan; bucketing is one
    additive groupBy on bucket edges; the cumulative window runs over the
    BUCKET table only (O(p_bits * 64) rows -- the bounded-single-partition
    idiom q_profile_events/q_sla_recommend already use); the two
    thresholds broadcast back.  Docs with no bigrams have no defined
    surprisal and are absent (same contract as ``bigram_surprisal``).
    Returns (doc_id, mean_micro_bits, keep)."""
    from pyspark.sql import Window

    from ..cache import track

    fine_max = 1 << p_bits
    # scores feed TWO consumers (bucket thresholds + the final keep
    # projection): persist the O(n_docs)-row score table so the bigram
    # scoring chain runs once -- exchange reuse alone still re-ran the
    # post-shuffle stages per consumer (r7: sf1 11.3 s -> ~8 s)
    scores = track(
        bigram_surprisal(documents).select("doc_id", "mean_micro_bits")
    )
    scores.count()
    x = F.col("mean_micro_bits")
    b = (
        scores.withColumn(
            "eb",
            F.when(
                x >= fine_max,
                F.length(F.conv(x.cast("string"), 10, 2)) - 1,
            ),
        )
        .withColumn(
            "lo",
            F.when(x < fine_max, x)
            .otherwise(
                F.expr(
                    f"shiftleft(shiftright(mean_micro_bits, eb - {p_bits}),"
                    f" eb - {p_bits})"
                )
            )
            .cast("long"),
        )
        .withColumn(
            "w",
            F.when(x < fine_max, F.lit(1))
            .otherwise(F.expr(f"shiftleft(cast(1 as bigint), eb - {p_bits})"))
            .cast("long"),
        )
    )
    buckets = b.groupBy("lo", "w").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = buckets.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )

    def pick(pm: int) -> F.Column:
        return F.min(
            F.when(
                F.col("cum") * 1000 >= F.lit(pm) * F.col("n"),
                F.col("lo") + F.col("w"),
            )
        )

    th = cum.agg(
        pick(lo_pm).cast("long").alias("t_lo"),
        pick(hi_pm).cast("long").alias("t_hi"),
    )
    return scores.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "mean_micro_bits",
        ((x >= F.col("t_lo")) & (x < F.col("t_hi"))).alias("keep"),
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


def pmi_collocations(
    documents: DataFrame,
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_TOP_K,
) -> DataFrame:
    """Collocation extraction by pointwise mutual information (round-5
    continued extension): the classic "which word pairs belong together"
    corpus analysis (tokenizer-vocabulary candidates, multi-word entity
    mining, stop-pair detection).

    PMI(w1, w2) = log2( p(w1 w2) / (p(w1) p(w2)) )
                = log2(c12) + log2(T) - log2(c1) - log2(c2)

    with exact bigram counts ``c12``, left/right context counts
    ``c1``/``c2`` and total bigrams ``T`` -- evaluated as a SUM of four
    ``log2_fp`` terms, each int64-safe individually (no ``c12 * T``
    product that could overflow at corpus scale), total quantization
    error <= 4 * 0.0224 bits.  ``min_count`` suppresses the classic
    PMI pathology (hapax pairs scoring highest); top-``k`` by
    (pmi desc, w1, w2) via distributed TakeOrdered -- the ranking
    window runs over the k survivors only (``vocab_topk`` idiom).

    Returns (rank, w1, w2, c12, pmi_micro_bits)."""
    from pyspark.sql import Window

    dbc = doc_bigrams(documents).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = dbc.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    c2 = dbc.groupBy("w2").agg(F.sum("c12").cast("long").alias("c2"))
    tot = dbc.agg(F.sum("c12").cast("long").alias("t"))
    pmi = (
        log2_fp(F.col("c12"))
        + log2_fp(F.col("t"))
        - log2_fp(F.col("c1"))
        - log2_fp(F.col("c2"))
    )
    scored = (
        dbc.filter(F.col("c12") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c12", pmi.alias("pmi_micro_bits"))
    )
    top = scored.orderBy(
        F.col("pmi_micro_bits").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("pmi_micro_bits").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "w1", "w2", "c12", "pmi_micro_bits"
    )


def apply_surprisal(new_docs: DataFrame, model: DataFrame) -> DataFrame:
    """The APPLY side of train-then-apply (the production shape
    ``bigram_surprisal`` degenerates from): score a NEW batch against a
    PERSISTED model table (``bigram_counts`` output: w1, w2, c12, c1 --
    the parquet side table an incremental pipeline reuses, like
    ``minhash_index``), without touching the training corpus.

    Semantics: identical formula, with one extra case the self-scoring
    path never hits -- an UNSEEN bigram (absent from the model) backs
    off to the add-one floor ``log2_fp(c1 + V) - log2_fp(1)`` when its
    context ``w1`` is known, and to the uniform floor ``log2_fp(V)``
    when even the context is novel.  V is derived from the model table
    (its bigram-participating vocabulary).  Returns the
    ``bigram_surprisal`` schema plus ``n_unseen`` -- the count of
    out-of-model bigrams, itself a drift signal.

    Scale shape: same joins as self-scoring (left joins so unseen pairs
    survive), model-side tables are vocab-bounded."""
    dbc = doc_bigrams(new_docs).groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    c1_tbl = model.select("w1", "c1").distinct()
    vocab = (
        model.select(F.col("w1").alias("w"))
        .unionByName(model.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )
    joined = (
        dbc.join(model.select("w1", "w2", "c12"), ["w1", "w2"], "left")
        .join(c1_tbl, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    s = (
        F.when(
            F.col("c1").isNotNull(),
            log2_fp(F.col("c1") + F.col("v"))
            - log2_fp(F.coalesce(F.col("c12"), F.lit(0)) + 1),
        )
        .otherwise(log2_fp(F.col("v")))
    )
    unseen = F.when(F.col("c12").isNull(), F.col("k")).otherwise(F.lit(0))
    return joined.select("doc_id", "k", s.alias("s"), unseen.alias("u")).groupBy(
        "doc_id"
    ).agg(
        F.sum("k").cast("long").alias("n_bigrams"),
        F.sum(F.col("k") * F.col("s")).cast("long").alias("total_micro_bits"),
        F.expr("sum(k * s) div sum(k)").cast("long").alias("mean_micro_bits"),
        F.sum("u").cast("long").alias("n_unseen"),
    )
