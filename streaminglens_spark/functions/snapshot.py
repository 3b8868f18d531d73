"""Corpus snapshot diff (round-5 continued extension): dataset
governance for a training corpus -- between two snapshots (yesterday's
parquet and today's), which documents were added, removed, changed, or
untouched?  Every serious data pipeline audits exactly this before a
training run: an unexpected mass-change is a bug upstream (a scraper
regression, an overwritten partition) that silently poisons a run.

Spark shape: both sides reduce to (doc_id, md5) projections at scan time
(columns pruned to id + text), then ONE full-outer hash join on doc_id
-- the only shuffle; the status classification is a null/equality case
over the joined row.  At 100 TB both sides hash-partition by doc_id; if
snapshots are written bucketed by doc_id the join is co-located and
shuffle-free.  The summary is a partial-aggregated groupBy over four
status values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fp(df: DataFrame, col: str) -> DataFrame:
    return df.select("doc_id", F.md5(F.col("text").cast("binary")).alias(col))


def corpus_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Row-level diff: (doc_id, status, old_md5, new_md5) with status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    o = _fp(old, "old_md5")
    n = _fp(new, "new_md5")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", status.alias("status"), "old_md5", "new_md5"
    )


def corpus_diff_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """(status, n_docs) -- the four-row audit table a pipeline gates on
    (e.g. alert when changed + removed exceeds a tolerance)."""
    return corpus_diff(old, new).groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


OVERLAP_N = 3  # tokens per overlap shingle


def source_overlap_matrix(documents: DataFrame, n: int = OVERLAP_N) -> DataFrame:
    """Cross-source n-gram overlap audit (round-5 continued extension):
    the pairwise generalization of benchmark decontamination -- before
    mixing sources (or trusting a train/eval split), measure how much
    verbatim n-gram material every PAIR of sources shares.  High overlap
    between a training source and an eval source is contamination; high
    overlap between two training sources inflates effective epochs.

    Returns one row per unordered source pair (src_a < src_b):
    (src_a, src_b, grams_a, grams_b, shared, jaccard_permille) over
    DISTINCT token n-grams, all exact integers.

    Spark shape: one explode to (source, gram) + distinct (shuffle 1,
    the gram-vocabulary reduction -- everything after operates on
    distinct grams, not instances); the pair join is a self-equi-join ON
    GRAM (shuffle 2; a gram shared by k sources emits C(k,2) pairs --
    bounded by sources^2, not corpus size); per-source totals broadcast
    back.  Jaccard = shared / (a + b - shared), in exact permille."""
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sg = (
        documents.select("source", F.explode(grams).alias("gram"))
        .distinct()
    )
    totals = sg.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    a = sg.select("gram", F.col("source").alias("src_a"))
    b = sg.select("gram", F.col("source").alias("src_b"))
    shared = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    ta = totals.select(
        F.col("source").alias("src_a"), F.col("n_grams").alias("grams_a")
    )
    tb = totals.select(
        F.col("source").alias("src_b"), F.col("n_grams").alias("grams_b")
    )
    return (
        shared.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "grams_a",
            "grams_b",
            "shared",
            F.expr("shared * 1000 div (grams_a + grams_b - shared)")
            .cast("long")
            .alias("jaccard_permille"),
        )
    )


DRIFT_TOP_K = 10


def vocab_drift(
    old: DataFrame, new: DataFrame, k: int = DRIFT_TOP_K
) -> DataFrame:
    """Unigram-distribution drift between two corpus snapshots (round-5
    continued extension): the data-drift monitor that catches what
    ``corpus_diff`` cannot -- a scraper regression that keeps every
    doc_id but subtly shifts CONTENT (encoding damage, truncation, a
    template leaking into every page) moves the token distribution long
    before anyone reads a document.

    Metric: L1 distance between the snapshots' token distributions,
    computed EXACTLY by cross-multiplication --
    ``S = sum_t |c_old(t) * T_new - c_new(t) * T_old|`` and
    ``L1_permille = 1000 * S div (T_old * T_new)`` (range 0..2000) --
    in decimal(38,0) via ``dec_div`` (products pass int64 once token
    totals do).  Returns the top-``k`` moving tokens (rank, token,
    c_old, c_new, drift_permille) each carrying the corpus-level
    ``total_l1_permille`` -- the single number a pipeline alerts on.

    Spark shape: two token-count groupBys (map-side combined), one
    full-outer join on token (vocab-sized), totals broadcast, top-k by
    distributed TakeOrdered."""
    from pyspark.sql import Window

    from .intlog import dec, dec_div

    def counts(df, col):
        return (
            df.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias(col))
        )

    co = counts(old, "c_old")
    cn = counts(new, "c_new")
    joined = co.join(cn, "token", "full_outer").select(
        "token",
        F.coalesce("c_old", F.lit(0)).cast("long").alias("c_old"),
        F.coalesce("c_new", F.lit(0)).cast("long").alias("c_new"),
    )
    totals = joined.agg(
        F.sum("c_old").cast("long").alias("t_old"),
        F.sum("c_new").cast("long").alias("t_new"),
    )
    cross = F.abs(
        dec(F.col("c_old")) * dec(F.col("t_new"))
        - dec(F.col("c_new")) * dec(F.col("t_old"))
    )
    scored = joined.crossJoin(F.broadcast(totals)).select(
        "token",
        "c_old",
        "c_new",
        "t_old",
        "t_new",
        cross.alias("x"),
    )
    total = scored.agg(
        dec_div(
            dec(F.lit(1000)) * F.sum("x"),
            (dec(F.max("t_old")) * dec(F.max("t_new"))),
        )
        .cast("long")
        .alias("total_l1_permille")
    )
    per_tok = scored.select(
        "token",
        "c_old",
        "c_new",
        dec_div(dec(F.lit(1000)) * F.col("x"), dec(F.col("t_old")) * dec(F.col("t_new")))
        .cast("long")
        .alias("drift_permille"),
    )
    top = per_tok.orderBy(
        F.col("drift_permille").desc(), F.col("token").asc()
    ).limit(k)
    w = Window.orderBy(F.col("drift_permille").desc(), F.col("token").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            "rank", "token", "c_old", "c_new", "drift_permille",
            "total_l1_permille",
        )
    )
