"""Sample-trained BPE (r7 verdict ask #5): fraction=1.0 is row-identical
to the full trainer (the continuity anchor -- sampling error enters only
through the fraction, never structurally), the sampled trainer's merges
apply corpus-wide through bpe_segment, and the word-table repartition
never caps below the session's shuffle width (r7 ADVICE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.bpe import (
    bpe_segment,
    bpe_train,
    bpe_train_sampled,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_fraction_one_is_row_identical(spark):
    docs = _docs(spark).filter(F.col("doc_id") < 120)
    full = sorted(tuple(r) for r in bpe_train(docs, 5).collect())
    sampled = sorted(
        tuple(r) for r in bpe_train_sampled(docs, 5, fraction=1.0).collect()
    )
    assert sampled == full


def test_sampled_merges_apply_corpus_wide(spark):
    """The at-scale recipe: train on the sample, encode EVERYTHING --
    every corpus doc gets a budget, and totals shrink vs. unmerged
    character counts (the merges actually bite outside the sample)."""
    docs = _docs(spark).filter(F.col("doc_id") < 120)
    merge_rows = bpe_train_sampled(docs, 5, fraction=0.5).collect()
    assert merge_rows, "sampled trainer found no merges"
    merges = [(r["left"], r["right"]) for r in
              sorted(merge_rows, key=lambda r: r["step"])]
    seg = bpe_segment(docs, merges)
    rows = seg.collect()
    assert len(rows) == docs.count()  # full corpus encoded, not the sample
    n_chars = {
        r["doc_id"]: r["n"] for r in docs.select(
            "doc_id",
            F.aggregate(
                F.transform(
                    F.filter(F.split("text", " "),
                             lambda w: F.length(w) > 0),
                    F.length,
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("n"),
        ).collect()
    }
    assert all(r["n_bpe_tokens"] < n_chars[r["doc_id"]] for r in rows
               if n_chars[r["doc_id"]] > 0)


def test_word_table_never_caps_below_shuffle_width(spark):
    """r7 ADVICE: the repartition target is max(defaultParallelism,
    shuffle width) -- a session running wide shuffles keeps that width."""
    from streaminglens_spark.functions.bpe import _word_table

    docs = _docs(spark).filter(F.col("doc_id") < 50)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "64")
        wt = _word_table(docs)
        assert wt.rdd.getNumPartitions() == 64
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
