"""Negative sampling, key-skew diagnosis, and streaming postings ingest
(r5 continued).  Oracle hash parity for q_negative_samples / q_key_skew
lives in test_oracle_queries.py."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.functions.profile import key_skew_stats
from streaminglens_spark.functions.sampling import negative_samples
from streaminglens_spark.functions.search import build_postings
from tests.conftest import hidden_tmp, SF_DIR


# ------------------------------------------------------- negative sampling

def _emb(spark, n=60, labels=5):
    rows = [(i, i % labels) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, label int")


def test_negatives_cross_label_and_no_self(spark):
    out = negative_samples(_emb(spark)).collect()
    assert out, "no negatives drawn"
    for r in out:
        assert r["neg_label"] != r["anchor_label"]
        assert r["neg_id"] != r["anchor_id"]


def test_negatives_yield_bound_and_expectation(spark):
    """<= n_neg per anchor; with 5 balanced labels the expected yield is
    4 * (1 - 1/5) = 3.2 -- assert the mean lands in a broad band."""
    out = negative_samples(_emb(spark, n=200, labels=5), n_neg=4).collect()
    per = {}
    for r in out:
        per[r["anchor_id"]] = per.get(r["anchor_id"], 0) + 1
    assert max(per.values()) <= 4
    mean = sum(per.values()) / 200  # anchors with zero yield count as 0
    assert 2.4 < mean <= 4.0, mean


def test_negatives_deterministic_across_partitioning(spark):
    emb = _emb(spark, n=80)
    a = {tuple(r) for r in negative_samples(emb).collect()}
    b = {tuple(r) for r in negative_samples(emb.repartition(13)).collect()}
    assert a == b and a


def test_negatives_degenerate_corpora(spark):
    assert negative_samples(_emb(spark, n=1)).count() == 0
    one_label = spark.createDataFrame(
        [(i, 7) for i in range(10)], "vec_id long, label int"
    )
    assert negative_samples(one_label).count() == 0  # no cross-label rows


# --------------------------------------------------------------- key skew

def test_key_skew_golden(spark):
    rows = [(i, "hot") for i in range(900)] + [
        (900 + i, f"cold{i % 5}") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "rid long, k string")
    out = {r["rank"]: r for r in key_skew_stats(df, "k", k=3).collect()}
    assert out[1]["key_value"] == "hot"
    assert out[1]["cnt"] == 900 and out[1]["permille"] == 900
    assert out[2]["cnt"] == 20  # cold0..cold4 tie at 20, key asc breaks
    assert out[2]["key_value"] == "cold0"
    assert len(out) == 3


def test_key_skew_permille_sums_bounded(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = key_skew_stats(df, "event_type").collect()
    assert sum(r["permille"] for r in rows) <= 1000
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )


# -------------------------------------------------- streaming index ingest

def test_streaming_postings_ingest_matches_batch(spark, tmp_path):
    """Incremental BM25 index maintenance on a REAL stream: each
    micro-batch's postings append to a parquet store; the store ends
    bit-equal to the batch-built full-corpus index (disjoint doc_ids per
    batch, and tf/dl are per-doc -- the batch-side parity test's
    streaming twin)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.limit(60).collect()]
    static_df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {tuple(r) for r in build_postings(static_df).collect()}

    src = str(tmp_path / "docs")
    os.makedirs(src)
    per = 20
    for i in range(3):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for doc_id, text in rows[i * per : (i + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(hidden_tmp(path), path)
    store = str(tmp_path / "postings_store")

    def ingest(batch_df, batch_id):
        build_postings(batch_df).write.mode("append").parquet(store)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.read.parquet(store).collect()}
    assert got == want
