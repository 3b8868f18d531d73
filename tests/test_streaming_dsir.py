"""Streaming DSIR admission (r12): a real file-stream of documents
scored against frozen offline-fitted weights must admit EXACTLY the rows
the batch operator admits, bit for bit, with zero streaming state."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.functions.dsir import dsir_fit, dsir_score_with
from streaminglens_spark.streaming.dsirstream import (
    dsir_admit_batch,
    start_dsir_admission,
)
from tests.conftest import SF_DIR


def test_stream_admission_matches_batch_and_is_stateless(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # freeze the model on the full static snapshot, then materialize the
    # one-row weight table so every trigger broadcasts the same literal fit
    warr = spark.createDataFrame(
        dsir_fit(docs).collect(), "warr array<bigint>"
    )

    sample = (
        docs.orderBy("doc_id")
        .limit(60)
        .select("doc_id", "text", "lang")
        .collect()
    )
    ids = [r["doc_id"] for r in sample]
    # median-ish threshold so the admitted set is a strict nontrivial subset
    scores = sorted(
        r["score_micro"]
        for r in dsir_score_with(
            docs.filter(F.col("doc_id").isin(ids)), warr
        ).collect()
    )
    thr = scores[len(scores) // 2]
    batch_truth = {
        r["doc_id"]: (r["lang"], r["n_feats"], r["score_micro"])
        for r in dsir_admit_batch(
            docs.filter(F.col("doc_id").isin(ids)).select(
                "doc_id", "text", "lang"
            ),
            warr,
            threshold_micro=thr,
        ).collect()
    }
    assert 0 < len(batch_truth) < 60

    src = str(tmp_path / "docs")
    os.makedirs(src)
    for i in range(3):
        path = os.path.join(src, f"f{i}.json")
        with open(path + ".tmp", "w") as f:
            for r in sample[i * 20 : (i + 1) * 20]:
                f.write(
                    json.dumps(
                        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
                    )
                    + "\n"
                )
        os.rename(path + ".tmp", path)

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )

    got: dict[int, tuple] = {}
    batches: list[int] = []

    def sink(df, batch_id):
        batches.append(batch_id)
        for r in df.collect():
            got[r["doc_id"]] = (r["lang"], r["n_feats"], r["score_micro"])

    q = start_dsir_admission(stream, warr, sink, threshold_micro=thr)
    try:
        q.processAllAvailable()
        assert got == batch_truth  # admitted set bit-identical to batch
        assert len(batches) >= 3  # really ran per-file triggers
        # purity: no cross-batch state anywhere in the streaming query
        assert q.lastProgress["stateOperators"] == []
    finally:
        q.stop()
