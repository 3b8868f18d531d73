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
from tests.conftest import hidden_tmp, SF_DIR


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
        with open(hidden_tmp(path), "w") as f:
            for r in sample[i * 20 : (i + 1) * 20]:
                f.write(
                    json.dumps(
                        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
                    )
                    + "\n"
                )
        os.rename(hidden_tmp(path), path)

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


def test_adaptive_monitor_converges_and_replays(spark, tmp_path):
    """The adaptive refit: batch 1 is the documented cold start (all
    weights 0 -> everything admitted at threshold 0); every later batch
    is scored by exactly the model fitted on the committed prefix
    (verified by offline reconstruction); after the drain the cumulative
    committed counts -- and therefore the next model -- are bit-equal to
    the batch dsir_fit over the concatenated corpus; and a replayed
    batch re-delivers byte-identically without double-counting state."""
    from pyspark.sql import functions as SF

    from streaminglens_spark.functions.dsir import (
        dsir_bucket_counts,
        dsir_weights_from_counts,
    )
    from streaminglens_spark.streaming.dsirstream import (
        dsir_adaptive_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(60).select("doc_id", "text", "lang").collect()
    )
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    os.makedirs(src)
    for i in range(3):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in sample[i * 20 : (i + 1) * 20]:
                f.write(
                    json.dumps(
                        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
                    )
                    + "\n"
                )
        os.rename(hidden_tmp(path), path)

    delivered: dict[int, list[tuple]] = {}
    body = dsir_adaptive_monitor(
        state,
        admitted_sink=lambda df, bid: delivered.setdefault(
            int(bid), sorted(tuple(r) for r in df.collect())
        ),
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = stream.writeStream.foreachBatch(body).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert set(delivered) == {0, 1, 2}

    # cold start: everything in batch 0 admitted with score exactly 0
    b0_ids = {r["doc_id"] for r in sample[:20]}
    assert {t[0] for t in delivered[0]} == b0_ids
    assert {t[-1] for t in delivered[0]} == {0}

    # batch 2 scored by the model fitted on batches 0-1, reconstructed
    pre = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample[:40]],
        "doc_id long, text string, lang string",
    )
    w_pre = spark.createDataFrame(
        dsir_weights_from_counts(
            spark, dsir_bucket_counts(pre)
        ).collect(),
        "warr array<bigint>",
    )
    b2 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample[40:60]],
        "doc_id long, text string, lang string",
    )
    expect2 = sorted(
        tuple(r) for r in dsir_admit_batch(b2, w_pre).collect()
    )
    assert delivered[2] == expect2
    # the model discriminates by then: a strict subset is admitted
    assert 0 < len(delivered[2]) < 20

    # convergence: committed cumulative counts == batch counts over all 60
    from streaminglens_spark.streaming.ingest import (
        _BatchDirCache,
        committed_table_view,
    )
    cum = (
        committed_table_view(
            spark, state, "counts", "bucket long, c_t long, c_q long",
            _BatchDirCache(),
        )
        .groupBy("bucket")
        .agg(SF.sum("c_t").alias("c_t"), SF.sum("c_q").alias("c_q"))
    )
    all60 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample],
        "doc_id long, text string, lang string",
    )
    assert sorted(map(tuple, cum.collect())) == sorted(
        map(tuple, dsir_bucket_counts(all60).collect())
    )

    # replay batch 1: byte-identical delivery, counts unchanged
    before = sorted(map(tuple, cum.collect()))
    b1 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample[20:40]],
        "doc_id long, text string, lang string",
    )
    first_delivery = delivered[1]
    del delivered[1]
    body(b1, 1)
    assert delivered[1] == first_delivery
    cum2 = (
        committed_table_view(
            spark, state, "counts", "bucket long, c_t long, c_q long",
            _BatchDirCache(),
        )
        .groupBy("bucket")
        .agg(SF.sum("c_t").alias("c_t"), SF.sum("c_q").alias("c_q"))
    )
    assert sorted(map(tuple, cum2.collect())) == before


def test_adaptive_monitor_replay_after_compaction(spark, tmp_path):
    """With compact_every=2 the count shards fold into a generation
    mid-stream; a replayed batch must still reconstruct its strict
    PREFIX view from the generation's src_batch provenance and
    re-deliver byte-identically."""
    from streaminglens_spark.streaming.dsirstream import (
        dsir_adaptive_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(60).select("doc_id", "text", "lang").collect()
    )
    src = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    os.makedirs(src)
    for i in range(3):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in sample[i * 20 : (i + 1) * 20]:
                f.write(
                    json.dumps(
                        {"doc_id": r["doc_id"], "text": r["text"], "lang": r["lang"]}
                    )
                    + "\n"
                )
        os.rename(hidden_tmp(path), path)

    delivered: dict[int, list[tuple]] = {}
    body = dsir_adaptive_monitor(
        state,
        admitted_sink=lambda df, bid: delivered.setdefault(
            int(bid), sorted(tuple(r) for r in df.collect())
        ),
        compact_every=2,
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = stream.writeStream.foreachBatch(body).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import glob

    assert glob.glob(f"{state}/compacted/gen=*"), "compaction never ran"
    for bid in (1, 2):
        first = delivered[bid]
        del delivered[bid]
        b = spark.createDataFrame(
            [
                (r["doc_id"], r["text"], r["lang"])
                for r in sample[bid * 20 : (bid + 1) * 20]
            ],
            "doc_id long, text string, lang string",
        )
        body(b, bid)
        assert delivered[bid] == first, f"batch {bid} replay diverged"


def test_adaptive_monitor_warmup_fail_closed(spark, tmp_path):
    """r12 advice #3: with warmup_target_features set, the cold-start
    window is FAIL-CLOSED -- batches below the committed target-feature
    mass floor deliver NOTHING (their counts still commit, so the model
    keeps learning) and the gauges expose the window; once the floor is
    crossed, delivery matches the ungated adaptive verdict."""
    from streaminglens_spark.functions.dsir import (
        dsir_bucket_counts,
        dsir_weights_from_counts,
    )
    from streaminglens_spark.streaming.dsirstream import (
        dsir_adaptive_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(40).select("doc_id", "text", "lang").collect()
    )
    state = str(tmp_path / "state")
    delivered: dict[int, list[tuple]] = {}
    gauges: dict[int, dict] = {}

    class Sink:
        def publish(self, source, payload):
            gauges[payload["batchId"]] = payload

    body = dsir_adaptive_monitor(
        state,
        admitted_sink=lambda df, bid: delivered.setdefault(
            int(bid), sorted(tuple(r) for r in df.collect())
        ),
        gauge_sinks=[Sink()],
        warmup_target_features=1,  # any committed evidence ends warm-up
    )
    b0 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample[:20]],
        "doc_id long, text string, lang string",
    )
    b1 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample[20:40]],
        "doc_id long, text string, lang string",
    )
    body(b0, 0)
    body(b1, 1)
    # batch 0: zero committed evidence -> warm-up -> nothing delivered
    assert delivered[0] == []
    assert gauges[0]["warming_up"] is True
    assert gauges[0]["target_feature_mass"] == 0
    assert gauges[0]["admitted"] == 0
    # batch 0's counts still committed: batch 1 is past the floor and
    # must match the ungated adaptive verdict (model fitted on batch 0)
    assert gauges[1]["warming_up"] is False
    assert gauges[1]["target_feature_mass"] > 0
    w_pre = spark.createDataFrame(
        dsir_weights_from_counts(spark, dsir_bucket_counts(b0)).collect(),
        "warr array<bigint>",
    )
    expect1 = sorted(tuple(r) for r in dsir_admit_batch(b1, w_pre).collect())
    assert delivered[1] == expect1
    # replay of the warmed-up batch stays byte-identical (and still empty)
    del delivered[0]
    body(b0, 0)
    assert delivered[0] == []


def test_adaptive_monitor_default_skips_warmup_mass(spark, tmp_path):
    """r14 (r13 advice): at the default ``warmup_target_features=0``
    the warm-up gate is off, so the per-batch target-mass aggregation
    must not run at all -- gauges carry ``warming_up=False`` and
    ``target_feature_mass=None`` and the batch delivers the ungated
    verdict (first batch fail-opens as documented)."""
    from streaminglens_spark.streaming.dsirstream import (
        dsir_adaptive_monitor,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(10)
        .select("doc_id", "text", "lang").collect()
    )
    delivered: dict[int, int] = {}
    gauges: dict[int, dict] = {}

    class Sink:
        def publish(self, source, payload):
            gauges[payload["batchId"]] = payload

    body = dsir_adaptive_monitor(
        str(tmp_path / "state"),
        admitted_sink=lambda df, bid: delivered.setdefault(
            int(bid), df.count()
        ),
        gauge_sinks=[Sink()],
    )
    b0 = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample],
        "doc_id long, text string, lang string",
    )
    body(b0, 0)
    assert gauges[0]["warming_up"] is False
    assert gauges[0]["target_feature_mass"] is None
    # fail-open cold start unchanged: whole first batch admitted
    assert delivered[0] == len(sample)
    assert gauges[0]["admitted"] == len(sample)
