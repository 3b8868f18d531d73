"""Mixture-tracking streaming admission (r11, r10 verdict ask #5): the
budget monitor's static dict replaced by temperature targets recomputed
per batch from the cumulative per-stratum seen-token manifest.  Pins:
driver-side target math is bit-compatible with the Spark operator, a
low-resource source's share is up-weighted as richer sources flood in,
and the durable ledger keeps the exactly-once contract (restart restores
bit-identically, replay re-delivers byte-identically)."""

from __future__ import annotations

import json
import os

from streaminglens_spark.streaming.budget import (
    MIXTURE_GAUGE_SOURCE,
    mixture_admission_monitor,
    restore_mixture_state,
    temperature_targets,
)

SCHEMA = "doc_id long, text string, source string"


def _doc(i, src, toks=10):
    return {"doc_id": i, "text": " ".join(["w"] * toks), "source": src}


def _run(spark, src, files, total_tokens, shard_path=None, checkpoint=None,
         sink_log=None):
    os.makedirs(src, exist_ok=True)
    published = []
    state, body = mixture_admission_monitor(
        total_tokens,
        admitted_sink=(
            (lambda df, bid: sink_log.append(
                (bid, sorted(r["doc_id"] for r in df.collect()))))
            if sink_log is not None else None
        ),
        gauge_sinks=[lambda s, g: published.append((s, g))],
        shard_path=shard_path,
        spark=spark,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    writer = stream.writeStream.foreachBatch(body).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    try:
        for name, recs in files:
            path = os.path.join(src, name)
            with open(path + ".tmp", "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
            os.rename(path + ".tmp", path)
            q.processAllAvailable()
    finally:
        q.stop()
    return state, published


def test_targets_match_spark_operator_bit_exactly(spark):
    """temperature_targets (driver-side, Decimal HALF_UP + sequential
    float fold) must produce the identical (weight-derived) targets as
    temperature_mixture_plan (Spark-side) on the same counts -- the
    streaming admission and the batch planner can never disagree."""
    from streaminglens_spark.functions.sampling import temperature_mixture_plan

    # awkward counts: primes, a dominant stratum, a tiny one
    counts = {"a": 7, "b": 12345, "c": 999983, "d": 40}
    total = 1_234_567
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), s)
         for i, (s, n) in enumerate(counts.items())],
        SCHEMA,
    )
    plan = {
        r["stratum"]: r["target_tokens"]
        for r in temperature_mixture_plan(docs, total).collect()
    }
    assert plan == temperature_targets(counts, total)


def test_low_resource_share_up_weights_as_stream_grows(spark, tmp_path):
    """The ask's acceptance scenario: source 'low' arrives once, then
    'big' floods batch after batch.  The recomputed targets must hold
    low's BUDGET share strictly above its shrinking token share, and
    low's share of the sqrt-temperature mixture must GROW relative to
    proportional allocation as the imbalance widens."""
    total = 400
    batches = [
        ("b1.json", [_doc(1, "low", toks=20), _doc(2, "big", toks=80)]),
        ("b2.json", [_doc(11, "big", toks=300)]),
        ("b3.json", [_doc(21, "big", toks=620)]),
    ]
    state, published = _run(
        spark, str(tmp_path / "src"), batches, total,
        shard_path=str(tmp_path / "ledger"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert state.seen == {"low": 20, "big": 1000}
    assert all(s == MIXTURE_GAUGE_SOURCE for s, _ in published)
    # targets after each batch (the live budgets the batch admitted under)
    shares = []
    for seen in ({"low": 20, "big": 80}, {"low": 20, "big": 380},
                 {"low": 20, "big": 1000}):
        t = temperature_targets(seen, total)
        token_share = seen["low"] / (seen["low"] + seen["big"])
        budget_share = t["low"] / (t["low"] + t["big"])
        assert budget_share > token_share  # up-weighted at every step
        shares.append((budget_share, token_share))
    # the up-weighting RATIO widens as the imbalance grows
    ratios = [b / t for b, t in shares]
    assert ratios[0] < ratios[1] < ratios[2]
    # and the final ledger's budgets are exactly the final targets
    assert state.budgets == temperature_targets(state.seen, total)


def test_mixture_ledger_restart_and_replay_exactly_once(spark, tmp_path):
    """Kill/restart rebuilds seen + spent bit-identically from the
    committed two-table shards; a replayed batch re-delivers the
    byte-identical admitted set under the SAME recomputed targets and
    double-counts neither manifest nor ledger."""
    total = 100
    b1 = [_doc(1, "a", toks=30), _doc(2, "b", toks=30)]
    b2 = [_doc(11, "a", toks=40), _doc(12, "b", toks=40)]
    shard_path = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    sink1 = []
    state1, _ = _run(spark, src, [("b1.json", b1)], total,
                     shard_path=shard_path, checkpoint=ckpt, sink_log=sink1)

    # restart: fresh monitor restores seen AND spent; b2 admits under the
    # targets recomputed from the grown manifest
    sink2 = []
    state2, _ = _run(spark, src, [("b2.json", b2)], total,
                     shard_path=shard_path, checkpoint=ckpt, sink_log=sink2)
    assert state2.seen == {"a": 70, "b": 70}
    restored = restore_mixture_state(spark, total, 1, shard_path)
    assert restored.seen == state2.seen
    assert restored.spent == state2.spent
    assert restored.folded_batches == {0, 1}

    # replay batch 0: byte-identical delivery, nothing double-counted
    replay_log = []
    _, body = mixture_admission_monitor(
        total,
        admitted_sink=lambda df, bid: replay_log.append(
            sorted(r["doc_id"] for r in df.collect())),
        shard_path=shard_path,
        spark=spark,
    )
    replay_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA
    )
    body(replay_df, 0)
    assert replay_log == [sink1[0][1]]
    again = restore_mixture_state(spark, total, 1, shard_path)
    assert again.seen == state2.seen and again.spent == state2.spent
