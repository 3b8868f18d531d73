"""Streaming token-budget admission (r8): the ledger admits per-stratum
until budgets exhaust (boundary doc kept, the batch operator's
contract), gauges publish per batch, and with shard_path the ledger is
durable -- kill/restart rebuilds it bit-identically and a REPLAYED batch
re-delivers the byte-identical admitted set without double-counting."""

from __future__ import annotations

import json
import os

from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P
from streaminglens_spark.streaming.budget import (
    BUDGET_GAUGE_SOURCE,
    budget_admission_monitor,
    restore_budget_state,
)
from tests.conftest import hidden_tmp

SCHEMA = "doc_id long, text string, source string"


def _hash_order(ids):
    return sorted(ids, key=lambda i: ((HASH_A * i + HASH_B) % HASH_P, i))


def _doc(i, src, toks=10):
    return {"doc_id": i, "text": " ".join(["w"] * toks), "source": src}


def _run(spark, src, files, budgets, shard_path=None, checkpoint=None,
         sink_log=None):
    os.makedirs(src, exist_ok=True)
    published = []
    state, body = budget_admission_monitor(
        budgets,
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
            with open(hidden_tmp(path), "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
            os.rename(hidden_tmp(path), path)
            q.processAllAvailable()
    finally:
        q.stop()
    return state, published


def test_admission_respects_budgets_and_boundary(spark, tmp_path):
    b1 = [_doc(1, "a"), _doc(2, "a"), _doc(3, "b")]
    b2 = [_doc(4, "a"), _doc(5, "a"), _doc(6, "b")]
    sink_log = []
    state, published = _run(
        spark, str(tmp_path / "src"),
        [("b1.json", b1), ("b2.json", b2)],
        {"a": 25, "b": 6},
        sink_log=sink_log,
    )
    # batch 1: both a-docs admitted (prefixes 0, 10 < 25); b admits its
    # boundary doc (prefix 0 < 6 -> cum 10) and exhausts
    assert sink_log[0][1] == [1, 2, 3]
    # batch 2: a has 20/25 spent -> first a-doc in hash order crosses the
    # boundary (prefix 20 < 25) and is kept, the second (prefix 30) is
    # not; b is exhausted
    expect_a = _hash_order([4, 5])[0]
    assert sink_log[1][1] == [expect_a]
    assert state.spent == {"a": 30, "b": 10}
    g = published[-1][1]
    assert published[-1][0] == BUDGET_GAUGE_SOURCE
    assert g["exhaustedStrata"] == 2 and g["openStrata"] == 0
    # a third batch admits nothing
    assert state.remaining() == {}


def test_ledger_survives_restart_and_replay(spark, tmp_path):
    budgets = {"a": 25, "b": 6}
    b1 = [_doc(1, "a"), _doc(2, "a"), _doc(3, "b")]
    b2 = [_doc(4, "a"), _doc(5, "a"), _doc(6, "b")]
    shard_path = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    sink1 = []
    state1, _ = _run(spark, src, [("b1.json", b1)], budgets,
                     shard_path=shard_path, checkpoint=ckpt, sink_log=sink1)
    assert state1.spent == {"a": 20, "b": 10}

    # restart: fresh monitor restores the ledger; only b2 is new
    sink2 = []
    state2, _ = _run(spark, src, [("b2.json", b2)], budgets,
                     shard_path=shard_path, checkpoint=ckpt, sink_log=sink2)
    assert state2.batches == 2
    assert state2.spent == {"a": 30, "b": 10}
    expect_a = _hash_order([4, 5])[0]
    assert sink2[-1][1] == [expect_a]

    # replay batch 1 against a restored monitor: the admitted set is
    # byte-identical to the original delivery and the ledger unchanged
    restored = restore_budget_state(spark, budgets, shard_path)
    assert restored.spent == {"a": 30, "b": 10}
    replay_log = []
    _, body = budget_admission_monitor(
        budgets,
        admitted_sink=lambda df, bid: replay_log.append(
            sorted(r["doc_id"] for r in df.collect())),
        shard_path=shard_path,
        spark=spark,
    )
    replay_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA
    )
    body(replay_df, 0)  # batch_id 0 was b1
    assert replay_log == [[1, 2, 3]]  # identical re-delivery
    again = restore_budget_state(spark, budgets, shard_path)
    assert again.spent == {"a": 30, "b": 10}  # no double count
