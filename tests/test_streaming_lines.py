"""Streaming cross-document line dedup (r11): first-occurrence line
keepers across the stream's history.  Pins: bit-parity with the batch
operator over the concatenated corpus (ids increasing across batches),
the dup-line gauges, and the durable exactly-once contract (restart
needs no driver state; replay re-delivers byte-identically)."""

from __future__ import annotations

import json
import os

from streaminglens_spark.streaming.lines import (
    LINES_GAUGE_SOURCE,
    line_dedup_monitor,
)
from tests.conftest import hidden_tmp

SCHEMA = "doc_id long, text string"


def _drive(spark, src, files, state_path, checkpoint=None, sink_log=None):
    os.makedirs(src, exist_ok=True)
    published = []
    body = line_dedup_monitor(
        state_path,
        cleaned_sink=(
            (lambda df, bid: sink_log.append(
                (bid, sorted(tuple(r) for r in df.collect()))))
            if sink_log is not None else None
        ),
        gauge_sinks=[lambda s, g: published.append((s, g))],
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
    return published


BATCHES = [
    ("b1.json", [
        {"doc_id": 1, "text": "alpha\nshared\nalpha"},
        {"doc_id": 2, "text": "shared\nbeta"},
    ]),
    ("b2.json", [
        {"doc_id": 11, "text": "shared\ngamma"},   # 'shared' seen in b1
        {"doc_id": 12, "text": "beta"},            # fully emptied
    ]),
    ("b3.json", [
        {"doc_id": 21, "text": "gamma\ndelta\nalpha"},
    ]),
]


def test_stream_matches_batch_operator_bit_for_bit(spark, tmp_path):
    """Per-doc digests from the stream equal the batch line_dedup over
    the concatenated corpus -- the earliest batch holding a line owns
    its global keeper when ids increase across batches."""
    from streaminglens_spark.functions.text import line_dedup

    sink = []
    published = _drive(
        spark, str(tmp_path / "src"), BATCHES, str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"), sink_log=sink,
    )
    streamed = sorted(t for _, rows in sink for t in rows)
    alldocs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for _, recs in BATCHES for d in recs],
        SCHEMA,
    )
    batch = sorted(tuple(r) for r in line_dedup(alldocs).collect())
    assert streamed == batch
    assert all(s == LINES_GAUGE_SOURCE for s, _ in published)
    g2 = published[1][1]  # batch 2: 3 lines in, 1 kept (gamma), doc 12 emptied
    assert (g2["inLines"], g2["keptLines"], g2["dupLines"]) == (3, 1, 2)
    assert g2["emptiedDocs"] == 1


def test_stream_lines_restart_and_replay(spark, tmp_path):
    """A fresh monitor (no driver state) continues against the committed
    line state; replaying a committed batch re-delivers byte-identically
    without writing a new shard."""
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    sink1 = []
    _drive(spark, src, BATCHES[:1], state_path,
           checkpoint=ckpt, sink_log=sink1)
    sink2 = []
    _drive(spark, src, BATCHES[1:2], state_path,
           checkpoint=ckpt, sink_log=sink2)
    # 'shared' (kept in batch 0) and 'beta' are dups for the restarted
    # monitor: doc 11 keeps only gamma, doc 12 empties
    import hashlib
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert sink2[-1][1] == sorted([
        (11, 2, 1, 5, md5("gamma")),
        (12, 1, 0, 0, md5("")),
    ])

    replay_log = []
    body = line_dedup_monitor(
        state_path,
        cleaned_sink=lambda df, bid: replay_log.append(
            sorted(tuple(r) for r in df.collect())),
    )
    b1 = BATCHES[0][1]
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b1], SCHEMA), 0)
    assert replay_log == [sink1[0][1]]
    dirs = [n for n in os.listdir(state_path) if n.startswith("batch_id=")]
    assert sorted(dirs) == ["batch_id=0", "batch_id=1"]


def test_stream_lines_compaction(spark, tmp_path):
    """r11 ADVICE: with compact_every=2 the lines shards fold into one
    generation -- verdicts stay bit-identical to the uncompacted run,
    batch dirs are pruned to their markers, a replayed COMPACTED batch
    still re-delivers byte-identically (src_batch exclusion), and a
    restart continues against the generation."""
    state_path = str(tmp_path / "state")
    src = str(tmp_path / "src")
    sink = []
    published = []
    body = line_dedup_monitor(
        state_path,
        cleaned_sink=lambda df, bid: sink.append(
            (bid, sorted(tuple(r) for r in df.collect()))),
        gauge_sinks=[lambda s, g: published.append((s, g))],
        compact_every=2,
    )
    import json as _json
    os.makedirs(src, exist_ok=True)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").json(src)
    )
    q = (stream.writeStream.foreachBatch(body).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        for name, recs in BATCHES:
            path = os.path.join(src, name)
            with open(hidden_tmp(path), "w") as f:
                for r in recs:
                    f.write(_json.dumps(r) + "\n")
            os.rename(hidden_tmp(path), path)
            q.processAllAvailable()
    finally:
        q.stop()
    # same verdicts as the uncompacted run (bit-parity with batch op)
    from streaminglens_spark.functions.text import line_dedup
    alldocs = spark.createDataFrame(
        [(d["doc_id"], d["text"]) for _, recs in BATCHES for d in recs],
        SCHEMA,
    )
    assert sorted(t for _, rows in sink for t in rows) == sorted(
        tuple(r) for r in line_dedup(alldocs).collect()
    )
    # a generation exists and the folded dirs are pruned to markers
    gens = os.listdir(os.path.join(state_path, "compacted"))
    assert len(gens) == 1 and gens[0].startswith("gen=")
    gen_id = int(gens[0].split("=")[1])
    assert gen_id >= 1
    for n in os.listdir(state_path):
        if not n.startswith("batch_id="):
            continue
        bid = int(n.split("=")[1])
        entries = os.listdir(os.path.join(state_path, n))
        if bid <= gen_id:
            assert "lines" not in entries  # pruned
        assert "_COMMITTED" in entries  # marker never disappears
    # replay a COMPACTED batch: byte-identical re-delivery
    replay_log = []
    body2 = line_dedup_monitor(
        state_path,
        cleaned_sink=lambda df, bid: replay_log.append(
            sorted(tuple(r) for r in df.collect())),
        compact_every=2,
    )
    b1 = BATCHES[0][1]
    body2(spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b1], SCHEMA), 0)
    assert replay_log == [sink[0][1]]
    # restart: a FRESH batch against the generation-backed state
    body2(spark.createDataFrame(
        [(31, "delta\nomega")], SCHEMA), 3)
    assert replay_log[-1] == [
        (31, 2, 1, 5,
         __import__("hashlib").md5(b"omega").hexdigest()),
    ]
