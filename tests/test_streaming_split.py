"""Streaming leakage-safe split assignment (r11): attachment-time
(root, train/val) assignment at ingest.  Pins: root election across
batches and within a batch (transitive chains), the attachment guarantee
(a matching doc inherits an earlier root and its side), the split hash
being the batch operator's formula, conflict detection, and the durable
exactly-once contract (restart needs no driver state; replay re-delivers
byte-identically)."""

from __future__ import annotations

import json
import os

from streaminglens_spark.functions.sampling import _threshold
from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P
from streaminglens_spark.streaming.split import (
    SPLIT_GAUGE_SOURCE,
    assign_splits_of_batch,
    split_assignment_monitor,
)
from tests.conftest import hidden_tmp

SCHEMA = "doc_id long, text string"


def _doc(i, tag=None):
    seed = tag if tag is not None else i
    text = " ".join(f"w{(seed * 7 + k * 13) % 97}x{(seed + k) % 11}"
                    for k in range(20))
    return {"doc_id": i, "text": text}


def _side(root, val_frac=0.2):
    return "val" if (HASH_A * root + HASH_B) % HASH_P < _threshold(
        val_frac
    ) else "train"


def _drive(spark, src, files, state_path, checkpoint=None, sink_log=None):
    os.makedirs(src, exist_ok=True)
    published = []
    body = split_assignment_monitor(
        state_path,
        assigned_sink=(
            (lambda df, bid: sink_log.append(
                (bid, sorted((r["doc_id"], r["root"], r["split"],
                              r["attached"]) for r in df.collect()))))
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
    return body, published


def test_split_roots_and_sides_across_batches(spark, tmp_path):
    """Exact-copy groups scattered across batches: every copy inherits
    the group's earliest id as root (attached=True) and the root's hash
    side; singletons root themselves.  In-batch transitive chains (C
    matches B matches A, all new) collapse to one root."""
    b1 = [_doc(1), _doc(2), _doc(3, tag=1)]          # 3 copies 1
    b2 = [_doc(11, tag=2), _doc(12),                  # 11 copies 2
          _doc(13, tag=13), _doc(14, tag=13)]         # 13~14 in-batch pair
    sink = []
    _, published = _drive(
        spark, str(tmp_path / "src"),
        [("b1.json", b1), ("b2.json", b2)],
        str(tmp_path / "state"), sink_log=sink,
    )
    assert published and all(s == SPLIT_GAUGE_SOURCE for s, _ in published)
    want_b1 = sorted([
        (1, 1, _side(1), False),
        (2, 2, _side(2), False),
        (3, 1, _side(1), True),
    ])
    want_b2 = sorted([
        (11, 2, _side(2), True),      # cross-batch attachment
        (12, 12, _side(12), False),
        (13, 13, _side(13), False),   # in-batch pair roots at min id
        (14, 13, _side(13), True),
    ])
    assert sink[0][1] == want_b1
    assert sink[1][1] == want_b2
    g2 = published[1][1]
    assert g2["assignedDocs"] == 4 and g2["attachedDocs"] == 2
    assert g2["splitConflicts"] == 0
    assert g2["valDocs"] + g2["trainDocs"] == 4


def test_split_conflict_detection_unit(spark):
    """A batch doc matching two already-assigned roots that sit on
    DIFFERENT sides: the min root wins and the cluster is counted as a
    conflict (fabricated roots table -- the only way to force opposite
    sides deterministically)."""
    d = _doc(100, tag=77)
    batch = spark.createDataFrame([(d["doc_id"], d["text"])], SCHEMA)
    # index: docs 1 and 2 carry the SAME text as doc 100 (identical
    # sketches -> certain matches to both)
    from streaminglens_spark.functions.dedup import minhash_index

    idx = minhash_index(
        spark.createDataFrame([(1, d["text"]), (2, d["text"])], SCHEMA)
    )
    roots = spark.createDataFrame(
        [(1, 1, "val"), (2, 2, "train")],
        "doc_id long, root long, split string",
    )
    from streaminglens_spark import cache

    try:
        assigned, _ = assign_splits_of_batch(batch, idx, roots)
        rows = assigned.collect()
    finally:
        cache.release_caches()
    assert len(rows) == 1
    r = rows[0]
    assert r["root"] == 1 and r["attached"] and r["_conflict"]


def test_split_restart_and_replay_exactly_once(spark, tmp_path):
    """Restart: a FRESH monitor (no driver state) continues from the
    committed roots tables -- cross-batch attachment still resolves.
    Replay of a committed batch recomputes from the pre-batch view and
    re-delivers byte-identically; the roots tables are unchanged."""
    b1 = [_doc(1), _doc(2)]
    b2 = [_doc(11, tag=1)]
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    sink1 = []
    _drive(spark, src, [("b1.json", b1)], state_path,
           checkpoint=ckpt, sink_log=sink1)
    sink2 = []
    _drive(spark, src, [("b2.json", b2)], state_path,
           checkpoint=ckpt, sink_log=sink2)
    assert sink2[-1][1] == [(11, 1, _side(1), True)]

    # replay batch 0 against yet another fresh monitor: byte-identical
    replay_log = []
    body = split_assignment_monitor(
        state_path,
        assigned_sink=lambda df, bid: replay_log.append(
            sorted((r["doc_id"], r["root"], r["split"], r["attached"])
                   for r in df.collect())),
    )
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b1], SCHEMA), 0)
    assert replay_log == [sink1[0][1]]
    # roots tables untouched by the replay (no new shard written)
    batch_dirs = [n for n in os.listdir(state_path)
                  if n.startswith("batch_id=")]
    assert sorted(batch_dirs) == ["batch_id=0", "batch_id=1"]


def test_split_index_hygiene_one_rep_per_class(spark, tmp_path):
    """Exact copies never enter the index (the r10 hot-bucket rule) but
    DO get roots -- a template stream keeps healthy buckets while every
    copy still lands on the template's side."""
    from streaminglens_spark.streaming.ingest import _committed_batch_dirs

    b1 = [_doc(1), _doc(2, tag=1)]
    b2 = [_doc(11, tag=1), _doc(12)]
    state_path = str(tmp_path / "state")
    sink = []
    _drive(spark, str(tmp_path / "src"),
           [("b1.json", b1), ("b2.json", b2)], state_path, sink_log=sink)
    dirs = _committed_batch_dirs(spark, state_path)
    idx_ids = sorted(
        r["doc_id"]
        for d in dirs
        for r in spark.read.parquet(f"{d}/index").collect()
    )
    assert idx_ids == [1, 12]  # one representative per exact class
    root_ids = sorted(
        r["doc_id"]
        for d in dirs
        for r in spark.read.parquet(f"{d}/roots").collect()
    )
    assert root_ids == [1, 2, 11, 12]  # every doc assigned
    assert sink[1][1][0] == (11, 1, _side(1), True)


def test_split_compaction(spark, tmp_path):
    """r11 ADVICE: with compact_every=2 the index/roots shards fold into
    one generation -- assignments stay bit-identical to the uncompacted
    run (cross-batch attachment still works from the generation-backed
    index), batch dirs are pruned to their markers, and a replayed
    COMPACTED batch re-delivers byte-identically (src_batch exclusion)."""
    b1 = [_doc(1), _doc(2), _doc(3, tag=1)]
    b2 = [_doc(11, tag=2), _doc(12)]
    b3 = [_doc(21, tag=1), _doc(22, tag=12)]  # attach to gen-held roots
    src = str(tmp_path / "src")
    state_path = str(tmp_path / "state")
    os.makedirs(src, exist_ok=True)
    sink = []
    body = split_assignment_monitor(
        state_path,
        assigned_sink=lambda df, bid: sink.append(
            (bid, sorted((r["doc_id"], r["root"], r["split"],
                          r["attached"]) for r in df.collect()))),
        compact_every=2,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").json(src)
    )
    q = (stream.writeStream.foreachBatch(body).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        for name, recs in [("b1.json", b1), ("b2.json", b2),
                           ("b3.json", b3)]:
            path = os.path.join(src, name)
            with open(hidden_tmp(path), "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
            os.rename(hidden_tmp(path), path)
            q.processAllAvailable()
    finally:
        q.stop()
    # batch 3 attaches to roots held ONLY by the generation: doc 21 to
    # root 1 (copies of doc 1), doc 22 to root 12
    assert sink[2][1] == sorted([
        (21, 1, _side(1), True),
        (22, 12, _side(12), True),
    ])
    gens = os.listdir(os.path.join(state_path, "compacted"))
    assert len(gens) == 1 and gens[0].startswith("gen=")
    gen_id = int(gens[0].split("=")[1])
    for n in os.listdir(state_path):
        if not n.startswith("batch_id="):
            continue
        bid = int(n.split("=")[1])
        entries = os.listdir(os.path.join(state_path, n))
        if bid <= gen_id:
            assert "index" not in entries and "roots" not in entries
        assert "_COMMITTED" in entries
    # replay a COMPACTED batch: byte-identical re-delivery, no rewrite
    replay_log = []
    body2 = split_assignment_monitor(
        state_path,
        assigned_sink=lambda df, bid: replay_log.append(
            sorted((r["doc_id"], r["root"], r["split"], r["attached"])
                   for r in df.collect())),
        compact_every=2,
    )
    body2(spark.createDataFrame(
        [(d["doc_id"], d["text"]) for d in b2], SCHEMA), 1)
    assert replay_log == [sink[1][1]]
