"""End-to-end streaming corpus ingest (r8): clean -> score -> incremental
near-dup vs the committed index -> quality gate -> budget admission ->
delivery, with the index increment and budget ledger committed under one
atomic marker.  Real-stream e2e plus restart/replay determinism."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.streaming.ingest import (
    INGEST_GAUGE_SOURCE,
    corpus_ingest_monitor,
    restore_ingest_state,
)
from tests.conftest import hidden_tmp

SCHEMA = "doc_id long, text string, source string"
ACCEPT_ALL = -10**9

def _doc(i, src, tag=None):
    # 20 id-derived tokens -- docs are mutually dissimilar (distinct
    # shingle sets) unless ``tag`` pins an exact copy of another doc
    seed = tag if tag is not None else i
    text = " ".join(f"w{(seed * 7 + k * 13) % 97}x{(seed + k) % 11}"
                    for k in range(20))
    return {"doc_id": i, "text": text, "source": src}


def _drive(spark, src, files, state_path, budgets=None, checkpoint=None,
           sink_log=None, quality_threshold=ACCEPT_ALL, compact_every=None):
    os.makedirs(src, exist_ok=True)
    published = []
    kw = {} if compact_every is None else {"compact_every": compact_every}
    state, body = corpus_ingest_monitor(
        state_path,
        budgets=budgets,
        quality_threshold=quality_threshold,
        **kw,
        admitted_sink=(
            (lambda df, bid: sink_log.append(
                (bid, sorted(r["doc_id"] for r in df.collect()))))
            if sink_log is not None else None
        ),
        gauge_sinks=[lambda s, g: published.append((s, g))],
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


def test_ingest_dedups_across_batches_and_admits(spark, tmp_path):
    b1 = [_doc(1, "a"), _doc(2, "a"), _doc(3, "a", tag=1), _doc(4, "b")]
    b2 = [_doc(11, "b", tag=2), _doc(12, "b")]
    sink_log = []
    state, published = _drive(
        spark, str(tmp_path / "src"),
        [("b1.json", b1), ("b2.json", b2)],
        str(tmp_path / "state"),
        sink_log=sink_log,
    )
    # batch 1: doc 3 is an exact copy of doc 1 (intra-batch dup, higher
    # id loses); 1, 2, 4 admitted
    assert sink_log[0][1] == [1, 2, 4]
    g1 = published[0][1]
    assert published[0][0] == INGEST_GAUGE_SOURCE
    assert g1["inDocs"] == 4 and g1["dupRejects"] == 1
    assert g1["qualityRejects"] == 0 and g1["admittedDocs"] == 3
    # batch 2: doc 11 duplicates doc 2 ACROSS batches (via the committed
    # index -- the corpus text is never re-read); doc 12 is new
    assert sink_log[1][1] == [12]
    g2 = published[1][1]
    assert g2["dupRejects"] == 1 and g2["admittedDocs"] == 1


def test_ingest_quality_gate_counts(spark, tmp_path):
    b1 = [_doc(1, "a"), _doc(2, "a")]
    sink_log = []
    state, published = _drive(
        spark, str(tmp_path / "src"),
        [("b1.json", b1)],
        str(tmp_path / "state"),
        sink_log=sink_log,
        quality_threshold=10**9,  # reject everything
    )
    assert sink_log[0][1] == []
    g = published[0][1]
    assert g["qualityRejects"] == 2 and g["admittedDocs"] == 0
    assert g["dupRejects"] == 0


def test_ingest_budget_restart_and_replay(spark, tmp_path):
    budgets = {"a": 25}  # 20-token docs: one full doc + the boundary doc
    b1 = [_doc(1, "a"), _doc(2, "a"), _doc(3, "a")]
    b2 = [_doc(11, "a")]
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    sink1 = []
    state1, _ = _drive(spark, src, [("b1.json", b1)], state_path,
                       budgets=budgets, checkpoint=ckpt, sink_log=sink1)
    # hash order within the batch decides which two fill the budget
    assert len(sink1[0][1]) == 2
    first_admitted = sink1[0][1]
    spent_after_b1 = dict(state1.spent)
    assert spent_after_b1["a"] >= 25  # boundary doc crossed

    # restart: ledger restores; budget exhausted -> batch 2 admits nothing
    sink2 = []
    state2, pub2 = _drive(spark, src, [("b2.json", b2)], state_path,
                          budgets=budgets, checkpoint=ckpt, sink_log=sink2)
    assert state2.spent == spent_after_b1
    assert sink2[-1][1] == []

    # replay batch 0 against a fresh monitor: identical delivery, ledger
    # unchanged (pre-batch index and pre-batch budgets reconstructed)
    replay_log = []
    state3, body = corpus_ingest_monitor(
        state_path, budgets=budgets,
        quality_threshold=ACCEPT_ALL,
        admitted_sink=lambda df, bid: replay_log.append(
            sorted(r["doc_id"] for r in df.collect())),
        spark=spark,
    )
    replay_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA
    )
    body(replay_df, 0)
    assert replay_log == [first_admitted]
    again = restore_ingest_state(spark, budgets, state_path)
    assert again.spent == spent_after_b1


def test_ingest_agrees_with_batch_exact_dedup(spark, tmp_path):
    """Cross-path pin: for exact-copy duplicates scattered across
    batches, the streaming ingest's admitted set equals the batch exact
    dedup's keeper set (min doc_id per text digest) -- the streaming
    first-wins orientation IS the batch keeper election when ids arrive
    in increasing order."""
    groups = [(0, 3), (1, 2), (2, 1), (3, 2), (4, 1), (5, 3)]
    docs, i = [], 0
    for tag, copies in groups:
        for _ in range(copies):
            docs.append(_doc(i, "a", tag=tag * 1000))
            i += 1
    batches = [docs[0:4], docs[4:8], docs[8:12]]
    sink_log = []
    _drive(
        spark, str(tmp_path / "src"),
        [(f"b{j}.json", b) for j, b in enumerate(batches)],
        str(tmp_path / "state"),
        sink_log=sink_log,
    )
    streamed_keepers = sorted(x for _, ids in sink_log for x in ids)

    all_df = spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in docs], SCHEMA
    )
    batch_keepers = sorted(
        r["keep"]
        for r in all_df.groupBy(F.md5(F.col("text").cast("binary")))
        .agg(F.min("doc_id").alias("keep"))
        .collect()
    )
    assert streamed_keepers == batch_keepers


def test_ingest_compaction_end_to_end(spark, tmp_path):
    """r9 ADVICE / r9 verdict ask #4: drive the monitor with
    compact_every=2 and pin the whole compaction contract -- a sealed
    generation appears (index + admitted + batches under one marker),
    superseded generations are deleted, compacted batch dirs are pruned
    to their markers, dedup still works against the compacted index, a
    rebuilt ledger restores byte-identically from the generation, replay
    of a compacted batch re-delivers byte-identically, and
    _committed_index(exclude_batch=...) excludes a compacted batch via
    its src_batch provenance."""
    import os as _os

    from streaminglens_spark.streaming.ingest import (
        _committed_generations,
        _committed_index,
        compact_index,
        corpus_ingest_monitor,
    )

    budgets = {"a": 1000}
    batches = [
        ("b1.json", [_doc(1, "a"), _doc(2, "a")]),
        ("b2.json", [_doc(11, "a")]),
        ("b3.json", [_doc(21, "a"), _doc(22, "a", tag=1)]),  # dup of doc 1
        ("b4.json", [_doc(31, "a")]),
        ("b5.json", [_doc(41, "a", tag=11)]),  # dup of doc 11 (compacted)
    ]
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    sink = []
    state, _ = _drive(
        spark, str(tmp_path / "src"), batches, state_path,
        budgets=budgets, checkpoint=ckpt, sink_log=sink, compact_every=2,
    )
    # dedup against compacted index: doc 22 (copy of compacted doc 1) and
    # doc 41 (copy of compacted doc 11) must have been rejected
    delivered = {d for _, ids in sink for d in ids}
    assert delivered == {1, 2, 11, 21, 31}

    # exactly ONE live generation; it carries all three tables + marker
    gens = _committed_generations(spark, state_path)
    assert len(gens) == 1
    gen = gens[0]
    for sub in ("index", "admitted", "batches", "_COMMITTED"):
        assert _os.path.exists(_os.path.join(gen.replace("file:", ""), sub)), sub
    gen_id = int(gen.rsplit("gen=", 1)[1])
    assert gen_id >= 2  # at least batches 0..2 folded by the second sweep

    # compacted batch dirs pruned to their markers; newer dirs keep data
    for name in _os.listdir(state_path):
        if not name.startswith("batch_id="):
            continue
        bid = int(name.split("=", 1)[1])
        subs = {f for f in _os.listdir(_os.path.join(state_path, name))
                if not f.startswith(".")}  # local-FS .crc sidecars
        if bid <= gen_id:
            assert subs == {"_COMMITTED"}, (name, subs)
        else:
            assert {"index", "admitted", "_COMMITTED"} <= subs

    # ledger restore from the generation is byte-identical
    again = restore_ingest_state(spark, budgets, state_path)
    assert again.spent == state.spent
    assert again.folded_batches == state.folded_batches == {0, 1, 2, 3, 4}

    # replay of a COMPACTED batch re-delivers byte-identically (its
    # pre-batch budgets come from the generation's admitted table)
    replay_log = []
    _, body = corpus_ingest_monitor(
        state_path, budgets=budgets, quality_threshold=ACCEPT_ALL,
        admitted_sink=lambda df, bid: replay_log.append(
            sorted(r["doc_id"] for r in df.collect())),
        spark=spark,
    )
    b1_docs = batches[0][1]
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1_docs], SCHEMA), 0)
    assert replay_log == [sink[0][1]]

    # src_batch provenance: excluding a compacted batch drops exactly its
    # rows from the pre-batch index view
    full = _committed_index(spark, state_path)
    b0_ids = {r["doc_id"] for r in full.collect()}
    excl = {r["doc_id"]
            for r in _committed_index(spark, state_path,
                                      exclude_batch=0).collect()}
    assert excl == b0_ids - {1, 2}

    # one pending batch (id 4) remains below compact_every: an explicit
    # compaction folds it (new gen=4, old gen deleted), and a second
    # compaction over no new batches is a no-op
    assert compact_index(spark, state_path) == 4
    assert len(_committed_generations(spark, state_path)) == 1
    assert compact_index(spark, state_path) is None
    # restore still byte-identical after the full fold
    final = restore_ingest_state(spark, budgets, state_path)
    assert final.spent == state.spent


def test_ingest_index_keeps_one_representative_per_class(spark, tmp_path):
    """r10 index hygiene: certain-duplicates (exact copies) never enter
    the index -- every md5 class is represented by exactly one row, so a
    template-heavy stream cannot grow a hot band bucket -- while later
    copies are still rejected (they match the representative)."""
    from streaminglens_spark.streaming.ingest import _committed_index

    b1 = [_doc(1, "a"), _doc(2, "a", tag=1)]    # doc 2 = exact copy of 1
    b2 = [_doc(11, "a", tag=1), _doc(12, "a")]  # 11 = copy of 1; 12 new
    state_path = str(tmp_path / "state")
    sink = []
    _drive(
        spark, str(tmp_path / "src"),
        [("b1.json", b1), ("b2.json", b2)], state_path, sink_log=sink,
    )
    delivered = {d for _, ids in sink for d in ids}
    assert delivered == {1, 12}  # copies rejected in- and cross-batch
    idx_ids = sorted(
        r["doc_id"] for r in _committed_index(spark, state_path).collect()
    )
    assert idx_ids == [1, 12]  # one representative per exact class


def test_ingest_pre_r10_index_only_generation_migrates(spark, tmp_path):
    """r10 ADVICE #1: a state dir whose latest generation was sealed by
    pre-r10 code carries ONLY the index table (no admitted/batches).
    Restore must fall back to folding the (never-pruned) per-batch
    admitted shards instead of erroring on the missing paths, replay of
    a generation-covered batch must fall back to the per-batch shard,
    and the next compaction must produce a full-ledger generation that
    folds EVERY committed batch's admitted rows."""
    import os as _os
    import shutil as _shutil

    from streaminglens_spark.streaming.ingest import (
        _committed_generations,
        compact_index,
        corpus_ingest_monitor,
    )

    budgets = {"a": 1000}
    batches = [
        ("b1.json", [_doc(1, "a"), _doc(2, "a")]),
        ("b2.json", [_doc(11, "a")]),
        ("b3.json", [_doc(21, "a")]),
    ]
    state_path = str(tmp_path / "state")
    sink = []
    state, _ = _drive(
        spark, str(tmp_path / "src"), batches, state_path,
        budgets=budgets, checkpoint=str(tmp_path / "ckpt"), sink_log=sink,
    )  # no compaction: all three batch dirs keep index+admitted shards

    # hand-build a PRE-R10 generation covering batches 0..1: index only
    # (with src_batch provenance), no admitted/batches tables; batch dirs
    # stay intact -- the pre-r10 on-disk layout
    from pyspark.sql import functions as _F
    gen_dir = _os.path.join(state_path, "compacted", "gen=1")
    parts = []
    for bid in (0, 1):
        parts.append(
            spark.read.parquet(
                _os.path.join(state_path, f"batch_id={bid}", "index")
            ).withColumn("src_batch", _F.lit(bid).cast("long"))
        )
    parts[0].unionByName(parts[1]).write.parquet(
        _os.path.join(gen_dir, "index")
    )
    open(_os.path.join(gen_dir, "_COMMITTED"), "w").close()

    # restore falls back to the per-batch ledger fold: byte-identical
    restored = restore_ingest_state(spark, budgets, state_path)
    assert restored.spent == state.spent
    assert restored.folded_batches == {0, 1, 2}

    # replay of a generation-covered batch reads its per-batch shard
    replay_log = []
    _, body = corpus_ingest_monitor(
        state_path, budgets=budgets, quality_threshold=ACCEPT_ALL,
        admitted_sink=lambda df, bid: replay_log.append(
            sorted(r["doc_id"] for r in df.collect())),
        spark=spark,
    )
    b1_docs = batches[0][1]
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1_docs], SCHEMA), 0)
    assert replay_log == [sink[0][1]]

    # the next compaction migrates: ONE full-ledger generation folding
    # every committed batch's admitted rows, batch dirs pruned
    assert compact_index(spark, state_path) == 2
    gens = _committed_generations(spark, state_path)
    assert len(gens) == 1 and gens[0].endswith("gen=2")
    local_gen = gens[0].replace("file:", "")
    for sub in ("index", "admitted", "batches"):
        assert _os.path.exists(_os.path.join(local_gen, sub)), sub
    migrated = restore_ingest_state(spark, budgets, state_path)
    assert migrated.spent == state.spent
    assert migrated.folded_batches == {0, 1, 2}
    for name in _os.listdir(state_path):
        if name.startswith("batch_id="):
            subs = {f for f in _os.listdir(_os.path.join(state_path, name))
                    if not f.startswith(".")}
            assert subs == {"_COMMITTED"}, (name, subs)
    _shutil.rmtree(str(tmp_path / "src"))


def test_ingest_compaction_reclaims_interrupted_prune(spark, tmp_path):
    """r10 ADVICE #2: a crash between sealing a generation and its
    post-seal prune loop leaves the folded batch dirs holding their
    index/admitted shards forever.  The next compact_index call -- even
    one with nothing new to fold -- must reclaim them (only under a
    full-ledger generation; the migration test pins the pre-r10 case
    where those shards must survive)."""
    import os as _os

    from streaminglens_spark.streaming.ingest import compact_index

    budgets = {"a": 1000}
    state_path = str(tmp_path / "state")
    state, _ = _drive(
        spark, str(tmp_path / "src"),
        [("b1.json", [_doc(1, "a")]), ("b2.json", [_doc(11, "a")])],
        state_path, budgets=budgets, checkpoint=str(tmp_path / "ckpt"),
    )
    assert compact_index(spark, state_path) == 1

    # simulate the interrupted prune: re-materialize leaked shard files
    # under an already-compacted batch dir (content is irrelevant -- the
    # reclaim is an unconditional recursive delete)
    leaked = _os.path.join(state_path, "batch_id=0", "index")
    _os.makedirs(leaked, exist_ok=True)
    open(_os.path.join(leaked, "part-leak.parquet"), "w").close()
    leaked_adm = _os.path.join(state_path, "batch_id=0", "admitted")
    _os.makedirs(leaked_adm, exist_ok=True)
    open(_os.path.join(leaked_adm, "part-leak.parquet"), "w").close()

    # nothing new to compact, but the cleanup pass still reclaims
    assert compact_index(spark, state_path) is None
    subs = {f for f in _os.listdir(_os.path.join(state_path, "batch_id=0"))
            if not f.startswith(".")}
    assert subs == {"_COMMITTED"}, subs
    # ledger untouched by the reclaim
    assert restore_ingest_state(spark, budgets, state_path).spent == state.spent
