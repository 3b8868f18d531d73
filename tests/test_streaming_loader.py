"""The composed streaming loader monitor (r12, r11 verdict ask #4):
admission -> split -> training order per batch under ONE atomic marker.
Pins: compositional parity with the standalone monitors (the admission
equals corpus_ingest_monitor's on the same stream; the split equals
split_assignment_monitor's), the append-only dense training order, the
one-marker/four-table durability layout, restart restoring the ledger
and counter bit-identically, and byte-identical replay."""

from __future__ import annotations

import json
import os

from streaminglens_spark.streaming.loader import (
    LOADER_GAUGE_SOURCE,
    loader_ingest_monitor,
    restore_loader_state,
)
from tests.conftest import hidden_tmp, SF_DIR

SCHEMA = "doc_id long, text string, source string"
ACCEPT_ALL = -10**9


def _doc(i, src, tag=None):
    seed = tag if tag is not None else i
    text = " ".join(f"w{(seed * 7 + k * 13) % 97}x{(seed + k) % 11}"
                    for k in range(20))
    return {"doc_id": i, "text": text, "source": src}


def _drive(spark, src, files, state_path, budgets=None, checkpoint=None,
           train_log=None, assigned_log=None,
           quality_threshold=ACCEPT_ALL, compact_every=None):
    os.makedirs(src, exist_ok=True)
    published = []
    kw = {} if compact_every is None else {"compact_every": compact_every}
    state, body = loader_ingest_monitor(
        state_path,
        budgets=budgets,
        quality_threshold=quality_threshold,
        train_sink=(
            (lambda df, bid: train_log.append(
                (bid, sorted(tuple(r) for r in df.collect()))))
            if train_log is not None else None
        ),
        assigned_sink=(
            (lambda df, bid: assigned_log.append(
                (bid, sorted(tuple(r) for r in df.collect()))))
            if assigned_log is not None else None
        ),
        gauge_sinks=[lambda s, g: published.append((s, g))],
        spark=spark,
        **kw,
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


BATCHES = [
    ("b1.json", [_doc(1, "web"), _doc(2, "web"), _doc(3, "code", tag=1)]),
    ("b2.json", [_doc(11, "web", tag=2), _doc(12, "code"),
                 _doc(13, "web")]),
    ("b3.json", [_doc(21, "code"), _doc(22, "web", tag=13)]),
]


def test_loader_composition_matches_standalone_monitors(spark, tmp_path):
    """The composed monitor's admission must equal corpus_ingest_monitor's
    on the same stream (same docs admitted, same ledger), and its (root,
    split) assignment must equal split_assignment_monitor's -- with the
    training order a dense 0..n-1 append in (batch, doc_id) arrival order
    over the admitted train docs, shard = pos % n_shards."""
    from streaminglens_spark.streaming.ingest import corpus_ingest_monitor
    from streaminglens_spark.streaming.split import split_assignment_monitor

    budgets = {"web": 200, "code": 200}
    train_log, assigned_log = [], []
    state, published = _drive(
        spark, str(tmp_path / "src"), BATCHES, str(tmp_path / "state"),
        budgets=budgets, checkpoint=str(tmp_path / "ckpt"),
        train_log=train_log, assigned_log=assigned_log,
    )
    assert published and all(s == LOADER_GAUGE_SOURCE for s, _ in published)

    # standalone admission over the same batches
    ing_admitted = []
    ing_state, ing_body = corpus_ingest_monitor(
        str(tmp_path / "ing-state"), budgets=budgets,
        quality_threshold=ACCEPT_ALL,
        admitted_sink=lambda df, bid: ing_admitted.append(
            (bid, sorted(r["doc_id"] for r in df.collect()))),
        spark=spark,
    )
    # standalone split over the same batches
    sp_assigned = []
    sp_body = split_assignment_monitor(
        str(tmp_path / "sp-state"),
        assigned_sink=lambda df, bid: sp_assigned.append(
            (bid, sorted((r["doc_id"], r["root"], r["split"]) for r in
                         df.collect()))),
    )
    for bid, (_, recs) in enumerate(BATCHES):
        bdf = spark.createDataFrame(
            [(d["doc_id"], d["text"], d["source"]) for d in recs], SCHEMA
        )
        ing_body(bdf, bid)
        sp_body(bdf.select("doc_id", "text"), bid)

    # admission parity: same admitted ids per batch, same final ledger
    got_train_ids = {bid: [t[0] for t in rows] for bid, rows in train_log}
    got_assigned = {
        bid: sorted((d, r, s) for d, r, s, _ in rows)
        for bid, rows in assigned_log
    }
    # loader admits the same docs the standalone admission admits
    # (train_log only holds the train side; recover the full admitted
    # set from the ledger + split sides)
    sides = {d: s for rows in got_assigned.values() for d, _, s in rows}
    for bid, ids in ing_admitted:
        loader_train = [d for d in ids if sides[d] == "train"]
        assert got_train_ids.get(bid, []) == sorted(loader_train), bid
    assert state.spent == ing_state.spent

    # split parity: identical (doc, root, side) triples per batch.  The
    # composed monitor matches on CLEANED text; on this fixture (no PII /
    # boilerplate injected) cleaning is identity, so verdicts coincide.
    for bid, rows in sp_assigned:
        assert got_assigned[bid] == rows, bid

    # order: dense positions in arrival order, round-robin shards
    flat = [t for _, rows in train_log for t in rows]
    flat.sort(key=lambda t: t[2])
    assert [t[2] for t in flat] == list(range(len(flat)))
    assert all(t[3] == t[2] % 32 for t in flat)
    # arrival order: positions sorted == (batch, doc_id) sorted
    by_pos_ids = [t[0] for t in flat]
    arrival = [d for _, rows in sorted(
        ((bid, rows) for bid, rows in train_log)) for d in
        sorted(t[0] for t in rows)]
    assert by_pos_ids == arrival


def test_loader_one_marker_four_tables(spark, tmp_path):
    """Durability layout: per committed batch exactly one _COMMITTED
    marker sealing index + admitted + roots + order together."""
    state_path = str(tmp_path / "state")
    _drive(spark, str(tmp_path / "src"), BATCHES, state_path,
           budgets={"web": 200, "code": 200},
           checkpoint=str(tmp_path / "ckpt"))
    dirs = [n for n in os.listdir(state_path) if n.startswith("batch_id=")]
    assert sorted(dirs) == ["batch_id=0", "batch_id=1", "batch_id=2"]
    for n in dirs:
        entries = set(os.listdir(os.path.join(state_path, n)))
        assert "_COMMITTED" in entries
        assert {"index", "admitted", "roots", "order"} <= entries


def test_loader_restart_and_replay_exactly_once(spark, tmp_path):
    """Kill/restart: a fresh monitor restores ledger + folded set + order
    counter from the committed shards and continues bit-identically; a
    replayed batch re-delivers the byte-identical train set (same
    positions) without writing a shard or double-counting the ledger."""
    budgets = {"web": 200, "code": 200}
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    t1 = []
    state1, _ = _drive(spark, src, BATCHES[:2], state_path, budgets=budgets,
                       checkpoint=ckpt, train_log=t1)
    t2 = []
    state2, pub2 = _drive(spark, src, BATCHES[2:], state_path,
                          budgets=budgets, checkpoint=ckpt, train_log=t2)
    restored = restore_loader_state(spark, budgets, state_path)
    assert restored.spent == state2.spent
    assert restored.folded_batches == {0, 1, 2}
    # order counter continued where batch 1 left off
    prev_max = max(t[2] for _, rows in t1 for t in rows)
    new_min = min(t[2] for _, rows in t2 for t in rows)
    assert new_min == prev_max + 1
    # gauges carry the running high-water mark
    assert pub2[-1][1]["trainPositions"] == new_min + len(t2[-1][1])

    # replay batch 0: byte-identical train delivery, no double-count
    replay = []
    _, body = loader_ingest_monitor(
        state_path, budgets=budgets, quality_threshold=ACCEPT_ALL,
        train_sink=lambda df, bid: replay.append(
            sorted(tuple(r) for r in df.collect())),
        spark=spark,
    )
    b1 = BATCHES[0][1]
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA), 0)
    assert replay == [t1[0][1]]
    again = restore_loader_state(spark, budgets, state_path)
    assert again.spent == state2.spent


def test_loader_compaction_keeps_replay(spark, tmp_path):
    """With compact_every=2 the four tables fold into one generation;
    a replayed compacted batch still re-delivers byte-identically (the
    ledger subtraction reads the generation's src_batch rows) and a
    post-compaction batch still attaches to generation-held state."""
    budgets = {"web": 200, "code": 200}
    state_path = str(tmp_path / "state")
    t1 = []
    _drive(spark, str(tmp_path / "src"), BATCHES, state_path,
           budgets=budgets, checkpoint=str(tmp_path / "ckpt"),
           train_log=t1, compact_every=2)
    gens = os.listdir(os.path.join(state_path, "compacted"))
    assert len(gens) == 1 and gens[0].startswith("gen=")
    gen_id = int(gens[0].split("=")[1])
    for n in os.listdir(state_path):
        if not n.startswith("batch_id="):
            continue
        bid = int(n.split("=")[1])
        entries = os.listdir(os.path.join(state_path, n))
        assert "_COMMITTED" in entries
        if bid <= gen_id:
            assert not any(
                t in entries for t in ("index", "admitted", "roots", "order")
            )
    replay = []
    _, body = loader_ingest_monitor(
        state_path, budgets=budgets, quality_threshold=ACCEPT_ALL,
        train_sink=lambda df, bid: replay.append(
            sorted(tuple(r) for r in df.collect())),
        spark=spark, compact_every=2,
    )
    b1 = BATCHES[0][1]
    body(spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA), 0)
    assert replay == [t1[0][1]]


def test_loader_pack_spans_match_batch_pack(spark, tmp_path):
    """r12b: the order table's append-only pack spans are bit-equal to
    pack_sequences(shard_col/order_col) over the concatenated stream's
    final train set -- earlier offsets and sequence boundaries never
    moved as batches extended each shard's token stream."""
    from streaminglens_spark.functions.text import pack_sequences

    train_log = []
    _drive(
        spark, str(tmp_path / "src"), BATCHES, str(tmp_path / "state"),
        budgets={"web": 200, "code": 200},
        checkpoint=str(tmp_path / "ckpt"), train_log=train_log,
    )
    rows = [t for _, rs in train_log for t in rs]
    assert rows
    spine = spark.createDataFrame(
        [(t[0], t[1], t[2], t[3]) for t in rows],
        "doc_id long, n_tokens long, train_pos long, shard int",
    )
    want = {
        r["doc_id"]: (r["shard"], r["token_offset"],
                      r["first_seq"], r["last_seq"])
        for r in pack_sequences(
            spine, seq_len=256, tokens_col="n_tokens",
            shard_col="shard", order_col="train_pos",
        ).collect()
    }
    got = {t[0]: (t[3], t[4], t[5], t[6]) for t in rows}
    assert got == want


def test_loader_manifest_read_side_fold(spark, tmp_path):
    """loader_manifest folds the committed order spans into the
    per-(shard, seq) manifest, bit-equal to the batch sequence_manifest
    over the concatenated stream's train set."""
    from streaminglens_spark.functions.text import sequence_manifest
    from streaminglens_spark.streaming.loader import loader_manifest

    state_path = str(tmp_path / "state")
    train_log = []
    _drive(
        spark, str(tmp_path / "src"), BATCHES, state_path,
        budgets={"web": 200, "code": 200},
        checkpoint=str(tmp_path / "ckpt"), train_log=train_log,
    )
    got = sorted(
        tuple(r) for r in loader_manifest(spark, state_path, 256).collect()
    )
    rows = [t for _, rs in train_log for t in rs]
    spine = spark.createDataFrame(
        [(t[0], t[1], t[2], t[3]) for t in rows],
        "doc_id long, n_tokens long, train_pos long, shard int",
    )
    want = sorted(
        tuple(r)
        for r in sequence_manifest(
            spine, seq_len=256, tokens_col="n_tokens",
            shard_col="shard", order_col="train_pos",
        ).collect()
    )
    assert got == want and got


def test_loader_mixture_mode(spark, tmp_path):
    """r12b mixture mode: the loader's budgets are temperature targets
    recomputed per batch from the cumulative seen manifest (the r11
    mixture monitor composed into the full loader) -- five tables under
    one marker, restart restores manifest + ledger + targets
    bit-identically, replay re-delivers byte-identically, and a
    zero-target stratum in its introducing batch does not crash."""
    from streaminglens_spark.streaming.budget import temperature_targets

    total = 100
    b1 = [_doc(1, "tiny"), _doc(2, "big")]     # 20 tokens each
    b2 = [_doc(11, "big"), _doc(12, "big")]
    state_path = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    train_log, published = [], []
    state, body = loader_ingest_monitor(
        state_path,
        mixture_total_tokens=total,
        quality_threshold=ACCEPT_ALL,
        train_sink=lambda df, bid: train_log.append(
            (bid, sorted(tuple(r) for r in df.collect()))),
        gauge_sinks=[lambda s, g: published.append((s, g))],
        spark=spark,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").json(src)
    )
    q = (stream.writeStream.foreachBatch(body).outputMode("append")
         .option("checkpointLocation", ckpt).start())
    try:
        for name, recs in [("b1.json", b1), ("b2.json", b2)]:
            path = os.path.join(src, name)
            with open(hidden_tmp(path), "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
            os.rename(hidden_tmp(path), path)
            q.processAllAvailable()
    finally:
        q.stop()
    # manifest tracked every batch; final targets follow the manifest
    assert state.seen == {"tiny": 20, "big": 60}
    assert state.budgets == temperature_targets(state.seen, total)
    assert published[-1][1]["seenTokens"] == 40
    # five tables sealed per batch
    for n in os.listdir(state_path):
        if n.startswith("batch_id="):
            entries = set(os.listdir(os.path.join(state_path, n)))
            assert {"index", "admitted", "roots", "order",
                    "seen", "_COMMITTED"} <= entries
    # restart restores manifest + ledger + targets bit-identically
    restored = restore_loader_state(
        spark, None, state_path, mixture_total_tokens=total
    )
    assert restored.seen == state.seen
    assert restored.spent == state.spent
    assert restored.budgets == state.budgets
    assert restored.folded_batches == {0, 1}
    # replay batch 0: byte-identical train delivery, no double count
    replay = []
    _, body2 = loader_ingest_monitor(
        state_path, mixture_total_tokens=total,
        quality_threshold=ACCEPT_ALL,
        train_sink=lambda df, bid: replay.append(
            sorted(tuple(r) for r in df.collect())),
        spark=spark,
    )
    body2(spark.createDataFrame(
        [(d["doc_id"], d["text"], d["source"]) for d in b1], SCHEMA), 0)
    assert replay == [train_log[0][1]]
    again = restore_loader_state(
        spark, None, state_path, mixture_total_tokens=total
    )
    assert again.seen == state.seen and again.spent == state.spent


def test_loader_dsir_gate_parity_and_replay(spark, tmp_path):
    """r13 (r12 verdict ask #5): with dsir_weights the loader's quality
    gate becomes DSIR importance admission.  With the threshold set to
    the k-th concatenated-stream score, the admitted set is BIT-EQUAL to
    the batch dsir_select top-k over the same corpus (frozen weights +
    row-local scoring make the stream/batch forms the same projection);
    replay re-delivers byte-identically; one marker per batch; the gate
    is mutually exclusive with quality_threshold."""
    import pytest

    from streaminglens_spark.functions.dsir import (
        dsir_fit,
        dsir_score_with,
        dsir_select,
    )
    from streaminglens_spark.functions.text import normalize_expr, redact_expr
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(60)
        .select("doc_id", "text", "lang", "source").collect()
    )
    sample_df = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"]) for r in sample],
        "doc_id long, text string, lang string",
    )
    # parity precondition: the loader's clean pass is identity on the
    # fixture text (no control chars / PII patterns), so the gate scores
    # the same bytes dsir_select scores
    dirty = sample_df.filter(
        redact_expr(normalize_expr(F.col("text"))) != F.col("text")
    ).count()
    assert dirty == 0

    warr = spark.createDataFrame(
        dsir_fit(sample_df).collect(), "warr array<bigint>"
    )
    ranked = sorted(
        ((r["score_micro"], r["doc_id"]) for r in
         dsir_score_with(sample_df, warr).collect()),
        key=lambda t: (-t[0], t[1]),
    )
    # a k with a strict score drop at the boundary, mid-corpus
    k = next(
        i for i in range(20, 45) if ranked[i - 1][0] > ranked[i][0]
    )
    thr = ranked[k - 1][0]
    sel_ids = {r["doc_id"] for r in dsir_select(sample_df, keep_n=k).collect()}
    assert sel_ids == {doc_id for _, doc_id in ranked[:k]}

    state_path = str(tmp_path / "state")
    src = str(tmp_path / "src")
    os.makedirs(src)
    train_log, assigned_log, published = [], [], []
    state, body = loader_ingest_monitor(
        state_path,
        dedup_threshold=1.1,  # neutralize dedup: the gate is the subject
        dsir_weights=warr,
        dsir_threshold_micro=thr,
        train_sink=lambda df, bid: train_log.append(
            (bid, sorted(tuple(r) for r in df.collect()))),
        assigned_sink=lambda df, bid: assigned_log.append(
            (bid, {r["doc_id"]: r["split"] for r in df.collect()})),
        gauge_sinks=[lambda s, g: published.append(g)],
        spark=spark,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = stream.writeStream.foreachBatch(body).start()
    try:
        for i in range(3):
            path = os.path.join(src, f"f{i}.json")
            with open(hidden_tmp(path), "w") as f:
                for r in sample[i * 20 : (i + 1) * 20]:
                    f.write(json.dumps(
                        {"doc_id": r["doc_id"], "text": r["text"],
                         "source": r["source"]}) + "\n")
            os.rename(hidden_tmp(path), path)
            q.processAllAvailable()
    finally:
        q.stop()

    # total admitted across batches == |top-k|; train delivery == the
    # train side of the top-k set (the split is attachment-time, over
    # ALL docs, independent of the gate)
    assert sum(g["admittedDocs"] for g in published) == k
    split_of = {}
    for _, m in assigned_log:
        split_of.update(m)
    expect_train = {d for d in sel_ids if split_of[d] == "train"}
    got_train = {t[0] for _, rows in train_log for t in rows}
    assert got_train == expect_train
    # gate rejects are DSIR rejects (dedup neutralized)
    assert sum(g["qualityRejects"] for g in published) == 60 - k

    # one marker + four tables per batch
    dirs = [n for n in os.listdir(state_path) if n.startswith("batch_id=")]
    assert sorted(dirs) == ["batch_id=0", "batch_id=1", "batch_id=2"]
    for n in dirs:
        entries = set(os.listdir(os.path.join(state_path, n)))
        assert "_COMMITTED" in entries
        assert {"index", "admitted", "roots", "order"} <= entries

    # restart replay: batch 0 re-delivers byte-identically
    replay = []
    _, body2 = loader_ingest_monitor(
        state_path,
        dedup_threshold=1.1,
        dsir_weights=warr,
        dsir_threshold_micro=thr,
        train_sink=lambda df, bid: replay.append(
            sorted(tuple(r) for r in df.collect())),
        spark=spark,
    )
    body2(spark.createDataFrame(
        [(r["doc_id"], r["text"], r["source"]) for r in sample[:20]],
        SCHEMA), 0)
    assert replay == [train_log[0][1]]

    with pytest.raises(ValueError, match="dsir_weights OR quality_threshold"):
        loader_ingest_monitor(
            state_path, quality_threshold=0, dsir_weights=warr
        )


def test_loader_dsir_gate_composes_with_mixture_mode(spark, tmp_path):
    """r13: the DSIR gate and mixture mode are orthogonal knobs -- the
    gate replaces only the quality threshold (survivors -> importance
    admission), mixture replaces only the budget source (static dict ->
    temperature targets from the seen manifest); both together must run,
    keep the five-table/one-marker layout, and fold the manifest over
    ALL cleaned docs (seen counts are pre-gate by design)."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.dsir import dsir_fit

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(40)
        .select("doc_id", "text", "lang", "source").collect()
    )
    warr = spark.createDataFrame(
        dsir_fit(
            spark.createDataFrame(
                [(r["doc_id"], r["text"], r["lang"]) for r in sample],
                "doc_id long, text string, lang string",
            )
        ).collect(),
        "warr array<bigint>",
    )
    state_path = str(tmp_path / "state")
    published = []
    state, body = loader_ingest_monitor(
        state_path,
        mixture_total_tokens=2000,
        dedup_threshold=1.1,
        dsir_weights=warr,
        dsir_threshold_micro=-10**15,  # gate open: isolates composition
        gauge_sinks=[lambda s, g: published.append(dict(g))],
        spark=spark,
    )
    for i in range(2):
        body(spark.createDataFrame(
            [(r["doc_id"], r["text"], r["source"])
             for r in sample[i * 20 : (i + 1) * 20]],
            SCHEMA), i)
    # both features left their marks: the seen manifest folded every
    # cleaned doc, and the DSIR gate admitted (threshold wide open, so
    # gate rejects are zero) with mixture budgets applied downstream
    assert sum(g["inDocs"] for g in published) == 40
    assert sum(g["qualityRejects"] for g in published) == 0
    # seenTokens gauges are per-batch; the ledger's manifest is cumulative
    assert sum(state.seen.values()) == sum(
        g["seenTokens"] for g in published
    ) > 0
    for n in ("batch_id=0", "batch_id=1"):
        entries = set(os.listdir(os.path.join(state_path, n)))
        assert "_COMMITTED" in entries
        assert {"index", "admitted", "roots", "order", "seen"} <= entries
    # and the two knobs stay individually validated
    import pytest
    with pytest.raises(ValueError, match="budgets OR mixture"):
        loader_ingest_monitor(
            state_path, budgets={"a": 1}, mixture_total_tokens=10
        )


def test_loader_dsir_gate_validates_weight_dim(spark, tmp_path):
    """r14 (r13 advice): a ``warr`` fitted at a non-default dim used to
    score NULL via out-of-range ``element_at`` and silently drop every
    row.  Now the loader (a) auto-detects the dim from the weights
    table, admitting correctly with a 64-dim fit, and (b) fails LOUDLY
    at construction when an explicit ``dsir_dim`` contradicts the
    table."""
    import pytest

    from streaminglens_spark.functions.dsir import dsir_fit
    from streaminglens_spark.streaming.dsirstream import dsir_admit_batch

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample_df = (
        docs.orderBy("doc_id").limit(30).select("doc_id", "text", "lang")
    )
    warr64 = spark.createDataFrame(
        dsir_fit(sample_df, dim=64).collect(), "warr array<bigint>"
    )

    # (b) explicit mismatch: loud construction-time error, stream never starts
    with pytest.raises(ValueError, match="dim 64"):
        loader_ingest_monitor(
            str(tmp_path / "bad"), dsir_weights=warr64, dsir_dim=256
        )

    # (a) auto-detect: the gate scores at the table's own dim -- the
    # admitted count equals the batch operator's at dim=64 (nonzero on
    # this fixture; the old bug admitted zero)
    expected = dsir_admit_batch(
        sample_df, warr64, threshold_micro=0, dim=64
    ).count()
    assert 0 < expected < 30  # the gate discriminates at dim 64
    published = []
    state, body = loader_ingest_monitor(
        str(tmp_path / "state"),
        dedup_threshold=1.1,
        dsir_weights=warr64,
        dsir_threshold_micro=0,
        gauge_sinks=[lambda s, g: published.append(g)],
        spark=spark,
    )
    batch = spark.createDataFrame(
        [(r["doc_id"], r["text"], "web") for r in sample_df.collect()],
        "doc_id long, text string, source string",
    )
    body(batch, 0)
    assert published
    g = published[-1]
    assert g["qualityRejects"] == 30 - expected  # not 30: no silent drop


def test_loader_curriculum_order_parity_replay_and_packing(spark, tmp_path):
    """r14 (r13 verdict ask #5): order="curriculum" gives the stream the
    batch flagship's quality-banded training order.  Pins: (a) bands are
    bit-equal to the batch curriculum_order's on the same docs (same
    score expression, same thresholds), (b) positions are dense per band
    and preserve arrival order within a band, (c) pack offsets run per
    (band, shard) and are append-only across batches, (d) replay
    re-delivers byte-identically, (e) one marker per batch, (f) the
    curriculum manifest flattens (band, shard) without collisions."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.sampling import curriculum_order
    from streaminglens_spark.functions.text import (
        normalize_expr,
        redact_expr,
    )
    from streaminglens_spark.streaming.ingest import _BatchDirCache
    from streaminglens_spark.streaming.loader import (
        _ORDER_CURR_SCHEMA,
        loader_manifest,
    )
    from streaminglens_spark.streaming.ingest import committed_table_view

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sample = (
        docs.orderBy("doc_id").limit(60)
        .select("doc_id", "text", "source").collect()
    )
    sample_df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in sample],
        "doc_id long, text string",
    )
    # parity precondition: clean pass is identity on the fixture text
    assert sample_df.filter(
        redact_expr(normalize_expr(F.col("text"))) != F.col("text")
    ).count() == 0

    state_path = str(tmp_path / "state")
    n_shards = 4
    train_log = []
    state, body = loader_ingest_monitor(
        state_path,
        dedup_threshold=1.1,      # order semantics are the subject
        quality_threshold=-10**9,  # admit everything that survives
        n_shards=n_shards,
        seq_len=32,
        order="curriculum",
        train_sink=lambda df, bid: train_log.append(
            (bid, sorted(tuple(r) for r in df.collect()))),
        spark=spark,
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [(r["doc_id"], r["text"], r["source"]) for r in rows],
        "doc_id long, text string, source string",
    )
    body(mk(sample[:30]), 0)
    body(mk(sample[30:]), 1)

    cache = _BatchDirCache()
    committed = committed_table_view(
        spark, state_path, "order", _ORDER_CURR_SCHEMA, cache
    ).collect()
    assert committed, "stream admitted nothing -- fixture regression"

    # (a) band parity with the batch operator on the same train docs
    train_ids = [r["doc_id"] for r in committed]
    batch_bands = {
        r["doc_id"]: r["band"]
        for r in curriculum_order(
            sample_df.filter(F.col("doc_id").isin(train_ids)),
            n_shards=n_shards,
        ).collect()
    }
    for r in committed:
        assert r["band"] == batch_bands[r["doc_id"]], r

    # (b) dense per-band positions, arrival (doc_id) order within band
    by_band = {}
    for r in committed:
        by_band.setdefault(r["band"], []).append(r)
    for band, rows in by_band.items():
        rows.sort(key=lambda r: r["band_pos"])
        assert [r["band_pos"] for r in rows] == list(range(len(rows)))
        ids = [r["doc_id"] for r in rows]
        assert ids == sorted(ids)  # append order preserved in-band
        for r in rows:
            assert r["shard"] == r["band_pos"] % n_shards

    # (c) per-(band, shard) append-only pack offsets + span formulas
    by_bs = {}
    for r in committed:
        by_bs.setdefault((r["band"], r["shard"]), []).append(r)
    L = 32
    for (_, _), rows in by_bs.items():
        rows.sort(key=lambda r: r["band_pos"])
        off = 0
        for r in rows:
            assert r["token_offset"] == off
            if r["n_tokens"] > 0:
                assert r["first_seq"] == off // L
                assert r["last_seq"] == (off + r["n_tokens"] - 1) // L
            off += r["n_tokens"]

    # (c') cross-operator pin (the r12b arrival-mode parity, per band):
    # each band's spans are bit-equal to batch pack_sequences over that
    # band's final stream in band_pos order -- three independent
    # append-only pack families, each matching the batch operator
    from streaminglens_spark.functions.text import pack_sequences

    for band in {r["band"] for r in committed}:
        sub = [r for r in committed if r["band"] == band]
        spine = spark.createDataFrame(
            [(r["doc_id"], r["n_tokens"], r["shard"], r["band_pos"])
             for r in sub],
            "doc_id long, n_tokens long, shard int, band_pos long",
        )
        want = {
            r["doc_id"]: (r["token_offset"], r["first_seq"], r["last_seq"])
            for r in pack_sequences(
                spine, seq_len=L, tokens_col="n_tokens",
                shard_col="shard", order_col="band_pos",
            ).collect()
        }
        got = {
            r["doc_id"]: (r["token_offset"], r["first_seq"], r["last_seq"])
            for r in sub
        }
        assert got == want, f"band {band} spans diverge from batch pack"

    # (e) one marker + four tables per batch
    for n in ("batch_id=0", "batch_id=1"):
        entries = set(os.listdir(os.path.join(state_path, n)))
        assert "_COMMITTED" in entries
        assert {"index", "admitted", "roots", "order"} <= entries

    # (d) restart replay of batch 0: byte-identical delivery, committed
    # state unchanged
    replay = []
    _, body2 = loader_ingest_monitor(
        state_path,
        dedup_threshold=1.1,
        quality_threshold=-10**9,
        n_shards=n_shards,
        seq_len=32,
        order="curriculum",
        train_sink=lambda df, bid: replay.append(
            sorted(tuple(r) for r in df.collect())),
        spark=spark,
    )
    body2(mk(sample[:30]), 0)
    assert replay == [train_log[0][1]]
    again = committed_table_view(
        spark, state_path, "order", _ORDER_CURR_SCHEMA, _BatchDirCache()
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, committed))

    # (f) curriculum manifest: flat shard = (2-band)*n + shard, no
    # cross-band seq collisions, fills match the order table by hand
    man = loader_manifest(
        spark, state_path, seq_len=L, order="curriculum",
        n_shards=n_shards,
    ).collect()
    flat_shards = {(2 - r["band"]) * n_shards + r["shard"]
                   for r in committed if r["n_tokens"] > 0}
    assert {m["shard"] for m in man} == flat_shards
    filled = {}
    for r in committed:
        if r["n_tokens"] <= 0:
            continue
        fs = (2 - r["band"]) * n_shards + r["shard"]
        for s in range(r["first_seq"], r["last_seq"] + 1):
            lo = max(r["token_offset"], s * L)
            hi = min(r["token_offset"] + r["n_tokens"], (s + 1) * L)
            filled[(fs, s)] = filled.get((fs, s), 0) + (hi - lo)
    assert {(m["shard"], m["seq_id"]): m["filled"] for m in man} == filled

    # invalid mode fails loudly
    import pytest

    with pytest.raises(ValueError, match="arrival.*curriculum"):
        loader_ingest_monitor(state_path, order="epoch")
