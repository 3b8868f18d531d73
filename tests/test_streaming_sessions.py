"""Streaming session windows (r5, r4 verdict ask #5): real-stream
batch-vs-stream bit-parity for ``stream_session_agg``, plus the
state-eviction contract (closed sessions leave the store when the
watermark passes).  Also the r4-advice watermark-eviction case for
``stream_interval_join`` (the r4 test's 365-day watermark never evicted
anything; this one makes the watermark advance and asserts state drops).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.operators.windows import _ev, session_agg
from streaminglens_spark.sources.loaders import load_table
from streaminglens_spark.streaming.enrich import stream_interval_join
from streaminglens_spark.streaming.sessions import stream_session_agg
from tests.conftest import hidden_tmp, SF_DIR

N_USERS = 8  # user_id < 8 keeps the stream small but multi-session
SENTINEL_USER = -1


def _write_json_files(tmp_path, name, files):
    """files: list of row-dict lists -> one JSON-lines file each, written
    atomically (tmp + rename) so the file source never sees partials."""
    src = str(tmp_path / name)
    os.makedirs(src)
    for i, rows in enumerate(files):
        path = os.path.join(src, f"f{i}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)
    return src


def test_stream_sessions_match_batch_bit_exact(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < N_USERS)
    sample = _ev(events).select("user_id", "ms", "cents").orderBy("ms").collect()
    assert len(sample) > 50
    # time-ordered two-file split (nothing arrives behind the watermark),
    # plus a far-future sentinel in the last file: the watermark passes
    # every real session's end, so append mode emits them all
    rows = [
        {"user_id": r["user_id"], "ms": r["ms"], "cents": r["cents"]}
        for r in sample
    ]
    half = len(rows) // 2
    sentinel = {
        "user_id": SENTINEL_USER,
        "ms": rows[-1]["ms"] + 86_400_000,
        "cents": 0,
    }
    src = _write_json_files(tmp_path, "sess", [rows[:half], rows[half:] + [sentinel]])

    stream = (
        spark.readStream.schema("user_id long, ms long, cents long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .select("user_id", F.timestamp_millis(F.col("ms")).alias("ets"), "cents")
    )
    out = stream_session_agg(stream, watermark="1 minute")

    got: set[tuple] = set()

    def sink(df, batch_id):
        for r in df.collect():
            got.add(tuple(r))

    q = out.writeStream.outputMode("append").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
        progress = q.lastProgress
    finally:
        q.stop()

    want = {
        tuple(r)
        for r in session_agg(events).collect()
    }
    got_real = {t for t in got if t[0] != SENTINEL_USER}
    assert got_real == want  # bit parity: same rows, same cents sums
    # eviction: every real session closed and left the store -- state
    # holds at most the sentinel's still-open session
    ops = progress["stateOperators"]
    assert ops and ops[0]["numRowsTotal"] <= 2, ops[0]["numRowsTotal"]
    assert ops[0]["numRowsTotal"] < len(want)


def test_stream_interval_join_watermark_evicts_state(spark, tmp_path):
    """r4 advice: with a short watermark and a much-later second batch,
    buffered rows from the first batch must leave the join state once the
    watermark passes the join horizon."""
    t0 = 1_600_000_000_000
    hour = 3_600_000
    left_files = [
        [{"event_id": 1, "user_id": 1, "ms": t0}],
        [{"event_id": 2, "user_id": 1, "ms": t0 + 3 * hour}],
    ]
    right_files = [
        [{"event_id": 10, "user_id": 1, "ms": t0 + 10_000}],
        [{"event_id": 20, "user_id": 1, "ms": t0 + 3 * hour + 10_000}],
    ]
    lsrc = _write_json_files(tmp_path, "left", left_files)
    rsrc = _write_json_files(tmp_path, "right", right_files)

    def read_stream(src, ts_name):
        return (
            spark.readStream.schema("event_id long, user_id long, ms long")
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .select(
                "event_id", "user_id", F.timestamp_millis(F.col("ms")).alias(ts_name)
            )
        )

    joined = stream_interval_join(
        read_stream(lsrc, "lts"),
        read_stream(rsrc, "rts"),
        horizon_ms=60_000,
        watermark="10 seconds",
    )
    got: set[tuple] = set()

    def sink(df, batch_id):
        for r in df.collect():
            got.add((r["l_event_id"], r["r_event_id"]))

    q = joined.writeStream.foreachBatch(sink).queryName("ivj_evict").start()
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    finally:
        q.stop()

    # both within-horizon pairs found across the watermark advance
    assert got == {(1, 10), (2, 20)}
    removed = sum(
        op.get("numRowsRemoved", 0) or 0
        for p in progresses
        for op in p["stateOperators"]
    )
    final_total = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    # 4 rows were buffered over the run; the watermark advance must have
    # dropped the first batch's rows from the store
    assert removed > 0, [p["stateOperators"] for p in progresses]
    assert final_total < 4, final_total
