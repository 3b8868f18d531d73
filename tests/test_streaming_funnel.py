"""Online funnel on a real stream: in-order replay emits exactly the
batch operator's greedy-earliest conversions, each step the moment it
happens, with state only for funnel participants."""

from __future__ import annotations

import json
import os

from streaminglens_spark.streaming.anomaly import stream_funnel
from tests.conftest import hidden_tmp

MIN = 60_000


def _rows():
    rows = []
    # user 1: full chain; user 2: stops at view; user 3: view BEFORE
    # signup (doesn't count), then signup only; user 4: never signs up;
    # user 5: purchase outside the 6 h horizon
    rows += [(1, "signup", 0), (1, "view", 10), (1, "purchase", 20)]
    rows += [(2, "signup", 1), (2, "view", 11)]
    rows += [(3, "view", 2), (3, "signup", 12)]
    rows += [(4, "view", 3), (4, "purchase", 13)]
    rows += [(5, "signup", 4), (5, "view", 14), (5, "purchase", 12 * 60)]
    return [(u, t, m * MIN) for u, t, m in rows]


def test_stream_funnel_matches_batch_counts(spark, tmp_path):
    rows = sorted(_rows(), key=lambda r: r[2])
    src = str(tmp_path / "in")
    os.makedirs(src)
    per = (len(rows) + 2) // 3
    for part in range(3):
        path = os.path.join(src, f"f{part}.json")
        with open(hidden_tmp(path), "w") as f:
            for u, t, ms in rows[part * per : (part + 1) * per]:
                f.write(json.dumps({"user_id": u, "event_type": t, "ms": ms}) + "\n")
        os.rename(hidden_tmp(path), path)

    out = stream_funnel(
        spark.readStream.schema("user_id long, event_type string, ms long")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
        got = {
            (r["user_id"], r["step_idx"]): (r["step"], r["ms"])
            for r in spark.table("funnel_stream").collect()
        }
    finally:
        q.stop()

    assert got == {
        (1, 0): ("signup", 0), (1, 1): ("view", 10 * MIN),
        (1, 2): ("purchase", 20 * MIN),
        (2, 0): ("signup", 1 * MIN), (2, 1): ("view", 11 * MIN),
        (3, 0): ("signup", 12 * MIN),
        (5, 0): ("signup", 4 * MIN), (5, 1): ("view", 14 * MIN),
    }
    # per-step totals equal the batch operator on the same rows
    import datetime as dt

    batch_events = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms), u, t, 1.0, "{}")
            for i, (u, t, ms) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from streaminglens_spark.operators.funnel import funnel_counts

    want = {
        r["step_idx"]: r["n_users"] for r in funnel_counts(batch_events).collect()
    }
    for i in range(3):
        assert want[i] == sum(1 for (_, s) in got if s == i), i
    # state only for participants: users 1, 2, 3, 5 (user 4 never entered)
    assert progress["stateOperators"][0]["numRowsTotal"] == 4
