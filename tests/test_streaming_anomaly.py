"""Online duration anomalies on a real stream: prefix-stat verdicts
bit-match a Python reference, state stays O(#queries), invalid batches
neither emit nor perturb, and an injected outlier is caught the moment
it arrives (not only in hindsight)."""

from __future__ import annotations

import json
import os

from streaminglens_spark.streaming.anomaly import stream_duration_anomalies
from tests.conftest import hidden_tmp


def _rows():
    rows = []
    for b in range(20):
        rows.append(("q1", b, b * 60_000, 100, 100.0))      # 1000 ms
    rows.append(("q1", 20, 20 * 60_000, 1000, 100.0))       # 10000 ms outlier
    for b in range(21, 25):
        rows.append(("q1", b, b * 60_000, 100, 100.0))
    rows.append(("q1", 25, 25 * 60_000, 0, 0.0))            # invalid
    for b in range(12):
        rows.append(("q2", b, b * 60_000, 100, 50.0))       # constant 2000 ms
    return rows


def _reference(rows, k=3):
    stats: dict[str, tuple[int, int, int]] = {}
    out = {}
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r[0], []).append(r)
    for qid, rs in by_q.items():
        n = s = q = 0
        for _, b, ts, nrows, rps in sorted(rs, key=lambda r: r[1]):
            if nrows == 0 or rps == 0:
                continue
            d = int(ts + (nrows / rps) * 1000) - ts
            out[(qid, b)] = (d, bool(n >= 2 and (d * n - s) ** 2 > k * k * (n * q - s * s)))
            n, s, q = n + 1, s + d, q + d * d
        stats[qid] = (n, s, q)
    return out, stats


def test_stream_matches_reference_and_bounds_state(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "in")
    os.makedirs(src)
    # contiguous batch_id-ordered slices: the stream replays each query's
    # history in order across micro-batches (the arrival order a live
    # listener sees; a [part::3] interleave would scramble it)
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    for part in range(3):
        path = os.path.join(src, f"f{part}.json")
        per = (len(ordered) + 2) // 3
        with open(hidden_tmp(path), "w") as f:
            for qid, b, ts, nr, rps in ordered[part * per : (part + 1) * per]:
                f.write(json.dumps({
                    "query_id": qid, "batch_id": b, "ts_ms": ts,
                    "num_input_rows": nr, "processed_rps": rps,
                }) + "\n")
        os.rename(hidden_tmp(path), path)

    schema = (
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double"
    )
    out = stream_duration_anomalies(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(src)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("anom_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.lastProgress
        got = {
            (r["query_id"], r["batch_id"]): (r["duration_ms"], r["is_anomaly"])
            for r in spark.table("anom_stream").collect()
        }
    finally:
        q.stop()

    want, _ = _reference(rows)
    assert got == want
    assert got[("q1", 20)][1] is True          # outlier caught on arrival
    assert not any(v[1] for k, v in got.items() if k != ("q1", 20))
    assert ("q1", 25) not in got               # invalid emits nothing
    # O(1) state per query: exactly 2 state rows (q1, q2)
    assert progress["stateOperators"][0]["numRowsTotal"] == 2
