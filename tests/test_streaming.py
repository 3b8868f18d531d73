"""Live-mode tests: the StreamingQueryListener bridge end-to-end on a real
micro-batch stream, and the control-plane semantics (gates, retention,
retry/self-shutdown) with injected progress."""

from __future__ import annotations

import time

import pytest

from streaminglens_spark.config import StreamingLensConfig
from streaminglens_spark.streaming.live import (
    LiveAnalyzer,
    ProgressCapture,
    attach,
    detach,
)


def _fake_progress(qid: str, batch_id: int, ts_ms: int, nir: int = 100, rps: float = 50.0):
    from datetime import datetime, timezone

    iso = datetime.fromtimestamp(ts_ms / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S."
    ) + f"{ts_ms % 1000:03d}Z"
    return (qid, None, "run-" + qid, batch_id, ts_ms, nir, rps, ["MemoryStream[0]"], "Memory")


def _cfg(extra: dict | None = None) -> StreamingLensConfig:
    opts = {"streamingLens.maxAnalysisTimeSeconds": "120"}
    opts.update(extra or {})
    return StreamingLensConfig(opts)


class _Clock:
    def __init__(self, t0: float = 1_700_000_000.0):
        self.t = t0

    def __call__(self) -> float:
        return self.t

    def advance(self, seconds: float) -> None:
        self.t += seconds


def test_listener_bridge_end_to_end(spark):
    """A real rate-micro-batch stream: the listener captures progress rows
    with the right schema and the analyzer produces classified results."""
    cap = attach(spark)
    try:
        q = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 10)
            .load()
            .writeStream.format("memory")
            .queryName("live_bridge_test")
            .start()
        )
        deadline = time.time() + 60
        while time.time() < deadline and len(cap.snapshot()) < 2:
            time.sleep(0.5)
        q.stop()
        rows = cap.snapshot()
        assert len(rows) >= 2, "listener captured no progress"

        clock = _Clock()
        analyzer = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock)
        clock.advance(3600)  # pass the A3 interval gate
        results = analyzer.tick()
        assert results, "no results from live analysis"
        states = {r["state"] for r in results}
        # 10-row batches vs the 120 s default SLA: overprovisioned (or no-data)
        assert states <= {"OVERPROVISIONED", "NONEWBATCHES"}
    finally:
        detach(spark, cap)


def test_foreach_batch_monitor_end_to_end(spark):
    """The full deployment shape: a user pipeline with a monitored
    foreachBatch sink; analysis ticks ride the micro-batch callbacks."""
    from streaminglens_spark.streaming.live import LiveAnalyzer, foreach_batch_monitor

    cap = attach(spark)
    seen_batches = []
    try:
        analyzer = LiveAnalyzer(spark, cap, config=_cfg())
        q = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 5)
            .load()
            .writeStream.foreachBatch(
                foreach_batch_monitor(analyzer, lambda df, bid: seen_batches.append(bid))
            )
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline and not analyzer.results:
            time.sleep(0.5)
        q.stop()
        assert seen_batches, "user foreachBatch fn never ran"
        assert analyzer.results, "monitored analysis produced no results"
        assert {r["state"] for r in analyzer.results} <= {"OVERPROVISIONED", "NONEWBATCHES"}
    finally:
        detach(spark, cap)


def test_interval_gate_blocks_rapid_ticks(spark):
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock)
    clock.advance(3600)
    assert a.tick()  # first tick analyzes
    cap.rows.append(_fake_progress("q1", 1, 1_700_000_060_000))
    assert a.tick() == []  # same instant: A3 gate blocks
    clock.advance(301)  # > 5 min default interval
    assert a.tick()  # now the new batch is analyzed


def test_min_batches_gate(spark):
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark, cap, config=_cfg({"streamingLens.minBatches": "5"}),
        clock=clock,
    )
    clock.advance(3600)
    # batch 0: 0 - (-1) = 1 < 5 -> gated out entirely
    assert a.tick() == []
    cap.rows.append(_fake_progress("q1", 6, 1_700_000_360_000))
    clock.advance(301)
    assert [x["batch_id"] for x in a.tick()] == [6]  # 6 - (-1) >= 5


def test_results_ring_buffer(spark):
    cap = ProgressCapture()
    base = 1_700_000_000_000
    cap.rows = [_fake_progress("q1", b, base + b * 60_000) for b in range(8)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark, cap,
        config=_cfg({"streamingLens.maxResultsRetention": "3"}),
        clock=clock,
    )
    clock.advance(3600)
    a.tick()
    assert len(a.results) == 3  # newest 3 kept (A19)
    assert sorted(r["batch_id"] for r in a.results) == [5, 6, 7]


def test_retry_then_self_shutdown(spark):
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock)
    a._analyze_once = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
    for i in range(3):  # maxRetries default 3
        clock.advance(3600)
        assert a.tick() == []
    assert a.stopped  # U2: self-shutdown after max retries
    clock.advance(3600)
    assert a.tick() == []  # stopped analyzers stay stopped


def test_reporter_plugin_receives_events(spark):
    events = []

    class Reporter:
        def send_insights_event(self, info: str) -> None:
            events.append(info)

    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(spark, cap, config=_cfg(), reporters=[Reporter()], clock=clock)
    # first tick: query first seen -> A16 anchor starts here (r3 fix), so
    # the first insights event waits a full interval from query start
    assert a.tick()
    assert events == []

    # inside the hour since first-seen: analyzes but does NOT report
    cap.rows.append(_fake_progress("q1", 1, 1_700_000_060_000))
    clock.advance(360)  # past the 5-min A3 gate, inside the 60-min A16 gate
    assert a.tick()
    assert events == []
    cap.rows.append(_fake_progress("q1", 2, 1_700_000_120_000))
    clock.advance(3600)  # past the A16 gate
    assert a.tick()
    assert len(events) == 1 and "OVERPROVISIONED" in events[0]

    # A16 again: inside the next hour -> no re-report; past it -> report
    cap.rows.append(_fake_progress("q1", 3, 1_700_000_180_000))
    clock.advance(360)
    assert a.tick()
    assert len(events) == 1
    cap.rows.append(_fake_progress("q1", 4, 1_700_000_240_000))
    clock.advance(3600)
    assert a.tick()
    assert len(events) == 2
