"""Round-2 control-plane tests: U1 class-name reporter loading with the full
started/insights/terminated lifecycle, U3 forced-timeout -> ERROR(-1) result,
and per-tick incremental analysis (VERDICT r1 items 3, 4, 6)."""

from __future__ import annotations

import json
import time

from streaminglens_spark.config import StreamingLensConfig
from streaminglens_spark.streaming.live import LiveAnalyzer, ProgressCapture
from streaminglens_spark.streaming.reporters import (
    StreamingLensEventsReporterInterface,
    load_reporter,
)
from tests.test_streaming import _Clock, _cfg, _fake_progress


class RecordingReporter(StreamingLensEventsReporterInterface):
    """Loaded by class name; records every event it receives."""

    instances: list["RecordingReporter"] = []

    def __init__(self, options):
        super().__init__(options)
        self.events: list[tuple[str, str]] = []
        RecordingReporter.instances.append(self)

    def send_started_event(self, info: str) -> None:
        self.events.append(("started", info))

    def send_insights_event(self, info: str) -> None:
        self.events.append(("insights", info))

    def send_terminated_event(self, info: str) -> None:
        self.events.append(("terminated", info))


def test_load_reporter_validation():
    rep = load_reporter(
        "tests.test_live_control_plane.RecordingReporter",
        {"streaminglens.reporter.custom": "x"},
        "q1",
    )
    assert rep.options["queryId"] == "q1"
    assert rep.options["streaminglens.reporter.custom"] == "x"
    # built-in bare name resolves (the reference's default is likewise bare)
    rep2 = load_reporter("JsonFileReporter", {}, "q2")
    assert rep2.options["queryId"] == "q2"
    try:
        load_reporter("json.JSONDecoder", {}, "q")  # not a reporter
        raise AssertionError("expected TypeError")
    except TypeError:
        pass
    try:
        load_reporter("NoSuchBuiltin", {}, "q")
        raise AssertionError("expected ImportError")
    except ImportError:
        pass


def test_reporter_by_class_name_full_lifecycle(spark):
    """U1 complete: reporter instantiated from streamingLens.reporter.className
    with the options bag + queryId, receiving started, insights AND
    terminated events."""
    RecordingReporter.instances.clear()
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark,
        cap,
        config=_cfg(
            {
                "streamingLens.reporter.enabled": "true",
                "streamingLens.reporter.className": "tests.test_live_control_plane.RecordingReporter",
                "streamingLens.reporter.custom": "abc",
            }
        ),
        clock=clock,
    )
    # first tick: the query is first seen -> reporting state + started event;
    # the A16 anchor starts HERE (r3 fix), so no insights yet
    assert a.tick()
    cap.rows.append(_fake_progress("q1", 1, 1_700_000_060_000))
    clock.advance(3600)  # one full reporting interval after first-seen
    assert a.tick()
    a.stop()

    assert len(RecordingReporter.instances) == 1
    rep = RecordingReporter.instances[0]
    assert rep.options["queryId"] == "q1"
    assert rep.options["streaminglens.reporter.custom"] == "abc"
    kinds = [k for k, _ in rep.events]
    assert kinds == ["started", "insights", "terminated"]
    payload = json.loads(rep.events[1][1])
    # aggregated-state event shape (StreamingLensReportingHelper.scala:80-92)
    assert list(payload) == [
        "eventId", "name", "runId", "eventTimeMillis", "state", "displayText",
    ]
    assert payload["eventId"] == 0
    assert payload["state"] == "NEEDS ATTENTION"  # single OVERPROVISIONED batch
    assert "OVERPROVISIONED" in payload["displayText"]


def test_json_file_reporter_writes_event_lines(spark, tmp_path):
    """The built-in default reporter (bare-name resolution, like the
    reference's default className) appends one JSON line per event."""
    path = str(tmp_path / "events.jsonl")
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark,
        cap,
        config=_cfg(
            {
                "streamingLens.reporter.enabled": "true",
                "streamingLens.reporter.className": "JsonFileReporter",
                "streamingLens.reporter.path": path,
            }
        ),
        clock=clock,
    )
    assert a.tick()  # first-seen: started event, A16 anchor starts
    cap.rows.append(_fake_progress("q1", 1, 1_700_000_060_000))
    clock.advance(3600)
    assert a.tick()  # one interval later: insights
    a.stop()
    with open(path) as f:
        events = [json.loads(line) for line in f]
    assert [e["event"] for e in events] == ["started", "insights", "terminated"]
    assert "OVERPROVISIONED" in events[1]["info"]


def test_should_log_results_emits_insight_blocks(spark, caplog):
    """A24 in live mode: shouldLogResults (default true) logs the boxed
    insight block -- 'Inisights' typo and all -- per analyzed batch."""
    import logging

    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock)
    clock.advance(3600)
    with caplog.at_level(logging.INFO, logger="streaminglens_spark"):
        assert a.tick()
    assert any("StreamingLens Inisights" in m for m in caplog.messages)
    assert any("Streaming Query State: OVERPROVISIONED" in m for m in caplog.messages)


def test_forced_timeout_emits_error_result(spark):
    """U3: an analysis that overruns maxAnalysisTimeSeconds yields the
    ERROR(-1) result row (batch running time kept, critical 0), consumes the
    A3 interval, and feeds the retry counter -- and the tick returns within
    the timeout instead of joining the stuck worker."""
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 3, 1_700_000_000_000, nir=100, rps=50.0)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark,
        cap,
        config=_cfg({"streamingLens.maxAnalysisTimeSeconds": "1"}),
        clock=clock,
    )

    def slow_analysis():
        time.sleep(3)
        return []

    a._analyze_once = slow_analysis
    clock.advance(3600)
    t0 = time.time()
    assert a.tick() == []
    assert time.time() - t0 < 2.5, "tick blocked past the analysis timeout"
    assert a.retries == 1
    assert a.results == []  # ERROR rows never enter the buffer (ref :186-189)
    assert len(a.last_error_results) == 1
    err = a.last_error_results[0]
    assert err["state"] == "ERROR" and err["state_id"] == -1
    assert err["batch_id"] == 3
    assert err["batch_running_ms"] == 2000  # 100 rows / 50 rps
    assert err["critical_ms"] == 0
    # the failed attempt consumed the A3 interval (QueryInsightsManager:182)
    assert a._last_analyzed_time_ms == int(clock() * 1000)


def test_timeout_retries_until_self_shutdown(spark):
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    rep_events = []

    class Rep:
        def send_insights_event(self, info):
            rep_events.append(("insights", info))

        def send_terminated_event(self, info):
            rep_events.append(("terminated", info))

    a = LiveAnalyzer(spark, cap, config=_cfg(), reporters=[Rep()], clock=clock)
    clock.advance(3600)
    assert a.tick()  # healthy tick: creates the reporting state
    a._analyze_once = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
    for _ in range(3):
        clock.advance(3600)
        assert a.tick() == []
    assert a.stopped
    assert a.last_error_results and a.last_error_results[0]["state"] == "ERROR"
    assert rep_events and rep_events[-1][0] == "terminated"


def test_live_gauges_latest_result(spark):
    """A20 live accessor: gauges read the newest buffered result per query,
    named spark.streaming.<queryName ?? queryId>."""
    cap = ProgressCapture()
    cap.rows = [
        _fake_progress("q1", 0, 1_700_000_000_000),
        _fake_progress("q1", 1, 1_700_000_060_000),
    ]
    clock = _Clock()
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock)
    clock.advance(3600)
    a.tick()
    g = a.gauges()
    assert set(g) == {"spark.streaming.q1"}  # unnamed query -> id
    vals = g["spark.streaming.q1"]
    assert vals["batchRunningTimeMillis"] == 2000  # newest batch (1)
    assert vals["expectedMicroBatchSLAMillis"] == 120000
    assert set(vals) == {
        "expectedMicroBatchSLAMillis", "batchRunningTimeMillis",
        "criticalTimeMillis", "streamingQueryState", "analysisTimeMillis",
    }


def test_api_attach_live_smoke(spark):
    """U4: StreamingLens(spark).attach_live() wires both listeners (progress
    + scheduler bridge) out of the box; stop() detaches and goes quiet."""
    from streaminglens_spark.api import StreamingLens

    sl = StreamingLens(spark)
    analyzer = sl.attach_live()
    assert analyzer.telemetry_provider is not None  # scheduler-backed
    assert analyzer.scheduler_capture is not None
    sl.stop()
    assert analyzer.stopped
    assert not analyzer.scheduler_capture.enabled


def test_incremental_tick_analyzes_only_new_batches(spark):
    """Task: per-tick work bounded by newly gated batches with 100+ retained
    batches -- and the incremental rows match a what-a-full-run-would-say
    check on the new batch."""
    cap = ProgressCapture()
    base = 1_700_000_000_000
    cap.rows = [_fake_progress("q1", b, base + b * 60_000) for b in range(150)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark,
        cap,
        config=_cfg({"streamingLens.maxResultsRetention": "200"}),
        clock=clock,
    )
    clock.advance(3600)
    first = a.tick()
    assert a.last_tick_analyzed_rows == 150
    assert len(first) == 150

    cap.rows.append(_fake_progress("q1", 150, base + 150 * 60_000))
    clock.advance(301)
    second = a.tick()
    assert a.last_tick_analyzed_rows == 1  # ONLY the new batch analyzed
    assert [r["batch_id"] for r in second] == [150]
    # identical semantics to the full pass: same classification fields as
    # batch 149's (all fixture batches here are alike except timestamps)
    r149 = next(r for r in first if r["batch_id"] == 149)
    assert second[0]["state"] == r149["state"]
    assert second[0]["batch_running_ms"] == r149["batch_running_ms"]


def test_live_sla_override_applied(spark):
    """Round-2 advice: per-query SLA overrides must reach live
    classification, not just batch-mode derive().  With a 1 s override the
    2 s batch flips from OVERPROVISIONED (120 s default) to UNHEALTHY, and
    the reported sla_ms is the override's."""
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]  # brt = 2000 ms
    clock = _Clock()
    overrides = {"q1": 1000}
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=clock, sla_overrides=overrides)
    clock.advance(3600)
    res = a.tick()
    assert res and res[0]["sla_ms"] == 1000
    assert res[0]["state"] == "UNHEALTHY"

    # the map is a LIVE view: reset behaves like the API's
    # reset_expected_micro_batch_sla on the next tick
    overrides.clear()
    cap.rows.append(_fake_progress("q1", 1, 1_700_000_060_000))
    clock.advance(3600)
    res2 = a.tick()
    assert res2 and res2[0]["sla_ms"] == 120000
    assert res2[0]["state"] == "OVERPROVISIONED"


def test_live_sla_override_on_error_path(spark):
    """The U3 ERROR(-1) result resolves the SLA through the override map
    too (the reference builds it via the tracker's getSLA)."""
    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark, cap, config=_cfg(), clock=clock, sla_overrides={"q1": 777}
    )
    a._analyze_once = lambda: (_ for _ in ()).throw(RuntimeError("boom"))
    clock.advance(3600)
    assert a.tick() == []
    assert a.last_error_results[0]["sla_ms"] == 777


def test_api_attach_live_shares_override_map(spark):
    """U4 + advice fix: update_expected_micro_batch_sla after attach_live
    is visible to the analyzer (shared reference, no copy)."""
    from streaminglens_spark.api import StreamingLens

    sl = StreamingLens(spark)
    analyzer = sl.attach_live()
    try:
        sl.update_expected_micro_batch_sla("orders", 5000)
        assert analyzer.sla_overrides == {"orders": 5000}
        sl.reset_expected_micro_batch_sla("orders")
        assert analyzer.sla_overrides == {}
    finally:
        sl.stop()


def test_gauge_sink_receives_named_gauges_after_tick(spark):
    """A20 publication (VERDICT r2 #5): a registered sink receives the five
    reference-named gauges for each query after a successful tick; callable
    sinks work too; a broken sink never fails the tick."""
    received = []

    class Sink:
        def publish(self, source_name, gauges):
            received.append((source_name, gauges))

    calls = []

    def callable_sink(source_name, gauges):
        calls.append(source_name)

    class Broken:
        def publish(self, source_name, gauges):
            raise RuntimeError("metrics down")

    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark, cap, config=_cfg(), clock=clock,
        gauge_sinks=[Sink(), Broken()],
    )
    a.register_gauge_sink(callable_sink)
    clock.advance(3600)
    assert a.tick()

    by_source = dict(received)
    assert "spark.streaming.q1" in by_source
    assert set(by_source["spark.streaming.q1"]) == {
        "expectedMicroBatchSLAMillis", "batchRunningTimeMillis",
        "criticalTimeMillis", "streamingQueryState", "analysisTimeMillis",
    }
    assert by_source["spark.streaming.q1"]["batchRunningTimeMillis"] == 2000
    assert "spark.streaming.q1" in calls  # callable form


def test_logging_gauge_sink_and_dropped_jobs_gauge(spark, caplog):
    """VERDICT r2 #8: with the scheduler bridge attached, gauges() surfaces
    the bridge's dropped (non-streaming) job count; the built-in
    LoggingGaugeSink renders every gauge line."""
    import logging

    from streaminglens_spark.streaming.reporters import LoggingGaugeSink

    class FakeSchedulerCapture:
        dropped_jobs = 7

        def purge_below(self, qid, bid):
            pass

    cap = ProgressCapture()
    cap.rows = [_fake_progress("q1", 0, 1_700_000_000_000)]
    clock = _Clock()
    a = LiveAnalyzer(
        spark, cap, config=_cfg(), clock=clock,
        telemetry_provider=lambda progress: None,  # progress-only path
        scheduler_capture=FakeSchedulerCapture(),
        gauge_sinks=[LoggingGaugeSink()],
    )
    clock.advance(3600)
    with caplog.at_level(logging.INFO, logger="streaminglens_spark.metrics"):
        assert a.tick()
    g = a.gauges()
    assert g["spark.streaming.schedulerBridge"] == {"droppedJobs": 7}
    assert any(
        "spark.streaming.schedulerBridge" in m and "droppedJobs=7" in m
        for m in caplog.messages
    )
    assert any("spark.streaming.q1" in m and "batchRunningTimeMillis=2000" in m
               for m in caplog.messages)


def test_live_sla_advisor_parity_and_gauges(spark):
    """r14 live advisor surface: sla_recommendations() is the batch
    q_sla_recommend over the captured progress (bit-equal -- same
    function, same rows), and publish_sla_recommendations() exposes the
    per-query recommended SLA as the spark.streaming.slaAdvisor gauge
    source; empty captures publish nothing."""
    from streaminglens_spark.operators.analysis import recommend_sla

    cap = ProgressCapture()
    t0 = 1_700_000_000_000
    rows = []
    off = 0
    for i in range(8):  # q1: varying batch gaps -> nontrivial quantiles
        rows.append(_fake_progress("q1", i, t0 + off))
        off += 500 + 137 * (i % 5)
    off = 0
    for i in range(6):  # q2: a second query in the same capture
        rows.append(_fake_progress("q2", i, t0 + off))
        off += 900 + 61 * (i % 3)
    cap.rows = rows
    a = LiveAnalyzer(spark, cap, config=_cfg(), clock=_Clock())

    exp = sorted(
        tuple(r) for r in recommend_sla(a.progress_df()).collect()
    )
    got = sorted(tuple(r) for r in a.sla_recommendations().collect())
    assert got == exp and len(got) == 2

    pub = a.publish_sla_recommendations()
    by_q = {r["query_id"]: r["recommended_sla_ms"]
            for r in recommend_sla(a.progress_df()).collect()}
    assert pub == by_q
    # surfaces through the A20 gauge snapshot (and thus every sink)
    assert a.gauges()["spark.streaming.slaAdvisor"] == pub

    # empty capture: nothing published, no gauge source created
    a2 = LiveAnalyzer(spark, ProgressCapture(), config=_cfg(), clock=_Clock())
    assert a2.publish_sla_recommendations() == {}
    assert "spark.streaming.slaAdvisor" not in a2.gauges()
