"""Parquet sink round-trip and live-mode analysis with a real telemetry
provider (full critical-path pipeline on live progress)."""

from __future__ import annotations

import tempfile

from streaminglens_spark.sources.loaders import load_table
from streaminglens_spark.sources.sinks import read_results, write_results
from streaminglens_spark.operators.pipeline import results_table
from streaminglens_spark.telemetry import derive_telemetry
from tests.conftest import SF_DIR


def test_results_parquet_roundtrip(spark):
    results = results_table(derive_telemetry(spark, load_table(spark, SF_DIR, "events")))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/results"
        write_results(results, path, mode="overwrite")
        back = read_results(spark, path)
        assert back.count() == results.count()
        assert set(back.columns) == set(results.columns)
        # partition pruning: a single-query read scans one partition
        one = back.filter(back.query_id.endswith("0"))
        assert one.count() == results.filter(results.query_id.endswith("0")).count()


def test_live_analysis_with_telemetry_provider(spark):
    """When a telemetry provider supplies job/stage/task tables, live mode
    runs the FULL critical-path analysis (not the progress-only
    degradation) -- states beyond OVERPROVISIONED become reachable."""
    from streaminglens_spark.streaming.live import LiveAnalyzer, ProgressCapture
    from tests.test_streaming import _Clock, _cfg

    events = load_table(spark, SF_DIR, "events")
    t = derive_telemetry(spark, events)

    # feed the real derived progress rows through the capture
    cap = ProgressCapture()
    cap.rows = [
        (
            r["query_id"], r["query_name"], r["run_id"], r["batch_id"], r["ts_ms"],
            r["num_input_rows"], r["processed_rps"], list(r["sources"]), r["sink"],
        )
        for r in t.progress.collect()
    ]

    clock = _Clock()
    analyzer = LiveAnalyzer(
        spark, cap, config=_cfg(), telemetry_provider=lambda progress: t, clock=clock
    )
    clock.advance(3600)
    results = analyzer.tick()
    states = {r["state"] for r in results}
    # the derived fixture produces a mix (clickstream has a 4s SLA)
    assert "UNDERPROVISIONED" in states or "OPTIMUM" in states
    batch_results = {
        (r["query_id"], r["batch_id"]): r for r in results_table(t).collect()
    }
    for r in results:
        expected = batch_results[(r["query_id"], r["batch_id"])]
        assert r["state"] == expected["state"]
        assert r["critical_ms"] == expected["critical_ms"]
