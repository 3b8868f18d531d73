"""Live mode: the engine's Structured Streaming surface.

Reference wiring (EP1-EP3): two listeners feed driver-local maps and a
per-query daemon thread analyzes every progress event
(``listener/QueryProgressListener.scala:34-89``,
``QueryInsightsManager.scala:140-192``).

Engine wiring (Spark-first):

- ``ProgressCapture`` is a ``StreamingQueryListener`` (the public PySpark
  listener API) that captures each ``StreamingQueryProgress`` into rows
  matching the ``progress`` telemetry schema.
- ``LiveAnalyzer.tick()`` -- called per trigger (e.g. from ``foreachBatch``)
  or on a schedule -- turns captured progress into a DataFrame and runs the
  SAME batch pipeline (A1 bounds -> A10 classification), honoring the
  reference's control-plane semantics:
    * A2 min-batches gate + A3 analysis-interval gate,
    * A19 results ring buffer (``maxResultsRetention``),
    * A18 progress retention purge,
    * U2 retry-then-self-shutdown (``maxRetries``),
    * U3 timeout-bounded analysis (``maxAnalysisTimeSeconds``),
    * U1 duck-typed reporter plugins (``send_insights_event(info)``).

Job/stage/task telemetry in live mode comes from a pluggable
``telemetry_provider`` (e.g. the Spark REST status API when the UI is up;
tests inject the deterministic derivation).  Without one, critical time
degrades gracefully to the batch running time (no job spans to subtract).
"""

from __future__ import annotations

import concurrent.futures
import threading
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..config import StreamingLensConfig

try:  # the listener API needs the JVM bridge; guard for doc builds
    from pyspark.sql.streaming import StreamingQueryListener
except Exception:  # pragma: no cover
    StreamingQueryListener = object  # type: ignore


PROGRESS_SCHEMA = (
    "query_id string, query_name string, run_id string, batch_id bigint,"
    " ts_ms bigint, num_input_rows bigint, processed_rps double,"
    " sources array<string>, sink string"
)


def _iso_to_ms(ts: str) -> int:
    """A22 -- ISO-8601 'yyyy-MM-ddTHH:mm:ss.SSSZ' -> epoch millis
    (reference ``analyzer/StreamingQueryAnalyzer.scala:43-44,138-141``)."""
    from datetime import datetime, timezone

    dt = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fZ").replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class ProgressCapture(StreamingQueryListener):
    """S12/S13/S14 -- capture per-query progress snapshots
    (reference ``listener/QueryProgressListener.scala:34-89``,
    ``QueryInsightsManager.scala:198-204``)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows: list[tuple] = []
        self.terminated: set[str] = set()

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = (
            str(p.id),
            p.name,
            str(p.runId),
            int(p.batchId),
            _iso_to_ms(p.timestamp),
            int(p.numInputRows),
            float(p.processedRowsPerSecond or 0.0),
            [s.description for s in p.sources],
            p.sink.description,
        )
        with self._lock:
            self.rows.append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self.terminated.add(str(event.id))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self.rows)

    def purge_below(self, query_id: str, batch_id: int) -> None:
        """A18 -- evict progress rows of purged batches."""
        with self._lock:
            self.rows = [
                r for r in self.rows if not (r[0] == query_id and r[3] <= batch_id)
            ]


class LiveAnalyzer:
    """Per-trigger analysis driver with the reference's control-plane
    semantics (gates, retention, retries, timeout, reporters)."""

    def __init__(
        self,
        spark: SparkSession,
        capture: ProgressCapture,
        config: StreamingLensConfig | None = None,
        telemetry_provider: Callable[[DataFrame], "object | None"] | None = None,
        reporters: list | None = None,
        clock: Callable[[], float] = time.time,
    ) -> None:
        self.spark = spark
        self.capture = capture
        self.config = config or StreamingLensConfig()
        self.telemetry_provider = telemetry_provider
        self.reporters = reporters or []
        self.clock = clock
        self.results: list[dict] = []  # ring buffer (A19)
        self.retries = 0  # U2
        self.stopped = False
        self._last_analyzed_batch: dict[str, int] = {}  # A2, per query
        self._last_analyzed_time_ms = 0  # A3 (0 => first tick analyzes)
        self._last_purged_batch: dict[str, int] = {}  # A18
        self._last_event_time_ms = int(self.clock() * 1000)  # A16

    # -- plumbing ------------------------------------------------------
    def progress_df(self) -> DataFrame:
        return self.spark.createDataFrame(self.capture.snapshot(), PROGRESS_SCHEMA)

    def _analyze_once(self) -> list[dict]:
        """One gated analysis pass over all captured progress; returns new
        results rows (dicts)."""
        from pyspark.sql import functions as F

        from ..operators.pipeline import results_table
        from ..telemetry import Telemetry, derive_sla_config

        progress = self.progress_df()
        if progress.isEmpty():
            return None  # no-op: nothing captured yet

        telemetry = self.telemetry_provider(progress) if self.telemetry_provider else None
        if telemetry is None:
            # progress-only degradation: no job spans -> walltime 0, cp 0
            empty_jobs = self.spark.createDataFrame(
                [],
                "query_id string, batch_id bigint, job_id bigint, sql_exec_id bigint,"
                " start_ms bigint, end_ms bigint, description string",
            )
            empty_stages = self.spark.createDataFrame(
                [],
                "stage_id bigint, job_id bigint, parent_ids array<bigint>,"
                " num_tasks bigint, start_ms bigint, end_ms bigint",
            )
            empty_tasks = self.spark.createDataFrame(
                [],
                "task_id bigint, stage_id bigint, job_id bigint, executor_id string,"
                " launch_ms bigint, finish_ms bigint, duration_ms bigint, failed boolean",
            )
            empty_execs = self.spark.createDataFrame(
                [], "executor_id string, host string, cores bigint, start_ms bigint,"
                " end_ms bigint"
            )
            telemetry = Telemetry(
                progress=progress,
                jobs=empty_jobs,
                stages=empty_stages,
                tasks=empty_tasks,
                executors=empty_execs,
                sla_config=derive_sla_config(self.spark),
            )

        # A2 gate: only batches newer than the per-query watermark by
        # >= minBatches get a fresh analysis
        gate_rows = []
        for r in self.capture.snapshot():
            qid, bid = r[0], r[3]
            last = self._last_analyzed_batch.get(qid, -1)
            if bid - last >= self.config.min_batches:
                gate_rows.append((qid, bid))
        if not gate_rows:
            return None  # no-op: every batch gated out
        gate_df = self.spark.createDataFrame(gate_rows, "query_id string, batch_id bigint")

        out = (
            results_table(
                telemetry, default_sla_ms=self.config.expected_micro_batch_sla_millis
            )
            .join(F.broadcast(gate_df), ["query_id", "batch_id"], "left_semi")
            .collect()
        )
        return [row.asDict() for row in out]

    # -- the per-trigger entry point ----------------------------------
    def tick(self) -> list[dict]:
        """Run one gated, timeout-bounded, retry-tracked analysis pass
        (the engine's ``analysisTask``, ``QueryInsightsManager.scala:149-178``)."""
        if self.stopped:
            return []
        now_ms = int(self.clock() * 1000)
        # A3 interval gate
        if now_ms - self._last_analyzed_time_ms < self.config.analysis_interval_minutes * 60_000:
            return []
        try:
            # U3 -- timeout-bounded analysis
            with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
                fut = pool.submit(self._analyze_once)
                new_results = fut.result(timeout=self.config.max_analysis_time_seconds)
            self.retries = 0  # reset on success (U2)
            if new_results is None:
                # no-op tick (no progress captured / nothing newly gated in):
                # does NOT consume the A3 interval -- the reference only ever
                # analyzes on a progress event, so an idle tick must not
                # starve the next real one
                return []
        except Exception:
            # U2 -- retry counting; at maxRetries, self-shutdown
            self.retries += 1
            if self.retries >= self.config.max_retries:
                self.stopped = True
            return []

        self._last_analyzed_time_ms = now_ms
        for r in new_results:
            if r["state_id"] != 0:
                self._last_analyzed_batch[r["query_id"]] = max(
                    self._last_analyzed_batch.get(r["query_id"], -1), r["batch_id"]
                )
        self.results.extend(new_results)

        # A19 ring buffer per query
        by_query: dict[str, list[dict]] = {}
        for r in sorted(self.results, key=lambda x: (x["query_id"], x["batch_id"])):
            by_query.setdefault(r["query_id"], []).append(r)
        self.results = [
            r
            for rows in by_query.values()
            for r in rows[-self.config.max_results_retention:]
        ]

        # A18 purge: progress retention per query
        for qid, rows in by_query.items():
            if not rows:
                continue
            latest = rows[-1]
            if latest["batch_running_ms"] == 0:
                continue  # zero-row batches never purge (QueryInsightsManager:235)
            last_purged = self._last_purged_batch.get(qid, -1)
            if latest["batch_id"] - last_purged >= self.config.max_batches_retention:
                self.capture.purge_below(qid, latest["batch_id"])
                self._last_purged_batch[qid] = latest["batch_id"]

        # U1 reporters, behind the A16 reporting-interval gate
        # (helper/StreamingLensReportingHelper.scala:66-78,199-201: events at
        # most every reportingIntervalMinutes, tracking lastEventTime)
        interval_ms = self.config.reporting_interval_minutes * 60_000
        if (
            new_results
            and self.reporters
            and now_ms - self._last_event_time_ms >= interval_ms
        ):
            import json

            info = json.dumps(
                {"results": [
                    {k: v for k, v in r.items()} for r in new_results
                ]},
                default=str,
            )
            for rep in self.reporters:
                try:
                    rep.send_insights_event(info)
                except Exception:
                    pass  # fail-open like the reference (sendEvent catch)
            self._last_event_time_ms = now_ms
        return new_results


def foreach_batch_monitor(analyzer: LiveAnalyzer, user_fn=None):
    """Wrap a user's ``foreachBatch`` function with per-trigger analysis --
    the engine's equivalent of the reference's "analysis runs after every
    progress event" wiring (EP3), but on Spark's own micro-batch callback:

        cap = attach(spark)
        analyzer = LiveAnalyzer(spark, cap)
        (df.writeStream
           .foreachBatch(foreach_batch_monitor(analyzer, my_sink_fn))
           .start())

    The user function runs first (the actual sink work); the gated analysis
    tick follows.  Analysis failures never fail the batch (fail-open, like
    the reference's listener guards) -- they feed the U2 retry counter
    inside ``tick`` instead.
    """

    def _fn(batch_df, batch_id: int) -> None:
        if user_fn is not None:
            user_fn(batch_df, batch_id)
        try:
            analyzer.tick()
        except Exception:
            pass

    return _fn


def attach(spark: SparkSession) -> ProgressCapture:
    """Register a ProgressCapture on the session's stream manager
    (engine EP1; reference ``StreamingLens.scala:59-79``)."""
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    return cap


def detach(spark: SparkSession, cap: ProgressCapture) -> None:
    spark.streams.removeListener(cap)
