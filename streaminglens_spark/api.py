"""Public API (reference U4: ``StreamingLens.scala:28-113``).

The reference is constructed with ``(sparkSession, options)`` plus three
convenience constructors, exposes SLA management and shutdown, and registers
two listeners.  The engine mirrors the constructor surface and SLA methods;
in batch mode the "listeners" are the telemetry derivation + pipeline, and
live mode (Structured Streaming listener bridge) mounts on the same class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import StreamingLensConfig
from .operators.pipeline import results_table
from .sources.loaders import load_table
from .telemetry import Telemetry, derive_telemetry


class StreamingLens:
    """Engine facade.

    Constructors (mirroring ``StreamingLens.scala:89-113``)::

        StreamingLens(spark, options={...})
        StreamingLens.with_reporter(spark, "my.Reporter")
        StreamingLens.with_sla(spark, 60_000)
        StreamingLens.with_sla_and_reporter(spark, 60_000, "my.Reporter")
    """

    def __init__(self, spark: SparkSession, options: dict[str, str] | None = None):
        self.spark = spark
        self.config = StreamingLensConfig(options)
        # per-query SLA override map (StreamingAppTracker.scala:41,76-91)
        self._sla_overrides: dict[str, int] = {}
        self._reporters: list = []
        self._live = None
        self._live_captures: tuple | None = None

    # -- convenience constructors -------------------------------------
    @classmethod
    def with_reporter(cls, spark: SparkSession, reporter_class_name: str) -> "StreamingLens":
        return cls(spark, {
            "streamingLens.reporter.enabled": "true",
            "streamingLens.reporter.className": reporter_class_name,
        })

    @classmethod
    def with_sla(cls, spark: SparkSession, sla_millis: int) -> "StreamingLens":
        return cls(spark, {"streamingLens.expectedMicroBatchSLAMillis": str(sla_millis)})

    @classmethod
    def with_sla_and_reporter(
        cls, spark: SparkSession, sla_millis: int, reporter_class_name: str
    ) -> "StreamingLens":
        return cls(spark, {
            "streamingLens.expectedMicroBatchSLAMillis": str(sla_millis),
            "streamingLens.reporter.enabled": "true",
            "streamingLens.reporter.className": reporter_class_name,
        })

    # -- SLA management (StreamingLens.scala:81-87) -------------------
    def update_expected_micro_batch_sla(self, query_key: str, sla_millis: int) -> None:
        self._sla_overrides[query_key] = int(sla_millis)

    def reset_expected_micro_batch_sla(self, query_key: str) -> None:
        self._sla_overrides.pop(query_key, None)

    # -- reporter plugin registry (U1, Python duck-typed) -------------
    def register_reporter(self, reporter) -> None:
        """Register a duck-typed reporter with
        ``send_insights_event(info: str)`` (reference
        ``reporter/StreamingLensEventsReporterInterface.scala:20-28``)."""
        self._reporters.append(reporter)

    # -- batch-mode analysis ------------------------------------------
    def derive(self, events: DataFrame) -> Telemetry:
        t = derive_telemetry(self.spark, events)
        if self._sla_overrides:
            extra = self.spark.createDataFrame(
                list(self._sla_overrides.items()), "query_key string, sla_ms bigint"
            )
            # runtime overrides win over the derived config (anti-join out
            # any shadowed keys, then append the overrides)
            t.sla_config = t.sla_config.join(
                extra.select("query_key"), "query_key", "left_anti"
            ).unionByName(extra)
        return t

    def analyze(self, sf_dir: str) -> DataFrame:
        """Run the full health-analysis pipeline over the fixture telemetry."""
        return results_table(
            self.derive(load_table(self.spark, sf_dir, "events")),
            default_sla_ms=self.config.expected_micro_batch_sla_millis,
        )

    # -- live mode -----------------------------------------------------
    def attach_live(self, with_scheduler: bool = True):
        """Register the two live listeners and return the analyzer -- the
        engine equivalent of the reference constructor's listener wiring
        (``StreamingLens.scala:59-79``): a ``StreamingQueryListener`` for
        progress (S12-S14) and, by default, the scheduler-listener bridge
        for job/stage/task telemetry (S1-S11) so critical-path analysis is
        real out of the box.  Call ``analyzer.tick()`` per trigger or wrap a
        sink with ``foreach_batch_monitor``."""
        from .streaming.live import LiveAnalyzer, attach, detach

        if self._live is not None:
            raise RuntimeError("live mode already attached; call stop() first")
        cap = attach(self.spark)
        sched = None
        if with_scheduler:
            from .streaming.scheduler import attach_scheduler

            try:
                sched = attach_scheduler(self.spark)
            except Exception:
                # no callback server (e.g. Spark Connect): don't leak the
                # progress listener we just registered
                detach(self.spark, cap)
                raise
        self._live = LiveAnalyzer(
            self.spark,
            cap,
            config=self.config,
            reporters=list(self._reporters),
            scheduler_capture=sched,
            # pass the override map BY REFERENCE so update/reset_expected_
            # micro_batch_sla take effect on the next live tick, matching the
            # reference's tracker-backed per-query SLA resolution
            sla_overrides=self._sla_overrides,
        )
        self._live_captures = (cap, sched)
        return self._live

    def stop(self) -> None:
        """stopStreamingLens(): stop live analysis (terminated events),
        detach listeners, drop reporters and overrides
        (``StreamingLens.scala:66-79``)."""
        if self._live is not None:
            self._live.stop()
            cap, sched = self._live_captures
            from .streaming.live import detach

            detach(self.spark, cap)
            if sched is not None:
                from .streaming.scheduler import detach_scheduler

                detach_scheduler(self.spark, sched)
            self._live = None
            self._live_captures = None
        self._reporters.clear()
        self._sla_overrides.clear()
