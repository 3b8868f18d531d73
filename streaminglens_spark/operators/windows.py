"""Event-time windowed aggregations over the ``events`` stream table --
the engine's generalization of the reference's processing-time gates and
islanding (SURVEY §2d "streaming-only"): tumbling / sliding / session
windows, watermark-ready.

In batch mode these run on the ``events`` fixture and are DuckDB-checkable;
in live mode the same expressions run under ``readStream`` +
``withWatermark`` (see ``streaming/live.py``).  Double sums are carried as
exact integer cents so the oracle comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_MS = 3_600_000
HALF_HOUR_MS = 1_800_000
SESSION_GAP_MS = 600_000  # 10 minutes


def _ev(events: DataFrame) -> DataFrame:
    """events with epoch-millis ts and exact integer value_cents."""
    dtype = dict(events.dtypes)["ts"]
    if dtype == "bigint":
        # truncating nanos->ms, matching DuckDB epoch_ms (which also
        # truncates toward zero on sub-ms pre-1970 instants -- measured)
        ms = F.expr("ts div 1000000")
    elif dtype.startswith("timestamp_ntz"):
        # non-UTC-adjusted micros parquet; session TZ is UTC (see telemetry)
        ms = F.unix_millis(F.col("ts").cast("timestamp"))
    else:
        ms = F.unix_millis("ts")
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        ms.alias("ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows: event count + exact value sum per window.
    Spark's ``window()`` is epoch-aligned, i.e. start = floor(ms / 1h) * 1h."""
    e = _ev(events)
    w = F.window(F.timestamp_millis(F.col("ms")), "1 hour")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            F.unix_millis("w.end").alias("window_end_ms"),
            "n_events",
            "sum_cents",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    e = _ev(events)
    w = F.window(F.timestamp_millis(F.col("ms")), "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            F.unix_millis("w.end").alias("window_end_ms"),
            "n_events",
            "sum_cents",
        )
    )


def time_rollup(events: DataFrame) -> DataFrame:
    """Hierarchical time rollup (the "hypertable continuous aggregate"
    shape): one pass producing hour-level, day-level and grand-total rows
    via ``ROLLUP(day, hour)`` -- Catalyst expands the grouping sets and
    plans partial (map-side) + final aggregation, so the three granularities
    cost one shuffle, not three.  Day/hour are pure integer epoch
    arithmetic (``ms div 86400000`` / ``(ms % 86400000) div 3600000``), no
    engine date formatting involved.  ``gid`` is ``grouping_id()``:
    0 = (day, hour) leaf, 1 = day subtotal, 3 = grand total.
    Returns (day_idx, hr, gid, n_events, sum_cents)."""
    e = _ev(events).select(
        # TRUNCATING division, matching DuckDB's integer `//` (which also
        # truncates -- measured, contra the r3 advice premise) and `%`
        # (sign of dividend, both engines): pre-1970 ms stay bit-exact
        # cross-engine (tests/test_advice_r4.py pins negative inputs)
        F.expr("ms div 86400000").alias("day_idx"),
        F.expr("(ms % 86400000) div 3600000").alias("hr"),
        "cents",
    )
    return (
        e.rollup("day_idx", "hr")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select("day_idx", "hr", "gid", "n_events", "sum_cents")
    )


def session_agg(events: DataFrame) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (``F.session_window``): session end = last event + gap; a new session
    starts when the inter-event gap is >= the gap.  This is exactly the A6
    islanding shape applied to event time."""
    e = _ev(events)
    w = F.session_window(F.timestamp_millis(F.col("ms")), "10 minutes")
    return (
        e.groupBy("user_id", w.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            F.unix_millis("w.end").alias("session_end_ms"),
            "n_events",
            "sum_cents",
        )
    )
