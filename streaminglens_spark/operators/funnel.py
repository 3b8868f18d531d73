"""Funnel analysis over the events table (round-5 extension): ordered
step-conversion counts -- the product-analytics staple (signup -> view
-> purchase within a horizon) that any events-table engine is expected
to answer, and a shape worth pinning because the naive spelling
(self-join per step pair over RAW events) explodes on hot users.

Semantics (the classic strict-order funnel): a user converts step i
when they have an S_i event STRICTLY after their step-(i-1) conversion
time, and the whole journey must fit inside ``horizon_ms`` of the
step-0 entry.  Each step's conversion time is the EARLIEST qualifying
event (greedy-earliest is the standard convention and makes the result
a pure function of the event multiset -- no tie ambiguity because
(ts, event_id) ordering is total).

Spark shape: one pre-aggregation per step over the events scan
(``groupBy(user).min(ts)`` with the step's filter pushed into the scan
-- map-side partial agg, so a hot user's million events reduce before
the shuffle), then k-1 broadcast-size-independent equi-joins on
user_id, each followed by another min-aggregation.  Everything is
hash-partitioned by user_id; AQE coalesces the small intermediate
joins.  No window over raw events, no self-join of the event table.
All timestamps are exact epoch-millis integers, so the counts are
engine- and partitioning-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FUNNEL_STEPS = ("signup", "view", "purchase")
FUNNEL_HORIZON_MS = 6 * 3600 * 1000


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    horizon_ms: int = FUNNEL_HORIZON_MS,
) -> DataFrame:
    """(step_idx, step, n_users): users whose earliest qualifying event
    chain reaches each step inside the horizon; n_users is
    non-increasing in step_idx by construction."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    from .windows import _ev  # shared exact nanos/ntz/timestamp -> ms rule

    ev = _ev(events).select("user_id", "event_type", "ms")
    reached = (
        ev.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ms").alias("t"))
        .withColumn("entry", F.col("t"))
    )
    out_rows = [(0, steps[0], reached)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = ev.filter(F.col("event_type") == step).select(
            "user_id", F.col("ms").alias("nms")
        )
        reached = (
            reached.join(nxt, "user_id")
            .filter(
                (F.col("nms") > F.col("t"))
                & (F.col("nms") <= F.col("entry") + F.lit(horizon_ms))
            )
            .groupBy("user_id", "entry")
            .agg(F.min("nms").alias("t"))
        )
        out_rows.append((i, step, reached))
    counts = None
    for i, step, df in out_rows:
        c = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("long").alias("step_idx"),
            F.lit(step).alias("step"),
            "n_users",
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


RETENTION_WEEK_MS = 7 * 86_400_000


def retention_cohorts(
    events: DataFrame,
    anchor: str = "signup",
    bucket_ms: int = RETENTION_WEEK_MS,
) -> DataFrame:
    """Cohort retention (the funnel's sibling): users are cohorted by
    the epoch-aligned week of their FIRST ``anchor`` event, and each
    cohort's activity is counted per whole-week offset from that first
    event -- the (cohort x week) retention triangle every growth
    dashboard draws.

    Spark shape: one ``groupBy(user).min(ms)`` for the anchor (map-side
    reduced), one join back to events on user_id, then a distinct +
    count over (cohort, offset, user) -- two shuffles total, all
    hash-partitioned by user/cohort, exact integer week arithmetic
    (truncating ``div`` on non-negative offsets), so the triangle is
    engine- and partitioning-exact.  Events BEFORE a user's anchor are
    excluded (offset would be negative: pre-signup anonymous activity
    is not retention).  Returns (cohort_start_ms, week_offset,
    n_active); ``n_active`` at offset 0 is the cohort size (the anchor
    event itself lands there)."""
    from .windows import _ev as _evf

    ev = _evf(events).select("user_id", "event_type", "ms")
    first = (
        ev.filter(F.col("event_type") == anchor)
        .groupBy("user_id")
        .agg(F.min("ms").alias("t0"))
    )
    joined = ev.join(first, "user_id").filter(F.col("ms") >= F.col("t0"))
    buckets = joined.select(
        "user_id",
        (F.expr(f"t0 div {bucket_ms}") * bucket_ms).alias("cohort_start_ms"),
        F.expr(f"(ms - t0) div {bucket_ms}").alias("week_offset"),
    ).distinct()
    return buckets.groupBy("cohort_start_ms", "week_offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
