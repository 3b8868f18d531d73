"""Per-key behavioral sequence extraction (round-5 continued extension):
the events-table analog of document chunking -- sequence-model training
data (next-event prediction, session embeddings, churn models) needs
each user's event stream as an ORDERED example plus leakage-safe rolling
features, and both must be deterministic at 100 TB.

Spark shape: everything partitions by ``user_id`` -- the sequence
assembly is one groupBy with an in-group ``array_sort`` (sorting happens
INSIDE each user's collected array, never a global sort; a user's
history is bounded), and the rolling features are frame-bounded window
functions over the same partitioning.  All outputs are exact integers /
md5 digests, hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import _ev

SEQ_MAX_LEN = 50
ROLL_N = 5


def user_event_sequences(
    events: DataFrame, max_len: int = SEQ_MAX_LEN
) -> DataFrame:
    """One training example per user: the event-type sequence in
    (ts, event_id) order, truncated to ``max_len``.  Returns (user_id,
    n_events, seq_len, seq_md5, first_ms, last_ms) -- the digest stands
    in for the sequence payload so the cross-engine hash check covers
    ORDER, not just membership."""
    e = _ev(events)
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ms", "event_id", "event_type"))
        ),
        lambda x: x["event_type"],
    )
    seq = F.slice(ordered, 1, max_len)
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.size(seq).cast("long").alias("seq_len"),
        F.md5(F.concat_ws("|", seq).cast("binary")).alias("seq_md5"),
        F.min("ms").cast("long").alias("first_ms"),
        F.max("ms").cast("long").alias("last_ms"),
    )


def rolling_user_features(events: DataFrame, n: int = ROLL_N) -> DataFrame:
    """Leakage-safe rolling features per event: counts/sums over the
    user's PREVIOUS ``n`` events only (frame ``[-n, -1]`` -- the current
    event never sees itself, the classic target-leak guard) plus the gap
    to the immediately previous event.  Returns (event_id, user_id,
    prev_n, prev_cents, ms_since_prev) with NULL gap on each user's
    first event."""
    e = _ev(events)
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    frame = w.rowsBetween(-n, -1)
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(frame).cast("long").alias("prev_n"),
        F.coalesce(F.sum("cents").over(frame), F.lit(0))
        .cast("long")
        .alias("prev_cents"),
        (F.col("ms") - F.lag("ms").over(w)).cast("long").alias("ms_since_prev"),
    )


def props_stats(events: DataFrame) -> DataFrame:
    """Semi-structured payload extraction (round-5 continued extension):
    pull the integer ``k`` field out of the JSON ``props`` column with
    the JVM JSON path functions (no Python, no schema file) and roll it
    up per event type -- the "get the metrics out of the blob" pass
    every event pipeline runs over its semi-structured tail.  NULL or
    non-numeric extractions are counted, not silently dropped.  Returns
    (event_type, n_events, n_with_k, k_min, k_max, k_sum)."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(k).cast("long").alias("n_with_k"),
        F.min(k).cast("long").alias("k_min"),
        F.max(k).cast("long").alias("k_max"),
        F.sum(k).cast("long").alias("k_sum"),
    )
