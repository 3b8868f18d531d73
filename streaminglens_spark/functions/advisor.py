"""Configuration advisors (round-5 continued extension): the reference's
whole product is *recommendations* (state buckets -> "increase batch
interval", source analysis -> "reduce maxOffsetsPerTrigger"); these
operators extend that idea to the two knobs every large Spark corpus job
actually mis-sets -- partition sizing and watermark delay -- deriving
the recommendation from the DATA instead of folklore.

Both emit exact integers only, so the advice itself is oracle-checkable
(the ``q_sla_recommend`` pattern: measure, don't guess).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TARGET_PARTITION_BYTES = 128 * 1024 * 1024  # shuffle-partition target
TARGET_FILE_BYTES = 512 * 1024 * 1024       # output-file target

WATERMARK_DELAYS_MS = (0, 60_000, 300_000, 3_600_000)


def partition_advisor(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Size `spark.sql.shuffle.partitions` and output-file counts from
    the table's actual payload bytes: one aggregate scan ->
    (n_rows, data_bytes, rec_shuffle_partitions, rec_output_files,
    rows_per_partition).  Targets: 128 MB per shuffle partition (the
    spill-avoidance rule of thumb the module docstring of ``bench.py``
    sizes by) and 512 MB per output file (object-store friendly).
    Ceil-division in exact integers; empty tables recommend 1."""
    t_part = TARGET_PARTITION_BYTES
    t_file = TARGET_FILE_BYTES
    agg = documents.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.octet_length(F.col(text_col))), F.lit(0))
        .cast("long")
        .alias("data_bytes"),
    )
    parts = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(data_bytes + {t_part} - 1) div {t_part}"),
    )
    files = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(data_bytes + {t_file} - 1) div {t_file}"),
    )
    return agg.select(
        "n_rows",
        "data_bytes",
        parts.alias("rec_shuffle_partitions"),
        files.alias("rec_output_files"),
        F.expr("n_rows div greatest(1, (data_bytes + "
               f"{t_part} - 1) div {t_part})")
        .cast("long")
        .alias("rows_per_partition"),
    )


def watermark_advisor(
    events: DataFrame, delays_ms: tuple[int, ...] = WATERMARK_DELAYS_MS
) -> DataFrame:
    """Choose a watermark delay from measured out-of-orderness: for each
    candidate delay, how many events would a stream with that watermark
    DROP?  An event is late by ``running_max(ts) - ts`` relative to the
    events that already arrived in its key's stream (arrival order =
    event_id; per-user, because cross-key reordering is what Spark's
    per-partition watermark tolerates anyway -- and because a per-key
    window keeps the measurement partitioned, never a global sort).

    Returns one row per candidate: (delay_ms, n_events, n_late,
    permille) -- pick the smallest delay whose permille is acceptable.
    Exact integers throughout (epoch millis)."""
    from ..operators.windows import _ev

    e = _ev(events).select("event_id", "user_id", "ms")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late_by = (F.max("ms").over(w) - F.col("ms")).alias("late_by")
    scored = e.select(late_by)
    delays = F.array(*[F.lit(int(d)).cast("long") for d in delays_ms])
    return (
        scored.select("late_by", F.explode(delays).alias("delay_ms"))
        .groupBy("delay_ms")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("late_by") > F.col("delay_ms")).cast("long"))
            .cast("long")
            .alias("n_late"),
        )
        .select(
            "delay_ms",
            "n_events",
            "n_late",
            F.expr("n_late * 1000 div n_events").cast("long").alias("permille"),
        )
    )
