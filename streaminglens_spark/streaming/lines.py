"""Streaming cross-document line dedup (r11 extension): the incremental
counterpart of ``functions/text.py::line_dedup`` -- every distinct
nonempty line survives only at its FIRST occurrence across the whole
stream's history, and every later copy (in any later batch, or later in
the same batch) is removed from its document at ingest time.

Semantics.  The committed state is the set of line fingerprints
(md5) ever kept.  Per batch: lines already in the state are dropped
everywhere; lines NEW to the stream elect their keeper occurrence
within the batch (min (doc_id, position)) -- so with document ids
increasing across batches, the stream's verdicts are BIT-IDENTICAL to
running the batch operator over the concatenated corpus (pinned by
``tests/test_streaming_lines.py``): the earliest batch containing a
line holds its global minimum (doc_id, pos).

The keeper election reuses the batch operator's no-content-key-join
shape: one groupBy(line) min(struct) whose result table IS the batch's
kept occurrence set; the only content-keyed operation against state is
a left-anti join on the line FINGERPRINT (md5 -- one row per distinct
line in the state, so a template line that arrives a million times
meets exactly one state row).

Durability is the repo's shard contract: per batch ONE atomic
``_COMMITTED`` marker seals the ``lines`` table (the batch's NEWLY-kept
fingerprints).  A replayed batch recomputes against the pre-batch view
(its own shard excluded) and re-delivers byte-identically; restart
needs no driver state.  Per-trigger reads are O(1) generations +
O(recent) shards: every ``compact_every`` committed batches the
per-batch ``lines`` shards fold into one generation
(``ingest.compact_tables``, r11 ADVICE -- without it the per-trigger
read cost grew O(total batches) over the stream's life), with
``src_batch`` provenance keeping compacted batches replayable.

Delivery: per batch doc, (doc_id, n_lines, n_kept, clean_len,
clean_md5) -- the batch operator's output convention (digests, never
re-shipped text).  Gauges publish under
``spark.streaming.lineDedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .annmaint import _write_shard_batch
from .ingest import (
    INDEX_COMPACT_EVERY,
    _BatchDirCache,
    committed_table_view,
    maybe_compact_tables,
)

LINES_GAUGE_SOURCE = "spark.streaming.lineDedup"

_LINES_SCHEMA = "line_md5 string"
_LINES_TABLES = {"lines": _LINES_SCHEMA}


def _committed_lines(spark, state_path, dir_cache, exclude_batch=None):
    return committed_table_view(
        spark, state_path, "lines", _LINES_SCHEMA, dir_cache,
        exclude_batch=exclude_batch,
    )


def dedup_lines_of_batch(
    batch_df: DataFrame, seen: DataFrame, key: str = "doc_id"
):
    """The pure batch-shaped core: returns (cleaned, new_lines).

    ``cleaned`` is (doc_id, n_lines, n_kept, clean_len, clean_md5) for
    every batch doc -- lines in ``seen`` dropped everywhere, new lines
    kept only at their min-(doc_id, pos) occurrence.  ``new_lines`` is
    the (line_md5) set this batch adds to the state.  A pure function
    of (batch, seen)."""
    from ..cache import track

    occ = batch_df.select(
        F.col(key).alias("doc_id"),
        F.posexplode(F.split("text", "\n")).alias("pos", "line"),
    ).filter(F.length("line") > 0)
    occ = occ.withColumn("line_md5", F.md5(F.col("line").cast("binary")))
    fresh = track(occ.join(seen, "line_md5", "left_anti"))
    keeper = fresh.groupBy("line_md5").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    kept = (
        fresh.join(
            keeper.select(
                "line_md5",
                F.col("k.doc_id").alias("doc_id"),
                F.col("k.pos").alias("pos"),
            ),
            ["line_md5", "doc_id", "pos"],
        )
        .select("doc_id", "pos", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean"),
    )
    n_lines = F.size(
        F.filter(F.split("text", "\n"), lambda x: F.length(x) > 0)
    ).cast("long")
    cleaned = (
        batch_df.select(F.col(key).alias("doc_id"), n_lines.alias("n_lines"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias(
                "n_kept"
            ),
            F.length(F.coalesce(F.col("clean"), F.lit("")))
            .cast("long")
            .alias("clean_len"),
            F.md5(
                F.coalesce(F.col("clean"), F.lit("")).cast("binary")
            ).alias("clean_md5"),
        )
    )
    return cleaned, keeper.select("line_md5")


def line_dedup_monitor(
    state_path: str,
    cleaned_sink=None,
    analyzer=None,
    gauge_sinks=None,
    key: str = "doc_id",
    compact_every: int = INDEX_COMPACT_EVERY,
):
    """Build the ``foreachBatch`` body.  Input stream schema: (doc_id,
    text, ...); document ids must be globally increasing across batches
    (the first-occurrence orientation).  ``cleaned_sink(df, batch_id)``
    receives each batch's cleaned-doc digests -- exactly once under
    replay.  Every ``compact_every`` committed batches the lines shards
    fold into one generation (0 disables)."""
    from ..cache import tracked_caches
    from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

    dir_cache = _BatchDirCache()

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from ..cache import track

        with tracked_caches():
            _run_batch(batch_df, batch_id, track)

    def _run_batch(batch_df: DataFrame, batch_id: int, track) -> None:
        spark_ = batch_df.sparkSession
        out = f"{state_path}/batch_id={batch_id}"
        fs, _ = _hadoop_fs(spark_, out)
        marker = spark_._jvm.org.apache.hadoop.fs.Path(
            f"{out}/{_COMMIT_MARKER}"
        )
        replayed = fs.exists(marker)
        seen = _committed_lines(
            spark_, state_path, dir_cache,
            exclude_batch=int(batch_id) if replayed else None,
        )
        batch = track(batch_df.select(key, "text"))
        cleaned, new_lines = dedup_lines_of_batch(batch, seen, key=key)
        cleaned = track(cleaned)
        if not replayed:
            _write_shard_batch(
                spark_, state_path, batch_id, {"lines": new_lines}
            )
        agg = cleaned.agg(
            F.count(F.lit(1)).alias("nd"),
            F.sum("n_lines").alias("nl"),
            F.sum("n_kept").alias("nk"),
            F.sum(F.when(F.col("n_kept") == 0, 1).otherwise(0)).alias(
                "nz"
            ),
        ).collect()[0]
        gauges = {
            "docs": int(agg["nd"]),
            "inLines": int(agg["nl"] or 0),
            "keptLines": int(agg["nk"] or 0),
            "dupLines": int((agg["nl"] or 0) - (agg["nk"] or 0)),
            "emptiedDocs": int(agg["nz"] or 0),
            "batchId": int(batch_id),
        }
        if analyzer is not None:
            analyzer.set_extra_gauges(LINES_GAUGE_SOURCE, gauges)
        for sink in gauge_sinks or []:
            pub = getattr(sink, "publish", None) or sink
            try:
                pub(LINES_GAUGE_SOURCE, dict(gauges))
            except Exception:
                pass  # fail-open, the analyzer's sink contract
        if cleaned_sink is not None:
            cleaned_sink(cleaned, batch_id)
        if not replayed:
            maybe_compact_tables(
                spark_, state_path, _LINES_TABLES, dir_cache, compact_every
            )

    return _body
