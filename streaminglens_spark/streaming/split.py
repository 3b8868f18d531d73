"""Streaming leakage-safe split assignment (r11 extension): the
incremental counterpart of ``functions/dedup.py::leakage_safe_split`` --
every arriving document gets a (root, train/val) assignment AT INGEST
TIME, keyed by the near-dup cluster it attaches to, so a KEEP-everything
pipeline (soft dedup, re-weighting) can guarantee that a new paraphrase
of a train page never lands in val.

Semantics -- attachment-time clustering.  A batch doc's ROOT is the
smallest of: the roots of every already-assigned doc it matches (via the
cumulative minhash index, ``dedup_against_index``), the batch-internal
cluster it belongs to (connected components over the batch's own match
edges, ``dedup_clusters``), and its own id.  The split is the SAME pure
function of the root as the batch operator (affine hash under the
``val_frac`` integer threshold), so:

- a doc that matches ANY earlier doc inherits an earlier root and
  therefore lands on that root's side -- the attachment guarantee;
- an old root's side never changes (the hash is a function of the root
  id), so assignments are append-only and replay-stable;
- if one batch cluster matches TWO old roots that hashed to different
  sides, no assignment can satisfy both -- the min root wins and the
  batch's ``splitConflicts`` gauge counts the cluster (the documented
  gap vs the batch operator, which re-clusters globally; conflicts are
  the stream-order price of never re-assigning history).

Durability is the repo's shard contract: per batch ONE atomic
``_COMMITTED`` marker seals TWO tables -- ``index`` (the minhash sketch
of the batch, ONE representative per exact-equal md5 class, the r10
hot-bucket hygiene rule) and ``roots`` (doc_id, root, split for every
batch doc).  A replayed batch recomputes from the PRE-batch committed
view (its own shards excluded) and re-delivers byte-identically; a
restart needs no driver state at all -- the roots tables ARE the state.

Scale shape: the per-trigger reads are the ingest monitor's
(committed-dir cache bounds metadata RPCs; the index/roots folds are
O(1) generations + O(recent) shards -- every ``compact_every``
committed batches they fold into one generation via
``ingest.compact_tables``, r11 ADVICE); the
match join is the banded index join with the hot-bucket hygiene rule;
the batch-internal clustering is bounded by batch size; everything else
is id-keyed joins.  Document ids must be globally increasing across
batches (the incremental orientation: a match's keeper is the earlier
id).

Gauges publish under ``spark.streaming.splitAssignment``.
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

SPLIT_GAUGE_SOURCE = "spark.streaming.splitAssignment"

_SPLIT_INDEX_SCHEMA = "doc_id long, md5_fp string, mh array<bigint>"
_ROOTS_SCHEMA = "doc_id long, root long, split string"
_SPLIT_TABLES = {"index": _SPLIT_INDEX_SCHEMA, "roots": _ROOTS_SCHEMA}


def _committed_table(spark, state_path, sub, schema, dir_cache,
                     exclude_batch=None):
    return committed_table_view(
        spark, state_path, sub, schema, dir_cache,
        exclude_batch=exclude_batch,
    )


def assign_splits_of_batch(
    batch_df: DataFrame,
    index: DataFrame,
    old_roots: DataFrame,
    val_frac: float = 0.2,
    threshold: float = 0.5,
    key: str = "doc_id",
    verdicts: DataFrame | None = None,
):
    """The pure batch-shaped core: returns (assigned, certain_losers).

    ``assigned`` is (doc_id, root, split, attached) for EVERY batch doc
    -- root resolution per the module docstring; ``attached`` marks docs
    whose root is not their own id.  ``certain_losers`` is the doc_id
    set of exact copies of an earlier doc (the rows the index shard must
    exclude, the r10 hygiene rule).  Deterministic: a pure function of
    (batch, index, old_roots).  ``verdicts`` (r12): a caller that
    already ran ``dedup_against_index(batch_df, index, threshold)`` --
    the composed loader monitor shares ONE match join between admission
    dedup and split attachment -- passes it to skip the recompute."""
    from ..cache import track
    from ..functions.dedup import dedup_against_index, dedup_clusters
    from ..functions.sampling import _threshold
    from ..functions.sketch import HASH_A, HASH_B, HASH_P

    if verdicts is None:
        verdicts = track(dedup_against_index(batch_df, index, threshold))
    edges = (
        verdicts.filter(F.col("match_id") < F.col("new_id"))
        .select("new_id", "match_id")
        .distinct()
    )
    certain_losers = (
        verdicts.filter(
            (F.col("verdict") == "certain")
            & (F.col("match_id") < F.col("new_id"))
        )
        .select(F.col("new_id").alias("doc_id"))
        .distinct()
    )
    old = old_roots.select(
        F.col("doc_id").alias("match_id"), F.col("root").alias("_oroot"),
        F.col("split").alias("_oside"),
    )
    cross = track(edges.join(old, "match_id"))
    inb = edges.join(old.select("match_id"), "match_id", "left_anti").select(
        F.col("new_id").alias("doc_a"), F.col("match_id").alias("doc_b")
    )
    clusters = dedup_clusters(inb)
    cid = (
        batch_df.select(F.col(key).alias("doc_id"))
        .join(clusters.select("doc_id", "cluster_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).cast("long").alias(
                "cid"
            ),
        )
    )
    by_cid = cross.withColumnRenamed("new_id", "doc_id").join(cid, "doc_id")
    cand = by_cid.groupBy("cid").agg(
        F.min("_oroot").alias("_mroot"),
        (F.count_distinct("_oside") > 1).alias("_conflict"),
    )
    rooted = cid.join(cand, "cid", "left").select(
        "doc_id",
        F.least(
            F.coalesce(F.col("_mroot"), F.col("cid")), F.col("cid")
        ).cast("long").alias("root"),
        F.coalesce(F.col("_conflict"), F.lit(False)).alias("_conflict"),
    )
    h = (F.lit(HASH_A) * F.col("root") + F.lit(HASH_B)) % F.lit(HASH_P)
    split = F.when(
        h < F.lit(_threshold(val_frac)), F.lit("val")
    ).otherwise(F.lit("train"))
    assigned = rooted.select(
        "doc_id",
        "root",
        split.alias("split"),
        (F.col("root") != F.col("doc_id")).alias("attached"),
        "_conflict",
    )
    return assigned, certain_losers


def split_assignment_monitor(
    state_path: str,
    val_frac: float = 0.2,
    threshold: float = 0.5,
    assigned_sink=None,
    analyzer=None,
    gauge_sinks=None,
    key: str = "doc_id",
    compact_every: int = INDEX_COMPACT_EVERY,
):
    """Build the ``foreachBatch`` body.  Input stream schema: (doc_id,
    text, ...).  ``assigned_sink(df, batch_id)`` receives each batch's
    (doc_id, root, split, attached) rows -- exactly once under replay
    (byte-identical re-delivery from the pre-batch committed view).
    Every ``compact_every`` committed batches the index/roots shards
    fold into one generation (0 disables)."""
    from ..cache import tracked_caches
    from ..functions.dedup import minhash_index
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
        exclude = int(batch_id) if replayed else None
        index = _committed_table(
            spark_, state_path, "index", _SPLIT_INDEX_SCHEMA, dir_cache,
            exclude_batch=exclude,
        )
        roots = _committed_table(
            spark_, state_path, "roots", _ROOTS_SCHEMA, dir_cache,
            exclude_batch=exclude,
        )
        batch = track(batch_df.select(key, "text"))
        assigned, certain_losers = assign_splits_of_batch(
            batch, index, roots, val_frac, threshold, key=key
        )
        assigned = track(assigned)
        deliver = assigned.select("doc_id", "root", "split", "attached")
        if not replayed:
            index_shard = minhash_index(batch).join(
                certain_losers, "doc_id", "left_anti"
            )
            _write_shard_batch(
                spark_, state_path, batch_id,
                {"index": index_shard, "roots": deliver.select(
                    "doc_id", "root", "split"
                )},
            )
        agg = assigned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias(
                "nv"
            ),
            F.sum(F.when(F.col("attached"), 1).otherwise(0)).alias("na"),
            F.count_distinct(
                F.when(F.col("_conflict"), F.col("root"))
            ).alias("nc"),
        ).collect()[0]
        gauges = {
            "assignedDocs": int(agg["n"]),
            "valDocs": int(agg["nv"]),
            "trainDocs": int(agg["n"]) - int(agg["nv"]),
            "attachedDocs": int(agg["na"]),
            "splitConflicts": int(agg["nc"] or 0),
            "batchId": int(batch_id),
        }
        if analyzer is not None:
            analyzer.set_extra_gauges(SPLIT_GAUGE_SOURCE, gauges)
        for sink in gauge_sinks or []:
            pub = getattr(sink, "publish", None) or sink
            try:
                pub(SPLIT_GAUGE_SOURCE, dict(gauges))
            except Exception:
                pass  # fail-open, the analyzer's sink contract
        if assigned_sink is not None:
            assigned_sink(deliver, batch_id)
        if not replayed:
            maybe_compact_tables(
                spark_, state_path, _SPLIT_TABLES, dir_cache, compact_every
            )

    return _body
