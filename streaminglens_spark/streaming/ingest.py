"""End-to-end streaming corpus ingest (r8): the live counterpart of
``corpus_pipeline`` -- every micro-batch of raw documents is cleaned,
quality-gated, near-dup-checked against the CUMULATIVE index of
everything ingested before it, budget-admitted, and delivered, with the
whole per-batch state transition committed atomically.

Per micro-batch (``foreachBatch`` body):

1. **clean**: ``normalize_expr`` + ``redact_expr`` -- map-only, fused
   into the batch scan;
2. **score**: the hashed-linear ``qc_score_expr`` over the cleaned text
   (computed once, carried on the row);
3. **dedup**: ``minhash_index`` sketches the batch (hash-once Arrow
   UDF); ``dedup_against_index`` scores it against the union of all
   COMMITTED index shards + the batch's own earlier rows -- sketch-only
   verdicts, the incremental-dedup contract.  EVERY cleaned doc enters
   the index (so future duplicates of a quality-reject still match);
4. **admit**: quality pass AND not-a-loser AND (optionally) within the
   per-stratum token budgets -- the ``budget_admission_monitor`` ledger,
   folded here;
5. **deliver**: the admitted rows (+score, n_tokens, cum_tokens) go to
   ``admitted_sink(df, batch_id)``.

Durability: ``<state_path>/batch_id=<id>/{index,admitted}`` are written
and sealed under ONE atomic ``_COMMITTED`` marker before any driver
state folds, so the index increment and the budget ledger commit
together.  A rebuilt monitor restores the ledger by folding committed
``admitted`` shards and reads the index from committed ``index`` shards;
a REPLAYED batch dedups against the PRE-batch index (committed shards
minus its own) and the pre-batch remaining budgets (its own committed
shard subtracted), so the re-delivered admitted set is byte-identical
and nothing double-counts.

Scale shape: every stage is the documented shape of its batch operator
(map-only cleanup/score, band-bucketed sketch join against a read-mostly
side index, two-level budget windows); driver state is O(strata); the
index lives on disk and grows by O(batch) rows per trigger.

Gauges publish under ``spark.streaming.corpusIngest`` through the
fail-open sink path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .annmaint import _committed_batch_dirs, _write_shard_batch
from .budget import BudgetAdmissionState

INGEST_GAUGE_SOURCE = "spark.streaming.corpusIngest"

_INDEX_SCHEMA = "doc_id long, md5_fp string, mh array<bigint>"


def _committed_index(spark, state_path, exclude_batch=None):
    """Union of committed index shards (empty-schema DF when none);
    ``exclude_batch`` drops one batch dir -- the replay path's pre-batch
    view."""
    dirs = [
        d
        for d in _committed_batch_dirs(spark, state_path)
        if exclude_batch is None
        or not d.rstrip("/").endswith(f"batch_id={exclude_batch}")
    ]
    if not dirs:
        return spark.createDataFrame([], _INDEX_SCHEMA)
    return spark.read.schema(_INDEX_SCHEMA).parquet(
        *[f"{d}/index" for d in dirs]
    )


def restore_ingest_state(
    spark, budgets: dict[str, int] | None, state_path: str | None
):
    """The budget ledger rebuilt from committed ``admitted`` shards
    (None when the monitor runs without budgets)."""
    if budgets is None:
        return None
    state = BudgetAdmissionState(budgets)
    for d in _committed_batch_dirs(spark, state_path) if state_path else []:
        state.fold(spark.read.parquet(f"{d}/admitted").collect())
    return state


def corpus_ingest_monitor(
    state_path: str,
    budgets: dict[str, int] | None = None,
    quality_threshold: int | None = None,
    dedup_threshold: float = 0.5,
    admitted_sink=None,
    analyzer=None,
    gauge_sinks=None,
    stratum: str = "source",
    key: str = "doc_id",
    spark=None,
):
    """Build (ledger_state, foreachBatch_body); ``ledger_state`` is None
    when no budgets are given.  Input stream schema: (doc_id, text,
    source, ...).  Document ids must be globally increasing across
    batches (the incremental-dedup orientation: a dup's keeper is the
    earliest id)."""
    from ..functions.dedup import dedup_against_index, minhash_index
    from ..functions.sampling import token_budget_sample
    from ..functions.text import (
        QC_THRESHOLD_MILLI,
        normalize_expr,
        qc_score_expr,
        redact_expr,
    )
    from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

    thr = QC_THRESHOLD_MILLI if quality_threshold is None else quality_threshold
    state = restore_ingest_state(spark, budgets, state_path) if spark else (
        BudgetAdmissionState(budgets) if budgets is not None else None
    )

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from ..cache import track, tracked_caches

        with tracked_caches():
            _run_batch(batch_df, batch_id, track)

    def _run_batch(batch_df: DataFrame, batch_id: int, track) -> None:
        spark_ = batch_df.sparkSession
        out = f"{state_path}/batch_id={batch_id}"
        fs, _ = _hadoop_fs(spark_, out)
        marker = spark_._jvm.org.apache.hadoop.fs.Path(f"{out}/{_COMMIT_MARKER}")
        replayed = fs.exists(marker)

        extras = [c for c in batch_df.columns if c not in (key, "text")]
        cleaned = track(
            batch_df.select(
                key,
                *extras,
                redact_expr(normalize_expr(F.col("text"))).alias("text"),
            ).withColumn(
                "score_milli", qc_score_expr(F.col("text")).cast("long")
            )
        )
        n_in = cleaned.count()  # materializes the track() persist

        index = _committed_index(
            spark_, state_path, exclude_batch=batch_id if replayed else None
        )
        verdicts = dedup_against_index(cleaned, index, dedup_threshold)
        # a doc loses iff it matches ANY strictly-earlier doc (index docs
        # and earlier in-batch ids); dedup_against_index may also emit
        # later-id matches when ids sit below its dup-corpus shift
        losers = (
            verdicts.filter(F.col("match_id") < F.col("new_id"))
            .select(F.col("new_id").alias(key))
            .distinct()
        )
        survivors = cleaned.join(losers, key, "left_anti")
        n_unique = survivors.count()
        quality = survivors.filter(F.col("score_milli") >= F.lit(int(thr)))
        n_quality = quality.count()

        if state is not None:
            if replayed:
                prior = {
                    r["stratum"]: int(r["n_tokens"])
                    for r in spark_.read.parquet(f"{out}/admitted").collect()
                }
                remaining = {
                    s: b - (state.spent.get(s, 0) - prior.get(s, 0))
                    for s, b in state.budgets.items()
                    if b - (state.spent.get(s, 0) - prior.get(s, 0)) > 0
                }
            else:
                remaining = state.remaining()
            if remaining:
                admitted = token_budget_sample(quality, stratum, key, remaining)
            else:
                admitted = (
                    quality.limit(0)
                    .withColumn("n_tokens", F.lit(0).cast("long"))
                    .withColumn("cum_tokens", F.lit(0).cast("long"))
                )
        else:
            admitted = quality.withColumn(
                "n_tokens",
                F.size(
                    F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
                ).cast("long"),
            ).withColumn("cum_tokens", F.lit(None).cast("long"))
        admitted = track(admitted)
        admitted.count()

        shard = admitted.groupBy(F.col(stratum).alias("stratum")).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        fresh = not replayed and _write_shard_batch(
            spark_, state_path, batch_id,
            {"index": minhash_index(cleaned), "admitted": shard},
        )
        shard_rows = shard.collect()
        if state is not None:
            gauges = state.fold(shard_rows, accumulate=fresh)
        else:
            gauges = {
                "admittedDocs": sum(int(r["n_docs"]) for r in shard_rows),
                "admittedTokens": sum(int(r["n_tokens"]) for r in shard_rows),
            }
        gauges.update(
            {
                "inDocs": int(n_in),
                "dupRejects": int(n_in - n_unique),
                "qualityRejects": int(n_unique - n_quality),
                "batchId": int(batch_id),
            }
        )
        if analyzer is not None:
            analyzer.set_extra_gauges(INGEST_GAUGE_SOURCE, gauges)
        for sink in gauge_sinks or []:
            pub = getattr(sink, "publish", None) or sink
            try:
                pub(INGEST_GAUGE_SOURCE, dict(gauges))
            except Exception:
                pass  # fail-open, the analyzer's sink contract
        if admitted_sink is not None:
            admitted_sink(admitted, batch_id)

    return state, _body
