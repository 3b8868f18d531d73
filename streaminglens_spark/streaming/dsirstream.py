"""Streaming DSIR admission (r12): score a live document stream against
a FROZEN offline-fitted importance model and admit only the
target-distribution-like rows.

The reference has no data-selection surface (its analyzer only scores
batch telemetry), so this is extension territory: the continuous form of
``functions/dsir.py``.  The split follows the repo's fit-offline /
score-on-arrival recipe (``pq_encode``, ``ann_assign_fold``): the
per-bucket log-likelihood-ratio weights are statistics fitted ONCE over
a static target+pool snapshot (``dsir_fit``), and the per-row score is
a pure projection over the frozen one-row weight table -- so scoring a
micro-batch inside ``foreachBatch`` is bit-identical to running the
batch operator over the same rows (pinned by
``tests/test_streaming_dsir.py``), and the streaming query carries ZERO
stateful operators (also pinned; each row's verdict needs only itself
plus the broadcast weights).

Per trigger the cost is one map-only pass over the micro-batch -- no
shuffle, no cross-batch ledger, no state to restore on restart (replay
re-scores to the same verdicts by purity).  Refreshing the model is a
redeploy with a new weights table, the stream-static snapshot semantics
every frozen-model scorer has.

A deployment that must ALSO cap admitted volume chains this monitor's
sink into ``budget_admission_monitor`` (scores are deterministic, so
the composition stays replay-stable); mixing both concerns into one
monitor would re-implement the budget ledger for no new semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dsir import dsir_score_with
from ..functions.text import QC_DIM


def dsir_admit_batch(
    micro_batch: DataFrame,
    weights: DataFrame,
    threshold_micro: int = 0,
    dim: int = QC_DIM,
) -> DataFrame:
    """The per-trigger body: score (all input columns preserved,
    n_feats/score_micro appended) and keep rows at or above the
    threshold.  A STATIC transformation -- usable directly in tests or
    backfills."""
    scored = dsir_score_with(micro_batch, weights, dim=dim)
    return scored.filter(F.col("score_micro") >= F.lit(int(threshold_micro)))


def start_dsir_admission(
    docs_stream: DataFrame,
    weights: DataFrame,
    sink: Callable[[DataFrame, int], None],
    threshold_micro: int = 0,
    dim: int = QC_DIM,
    query_name: str = "dsir_admission",
    checkpoint: str | None = None,
):
    """Wire the admission as a ``foreachBatch`` streaming query.

    ``docs_stream``: streaming DataFrame carrying at least ``text`` (all
    columns pass through).  ``weights``: the one-row ``warr`` table from
    ``dsir_fit`` (fit it on the static target+pool snapshot BEFORE
    starting the stream).  ``sink(admitted_df, batch_id)`` receives the
    admitted micro-batch.  Returns the started ``StreamingQuery``."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        sink(
            dsir_admit_batch(
                batch_df, weights, threshold_micro=threshold_micro, dim=dim
            ),
            batch_id,
        )

    writer = docs_stream.writeStream.foreachBatch(_body).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# --- adaptive refit (r12b) ---------------------------------------------------

DSIR_GAUGE_SOURCE = "spark.streaming.dsirAdmission"

_COUNTS_SCHEMA = "bucket long, c_t long, c_q long"
_COUNTS_TABLES = {"counts": _COUNTS_SCHEMA}


def dsir_adaptive_monitor(
    state_path: str,
    admitted_sink=None,
    target_lang: str = "en",
    dim: int = QC_DIM,
    threshold_micro: int = 0,
    analyzer=None,
    gauge_sinks=None,
    compact_every: int | None = None,
    warmup_target_features: int = 0,
):
    """The ADAPTIVE streaming form: instead of frozen offline weights,
    every batch is scored against the model fitted on EVERYTHING
    COMMITTED BEFORE IT -- the DSIR counterpart of the incremental
    index-maintenance family (minhash dedup-against-index, IVF refit):
    the model follows the stream without ever rescanning the corpus.

    Semantics.  The committed state is the per-bucket feature counts
    (bucket, c_t, c_q) -- ADDITIVE, so the cumulative model is one
    O(dim) groupBy-sum fold over committed shards.  Per batch: weights
    are derived from the PRE-batch cumulative counts (first batch: all
    zeros -> every weight exactly 0 -> everything scores 0, the
    documented cold-start -- at the default ``threshold_micro=0`` this
    FAIL-OPENS: the whole first batch, and any later doc made only of
    never-seen features, is admitted), the batch is scored map-only and rows at or
    above the threshold are delivered; the batch's OWN count increments
    commit as its shard under ONE atomic marker AFTER the verdicts are
    derived from the pre-batch view, so a REPLAYED batch (marker
    already present) recomputes against committed-minus-own and
    re-delivers byte-identically; restart needs no driver state.

    Convergence contract (pinned by ``tests/test_streaming_dsir.py``):
    after the stream drains, the cumulative committed counts are
    bit-equal to ``dsir_bucket_counts`` over the concatenated corpus,
    so the NEXT batch would be scored by exactly the batch
    ``dsir_fit`` model -- the adaptive stream converges to the batch
    operator, it never forks from it.

    State is O(dim) rows per shard; every ``compact_every`` committed
    batches (default: the ingest family's cadence) the shards fold
    into one generation -- counts being additive, compaction is pure
    union (summation stays read-side, keeping ``src_batch`` provenance
    intact for replay exclusion).

    Warm-up (r12 advice #3): ``warmup_target_features`` flips the
    cold-start window to FAIL-CLOSED -- until the PRE-batch cumulative
    target-side feature mass (``sum(c_t)`` over committed counts)
    reaches the floor, the batch's counts still commit (the model keeps
    learning) but NOTHING is admitted.  The verdict depends only on the
    pre-batch committed view, so replay stays byte-identical.  Default
    0 preserves the documented fail-open behavior AND skips the
    per-batch mass aggregation entirely (r13 advice: an opt-in
    feature must not add unconditional per-batch latency) -- gauges
    then carry ``warming_up=False`` and ``target_feature_mass=None``;
    with the gate on, both gauges are live so operators can SEE the
    window instead of being surprised by it.

    Returns the ``foreachBatch`` body; gauges publish under
    ``spark.streaming.dsirAdmission``."""
    from ..cache import tracked_caches
    from ..functions.dsir import dsir_bucket_counts, dsir_weights_from_counts
    from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs
    from .ingest import (
        INDEX_COMPACT_EVERY,
        _BatchDirCache,
        committed_table_view,
        maybe_compact_tables,
    )
    from .annmaint import _write_shard_batch

    if compact_every is None:
        compact_every = INDEX_COMPACT_EVERY
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
        # ALWAYS the strict-prefix view (not committed-minus-own): the
        # adaptive model is a monotone fold, so a replayed batch must
        # not see counts committed by batches AFTER it -- the
        # ``before_batch`` contract the loader's training-order counter
        # established.  On the fresh path the prefix equals the full
        # committed set (nothing later can be committed yet), so the
        # two paths read the same view by construction.
        prior = committed_table_view(
            spark_, state_path, "counts", _COUNTS_SCHEMA, dir_cache,
            before_batch=int(batch_id),
        )
        cum = track(
            prior.groupBy("bucket").agg(
                F.sum("c_t").alias("c_t"), F.sum("c_q").alias("c_q")
            )
        )
        # pre-batch evidence mass: O(dim) rows, one tiny agg read --
        # but ONLY when the opt-in warm-up gate needs it (r13 advice:
        # at the default warmup_target_features=0 ``warming`` is
        # identically False, so the default path must not pay an
        # unconditional per-batch Spark job for an unused gauge)
        if int(warmup_target_features) > 0:
            t_mass = int(
                cum.agg(F.sum("c_t").alias("m")).first()["m"] or 0
            )
            warming = t_mass < int(warmup_target_features)
        else:
            t_mass = None
            warming = False
        warr = track(dsir_weights_from_counts(spark_, cum, dim=dim))
        batch = track(batch_df)
        scored = dsir_admit_batch(
            batch, warr, threshold_micro=threshold_micro, dim=dim
        )
        # fail-closed warm-up: counts below still commit, delivery gated
        admitted = track(scored.limit(0) if warming else scored)
        if not replayed:
            _write_shard_batch(
                spark_, state_path, batch_id,
                {"counts": dsir_bucket_counts(
                    batch, target_lang=target_lang, dim=dim
                )},
            )
        n_in = batch.count()
        n_adm = admitted.count()
        gauges = {
            "docs": int(n_in),
            "admitted": int(n_adm),
            "rejected": int(n_in - n_adm),
            "batchId": int(batch_id),
            "warming_up": bool(warming),
            "target_feature_mass": (
                int(t_mass) if t_mass is not None else None
            ),
        }
        if analyzer is not None:
            analyzer.set_extra_gauges(DSIR_GAUGE_SOURCE, gauges)
        for sink in gauge_sinks or []:
            pub = getattr(sink, "publish", None) or sink
            try:
                pub(DSIR_GAUGE_SOURCE, dict(gauges))
            except Exception:
                pass  # fail-open, the analyzer's sink contract
        if admitted_sink is not None:
            admitted_sink(admitted, batch_id)
        if not replayed:
            maybe_compact_tables(
                spark_, state_path, _COUNTS_TABLES, dir_cache, compact_every
            )

    return _body
