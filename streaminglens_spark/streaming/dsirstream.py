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
