"""Streaming ANN index maintenance (r6 verdict ask #4): the batch
``ann_stats_shard`` / ``merge_ann_stats`` / drift-trigger chain wired
end-to-end into a Structured Streaming ``foreachBatch`` body, publishing
drift/growth flags through the same gauge-sink path as
``dedup_verdict_monitor`` (``streaming/dedup.py``).

Per micro-batch of embedding rows:

1. build the batch's ADDITIVE stats shard (one map-only fold assignment
   against the broadcast centroids -- ``ann_stats_shard`` is
   streaming-legal, so the same code path the batch tests pin runs here);
2. fold it into the monitor's running state -- a driver-side
   ``{cell: (n_vecs, qsum)}`` dict, integer-exact and **bounded at
   O(cells)** regardless of how many batches stream through (the shard is
   k rows; nothing per-vector is retained);
3. compare the BATCH's per-cell mean assignment score and mass share
   against the fitted baseline with exactly ``ann_increment``'s two
   triggers (score drift beyond ``drift_margin``; integer
   cross-multiplied mass imbalance beyond ``growth_ratio``); publish
   ``{newVecs, driftCells, growthCells, emptyCellHits, batchId}`` under
   source ``spark.streaming.annMaintenance`` to the analyzer /
   gauge sinks (fail-open per sink, the dedup-monitor contract).

The running state's merged view (``AnnMaintenanceState.merged_stats``)
is bit-identical to ``merge_ann_stats`` over the same shards (integer
sums are associative), so a refit decision made from the monitor equals
one made from the persisted batch artifacts.

Durability: the monitor's dict is DRIVER-SESSION state, not checkpointed
-- by design.  The durable artifact is the per-batch shard the pipeline
appends (``ann_stats_shard`` rows via foreachBatch's own sink); after a
restart the state rebuilds exactly by folding the persisted shards
(additive integer sums), and the gauges are per-batch signals, not
accumulations, so no trigger decision is lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ANN_GAUGE_SOURCE = "spark.streaming.annMaintenance"


class AnnMaintenanceState:
    """O(cells) running state: per-cell integer (n_vecs, qsum) plus the
    baseline snapshot the triggers compare against."""

    def __init__(self, baseline_rows) -> None:
        # {cell: (n_vecs, mean_score)} -- the fitted index's per-cell stats
        self.baseline = {
            int(r["cell"]): (int(r["n_vecs"]), float(r["mean_score"]))
            for r in baseline_rows
        }
        self.tot_base = sum(n for n, _ in self.baseline.values())
        # running additive shard fold: {cell: [n_vecs, qsum]}
        self.cells: dict[int, list[int]] = {}
        self.batches = 0

    def fold_shard(self, shard_rows) -> dict:
        """Fold one batch's (cell, n_vecs, qsum) shard rows in; return the
        batch's trigger gauge dict."""
        self.batches += 1
        n_batch = 0
        batch_cells: dict[int, tuple[int, int]] = {}
        for r in shard_rows:
            cell, n, qs = int(r["cell"]), int(r["n_vecs"]), int(r["qsum"])
            n_batch += n
            batch_cells[cell] = (n, qs)
            acc = self.cells.setdefault(cell, [0, 0])
            acc[0] += n
            acc[1] += qs
        drift = growth = empty_hits = 0
        for cell, (n, qs) in batch_cells.items():
            base = self.baseline.get(cell)
            if base is None or base[0] == 0:
                empty_hits += 1
                growth += 1  # mass into an empty cell: strongest signal
                continue
            n_base, base_mean = base
            new_mean = (qs / 1_000_000.0) / n
            if new_mean < base_mean - self._drift_margin:
                drift += 1
            # share_new > ratio * share_base, integer cross-multiplied
            if n * self.tot_base > self._growth_ratio * n_base * n_batch:
                growth += 1
        return {
            "newVecs": n_batch,
            "driftCells": drift,
            "growthCells": growth,
            "emptyCellHits": empty_hits,
            "trackedCells": len(self.cells),
        }

    # set by ann_maintenance_monitor; class-level defaults for direct use
    _drift_margin = 0.05
    _growth_ratio = 3

    def merged_stats(self) -> list[tuple[int, int, float]]:
        """(cell, n_vecs, mean_score) rows -- the ``merge_ann_stats``
        shape, bit-identical to merging the same shards batch-side."""
        return [
            (cell, n, (qs / 1_000_000.0) / n)
            for cell, (n, qs) in sorted(self.cells.items())
            if n > 0
        ]


def ann_maintenance_monitor(
    centroids: DataFrame,
    baseline: DataFrame,
    analyzer=None,
    gauge_sinks=None,
    downstream=None,
    drift_margin: float = 0.05,
    growth_ratio: int = 3,
):
    """Build (state, foreachBatch_body) for streaming index maintenance.

    ``centroids``: the fitted (cell, cv, cnrm) table -- persisted by the
    caller, broadcast into every batch's fold assignment.  ``baseline``:
    the per-cell corpus stats (``ann_index_stats`` / ``merge_ann_stats``
    shape) the drift triggers compare against; collected ONCE here
    (O(cells) rows).  Wire as::

        state, body = ann_maintenance_monitor(cents, base, analyzer=an)
        stream.writeStream.foreachBatch(body).start()

    Gauges publish under ``spark.streaming.annMaintenance`` via the same
    fail-open sink contract as ``dedup_verdict_monitor``; the raw batch
    flows on to ``downstream(df, batch_id)`` if given."""
    from ..functions.similarity import ann_stats_shard

    state = AnnMaintenanceState(baseline.collect())
    state._drift_margin = drift_margin
    state._growth_ratio = growth_ratio

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            shard_rows = ann_stats_shard(batch_df, centroids).collect()
            gauges = state.fold_shard(shard_rows)
            gauges["batchId"] = int(batch_id)
            if analyzer is not None:
                analyzer.set_extra_gauges(ANN_GAUGE_SOURCE, gauges)
            for sink in gauge_sinks or []:
                pub = getattr(sink, "publish", None) or sink
                try:
                    pub(ANN_GAUGE_SOURCE, dict(gauges))
                except Exception:
                    pass  # fail-open, the analyzer's sink contract
            if downstream is not None:
                downstream(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return state, _body


PQ_GAUGE_SOURCE = "spark.streaming.pqMaintenance"


class PqMaintenanceState:
    """O(subspaces) running state for streaming PQ maintenance: per-sub
    integer (n_vecs, err_qsum) folds plus the fitted error baseline."""

    def __init__(self, baseline_rows, err_ratio: float = 1.5) -> None:
        # {sub: (n_vecs, mean_err)} -- pq_error_stats shape
        self.baseline = {
            int(r["sub"]): (int(r["n_vecs"]), float(r["mean_err"]))
            for r in baseline_rows
        }
        self.err_ratio = err_ratio
        self.subs: dict[int, list[int]] = {}
        self.batches = 0

    def fold_shard(self, err_rows) -> dict:
        """Fold one batch's per-sub (sub, n, qsum) error rows in; return
        the batch's trigger gauges."""
        self.batches += 1
        n_batch = 0  # (vec, sub) rows; vectors = n_batch / #subs seen
        subs_seen = set()
        flagged = 0
        worst_ratio = 0.0
        for r in err_rows:
            sub, n, qs = int(r["sub"]), int(r["n"]), int(r["qsum"])
            n_batch += n
            subs_seen.add(sub)
            acc = self.subs.setdefault(sub, [0, 0])
            acc[0] += n
            acc[1] += qs
            base = self.baseline.get(sub)
            if base is None or base[1] == 0 or n == 0:
                continue
            new_err = (qs / 1_000_000.0) / n
            ratio = new_err / base[1]
            worst_ratio = max(worst_ratio, ratio)
            if new_err > base[1] * self.err_ratio:
                flagged += 1
        return {
            # every vector contributes one row per subspace
            "newVecs": n_batch // len(subs_seen) if subs_seen else 0,
            "flaggedSubspaces": flagged,
            "worstErrRatioMilli": int(round(worst_ratio * 1000)),
            "trackedSubspaces": len(self.subs),
        }

    def merged_err_stats(self) -> list[tuple[int, int, float]]:
        """(sub, n_vecs, mean_err) -- bit-identical to a batch-side
        integer-quantized mean over the same shards."""
        return [
            (sub, n, (qs / 1_000_000.0) / n)
            for sub, (n, qs) in sorted(self.subs.items())
            if n > 0
        ]


def pq_maintenance_monitor(
    codebooks,
    baseline,
    analyzer=None,
    gauge_sinks=None,
    downstream=None,
    err_ratio: float = 1.5,
):
    """Streaming PQ-index maintenance: the ``ann_maintenance_monitor``
    recipe on the product quantizer.  Per micro-batch: one map-only
    ``pq_encode_with_error`` pass (streaming-legal fold) rolled up to
    per-subspace integer error sums, folded into O(subspaces) driver
    state, compared against the fitted ``pq_error_stats`` baseline with
    ``pq_increment``'s absolute-error ratio trigger, and published under
    ``spark.streaming.pqMaintenance`` through the fail-open sink path.
    A flagged subspace's remedy is ``pq_update`` (incremental) or
    ``pq_fit`` (full), both offline -- the monitor only decides."""
    from pyspark.sql import functions as F

    from ..functions.pq import pq_encode_with_error

    state = PqMaintenanceState(baseline.collect(), err_ratio=err_ratio)

    def _body(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            err_rows = (
                pq_encode_with_error(batch_df, codebooks)
                .withColumn("q", F.round(F.col("err") * 1_000_000).cast("long"))
                .groupBy("sub")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("q").cast("long").alias("qsum"),
                )
                .collect()
            )
            gauges = state.fold_shard(err_rows)
            gauges["batchId"] = int(batch_id)
            if analyzer is not None:
                analyzer.set_extra_gauges(PQ_GAUGE_SOURCE, gauges)
            for sink in gauge_sinks or []:
                pub = getattr(sink, "publish", None) or sink
                try:
                    pub(PQ_GAUGE_SOURCE, dict(gauges))
                except Exception:
                    pass  # fail-open, the analyzer's sink contract
            if downstream is not None:
                downstream(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return state, _body


def ann_maintenance_monitor_with_refit(
    centroids,
    baseline,
    analyzer=None,
    gauge_sinks=None,
    downstream=None,
    drift_margin: float = 0.05,
    growth_ratio: int = 3,
):
    """``ann_maintenance_monitor`` plus the REMEDY in hand: each batch
    additionally folds its per-cell vector-mass shard
    (``ann_vector_shard``, O(cells x dim) rows) into driver state, so
    when the drift/growth gauges fire the caller refits incrementally --
    ``state.updated_centroids()`` returns the ``kmeans_update`` of the
    fitted centroids with EVERY streamed vector's mass, without touching
    the corpus or replaying the stream.

    The folded mass is integer-exact and additive, so
    ``updated_centroids()`` is bit-identical to batch-side
    ``kmeans_update`` over ``merge_vector_shards`` of the same batches
    (pinned in ``tests/test_streaming_annmaint.py``).  State stays
    O(cells x dim) regardless of stream length.

    Returns (state, foreachBatch_body); state is a
    ``RefitMaintenanceState`` wrapping the gauge state."""
    from ..functions.similarity import ann_stats_shard, ann_vector_shard

    state = RefitMaintenanceState(baseline.collect(), centroids, baseline)
    state.gauge_state._drift_margin = drift_margin
    state.gauge_state._growth_ratio = growth_ratio

    def _body(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            shard_rows = ann_stats_shard(batch_df, centroids).collect()
            gauges = state.gauge_state.fold_shard(shard_rows)
            gauges["batchId"] = int(batch_id)
            vec_rows = ann_vector_shard(batch_df, centroids).collect()
            state.fold_vector_shard(vec_rows)
            if analyzer is not None:
                analyzer.set_extra_gauges(ANN_GAUGE_SOURCE, gauges)
            for sink in gauge_sinks or []:
                pub = getattr(sink, "publish", None) or sink
                try:
                    pub(ANN_GAUGE_SOURCE, dict(gauges))
                except Exception:
                    pass  # fail-open
            if downstream is not None:
                downstream(batch_df, batch_id)
        finally:
            batch_df.unpersist()

    return state, _body


class RefitMaintenanceState:
    """Gauge state + accumulated per-cell vector mass + the refit."""

    def __init__(self, baseline_rows, centroids, baseline) -> None:
        self.gauge_state = AnnMaintenanceState(baseline_rows)
        self._centroids = centroids
        self._baseline = baseline
        # {cell: [n_new, [per-dim micro sums]]} -- O(cells x dim)
        self.vmass: dict[int, list] = {}

    def fold_vector_shard(self, rows) -> None:
        for r in rows:
            cell, n, vsum = int(r["cell"]), int(r["n_new"]), list(r["vsum"])
            acc = self.vmass.get(cell)
            if acc is None:
                self.vmass[cell] = [n, vsum]
            else:
                acc[0] += n
                acc[1] = [x + y for x, y in zip(acc[1], vsum)]

    def merged_vector_shard(self, spark):
        """The accumulated mass as a ``merge_vector_shards``-shaped
        DataFrame -- bit-identical to merging the per-batch shards."""
        rows = [
            (cell, n, vsum) for cell, (n, vsum) in sorted(self.vmass.items())
        ]
        return spark.createDataFrame(
            rows, "cell int, n_new long, vsum array<long>"
        )

    def updated_centroids(self, spark):
        """``kmeans_update`` of the fitted centroids with every streamed
        vector's mass: the incremental remedy for a fired drift/growth
        gauge.  O(cells x dim) compute; corpus and stream never re-read."""
        from ..functions.similarity import kmeans_update

        return kmeans_update(
            self._centroids, self._baseline, self.merged_vector_shard(spark)
        )
