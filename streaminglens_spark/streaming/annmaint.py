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

Durability (r7 verdict ask #4, implemented): pass ``shard_path`` to any
monitor and each batch's shard tables are written through the
exactly-once marker protocol of ``sources.sinks.idempotent_batch_sink``
(``<shard_path>/batch_id=<id>/<table>`` sealed by an atomic
``_COMMITTED`` marker) BEFORE the fold, and at construction the monitor
rebuilds its state by folding every committed shard back in -- restart
the driver, rebuild the monitor with the same ``shard_path``, and the
state (drift verdicts, ``updated_centroids()``) is bit-identical to the
uninterrupted run (integer sums are additive and parquet round-trips
longs exactly; pinned in ``tests/test_streaming_annmaint.py``).  A
REPLAYED batch (restart inside the at-least-once window) re-publishes
its gauges (they are per-batch signals) but folds AT MOST ONCE: the
marker proves the shard committed, while the state's own
``folded_batches`` set proves the fold happened -- a crash in the
window between the marker seal and the fold leaves the two diverged,
and the retry folds the batch it is missing instead of assuming
marker => folded (r8 ADVICE fix).  Without ``shard_path`` the
state is driver-session only and durability is the caller's problem --
wire your own shard-appending ``downstream`` sink or accept the loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ANN_GAUGE_SOURCE = "spark.streaming.annMaintenance"


# --- exactly-once shard persistence (r7 verdict ask #4) ----------------------

def _write_shard_batch(spark, shard_path, batch_id, named_dfs) -> bool:
    """Write this batch's shard tables under
    ``<shard_path>/batch_id=<id>/<name>`` and seal them with ONE atomic
    ``_COMMITTED`` marker (all tables commit together).  Returns False --
    writing nothing -- when the marker already exists (a replayed batch:
    the restored state already folded it)."""
    from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

    out = f"{shard_path}/batch_id={batch_id}"
    fs, _ = _hadoop_fs(spark, out)
    marker = spark._jvm.org.apache.hadoop.fs.Path(f"{out}/{_COMMIT_MARKER}")
    if fs.exists(marker):
        return False
    for name, df in named_dfs.items():
        df.write.mode("overwrite").parquet(f"{out}/{name}")
    fs.create(marker, True).close()
    return True


def _committed_batch_dirs(spark, shard_path) -> list[str]:
    """COMMITTED batch directories under ``shard_path`` in batch order;
    [] when the path does not exist yet (first start).  Half-written
    batches (no marker) are invisible, the ``read_committed`` contract."""
    from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

    fs, hpath = _hadoop_fs(spark, shard_path)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        p = status.getPath()
        name = p.getName()
        if not status.isDirectory() or not name.startswith("batch_id="):
            continue
        marker = spark._jvm.org.apache.hadoop.fs.Path(
            f"{p.toString()}/{_COMMIT_MARKER}"
        )
        if fs.exists(marker):
            out.append((int(name.split("=", 1)[1]), p.toString()))
    return [p for _, p in sorted(out)]


def _batch_id_of(batch_dir: str) -> int:
    """The batch id encoded in a ``.../batch_id=<id>`` directory path."""
    return int(batch_dir.rstrip("/").rsplit("batch_id=", 1)[1])


def _should_accumulate(state, shard_path, batch_id) -> bool:
    """Whether this batch must fold into the live state.  NOT simply
    "marker absent": a crash between the marker seal and the fold leaves
    a committed shard the live state never saw -- assuming marker =>
    already-folded would under-count the state forever (r8 ADVICE).  The
    state tracks which batch ids it actually folded (populated by the
    restore_* functions and by every live fold), so the replayed path
    folds exactly the batches it is missing.  Without durability
    (``shard_path`` None) every batch folds -- the documented
    at-least-once mode."""
    return shard_path is None or int(batch_id) not in state.folded_batches


def restore_ann_state(
    spark,
    baseline,
    shard_path: str | None,
    drift_margin: float = 0.05,
    growth_ratio: int = 3,
) -> "AnnMaintenanceState":
    """A fresh ``AnnMaintenanceState`` with every COMMITTED stats shard
    under ``shard_path`` folded back in (no-op fresh state when
    ``shard_path`` is None or empty) -- integer sums are additive, so the
    rebuilt state is bit-identical to the uninterrupted run's."""
    state = AnnMaintenanceState(baseline.collect())
    state._drift_margin = drift_margin
    state._growth_ratio = growth_ratio
    for d in _committed_batch_dirs(spark, shard_path) if shard_path else []:
        state.fold_shard(spark.read.parquet(f"{d}/stats").collect())
        state.folded_batches.add(_batch_id_of(d))
    return state


def restore_pq_state(
    spark, baseline, shard_path: str | None, err_ratio: float = 1.5
) -> "PqMaintenanceState":
    """``restore_ann_state`` for the PQ monitor: fold back the committed
    per-subspace error shards."""
    state = PqMaintenanceState(baseline.collect(), err_ratio=err_ratio)
    for d in _committed_batch_dirs(spark, shard_path) if shard_path else []:
        state.fold_shard(spark.read.parquet(f"{d}/errs").collect())
        state.folded_batches.add(_batch_id_of(d))
    return state


def restore_refit_state(
    centroids,
    baseline,
    shard_path: str | None,
    drift_margin: float = 0.05,
    growth_ratio: int = 3,
) -> "RefitMaintenanceState":
    """A fresh ``RefitMaintenanceState`` with every committed batch's
    stats AND vector-mass shards folded back in: after a driver restart,
    drift verdicts and ``updated_centroids()`` are bit-identical to the
    uninterrupted run (parquet round-trips the integer sums exactly)."""
    spark = centroids.sparkSession
    state = RefitMaintenanceState(baseline.collect(), centroids, baseline)
    state.gauge_state._drift_margin = drift_margin
    state.gauge_state._growth_ratio = growth_ratio
    for d in _committed_batch_dirs(spark, shard_path) if shard_path else []:
        state.gauge_state.fold_shard(spark.read.parquet(f"{d}/stats").collect())
        state.fold_vector_shard(spark.read.parquet(f"{d}/vectors").collect())
        state.folded_batches.add(_batch_id_of(d))
    return state


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
        # batch ids this state has actually folded (durable mode only):
        # the marker on disk proves the SHARD committed, this set proves
        # the FOLD happened -- the two can diverge across a crash
        self.folded_batches: set[int] = set()

    def fold_shard(self, shard_rows, accumulate: bool = True) -> dict:
        """Fold one batch's (cell, n_vecs, qsum) shard rows in; return the
        batch's trigger gauge dict.  ``accumulate=False`` computes the
        per-batch gauges WITHOUT mutating the running state -- the
        replayed-batch path (the restored state already contains it)."""
        if accumulate:
            self.batches += 1
        n_batch = 0
        batch_cells: dict[int, tuple[int, int]] = {}
        for r in shard_rows:
            cell, n, qs = int(r["cell"]), int(r["n_vecs"]), int(r["qsum"])
            n_batch += n
            batch_cells[cell] = (n, qs)
            if accumulate:
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
    shard_path: str | None = None,
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
    flows on to ``downstream(df, batch_id)`` if given.  With
    ``shard_path``, shards persist through the exactly-once marker
    protocol and the state auto-restores from committed shards at
    construction (see module docstring)."""
    from ..functions.similarity import ann_stats_shard

    state = restore_ann_state(
        centroids.sparkSession, baseline, shard_path, drift_margin, growth_ratio
    )

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            shard_df = ann_stats_shard(batch_df, centroids)
            if shard_path is not None:
                _write_shard_batch(
                    batch_df.sparkSession, shard_path, batch_id,
                    {"stats": shard_df},
                )
            shard_rows = shard_df.collect()
            accumulate = _should_accumulate(state, shard_path, batch_id)
            gauges = state.fold_shard(shard_rows, accumulate=accumulate)
            if accumulate and shard_path is not None:
                state.folded_batches.add(int(batch_id))
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
        self.folded_batches: set[int] = set()  # see AnnMaintenanceState

    def fold_shard(self, err_rows, accumulate: bool = True) -> dict:
        """Fold one batch's per-sub (sub, n, qsum) error rows in; return
        the batch's trigger gauges.  ``accumulate=False`` is the
        replayed-batch path (gauges only, no state mutation)."""
        if accumulate:
            self.batches += 1
        n_batch = 0  # (vec, sub) rows; vectors = n_batch / #subs seen
        subs_seen = set()
        flagged = 0
        worst_ratio = 0.0
        for r in err_rows:
            sub, n, qs = int(r["sub"]), int(r["n"]), int(r["qsum"])
            n_batch += n
            subs_seen.add(sub)
            if accumulate:
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
    shard_path: str | None = None,
):
    """Streaming PQ-index maintenance: the ``ann_maintenance_monitor``
    recipe on the product quantizer.  Per micro-batch: one map-only
    ``pq_encode_with_error`` pass (streaming-legal fold) rolled up to
    per-subspace integer error sums, folded into O(subspaces) driver
    state, compared against the fitted ``pq_error_stats`` baseline with
    ``pq_increment``'s absolute-error ratio trigger, and published under
    ``spark.streaming.pqMaintenance`` through the fail-open sink path.
    A flagged subspace's remedy is ``pq_update`` (incremental) or
    ``pq_fit`` (full), both offline -- the monitor only decides.  With
    ``shard_path``, error shards persist exactly-once and the state
    auto-restores from committed shards (module docstring)."""
    from pyspark.sql import functions as F

    from ..functions.pq import pq_encode_with_error

    state = restore_pq_state(
        codebooks.sparkSession, baseline, shard_path, err_ratio=err_ratio
    )

    def _body(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            err_df = (
                pq_encode_with_error(batch_df, codebooks)
                .withColumn("q", F.round(F.col("err") * 1_000_000).cast("long"))
                .groupBy("sub")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("q").cast("long").alias("qsum"),
                )
            )
            if shard_path is not None:
                _write_shard_batch(
                    batch_df.sparkSession, shard_path, batch_id,
                    {"errs": err_df},
                )
            err_rows = err_df.collect()
            accumulate = _should_accumulate(state, shard_path, batch_id)
            gauges = state.fold_shard(err_rows, accumulate=accumulate)
            if accumulate and shard_path is not None:
                state.folded_batches.add(int(batch_id))
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
    shard_path: str | None = None,
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

    With ``shard_path`` (r7 verdict ask #4), each batch's stats AND
    vector-mass shards commit together under one exactly-once marker,
    and a monitor rebuilt with the same path restores bit-identical state
    -- kill/restart mid-stream loses nothing (pinned in
    ``tests/test_streaming_annmaint.py::test_refit_monitor_survives_restart``).

    Returns (state, foreachBatch_body); state is a
    ``RefitMaintenanceState`` wrapping the gauge state."""
    from ..functions.similarity import ann_stats_shard, ann_vector_shard

    state = restore_refit_state(
        centroids, baseline, shard_path, drift_margin, growth_ratio
    )

    def _body(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            stats_df = ann_stats_shard(batch_df, centroids)
            vec_df = ann_vector_shard(batch_df, centroids)
            if shard_path is not None:
                _write_shard_batch(
                    batch_df.sparkSession, shard_path, batch_id,
                    {"stats": stats_df, "vectors": vec_df},
                )
            accumulate = _should_accumulate(state, shard_path, batch_id)
            gauges = state.gauge_state.fold_shard(
                stats_df.collect(), accumulate=accumulate
            )
            gauges["batchId"] = int(batch_id)
            if accumulate:
                state.fold_vector_shard(vec_df.collect())
                if shard_path is not None:
                    state.folded_batches.add(int(batch_id))
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
        self.folded_batches: set[int] = set()  # see AnnMaintenanceState

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
