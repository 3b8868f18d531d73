"""Streaming token-budget admission (r8): the ingest-side governor for
token-budget curation -- admit streaming documents per stratum until each
stratum's TOKEN budget is exhausted, then stop admitting that stratum.

The batch operator (``sampling.token_budget_sample``) picks the smallest
hash-prefix of a STATIC corpus; on a stream the corpus arrives
incrementally, so the governor holds the spent-token ledger (O(strata)
driver state) and gives each micro-batch the REMAINING budgets: within a
batch, docs are admitted in the same deterministic (hash, key) order via
``token_budget_sample`` itself (two-level, no full-stratum window), the
boundary-crossing doc is kept (the batch operator's contract), and the
admitted tokens fold into the ledger.  A stratum whose ledger meets its
budget admits nothing further.

Durability is the ``annmaint`` contract: with ``shard_path``, each
batch's per-stratum admitted-token shard commits under one atomic
``_COMMITTED`` marker BEFORE the ledger folds, and a monitor rebuilt
with the same path restores the ledger bit-identically; replayed batches
re-emit their gauges (and re-deliver the SAME admitted set to the sink,
which is what exactly-once downstreams expect from foreachBatch replay)
without double-counting the ledger.

Wire as::

    state, body = budget_admission_monitor(
        {"code": 200_000_000, "forum": 50_000_000},
        admitted_sink=idempotent_batch_sink("/data/admitted"),
        shard_path="/data/budget-ledger",
    )
    docs_stream.writeStream.foreachBatch(body).start()

Gauges publish under ``spark.streaming.budgetAdmission`` through the
fail-open sink path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .annmaint import _batch_id_of, _committed_batch_dirs, _write_shard_batch

BUDGET_GAUGE_SOURCE = "spark.streaming.budgetAdmission"


class BudgetAdmissionState:
    """O(strata) ledger: tokens admitted so far per stratum."""

    def __init__(self, budgets: dict[str, int]) -> None:
        self.budgets = {s: int(b) for s, b in budgets.items()}
        self.spent: dict[str, int] = {s: 0 for s in budgets}
        self.batches = 0
        # batch ids this ledger actually folded (durable mode): the disk
        # marker proves the shard committed, this proves the fold -- they
        # diverge across a crash between seal and fold (r8 ADVICE)
        self.folded_batches: set[int] = set()

    def remaining(self) -> dict[str, int]:
        """Strata that still admit: budget minus ledger, positive only."""
        return {
            s: b - self.spent[s]
            for s, b in self.budgets.items()
            if b - self.spent[s] > 0
        }

    def fold(self, admitted_rows, accumulate: bool = True) -> dict:
        """Fold one batch's per-stratum (stratum, n_docs, n_tokens)
        admission shard; returns the batch's gauges.  ``accumulate=False``
        is the replayed-batch path (gauges only)."""
        if accumulate:
            self.batches += 1
        docs = toks = 0
        for r in admitted_rows:
            s, nd, nt = r["stratum"], int(r["n_docs"]), int(r["n_tokens"])
            docs += nd
            toks += nt
            if accumulate:
                self.spent[s] = self.spent.get(s, 0) + nt
        exhausted = sum(
            1 for s, b in self.budgets.items() if self.spent[s] >= b
        )
        return {
            "admittedDocs": docs,
            "admittedTokens": toks,
            "exhaustedStrata": exhausted,
            "openStrata": len(self.budgets) - exhausted,
        }


def restore_budget_state(
    spark, budgets: dict[str, int], shard_path: str | None
) -> BudgetAdmissionState:
    """A fresh ledger with every COMMITTED admission shard folded back
    in -- integer sums, so the rebuilt ledger equals the uninterrupted
    run's."""
    state = BudgetAdmissionState(budgets)
    for d in _committed_batch_dirs(spark, shard_path) if shard_path else []:
        state.fold(spark.read.parquet(f"{d}/admitted").collect())
        state.folded_batches.add(_batch_id_of(d))
    return state


def budget_admission_monitor(
    budgets: dict[str, int],
    admitted_sink=None,
    analyzer=None,
    gauge_sinks=None,
    stratum: str = "source",
    key: str = "doc_id",
    shard_path: str | None = None,
    spark=None,
):
    """Build (state, foreachBatch_body).  ``admitted_sink(df, batch_id)``
    receives each batch's admitted rows (with n_tokens/cum_tokens);
    ``shard_path`` makes the ledger durable (see module docstring).
    ``spark`` restores the ledger from ``shard_path`` eagerly at
    construction; without it the restore runs LAZILY on the first batch
    (using the batch's own session) -- either way a rebuilt monitor
    never starts from a zero ledger while committed shards exist (r8
    ADVICE fix: the zero-ledger start over-admitted past budgets)."""
    from ..functions.sampling import token_budget_sample

    state = BudgetAdmissionState(budgets)
    restored = shard_path is None
    if shard_path is not None and spark is not None:
        state = restore_budget_state(spark, budgets, shard_path)
        restored = True

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

        nonlocal restored
        batch_df.persist()
        try:
            spark_ = batch_df.sparkSession
            if not restored:
                # lazy restore (no session at construction): fold every
                # committed shard into the SAME state object the caller
                # holds before admitting anything
                for d in _committed_batch_dirs(spark_, shard_path):
                    state.fold(spark_.read.parquet(f"{d}/admitted").collect())
                    state.folded_batches.add(_batch_id_of(d))
                restored = True
            replayed = False
            remaining = state.remaining()
            if shard_path is not None:
                out = f"{shard_path}/batch_id={batch_id}"
                fs, _ = _hadoop_fs(spark_, out)
                marker = spark_._jvm.org.apache.hadoop.fs.Path(
                    f"{out}/{_COMMIT_MARKER}"
                )
                if fs.exists(marker) and int(batch_id) in state.folded_batches:
                    # replayed batch the ledger already folded: reconstruct
                    # the PRE-batch remaining budgets so the re-delivered
                    # admitted set is byte-identical to the original
                    # delivery (what an exactly-once downstream expects
                    # from foreachBatch replay).  A committed-but-unfolded
                    # batch (crash between seal and fold) takes the fresh
                    # path instead: the ledger IS the pre-batch view.
                    replayed = True
                    prior = {
                        r["stratum"]: int(r["n_tokens"])
                        for r in spark_.read.parquet(f"{out}/admitted").collect()
                    }
                    remaining = {
                        s: b - (state.spent.get(s, 0) - prior.get(s, 0))
                        for s, b in state.budgets.items()
                        if b - (state.spent.get(s, 0) - prior.get(s, 0)) > 0
                    }
            if remaining:
                admitted = token_budget_sample(
                    batch_df, stratum, key, remaining
                ).persist()
            else:  # every stratum exhausted: admit nothing, still gauge
                admitted = batch_df.limit(0).withColumn(
                    "n_tokens", F.lit(0).cast("long")
                ).withColumn("cum_tokens", F.lit(0).cast("long")).persist()
            try:
                shard_df = admitted.groupBy(
                    F.col(stratum).alias("stratum")
                ).agg(
                    F.count(F.lit(1)).cast("long").alias("n_docs"),
                    F.sum("n_tokens").cast("long").alias("n_tokens"),
                )
                if not replayed and shard_path is not None:
                    _write_shard_batch(
                        spark_, shard_path, batch_id, {"admitted": shard_df}
                    )
                accumulate = shard_path is None or (
                    int(batch_id) not in state.folded_batches
                )
                gauges = state.fold(shard_df.collect(), accumulate=accumulate)
                if accumulate and shard_path is not None:
                    state.folded_batches.add(int(batch_id))
                gauges["batchId"] = int(batch_id)
                if analyzer is not None:
                    analyzer.set_extra_gauges(BUDGET_GAUGE_SOURCE, gauges)
                for sink in gauge_sinks or []:
                    pub = getattr(sink, "publish", None) or sink
                    try:
                        pub(BUDGET_GAUGE_SOURCE, dict(gauges))
                    except Exception:
                        pass  # fail-open, the analyzer's sink contract
                if admitted_sink is not None:
                    admitted_sink(admitted, batch_id)
            finally:
                admitted.unpersist()
        finally:
            batch_df.unpersist()

    return state, _body
