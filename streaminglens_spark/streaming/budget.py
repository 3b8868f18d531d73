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
        """Strata that still admit: budget minus ledger, positive only.
        ``spent`` may lack keys budgets has (the mixture ledger targets
        every SEEN stratum, but only ADMITTED strata ever fold -- a
        stratum whose target floors to 0 in its introducing batch is
        never admitted; r11 ADVICE), so missing keys read as 0."""
        return {
            s: b - self.spent.get(s, 0)
            for s, b in self.budgets.items()
            if b - self.spent.get(s, 0) > 0
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
            1
            for s, b in self.budgets.items()
            if self.spent.get(s, 0) >= b  # .get: see remaining()
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
        state.fold(
            spark.read.schema(_SEEN_SCHEMA)
            .parquet(f"{d}/admitted").collect()
        )
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
                    state.fold(
                        spark_.read.schema(_SEEN_SCHEMA)
                        .parquet(f"{d}/admitted").collect()
                    )
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
                        for r in spark_.read.schema(_SEEN_SCHEMA)
                        .parquet(f"{out}/admitted").collect()
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


MIXTURE_GAUGE_SOURCE = "spark.streaming.mixtureAdmission"

_SEEN_SCHEMA = "stratum string, n_docs long, n_tokens long"


def temperature_targets(
    seen: dict[str, int], total_tokens: int, sqrt_steps: int = 1
) -> dict[str, int]:
    """Driver-side mirror of ``functions.sampling.temperature_mixture_plan``
    over an O(strata) dict: per-stratum TARGET budgets from the observed
    token counts with the ``n^(2^-sqrt_steps)`` low-resource up-weighting.
    Bit-compatible with the Spark/DuckDB operator (pinned in
    tests/test_streaming_mixture.py): IEEE ``math.sqrt`` is correctly
    rounded like the JVM's, the normalizing sum folds in stratum-sorted
    order, micro weights round HALF_UP on the shortest-roundtrip decimal
    (Spark's ``round(double)`` is ``BigDecimal.valueOf(d).setScale(0,
    HALF_UP)``; ``Decimal(repr(x))`` is the same decimal value), the
    last stratum absorbs the residual so micros sum exactly to 1e6
    (with the degenerate-residual clamp: a negative residual zeroes the
    last micro and the deficit comes off the largest other micro, first
    in stratum order on ties -- r11 ADVICE, mirrored in
    ``_mixture_plan_from_counts`` and the oracles), and targets floor --
    so ``sum(targets) <= total_tokens``."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    strata = sorted(seen)
    ws = []
    for s in strata:
        x = float(int(seen[s]))
        for _ in range(int(sqrt_steps)):
            x = math.sqrt(x)
        ws.append(x)
    den = 0.0
    for x in ws:  # sequential fold in stratum order (the repo's idiom)
        den += x
    if den == 0.0:
        return {s: 0 for s in strata}
    rm = [
        int(
            Decimal(repr(x / den * 1_000_000)).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        for x in ws
    ]
    resid = 1_000_000 - (sum(rm) - rm[-1])
    if resid >= 0:
        rm[-1] = resid
    else:  # degenerate: clamp last at 0, deficit off the largest other
        rm[-1] = 0
        rm[rm.index(max(rm[:-1]))] += resid
    return {
        s: int(total_tokens) * m // 1_000_000 for s, m in zip(strata, rm)
    }


class MixtureBudgetState(BudgetAdmissionState):
    """The mixture-tracking ledger (r11, r10 verdict ask #5): alongside
    the spent-token ledger it keeps the cumulative SEEN-token manifest
    per stratum, and its budgets are not static -- they are the
    temperature targets recomputed from that manifest, so the admission
    tracks the mixture as the stream grows (a low-resource source's
    share rises as richer sources flood in)."""

    def __init__(self, total_tokens: int, sqrt_steps: int = 1) -> None:
        super().__init__({})
        self.total_tokens = int(total_tokens)
        self.sqrt_steps = int(sqrt_steps)
        self.seen: dict[str, int] = {}

    def targets(self, extra_seen: dict[str, int] | None = None) -> dict:
        """Temperature targets from the seen manifest, optionally with a
        not-yet-folded batch's counts added (the fresh-batch path sizes
        budgets INCLUDING the arriving batch, so a brand-new stratum is
        admittable in the very batch that introduces it)."""
        seen = dict(self.seen)
        for s, n in (extra_seen or {}).items():
            seen[s] = seen.get(s, 0) + int(n)
        return temperature_targets(seen, self.total_tokens, self.sqrt_steps)

    def fold_seen(self, seen_rows, accumulate: bool = True) -> dict:
        """Fold one batch's per-stratum (stratum, n_docs, n_tokens) SEEN
        shard into the manifest; returns the batch's seen gauges."""
        docs = toks = 0
        for r in seen_rows:
            s, nd, nt = r["stratum"], int(r["n_docs"]), int(r["n_tokens"])
            docs += nd
            toks += nt
            if accumulate:
                self.seen[s] = self.seen.get(s, 0) + nt
        return {"seenDocs": docs, "seenTokens": toks}


def restore_mixture_state(
    spark, total_tokens: int, sqrt_steps: int, shard_path: str | None
) -> MixtureBudgetState:
    """A fresh mixture ledger with every COMMITTED batch's seen AND
    admitted shards folded back in -- integer sums, so the rebuilt
    manifest (and therefore every recomputed target) equals the
    uninterrupted run's."""
    state = MixtureBudgetState(total_tokens, sqrt_steps)
    for d in _committed_batch_dirs(spark, shard_path) if shard_path else []:
        state.fold_seen(
            spark.read.schema(_SEEN_SCHEMA).parquet(f"{d}/seen").collect()
        )
        state.fold(
            spark.read.schema(_SEEN_SCHEMA)
            .parquet(f"{d}/admitted").collect()
        )
        state.folded_batches.add(_batch_id_of(d))
    state.budgets = state.targets()
    return state


def mixture_admission_monitor(
    total_tokens: int,
    sqrt_steps: int = 1,
    admitted_sink=None,
    analyzer=None,
    gauge_sinks=None,
    stratum: str = "source",
    key: str = "doc_id",
    shard_path: str | None = None,
    spark=None,
):
    """Temperature-mixture-tracking admission (r11, r10 verdict ask #5):
    ``budget_admission_monitor`` with the static budgets dict replaced
    by targets RECOMPUTED from the cumulative per-stratum seen-token
    manifest -- ``temperature_targets`` over O(strata) driver state.

    Recompute cadence: EVERY batch, not every compaction generation.
    The targets are a pure O(strata) driver-side function of the seen
    manifest (no Spark job), so per-batch recompute costs nothing and is
    strictly finer-grained than the per-generation alternative -- and it
    keeps replay deterministic WITHOUT pinning which generation a batch
    was admitted under: a batch's targets are a pure function of the
    committed seen manifest THROUGH that batch (the fresh path folds the
    arriving batch's counts in before sizing budgets), which a replayed
    batch reconstructs exactly (its own shard is already folded; its
    spent subtracts per the standard pre-batch-remaining protocol).

    Durability is the ``budget_admission_monitor`` contract with TWO
    tables per batch shard -- ``admitted`` and ``seen`` -- sealed under
    ONE atomic marker, so the manifest and the ledger can never diverge
    across a crash.  Gauges add ``seenDocs``/``seenTokens`` and publish
    under ``spark.streaming.mixtureAdmission``."""
    from ..functions.sampling import token_budget_sample

    state = MixtureBudgetState(total_tokens, sqrt_steps)
    restored = shard_path is None
    if shard_path is not None and spark is not None:
        state = restore_mixture_state(
            spark, total_tokens, sqrt_steps, shard_path
        )
        restored = True

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from ..sources.sinks import _COMMIT_MARKER, _hadoop_fs

        nonlocal restored
        batch_df.persist()
        try:
            spark_ = batch_df.sparkSession
            if not restored:
                for d in _committed_batch_dirs(spark_, shard_path):
                    state.fold_seen(
                        spark_.read.schema(_SEEN_SCHEMA)
                        .parquet(f"{d}/seen").collect()
                    )
                    state.fold(
                        spark_.read.schema(_SEEN_SCHEMA)
                        .parquet(f"{d}/admitted").collect()
                    )
                    state.folded_batches.add(_batch_id_of(d))
                restored = True
            toks = F.size(
                F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
            ).cast("long")
            seen_df = batch_df.groupBy(F.col(stratum).alias("stratum")).agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(toks).cast("long").alias("n_tokens"),
            )
            seen_rows = seen_df.collect()
            batch_seen = {
                r["stratum"]: int(r["n_tokens"]) for r in seen_rows
            }
            replayed = False
            if shard_path is not None:
                out = f"{shard_path}/batch_id={batch_id}"
                fs, _ = _hadoop_fs(spark_, out)
                marker = spark_._jvm.org.apache.hadoop.fs.Path(
                    f"{out}/{_COMMIT_MARKER}"
                )
                replayed = (
                    fs.exists(marker)
                    and int(batch_id) in state.folded_batches
                )
            if replayed:
                # the manifest already contains this batch: targets come
                # straight from it; pre-batch remaining subtracts the
                # batch's own committed admitted shard
                targets = state.targets()
                prior = {
                    r["stratum"]: int(r["n_tokens"])
                    for r in spark_.read.schema(_SEEN_SCHEMA)
                    .parquet(f"{out}/admitted").collect()
                }
                remaining = {
                    s: t - (state.spent.get(s, 0) - prior.get(s, 0))
                    for s, t in targets.items()
                    if t - (state.spent.get(s, 0) - prior.get(s, 0)) > 0
                }
            else:
                # fresh batch: size the targets INCLUDING the arriving
                # batch's seen counts (identical to what a later replay
                # reconstructs from the folded manifest)
                targets = state.targets(extra_seen=batch_seen)
                remaining = {
                    s: t - state.spent.get(s, 0)
                    for s, t in targets.items()
                    if t - state.spent.get(s, 0) > 0
                }
            state.budgets = targets  # gauges/remaining() see live targets
            if remaining:
                admitted = token_budget_sample(
                    batch_df, stratum, key, remaining
                ).persist()
            else:
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
                        spark_, shard_path, batch_id,
                        {"admitted": shard_df, "seen": seen_df},
                    )
                accumulate = shard_path is None or (
                    int(batch_id) not in state.folded_batches
                )
                gauges = state.fold_seen(seen_rows, accumulate=accumulate)
                gauges.update(
                    state.fold(shard_df.collect(), accumulate=accumulate)
                )
                if accumulate and shard_path is not None:
                    state.folded_batches.add(int(batch_id))
                gauges["batchId"] = int(batch_id)
                if analyzer is not None:
                    analyzer.set_extra_gauges(MIXTURE_GAUGE_SOURCE, gauges)
                for sink in gauge_sinks or []:
                    pub = getattr(sink, "publish", None) or sink
                    try:
                        pub(MIXTURE_GAUGE_SOURCE, dict(gauges))
                    except Exception:
                        pass  # fail-open, the analyzer's sink contract
                if admitted_sink is not None:
                    admitted_sink(admitted, batch_id)
            finally:
                admitted.unpersist()
        finally:
            batch_df.unpersist()

    return state, _body
