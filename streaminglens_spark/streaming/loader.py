"""The COMPLETE streaming loader story in one monitor (r12, r11 verdict
ask #4): clean -> score -> incremental near-dup vs the committed index ->
quality gate -> budget admission -> attachment-time train/val split ->
append-only training order, per micro-batch, with every batch's FOUR
state tables (``index``, ``admitted``, ``roots``, ``order``) sealed under
ONE atomic ``_COMMITTED`` marker -- the single generation ledger the
pieces (``ingest.py`` admission, ``split.py`` assignment, the order
counter) previously required a user to wire by hand.

Semantics -- the composition, stage by stage:

- ADMISSION is ``corpus_ingest_monitor``'s exactly: normalize + redact +
  integer quality score (all JVM regexp chains), dedup against the
  cumulative minhash index (a doc loses iff it matches any
  strictly-earlier doc), quality threshold, then token-budget admission
  against the spent-token ledger (greedy per batch -- the documented
  stream-order delta vs the batch flagship's global quality-ordered
  budgets, ``q_ingest_full``).
- SPLIT is ``split_assignment_monitor``'s attachment-time rule over ALL
  batch docs (admitted or not -- mirroring ``q_ingest_full``, which
  splits the full raw corpus so the clusters see every near-dup), and it
  SHARES the admission's match join: one ``dedup_against_index`` pass
  feeds both the loser set and the root attachment (the ``verdicts=``
  hook on ``assign_splits_of_batch``).
- ORDER is append-only: each batch's admitted TRAIN docs take the next
  dense positions (within a batch, ascending doc id -- ids increase
  across batches, so positions follow arrival order) with round-robin
  shards.  The epoch-shuffle training order stays a batch post-pass
  (``corpus_shuffle`` / ``q_epoch_shuffle``) once the corpus freezes:
  a global permutation is not an incremental object; the stream's order
  is the bootstrap/curriculum order.  r14: ``order="curriculum"``
  additionally BANDS the append stream by the admission quality score
  (dense per-band positions, per-(band, shard) pack streams) -- the
  quality-banded half of the batch curriculum IS an incremental
  object, only its within-band shuffle is not; see
  ``loader_ingest_monitor``.
- PACKING is append-only too (r12b): sequence packing in arrival order
  is an incremental object -- each batch's train docs EXTEND their
  shard's token stream, and earlier offsets/sequence boundaries never
  move -- so the ``order`` table also carries each doc's
  ``token_offset`` / ``first_seq`` / ``last_seq`` spans, bit-equal to
  ``pack_sequences(shard_col="shard", order_col="train_pos")`` over the
  concatenated stream's train set.  Per-shard base offsets come from
  the committed strictly-earlier view (one O(n_shards) aggregate,
  broadcast back -- never driver state); the per-(shard, seq) manifest
  stays a read-side fold because a sequence straddling the stream head
  is not final until the next batch writes past it.

Durability: ONE ``_write_shard_batch`` call per batch -- four tables,
one marker, so admission ledger, dedup index, split roots and the order
counter can never diverge across a crash.  A replayed batch recomputes
every stage from the PRE-batch committed view (its own shards excluded
by directory, or by ``src_batch`` after compaction) and re-delivers
byte-identically; restart needs no driver state (``restore_loader_state``
folds the ledger and the committed batch-id set back from disk).  The
generic generation compaction (``ingest.compact_tables``) folds all four
tables every ``compact_every`` batches.

Gauges publish under ``spark.streaming.loaderIngest``: the admission
gauges (inDocs, dupRejects, qualityRejects, admittedDocs/Tokens,
exhausted/openStrata) plus valDocs/trainDocs/splitConflicts and
trainPositions (the running order-counter high-water mark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .annmaint import _write_shard_batch
from .budget import BudgetAdmissionState, MixtureBudgetState
from .ingest import (
    INDEX_COMPACT_EVERY,
    _BatchDirCache,
    _batch_id_of,
    _committed_batch_dirs,
    committed_table_view,
    maybe_compact_tables,
)
from .split import assign_splits_of_batch

LOADER_GAUGE_SOURCE = "spark.streaming.loaderIngest"

_IDX_SCHEMA = "doc_id long, md5_fp string, mh array<bigint>"
_ADMIT_SCHEMA = "stratum string, n_docs long, n_tokens long"
_ROOTS_SCHEMA = "doc_id long, root long, split string"
_ORDER_SCHEMA = (
    "doc_id long, n_tokens long, train_pos long, shard int,"
    " token_offset long, first_seq long, last_seq long"
)
# curriculum order mode (r14): band + per-band dense position appended;
# shard/packing run per (band, shard) so each band's token streams stay
# append-only objects of their own
_ORDER_CURR_SCHEMA = _ORDER_SCHEMA + ", band int, band_pos long"
_LOADER_TABLES = {
    "index": _IDX_SCHEMA,
    "admitted": _ADMIT_SCHEMA,
    "roots": _ROOTS_SCHEMA,
    "order": _ORDER_SCHEMA,
}


def _committed_ids(spark, state_path, dir_cache=None) -> set[int]:
    """Every committed batch id.  Markers are permanent (compaction
    prunes a dir to its marker, never deletes it), so the dir listing is
    the complete fold set regardless of compaction state."""
    listed = (
        dir_cache.list(spark, state_path)
        if dir_cache is not None
        else _committed_batch_dirs(spark, state_path)
    )
    return {_batch_id_of(d) for d in listed}


def _batch_admitted_rows(spark, state_path, batch_id, dir_cache=None):
    """One batch's per-stratum admitted shard -- from its batch dir, or
    from the generation's ``src_batch`` provenance after compaction
    pruned the dir (the replay path's pre-batch-remaining subtraction)."""
    from ..sources.sinks import _hadoop_fs
    from .ingest import _committed_generations

    out = f"{state_path}/batch_id={batch_id}/admitted"
    fs, hpath = _hadoop_fs(spark, out)
    if fs.exists(hpath):
        return spark.read.schema(_ADMIT_SCHEMA).parquet(out).collect()
    gens = _committed_generations(spark, state_path)
    if not gens:
        return []
    return (
        spark.read.schema(_ADMIT_SCHEMA + ", src_batch long")
        .parquet(f"{gens[-1]}/admitted")
        .filter(F.col("src_batch") == int(batch_id))
        .drop("src_batch")
        .collect()
    )


def _fold_view(spark, state_path, sub, state_fold, dir_cache):
    rows = (
        committed_table_view(
            spark, state_path, sub, _ADMIT_SCHEMA, dir_cache
        )
        .groupBy("stratum")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .collect()
    )
    state_fold(rows)


def restore_loader_state(
    spark,
    budgets: dict[str, int] | None,
    state_path: str | None,
    mixture_total_tokens: int | None = None,
    mixture_sqrt_steps: int = 1,
):
    """The budget ledger rebuilt from the committed state: spent tokens
    fold from the cumulative ``admitted`` view (one generation + recent
    shards -- O(1) reads at any stream age), the folded-batch set from
    the permanent markers.  Mixture mode additionally folds the ``seen``
    view and recomputes the temperature targets from the rebuilt
    manifest.  None when the monitor runs without any budget mode."""
    if budgets is None and mixture_total_tokens is None:
        return None
    if mixture_total_tokens is not None:
        state = MixtureBudgetState(mixture_total_tokens, mixture_sqrt_steps)
    else:
        state = BudgetAdmissionState(budgets)
    if state_path:
        dir_cache = _BatchDirCache()
        if mixture_total_tokens is not None:
            _fold_view(spark, state_path, "seen", state.fold_seen, dir_cache)
        _fold_view(spark, state_path, "admitted", state.fold, dir_cache)
        state.folded_batches = _committed_ids(spark, state_path, dir_cache)
        state.batches = len(state.folded_batches)
        if mixture_total_tokens is not None:
            state.budgets = state.targets()
    return state


def loader_manifest(
    spark, state_path: str, seq_len: int = 256, dir_cache=None,
    order: str = "arrival", n_shards: int = 32,
) -> "DataFrame":
    """The per-(shard, seq_id) packed manifest of everything the loader
    stream has committed so far -- the read-side fold the module
    docstring promises (a sequence straddling the stream head is not
    final until later batches write past it, so the manifest is a READ
    of the committed order spans, not a per-batch emission).  One
    generation + recent shards in, ``sequence_manifest``'s span tail
    out; bit-equal to the batch manifest over the concatenated stream's
    train set.  Pass the monitor's ``seq_len``.

    r14: for a ``order="curriculum"`` stream (pass the monitor's
    ``order`` and ``n_shards``), the per-(band, shard) token streams
    flatten to the manifest shard id ``(2 - band) * n_shards + shard``
    -- band 2 (best) occupies shards [0, n), band 1 [n, 2n), band 0
    [2n, 3n), so ascending manifest shard IS the curriculum read
    order and per-band seq_ids can never collide."""
    from ..functions.text import manifest_from_packed

    if order == "curriculum":
        packed = (
            committed_table_view(
                spark, state_path, "order", _ORDER_CURR_SCHEMA, dir_cache
            )
            .filter(F.col("n_tokens") > 0)
            .withColumn(
                "shard",
                (
                    (F.lit(2) - F.col("band")) * F.lit(int(n_shards))
                    + F.col("shard")
                ).cast("int"),
            )
        )
    else:
        packed = committed_table_view(
            spark, state_path, "order", _ORDER_SCHEMA, dir_cache
        ).filter(F.col("n_tokens") > 0)
    return manifest_from_packed(packed, seq_len)


def loader_ingest_monitor(
    state_path: str,
    budgets: dict[str, int] | None = None,
    quality_threshold: int | None = None,
    dedup_threshold: float = 0.5,
    val_frac: float = 0.2,
    n_shards: int = 32,
    seq_len: int = 256,
    mixture_total_tokens: int | None = None,
    mixture_sqrt_steps: int = 1,
    train_sink=None,
    assigned_sink=None,
    analyzer=None,
    gauge_sinks=None,
    stratum: str = "source",
    key: str = "doc_id",
    spark=None,
    compact_every: int = INDEX_COMPACT_EVERY,
    dsir_weights: DataFrame | None = None,
    dsir_threshold_micro: int = 0,
    dsir_dim: int | None = None,
    order: str = "arrival",
):
    """Build (ledger_state, foreachBatch_body); see the module docstring
    for the composed semantics.  Input stream schema: (doc_id, text,
    source, ...); document ids must be globally increasing across
    batches.  ``train_sink(df, batch_id)`` receives each batch's
    admitted TRAIN docs as (doc_id, n_tokens, train_pos, shard,
    token_offset, first_seq, last_seq) -- the append-only pack spans at
    ``seq_len`` -- exactly once under replay; ``assigned_sink(df, batch_id)`` the full
    (doc_id, root, split, attached) assignment.  ``spark`` restores the
    ledger eagerly; without it the restore runs lazily on the first
    batch (the r8 zero-ledger lesson).

    MIXTURE MODE (r12b): ``mixture_total_tokens`` replaces the static
    budgets dict with temperature targets recomputed per batch from the
    cumulative per-stratum SEEN-token manifest (the r11
    ``mixture_admission_monitor`` semantics, composed into the full
    loader) -- a fifth ``seen`` table seals under the same marker so
    manifest and ledger never diverge; mutually exclusive with
    ``budgets``.

    DSIR GATE (r13, r12 verdict ask #5): ``dsir_weights`` (the frozen
    one-row ``warr`` table from ``dsir_fit`` over the static
    target+pool snapshot) REPLACES the fixed quality threshold with
    importance-based admission -- each batch's dedup survivors are
    scored map-only against the broadcast weights
    (``dsir_admit_batch``) and rows at or above
    ``dsir_threshold_micro`` pass the gate.  Scoring is row-local and
    the weights are frozen, so the gate is bit-identical to the batch
    operator over the concatenated stream: with the threshold set to
    the k-th batch score, the admitted set EQUALS ``dsir_select``'s
    top-k (parity pinned in ``tests/test_streaming_loader.py``).
    ``qualityRejects`` then counts DSIR rejections.  Mutually exclusive
    with ``quality_threshold``.  ``dsir_dim`` (default: the table's own
    ``size(warr)``) is validated against the weights table ONCE at
    construction -- a ``warr`` fitted at a non-default dim would
    otherwise score NULL via out-of-range ``element_at`` and silently
    drop every row (r13 advice).

    CURRICULUM ORDER (r14, r13 verdict ask #5): ``order="curriculum"``
    gives the stream the batch flagship's quality-banded training
    order (``ingest_packed(order="curriculum")``): each admitted TRAIN
    doc is banded by the SAME integer quality score the admission gate
    already computed (``curriculum_order``'s hi/lo milli thresholds,
    so stream bands are bit-equal to the batch operator's on the
    concatenated corpus), takes the next dense position WITHIN its
    band (band_pos -- append order inside a band, the incremental
    counterpart of the batch operator's within-band hash shuffle: a
    global re-shuffle is not an append-only object, the banding is),
    and packs into per-(band, shard) token streams whose offsets never
    move -- three independent append-only pack families instead of
    one.  The committed ``order`` table carries two extra columns
    (band, band_pos); the training read order is (band DESC, band_pos
    ASC).  Replay stays byte-identical (banding is row-local, bases
    come from the strictly-earlier committed view).  Parity, replay
    and layout pinned in ``tests/test_streaming_loader.py``."""
    if order not in ("arrival", "curriculum"):
        raise ValueError(
            f"order must be 'arrival' or 'curriculum', got {order!r}"
        )
    if dsir_weights is not None and quality_threshold is not None:
        raise ValueError(
            "pass dsir_weights OR quality_threshold, not both"
        )
    if dsir_weights is not None:
        # one-row broadcast table: a single tiny construction-time job,
        # traded for failing LOUDLY before the stream starts instead of
        # silently admitting nothing on a dim mismatch
        warr_size = dsir_weights.select(
            F.size("warr").alias("d")
        ).first()["d"]
        if dsir_dim is None:
            dsir_dim = int(warr_size)
        elif int(warr_size) != int(dsir_dim):
            raise ValueError(
                f"dsir_weights carries a warr of dim {warr_size} but "
                f"dsir_dim={dsir_dim}; a mismatched dim scores NULL and "
                f"drops every row -- refit the weights or fix dsir_dim"
            )
    if budgets is not None and mixture_total_tokens is not None:
        raise ValueError(
            "pass budgets OR mixture_total_tokens, not both"
        )
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
    mixture = mixture_total_tokens is not None
    if mixture:
        state = MixtureBudgetState(mixture_total_tokens, mixture_sqrt_steps)
    elif budgets is not None:
        state = BudgetAdmissionState(budgets)
    else:
        state = None
    restored = spark is not None or state is None
    if spark is not None:
        state = restore_loader_state(
            spark, budgets, state_path,
            mixture_total_tokens=mixture_total_tokens,
            mixture_sqrt_steps=mixture_sqrt_steps,
        )

    dir_cache = _BatchDirCache()
    tables = dict(_LOADER_TABLES)
    order_schema = (
        _ORDER_CURR_SCHEMA if order == "curriculum" else _ORDER_SCHEMA
    )
    tables["order"] = order_schema
    if mixture:
        tables["seen"] = _ADMIT_SCHEMA

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from ..cache import track, tracked_caches

        with tracked_caches():
            _run_batch(batch_df, batch_id, track)

    def _run_batch(batch_df: DataFrame, batch_id: int, track) -> None:
        nonlocal restored
        spark_ = batch_df.sparkSession
        if not restored:
            fresh = restore_loader_state(
                spark_, budgets, state_path,
                mixture_total_tokens=mixture_total_tokens,
                mixture_sqrt_steps=mixture_sqrt_steps,
            )
            state.spent = fresh.spent
            state.folded_batches = fresh.folded_batches
            state.batches = fresh.batches
            if mixture:
                state.seen = fresh.seen
                state.budgets = fresh.budgets
            restored = True
        out = f"{state_path}/batch_id={batch_id}"
        fs, _ = _hadoop_fs(spark_, out)
        marker = spark_._jvm.org.apache.hadoop.fs.Path(
            f"{out}/{_COMMIT_MARKER}"
        )
        replayed = fs.exists(marker)
        exclude = int(batch_id) if replayed else None

        index = committed_table_view(
            spark_, state_path, "index", _IDX_SCHEMA, dir_cache,
            exclude_batch=exclude,
        )
        roots = committed_table_view(
            spark_, state_path, "roots", _ROOTS_SCHEMA, dir_cache,
            exclude_batch=exclude,
        )
        # pre-batch order counter + per-shard token bases: committed
        # train rows of STRICTLY EARLIER batches (prefix semantics -- on
        # replay, later batches are committed too but must not count
        # toward this batch's base)
        prev_order = committed_table_view(
            spark_, state_path, "order", order_schema, dir_cache,
            before_batch=int(batch_id),
        )
        prev_train = prev_order.count()
        if order == "curriculum":
            # per-(band, shard) pack bases + per-band position bases:
            # each band's token streams are independent append-only
            # objects (O(3) and O(3 x n_shards) rows, broadcast back)
            shard_bases = prev_order.groupBy("band", "shard").agg(
                F.sum("n_tokens").cast("long").alias("_base")
            )
            band_bases = prev_order.groupBy("band").agg(
                F.count(F.lit(1)).cast("long").alias("_bbase")
            )
        else:
            shard_bases = prev_order.groupBy("shard").agg(
                F.sum("n_tokens").cast("long").alias("_base")
            )

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
        n_in = cleaned.count()

        # ONE match join feeds both admission dedup and split attachment
        verdicts = track(
            dedup_against_index(cleaned, index, dedup_threshold)
        )
        losers = (
            verdicts.filter(F.col("match_id") < F.col("new_id"))
            .select(F.col("new_id").alias(key))
            .distinct()
        )
        survivors = cleaned.join(losers, key, "left_anti")
        n_unique = survivors.count()
        if dsir_weights is not None:
            from .dsirstream import dsir_admit_batch

            quality = dsir_admit_batch(
                survivors,
                dsir_weights,
                threshold_micro=dsir_threshold_micro,
                dim=int(dsir_dim),
            ).drop("n_feats", "score_micro")
        else:
            quality = survivors.filter(
                F.col("score_milli") >= F.lit(int(thr))
            )
        n_quality = quality.count()

        # split ALL batch docs (the full-corpus-split contract)
        assigned, certain_losers = assign_splits_of_batch(
            cleaned.select(key, "text"), index, roots, val_frac,
            threshold=dedup_threshold, key=key, verdicts=verdicts,
        )
        assigned = track(assigned)

        # budget admission (the ingest monitor's ledger semantics; in
        # mixture mode the budgets are temperature targets recomputed
        # from the seen manifest -- the mixture monitor's protocol)
        seen_rows, batch_seen = [], {}
        if mixture:
            toks = F.size(
                F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
            ).cast("long")
            seen_rows = cleaned.groupBy(
                F.col(stratum).alias("stratum")
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(toks).cast("long").alias("n_tokens"),
            ).collect()
            batch_seen = {
                r["stratum"]: int(r["n_tokens"]) for r in seen_rows
            }
        if state is not None:
            if replayed and int(batch_id) in state.folded_batches:
                if mixture:
                    # the manifest already folded this batch: targets
                    # come straight from it (pure function of the
                    # committed seen THROUGH this batch)
                    state.budgets = state.targets()
                prior_rows = _batch_admitted_rows(
                    spark_, state_path, batch_id, dir_cache
                )
                prior = {}
                for r in prior_rows:
                    prior[r["stratum"]] = (
                        prior.get(r["stratum"], 0) + int(r["n_tokens"])
                    )
                remaining = {
                    s: b - (state.spent.get(s, 0) - prior.get(s, 0))
                    for s, b in state.budgets.items()
                    if b - (state.spent.get(s, 0) - prior.get(s, 0)) > 0
                }
            else:
                if mixture:
                    # fresh batch: size targets INCLUDING the arriving
                    # batch's seen counts (what a later replay
                    # reconstructs from the folded manifest)
                    state.budgets = state.targets(extra_seen=batch_seen)
                remaining = state.remaining()
            if remaining:
                admitted = token_budget_sample(
                    quality, stratum, key, remaining
                )
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

        # append-only training order over the batch's admitted TRAIN docs
        # (in-batch window is micro-batch-bounded -- not a corpus window)
        train_cols = [key, "n_tokens"]
        if order == "curriculum":
            train_cols.append("score_milli")
        train = admitted.select(*train_cols).join(
            assigned.filter(F.col("split") == "train").select(
                F.col("doc_id").alias(key)
            ),
            key,
        )
        pos = (
            F.lit(int(prev_train)).cast("long")
            + F.row_number().over(Window.orderBy(key))
            - 1
        )
        L = int(seq_len)
        if order == "curriculum":
            from ..functions.sampling import (
                CURRICULUM_HI_MILLI,
                CURRICULUM_LO_MILLI,
            )

            # band from the ALREADY-computed admission score -- the
            # same thresholds as the batch curriculum_order, so stream
            # bands match the batch operator's bit-for-bit
            band = (
                F.when(
                    F.col("score_milli") >= F.lit(int(CURRICULUM_HI_MILLI)),
                    F.lit(2),
                )
                .when(
                    F.col("score_milli") >= F.lit(int(CURRICULUM_LO_MILLI)),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("int")
            )
            banded = train.withColumn("band", band).withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("band").orderBy(key)
                ),
            )
            # dense per-band positions continue each band's committed
            # counter (broadcast O(3)-row attach)
            band_pos = (
                F.coalesce(F.col("_bbase"), F.lit(0).cast("long"))
                + F.col("_rn")
                - 1
            )
            ordered = (
                banded.join(F.broadcast(band_bases), "band", "left")
                .select(
                    F.col(key).alias("doc_id"),
                    F.col("n_tokens"),
                    pos.alias("train_pos"),
                    F.col("band"),
                    band_pos.cast("long").alias("band_pos"),
                )
                .withColumn(
                    "shard", (F.col("band_pos") % n_shards).cast("int")
                )
            )
            wsh = Window.partitionBy("band", "shard").orderBy("band_pos")
            with_off = ordered.join(
                F.broadcast(shard_bases), ["band", "shard"], "left"
            )
            extra_order_cols = ["band", "band_pos"]
        else:
            ordered = train.select(
                F.col(key).alias("doc_id"),
                F.col("n_tokens"),
                pos.alias("train_pos"),
            ).withColumn(
                "shard", (F.col("train_pos") % n_shards).cast("int")
            )
            # append-only pack spans: per-shard cumulative offsets
            # continue from the committed prefix's shard totals
            # (broadcast O(n_shards) aggregate); in-batch windows are
            # micro-batch-bounded
            wsh = Window.partitionBy("shard").orderBy("train_pos")
            with_off = ordered.join(
                F.broadcast(shard_bases), "shard", "left"
            )
            extra_order_cols = []
        off = (
            F.coalesce(F.col("_base"), F.lit(0).cast("long"))
            + F.sum("n_tokens").over(
                wsh.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.col("n_tokens")
        )
        with_off = with_off.withColumn("token_offset", off.cast("long"))
        order_df = track(
            with_off.select(
                "doc_id",
                "n_tokens",
                "train_pos",
                "shard",
                "token_offset",
                F.when(
                    F.col("n_tokens") > 0,
                    F.floor(F.col("token_offset") / L),
                ).cast("long").alias("first_seq"),
                F.when(
                    F.col("n_tokens") > 0,
                    F.floor(
                        (F.col("token_offset") + F.col("n_tokens") - 1) / L
                    ),
                ).cast("long").alias("last_seq"),
                *extra_order_cols,
            )
        )

        shard = admitted.groupBy(F.col(stratum).alias("stratum")).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        if not replayed:
            index_shard = minhash_index(cleaned.select(key, "text")).join(
                certain_losers.withColumnRenamed(key, "doc_id"),
                "doc_id",
                "left_anti",
            )
            batch_tables = {
                "index": index_shard,
                "admitted": shard,
                "roots": assigned.select("doc_id", "root", "split"),
                "order": order_df,
            }
            if mixture:
                batch_tables["seen"] = spark_.createDataFrame(
                    [(r["stratum"], int(r["n_docs"]), int(r["n_tokens"]))
                     for r in seen_rows],
                    _ADMIT_SCHEMA,
                )
            _write_shard_batch(
                spark_, state_path, batch_id, batch_tables
            )
        shard_rows = shard.collect()
        if state is not None:
            accumulate = int(batch_id) not in state.folded_batches
            gauges = state.fold(shard_rows, accumulate=accumulate)
            if mixture:
                gauges.update(
                    state.fold_seen(seen_rows, accumulate=accumulate)
                )
            if accumulate:
                state.folded_batches.add(int(batch_id))
        else:
            gauges = {
                "admittedDocs": sum(int(r["n_docs"]) for r in shard_rows),
                "admittedTokens": sum(
                    int(r["n_tokens"]) for r in shard_rows
                ),
            }
        agg = assigned.agg(
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias(
                "nv"
            ),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(
                F.when(F.col("_conflict"), F.col("root"))
            ).alias("nc"),
        ).collect()[0]
        n_train_batch = order_df.count()
        gauges.update(
            {
                "inDocs": int(n_in),
                "dupRejects": int(n_in - n_unique),
                "qualityRejects": int(n_unique - n_quality),
                "valDocs": int(agg["nv"] or 0),
                "trainDocs": int(agg["n"]) - int(agg["nv"] or 0),
                "splitConflicts": int(agg["nc"] or 0),
                "trainPositions": int(prev_train) + int(n_train_batch),
                "batchId": int(batch_id),
            }
        )
        if analyzer is not None:
            analyzer.set_extra_gauges(LOADER_GAUGE_SOURCE, gauges)
        for sink in gauge_sinks or []:
            pub = getattr(sink, "publish", None) or sink
            try:
                pub(LOADER_GAUGE_SOURCE, dict(gauges))
            except Exception:
                pass  # fail-open, the analyzer's sink contract
        if assigned_sink is not None:
            assigned_sink(
                assigned.select("doc_id", "root", "split", "attached"),
                batch_id,
            )
        if train_sink is not None:
            train_sink(order_df, batch_id)
        if not replayed:
            maybe_compact_tables(
                spark_, state_path, tables, dir_cache, compact_every
            )

    return state, _body
