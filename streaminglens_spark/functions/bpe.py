"""BPE tokenizer training (round-5 extension): learn byte-pair-encoding
merges from the corpus -- the tokenizer-TRAINING step (Sennrich et al.
2016) that sits between corpus cleanup and ``pack_sequences`` in a real
pretraining pipeline; ``vocab_topk`` plans the vocab budget, this
produces the merge table a BPE tokenizer actually ships.

Algorithm (classic word-level BPE): reduce the corpus to its distinct
words with counts (the word table is the only thing the loop ever
touches -- at 100 TB the text reduces to a few million (word, count)
rows in one groupBy); start from character symbols; each round counts
adjacent symbol pairs weighted by word count, picks the most frequent
pair (ties: lexicographically smallest -- fully deterministic, no RNG),
and rewrites every word's symbol array with the pair merged
left-to-right non-overlapping (the standard greedy convention; after a
merge the new symbol differs from its left component, so chains cannot
cascade within a round).

Spark shape per round: ONE shuffle (pair-count groupBy over the word
table), an O(1)-row ``orderBy().limit(1)`` argmax (TakeOrdered -- the
same bounded driver traffic as a k-means centroid collect), and a
map-only ``aggregate`` fold that performs the merge inside the JVM --
no Python in the loop.  ``localCheckpoint`` per round keeps the plan
flat (the ``dedup_clusters`` iterative-DataFrame idiom).  Rounds are
sequential by nature (each merge depends on the last) -- the
parallelism is WITHIN a round, which is where the data is.

Determinism: counts are exact integers, the argmax tie-break is total,
and the merge rewrite is a pure function -- so the merge table is
bit-reproducible across engines and partitionings, and the DuckDB
oracle unrolls the same rounds as CTEs (the ``kmeans_fit`` precedent)
and hash-matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BPE_MERGES = 8


def _word_table(documents: DataFrame) -> DataFrame:
    """(ws: array<string> character symbols, cnt): the distinct-word
    reduction of the corpus.  r7: tokenize/explode at full parallelism
    (the scan-stage guard; no-op on real multi-split scans), and the
    OUTPUT is repartitioned to cluster width so every training round's
    pair-explode and merge fold -- which iterate this table, not the
    corpus -- run on all cores (AQE coalesces the build's shuffle to few
    partitions because the table is small in BYTES; the loop's cost is
    per-ROW compute, measured 10 -> 32 partitions on the checkpointed
    table)."""
    from ..plans.shape import scan_parallel

    words = (
        scan_parallel(documents.select("text"))
        .select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.split(F.col("w"), "").alias("ws"), "cnt")
    )
    # r8 (r7 ADVICE): never CAP a genuinely large word table -- the
    # target is max(cluster width, the shuffle width the aggregation ran
    # at), so a 2000-shuffle-partition cluster keeps its width and only
    # the AQE-coalesced-to-few case widens.  The shuffle itself stays
    # unconditional: probing the actual partition count under AQE would
    # execute the aggregation at plan-build time (the scan_parallel
    # lesson), and one O(distinct words) exchange amortizes over every
    # training round that iterates this table.
    spark = documents.sparkSession
    target = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return words.repartition(target)


def _pair_counts(words: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 1),
        lambda i: F.struct(
            F.element_at("ws", i).alias("a"),
            F.element_at("ws", i + 1).alias("b"),
        ),
    )
    return (
        words.filter(F.size("ws") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").cast("long").alias("c"))
    )


def _merge_expr(a: str, b: str) -> F.Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) in ws --
    a single JVM fold; the state is the output array itself."""
    merged = a + b

    def step(acc: F.Column, x: F.Column) -> F.Column:
        can = (
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            can,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(F.col("ws"), F.array().cast("array<string>"), step)


def bpe_train(documents: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (step, left, right, merged, pair_count) -- the artifact a tokenizer
    ships.  Stops early if no pair occurs at least twice."""
    spark = documents.sparkSession
    words = _word_table(documents).localCheckpoint()
    merges = _train_rounds(words, start_step=0, n_rounds=n_merges)
    return spark.createDataFrame(
        merges, "step long, left string, right string, merged string, pair_count long"
    )


def _apply_merge_round(words: DataFrame, a: str, b: str) -> DataFrame:
    """One merge applied to the word table: the containment-gated fold
    (a word lacking either symbol cannot contain the pair, and the fold
    is the IDENTITY on any word without the adjacent pair -- so the gate
    is output-identical while most of the table skips the O(len) rewrite
    once merges become rare symbols; measured 49 -> ~25 s for the 8-round
    sf1 fit).

    r14: tracked LAZY persist instead of the eager ``localCheckpoint()``.
    The eager form ran a dedicated materialization job per round ON TOP
    of the round's argmax job (and one final fold job whose result the
    loop never reads); with a persist, the NEXT round's argmax action
    materializes the cache as part of its own scan -- one job per round,
    and the discarded last-round fold costs nothing.  Unlike the lazy
    ``localCheckpoint(eager=False)`` route (tried and REVERTED, see
    OPTIMIZATION_r14.md: AQE never finalizes a lazy checkpoint whose
    consumer's result stage sits above a shuffle boundary, giving
    O(rounds^2) re-execution), an ``InMemoryRelation`` materializes
    block-by-block inside whatever job first scans it -- the same
    per-iterate pattern ``kmeans_fit`` uses.  The cache is also a
    CollapseProject barrier, so successive rounds' folds never nest into
    one 4^k expression tree.  Fold, gate and values are unchanged;
    ``_train_rounds`` unpersists each superseded round."""
    from ..cache import track

    has_both = F.array_contains("ws", a) & F.array_contains("ws", b)
    return track(
        words.select(
            F.when(has_both, _merge_expr(a, b)).otherwise(F.col("ws")).alias(
                "ws"
            ),
            "cnt",
        )
    )


def _train_rounds(
    words: DataFrame,
    start_step: int,
    n_rounds: int,
    stale: list[DataFrame] | None = None,
) -> list[tuple[int, str, str, str, int]]:
    """The BPE training loop over an (already checkpointed) word table:
    per round ONE job -- the pair-count shuffle + O(1)-row TakeOrdered
    argmax, whose scan also materializes the previous round's persisted
    merge fold (see ``_apply_merge_round``).  Mutates nothing; returns
    the discovered merge tuples with steps numbered from ``start_step``.

    Unpersist bookkeeping: after round i's argmax has materialized
    ``words``, the table ``words`` was derived FROM is no longer read by
    any future round -- release its blocks (``cache.untrack``) so a fit
    holds at most two word-table generations at once.  For the
    CHECKPOINTED base generation (bpe_train/bpe_extend's word table) the
    unpersist is a no-op on the checkpoint blocks -- those are freed by
    GC/ContextCleaner, same as before (ADVICE r14).

    ``stale`` (r15, ADVICE r14 medium): ``bpe_extend``'s replay chain
    persists one generation per REPLAYED merge, all of which the first
    argmax here materializes in cascade; they are superseded the moment
    that argmax completes, so they are released right after it instead
    of accumulating k generations until ``release_caches()``."""
    from ..cache import untrack

    merges: list[tuple[int, str, str, str, int]] = []
    prev: DataFrame | None = None
    for step_i in range(start_step, start_step + n_rounds):
        best = (
            _pair_counts(words)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        # the collect above scanned (and therefore materialized) `words`;
        # its parent generation(s) can no longer be read by anything
        if stale:
            for df in stale:
                untrack(df)
            stale = None
        if prev is not None:
            untrack(prev)
        if not best or best[0]["c"] < 2:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((step_i, a, b, a + b, c))
        prev = words
        words = _apply_merge_round(words, a, b)
    return merges


def bpe_extend(
    documents: DataFrame,
    merges: list[tuple[str, str]],
    n_more: int = BPE_MERGES,
) -> DataFrame:
    """Incremental tokenizer maintenance (r7): CONTINUE BPE training from
    an existing merge table on a (new or grown) corpus snapshot, instead
    of retraining from scratch -- the ``kmeans_update`` story for the
    tokenizer family.  The shipped merges are immutable (changing them
    would re-tokenize everything already trained on); extension appends.

    Pipeline shape: build the snapshot's word table once, REPLAY the
    existing merges in training order (k containment-gated fold passes
    over the O(distinct words) table -- the corpus text is read once,
    never per merge), then run ``n_more`` discovery rounds exactly like
    ``bpe_train``.  Deterministic continuation invariant (pinned in
    ``tests/test_bpe_extend.py``): on the SAME corpus,
    ``bpe_train(docs, k) + bpe_extend(docs, those merges, n)`` equals
    ``bpe_train(docs, k + n)`` row for row.

    Returns only the NEW merges, steps numbered from ``len(merges)``."""
    spark = documents.sparkSession
    words = _word_table(documents).localCheckpoint()
    replay: list[DataFrame] = []
    for a, b in merges:
        words = _apply_merge_round(words, a, b)
        replay.append(words)
    # every replayed generation but the LAST is superseded as soon as the
    # first discovery argmax materializes the chain; _train_rounds
    # releases them then (the last one is `words` itself -- the normal
    # prev-unpersist bookkeeping covers it)
    new_merges = _train_rounds(
        words, start_step=len(merges), n_rounds=n_more, stale=replay[:-1]
    )
    return spark.createDataFrame(
        new_merges,
        "step long, left string, right string, merged string, pair_count long",
    )


def bpe_segment(documents: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to the corpus: per document, the BPE
    token count and per-word symbol arrays' total -- the ENCODE side
    (the budget number ``pack_sequences`` consumes).  Each merge is one
    map-only fold applied in training order; no Python, no shuffle.
    Returns (doc_id, n_words, n_bpe_tokens)."""
    toks = F.filter(F.split(F.col("text"), " "), lambda w: F.length(w) > 0)
    sym = F.transform(toks, lambda w: F.split(w, ""))

    def apply_merge(arrs: F.Column, a: str, b: str) -> F.Column:
        merged = a + b

        def step(acc: F.Column, x: F.Column) -> F.Column:
            can = (
                (F.size(acc) > 0)
                & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (x == F.lit(b))
            )
            return F.when(
                can,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return F.transform(
            arrs,
            lambda ws: F.aggregate(ws, F.array().cast("array<string>"), step),
        )

    for a, b in merges:
        sym = apply_merge(sym, a, b)
    n_tokens = F.aggregate(
        F.transform(sym, F.size), F.lit(0).cast("long"), lambda acc, n: acc + n
    )
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        n_tokens.alias("n_bpe_tokens"),
    )


def bpe_train_sampled(
    documents: DataFrame,
    n_merges: int = BPE_MERGES,
    fraction: float = 1.0,
    key: str = "doc_id",
) -> DataFrame:
    """Sample-trained BPE (r7 verdict ask #5): ``hash_sample`` the corpus
    deterministically, train the merges on the sample, apply them
    corpus-wide with ``bpe_segment`` -- the standard way to take the
    trainer off the critical path at 100 TB (every production tokenizer
    -- GPT-2's, SentencePiece's sampled mode -- trains on a fraction;
    only the ENCODE pass must see every byte).

    Sampling-error story: BPE merges are ranked by corpus-wide pair
    frequency, and a deterministic hash sample preserves relative pair
    frequencies with standard Bernoulli concentration -- a pair chosen at
    rank r on the full corpus is misranked on the sample only when two
    pair counts lie within sampling noise of each other, in which case
    either choice was statistically indistinguishable for downstream
    compression.  The top-of-table merges (whitespace-adjacent
    characters, frequent bigraphs) sit orders of magnitude above the
    noise floor.  At ``fraction=1.0`` the sample filter keeps every row
    and the output is ROW-IDENTICAL to ``bpe_train`` (pinned in
    ``tests/test_bpe_sampled.py``), so correctness degrades continuously
    and observably with the fraction, never structurally.

    Plan shape: the hash filter is map-only and pushes into the scan;
    everything after is ``bpe_train`` on the (much smaller) sampled word
    table."""
    from .sampling import hash_sample

    return bpe_train(hash_sample(documents, key, fraction), n_merges)
