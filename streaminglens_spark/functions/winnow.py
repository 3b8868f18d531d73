"""Winnowing minimizer fingerprints (round-5 continued extension): the
MOSS algorithm (Schleimer, Wilkerson, Aiken -- "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD'03), the classic
substring-robust document sketch.

Why a pipeline wants it next to MinHash: MinHash estimates WHOLE-document
Jaccard, so a long page that embeds a copied paragraph in fresh
boilerplate scores low; winnowing selects, from every window of ``w``
consecutive token-k-gram hashes, the window minimum -- and guarantees
that any shared run of ``w + k - 1`` tokens contributes at least one
IDENTICAL selected hash to both documents.  Shared-passage detection
becomes an equi-join on minimizer values (the same bucket-join shape as
LSH banding), with the sketch ~``2/(w+1)`` the size of the full gram set.

Determinism: window minimum by VALUE only (the gram hash is a polynomial
over up to ``k`` tokens -- ties are same-value and collapse in the
distinct set anyway), so the fingerprint is a pure function of the token
stream -- no RNG, engine-exact, reproduced verbatim by the DuckDB oracle
(which computes the windows the OPPOSITE way: per-position window
functions instead of array slices).

Scale audit: fingerprint extraction is MAP-ONLY -- grams, window minima,
distinct + sort all happen in one projection over arrays (zero shuffle,
zero Python; the gram array is projected in its OWN select so Catalyst's
CollapseProject multi-reference rule keeps it materialized per row
instead of re-deriving it per window).  ``winnow_pairs`` adds the
bucket-join: explode minimizers, self-equi-join, count shared -- hot
minimizers (corpus-wide boilerplate) are AQE's skew-join case exactly
like hot LSH bands; the ``min_shared`` threshold keeps the emitted pair
set to multiply-corroborated candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import char_fold_hash

WINNOW_K = 3  # tokens per gram
WINNOW_W = 4  # grams per window; guarantee threshold = w + k - 1 = 6 tokens


def _let(value: F.Column, body) -> F.Column:
    """Let-binding via a single-element-array ``transform``: evaluates
    ``value`` ONCE per row and passes it to ``body`` as a bound lambda
    variable.  Without this, Catalyst's projection collapsing inlines a
    column expression into every reference site -- and a reference INSIDE
    a higher-order-function lambda then re-evaluates the whole expression
    PER ELEMENT (measured: 74 s for one 20k-token document, O(n^2);
    with the binding, 0.5 s, O(n * w))."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _winnowed_expr(g: F.Column, w: int) -> F.Column:
    """struct(n_grams, mins) of a positional gram-hash array: the sorted
    distinct window minima (the winnowing sketch).  Defined once so the
    direct (``_minimizer_sets``) and gram-table (``_minimizers_of``)
    paths cannot diverge."""
    ng = F.size(g)
    windowed = F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), ng - (w - 1)),
                lambda j: F.array_min(F.slice(g, j, w)),
            )
        )
    )
    mins = (
        F.when(ng >= w, windowed)
        .when(ng >= 1, F.array(F.array_min(g)))
        .otherwise(F.array().cast("array<bigint>"))
    )
    return F.struct(ng.cast("long").alias("n_grams"), mins.alias("mins"))


def _minimizers_of(
    gram_arrays: DataFrame, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_grams, mins) from a ``_gram_arrays`` table.  The gram
    column is let-bound so that when the input is an UNCACHED expression
    chain (the ``_minimizer_sets`` composition) projection collapsing
    still evaluates it once per row, not once per window reference."""
    res = _let(F.col("gs"), lambda g: _winnowed_expr(g, w))
    return gram_arrays.select("doc_id", res.alias("wn")).select(
        "doc_id",
        F.col("wn.n_grams").alias("n_grams"),
        F.col("wn.mins").alias("mins"),
    )


def _minimizer_sets(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_grams, mins ARRAY<LONG> sorted distinct minimizers).
    Docs shorter than ``k`` tokens have n_grams = 0 and an empty set;
    docs with 1..w-1 grams use the whole doc as one window.

    Both the token array and the gram array are let-bound: each is
    evaluated once per row no matter how many windows reference it.
    r7: the gram-hash + window-min chain is CPU-dense and fused into
    the scan stage -- run it at full parallelism (no-op on real
    multi-split scans)."""
    return _minimizers_of(_gram_arrays(documents, k), w)


def winnow_fingerprints(
    documents: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Per-document winnowing sketch summary: (doc_id, n_grams,
    n_minimizers, fp_md5) where fp_md5 digests the sorted distinct
    minimizer values (docs with no grams get NULL -- no content, no
    fingerprint)."""
    sets = _minimizer_sets(documents, k, w)
    fp = F.when(
        F.size("mins") > 0,
        F.md5(
            F.concat_ws(
                "-", F.transform(F.col("mins"), lambda x: x.cast("string"))
            ).cast("binary")
        ),
    )
    return sets.select(
        "doc_id",
        "n_grams",
        F.size("mins").cast("long").alias("n_minimizers"),
        fp.alias("fp_md5"),
    )


def winnow_pairs(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Shared-passage candidate pairs: documents sharing >= ``min_shared``
    minimizer values.  Any pair sharing a token run of length
    ``w + k - 1`` shares >= 1 minimizer (the winnowing guarantee); the
    threshold demands corroboration so one coincidental hash collision
    does not emit a pair.  Returns (doc_a, doc_b, n_shared).

    HOT-BUCKET GUARD (r10): a corpus-wide common passage (boilerplate
    that survived upstream cleanup, a viral quote) puts thousands of
    docs in one minimizer bucket and turns this self-join quadratic --
    the same failure mode as the MinHash/SimHash band joins, guarded the
    same way: each minimizer bucket is capped at ``bucket_cap`` rows in
    deterministic affine-hash order (``lsh.cap_band_buckets``,
    band-less form), replicated bit-exactly in the DuckDB oracles.
    RECALL TRADE (document, don't guess): a pair whose shared minimizers
    ALL sit in buckets hotter than the cap is not a candidate.  A bucket
    goes that hot only when 2048+ documents share a passage -- a
    template class, which the exact-dedup keeper path (md5 classes)
    handles before span analysis in the composed pipelines."""
    return _winnow_pairs_from(
        _minimizer_sets(documents, k, w), min_shared, bucket_cap
    )


def _winnow_pairs_from(
    msets: DataFrame, min_shared: int, bucket_cap: int | None
) -> DataFrame:
    """``winnow_pairs``' join body over a precomputed minimizer table --
    shared with ``_span_runs`` so its candidates can ride the cached
    gram-array seam instead of re-hashing the corpus."""
    from .lsh import DUP_BUCKET_CAP, cap_band_buckets

    if bucket_cap is None:
        bucket_cap = DUP_BUCKET_CAP
    m = msets.select("doc_id", F.explode("mins").alias("mz"))
    m = cap_band_buckets(m, bucket_cap, val_col="mz", band_col=None)
    a = m.select(F.col("mz"), F.col("doc_id").alias("doc_a"))
    b = m.select(F.col("mz"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "mz")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _gram_arrays(documents: DataFrame, k: int = WINNOW_K) -> DataFrame:
    """(doc_id, gs ARRAY<LONG>): every token-k-gram hash in positional
    order -- the single CPU-dense hashing pass that ``positional_grams``
    explodes and ``_minimizer_sets``' window minima fold over.  Factored
    out (r14, guide §2.3/§1.2) so a consumer that needs the grams more
    than once (``_span_runs``: both join sides AND the candidate
    minimizers) can hash once behind one ``track()`` seam instead of
    re-evaluating the per-character fold per reference."""

    def grams_of(toks: F.Column) -> F.Column:
        n = F.size(toks)

        def gram(i):
            parts = [F.element_at(toks, i + j) for j in range(k)]
            return char_fold_hash(F.concat_ws(" ", *parts))

        return F.when(
            n >= k, F.transform(F.sequence(F.lit(1), n - (k - 1)), gram)
        ).otherwise(F.array().cast("array<bigint>"))

    from ..plans.shape import scan_parallel

    arr = _let(F.split(F.col("text"), " "), grams_of)
    return scan_parallel(documents.select("doc_id", "text")).select(
        "doc_id", arr.alias("gs")
    )


def _explode_grams(gram_arrays: DataFrame) -> DataFrame:
    """(doc_id, pos, g) from a ``_gram_arrays`` table -- map-only."""
    return (
        gram_arrays.select("doc_id", F.posexplode("gs").alias("p0", "g"))
        .select("doc_id", (F.col("p0") + 1).cast("long").alias("pos"), "g")
    )


def positional_grams(
    documents: DataFrame, k: int = WINNOW_K
) -> DataFrame:
    """(doc_id, pos, g): every token-k-gram hash with its 1-based start
    position -- the positional complement of ``_minimizer_sets`` (which
    keeps only window minima).  Map-only: gram array + posexplode."""
    return _explode_grams(_gram_arrays(documents, k))


def shared_spans(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    min_tokens: int | None = None,
) -> DataFrame:
    """Span-granular shared-passage extraction (r6 verdict ask #7): the
    maximal shared token spans behind each ``winnow_pairs`` candidate --
    the exact-substring step of Lee et al.'s "Deduplicating Training Data
    Makes Language Models Better" that ``chunk_dedup`` approximates at
    chunk granularity, computed per corroborated pair instead of over
    a global suffix array.

    Algorithm (all DataFrame ops): candidate pairs from the winnowing
    sketch join (cheap, corroborated); for each pair, join doc_a's
    positional k-grams to doc_b's on the gram hash; a maximal shared
    span is exactly a maximal DIAGONAL run of matching grams (diag =
    pa - pb constant, pa consecutive), found with the gaps-and-islands
    idiom (pa - row_number over the diagonal); a run of ``r`` grams
    covers ``r + k - 1`` tokens.

    Scale shape: the gram join shuffles by gram hash (hot corpus-wide
    grams are AQE's skew case, like hot LSH bands); the island window
    partitions by (pair, diagonal) -- data-parallel, never global.  The
    winnowing guarantee makes the default ``min_tokens = w + k - 1``
    exhaustive: every shared span of that length shares >= 1 minimizer,
    so its pair IS a candidate (``min_shared`` > 1 trades that guarantee
    for corroboration, documented).

    Returns (doc_a, doc_b, start_a, start_b, n_tokens): 1-based token
    start positions in each document, maximal spans only.  ``min_tokens``
    defaults to the guarantee floor OF THE CALLER'S k AND w (r7 review:
    a fixed module-constant default silently under-filtered for
    non-default parameters)."""
    if min_tokens is None:
        min_tokens = w + k - 1
    spans = (
        _span_runs(documents, k, w, min_shared)
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pa").cast("long").alias("start_a"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )
    return spans.select(
        "doc_a",
        "doc_b",
        "start_a",
        (F.col("start_a") - F.col("diag")).cast("long").alias("start_b"),
        "n_tokens",
    )


def _span_runs(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
) -> DataFrame:
    """The matched-gram diagonal runs behind ``shared_spans`` /
    ``duplicated_passages``: (doc_a, doc_b, diag, grp, pa, g) -- one row
    per matching gram occurrence, ``grp`` the gaps-and-islands id of its
    maximal run on the (pair, diagonal)."""
    # ONE gram-hashing pass behind a tracked seam (r14, guide §1.2/§2.3):
    # the former shape evaluated the per-character k-gram fold THREE
    # times per action -- once inside winnow_pairs' minimizer sets and
    # once per positional join side.  The per-doc gram ARRAY (compact:
    # one long per gram, about the text's own size) is persisted; the
    # candidate minimizers fold over it and both join sides explode it.
    # Values are bit-identical: same fold, same winnowing, same joins.
    from ..cache import track

    garr = track(_gram_arrays(documents, k))
    cand = _winnow_pairs_from(_minimizers_of(garr, w), min_shared, None).select(
        "doc_a", "doc_b"
    )
    grams = _explode_grams(garr)
    ga = grams.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "g"
    )
    gb = grams.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "g"
    )
    m = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "g"])
        .withColumn("diag", F.col("pa") - F.col("pb"))
    )
    run = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    return m.withColumn("grp", F.col("pa") - F.row_number().over(run))


def duplicated_passages(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    min_tokens: int | None = None,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-level duplicated-passage inventory: which passages repeat
    across HOW MANY documents -- the training-data-hygiene view on top of
    the pairwise spans (a passage shared by d docs appears as C(d, 2)
    pairwise spans; this rolls them up to one row with the distinct-doc
    count).  The passage identity is the md5 digest of its matched gram
    hashes in order (the ``winnow_fingerprints`` digest idiom), so the
    SAME text span digests identically wherever it appears, regardless of
    position or pairing.

    Returns (passage_digest, n_tokens, n_docs, example_doc): passages of
    >= ``min_tokens`` tokens (default: the guarantee floor w + k - 1 of
    the caller's parameters) appearing in >= ``min_docs`` distinct
    documents; ``example_doc`` = lowest doc_id containing it.  All
    aggregation is digest-keyed groupBy -- data-parallel, no global
    structure (a suffix-array pass would need one)."""
    if min_tokens is None:
        min_tokens = w + k - 1
    runs = _span_runs(documents, k, w, min_shared)
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    "-",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pa", "g"))),
                        lambda s: s["g"].cast("string"),
                    ),
                ).cast("binary")
            ).alias("passage_digest"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )
    docs = spans.select(
        "passage_digest", "n_tokens", F.col("doc_a").alias("doc")
    ).unionByName(
        spans.select("passage_digest", "n_tokens", F.col("doc_b").alias("doc"))
    )
    return (
        docs.groupBy("passage_digest", "n_tokens")
        .agg(
            F.countDistinct("doc").cast("long").alias("n_docs"),
            F.min("doc").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_shared_spans(
    documents: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = 2,
    min_tokens: int | None = None,
) -> DataFrame:
    """The removal step of exact-substring dedup (Lee et al.): every
    shared span is CUT from the higher-doc_id member of each pair (the
    lower id keeps its copy -- the ``dedup_clusters`` keeper convention),
    leaving one surviving occurrence per pairwise relation.

    Pipeline shape: ``shared_spans`` finds the cuts; per loser doc the
    cut intervals are MERGED (sort by start, previous-running-max end,
    gaps-and-islands -- overlapping spans from different partners union
    into one cut) in a window partitioned by doc -- data-parallel; the
    rebuild is a map-only token filter (``F.filter`` with index against
    the collected per-doc interval array, O(intervals) per token, both
    tiny).  Docs with no cuts pass through byte-identical.

    Returns (doc_id, n_tokens, n_removed, clean_md5): the repo's digest
    convention -- the cleaned text is value-checked via md5 without
    shipping it; callers wanting the text read ``clean_text`` before the
    final select by using ``_removed_text`` directly."""
    if min_tokens is None:
        min_tokens = w + k - 1
    spans = shared_spans(documents, k, w, min_shared, min_tokens)
    out = _removed_text(documents, spans)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_removed",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
    )


def _removed_text(documents: DataFrame, spans: DataFrame) -> DataFrame:
    """(doc_id, *extras, n_tokens, n_removed, clean_text): documents with
    the loser-side span intervals merged and cut.  Non-(doc_id, text)
    columns of ``documents`` pass through untouched (corpus_pipeline_v2
    carries n_lines/n_kept alongside the rebuilt text)."""
    cuts = spans.select(
        F.col("doc_b").alias("doc_id"),
        F.col("start_b").alias("s"),
        (F.col("start_b") + F.col("n_tokens") - 1).alias("e"),
    )
    wd = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = (
        cuts.withColumn(
            "_new", F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
        )
        .withColumn(
            "_grp",
            F.sum("_new").over(
                wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "_grp")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("ivs"))
    )
    # RAW split, no empty-token filter: span positions are 1-based indices
    # into the same tokenization shared_spans/positional_grams use
    toks = F.split(F.col("text"), " ")
    in_cut = lambda i: F.exists(  # noqa: E731  (1-based token position)
        F.col("ivs"), lambda iv: (i + 1 >= iv["s"]) & (i + 1 <= iv["e"])
    )
    kept = F.filter(toks, lambda t, i: ~in_cut(i))
    n_tok = F.size(toks).cast("long")
    extras = [c for c in documents.columns if c not in ("doc_id", "text")]
    return (
        documents.join(grouped, "doc_id", "left")
        .withColumn(
            "ivs",
            F.coalesce(
                F.col("ivs"),
                F.array().cast("array<struct<s:bigint,e:bigint>>"),
            ),
        )
        .select(
            "doc_id",
            *extras,
            n_tok.alias("n_tokens"),
            (n_tok - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )
