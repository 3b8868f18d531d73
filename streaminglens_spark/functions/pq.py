"""Product quantization (round-5 extension): the vector-compression path
a 100 TB embedding corpus actually runs on.

Int8 scalar quantization (``similarity.py::quantize_embeddings``) buys 4x;
PQ buys 16x: each 64-float vector becomes M=8 four-bit codes (one byte
pair packed, 4 bytes total at these defaults) by quantizing each 8-dim
SUBVECTOR to its nearest codebook centroid.  Queries score compressed
vectors without decompressing them -- ADC (asymmetric distance
computation): per query, a small table of query-subvector-to-centroid
distances; a vector's approximate distance is the sum of M table lookups.

Spark shapes (all deterministic, all oracle-checkable):

- ``pq_fit``: ALL subspaces fit jointly in one Lloyd loop -- centroids
  keyed by (sub, cell), assignment is a broadcast join on ``sub``
  (m*k = 128 rows), re-estimation one ``groupBy(sub, cell, dim)`` over
  integer-quantized values.  Same bit-reproducibility contract as
  ``kmeans_fit`` (lowest-vec_id init per subspace, L2 ties to the lower
  cell, exact integer means).
- ``pq_encode``: one broadcast join + per-(vec, sub) argmin -> codes.
- ``pq_topk``: the ADC distance table is INTEGER micro-units
  (``round(d * 1e6)``), so the per-vector sum of M lookups is a sum of
  longs -- order-independent, hence partitioning-independent and
  bit-identical to the DuckDB oracle.  Join + map-side-combined groupBy;
  no global sort (top-k is TakeOrdered).
- ``pq_topk_rerank``: ADC shortlist (``shortlist`` candidates) -> exact
  cosine re-rank -- the standard IVFADC+re-rank recipe; recall floors are
  pinned in ``tests/test_pq.py``.

Reference note: the reference has no vector operators; PQ is public
knowledge (Jegou, Douze, Schmid, "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import _as_double, _dot, _norm

PQ_M = 8        # subspaces
PQ_K = 16       # centroids per subspace (4-bit codes)
PQ_SUB_DIM = 8  # 64 input dims / PQ_M
PQ_ITERS = 5


def _subvectors(embeddings: DataFrame, m: int, sub_dim: int) -> DataFrame:
    """(vec_id, sub, sv): the m sub_dim-wide slices of each embedding."""
    v = _as_double("embedding")
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(v, s * sub_dim + 1, sub_dim).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return embeddings.select("vec_id", F.explode(subs).alias("x")).select(
        "vec_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv")
    )


def _l2(a: F.Column, b: F.Column) -> F.Column:
    """Squared L2 as a sequential left fold (order-defined, bit-exact)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _fold_encode(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """THE argmin encode fold, defined once (r7 review: four in-lock-step
    copies): ``sv`` must carry ``sub`` and ``sv``; every sv column is
    preserved and (code, err) appended -- the strictly-less fold over the
    cell-ascending broadcast codebook array, tie to the FIRST (lowest)
    cell, identical float comparisons to a (d ASC, cell ASC) rank (pinned
    by ``tests/test_streaming_stateless_ops.py``).  A pure projection
    after the tiny per-sub broadcast join: map-only, streaming-legal."""
    cb_arr = codebooks.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("cell", "cv"))).alias("cells")
    )
    init = F.struct(
        F.lit(-1).cast("int").alias("bc"),
        F.lit(float("inf")).alias("bd"),
    )

    def step(acc: F.Column, c: F.Column) -> F.Column:
        d = _l2(F.col("sv"), c["cv"])
        better = d < acc["bd"]
        return F.struct(
            F.when(better, c["cell"]).otherwise(acc["bc"]).cast("int").alias("bc"),
            F.when(better, d).otherwise(acc["bd"]).alias("bd"),
        )

    best = F.aggregate(F.col("cells"), init, step)
    cols = list(sv.columns)
    return sv.join(F.broadcast(cb_arr), "sub").select(
        *cols, best["bc"].alias("code"), best["bd"].alias("err")
    )


def pq_fit(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    sub_dim: int = PQ_SUB_DIM,
    iters: int = PQ_ITERS,
) -> DataFrame:
    """Jointly fit all m per-subspace codebooks.  Per iteration: ONE
    broadcast join (m*k centroid rows) + ONE argmin window per (vec, sub)
    + ONE groupBy(sub, cell, dim) over integer-quantized values -- the
    subspaces ride the same shuffles instead of m sequential fits.
    Returns (sub, cell, cv ARRAY<DOUBLE>).  Empty cells drop out
    (standard Lloyd); codes therefore always reference a live centroid."""
    # r7: the per-iteration argmin fold is CPU-dense (k x sub_dim MACs per
    # (vec, sub) row) -- run it at full parallelism, not single-split scan
    # parallelism (no-op on a real multi-split scan)
    from ..plans.shape import scan_parallel

    sv = _subvectors(scan_parallel(embeddings), m, sub_dim)
    init_w = Window.partitionBy("sub").orderBy("vec_id")
    cents = (
        sv.withColumn("_rn", F.row_number().over(init_w))
        .filter(F.col("_rn") <= k)
        .select(
            "sub", (F.col("_rn") - 1).cast("int").alias("cell"), F.col("sv").alias("cv")
        )
    )
    # r6 plan fix (the kmeans_fit lesson): per-iteration argmin as the
    # shared encode fold over the cell-sorted broadcast codebook array
    # instead of a row_number window -- the window shuffled n*m*k scored
    # rows every iteration; the fold is a pure projection with identical
    # strict-< tie-to-lowest-cell semantics, so centroids are bit-identical
    # and the q_pq_* oracles are untouched.
    for _ in range(iters):
        assign = _fold_encode(sv, cents).select(
            "sub", F.col("code").alias("cell"), "sv"
        )
        dims = assign.select(
            "sub", "cell", F.posexplode("sv").alias("dim", "x")
        ).withColumn("q", F.round(F.col("x") * 1_000_000).cast("long"))
        cents = (
            dims.groupBy("sub", "cell", "dim")
            .agg((F.sum("q") / F.lit(1_000_000.0) / F.count(F.lit(1))).alias("c"))
            .groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("p"))
            .select("sub", "cell", F.transform("p", lambda s: s["c"]).alias("cv"))
        )
    return cents


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
) -> DataFrame:
    """(vec_id, sub, code): each subvector's nearest-centroid id -- the
    compressed representation (m * log2(k) bits per vector).

    The argmin is a sequential FOLD over the (broadcast) per-subspace
    centroid array -- a pure projection with no window and no groupBy, so
    encoding is map-only beyond the tiny join AND legal on streaming
    DataFrames (fit offline, encode on arrival -- pinned by
    ``tests/test_streaming_stateless_ops.py``).  Ties keep the first
    (lowest) cell of the cell-sorted array: identical semantics -- and
    identical float comparisons -- to a (d ASC, cell ASC) rank."""
    from ..plans.shape import scan_parallel

    # CPU-dense encode fold: full parallelism (no-op on streaming inputs
    # and on real multi-split scans)
    sv = _subvectors(scan_parallel(embeddings), m, sub_dim)
    return _fold_encode(sv, codebooks).select("vec_id", "sub", "code")


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 5,
    k_out: int = 10,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """ADC approximate top-k over the PQ-compressed corpus: per query a
    (sub, cell) -> integer-micro-unit distance table (m*k rows,
    broadcast); a vector's score is the SUM OF LONGS over its m codes --
    order-independent, so the result is partitioning-independent and
    bit-identical to the oracle.  Ascending distance, ties to the lower
    vec_id.  Returns (query_vec_id, neighbor_id, adc_dist)."""
    cb = codebooks if codebooks is not None else pq_fit(embeddings)
    from ..cache import track

    # the codebook feeds encode + the distance table: one tiny table,
    # persisted so the Lloyd chain runs once (m*k rows; released by the
    # caller via release_caches -- the ivf_topk convention)
    cb = track(cb)
    codes = pq_encode(embeddings, cb)
    qsv = _subvectors(
        embeddings.filter(F.col("vec_id") < n_queries), PQ_M, PQ_SUB_DIM
    ).select(F.col("vec_id").alias("query_vec_id"), "sub", F.col("sv").alias("qsv"))
    dtab = qsv.join(F.broadcast(cb), "sub").select(
        "query_vec_id",
        "sub",
        F.col("cell").alias("code"),
        F.round(_l2(F.col("qsv"), F.col("cv")) * 1_000_000)
        .cast("long")
        .alias("d_int"),
    )
    scored = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .groupBy("query_vec_id", "vec_id")
        .agg(F.sum("d_int").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_out)
        .select("query_vec_id", F.col("vec_id").alias("neighbor_id"), "adc_dist")
    )


PQ_SHORTLIST = 100  # ADC candidates per query before the exact re-rank


def pq_topk_rerank(
    embeddings: DataFrame,
    n_queries: int = 5,
    k_out: int = 10,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    """ADC shortlist -> exact cosine re-rank (the IVFADC+re-rank recipe):
    the compressed scan proposes ``shortlist`` candidates per query, the
    exact pass re-scores only those -- full-precision quality at
    compressed-scan cost.  Returns (query_vec_id, neighbor_id, cosine)."""
    short = pq_topk(embeddings, n_queries=n_queries, k_out=shortlist)
    emb = embeddings.select("vec_id", _as_double("embedding").alias("v")).withColumn(
        "nrm", _norm(F.col("v"))
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cand = (
        short.select("query_vec_id", F.col("neighbor_id").alias("vec_id"))
        .join(emb, "vec_id")
        .join(F.broadcast(q), "query_vec_id")
        .withColumn(
            "cos_exact", _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.col("cos_exact").desc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k_out)
        .select(
            "query_vec_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("cos_exact", 6).alias("cosine"),
        )
    )


# ----------------------------------------------------- incremental index

def pq_encode_with_error(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
) -> DataFrame:
    """``pq_encode`` plus the per-subvector quantization error (the
    winning centroid's squared L2 distance) -- the reconstruction-quality
    signal an incremental pipeline monitors.  Same map-only fold; the
    finalizer keeps both lanes of the accumulator.  Returns
    (vec_id, sub, code, err)."""
    from ..plans.shape import scan_parallel

    sv = _subvectors(scan_parallel(embeddings), m, sub_dim)
    return _fold_encode(sv, codebooks).select("vec_id", "sub", "code", "err")


def pq_error_stats(embeddings: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Per-subspace quantization-error baseline -- the O(m)-row artifact
    persisted next to the codebooks (the PQ analogue of
    ``ann_index_stats``).  Mean error is exact via integer quantization
    (``round(err*1e6)`` summed as BIGINT).  Returns
    (sub, n_vecs, mean_err)."""
    e = pq_encode_with_error(embeddings, codebooks).withColumn(
        "q", F.round(F.col("err") * 1_000_000).cast("long")
    )
    return e.groupBy("sub").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        (F.sum("q") / F.lit(1_000_000.0) / F.count(F.lit(1))).alias("mean_err"),
    )


def pq_increment(
    new_batch: DataFrame,
    codebooks: DataFrame,
    baseline: DataFrame,
    err_ratio: float = 1.5,
) -> DataFrame:
    """Incremental PQ-index maintenance (the ``ann_increment`` pattern on
    the product quantizer): encode a NEW batch against the EXISTING
    codebooks -- ``pq_encode`` is map-only and streaming-legal, so the
    corpus is never re-read -- and compare its per-subspace mean
    quantization error to the persisted baseline.  A subspace whose
    new-batch mean error exceeds ``err_ratio`` x its baseline is flagged:
    the codebook no longer reconstructs what the pipeline now ingests and
    ``pq_fit`` should be re-run.

    Unlike cosine-based cell drift, quantization error is an ABSOLUTE
    quality measure (squared L2 of the residual), so distribution shift
    is visible even when argmin assignment still picks some nearest
    centroid per subvector.  Subspaces receiving no new vectors keep
    n_new = 0, NULL new_err, and are never flagged.  Returns
    (sub, n_corpus, n_new, base_err, new_err, drift_flagged)."""
    inc = (
        pq_encode_with_error(new_batch, codebooks)
        .withColumn("q", F.round(F.col("err") * 1_000_000).cast("long"))
        .groupBy("sub")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_new"),
            (F.sum("q") / F.lit(1_000_000.0) / F.count(F.lit(1))).alias(
                "new_err_raw"
            ),
        )
    )
    return (
        baseline.join(inc, "sub", "left")
        .select(
            "sub",
            F.col("n_vecs").alias("n_corpus"),
            F.coalesce(F.col("n_new"), F.lit(0).cast("long")).alias("n_new"),
            F.round(F.col("mean_err"), 6).alias("base_err"),
            F.round(F.col("new_err_raw"), 6).alias("new_err"),
            F.coalesce(
                F.col("new_err_raw") > F.col("mean_err") * F.lit(err_ratio),
                F.lit(False),
            ).alias("drift_flagged"),
        )
    )


def pq_cell_stats(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
) -> DataFrame:
    """Per-codeword population: (sub, cell, n_vecs) -- the O(m*k)-row
    artifact an incremental pipeline persists AT INDEX BUILD TIME next to
    the codebooks (the PQ analogue of ``ann_index_stats``'s counts).  One
    encode pass over the corpus; never recomputed on the increment path."""
    codes = pq_encode(embeddings, codebooks, m, sub_dim)
    return codes.groupBy("sub", F.col("code").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )


def pq_vector_shard(
    new_batch: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    sub_dim: int = PQ_SUB_DIM,
) -> DataFrame:
    """Per-codeword ADDITIVE subvector mass of a new batch: (sub, cell,
    n_new, svsum ARRAY<BIGINT>) with svsum[d] = SUM(round(x_d * 1e6)) over
    the subvectors argmin-encoded to the codeword -- the sufficient
    statistic for a weighted codebook update (``pq_update``), exactly the
    ``ann_vector_shard`` recipe per subspace.  Integer sums are additive
    across batch splits (``merge_pq_shards``); one map-only encode fold
    over the new batch, corpus never read."""
    from ..plans.shape import scan_parallel

    sv = _subvectors(scan_parallel(new_batch), m, sub_dim)
    enc = _fold_encode(sv, codebooks).select(
        "sub", F.col("code").alias("cell"), "sv"
    )
    dims = enc.select(
        "sub", "cell", F.posexplode("sv").alias("dim", "x")
    ).withColumn("q", F.round(F.col("x") * 1_000_000).cast("long"))
    per_dim = dims.groupBy("sub", "cell", "dim").agg(
        F.sum("q").cast("long").alias("qs"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        per_dim.groupBy("sub", "cell")
        .agg(
            F.max("n").cast("long").alias("n_new"),
            F.array_sort(F.collect_list(F.struct("dim", "qs"))).alias("p"),
        )
        .select(
            "sub", "cell", "n_new", F.transform("p", lambda s: s["qs"]).alias("svsum")
        )
    )


def merge_pq_shards(shards: DataFrame) -> DataFrame:
    """Fold any number of ``pq_vector_shard`` outputs into one:
    element-wise BIGINT sums + count sums -- exact and associative."""
    sums = (
        shards.select("sub", "cell", F.posexplode("svsum").alias("dim", "qs"))
        .groupBy("sub", "cell", "dim")
        .agg(F.sum("qs").cast("long").alias("qs"))
        .groupBy("sub", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "qs"))).alias("p"))
        .select("sub", "cell", F.transform("p", lambda s: s["qs"]).alias("svsum"))
    )
    counts = shards.groupBy("sub", "cell").agg(
        F.sum("n_new").cast("long").alias("n_new")
    )
    return counts.join(sums, ["sub", "cell"]).select(
        "sub", "cell", "n_new", "svsum"
    )


def pq_update(
    codebooks: DataFrame,
    cell_stats: DataFrame,
    vector_shard: DataFrame,
    micro: bool = False,
) -> DataFrame:
    """Incremental codebook refit (the ``kmeans_update`` recipe per PQ
    subspace): when ``pq_increment`` flags a subspace, fold the new
    batch's codeword mass into its codebook via the weighted mean

        cv'[d] = (n_base * cv[d] + svsum[d] / 1e6) / (n_base + n_new)

    over O(m*k) rows -- the corpus is never rescanned.  Codewords with no
    new mass stay bit-identical (no float round-trip); codewords with no
    baseline population become the new mass's mean.  All arithmetic
    integer until the final division.  Returns (sub, cell, cv), the
    ``pq_fit`` shape -- drop-in for every codebook consumer."""
    base_n = cell_stats.select(
        "sub", "cell", F.col("n_vecs").cast("long").alias("n_base")
    )
    upd = (
        codebooks.select("sub", "cell", "cv")
        .join(base_n, ["sub", "cell"], "left")
        .join(vector_shard, ["sub", "cell"], "left")
        .withColumn("n_base", F.coalesce(F.col("n_base"), F.lit(0).cast("long")))
        .withColumn("n_new", F.coalesce(F.col("n_new"), F.lit(0).cast("long")))
    )
    zeros = F.transform(F.col("cv"), lambda _: F.lit(0).cast("long"))
    if micro:
        # the kmeans_update micro form per (sub, cell): BIGINT 1e-6 units
        # via pure-integer half-away-from-zero division -- engine-bit-
        # exact, the q_pq_refit oracle/serialization form
        rows = (
            upd.withColumn("vs", F.coalesce(F.col("svsum"), zeros))
            .select(
                "sub",
                "cell",
                "n_base",
                "n_new",
                F.posexplode(F.arrays_zip("cv", "vs")).alias("dim", "z"),
            )
            .withColumn(
                "N",
                F.col("n_base")
                * F.round(F.col("z.cv") * 1_000_000).cast("long")
                + F.col("z.vs"),
            )
            .withColumn("D", (F.col("n_base") + F.col("n_new")).cast("long"))
        )
        half_up = F.expr(
            "CASE WHEN N < 0 THEN -((2 * -N + D) div (2 * D)) "
            "ELSE (2 * N + D) div (2 * D) END"
        ).cast("long")
        rows = rows.withColumn(
            "m",
            F.when(F.col("n_new") > 0, half_up).otherwise(
                F.round(F.col("z.cv") * 1_000_000).cast("long")
            ),
        )
        return (
            rows.groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("p"))
            .select(
                "sub",
                "cell",
                F.transform("p", lambda s: s["m"]).alias("cv_micro"),
            )
        )
    merged = F.zip_with(
        F.col("cv"),
        F.coalesce(F.col("svsum"), zeros),
        lambda c, s: (
            F.col("n_base") * F.round(c * 1_000_000).cast("long") + s
        )
        / (F.lit(1_000_000.0) * (F.col("n_base") + F.col("n_new"))),
    )
    return upd.select(
        "sub",
        "cell",
        F.when(F.col("n_new") > 0, merged).otherwise(F.col("cv")).alias("cv"),
    )
