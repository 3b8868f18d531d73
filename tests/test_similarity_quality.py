"""Similarity-search quality (r3): deterministic k-means coarse quantizer
(bit-exact vs a sequential-fold Python reference), IVF full-probe
exactness with trained cells, and PINNED recall bounds for every ANN path
-- the speed/recall tradeoff as numbers, not prose."""

from __future__ import annotations

import math

from streaminglens_spark.functions.similarity import (
    ann_lsh_topk,
    ann_topk,
    cosine_topk,
    ivf_topk,
    kmeans_fit,
    recall_at_k,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_round_half_up(y: float) -> int:
    return int(math.floor(y + 0.5)) if y >= 0 else -int(math.floor(-y + 0.5))


def _py_kmeans(vecs: dict[int, list[float]], k: int, iters: int):
    """Reference implementation mirroring kmeans_fit EXACTLY: sequential
    left folds for dot/norm (F.aggregate order), HALF_UP quantization
    (F.round), ties to the lower cell."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    ids = sorted(vecs)
    cents = {c: list(vecs[ids[c]]) for c in range(k)}
    for _ in range(iters):
        assign: dict[int, list[int]] = {}
        for vid in ids:
            v, nv = vecs[vid], norm(vecs[vid])
            best, best_s = None, None
            for c in sorted(cents):
                s = dot(v, cents[c]) / (nv * norm(cents[c]))
                if best_s is None or s > best_s:
                    best, best_s = c, s
            assign.setdefault(best, []).append(vid)
        cents = {}
        for c, members in assign.items():
            dims = len(vecs[members[0]])
            cv = []
            for d in range(dims):
                q = sum(_py_round_half_up(vecs[m][d] * 1_000_000) for m in members)
                cv.append(q / 1_000_000.0 / len(members))
            cents[c] = cv
    return cents


def test_kmeans_fit_bit_exact_vs_reference(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    expected = _py_kmeans(vecs, k=8, iters=3)
    got = {
        int(r["cell"]): [float(x) for x in r["cv"]]
        for r in kmeans_fit(emb, k=8, iters=3).collect()
    }
    assert got == expected  # exact float equality: quantized means + folds


def test_kmeans_ivf_full_probe_equals_exact(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    km = kmeans_fit(emb, k=8, iters=3)
    n_cells = km.count()
    exact = {
        (r["query_vec_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk(emb, k=5).collect()
    }
    full = {
        (r["query_vec_id"], r["neighbor_id"], r["cosine"])
        for r in ivf_topk(emb, k=5, nprobe=n_cells, centroids=km).collect()
    }
    assert full == exact


def test_ann_recall_bounds(spark):
    """Pinned floors (measured with headroom at sf0.001+sf0.01): trained
    IVF cells beat label cells by ~3x at the same nprobe; multi-table LSH
    recall rises with tables; every path's re-ranked values are exact
    cosines (subset property checked via join semantics in recall_at_k)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact5 = cosine_topk(emb, k=5)
    km = kmeans_fit(emb, k=8, iters=3)
    r_kmeans = recall_at_k(ivf_topk(emb, k=5, nprobe=2, centroids=km), exact5)
    r_labels = recall_at_k(ivf_topk(emb, k=5, nprobe=2), exact5)
    assert r_kmeans >= 0.8, r_kmeans  # measured 0.92
    assert r_kmeans > r_labels  # data-driven cells beat arbitrary labels
    # LSH tables bound at sf0.01 (500-vec sf0.001 buckets are too sparse
    # for a meaningful floor: measured 0.12 -> 0.16 there)
    emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact01 = cosine_topk(emb01, k=5)
    r1 = recall_at_k(ann_lsh_topk(emb01, k=5, n_tables=1), exact01)
    r8 = recall_at_k(ann_lsh_topk(emb01, k=5, n_tables=8), exact01)
    assert r8 >= r1  # more tables never lose recall
    assert r8 >= 0.3, (r1, r8)  # measured 0.44


def test_ann_topk_driver_recall_contract(spark):
    """r5 (r4 verdict #3): the DRIVER configuration of the default ANN
    surface -- ann_topk's own defaults, exactly what q_ann_topk runs --
    must keep recall@10 >= 0.8 vs the exact top-10 (measured 0.94 at
    sf0.01, 0.92 at sf0.001)."""
    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        exact10 = cosine_topk(emb, k=10)
        r = recall_at_k(ann_topk(emb), exact10)
        assert r >= 0.8, (sf, r)


def test_ann_lsh_multiprobe_recall_monotone(spark):
    """Multi-probe LSH (r5): probing Hamming-1/2 neighbor buckets never
    loses recall and measurably gains it on the fixture (0.08 -> 0.30 ->
    0.50 @10 at 1 table for mp 0/1/2 at sf0.01)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact10 = cosine_topk(emb, k=10)
    r0 = recall_at_k(ann_lsh_topk(emb, k=10, n_tables=1, multiprobe=0), exact10)
    r1 = recall_at_k(ann_lsh_topk(emb, k=10, n_tables=1, multiprobe=1), exact10)
    r2 = recall_at_k(ann_lsh_topk(emb, k=10, n_tables=1, multiprobe=2), exact10)
    assert r0 <= r1 <= r2, (r0, r1, r2)
    assert r2 >= 0.35, r2  # measured 0.50


def test_semantic_decontaminate_flags_planted_leak(spark):
    """A corpus vector identical to an eval vector (cosine 1.0) and a
    near-copy must flag; an orthogonal vector must not.  Ties go to the
    lowest eval id."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.similarity import semantic_decontaminate

    d = 8
    ev = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (d - 1)), (1, [0.0, 1.0] + [0.0] * (d - 2))],
        "vec_id long, embedding array<double>",
    )
    corpus = spark.createDataFrame(
        [
            (100, [1.0] + [0.0] * (d - 1)),        # exact copy of eval 0
            (101, [0.98, 0.02] + [0.0] * (d - 2)),  # near-copy of eval 0
            (102, [0.0] * (d - 1) + [1.0]),         # orthogonal to both
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semantic_decontaminate(corpus, ev, threshold=0.9).collect()}
    assert out[100]["contaminated"] is True
    assert out[100]["nearest_eval_id"] == 0
    assert out[100]["max_eval_cosine"] == 1.0
    assert out[101]["contaminated"] is True
    assert out[102]["contaminated"] is False
    assert out[102]["max_eval_cosine"] == 0.0
