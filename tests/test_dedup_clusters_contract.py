"""Large-star/small-star cluster contraction (r5, r4 verdict #4): the
O(log diameter) connected-components path for adversarially deep duplicate
chains.  Pins (a) agreement with min-label ``dedup_clusters`` on every
fixture, (b) O(log d) convergence on a path graph where min-label alone
needs >= diameter rounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streaminglens_spark.functions.dedup import (
    _star_contract,
    dedup_clusters,
    dedup_clusters_contract,
)

DIAMETER = 60  # path graph 0-1-2-...-60: min-label needs >= 60 rounds


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )


def _clusters(df):
    return {
        (r["doc_id"], r["cluster_id"], r["cluster_size"]) for r in df.collect()
    }


def test_contract_agrees_with_minlabel_on_path_graph(spark):
    chain = _pairs(spark, [(i, i + 1) for i in range(DIAMETER)])
    got = _clusters(dedup_clusters_contract(chain))
    want = {(i, 0, DIAMETER + 1) for i in range(DIAMETER + 1)}
    assert got == want
    # min-label needs enough rounds for the full diameter; give it exactly
    # that and require identical output
    assert _clusters(dedup_clusters(chain, max_iters=DIAMETER + 1)) == want


def test_contract_converges_in_log_rounds_on_chain(spark):
    edges = _pairs(spark, [(i, i + 1) for i in range(DIAMETER)]).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    )
    labels, rounds = _star_contract(edges, max_iters=DIAMETER)
    # O(log d): generous 2*log2(d)+4 bound, still far below the diameter
    bound = 2 * math.ceil(math.log2(DIAMETER)) + 4
    assert rounds <= bound, (rounds, bound)
    got = {(r["u"], r["label"]) for r in labels.collect()}
    assert all(lbl == 0 for _, lbl in got)


def test_contract_agrees_on_mixed_components(spark):
    # several components of different shapes: a chain, a star, a triangle
    # with a tail, and a 2-node component
    edges = (
        [(i, i + 1) for i in range(10)]                     # chain 0..10
        + [(100, x) for x in (101, 102, 103, 104)]          # star at 100
        + [(200, 201), (201, 202), (200, 202), (202, 203)]  # triangle+tail
        + [(300, 301)]
    )
    pairs = _pairs(spark, edges)
    assert _clusters(dedup_clusters_contract(pairs)) == _clusters(
        dedup_clusters(pairs)
    )


def test_contract_agrees_on_minhash_fixture(spark):
    from streaminglens_spark import cache
    from streaminglens_spark.functions.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_lsh_pairs(docs).persist()
    try:
        assert _clusters(dedup_clusters_contract(pairs)) == _clusters(
            dedup_clusters(pairs)
        )
    finally:
        pairs.unpersist()
        cache.release_caches()


def test_softdedup_weights_golden(spark):
    """Soft dedup: cluster members share 1e6 // size ppm each; docs in no
    pair are singletons at full weight; every input doc appears exactly
    once."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.dedup import (
        dedup_clusters,
        softdedup_weights,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # clusters: {1,2,3} and {5,6}; 4 and 7 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {
        r["doc_id"]: r
        for r in softdedup_weights(docs, dedup_clusters(pairs)).collect()
    }
    assert set(out) == set(range(1, 8))
    for d in (1, 2, 3):
        assert out[d]["cluster_id"] == 1
        assert out[d]["cluster_size"] == 3
        assert out[d]["weight_ppm"] == 333333  # 1e6 // 3
    for d in (5, 6):
        assert out[d]["cluster_id"] == 5
        assert out[d]["weight_ppm"] == 500000
    for d in (4, 7):
        assert out[d]["cluster_id"] == d
        assert out[d]["cluster_size"] == 1
        assert out[d]["weight_ppm"] == 1_000_000


def test_softdedup_weight_floor_never_zero(spark):
    """A cluster with more than 1e6 members must keep weight 1 ppm, not
    integer-divide to 0 (which would silently drop the whole cluster)."""
    from streaminglens_spark.functions.dedup import softdedup_weights

    docs = spark.createDataFrame([(1, "t"), (2, "t")], "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, 1, 3_000_000), (2, 1, 3_000_000)],
        "doc_id long, cluster_id long, cluster_size long",
    )
    out = softdedup_weights(docs, clusters).collect()
    assert all(r["weight_ppm"] == 1 for r in out)


def test_hybrid_auto_switch_beats_pure_minlabel_rounds(spark):
    """r11 verdict ask #5: on an adversarially deep chain the default
    dedup_clusters auto-switches to contraction after switch_after
    non-converged propagation rounds -- total rounds far below the
    diameter pure min-label pays -- with labels BIT-EQUAL to both pure
    propagation and pure contraction."""
    chain = _pairs(spark, [(i, i + 1) for i in range(DIAMETER)])
    want = {(i, 0, DIAMETER + 1) for i in range(DIAMETER + 1)}

    stats = {}
    got = _clusters(dedup_clusters(chain, max_iters=DIAMETER + 1,
                                   stats=stats))
    assert got == want
    assert stats["label_rounds"] == 4  # switched, did not run the chain out
    assert stats["star_rounds"] >= 1
    bound = 4 + 2 * math.ceil(math.log2(DIAMETER)) + 4
    assert stats["label_rounds"] + stats["star_rounds"] <= bound

    # pure propagation (switch disabled) pays the full diameter...
    pure_stats = {}
    pure = _clusters(dedup_clusters(chain, max_iters=DIAMETER + 1,
                                    switch_after=0, stats=pure_stats))
    assert pure == want == got  # ...and the hybrid is bit-equal
    assert pure_stats["label_rounds"] >= DIAMETER
    assert (stats["label_rounds"] + stats["star_rounds"]
            < pure_stats["label_rounds"])


def test_hybrid_quotient_handoff_on_mixed_graph(spark):
    """The quotient handoff must be exact on a graph mixing converged
    components (which vanish from the quotient -- the coalesce fallback
    path), deep chains (which switch), and singleton-edge components:
    hybrid == pure propagation == pure contraction, element for element."""
    edges = (
        [(i, i + 1) for i in range(30)]                        # deep chain
        + [(100, 101), (100, 102), (100, 103)]                 # shallow star
        + [(200, 201)]                                          # pair
        + [(300, 301), (301, 302), (300, 302), (302, 303)]      # tri + tail
    )
    pairs = _pairs(spark, edges)
    hybrid = _clusters(dedup_clusters(pairs, max_iters=40))
    pure = _clusters(dedup_clusters(pairs, max_iters=40, switch_after=0))
    contract = _clusters(dedup_clusters_contract(pairs, max_iters=40))
    assert hybrid == pure == contract
