"""Round-4 extensions: deterministic sampling, TF-IDF top-k, dedup
cluster formation (connected components).  Oracle hash-matches run in
test_oracle_queries (LOCAL_ORACLE surface); these are goldens, invariants
and plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.dedup import dedup_clusters
from streaminglens_spark.functions.sampling import hash_sample, stratified_sample
from streaminglens_spark.functions.text import tf_idf_topk
from streaminglens_spark.plans.audit import exchange_count, formatted_plan
from tests.conftest import SF_DIR


def test_hash_sample_deterministic_and_map_only(spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(2000)], "k long, v long")
    a = sorted(r["k"] for r in hash_sample(df, "k", 0.2).collect())
    b = sorted(
        r["k"]
        for r in hash_sample(df.repartition(7), "k", 0.2).collect()
    )
    assert a == b  # partitioning-independent: the sample is a key function
    assert 0.1 < len(a) / 2000 < 0.3  # Bernoulli-ish at the asked fraction
    # subset property: a smaller fraction is a strict subset (hash nesting)
    c = {r["k"] for r in hash_sample(df, "k", 0.1).collect()}
    assert c <= set(a)
    # map-only: no exchange in the plan
    assert exchange_count(hash_sample(df, "k", 0.2)) == 0


def test_hash_sample_rejects_bad_fraction(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)


def test_stratified_sample_fixed_size_per_stratum(spark):
    rows = [(s, i) for s in ("a", "b") for i in range(100)] + [("tiny", 0)]
    df = spark.createDataFrame(rows, "stratum string, k long")
    out = stratified_sample(df, "stratum", "k", 5).collect()
    by = {}
    for r in out:
        by.setdefault(r["stratum"], []).append(r["k"])
    assert len(by["a"]) == 5 and len(by["b"]) == 5
    assert by["tiny"] == [0]  # smaller stratum: the whole stratum
    # determinism across partitionings
    out2 = stratified_sample(df.repartition(13), "stratum", "k", 5).collect()
    assert sorted((r["stratum"], r["k"]) for r in out) == sorted(
        (r["stratum"], r["k"]) for r in out2
    )


def test_tfidf_topk_golden(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (2, "cherry date date date"),
        ],
        "doc_id long, text string",
    )
    rows = tf_idf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"], r["score"]))
    # doc 0: apple tf=2 df=1 -> 2*3/1=6; banana tf=1 df=2 -> 1.5
    assert by_doc[0] == [("apple", 2, 1, 6.0), ("banana", 1, 2, 1.5)]
    # doc 2: date tf=3 df=1 -> 9; cherry tf=1 df=2 -> 1.5
    assert by_doc[2] == [("date", 3, 1, 9.0), ("cherry", 1, 2, 1.5)]
    # doc 1: banana and cherry both 1*3/2 -> tie broken lexicographically
    assert [t for t, *_ in by_doc[1]] == ["banana", "cherry"]


def test_dedup_clusters_transitive_golden(spark):
    # chain 1-2-3 (transitive cluster), island 7-8, pair 5-6
    pairs = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 0.9), (5, 6, 1.0), (7, 8, 0.95)],
        "doc_a long, doc_b long, jaccard double",
    )
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(pairs).collect()}
    assert rows == {
        1: (1, 3), 2: (1, 3), 3: (1, 3),
        5: (5, 2), 6: (5, 2), 7: (7, 2), 8: (7, 2),
    }
    # pairwise-only dedup would have kept nothing of {2, 3}; clustering
    # keeps exactly one doc per component: the canonical keeper
    keepers = {d for d, (c, _) in rows.items() if d == c}
    assert keepers == {1, 5, 7}


def test_dedup_clusters_long_chain_converges(spark):
    # a 12-node path needs ~diameter rounds; max_iters must cover it
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(12)], "doc_a long, doc_b long, jaccard double"
    )
    rows = dedup_clusters(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert all(r["cluster_size"] == 13 for r in rows)


def test_dedup_clusters_on_fixture_corpus(spark):
    """Clusters over the real minhash pairs must equal an independent
    Python union-find of the same pair set (the corpus has genuine
    cross-document near-dups beyond each doc's constructed +100000 copy,
    so clusters of size > 2 are expected and must be transitively
    correct)."""
    from streaminglens_spark.functions.dedup import DUP_SHIFT, minhash_lsh_pairs
    from streaminglens_spark.sources.loaders import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(docs)
    pair_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want: dict[int, int] = {n: find(n) for n in parent}
    sizes: dict[int, int] = {}
    for root in want.values():
        sizes[root] = sizes.get(root, 0) + 1

    out = dedup_clusters(pairs).collect()
    assert out
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in out}
    assert got == {n: (want[n], sizes[want[n]]) for n in want}
    # every doc's constructed +100000 copy shares its cluster
    for n in want:
        if n < DUP_SHIFT:
            assert want[n] == want[n + DUP_SHIFT]


def test_dedup_clusters_plan_no_global_sort(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 1.0)], "doc_a long, doc_b long, jaccard double"
    )
    plan = formatted_plan(dedup_clusters(pairs))
    assert "Window" not in plan, plan


def test_stratified_sample_two_level_bit_equal(spark):
    """r8: the two-level rank keeps the identical set as a one-window
    reference at any bucket count (n_buckets=1 IS the one-window form)."""
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(400)], "k long, stratum string"
    )
    ref = sorted(tuple(r) for r in
                 stratified_sample(df, "stratum", "k", 7, n_buckets=1).collect())
    for nb in (3, 64):
        got = sorted(tuple(r) for r in
                     stratified_sample(df, "stratum", "k", 7,
                                       n_buckets=nb).collect())
        assert got == ref, f"n_buckets={nb} diverged"


def test_pack_sequences_two_level_bit_equal(spark):
    """r8: the bucketed offset computation is bit-identical to the
    one-window form at any bucket width (width > id range IS one bucket
    per shard, the one-window degenerate)."""
    from streaminglens_spark.functions.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + (i * 3) % 9))) for i in range(300)],
        "doc_id long, text string",
    )
    ref = sorted(tuple(r) for r in
                 pack_sequences(docs, bucket_width=10**9).collect())
    for bw in (1, 7, 64):
        got = sorted(tuple(r) for r in
                     pack_sequences(docs, bucket_width=bw).collect())
        assert got == ref, f"bucket_width={bw} diverged"


def test_temperature_mixture_plan_properties(spark):
    """Temperature mixture (r11 form): micro weights sum to EXACTLY 1e6
    (last stratum absorbs the rounding residual -- r10 ADVICE), so
    sum(target_tokens) <= total holds unconditionally; every stratum
    gets a positive target, the n^0.5 temperature up-weights low-resource
    strata (weight/n ratio strictly higher for smaller strata), and
    targets are exactly (total * weight_micro) div 1e6."""
    from streaminglens_spark.functions.sampling import temperature_mixture_plan

    docs = spark.createDataFrame(
        [(i, "w " * (200 if i < 20 else 10) + "end",
          "big" if i < 20 else "small")
         for i in range(40)],
        "doc_id long, text string, source string",
    )
    total = 1_000_000
    rows = {r["stratum"]: r for r in
            temperature_mixture_plan(docs, total).collect()}
    assert set(rows) == {"big", "small"}
    wsum = sum(r["weight_micro"] for r in rows.values())
    assert wsum == 1_000_000  # residual-last makes the sum exact
    assert sum(r["target_tokens"] for r in rows.values()) <= total
    for r in rows.values():
        assert r["target_tokens"] == total * r["weight_micro"] // 1_000_000
        assert r["target_tokens"] > 0
    big, small = rows["big"], rows["small"]
    assert big["n_tokens"] > small["n_tokens"]
    # temperature flattens: small stratum's weight share exceeds its
    # token share
    assert (small["weight_micro"] / 1e6) > (
        small["n_tokens"] / (big["n_tokens"] + small["n_tokens"])
    )


def test_epoch_shuffle_distinct_valid_permutations(spark):
    """r10 epoch shuffle: each epoch is a dense 0..n-1 permutation,
    epoch 0 equals the pre-r10 corpus_shuffle order, and different
    epochs genuinely re-interleave (not a rotation: relative order of
    many pairs flips)."""
    from streaminglens_spark.functions.sampling import corpus_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    def order(epoch):
        rows = corpus_shuffle(docs, epoch=epoch).collect()
        pos = {r["doc_id"]: r["shuffle_pos"] for r in rows}
        assert sorted(pos.values()) == list(range(200))  # dense permutation
        return pos

    p0, p0b, p1, p2 = order(0), order(0), order(1), order(2)
    assert p0 == p0b  # reproducible
    assert p0 != p1 != p2 and p0 != p2
    # not a rotation of each other: the pairwise-order flip count is large
    ids = list(range(200))
    flips01 = sum(
        1 for a in ids for b in ids if a < b and (p0[a] < p0[b]) != (p1[a] < p1[b])
    )
    assert flips01 > 200  # a pure rotation flips only pairs spanning the cut
