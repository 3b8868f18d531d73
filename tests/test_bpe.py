"""BPE tokenizer training: hand-computed merge goldens, the greedy
non-overlap convention, early stop, and the encode side's budget
monotonicity.  Cross-engine parity (8 unrolled rounds) runs in
``test_oracle_queries`` (`q_bpe_merges`)."""

from __future__ import annotations

from streaminglens_spark.functions.bpe import bpe_segment, bpe_train


def _train(spark, texts, n_merges=8):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_train(df, n_merges=n_merges).collect()
    ]


def test_merge_goldens(spark):
    """Corpus {aaab: 2, aab: 1}: pair counts (a,a)=5, (a,b)=3 -> merge
    'aa'; then (aa,a)=2 ties (a,b)=2 and 'a' < 'aa' breaks to (a,b)."""
    got = _train(spark, ["aaab aaab aab"], n_merges=2)
    assert got[0] == (0, "a", "a", "aa", 5)
    assert got[1] == (1, "a", "b", "ab", 2)


def test_nonoverlap_convention(spark):
    """'aaaa' contributes 3 (a,a) pairs but merges to [aa, aa] (greedy
    left-to-right, no cascade within a round): the round-2 top pair is
    (aa, aa)."""
    got = _train(spark, ["aaaa aaaa"], n_merges=2)
    assert got[0][:4] == (0, "a", "a", "aa")
    assert got[1][:4] == (1, "aa", "aa", "aaaa")


def test_early_stop_when_no_repeated_pair(spark):
    assert _train(spark, ["ab cd"], n_merges=8) == []  # every pair count 1


def test_segment_budget_shrinks_with_merges(spark):
    df = spark.createDataFrame(
        [(0, "banana bandana"), (1, "banana")], "doc_id long, text string"
    )
    merges = [(r[1], r[2]) for r in _train(spark, ["banana bandana banana"])]
    assert merges  # training found merges
    none = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_segment(df, []).collect()}
    some = {r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_segment(df, merges[:2]).collect()}
    all_m = {r["doc_id"]: r["n_bpe_tokens"]
             for r in bpe_segment(df, merges).collect()}
    for d in none:
        assert none[d] >= some[d] >= all_m[d]
        assert all_m[d] >= 1
    # zero merges == character count of the words
    assert none[1] == len("banana")


def test_fixture_training_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [tuple(r) for r in bpe_train(docs).collect()]
    b = [tuple(r) for r in bpe_train(docs.repartition(7)).collect()]
    assert a == b and len(a) == 8
