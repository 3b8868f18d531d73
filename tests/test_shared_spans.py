"""Span-granular substring dedup (r6 verdict ask #7): planted-passage
goldens for ``shared_spans`` -- exact start positions and lengths of the
maximal shared token spans, the winnowing-guarantee exhaustiveness floor,
and diagonal separation of repeated passages.  Oracle hash-parity at two
SFs runs in test_oracle_queries (q_shared_spans on LOCAL_ORACLE)."""

from __future__ import annotations

from streaminglens_spark.functions.winnow import shared_spans, winnow_pairs

# deterministic distinct filler vocabulary -- no accidental shared grams
W = [f"w{i:03d}" for i in range(100)]
PASSAGE = ["the", "quick", "brown", "fox", "jumps", "over", "a", "lazy", "dog", "today"]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_passage_exact_span(spark):
    # doc 1: 5 filler + passage(10) + 5 filler -> passage at tokens 6..15
    # doc 2: 8 filler + passage(10) + 3 filler -> passage at tokens 9..18
    a = " ".join(W[0:5] + PASSAGE + W[5:10])
    b = " ".join(W[20:28] + PASSAGE + W[28:31])
    c = " ".join(W[40:60])  # unrelated
    df = _docs(spark, [(1, a), (2, b), (3, c)])
    rows = shared_spans(df).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["start_a"] == 6
    assert r["start_b"] == 9
    assert r["n_tokens"] == 10  # the exact planted length: maximal, no more


def test_guarantee_floor_six_tokens(spark):
    # exactly w + k - 1 = 6 shared tokens: the winnowing guarantee says
    # the pair shares >= 1 minimizer, so with min_shared=1 the span is
    # found at exactly the detection floor
    shared6 = PASSAGE[:6]
    a = " ".join(W[0:4] + shared6 + W[4:8])
    b = " ".join(W[30:36] + shared6 + W[36:40])
    df = _docs(spark, [(1, a), (2, b)])
    rows = shared_spans(df, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_tokens"] == 6
    assert r["start_a"] == 5
    assert r["start_b"] == 7


def test_below_floor_emits_nothing(spark):
    # 5 shared tokens < the floor: no span even at min_shared=1 with the
    # default min_tokens (they may share grams, but no qualifying run)
    shared5 = PASSAGE[:5]
    a = " ".join(W[0:6] + shared5 + W[6:12])
    b = " ".join(W[30:36] + shared5 + W[36:42])
    df = _docs(spark, [(1, a), (2, b)])
    assert shared_spans(df, min_shared=1).count() == 0


def test_repeated_passage_separate_diagonals(spark):
    # doc 2 contains the passage TWICE: two maximal spans, one per
    # occurrence (distinct diagonals), same start_a
    a = " ".join(W[0:3] + PASSAGE + W[3:6])
    b = " ".join(W[20:24] + PASSAGE + W[24:27] + PASSAGE + W[27:30])
    df = _docs(spark, [(1, a), (2, b)])
    rows = sorted(shared_spans(df).collect(), key=lambda r: r["start_b"])
    assert len(rows) == 2, rows
    assert [r["start_a"] for r in rows] == [4, 4]
    assert rows[0]["start_b"] == 5
    assert rows[1]["start_b"] == 5 + 10 + 3  # after passage + 3 filler
    assert all(r["n_tokens"] == 10 for r in rows)


def test_unrelated_docs_no_pairs_no_spans(spark):
    df = _docs(spark, [(1, " ".join(W[0:20])), (2, " ".join(W[40:60]))])
    assert winnow_pairs(df, min_shared=1).count() == 0
    assert shared_spans(df, min_shared=1).count() == 0


def test_duplicated_passages_rollup(spark):
    """The same planted passage in THREE docs rolls up to ONE inventory
    row with n_docs = 3 (pairwise spans would show C(3,2) = 3 rows), and
    the digest is position-independent."""
    from streaminglens_spark.functions.winnow import duplicated_passages

    a = " ".join(W[0:5] + PASSAGE + W[5:10])
    b = " ".join(W[20:28] + PASSAGE + W[28:31])
    c = " ".join(W[40:42] + PASSAGE + W[42:50])
    d = " ".join(W[60:80])  # unrelated
    df = _docs(spark, [(1, a), (2, b), (3, c), (4, d)])
    rows = duplicated_passages(df).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["n_docs"] == 3
    assert r["n_tokens"] == 10
    assert r["example_doc"] == 1


def test_duplicated_passages_distinct_passages_distinct_rows(spark):
    """Two DIFFERENT repeated passages get two inventory rows with
    different digests."""
    from streaminglens_spark.functions.winnow import duplicated_passages

    p2 = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    df = _docs(
        spark,
        [
            (1, " ".join(W[0:4] + PASSAGE + W[4:8])),
            (2, " ".join(W[20:24] + PASSAGE + W[24:28])),
            (3, " ".join(W[40:44] + p2 + W[44:48])),
            (4, " ".join(W[60:64] + p2 + W[64:68])),
        ],
    )
    # min_shared=1: the 7-token passage sits at the winnowing guarantee
    # floor and may contribute only ONE shared minimizer
    rows = duplicated_passages(df, min_shared=1).collect()
    assert len(rows) == 2, rows
    assert len({r["passage_digest"] for r in rows}) == 2
    assert sorted(r["n_tokens"] for r in rows) == [7, 10]


def test_remove_shared_spans_cuts_loser_only(spark):
    """The planted passage vanishes from the HIGHER doc_id (the loser);
    the keeper and unrelated docs pass through byte-identical."""
    from streaminglens_spark.functions.winnow import _removed_text, shared_spans

    a_toks = W[0:5] + PASSAGE + W[5:10]
    b_toks = W[20:28] + PASSAGE + W[28:31]
    c_toks = W[40:60]
    df = _docs(
        spark,
        [(1, " ".join(a_toks)), (2, " ".join(b_toks)), (3, " ".join(c_toks))],
    )
    spans = shared_spans(df)
    out = {r["doc_id"]: r for r in _removed_text(df, spans).collect()}
    # keeper (doc 1) untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["clean_text"] == " ".join(a_toks)
    # loser (doc 2): exactly the 10 passage tokens removed, rest intact
    assert out[2]["n_removed"] == 10
    assert out[2]["clean_text"] == " ".join(W[20:28] + W[28:31])
    # unrelated doc byte-identical
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == " ".join(c_toks)


def test_remove_shared_spans_merges_overlapping_cuts(spark):
    """A loser sharing OVERLAPPING passages with two keepers gets one
    merged cut, not double-removal."""
    from streaminglens_spark.functions.winnow import _removed_text, shared_spans

    # doc 3 contains a 14-token run; doc 1 shares its first 10 tokens,
    # doc 2 shares its last 10 (overlap of 6 in the middle of doc 3)
    run = PASSAGE + ["extra1", "extra2", "extra3", "extra4"]
    df = _docs(
        spark,
        [
            (1, " ".join(W[0:4] + run[:10] + W[4:8])),
            (2, " ".join(W[20:24] + run[4:] + W[24:28])),
            (3, " ".join(W[40:43] + run + W[43:46])),
        ],
    )
    spans = shared_spans(df, min_shared=1)
    out = {r["doc_id"]: r for r in _removed_text(df, spans).collect()}
    # the two cuts in doc 3 (positions 4..13 and 8..17) merge to 4..17
    assert out[3]["n_removed"] == 14
    assert out[3]["clean_text"] == " ".join(W[40:43] + W[43:46])


def test_winnow_hot_minimizer_bucket_capped(spark):
    """r10 hot-bucket guard on the minimizer join: n identical docs put
    every doc in every minimizer bucket; with a binding cap the pair
    output is C(cap, 2) over the affine-hash-lowest doc ids (not
    C(n, 2)), each pair corroborated by the full minimizer set."""
    from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P
    from streaminglens_spark.functions.winnow import (
        winnow_fingerprints,
        winnow_pairs,
    )

    n, cap = 40, 5
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    pairs = winnow_pairs(docs, bucket_cap=cap).collect()
    assert len(pairs) == cap * (cap - 1) // 2
    kept = sorted(range(n), key=lambda d: ((HASH_A * d + HASH_B) % HASH_P, d))[:cap]
    got_ids = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert got_ids == set(kept)
    n_mins = winnow_fingerprints(docs).collect()[0]["n_minimizers"]
    assert all(r["n_shared"] == n_mins for r in pairs)


def test_winnow_default_cap_noop_on_fixture(spark):
    """The default 2048 cap must not change the fixture pair set: no
    sf0.001 minimizer bucket is hot."""
    from streaminglens_spark.functions.winnow import winnow_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "doc_id < 200"
    )
    capped = {(r["doc_a"], r["doc_b"], r["n_shared"])
              for r in winnow_pairs(docs).collect()}
    uncapped = {(r["doc_a"], r["doc_b"], r["n_shared"])
                for r in winnow_pairs(docs, bucket_cap=10**9).collect()}
    assert capped == uncapped
