"""Token-budget sampling goldens (r7): the kept set is the smallest
hash-prefix per stratum reaching the budget -- boundary-crossing doc
kept, budget 1 keeps exactly one doc, absent strata dropped, oversized
budgets keep everything.  Oracle hash-parity at two SFs runs in
test_oracle_queries (q_token_budget on LOCAL_ORACLE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.sampling import token_budget_sample
from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def _hash_order(ids):
    return sorted(ids, key=lambda i: ((HASH_A * i + HASH_B) % HASH_P, i))


def test_budget_boundary_doc_is_kept(spark):
    # 4 docs of 10 tokens each in one stratum; budget 25 -> the doc that
    # CROSSES the boundary (cum 30) is kept, the next (cum 40) is not
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * 10), "a") for i in range(4)],
    )
    out = token_budget_sample(docs, "source", "doc_id", {"a": 25})
    rows = sorted(out.collect(), key=lambda r: r["cum_tokens"])
    assert [r["cum_tokens"] for r in rows] == [10, 20, 30]
    assert [r["doc_id"] for r in rows] == _hash_order(range(4))[:3]


def test_budget_one_keeps_exactly_first(spark):
    docs = _docs(spark, [(i, "x y z", "a") for i in range(5)])
    out = token_budget_sample(docs, "source", "doc_id", {"a": 1}).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == _hash_order(range(5))[0]


def test_absent_stratum_dropped_oversized_keeps_all(spark):
    docs = _docs(
        spark,
        [(1, "a b", "keepall"), (2, "c d", "keepall"), (3, "e f", "nobudget")],
    )
    out = token_budget_sample(
        docs, "source", "doc_id", {"keepall": 10_000}
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_kept_mass_within_one_doc_of_budget(spark):
    # invariant: cum_tokens - n_tokens < budget for every kept row, and
    # the NEXT doc in hash order would exceed it
    docs = _docs(
        spark,
        [(i, " ".join(["t"] * (3 + i % 5)), "s") for i in range(20)],
    )
    budget = 40
    out = token_budget_sample(docs, "source", "doc_id", {"s": budget})
    rows = out.collect()
    assert all(r["cum_tokens"] - r["n_tokens"] < budget for r in rows)
    kept_tokens = max(r["cum_tokens"] for r in rows)
    assert kept_tokens >= budget  # the boundary doc pushed it over


def test_kept_set_partition_invariant(spark):
    """The kept set is a pure function of the data (hash order + integer
    cumsums), independent of physical partitioning."""
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (2 + i % 7)), f"s{i % 3}") for i in range(60)],
        "doc_id long, text string, source string",
    )
    budgets = {"s0": 30, "s1": 17, "s2": 1}
    a = {r["doc_id"] for r in
         token_budget_sample(docs, "source", "doc_id", budgets).collect()}
    b = {r["doc_id"] for r in
         token_budget_sample(docs.repartition(13, "doc_id"), "source",
                             "doc_id", budgets).collect()}
    c = {r["doc_id"] for r in
         token_budget_sample(docs.coalesce(1), "source", "doc_id",
                             budgets).collect()}
    assert a == b == c


def test_two_level_bit_equal_to_windowed_reference(spark):
    """r7 verdict ask #2: the production two-level form (per-(stratum,
    hash-bucket) pre-aggregation + bucket-local row windows) must return
    the SAME rows -- kept set, n_tokens AND cum_tokens -- as the one-window
    reference form, at several bucket counts including the degenerate
    n_buckets=1 (which collapses to one bucket per stratum)."""
    from streaminglens_spark.functions.sampling import (
        token_budget_sample_windowed,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * (1 + (i * 7) % 11)), f"s{i % 4}")
            for i in range(300)
        ]
        + [(1000, "", "s0")],  # zero-token doc exercises the <-boundary
        "doc_id long, text string, source string",
    )
    budgets = {"s0": 120, "s1": 1, "s2": 10_000, "s3": 37}
    ref = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in token_budget_sample_windowed(
            docs, "source", "doc_id", budgets
        ).collect()
    )
    for nb in (1, 7, 1024):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in token_budget_sample(
                docs, "source", "doc_id", budgets, n_buckets=nb
            ).collect()
        )
        assert got == ref, f"n_buckets={nb} diverged from the window form"


def test_two_level_bit_equal_on_fixture(spark):
    """Same bit-equality on the real documents fixture (the q_token_budget
    configuration), so the driver-facing query is pinned to the reference
    semantics, not just synthetic rows."""
    from streaminglens_spark.functions.sampling import (
        token_budget_sample_windowed,
    )
    from streaminglens_spark.registry import TOKEN_BUDGETS, _docs as _fixture
    from tests.conftest import SF_DIR

    docs = _fixture(spark, SF_DIR)
    budgets = dict(TOKEN_BUDGETS)
    ref = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_sample_windowed(
            docs, "source", "doc_id", budgets
        ).collect()
    )
    got = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_sample(docs, "source", "doc_id", budgets).collect()
    )
    assert got == ref


# ---------------------------- quality-ordered budget (r8)


def test_quality_budget_two_level_bit_equal(spark):
    """Score-range-bucketed prefix sum == one-window reference, with
    negative scores, score ties (broken by hash), and a zero-token doc."""
    from streaminglens_spark.functions.sampling import (
        quality_budget_sample,
        quality_budget_sample_windowed,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * (1 + (i * 5) % 9)), f"s{i % 3}",
             ((i * 37) % 11) - 5)  # scores in [-5, 5] with many ties
            for i in range(300)
        ]
        + [(900, "", "s0", 3)],
        "doc_id long, text string, source string, score_milli long",
    )
    budgets = {"s0": 90, "s1": 1, "s2": 10_000}
    ref = sorted(
        (r["doc_id"], r["n_tokens"], r["cum_tokens"])
        for r in quality_budget_sample_windowed(
            docs, "source", "doc_id", budgets
        ).collect()
    )
    for bw in (1, 3, 4096):
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["cum_tokens"])
            for r in quality_budget_sample(
                docs, "source", "doc_id", budgets, bucket_width=bw
            ).collect()
        )
        assert got == ref, f"bucket_width={bw} diverged"


def test_quality_budget_takes_best_first(spark):
    """The kept set is the TOP-scoring prefix: with budget for ~2 docs,
    the two highest scores win regardless of hash order."""
    from streaminglens_spark.functions.sampling import quality_budget_sample

    docs = spark.createDataFrame(
        [
            (1, "a b c d e", "s", 10),
            (2, "a b c d e", "s", 50),
            (3, "a b c d e", "s", 30),
            (4, "a b c d e", "s", -7),
        ],
        "doc_id long, text string, source string, score_milli long",
    )
    out = quality_budget_sample(docs, "source", "doc_id", {"s": 8}).collect()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [2, 3]  # 5 tokens (doc 2) + boundary doc 3 crosses 8
    ranks = {r["doc_id"]: r["cum_tokens"] for r in out}
    assert ranks[2] == 5 and ranks[3] == 10
