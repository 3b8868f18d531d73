"""Round-4b extensions: count-min frequency sketch, Bloom semi-join
pruning, int8 embedding quantization.  Oracle hash-matches run in
test_oracle_queries (LOCAL_ORACLE surface); these are the sketch/filter
PROPERTIES the oracles can't see (overestimate-only, no-false-negatives,
pruning effectiveness, quantized recall) plus plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaminglens_spark.functions.bloom import (
    BLOOM_M,
    bloom_member,
    bloom_semi_join,
    build_bloom,
)
from streaminglens_spark.functions.similarity import (
    cosine_topk,
    quantize_embeddings,
    quantized_topk,
)
from streaminglens_spark.functions.sketch import count_min_topk
from streaminglens_spark.plans.audit import exchange_count, formatted_plan
from streaminglens_spark.registry import load_table
from tests.conftest import SF_DIR


# ------------------------------------------------------------- count-min

def test_count_min_never_underestimates(spark):
    # w=8 forces collisions even on a small key set: estimates may only
    # grow (counters are additive; a colliding key adds, never subtracts)
    rows = [(k,) for k in range(40) for _ in range(k % 7 + 1)]
    df = spark.createDataFrame(rows, "user_id long")
    out = count_min_topk(df, k=40, w=8).collect()
    assert len(out) == 40
    assert all(r["cm_estimate"] >= r["n_exact"] for r in out)
    # with 40 keys in 8 columns per row, some collision must overestimate
    assert any(r["cm_estimate"] > r["n_exact"] for r in out)


def test_count_min_exact_when_sparse(spark):
    # default w=1024 with 15 distinct fixture users: collisions are
    # possible but the d=4 row-min kills any single-row collision; the
    # estimate equals the exact count for every key on the fixture
    ev = load_table(spark, SF_DIR, "events")
    out = count_min_topk(ev).collect()
    assert all(r["cm_estimate"] == r["n_exact"] for r in out)


def test_count_min_partitioning_independent(spark):
    rows = [(k,) for k in range(60) for _ in range(3)]
    df = spark.createDataFrame(rows, "user_id long")
    a = sorted(map(tuple, count_min_topk(df, k=60, w=16).collect()))
    b = sorted(map(tuple, count_min_topk(df.repartition(13), k=60, w=16).collect()))
    assert a == b  # additive counters: reduction order never matters


def test_count_min_topk_plan_uses_take_ordered(spark):
    ev = load_table(spark, SF_DIR, "events")
    plan = formatted_plan(count_min_topk(ev))
    assert "TakeOrderedAndProject" in plan  # limit+orderBy, not global sort


# ----------------------------------------------------------------- bloom

def test_bloom_no_false_negatives_even_tiny(spark):
    # m=64 bits for 30 keys: false-positive rate near 1, but every true
    # key must still pass (all its bits were set by itself)
    keys = spark.createDataFrame([(k * 7,) for k in range(30)], "k long")
    words = build_bloom(keys, "k", m=64)
    probe = spark.createDataFrame([(k * 7,) for k in range(30)], "k long")
    passed = probe.filter(bloom_member(F.col("k"), words, m=64)).count()
    assert passed == 30


def test_bloom_semi_join_exact_and_pruning(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING")
    got = sorted(
        r["o_orderkey"]
        for r in bloom_semi_join(orders, seg, "o_custkey", "c_custkey").collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in orders.join(
            seg.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_semi",
        ).collect()
    )
    assert got == want  # false positives killed, no false negatives
    # the prune itself must drop real volume before the join
    words = build_bloom(seg.select("c_custkey").distinct(), "c_custkey")
    pruned = orders.filter(bloom_member(F.col("o_custkey"), words)).count()
    total = orders.count()
    assert len(want) <= pruned < total


def test_bloom_prune_stage_is_map_only(spark):
    orders = load_table(spark, SF_DIR, "orders")
    customer = load_table(spark, SF_DIR, "customer")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING")
    words = build_bloom(seg.select("c_custkey").distinct(), "c_custkey")
    pruned = orders.filter(bloom_member(F.col("o_custkey"), words))
    plan = formatted_plan(pruned)
    assert exchange_count(pruned) == 0
    assert "Join" not in plan  # the filter is a literal expression, no join


def test_bloom_fp_rate_small_at_sized_m(spark):
    # 1500 keys in m=8192, k=3: theoretical fp ~ (1-e^{-3*1500/8192})^3
    # ~ 0.076; disjoint probes should pass at roughly that rate
    keys = spark.createDataFrame([(k,) for k in range(1500)], "k long")
    words = build_bloom(keys, "k")
    probe = spark.createDataFrame(
        [(k,) for k in range(1_000_000, 1_003_000)], "k long"
    )
    fp = probe.filter(bloom_member(F.col("k"), words)).count() / 3000
    assert fp < 0.15


# ------------------------------------------------------------- quantized

def test_quantize_bounds_and_dtype(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = quantize_embeddings(emb)
    assert dict(q.dtypes)["qv"] == "array<int>"
    mx = q.select(
        F.max(F.array_max("qv")).alias("hi"), F.min(F.array_min("qv")).alias("lo")
    ).first()
    assert -127 <= mx["lo"] and mx["hi"] <= 127


def test_quantized_topk_recall_vs_exact(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = cosine_topk(emb, n_queries=5, k=10).collect()
    quant = quantized_topk(emb, n_queries=5, k=10).collect()
    by_q_exact: dict[int, set] = {}
    by_q_quant: dict[int, set] = {}
    for r in exact:
        by_q_exact.setdefault(r["query_vec_id"], set()).add(r["neighbor_id"])
    for r in quant:
        by_q_quant.setdefault(r["query_vec_id"], set()).add(r["neighbor_id"])
    hits = sum(
        len(by_q_exact[q] & by_q_quant[q]) for q in by_q_exact
    )
    recall = hits / sum(len(v) for v in by_q_exact.values())
    assert recall >= 0.8  # int8 with exact integer ranking keeps order


def test_quantized_topk_schema_is_integer_only(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = quantized_topk(emb)
    assert dict(out.dtypes) == {
        "query_vec_id": "bigint",
        "neighbor_id": "bigint",
        "dot_q8": "bigint",
    }
