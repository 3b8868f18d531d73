"""Salted skew-join rewrite + Z-order layout (r5 continued).  Cross-engine
hash parity lives in test_oracle_queries.py (both on LOCAL_ORACLE); these
pin result-invariance, skew spread, the forced non-broadcast plan, the
Morton bit-permutation, and two-dimensional shard locality."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from streaminglens_spark.functions.joins import salted_join
from streaminglens_spark.functions.zorder import zvalue, zorder_stats
from streaminglens_spark.plans.audit import formatted_plan
from streaminglens_spark import registry
from tests.conftest import SF_DIR


# ------------------------------------------------------------ salted join

def _fixture(spark):
    # hot key 'a' (200 rows), duplicate keys on BOTH sides, a null key
    big_rows = [(i, "a" if i < 200 else ("b" if i % 2 else None), i * 10)
                for i in range(260)]
    big = spark.createDataFrame(big_rows, "rid long, k string, v long")
    small = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, w long"
    )
    return big, small


def test_salted_join_equals_plain_join(spark):
    """Row-for-row parity with the unsalted inner join -- duplicate keys
    on both sides included, null keys dropped by both."""
    big, small = _fixture(spark)
    plain = sorted(
        tuple(r) for r in big.join(small, "k").select("rid", "k", "v", "w").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(big, small, "k", n_salts=8, salt_src="rid")
        .select("rid", "k", "v", "w")
        .collect()
    )
    assert salted == plain and len(plain) == 200 * 2 + 30


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land on several (key, salt) shards -- the
    property that breaks the single-task bottleneck."""
    big, _ = _fixture(spark)
    salt = F.pmod(F.xxhash64(F.col("rid")), F.lit(8))
    n = (
        big.filter(F.col("k") == "a")
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n >= 6, f"hot key used only {n}/8 salts"


def test_salted_join_is_not_broadcast(spark):
    """A broadcast join has no shuffle and no skew -- the utility must
    keep the shuffle-hash path even for a tiny dim, or the fixture would
    silently bypass the rewrite under test."""
    plan = formatted_plan(registry.q_salted_join(spark, SF_DIR))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan


# ---------------------------------------------------------------- z-order

def test_zvalue_goldens(spark):
    cases = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3),
             (3, 5, 39), (65535, 65535, (1 << 32) - 1)]
    df = spark.createDataFrame([(x, y) for x, y, _ in cases], "x long, y long")
    got = [r[0] for r in df.select(zvalue(F.col("x"), F.col("y"))).collect()]
    assert got == [z for _, _, z in cases]


def test_zorder_shards_bound_both_dimensions(spark):
    """Every shard's bounding box must be a small fraction of the global
    range in BOTH dimensions (16 shards ~ a 4x4 grid -> ~1/4 per dim; a
    single-column sort leaves the other dimension at ~the global range)."""
    rows = registry.q_zorder(spark, SF_DIR).collect()
    assert len(rows) >= 8
    gx = max(r["max_x"] for r in rows) - min(r["min_x"] for r in rows)
    gy = max(r["max_y"] for r in rows) - min(r["min_y"] for r in rows)
    ax = statistics.mean(r["max_x"] - r["min_x"] for r in rows)
    ay = statistics.mean(r["max_y"] - r["min_y"] for r in rows)
    assert ax < 0.5 * gx, (ax, gx)
    assert ay < 0.5 * gy, (ay, gy)


def test_zorder_counts_cover_input(spark):
    rows = registry.q_zorder(spark, SF_DIR).collect()
    total = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_rows"] for r in rows) == total


def test_zorder_skewed_dim_still_spreads(spark):
    """Rank bucketing is what makes a narrow dimension (3 distinct
    values) still use the full bucket range instead of wasting its
    interleave bits."""
    rows = [(i, i % 3, i * 7 % 1000) for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, x long, y long")
    out = zorder_stats(df, "x", "y", n_shards=8).collect()
    assert len(out) >= 4, "skewed dim collapsed the curve to few shards"
