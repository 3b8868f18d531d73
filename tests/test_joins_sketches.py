"""Temporal joins (as-of, bucketed range), sketches (KMV, HLL) and the time
rollup: hand-computed goldens, determinism/quality properties, and the plan
shapes that make them scale (single-shuffle merge, equi-join candidates,
one-pass grouping sets).  Oracle hash-matches run in test_oracle_queries
(LOCAL_ORACLE surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.functions.joins import asof_join, interval_join
from streaminglens_spark.plans.audit import exchange_count, formatted_plan
from tests.conftest import SF_DIR


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 50), (3, 10, 20), (4, 99, 100)],
        "event_id long, user_id long, ms long",
    )
    right = spark.createDataFrame(
        # user 10: orders at ms 20, 50 (two: keys 7 and 8), 120 (after)
        [(10, 20, 7, 700), (10, 50, 8, 800), (10, 50, 6, 600), (10, 120, 9, 900)],
        "user_id long, ms long, ok long, cents long",
    )
    return left, right


def test_asof_join_golden(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, key="user_id", payload=["ok", "cents"], tie="ok")
    rows = {
        r["event_id"]: (r["_asof"]["ok"] if r["_asof"] else None)
        for r in out.collect()
    }
    # event 1 (ms=100): latest order at ms<=100 is ms=50; tie (ok 6 vs 8) -> 8
    # event 2 (ms=50): same-instant order counts ("at or before") -> 8
    # event 3 (ms=20): equal-ms order visible -> 7
    # event 4 (user 99): no orders -> NULL payload (left-outer)
    assert rows == {1: 8, 2: 8, 3: 7, 4: None}


def test_asof_join_is_single_shuffle_no_join(spark):
    """The union-merge plan must contain no join operator at all and
    exactly one exchange (the partition-by-key sort window)."""
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, key="user_id", payload=["ok", "cents"], tie="ok")
    plan = formatted_plan(out)
    assert "Join" not in plan, plan
    assert exchange_count(out) == 1, plan


def test_interval_join_golden(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 35)], "pid long, ms long"
    )
    intervals = spark.createDataFrame(
        # [10, 20) spans buckets 1; [5, 36) spans buckets 0-3; [30, 30) empty
        [(100, 10, 20), (200, 5, 36), (300, 30, 30)],
        "iv long, start_ms long, end_ms long",
    )
    out = interval_join(points, intervals, bucket_ms=10)
    pairs = sorted((r["pid"], r["iv"]) for r in out.collect())
    # half-open: ms=20 not in [10,20); empty interval matches nothing;
    # multi-bucket interval 200 matches each point exactly once
    assert pairs == [(1, 200), (2, 100), (2, 200), (3, 100), (3, 200), (4, 200), (5, 200)]


def test_range_join_is_equi_join(spark):
    """Bucketing must turn the containment predicate into an equi-join --
    never a nested-loop/cartesian candidate stage."""
    df = registry.q_range_join(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_asof_join_matches_brute_force_model(spark):
    """Randomized model check: the single-shuffle union-merge must agree
    with the obvious per-row brute force (greatest (ms, tie) at or before)
    on adversarial data -- duplicate timestamps, same-instant left/right
    rows, keys on one side only."""
    import random

    rng = random.Random(1234)
    left = [(i, rng.randint(0, 8), rng.randint(0, 40)) for i in range(120)]
    right = [
        (rng.randint(0, 10), rng.randint(0, 40), i, i * 10) for i in range(80)
    ]
    expected = {}
    for eid, key, ms in left:
        cands = [(rms, ok) for rkey, rms, ok, _ in right if rkey == key and rms <= ms]
        expected[eid] = max(cands)[1] if cands else None
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ms long")
    rdf = spark.createDataFrame(right, "user_id long, ms long, ok long, cents long")
    out = asof_join(ldf, rdf, key="user_id", payload=["ok", "cents"], tie="ok")
    got = {
        r["event_id"]: (r["_asof"]["ok"] if r["_asof"] else None) for r in out.collect()
    }
    assert got == expected


def test_interval_join_matches_brute_force_model(spark):
    """Randomized model check: bucketing must produce exactly the
    containment pairs -- intervals of width 0 to several buckets, points
    on every boundary."""
    import random

    rng = random.Random(99)
    points = [(i, rng.randint(0, 100)) for i in range(150)]
    intervals = []
    for i in range(60):
        s = rng.randint(0, 100)
        intervals.append((i, s, s + rng.choice([0, 1, 7, 10, 13, 25])))
    expected = sorted(
        (pid, iv)
        for pid, ms in points
        for iv, s, e in intervals
        if s <= ms < e
    )
    pdf = spark.createDataFrame(points, "pid long, ms long")
    idf = spark.createDataFrame(intervals, "iv long, start_ms long, end_ms long")
    out = interval_join(pdf, idf, bucket_ms=10)
    got = sorted((r["pid"], r["iv"]) for r in out.collect())
    assert got == expected


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("a", i) for i in range(5)],
        "event_type string, user_id long",
    )
    from streaminglens_spark.functions.sketch import kmv_distinct

    [row] = kmv_distinct(df).collect()
    assert row["n_exact"] == 5
    assert row["kmv_estimate"] == 5.0  # below k the sketch IS the exact count


def test_kmv_mergeable_plan_no_window(spark):
    """The r4 mergeable KMV must contain no per-key ranked window (the r3
    scale caveat): the k-smallest selection is two hash aggregations."""
    from streaminglens_spark.functions.sketch import kmv_distinct

    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "event_type string, user_id long"
    )
    plan = formatted_plan(kmv_distinct(df))
    assert "Window" not in plan, plan


def test_kmv_skewed_key_matches_ranked_reference(spark):
    """One key with ~50x the distinct count of the others (the hot-key case
    the ranked window couldn't spread): the mergeable fold must equal the
    straightforward sorted-rank computation exactly, for several bucket
    counts (the k-th order statistic is algorithm-independent)."""
    from streaminglens_spark.functions.sketch import (
        HASH_A,
        HASH_B,
        HASH_P,
        KMV_K,
        kmv_distinct,
    )

    rows = [("hot", u) for u in range(5000)] + [
        (t, u) for t in ("c1", "c2") for u in range(100)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long").repartition(8)

    def reference(users):
        hs = sorted({(HASH_A * u + HASH_B) % HASH_P for u in users})
        n = len(hs)
        est = (KMV_K - 1) * HASH_P / hs[KMV_K - 1] if n >= KMV_K else float(n)
        return n, round(est, 6)

    want = {
        "hot": reference(range(5000)),
        "c1": reference(range(100)),
        "c2": reference(range(100)),
    }
    for n_buckets in (1, 7, 32):
        got = {
            r["event_type"]: (r["n_exact"], r["kmv_estimate"])
            for r in kmv_distinct(df, n_buckets=n_buckets).collect()
        }
        assert got == want, n_buckets


def test_sketch_estimates_track_exact_counts(spark):
    """Deterministic quality floor on the fixture: both sketches land
    within 50% relative error of the true per-type user cardinality.
    For HLL the standard small-range (linear counting) correction is
    applied CALLER-side from the emitted ``zero_buckets`` -- exactly the
    contract the operator documents (``ln`` is excluded from the engine
    output to keep the oracle bit-exact)."""
    import math

    for row in registry.q_kmv_distinct(spark, SF_DIR).collect():
        exact = row["n_exact"]
        assert exact > 0
        assert abs(row["kmv_estimate"] - exact) / exact < 0.5, row
    for row in registry.q_hll_distinct(spark, SF_DIR).collect():
        exact, est, zeros = row["n_exact"], row["hll_estimate"], row["zero_buckets"]
        if est < 2.5 * 64 and zeros > 0:  # small-range: linear counting
            est = 64 * math.log(64 / zeros)
        assert exact > 0
        assert abs(est - exact) / exact < 0.5, (row, est)


def test_hist_quantiles_brackets_true_quantiles(spark):
    """The reported bin upper bound must sit at or within one bin above
    the true discrete quantile -- checked against Python's sorted-rank
    brute force on the fixture."""
    from streaminglens_spark.sources.loaders import load_table

    rows = load_table(spark, SF_DIR, "events").select("event_type", "value").collect()
    by_type: dict[str, list[int]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(round(r["value"] * 100))
    got = {r["event_type"]: r for r in registry.q_hist_quantiles(spark, SF_DIR).collect()}
    for etype, cents in by_type.items():
        cents.sort()
        row = got[etype]
        assert row["n"] == len(cents)
        for p in (50, 95, 99):
            true_q = cents[-(-p * len(cents) // 100) - 1]  # ceil(p%*n)-th value
            ub = row[f"p{p}_ub_cents"]
            assert true_q <= ub <= true_q + 500, (etype, p, true_q, ub)


def test_hist_quantiles_merge_invariant(spark):
    """Additive bin counts: computing the sketch over an arbitrary 2-way
    split and over the whole input must agree exactly (the mergeability
    that lets partial sketches combine across executors)."""
    from streaminglens_spark.functions.sketch import hist_quantiles
    from streaminglens_spark.sources.loaders import load_table

    ev = load_table(spark, SF_DIR, "events")
    whole = {tuple(r) for r in hist_quantiles(ev).collect()}
    split = ev.withColumn("half", F.col("event_id") % 2)
    recombined = {
        tuple(r)
        for r in hist_quantiles(
            split.filter("half = 0").unionByName(split.filter("half = 1")).drop("half")
        ).collect()
    }
    assert whole == recombined


def test_hll_registers_bounded(spark):
    df = registry.q_hll_distinct(spark, SF_DIR)
    for row in df.collect():
        assert 0 <= row["zero_buckets"] <= 64


def test_time_rollup_hierarchy_consistent(spark):
    rows = registry.q_time_rollup(spark, SF_DIR).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    [total] = by_gid[3]
    assert total["day_idx"] is None and total["hr"] is None
    leaf_n = sum(r["n_events"] for r in by_gid[0])
    day_n = sum(r["n_events"] for r in by_gid[1])
    assert leaf_n == day_n == total["n_events"]
    leaf_cents = sum(r["sum_cents"] for r in by_gid[0])
    assert leaf_cents == total["sum_cents"]
    assert len(by_gid[1]) == len({r["day_idx"] for r in by_gid[0]})


def test_time_rollup_single_pass(spark):
    """ROLLUP must plan as one Expand + aggregate -- three granularities,
    one shuffle."""
    df = registry.q_time_rollup(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Expand" in plan, plan
    assert exchange_count(df) == 1, plan
