"""KLL rank-error quantile sketch: reference parity, determinism, and the
rank-error bound the class exists for (r4 verdict missing #5 -- the
documented non-oracle variant; the checks here are the independent
evidence in place of a DuckDB hash row)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from streaminglens_spark.functions.kll import (
    KLL_K,
    kll_quantiles,
    kll_reference,
)
from tests.conftest import SF_DIR, SF_DIR_001


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _collect(df):
    return {
        r["event_type"]: (r["n"], [r["p50_est"], r["p95_est"], r["p99_est"]])
        for r in df.collect()
    }


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_001])
def test_matches_pure_python_reference(spark, sf_dir):
    """The Spark two-level build reproduces a single-threaded numpy run of
    the same algorithm bit-for-bit: pins the applyInPandas grouping, the
    serialization round-trip, and shard-order-determinism of the merge."""
    ev = _events(spark, sf_dir)
    got = _collect(kll_quantiles(ev))
    rows = [
        (r["event_id"], r["event_type"], r["value"])
        for r in ev.select("event_id", "event_type", "value").collect()
    ]
    want = kll_reference(rows)
    assert got.keys() == want.keys()
    for k in got:
        assert got[k][0] == want[k][0], k  # exact n
        assert got[k][1] == want[k][1], k  # bit-identical estimates


def test_repartition_invariant(spark):
    """Pure function of the row multiset: the physical partitioning of the
    input must not leak into the sketch."""
    ev = _events(spark, SF_DIR)
    a = _collect(kll_quantiles(ev.repartition(1)))
    b = _collect(kll_quantiles(ev.repartition(13, "user_id")))
    assert a == b


def _rank_error(values: np.ndarray, est: float, p: int) -> float:
    """|true rank of the estimate - target rank| / n, measured against the
    same pick rule (smallest value whose rank reaches p% of n)."""
    v = np.sort(values)
    n = len(v)
    # estimate's rank band: [#(< est), #(<= est)]; error is distance from
    # the target rank to the NEAREST rank the estimate actually occupies
    lo = np.searchsorted(v, est, side="left")
    hi = np.searchsorted(v, est, side="right")
    target = -(-p * n // 100)  # ceil(p*n/100), the cum*100 >= p*n pick
    if lo <= target <= hi:
        return 0.0
    return min(abs(lo - target), abs(hi - target)) / n


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_001])
def test_rank_error_bound_real_data(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = _collect(kll_quantiles(ev))
    pdf = ev.select("event_type", "value").toPandas()
    for etype, (n, ests) in got.items():
        vals = pdf.loc[pdf["event_type"] == etype, "value"].to_numpy()
        assert n == len(vals)
        for p, est in zip((50, 95, 99), ests):
            err = _rank_error(vals, est, p)
            assert err <= 0.02, (etype, p, est, err)


def test_rank_error_bound_heavy_tail(spark):
    """The case value-error sketches fail and this class exists for: six
    decades of spread (lognormal-shaped via exp of uniform powers).  The
    2% bound must hold at the p99 of the tail."""
    n = 20000
    rng = np.random.RandomState(7)  # fixture generation only -- the
    # sketch itself has no RNG; any fixed corpus works
    vals = np.exp(rng.uniform(0, 14, size=n))  # ~1 .. 1.2e6
    pdf = pd.DataFrame(
        {"event_id": np.arange(n), "event_type": "tail", "value": vals}
    )
    df = spark.createDataFrame(pdf)
    got = _collect(kll_quantiles(df))
    assert got["tail"][0] == n
    for p, est in zip((50, 95, 99), got["tail"][1]):
        err = _rank_error(vals, est, p)
        assert err <= 0.02, (p, est, err)


def test_exact_below_capacity(spark):
    """A group smaller than the bottom capacity is never compacted: the
    sketch IS the data and every quantile is exact."""
    n = KLL_K // 2
    pdf = pd.DataFrame(
        {"event_id": np.arange(n), "event_type": "small",
         "value": np.arange(n, dtype=float)}
    )
    got = _collect(kll_quantiles(spark.createDataFrame(pdf)))
    nn, (p50, p95, p99) = got["small"]
    assert nn == n
    v = np.arange(n, dtype=float)
    for p, est in zip((50, 95, 99), (p50, p95, p99)):
        target = -(-p * n // 100)
        assert est == v[target - 1], (p, est)


def test_weight_exact_n(spark):
    """Total weight survives every compaction: n is exact even when the
    input is far above capacity (odd sizes exercise the leftover path)."""
    n = 7777
    pdf = pd.DataFrame(
        {"event_id": np.arange(n), "event_type": "w",
         "value": np.sin(np.arange(n)).astype(float)}
    )
    got = _collect(kll_quantiles(spark.createDataFrame(pdf)))
    assert got["w"][0] == n


def test_sketch_size_bounded(spark):
    """The serialized sketch per (key, shard) stays O(k log(n/k)) items --
    the whole point of a sketch; guards against a regression that keeps
    raw values around."""
    from streaminglens_spark.functions.kll import kll_sketch_shards

    ev = _events(spark, SF_DIR_001)
    rows = kll_sketch_shards(ev).select(
        "event_type", "shard", F.size("items").alias("sz")
    )
    per_group = (
        rows.groupBy("event_type", "shard").agg(F.sum("sz").alias("total"))
    ).collect()
    assert per_group
    for r in per_group:
        assert r["total"] <= 4 * KLL_K, r


def test_incremental_merge_rank_error_and_exact_n(spark):
    """The dedup_against_index pattern for quantiles: per-batch sketch
    tables merged by concatenation must keep n exact and the rank-error
    contract, without rescanning earlier batches."""
    from streaminglens_spark.functions.kll import (
        kll_merge_quantiles,
        kll_sketch_shards,
    )

    ev = _events(spark, SF_DIR_001)
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    tables = [kll_sketch_shards(b) for b in batches]
    got = _collect(kll_merge_quantiles(*tables))
    pdf = ev.select("event_type", "value").toPandas()
    for etype, (n, ests) in got.items():
        vals = pdf.loc[pdf["event_type"] == etype, "value"].to_numpy()
        assert n == len(vals), etype  # exact across the batch split
        for p, est in zip((50, 95, 99), ests):
            assert _rank_error(vals, est, p) <= 0.02, (etype, p)


def test_incremental_merge_deterministic(spark):
    """A fixed batch split gives a fixed merged sketch: same inputs,
    bit-identical estimates on re-run."""
    from streaminglens_spark.functions.kll import (
        kll_merge_quantiles,
        kll_sketch_shards,
    )

    ev = _events(spark, SF_DIR)
    a = kll_sketch_shards(ev.filter(F.col("event_id") % 2 == 0))
    b = kll_sketch_shards(ev.filter(F.col("event_id") % 2 == 1))
    one = _collect(kll_merge_quantiles(a, b))
    two = _collect(kll_merge_quantiles(a, b))
    assert one == two


def test_merge_of_single_table_matches_one_shot(spark):
    """Degenerate incremental case (one batch) must be bit-identical to
    the one-shot build -- the concat-merge path may not perturb it."""
    from streaminglens_spark.functions.kll import (
        kll_merge_quantiles,
        kll_sketch_shards,
    )

    ev = _events(spark, SF_DIR)
    assert _collect(kll_merge_quantiles(kll_sketch_shards(ev))) == _collect(
        kll_quantiles(ev)
    )
