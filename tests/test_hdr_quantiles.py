"""HDR log-bucket quantile sketch (r5): the relative-error contract on a
deterministic heavy-tailed fixture (6 decades of magnitude -- exactly
where the fixed-width hist_quantiles bins lose), plus partition
independence.  Oracle hash-equality runs in test_oracle_queries
(LOCAL_ORACLE)."""

from __future__ import annotations

import math

from streaminglens_spark.functions.sketch import HDR_P_BITS, hdr_quantiles

PMS = (500, 950, 990, 999)


def _heavy_tail_rows():
    # deterministic 6-decade tail: x_i = floor(1.1^i) cents, i = 0..199,
    # each value 3x to give ranks some weight; max ~1.9e8 cents
    rows = []
    eid = 0
    for i in range(200):
        x = int(1.1**i)
        for _ in range(3):
            rows.append((eid, "lat", x / 100.0))
            eid += 1
    return rows


def _true_quantiles(xs, pms):
    s = sorted(xs)
    n = len(s)
    out = {}
    for pm in pms:
        i = math.ceil(pm * n / 1000)  # first rank with rank*1000 >= pm*n
        out[pm] = s[i - 1]
    return out


def test_hdr_relative_error_bound_on_heavy_tail(spark):
    rows = _heavy_tail_rows()
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = hdr_quantiles(df).collect()
    assert len(got) == 1
    r = got[0]
    xs = [round(v * 100) for _, _, v in rows]
    true = _true_quantiles(xs, PMS)
    for pm in PMS:
        ub = r[f"p{pm}_ub_cents"]
        t = true[pm]
        assert ub > t, (pm, ub, t)  # upper bound is strict
        # relative-error contract: overshoot <= 2^-p_bits of the true
        # value for coarse buckets, <= 1 cent for exact ones
        assert ub - t <= max(1, t / (1 << HDR_P_BITS)), (pm, ub, t)
    # the p999 sits ~6 decades up; a 500-cent absolute bin (hist) would be
    # exact there only by luck -- the relative bound is what scales
    assert true[999] > 10**7


def test_hdr_partition_independent(spark):
    rows = _heavy_tail_rows()
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    a = sorted(map(tuple, hdr_quantiles(df.repartition(1)).collect()))
    b = sorted(map(tuple, hdr_quantiles(df.repartition(13)).collect()))
    assert a == b


def test_hdr_negative_and_small_values_exact(spark):
    # everything below 2^p_bits (incl. negatives) gets singleton buckets:
    # the quantile ub is true+1 exactly
    rows = [(i, "t", v / 100.0) for i, v in enumerate([-500, -3, 0, 1, 5, 90, 120])]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = hdr_quantiles(df).collect()[0]
    xs = sorted(round(v * 100) for _, _, v in rows)
    true = _true_quantiles(xs, PMS)
    for pm in PMS:
        assert r[f"p{pm}_ub_cents"] == true[pm] + 1
