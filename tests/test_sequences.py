"""Per-user sequence extraction + leakage-safe rolling features (r5
continued).  Oracle hash parity lives in test_oracle_queries.py."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from streaminglens_spark.functions.sequences import (
    rolling_user_features,
    user_event_sequences,
)
from streaminglens_spark.plans.audit import formatted_plan
from streaminglens_spark import registry
from tests.conftest import SF_DIR


def _ev_df(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    data = [
        (eid, base + datetime.timedelta(seconds=s), uid, et, val, "{}")
        for eid, s, uid, et, val in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_sequence_order_is_time_then_id(spark):
    """The digest must cover ORDER: swapping two events' timestamps
    changes seq_md5 even though membership is identical."""
    a = _ev_df(spark, [(0, 10, 1, "x", 1.0), (1, 20, 1, "y", 1.0)])
    b = _ev_df(spark, [(0, 20, 1, "x", 1.0), (1, 10, 1, "y", 1.0)])
    ma = user_event_sequences(a).collect()[0]["seq_md5"]
    mb = user_event_sequences(b).collect()[0]["seq_md5"]
    assert ma != mb


def test_sequence_truncation(spark):
    rows = [(i, i, 7, f"t{i}", 0.0) for i in range(60)]
    out = user_event_sequences(_ev_df(spark, rows), max_len=50).collect()[0]
    assert out["n_events"] == 60 and out["seq_len"] == 50


def test_rolling_features_exclude_current(spark):
    """The frame is [-n, -1]: an event's own cents never leak into its
    features, and the first event has zero history."""
    rows = [(i, i, 1, "x", 10.0) for i in range(4)]  # 1000 cents each
    out = {
        r["event_id"]: r
        for r in rolling_user_features(_ev_df(spark, rows), n=2).collect()
    }
    assert out[0]["prev_n"] == 0 and out[0]["prev_cents"] == 0
    assert out[0]["ms_since_prev"] is None
    assert out[1]["prev_n"] == 1 and out[1]["prev_cents"] == 1000
    assert out[3]["prev_n"] == 2 and out[3]["prev_cents"] == 2000
    assert out[3]["ms_since_prev"] == 1000


def test_rolling_features_per_user_isolation(spark):
    rows = [(0, 10, 1, "x", 5.0), (1, 20, 2, "x", 5.0)]
    out = {
        r["event_id"]: r
        for r in rolling_user_features(_ev_df(spark, rows)).collect()
    }
    assert out[1]["prev_n"] == 0  # user 2 never sees user 1's history


def test_windows_are_user_partitioned(spark):
    """No global-order window: every windowspec carries the user_id
    partition key."""
    plan = formatted_plan(registry.q_user_features(spark, SF_DIR))
    flat = plan.replace("#", "").replace(" ", "")
    assert "windowspecdefinition(user_id" in flat, plan[:600]


def test_sequence_counts_cover_events(spark):
    out = registry.q_user_sequences(spark, SF_DIR)
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == spark.read.parquet(f"{SF_DIR}/events.parquet").count()


def test_props_stats_counts_missing_and_malformed(spark):
    from streaminglens_spark.functions.sequences import props_stats

    rows = [
        (0, None, 1, "a", 0.0, '{"k": 5}'),
        (1, None, 1, "a", 0.0, '{"other": 1}'),   # no k
        (2, None, 1, "a", 0.0, "not json"),        # malformed
        (3, None, 1, "a", 0.0, '{"k": 7}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = props_stats(df).collect()[0]
    assert r["n_events"] == 4 and r["n_with_k"] == 2
    assert (r["k_min"], r["k_max"], r["k_sum"]) == (5, 7, 12)
