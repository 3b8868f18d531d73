"""Table profiler: null/distinct semantics on a synthetic fixture and
the one-shuffle plan contract.  Cross-engine parity (incl. double
string-formatting agreement) runs in ``test_oracle_queries``
(`q_profile_events`)."""

from __future__ import annotations

import pytest

from streaminglens_spark.functions.profile import profile_table


def test_null_and_distinct_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, None), (5, "b")],
        "k long, v string",
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 5
    assert out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 5
    assert (out["k"]["min_val"], out["k"]["max_val"]) == ("1", "5")
    v = out["v"]
    assert v["n_nulls"] == 2
    assert v["n_distinct"] == 2  # NULLs ignored
    assert (v["min_val"], v["max_val"]) == ("a", "b")


def test_column_subset_and_empty_raises(spark):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    out = profile_table(df, ["v"]).collect()
    assert [r["col_name"] for r in out] == ["v"]
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df, [])


def test_single_shuffle_plan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        profile_table(df, ["event_id", "user_id", "event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the distinct aggregate adds its expand-based second phase over the
    # SAME key partitioning; the whole profile stays <= 2 exchanges no
    # matter how many columns are profiled
    assert plan.count("Exchange hashpartitioning") <= 2
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan
