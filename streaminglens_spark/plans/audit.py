"""Physical-plan introspection helpers: the ``.explain("formatted")``
discipline as assertable predicates, so plan-quality regressions (lost
broadcast, lost pushdown, accidental Python UDF in a JVM path) fail tests
instead of surfacing as cluster bills."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def python_udf_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return plan.count("BatchEvalPython")  # row-at-a-time Python UDFs only


def arrow_udf_count(df: DataFrame) -> int:
    plan = formatted_plan(df)
    return plan.count("ArrowEvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column lists of every parquet scan's ReadSchema (pruning check)."""
    import re

    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded) -- the unit of cost the r3 critical-path rewrite
    minimizes.  Counts the formatted plan's detail headers (``(7) Exchange``)
    so each operator is counted once, not per tree line."""
    import re

    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if re.match(r"^\(\d+\) Exchange\b", line.strip())
        and "Broadcast" not in line
    )
