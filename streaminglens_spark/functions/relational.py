"""General relational analytics over the star-schema fixture tables --
demonstrates the engine's multi-table join/agg/sort planning (broadcast
dims, partial aggregation, top-k windows) on the TPC-H-ish corpus.

Money amounts are quantized to exact integers before aggregation
(cents / basis points), so every sum is order-independent and
bit-reproducible against the oracle: ``disc_e8 = cents * (10000 - disc_bp)``
keeps the classic ``price * (1 - discount)`` semantics in exact 1e-8 units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _li(lineitem: DataFrame) -> DataFrame:
    return lineitem.withColumn(
        "price_cents", F.round(F.col("l_extendedprice") * 100).cast("long")
    ).withColumn(
        "disc_bp", F.round(F.col("l_discount") * 10000).cast("long")
    ).withColumn(
        "disc_e8", (F.col("price_cents") * (10000 - F.col("disc_bp"))).cast("long")
    )


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) counts
    and exact sums; Catalyst plans partial+final hash aggregation."""
    return (
        _li(lineitem)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("count_order"),
            F.round(F.sum("l_quantity") * 100).cast("long").alias("sum_qty_cents"),
            F.sum("price_cents").cast("long").alias("sum_base_cents"),
            F.sum("disc_e8").cast("long").alias("sum_disc_e8"),
        )
    )


def top_customers(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped: returned-item revenue per customer with the nation
    dim broadcast; deterministic top-k."""
    rev = (
        _li(lineitem)
        .filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("disc_e8").cast("long").alias("revenue_e8"))
    )
    joined = (
        rev.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            "revenue_e8",
        )
    )
    w = Window.orderBy(F.col("revenue_e8").desc(), F.col("custkey"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def region_volume(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    nation: DataFrame, region: DataFrame,
) -> DataFrame:
    """TPC-H Q5-shaped: revenue by customer region through a 5-table join
    chain; region/nation broadcast, fact-side shuffles keyed on join keys."""
    return (
        _li(lineitem)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("disc_e8").cast("long").alias("revenue_e8"),
        )
    )
