"""Parquet loaders for the driver-provided fixture tables (TESTDATA.md).

The reference has no file connectors at all -- its only source is the
in-process Spark listener bus (reference ``listener/StreamingAppListener.scala``).
Our engine's batch mode reads the Parquet fixture tables instead; Catalyst
gives predicate pushdown + column pruning on these scans for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (mirrors the driver's
    DuckDB-side registration, so ``spark.sql`` text can name them)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
