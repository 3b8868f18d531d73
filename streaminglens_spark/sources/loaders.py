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


# --- schema-drift-tolerant JSONL ingest (round-5 extension) ------------------

CORRUPT_COL = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id long, text string, lang string, source string",
):
    """Ingest JSONL documents the way a real crawl feed arrives: rows
    with MISSING fields (schema drift) surface as NULLs, rows with the
    wrong TYPE or broken JSON are captured whole in ``_corrupt_record``
    instead of killing the job or silently vanishing (PERMISSIVE mode
    made explicit + the corrupt column added to the declared schema --
    without it Spark's JSON reader silently drops unparseable rows).

    Returns (good, bad): ``good`` has the declared columns with the
    corrupt column dropped; ``bad`` carries (raw ``_corrupt_record``)
    for quarantine -- write it somewhere durable and alert, never
    discard.  Both are lazy single-scan projections of one cached read;
    at 100 TB the quarantine rate is the ingest health metric.

    Note the Spark subtlety this wraps: corrupt-record capture requires
    the capture column IN the schema, and a query that selects ONLY the
    corrupt column is disallowed (Spark raises) -- ``bad`` therefore
    filters on the column but keeps the full row shape."""
    full_schema = f"{schema}, {CORRUPT_COL} string"
    df = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    # cache the parsed scan: good/bad are two filters of one read, and
    # Spark's JSON corrupt-record handling requires referencing non-
    # corrupt columns alongside the corrupt one anyway
    df = df.cache()
    good = df.filter(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.filter(df[CORRUPT_COL].isNotNull())
    return good, bad
