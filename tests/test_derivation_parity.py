"""Bit-exact parity of the Spark telemetry derivation vs the DuckDB oracle
prelude (the backbone of every downstream oracle check)."""

from __future__ import annotations

import pytest

from streaminglens_spark.oracle.compare import compare
from streaminglens_spark.oracle.prelude import oracle
from streaminglens_spark.sources.loaders import load_table
from streaminglens_spark.telemetry import derive_telemetry
from tests.conftest import SF_DIR

TABLES = ["progress", "jobs", "stages", "tasks", "executors", "sla_config"]


@pytest.fixture(scope="module")
def telemetry(spark):
    return derive_telemetry(spark, load_table(spark, SF_DIR, "events"))


@pytest.mark.parametrize("name", TABLES)
def test_table_parity(telemetry, duck, name):
    df = getattr(telemetry, name)
    res = compare(df, duck, oracle(f"SELECT * FROM {name}"))
    assert res["ok"], res
