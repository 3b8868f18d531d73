from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from streaminglens_spark.session import get_spark  # noqa: E402
from streaminglens_spark.oracle.compare import duckdb_connect  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("streaminglens-tests", master="local[4]")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()
