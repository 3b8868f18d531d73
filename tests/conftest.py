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


# Hypothesis: no wall-clock deadline anywhere in this suite.  Property
# tests here measure CORRECTNESS (rank error, fold equality, invariants),
# never latency, and the suite routinely runs while a Spark JVM saturates
# the box -- the default 200 ms per-example deadline turned a loaded-box
# scheduling stall into a "flaky" failure (r8: test_kll_rank_error_
# generated, pure numpy, irreproducible at any seed on an idle box).
try:
    from hypothesis import HealthCheck, settings as _hyp_settings

    _hyp_settings.register_profile(
        "spark-graft",
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    _hyp_settings.load_profile("spark-graft")
except ImportError:  # pragma: no cover
    pass


def hidden_tmp(path: str) -> str:
    """Scratch name for atomic file drops into a STREAM-WATCHED dir:
    Spark's file source lists the directory between our open() and
    os.rename(), and a visible ``<name>.tmp`` can be snapshotted then
    vanish ("Was it deleted very recently?" -- a real full-suite flake,
    r14).  Dot-prefixed names are excluded from Spark's file listing by
    convention, so write there and rename into place."""
    import os

    d, b = os.path.split(path)
    return os.path.join(d, "." + b + ".tmp")
