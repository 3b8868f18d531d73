"""Every registry query vs its DuckDB oracle at sf0.001 (the driver runs the
same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from streaminglens_spark import registry
from streaminglens_spark.oracle.compare import compare
from tests.conftest import SF_DIR

# driver surface + round-3 rotated-out queries (still first-class, locally
# checked every run)
ALL_ORACLE = {**registry.ORACLE, **registry.LOCAL_ORACLE}
NAMES = sorted(ALL_ORACLE)


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(spark, duck, name):
    fn = getattr(registry, name)
    df = fn(spark, SF_DIR)
    sql = ALL_ORACLE[name]
    if sql is None:
        assert df.count() >= 0  # rows-only check
        return
    res = compare(df, duck, sql)
    assert res["ok"], {k: v for k, v in res.items() if k != "spark_cols"}
