"""Dump .explain("formatted") for every headline bench query.

Usage: python scripts/dump_plans.py <out_dir> [suffix] [query ...]

Writes <out_dir>/<query>_<suffix>.txt (suffix default "before") for each
headline query (or the explicit list given).  Plans are built against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); building a plan is
driver-side work so this is safe to run on a loaded box.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaminglens_spark import registry  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "plans/r14")
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    import bench

    names = sys.argv[3:] or bench.HEADLINE
    out_dir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = getattr(registry, name)(spark, sf_dir)
            txt = explain_str(df)
        except Exception as e:  # noqa: BLE001 - record the failure in-file
            txt = f"PLAN BUILD FAILED: {e}"
        (out_dir / f"{name}_{suffix}.txt").write_text(txt + "\n")
        print(f"# wrote {name}_{suffix}.txt ({len(txt)} chars)", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
