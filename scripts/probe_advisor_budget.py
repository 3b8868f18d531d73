"""LSH-advisor fixed-budget probe (r14, r13 verdict ask #1 follow-up):
measure that ``lsh_parameter_advisor``'s wall time is FLAT across
corpus scale once ``max_sample_rows`` binds -- the property the r13
fraction-only default lacked (sample linear in corpus => pair join
quadratic in corpus).

    python scripts/probe_advisor_budget.py CAP DIR1 DIR2 [DIR3 ...]

Runs the advisor (sample_fraction=1.0 so the row cap is the ONLY
budget) over each scale point's ``documents`` table, min-of-2 per
point, and prints one JSON line with per-point walls + doc counts.
With the cap binding everywhere, the pair join is ~cap^2/2 at every
point, so the walls should track the (flat) pair budget plus the
(linear, cheap) corpus scan -- not the corpus square.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402


def main() -> None:
    cap = int(sys.argv[1])
    dirs = [os.path.abspath(d) for d in sys.argv[2:]]
    gate = bench._wait_for_idle(
        threshold=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD", "2")),
        timeout_sec=float(os.environ.get("SPARK_GRAFT_IDLE_TIMEOUT", "420")),
    )
    spark = get_spark("streaminglens-advisor-budget-probe")
    spark.sparkContext.setLogLevel("ERROR")
    env = bench._env_probe()
    env["idle_gate"] = gate

    from streaminglens_spark.functions.dedup import lsh_parameter_advisor

    points = []
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet").select(
            "doc_id", "text"
        )
        n = docs.count()
        walls = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = lsh_parameter_advisor(
                docs, sample_fraction=1.0, max_sample_rows=cap
            ).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        points.append({
            "sf_dir": d,
            "n_docs": int(n),
            "wall_sec": min(walls),
            "spread": walls,
            "rows": len(rows),
        })
        print(f"# {d}: n_docs={n} wall={min(walls):.2f}s {walls}",
              file=sys.stderr)
    env["load1_after"] = round(os.getloadavg()[0], 2)
    print(json.dumps({
        "metric": "lsh_advisor_fixed_budget",
        "unit": "sec",
        "max_sample_rows": cap,
        "points": points,
        "env": env,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
