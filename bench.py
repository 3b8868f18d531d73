"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Timing counts FULL materialization via the noop sink
(``df.write.format("noop")``): every output column is computed and
serialized on the executors, so projection-only queries pay for their
computed columns (a bare ``count()`` lets Catalyst drop unused
projections and would time just the scan).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from streaminglens_spark import registry  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_state_classify",   # full analysis pipeline (A1..A10)
    "q_critical_path",    # iterative stage-DAG longest path (A8)
    "q_max_concurrency",  # concurrency sweep (A11)
    "q_results_topk",     # retention + ranking (A19)
    "q_discounted_state", # reporting aggregation (A13)
    "q_dedup_exact",      # exact dedup
    "q_minhash_lsh",      # MinHash+LSH near-dup
    "q_cosine_topk",      # similarity search
    "q_text_stats",       # text analysis
    "q_session_agg",      # event-time session windows
    "q_tumbling_agg",     # event-time tumbling windows
    "q_pricing_summary",  # star-schema aggregation
    "q_region_volume",    # 5-table join chain
    "q_frame_sample",     # multimodal mapInPandas
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("streaminglens-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch the fixture scan + a tiny job so JVM startup is excluded,
    # and run a trivial pandas UDF so the Python worker pool (one proc per
    # core, spawned on first use) is charged to startup, not to whichever
    # query happens to hit Arrow first
    registry.queries()["q_batch_bounds"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    def _wu(batches):
        yield from batches

    spark.range(100_000).mapInPandas(_wu, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # min of 2 runs per query: single-box run-to-run noise is ±15% (PERF.md);
    # the min is the reproducible cost of the plan, not a lucky cache hit --
    # nothing is persisted across runs and the noop sink recomputes fully
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.queries()[name]
        best = float("inf")
        for _ in range(2):
            # queries that persist internally (minhash base signatures) must
            # not serve run 2 from run 1's cache: CacheManager matches
            # canonicalized plans across separately-built DataFrames
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
