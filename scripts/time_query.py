"""Spot-time individual registry queries under the bench protocol
(noop sink, clearCache between runs, min of N).

Usage: python scripts/time_query.py <sf_dir> <runs> <query> [query ...]

Prints one JSON line: {"sf_dir": ..., "queries": {name: best}, "spread":
{name: [..]}, "env": {...}}.  Used for before/after evidence on
individual optimizations; the committed pass of record stays bench.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streaminglens_spark import registry  # noqa: E402
from streaminglens_spark.cache import release_caches  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2])
    names = sys.argv[3:]
    import bench

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM + Python worker pool
    registry.q_batch_bounds(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _wu(batches):
        yield from batches

    spark.range(100_000).mapInPandas(_wu, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    env = bench._env_probe()
    timings, bands = {}, {}
    for name in names:
        fn = getattr(registry, name)
        times = []
        for _ in range(runs):
            release_caches()  # drop tracked plan refs (same as bench.py)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time_query:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        timings[name] = min(times)
        bands[name] = times
        print(f"# {name}: {min(times):.3f}s (runs: {times})", file=sys.stderr)
    print(json.dumps(
        {"sf_dir": sf_dir, "queries": timings, "spread": bands, "env": env}
    ))


if __name__ == "__main__":
    main()
