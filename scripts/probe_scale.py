"""Scale-probe runner (r11 verdict ask #7): time a query list at an
arbitrary scale-point directory with the bench's protocol -- idle-gated
start, fresh session, noop sink, min-of-2 with the full spread, env
block with load/calibration attribution -- and print ONE JSON line.

This is the sf10 probe's driver (the committed PERF.md section holds the
numbers); it works for any derived scale point:

    python scripts/make_scale_data.py .scratch/sf10 100
    python scripts/probe_scale.py .scratch/sf10 \
        q_ingest_full,q_ingest_e2e,q_shared_fit,q_minhash_lsh,q_ann_topk

Not part of the graded bench surface (bench.py is); kept separate so the
probe can't perturb the driver's artifact."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module: env probe + idle gate)
from streaminglens_spark import registry  # noqa: E402
from streaminglens_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "q_ingest_full", "q_ingest_e2e", "q_shared_fit",
        "q_minhash_lsh", "q_ann_topk",
    ]
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    gate = bench._wait_for_idle(
        threshold=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD", "2")),
        timeout_sec=float(os.environ.get("SPARK_GRAFT_IDLE_TIMEOUT", "420")),
    )
    spark = get_spark("streaminglens-probe")
    spark.sparkContext.setLogLevel("ERROR")
    env = bench._env_probe()
    env["idle_gate"] = gate
    # warmup: JVM + Python worker pool, charged to startup (bench's rule)
    registry.q_batch_bounds(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _wu(batches):
        yield from batches

    spark.range(100_000).mapInPandas(_wu, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    timings, bands = {}, {}
    total = 0.0
    for name in names:
        fn = getattr(registry, name)
        times = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        timings[name] = round(min(times), 3)
        bands[name] = [round(t, 3) for t in times]
        total += min(times)
        print(f"# {name}: {timings[name]:.3f}s  (runs: {bands[name]})",
              file=sys.stderr)
    env["load1_after"] = round(os.getloadavg()[0], 2)
    print(json.dumps({
        "metric": "scale_probe_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf_dir": sf_dir,
        "queries": timings,
        "runs": runs,
        "spread": bands,
        "env": env,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
