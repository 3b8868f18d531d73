"""Composed-loader scale probe (r13, r12 verdict ask #4): drive ONE
streaming pass of ``loader_ingest_monitor`` -- admission -> split ->
append-only order -> packing spans, four state tables under one marker
per batch -- over a scale-point's ``documents`` table sliced into
contiguous doc-id micro-batches, and record PER-BATCH wall times so the
first bend is visible (the dedup-against-index join and the committed
order/roots prefix views are the parts that grow with committed state).

    python scripts/probe_loader.py .scratch/sf10 4

Batches are fed through the monitor's ``foreachBatch`` body directly
(the loader tests' replay protocol) -- identical per-batch work to a
file-source stream without the source's trigger plumbing, so the probe
times the ENGINE, not the rate limiter.  Doc ids arrive globally
increasing (the loader's contract), exactly as a real ingest stream
delivers them.  Not part of the graded bench surface; prints one JSON
line and writes ``probe_sf10_loader.json``-style output to stdout only
(the builder commits a blessed line to the sidecar).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module: env probe + idle gate)
from streaminglens_spark.session import get_spark  # noqa: E402


def main() -> None:
    # r14: --order curriculum probes the quality-banded order mode (the
    # per-(band, shard) pack families) on the same protocol
    order = "curriculum" if "--order-curriculum" in sys.argv else "arrival"
    argv = [a for a in sys.argv if a != "--order-curriculum"]
    sf_dir = os.path.abspath(argv[1])
    n_batches = int(argv[2]) if len(argv) > 2 else 4
    gate = bench._wait_for_idle(
        threshold=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD", "2")),
        timeout_sec=float(os.environ.get("SPARK_GRAFT_IDLE_TIMEOUT", "420")),
    )
    spark = get_spark("streaminglens-loader-probe")
    spark.sparkContext.setLogLevel("ERROR")
    env = bench._env_probe()
    env["idle_gate"] = gate

    from pyspark.sql import functions as F

    from streaminglens_spark.streaming.loader import loader_ingest_monitor

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    lo, hi, n_docs = docs.agg(
        F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1))
    ).first()
    width = (int(hi) - int(lo)) // n_batches + 1

    state_root = tempfile.mkdtemp(prefix="loader_probe_")
    gauges: list[dict] = []
    try:
        _, body = loader_ingest_monitor(
            f"{state_root}/state",
            # no budgets: every quality survivor is admitted -- the probe
            # times the structural stages, not a budget cutoff
            gauge_sinks=[lambda s, g: gauges.append(dict(g))],
            spark=spark,
            order=order,
        )
        per_batch: list[float] = []
        for i in range(n_batches):
            b = docs.filter(
                (F.col("doc_id") >= int(lo) + i * width)
                & (F.col("doc_id") < int(lo) + (i + 1) * width)
            )
            t0 = time.perf_counter()
            body(b, i)
            per_batch.append(round(time.perf_counter() - t0, 3))
            print(
                f"# batch {i}: {per_batch[-1]:.3f}s  "
                f"in={gauges[-1]['inDocs']} admitted="
                f"{gauges[-1]['admittedDocs']} "
                f"trainPositions={gauges[-1]['trainPositions']}",
                file=sys.stderr,
            )
        env["load1_after"] = round(os.getloadavg()[0], 2)
        out = {
            "metric": "loader_stream_pass_total",
            "order": order,
            "value": round(sum(per_batch), 3),
            "unit": "sec",
            "sf_dir": sf_dir,
            "n_docs": int(n_docs),
            "n_batches": n_batches,
            "per_batch_sec": per_batch,
            "gauges_last": gauges[-1],
            "env": env,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(state_root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
