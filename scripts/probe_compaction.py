"""Compaction-wall probe (r14, r13 verdict ask #4): the sf10 loader
pass named committed-view READ FAN-IN -- O(recent batch dirs) parquet
listings per trigger -- as the loader's next expected bend and asserted
generation compaction bounds it.  This probe MEASURES that instead of
asserting it: one long streaming pass (>=32 micro-batches) of
``loader_ingest_monitor`` run twice over the same sliced corpus --
compaction ON (a generation fold every ``compact_every`` batches) vs
OFF (``compact_every=0``) -- recording, per trigger, the wall time AND
the number of committed batch dirs the three prefix-view reads must
fold (dirs newer than the latest generation: the read fan-in).

    python scripts/probe_compaction.py /root/testdata/sf0.1 32 8

Expected shape (the claim under test): with compaction OFF the fold
width grows 1,2,3,...,N and the per-trigger wall inherits an O(N) term;
with compaction ON the width saw-tooths between 1 and compact_every and
the tail batches stay flat.  Batches are fed through ``foreachBatch``
directly (the loader tests' replay protocol) so the probe times the
engine, not a file-source rate limiter.  Not part of the graded bench
surface; prints one JSON line (the builder commits a blessed line to
``probe_compaction.json``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root module: env probe + idle gate)
from streaminglens_spark.session import get_spark  # noqa: E402


def _fold_width(state_path: str) -> int:
    """Committed batch dirs newer than the latest committed generation --
    the per-trigger read fan-in the committed views pay (each view lists
    these dirs; the generation contributes O(1) reads regardless)."""
    if not os.path.isdir(state_path):
        return 0
    batches = []
    for n in os.listdir(state_path):
        m = re.match(r"batch_id=(\d+)$", n)
        if m and os.path.exists(
            os.path.join(state_path, n, "_COMMITTED")
        ):
            batches.append(int(m.group(1)))
    gen_id = -1
    comp = os.path.join(state_path, "compacted")
    if os.path.isdir(comp):
        for n in os.listdir(comp):
            m = re.match(r"gen=(\d+)$", n)
            if m and os.path.exists(os.path.join(comp, n, "_COMMITTED")):
                gen_id = max(gen_id, int(m.group(1)))
    return sum(1 for b in batches if b > gen_id)


def _run_pass(spark, docs, lo, width, n_batches, compact_every) -> dict:
    from streaminglens_spark.streaming.loader import loader_ingest_monitor
    from pyspark.sql import functions as F

    state_root = tempfile.mkdtemp(prefix="compact_probe_")
    state_path = f"{state_root}/state"
    per_batch, fan_in = [], []
    try:
        _, body = loader_ingest_monitor(
            state_path,
            compact_every=int(compact_every),
            spark=spark,
        )
        for i in range(n_batches):
            b = docs.filter(
                (F.col("doc_id") >= int(lo) + i * width)
                & (F.col("doc_id") < int(lo) + (i + 1) * width)
            )
            fan_in.append(_fold_width(state_path))
            t0 = time.perf_counter()
            body(b, i)
            per_batch.append(round(time.perf_counter() - t0, 3))
            print(
                f"# compact_every={compact_every} batch {i}: "
                f"{per_batch[-1]:.3f}s fan_in={fan_in[-1]}",
                file=sys.stderr,
            )
        gens = _fold_width(state_path)  # final width after last commit
        q1 = sum(per_batch[: n_batches // 4])
        q4 = sum(per_batch[-(n_batches // 4):])
        return {
            "compact_every": int(compact_every),
            "per_batch_sec": per_batch,
            "fan_in_at_trigger": fan_in,
            "final_fan_in": gens,
            "first_quarter_sec": round(q1, 3),
            "last_quarter_sec": round(q4, 3),
            "tail_over_head": round(q4 / q1, 3) if q1 else None,
        }
    finally:
        shutil.rmtree(state_root, ignore_errors=True)


def main() -> None:
    sf_dir = os.path.abspath(sys.argv[1]) if len(sys.argv) > 1 else (
        "/root/testdata/sf0.1"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    compact_every = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    gate = bench._wait_for_idle(
        threshold=float(os.environ.get("SPARK_GRAFT_IDLE_LOAD", "2")),
        timeout_sec=float(os.environ.get("SPARK_GRAFT_IDLE_TIMEOUT", "420")),
    )
    spark = get_spark("streaminglens-compaction-probe")
    spark.sparkContext.setLogLevel("ERROR")
    env = bench._env_probe()
    env["idle_gate"] = gate

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    lo, hi, n_docs = docs.agg(
        F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1))
    ).first()
    width = (int(hi) - int(lo)) // n_batches + 1

    # pass order is a confound (the second pass inherits a warm JVM and
    # page cache); --swap runs OFF first so a pair of probes covers both
    # orderings
    swap = "--swap" in sys.argv
    cadences = [0, compact_every] if swap else [compact_every, 0]
    runs = {
        ce: _run_pass(spark, docs, lo, width, n_batches, ce)
        for ce in cadences
    }
    env["load1_after"] = round(os.getloadavg()[0], 2)
    out = {
        "metric": "loader_compaction_probe",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_docs": int(n_docs),
        "n_batches": n_batches,
        "pass_order": "off_first" if swap else "on_first",
        "compaction_on": runs[compact_every],
        "compaction_off": runs[0],
        "env": env,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
