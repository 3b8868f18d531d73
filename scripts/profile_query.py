"""Per-stage attribution for one registry query (guide §1: measure first).

Runs <query> once against <sf_dir> with the noop sink in a session that
writes a Spark event log, then parses the log and prints every stage's
wall time, total task time, shuffle bytes and callsite -- the empirical
view the (disabled) UI would give.

Usage: python scripts/profile_query.py <sf_dir> <query> [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    evdir = tempfile.mkdtemp(prefix="spark-ev-")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from streaminglens_spark import registry

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.appName(f"profile-{name}")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JVM + python workers), not in the profiled window
    registry.q_batch_bounds(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def _wu(batches):
        yield from batches

    spark.range(100_000).mapInPandas(_wu, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()

    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.time()
    getattr(registry, name)(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    wall = time.time() - t0
    t_mark = t0  # stages submitted after this are the profiled query's
    spark.stop()

    stages = {}
    jobs = {}
    for p in Path(evdir).rglob("*"):
        if not p.is_file() or "appstatus" in p.name:
            continue
        if p.suffix in (".crc", ".zstd", ".lz4", ".snappy"):
            continue
        for line in p.open(errors="ignore"):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if not isinstance(ev, dict):
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub is None or comp is None:
                    continue
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except json.JSONDecodeError:
                            nm = ""
                        if nm and (not scopes or scopes[-1] != nm):
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "wall": (comp - sub) / 1000.0,
                    "sub": sub / 1000.0,
                    "tasks": si.get("Number of Tasks", 0),
                    "details": si.get("Details", "").split("\n")[0],
                    "scopes": scopes[:8],
                }
    # map stage -> owning job description
    stage_desc = {}
    for j in jobs.values():
        for s in j["stages"]:
            stage_desc.setdefault(s, j["desc"])
    prof = [
        (sid, st)
        for sid, st in stages.items()
        if st["sub"] >= t_mark - 1 and stage_desc.get(sid, "").startswith("profile:")
    ]
    prof.sort(key=lambda kv: -kv[1]["wall"])
    print(f"# {name}: wall={wall:.2f}s, {len(prof)} stages in profiled window")
    tot = sum(st["wall"] for _, st in prof)
    print(f"# sum of stage walls: {tot:.2f}s (overlap possible)")
    for sid, st in prof[:top_n]:
        print(
            f"{st['wall']:8.2f}s  stage={sid:4d} tasks={st['tasks']:4d}  "
            f"{' <- '.join(st['scopes'])[:140]}"
        )


if __name__ == "__main__":
    main()
