"""Status-REST-API telemetry provider: the no-py4j fallback for live mode.

The primary live bridge (``streaming/scheduler.py``) implements a real
SparkListener through the py4j callback server.  Where that server cannot
run (e.g. Spark Connect clients, locked-down gateways), this module polls
the public monitoring REST API (``/api/v1/applications/...`` -- the same
data the reference's listener consumes, published at
https://spark.apache.org/docs/latest/monitoring.html) and materializes the
same telemetry tables.

Honest degradations vs the listener bridge (both documented here and in
COVERAGE.md):

- the REST ``StageData`` carries no parent-stage ids, so every stage is a
  root -> per-job critical path degrades to the max single-stage weight
  (still a lower bound on the DAG longest path);
- no ``spark.sql.execution.id`` -> A5 exec groups degrade to per-job
  singleton groups (islanding still runs on real spans).

Requires ``spark.ui.enabled=true`` (the API is served by the UI).
"""

from __future__ import annotations

from datetime import datetime, timezone

from .scheduler import JOBS_SCHEMA, parse_batch_description  # noqa: F401


def _iso_api_ms(ts: str | None) -> int | None:
    """REST timestamps are 'yyyy-MM-ddTHH:mm:ss.SSSGMT'."""
    if not ts:
        return None
    dt = datetime.strptime(ts.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").replace(
        tzinfo=timezone.utc
    )
    return int(dt.timestamp() * 1000)


def rows_from_api(
    jobs_raw: list[dict],
    stages_raw: list[dict],
    execs_raw: list[dict],
    tasks_by_stage: dict[int, list[dict]] | None = None,
) -> tuple[list, list, list, list]:
    """Pure translation REST JSON -> the four telemetry row lists (same
    shapes as ``SchedulerCapture.snapshot_rows``); unit-testable without a
    cluster.  Only jobs with a parseable streaming batch description and a
    completion time are kept, mirroring the listener bridge."""
    jobs, stage_job = [], {}
    # the REST /jobs endpoint returns newest-first; iterate oldest-first so
    # the stage->job setdefault matches the listener bridge's chronological
    # first-wins for stages shared across jobs (S2)
    for j in sorted(jobs_raw, key=lambda j: j.get("jobId", 0)):
        parsed = parse_batch_description(j.get("description"))
        end = _iso_api_ms(j.get("completionTime"))
        if parsed is None or end is None:
            continue
        qid, _run, bid = parsed
        jid = int(j["jobId"])
        for sid in j.get("stageIds", []):
            stage_job.setdefault(int(sid), jid)  # S2 first-wins
        jobs.append(
            (qid, bid, jid, None, _iso_api_ms(j.get("submissionTime")), end,
             j.get("description"))
        )
    stages, tasks = [], []
    for s in stages_raw:
        sid = int(s["stageId"])
        jid = stage_job.get(sid)
        start = _iso_api_ms(s.get("submissionTime") or s.get("firstTaskLaunchedTime"))
        end = _iso_api_ms(s.get("completionTime"))
        if jid is None or start is None or end is None:
            continue
        # REST StageData has no parentIds: every stage is a root (see module
        # docstring for the critical-path consequence)
        stages.append((sid, jid, [], int(s.get("numTasks", 0)), start, end))
        for t in (tasks_by_stage or {}).get(sid, []):
            launch = _iso_api_ms(t.get("launchTime"))
            dur = t.get("duration")
            if launch is None or dur is None:
                continue
            tasks.append(
                (int(t["taskId"]), sid, jid, str(t.get("executorId", "")),
                 launch, launch + int(dur), int(dur),
                 t.get("status") not in ("SUCCESS", None))
            )
    executors = []
    for e in execs_raw:
        executors.append(
            (
                str(e["id"]),
                str(e.get("hostPort", ":")).rsplit(":", 1)[0],
                int(e.get("totalCores", 0)),
                _iso_api_ms(e.get("addTime")) or 0,
                _iso_api_ms(e.get("removeTime")),
            )
        )
    return jobs, stages, tasks, executors


class StatusApiPoller:
    """Poll the monitoring REST API for the telemetry tables.  Task lists
    are fetched once per newly-completed stage, and the cache keeps only the
    newest ``max_cached_stages`` stages (control-plane state must stay
    bounded for app-lifetime polling, like the listener bridge's A18
    purge)."""

    def __init__(
        self, spark, base_url: str | None = None, max_cached_stages: int = 500
    ):
        self.max_cached_stages = max_cached_stages
        sc = spark.sparkContext
        self.base = base_url or sc.uiWebUrl
        if not self.base:
            raise RuntimeError(
                "Spark UI is disabled (no uiWebUrl); the status-API provider "
                "needs spark.ui.enabled=true -- or use the SparkListener "
                "bridge (streaming/scheduler.py)"
            )
        self.app_id = sc.applicationId
        self._task_cache: dict[int, list[dict]] = {}

    def _get(self, path: str):
        import json
        import urllib.request

        url = f"{self.base}/api/v1/applications/{self.app_id}{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read().decode("utf-8"))

    def poll(self) -> tuple[list, list, list, list]:
        jobs_raw = self._get("/jobs")
        stages_raw = self._get("/stages?status=complete")
        execs_raw = self._get("/allexecutors")
        for s in stages_raw:
            sid = int(s["stageId"])
            if sid not in self._task_cache:
                try:
                    self._task_cache[sid] = self._get(
                        f"/stages/{sid}/{int(s.get('attemptId', 0))}/taskList?length=10000"
                    )
                except Exception:
                    self._task_cache[sid] = []
        if len(self._task_cache) > self.max_cached_stages:
            for sid in sorted(self._task_cache)[: -self.max_cached_stages]:
                del self._task_cache[sid]
        return rows_from_api(jobs_raw, stages_raw, execs_raw, self._task_cache)


def status_api_telemetry_provider(spark, poller: StatusApiPoller):
    """A ``telemetry_provider`` for ``LiveAnalyzer`` backed by the REST API
    (same contract as ``scheduler_telemetry_provider``)."""
    from ..telemetry import Telemetry
    from .scheduler import EXECUTORS_SCHEMA, STAGES_SCHEMA, TASKS_SCHEMA

    def provide(progress):
        jobs, stages, tasks, executors = poller.poll()
        return Telemetry(
            progress=progress,
            jobs=spark.createDataFrame(jobs, JOBS_SCHEMA),
            stages=spark.createDataFrame(stages, STAGES_SCHEMA),
            tasks=spark.createDataFrame(tasks, TASKS_SCHEMA),
            executors=spark.createDataFrame(executors, EXECUTORS_SCHEMA),
            sla_config=spark.createDataFrame([], "query_key string, sla_ms bigint"),
        )

    return provide
