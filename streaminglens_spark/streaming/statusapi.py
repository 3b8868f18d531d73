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

import logging
from datetime import datetime, timezone

from .scheduler import JOBS_SCHEMA, parse_batch_description  # noqa: F401

logger = logging.getLogger("streaminglens_spark")


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
    # reconcile stage attempts: /stages returns one StageData per attempt;
    # the LATEST completed attempt's span (and its task list, keyed per
    # attempt by the poller) is the stage's record -- earlier failed
    # attempts would otherwise yield duplicate stage rows
    by_sid: dict[int, dict] = {}
    for s in stages_raw:
        sid = int(s["stageId"])
        prev = by_sid.get(sid)
        if prev is None or int(s.get("attemptId", 0)) > int(prev.get("attemptId", 0)):
            by_sid[sid] = s
    stages, tasks = [], []
    for sid in sorted(by_sid):
        s = by_sid[sid]
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
    """Poll the monitoring REST API for the telemetry tables.

    Task lists are fetched exactly once per (stage, attempt): the full list
    is PAGED with ``offset``/``length`` until a short page (r2 fetched a
    single ``length=10000`` page and silently dropped the tail), and
    fetched keys are tracked separately from the payload cache, so evicting
    a payload under ``max_cached_stages`` never triggers a re-fetch loop on
    later polls (the r2 eviction re-fetched every retained-but-evicted
    stage forever).  Evictions are logged; an evicted stage's tasks drop out
    of subsequent telemetry snapshots -- the same bounded-state tradeoff as
    the listener bridge's A18 purge.  Stage retries (attempt > 0) are
    fetched per attempt and reconciled latest-attempt-wins by
    ``rows_from_api``."""

    def __init__(
        self,
        spark,
        base_url: str | None = None,
        max_cached_stages: int = 500,
        task_page_size: int = 5000,
        max_task_pages: int = 200,
    ):
        self.max_cached_stages = max_cached_stages
        self.task_page_size = task_page_size
        self.max_task_pages = max_task_pages
        sc = spark.sparkContext
        self.base = base_url or sc.uiWebUrl
        if not self.base:
            raise RuntimeError(
                "Spark UI is disabled (no uiWebUrl); the status-API provider "
                "needs spark.ui.enabled=true -- or use the SparkListener "
                "bridge (streaming/scheduler.py)"
            )
        self.app_id = sc.applicationId
        self._task_cache: dict[tuple[int, int], list[dict]] = {}  # (sid, attempt)
        self._fetched: set[tuple[int, int]] = set()  # survives payload eviction

    def _get(self, path: str):
        import json
        import urllib.request

        url = f"{self.base}/api/v1/applications/{self.app_id}{path}"
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read().decode("utf-8"))

    def _fetch_tasks(self, sid: int, attempt: int) -> list[dict]:
        """Page the taskList endpoint until a short page; no silent caps --
        if the ``max_task_pages`` safety valve ever trips, the truncation is
        logged with the captured count."""
        out: list[dict] = []
        for _ in range(self.max_task_pages):
            page = self._get(
                f"/stages/{sid}/{attempt}/taskList"
                f"?offset={len(out)}&length={self.task_page_size}"
            )
            out.extend(page)
            if len(page) < self.task_page_size:
                return out
        logger.warning(
            "statusapi: taskList for stage %d.%d truncated at %d tasks "
            "(max_task_pages=%d); the tail is DROPPED from telemetry",
            sid, attempt, len(out), self.max_task_pages,
        )
        return out

    def poll(self) -> tuple[list, list, list, list]:
        jobs_raw = self._get("/jobs")
        stages_raw = self._get("/stages?status=complete")
        execs_raw = self._get("/allexecutors")
        for s in stages_raw:
            key = (int(s["stageId"]), int(s.get("attemptId", 0)))
            if key in self._fetched:
                continue
            self._fetched.add(key)
            try:
                self._task_cache[key] = self._fetch_tasks(*key)
            except Exception:
                self._task_cache[key] = []
        if len(self._task_cache) > self.max_cached_stages:
            drop = sorted(self._task_cache)[: -self.max_cached_stages]
            logger.info(
                "statusapi: evicting %d cached stage task lists "
                "(max_cached_stages=%d); their tasks leave the snapshot",
                len(drop), self.max_cached_stages,
            )
            for key in drop:
                del self._task_cache[key]
        # latest attempt wins per stage id (matches rows_from_api's stage
        # reconciliation); ascending key order makes later attempts overwrite
        tasks_by_stage: dict[int, list[dict]] = {}
        for sid, attempt in sorted(self._task_cache):
            tasks_by_stage[sid] = self._task_cache[(sid, attempt)]
        return rows_from_api(jobs_raw, stages_raw, execs_raw, tasks_by_stage)


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
