"""Status-REST-API provider tests: pure JSON translation against canned
payloads, and a subprocess integration test against a real UI-enabled
session (the shared test session runs with the UI off)."""

from __future__ import annotations

import subprocess
import sys
import textwrap

from streaminglens_spark.streaming.statusapi import _iso_api_ms, rows_from_api

DESC = "myq\nid = 0000-01\nrunId = rrrr-01\nbatch = 7"


def test_rows_from_api_translation():
    jobs_raw = [
        {  # tracked streaming job
            "jobId": 3, "description": DESC, "stageIds": [10, 11],
            "submissionTime": "2026-01-01T00:00:00.100GMT",
            "completionTime": "2026-01-01T00:00:02.600GMT",
        },
        {  # non-streaming job: dropped
            "jobId": 4, "description": "collect at x.py:1", "stageIds": [12],
            "submissionTime": "2026-01-01T00:00:00.000GMT",
            "completionTime": "2026-01-01T00:00:01.000GMT",
        },
        {  # still running: dropped
            "jobId": 5, "description": DESC, "stageIds": [13],
            "submissionTime": "2026-01-01T00:00:03.000GMT",
        },
    ]
    stages_raw = [
        {"stageId": 10, "numTasks": 2,
         "submissionTime": "2026-01-01T00:00:00.200GMT",
         "completionTime": "2026-01-01T00:00:01.200GMT"},
        {"stageId": 12, "numTasks": 1,  # belongs to a dropped job
         "submissionTime": "2026-01-01T00:00:00.000GMT",
         "completionTime": "2026-01-01T00:00:00.500GMT"},
    ]
    execs_raw = [
        {"id": "driver", "hostPort": "h1:4040", "totalCores": 8,
         "addTime": "2026-01-01T00:00:00.000GMT"},
    ]
    tasks = {10: [
        {"taskId": 100, "launchTime": "2026-01-01T00:00:00.300GMT",
         "duration": 400, "executorId": "driver", "status": "SUCCESS"},
        {"taskId": 101, "launchTime": "2026-01-01T00:00:00.300GMT",
         "duration": 700, "executorId": "driver", "status": "FAILED"},
    ]}
    jobs, stages, task_rows, executors = rows_from_api(
        jobs_raw, stages_raw, execs_raw, tasks
    )
    assert jobs == [
        ("0000-01", 7, 3, None,
         _iso_api_ms("2026-01-01T00:00:00.100GMT"),
         _iso_api_ms("2026-01-01T00:00:02.600GMT"), DESC)
    ]
    assert [s[0] for s in stages] == [10]  # stage 12's job was dropped
    assert stages[0][1] == 3 and stages[0][2] == []  # no parents via REST
    assert len(task_rows) == 2
    assert task_rows[0][:4] == (100, 10, 3, "driver")
    assert task_rows[0][6] == 400 and task_rows[0][7] is False
    assert task_rows[1][7] is True  # FAILED -> failed=true
    assert executors == [("driver", "h1", 8, _iso_api_ms("2026-01-01T00:00:00.000GMT"), None)]


def test_status_api_end_to_end_subprocess():
    """Real REST round-trip: a UI-enabled session runs jobs under a
    streaming-format description; the poller reads jobs/stages/tasks/
    executors back through HTTP."""
    script = textwrap.dedent(
        """
        import sys
        sys.path.insert(0, "/root/repo")
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .appName("statusapi-it")
                 .config("spark.ui.enabled", "true")
                 .config("spark.ui.port", "0")
                 .getOrCreate())
        sc = spark.sparkContext
        sc.setJobDescription("itq\\nid = q-it\\nrunId = r-it\\nbatch = 0")
        spark.range(100000).selectExpr("id % 7 k").groupBy("k").count().collect()
        sc.setJobDescription("itq\\nid = q-it\\nrunId = r-it\\nbatch = 1")
        spark.range(50000).selectExpr("id % 3 k").groupBy("k").count().collect()
        sc.setJobDescription(None)

        from streaminglens_spark.streaming.statusapi import StatusApiPoller
        p = StatusApiPoller(spark)
        jobs, stages, tasks, executors = p.poll()
        qids = {j[0] for j in jobs}
        bids = sorted({j[1] for j in jobs})
        assert qids == {"q-it"}, jobs
        assert bids == [0, 1], jobs
        assert stages and tasks, (len(stages), len(tasks))
        tracked = {j[2] for j in jobs}
        assert {t[2] for t in tasks} <= tracked
        assert any(e[0] == "driver" for e in executors), executors
        print("STATUSAPI_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300,
    )
    assert "STATUSAPI_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-3000:]


class _FakePoller:
    """StatusApiPoller with a scripted REST endpoint (no Spark, no HTTP)."""

    def __new__(cls, responses, **kw):
        from streaminglens_spark.streaming.statusapi import StatusApiPoller

        p = object.__new__(StatusApiPoller)
        p.max_cached_stages = kw.get("max_cached_stages", 500)
        p.task_page_size = kw.get("task_page_size", 2)
        p.max_task_pages = kw.get("max_task_pages", 200)
        p.base = "fake"
        p.app_id = "app"
        p._task_cache = {}
        p._fetched = set()
        p.calls = []

        def _get(path):
            p.calls.append(path)
            return responses(path)

        p._get = _get
        return p


def _task(i):
    return {"taskId": i, "launchTime": "2026-01-01T00:00:00.300GMT",
            "duration": 100 + i, "executorId": "driver", "status": "SUCCESS"}


def _stage_entry(sid, attempt=0):
    return {"stageId": sid, "attemptId": attempt, "numTasks": 5,
            "submissionTime": "2026-01-01T00:00:00.200GMT",
            "completionTime": "2026-01-01T00:00:01.200GMT"}


def _jobs_raw():
    return [{"jobId": 3, "description": DESC, "stageIds": [10],
             "submissionTime": "2026-01-01T00:00:00.100GMT",
             "completionTime": "2026-01-01T00:00:02.600GMT"}]


def test_poller_pages_task_list_until_short_page():
    """VERDICT r2 #3: a 5-task stage behind a 2-per-page endpoint is fully
    captured (3 pages), not silently cut at page one."""
    all_tasks = [_task(i) for i in range(5)]

    def responses(path):
        if path == "/jobs":
            return _jobs_raw()
        if path.startswith("/stages?"):
            return [_stage_entry(10)]
        if path == "/allexecutors":
            return []
        if path.startswith("/stages/10/0/taskList"):
            q = dict(kv.split("=") for kv in path.split("?")[1].split("&"))
            off, ln = int(q["offset"]), int(q["length"])
            return all_tasks[off:off + ln]
        raise AssertionError(path)

    p = _FakePoller(responses, task_page_size=2)
    jobs, stages, tasks, _ = p.poll()
    assert len(tasks) == 5, tasks
    assert sorted(t[0] for t in tasks) == [0, 1, 2, 3, 4]
    pages = [c for c in p.calls if "taskList" in c]
    assert len(pages) == 3  # 2 + 2 + 1 (short page terminates)

    # second poll: already fetched -> zero taskList calls
    p.calls.clear()
    p.poll()
    assert not any("taskList" in c for c in p.calls)


def test_poller_logs_forced_truncation(caplog):
    """No silent caps: when the max_task_pages safety valve trips, the drop
    is logged with the captured count."""
    import logging

    def responses(path):
        if path == "/jobs":
            return _jobs_raw()
        if path.startswith("/stages?"):
            return [_stage_entry(10)]
        if path == "/allexecutors":
            return []
        if "taskList" in path:
            q = dict(kv.split("=") for kv in path.split("?")[1].split("&"))
            off = int(q["offset"])
            return [_task(off), _task(off + 1)]  # never a short page
        raise AssertionError(path)

    p = _FakePoller(responses, task_page_size=2, max_task_pages=3)
    with caplog.at_level(logging.WARNING, logger="streaminglens_spark"):
        _, _, tasks, _ = p.poll()
    assert len(tasks) == 6  # 3 pages x 2 captured, tail dropped
    assert any("truncated at 6 tasks" in m for m in caplog.messages)


def test_poller_reconciles_stage_retries():
    """A stage retry (attempt 1) is fetched separately and wins over
    attempt 0 in both the stage span and the task rows."""

    def responses(path):
        if path == "/jobs":
            return _jobs_raw()
        if path.startswith("/stages?"):
            return [_stage_entry(10, 0), _stage_entry(10, 1)]
        if path == "/allexecutors":
            return []
        if path.startswith("/stages/10/0/taskList"):
            return [_task(0)]
        if path.startswith("/stages/10/1/taskList"):
            return [_task(100), _task(101)]  # the retry's tasks
        raise AssertionError(path)

    p = _FakePoller(responses, task_page_size=10)
    _, stages, tasks, _ = p.poll()
    assert len(stages) == 1  # one row per stage id, not per attempt
    assert sorted(t[0] for t in tasks) == [100, 101]  # latest attempt wins
    assert ("/stages/10/0/taskList?offset=0&length=10" in p.calls
            and "/stages/10/1/taskList?offset=0&length=10" in p.calls)


def test_poller_eviction_does_not_refetch(caplog):
    """ADVICE r2: evicted stages must NOT be re-fetched on every later poll
    (fetched markers survive payload eviction); the eviction is logged."""
    import logging

    def responses(path):
        if path == "/jobs":
            return _jobs_raw()
        if path.startswith("/stages?"):
            return [_stage_entry(sid) for sid in (10, 11, 12)]
        if path == "/allexecutors":
            return []
        if "taskList" in path:
            return [_task(int(path.split("/")[2]))]
        raise AssertionError(path)

    p = _FakePoller(responses, task_page_size=10, max_cached_stages=2)
    with caplog.at_level(logging.INFO, logger="streaminglens_spark"):
        p.poll()
    assert len(p._task_cache) == 2  # oldest payload evicted
    assert any("evicting 1 cached stage task lists" in m for m in caplog.messages)
    p.calls.clear()
    p.poll()  # stage 10 still listed complete, payload evicted
    assert not any("taskList" in c for c in p.calls), p.calls
