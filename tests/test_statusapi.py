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
