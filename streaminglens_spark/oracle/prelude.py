"""DuckDB oracle prelude: the same telemetry derivation as ``telemetry.py``,
expressed as DuckDB CTEs over the pre-registered ``events`` view.

Every oracle query in the registry is ``PRELUDE + <final select>``.  The
pytest suite asserts bit-exact equality of each CTE against the Spark-side
derivation (tests/test_derivation_parity.py), which is what makes the
downstream operator-vs-oracle hash checks meaningful.

Integer-only arithmetic everywhere; epoch millis as BIGINT.  Note DuckDB
``epoch_ms(ts)`` == Spark ``unix_millis(ts)`` (both truncate microseconds).
"""

PRELUDE = """
WITH RECURSIVE
batches AS (
    SELECT CAST(event_id // 100 AS BIGINT) AS batch_id,
           MIN(epoch_ms(ts)) AS base_ms,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
),
progress AS (
    SELECT
        '00000000-0000-0000-0000-00000000000' || CAST(batch_id % 2 AS VARCHAR) AS query_id,
        CASE WHEN batch_id % 2 = 0 THEN 'clickstream' END AS query_name,
        '11111111-1111-1111-1111-11111111111' || CAST(batch_id % 2 AS VARCHAR) AS run_id,
        batch_id,
        base_ms AS ts_ms,
        CAST(CASE WHEN batch_id % 7 = 3 THEN 0 ELSE n * (1 + batch_id % 4) END AS BIGINT)
            AS num_input_rows,
        CASE WHEN batch_id % 7 = 3 THEN 0.0
             ELSE CAST(50 + (batch_id % 10) * 25 AS DOUBLE) END AS processed_rps,
        [CASE batch_id % 4
            WHEN 0 THEN 'KafkaV2[Subscribe[topic-0]]'
            WHEN 1 THEN 'FileStreamSource[file:/data/in]'
            WHEN 2 THEN 'KinesisSource[stream-a]'
            ELSE 'MemoryStream[0]' END] AS sources,
        'ForeachBatchSink' AS sink
    FROM batches
),
jobs AS (
    SELECT
        '00000000-0000-0000-0000-00000000000' || CAST(b.batch_id % 2 AS VARCHAR) AS query_id,
        b.batch_id,
        CAST((b.batch_id // 2) * 8 + j.j * 2 + b.batch_id % 2 AS BIGINT) AS job_id,
        CAST(CASE
            WHEN j.j IN (0, 1) THEN b.batch_id * 10 + 1
            WHEN j.j = 2 THEN b.batch_id * 10 + (CASE WHEN b.batch_id % 5 = 0 THEN 1 ELSE 2 END)
        END AS BIGINT) AS sql_exec_id,
        CAST(b.base_ms + CASE j.j
            WHEN 0 THEN 0
            WHEN 1 THEN (CASE b.batch_id % 3 WHEN 0 THEN 500 WHEN 1 THEN 1000 ELSE 1600 END)
            WHEN 2 THEN 1200
            ELSE 2100 END AS BIGINT) AS start_ms,
        CAST(b.base_ms + CASE j.j
            WHEN 0 THEN (CASE WHEN b.batch_id % 5 = 0 THEN 2500 ELSE 1000 END)
            WHEN 1 THEN (CASE b.batch_id % 3 WHEN 0 THEN 500 WHEN 1 THEN 1000 ELSE 1600 END)
                        + (CASE WHEN b.batch_id % 5 = 0 THEN 400 ELSE 800 END)
            WHEN 2 THEN 2000
            ELSE 2900 END AS BIGINT) AS end_ms,
        CASE WHEN b.batch_id % 2 = 0
            THEN 'clickstream<br/>id = 00000000-0000-0000-0000-000000000000'
                 || '<br/>runId = 11111111-1111-1111-1111-111111111110'
                 || '<br/>batch = ' || CAST(b.batch_id AS VARCHAR)
            ELSE 'id = 00000000-0000-0000-0000-000000000001'
                 || '<br/>runId = 11111111-1111-1111-1111-111111111111'
                 || '<br/>batch = ' || CAST(b.batch_id AS VARCHAR)
        END AS description
    FROM batches b
    CROSS JOIN (SELECT UNNEST(range(0, 4)) AS j) j
),
stages AS (
    SELECT
        CAST(jb.job_id * 4 + k.k AS BIGINT) AS stage_id,
        jb.job_id,
        CASE k.k
            WHEN 0 THEN CAST([] AS BIGINT[])
            WHEN 1 THEN [jb.job_id * 4]
            WHEN 2 THEN [jb.job_id * 4]
            ELSE [jb.job_id * 4 + 1, jb.job_id * 4 + 2] END AS parent_ids,
        CAST(2 + k.k AS BIGINT) AS num_tasks,
        CAST(jb.start_ms + k.k * 200 AS BIGINT) AS start_ms,
        CAST(jb.start_ms + k.k * 200 + 180 AS BIGINT) AS end_ms
    FROM jobs jb
    CROSS JOIN (SELECT UNNEST(range(0, 4)) AS k) k
),
tasks AS (
    SELECT
        CAST(s.stage_id * 10 + t.t AS BIGINT) AS task_id,
        s.stage_id,
        s.job_id,
        'exec-' || CAST((s.job_id % 3) + (t.t % 2) AS VARCHAR) AS executor_id,
        CAST(s.start_ms + t.t * 10 AS BIGINT) AS launch_ms,
        CAST(s.start_ms + t.t * 10 + 100 + ((s.stage_id * 7 + t.t * 13) % 150) AS BIGINT)
            AS finish_ms,
        CAST(100 + ((s.stage_id * 7 + t.t * 13) % 150) AS BIGINT) AS duration_ms,
        ((s.stage_id + t.t) % 23 = 0) AS failed
    FROM stages s
    CROSS JOIN (SELECT UNNEST(range(0, 6)) AS t) t
    WHERE t.t < s.num_tasks
),
executors AS (
    SELECT
        'exec-' || CAST(i.i AS VARCHAR) AS executor_id,
        'host-' || CAST(i.i % 2 AS VARCHAR) AS host,
        CAST(2 + i.i % 3 AS BIGINT) AS cores,
        CAST(g.lo + i.i * 500 AS BIGINT) AS start_ms,
        CAST(CASE WHEN i.i = 3 THEN NULL ELSE g.hi + 5000 END AS BIGINT) AS end_ms
    FROM (SELECT MIN(epoch_ms(ts)) AS lo, MAX(epoch_ms(ts)) AS hi FROM events) g
    CROSS JOIN (SELECT UNNEST(range(0, 4)) AS i) i
),
sla_config AS (
    SELECT 'clickstream' AS query_key, CAST(4000 AS BIGINT) AS sla_ms
)
"""


def oracle(final_select: str) -> str:
    """Compose PRELUDE + a final select into one DuckDB query string."""
    return PRELUDE + final_select
