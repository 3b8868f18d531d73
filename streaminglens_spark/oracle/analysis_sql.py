"""DuckDB CTEs mirroring the analysis operators (A1-A24) over the telemetry
prelude.  Appended to ``prelude.PRELUDE``; unreferenced CTEs are pruned by
DuckDB's optimizer, so every oracle query can share this one text."""

from .prelude import PRELUDE

ANALYSIS = """
, bounds AS (
    SELECT query_id, batch_id,
           (num_input_rows != 0 AND processed_rps != 0) AS valid,
           CAST(CASE WHEN num_input_rows != 0 AND processed_rps != 0
                THEN ts_ms ELSE 0 END AS BIGINT) AS start_ms,
           CAST(CASE WHEN num_input_rows != 0 AND processed_rps != 0
                THEN CAST(trunc(ts_ms + (CAST(num_input_rows AS DOUBLE) / processed_rps) * 1000)
                          AS BIGINT)
                ELSE 0 END AS BIGINT) AS end_ms
    FROM progress
),
bounds2 AS (
    SELECT *, CAST(end_ms - start_ms AS BIGINT) AS batch_running_ms FROM bounds
),
ranges AS (
    SELECT query_id, batch_id, MIN(job_id) AS lo, MAX(job_id) AS hi
    FROM jobs GROUP BY 1, 2
),
sliced AS (
    SELECT r.query_id, r.batch_id, j.job_id, j.sql_exec_id, j.start_ms, j.end_ms
    FROM ranges r JOIN jobs j ON j.job_id BETWEEN r.lo AND r.hi
),
grouped AS (
    SELECT *,
           CASE WHEN sql_exec_id IS NOT NULL
                THEN 'exec-' || CAST(sql_exec_id AS VARCHAR)
                ELSE 'job-' || CAST(job_id AS VARCHAR) END AS group_key
    FROM sliced
),
islanded AS (
    SELECT query_id, batch_id, job_id, sql_exec_id, start_ms, end_ms, group_key,
           CAST(SUM(CASE WHEN prev_end < start_ms THEN 1 ELSE 0 END) OVER (
                PARTITION BY query_id, batch_id, group_key
                ORDER BY start_ms, job_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_id
    FROM (
        SELECT *, lag(end_ms) OVER (
            PARTITION BY query_id, batch_id, group_key
            ORDER BY start_ms, job_id) AS prev_end
        FROM grouped
    )
),
walltime AS (
    SELECT query_id, batch_id, CAST(SUM(island_ms) AS BIGINT) AS job_walltime_ms
    FROM (
        SELECT query_id, batch_id, group_key, island_id,
               MAX(end_ms) - MIN(start_ms) AS island_ms
        FROM islanded GROUP BY 1, 2, 3, 4
    ) GROUP BY 1, 2
),
stage_w AS (
    SELECT s.job_id, s.stage_id, s.parent_ids, CAST(COALESCE(w.w, 0) AS BIGINT) AS w
    FROM stages s
    LEFT JOIN (SELECT stage_id, MAX(duration_ms) AS w FROM tasks GROUP BY 1) w
    USING (stage_id)
),
cp_start AS (SELECT job_id, MAX(stage_id) AS max_stage FROM stage_w GROUP BY 1),
cp_paths AS (
    SELECT n.job_id, n.stage_id, n.parent_ids, n.w AS cum
    FROM stage_w n JOIN cp_start s ON n.job_id = s.job_id AND n.stage_id = s.max_stage
    UNION ALL
    SELECT p.job_id, n.stage_id, n.parent_ids, p.cum + n.w
    FROM cp_paths p
    CROSS JOIN UNNEST(p.parent_ids) AS t(pid)
    JOIN stage_w n ON n.job_id = p.job_id AND n.stage_id = t.pid
),
crit_job AS (
    SELECT job_id, CAST(MAX(cum) AS BIGINT) AS critical_ms
    FROM cp_paths WHERE len(parent_ids) = 0 GROUP BY 1
),
cp_batch AS (
    SELECT query_id, batch_id, CAST(SUM(mx) AS BIGINT) AS critical_path_ms
    FROM (
        SELECT i.query_id, i.batch_id, i.group_key, i.island_id,
               MAX(COALESCE(c.critical_ms, 0)) AS mx
        FROM islanded i LEFT JOIN crit_job c USING (job_id)
        GROUP BY 1, 2, 3, 4
    ) GROUP BY 1, 2
),
crit AS (
    SELECT b.query_id, b.batch_id, b.batch_running_ms,
           CAST(b.batch_running_ms - COALESCE(w.job_walltime_ms, 0)
                + COALESCE(cp.critical_path_ms, 0) AS BIGINT) AS critical_ms
    FROM bounds2 b
    LEFT JOIN walltime w USING (query_id, batch_id)
    LEFT JOIN cp_batch cp USING (query_id, batch_id)
    WHERE b.valid
),
sla AS (
    SELECT query_id, CAST(COALESCE(sc.sla_ms, 120000) AS BIGINT) AS sla_ms
    FROM (SELECT DISTINCT query_id, COALESCE(query_name, query_id) AS query_key
          FROM progress) q
    LEFT JOIN sla_config sc USING (query_key)
),
classified AS (
    SELECT c.query_id, c.batch_id, s.sla_ms, c.batch_running_ms, c.critical_ms,
           CAST(CASE
               WHEN c.batch_running_ms <= s.sla_ms * 0.3 THEN 1
               WHEN c.batch_running_ms <= s.sla_ms * 0.7 THEN 2
               WHEN c.critical_ms <= s.sla_ms * 0.7 THEN 3
               ELSE 4 END AS INT) AS state_id
    FROM crit c JOIN sla s USING (query_id)
),
results AS (
    SELECT query_id, batch_id, CAST(0 AS BIGINT) AS analysis_ms, sla_ms,
           batch_running_ms, critical_ms, state_id,
           CASE state_id WHEN 1 THEN 'OVERPROVISIONED' WHEN 2 THEN 'OPTIMUM'
                WHEN 3 THEN 'UNDERPROVISIONED' ELSE 'UNHEALTHY' END AS state
    FROM classified
    UNION ALL
    SELECT b.query_id, b.batch_id, CAST(0 AS BIGINT), s.sla_ms,
           CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS INT), 'NONEWBATCHES'
    FROM bounds2 b JOIN sla s USING (query_id) WHERE NOT b.valid
),
job_execs AS (SELECT DISTINCT job_id, executor_id FROM tasks),
batch_execs AS (
    SELECT DISTINCT s.query_id, s.batch_id, je.executor_id
    FROM sliced s JOIN job_execs je USING (job_id)
),
batch_execs_full AS (
    SELECT be.query_id, be.batch_id, be.executor_id, e.cores, e.start_ms, e.end_ms
    FROM batch_execs be JOIN executors e USING (executor_id)
),
conc_events AS (
    SELECT be.query_id, be.batch_id, be.start_ms AS t, 1 AS delta
    FROM batch_execs_full be
    UNION ALL
    SELECT be.query_id, be.batch_id, COALESCE(be.end_ms, b.end_ms) AS t, -1 AS delta
    FROM batch_execs_full be JOIN bounds2 b USING (query_id, batch_id)
),
conc AS (
    SELECT query_id, batch_id,
           CAST(GREATEST(MAX(running), 1) AS BIGINT) AS max_concurrent
    FROM (
        SELECT query_id, batch_id,
               SUM(delta) OVER (PARTITION BY query_id, batch_id
                                ORDER BY t, delta DESC ROWS UNBOUNDED PRECEDING) AS running
        FROM conc_events
    ) GROUP BY 1, 2
),
cores AS (
    SELECT b.query_id, b.batch_id, CAST(COALESCE(c.cores, 1) AS BIGINT) AS cores
    FROM bounds2 b
    LEFT JOIN (
        SELECT query_id, batch_id, cores FROM (
            SELECT query_id, batch_id, cores,
                   row_number() OVER (PARTITION BY query_id, batch_id
                                      ORDER BY start_ms DESC, executor_id DESC) AS rn
            FROM batch_execs_full
        ) WHERE rn = 1
    ) c USING (query_id, batch_id)
    WHERE b.valid
),
topk AS (
    SELECT query_id, batch_id, analysis_ms, sla_ms, batch_running_ms,
           critical_ms, state_id, state
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY batch_id DESC) AS _rn
        FROM results
    ) WHERE _rn <= 30
),
disc_eligible AS (
    SELECT query_id, state_id,
           row_number() OVER (PARTITION BY query_id ORDER BY batch_id) AS rn,
           COUNT(*) OVER (PARTITION BY query_id) AS n
    FROM topk WHERE state_id != 0
),
disc0 AS (
    SELECT query_id,
           list_reduce(list(state_id * pow(0.95, n - rn + 1) ORDER BY rn),
                       (a, b) -> a + b)
           / list_reduce(list(pow(0.95, n - rn + 1) ORDER BY rn), (a, b) -> a + b)
               AS v
    FROM disc_eligible GROUP BY query_id
),
disc AS (
    SELECT q.query_id, round(COALESCE(d.v, 0.0), 6) AS aggregated_state
    FROM (SELECT DISTINCT query_id FROM topk) q LEFT JOIN disc0 d USING (query_id)
),
latest AS (
    SELECT query_id, query_name, run_id, sources FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY batch_id DESC) AS rn
        FROM progress
    ) WHERE rn = 1
),
src_recos AS (
    SELECT query_id, 'OVERPROVISIONED' AS for_state, source,
           CASE WHEN source LIKE '%Kafka%'
                THEN 'Increase maxOffsetsPerTrigger to ingest more data through Kafka Source<br>'
                WHEN source LIKE '%File%'
                THEN 'Increase maxFilesPerTrigger to ingest more data through File Source<br>'
                ELSE 'Tune source configurations to ingest more data<br>' END AS recommendation
    FROM (SELECT query_id, UNNEST(sources) AS source FROM latest)
    UNION ALL
    SELECT query_id, 'UNHEALTHY', source,
           CASE WHEN source LIKE '%Kafka%'
                THEN 'Increase kafka partitions to ingest more data in parallel<br>'
                WHEN source LIKE '%Kinesis%'
                THEN 'Increase number of kinesis shards to ingest more data in parallel<br>'
                ELSE 'Tune source configurations to increase parallelism<br>' END
    FROM (SELECT query_id, UNNEST(sources) AS source FROM latest)
),
buckets AS (
    SELECT * FROM (
    SELECT d.query_id, d.aggregated_state,
           CASE WHEN v = 0.0 THEN 'NO NEW BATCHES'
                WHEN v >= 1 AND v <= 1.5 THEN 'NEEDS ATTENTION'
                WHEN v > 1.5 AND v <= 2.5 THEN 'GOOD'
                WHEN v > 2.5 AND v <= 3.5 THEN 'NEEDS ATTENTION'
                WHEN v > 3.5 THEN 'AT RISK' END AS state,
           CASE WHEN v = 0.0 THEN 'Streaming Query State: NO NEW BATCHES<br>'
                WHEN v >= 1 AND v <= 1.5 THEN
                    'Streaming Query State: OVERPROVISIONED<br>Recommendations:<br>> '
                    || list_reduce(list_prepend('', list_transform(l.sources, s ->
                         CASE WHEN s LIKE '%Kafka%'
                              THEN 'Increase maxOffsetsPerTrigger to ingest more data through Kafka Source<br>'
                              WHEN s LIKE '%File%'
                              THEN 'Increase maxFilesPerTrigger to ingest more data through File Source<br>'
                              ELSE 'Tune source configurations to ingest more data<br>' END)),
                       (a, b) -> a || b)
                    || '> Decrease the value of trigger Interval to process latest data<br>'
                    || '> You can decrease the number of executors if more than one to reduce cost<br>'
                WHEN v > 1.5 AND v <= 2.5 THEN
                    'Streaming Query State: OPTIMUM<br>Recommendations:<br>'
                    || 'Streaming Pipeline doing Okay. No Recommendations<br>'
                WHEN v > 2.5 AND v <= 3.5 THEN
                    'Streaming Query State: UNDERPROVISIONED<br>Recommendations:<br>'
                    || 'Scale up to ensure your pipeline doesn''t fall behind<br>'
                WHEN v > 3.5 THEN
                    'Streaming Query State: UNHEALTHY<br>Recommendations:<br>> '
                    || list_reduce(list_prepend('', list_transform(l.sources, s ->
                         CASE WHEN s LIKE '%Kafka%'
                              THEN 'Increase kafka partitions to ingest more data in parallel<br>'
                              WHEN s LIKE '%Kinesis%'
                              THEN 'Increase number of kinesis shards to ingest more data in parallel<br>'
                              ELSE 'Tune source configurations to increase parallelism<br>' END)),
                       (a, b) -> a || b)
                    || '> Use more efficient nodes<br>'
                    || '> Increase shuffle partitions if query has aggregations<br>'
           END AS recommendation
    FROM (SELECT query_id, aggregated_state, aggregated_state AS v FROM disc) d
    JOIN latest l USING (query_id)
    ) WHERE state IS NOT NULL
),
event_json AS (
    SELECT b.query_id,
           '{"eventId":0,"name":'
           || CASE WHEN l.query_name IS NOT NULL THEN '"' || l.query_name || '"'
                   ELSE 'null' END
           || ',"runId":"' || l.run_id
           || '","eventTimeMillis":' || CAST(t.event_time_ms AS VARCHAR)
           || ',"state":"' || b.state
           || '","displayText":"' || b.recommendation || '"}' AS event_json
    FROM buckets b
    JOIN latest l USING (query_id)
    JOIN (SELECT query_id, MAX(ts_ms) AS event_time_ms FROM progress GROUP BY 1) t
    USING (query_id)
),
last_result AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY batch_id DESC) AS rn
        FROM results
    ) WHERE rn = 1
),
gauges AS (
    SELECT 'spark.streaming.' || COALESCE(p.query_name, l.query_id) AS source_name,
           g.gauge,
           CAST(CASE g.gauge
               WHEN 'expectedMicroBatchSLAMillis' THEN l.sla_ms
               WHEN 'batchRunningTimeMillis' THEN l.batch_running_ms
               WHEN 'criticalTimeMillis' THEN l.critical_ms
               WHEN 'streamingQueryState' THEN l.state_id
               ELSE l.analysis_ms END AS BIGINT) AS value
    FROM last_result l
    LEFT JOIN (SELECT DISTINCT query_id, query_name FROM progress) p USING (query_id)
    CROSS JOIN (SELECT UNNEST(['expectedMicroBatchSLAMillis', 'batchRunningTimeMillis',
                               'criticalTimeMillis', 'streamingQueryState',
                               'analysisTimeMillis']) AS gauge) g
),
pseq AS (
    SELECT query_id, batch_id,
           (num_input_rows != 0 AND processed_rps != 0) AS valid,
           num_input_rows,
           row_number() OVER (PARTITION BY query_id ORDER BY batch_id) AS rn
    FROM progress
),
gate AS (
    SELECT query_id, batch_id, rn, valid,
           (batch_id - (-1) >= 3) AS passes,
           CASE WHEN batch_id - (-1) >= 3 AND valid THEN batch_id ELSE -1 END AS last_an
    FROM pseq WHERE rn = 1
    UNION ALL
    SELECT s.query_id, s.batch_id, s.rn, s.valid,
           (s.batch_id - g.last_an >= 3),
           CASE WHEN s.batch_id - g.last_an >= 3 AND s.valid
                THEN s.batch_id ELSE g.last_an END
    FROM gate g JOIN pseq s ON s.query_id = g.query_id AND s.rn = g.rn + 1
),
purge AS (
    SELECT query_id, batch_id, rn, num_input_rows,
           (num_input_rows != 0 AND batch_id - (-1) >= 10) AS purged,
           CASE WHEN num_input_rows != 0 AND batch_id - (-1) >= 10
                THEN batch_id ELSE -1 END AS last_p
    FROM pseq WHERE rn = 1
    UNION ALL
    SELECT s.query_id, s.batch_id, s.rn, s.num_input_rows,
           (s.num_input_rows != 0 AND s.batch_id - p.last_p >= 10),
           CASE WHEN s.num_input_rows != 0 AND s.batch_id - p.last_p >= 10
                THEN s.batch_id ELSE p.last_p END
    FROM purge p JOIN pseq s ON s.query_id = p.query_id AND s.rn = p.rn + 1
)
"""


def oracle_analysis(final_select: str) -> str:
    return PRELUDE + ANALYSIS + final_select
