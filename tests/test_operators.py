"""Hand-computed golden tests for the quirk semantics (SURVEY §4.1) on tiny
in-memory fixtures -- independent of the telemetry derivation."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.operators.analysis import (
    batch_slice,
    exec_groups,
    islands,
    job_walltime,
)
from streaminglens_spark.operators.classify import classify
from streaminglens_spark.operators.concurrency import max_concurrency
from streaminglens_spark.operators.critical_path import critical_path_per_job

JOBS_SCHEMA = (
    "query_id string, batch_id bigint, job_id bigint, sql_exec_id bigint,"
    " start_ms bigint, end_ms bigint"
)


def _islands(spark, rows):
    df = spark.createDataFrame(rows, JOBS_SCHEMA)
    out = islands(exec_groups(df.withColumn("group_key", F.lit(None)).drop("group_key")))
    return {
        r["job_id"]: (r["group_key"], r["island_id"])
        for r in out.collect()
        if r["batch_id"] == 0 and r["query_id"] == "q"
    }


def test_islanding_uses_lag_not_cummax(spark):
    """Reference JobOverlapHelper.scala:91 compares the PREVIOUS job's end
    (last appended), not the running max: j0 covers j1 and j2 entirely, yet
    j2 still starts a new island because j1 (the previous job) ended before
    j2 started."""
    rows = [
        ("q", 0, 0, 1, 0, 2500),
        ("q", 0, 1, 1, 500, 900),
        ("q", 0, 2, 1, 1200, 2000),
    ]
    got = _islands(spark, rows)
    assert got[0][1] == 0 and got[1][1] == 0
    assert got[2][1] == 1  # cummax would keep it at 0


def test_islanding_touching_spans_stay(spark):
    """prev.end == cur.start is NOT a split (strict <)."""
    rows = [("q", 0, 0, 1, 0, 1000), ("q", 0, 1, 1, 1000, 1800)]
    got = _islands(spark, rows)
    assert got[0][1] == 0 and got[1][1] == 0


def test_islanding_start_time_tie_pinned(spark):
    """Exact start-time ties: the reference's ``sortWith(a.start < b.start)``
    is a stable sort over nondeterministic map-iteration order; the engine
    pins ``(start_ms, job_id)`` (SURVEY §4.1, ``analysis.py:90-93``).  With
    j2 and j5 both starting at 0, pinned order is j2 (end 2000) then j5
    (end 100), so j7 (start 500) splits against j5's end -- the opposite
    tie order (j5 first, j2 last) would keep j7 in island 0."""
    rows = [
        ("q", 0, 5, 1, 0, 100),
        ("q", 0, 2, 1, 0, 2000),
        ("q", 0, 7, 1, 500, 900),
    ]
    got = _islands(spark, rows)
    assert got[2][1] == 0
    assert got[5][1] == 0  # tie: j5 follows j2, prev end 2000 > 0 -> no split
    assert got[7][1] == 1  # prev is j5 (end 100) < 500 -> split


def test_null_exec_id_is_singleton_group(spark):
    rows = [("q", 0, 0, 1, 0, 1000), ("q", 0, 1, None, 0, 1000)]
    df = spark.createDataFrame(rows, JOBS_SCHEMA)
    got = {r["job_id"]: r["group_key"] for r in exec_groups(df).collect()}
    assert got[0] == "exec-1" and got[1] == "job-1"


def test_batch_slice_sweeps_by_range(spark):
    """A4 quirk (MicroBatchContext.scala:93-96): jobs of OTHER queries whose
    ids fall inside [min, max] of the batch's own jobs are swept in."""
    rows = [
        ("q0", 0, 0, 1, 0, 10),
        ("q0", 0, 4, 1, 0, 10),
        ("q1", 1, 2, 11, 0, 10),  # id 2 inside q0's [0, 4]
        ("q1", 1, 9, 11, 0, 10),
    ]
    df = spark.createDataFrame(rows, JOBS_SCHEMA)
    sliced = batch_slice(df)
    q0_jobs = sorted(
        r["job_id"] for r in sliced.collect() if r["query_id"] == "q0"
    )
    assert q0_jobs == [0, 2, 4]  # 2 swept in, 9 not


def test_job_walltime_sums_islands(spark):
    rows = [
        ("q", 0, 0, 1, 0, 1000),
        ("q", 0, 1, 1, 2000, 3500),  # disjoint -> second island
        ("q", 0, 2, None, 100, 700),  # singleton group
    ]
    df = spark.createDataFrame(rows, JOBS_SCHEMA)
    out = job_walltime(islands(exec_groups(df))).collect()
    assert out[0]["job_walltime_ms"] == 1000 + 1500 + 600


def test_critical_path_diamond(spark):
    """A8: longest path from max stage id through a diamond DAG; weight =
    max task duration per stage."""
    stages = spark.createDataFrame(
        [
            (0, 1, [], 1),
            (1, 1, [0], 1),
            (2, 1, [0], 1),
            (3, 1, [1, 2], 1),
        ],
        "stage_id bigint, job_id bigint, parent_ids array<bigint>, num_tasks bigint",
    )
    tasks = spark.createDataFrame(
        [
            (0, 0, 100), (1, 0, 150),   # s0 max=150
            (2, 1, 200),                 # s1
            (3, 2, 500),                 # s2 (heavier branch)
            (4, 3, 50),                  # s3
        ],
        "task_id bigint, stage_id bigint, duration_ms bigint",
    )
    out = critical_path_per_job(stages, tasks).collect()
    assert out[0]["critical_ms"] == 50 + 500 + 150


def test_classification_thresholds(spark):
    crit = spark.createDataFrame(
        [
            ("q", 0, 1000, 900),    # 1000 <= 1200 -> OVER
            ("q", 1, 1500, 900),    # (1200, 2800] -> OPTIMUM
            ("q", 2, 3000, 2000),   # brt > 2800, ct <= 2800 -> UNDER
            ("q", 3, 3000, 2900),   # both above -> UNHEALTHY
        ],
        "query_id string, batch_id bigint, batch_running_ms bigint, critical_ms bigint",
    )
    sla = spark.createDataFrame([("q", 4000)], "query_id string, sla_ms bigint")
    got = {r["batch_id"]: r["state"] for r in classify(crit, sla).collect()}
    assert got == {
        0: "OVERPROVISIONED",
        1: "OPTIMUM",
        2: "UNDERPROVISIONED",
        3: "UNHEALTHY",
    }


def test_max_concurrency_tie_break(spark):
    """A11: on a timestamp tie, +1 sorts before -1 (MicroBatchContext:72-77),
    so back-to-back spans [0,5],[5,9] count as 2 concurrent at t=5."""
    be = spark.createDataFrame(
        [("q", 0, "e1", 2, 0, 5), ("q", 0, "e2", 2, 5, 9)],
        "query_id string, batch_id bigint, executor_id string, cores bigint,"
        " start_ms bigint, end_ms bigint",
    )
    bounds = spark.createDataFrame(
        [("q", 0, True, 0, 100, 100)],
        "query_id string, batch_id bigint, valid boolean, start_ms bigint,"
        " end_ms bigint, batch_running_ms bigint",
    )
    out = max_concurrency(be, bounds).collect()
    assert out[0]["max_concurrent"] == 2


def test_islands_random_fixtures_match_reference_model(spark):
    """Model-based check on 200 random batches: the DataFrame islanding
    equals a direct Python transcription of the reference algorithm
    (sort by start with (start, job_id) tie pin; split when the PREVIOUS
    job's end < current start, strict; JobOverlapHelper.scala:83-106)."""
    import random

    rng = random.Random(42)
    rows = []
    for batch in range(200):
        n = rng.randint(1, 8)
        for j in range(n):
            start = rng.randint(0, 50) * 100  # coarse grid -> frequent ties
            end = start + rng.randint(0, 30) * 100
            rows.append(("q", batch, batch * 100 + j, 1, start, end))

    def model(jobs):  # the reference's sublist builder
        out = {}
        ordered = sorted(jobs, key=lambda r: (r[4], r[2]))
        island = 0
        for i, r in enumerate(ordered):
            if i > 0 and ordered[i - 1][5] < r[4]:  # prev END (lag), strict <
                island += 1
            out[r[2]] = island
        return out

    df = spark.createDataFrame(rows, JOBS_SCHEMA)
    got_rows = islands(exec_groups(df)).collect()
    got = {}
    for r in got_rows:
        got.setdefault(r["batch_id"], {})[r["job_id"]] = r["island_id"]

    by_batch = {}
    for r in rows:
        by_batch.setdefault(r[1], []).append(r)
    for batch, jobs in by_batch.items():
        assert got[batch] == model(jobs), f"batch {batch}"


def test_max_concurrency_random_fixtures_match_reference_model(spark):
    """Model-based check on 150 random batches: the windowed sweep equals a
    direct transcription of the reference (events sorted by time with +1
    before -1 on ties, open ends corrected to batch end, floor 1;
    MicroBatchContext.scala:35-78)."""
    import random

    rng = random.Random(7)
    exec_rows, bound_rows, expected = [], [], {}
    for batch in range(150):
        n = rng.randint(0, 6)
        batch_end = 10_000
        spans = []
        for i in range(n):
            s = rng.randint(0, 40) * 100
            e = None if rng.random() < 0.3 else s + rng.randint(0, 40) * 100
            spans.append((s, e))
            exec_rows.append(
                ("q", batch, f"e{i}", "h", 2, s, e)
            )
        bound_rows.append(("q", batch, True, 0, batch_end, batch_end))
        events = []
        for s, e in spans:
            events.append((s, 1))
            events.append((e if e is not None else batch_end, -1))
        events.sort(key=lambda t: (t[0], -t[1]))  # +1 before -1 on ties
        run = best = 0
        for _, d in events:
            run += d
            best = max(best, run)
        expected[batch] = max(best, 1)

    be = spark.createDataFrame(
        exec_rows,
        "query_id string, batch_id bigint, executor_id string, host string,"
        " cores bigint, start_ms bigint, end_ms bigint",
    )
    bounds = spark.createDataFrame(
        bound_rows,
        "query_id string, batch_id bigint, valid boolean, start_ms bigint,"
        " end_ms bigint, batch_running_ms bigint",
    )
    got = {
        r["batch_id"]: r["max_concurrent"]
        for r in max_concurrency(be, bounds).collect()
    }
    for batch, want in expected.items():
        # batches with no executors produce no row; the pipeline's floor is 1
        assert got.get(batch, 1) == want, f"batch {batch}"


def test_embed_dedup_skew_guard_sub_blocks_dominant_label(spark):
    """Skew guard: a label holding ~95% of the corpus is sub-blocked by LSH
    bucket, bounding sum(block^2); identical vectors still pair up (same
    bucket by construction) and the blocked result is a subset of the exact
    within-label result."""
    from streaminglens_spark.functions.similarity import embed_dedup_pairs, lsh_bucket

    dims = 8
    rows = []
    # dominant label: 190 one-hot vectors over 8 directions -> same-direction
    # pairs have cosine 1.0 and identical LSH buckets
    for i in range(190):
        v = [0.0] * dims
        v[i % dims] = 1.0 + (i // dims) * 0.001  # same direction, distinct ids
        rows.append((i, "big", v))
    for i in range(190, 200):
        v = [0.0] * dims
        v[i % dims] = 1.0
        rows.append((i, "small", v))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>"
    )

    blocked = embed_dedup_pairs(emb, threshold=0.99, max_block=50).collect()
    exact = embed_dedup_pairs(emb, threshold=0.99, max_block=10**9).collect()
    b_pairs = {(r["vec_a"], r["vec_b"]) for r in blocked}
    e_pairs = {(r["vec_a"], r["vec_b"]) for r in exact}
    assert b_pairs, "skew-guarded dedup found no pairs"
    assert b_pairs <= e_pairs  # only same-sub-bucket pairs survive
    # same-direction (cosine 1.0) pairs share a bucket -> recall preserved
    same_dir = {(a, b) for (a, b) in e_pairs if a % dims == b % dims}
    assert same_dir <= b_pairs
    # the dominant label really was split into multiple sub-blocks
    from pyspark.sql import functions as F

    big = emb.filter(F.col("label") == "big").select(
        lsh_bucket(F.col("embedding")).alias("bucket")
    )
    assert big.select("bucket").distinct().count() > 1


def test_open_executor_span_corrected_to_batch_end(spark):
    be = spark.createDataFrame(
        [("q", 0, "e1", 2, 0, None), ("q", 0, "e2", 2, 50, 80)],
        "query_id string, batch_id bigint, executor_id string, cores bigint,"
        " start_ms bigint, end_ms bigint",
    )
    bounds = spark.createDataFrame(
        [("q", 0, True, 0, 100, 100)],
        "query_id string, batch_id bigint, valid boolean, start_ms bigint,"
        " end_ms bigint, batch_running_ms bigint",
    )
    out = max_concurrency(be, bounds).collect()
    assert out[0]["max_concurrent"] == 2  # open span runs to batch end (100)


def test_duration_anomalies_flags_only_true_outlier(spark):
    """One 10x-duration batch among uniform ones is flagged; nothing else
    is; a zero-variance query flags nothing (0 > 0).  Durations derive
    from batch_bounds' numInputRows/processedRowsPerSecond math, so the
    fixture speaks the operator's real input language."""
    from streaminglens_spark.operators.analysis import duration_anomalies

    rows = []
    # q1: 30 batches of ~1000 ms, one of 10000 ms (rps scales duration)
    for b in range(30):
        rows.append(("q1", b, b * 60_000, 100, 100.0))   # 1000 ms
    rows.append(("q1", 30, 31 * 60_000, 1000, 100.0))    # 10000 ms outlier
    # q2: constant durations -> zero variance -> no flags
    for b in range(10):
        rows.append(("q2", b, b * 60_000, 100, 50.0))    # 2000 ms each
    # q3: an invalid (no-rows) batch must not participate at all
    rows.append(("q3", 0, 0, 0, 0.0))
    progress = spark.createDataFrame(
        rows,
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double",
    )
    out = {(r["query_id"], r["batch_id"]): r["is_anomaly"]
           for r in duration_anomalies(progress).collect()}
    assert out[("q1", 30)] is True
    assert sum(1 for k, v in out.items() if k[0] == "q1" and v) == 1
    assert not any(v for k, v in out.items() if k[0] == "q2")
    assert not any(k[0] == "q3" for k in out)  # invalid batch excluded


def test_recommend_sla_exact_quantiles_and_ceiling(spark):
    """Quantiles are exact order statistics (cum*100 >= p*n pick) and the
    recommendation is p99 ceiling-rounded; invalid batches excluded."""
    from streaminglens_spark.operators.analysis import recommend_sla

    rows = []
    # q1: durations 1000, 2000, ..., 100000 ms (100 valid batches)
    for b in range(100):
        rows.append(("q1", b, b * 200_000, 100 * (b + 1), 100.0))
    rows.append(("q1", 100, 0, 0, 0.0))  # invalid
    progress = spark.createDataFrame(
        rows,
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double",
    )
    out = recommend_sla(progress).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_batches"] == 100
    assert r["p50_ms"] == 50_000   # ceil(50*100/100) = rank 50
    assert r["p95_ms"] == 95_000
    assert r["p99_ms"] == 99_000
    assert r["recommended_sla_ms"] == 99_000  # already a 500-multiple
    # non-multiple p99 rounds UP
    rows2 = [("q2", b, 0, 1234, 1000.0) for b in range(5)]  # 1234 ms each
    out2 = recommend_sla(spark.createDataFrame(
        rows2,
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double",
    )).collect()[0]
    assert out2["p99_ms"] == 1234
    assert out2["recommended_sla_ms"] == 1500
