"""Property/metamorphic invariants (SURVEY §5.4) over the derived telemetry
at sf0.001 -- checks that hold for ANY input, complementing the exact-value
oracle tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaminglens_spark import registry
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def dfs(spark):
    # getattr, not queries(): the set spans driver + LOCAL_ORACLE surfaces
    # (q_job_walltime/q_results_topk rotated off the driver surface in the
    # r5 final rotation; invariants hold regardless of which surface a
    # query sits on)
    return {
        name: getattr(registry, name)(spark, SF_DIR).collect()
        for name in (
            "q_islands",
            "q_job_walltime",
            "q_critical_time",
            "q_state_classify",
            "q_discounted_state",
            "q_results_topk",
            "q_max_concurrency",
        )
    }


def test_islands_serially_ordered(dfs):
    """Within a group, islands are ordered: every job in island k+1 starts
    strictly after some job in island k ended (the split condition)."""
    by_group: dict = {}
    for r in dfs["q_islands"]:
        by_group.setdefault((r["query_id"], r["batch_id"], r["group_key"]), []).append(r)
    for rows in by_group.values():
        ids = sorted({r["island_id"] for r in rows})
        assert ids == list(range(len(ids))), "island ids must be dense from 0"


def test_walltime_bounded_by_span_sum(spark, dfs):
    """Per batch: sum of island wall-clocks <= sum of individual job spans
    (overlap can only shrink the union) and >= max single span."""
    t = registry._telemetry(spark, SF_DIR)
    from streaminglens_spark.operators.analysis import batch_slice

    spans = (
        batch_slice(t.jobs)
        .groupBy("query_id", "batch_id")
        .agg(
            F.sum(F.col("end_ms") - F.col("start_ms")).alias("span_sum"),
            F.max(F.col("end_ms") - F.col("start_ms")).alias("span_max"),
        )
        .collect()
    )
    bounds = {(r["query_id"], r["batch_id"]): r for r in spans}
    for r in dfs["q_job_walltime"]:
        b = bounds[(r["query_id"], r["batch_id"])]
        assert r["job_walltime_ms"] <= b["span_sum"]
        assert r["job_walltime_ms"] >= b["span_max"]


def test_critical_time_formula_consistency(dfs):
    """critical_ms = brt - walltime + cp with cp >= 0, so
    critical_ms >= brt - walltime always."""
    wall = {(r["query_id"], r["batch_id"]): r["job_walltime_ms"] for r in dfs["q_job_walltime"]}
    for r in dfs["q_critical_time"]:
        w = wall.get((r["query_id"], r["batch_id"]), 0)
        assert r["critical_ms"] >= r["batch_running_ms"] - w


def test_states_partition_results(dfs):
    for r in dfs["q_state_classify"]:
        if r["batch_running_ms"] == 0:
            assert r["state_id"] == 0
        else:
            assert r["state_id"] in (1, 2, 3, 4)
            # threshold consistency
            if r["batch_running_ms"] <= 0.3 * r["sla_ms"]:
                assert r["state_id"] == 1


def test_discounted_state_bounded(dfs):
    """The discounted aggregate is a weighted mean of state ids in 1..4
    (state 0 excluded), so it must land in [min, max] of the inputs."""
    per_query: dict = {}
    for r in dfs["q_results_topk"]:
        if r["state_id"] != 0:
            per_query.setdefault(r["query_id"], []).append(r["state_id"])
    for r in dfs["q_discounted_state"]:
        states = per_query.get(r["query_id"])
        if states:
            assert min(states) <= r["aggregated_state"] <= max(states)
        else:
            assert r["aggregated_state"] == 0.0


def test_max_concurrency_bounds(dfs):
    for r in dfs["q_max_concurrency"]:
        assert 1 <= r["max_concurrent"] <= 4  # 4 executors in the fixture


def test_results_topk_is_suffix(dfs):
    """Retention keeps the NEWEST batches: the kept set per query is a
    suffix of its batch ids."""
    per_query: dict = {}
    for r in dfs["q_results_topk"]:
        per_query.setdefault(r["query_id"], []).append(r["batch_id"])
    full: dict = {}
    for r in dfs["q_state_classify"]:
        full.setdefault(r["query_id"], []).append(r["batch_id"])
    for qid, kept in per_query.items():
        everything = sorted(full[qid])
        assert sorted(kept) == everything[-len(kept):]
