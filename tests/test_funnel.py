"""Funnel semantics goldens: strict ordering, horizon, greedy-earliest
chains, and monotone step counts.  Cross-engine parity runs in
``test_oracle_queries`` (`q_funnel`)."""

from __future__ import annotations

import datetime as dt

import pytest

from streaminglens_spark.operators.funnel import funnel_counts

T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
            for i, (u, t, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _counts(spark, rows, **kw):
    return {
        r["step"]: r["n_users"]
        for r in funnel_counts(_events(spark, rows), **kw).collect()
    }


def test_strict_order_and_monotone(spark):
    rows = [
        (1, "signup", 0), (1, "view", 10), (1, "purchase", 20),   # full
        (2, "signup", 0), (2, "view", 10),                        # stops
        (3, "view", 0), (3, "signup", 10), (3, "purchase", 20),   # view BEFORE signup: no view step
        (4, "purchase", 0),                                       # never entered
    ]
    got = _counts(spark, rows)
    assert got == {"signup": 3, "view": 2, "purchase": 1}


def test_horizon_excludes_late_chains(spark):
    rows = [
        (1, "signup", 0), (1, "view", 30), (1, "purchase", 12 * 60),  # purchase past 6 h
        (2, "signup", 0), (2, "view", 12 * 60),                       # view past 6 h
    ]
    got = _counts(spark, rows)
    assert got == {"signup": 2, "view": 1, "purchase": 0}


def test_greedy_earliest_chain(spark):
    """The chain anchors on the EARLIEST qualifying event at each step:
    user 1's first view (t=5) gates purchases, so a purchase between
    signup and that view does not count, but one after it does."""
    rows = [
        (1, "signup", 0), (1, "purchase", 3), (1, "view", 5),
        (1, "purchase", 7),
    ]
    got = _counts(spark, rows)
    assert got == {"signup": 1, "view": 1, "purchase": 1}
    rows2 = [(1, "signup", 0), (1, "purchase", 3), (1, "view", 5)]
    got2 = _counts(spark, rows2)
    assert got2 == {"signup": 1, "view": 1, "purchase": 0}


def test_same_timestamp_not_after(spark):
    """Strictly-after semantics: a view at the exact signup instant does
    not convert."""
    rows = [(1, "signup", 0), (1, "view", 0)]
    assert _counts(spark, rows) == {"signup": 1, "view": 0, "purchase": 0}


def test_requires_two_steps(spark):
    with pytest.raises(ValueError, match="two steps"):
        funnel_counts(_events(spark, []), steps=("signup",))


def test_retention_cohort_goldens(spark):
    """Offset-0 row is the cohort size; pre-anchor activity excluded;
    week bucketing exact."""
    from streaminglens_spark.operators.funnel import retention_cohorts

    day = 24 * 60
    rows = [
        # user 1 signs up day 0, active day 8 (week 1) and day 15 (week 2)
        (1, "signup", 0), (1, "view", 8 * day), (1, "click", 15 * day),
        # user 2 signs up day 0, never returns
        (2, "signup", 0),
        # user 3: activity BEFORE signup (excluded), signup day 1,
        # active day 9 (offset (9-1)//7 = week 1)
        (3, "view", 0), (3, "signup", 1 * day), (3, "click", 9 * day),
        # user 4 never signs up: absent entirely
        (4, "view", 0),
    ]
    got = {
        (r["cohort_start_ms"], r["week_offset"]): r["n_active"]
        for r in retention_cohorts(_events(spark, rows)).collect()
    }
    # all three signups fall in the same epoch-aligned week cohort
    assert len({c for c, _ in got}) == 1
    cohort = next(iter(got))[0]
    assert got[(cohort, 0)] == 3          # cohort size
    assert got[(cohort, 1)] == 2          # users 1 and 3 return in week 1
    assert got[(cohort, 2)] == 1          # user 1 only
    assert (cohort, -1) not in got        # nothing pre-anchor
