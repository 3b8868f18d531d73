"""Per-domain document cap (r8): two-level rank bit-equal to the
one-window reference, cap semantics, partition invariance, and the plan
shape (bucket-local first-stage rank present)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.urls import (
    domain_cap,
    domain_cap_windowed,
)


def _skewed(spark):
    # one megadomain (600 docs), two small ones
    rows = [(i, f"https://big.example.com/p{i}", "big.example.com") for i in range(600)]
    rows += [(1000 + i, f"https://tiny{i % 2}.org/x", f"tiny{i % 2}.org")
             for i in range(10)]
    return spark.createDataFrame(
        rows, "doc_id long, canon_url string, domain string"
    )


def test_two_level_bit_equal_to_windowed(spark):
    canon = _skewed(spark)
    ref = sorted(tuple(r) for r in
                 domain_cap_windowed(canon, 8).collect())
    for nb in (1, 3, 64):
        got = sorted(tuple(r) for r in
                     domain_cap(canon, 8, n_buckets=nb).collect())
        assert got == ref, f"n_buckets={nb} diverged"


def test_cap_enforced_and_deterministic(spark):
    canon = _skewed(spark)
    out = domain_cap(canon, 5).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert all(len(v) <= 5 for v in by_dom.values())
    assert len(by_dom["big.example.com"]) == 5  # megadomain capped
    assert len(by_dom["tiny0.org"]) == 5
    # ranks are 1..k within each domain
    for v in by_dom.values():
        assert sorted(r["keep_rank"] for r in v) == list(range(1, len(v) + 1))
    # partition invariance
    again = domain_cap(canon.repartition(17, "doc_id"), 5).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_first_stage_rank_is_bucket_local(spark):
    import re

    from streaminglens_spark.plans.audit import formatted_plan

    canon = _skewed(spark)
    plan = formatted_plan(domain_cap(canon, 8))
    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    # stage 1: (domain, bucket)-partitioned rank over the raw rows
    assert any(
        re.match(r"windowspecdefinition\(domain#\d+, _b#\d+L?, _h#", s)
        for s in specs
    ), specs
    # stage 2 exists too, over the bounded survivors
    assert any(
        re.match(r"windowspecdefinition\(domain#\d+, _h#", s) for s in specs
    ), specs
