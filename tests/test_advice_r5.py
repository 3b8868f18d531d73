"""Round-5 advice regression tests (ADVICE.md r4):

1. ``assign_row_ids`` — int64-overflow key spans (snowflake-style ids)
   must not drop rows (decimal shard arithmetic + clamp), and clustered
   keys stay CORRECT (balance is the documented tradeoff, not loss).
2. ``mixture_sample`` — a weighted stratum with zero rows raises loudly
   at the first action instead of silently deviating from the requested
   mixture; weights are scale-invariant (only ratios matter); thresholds
   are integer-exact (no float division in the kept-set).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from streaminglens_spark.functions.ids import assign_row_ids
from streaminglens_spark.functions.sampling import mixture_sample


# ------------------------------------------------------------ assign_row_ids

def _check_ids(df, order_col="doc_id"):
    rows = df.orderBy("row_id").collect()
    assert [r["row_id"] for r in rows] == list(range(len(rows)))
    keys = [r[order_col] for r in rows]
    assert keys == sorted(keys)
    return rows


def test_assign_row_ids_survives_int64_scale_spans(spark):
    # span ~ 1.8e19 (full int64 width): (k - lo) * 32 wraps in int64
    # arithmetic; the r4 advice failure was those rows silently vanishing
    # at the offsets join.  16 keys spread across the whole space.
    big = 2**62
    keys = [-big, -big // 3, -1234567, -1, 0, 1, 7, 10**6,
            10**12, 10**15, big // 7, big // 3, big // 2, big - 2, big - 1, big]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    rows = _check_ids(assign_row_ids(df))
    assert len(rows) == len(keys)  # nothing dropped
    assert [r["doc_id"] for r in rows] == sorted(keys)


def test_assign_row_ids_clustered_keys_still_correct(spark):
    # hot-range key distribution (the documented balance caveat): 90% of
    # keys inside a tiny window of a huge span -- ids must stay dense,
    # deterministic and ordered even though most rows share few shards
    keys = list(range(1000, 1900)) + [10**12 + i * 10**9 for i in range(100)]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    rows = _check_ids(assign_row_ids(df))
    assert len(rows) == len(keys)


def test_assign_row_ids_shard_boundary_hi_key(spark):
    # k == hi on a span where decimal division rounding could push the
    # shard to n_shards without the clamp
    df = spark.createDataFrame(
        [(k,) for k in [0, 2**58, 2**59, 2**60 - 1]], "doc_id long"
    )
    assert len(_check_ids(assign_row_ids(df))) == 4


# ------------------------------------------------------------ mixture_sample

def _docs(spark):
    rows = [(i, "en" if i % 2 == 0 else ("es" if i % 3 == 0 else "de"))
            for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_missing_stratum_raises_at_action(spark):
    docs = _docs(spark)
    out = mixture_sample(docs, "lang", "doc_id", {"en": 0.5, "xx": 0.5})
    with pytest.raises(Exception, match="xx.*has no rows|has no rows"):
        out.collect()


def test_mixture_weight_scale_invariance(spark):
    # scaling every weight by c scales T by 1/c and leaves keep-rates
    # unchanged: kept sets must be identical (weights need not sum to 1)
    docs = _docs(spark)
    a = {"en": 0.4, "es": 0.3, "de": 0.3}
    b = {s: p * 2.5 for s, p in a.items()}
    kept_a = {r["doc_id"] for r in mixture_sample(docs, "lang", "doc_id", a).collect()}
    kept_b = {r["doc_id"] for r in mixture_sample(docs, "lang", "doc_id", b).collect()}
    assert kept_a == kept_b and kept_a


def test_mixture_binding_stratum_keeps_nearly_all(spark):
    # the scarcest-relative-to-weight stratum anchors T and keeps
    # everything (up to the documented <= 1e-6 fixed-point floor loss;
    # exact here because the tiny counts divide cleanly)
    docs = _docs(spark)
    counts = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    weights = {"en": 0.2, "es": 0.4, "de": 0.4}
    binding = min(counts, key=lambda s: counts[s] / weights[s])
    kept = mixture_sample(docs, "lang", "doc_id", weights)
    kept_binding = kept.filter(F.col("lang") == binding).count()
    assert kept_binding >= counts[binding] - 1


def test_mixture_rejects_degenerate_weights(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        mixture_sample(docs, "lang", "doc_id", {})
    with pytest.raises(ValueError):
        mixture_sample(docs, "lang", "doc_id", {"en": -0.1})
    with pytest.raises(ValueError, match="fixed-point"):
        mixture_sample(docs, "lang", "doc_id", {"en": 1e-9})


def test_assign_row_ids_rejects_null_keys(spark):
    """r5 hardening: a NULL order key must fail the first action loudly
    (min/max skip NULLs and window sorts them first -- a silent
    arbitrary rank would corrupt every downstream shard manifest)."""
    df = spark.createDataFrame([(1,), (None,), (3,)], "doc_id long")
    out = assign_row_ids(df)  # construction stays lazy
    with pytest.raises(Exception, match="non-null"):
        out.collect()


def test_group_split_no_straddling_and_validation(spark):
    """Leakage guard: every group's rows share one split; fractions
    validated; deterministic across partitionings."""
    import pytest

    from pyspark.sql import functions as F

    from streaminglens_spark.functions.sampling import assign_split_by_group

    df = spark.createDataFrame(
        [(u, i) for u in range(200) for i in range(u % 4 + 1)],
        "user_id long, seq long",
    )
    out = assign_split_by_group(df, "user_id")
    straddle = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    a = {(r["user_id"], r["seq"]): r["split"] for r in out.collect()}
    b = {
        (r["user_id"], r["seq"]): r["split"]
        for r in assign_split_by_group(df.repartition(7), "user_id").collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split_by_group(df, "user_id", (("a", 0.5), ("b", 0.1)))
    with pytest.raises(ValueError, match="positive"):
        assign_split_by_group(df, "user_id", (("a", 1.5), ("b", -0.5)))
