"""Plan-quality audits: the properties that make this engine hold at 100 TB,
asserted on the actual physical plans (a lost broadcast or lost pushdown
fails here, not on a cluster)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.plans.audit import (
    formatted_plan,
    has_pushed_filters,
    python_udf_count,
    scan_read_schema,
    uses_broadcast_join,
)
from tests.conftest import SF_DIR


def test_sla_join_is_broadcast(spark):
    df = registry.q_state_classify(spark, SF_DIR)
    assert uses_broadcast_join(df), "SLA/dim joins must broadcast, not shuffle"


def test_batch_slice_broadcasts_ranges(spark):
    df = registry.q_batch_slice(spark, SF_DIR)
    assert uses_broadcast_join(df), "A4 range sweep must broadcast per-batch ranges"


def test_doc_scan_prunes_columns(spark):
    # q_token_count touches only text: the parquet scan must not read
    # lang/source/n_chars
    df = registry.q_token_count(spark, SF_DIR)
    schemas = scan_read_schema(df)
    assert schemas, "expected a parquet scan"
    for s in schemas:
        assert "lang" not in s and "source" not in s, f"unpruned scan: {s}"


def test_ngram_filter_pushdown(spark):
    # doc_id < 40 must reach the parquet scan
    df = registry.q_ngram_jaccard(spark, SF_DIR)
    assert has_pushed_filters(df), "doc_id predicate must push to parquet"


def test_no_row_at_a_time_python_udfs(spark):
    """Python only ever appears Arrow-batched (pandas UDF / mapInPandas),
    never as row-at-a-time BatchEvalPython."""
    for name in ("q_state_classify", "q_minhash_lsh", "q_critical_path",
                 "q_cosine_topk", "q_text_stats", "q_frame_sample"):
        df = registry.queries()[name](spark, SF_DIR)
        assert python_udf_count(df) == 0, f"{name} uses a row-at-a-time Python UDF"


def test_analysis_windows_are_batch_partitioned(spark):
    """No global-order window in the analysis chain: every Window sort is
    preceded by a partition key (query_id/batch_id/group...)."""
    df = registry.q_islands(spark, SF_DIR)
    plan = formatted_plan(df)
    # Spark prints window specs like: windowspecdefinition(query_id..., start_ms ASC
    assert "windowspecdefinition(query_id" in plan.replace("#", "").replace(" ", "") or (
        "PartitionBy" not in plan
    ), plan[:500]


def test_cosine_broadcasts_query_side(spark):
    df = registry.q_cosine_topk(spark, SF_DIR)
    assert uses_broadcast_join(df), "query vectors must broadcast (map-only corpus scan)"
