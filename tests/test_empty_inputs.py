"""Empty-input hardening (r5): every corpus operator must be
empty-in/empty-out -- no NPE on null aggregates, no first()[0] on a
missing row, no div-by-zero -- because at 100 TB a filter chain
legitimately empties a partition-restricted input (a new shard with no
documents, a time window with no events)."""

from __future__ import annotations

import pytest

from streaminglens_spark import cache


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


CASES = [
    ("dedup_exact", "functions.dedup", "doc_id long, text string"),
    ("minhash_lsh_pairs", "functions.dedup", "doc_id long, text string"),
    ("simhash_pairs", "functions.dedup", "doc_id long, text string"),
    ("dedup_clusters", "functions.dedup", "doc_a long, doc_b long"),
    ("dedup_clusters_contract", "functions.dedup", "doc_a long, doc_b long"),
    ("quality_classifier", "functions.text", "doc_id long, text string"),
    ("chunk_documents", "functions.text", "doc_id long, text string"),
    ("chunk_dedup", "functions.text", "doc_id long, text string"),
    ("text_stats", "functions.text", "doc_id long, text string"),
    (
        "hdr_quantiles",
        "functions.sketch",
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ),
    (
        "hist_quantiles",
        "functions.sketch",
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ),
    (
        "kmv_distinct",
        "functions.sketch",
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    ),
    ("assign_row_ids", "functions.ids", "doc_id long"),
    ("corpus_shuffle", "functions.sampling", "doc_id long"),
    # round-5 continued-session additions
    ("normalize_text", "functions.text", "doc_id long, text string"),
    ("dirty_corpus", "functions.text", "doc_id long, text string"),
    ("vocab_topk", "functions.text", "doc_id long, text string"),
    ("strip_boilerplate_text", "functions.text", "doc_id long, text string"),
    ("canonicalize_urls", "functions.urls", "doc_id long, url string"),
    ("url_corpus", "functions.urls", "doc_id long, text string"),
    ("domain_stats", "functions.urls",
     "doc_id long, canon_url string, domain string, reg_domain string"),
    ("corpus_pipeline", "functions.corpus", "doc_id long, text string"),
    ("bpe_train", "functions.bpe", "doc_id long, text string"),
    ("profile_table", "functions.profile", "doc_id long, text string"),
    (
        "kll_quantiles",
        "functions.kll",
        "event_id long, event_type string, value double",
    ),
    (
        "duration_anomalies",
        "operators.analysis",
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double",
    ),
    (
        "recommend_sla",
        "operators.analysis",
        "query_id string, batch_id long, ts_ms long, num_input_rows long,"
        " processed_rps double",
    ),
    (
        "semantic_dedup_pairs",
        "functions.similarity",
        "vec_id long, embedding array<float>, label int",
    ),
    (
        "retention_cohorts",
        "operators.funnel",
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ),
    # r5 continued: retrieval / layout / governance operators
    ("bigram_surprisal", "functions.lm", "doc_id long, text string"),
    ("ppl_band_filter", "functions.lm", "doc_id long, text string"),
    ("pmi_collocations", "functions.lm", "doc_id long, text string"),
    ("winnow_fingerprints", "functions.winnow", "doc_id long, text string"),
    ("winnow_pairs", "functions.winnow", "doc_id long, text string"),
    ("source_overlap_matrix", "functions.snapshot",
     "doc_id long, text string, source string"),
    (
        "user_event_sequences",
        "functions.sequences",
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ),
    (
        "rolling_user_features",
        "functions.sequences",
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ),
]


def test_multi_arg_operators_empty_safe(spark):
    """Same contract for the operators that take a second input: empty
    corpus in, empty (schema-bearing) result out."""
    from streaminglens_spark.functions.joins import salted_join
    from streaminglens_spark.functions.search import bm25_search
    from streaminglens_spark.functions.snapshot import corpus_diff
    from streaminglens_spark.functions.zorder import zorder_stats

    docs = _empty(spark, "doc_id long, text string")
    out = bm25_search(docs, [("q1", "anything")])
    assert out.count() == 0 and len(out.columns) == 4
    ev = _empty(spark, "rid long, x long, y long")
    out = zorder_stats(ev, "x", "y")
    assert out.count() == 0 and len(out.columns) == 6
    big = _empty(spark, "rid long, k string, v long")
    small = _empty(spark, "k string, w long")
    out = salted_join(big, small, "k", n_salts=4, salt_src="rid")
    assert out.count() == 0
    out = corpus_diff(docs, docs)
    assert out.count() == 0 and len(out.columns) == 4
    from streaminglens_spark.functions.profile import key_skew_stats
    from streaminglens_spark.functions.snapshot import vocab_drift

    assert key_skew_stats(big, "k").count() == 0
    assert vocab_drift(docs, docs).count() == 0


def test_funnel_empty_reports_zero_per_step(spark):
    """funnel_counts is the one operator whose empty-input contract is
    NOT empty-out: it reports 0 users for every step (a dashboard needs
    the rows)."""
    from streaminglens_spark import cache
    from streaminglens_spark.operators.funnel import funnel_counts

    try:
        out = funnel_counts(
            _empty(
                spark,
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string",
            )
        ).collect()
        assert [(r["step_idx"], r["n_users"]) for r in out] == [
            (0, 0), (1, 0), (2, 0),
        ]
    finally:
        cache.release_caches()


@pytest.mark.parametrize("name,module,schema", CASES)
def test_operator_is_empty_safe(spark, name, module, schema):
    import importlib

    fn = getattr(
        importlib.import_module(f"streaminglens_spark.{module}"), name
    )
    try:
        out = fn(_empty(spark, schema))
        assert out.count() == 0
        assert len(out.columns) > 0  # schema survives emptiness
    finally:
        cache.release_caches()
