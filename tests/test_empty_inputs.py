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
    # r10 additions
    ("simhash64", "functions.dedup", "doc_id long, text string"),
    ("corpus_pipeline_v2", "functions.corpus", "doc_id long, text string"),
    # r11 additions
    ("line_dedup", "functions.text", "doc_id long, text string"),
    ("leakage_safe_split", "functions.dedup", "doc_id long, text string"),
    # r12 additions
    ("pack_waste", "functions.text", "doc_id long, text string"),
    ("curriculum_order", "functions.sampling", "doc_id long, text string"),
    ("dedup_attribution", "functions.dedup", "doc_id long, text string"),
    ("dsir_scores", "functions.dsir", "doc_id long, text string, lang string"),
    ("dsir_select", "functions.dsir", "doc_id long, text string, lang string"),
    ("c4_corpus", "functions.text", "doc_id long, text string"),
    ("c4_rules", "functions.text", "doc_id long, text string"),
    ("embed_outliers", "functions.similarity",
     "vec_id long, embedding array<float>, label int"),
    ("source_quality_report", "functions.text",
     "doc_id long, text string, source string"),
    # r13 additions
    ("lsh_parameter_advisor", "functions.dedup", "doc_id long, text string"),
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
    # r10: the composed ingest flagship and the shared LSH bucket cap
    from streaminglens_spark.functions.corpus import ingest_e2e
    from streaminglens_spark.functions.lsh import cap_band_buckets

    srcs = _empty(spark, "doc_id long, source string")
    out = ingest_e2e(docs, srcs, {"src0": 100})
    assert out.count() == 0 and len(out.columns) == 5
    fb = _empty(spark, "doc_id long, band int, v long")
    assert cap_band_buckets(fb, 8).count() == 0
    # r11: the loader-tail flagship and the mixture planners
    from streaminglens_spark.functions.corpus import ingest_full
    from streaminglens_spark.functions.sampling import (
        mixture_schedule,
        temperature_mixture_plan,
    )
    from streaminglens_spark.streaming.budget import temperature_targets

    out = ingest_full(docs, srcs, {"src0": 100})
    assert out.count() == 0 and len(out.columns) == 5
    sdocs = _empty(spark, "doc_id long, text string, source string")
    assert temperature_mixture_plan(sdocs, 1000).count() == 0
    out = mixture_schedule(sdocs, [(0, 1, 100), (1, 0, 100)])
    assert out.count() == 0 and len(out.columns) == 5
    assert temperature_targets({}, 1000) == {}
    assert temperature_targets({"a": 0, "b": 0}, 1000) == {"a": 0, "b": 0}
    # r12: the packed flagship
    from streaminglens_spark.functions.corpus import ingest_packed

    out = ingest_packed(docs, srcs, {"src0": 100})
    assert out.count() == 0 and len(out.columns) == 5


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


def test_r7_operators_empty_safe(spark):
    """r7 additions: empty-in/empty-out for the span/passage extractors,
    token-budget sampler, soft dedup, and the incremental-refit chain
    (empty new batch must leave the index unchanged, not error)."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.dedup import softdedup_weights
    from streaminglens_spark.functions.pq import (
        pq_cell_stats,
        pq_fit,
        pq_update,
        pq_vector_shard,
    )
    from streaminglens_spark.functions.sampling import token_budget_sample
    from streaminglens_spark.functions.similarity import (
        ann_vector_shard,
        ivf_centroids,
        kmeans_update,
        merge_vector_shards,
    )
    from streaminglens_spark.functions.winnow import (
        duplicated_passages,
        shared_spans,
    )

    docs = _empty(spark, "doc_id long, text string, source string")
    assert shared_spans(docs).count() == 0
    assert duplicated_passages(docs).count() == 0
    assert token_budget_sample(docs, "source", "doc_id", {"a": 100}).count() == 0
    clusters = _empty(spark, "doc_id long, cluster_id long, cluster_size long")
    assert softdedup_weights(docs, clusters).count() == 0

    # refit chain on an EMPTY new batch: shard empty, update == identity
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    small = emb.filter(F.col("vec_id") < 60)
    empty_batch = emb.filter(F.col("vec_id") < 0)
    cents = ivf_centroids(small)
    shard = ann_vector_shard(empty_batch, cents)
    assert shard.count() == 0
    assert merge_vector_shards(shard).count() == 0
    from streaminglens_spark.functions.similarity import ann_index_stats

    updated = kmeans_update(cents, ann_index_stats(small, cents), shard)
    assert updated.count() == cents.count()
    cb = pq_fit(small)
    pq_shard = pq_vector_shard(empty_batch, cb)
    assert pq_shard.count() == 0
    upd = pq_update(cb, pq_cell_stats(small, cb), pq_shard)
    assert upd.count() == cb.count()
