"""LLM-data-pipeline operator surface (dedup, similarity, text, multimodal,
relational).  Everything here is a pure ``DataFrame -> DataFrame`` transform
with a DuckDB-oracle-checked contract (COVERAGE.md maps each to its check)."""

from .dedup import (
    dedup_exact,
    leakage_safe_split,
    softdedup_weights,
    dup_corpus,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash64,
    simhash_pairs,
)
from .multimodal import (
    attach_blob,
    attach_jpeg_blob,
    blob_meta,
    decode_image,
    frame_sample,
    media_meta,
    probe_image,
    resize_meta,
)
from .joins import (
    asof_join,
    events_asof_orders,
    events_in_batches,
    interval_join,
    salted_join,
)
from .kll import kll_merge_quantiles, kll_quantiles, kll_sketch_shards
from .relational import pricing_summary, region_volume, top_customers
from .sketch import hist_quantiles, hll_distinct, hll_distinct_windowed, kmv_distinct
from .similarity import (
    ann_increment,
    ann_index_stats,
    ann_lsh_topk,
    ann_stats_shard,
    ann_topk,
    ann_vector_shard,
    cosine_topk,
    embed_dedup_pairs,
    ivf_centroids,
    ivf_topk,
    kmeans_fit,
    kmeans_update,
    lsh_bucket,
    merge_ann_stats,
    merge_vector_shards,
    recall_at_k,
    semantic_decontaminate,
    semantic_dedup_pairs,
)
from .intlog import dec_div, log2_fp
from .lm import (
    apply_surprisal,
    bigram_counts,
    bigram_surprisal,
    pmi_collocations,
    ppl_band_filter,
)
from .search import bm25_search, bm25_search_df, bm25_self_retrieval, build_postings
from .advisor import partition_advisor, watermark_advisor
from .profile import key_skew_stats
from .sampling import (
    negative_samples,
    temperature_mixture_plan,
    token_budget_sample,
)
from .sequences import props_stats, rolling_user_features, user_event_sequences
from .snapshot import (
    corpus_diff,
    corpus_diff_summary,
    source_overlap_matrix,
    vocab_drift,
)
from .text import doc_fingerprint, lang_id, quality_score, text_stats, token_count
from .winnow import (
    duplicated_passages,
    positional_grams,
    remove_shared_spans,
    shared_spans,
    winnow_fingerprints,
    winnow_pairs,
)
from .zorder import zorder_stats, zvalue

__all__ = [
    "ann_lsh_topk",
    "apply_surprisal",
    "asof_join",
    "attach_blob",
    "attach_jpeg_blob",
    "bigram_counts",
    "bigram_surprisal",
    "blob_meta",
    "bm25_search",
    "bm25_search_df",
    "bm25_self_retrieval",
    "build_postings",
    "corpus_diff",
    "corpus_diff_summary",
    "cosine_topk",
    "dec_div",
    "decode_image",
    "dedup_exact",
    "doc_fingerprint",
    "dup_corpus",
    "embed_dedup_pairs",
    "events_asof_orders",
    "events_in_batches",
    "frame_sample",
    "hist_quantiles",
    "hll_distinct",
    "hll_distinct_windowed",
    "interval_join",
    "ivf_centroids",
    "ivf_topk",
    "key_skew_stats",
    "kll_merge_quantiles",
    "kll_quantiles",
    "kll_sketch_shards",
    "kmeans_fit",
    "kmv_distinct",
    "lang_id",
    "log2_fp",
    "lsh_bucket",
    "media_meta",
    "leakage_safe_split",
    "minhash_lsh_pairs",
    "negative_samples",
    "ngram_jaccard_pairs",
    "partition_advisor",
    "pmi_collocations",
    "ppl_band_filter",
    "pricing_summary",
    "probe_image",
    "props_stats",
    "quality_score",
    "recall_at_k",
    "region_volume",
    "resize_meta",
    "rolling_user_features",
    "salted_join",
    "semantic_dedup_pairs",
    "simhash",
    "simhash64",
    "simhash_pairs",
    "source_overlap_matrix",
    "text_stats",
    "token_count",
    "top_customers",
    "user_event_sequences",
    "vocab_drift",
    "watermark_advisor",
    "winnow_fingerprints",
    "winnow_pairs",
    "zorder_stats",
    "zvalue",
]
