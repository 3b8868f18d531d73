"""LLM-data-pipeline operator surface (dedup, similarity, text, multimodal,
relational).  Everything here is a pure ``DataFrame -> DataFrame`` transform
with a DuckDB-oracle-checked contract (COVERAGE.md maps each to its check)."""

from .dedup import (
    dedup_exact,
    dup_corpus,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from .multimodal import (
    attach_blob,
    blob_meta,
    decode_image,
    frame_sample,
    media_meta,
    resize_meta,
)
from .joins import asof_join, events_asof_orders, events_in_batches, interval_join
from .kll import kll_merge_quantiles, kll_quantiles, kll_sketch_shards
from .relational import pricing_summary, region_volume, top_customers
from .sketch import hist_quantiles, hll_distinct, hll_distinct_windowed, kmv_distinct
from .similarity import (
    ann_lsh_topk,
    cosine_topk,
    embed_dedup_pairs,
    ivf_centroids,
    ivf_topk,
    kmeans_fit,
    lsh_bucket,
    recall_at_k,
    semantic_dedup_pairs,
)
from .text import doc_fingerprint, lang_id, quality_score, text_stats, token_count

__all__ = [
    "ann_lsh_topk",
    "asof_join",
    "attach_blob",
    "blob_meta",
    "cosine_topk",
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
    "kll_merge_quantiles",
    "kll_quantiles",
    "kll_sketch_shards",
    "kmv_distinct",
    "ivf_centroids",
    "ivf_topk",
    "kmeans_fit",
    "lang_id",
    "lsh_bucket",
    "media_meta",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "pricing_summary",
    "quality_score",
    "recall_at_k",
    "semantic_dedup_pairs",
    "region_volume",
    "resize_meta",
    "simhash",
    "simhash_pairs",
    "text_stats",
    "token_count",
    "top_customers",
]
