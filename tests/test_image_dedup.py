"""Perceptual image dedup (r8): aHash invariances and the banded-pair
plan.  Oracle hash-parity at two SFs runs in test_oracle_queries
(q_image_ahash / q_image_dups on LOCAL_ORACLE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.functions.multimodal import (
    attach_png_blob_fixed,
    image_ahash,
    image_dup_pairs,
)


def _hashes(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return image_ahash(attach_png_blob_fixed(docs))


def test_exact_copy_hamming_zero_near_copy_small(spark):
    base = " ".join(f"tok{i % 23} word{(i * 7) % 31}" for i in range(60))
    # doc 2 = exact copy; doc 3 = one word changed (few pixels move);
    # doc 4 = unrelated text
    near = base.replace("tok3", "tokX", 1)     # one word: visually ~identical
    words = base.split(" ")
    edited = " ".join(                          # every 4th word changed
        (w.upper() if i % 4 == 0 else w) for i, w in enumerate(words))
    other = " ".join(f"zz{(i * 13) % 41}" for i in range(80))
    rows = [(1, base), (2, base), (3, near), (4, other), (5, edited)]
    h = {r["doc_id"]: r for r in _hashes(spark, rows).collect()}
    assert (h[1]["ahash_lo"], h[1]["ahash_hi"]) == (
        h[2]["ahash_lo"], h[2]["ahash_hi"])
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in image_dup_pairs(_hashes(spark, rows),
                                      max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0          # exact copy
    assert pairs[(1, 3)] <= 2          # one-word edit: visually identical
    assert (1, 5) in pairs and pairs[(1, 5)] <= 16  # heavier edit, still near
    assert not any(4 in p for p in pairs)  # unrelated: no surviving pair


def test_hash_independent_of_doc_id_geometry(spark):
    # the fixed canvas makes the hash a pure function of the TEXT --
    # unlike attach_png_blob, where doc_id sets the dims
    text = " ".join(f"w{i % 17}" for i in range(50))
    h = {r["doc_id"]: r for r in _hashes(
        spark, [(7, text), (123456, text)]).collect()}
    assert (h[7]["ahash_lo"], h[7]["ahash_hi"]) == (
        h[123456]["ahash_lo"], h[123456]["ahash_hi"])


def test_halves_are_nonnegative_32bit(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    agg = image_ahash(attach_png_blob_fixed(docs)).agg(
        F.min("ahash_lo"), F.max("ahash_lo"),
        F.min("ahash_hi"), F.max("ahash_hi"),
    ).collect()[0]
    assert agg[0] >= 0 and agg[1] < 1 << 32
    assert agg[2] >= 0 and agg[3] < 1 << 32


def test_pair_join_is_equi_not_product(spark):
    from streaminglens_spark.plans.audit import formatted_plan

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    df = image_dup_pairs(image_ahash(attach_png_blob_fixed(docs)))
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the only Python is the Arrow-batched encode/decode mapInPandas
    assert "BatchEvalPython" not in plan


# ------------------------------------------- audio (energy-delta) FP


def test_audio_copy_identical_edit_small_unrelated_none(spark):
    from streaminglens_spark.functions.multimodal import (
        attach_wav_blob_fixed,
        audio_dup_pairs,
        audio_fingerprint,
    )

    base = " ".join(f"tok{i % 23} word{(i * 7) % 31}" for i in range(60))
    near = base.replace("tok3", "tokX", 1)
    other = " ".join(f"zz{(i * 13) % 41}" for i in range(80))
    rows = [(1, base), (2, base), (3, near), (4, other)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r["doc_id"]: r["afp"] for r in audio_fingerprint(
        attach_wav_blob_fixed(docs)).collect()}
    assert fps[1] == fps[2]
    assert all(0 <= v < 1 << 31 for v in fps.values())
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in audio_dup_pairs(
                 audio_fingerprint(attach_wav_blob_fixed(docs)),
                 max_hamming=6).collect()}
    assert pairs[(1, 2)] == 0
    assert pairs.get((1, 3), 99) <= 6  # one-word edit: few frame deltas flip
    assert not any(4 in p for p in pairs)


def test_audio_pair_join_is_equi_not_product(spark):
    from streaminglens_spark.functions.multimodal import (
        attach_wav_blob_fixed,
        audio_dup_pairs,
        audio_fingerprint,
    )
    from streaminglens_spark.plans.audit import formatted_plan

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    df = audio_dup_pairs(audio_fingerprint(attach_wav_blob_fixed(docs)))
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BatchEvalPython" not in plan
