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

# ------------------------------------------- r9: hot-bucket guard


def test_constant_media_degenerate_excluded_image(spark):
    """A solid-color corpus (every constant image hashes to 0) must
    produce ZERO join work -- the r8 verdict's 100 TB cross-product
    scenario -- with the rows surfaced on the degenerate side channel."""
    from streaminglens_spark.functions.multimodal import image_degenerate

    rows = [(i, "a" * 40) for i in range(200)]
    h = _hashes(spark, rows)
    assert image_dup_pairs(h).count() == 0
    assert image_degenerate(h).count() == 200


def test_constant_media_degenerate_excluded_audio(spark):
    from streaminglens_spark.functions.multimodal import (
        attach_wav_blob_fixed,
        audio_degenerate,
        audio_dup_pairs,
        audio_fingerprint,
    )

    docs = spark.createDataFrame(
        [(i, "a" * 40) for i in range(200)], "doc_id long, text string")
    fps = audio_fingerprint(attach_wav_blob_fixed(docs))
    assert audio_dup_pairs(fps).count() == 0
    assert audio_degenerate(fps).count() == 200


def test_hot_bucket_cap_bounds_pair_output(spark):
    """500 identical non-degenerate fingerprints in one bucket: the cap
    bounds pair output at cap*(cap-1)/2 instead of n*(n-1)/2."""
    from streaminglens_spark.functions.multimodal import audio_dup_pairs

    fps = spark.createDataFrame(
        [(i, 32, 5) for i in range(500)], "doc_id long, n_frames int, afp long")
    cap = 20
    n = audio_dup_pairs(fps, bucket_cap=cap).count()
    assert n <= cap * (cap - 1) // 2
    assert n > 0  # the kept slice still pairs


def test_two_level_cap_equals_one_window(spark):
    """The two-level bucket cap keeps the same rows as the one-window
    rank (the domain_cap equivalence argument, pinned here for the
    (band, v) shape) -- this is also what licenses the oracle's single
    row_number form."""
    from pyspark.sql import Window

    from streaminglens_spark.functions.multimodal import _cap_band_buckets
    from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P

    # skewed synthetic band table: one hot (0, 7) bucket + a diverse tail
    rows = [(i, 0, 7) for i in range(300)] + [
        (1000 + i, i % 3, 100 + i % 11) for i in range(60)]
    fb = spark.createDataFrame(rows, "doc_id long, band int, v long")
    cap = 16
    got = {(r["doc_id"], r["band"], r["v"])
           for r in _cap_band_buckets(fb, cap).collect()}
    h = (F.lit(HASH_A) * F.col("doc_id") + F.lit(HASH_B)) % F.lit(HASH_P)
    w = Window.partitionBy("band", "v").orderBy(F.col("_h"), F.col("doc_id"))
    want = {(r["doc_id"], r["band"], r["v"])
            for r in fb.withColumn("_h", h)
                       .withColumn("_r", F.row_number().over(w))
                       .filter(F.col("_r") <= cap).collect()}
    assert got == want


def test_cap_is_noop_on_fixture_pairs(spark):
    """The default cap must not change the fixture pair set (no sf0.001
    bucket is hot): capped == effectively-uncapped, so the r8 oracle
    hashes remain valid evidence."""
    from streaminglens_spark.functions.dedup import dup_corpus
    from streaminglens_spark.functions.multimodal import (
        attach_wav_blob_fixed,
        audio_dup_pairs,
        audio_fingerprint,
    )

    docs = dup_corpus(spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"))
    fps = audio_fingerprint(attach_wav_blob_fixed(docs))
    a = {tuple(r) for r in audio_dup_pairs(fps).collect()}
    b = {tuple(r) for r in audio_dup_pairs(fps, bucket_cap=10**9).collect()}
    assert a == b and a
