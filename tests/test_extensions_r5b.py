"""Round-5b extensions: chunk-level dedup, deterministic corpus shuffle,
per-source manifest.  Oracle hash-equality runs in test_oracle_queries
(LOCAL_ORACLE); this file pins goldens and invariants."""

from __future__ import annotations

from collections import Counter

from streaminglens_spark.functions.sampling import corpus_shuffle
from streaminglens_spark.functions.text import CHUNK_TOKENS, chunk_dedup


def test_chunk_dedup_finds_shared_passage(spark):
    # one CHUNK_TOKENS-long boilerplate passage pasted into three docs
    # whose remaining text is distinct: exactly that chunk must show
    # dup_count == 3 with the smallest (doc_id, chunk_idx) as keeper
    passage = " ".join(f"boiler{i}" for i in range(CHUNK_TOKENS))
    rows = [
        (1, passage),
        (2, passage + " " + " ".join(f"a{i}" for i in range(CHUNK_TOKENS))),
        (3, " ".join(f"b{i}" for i in range(48)) + " " + passage),
        (4, " ".join(f"c{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["chunk_md5"]: r for r in chunk_dedup(df).collect()}
    dups = [r for r in out.values() for _ in [0] if r["dup_count"] > 1]
    # doc 1 chunk 0, doc 2 chunk 0, doc 3 chunk 1 (starts at token 48)
    shared = [r for r in out.values() if r["dup_count"] == 3]
    assert len(shared) == 1
    r = shared[0]
    assert (r["keep_doc_id"], r["keep_chunk_idx"]) == (1, 0)
    assert r["n_toks"] == CHUNK_TOKENS
    assert dups == shared  # no other passage repeats


def test_corpus_shuffle_is_dense_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    rows = corpus_shuffle(df).collect()
    assert len(rows) == 500
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(500))
    # shards are round-robin over positions: perfectly balanced
    shard_counts = Counter(r["shard"] for r in rows)
    assert set(shard_counts) == set(range(32))
    assert max(shard_counts.values()) - min(shard_counts.values()) <= 1
    # the order is a real shuffle, not identity
    by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["shuffle_pos"])]
    assert by_pos != sorted(by_pos)


def test_corpus_shuffle_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {(r["doc_id"], r["shuffle_pos"]) for r in corpus_shuffle(df.repartition(1)).collect()}
    b = {(r["doc_id"], r["shuffle_pos"]) for r in corpus_shuffle(df.repartition(11)).collect()}
    assert a == b


def test_corpus_shuffle_no_global_sort(spark):
    """The ORACLE is the naive global row_number (single-partition sort);
    the Spark plan must not be: the only SinglePartition work allowed is
    the tiny per-shard offsets window (n_shards rows)."""
    from streaminglens_spark.plans.audit import formatted_plan

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = formatted_plan(corpus_shuffle(df.select("doc_id")))
    # the big-side rank must be partitioned by shard (same criterion as
    # the assign_row_ids plan pin); the only Exchange SinglePartition
    # nodes allowed are the tiny bounds/offsets tables -- the join-back
    # duplicates that subtree once, hence <= 2
    assert "hashpartitioning(_shard" in plan, plan[:800]
    assert plan.count("Exchange SinglePartition") <= 2, plan[:800]


# ------------------------------------------------------- incremental dedup

def test_dedup_increment_verdicts(spark):
    """Exact copies of corpus docs score 'certain'; suffixed copies score
    'near' with a high (but < 1.0) estimate; unrelated docs don't match."""
    from streaminglens_spark import cache
    from streaminglens_spark.functions.dedup import (
        DUP_SHIFT,
        dedup_against_index,
        minhash_index,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    try:
        corpus = docs.filter(F.col("doc_id") < 40)
        new = (
            corpus.filter(F.col("doc_id") < 20)
            .select(
                (F.col("doc_id") + DUP_SHIFT).alias("doc_id"),
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.col("text"), F.lit(" tiny suffix")),
                ).otherwise(F.col("text")).alias("text"),
            )
        )
        out = dedup_against_index(new, minhash_index(corpus)).collect()
        by_new = {}
        for r in out:
            by_new.setdefault(r["new_id"], []).append(r)
        for nid, rows in by_new.items():
            orig = nid - DUP_SHIFT
            own = [r for r in rows if r["match_id"] == orig]
            assert own, (nid, rows)  # the true original is always found
            r = own[0]
            if orig % 2 == 0:
                # a tiny suffix often leaves all 16 minima untouched, so
                # est may still be 1.0 -- but md5 differs, so the verdict
                # must downgrade to 'near' (the sketch-only contract:
                # 'certain' requires BOTH full-signature AND md5 equality)
                assert r["verdict"] == "near", r
            else:
                assert r["verdict"] == "certain" and r["est"] == 1.0, r
        # every unperturbed copy surfaced; perturbed ones may rarely miss
        # the banding (documented LSH recall), but on this fixture none do
        assert len(by_new) == 20
    finally:
        cache.release_caches()


# --------------------------------------------------- windowed cms probe

def test_cms_probe_overestimates_only(spark):
    """Count-min's one-sided guarantee, per window: the tracked-key
    estimate is never below the true count (absent cells count 0, which
    is exact -- an untouched cell means the key truly never hashed
    there in that window)."""
    from pyspark.sql import functions as F

    from streaminglens_spark.functions.sketch import (
        cms_window_probe,
        count_min_windowed,
    )
    from streaminglens_spark.operators.windows import _ev
    from tests.conftest import SF_DIR

    e = _ev(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    cells = count_min_windowed(
        e.select(F.timestamp_millis(F.col("ms")).alias("ets"), "user_id")
    )
    keys = list(range(10))
    est = {
        (r["window_start_ms"], r["key"]): r["est"]
        for r in cms_window_probe(cells, keys).collect()
    }
    truth = {
        (r["w"], r["user_id"]): r["n"]
        for r in e.filter(F.col("user_id") < 10)
        .groupBy((F.expr("ms div 3600000") * 3600000).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert truth  # fixture has tracked-key traffic
    for k, n in truth.items():
        assert est.get(k, 0) >= n, (k, n, est.get(k, 0))


def test_dedup_index_parquet_round_trip(spark, tmp_path):
    """The index IS the persisted artifact: writing minhash_index to
    parquet and reading it back must produce verdicts identical to using
    the freshly-computed index -- the reuse contract an incremental
    pipeline depends on across runs."""
    from pyspark.sql import functions as F

    from streaminglens_spark import cache
    from streaminglens_spark.functions.dedup import (
        DUP_SHIFT,
        dedup_against_index,
        minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    try:
        corpus = docs.filter(F.col("doc_id") < 40)
        new = corpus.filter(F.col("doc_id") < 12).select(
            (F.col("doc_id") + DUP_SHIFT).alias("doc_id"), "text"
        )
        fresh = minhash_index(corpus)
        path = str(tmp_path / "index.parquet")
        fresh.write.parquet(path)
        reloaded = spark.read.parquet(path)
        want = {tuple(r) for r in dedup_against_index(new, fresh).collect()}
        got = {tuple(r) for r in dedup_against_index(new, reloaded).collect()}
        assert got == want and len(got) >= 12
    finally:
        cache.release_caches()
