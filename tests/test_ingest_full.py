"""r11 flagship composition (q_ingest_full): the q_ingest_e2e front
composed with the loader tail (cluster-aware train/val split + epoch
training order).  The value hash vs the composed DuckDB oracle runs in
the standard two-SF sweep (test_oracle_queries); this file pins the
PLAN (bounded exchanges, no Python eval nodes), the never-straddles
invariant THROUGH the composition, the train-order shape, and the
leakage_safe_split precomputed-clusters bit-equality (r10 verdict
ask #3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.plans.audit import exchange_count

from .conftest import SF_DIR


def test_ingest_full_plan_is_bounded(spark):
    """The composition seam budget: the e2e front's spine pattern plus
    the split chain and the epoch order must stay within a handful of
    id-keyed joins of the front's own budget (measured 23)."""
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry.q_ingest_full(spark, SF_DIR)
        n = exchange_count(df)
        assert n <= 26, n
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_ingest_full_never_straddles_and_order_shape(spark):
    """The two contract invariants of the loader tail, held THROUGH the
    composition: (a) never-straddles -- any near-dup pair of the split
    corpus with both ends admitted lands on one side, and every output
    cluster is single-sided; (b) the train order is a dense 0..n-1
    permutation with round-robin shards, val rows carry NULLs."""
    from streaminglens_spark.functions.dedup import minhash_lsh_pairs

    out = registry.q_ingest_full(spark, SF_DIR).collect()
    assert out, "flagship produced an empty admitted set"
    by_doc = {r["doc_id"]: r for r in out}
    assert len(by_doc) == len(out)  # one row per admitted doc

    # (a) single-sided clusters in the output...
    sides = {}
    for r in out:
        sides.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in sides.values())
    # ...and against the actual near-dup pair set of the split corpus
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_pairs(corpus, 0.5).collect()
    for p in pairs:
        a, b = by_doc.get(p["doc_a"]), by_doc.get(p["doc_b"])
        if a is not None and b is not None:
            assert a["split"] == b["split"], (p["doc_a"], p["doc_b"])

    # (b) train order: dense positions, shard = pos % 32; val: NULLs
    train = sorted(
        r["shuffle_pos"] for r in out if r["split"] == "train"
    )
    assert train == list(range(len(train)))
    for r in out:
        if r["split"] == "train":
            assert r["shard"] == r["shuffle_pos"] % 32
        else:
            assert r["shuffle_pos"] is None and r["shard"] is None


def test_leakage_split_precomputed_clusters_bit_equal(spark):
    """r10 verdict ask #3: a pipeline that already ran dedup passes its
    cluster table via ``clusters=`` and must get the bit-identical split
    without paying pair formation twice."""
    from streaminglens_spark.functions.dedup import (
        dedup_clusters,
        leakage_safe_split,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inline = sorted(
        tuple(r) for r in leakage_safe_split(docs, val_frac=0.2).collect()
    )
    pre = dedup_clusters(minhash_lsh_pairs(docs, 0.5))
    reused = sorted(
        tuple(r)
        for r in leakage_safe_split(docs, val_frac=0.2, clusters=pre).collect()
    )
    assert inline == reused
