"""r12 extension operators: pack-efficiency report (pack_waste) and the
quality-banded curriculum order.  Value parity vs the DuckDB oracles
runs in the standard two-SF sweep (test_oracle_queries); this file pins
the integer invariants, the curriculum's band monotonicity, and the
JVM-only plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark import registry
from streaminglens_spark.plans.audit import python_udf_count

from .conftest import SF_DIR


def test_pack_waste_invariants(spark):
    """Per shard: pad is exactly the final sequence's unfilled tail
    (concat-and-chunk pads nowhere else), straddles equal the per-doc
    boundary crossings, and totals conserve vs pack_sequences."""
    from streaminglens_spark.functions.text import PACK_SEQ_LEN, pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    waste = {r["shard"]: r for r in registry.q_pack_waste(spark, SF_DIR).collect()}
    packed = pack_sequences(docs).collect()
    assert waste, "no shards"
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(waste) == set(by_shard)
    for shard, rows in by_shard.items():
        w = waste[shard]
        assert w["n_docs"] == len(rows)
        assert w["n_tokens"] == sum(r["n_tokens"] for r in rows)
        assert w["n_seqs"] == max(r["last_seq"] for r in rows) + 1
        assert w["n_straddles"] == sum(r["n_seqs"] - 1 for r in rows)
        assert w["pad_tokens"] == w["n_seqs"] * PACK_SEQ_LEN - w["n_tokens"]
        assert 0 <= w["pad_tokens"] < PACK_SEQ_LEN  # only the final tail
        assert 0 <= w["pad_micro"] <= 1_000_000
    df = registry.q_pack_waste(spark, SF_DIR)
    assert python_udf_count(df) == 0


def test_curriculum_order_band_monotone_and_dense(spark):
    """Positions are a dense 0..n-1 permutation; the band stream is
    NON-INCREASING along positions (the whole curriculum contract);
    all three bands populate on the fixture; within each band the
    relative order is the epoch-0 affine-hash shuffle's."""
    from streaminglens_spark.functions.sketch import HASH_A, HASH_B, HASH_P

    out = registry.q_curriculum_order(spark, SF_DIR).collect()
    n = len(out)
    assert n > 0
    assert sorted(r["curriculum_pos"] for r in out) == list(range(n))
    seq = sorted(out, key=lambda r: r["curriculum_pos"])
    bands = [r["band"] for r in seq]
    assert all(a >= b for a, b in zip(bands, bands[1:])), "band stream regressed"
    assert set(bands) == {0, 1, 2}, "fixture must populate all bands"
    for r in out:
        assert r["shard"] == r["curriculum_pos"] % 32
    # within-band order == affine hash order
    for band in (0, 1, 2):
        ids = [r["doc_id"] for r in seq if r["band"] == band]
        assert ids == sorted(ids, key=lambda d: (HASH_A * d + HASH_B) % HASH_P)
    df = registry.q_curriculum_order(spark, SF_DIR)
    assert python_udf_count(df) == 0


def test_dedup_attribution_invariants(spark):
    """Exactly one row per cluster non-keeper; the keeper is the
    cluster's min id (always < doc_id); the best match lies in the SAME
    cluster and carries the doc's maximum pair jaccard (ties to the
    smaller partner)."""
    from streaminglens_spark.functions.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    att = {r["doc_id"]: r for r in
           registry.q_dedup_attribution(spark, SF_DIR).collect()}
    clusters = {r["doc_id"]: r for r in
                dedup_clusters(minhash_lsh_pairs(docs, 0.5)).collect()}
    non_keepers = {d for d, r in clusters.items() if r["cluster_id"] != d}
    assert set(att) == non_keepers
    pairs = minhash_lsh_pairs(docs, 0.5).collect()
    best = {}
    for p in pairs:
        for d, o in ((p["doc_a"], p["doc_b"]), (p["doc_b"], p["doc_a"])):
            cur = best.get(d)
            if cur is None or (-p["jaccard"], o) < cur:
                best[d] = (-p["jaccard"], o)
    for d, r in att.items():
        assert r["keeper_id"] == clusters[d]["cluster_id"] < d
        assert r["cluster_size"] == clusters[d]["cluster_size"]
        assert clusters[r["best_match_id"]]["cluster_id"] == r["keeper_id"]
        nj, o = best[d]
        assert (r["best_match_id"], r["best_jaccard"]) == (o, -nj)
    df = registry.q_dedup_attribution(spark, SF_DIR)
    assert python_udf_count(df) == 0


def test_curriculum_packed_tiles_the_curriculum_stream(spark):
    """The packed manifest tiles the curriculum stream consistently:
    per shard, sequences dense, every non-final sequence exactly full,
    fill totals equal the shard's curriculum token totals."""
    from streaminglens_spark.functions.text import PACK_SEQ_LEN

    rows = registry.q_curriculum_packed(spark, SF_DIR).collect()
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    order = registry.q_curriculum_order(spark, SF_DIR).collect()
    docs = {
        r["doc_id"]: r["n_tokens"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").selectExpr(
            "doc_id", "CAST(size(split(text, ' ')) AS LONG) AS n_tokens"
        ).collect()
    }
    shard_tokens = {}
    for r in order:
        shard_tokens[r["shard"]] = (
            shard_tokens.get(r["shard"], 0) + docs[r["doc_id"]]
        )
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in rs] == list(range(len(rs)))
        for r in rs[:-1]:
            assert r["filled"] == PACK_SEQ_LEN
        assert sum(r["filled"] for r in rs) == shard_tokens[shard]
