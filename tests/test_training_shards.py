"""Training-shard export: exact coverage, round-robin shard assignment,
in-order sequential read-back, and re-export determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.sources.sinks import (
    read_training_shard,
    write_training_shards,
)
from tests.conftest import SF_DIR

N_SHARDS = 8


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def test_export_covers_and_orders(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=N_SHARDS)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    seen = 0
    for shard in range(N_SHARDS):
        rows = read_training_shard(spark, path, shard).select(
            "shuffle_pos", "doc_id", "text"
        ).collect()
        seen += len(rows)
        pos = [r["shuffle_pos"] for r in rows]
        # the sequential scan IS the training order: already sorted
        assert pos == sorted(pos), shard
        # round-robin: every position in this shard is ≡ shard (mod N)
        assert all(p % N_SHARDS == shard for p in pos), shard
    assert seen == docs.count()
    # text survives the join+write round trip
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    assert got == orig


def test_reexport_is_byte_deterministic(spark, tmp_path):
    docs = _docs(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_training_shards(docs.repartition(3), a, n_shards=N_SHARDS)
    write_training_shards(docs.repartition(11), b, n_shards=N_SHARDS)
    ra = [
        tuple(r)
        for r in spark.read.parquet(a)
        .orderBy("shard", "shuffle_pos")
        .select("shard", "shuffle_pos", "doc_id")
        .collect()
    ]
    rb = [
        tuple(r)
        for r in spark.read.parquet(b)
        .orderBy("shard", "shuffle_pos")
        .select("shard", "shuffle_pos", "doc_id")
        .collect()
    ]
    assert ra == rb


def test_shards_are_balanced(spark, tmp_path):
    """Round-robin by dense position: shard sizes differ by at most 1."""
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=N_SHARDS)
    counts = [
        r["c"]
        for r in spark.read.parquet(path)
        .groupBy("shard")
        .agg(F.count("*").alias("c"))
        .collect()
    ]
    assert len(counts) == N_SHARDS
    assert max(counts) - min(counts) <= 1
