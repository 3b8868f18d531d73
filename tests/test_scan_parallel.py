"""plans.shape.scan_parallel: the r7 guard that keeps compute-dense folds
off single-split scan parallelism.  Pins the three contract points: it
widens a narrow scan, it never touches an already-parallel input, and it
passes streaming DataFrames through untouched (repartition-free)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaminglens_spark.plans.shape import scan_parallel

SF_DIR = "/root/testdata/sf0.001"


def test_widens_single_split_scan(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    assert emb.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = scan_parallel(emb)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # result-neutral: same rows
    assert out.count() == emb.count()


def test_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 4)
    out = scan_parallel(df)
    assert out is df  # unchanged object: no extra exchange in the plan


def test_streaming_input_passes_through(spark):
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    out = scan_parallel(stream)
    assert out is stream
