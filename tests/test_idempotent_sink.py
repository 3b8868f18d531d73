"""Exactly-once foreachBatch sink: replay skips committed batches,
half-written batches stay invisible to readers, and a real stream's
committed output equals its input row-for-row."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaminglens_spark.sources.sinks import (
    idempotent_batch_sink,
    read_committed,
)
from tests.conftest import hidden_tmp


def _write_files(src_dir, rows, parts=3):
    os.makedirs(src_dir)
    for part in range(parts):
        path = os.path.join(src_dir, f"f{part}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in rows[part::parts]:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)


def test_stream_commits_exactly_the_input(spark, tmp_path):
    rows = [{"k": i, "v": f"r{i}"} for i in range(300)]
    src = str(tmp_path / "in")
    store = str(tmp_path / "store")
    _write_files(src, rows)
    q = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .writeStream.foreachBatch(idempotent_batch_sink(store))
        .queryName("eo_sink")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = read_committed(spark, store)
    assert "batch_id" in out.columns
    assert out.select("batch_id").distinct().count() == 3
    got = sorted((r["k"], r["v"]) for r in out.collect())
    assert got == sorted((r["k"], r["v"]) for r in rows)


def test_replayed_batch_is_skipped(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = idempotent_batch_sink(store)
    first = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    sink(first, 7)
    # at-least-once replay delivers the same batch id again -- possibly
    # with a recomputed (different!) DataFrame; the committed output must
    # not change
    replay = spark.createDataFrame([(9, "z")], "k long, v string")
    sink(replay, 7)
    got = sorted((r["k"], r["v"]) for r in read_committed(spark, store).collect())
    assert got == [(1, "a"), (2, "b")]


def test_half_written_batch_invisible_then_healed(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = idempotent_batch_sink(store)
    sink(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    # crash mid-write: parquet files exist, marker absent
    torn = spark.createDataFrame([(5, "x"), (6, "y")], "k long, v string")
    torn.write.mode("overwrite").parquet(f"{store}/batch_id=1")
    assert read_committed(spark, store).count() == 1  # torn batch invisible
    # replay of batch 1 rewrites and commits it
    sink(torn, 1)
    got = sorted(r["k"] for r in read_committed(spark, store).collect())
    assert got == [1, 5, 6]


def test_read_committed_empty_raises(spark, tmp_path):
    import pytest

    store = str(tmp_path / "store")
    os.makedirs(store)
    with pytest.raises(ValueError, match="no committed batches"):
        read_committed(spark, store)
