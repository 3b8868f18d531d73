"""Streaming/incremental KLL: the persisted-index pattern on a real
stream -- each micro-batch appends its serialized sketch shards to a
parquet store (``foreachBatch``), and corpus-level rank quantiles are
answered from the store alone.  Bit-parity with a direct per-split merge
pins that the stream path adds nothing; rank error stays in contract."""

from __future__ import annotations

import json
import os

import numpy as np

from pyspark.sql import functions as F

from streaminglens_spark.functions.kll import (
    kll_merge_quantiles,
    kll_sketch_shards,
)
from tests.test_kll import _rank_error
from tests.conftest import hidden_tmp


def _rows():
    out = []
    for i in range(900):
        out.append(
            {
                "event_id": i,
                "event_type": "a" if i % 3 else "b",
                # deterministic heavy-ish spread, no RNG
                "value": float((i * 7919) % 10007) / 7.0,
            }
        )
    return out


def test_streaming_kll_store_matches_direct_merge(spark, tmp_path):
    rows = _rows()
    src_dir = str(tmp_path / "in")
    store = str(tmp_path / "kll_store")
    os.makedirs(src_dir)
    for part in range(3):
        path = os.path.join(src_dir, f"f{part}.json")
        with open(hidden_tmp(path), "w") as f:
            for r in rows[part::3]:
                f.write(json.dumps(r) + "\n")
        os.rename(hidden_tmp(path), path)

    schema = "event_id long, event_type string, value double"

    def sink(batch_df, batch_id):
        kll_sketch_shards(batch_df).write.mode("append").parquet(store)

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
        .writeStream.foreachBatch(sink)
        .queryName("kll_ingest")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r["event_type"]: (r["n"], [r["p50_est"], r["p95_est"], r["p99_est"]])
        for r in kll_merge_quantiles(spark.read.parquet(store)).collect()
    }

    # direct merge over the same per-file splits (order-independent: the
    # merge concatenates per (shard, level) and sorts, so batch ORDER
    # cannot matter -- only the split itself)
    tables = [
        kll_sketch_shards(spark.read.schema(schema).json(os.path.join(src_dir, f"f{p}.json")))
        for p in range(3)
    ]
    want = {
        r["event_type"]: (r["n"], [r["p50_est"], r["p95_est"], r["p99_est"]])
        for r in kll_merge_quantiles(*tables).collect()
    }
    assert got == want

    # contract on the store-answered quantiles: exact n + rank error
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for etype, (n, ests) in got.items():
        vals = np.asarray(by_type[etype])
        assert n == len(vals)
        for p, est in zip((50, 95, 99), ests):
            assert _rank_error(vals, est, p) <= 0.02, (etype, p)
