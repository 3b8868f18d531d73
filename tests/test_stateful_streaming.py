"""applyInPandasWithState custom stateful operator: streaming discounted
health, checked bit-exact against the batch A13 operator on the same rows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streaminglens_spark.operators.reporting import discounted_state
from streaminglens_spark.streaming.stateful import discounted_health_stream
from tests.conftest import hidden_tmp


def test_stateful_state_survives_restart(spark, tmp_path):
    """Fault tolerance: the keyed ring-buffer state checkpoints and is
    recovered by a NEW query instance -- n_seen keeps counting and the fold
    covers rows from before the restart."""
    import json as _json
    import os

    src_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    def write_file(name, rows):
        p = os.path.join(src_dir, name)
        with open(hidden_tmp(p), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.rename(hidden_tmp(p), p)

    outputs: list[tuple] = []

    def start():
        stream = (
            spark.readStream.schema("query_id string, batch_id long, state_id int")
            .json(src_dir)
        )
        return (
            discounted_health_stream(stream)
            .writeStream.foreachBatch(
                lambda df, bid: outputs.extend(
                    (r["query_id"], r["aggregated_state"], r["n_seen"])
                    for r in df.collect()
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )

    write_file("f1.json", [
        {"query_id": "qA", "batch_id": 0, "state_id": 2},
        {"query_id": "qA", "batch_id": 1, "state_id": 3},
    ])
    q = start()
    q.processAllAvailable()
    q.stop()
    first = [o for o in outputs if o[0] == "qA"]
    assert first and first[-1][2] == 2  # n_seen after phase 1

    write_file("f2.json", [{"query_id": "qA", "batch_id": 2, "state_id": 1}])
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    final = [o for o in outputs if o[0] == "qA"][-1]
    assert final[2] == 3, "state (n_seen) not recovered across restart"
    # fold over ALL three rows (2,3,1 oldest->newest), d=0.95:
    from streaminglens_spark.streaming.stateful import _fold

    assert final[1] == _fold([0, 1, 2], [2, 3, 1], 0.95)


def test_stateful_stream_matches_batch_fold(spark):
    """A real micro-batch stream through applyInPandasWithState: the final
    update per query equals the batch discounted_state over exactly the rows
    that query saw (reconstructed from n_seen -- rate values are contiguous,
    so the first n rows of a parity class are deterministic)."""
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 10)
        .load()
        .select(
            F.concat(F.lit("q"), (F.col("value") % 2).cast("string")).alias("query_id"),
            (F.col("value") / 2).cast("long").alias("batch_id"),
            (F.col("value") % 4).cast("int").alias("state_id"),  # includes 0s
        )
    )
    out = discounted_health_stream(src)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_health")
        .outputMode("update")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM stateful_health"
            ).collect()
            if len({r["query_id"] for r in rows}) == 2 and len(rows) >= 6:
                break
            time.sleep(0.5)
        q.stop()
        rows = spark.sql("SELECT * FROM stateful_health").collect()
        assert rows, "stateful stream produced no updates"

        # newest update per query (update mode appends one row per trigger)
        last: dict[str, tuple] = {}
        for r in rows:
            cur = last.get(r["query_id"])
            if cur is None or r["n_seen"] > cur["n_seen"]:
                last[r["query_id"]] = r
        assert set(last) == {"q0", "q1"}

        for qid, got in last.items():
            par = int(qid[1])
            n = got["n_seen"]
            values = [2 * i + par for i in range(n)]  # first n rows of parity
            batch_rows = [
                (qid, v // 2, v % 4, 0, 0, 0, 0, "X") for v in values
            ]
            df = spark.createDataFrame(
                batch_rows,
                "query_id string, batch_id bigint, state_id int, analysis_ms bigint,"
                " sla_ms bigint, batch_running_ms bigint, critical_ms bigint, state string",
            )
            expected = {
                r["query_id"]: r["aggregated_state"]
                for r in discounted_state(df).collect()
            }
            assert got["aggregated_state"] == expected[qid], qid
    finally:
        if q.isActive:
            q.stop()
