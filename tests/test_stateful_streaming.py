"""applyInPandasWithState custom stateful operator: streaming discounted
health, checked bit-exact against the batch A13 operator on the same rows."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streaminglens_spark.operators.reporting import discounted_state
from streaminglens_spark.streaming.stateful import discounted_health_stream


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
