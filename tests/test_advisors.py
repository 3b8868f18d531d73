"""Partition-sizing and watermark-delay advisors (r5 continued).
Oracle hash parity lives in test_oracle_queries.py."""

from __future__ import annotations

import datetime

from streaminglens_spark.functions.advisor import (
    TARGET_PARTITION_BYTES,
    partition_advisor,
    watermark_advisor,
)
from streaminglens_spark import registry
from tests.conftest import SF_DIR


def test_partition_advisor_golden(spark):
    # 3 rows, 300 MB payload -> 3 shuffle partitions at 128 MB, 1 file
    rows = [(i, "x" * (100 * 1024 * 1024 // 1024)) for i in range(3)]
    # (use 100 KB strings scaled: fake bytes via many rows instead)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["n_rows"] == 3
    assert r["data_bytes"] == 3 * (100 * 1024 * 1024 // 1024)
    assert r["rec_shuffle_partitions"] == 1  # 300 KB << 128 MB
    assert r["rows_per_partition"] == 3


def test_partition_advisor_scales_with_bytes(spark):
    # synthesize row count x string length crossing one target boundary
    n = 40
    chunk = TARGET_PARTITION_BYTES // 16  # 8 MB
    rows = [(i, "y" * chunk) for i in range(n)]  # 320 MB total
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["data_bytes"] == n * chunk
    assert r["rec_shuffle_partitions"] == 3  # ceil(320/128)
    assert r["rec_output_files"] == 1
    assert r["rows_per_partition"] == n // 3


def test_partition_advisor_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    r = partition_advisor(df).collect()[0]
    assert r["n_rows"] == 0 and r["data_bytes"] == 0
    assert r["rec_shuffle_partitions"] == 1 and r["rec_output_files"] == 1


def test_watermark_advisor_golden(spark):
    base = datetime.datetime(2024, 1, 1)

    def ts(s):
        return base + datetime.timedelta(seconds=s)

    # user 1 arrival order: ts 10, 20, 5 (late by 15 s), 30
    rows = [
        (0, ts(10), 1, "a", 0.0, "{}"),
        (1, ts(20), 1, "a", 0.0, "{}"),
        (2, ts(5), 1, "a", 0.0, "{}"),
        (3, ts(30), 1, "a", 0.0, "{}"),
        # user 2: perfectly ordered
        (4, ts(1), 2, "a", 0.0, "{}"),
        (5, ts(2), 2, "a", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r["delay_ms"]: r
        for r in watermark_advisor(
            df, delays_ms=(0, 10_000, 20_000)
        ).collect()
    }
    assert out[0]["n_events"] == 6
    assert out[0]["n_late"] == 1          # the 15 s-late event
    assert out[10_000]["n_late"] == 1     # still later than 10 s
    assert out[20_000]["n_late"] == 0     # 20 s watermark absorbs it
    assert out[0]["permille"] == 1000 // 6


def test_watermark_advisor_monotone_on_fixture(spark):
    rows = sorted(
        registry.q_watermark_advisor(spark, SF_DIR).collect(),
        key=lambda r: r["delay_ms"],
    )
    lates = [r["n_late"] for r in rows]
    assert lates == sorted(lates, reverse=True), lates
    assert all(r["n_events"] == rows[0]["n_events"] for r in rows)


def test_job_advisor_composes_and_picks(spark):
    """r14 (r13 verdict ask #6): the composed recommendations table
    carries every advisor family once, and each row's value equals the
    standalone advisor's pick replayed by hand -- the composition adds
    selection, never re-derivation.  Oracle hash parity at two SFs runs
    in test_oracle_queries."""
    from streaminglens_spark.functions.advisor import (
        LSH_RECALL_FLOOR_MICRO,
        WATERMARK_ACCEPT_PERMILLE,
        job_advisor,
    )
    from streaminglens_spark.functions.dedup import lsh_parameter_advisor
    from streaminglens_spark.operators.analysis import recommend_sla
    from streaminglens_spark.sources.loaders import load_table
    from streaminglens_spark.telemetry import derive_telemetry

    events = load_table(spark, SF_DIR, "events")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = derive_telemetry(spark, events)
    out = job_advisor(t.progress, docs, events).collect()
    rows = {(r["advisor"], r["scope"], r["knob"]): r for r in out}
    assert len(rows) == len(out)  # (advisor, scope, knob) is a key

    # partitioning: pass-through of partition_advisor
    p = partition_advisor(docs).collect()[0]
    assert rows[("partitioning", "corpus", "spark.sql.shuffle.partitions")][
        "value"] == p["rec_shuffle_partitions"]
    assert rows[("partitioning", "corpus", "output_files")]["value"] == (
        p["rec_output_files"])

    # watermark: smallest acceptable delay, else max
    wm = {r["delay_ms"]: r["permille"]
          for r in watermark_advisor(events).collect()}
    ok = [d for d, pm in wm.items() if pm <= WATERMARK_ACCEPT_PERMILLE]
    want = min(ok) if ok else max(wm)
    got = rows[("watermark", "events", "withWatermark.delay_ms")]
    assert got["value"] == want and got["basis"] == wm[want]

    # sla: one row per query from recommend_sla
    sla = {r["query_id"]: r for r in recommend_sla(t.progress).collect()}
    sla_rows = [r for r in out if r["advisor"] == "sla"]
    assert {r["scope"] for r in sla_rows} == set(sla)
    for r in sla_rows:
        assert r["value"] == sla[r["scope"]]["recommended_sla_ms"]
        assert r["basis"] == sla[r["scope"]]["p99_ms"]

    # dedup: cheapest banding meeting the recall floor (hand replay)
    cand = lsh_parameter_advisor(docs).collect()
    qual = [r for r in cand if r["recall_micro"] >= LSH_RECALL_FLOOR_MICRO]
    if qual:
        best = min(qual, key=lambda r: (r["exp_candidates_micro"], r["bands"]))
    else:
        best = min(cand, key=lambda r: (-r["recall_micro"], r["bands"]))
    assert rows[("dedup", "corpus", "lsh.bands")]["value"] == best["bands"]
    assert rows[("dedup", "corpus", "lsh.rows_per_band")]["value"] == (
        best["rows_per_band"])
