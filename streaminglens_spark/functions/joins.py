"""Temporal join operators: as-of join and bucketed range (interval) join.

SURVEY.md §2d records that the reference has no sort-merge/theta/as-of
joins (`helper/JobOverlapHelper.scala` and `common/MicroBatchContext.scala`
only ever do hash-map lookups and a `[min,max]` range predicate); these are
the two temporal-join shapes a large-scale training-data / telemetry
pipeline actually needs, built Spark-first:

- ``asof_join``: for each left row, the payload of the latest right row at
  or before it (per key).  Implemented as the classic UNION-MERGE: tag both
  sides, union, one window per key ordered by (ts, side, tie) carrying
  ``last(payload, ignorenulls=True)``, keep left rows.  ONE shuffle on the
  key, zero join explosion -- the naive join-then-rank plan materializes
  |left| x |matching right| intermediate rows (the DuckDB oracle does
  exactly that, which is what makes it an independent check).
- ``interval_join``: point-in-interval join via time bucketing: each
  interval is exploded to the fixed-width buckets it spans, each point maps
  to exactly ONE bucket, so the candidate join is an equi-join on bucket
  followed by the exact containment filter.  No candidate pair is produced
  twice (a point has one bucket), so no dedup pass is needed.  At 100 TB
  the bucket width is the knob: pick it near the median interval width so
  an interval spans O(1) buckets and a bucket holds O(points/bucket) rows;
  a pathological hot bucket is AQE's skew-join case.

Both keep every output column integer/exact (epoch millis, cents) so the
DuckDB comparison is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.windows import _ev

BUCKET_MS = 3_600_000  # 1 hour: >= the typical batch-bounds interval width


def _ms(df: DataFrame, col: str) -> F.Column:
    """Epoch-millis column for a fixture timestamp (same 3-way dtype logic
    as operators/windows._ev: nanos-as-long parquet, NTZ, or proper ts)."""
    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":
        return F.expr(f"{col} div 1000000")
    if dtype.startswith("timestamp_ntz"):
        return F.unix_millis(F.col(col).cast("timestamp"))
    return F.unix_millis(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    payload: list[str],
    tie: str,
) -> DataFrame:
    """Generic as-of join (union-merge).  ``left`` must carry ``key`` and
    ``ms``; ``right`` must carry ``key``, ``ms``, ``tie`` and the
    ``payload`` columns.  For each left row: the payload of the right row
    with the greatest ``(ms, tie)`` such that ``right.ms <= left.ms`` for
    the same key (ties at equal ms broken toward the larger ``tie``, which
    must be unique per (key, ms) for a deterministic result).  Left rows
    with no prior right row keep NULL payloads (left-outer semantics).

    Plan: one Exchange on ``key``, one sort per partition -- the merge is
    ``last(_pay, ignorenulls=True)`` over rows (right sorts before left at
    equal ms so same-instant right rows are visible).  Never builds the
    |left| x |right| candidate product.
    """
    r = right.select(
        F.col(key),
        F.col("ms"),
        F.lit(0).alias("_side"),
        F.col(tie).alias("_tie"),
        F.struct(*[F.col(c) for c in payload]).alias("_pay"),
    )
    lft = left.withColumn("_side", F.lit(1)).withColumn(
        "_tie", F.lit(None).cast(r.schema["_tie"].dataType)
    ).withColumn("_pay", F.lit(None).cast(r.schema["_pay"].dataType))
    merged = lft.select(r.columns + [c for c in left.columns if c not in {key, "ms"}]).unionByName(
        r, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("ms"), F.col("_side"), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("_asof", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .drop("_side", "_tie", "_pay")
    )


def events_asof_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """Fixture binding: each event joined to the user's most recent order at
    or before the event time (key ``user_id = o_custkey``) -- the canonical
    "state of the account when the event happened" enrichment.  Returns
    (event_id, user_id, ts_ms, asof_orderkey, asof_price_cents); events
    with no prior order keep NULLs."""
    e = _ev(events).select("event_id", "user_id", "ms")
    return _asof_orders_prepared(e, orders)


def _asof_orders_prepared(e: DataFrame, orders: DataFrame) -> DataFrame:
    """Shared core of the batch and streaming (foreachBatch) as-of
    enrichment: ``e`` is already (event_id, user_id, ms)."""
    o = orders.select(
        F.col("o_custkey").alias("user_id"),
        _ms(orders, "o_orderdate").alias("ms"),
        F.col("o_orderkey").alias("asof_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("asof_price_cents"),
    )
    joined = asof_join(
        e, o, key="user_id", payload=["asof_orderkey", "asof_price_cents"], tie="asof_orderkey"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ms").alias("ts_ms"),
        F.col("_asof.asof_orderkey").alias("asof_orderkey"),
        F.col("_asof.asof_price_cents").alias("asof_price_cents"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_ms: int = BUCKET_MS,
) -> DataFrame:
    """Generic bucketed point-in-interval join.  ``points`` carries ``ms``
    (+ payload columns); ``intervals`` carries half-open ``[start_ms,
    end_ms)`` (+ id columns).  Returns the matched pairs (all columns of
    both inputs).

    Candidate generation: interval -> ``sequence(start_ms div W,
    (end_ms-1) div W)`` exploded to one row per spanned bucket; point ->
    its single bucket; equi-join on bucket; exact ``start <= ms < end``
    filter.  Empty intervals (end <= start) span no bucket and drop out.
    """
    # TRUNCATING bucketing (Spark `div` == DuckDB integer `//`, both
    # truncate toward zero -- measured).  ms -> trunc(ms/W) is monotone
    # non-decreasing, so an interval's bucket range [b(start), b(end-1)]
    # always covers every contained point's bucket -- candidate generation
    # stays COMPLETE for negative (pre-1970) ms too; bucket 0 is merely
    # double-width around the epoch (a width, not a correctness, effect).
    # Pinned with pre-epoch inputs in tests/test_advice_r4.py.
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(
                F.col("end_ms") > F.col("start_ms"),
                F.sequence(
                    F.expr(f"start_ms div {bucket_ms}"),
                    F.expr(f"(end_ms - 1) div {bucket_ms}"),
                ),
            ).otherwise(F.array())
        ),
    )
    pt = points.withColumn("_bucket", F.expr(f"ms div {bucket_ms}"))
    return (
        pt.join(iv, "_bucket")
        .filter((F.col("ms") >= F.col("start_ms")) & (F.col("ms") < F.col("end_ms")))
        .drop("_bucket")
    )


def events_in_batches(events: DataFrame, bounds: DataFrame) -> DataFrame:
    """Fixture binding: attribute raw ``events`` rows to the micro-batch
    bounds the A1 analysis estimated (reference
    ``analyzer/StreamingQueryAnalyzer.scala:118-129`` computes the bounds;
    it never joins raw data back -- this is the natural extension that
    answers "what was actually ingested during that batch window").
    Returns per-batch (query_id, batch_id, n_events, sum_cents) over events
    with ``start_ms <= ts < end_ms``; invalid bounds (0,0) match nothing.
    """
    e = _ev(events).select("ms", "cents")
    iv = bounds.select("query_id", "batch_id", "start_ms", "end_ms")
    return (
        interval_join(e, iv)
        .groupBy("query_id", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    salt_src: str | None = None,
) -> DataFrame:
    """Skew-safe shuffle equi-join (round-5 continued extension): the
    standard SALTING rewrite for the case AQE's skew-join split cannot
    cover -- a hot key whose rows overflow ANY single partition (at 100 TB
    a handful of event types / null-ish defaults routinely hold >> one
    executor's share; hash-partitioning ``big`` by the join key then
    funnels those rows into one task).

    Rewrite: ``big`` gets a deterministic per-row salt in ``[0, n_salts)``
    (xxhash64 of ``salt_src`` -- a row-unique column if the caller has
    one -- else of the whole row struct); ``small`` is replicated
    ``n_salts`` times via one explode; the join key becomes
    ``(key, salt)``, so a hot key's rows spread over ``n_salts`` tasks
    while every big row still meets every matching small row exactly once
    -- the result is ROW-FOR-ROW equal to the plain inner join, duplicate
    keys on either side included (pinned by the parity test).

    The small side carries a ``shuffle_hash`` hint: salting is only
    reached when the small side is too big to broadcast (a broadcast join
    has no shuffle and therefore no skew; Spark would otherwise broadcast
    a tiny fixture dim and silently bypass the path under test).  Cost
    model: replicates ``small`` ``n_salts`` times -- pick ``n_salts``
    around hot-key-rows / target-partition-rows, and keep
    ``n_salts * |small|`` well under the big side's shuffle volume."""
    keys = [on] if isinstance(on, str) else list(on)
    if salt_src is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    else:
        salt = F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(n_salts))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).hint("shuffle_hash")
    return b.join(s, keys + ["_salt"]).drop("_salt")
