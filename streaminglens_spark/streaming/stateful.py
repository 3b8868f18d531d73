"""Custom stateful streaming operator: running discounted health per query.

The reference computes its exponentially-discounted aggregate health (A13,
``helper/StreamingLensReportingHelper.scala:180-197``) driver-side over a
mutable results buffer.  This module is the Structured-Streaming-native
version: ``applyInPandasWithState`` keyed by ``query_id``, where the group
state IS the A19 ring buffer (last ``retention`` per-batch states) and each
trigger emits the updated discounted aggregate -- the engine's demonstration
of a custom stateful operator that Spark's built-in windowed aggregations
cannot express (the fold weight of every retained element changes with each
arrival, and eviction is count-based, not time-based).

Scale: state is O(retention) per query key; queries scale out across
executors exactly like any keyed state in Structured Streaming.

Semantics are bit-identical to the batch operator
(``reporting.discounted_state`` with ``last_reported_batch=-1``): retained
rows are the newest ``retention`` by batch_id; rows with ``state_id == 0``
are excluded from the fold; weights are ``d^n .. d^1`` oldest->newest;
result is ``sum(s*w)/sum(w)`` as a SEQUENTIAL left fold (same IEEE op
order), rounded to 6; no eligible rows -> 0.0.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

DISCOUNT = 0.95
RETENTION = 30

OUTPUT_SCHEMA = "query_id string, aggregated_state double, n_seen bigint"
STATE_SCHEMA = "batch_ids array<bigint>, state_ids array<int>, n_seen bigint"


def _fold(batch_ids: list[int], state_ids: list[int], discount: float) -> float:
    """The A13 fold over the retained buffer, ordered by batch_id ascending
    (oldest first), as a sequential left fold matching the batch operator's
    ``F.aggregate`` term order."""
    pairs = sorted(zip(batch_ids, state_ids))
    eligible = [s for _, s in pairs if s != 0]
    if not eligible:
        return 0.0
    n = len(eligible)
    num = 0.0
    den = 0.0
    for k, s in enumerate(eligible, start=1):  # oldest k=1 -> weight d^n
        w = discount ** (n - k + 1)
        num = num + s * w
        den = den + w
    return round(num / den, 6)


def discounted_health_stream(
    progress_states: DataFrame,
    discount: float = DISCOUNT,
    retention: int = RETENTION,
) -> DataFrame:
    """Streaming A13: input is a (possibly streaming) DataFrame with columns
    ``query_id, batch_id, state_id``; output one updated row per query per
    trigger: ``(query_id, aggregated_state, n_seen)``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            batch_ids, state_ids, n_seen = state.get
            batch_ids, state_ids = list(batch_ids), list(state_ids)
        else:
            batch_ids, state_ids, n_seen = [], [], 0
        for pdf in pdfs:
            n_seen += len(pdf)
            batch_ids.extend(int(b) for b in pdf["batch_id"])
            state_ids.extend(int(s) for s in pdf["state_id"])
        # A19 ring buffer: newest `retention` by batch_id
        order = sorted(range(len(batch_ids)), key=lambda i: batch_ids[i])
        keep = order[-retention:]
        batch_ids = [batch_ids[i] for i in keep]
        state_ids = [state_ids[i] for i in keep]
        state.update((batch_ids, state_ids, n_seen))
        yield pd.DataFrame(
            {
                "query_id": [key[0]],
                "aggregated_state": [_fold(batch_ids, state_ids, discount)],
                "n_seen": [n_seen],
            }
        )

    return progress_states.groupBy("query_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
