"""Online batch-duration anomaly detection (round-5 extension): the
streaming form of ``operators/analysis.py::duration_anomalies``.

The batch operator flags against the query's FULL duration
distribution; a live monitor only ever has the PAST, so this one flags
each arriving batch against the distribution of the batches BEFORE it
(then folds it in) -- the online convention: the verdict for a batch
never changes retroactively, and the first batches of a query are never
flagged (n < 2 carries no variance evidence).

State per query is exactly three integers (n, S = sum of durations,
Q = sum of squares) -- O(1), no window buffer, no timeout needed --
and the flag test is the same cross-multiplied integer comparison as
the batch form, evaluated in Python's arbitrary-precision ints inside
the ``applyInPandasWithState`` kernel, so the verdict stream is
bit-deterministic for a given batch arrival order.  Rows within one
trigger are processed in batch_id order (the only order that exists in
a replayed progress stream).

Invalid (NONEWBATCHES) rows pass through unflagged and do not touch
the state, mirroring the batch operator's exclusion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "query_id string, batch_id long, duration_ms long, is_anomaly boolean"
)
STATE_SCHEMA = "n long, s long, q long"


def stream_duration_anomalies(progress: DataFrame, k: int = 3) -> DataFrame:
    """Input: a (streaming) progress DataFrame with columns ``query_id,
    batch_id, ts_ms, num_input_rows, processed_rps``.  Output: one row
    per VALID batch, flagged against the prior state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n, s, q = state.get if state.exists else (0, 0, 0)
        out_b, out_d, out_f = [], [], []
        for pdf in pdfs:
            for row in pdf.sort_values("batch_id").itertuples():
                if row.num_input_rows == 0 or row.processed_rps == 0:
                    continue  # NONEWBATCHES: no verdict, no state change
                # the batch_bounds duration formula (double math truncated)
                end = int(
                    row.ts_ms + (row.num_input_rows / row.processed_rps) * 1000
                )
                d = end - int(row.ts_ms)
                flag = bool(
                    n >= 2 and (d * n - s) ** 2 > k * k * (n * q - s * s)
                )
                out_b.append(int(row.batch_id))
                out_d.append(d)
                out_f.append(flag)
                n, s, q = n + 1, s + d, q + d * d
        state.update((n, s, q))
        if out_b:
            yield pd.DataFrame(
                {
                    "query_id": [key[0]] * len(out_b),
                    "batch_id": out_b,
                    "duration_ms": out_d,
                    "is_anomaly": out_f,
                }
            )

    return progress.groupBy("query_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- online funnel tracking (round-5 extension) ------------------------------

FUNNEL_OUT_SCHEMA = "user_id long, step_idx long, step string, ms long"
FUNNEL_STATE_SCHEMA = "step long, entry long, t long"


def stream_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "view", "purchase"),
    horizon_ms: int = 6 * 3600 * 1000,
) -> DataFrame:
    """Online form of ``operators/funnel.py::funnel_counts``: per-user
    conversion tracked live, emitting one row the moment a user reaches
    each step.  State per user is three integers (current step, entry
    time, last conversion time) -- O(1), like the online anomaly
    detector.  With in-order arrival per user (what a replayed or
    event-time-sorted stream delivers) the emitted step set equals the
    batch operator's greedy-earliest chain -- pinned by the parity
    test; out-of-order arrival degrades like every online consumer of
    an unordered stream (the batch operator is the retrospective
    truth).  Input: (user_id, event_type, ms) rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    idx = {s: i for i, s in enumerate(steps)}

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        step, entry, t = state.get if state.exists else (-1, 0, 0)
        out = []
        for pdf in pdfs:
            for row in pdf.sort_values("ms").itertuples():
                ms = int(row.ms)
                et = row.event_type
                if step == -1:
                    if et == steps[0]:
                        step, entry, t = 0, ms, ms
                        out.append((int(key[0]), 0, steps[0], ms))
                elif step < len(steps) - 1 and idx.get(et) == step + 1:
                    if ms > t and ms <= entry + horizon_ms:
                        step, t = step + 1, ms
                        out.append((int(key[0]), step, et, ms))
        # users who never entered the funnel carry NO state: at scale the
        # state store holds funnel participants, not the whole user base
        if state.exists or step != -1:
            state.update((step, entry, t))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "step_idx", "step", "ms"]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
