"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState``.

The built-in ``session_window`` (windows.py) emits fixed-shape window aggs.
This operator is the escape hatch the reference pipeline has no analogue for
(its batch month-reopen, dags/nyc_taxi_pipeline.py:107-116, is the closest
spiritual ancestor): arbitrary per-key state carried *across micro-batches and
restarts* in the checkpoint.  Each user's open session lives in the state
store; a session is emitted exactly once, when a later event proves it closed
(inactivity gap exceeded).  Open sessions survive restarts — re-running with
the same checkpoint continues them, the stateful twin of the run-ledger
watermark.

Scale notes:
- State is shuffled by the grouping key (user_id) once; with N users the
  store holds O(N) fixed-width rows regardless of event volume — at 100 TB of
  events this is the only shape that works (event volume never accumulates).
- Arrow-batched pandas transfer (not row-at-a-time); the per-group fold is
  O(events-in-batch) with a single sort.
- Exact decimal accumulation (sum carried as a decimal string in state, same
  semantics as functions.money.exact_sum) so emitted sums are bit-identical
  to the batch/SQL equivalent regardless of batch boundaries or fold order.
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("session_value", DoubleType()),
])

# open-session state: timestamps as epoch-micros longs (tz-proof), the value
# accumulator as an exact decimal string (float state would drift per-batch)
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("dec_sum", StringType()),
    StructField("n_nonnull", LongType()),
])

_Q6 = Decimal("0.000001")


def _fold_sessions(key, pdf_iter, state: GroupState, gap_us: int):
    """Fold this batch's events for one user into the open-session state,
    yielding every session the batch proves closed."""
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    # sessions depend only on ts gaps: a ts-sort makes assignment
    # deterministic (tied events co-sessionize either way), and the decimal
    # sum is order-exact
    pdf = pdf.sort_values("ts", kind="mergesort", ignore_index=True)

    if state.exists:
        start_us, last_us, n, dec_sum, n_nonnull = state.get
        acc = Decimal(dec_sum)
    else:
        start_us = last_us = n = n_nonnull = 0
        acc = Decimal(0)

    closed: list[tuple] = []
    # normalize to ns first: Arrow may hand pandas datetime64[us] or [ns]
    ts_us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
    values = pdf["value"]
    for i in range(len(pdf)):
        t = int(ts_us.iloc[i])
        if n and t - last_us > gap_us:
            closed.append((start_us, last_us, n, acc, n_nonnull))
            start_us, n, acc, n_nonnull = t, 0, Decimal(0), 0
        if n == 0:
            start_us = t
        v = values.iloc[i]
        if pd.notna(v):
            acc += Decimal(repr(float(v))).quantize(_Q6)
            n_nonnull += 1
        n += 1
        last_us = t

    state.update((start_us, last_us, n, str(acc), n_nonnull))

    if closed:
        yield pd.DataFrame({
            "user_id": [key[0]] * len(closed),
            "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": [c[2] for c in closed],
            "session_value": [float(c[3]) if c[4] else None for c in closed],
        })


def sessionize_stateful(events_stream: DataFrame, gap_minutes: float = 30.0,
                        user_col: str = "user_id") -> DataFrame:
    """Streaming sessionization with custom per-key state: emits each
    session once, when closed by a later event past the inactivity gap.
    Output matches the batch gaps-and-islands rollup
    (windows.session_stats_batch) minus each user's still-open final session.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def fn(key, pdf_iter, state):
        return _fold_sessions(key, pdf_iter, state, gap_us)

    return events_stream.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
