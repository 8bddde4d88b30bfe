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
- The per-group fold is fully vectorized (numpy gap flags -> cumsum session
  ids -> one pandas groupby); no per-row Python loop.
- Exact value accumulation: values are summed in integer micro-units
  (value x 10^6, exact for DECIMAL(18,6)-representable inputs), so emitted
  sums are bit-identical to the batch/SQL ``SUM(CAST(v AS DECIMAL(18,6)))``
  regardless of batch boundaries or fold order.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("session_value", DoubleType()),
])

# open-session state: timestamps as epoch-micros longs (tz-proof), the value
# accumulator as exact integer micro-units (float state would drift per-batch)
_STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_micro", LongType()),
    StructField("n_nonnull", LongType()),
])


def _fold_sessions(key, pdf_iter, state: GroupState, gap_us: int):
    """Fold this batch's events for one user into the open-session state,
    yielding every session the batch proves closed."""
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    if len(pdf) == 0:
        return
    # sessions depend only on ts gaps: a ts-sort makes assignment
    # deterministic (tied events co-sessionize either way), and the integer
    # sum is order-exact
    pdf = pdf.sort_values("ts", kind="mergesort", ignore_index=True)

    # normalize to ns first: Arrow may hand pandas datetime64[us] or [ns]
    ts = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
    micro_f = pdf["value"].mul(1_000_000.0).round()
    nonnull = micro_f.notna().to_numpy().astype("int64")
    micro = micro_f.fillna(0.0).to_numpy().astype("int64")

    has_state = state.exists
    if has_state:
        start0, last0, n0, sum0, nn0 = state.get

    # new-session flag per event; the first event compares against the open
    # session's last timestamp when one exists
    prev = np.empty_like(ts)
    prev[1:] = ts[:-1]
    prev[0] = last0 if has_state else ts[0] - gap_us - 1
    is_new = (ts - prev) > gap_us

    sid = np.cumsum(is_new)  # sid 0 == continuation of the open session
    grouped = (
        pd.DataFrame({"sid": sid, "ts": ts, "mic": micro, "nn": nonnull})
        .groupby("sid", sort=True)
        .agg(start=("ts", "min"), end=("ts", "max"), n=("ts", "size"),
             s=("mic", "sum"), nn=("nn", "sum"))
    )
    starts = grouped["start"].to_numpy()
    ends = grouped["end"].to_numpy()
    ns = grouped["n"].to_numpy()
    sums = grouped["s"].to_numpy()
    nns = grouped["nn"].to_numpy()

    closed: list[tuple[int, int, int, int, int]] = []
    if has_state:
        if is_new[0]:
            # the batch's first event is past the gap: the open session closes
            closed.append((start0, last0, n0, sum0, nn0))
        else:
            # sid 0 continues the open session — merge its accumulators with
            # min(start)/max(end) so a late-but-in-gap event (earlier than the
            # stored last_us, or even the stored start) extends the session
            # instead of shrinking it.  Cross-batch correctness still assumes
            # events are not late past the inactivity gap (enforce upstream
            # with a watermark >= gap): an event older than the gap boundary
            # belongs to an already-emitted session and cannot be re-opened
            # under the append output contract.
            starts[0] = min(starts[0], start0)
            ends[0] = max(ends[0], last0)
            ns[0] += n0
            sums[0] += sum0
            nns[0] += nn0

    # every group but the last is provably closed; the last becomes new state
    for i in range(len(grouped) - 1):
        closed.append((int(starts[i]), int(ends[i]), int(ns[i]),
                       int(sums[i]), int(nns[i])))
    j = len(grouped) - 1
    state.update((int(starts[j]), int(ends[j]), int(ns[j]),
                  int(sums[j]), int(nns[j])))

    if closed:
        yield pd.DataFrame({
            "user_id": np.full(len(closed), key[0], dtype="int64"),
            "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
            "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
            "n_events": np.array([c[2] for c in closed], dtype="int64"),
            "session_value": [
                float(Decimal(c[3]).scaleb(-6)) if c[4] else None
                for c in closed
            ],
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
