"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference is batch-only, so this is capability superset (SURVEY §2.7):
the two join shapes every streaming deployment needs.

- **Stream-static** (``enrich_stream``): dimension lookup against a batch
  table.  Spark re-plans the static side per micro-batch, so a dim refresh
  (overwrite of the parquet path) is picked up automatically; the join is a
  broadcast hash join when the dim is small — no streaming state at all.
- **Stream-stream** (``interval_join_streams``): inner join on an equality
  key plus an event-time interval (right.ts in [left.ts + lower, left.ts +
  upper]).  Both sides carry watermarks so the state store evicts rows once
  they can no longer match — state is bounded by (watermark delay +
  interval width) x arrival rate, the only shape that survives unbounded
  streams.  Without the time bound Spark would (rightly) reject the join:
  unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enrich_stream(events_stream: DataFrame, dim: DataFrame, key: str,
                  broadcast_dim: bool = True) -> DataFrame:
    """Stream-static dim join; the static side re-resolves every
    micro-batch (live dim refresh), broadcast by default."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return events_stream.join(d, key, "left")


def interval_join_streams(left: DataFrame, right: DataFrame, key: str,
                          ts_col: str = "ts",
                          lower: str = "0 seconds",
                          upper: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Watermarked stream-stream inner join: rows match when keys are equal
    and ``right.ts - left.ts`` falls in [lower, upper].

    Column names from the right side get an ``r_`` prefix (both sides of a
    self-join-shaped stream pair usually share a schema).  The emitted rows
    are exactly the batch join's rows — watermarks bound STATE, not output,
    for an inner join whose input terminates (availableNow backfills).
    """
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    rw = rw.select(
        *[F.col(c).alias(f"r_{c}") for c in rw.columns]
    )
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col(f"r_{ts_col}") >= F.col(ts_col) + F.expr(f"interval {lower}"))
        & (F.col(f"r_{ts_col}") <= F.col(ts_col) + F.expr(f"interval {upper}"))
    )
    return lw.join(rw, cond, "inner")
