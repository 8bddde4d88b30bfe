"""Temporal joins Spark has no native operator for: as-of join and
range (interval) join.

Both are implemented as compositions of shuffle-friendly primitives rather
than inequality joins: Spark plans a non-equi join as BroadcastNestedLoopJoin
(or a cartesian product), which is O(|L| x |R|) per key and dies at scale.

- ``asof_join``: union the two sides, one window pass per key ordered by
  time, carry the right side's latest values forward with
  ``last(ignorenulls)``.  One shuffle on the key, O(n log n) per partition,
  no row amplification — the standard distributed as-of formulation.
- ``interval_count_join``: bucketize time by the window length so every
  interval overlaps <= 2 buckets, equi-join on (key, bucket), then apply the
  exact containment predicate.  Candidate fan-out is bounded by bucket
  population, never |L| x |R|.

Both operators admit exact SQL oracles (DuckDB ``ASOF JOIN`` / inequality
join), so they are value-checked per-round, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_us(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP *and* TIMESTAMP_NTZ inputs
    (``unix_micros`` alone rejects NTZ, which is what Spark 4 infers for
    parquet timestamp[us] without timezone).  The NTZ->LTZ cast interprets
    in the session zone; the uses here are bucket keys and range bounds,
    where a consistent offset only shifts bucket boundaries.  NOT suitable
    for wall-clock gap arithmetic when the session zone observes DST (the
    offset differs per instant) — gap logic uses ``timestampdiff``
    instead (see ``asof_join``'s tolerance)."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame, key: str = "user_id",
              ts_col: str = "ts", right_cols: tuple[str, ...] = ("value",),
              suffix: str = "_asof", direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """For every left row, attach the nearest right row for the same key:
    ``direction="backward"`` (default) takes the most recent right row with
    ``right.ts <= left.ts``; ``direction="forward"`` the earliest right row
    with ``right.ts >= left.ts``.  ``tolerance_us`` (microseconds) NULLs the
    match when the time gap exceeds it — pandas ``merge_asof`` semantics.

    Contract: the right side must be unique per (key, ts) — dedupe it first
    (ties make any as-of join engine-dependent).  Left rows with no match
    get NULLs.  Output: all left columns + ``ts{suffix}`` + ``<c>{suffix}``
    for each of ``right_cols``.  Both directions are the same
    union+window single-shuffle plan (the forward pass just orders the
    window descending) — never a nested-loop inequality join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carried = [F.col(ts_col).alias(f"__r_{ts_col}")] + [
        F.col(c).alias(f"__r_{c}") for c in right_cols
    ]
    r = right.select(F.col(key), F.col(ts_col), F.lit(0).alias("__side"),
                     *carried)
    l_cols = [c for c in left.columns]
    l = left.select(*l_cols, F.lit(1).alias("__side"),
                    *[F.lit(None).cast(t.dataType).alias(f"__r_{c}")
                      for c, t in zip([ts_col, *right_cols],
                                      [right.schema[ts_col],
                                       *[right.schema[c] for c in right_cols]])])
    unioned = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal ts, so "<=" (backward) /
    # ">=" (forward, via the mirrored descending order) semantics hold;
    # within a key the window is one ordered pass, carried values are the
    # nearest non-null right-side snapshot in the scan direction
    ts_ord = (F.col(ts_col).asc() if direction == "backward"
              else F.col(ts_col).desc())
    w = (
        Window.partitionBy(key)
        .orderBy(ts_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[F.col(c) for c in unioned.columns],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in (ts_col, *right_cols)
        ],
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        # timestampdiff, not an epoch-cast difference: for TIMESTAMP_NTZ
        # inputs the NTZ->session-zone epoch cast shifts by the zone offset
        # AT EACH instant, so a DST transition between the two timestamps
        # would distort the gap by an hour
        gap = F.abs(
            F.expr(f"timestampdiff(MICROSECOND, __f_{ts_col}, {ts_col})")
        )
        keep = F.col(f"__f_{ts_col}").isNotNull() & (gap <= tolerance_us)
        out = out.select(
            *[c for c in out.columns if not c.startswith("__f_")],
            *[F.when(keep, F.col(f"__f_{c}")).alias(f"__f_{c}")
              for c in (ts_col, *right_cols)],
        )
    return out.select(
        *l_cols,
        F.col(f"__f_{ts_col}").alias(f"{ts_col}{suffix}"),
        *[F.col(f"__f_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def interval_count_join(intervals: DataFrame, events: DataFrame,
                        key: str = "user_id",
                        interval_id: str = "interval_id",
                        start_col: str = "start_ts", end_col: str = "end_ts",
                        ts_col: str = "ts",
                        bucket_width_s: int | None = None) -> DataFrame:
    """Count events whose ``ts`` falls in ``[start, end)`` of each interval
    for the same key — a range join expressed as a bucketized equi-join.

    ``bucket_width_s`` defaults to the max interval length; any interval then
    overlaps at most 2 buckets, so the equi-join candidate set is linear in
    the co-bucketed event mass (at 100 TB: tune the width to the p99
    interval, never leave it to a nested-loop plan).  Intervals with no
    events are kept with ``n_events = 0``.
    """
    if bucket_width_s is None:
        bucket_width_s = int(
            intervals.select(
                F.max(
                    _epoch_us(F.col(end_col)) - _epoch_us(F.col(start_col))
                ).alias("m")
            ).first()["m"] // 1_000_000
        ) or 1
    width_us = bucket_width_s * 1_000_000

    def bucket(col):  # floor-division, exact for negative epochs too
        return F.floor(col / F.lit(width_us)).cast("long")

    iv = intervals.filter(F.col(end_col) > F.col(start_col)).select(
        interval_id, key, start_col, end_col,
        F.explode(
            F.sequence(
                bucket(_epoch_us(F.col(start_col))),
                # end is exclusive: the bucket of the last contained microsecond
                bucket(_epoch_us(F.col(end_col)) - 1),
            )
        ).alias("__bucket"),
    )
    ev = events.select(
        F.col(key), F.col(ts_col),
        bucket(_epoch_us(F.col(ts_col))).alias("__bucket"),
    )
    matched = (
        iv.join(ev, [key, "__bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .groupBy(interval_id)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        intervals.join(matched, interval_id, "left")
        .withColumn("n_events", F.coalesce(F.col("n_events"), F.lit(0)))
    )


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          key: str = "user_id",
                          left_id: str = "l_id", right_id: str = "r_id",
                          l_start: str = "l_start", l_end: str = "l_end",
                          r_start: str = "r_start", r_end: str = "r_end",
                          bucket_width_s: int | None = None) -> DataFrame:
    """Interval-OVERLAP join (both sides are intervals): all same-key pairs
    with ``[l_start, l_end) ∩ [r_start, r_end) ≠ ∅`` plus the overlap
    length — the generalization of ``interval_count_join``'s
    point-in-interval shape (dbt-utils' date-spine overlaps, incident
    correlation, session-vs-campaign attribution).

    Both sides explode onto a shared bucket grid and candidates come from
    a (key, bucket) EQUI-join — never an inequality nested loop.  A pair
    overlapping k shared buckets would surface k times; it is emitted
    exactly once instead by keeping only the match in the bucket of
    ``greatest(l_start, r_start)`` — the first overlapped instant, which
    BOTH intervals are guaranteed to cover — so no post-join
    ``distinct`` (a second shuffle of the full candidate set) is needed.
    ``bucket_width_s`` defaults to the larger side's max interval length
    (two scalar aggregates, driver metadata); any interval then spans <=2
    buckets and candidate fan-out stays linear in co-bucketed mass.

    Returns ``(left_id, key, right_id, overlap_us)``.
    """
    if bucket_width_s is None:
        mx = [
            df.select(F.max(
                _epoch_us(F.col(e)) - _epoch_us(F.col(s))
            ).alias("m")).first()["m"]
            for df, s, e in ((left, l_start, l_end), (right, r_start, r_end))
        ]
        bucket_width_s = int(max(m or 0 for m in mx) // 1_000_000) or 1
    width_us = bucket_width_s * 1_000_000

    def bucket(col):
        return F.floor(col / F.lit(width_us)).cast("long")

    def explode_side(df, id_col, s, e):
        return df.filter(F.col(e) > F.col(s)).select(
            id_col, key, s, e,
            F.explode(F.sequence(
                bucket(_epoch_us(F.col(s))),
                bucket(_epoch_us(F.col(e)) - 1),
            )).alias("__bucket"),
        )

    lv = explode_side(left, left_id, l_start, l_end)
    rv = explode_side(right, right_id, r_start, r_end)
    first_overlap = F.greatest(
        _epoch_us(F.col(l_start)), _epoch_us(F.col(r_start))
    )
    return (
        lv.join(rv, [key, "__bucket"])
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("__bucket") == bucket(first_overlap))
        )
        .select(
            left_id, key, right_id,
            (F.least(_epoch_us(F.col(l_end)), _epoch_us(F.col(r_end)))
             - first_overlap).alias("overlap_us"),
        )
    )
