"""Time-series regularization: gap-filling a sparse periodic aggregate.

The reference's gold tables (daily/monthly summaries) silently omit periods
with no rows — fine for BI, wrong for any consumer that differences,
windows, or joins series (a missing month reads as "no data", not "zero
revenue", and moving averages shift).  ``gapfill_periods`` densifies each
key's series to every period between its first and last observation, with
either zero-fill or forward-fill semantics.

Scale shape: the dense spine is generated per key with ``sequence`` +
``explode`` — O(periods-per-key) rows out of a 2-row-per-key aggregate,
never a driver-side calendar or a cross join against a global date
dimension.  The fill join is keyed (key, period) — broadcast-free, AQE
handles any hot key — and forward-fill is one window pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# interval expressions are built lazily (F.expr needs an active session)
_STEP = {
    "day": ("interval 1 day", "date"),
    "month": ("interval 1 month", "date"),
}


def gapfill_periods(df: DataFrame, key_cols: list[str], period_col: str,
                    value_cols: list[str], granularity: str = "month",
                    fill: str = "zero") -> DataFrame:
    """Densify (key..., period, values...) to one row per key per period.

    ``period_col`` must already be truncated to the granularity (the month
    start / the day).  ``fill="zero"`` fills gaps with 0 (additive measures:
    counts, revenue); ``fill="ffill"`` carries the last observed value
    forward (level measures: balances, state).  Emits ``is_gap`` marking
    synthesized rows.  Each key's spine spans ITS OWN min..max period —
    series of different lifetimes don't get padded to a global calendar.
    """
    if granularity not in _STEP:
        raise ValueError(f"granularity must be one of {sorted(_STEP)}")
    if fill not in ("zero", "ffill"):
        raise ValueError("fill must be 'zero' or 'ffill'")
    step_sql, cast_to = _STEP[granularity]
    step = F.expr(step_sql)

    spine = (
        df.groupBy(*key_cols)
        .agg(F.min(period_col).alias("__lo"), F.max(period_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo").cast(cast_to),
                           F.col("__hi").cast(cast_to), step)
            ).alias("__p"),
        )
        .select(
            *key_cols,
            F.col("__p").cast(df.schema[period_col].dataType).alias(period_col),
        )
    )
    dense = spine.join(df, [*key_cols, period_col], "left").withColumn(
        "is_gap", F.col(value_cols[0]).isNull()
    )
    if fill == "zero":
        filled = [
            F.coalesce(F.col(c), F.lit(0).cast(dense.schema[c].dataType)).alias(c)
            for c in value_cols
        ]
    else:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(period_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = [
            F.last(F.col(c), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ]
    return dense.select(*key_cols, period_col, *filled, "is_gap")
