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


def rolling_zscore(df: DataFrame, key_cols: list[str], order_col: str,
                   value_col: str, window: int = 7,
                   z_threshold: float = 3.0,
                   min_points: int = 4, scale: int = 2) -> DataFrame:
    """Rolling z-score anomaly detection over a regular per-key series —
    the metric-monitoring primitive (spike/drop detection on daily event
    volumes, revenue, error rates).

    Exactness is the whole design: stddev_samp is NOT used — engines
    disagree in the last ulp because their accumulation algorithms differ
    (Welford vs sum-of-squares) and float addition is order-sensitive.
    Instead values quantize to integer units at ``10^scale`` (portable
    round-half-up), both moments come from integer/decimal window sums
    (exact, order-independent), and every float op after that is one
    fixed-order IEEE expression shared with the SQL oracle — sub, div,
    sqrt (correctly rounded by IEEE-754), div — so z is bit-identical
    across engines:

    - ``s1 = SUM(q)``, ``s2 = SUM(q*q)`` over the trailing frame
      (squares in pinned DECIMAL widths: Spark silently loses precision
      above 38, DuckDB hard-errors);
    - ``var = (n*s2 - s1*s1) / (n*(n-1)) / 10^(2*scale)`` — numerator
      decimal-exact, ONE double division.  For the full chain to be
      bit-exact the numerator must also convert to double exactly:
      choose ``scale`` so ``window * (v * 10^scale)^2 < 2^53`` (the
      default scale=2 covers |v| up to ~10^6 at window 7; larger values
      trade quantization precision via a smaller scale);
    - ``z = (v - s1/n/10^scale) / sqrt(var)``.

    The frame is ``window PRECEDING .. 1 PRECEDING`` — the current row is
    EXCLUDED from its own baseline (self-inclusion inflates the variance
    and masks exactly the spikes being hunted).  Rows with fewer than
    ``min_points`` prior observations emit NULL z (warm-up); zero
    variance emits NULL z (a constant series has no scale).
    ``is_anomaly`` = |z| > z_threshold.  One hash exchange on the keys;
    per-key sort.
    """
    # floor(x + 0.5) because Spark's double->long cast truncates while
    # DuckDB's rounds — neither bare cast is portable
    factor = float(10 ** scale)
    micro = F.floor(
        F.col(value_col).cast("double") * F.lit(factor) + F.lit(0.5)
    ).cast("long")
    # the frame EXCLUDES the current row: a spike must not inflate its own
    # baseline (self-inclusion masks exactly the anomalies being hunted)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    # count the non-NULL observations (the s1/s2 basis), not the frame rows
    n = F.count(micro).over(w)
    s1 = F.sum(micro).over(w)
    sq = micro.cast("decimal(19,0)") * micro.cast("decimal(19,0)")
    s2 = F.sum(sq).over(w).cast("decimal(34,0)")
    nd = n.cast("double")
    # decimal-exact numerator in quantized^2 units; ONE double division,
    # then the factor^2 unit conversion — each step a single IEEE op
    # shared with the SQL oracle
    num = (
        n.cast("decimal(4,0)") * s2
        - s1.cast("decimal(19,0)") * s1.cast("decimal(19,0)")
    )
    var = (
        num.cast("double") / (n * (n - F.lit(1))).cast("double")
        / F.lit(factor * factor)
    )
    mean = s1.cast("double") / nd / F.lit(factor)
    z = (F.col(value_col).cast("double") - mean) / F.sqrt(var)
    z_ok = (n >= F.lit(min_points)) & (var > 0)
    z_out = F.when(z_ok, z)
    return df.select(
        *key_cols,
        order_col,
        F.col(value_col),
        n.cast("long").alias("n_window"),
        mean.alias("rolling_mean"),
        z_out.alias("zscore"),
        F.when(z_ok, F.abs(z) > F.lit(z_threshold))
        .otherwise(F.lit(False)).alias("is_anomaly"),
    )
