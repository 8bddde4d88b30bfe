"""Watermark-predicated incremental filters (reference P3-P6, P10, A6).

The reference's "incremental" is watermark-predicated batch: each model
filters its source by a scalar MAX taken from its own previous output
(``WHERE ts > (SELECT MAX(ts) FROM {{ this }})``,
``dbt/nyc_taxi/models/silver/silver_yellow_tripdata.sql:9-11``).

Spark has no correlated scalar subquery feeding a filter without collecting,
so the scalar MAX is computed driver-side (one tiny job over the target's
max — with month-partitioned storage this prunes to reading one partition's
footer stats) and folded into the filter as a literal.  The literal predicate
is then eligible for predicate pushdown and partition pruning on the source
scan — the property that makes incremental refresh O(new data), not O(table),
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def max_scalar(df: DataFrame, col: str):
    """Driver-side ``SELECT MAX(col)`` (A6/P10). Returns None on empty input."""
    return df.agg(F.max(col).alias("wm")).first()["wm"]


def watermark_filter(source: DataFrame, target: DataFrame | None, ts_col: str,
                     target_col: str | None = None) -> DataFrame:
    """``WHERE source.ts > (SELECT MAX(target.col))`` (P4/P5).

    First run (no target / empty target) passes everything through, matching
    dbt's ``is_incremental()`` guard.  P5's quirk — comparing a timestamp
    against a MAX(date) (midnight) and thereby skipping same-day late rows —
    is preserved by simply comparing against whatever type the target column
    has, as the reference does.
    """
    if target is None:
        return source
    wm = max_scalar(target, target_col or ts_col)
    if wm is None:
        return source
    return source.filter(F.col(ts_col) > F.lit(wm))


def watermark_filter_month_reopen(source: DataFrame, target: DataFrame | None,
                                  ts_col: str, month_col: str,
                                  default: str = "1900-01-01") -> DataFrame:
    """``WHERE date_trunc('month', ts) >= COALESCE(MAX(month), '1900-01-01')``
    (P6, gold_monthly/gold_zone): the ``>=`` re-opens the current month so
    late-arriving rows re-aggregate — downstream merge must *replace* that
    month's rows (upsert_by_key handles this)."""
    wm = None
    if target is not None:
        wm = max_scalar(target, month_col)
    bound: Column = F.lit(wm) if wm is not None else F.lit(default).cast("timestamp")
    return source.filter(F.date_trunc("month", F.col(ts_col)) >= bound)
