"""Table profiling: per-column statistics in ONE pass over the data.

The profiling counterpart of the GX suites (quality/expectations.py) — where
an expectation asserts a known bound, the profile *discovers* the bounds a
new dataset actually has (the first step of onboarding a source at 100 TB,
and the input you write expectations against).

Shape matters at scale: all columns' aggregates run in a single
``df.agg(...)`` pass — one scan, partial aggregation map-side, a 1-row
result — and only that single row is unpivoted into the tall
(column, stats) table.  The naive alternative (unpivot first, then
aggregate) multiplies the scan by the column count.  Exact distinct counts
use Spark's EXPAND-based multi-distinct rewrite; swap in
``approx_count_distinct`` per column when 2% error is acceptable and the
expand cost is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per column: non-null count, null count, exact distinct
    count, min and max (cast to double for a uniform schema)."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(d).alias(f"{c}__n"),
            F.countDistinct(d).alias(f"{c}__nd"),
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"{c}__n"),
            F.col("__total") - F.col(f"{c}__n"),
            F.col(f"{c}__nd"),
            F.col(f"{c}__min"),
            F.col(f"{c}__max"),
        ]
    return row.select(
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("col_name", "n_nonnull", "n_null", "n_distinct",
                "min_value", "max_value")
    )
