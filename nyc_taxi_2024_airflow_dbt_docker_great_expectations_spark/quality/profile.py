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


def exact_zscore_outliers(df: DataFrame, key_col: str, value_col: str,
                          k: float = 3, scale: int = 10 ** 6) -> DataFrame:
    """Per-group k-sigma outlier census with ENGINE-EXACT arithmetic.

    The naive form — ``abs(x - avg) > k * stddev`` — is non-portable twice
    over: float summation order changes ``stddev`` in the last ulp, and a
    value sitting exactly at the boundary then flips its flag between
    engines/runs.  Here every comparison happens in exact integer math:
    values are scaled to integer micro-units (``floor(x * scale + 0.5)``,
    the same portable rounding as similarity.quantize_int8), the group
    moments n, S = sum(u), S2 = sum(u^2) are exact integer sums, and the
    population-variance test is cross-multiplied to clear divisions::

        (x - mean)^2 > k^2 * var  <=>  (n*u - S)^2 > k^2 * (n*S2 - S^2)

    Both sides are exact integers (decimal(38,0) on Spark, HUGEINT in the
    SQL oracle), so the flag is a pure function of the data.  Magnitude
    audit: the dominant term is (n * u)^2, so exactness requires
    ``n_per_group * max|x| * scale < 10^19`` (decimal38/int128 headroom);
    at larger group sizes or ranges, lower ``scale`` — the test compares
    micro-unit integers, so precision beyond the data's own resolution
    buys nothing.

    One aggregate + one broadcast join back (group stats are one row per
    key); the data is scanned twice but shuffled never (the join key is the
    group key of a tiny side).  Returns per-key (n, n_outliers).
    """
    u = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    with_u = df.select(F.col(key_col), u.alias("__u")).filter(
        F.col("__u").isNotNull()
    )
    stats = with_u.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__u").alias("__s"),
        F.sum(F.col("__u") * F.col("__u")).alias("__s2"),
    )
    # Honor rational k exactly: k = p/q (parsed from the decimal literal, so
    # 2.5 -> 5/2, never a binary-float approximation), and the inequality
    # (x-mean)^2 > k^2 var cross-multiplies by q^2 to stay in integers:
    #   q^2 * (n*u - S)^2 > p^2 * (n*S2 - S^2).
    # int(k*k) here would silently truncate (k=2.5 tested against 6, not
    # 6.25), changing which points are flagged with no warning.
    from fractions import Fraction
    frac = Fraction(str(k))
    if frac.denominator > 1000:
        # k = 1/3 etc. has no short decimal form: its squared denominator
        # (10^32 for '0.3333333333333333') cannot be a long literal and
        # would overflow the decimal(38,0) cross-multiplication into NULL
        # comparisons — silently undercounting.  The exactness contract
        # only holds for decimally-representable k; fail loudly otherwise.
        raise ValueError(
            f"k={k!r} is not exactly representable as a short decimal "
            "(denominator > 1000); pass a decimal like 2.5 or 3.25"
        )
    p2, q2 = frac.numerator ** 2, frac.denominator ** 2
    j = with_u.join(F.broadcast(stats), key_col)
    lhs = (F.col("__n") * F.col("__u") - F.col("__s"))
    rhs = F.lit(p2) * (F.col("__n") * F.col("__s2")
                       - F.col("__s") * F.col("__s"))
    # Magnitude budget: q2 <= 10^6 consumes up to 6 of the 38 decimal
    # digits, so the cross-multiplication q2*(n*u - S)^2 must fit in ~10^32
    # — i.e. n * max|u| below ~10^16 (n=10^9 rows at scale=10^4 and 1000x
    # value range is ~10^16, right at the edge).  Decimal overflow under
    # non-ANSI Spark yields NULL, which a silent cast would undercount as
    # "not an outlier"; instead a NULL comparison raises loudly — the
    # contract is exact-or-error, never silently wrong.
    cmp = F.lit(q2) * lhs * lhs > rhs
    flagged = j.withColumn(
        "__out",
        F.when(cmp.isNotNull(), cmp.cast("long")).otherwise(
            F.raise_error(F.lit(
                "robust_outliers: decimal(38,0) overflow in the "
                "cross-multiplication — reduce scale or k's denominator"
            )).cast("long")
        ),
    )
    return flagged.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__out").alias("n_outliers"),
    )


def equal_width_histogram(df: DataFrame, value_col: str,
                          n_bins: int = 20) -> DataFrame:
    """Equal-width histogram with engine-exact bucketing.

    Two passes (the unavoidable minimum for data-driven bounds): a 1-row
    (min, max) aggregate, then one codegen'd bucket-assign + hash count.
    The bucket expression ``least(floor((x - min) / w), n_bins - 1)`` runs
    the SAME double arithmetic on any engine, so bucket membership is
    deterministic — the top bound folds into the last bucket rather than
    growing a one-element overflow bin.  Degenerate case min == max puts
    everything in bucket 0.  Returns (bucket, lo, hi, n) with integer
    counts; empty buckets are not emitted (join a spine if a dense
    histogram is needed — see operators/timeseries.py:gapfill_periods).
    """
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")
    v = F.col(value_col).cast("double")
    lo_hi = df.agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi")
    ).first()
    lo, hi = lo_hi["__lo"], lo_hi["__hi"]
    if lo is None:
        raise ValueError(f"column {value_col!r} has no non-null values")
    width = (hi - lo) / n_bins if hi > lo else 1.0
    bucket = F.least(
        F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )
