"""Money-column cleaning & ratio guards (reference F5-F7, F13, A5)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def abs_coalesce_zero(col: Column | str) -> Column:
    """``ABS(COALESCE(x, 0))`` — the silver money-cleaning idiom applied to 8
    amount columns (reference silver_yellow_tripdata.sql:52-59, F6)."""
    return F.abs(F.coalesce(_c(col), F.lit(0.0)))


def row_total(*cols: Column | str) -> Column:
    """N-way arithmetic sum recomputing a total column
    (reference silver_yellow_tripdata.sql:69, F7)."""
    out = _c(cols[0])
    for c in cols[1:]:
        out = out + _c(c)
    return out


def exact_sum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent deterministic SUM of a money-like double column.

    Plain ``SUM(double)`` is non-deterministic across shuffle orders (fp
    addition is non-associative), which breaks value-hash comparison against
    any oracle and makes reruns non-reproducible.  Casting to
    ``DECIMAL(18,scale)`` first makes the sum exact (Spark's decimal
    aggregation widens precision, no overflow for trillions of rows of
    currency), then the single final cast to double is deterministic.
    At 100 TB this costs a few % over double summation and buys bit-stable
    results.
    """
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum divided by the non-null count."""
    c = _c(col)
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def guarded_ratio(num: Column | str, den: Column | str, pct: bool = True) -> Column:
    """``CASE WHEN den <= 0 THEN 0 ELSE num/den*100 END`` — the div-by-zero
    guarded ratio-of-sums (NOT avg-of-ratios) from gold_payment_summary
    (reference gold_payment_summary.sql:8-11, F13).  Spark's x/0 yields NULL
    (ANSI off) rather than erroring, but the guard is kept for value parity.
    """
    ratio = _c(num) / _c(den)
    if pct:
        ratio = ratio * F.lit(100.0)
    return F.when(_c(den) <= F.lit(0.0), F.lit(0.0)).otherwise(ratio)
