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
    any oracle and makes reruns non-reproducible.  Each summand quantizes to
    integer units with ``floor(v*10^s + 0.5)`` (one IEEE chain, identical on
    every engine), the BIGINT units sum exactly (decimal(38,0) widening — no
    overflow for trillions of rows of currency; the SQL oracle's HUGEINT sum
    is the same exact integer), and ONE correctly-rounded double division by
    ``10^s`` finishes.

    This long-unit form replaced the original per-row
    ``cast(decimal(18,s))`` sum: the values are identical on
    s-decimal-representable inputs (integer N per row either way), but
    Spark's double->decimal cast routes through
    ``BigDecimal.valueOf(double)``'s string path and made hot aggregates
    ~3x slower (measured 18.6s -> 6.9s for a 6-sum shape on 6M rows).
    Domain: |v|*10^s must fit int64 (|v| < ~9e16 at s=2).
    """
    return (
        F.sum(F.floor(_c(col) * F.lit(float(10 ** scale)) + F.lit(0.5))
              .cast("long").cast("decimal(38,0)"))
        .cast("double") / F.lit(float(10 ** scale))
    )


def exact_avg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: the exact integer-unit sum divided by the
    non-null count (same fixed IEEE order as the SQL oracle)."""
    c = _c(col)
    return exact_sum(c, scale) / F.count(c)


def exact_product_sum(a: Column | str, b: Column | str,
                      scale: int = 2) -> Column:
    """Order-independent deterministic ``SUM(a*b)`` for two money-like
    double columns: both factors quantize to integer units
    (``floor(v*10^s + 0.5)``), the exact LONG product sums in
    decimal(38,0), and one double division by ``10^(2s)`` finishes —
    the product-sum sibling of :func:`exact_sum`, mirroring byte-for-byte
    into SQL.  Replaces ``SUM(cast(decimal) * cast(decimal))``, whose
    two per-row double->decimal casts plus a decimal multiply dominated
    the gold product aggregates.  Domain: |a*b|*10^(2s) per row must fit
    int64 (|a*b| < ~9e14 at s=2)."""
    ten = F.lit(float(10 ** scale))
    ua = F.floor(_c(a) * ten + F.lit(0.5)).cast("long")
    ub = F.floor(_c(b) * ten + F.lit(0.5)).cast("long")
    return (
        F.sum((ua * ub).cast("decimal(38,0)")).cast("double")
        / F.lit(float(10 ** (2 * scale)))
    )


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
