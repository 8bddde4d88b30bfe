"""Datetime functions (reference F4, F9-F11, F14-F16)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def duration_minutes(start: Column | str, end: Column | str, scale: int = 2) -> Column:
    """``ROUND(EXTRACT(EPOCH FROM (end - start)) / 60, 2)``
    (reference silver_yellow_tripdata.sql:50, F4/F5).

    ``unix_timestamp`` truncates to integer seconds, matching Postgres EPOCH
    of a ts-ts interval at second precision; ``round`` is HALF_UP like
    Postgres NUMERIC rounding (F5) — ``bround`` (HALF_EVEN) would not be.
    """
    secs = F.unix_timestamp(_c(end)) - F.unix_timestamp(_c(start))
    return F.round(secs / F.lit(60.0), scale)


def month_key(ts: Column | str) -> Column:
    """``TO_CHAR(ts, 'YYYY-MM')`` -> ``date_format`` (F9)."""
    return F.date_format(_c(ts), "yyyy-MM")


def month_start(ts: Column | str) -> Column:
    """``date_trunc('month', ts)`` — returns a timestamp, same as Postgres (F11)."""
    return F.date_trunc("month", _c(ts))


def to_day(ts: Column | str) -> Column:
    """``DATE(ts)`` (F10)."""
    return F.to_date(_c(ts))


def next_month(month: str) -> str:
    """'YYYY-MM' + 1 month, driver-side (reference dags/nyc_taxi_pipeline.py:111-116)."""
    year, mon = map(int, month.split("-"))
    year, mon = (year + 1, 1) if mon == 12 else (year, mon + 1)
    return f"{year:04d}-{mon:02d}"
