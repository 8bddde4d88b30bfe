"""Gold models (reference ``dbt/nyc_taxi/models/gold/*.sql``, A1-A5).

All five are single-pass hash aggregations; Catalyst compiles each
``groupBy().agg()`` to partial (map-side) + final HashAggregate, so the only
cross-executor traffic is the already-reduced group states — the shape that
scales linearly with executor count at 100 TB.

The five gold models share the silver scan; the runner caches silver once and
derives all five (reference runs them as 4 dbt threads against Postgres —
Spark's cache-and-fan-out is strictly better, SURVEY section 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.datetime import month_start, to_day
from ..functions.money import guarded_ratio
from ..operators.watermark import watermark_filter, watermark_filter_month_reopen


def gold_daily_summary(silver: DataFrame, target: DataFrame | None = None) -> DataFrame:
    """A1 (gold_daily_summary.sql:6-21): per-pickup-day counts/sums/avgs.

    P5 watermark quirk preserved: filters ``pickup > MAX(target.trip_date)``
    — a timestamp-vs-date comparison (date coerces to midnight), skipping
    same-day rows after midnight exactly like the reference.
    """
    df = watermark_filter(silver, target, "tpep_pickup_datetime", "trip_date")
    return df.groupBy(to_day("tpep_pickup_datetime").alias("trip_date")).agg(
        F.count("*").alias("total_trips"),
        F.sum("passenger_count").alias("total_passengers"),
        F.sum("trip_distance").alias("total_distance_miles"),
        F.sum("total_amount").alias("total_revenue"),
        F.sum("tip_amount").alias("total_tips"),
        F.avg("fare_amount").alias("avg_fare"),
        F.avg("trip_distance").alias("avg_trip_distance"),
    )


def gold_monthly_summary(silver: DataFrame, target: DataFrame | None = None) -> DataFrame:
    """A2 (gold_monthly_summary.sql:10-23) with the P6 ``>=`` month-reopen
    watermark: the open month re-aggregates, downstream merge replaces it."""
    df = watermark_filter_month_reopen(
        silver, target, "tpep_pickup_datetime", "revenue_month"
    )
    return df.groupBy(month_start("tpep_pickup_datetime").alias("revenue_month")).agg(
        F.sum("total_amount").alias("total_monthly_revenue"),
        F.sum("passenger_count").alias("total_monthly_passengers"),
        F.count("*").alias("total_monthly_trips"),
        F.avg("trip_distance").alias("avg_trip_distance"),
    )


def gold_zone_summary(silver: DataFrame, target: DataFrame | None = None) -> DataFrame:
    """A3 (gold_zone_summary.sql:10-23): month x pickup-zone, P6 watermark."""
    df = watermark_filter_month_reopen(
        silver, target, "tpep_pickup_datetime", "revenue_month"
    )
    return df.groupBy(
        month_start("tpep_pickup_datetime").alias("revenue_month"),
        F.col("pulocationid"),
    ).agg(
        F.sum("total_amount").alias("total_revenue"),
        F.count("*").alias("total_trips"),
    )


def gold_vendor_summary(silver: DataFrame) -> DataFrame:
    """A4 (gold_vendor_summary.sql:3-11): full-rebuild table materialization."""
    return silver.groupBy("vendor_name").agg(
        F.count("*").alias("total_trips"),
        F.sum("total_amount").alias("total_revenue"),
        F.sum("trip_distance").alias("total_distance"),
        F.avg("trip_distance").alias("avg_trip_distance"),
        F.avg("fare_amount").alias("avg_fare"),
    )


def gold_payment_summary(silver: DataFrame) -> DataFrame:
    """A5 (gold_payment_summary.sql:3-13): COALESCE'd group key + the guarded
    ratio-of-sums tip percentage (not avg-of-ratios)."""
    agg = silver.groupBy(
        F.coalesce(F.col("payment_description"), F.lit("Unknown")).alias(
            "payment_description"
        )
    ).agg(
        F.count("*").alias("trip_count"),
        F.sum("total_amount").alias("total_revenue"),
        F.sum("tip_amount").alias("total_tips"),
    )
    return agg.withColumn(
        "avg_tip_percent", guarded_ratio("total_tips", "total_revenue")
    )
