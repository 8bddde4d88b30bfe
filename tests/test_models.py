"""Bronze/silver/gold model semantics on the adversarial trip fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.plans import (
    bronze_trips,
    gold_daily_summary,
    gold_monthly_summary,
    gold_payment_summary,
    gold_vendor_summary,
    gold_zone_summary,
    silver_trips,
)


def test_bronze_projection_and_month_filter(spark, trips):
    all_rows = bronze_trips(trips)
    assert all_rows.columns == trips.columns
    jan = bronze_trips(trips, target_month="2024-01")
    # NULL pickup drops under the month filter; Feb/Mar rows drop
    assert jan.count() == 12
    months = jan.select(
        F.date_format("tpep_pickup_datetime", "yyyy-MM").alias("m")
    ).distinct().collect()
    assert {r["m"] for r in months} == {"2024-01"}


def test_silver_semantics(spark, trips):
    silver = silver_trips(bronze_trips(trips)).cache()

    # P7: payment_type 0 / 7 / NULL all dropped
    pts = {r["payment_type"] for r in silver.select("payment_type").distinct().collect()}
    assert pts <= {1, 2, 3, 4, 5, 6}

    # W1 dedup: the 3 fixture rows sharing the surrogate key collapse to 1
    dup_check = silver.groupBy("unique_trip_id").count().filter("count > 1").count()
    assert dup_check == 0

    # F6: money columns cleaned — no negatives anywhere
    negs = silver.filter(
        (F.col("fare_amount") < 0) | (F.col("tip_amount") < 0) | (F.col("total_amount") < 0)
    ).count()
    assert negs == 0

    # F6/F7: the negative-fare row becomes abs() and total recomputed
    neg_row = silver.filter(
        F.col("tpep_pickup_datetime") == dt.datetime(2024, 1, 18, 9, 0, 0)
    ).first()
    assert neg_row["fare_amount"] == 10.5
    assert neg_row["tip_amount"] == 1.0
    assert abs(neg_row["total_amount"] - (10.5 + 1.0 + 0.5 + 1.0 + 0.0 + 0.3 + 0.0 + 0.0)) < 1e-9

    # NULL money -> 0 (F6), total recomputed from cleaned parts
    null_row = silver.filter(
        F.col("tpep_pickup_datetime") == dt.datetime(2024, 1, 18, 10, 0, 0)
    ).first()
    assert null_row["fare_amount"] == 0.0
    assert abs(null_row["total_amount"] - (0.5 + 0.3)) < 1e-9

    # F1/F2 decode fallbacks
    unk = silver.filter(
        F.col("tpep_pickup_datetime") == dt.datetime(2024, 1, 17, 9, 0, 0)
    ).first()
    assert unk["vendor_name"] == "Unknown"
    assert unk["ratecode_description"] == "Null/unknown"

    # F4: negative duration preserved
    neg_dur = silver.filter(
        F.col("tpep_pickup_datetime") == dt.datetime(2024, 1, 19, 12, 0, 0)
    ).first()
    assert neg_dur["trip_duration_minutes"] == -10.0


def test_silver_incremental_watermark(spark, trips):
    full = silver_trips(bronze_trips(trips)).cache()
    # incremental rerun vs itself: nothing newer than the max -> empty delta
    delta = silver_trips(bronze_trips(trips), target=full)
    assert delta.count() == 0


def test_gold_summaries(spark, trips):
    silver = silver_trips(bronze_trips(trips)).cache()

    daily = gold_daily_summary(silver)
    d15 = daily.filter(F.col("trip_date") == F.lit("2024-01-15").cast("date")).first()
    assert d15["total_trips"] == 1  # dupes collapsed by silver dedup

    monthly = gold_monthly_summary(silver)
    jan = monthly.filter(
        F.col("revenue_month") == dt.datetime(2024, 1, 1)
    ).first()
    assert jan is not None and jan["total_monthly_trips"] > 0

    zone = gold_zone_summary(silver)
    assert zone.filter(F.col("pulocationid") == 100).count() >= 1

    vendor = gold_vendor_summary(silver)
    names = {r["vendor_name"] for r in vendor.collect()}
    assert "Creative Mobile Technologies, LLC" in names
    assert "Unknown" in names

    pay = gold_payment_summary(silver)
    row = {r["payment_description"]: r for r in pay.collect()}
    cc = row["Credit card"]
    # guarded ratio-of-sums: tips/revenue*100
    assert abs(cc["avg_tip_percent"] - cc["total_tips"] / cc["total_revenue"] * 100) < 1e-9


def test_gold_daily_watermark_quirk(spark, trips):
    """P5: filtering pickup > MAX(trip_date) (a date, i.e. midnight) must skip
    same-day rows after midnight — reference quirk preserved."""
    silver = silver_trips(bronze_trips(trips)).cache()
    existing = gold_daily_summary(silver)
    rerun = gold_daily_summary(silver, target=existing)
    # every silver pickup is after its day's midnight -> all rows pass the
    # "> max date" comparison only if later than the max day's midnight;
    # rows ON the max day after midnight DO pass (> midnight), so the rerun
    # re-aggregates only the max day
    max_date = existing.agg(F.max("trip_date")).first()[0]
    assert rerun.count() == 1
    assert rerun.first()["trip_date"] == max_date


def test_empty_run_schema_smoke(spark, trips):
    """dbt 'run --empty' analog (SURVEY section 3, entry point 2): running
    every model over zero rows validates schemas/plans — Catalyst analysis
    errors replace dbt compile errors."""
    empty = trips.limit(0)
    silver = silver_trips(bronze_trips(empty))
    assert silver.count() == 0
    assert "unique_trip_id" in silver.columns
    for model in (gold_daily_summary, gold_monthly_summary, gold_zone_summary,
                  gold_vendor_summary, gold_payment_summary):
        out = model(silver)
        assert out.count() == 0
        assert len(out.columns) >= 2
