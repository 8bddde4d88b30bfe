"""End-to-end medallion pipeline integration: ingest -> bronze -> silver ->
gold with ledger lifecycle, quality gates, idempotent re-runs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import trip_row, ts
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.catalog import Warehouse
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.pipeline.jobs import (
    MedallionPipeline,
    PIPELINE_NAME,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.schema import TRIP_SCHEMA


def _write_month(spark, src_dir, month, rows):
    path = os.path.join(src_dir, f"yellow_tripdata_{month}.parquet")
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in TRIP_SCHEMA.fields) for r in rows], TRIP_SCHEMA
    )
    df.write.mode("overwrite").parquet(path)
    return path


def _month_rows(month, n=30):
    rows = []
    for i in range(n):
        day = (i % 27) + 1
        rows.append(trip_row(
            tpep_pickup_datetime=ts(f"{month}-{day:02d} 08:00:00"),
            tpep_dropoff_datetime=ts(f"{month}-{day:02d} 08:15:00"),
            pulocationid=100 + (i % 3),
            payment_type=1 + (i % 2),
            fare_amount=10.0 + i,
            vendorid=1 + (i % 2),
        ))
    # one duplicate surrogate key (dedup W1) and one negative fare (F6)
    rows.append(dict(rows[0]))
    rows.append(trip_row(
        tpep_pickup_datetime=ts(f"{month}-05 09:00:00"),
        tpep_dropoff_datetime=ts(f"{month}-05 09:10:00"),
        fare_amount=-5.0,
    ))
    return rows


@pytest.fixture()
def pipe(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "source")
    os.makedirs(src, exist_ok=True)
    wh = Warehouse(os.path.join(tmp_warehouse, "wh"))
    alerts = []
    p = MedallionPipeline(
        spark, wh,
        source_path_for_month=lambda m: os.path.join(
            src, f"yellow_tripdata_{m}.parquet"
        ),
        alert_hook=lambda *a: alerts.append(a),
    )
    p._alerts = alerts
    p._src = src
    return p


def test_full_pipeline_two_months_and_idempotent_rerun(spark, pipe):
    _write_month(spark, pipe._src, "2024-01", _month_rows("2024-01"))
    _write_month(spark, pipe._src, "2024-02", _month_rows("2024-02", n=20))

    # first run: ledger has no SUCCESS -> 2024-01 (O2 first-run semantics)
    assert pipe.run_month() == "2024-01"
    silver1 = pipe.warehouse.read(spark, "silver", "silver_yellow_tripdata")
    n1 = silver1.count()
    assert n1 == 31  # 30 distinct + 1 neg-fare; the dup collapsed (W1)

    # second run advances to 2024-02 via the ledger watermark
    assert pipe.run_month() == "2024-02"
    silver2 = pipe.warehouse.read(spark, "silver", "silver_yellow_tripdata")
    n2 = silver2.count()
    assert n2 == n1 + 21

    # gold marts exist and reconcile with silver
    daily = pipe.warehouse.read(spark, "gold", "gold_daily_summary")
    assert daily.agg(F.sum("total_trips")).first()[0] == n2
    monthly = pipe.warehouse.read(spark, "gold", "gold_monthly_summary")
    assert monthly.count() == 2
    vendor = pipe.warehouse.read(spark, "gold", "gold_vendor_summary")
    assert vendor.count() == 2  # two vendors decoded

    # re-running 2024-02 explicitly is idempotent (S10 + merge semantics)
    pipe.run_month("2024-02")
    silver3 = pipe.warehouse.read(spark, "silver", "silver_yellow_tripdata")
    assert silver3.count() == n2
    monthly3 = pipe.warehouse.read(spark, "gold", "gold_monthly_summary")
    assert monthly3.count() == 2

    # ledger recorded three SUCCESS runs
    ledger = pipe.ledger.read()
    assert ledger.filter("status = 'SUCCESS'").count() == 3
    assert pipe.ledger.last_successful_month(PIPELINE_NAME) == "2024-02"
    assert pipe._alerts == []


def test_pipeline_quality_gate_failure_marks_ledger_and_alerts(spark, pipe):
    # NULL vendorids trip bronze's not_null dbt test (Q1, reference
    # bronze/schema.yml:7-10) — the earliest gate in the DAG, exactly where
    # the reference pipeline would halt
    rows = _month_rows("2024-01", n=10)
    rows += [trip_row(
        vendorid=None,
        tpep_pickup_datetime=ts(f"2024-01-1{i} 10:00:00"),
    ) for i in range(3)]
    _write_month(spark, pipe._src, "2024-01", rows)

    with pytest.raises(ValueError, match="vendorid"):
        pipe.run_month("2024-01")

    ledger = pipe.ledger.read()
    row = ledger.first()
    assert row["status"] == "FAILED"
    assert "vendorid" in row["error_message"]
    # failure does not advance the watermark; next target is still 2024-01
    assert pipe.ledger.target_month(PIPELINE_NAME) == "2024-01"
    # alert hook fired for the failed stage (O5), downstream never ran
    assert pipe._alerts and pipe._alerts[0][1] == "bronze_validate"
    assert not pipe.warehouse.exists("silver", "silver_yellow_tripdata")
