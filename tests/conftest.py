from __future__ import annotations

import datetime as dt
import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.schema import TRIP_SCHEMA
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.session import get_spark

TMP_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(scope="session")
def spark():
    os.makedirs(TMP_ROOT, exist_ok=True)
    s = get_spark("engine-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.sql.warehouse.dir": os.path.join(TMP_ROOT, "warehouse")})
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    path = os.path.join(TMP_ROOT, f"wh_{os.getpid()}_{id(object())}")
    os.makedirs(path, exist_ok=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def trip_row(**overrides):
    """A baseline valid trip row (vendor 1, payment 1, 10-min ride), with
    per-test overrides — mirrors the reference's CI seed row."""
    base = dict(
        vendorid=1,
        tpep_pickup_datetime=ts("2024-01-15 08:00:00"),
        tpep_dropoff_datetime=ts("2024-01-15 08:10:00"),
        passenger_count=1,
        trip_distance=2.5,
        ratecodeid=1,
        store_and_fwd_flag="N",
        pulocationid=100,
        dolocationid=200,
        payment_type=1,
        fare_amount=10.0,
        extra=1.0,
        mta_tax=0.5,
        tip_amount=2.0,
        tolls_amount=0.0,
        improvement_surcharge=0.3,
        total_amount=13.8,
        congestion_surcharge=0.0,
        airport_fee=0.0,
    )
    base.update(overrides)
    return base


@pytest.fixture(scope="session")
def trips(spark):
    """Adversarial trip fixture (FIXTURES.md section 1): valid rows, dupes on
    the surrogate key, out-of-domain payment types, unknown decode ids,
    negative/NULL money, NULL timestamps, negative duration, month-boundary
    timestamps."""
    rows = [
        trip_row(),
        # exact duplicate on the 7 surrogate columns, different fare (W1/F8)
        trip_row(fare_amount=99.0, total_amount=102.8),
        # tie on (key, pickup) as well -> arbitrary but single survivor
        trip_row(fare_amount=55.0),
        # out-of-domain payment types (P7/Q3/G6)
        trip_row(payment_type=0, tpep_pickup_datetime=ts("2024-01-16 09:00:00")),
        trip_row(payment_type=7, tpep_pickup_datetime=ts("2024-01-16 10:00:00")),
        trip_row(payment_type=None, tpep_pickup_datetime=ts("2024-01-16 11:00:00")),
        # unknown decode ids (F1/F2 ELSE branches)
        trip_row(vendorid=3, ratecodeid=99,
                 tpep_pickup_datetime=ts("2024-01-17 09:00:00")),
        trip_row(vendorid=None, ratecodeid=None,
                 tpep_pickup_datetime=ts("2024-01-17 10:00:00")),
        # negative + NULL money (F6/F7/Q5)
        trip_row(fare_amount=-10.5, tip_amount=-1.0,
                 tpep_pickup_datetime=ts("2024-01-18 09:00:00")),
        trip_row(fare_amount=None, extra=None, tip_amount=None,
                 tpep_pickup_datetime=ts("2024-01-18 10:00:00")),
        # NULL pickup (Q1/G3) and negative duration (F4)
        trip_row(tpep_pickup_datetime=None),
        trip_row(tpep_pickup_datetime=ts("2024-01-19 12:00:00"),
                 tpep_dropoff_datetime=ts("2024-01-19 11:50:00")),
        # month-boundary rows (P3/P6/F11)
        trip_row(tpep_pickup_datetime=ts("2024-01-31 23:59:59")),
        trip_row(tpep_pickup_datetime=ts("2024-02-01 00:00:00")),
        trip_row(tpep_pickup_datetime=ts("2024-02-15 08:00:00"), payment_type=2),
        trip_row(tpep_pickup_datetime=ts("2024-03-02 08:00:00"), payment_type=4),
    ]
    return spark.createDataFrame([tuple(r[f.name] for f in TRIP_SCHEMA.fields) for r in rows],
                                 TRIP_SCHEMA)
