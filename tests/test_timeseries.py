from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.timeseries import (
    gapfill_periods,
)


@pytest.fixture(scope="module")
def sparse(spark):
    rows = [
        ("a", dt.date(2024, 1, 1), 5, 10.0),
        ("a", dt.date(2024, 1, 4), 2, 4.0),   # 2 missing days before
        ("b", dt.date(2024, 2, 1), 1, 1.0),   # separate lifetime
        ("b", dt.date(2024, 2, 2), 3, 3.0),
    ]
    return spark.createDataFrame(
        rows, "k string, d date, n long, v double"
    )


def test_gapfill_zero(spark, sparse):
    out = {(r["k"], str(r["d"])): r
           for r in gapfill_periods(sparse, ["k"], "d", ["n", "v"],
                                    granularity="day", fill="zero").collect()}
    # a spans its own 4 days, b its own 2 — no global calendar padding
    assert len(out) == 6
    gap = out[("a", "2024-01-02")]
    assert gap["n"] == 0 and gap["v"] == 0.0 and gap["is_gap"]
    real = out[("a", "2024-01-04")]
    assert real["n"] == 2 and not real["is_gap"]
    assert ("b", "2024-01-02") not in out


def test_gapfill_ffill(spark, sparse):
    out = {(r["k"], str(r["d"])): r
           for r in gapfill_periods(sparse, ["k"], "d", ["n", "v"],
                                    granularity="day", fill="ffill").collect()}
    assert out[("a", "2024-01-02")]["n"] == 5   # carried from Jan 1
    assert out[("a", "2024-01-03")]["v"] == 10.0
    assert out[("a", "2024-01-04")]["n"] == 2   # real observation wins


def test_gapfill_month(spark):
    rows = [("x", dt.date(2024, 1, 1), 1), ("x", dt.date(2024, 4, 1), 4)]
    df = spark.createDataFrame(rows, "k string, m date, n long")
    out = gapfill_periods(df, ["k"], "m", ["n"], granularity="month",
                          fill="zero").collect()
    assert sorted(str(r["m"]) for r in out) == [
        "2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01",
    ]
    assert sum(r["is_gap"] for r in out) == 2
    with pytest.raises(ValueError):
        gapfill_periods(df, ["k"], "m", ["n"], granularity="week")
    with pytest.raises(ValueError):
        gapfill_periods(df, ["k"], "m", ["n"], fill="interpolate")
