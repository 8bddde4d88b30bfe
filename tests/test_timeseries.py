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


def test_rolling_zscore_flags_spike(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.timeseries import (
        rolling_zscore,
    )
    import datetime as dt
    base = dt.date(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.0, 100.0, 10.0]
    rows = [("a", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["day"].day: r
           for r in rolling_zscore(df, ["k"], "day", "v",
                                   window=7, min_points=4).collect()}
    # warm-up rows (fewer than 4 PRIOR observations) have NULL z
    assert out[1]["zscore"] is None and not out[1]["is_anomaly"]
    assert out[4]["zscore"] is None
    # the spike on day 5 scores against the 4 prior days only (the frame
    # excludes the current row, so the spike cannot inflate its baseline)
    import statistics
    prior = vals[:4]
    mean4 = statistics.mean(prior)
    sd4 = statistics.stdev(prior)
    assert out[5]["zscore"] == pytest.approx((100.0 - mean4) / sd4)
    assert out[5]["is_anomaly"]
    # day 6: the spike sits in the baseline now, inflating it — the
    # ordinary current value is not anomalous
    assert not out[6]["is_anomaly"]
    assert out[6]["n_window"] == 5


def test_rolling_zscore_constant_series_null_z(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.timeseries import (
        rolling_zscore,
    )
    import datetime as dt
    rows = [("c", dt.date(2024, 1, 1) + dt.timedelta(days=i), 5.0)
            for i in range(6)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = rolling_zscore(df, ["k"], "day", "v", window=7).collect()
    assert all(r["zscore"] is None and not r["is_anomaly"] for r in out)
