from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.functions import (
    PAYMENT_MAP,
    VENDOR_MAP,
    decode_map,
    decode_via_broadcast_join,
    dim_from_map,
    duration_minutes,
    guarded_ratio,
    month_key,
    next_month,
    surrogate_key,
)


def test_decode_map_known_unknown_null(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "vendorid int")
    out = {r["vendorid"]: r["name"] for r in
           df.select("vendorid", decode_map("vendorid", VENDOR_MAP).alias("name")).collect()}
    assert out[1] == "Creative Mobile Technologies, LLC"
    assert out[2] == "Curb Mobility, LLC"
    assert out[3] == "Unknown"       # unmapped id -> ELSE branch
    assert out[None] == "Unknown"    # NULL -> ELSE branch, like SQL CASE

    flex = df.sparkSession.createDataFrame([(0,)], "payment_type int").select(
        decode_map("payment_type", PAYMENT_MAP).alias("d")
    ).first()["d"]
    assert flex == "Flex Fare trip"


def test_decode_broadcast_join_matches_case(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (None,)], "vendorid int")
    dim = dim_from_map(spark, VENDOR_MAP, "code", "vendor_name")
    joined = decode_via_broadcast_join(df, dim, "vendorid", "code", "vendor_name")
    case = df.select(
        "vendorid", decode_map("vendorid", VENDOR_MAP).alias("vendor_name")
    )
    assert sorted(map(tuple, joined.collect()), key=str) == sorted(
        map(tuple, case.collect()), key=str
    )


def test_duration_minutes_and_negative(spark):
    df = spark.createDataFrame(
        [("2024-01-01 08:00:00", "2024-01-01 08:10:30"),
         ("2024-01-01 08:00:00", "2024-01-01 07:50:00"),
         (None, "2024-01-01 08:00:00")],
        "p string, d string",
    ).select(F.col("p").cast("timestamp").alias("p"), F.col("d").cast("timestamp").alias("d"))
    out = [r["m"] for r in df.select(duration_minutes("p", "d").alias("m")).collect()]
    assert out[0] == 10.5
    assert out[1] == -10.0   # sign preserved (F4)
    assert out[2] is None    # NULL propagates


def test_guarded_ratio(spark):
    df = spark.createDataFrame([(2.0, 10.0), (2.0, 0.0), (2.0, -1.0)], "n double, d double")
    out = [r["r"] for r in df.select(guarded_ratio("n", "d").alias("r")).collect()]
    assert out[0] == 20.0
    assert out[1] == 0.0   # div-by-zero guard, not NULL
    assert out[2] == 0.0


def test_surrogate_key_deterministic_and_null_default(spark):
    df = spark.createDataFrame([(1, 2), (1, None)], "a int, b int")
    k = surrogate_key(["a", "b"], defaults=["0", "0"])
    out = [r["k"] for r in df.select(k.alias("k")).collect()]
    assert len(out[0]) == 32 and out[0] != out[1]
    # NULL replaced by default -> same hash as literal 0
    expect = spark.createDataFrame([(1, 0)], "a int, b int").select(k.alias("k")).first()["k"]
    assert out[1] == expect


def test_month_helpers(spark):
    assert next_month("2024-01") == "2024-02"
    assert next_month("2024-12") == "2025-01"
    df = spark.createDataFrame([("2024-03-31 23:59:59",)], "t string").select(
        month_key(F.col("t").cast("timestamp")).alias("m")
    )
    assert df.first()["m"] == "2024-03"


def test_row_count_guard(spark, trips):
    assert trips.count() == 16
