from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.merge import (
    month_partition_overwrite,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.sources.readers import (
    download_monthly_files,
    normalize_columns,
    read_csv_seed,
    read_events,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.sources.sinks import (
    write_month_partitioned,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.windows import (
    session_stats_batch,
    tumbling_counts_batch,
)


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2)], "VendorID int, PULocationID int")
    assert normalize_columns(df).columns == ["vendorid", "pulocationid"]


def test_read_csv_seed_null_sentinel(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "seed.csv")
    with open(path, "w") as f:
        f.write("vendorid,tpep_pickup_datetime,tpep_dropoff_datetime,passenger_count,"
                "trip_distance,ratecodeid,store_and_fwd_flag,pulocationid,dolocationid,"
                "payment_type,fare_amount,extra,mta_tax,tip_amount,tolls_amount,"
                "improvement_surcharge,total_amount,congestion_surcharge,airport_fee\n")
        f.write("1,2024-01-01 08:00:00,2024-01-01 08:10:00,1,2.5,1,N,100,200,1,"
                "10.0,1.0,0.5,2.0,0.0,0.3,13.8,0.0,\\N\n")
    df = read_csv_seed(spark, path)
    row = df.first()
    assert row["vendorid"] == 1
    assert row["airport_fee"] is None  # \N sentinel -> NULL
    assert row["tpep_pickup_datetime"] == dt.datetime(2024, 1, 1, 8, 0, 0)


def test_month_partition_overwrite_idempotent(spark, tmp_warehouse):
    """S10: re-writing one month replaces only that month's partition."""
    path = os.path.join(tmp_warehouse, "staging")
    jan = spark.createDataFrame([("2024-01", 1)], "month string, v int")
    feb = spark.createDataFrame([("2024-02", 2)], "month string, v int")
    month_partition_overwrite(jan.unionByName(feb), path)
    # re-load Feb with a new value; Jan must survive untouched
    feb2 = spark.createDataFrame([("2024-02", 99), ("2024-02", 100)], "month string, v int")
    month_partition_overwrite(feb2, path)
    out = spark.read.parquet(path)
    assert out.filter("month = '2024-01'").count() == 1
    assert sorted(r["v"] for r in out.filter("month = '2024-02'").collect()) == [99, 100]


def test_write_month_partitioned_derives_month(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "trips")
    df = spark.createDataFrame(
        [("2024-01-15 08:00:00",), ("2024-02-01 00:00:00",)], "t string"
    ).select(F.col("t").cast("timestamp").alias("tpep_pickup_datetime"))
    write_month_partitioned(df, path)
    out = spark.read.parquet(path)
    assert sorted(r["month"] for r in out.select("month").collect()) == ["2024-01", "2024-02"]


def test_read_events_ns_timestamps(spark):
    # the driver has shipped events.ts both as TIMESTAMP(NANOS) (read via
    # the legacy int64 path -> "timestamp") and as timestamp[us] without tz
    # (Spark 4 reads "timestamp_ntz"); read_events must yield a usable
    # timestamp type either way
    df = read_events(spark, "/root/testdata/sf0.001/events.parquet")
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    assert df.count() > 0


def _events_fixture(spark):
    rows = [
        (1, "2024-01-01 08:00:00", "click", 1.0),
        (1, "2024-01-01 08:10:00", "click", 2.0),   # same session (10 min gap)
        (1, "2024-01-01 09:30:00", "view", 3.0),    # new session (80 min gap)
        (2, "2024-01-01 08:02:00", "click", 4.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts string, event_type string, value double") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")


def test_sessionize_batch(spark):
    out = session_stats_batch(_events_fixture(spark), gap_minutes=30.0)
    stats = {(r["user_id"], r["session_seq"]): r for r in out.collect()}
    assert len(stats) == 3
    assert stats[(1, 1)]["n_events"] == 2
    assert stats[(1, 1)]["session_value"] == 3.0
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(2, 1)]["n_events"] == 1


def test_tumbling_counts_batch(spark):
    out = tumbling_counts_batch(_events_fixture(spark), "5 minutes")
    row = [r for r in out.collect()
           if r["window_start"] == dt.datetime(2024, 1, 1, 8, 0, 0)
           and r["event_type"] == "click"]
    # 08:00 (user 1) and 08:02 (user 2) share the [08:00, 08:05) click window
    assert len(row) == 1 and row[0]["n_events"] == 2
    assert row[0]["total_value"] == 5.0


def test_tumbling_stream_availablenow(spark, tmp_warehouse):
    """The same windowed aggregation as a real Structured Streaming job:
    parquet source -> availableNow trigger -> memory sink."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.windows import (
        tumbling_counts_stream,
    )
    src_dir = os.path.join(tmp_warehouse, "stream_src")
    _events_fixture(spark).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, value double"
        ).parquet(src_dir)
    )
    agg = tumbling_counts_stream(stream, "5 minutes", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from tumbling_test").collect()
    assert sum(r["n_events"] for r in rows) == 4


def test_download_monthly_files(tmp_path):
    """S6 fetcher: streams present months, skips missing ones without
    failing, and is idempotent on re-run (existing files not re-fetched)."""
    src = tmp_path / "remote"
    src.mkdir()
    for m in (1, 2):
        (src / f"yellow_tripdata_2024-{m:02d}.parquet").write_bytes(
            b"PAR1" + bytes([m])
        )
    dest = tmp_path / "local"
    got = download_monthly_files(f"file://{src}", str(dest), months=range(1, 4))
    assert [os.path.basename(p) for p in got] == [
        "yellow_tripdata_2024-01.parquet",
        "yellow_tripdata_2024-02.parquet",
    ]  # month 3 does not exist upstream -> reported by omission, not fatal
    assert (dest / "yellow_tripdata_2024-01.parquet").read_bytes() == b"PAR1\x01"
    assert not (dest / "yellow_tripdata_2024-03.parquet").exists()
    assert download_monthly_files(
        f"file://{src}", str(dest), months=range(1, 4)
    ) == got


def test_sliding_stream_availablenow(spark, tmp_warehouse):
    """Sliding windows as a real streaming job: each event lands in
    duration/slide windows, totals match the batch twin."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.windows import (
        sliding_counts_batch,
        sliding_counts_stream,
    )
    src_dir = os.path.join(tmp_warehouse, "slide_src")
    _events_fixture(spark).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, event_type string, value double"
        ).parquet(src_dir)
    )
    agg = sliding_counts_stream(stream, "10 minutes", "5 minutes",
                                watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt_sl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(str(r["window_start"]), str(r["window_end"])):
           (r["n_events"], r["total_value"])
           for r in spark.sql("select * from sliding_test").collect()}
    want = {(str(r["window_start"]), str(r["window_end"])):
            (r["n_events"], r["total_value"])
            for r in sliding_counts_batch(
                _events_fixture(spark), "10 minutes", "5 minutes").collect()}
    assert got == want


def test_read_parquet_evolving_merges_schemas(spark, tmp_path):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.sources.readers import (
        read_parquet_evolving,
    )
    base = str(tmp_path / "drops")
    spark.createDataFrame(
        [(1, "a")], "id long, v string"
    ).write.parquet(base + "/m=1")
    # later drop adds a column (and uses a different name case)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, Extra_Col double"
    ).write.parquet(base + "/m=2")
    out = read_parquet_evolving(spark, base)
    assert set(out.columns) >= {"id", "v", "extra_col"}
    rows = {r["id"]: r for r in out.collect()}
    # the old drop reads NULL for the column it predates
    assert rows[1]["extra_col"] is None
    assert rows[2]["extra_col"] == 9.5
