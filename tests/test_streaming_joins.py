from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.joins import (
    enrich_stream,
    interval_join_streams,
)

EVENT_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_enrich_stream_static_dim(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "ev")
    _write(spark, src, [
        (1, "2024-01-01 08:00:00", "click", 1.0),
        (2, "2024-01-01 08:01:00", "view", 2.0),
        (3, "2024-01-01 08:02:00", "click", 3.0),
    ])
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sink = os.path.join(tmp_warehouse, "enriched")
    q = (
        enrich_stream(stream, dim, "user_id")
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ck1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r["user_id"]: r["tier"] for r in spark.read.parquet(sink).collect()}
    assert out == {1: "gold", 2: "basic", 3: None}  # left join keeps unmatched


def test_interval_join_streams_matches_batch(spark, tmp_warehouse):
    """Streaming interval join over a terminating (availableNow) source must
    emit exactly the batch join's rows — watermarks bound state, not
    output."""
    clicks_rows = [
        (1, "2024-01-01 08:00:00", "click", 1.0),
        (1, "2024-01-01 12:00:00", "click", 2.0),
        (2, "2024-01-01 08:00:00", "click", 3.0),
    ]
    buys_rows = [
        (1, "2024-01-01 08:05:00", "purchase", 10.0),   # within 10m of click 1
        (1, "2024-01-01 12:30:00", "purchase", 20.0),   # outside 10m of click 2
        (2, "2024-01-01 08:09:59", "purchase", 30.0),   # within
        (3, "2024-01-01 08:00:00", "purchase", 40.0),   # no click
    ]
    csrc = os.path.join(tmp_warehouse, "clicks")
    bsrc = os.path.join(tmp_warehouse, "buys")
    _write(spark, csrc, clicks_rows)
    _write(spark, bsrc, buys_rows)

    cs = spark.readStream.schema(EVENT_SCHEMA).parquet(csrc)
    bs = spark.readStream.schema(EVENT_SCHEMA).parquet(bsrc)
    joined = interval_join_streams(cs, bs, "user_id", upper="10 minutes")
    sink = os.path.join(tmp_warehouse, "joined")
    q = (
        joined.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["user_id"], str(r["ts"]), str(r["r_ts"]))
           for r in spark.read.parquet(sink).collect()}

    cb = spark.read.parquet(csrc)
    bb = spark.read.parquet(bsrc).select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts")
    )
    batch = cb.join(
        bb,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("interval 10 minutes")),
    )
    want = {(r["user_id"], str(r["ts"]), str(r["r_ts"])) for r in batch.collect()}
    assert got == want
    assert (1, "2024-01-01 08:00:00", "2024-01-01 08:05:00") in got
    assert all(u != 3 for (u, _, _) in got)
