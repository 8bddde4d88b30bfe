from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from conftest import trip_row, ts
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.schema import TRIP_SCHEMA
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.incremental import (
    run_incremental_ingest,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.windows import (
    session_window_stream,
)


def _write_trips(spark, dirpath, name, rows):
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in TRIP_SCHEMA.fields) for r in rows], TRIP_SCHEMA
    )
    # one file per drop, like a monthly upstream delivery
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(dirpath, name))


def test_incremental_ingest_checkpoint_is_watermark(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "drops")
    staging = os.path.join(tmp_warehouse, "staging")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    os.makedirs(src, exist_ok=True)

    _write_trips(spark, src, "jan", [
        trip_row(tpep_pickup_datetime=ts("2024-01-10 08:00:00")),
        trip_row(tpep_pickup_datetime=ts("2024-01-11 08:00:00")),
    ])
    run_incremental_ingest(spark, src + "/*", staging, ckpt)
    out1 = spark.read.parquet(staging)
    assert out1.count() == 2
    assert {r["month"] for r in out1.select("month").distinct().collect()} == {"2024-01"}

    # second drop: only the new file is processed (checkpoint watermark)
    _write_trips(spark, src, "feb", [
        trip_row(tpep_pickup_datetime=ts("2024-02-05 08:00:00")),
    ])
    run_incremental_ingest(spark, src + "/*", staging, ckpt)
    out2 = spark.read.parquet(staging)
    assert out2.count() == 3  # 2 old + 1 new, not re-ingested

    # re-run with nothing new: no duplicates (exactly-once file tracking)
    run_incremental_ingest(spark, src + "/*", staging, ckpt)
    assert spark.read.parquet(staging).count() == 3


def test_session_window_stream(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "events_src")
    rows = [
        (1, "2024-01-01 08:00:00", "click", 1.0),
        (1, "2024-01-01 08:10:00", "click", 2.0),   # merges into session 1
        (1, "2024-01-01 09:30:00", "view", 3.0),    # > 30-min gap: session 2
        (2, "2024-01-01 08:02:00", "click", 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    df.write.parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string, value double"
    ).parquet(src)
    q = (
        session_window_stream(stream, "30 minutes")
        .writeStream.format("memory")
        .queryName("session_stream_test")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(tmp_warehouse, "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {(r["user_id"], r["session_start"]): r
           for r in spark.sql("select * from session_stream_test").collect()}
    assert len(out) == 3
    sessions_u1 = sorted(
        (k[1], v["n_events"], v["session_value"]) for k, v in out.items() if k[0] == 1
    )
    assert sessions_u1[0][1] == 2 and sessions_u1[0][2] == 3.0
    assert sessions_u1[1][1] == 1 and sessions_u1[1][2] == 3.0


def test_merge_sink_upserts_and_replays_idempotently(spark, tmp_warehouse):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.incremental import (
        run_merge_sink,
    )

    src = os.path.join(tmp_warehouse, "kv_drops")
    target = os.path.join(tmp_warehouse, "kv_state")
    ckpt = os.path.join(tmp_warehouse, "kv_ckpt")
    os.makedirs(src, exist_ok=True)

    def drop(name, rows):
        spark.createDataFrame(rows, "k long, v string, rev long") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(src, name))

    def state():
        return {r["k"]: (r["v"], r["rev"])
                for r in spark.read.parquet(target).collect()}

    stream = (spark.readStream
              .schema("k long, v string, rev long").parquet(src + "/*"))

    # batch 1: initial keys, including a within-batch duplicate key where
    # the HIGHEST order_col must win even though its payload sorts LOWER
    # lexicographically ('aaa' < 'zzz') — version order, not schema order
    drop("b1", [(1, "a", 1), (2, "zzz", 1), (2, "aaa", 9)])
    run_merge_sink(stream, target, ckpt, keys=["k"], order_col="rev")
    assert state() == {1: ("a", 1), 2: ("aaa", 9)}

    # batch 2: update one key, add one key -> upsert, not append
    drop("b2", [(2, "b2", 10), (3, "c", 1)])
    run_merge_sink(stream, target, ckpt, keys=["k"], order_col="rev")
    assert state() == {1: ("a", 1), 2: ("b2", 10), 3: ("c", 1)}

    # replay: simulate a post-failure re-delivery of the SAME batch by
    # invoking the sink with a fresh checkpoint over the same files —
    # the keyed merge converges instead of duplicating
    run_merge_sink(stream, target, os.path.join(tmp_warehouse, "kv_ckpt2"),
                   keys=["k"], order_col="rev")
    assert state() == {1: ("a", 1), 2: ("b2", 10), 3: ("c", 1)}
    assert spark.read.parquet(target).count() == 3

    # cross-batch version gate: a STALE re-delivery (older rev for an
    # existing key, e.g. reprocessing old files under a fresh checkpoint)
    # must not regress the key to the lower version; the genuinely-new
    # key in the same stale batch still lands
    drop("b_stale", [(2, "old-again", 3), (4, "d", 1)])
    run_merge_sink(stream, target, os.path.join(tmp_warehouse, "kv_ckpt3"),
                   keys=["k"], order_col="rev")
    assert state() == {1: ("a", 1), 2: ("b2", 10), 3: ("c", 1), 4: ("d", 1)}

    import pytest

    with pytest.raises(ValueError, match="cannot be a key column"):
        run_merge_sink(stream, target, ckpt, keys=["k"], order_col="k")


def test_merge_sink_payload_column_with_dot(spark, tmp_warehouse):
    """Payload column names containing dots must survive the within-batch
    dedup (getField extraction, not a dotted F.col path)."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.incremental import (
        run_merge_sink,
    )

    src = os.path.join(tmp_warehouse, "dot_drops")
    target = os.path.join(tmp_warehouse, "dot_state")
    ckpt = os.path.join(tmp_warehouse, "dot_ckpt")
    os.makedirs(src, exist_ok=True)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v.x", T.StringType()),
        T.StructField("rev", T.LongType()),
    ])
    spark.createDataFrame([(1, "a", 1), (1, "b", 2)], schema) \
        .coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(src, "b1"))
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    run_merge_sink(stream, target, ckpt, keys=["k"], order_col="rev")
    rows = spark.read.parquet(target).collect()
    assert [(r["k"], r["v.x"], r["rev"]) for r in rows] == [(1, "b", 2)]
