"""Streaming dedup (streaming/dedup.py): batch equivalence + multi-batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.dedup import (
    dedup_keys_stream,
    dedup_stream,
)

SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type", "value",
    ).coalesce(1).write.mode(mode).parquet(path)


def _await(q, timeout=120):
    """awaitTermination returns False on timeout WITHOUT stopping the
    query; stop it and fail loudly so a slow box produces a clear
    TimeoutError instead of a partial-sink assertion failure (or a
    flaky pass) downstream."""
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(f"stream did not terminate within {timeout}s")


def _run(df_stream, tmp, name):
    sink = os.path.join(tmp, name)
    q = (
        df_stream.writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", os.path.join(tmp, name + "_ck"))
        .trigger(availableNow=True).start()
    )
    _await(q)
    return sink


def test_dedup_keys_stream_equals_batch_distinct(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "ev")
    rows = [
        (1, "2024-01-01 08:00:10", "click", 1.0),
        (1, "2024-01-01 08:00:40", "click", 2.0),   # same minute: dup key
        (1, "2024-01-01 08:05:00", "click", 3.0),   # new minute
        (2, "2024-01-01 08:00:20", "view", 4.0),
        (2, "2024-01-01 08:00:20", "view", 4.0),    # exact dup row
    ]
    _write(spark, src, rows)
    stream = spark.readStream.schema(SCHEMA).parquet(src).select(
        "user_id", "event_type",
        F.date_trunc("minute", "ts").alias("ts_min"),
    )
    sink = _run(
        dedup_keys_stream(stream, ["user_id", "event_type", "ts_min"],
                          ts_key="ts_min"),
        tmp_warehouse, "keys",
    )
    got = {(r["user_id"], r["event_type"], str(r["ts_min"]))
           for r in spark.read.parquet(sink).collect()}
    batch = spark.createDataFrame(rows, SCHEMA.replace("ts timestamp", "ts string"))
    want = {
        (r["user_id"], r["event_type"], str(r["ts_min"]))
        for r in batch.select(
            "user_id", "event_type",
            F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("ts_min"),
        ).distinct().collect()
    }
    assert got == want and len(got) == 3


def test_dedup_stream_first_arrival_across_batches(spark, tmp_warehouse):
    """A duplicate arriving in a LATER micro-batch (within the watermark
    horizon) is still suppressed: state carries across batches."""
    src = os.path.join(tmp_warehouse, "ev2")
    stream_def = lambda: dedup_stream(  # noqa: E731
        spark.readStream.schema(SCHEMA).parquet(src),
        keys=["user_id", "event_type"], ts_col="ts",
        watermark="10 minutes",
    )
    _write(spark, src, [(1, "2024-01-01 08:00:00", "click", 1.0)])
    sink = os.path.join(tmp_warehouse, "out2")
    ck = os.path.join(tmp_warehouse, "ck2")
    q = (
        stream_def().writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    _await(q)
    # batch 2: one dup of (1, click) within the horizon + one new key
    _write(spark, src, [
        (1, "2024-01-01 08:02:00", "click", 9.0),
        (2, "2024-01-01 08:02:30", "view", 5.0),
    ], mode="append")
    q = (
        stream_def().writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    _await(q)
    out = spark.read.parquet(sink).collect()
    assert {(r["user_id"], r["event_type"]) for r in out} == {
        (1, "click"), (2, "view")
    }
    assert len(out) == 2  # the batch-2 duplicate was dropped by state


def test_rocksdb_state_store_provider_parity(spark, tmp_warehouse):
    """The RocksDB state-store provider (the production backend once
    streaming state outgrows executor heap — the default HDFS-backed
    provider holds each partition's whole state map in memory) must emit
    exactly the default provider's rows.  Runs the same two-batch
    first-arrival dedup under both providers and compares the full
    output sets."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = ("org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider")
    rows1 = [(1, "2024-01-01 08:00:00", "click", 1.0)]
    rows2 = [
        (1, "2024-01-01 08:02:00", "click", 9.0),   # dup within horizon
        (2, "2024-01-01 08:02:30", "view", 5.0),
    ]

    def run(tag, provider):
        src = os.path.join(tmp_warehouse, f"ev_{tag}")
        sink = os.path.join(tmp_warehouse, f"out_{tag}")
        ck = os.path.join(tmp_warehouse, f"ck_{tag}")
        prev = spark.conf.get(provider_conf,
                              "org.apache.spark.sql.execution.streaming."
                              "state.HDFSBackedStateStoreProvider")
        if provider:
            spark.conf.set(provider_conf, provider)
        try:
            for i, rows in enumerate((rows1, rows2)):
                _write(spark, src, rows,
                       mode="overwrite" if i == 0 else "append")
                q = (dedup_stream(
                        spark.readStream.schema(SCHEMA).parquet(src),
                        keys=["user_id", "event_type"], ts_col="ts",
                        watermark="10 minutes")
                     .writeStream.format("parquet").option("path", sink)
                     .option("checkpointLocation", ck)
                     .trigger(availableNow=True).start())
                _await(q)
        finally:
            spark.conf.set(provider_conf, prev)
        return {(r["user_id"], r["event_type"], str(r["ts"]), r["value"])
                for r in spark.read.parquet(sink).collect()}

    default_out = run("hdfs", None)
    rocksdb_out = run("rocks", rocksdb)
    assert rocksdb_out == default_out
    assert {(u, e) for u, e, *_ in default_out} == {(1, "click"), (2, "view")}
