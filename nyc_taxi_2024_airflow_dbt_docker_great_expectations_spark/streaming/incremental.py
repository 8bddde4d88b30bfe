"""Structured-Streaming incremental ingest — the streaming re-expression of
the reference's metadata-driven monthly batch load (SURVEY.md section 7, a
capability superset: the reference is batch-only).

``trigger(availableNow=True)`` turns the file source into an incremental
batch job: each invocation processes exactly the files that arrived since the
last checkpoint, then exits — the run-ledger month-watermark logic
(reference ``dags/nyc_taxi_pipeline.py:107-116``) becomes checkpoint state
that Spark maintains transactionally.  At 100 TB/day this is the shape that
replaces hand-rolled watermarks: exactly-once file tracking, backpressure via
``maxFilesPerTrigger``, and the same month-partitioned layout downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.datetime import month_key
from ..schema import TRIP_SCHEMA


def read_trip_stream(spark: SparkSession, source_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over a directory of monthly trip parquet drops."""
    reader = spark.readStream.schema(TRIP_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def run_incremental_ingest(spark: SparkSession, source_dir: str,
                           staging_path: str, checkpoint_path: str,
                           timeout_s: int = 300) -> None:
    """Process all currently-available new files into month-partitioned
    staging, then stop (availableNow).  Re-running picks up only new files —
    the checkpoint IS the watermark."""
    stream = read_trip_stream(spark, source_dir)
    out = stream.withColumn(
        "month",
        F.coalesce(month_key(F.col("tpep_pickup_datetime")), F.lit("unknown")),
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", staging_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("month")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
