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


def run_merge_sink(stream: DataFrame, target_path: str,
                   checkpoint_path: str, keys: list[str],
                   order_col: str | None = None,
                   timeout_s: int = 300) -> None:
    """Exactly-once streaming UPSERT: ``foreachBatch`` + the keyed merge
    primitive — the canonical production sink when the target must hold
    one row per key, not an append log (dimension tables, latest-state
    stores, dedup-on-arrival ingest).

    Semantics: Spark may REPLAY a micro-batch after a failure (same
    ``batch_id``, same rows).  A blind append would duplicate; the
    keyed merge is idempotent — replaying any batch, any number of
    times, converges to the same target (pytest-asserted by invoking
    the batch writer twice with the same payload).

    Duplicate keys: pass ``order_col`` (an event version / sequence /
    timestamp column) and the HIGHEST ``order_col`` row wins — both
    WITHIN a batch and ACROSS batches: the merge is version-gated
    against the target's existing row, so an out-of-order or stale
    re-delivery spanning batches (e.g. reprocessing older files under a
    fresh checkpoint) cannot regress a key to a lower version.  Without
    ``order_col`` the within-batch winner is the lexicographic MAX over
    the payload struct in schema column order and the batch
    unconditionally replaces the target row (last-writer-wins): still a
    pure function of the batch contents (replay-deterministic, unlike
    ``dropDuplicates``' arrival-order survivor), but NOT "the newest
    row" — supply ``order_col`` whenever one exists.

    On Delta/Iceberg the body becomes ``MERGE INTO`` and the
    write-aside-and-swap disappears; checkpointing, replay, and the
    availableNow trigger semantics stay identical.
    """
    from ..operators.merge import merge_write_path, quoted_col

    if order_col is not None and order_col in set(keys):
        raise ValueError(f"order_col {order_col!r} cannot be a key column")

    def _merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        payload = [c for c in batch_df.columns if c not in set(keys)]
        if order_col is not None and order_col not in payload:
            raise ValueError(
                f"order_col {order_col!r} not in batch columns "
                f"{batch_df.columns}")
        if payload:
            # order_col leads the comparison struct so the max is
            # version-ordered; remaining payload columns break exact
            # version ties deterministically
            lead = ([order_col] if order_col else []) + \
                [c for c in payload if c != order_col]
            # getField / backtick-quoted refs (not dotted F.col paths) so
            # column names containing dots are never misparsed as nested
            # references
            deduped = (
                batch_df.groupBy(*[quoted_col(k) for k in keys])
                .agg(F.max(F.struct(*[quoted_col(c).alias(c)
                                      for c in lead])).alias("__p"))
                .select(*[quoted_col(k) for k in keys],
                        *[F.col("__p").getField(c).alias(c)
                          for c in payload])
            )
        else:
            deduped = batch_df.dropDuplicates(keys)
        merge_write_path(batch_df.sparkSession, target_path, deduped, keys,
                         order_col=order_col)

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
