"""SparkSession factory.

Parity notes (reference -> Spark):

- ``spark.sql.ansi.enabled=false``: the reference's ingest coerces bad values
  to NULL (``pd.to_numeric(errors='coerce')``,
  reference ``dags/nyc_taxi_pipeline.py:148-150``).  Spark 4 defaults ANSI *on*
  (failing casts raise); disabling it restores cast-to-NULL semantics.
- ``spark.sql.session.timeZone=UTC``: the reference's Postgres TIMESTAMP
  columns are tz-naive (``dags/nyc_taxi_pipeline.py:72-79``); pinning UTC makes
  epoch extraction and string rendering deterministic.
- ``partitionOverwriteMode=dynamic``: the reference deletes a month slice
  before re-loading it (``dags/nyc_taxi_pipeline.py:130-135``); dynamic
  partition overwrite is the Spark-native idempotent equivalent.
- AQE on: runtime coalescing / skew-join splitting — essential at the 100 TB
  design point where static shuffle-partition counts are always wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "nyc-taxi-spark-engine"


def default_parallelism() -> int:
    """CPU budget: honour the driver's SPARK_GRAFT_CPUS, else all cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[SPARK_GRAFT_CPUS]``.  ``shuffle_partitions`` defaults to the
    core count locally — on a 1000-executor cluster you would set this to
    2-3x total cores (AQE coalesces the excess at runtime anyway).
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
