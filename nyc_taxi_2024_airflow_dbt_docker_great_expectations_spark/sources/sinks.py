"""Sinks (reference S4, S7-S10).

The reference's CSV->COPY bulk load (S4) has no Spark analogue because Spark
*is* the warehouse: staging is a parquet write.  Materialization strategies:

- ``table`` (full rebuild, S7) -> ``overwrite_table``
- ``incremental`` merge / delete+insert (S8/S9) -> ``operators.merge`` +
  an overwrite of the target
- idempotent month re-load (S10) -> ``write_month_partitioned`` under
  dynamic partition overwrite (session.py sets the conf)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.datetime import month_key


def overwrite_table(df: DataFrame, path: str,
                    partition_by: list[str] | None = None) -> None:
    """S7 full-rebuild table materialization (CREATE TABLE AS equivalent)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_month_partitioned(df: DataFrame, path: str,
                            ts_col: str = "tpep_pickup_datetime",
                            month_col: str = "month") -> None:
    """S10: write with a derived month partition column; with
    ``partitionOverwriteMode=dynamic`` a re-run of the same month replaces
    only that month's partition — the reference's DELETE-then-COPY
    idempotency (dags/nyc_taxi_pipeline.py:130-135) without touching any
    other partition.  Month partitioning also turns the P3/P6 month
    predicates into partition pruning at scan time.
    """
    out = df.withColumn(month_col, month_key(F.col(ts_col)))
    out.write.mode("overwrite").partitionBy(month_col).parquet(path)
