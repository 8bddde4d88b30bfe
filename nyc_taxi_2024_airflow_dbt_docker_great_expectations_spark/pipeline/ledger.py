"""Run ledger / watermark metadata (reference O2/O3, S11/S12, P10).

The reference keeps ``metadata.pipeline_metadata`` in Postgres
(DDL ``dags/nyc_taxi_pipeline.py:84-95``) and drives month selection off
``MAX(target_month) WHERE status='SUCCESS'`` (``:107-116``); success/failure
updates at ``:29-41`` and ``dags/failure_callbacks.py:23-28``.

Here the ledger is a tiny parquet table in the warehouse's ``metadata``
layer.  It is driver-scale data (one row per run), so read-modify-overwrite
is the right primitive; the conflict-ignore insert (S11) and status update
(S12) reuse the engine's generic merge operators.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Warehouse
from ..functions.datetime import next_month
from ..operators.merge import append_if_absent
from ..schema import LEDGER_SCHEMA

FIRST_MONTH = "2024-01"  # reference dags/nyc_taxi_pipeline.py:114
TABLE = ("metadata", "pipeline_metadata")


class Ledger:
    def __init__(self, spark: SparkSession, warehouse: Warehouse):
        self.spark = spark
        self.warehouse = warehouse

    # -- storage -----------------------------------------------------------
    def read(self) -> DataFrame:
        if self.warehouse.exists(*TABLE):
            return self.warehouse.read(self.spark, *TABLE)
        return self.spark.createDataFrame([], LEDGER_SCHEMA)

    def _overwrite(self, df: DataFrame) -> None:
        # ledger is tiny: collect to driver, rewrite atomically via createDataFrame
        rows = df.collect()
        out = self.spark.createDataFrame(rows, LEDGER_SCHEMA)
        self.warehouse.write(out.coalesce(1), *TABLE)

    # -- O2: month selection ----------------------------------------------
    def last_successful_month(self, pipeline_name: str) -> str | None:
        """P10: ``SELECT MAX(target_month) WHERE pipeline=? AND status='SUCCESS'``."""
        row = (
            self.read()
            .filter(
                (F.col("pipeline_name") == pipeline_name)
                & (F.col("status") == "SUCCESS")
            )
            .agg(F.max("target_month").alias("m"))
            .first()
        )
        return row["m"]

    def target_month(self, pipeline_name: str) -> str:
        """First run -> 2024-01, else last success + 1 month
        (reference dags/nyc_taxi_pipeline.py:111-116)."""
        last = self.last_successful_month(pipeline_name)
        return FIRST_MONTH if last is None else next_month(last)

    # -- O3: run lifecycle -------------------------------------------------
    def register_run(self, pipeline_name: str, target_month: str,
                     load_type: str = "incremental",
                     run_id: str | None = None) -> str:
        """S11: conflict-ignore insert of a RUNNING row
        (reference dags/nyc_taxi_pipeline.py:122-127)."""
        run_id = run_id or f"{pipeline_name}_{target_month}_{uuid.uuid4().hex[:8]}"
        now = dt.datetime.utcnow()
        new = self.spark.createDataFrame(
            [(pipeline_name, run_id, load_type, target_month,
              self.last_successful_month(pipeline_name), "RUNNING",
              None, None, now, now)],
            LEDGER_SCHEMA,
        )
        self._overwrite(append_if_absent(self.read(), new, ["run_id"]))
        return run_id

    def _set_status(self, run_id: str, status: str, error_message: str | None) -> None:
        """S12: status update computed as a column expression over the ledger
        (runtime_seconds = epoch(now) - epoch(created_at), reference
        dags/nyc_taxi_pipeline.py:34-41; FAILED path failure_callbacks.py:23-28,
        error truncated to 500 chars like failure_callbacks.py:18)."""
        is_run = F.col("run_id") == run_id
        now = F.current_timestamp()
        df = (
            self.read()
            .withColumn("status", F.when(is_run, status).otherwise(F.col("status")))
            .withColumn(
                "runtime_seconds",
                F.when(
                    is_run,
                    (F.unix_timestamp(now) - F.unix_timestamp(F.col("created_at")))
                    .cast("double"),
                ).otherwise(F.col("runtime_seconds")),
            )
            .withColumn(
                "error_message",
                F.when(
                    is_run,
                    F.lit(error_message[:500] if error_message else None),
                ).otherwise(F.col("error_message")),
            )
            .withColumn("updated_at", F.when(is_run, now).otherwise(F.col("updated_at")))
        )
        self._overwrite(df)

    def mark_success(self, run_id: str) -> None:
        self._set_status(run_id, "SUCCESS", None)

    def mark_failed(self, run_id: str, error: str) -> None:
        self._set_status(run_id, "FAILED", error)
