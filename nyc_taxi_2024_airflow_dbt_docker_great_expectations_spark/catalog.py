"""Namespace / table naming — the medallion catalog.

Replaces the reference's dbt ``generate_schema_name`` macro
(``dbt/nyc_taxi/macros/generate_schema_name.sql:1-10``, which routes models to
bare layer schemas with no target prefix) and the CREATE SCHEMA bootstrap
(``dags/nyc_taxi_pipeline.py:55-65``).

Two modes:

- **catalog mode**: real Spark SQL namespaces + ``saveAsTable`` — what a
  cluster deployment with a metastore uses.
- **path mode**: a parquet warehouse directory layout
  ``{root}/{layer}/{table}`` — dependency-free, used by tests and local runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

LAYERS = ["staging", "bronze", "silver", "gold", "metadata"]


def qualified_name(layer: str, table: str) -> str:
    if layer not in LAYERS:
        raise ValueError(f"unknown layer {layer!r}; expected one of {LAYERS}")
    return f"{layer}.{table}"


def ensure_namespaces(spark: SparkSession, layers=None) -> None:
    """CREATE SCHEMA IF NOT EXISTS for each medallion layer
    (reference ``dags/nyc_taxi_pipeline.py:55-65``)."""
    for layer in layers or LAYERS:
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {layer}")


class Warehouse:
    """Path-mode catalog: tables are parquet directories under a root."""

    def __init__(self, root: str):
        self.root = root

    def path(self, layer: str, table: str) -> str:
        qualified_name(layer, table)  # validates layer
        return os.path.join(self.root, layer, table)

    def exists(self, layer: str, table: str) -> bool:
        p = self.path(layer, table)
        if not os.path.isdir(p):
            return False
        # a dir with only _SUCCESS / no part files is not a readable table
        return any(
            f.endswith(".parquet") or f.startswith("part-")
            for root, _dirs, files in os.walk(p)
            for f in files
        )

    def read(self, spark: SparkSession, layer: str, table: str):
        return spark.read.parquet(self.path(layer, table))

    def write(self, df, layer: str, table: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(layer, table))
