"""Bronze model (reference ``dbt/nyc_taxi/models/bronze/bronze_yellow_tripdata.sql``).

Selects the 19 canonical columns from staging (P1) and, on incremental runs,
keeps only the target month (P3).  With month-partitioned staging the P3
month-equality filter becomes partition pruning — Catalyst eliminates every
other month's files from the scan without a custom rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.datetime import month_key
from ..schema import TRIP_COLUMNS


def bronze_trips(staging: DataFrame, target_month: str | None = None) -> DataFrame:
    """P1 projection + optional P3 month filter
    (reference bronze_yellow_tripdata.sql:7-35)."""
    df = staging.select(*[c for c in TRIP_COLUMNS if c in staging.columns])
    if target_month is not None:
        df = df.filter(month_key(F.col("tpep_pickup_datetime")) == F.lit(target_month))
    return df
