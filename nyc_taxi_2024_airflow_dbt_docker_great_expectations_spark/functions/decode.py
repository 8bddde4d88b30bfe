"""Decode-table lookups (reference F1-F3 / J3).

The reference inlines id->name mappings as SQL CASE chains
(``dbt/nyc_taxi/models/silver/silver_yellow_tripdata.sql:20-47``).  The engine
offers both Spark-idiomatic forms:

- ``decode_map``: chained ``when/otherwise`` — exact CASE parity, constant
  folded by Catalyst, no shuffle, no join.
- ``decode_via_broadcast_join``: the star-schema form — a broadcast-hash join
  against a tiny dim DataFrame.  At 100 TB this is the form you want when the
  mapping is data (changes without redeploy) rather than code; ``F.broadcast``
  guarantees no shuffle of the fact side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# reference silver_yellow_tripdata.sql:20-26
VENDOR_MAP = {
    1: "Creative Mobile Technologies, LLC",
    2: "Curb Mobility, LLC",
    6: "Myle Technologies Inc",
    7: "Helix",
}

# reference silver_yellow_tripdata.sql:28-36
RATECODE_MAP = {
    1: "Standard rate",
    2: "JFK",
    3: "Newark",
    4: "Nassau or Westchester",
    5: "Negotiated fare",
    6: "Group ride",
}

# reference silver_yellow_tripdata.sql:38-47 (0 = Flex Fare)
PAYMENT_MAP = {
    0: "Flex Fare trip",
    1: "Credit card",
    2: "Cash",
    3: "No charge",
    4: "Dispute",
    5: "Unknown",
    6: "Voided trip",
}


def decode_map(col: Column | str, mapping: dict, default: str | None = "Unknown") -> Column:
    """Chained ``when/otherwise`` decode — CASE-expression parity (F1-F3).

    NULL and unmapped ids both fall through to ``default`` exactly like the
    reference's ``ELSE 'Unknown'`` branch.
    """
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for key, value in mapping.items():
        cond = c == F.lit(key)
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default)) if default is not None else expr


def dim_from_map(spark: SparkSession, mapping: dict, key_col: str, value_col: str) -> DataFrame:
    """Materialize a code/name mapping as a tiny dimension DataFrame."""
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], schema=f"{key_col} int, {value_col} string"
    )


def decode_via_broadcast_join(
    df: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    value_col: str,
    default: str | None = "Unknown",
) -> DataFrame:
    """Star-join decode: left join a broadcast dim, defaulting misses (J3).

    ``F.broadcast`` pins a broadcast-hash join: the fact side streams through
    map-side, no shuffle — the only sane plan when the fact table is 100 TB
    and the dim is a handful of rows.
    """
    joined = df.join(F.broadcast(dim), df[key] == dim[dim_key], "left").drop(dim_key)
    if default is not None:
        joined = joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(default)))
    return joined
