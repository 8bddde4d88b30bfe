"""Silver model (reference ``dbt/nyc_taxi/models/silver/silver_yellow_tripdata.sql``).

The full cleaning/enrichment transform, one declarative select chain:

- pass-through id/timestamp columns (P2)
- decoded vendor/ratecode/payment names (F1-F3)
- ``trip_duration_minutes`` = rounded epoch-minutes (F4/F5)
- 8 money columns cleaned ``ABS(COALESCE(x,0))`` (F6)
- ``total_amount`` recomputed as the 8-way sum (F7)
- md5 surrogate ``unique_trip_id`` over 7 columns (F8)
- domain filter ``payment_type IN (1..6)`` — NULLs drop too, IN-semantics (P7)
- DISTINCT ON (unique_trip_id) keeping earliest pickup (W1)
- incremental watermark ``pickup > MAX(target.pickup)`` (P4)

Everything is built-in column expressions — a single whole-stage-codegen span
up to the W1 window shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.datetime import duration_minutes
from ..functions.decode import PAYMENT_MAP, RATECODE_MAP, VENDOR_MAP, decode_map
from ..functions.keys import surrogate_key
from ..functions.money import abs_coalesce_zero, row_total
from ..operators.dedup import distinct_on
from ..operators.watermark import watermark_filter

# reference silver_yellow_tripdata.sql:72-80 — the 7 surrogate-key inputs
SURROGATE_COLS = [
    "vendorid",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "pulocationid",
    "dolocationid",
    "passenger_count",
    "trip_distance",
]
# NULL sentinels exactly as the reference writes them
# (silver_yellow_tripdata.sql:73-79): '-1' for the id columns,
# bare-date '1900-01-01' for the timestamps, '0' for the measures.
SURROGATE_DEFAULTS = ["-1", "1900-01-01", "1900-01-01", "-1", "-1", "0", "0"]

CLEANED_MONEY = [
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
    "airport_fee",
]


def silver_trips(bronze: DataFrame, target: DataFrame | None = None) -> DataFrame:
    df = bronze
    # P4 incremental watermark (silver_yellow_tripdata.sql:9-11)
    df = watermark_filter(df, target, "tpep_pickup_datetime")

    df = df.select(
        "vendorid",
        "tpep_pickup_datetime",
        "tpep_dropoff_datetime",
        "passenger_count",
        "trip_distance",
        "ratecodeid",
        "store_and_fwd_flag",
        "pulocationid",
        "dolocationid",
        "payment_type",
        decode_map("vendorid", VENDOR_MAP).alias("vendor_name"),
        decode_map("ratecodeid", RATECODE_MAP, "Null/unknown").alias("ratecode_description"),
        decode_map("payment_type", PAYMENT_MAP).alias("payment_description"),
        duration_minutes("tpep_pickup_datetime", "tpep_dropoff_datetime").alias(
            "trip_duration_minutes"
        ),
        *[abs_coalesce_zero(c).alias(c) for c in CLEANED_MONEY],
        # sep="" — the reference concatenates with bare `||`
        # (silver_yellow_tripdata.sql:72-80), no separator between parts
        surrogate_key(
            SURROGATE_COLS,
            SURROGATE_DEFAULTS,
            sep="",
            timestamp_cols={"tpep_pickup_datetime", "tpep_dropoff_datetime"},
        ).alias("unique_trip_id"),
    )
    # F7: total recomputed from the cleaned components (silver sql:69)
    df = df.withColumn("total_amount", row_total(*CLEANED_MONEY))
    # P7 domain filter (silver sql:63): IN-list, NULL payment_type drops
    df = df.filter(F.col("payment_type").isin(1, 2, 3, 4, 5, 6))
    # W1 DISTINCT ON (silver sql:85-87): earliest pickup per surrogate key
    return distinct_on(df, ["unique_trip_id"], [F.col("tpep_pickup_datetime")])
