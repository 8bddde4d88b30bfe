"""Canonical schemas.

The reference declares its schemas as Postgres DDL; here they are Spark
``StructType`` constants used for *validated* (never inferred) reads.

- Trip table: staging DDL at reference ``dags/nyc_taxi_pipeline.py:72-79``
  (19 columns, all nullable, lowercase names per the ingest normalization at
  ``dags/nyc_taxi_pipeline.py:144``).
- Run ledger: metadata DDL at ``dags/nyc_taxi_pipeline.py:84-95``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- staging.yellow_tripdata_raw (reference dags/nyc_taxi_pipeline.py:72-79) ---

TRIP_INT_COLUMNS = [
    "vendorid",
    "passenger_count",
    "ratecodeid",
    "pulocationid",
    "dolocationid",
    "payment_type",
]

TRIP_MONEY_COLUMNS = [
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
    "airport_fee",
]

TRIP_SCHEMA = T.StructType(
    [
        T.StructField("vendorid", T.IntegerType()),
        T.StructField("tpep_pickup_datetime", T.TimestampType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampType()),
        T.StructField("passenger_count", T.IntegerType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("ratecodeid", T.IntegerType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("pulocationid", T.IntegerType()),
        T.StructField("dolocationid", T.IntegerType()),
        T.StructField("payment_type", T.IntegerType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("extra", T.DoubleType()),
        T.StructField("mta_tax", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("tolls_amount", T.DoubleType()),
        T.StructField("improvement_surcharge", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("congestion_surcharge", T.DoubleType()),
        T.StructField("airport_fee", T.DoubleType()),
    ]
)

TRIP_COLUMNS = [f.name for f in TRIP_SCHEMA.fields]

# --- metadata.pipeline_metadata (reference dags/nyc_taxi_pipeline.py:84-95) ---
# Postgres SERIAL id is dropped: the ledger keys on run_id, which the
# reference already declares UNIQUE (dags/nyc_taxi_pipeline.py:92).

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("pipeline_name", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("load_type", T.StringType()),
        T.StructField("target_month", T.StringType()),  # 'YYYY-MM'
        T.StructField("last_successful_month", T.StringType()),
        T.StructField("status", T.StringType()),  # RUNNING | SUCCESS | FAILED
        T.StructField("runtime_seconds", T.DoubleType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)


def require_columns(df, columns) -> None:
    """Schema validation on read (GX ExpectColumnToExist analogue,
    reference ``dags/validation_utils.py:94-104``): raise if any named column
    is missing. A pure-metadata check — no scan."""
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}")
