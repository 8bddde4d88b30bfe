"""Sources (reference S1-S6).

The reference hand-rolls bounded-memory ingest: pyarrow ``iter_batches`` of
100k rows, pandas column normalization, lossy ``Int64`` coercion, CSV
serialization into Postgres ``COPY`` (``dags/nyc_taxi_pipeline.py:138-157``).
Under Spark the whole loop disappears: a schema'd parquet scan is already
columnar, batched, pipelined, and parallel across executors — at 100 TB the
scan parallelism is the file/row-group split count, no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import TRIP_COLUMNS, TRIP_INT_COLUMNS, TRIP_SCHEMA


def normalize_columns(df: DataFrame) -> DataFrame:
    """S2: lowercase all column names (reference dags/nyc_taxi_pipeline.py:144)."""
    return df.toDF(*[c.lower() for c in df.columns])


def coerce_int_columns(df: DataFrame, columns=TRIP_INT_COLUMNS) -> DataFrame:
    """S3: lossy int coercion — bad values become NULL, matching
    ``pd.to_numeric(errors='coerce').astype('Int64')``
    (reference dags/nyc_taxi_pipeline.py:148-150).  ``try_cast`` yields
    NULL on failure in EVERY session mode — ANSI-neutral, so the operator
    keeps coerce semantics even under a vanilla Spark 4 (ANSI-on) session
    instead of relying on session.py's ansi=false."""
    out = df
    for c in columns:
        if c in out.columns:
            out = out.withColumn(c, F.col(c).try_cast("int"))
    return out


def read_trip_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2+S3: monthly trip parquet scan, normalized to the canonical
    19-column schema (reference dags/nyc_taxi_pipeline.py:117,138-150)."""
    df = normalize_columns(spark.read.parquet(path))
    df = coerce_int_columns(df)
    cast = [
        F.col(f.name).cast(f.dataType).alias(f.name)
        for f in TRIP_SCHEMA.fields
        if f.name in df.columns
    ]
    return df.select(*cast)


def read_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Read an event table whose timestamp column may be parquet
    TIMESTAMP(NANOS) — a physical type Spark's vectorized reader rejects
    outright ([PARQUET_TYPE_ILLEGAL]).  Strategy: read nanos as raw int64
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds
    with *integer* division (``DIV 1000`` — a double division would lose
    precision above 2^53 ns, i.e. for any epoch after 1970).  DuckDB/pyarrow
    truncate ns->us the same way, so results are comparable.
    """
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    field = dict(df.dtypes).get(ts_col)
    if field in ("bigint", "long"):
        df = df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} DIV 1000"))
        )
    return df


def download_monthly_files(base_url: str, dest_dir: str, year: int = 2024,
                           months: range = range(1, 13),
                           file_pattern: str = "yellow_tripdata_{year}-{month:02d}.parquet",
                           overwrite: bool = False) -> list[str]:
    """S6: the out-of-engine monthly file fetcher (reference
    data/downloaddata.py:6-22 — sequential month loop, streamed 8 KiB
    chunks, skip-and-continue on a failed month).  stdlib ``urllib`` only;
    deliberately NOT part of any query path — ingest IO belongs upstream of
    the engine, and at 100 TB bulk transfer is a distcp/object-store copy
    job, not a driver loop.  Returns the local paths actually fetched."""
    import os
    import shutil
    import urllib.error
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    fetched: list[str] = []
    for month in months:
        file_name = file_pattern.format(year=year, month=month)
        save_path = os.path.join(dest_dir, file_name)
        if os.path.exists(save_path) and not overwrite:
            fetched.append(save_path)
            continue
        url = base_url.rstrip("/") + "/" + file_name
        try:
            with urllib.request.urlopen(url) as resp, open(save_path, "wb") as f:
                shutil.copyfileobj(resp, f, length=8192)
        except (urllib.error.URLError, OSError):
            # mirror the reference: a missing month is reported, not fatal
            if os.path.exists(save_path):
                os.remove(save_path)
            continue
        fetched.append(save_path)
    return fetched


def read_csv_seed(spark: SparkSession, path: str) -> DataFrame:
    """S5: the CI seed CSV source (reference
    dbt/nyc_taxi/seeds/mock_yellow_tripdata.csv + dbt_project.yml:38-43).
    Schema is declared, never inferred; ``\\N`` is the NULL sentinel the
    reference's COPY path uses (dags/nyc_taxi_pipeline.py:153-156)."""
    df = (
        spark.read.option("header", True)
        .option("nullValue", "\\N")
        .schema(TRIP_SCHEMA)
        .csv(path)
    )
    return df.select(*[c for c in TRIP_COLUMNS])


def read_parquet_evolving(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution-tolerant parquet scan for a directory of monthly
    drops whose column set changed over time (the reference's data
    provider added/renamed columns across years; a pinned-schema read
    silently drops the new ones, a naive read takes whichever file's
    footer wins).

    ``mergeSchema=true`` unions every file's footer schema: files missing
    a column read NULL for it, so downstream projections see ONE stable
    superset schema regardless of which months the scan prunes down to.
    Merging costs a footer read per file at planning time (not a data
    scan) — at 100 TB with many files, pin the merged schema in the
    catalog after the first read instead of re-merging per query.
    Column-name normalization applies after the merge, same as
    :func:`read_trip_parquet`.
    """
    return normalize_columns(
        spark.read.option("mergeSchema", "true").parquet(path)
    )
