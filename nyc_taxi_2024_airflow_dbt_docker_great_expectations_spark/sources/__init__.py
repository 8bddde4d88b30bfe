"""Sources & sinks (SURVEY.md section 2.1, S1-S12)."""

from .readers import read_csv_seed, read_trip_parquet, normalize_columns  # noqa: F401
from .sinks import overwrite_table, write_month_partitioned  # noqa: F401
