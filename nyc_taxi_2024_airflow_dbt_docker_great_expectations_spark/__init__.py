"""PySpark-native analytics engine with the query/data-processing surface of
``Jaamaldeen/NYC-TAXI-2024-AIRFLOW-DBT-DOCKER-GREAT-EXPECTATIONS``.

The reference is a medallion (staging -> bronze -> silver -> gold) ELT pipeline
where Airflow orchestrates, dbt compiles Jinja to SQL, and Postgres executes.
This engine re-expresses every operator of that pipeline Spark-first
(DataFrame / Catalyst / Structured Streaming) -- see SURVEY.md section 2 for
the operator-by-operator contract -- and adds large-scale training-data
operators (dedup, similarity search, text analysis, multimodal columns) under
``extensions/``.

Layout
------
- ``session``    SparkSession factory (UTC, ANSI off for cast parity, AQE on)
- ``schema``     canonical StructTypes (trip table, run ledger)
- ``catalog``    namespace/table naming (replaces dbt generate_schema_name)
- ``sources``    readers & sinks (parquet / csv scans, partitioned writes)
- ``operators``  generic relational primitives (merge, dedup, watermarks)
- ``functions``  scalar-function library (decode maps, datetime, money, keys)
- ``plans``      the bronze/silver/gold model DAG (trip-schema parity)
- ``quality``    dbt-test + Great-Expectations-style validation
- ``pipeline``   run ledger, retries, alerting, orchestration runner
- ``streaming``  Structured Streaming incremental loads & event windows
- ``extensions`` dedup/similarity/text/multimodal at-scale operators
"""

from __future__ import annotations

__version__ = "0.1.0"
