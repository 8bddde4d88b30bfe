"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query executes end-to-end into a ``noop`` sink (full materialization,
no driver collect bottleneck, no disk write skew) — the number measured is
the number a cluster job would scale from.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so timings measure query execution
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_headline_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
