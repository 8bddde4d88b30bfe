"""Measure the kcenter_select stateless-vs-materialized crossover: warm
best-of-N wall time for each (k, materialize) cell at a given sf dir.
Justifies the ``materialize=None`` default threshold (materialized for
k > 4 — similarity.py:kcenter_select) with a logged measurement instead
of a guess.

Usage: python tools/kcenter_crossover.py [sf_dir] [repeats] [k,k,...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.session import get_spark
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.similarity import (
        kcenter_select,
    )

    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # compile/JIT warm both code paths on a tiny slice
    for mat in (False, True):
        kcenter_select(emb.limit(200), k=3, materialize=mat).collect()

    ks = (tuple(int(x) for x in sys.argv[3].split(","))
          if len(sys.argv) > 3 else (8, 16, 32, 64))
    out: dict[str, float] = {}
    rows = {}
    for k in ks:
        for mat in (False, True):
            best = None
            for _ in range(repeats):
                t0 = time.monotonic()
                res = kcenter_select(emb, k=k, materialize=mat).collect()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            key = f"k{k}_{'mat' if mat else 'stateless'}"
            out[key] = round(best, 2)
            rows[(k, mat)] = [(r["sel_rank"], r["vec_id"]) for r in res]
            print(f"{key}: {best:.2f}s", flush=True)
        assert rows[(k, False)] == rows[(k, True)], f"trajectory split at k={k}"
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "best": out}))
    print("DONE")


if __name__ == "__main__":
    main()
