"""Fuzzy entity matching (extensions/entity.py)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.entity import (
    deletion_variants,
    fuzzy_match_pairs,
)


def test_deletion_variants_d1(spark):
    out = spark.range(1).select(
        deletion_variants(F.lit("abc"), 1).alias("v")
    ).first()["v"]
    assert sorted(out) == ["ab", "abc", "ac", "bc"]


def _brute(names, d):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]
    return {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if lev(a, b) <= d
    }


def test_fuzzy_match_exact_vs_bruteforce(spark):
    names = [
        "smith", "smyth", "smithe", "smit", "jones", "joness", "jonez",
        "brown", "braun", "brwn", "xavier", "", "a", "b", "ab",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_match_pairs(df, "id", "name", max_dist=d).collect()
        }
        assert got == _brute(names, d), f"d={d}"


def test_fuzzy_match_reports_distance(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "kittes"), (3, "kitten")],
        "id long, name string",
    )
    rows = {(r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_match_pairs(df, "id", "name", 1).collect()}
    assert rows == {(1, 2): 1, (1, 3): 0, (2, 3): 1}
