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


def test_fuzzy_match_duplicate_expansion(spark):
    """Exact-duplicate strings collapse to one rep before the variant/pair
    engine and expand back: every member pair of a duplicate group appears
    at dist 0, cross-group pairs fan out the full bipartite product, and
    text_a always belongs to id_a after ordering."""
    rows = [(1, "smith"), (2, "smith"), (3, "smith"),
            (4, "smyth"), (5, "smyth"), (6, "xavier"), (7, None)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]): (r["text_a"], r["text_b"], r["dist"])
           for r in fuzzy_match_pairs(df, "id", "name", 1).collect()}
    dup = {(1, 2), (1, 3), (2, 3)}
    cross = {(1, 4), (1, 5), (2, 4), (2, 5), (3, 4), (3, 5)}
    assert set(got) == dup | cross | {(4, 5)}
    assert all(got[p] == ("smith", "smith", 0) for p in dup)
    assert got[(4, 5)] == ("smyth", "smyth", 0)
    assert all(got[p] == ("smith", "smyth", 1) for p in cross)


def test_fuzzy_match_hot_key_grid_exact(spark):
    """A Zipf-hot variant key (many strings sharing one deletion variant)
    must flow through the grid split and still produce the exact brute
    pair set."""
    # "a0".."a39" all share deletion variant "a" -> one posting list of 40
    names = [f"a{i}" for i in range(40)] + ["smith", "smyth"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(
            df, "id", "name", max_dist=1, skew_threshold=8, grid=4
        ).collect()
    }
    assert got == _brute(names, 1)


def test_fuzzy_match_grid_balances_hot_key(spark):
    """With one pathologically hot variant key, no shuffle partition of the
    grid join may receive more than 2x the mean (non-empty) pair mass —
    the single-reducer straggler the grid split exists to prevent."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.entity import (
        _grid_pair_rows,
        deletion_variants,
    )

    n, grid = 120, 8
    # every name deletes its first character to the shared hot variant
    # "template" -> ONE posting list of n rows, n^2/2 pairs
    names = [chr(1000 + i) + "template" for i in range(n)]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    keyed = df.select(
        F.col("id").alias("__id"), F.col("name").alias("__txt"),
        F.explode(deletion_variants("name", 1)).alias("__variant"),
    ).filter(F.col("__variant") == "template")
    rows = _grid_pair_rows(keyed, grid)
    # balance on the REDUCER KEY (variant, cell): AQE may coalesce the tiny
    # test shuffle into few partitions, but at scale partitions track cells
    per_cell = [
        r["n"] for r in rows.groupBy("__cell")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    mean = sum(per_cell) / len(per_cell)
    assert len(per_cell) >= grid  # the hot key actually fanned out
    assert max(per_cell) <= 2 * mean, (per_cell, mean)
