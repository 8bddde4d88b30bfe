"""Disclosure-control operators (extensions/privacy.py) + truncation
accounting (extensions/text.py:truncation_loss) on hand-checkable
fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.privacy import (
    generalization_ladder,
    k_anonymity_violations,
    l_diversity_violations,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, action string, value double")


def test_k_anonymity_gates_on_users_not_rows(spark):
    # combo A: 6 rows but only 2 distinct users -> MUST be flagged
    # combo B: 3 rows from 3 users -> flagged (n_users < 3)... with k=3
    # combo C: 3 users, 3 rows -> passes at k=3
    rows = (
        [(1, "a", 1.0)] * 3 + [(2, "a", 1.0)] * 3          # A: 2 users
        + [(10, "b", 1.0), (11, "b", 1.0)]                  # B: 2 users
        + [(20, "c", 1.0), (21, "c", 1.0), (22, "c", 1.0)]  # C: 3 users
    )
    out = {r["action"]: r for r in k_anonymity_violations(
        _events(spark, rows), ["action"], "user_id", k=3).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["n_rows"] == 6 and out["a"]["n_users"] == 2
    assert out["b"]["n_rows"] == 2 and out["b"]["n_users"] == 2


def test_l_diversity_flags_uniform_sensitive_groups(spark):
    # group value=1: 3 users, all action 'x' -> 1 sensitive value, flagged
    # group value=2: 3 users, actions x/y -> 2 sensitive values, passes l=2
    rows = [(1, "x", 1.0), (2, "x", 1.0), (3, "x", 1.0),
            (4, "x", 2.0), (5, "y", 2.0), (6, "x", 2.0)]
    df = _events(spark, rows)
    out = l_diversity_violations(
        df, [F.col("value").cast("int").alias("bucket")],
        sensitive_col="action", user_col="user_id", l=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bucket"] == 1 and r["n_sensitive"] == 1 and r["n_users"] == 3


def test_generalization_ladder_flips_at_coarser_width(spark):
    # 4 users spread over values 0..39: width 10 -> 1 user per bucket
    # (not 2-anonymous), width 40 -> all 4 users share bucket 0 (passes)
    rows = [(u, "e", float(u * 10)) for u in range(4)]
    out = {r["width"]: r for r in generalization_ladder(
        _events(spark, rows), cat_col="action", value_col="value",
        user_col="user_id", widths=[10, 40], k=2).collect()}
    assert out[10]["min_group_users"] == 1 and not out[10]["k_anonymous"]
    assert out[40]["min_group_users"] == 4 and out[40]["k_anonymous"]
    assert out[10]["n_groups"] == 4 and out[40]["n_groups"] == 1


def test_truncation_loss_counts_exact_excess(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.text import (
        truncation_loss,
    )

    rows = [
        (1, "one two three four", "s1"),   # 4 tokens, budget 3 -> lost 1
        (2, "one two", "s1"),              # 2 tokens -> lost 0
        (3, "a b c d e f", "s2"),          # 6 tokens -> lost 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in
           truncation_loss(df, budget=3).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert (s1["n_docs"], s1["n_over"], s1["total_tokens"], s1["lost_tokens"]) == (2, 1, 6, 1)
    assert s1["loss_ratio"] == 1.0 / 6.0
    assert (s2["n_over"], s2["lost_tokens"]) == (1, 3)
    assert s2["loss_ratio"] == 0.5
