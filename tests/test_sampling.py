from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.sampling import (
    hash_fraction_sample,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("lang"), (F.col("id") % 4).cast("string")).alias("lang"),
    )


def test_stratified_sample_counts_and_determinism(spark):
    df = _docs(spark)
    s1 = stratified_sample(df, "lang", 25).collect()
    s2 = stratified_sample(df, "lang", 25).collect()
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)
    by_lang = {}
    for r in s1:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + 1
    assert by_lang == {f"lang{i}": 25 for i in range(4)}
    # small stratum: take-all, never pad
    tiny = stratified_sample(df.filter(F.col("doc_id") < 10), "lang", 25)
    assert tiny.count() == 10


def test_hash_fraction_sample(spark):
    df = _docs(spark, 4000)
    kept = hash_fraction_sample(df, 0.25, salt="a:")
    n = kept.count()
    assert 800 < n < 1200  # ~1000 expected, binomial-loose bounds
    # determinism + subset
    assert kept.count() == n
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # independent draw under a different salt: overlap ~ n * 0.25, not ~n
    ids_b = {r["doc_id"] for r in
             hash_fraction_sample(df, 0.25, salt="b:").select("doc_id").collect()}
    overlap = len(ids & ids_b)
    assert overlap < 0.6 * len(ids)
    # edge fractions
    assert hash_fraction_sample(df, 0.0).count() == 0
    assert hash_fraction_sample(df, 1.0).count() >= 3999

def test_mixture_sample_budget_semantics(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.sampling import (
        mixture_sample,
    )

    rows = [(i, "a" if i < 20 else "b", 10) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, nt long")
    out = mixture_sample(df, {"a": 35, "b": 1000}, token_col="nt").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # budget 35 at 10 tokens/doc: docs with cum_before < 35 -> 4 docs kept
    # (the 4th crosses the boundary and is included)
    assert len(by_src["a"]) == 4
    assert max(r["cum_tokens"] for r in by_src["a"]) == 40
    # budget larger than the stratum keeps everything
    assert len(by_src["b"]) == 20
    # sources without a budget contribute nothing
    out2 = mixture_sample(df, {"a": 35}, token_col="nt")
    assert out2.filter(out2.source == "b").count() == 0
    # deterministic: same draw on re-run
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"]
        for r in mixture_sample(df, {"a": 35, "b": 1000},
                                token_col="nt").collect()
    )
