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


def test_temporal_split_boundaries_and_embargo(spark):
    """Split boundaries are >= cuts anchored at max(ts): the last
    test_days are test, the embargo_days before them are embargo, the
    rest train; NULL timestamps are excluded; absent splits are absent."""
    from datetime import datetime

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.sampling import (
        temporal_split,
    )
    import pytest

    def t(d, h=0):
        return datetime(2024, 1, d, h)

    rows = [
        (1, t(1)),       # train (far past)
        (2, t(21, 23)),  # train (just before the embargo cut)
        (3, t(22)),      # embargo start boundary (>= max-8d)
        (4, t(22, 23)),  # embargo
        (5, t(23)),      # test start boundary (>= max-7d)
        (6, t(30)),      # test anchor (max ts)
        (1, t(29)),      # user 1 also in test: time split allows overlap
        (7, None),       # NULL ts: excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["split"]: r for r in
           temporal_split(df, "ts", "user_id",
                          test_days=7, embargo_days=1).collect()}
    assert set(out) == {"train", "embargo", "test"}
    assert (out["train"]["n_events"], out["train"]["n_users"]) == (2, 2)
    assert (out["embargo"]["n_events"], out["embargo"]["n_users"]) == (2, 2)
    assert (out["test"]["n_events"], out["test"]["n_users"]) == (3, 3)
    assert out["test"]["min_ts"] == t(23) and out["test"]["max_ts"] == t(30)
    assert out["embargo"]["min_ts"] == t(22)
    # no embargo -> the embargo split vanishes, rows fall to train
    out0 = {r["split"]: r["n_events"] for r in
            temporal_split(df, "ts", "user_id",
                           test_days=7, embargo_days=0).collect()}
    assert out0 == {"train": 4, "test": 3}
    with pytest.raises(ValueError):
        temporal_split(df, "ts", "user_id", test_days=0)
