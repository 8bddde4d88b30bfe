from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators import (
    append_if_absent,
    distinct_on,
    max_scalar,
    upsert_by_key,
    watermark_filter,
    watermark_filter_month_reopen,
)


def test_upsert_by_key(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double"
    )
    delta = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double"
    )
    out = {r["k"]: r["v"] for r in upsert_by_key(target, delta, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}  # delta wins on conflict


def test_upsert_by_key_version_gate(spark):
    """With order_col the matched-key winner is the HIGHEST version across
    both sides — a stale delta cannot regress a key; a newer delta and a
    brand-new key still land; unmatched target rows are untouched."""
    import pytest

    target = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 10), (3, "c", 7)], "k int, v string, rev long"
    )
    delta = spark.createDataFrame(
        [(2, "stale", 3),    # lower rev -> target row survives
         (3, "newer", 8),    # higher rev -> delta wins
         (4, "d", 1)],       # new key -> inserted
        "k int, v string, rev long",
    )
    out = {r["k"]: (r["v"], r["rev"])
           for r in upsert_by_key(target, delta, ["k"],
                                  order_col="rev").collect()}
    assert out == {1: ("a", 5), 2: ("b", 10), 3: ("newer", 8), 4: ("d", 1)}
    with pytest.raises(ValueError, match="non-key target column"):
        upsert_by_key(target, delta, ["k"], order_col="k")
    with pytest.raises(ValueError, match="non-key target column"):
        upsert_by_key(target, delta, ["k"], order_col="missing")


def test_upsert_null_key_multiplicity_matches_across_modes(spark):
    """NULL-key delta rows take the SAME path gated and ungated
    (round-12 ADVICE): they are never contested, so EVERY NULL-key delta
    row passes through — the version gate must not collapse them to one
    survivor via groupBy's NULLs-are-one-group semantics."""
    target = spark.createDataFrame(
        [(1, "a", 5), (None, "tnull", 9)], "k int, v string, rev long")
    delta = spark.createDataFrame(
        [(None, "d1", 1), (None, "d2", 2), (1, "A", 7)],
        "k int, v string, rev long")
    ungated = [(r["k"], r["v"]) for r in
               upsert_by_key(target, delta, ["k"]).collect()]
    gated = [(r["k"], r["v"]) for r in
             upsert_by_key(target, delta, ["k"],
                           order_col="rev").collect()]
    # both modes: NULL target row kept, BOTH NULL delta rows appended
    assert sorted(v for k, v in gated if k is None) == \
        ["d1", "d2", "tnull"]
    assert sorted(v for k, v in ungated if k is None) == \
        ["d1", "d2", "tnull"]
    # non-NULL keys follow each mode's own rule (delta-wins vs version)
    assert dict((k, v) for k, v in ungated if k is not None) == {1: "A"}
    assert dict((k, v) for k, v in gated if k is not None) == {1: "A"}


def test_upsert_idempotent(spark):
    """Applying the same delta twice yields the same table (S8/S9/S10 parity)."""
    target = spark.createDataFrame([(1, "a")], "k int, v string")
    delta = spark.createDataFrame([(1, "A"), (2, "b")], "k int, v string")
    once = upsert_by_key(target, delta, ["k"])
    twice = upsert_by_key(once, delta, ["k"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_append_if_absent(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    delta = spark.createDataFrame([(2, "CONFLICT"), (3, "c")], "k int, v string")
    out = {r["k"]: r["v"] for r in append_if_absent(target, delta, ["k"]).collect()}
    assert out == {1: "a", 2: "b", 3: "c"}  # target wins on conflict


def test_distinct_on_total_order(spark):
    df = spark.createDataFrame(
        [(1, 2, "x"), (1, 1, "keep"), (2, 5, "only")], "k int, o int, v string"
    )
    out = {r["k"]: r["v"] for r in distinct_on(df, ["k"], [F.col("o")]).collect()}
    assert out == {1: "keep", 2: "only"}


def test_watermark_filters(spark):
    src = spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-02-01 10:00:00",), ("2024-03-01 10:00:00",)],
        "t string",
    ).select(F.col("t").cast("timestamp").alias("t"))

    # no target -> pass-through (first-run semantics)
    assert watermark_filter(src, None, "t").count() == 3

    tgt = spark.createDataFrame([("2024-02-01 10:00:00",)], "t string").select(
        F.col("t").cast("timestamp").alias("t")
    )
    assert watermark_filter(src, tgt, "t").count() == 1  # strictly greater

    # month-reopen: >= month of the max -> Feb and Mar survive
    tgt2 = tgt.select(F.date_trunc("month", "t").alias("m"))
    out = watermark_filter_month_reopen(src, tgt2, "t", "m")
    assert out.count() == 2

    # empty target -> 1900-01-01 default keeps everything
    empty = spark.createDataFrame([], "m timestamp")
    assert watermark_filter_month_reopen(src, empty, "t", "m").count() == 3


def test_max_scalar_empty(spark):
    empty = spark.createDataFrame([], "x int")
    assert max_scalar(empty, "x") is None


def test_distinct_on_agg_matches_window(spark):
    df = spark.createDataFrame(
        [(1, 2, "x"), (1, 1, "keep"), (2, 5, "only"), (1, 1, "tie")],
        "k int, o int, v string",
    )
    # total order (o, v): both implementations must agree exactly
    order = [F.col("o"), F.col("v")]
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.dedup import (
        distinct_on_agg,
    )
    a = sorted(map(tuple, distinct_on(df, ["k"], order).collect()))
    b = sorted(map(tuple, distinct_on_agg(df, ["k"], order).collect()))
    assert a == b == [(1, 1, "keep"), (2, 5, "only")]


def test_snapshot_diff_statuses(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.merge import (
        snapshot_diff,
    )
    import pytest
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, name string, bal double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0),          # unchanged -> dropped
         (3, "c", None),          # NULL == NULL under <=>: unchanged
         (4, "d", 41.0),          # changed
         (5, "e", 50.0)],         # added
        "k long, name string, bal double",
    )
    got = {r["k"]: r["status"]
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 4: "changed", 5: "added"}
    # column order must not matter: diff against a reordered projection
    got2 = {r["k"]: r["status"]
            for r in snapshot_diff(old.select("bal", "k", "name"),
                                   new, ["k"]).collect()}
    assert got2 == got
    # NULL flipping to a value IS a change
    new3 = new.withColumn(
        "bal", F.when(F.col("k") == 3, 3.0).otherwise(F.col("bal")))
    assert {r["k"]: r["status"]
            for r in snapshot_diff(old, new3, ["k"]).collect()}[3] == "changed"
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    # schema drift (column added/dropped between snapshots) must refuse
    # loudly — a row differing only in the asymmetric column would
    # otherwise silently report as unchanged
    with pytest.raises(ValueError, match="asymmetric.*extra"):
        snapshot_diff(old, new.withColumn("extra", F.lit(1)), ["k"])
    with pytest.raises(ValueError, match="asymmetric.*bal"):
        snapshot_diff(old.drop("bal"), new, ["k"])
