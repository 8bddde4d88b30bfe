from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.layout import (
    salted_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    join without shuffling either side (the at-scale co-location payoff)."""
    import shutil

    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bucketed_a", "bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    write_bucketed(a, "bucketed_a", ["id"], num_buckets=4)
    write_bucketed(b, "bucketed_b", ["id"], num_buckets=4)
    ta = spark.table("bucketed_a")
    tb = spark.table("bucketed_b")
    # small inputs would broadcast (also exchange-free, but that proves
    # nothing about bucketing); force the shuffle-family join path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "id")
        assert joined.count() == 1000
        plan = _plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # no Exchange feeds the join: bucketing pre-partitioned both sides
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    """Salting must be semantically invisible: same rows as a plain join,
    including a pathologically hot key."""
    big = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, i) for i in range(5)],
        "k int, payload int",
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "none")],
                                  "k int, name string")
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", salt=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # left join keeps unmatched big rows too
    big2 = big.unionByName(spark.createDataFrame([(9, 0)], "k int, payload int"))
    plain_l = big2.join(small, "k", "left")
    salted_l = salted_join(big2, small, "k", salt=8, how="left")
    assert sorted(map(tuple, salted_l.collect()), key=str) == sorted(
        map(tuple, plain_l.collect()), key=str
    )
