from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.temporal import (
    asof_join,
    interval_count_join,
)

EV = "user_id long, ts string, event_type string, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, EV).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )


def test_asof_join_backward(spark):
    left = _events(spark, [
        (1, "2024-01-01 08:00:00", "purchase", 10.0),
        (1, "2024-01-01 09:00:00", "purchase", 20.0),
        (2, "2024-01-01 08:30:00", "purchase", 30.0),
    ])
    right = _events(spark, [
        (1, "2024-01-01 07:55:00", "error", 1.0),
        (1, "2024-01-01 08:59:59", "error", 2.0),
        (1, "2024-01-01 09:00:00", "error", 3.0),  # ties left @09:00 -> "<=" wins
        (2, "2024-01-01 09:00:00", "error", 4.0),  # after 2's purchase: unused
    ]).select("user_id", "ts", "value")

    out = {(r["user_id"], str(r["ts"])): r for r in asof_join(left, right).collect()}
    assert len(out) == 3
    assert out[(1, "2024-01-01 08:00:00")]["value_asof"] == 1.0
    r = out[(1, "2024-01-01 09:00:00")]
    assert r["value_asof"] == 3.0 and str(r["ts_asof"]) == "2024-01-01 09:00:00"
    r2 = out[(2, "2024-01-01 08:30:00")]
    assert r2["value_asof"] is None and r2["ts_asof"] is None


def test_asof_join_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    lrows = [(u, f"2024-01-01 {h:02d}:{m:02d}:00", "l", float(i))
             for i, (u, h, m) in enumerate(
                 (rng.randint(1, 5), rng.randint(0, 23), rng.randint(0, 59))
                 for _ in range(80))]
    rrows = {(u, f"2024-01-01 {h:02d}:{m:02d}:00"): float(i)
             for i, (u, h, m) in enumerate(
                 (rng.randint(1, 5), rng.randint(0, 23), rng.randint(0, 59))
                 for _ in range(60))}
    left = _events(spark, lrows)
    right = _events(spark, [(u, t, "r", v) for (u, t), v in rrows.items()]) \
        .select("user_id", "ts", "value")

    got = {(r["user_id"], str(r["ts"]), r["value"]): r["value_asof"]
           for r in asof_join(left, right).collect()}
    for (u, t, _et, v) in lrows:
        prior = [(rt, rv) for (ru, rt), rv in rrows.items() if ru == u and rt <= t]
        want = max(prior)[1] if prior else None
        assert got[(u, t, v)] == want


def test_interval_count_join(spark):
    intervals = spark.createDataFrame(
        [(1, 1, "2024-01-01 08:00:00", "2024-01-01 08:10:00"),
         (2, 1, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
         (3, 2, "2024-01-01 08:00:00", "2024-01-01 08:10:00"),
         (4, 2, "2024-01-01 08:05:00", "2024-01-01 08:05:00")],  # empty
        "interval_id long, user_id long, start_ts string, end_ts string",
    ).select("interval_id", "user_id",
             F.col("start_ts").cast("timestamp").alias("start_ts"),
             F.col("end_ts").cast("timestamp").alias("end_ts"))
    events = _events(spark, [
        (1, "2024-01-01 08:00:00", "click", 0.0),   # start inclusive -> iv 1
        (1, "2024-01-01 08:09:59", "click", 0.0),   # iv 1
        (1, "2024-01-01 08:10:00", "click", 0.0),   # end exclusive -> no iv
        (2, "2024-01-01 08:07:00", "click", 0.0),   # iv 3 (not 1: other user)
    ])
    out = {r["interval_id"]: r["n_events"]
           for r in interval_count_join(intervals, events).collect()}
    assert out == {1: 2, 2: 0, 3: 1, 4: 0}


def test_interval_count_join_bucket_boundary(spark):
    # interval spans a bucket boundary; events on both sides must be found
    intervals = spark.createDataFrame(
        [(1, 1, "2024-01-01 08:55:00", "2024-01-01 09:05:00")],
        "interval_id long, user_id long, start_ts string, end_ts string",
    ).select("interval_id", "user_id",
             F.col("start_ts").cast("timestamp").alias("start_ts"),
             F.col("end_ts").cast("timestamp").alias("end_ts"))
    events = _events(spark, [
        (1, "2024-01-01 08:56:00", "click", 0.0),
        (1, "2024-01-01 09:04:00", "click", 0.0),
    ])
    out = interval_count_join(intervals, events, bucket_width_s=600).collect()
    assert out[0]["n_events"] == 2


def test_asof_join_forward_direction(spark):
    """Forward as-of: each left row picks the EARLIEST right row at-or-after
    it; ties at equal ts match (>=); no later right row -> NULLs."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.temporal import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b"), (1, 40, "c")],
        "user_id long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 30, 2.0)], "user_id long, ts long, value double"
    )
    out = {r["tag"]: (r["ts_asof"], r["value_asof"])
           for r in asof_join(left, right, direction="forward").collect()}
    assert out == {
        "a": (10, 1.0),    # equal ts matches forward
        "b": (30, 2.0),    # next right row after 25
        "c": (None, None),  # nothing at-or-after 40
    }


def test_asof_join_tolerance(spark):
    """tolerance_us NULLs matches whose gap exceeds it, both directions."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.temporal import (
        asof_join,
    )
    import datetime as dt

    def t(s):
        return dt.datetime.fromisoformat(s)

    left = spark.createDataFrame(
        [(1, t("2024-01-01 00:00:10")), (1, t("2024-01-01 00:05:00"))],
        "user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t("2024-01-01 00:00:00"), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    out = asof_join(left, right, tolerance_us=60_000_000).collect()
    got = {str(r["ts"]): r["value_asof"] for r in out}
    assert got["2024-01-01 00:00:10"] == 1.0   # 10s gap, inside 60s
    assert got["2024-01-01 00:05:00"] is None  # 5min gap, outside


def test_interval_overlap_join_dedup_and_lengths(spark):
    """Pairs overlapping multiple shared buckets surface exactly once; the
    overlap length is exact; non-overlapping and cross-key pairs drop."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 00:00:00", "2024-01-01 03:00:00"),
         (2, "u", "2024-01-01 05:00:00", "2024-01-01 06:00:00"),
         (3, "v", "2024-01-01 00:00:00", "2024-01-01 03:00:00")],
        "l_id long, user_id string, l_start string, l_end string",
    ).selectExpr("l_id", "user_id", "CAST(l_start AS TIMESTAMP) l_start",
                 "CAST(l_end AS TIMESTAMP) l_end")
    right = spark.createDataFrame(
        [(10, "u", "2024-01-01 01:00:00", "2024-01-01 02:30:00"),  # inside 1
         (11, "u", "2024-01-01 02:30:00", "2024-01-01 07:00:00"),  # 1 and 2
         (12, "u", "2024-01-01 03:00:00", "2024-01-01 04:00:00"),  # abuts 1
         (13, "w", "2024-01-01 01:00:00", "2024-01-01 02:00:00")],  # other key
        "r_id long, user_id string, r_start string, r_end string",
    ).selectExpr("r_id", "user_id", "CAST(r_start AS TIMESTAMP) r_start",
                 "CAST(r_end AS TIMESTAMP) r_end")
    # 30-min buckets: pair (1, 10) shares 3 buckets — must dedup to one row
    out = {(r["l_id"], r["r_id"]): r["overlap_us"]
           for r in interval_overlap_join(left, right,
                                          bucket_width_s=1800,
                                          left_id="l_id",
                                          right_id="r_id").collect()}
    assert out == {
        (1, 10): 90 * 60 * 1_000_000,   # fully inside: 1.5h
        (1, 11): 30 * 60 * 1_000_000,   # tail overlap: 30min
        (2, 11): 60 * 60 * 1_000_000,   # window 2 fully inside 11
    }
    # default width (max interval length) gives the identical pair set
    auto = {(r["l_id"], r["r_id"]): r["overlap_us"]
            for r in interval_overlap_join(left, right, left_id="l_id",
                                           right_id="r_id").collect()}
    assert auto == out
