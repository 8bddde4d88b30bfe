from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.stateful import (
    sessionize_stateful,
)

EVENT_SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _write_events(spark, dirpath, name, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    df.coalesce(1).write.parquet(os.path.join(dirpath, name))


def _run(spark, src, ckpt, sink_dir):
    # parquet sink: the memory sink is not fault-tolerant, so it cannot
    # resume from a checkpoint — and resuming is exactly what's under test
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src + "/*")
    q = (
        sessionize_stateful(stream, gap_minutes=30.0)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(sink_dir).collect()


def test_state_survives_restart(spark, tmp_warehouse):
    src = os.path.join(tmp_warehouse, "drops")
    ckpt = os.path.join(tmp_warehouse, "ckpt")
    os.makedirs(src, exist_ok=True)

    # run 1: u1 has a 2-event session, then (past the gap) a 1-event open
    # session; u2 has only an open session
    _write_events(spark, src, "d1", [
        (1, "2024-01-01 08:00:00", "click", 1.5),
        (1, "2024-01-01 08:10:00", "view", 2.25),
        (1, "2024-01-01 09:30:00", "click", 4.0),
        (2, "2024-01-01 08:00:00", "click", 8.0),
    ])
    sink = os.path.join(tmp_warehouse, "sessions_out")
    out1 = {(r["user_id"], str(r["session_start"])): r for r in _run(spark, src, ckpt, sink)}
    assert len(out1) == 1  # only u1's first session is provably closed
    r = out1[(1, "2024-01-01 08:00:00")]
    assert r["n_events"] == 2 and r["session_value"] == 3.75
    assert str(r["session_end"]) == "2024-01-01 08:10:00"

    # run 2 (same checkpoint): u1 continues the open session within the gap,
    # then a far-future event closes it -> the emitted session SPANS RUNS,
    # proving the open session lived in checkpointed state across restart
    _write_events(spark, src, "d2", [
        (1, "2024-01-01 09:50:00", "view", 0.5),
        (1, "2024-01-01 23:00:00", "click", 9.0),
    ])
    out2 = {(r["user_id"], str(r["session_start"])): r for r in _run(spark, src, ckpt, sink)}
    assert len(out2) == 2  # parquet sink accumulates: run-1 session + new one
    r2 = out2[(1, "2024-01-01 09:30:00")]
    assert r2["n_events"] == 2 and r2["session_value"] == 4.5
    assert str(r2["session_end"]) == "2024-01-01 09:50:00"
    # u2's session is still open: never emitted


def test_late_in_gap_event_extends_not_shrinks(spark, tmp_warehouse):
    """A later micro-batch whose first event PRECEDES the stored last_us
    (out-of-order but within the gap) must merge with min(start)/max(end) —
    the open session's end must not shrink to the late event's timestamp."""
    src = os.path.join(tmp_warehouse, "drops3")
    ckpt = os.path.join(tmp_warehouse, "ckpt3")
    os.makedirs(src, exist_ok=True)
    sink = os.path.join(tmp_warehouse, "out3")

    _write_events(spark, src, "d1", [
        (1, "2024-01-01 09:30:00", "click", 1.0),
        (1, "2024-01-01 09:40:00", "view", 1.0),
    ])
    assert _run(spark, src, ckpt, sink) == []  # session still open

    # batch 2: a late event at 09:35 (before stored last_us=09:40), then a
    # far-future event that closes the session
    _write_events(spark, src, "d2", [
        (1, "2024-01-01 09:35:00", "view", 2.0),
        (1, "2024-01-01 23:00:00", "click", 9.0),
    ])
    out = _run(spark, src, ckpt, sink)
    closed = [r for r in out if str(r["session_start"]) == "2024-01-01 09:30:00"]
    assert len(closed) == 1
    r = closed[0]
    assert str(r["session_end"]) == "2024-01-01 09:40:00"  # NOT 09:35
    assert r["n_events"] == 3
    assert r["session_value"] == 4.0


def test_matches_batch_minus_open_sessions(spark, tmp_warehouse):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.streaming.windows import (
        session_stats_batch,
    )

    src = os.path.join(tmp_warehouse, "drops2")
    ckpt = os.path.join(tmp_warehouse, "ckpt2")
    os.makedirs(src, exist_ok=True)
    rows = []
    for u in range(1, 6):
        for k in range(7):
            # sessions of 2 events (10 min apart), sessions 2h apart
            rows.append((u, f"2024-01-01 {(8 + 2 * (k // 2)):02d}:{10 * (k % 2):02d}:00",
                         "click", round(0.01 * u + k, 2)))
    _write_events(spark, src, "all", rows)
    streamed = {(r["user_id"], str(r["session_start"])): r
                for r in _run(spark, src, ckpt, os.path.join(tmp_warehouse, "out2"))}

    batch_df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    batch = session_stats_batch(batch_df, 30.0).collect()
    last_seq = {}
    for r in batch:
        last_seq[r["user_id"]] = max(last_seq.get(r["user_id"], 0), r["session_seq"])
    expect = {(r["user_id"], str(r["session_start"])): r for r in batch
              if r["session_seq"] != last_seq[r["user_id"]]}

    assert set(streamed) == set(expect)
    for k, r in streamed.items():
        assert r["n_events"] == expect[k]["n_events"]
        assert r["session_value"] == expect[k]["session_value"]
        assert str(r["session_end"]) == str(expect[k]["session_end"])
