"""SCD Type-2 operators (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.scd import (
    scd2_apply,
    scd2_from_changelog,
)


def d(s):
    return dt.date.fromisoformat(s)


CHANGELOG_SCHEMA = "k long, ts date, status string, tier string"


def test_scd2_from_changelog_collapses_runs(spark):
    df = spark.createDataFrame([
        (1, d("2024-01-01"), "open", "basic"),
        (1, d("2024-01-05"), "open", "basic"),      # unchanged: same island
        (1, d("2024-02-01"), "open", "gold"),       # tier change: v2
        (1, d("2024-03-01"), "closed", "gold"),     # status change: v3
        (2, d("2024-01-10"), "open", "basic"),      # single-version key
    ], CHANGELOG_SCHEMA)
    out = scd2_from_changelog(
        df, key_cols=["k"], order_cols=["ts"],
        tracked_cols=["status", "tier"],
    )
    rows = sorted(
        ((r["k"], r["version"], r["status"], r["tier"],
          str(r["valid_from"]), str(r["valid_to"]))
         for r in out.collect())
    )
    assert rows == [
        (1, 1, "open", "basic", "2024-01-01", "2024-02-01"),
        (1, 2, "open", "gold", "2024-02-01", "2024-03-01"),
        (1, 3, "closed", "gold", "2024-03-01", "None"),
        (2, 1, "open", "basic", "2024-01-10", "None"),
    ]


def test_scd2_from_changelog_null_transitions(spark):
    # NULL -> value and value -> NULL are changes (null-safe comparison)
    df = spark.createDataFrame([
        (1, d("2024-01-01"), None, "basic"),
        (1, d("2024-01-02"), "open", "basic"),
        (1, d("2024-01-03"), None, "basic"),
    ], CHANGELOG_SCHEMA)
    out = scd2_from_changelog(df, ["k"], ["ts"], ["status"])
    assert sorted(r["version"] for r in out.collect()) == [1, 2, 3]


def test_scd2_apply_closes_and_opens(spark):
    base = spark.createDataFrame([
        (1, d("2024-01-01"), "open", "basic"),
        (2, d("2024-01-01"), "open", "basic"),
    ], CHANGELOG_SCHEMA)
    dim = scd2_from_changelog(base, ["k"], ["ts"], ["status", "tier"])
    updates = spark.createDataFrame([
        (1, d("2024-02-01"), "open", "gold"),   # changed: close v1, open v2
        (2, d("2024-02-01"), "open", "basic"),  # unchanged: no-op
        (3, d("2024-02-01"), "open", "basic"),  # brand-new key
    ], CHANGELOG_SCHEMA)
    out = scd2_apply(dim, updates, key_cols=["k"],
                     tracked_cols=["status", "tier"], ts_col="ts")
    rows = sorted(
        ((r["k"], r["version"], r["tier"],
          str(r["valid_from"]), str(r["valid_to"]))
         for r in out.collect())
    )
    assert rows == [
        (1, 1, "basic", "2024-01-01", "2024-02-01"),   # closed
        (1, 2, "gold", "2024-02-01", "None"),          # new open version
        (2, 1, "basic", "2024-01-01", "None"),         # untouched
        (3, 1, "basic", "2024-02-01", "None"),         # fresh key
    ]
    # applying the same batch again is a fixpoint (idempotent merge)
    again = scd2_apply(out, updates, ["k"], ["status", "tier"], "ts")
    assert again.count() == out.count()


def test_scd2_apply_reopens_fully_closed_key(spark):
    """A key whose history is all closed (hard-delete) must not swallow an
    update: a new open version appends, continuing the version sequence."""
    dim = spark.createDataFrame(
        [(1, "open", "basic", d("2024-01-01"), d("2024-03-01"), 1),
         (1, "closed", "basic", d("2024-03-01"), d("2024-04-01"), 2)],
        "k long, status string, tier string, valid_from date, "
        "valid_to date, version int",
    )
    updates = spark.createDataFrame(
        [(1, d("2024-05-01"), "open", "gold")], CHANGELOG_SCHEMA)
    out = scd2_apply(dim, updates, ["k"], ["status", "tier"], "ts")
    rows = sorted(
        ((r["k"], r["version"], r["status"], r["tier"],
          str(r["valid_from"]), str(r["valid_to"]))
         for r in out.collect())
    )
    assert rows == [
        (1, 1, "open", "basic", "2024-01-01", "2024-03-01"),
        (1, 2, "closed", "basic", "2024-03-01", "2024-04-01"),
        (1, 3, "open", "gold", "2024-05-01", "None"),   # re-opened, v3
    ]


def test_scd2_from_changelog_null_order_col_mid_stream(spark):
    """A NULL in order_cols[0] mid-stream must not fabricate an island for
    the row sorted after it (first-row detection is positional)."""
    df = spark.createDataFrame([
        (1, None, "open", "basic"),            # sorts first (NULLS FIRST)
        (1, d("2024-01-02"), "open", "basic"),  # unchanged: same island
        (1, d("2024-01-03"), "open", "gold"),   # real change: v2
    ], CHANGELOG_SCHEMA)
    out = scd2_from_changelog(df, ["k"], ["ts"], ["status", "tier"])
    assert sorted(r["version"] for r in out.collect()) == [1, 2]


def test_scd2_apply_matches_full_rebuild(spark):
    """Incremental apply == rebuilding from the concatenated changelog."""
    log1 = [(k, d("2024-01-01"), "open", "basic") for k in range(10)]
    log2 = [(k, d("2024-02-01"), "open", "gold" if k % 2 else "basic")
            for k in range(10)]
    dim = scd2_from_changelog(
        spark.createDataFrame(log1, CHANGELOG_SCHEMA),
        ["k"], ["ts"], ["status", "tier"],
    )
    applied = scd2_apply(
        dim, spark.createDataFrame(log2, CHANGELOG_SCHEMA),
        ["k"], ["status", "tier"], "ts",
    )
    rebuilt = scd2_from_changelog(
        spark.createDataFrame(log1 + log2, CHANGELOG_SCHEMA),
        ["k"], ["ts"], ["status", "tier"],
    )
    key = lambda r: (r["k"], r["version"])  # noqa: E731
    a = sorted(((r["k"], r["version"], r["status"], r["tier"],
                 str(r["valid_from"]), str(r["valid_to"]))
                for r in applied.collect()))
    b = sorted(((r["k"], r["version"], r["status"], r["tier"],
                 str(r["valid_from"]), str(r["valid_to"]))
                for r in rebuilt.collect()))
    assert a == b


def test_scd2_close_absent_hard_deletes(spark):
    """Keys missing from a full snapshot get their open version closed
    (dbt invalidate_hard_deletes); present keys and closed history pass
    through, and re-applying the same snapshot is a no-op."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.scd import (
        scd2_close_absent,
    )

    dim = spark.createDataFrame(
        [(1, "open", "basic", d("2024-01-01"), None, 1),
         (2, "open", "basic", d("2024-01-01"), None, 1),
         (3, "open", "gold", d("2024-01-01"), d("2024-02-01"), 1)],
        "k long, status string, tier string, valid_from date, "
        "valid_to date, version int",
    )
    snap = spark.createDataFrame([(1,)], "k long")  # 2 deleted; 3 already closed
    out = scd2_close_absent(dim, snap, ["k"], d("2024-03-01"))
    got = {(r["k"], r["version"]): str(r["valid_to"]) for r in out.collect()}
    assert got == {
        (1, 1): "None",          # present: stays open
        (2, 1): "2024-03-01",    # hard-deleted: closed at snapshot time
        (3, 1): "2024-02-01",    # closed history untouched
    }
    again = scd2_close_absent(out, snap, ["k"], d("2024-04-01"))
    got2 = {(r["k"], r["version"]): str(r["valid_to"]) for r in again.collect()}
    assert got2 == got  # idempotent


def test_scd2_close_then_reopen_roundtrip(spark):
    """Hard-delete close followed by the key reappearing in an update batch
    must produce a new open version (the advisor's round-2 scenario)."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.scd import (
        scd2_close_absent,
    )

    base = spark.createDataFrame(
        [(1, d("2024-01-01"), "open", "basic")], CHANGELOG_SCHEMA)
    dim = scd2_from_changelog(base, ["k"], ["ts"], ["status", "tier"])
    closed = scd2_close_absent(
        dim, spark.createDataFrame([], "k long"), ["k"], d("2024-02-01"))
    reopened = scd2_apply(
        closed,
        spark.createDataFrame([(1, d("2024-03-01"), "open", "gold")],
                              CHANGELOG_SCHEMA),
        ["k"], ["status", "tier"], "ts",
    )
    rows = sorted((r["k"], r["version"], r["tier"], str(r["valid_to"]))
                  for r in reopened.collect())
    assert rows == [(1, 1, "basic", "2024-02-01"),
                    (1, 2, "gold", "None")]


def test_scd2_close_absent_column_order_and_marker_collision(spark):
    """Regression pins for the round-10 left-join rewrite: (a) output
    column ORDER equals the dim's even when the key is not the leading
    column (the USING join moves key cols first; select(*dim.columns)
    must restore), (b) a dim that legitimately carries the
    __scd2_present marker name is not clobbered — the join marker
    derives a collision-free name."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.scd import (
        scd2_close_absent,
    )

    # key 'k' deliberately NOT the first column
    dim = spark.createDataFrame(
        [("open", 1, None, 7), ("open", 2, None, 9)],
        "status string, k long, valid_to date, __scd2_present int",
    )
    snap = spark.createDataFrame([(1,)], "k long")
    out = scd2_close_absent(dim, snap, ["k"], d("2024-03-01"))
    assert out.columns == ["status", "k", "valid_to", "__scd2_present"]
    got = {r["k"]: (str(r["valid_to"]), r["__scd2_present"])
           for r in out.collect()}
    # key 2 closed; the caller's __scd2_present payload column survives
    # with its original values on BOTH rows
    assert got == {1: ("None", 7), 2: ("2024-03-01", 9)}
