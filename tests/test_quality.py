from __future__ import annotations

import pytest

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.plans import (
    bronze_trips,
    silver_trips,
)
from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.quality import (
    BRONZE_SUITE,
    SILVER_SUITE,
    ValidationError,
    accepted_values_failures,
    expect_column_values_to_be_between,
    expect_column_values_to_be_in_set,
    expect_column_values_to_not_be_null,
    expect_table_row_count_to_be_between,
    no_negative_total_failures,
    not_null_failures,
    relationship_failures,
    run_suite,
    unique_failures,
)


def test_mostly_threshold_pass_and_fail(spark):
    # 1 NULL in 100 rows -> 1% unexpected; mostly=0.99 passes, mostly=0.995 fails
    df = spark.createDataFrame([(None if i == 0 else i,) for i in range(100)], "x int")
    ok = run_suite(df, [expect_column_values_to_not_be_null("x", mostly=0.99)])
    assert ok[0].success and abs(ok[0].unexpected_percent - 1.0) < 1e-9

    with pytest.raises(ValidationError) as err:
        run_suite(df, [expect_column_values_to_not_be_null("x", mostly=0.995)], "t")
    assert "unexpected" in str(err.value)


def test_between_and_inset_ignore_nulls(spark):
    """GX semantics: Between/InSet evaluate non-null values only."""
    df = spark.createDataFrame([(None,), (5,), (-1,)], "x int")
    r_between = run_suite(
        df, [expect_column_values_to_be_between("x", min_value=0, mostly=0.5)],
        raise_on_failure=False,
    )[0]
    assert r_between.element_count == 2          # NULL not in the basis
    assert r_between.unexpected_count == 1       # only -1 violates
    assert r_between.success                     # 50% <= 1-0.5

    r_inset = run_suite(
        df, [expect_column_values_to_be_in_set("x", (5,), mostly=0.5)],
        raise_on_failure=False,
    )[0]
    assert r_inset.element_count == 2 and r_inset.unexpected_count == 1


def test_row_count_and_column_exists(spark, trips):
    # 1/16 NULL pickups = 6.25% > the 1% the mostly=0.99 gate tolerates (G3)
    results = run_suite(trips, BRONZE_SUITE, raise_on_failure=False)
    failed = [r for r in results if not r.success]
    assert len(failed) == 1
    assert failed[0].expectation.column == "tpep_pickup_datetime"
    assert abs(failed[0].unexpected_percent - 6.25) < 1e-9

    # dilute the fixture so the null fraction drops below 1% -> suite passes
    valid = trips.filter("tpep_pickup_datetime is not null")
    big = trips
    for _ in range(6):
        big = big.unionByName(valid)  # 16 + 6*15 = 106 rows, 1 null < 1%
    assert all(r.success for r in run_suite(big, BRONZE_SUITE))

    empty = spark.createDataFrame([], trips.schema)
    with pytest.raises(ValidationError):
        run_suite(empty, [expect_table_row_count_to_be_between(min_value=1)], "empty")


def test_silver_suite_on_fixture(spark, trips):
    silver = silver_trips(bronze_trips(trips)).cache()
    # the fixture's NULL-vendorid / NULL-pickup rows violate the mostly=1.0
    # gates (G4) — the suite must catch exactly those two
    results = run_suite(silver, SILVER_SUITE, raise_on_failure=False)
    failed = {r.expectation.column for r in results if not r.success}
    assert failed == {"vendorid", "tpep_pickup_datetime"}

    clean = silver.filter("vendorid is not null and tpep_pickup_datetime is not null")
    assert all(r.success for r in run_suite(clean, SILVER_SUITE))


def test_dbt_tests(spark, trips):
    silver = silver_trips(bronze_trips(trips)).cache()

    assert not_null_failures(silver, "unique_trip_id").count() == 0       # Q1
    assert unique_failures(silver, "unique_trip_id").count() == 0         # Q2
    assert accepted_values_failures(                                      # Q3
        silver, "payment_type", [0, 1, 2, 3, 4, 5, 6]
    ).count() == 0
    assert no_negative_total_failures(silver).count() == 0                # Q5

    # Q4 relationships: silver.vendorid present in bronze.vendorid
    bronze = bronze_trips(trips)
    assert relationship_failures(silver, "vendorid", bronze, "vendorid").count() == 0

    # and a failing case: a child key with no parent
    child = spark.createDataFrame([(1,), (99,)], "k int")
    parent = spark.createDataFrame([(1,)], "k int")
    fails = relationship_failures(child, "k", parent, "k").collect()
    assert [r["k"] for r in fails] == [99]


def test_accepted_values_ignores_nulls(spark):
    df = spark.createDataFrame([(None,), (1,), (9,)], "x int")
    fails = accepted_values_failures(df, "x", [1, 2]).collect()
    assert [r["x"] for r in fails] == [9]


def test_single_pass_plan(spark, trips):
    """The suite evaluation should be one aggregate over the input — verify
    no joins/extra scans appear in the plan."""
    suite = [
        expect_column_values_to_not_be_null("vendorid"),
        expect_column_values_to_be_between("fare_amount", 0, mostly=0.9),
        expect_column_values_to_be_in_set("payment_type", (1, 2, 3, 4, 5, 6), mostly=0.5),
    ]
    # does not raise; exercises the combined agg path on a real DataFrame
    results = run_suite(trips, suite, raise_on_failure=False)
    assert len(results) == 3


def test_profile_numeric(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.quality.profile import (
        profile_numeric,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 10.0), (4, 30.0)], "k long, v double"
    )
    out = {r["col_name"]: r for r in profile_numeric(df, ["k", "v"]).collect()}
    assert out["k"]["n_nonnull"] == 4 and out["k"]["n_null"] == 0
    assert out["k"]["n_distinct"] == 4
    assert out["k"]["min_value"] == 1.0 and out["k"]["max_value"] == 4.0
    assert out["v"]["n_nonnull"] == 3 and out["v"]["n_null"] == 1
    assert out["v"]["n_distinct"] == 2
    assert out["v"]["min_value"] == 10.0 and out["v"]["max_value"] == 30.0


def test_exact_zscore_outliers(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.quality.profile import (
        exact_zscore_outliers,
    )
    # group "a": tight cluster + one wild point (the cluster must be
    # large enough that the wild point does not mask itself by inflating
    # the variance: one point among n flags iff dev^2 > k^2 * var, which
    # needs n >> k^2); group "b": uniform, none
    rows = [("a", 10.0 + (i % 5) * 0.05) for i in range(30)]
    rows += [("a", 1000.0)]
    rows += [("b", float(v)) for v in range(10)]
    rows += [("b", None)]  # NULL values are excluded, not counted
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["k"]: (r["n"], r["n_outliers"])
           for r in exact_zscore_outliers(df, "k", "v", k=3).collect()}
    assert out["a"] == (31, 1)  # only the 1000.0 point flags
    assert out["b"] == (10, 0)  # uniform data has no 3-sigma points


def test_exact_zscore_outliers_fractional_k(spark):
    """Fractional k is honored exactly (k=2.5 tests against 6.25 sigma^2,
    not a truncated 6): a point between 2.44 and 2.5 sigma flags at k=2.44
    but not at k=2.5."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.quality.profile import (
        exact_zscore_outliers,
    )
    # 100 points at +-1 plus one at 2.56.  Including the extra point in the
    # group moments: mean = 2.56/101, var = (100 + 2.56^2)/101 - mean^2, so
    # the point sits at z ~ 2.4685 sigma — above 2.44, below 2.5.  The old
    # int(k*k) truncation would test k=2.5 against 6 (z > 2.449) and
    # wrongly flag it.
    base = [-1.0, 1.0] * 50
    rows = [("g", x) for x in base] + [("g", 2.56)]
    df = spark.createDataFrame(rows, "k string, v double")
    n_at = {}
    for kk in (2.44, 2.5):
        out = {r["k"]: r["n_outliers"]
               for r in exact_zscore_outliers(df, "k", "v", k=kk).collect()}
        n_at[kk] = out["g"]
    assert n_at[2.44] == 1 and n_at[2.5] == 0


def test_equal_width_histogram(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.quality.profile import (
        equal_width_histogram,
    )
    df = spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [(None,)],
        "v double",
    )
    out = {r["bucket"]: (r["lo"], r["hi"], r["n"])
           for r in equal_width_histogram(df, "v", n_bins=5).collect()}
    # width 2: buckets [0,2) [2,4) [4,6) [6,8) [8,10]; max folds into last
    assert {b: n for b, (_, _, n) in out.items()} == {0: 2, 1: 2, 2: 2, 3: 2, 4: 3}
    assert out[0][0] == 0.0 and out[4][1] == 10.0
    # degenerate: all-equal column lands in bucket 0
    one = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    got = equal_width_histogram(one, "v", n_bins=4).collect()
    assert len(got) == 1 and got[0]["bucket"] == 0 and got[0]["n"] == 2
