"""ANSI-session hardening (round-6 verdict #1).

The DRIVER's correctness gate runs a vanilla Spark 4 session — ANSI mode
ON — while the repo session runs ANSI off as a pure PERFORMANCE choice
(checked arithmetic costs 10-150% on hot loops; see session.py).  That
split is only safe if every query is ANSI-NEUTRAL: round 6 shipped one
(`ab_test`) that crashed with DIVIDE_BY_ZERO only under ANSI, so this
module force-flips the conf and runs the known-sensitive queries strict
end-to-end: any plain `/` over a possibly-zero denominator, strict cast,
or array index regression surfaces as a pytest failure instead of a red
driver artifact.  The full-surface strict sweep is
``tools/check_oracle.py --ansi``.

The FULL-surface ANSI sweep is ``tools/check_oracle.py --ansi`` (146/146
green as of round 7); this test keeps the known-sensitive subset in the
default suite.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

# Queries with a guarded-division / strict-cast history plus one
# representative of each expression family the sweep found sensitive.
ANSI_SENSITIVE = [
    "ab_test",            # pooled z denominator == 0 when a side is unanimous
    "mixture_weights",    # integer div allocation
    "payment_summary",    # F13 guarded ratio
    "quality_metrics",    # unexpected-percent over possibly-empty basis
    "cohort_retention",   # int/int rate division
]


@pytest.fixture(scope="module")
def ansi_spark(request):
    # reuse the shared session fixture but flip ANSI at runtime —
    # spark.sql.ansi.enabled is a runtime conf, exactly what the --ansi
    # gate sim (tools/check_oracle.py) does
    spark = request.getfixturevalue("spark")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
@pytest.mark.parametrize("key", ANSI_SENSITIVE)
def test_query_runs_under_ansi(ansi_spark, key):
    import __spark_entry__ as entry

    df = entry.queries()[key](ansi_spark, SF_DIR)
    df.collect()  # crash = regression; values are the oracle gate's job


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_ab_test_zero_denominator_yields_null(ansi_spark):
    """The exact round-6 crash shape: every user on both sides converted
    (pooled rate 1.0, z denominator exactly 0.0) must yield NULL, not
    DIVIDE_BY_ZERO — matching the DuckDB oracle's division semantics."""
    import __spark_entry__ as entry

    rows = entry.queries()["ab_test"](ansi_spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    if r["rate0"] == r["rate1"] and r["rate0"] in (0.0, 1.0):
        assert r["z_score"] is None


def test_lossy_int_coercion_is_ansi_neutral(ansi_spark):
    """S3 coerce semantics (bad value -> NULL) hold under ANSI-on: the
    reader uses try_cast, not the session's cast mode."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.sources.readers import (
        coerce_int_columns,
    )

    df = ansi_spark.createDataFrame(
        [("1",), ("not-a-number",), (None,)], "vendorid string"
    )
    vals = [r["vendorid"]
            for r in coerce_int_columns(df, ["vendorid"]).collect()]
    assert vals == [1, None, None]
