"""Cohort retention (extensions/analytics.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
    cohort_retention,
)


def test_cohort_retention_matrix(spark):
    rows = [
        # cohort 01-01: users 1,2 — both active day 0; only 1 returns day 1
        (1, "2024-01-01 09:00:00"), (2, "2024-01-01 10:00:00"),
        (1, "2024-01-02 09:00:00"),
        (1, "2024-01-02 18:00:00"),      # same user+day: one activity
        # cohort 01-03: user 3 — active day 0 and day 2
        (3, "2024-01-03 09:00:00"), (3, "2024-01-05 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (str(r["cohort_day"]), r["day_offset"]):
            (r["cohort_size"], r["n_active"], r["retention_rate"])
        for r in cohort_retention(df).collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (2, 1, 0.5),
        ("2024-01-03", 0): (1, 1, 1.0),
        ("2024-01-03", 2): (1, 1, 1.0),
    }


def test_groupwise_ols_recovers_known_line(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        groupwise_ols,
    )

    # group a: exact line y = 2x + 1; group b: constant x (degenerate)
    rows = [("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
            ("b", 4.0, 1.0), ("b", 4.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in
           groupwise_ols(df, ["g"], "x", "y").collect()}
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 1.0
    assert out["a"]["n"] == 3
    assert out["b"]["slope"] is None and out["b"]["intercept"] is None


def test_groupwise_corr_known_values(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        groupwise_corr,
    )
    rows = (
        [("lin", float(x), float(2 * x + 1)) for x in range(1, 6)]      # r=1
        + [("anti", float(x), float(-x)) for x in range(1, 6)]          # r=-1
        + [("flat", float(x), 7.0) for x in range(1, 6)]                # r undefined
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in groupwise_corr(df, ["g"], "x", "y").collect()}
    assert out["lin"]["corr"] == pytest.approx(1.0)
    assert out["anti"]["corr"] == pytest.approx(-1.0)
    assert out["flat"]["corr"] is None  # zero variance -> NULL, not NaN
    assert out["lin"]["n"] == 5


def test_linear_probe_matches_numpy_lstsq(spark):
    """The Cramer-rule closed form must agree with numpy's least-squares
    solve on a well-conditioned design, and scoring must separate the
    classes it was fit on."""
    import numpy as np

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        linear_probe,
    )
    from pyspark.sql import functions as F

    rng = [(i, 1 if i % 3 == 0 else 0,
            10 + (i * 7) % 13, 50 + (i * 5) % 31, 3 + (i * 11) % 7)
           for i in range(60)]
    df = spark.createDataFrame(
        rng, "id long, y long, x1 long, x2 long, x3 long"
    )
    out = linear_probe(df, "id", F.col("y"),
                       [F.col("x1"), F.col("x2"), F.col("x3")]).collect()
    assert len(out) == 60 and all(r["label"] in (0, 1) for r in out)

    x = np.array([[1.0, r[2], r[3], r[4]] for r in rng])
    y = np.array([float(r[1]) for r in rng])
    w, *_ = np.linalg.lstsq(x, y, rcond=None)
    want = {r[0]: float(x[i] @ w) for i, r in enumerate(rng)}
    got = {r["id"]: r["score"] for r in out}
    for i in want:
        assert abs(got[i] - want[i]) < 1e-8, (i, got[i], want[i])


def test_token_drift_chisq_zero_for_identical_distribution(spark):
    """Two sources with identical token distributions score chi-square
    exactly 0; a divergent source scores positive."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        token_drift_chisq,
    )

    same = "alpha beta gamma delta"
    rows = ([(i, "a", same) for i in range(10)]
            + [(100 + i, "b", same) for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # top_k larger than the vocabulary: empty trailing ranks contribute
    # exactly 0 (not a poisoning 0/0 NaN)
    got = {r["source"]: (r["sn"], r["chisq"])
           for r in token_drift_chisq(df, top_k=6).collect()}
    assert got["a"][0] == 40 and got["b"][0] == 80
    assert got["a"][1] == 0.0 and got["b"][1] == 0.0

    # a source diverging from the corpus mix scores far above conformers
    rows2 = rows + [(200 + i, "c", "omega omega omega omega")
                    for i in range(5)]
    df2 = spark.createDataFrame(rows2,
                                "doc_id long, source string, text string")
    got2 = {r["source"]: r["chisq"]
            for r in token_drift_chisq(df2, top_k=5).collect()}
    # (conformers' chisq scales with their mass — b carries 2x a's
    # tokens — but the divergent feed dominates both)
    assert got2["c"] > 5 * max(got2["a"], got2["b"]) > 0.0


def test_groupwise_percentile_cont_null_values(spark):
    """Round-7 regression class, locked (VERDICT r7 nit 2): NULL val_col
    rows must be excluded BEFORE ranking — counted in neither n_items nor
    the row_number order (Spark windows sort NULLS FIRST, DuckDB ROW_NUMBER
    NULLS LAST, so a NULL that survives to the window makes the quantile
    engine-dependent).  Fixture plants NULLs mid-group plus one all-NULL
    group; expectations are hand-computed ANSI PERCENTILE_CONT and
    cross-checked against DuckDB on the same rows."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        groupwise_percentile_cont,
    )

    rows = [
        ("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 10.0),
        ("b", None), ("b", None), ("b", 5.0),   # single non-null value
        ("c", None), ("c", None),               # all-NULL group: no output row
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    q = {"p25": 0.25, "median": 0.5, "p75": 0.75}
    got = {r["g"]: r for r in
           groupwise_percentile_cont(df, "g", "v", q).collect()}

    # group a: non-null [1,2,3,10], n=4; pos = q*(n-1)
    assert got["a"]["n_items"] == 4
    assert got["a"]["p25"] == 1.75     # pos 0.75 -> 1 + (2-1)*0.75
    assert got["a"]["median"] == 2.5   # pos 1.5  -> 2 + (3-2)*0.5
    assert got["a"]["p75"] == 4.75     # pos 2.25 -> 3 + (10-3)*0.25
    # group b: one non-null value — every quantile is that value
    assert got["b"]["n_items"] == 1
    assert (got["b"]["p25"], got["b"]["median"], got["b"]["p75"]) == (5.0, 5.0, 5.0)
    # group c: nothing to rank -> no row (PERCENTILE_CONT over empty set)
    assert "c" not in got

    # engine == oracle on the identical rows (the driver-gate shape)
    import duckdb
    oracle = {
        g: (n, p25, med, p75)
        for g, n, p25, med, p75 in duckdb.sql(
            """
            SELECT g, COUNT(v) AS n_items,
                   PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY v),
                   PERCENTILE_CONT(0.5)  WITHIN GROUP (ORDER BY v),
                   PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY v)
            FROM (SELECT g, CAST(v AS DOUBLE) AS v  -- VALUES infers DECIMAL
                  FROM (VALUES ('a',1.0),('a',NULL),('a',2.0),('a',3.0),
                               ('a',10.0),('b',NULL),('b',NULL),('b',5.0),
                               ('c',NULL),('c',NULL)) t(g, v)) t
            GROUP BY g HAVING COUNT(v) > 0
            """
        ).fetchall()
    }
    assert set(oracle) == set(got)
    for g, (n, p25, med, p75) in oracle.items():
        assert got[g]["n_items"] == n
        assert (got[g]["p25"], got[g]["median"], got[g]["p75"]) == (p25, med, p75)


def test_interval_concurrency_sweep_line(spark):
    """Known overlap pattern, inclusive endpoints, invalid rows dropped,
    step-function output (delta days only — day 5 is covered at count 1
    but emits no row; the day-4 row's count holds until day 6), and the
    day after the last close appears with count 0."""
    from datetime import date

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        interval_concurrency,
    )

    d = lambda n: date(2024, 1, n)  # noqa: E731
    rows = [
        (d(1), d(3)),    # covers 1,2,3
        (d(2), d(2)),    # covers 2
        (d(3), d(5)),    # covers 3,4,5
        (d(9), d(1)),    # end < start: dropped
        (None, d(4)),    # NULL start: dropped
        (d(4), None),    # NULL end: dropped
    ]
    df = spark.createDataFrame(rows, "s date, e date")
    out = {r["day"]: r["n_open"]
           for r in interval_concurrency(df, "s", "e").collect()}
    assert out == {d(1): 1, d(2): 2, d(3): 2, d(4): 1, d(6): 0}


def test_rfm_features_anchor_and_exact_sums(spark):
    from datetime import date

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        rfm_features,
    )

    rows = [
        (1, date(2024, 1, 1), 10.10),
        (1, date(2024, 1, 20), 0.20),
        (2, date(2024, 1, 31), 5.00),   # anchor customer: recency 0
        (None, date(2024, 1, 15), 9.9),  # NULL user: dropped
        (3, None, 9.9),                  # NULL date: dropped
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double")
    out = {r["o_custkey"]: r for r in rfm_features(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["recency_days"] == 11 and out[1]["frequency"] == 2
    assert out[1]["monetary"] == 10.30  # decimal-exact, no fp drift
    assert out[1]["last_order_date"] == date(2024, 1, 20)
    assert out[2]["recency_days"] == 0 and out[2]["monetary"] == 5.00


def test_winsorized_mean_clamps_outliers(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        winsorized_mean,
    )

    # group "a": 1..9 plus a 1000.0 outlier; p10/p90 over the 10 sorted
    # values interpolate at pos = q*(n-1) = 0.9 and 8.1:
    # p_lo = 1 + 0.9*(2-1) = 1.9 ; p_hi = 9 + 0.1*(1000-9) = 108.1
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 1000.0)]
    rows += [("a", None), ("b", 7.0)]  # NULL excluded; 1-row group
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           winsorized_mean(df, "g", "v", lo=0.1, hi=0.9).collect()}
    a = out["a"]
    assert a["n_items"] == 10
    assert a["p_lo"] == pytest.approx(1.9)
    assert a["p_hi"] == pytest.approx(108.1)
    assert a["raw_mean"] == pytest.approx((45 + 1000) / 10)
    # clamped: 1.9, 2..9 (unchanged), 108.1 -> mean 15.4
    assert a["win_mean"] == pytest.approx((1.9 + sum(range(2, 10)) + 108.1)
                                          / 10)
    b = out["b"]  # degenerate group: bounds == value, both means equal
    assert (b["p_lo"], b["p_hi"]) == (7.0, 7.0)
    assert b["raw_mean"] == b["win_mean"] == 7.0


def test_gini_concentration_known_distributions(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        gini_concentration,
    )

    # uniform holdings -> G = 0 by the sort identity
    # (2*S1-(n+1)*S0)/(n*S0) with S1 = x*sum(1..n) = x*n(n+1)/2
    uni = spark.createDataFrame([(i, 50000) for i in range(1, 5)],
                                "id long, units long")
    r = gini_concentration(uni, "units", "id").collect()[0]
    assert r["n_entities"] == 4 and r["gini"] == 0.0
    assert r["total_units"] == pytest.approx(20.0)  # 200000 / 1e4

    # one entity holds everything: G = (2*n*S0-(n+1)*S0)/(n*S0) = (n-1)/n
    one = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 100)], "id long, units long")
    r = gini_concentration(one, "units", "id").collect()[0]
    assert r["gini"] == pytest.approx(3 / 4)

    # NULLs excluded; empty -> NULL gini
    nulls = spark.createDataFrame([(1, None), (None, 5)],
                                  "id long, units long")
    r = gini_concentration(nulls, "units", "id").collect()[0]
    assert r["n_entities"] == 0 and r["gini"] is None


def test_zipf_fit_recovers_planted_slope(spark):
    import math

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        zipf_fit,
    )

    # plant an EXACT power law f(r) = round(1e6 * r^-1.25): the OLS fit
    # over ln/ln must recover ~-1.25 (rounding of f adds tiny noise)
    rows = [(f"t{r:04d}", int(round(1e6 * r ** -1.25)))
            for r in range(1, 201)]
    df = spark.createDataFrame(rows, "term string, n_occurrences long")
    out = zipf_fit(df).collect()[0]
    assert out["n_types"] == 200
    assert out["slope"] == pytest.approx(-1.25, abs=1e-3)
    assert out["intercept"] == pytest.approx(math.log(1e6), rel=1e-3)

    # degenerate: a single type has zero ln(rank) variance -> NULL fit
    single = spark.createDataFrame([("only", 42)],
                                   "term string, n_occurrences long")
    out = zipf_fit(single).collect()[0]
    assert out["n_types"] == 1 and out["slope"] is None


def test_entropy_from_counts_known_distributions(spark):
    import math

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        entropy_from_counts,
    )

    rows = [("uni", f"t{i}", 10) for i in range(4)]       # uniform: ln 4
    rows += [("one", "only", 99)]                          # single cat: 0
    rows += [("skew", "big", 9), ("skew", "small", 1)]     # H(0.9, 0.1)
    df = spark.createDataFrame(rows, "g string, term string, c long")
    out = {r["g"]: r for r in entropy_from_counts(df, "g", "c").collect()}
    assert out["uni"]["n_obs"] == 40 and out["uni"]["n_categories"] == 4
    assert out["uni"]["entropy"] == pytest.approx(math.log(4), abs=1e-5)
    assert out["one"]["entropy"] == pytest.approx(0.0, abs=1e-5)
    h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert out["skew"]["entropy"] == pytest.approx(h, abs=1e-5)


def test_gini_s1_exact_beyond_int64(spark):
    """S1 = sum(rank*x) must not wrap at int64 (round-12 ADVICE): each
    factor is cast to DECIMAL(38,0) BEFORE multiplying.  Three equal
    holdings of 4e18 units put rank*x up to 1.2e19 > 2^63-1 — an int64
    product wraps negative and drags gini far from the true 0."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        gini_concentration,
    )

    huge = 4_000_000_000_000_000_000  # fits long; 3*huge does not
    df = spark.createDataFrame([(i, huge) for i in range(1, 4)],
                               "id long, units long")
    r = gini_concentration(df, "units", "id").collect()[0]
    assert r["n_entities"] == 3
    assert r["gini"] == pytest.approx(0.0, abs=1e-12)


def test_entropy_from_counts_drops_nonpositive(spark):
    """Zero/negative counts contribute nothing (0*ln(0)=0 convention)
    instead of poisoning the group via ln(0) = -inf -> Long.MIN_VALUE
    under the non-ANSI cast (round-12 ADVICE)."""
    import math

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        entropy_from_counts,
    )

    rows = [("g", "a", 9), ("g", "b", 1),
            ("g", "zero", 0), ("g", "neg", -5)]
    df = spark.createDataFrame(rows, "g string, term string, c long")
    out = entropy_from_counts(df, "g", "c").collect()[0]
    # identical to the clean (9, 1) distribution; the bad rows vanish
    assert out["n_obs"] == 10 and out["n_categories"] == 2
    h = -(0.9 * math.log(0.9) + 0.1 * math.log(0.1))
    assert out["entropy"] == pytest.approx(h, abs=1e-5)


def test_mutual_information_known_distributions(spark):
    import math

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        mutual_information,
    )

    # perfect dependence: b is a function of a (and vice versa) ->
    # MI = H(a) = H(b) = ln 2
    dep = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("y", "2"), ("y", "2")], "a string, b string")
    r = mutual_information(dep, "a", "b").collect()[0]
    assert (r["n_obs"], r["n_cells"]) == (4, 2)
    assert r["h_a"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["h_b"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["h_joint"] == pytest.approx(math.log(2), abs=1e-5)
    assert r["mi_nats"] == pytest.approx(math.log(2), abs=1e-5)

    # independence: uniform over the full product -> MI = 0
    ind = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "12"], "a string, b string")
    r = mutual_information(ind, "a", "b").collect()[0]
    assert (r["n_obs"], r["n_cells"]) == (4, 4)
    assert r["h_joint"] == pytest.approx(math.log(4), abs=1e-5)
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-5)

    # NULL rows in either column are excluded (no cell to count)
    withnulls = spark.createDataFrame(
        [("x", "1"), ("x", None), (None, "2")], "a string, b string")
    r = mutual_information(withnulls, "a", "b").collect()[0]
    assert (r["n_obs"], r["n_cells"]) == (1, 1)
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-5)


def test_quantile_normalize_semantics(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        quantile_normalize,
    )

    # two groups on different scales; global sorted values:
    # [1, 2, 3, 100, 200, 300] (ids break the (val, id) ties)
    df = spark.createDataFrame(
        [(1, "lo", 1), (2, "lo", 2), (3, "lo", 3),
         (4, "hi", 100), (5, "hi", 200), (6, "hi", 300),
         (7, "hi", None), (None, "hi", 5)],  # dropped: NULL val / id
        "doc_id int, source string, val int")
    out = {r["doc_id"]: r
           for r in quantile_normalize(df, "source", "val",
                                       "doc_id").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    # rank r of 3 in-group -> global idx ceil(r * 6 / 3) = 2r
    glob = [1, 2, 3, 100, 200, 300]
    for doc, rank in [(1, 1), (2, 2), (3, 3), (4, 1), (5, 2), (6, 3)]:
        r = out[doc]
        assert r["src_rank"] == rank
        assert r["global_idx"] == 2 * rank
        assert r["normalized_value"] == glob[2 * rank - 1]
    # both groups land on the SAME normalized ladder — scale removed
    assert ([out[d]["normalized_value"] for d in (1, 2, 3)]
            == [out[d]["normalized_value"] for d in (4, 5, 6)])


def test_quantile_normalize_single_group_identity(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.analytics import (
        quantile_normalize,
    )

    # one group: within-group quantile IS the global quantile, so the
    # map is the identity (idx = ceil(r * N / N) = r)
    df = spark.createDataFrame(
        [(i, "only", v) for i, v in enumerate([5, 3, 9, 3, 7])],
        "doc_id int, source string, val int")
    for r in quantile_normalize(df, "source", "val", "doc_id").collect():
        assert r["normalized_value"] == r["val"]
        assert r["global_idx"] == r["src_rank"]
