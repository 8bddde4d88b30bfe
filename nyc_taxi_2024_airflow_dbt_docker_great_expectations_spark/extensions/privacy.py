"""Disclosure-control operators for dataset release gates.

A training-data pipeline that releases extracts (eval sets, vendor drops,
public corpora) needs privacy gates in the SAME engine that builds the
extract — shipping rows out to a separate audit tool means the audit runs
on stale data.  Three standard checks, all single-aggregate shapes that
scale as hash aggregations (map-side combine collapses the event mass
before the exchange; output is bounded by the number of DISTINCT
quasi-identifier combinations, never by row volume):

- :func:`k_anonymity_violations` — combos shared by fewer than K distinct
  individuals (re-identification risk).  k-anonymity is defined over
  PEOPLE, not rows: a combo carried by 1000 rows from 2 users still
  identifies those 2 users.
- :func:`l_diversity_violations` — k-anonymity's known gap: a combo can
  be shared by >= K users who all carry the SAME sensitive value, so
  membership alone discloses the attribute.  Flags combos with fewer
  than L distinct sensitive values.
- :func:`generalization_ladder` — the releaser's knob: given a ladder of
  coarsening widths for a numeric quasi-identifier, report for each
  width whether the whole extract becomes k-anonymous.  Pick the
  smallest width that passes; every width is audited in ONE aggregate
  pass over the (widths x rows) expansion, not one job per width.

The reference has no privacy surface (it is a single-tenant taxi
pipeline); this extends the engine's quality-gate family
(``quality/dbt_tests.py``, reference ``dbt/nyc_taxi/models/silver``
test blocks) to disclosure control.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _qi(qi_cols: list[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in qi_cols]


def k_anonymity_violations(df: DataFrame, qi_cols: list[Column | str],
                           user_col: str, k: int = 5) -> DataFrame:
    """Quasi-identifier combos shared by fewer than ``k`` distinct
    ``user_col`` individuals — the rows a releaser must suppress or
    generalize.  Gate is ``n_users < k`` (which subsumes ``n_rows < k``
    since n_users <= n_rows).  Output: the QI columns plus ``n_rows``
    and ``n_users``."""
    return (
        df.groupBy(*_qi(qi_cols))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(user_col)).cast("long").alias("n_users"),
        )
        .filter(F.col("n_users") < k)
    )


def l_diversity_violations(df: DataFrame, qi_cols: list[Column | str],
                           sensitive_col: str, user_col: str,
                           l: int = 3) -> DataFrame:
    """Quasi-identifier combos whose sensitive attribute takes fewer than
    ``l`` distinct values — attribute disclosure that k-anonymity alone
    misses (a combo can have many users who all share one diagnosis /
    action / label).  Output: QI columns + ``n_rows``, ``n_users``,
    ``n_sensitive``.  Same single hash-aggregate scale shape as the
    k-anonymity gate; two count_distincts over the same grouping stay in
    one aggregate (Spark plans multi-distinct via expand, still one
    shuffle keyed on the QI tuple)."""
    return (
        df.groupBy(*_qi(qi_cols))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(user_col)).cast("long").alias("n_users"),
            F.count_distinct(F.col(sensitive_col)).cast("long")
            .alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def generalization_ladder(df: DataFrame, cat_col: str, value_col: str,
                          user_col: str, widths: list[int],
                          k: int = 5) -> DataFrame:
    """For each coarsening ``width`` (bucket = floor(value/width)), audit
    whether QI = (``cat_col``, bucket) is k-anonymous over distinct
    users — the generalize-until-anonymous decision in one pass.

    Returns one row per width: ``(width, n_groups, min_group_users,
    k_anonymous)``; the releaser picks the smallest width with
    ``k_anonymous`` true.

    Scale shape: the widths expand each row |widths|-fold BEFORE one
    partial/final hash aggregate on (width, cat, bucket) — map-side
    combine collapses the expansion to |distinct groups| immediately, so
    the exchange carries group cardinality, not |rows| x |widths|; a
    second tiny aggregate reduces to |widths| rows.  One job for the
    whole ladder instead of one scan per width."""
    width_col = F.explode(
        F.array(*[F.lit(int(w)) for w in widths])
    ).alias("width")
    expanded = df.select(
        F.col(cat_col), F.col(value_col), F.col(user_col), width_col
    )
    groups = expanded.groupBy(
        "width",
        F.col(cat_col),
        F.floor(F.col(value_col) / F.col("width")).alias("bucket"),
    ).agg(F.count_distinct(F.col(user_col)).alias("group_users"))
    return (
        groups.groupBy("width")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.min("group_users").cast("long").alias("min_group_users"),
        )
        .withColumn("k_anonymous", F.col("min_group_users") >= F.lit(k))
    )
