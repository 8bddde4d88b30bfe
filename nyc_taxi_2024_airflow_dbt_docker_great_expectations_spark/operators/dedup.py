"""DISTINCT ON dedup (reference W1).

The reference's one window-style operation:
``SELECT DISTINCT ON (unique_trip_id) * ... ORDER BY unique_trip_id, pickup``
(``dbt/nyc_taxi/models/silver/silver_yellow_tripdata.sql:85-87``) — keep the
first row per key under an ordering.

Spark form: ranking window + ``rn = 1`` filter.  This shuffles once on the
partition keys; at 100 TB that shuffle is unavoidable for exact global dedup
(any engine must co-locate key groups), but partial aggregation does not apply
to row-selection, so the window is the right primitive — AQE handles skewed
keys by splitting oversized partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def distinct_on(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """Keep the first row per ``keys`` group ordered by ``order_by``.

    Pass a total order (e.g. a tie-breaker column) for deterministic output;
    with a partial order ties are broken arbitrarily, exactly like Postgres
    DISTINCT ON.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = F.row_number().over(w)
    return df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")


def distinct_on_agg(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """``distinct_on`` as a hash aggregate: ``min_by(struct(*), struct(order))``.

    Same result as the ranking-window form (given a total order), but the
    physical plan is a partial+final HashAggregate instead of
    shuffle-then-sort-then-rank: the map side already reduces each key group
    to one candidate row, so the shuffle carries one row per (key, partition)
    — on a 100 TB table where keys repeat, this is the difference between
    shuffling the table and shuffling the distinct keys.  Ordering NULLs:
    struct comparison sorts NULLs first like the window's default
    NULLS FIRST ascending order.
    """
    ord_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    picked = df.groupBy(*keys).agg(
        F.min_by(
            F.struct(*[F.col(c) for c in df.columns]), F.struct(*ord_cols)
        ).alias("__row")
    )
    return picked.select("__row.*")
