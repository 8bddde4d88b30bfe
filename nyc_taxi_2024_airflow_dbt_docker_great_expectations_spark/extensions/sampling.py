"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs, partitions,
and engines — useless for a pipeline whose outputs must be auditable and
diffable.  Both operators here key every decision off a content hash, so the
sample is a pure function of the data: re-runs, retries, backfills, and the
DuckDB oracle all agree row-for-row.

- ``stratified_sample``: exactly ``n`` rows per stratum (fewer if the
  stratum is smaller), chosen as the top-n in md5-hash order — the
  class-rebalancing step of a training-data pipeline (downsample the
  majority language/source without a shuffle-the-world ORDER BY RAND()).
  Spark >= 3.5 plans the rank filter as ``WindowGroupLimit``: each partition
  keeps only its local top-n BEFORE the shuffle, so the exchanged data is
  O(strata x n), not O(rows).
- ``hash_fraction_sample``: Bernoulli(fraction) by comparing a hex prefix of
  md5 against a threshold string.  Hex strings compare lexicographically ==
  numerically, so the same predicate runs verbatim in any SQL engine; the
  sampling decision is per-row, embarrassingly parallel, and stable under
  repartitioning.  The ``salt`` derives independent samples from the same
  population (train/calibration/eval draws that don't correlate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(df: DataFrame, strata_col: str, n_per_stratum: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic n-per-stratum sample: top-n of each stratum in
    (md5(id), id) order.  Output columns == input columns."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str = "doc_id", salt: str = "ws",
                    strata_col: str | None = None) -> DataFrame:
    """Deterministic weighted sample without replacement (top-n), the
    Efraimidis–Spirakis A-ES scheme with hash-derived randomness.

    Each row draws a uniform ``u`` in (0, 1] from a 60-bit md5 prefix of
    (salt, id) and gets the key ``ln(u) / w`` — the log-transformed (order-
    preserving) form of the classic ``u^(1/w)``; the ``n`` largest keys are
    the sample.  P(row in sample) is proportional-to-weight without
    replacement, and the whole draw is a pure function of (data, salt):
    reruns, engines, and the SQL oracle agree row-for-row.  With
    ``strata_col``, n rows are drawn per stratum (one windowed rank — same
    WindowGroupLimit shape as ``stratified_sample``, exchanging only
    O(strata x n) rows).  Weights must be > 0; NULL/non-positive weights
    are excluded (they have zero selection probability).
    """
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"),
                                   F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(float(16 ** 15))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(
        *((strata_col,) if strata_col else ())
    ).orderBy(F.col("__wkey").desc(), F.col(id_col))
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__wkey", key)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .drop("__wkey", "__rk")
    )


def mixture_sample(df: DataFrame, budgets: dict[str, int],
                   token_col: str, strata_col: str = "source",
                   id_col: str = "doc_id") -> DataFrame:
    """Token-budget mixture sampling — the "data mixture" step of LLM
    pre-training (The Pile / LLaMA style): each source contributes
    documents until its token budget is met, so the final corpus has the
    prescribed source proportions by TOKEN count, not document count.

    Documents are taken in deterministic ``(md5(id), id)`` order within
    each source (an unbiased, reproducible draw — same rationale as
    ``stratified_sample``); a document is kept while the running token
    total BEFORE it is under the source's budget, so the boundary
    document is included and each source overshoots by at most one
    document.  Sources absent from ``budgets`` contribute nothing.

    Plan: one hash-partitioned window per source computes the running
    sum — a single exchange keyed on the stratum.  A source's rows land
    in one task, which is exactly right when budgets cut deep (the
    window stops mattering past the cut, and Spark >= 3.5 needs only the
    partition-local running sum).  For a giant source with a budget near
    its full size, swap the window for the one-exchange distributed
    prefix sum in ``extensions/packing.py`` — same semantics, range-
    partitioned cumsum.

    Returns ``(id_col, strata_col, n_tokens, cum_tokens)`` where
    ``cum_tokens`` is the running total INCLUDING the row.
    """
    if not budgets:
        raise ValueError("budgets must be non-empty")
    budget = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )[F.col(strata_col)]
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_tok = F.col(token_col).cast("long")
    return (
        df.filter(F.col(strata_col).isin(*budgets.keys()))
        .select(
            F.col(id_col), F.col(strata_col), n_tok.alias("n_tokens"),
            F.sum(n_tok).over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") - F.col("n_tokens") < budget)
    )


def hash_fraction_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic Bernoulli(fraction) sample, portable across engines:
    keep rows whose md5 8-hex-char prefix sorts below the fraction
    threshold.  P(keep) = fraction to within 2^-32."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = format(min(int(fraction * 16 ** 8), 16 ** 8 - 1), "08x")
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.filter(F.substring(key, 1, 8) < F.lit(threshold))
