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


def dsir_importance_weights(docs: DataFrame, target,
                            buckets: int = 64,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            salt: str = "dsir") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every document by how much more likely its hashed-unigram profile is
    under the TARGET domain's bucket multinomial than under the full
    corpus's — the standard cheap proxy for "select pretraining data
    that looks like the target distribution" without training a model.

    ``target`` is a boolean Column marking target-domain rows (e.g.
    ``F.col("source") == "wiki"``).  Tokens hash into ``buckets``
    md5-derived buckets; both multinomials get add-one smoothing.  The
    per-bucket log-likelihood ratio is quantized to integer micro-nats
    BEFORE the per-document sum, so the document score is an
    order-independent INTEGER aggregate — exact under any shuffle order
    and on any engine.  (The one float op, ``ln``, is evaluated once per
    bucket — a bounded set, not per row; a 1-ulp libm difference flips a
    quantized value only when ``1e6 * ln(r)`` sits within ~1e-9 of a
    rounding boundary, the same bounded exposure as tf-idf's rank
    contract.)

    Plan shape at 100 TB: ONE token-explode corpus scan, collapsed
    map-side into the materialized per-(doc, bucket) aggregate (at most
    ``docs x buckets`` rows); the global bucket table (``buckets`` rows,
    broadcast-sized) reduces from that aggregate, and its corpus totals
    are a window over those <= ``buckets`` post-aggregate rows — neither
    re-reads the corpus.  The LLR join is a broadcast.  No cartesian, no
    driver collect.

    Returns ``(id_col, n_toks, score_micro)`` — score in micro-nats;
    resample by ``score_micro`` descending (ties broken by id) for the
    top-k selection step.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    from .text import tokens, _wtrim

    cells = (
        docs.filter(F.col(id_col).isNotNull()
                    & (_wtrim(F.col(text_col)) != ""))
        .select(F.col(id_col), target.alias("__is_target"),
                F.explode(tokens(text_col)).alias("__tok"))
        .select(
            id_col, "__is_target",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{salt}:"), F.col("__tok"))),
                        1, 8),
                    16, 10).cast("long"),
                F.lit(buckets),
            ).cast("int").alias("__b"),
        )
    )
    # The per-(doc, bucket) aggregate serves BOTH consumers — the global
    # bucket stats reduce from it instead of re-paying the token-explode
    # corpus scan (materialize_once pins it; lazy reuse would recompute).
    # Its volume is <= docs x buckets rows, far below the token mass the
    # explode produces — the standard persisted-intermediate trade every
    # index in this repo makes.
    from ..execution import materialize_once

    docb = materialize_once(
        cells.groupBy(id_col, "__is_target", "__b")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    bstats = docb.groupBy("__b").agg(
        F.sum("__f").alias("__cnt_all"),
        F.sum(F.when(F.col("__is_target"), F.col("__f")).otherwise(0))
        .cast("long").alias("__cnt_t"),
    )
    # The corpus totals come from a global window over bstats — whose
    # input is <= buckets rows BY CONSTRUCTION (post-aggregate), so the
    # single-partition window is metadata-sized at any corpus scale.  A
    # separate .agg() would lazily re-derive bstats and pay a second
    # full token-explode scan; the window keeps the stats pass at ONE.
    wall = Window.partitionBy()
    tot_all = F.sum("__cnt_all").over(wall)
    tot_t = F.sum("__cnt_t").over(wall)
    # The ratio is ONE expression tree, mirrored token-for-token in the
    # oracle SQL: IEEE ops are correctly rounded, so identical trees give
    # identical doubles and ln() is the only 1-ulp wildcard (see above).
    smooth = F.lit(float(buckets))
    lr = bstats.select(
        "__b",
        F.floor(
            F.log(
                ((F.col("__cnt_t") + F.lit(1.0)) * (tot_all + smooth))
                / ((F.col("__cnt_all") + F.lit(1.0)) * (tot_t + smooth))
            ) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long").alias("__lr_micro"),
    )
    return (
        docb.join(F.broadcast(lr), "__b")
        .groupBy(id_col)
        .agg(
            F.sum("__f").alias("n_toks"),
            F.sum(F.col("__f") * F.col("__lr_micro")).alias("score_micro"),
        )
        .select(id_col, "n_toks", "score_micro")
    )


def temporal_split(df: DataFrame, ts_col: str, user_col: str,
                   test_days: int = 7, embargo_days: int = 1) -> DataFrame:
    """Leakage-free time-based train/test split with an embargo gap — the
    evaluation-holdout primitive for temporal data (forecasting, ranking,
    any model scored on "the future"): the most recent ``test_days`` of
    the stream become the test window, the ``embargo_days`` immediately
    before it are DROPPED from training (rows whose influence straddles
    the boundary — the purge/embargo rule from time-series CV), and
    everything earlier trains.

    The anchor is the observed ``max(ts)`` (a 1-row aggregate, broadcast
    as a scalar onto the row-local classifier — the sanctioned
    scalar-BNLJ pattern), so the split is a pure function of the data:
    no wall clock, reproducible on any engine.

    Returns one row per split (``train`` / ``embargo`` / ``test``; absent
    splits absent) with ``n_events``, ``n_users`` (exact distinct),
    ``min_ts``, ``max_ts`` — the accounting a pipeline logs before
    materializing the split (the embargo row makes dropped volume
    visible instead of silently vanishing).  NULL timestamps are
    excluded (unplaceable).

    Scale shape: one max-aggregate scan + one classify-and-aggregate scan
    (count-distinct expands to the usual two-phase partial aggregate); no
    window, no data-sized join.
    """
    if test_days < 1 or embargo_days < 0:
        raise ValueError(
            f"test_days must be >= 1 and embargo_days >= 0, got "
            f"{test_days}, {embargo_days}")
    ref = df.agg(F.max(F.col(ts_col)).alias("__max_ts"))
    test_start = F.col("__max_ts") - F.expr(f"INTERVAL {test_days} DAYS")
    train_end = test_start - F.expr(f"INTERVAL {embargo_days} DAYS")
    split = (
        F.when(F.col(ts_col) >= test_start, F.lit("test"))
        .when(F.col(ts_col) >= train_end, F.lit("embargo"))
        .otherwise(F.lit("train"))
    )
    return (
        df.filter(F.col(ts_col).isNotNull())
        .join(F.broadcast(ref))  # 1-row scalar broadcast
        .groupBy(split.alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.col(user_col)).alias("n_users"),
            F.min(F.col(ts_col)).alias("min_ts"),
            F.max(F.col(ts_col)).alias("max_ts"),
        )
    )
