"""Product-analytics operators over event streams.

``cohort_retention`` — the standard activation/retention matrix: users are
cohorted by first-active day, and each (cohort, day-offset) cell counts the
distinct users from that cohort active that day.

Plan shape at scale: first-active and the distinct (user, day) activity set
both hash-shuffle on ``user_col`` (partial aggregates map-side), the join
reuses that co-partitioning, and only the final tiny cell aggregate
(cohorts x offsets, e.g. 365 x 365 rows max per year) re-shuffles — the
event stream itself is touched once.  Counts are integers and the rate is
one IEEE int/int division, so the result is engine-exact (no float-sum
drift), which keeps the SQL oracle hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(cohort_day, day_offset, cohort_size, n_active, retention_rate) —
    one row per cohort x offset with at least one active user."""
    day = F.to_date(F.col(ts_col))
    firsts = df.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = df.select(F.col(user_col), day.alias("active_day")).distinct()
    cells = (
        active.join(firsts, user_col)
        .groupBy(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day"))
            .alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_active"))
    )
    return cells.join(sizes, "cohort_day").select(
        "cohort_day",
        F.col("day_offset").cast("int").alias("day_offset"),
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.col("n_active").cast("long").alias("n_active"),
        (F.col("n_active") / F.col("cohort_size")).alias("retention_rate"),
    )


def groupwise_percentile_cont(df: DataFrame, group_col: str, val_col: str,
                              quantiles: dict[str, float]) -> DataFrame:
    """Exact per-group PERCENTILE_CONT for every ``out_col -> q`` in
    ``quantiles``, without the ``percentile`` aggregate: that aggregate
    buffers a whole group's values in one task's memory (the per-group
    twin of the global-sort hazard), while this form is a partitioned
    window ROW_NUMBER — a STREAMING sort with bounded memory at any
    group size — a per-row rank filter keeping <= 2 rows per quantile
    per group, and the ANSI interpolation ``v_lo + (v_hi - v_lo) *
    frac`` at ``pos = q * (n - 1)`` as an explicit fixed-order IEEE
    chain (spell the SAME formula in the SQL oracle; never rely on an
    engine's internal quantile_cont interpolation order).

    Returns one row per group: ``(group_col, n_items, *quantiles)``.

    NULL ``val_col`` rows are excluded up front — PERCENTILE_CONT (and
    Spark's ``percentile``) ignore NULLs, and leaving them in would both
    count them in ``n_items`` and rank them engine-dependently (Spark
    windows sort NULLS FIRST ascending, DuckDB ROW_NUMBER NULLS LAST).
    """
    from pyspark.sql import Window

    df = df.filter(F.col(val_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(val_col)
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_items"))
    ranked = (
        df.select(group_col, val_col)
        .withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(counts), group_col)
    )
    pos = {o: F.lit(q) * (F.col("n_items") - 1).cast("double")
           for o, q in quantiles.items()}
    lo = {o: F.floor(p).cast("long") + 1 for o, p in pos.items()}
    keep = None
    for o in quantiles:
        cond = (F.col("__rn") == lo[o]) | (F.col("__rn") == lo[o] + 1)
        keep = cond if keep is None else keep | cond
    sel = ranked.filter(keep)

    def interp(o):
        vlo = F.max(F.when(F.col("__rn") == lo[o], F.col(val_col)))
        vhi = F.coalesce(
            F.max(F.when(F.col("__rn") == lo[o] + 1, F.col(val_col))), vlo
        )
        frac = pos[o] - F.floor(pos[o])
        return (vlo + (vhi - vlo) * frac).alias(o)

    return sel.groupBy(group_col, "n_items").agg(
        *[interp(o) for o in quantiles]
    )


def _unit_sum(expr, scale: int):
    """Exact sufficient-statistic sum for money-like doubles: quantize
    each summand to integer units with ``floor(v*10^s + 0.5)`` (one IEEE
    chain, identical on every engine — the repo's standard exactness
    recipe), sum the BIGINTs exactly (decimal(38,0) here; the oracle's
    HUGEINT sum is the same exact integer), and take ONE correctly-rounded
    double at the end, dividing by 10^s in doubles.

    This replaces per-row ``double -> decimal(28,s)`` cast sums, whose
    ``BigDecimal.valueOf(double)`` string path made the aggregate ~3x
    slower (measured on 6M rows: 18.6s -> 6.9s for the 6-sum corr shape).
    Domain: |v| * 10^s must fit int64 (|v| < ~9e14 at s=4 — far past any
    money-like column; callers with wider domains lower ``scale``)."""
    return (
        F.sum(F.floor(expr * F.lit(float(10 ** scale)) + F.lit(0.5))
              .cast("long").cast("decimal(38,0)"))
        .cast("double") / F.lit(float(10 ** scale))
    )


def groupwise_ols(df: DataFrame, group_cols: list[str], x_col: str,
                  y_col: str, scale: int = 4) -> DataFrame:
    """Per-group simple linear regression (OLS of y on x) via sufficient
    statistics — the distributed-ML pattern: one partial/final aggregate
    computes (n, Σx, Σy, Σxy, Σx²) per group, and the closed-form slope
    and intercept fall out of five scalars.  No iteration, no driver
    data, the same single-aggregation shape at any scale.

    Determinism: the sums are integer-unit exact (:func:`_unit_sum` —
    shuffle order can't change them; products of two money-like doubles
    are exact at ``2*scale_in <= scale`` decimals, so the quantization is
    unambiguous), and the slope/intercept arithmetic after the aggregate
    is pure IEEE +,-,*,/ mirrored operation-for-operation by the SQL
    oracle.  Degenerate groups (constant x, where the variance
    denominator is exactly 0) yield NULL slope/intercept rather than
    engine-dependent inf/NULL division behavior.

    Returns ``group_cols + (n, slope, intercept)``.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _unit_sum(F.col(x_col), scale).alias("__sx"),
        _unit_sum(F.col(y_col), scale).alias("__sy"),
        _unit_sum(F.col(x_col) * F.col(y_col), scale).alias("__sxy"),
        _unit_sum(F.col(x_col) * F.col(x_col), scale).alias("__sxx"),
    )
    nd = F.col("n").cast("double")
    denom = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom
    intercept = (F.col("__sy") - slope * F.col("__sx")) / nd
    return agg.select(
        *group_cols,
        F.col("n"),
        F.when(denom == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(slope).alias("slope"),
        F.when(denom == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(intercept).alias("intercept"),
    )


def groupwise_corr(df: DataFrame, group_cols: list[str], x_col: str,
                   y_col: str, scale: int = 4) -> DataFrame:
    """Per-group Pearson correlation via the same sufficient-statistics
    pattern as :func:`groupwise_ols` — and NOT ``F.corr``: built-in
    correlation aggregates accumulate floats in shuffle order (per-engine,
    per-run drift in the last ulp), while the six integer-unit sums here
    are exact (:func:`_unit_sum`) and the finish is a fixed-order IEEE
    chain the SQL oracle mirrors operation-for-operation (sqrt is
    correctly rounded, so the whole chain is bit-identical).

    ``r = (n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))``

    Degenerate groups (either variance exactly 0) yield NULL.  Returns
    ``group_cols + (n, corr)``.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _unit_sum(F.col(x_col), scale).alias("__sx"),
        _unit_sum(F.col(y_col), scale).alias("__sy"),
        _unit_sum(F.col(x_col) * F.col(y_col), scale).alias("__sxy"),
        _unit_sum(F.col(x_col) * F.col(x_col), scale).alias("__sxx"),
        _unit_sum(F.col(y_col) * F.col(y_col), scale).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    num = nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    r = num / (F.sqrt(vx) * F.sqrt(vy))
    return agg.select(
        *group_cols,
        F.col("n"),
        F.when((vx <= F.lit(0.0)) | (vy <= F.lit(0.0)),
               F.lit(None).cast("double")).otherwise(r).alias("corr"),
    )


# --- linear probe (in-engine trained classifier) ---------------------------

def det_expr(m: list[list[str]]) -> str:
    """SQL expression string for the determinant of a matrix of SQL
    sub-expressions, by cofactor expansion along the first row with a
    FIXED term order and full parenthesization.  The same string runs
    verbatim in Spark SQL and DuckDB, so every +,-,* executes in the
    same IEEE order and the value is bit-identical across engines —
    the device that makes a closed-form model fit oracle-checkable."""
    if len(m) == 1:
        return m[0][0]
    terms = []
    for j, lead in enumerate(m[0]):
        minor = [[row[c] for c in range(len(m)) if c != j] for row in m[1:]]
        term = f"({lead} * ({det_expr(minor)}))"
        terms.append(term if j % 2 == 0 else f"(0.0 - {term})")
    return " + ".join(terms)


PROBE_SUM_COLS = ("pn", "s1", "s2", "s3", "s11", "s12", "s13",
                  "s22", "s23", "s33", "sy", "s1y", "s2y", "s3y")


def probe_weight_exprs() -> list[str]:
    """SQL expression strings for the 4 least-squares weights of an
    intercept + 3-feature linear probe, via Cramer's rule over the
    normal-equation sums (column names ``PROBE_SUM_COLS``)."""
    d = lambda c: f"CAST({c} AS DOUBLE)"
    a = [
        [d("pn"), d("s1"), d("s2"), d("s3")],
        [d("s1"), d("s11"), d("s12"), d("s13")],
        [d("s2"), d("s12"), d("s22"), d("s23")],
        [d("s3"), d("s13"), d("s23"), d("s33")],
    ]
    b = [d("sy"), d("s1y"), d("s2y"), d("s3y")]
    det = det_expr(a)
    out = []
    for i in range(4):
        ai = [[b[r] if c == i else a[r][c] for c in range(4)]
              for r in range(4)]
        out.append(f"(({det_expr(ai)}) / ({det}))")
    return out


def linear_probe(df: DataFrame, id_col: str, label, feats: list) -> DataFrame:
    """Train a least-squares **linear probe** classifier in-engine and
    score every row: closed-form normal equations ``(X'X) w = X'y`` over
    an intercept + exactly 3 INTEGER features, solved by Cramer's rule.

    This is the classic cheap trainable quality filter for corpus
    curation (a linear probe over engineered features — the fasttext-
    style filter's linear core) expressed Spark-first:

    - **Sufficient statistics**: one partial+final aggregate produces the
      14 normal-equation sums.  Features and label are integers, so the
      sums are EXACT int64 arithmetic (no float accumulation order to
      drift) — magnitude budget: every sum(x_i * x_j) must stay below
      2^53 so the double conversion is exact; at 100 TB scale the sums
      outgrow that and the cast widens to decimal first.
    - **Solve**: Cramer's rule as a FIXED-ORDER arithmetic string
      (:func:`det_expr`) evaluated from the broadcast 1-row sums — the
      whole "training step" is one crossJoin(broadcast) projection, and
      the identical string runs in the SQL oracle, so the fitted weights
      are bit-identical across engines.  A singular design matrix
      (collinear features) makes det 0 and the weights NULL/Inf — the
      caller picks non-degenerate features.
    - **Inference**: ``score = w0 + w1 x1 + w2 x2 + w3 x3`` map-side, a
      fixed left-associated IEEE chain.

    Returns ``(id_col, label, score)`` for every input row.
    """
    if len(feats) != 3:
        raise ValueError(f"linear_probe fits intercept + exactly 3 "
                         f"features, got {len(feats)}")
    base = df.select(
        F.col(id_col),
        label.cast("long").alias("__y"),
        *[feats[i].cast("long").alias(f"__x{i + 1}") for i in range(3)],
    )
    x = [F.lit(1).cast("long")] + [F.col(f"__x{i + 1}") for i in range(3)]
    sums = base.agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(x[1]).alias("s1"), F.sum(x[2]).alias("s2"),
        F.sum(x[3]).alias("s3"),
        F.sum(x[1] * x[1]).alias("s11"), F.sum(x[1] * x[2]).alias("s12"),
        F.sum(x[1] * x[3]).alias("s13"),
        F.sum(x[2] * x[2]).alias("s22"), F.sum(x[2] * x[3]).alias("s23"),
        F.sum(x[3] * x[3]).alias("s33"),
        F.sum(F.col("__y")).alias("sy"),
        F.sum(x[1] * F.col("__y")).alias("s1y"),
        F.sum(x[2] * F.col("__y")).alias("s2y"),
        F.sum(x[3] * F.col("__y")).alias("s3y"),
    )
    w = [F.expr(e) for e in probe_weight_exprs()]
    score = w[0]
    for i in range(3):
        score = score + w[i + 1] * F.col(f"__x{i + 1}").cast("double")
    return (
        base.crossJoin(F.broadcast(sums))
        .select(
            F.col(id_col),
            F.col("__y").cast("integer").alias("label"),
            score.alias("score"),
        )
    )


def chisq_chain(k: int) -> str:
    """Fixed-order SQL expression string for the chi-square statistic over
    ``k`` pivoted term columns: per rank i, observed ``o_i`` (BIGINT),
    corpus count ``g_i`` (BIGINT), corpus total ``gn`` and source total
    ``sn`` — ``sum_i (o_i - e_i)^2 / e_i`` with ``e_i = g_i/gn * sn``,
    summed left-to-right in rank order.  A corpus with fewer than ``k``
    distinct tokens leaves trailing ranks empty (``g_i = o_i = 0``);
    those terms contribute exactly 0 instead of the 0/0 NaN that would
    poison the whole sum.  The identical string runs in Spark SQL and
    DuckDB, so the double chain is bit-identical across engines."""
    terms = []
    for i in range(k):
        e = (f"((CAST(g_{i} AS DOUBLE) / CAST(gn AS DOUBLE)) "
             f"* CAST(sn AS DOUBLE))")
        o = f"CAST(o_{i} AS DOUBLE)"
        terms.append(f"(CASE WHEN g_{i} = 0 THEN 0.0 "
                     f"ELSE ((({o} - {e}) * ({o} - {e})) / {e}) END)")
    return " + ".join(terms)


def token_drift_chisq(df: DataFrame, source_col: str = "source",
                      text_col: str = "text", top_k: int = 20,
                      postings: DataFrame | None = None) -> DataFrame:
    """Per-source token-distribution drift: the chi-square statistic of
    each source's observed counts over the corpus-wide top-``top_k``
    token vocabulary against the corpus-share expectation — the standard
    domain-shift / feed-health audit for a multi-source training corpus
    (a drifting crawl feed shows up as a chi-square orders of magnitude
    above its siblings; dof = top_k - 1 for a significance cut).

    Spark-first shape: one tokenize+count aggregate for the global
    vocabulary; top-k by (count desc, token) — deterministic total
    order — then ranks assigned on the k-row result (metadata-sized
    window) and BROADCAST into a second conditional-aggregate pass that
    pivots each source's observed counts into fixed rank columns.  No
    driver collect; two shuffles total (token counts, source pivot).

    Exactness: counts are integers; expectations and the chi-square are
    a fixed left-to-right IEEE chain (:func:`chisq_chain`) evaluated
    verbatim by both engines.  Only top-k tokens enter (``sn`` is the
    source's mass WITHIN the vocabulary), so sources sharing the corpus
    distribution score near 0 regardless of size.  Returns
    ``(source_col, sn, chisq)``.

    ``postings`` (optional): a pre-tokenized posting list carrying
    ``(source_col, term, tf)`` — one row per distinct (doc, term) with
    its occurrence count.  When given, every occurrence count becomes a
    tf-weighted sum over the posting rows (integer-identical to counting
    exploded occurrences) and the corpus text is never read — the r13
    plan re-ran the explode for the vocabulary and the per-source pass
    (6 corpus scans).
    """
    from .text import tokens

    if postings is not None:
        toks = postings.select(
            F.col(source_col), F.col("term").alias("__tok"),
            F.col("tf").alias("__w"),
        )
    else:
        toks = df.select(
            F.col(source_col), F.explode(tokens(text_col)).alias("__tok"),
            F.lit(1).cast("long").alias("__w"),
        )
    glob = toks.groupBy("__tok").agg(F.sum("__w").cast("long").alias("__c"))
    topk = glob.orderBy(F.col("__c").desc(), F.col("__tok")).limit(top_k)
    from pyspark.sql import Window
    ranked = topk.select(
        "__tok", "__c",
        (F.row_number().over(
            Window.orderBy(F.col("__c").desc(), F.col("__tok"))
        ) - 1).alias("__r"),
    )
    joined = toks.join(F.broadcast(ranked), "__tok")
    obs = joined.groupBy(source_col).agg(
        *[
            F.sum(F.when(F.col("__r") == i, F.col("__w")).otherwise(0))
            .cast("long").alias(f"o_{i}")
            for i in range(top_k)
        ],
        F.sum("__w").cast("long").alias("sn"),
    )
    gl = ranked.agg(
        *[
            F.sum(F.when(F.col("__r") == i, F.col("__c")).otherwise(0))
            .cast("long").alias(f"g_{i}")
            for i in range(top_k)
        ],
        F.sum("__c").cast("long").alias("gn"),
    )
    return (
        obs.crossJoin(F.broadcast(gl))
        .select(
            F.col(source_col), F.col("sn"),
            F.expr(chisq_chain(top_k)).alias("chisq"),
        )
    )


def interval_concurrency(df: DataFrame, start_col: str, end_col: str,
                         count_col: str = "n_open",
                         day_col: str = "day") -> DataFrame:
    """Sweep-line interval concurrency: for every day, how many intervals
    ``[start, end]`` (both inclusive, date-granular) cover it — max
    concurrent shipments in transit, open orders in fulfillment, parallel
    sessions.  The naive form is a day-x-interval range join (quadratic
    blowup); the sweep line is the scale-correct shape:

    1. each interval EMITS two deltas (+1 at start, -1 at end+1 day) —
       row-local generate, no join;
    2. one partial/final hash aggregate nets the deltas per day (output
       bounded by |distinct days|, never |intervals|);
    3. a cumulative-sum window over the tiny post-aggregate day table
       (the single-partition sort is metadata-sized — the data itself
       collapsed in step 2) yields the running open count.

    Rows with a NULL endpoint or ``end < start`` are dropped (undefined
    coverage).  The output is the STEP FUNCTION, not a dense calendar:
    one row per day that carries a delta, each count valid from that day
    until the next row's day (a dense series would be |calendar| rows for
    no information — gap-fill downstream with daily_gapfill's shape if a
    plot needs it).  The day after the last interval closes appears with
    count 0, closing the series.

    Returns ``(day_col date, count_col long)`` ordered by day.
    """
    start, end = F.col(start_col).cast("date"), F.col(end_col).cast("date")
    deltas = (
        df.filter(start.isNotNull() & end.isNotNull() & (end >= start))
        .select(F.explode(F.array(
            F.struct(start.alias("__d"), F.lit(1).alias("__delta")),
            F.struct(F.date_add(end, 1).alias("__d"),
                     F.lit(-1).alias("__delta")),
        )).alias("__e"))
        .select(F.col("__e.__d").alias("__d"),
                F.col("__e.__delta").alias("__delta"))
    )
    daily = deltas.groupBy("__d").agg(
        F.sum("__delta").cast("long").alias("__net"))
    from pyspark.sql import Window

    w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding,
                                          Window.currentRow)
    return (
        daily.select(
            F.col("__d").alias(day_col),
            F.sum("__net").over(w).alias(count_col),
        ).orderBy(day_col)
    )


def rfm_features(orders: DataFrame, user_col: str = "o_custkey",
                 date_col: str = "o_orderdate",
                 amount_col: str = "o_totalprice") -> DataFrame:
    """RFM feature engineering (recency / frequency / monetary) — the
    classic per-entity behavioral feature block for churn/LTV models and
    training-set construction: days since last order (anchored at the
    observed max date — a 1-row scalar broadcast, so the features are a
    pure function of the data, no wall clock), order count, and
    decimal-exact spend.

    One per-user aggregate + the scalar anchor join; amounts sum in
    DECIMAL(38,2) before the double cast so the monetary feature is
    bit-identical under any partitioning/engine.

    Returns ``(user_col, recency_days int, frequency long,
    monetary double, last_order_date date)``.
    """
    anchor = orders.agg(
        F.max(F.col(date_col).cast("date")).alias("__max_d"))
    per_user = (
        orders.filter(F.col(user_col).isNotNull()
                      & F.col(date_col).isNotNull())
        .groupBy(user_col)
        .agg(
            F.max(F.col(date_col).cast("date")).alias("last_order_date"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col(amount_col).cast("decimal(38,2)"))
            .cast("double").alias("monetary"),
        )
    )
    return (
        per_user.join(F.broadcast(anchor))  # 1-row scalar broadcast
        .select(
            user_col,
            F.datediff(F.col("__max_d"), F.col("last_order_date"))
            .cast("int").alias("recency_days"),
            "frequency", "monetary", "last_order_date",
        )
    )


def winsorized_mean(df: DataFrame, group_col: str, val_col: str,
                    lo: float = 0.05, hi: float = 0.95,
                    scale: int = 4) -> DataFrame:
    """Per-group winsorized mean — the robust-statistics step a metrics
    or reward-model pipeline runs so a handful of fat-finger outliers
    cannot drag a group mean (clamp to the [p_lo, p_hi] percentile band,
    then average).

    Two passes, both scale-safe: pass 1 computes the exact per-group
    percentile bounds via :func:`groupwise_percentile_cont` (streaming
    partitioned window, <= 2 rows kept per quantile per group); pass 2
    broadcast-joins the |groups|-row bounds table back and aggregates the
    clamped values — the fact table is scanned twice and never shuffled
    beyond the two group-keyed aggregates.

    Determinism: the bounds use the ANSI interpolation chain the oracle
    mirrors; the clamp is least/greatest (exact); both means are
    integer-unit exact sums (:func:`_unit_sum`) divided by the count in
    one IEEE step.  NULL values are excluded (percentiles already ignore
    them; counting them in the mean would disagree with AVG semantics).

    Returns ``(group_col, n_items, p_lo, p_hi, raw_mean, win_mean)``.
    """
    bounds = groupwise_percentile_cont(df, group_col, val_col,
                                       {"p_lo": lo, "p_hi": hi})
    base = df.filter(F.col(val_col).isNotNull()).select(group_col, val_col)
    j = base.join(F.broadcast(bounds), group_col)
    v = F.col(val_col).cast("double")
    clamped = F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    agg = j.groupBy(group_col, "n_items", "p_lo", "p_hi").agg(
        _unit_sum(v, scale).alias("__sraw"),
        _unit_sum(clamped, scale).alias("__swin"),
    )
    n = F.col("n_items").cast("double")
    return agg.select(
        group_col, "n_items", "p_lo", "p_hi",
        (F.col("__sraw") / n).alias("raw_mean"),
        (F.col("__swin") / n).alias("win_mean"),
    )


def gini_concentration(df: DataFrame, unit_col: str, id_col: str,
                       unit_scale: int = 4) -> DataFrame:
    """Gini coefficient of a non-negative per-entity measure already
    expressed in INTEGER units (``unit_col``, e.g. money at 10^-4
    precision) — the concentration/inequality gauge a data pipeline runs
    on revenue-per-customer, tokens-per-source, or examples-per-label to
    quantify how skewed a distribution is (0 = uniform, -> 1 = one
    entity holds everything).

    Sort-based identity ``G = (2*S1 - (n+1)*S0) / (n*S0)`` with
    ``S1 = sum(rank_i * x_i)`` under ascending (value, id) order.  The
    global rank comes from :func:`packing.global_rank` (two-phase range
    prefix sum — ONE range exchange, O(partitions) driver rows), never an
    unpartitioned window: ranking a billion entities must not serialize
    into a single task.

    Determinism: integer units make S0/S1 exact DECIMAL(38,0) sums under
    any shuffle order; the finish is one fixed IEEE chain on doubles the
    SQL oracle mirrors.  NULL units/ids are excluded (they cannot be
    ranked); an empty input yields NULL gini.

    Returns one row: ``(n_entities, total_units, gini)``.
    """
    from .packing import global_rank

    pts = df.filter(F.col(unit_col).isNotNull() & F.col(id_col).isNotNull())
    ranked, _n = global_rank(
        pts.select(F.col(id_col).alias("__id"),
                   F.col(unit_col).cast("long").alias("__x")),
        [F.col("__x").asc(), F.col("__id").asc()],
        out_col="__r",
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__s0"),
        F.sum(F.col("__r").cast("decimal(38,0)")
              * F.col("__x").cast("decimal(38,0)"))
        .alias("__s1"),
    )
    nd = F.col("n_entities").cast("double")
    s0 = F.col("__s0").cast("double")
    s1 = F.col("__s1").cast("double")
    gini = (F.lit(2.0) * s1 - (nd + F.lit(1.0)) * s0) / (nd * s0)
    return agg.select(
        "n_entities",
        (s0 / F.lit(float(10 ** unit_scale))).alias("total_units"),
        F.when((F.col("n_entities") == 0) | (F.col("__s0") == 0),
               F.lit(None).cast("double")).otherwise(gini).alias("gini"),
    )


def zipf_fit(freq: DataFrame, term_col: str = "term",
             freq_col: str = "n_occurrences") -> DataFrame:
    """Zipf's-law fit over a term-frequency table: OLS slope/intercept of
    ``ln(freq)`` on ``ln(rank)`` with rank = 1-based position under
    (freq DESC, term ASC) — the vocabulary-health gauge for an LLM
    corpus (natural text sits near slope -1; a slope collapsing toward 0
    flags boilerplate floods, one near -2 flags a nuked long tail).

    The global frequency rank uses :func:`packing.global_rank` (range
    prefix sum), never an unpartitioned window — a 100 M-type vocabulary
    must not rank in one task.  The regression is the sufficient-
    statistics closed form over per-row ``ln`` values quantized to
    integer MICRO-units (floor(v*1e6+0.5), the dsir_weights recipe:
    per-row libm ln agrees across engines at micro precision, and the
    quantized sums are exact under any order).

    Returns one row: ``(n_types, slope, intercept)`` (NULL fit when
    fewer than 2 types).
    """
    from .packing import global_rank

    ranked, _n = global_rank(
        freq.select(F.col(term_col).alias("__t"),
                    F.col(freq_col).cast("long").alias("__f")),
        [F.col("__f").desc(), F.col("__t").asc()],
        out_col="__r",
    )
    x = F.log(F.col("__r").cast("double"))
    y = F.log(F.col("__f").cast("double"))

    def micro(expr):
        return (F.sum(F.floor(expr * F.lit(1e6) + F.lit(0.5))
                      .cast("long").cast("decimal(38,0)"))
                .cast("double") / F.lit(1e6))

    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        micro(x).alias("__sx"),
        micro(y).alias("__sy"),
        micro(x * y).alias("__sxy"),
        micro(x * x).alias("__sxx"),
    )
    nd = F.col("n_types").cast("double")
    denom = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = (nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom
    intercept = (F.col("__sy") - slope * F.col("__sx")) / nd
    return agg.select(
        "n_types",
        F.when(denom == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(slope).alias("slope"),
        F.when(denom == F.lit(0.0), F.lit(None).cast("double"))
        .otherwise(intercept).alias("intercept"),
    )


def entropy_from_counts(df: DataFrame, group_col: str,
                        count_col: str) -> DataFrame:
    """Shannon entropy (nats) of a categorical distribution per group,
    from pre-aggregated ``(group, category, count)`` rows — the diversity
    gauge a corpus pipeline runs per source/shard (token-distribution
    entropy collapsing = boilerplate flood or dedup gone wrong; label
    entropy = class balance).

    Identity ``H = ln(N) - (sum c*ln(c)) / N`` needs ONE further
    aggregate over the counts table; ``ln(c)`` quantizes to exact integer
    micro-units per row (the dsir/zipf recipe — engines agree at micro
    precision and the sum is order-exact), multiplied into DECIMAL(38,0)
    BEFORE summing so 100 TB-scale ``c * ln(c)`` terms cannot overflow
    int64.  The finish is a fixed IEEE chain the SQL oracle mirrors.

    Returns ``(group_col, n_obs, n_categories, entropy)``; a group whose
    every count is 1 (or with one category) lands at ~0 exactly as the
    identity dictates.

    Contract: counts must be POSITIVE.  Zero-count categories contribute
    nothing to H by the ``0*ln(0) = 0`` convention and are dropped up
    front (they'd otherwise poison the group: ``ln(0) = -inf`` and the
    non-ANSI long cast of ``-inf`` is Long.MIN_VALUE); negative counts
    are dropped by the same filter — a counts table containing them is
    already corrupt upstream.
    """
    c = F.col(count_col).cast("long")
    df = df.filter(c > 0)
    micro_ln = F.floor(F.log(c.cast("double")) * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    agg = df.groupBy(group_col).agg(
        F.sum(c).cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("n_categories"),
        F.sum(c.cast("decimal(38,0)") * micro_ln.cast("decimal(38,0)"))
        .alias("__s"),
    )
    ln_n = (F.floor(F.log(F.col("n_obs").cast("double")) * F.lit(1e6)
                    + F.lit(0.5)).cast("double") / F.lit(1e6))
    ent = ln_n - (F.col("__s").cast("double") / F.lit(1e6)) \
        / F.col("n_obs").cast("double")
    return agg.select(group_col, "n_obs", "n_categories",
                      ent.alias("entropy"))


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    the marginal/joint entropies it decomposes into — the dependence
    gauge a corpus pipeline runs on (source, language), (shard, label),
    or (time-bucket, topic): MI near 0 means the two factorize (sampling
    by one cannot skew the other); high MI flags coupling (e.g. one
    source dominating one language, so a source-level dedup silently
    reshapes the language mix).

    Identities over co-occurrence counts (``N`` rows, cell counts
    ``c_ab``, marginals ``c_a``/``c_b``):

    - ``H(X)   = ln N - (sum_cells c_ab * ln c_a) / N``  (and sym. for Y)
    - ``H(X,Y) = ln N - (sum_cells c_ab * ln c_ab) / N``
    - ``MI     = H(X) + H(Y) - H(X,Y)``

    so EVERYTHING reduces to one groupBy(a, b) exchange over the data,
    two broadcast joins of the (tiny) marginal tables onto the cells,
    and ONE 1-row aggregate — no second pass over the corpus, no
    crossJoin.  Every ``ln`` quantizes to exact integer micro-units per
    row (the dsir/zipf/entropy recipe: engines agree at micro precision)
    multiplied into DECIMAL(38,0) sums, so the result is a pure function
    of the data under any shuffle order and the SQL oracle mirrors it
    bit-for-bit; the finish is a fixed IEEE chain.  Rows with a NULL in
    either column are excluded (they have no cell); empty input yields
    one row of NULLs/zeros.

    Returns one row:
    ``(n_obs, n_cells, h_a, h_b, h_joint, mi_nats)``.
    """
    pts = df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cells = pts.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    ma = cells.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ca"))
    mb = cells.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))
    j = cells.join(F.broadcast(ma), "__a").join(F.broadcast(mb), "__b")

    def micro_ln(c):
        return F.floor(F.log(c.cast("double")) * F.lit(1e6) + F.lit(0.5)) \
            .cast("long").cast("decimal(38,0)")

    cdec = F.col("__c").cast("decimal(38,0)")
    agg = j.agg(
        F.sum(F.col("__c")).cast("long").alias("n_obs"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(cdec * micro_ln(F.col("__c"))).alias("__sab"),
        F.sum(cdec * micro_ln(F.col("__ca"))).alias("__sa"),
        F.sum(cdec * micro_ln(F.col("__cb"))).alias("__sb"),
    )
    ln_n = (F.floor(F.log(F.col("n_obs").cast("double")) * F.lit(1e6)
                    + F.lit(0.5)).cast("double") / F.lit(1e6))
    nd = F.col("n_obs").cast("double")

    def h(s):
        return ln_n - (F.col(s).cast("double") / F.lit(1e6)) / nd

    return agg.select(
        "n_obs", "n_cells",
        h("__sa").alias("h_a"),
        h("__sb").alias("h_b"),
        h("__sab").alias("h_joint"),
        (h("__sa") + h("__sb") - h("__sab")).alias("mi_nats"),
    )


def quantile_normalize(df: DataFrame, group_col: str, val_col: str,
                       id_col: str) -> DataFrame:
    """Quantile normalization (Bolstad et al., Bioinformatics 2003,
    classic cross-array normalization — here cross-SOURCE): map each
    row's value onto the GLOBAL distribution at the same within-group
    quantile, so groups whose scores live on different scales (one
    source's quality scorer is harsher, one language runs longer) become
    comparable before a single corpus-wide threshold is applied.

    Semantics are the exact type-1 (discontinuous inverse-CDF) form —
    all-integer, so both engines agree bit-for-bit:

    - ``r``   = 1-based rank of the row within its group under
      ``(val, id)`` (the id tiebreak makes the order total),
    - ``n_g`` = group size, ``N`` = total rows,
    - ``global_idx``       = ``ceil(r * N / n_g)`` in integer arithmetic,
    - ``normalized_value`` = the ``global_idx``-th smallest value in the
      WHOLE table under the same ``(val, id)`` total order.

    Plan shape at scale: the within-group rank is a keyed window
    (hash-partitioned by group — no global window), the global order
    statistic comes from ``packing.global_rank`` (ONE range exchange +
    O(partitions) driver offsets — the scale-safe global ROW_NUMBER),
    and the final lookup is an equi-join on the unique rank, so the
    whole thing is two exchanges over the data and one integer-keyed
    join.  Rows with a NULL id or NULL value are dropped (no total order
    without the tiebreak, and engines disagree on default NULL sort
    order — Spark puts ASC NULLs first, DuckDB last — so a NULL value
    has no portable quantile).

    Returns ``(id_col, group_col, val_col, src_rank, global_idx,
    normalized_value)`` — one row per input row.
    """
    from pyspark.sql import Window

    from .packing import global_rank

    pts = df.select(id_col, group_col, val_col).filter(
        F.col(id_col).isNotNull() & F.col(val_col).isNotNull()
    )
    wg = Window.partitionBy(group_col).orderBy(
        F.col(val_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    ranked_g = pts.select(
        id_col, group_col, val_col,
        F.row_number().over(wg).cast("long").alias("src_rank"),
        F.count(F.lit(1)).over(wn).cast("long").alias("__ng"),
    )
    order_stat, n_total = global_rank(
        pts.select(F.col(val_col).alias("__gval"),
                   F.col(id_col).alias("__gid")),
        [F.col("__gval").asc(), F.col("__gid").asc()],
        out_col="__grank",
    )
    lookup = order_stat.select(
        F.col("__grank"), F.col("__gval").alias("normalized_value")
    )
    # ceil(r * N / n_g) with every factor DECIMAL(38,0) BEFORE the
    # product (r * N wraps int64 once N reaches ~3e9 rows); `div` on
    # decimals is exact floor division returning BIGINT
    with_idx = ranked_g.withColumn(
        "global_idx",
        F.expr(
            f"(CAST(src_rank AS DECIMAL(38,0))"
            f" * CAST({int(n_total)} AS DECIMAL(38,0))"
            f" + CAST(__ng AS DECIMAL(38,0)) - 1)"
            f" div CAST(__ng AS DECIMAL(38,0))"
        ),
    )
    return (
        with_idx.join(lookup, with_idx["global_idx"] == lookup["__grank"])
        .select(id_col, group_col, val_col, "src_rank", "global_idx",
                "normalized_value")
    )
