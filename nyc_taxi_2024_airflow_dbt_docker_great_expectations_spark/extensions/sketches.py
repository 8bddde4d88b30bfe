"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but its
register layout is engine-private: no other engine reproduces its estimate,
so it cannot be oracle-checked and two engines never agree during a
migration.  The K-minimum-values (KMV / bottom-k) sketch is the portable
alternative: hash every value to a uniform in (0,1), keep the k smallest
distinct hashes, estimate distinct-count as ``(k-1) / h_k`` where ``h_k`` is
the k-th smallest hash.  Every engine with md5 computes the identical
sketch, the estimate is a pure function of the data, and sketches merge by
unioning hash sets (the property that makes them aggregable across
partitions/partial results — exactly how the groupBy below computes them).

Standard error ~ 1/sqrt(k-2): k=256 gives ~6%.  Groups with fewer than k
distinct values report exactly (the sketch degenerates to the full hash
set).  At 100 TB the shuffle carries at most k hashes per group (bottom-k
is applied map-side by the window-rank pushdown), never the value set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _md5_60bit(col: Column) -> Column:
    """60-bit md5-prefix hash (15 hex chars -> int64) — the ORACLE-
    CONTRACT hash layout shared by the two cardinality sketches (KMV and
    HLL; CMS uses its own seeded 32-bit cell hash).  The two are
    documented to cross-check each other, so they MUST consume the
    identical hash; keep the layout here, never inline it."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15),
                  16, 10).cast("long")


def _distinct_values(df: DataFrame, group_cols: list[str],
                     value_col: str) -> DataFrame:
    """Shared sketch prelude: non-null values collapsed to one row per
    (group, value) BEFORE hashing — cardinality not frequency, and md5
    is paid on the key space instead of the fact table."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"))
        .distinct()
    )


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 k: int = 256) -> DataFrame:
    """Per group: (group_cols..., est_distinct double, sketch_k int).

    ``est_distinct`` is exact when the group's distinct count < k, else the
    KMV estimate ``(k-1)/h_k``.  ``sketch_k`` reports how many hashes the
    sketch actually holds (== k when estimating, < k when exact).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    # 60-bit md5 prefix -> uniform (0, 1]; distinct on the RAW value
    # BEFORE hashing: duplicate values must collapse to one hash anyway
    # (cardinality, not frequency), and the hash is a pure function of the
    # value, so hashing after the distinct is value-identical while paying
    # md5+conv on |distinct| rows instead of |rows| — at 100 TB the
    # difference between hashing the fact table and hashing its key space
    h = ((_md5_60bit(F.col("__v")) + F.lit(1)).cast("double")
         / F.lit(float(16 ** 15)))
    hashed = _distinct_values(df, group_cols, value_col).select(
        *group_cols, h.alias("__h")
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    bottom_k = (
        hashed.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
    )
    return bottom_k.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("sketch_k"),
        F.max("__h").alias("__hk"),
    ).select(
        *group_cols,
        F.when(F.col("sketch_k") < k, F.col("sketch_k").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("__hk"))
        .alias("est_distinct"),
        F.col("sketch_k").cast("int").alias("sketch_k"),
    )


def cms_heavy_hitters(items: DataFrame, value_col: str,
                      depth: int = 4, width: int = 512,
                      k: int = 30) -> DataFrame:
    """Count-min-sketch heavy hitters: estimate every distinct value's
    frequency through a ``depth x width`` counter sketch and report the
    top-``k`` by estimate — the streaming/mergeable way to find frequent
    items when the exact per-value aggregate is too wide to keep.

    Like :func:`kmv_distinct`, the hash family is md5-derived (seeded per
    row of the sketch), so the counters — and therefore every estimate —
    are identical on any engine and SQL-oracle-checkable, unlike
    engine-private sketch layouts.  Estimates overcount (never
    undercount) by at most ``2 * total / width`` with probability
    ``1 - 2^-depth`` — the classic CM guarantee.

    Plan: ONE pass explodes each item into its ``depth`` counter cells
    (partial/final hash agg to ``depth * width`` rows — the sketch is
    broadcast-sized by construction); estimates then join the distinct
    values' cells against the broadcast sketch and take a min over
    ``depth`` rows per value; top-k is a TakeOrdered.  The sketch table
    itself is the mergeable artifact a streaming deployment persists.

    Returns ``(value_col, cms_count)``, ties broken by value.
    """
    def cells_for(col: str):
        vv = F.col(col).cast("string")

        def cell(d: int):
            return F.pmod(
                F.conv(F.substring(F.md5(F.concat(F.lit(f"cms{d}:"), vv)),
                                   1, 8), 16, 10).cast("long"),
                F.lit(width),
            ).cast("int")

        return F.array(*[
            F.struct(F.lit(d).alias("d"), cell(d).alias("pos"))
            for d in range(depth)
        ])

    counters = (
        items.select(F.explode(cells_for(value_col)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cand = (
        items.select(F.col(value_col).cast("string").alias("__v"))
        .distinct()
        .select("__v", F.explode(cells_for("__v")).alias("c"))
    )
    return (
        cand.join(F.broadcast(counters),
                  (F.col("c.d") == F.col("d")) & (F.col("c.pos") == F.col("pos")))
        .groupBy("__v")
        .agg(F.min("cnt").alias("cms_count"))
        .select(F.col("__v").alias(value_col), "cms_count")
        .orderBy(F.col("cms_count").desc(), value_col)
        .limit(k)
    )


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 b: int = 8) -> DataFrame:
    """Deterministic HyperLogLog (Flajolet et al. 2007): per group, the
    raw HLL cardinality estimate from ``m = 2^b`` registers — the
    fixed-size counterpart to :func:`kmv_distinct` (whose sketch degrades
    to the full hash set below k).  An HLL sketch is O(m) forever,
    merges by per-register MAX (the property that makes it the standard
    distributed/streaming distinct counter), and — unlike Spark's
    ``approx_count_distinct``, whose HLL++ register layout is
    engine-private — this one is a pure function of the data through
    md5, so any engine reproduces it bit-for-bit and the whole sketch is
    SQL-oracle-checkable.

    Determinism of the float path: each register holds rank
    ``M[j] in [1, 61-b]`` (the md5 prefix gives 60 hash bits, b index
    the register, the remaining ``width = 60-b`` feed the rank); the
    harmonic sum is computed EXACTLY as integer units at scale
    ``2^maxr`` where ``maxr = width+1``:
    ``sum(1 << (maxr - M[j])) + V * (1 << maxr)`` (<= 2^61, fits
    int64 — V is the count of never-hit registers, rank 0), and the
    estimate is ONE int64->double cast and ONE division of the
    precomputed ``alpha_m * m^2 * 2^maxr`` literal — both IEEE-exact
    operations, so the estimate is engine-portable without ever
    summing floats.  The small-range (linear counting) and large-range
    corrections need ``ln``, which is NOT correctly-rounded across
    engines — they are deliberately left to the caller, who gets
    ``zero_registers`` (V) and ``harmonic_units`` to apply either
    correction with the ln of their choice.

    Plan shape: distinct on (group, value) -> md5 once per distinct
    value -> partial/final MAX agg over (group, register) -> final agg
    over group.  The shuffle carries at most m rows per group; the
    distinct is the same value-space collapse kmv_distinct documents.

    Standard error of the raw estimate ~ 1.04/sqrt(m): b=8 -> ~6.5%.
    """
    if not 7 <= b <= 14:
        # alpha below is Flajolet's m >= 128 constant; above 2^14
        # registers the 60-bit hash budget starts starving the rank field
        raise ValueError("b must be in [7, 14]")
    m = 1 << b
    width = 60 - b          # hash bits left for the rank after indexing
    maxr = width + 1        # rank of w == 0 (all rank bits zero)
    # alpha_m for m >= 128 (Flajolet's table); the m^2 * 2^maxr factor is
    # folded into one Python-computed double literal so both engines
    # divide the identical constant (unit scale = 2^maxr: a zero register
    # contributes 2^-0 -> 1 << maxr, a rank-M register 1 << (maxr - M);
    # total <= 2^b * 2^(61-b) = 2^61, always inside int64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    numer = alpha * float(m) * float(m) * float(1 << maxr)
    h = _md5_60bit(F.col("__v"))
    w = F.expr(f"__h div {m}")          # remaining width hash bits
    # rank = position of the first 1-bit of w within its width-bit field
    # = width - bit_length(w) + 1, and maxr when w = 0: conv(w, 10, 2) is
    # the unpadded binary string, so its length IS bit_length(w) — no
    # log2 (last-ulp engine drift) anywhere
    rank = (F.when(F.col("__w") == 0, F.lit(maxr))
            .otherwise(F.lit(maxr) - F.length(F.conv(
                F.col("__w").cast("string"), 10, 2))))
    regs = (
        _distinct_values(df, group_cols, value_col)
        .select(*group_cols, h.alias("__h"))
        .select(*group_cols, F.pmod(F.col("__h"), F.lit(m)).alias("__j"),
                w.alias("__w"))
        .select(*group_cols, "__j", rank.alias("__rank"))
        .groupBy(*group_cols, "__j")
        .agg(F.max("__rank").alias("__m"))
    )
    return (
        regs.groupBy(*group_cols)
        .agg(
            F.sum(F.expr(f"shiftleft(1L, {maxr} - __m)"))
            .alias("__units_hit"),
            F.count(F.lit(1)).alias("__nreg"),
        )
        .select(
            *group_cols,
            (F.lit(m) - F.col("__nreg")).cast("int").alias("zero_registers"),
            (F.col("__units_hit")
             + (F.lit(m) - F.col("__nreg")) * F.lit(1 << maxr))
            .alias("harmonic_units"),
        )
        .select(
            *group_cols, "zero_registers", "harmonic_units",
            (F.lit(numer) / F.col("harmonic_units").cast("double"))
            .alias("est_hll"),
        )
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, value_col: str,
                k: int = 256) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations"): estimate
    ``|A|``, ``|B|``, ``|A ∪ B|``, Jaccard, and ``|A ∩ B|`` from two
    bottom-k sketches — the audit primitive for corpus overlap questions
    ("how much does crawl B add over crawl A?", "what fraction of
    purchase users are view users?") that exact distinct-joins answer at
    full shuffle cost.

    Method: both sides hash distinct values through the shared
    ``_md5_60bit`` layout (so the sketches are mergeable with
    ``kmv_distinct``'s and the whole family cross-checks); the union
    sketch is the k smallest of the two sketches' hash union; with
    ``K = {h in union sketch : h in sketch_A and h in sketch_B}``,
    Jaccard ``ρ = |K| / |union sketch|`` and
    ``|A ∩ B| = ρ · est(A ∪ B)``.  When the union holds fewer than k
    hashes every estimate is EXACT (the sketches are the full hash sets).

    Deterministic on any engine: md5 uniforms, bottom-k by hash order,
    single-division ratios — the SQL oracle replays it bit-for-bit.

    Scale shape: each side pays one distinct + a TakeOrdered bottom-k
    (per-partition heaps — k rows cross the wire per side, NEVER the
    value sets); everything after operates on <= 2k rows.  No window
    over the data, no single-partition exchange of input rows.

    Returns ONE row: (est_distinct_a, est_distinct_b, est_union,
    jaccard, est_intersection, sketch_k int).
    """
    if k < 2:
        raise ValueError("k must be >= 2")

    def _bottom_k(df: DataFrame) -> DataFrame:
        h = ((_md5_60bit(F.col("__v")) + F.lit(1)).cast("double")
             / F.lit(float(16 ** 15)))
        return (
            _distinct_values(df, [], value_col)
            .select(h.alias("__h")).distinct()
            .orderBy("__h").limit(k)  # TakeOrdered: per-partition heaps
        )
    ka, kb = _bottom_k(a), _bottom_k(b)

    def _est(cnt: Column, hk: Column) -> Column:
        return F.when(cnt < k, cnt.cast("double")) \
            .otherwise(F.lit(float(k - 1)) / hk)

    sa = ka.agg(F.count(F.lit(1)).alias("__na"), F.max("__h").alias("__ha"))
    sb = kb.agg(F.count(F.lit(1)).alias("__nb"), F.max("__h").alias("__hb"))
    both = ka.join(kb, "__h", "inner").select("__h")  # <=k rows each side
    union_k = ka.unionByName(kb).distinct().orderBy("__h").limit(k)
    su = (
        union_k.join(F.broadcast(both.withColumn("__in_both", F.lit(1))),
                     "__h", "left")
        .agg(
            F.count(F.lit(1)).alias("__nu"),
            F.max("__h").alias("__hu"),
            F.sum(F.coalesce(F.col("__in_both"), F.lit(0)))
            .cast("long").alias("__nk"),
        )
    )
    est_u = _est(F.col("__nu"), F.col("__hu"))
    # try_divide: an empty union sketch (both inputs empty) yields NULL
    # here exactly as the oracle's NULL-on-zero division, instead of
    # Spark's IEEE NaN
    jacc = F.try_divide(F.col("__nk").cast("double"),
                        F.col("__nu").cast("double"))
    return (
        su.join(F.broadcast(sa)).join(F.broadcast(sb))  # three 1-row sides
        .select(
            _est(F.col("__na"), F.col("__ha")).alias("est_distinct_a"),
            _est(F.col("__nb"), F.col("__hb")).alias("est_distinct_b"),
            est_u.alias("est_union"),
            jacc.alias("jaccard"),
            (jacc * est_u).alias("est_intersection"),
            F.col("__nu").cast("int").alias("sketch_k"),
        )
    )
