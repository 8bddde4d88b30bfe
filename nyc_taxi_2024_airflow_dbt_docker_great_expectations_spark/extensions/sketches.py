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

from pyspark.sql import DataFrame, Window, functions as F


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
    h = (
        F.conv(F.substring(F.md5(F.col("__v").cast("string")), 1, 15),
               16, 10).cast("long")
        + F.lit(1)
    ).cast("double") / F.lit(float(16 ** 15))
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col).alias("__v"))
        .distinct()
        .select(*group_cols, h.alias("__h"))
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
