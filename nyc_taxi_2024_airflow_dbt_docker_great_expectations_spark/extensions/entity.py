"""Fuzzy entity matching (record linkage) via symmetric-delete blocking.

Dirty dimensions carry near-identical keys — typo'd customer names, OCR'd
vendor strings — and resolving them is an edit-distance self-join.  The
naive form is O(n^2) ``levenshtein`` comparisons: 10^16 pairs at 100 TB.

The scale path is the FastSS / SymSpell symmetric-delete scheme (Bocek et
al. 2007, "Fast Similarity Search in Large Dictionaries"): for edit
distance <= d, two strings can only match if deleting <= d characters from
EACH yields a common variant.  So every string emits its deletion
neighborhood (all substrings with <= d single-character deletions — O(L^d)
keys, not a similarity-destroying hash), candidates come from an equi-join
on the variant key, and an exact ``levenshtein`` verify keeps only true
pairs.  Completeness is a theorem, not a heuristic: the candidate set
provably contains every pair with ed <= d, which is why the brute-force
SQL oracle matches exactly.

Both engines implement the same classic unit-cost Levenshtein DP, so the
verify predicate is engine-portable.

Plan shape: explode (fan-out L+1 keys per row at d=1) -> shuffle on the
variant key (posting lists) -> within-key pair join -> codegen'd
``levenshtein`` verify.  Skewed variant keys (e.g. a shared template
prefix shared by millions of rows) are the 100x hazard: a posting list of
length n produces n^2 pairs IN ONE REDUCER.  ``fuzzy_match_pairs``
therefore splits hot keys (posting length > ``skew_threshold``) over a
triangular sub-block grid — the same exact-and-balanced geometry as the
embedding block-grid GEMM (similarity.py:_blas_candidate_pairs): each side
replicates at most ``grid`` times, every unordered pair lands in exactly
one (variant, cell) reducer, and per-reducer pair count drops from n^2 to
(n/grid)^2.  Cold keys skip the grid entirely (no replication overhead);
the union of both candidate sets is provably the same pair set, so the
brute-force SQL oracle still matches exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def deletion_variants(col: Column | str, max_deletes: int = 1) -> Column:
    """Array of distinct strings reachable from ``col`` by 0..max_deletes
    single-character deletions (the symmetric-delete neighborhood)."""
    c = F.col(col) if isinstance(col, str) else col
    if max_deletes not in (1, 2):
        raise ValueError(f"max_deletes must be 1 or 2, got {max_deletes}")

    def _del_once(s: Column) -> Column:
        # all single-deletion variants of s: concat(prefix i-1, suffix i+1)
        return F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1),
                s.substr(i + 1, F.length(s)),
            ),
        )

    once = _del_once(c)
    variants = F.concat(F.array(c), once)
    if max_deletes == 2:
        twice = F.flatten(F.transform(once, _del_once))
        variants = F.concat(variants, twice)
    return F.array_distinct(variants)


def _grid_pair_rows(hot: DataFrame, grid: int) -> DataFrame:
    """Raw candidate rows for HOT variant keys via a triangular sub-block
    grid: rows hash into ``grid`` blocks per variant; block *p* replicates
    as the LEFT side of cells (p, j>=p) and the RIGHT side of cells
    (i<=p, p), and the join key becomes (variant, cell).  Every unordered
    pair shares exactly one cell (diagonal cells see both orientations —
    collapsed by the caller's normalize+distinct), so the result is exact
    while no reducer sees more than one cell's (n/grid)^2 pairs.

    Returned un-normalized (id_a/id_b in grid orientation) so tests can
    assert the partition-balance property on the join output itself.
    """
    p = F.pmod(F.xxhash64(F.col("__id").cast("string")), F.lit(grid)).cast("int")
    base = hot.withColumn("__p", p)
    seq = F.sequence(F.lit(0), F.lit(grid - 1))
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__txt").alias("text_a"),
        "__variant",
        F.explode(
            F.transform(
                F.filter(seq, lambda j: j >= F.col("__p")),
                lambda j: F.col("__p") * grid + j,
            )
        ).alias("__cell"),
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__txt").alias("text_b"),
        "__variant",
        F.explode(
            F.transform(
                F.filter(seq, lambda i: i <= F.col("__p")),
                lambda i: i * grid + F.col("__p"),
            )
        ).alias("__cell"),
    )
    return (
        a.join(b, ["__variant", "__cell"])
        .filter(F.col("id_a") != F.col("id_b"))
    )


def fuzzy_match_pairs(df: DataFrame, id_col: str, text_col: str,
                      max_dist: int = 1, skew_threshold: int = 64,
                      grid: int = 8,
                      no_copies: bool | None = None) -> DataFrame:
    """All pairs (id_a < id_b) whose ``text_col`` values are within
    ``max_dist`` Levenshtein edits — exact result, sub-quadratic plan.

    Variant keys whose posting list exceeds ``skew_threshold`` rows go
    through the triangular grid split (see module docstring) so a hot
    template key cannot serialize one reducer; cold keys pair up directly
    with no replication.  The posting-length census is a whole-partition
    window over the variant-key shuffle the pair join needs anyway — no
    separate aggregate or join.  Returns (id_a, id_b, text_a, text_b,
    dist).

    **Multiplicity collapse**: exact-duplicate strings (a group of c
    verbatim copies) would inflate every posting list c-fold and the pair
    mass c^2-fold while every such pair verifies to the same distance.
    The variant/pair engine therefore runs over DISTINCT strings (rep id
    = min member id, one shuffle on the string), each duplicate group
    additionally emitting a dist-0 self marker (levenshtein(t, t) = 0 by
    definition), and member-expansion joins fan the rep pairs back out to
    id-level — byte-identical output, but the edit-distance work and the
    candidate ``distinct()`` are paid per distinct STRING pair, and the
    expansion is output-sized (irreducible).
    """
    from pyspark.sql import Window

    from ..execution import has_verbatim_copies, materialize_once, rep_tags

    # NULL strings match nothing (the old explode-of-NULL path dropped
    # them; grouping NULLs would resurrect them as a bogus group) — drop
    # them up front.  ONE window exchange on the string tags rep + count
    # AND yields the member map — no second full-corpus join on the text
    # key to rebuild it.  On a corpus with NO verbatim copies that window
    # and the member expansion are identity maps, so a cheap hash-count
    # guard skips the collapse machinery entirely.
    # `no_copies` lets a caller who has already established (and memoized)
    # the corpus's duplicate-free status skip the per-call guard job
    src = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__mid"), F.col(text_col).alias("__txt"),
    )
    if (not no_copies if no_copies is not None
            else has_verbatim_copies(src, "__txt")):
        tagged = materialize_once(rep_tags(src, "__txt", "__mid"))
        reps = tagged.filter(F.col("__mid") == F.col("__rep")).select(
            F.col("__txt"), F.col("__mid").alias("__id"), "__mult"
        )
    else:
        tagged = None
        reps = src.select(
            F.col("__txt"), F.col("__mid").alias("__id"),
            F.lit(1).cast("long").alias("__mult"),
        )
    keyed = reps.select(
        "__id", "__txt",
        F.explode(deletion_variants("__txt", max_dist)).alias("__variant"),
    )
    # posting length via a whole-partition window: ONE exchange on the
    # variant key, not a separate aggregate + join back (which pushes the
    # posting mass through a second full exchange).  A hot key does buffer
    # its whole posting list in one window task — but that is O(n) rows,
    # linear and spillable; the catastrophe the grid split below prevents
    # is the O(n^2) PAIR mass, which never concentrates.
    k2 = keyed.withColumn(
        "__vn", F.count(F.lit(1)).over(Window.partitionBy("__variant"))
    )
    cold = k2.filter(F.col("__vn") <= skew_threshold).drop("__vn")
    hot = k2.filter(F.col("__vn") > skew_threshold).drop("__vn")

    a = cold.select(F.col("__id").alias("id_a"), F.col("__txt").alias("text_a"),
                    "__variant")
    b = cold.select(F.col("__id").alias("id_b"), F.col("__txt").alias("text_b"),
                    "__variant")
    cand_cold = (
        a.join(b, "__variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
    )
    g = _grid_pair_rows(hot, grid)
    # normalize grid orientation to id_a < id_b (diagonal cells emit both
    # orientations; off-diagonal cells emit an arbitrary one)
    flip = F.col("id_a") > F.col("id_b")
    cand_hot = g.select(
        F.when(flip, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
        F.when(flip, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
        F.when(flip, F.col("text_b")).otherwise(F.col("text_a")).alias("text_a"),
        F.when(flip, F.col("text_a")).otherwise(F.col("text_b")).alias("text_b"),
    )
    cand = (
        cand_cold.unionByName(cand_hot)
        # a pair can share several deletion variants (and a hot pair both
        # diagonal orientations)
        .distinct()
    )
    rep_pairs = (
        cand.withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
    )
    if tagged is None:  # no duplicate groups: rep pairs ARE the id pairs
        return rep_pairs.select("id_a", "id_b", "text_a", "text_b", "dist")
    # duplicate-group self markers: every unordered member pair of a group
    # of identical strings matches at distance 0
    self_pairs = reps.filter(F.col("__mult") > 1).select(
        F.col("__id").alias("id_a"), F.col("__id").alias("id_b"),
        F.col("__txt").alias("text_a"), F.col("__txt").alias("text_b"),
        F.lit(0).alias("dist"),
    )
    memb = tagged.select(F.col("__rep"), F.col("__mid").alias("__member"))
    ma = memb.withColumnRenamed("__rep", "id_a").withColumnRenamed(
        "__member", "__ma")
    mb = memb.withColumnRenamed("__rep", "id_b").withColumnRenamed(
        "__member", "__mb")
    expanded = (
        rep_pairs.unionByName(self_pairs)
        .join(ma, "id_a").join(mb, "id_b")
        # self markers expand to each unordered member pair once; cross
        # pairs to the full bipartite product (member id sets disjoint)
        .filter((F.col("id_a") != F.col("id_b"))
                | (F.col("__ma") < F.col("__mb")))
    )
    flip = F.col("__ma") > F.col("__mb")
    return expanded.select(
        F.least("__ma", "__mb").alias("id_a"),
        F.greatest("__ma", "__mb").alias("id_b"),
        F.when(flip, F.col("text_b")).otherwise(F.col("text_a")).alias("text_a"),
        F.when(flip, F.col("text_a")).otherwise(F.col("text_b")).alias("text_b"),
        "dist",
    )
