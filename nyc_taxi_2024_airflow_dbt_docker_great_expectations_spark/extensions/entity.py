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
prefix) fan out exactly like any hot join key — the salting/AQE machinery
in operators/layout.py applies unchanged.
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


def fuzzy_match_pairs(df: DataFrame, id_col: str, text_col: str,
                      max_dist: int = 1) -> DataFrame:
    """All pairs (id_a < id_b) whose ``text_col`` values are within
    ``max_dist`` Levenshtein edits — exact result, sub-quadratic plan.

    Returns (id_a, id_b, text_a, text_b, dist).
    """
    keyed = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__txt"),
        F.explode(deletion_variants(text_col, max_dist)).alias("__variant"),
    )
    a = keyed.select(F.col("__id").alias("id_a"), F.col("__txt").alias("text_a"),
                     "__variant")
    b = keyed.select(F.col("__id").alias("id_b"), F.col("__txt").alias("text_b"),
                     "__variant")
    cand = (
        a.join(b, "__variant")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()  # a pair can share several deletion variants
    )
    return (
        cand.withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
    )
