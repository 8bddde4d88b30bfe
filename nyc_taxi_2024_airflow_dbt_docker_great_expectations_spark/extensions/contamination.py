"""Benchmark decontamination: flag training documents sharing word n-grams
with an evaluation/benchmark set.

The GPT-3-style decontamination check: any training document that shares at
least one long word n-gram (13-gram in the paper; configurable here) with a
benchmark document is flagged, with the collision count and the share of the
document's n-grams that collide — enough signal for both hard-drop and
soft-review policies downstream.

Scale shape (100 TB train, MB-scale benchmark): the benchmark n-gram set is
tiny by construction — distinct-ed and broadcast, so the check is one
map-side semi-join over the training corpus's exploded n-gram postings plus
one partial+final aggregate per doc.  No shuffle of the training corpus
beyond the posting aggregate; the corpus never materializes its n-grams as
arrays (posting rows stream out of whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import shingle_postings


def ngram_contamination(train: DataFrame, benchmark: DataFrame, n: int = 13,
                        text_col: str = "text", id_col: str = "doc_id",
                        broadcast_benchmark: bool = True) -> DataFrame:
    """Per contaminated training doc: (id, n_hits, n_shingles, hit_ratio).

    ``n_hits`` counts the doc's distinct n-grams that appear anywhere in the
    benchmark; ``hit_ratio`` = n_hits / n_shingles.  Docs with zero hits are
    omitted (at scale the clean set is the overwhelming majority — emitting
    it would be a full-corpus join output).  ``broadcast_benchmark`` is the
    default because benchmark suites are small; pass ``False`` if yours is
    not and let the n-gram join shuffle-partition.
    """
    train_posts = shingle_postings(train, text_col, id_col, k=n)
    bench_grams = (
        shingle_postings(benchmark, text_col, id_col, k=n)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    per_doc = train_posts.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")  # postings are distinct per doc
    )
    hits = (
        train_posts.join(bench_grams, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.join(per_doc, id_col)
        .select(
            id_col,
            "n_hits",
            "n_shingles",
            (F.col("n_hits").cast("double")
             / F.col("n_shingles").cast("double")).alias("hit_ratio"),
        )
    )
