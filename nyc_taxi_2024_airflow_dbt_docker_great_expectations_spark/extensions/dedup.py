"""Deduplication operators for training-data pipelines.

Four strategies, all shuffle-conscious and driver-collect-free:

- **Exact** (``exact_dedup_keys``): hash-groupBy on a content digest.  One
  shuffle on the digest; at 100 TB this is the cheapest possible dedup and
  the digest doubles as the canonical document key.
- **n-gram Jaccard** (``ngram_jaccard_pairs``): exact set similarity via an
  inverted-index self-join — explode distinct shingles, join postings on the
  shingle, count co-occurrences per pair, ``J = inter / (|A|+|B|-inter)``.
  Scales as the posting-list volume, not |docs|^2; at 100 TB you'd drop the
  most frequent shingles first (df-cut), exactly like a search engine.
- **MinHash + LSH** (``minhash_signatures`` / ``minhash_lsh_pairs``):
  md5-seeded k-permutation signatures, banded into buckets; only documents
  sharing a band bucket are candidates, then candidates are verified with
  the exact Jaccard.  This is the sub-quadratic scale path: candidate count
  is tunable via (bands, rows-per-band) to target a similarity threshold.
- **SimHash** (``simhash_pairs``): 32-bit parity simhash over token md5s,
  banded into 4-bit chunks for candidate generation, Hamming-verified.

Every step is deterministic (md5-derived hashes, no RNG) so each operator is
oracle-checkable in SQL.

All pairwise engines and persisted indexes here are **multiplicity-
collapsed**: verbatim copies (identical shingle array / signature) collapse
to one rep before the quadratic candidate/verify stage and member joins
expand rep pairs back to id-level afterwards — byte-identical output, but
a c-deep duplicate cluster costs one row instead of c^2 through the join.
On a boilerplate-heavy web corpus (30-50% exact-duplicate mass is typical)
this is the difference between the LSH/PPJoin machinery scaling with
distinct content and scaling with raw crawl volume squared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..execution import expand_member_pairs, materialize_once, rep_tags
from .text import (
    positional_shingles,
    shingle_postings,
    shingled_arrays,
    token_count,
    tokens,
    word_shingles,
)


def exact_dedup_keys(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 digest of normalized text -> canonical (min) id +
    multiplicity.  Survivors are rows where ``doc_id == canonical_id``."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "\\s+", " "))
    return (
        df.select(F.col(id_col), F.md5(norm).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _pair_jaccard(shingled: DataFrame, id_col: str) -> DataFrame:
    """Inverted-index pair similarity from (id, shingles array) rows."""
    sized = shingled.select(
        F.col(id_col), F.col("shingles"), F.size("shingles").alias("n_sh")
    )
    postings = sized.select(
        F.col(id_col), F.col("n_sh"), F.explode("shingles").alias("shingle")
    )
    a = postings.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = postings.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return pairs.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
        ).alias("jaccard"),
    )


def _tagged_or_raise(raw: DataFrame, what: str) -> bool:
    """Is ``raw`` a pre-tagged persisted table (carries the multiplicity-
    collapse columns)?  ``__rep`` without ``__mult`` (e.g. a table built
    with ``rep_tags(..., with_mult=False)``) would otherwise fail with an
    AnalysisException deep in the plan — raise a clear contract error at
    the boundary instead."""
    has_rep, has_mult = "__rep" in raw.columns, "__mult" in raw.columns
    if has_rep and not has_mult:
        raise ValueError(
            f"pre-tagged {what} table carries __rep but not __mult — the "
            "pair engines need both (rebuild the table with rep_tags(..., "
            "with_mult=True))"
        )
    return has_rep


def _dropped_by_shingling(text_col: str, k: int) -> Column:
    """Corpus rows a shingle-derived artifact legitimately lacks:
    shingled_arrays drops <k-token docs (text.py docstring), and NULL
    text never produces a token row at all."""
    return F.col(text_col).isNull() | (token_count(F.col(text_col)) < k)


def _check_no_ghost_ids(corpus: DataFrame, table: DataFrame, id_col: str,
                        what: str, legit_missing: Column | None = None,
                        ) -> None:
    """A persisted warehouse artifact substituted for an in-flight pass
    must agree with the corpus on the id set in BOTH directions: extra
    table ids (corpus shrank / wrong table) would emit pairs for
    documents that no longer exist, and missing corpus ids (corpus GREW
    past the table) would silently emit NO pairs for the new documents —
    the most common staleness case.  ONE early-abort job (full-outer id
    join, ids + one boolean on the wire).

    ``legit_missing`` excuses documented absences the artifact's own
    build filter creates (e.g. shingle tables drop <k-token docs): a
    corpus-row predicate; rows where it holds may be absent from the
    table.  Hyperparameter drift is refused at adoption time by the
    _table_meta.json sidecar (operators/layout.py)."""
    skip = (F.coalesce(legit_missing, F.lit(False))
            if legit_missing is not None else F.lit(False))
    c = corpus.select(F.col(id_col).alias("__id"), skip.alias("__skip"),
                      F.lit(1).alias("__c"))
    t = (table.select(F.col(id_col).alias("__id")).distinct()
         .withColumn("__t", F.lit(1)))
    bad = (
        c.join(t, "__id", "full_outer")
        .filter(F.col("__c").isNull()
                | (F.col("__t").isNull() & ~F.col("__skip")))
        .select("__id", F.col("__c").isNull().alias("__ghost"))
        .limit(1).collect()
    )
    if bad:
        direction = (
            "carries ids absent from the corpus" if bad[0]["__ghost"]
            else "is missing corpus ids (corpus grew past the table?)"
        )
        raise ValueError(
            f"persisted {what} table {direction} (stale table?) — "
            "rebuild it from the current documents"
        )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.6,
                        prefix_filter: bool = True,
                        max_df: int | None = None,
                        shingled: DataFrame | None = None,
                        tables_checked: bool = False) -> DataFrame:
    """Exact word-k-gram Jaccard near-dup pairs above ``threshold``.

    With ``prefix_filter`` (default), applies PPJoin-style **prefix
    filtering**: shingles are globally ordered by (document frequency,
    shingle) and only each document's first ``n - ceil(t*n) + 1`` shingles
    are indexed.  If J(A,B) >= t, the rarest common shingle provably falls in
    both prefixes, so joining prefix postings loses no true pair — while the
    frequent shingles that cause the quadratic posting-list blowup never
    enter the join.  A length filter (|A| and |B| within a factor t of each
    other, another J >= t invariant) prunes further.  Candidates are then
    verified with the exact set intersection, so the result is IDENTICAL to
    the naive inverted-index join — this is the difference between an exact
    similarity self-join that dies on a common-vocabulary corpus at 100 TB
    and one that scales with the rare-token posting mass.

    ``max_df`` (requires ``prefix_filter``) is the search-engine df-cut:
    shingles occurring in more than ``max_df`` documents are dropped from
    the *index* before prefix selection (never from the verify sets).  On a
    common-vocabulary corpus this caps the largest posting lists — the
    quadratic term prefix filtering alone cannot bound when even the
    *rarest* shingle of a stop-word-only document is frequent.  Unlike the
    pure prefix filter it can lose recall: a true pair whose common shingles
    are ALL above the cut produces no candidate.  Pick the cut from the df
    histogram (e.g. 99.9th percentile) so only stop-word-grade shingles are
    dropped; ``tests/test_extensions.py`` shows a safe cut leaving the pair
    set identical.
    """
    from pyspark.sql import Window

    if max_df is not None and not prefix_filter:
        raise ValueError("max_df is an index-side cut; requires prefix_filter=True")

    if not prefix_filter:
        shingled = df.select(
            F.col(id_col), word_shingles(text_col, k).alias("shingles")
        ).filter(F.size("shingles") > 0)
        return _pair_jaccard(shingled, id_col).filter(
            F.col("jaccard") >= threshold
        )

    # the shingled base feeds three plan branches (postings + both verify
    # sides); materialize it once or the tokenize/window/collect_set pass
    # re-executes per branch (materialize_once(storage="disk") at 100 TB).
    # Callers running several shingle consumers over the same corpus (e.g.
    # lsh_recall) pass their own materialized base via ``shingled``.
    raw = (shingled if shingled is not None
           else materialize_once(shingled_arrays(df, text_col, id_col, k)))
    # **Multiplicity collapse**: verbatim document copies share one shingle
    # array, inflate every posting list c-fold and the candidate/verify pair
    # mass c^2-fold, yet every such pair has Jaccard exactly 1.  ONE window
    # exchange on the array key tags each row with its group rep (min id)
    # and multiplicity; the PPJoin engine then runs over distinct arrays
    # only, duplicate groups emit a J=1 self marker, and member-expansion
    # joins fan rep pairs back to id-level — byte-identical to the
    # uncollapsed output (prefix completeness holds under ANY consistent
    # global shingle order, and the verify phase is exact, so ranking df
    # over distinct arrays changes candidates but never the result).
    # A ``shingled`` table that already carries __rep/__mult (a persisted
    # pre-tagged corpus table) skips the window entirely; a stale table's
    # ghost ids are refused up front unless the caller already validated
    # this session (``tables_checked``).
    if shingled is not None and not tables_checked:
        _check_no_ghost_ids(df, raw, id_col, "shingle",
                            legit_missing=_dropped_by_shingling(text_col, k))
    tagged = raw if _tagged_or_raise(raw, "shingle") else materialize_once(
        rep_tags(raw.select(F.col(id_col), F.col("shingles")),
                 "shingles", id_col)
    )
    base = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles", "__mult"
    )
    posts = base.select(
        F.col(id_col), F.col("__mult"), F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    # document frequency via a whole-partition window — ONE exchange of the
    # posting mass on the shingle key, not aggregate + join back (two).  A
    # stop-word-grade shingle buffers its postings in one window task, but
    # that is O(df) rows, linear and spillable (and exactly what ``max_df``
    # caps); the quadratic candidate mass is bounded by the prefix filter.
    # df counts DOCUMENTS — each rep posting weighs its copy count — so
    # ``max_df`` keeps its documented meaning under the collapse.
    ranked = posts.withColumn(
        "df_cnt", F.sum("__mult").over(Window.partitionBy("shingle"))
    )
    if max_df is not None:
        # df-cut BEFORE ranking: frequent shingles never enter the index, so
        # the prefix is drawn from the surviving (rarer) shingles only.
        # n_sh stays the full set size — the length filter and the verify
        # phase are unaffected by the cut.
        ranked = ranked.filter(F.col("df_cnt") <= max_df)
    ranked = ranked.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy("df_cnt", "shingle")
        ),
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        id_col, "n_sh", "shingle"
    )

    pa = prefix.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"),
                       "shingle")
    pb = prefix.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"),
                       "shingle")
    candidates = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: J >= t forces t <= |A|/|B| <= 1/t
            & (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("id_a", "id_b")
        .distinct()
    )

    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    rep_pairs = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", n_inter.cast("double") / n_union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if threshold <= 1.0:
        # duplicate-group self markers: identical non-empty shingle sets
        # have Jaccard exactly 1 (n/n in IEEE); empty sets never paired in
        # the uncollapsed engine (no postings) and must not here either
        selfs = base.filter((F.col("__mult") > 1) & (F.size("shingles") > 0))
        if max_df is not None:
            # the uncollapsed engine finds a duplicate pair only if >= 1 of
            # the group's shingles survives the df-cut into the index (the
            # documented recall loss); gate the markers identically
            selfs = selfs.join(
                ranked.select(id_col).distinct(), id_col, "left_semi"
            )
        rep_pairs = rep_pairs.unionByName(
            selfs.select(
                F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
    return expand_member_pairs(
        rep_pairs, tagged.select("__rep", F.col(id_col).alias("__member")),
        ["jaccard"],
    )


def ngram_containment_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 3,
                            threshold: float = 0.9,
                            shingled: DataFrame | None = None,
                            tables_checked: bool = False) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs: ``|A∩B| / min(|A|, |B|) >=
    threshold`` over distinct word-``k``-gram sets — the inclusion/quote
    detector Jaccard structurally misses (a short document fully embedded
    in a long one has containment 1.0 but Jaccard ~ |A|/|B|).  Returns
    ``(id_a, id_b, containment)``, ``id_a < id_b``.

    Engine shape: the exact inverted-index baseline — posting self-join
    on the shingle key (bucket-local when served from the persisted
    shingle table), intersection counts from ONE partial/final aggregate,
    a single double division against the threshold.  PPJoin prefix
    filtering does NOT soundly apply to containment (the larger side's
    required-overlap bound depends on the unknown smaller side's size),
    so this is the correctness baseline; at web scale, generate
    candidates with the MinHash bands and verify with this formula.

    **Multiplicity collapse**: verbatim copies have containment exactly
    1.0; reps carry the posting/verify work, dup groups emit a 1.0 self
    marker, member joins expand — same contract as every pair engine
    here (byte-identical to the uncollapsed form)."""
    raw = (shingled if shingled is not None
           else materialize_once(shingled_arrays(df, text_col, id_col, k)))
    if shingled is not None and not tables_checked:
        _check_no_ghost_ids(df, raw, id_col, "shingle",
                            legit_missing=_dropped_by_shingling(text_col, k))
    tagged = raw if _tagged_or_raise(raw, "shingle") else materialize_once(
        rep_tags(raw.select(F.col(id_col), F.col("shingles")),
                 "shingles", id_col)
    )
    base = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles", "__mult"
    )
    posts = base.select(
        F.col(id_col), F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    a = posts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"),
                     "shingle")
    b = posts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"),
                     "shingle")
    rep_pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
        .withColumn(
            "containment",
            F.col("n_inter").cast("double")
            / F.least("n_a", "n_b").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )
    # duplicate-group self markers: identical non-empty sets contain each
    # other exactly (n/n in IEEE); empty sets never enter the posting join
    rep_pairs = rep_pairs.unionByName(
        base.filter((F.col("__mult") > 1) & (F.size("shingles") > 0)).select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
            F.lit(1.0).alias("containment"),
        )
    )
    return expand_member_pairs(
        rep_pairs, tagged.select("__rep", F.col(id_col).alias("__member")),
        ["containment"],
    )


def ngram_jaccard_pairs_vs(new: DataFrame, corpus: DataFrame,
                           text_col: str = "text", id_col: str = "doc_id",
                           k: int = 3, threshold: float = 0.6,
                           max_df: int | None = None) -> DataFrame:
    """Cross-corpus near-dup screening: every (new_id, corpus_id) pair with
    word-k-gram Jaccard >= ``threshold`` — the continuous-ingest dedup
    step ("is this incoming batch already in the corpus?"), where the
    self-join form would wastefully re-pair the corpus against itself.

    Same PPJoin machinery as :func:`ngram_jaccard_pairs` — the two sides
    union with a side tag, ONE prefix index is built over the COMBINED
    document frequency (the prefix theorem needs a single global shingle
    order, so per-side indexing would lose recall), and candidates keep
    only cross-side pairs.  Exact: candidates verify with the full set
    intersection, so the result equals the brute-force cross join.  Returns
    (new_id, corpus_id, jaccard).

    Multiplicity collapse is per (side, shingle array): verbatim copies
    WITHIN a side collapse to one rep before the prefix/candidate/verify
    machinery and member joins expand the rep pairs back out (a new doc
    identical to a corpus doc stays a cross-side rep pair with J = 1 —
    never merged).  Byte-identical output; the pair mass is paid per
    distinct cross-side content pair.
    """
    from pyspark.sql import Window as W

    side_tagged = new.select(
        F.col(id_col), F.col(text_col), F.lit(0).alias("__side")
    ).unionByName(
        corpus.select(F.col(id_col), F.col(text_col), F.lit(1).alias("__side"))
    )
    shingled = shingled_arrays(
        side_tagged.select(
            # composite key keeps ids unique across sides even when the
            # same document appears in both inputs
            F.concat(F.col("__side").cast("string"), F.lit(":"),
                     F.col(id_col).cast("string")).alias("__uid"),
            text_col,
        ),
        text_col, "__uid", k,
    )
    # rep uid = min member uid within (side, array); the uid's "0:"/"1:"
    # side prefix keeps the window key side-local for free
    tagged = materialize_once(
        rep_tags(shingled.select("__uid", "shingles"),
                 [F.substring("__uid", 1, 2), F.col("shingles")], "__uid")
    )
    base = tagged.filter(F.col("__uid") == F.col("__rep")).select(
        "__uid", "shingles", "__mult"
    )
    posts = base.select(
        "__uid", F.col("__mult"), F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    # df counts DOCUMENTS across both sides (copies weigh their count),
    # keeping max_df's documented meaning under the collapse
    ranked = posts.withColumn(
        "df_cnt", F.sum("__mult").over(W.partitionBy("shingle"))
    )
    if max_df is not None:
        ranked = ranked.filter(F.col("df_cnt") <= max_df)
    ranked = ranked.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("__uid").orderBy("df_cnt", "shingle")),
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    prefix = ranked.filter(F.col("rn") <= prefix_len).select(
        "__uid", "n_sh", "shingle"
    )
    pa = prefix.filter(F.col("__uid").startswith("0:")).select(
        F.col("__uid").alias("__ua"), F.col("n_sh").alias("n_a"), "shingle"
    )
    pb = prefix.filter(F.col("__uid").startswith("1:")).select(
        F.col("__uid").alias("__ub"), F.col("n_sh").alias("n_b"), "shingle"
    )
    candidates = (
        pa.join(pb, "shingle")
        .filter(
            (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("__ua", "__ub")
        .distinct()
    )
    sh_a = base.select(F.col("__uid").alias("__ua"),
                       F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("__uid").alias("__ub"),
                       F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    rep_pairs = (
        candidates.join(sh_a, "__ua")
        .join(sh_b, "__ub")
        .withColumn("jaccard", n_inter.cast("double") / n_union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("__ua", "__ub", "jaccard")
    )
    # expand rep pairs to member level on both sides (cross-side output:
    # every (new member, corpus member) combination), then strip the fixed
    # 2-char "0:"/"1:" side prefix positionally — NOT via
    # substring_index(':'), which would truncate string ids that themselves
    # contain a colon; each side casts back to its OWN id type
    memb = tagged.select("__rep", F.col("__uid").alias("__member"))
    ma = memb.withColumnRenamed("__rep", "__ua").withColumnRenamed(
        "__member", "__na")
    mb = memb.withColumnRenamed("__rep", "__ub").withColumnRenamed(
        "__member", "__nb")
    return (
        rep_pairs.join(ma, "__ua").join(mb, "__ub")
        .select(
            F.expr("substring(__na, 3)")
            .cast(new.schema[id_col].dataType).alias("new_id"),
            F.expr("substring(__nb, 3)")
            .cast(corpus.schema[id_col].dataType).alias("corpus_id"),
            "jaccard",
        )
    )


# --- persisted n-gram index ------------------------------------------------
# The round-3 probe (ngram_jaccard_pairs_vs) re-tokenized the WHOLE corpus on
# every incoming batch.  Real 100 TB ingest amortizes that: the corpus-side
# artifacts are written ONCE as bucketed warehouse tables (the reference's
# incremental-materialization pattern — dbt/nyc_taxi/models/bronze/
# bronze_yellow_tripdata.sql:1-5: build once, merge deltas — applied to the
# extension surface's most expensive artifact), and each batch probes them.
#
# Cross-side prefix filtering stays exact under a DIFFERENT global order than
# the combined-df order the self-contained form uses: the PPJoin prefix
# theorem holds for ANY fixed total order of the shingle universe shared by
# both sides.  Here the order is (corpus df, shingle) with unseen shingles
# at df 0 — the corpus prefixes baked at build time and the batch prefixes
# computed at probe time agree on it, so every J >= t pair still collides in
# the prefix join, and the exact verify keeps the RESULT identical to the
# rebuild form (property-tested in tests/test_extensions.py).

NGRAM_INDEX_TABLES = ("prefix_postings", "shingle_df", "doc_shingles",
                      "doc_members")


def _index_table_names(prefix: str) -> dict[str, str]:
    return {t: f"{prefix}_{t}" for t in NGRAM_INDEX_TABLES}


def build_ngram_index(corpus: DataFrame, table_prefix: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, threshold: float = 0.6,
                      max_df: int | None = None,
                      num_buckets: int = 8) -> dict[str, str]:
    """Tokenize the corpus ONCE and persist the near-dup index as three
    bucketed warehouse tables (``<prefix>_prefix_postings`` bucketed by
    shingle, ``<prefix>_shingle_df`` bucketed by shingle,
    ``<prefix>_doc_shingles`` bucketed by doc id):

    - **prefix_postings** (shingle, doc_id, n_sh): the corpus-side PPJoin
      prefix for the baked ``threshold`` — the only rows the candidate
      join ever touches, bucketed on its join key so repeated probes pay
      no index-side shuffle.
    - **shingle_df** (shingle, df_cnt): full corpus document frequencies —
      the global prefix order probes must replay (their own shingles rank
      by corpus df, unseen ones at 0).
    - **doc_shingles** (doc_id, n_sh, shingles): exact verify sets —
      one row per DISTINCT shingle array (group rep = min member id).
    - **doc_members** (rep_id, doc_id): the multiplicity-collapse
      expansion map — verbatim copies collapse to their rep everywhere
      else in the index (postings, df, verify sets), and probes fan
      matched reps back out to member ids through this table.

    ``threshold`` is a floor baked into the index: probes at the same or
    HIGHER threshold are exact (a higher t needs a shorter prefix — a
    subset of the indexed one); probing lower than the build t would lose
    recall, so :func:`probe_ngram_index` rejects it.  Returns the table
    names.  One tokenize pass + one df window — the same work the
    self-contained operator spends per query, paid once per corpus.
    """
    from pyspark.sql import Window as W

    from ..operators.layout import write_bucketed

    names = _index_table_names(table_prefix)
    # the probe replays the build's tokenization and prefix theorem, so a
    # probe under different hyperparameters is silently wrong (mostly-empty
    # candidates, not an error): record them in the sidecar of every index
    # table and have probe_ngram_index refuse a mismatch.  "collapsed"
    # marks the rep-collapsed layout — pre-collapse dirs fail the props
    # check at adoption time and rebuild cleanly.
    props = {"kind": "ngram_index", "k": k, "threshold": threshold,
             "max_df": max_df, "collapsed": True}
    tagged = materialize_once(
        rep_tags(shingled_arrays(corpus, text_col, id_col, k),
                 "shingles", id_col)
    )
    write_bucketed(
        tagged.select(F.col("__rep").alias("rep_id"),
                      F.col(id_col).alias("member_id")),
        names["doc_members"], ["rep_id"], num_buckets, props=props,
    )
    base = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles", "__mult"
    )
    write_bucketed(
        base.select(id_col, F.size("shingles").alias("n_sh"), "shingles"),
        names["doc_shingles"], [id_col], num_buckets, props=props,
    )
    posts = base.select(
        F.col(id_col), F.col("__mult"), F.size("shingles").alias("n_sh"),
        F.explode("shingles").alias("shingle"),
    )
    # the df window's shingle exchange feeds BOTH the shingle_df write and
    # the prefix ranking — materialize it once instead of re-shuffling the
    # full posting list per consumer.  df counts DOCUMENTS (each rep
    # posting weighs its copy count): the persisted table keeps its
    # documented "full corpus document frequencies" meaning
    ranked = materialize_once(posts.withColumn(
        "df_cnt", F.sum("__mult").over(W.partitionBy("shingle"))
    ))
    write_bucketed(
        ranked.groupBy("shingle").agg(F.first("df_cnt").alias("df_cnt")),
        names["shingle_df"], ["shingle"], num_buckets, props=props,
    )
    if max_df is not None:
        ranked = ranked.filter(F.col("df_cnt") <= max_df)
    ranked = ranked.withColumn(
        "rn",
        F.row_number().over(W.partitionBy(id_col).orderBy("df_cnt", "shingle")),
    )
    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")) + 1
    write_bucketed(
        ranked.filter(F.col("rn") <= prefix_len).select(
            "shingle", id_col, "n_sh"
        ),
        names["prefix_postings"], ["shingle"], num_buckets, props=props,
    )
    return names


def probe_ngram_index(new: DataFrame, table_prefix: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      k: int = 3, threshold: float = 0.6,
                      built_threshold: float | None = None,
                      max_df: int | None = None) -> DataFrame:
    """Screen an incoming batch against a :func:`build_ngram_index` corpus
    WITHOUT touching corpus text: every (new_id, corpus_id, jaccard) with
    word-k-gram Jaccard >= ``threshold``.

    Only the batch is tokenized; the corpus side is three index-table
    scans.  Batch shingles rank by the PERSISTED corpus df (left join on
    the bucketed df table; unseen shingles coalesce to 0 — the same total
    order the build used), the candidate join hits only the bucketed
    prefix postings (no index-side shuffle), and the exact verify joins
    the persisted shingle sets — identical results to the rebuild form
    ``ngram_jaccard_pairs_vs``.  ``k`` and ``max_df`` must match the
    build; ``threshold`` may exceed ``built_threshold`` (defaults to
    equal) but never undercut it.

    The build parameters are validated against the ``_table_meta.json``
    sidecar :func:`build_ngram_index` recorded: a probe whose ``k`` or
    ``max_df`` differs from the build would return plausible-but-wrong
    (mostly empty) candidate sets, so it raises instead.  The recorded
    threshold also supplies ``built_threshold`` when the caller omits it.
    """
    from pyspark.sql import Window as W

    from ..operators.layout import read_table_meta

    spark = new.sparkSession
    names = _index_table_names(table_prefix)
    meta = read_table_meta(spark, names["prefix_postings"])
    if meta is not None and meta.get("props"):
        built = meta["props"]
        for param, got in (("k", k), ("max_df", max_df),
                           ("collapsed", True)):
            if built.get(param) != got:
                raise ValueError(
                    f"ngram index `{table_prefix}` was built with "
                    f"{param}={built.get(param)!r}; probing with {got!r} "
                    "would return wrong candidates — rebuild or match it"
                )
        if built_threshold is None:
            built_threshold = built.get("threshold")
        elif built_threshold != built.get("threshold"):
            raise ValueError(
                f"ngram index `{table_prefix}` was built at threshold "
                f"{built.get('threshold')}, not {built_threshold}"
            )
    if built_threshold is None:
        built_threshold = threshold
    if threshold < built_threshold:
        raise ValueError(
            f"index built at threshold {built_threshold}; probing at "
            f"{threshold} < that would lose recall — rebuild the index"
        )
    postings = spark.table(names["prefix_postings"])
    shingle_df = spark.table(names["shingle_df"])
    doc_shingles = spark.table(names["doc_shingles"])
    members = spark.table(names["doc_members"])
    corpus_id_t = doc_shingles.schema[id_col].dataType

    # multiplicity collapse, both sides: the index stores corpus reps only
    # (expansion map persisted as doc_members); the batch collapses here
    # with one window exchange on its shingle arrays
    ntagged = materialize_once(
        rep_tags(shingled_arrays(new, text_col, id_col, k),
                 "shingles", id_col, with_mult=False)
    )
    base = ntagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles"
    )
    nposts = base.select(
        F.col(id_col).alias("new_id"), F.size("shingles").alias("n_a"),
        F.explode("shingles").alias("shingle"),
    ).join(shingle_df, "shingle", "left").withColumn(
        "df_cnt", F.coalesce(F.col("df_cnt"), F.lit(0).cast("long"))
    )
    if max_df is not None:
        nposts = nposts.filter(F.col("df_cnt") <= max_df)
    nprefix = nposts.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("new_id").orderBy("df_cnt", "shingle")),
    ).filter(
        F.col("rn")
        <= F.col("n_a") - F.ceil(F.lit(threshold) * F.col("n_a")) + 1
    ).select("new_id", "n_a", "shingle")

    candidates = (
        nprefix.join(postings.withColumnRenamed(id_col, "corpus_id")
                     .withColumnRenamed("n_sh", "n_b"), "shingle")
        .filter(
            (F.col("n_b") >= F.ceil(F.lit(threshold) * F.col("n_a")))
            & (F.col("n_a") >= F.ceil(F.lit(threshold) * F.col("n_b")))
        )
        .select("new_id", "corpus_id")
        .distinct()
    )
    sh_a = base.select(F.col(id_col).alias("new_id"),
                       F.col("shingles").alias("sh_a"))
    sh_b = doc_shingles.select(F.col(id_col).alias("corpus_id"),
                               F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    rep_pairs = (
        candidates.join(sh_a, "new_id")
        .join(sh_b, "corpus_id")
        .withColumn("jaccard", n_inter.cast("double") / n_union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )
    # expand rep pairs to member level on both sides (cross-side output:
    # every (new member, corpus member) combination, no ordering filter)
    nmemb = ntagged.select(F.col("__rep").alias("new_id"),
                           F.col(id_col).alias("__na"))
    cmemb = members.select(F.col("rep_id").alias("corpus_id"),
                           F.col("member_id").alias("__nb"))
    return (
        rep_pairs.join(nmemb, "new_id").join(cmemb, "corpus_id")
        .select(
            F.col("__na").cast(new.schema[id_col].dataType).alias("new_id"),
            F.col("__nb").cast(corpus_id_t).alias("corpus_id"),
            "jaccard",
        )
    )


# --- MinHash + LSH ---------------------------------------------------------
# One permutation = min over shingles of md5(seed || ':' || shingle); the
# hex-string min is a valid uniform order and the seed prefix is the
# permutation.

def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_hashes: int = 12) -> DataFrame:
    """(id, sig_0..sig_{n-1}) MinHash signature table.

    Computed explode-then-aggregate rather than ``array_min(transform(...))``:
    higher-order-function lambdas are interpreted (no whole-stage codegen),
    while ``explode -> groupBy(id).agg(min(md5(...)) x k)`` runs the k hash
    evaluations inside one codegen'd partial+final hash aggregate — map-side
    combine shrinks the shuffle to one signature row per doc per partition.
    """
    exploded = shingle_postings(df, text_col, id_col, k)
    return exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"sig_{j}")
            for j in range(num_hashes)
        ]
    )


def _minhash_band_keys(base: DataFrame, id_col: str, num_hashes: int,
                       bands: int) -> DataFrame:
    """(id, band_key) rows from a (id, shingles) table: per-permutation
    MinHash signatures (min of md5("j:shingle") — the seed prefix IS the
    permutation, no RNG) folded into ``bands`` md5 band keys.  A pure
    per-document function — no corpus statistics — which is what lets a
    probe side compute ITS keys independently and equi-join a persisted
    corpus band table."""
    rows_per_band = num_hashes // bands
    exploded = base.select(
        F.col(id_col), F.explode("shingles").alias("shingle")
    )
    sigs = exploded.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))))
            .alias(f"sig_{j}")
            for j in range(num_hashes)
        ]
    )
    return sigs.select(
        F.col(id_col),
        F.array(
            *[
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[
                            F.col(f"sig_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                )
                for b in range(bands)
            ]
        ).alias("bands"),
    ).select(F.col(id_col), F.explode("bands").alias("band_key"))


def minhash_hot_bands(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      max_bucket: int = 500,
                      shingled: DataFrame | None = None) -> DataFrame:
    """Audit companion to :func:`minhash_lsh_pairs`'s ``max_bucket`` cut:
    the (band_key, bucket_n) rows the cap EXCLUDES from candidate
    generation.  Empty means the cap changed nothing (the property the
    default relies on at current scale); non-empty is the visible record
    of what a web-scale run truncated — run it alongside any capped dedup
    so truncation is never silent.

    Bucket sizes count distinct shingle arrays (group reps), matching what
    :func:`minhash_lsh_pairs`'s cap bounds after multiplicity collapse."""
    from pyspark.sql import Window

    base = (shingled if shingled is not None
            else materialize_once(shingled_arrays(df, text_col, id_col, k)))
    reps = rep_tags(base.select(F.col(id_col), F.col("shingles")),
                    "shingles", id_col, with_mult=False) \
        .filter(F.col(id_col) == F.col("__rep")).select(id_col, "shingles")
    return (
        _minhash_band_keys(reps, id_col, num_hashes, bands)
        .groupBy("band_key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.5,
                      max_bucket: int | None = None,
                      shingled: DataFrame | None = None,
                      band_keys: DataFrame | None = None,
                      tables_checked: bool = False) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard to verify.

    ``num_hashes / bands`` rows per band; two docs collide iff some band's
    signature slice matches exactly.  With 12 hashes / 4 bands (r=3) the
    collision probability at J=0.5 is ~1-(1-0.125)^4 = 0.41 and rises steeply
    — tune (bands, rows) per corpus.  Candidates are then *verified* with the
    exact shingle Jaccard so the output has no false positives.

    ``max_bucket`` bounds the band self-join: a band bucket of B documents
    emits O(B^2) candidate rows, and a boilerplate-heavy web corpus grows
    hot buckets whose quadratic blowup no verify step can recover from —
    buckets larger than the cap are excluded from candidate generation
    (the LSH analog of :func:`ngram_jaccard_pairs`' ``max_df`` index cut;
    candidate volume is then <= ``max_bucket`` * band rows, linear).  Like
    ``max_df`` it can lose recall — ONLY for pairs whose every colliding
    band is hot, which at sane caps means near-duplicate boilerplate
    clusters a dedup pass wants collapsed by exact-dedup anyway.  Audit
    what a cap excluded with :func:`minhash_hot_bands`.  The default is
    ``None`` — uncapped, so the operator is EXACTLY its definition (and
    its SQL oracle) out of the box; web-scale runs opt in (~500) after
    sizing the cut with the audit.

    ``shingled`` / ``band_keys`` let callers substitute persisted
    warehouse artifacts (a (id, shingles) table / a (id, band_key) table
    from the same scheme) for the in-flight passes — the build-once path:
    with both supplied the operator is candidate join + exact verify over
    table scans, no tokenization at all.

    **Multiplicity collapse**: verbatim copies share every band key (the
    signature is a pure function of the shingle set), so a duplicate group
    of c docs inflates each of its band buckets c-fold and the candidate
    mass c^2-fold while every such pair verifies to Jaccard exactly 1.
    One window exchange on the shingle array tags group reps; banding,
    the capped candidate join, and the verify run over distinct arrays
    only, duplicate groups emit a J=1 self marker, and member joins
    expand rep pairs back to id-level.  Output is identical to the
    uncollapsed form wherever ``max_bucket`` does not bind; where it
    does, the cap now counts distinct CONTENTS, not copies — strictly
    better recall and the measure the cap was always meant to bound
    (:func:`minhash_hot_bands` applies the same collapse).
    """
    from pyspark.sql import Window

    # one materialized shingle pass feeds signatures AND both verify sides
    # (exploding the stored arrays re-derives the distinct postings without
    # a second tokenize/window pass); ``shingled`` lets callers share it
    # across several consumers
    raw = (shingled if shingled is not None
           else materialize_once(shingled_arrays(df, text_col, id_col, k)))
    # persisted substitutions: refuse stale tables' ghost ids up front
    # unless the caller already validated this session (``tables_checked``)
    if not tables_checked:
        if shingled is not None:
            _check_no_ghost_ids(df, raw, id_col, "shingle",
                            legit_missing=_dropped_by_shingling(text_col, k))
        if band_keys is not None:
            _check_no_ghost_ids(df, band_keys, id_col, "band-key",
                                legit_missing=_dropped_by_shingling(text_col,
                                                                    k))
    # a pre-tagged persisted table (carrying __rep/__mult) skips the window
    tagged = raw if _tagged_or_raise(raw, "shingle") else materialize_once(
        rep_tags(raw.select(F.col(id_col), F.col("shingles")),
                 "shingles", id_col)
    )
    base = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles", "__mult"
    )
    if band_keys is None:
        band_keys = _minhash_band_keys(base, id_col, num_hashes, bands)
    else:
        # persisted band tables cover every copy; restrict to group reps
        # (copies carry identical keys, so this drops nothing but volume)
        band_keys = band_keys.join(base.select(id_col), id_col)
    if max_bucket is not None:
        # bucket sizes via a window on the SAME key the self-join shuffles
        # on: one exchange, reused by both join sides
        band_keys = band_keys.withColumn(
            "__bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("band_key")),
        ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")

    ca = band_keys.select(F.col(id_col).alias("id_a"), "band_key")
    cb = band_keys.select(F.col(id_col).alias("id_b"), "band_key")
    candidates = (
        ca.join(cb, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Verify ONLY the candidates: join their shingle sets back and compute
    # the exact Jaccard with array intersection — O(candidates), never the
    # all-pairs inverted-index join (that is ngram_jaccard_pairs' job as the
    # exact baseline; at 100 TB the candidate set is what makes LSH viable).
    sh_a = base.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    rep_pairs = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard", n_inter.cast("double") / n_union.cast("double")
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if threshold <= 1.0:
        # duplicate-group self markers: identical non-empty shingle sets
        # collide in every band and verify to Jaccard exactly 1; empty
        # sets have no band keys and never pair
        rep_pairs = rep_pairs.unionByName(
            base.filter((F.col("__mult") > 1) & (F.size("shingles") > 0))
            .select(
                F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
    return expand_member_pairs(
        rep_pairs, tagged.select("__rep", F.col(id_col).alias("__member")),
        ["jaccard"],
    )


# --- SimHash ---------------------------------------------------------------

_ODD_HEX = "[13579bdf]"
SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bands; pigeonhole valid while max_hamming < bands


def simhash_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, simhash BIGINT) table.

    Explode-then-aggregate: one md5 per token computed inside a codegen'd
    hash aggregate; the 32 bit votes are 32 conditional SUMs over the same
    exploded rows (single pass, map-side combined), then packed into a
    BIGINT in a final cheap projection.
    """
    # Per token, parse the 32 md5 hex digits into three longs (11+11+10
    # digits; 44 bits max so the signed-long conv cast never overflows).
    # "Digit j is odd" == lowest bit of that digit's nibble — so each bit
    # vote is a long shift-and-mask instead of a per-bit string substring
    # (32 string ops/token -> 3 convs + cheap integer ops; ~3x faster table).
    chunks = [(0, 11), (11, 11), (22, 10)]
    exploded = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).select(F.col(id_col), F.md5("t").alias("m")).select(
        F.col(id_col),
        *[
            F.conv(F.substring("m", start + 1, width), 16, 10)
            .cast("long")
            .alias(f"c{i}")
            for i, (start, width) in enumerate(chunks)
        ],
    )

    def bit_of(j: int):
        for i, (start, width) in enumerate(chunks):
            if start <= j < start + width:
                shift = 4 * (width - (j - start) - 1)
                return F.shiftright(F.col(f"c{i}"), shift).bitwiseAND(F.lit(1))
        raise AssertionError(j)

    votes = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        *[F.sum(bit_of(j)).alias(f"s{j}") for j in range(SIMHASH_BITS)],
    )
    packed = None
    for j in range(SIMHASH_BITS):
        # majority vote: sum(+1/-1) > 0  <=>  2 * sum(bit) > n
        bit = F.when(
            F.col(f"s{j}") * 2 > F.col("n_tok"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed + bit
    return votes.select(F.col(id_col), packed.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3,
                  sims: DataFrame | None = None,
                  tables_checked: bool = False) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance <= ``max_hamming``.

    Candidates via 8-bit band equality: distance <= 3 across 4 bands forces
    at least one identical band (pigeonhole), so recall is exact.  8-bit
    bands (256 values) keep bucket sizes ~n/256 — the candidate volume is
    sum-of-squares over bucket sizes, two orders of magnitude below the 4-bit
    banding alternative.  Verification is ``bit_count(xor)`` on two BIGINTs.

    ``sims`` substitutes a persisted (id, simhash) warehouse table for the
    in-flight md5+vote aggregation — the build-once path: signatures are
    pure per-document functions, so a persisted table composes exactly.

    **Multiplicity collapse**: the banded self-joins run over DISTINCT
    signature values (rep = min id per simhash — this merges verbatim
    copies AND hash-colliding texts, both exactly Hamming 0 apart);
    signature groups of two or more emit a Hamming-0 self marker and
    member joins expand rep pairs back to id-level.  Byte-identical to
    banding every copy, but a c-deep duplicate cluster costs one row in
    the candidate join instead of c^2.
    """
    from pyspark.sql import Window

    # 4 band self-joins read this table 8 times; materialize the md5+vote
    # aggregation once instead of re-running it per consumer (the tiny
    # (id, simhash) rows are the cheapest possible thing to cache)
    if sims is None:
        sims = materialize_once(simhash_table(df, text_col, id_col))
    elif not tables_checked:
        # a persisted signature table must not carry ids absent from the
        # corpus (stale table -> phantom pairs)
        # simhash has one row per doc EXCEPT null-text docs (explode of a
        # NULL token array drops the row) — that is the only excused absence
        _check_no_ghost_ids(df, sims, id_col, "simhash",
                            legit_missing=F.col(text_col).isNull())
    tagged = materialize_once(
        rep_tags(sims.select(F.col(id_col), F.col("simhash")),
                 "simhash", id_col)
    )
    reps = tagged.filter(F.col(id_col) == F.col("__rep"))
    banded = reps.select(
        F.col(id_col),
        F.col("simhash"),
        *[
            F.shiftright("simhash", b * 8).bitwiseAND(F.lit(0xFF)).alias(f"band_{b}")
            for b in range(SIMHASH_BANDS)
        ],
    )
    pairs = None
    for b in range(SIMHASH_BANDS):
        a = banded.select(
            F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
            F.col(f"band_{b}").alias("bk"),
        )
        c = banded.select(
            F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
            F.col(f"band_{b}").alias("bk"),
        )
        cand = a.join(c, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    rep_pairs = (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
        # signature groups: every member pair is exactly Hamming 0
        .unionByName(
            reps.filter(F.col("__mult") > 1).select(
                F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
                F.lit(0).alias("hamming"),
            )
        )
    )
    return expand_member_pairs(
        rep_pairs, tagged.select("__rep", F.col(id_col).alias("__member")),
        ["hamming"],
    )


def duplicated_ngram_stats(df: DataFrame, n: int = 5,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           max_df: int | None = None) -> DataFrame:
    """Exact duplicated-substring audit (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL '22): for every
    document, how much of it is verbatim repetition of EARLIER corpus
    text, measured as the fraction of its distinct word ``n``-grams whose
    first corpus occurrence (min id) is a different document.

    This is the substring-level complement of the document-level dedup
    family above — near-dup measures whole-document overlap; this
    catches boilerplate, quoted passages, and template text embedded in
    otherwise-unique documents, the signal used to cut memorization.

    Plan: explode distinct n-grams, ONE hash exchange keyed on the gram
    to compute each gram's min owner (a window ``min``, not an
    agg+self-join — the postings list never materializes twice), then a
    groupBy on the document id.  Posting-list volume, not |docs|^2; at
    100 TB the gram would be a 64-bit ``xxhash64`` instead of the string
    (collision-checked), cutting exchange bytes ~10x — the string form
    here keeps the operator SQL-oracle-checkable.

    ``max_df`` is the gram-skew guard: the gram-keyed window buffers each
    gram's full posting list in one task, so stop-gram-grade n-grams (df
    in the millions on a web corpus) concentrate linear-but-hot mass on
    single keys.  Grams in more than ``max_df`` documents are excluded
    from BOTH counts — consistent with the Lee et al. method, where a
    gram shared by everything carries no dedup signal (it would mark all
    late documents "duplicated" by ubiquitous phrases).  The df count
    rides the SAME window exchange as the min-owner, so the guard costs
    no extra shuffle; when no gram exceeds the cut the output is
    IDENTICAL (pytest-asserted).

    Documents with fewer than ``n`` tokens have no n-grams and are
    absent from the output (as are documents whose every gram exceeds
    ``max_df``).  Returns ``(id_col, n_grams, n_dup_grams,
    dup_fraction)``.

    **Multiplicity collapse**: only group reps (min id per distinct
    text) push gram mass through the window exchange.  This is exact,
    not heuristic: (a) a gram's min owner over reps equals its min owner
    over all copies (the rep IS each group's min id); (b) df counts
    documents, preserved as Σ mult over the gram's reps; (c) a non-rep
    copy m shares every gram with its rep r < m, so each of its
    surviving grams has owner <= r < m — its row is exactly
    ``(n_grams, n_grams, 1.0)``, the Lee et al. verdict on a verbatim
    copy — emitted by expansion without touching its text.
    """
    from pyspark.sql import Window

    tagged = materialize_once(
        rep_tags(df.select(F.col(id_col), F.col(text_col)),
                 text_col, id_col)
    )
    reps = tagged.filter(F.col(id_col) == F.col("__rep"))
    grams = reps.select(
        F.col(id_col), F.col("__mult"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    w = Window.partitionBy("gram")
    owned = grams.withColumn("owner", F.min(id_col).over(w))
    if max_df is not None:
        owned = owned.withColumn(
            "__df", F.sum("__mult").over(w)
        ).filter(F.col("__df") <= max_df).drop("__df")
    rep_stats = owned.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum((F.col("owner") < F.col(id_col)).cast("long")).alias(
            "n_dup_grams"
        ),
    )
    expanded = (
        tagged.select(F.col("__rep"), F.col(id_col).alias("__member"))
        .join(rep_stats.withColumnRenamed(id_col, "__rep"), "__rep")
        .select(
            F.col("__member").alias(id_col),
            F.col("n_grams"),
            F.when(F.col("__member") == F.col("__rep"), F.col("n_dup_grams"))
            .otherwise(F.col("n_grams")).alias("n_dup_grams"),
        )
    )
    return expanded.select(
        F.col(id_col), F.col("n_grams"), F.col("n_dup_grams"),
        (F.col("n_dup_grams").cast("double")
         / F.col("n_grams").cast("double")).alias("dup_fraction"),
    )


# --- persisted substring-dedup gram profile --------------------------------

GRAM_PROFILE_TABLES = ("df_profile", "members")


def build_gram_profile(corpus: DataFrame, table_prefix: str, n: int = 5,
                       text_col: str = "text", id_col: str = "doc_id",
                       num_buckets: int = 8) -> dict[str, str]:
    """Persist the :func:`duplicated_ngram_stats` sufficient statistic as
    warehouse tables, so the substring-dedup audit (and EVERY ``max_df``
    variant of it) becomes a cheap doc-keyed aggregation instead of
    re-exploding the corpus gram mass per query.

    Each of a rep document's distinct ``n``-grams contributes to exactly
    one ``(doc, df)`` cell, so aggregating per document-frequency level —
    ``<prefix>_df_profile`` ``(id, df_cnt, n_grams, n_dup_grams)``,
    bucketed on the doc id — commutes with any ``df <= C`` cut:
    ``duplicated_ngram_stats(corpus, n, max_df=C)`` equals
    :func:`stats_from_gram_profile` with the same ``C`` for every ``C``
    including None (pytest-asserted).  Sums are integer-exact, so the
    equality is bit-for-bit, not approximate.  ``<prefix>_members``
    ``(rep_id, member_id)`` is the multiplicity-collapse expansion map
    (rep = min id per identical text).

    This is the same build-once/probe-often incremental-materialization
    pattern as the near-dup and BM25 indexes (the reference's
    dbt/nyc_taxi/models/bronze/bronze_yellow_tripdata.sql:1-5 incremental model, applied to
    the Lee et al. substring signal): the gram-keyed window exchange —
    the posting-list-volume shuffle that dominates the from-scratch
    query — is paid once per corpus.
    """
    from pyspark.sql import Window

    from ..execution import rep_tags
    from ..operators.layout import write_bucketed

    names = {t: f"{table_prefix}_{t}" for t in GRAM_PROFILE_TABLES}
    props = {"kind": "gram_profile", "n": n, "collapsed": True}
    tagged = materialize_once(
        rep_tags(corpus.select(F.col(id_col), F.col(text_col)),
                 text_col, id_col)
    )
    write_bucketed(
        tagged.select(F.col("__rep").alias("rep_id"),
                      F.col(id_col).alias("member_id")),
        names["members"], ["rep_id"], num_buckets, props=props,
    )
    reps = tagged.filter(F.col(id_col) == F.col("__rep"))
    grams = reps.select(
        F.col(id_col), F.col("__mult"),
        F.explode(word_shingles(text_col, n)).alias("gram"),
    )
    w = Window.partitionBy("gram")
    owned = grams.select(
        F.col(id_col),
        F.min(id_col).over(w).alias("owner"),
        F.sum("__mult").over(w).alias("df_cnt"),
    )
    profile = owned.groupBy(id_col, "df_cnt").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum((F.col("owner") < F.col(id_col)).cast("long")).alias(
            "n_dup_grams"
        ),
    )
    write_bucketed(profile, names["df_profile"], [id_col], num_buckets,
                   props=props)
    return names


def stats_from_gram_profile(spark, table_prefix: str,
                            id_col: str = "doc_id",
                            max_df: int | None = None) -> DataFrame:
    """Serve :func:`duplicated_ngram_stats` from a persisted
    :func:`build_gram_profile` — filter the df band, one doc-keyed sum
    (bucket-local: the profile is bucketed on the id), expand reps to
    members.  Output schema and values are identical to the from-scratch
    engine at the same ``max_df``."""
    names = {t: f"{table_prefix}_{t}" for t in GRAM_PROFILE_TABLES}
    prof = spark.table(names["df_profile"])
    if max_df is not None:
        prof = prof.filter(F.col("df_cnt") <= max_df)
    rep_stats = prof.groupBy(id_col).agg(
        F.sum("n_grams").cast("long").alias("n_grams"),
        F.sum("n_dup_grams").cast("long").alias("n_dup_grams"),
    )
    expanded = (
        spark.table(names["members"])
        .join(rep_stats.withColumnRenamed(id_col, "rep_id"), "rep_id")
        .select(
            F.col("member_id").alias(id_col),
            F.col("n_grams"),
            F.when(F.col("member_id") == F.col("rep_id"),
                   F.col("n_dup_grams"))
            .otherwise(F.col("n_grams")).alias("n_dup_grams"),
        )
    )
    return expanded.select(
        F.col(id_col), F.col("n_grams"), F.col("n_dup_grams"),
        (F.col("n_dup_grams").cast("double")
         / F.col("n_grams").cast("double")).alias("dup_fraction"),
    )


# --- persisted MinHash index -----------------------------------------------

MINHASH_INDEX_TABLES = ("bands", "shingles", "members")


def _minhash_table_names(prefix: str) -> dict[str, str]:
    return {t: f"{prefix}_{t}" for t in MINHASH_INDEX_TABLES}


def build_minhash_index(corpus: DataFrame, table_prefix: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, num_hashes: int = 12, bands: int = 4,
                        num_buckets: int = 8) -> dict[str, str]:
    """Persist the MinHash-LSH side of the dedup family as warehouse
    tables: ``<prefix>_bands`` (id, band_key — bucketed on the band key,
    the candidate join's key) and ``<prefix>_shingles`` (id, shingles —
    the exact-verify sets, bucketed on the id).  Unlike the n-gram prefix
    index (:func:`build_ngram_index`), MinHash band keys carry NO corpus
    statistics — each document's keys are a pure function of its own
    text — so probes of any batch compose with this index without
    replaying a global ordering.  Same build-once/probe-many shape as the
    rest of the persisted-index family.

    Like :func:`build_ngram_index`, the index is multiplicity-collapsed:
    bands and shingles hold one row-set per DISTINCT shingle array (rep =
    min member id) and ``<prefix>_members`` (rep_id, member_id) is the
    expansion map probes fan matched reps back out with — verbatim copies
    cost one signature, one set of band rows, and one verify set."""
    from pyspark.sql import Window as W

    from ..operators.layout import write_bucketed

    names = _minhash_table_names(table_prefix)
    # band keys are scheme-dependent (k, num_hashes, bands): a probe under
    # a different scheme joins disjoint key spaces and silently finds
    # nothing — record the scheme so probe_minhash_index can refuse it
    props = {"kind": "minhash_index", "k": k, "num_hashes": num_hashes,
             "bands": bands, "collapsed": True}
    tagged = materialize_once(
        rep_tags(shingled_arrays(corpus, text_col, id_col, k),
                 "shingles", id_col, with_mult=False)
    )
    write_bucketed(
        tagged.select(F.col("__rep").alias("rep_id"),
                      F.col(id_col).alias("member_id")),
        names["members"], ["rep_id"], num_buckets, props=props,
    )
    base = tagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles"
    )
    write_bucketed(
        _minhash_band_keys(base, id_col, num_hashes, bands),
        names["bands"], ["band_key"], num_buckets, props=props,
    )
    write_bucketed(
        base.select(id_col, "shingles"), names["shingles"], [id_col],
        num_buckets, props=props,
    )
    return names


def probe_minhash_index(new: DataFrame, table_prefix: str,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, num_hashes: int = 12, bands: int = 4,
                        threshold: float = 0.5) -> DataFrame:
    """Screen an incoming batch against a :func:`build_minhash_index`
    corpus: every (new_id, corpus_id, jaccard) whose band keys collide
    AND whose exact shingle Jaccard >= ``threshold`` — corpus text never
    re-read, candidates restricted to the batch's band keys (a
    bucket-local lookup on the persisted band table).  ``k``,
    ``num_hashes``, ``bands`` must match the build (band keys are
    per-document but scheme-dependent) — validated against the
    ``_table_meta.json`` sidecar the build recorded; a mismatch raises
    instead of silently returning an empty candidate set.  Identical
    semantics to running ``minhash_lsh_pairs`` over (batch UNION corpus)
    and keeping the cross-side pairs."""
    from ..operators.layout import read_table_meta

    spark = new.sparkSession
    names = _minhash_table_names(table_prefix)
    meta = read_table_meta(spark, names["bands"])
    if meta is not None and meta.get("props"):
        built = meta["props"]
        for param, got in (("k", k), ("num_hashes", num_hashes),
                           ("bands", bands), ("collapsed", True)):
            if built.get(param) != got:
                raise ValueError(
                    f"minhash index `{table_prefix}` was built with "
                    f"{param}={built.get(param)!r}; probing with {got!r} "
                    "joins a disjoint band-key space — rebuild or match it"
                )
    from pyspark.sql import Window as W

    corpus_bands = spark.table(names["bands"])
    corpus_shingles = spark.table(names["shingles"])
    members = spark.table(names["members"])

    # multiplicity collapse, both sides: the index stores corpus reps only
    # (expansion map persisted as <prefix>_members); the batch collapses
    # here with one window exchange on its shingle arrays
    ntagged = materialize_once(
        rep_tags(shingled_arrays(new, text_col, id_col, k),
                 "shingles", id_col, with_mult=False)
    )
    nbase = ntagged.filter(F.col(id_col) == F.col("__rep")).select(
        id_col, "shingles"
    )
    nbands = _minhash_band_keys(nbase, id_col, num_hashes, bands)
    candidates = (
        nbands.select(F.col(id_col).alias("new_id"), "band_key")
        .join(corpus_bands.select(F.col(id_col).alias("corpus_id"),
                                  "band_key"), "band_key")
        .select("new_id", "corpus_id")
        .distinct()
    )
    sh_a = nbase.select(F.col(id_col).alias("new_id"),
                        F.col("shingles").alias("sh_a"))
    sh_b = corpus_shingles.select(F.col(id_col).alias("corpus_id"),
                                  F.col("shingles").alias("sh_b"))
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    n_union = F.size("sh_a") + F.size("sh_b") - n_inter
    rep_pairs = (
        candidates.join(sh_a, "new_id")
        .join(sh_b, "corpus_id")
        .withColumn("jaccard",
                    n_inter.cast("double") / n_union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )
    nmemb = ntagged.select(F.col("__rep").alias("new_id"),
                           F.col(id_col).alias("__na"))
    cmemb = members.select(F.col("rep_id").alias("corpus_id"),
                           F.col("member_id").alias("__nb"))
    return (
        rep_pairs.join(nmemb, "new_id").join(cmemb, "corpus_id")
        .select(
            F.col("__na").alias("new_id"), F.col("__nb").alias("corpus_id"),
            "jaccard",
        )
    )


def remove_duplicated_spans(df: DataFrame, n: int = 4,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Exact substring-dedup REMOVAL (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL '22) — the action counterpart
    to :func:`duplicated_ngram_stats`' audit: rewrite each document with
    every token DROPPED that sits inside a word ``n``-gram whose first
    corpus occurrence (min ``id_col``) is an EARLIER document.  The first
    occurrence keeps its text; boilerplate, quoted passages, and verbatim
    copies lose exactly the repeated spans (a full verbatim copy rewrites
    to the empty string) — the transform that cuts memorization without
    discarding the novel remainder of a document.

    Semantics: a token at 0-based position ``t`` is removed iff some
    gram start ``p`` in ``[t-n+1, t]`` is cross-doc duplicated
    (``owner < id``).  Within-doc repeats are NOT removed (their owner
    is the document itself).  Output text is the space-joined surviving
    tokens (whitespace normalized — the same convention for untouched
    documents, so the contract is uniform).  Documents with NULL id or
    text are dropped; documents shorter than ``n`` tokens pass through
    with zero removals.

    Plan shape: gram explode with positions (posting volume) -> ONE
    gram-keyed window exchange for the min owner (identical shape to the
    audit) -> duplicated positions collected per doc (second, id-keyed
    exchange; the array is sorted IN-ROW so collect order can't leak) ->
    broadcast-free id join back to the documents -> per-row HOF rebuild
    (filter-with-index + exists over the dup-position array; per-doc
    work O(tokens x dup_positions), document-local).  Multiplicity
    collapse: only group reps push gram mass through the window; a
    non-rep verbatim copy expands to clean_text '' (every position
    covered) without touching its text — value-identical to the
    uncollapsed computation, same argument as the audit's.

    Returns ``(id_col, n_tokens int, n_removed int, clean_text)``.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = df.filter(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    tagged = materialize_once(
        rep_tags(base.select(F.col(id_col), F.col(text_col)),
                 text_col, id_col)
    )
    reps = tagged.filter(F.col(id_col) == F.col("__rep"))
    toks = tokens(text_col)
    n_toks = token_count(text_col)
    # positional grams via ONE narrow Arrow pass — the expression form
    # (transform over sequence with slice(tokens(...))) re-ran the regex
    # split once per gram position (no CSE across lambda bodies),
    # O(tokens^2) regex work per doc; measured 7x slower at sf0.1.
    # Short/NULL docs yield no gram rows, same as the old WHEN guard.
    grams = positional_shingles(reps, text_col, id_col, k=n)
    from pyspark.sql import Window

    owner = F.min(id_col).over(Window.partitionBy("gram"))
    dup_pos = (
        grams.withColumn("__owner", owner)
        .filter(F.col("__owner") < F.col(id_col))
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("gpos")).alias("__dups"))
    )
    rep_clean = (
        reps.join(dup_pos, id_col, "left")
        .withColumn("__dups", F.coalesce(
            F.col("__dups"), F.array().cast("array<int>")))
        .select(
            F.col(id_col).alias("__rep_id"),
            n_toks.cast("int").alias("n_tokens"),
            F.filter(
                toks,
                lambda x, i: ~F.exists(
                    F.col("__dups"),
                    lambda p: (p >= i - (n - 1)) & (p <= i),
                ),
            ).alias("__kept"),
        )
        .select(
            "__rep_id", "n_tokens",
            # blank docs: split('') yields [''] so size(kept)=1 while
            # n_tokens=0 — pin both outputs to the empty-document case
            F.when(F.col("n_tokens") == 0, F.lit(0))
            .otherwise(F.col("n_tokens") - F.size("__kept")).cast("int")
            .alias("n_removed"),
            F.when(F.col("n_tokens") == 0, F.lit(""))
            .otherwise(F.concat_ws(" ", F.col("__kept")))
            .alias("clean_text"),
        )
    )
    # member expansion: a verbatim copy's every gram is owned by its rep
    # (owner <= rep < member), so all n_tokens positions are covered when
    # the doc has grams at all; shorter-than-n docs have no grams and
    # pass through (their clean_text equals the rep's, same text)
    return (
        tagged.select(F.col("__rep"), F.col(id_col).alias("__member"))
        .join(rep_clean, F.col("__rep") == F.col("__rep_id"))
        .select(
            F.col("__member").alias(id_col),
            F.col("n_tokens"),
            F.when(F.col("__member") == F.col("__rep"), F.col("n_removed"))
            .otherwise(F.when(F.col("n_tokens") >= n, F.col("n_tokens"))
                       .otherwise(F.lit(0)).cast("int"))
            .alias("n_removed"),
            F.when(F.col("__member") == F.col("__rep"), F.col("clean_text"))
            .otherwise(F.when(F.col("n_tokens") >= n, F.lit(""))
                       .otherwise(F.col("clean_text")))
            .alias("clean_text"),
        )
    )
