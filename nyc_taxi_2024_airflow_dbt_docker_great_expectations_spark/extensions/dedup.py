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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens, word_shingles


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


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.6) -> DataFrame:
    """Exact word-k-gram Jaccard near-dup pairs above ``threshold``."""
    shingled = df.select(
        F.col(id_col), word_shingles(text_col, k).alias("shingles")
    ).filter(F.size("shingles") > 0)
    return _pair_jaccard(shingled, id_col).filter(F.col("jaccard") >= threshold)


# --- MinHash + LSH ---------------------------------------------------------

def _minhash_one(sh: Column, seed: int) -> Column:
    """One permutation: min over shingles of md5(seed || ':' || shingle).
    Hex-string min is a valid uniform order; md5 prefixing is the seed."""
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = 3,
                       num_hashes: int = 12) -> DataFrame:
    """(id, sig_0..sig_{n-1}) MinHash signature table."""
    sh = word_shingles(text_col, k)
    base = df.select(F.col(id_col), sh.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    sig_cols = [
        _minhash_one(F.col("shingles"), j).alias(f"sig_{j}") for j in range(num_hashes)
    ]
    return base.select(F.col(id_col), *sig_cols)


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard to verify.

    ``num_hashes / bands`` rows per band; two docs collide iff some band's
    signature slice matches exactly.  With 12 hashes / 4 bands (r=3) the
    collision probability at J=0.5 is ~1-(1-0.125)^4 = 0.41 and rises steeply
    — tune (bands, rows) per corpus.  Candidates are then *verified* with the
    exact shingle Jaccard so the output has no false positives.
    """
    rows_per_band = num_hashes // bands
    sh = word_shingles(text_col, k)
    base = df.select(F.col(id_col), sh.alias("shingles")).filter(
        F.size("shingles") > 0
    )
    sigs = base.select(
        F.col(id_col),
        F.col("shingles"),
        *[
            _minhash_one(F.col("shingles"), j).alias(f"sig_{j}")
            for j in range(num_hashes)
        ],
    )
    band_keys = sigs.select(
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

    ca = band_keys.select(F.col(id_col).alias("id_a"), "band_key")
    cb = band_keys.select(F.col(id_col).alias("id_b"), "band_key")
    candidates = (
        ca.join(cb, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    shingled = base.select(F.col(id_col), "shingles")
    exact = _pair_jaccard(shingled, id_col)
    return (
        candidates.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash ---------------------------------------------------------------

_ODD_HEX = "[13579bdf]"
SIMHASH_BITS = 32
SIMHASH_BANDS = 8


def _simhash_bits(toks: Column) -> list[Column]:
    """Bit_j = majority vote over tokens of (j-th md5 hex digit odd)."""
    out = []
    for j in range(SIMHASH_BITS):
        vote = F.aggregate(
            F.transform(
                toks,
                lambda t: F.when(
                    F.substring(F.md5(t), j + 1, 1).rlike(_ODD_HEX), F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        out.append(F.when(vote > 0, F.lit(1)).otherwise(F.lit(0)).alias(f"bit_{j}"))
    return out


def simhash_table(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, bit_0..bit_{n-1}) simhash bit table (32-bit here, md5-hex-digit
    votes for oracle reproducibility; production would use 64-bit xxhash64
    votes, same shape)."""
    toks = tokens(text_col)
    return df.select(F.col(id_col), *_simhash_bits(toks))


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with simhash Hamming distance <= ``max_hamming``.
    Candidates via 4-bit band equality (pigeonhole: distance <= max_hamming
    over SIMHASH_BANDS > max_hamming bands forces >= 1 identical band), then
    exact Hamming verification."""
    sims = simhash_table(df, text_col, id_col)
    bit_cols = [f"bit_{j}" for j in range(SIMHASH_BITS)]
    banded = sims.select(
        F.col(id_col),
        *bit_cols,
        *[
            F.concat_ws(
                "", *[F.col(f"bit_{b * 4 + r}") for r in range(4)]
            ).alias(f"band_{b}")
            for b in range(SIMHASH_BANDS)
        ],
    )
    pairs = None
    for b in range(SIMHASH_BANDS):
        a = banded.select(
            F.col(id_col).alias("id_a"),
            *[F.col(c).alias(f"a_{c}") for c in bit_cols],
            F.col(f"band_{b}").alias("bk"),
        )
        c = banded.select(
            F.col(id_col).alias("id_b"),
            *[F.col(x).alias(f"b_{x}") for x in bit_cols],
            F.col(f"band_{b}").alias("bk"),
        )
        cand = a.join(c, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        pairs = cand if pairs is None else pairs.unionByName(cand)
    hamming = None
    for j in range(SIMHASH_BITS):
        d = (F.col(f"a_bit_{j}") != F.col(f"b_bit_{j}")).cast("int")
        hamming = d if hamming is None else hamming + d
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
