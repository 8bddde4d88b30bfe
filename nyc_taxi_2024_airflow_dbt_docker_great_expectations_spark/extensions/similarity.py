"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.  The
  query set is broadcast (it's small); each partition of the corpus computes
  its local scores, and only the per-query top-k rows survive the final
  shuffle (window + filter).  Linear scan, embarrassingly parallel — at
  100 TB this is the *verification* path, not the serving path.
- ``hyperplane_lsh_buckets`` / ``lsh_topk``: the scale path — random
  hyperplane (sign) LSH.  The planes are derived deterministically from md5
  (no RNG, reproducible across engines/runs), each vector gets a b-bit
  bucket; candidates are restricted to equal buckets (optionally multi-probe
  by Hamming-adjacent buckets).  Bucketing turns a quadratic scan into a
  hash-partitioned equi-join.

All arithmetic is explicit double-precision in a fixed fold order so scores
are bit-deterministic and oracle-checkable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products (fixed order -> deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Arrow-batched cosine, bit-identical to :func:`cosine`.

    The higher-order-function form (``cosine``) is interpreted per row —
    no whole-stage codegen, ~10x slower — so it stays as the oracle-parity
    *reference* while this is the hot-path scorer.  Bit-identity holds
    because the accumulation replays the exact left-fold order of
    ``F.aggregate``: float->double widening first, then one fused
    multiply-add per dimension in index order (vectorized across rows,
    sequential across dims), then ``dot / (norm_a * norm_b)`` in the same
    expression order.  ``tests/test_extensions.py`` asserts exact equality
    against the HOF form on the embeddings corpus.
    """
    @pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series([], dtype="float64")
        mask = sa.notna() & sb.notna()
        out = np.full(n, np.nan)
        if mask.any():
            ma = np.stack(sa[mask].to_numpy()).astype(np.float64)
            mb = np.stack(sb[mask].to_numpy()).astype(np.float64)
            d = ma.shape[1]
            dot_ = np.zeros(len(ma))
            na = np.zeros(len(ma))
            nb = np.zeros(len(ma))
            # sequential per-dim accumulation == F.aggregate's left fold
            for k in range(d):
                dot_ += ma[:, k] * mb[:, k]
                na += ma[:, k] * ma[:, k]
                nb += mb[:, k] * mb[:, k]
            out[mask.to_numpy()] = dot_ / (np.sqrt(na) * np.sqrt(nb))
        res = pd.Series(out)
        return res.where(pd.Series(mask.to_numpy()), None)

    return _cos(a, b)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    ``queries``: (query_id, embedding).  Broadcast-joined against the corpus;
    ties broken by corpus id for total determinism; self-matches excluded
    when ids collide.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
        )
    )
    scored = corpus.crossJoin(q).filter(F.col(id_col) != F.col("__qid")).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine_arrow(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def neardup_pairs(corpus: DataFrame, threshold: float,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  blas_candidates: bool = True) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup dedup).

    Two-phase, deterministic:

    1. **Candidate generation** (``blas_candidates=True``): a fully
       distributed block-grid GEMM (``_blas_candidate_pairs``) — both sides
       are hash-blocked, each grid cell multiplies two block matrices with
       BLAS inside ``applyInPandas``, and a guard band of 1e-6 below the
       threshold absorbs BLAS's non-reproducible summation order: any pair
       whose true cosine is within 1e-6 of the threshold is always emitted
       as a candidate and decided by phase 2.  No driver collect, no
       whole-corpus broadcast — per-task memory is one block pair.
    2. **Exact verification**: candidates join their vectors and recompute
       cosine with the deterministic left-fold order (Arrow-batched
       ``cosine_arrow``, bit-identical to the HOF ``cosine`` expression) —
       oracle-checkable.

    This is ~100x the throughput of evaluating the cosine expression on the
    full half-matrix, and the grid shape is the same at 10k or 10B vectors —
    only ``n_blocks`` grows (B ~ sqrt(cluster tasks)).
    """
    if not blas_candidates:
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        return (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    cosine(F.col("va"), F.col("vb")).alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold)
        )

    candidates = _blas_candidate_pairs(corpus, threshold - 1e-6, id_col, vec_col)
    va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b",
                cosine_arrow(F.col("va"), F.col("vb")).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def _blas_candidate_pairs(corpus: DataFrame, guard_threshold: float,
                          id_col: str, vec_col: str,
                          n_blocks: int = 8) -> DataFrame:
    """Distributed block-grid GEMM candidate pairs (id_a < id_b).

    Both sides are blocked — NOTHING is collected to the driver:

    1. every row gets a deterministic block id ``p = xxhash64(id) mod B``;
    2. a row in block ``p`` is replicated to grid cell ``(p, j)`` for every
       ``j >= p`` as the LEFT operand and to ``(i, p)`` for every ``i < p``
       as the RIGHT operand (one ``explode`` — B output rows per input row);
    3. ``groupBy(cell).applyInPandas`` multiplies the two block matrices
       with BLAS; diagonal cells self-multiply and keep ``id_a < id_b``,
       off-diagonal cells orient each pair by min/max id, so every unordered
       pair lands in exactly one cell exactly once.

    Scale accounting: replication factor is B, per-task memory is
    ``2 * (N/B) * dim * 8`` bytes, and the B*(B+1)/2 cells are independent
    tasks — choose B so a block fits executor memory (B ~ sqrt(tasks) for a
    square grid).  BLAS summation order is not bit-reproducible, hence the
    guard band below the real threshold; exact membership is decided by the
    deterministic verify phase.
    """
    b = n_blocks
    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(b))
        .cast("int")
        .alias("__blk"),
    )
    seq = F.sequence(F.lit(0), F.lit(b - 1))
    as_left = F.transform(
        F.filter(seq, lambda j: j >= F.col("__blk")),
        lambda j: F.struct(
            (F.col("__blk") * b + j).alias("cell"), F.lit(True).alias("is_left")
        ),
    )
    as_right = F.transform(
        F.filter(seq, lambda i: i < F.col("__blk")),
        lambda i: F.struct(
            (i * b + F.col("__blk")).alias("cell"), F.lit(False).alias("is_left")
        ),
    )
    exploded = base.select(
        "__id", "__vec", F.explode(F.concat(as_left, as_right)).alias("__c")
    ).select(
        "__id",
        "__vec",
        F.col("__c.cell").alias("__cell"),
        F.col("__c.is_left").alias("__left"),
    )

    def gemm(key, pdf):
        empty = pd.DataFrame({"id_a": pd.array([], dtype="int64"),
                              "id_b": pd.array([], dtype="int64")})
        i, j = divmod(int(key[0]), b)
        left = pdf[pdf["__left"]]
        right = left if i == j else pdf[~pdf["__left"]]
        if len(left) == 0 or len(right) == 0:
            return empty
        ids_l = left["__id"].to_numpy()
        ids_r = right["__id"].to_numpy()
        ml = np.stack(left["__vec"].to_numpy()).astype(np.float64)
        ml /= np.maximum(np.linalg.norm(ml, axis=1, keepdims=True), 1e-300)
        if i == j:
            mr = ml
        else:
            mr = np.stack(right["__vec"].to_numpy()).astype(np.float64)
            mr /= np.maximum(np.linalg.norm(mr, axis=1, keepdims=True), 1e-300)
        sims = ml @ mr.T
        ia, ja = np.nonzero(sims >= guard_threshold)
        id_a, id_b = ids_l[ia], ids_r[ja]
        if i == j:
            keep = id_a < id_b
            id_a, id_b = id_a[keep], id_b[keep]
        else:
            id_a, id_b = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b})

    return exploded.groupBy("__cell").applyInPandas(gemm, "id_a long, id_b long")


def deterministic_planes(n_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplanes derived from md5 — reproducible everywhere, no RNG."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"plane:{p}:{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def hyperplane_lsh_buckets(corpus: DataFrame, n_planes: int = 8,
                           dim: int = 64, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """(id, bucket) where bucket is the n-bit sign pattern of the vector
    against the deterministic hyperplanes."""
    planes = deterministic_planes(n_planes, dim)
    v = _to_double(F.col(vec_col))
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in planes[p]])
        proj = dot(v, plane)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return corpus.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 8, dim: int = 64, id_col: str = "vec_id",
             vec_col: str = "embedding", query_id_col: str = "query_id") -> DataFrame:
    """ANN top-k: exact cosine ranking restricted to the query's LSH bucket.
    Recall < 1.0 by construction; raise n_planes for smaller buckets or
    multi-probe for higher recall."""
    cb = hyperplane_lsh_buckets(corpus, n_planes, dim, id_col, vec_col)
    qb = hyperplane_lsh_buckets(
        queries, n_planes, dim, query_id_col, vec_col
    ).withColumnRenamed(query_id_col, "__qid")
    q = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    ).join(qb, "__qid")
    c = corpus.join(cb, id_col)
    scored = c.join(F.broadcast(q), "bucket").filter(
        F.col(id_col) != F.col("__qid")
    ).select(
        F.col("__qid").alias(query_id_col),
        F.col(id_col),
        cosine_arrow(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_lists: int = 16, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-flat ANN: coarse quantizer -> inverted lists -> probe -> exact
    re-score.  The third leg of the ANN family (brute-force `cosine_topk`,
    hash-bucketed `lsh_topk`, cluster-bucketed `ivf_topk`).

    Centroids are the ``n_lists`` corpus vectors with the smallest
    ``md5(id)`` — a deterministic seed draw, so the whole index is a pure
    function of the data and admits an exact SQL oracle.  (At scale you'd
    Lloyd-iterate centroids on a sample first; every downstream step —
    assignment, probing, re-scoring — is unchanged.)

    Scale shape: centroid set is broadcast (tiny); assignment is one
    map-side ``max_by`` aggregate over a broadcast nested-loop score (the
    same O(n x n_lists) a BLAS matmul does, no shuffle of the corpus);
    the probe join hash-partitions candidates by list id, so the exact
    re-score touches only ``n_probe / n_lists`` of the corpus per query.
    """
    # deterministic centroid draw; orderBy+limit plans as a distributed
    # TakeOrderedAndProject (never a single-partition global window)
    cents = F.broadcast(
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_lists)
        .select(F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec"))
    )

    # inverted-list assignment: nearest centroid per vector via max_by on
    # (sim, -cid) — partial aggregation, ties broken to the smallest cid
    assign = (
        corpus.crossJoin(cents)
        .select(
            F.col(id_col),
            F.col("__cid"),
            cosine_arrow(F.col(vec_col), F.col("__cvec")).alias("__sim"),
        )
        .groupBy(id_col)
        .agg(
            F.max_by(
                "__cid", F.struct(F.col("__sim"), (-F.col("__cid")).alias("__t"))
            ).alias("__list")
        )
    )

    qs = queries.select(
        F.col(query_id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    wp = Window.partitionBy("__qid").orderBy(
        F.col("__sim").desc(), F.col("__cid").asc()
    )
    probes = (
        qs.crossJoin(cents)
        .select(
            "__qid", "__cid",
            cosine_arrow(F.col("__qvec"), F.col("__cvec")).alias("__sim"),
        )
        .withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= n_probe)
        .select("__qid", F.col("__cid").alias("__list"))
    )

    scored = (
        corpus.join(assign, id_col)
        .join(F.broadcast(probes), "__list")
        .join(F.broadcast(qs), "__qid")
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col(id_col),
            cosine_arrow(F.col(vec_col), F.col("__qvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def quantize_int8(corpus: DataFrame, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization: (id, pos, q, scale) rows.

    ``scale = max|v| / 127`` per vector; ``q = floor(v/scale + 0.5)`` — the
    rounding is spelled out as explicit floor arithmetic instead of
    ``round()`` because engines disagree on tie behavior (HALF_UP vs
    half-away-from-zero vs banker's); ``floor(x + 0.5)`` is the same
    bit-for-bit everywhere.  4x memory cut for ANN serving; the exploded
    (id, pos, q) layout is the hash-checkable form (array columns don't
    compare portably), and ``q * scale`` reconstructs to within scale/2.
    Zero vectors get the 1e-30 floor so q is 0, never NaN.
    """
    maxabs = F.array_max(F.transform(F.col(vec_col),
                                     lambda x: F.abs(x.cast("double"))))
    scale = F.greatest(maxabs, F.lit(1e-30)) / F.lit(127.0)
    return corpus.select(
        F.col(id_col), scale.alias("scale"),
        F.posexplode(F.col(vec_col)).alias("pos", "__v"),
    ).select(
        id_col,
        "pos",
        F.floor(F.col("__v").cast("double") / F.col("scale") + F.lit(0.5))
        .cast("int")
        .alias("q"),
        "scale",
    )
