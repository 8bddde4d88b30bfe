"""Small-graph operators for dedup-cluster canonicalization.

``connected_components`` turns near-dup *pairs* (from MinHash / SimHash /
n-gram Jaccard / embedding cosine) into dedup *clusters*: every document gets
the minimum doc-id reachable through the near-dup relation, which becomes the
cluster's canonical representative.  Survivors of cluster dedup are the rows
where ``component == id``.

Algorithm: alternating min-label propagation to a fixed point — each
iteration joins the current labels across edges and keeps the elementwise
minimum.  The iteration count is bounded by the graph diameter (near-dup
clusters are tiny cliques, so 2-4 rounds in practice); each round is one
shuffle join + aggregate.  This is the simplified form of the
"large-star / small-star" map-reduce connected-components algorithm — the
shape that scales to billions of edges because state is only (node, label)
pairs, never adjacency lists on the driver.

The driver-side part is ONLY the convergence check (a count of changed
labels), never the data.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

from ..execution import materialize_once


class ConvergenceWarning(UserWarning):
    """Raised (as a warning) when iterative label propagation exhausts
    ``max_iter`` before reaching its fixed point — labels may be wrong."""


def connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
                         max_iter: int = 20, strict: bool = False) -> DataFrame:
    """(node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once, either direction).

    Min-label propagation needs up to graph-diameter rounds; near-dup
    clusters are tiny cliques (2-4 rounds), but a path-shaped graph of
    length > ``max_iter`` would exit NON-converged.  That case warns with
    :class:`ConvergenceWarning` (or raises when ``strict=True``) instead of
    silently returning partial labels; callers with long-chain graphs should
    raise ``max_iter`` (rounds needed ~ diameter; each round is one
    join+aggregate shuffle).
    """
    # materialize the edge list ONCE: it is typically the output of an
    # expensive similarity join, and every propagation round references it —
    # without the checkpoint each iteration would re-execute that join
    edges = materialize_once(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    )
    nodes = (
        edges.select(F.col("__s").alias("node"))
        .unionByName(edges.select(F.col("__d").alias("node")))
        .distinct()
    )
    # symmetric edge list (both directions) so one join step propagates
    # labels across every adjacency
    sym = (
        edges.select(F.col("__s").alias("u"), F.col("__d").alias("v"))
        .unionByName(edges.select(F.col("__d").alias("u"), F.col("__s").alias("v")))
        .distinct()
    )
    labels = nodes.select("node", F.col("node").alias("component"))

    def _label_sum(df: DataFrame) -> int:
        # labels only ever DECREASE under min-propagation, so the label sum
        # strictly decreases until the fixed point: an O(1)-result aggregate
        # replaces a per-iteration join as the convergence check.  decimal
        # accumulator: a billion-node graph overflows a bigint sum.
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = _label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # label(u) candidate via each neighbor v's current label
        propagated = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(propagated)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # materialization truncates the growing lineage (iterative plans
        # otherwise re-execute all prior rounds every action)
        labels = materialize_once(new_labels)
        new_sum = _label_sum(labels)
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        msg = (
            f"connected_components exhausted max_iter={max_iter} without "
            "reaching the label fixed point; component labels may be wrong "
            "for long-chain graphs — raise max_iter"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, ConvergenceWarning, stacklevel=2)
    return labels


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   pair_a: str = "id_a", pair_b: str = "id_b",
                   max_iter: int = 20, strict: bool = False) -> DataFrame:
    """Assign every document its near-dup cluster representative.

    Documents appearing in no pair are their own singleton cluster.  Returns
    (id, component, is_canonical); downstream dedup keeps
    ``is_canonical`` rows only.  ``max_iter``/``strict`` pass through to
    :func:`connected_components` (non-convergence warns or raises).
    """
    comp = connected_components(pairs, pair_a, pair_b, max_iter, strict)
    out = df.select(F.col(id_col)).join(
        comp.withColumnRenamed("node", id_col), id_col, "left"
    )
    out = out.withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    return out.withColumn("is_canonical", F.col("component") == F.col(id_col))


def triangle_count(edges: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Global triangle count — the graph-density / community-structure
    metric (near-dup graphs: triangle-rich components are true duplicate
    cliques; triangle-free stars are often template collisions).

    Input is an undirected edge list with each pair listed once in
    canonical ``src < dst`` order; violations are normalized and exact
    duplicates dropped.  The plan is the standard two-join enumeration over
    canonically ordered edges — each triangle a<b<c is counted exactly
    once as (a,b)+(b,c) with a closing (a,c) semi-join.  Both joins are
    hash equi-joins on node ids; no adjacency lists are materialized
    anywhere, so the shape scales like any other pair of shuffle joins.
    Skewed hubs (one node on millions of edges) are the known hard case —
    AQE skew splitting or a degree-ordered variant (orient edges from low
    to high degree) bounds the fan-out; the latter is the documented
    upgrade path at extreme skew.

    Returns one row: (n_nodes, n_edges, n_triangles).
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = materialize_once(canon)  # consumed three times below
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(F.col("e1.a").alias("a"), F.col("e1.b").alias("b"),
                F.col("e2.b").alias("c"))
    )
    tri = wedge.join(
        e.select(F.col("a").alias("ta"), F.col("b").alias("tc")),
        (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
        "left_semi",
    )
    nodes = e.select(F.col("a").alias("n")).union(
        e.select(F.col("b").alias("n"))
    ).distinct()
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )
