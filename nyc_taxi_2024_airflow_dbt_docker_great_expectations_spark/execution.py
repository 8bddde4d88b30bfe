"""Shared execution primitives used across operators.

One canonical way to materialize a multi-consumer intermediate.  Two
distinct problems share this single fix:

1. **Multi-consumer recompute**: a DataFrame feeding k plan branches (e.g.
   the shingle base feeding postings + both verify sides, or an edge list
   feeding every label-propagation round) re-executes its whole lineage per
   consumer unless materialized.
2. **CollapseProject re-inlining**: Catalyst inlines a projected expression
   into every downstream column that references it, so k columns reading one
   expensive array each re-run the computation (measured 10x+ slowdowns).
   Projections do not collapse across a materialization boundary.

``localCheckpoint`` solves both at once: it truncates lineage (fence +
no-recompute) and caches the result MEMORY_AND_DISK.  When the intermediate
is too large for cluster memory to be a sensible home — the 100 TB case —
``storage="disk"`` persists DISK_ONLY instead (an ``InMemoryRelation`` is
still a projection fence, and DISK_ONLY never evicts executor heap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize_once(df: DataFrame, storage: str = "memory") -> DataFrame:
    """Compute ``df`` once; serve every downstream consumer from the result.

    ``storage="memory"``: eager ``localCheckpoint`` (MEMORY_AND_DISK cache,
    lineage truncated).  ``storage="disk"``: eager ``persist(DISK_ONLY)`` —
    the escape hatch for intermediates larger than cluster memory.
    ``storage="lazy"``: ``localCheckpoint(eager=False)`` — the first
    ACTION over the result materializes the cache, so a caller whose very
    next statement is itself an action (the prefix-sum offset collects in
    packing.py) pays ONE job where the eager form pays two (materialize,
    then aggregate-from-cache); r12's MEASUREMENTS table showed the same
    eager-vs-lazy split was the 6.6x culprit in the iterative CC rounds.
    Only safe when the caller serializes its own first action before any
    fan-out — concurrent first consumers of a lazy checkpoint would race
    to compute it.
    """
    if storage == "disk":
        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # eager: populate before fan-out so consumers never race
        return out
    if storage == "lazy":
        return df.localCheckpoint(eager=False)
    if storage != "memory":
        raise ValueError(
            f"storage must be 'memory', 'disk' or 'lazy', got {storage!r}")
    return df.localCheckpoint(eager=True)


def rep_tags(df, key_cols, id_col: str, with_mult: bool = True):
    """Tag every row with its duplicate-group representative (min
    ``id_col`` per identical ``key_cols`` value) and, optionally, the
    group size — the shared first step of every multiplicity-collapsed
    pair engine and persisted index in this repo: ONE window exchange on
    the group key yields the rep filter (``id == __rep``), the member
    expansion map (``__rep -> id``), and the copy count (``__mult``)
    that keeps document-frequency semantics copy-exact.

    ``key_cols`` is a column name, Column, or list of either (composite
    keys, e.g. a side tag + the content key).  Spark window keys
    normalize NaN and -0.0 like group keys do, which only merges values
    that are semantically identical for every downstream consumer.
    """
    from pyspark.sql import Window, functions as F

    keys = key_cols if isinstance(key_cols, (list, tuple)) else [key_cols]
    w = Window.partitionBy(*keys)
    cols = [F.min(id_col).over(w).alias("__rep")]
    if with_mult:
        cols.append(F.count(F.lit(1)).over(w).alias("__mult"))
    return df.select("*", *cols)


def expand_member_pairs(rep_pairs, members, value_cols,
                        rep_col: str = "__rep",
                        member_col: str = "__member"):
    """The shared tail of every multiplicity-collapsed pair engine: fan
    rep-level pair rows ``(id_a, id_b, *value_cols)`` back out to
    id-level through the rep -> member map.  Self markers
    (``id_a == id_b``) expand to each unordered member pair exactly
    once; cross pairs to the full bipartite product (member id sets are
    disjoint by construction).  Output is ``(id_a, id_b, *value_cols)``
    with ``id_a < id_b`` — byte-identical to running the uncollapsed
    engine.  Engines whose carried values depend on pair orientation
    (e.g. fuzzy matching's text columns) keep their bespoke tails."""
    from pyspark.sql import functions as F

    value_cols = list(value_cols)
    ma = members.select(F.col(rep_col).alias("id_a"),
                        F.col(member_col).alias("__ma"))
    mb = members.select(F.col(rep_col).alias("id_b"),
                        F.col(member_col).alias("__mb"))
    return (
        rep_pairs.join(ma, "id_a").join(mb, "id_b")
        .filter((F.col("id_a") != F.col("id_b"))
                | (F.col("__ma") < F.col("__mb")))
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            *value_cols,
        )
    )


def has_verbatim_copies(df, key_cols) -> bool:
    """Cheap pre-collapse guard: does ANY duplicate group exist under
    ``key_cols``?  On a corpus with no verbatim copies, :func:`rep_tags`'
    window and the member-expansion joins are identity maps — pure
    overhead (measured +17-44% on the pair engines) — so engines call
    this first and skip the collapse machinery when it returns False.

    ONE partially-aggregated pass comparing ``count`` to
    ``count_distinct`` of a 64-bit key hash: the shuffle carries
    map-side-deduped longs, far lighter than the window's full-row
    exchange on the content key.  A hash collision can only under-count
    distinct values — a false True that takes the (always-correct)
    collapse path; never a false False.
    """
    from pyspark.sql import functions as F

    keys = key_cols if isinstance(key_cols, (list, tuple)) else [key_cols]
    n, nd = df.agg(
        F.count(F.lit(1)), F.count_distinct(F.xxhash64(*keys))
    ).first()
    return n != nd


class IterativeState:
    """Round-state manager for iterative algorithms (star contraction,
    greedy k-center): each round's frame is persisted LAZILY, so the
    round's own first action materializes it — one job per round instead
    of the eager-checkpoint-plus-action two — and superseded rounds are
    unpersisted explicitly once their successor is materialized.  Every
    ``chain_cut`` rounds one eager ``localCheckpoint`` truncates the
    logical plan: persist alone does not cut lineage, and ~32 stacked
    rounds overflow the JVM stack (measured, round 12); checkpointing
    EVERY round was the coreset_select bench flip-flop culprit
    (MEASUREMENTS.md — page-cache-sensitive and slower in both states).

    Protocol::

        state = IterativeState()
        while ...:
            frame = state.advance(build_next(frame))
            ... run an action on frame ...   # materializes the persist
            state.settle()                   # drop superseded rounds
        # the NEWEST frame stays cached for downstream consumers;
        # call close() instead when nothing downstream reads it.
    """

    def __init__(self, chain_cut: int = 8):
        if chain_cut < 1:
            raise ValueError(f"chain_cut must be >= 1, got {chain_cut}")
        self.chain_cut = chain_cut
        self._depth = 0
        self._frames: list[DataFrame] = []  # oldest -> newest, all cached

    def advance(self, df: DataFrame) -> DataFrame:
        """Register the next round's frame.  Returns a lazily persisted
        frame (or, at the depth cap, an eagerly checkpointed one — the
        checkpoint must materialize BEFORE its parents are dropped)."""
        if self._depth + 1 >= self.chain_cut:
            out = df.localCheckpoint(eager=True)
            self._drop_superseded(keep=0)  # lineage cut: parents disposable
            self._depth = 0
        else:
            out = df.persist(StorageLevel.MEMORY_AND_DISK)
            self._depth += 1
        self._frames.append(out)
        return out

    def settle(self) -> None:
        """Unpersist every frame except the newest — call AFTER an action
        has materialized the newest frame (dropping a parent earlier
        would force the child to recompute its lineage from scratch)."""
        self._drop_superseded(keep=1)

    def close(self) -> None:
        """Unpersist everything, newest included — for algorithms whose
        result is driver-side state rather than the final frame."""
        self._drop_superseded(keep=0)

    def _drop_superseded(self, keep: int) -> None:
        while len(self._frames) > keep:
            self._frames.pop(0).unpersist()
