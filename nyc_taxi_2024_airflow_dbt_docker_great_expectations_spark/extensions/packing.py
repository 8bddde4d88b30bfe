"""Sequence packing and global corpus ordering for LLM training pipelines.

Both operators need a GLOBAL running total over a defined row order — the
textbook place where a naive Spark plan collapses: ``Window.orderBy(id)``
with no partition key plans a single-partition window, so one task scans
the whole corpus.  At 100 TB that is not slow, it is impossible.

``_with_prefix_sum`` implements the classic two-phase distributed prefix
sum instead:

1. range-partition by the order key (partition *i*'s keys all sort before
   partition *i+1*'s — ``repartitionByRange`` guarantees this), and
   materialize ONCE so phases see identical partition boundaries (range
   boundaries come from sampling and would otherwise differ between jobs);
2. aggregate one ``(partition, sum)`` row per partition — the collected
   "totals" are metadata-sized (one row per partition, never per data row);
3. add each partition's exclusive offset + the partition-LOCAL running sum
   in a single ``mapInPandas`` pass (rows are already sorted within the
   partition; every partition works in parallel, no further exchange).

The result is a global exclusive prefix sum with two scans of the data and
a driver footprint of O(partitions).  Phase 3 is deliberately NOT a
``Window.partitionBy(spark_partition_id())``: the range layout satisfies
that distribution physically, but ``spark_partition_id`` is opaque to
Catalyst, which would insert a second (redundant) 1x-data hash exchange to
prove it.  ``mapInPandas`` is narrow — the data moves once.

Built on top of it:

- ``pack_sequences``: the GPT-style concat-and-split batching step — lay
  all documents end-to-end in ``id`` order and cut the token stream every
  ``budget`` tokens.  A document overlapping a cut is split across the two
  sequences (that is the semantics of packed pre-training batches; no
  padding, no discarded tail except the final partial sequence).  Output is
  one row per (document x sequence) segment, which is exactly the manifest
  a downstream tokenizer/loader needs to assemble shards.
- ``global_shuffle``: a deterministic full-corpus shuffle — every row gets
  a pseudorandom md5 sort key and a GLOBAL 0-based position.  Training
  wants data order decorrelated from ingest order, and reproducibly so:
  the position is a pure function of (data, salt), so re-runs, resumes,
  and the SQL oracle agree row-for-row.  ``shard(budget)`` then falls out
  as ``pos div rows_per_shard``.

Integer division is spelled ``div`` (Spark) / ``//`` (DuckDB): token
offsets at 100 TB scale exceed 2^53, where float ``floor(x / b)`` silently
rounds; ``div`` stays in 64-bit integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..execution import materialize_once
from .text import token_count


def _with_prefix_sum(df: DataFrame, order_col: str, val_col: str,
                     out_col: str = "offset") -> DataFrame:
    """Add ``out_col`` = global EXCLUSIVE prefix sum of ``val_col`` in
    ``order_col`` order, without a single-partition window.

    ``order_col`` must be unique (it totally orders the rows).  Returns the
    input columns plus ``out_col``.

    Plan shape (asserted in tests/test_plans.py): the data crosses exactly
    ONE exchange — the range partitioning, which lives inside the
    materialized phase-1 job.  The final plan is a narrow
    scan -> MapInPandas chain: no Window, no second exchange.  Arrow
    batches arrive in partition row order, so the per-partition running
    sum is a sequential fold over the batches.
    """
    # LAZY checkpoint (r14): the offsets collect right below is the
    # first action and materializes the cache in ITS job — the eager form
    # paid a second, serial materialization job per call (guide §2: remove
    # the barrier; the range boundaries still come from ONE sampling, so
    # both phases keep identical partitioning)
    ranged = materialize_once(
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id()),
        storage="lazy",
    )
    # one row per partition: metadata-sized regardless of data volume
    totals = {
        r["__pid"]: r["total"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(val_col).alias("total"))
        .collect()
    }
    running, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid] or 0

    out_schema = StructType(
        ranged.drop("__pid").schema.fields
        + [StructField(out_col, LongType(), False)]
    )

    def add_offsets(iterator):
        import numpy as np

        base = None
        local = 0
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if base is None:  # one partition == one __pid by construction
                base = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            vals = pdf[val_col].to_numpy(dtype="int64")
            cum = np.cumsum(vals)
            out = pdf.drop(columns=["__pid"])
            out[out_col] = base + local + cum - vals
            local += int(cum[-1])
            yield out

    return ranged.mapInPandas(add_offsets, out_schema)


def global_rank(df: DataFrame, order, out_col: str = "rank"):
    """Add ``out_col`` = 1-based GLOBAL rank of each row under ``order``
    (a list of Column sort expressions, e.g. ``[F.col("p").desc(),
    F.col("k")]``), plus return the total row count — without an
    unpartitioned window.

    ``order`` must be a strict total order (include a unique tiebreak
    column): range partitioning splits equal keys arbitrarily across a
    boundary, so ties would make border ranks nondeterministic.

    Same two-phase plan as :func:`_with_prefix_sum` (rank is the exclusive
    prefix sum of ones, plus one): ONE range exchange inside the
    materialized phase-1 job, O(partitions) driver rows for the offsets,
    then a narrow ``mapInPandas`` that adds ``offset + local position``.
    No Window, no second exchange — this is the scale-safe replacement for
    ``Window.orderBy(...)`` global NTILE/ROW_NUMBER on unbounded input.

    Returns ``(ranked_df, n_total)``; the phase-1 materialization makes
    the call eager.
    """
    order = list(order)
    # lazy checkpoint: the counts collect below materializes it (r14 —
    # one job per call instead of the eager form's two; see
    # _with_prefix_sum)
    ranged = materialize_once(
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id()),
        storage="lazy",
    )
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    running, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    out_schema = StructType(
        ranged.drop("__pid").schema.fields
        + [StructField(out_col, LongType(), False)]
    )

    def add_rank(iterator):
        import numpy as np

        base, local = None, 0
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if base is None:  # one partition == one __pid by construction
                base = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            out = pdf.drop(columns=["__pid"])
            out[out_col] = base + local + np.arange(1, len(pdf) + 1,
                                                    dtype="int64")
            local += len(pdf)
            yield out

    return ranged.mapInPandas(add_rank, out_schema), running


def grouped_global_rank(df: DataFrame, group_col: str, order,
                        out_col: str = "rank", n_col: str | None = None,
                        max_cells: int = 1_000_000):
    """Per-GROUP 1-based rank of each row under ``order``, without a
    ``Window.partitionBy(group)`` — the skew-safe form for the
    few-groups/huge-groups regime (per-source quality percentiles,
    per-split orderings): a partitioned window serializes each group's
    full row set through ONE task's sort, so a 40%-of-corpus source
    becomes a 40%-of-corpus task.  Here the data range-partitions on
    (group, *order) — every group spans as many partitions as its volume
    needs — and ranks assemble as offset + partition-local position, the
    same two-phase prefix-sum plan as :func:`global_rank`.

    Phase 2 collects one ``(partition, group, n)`` row per group-fragment;
    range layout makes a group occupy a CONTIGUOUS partition run, so the
    cell count is bounded by ``n_partitions + n_groups`` — checked against
    ``max_cells`` with a loud raise (a group column with entity-level
    cardinality belongs in an ordinary partitioned window instead: groups
    are small there, and this primitive's driver state would not be).

    ``order`` must totally order rows WITHIN a group (include a unique
    tiebreak); NULL group keys must be filtered by the caller (they would
    need engine-specific NULL ordering semantics the range partitioner
    does not promise).  ``n_col`` optionally emits each row's group total
    (for percentile = (rank-1)/(n-1) normalizations) from the same
    driver-side cells — no extra scan or join.

    Returns ``(ranked_df, totals)`` where ``totals`` maps group key ->
    row count; the phase-1 materialization makes the call eager.
    """
    order = list(order)
    # lazy checkpoint: the cells collect below materializes it (r14)
    ranged = materialize_once(
        df.repartitionByRange(F.col(group_col), *order)
        .sortWithinPartitions(F.col(group_col), *order)
        .withColumn("__pid", F.spark_partition_id()),
        storage="lazy",
    )
    cells = (
        ranged.groupBy("__pid", group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .limit(max_cells + 1)
        .collect()
    )
    if len(cells) > max_cells:
        raise ValueError(
            f"grouped_global_rank: >{max_cells} (partition, group) cells — "
            f"{group_col!r} looks entity-cardinality; use a partitioned "
            "window (groups that numerous are individually small)")
    by_group: dict = {}
    for r in cells:
        if r[group_col] is None:
            raise ValueError(
                "grouped_global_rank: NULL group keys present — filter "
                "them out (range partitioning does not promise an "
                "engine-portable NULL order)")
        by_group.setdefault(r[group_col], []).append((r["__pid"], r["n"]))
    offsets: dict = {}
    totals: dict = {}
    for g, frags in by_group.items():
        run = 0
        for pid, n in sorted(frags):
            offsets[(pid, g)] = run
            run += n
        totals[g] = run

    extra = [StructField(out_col, LongType(), False)]
    if n_col is not None:
        extra.append(StructField(n_col, LongType(), False))
    out_schema = StructType(ranged.drop("__pid").schema.fields + extra)

    def add_rank(iterator):
        import numpy as np
        import pandas as pd

        pid = None
        local: dict = {}  # per-group rows already emitted this partition
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            if pid is None:  # one partition == one __pid by construction
                pid = int(pdf["__pid"].iloc[0])
            labels, uniques = pd.factorize(pdf[group_col])
            base = np.array(
                [offsets.get((pid, g), 0) + local.get(g, 0)
                 for g in uniques], dtype="int64")
            within = pd.Series(labels).groupby(labels).cumcount().to_numpy()
            out = pdf.drop(columns=["__pid"])
            out[out_col] = base[labels] + within + 1
            if n_col is not None:
                out[n_col] = np.array(
                    [totals.get(g, 0) for g in uniques],
                    dtype="int64")[labels]
            counts = np.bincount(labels)
            for i, g in enumerate(uniques):
                local[g] = local.get(g, 0) + int(counts[i])
            yield out

    return ranged.mapInPandas(add_rank, out_schema), totals


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", budget: int = 512) -> DataFrame:
    """Concat-and-split packing: documents laid end-to-end in ``id_col``
    order, cut into fixed ``budget``-token sequences.

    One output row per (document, sequence) overlap:

    - ``seq_id``     — 0-based sequence number the segment lands in
    - ``n_tokens``   — the document's total token count
    - ``seg_tokens`` — tokens of this document inside this sequence
    - ``seg_offset`` — position within the sequence where the segment starts

    Empty documents (0 tokens) occupy no span and are dropped.  A document
    with ``n_tokens > budget`` spans multiple rows — segments always tile
    the document exactly: ``sum(seg_tokens) group by doc = n_tokens``.
    """
    return pack_precounted(
        df.select(F.col(id_col),
                  token_count(text_col).cast("long").alias("n_tokens")),
        id_col=id_col, count_col="n_tokens", budget=budget,
    )


def pack_precounted(df: DataFrame, id_col: str = "doc_id",
                    count_col: str = "n_tokens",
                    budget: int = 512) -> DataFrame:
    """``pack_sequences`` over PRE-COMPUTED per-document token counts —
    the form a real pipeline uses once exact tokenizer counts exist
    (e.g. ``text.bpe_encode``'s ``n_bpe_tokens``): the whitespace
    estimate packs to approximate budgets; exact counts pack to the
    byte-exact sequence boundaries the training loader will see.

    ``df``: (id, count).  Same output contract and the same single-exchange
    distributed-prefix-sum plan as :func:`pack_sequences`.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = df.select(
        F.col(id_col), F.col(count_col).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    spanned = _with_prefix_sum(base, id_col, "n_tokens", out_col="start")
    # one shared constant for both forms: `div` (64-bit integer division —
    # float floor(x/b) silently rounds above 2^53) has no Column-API
    # operator, hence the F.expr spelling for the span bounds
    bi = int(budget)
    b = F.lit(bi).cast("long")
    end = F.col("start") + F.col("n_tokens")
    seq = F.explode(
        F.sequence(F.expr(f"start div {bi}"),
                   F.expr(f"(start + n_tokens - 1) div {bi}"))
    ).alias("seq_id")
    seg_start = F.greatest(F.col("start"), F.col("seq_id") * b)
    seg_end = F.least(end, (F.col("seq_id") + 1) * b)
    return (
        spanned.select(id_col, "n_tokens", "start", seq)
        .select(
            F.col(id_col),
            F.col("seq_id").cast("long").alias("seq_id"),
            F.col("n_tokens"),
            (seg_end - seg_start).cast("long").alias("seg_tokens"),
            (seg_start - F.col("seq_id") * b).cast("long").alias("seg_offset"),
        )
    )


def global_shuffle(df: DataFrame, id_col: str = "doc_id",
                   salt: str = "shuf") -> DataFrame:
    """Deterministic global shuffle: adds ``pos`` — the row's 0-based
    position in ``(md5(salt:id), id)`` order across the WHOLE corpus.

    The md5 key decorrelates training order from ingest order; the prefix
    sum (of 1s) turns it into a stable global index with no single-partition
    window.  Output partitioning is range-partitioned by the shuffle key,
    so writing shards in ``pos`` order needs no further exchange.
    """
    key = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    keyed = df.withColumn("__skey", key).withColumn("__one", F.lit(1).cast("long"))
    out = _with_prefix_sum(keyed, "__skey", "__one", out_col="pos")
    return out.drop("__one", "__skey")


def write_training_shards(df: DataFrame, path: str,
                          rows_per_shard: int = 1024,
                          id_col: str = "doc_id",
                          salt: str = "shuf") -> int:
    """Materialize the corpus as numbered training shards: global_shuffle
    order -> ``shard = pos div rows_per_shard`` -> one directory per shard
    (``partitionBy("shard")``).  Returns the shard count.

    The write is the whole point of the deterministic shuffle: a training
    job reads shard k and gets the SAME rows in the same set on any re-run
    or engine, so resumable data loading needs only a shard cursor.  The
    shuffle output is already range-partitioned by the md5 sort key and
    ``pos`` is monotone within each partition, so rows land in few shard
    directories per task — the write does not re-shuffle.
    """
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    shuffled = global_shuffle(df, id_col=id_col, salt=salt)
    out = shuffled.withColumn(
        "shard", F.expr(f"pos div {int(rows_per_shard)}")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    # shard count from the (checkpointed, narrow) lineage — never by
    # re-listing and re-scanning everything just written
    top = out.agg(F.max("pos").alias("m")).first()["m"]
    return 0 if top is None else int(top) // int(rows_per_shard) + 1


def shard_manifest(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Release manifest for a hash-sharded corpus drop: per shard, the
    counts and an ORDER-INDEPENDENT content signature a consumer can
    recompute to verify their copy — the reproducibility primitive
    behind "did we both load the same data?" for multi-site training.

    - ``shard_id`` = md5-derived hash of the id mod ``n_shards``
      (content-independent routing: a doc's shard never changes when
      text is cleaned, so manifests across pipeline versions align).
    - ``content_sig`` = BIT_XOR over a per-row 60-bit signature of
      (id, md5(text)).  XOR is commutative/associative with O(1)
      aggregation state, so the signature is independent of row order,
      partitioning, and engine — and any single flipped/missing/extra
      row changes it.  (A sum would need overflow handling; a sorted
      concat would need per-group materialization.  XOR needs neither.)
    - token totals are integer-exact.

    Scale shape: ONE partial/final hash aggregate keyed on shard_id —
    map-side combine folds every per-row signature/count immediately, so
    the exchange carries ``n_shards`` rows regardless of corpus size.
    """
    from .text import token_count

    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    sid = F.col(id_col).cast("string")
    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), sid)), 1, 8),
               16, 10).cast("long") % F.lit(int(n_shards))
    ).cast("int")
    sig = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sig:"), sid, F.lit(":"),
                           F.md5(F.col(text_col)))),
            1, 15),
        16, 10,
    ).cast("long")
    per_doc = df.select(
        shard.alias("shard_id"),
        F.col(id_col).alias("__id"),
        token_count(text_col).cast("long").alias("__toks"),
        sig.alias("__sig"),
    )
    return per_doc.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__toks").cast("long").alias("total_tokens"),
        # natural id type preserved: a string id yields lexicographic
        # min/max rather than silently NULLing through a long cast
        F.min("__id").alias("min_doc_id"),
        F.max("__id").alias("max_doc_id"),
        F.expr("bit_xor(__sig)").cast("long").alias("content_sig"),
    )


def assemble_dialogs(events: DataFrame, budget: int,
                     user_col: str = "user_id", ts_col: str = "ts",
                     seq_col: str = "event_id", token_col: str = "event_type",
                     sep: str = " ") -> DataFrame:
    """Conversation/trajectory assembly: turn an event log into one
    model-ready training sequence per user — the step that builds
    chat/agent-trajectory corpora out of raw interaction logs (each
    user's events, in time order, concatenated up to a ``budget``-event
    context window, oldest-first truncation accounting included).

    Determinism: ``collect_list`` order is shuffle-dependent, so the
    events are collected as ``(ts, seq, token)`` structs and
    ``array_sort``-ed INSIDE the row — struct comparison is
    lexicographic, and ``seq_col`` (unique) breaks timestamp ties, so
    the assembled string is a pure function of the data on any engine
    and any partitioning.

    Plan shape at 100 TB: ONE partial/final hash aggregate keyed on the
    user — the collect shuffles exactly the (token, ts, seq) triples
    that the output string carries, nothing wider; the sort + slice +
    concat run row-local post-aggregation.  No window, no join.  Skewed
    power users bound the per-row state at ``budget`` tokens OUTPUT, but
    the collected array is the user's full history — for corpora where
    single keys exceed executor memory, pre-filter with a windowed
    top-``budget``-per-user pass (WindowGroupLimit prunes map-side)
    before assembling.

    Returns ``(user_col, n_events, n_kept, dialog)``: total events,
    events kept after truncation, and the assembled sequence string.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    triple = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(seq_col).alias("seq"),
        F.col(token_col).alias("tok"),
    )
    agged = (
        events.filter(F.col(user_col).isNotNull()
                      & F.col(ts_col).isNotNull()
                      & F.col(seq_col).isNotNull()
                      & F.col(token_col).isNotNull())
        .groupBy(user_col)
        .agg(F.collect_list(triple).alias("__evs"))
    )
    ordered = F.array_sort(F.col("__evs"))
    kept = F.slice(ordered, 1, budget)
    return agged.select(
        F.col(user_col),
        F.size("__evs").cast("long").alias("n_events"),
        F.least(F.size("__evs"), F.lit(budget)).cast("long")
        .alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["tok"]), sep)
        .alias("dialog"),
    )
