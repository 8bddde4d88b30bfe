"""Sequence packing + global shuffle (extensions/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
    _with_prefix_sum,
    global_rank,
    global_shuffle,
    pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_sum_matches_serial(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 5 + 1) for i in range(100)], "k long, v long"
    )
    out = {r["k"]: r["offset"]
           for r in _with_prefix_sum(df, "k", "v").collect()}
    running = 0
    for i in range(100):
        assert out[i] == running
        running += (i * 7) % 5 + 1


def test_global_rank_matches_window_row_number(spark):
    # composite desc/asc order with duplicate values in the lead column:
    # rank must equal the single-partition ROW_NUMBER reference exactly
    df = spark.createDataFrame(
        [(i, (i * 13) % 7) for i in range(200)], "k long, v long"
    ).repartition(8)
    ranked, n = global_rank(
        df, [F.col("v").desc(), F.col("k")], out_col="r"
    )
    assert n == 200
    got = {r["k"]: r["r"] for r in ranked.collect()}
    expected = sorted(range(200), key=lambda i: (-((i * 13) % 7), i))
    for pos, k in enumerate(expected, start=1):
        assert got[k] == pos


def test_global_rank_stable_across_repeated_actions(spark):
    """r14 lazy-checkpoint guard: the phase-1 range layout is sampled ONCE
    and cached by the offsets collect, so ranks must be identical — not
    just valid — across repeated actions on the returned frame (a
    re-sampled range exchange could legally shift partition boundaries,
    which with stale offsets would corrupt border ranks)."""
    df = spark.createDataFrame(
        [(i, (i * 29) % 11) for i in range(500)], "k long, v long"
    ).repartition(16)
    ranked, n = global_rank(df, [F.col("v"), F.col("k")], out_col="r")
    assert n == 500
    first = sorted((r["k"], r["r"]) for r in ranked.collect())
    for _ in range(3):
        again = sorted((r["k"], r["r"]) for r in ranked.collect())
        assert again == first
    expected = sorted(range(500), key=lambda i: ((i * 29) % 11, i))
    assert first == sorted(
        (k, pos) for pos, k in enumerate(expected, start=1))


def test_pack_sequences_splits_and_tiles(spark):
    # budget 10: doc 1 (7 toks) fills [0,7), doc 2 (8 toks) spans the cut
    df = _docs(spark, [
        (1, "a b c d e f g"),
        (2, "h i j k l m n o"),
        (3, "p q"),
    ])
    rows = sorted(
        pack_sequences(df, budget=10).collect(),
        key=lambda r: (r["doc_id"], r["seq_id"]),
    )
    as_tuples = [(r["doc_id"], r["seq_id"], r["seg_tokens"], r["seg_offset"])
                 for r in rows]
    assert as_tuples == [
        (1, 0, 7, 0),   # doc 1 entirely in seq 0
        (2, 0, 3, 7),   # doc 2 split: 3 tokens finish seq 0 ...
        (2, 1, 5, 0),   # ... 5 tokens open seq 1
        (3, 1, 2, 5),   # doc 3 follows inside seq 1
    ]


def test_pack_sequences_drops_empty_and_spans_long_docs(spark):
    df = _docs(spark, [
        (1, "   "),                        # 0 tokens: no span
        (2, " ".join(["t"] * 25)),         # 25 tokens @ budget 10: 3 seqs
    ])
    rows = pack_sequences(df, budget=10).collect()
    assert {r["doc_id"] for r in rows} == {2}
    segs = sorted((r["seq_id"], r["seg_tokens"]) for r in rows)
    assert segs == [(0, 10), (1, 10), (2, 5)]
    assert sum(s for _, s in segs) == 25


def test_pack_precounted_matches_pack_sequences(spark):
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
        pack_precounted,
    )
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.text import (
        token_count,
    )
    df = _docs(spark, [
        (1, "a b c d e f g"),
        (2, "h i j k l m n o"),
        (3, "p q"),
    ])
    counts = df.select("doc_id", token_count("text").alias("n"))
    via_counts = sorted(
        pack_precounted(counts, count_col="n", budget=10).collect())
    direct = sorted(pack_sequences(df, budget=10).collect())
    assert via_counts == direct
    # non-whitespace counts change the boundaries as given
    bpeish = spark.createDataFrame(
        [(1, 11), (2, 0)], "doc_id long, n long")
    rows = sorted((r["doc_id"], r["seq_id"], r["seg_tokens"])
                  for r in pack_precounted(bpeish, count_col="n",
                                           budget=10).collect())
    assert rows == [(1, 0, 10), (1, 1, 1)]


def test_global_shuffle_is_dense_permutation_and_deterministic(spark):
    df = _docs(spark, [(i, f"doc {i}") for i in range(50)])
    a = {r["doc_id"]: r["pos"] for r in global_shuffle(df).collect()}
    b = {r["doc_id"]: r["pos"] for r in global_shuffle(df).collect()}
    assert a == b                                   # pure function of data
    assert sorted(a.values()) == list(range(50))    # dense 0..n-1
    # a different salt draws a different permutation
    c = {r["doc_id"]: r["pos"]
         for r in global_shuffle(df, salt="other").collect()}
    assert c != a
    assert sorted(c.values()) == list(range(50))


def test_write_training_shards_deterministic(spark, tmp_warehouse):
    import os

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
        write_training_shards,
    )

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("text"),
    )
    p1 = os.path.join(tmp_warehouse, "shards1")
    n1 = write_training_shards(docs, p1, rows_per_shard=16)
    assert n1 == 7  # ceil(100 / 16)
    out = spark.read.parquet(p1)
    assert out.count() == 100
    # every shard except the last is full; shard membership is a pure
    # function of the data, so a second write is byte-for-byte the same rows
    sizes = {r["shard"]: r["n"] for r in out.groupBy("shard")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sorted(sizes) == list(range(7))
    assert all(sizes[s] == 16 for s in range(6)) and sizes[6] == 4
    p2 = os.path.join(tmp_warehouse, "shards2")
    write_training_shards(docs, p2, rows_per_shard=16)
    a = sorted(map(tuple, spark.read.parquet(p1).collect()))
    b = sorted(map(tuple, spark.read.parquet(p2).collect()))
    assert a == b


def test_shard_manifest_detects_single_row_tamper(spark):
    """The XOR content signature is order-independent but any one changed
    row flips exactly its shard's signature: recompute after editing one
    doc's text and after shuffling row order; the shuffled manifest is
    identical, the tampered one differs ONLY in the tampered doc's
    shard."""
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
        shard_manifest,
    )

    rows = [(i, f"doc text number {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {r["shard_id"]: r for r in shard_manifest(df, 4).collect()}

    # row order / partitioning must not matter
    shuffled = df.orderBy(F.rand(7)).repartition(7)
    again = {r["shard_id"]: r for r in shard_manifest(shuffled, 4).collect()}
    assert {k: tuple(v) for k, v in base.items()} == {
        k: tuple(v) for k, v in again.items()}

    # tamper with one doc's text -> only its shard's signature changes
    tampered_rows = [(i, t if i != 17 else t + " TAMPERED")
                     for i, t in rows]
    tam = {r["shard_id"]: r for r in shard_manifest(
        spark.createDataFrame(tampered_rows, "doc_id long, text string"),
        4).collect()}
    changed = [s for s in base
               if base[s]["content_sig"] != tam[s]["content_sig"]]
    assert len(changed) == 1
    # counts are text-independent; the tampered shard's doc count holds
    s = changed[0]
    assert tam[s]["n_docs"] == base[s]["n_docs"]
    assert tam[s]["total_tokens"] == base[s]["total_tokens"] + 1


def test_assemble_dialogs_order_truncation_and_guards(spark):
    from datetime import datetime

    import pytest

    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
        assemble_dialogs,
    )

    t = datetime(2024, 1, 1, 12, 0, 0)
    t2 = datetime(2024, 1, 1, 12, 0, 1)
    rows = [
        # user 1: same-timestamp tie broken by event_id (3 before 7)
        (7, t, 1, "b"), (3, t, 1, "a"), (9, t2, 1, "c"),
        # user 2: more events than budget -> oldest-first truncation
        (1, t, 2, "x"), (2, t, 2, "y"), (4, t2, 2, "z"),
        # NULL guards: dropped rows
        (None, t, 3, "q"), (5, None, 3, "q"), (6, t, None, "q"),
        (8, t, 3, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r["user_id"]: r for r in assemble_dialogs(
        df, budget=2, seq_col="event_id").collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_events"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["dialog"] == "a b"
    assert out[2]["dialog"] == "x y"
    # budget covering everything keeps the full ordered sequence
    full = {r["user_id"]: r["dialog"] for r in assemble_dialogs(
        df, budget=10, seq_col="event_id").collect()}
    assert full[1] == "a b c" and full[2] == "x y z"
    with pytest.raises(ValueError):
        assemble_dialogs(df, budget=0)


def test_grouped_global_rank_matches_window_semantics(spark):
    """grouped_global_rank == ROW_NUMBER() OVER (PARTITION BY g ORDER BY
    v, id) without the single-task-per-group window; totals and the
    optional n_col match the group sizes; NULL groups and cell blowups
    raise loudly."""
    import pytest
    from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.extensions.packing import (
        grouped_global_rank,
    )

    rows = [("a", i, 100 - i) for i in range(1, 8)] + \
           [("b", 10, 5), ("b", 11, 5), ("c", 1, 1)]
    df = spark.createDataFrame(rows, "g string, id int, v int")
    ranked, totals = grouped_global_rank(
        df, "g", [F.col("v").asc(), F.col("id").asc()],
        out_col="rk", n_col="gn")
    got = {(r["g"], r["id"]): (r["rk"], r["gn"]) for r in ranked.collect()}
    assert totals == {"a": 7, "b": 2, "c": 1}
    # group a: v = 100-i descending in i, so rank is reversed id order
    for i in range(1, 8):
        assert got[("a", i)] == (8 - i, 7)
    assert got[("b", 10)] == (1, 2) and got[("b", 11)] == (2, 2)  # tie->id
    assert got[("c", 1)] == (1, 1)

    with pytest.raises(ValueError, match="NULL group keys"):
        grouped_global_rank(
            spark.createDataFrame([(None, 1, 1)], "g string, id int, v int"),
            "g", [F.col("v"), F.col("id")])[0].collect()
    with pytest.raises(ValueError, match="cells"):
        grouped_global_rank(df, "g", [F.col("v"), F.col("id")],
                            max_cells=1)
