"""Small-file compaction (operators/compaction.py) — the ONE maintenance
primitive (the earlier operators/layout.py duplicate was folded in)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.compaction import (
    _aside_name,
    compact_parquet,
    dir_stats,
)


def _fragmented_table(spark, path, n_files=40, rows_per_file=50):
    df = spark.range(n_files * rows_per_file).select(
        F.col("id"), (F.col("id") % 7).alias("grp"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    # one file per partition: the classic drip-feed layout
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return df


def test_compact_merges_small_files_preserving_data(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "frag")
    df = _fragmented_table(spark, path)
    want = sorted(r["id"] for r in df.collect())

    n_before, total = dir_stats(spark, path)
    assert n_before == 40
    report = compact_parquet(spark, path, target_bytes=total)
    assert report["rewritten"] is True
    assert (report["files_before"], report["files_after"]) == (40, 1)
    assert report["total_bytes"] == total

    got = spark.read.parquet(path)
    assert sorted(r["id"] for r in got.collect()) == want

    # idempotent: already at/below the target file count -> no rewrite
    report2 = compact_parquet(spark, path, target_bytes=total)
    assert report2["rewritten"] is False
    assert report2["files_after"] == 1

    with pytest.raises(ValueError):
        compact_parquet(spark, path, target_bytes=0)


def test_compact_shuffle_mode_preserves_aggregates(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "frag_sh")
    spark.range(10_000).selectExpr("id", "id * 2 AS v") \
        .repartition(40).write.mode("overwrite").parquet(path)
    report = compact_parquet(spark, path, target_bytes=1 << 30, shuffle=True)
    assert report["rewritten"] is True
    assert report["files_before"] == 40 and report["files_after"] == 1
    agg = spark.read.parquet(path).selectExpr("sum(id) s", "sum(v) sv") \
        .collect()[0]
    assert agg["s"] == 49_995_000 and agg["sv"] == 99_990_000


def test_compact_with_sort_cols_range_clusters(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "frag2")
    _fragmented_table(spark, path)
    _, total = dir_stats(spark, path)
    # ask for ~4 files, clustered on id
    report = compact_parquet(
        spark, path, target_bytes=max(1, total // 4), sort_cols=["id"]
    )
    assert report["files_before"] == 40 and 2 <= report["files_after"] <= 8
    # range clustering: per-file id ranges must not overlap
    got = (
        spark.read.parquet(path)
        .select("id", F.input_file_name().alias("f"))
        .groupBy("f").agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(got, got[1:]):
        assert prev["hi"] < cur["lo"]


def test_compact_leaves_no_tmp_dir(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "frag3")
    _fragmented_table(spark, path, n_files=5)
    compact_parquet(spark, path, target_bytes=1 << 30)
    # no aside dirs left — neither the hidden names nor the pre-round-12
    # visible ones; the parent holds ONLY the table dir
    assert os.listdir(tmp_warehouse) == ["frag3"]
    assert spark.read.parquet(path).count() == 250


def test_compact_aside_names_are_hidden(tmp_warehouse):
    """The in-flight rewrite and renamed-aside old dirs are DOT-prefixed
    siblings: Spark's file index (and this module's own listings) skip
    them, so a concurrent root reader can never see a half-written
    rewrite or a duplicate of a partition mid-swap (round-12 ADVICE)."""
    tmp = _aside_name("/w/tbl/part=3", "__compact_tmp")
    assert tmp == "/w/tbl/.part=3__compact_tmp"
    assert _aside_name("/w/tbl/", "__compact_old") == "/w/.tbl__compact_old"


def test_compact_recovers_stale_hidden_old_dir(spark, tmp_warehouse):
    """A leftover hidden old dir from a crashed run must not block (or
    corrupt) the next compaction — it is reclaimed."""
    path = os.path.join(tmp_warehouse, "frag4")
    _fragmented_table(spark, path, n_files=5)
    old = _aside_name(path, "__compact_old")
    os.makedirs(old)
    with open(os.path.join(old, "junk"), "w") as f:
        f.write("stale")
    report = compact_parquet(spark, path, target_bytes=1 << 30)
    assert (report["files_before"], report["files_after"]) == (5, 1)
    assert not os.path.exists(old)
    assert spark.read.parquet(path).count() == 250


def test_compact_ignores_legacy_visible_aside_dirs(spark, tmp_warehouse):
    """Pre-round-12 layouts left VISIBLE `...__compact_tmp/_old` siblings.
    They must be ignored — never counted by dir_stats, never adopted by
    the leaf scan as a real partition and compacted into place (the
    silent-row-duplication hazard the ADVICE named) — but NOT silently
    deleted: unknown data from a crash is an operator decision."""
    path = os.path.join(tmp_warehouse, "parted_legacy")
    spark.range(300).selectExpr("id", "id % 3 AS part") \
        .repartition(5).write.partitionBy("part") \
        .mode("overwrite").parquet(path)
    # plant a legacy visible aside holding a full duplicate of part=1
    legacy = os.path.join(path, "part=1__compact_tmp")
    spark.read.parquet(os.path.join(path, "part=1")).write.parquet(legacy)
    before, _ = dir_stats(spark, path)
    report = compact_parquet(spark, path, target_bytes=1 << 30)
    assert report["partitions_compacted"] == 3  # not 4
    assert report["files_before"] == before  # duplicate never counted
    assert os.path.exists(legacy)  # ignored, not reclaimed
    # the real leaves hold each row exactly once: the duplicate was not
    # compacted into place (a legacy VISIBLE aside is unavoidably seen by
    # root readers — which is exactly why new asides are dot-hidden)
    live = spark.read.parquet(*[os.path.join(path, f"part={i}")
                                for i in range(3)])
    assert live.count() == 300
    assert live.groupBy("id").count().filter("count > 1").count() == 0


def test_compact_hive_partitioned_per_partition(spark, tmp_warehouse):
    """A hive-partitioned layout is compacted PER LEAF PARTITION: the
    key=value directory structure (and with it partition pruning) must
    survive, while each leaf's small files merge."""
    path = os.path.join(tmp_warehouse, "parted")
    spark.range(3_000).selectExpr("id", "id % 3 AS part") \
        .repartition(10).write.partitionBy("part") \
        .mode("overwrite").parquet(path)
    before, _ = dir_stats(spark, path)
    assert before == 30  # 10 files per partition

    report = compact_parquet(spark, path, target_bytes=1 << 30)
    assert report["rewritten"] is True
    assert report["partitions_compacted"] == 3
    assert report["files_before"] == 30 and report["files_after"] == 3
    # layout preserved: partition dirs still exist, pruning still works
    assert sorted(d for d in os.listdir(path) if d.startswith("part=")) == \
        ["part=0", "part=1", "part=2"]
    df = spark.read.parquet(path)
    assert df.count() == 3_000
    assert df.filter("part = 1").count() == 1_000
    assert df.selectExpr("sum(id) s").collect()[0]["s"] == 4_498_500

    # per_partition=False refuses instead of flattening
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, path, target_bytes=1 << 30,
                        per_partition=False)
