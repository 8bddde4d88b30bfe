"""Small-file compaction (operators/compaction.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nyc_taxi_2024_airflow_dbt_docker_great_expectations_spark.operators.compaction import (
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
    before, after = compact_parquet(spark, path, target_bytes=total)
    assert (before, after) == (40, 1)

    got = spark.read.parquet(path)
    assert sorted(r["id"] for r in got.collect()) == want


def test_compact_with_sort_cols_range_clusters(spark, tmp_warehouse):
    path = os.path.join(tmp_warehouse, "frag2")
    _fragmented_table(spark, path)
    _, total = dir_stats(spark, path)
    # ask for ~4 files, clustered on id
    before, after = compact_parquet(
        spark, path, target_bytes=max(1, total // 4), sort_cols=["id"]
    )
    assert before == 40 and 2 <= after <= 8
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
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")
    assert spark.read.parquet(path).count() == 250


def test_compact_recovers_stale_old_dir(spark, tmp_warehouse):
    """A leftover path__compact_old from a crashed run must not block (or
    corrupt) the next compaction."""
    path = os.path.join(tmp_warehouse, "frag4")
    _fragmented_table(spark, path, n_files=5)
    os.makedirs(path + "__compact_old")
    with open(os.path.join(path + "__compact_old", "junk"), "w") as f:
        f.write("stale")
    before, after = compact_parquet(spark, path, target_bytes=1 << 30)
    assert (before, after) == (5, 1)
    assert not os.path.exists(path + "__compact_old")
    assert spark.read.parquet(path).count() == 250
