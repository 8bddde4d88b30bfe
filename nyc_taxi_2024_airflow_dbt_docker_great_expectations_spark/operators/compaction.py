"""Small-file compaction for parquet table paths.

The silent killer of a long-lived 100 TB lake: every incremental merge,
streaming micro-batch, and backfill writes a few files, and a year later a
"table" is ten million 2 MB parquet files.  Scans then pay per-file open +
footer-parse + task-schedule overhead that dwarfs the I/O, and the
NameNode/object-store listing itself becomes the bottleneck.

``compact_parquet`` rewrites a path to ~``target_bytes`` files:

- sizes come from the filesystem via Hadoop's ``FileSystem`` API (works on
  file://, hdfs://, s3a:// alike), never from counting rows;
- ``repartition(n)`` round-robins for uniform file sizes, or
  ``repartitionByRange(sort_cols)`` to cluster the data while compacting
  (range-clustered files give min/max footer statistics real pruning
  power — compaction is the natural moment to impose sort order);
- the rewrite goes to a sibling temp dir, then swaps.  The swap is
  delete+rename — atomic on HDFS-like filesystems, NOT on S3; an object
  store deployment should point readers at a manifest/table format and
  treat this as the rewrite step only.

Returns (files_before, files_after) so pipelines can log/alert on
compaction ratios.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` (recursive, skips hidden
    and _SUCCESS-style marker files)."""
    fs, hpath = _fs_and_path(spark, path)
    it = fs.listFiles(hpath, True)
    n, total = 0, 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n += 1
        total += st.getLen()
    return n, total


def compact_parquet(spark: SparkSession, path: str,
                    target_bytes: int = 128 * 1024 * 1024,
                    sort_cols: list[str] | None = None) -> tuple[int, int]:
    """Rewrite the parquet files under ``path`` into ~``target_bytes``
    files; returns (files_before, files_after).

    With ``sort_cols`` the rewrite range-clusters on those columns (global
    sort across output files), so each file covers a narrow key range and
    min/max pruning actually prunes.
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    before, total = dir_stats(spark, path)
    n_out = max(1, math.ceil(total / target_bytes))
    df: DataFrame = spark.read.parquet(path)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)

    # Swap via rename-aside, never delete-then-rename: the table path must
    # hold data at every instant.  path -> path__old, tmp -> path, then drop
    # path__old; a crash mid-swap leaves either the old data live or both
    # dirs present, and recovery is a rename — not a restore from backup.
    old = path.rstrip("/") + "__compact_old"
    fs, hpath = _fs_and_path(spark, path)
    _, tmp_path = _fs_and_path(spark, tmp)
    _, old_path = _fs_and_path(spark, old)
    if fs.exists(old_path):  # leftover from a crashed previous compaction
        fs.delete(old_path, True)
    if not fs.rename(hpath, old_path):
        raise IOError(f"rename {path} -> {old} failed; table untouched, "
                      f"new data is in {tmp}")
    if not fs.rename(tmp_path, hpath):
        fs.rename(old_path, hpath)  # roll back: restore the live table
        raise IOError(f"rename {tmp} -> {path} failed; old data restored")
    fs.delete(old_path, True)
    after, _ = dir_stats(spark, path)
    return before, after
