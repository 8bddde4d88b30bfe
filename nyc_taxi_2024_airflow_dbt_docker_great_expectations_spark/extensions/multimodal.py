"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the lakehouse-native layout (same shape as HuggingFace datasets' parquet or
Spark's built-in ``binaryFile`` source).  Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes never round-trip through Python row
objects; partitioning and batch shape are the real, tested part.

The actual codec calls (Pillow/ffmpeg/librosa) are NOT available in this
environment, so ``decode_image_meta`` ships two backends:

- ``backend="header"`` (default): a real, deterministic parser for PNG and
  JPEG dimension headers implemented on raw bytes — no external deps;
- ``backend="pil"``: the production path, raising ``NotImplementedError``
  with instructions when Pillow is absent.

At 100 TB: media rows are large and skew-prone — keep
``spark.sql.files.maxPartitionBytes`` small for these tables, never collect,
and push metadata-only predicates (width/format filters) onto the parquet
scan where they prune row groups via statistics.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def parse_image_header(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """Deterministic, dependency-free PNG/JPEG dimension sniffing."""
    if not data:
        return None, None, None
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:2] == b"\xff\xd8":  # JPEG: scan segments for SOFn
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    return "unknown", None, None


def decode_image_meta(df: DataFrame, backend: str = "header") -> DataFrame:
    """Extract image metadata via Arrow-batched ``mapInPandas``.

    The plumbing (schema, batch iteration, zero-copy arrow transfer) is the
    production shape; swap the per-batch function body for a real decoder.
    """
    if backend == "pil":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "backend='pil' needs Pillow, which is not installed in this "
                "environment; use backend='header' or install Pillow on the "
                "cluster image"
            ) from exc

    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            fmts, widths, heights = [], [], []
            for data in pdf["content"]:
                fmt, w, h = parse_image_header(
                    bytes(data) if data is not None else None
                )
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": [
                        len(d) if d is not None else 0 for d in pdf["content"]
                    ],
                }
            )

    return df.select("media_id", "content").mapInPandas(batches, IMAGE_META_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup (no decode): bytes per kind."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.max(F.length("content")).alias("max_bytes"),
    )


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling STUB: real decode needs ffmpeg (absent here).
    The plumbing contract: one input row -> N frame rows, implemented as a
    ``mapInPandas`` fan-out exactly like ``decode_image_meta``."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg bindings absent from this "
        "environment; the mapInPandas fan-out pattern in decode_image_meta "
        "is the implementation template"
    )
