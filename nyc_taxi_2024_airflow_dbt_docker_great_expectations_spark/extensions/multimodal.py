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


# --- audio: dependency-free WAV/RIFF metadata ------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def build_wav(sample_rate: int, channels: int, bits_per_sample: int,
              n_frames: int) -> bytes:
    """Minimal canonical-form PCM WAV (RIFF/fmt/data, silent payload).
    The synthesis twin of :func:`parse_wav_header` — used to exercise the
    binary-column plumbing where no real recordings exist."""
    block_align = channels * bits_per_sample // 8
    data_size = n_frames * block_align
    byte_rate = sample_rate * block_align
    return b"".join([
        b"RIFF", struct.pack("<I", 36 + data_size), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                             byte_rate, block_align, bits_per_sample),
        b"data", struct.pack("<I", data_size), bytes(data_size),
    ])


def parse_wav_header(
    data: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(format, channels, sample_rate, bits_per_sample, n_frames) from a
    RIFF/WAVE byte stream — chunk-walking parser, no audio libs.  Returns
    ``("unknown", None, ...)`` for non-WAV bytes, Nones for empty input."""
    if not data:
        return None, None, None, None, None
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return "unknown", None, None, None, None
    channels = rate = bits = block_align = None
    n_frames = None
    i = 12
    while i + 8 <= len(data):
        cid = data[i:i + 4]
        size = struct.unpack("<I", data[i + 4:i + 8])[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _, channels, rate, _, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif cid == b"data":
            if block_align:
                n_frames = size // block_align
        i += 8 + size + (size % 2)  # RIFF chunks are 2-byte aligned
    return "wav", channels, rate, bits, n_frames


def synth_wav(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id) -> (id, content binary): deterministic synthetic WAV payloads
    with id-derived parameters — rate in {8,16,24} kHz, 1-2 channels, 16-bit,
    100-999 frames.  Arrow-batched; the binary column is built executor-side
    so nothing large crosses the driver."""
    import pandas as pd

    def gen(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "content": [
                    build_wav(8000 * (1 + i % 3), 1 + i % 2, 16, 100 + i % 900)
                    for i in ids
                ],
            })

    return df.select(F.col(id_col)).mapInPandas(
        gen, "media_id long, content binary"
    )


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """WAV metadata extraction via Arrow-batched ``mapInPandas`` — the audio
    twin of :func:`decode_image_meta`.  duration_ms is floor(n_frames * 1000
    / sample_rate), integer-exact on every engine."""
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(data) if data is not None else None
                fmt, ch, rate, bits, frames = parse_wav_header(raw)
                dur = (
                    frames * 1000 // rate
                    if frames is not None and rate else None
                )
                rows.append((mid, fmt, ch, rate, bits, frames, dur,
                             len(raw) if raw is not None else 0))
            out = pd.DataFrame(
                rows, columns=["media_id", "format", "channels", "sample_rate",
                               "bits_per_sample", "n_frames", "duration_ms",
                               "n_bytes"],
            )
            for c in ("channels", "sample_rate", "bits_per_sample"):
                out[c] = pd.array(out[c], dtype="Int32")
            for c in ("n_frames", "duration_ms"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    return df.select("media_id", "content").mapInPandas(
        batches, AUDIO_META_SCHEMA
    )


# --- video: frame sampling over raw byte planes ----------------------------

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("byte_start", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(df: DataFrame, frame_size: int, every_n: int = 10) -> DataFrame:
    """Sample every ``every_n``-th frame from raw fixed-stride video bytes.

    One input row fans out to ceil(n_frames / every_n) frame rows — the
    ``mapInPandas`` 1->N shape every video pipeline needs.  ``frame_size``
    is the byte stride (w * h * bytes_per_px for planar raw); a real codec
    (ffmpeg, absent in this environment) would replace the byte slicing
    below with decode calls — the fan-out contract, schema, and partitioning
    are exactly what that production body plugs into.  A trailing partial
    frame is dropped (codec analog: an incomplete GOP).
    """
    if frame_size <= 0 or every_n <= 0:
        raise ValueError("frame_size and every_n must be positive")
    import pandas as pd

    def fan_out(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids, idxs, starts, blobs = [], [], [], []
            for mid, data in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(data) if data is not None else b""
                n_frames = len(raw) // frame_size
                for fi in range(0, n_frames, every_n):
                    off = fi * frame_size
                    ids.append(mid)
                    idxs.append(fi)
                    starts.append(off)
                    blobs.append(raw[off:off + frame_size])
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int64"),
                "byte_start": pd.array(starts, dtype="int64"),
                "frame_bytes": blobs,
            })

    return df.select("media_id", "content").mapInPandas(
        fan_out, FRAME_SAMPLE_SCHEMA
    )


# --- image: synthetic bitmaps + real nearest-neighbor resize ---------------

def synth_bitmap(df: DataFrame, id_col: str = "media_id",
                 width: int = 8, height: int = 8) -> DataFrame:
    """(id) -> (id, width, height, pixels binary): deterministic grayscale
    bitmap, pixel(y, x) = (id*31 + y*7 + x*13) % 256 in row-major bytes.
    Executor-side generation (nothing large crosses the driver), and the
    formula replays in SQL so downstream pixel math is oracle-checkable."""
    import pandas as pd

    def gen(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame({
                "media_id": ids,
                "width": width,
                "height": height,
                "pixels": [
                    bytes(
                        (int(i) * 31 + y * 7 + x * 13) % 256
                        for y in range(height) for x in range(width)
                    )
                    for i in ids
                ],
            })

    return df.select(F.col(id_col)).mapInPandas(
        gen, "media_id long, width int, height int, pixels binary"
    )


def resize_nearest(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize over raw grayscale bitmaps — the
    image-preprocessing step of a multimodal training pipeline, vectorized
    numpy inside Arrow ``mapInPandas`` (the compressed-format decode that
    needs Pillow stays behind ``decode_image_meta``'s backend guard; raw
    bitmap math needs no image library).

    Source index per axis is the standard NN map ``src = (dst * n) div
    out`` (integer division — engine-portable, no float rounding).
    Emits the resized bytes plus an integer position-weighted checksum
    (``sum(pixel_k * (k+1))``) so correctness audits don't need to
    compare binaries."""
    import numpy as np
    import pandas as pd

    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"output dims must be positive, got {out_w}x{out_h}")

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for mid, w, h, px in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["pixels"]):
                if px is None or w is None or h is None or w <= 0 or h <= 0:
                    rows.append((mid, out_w, out_h, None, None))
                    continue
                a = np.frombuffer(bytes(px), dtype=np.uint8)[: w * h]
                a = a.reshape(int(h), int(w))
                ys = (np.arange(out_h) * int(h)) // out_h
                xs = (np.arange(out_w) * int(w)) // out_w
                r = a[np.ix_(ys, xs)]
                weights = np.arange(1, r.size + 1, dtype=np.int64)
                checksum = int((r.astype(np.int64).ravel() * weights).sum())
                rows.append((mid, out_w, out_h, r.tobytes(), checksum))
            out = pd.DataFrame(
                rows,
                columns=["media_id", "out_w", "out_h", "pixels", "checksum"],
            )
            out["checksum"] = pd.array(out["checksum"], dtype="Int64")
            yield out

    return df.select("media_id", "width", "height", "pixels").mapInPandas(
        run, "media_id long, out_w int, out_h int, pixels binary, checksum long"
    )


def channel_histogram(df: DataFrame, bins: int = 16) -> DataFrame:
    """Intensity histogram + first-moment stats over raw grayscale
    bitmaps — the multimodal feature-extraction step a curation pipeline
    runs to spot blank/saturated/low-contrast media before paying for a
    model forward pass.  Vectorized numpy inside Arrow ``mapInPandas``
    (raw bitmap math needs no image library; compressed-format decode
    stays behind ``decode_image_meta``'s backend guard).

    ``bins`` must divide 256; bin b counts pixels in
    ``[b*256/bins, (b+1)*256/bins)`` — pure integer bucketing, so the
    counts (and the exact integer ``px_sum``) replay in SQL.  NULL
    payloads pass through with NULL features, row preserved.

    Returns ``(media_id, n_pixels int, bins array<bigint>, px_sum
    bigint)``; derive the mean downstream as one IEEE division so the
    float stays an explicit, oracle-mirrorable chain.
    """
    if bins < 1 or 256 % bins:
        raise ValueError(f"bins must divide 256, got {bins}")
    shift_div = 256 // bins

    def run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, w, h, px in zip(pdf["media_id"], pdf["width"],
                                     pdf["height"], pdf["pixels"]):
                if px is None:
                    rows.append((mid, None, None, None))
                    continue
                a = np.frombuffer(bytes(px), dtype=np.uint8)[: int(w) * int(h)]
                counts = np.bincount(a // shift_div, minlength=bins)
                rows.append((mid, int(a.size),
                             [int(c) for c in counts[:bins]],
                             int(a.astype(np.int64).sum())))
            out = pd.DataFrame(
                rows, columns=["media_id", "n_pixels", "bins", "px_sum"])
            out["n_pixels"] = pd.array(out["n_pixels"], dtype="Int32")
            out["px_sum"] = pd.array(out["px_sum"], dtype="Int64")
            yield out

    return df.select("media_id", "width", "height", "pixels").mapInPandas(
        run, "media_id long, n_pixels int, bins array<bigint>, px_sum long"
    )
