"""Multimodal (image / video-frame) lane: opaque binary columns with
typed metadata, processed exclusively in Arrow-batched Pandas UDFs via
``mapInPandas`` — the same no-per-row-Python discipline as the audio
lane (BASELINE.json input_hint).

The container ships no image codec libraries; images use an in-repo
``RAWv1`` byte format (12-byte header ``width,height,channels`` as
little-endian int32 + uint8 pixels, C-order) as the fixture baseline,
plus two REAL in-repo containers: PNG (zlib + all five scanline
filters, sources/containers) and baseline JPEG (SOF0 + canonical
Huffman + IDCT, pure numpy, sources/jpeg — lossy, bound stated at the
gate).  Everything around the boundary — schema, generation, decode,
resize, per-channel stats, frame sampling, Arrow batch shapes — is
real, executed, and tested.  Codecs that genuinely need external
libraries (webp/avif/progressive jpeg/…) raise NotImplementedError
with the reason, at the same call site a codec library would plug
into.

Scale notes: generation and decode are embarrassingly parallel
(mapInPandas, no shuffle); stats is one narrow aggregation; frame
sampling is a pure-JVM filter (``frame_idx % k``) that never touches
the frame bytes — at 100 TB the bytes for dropped frames are never
deserialized past the parquet reader.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_HEADER = struct.Struct("<iii")  # width, height, channels


def encode_raw(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array as RAWv1 bytes."""
    h, w, c = pixels.shape
    return _HEADER.pack(w, h, c) + pixels.tobytes(order="C")


def decode_raw(buf: bytes) -> np.ndarray:
    """Decode RAWv1 bytes to an (h, w, c) uint8 array."""
    w, h, c = _HEADER.unpack_from(buf, 0)
    px = np.frombuffer(buf, dtype=np.uint8, offset=_HEADER.size)
    return px.reshape(h, w, c)


def _decode_any(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "rawv1":
        return decode_raw(buf)
    if fmt == "png":
        # real container: pure zlib+numpy PNG codec (sources/containers)
        from jepl_spark.sources.containers import png_decode

        px = png_decode(buf)
        return px
    if fmt == "jpeg":
        # real ENTROPY-CODED container: pure-numpy baseline JPEG
        # (SOF0 + canonical Huffman + IDCT, sources/jpeg) — lossy, so
        # downstream oracles must compare within a stated bound
        from jepl_spark.sources.jpeg import jpeg_decode

        return jpeg_decode(buf)
    # the honest codec boundary: this is where an image library would
    # be called; rawv1 (fixture), png, and baseline jpeg decode in-repo
    # in this environment
    raise NotImplementedError(
        f"image format {fmt!r} requires a codec library not present in "
        "this environment (deterministic 'rawv1', in-repo 'png' and "
        "baseline 'jpeg' decode here)"
    )


def _synth_pixels(img_id: int, w: int, h: int, c: int) -> np.ndarray:
    """Deterministic pixels from the id: cheap integer field, unique
    per image, reproducible across sessions/partitions."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 7 + yy * 13 + img_id * 31) % 251
    chans = [(base + 17 * k) % 256 for k in range(c)]
    return np.stack(chans, axis=-1).astype(np.uint8)


IMAGES_SCHEMA = StructType(
    [
        StructField("img_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def images_df(
    spark: SparkSession,
    n: int,
    partitions: int = 8,
    fmt_cycle: tuple = ("rawv1",),
) -> DataFrame:
    """Deterministic synthetic image table — mapInPandas over an id
    range (generation is distributed; no driver-side loop).
    ``fmt_cycle`` picks each image's container round-robin by id:
    'rawv1' (fixture format), 'png' (real in-repo container — both
    LOSSLESS, so pixel-formula oracles hold exactly), or 'jpeg'
    (real in-repo baseline codec, LOSSY at q=95 — downstream
    comparisons against the pixel formula must use the stated error
    bound, see synth_roundtrip_errors / the image_jpeg_roundtrip
    gate; exact-stat oracles like image_decode_stats must NOT include
    'jpeg' in their cycle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from jepl_spark.sources.containers import png_encode
        from jepl_spark.sources.jpeg import jpeg_encode

        encoders = {
            "rawv1": encode_raw,
            "png": png_encode,
            # quality 95: worst-case |err| measured 20 over the synth
            # field (gate bound 32 with margin) — lossy by design
            "jpeg": lambda px: jpeg_encode(px, 95),
        }
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {"img_id": [], "bytes": [], "width": [], "height": [],
                    "channels": [], "fmt": []}
            for i in ids:
                w = 32 + int(i) % 5 * 16   # 32..96
                h = 24 + int(i) % 3 * 24   # 24..72
                px = _synth_pixels(int(i), w, h, 3)
                fmt = fmt_cycle[int(i) % len(fmt_cycle)]
                rows["img_id"].append(int(i))
                rows["bytes"].append(encoders[fmt](px))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(3)
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=IMAGES_SCHEMA
    )


def decode_image_stats(df: DataFrame) -> DataFrame:
    """Decode + per-channel mean/std feature extraction.  Binary in →
    narrow numeric out: the pixels never leave the Python worker."""
    out_schema = StructType(
        [
            StructField("img_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
            StructField("std_all", DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            # zip over raw column arrays, not iterrows(): per-row
            # Series construction would dominate the decode stage
            for img_id, buf, fmt in zip(
                pdf["img_id"].to_numpy(), pdf["bytes"].to_numpy(),
                pdf["fmt"].to_numpy(),
            ):
                px = _decode_any(buf, fmt).astype(np.float64)
                c = px.shape[2]
                out["img_id"].append(int(img_id))
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                # channel means fall back to the last channel present
                # so 1/2-channel RAWv1 images stay decodable here
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, min(1, c - 1)].mean()))
                out["mean_b"].append(float(px[:, :, min(2, c - 1)].mean()))
                out["std_all"].append(float(px.std()))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def synth_roundtrip_errors(df: DataFrame) -> DataFrame:
    """Container-transit validation harness for SYNTHETIC images: decode
    each row via its container (``fmt``) and measure the absolute error
    against the pixel formula its id defines (``_synth_pixels``).
    Emits (img_id, fmt, width, height, max_abs_err, mean_abs_err) —
    lossless containers (rawv1, png) must report 0/0, the lossy jpeg
    lane an error bounded by its quantization (the gate states the
    bound).  Arrow lane: pixels never leave the Python worker."""
    out_schema = StructType(
        [
            StructField("img_id", LongType()),
            StructField("fmt", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("max_abs_err", DoubleType()),
            StructField("mean_abs_err", DoubleType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for img_id, buf, fmt, c in zip(
                pdf["img_id"].to_numpy(), pdf["bytes"].to_numpy(),
                pdf["fmt"].to_numpy(), pdf["channels"].to_numpy(),
            ):
                px = _decode_any(buf, fmt).astype(np.int64)
                h, w = px.shape[:2]
                want = _synth_pixels(int(img_id), w, h, int(c)).astype(np.int64)
                err = np.abs(px - want)
                out["img_id"].append(int(img_id))
                out["fmt"].append(str(fmt))
                out["width"].append(w)
                out["height"].append(h)
                out["max_abs_err"].append(float(err.max()))
                out["mean_abs_err"].append(float(err.mean()))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h), re-encoded as RAWv1.
    Pure numpy — needs no codec library — and keeps the binary-in /
    binary-out column contract of a production resize stage."""
    out_schema = StructType(
        [
            StructField("img_id", LongType()),
            StructField("bytes", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("fmt", StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in out_schema.fields}
            for img_id, buf, fmt in zip(
                pdf["img_id"].to_numpy(), pdf["bytes"].to_numpy(),
                pdf["fmt"].to_numpy(),
            ):
                px = _decode_any(buf, fmt)
                h, w, c = px.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                rs = px[ys][:, xs]
                out["img_id"].append(int(img_id))
                out["bytes"].append(encode_raw(rs))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["channels"].append(c)
                out["fmt"].append("rawv1")
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def sample_frames(df: DataFrame, every_n: int, idx_col: str = "frame_idx") -> DataFrame:
    """Video frame sampling: keep every n-th frame per video.  A video
    is rows of (video_id, frame_idx, bytes, …); the filter is pure JVM
    on the index column, so the dropped frames' bytes are never
    deserialized into Python at all — the correct shape at 100 TB."""
    return df.filter(F.pmod(F.col(idx_col), F.lit(every_n)) == 0)


def frames_df(spark: SparkSession, n_videos: int, frames_per_video: int,
              partitions: int = 8) -> DataFrame:
    """Synthetic video table: one row per frame, frames are RAWv1
    images derived deterministically from (video_id, frame_idx)."""
    base = spark.range(0, n_videos * frames_per_video, numPartitions=partitions)
    ids = base.select(
        # integer division (`div`), not float division + cast: the
        # double quotient loses exactness near 2^53
        F.expr(f"id div {int(frames_per_video)}").alias("video_id"),
        F.pmod(F.col("id"), F.lit(frames_per_video)).cast("int").alias("frame_idx"),
        F.col("id"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "bytes": [], "fmt": []}
            for vid, fidx, i in zip(
                pdf["video_id"].to_numpy(), pdf["frame_idx"].to_numpy(),
                pdf["id"].to_numpy(),
            ):
                px = _synth_pixels(int(i), 32, 24, 3)
                out["video_id"].append(int(vid))
                out["frame_idx"].append(int(fidx))
                out["bytes"].append(encode_raw(px))
                out["fmt"].append("rawv1")
            yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("video_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    return ids.mapInPandas(gen, schema=schema)


def image_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash; the classic 'is this the
    same picture' fingerprint behind image dedup pipelines): decode,
    reduce to integer luma (sum of channels // channels), sample a
    9×8 nearest-neighbor grid (x = gx·w//9, y = gy·h//8), and set bit
    gy·8+gx when the left sample is darker than its right neighbor.
    The final (7,7) comparison is skipped so the hash fits in 63 bits
    — sign-safe in any engine, and directly searchable with the banded
    Hamming machinery (dedup.simhash_hamming_near_dups works on it).

    Every step is integer arithmetic on pixel coordinates, so the SQL
    oracle recomputes the hash bit-for-bit from the RAWv1 generator
    formula — decode, grid sampling, luma, and packing all pinned.
    Robust to nearest-neighbor resizing (tested): the grid sample of a
    resized image lands on (nearly) the same source pixels."""
    out_schema = StructType(
        [
            StructField("img_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("dhash", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"img_id": [], "width": [], "height": [], "dhash": []}
            for img_id, buf, fmt in zip(pdf["img_id"], pdf["bytes"], pdf["fmt"]):
                px = _decode_any(bytes(buf), fmt).astype(np.int64)
                h, w, _ = px.shape
                out["img_id"].append(int(img_id))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["dhash"].append(_dhash_np(px))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def _dhash_np(px: "np.ndarray") -> int:
    """The dHash core on an (h, w, c) int array — shared by the image
    and video-frame lanes so their oracles replay the SAME math."""
    h, w, c = px.shape
    luma = px.sum(axis=2) // c
    xs = (np.arange(9) * w) // 9
    ys = (np.arange(8) * h) // 8
    grid = luma[np.ix_(ys, xs)]          # (8, 9)
    bits = grid[:, :-1] < grid[:, 1:]    # (8, 8) left < right
    val = 0
    for gy in range(8):
        for gx in range(8):
            if gy == 7 and gx == 7:
                continue
            if bits[gy, gx]:
                val |= 1 << (gy * 8 + gx)
    return val


def _scene_pixels(s: int, w: int, h: int, c: int) -> np.ndarray:
    """Per-scene pixel pattern with a QUADRATIC x·y term, so different
    scenes are genuinely different fields (the linear _synth_pixels
    field makes any two seeds a uniform shift of each other — useless
    for boundary detection).  Integer formula, SQL-replayable:
    base = (x·7 + y·13 + s·31 + x·y·((s mod 17)+1)) mod 251."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 7 + yy * 13 + s * 31 + xx * yy * ((s % 17) + 1)) % 251
    chans = [(base + 17 * k) % 256 for k in range(c)]
    return np.stack(chans, axis=-1).astype(np.uint8)


def scene_frames_df(
    spark: SparkSession,
    n_videos: int,
    frames_per_video: int,
    scene_len: int = 25,
    partitions: int = 8,
) -> DataFrame:
    """Synthetic video frames WITH scene structure: frames inside a
    scene are identical (a static shot — dHash Hamming 0); each scene
    boundary switches to a different quadratic pixel field (tens of
    dHash bits flip).  Scene seed s = video·7919 + frame_idx//scene_len,
    integer arithmetic the SQL oracle replays directly."""

    base = spark.range(0, n_videos * frames_per_video,
                       numPartitions=partitions)
    ids = base.select(
        F.expr(f"id div {int(frames_per_video)}").alias("video_id"),
        F.pmod(F.col("id"), F.lit(frames_per_video)).cast("int").alias("frame_idx"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "bytes": [], "fmt": []}
            for vid, fidx in zip(pdf["video_id"].to_numpy(),
                                 pdf["frame_idx"].to_numpy()):
                s = int(vid) * 7919 + int(fidx) // scene_len
                px = _scene_pixels(s, 32, 24, 3)
                out["video_id"].append(int(vid))
                out["frame_idx"].append(int(fidx))
                out["bytes"].append(encode_raw(px))
                out["fmt"].append("rawv1")
            yield pd.DataFrame(out)

    schema = StructType(
        [
            StructField("video_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
        ]
    )
    return ids.mapInPandas(gen, schema=schema)


def frame_dhash(df: DataFrame) -> DataFrame:
    """Per-frame dHash: (video_id, frame_idx, dhash).  One Arrow pass;
    each frame decoded exactly once — scene detection then never
    touches pixels again."""
    out_schema = StructType(
        [
            StructField("video_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("dhash", LongType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "dhash": []}
            for vid, fidx, buf, fmt in zip(
                pdf["video_id"], pdf["frame_idx"], pdf["bytes"], pdf["fmt"]
            ):
                px = _decode_any(bytes(buf), fmt).astype(np.int64)
                out["video_id"].append(int(vid))
                out["frame_idx"].append(int(fidx))
                out["dhash"].append(_dhash_np(px))
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def scene_changes(df: DataFrame, min_hamming: int = 16) -> DataFrame:
    """Video scene segmentation: a frame starts a new scene when its
    dHash is ≥ ``min_hamming`` bits away from the previous frame's —
    the shot-boundary-detection primitive of a video training-data
    pipeline (sample one clip per scene, dedup near-static shots).

    Shape: one Arrow decode pass (frame_dhash) → one exchange on
    video_id for the lag window → JVM xor+bit_count.  Pixels cross the
    JVM boundary zero times; per-video state is one 8-byte hash."""
    from pyspark.sql.window import Window

    hashes = frame_dhash(df)
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    lagged = hashes.withColumn("__prev", F.lag("dhash").over(w))
    dist = F.bit_count(F.col("dhash").bitwiseXOR(F.col("__prev")))
    return (
        lagged.where(F.col("__prev").isNotNull())
        .withColumn("hamming", dist)
        .where(F.col("hamming") >= min_hamming)
        .select("video_id", "frame_idx", "hamming")
    )
