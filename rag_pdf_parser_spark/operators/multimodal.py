"""Multimodal column plumbing — binary payloads with typed metadata.

The reference rasterizes PDF pages and crops figure regions for VLM
captioning (ir_processor.py:169-170, 467-508; vlm.py:79-507). Per the north
rule those model calls are replaced by deterministic rules, but a
training-data pipeline still needs the *plumbing* for opaque media columns:
schema, partitioning, Arrow batch shape, and a decode/feature-extract UDF
signature. The image/audio libraries are not in this container, so the
DECODE step is stubbed (`decode_image_stub` raises NotImplementedError by
design; `kernel.imagex.fake_decode_gray` provides the deterministic fake) —
but the perceptual hash is the reference's REAL 8×8 average-hash algorithm
(D3, deduplicator.py:85-101), oracle-checked against a full DuckDB
re-implementation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel.imagex import image_features_row

IMAGE_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, entropy_q double, phash string, "
    "format_guess string"
)


def _salted_map(media: DataFrame, id_col: str, bytes_col: str, run,
                schema: str) -> DataFrame:
    """Shared shape of every media feature stage: project (id, bytes),
    salt rows uniformly by id hash, one Arrow mapInPandas."""
    src = media.select(id_col, bytes_col)
    n = int(media.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return src.repartition(n, F.xxhash64(F.col(id_col))).mapInPandas(
        run, schema)


def decode_image_stub(raw: bytes):
    """Real decode requires PIL/opencv — not in this container. The Spark
    plumbing around this call (schema, batching, partitioning) is real and
    tested with the deterministic fake in kernel.imagex; the average-hash
    itself (reference D3, deduplicator.py:85-101) is the REAL algorithm."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use image_features() which substitutes kernel.imagex.fake_decode_gray"
    )


def image_features(media: DataFrame, id_col: str = "media_id",
                   bytes_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction over a binary media column — the
    decode slot of the pipeline. phash is a genuine 8×8 average-hash
    (kernel.imagex.avg_hash_64) over the deterministic fake decode."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                image_features_row(str(m), bytes(b) if b is not None else b"")
                for m, b in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "entropy_q", "phash",
                         "format_guess"],
            )

    return _salted_map(media, id_col, bytes_col, run, IMAGE_FEATURES_SCHEMA)


def media_from_blocks(blocks: DataFrame) -> DataFrame:
    """S5 analog (embedded-image scan, aggregator.py:219-257 [legacy]): emit
    one media row per visual block (figure/chart). Real image bytes don't
    exist in the HTML-text lane, so the payload is the deterministic
    fake-decode contract input (caption/text bytes) — the schema, keys and
    downstream feature/dedup path are the real thing."""
    vis = blocks.where(F.col("type").isin("figure", "chart"))
    return vis.select(
        F.concat_ws("/", "doc_id", "block_id").alias("media_id"),
        F.col("type").alias("media_type"),
        F.encode(F.coalesce(F.col("caption"), F.col("text"), F.lit("")),
                 "utf-8").alias("content"),
        "doc_id", "block_id",
    )


def write_media_blobs(media: DataFrame, out_dir: str,
                      id_col: str = "media_id",
                      bytes_col: str = "content") -> DataFrame:
    """K5 analog (image-crop sink, ir_processor.py:467-508): blob-per-row
    writer via foreachPartition — executors write files named from the media
    id; the returned frame carries the relative path column exactly like the
    reference records crop paths on blocks. At scale this is the
    object-store put pattern (one file per media row, path derivable from
    the key — no driver involvement)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_part(rows):
        for r in rows:
            rel = str(r[id_col]).replace("/", "_") + ".bin"
            with open(os.path.join(out_dir, rel), "wb") as f:
                f.write(bytes(r[bytes_col]) if r[bytes_col] is not None else b"")

    media.foreachPartition(write_part)
    return media.withColumn(
        "image_path",
        F.concat(F.regexp_replace(F.col(id_col), "/", "_"), F.lit(".bin")),
    )


VIDEO_FRAMES_SCHEMA = (
    "media_id string, n_bytes long, n_frames int, "
    "frames array<struct<frame_idx: int, offset: long, phash: string>>"
)


def video_frame_features(media: DataFrame, frame_bytes: int = 4096,
                         every_n: int = 4, id_col: str = "media_id",
                         bytes_col: str = "content") -> DataFrame:
    """Frame-SAMPLING plumbing for opaque video columns: treat the payload
    as a sequence of fixed-size 'frames' (a real decoder would yield real
    frames at timestamps — the codec libraries are not in this container,
    so the frame iterator is this deterministic byte-slicer; the schema,
    Arrow batch shape, nested output structure, and per-frame hashing ARE
    the real plumbing), sample every `every_n`-th frame, and emit the
    reference's genuine 8×8 average-hash per sampled frame — the input a
    video near-dup stage (banded join over frame-hash arrays) consumes.

    Output is one row per media item with a bounded nested frame array —
    at 100 TB the per-row cost and output size are capped by
    payload/frame_bytes/every_n, and rows are salted across partitions by
    id hash exactly like image_features."""
    from ..kernel.imagex import avg_hash_64, fake_decode_gray

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for m, b in zip(pdf[id_col], pdf[bytes_col]):
                raw = bytes(b) if b is not None else b""
                frames = []
                for fi, off in enumerate(range(0, len(raw), frame_bytes)):
                    if fi % every_n:
                        continue
                    chunk = raw[off:off + frame_bytes]
                    frames.append(
                        (fi, off, avg_hash_64(fake_decode_gray(chunk))))
                out.append((str(m), len(raw), len(frames), frames))
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "n_frames", "frames"])

    return _salted_map(media, id_col, bytes_col, run, VIDEO_FRAMES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id string, grid int, pixels array<int>"
)


def resize_media(media: DataFrame, target_grid: int = 8,
                 id_col: str = "media_id",
                 bytes_col: str = "content") -> DataFrame:
    """RESIZE plumbing: media payload → target_grid×target_grid grayscale
    thumbnail via block-mean pooling over the deterministic fake decode
    (the real decoder slot is decode_image_stub — codec libs absent). The
    nested-array output shape, pooling math, and Arrow batching are the
    real pipeline pieces a thumbnail/feature stage needs; pooling is the
    same arithmetic the reference's resize-before-VLM performs
    (vlm.py:122-126 bounds the image to 1024px the same way)."""
    from ..kernel.imagex import GRID, fake_decode_gray

    if GRID % target_grid != 0:
        raise ValueError(
            f"target_grid must divide the decode grid {GRID} "
            f"(got {target_grid})")  # a bare assert vanishes under -O
    blk = GRID // target_grid

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for m, b in zip(pdf[id_col], pdf[bytes_col]):
                px = fake_decode_gray(bytes(b) if b is not None else b"")
                pooled = []
                for by in range(target_grid):
                    for bx in range(target_grid):
                        s = 0
                        for y in range(by * blk, (by + 1) * blk):
                            row = y * GRID
                            for x in range(bx * blk, (bx + 1) * blk):
                                s += px[row + x]
                        pooled.append(s // (blk * blk))
                out.append((str(m), target_grid, pooled))
            yield pd.DataFrame(out, columns=["media_id", "grid", "pixels"])

    return _salted_map(media, id_col, bytes_col, run, RESIZED_SCHEMA)
