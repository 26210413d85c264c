"""Multimodal column plumbing — binary payloads with typed metadata.

The reference rasterizes PDF pages and crops figure regions for VLM
captioning (ir_processor.py:169-170, 467-508; vlm.py:79-507). Per the north
rule those model calls are replaced by deterministic rules, but a
training-data pipeline still needs the *plumbing* for opaque media columns:
schema, partitioning, Arrow batch shape, and a decode/feature-extract UDF
signature. The image/audio libraries are not in this container, so the
decode step is STUBBED — `decode_image_stub` raises NotImplementedError by
design, and `image_features` uses a deterministic fake (byte-level stats)
so the Spark-side dataflow is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "media_id string, n_bytes long, byte_entropy_q double, phash string, "
    "format_guess string"
)


def decode_image_stub(raw: bytes):
    """Real decode requires PIL/opencv — not in this container. The Spark
    plumbing around this call (schema, batching, partitioning) is real and
    tested with the deterministic fake below."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use image_features() which substitutes deterministic byte-level stats"
    )


def _fake_features(media_id: str, raw: bytes | None) -> tuple:
    raw = raw or b""
    n = len(raw)
    # deterministic stand-ins: quantized byte histogram entropy proxy and a
    # sha-derived 64-bit "perceptual" hash (reference D3 slot,
    # deduplicator.py:85-101 — real impl would be 8x8 average-hash)
    counts = [0] * 16
    for b in raw[:4096]:
        counts[b >> 4] += 1
    total = max(1, sum(counts))
    q = round(sum((c / total) ** 2 for c in counts), 6)
    phash = hashlib.sha256(raw).hexdigest()[:16]
    fmt = (
        "png" if raw[:4] == b"\x89PNG" else
        "jpeg" if raw[:2] == b"\xff\xd8" else
        "gif" if raw[:3] == b"GIF" else "unknown"
    )
    return media_id, n, q, phash, fmt


def image_features(media: DataFrame, id_col: str = "media_id",
                   bytes_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction over a binary media column — the
    decode slot of the pipeline with a deterministic fake body."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                _fake_features(str(m), bytes(b) if b is not None else b"")
                for m, b in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_bytes", "byte_entropy_q", "phash",
                         "format_guess"],
            )

    src = media.select(id_col, bytes_col)
    n = int(media.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return src.repartition(n, F.xxhash64(F.col(id_col))).mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )
