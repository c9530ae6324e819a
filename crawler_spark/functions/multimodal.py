"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing — schemas, magic-byte sniffing, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the actual
decode/resize/frame-sample steps are STUBBED behind deterministic fakes (the
image/audio libraries are not in this container), clearly marked.

Reference anchor for the sniffing: the reference validates downloaded images
by reading the first bytes and checking the type (base.js:212-217,
``imageType(buf) === null`` ⇒ ``hasError``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# asset table schema: one row per binary object
ASSET = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("has_error", T.BooleanType(), False),
    ]
)

# Magic-byte prefixes (S13, base.js:212-217 — first 12 bytes decide validity).
_MAGIC = {
    "image/jpeg": b"\xff\xd8\xff",
    "image/png": b"\x89PNG\r\n\x1a\n",
    "image/gif": b"GIF8",
    "image/webp": b"RIFF",  # + WEBP at offset 8, checked below
}


def sniff_content_type(data: bytes | None) -> str | None:
    if not data:
        return None
    head = bytes(data[:12])
    for ctype, magic in _MAGIC.items():
        if head.startswith(magic):
            if ctype == "image/webp" and head[8:12] != b"WEBP":
                continue
            return ctype
    return None


def image_type_valid(bytes_col: Column) -> Column:
    """JVM-side magic check on substring(bytes, 1, 12) → hasError column
    (vectorized, no Python) — the S13 operator."""
    head = F.substring(bytes_col, 1, 12)
    hexhead = F.hex(head)
    return (
        hexhead.startswith("FFD8FF")
        | hexhead.startswith("89504E470D0A1A0A")
        | hexhead.startswith("47494638")
        | (hexhead.startswith("52494646") & (F.substring(hexhead, 17, 8) == "57454250"))
    )


def decode_image_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (url, bytes) → (url, content_type, width, height,
    features array<float>).

    STUB: real decode needs PIL/libvips (absent here). The deterministic
    fake derives width/height/features from a hash of the bytes so the
    pipeline shape (schemas, batching, partitioning) is fully exercised;
    swap ``_fake_decode`` for a real decoder in production.
    """
    for pdf in it:
        rows = {"url": [], "content_type": [], "width": [], "height": [], "features": []}
        for url, data in zip(pdf["url"], pdf["bytes"]):
            ctype = sniff_content_type(data)
            rows["url"].append(url)
            rows["content_type"].append(ctype)
            if ctype is None:
                rows["width"].append(None)
                rows["height"].append(None)
                rows["features"].append(None)
                continue
            w, h, feats = _fake_decode(bytes(data))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["features"].append(feats)
        yield pd.DataFrame(rows)


DECODE_SCHEMA = (
    "url string, content_type string, width int, height int, features array<float>"
)


def _fake_decode(data: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for decode+feature-extract. NOT a real decoder."""
    import hashlib

    digest = hashlib.md5(data).digest()  # deterministic across processes
    rng = np.random.default_rng(np.frombuffer(digest, dtype=np.uint8))
    return int(rng.integers(16, 4096)), int(rng.integers(16, 4096)), [
        float(x) for x in rng.standard_normal(8).astype(np.float32)
    ]


def decode_images(assets: DataFrame) -> DataFrame:
    """Partition by url hash (decode is CPU-bound; spread evenly), then
    Arrow-batch decode."""
    return assets.repartition(F.pmod(F.xxhash64("url"), F.lit(64))).mapInPandas(
        decode_image_batch, DECODE_SCHEMA
    )


def frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (url, bytes, n_frames) → one row per sampled frame.

    STUB for video frame sampling — raises until a real decoder is wired.
    """
    raise NotImplementedError(
        "video decode requires ffmpeg/pyav, not available in this container"
    )
