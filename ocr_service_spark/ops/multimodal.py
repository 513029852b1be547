"""Multimodal column operators (image/audio/video as opaque binary).

Media travels as BinaryType plus typed metadata; decode / feature
extraction / resize / frame-sample are Arrow-batched ``mapInPandas``
kernels. In this container only the SIMG synthetic format decodes for
real (numpy); jpeg/png/audio/video decodes are stubbed behind lazy
imports with the Spark-side plumbing (schema, batch shape, partitioning)
fully real and tested.

These run on the engine's own deterministic media table (not the driver
testdata), so they register as rows-only checks (no SQL oracle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels.media import SIMG_MAGIC, decode_simg

_META_SCHEMA = (
    "media_ref string, width int, height int, mean_brightness double, "
    "n_pixels long, codec string"
)


def _decode_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["content"]):
            b = bytes(blob)
            if b.startswith(SIMG_MAGIC):
                meta, px = decode_simg(b)
                rows.append(
                    (ref, int(meta["w"]), int(meta["h"]),
                     round(float(px.mean()), 4), int(px.size), "simg")
                )
            else:
                # real codecs (jpeg/png/webp) need PIL/cv2 — absent here;
                # plumbing stays real, decode is explicitly unavailable
                rows.append((ref, None, None, None, None, "unsupported"))
        yield pd.DataFrame(
            rows,
            columns=["media_ref", "width", "height", "mean_brightness", "n_pixels", "codec"],
        )


def media_metadata(media: DataFrame) -> DataFrame:
    """Decode blobs → typed metadata (Arrow batches, executor-side)."""
    return media.select("media_ref", "content").mapInPandas(
        _decode_meta, schema=_META_SCHEMA
    )


_THUMB_SCHEMA = "media_ref string, thumb binary, thumb_w int, thumb_h int"
THUMB = 16


def _resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic nearest-neighbor thumbnail — the resize op's real
    Spark plumbing with a numpy implementation for SIMG blobs."""
    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["content"]):
            b = bytes(blob)
            if not b.startswith(SIMG_MAGIC):
                rows.append((ref, None, None, None))
                continue
            _, px = decode_simg(b)
            h, w = px.shape
            yi = np.clip((np.arange(THUMB) * h) // THUMB, 0, h - 1)
            xi = np.clip((np.arange(THUMB) * w) // THUMB, 0, w - 1)
            thumb = px[np.ix_(yi, xi)]
            rows.append((ref, thumb.tobytes(), THUMB, THUMB))
        yield pd.DataFrame(rows, columns=["media_ref", "thumb", "thumb_w", "thumb_h"])


def media_thumbnails(media: DataFrame) -> DataFrame:
    return media.select("media_ref", "content").mapInPandas(
        _resize_kernel, schema=_THUMB_SCHEMA
    )


def media_size_stats(media: DataFrame) -> DataFrame:
    """Byte-size distribution of the blob store (native columns only)."""
    return media.agg(
        F.count("*").alias("n_blobs"),
        F.sum("file_size").alias("total_bytes"),
        F.max("file_size").alias("max_bytes"),
        F.expr("percentile_approx(file_size, 0.5)").alias("p50_bytes"),
    )
