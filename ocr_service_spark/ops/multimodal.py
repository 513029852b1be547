"""Multimodal column operators (image/audio/video as opaque binary).

Media travels as BinaryType plus typed metadata; decode / feature
extraction / resize / frame-sample are Arrow-batched ``mapInPandas``
kernels. In this container only the SIMG synthetic format decodes for
real (numpy); jpeg/png/audio/video decodes are stubbed behind lazy
imports with the Spark-side plumbing (schema, batch shape, partitioning)
fully real and tested.

These run on the engine's own deterministic media table (not the driver
testdata). Since round 3 the decode/featurize kernels are ORACLE-checked
against ground truth that never touches the codecs or Spark: datagen
records (width, height, mean_brightness, n_pixels) at generation time
(media_truth.parquet sidecar), and the video/audio truth writers below
re-derive expected features straight from the generator rng spec. Only
the thumbnail kernel stays rows-only (its output bytes ARE the kernel).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..kernels.media import (
    SAUD_MAGIC,
    SIMG_MAGIC,
    SVID_MAGIC,
    decode_saud,
    decode_simg,
    decode_svid,
    encode_saud,
    encode_svid,
)

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
                # real codecs (jpeg/png/webp) through the same import-
                # gated decoder as the OCR path (PIL/cv2; absent here →
                # explicitly unavailable, plumbing stays real)
                try:
                    from ..kernels.media import decode_real_image

                    px = decode_real_image(b)
                    rows.append(
                        (ref, px.shape[1], px.shape[0],
                         round(float(px.mean()), 4), int(px.size), "image")
                    )
                except Exception:
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
            if b.startswith(SIMG_MAGIC):
                _, px = decode_simg(b)
            else:
                try:
                    from ..kernels.media import decode_real_image

                    px = decode_real_image(b)
                except Exception:
                    rows.append((ref, None, None, None))
                    continue
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


# --------------------------------------------------------------------------
# video: frame sampling (every-kth-frame decode, the clip-level analog of
# thumbnailing). Real mp4/webm would decode via PyAV/ffmpeg behind the same
# magic-dispatch; SVID is the deterministic container stand-in.
# --------------------------------------------------------------------------

FRAME_STRIDE = 3


def synthetic_videos(spark: SparkSession, n: int = 48) -> DataFrame:
    """Deterministic synthetic video table, generated executor-side from a
    range — no driver-side blob materialization, partitions like any scan."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(7000 + int(i))
                nf = int(rng.integers(4, 13))
                h, w = 24, 32
                frames = rng.integers(0, 256, size=(nf, h, w), dtype=np.uint8)
                blob = encode_svid({"n_frames": nf, "h": h, "w": w, "fps": 4}, frames)
                rows.append((f"mem://vid/{int(i):06d}", blob, nf))
            yield pd.DataFrame(rows, columns=["media_ref", "content", "n_frames"])

    par = spark.sparkContext.defaultParallelism
    return spark.range(n).repartition(par).mapInPandas(
        gen, "media_ref string, content binary, n_frames int"
    )


_FRAME_SCHEMA = (
    "media_ref string, frame_idx int, mean_brightness double, frame_md5 string"
)


def _frame_sample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["content"]):
            b = bytes(blob)
            if not b.startswith(SVID_MAGIC):
                rows.append((ref, None, None, None))
                continue
            _, frames = decode_svid(b)
            for idx in range(0, frames.shape[0], FRAME_STRIDE):
                f = frames[idx]
                rows.append(
                    (ref, idx, round(float(f.mean()), 4),
                     hashlib.md5(f.tobytes()).hexdigest())
                )
        yield pd.DataFrame(
            rows, columns=["media_ref", "frame_idx", "mean_brightness", "frame_md5"]
        )


def video_frame_sample(videos: DataFrame) -> DataFrame:
    """Sample every FRAME_STRIDE-th frame of each video (1:N explode done
    inside the Arrow batch — no separate explode shuffle)."""
    return videos.select("media_ref", "content").mapInPandas(
        _frame_sample_kernel, schema=_FRAME_SCHEMA
    )


# --------------------------------------------------------------------------
# audio: feature extraction (duration / RMS / zero-crossing rate) — the
# minimal featurizer a training-data pipeline runs before filtering clips.
# --------------------------------------------------------------------------

def synthetic_audio(spark: SparkSession, n: int = 64) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(9000 + int(i))
                sr = 8000
                n_samp = int(rng.integers(sr // 2, sr * 3))
                t = np.arange(n_samp, dtype=np.float64)
                freq = float(rng.uniform(80, 800))
                wave = 0.5 * np.sin(2 * np.pi * freq * t / sr)
                wave += rng.normal(0, 0.05, n_samp)
                samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
                blob = encode_saud({"sr": sr, "n": n_samp}, samples)
                rows.append((f"mem://aud/{int(i):06d}", blob))
            yield pd.DataFrame(rows, columns=["media_ref", "content"])

    par = spark.sparkContext.defaultParallelism
    return spark.range(n).repartition(par).mapInPandas(
        gen, "media_ref string, content binary"
    )


_AUDIO_SCHEMA = (
    "media_ref string, duration_sec double, rms double, zero_crossing_rate double"
)


def _audio_feature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for ref, blob in zip(pdf["media_ref"], pdf["content"]):
            b = bytes(blob)
            if not b.startswith(SAUD_MAGIC):
                rows.append((ref, None, None, None))
                continue
            meta, s = decode_saud(b)
            x = s.astype(np.float64) / 32768.0
            zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
            rows.append(
                (ref,
                 round(len(x) / meta["sr"], 4),
                 round(float(np.sqrt(np.mean(x * x))), 6),
                 round(zc, 6))
            )
        yield pd.DataFrame(
            rows,
            columns=["media_ref", "duration_sec", "rms", "zero_crossing_rate"],
        )


def audio_features(audio: DataFrame) -> DataFrame:
    return audio.select("media_ref", "content").mapInPandas(
        _audio_feature_kernel, schema=_AUDIO_SCHEMA
    )


# --------------------------------------------------------------------------
# ground truth for the synthetic media tables: re-derived driver-side from
# the generator parameters WITHOUT the SVID/SAUD codecs or Spark — so a
# green oracle row validates encode → decode → kernel → mapInPandas
# plumbing end-to-end against independently computed values.
# --------------------------------------------------------------------------


def video_truth_rows(n: int = 48) -> list[tuple]:
    """Expected (media_ref, frame_idx, mean_brightness, frame_md5) for
    synthetic_videos(n) → video_frame_sample, computed from the rng spec."""
    import hashlib

    rows = []
    for i in range(n):
        rng = np.random.default_rng(7000 + i)
        nf = int(rng.integers(4, 13))
        frames = rng.integers(0, 256, size=(nf, 24, 32), dtype=np.uint8)
        for idx in range(0, nf, FRAME_STRIDE):
            f = frames[idx]
            rows.append(
                (f"mem://vid/{i:06d}", idx, round(float(f.mean()), 4),
                 hashlib.md5(f.tobytes()).hexdigest())
            )
    return rows


def audio_truth_rows(n: int = 64) -> list[tuple]:
    """Expected (media_ref, duration_sec, rms, zero_crossing_rate) for
    synthetic_audio(n) → audio_features, from the rng spec + feature
    formulas (no SAUD roundtrip)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(9000 + i)
        sr = 8000
        n_samp = int(rng.integers(sr // 2, sr * 3))
        t = np.arange(n_samp, dtype=np.float64)
        freq = float(rng.uniform(80, 800))
        wave = 0.5 * np.sin(2 * np.pi * freq * t / sr)
        wave += rng.normal(0, 0.05, n_samp)
        samples = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
        x = samples.astype(np.float64) / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
        rows.append(
            (f"mem://aud/{i:06d}",
             round(len(x) / sr, 4),
             round(float(np.sqrt(np.mean(x * x))), 6),
             round(zc, 6))
        )
    return rows


def ensure_av_truth(out_dir: str) -> dict[str, str]:
    """Write video/audio ground-truth parquet (idempotent) for the DuckDB
    oracles of the rows-only kernels. The generator spec is baked into the
    filenames (same versioned-marker idea as datagen's ensure_dataset), so
    editing FRAME_STRIDE / seeds / sizes invalidates stale truth files
    instead of silently reusing them."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    spec = f"s{FRAME_STRIDE}-48x24x32-7000-64x8000-9000"
    paths = {
        "video": os.path.join(out_dir, f"video_truth-{spec}.parquet"),
        "audio": os.path.join(out_dir, f"audio_truth-{spec}.parquet"),
    }
    if not os.path.exists(paths["video"]):
        vr = video_truth_rows()
        pq.write_table(
            pa.table(
                {
                    "media_ref": pa.array([r[0] for r in vr], pa.string()),
                    "frame_idx": pa.array([r[1] for r in vr], pa.int32()),
                    "mean_brightness": pa.array([r[2] for r in vr], pa.float64()),
                    "frame_md5": pa.array([r[3] for r in vr], pa.string()),
                }
            ),
            paths["video"],
        )
    if not os.path.exists(paths["audio"]):
        ar = audio_truth_rows()
        pq.write_table(
            pa.table(
                {
                    "media_ref": pa.array([r[0] for r in ar], pa.string()),
                    "duration_sec": pa.array([r[1] for r in ar], pa.float64()),
                    "rms": pa.array([r[2] for r in ar], pa.float64()),
                    "zero_crossing_rate": pa.array([r[3] for r in ar], pa.float64()),
                }
            ),
            paths["audio"],
        )
    return paths


def media_size_stats(media: DataFrame) -> DataFrame:
    """Byte-size distribution of the blob store (native columns only).
    The median is EXACT discrete (percentile_disc — same lower-middle
    element rule as DuckDB's quantile_disc oracle, verified on even
    counts): percentile_approx would only be incidentally exact while
    the blob count stays under the sketch accuracy (10⁴) and would make
    the oracle compare flaky on a larger media table. Exact percentile
    sorts per group — fine for a 1-row global stat; at 10^12 blobs swap
    in the t-digest (percentile_approx) with a toleranced check, as
    quantile_sketch does for events."""
    return media.agg(
        F.count("*").alias("n_blobs"),
        F.sum("file_size").alias("total_bytes"),
        F.max("file_size").alias("max_bytes"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY file_size)")
        .cast("int")
        .alias("p50_bytes"),
    )


# --------------------------------------------------------------------------
# perceptual hashing: difference hash (dHash) per image — the standard
# near-duplicate key for image corpora (train-set image dedup). The rule
# is the 8x9 nearest-index subsample with bit = right pixel strictly
# brighter than its left neighbor, packed row-major to 16 hex chars —
# byte-identical to the generation-time truth in datagen.py, so the
# sidecar oracle checks decode + hash end to end.
# --------------------------------------------------------------------------

_DHASH_SCHEMA = "media_ref string, dhash string"


def dhash_pixels(px: np.ndarray) -> str:
    h, w = px.shape
    y8 = np.clip((np.arange(8) * h) // 8, 0, h - 1)
    x9 = np.clip((np.arange(9) * w) // 9, 0, w - 1)
    g = px[np.ix_(y8, x9)].astype(np.int16)
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return f"{val:016x}"


def _dhash_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for ref, b in zip(pdf["media_ref"], pdf["content"]):
            try:
                _, px = decode_simg(b)
            except Exception:
                rows.append((ref, None))
                continue
            rows.append((ref, dhash_pixels(px)))
        yield pd.DataFrame(rows, columns=["media_ref", "dhash"])


def media_dhash(media: DataFrame) -> DataFrame:
    return media.select("media_ref", "content").mapInPandas(
        _dhash_kernel, schema=_DHASH_SCHEMA
    )


def media_phash_dedup(media: DataFrame) -> DataFrame:
    """Near-dup candidate stats per image: the 64-bit dHash split into
    four 16-bit bands (4 hex chars each), images sharing ANY band are
    candidates — the Hamming-space analog of MinHash band blocking
    (identical hashes share all 4 bands; hashes within a few bit flips
    still share at least one). Output: (media_ref, dhash,
    n_band_neighbors) where n_band_neighbors sums the other members of
    the image's four band buckets. One explode + one groupBy on the
    band key — never an all-pairs Hamming scan."""
    hashed = media_dhash(media).filter(F.col("dhash").isNotNull())
    bands = hashed.select(
        "media_ref",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring("dhash", 1 + 4 * i, 4).alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_ref", "dhash", "b.band", "b.bkey")
    sizes = bands.groupBy("band", "bkey").agg(F.count("*").alias("bs"))
    return (
        bands.join(sizes, ["band", "bkey"])
        .groupBy("media_ref", "dhash")
        .agg(F.sum(F.col("bs") - 1).alias("n_band_neighbors"))
    )
