"""Query registry: every implemented operator exposed for the driver
contract (__spark_entry__.py) with its DuckDB oracle where the semantics
are SQL-expressible.

Rows-only entries (extraction pipeline, multimodal kernels) run on the
engine's own deterministic synthetic dataset — a pure function of
(N_DOCS, SEED) — since the driver's parquet tables carry no media blobs.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .config import ExtractConfig
from .datagen import ensure_dataset
from .ops import dedup, relational, similarity, streaming, textstats
from .pipeline.extract import load_inputs, run_extract

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENTRY_DS_DIR = os.path.join(_REPO, ".data", "entry-ds")
ENTRY_N_DOCS = 200
ENTRY_SEED = 42


def _entry_dataset_dir() -> str:
    ensure_dataset(ENTRY_DS_DIR, ENTRY_N_DOCS, ENTRY_SEED)
    return ENTRY_DS_DIR


def extract_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full interleaved-document extraction (rows-only check —
    media blobs are not SQL-reachable). sf_dir is ignored; the input is
    the deterministic synthetic dataset."""
    data_dir = _entry_dataset_dir()
    docs, media = load_inputs(spark, data_dir)
    output, _ = run_extract(spark, docs, media, ExtractConfig())
    from pyspark.sql import functions as F

    # flatten for a stable, hashable shape
    return output.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("span_order"),
    )


def media_metadata_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import media_metadata

    data_dir = _entry_dataset_dir()
    media = spark.read.parquet(f"{data_dir}/media.parquet")
    return media_metadata(media)


def media_size_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import media_size_stats

    data_dir = _entry_dataset_dir()
    media = spark.read.parquet(f"{data_dir}/media.parquet")
    return media_size_stats(media)


def media_thumbnail_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .ops.multimodal import media_thumbnails

    data_dir = _entry_dataset_dir()
    media = spark.read.parquet(f"{data_dir}/media.parquet")
    return media_thumbnails(media).select(
        "media_ref", F.md5("thumb").alias("thumb_md5"), "thumb_w", "thumb_h"
    )


def video_frame_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import synthetic_videos, video_frame_sample

    return video_frame_sample(synthetic_videos(spark))


def audio_features_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ops.multimodal import audio_features, synthetic_audio

    return audio_features(synthetic_audio(spark))


def structured_receipts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 structuring over the documents table (rows-only: the production
    structurer is an external LLM call; offline the deterministic
    heuristic parser produces the same schema)."""
    from pyspark.sql import functions as F

    from .kernels.structuring import structure_spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit(0).alias("span_order"),
        "text",
    )
    return structure_spans(docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, textstats, dedup, similarity, streaming):
        out.update(mod.QUERIES)
    out["extract_pipeline"] = extract_pipeline_query
    out["media_metadata"] = media_metadata_query
    out["media_size_stats"] = media_size_stats_query
    out["media_thumbnails"] = media_thumbnail_query
    out["video_frame_sample"] = video_frame_sample_query
    out["audio_features"] = audio_features_query
    out["structured_receipts"] = structured_receipts_query
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, textstats, dedup, similarity, streaming):
        out.update(mod.ORACLES)
    # extract_pipeline / media_* are rows-only (non-SQL-expressible:
    # binary blob kernels) — intentionally absent here.
    return out
