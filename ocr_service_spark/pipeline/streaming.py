"""Structured Streaming execution of the extraction pipeline.

The same declarative plan as batch `run_extract` — prepare_spans →
kind-routed kernels → ordered reassembly — driven by `readStream` over
the documents table, with the media blob table as the STATIC side of a
stream-static join. This is the live-ingest shape of the engine: new
interleaved documents appear as files (or Iceberg snapshots / Kafka
batches) and extracted span rows stream out continuously.

Differences from batch, all forced by streaming semantics:
- the media branch uses the Arrow join path (``direct_blob_read=False``):
  the python-direct row-group reader plans against a fixed file listing,
  which is the batch contract — the stream side must stay declarative;
- reassembly (groupBy doc_id + collect_list) is a streaming aggregation;
  documents are assumed complete within one micro-batch (the input is an
  append-only table of finished documents, matching the reference's
  one-job-per-complete-upload semantics — reference
  services/gateway/src/worker/processor.ts:8-115), so the query runs in
  ``update``/``complete`` mode without watermark loss.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession

from ..config import ExtractConfig
from .extract import run_extract


def run_extract_streaming(
    spark: SparkSession,
    docs_stream: DataFrame,
    media: DataFrame,
    cfg: ExtractConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the streaming extraction plan.

    docs_stream — a streaming DataFrame with the documents schema
    (``spark.readStream.schema(s).parquet(dir)`` or any other source);
    media — a static blob table. Returns (output, metrics) streaming/
    static DataFrames; callers attach a sink via ``output.writeStream``.
    """
    cfg = replace(cfg or ExtractConfig(), direct_blob_read=False)
    return run_extract(spark, docs_stream, media, cfg)


def extract_stream_to_memory(
    spark: SparkSession,
    data_dir: str,
    query_name: str = "extract_stream_sink",
    cfg: ExtractConfig | None = None,
) -> DataFrame:
    """Convenience/demo runner: stream the documents table through the
    pipeline into a memory sink, drain synchronously, and return the
    materialized result (one row per document, same shape as batch)."""
    import hashlib
    import os
    import shutil
    import tempfile

    src = f"{data_dir}/documents.parquet"
    batch_docs = spark.read.parquet(src)
    # FileStreamSource wants a directory — stage the single file once
    stage = os.path.join(
        tempfile.gettempdir(),
        f"stream-docs-{hashlib.md5(src.encode()).hexdigest()[:12]}",
    )
    os.makedirs(stage, exist_ok=True)
    dst = os.path.join(stage, "documents.parquet")
    if not os.path.exists(dst):
        shutil.copyfile(src, dst)
    docs_stream = spark.readStream.schema(batch_docs.schema).parquet(stage)
    media = spark.read.parquet(f"{data_dir}/media.parquet")
    output, _metrics = run_extract_streaming(spark, docs_stream, media, cfg)
    q = (
        output.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.sql(f"SELECT * FROM {query_name}")
    # materialize before the sink's table goes away
    return spark.createDataFrame(result.collect(), result.schema)
