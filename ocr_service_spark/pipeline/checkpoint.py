"""Checkpointed, idempotently-resumable runs.

Replaces the reference's queue-retry machinery (BullMQ attempts ×3 —
reference services/gateway/src/platform/queue/index.ts:29-34) with the
batch-native equivalent (SURVEY.md §4): documents hash into a fixed set
of buckets; each run processes only buckets not yet marked completed in
the checkpoint table (anti-join), writes output partitioned by bucket
with dynamic partition overwrite (idempotent re-write), and only then
appends the bucket's lineage row. A crash between the two steps just
re-does the bucket — byte-identical, no duplicates.

Checkpoint row layout follows FIXTURES.md §4 (the batch analog of the
reference event stream, events/map.ts:1-60, and its prometheus metrics,
aligner/src/observability/metrics.py:5-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.utils import AnalysisException

from ..config import ExtractConfig
from .extract import release_persisted, run_extract

# Size n_buckets so each bucket holds at least a few hundred documents:
# buckets are the resume granularity AND the output partition count, so
# oversizing trades small-file overhead for finer resume (measured here:
# 8000 docs at 512 buckets ran ~35% slower than at 64 purely on
# partitioned-write overhead). At 10^12 docs, thousands of buckets keep
# both resume granularity and file sizes sane.
DEFAULT_BUCKETS = 64


def bucket_expr(n_buckets: int):
    """Stable doc_id → bucket (xxhash64 is seed-fixed in Spark)."""
    return F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")


def read_completed_buckets(spark: SparkSession, ckpt_path: str) -> DataFrame | None:
    try:
        ckpt = spark.read.parquet(ckpt_path)
    except AnalysisException:
        return None
    return (
        ckpt.filter(F.col("status") == "completed")
        .select(F.col("partition_key").cast("int").alias("bucket"))
        .distinct()
    )


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    out_dir: str,
    cfg: ExtractConfig | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    use_iceberg: bool = False,
) -> dict:
    """Run extraction for all not-yet-completed buckets.

    With ``use_iceberg`` the results sink is an Iceberg table append
    (bucket-partitioned) and the checkpoint a real MERGE INTO upsert
    (pipeline/iceberg.py) instead of the parquet dynamic-partition-
    overwrite + append-lineage emulation; requires the iceberg-spark
    runtime on the classpath (job.py --catalog).

    Returns {"processed_docs": n, "processed_buckets": k}.
    """
    cfg = cfg or ExtractConfig()
    out_path = f"{out_dir}/extracted"
    ckpt_path = f"{out_dir}/_checkpoint"

    if use_iceberg:
        from . import iceberg

        done = iceberg.completed_buckets(spark)
    else:
        done = read_completed_buckets(spark, ckpt_path)
    docs_b = docs.withColumn("bucket", bucket_expr(n_buckets))
    todo = docs_b.join(done, "bucket", "left_anti") if done is not None else docs_b

    if todo.limit(1).isEmpty():
        return {"processed_docs": 0, "processed_buckets": 0}

    details_out: list = []
    output, metrics = run_extract(spark, todo, media, cfg, details_out=details_out)
    output_b = output.withColumn("bucket", bucket_expr(n_buckets))

    if use_iceberg:
        from . import iceberg

        iceberg.write_output(output_b)
        written = spark.table(f"{iceberg.CATALOG}.ocr.extracted")
    else:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        output_b.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
        # lineage rows AFTER the data is durably written (crash-safe ordering)
        written = spark.read.parquet(out_path).withColumn(
            "bucket", bucket_expr(n_buckets)
        )
    if done is not None:
        written = written.join(done, "bucket", "left_anti")
    ocr_chars = F.aggregate(
        F.filter("spans", lambda s: s["kind"].isin("qr", "media_text")),
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]).cast("long"), F.lit(0)),
    )
    lineage = (
        written.select("bucket", F.size("spans").alias("n_spans"), ocr_chars.alias("oc"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_spans").alias("spans"),
            F.sum("oc").alias("ocr_chars"),
        )
        .select(
            F.lit(cfg.run_id).alias("run_id"),
            F.col("bucket").cast("string").alias("partition_key"),
            F.lit("completed").alias("status"),
            "docs",
            "spans",
            "ocr_chars",
            F.lit(None).cast("double").alias("kernel_ms_p50"),
            F.lit(None).cast("double").alias("kernel_ms_max"),
            F.lit(1).alias("attempt"),
            F.lit(None).cast("string").alias("error"),
            F.current_timestamp().alias("completed_at"),
        )
    )
    if use_iceberg:
        from . import iceberg

        iceberg.merge_checkpoint(lineage)
    else:
        lineage.write.mode("append").parquet(ckpt_path)

    # per-blob recognition records (reference recognition_results,
    # schema.ts:31-58): status, engine, confidence, QR fields, error,
    # processing_ms. The reference UPSERTS recognition rows, so this
    # table mirrors extracted/'s idempotent layout: records join to
    # their owning doc's bucket (a narrow text-sized join) and write
    # with per-bucket dynamic overwrite — a partial resume REPLACES
    # exactly its re-processed buckets' records, never duplicating
    # (the whole media table is re-extracted on resume, see
    # _media_branch docstring, but unprocessed buckets' records stand).
    if details_out:
        ref_buckets = (
            todo.select("bucket", F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select("bucket", F.col("s.media_ref").alias("media_ref"))
            .distinct()
        )
        (
            details_out[0]
            .join(ref_buckets, "media_ref")
            .withColumn("run_id", F.lit(cfg.run_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(f"{out_dir}/recognitions")
        )

    # per-OCR-partition metrics sideband (north rule: "lineage + per-
    # partition metrics (docs, spans, OCR chars, model latency)"): one
    # row per LPT media partition with its blob count, OCR chars and
    # kernel wall (p50/max/sum). The sum is the quantity the LPT cost
    # packer balances, so max/avg over partitions is the measured
    # straggler-balance evidence for this run. Cheap: the OCR results
    # are persisted, so this action re-reads the cache, not the blobs.
    metrics_rows = metrics.withColumn("run_id", F.lit(cfg.run_id))
    metrics_rows.write.mode("append").parquet(f"{out_dir}/_metrics")
    bal = (
        metrics_rows.filter(F.col("kernel_ms_sum").isNotNull())
        .agg(
            F.max("kernel_ms_sum").alias("mx"),
            F.avg("kernel_ms_sum").alias("avg"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    ocr_balance = (
        round(float(bal["mx"]) / float(bal["avg"]), 3)
        if bal["n"] and bal["avg"]
        else None
    )

    stats = todo.agg(
        F.count("*").alias("d"), F.countDistinct("bucket").alias("b")
    ).collect()[0]
    release_persisted()  # all actions done — drop the run's OCR-result cache
    return {
        "processed_docs": stats["d"],
        "processed_buckets": stats["b"],
        "ocr_partitions": bal["n"],
        # max/avg of per-partition kernel wall: 1.0 = perfectly balanced
        "ocr_partition_balance": ocr_balance,
    }


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/extracted").drop("bucket")
