"""Explicit StructType schemas for every table the engine reads or writes.

Spark mapping of the reference's migration-managed Postgres schema
(reference: services/gateway/migrations/0000_initial.sql:1-38,
services/gateway/src/platform/database/schema/schema.ts:11-58) per
SURVEY.md §1.3 — nested typed columns instead of entity rows + jsonb.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- input: interleaved documents (BASELINE.json input_hint) ---------------
SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # text|html|pdf|media
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
    ]
)

# ---- media blob side table (analog of the MinIO object store,
# reference: services/gateway/src/platform/storage/index.ts:47-59) -----------
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("file_size", T.IntegerType(), False),  # schema.ts:19
        T.StructField("mime_type", T.StringType(), True),  # schema.ts:20
        T.StructField("width", T.IntegerType(), True),  # schema.ts:21
        T.StructField("height", T.IntegerType(), True),  # schema.ts:22
    ]
)

# ---- output spans (tagged union over result_type, schema.ts:6,38) ----------
OUT_SPAN_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # text|qr|media_text
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("order", T.IntegerType(), False),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(OUT_SPAN_SCHEMA), False),
    ]
)

# ---- per-span detail (recognition_results analog, schema.ts:31-58) ---------
QR_LOCATION_SCHEMA = T.StructType(  # jsonb → typed struct (schema.ts:48)
    [
        T.StructField("x", T.IntegerType(), True),
        T.StructField("y", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

SPAN_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("order", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("engine", T.StringType(), True),  # schema.ts:8
        T.StructField("confidence", T.DoubleType(), True),  # schema.ts:41
        T.StructField("used_preprocessed", T.BooleanType(), True),
        T.StructField("qr_data", T.StringType(), True),
        T.StructField("qr_format", T.StringType(), True),  # schema.ts:9
        T.StructField("qr_location", QR_LOCATION_SCHEMA, True),
        T.StructField("found_in_preprocessed", T.BooleanType(), True),
        T.StructField("status", T.StringType(), False),  # schema.ts:7
        T.StructField("error", T.StringType(), True),
        T.StructField("kernel_ms", T.DoubleType(), True),
    ]
)

# ---- checkpoint / lineage table (FIXTURES.md §4) ----------------------------
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("spans", T.LongType(), False),
        T.StructField("ocr_chars", T.LongType(), False),
        T.StructField("kernel_ms_p50", T.DoubleType(), True),
        T.StructField("kernel_ms_max", T.DoubleType(), True),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("completed_at", T.TimestampType(), False),
    ]
)
