"""The extraction pipeline: one declarative plan, three kernel branches.

Batch re-expression of the reference worker hot path (SURVEY.md §3.2):
the whole gateway→aligner→tesseract/paddle→Postgres dance becomes

    read → sort spans in-row → posexplode → (textual | media) branches
         → union → groupBy(doc_id) ordered reassembly → write

with exactly three shuffles at any scale:
  1. media blob join on media_ref        (shuffle-hash / broadcast if small)
  2. cost-salted repartition of the OCR stage (skew control)
  3. final reassembly groupBy(doc_id)

Span order is computed *inside the document row* (sort_array + posexplode)
— no window, no extra shuffle, and the output is independent of partition
count (SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..config import ExtractConfig
from ..kernels.html import strip_boilerplate
from ..kernels.media import extract_media_span
from ..kernels.pdf import reconstruct_reading_order
from ..kernels.text import normalize_text
from .salting import cost_salted_repartition

# unified branch-result schema (+ metrics sideband rows from the media stage)
_BRANCH_SCHEMA = (
    "doc_id string, `order` int, kind string, text string, media_ref string, "
    "row_type string, part_id int, ocr_chars long, kernel_ms double"
)


def prepare_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → one row per span with its final output order.

    Order = position of the span when the doc's spans are sorted by
    `offset` — computed row-locally: re-root the struct on offset,
    sort_array, posexplode. Offsets are unique per doc (input contract).
    """
    sorted_spans = F.sort_array(
        F.transform(
            "spans",
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )
    return docs.select(
        "doc_id", F.posexplode(sorted_spans).alias("order", "s")
    ).select(
        "doc_id",
        F.col("order").cast("int").alias("order"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )


# --------------------------------------------------------------------------
# textual branch (text / html / pdf) — vectorized pandas UDF, no join
# --------------------------------------------------------------------------

_TEXT_KERNELS = {
    "text": normalize_text,
    "html": strip_boilerplate,
    "pdf": reconstruct_reading_order,
}


@F.pandas_udf(T.StringType())
def _extract_textual(kind: pd.Series, text: pd.Series) -> pd.Series:
    out = pd.Series(index=kind.index, dtype=object)
    for k, fn in _TEXT_KERNELS.items():
        mask = kind == k
        if mask.any():
            out[mask] = text[mask].map(fn)
    out[~kind.isin(_TEXT_KERNELS)] = ""
    return out


def _textual_branch(spans: DataFrame) -> DataFrame:
    branch = spans.filter(F.col("kind") != "media")
    return branch.select(
        "doc_id",
        "order",
        F.lit("text").alias("kind"),
        _extract_textual("kind", "text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit("span").alias("row_type"),
        F.lit(None).cast("int").alias("part_id"),
        F.lit(None).cast("long").alias("ocr_chars"),
        F.lit(None).cast("double").alias("kernel_ms"),
    )


# --------------------------------------------------------------------------
# media branch — blob join, cost-salted, mapInPandas with metrics sideband
# --------------------------------------------------------------------------

def _make_media_fn(cfg: ExtractConfig):
    conf_low = cfg.confidence_low
    accepted = cfg.accepted_qr_formats

    def media_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        n_spans = 0
        ocr_chars = 0
        kernel_ms: list[float] = []
        docs_seen: set[str] = set()
        for pdf in batches:
            texts, kinds = [], []
            for blob in pdf["content"]:
                t0 = time.perf_counter()
                res = extract_media_span(
                    bytes(blob) if blob is not None else None, conf_low, accepted
                )
                kernel_ms.append((time.perf_counter() - t0) * 1000.0)
                kinds.append(res["kind"] if res["status"] == "completed" else "media_text")
                texts.append(res.get("text"))
                ocr_chars += len(res.get("text") or "")
            n_spans += len(pdf)
            docs_seen.update(pdf["doc_id"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "order": pdf["order"],
                    "kind": kinds,
                    "text": texts,
                    "media_ref": pdf["media_ref"],
                    "row_type": "span",
                    "part_id": part_id,
                    "ocr_chars": None,
                    "kernel_ms": None,
                }
            )
        # metrics sideband row — per-partition lineage (north rule), the
        # batch analog of the reference event stream (events/map.ts:16-43)
        ms = sorted(kernel_ms)
        yield pd.DataFrame(
            {
                "doc_id": [""],
                "order": [-1],
                "kind": [""],
                "text": [None],
                "media_ref": [None],
                "row_type": ["metrics"],
                "part_id": [part_id],
                "ocr_chars": [ocr_chars],
                "kernel_ms": [ms[len(ms) // 2] if ms else None],
            }
        ).assign(order=len(docs_seen), kernel_ms=[max(ms) if ms else None])

    return media_fn


def _media_branch(spans: DataFrame, media: DataFrame, cfg: ExtractConfig) -> DataFrame:
    media_spans = spans.filter(F.col("kind") == "media").select(
        "doc_id", "order", "media_ref"
    )
    joined = media_spans.join(media.select("media_ref", "content", "file_size"), "media_ref", "left")
    salted = cost_salted_repartition(joined, salt_col="media_ref")
    return salted.mapInPandas(_make_media_fn(cfg), schema=_BRANCH_SCHEMA)


# --------------------------------------------------------------------------
# assembly
# --------------------------------------------------------------------------

def run_extract(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    cfg: ExtractConfig | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline. Returns (output, metrics):

    output  — (doc_id, spans ARRAY<STRUCT<kind,text,media_ref,order>>)
    metrics — per-OCR-partition lineage rows (part_id, docs, ocr_chars,
              kernel_ms_p50, kernel_ms_max)
    """
    cfg = cfg or ExtractConfig()
    spans = prepare_spans(docs)
    branch = _textual_branch(spans).unionByName(_media_branch(spans, media, cfg))

    span_rows = branch.filter(F.col("row_type") == "span")
    metrics = (
        branch.filter(F.col("row_type") == "metrics")
        .select(
            "part_id",
            F.col("order").cast("long").alias("docs"),
            "ocr_chars",
            F.col("ocr_chars").alias("spans_chars"),
            F.col("kernel_ms").alias("kernel_ms_max"),
        )
    )

    output = (
        span_rows.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("order").alias("order"),
                        F.col("kind").alias("kind"),
                        F.col("text").alias("text"),
                        F.col("media_ref").alias("media_ref"),
                    )
                )
            ).alias("ordered")
        )
        .select(
            "doc_id",
            F.transform(
                "ordered",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["order"].alias("order"),
                ),
            ).alias("spans"),
        )
    )
    return output, metrics


def load_inputs(spark: SparkSession, data_dir: str) -> tuple[DataFrame, DataFrame]:
    docs = spark.read.parquet(f"{data_dir}/documents.parquet")
    media = spark.read.parquet(f"{data_dir}/media.parquet")
    return docs, media
