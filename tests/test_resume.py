"""Checkpoint/resume: idempotency and complement-only processing
(FIXTURES.md §4; SURVEY.md §5.4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_service_spark.config import ExtractConfig
from ocr_service_spark.pipeline.checkpoint import read_output, run_resumable
from ocr_service_spark.pipeline.extract import load_inputs

N_BUCKETS = 8


def _seqs(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


def test_resume_processes_only_complement(spark, dataset, tmp_path):
    data_dir = os.path.dirname(dataset["documents"])
    docs, media = load_inputs(spark, data_dir)
    out_dir = str(tmp_path / "run")
    cfg = ExtractConfig(run_id="r1")

    n_docs = docs.count()

    # first run: everything
    s1 = run_resumable(spark, docs, media, out_dir, cfg, n_buckets=N_BUCKETS)
    assert s1["processed_docs"] == n_docs
    assert s1["processed_buckets"] == N_BUCKETS

    # second run: checkpoint says complete → no work
    s2 = run_resumable(spark, docs, media, out_dir, cfg, n_buckets=N_BUCKETS)
    assert s2 == {"processed_docs": 0, "processed_buckets": 0}

    # sabotage: drop half the checkpoint rows (simulates dying mid-run)
    ckpt_path = f"{out_dir}/_checkpoint"
    ckpt = spark.read.parquet(ckpt_path).collect()
    kept = [r for r in ckpt if int(r["partition_key"]) < N_BUCKETS // 2]
    import shutil

    shutil.rmtree(ckpt_path)
    from ocr_service_spark.schemas import CHECKPOINT_SCHEMA

    spark.createDataFrame(kept, CHECKPOINT_SCHEMA).write.parquet(ckpt_path)

    s3 = run_resumable(spark, docs, media, out_dir, cfg, n_buckets=N_BUCKETS)
    assert 0 < s3["processed_docs"] < n_docs
    assert s3["processed_buckets"] == N_BUCKETS - len(kept)

    # final output == golden, no duplicates
    out = read_output(spark, out_dir)
    assert out.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    got = _seqs(out.collect())
    golden = _seqs(spark.read.parquet(dataset["golden"]).collect())
    assert got == golden


def test_recognitions_table_written(spark, dataset, tmp_path):
    """run_resumable writes the per-blob recognition record table
    (reference recognition_results analog, schema.ts:31-58): every blob
    gets a status, OCR rows carry engine+confidence, QR short-circuits
    carry qr_data/qr_format, and processing_ms is populated."""
    data_dir = os.path.dirname(dataset["documents"])
    docs, media = load_inputs(spark, data_dir)
    out_dir = str(tmp_path / "rec-run")
    run_resumable(spark, docs, media, out_dir, ExtractConfig(run_id="rec"), n_buckets=N_BUCKETS)
    rec = spark.read.parquet(f"{out_dir}/recognitions")
    n_blobs = media.count()
    assert rec.count() == n_blobs
    assert rec.filter(F.col("status").isNull()).count() == 0
    ocr = rec.filter(F.col("kind") == "media_text").filter(F.col("status") == "completed")
    assert ocr.filter(F.col("engine").isNull() | F.col("confidence").isNull()).count() == 0
    qr = rec.filter(F.col("kind") == "qr")
    if qr.count():
        assert qr.filter(F.col("qr_data").isNull() | F.col("qr_format").isNull()).count() == 0
        assert qr.filter(F.col("engine").isNotNull()).count() == 0  # short-circuit skipped OCR
        # qr_location {x,y,width,height} round-trips through the sink
        # (reference persists it as jsonb, schema.ts:48) and matches the
        # blob's embedded annotation
        assert qr.filter(F.col("qr_location").isNull()).count() == 0
        assert (
            qr.filter(
                (F.col("qr_location.width") <= 0) | (F.col("qr_location.height") <= 0)
            ).count()
            == 0
        )
        from ocr_service_spark.kernels.media import decode_simg

        sample = qr.select("media_ref", "qr_location").limit(3).collect()
        blobs = {
            r["media_ref"]: bytes(r["content"])
            for r in media.filter(
                F.col("media_ref").isin([s["media_ref"] for s in sample])
            ).collect()
        }
        for s in sample:
            meta, _ = decode_simg(blobs[s["media_ref"]])
            x, y, w, h = meta["qr"]["location"]
            loc = s["qr_location"]
            assert (loc["x"], loc["y"], loc["width"], loc["height"]) == (x, y, w, h)
    assert rec.filter(F.col("processing_ms").isNull()).count() == 0
    assert rec.select("run_id").distinct().collect()[0][0] == "rec"
    # healthy run: every record from a first task attempt (schema.ts:53)
    assert rec.filter(F.col("attempt_number") != 1).count() == 0


def test_metrics_sideband_written_with_balance(spark, dataset, tmp_path):
    """run_resumable persists the per-OCR-partition metrics sideband
    (north rule: "lineage + per-partition metrics (docs, spans, OCR
    chars, model latency)") and the job summary carries the measured
    LPT straggler balance (max/avg of per-partition kernel wall)."""
    data_dir = os.path.dirname(dataset["documents"])
    docs, media = load_inputs(spark, data_dir)
    out_dir = str(tmp_path / "metrics-run")
    s = run_resumable(
        spark, docs, media, out_dir, ExtractConfig(run_id="m1"), n_buckets=N_BUCKETS
    )
    m = spark.read.parquet(f"{out_dir}/_metrics").filter(F.col("run_id") == "m1")
    worked = m.filter(F.col("kernel_ms_sum").isNotNull())
    assert worked.count() == s["ocr_partitions"] > 0
    # every blob is counted exactly once across partitions
    assert worked.agg(F.sum("n_blobs")).collect()[0][0] == media.count()
    # latency stats are internally consistent: p50 <= max <= sum
    bad = worked.filter(
        (F.col("kernel_ms_p50") > F.col("kernel_ms_max"))
        | (F.col("kernel_ms_max") > F.col("kernel_ms_sum"))
    )
    assert bad.count() == 0
    # balance = max/avg of kernel_ms_sum, >= 1.0 by construction
    assert s["ocr_partition_balance"] >= 1.0
    sums = [r["kernel_ms_sum"] for r in worked.collect()]
    assert abs(s["ocr_partition_balance"] - max(sums) / (sum(sums) / len(sums))) < 0.01
    # a resume with nothing to do writes no new metrics rows
    s2 = run_resumable(
        spark, docs, media, out_dir, ExtractConfig(run_id="m2"), n_buckets=N_BUCKETS
    )
    assert s2["processed_docs"] == 0
    assert (
        spark.read.parquet(f"{out_dir}/_metrics")
        .filter(F.col("run_id") == "m2")
        .count()
        == 0
    )


def test_recognitions_no_duplicates_on_partial_resume(spark, dataset, tmp_path):
    """A partial resume re-extracts the whole media table (documented
    corollary) but must append recognition records ONLY for the buckets
    it actually processed — no duplicate blob records across runs."""
    data_dir = os.path.dirname(dataset["documents"])
    docs, media = load_inputs(spark, data_dir)
    out_dir = str(tmp_path / "rec-resume")
    run_resumable(spark, docs, media, out_dir, ExtractConfig(run_id="a"), n_buckets=N_BUCKETS)
    # drop half the checkpoint → those buckets become TODO again
    ckpt = spark.read.parquet(f"{out_dir}/_checkpoint")
    keep = ckpt.filter(F.col("partition_key").cast("int") < N_BUCKETS // 2)
    keep.write.mode("overwrite").parquet(f"{out_dir}/_ckpt_tmp")
    spark.read.parquet(f"{out_dir}/_ckpt_tmp").write.mode("overwrite").parquet(
        f"{out_dir}/_checkpoint"
    )
    run_resumable(spark, docs, media, out_dir, ExtractConfig(run_id="b"), n_buckets=N_BUCKETS)
    rec = spark.read.parquet(f"{out_dir}/recognitions")
    dups = (
        rec.groupBy("media_ref").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0
    assert rec.count() == media.count()  # every blob recorded exactly once
