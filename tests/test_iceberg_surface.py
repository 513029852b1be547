"""Iceberg catalog surface: conf wiring is always checkable; the full
catalog round-trip (create → MERGE checkpoint → resume) runs only when
the iceberg-spark runtime jar is on the classpath (absent in this
container — the test skips cleanly, mirroring the real-engine adapters)."""

from __future__ import annotations

import pytest

from ocr_service_spark.pipeline import iceberg


def test_iceberg_confs_shape():
    confs = iceberg.iceberg_confs("/tmp/wh")
    assert confs["spark.sql.catalog.local.type"] == "hadoop"
    assert confs["spark.sql.catalog.local.warehouse"] == "/tmp/wh"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]
    # custom catalog name threads through
    c2 = iceberg.iceberg_confs("/tmp/wh", catalog="prod")
    assert "spark.sql.catalog.prod" in c2


def test_require_iceberg_raises_without_runtime(spark):
    if iceberg.iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="iceberg-spark runtime"):
        iceberg.require_iceberg(spark)


def test_iceberg_resume_roundtrip(spark, dataset, tmp_path):
    if not iceberg.iceberg_available(spark):
        pytest.skip("iceberg-spark runtime not on classpath")
    import os

    from ocr_service_spark.config import ExtractConfig
    from ocr_service_spark.pipeline.checkpoint import run_resumable

    data_dir = os.path.dirname(dataset["documents"])
    docs = spark.read.parquet(dataset["documents"])
    media = spark.read.parquet(dataset["media"])
    out = str(tmp_path / "ice-out")
    s1 = run_resumable(
        spark, docs, media, out, ExtractConfig(run_id="ice-1"), use_iceberg=True
    )
    assert s1["processed_docs"] > 0
    s2 = run_resumable(
        spark, docs, media, out, ExtractConfig(run_id="ice-2"), use_iceberg=True
    )
    assert s2["processed_docs"] == 0  # MERGE checkpoint → idempotent resume
