"""End-to-end pipeline: span-sequence equality vs golden fixtures.

The primary invariant (BASELINE.json): for every doc_id, the ordered
sequence of (kind, text, media_ref, order) equals the golden sequence.
"""

from __future__ import annotations

import pytest

from ocr_service_spark.pipeline.extract import load_inputs, run_extract


def _seqs(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


@pytest.fixture(scope="module")
def result(spark, dataset):
    docs, media = load_inputs(spark, __import__("os").path.dirname(dataset["documents"]))
    out, metrics = run_extract(spark, docs, media)
    return _seqs(out.collect()), metrics.collect(), spark.read.parquet(dataset["golden"])


def test_span_sequence_equality(result, spark, dataset):
    got, _, golden_df = result
    golden = _seqs(golden_df.collect())
    assert set(got) == set(golden)
    mismatched = [d for d in golden if got[d] != golden[d]]
    assert mismatched == [], f"{len(mismatched)} docs mismatch, e.g. {mismatched[:3]}"


def test_orders_are_contiguous(result):
    got, _, _ = result
    for doc_id, seq in got.items():
        assert [s[3] for s in seq] == list(range(len(seq))), doc_id


def test_metrics_cover_all_media_blobs(result):
    _, metrics, _ = result
    assert sum(m["n_blobs"] for m in metrics) > 0
    assert all(m["ocr_chars"] >= 0 for m in metrics)
    assert any(m["kernel_ms_max"] is not None for m in metrics)
