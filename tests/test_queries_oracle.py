"""Driver-contract gate, mirrored locally: every queries() entry must
match its DuckDB oracle (row count + columns + order-insensitive values)
at sf0.001. Rows-only entries must return rows."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

SF_DIR = "/root/testdata/sf0.001"


def test_all_queries_match_oracle(spark):
    from check_oracle import run_checks

    failures = run_checks(spark, SF_DIR)
    assert failures == []


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "span_order"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # all but the binary-kernel ops are oracle-checked
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "extract_pipeline",
        "media_metadata",
        "media_size_stats",
        "media_thumbnails",
        "video_frame_sample",
        "audio_features",
        "structured_receipts",
    }
