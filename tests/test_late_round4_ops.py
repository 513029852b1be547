"""Semantics tests for the late round-4 operators (the DuckDB parity
gate lives in test_queries_oracle.py; these pin the properties the
numbers must have, not just that both engines agree)."""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="testdata absent"
)


def test_quality_signal_corr_bounds_and_redundancy(spark):
    from ocr_service_spark.ops.textstats import _CORR_SIGNALS, q_quality_signal_corr

    row = q_quality_signal_corr(spark, SF_DIR).collect()[0].asDict()
    assert row["n_docs"] > 0
    pairs = [
        f"corr_{a}_{b}"
        for i, a in enumerate(_CORR_SIGNALS)
        for b in _CORR_SIGNALS[i + 1 :]
    ]
    for p in pairs:
        assert -1.0 <= row[p] <= 1.0, p
    # chars and whitespace tokens gate the same thing — the panel must
    # surface that redundancy (this is the decision the operator exists
    # to inform)
    assert row["corr_chars_tokens"] > 0.9
    # stopword hits are a partially independent signal
    assert row["corr_chars_stop_hits"] < row["corr_chars_tokens"]


def test_priority_sample_estimator(spark):
    from pyspark.sql import functions as F

    from ocr_service_spark.ops.textstats import PS_K, q_priority_sample
    from ocr_service_spark.ops import load

    out = q_priority_sample(spark, SF_DIR).collect()
    assert len(out) == PS_K
    docs = load(spark, SF_DIR, "documents")
    true_total = docs.agg(
        F.sum(F.greatest(F.col("n_chars"), F.lit(1)))
    ).collect()[0][0]
    for r in out:
        # w_hat = max(w, tau) >= w, and every row carries the same panel
        assert r["w_hat"] >= r["w"]
        assert r["true_total"] == true_total
        assert abs(r["est_total"] / r["true_total"] - 1.0 - r["rel_err"]) < 1e-4
    # Duffield-Lund-Thorup: sum(w_hat) is an unbiased total-weight
    # estimator; with k=64 of ~500 docs one draw lands well within ±50%
    assert abs(out[0]["rel_err"]) < 0.5
    # deterministic: a second run returns the identical sample
    again = q_priority_sample(spark, SF_DIR).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in again)


def test_semantic_decontam_excludes_panel_and_flags(spark):
    from pyspark.sql import functions as F

    from ocr_service_spark.ops.similarity import (
        DECON_MOD,
        DECON_PANEL_MAX,
        q_semantic_decontam,
    )
    from ocr_service_spark.ops import load

    out = q_semantic_decontam(spark, SF_DIR).collect()
    emb = load(spark, SF_DIR, "embeddings")
    n_total = emb.count()
    n_panel = min(
        emb.filter((F.col("vec_id") % DECON_MOD) == 0).count(), DECON_PANEL_MAX
    )
    # ONLY the actual panel members are exempt from screening — stratum
    # vectors beyond the panel cap stay in the corpus
    assert sum(r["n_vectors"] for r in out) == n_total - n_panel
    for r in out:
        assert 0 <= r["n_contaminated"] <= r["n_vectors"]
        assert -1.0 <= r["avg_max_cos"] <= 1.0
        assert r["max_max_cos"] >= r["avg_max_cos"]
    # the labeled synthetic embeddings cluster by label, so SOME corpus
    # vectors must sit within DECON_TH of a panel member — a planted-
    # positive check that the alarm can fire at all
    assert sum(r["n_contaminated"] for r in out) > 0


def test_timeseries_gapfill_dense_grid_and_locf(spark):
    from pyspark.sql import functions as F

    from ocr_service_spark.ops.relational import (
        GAPFILL_BUCKET_S,
        _LOCF_SENTINEL,
        q_timeseries_gapfill,
    )
    from ocr_service_spark.ops import load

    out = q_timeseries_gapfill(spark, SF_DIR)
    rows = out.collect()
    ev = load(spark, SF_DIR, "events").select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / GAPFILL_BUCKET_S) * GAPFILL_BUCKET_S)
        .cast("long")
        .alias("bucket"),
    )
    n_types = ev.select("event_type").distinct().count()
    mn, mx = ev.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    n_buckets = (mx - mn) // GAPFILL_BUCKET_S + 1
    # densification: EVERY (type, bucket) cell exists
    assert len(rows) == n_types * n_buckets
    assert any(r["is_gap"] == 1 for r in rows)  # real gaps exercised
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["bucket_start"])):
        prev = by_type.get(r["event_type"])
        if r["is_gap"] == 1:
            assert r["n_events"] == 0 and r["sum_value_cents"] == 0
            # LOCF: a gap carries the previous row's average forward
            expected = prev if prev is not None else _LOCF_SENTINEL
            assert r["avg_locf_cents"] == expected
        else:
            assert r["n_events"] > 0
            # integer-cents average: exact fixed-point, no float rounding
            assert r["avg_locf_cents"] == r["sum_value_cents"] // r["n_events"]
        by_type[r["event_type"]] = r["avg_locf_cents"]


def test_touch_attribution_invariants(spark):
    from ocr_service_spark.ops.relational import q_touch_attribution

    rows = {r["touch_type"]: r for r in q_touch_attribution(spark, SF_DIR).collect()}
    assert set(rows) == {"click", "view"}
    n_conv_first = sum(r["first_touch"] for r in rows.values())
    n_conv_last = sum(r["last_touch"] for r in rows.values())
    # every attributed conversion has exactly ONE first and ONE last touch
    assert n_conv_first == n_conv_last
    for r in rows.values():
        assert 0 < r["first_touch"] <= r["n_conversions"] <= r["n_touches"]
        # linear credit conserves: each conversion distributes <= 1e6 ppm
        # (integer DIV truncation loses at most n-1 ppm per conversion)
        assert r["linear_credit_ppm"] <= r["n_conversions"] * 1_000_000
    total_ppm = sum(r["linear_credit_ppm"] for r in rows.values())
    assert n_conv_first * 900_000 < total_ppm <= n_conv_first * 1_000_000


def test_neardup_pagerank_panel(spark):
    from ocr_service_spark.ops.dedup import PR_TOP, q_neardup_pagerank

    rows = q_neardup_pagerank(spark, SF_DIR).collect()
    assert 0 < len(rows) <= PR_TOP
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    prs = [r["pr"] for r in rows]
    # ranked descending, all positive, all connected (degree >= 1)
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)
    assert all(r["degree"] >= 1 for r in rows)
    # authority concentrates: the top doc must beat the uniform start
    # rank 1/N, else the graph contributed nothing
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert prs[0] > 1.0 / n_docs


def test_shuffle_key_skew_reads_the_known_distributions(spark):
    from ocr_service_spark.ops.relational import q_shuffle_key_skew

    rows = {r["table_key"]: r for r in q_shuffle_key_skew(spark, SF_DIR).collect()}
    assert set(rows) == {"events.user_id", "events.event_type", "documents.source"}
    for r in rows.values():
        assert r["p50_group"] <= r["p99_group"] <= r["max_group"]
        assert r["n_keys"] >= 1 and r["n_rows"] >= r["n_keys"]
        assert r["skew_x100"] >= 100 - 1  # max >= avg (integer floor)
    # a 5-value type column over the whole stream IS the skewed key the
    # diagnostic exists to flag; user ids spread ~uniformly
    assert rows["events.event_type"]["n_keys"] <= 10
    assert (
        rows["events.event_type"]["skew_x100"]
        < rows["events.user_id"]["skew_x100"] * 10
    )  # sanity: both computed on the same scale


def test_percentile_disc_rule_matches_duckdb(spark):
    """shuffle_key_skew's oracle depends on Spark percentile_disc and
    DuckDB quantile_disc picking the SAME discrete element; pin the
    index rule on adversarial group counts (boundary Ns around the
    0.99 crossing and the tiny counts where off-by-one shows)."""
    import duckdb

    con = duckdb.connect()
    for n in (1, 2, 3, 4, 5, 10, 50, 99, 100, 101):
        sdf = spark.createDataFrame([(v,) for v in range(1, n + 1)], "g long")
        srow = sdf.selectExpr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY g) AS p50",
            "percentile_disc(0.99) WITHIN GROUP (ORDER BY g) AS p99",
        ).collect()[0]
        drow = con.execute(
            f"SELECT quantile_disc(g, 0.5), quantile_disc(g, 0.99)"
            f" FROM (SELECT unnest(range(1, {n + 1})) AS g)"
        ).fetchone()
        assert (srow["p50"], srow["p99"]) == (drow[0], drow[1]), n
