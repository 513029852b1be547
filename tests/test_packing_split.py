"""Properties of the training-shard packing and leakage-safe split
operators beyond what the DuckDB oracle gate already pins."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_two_phase_prefix_sum_equals_global_window(spark):
    """The distributed two-phase prefix sum must equal the naive
    single-reducer global window it replaces, shard for shard."""
    from ocr_service_spark.ops import load
    from ocr_service_spark.ops.packing import PACK_BUDGET, q_sequence_packing

    two_phase = {
        r["shard_id"]: (r["n_docs"], r["shard_tokens"])
        for r in q_sequence_packing(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("tok")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    naive = {
        r["shard_id"]: (r["n_docs"], r["shard_tokens"])
        for r in (
            docs.withColumn("gcum", F.sum("tok").over(w))
            .select(
                F.floor((F.col("gcum") - F.col("tok")) / F.lit(PACK_BUDGET)).alias(
                    "shard_id"
                ),
                "tok",
            )
            .groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("shard_tokens"))
        ).collect()
    }
    assert two_phase == naive


def test_sequence_packing_conserves_corpus(spark):
    from ocr_service_spark.ops import load
    from ocr_service_spark.ops.packing import q_sequence_packing

    shards = q_sequence_packing(spark, SF_DIR).collect()
    docs = load(spark, SF_DIR, "documents")
    totals = docs.select(
        F.count("*").alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("tok"),
    ).first()
    assert sum(r["n_docs"] for r in shards) == totals["n"]
    assert sum(r["shard_tokens"] for r in shards) == totals["tok"]
    assert all(r["shard_tokens"] > 0 for r in shards)


def test_split_is_leakage_safe_and_exhaustive(spark):
    """Every member of a near-dup component must land in the same split,
    and the split partitions the whole corpus."""
    from ocr_service_spark.ops import load
    from ocr_service_spark.ops.dedup import (
        _cc_labels,
        q_leakage_safe_split,
    )

    labels = _cc_labels(spark, SF_DIR)
    # components with >1 member have one shared key by construction of
    # the label join — verify the fixpoint actually merged them (a
    # regression here would silently re-enable doc-level splitting)
    multi = (
        labels.groupBy("label")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert multi > 0, "test corpus has no near-dup components to protect"

    # the property itself, asserted on the operator's OWN row-level
    # assignments: every member of a CC component (grouped by the
    # component label from the fixpoint, NOT by the operator's key)
    # must land in one split. A regression to doc-level keys would
    # fail here, not just drift the aggregate.
    from ocr_service_spark.ops.dedup import _split_assignment

    per_doc = _split_assignment(spark, SF_DIR).alias("pd")
    lbl = labels.alias("l")
    mixed = (
        per_doc.join(lbl, F.col("pd.doc_id") == F.col("l.node"))
        .groupBy("l.label")
        .agg(F.countDistinct("pd.split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert mixed == 0

    out = {r["split"]: r for r in q_leakage_safe_split(spark, SF_DIR).collect()}
    n_docs = load(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out.values()) == n_docs
    assert set(out) <= {"train", "val", "test"}
    assert out["train"]["n_docs"] > out.get(
        "val", {"n_docs": 0}
    )["n_docs"] if "val" in out else True
    # cluster accounting: members of a component share its key, so docs
    # can never outnumber clusters by less than the merged-duplicate count
    for r in out.values():
        assert r["n_clusters"] <= r["n_docs"]


def test_mixture_weights_form(spark):
    from ocr_service_spark.ops.packing import q_source_mixture_weights

    rows = q_source_mixture_weights(spark, SF_DIR).collect()
    assert rows, "no sources"
    shares = [r["token_share"] for r in rows]
    assert abs(sum(shares) - 1.0) < 1e-3
    for r in rows:
        # weight * share == target uniform share
        assert abs(r["sample_weight"] * r["token_share"] - 1.0 / len(rows)) < 1e-4


def test_packing_invariant_to_bucket_count(spark, monkeypatch):
    """The two-phase prefix sum is an implementation detail: the shard
    layout must not depend on how many buckets carry the partial sums."""
    import ocr_service_spark.ops.packing as P

    def run():
        return sorted(
            (r["shard_id"], r["n_docs"], r["shard_tokens"])
            for r in P.q_sequence_packing(spark, SF_DIR).collect()
        )

    base = run()
    monkeypatch.setattr(P, "PACK_BUCKETS", 1)
    assert run() == base
    monkeypatch.setattr(P, "PACK_BUCKETS", 7)
    assert run() == base


def test_packing_empty_corpus(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_service_spark.ops.packing import q_sequence_packing

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }
    )
    pq.write_table(empty, str(tmp_path / "documents.parquet"))
    out = q_sequence_packing(spark, str(tmp_path))
    assert out.count() == 0
    assert out.columns == ["shard_id", "n_docs", "shard_tokens"]


def test_token_budget_select_equals_naive_window(spark):
    """The band-pruned two-phase budget selection must equal the naive
    single-reducer per-source window it replaces, source for source."""
    from ocr_service_spark.ops import load
    from ocr_service_spark.ops.packing import TOKEN_BUDGET, q_token_budget_select

    banded = {
        r["source"]: (r["n_docs_selected"], r["tokens_selected"], r["cutoff_q"])
        for r in q_token_budget_select(spark, SF_DIR).collect()
    }
    toks = F.size(F.split("text", " "))
    docs = load(spark, SF_DIR, "documents").select(
        "doc_id",
        "source",
        toks.alias("tok"),
        F.floor(
            F.lit(1000000.0) * F.size(F.array_distinct(F.split("text", " "))) / toks
        ).alias("q"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    naive = {
        r["source"]: (r["n"], r["tok"], r["cq"])
        for r in (
            docs.withColumn("gcum", F.sum("tok").over(w))
            .where(F.col("gcum") <= TOKEN_BUDGET)
            .groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.sum("tok").alias("tok"),
                F.min("q").alias("cq"),
            )
        ).collect()
    }
    assert banded == naive
    assert banded  # the sf0.001 corpus fills every source's budget head
    assert all(tok <= TOKEN_BUDGET for _, tok, _ in banded.values())


def test_token_budget_select_planted(spark, tmp_path):
    """Planted corpus: selection is quality-first and budget-strict — a
    low-quality doc is skipped once the budget is full, and a source
    whose best doc alone exceeds the budget yields no row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_service_spark.ops.packing import TOKEN_BUDGET, q_token_budget_select

    hi = " ".join(f"w{i}" for i in range(400))          # q = 1e6, 400 tok
    mid = " ".join(f"w{i % 100}" for i in range(200))   # q = 5e5, 200 tok
    lo = " ".join("dup" for _ in range(300))            # q ≈ 3333, 300 tok
    huge = " ".join(f"u{i}" for i in range(TOKEN_BUDGET + 1))
    rows = {
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([hi, mid, lo, huge], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["a", "a", "a", "b"], pa.string()),
        "n_chars": pa.array([len(hi), len(mid), len(lo), len(huge)], pa.int64()),
    }
    pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: (r["n_docs_selected"], r["tokens_selected"], r["cutoff_q"])
        for r in q_token_budget_select(spark, str(tmp_path)).collect()
    }
    # source a: hi (400) + mid (200) = 600 ≤ budget; lo would overflow.
    # source b: its only doc is 601 tokens > budget → no row at all.
    assert out == {"a": (2, 600, 500000)}
