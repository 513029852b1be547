"""Scale-shape guards for the dedup operators: the frequent-shingle cap
drops O(n²) mega-buckets on BOTH the Spark and oracle side, and
LSH-bucket-blocked embedding near-dup candidate pairs grow
sub-quadratically with corpus size."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_service_spark.ops import dedup


@pytest.fixture(scope="module")
def capped_corpus(spark, tmp_path_factory):
    """70 docs sharing one trigram (mega-bucket, above the 64 cap) plus
    2 near-duplicate docs sharing their trigrams (small bucket)."""
    out = tmp_path_factory.mktemp("jaccard") / "sf"
    out.mkdir()
    rows = [(f"mega-{i}", "en", f"the common phrase tail{i} x{i} y{i}") for i in range(70)]
    rows += [
        ("dup-a", "en", "alpha beta gamma delta epsilon"),
        ("dup-b", "en", "alpha beta gamma delta zeta"),
    ]
    spark.createDataFrame(rows, "doc_id string, lang string, text string").coalesce(
        1
    ).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_jaccard_mega_bucket_dropped(spark, capped_corpus):
    result = dedup.q_ngram_jaccard_pairs(spark, capped_corpus).collect()
    n_pairs = sum(r["n_pairs"] for r in result)
    # 70 mega-bucket docs would alone make C(70,2)=2415 candidate pairs;
    # with the cap only the dup pair (and no "the common phrase" pairs)
    # survives on BOTH sides
    assert 1 <= n_pairs <= 5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{capped_corpus}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(dedup.ORACLES["ngram_jaccard_pairs"]).fetchall()
    assert sum(r[1] for r in oracle) == n_pairs


@pytest.mark.skipif(
    not (
        os.path.isdir("/root/testdata/sf0.001")
        and os.path.isdir("/root/testdata/sf0.1")
    ),
    reason="testdata scale dirs absent",
)
def test_embedding_neardup_candidates_grow_subquadratically(spark):
    """LSH-bucket blocking keeps candidate pairs ~linear in corpus size:
    a k× bigger corpus must produce far fewer than k²× the pairs.
    (sf0.001 and sf0.01 carry the same 500-vector table, so the pair is
    sf0.001 → sf0.1, 500 → 2000 vectors.)"""

    def candidates(sf_dir):
        raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        bits = dedup._neardup_bits(raw.count())
        bucket = F.concat(
            *[
                F.when(F.element_at("embedding", i) >= 0, "+").otherwise("-")
                for i in range(1, bits + 1)
            ]
        )
        emb = raw.select(bucket.alias("bucket"))
        sizes = emb.groupBy("bucket").agg(F.count("*").alias("n"))
        return (
            sizes.select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
            .collect()[0]["p"]
        ), emb.count()

    p_small, n_small = candidates("/root/testdata/sf0.001")
    p_big, n_big = candidates("/root/testdata/sf0.1")
    size_ratio = n_big / n_small
    pair_ratio = p_big / max(p_small, 1)
    assert size_ratio >= 3  # sanity: corpora actually differ in size
    # quadratic blow-up would make pair_ratio ≈ size_ratio²; bucketing
    # keeps it well below that
    assert pair_ratio < (size_ratio ** 2) * 0.5
