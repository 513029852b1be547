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


def test_semantic_dedup_keep_first_ledger(spark, tmp_path):
    """Hand-built corpus with a known keep-first outcome: K=4 seed
    centroids on the axes, two near-dups of seed 0, two of seed 1 (one
    genuinely close, one at cos 0.8), and two cell-2 members nearly
    orthogonal to everything (kept). The ledger must match exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 1.0]),
        (4, [1.0, 0.01, 0.0, 0.0]),     # dup of 0
        (5, [0.99, -0.02, 0.01, 0.0]),  # dup of 0
        (6, [0.0, 1.0, 0.05, 0.0]),     # dup of 1
        (7, [0.6, 0.8, 0.0, 0.0]),      # cell 1, cos 0.8 to seed -> dup
        (8, [0.1, 0.09, 0.11, -0.9]),   # cell 2, cos ~0.12 -> kept
        (9, [-0.8, 0.1, 0.12, 0.05]),   # cell 2, cos ~0.15, anti 8 -> kept
    ]
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["cid"]: r
        for r in dedup.q_semantic_dedup(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    for cid, (n, dups) in {0: (3, 2), 1: (3, 2), 2: (3, 0), 3: (1, 0)}.items():
        assert rows[cid]["n_vectors"] == n, cid
        assert rows[cid]["n_dups"] == dups, cid
        assert rows[cid]["n_kept"] == n - dups, cid


def test_bloom_filter_has_no_false_negatives(spark):
    """Structural Bloom property: every probe whose exact text was
    inserted must hit; novel probes may hit only as (measured) false
    positives, bounded well below the full panel."""
    row = dedup.q_bloom_seen_probe(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_seen_hits"] == dedup.BLOOM_PROBE_N
    assert 0 <= row["n_novel_hits"] < dedup.BLOOM_PROBE_N // 2
    assert row["n_set_bits"] <= row["m_bits"]


@pytest.fixture(scope="module")
def passage_corpus(spark, tmp_path_factory):
    """Docs 1 and 2 share a verbatim 30-token passage at different
    offsets; doc 3 shares nothing; 70 "mega" docs all carry a SECOND
    30-token passage whose shingles therefore exceed the posting cap."""
    out = tmp_path_factory.mktemp("passages") / "sf"
    out.mkdir()
    shared = " ".join(f"p{i}" for i in range(30))
    boiler = " ".join(f"q{i}" for i in range(30))
    rows = [
        (1, "en", "preA0 preA1 " + shared + " tailA"),
        (2, "en", " ".join(f"preB{i}" for i in range(5)) + " " + shared),
        (3, "en", " ".join(f"c{i}" for i in range(40))),
    ]
    rows += [(100 + i, "en", boiler) for i in range(70)]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    return str(out)


def test_duplicate_passages_positions_and_cap(spark, passage_corpus):
    """The shared passage is reported once with exact start positions and
    token length, and the 70-doc boilerplate passage is dropped by the
    posting-list cap (C(70,2)=2415 pairs never materialize) — recall
    degrades gracefully instead of pair-exploding."""
    rows = dedup.q_duplicate_passages(spark, passage_corpus).collect()
    assert len(rows) == 1
    r = rows[0]
    # doc 1: passage starts after 2 lead tokens -> token 3 (1-based);
    # doc 2: after 5 lead tokens -> token 6; 23 matched shingles + W-1
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"]) == (3, 6)
    assert r["passage_tokens"] == 30
    # oracle twin agrees on the same corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{passage_corpus}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(dedup.EXTRA_ORACLES["duplicate_passages"]).fetchall()
    assert oracle == [(1, 2, 3, 6, 30)]


def _brute_force_passages(texts, w, min_tokens, cap):
    """Pure-python reference: capped posting lists, then maximal
    diagonal runs per doc pair — the spec q_duplicate_passages must
    match on ANY corpus."""
    from collections import defaultdict

    shingles = defaultdict(list)  # shingle -> [(doc_id, pos)]
    for doc_id, text in texts:
        toks = text.split(" ")
        for i in range(len(toks) - w + 1):
            shingles[" ".join(toks[i:i + w])].append((doc_id, i + 1))
    matches = defaultdict(set)  # (da, db) -> {(pa, pb)}
    for occ in shingles.values():
        if not 2 <= len(occ) <= cap:
            continue
        for da, pa in occ:
            for db, pb in occ:
                if da < db:
                    matches[(da, db)].add((pa, pb))
    out = set()
    for (da, db), ms in matches.items():
        by_diag = defaultdict(list)
        for pa, pb in ms:
            by_diag[pa - pb].append(pa)
        for diag, pas in by_diag.items():
            pas.sort()
            run_start = prev = pas[0]
            for pa in pas[1:] + [None]:
                if pa is not None and pa == prev + 1:
                    prev = pa
                    continue
                run_len = prev - run_start + 1
                if run_len + w - 1 >= min_tokens:
                    out.add((da, db, run_start, run_start - diag, run_len + w - 1))
                if pa is not None:
                    run_start = prev = pa
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_duplicate_passages_matches_brute_force(spark, tmp_path, seed):
    """Random corpora with planted shared passages: the distributed
    gaps-and-islands result must equal the quadratic reference finder
    exactly — every pair, every start position, every length."""
    import numpy as np

    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(8)]
    passage = [f"p{seed}_{i}" for i in range(rng.randint(14, 25))]
    texts = []
    for d in range(6):
        toks = [vocab[rng.randint(len(vocab))] for _ in range(rng.randint(10, 30))]
        if d in (1, 3, 4):  # plant the passage at a random offset
            at = rng.randint(0, len(toks) + 1)
            toks = toks[:at] + passage + toks[at:]
        texts.append((d, " ".join(toks)))
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        [(d, "en", t) for d, t in texts], "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"], r["start_a"], r["start_b"], r["passage_tokens"])
        for r in dedup.q_duplicate_passages(spark, str(out)).collect()
    }
    want = _brute_force_passages(
        texts, dedup.PASSAGE_W, dedup.PASSAGE_MIN_TOKENS, dedup.PASSAGE_MAX_POSTING
    )
    assert got == want
