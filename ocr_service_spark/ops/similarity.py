"""Similarity search over embedding columns.

Brute-force cosine top-k (the exact baseline) and a sign-LSH bucketed
variant (the scale path: candidates come from one bucket, so the scan is
1/2^bits of the table per query). Dot products run JVM-side via
``zip_with``/``aggregate`` higher-order functions — no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import load

TOP_K = 10
LSH_TARGET_BUCKET = 16  # expected vectors per sign-LSH bucket
QUERY_VEC_ID = 0


def _lsh_bits(n_vectors: int) -> int:
    """Corpus-sized sign-LSH bit count: buckets scale with n so expected
    bucket population stays ~LSH_TARGET_BUCKET (the probe then scans a
    ~constant-sized candidate set at any corpus size; fixed bits would
    degrade to O(n) per bucket)."""
    import math

    return max(1, math.ceil(math.log2(max(n_vectors / LSH_TARGET_BUCKET, 2.0))))


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K neighbors of QUERY_VEC_ID by cosine; returns (rank,
    vec_id) — float similarity deliberately excluded from the output so
    the check is engine-precision-independent."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm("v").alias("qn")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", (dot / (_norm("v") * F.col("qn"))).alias("cos"))
    )
    return (
        scored.orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
        .select(
            F.row_number().over(Window.orderBy(F.desc("cos"), "vec_id")).alias("rank"),
            "vec_id",
        )
    )


_ORACLE_KNN = f"""
WITH q AS (
  SELECT embedding AS qv,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qn) AS cos
  FROM embeddings e, q
  WHERE e.vec_id != {QUERY_VEC_ID}
)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id) AS rank, vec_id
FROM scored
ORDER BY cos DESC, vec_id
LIMIT {TOP_K}
"""


def _bucket_expr_spark(col, bits: int = 6):
    parts = [
        F.when(F.element_at(col, i) >= 0, "+").otherwise("-") for i in range(1, bits + 1)
    ]
    return F.concat(*parts)


# corpus-sized bucket expr in SQL: sign string of the first
# ceil(log2(n/target)) dims via a scalar subquery
_BUCKET_SQL_DYNAMIC = f"""array_to_string(list_transform(
    embedding[1:(SELECT greatest(1, CAST(ceil(log2(greatest(count(*) / {LSH_TARGET_BUCKET}.0, 2.0))) AS INT)) FROM embeddings)],
    x -> CASE WHEN x >= 0 THEN '+' ELSE '-' END), '')"""


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing (hyperplanes = the first coordinate axes,
    bit count sized to the corpus — _lsh_bits; deterministic, no stored
    model). Bucket histogram — the candidate-set size distribution an
    ANN probe would scan."""
    emb = load(spark, sf_dir, "embeddings")
    bits = _lsh_bits(emb.count())
    return (
        emb.select(_bucket_expr_spark(F.col("embedding"), bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


_ORACLE_ANN_BUCKETS = f"""
SELECT {_BUCKET_SQL_DYNAMIC} AS bucket, count(*) AS n_vectors
FROM embeddings
GROUP BY 1
"""


def q_ann_lsh_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN probe: exact top-k *within the query's LSH bucket* — the
    bucketed scale path (scan ≈ n/2^bits instead of n)."""
    emb_raw = load(spark, sf_dir, "embeddings")
    bits = _lsh_bits(emb_raw.count())
    emb = emb_raw.select(
        "vec_id",
        _as_double("embedding").alias("v"),
        _bucket_expr_spark(F.col("embedding"), bits).alias("bucket"),
    )
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm("v").alias("qn"), F.col("bucket").alias("qb")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qb")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", (dot / (_norm("v") * F.col("qn"))).alias("cos"))
    )
    return (
        scored.orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
        .select(
            F.row_number().over(Window.orderBy(F.desc("cos"), "vec_id")).alias("rank"),
            "vec_id",
        )
    )


_ORACLE_ANN_PROBE = f"""
WITH b AS (SELECT vec_id, embedding, {_BUCKET_SQL_DYNAMIC} AS bucket FROM embeddings),
q AS (
  SELECT embedding AS qv, bucket AS qb,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qn
  FROM b WHERE vec_id = {QUERY_VEC_ID}
),
scored AS (
  SELECT e.vec_id,
         list_sum(list_transform(list_zip(e.embedding, q.qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * q.qn) AS cos
  FROM b e, q
  WHERE e.bucket = q.qb AND e.vec_id != {QUERY_VEC_ID}
)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id) AS rank, vec_id
FROM scored
ORDER BY cos DESC, vec_id
LIMIT {TOP_K}
"""


# --- IVF-flat: coarse quantization + in-cell probe -------------------------------

def _ivf_k(n_vectors: int) -> int:
    """Corpus-sized coarse-centroid count: K ≈ √n, the standard IVF
    sizing — cell population and centroid count both grow as √n, so the
    probe scans ~2√n rows total at any corpus size (a fixed K degrades
    to O(n) cells as the corpus grows)."""
    import math

    return max(4, math.ceil(math.sqrt(n_vectors)))


def _ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every vector to its nearest coarse centroid by cosine.

    Centroids are the first K = √n vectors (deterministic k-means-style
    seeding — no stored model, same rule in the oracle; the count() is a
    metadata-only scan). Scale shape: the K-row centroid table
    broadcasts; assignment is one scan, no shuffle until the per-cell
    aggregate. The declarative argmax (explode × K + window) keeps the
    plan exactly oracle-comparable; a 100 TB run would swap the
    assignment stage for a pandas-UDF argmax over the broadcast
    centroid matrix (BLAS, no n×K row materialization) at the cost of
    float-summation-order divergence from pure SQL."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    k = _ivf_k(emb.count())
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), _norm("v").alias("cn")
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = emb.join(F.broadcast(cents)).select(
        "vec_id", "v", "cid", (dot / (_norm("v") * F.col("cn"))).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), "cid")
    return scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    ).select("vec_id", "v", "cid")


def q_ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-size histogram (the inverted-list length distribution)."""
    return _ivf_cells(spark, sf_dir).groupBy("cid").agg(
        F.count("*").alias("n_vectors")
    )


def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe: exact cosine top-k restricted to the query's cell
    (nprobe=1) — scan ≈ n/IVF_K instead of n."""
    cells = _ivf_cells(spark, sf_dir)
    q = cells.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), _norm("v").alias("qn"), F.col("cid").alias("qc")
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        cells.join(F.broadcast(q))
        .filter((F.col("cid") == F.col("qc")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select("vec_id", (dot / (_norm("v") * F.col("qn"))).alias("cos"))
    )
    return (
        scored.orderBy(F.desc("cos"), "vec_id")
        .limit(TOP_K)
        .select(
            F.row_number().over(Window.orderBy(F.desc("cos"), "vec_id")).alias("rank"),
            "vec_id",
        )
    )


_IVF_CELLS_SQL = """
WITH k AS (
  SELECT greatest(4, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS kk FROM embeddings
),
e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cn FROM e WHERE vec_id < (SELECT kk FROM k)),
scored AS (
  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
         list_sum(list_transform(list_zip(e.embedding, c.cv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (e.nrm * c.cn) AS ccos
  FROM e CROSS JOIN c
),
cells AS (
  SELECT vec_id, embedding, nrm, cid
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn FROM scored)
  WHERE rn = 1
)
"""

_ORACLE_IVF_CELLS = (
    _IVF_CELLS_SQL + "SELECT cid, count(*) AS n_vectors FROM cells GROUP BY cid"
)

_ORACLE_IVF_PROBE = (
    _IVF_CELLS_SQL
    + f"""
, q AS (SELECT embedding AS qv, nrm AS qn, cid AS qc FROM cells WHERE vec_id = {QUERY_VEC_ID}),
probe AS (
  SELECT cells.vec_id,
         list_sum(list_transform(list_zip(cells.embedding, q.qv),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / (cells.nrm * q.qn) AS cos
  FROM cells, q
  WHERE cells.cid = q.qc AND cells.vec_id != {QUERY_VEC_ID}
)
SELECT row_number() OVER (ORDER BY cos DESC, vec_id) AS rank, vec_id
FROM probe ORDER BY cos DESC, vec_id LIMIT {TOP_K}
"""
)


def q_label_centroid_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid: cluster sizes + centroid dimension count
    (element-wise mean via posexplode + groupBy; no driver loops)."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(_as_double("embedding")).alias("dim", "x")
    )
    centroid = dims.groupBy("label", "dim").agg(F.avg("x").alias("c"))
    return (
        centroid.groupBy("label")
        .agg(F.count("*").alias("n_dims"))
        .join(
            emb.groupBy("label").agg(F.count("*").alias("n_vectors")),
            "label",
        )
    )


_ORACLE_CENTROID = """
WITH dims AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
centroid AS (SELECT label, dim, avg(x) AS c FROM dims GROUP BY 1, 2)
SELECT c.label, c.n_dims, v.n_vectors
FROM (SELECT label, count(*) AS n_dims FROM centroid GROUP BY label) c
JOIN (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label) v
  ON c.label = v.label
"""


QUERIES = {
    "knn_bruteforce": q_knn_bruteforce,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_probe": q_ann_lsh_probe,
    "ann_ivf_cells": q_ann_ivf_cells,
    "ann_ivf_probe": q_ann_ivf_probe,
    "label_centroid_sizes": q_label_centroid_sizes,
}

ORACLES = {
    "knn_bruteforce": _ORACLE_KNN,
    "ann_lsh_buckets": _ORACLE_ANN_BUCKETS,
    "ann_lsh_probe": _ORACLE_ANN_PROBE,
    "ann_ivf_cells": _ORACLE_IVF_CELLS,
    "ann_ivf_probe": _ORACLE_IVF_PROBE,
    "label_centroid_sizes": _ORACLE_CENTROID,
}
