"""Training-shard packing and source-mixture operators.

The post-curation steps of an LLM data pipeline: pack the surviving
documents into fixed token-budget training shards, and compute the
per-source sampling weights that re-balance the token mixture. Both are
pure DataFrame plans with DuckDB oracles.

Scale notes: packing needs a GLOBAL running token total, and a naive
`sum() OVER (ORDER BY doc_id)` window has an empty PARTITION BY — one
reducer owns the whole corpus. The implementation here is the classic
two-phase distributed prefix sum instead: per-bucket partial sums (tiny
— one row per bucket) are collected and turned into exclusive bucket
offsets on the driver, then every bucket computes its local running sum
in parallel and adds its offset. The only window that runs partitions
by bucket, so parallelism is the bucket count at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import load

PACK_BUDGET = 512   # tokens per training shard
PACK_BUCKETS = 32   # prefix-sum buckets (>= target parallelism at scale)


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in deterministic doc_id order, no splitting) into
    fixed token-budget shards: shard_id = floor(exclusive_prefix_tokens
    / PACK_BUDGET). Greedy no-split packing — a doc straddling a budget
    boundary stays whole in the shard its prefix starts in, so shard
    token counts can exceed the budget by at most one doc. Returns the
    per-shard doc/token rollup.

    The global prefix sum is two-phase (module docstring): bucket =
    floor(doc_id / width) preserves doc_id order across buckets, bucket
    partials collect to the driver (PACK_BUCKETS rows — a model-update-
    sized scalar exchange, same class as k-means centroids), and the
    within-bucket window runs one partition per bucket in parallel. The
    DuckDB oracle computes the same quantity with the single-reducer
    global window, which is exactly what this plan avoids at scale."""
    # materialize the tokenized projection once: three downstream jobs
    # (max, partials, final rollup) would otherwise each re-scan and
    # re-split the text column. The checkpointed frame is 2 ints/doc —
    # at 10^12 docs that is ~16 TB spread over the cluster
    # (MEMORY_AND_DISK), vs 3× the full text scan without it; for a
    # scan-cheaper tradeoff the projection can be recomputed instead.
    t = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("tok"))
        .localCheckpoint(eager=True)
    )
    max_id = t.agg(F.max("doc_id")).first()[0]
    if max_id is None:  # empty corpus: zero shards, stable schema
        return spark.createDataFrame(
            [], "shard_id long, n_docs long, shard_tokens long"
        )
    width = max(1, (int(max_id) + PACK_BUCKETS) // PACK_BUCKETS)
    b = t.withColumn("bucket", (F.col("doc_id") / F.lit(width)).cast("long"))
    partials = b.groupBy("bucket").agg(F.sum("tok").alias("btok")).collect()
    run = 0
    offsets = []
    for r in sorted(partials, key=lambda r: r["bucket"]):
        offsets.append((r["bucket"], run))
        run += r["btok"]
    off_df = spark.createDataFrame(offsets, "bucket long, boff long")
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum = b.join(F.broadcast(off_df), "bucket").withColumn(
        "gcum", F.col("boff") + F.sum("tok").over(w)
    )
    shard = F.floor((F.col("gcum") - F.col("tok")) / F.lit(PACK_BUDGET))
    return (
        cum.select(shard.alias("shard_id"), "tok")
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("shard_tokens"))
    )


_ORACLE_PACKING = f"""
WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT doc_id, tok,
        sum(tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS gcum
      FROM t)
SELECT CAST(floor((gcum - tok) / {PACK_BUDGET}) AS BIGINT) AS shard_id,
       count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS shard_tokens
FROM c GROUP BY 1
"""


def q_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static mixture re-weighting: per-source token shares and the
    sampling weight that moves the mixture to a uniform per-source token
    budget (weight = target_share / actual_share — the DoReMi-style
    reference-mixture computation with a uniform target). One aggregate
    shuffle on source; the totals are a broadcast-sized scalar frame."""
    docs = load(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).alias("tok")
    )
    per = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n_sources")
    )
    share = F.col("n_tokens") / F.col("tot")
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round((F.lit(1.0) / F.col("n_sources")) / share, 6).alias(
            "sample_weight"
        ),
    )


_ORACLE_MIXTURE = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot,
               count(*) AS n_sources FROM per)
SELECT source, n_docs, n_tokens,
       round(n_tokens / tot, 6) AS token_share,
       round((1.0 / n_sources) / (n_tokens / tot), 6) AS sample_weight
FROM per CROSS JOIN tot
"""


TOKEN_BUDGET = 600      # tokens selected per source
QUALITY_BAND_SHIFT = 12  # band = q >> 12 → ≤245 bands over q ∈ [0, 1e6]


def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: per source, take the
    highest-quality documents (quality desc, doc_id tiebreak) while the
    source's running token total stays ≤ TOKEN_BUDGET — the "fill a
    target token budget with the best data" step that sits between
    curation scoring and shard packing in an LLM data pipeline.
    Quality is the integer lexical-diversity score
    floor(1e6 · distinct_tokens / tokens) so the ordering and the
    reported cutoff are exact in both engines (no float-repr hazard).

    Scale shape: the naive plan is `sum(tok) OVER (PARTITION BY source
    ORDER BY q DESC)` — one reducer per source, which serializes a
    billion-document source. Here the prefix sum is banded two-phase
    (module docstring), and — unlike the global prefix in
    q_sequence_packing, which has no partition key and must collect its
    bucket partials — the band offsets stay fully distributed: the
    per-(source, quality-band) partial-sum frame is sources × ≤245
    bands rows (independent of corpus size), and each source's
    exclusive band offsets are a window over its ≤245 partial rows.
    The budget-specific win: bands whose offset already meets the
    budget are pruned BEFORE the corpus-side window, so the only sort
    work left is the ~budget-sized head of each source. The full corpus
    is touched exactly once, by the map-side-combined partial
    aggregate, and nothing sources×bands-shaped ever reaches the
    driver. The DuckDB oracle runs the single-reducer window this plan
    avoids."""
    toks = F.size(F.split("text", " "))
    q = F.floor(
        F.lit(1000000.0) * F.size(F.array_distinct(F.split("text", " "))) / toks
    )
    # materialize the scored projection once (the q_sequence_packing
    # pattern): both the partial-sum job and the window pass read it,
    # and it is 4 scalars/doc vs re-tokenizing the full text twice
    t = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            toks.alias("tok"),
            q.cast("long").alias("q"),
        )
        .localCheckpoint(eager=True)
    )
    b = t.withColumn("band", F.shiftright("q", QUALITY_BAND_SHIFT))
    partials = b.groupBy("source", "band").agg(F.sum("tok").alias("btok"))
    # exclusive offset = tokens in all strictly-higher bands of the same
    # source: a window over the statistics-sized partials frame (≤245
    # rows per source partition). Band-prune: a band whose offset
    # already meets the budget cannot contribute a selected doc
    # (gcum ≥ boff + 1 > budget), so the inner join below drops its
    # corpus rows before the sort.
    w_off = (
        Window.partitionBy("source")
        .orderBy(F.desc("band"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off_df = (
        partials.withColumn(
            "boff", F.coalesce(F.sum("btok").over(w_off), F.lit(0))
        )
        .where(F.col("boff") < TOKEN_BUDGET)
        .select("source", "band", "boff")
    )
    w = (
        Window.partitionBy("source", "band")
        .orderBy(F.desc("q"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = b.join(F.broadcast(off_df), ["source", "band"]).withColumn(
        "gcum", F.col("boff") + F.sum("tok").over(w)
    )
    return (
        cum.where(F.col("gcum") <= TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs_selected"),
            F.sum("tok").alias("tokens_selected"),
            F.min("q").alias("cutoff_q"),
        )
    )


_ORACLE_BUDGET = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS tok,
         CAST(floor(1000000.0 * len(list_distinct(string_split(text, ' ')))
                    / len(string_split(text, ' '))) AS BIGINT) AS q
  FROM documents
),
c AS (
  SELECT source, tok, q,
         sum(tok) OVER (PARTITION BY source ORDER BY q DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) AS gcum
  FROM t
)
SELECT source,
       count(*) AS n_docs_selected,
       CAST(sum(tok) AS BIGINT) AS tokens_selected,
       min(q) AS cutoff_q
FROM c WHERE gcum <= {TOKEN_BUDGET} GROUP BY source
"""


QUERIES = {
    "sequence_packing": q_sequence_packing,
    "source_mixture_weights": q_source_mixture_weights,
    "token_budget_select": q_token_budget_select,
}

ORACLES = {
    "sequence_packing": _ORACLE_PACKING,
    "source_mixture_weights": _ORACLE_MIXTURE,
    "token_budget_select": _ORACLE_BUDGET,
}
