"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish
regex), and document fingerprinting — all as native column expressions
(JVM-side, whole-stage-codegen'd; no Python in the hot path), each with a
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import load

# fixed stopword lists (tiny but deterministic signal)
_STOP = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "de", "la", "que", "los"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "et", "la", "les", "des"),
}
_EN_STOP_SQL = "('the','and','of','to','in')"


# --- token counting ----------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    # BPE-ish subword proxy: alpha runs + digit runs + single punct
    bpe = F.regexp_count(F.col("text"), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"))
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.size(tokens)), 4).alias("avg_ws_tokens"),
            F.round(F.avg(bpe), 4).alias("avg_bpe_tokens"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        )
    )


_ORACLE_TOKEN_STATS = r"""
SELECT lang,
       count(*) AS n_docs,
       round(avg(len(string_split(text, ' '))), 4) AS avg_ws_tokens,
       round(avg(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n]'))), 4) AS avg_bpe_tokens,
       round(avg(length(text)), 4) AS avg_chars
FROM documents
GROUP BY lang
"""


# --- quality scoring -----------------------------------------------------------

def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    stop_hits = F.size(F.filter(tokens, lambda t: t.isin(*_STOP["en"])))
    mean_word_len = F.length(F.translate(F.col("text"), " ", "")) / n_tokens
    quality = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
        + (stop_hits / n_tokens) * 2.0
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.3).otherwise(0.0),
        6,
    )
    return (
        docs.select("source", quality.alias("q"))
        .groupBy("source")
        .agg(F.round(F.avg("q"), 4).alias("avg_quality"), F.count("*").alias("n_docs"))
    )


_ORACLE_QUALITY = f"""
WITH scored AS (
  SELECT source,
         round(
           least(1.0, len(string_split(text, ' ')) / 64.0) * 0.5
           + (len(list_filter(string_split(text, ' '), t -> t IN {_EN_STOP_SQL}))
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 2.0
           + CASE WHEN length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 3 AND 10
                  THEN 0.3 ELSE 0.0 END,
           6) AS q
  FROM documents
)
SELECT source, round(avg(q), 4) AS avg_quality, count(*) AS n_docs
FROM scored GROUP BY source
"""


# --- language ID heuristic ------------------------------------------------------

def _hits(tokens, lang: str):
    return F.size(F.filter(tokens, lambda t: t.isin(*_STOP[lang])))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    scored = docs.select(
        "lang",
        *[_hits(tokens, lg).alias(f"h_{lg}") for lg in _STOP],
    )
    guess = (
        F.when(
            (F.col("h_en") >= F.col("h_es"))
            & (F.col("h_en") >= F.col("h_de"))
            & (F.col("h_en") >= F.col("h_fr"))
            & (F.col("h_en") > 0),
            "en",
        )
        .when((F.col("h_es") >= F.col("h_de")) & (F.col("h_es") >= F.col("h_fr")) & (F.col("h_es") > 0), "es")
        .when((F.col("h_de") >= F.col("h_fr")) & (F.col("h_de") > 0), "de")
        .when(F.col("h_fr") > 0, "fr")
        .otherwise("unknown")
    )
    return (
        scored.select("lang", guess.alias("guessed"))
        .groupBy("lang", "guessed")
        .agg(F.count("*").alias("n"))
    )


def _hits_sql(lang: str) -> str:
    words = ",".join(f"'{w}'" for w in _STOP[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({words})))"


_ORACLE_LANGID = f"""
WITH scored AS (
  SELECT lang,
         {_hits_sql('en')} AS h_en,
         {_hits_sql('es')} AS h_es,
         {_hits_sql('de')} AS h_de,
         {_hits_sql('fr')} AS h_fr
  FROM documents
)
SELECT lang,
       CASE
         WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en > 0 THEN 'en'
         WHEN h_es >= h_de AND h_es >= h_fr AND h_es > 0 THEN 'es'
         WHEN h_de >= h_fr AND h_de > 0 THEN 'de'
         WHEN h_fr > 0 THEN 'fr'
         ELSE 'unknown'
       END AS guessed,
       count(*) AS n
FROM scored
GROUP BY 1, 2
"""


# --- fingerprinting --------------------------------------------------------------

def q_fingerprint_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 fingerprint of the first 3 tokens → cluster size histogram."""
    docs = load(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split("text", " "), 1, 3), " ")
    return (
        docs.select(F.md5(prefix).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
    )


_ORACLE_FINGERPRINT = """
SELECT cluster_size, count(*) AS n_clusters
FROM (
  SELECT md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS fp,
         count(*) AS cluster_size
  FROM documents
  GROUP BY 1
)
GROUP BY cluster_size
"""


# --- composed corpus curation (the end-to-end training-data shape) --------------

CURATION_MIN_QUALITY = 0.7


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel in one declarative plan: quality score →
    threshold filter → exact dedup (keep lexicographically-first doc per
    content hash) → per-language survivor stats. This is the composition a
    training-data pipeline runs at 100 TB; every stage is JVM-side (one
    scan, one dedup shuffle, one aggregate shuffle — Catalyst pipelines
    the score+filter into the scan)."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    stop_hits = F.size(F.filter(tokens, lambda t: t.isin(*_STOP["en"])))
    mean_word_len = F.length(F.translate(F.col("text"), " ", "")) / n_tokens
    quality = (
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
        + (stop_hits / n_tokens) * 2.0
        + F.when((mean_word_len >= 3) & (mean_word_len <= 10), 0.3).otherwise(0.0)
    )
    scored = docs.select("doc_id", "lang", "text", quality.alias("q")).filter(
        F.col("q") >= CURATION_MIN_QUALITY
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
            F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        )
    )


_ORACLE_CURATION = f"""
WITH scored AS (
  SELECT doc_id, lang, text,
         least(1.0, len(string_split(text, ' ')) / 64.0) * 0.5
         + (len(list_filter(string_split(text, ' '), t -> t IN {_EN_STOP_SQL}))
            / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 2.0
         + CASE WHEN length(replace(text, ' ', '')) / CAST(len(string_split(text, ' ')) AS DOUBLE) BETWEEN 3 AND 10
                THEN 0.3 ELSE 0.0 END AS q
  FROM documents
),
kept AS (SELECT * FROM scored WHERE q >= {{thr}}),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM kept)
  WHERE rn = 1
)
SELECT lang, count(*) AS n_docs, round(avg(q), 4) AS avg_quality,
       round(avg(length(text)), 2) AS avg_chars
FROM dedup GROUP BY lang
""".replace("{thr}", str(CURATION_MIN_QUALITY))


# --- deterministic stratified sampling ----------------------------------------
# per-language keep rates: downsample the dominant language, keep the
# rest — the standard corpus-rebalancing shape
SAMPLE_RATES = {"en": 0.25, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 0.5}
SAMPLE_DEFAULT_RATE = 1.0


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling: keep a doc iff the fractional
    value of md5(doc_id)'s first 13 hex chars is below its language's
    rate. Unlike rand()-based TABLESAMPLE, the decision is a pure
    function of the row — reproducible across retries/partitionings
    (the property a resumable 100 TB pipeline needs) and exactly
    oracle-checkable. Returns per-language kept counts."""
    docs = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16 ** 13))
    )
    rate = F.lit(SAMPLE_DEFAULT_RATE)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    kept = docs.filter(u < rate)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .join(
            docs.groupBy("lang").agg(F.count("*").alias("n_total")), "lang"
        )
        .select("lang", "n_kept", "n_total")
    )


_rate_sql = " ".join(
    f"WHEN lang = '{lang}' THEN {r}" for lang, r in SAMPLE_RATES.items()
)
_ORACLE_SAMPLE = f"""
WITH u AS (
  SELECT lang,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
           / CAST(POWER(16, 13) AS DOUBLE) AS u
  FROM documents
),
kept AS (
  SELECT lang FROM u
  WHERE u < CASE {_rate_sql} ELSE {SAMPLE_DEFAULT_RATE} END
)
SELECT t.lang, k.n_kept, t.n_total
FROM (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang) t
JOIN (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang) k USING (lang)
"""


QUERIES = {
    "token_stats": q_token_stats,
    "stratified_sample": q_stratified_sample,
    "quality_scores": q_quality_scores,
    "langid_heuristic": q_langid,
    "fingerprint_clusters": q_fingerprint_clusters,
    "corpus_curation": q_corpus_curation,
}

ORACLES = {
    "token_stats": _ORACLE_TOKEN_STATS,
    "stratified_sample": _ORACLE_SAMPLE,
    "quality_scores": _ORACLE_QUALITY,
    "langid_heuristic": _ORACLE_LANGID,
    "fingerprint_clusters": _ORACLE_FINGERPRINT,
    "corpus_curation": _ORACLE_CURATION,
}
