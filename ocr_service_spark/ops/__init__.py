"""Analytics operators beyond the extraction pipeline.

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → equivalent ANSI/DuckDB SQL). Column
names are aliased identically on both sides (driver compares value
hashes after sorting columns by name).
"""

from __future__ import annotations


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load(spark, sf_dir: str, name: str):
    return spark.read.parquet(table_path(sf_dir, name))


def widen(df):
    """Spread a narrow scan across all cores before CPU-heavy per-row
    expressions.

    Local parquet test files are a single row-group → a single input
    split → one task, which serializes shingling/hashing work that is
    embarrassingly parallel. At production scale inputs arrive in many
    splits and this is a no-op (partitions already ≥ parallelism), so the
    extra shuffle only exists where it buys a ~#cores speedup.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
