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
