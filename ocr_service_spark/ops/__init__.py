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


def parse_size_bytes(s: str) -> int:
    """Parse a Spark size conf string ('16m', '128k', '1g', '134217728')."""
    s = str(s).strip().lower().removesuffix("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def estimated_scan_partitions(df) -> int | None:
    """Estimated scan partition count for a file-backed frame from file
    sizes and spark.sql.files.maxPartitionBytes — WITHOUT df.rdd, which
    would force an RDD conversion of the whole plan. None for non-file
    frames."""
    import os

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        path = uri[7:] if uri.startswith("file://") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    mpb = parse_size_bytes(
        df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    return max(1, -(-total // max(1, mpb)))


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
    est = estimated_scan_partitions(df)
    if est is None:
        est = df.rdd.getNumPartitions()  # non-file frame: local/test-sized
    if est < target:
        return df.repartition(target)
    return df
