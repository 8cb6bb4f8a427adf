"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_rows_per_split: int = 1) -> DataFrame:
    """Spread a narrow-input DataFrame across all cores before a CPU-heavy
    per-row map.

    Spark sizes scan partitions by bytes (``spark.sql.files.maxPartitionBytes``),
    which is right for IO-bound scans but serializes compute-bound maps over
    small-but-expensive inputs (a 1 MB documents file = 1 split = 1 task
    doing ALL the tokenize/shingle/hash work while 31 cores idle).

    The repartition is GATED: it only fires when the scan produced fewer
    splits than the cluster's parallelism. At corpus scale (thousands of
    file splits >> cores) this is a no-op and adds no shuffle; at bench/test
    scale it shuffles the raw input once (tiny) to unlock the cores.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
