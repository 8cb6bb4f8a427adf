"""Bucketed co-located joins: eliminate the shuffle for repeated join keys.

The 100 TB pattern: fact tables that join on the same key over and over
(lineitem ⋈ orders on orderkey) are written ONCE bucketed+sorted by that
key; every subsequent join is then a zero-shuffle sort-merge of co-located
buckets. This is Spark's native bucketing (`DataFrameWriter.bucketBy` +
`saveAsTable`); the helper packages the write/read pair and the session
settings that keep the bucket metadata effective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by the join key."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table_name)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str,
    right_key: str, how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables. With matching bucket counts on the join
    keys, the plan has NO Exchange on either side (verified in tests)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
