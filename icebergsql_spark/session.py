"""Spark session factory.

Replaces the reference's ``SparkSessionExtensions`` injection point
(/root/reference/src/main/scala/org/apache/spark/sql/iceberg/planning/
SparkSessionExtensions.scala:26-38): where the reference wires parser /
optimizer-rule / strategy hooks into a Spark 2.4 session, our engine is a
library over stock PySpark, so "installation" is just building a session with
scale-appropriate defaults.

Defaults are chosen for the test harness (local[N], single JVM) but every
knob is overridable; on a real cluster the same builder works with
``master`` pointed at YARN/K8s. AQE is on so skewed joins and too-many
/too-few shuffle partitions self-correct at 100 TB scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "icebergsql_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes: on a 1000-executor cluster you would leave
    ``shuffle.partitions`` to AQE's coalescing (initialPartitionNum high,
    coalesce down), keep Arrow enabled for the Pandas-UDF operators, and set
    session timezone UTC so timestamp semantics match the oracle engines.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
