"""Round-10 gate wave: Hive-layout add_files import (partition values
parsed from ``col=value`` path segments, reference
PartitioningUtils.scala:57-71), plus later round-10 additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register


# ------------------------------------------- Hive-layout add_files --


@register(
    "managed_add_files_hive_import",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="Hive-layout add_files import (reference PartitioningUtils."
    "scala:57-71 path->partition parsing): orders written with Spark's "
    "partitionBy — so the partition column exists ONLY in the "
    "o_year=YYYY/ directory names, NOT in the data files (the classic "
    "external-Hive migration layout) — then registered zero-copy into a "
    "managed table. Partition values are parsed from the path segments, "
    "the DataFiles are flagged path_partition, and the read path "
    "materializes the column as a typed literal per partition group. "
    "In-DAG asserts: every live file is path_partition and zero-copy, "
    "metadata COUNT(*) still answers from manifests, a partition "
    "predicate prunes to that year's files only. Result: the per-year "
    "rollup THROUGH the managed read path (partition column exists only "
    "in metadata) vs the raw-parquet oracle.",
    tags=("managed", "import", "pruning", "hive"),
)
def managed_add_files_hive_import(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    src = tempfile.mkdtemp(prefix="icebergsql-hivesrc-")
    # partitionBy drops o_year from the data files — path-only layout;
    # repartition(2) gives each year dir several files so pruning counts
    # are meaningful
    orders.repartition(2).write.mode("overwrite").partitionBy(
        "o_year"
    ).parquet(src)
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-hivewh-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    tbl = eng.catalog.create_table("ord_hive", ddl, ["o_year"])
    mark_setup_done()  # staging done; the metadata-only import is the op
    res = eng.sql(
        f"CALL system.add_files(table => 'ord_hive', source_dir => '{src}')"
    ).collect()[0]
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    live = snap.live_files()
    assert res["added_files_count"] == len(live), res
    assert all(f.path_partition for f in live), "path-only import flag"
    assert all(f.path.startswith(src) for f in live), "import must not copy"
    years = sorted(
        r["o_year"] for r in orders.select("o_year").distinct().collect()
    )
    assert {f.partition["o_year"] for f in live} == {str(y) for y in years}
    # manifests carry exact partition point-ranges: metadata COUNT(*)
    # and partition pruning both work without the column in the files
    assert tbl.scan().count_from_stats() == orders.count()
    pruned = tbl.scan(where=f"o_year = {years[0]}")
    per_year = sum(
        1 for f in live if f.partition["o_year"] == str(years[0])
    )
    assert pruned.files_scanned == per_year, (
        pruned.files_scanned,
        per_year,
    )
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_hive GROUP BY o_year ORDER BY o_year"
    )
