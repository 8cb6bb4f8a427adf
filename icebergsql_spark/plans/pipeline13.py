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


# ---------------------------------------------- CDC op-code MERGE --

_CDC_AGG = """
        agg AS (
          SELECT o_custkey AS k, COUNT(*) AS cnt,
                 CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS tot
          FROM orders GROUP BY 1
        ),
        src AS (
          SELECT k, tot AS bal, 'SRC' AS seg,
                 CASE CAST(cnt % 7 AS INTEGER) WHEN 0 THEN 'D'
                      WHEN 1 THEN 'U' WHEN 2 THEN 'U'
                      ELSE 'X' END AS op
          FROM agg
          UNION ALL
          SELECT k + 10000000, tot % 100000, 'NEW', 'I'
          FROM agg WHERE k % 5 = 0
        )"""


@register(
    "managed_merge_cdc_ops",
    oracle=f"""
        WITH {_CDC_AGG},
        tgt AS (
          SELECT c_custkey AS k,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                 c_mktsegment AS seg
          FROM customer
        ),
        merged AS (
          SELECT t.k,
                 CASE WHEN s.op = 'U' THEN s.bal ELSE t.bal END AS bal,
                 t.seg
          FROM tgt t LEFT JOIN src s ON s.k = t.k
          WHERE s.k IS NULL OR s.op <> 'D'
          UNION ALL
          SELECT s.k, s.bal, s.seg
          FROM src s LEFT JOIN tgt t ON t.k = s.k
          WHERE t.k IS NULL AND s.op = 'I'
        )
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(bal) AS BIGINT) AS total_cents
        FROM merged GROUP BY 1 ORDER BY 1
    """,
    doc="Change-feed apply: MERGE whose DELETE / UPDATE / INSERT clause "
    "conditions read the CDC op-code column that exists ONLY in the "
    "source (WHEN MATCHED AND s.op='D' THEN DELETE ...), parsed through "
    "the SQL front door and executed under write.merge.mode="
    "merge-on-read — firing rows are DV-masked, original files stay "
    "live (in-DAG asserts), unfired 'X' rows keep their images. The op "
    "feed derives deterministically from orders (op by order-count mod "
    "7, balances as exact cents); the oracle replays the clause chain "
    "relationally. Completes the round-6 conditional-clause grammar "
    "(VERDICT_r09 item 7).",
    tags=("managed", "merge", "cdc", "mor"),
)
def managed_merge_cdc_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    load_tables(spark, sf_dir, ("orders", "customer"))
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-cdcops-"))
    tbl = eng.catalog.create_table(
        "cust_cdc",
        "k bigint, bal bigint, seg string",
        ["seg"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    tbl.insert(
        spark.sql(
            "SELECT c_custkey AS k, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal, "
            "c_mktsegment AS seg FROM customer"
        )
    )
    spark.sql(
        f"WITH {_CDC_AGG} SELECT * FROM src"
    ).createOrReplaceTempView("cdc_feed_v")
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    mark_setup_done()  # target seeded + feed staged; the MERGE is the op
    eng.sql("""
        MERGE INTO cust_cdc t USING cdc_feed_v s ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED AND s.op = 'U' THEN UPDATE SET bal = s.bal
        WHEN NOT MATCHED AND s.op = 'I'
          THEN INSERT (k, bal, seg) VALUES (s.k, s.bal, s.seg)
    """)
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    live = {f.path for f in snap.live_files()}
    assert before <= live, "MoR MERGE must keep original files live"
    assert sum(e.count for e in snap.dv_entries()) > 0, (
        "CDC feed always fires some D/U clause at every SF"
    )
    return eng.sql(
        "SELECT seg, COUNT(*) AS n, CAST(SUM(bal) AS BIGINT) AS "
        "total_cents FROM cust_cdc GROUP BY seg ORDER BY seg"
    )
