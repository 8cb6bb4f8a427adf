"""TPC-H shapes q11/q12/q16/q20/q21 — completing the 22-query surface.

Third tranche (after plans/tpch.py, tpch2.py). The driver's schema has no
partsupp and no shipmode/commitdate/receiptdate, so each query keeps its
CLASSIC PLAN SHAPE with filters re-pointed at existing columns:

- q11: per-key value sum HAVING a scalar fraction-of-total subquery
  (partsupp value -> lineitem revenue restricted to one supplier nation).
- q12: join + two CASE-sum counts ("late shipment" = shipdate lags
  orderdate by >60 days, standing in for receipt/commit lateness).
- q16: distinct-supplier count per part attribute group with a NOT IN
  supplier exclusion subquery (complaints -> negative account balance).
- q20: nested IN subqueries with a correlated-aggregate threshold
  (availqty > half shipped -> 1996 shipments > half of all-time, per
  (part, supplier) pair), decorrelated into aggregate self-joins.
- q21: the double EXISTS / NOT EXISTS correlation on the fact table,
  decorrelated into one per-order aggregate (distinct suppliers vs
  distinct LATE suppliers) — one orderkey shuffle instead of three
  correlated scans.

Determinism follows plans/tpch.py's contract: DECIMAL sums (exact,
order-independent), DOUBLE casts only at the end, ratio/threshold op
order identical between Spark and the oracle.

Relational execution is delegated to Spark in the reference too
(`/root/reference/sql/src/main/scala/org/apache/spark/sql/ice/
IcebergScanStrategy.scala:24-63` plans only the scan; everything above it
is stock Catalyst), so parity here means classic TPC-H plan shapes run
through our scan layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.plans.common import money

_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q11_important_stock",
    oracle="""
        WITH val AS (
          SELECT l_partkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(12,2))) AS v
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_3'
          GROUP BY 1
        )
        SELECT l_partkey AS partkey, CAST(v AS DOUBLE) AS part_value
        FROM val
        WHERE CAST(v AS DOUBLE) >
              (SELECT CAST(SUM(v) AS DOUBLE) * 0.0002 FROM val)
        ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 shape: parts whose shipped value for one supplier "
    "nation exceeds a fraction of that nation's total — per-key aggregate "
    "+ scalar fraction-of-total HAVING subquery.",
    tags=("tpch", "subquery", "aggregate"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: supplier⋈nation broadcasts; the fact aggregates once on
    # partkey (map-side combined); the scalar total re-aggregates the
    # small per-part frame and broadcasts back — no second fact scan.
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    nation_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = (
        t["lineitem"]
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(money("l_extendedprice") * money("l_quantity")).alias("v"))
    )
    total = val.agg((F.sum("v").cast("double") * F.lit(0.0002)).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("v").cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_late_priority_counts",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    doc="TPC-H Q12 shape: high/low-priority order counts for late "
    "shipments by line status — join + dual CASE-sum (shipmode stands "
    "replaced by linestatus, receipt-lateness by ship-lag >60 days).",
    tags=("tpch", "join", "aggregate"),
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: one fact⋈orders shuffle on orderkey; the CASE-sums combine
    # map-side into a 2-row result. The shipdate range prunes at the scan.
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#13'
          AND p_type NOT LIKE 'STAND%'
          AND p_size IN (1, 5, 9, 13, 17)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct suppliers per part attribute group, "
    "excluding a supplier denylist via NOT IN subquery (complaint filter "
    "stands replaced by negative account balance).",
    tags=("tpch", "subquery", "aggregate"),
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: part filter broadcasts; the denylist is tiny and broadcasts
    # as an anti join; COUNT(DISTINCT) shuffles once on the group keys
    # with partial distinct aggregation map-side.
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").like("STAND%"))
        & (F.col("p_size").isin(1, 5, 9, 13, 17))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    denylist = t["supplier"].filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(denylist),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_promotion_suppliers",
    oracle="""
        WITH widget_parts AS (
          SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
        ),
        shipped AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                          THEN CAST(l_quantity AS DECIMAL(12,2))
                          ELSE CAST(0 AS DECIMAL(12,2)) END) AS q96,
                 SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qall
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM widget_parts)
          GROUP BY 1, 2
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN shipped ON l_suppkey = s_suppkey
        WHERE n_name = 'NATION_1'
          AND CAST(q96 AS DOUBLE) > 0.5 * CAST(qall AS DOUBLE)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 shape: suppliers in one nation whose 1996 shipments of "
    "pattern-matched parts exceed half their all-time shipments of those "
    "parts — nested IN subqueries + correlated-aggregate threshold, "
    "decorrelated into one conditional aggregate per (part, supplier).",
    tags=("tpch", "subquery", "aggregate"),
)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: classic q20's correlated availqty subquery decorrelates to a
    # single grouped aggregate over the fact (both the 1996 and all-time
    # sums come from ONE pass via conditional aggregation — no self-join,
    # no second scan). Part filter and supplier⋈nation broadcast.
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    widget = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    in96 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    shipped = (
        t["lineitem"]
        .join(F.broadcast(widget), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(in96, money("l_quantity")).otherwise(
                    F.lit(0).cast("decimal(12,2)")
                )
            ).alias("q96"),
            F.sum(money("l_quantity")).alias("qall"),
        )
        .filter(F.col("q96").cast("double") > F.lit(0.5) * F.col("qall").cast("double"))
    )
    nation_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        # supplier rows are unique, so the semi join IS the DISTINCT
        nation_supp.join(
            shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        ).orderBy("s_suppkey")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE o_orderstatus = 'F'
          AND n_name = 'NATION_2'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
    """,
    doc="TPC-H Q21 shape: suppliers solely responsible for late multi-"
    "supplier finished orders — EXISTS + NOT EXISTS double correlation "
    "(receipt-lateness stands replaced by ship-lag >60 days). The oracle "
    "runs the literal correlated form; Spark runs the decorrelation.",
    tags=("tpch", "subquery", "join", "aggregate"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both EXISTS subqueries decorrelate into ONE per-order
    # aggregate — distinct suppliers and distinct LATE suppliers per
    # order — so the fact shuffles once on orderkey (AQE reuses the key
    # for the join back). For a late l1 row:
    #   EXISTS l2 (other supplier)        <=> n_supp >= 2
    #   NOT EXISTS l3 (other late suppl.) <=> n_late_supp == 1
    # Supplier⋈nation broadcasts.
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "supplier", "nation"))
    ords = (
        t["orders"]
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t["lineitem"].join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.count_distinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    nation_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_2")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(late)
        .join(F.broadcast(nation_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(per_order, F.col("l_orderkey") == F.col("po_key"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
