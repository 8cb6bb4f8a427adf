"""Relational-surface widening, tranche 3: GROUPING SETS, bitwise
expressions, RANGE window frames.

Shapes Spark's §2.B delegated surface supports that rounds 1-2 hadn't put
behind the oracle gate yet. All pure Spark SQL / DataFrame — Catalyst owns
the plans (Expand for grouping sets, a single window exchange for the
range frame)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.plans.tpch import money


@register(
    "agg_grouping_sets",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, rflag, lstatus
    """,
    doc="Explicit GROUPING SETS with GROUPING() disambiguation — the "
    "general form behind rollup/cube; plans as one Expand + hash "
    "aggregate (single shuffle for every grouping combination).",
    tags=("aggregate", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    t["lineitem"].createOrReplaceTempView("li_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
               COALESCE(l_linestatus, 'ALL') AS lstatus,
               GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY gid, rflag, lstatus
        """
    )


@register(
    "fn_bitwise_ops",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 15 AS bor,
               xor(o_orderkey, 129) AS bxor,
               o_orderkey << 2 AS shl,
               o_orderkey >> 3 AS shr,
               CAST(bit_count(o_orderkey) AS INTEGER) AS popcnt
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
    doc="Bitwise expression surface: and/or/xor/shifts/popcount — exact "
    "integer ops, trivially hash-stable.",
    tags=("functions", "bitwise"),
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    k = F.col("o_orderkey")
    return (
        t["orders"]
        .filter(k < 500)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("band"),
            k.bitwiseOR(F.lit(15)).alias("bor"),
            k.bitwiseXOR(F.lit(129)).alias("bxor"),
            F.shiftleft(k, 2).alias("shl"),
            F.shiftright(k, 3).alias("shr"),
            F.bit_count(k).alias("popcnt"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_range_frame",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS near_sum,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
               ) AS near_n
        FROM orders
        WHERE o_custkey < 50
        ORDER BY o_custkey, o_totalprice, o_orderkey
    """,
    doc="RANGE window frames (value-based, not row-based): per customer, "
    "the sum/count of orders within a price band of each order — one "
    "window exchange keyed by customer.",
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the DataFrame API's rangeBetween only accepts integral offsets;
    # value-typed (double) bounds are a SQL-surface feature
    t = load_tables(spark, sf_dir, ("orders",))
    t["orders"].createOrReplaceTempView("ord_rf")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS near_sum,
               COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING
               ) AS near_n
        FROM ord_rf
        WHERE o_custkey < 50
        ORDER BY o_custkey, o_totalprice, o_orderkey
        """
    )
