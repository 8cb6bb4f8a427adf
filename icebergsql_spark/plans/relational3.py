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
from icebergsql_spark.plans.common import money


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


@register(
    "window_ntile_dist",
    oracle="""
        SELECT c_custkey,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
    """,
    doc="ntile / percent_rank / cume_dist over a global ordering — the "
    "ranking-distribution window family (exact integer rationals, so the "
    "doubles hash-match).",
    tags=("window",),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("customer",))
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "dedup_edit_distance_pairs",
    oracle="""
        SELECT a.p_partkey AS pa, b.p_partkey AS pb,
               CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        FROM part a
        JOIN part b
          ON a.p_type = b.p_type AND a.p_size = b.p_size
         AND a.p_partkey < b.p_partkey
        WHERE a.p_size <= 5
          AND levenshtein(a.p_name, b.p_name) <= 4
        ORDER BY pa, pb
    """,
    doc="Edit-distance fuzzy dedup: Levenshtein over attribute-blocked "
    "candidate pairs (block on (type, size) — never all-pairs; the classic "
    "blocking+verify record-linkage shape). Spark and DuckDB levenshtein "
    "are bit-identical integers.",
    tags=("dedup", "fuzzy"),
)
def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the self-join is EQUI on the blocking key, so work is
    # sum(block²) not n² — blocking-key choice bounds the blowup, and the
    # levenshtein verify runs JVM-side inside the join.
    t = load_tables(spark, sf_dir, ("part",))
    small = t["part"].filter(F.col("p_size") <= 5)
    a = small.select(
        F.col("p_partkey").alias("pa"), F.col("p_name").alias("na"),
        F.col("p_type").alias("ta"), F.col("p_size").alias("sa"),
    )
    b = small.select(
        F.col("p_partkey").alias("pb"), F.col("p_name").alias("nb"),
        F.col("p_type").alias("tb"), F.col("p_size").alias("sb"),
    )
    return (
        a.join(
            b,
            (F.col("ta") == F.col("tb"))
            & (F.col("sa") == F.col("sb"))
            & (F.col("pa") < F.col("pb")),
        )
        .withColumn("dist", F.levenshtein("na", "nb").cast("int"))
        .filter(F.col("dist") <= 4)
        .select("pa", "pb", "dist")
        .orderBy("pa", "pb")
    )


@register(
    "join_lateral_topn",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, t.o_orderkey
    """,
    doc="Correlated LATERAL subquery with per-row ORDER BY LIMIT — top-3 "
    "orders per customer. Catalyst decorrelates to a ranked window over "
    "the join (same plan a hand-written row_number gives).",
    tags=("join", "lateral", "subquery"),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, t.o_orderkey
        """
    )
