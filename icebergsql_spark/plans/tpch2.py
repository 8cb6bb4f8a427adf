"""TPC-H shapes q8/q9/q13/q15/q17/q22 adapted to the driver's star schema.

Second tranche of the relational widening (first: plans/tpch.py,
relational2.py). The driver's schema drops some classic columns (no
partsupp, no comments/phones), so each query keeps its CLASSIC PLAN SHAPE —
market-share CASE-sum over a double dimension join (q8), multi-way profit
rollup (q9), left-join count distribution (q13), scalar-max revenue view
(q15), correlated avg-threshold subquery (q17), anti-join + scalar avg
(q22) — with filters re-pointed at existing columns.

Determinism: plans/tpch.py's contract — DECIMAL-cast sums (exact,
order-independent), DOUBLE only at the end, ratio op order identical to
the oracle. Scale notes inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.plans.common import money, one_minus

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(12,2))"
)


@register(
    "q8_market_share",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                                  THEN {_REV_SQL}
                                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                    / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
        ORDER BY 1
    """,
    doc="TPC-H Q8 shape: supplier-nation market share inside a customer "
    "region, per year — CASE-sum ratio over a join with TWO nation roles.",
    tags=("tpch", "join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: both nation roles + region + customer + supplier broadcast;
    # the only data-sized shuffle is lineitem ⋈ orders.
    t = load_tables(
        spark, sf_dir,
        ("lineitem", "orders", "customer", "supplier", "nation", "region"),
    )
    asia_cust = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = t["supplier"].join(
        F.broadcast(t["nation"].select(F.col("n_nationkey").alias("sn_key"),
                                       F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    rev = money("l_extendedprice") * one_minus("l_discount")
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(
                        F.lit(0).cast("decimal(12,2)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(SUM({_REV_SQL}) AS DOUBLE) AS profit
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and year for parts "
    "matching a name pattern — 5-way join, fact side shuffles once.",
    tags=("tpch", "join", "aggregate"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "part", "supplier", "nation")
    )
    widget_parts = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    supp_nation = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    rev = money("l_extendedprice") * one_minus("l_discount")
    return (
        t["lineitem"]
        .join(F.broadcast(widget_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(rev).cast("double").alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
        WITH c_orders AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders ON c_custkey = o_custkey
                           AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: order-count distribution over a filtered LEFT join "
    "(zero-order customers kept) — the double-aggregation shape.",
    tags=("tpch", "join", "aggregate"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the left join shuffles on custkey; the second aggregate is
    # over |customers| rows keyed by a small int — trivially small.
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: top supplier by quarterly revenue — aggregate view + "
    "scalar-max subquery equality (exact doubles from decimal sums make "
    "the equality deterministic).",
    tags=("tpch", "subquery", "aggregate"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(money("l_extendedprice") * one_minus("l_discount"))
            .cast("double")
            .alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        t["supplier"]
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        WITH avg_qty AS (
          SELECT l_partkey AS ap_key,
                 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                        / COUNT(*)) AS threshold
          FROM lineitem GROUP BY 1
        )
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                    / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN avg_qty ON ap_key = l_partkey
        WHERE p_brand = 'Brand#13' AND p_type = 'ECONOMY'
          AND l_quantity < threshold
        GROUP BY ()
    """,
    doc="TPC-H Q17: revenue of small-quantity orders below 20% of each "
    "part's average quantity — the correlated-avg threshold shape, "
    "decorrelated into an aggregate self-join (what Catalyst does too).",
    tags=("tpch", "subquery", "aggregate"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: per-part avg is a map-side-combined aggregate of the fact
    # table; the threshold join is keyed on partkey (same shuffle key as
    # the part join, so AQE coalesces). Threshold arithmetic order matches
    # the oracle exactly: 0.2 * (double(sum_dec) / count).
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    avg_qty = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("ap_key"))
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(money("l_quantity")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("threshold")
        )
    )
    brand_parts = t["part"].filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_type") == "ECONOMY")
    ).select("p_partkey")
    return (
        t["lineitem"]
        .join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
        WITH avg_bal AS (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 / COUNT(*) AS a
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_mktsegment,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT a FROM avg_bal)
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
          )
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    doc="TPC-H Q22 shape: wealthy customers with no orders, grouped by "
    "segment — scalar-avg subquery + anti join (market-segment stands in "
    "for the classic phone-prefix country code).",
    tags=("tpch", "subquery", "anti-join"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: the scalar average broadcasts; the NOT EXISTS is a shuffle
    # anti-join on custkey (or broadcast when customers fit).
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    avg_bal = t["customer"].filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    return (
        t["customer"]
        .join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
