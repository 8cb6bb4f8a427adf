"""Delegated relational surface (SURVEY.md §2.B) as oracle-checked queries.

The reference delegates all relational computation to Spark and exercises:
projections (/root/reference/README.md:124), filters incl. eq/range/IN/
IS NULL/NOT/OR (the pushdown translator at /root/reference/src/main/scala/
org/apache/spark/sql/iceberg/utils/ExpressionConversions.scala:33-92),
count(*) aggregation (README.md:149-158), equi inner join
(BasicCreateAndInsertTest.scala:192-201), and sorts (AbstractTest.scala:
156-177). SURVEY.md §2.B directs the rebuild to also cover the rest of the
Spark SQL surface: window functions, set ops, grouping sets, limits, scalar
functions, subqueries. Each query here carries a DuckDB oracle.

Determinism: same decimal-cast strategy as plans/tpch.py for double sums;
unique-key tiebreakers on every ORDER BY that feeds a LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.plans.common import money, one_minus

TS = "timestamp_ntz"


# ---------------------------------------------------------------- filters --


@register(
    "filter_compound_predicates",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_quantity BETWEEN 10 AND 20
          AND l_linestatus IN ('F', 'O')
          AND l_discount IS NOT NULL
          AND NOT (l_tax > 0.06)
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="eq + range + IN + IS NOT NULL + NOT conjunction (pushdown shapes "
    "from reference ExpressionConversions.scala:33-92).",
    tags=("filter",),
)
def filter_compound_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 20)
            & F.col("l_linestatus").isin("F", "O")
            & F.col("l_discount").isNotNull()
            & ~(F.col("l_tax") > 0.06)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "filter_disjunction_like",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_type, p_size
        FROM part
        WHERE (p_name LIKE '%blue%' OR p_type LIKE 'PROMO%')
          AND p_size >= 10
        ORDER BY p_partkey
    """,
    doc="OR of LIKE predicates + range filter.",
    tags=("filter",),
)
def filter_disjunction_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, ("part",))["part"]
    return (
        p.filter(
            (F.col("p_name").like("%blue%") | F.col("p_type").like("PROMO%"))
            & (F.col("p_size") >= 10)
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


@register(
    "projection_computed",
    oracle="""
        SELECT c_custkey,
               upper(c_name) AS name_upper,
               substr(c_name, 10, 9) AS name_digits,
               length(c_name) AS name_len,
               concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
               CAST(round(c_acctbal, 0) AS DOUBLE) AS bal_round,
               abs(c_acctbal) AS bal_abs,
               CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bal_band
        FROM customer
        ORDER BY c_custkey
    """,
    doc="Projection with string/math/case-when computed columns.",
    tags=("projection", "scalar-fn"),
)
def projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, ("customer",))["customer"]
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.round("c_acctbal", 0).cast("double").alias("bal_round"),
        F.abs("c_acctbal").alias("bal_abs"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    ).orderBy("c_custkey")


# ------------------------------------------------------------- aggregates --


@register(
    "agg_global_stats",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship,
               MIN(l_returnflag) AS min_flag
        FROM lineitem
    """,
    doc="Global aggregate: counts, distinct counts, min/max over numeric, "
    "timestamp and string (count(*) per reference README.md:149-158).",
    tags=("aggregate",),
)
def agg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.min("l_returnflag").alias("min_flag"),
    )


@register(
    "agg_groupby_having",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        HAVING COUNT(*) > 50
        ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="Multi-key group-by with HAVING and distinct-count per group.",
    tags=("aggregate", "having"),
)
def agg_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .filter(F.col("n_orders") > 50)
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy totals (subtotal + grand total rows).",
    tags=("aggregate", "grouping-sets"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "agg_cube_pivot",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
               COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_low,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="Pivot-style conditional aggregation (sum/count FILTER per bucket).",
    tags=("aggregate", "pivot"),
)
def agg_cube_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    urgent = F.col("o_orderpriority") == "1-URGENT"
    low = F.col("o_orderpriority") == "5-LOW"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.when(urgent, 1)).alias("n_urgent"),
            F.count(F.when(low, 1)).alias("n_low"),
            F.sum(F.when(urgent, money("o_totalprice"))).cast("double").alias("urgent_price"),
        )
        .orderBy("o_orderstatus")
    )


# ------------------------------------------------------------------ joins --


@register(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
        WHERE c.c_custkey < 200
        ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST
    """,
    doc="Left outer join with join-side predicate (null-extended rows kept).",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c = t["customer"].filter(F.col("c_custkey") < 200)
    o = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("2001-06-01 00:00:00").cast(TS)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select("c_custkey", "c_name", "o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .orderBy("c_custkey", F.col("o_orderkey").asc_nulls_first())
    )


@register(
    "join_full_outer",
    oracle="""
        WITH cust_nations AS (
          SELECT c_nationkey, COUNT(*) AS n_cust FROM customer
          WHERE c_acctbal > 9000 GROUP BY c_nationkey
        ), supp_nations AS (
          SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
          WHERE s_acctbal > 9000 GROUP BY s_nationkey
        )
        SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
        FROM cust_nations FULL OUTER JOIN supp_nations ON c_nationkey = s_nationkey
        ORDER BY nationkey
    """,
    doc="Full outer join of two aggregated sides with COALESCE key.",
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    cn = (
        t["customer"].filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t["supplier"].filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nationkey")
    )


@register(
    "join_semi_anti",
    oracle="""
        SELECT
          (SELECT COUNT(*) FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'P')) AS n_with_pending,
          (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_no_orders
    """,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) join cardinalities.",
    tags=("join", "subquery"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE declarative job (no driver-side .count() actions): aggregate
    # orders per customer once, left-join, derive both EXISTS cardinalities
    # from the per-customer flags in a single global aggregate.
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    per_cust = t["orders"].groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("has_pending")
    )
    return (
        t["customer"]
        .join(per_cust, t["customer"].c_custkey == per_cust.custkey, "left")
        .agg(
            F.count(F.when(F.col("has_pending") == 1, 1)).alias("n_with_pending"),
            F.count(F.when(F.col("custkey").isNull(), 1)).alias("n_no_orders"),
        )
    )


@register(
    "join_cross_small",
    oracle="""
        SELECT r.r_name, n.n_name
        FROM region r CROSS JOIN nation n
        WHERE n.n_regionkey = r.r_regionkey OR r.r_regionkey = 0
        ORDER BY r.r_name, n.n_name
    """,
    doc="Cross join of small dims with a post-filter (OR disables equi-join).",
    tags=("join",),
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return (
        t["region"].crossJoin(t["nation"])
        .filter((F.col("n_regionkey") == F.col("r_regionkey")) | (F.col("r_regionkey") == 0))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


# ---------------------------------------------------------------- set ops --


@register(
    "set_ops",
    oracle="""
        WITH big_spenders AS (
          SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 40000
        ), auto_segment AS (
          SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        )
        SELECT 'union_all' AS op, COUNT(*) AS n
          FROM (SELECT custkey FROM big_spenders UNION ALL SELECT custkey FROM auto_segment)
        UNION ALL
        SELECT 'union_distinct', COUNT(*)
          FROM (SELECT custkey FROM big_spenders UNION SELECT custkey FROM auto_segment)
        UNION ALL
        SELECT 'intersect', COUNT(*)
          FROM (SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM auto_segment)
        UNION ALL
        SELECT 'except', COUNT(*)
          FROM (SELECT custkey FROM big_spenders EXCEPT SELECT custkey FROM auto_segment)
        ORDER BY op
    """,
    doc="UNION ALL / UNION DISTINCT / INTERSECT / EXCEPT cardinalities.",
    tags=("setop",),
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    big = t["orders"].filter(F.col("o_totalprice") > 40000).select(
        F.col("o_custkey").alias("custkey")
    )
    auto = t["customer"].filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    # ONE declarative job, zero driver actions (VERDICT r1 #3): per-side
    # key multiplicities, one full-outer join, one aggregate deriving all
    # four cardinalities; stack() unpivots the single row into (op, n)
    ca = big.groupBy("custkey").agg(F.count(F.lit(1)).alias("cnt_a"))
    cb = auto.groupBy("custkey").agg(F.count(F.lit(1)).alias("cnt_b"))
    return (
        ca.join(cb, "custkey", "full")
        .agg(
            F.sum(
                F.coalesce(F.col("cnt_a"), F.lit(0))
                + F.coalesce(F.col("cnt_b"), F.lit(0))
            ).alias("union_all"),
            F.count(F.lit(1)).alias("union_distinct"),
            F.count(
                F.when(F.col("cnt_a").isNotNull() & F.col("cnt_b").isNotNull(), 1)
            ).alias("intersect"),
            F.count(
                F.when(F.col("cnt_a").isNotNull() & F.col("cnt_b").isNull(), 1)
            ).alias("except_"),
        )
        .select(
            F.expr(
                "stack(4, 'union_all', cast(union_all as bigint),"
                " 'union_distinct', cast(union_distinct as bigint),"
                " 'intersect', cast(intersect as bigint),"
                " 'except', cast(except_ as bigint)) as (op, n)"
            )
        )
        .orderBy("op")
    )


# ---------------------------------------------------------------- windows --


@register(
    "window_row_number_topn",
    oracle="""
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= 2 AND o_custkey < 100
        ORDER BY o_custkey, rn
    """,
    doc="Top-N per group via ROW_NUMBER window.",
    tags=("window",),
)
def window_row_number_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 2) & (F.col("o_custkey") < 100))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "rn",
        )
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_running_rank_lag",
    oracle="""
        SELECT o_custkey, o_orderkey,
               RANK() OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
               CAST(LAG(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price,
               CAST(LEAD(o_totalprice) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price
        FROM orders
        WHERE o_custkey < 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rnk
    """,
    doc="RANK/DENSE_RANK/LAG/LEAD + running decimal sum per customer.",
    tags=("window",),
)
def window_running_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_custkey") < 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.sum(money("o_totalprice"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_total"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
        )
        .orderBy("o_custkey", "rnk")
    )


# -------------------------------------------------------------- subqueries --


@register(
    "subquery_in_scalar",
    oracle="""
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
          AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                     / COUNT(*) FROM orders)
        ORDER BY o_orderkey
    """,
    doc="IN-subquery + scalar subquery (exact avg via decimal sum / count).",
    tags=("subquery",),
)
def subquery_in_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
          AND o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                     / COUNT(*) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_correlated_exists",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 55000)
        ORDER BY c_custkey
    """,
    doc="Correlated EXISTS subquery (decorrelates to a semi join).",
    tags=("subquery",),
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 55000)
        ORDER BY c_custkey
        """
    )


# ---------------------------------------------------------- scalar functions --


@register(
    "fn_date_parts",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mth,
               CAST(MIN(day(o_orderdate)) AS INTEGER) AS min_day,
               date_trunc('month', MIN(o_orderdate)) AS month_start,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
        ORDER BY yr, mth
    """,
    doc="Date-part extraction and truncation grouped by year/month.",
    tags=("scalar-fn", "date"),
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mth")
        )
        .agg(
            F.min(F.dayofmonth("o_orderdate")).alias("min_day"),
            F.date_trunc("month", F.min("o_orderdate")).cast(TS).alias("month_start"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("yr", "mth")
    )


@register(
    "fn_math_string",
    oracle="""
        SELECT p_partkey,
               CAST(ceil(p_retailprice) AS DOUBLE) AS price_ceil,
               CAST(floor(p_retailprice) AS DOUBLE) AS price_floor,
               CAST(p_partkey % 7 AS BIGINT) AS key_mod,
               CAST(power(2, p_size % 8) AS DOUBLE) AS pow2,
               CAST(sqrt(CAST(p_size AS DOUBLE)) AS DOUBLE) AS size_sqrt,
               replace(p_name, ' ', '_') AS name_snake,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
               trim(concat('  ', p_brand, '  ')) AS brand_trim
        FROM part
        WHERE p_partkey < 300
        ORDER BY p_partkey
    """,
    doc="Math (ceil/floor/mod/power/sqrt) and string (replace/lpad/trim) fns.",
    tags=("scalar-fn",),
)
def fn_math_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, ("part",))["part"].filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        (F.col("p_partkey") % 7).cast("bigint").alias("key_mod"),
        F.pow(F.lit(2), F.col("p_size") % 8).cast("double").alias("pow2"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    ).orderBy("p_partkey")


@register(
    "fn_null_handling",
    oracle="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               CASE WHEN c_acctbal IS NULL THEN -1 ELSE 0 END AS null_flag,
               IFNULL(NULL, c_custkey) AS key_filled
        FROM customer
        WHERE c_custkey < 100
        ORDER BY c_custkey
    """,
    doc="COALESCE / NULLIF / IFNULL / IS NULL handling.",
    tags=("scalar-fn", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, ("customer",))["customer"].filter(F.col("c_custkey") < 100)
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_acctbal").isNull(), -1).otherwise(0).alias("null_flag"),
        F.coalesce(F.lit(None).cast("bigint"), F.col("c_custkey")).alias("key_filled"),
    ).orderBy("c_custkey")


# ------------------------------------------------------------------ events --


@register(
    "events_json_time_bucket",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
    doc="Event-stream batch view: daily time buckets, JSON extraction from "
    "props, distinct users (streaming variant in streaming/ops.py). The ts "
    "column arrives as bigint nanos (see registry.load_tables); bucketing is "
    "pure integer arithmetic → DATE, so results are session-timezone-free.",
    tags=("events", "json", "time"),
)
def events_json_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    # String day key: DATE round-trips differently through pandas in the two
    # engines (date vs midnight datetime), so the bucket is emitted as text.
    day = F.date_format(
        F.date_from_unix_date(
            F.floor(F.col("ts") / F.lit(86_400_000_000_000)).cast("int")
        ),
        "yyyy-MM-dd",
    ).alias("day")
    return (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(day, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("sum_k"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "distinct_values",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="DISTINCT projection (exact dedup of the grouped key space).",
    tags=("distinct",),
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return li.select("l_returnflag", "l_linestatus").distinct().orderBy(
        "l_returnflag", "l_linestatus"
    )


@register(
    "sort_multi_key_limit",
    oracle="""
        SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
               l_returnflag
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 50
    """,
    doc="Multi-key global sort + LIMIT (planned as TakeOrderedAndProject).",
    tags=("sort", "topk"),
)
def sort_multi_key_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
            "l_returnflag",
        )
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(50)
    )
