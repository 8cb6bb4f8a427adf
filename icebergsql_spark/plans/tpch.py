"""TPC-H-style headline queries over the driver's star schema.

These cover the relational surface the reference delegates to Spark and
exercises in its README/tests (SURVEY.md §2.B: scans, filters, aggregates,
joins, sorts — /root/reference/README.md:124-180, BasicCreateAndInsertTest.
scala:131-202), extended to full TPC-H shapes since the north star is "same
query capabilities as Spark SQL over these tables".

Determinism contract with the DuckDB oracle: money columns are exact
2-decimal doubles, so every SUM is computed over DECIMAL-cast inputs (exact,
associativity-independent) and the final aggregate is cast back to DOUBLE.
AVG is computed as CAST(sum AS DOUBLE)/count. This makes value hashes match
bit-for-bit regardless of partitioning / summation order — essential at
100 TB where partial-aggregate order is nondeterministic.

Scale notes per query are inline; the common principles:
  - dimension joins (region/nation/supplier/customer at TPC-H ratios) are
    broadcast-able — we mark them with F.broadcast so the plan never
    shuffles the big fact side for them;
  - aggregations run as partial (map-side) + final hash aggregates, which
    Spark picks automatically for these shapes;
  - filters sit directly on the scan so Catalyst pushes them into parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

from icebergsql_spark.plans.common import (  # noqa: F401  (re-exported)
    DEC,
    cents,
    money,
    one_minus,
    one_plus,
)


@register(
    "q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 AS sum_base_price,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS sum_disc_price,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))
                        * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE)
                 / 1000000.0 AS sum_charge,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 / COUNT(*) AS avg_price,
               CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: wide scan + 4-way exact agg over integer "
    "cents (order-independent, primitive-long fast path), 6 groups.",
    tags=("tpch", "aggregate"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: single scan, partial+final hash agg over 6 groups — no shuffle
    # pressure at any SF. The shipdate filter pushes into the parquet scan.
    # The integer-cents conversions (round(x*100) per money column) are
    # projected ONCE before the aggregate: Catalyst does not CSE across
    # aggregate expressions, so inlining them re-rounded each money column
    # up to 3x per row inside the partial agg (~12% of query time at
    # sf0.1, round-7 profile of the r6 bench drift — the rest of that
    # drift was first-run codegen warm-up, not plan regression).
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
    pre = li.select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("qty"),  # integer-valued
        cents("l_extendedprice").alias("ep_c"),
        cents("l_discount").alias("d_c"),
        cents("l_tax").alias("t_c"),
    ).withColumn(
        "disc_p", F.col("ep_c") * (F.lit(100) - F.col("d_c"))
    ).withColumn(
        "charge_p", F.col("disc_p") * (F.lit(100) + F.col("t_c"))
    )
    n = F.count(F.lit(1))
    return (
        pre.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("double").alias("sum_qty"),
            (F.sum("ep_c").cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum("disc_p").cast("double") / F.lit(10000.0)).alias("sum_disc_price"),
            (F.sum("charge_p").cast("double") / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum("qty").cast("double") / n).alias("avg_qty"),
            (F.sum("ep_c").cast("double") / F.lit(100.0) / n).alias("avg_price"),
            (F.sum("d_c").cast("double") / F.lit(100.0) / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: fact-fact join + broadcast dim + top-k.",
    tags=("tpch", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: customer is ~1/10 of orders — broadcast it; orders⋈lineitem is
    # the real shuffle, both pre-filtered before the join. Top-k via
    # orderBy+limit → Spark plans TakeOrderedAndProject (no global sort).
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5: 6-way join with broadcast dims, region-filtered revenue.",
    tags=("tpch", "join", "aggregate"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: nation/region/supplier/customer broadcast; the only shuffle
    # joins are orders⋈lineitem. The c_nationkey = s_nationkey condition
    # rides along the join instead of a post-filter so Catalyst can use it.
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    asia_nations = (
        t["nation"]
        .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    supp = t["supplier"].join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q6_forecast_revenue",
    oracle="""
        SELECT CAST(COALESCE(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                         * CAST(l_discount AS DECIMAL(12,2))), 0) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure filter+global agg; every predicate pushes to parquet.",
    tags=("tpch", "filter", "aggregate"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scale: no shuffle at all (partial aggs → single final row). The three
    # range predicates all reach the parquet reader as pushed filters, so
    # row groups outside the shipdate year are skipped by footer stats.
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.coalesce(
            F.sum(money("l_extendedprice") * money("l_discount")), F.lit(0)
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, quarter window.",
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    ords = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_volume_customer",
    oracle="""
        SELECT c_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    doc="TPC-H Q18: group-by with HAVING over a join (large-volume orders).",
    tags=("tpch", "join", "having"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty_int"))
        .filter(F.col("sum_qty_int") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty_int").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )
