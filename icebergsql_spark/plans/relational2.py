"""Second wave of relational coverage: tricky SQL semantics.

NOT IN null semantics, regexp functions, ordered string/array aggregation,
the DataFrame pivot API, and the remaining classic TPC-H shapes (Q4 EXISTS
aggregation, Q14 promo share, Q19 bracketed OR join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.plans.common import money, one_minus

TS = "timestamp_ntz"


@register(
    "not_in_null_semantics",
    oracle="""
        SELECT
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 50000)) AS n_not_in,
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 50000
                                                THEN o_custkey END
                                    FROM orders)) AS n_not_in_with_nulls
    """,
    doc="NOT IN three-valued logic: a NULL in the subquery empties the "
    "result — both engines must agree on the trap.",
    tags=("subquery", "null"),
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 50000)) AS n_not_in,
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 50000
                                                THEN o_custkey END
                                    FROM orders)) AS n_not_in_with_nulls
        """
    )


@register(
    "fn_regexp",
    oracle=r"""
        SELECT p_partkey, p_name,
               regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
               CASE WHEN regexp_matches(p_name, '^(red|blue|green)') THEN 1 ELSE 0 END
                 AS is_color_first,
               regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled
        FROM part
        WHERE p_partkey < 200
        ORDER BY p_partkey
    """,
    doc="Regexp extract/match/replace (patterns in the RE2∩Java-regex "
    "common subset).",
    tags=("scalar-fn", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_tables(spark, sf_dir, ("part",))["part"].filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.when(F.col("p_name").rlike(r"^(red|blue|green)"), 1).otherwise(0).alias(
            "is_color_first"
        ),
        F.regexp_replace("p_name", r"[aeiou]", "*").alias("devoweled"),
    ).orderBy("p_partkey")


@register(
    "agg_ordered_lists",
    oracle="""
        SELECT n_name,
               array_to_string(list_sort(list(DISTINCT s_name)), ',') AS suppliers,
               len(list_sort(list(DISTINCT s_name))) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey < 40
        GROUP BY n_name
        ORDER BY n_name
    """,
    doc="Ordered string aggregation: sorted distinct collect → join (the "
    "deterministic form of collect_list/string_agg).",
    tags=("aggregate", "array"),
)
def agg_ordered_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    s = t["supplier"].filter(F.col("s_suppkey") < 40)
    return (
        s.join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("s_name")), ",").alias("suppliers"),
            F.size(F.collect_set("s_name")).alias("n_suppliers"),
        )
        .orderBy("n_name")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS "1-URGENT",
               COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
               COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS "3-MEDIUM",
               COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
               COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="DataFrame pivot API (explicit value list → no extra pass).",
    tags=("aggregate", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
        .na.fill(0, prios)
        .orderBy("o_orderstatus")
    )


@register(
    "agg_exact_percentiles",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    doc="Exact interpolated percentiles per group (Spark percentile ≡ "
    "DuckDB quantile_cont — both linear interpolation on the sorted set).",
    tags=("aggregate", "percentile"),
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"]
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "fn_date_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
               CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS quarter_out,
               date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
        FROM orders
        WHERE o_orderkey < 100
        ORDER BY o_orderkey
    """,
    doc="Date arithmetic: interval add, month add, datediff, last_day.",
    tags=("scalar-fn", "date"),
)
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ("orders",))["orders"].filter(F.col("o_orderkey") < 100)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("quarter_out"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast(TS)
        ).cast("bigint").alias("days_since_epoch_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    ).orderBy("o_orderkey")


@register(
    "q2_min_per_group_join",
    oracle="""
        SELECT s_suppkey, s_name, n_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier s1 JOIN nation ON s1.s_nationkey = n_nationkey
        WHERE s1.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                              WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_suppkey
    """,
    doc="TPC-H Q2 shape: correlated min-per-group scalar subquery + dim join.",
    tags=("tpch", "subquery"),
)
def q2_min_per_group_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("supplier", "nation"))
    return spark.sql(
        """
        SELECT s_suppkey, s_name, n_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
        FROM supplier s1 JOIN nation ON s1.s_nationkey = n_nationkey
        WHERE s1.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                              WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_suppkey
        """
    )


@register(
    "q7_nation_volume",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
                 / 10000.0 AS revenue,
               COUNT(*) AS n
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bilateral nation-pair volume by ship year "
    "(multi-join + OR pair predicate + cents-exact revenue).",
    tags=("tpch", "join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.common import cents

    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation")
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev_c = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(rev_c).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "fn_array_ops",
    oracle="""
        WITH t AS (
          SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents
          WHERE doc_id < 100
        )
        SELECT doc_id,
               len(toks) AS n_toks,
               CAST(list_contains(toks, 'the') AS INTEGER) AS has_the,
               toks[1] AS first_tok,
               array_to_string(toks[1:3], '-') AS first3,
               CAST(COALESCE(list_position(toks, 'data'), 0) AS BIGINT) AS data_pos
        FROM t ORDER BY doc_id
    """,
    doc="Array functions: size, contains, index, slice, position (Spark "
    "array_* vs DuckDB list_* with null-position normalization).",
    tags=("scalar-fn", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 100
    )
    toks = F.split(F.trim(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "the").cast("int").alias("has_the"),
        toks.getItem(0).alias("first_tok"),
        F.array_join(F.slice(toks, 1, 3), "-").alias("first3"),
        F.array_position(toks, "data").alias("data_pos"),
    ).orderBy("doc_id")


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS-filtered aggregation (decorrelates to semi "
    "join).",
    tags=("tpch", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "q14_promo_share",
    oracle="""
        SELECT round(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1.0 - l_discount AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE)
               * 100.0
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE), 8)
                 AS promo_share,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: promo revenue share (conditional decimal sums).",
    tags=("tpch", "join", "aggregate"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(25,4)")
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(promo).cast("double")
                * F.lit(100.0)
                / F.sum(revenue).cast("double"),
                8,
            ).alias("promo_share"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q19_bracketed_or_join",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunctive bracket predicates across both join "
    "sides (tests OR-predicate handling over a join).",
    tags=("tpch", "join", "filter"),
)
def q19_bracketed_or_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = money("l_extendedprice") * one_minus("l_discount")
    return j.filter(bracket).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )
