"""Relational-surface widening, tranche 4: deterministic statistical
aggregates, first/last/nth window frames, timestamp arithmetic, map
functions.

The statistics query is the interesting one: corr / regr_slope /
regr_intercept / stddev are normally float-order-dependent (Spark and
DuckDB both stream doubles through Welford-style accumulators in
whatever order partitions arrive), so the built-in aggregates can never
hash-match across engines.  Instead we compute the five exact moment
sums (n, Σx, Σy, Σx², Σy², Σxy) over integer-cents / DECIMAL(38,0)
values — exact and order-independent — and derive every statistic from
them with the SAME double-precision expression text in both engines.
IEEE arithmetic is deterministic given identical operand order, so the
results are bit-identical.  This is also the right 100 TB shape: one
partial+final hash aggregate, no second pass, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

# Shared SQL text (Spark and DuckDB parse the same string, so the double
# math has identical operand order → bit-identical results engine-to-engine).
# Moment sums: qty cents square ≤ 25e6/row → bigint sum safe to ~3e11 rows
# per group; price-cents squares reach 1e14/row so their sums ride
# DECIMAL(38,0) (exact to ~1e24 rows) — at 100 TB this stays a single
# partial+final aggregate with no overflow.
_REGRESSION_SQL = """
WITH sums AS (
  SELECT l_returnflag AS rflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(qc) AS DOUBLE) AS sx,
         CAST(SUM(pc) AS DOUBLE) AS sy,
         CAST(SUM(qc * qc) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(pc * pc AS DECIMAL(38,0))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(qc * pc AS DECIMAL(38,0))) AS DOUBLE) AS sxy
  FROM (SELECT l_returnflag,
               CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc
        FROM {lineitem}) c
  GROUP BY l_returnflag
), derived AS (
  SELECT rflag, n, sx, sy,
         (n * sxy - sx * sy) AS cov_n2,
         (n * sxx - sx * sx) AS var_xn2,
         (n * syy - sy * sy) AS var_yn2
  FROM sums
)
SELECT rflag,
       CAST(n AS BIGINT) AS n_rows,
       cov_n2 / SQRT(var_xn2 * var_yn2) AS corr_qty_price,
       cov_n2 / var_xn2 AS regr_slope,
       ((sy - (cov_n2 / var_xn2) * sx) / n) / 100.0 AS regr_intercept_dollars,
       SQRT(var_xn2 / (n * (n - 1.0))) / 100.0 AS stddev_qty,
       SQRT(var_yn2 / (n * (n - 1.0))) / 100.0 AS stddev_price,
       (cov_n2 / SQRT(var_xn2 * var_yn2)) * (cov_n2 / SQRT(var_xn2 * var_yn2)) AS r2
FROM derived
ORDER BY rflag
"""


@register(
    "agg_regression_stats",
    oracle=_REGRESSION_SQL.format(lineitem="lineitem"),
    doc="corr/regr_slope/regr_intercept/stddev per group, derived from "
    "exact integer/decimal moment sums so the float math is order-free "
    "and bit-identical across engines (built-in corr()/stddev() can't "
    "hash-match: they fold doubles in partition order). One aggregate, "
    "map-side partials — the minimal-shuffle plan at any scale.",
    tags=("aggregate", "statistics"),
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_REGRESSION_SQL.format(lineitem="lineitem"))


@register(
    "recursive_month_spine",
    oracle="""
        WITH RECURSIVE spine AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, 0 AS i,
                 CAST(o_orderkey % 5 + 1 AS INTEGER) AS n
          FROM orders WHERE o_orderkey % 37 = 0
          UNION ALL
          SELECT o_orderkey, CAST(d + INTERVAL 1 MONTH AS DATE) AS d,
                 i + 1 AS i, n
          FROM spine WHERE i + 1 < n
        )
        SELECT strftime(d, '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        FROM spine GROUP BY 1 ORDER BY month
    """,
    doc="Recursive CTE #1 (Spark 4.x WITH RECURSIVE): per-order monthly "
    "spine walked orderdate → orderdate + (key%5) months, then rolled up "
    "per month — the gap-fill/date-dimension expansion pattern. Calendar "
    "month arithmetic is exact in both engines; day strings avoid the "
    "pandas DATE round-trip mismatch.",
    tags=("recursive", "date"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE spine AS (
          SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d, 0 AS i,
                 CAST(o_orderkey % 5 + 1 AS INT) AS n
          FROM orders WHERE o_orderkey % 37 = 0
          UNION ALL
          SELECT o_orderkey, CAST(d + INTERVAL 1 MONTH AS DATE) AS d,
                 i + 1 AS i, n
          FROM spine WHERE i + 1 < n
        )
        SELECT date_format(d, 'yyyy-MM') AS month,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM spine GROUP BY 1 ORDER BY month
        """
    )


@register(
    "recursive_key_chain",
    oracle="""
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS start, CAST(c_custkey AS BIGINT) AS node,
                 0 AS depth
          FROM customer WHERE c_custkey % 11 = 0
          UNION ALL
          SELECT start, node // 10 AS node, depth + 1 AS depth
          FROM chain WHERE node > 0
        )
        SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_chains,
               CAST(SUM(node) AS BIGINT) AS sum_nodes
        FROM chain GROUP BY depth ORDER BY depth
    """,
    doc="Recursive CTE #2: hierarchy walk (node → node div 10 until the "
    "root), the org-chart / BOM traversal shape; pure integer recursion "
    "so every engine agrees exactly. Spark plans this as an iterative "
    "UnionLoop — linear recursion, one scan per level.",
    tags=("recursive", "hierarchy"),
)
def recursive_key_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        WITH RECURSIVE chain AS (
          SELECT c_custkey AS start, CAST(c_custkey AS BIGINT) AS node,
                 0 AS depth
          FROM customer WHERE c_custkey % 11 = 0
          UNION ALL
          SELECT start, node DIV 10 AS node, depth + 1 AS depth
          FROM chain WHERE node > 0
        )
        SELECT depth, COUNT(*) AS n_chains, SUM(node) AS sum_nodes
        FROM chain GROUP BY depth ORDER BY depth
        """
    )


@register(
    "window_first_last_nth",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               first_value(l_extendedprice) OVER w AS first_price,
               last_value(l_extendedprice) OVER w AS last_price,
               nth_value(l_extendedprice, 3) OVER w AS third_price,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_in_flag
        FROM lineitem
        WHERE l_orderkey < 100
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_orderkey, l_linenumber
    """,
    doc="first_value/last_value/nth_value with an explicit full-partition "
    "ROWS frame (the default frame would make last_value ≡ current row) — "
    "single window Exchange; picked values are bit-identical doubles.",
    tags=("window", "frames"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               first_value(l_extendedprice) OVER w AS first_price,
               last_value(l_extendedprice) OVER w AS last_price,
               nth_value(l_extendedprice, 3) OVER w AS third_price,
               COUNT(*) OVER w AS n_in_flag
        FROM lineitem
        WHERE l_orderkey < 100
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_orderkey, l_linenumber
        """
    )


@register(
    "fn_date_trunc_ops",
    oracle="""
        SELECT o_orderkey,
               strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d')
                 AS month_start,
               strftime(CAST(date_trunc('quarter', o_orderdate) AS DATE), '%Y-%m-%d')
                 AS quarter_start,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                 AS month_end,
               strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE),
                        '%Y-%m-%d') AS plus2m,
               CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                    AS BIGINT) AS days_since_92
        FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
    doc="Date-part surface: date_trunc month/quarter, last_day, month "
    "interval arithmetic, day diffs — calendar-exact in both engines; "
    "emitted as strings (DATE doesn't round-trip pandas identically).",
    tags=("functions", "date"),
)
def fn_date_trunc_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey,
               date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd')
                 AS month_start,
               date_format(date_trunc('quarter', o_orderdate), 'yyyy-MM-dd')
                 AS quarter_start,
               date_format(last_day(CAST(o_orderdate AS DATE)), 'yyyy-MM-dd')
                 AS month_end,
               date_format(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH,
                           'yyyy-MM-dd') AS plus2m,
               CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')
                    AS BIGINT) AS days_since_92
        FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
        """
    )


@register(
    "fn_map_ops",
    oracle="""
        WITH pairs AS (
          SELECT o_orderpriority AS prio, o_orderstatus AS status,
                 COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2
        )
        SELECT prio, status, CAST(cnt * 2 AS BIGINT) AS doubled
        FROM pairs WHERE cnt > 5 ORDER BY prio, status
    """,
    doc="Map higher-order functions: build a status→count map per priority "
    "(map_from_entries over a sorted collect_list), map_filter(cnt>5), "
    "transform_values(*2), explode back to rows. The oracle computes the "
    "same relation directly — the parity check is that Spark's map HOF "
    "round-trip is lossless.",
    tags=("functions", "map", "higher-order"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    grouped = (
        t["orders"]
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col("o_orderstatus"), F.col("cnt")))
                )
            ).alias("m")
        )
    )
    transformed = grouped.select(
        "prio",
        F.transform_values(
            F.map_filter(F.col("m"), lambda _, v: v > 5), lambda _, v: v * 2
        ).alias("m2"),
    )
    return (
        transformed.select("prio", F.explode(F.col("m2")).alias("status", "doubled"))
        .orderBy("prio", "status")
    )


@register(
    "events_resample_ohlc",
    oracle="""
        WITH b AS (
          SELECT event_type,
                 epoch_ns(ts) // 300000000000 AS bucket_idx,
                 value,
                 lpad(CAST(epoch_ns(ts) AS VARCHAR), 20, '0')
                   || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
          FROM events
        )
        SELECT event_type, CAST(bucket_idx AS BIGINT) AS bucket_idx,
               arg_min(value, ord) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, ord) AS close,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM b
        GROUP BY event_type, bucket_idx
        HAVING COUNT(*) >= 3
        ORDER BY event_type, bucket_idx
    """,
    doc="Time-series resampling to 5-minute OHLC bars per event type — "
    "open/close via min_by/max_by on a zero-padded (ts, event_id) string "
    "key (total order, so ties are impossible and both engines pick the "
    "same row). One hash aggregate; high/low/open/close are selected "
    "doubles, not sums — bit-stable.",
    tags=("events", "timeseries", "resample"),
)
def events_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    b = ev.select(
        "event_type",
        F.expr("ts DIV 300000000000").alias("bucket_idx"),
        "value",
        F.concat(
            F.lpad(F.col("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord"),
    )
    return (
        b.groupBy("event_type", "bucket_idx")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 3)
        .orderBy("event_type", "bucket_idx")
    )


@register(
    "events_hopping_windows",
    oracle="""
        WITH hop AS (
          SELECT event_type,
                 epoch_ns(ts) // 10800000000000 - j AS w,
                 value
          FROM events CROSS JOIN
               (SELECT unnest(generate_series(0, 1)) AS j) js
        )
        SELECT event_type, CAST(w AS BIGINT) AS window_idx,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
                 AS sum_value_q
        FROM hop
        GROUP BY event_type, w
        HAVING COUNT(*) >= 5
        ORDER BY event_type, window_idx
    """,
    doc="Hopping (sliding) windows in batch: 6-hour windows advancing "
    "every 3 hours (bucket constant 10800000000000 ns = 3 h hop, window = "
    "2 hops) = each event replicated into exactly 2 hop buckets (explode "
    "over the hop offsets, integer bucket arithmetic) — the batch twin of "
    "streaming window(ts, '6 hours', '3 hours'); one Expand + hash "
    "aggregate, value sums quantized for exactness.",
    tags=("events", "window", "streaming-twin"),
)
def events_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    hop = ev.select(
        "event_type",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("j"),
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vq"),
        F.expr("ts DIV 10800000000000").alias("b"),
    ).select(
        "event_type", (F.col("b") - F.col("j")).alias("window_idx"), "vq"
    )
    return (
        hop.groupBy("event_type", "window_idx")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("vq").alias("sum_value_q"))
        .filter(F.col("n") >= 5)
        .orderBy("event_type", "window_idx")
    )


@register(
    "fn_string_ops2",
    oracle="""
        SELECT p_partkey,
               upper(p_brand) AS u,
               reverse(p_type) AS rev,
               lpad(p_brand, 12, '.') AS padded,
               repeat(substr(p_name, 1, 3), 2) AS rep,
               replace(p_type, ' ', '_') AS t2,
               levenshtein(p_brand, 'Brand#00') AS lev,
               CAST(strpos(p_type, 'a') AS INTEGER) AS apos,
               left(p_name, 5) AS l5,
               right(p_name, 4) AS r4
        FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
    doc="String-function surface #2: case, reverse, pad, repeat, replace, "
    "levenshtein, position, left/right — all deterministic byte-level ops.",
    tags=("functions", "string"),
)
def fn_string_ops2(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey,
               upper(p_brand) AS u,
               reverse(p_type) AS rev,
               lpad(p_brand, 12, '.') AS padded,
               repeat(substr(p_name, 1, 3), 2) AS rep,
               replace(p_type, ' ', '_') AS t2,
               levenshtein(p_brand, 'Brand#00') AS lev,
               CAST(instr(p_type, 'a') AS INT) AS apos,
               left(p_name, 5) AS l5,
               right(p_name, 4) AS r4
        FROM part WHERE p_partkey < 300 ORDER BY p_partkey
        """
    )
