"""Round-13 gate wave #9 (pipeline47): hour-of-day KS streaming twin,
3-walk centrality, MAD outlier days.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------- HOD-KS streaming twin --


def _hodks_oracle() -> str:
    from icebergsql_spark.plans.pipeline46 import _HOD_KS_SQL

    return _HOD_KS_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    )


@register(
    "events_stream_hod_uniformity",
    oracle=_hodks_oracle(),
    doc="STREAMING twin of events_hod_uniformity_ks: per-(type, hour) "
    "count partials (SUM-mergeable, the shared _hourly_partial_stream "
    "fixture) from 3 chronological micro-batches merge into the "
    "`hist` contract (hour-of-day folded AFTER the merge); the "
    "finalizer runs the IDENTICAL n-scaled KS tail SQL (shared "
    "_HOD_KS_TAIL_SQL template). The live daypart-uniformity monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_hod_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline40 import _hourly_partial_stream
    from icebergsql_spark.plans.pipeline46 import _HOD_KS_TAIL_SQL

    _hourly_partial_stream(spark, sf_dir, "hks")
    return spark.sql(
        """
        WITH hist AS (
          SELECT event_type, hour % 24 AS hod,
                 CAST(SUM(c) AS BIGINT) AS c
          FROM hks_hourly GROUP BY 1, 2
        ),"""
        + _HOD_KS_TAIL_SQL
    )


# ------------------------------------------------ 3-walk centrality --

_WALK_COOC = 74
_WALK_MAXDOC = 120

# Walk-count centrality: x_k = A^k * 1 counts length-k walks from each
# node — the all-integer power-iteration on the (non-negative)
# adjacency, so unlike the covariance case NOTHING floats: three
# adjacency joins, every count an exact bigint.  x3's ranking
# converges to eigenvector centrality as k grows.
_WALK_TAIL_SQL = """
        adj AS {mat}(
          SELECT a AS u, b AS v FROM wc_edges
          UNION ALL SELECT b, a FROM wc_edges
        ),
        x1 AS {mat}(
          SELECT u, CAST(COUNT(*) AS BIGINT) AS w FROM adj GROUP BY u
        ),
        x2 AS {mat}(
          SELECT a.u, CAST(SUM(x1.w) AS BIGINT) AS w
          FROM adj a JOIN x1 ON x1.u = a.v GROUP BY a.u
        ),
        x3 AS (
          SELECT a.u, CAST(SUM(x2.w) AS BIGINT) AS w
          FROM adj a JOIN x2 ON x2.u = a.v GROUP BY a.u
        )
        SELECT x3.u AS node, x1.w AS walks1, x2.w AS walks2,
               x3.w AS walks3
        FROM x3
        JOIN x2 ON x2.u = x3.u
        JOIN x1 ON x1.u = x3.u
        ORDER BY x3.w DESC, x3.u
        LIMIT 20
"""

_WALK_EDGES_ORACLE = f"""
        w AS MATERIALIZED (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                   trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < {_WALK_MAXDOC}
        ),
        wc_edges AS MATERIALIZED (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= {_WALK_COOC}
        ),
"""


@register(
    "graph_walk_centrality",
    oracle="WITH "
    + _WALK_EDGES_ORACLE
    + _WALK_TAIL_SQL.format(mat="MATERIALIZED "),
    doc="Walk-count centrality over the token co-occurrence graph: "
    "x_k = A^k * 1 (walks of length 1/2/3 from each node) via three "
    "adjacency joins — the ALL-INTEGER power iteration (adjacency is "
    "non-negative, so unlike the covariance PC gate nothing floats; "
    "every count is an exact bigint) whose ranking converges to "
    "eigenvector centrality; walks2/walks3 already separate hubs "
    "from hub-adjacent nodes where plain degree (walks1) ties. "
    "Top-20 under a total order. Scale shape: each round is one "
    "adjacency equi-join + groupBy — the k-step frontier shape, "
    "never all-pairs; Spark side localCheckpoints the edge build.",
    tags=("graph", "stats"),
)
def graph_walk_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < _WALK_MAXDOC
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _WALK_COOC)
        .select("a", "b")
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("wc_edges")
    return spark.sql("WITH " + _WALK_TAIL_SQL.format(mat=""))


# ------------------------------------------------ MAD outlier days --

# Robust outlier days via the doubled-median discipline (CLAUDE.md
# lesson 5): med2 = the sum of the two middle order statistics (odd n
# doubles the middle), doubled deviations d2 = |2x - med2| =
# 2|x - med| exactly, mad4 = doubled median of d2 = 4*MAD — so the
# classic |x - med| > 3*MAD flag is the EXACT integer comparison
# 2*d2 > 3*mad4.  Nothing floats anywhere.
_MAD_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_MAD_TAIL_SQL = """
        rk AS (
          SELECT event_type, day, x,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY x, day) AS r,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM daily
        ),
        med AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN r = (n + 1) {div} 2 THEN x
                          ELSE 0 END)
                    + SUM(CASE WHEN r = n {div} 2 + 1 THEN x
                          ELSE 0 END) AS BIGINT) AS med2
          FROM rk GROUP BY event_type
        ),
        dev AS (
          SELECT d.event_type, d.day, d.x,
                 ABS(2 * d.x - m.med2) AS d2
          FROM daily d JOIN med m ON m.event_type = d.event_type
        ),
        drk AS (
          SELECT event_type, day, x, d2,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY d2, day) AS r,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM dev
        ),
        mad AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN r = (n + 1) {div} 2 THEN d2
                          ELSE 0 END)
                    + SUM(CASE WHEN r = n {div} 2 + 1 THEN d2
                          ELSE 0 END) AS BIGINT) AS mad4
          FROM drk GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.x, m.med2, a.mad4,
               CAST(d.d2 AS BIGINT) AS d2,
               CASE WHEN 2 * d.d2 > 3 * a.mad4 THEN 1 ELSE 0 END
                 AS outlier
        FROM dev d
        JOIN med m ON m.event_type = d.event_type
        JOIN mad a ON a.event_type = d.event_type
        ORDER BY d.event_type, d.day
"""
_MAD_SQL = _MAD_HEAD_SQL + _MAD_TAIL_SQL


@register(
    "events_mad_outliers",
    oracle=_MAD_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Robust outlier days per event type by the median/MAD rule "
    "(|x - median| > 3*MAD) — the robust sibling of the Tukey-fence "
    "and EWMA gates that a single wild day cannot poison (breakdown "
    "point 50% vs the mean/sd chart's 0). The doubled-median "
    "discipline makes the WHOLE statistic exact integers: med2 = "
    "sum of the two middle order stats, doubled deviations "
    "d2 = |2x - med2|, mad4 = doubled median of d2, flag = "
    "(2*d2 > 3*mad4) — no division, no floats, no quantization "
    "anywhere. Emits the full per-day table with flags. Scale "
    "shape: one (type, day) count + rank windows over 30-row "
    "partitions.",
    tags=("events", "stats"),
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_mad")
    return spark.sql(
        _MAD_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_mad", div="DIV"
        )
    )
