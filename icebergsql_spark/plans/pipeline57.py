"""Round-14 gate wave #7 (pipeline57): bucketed co-located join (the
shuffle-free-join scale pattern), leakage-safe temporal split with
embargo, weighted median, and ACF season-length detection (+ stream
twin).

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

# ---------------------------------------- bucketed co-located join --

# The 100-TB join pattern the repo's scale story rests on, made into a
# correctness gate: both sides written as BUCKETED tables (8 buckets
# on the join key, sorted within buckets), so the SortMergeJoin reads
# co-located buckets and the executed plan contains NO Exchange — the
# shuffle that dominates a petabyte join is gone by LAYOUT, not by
# runtime luck. Asserted in-gate on the join subtree (the bloom-gate
# plan-assert discipline), so the driver re-checks the plan shape
# every round at every SF.
_BKT_BUCKETS = 8


@register(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderpriority AS pri,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 AS qty_total
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey % 3 = 0
        GROUP BY 1 ORDER BY 1
    """,
    doc="Shuffle-free co-located join via BUCKETED table layout: both "
    "sides saved with bucketBy(8, key) + sortBy, so the "
    "SortMergeJoin consumes matching buckets directly and the "
    "executed join plan contains NO Exchange — the layout-level "
    "answer to the shuffle that dominates petabyte joins "
    "(complementing join_skew_salted's runtime answer and "
    "join_bloom_prefilter's broadcast answer). The no-Exchange "
    "plan shape is ASSERTED in-gate, so the driver re-verifies the "
    "physical plan at every SF every round; the aggregate result "
    "is oracled against a plain join. Scale shape: bucketed "
    "write is one shuffle EACH, amortized across every subsequent "
    "co-located join — the classic warehouse trade.",
    tags=("join", "managed"),
)
def join_bucketed_colocated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = (
        load_tables(spark, sf_dir, ("orders",))["orders"]
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
        F.col("l_orderkey").alias("k"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    spark.sql("DROP TABLE IF EXISTS bkt_orders_g")
    spark.sql("DROP TABLE IF EXISTS bkt_li_g")
    # a failed earlier run can leave an ORPHAN warehouse dir that DROP
    # (no catalog entry) does not remove — LOCATION_ALREADY_EXISTS on
    # the next create (the r7 Engine-husk lesson); clear it explicitly
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("bkt_orders_g", "bkt_li_g"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        orders.write.format("parquet")
        .bucketBy(_BKT_BUCKETS, "k")
        .sortBy("k")
        .mode("overwrite")
        .saveAsTable("bkt_orders_g")
    )
    (
        li.write.format("parquet")
        .bucketBy(_BKT_BUCKETS, "k")
        .sortBy("k")
        .mode("overwrite")
        .saveAsTable("bkt_li_g")
    )
    # MERGE hint pins SortMergeJoin (tiny SFs would broadcast and the
    # no-Exchange claim would be vacuous); bucketing then removes the
    # Exchange that an unbucketed SMJ would need on BOTH sides.
    j = (
        spark.table("bkt_orders_g")
        .hint("MERGE")
        .join(spark.table("bkt_li_g"), "k")
    )
    out = (
        j.groupBy("pri")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("qty").cast("bigint").alias("qty_total"),
        )
        .orderBy("pri")
    )
    jplan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in jplan, "bucketed join not merge-joined"
    assert "Exchange" not in jplan, (
        "bucketed co-located join SHUFFLED — bucket layout not honored"
    )
    return out


# ------------------------------------ temporal split with embargo --

# Leakage-safe train/test protocol for time-ordered data: train on
# the first 18 days, EMBARGO the next 3 (events there are assigned to
# neither split — the purge gap that kills boundary leakage through
# lagged/windowed features), test on the rest. Day offsets are
# relative to min(day) (absolute literals silently select nothing —
# the r5 epoch-day lesson). Emits per-(split, type) counts plus the
# cross-split user-overlap audit — the leakage surface a reviewer
# reads before trusting offline eval numbers.
_EMB_SQL = """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d FROM ev),
        tagged AS (
          SELECT user_id, event_type,
                 CASE WHEN day < d0.d + 18 THEN 'train'
                      WHEN day < d0.d + 21 THEN 'embargo'
                      ELSE 'test' END AS split
          FROM ev CROSS JOIN d0
        ),
        counts AS (
          SELECT split, event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM tagged GROUP BY 1, 2
        ),
        overlap AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS both_users
          FROM (SELECT DISTINCT user_id FROM tagged
                WHERE split = 'train') tr
          JOIN (SELECT DISTINCT user_id FROM tagged
                WHERE split = 'test') te
            ON te.user_id = tr.user_id
        )
        SELECT c.split, c.event_type, c.n, c.n_users,
               o.both_users AS train_test_user_overlap
        FROM counts c CROSS JOIN overlap o
        ORDER BY c.split, c.event_type
"""


@register(
    "curation_time_split_embargo",
    oracle=_EMB_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Leakage-safe temporal train/test split with a 3-day EMBARGO "
    "purge gap (days 0-17 train, 18-20 embargo, 21+ test, offsets "
    "from min(day)): the protocol complement of "
    "events_pit_feature_join — PIT kills feature-time leakage "
    "inside a split, the embargo kills boundary leakage BETWEEN "
    "splits through lagged/windowed features. Emits per-(split, "
    "type) event and user counts plus the train/test user-overlap "
    "audit (the entity-leakage surface an offline-eval reviewer "
    "must see). All exact integers. Scale shape: one narrow pass + "
    "a distinct-user join.",
    tags=("curation", "events"),
)
def curation_time_split_embargo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_emb")
    return spark.sql(
        _EMB_SQL.format(day_expr="ts DIV 86400000000000", src="ev_emb")
    )


# ------------------------------------------------ weighted median --

# Weighted median of line price weighted by quantity per return flag:
# group by value first (tied values merge weights), then the doubled
# threshold picks med_lo = min v with 2*cum >= W and med_hi = min v
# with 2*cum > W — both exact integer cents, the midpoint one
# mirrored double. The percentile family (quantile/percentile_cont)
# is unweighted; this is the weighted one a spend-percentile report
# needs.
_WMED_SQL = """
        WITH vals AS (
          SELECT l_returnflag AS flag,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2
        ),
        cum AS (
          SELECT flag, v, w,
                 CAST(SUM(w) OVER (PARTITION BY flag ORDER BY v)
                   AS BIGINT) AS cw,
                 CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
          FROM vals
        ),
        med AS (
          SELECT flag,
                 CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END)
                   AS BIGINT) AS med_lo,
                 CAST(MIN(CASE WHEN 2 * cw > tw THEN v END)
                   AS BIGINT) AS med_hi,
                 CAST(MAX(tw) AS BIGINT) AS w_total
          FROM cum GROUP BY flag
        )
        SELECT flag, w_total, med_lo, med_hi,
               (CAST(med_lo AS DOUBLE) + CAST(med_hi AS DOUBLE))
                 / 2.0 / 100.0 AS weighted_median
        FROM med
        ORDER BY flag
"""


@register(
    "agg_weighted_median",
    oracle=_WMED_SQL,
    doc="Weighted median (quantity-weighted line price per return "
    "flag) via the doubled-threshold discipline: med_lo = min value "
    "with 2*cumweight >= total, med_hi = min with strict > — both "
    "exact integer cents (ties merge by grouping on value first), "
    "the midpoint one mirrored double. The weighted complement of "
    "the unweighted percentile battery: 'the price at which half "
    "the QUANTITY sits below' is a different number from the "
    "median line price whenever weights correlate with values. "
    "Scale shape: one (flag, value) aggregate + a per-flag "
    "cumulative window.",
    tags=("agg",),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_WMED_SQL)


# -------------------------------------------- ACF season length --

# Dominant season length per type: the lag k in [2, 10] maximizing
# the exact n-scaled autocovariance ck (argmax over exact bigints —
# c0 > 0 normalization cannot change an argmax; smallest-lag
# tie-break), extending the PACF gam frame to lag 10. The
# season-length DETECTOR complementing events_weekly_spectrum (which
# scores FIXED calendar bins) — this one finds the period, whatever
# it is.
_SEASON_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_SEASON_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY day) AS BIGINT) AS rk
          FROM daily
        ),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s
          FROM idx GROUP BY event_type
        ),
        dev AS (
          SELECT i.event_type, i.rk, g.n * i.x - g.s AS d
          FROM idx i JOIN g ON g.event_type = i.event_type
        ),
        gam AS (
          SELECT a.event_type, k.k,
                 CAST(SUM(a.d * b.d) AS BIGINT) AS ck
          FROM dev a
          CROSS JOIN (SELECT r AS k FROM (VALUES
            (0),(2),(3),(4),(5),(6),(7),(8),(9),(10)) AS t(r)) k
          JOIN dev b ON b.event_type = a.event_type
                    AND b.rk = a.rk + k.k
          GROUP BY 1, 2
        ),
        c0 AS (
          SELECT event_type, ck AS c0 FROM gam WHERE k = 0
        ),
        best AS (
          SELECT event_type, k, ck FROM (
            SELECT event_type, k, ck,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY ck DESC, k) AS rn
            FROM gam WHERE k >= 2
          ) z WHERE rn = 1
        )
        SELECT b.event_type, b.k AS season_len,
               b.ck AS ck_best, c0.c0,
               CASE WHEN c0.c0 > 0
                    THEN CAST(b.ck AS DOUBLE) / CAST(c0.c0 AS DOUBLE)
               END AS acf_best
        FROM best b JOIN c0 ON c0.event_type = b.event_type
        ORDER BY b.event_type
"""
_SEASON_SQL = _SEASON_HEAD_SQL + _SEASON_TAIL_SQL


@register(
    "events_season_length",
    oracle=_SEASON_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Dominant season length per type = argmax over lags 2..10 of "
    "the exact n-scaled autocovariance (argmax over exact bigints; "
    "c0-normalization cannot change it; smallest-lag tie-break) — "
    "the period DETECTOR complementing events_weekly_spectrum's "
    "fixed calendar bins and events_seasonal_strength's "
    "assumed-period score: this one finds the period first, the "
    "others then quantify it. ck anchors exact; acf_best one "
    "mirrored division. Scale shape: one (type, day) count; the "
    "lag join is 10 x 30 rows per type, calendar-bounded.",
    tags=("events", "forecast", "stats"),
)
def events_season_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_season")
    return spark.sql(
        _SEASON_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_season"
        )
    )


@register(
    "events_stream_season_length",
    oracle=_SEASON_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_season_length: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL all-integer argmax tail SQL (shared "
    "_SEASON_TAIL_SQL). The live period detector converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "forecast"),
)
def events_stream_season_length(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ssea")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ssea_daily
        ),"""
        + _SEASON_TAIL_SQL
    )
