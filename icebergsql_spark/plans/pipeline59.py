"""Round-14 gate wave #9 (pipeline59): exact mode aggregate and
weekend lift (+ streaming twin).

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration. All-integer statistics
throughout — no floats beyond single mirrored divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ------------------------------------------------- exact mode --

# Mode with a deterministic smallest-value tie-break — the aggregate
# Spark's own `mode()` leaves tie-nondeterministic (and DuckDB's
# mode() picks its own winner): rank (count DESC, value ASC) and keep
# rank 1. Exact integers end to end.
_MODE_SQL = """
        WITH f AS (
          SELECT l_returnflag AS flag,
                 CAST(l_quantity AS BIGINT) AS v,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1, 2
        ),
        rk AS (
          SELECT flag, v, c,
                 ROW_NUMBER() OVER (PARTITION BY flag
                   ORDER BY c DESC, v) AS rn,
                 CAST(SUM(c) OVER (PARTITION BY flag) AS BIGINT) AS n
          FROM f
        )
        SELECT flag, v AS mode_value, c AS mode_count, n,
               CAST(1000000 * c {div} n AS BIGINT) AS mode_share_ppm
        FROM rk WHERE rn = 1
        ORDER BY flag
"""


@register(
    "agg_mode_exact",
    oracle=_MODE_SQL.format(div="//"),
    doc="Exact mode of line quantity per return flag with a "
    "DETERMINISTIC smallest-value tie-break — both engines' native "
    "mode() aggregates are tie-nondeterministic, so the portable "
    "spelling is rank (count DESC, value ASC) and keep rank 1. "
    "mode_share_ppm is an exact integer division (non-negative, so "
    "floor-div and truncating DIV agree). Scale shape: one "
    "(flag, value) count + a per-flag top-1 window.",
    tags=("agg",),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_MODE_SQL.format(div="DIV"))


# ---------------------------------------------- weekend lift --

# Weekend-vs-weekday volume lift per type: epoch day 0 (1970-01-01)
# was a THURSDAY, so day-of-week = (day + 3) % 7 maps Sat to 5 and
# Sun to 6 (the round-diff review caught the original (day + 4)
# spelling flagging Fri+Sat — mirrored both engines, oracle-green,
# exactly the mirrored-blindness class; verified against
# datetime.date arithmetic).
# lift = (weekend_sum * weekday_days) / (weekday_sum * weekend_days)
# — an exact rational whose four factors are emitted as bigint
# anchors; the float is one factor-wise mirrored expression.
_WKND_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_WKND_TAIL_SQL = """
        tagged AS (
          SELECT event_type, x,
                 CASE WHEN (day + 3) % 7 >= 5 THEN 1 ELSE 0 END AS we
          FROM daily
        ),
        g AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN we = 1 THEN x ELSE 0 END)
                   AS BIGINT) AS we_sum,
                 CAST(SUM(CASE WHEN we = 0 THEN x ELSE 0 END)
                   AS BIGINT) AS wd_sum,
                 CAST(SUM(we) AS BIGINT) AS we_days,
                 CAST(SUM(1 - we) AS BIGINT) AS wd_days
          FROM tagged GROUP BY event_type
        )
        SELECT event_type, we_sum, wd_sum, we_days, wd_days,
               CASE WHEN wd_sum > 0 AND we_days > 0
                    THEN CAST(we_sum AS DOUBLE)
                         / CAST(we_days AS DOUBLE)
                         / (CAST(wd_sum AS DOUBLE)
                            / CAST(wd_days AS DOUBLE))
               END AS weekend_lift
        FROM g
        ORDER BY event_type
"""
_WKND_SQL = _WKND_HEAD_SQL + _WKND_TAIL_SQL


@register(
    "events_weekend_lift",
    oracle=_WKND_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Weekend-vs-weekday volume lift per type (epoch day 0 was a "
    "Thursday, so dow = (day+3) % 7, Sat = 5 / Sun = 6): mean weekend "
    "daily volume over mean weekday daily volume — the one-number "
    "calendar-shape summary events_weekday_profile's 7 shares "
    "imply but don't state, and the seasonal gates assume. All "
    "four factors exact bigint anchors; the lift one factor-wise "
    "mirrored double. Scale shape: one (type, day) count.",
    tags=("events", "stats"),
)
def events_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_wknd")
    return spark.sql(
        _WKND_SQL.format(day_expr="ts DIV 86400000000000", src="ev_wknd")
    )


@register(
    "events_stream_weekend_lift",
    oracle=_WKND_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_weekend_lift: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL tail SQL (shared _WKND_TAIL_SQL). The live calendar-"
    "shape monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_weekend_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "swkl")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM swkl_daily
        ),"""
        + _WKND_TAIL_SQL
    )
