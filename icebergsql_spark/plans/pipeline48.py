"""Round-13 gate wave #10 (pipeline48): the MAD streaming twin and
user-concentration Lorenz deciles.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ------------------------------------------------ MAD streaming twin --


def _mad_oracle() -> str:
    from icebergsql_spark.plans.pipeline47 import _MAD_SQL

    return _MAD_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    )


@register(
    "events_stream_mad",
    oracle=_mad_oracle(),
    doc="STREAMING twin of events_mad_outliers: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL all-integer doubled-median tail SQL (shared "
    "_MAD_TAIL_SQL template). The live robust-outlier monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline47 import _MAD_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "mad")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM mad_daily
        ),"""
        + _MAD_TAIL_SQL.format(div="DIV")
    )


# ---------------------------------------------- Lorenz deciles --

# Lorenz curve of per-user event concentration at decile grid points:
# with users ranked by activity ascending, the decile cut is
# (rk-1)*10 DIV n (the ntile-free decile rule) and both cumulative
# shares are n-scaled exact bigints — the curve behind the Gini gate,
# the WHICH-decile-holds-the-mass view a curation quota needs.
_LORENZ_SQL = """
        WITH per_user AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM {src} GROUP BY user_id
        ),
        rk AS (
          SELECT c,
                 ROW_NUMBER() OVER (ORDER BY c, user_id) AS r,
                 COUNT(*) OVER () AS n,
                 CAST(SUM(c) OVER () AS BIGINT) AS tot
          FROM per_user
        ),
        cut AS (
          SELECT (r - 1) * 10 {div} n AS decile, c, n, tot FROM rk
        )
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(c) AS BIGINT) AS events_in_decile,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(tot) AS BIGINT) AS total_events,
               CAST(SUM(SUM(c)) OVER (ORDER BY decile) AS BIGINT)
                 AS cum_events,
               CAST(SUM(SUM(c)) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(MAX(tot) AS DOUBLE) AS cum_share
        FROM cut
        GROUP BY decile
        ORDER BY decile
"""


@register(
    "events_lorenz_deciles",
    oracle=_LORENZ_SQL.format(src="events", div="//"),
    doc="Lorenz concentration curve of per-user event volume at decile "
    "grid points (users ranked by activity ascending): the curve "
    "behind the Gini gate — cum_share at decile 9 answers 'what "
    "fraction of traffic do the top 10% of users generate', the "
    "number a bot-filter or curation quota actually thresholds. "
    "Deciles via (rk-1)*10 DIV n (never ntile — remainder placement "
    "is an engine detail); counts and cumulative sums are n-scaled "
    "exact bigints; cum_share the one mirrored double. Uses the "
    "aggregate-of-aggregate window (SUM(SUM(c)) OVER), identical in "
    "both engines over post-GROUP rows. Scale shape: one per-user "
    "count, rank window, 10-row rollup.",
    tags=("events", "curation", "stats"),
)
def events_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("events",))[
        "events"
    ].createOrReplaceTempView("ev_lorenz")
    return spark.sql(_LORENZ_SQL.format(src="ev_lorenz", div="DIV"))
