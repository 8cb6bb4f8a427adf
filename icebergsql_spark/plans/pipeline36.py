"""Round-12 gate wave #6 (pipeline36): streaming twins for the three
new randomness/paired tests (turning points, Bartels rank von Neumann,
Wilcoxon signed-rank) over the shared daily-count-partial fixture.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icebergsql_spark.plans.registry import register


def _tp_oracle() -> str:
    from icebergsql_spark.plans.pipeline35 import _TP_SQL

    return _TP_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_turning_points",
    oracle=_tp_oracle(),
    doc="STREAMING twin of events_turning_points: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL strict-peak/trough tail SQL (shared _TP_TAIL_SQL "
    "template). The live randomness triage converging to the batch "
    "answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_turning_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline35 import (
        _DAILY_STREAM_HEAD,
        _TP_TAIL_SQL,
    )

    _daily_partial_stream(spark, sf_dir, "tp")
    return spark.sql(
        (_DAILY_STREAM_HEAD + _TP_TAIL_SQL).format(view="tp_daily")
    )


def _br_oracle() -> str:
    from icebergsql_spark.plans.pipeline35 import _BR_SQL

    return _BR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_bartels",
    oracle=_br_oracle(),
    doc="STREAMING twin of events_bartels_rank: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL doubled-rank von Neumann tail SQL (shared "
    "_BR_TAIL_SQL template). The live serial-dependence monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_bartels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline35 import (
        _BR_TAIL_SQL,
        _DAILY_STREAM_HEAD,
    )

    _daily_partial_stream(spark, sf_dir, "br")
    return spark.sql(
        (_DAILY_STREAM_HEAD + _BR_TAIL_SQL).format(view="br_daily")
    )


def _wsr_oracle() -> str:
    from icebergsql_spark.plans.pipeline35 import _WSR_SQL

    return _WSR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_wilcoxon",
    oracle=_wsr_oracle(),
    doc="STREAMING twin of events_wilcoxon_signed_rank: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches pivot into the same paired purchase-minus-error "
    "`diffs` contract; the finalizer runs the IDENTICAL doubled-rank "
    "signed-rank tail SQL (shared _WSR_TAIL_SQL template). The live "
    "paired-shift monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_wilcoxon(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline35 import _WSR_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "wsr")
    return spark.sql(
        """
        WITH pe AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM wsr_daily
          WHERE event_type IN ('purchase', 'error')
        ),
        days AS (SELECT DISTINCT day FROM pe),
        diffs AS (
          SELECT d.day,
                 CAST(COALESCE(SUM(CASE WHEN p.event_type = 'purchase'
                                   THEN p.x END), 0) AS BIGINT)
                   - CAST(COALESCE(SUM(CASE WHEN p.event_type = 'error'
                                     THEN p.x END), 0) AS BIGINT)
                   AS d
          FROM days d LEFT JOIN pe p ON p.day = d.day
          GROUP BY d.day
        ),"""
        + _WSR_TAIL_SQL
    )
