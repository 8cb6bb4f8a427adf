"""Round-14 gate wave #4 (pipeline54): streaming twins for the wave-1
and wave-3 statistics — Kendall tau-b, Hellinger, Cohen's kappa,
partial correlation, Nelson-Aalen and FIR CUSUM — all via head/tail
SQL template splits reusing the batch tail VERBATIM over the ONE
parameterized partial-stream fixture (pipeline30._partial_stream).

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------- Kendall tau-b twin --


def _tau_oracle() -> str:
    from icebergsql_spark.plans.pipeline53 import _TAU_SQL

    return _TAU_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_kendall_tau",
    oracle=_tau_oracle(),
    doc="STREAMING twin of events_kendall_tau: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL pair-counting tail SQL (shared _TAU_TAIL_SQL "
    "template). The live co-movement monitor converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_kendall_tau(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline53 import _TAU_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "ktau")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ktau_daily
        ),"""
        + _TAU_TAIL_SQL
    )


# --------------------------------------------- Hellinger twin --


def _hell_oracle() -> str:
    from icebergsql_spark.plans.pipeline53 import _HELL_SQL

    return _HELL_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    )


@register(
    "events_stream_hellinger",
    oracle=_hell_oracle(),
    doc="STREAMING twin of events_hellinger_hod: per-(type, hour) "
    "count partials (SUM-mergeable, the shared hourly fixture) fold "
    "to hour-of-day bins in the finalizer, which runs the IDENTICAL "
    "Bhattacharyya tail SQL (shared _HELL_TAIL_SQL template). The "
    "live distribution-distance monitor converging to the batch "
    "answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_hellinger(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline40 import _hourly_partial_stream
    from icebergsql_spark.plans.pipeline53 import _HELL_TAIL_SQL

    _hourly_partial_stream(spark, sf_dir, "shel")
    return spark.sql(
        """
        WITH hist AS (
          SELECT event_type, hour % 24 AS hod,
                 CAST(SUM(c) AS BIGINT) AS c
          FROM shel_hourly GROUP BY 1, 2
        ),"""
        + _HELL_TAIL_SQL
    )


# ------------------------------------------ Cohen's kappa twin --


def _kappa_oracle() -> str:
    from icebergsql_spark.plans.pipeline53 import _KAPPA_SQL

    return _KAPPA_SQL.format(
        props_k="json_extract_string(props, '$.k')",
        hour_expr="epoch_ns(ts) // 3600000000000",
        src="events",
    )


@register(
    "events_stream_cohen_kappa",
    oracle=_kappa_oracle(),
    doc="STREAMING twin of events_cohen_kappa: per-(type, ra, rb) "
    "rater-cell count partials (SUM-mergeable — a NEW projection of "
    "the ONE parameterized partial fixture) from 3 chronological "
    "micro-batches merge into the `cells` contract; the finalizer "
    "runs the IDENTICAL exact-fraction tail SQL (shared "
    "_KAPPA_TAIL_SQL template). The live agreement monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cohen_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _partial_stream
    from icebergsql_spark.plans.pipeline53 import _KAPPA_TAIL_SQL

    _partial_stream(
        spark,
        sf_dir,
        "skap",
        cols=[
            F.col("event_type"),
            F.coalesce(
                F.get_json_object("props", "$.k").cast("bigint") % 2,
                F.lit(-1).cast("bigint"),
            ).alias("ra"),
            F.expr(
                "CASE WHEN ((ts DIV 3600000000000) % 24) < 12"
                " THEN 0 ELSE 1 END"
            ).alias("rb"),
        ],
        keys=["event_type", "ra", "rb"],
        out_alias="c",
        suffix="cells",
    )
    return spark.sql(
        """
        WITH cells AS (
          SELECT event_type, ra, rb, CAST(c AS BIGINT) AS c
          FROM skap_cells
        ),"""
        + _KAPPA_TAIL_SQL
    )


# ------------------------------------- partial correlation twin --


def _pc_oracle() -> str:
    from icebergsql_spark.plans.pipeline53 import _pc_sql

    return _pc_sql("epoch_ns(ts) // 86400000000000", "events")


@register(
    "events_stream_partial_corr",
    oracle=_pc_oracle(),
    doc="STREAMING twin of events_partial_corr: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL triple-join tail SQL (shared _PC_TAIL_SQL template). "
    "The live common-driver monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_partial_corr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline53 import _PC_R, _PC_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "spc")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM spc_daily
        ),"""
        + _PC_TAIL_SQL.format(
            rab=_PC_R.format(
                n="n", sab="sab", sa="sa", sb="sb", saa="saa",
                sbb="sbb",
            ),
            rac=_PC_R.format(
                n="n", sab="sac", sa="sa", sb="sc", saa="saa",
                sbb="scc",
            ),
            rbc=_PC_R.format(
                n="n", sab="sbc", sa="sb", sb="sc", saa="sbb",
                sbb="scc",
            ),
        )
    )


# ---------------------------------------- Nelson-Aalen twin --


def _na_oracle() -> str:
    from icebergsql_spark.plans.pipeline53 import _NA_SQL

    return _NA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_nelson_aalen",
    oracle=_na_oracle(),
    doc="STREAMING twin of events_nelson_aalen: distinct (user, day) "
    "purchase sightings (SET-mergeable markers — the stream_logrank "
    "pattern, now a distinct_markers mode of the ONE parameterized "
    "partial fixture) from 3 chronological micro-batches merge into "
    "the `pd` contract; the finalizer runs the IDENTICAL "
    "cumulative-hazard tail SQL (shared _NA_TAIL_SQL template). The "
    "live hazard monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_nelson_aalen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _partial_stream
    from icebergsql_spark.plans.pipeline53 import _NA_TAIL_SQL

    _partial_stream(
        spark,
        sf_dir,
        "sna",
        cols=[
            F.col("user_id"),
            F.expr("ts DIV 86400000000000").alias("day"),
        ],
        keys=["user_id", "day"],
        out_alias="",
        suffix="sightings",
        pre_filter=F.col("event_type") == "purchase",
        distinct_markers=True,
    )
    return spark.sql(
        """
        WITH pd AS (
          SELECT DISTINCT user_id, day FROM sna_sightings
        ),"""
        + _NA_TAIL_SQL
    )


# ------------------------------------------- FIR CUSUM twin --


def _cfir_oracle() -> str:
    from icebergsql_spark.plans.pipeline51 import _CUSUM_FIR_SQL

    return _CUSUM_FIR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    )


@register(
    "events_stream_cusum_fir",
    oracle=_cfir_oracle(),
    doc="STREAMING twin of events_cusum_fir: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer replays the "
    "IDENTICAL all-integer FIR + standard CUSUM recursion (shared "
    "_CUSUM_FIR_TAIL_SQL template, Spark recursive CTE). The live "
    "drift alarm converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cusum_fir(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline51 import _CUSUM_FIR_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "cfir")
    return spark.sql(
        """
        WITH RECURSIVE daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS c
          FROM cfir_daily
        ),"""
        + _CUSUM_FIR_TAIL_SQL.format(div="DIV")
    )
