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
    "IDENTICAL all-integer FIR + standard CUSUM recurrence via the "
    "batch gate's aggregate() fold (a Spark recursive CTE over the "
    "same tail measured 12.9 s in BENCH_r14 — the fold is the fast "
    "spelling; the shared-recurrence proof is the batch/stream "
    "hash equality against the SAME recursive-CTE oracle). The "
    "live drift alarm converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cusum_fir(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "cfir")
    daily = spark.table("cfir_daily").select(
        "event_type", "day", F.col("x").cast("bigint").alias("c")
    )
    g = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("tot"),
    )
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('sf', 2 * (tot DIV 8), 'fa', CAST(-1 AS BIGINT),
                       'fm', 2 * (tot DIV 8),
                       'ss', CAST(0 AS BIGINT),
                       'sa', CAST(-1 AS BIGINT),
                       'sm', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'sf', greatest(CAST(0 AS BIGINT),
                    acc.sf + (x.c * n - tot) - (tot DIV 8)),
            'fa', CASE WHEN acc.fa <> -1 THEN acc.fa
                       WHEN greatest(CAST(0 AS BIGINT),
                         acc.sf + (x.c * n - tot) - (tot DIV 8))
                         > 4 * (tot DIV 8)
                       THEN x.day ELSE CAST(-1 AS BIGINT) END,
            'fm', greatest(acc.fm, greatest(CAST(0 AS BIGINT),
                    acc.sf + (x.c * n - tot) - (tot DIV 8))),
            'ss', greatest(CAST(0 AS BIGINT),
                    acc.ss + (x.c * n - tot) - (tot DIV 8)),
            'sa', CASE WHEN acc.sa <> -1 THEN acc.sa
                       WHEN greatest(CAST(0 AS BIGINT),
                         acc.ss + (x.c * n - tot) - (tot DIV 8))
                         > 4 * (tot DIV 8)
                       THEN x.day ELSE CAST(-1 AS BIGINT) END,
            'sm', greatest(acc.sm, greatest(CAST(0 AS BIGINT),
                    acc.ss + (x.c * n - tot) - (tot DIV 8)))))
        """
    )
    return (
        g.select(
            "event_type", F.col("n").alias("n_days"),
            F.expr("CAST(tot DIV 8 AS BIGINT)").alias("k_slack"),
            F.expr("CAST(4 * (tot DIV 8) AS BIGINT)").alias("h_thresh"),
            fold.alias("z"),
        )
        .select(
            "event_type", "n_days", "k_slack", "h_thresh",
            F.col("z.sf").alias("fir_final"),
            F.col("z.fm").alias("fir_max"),
            F.col("z.fa").alias("fir_alarm_day"),
            F.col("z.ss").alias("std_final"),
            F.col("z.sm").alias("std_max"),
            F.col("z.sa").alias("std_alarm_day"),
        )
        .orderBy("event_type")
    )
