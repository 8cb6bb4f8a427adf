"""Round-13 gate wave #8 (pipeline46): the EWMA streaming twin,
hour-of-day uniformity KS, and token pair lift.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ---------------------------------------------- EWMA streaming twin --


def _ewma_oracle() -> str:
    from icebergsql_spark.plans.pipeline45 import _ewma_sql

    return _ewma_sql("duck")


@register(
    "events_stream_ewma",
    oracle=_ewma_oracle(),
    doc="STREAMING twin of events_ewma_control: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL dyadic-exact tail SQL (shared _EWMA_TAIL_SQL "
    "template). The live control chart converging to the batch "
    "answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline45 import _ewma_tail

    _daily_partial_stream(spark, sf_dir, "ewm")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ewm_daily
        ),"""
        + _ewma_tail("spark")
    )


# --------------------------------------- hour-of-day uniformity KS --

# One-sample KS against the uniform hour-of-day law: D = max_h
# |F_emp(h) - (h+1)/24| has the n-scaled exact form
# max |24*cum_h - n*(h+1)| — an exact bigint numerator over the
# constant denominator 24n; d24n is emitted exact, D as one mirrored
# double division.
_HOD_KS_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, ({hour_expr}) % 24 AS hod FROM {src}
        ),
        hist AS (
          SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `hist` CTE boundary; composed batch string character-identical).
_HOD_KS_TAIL_SQL = """
        dense AS (
          SELECT t.event_type, s.hod,
                 CAST(COALESCE(h.c, 0) AS BIGINT) AS c
          FROM (SELECT DISTINCT event_type FROM hist) t
          CROSS JOIN (SELECT r AS hod FROM (VALUES
            (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),
            (12),(13),(14),(15),(16),(17),(18),(19),(20),(21),
            (22),(23)) AS t(r)) s
          LEFT JOIN hist h ON h.event_type = t.event_type
                          AND h.hod = s.hod
        ),
        cum AS (
          SELECT event_type, hod,
                 CAST(SUM(c) OVER (PARTITION BY event_type
                   ORDER BY hod) AS BIGINT) AS cc,
                 CAST(SUM(c) OVER (PARTITION BY event_type)
                   AS BIGINT) AS n
          FROM dense
        )
        SELECT event_type, MAX(n) AS n,
               CAST(MAX(ABS(24 * cc - n * (hod + 1))) AS BIGINT)
                 AS d24n,
               CAST(MAX(ABS(24 * cc - n * (hod + 1))) AS DOUBLE)
                 / (24.0 * CAST(MAX(n) AS DOUBLE)) AS ks_d
        FROM cum
        GROUP BY event_type
        ORDER BY event_type
"""
_HOD_KS_SQL = _HOD_KS_HEAD_SQL + _HOD_KS_TAIL_SQL


@register(
    "events_hod_uniformity_ks",
    oracle=_HOD_KS_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    ),
    doc="One-sample Kolmogorov-Smirnov distance of each type's "
    "hour-of-day distribution from UNIFORM: D = max |F_emp - F_unif| "
    "in the n-scaled exact form max |24*cum - n*(h+1)| (exact bigint "
    "d24n emitted; D = d24n/(24n) one mirrored double) — the "
    "is-this-type-daypart-shaped test complementing the pairwise "
    "events_type_emd (bot/synthetic traffic is near-uniform, human "
    "traffic is not). Scale shape: one (type, hod) count, a 24-bin "
    "dense frame — volume enters only the first groupBy.",
    tags=("events", "stats"),
)
def events_hod_uniformity_ks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_hodks")
    return spark.sql(
        _HOD_KS_SQL.format(
            hour_expr="ts DIV 3600000000000", src="ev_hodks"
        )
    )


# ------------------------------------------------ token pair lift --

_LIFT_MIN_DF = 40  # df cap: both tokens must appear in >= 40 docs
_LIFT_MIN_BOTH = 20  # pair support floor

# Lift = P(a,b) / (P(a) P(b)) = n * c_ab / (c_a * c_b): an exact
# rational over document-frequency bigints — the association score a
# phrase-mining pass ranks by WITHOUT the ln that PMI would need
# (PMI = ln lift; the hill rule says emit the ratio).  ppm via one
# mirrored double expression; ranking by the float division per the
# bigint-overflow ORDER BY rule.
_LIFT_SQL = """
        WITH w AS (
          SELECT DISTINCT doc_id, t
          FROM (SELECT doc_id, {tok} AS t FROM documents) raw
        ),
        df_ AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY t
          HAVING COUNT(*) >= {min_df}
        ),
        n_ AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
               FROM documents),
        pairs AS (
          SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS both
          FROM w a
          JOIN w b ON b.doc_id = a.doc_id AND a.t < b.t
          JOIN df_ da ON da.t = a.t
          JOIN df_ db ON db.t = b.t
          GROUP BY 1, 2
          HAVING COUNT(*) >= {min_both}
        )
        SELECT p.t1, p.t2, p.both, da.df AS df1, db.df AS df2,
               CAST(n_.n AS BIGINT) AS n,
               CAST(n_.n AS DOUBLE) * CAST(p.both AS DOUBLE)
                 / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE))
                 AS lift
        FROM pairs p
        JOIN df_ da ON da.t = p.t1
        JOIN df_ db ON db.t = p.t2
        CROSS JOIN n_
        ORDER BY CAST(n_.n AS DOUBLE) * CAST(p.both AS DOUBLE)
                 / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE))
                 DESC, p.t1, p.t2
        LIMIT 25
"""


@register(
    "text_pair_lift",
    oracle=_LIFT_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))",
        min_df=_LIFT_MIN_DF,
        min_both=_LIFT_MIN_BOTH,
    ),
    doc="Top-25 token pairs by document-level LIFT "
    "(n * df_both / (df_a * df_b)) with df and support floors — the "
    "collocation/association miner behind phrase vocabularies and "
    "template detection. Lift is the exact-rational core of PMI "
    "(PMI = ln lift); per the hill rule the gate emits the raw "
    "ratio and its exact bigint factors (both, df1, df2, n), never "
    "the ln. Ranking by the float division, not a scaled integer "
    "product (the bigint-overflow ORDER BY rule), with a total "
    "(t1, t2) tie-break. Scale shape: df-capped doc-keyed equi-join "
    "for candidates — the df floor bounds the fan-out per doc, "
    "never token x token.",
    tags=("text", "dedup", "curation"),
)
def text_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    ).createOrReplaceTempView("documents")
    return spark.sql(
        _LIFT_SQL.format(
            tok="explode(split(trim(text), '\\\\s+'))",
            min_df=_LIFT_MIN_DF,
            min_both=_LIFT_MIN_BOTH,
        )
    )
