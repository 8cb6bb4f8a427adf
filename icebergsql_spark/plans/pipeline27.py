"""Round-11 gate wave #10 (pipeline27): Wilson score intervals,
deterministic PPS sampling with a Horvitz-Thompson audit, and a Wald
SPRT conversion monitor.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------------ Wilson score CI --

_WILSON_Z = "1.959963984540054"

_WILSON_SQL = """
        WITH users AS (
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) >= 20
                      THEN 1 ELSE 0 END AS conv
          FROM {src} GROUP BY user_id
        ),
        agg AS (
          SELECT arm,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM users GROUP BY arm
        ),
        w AS (
          SELECT arm, n, c,
                 CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                 CAST({z} AS DOUBLE) AS z
          FROM agg
        )
        SELECT arm, n, c, p,
               (p + z * z / (2.0 * CAST(n AS DOUBLE))
                - z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                           + z * z / (4.0 * CAST(n AS DOUBLE)
                                      * CAST(n AS DOUBLE))))
                 / (1.0 + z * z / CAST(n AS DOUBLE)) AS lo,
               (p + z * z / (2.0 * CAST(n AS DOUBLE))
                + z * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                           + z * z / (4.0 * CAST(n AS DOUBLE)
                                      * CAST(n AS DOUBLE))))
                 / (1.0 + z * z / CAST(n AS DOUBLE)) AS hi
        FROM w
        ORDER BY arm
"""


@register(
    "events_wilson_ci",
    oracle=_WILSON_SQL.format(src="events", z=_WILSON_Z),
    doc="Wilson score interval for each arm's conversion rate "
    "(conversion = >= 20 purchases): the analytic CI that stays "
    "inside [0, 1] and behaves at small n / extreme p where the Wald "
    "interval collapses — the per-arm companion to the bootstrap "
    "difference CI. Exact bigint n/c per arm; center and half-width "
    "are one mirrored float expression over them with the standard "
    "z = 1.96 quantile literal. The arm readout every experiment "
    "summary table prints next to the lift.",
    tags=("events", "stats"),
)
def events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_wil")
    return spark.sql(_WILSON_SQL.format(src="ev_wil", z=_WILSON_Z))


# ------------------------------------- deterministic PPS sampling --

_PPS_TARGET = 100
_PPS_SC = "4503599627370496.0"  # 16^13

_PPS_SQL = """
        WITH tot AS (
          SELECT CAST(SUM(n_chars) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM documents
        ),
        probs AS (
          SELECT d.doc_id, d.n_chars,
                 LEAST(1.0, {target}.0 * CAST(d.n_chars AS DOUBLE)
                            / CAST(t.s AS DOUBLE)) AS pi,
                 CAST({h} AS DOUBLE) / {sc} AS u
          FROM documents d CROSS JOIN tot t
        ),
        sampled AS (
          SELECT doc_id, n_chars, pi,
                 CASE WHEN u < pi THEN 1 ELSE 0 END AS inc,
                 CASE WHEN u < pi
                      THEN CAST(ROUND(CAST(n_chars AS DOUBLE) / pi)
                           AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS ht_q
          FROM probs
        )
        SELECT CAST(SUM(inc) AS BIGINT) AS n_sampled,
               CAST(SUM(CASE WHEN pi >= 1.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_certain,
               CAST(SUM(ht_q) AS BIGINT) AS ht_total,
               (SELECT s FROM tot) AS true_total,
               CAST(abs(SUM(ht_q) - (SELECT s FROM tot)) * 1000000
                    {div} (SELECT s FROM tot) AS BIGINT) AS err_ppm
        FROM sampled
"""

_PPS_H_SPARK = (
    "CAST(conv(substring(md5(concat('pps:', CAST(d.doc_id AS STRING))),"
    " 1, 13), 16, 10) AS BIGINT)"
)
_PPS_H_DUCK = (
    "CAST('0x' || substr(md5('pps:' || CAST(d.doc_id AS VARCHAR)),"
    " 1, 13) AS BIGINT)"
)


@register(
    "curation_pps_sample",
    oracle=_PPS_SQL.format(
        target=_PPS_TARGET, h=_PPS_H_DUCK, sc=_PPS_SC, div="//"
    ),
    doc="Probability-proportional-to-size Poisson sampling of the "
    "corpus with a Horvitz-Thompson audit: inclusion probability "
    "pi_i = min(1, k * chars_i / total_chars) (long docs are "
    "certainties), the coin is the deterministic md5 fraction both "
    "engines replay bit-identically, and the HT estimator "
    "sum(chars_i / pi_i) over the sample — each contribution "
    "quantized ONCE to a bigint so the estimate sums exactly — "
    "recovers total char mass, with the signed error in exact ppm "
    "alongside. THE sampling design for size-skewed corpora (uniform "
    "sampling wastes budget on tiny docs and still misses the mass). "
    "Scale shape: one narrow map over docs, one aggregate; "
    "reproducible across runs, engines, and cluster sizes.",
    tags=("curation",),
)
def curation_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("documents",))[
        "documents"
    ].createOrReplaceTempView("documents")
    return spark.sql(
        _PPS_SQL.format(
            target=_PPS_TARGET, h=_PPS_H_SPARK, sc=_PPS_SC, div="DIV"
        )
    )


# ---------------------------------------------- Wald SPRT monitor --

# H0: conversion p0 = 0.02, H1: p1 = 0.04; per-user log-likelihood
# ratio increments are CONSTANT literals (ln computed once offline —
# no engine ln anywhere), so the running LLR is integer-count times
# literal.  Boundaries ln((1-b)/a) / ln(b/(1-a)) at a = b = 0.05.
_SPRT_LR1 = "0.6931471805599453"  # ln(p1/p0) = ln 2
_SPRT_LR0 = "-0.020619287202735703"  # ln((1-p1)/(1-p0)) = ln(0.96/0.98)
_SPRT_UP = "2.9444389791664403"  # ln(19)
_SPRT_LO = "-2.9444389791664403"  # ln(1/19)

_SPRT_SQL = """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        first_seen AS (
          SELECT user_id, CAST(MIN(day) AS BIGINT) AS f
          FROM ev GROUP BY user_id
        ),
        pday AS (
          SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev WHERE event_type = 'purchase'
          GROUP BY user_id, day
        ),
        cum AS (
          SELECT user_id, day,
                 CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY day)
                      AS BIGINT) AS cc
          FROM pday
        ),
        t20 AS (
          SELECT user_id, CAST(MIN(day) AS BIGINT) AS t
          FROM cum WHERE cc >= 20 GROUP BY user_id
        ),
        days AS (SELECT DISTINCT day FROM ev),
        trace AS (
          SELECT d.day,
                 CAST((SELECT COUNT(*) FROM first_seen fs
                       WHERE fs.f <= d.day) AS BIGINT) AS n_users,
                 CAST((SELECT COUNT(*) FROM t20
                       WHERE t20.t <= d.day) AS BIGINT) AS n_conv
          FROM days d
        ),
        llr AS (
          SELECT day, n_users, n_conv,
                 CAST(n_conv AS DOUBLE) * CAST({lr1} AS DOUBLE)
                 + CAST(n_users - n_conv AS DOUBLE)
                   * CAST({lr0} AS DOUBLE) AS llr
          FROM trace
        )
        SELECT day, n_users, n_conv, llr,
               CASE WHEN llr >= CAST({up} AS DOUBLE) THEN 'accept_h1'
                    WHEN llr <= CAST({lo} AS DOUBLE) THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM llr
        ORDER BY day
"""


@register(
    "events_sprt_monitor",
    oracle=_SPRT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        lr1=_SPRT_LR1,
        lr0=_SPRT_LR0,
        up=_SPRT_UP,
        lo=_SPRT_LO,
    ),
    doc="Wald sequential probability ratio test on the conversion rate "
    "(H0 p=0.02 vs H1 p=0.04, alpha = beta = 0.05): the day-by-day "
    "running log-likelihood ratio over enrolled users (first event "
    "day) and converters (day the 20th purchase lands), against the "
    "ln(19) boundaries. The per-observation LLR increments are "
    "CONSTANT literals computed once offline — the whole float "
    "surface is integer-count x literal, so the trace is as "
    "deterministic as the counts. SPRT is the always-valid "
    "minimal-expected-sample monitor that predates (and underlies) "
    "the group-sequential battery already in the registry. Scale "
    "shape: one per-user cumulative window, a 30-row day spine.",
    tags=("events", "stats"),
)
def events_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sprt")
    return spark.sql(
        _SPRT_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_sprt",
            lr1=_SPRT_LR1,
            lr0=_SPRT_LR0,
            up=_SPRT_UP,
            lo=_SPRT_LO,
        )
    )
