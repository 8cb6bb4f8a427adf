"""Round-13 gate wave #5 (pipeline43): partial autocorrelation
(Durbin-Levinson unrolled), time-domain audio pitch, sample entropy.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ---------------------------------------------------------- PACF --

# Durbin-Levinson unrolled to lag 3 over the per-type daily-count
# series.  Autocovariances use n-scaled deviations d_t = n*x_t - S
# (exact bigints), so c_k = sum d_t d_{t+k} is exact and
# rho_k = c_k / c_0 is one double division; the phi chain is a fixed
# textual cascade of mirrored double expressions, each final phi
# quantized ONCE to 1e-6 units.
_PACF_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_PACF_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day) AS rk
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
          CROSS JOIN (SELECT r AS k
                      FROM (VALUES (0), (1), (2), (3)) AS t(r)) k
          JOIN dev b ON b.event_type = a.event_type
                    AND b.rk = a.rk + k.k
          GROUP BY 1, 2
        ),
        piv AS (
          SELECT event_type,
                 MAX(CASE WHEN k = 0 THEN ck END) AS c0,
                 MAX(CASE WHEN k = 1 THEN ck END) AS c1,
                 MAX(CASE WHEN k = 2 THEN ck END) AS c2,
                 MAX(CASE WHEN k = 3 THEN ck END) AS c3
          FROM gam GROUP BY event_type
        ),
        rho AS (
          -- degenerate guards live in CASE (NULL rho/phi), never in
          -- WHERE: a constant/zero-variance series keeps its row with
          -- NULL phi columns instead of vanishing silently (r13 ADVICE).
          SELECT event_type, c0, c1, c2, c3,
                 CASE WHEN c0 > 0
                      THEN CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                 END AS r1,
                 CASE WHEN c0 > 0
                      THEN CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE)
                 END AS r2,
                 CASE WHEN c0 > 0
                      THEN CAST(c3 AS DOUBLE) / CAST(c0 AS DOUBLE)
                 END AS r3
          FROM piv
        ),
        lev2 AS (
          SELECT event_type, c0, c1, c2, c3, r1, r2, r3,
                 CASE WHEN 1.0 - r1 * r1 <> 0.0
                      THEN (r2 - r1 * r1) / (1.0 - r1 * r1)
                 END AS phi22
          FROM rho
        ),
        lev3 AS (
          SELECT event_type, c0, c1, c2, c3, r1, r2, r3, phi22,
                 r1 - phi22 * r1 AS phi21
          FROM lev2
        )
        SELECT event_type, c0, c1, c2, c3,
               CAST(ROUND(r1 * 1000000.0) AS BIGINT) AS phi1_q,
               CAST(ROUND(phi22 * 1000000.0) AS BIGINT) AS phi2_q,
               CASE WHEN 1.0 - phi21 * r1 - phi22 * r2 <> 0.0
                    THEN CAST(ROUND((r3 - phi21 * r2 - phi22 * r1)
                           / (1.0 - phi21 * r1 - phi22 * r2)
                           * 1000000.0) AS BIGINT)
               END AS phi3_q
        FROM lev3
        ORDER BY event_type
"""
_PACF_SQL = _PACF_HEAD_SQL + _PACF_TAIL_SQL


@register(
    "events_pacf",
    oracle=_PACF_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Partial autocorrelation (lags 1-3) of each type's daily-count "
    "series via the Durbin-Levinson recursion unrolled — the AR-order "
    "diagnostic ACF can't give (ACF of an AR(1) decays forever; PACF "
    "cuts off at the true order). Autocovariances from n-scaled "
    "integer deviations (exact bigints c0..c3 emitted as anchors); "
    "rho_k = c_k/c0 one double division; the phi cascade is a fixed "
    "textual chain of mirrored double expressions, each phi quantized "
    "ONCE to 1e-6 units (phi1 = rho1, phi2 = (r2-r1^2)/(1-r1^2), "
    "phi3 via the order-2 coefficients). Scale shape: one (type, day) "
    "count, a 4-row lag spine over 30-row partitions.",
    tags=("events", "stats"),
)
def events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_pacf")
    return spark.sql(
        _PACF_SQL.format(day_expr="ts DIV 86400000000000", src="ev_pacf")
    )


# --------------------------------------------- audio pitch (ACF) --

_PITCH_MAX_DOC = 500
_PITCH_N = 64
_PITCH_AMP = 1024
_PITCH_LAGS = (2, 4, 8, 16)


def _pitch_detect_sql() -> str:
    # shortest probed lag wins ties — the pitch detector's tie-break
    return (
        "CASE WHEN r2 >= r4 AND r2 >= r8 AND r2 >= r16 THEN 2 "
        "WHEN r4 >= r8 AND r4 >= r16 THEN 4 "
        "WHEN r8 >= r16 THEN 8 ELSE 16 END"
    )


def _pitch_oracle() -> str:
    half_p = "CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END"
    rcols = ", ".join(
        f"CAST(MAX(CASE WHEN lag = {t} THEN r END) AS BIGINT) AS r{t}"
        for t in _PITCH_LAGS
    )
    return f"""
        WITH samp AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 CASE WHEN ((i.i // ({half_p})) % 2) = 0
                      THEN {_PITCH_AMP} ELSE -{_PITCH_AMP} END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_PITCH_N - 1}))
                      AS i) i
          WHERE doc_id < {_PITCH_MAX_DOC}
        ),
        ac AS MATERIALIZED (
          SELECT a.doc_id, l.lag,
                 CAST(SUM(a.s * b.s) AS BIGINT) AS r
          FROM samp a
          CROSS JOIN (SELECT r AS lag FROM (VALUES (2), (4), (8), (16))
                      AS t(r)) l
          JOIN samp b ON b.doc_id = a.doc_id AND b.i = a.i + l.lag
          GROUP BY 1, 2
        ),
        per_doc AS (
          SELECT doc_id, {rcols} FROM ac GROUP BY doc_id
        )
        SELECT r2, r4, r8, r16,
               CAST({_pitch_detect_sql()} AS INTEGER) AS period,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM per_doc
        GROUP BY r2, r4, r8, r16
        ORDER BY min_doc
    """


@register(
    "multimodal_audio_pitch",
    oracle=_pitch_oracle(),
    doc="Time-domain pitch detection by EXACT integer autocorrelation "
    "over REAL WAV payloads (operator audio_autocorr; the "
    "frequency-domain multimodal_audio_tone's complement): each doc "
    "plants a square wave of period 4/8/16 by class; R(tau) = "
    "sum s_i s_{i+tau} is an exact int64 for every probed lag, and "
    "the detected period is the raw-R argmax with shortest-lag "
    "tie-break (unnormalized R makes a shorter full-correlation lag "
    "win on term count — R(p) at the true period beats its "
    "multiples). All three planted classes recover their exact "
    "period. Oracle replays the sample formula and the same "
    "autocorrelation join. Arrow-batched narrow map; no shuffle.",
    tags=("multimodal",),
)
def multimodal_audio_pitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _PITCH_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                half_p = (2, 4, 8)[int(d) % 3]
                samples = [
                    _PITCH_AMP if (i // half_p) % 2 == 0 else -_PITCH_AMP
                    for i in range(_PITCH_N)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    ac = multimodal.audio_autocorr(blobs, n=_PITCH_N, lags=_PITCH_LAGS)
    per_doc = ac.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("lag") == t, F.col("r")))
            .cast("bigint")
            .alias(f"r{t}")
            for t in _PITCH_LAGS
        ]
    )
    return (
        per_doc.groupBy("r2", "r4", "r8", "r16")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .select(
            "r2",
            "r4",
            "r8",
            "r16",
            F.expr(_pitch_detect_sql()).cast("int").alias("period"),
            "n_docs",
            "min_doc",
        )
        .orderBy("min_doc")
    )


# -------------------------------------------------- sample entropy --

# SampEn(m=2, r = range/10) over the per-type daily-count series:
# B = template pairs (length 2) within Chebyshev tolerance r, A = the
# same pairs still matching at length 3 — BOTH exact integer counts
# (the whole statistic is comparisons on exact bigints); the A/B ratio
# is the one mirrored float, -ln left to the consumer per the hill
# rule.
_SAMPEN_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_SAMPEN_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day) AS rk
          FROM daily
        ),
        tol AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 (CAST(MAX(x) AS BIGINT) - CAST(MIN(x) AS BIGINT))
                   {div} 10 AS r
          FROM idx GROUP BY event_type
        ),
        tri AS (
          SELECT event_type, rk, x,
                 LEAD(x, 1) OVER (
                   PARTITION BY event_type ORDER BY rk) AS x1,
                 LEAD(x, 2) OVER (
                   PARTITION BY event_type ORDER BY rk) AS x2
          FROM idx
        ),
        tmpl AS (
          SELECT * FROM tri WHERE x2 IS NOT NULL
        ),
        cnt AS (
          SELECT a.event_type,
                 CAST(SUM(CASE WHEN abs(a.x - b.x) <= t.r
                           AND abs(a.x1 - b.x1) <= t.r
                          THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
                 CAST(SUM(CASE WHEN abs(a.x - b.x) <= t.r
                           AND abs(a.x1 - b.x1) <= t.r
                           AND abs(a.x2 - b.x2) <= t.r
                          THEN 1 ELSE 0 END) AS BIGINT) AS a_count
          FROM tmpl a
          JOIN tmpl b ON b.event_type = a.event_type AND a.rk < b.rk
          JOIN tol t ON t.event_type = a.event_type
          GROUP BY a.event_type
        )
        SELECT c.event_type, t.n, t.r, c.b_count, c.a_count,
               CASE WHEN c.b_count > 0
                    THEN CAST(c.a_count AS DOUBLE)
                         / CAST(c.b_count AS DOUBLE)
               END AS match_ratio
        FROM cnt c JOIN tol t ON t.event_type = c.event_type
        ORDER BY c.event_type
"""
_SAMPEN_SQL = _SAMPEN_HEAD_SQL + _SAMPEN_TAIL_SQL


@register(
    "events_sample_entropy",
    oracle=_SAMPEN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Sample entropy (m=2, Chebyshev tolerance r = range DIV 10) of "
    "each type's daily-count series: B counts length-2 template "
    "pairs within tolerance, A the same pairs still matching at "
    "length 3 — low A/B (high SampEn) = irregular series, high = "
    "self-similar/predictable; the regularity screen for metric "
    "streams (bot traffic is LOW-entropy). Both counts are exact "
    "integer comparison sums (nothing floats until the final A/B "
    "ratio); SampEn = -ln(A/B) is left to the consumer per the hill "
    "rule. Scale shape: the template pair join is per-type over "
    "~30-row partitions — at production series lengths this becomes "
    "a banded |x-y| <= r range join on the sorted series, never "
    "corpus-scale.",
    tags=("events", "stats"),
)
def events_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sampen")
    return spark.sql(
        _SAMPEN_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_sampen", div="DIV"
        )
    )
