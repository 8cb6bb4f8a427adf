"""Round-14 gate wave #5 (pipeline55): Grubbs' outlier statistic,
Poisson overdispersion (+ streaming twins for both), two-NN intrinsic
dimension, and image colorfulness.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; Grubbs/overdispersion
algebra locked against Fraction replicas in
tests/test_round14_formulas.py; the two-NN ln terms' millinat
rounding margins audited offline at all 3 SFs (worst 9.5e-5 mnat vs
~1e-13 ulp sensitivity — 9 orders of safety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ----------------------------------------------- Grubbs' statistic --

# G = max|x - mean| / s over each type's daily series: with S = sum x,
# Q = sum x^2, the deviation n*x_i - S is exact, and G = maxdev /
# sqrt(n * (nQ - S^2) / (n - 1)) — exact bigint anchors (maxdev,
# ss_n = nQ - S^2, the argmax day with earliest-day tie-break), one
# factor-wise double. The critical value needs the t distribution —
# hill-rule territory, left to the consumer.
_GRUBBS_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_GRUBBS_TAIL_SQL = """
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s,
                 CAST(SUM(x * x) AS BIGINT) AS q
          FROM daily GROUP BY event_type
        ),
        dev AS (
          SELECT d.event_type, d.day,
                 CAST(abs(g.n * d.x - g.s) AS BIGINT) AS a
          FROM daily d JOIN g ON g.event_type = d.event_type
        ),
        mx AS (
          SELECT event_type, day, a FROM (
            SELECT event_type, day, a,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY a DESC, day) AS rn
            FROM dev
          ) z WHERE rn = 1
        )
        SELECT g.event_type, g.n AS n_days,
               mx.a AS maxdev_n,
               mx.day AS outlier_day,
               CAST(g.n * g.q - g.s * g.s AS BIGINT) AS ss_n,
               CASE WHEN g.n > 1 AND g.n * g.q - g.s * g.s > 0
                    THEN CAST(mx.a AS DOUBLE)
                         / sqrt(CAST(g.n AS DOUBLE)
                                * CAST(g.n * g.q - g.s * g.s
                                       AS DOUBLE)
                                / CAST(g.n - 1 AS DOUBLE))
               END AS grubbs_g
        FROM g JOIN mx ON mx.event_type = g.event_type
        ORDER BY g.event_type
"""
_GRUBBS_SQL = _GRUBBS_HEAD_SQL + _GRUBBS_TAIL_SQL


@register(
    "events_grubbs_outlier",
    oracle=_GRUBBS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Grubbs' outlier statistic G = max|x - mean|/s over each "
    "type's daily volume — the single-most-extreme-day test that "
    "complements events_tukey_fences (which flags ALL fence "
    "crossers) and events_mad_outliers (robust center): G is the "
    "classic studentized extreme deviate a monitoring page ranks "
    "by. Exact bigint anchors (n-scaled maxdev, its day with "
    "earliest tie-break, ss_n = nQ - S^2); G one factor-wise "
    "double; the t-distribution critical value is left to the "
    "consumer per the hill rule. Locked against a Fraction replica "
    "in tests/test_round14_formulas.py. Scale shape: volume enters "
    "one (type, day) count.",
    tags=("events", "stats"),
)
def events_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_grb")
    return spark.sql(
        _GRUBBS_SQL.format(day_expr="ts DIV 86400000000000", src="ev_grb")
    )


@register(
    "events_stream_grubbs",
    oracle=_GRUBBS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_grubbs_outlier: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL tail SQL (shared _GRUBBS_TAIL_SQL). The "
    "live extreme-day monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "sgrb")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM sgrb_daily
        ),"""
        + _GRUBBS_TAIL_SQL
    )


# ------------------------------------------- Poisson overdispersion --

# Index-of-dispersion test: a Poisson daily-count series has
# variance == mean; the chi-square statistic (n-1)*s^2/mean reduces
# EXACTLY to (nQ - S^2)/S — one exact integer fraction (both factors
# emitted), dispersion D = chi2/(n-1) as the mirrored double. The
# burstiness one-number answer to "is this type's volume Poisson or
# clumped?" that events_bot_regularity asks per user.
_DISP_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_DISP_TAIL_SQL = """
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s,
                 CAST(SUM(x * x) AS BIGINT) AS q
          FROM daily GROUP BY event_type
        )
        SELECT event_type, n AS n_days, s AS total,
               CAST(n * q - s * s AS BIGINT) AS chi2_num,
               s AS chi2_den,
               CASE WHEN s > 0 THEN
                 CAST(n * q - s * s AS DOUBLE) / CAST(s AS DOUBLE)
               END AS chi2_stat,
               CASE WHEN s > 0 AND n > 1 THEN
                 CAST(n * q - s * s AS DOUBLE) / CAST(s AS DOUBLE)
                 / CAST(n - 1 AS DOUBLE)
               END AS dispersion
        FROM g
        ORDER BY event_type
"""
_DISP_SQL = _DISP_HEAD_SQL + _DISP_TAIL_SQL


@register(
    "events_overdispersion",
    oracle=_DISP_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Poisson overdispersion (index-of-dispersion) test per type: "
    "the chi-square statistic (n-1)*s^2/mean reduces EXACTLY to the "
    "integer fraction (nQ - S^2)/S over the daily series — "
    "dispersion near 1 = Poisson-compatible volume, >> 1 = clumped/"
    "bursty (campaign-driven), << 1 = throttled/regular (bot-like) "
    "— the per-type one-number complement of events_bot_regularity's "
    "per-user gap variance and events_burst_detection. Exact bigint "
    "num/den anchors; the two floats are mirrored divisions. Locked "
    "against a Fraction replica in tests/test_round14_formulas.py. "
    "Scale shape: one (type, day) count.",
    tags=("events", "stats"),
)
def events_overdispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_disp")
    return spark.sql(
        _DISP_SQL.format(day_expr="ts DIV 86400000000000", src="ev_disp")
    )


@register(
    "events_stream_overdispersion",
    oracle=_DISP_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_overdispersion: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL tail SQL (shared _DISP_TAIL_SQL). The live "
    "burstiness monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_overdispersion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "sdsp")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM sdsp_daily
        ),"""
        + _DISP_TAIL_SQL
    )


# -------------------------------------- two-NN intrinsic dimension --

# Facco et al.'s TWO-NN estimator per label: mu_i = r2_i / r1_i over
# the exact integer squared distances in the 1e3 q-space; the ID
# estimate is n / sum(ln mu_i). Each ln term is quantized ONCE to
# millinats (offline audit at all 3 SFs: worst rounding margin
# 9.5e-5 mnat vs ~1e-13 ulp sensitivity of the double ln — 9 orders
# of safety, the image-entropy discipline), so the term SUM is an
# exact bigint anchor; the estimate is one mirrored division.
# r2 is chosen by (d2, vid) order so distance ties resolve
# identically in both engines; exact-duplicate points (r1 = 0) are
# excluded by a mirrored filter and counted.
_ID2NN_CAP = 1000

_ID2NN_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
          WHERE vec_id < {cap}
        ),
        d2 AS (
          SELECT a.label, a.vid AS i, b.vid AS j,
                 CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d
          FROM xq a
          JOIN xq b ON b.label = a.label AND b.pos = a.pos
                   AND b.vid <> a.vid
          GROUP BY 1, 2, 3
        ),
        nn AS (
          SELECT label, i, d, rn FROM (
            SELECT label, i, d,
                   ROW_NUMBER() OVER (PARTITION BY label, i
                     ORDER BY d, j) AS rn
            FROM d2
          ) z WHERE rn <= 2
        ),
        piv AS (
          SELECT label, i,
                 MAX(CASE WHEN rn = 1 THEN d END) AS r1sq,
                 MAX(CASE WHEN rn = 2 THEN d END) AS r2sq
          FROM nn GROUP BY 1, 2
        ),
        terms AS (
          SELECT label, i, r1sq, r2sq,
                 CAST(ROUND(500.0 * ln(CAST(r2sq AS DOUBLE)
                      / CAST(r1sq AS DOUBLE))) AS BIGINT) AS t_mnat
          FROM piv
          WHERE r1sq > 0 AND r2sq IS NOT NULL
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(t_mnat) AS BIGINT) AS sum_lnmu_mnat,
               CASE WHEN SUM(t_mnat) > 0
                    THEN CAST(1000 * COUNT(*) AS DOUBLE)
                         / CAST(SUM(t_mnat) AS DOUBLE)
               END AS id_2nn
        FROM terms
        GROUP BY label
        ORDER BY label
"""


@register(
    "emb_intrinsic_dim_2nn",
    oracle=_ID2NN_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
        cap=_ID2NN_CAP,
    ),
    doc="TWO-NN intrinsic-dimension estimate per label (Facco et "
    "al. 2017): ID = n / sum(ln(r2/r1)) over each point's two "
    "nearest same-label neighbors — the how-many-dimensions-does-"
    "the-manifold-actually-use number that calibrates PQ/IVF/JL "
    "compression budgets (ambient 64 dims vs the much smaller "
    "manifold ID). Exact integer squared distances in the 1e3 "
    "q-space with (d, vid) tie-break; each ln(mu)/2 term quantized "
    "ONCE to millinats (offline margin audit at 3 SFs: worst "
    "9.5e-5 mnat vs ~1e-13 ulp — 9 orders of safety) so the term "
    "sum is an exact bigint anchor; duplicates (r1 = 0) excluded "
    "by a mirrored filter. Scale shape: capped universe "
    "(vec_id < 1000) = fixed-cost diagnostic at any corpus size.",
    tags=("embedding", "stats"),
)
def emb_intrinsic_dim_2nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _ID2NN_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT))"
            " AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64))"
            " AS i) g",
            cap=_ID2NN_CAP,
        )
    )


# ---------------------------------------------- image colorfulness --

# Hasler-Susstrunk colorfulness over REAL decoded bytes (PPM for even
# docs, BMP for odd — the multimodal_pixel_stats codec-path fixture
# with a decorrelating i*i*7 byte formula): opponent channels DOUBLED
# to stay integral (rg2 = 2(R-G), yb2 = R+G-2B), so the emitted
# colorfulness_x2 = 2 * C. Sufficient stats are exact int64 from the
# new image_opponent_stats operator; the oracle replays the pixel
# formula relationally; the metric is one mirrored factor-wise
# double.
_CF_MAXDOC = 200

_CF_METRIC_SQL = """
        SELECT doc_id, n_px, rg2_sum, rg2_sq_sum, yb2_sum, yb2_sq_sum,
               sqrt((CAST(n_px * rg2_sq_sum - rg2_sum * rg2_sum
                          AS DOUBLE)
                     + CAST(n_px * yb2_sq_sum - yb2_sum * yb2_sum
                            AS DOUBLE))
                    / CAST(n_px * n_px AS DOUBLE))
               + 0.3 * sqrt(CAST(rg2_sum * rg2_sum
                                 + yb2_sum * yb2_sum AS DOUBLE))
                     / CAST(n_px AS DOUBLE)
                 AS colorfulness_x2
        FROM {stats}
        ORDER BY doc_id
"""


def _cf_oracle() -> str:
    return f"""
        WITH px AS MATERIALIZED (
          SELECT doc_id, p.p AS p,
                 (doc_id * 31 + (3 * p.p) * (3 * p.p) * 7) % 256 AS r,
                 (doc_id * 31 + (3 * p.p + 1) * (3 * p.p + 1) * 7)
                   % 256 AS g,
                 (doc_id * 31 + (3 * p.p + 2) * (3 * p.p + 2) * 7)
                   % 256 AS b
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS p) p
          WHERE doc_id < {_CF_MAXDOC}
        ),
        opp AS (
          SELECT doc_id, 2 * (r - g) AS rg2, r + g - 2 * b AS yb2
          FROM px
        ),
        stats AS (
          SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_px,
                 CAST(SUM(rg2) AS BIGINT) AS rg2_sum,
                 CAST(SUM(rg2 * rg2) AS BIGINT) AS rg2_sq_sum,
                 CAST(SUM(yb2) AS BIGINT) AS yb2_sum,
                 CAST(SUM(yb2 * yb2) AS BIGINT) AS yb2_sq_sum
          FROM opp GROUP BY doc_id
        )
        """ + _CF_METRIC_SQL.format(stats="stats")


@register(
    "multimodal_image_colorfulness",
    oracle=_cf_oracle(),
    doc="Hasler-Susstrunk colorfulness over REAL decoded image bytes "
    "(PPM even docs / BMP odd, the codec-path fixture with a "
    "decorrelating i^2*7 byte formula): C = sqrt(var_rg + var_yb) "
    "+ 0.3*sqrt(mean_rg^2 + mean_yb^2) over the opponent channels "
    "— the is-this-image-actually-colorful score a vision-data "
    "curation pass thresholds (screenshots/scans score low, "
    "photos high). Opponent channels DOUBLED to stay integral "
    "(emitted colorfulness_x2 = 2C, documented); sufficient stats "
    "exact int64 from the new image_opponent_stats operator "
    "(operators/multimodal.py); the oracle replays the pixel "
    "formula relationally, so one mis-parsed channel or padding "
    "byte hash-mismatches. One Arrow-batched narrow map — "
    "frame-local at any scale.",
    tags=("multimodal", "curation"),
)
def multimodal_image_colorfulness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _CF_MAXDOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    (d * 31 + i * i * 7) % 256 for i in range(144)
                )
                payloads.append(
                    multimodal.encode_ppm(8, 6, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(8, 6, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    multimodal.image_opponent_stats(blobs).createOrReplaceTempView(
        "cf_stats"
    )
    return spark.sql(_CF_METRIC_SQL.format(stats="cf_stats"))
