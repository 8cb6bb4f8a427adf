"""Round-14 gate wave #8 (pipeline58): binary transfer entropy
(+ streaming twin), weighted quartiles, and spherical mean resultant
length.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; the transfer-entropy
millinat fold's rounding margins are audited offline at 3 SFs; the
TE algebra is locked against a replica in
tests/test_round14_formulas.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ---------------------------------------- binary transfer entropy --

# TE(X -> Y) over above-mean binarized daily series (b = [n*x > S],
# exact integers): with triple counts c_abc over (y_next, y, x)
# windows, TE = sum (c/N) ln( c * h_b / (m_bc * g_ab) ) where
# m_bc/g_ab/h_b are the exact marginal sums. The DIRECTED
# predictability score lead-lag regression only hints at: TE(X->Y)
# >> TE(Y->X) says X's state helps predict Y's next move beyond Y's
# own history. Fixed 8-term textual ln fold over exact bigint
# counts, quantized ONCE to millinats (offline margin audit at 3
# SFs; zero cells contribute exact 0).
_TE_TERM = (
    "CASE WHEN {c} > 0 THEN (CAST({c} AS DOUBLE) / CAST(nw AS DOUBLE))"
    " * ln(CAST({c} AS DOUBLE) * CAST({h} AS DOUBLE)"
    " / (CAST({m} AS DOUBLE) * CAST({g} AS DOUBLE)))"
    " ELSE CAST(0.0 AS DOUBLE) END"
)

_TE_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""


def _te_tail_sql() -> str:
    # cell columns c{a}{b}{c} with a = y_next, b = y, c = x
    pcols = ", ".join(
        f"CAST(SUM(CASE WHEN a = {a} AND b = {b} AND c = {c} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS c{a}{b}{c}"
        for a in (0, 1)
        for b in (0, 1)
        for c in (0, 1)
    )
    terms = " + ".join(
        _TE_TERM.format(
            c=f"c{a}{b}{c}",
            m=f"(c0{b}{c} + c1{b}{c})",
            g=f"(c{a}{b}0 + c{a}{b}1)",
            h=f"(c0{b}0 + c0{b}1 + c1{b}0 + c1{b}1)",
        )
        for a in (0, 1)
        for b in (0, 1)
        for c in (0, 1)
    )
    return f"""
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s
          FROM daily GROUP BY event_type
        ),
        bin AS (
          SELECT d.event_type, d.day,
                 CASE WHEN g.n * d.x > g.s THEN 1 ELSE 0 END AS b
          FROM daily d JOIN g ON g.event_type = d.event_type
        ),
        lagd AS (
          SELECT event_type, day, b,
                 LEAD(b) OVER (PARTITION BY event_type
                   ORDER BY day) AS bn
          FROM bin
        ),
        trip AS (
          SELECT y.event_type AS ty, x.event_type AS tx,
                 y.bn AS a, y.b AS b, x.b AS c
          FROM lagd y
          JOIN bin x ON x.day = y.day
                    AND x.event_type <> y.event_type
          WHERE y.bn IS NOT NULL
        ),
        piv AS (
          SELECT ty, tx, {pcols}, CAST(COUNT(*) AS BIGINT) AS nw
          FROM trip GROUP BY ty, tx
        )
        SELECT tx AS src_type, ty AS dst_type, nw,
               c000, c001, c010, c011, c100, c101, c110, c111,
               CAST(ROUND(({terms}) * 1000.0) AS BIGINT)
                 AS te_mnat
        FROM piv
        ORDER BY src_type, dst_type
    """


def _te_sql(day_expr: str, src: str) -> str:
    return _TE_HEAD_SQL.format(day_expr=day_expr, src=src) + _te_tail_sql()


@register(
    "events_transfer_entropy",
    oracle=_te_sql("epoch_ns(ts) // 86400000000000", "events"),
    doc="Binary transfer entropy TE(X -> Y) between every ordered "
    "pair of types' above-mean daily states — the DIRECTED "
    "predictability score that events_leadlag_regression (linear, "
    "symmetric-ish) and events_partial_corr (undirected) cannot "
    "give: TE(X->Y) >> TE(Y->X) says X's state improves prediction "
    "of Y's NEXT move beyond Y's own history. Binarization n*x > S "
    "is exact integer; the 8 triple-cell counts are exact bigint "
    "anchors; TE is a FIXED 8-term textual ln fold over counts and "
    "their marginals, quantized ONCE to millinats (offline margin "
    "audit at 3 SFs: worst 0.014 mnat vs ~1e-13 ulp; algebra locked "
    "against an independent replica "
    "in tests/test_round14_formulas.py). Scale shape: one (type, "
    "day) count + a 29-window LEAD join per ordered pair.",
    tags=("events", "stats"),
)
def events_transfer_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_te")
    return spark.sql(_te_sql("ts DIV 86400000000000", "ev_te"))


@register(
    "events_stream_transfer_entropy",
    oracle=_te_sql("epoch_ns(ts) // 86400000000000", "events"),
    doc="STREAMING twin of events_transfer_entropy: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL triple-cell tail SQL (shared _te_tail_sql "
    "template). The live directed-influence monitor converging to "
    "the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_transfer_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ste")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ste_daily
        ),"""
        + _te_tail_sql()
    )


# ----------------------------------------------- weighted quartiles --

# agg_weighted_median's quartile siblings in the same pass: q25 = min
# value with 4*cumweight >= total, q75 = min with 4*cumweight >=
# 3*total — exact integer cents via the identical doubled-threshold
# discipline; the weighted IQR is their mirrored double difference.
_WQ_SQL = """
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
        )
        SELECT flag, CAST(MAX(tw) AS BIGINT) AS w_total,
               CAST(MIN(CASE WHEN 4 * cw >= tw THEN v END)
                 AS BIGINT) AS wq25,
               CAST(MIN(CASE WHEN 2 * cw >= tw THEN v END)
                 AS BIGINT) AS wq50,
               CAST(MIN(CASE WHEN 4 * cw >= 3 * tw THEN v END)
                 AS BIGINT) AS wq75,
               (CAST(MIN(CASE WHEN 4 * cw >= 3 * tw THEN v END)
                     AS DOUBLE)
                - CAST(MIN(CASE WHEN 4 * cw >= tw THEN v END)
                       AS DOUBLE)) / 100.0 AS weighted_iqr
        FROM cum GROUP BY flag
        ORDER BY flag
"""


@register(
    "agg_weighted_quartiles",
    oracle=_WQ_SQL,
    doc="Quantity-weighted price quartiles per return flag — "
    "agg_weighted_median's siblings from the same cumulative-weight "
    "pass: q25/q50/q75 = min value whose 4*cumweight clears "
    "1/2/3 x total (exact integer cents, the doubled-threshold "
    "discipline; ties merged by grouping on value first); the "
    "weighted IQR is one mirrored double. 'The price band holding "
    "the middle half of the QUANTITY' — a different band from the "
    "unweighted quartiles whenever weights correlate with values. "
    "Scale shape: one (flag, value) aggregate + a per-flag "
    "cumulative window.",
    tags=("agg",),
)
def agg_weighted_quartiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_WQ_SQL)


# ------------------------------------- spherical mean resultant --

# Mean resultant length Rbar per label: each embedding normalized to
# the unit sphere (norm = sqrt of the exact integer sum of squared
# q-coords — one bit-identical sqrt per vector), unit coords
# quantized ONCE to 1e-6, so the per-label coordinate sums are exact
# bigints and Rbar = |sum u| / n is one mirrored factor-wise double.
# Rbar near 1 = tightly concentrated direction (high vMF kappa),
# near 0 = dispersed — the spherical-concentration complement of
# emb_label_centroid_cosines (between-label geometry) and the
# isotropy audits (global shape).
_MRL_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
        ),
        nrm AS (
          SELECT vid, label,
                 CAST(SUM(q * q) AS BIGINT) AS n2
          FROM xq GROUP BY 1, 2
        ),
        uq AS (
          SELECT x.label, x.pos,
                 CAST(ROUND(1000000.0 * CAST(x.q AS DOUBLE)
                      / sqrt(CAST(n.n2 AS DOUBLE))) AS BIGINT) AS u
          FROM xq x JOIN nrm n ON n.vid = x.vid
          WHERE n.n2 > 0
        ),
        su AS (
          SELECT label, pos, CAST(SUM(u) AS BIGINT) AS s
          FROM uq GROUP BY 1, 2
        ),
        counts AS (
          SELECT label,
                 CAST(SUM(CASE WHEN n2 > 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_vecs,
                 CAST(SUM(CASE WHEN n2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_zero_norm
          FROM nrm GROUP BY label
        ),
        agg AS (
          SELECT label, CAST(SUM(s * s) AS BIGINT) AS r2_q
          FROM su GROUP BY label
        )
        SELECT a.label, c.n_vecs, c.n_zero_norm, a.r2_q,
               CASE WHEN c.n_vecs > 0
                    THEN sqrt(CAST(a.r2_q AS DOUBLE))
                         / (1000000.0 * CAST(c.n_vecs AS DOUBLE))
               END AS mean_resultant
        FROM agg a JOIN counts c ON c.label = a.label
        ORDER BY a.label
"""


@register(
    "emb_mean_resultant",
    oracle=_MRL_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
    ),
    doc="Spherical mean resultant length Rbar per label — the "
    "von-Mises-Fisher concentration proxy for direction-based "
    "retrieval: Rbar near 1 = the label's embeddings point one way "
    "(a centroid router works), near 0 = dispersed on the sphere "
    "(it cannot). Per-vector unit coords are quantized ONCE to "
    "1e-6 after a bit-identical sqrt over the exact integer norm, "
    "so the per-label coordinate sums and their squared total are "
    "exact bigint anchors; Rbar is one mirrored factor-wise "
    "double; zero-norm vectors are excluded by a mirrored filter "
    "and counted. Scale shape: one (label, dim) aggregate — "
    "volume enters only the first pass.",
    tags=("embedding", "stats"),
)
def emb_mean_resultant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _MRL_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT))"
            " AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64))"
            " AS i) g",
        )
    )
