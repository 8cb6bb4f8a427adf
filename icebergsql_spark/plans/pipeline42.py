"""Round-13 gate wave #4 (pipeline42): streaming twins for Hurst and
Cramér's V, Burrows' Delta stylometry, diagonal Mahalanobis outliers.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------ Hurst streaming twin --


def _hurst_oracle() -> str:
    from icebergsql_spark.plans.pipeline39 import _HURST_SQL

    return _HURST_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    )


@register(
    "events_stream_hurst",
    oracle=_hurst_oracle(),
    doc="STREAMING twin of events_hurst: per-(type, day) count partials "
    "(SUM-mergeable) from 3 chronological micro-batches merge into "
    "the `daily` contract; the finalizer runs the IDENTICAL "
    "exact-integer rescaled-range tail SQL (shared _HURST_TAIL_SQL "
    "template). The live long-range-dependence monitor converging "
    "to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline39 import _HURST_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "hur")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM hur_daily
        ),"""
        + _HURST_TAIL_SQL.format(div="DIV")
    )


# -------------------------------------- Cramér's V streaming twin --


def _cell_partial_stream(
    spark: SparkSession, sf_dir: str, prefix: str
) -> None:
    """Contingency-cell sibling of pipeline30's _daily_partial_stream:
    3 chronological micro-batches append SUM-mergeable
    (t, b, c) cell-count partials (b = props k % 6, -1 sentinel for
    missing props.k per the r13 ADVICE); registers the merged result
    as view ``{prefix}_cells`` with the (t, b, o) `cells` contract.
    Delegates to the ONE parameterized fixture
    (pipeline30._partial_stream)."""
    from icebergsql_spark.plans.pipeline30 import _partial_stream

    _partial_stream(
        spark,
        sf_dir,
        prefix,
        cols=[
            F.col("event_type").alias("t"),
            F.coalesce(
                F.get_json_object("props", "$.k").cast("bigint") % 6,
                F.lit(-1).cast("bigint"),
            ).alias("b"),
        ],
        keys=["t", "b"],
        out_alias="o",
        suffix="cells",
    )


def _cramer_oracle() -> str:
    from icebergsql_spark.plans.pipeline39 import _CHI2_CELL, _CRAMER_BODY

    return _CRAMER_BODY.format(
        props_k="json_extract_string(props, '$.k')",
        src="events",
        cell=_CHI2_CELL,
        fold="list_sum(list(contrib ORDER BY t, b))",
    )


@register(
    "events_stream_cramers_v",
    oracle=_cramer_oracle(),
    doc="STREAMING twin of events_cramers_v: per-(type, bucket) "
    "contingency-cell count partials (SUM-mergeable) from 3 "
    "chronological micro-batches merge into the `cells` contract; "
    "the finalizer runs the IDENTICAL sorted-fold chi2 + V tail SQL "
    "(shared _CRAMER_TAIL_SQL template). The live "
    "feature-association monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cramers_v(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline39 import (
        _CHI2_CELL,
        _CRAMER_TAIL_SQL,
    )

    _cell_partial_stream(spark, sf_dir, "crv")
    return spark.sql(
        """
        WITH cells AS (
          SELECT t, b, CAST(o AS BIGINT) AS o
          FROM crv_cells
        ),"""
        + _CRAMER_TAIL_SQL.format(
            cell=_CHI2_CELL,
            fold=(
                "aggregate(array_sort(collect_list(struct(t, b, contrib))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
            ),
        )
    )


# ------------------------------------------------ Burrows' Delta --

_BD_TOPW = 30  # stylometric marker words (top by corpus frequency)
_BD_QSCALE = "100000000.0"  # 1e-8 relative-frequency units

# z numerator/denominator over ONCE-quantized relative frequencies:
# with q = ROUND(1e8 * c/n_s) exact bigint, z_{s,w} =
# (S*q - sum_s q) / sqrt(S*sum q^2 - (sum q)^2) has an exact bigint
# numerator and a per-WORD denominator, so |z1 - z2| =
# |num1 - num2| / sqrt(den_w) — each pair term is one double division,
# quantized ONCE to 1e-6 z-units, and the word sum is an exact bigint.
# Chain/final split (round-14): pipeline52's cosine variant reuses the
# z-score chain VERBATIM; the composed _BD_SQL stays
# character-identical to the r13 string.
_BD_CHAIN_SQL = """
        WITH tok AS (
          SELECT source, {tok} AS w FROM documents
        ),
        n_s AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n
          FROM tok GROUP BY source
        ),
        cw AS (
          SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        topw AS (
          SELECT w FROM (
            SELECT w, ROW_NUMBER() OVER (
              ORDER BY SUM(c) DESC, w) AS rnk
            FROM cw GROUP BY w
          ) r WHERE rnk <= {topw}
        ),
        dense AS (
          SELECT n_s.source, topw.w,
                 CAST(ROUND({qscale} * CAST(COALESCE(cw.c, 0) AS DOUBLE)
                      / CAST(n_s.n AS DOUBLE)) AS BIGINT) AS q
          FROM n_s CROSS JOIN topw
          LEFT JOIN cw ON cw.source = n_s.source AND cw.w = topw.w
        ),
        wstats AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS s,
                 CAST(SUM(q) AS BIGINT) AS sq,
                 CAST(SUM(q * q) AS BIGINT) AS sq2
          FROM dense GROUP BY w
        ),
        z AS (
          SELECT d.source, d.w,
                 ws.s * d.q - ws.sq AS num,
                 ws.s * ws.sq2 - ws.sq * ws.sq AS den
          FROM dense d JOIN wstats ws ON ws.w = d.w
        ),"""
_BD_FINAL_SQL = """
        pairs AS (
          SELECT a.source AS s1, b.source AS s2,
                 CASE WHEN a.den > 0
                      THEN CAST(ROUND(1000000.0
                             * CAST(abs(a.num - b.num) AS DOUBLE)
                             / sqrt(CAST(a.den AS DOUBLE)))
                           AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS t
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        )
        SELECT s1, s2, CAST(SUM(t) AS BIGINT) AS delta_q,
               CAST({topw} AS BIGINT) AS n_words
        FROM pairs GROUP BY s1, s2
        ORDER BY delta_q, s1, s2
"""
_BD_SQL = _BD_CHAIN_SQL + _BD_FINAL_SQL


@register(
    "text_burrows_delta",
    oracle=_BD_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))",
        topw=_BD_TOPW,
        qscale=_BD_QSCALE,
    ),
    doc="Burrows' Delta stylometric distance between every source pair "
    "over the top-30 corpus marker words: per-source relative "
    "frequencies are z-scored per word across sources and Delta = "
    "sum |z1 - z2| — the authorship/style-drift audit that flags a "
    "source whose register shifted (scraper broke, template changed) "
    "even when vocabulary overlap stays high. Determinism: relative "
    "frequencies quantized ONCE to exact 1e-8-unit bigints; the z "
    "numerator S*q - sum(q) and the per-word denominator "
    "S*sum(q^2) - (sum q)^2 are exact bigints, each pair term ONE "
    "double division quantized to 1e-6 z-units, the word sum exact "
    "(the quantize-once-then-SUM discipline). Scale shape: one "
    "(source, word) count, a 30-word x 20-source dense frame — "
    "pair matrix bounded by sources^2, never docs^2.",
    tags=("text", "curation", "stats"),
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    ).createOrReplaceTempView("documents")
    return spark.sql(
        _BD_SQL.format(
            tok="explode(split(trim(text), '\\\\s+'))",
            topw=_BD_TOPW,
            qscale=_BD_QSCALE,
        )
    )


# -------------------------------- diagonal Mahalanobis outliers --

# Per-dim variance would overflow bigint as n * sum(q^2) at larger n,
# so the variance composes FACTOR-WISE IN DOUBLE (lesson 6) while the
# per-dim z numerator q*n - sum(q) stays an exact bigint; each dim's
# contribution is one mirrored double expression quantized ONCE to
# 1e-6 units and the 64-dim sum is an exact bigint.
_MAHA_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round({emb_i} * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings {spine}
        ),
        stats AS (
          SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS sq,
                 CAST(SUM(q * q) AS BIGINT) AS sq2
          FROM xq GROUP BY pos
        ),
        terms AS (
          SELECT x.vid,
                 CAST(ROUND(1000000.0
                   * (CAST(x.q * s.n - s.sq AS DOUBLE)
                      * CAST(x.q * s.n - s.sq AS DOUBLE))
                   / (CAST(s.n AS DOUBLE) * CAST(s.sq2 AS DOUBLE)
                      - CAST(s.sq AS DOUBLE) * CAST(s.sq AS DOUBLE)))
                   AS BIGINT) AS t
          FROM xq x JOIN stats s ON s.pos = x.pos
        ),
        md AS (
          SELECT vid, CAST(SUM(t) AS BIGINT) AS md2_q
          FROM terms GROUP BY vid
        )
        SELECT vid, md2_q
        FROM md
        ORDER BY md2_q DESC, vid
        LIMIT 20
"""


@register(
    "emb_mahalanobis_diag",
    oracle=_MAHA_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g",
    ),
    doc="Top-20 diagonal-covariance Mahalanobis outliers over the "
    "embedding table: md2 = sum over dims of (x_i - mean_i)^2 / "
    "var_i — the variance-aware outlier score that, unlike raw "
    "Euclidean norms, doesn't let high-variance dimensions drown "
    "the signal; the cheap embedding-corpus anomaly screen before "
    "LOF's pairwise pass. The per-dim z numerator q*n - sum(q) is "
    "an exact bigint; the n-scaled variance composes factor-wise in "
    "DOUBLE (an integer n*sum(q^2) would pass the bigint ceiling at "
    "corpus n); each dim's term is one mirrored double expression "
    "quantized ONCE to 1e-6 units and the 64-dim sum is exact. "
    "Scale shape: one stats pass per dimension + one broadcast join "
    "back — O(n), no pairwise anything.",
    tags=("embeddings", "curation", "stats"),
)
def emb_mahalanobis_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _MAHA_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) g",
        )
    )
