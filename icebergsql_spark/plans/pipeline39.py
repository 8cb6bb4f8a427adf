"""Round-13 gate wave #1 (pipeline39): Hurst R/S rescaled-range table,
Cramér's V effect size, the seasonal-strength streaming twin, and
image histogram entropy.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------------ Hurst R/S table --

# Exact-integer rescaled range per chunk: with w-scaled cumulative
# deviations nZ_k = w * cumsum_k - k * chunk_sum (exact bigint), the
# range R = (max nZ - min nZ) / w and the population sd
# S = sqrt(w * sum(x^2) - sum(x)^2) / w, so R/S = r_scaled / sqrt(ss_n)
# — one double division over two exact integers, bit-identical
# engines-wise.  The log-log slope (the Hurst exponent itself) is
# hill-rule territory (ln is 1-ulp fragile), so the gate anchors on
# the exact integers and leaves the regression to the consumer.
_HURST_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_HURST_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day) - 1 AS rk
          FROM daily
        ),
        chunked AS (
          SELECT w.w, i.event_type, i.x, i.rk,
                 i.rk {div} w.w AS chunk,
                 i.rk % w.w + 1 AS k
          FROM idx i
          CROSS JOIN (SELECT r AS w
                      FROM (VALUES (5), (10), (15), (30)) AS t(r)) w
        ),
        cum AS (
          SELECT w, event_type, chunk, k, x,
                 CAST(SUM(x) OVER (
                   PARTITION BY event_type, w, chunk
                   ORDER BY rk) AS BIGINT) AS cum_k,
                 CAST(SUM(x) OVER (
                   PARTITION BY event_type, w, chunk) AS BIGINT)
                   AS chunk_sum,
                 CAST(SUM(x * x) OVER (
                   PARTITION BY event_type, w, chunk) AS BIGINT)
                   AS chunk_sumsq,
                 COUNT(*) OVER (
                   PARTITION BY event_type, w, chunk) AS chunk_n
          FROM chunked
        ),
        z AS (
          SELECT w, event_type, chunk, chunk_sum, chunk_sumsq,
                 w * cum_k - k * chunk_sum AS nz
          FROM cum WHERE chunk_n = w
        ),
        per_chunk AS (
          SELECT w, event_type, chunk,
                 CAST(MAX(nz) - MIN(nz) AS BIGINT) AS r_scaled,
                 CAST(MAX(w * chunk_sumsq - chunk_sum * chunk_sum)
                      AS BIGINT) AS ss_n
          FROM z GROUP BY w, event_type, chunk
        )
        SELECT event_type, CAST(w AS BIGINT) AS w,
               CAST(chunk AS BIGINT) AS chunk, r_scaled, ss_n,
               CASE WHEN ss_n > 0
                    THEN CAST(r_scaled AS DOUBLE)
                         / sqrt(CAST(ss_n AS DOUBLE))
                    ELSE CAST(0.0 AS DOUBLE) END AS rs
        FROM per_chunk
        ORDER BY event_type, w, chunk
"""
_HURST_SQL = _HURST_HEAD_SQL + _HURST_TAIL_SQL


@register(
    "events_hurst",
    oracle=_HURST_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Hurst rescaled-range (R/S) table per event type over the "
    "30-day daily-count series, at chunk sizes w = 5/10/15/30: "
    "long-range-dependence diagnostics for a metrics pipeline "
    "(H > 0.5 persistent, < 0.5 mean-reverting). Every chunk's "
    "range of w-scaled cumulative deviations (r_scaled) and "
    "n-scaled variance (ss_n = w*sum(x^2) - sum(x)^2) are EXACT "
    "bigints; R/S = r_scaled / sqrt(ss_n) is one double division "
    "(bit-identical engines-wise; zero-variance chunks pin rs = 0 "
    "since R = 0 too). The log-log slope — the Hurst exponent "
    "itself — is deliberately NOT emitted (ln is hill-rule "
    "territory); the exact integers anchor it. Scale shape: one "
    "(type, day) count, window functions over 30-row partitions, "
    "no joins beyond a 4-row spine.",
    tags=("events", "stats"),
)
def events_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_hurst")
    return spark.sql(
        _HURST_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_hurst", div="DIV"
        )
    )


# ------------------------------------------------- Cramér's V --

# Per-cell chi-square contribution (pipeline8 discipline): the residual
# O*N - r*c is exact bigint; the contribution is a textually identical
# IEEE expression and the cell sum runs as a sorted fold.
_CHI2_CELL = (
    "CAST((o * n - r * c) AS DOUBLE) * CAST((o * n - r * c) AS DOUBLE)"
    " / CAST(n * r * c AS DOUBLE)"
)

_CRAMER_HEAD_SQL = """
        WITH base AS (
          -- COALESCE to a -1 sentinel: a NULL bucket (missing props.k)
          -- would be counted in rows_/tot margins yet silently dropped
          -- from the chi2 contributions by JOIN ... USING (b) (NULL
          -- never equi-joins) — mirrored in BOTH engines, so the oracle
          -- could not flag the skew (r13 ADVICE; vacuous-wave class).
          SELECT event_type AS t,
                 COALESCE(CAST({props_k} AS BIGINT) % 6, -1) AS b
          FROM {src}
        ),
        cells AS (
          SELECT t, b, CAST(COUNT(*) AS BIGINT) AS o
          FROM base GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `cells` CTE boundary; composed batch string character-identical).
_CRAMER_TAIL_SQL = """
        rows_ AS (
          SELECT t, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1
        ),
        cols_ AS (
          SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        contribs AS (
          SELECT cells.t, cells.b,
                 {cell} AS contrib
          FROM cells
          JOIN rows_ USING (t) JOIN cols_ USING (b) CROSS JOIN tot
        ),
        dims AS (
          SELECT CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS n_rows,
                 CAST((SELECT COUNT(*) FROM cols_) AS BIGINT) AS n_cols,
                 (SELECT n FROM tot) AS n
        ),
        chi AS (
          SELECT {fold} AS chi2 FROM contribs
        )
        SELECT d.n_rows, d.n_cols, d.n,
               CAST(LEAST(d.n_rows - 1, d.n_cols - 1) AS BIGINT)
                 AS min_dim,
               CAST(round(c.chi2 * 1000000.0) AS BIGINT) AS chi2_micro,
               sqrt(c.chi2 / (CAST(d.n AS DOUBLE)
                    * CAST(LEAST(d.n_rows - 1, d.n_cols - 1) AS DOUBLE)))
                 AS cramers_v
        FROM dims d CROSS JOIN chi c
"""
_CRAMER_BODY = _CRAMER_HEAD_SQL + _CRAMER_TAIL_SQL


@register(
    "events_cramers_v",
    oracle=_CRAMER_BODY.format(
        props_k="json_extract_string(props, '$.k')",
        src="events",
        cell=_CHI2_CELL,
        fold="list_sum(list(contrib ORDER BY t, b))",
    ),
    doc="Cramér's V effect size between event_type and a props-derived "
    "category (k % 6): V = sqrt(chi2 / (N * min(r-1, c-1))) in [0, 1] "
    "— the NORMALIZED association strength chi2 alone doesn't give "
    "(chi2 grows with N; V is comparable across tables and corpus "
    "sizes, the number a feature-leakage audit actually thresholds). "
    "Per-cell residual O*N - r*c exact bigint, contribution a "
    "textually identical IEEE expression summed in a (t, b)-SORTED "
    "fold (the pipeline8 chi2 discipline); V is one mirrored "
    "sqrt-of-division over that sum and exact integers. chi2_micro "
    "is the exact-anchored check column. Scale shape: contingency "
    "table is |types| x 6 regardless of volume.",
    tags=("events", "stats"),
)
def events_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("events",))[
        "events"
    ].createOrReplaceTempView("ev_cramer")
    return spark.sql(
        _CRAMER_BODY.format(
            props_k="get_json_object(props, '$.k')",
            src="ev_cramer",
            cell=_CHI2_CELL,
            fold=(
                "aggregate(array_sort(collect_list(struct(t, b, contrib))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
            ),
        )
    )


# --------------------------- seasonal-strength streaming twin --


def _ss_oracle() -> str:
    from icebergsql_spark.plans.pipeline38 import _SS_SQL

    return _SS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_seasonal_strength",
    oracle=_ss_oracle(),
    doc="STREAMING twin of events_seasonal_strength: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract (phase = day % 7 "
    "recomputed from the merged days); the finalizer runs the "
    "IDENTICAL quantized-residual tail SQL (shared _SS_TAIL_SQL "
    "template). The live weekly-rhythm monitor converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline38 import _SS_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "ssn")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, day % 7 AS phase,
                 CAST(x AS BIGINT) AS x
          FROM ssn_daily
        ),"""
        + _SS_TAIL_SQL
    )


# ------------------------------------- image histogram entropy --

# Fixed-order ln fold over the 8 histogram buckets: each term is a
# textually identical IEEE expression and the 8 additions run
# left-to-right in ONE expression, so the float order is pinned by the
# text itself (no engine-dependent aggregation order).
_ENT_TERMS = " + ".join(
    f"CASE WHEN h{k} > 0 THEN CAST(h{k} AS DOUBLE)"
    f" * ln(CAST(h{k} AS DOUBLE)) ELSE CAST(0.0 AS DOUBLE) END"
    for k in range(8)
)
_ENT_SUMSQ = " + ".join(f"h{k} * h{k}" for k in range(8))
_ENT_N = " + ".join(f"h{k}" for k in range(8))


def _entropy_oracle() -> str:
    from icebergsql_spark.plans.pipeline16 import _hist_cte

    return f"""
        WITH {_hist_cte()},
        classes AS (
          SELECT h0, h1, h2, h3, h4, h5, h6, h7,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hist
          GROUP BY h0, h1, h2, h3, h4, h5, h6, h7
        )
        SELECT rep, n_docs,
               CAST({_ENT_N} AS BIGINT) AS n,
               CAST({_ENT_SUMSQ} AS BIGINT) AS sum_sq,
               CAST(1000000 * ({_ENT_SUMSQ})
                    // (({_ENT_N}) * ({_ENT_N})) AS BIGINT) AS coll_ppm,
               CAST(ROUND((ln(CAST({_ENT_N} AS DOUBLE))
                 - ({_ENT_TERMS}) / CAST({_ENT_N} AS DOUBLE))
                 * 1000.0) AS BIGINT) AS entropy_mnat
        FROM classes
        ORDER BY rep
    """


@register(
    "multimodal_image_entropy",
    oracle=_entropy_oracle(),
    doc="Per-image-class luminance-histogram entropy over REAL decoded "
    "bytes (netpbm P6 / 24-bit BMP): the low-information-content "
    "screen (near-zero entropy = flat/synthetic frames, high = "
    "textured) a multimodal curation pass runs before expensive "
    "models. Exact anchors per the hill rule: sum_sq = sum h_k^2 "
    "and coll_ppm = 1e6 * sum_sq DIV n^2 (the Renyi-2 collision "
    "rate) are exact bigints; entropy_mnat quantizes "
    "ln(n) - sum(h ln h)/n ONCE to millinats (raw doubles measured a "
    "REAL JVM-vs-glibc ln 1-ulp divergence on this very fixture; the "
    "fixed-order 8-term fold pins summation order and every class "
    "value sits >= 0.05 millinats from a rounding boundary, audited "
    "offline, so a ulp cannot flip the bigint). Classes (distinct "
    "signatures) bound the row count, not the corpus. Oracle replays "
    "the fixture's pixel formula.",
    tags=("multimodal", "curation"),
)
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_histogram
    from icebergsql_spark.plans.pipeline16 import _HIST_MAX_DOC, _pert_blobs

    hist = image_gray_histogram(_pert_blobs(spark, sf_dir, _HIST_MAX_DOC))
    hist.createOrReplaceTempView("img_ent_hist")
    return spark.sql(f"""
        WITH classes AS (
          SELECT h0, h1, h2, h3, h4, h5, h6, h7,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM img_ent_hist
          GROUP BY h0, h1, h2, h3, h4, h5, h6, h7
        )
        SELECT rep, n_docs,
               CAST({_ENT_N} AS BIGINT) AS n,
               CAST({_ENT_SUMSQ} AS BIGINT) AS sum_sq,
               CAST(1000000 * ({_ENT_SUMSQ})
                    DIV (({_ENT_N}) * ({_ENT_N})) AS BIGINT) AS coll_ppm,
               CAST(ROUND((ln(CAST({_ENT_N} AS DOUBLE))
                 - ({_ENT_TERMS}) / CAST({_ENT_N} AS DOUBLE))
                 * 1000.0) AS BIGINT) AS entropy_mnat
        FROM classes
        ORDER BY rep
    """)
