"""Round-11 gate wave #11 (pipeline28): Friedman blocked rank test,
Benjamini-Yekutieli FDR under dependence, and the block-SSIM map.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------------ Friedman test --

# Within-day rank blocks: per day the five types rank among themselves
# (doubled average ranks stay integer under ties), so day-level traffic
# swings cancel — the blocked sibling of Kruskal-Wallis.  4*sum R_j^2
# is an exact bigint aggregate; chi2 and its tie-corrected form are
# single mirrored float expressions.
# tail shared with the streaming twin (plans/pipeline29.py::
# events_stream_friedman), which substitutes a merged-partials `cnt`
# head (types/days derive FROM cnt — same sets, since every type and
# day appears in some partial)
_FRIED_TAIL_SQL = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        ),
        ranked AS (
          SELECT event_type, day,
                 CAST(RANK() OVER (PARTITION BY day ORDER BY x)
                      AS BIGINT) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY day, x) AS BIGINT)
                   AS tcnt
          FROM daily
        ),
        r2j AS (
          SELECT event_type,
                 CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2_j
          FROM ranked GROUP BY event_type
        ),
        dims AS (
          SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM daily
        ),
        s AS (
          SELECT CAST(SUM(r2_j * r2_j) AS BIGINT) AS s4 FROM r2j
        ),
        ties AS (
          SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY day, x
          ) g
        ),
        calc AS (
          SELECT d.n, d.k, s.s4, t.tie_term,
                 3.0 * CAST(s.s4 AS DOUBLE)
                   / (CAST(d.n AS DOUBLE) * CAST(d.k AS DOUBLE)
                      * CAST(d.k + 1 AS DOUBLE))
                 - 3.0 * CAST(d.n AS DOUBLE)
                   * CAST(d.k + 1 AS DOUBLE) AS chi2_raw
          FROM dims d CROSS JOIN s CROSS JOIN ties t
        )
        SELECT r.event_type, r.r2_j, c.n, c.k, c.s4, c.tie_term,
               c.chi2_raw,
               CASE WHEN c.n * c.k * (c.k * c.k - 1) > c.tie_term
                    THEN c.chi2_raw
                         / (1.0 - CAST(c.tie_term AS DOUBLE)
                                  / CAST(c.n * c.k * (c.k * c.k - 1)
                                         AS DOUBLE))
               END AS chi2_corrected
        FROM r2j r CROSS JOIN calc c
        ORDER BY r.event_type
"""

_FRIED_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),
"""
    + _FRIED_TAIL_SQL
)


@register(
    "events_friedman_test",
    oracle=_FRIED_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Friedman blocked rank test across the five event types, days "
    "as blocks: per day the types rank among THEMSELVES (doubled "
    "average ranks keep ties integer-exact), so global day-level "
    "traffic swings — which inflate Kruskal-Wallis — cancel entirely, "
    "and what remains is whether the type ORDERING is consistent "
    "day after day. 4*sum R_j^2 is an exact bigint aggregate (no "
    "float-sum hazard: it is an integer SUM, not a fraction sum), "
    "chi2 and the tie-corrected form are single mirrored float "
    "expressions with a degeneracy guard. The within-subject "
    "nonparametric ANOVA — the right test when blocks differ wildly "
    "in level. Scale shape: one (type, day) count on a spine, one "
    "per-day rank window over 5 rows.",
    tags=("events", "stats"),
)
def events_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_fr")
    return spark.sql(
        _FRIED_SQL.format(day_expr="ts DIV 86400000000000", src="ev_fr")
    )


# ------------------------------------- Benjamini-Yekutieli FDR --

# BH thresholds shrunk by c(m) = H_m = sum 1/i (m = 5 -> 137/60): the
# FDR procedure that stays valid under ARBITRARY dependence between
# the hypotheses.  Same |z| machinery as events_bh_fdr — the oracle
# and the Spark side reuse pipeline19's shared SQL with a different
# quantile ladder: Phi^-1(1 - 0.05 r / (10 H_5)).
_BY_CRIT = {
    1: "2.8494446857227573",
    2: "2.6213151816808087",
    3: "2.4799878454651276",
    4: "2.375646258504699",
    5: "2.2921357641631146",
}


def _by_oracle() -> str:
    from icebergsql_spark.plans.pipeline19 import _BH_SQL

    return _BH_SQL.format(
        src="events",
        c1=_BY_CRIT[1],
        c2=_BY_CRIT[2],
        c3=_BY_CRIT[3],
        c4=_BY_CRIT[4],
        c5=_BY_CRIT[5],
    )


@register(
    "events_by_fdr",
    oracle=_by_oracle(),
    doc="Benjamini-Yekutieli FDR control over the per-event-type A/B "
    "battery (Benjamini & Yekutieli 2001): the BH step-up rule with "
    "every threshold shrunk by c(m) = H_m = 1 + 1/2 + ... + 1/m "
    "(137/60 for five hypotheses), which keeps the FDR guarantee "
    "under ARBITRARY dependence between the tests — the honest "
    "choice here, where the five per-type metrics share the same "
    "users and are anything but independent. Reuses the exact-bigint "
    "z machinery and step-up tail of events_bh_fdr verbatim "
    "(pipeline19 shared SQL) with the H_5-corrected quantile ladder; "
    "comparing the two gates' rejected columns shows exactly what "
    "the dependence tax costs.",
    tags=("events", "stats"),
)
def events_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline19 import _BH_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_by")
    return spark.sql(
        _BH_SQL.format(
            src="ev_by",
            c1=_BY_CRIT[1],
            c2=_BY_CRIT[2],
            c3=_BY_CRIT[3],
            c4=_BY_CRIT[4],
            c5=_BY_CRIT[5],
        )
    )


# --------------------------------------------- block-SSIM map --

# 8x8 blocks over the 16x16 fixture (4 per image): per-block SSIM from
# exact sufficient statistics, quantized to ppm; the per-pair mean is
# then an exact shifted integer division (block count 4, values can be
# negative -> shift non-negative before DIV, the ml.py OFFSET rule).
_SSIMB_TAIL_SQL = """
        pairs AS (
          SELECT 'variant' AS pair_type, doc_id AS a,
                 doc_id + 16 AS b
          FROM docs
          WHERE (doc_id {div} 16) % 2 = 0 AND doc_id + 16 < {maxd}
          UNION ALL
          SELECT 'cross' AS pair_type, doc_id AS a, doc_id + 1 AS b
          FROM docs
          WHERE (doc_id {div} 16) % 2 = 0 AND doc_id % 16 < 15
            AND doc_id + 1 < {maxd}
        ),
        st AS (
          SELECT p.pair_type, p.a, p.b,
                 CAST((x.p {div} 16) {div} 8 * 2
                      + (x.p % 16) {div} 8 AS INTEGER) AS blk,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x.g) AS BIGINT) AS sx,
                 CAST(SUM(y.g) AS BIGINT) AS sy,
                 CAST(SUM(x.g * x.g) AS BIGINT) AS sxx,
                 CAST(SUM(y.g * y.g) AS BIGINT) AS syy,
                 CAST(SUM(x.g * y.g) AS BIGINT) AS sxy
          FROM pairs p
          JOIN gray x ON x.doc_id = p.a
          JOIN gray y ON y.doc_id = p.b AND y.p = x.p
          GROUP BY 1, 2, 3, 4
        ),
        bq AS (
          SELECT pair_type, a, b, blk,
                 CAST(ROUND(1000000.0 *
                 ((2.0 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                   + {c1})
                  * (2.0 * ((CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                               / CAST(n AS DOUBLE))
                            / CAST(n AS DOUBLE))
                     + {c2}))
                 / (((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                     + (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                     + {c1})
                    * (((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                       + ((CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                             / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                       + {c2}))) AS BIGINT) AS ssim_ppm
          FROM st
        ),
        per_pair AS (
          SELECT pair_type, a, b,
                 CAST((SUM(ssim_ppm) + 4000000) {div} 4 - 1000000
                      AS BIGINT) AS mean_ppm,
                 CAST(MIN(ssim_ppm) AS BIGINT) AS worst_blk_ppm,
                 CAST(SUM(CASE WHEN ssim_ppm = 1000000
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_perfect_blocks
          FROM bq GROUP BY 1, 2, 3
        )
        SELECT pair_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(mean_ppm) AS BIGINT) AS min_mean_ppm,
               CAST(MAX(mean_ppm) AS BIGINT) AS max_mean_ppm,
               CAST(MIN(worst_blk_ppm) AS BIGINT) AS min_worst_ppm,
               CAST(MIN(n_perfect_blocks) AS BIGINT) AS min_perfect,
               CAST(MAX(n_perfect_blocks) AS BIGINT) AS max_perfect
        FROM per_pair
        GROUP BY pair_type
        ORDER BY pair_type
"""

_SSIMB_MAX_DOC = 500


def _ssimb_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _PHASH_PERT_PIXEL
    from icebergsql_spark.plans.pipeline25 import _SSIM_C1, _SSIM_C2

    pix = _PHASH_PERT_PIXEL.format(i="i.i", div="//")
    return (
        f"""
        WITH docs AS (
          SELECT doc_id FROM documents WHERE doc_id < {_SSIMB_MAX_DOC}
        ),
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i, {pix} AS v
          FROM docs
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, CAST(i // 3 AS INTEGER) AS p,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2
        ),
"""
        + _SSIMB_TAIL_SQL.format(
            div="//", maxd=_SSIMB_MAX_DOC, c1=_SSIM_C1, c2=_SSIM_C2
        )
    )


@register(
    "multimodal_image_ssim_blocks",
    oracle=_ssimb_oracle(),
    doc="Block-SSIM map (the windowed form of Wang et al. 2004, the one "
    "production SSIM actually is): per pair, SSIM over each 8x8 "
    "block from exact bigint sufficient statistics, quantized to ppm "
    "once — the per-pair mean is then an exact shifted integer "
    "division and every rollup is integer-exact. The map LOCALIZES "
    "damage the global gate averages away: a variant pair's three "
    "untouched blocks score EXACTLY 1e6 ppm (bitwise-identical "
    "pixels hit the SSIM fixed point exactly) while the perturbed "
    "top-left block drops — min_perfect/max_perfect separate variant "
    "pairs (3 perfect blocks) from cross-class pairs (0) with zero "
    "tolerance. Scale shape identical to the global gate: one pixel "
    "equi-join, one (pair, block) aggregate.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_ssim_blocks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_pixels
    from icebergsql_spark.plans.pipeline16 import _pert_blobs
    from icebergsql_spark.plans.pipeline25 import _SSIM_C1, _SSIM_C2
    from icebergsql_spark.plans.registry import load_tables

    image_gray_pixels(
        _pert_blobs(spark, sf_dir, _SSIMB_MAX_DOC)
    ).createOrReplaceTempView("gray")
    (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _SSIMB_MAX_DOC)
        .select("doc_id")
    ).createOrReplaceTempView("docs")
    return spark.sql(
        "WITH "
        + _SSIMB_TAIL_SQL.format(
            div="DIV", maxd=_SSIMB_MAX_DOC, c1=_SSIM_C1, c2=_SSIM_C2
        ).lstrip()
    )
