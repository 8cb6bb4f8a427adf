"""Round-11 gate wave #8 (pipeline25): pairwise image SSIM/MSE over
real decoded pixels, and Holm-Bonferroni step-down multiple testing.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ----------------------------------------------- pairwise SSIM/MSE --

_SSIM_MAX_DOC = 500
# standard SSIM stabilizers at L = 765 (gray = R+G+B):
# C1 = (0.01 L)^2, C2 = (0.03 L)^2 — fixed literals on both engines
_SSIM_C1 = "58.5225"
_SSIM_C2 = "526.7025"

# tail consumes gray(doc_id, p, g); pair spine and all algebra are
# identical on both engines (exact bigint sufficient statistics; the
# SSIM/MSE expressions are mirrored float over them)
_SSIM_TAIL_SQL = """
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
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x.g) AS BIGINT) AS sx,
                 CAST(SUM(y.g) AS BIGINT) AS sy,
                 CAST(SUM(x.g * x.g) AS BIGINT) AS sxx,
                 CAST(SUM(y.g * y.g) AS BIGINT) AS syy,
                 CAST(SUM(x.g * y.g) AS BIGINT) AS sxy,
                 CAST(SUM((x.g - y.g) * (x.g - y.g)) AS BIGINT) AS sse
          FROM pairs p
          JOIN gray x ON x.doc_id = p.a
          JOIN gray y ON y.doc_id = p.b AND y.p = x.p
          GROUP BY 1, 2, 3
        ),
        ssim AS (
          SELECT pair_type, a, b, n, sse,
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
                       + {c2})) AS s
          FROM st
        )
        SELECT pair_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(sse) AS BIGINT) AS sum_sse,
               CAST(MIN(sse) AS BIGINT) AS min_sse,
               CAST(MAX(sse) AS BIGINT) AS max_sse,
               MIN(s) AS min_ssim,
               MAX(s) AS max_ssim
        FROM ssim
        GROUP BY pair_type
        ORDER BY pair_type
"""


def _ssim_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _PHASH_PERT_PIXEL

    pix = _PHASH_PERT_PIXEL.format(i="i.i", div="//")
    return (
        f"""
        WITH docs AS (
          SELECT doc_id FROM documents WHERE doc_id < {_SSIM_MAX_DOC}
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
        + _SSIM_TAIL_SQL.format(
            div="//", maxd=_SSIM_MAX_DOC, c1=_SSIM_C1, c2=_SSIM_C2
        )
    )


@register(
    "multimodal_image_ssim",
    oracle=_ssim_oracle(),
    doc="Pairwise SSIM + MSE over REAL decoded pixels (Wang et al. "
    "2004): the perceptual similarity tier between histogram L1 and "
    "pHash — per pair, global SSIM over the luminance plane from "
    "exact bigint sufficient statistics (operators/multimodal.py::"
    "image_gray_pixels equi-joined on the pixel index; population "
    "variance/covariance with the standard C1/C2 stabilizer "
    "literals), plus the exact integer sum of squared errors. The "
    "fixture pairs each base image with its +96-gray 4-pixel variant "
    "(SSIM near 1, SSE exactly 4*96^2 = 36864) and with an adjacent "
    "DIFFERENT class (lower SSIM, large SSE) — the rollup separates "
    "the tiers with exact integer evidence next to the mirrored "
    "float SSIM extremes. Scale shape: pair spine is arithmetic, "
    "the pixel equi-join shuffles on doc_id — thumbnails keep it "
    "tiny per pair at any corpus size.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_ssim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_pixels
    from icebergsql_spark.plans.pipeline16 import _pert_blobs
    from icebergsql_spark.plans.registry import load_tables

    image_gray_pixels(
        _pert_blobs(spark, sf_dir, _SSIM_MAX_DOC)
    ).createOrReplaceTempView("gray")
    (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _SSIM_MAX_DOC)
        .select("doc_id")
    ).createOrReplaceTempView("docs")
    return spark.sql(
        "WITH "
        + _SSIM_TAIL_SQL.format(
            div="DIV", maxd=_SSIM_MAX_DOC, c1=_SSIM_C1, c2=_SSIM_C2
        ).lstrip()
    )


# --------------------------------------- Holm-Bonferroni step-down --

# Phi^-1(1 - 0.05 / (2 * (m - r + 1))) for m = 5 hypotheses: rank 1
# tests against the full Bonferroni threshold, the last rank against
# the nominal one.  Fixed stdlib-NormalDist quantiles, consumed as
# identical literals by both engines (the Lan-DeMets discipline).
_HOLM_CRIT = {
    1: "2.5758293035489",
    2: "2.4977054744123737",
    3: "2.3939797998185104",
    4: "2.2414027276049464",
    5: "1.9599639845400536",
}

_HOLM_SQL = """
        WITH ev AS (
          SELECT user_id, event_type FROM {src}
        ),
        users AS (
          SELECT DISTINCT user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm
          FROM ev
        ),
        armn AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n
          FROM users GROUP BY arm
        ),
        ucnt AS (
          SELECT event_type, user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2, 3
        ),
        g AS (
          SELECT event_type, arm,
                 CAST(SUM(c) AS BIGINT) AS s,
                 CAST(SUM(c * c) AS BIGINT) AS ss
          FROM ucnt GROUP BY 1, 2
        ),
        wide AS (
          SELECT g.event_type,
                 MAX(CASE WHEN g.arm = 0 THEN g.s END) AS s0,
                 MAX(CASE WHEN g.arm = 0 THEN g.ss END) AS ss0,
                 MAX(CASE WHEN g.arm = 1 THEN g.s END) AS s1,
                 MAX(CASE WHEN g.arm = 1 THEN g.ss END) AS ss1,
                 MAX(CASE WHEN a.arm = 0 THEN a.n END) AS n0,
                 MAX(CASE WHEN a.arm = 1 THEN a.n END) AS n1
          FROM g CROSS JOIN armn a
          GROUP BY g.event_type
        ),
        z AS (
          SELECT event_type, n0, n1, s0, s1,
                 abs(
                   (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / sqrt(
                       ((CAST(ss1 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n1 AS DOUBLE))
                        / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
                     + ((CAST(ss0 AS DOUBLE)
                         - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                           / CAST(n0 AS DOUBLE))
                        / CAST(n0 - 1 AS DOUBLE)) / CAST(n0 AS DOUBLE)
                   )
                 ) AS absz
          FROM wide
        ),
        ranked AS (
          SELECT z.*,
                 CAST(row_number() OVER (ORDER BY absz DESC, event_type)
                      AS BIGINT) AS rk
          FROM z
        ),
        crit AS (
          SELECT ranked.*,
                 CASE rk WHEN 1 THEN CAST({c1} AS DOUBLE)
                         WHEN 2 THEN CAST({c2} AS DOUBLE)
                         WHEN 3 THEN CAST({c3} AS DOUBLE)
                         WHEN 4 THEN CAST({c4} AS DOUBLE)
                         WHEN 5 THEN CAST({c5} AS DOUBLE) END AS z_crit
          FROM ranked
        ),
        stopfail AS (
          SELECT MIN(CASE WHEN absz < z_crit THEN rk END) AS rfail
          FROM crit
        )
        SELECT crit.event_type, crit.rk, crit.n0, crit.n1,
               crit.s0, crit.s1, crit.absz, crit.z_crit,
               CAST(CASE WHEN stopfail.rfail IS NULL
                         OR crit.rk < stopfail.rfail
                    THEN 1 ELSE 0 END AS INTEGER) AS rejected
        FROM crit CROSS JOIN stopfail
        ORDER BY crit.rk
"""


@register(
    "events_holm_bonferroni",
    oracle=_HOLM_SQL.format(
        src="events",
        c1=_HOLM_CRIT[1],
        c2=_HOLM_CRIT[2],
        c3=_HOLM_CRIT[3],
        c4=_HOLM_CRIT[4],
        c5=_HOLM_CRIT[5],
    ),
    doc="Holm-Bonferroni STEP-DOWN over the per-event-type A/B battery "
    "(Holm 1979) — the family-wise-error sibling of the BH step-up "
    "gate: same Welch-style |z| per type from exact bigint "
    "sufficient statistics, ranks tested strictly in order against "
    "Phi^-1(1 - 0.05/(2(m - r + 1))) (fixed quantile literals), and "
    "testing STOPS at the first failure — everything below the "
    "first failing rank is retained even if its own threshold would "
    "pass (the sequentially-rejective rule that makes Holm uniformly "
    "more powerful than plain Bonferroni while controlling FWER, "
    "not just FDR). Mirrored sqrt/div floats, deterministic "
    "(absz, type) rank order, NULL-safe when every rank passes.",
    tags=("events", "stats"),
)
def events_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_holm")
    return spark.sql(
        _HOLM_SQL.format(
            src="ev_holm",
            c1=_HOLM_CRIT[1],
            c2=_HOLM_CRIT[2],
            c3=_HOLM_CRIT[3],
            c4=_HOLM_CRIT[4],
            c5=_HOLM_CRIT[5],
        )
    )
