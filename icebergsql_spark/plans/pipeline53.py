"""Round-14 gate wave #3 (pipeline53): Cohen's kappa, Kendall tau-b
between type series, Hellinger hour-of-day distance, Nelson-Aalen
cumulative hazard, embedding triplet-margin audit, label-centroid
cosines, audio spectral centroid, and partial correlation.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; the kappa / tau-b /
partial-correlation algebra is locked against independent pure-Python
replicas in tests/test_round14_formulas.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ---------------------------------------------------- Cohen's kappa --

# Inter-rater agreement between two binary event features: rater A =
# props.k parity, rater B = morning/afternoon (hod < 12). kappa =
# (po - pe) / (1 - pe) multiplied through by n^2 is an EXACT integer
# fraction: num = n*agree - (ra0*rb0 + (n-ra0)*(n-rb0)), den = n^2 -
# (same expected-agreement term) — chance-corrected agreement with no
# floats until the final mirrored division.
_KAPPA_HEAD_SQL = """
        WITH base AS (
          SELECT event_type,
                 COALESCE(CAST({props_k} AS BIGINT) % 2, -1) AS ra,
                 CASE WHEN (({hour_expr}) % 24) < 12 THEN 0 ELSE 1 END
                   AS rb
          FROM {src}
        ),
        cells AS (
          SELECT event_type, ra, rb, CAST(COUNT(*) AS BIGINT) AS c
          FROM base GROUP BY 1, 2, 3
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `cells` CTE boundary — (type, ra, rb) cell counts are SUM-mergeable).
_KAPPA_TAIL_SQL = """
        agg AS (
          SELECT event_type,
                 CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN ra = rb THEN c ELSE 0 END)
                      AS BIGINT) AS agree,
                 CAST(SUM(CASE WHEN ra = 0 THEN c ELSE 0 END)
                      AS BIGINT) AS ra0,
                 CAST(SUM(CASE WHEN rb = 0 THEN c ELSE 0 END)
                      AS BIGINT) AS rb0
          FROM cells WHERE ra >= 0
          GROUP BY event_type
        )
        SELECT event_type, n, agree, ra0, rb0,
               CAST(n * agree
                    - (ra0 * rb0 + (n - ra0) * (n - rb0)) AS BIGINT)
                 AS kappa_num,
               CAST(n * n
                    - (ra0 * rb0 + (n - ra0) * (n - rb0)) AS BIGINT)
                 AS kappa_den,
               CASE WHEN n * n
                         - (ra0 * rb0 + (n - ra0) * (n - rb0)) <> 0
                    THEN CAST(n * agree
                           - (ra0 * rb0 + (n - ra0) * (n - rb0))
                           AS DOUBLE)
                         / CAST(n * n
                           - (ra0 * rb0 + (n - ra0) * (n - rb0))
                           AS DOUBLE)
               END AS kappa
        FROM agg
        ORDER BY event_type
"""
_KAPPA_SQL = _KAPPA_HEAD_SQL + _KAPPA_TAIL_SQL


@register(
    "events_cohen_kappa",
    oracle=_KAPPA_SQL.format(
        props_k="json_extract_string(props, '$.k')",
        hour_expr="epoch_ns(ts) // 3600000000000",
        src="events",
    ),
    doc="Cohen's kappa inter-feature agreement per event type between "
    "two binary event features (props.k parity vs morning/afternoon) "
    "— the chance-corrected agreement score raw accuracy overstates "
    "when the marginals are skewed (the feature-redundancy audit a "
    "leakage pass thresholds). Multiplying (po - pe)/(1 - pe) "
    "through by n^2 makes kappa an EXACT integer fraction "
    "(kappa_num/kappa_den emitted); the float is one mirrored "
    "division. Missing props.k is COALESCEd to a -1 sentinel and "
    "excluded from BOTH numerator and margins (no margin-leak — the "
    "r13 NULL-bucket lesson). Scale shape: one narrow pass, "
    "per-type scalar aggregates.",
    tags=("events", "stats"),
)
def events_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_kappa")
    return spark.sql(
        _KAPPA_SQL.format(
            props_k="get_json_object(props, '$.k')",
            hour_expr="ts DIV 3600000000000",
            src="ev_kappa",
        )
    )


# ------------------------------------------------- Kendall tau-b --

# Rank correlation between two types' daily volume series without the
# normality Pearson assumes: over all day pairs i < j, C/D = sign
# agreements of (x_i - x_j)(y_i - y_j), tau-b corrects for ties via
# n1 = pairs tied in x, n2 = pairs tied in y. Everything through the
# counts is exact integer; tau-b = (C - D)/sqrt((n0-n1)(n0-n2)) is
# factor-wise double (locked against a groupwise-tie replica in
# tests/test_round14_formulas.py).
_TAU_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_TAU_TAIL_SQL = """
        pairjoin AS (
          SELECT a.event_type AS t1, b.event_type AS t2,
                 a.day, a.x AS x, b.x AS y
          FROM daily a
          JOIN daily b ON b.day = a.day
                      AND a.event_type < b.event_type
        ),
        pp AS (
          SELECT p.t1, p.t2,
                 CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) > 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS conc,
                 CAST(SUM(CASE WHEN (p.x - q.x) * (p.y - q.y) < 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                 CAST(SUM(CASE WHEN p.x = q.x AND p.y <> q.y
                          THEN 1 ELSE 0 END) AS BIGINT) AS tie_x,
                 CAST(SUM(CASE WHEN p.y = q.y AND p.x <> q.x
                          THEN 1 ELSE 0 END) AS BIGINT) AS tie_y,
                 CAST(SUM(CASE WHEN p.x = q.x AND p.y = q.y
                          THEN 1 ELSE 0 END) AS BIGINT) AS tie_xy,
                 CAST(COUNT(*) AS BIGINT) AS n0
          FROM pairjoin p
          JOIN pairjoin q ON q.t1 = p.t1 AND q.t2 = p.t2
                         AND q.day > p.day
          GROUP BY 1, 2
        )
        SELECT t1, t2, conc, disc, tie_x, tie_y, tie_xy, n0,
               CASE WHEN n0 - tie_x - tie_xy > 0
                         AND n0 - tie_y - tie_xy > 0
                    THEN CAST(conc - disc AS DOUBLE)
                         / (sqrt(CAST(n0 - tie_x - tie_xy AS DOUBLE))
                            * sqrt(CAST(n0 - tie_y - tie_xy
                                        AS DOUBLE)))
               END AS tau_b
        FROM pp
        ORDER BY t1, t2
"""
_TAU_SQL = _TAU_HEAD_SQL + _TAU_TAIL_SQL


@register(
    "events_kendall_tau",
    oracle=_TAU_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Kendall tau-b rank correlation between every pair of types' "
    "daily volume series — the tie-corrected, outlier-robust "
    "complement of events_autocorrelation's Pearson (a single burst "
    "day can flip Pearson's sign; tau counts order agreements): "
    "C/D/tie counts over all day pairs are exact bigints, tau-b one "
    "factor-wise double over them. Scale shape: volume enters one "
    "(type, day) count; the pair frame is 435 day-pairs per type "
    "pair, calendar-bounded at every SF.",
    tags=("events", "stats"),
)
def events_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_tau")
    return spark.sql(
        _TAU_SQL.format(day_expr="ts DIV 86400000000000", src="ev_tau")
    )


# --------------------------------------------- Hellinger distance --

# Pairwise Hellinger affinity between types' hour-of-day
# distributions: BC = sum_h sqrt(p_h * q_h); each term is one
# mirrored sqrt-of-ratio over exact integers, quantized ONCE to 1e-9
# units so the Bhattacharyya sum is an exact bigint; H^2 = 1 - BC is
# emitted as the mirrored double (no final sqrt — a near-zero H^2
# could go negative under per-term rounding, and the square is the
# thresholdable quantity anyway). Missing buckets contribute exact 0
# (sqrt(0 * q) = 0), so no dense frame is needed.
_HELL_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, (({hour_expr}) % 24) AS hod FROM {src}
        ),
        hist AS (
          SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `hist` CTE boundary — hourly count partials fold to hod bins).
_HELL_TAIL_SQL = """
        n_ AS (
          SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
          FROM hist GROUP BY 1
        ),
        pairs AS (
          SELECT a.event_type AS t1, b.event_type AS t2,
                 a.hod, a.c AS ca, b.c AS cb
          FROM hist a
          JOIN hist b ON b.hod = a.hod
                     AND a.event_type < b.event_type
        ),
        terms AS (
          SELECT p.t1, p.t2,
                 CAST(ROUND(1000000000.0
                      * sqrt(CAST(p.ca AS DOUBLE)
                             * CAST(p.cb AS DOUBLE))
                      / sqrt(CAST(na.n AS DOUBLE)
                             * CAST(nb.n AS DOUBLE))) AS BIGINT)
                   AS bc_t
          FROM pairs p
          JOIN n_ na ON na.event_type = p.t1
          JOIN n_ nb ON nb.event_type = p.t2
        )
        SELECT t1, t2,
               CAST(SUM(bc_t) AS BIGINT) AS bc_e9,
               CAST(1000000000 - SUM(bc_t) AS DOUBLE) / 1000000000.0
                 AS hellinger_sq
        FROM terms
        GROUP BY t1, t2
        ORDER BY t1, t2
"""
_HELL_SQL = _HELL_HEAD_SQL + _HELL_TAIL_SQL


@register(
    "events_hellinger_hod",
    oracle=_HELL_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    ),
    doc="Pairwise squared Hellinger distance between types' "
    "hour-of-day distributions — the bounded-in-[0,1] metric "
    "complement of the KL-family scores (JS shipped) and the "
    "smooth complement of events_type_emd's Wasserstein: Hellinger "
    "is a true metric, insensitive to zero buckets, and its square "
    "decomposes into per-bin Bhattacharyya terms — each one "
    "mirrored sqrt over exact integers, quantized ONCE to 1e-9 so "
    "the sum is an exact bigint anchor (bc_e9). Scale shape: one "
    "(type, hod) count, a 24-bin pair join.",
    tags=("events", "stats"),
)
def events_hellinger_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_hell")
    return spark.sql(
        _HELL_SQL.format(hour_expr="ts DIV 3600000000000", src="ev_hell")
    )


# ----------------------------------------- Nelson-Aalen hazard --

# Cumulative-hazard sibling of events_survival_km over the same
# inter-purchase gap frame as events_logrank_test (pooled arms, real
# right-censoring at dataset end): H(t) = sum_{t_i <= t} d_i / n_i.
# Each hazard increment is one mirrored double division over exact
# integers, quantized ONCE to 1e-9; the cumulative sum is then exact
# bigint arithmetic.
_NA_HEAD_SQL = """
        WITH pd AS (
          SELECT DISTINCT user_id, {day_expr} AS day
          FROM {src} WHERE event_type = 'purchase'
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `pd` CTE boundary — distinct (user, day) purchase sightings are
# set-mergeable, the stream_logrank pattern).
_NA_TAIL_SQL = """
        mx AS (SELECT MAX(day) AS m FROM pd),
        gaps AS (
          SELECT user_id, day,
                 lead(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS nxt
          FROM pd
        ),
        obs AS (
          SELECT CAST(COALESCE(nxt, mx.m) - day AS BIGINT) AS t,
                 CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
          FROM gaps CROSS JOIN mx
        ),
        times AS (SELECT DISTINCT t FROM obs WHERE ev = 1),
        risk AS (
          SELECT ti.t,
                 CAST(COUNT(*) AS BIGINT) AS r,
                 CAST(SUM(CASE WHEN o.t = ti.t AND o.ev = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS d
          FROM times ti JOIN obs o ON o.t >= ti.t
          GROUP BY ti.t
        ),
        na AS (
          SELECT t, d, r,
                 CAST(ROUND(1000000000.0 * CAST(d AS DOUBLE)
                      / CAST(r AS DOUBLE)) AS BIGINT) AS h_q
          FROM risk
        )
        SELECT t, d, r, h_q,
               CAST(SUM(h_q) OVER (ORDER BY t) AS BIGINT)
                 AS cum_hazard_q
        FROM na
        ORDER BY t
"""
_NA_SQL = _NA_HEAD_SQL + _NA_TAIL_SQL


@register(
    "events_nelson_aalen",
    oracle=_NA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Nelson-Aalen cumulative-hazard estimator over the "
    "inter-purchase gap frame shared with events_logrank_test "
    "(pooled arms, real right-censoring at dataset end): H(t) = "
    "sum of d_i/n_i over event times <= t — the additive-hazard "
    "view that complements events_survival_km's product-limit "
    "survival curve (NA is the one you difference for hazard-rate "
    "changepoints; exp(-H) is left to the consumer per the hill "
    "rule). Each increment is one mirrored double over exact "
    "integers quantized ONCE to 1e-9; the cumulative sum is exact "
    "bigint. Scale shape: event times are gap lengths in days — "
    "calendar-bounded at every SF.",
    tags=("events", "stats"),
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_na")
    return spark.sql(
        _NA_SQL.format(day_expr="ts DIV 86400000000000", src="ev_na")
    )


# ------------------------------------- embedding triplet margins --

# Metric-learning audit over the labeled embeddings: md5-deterministic
# triplets (anchor, same-label positive, next-label negative at the
# same md5 rank), squared distances in the exact integer q-space —
# a violation (d2_neg <= d2_pos) counts labels whose neighborhoods
# leak into the next class. All-integer; no floats anywhere.
_TRI_RANKS = 15

_TRI_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
          WHERE vec_id < 500
        ),
        ids AS (SELECT DISTINCT vid, label FROM xq),
        rk AS (
          SELECT vid, label,
                 ROW_NUMBER() OVER (PARTITION BY label
                   ORDER BY {h}, vid) AS r
          FROM ids
        ),
        labs AS (
          SELECT label,
                 ROW_NUMBER() OVER (ORDER BY label) AS lr,
                 COUNT(*) OVER () AS nl
          FROM (SELECT DISTINCT label FROM ids) z
        ),
        tri AS (
          SELECT a.vid AS av, p.vid AS pv, g.vid AS nv, a.label
          FROM rk a
          JOIN rk p ON p.label = a.label AND p.r = a.r + 1
          JOIN labs la ON la.label = a.label
          JOIN labs ln_ ON ln_.lr = (la.lr % la.nl) + 1
          JOIN rk g ON g.label = ln_.label AND g.r = a.r
          WHERE a.r <= {ranks}
        ),
        d2 AS (
          SELECT t.av, t.label,
                 CAST(SUM((xa.q - xp.q) * (xa.q - xp.q)) AS BIGINT)
                   AS dap,
                 CAST(SUM((xa.q - xn.q) * (xa.q - xn.q)) AS BIGINT)
                   AS dan
          FROM tri t
          JOIN xq xa ON xa.vid = t.av
          JOIN xq xp ON xp.vid = t.pv AND xp.pos = xa.pos
          JOIN xq xn ON xn.vid = t.nv AND xn.pos = xa.pos
          GROUP BY 1, 2
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_triplets,
               CAST(SUM(CASE WHEN dan <= dap THEN 1 ELSE 0 END)
                    AS BIGINT) AS violations,
               CAST(SUM(dan - dap) AS BIGINT) AS margin_sum,
               CAST(MIN(dan - dap) AS BIGINT) AS worst_margin
        FROM d2
        GROUP BY label
        ORDER BY label
"""


@register(
    "emb_triplet_margin_audit",
    oracle=_TRI_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
        h="md5('tri:' || CAST(vid AS VARCHAR))",
        ranks=_TRI_RANKS,
    ),
    doc="Triplet-margin audit over the labeled embeddings — the "
    "metric-learning health check a retrieval pipeline runs before "
    "trusting label-conditioned ANN: md5-deterministic triplets "
    "(anchor, same-label positive at the next md5 rank, next-label "
    "negative at the same rank), squared distances in the exact "
    "integer q-space, violation = negative at least as close as "
    "the positive. Per-label violation counts, margin sums and the "
    "worst margin are ALL exact bigints — no floats. Complements "
    "emb_knn_label_eval (which scores points; this scores MARGINS, "
    "the quantity triplet-loss training actually optimizes). Scale "
    "shape: md5-rank sampling bounds triplets per label at any "
    "corpus size.",
    tags=("embedding", "curation"),
)
def emb_triplet_margin_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _TRI_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT))"
            " AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64))"
            " AS i) g",
            h="md5(concat('tri:', CAST(vid AS STRING)))",
            ranks=_TRI_RANKS,
        )
    )


# --------------------------------------- label-centroid cosines --

# Pairwise cosine between per-label centroid DIRECTIONS: the n
# normalization cancels in cosine, so the un-normalized coordinate
# sums s_d = sum q_d are exact bigint sufficient statistics and the
# cosine is one factor-wise double over exact dot/norm integers.
# Label separability in one |labels|^2/2 table — the geometry the
# centroid classifier's accuracy depends on.
_LCC_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
        ),
        cs AS (
          SELECT label, pos, CAST(SUM(q) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM xq GROUP BY 1, 2
        ),
        dots AS (
          SELECT a.label AS l1, b.label AS l2,
                 CAST(SUM(a.s * b.s) AS BIGINT) AS dot
          FROM cs a JOIN cs b ON b.pos = a.pos AND a.label < b.label
          GROUP BY 1, 2
        ),
        norms AS (
          SELECT label, CAST(SUM(s * s) AS BIGINT) AS nrm,
                 CAST(MAX(n) AS BIGINT) AS n_vecs
          FROM cs GROUP BY 1
        )
        SELECT d.l1, d.l2, d.dot,
               n1.nrm AS norm1, n2.nrm AS norm2,
               n1.n_vecs AS n1_vecs, n2.n_vecs AS n2_vecs,
               CASE WHEN n1.nrm > 0 AND n2.nrm > 0
                    THEN CAST(d.dot AS DOUBLE)
                         / (sqrt(CAST(n1.nrm AS DOUBLE))
                            * sqrt(CAST(n2.nrm AS DOUBLE)))
               END AS centroid_cos
        FROM dots d
        JOIN norms n1 ON n1.label = d.l1
        JOIN norms n2 ON n2.label = d.l2
        ORDER BY d.l1, d.l2
"""


@register(
    "emb_label_centroid_cosines",
    oracle=_LCC_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
    ),
    doc="Pairwise cosine between per-label centroid directions — the "
    "label-separability matrix behind ml_centroid_classifier's "
    "accuracy and emb_label_centroid_shift's drift score: two "
    "labels with centroid cosine near 1 are indistinguishable to "
    "any centroid-based router. The n normalization cancels in "
    "cosine, so un-normalized coordinate sums are exact bigint "
    "sufficient statistics (dot and norms emitted exact; cosine "
    "one factor-wise double). Scale shape: one (label, dim) "
    "aggregate then a |labels|^2 x 64 join — volume enters only "
    "the first pass. Exactness ceiling documented: bigint-safe "
    "while 1000 * n_vecs_per_label < 3e9.",
    tags=("embedding", "curation"),
)
def emb_label_centroid_cosines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _LCC_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT))"
            " AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64))"
            " AS i) g",
        )
    )


# ------------------------------------- audio spectral centroid --

# Power-weighted mean frequency bin over the exact integer DFT powers
# of multimodal_audio_tone's square-wave fixture: centroid =
# sum(k * P_k) / sum(P_k) — an exact rational whose numerator and
# denominator are bigint anchors; planted half-periods 2/4/8 map to
# fundamentals at bins 16/8/4, so the centroid ranking recovers the
# pitch ordering without an argmax.


def _centroid_sql_tail(p4: str, p8: str, p16: str) -> str:
    # factor-wise DOUBLE (the Yule-K discipline): 16 * p16 measured
    # EXACTLY 2^63 on the standard fixture — a bigint-weighted sum
    # wraps in Spark (ANSI errors) while DuckDB silently promotes to
    # HUGEINT. The exact anchors are the p4/p8/p16 columns themselves;
    # the centroid is one mirrored double expression over them.
    num = (
        f"(4.0 * CAST({p4} AS DOUBLE) + 8.0 * CAST({p8} AS DOUBLE)"
        f" + 16.0 * CAST({p16} AS DOUBLE))"
    )
    den = (
        f"(CAST({p4} AS DOUBLE) + CAST({p8} AS DOUBLE)"
        f" + CAST({p16} AS DOUBLE))"
    )
    return (
        f"CASE WHEN {p4} > 0 OR {p8} > 0 OR {p16} > 0 "
        f"THEN {num} / {den} END AS centroid_bin"
    )


def _audio_centroid_oracle() -> str:
    from icebergsql_spark.operators.multimodal import dft_coef_values_sql
    from icebergsql_spark.plans.pipeline16 import (
        _TONE_AMP,
        _TONE_BINS,
        _TONE_MAX_DOC,
        _TONE_N,
    )

    half_p = "CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END"
    pcols = ", ".join(
        f"CAST(MAX(CASE WHEN k = {k} THEN re * re + im * im END)"
        f" AS BIGINT) AS p{k}"
        for k in _TONE_BINS
    )
    return f"""
        WITH coef(k, i, cq, sq) AS (
          VALUES {dft_coef_values_sql(_TONE_N, _TONE_BINS)}
        ),
        samp AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 CASE WHEN ((i.i // ({half_p})) % 2) = 0
                      THEN {_TONE_AMP} ELSE -{_TONE_AMP} END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_TONE_N - 1}))
                      AS i) i
          WHERE doc_id < {_TONE_MAX_DOC}
        ),
        pw AS MATERIALIZED (
          SELECT samp.doc_id, coef.k,
                 CAST(SUM(samp.s * coef.cq) AS BIGINT) AS re,
                 CAST(SUM(samp.s * coef.sq) AS BIGINT) AS im
          FROM samp JOIN coef ON coef.i = samp.i
          GROUP BY 1, 2
        ),
        per_doc AS MATERIALIZED (
          SELECT doc_id, {pcols} FROM pw GROUP BY doc_id
        )
        SELECT p4, p8, p16, {_centroid_sql_tail('p4', 'p8', 'p16')},
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM per_doc
        GROUP BY p4, p8, p16
        ORDER BY min_doc
    """


@register(
    "multimodal_audio_centroid",
    oracle=_audio_centroid_oracle(),
    doc="Audio spectral centroid over the exact integer DFT powers of "
    "the multimodal_audio_tone fixture (REAL WAV decode -> "
    "audio_tone_powers at bins 4/8/16): centroid = "
    "sum(k*P_k)/sum(P_k), the brightness scalar a voice/music/noise "
    "router thresholds — the exact anchors are the p4/p8/p16 power "
    "integers themselves; the centroid is one mirrored factor-wise "
    "DOUBLE over them (16 * p16 measured exactly 2^63 on the "
    "fixture — a bigint-weighted sum wraps in Spark while DuckDB "
    "silently promotes to HUGEINT, the Yule-K overflow class). The "
    "pitch ordering of the planted half-period-2/4/8 square waves "
    "is recovered as a pure function of the data (no argmax, unlike "
    "the tone gate's top_bin). Scale shape: one Arrow-batched "
    "narrow map then per-signature grouping.",
    tags=("multimodal", "stats"),
)
def multimodal_audio_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.pipeline16 import (
        _TONE_AMP,
        _TONE_BINS,
        _TONE_MAX_DOC,
        _TONE_N,
    )
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _TONE_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                half_p = (2, 4, 8)[int(d) % 3]
                samples = [
                    _TONE_AMP if (i // half_p) % 2 == 0 else -_TONE_AMP
                    for i in range(_TONE_N)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    powers = multimodal.audio_tone_powers(
        blobs, n=_TONE_N, bins=_TONE_BINS
    )
    per_doc = powers.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("bin") == k, F.col("power")))
            .cast("bigint")
            .alias(f"p{k}")
            for k in _TONE_BINS
        ]
    )
    per_doc.createOrReplaceTempView("ac_per_doc")
    return spark.sql(
        f"""
        SELECT p4, p8, p16, {_centroid_sql_tail('p4', 'p8', 'p16')},
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM ac_per_doc
        GROUP BY p4, p8, p16
        ORDER BY min_doc
        """
    )


# --------------------------------------- partial correlation --

# First-order partial correlation between every pair of types' daily
# series controlling for each third type: r_xy.z = (r_xy - r_xz*r_yz)
# / sqrt((1-r_xz^2)(1-r_yz^2)) — the does-the-co-movement-survive-
# removing-the-common-driver test (two types both driven by overall
# traffic correlate; partialling the third reveals whether any DIRECT
# coupling remains). All sufficient statistics are exact bigints over
# the day-joined triple; each r and the composition are mirrored
# double expressions (locked against a Fraction replica in
# tests/test_round14_formulas.py).
_PC_R = (
    "(CAST({n} * {sab} - {sa} * {sb} AS DOUBLE)"
    " / (sqrt(CAST({n} * {saa} - {sa} * {sa} AS DOUBLE))"
    "    * sqrt(CAST({n} * {sbb} - {sb} * {sb} AS DOUBLE))))"
)

_PC_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_PC_TAIL_SQL = """
        trip AS (
          SELECT a.event_type AS tx, b.event_type AS ty,
                 c.event_type AS tz, a.day,
                 a.x AS ax, b.x AS bx, c.x AS cx
          FROM daily a
          JOIN daily b ON b.day = a.day
                      AND a.event_type < b.event_type
          JOIN daily c ON c.day = a.day
                      AND c.event_type <> a.event_type
                      AND c.event_type <> b.event_type
        ),
        st AS (
          SELECT tx, ty, tz,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ax) AS BIGINT) AS sa,
                 CAST(SUM(bx) AS BIGINT) AS sb,
                 CAST(SUM(cx) AS BIGINT) AS sc,
                 CAST(SUM(ax * ax) AS BIGINT) AS saa,
                 CAST(SUM(bx * bx) AS BIGINT) AS sbb,
                 CAST(SUM(cx * cx) AS BIGINT) AS scc,
                 CAST(SUM(ax * bx) AS BIGINT) AS sab,
                 CAST(SUM(ax * cx) AS BIGINT) AS sac,
                 CAST(SUM(bx * cx) AS BIGINT) AS sbc
          FROM trip GROUP BY 1, 2, 3
        ),
        rr AS (
          SELECT tx, ty, tz, n,
                 CAST(n * sab - sa * sb AS BIGINT) AS cab,
                 CAST(n * sac - sa * sc AS BIGINT) AS cac,
                 CAST(n * sbc - sb * sc AS BIGINT) AS cbc,
                 CASE WHEN n * saa - sa * sa > 0
                           AND n * sbb - sb * sb > 0
                      THEN {rab} END AS rab,
                 CASE WHEN n * saa - sa * sa > 0
                           AND n * scc - sc * sc > 0
                      THEN {rac} END AS rac,
                 CASE WHEN n * sbb - sb * sb > 0
                           AND n * scc - sc * sc > 0
                      THEN {rbc} END AS rbc
          FROM st
        )
        SELECT tx, ty, tz, n, cab, cac, cbc, rab,
               CASE WHEN 1.0 - rac * rac > 0.0
                         AND 1.0 - rbc * rbc > 0.0
                    THEN (rab - rac * rbc)
                         / (sqrt(1.0 - rac * rac)
                            * sqrt(1.0 - rbc * rbc))
               END AS partial_r
        FROM rr
        ORDER BY tx, ty, tz
"""
_PC_SQL = _PC_HEAD_SQL + _PC_TAIL_SQL


def _pc_sql(day_expr: str, src: str) -> str:
    return _PC_SQL.format(
        day_expr=day_expr,
        src=src,
        rab=_PC_R.format(
            n="n", sab="sab", sa="sa", sb="sb", saa="saa", sbb="sbb"
        ),
        rac=_PC_R.format(
            n="n", sab="sac", sa="sa", sb="sc", saa="saa", sbb="scc"
        ),
        rbc=_PC_R.format(
            n="n", sab="sbc", sa="sb", sb="sc", saa="sbb", sbb="scc"
        ),
    )


@register(
    "events_partial_corr",
    oracle=_pc_sql("epoch_ns(ts) // 86400000000000", "events"),
    doc="First-order partial correlation between every pair of types' "
    "daily volume series controlling for each third type: r_xy.z = "
    "(r_xy - r_xz*r_yz)/sqrt((1-r_xz^2)(1-r_yz^2)) — the "
    "common-driver test events_autocorrelation's plain Pearson "
    "cannot make (all types co-move with overall traffic; the "
    "partial reveals which pairs remain DIRECTLY coupled once a "
    "third series is held fixed). Covariance numerators are exact "
    "bigint anchors (cab/cac/cbc); each r and the composition are "
    "mirrored double expressions with degenerate-series CASE guards "
    "that keep the row (NULL partial_r, the r13 PACF ADVICE "
    "discipline). Scale shape: volume enters one (type, day) "
    "count; the triple join is 30 x 5P3 rows, calendar-bounded.",
    tags=("events", "stats"),
)
def events_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_pc")
    return spark.sql(_pc_sql("ts DIV 86400000000000", "ev_pc"))
