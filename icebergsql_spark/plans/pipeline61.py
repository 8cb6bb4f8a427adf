"""Round-14 LATE gate wave #11 (pipeline61): RQA trapping time
(+ streaming twin), weighted mode, global two-NN intrinsic dimension,
and partial Kendall tau.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; trapping-time run
algebra locked against a replica in tests/test_round14_formulas.py;
the global two-NN ln margins audited offline at 3 SFs (worst 8e-5
mnat). Registered after the round's committed bench run (late-wave
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# --------------------------------------------- RQA trapping time --

# The third RQA number after DET and LAM: trapping time = mean length
# of VERTICAL runs (length >= 2) in the ordered recurrence plot — how
# long the series stays trapped in a state band once it enters.
# Vertical runs found by gaps-and-islands (j - ROW_NUMBER per (type,
# i) anchor); the line-of-identity exclusion (j <> i) splits a run
# crossing the diagonal, the standard convention, documented. All
# counts exact bigints; TT one mirrored division.
_TT_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_TT_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY day) AS BIGINT) AS rk
          FROM daily
        ),
        eps AS (
          SELECT event_type,
                 CAST((MAX(x) - MIN(x)) {div} 10 AS BIGINT) AS e,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM idx GROUP BY event_type
        ),
        rec2 AS (
          SELECT a.event_type, a.rk AS i, b.rk AS j
          FROM idx a
          JOIN idx b ON b.event_type = a.event_type
                    AND b.rk <> a.rk
          JOIN eps ON eps.event_type = a.event_type
          WHERE abs(a.x - b.x) <= eps.e
        ),
        grp AS (
          SELECT event_type, i, j,
                 j - ROW_NUMBER() OVER (PARTITION BY event_type, i
                   ORDER BY j) AS g
          FROM rec2
        ),
        runs AS (
          SELECT event_type, i, g, CAST(COUNT(*) AS BIGINT) AS len
          FROM grp GROUP BY 1, 2, 3
        ),
        agg AS (
          SELECT e.event_type, e.n, e.e AS eps_used,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM runs r
                  WHERE r.event_type = e.event_type
                    AND r.len >= 2) AS n_runs,
                 (SELECT CAST(COALESCE(SUM(r.len), 0) AS BIGINT)
                  FROM runs r
                  WHERE r.event_type = e.event_type
                    AND r.len >= 2) AS len_sum,
                 (SELECT CAST(COALESCE(MAX(r.len), 0) AS BIGINT)
                  FROM runs r
                  WHERE r.event_type = e.event_type) AS max_run
          FROM eps e
        )
        SELECT event_type, n AS n_days, eps_used, n_runs, len_sum,
               max_run,
               CASE WHEN n_runs > 0
                    THEN CAST(len_sum AS DOUBLE)
                         / CAST(n_runs AS DOUBLE)
               END AS trapping_time
        FROM agg
        ORDER BY event_type
"""
_TT_SQL = _TT_HEAD_SQL + _TT_TAIL_SQL


@register(
    "events_rqa_trapping",
    oracle=_TT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="RQA trapping time of each type's daily volume — mean length "
    "of vertical recurrence runs of length >= 2 (gaps-and-islands "
    "over the ordered recurrence set): how LONG the series stays in "
    "a state band once it enters, the duration complement of "
    "events_rqa_laminarity's share (LAM says how much of the plot "
    "is vertical structure; TT says how long each episode lasts). "
    "Line-of-identity exclusion splits diagonal-crossing runs — the "
    "standard convention. Exact bigint run counts/lengths; TT one "
    "mirrored division. Locked against a brute-force replica in "
    "tests/test_round14_formulas.py. Scale shape: one (type, day) "
    "count; runs frame calendar-bounded.",
    tags=("events", "stats"),
)
def events_rqa_trapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_tt")
    return spark.sql(
        _TT_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_tt", div="DIV"
        )
    )


@register(
    "events_stream_rqa_trapping",
    oracle=_TT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="STREAMING twin of events_rqa_trapping: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL tail SQL (shared _TT_TAIL_SQL). The live "
    "episode-duration monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_rqa_trapping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "stt")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM stt_daily
        ),"""
        + _TT_TAIL_SQL.format(div="DIV")
    )


# -------------------------------------------------- weighted mode --

# agg_mode_exact's weighted sibling: the price level carrying the
# most QUANTITY (rank by summed weight DESC, value ASC) — a different
# winner from the most frequent line price whenever big orders
# cluster on particular price points. Exact integers; share_ppm an
# exact non-negative integer division.
_WMODE_SQL = """
        WITH f AS (
          SELECT l_returnflag AS flag,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2
        ),
        rk AS (
          SELECT flag, v, w,
                 ROW_NUMBER() OVER (PARTITION BY flag
                   ORDER BY w DESC, v) AS rn,
                 CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tw
          FROM f
        )
        SELECT flag, v AS mode_value_cents, w AS mode_weight, tw,
               CAST(1000000 * w {div} tw AS BIGINT)
                 AS mode_weight_ppm
        FROM rk WHERE rn = 1
        ORDER BY flag
"""


@register(
    "agg_weighted_mode",
    oracle=_WMODE_SQL.format(div="//"),
    doc="Quantity-weighted mode of line price per return flag "
    "(agg_mode_exact's weighted sibling): the price level carrying "
    "the most total quantity, rank (summed weight DESC, value ASC) "
    "— a deterministic winner that differs from the most FREQUENT "
    "price whenever large orders concentrate on particular price "
    "points. Exact integer cents and weights; mode_weight_ppm an "
    "exact non-negative integer division. Scale shape: one "
    "(flag, value) weighted aggregate + a per-flag top-1 window.",
    tags=("agg",),
)
def agg_weighted_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(_WMODE_SQL.format(div="DIV"))


# ------------------------------------ global two-NN intrinsic dim --

# emb_intrinsic_dim_2nn's GLOBAL sibling: one two-NN estimate over
# the whole capped universe (no label partition) — the corpus-level
# manifold dimension vs the per-label ones (a big gap between global
# and per-label ID flags label-specific structure). Same exact
# integer q-space distances, same millinat quantize-once (offline
# margin audit at 3 SFs: worst 8e-5 mnat).
_IDG_CAP = 1000

_IDG_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
          WHERE vec_id < {cap}
        ),
        d2 AS (
          SELECT a.vid AS i, b.vid AS j,
                 CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d
          FROM xq a
          JOIN xq b ON b.pos = a.pos AND b.vid <> a.vid
          GROUP BY 1, 2
        ),
        nn AS (
          SELECT i, d, rn FROM (
            SELECT i, d,
                   ROW_NUMBER() OVER (PARTITION BY i
                     ORDER BY d, j) AS rn
            FROM d2
          ) z WHERE rn <= 2
        ),
        piv AS (
          SELECT i,
                 MAX(CASE WHEN rn = 1 THEN d END) AS r1sq,
                 MAX(CASE WHEN rn = 2 THEN d END) AS r2sq
          FROM nn GROUP BY 1
        ),
        terms AS (
          SELECT i, r1sq, r2sq,
                 CAST(ROUND(500.0 * ln(CAST(r2sq AS DOUBLE)
                      / CAST(r1sq AS DOUBLE))) AS BIGINT) AS t_mnat
          FROM piv
          WHERE r1sq > 0 AND r2sq IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(t_mnat) AS BIGINT) AS sum_lnmu_mnat,
               CASE WHEN SUM(t_mnat) > 0
                    THEN CAST(1000 * COUNT(*) AS DOUBLE)
                         / CAST(SUM(t_mnat) AS DOUBLE)
               END AS id_2nn
        FROM terms
"""


@register(
    "emb_intrinsic_dim_global",
    oracle=_IDG_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
        cap=_IDG_CAP,
    ),
    doc="Global TWO-NN intrinsic dimension over the capped embedding "
    "universe — emb_intrinsic_dim_2nn's corpus-level sibling (no "
    "label partition): comparing the global estimate against the "
    "per-label ones flags label-specific manifold structure (global "
    ">> per-label = labels live on their own low-dim patches). "
    "Exact integer squared distances with (d, vid) tie-break; ln "
    "terms quantized ONCE to millinats (offline margin audit at 3 "
    "SFs: worst 8e-5 mnat vs ~1e-13 ulp); duplicates excluded by a "
    "mirrored filter. Scale shape: capped 1000-vector universe — "
    "fixed cost at any corpus size.",
    tags=("embedding", "stats"),
)
def emb_intrinsic_dim_global(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # r15: the dimension-exploded pair join evaluated 64M (pair, dim)
    # rows through two shuffles (measured 4.4 s at sf0.1). The universe
    # is CAPPED at 1000 vectors by the gate's own contract, so the
    # n²×64 distance work is a bounded driver numpy pass: quantization
    # stays in Spark SQL (round() semantics must be the engine's, not
    # numpy's banker's rounding), int64 GEMM distances are EXACT
    # (|q| ≤ ~1e4 → D ≤ ~1e10, far under int64), and the (d, j)
    # tie-broken top-2 replicates ROW_NUMBER ... ORDER BY d, j. The
    # ln/millinat tail runs unchanged in Spark SQL over the same exact
    # integers — bit-identical end to end (oracle replays the full SQL).
    import numpy as np

    from icebergsql_spark.plans.registry import load_tables, local_result

    load_tables(spark, sf_dir, ("embeddings",))
    rows = spark.sql(
        "SELECT vec_id AS vid, transform(embedding, x -> "
        "CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv "
        f"FROM embeddings WHERE vec_id < {_IDG_CAP}"
    ).collect()  # bounded by the cap constant, not by corpus size
    vids = np.array([r["vid"] for r in rows], dtype=np.int64)
    q = np.array([r["qv"] for r in rows], dtype=np.int64)
    sq = (q * q).sum(axis=1)
    dmat = sq[:, None] + sq[None, :] - 2 * (q @ q.T)
    piv = []
    for a in range(len(vids)):
        d_row = dmat[a]
        order = np.lexsort((vids, d_row))
        picks = [b for b in order if b != a][:2]
        r1 = int(d_row[picks[0]]) if len(picks) > 0 else None
        r2 = int(d_row[picks[1]]) if len(picks) > 1 else None
        piv.append((int(vids[a]), r1, r2))
    local_result(
        spark, piv, "i bigint, r1sq bigint, r2sq bigint"
    ).createOrReplaceTempView("idg_piv")
    return spark.sql(
        """
        WITH terms AS (
          SELECT i, r1sq, r2sq,
                 CAST(ROUND(500.0 * ln(CAST(r2sq AS DOUBLE)
                      / CAST(r1sq AS DOUBLE))) AS BIGINT) AS t_mnat
          FROM idg_piv
          WHERE r1sq > 0 AND r2sq IS NOT NULL
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(t_mnat) AS BIGINT) AS sum_lnmu_mnat,
               CASE WHEN SUM(t_mnat) > 0
                    THEN CAST(1000 * COUNT(*) AS DOUBLE)
                         / CAST(SUM(t_mnat) AS DOUBLE)
               END AS id_2nn
        FROM terms
        """
    )


# ---------------------------------------------- partial Kendall tau --

# Kendall's partial rank correlation (Kendall 1942): tau_xy.z =
# (t_xy - t_xz * t_yz) / sqrt((1 - t_xz^2)(1 - t_yz^2)) over the
# tau-b values of the three pairs — the rank-based sibling of
# events_partial_corr (which partials PEARSON and inherits its
# outlier sensitivity; this one survives a burst day). Each tau-b is
# the factor-wise double over exact pair counts (the
# events_kendall_tau machinery, symmetric-closed); the composition
# is one more mirrored expression with degenerate CASE guards that
# keep the row.
_PTAU_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
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
        ),
        taus AS (
          SELECT t1, t2,
                 CASE WHEN n0 - tie_x - tie_xy > 0
                           AND n0 - tie_y - tie_xy > 0
                      THEN CAST(conc - disc AS DOUBLE)
                           / (sqrt(CAST(n0 - tie_x - tie_xy
                                        AS DOUBLE))
                              * sqrt(CAST(n0 - tie_y - tie_xy
                                          AS DOUBLE)))
                 END AS t
          FROM pp
        ),
        sym AS (
          SELECT t1, t2, t FROM taus
          UNION ALL SELECT t2, t1, t FROM taus
        ),
        types AS (SELECT DISTINCT event_type FROM daily)
        SELECT x.event_type AS tx, y.event_type AS ty,
               z.event_type AS tz,
               xy.t AS tau_xy, xz.t AS tau_xz, yz.t AS tau_yz,
               CASE WHEN 1.0 - xz.t * xz.t > 0.0
                         AND 1.0 - yz.t * yz.t > 0.0
                    THEN (xy.t - xz.t * yz.t)
                         / (sqrt(1.0 - xz.t * xz.t)
                            * sqrt(1.0 - yz.t * yz.t))
               END AS partial_tau
        FROM types x
        JOIN types y ON x.event_type < y.event_type
        JOIN types z ON z.event_type <> x.event_type
                    AND z.event_type <> y.event_type
        JOIN sym xy ON xy.t1 = x.event_type AND xy.t2 = y.event_type
        JOIN sym xz ON xz.t1 = x.event_type AND xz.t2 = z.event_type
        JOIN sym yz ON yz.t1 = y.event_type AND yz.t2 = z.event_type
        ORDER BY tx, ty, tz
"""


@register(
    "events_partial_tau",
    oracle=_PTAU_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Kendall's partial rank correlation tau_xy.z between every "
    "pair of types' daily series controlling for each third type — "
    "the rank-based sibling of events_partial_corr: the Pearson "
    "partial inherits Pearson's burst-day sensitivity, the tau "
    "partial is built on order agreements only. Each tau-b is the "
    "factor-wise double over exact pair counts (the "
    "events_kendall_tau machinery); the Kendall-1942 composition is "
    "one more mirrored expression with row-keeping degenerate "
    "guards. Scale shape: volume enters one (type, day) count; the "
    "pair frames are calendar-bounded.",
    tags=("events", "stats"),
)
def events_partial_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_ptau")
    return spark.sql(
        _PTAU_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ptau")
    )
