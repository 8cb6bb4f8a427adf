"""Round-14 LATE gate wave #10 (pipeline60): RQA laminarity
(+ streaming twin), the sliding-MIN deque sibling (+ streaming twin),
and per-dimension Fisher discrimination scores.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; the laminarity and
min-deque algebra is locked against replicas in
tests/test_round14_formulas.py. Registered AFTER the round's
committed bench run (the r13 late-wave precedent — the driver's
BENCH_r14 times them; correctness is covered by the late definitive
sweep + the per-wave 3-SF verifications).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ------------------------------------------- RQA laminarity --

# The VERTICAL-line sibling of events_rqa_determinism: a recurrent
# pair (i, j) is LAMINAR iff (i, j-1) or (i, j+1) is also recurrent —
# the series lingers in the same state band (intermittency /
# plateaus), where DET's diagonals capture repeated TRAJECTORIES.
# Same exact-integer machinery over the symmetric-closed recurrence
# set (vertical structure needs both orientations, so pairs are
# closed under swap before the neighbor test; i <> j excluded).
_LAM_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_LAM_TAIL_SQL = """
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
        lam AS (
          SELECT r.event_type, r.i, r.j
          FROM rec2 r
          WHERE EXISTS (
            SELECT 1 FROM rec2 s
            WHERE s.event_type = r.event_type AND s.i = r.i
              AND (s.j = r.j + 1 OR s.j = r.j - 1)
          )
        ),
        agg AS (
          SELECT e.event_type, e.n, e.e AS eps_used,
                 CAST(e.n * (e.n - 1) AS BIGINT) AS total_pairs,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM rec2 r
                  WHERE r.event_type = e.event_type) AS rec_pairs,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lam l
                  WHERE l.event_type = e.event_type) AS lam_pairs
          FROM eps e
        )
        SELECT event_type, n AS n_days, eps_used, total_pairs,
               rec_pairs, lam_pairs,
               CASE WHEN rec_pairs > 0
                    THEN CAST(lam_pairs AS DOUBLE)
                         / CAST(rec_pairs AS DOUBLE)
               END AS laminarity
        FROM agg
        ORDER BY event_type
"""
_LAM_SQL = _LAM_HEAD_SQL + _LAM_TAIL_SQL


@register(
    "events_rqa_laminarity",
    oracle=_LAM_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="RQA laminarity of each type's daily volume — the "
    "VERTICAL-line sibling of events_rqa_determinism: share of "
    "recurrent (ordered, i <> j) day pairs whose state-band "
    "membership persists to an adjacent day (the series LINGERS in "
    "a level band: plateaus/intermittency), where DET's diagonals "
    "capture repeated trajectories. Same eps = range DIV 10 "
    "exact-integer recurrence; the rate is one mirrored division. "
    "Locked against a brute-force replica in "
    "tests/test_round14_formulas.py. Scale shape: one (type, day) "
    "count; the ordered pair frame is 870 rows per type, "
    "calendar-bounded.",
    tags=("events", "stats"),
)
def events_rqa_laminarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_lam")
    return spark.sql(
        _LAM_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_lam", div="DIV"
        )
    )


@register(
    "events_stream_rqa_laminarity",
    oracle=_LAM_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="STREAMING twin of events_rqa_laminarity: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL tail SQL (shared _LAM_TAIL_SQL). The live "
    "plateau monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_rqa_laminarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "slam")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM slam_daily
        ),"""
        + _LAM_TAIL_SQL.format(div="DIV")
    )


# ------------------------------------------ sliding-MIN deque --

# The MIN mirror of sketch_eh_sliding_max: a window item is in the
# min-deque iff it is strictly LESS than every later window item
# (increasing front-to-back; front = the LATEST argmin under strict
# eviction) — the same closed-form membership predicate with the
# comparison flipped, locked against a real min-deque replica.
_EHMIN_W = 14

_EHMIN_HEAD_SQL = """
        WITH daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT event_type, {day_expr} AS day FROM {src}) e
          GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_EHMIN_TAIL_SQL = f"""
        idx AS (
          SELECT event_type, day, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY day) AS BIGINT) AS rk
          FROM daily
        ),
        pairs AS (
          SELECT e.event_type, e.rk AS erk, e.day AS eday,
                 j.rk AS jrk, j.day AS jday, j.x AS jx
          FROM idx e JOIN idx j ON j.event_type = e.event_type
            AND j.rk > e.rk - {_EHMIN_W} AND j.rk <= e.rk
          WHERE e.rk >= {_EHMIN_W}
        ),
        sfx AS (
          SELECT event_type, erk, eday, jrk, jday, jx,
                 MIN(jx) OVER (PARTITION BY event_type, erk
                   ORDER BY jrk
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS later_min
          FROM pairs
        ),
        deque AS (
          SELECT event_type, erk, eday, jrk, jday, jx
          FROM sfx
          WHERE later_min IS NULL OR jx < later_min
        )
        SELECT event_type, CAST(eday AS BIGINT) AS day,
               CAST(MIN(jx) AS BIGINT) AS win_min,
               CAST(COUNT(*) AS BIGINT) AS deque_size,
               CAST(MIN(jday) AS BIGINT) AS argmin_day,
               CAST(SUM(jx) AS BIGINT) AS deque_sum
        FROM deque
        GROUP BY event_type, eday
        ORDER BY event_type, day
"""
_EHMIN_SQL = _EHMIN_HEAD_SQL + _EHMIN_TAIL_SQL


@register(
    "sketch_eh_sliding_min",
    oracle=_EHMIN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Sliding 14-day window MIN over each type's daily volume via "
    "the monotonic min-deque computed CLOSED-FORM (member iff "
    "strictly less than every later window item; front = LATEST "
    "argmin under strict eviction) — the exact mirror of "
    "sketch_eh_sliding_max, completing the sliding-extrema pair "
    "the DGIM/EH family's counts and sums cannot express. Exact "
    "min/size/argmin/sum bigints; locked against a real "
    "min-deque-maintenance replica in "
    "tests/test_round14_formulas.py. Scale shape: volume enters "
    "one (type, day) count; the pair frame is W x 30 rows per "
    "type, calendar-bounded.",
    tags=("sketch", "events"),
)
def sketch_eh_sliding_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_ehmin")
    return spark.sql(
        _EHMIN_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ehmin")
    )


@register(
    "sketch_stream_eh_min",
    oracle=_EHMIN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of sketch_eh_sliding_min: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL closed-form deque tail SQL (shared "
    "_EHMIN_TAIL_SQL). The live sliding-min monitor converging to "
    "the batch answer bit-for-bit.",
    tags=("sketch", "events", "streaming"),
)
def sketch_stream_eh_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ehmn")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ehmn_daily
        ),"""
        + _EHMIN_TAIL_SQL
    )


# --------------------------------- per-dimension Fisher scores --

# One-way ANOVA per embedding dimension against the label: SSB and
# SSW from per-label sufficient statistics, each label's s^2/n term
# quantized ONCE to 1e-6 units so both sums are exact bigints
# (ssb_q = round(1e6 * s_l^2/n_l) summed minus 1e6 * S^2/n as one
# more quantized term; ssw_q = 1e6*Q - sum round(1e6 * s_l^2/n_l)).
# F = (SSB/(k-1)) / (SSW/(n-k)) factor-wise. The per-dimension
# discriminability ranking that justifies (or kills) a
# dimension-pruning pass — emitted for all 64 dims with a total
# order, so the top-k is the consumer's choice.
_FISHER_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
        ),
        per_label AS (
          SELECT pos, label,
                 CAST(COUNT(*) AS BIGINT) AS nl,
                 CAST(SUM(q) AS BIGINT) AS sl
          FROM xq GROUP BY 1, 2
        ),
        gstats AS (
          SELECT pos,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS s,
                 CAST(SUM(q * q) AS BIGINT) AS qq,
                 CAST(COUNT(DISTINCT label) AS BIGINT) AS k
          FROM xq GROUP BY pos
        ),
        bterms AS (
          SELECT pos,
                 CAST(SUM(CAST(ROUND(1000000.0
                      * CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                      / CAST(nl AS DOUBLE)) AS BIGINT)) AS BIGINT)
                   AS group_q
          FROM per_label GROUP BY pos
        ),
        fin AS (
          SELECT g.pos, g.n, g.k,
                 b.group_q
                 - CAST(ROUND(1000000.0 * CAST(g.s AS DOUBLE)
                        * CAST(g.s AS DOUBLE)
                        / CAST(g.n AS DOUBLE)) AS BIGINT) AS ssb_q,
                 1000000 * g.qq - b.group_q AS ssw_q
          FROM gstats g JOIN bterms b ON b.pos = g.pos
        )
        SELECT CAST(pos AS INTEGER) AS dim, n, k, ssb_q, ssw_q,
               CASE WHEN ssw_q > 0 AND k > 1 AND n > k
                    THEN (CAST(ssb_q AS DOUBLE)
                          / CAST(k - 1 AS DOUBLE))
                         / (CAST(ssw_q AS DOUBLE)
                            / CAST(n - k AS DOUBLE))
               END AS fisher_f
        FROM fin
        ORDER BY dim
"""


@register(
    "emb_dim_fisher_scores",
    oracle=_FISHER_SQL.format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64))"
        " AS i) g",
    ),
    doc="One-way ANOVA F score of every embedding dimension against "
    "the label — the per-dimension discriminability ranking behind "
    "dimension pruning and the per-dim complement of "
    "emb_label_centroid_cosines (which scores labels, not dims): "
    "SSB/SSW built from per-label sufficient statistics with each "
    "s^2/n term quantized ONCE to 1e-6 units, so ssb_q/ssw_q are "
    "exact bigint anchors and F is one factor-wise double per dim "
    "(the events_anova_oneway discipline applied across 64 "
    "dimensions at once). Scale shape: one (dim, label) aggregate — "
    "volume enters only the first pass.",
    tags=("embedding", "stats"),
)
def emb_dim_fisher_scores(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(
        _FISHER_SQL.format(
            emb_i="CAST(element_at(embedding, CAST(i AS INT))"
            " AS DOUBLE)",
            spine="CROSS JOIN (SELECT explode(sequence(1, 64))"
            " AS i) g",
        )
    )
