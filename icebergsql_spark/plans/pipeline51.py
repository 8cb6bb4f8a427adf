"""Round-14 gate wave #1 (pipeline51): MTLD lexical diversity, FIR
CUSUM, the sliding-window MAX deque sketch (+ streaming twin), the
type x hour-of-day interaction chi2 (+ streaming twin), and directed
token-pair confidence.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; every stats gate's
algebra is locked against an independent pure-Python replica in
tests/test_round14_formulas.py (the r13 formula-review discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ------------------------------------------------------------ MTLD --

# MTLD (McCarthy & Jarvis 2010), forward pass: scan tokens keeping the
# running type/token counts of the CURRENT factor; each time TTR drops
# strictly below 0.72 a factor completes and the counts reset; the
# incomplete tail contributes (1 - TTR_end) / (1 - 0.72) of a factor.
# MTLD = n_tokens / (factors + partial). The TTR threshold test is
# EXACT integer arithmetic (100*types < 72*tokens), so the whole state
# machine is engine-deterministic; the only doubles are the final
# per-doc MTLD (one mirrored expression over exact ints, quantized
# ONCE to milli-units) and the per-source average of those bigints.
# Forward-only (no backward average) and capped at the first
# _MTLD_CAP tokens per doc — both documented design choices that keep
# the oracle recursion bounded; the cap also makes the gate
# fixed-cost per document at any corpus scale.
_MTLD_CAP = 150

# Shared final algebra over per-doc end states per(source, n, f, ty,
# tok) — identical text both engines.
_MTLD_TAIL_SQL = """
        mid AS (
          SELECT source, n, f, ty, tok,
                 CASE WHEN f = 0 AND (tok = 0 OR ty = tok) THEN NULL
                      WHEN tok = 0 THEN CAST(ROUND(CAST(n AS DOUBLE)
                        / CAST(f AS DOUBLE) * 1000.0) AS BIGINT)
                      ELSE CAST(ROUND(CAST(n AS DOUBLE)
                        / (CAST(f AS DOUBLE)
                           + (CAST(tok - ty AS DOUBLE)
                              / CAST(tok AS DOUBLE)) / 0.28)
                        * 1000.0) AS BIGINT)
                 END AS mtld_milli
          FROM per
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS tok_total,
               CAST(SUM(f) AS BIGINT) AS factors_total,
               CAST(COUNT(mtld_milli) AS BIGINT) AS n_defined,
               CAST(SUM(mtld_milli) AS BIGINT) AS mtld_milli_sum,
               CASE WHEN COUNT(mtld_milli) > 0
                    THEN CAST(SUM(mtld_milli) AS DOUBLE)
                         / CAST(COUNT(mtld_milli) AS DOUBLE)
               END AS avg_mtld_milli
        FROM mid
        GROUP BY source
        ORDER BY source
"""

_MTLD_ORACLE = f"""
        WITH RECURSIVE toks AS MATERIALIZED (
          SELECT doc_id, source,
                 regexp_split_to_array(trim(text), '\\s+')[1:{_MTLD_CAP}]
                   AS l
          FROM documents
        ),
        tpos AS MATERIALIZED (
          SELECT doc_id, p.pos, l[p.pos] AS t
          FROM toks CROSS JOIN (
            SELECT unnest(generate_series(1, {_MTLD_CAP})) AS pos) p
          WHERE p.pos <= len(l)
        ),
        st AS (
          SELECT doc_id, 0 AS pos, CAST(0 AS BIGINT) AS f,
                 CAST(0 AS BIGINT) AS ty, CAST(0 AS BIGINT) AS tok,
                 CAST([] AS VARCHAR[]) AS cur
          FROM toks
          UNION ALL
          SELECT st.doc_id, st.pos + 1,
                 CASE WHEN 100 * (st.ty + (CASE WHEN
                        list_contains(st.cur, tp.t) THEN 0 ELSE 1 END))
                      < 72 * (st.tok + 1)
                      THEN st.f + 1 ELSE st.f END,
                 CASE WHEN 100 * (st.ty + (CASE WHEN
                        list_contains(st.cur, tp.t) THEN 0 ELSE 1 END))
                      < 72 * (st.tok + 1)
                      THEN CAST(0 AS BIGINT)
                      ELSE st.ty + (CASE WHEN
                        list_contains(st.cur, tp.t) THEN 0 ELSE 1 END)
                 END,
                 CASE WHEN 100 * (st.ty + (CASE WHEN
                        list_contains(st.cur, tp.t) THEN 0 ELSE 1 END))
                      < 72 * (st.tok + 1)
                      THEN CAST(0 AS BIGINT) ELSE st.tok + 1 END,
                 CASE WHEN 100 * (st.ty + (CASE WHEN
                        list_contains(st.cur, tp.t) THEN 0 ELSE 1 END))
                      < 72 * (st.tok + 1)
                      THEN CAST([] AS VARCHAR[])
                      ELSE (CASE WHEN list_contains(st.cur, tp.t)
                            THEN st.cur
                            ELSE list_append(st.cur, tp.t) END)
                 END
          FROM st JOIN tpos tp
            ON tp.doc_id = st.doc_id AND tp.pos = st.pos + 1
        ),
        fin AS (
          SELECT doc_id, f, ty, tok FROM (
            SELECT s.doc_id, s.f, s.ty, s.tok,
                   ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                      ORDER BY s.pos DESC) AS rn
            FROM st s
          ) z WHERE rn = 1
        ),
        per AS (
          SELECT t.source, CAST(len(t.l) AS BIGINT) AS n,
                 fin.f, fin.ty, fin.tok
          FROM toks t JOIN fin ON fin.doc_id = t.doc_id
        ),
""" + _MTLD_TAIL_SQL

_MTLD_FOLD = """
        aggregate(
          l,
          named_struct('f', CAST(0 AS BIGINT), 'ty', CAST(0 AS BIGINT),
                       'tok', CAST(0 AS BIGINT),
                       'cur', CAST(array() AS ARRAY<STRING>)),
          (s, t) -> CASE WHEN 100 * (s.ty + (CASE WHEN
                           array_contains(s.cur, t)
                           THEN CAST(0 AS BIGINT)
                           ELSE CAST(1 AS BIGINT) END))
                         < 72 * (s.tok + 1)
                    THEN named_struct('f', s.f + CAST(1 AS BIGINT),
                                      'ty', CAST(0 AS BIGINT),
                                      'tok', CAST(0 AS BIGINT),
                                      'cur',
                                      CAST(array() AS ARRAY<STRING>))
                    ELSE named_struct(
                           'f', s.f,
                           'ty', s.ty + (CASE WHEN
                             array_contains(s.cur, t)
                             THEN CAST(0 AS BIGINT)
                             ELSE CAST(1 AS BIGINT) END),
                           'tok', s.tok + CAST(1 AS BIGINT),
                           'cur', CASE WHEN array_contains(s.cur, t)
                                  THEN s.cur
                                  ELSE array_append(s.cur, t) END)
                    END)
"""


@register(
    "text_mtld",
    oracle=_MTLD_ORACLE,
    doc="MTLD lexical diversity per source (McCarthy-Jarvis forward "
    "pass, threshold 0.72, first 150 tokens/doc): the "
    "length-invariant diversity score that TTR/Yule/Heaps (all "
    "shipped) do not give — TTR decays with doc length, MTLD does "
    "not, so it is the score a curation pass can threshold across "
    "mixed-length corpora. The factor state machine is EXACT "
    "integer arithmetic (100*types < 72*tokens), run as one "
    "aggregate() fold per doc on the Spark side and an identical "
    "recursive-CTE recurrence in the oracle (the Holt-Winters "
    "template); per-doc MTLD is one mirrored double over exact ints "
    "quantized ONCE to milli-units, per-source stats are exact "
    "bigint sums. Algebra locked against an independent textbook "
    "replica (tests/test_round14_formulas.py). Scale shape: O(cap) "
    "per document, embarrassingly parallel, no shuffle beyond the "
    "final per-source aggregate.",
    tags=("text", "curation"),
)
def text_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, source,
                 slice(split(trim(text), '\\\\s+'), 1, {_MTLD_CAP}) AS l
          FROM documents
        ),
        fin AS (
          SELECT source, CAST(size(l) AS BIGINT) AS n,
                 {_MTLD_FOLD} AS s
          FROM toks
        ),
        per AS (
          SELECT source, n, s.f AS f, s.ty AS ty, s.tok AS tok
          FROM fin
        ),
        """
        + _MTLD_TAIL_SQL
    )


# ------------------------------------------------------- FIR CUSUM --

# Fast-initial-response (Lucas-Crosier) one-sided CUSUM over the
# per-type daily volume series, run SIDE-BY-SIDE with the standard
# zero-start CUSUM: the FIR chart starts at H/2 so a process that is
# ALREADY off-target at monitoring start alarms in a few observations,
# while an in-control process drains the head start harmlessly.
# ALL-INTEGER (the events_cusum_changepoint discipline): deviations
# n-scaled (d = c*n - tot); slack K = tot DIV 8 and threshold H = 4K
# live in the same n-scaled units, so both recurrences
# s' = max(0, s + d - K), the alarm tests s' > H, and the running
# maxima are exact bigint arithmetic end-to-end.
_CUSUM_FIR_HEAD_SQL = """
        WITH RECURSIVE ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_CUSUM_FIR_TAIL_SQL = """
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS tot
          FROM daily GROUP BY event_type
        ),
        idx AS (
          SELECT d.event_type, d.day, d.c,
                 CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                   ORDER BY d.day) AS BIGINT) AS i
          FROM daily d
        ),
        cu (event_type, i, sf, fa, fm, ss, sa, sm) AS (
            SELECT g.event_type, CAST(0 AS BIGINT),
                   2 * (g.tot {div} 8), CAST(-1 AS BIGINT),
                   2 * (g.tot {div} 8),
                   CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
                   CAST(0 AS BIGINT)
            FROM g
          UNION ALL
            SELECT cu.event_type, cu.i + 1,
                   greatest(CAST(0 AS BIGINT),
                     cu.sf + (x.c * g.n - g.tot) - (g.tot {div} 8)),
                   CASE WHEN cu.fa <> -1 THEN cu.fa
                        WHEN greatest(CAST(0 AS BIGINT),
                          cu.sf + (x.c * g.n - g.tot)
                          - (g.tot {div} 8)) > 4 * (g.tot {div} 8)
                        THEN x.day ELSE CAST(-1 AS BIGINT) END,
                   greatest(cu.fm, greatest(CAST(0 AS BIGINT),
                     cu.sf + (x.c * g.n - g.tot) - (g.tot {div} 8))),
                   greatest(CAST(0 AS BIGINT),
                     cu.ss + (x.c * g.n - g.tot) - (g.tot {div} 8)),
                   CASE WHEN cu.sa <> -1 THEN cu.sa
                        WHEN greatest(CAST(0 AS BIGINT),
                          cu.ss + (x.c * g.n - g.tot)
                          - (g.tot {div} 8)) > 4 * (g.tot {div} 8)
                        THEN x.day ELSE CAST(-1 AS BIGINT) END,
                   greatest(cu.sm, greatest(CAST(0 AS BIGINT),
                     cu.ss + (x.c * g.n - g.tot) - (g.tot {div} 8)))
            FROM cu
            JOIN idx x ON x.event_type = cu.event_type
                      AND x.i = cu.i + 1
            JOIN g ON g.event_type = cu.event_type
        )
        SELECT cu.event_type, g.n AS n_days,
               CAST(g.tot {div} 8 AS BIGINT) AS k_slack,
               CAST(4 * (g.tot {div} 8) AS BIGINT) AS h_thresh,
               cu.sf AS fir_final, cu.fm AS fir_max,
               cu.fa AS fir_alarm_day,
               cu.ss AS std_final, cu.sm AS std_max,
               cu.sa AS std_alarm_day
        FROM cu JOIN g ON g.event_type = cu.event_type AND cu.i = g.n
        ORDER BY cu.event_type
"""
_CUSUM_FIR_SQL = _CUSUM_FIR_HEAD_SQL + _CUSUM_FIR_TAIL_SQL


@register(
    "events_cusum_fir",
    oracle=_CUSUM_FIR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="Fast-initial-response CUSUM (Lucas-Crosier) vs the standard "
    "zero-start chart over each type's daily volume, in ONE pass: "
    "the FIR chart's H/2 head start detects a process that is "
    "already drifted at monitoring start several observations "
    "earlier, while for in-control series both charts converge (the "
    "head start drains) — emitted side-by-side finals, running "
    "maxima, and first-alarm days make that comparison the gate's "
    "check. All-integer: n-scaled deviations d = c*n - tot with "
    "slack K = tot DIV 8 and threshold H = 4K in the same units, so "
    "both recurrences and alarm tests are exact bigints (recursive-"
    "CTE oracle replays them; Fraction replica in "
    "tests/test_round14_formulas.py locks the scaling). Scale "
    "shape: volume enters one (type, day) count; the fold runs over "
    "the tiny day series per key.",
    tags=("events", "stats"),
)
def events_cusum_fir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_cfir")
    ev = spark.table("ev_cfir")
    daily = (
        ev.select(
            "event_type", F.expr("ts DIV 86400000000000").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("tot"),
    )
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('sf', 2 * (tot DIV 8), 'fa', CAST(-1 AS BIGINT),
                       'fm', 2 * (tot DIV 8),
                       'ss', CAST(0 AS BIGINT),
                       'sa', CAST(-1 AS BIGINT),
                       'sm', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'sf', greatest(CAST(0 AS BIGINT),
                    acc.sf + (x.c * n - tot) - (tot DIV 8)),
            'fa', CASE WHEN acc.fa <> -1 THEN acc.fa
                       WHEN greatest(CAST(0 AS BIGINT),
                         acc.sf + (x.c * n - tot) - (tot DIV 8))
                         > 4 * (tot DIV 8)
                       THEN x.day ELSE CAST(-1 AS BIGINT) END,
            'fm', greatest(acc.fm, greatest(CAST(0 AS BIGINT),
                    acc.sf + (x.c * n - tot) - (tot DIV 8))),
            'ss', greatest(CAST(0 AS BIGINT),
                    acc.ss + (x.c * n - tot) - (tot DIV 8)),
            'sa', CASE WHEN acc.sa <> -1 THEN acc.sa
                       WHEN greatest(CAST(0 AS BIGINT),
                         acc.ss + (x.c * n - tot) - (tot DIV 8))
                         > 4 * (tot DIV 8)
                       THEN x.day ELSE CAST(-1 AS BIGINT) END,
            'sm', greatest(acc.sm, greatest(CAST(0 AS BIGINT),
                    acc.ss + (x.c * n - tot) - (tot DIV 8)))))
        """
    )
    return (
        g.select(
            "event_type", F.col("n").alias("n_days"),
            F.expr("CAST(tot DIV 8 AS BIGINT)").alias("k_slack"),
            F.expr("CAST(4 * (tot DIV 8) AS BIGINT)").alias("h_thresh"),
            fold.alias("z"),
        )
        .select(
            "event_type", "n_days", "k_slack", "h_thresh",
            F.col("z.sf").alias("fir_final"),
            F.col("z.fm").alias("fir_max"),
            F.col("z.fa").alias("fir_alarm_day"),
            F.col("z.ss").alias("std_final"),
            F.col("z.sm").alias("std_max"),
            F.col("z.sa").alias("std_alarm_day"),
        )
        .orderBy("event_type")
    )


# --------------------------------------- sliding-window MAX sketch --

# Sliding MAX is the third sibling after DGIM bit-count and EH-sum —
# but unlike counts/sums, window max admits an EXACT mergeable
# structure: the monotonic deque (equivalently, the degenerate eps=0
# exponential histogram), whose members are exactly the window items
# STRICTLY greater than every later item in the window. That
# membership predicate is closed-form, so the whole deque state per
# window end is pure window functions — no sequential maintenance,
# oracle-shareable (the DGIM closed-form lesson carried over).
_EHMAX_W = 14

_EHMAX_HEAD_SQL = """
        WITH daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT event_type, {day_expr} AS day FROM {src}) e
          GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_EHMAX_TAIL_SQL = f"""
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
            AND j.rk > e.rk - {_EHMAX_W} AND j.rk <= e.rk
          WHERE e.rk >= {_EHMAX_W}
        ),
        sfx AS (
          SELECT event_type, erk, eday, jrk, jday, jx,
                 MAX(jx) OVER (PARTITION BY event_type, erk
                   ORDER BY jrk
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS later_max
          FROM pairs
        ),
        deque AS (
          SELECT event_type, erk, eday, jrk, jday, jx
          FROM sfx
          WHERE later_max IS NULL OR jx > later_max
        )
        SELECT event_type, CAST(eday AS BIGINT) AS day,
               CAST(MAX(jx) AS BIGINT) AS win_max,
               CAST(COUNT(*) AS BIGINT) AS deque_size,
               CAST(MIN(jday) AS BIGINT) AS argmax_day,
               CAST(SUM(jx) AS BIGINT) AS deque_sum
        FROM deque
        GROUP BY event_type, eday
        ORDER BY event_type, day
"""
_EHMAX_SQL = _EHMAX_HEAD_SQL + _EHMAX_TAIL_SQL


@register(
    "sketch_eh_sliding_max",
    oracle=_EHMAX_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Sliding 14-day window MAX over each type's daily volume via "
    "the monotonic-deque sketch state computed CLOSED-FORM: a window "
    "item is in the deque iff it is strictly greater than every "
    "later window item (so the front is the LATEST argmax — the "
    "strict-eviction tie convention, locked against a real deque-"
    "maintenance replica in tests/test_round14_formulas.py). Emits "
    "per window end the exact max, the deque size (the sketch's "
    "memory footprint, O(log) expected for random data), the argmax "
    "day, and the deque sum — all exact bigints. The third sliding "
    "sibling after DGIM bit-count and EH-sum; for MAX the structure "
    "is exact, not approximate. Scale shape: volume enters one "
    "(type, day) count; the pair frame is W x 30 rows per type, "
    "calendar-bounded at every SF.",
    tags=("sketch", "events"),
)
def sketch_eh_sliding_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_ehmax")
    return spark.sql(
        _EHMAX_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ehmax")
    )


@register(
    "sketch_stream_eh_max",
    oracle=_EHMAX_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of sketch_eh_sliding_max: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL closed-form deque tail SQL (shared "
    "_EHMAX_TAIL_SQL). The live sliding-max monitor converging to "
    "the batch answer bit-for-bit.",
    tags=("sketch", "events", "streaming"),
)
def sketch_stream_eh_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ehmx")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ehmx_daily
        ),"""
        + _EHMAX_TAIL_SQL
    )


# ------------------------------- type x hour-of-day interaction chi2 --

# The seasonal-interaction question events_hod_uniformity_ks (per-type
# vs uniform) and events_cramers_v (type vs a props bucket) do not
# answer: is hour-of-day shape INDEPENDENT of event type? Chi2 on the
# |types| x 24 contingency table, via the shared _CRAMER_TAIL_SQL
# (sorted-fold chi2 + Cramér's V over exact integer cells).
_HODCHI_HEAD_SQL = """
        WITH base AS (
          SELECT event_type AS t, ({hour_expr}) % 24 AS b
          FROM {src}
        ),
        cells AS (
          SELECT t, b, CAST(COUNT(*) AS BIGINT) AS o
          FROM base GROUP BY 1, 2
        ),"""


def _hodchi_oracle() -> str:
    from icebergsql_spark.plans.pipeline39 import (
        _CHI2_CELL,
        _CRAMER_TAIL_SQL,
    )

    return (
        _HODCHI_HEAD_SQL.format(
            hour_expr="epoch_ns(ts) // 3600000000000", src="events"
        )
        + _CRAMER_TAIL_SQL.format(
            cell=_CHI2_CELL,
            fold="list_sum(list(contrib ORDER BY t, b))",
        )
    )


@register(
    "events_type_hod_chi2",
    oracle=_hodchi_oracle(),
    doc="Chi-square independence test of event_type x hour-of-day "
    "(the |types| x 24 seasonal-interaction contingency table) with "
    "Cramér's V effect size: the is-the-daypart-shape-type-specific "
    "test that composes events_hod_uniformity_ks (marginal shape) "
    "into an interaction — a near-zero V says one shared daypart "
    "curve serves all types, a large V says per-type scheduling. "
    "Reuses the r13 _CRAMER_TAIL_SQL verbatim: exact bigint cells "
    "and margins, per-cell contributions summed in a (t, b)-sorted "
    "fold, V one mirrored sqrt. Scale shape: the contingency table "
    "is |types| x 24 regardless of volume.",
    tags=("events", "stats"),
)
def events_type_hod_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline39 import (
        _CHI2_CELL,
        _CRAMER_TAIL_SQL,
    )
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_hodchi")
    return spark.sql(
        _HODCHI_HEAD_SQL.format(
            hour_expr="ts DIV 3600000000000", src="ev_hodchi"
        )
        + _CRAMER_TAIL_SQL.format(
            cell=_CHI2_CELL,
            fold=(
                "aggregate(array_sort(collect_list(struct(t, b, "
                "contrib))), CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + x.contrib)"
            ),
        )
    )


@register(
    "events_stream_type_hod_chi2",
    oracle=_hodchi_oracle(),
    doc="STREAMING twin of events_type_hod_chi2: per-(type, hour) "
    "count partials (SUM-mergeable, the pipeline40 hourly fixture) "
    "fold to hour-of-day cells in the finalizer, which runs the "
    "IDENTICAL _CRAMER_TAIL_SQL. The live seasonal-interaction "
    "monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_type_hod_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline39 import (
        _CHI2_CELL,
        _CRAMER_TAIL_SQL,
    )
    from icebergsql_spark.plans.pipeline40 import _hourly_partial_stream

    _hourly_partial_stream(spark, sf_dir, "hodchi")
    return spark.sql(
        """
        WITH cells AS (
          SELECT event_type AS t, hour % 24 AS b,
                 CAST(SUM(c) AS BIGINT) AS o
          FROM hodchi_hourly GROUP BY 1, 2
        ),"""
        + _CRAMER_TAIL_SQL.format(
            cell=_CHI2_CELL,
            fold=(
                "aggregate(array_sort(collect_list(struct(t, b, "
                "contrib))), CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + x.contrib)"
            ),
        )
    )


# --------------------------------------- directed pair confidence --

# Directed variant of r13's text_pair_lift: confidence(a -> b) =
# df_both / df_a — the asymmetric association rule score (lift is
# symmetric; confidence says "docs with a also have b", the direction
# a template-expansion or query-suggestion pass actually consumes).
# Exact rational over document-frequency bigints; conf_ppm is an
# EXACT integer ((1000000 * both) DIV df_a — non-negative, so DuckDB
# floor-div and Spark DIV agree); ranking by the float division per
# the bigint-overflow ORDER BY rule with a total (a, b) tie-break.
_CONF_MIN_DF = 40
_CONF_MIN_BOTH = 20

_CONF_SQL = """
        WITH w AS (
          SELECT DISTINCT doc_id, t
          FROM (SELECT doc_id, {tok} AS t FROM documents) raw
        ),
        df_ AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM w GROUP BY t
          HAVING COUNT(*) >= {min_df}
        ),
        pairs AS (
          SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM w a
          JOIN w b ON b.doc_id = a.doc_id AND a.t < b.t
          JOIN df_ da ON da.t = a.t
          JOIN df_ db ON db.t = b.t
          GROUP BY 1, 2
          HAVING COUNT(*) >= {min_both}
        ),
        directed AS (
          SELECT t1 AS a, t2 AS b, cnt FROM pairs
          UNION ALL
          SELECT t2 AS a, t1 AS b, cnt FROM pairs
        )
        SELECT d.a, d.b, d.cnt AS df_both, da.df AS df_a,
               db.df AS df_b,
               CAST((1000000 * d.cnt) {div} da.df AS BIGINT)
                 AS conf_ppm,
               CAST(d.cnt AS DOUBLE) / CAST(da.df AS DOUBLE)
                 AS confidence
        FROM directed d
        JOIN df_ da ON da.t = d.a
        JOIN df_ db ON db.t = d.b
        ORDER BY CAST(d.cnt AS DOUBLE) / CAST(da.df AS DOUBLE) DESC,
                 d.a, d.b
        LIMIT 25
"""


@register(
    "text_pair_confidence",
    oracle=_CONF_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))",
        min_df=_CONF_MIN_DF,
        min_both=_CONF_MIN_BOTH,
        div="//",
    ),
    doc="Top-25 DIRECTED token association rules by confidence "
    "(a -> b = df_both / df_a), the asymmetric complement of "
    "text_pair_lift: lift cannot distinguish 'a implies b' from "
    "'b implies a'; confidence is what template-expansion and "
    "suggestion passes rank by. Same df-capped doc-keyed candidate "
    "join as lift (never token x token); each unordered pair emits "
    "both directions; conf_ppm is an EXACT integer "
    "((1000000 * both) DIV df_a, non-negative so floor-div and "
    "truncating DIV agree) anchoring the float used only for "
    "ordering (total tie-break). Scale shape: the df floor bounds "
    "candidate fan-out per doc.",
    tags=("text", "dedup", "curation"),
)
def text_pair_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        _CONF_SQL.format(
            tok="explode(split(trim(text), '\\\\s+'))",
            min_df=_CONF_MIN_DF,
            min_both=_CONF_MIN_BOTH,
            div="DIV",
        )
    )
