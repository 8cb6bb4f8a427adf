"""Round-12 gate wave #4 (pipeline34): blocked binary tests (Cochran's
Q + streaming twin, McNemar pairs), the Cochran-Armitage proportion
trend, and the Page-trend streaming twin.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from icebergsql_spark.plans.registry import register

# ------------------------------ shared binary-flag rank head --

# Binarization with NO magic threshold: flag_ij = 1 iff type j's count
# on day i exceeds type j's OWN doubled median (m2 picks rank
# (n+1) DIV 2 and n DIV 2 + 1 separately, so odd n doubles the middle
# row) — exact integers end to end.  Consumes cnt(event_type, day, c);
# shared between the Q batch gate, its streaming twin, and McNemar.
_FLAG_BODY = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        ),
        srt AS (
          SELECT event_type, day, x,
                 CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY x, day) AS BIGINT) AS rnk,
                 CAST(COUNT(*) OVER (PARTITION BY event_type)
                      AS BIGINT) AS n
          FROM daily
        ),
        med AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN rnk = (n + 1) {div} 2
                          THEN x ELSE 0 END)
                      + SUM(CASE WHEN rnk = n {div} 2 + 1
                            THEN x ELSE 0 END) AS BIGINT) AS m2
          FROM srt GROUP BY event_type
        ),
        flags AS (
          SELECT d.event_type, d.day,
                 CAST(CASE WHEN 2 * d.x > m.m2 THEN 1 ELSE 0 END
                      AS BIGINT) AS f
          FROM daily d JOIN med m ON m.event_type = d.event_type
        )"""

_BATCH_CNT_HEAD = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""

_STREAM_CNT_HEAD = """
        WITH cnt AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS c
          FROM {view}
        ),"""

# --------------------------------------------- Cochran's Q test --

_CQ_TAIL_SQL = """,
        cj AS (
          SELECT event_type, CAST(SUM(f) AS BIGINT) AS c_j
          FROM flags GROUP BY event_type
        ),
        ri AS (
          SELECT day, CAST(SUM(f) AS BIGINT) AS r_i
          FROM flags GROUP BY day
        ),
        dims AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM cj),
        tot AS (
          SELECT CAST(SUM(c_j) AS BIGINT) AS nn,
                 CAST(SUM(c_j * c_j) AS BIGINT) AS sc2
          FROM cj
        ),
        rsum AS (
          SELECT CAST(SUM(r_i * r_i) AS BIGINT) AS sr2 FROM ri
        ),
        calc AS (
          SELECT d.k, t.nn, t.sc2, r.sr2,
                 CAST((d.k - 1) * (d.k * t.sc2 - t.nn * t.nn)
                      AS BIGINT) AS q_num,
                 CAST(d.k * t.nn - r.sr2 AS BIGINT) AS q_den
          FROM dims d CROSS JOIN tot t CROSS JOIN rsum r
        )
        SELECT c.event_type, c.c_j, x.k, x.nn, x.sc2, x.sr2,
               x.q_num, x.q_den,
               CASE WHEN x.q_den > 0
                    THEN CAST(x.q_num AS DOUBLE)
                         / CAST(x.q_den AS DOUBLE)
               END AS q
        FROM cj c CROSS JOIN calc x
        ORDER BY c.event_type
"""

_CQ_SQL = _BATCH_CNT_HEAD + _FLAG_BODY + _CQ_TAIL_SQL


@register(
    "events_cochran_q",
    oracle=_CQ_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Cochran's Q test across the five event types with days as "
    "blocks, on the binary 'above this type's own median day' "
    "indicator (threshold-free binarization via the doubled median "
    "— odd block counts double the middle row, so ties stay "
    "integer): Q = (k-1)[k*sum C_j^2 - N^2] / (kN - sum R_i^2), "
    "every term an exact bigint and Q one mirrored float division. "
    "The binary sibling of Friedman — do the types run their "
    "above-median days TOGETHER (busy days are busy for everyone) "
    "or independently? Scale shape: one (type, day) count on a "
    "spine, one per-type rank window, scalar aggregates.",
    tags=("events", "stats"),
)
def events_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cq")
    return spark.sql(
        _CQ_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_cq", div="DIV"
        )
    )


@register(
    "events_stream_cochran_q",
    oracle=_CQ_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="STREAMING twin of events_cochran_q: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `cnt` contract; the finalizer runs the "
    "IDENTICAL median-flag / Q tail SQL (shared _FLAG_BODY + "
    "_CQ_TAIL_SQL templates). The live do-busy-days-align monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cochran_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "cq")
    return spark.sql(
        (_STREAM_CNT_HEAD + _FLAG_BODY + _CQ_TAIL_SQL).format(
            view="cq_daily", div="DIV"
        )
    )


# ------------------------------------------------ McNemar pairs --

_MCN_TAIL_SQL = """,
        pairs AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
                 CAST(SUM(CASE WHEN a.f = 1 AND b.f = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS b_cnt,
                 CAST(SUM(CASE WHEN a.f = 0 AND b.f = 1
                          THEN 1 ELSE 0 END) AS BIGINT) AS c_cnt
          FROM flags a JOIN flags b
            ON b.day = a.day AND a.event_type < b.event_type
          GROUP BY 1, 2
        )
        SELECT ta, tb, b_cnt, c_cnt,
               CASE WHEN b_cnt + c_cnt > 0
                    THEN CAST((b_cnt - c_cnt) * (b_cnt - c_cnt)
                              AS DOUBLE)
                         / CAST(b_cnt + c_cnt AS DOUBLE)
               END AS mcnemar_chi2
        FROM pairs
        ORDER BY ta, tb
"""

_MCN_SQL = _BATCH_CNT_HEAD + _FLAG_BODY + _MCN_TAIL_SQL


@register(
    "events_mcnemar_pairs",
    oracle=_MCN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="McNemar's paired binary test between every pair of event "
    "types, on the shared above-own-median day indicator: only the "
    "DISCORDANT days count (b = A above while B below, c = the "
    "reverse), chi2 = (b-c)^2/(b+c) — the right test when the two "
    "series share the same blocks, where an unpaired test would "
    "throw away the day pairing. Discordance counts are exact "
    "integers; chi2 is one mirrored float division with a "
    "zero-discordance guard. Scale shape: one spine count, one "
    "day-keyed self-join over 5 rows per day.",
    tags=("events", "stats"),
)
def events_mcnemar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_mcn")
    return spark.sql(
        _MCN_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_mcn", div="DIV"
        )
    )


# --------------------------------- Cochran-Armitage trend test --

_CA_SQL = """
        WITH ev AS (
          SELECT {day_expr} AS day,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                   AS is_p
          FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS n_i,
                 CAST(SUM(is_p) AS BIGINT) AS r_i
          FROM ev GROUP BY day
        ),
        idx AS (
          SELECT day, n_i, r_i,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS w
          FROM daily
        ),
        s AS (
          SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
                 CAST(SUM(r_i) AS BIGINT) AS rr,
                 CAST(SUM(w * n_i) AS BIGINT) AS swn,
                 CAST(SUM(w * r_i) AS BIGINT) AS swr,
                 CAST(SUM(w * w * n_i) AS BIGINT) AS sw2n
          FROM idx
        ),
        calc AS (
          SELECT nn, rr, swn, swr, sw2n,
                 CAST(nn * swr - rr * swn AS BIGINT) AS nt,
                 CAST(nn * sw2n - swn * swn AS BIGINT) AS s1
          FROM s
        )
        SELECT nn AS n, rr AS r, swn, swr, sw2n, nt, s1,
               CASE WHEN rr > 0 AND rr < nn AND s1 > 0
                    THEN CAST(nt AS DOUBLE) * sqrt(CAST(nn AS DOUBLE))
                         / (sqrt(CAST(rr AS DOUBLE)
                                 * CAST(nn - rr AS DOUBLE))
                            * sqrt(CAST(s1 AS DOUBLE)))
               END AS z_trend
        FROM calc
"""


@register(
    "events_cochran_armitage",
    oracle=_CA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Cochran-Armitage trend test on the daily purchase PROPORTION "
    "(day index as the ordered score): N*T = N*sum(w*r) - "
    "R*sum(w*n) and the score spread S1 = N*sum(w^2*n) - "
    "(sum(w*n))^2 are exact bigints; z = NT*sqrt(N) / "
    "(sqrt(R(N-R)) * sqrt(S1)) is evaluated factor-by-factor in "
    "DOUBLE so no integer product can overflow — the "
    "is-conversion-drifting-with-time read that a per-day z-test "
    "sequence cannot give (it tests each day alone; this tests the "
    "TREND). Scale shape: one per-day (count, conversion) rollup, "
    "one scalar aggregate.",
    tags=("events", "stats"),
)
def events_cochran_armitage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ca")
    return spark.sql(
        _CA_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ca")
    )


# ---------------------------------- Page trend streaming twin --


def _page_oracle() -> str:
    from icebergsql_spark.plans.pipeline30 import _PAGE_SQL

    return _PAGE_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_page_trend",
    oracle=_page_oracle(),
    doc="STREAMING twin of events_page_trend: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `cnt` contract; the finalizer runs the "
    "IDENTICAL doubled-rank Page's L tail SQL (shared "
    "_PAGE_TAIL_SQL template). The live ordered-ranking monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_page_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import (
        _PAGE_TAIL_SQL,
        _daily_partial_stream,
    )

    _daily_partial_stream(spark, sf_dir, "pg")
    return spark.sql(
        """
        WITH cnt AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS c
          FROM pg_daily
        ),"""
        + _PAGE_TAIL_SQL
    )
