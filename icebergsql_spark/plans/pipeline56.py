"""Round-14 gate wave #6 (pipeline56): recurrence-quantification
determinism, permutation entropy (+ streaming twins), document-length
Gini, and linear CKA between embedding-dimension halves.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; the permutation-entropy
millinat fold's rounding margins are audited offline at 3 SFs; the
RQA/Gini algebra is locked against replicas in
tests/test_round14_formulas.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# --------------------------------------- RQA determinism --

# Recurrence-quantification over each type's daily series: pair (i,j)
# is RECURRENT iff |x_i - x_j| <= eps with eps = (max-min) DIV 10 —
# all exact integers. RR = recurrent share of all pairs; DET = share
# of recurrent pairs sitting on a diagonal line of length >= 2
# (predecessor (i-1,j-1) or successor (i+1,j+1) also recurrent) —
# deterministic structure vs isolated coincidences, the RQA
# complement of events_sample_entropy.
_RQA_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary).
_RQA_TAIL_SQL = """
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
        rec AS (
          SELECT a.event_type, a.rk AS i, b.rk AS j
          FROM idx a
          JOIN idx b ON b.event_type = a.event_type AND b.rk > a.rk
          JOIN eps ON eps.event_type = a.event_type
          WHERE abs(a.x - b.x) <= eps.e
        ),
        det AS (
          SELECT r.event_type, r.i, r.j
          FROM rec r
          WHERE EXISTS (
            SELECT 1 FROM rec s
            WHERE s.event_type = r.event_type
              AND ((s.i = r.i + 1 AND s.j = r.j + 1)
                   OR (s.i = r.i - 1 AND s.j = r.j - 1))
          )
        ),
        agg AS (
          SELECT e.event_type, e.n, e.e AS eps_used,
                 CAST(e.n * (e.n - 1) / 2 AS BIGINT) AS total_pairs,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM rec r
                  WHERE r.event_type = e.event_type) AS rec_pairs,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM det d
                  WHERE d.event_type = e.event_type) AS det_pairs
          FROM eps e
        )
        SELECT event_type, n AS n_days, eps_used, total_pairs,
               rec_pairs, det_pairs,
               CASE WHEN total_pairs > 0
                    THEN CAST(rec_pairs AS DOUBLE)
                         / CAST(total_pairs AS DOUBLE)
               END AS recurrence_rate,
               CASE WHEN rec_pairs > 0
                    THEN CAST(det_pairs AS DOUBLE)
                         / CAST(rec_pairs AS DOUBLE)
               END AS determinism
        FROM agg
        ORDER BY event_type
"""
_RQA_SQL = _RQA_HEAD_SQL + _RQA_TAIL_SQL


@register(
    "events_rqa_determinism",
    oracle=_RQA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="Recurrence-quantification analysis of each type's daily "
    "volume: recurrence rate (share of day pairs within "
    "eps = range DIV 10 of each other) and DETERMINISM (share of "
    "recurrent pairs on diagonal lines of length >= 2) — the "
    "does-the-series-revisit-states-in-sequences test that "
    "separates structured rhythms from isolated coincidences, "
    "complementing events_sample_entropy (which scores template "
    "matches, not their diagonal organization). Everything through "
    "the counts is exact integer; the two rates are mirrored "
    "divisions. Locked against a brute-force replica in "
    "tests/test_round14_formulas.py. Scale shape: volume enters "
    "one (type, day) count; the pair frame is 435 rows per type, "
    "calendar-bounded.",
    tags=("events", "stats"),
)
def events_rqa_determinism(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_rqa")
    return spark.sql(
        _RQA_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_rqa", div="DIV"
        )
    )


@register(
    "events_stream_rqa",
    oracle=_RQA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events",
        div="//",
    ),
    doc="STREAMING twin of events_rqa_determinism: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL tail SQL (shared _RQA_TAIL_SQL). The live "
    "rhythm-structure monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_rqa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "srqa")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM srqa_daily
        ),"""
        + _RQA_TAIL_SQL.format(div="DIV")
    )


# ------------------------------------------ permutation entropy --

# Bandt-Pompe ordinal patterns of embedding dimension 3 over each
# type's daily series, ties broken by temporal index (the stable
# (value, index) lexicographic convention): pattern id = 4*[a<=b] +
# 2*[a<=c] + [b<=c] gives 8 slots of which 101 and 010 are logically
# impossible (transitivity) — their counts are emitted and must be 0,
# a built-in sanity anchor. Entropy over the 6 valid patterns is a
# FIXED 8-term textual ln fold quantized ONCE to millinats (offline
# margin audit at 3 SFs per the image-entropy lesson).
_PE_TERM = (
    "CASE WHEN {c} > 0 THEN (CAST({c} AS DOUBLE) / CAST(nw AS DOUBLE))"
    " * ln(CAST({c} AS DOUBLE) / CAST(nw AS DOUBLE))"
    " ELSE CAST(0.0 AS DOUBLE) END"
)

_PE_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""


def _pe_tail_sql() -> str:
    terms = " + ".join(_PE_TERM.format(c=f"c{k}") for k in range(8))
    pcols = ", ".join(
        f"CAST(SUM(CASE WHEN pat = {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS c{k}"
        for k in range(8)
    )
    return f"""
        seq AS (
          SELECT event_type, x,
                 LEAD(x, 1) OVER (PARTITION BY event_type
                   ORDER BY day) AS y,
                 LEAD(x, 2) OVER (PARTITION BY event_type
                   ORDER BY day) AS z
          FROM daily
        ),
        pat AS (
          SELECT event_type,
                 4 * (CASE WHEN x <= y THEN 1 ELSE 0 END)
                 + 2 * (CASE WHEN x <= z THEN 1 ELSE 0 END)
                 + (CASE WHEN y <= z THEN 1 ELSE 0 END) AS pat
          FROM seq WHERE y IS NOT NULL AND z IS NOT NULL
        ),
        piv AS (
          SELECT event_type, {pcols},
                 CAST(COUNT(*) AS BIGINT) AS nw
          FROM pat GROUP BY event_type
        )
        SELECT event_type, nw, c0, c1, c3, c4, c6, c7,
               CAST(c2 AS BIGINT) AS c_impossible_010,
               CAST(c5 AS BIGINT) AS c_impossible_101,
               CAST(ROUND(-({terms}) * 1000.0) AS BIGINT)
                 AS perm_entropy_mnat
        FROM piv
        ORDER BY event_type
    """


_PE_SQL_BODY = None  # composed lazily so the tail builder stays shared


def _pe_sql(day_expr: str, src: str) -> str:
    return _PE_HEAD_SQL.format(day_expr=day_expr, src=src) + _pe_tail_sql()


@register(
    "events_perm_entropy",
    oracle=_pe_sql("epoch_ns(ts) // 86400000000000", "events"),
    doc="Bandt-Pompe permutation entropy (order 3) of each type's "
    "daily series: the complexity score built from ordinal patterns "
    "only — immune to monotone rescaling of volume, which every "
    "value-based entropy (rolling/sample) is not. Ties broken by "
    "temporal index (stable (value, index) order), so the pattern "
    "id 4*[a<=b]+2*[a<=c]+[b<=c] is exact integer logic; slots 010 "
    "and 101 are transitivity-impossible and emitted as MUST-BE-ZERO "
    "anchor columns. The entropy is a FIXED 8-term textual ln fold "
    "over exact pattern counts, quantized ONCE to millinats "
    "(offline margin audit at 3 SFs: worst 0.031 mnat vs ~1e-13 "
    "ulp). Scale shape: one (type, day) count + a 28-window LEAD "
    "frame.",
    tags=("events", "stats"),
)
def events_perm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import (
        events_ts_to_nanos,
        load_tables,
    )

    events_ts_to_nanos(
        load_tables(spark, sf_dir, ("events",))["events"]
    ).createOrReplaceTempView("ev_pe")
    return spark.sql(_pe_sql("ts DIV 86400000000000", "ev_pe"))


@register(
    "events_stream_perm_entropy",
    oracle=_pe_sql("epoch_ns(ts) // 86400000000000", "events"),
    doc="STREAMING twin of events_perm_entropy: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL ordinal-pattern tail SQL (shared _pe_tail_sql "
    "template). The live complexity monitor converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_perm_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "spe")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM spe_daily
        ),"""
        + _pe_tail_sql()
    )


# ------------------------------------------ document-length Gini --

# Gini concentration of document lengths per source via the sorted
# formula G = sum((2i - n - 1) x_(i)) / (n sum x), computed as
# (sum((2i-1)x) - n*sum(x)) / (n*sum(x)) — with ranks
# totally ordered by (n_chars, doc_id) the numerator is invariant to
# tie order (tied values contribute rank-sum x value regardless of
# assignment), so both factors are exact bigints.
_LGINI_SQL = """
        WITH rk AS (
          SELECT source, n_chars,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS i
          FROM documents
        ),
        g AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(n_chars) AS BIGINT) AS s,
                 CAST(SUM((2 * i - 1) * n_chars) AS BIGINT) AS w
          FROM rk GROUP BY source
        )
        SELECT source, n AS n_docs, s AS chars_total,
               CAST(w - n * s AS BIGINT) AS gini_num,
               CAST(n * s AS BIGINT) AS gini_den,
               CASE WHEN n * s > 0
                    THEN CAST(w - n * s AS DOUBLE)
                         / CAST(n * s AS DOUBLE)
               END AS gini
        FROM g
        ORDER BY source
"""


@register(
    "text_length_gini",
    oracle=_LGINI_SQL,
    doc="Gini concentration of document lengths per source — the "
    "is-this-source-a-mix-of-stubs-and-tomes number that a "
    "shard-packing or length-bucketing pass reads before choosing "
    "strategy (uniform lengths pack trivially; high Gini needs "
    "events_shard_packing's bin logic). Sorted-formula Gini with a "
    "total (n_chars, doc_id) order: numerator sum((2i-n-1)x) and "
    "denominator n*sum(x) are exact bigints (tie-order invariant — "
    "proven in the replica test); the ratio is one mirrored "
    "division. Scale shape: one per-source sort — the same shuffle "
    "profile as a ranked quantile.",
    tags=("text", "curation"),
)
def text_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(_LGINI_SQL)


# ---------------------------------- CKA between dimension halves --

# Linear CKA between the first-32 and last-32 embedding dimensions
# over a capped universe: CKA = ||Cxy||_F^2 / (||Cxx||_F ||Cyy||_F)
# with C blocks of the exact integer n-scaled covariance (the
# emb_top_eigvec discipline). The Frobenius sums of SQUARED
# covariances would overflow bigint (~1e31), so each runs as a
# dimension-SORTED double fold over (c/1e9)^2 terms and is quantized
# ONCE to a bigint anchor; CKA is one mirrored factor-wise double.
# Near-isotropic real embeddings score LOW (halves carry independent
# information — Matryoshka-truncation loses real signal); a high
# score would flag redundant halves safe to truncate.
_CKA_CAP = 500

_CKA_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) AS q
          FROM embeddings {spine}
          WHERE vec_id < {cap}
        ),
        s AS (
          SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS sq
          FROM xq GROUP BY pos
        ),
        dev AS (
          SELECT x.vid, x.pos, s.n * x.q - s.sq AS d
          FROM xq x JOIN s ON s.pos = x.pos
        ),
        cov AS (
          SELECT a.pos AS i, b.pos AS j,
                 CAST(SUM(a.d * b.d) AS BIGINT) AS c
          FROM dev a JOIN dev b ON b.vid = a.vid
          GROUP BY 1, 2
        ),
        fro AS (
          SELECT
            CAST(ROUND({fold_xy}) AS BIGINT) AS sxy_q,
            CAST(ROUND({fold_xx}) AS BIGINT) AS sxx_q,
            CAST(ROUND({fold_yy}) AS BIGINT) AS syy_q
          FROM cov
        )
        SELECT sxy_q, sxx_q, syy_q,
               CASE WHEN sxx_q > 0 AND syy_q > 0
                    THEN CAST(sxy_q AS DOUBLE)
                         / (sqrt(CAST(sxx_q AS DOUBLE))
                            * sqrt(CAST(syy_q AS DOUBLE)))
               END AS cka_halves
        FROM fro
"""

_CKA_TERM = (
    "(CAST(c AS DOUBLE) / 1000000000.0)"
    " * (CAST(c AS DOUBLE) / 1000000000.0)"
)


def _cka_sql(engine: str) -> str:
    def fold(cond: str) -> str:
        if engine == "duck":
            return (
                f"list_sum(list(CASE WHEN {cond} THEN {_CKA_TERM}"
                " ELSE 0.0 END ORDER BY i, j))"
            )
        return (
            "aggregate(array_sort(collect_list(struct(i, j, "
            f"CASE WHEN {cond} THEN {_CKA_TERM} ELSE"
            " CAST(0.0 AS DOUBLE) END AS term))), "
            "CAST(0.0 AS DOUBLE), (acc, t) -> acc + t.term)"
        )

    if engine == "duck":
        emb_i = "embedding[i]::DOUBLE"
        spine = (
            "CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g"
        )
    else:
        emb_i = "CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)"
        spine = "CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) g"
    return _CKA_SQL.format(
        emb_i=emb_i,
        spine=spine,
        cap=_CKA_CAP,
        fold_xy=fold("i <= 32 AND j > 32"),
        fold_xx=fold("i <= 32 AND j <= 32"),
        fold_yy=fold("i > 32 AND j > 32"),
    )


@register(
    "emb_cka_halves",
    oracle=_cka_sql("duck"),
    doc="Linear CKA similarity between the first-32 and last-32 "
    "embedding dimensions — the are-the-halves-redundant test "
    "behind Matryoshka truncation decisions (emb_matryoshka_recall "
    "measures retrieval loss; CKA measures the representational "
    "overlap CAUSING it): CKA = ||Cxy||_F^2/(||Cxx||_F ||Cyy||_F) "
    "over exact integer n-scaled covariance blocks. Frobenius sums "
    "of squared covariances would overflow bigint (~1e31), so each "
    "runs as a dimension-SORTED double fold over (c/1e9)^2 terms "
    "quantized ONCE to a bigint anchor; CKA is one factor-wise "
    "double. Scale shape: capped 500-vector universe, one covariance "
    "aggregate — fixed-cost at any corpus size.",
    tags=("embedding", "stats"),
)
def emb_cka_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(_cka_sql("spark"))
