"""Round-13 gate wave #11 (pipeline49): exponential-histogram sliding
SUM sketch (batch + streaming twin), spectral entropy, stratified
k-fold.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------- exponential histogram (sum) --

# The DGIM closed form (pipeline40) generalizes to SUMS: treat each
# day's count x_d as x_d unary 1s — the bucket multiset after n total
# units is still the bijective base-2 representation of n, and a
# bucket's most-recent-unit timestamp is the DAY whose cumulative-sum
# interval contains unit index n - off (cum_{d-1} < idx <= cum_d),
# recovered by one range join against the cumulative series.  No
# sequential fold; the whole Datar-et-al exponential histogram is
# window functions + one equi-range join.
_EH_SPINE = ", ".join(f"({k}, {1 << k})" for k in range(41))

_EH_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
_EH_TAIL_SQL = (
    """
        cum AS (
          SELECT event_type, day, x,
                 CAST(SUM(x) OVER (PARTITION BY event_type
                   ORDER BY day) AS BIGINT) AS cum
          FROM daily
        ),
        tot AS (
          SELECT event_type, CAST(MAX(cum) AS BIGINT) AS n,
                 CAST(MAX(day) AS BIGINT) AS mxd
          FROM cum GROUP BY event_type
        ),
        digits AS (
          SELECT t.event_type, s.k, CAST(s.pw AS BIGINT) AS pw,
                 2 - (((t.n - (s.pw - 1)) {div} s.pw) % 2) AS dk
          FROM tot t
          CROSS JOIN (SELECT k, pw FROM (VALUES """
    + _EH_SPINE
    + """
          ) AS t(k, pw)) s
          WHERE t.n - (s.pw - 1) >= s.pw
        ),
        pref AS (
          SELECT event_type, k, pw, dk,
                 COALESCE(SUM(dk * pw) OVER (
                   PARTITION BY event_type ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pre
          FROM digits
        ),
        buckets AS (
          SELECT p.event_type, p.pw AS size,
                 p.pre + (c.copy - 1) * p.pw AS off
          FROM pref p
          JOIN (SELECT r AS copy
                FROM (VALUES (1), (2)) AS t(r)) c
            ON c.copy <= p.dk
        ),
        bday AS (
          SELECT b.event_type, b.size, b.off, c.day AS bd
          FROM buckets b
          JOIN tot t ON t.event_type = b.event_type
          JOIN cum c ON c.event_type = b.event_type
                    AND c.cum >= t.n - b.off
                    AND c.cum - c.x < t.n - b.off
        ),
        frame AS (
          SELECT t.event_type, w.w, t.mxd, t.n
          FROM tot t
          CROSS JOIN (SELECT r AS w
                      FROM (VALUES (7), (14), (21)) AS t(r)) w
        ),
        qual AS (
          SELECT f.event_type, f.w, b.size, b.off,
                 MAX(b.off) OVER (
                   PARTITION BY f.event_type, f.w) AS mx
          FROM frame f
          JOIN bday b ON b.event_type = f.event_type
                     AND b.bd >= f.mxd - f.w + 1
        ),
        est AS (
          SELECT event_type, w,
                 CAST(SUM(2 * size)
                      - MAX(CASE WHEN off = mx THEN size ELSE 0 END)
                      AS BIGINT) AS est2,
                 CAST(COUNT(*) AS BIGINT) AS n_buckets
          FROM qual GROUP BY 1, 2
        ),
        exact AS (
          SELECT f.event_type, f.w, f.n,
                 CAST(2 * COALESCE(SUM(d.x), 0) AS BIGINT) AS exact2
          FROM frame f
          LEFT JOIN daily d ON d.event_type = f.event_type
                           AND d.day >= f.mxd - f.w + 1
          GROUP BY 1, 2, 3
        )
        SELECT x.event_type, CAST(x.w AS BIGINT) AS w, x.n,
               x.exact2,
               COALESCE(e.est2, 0) AS est2,
               COALESCE(e.n_buckets, 0) AS n_buckets,
               COALESCE(e.est2, 0) - x.exact2 AS err2
        FROM exact x
        LEFT JOIN est e ON e.event_type = x.event_type AND e.w = x.w
        ORDER BY x.event_type, x.w
"""
)
_EH_SQL = _EH_HEAD_SQL + _EH_TAIL_SQL


@register(
    "sketch_eh_sliding_sum",
    oracle=_EH_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Exponential-histogram sliding-window SUM sketch (Datar-Gionis-"
    "Indyk-Motwani) over per-type daily event volume: estimates the "
    "last-7/14/21-day totals from O(log n) power-of-two buckets. "
    "The DGIM closed form generalizes: with each day's count as "
    "unary units, the bucket multiset after n total units is the "
    "bijective base-2 representation of n, and bucket timestamps "
    "are the DAYS whose cumulative-sum intervals contain the unit "
    "indices — one range join, no sequential fold. est2/exact2 in "
    "doubled units stay exact bigint; err2 pins the half-oldest-"
    "bucket guarantee. Scale shape: one (type, day) count, a 41-row "
    "digit spine, a per-bucket range join against the 30-day "
    "cumulative series.",
    tags=("sketch", "events"),
)
def sketch_eh_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_eh")
    return spark.sql(
        _EH_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_eh", div="DIV"
        )
    )


@register(
    "sketch_stream_eh_sum",
    oracle=_EH_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="STREAMING twin of sketch_eh_sliding_sum: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL closed-form bucket tail SQL (shared "
    "_EH_TAIL_SQL template). The live sliding-sum sketch monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("sketch", "streaming", "events"),
)
def sketch_stream_eh_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ehs")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ehs_daily
        ),"""
        + _EH_TAIL_SQL.format(div="DIV")
    )


# ------------------------------------------------ spectral entropy --

# Entropy of the normalized period-28/14/7 DFT powers (the
# events_weekly_spectrum basis): three per-type exact bigint powers,
# a fixed 3-term textual ln fold over their ratios, quantized ONCE to
# millinats per the image-entropy lesson (raw ln doubles measured a
# real JVM-vs-glibc 1-ulp divergence on a fixture this round).
_SE_TERM = (
    "CASE WHEN {p} > 0 THEN (CAST({p} AS DOUBLE) / CAST(pt AS DOUBLE))"
    " * ln(CAST({p} AS DOUBLE) / CAST(pt AS DOUBLE))"
    " ELSE CAST(0.0 AS DOUBLE) END"
)


def _spectral_entropy_sql(
    day_expr: str, src: str, div: str = "DIV"
) -> str:
    from icebergsql_spark.plans.pipeline16 import _spectrum_sql

    spec = _spectrum_sql(day_expr, src, div=div)
    terms = " + ".join(_SE_TERM.format(p=f"p{k}") for k in (1, 2, 4))
    return f"""
        WITH spec AS (
          {spec}
        ),
        piv AS (
          SELECT event_type,
                 MAX(CASE WHEN bin = 1 THEN power END) AS p1,
                 MAX(CASE WHEN bin = 2 THEN power END) AS p2,
                 MAX(CASE WHEN bin = 4 THEN power END) AS p4
          FROM spec GROUP BY event_type
        ),
        tot AS (
          SELECT event_type, p1, p2, p4,
                 CAST(p1 + p2 + p4 AS BIGINT) AS pt
          FROM piv
        )
        SELECT event_type, p1, p2, p4, pt,
               CAST(ROUND(-({terms}) * 1000.0) AS BIGINT)
                 AS entropy_mnat
        FROM tot
        ORDER BY event_type
    """


@register(
    "events_spectral_entropy",
    oracle=_spectral_entropy_sql(
        "epoch_ns(ts) // 86400000000000", "events", div="//"
    ),
    doc="Spectral entropy of each type's weekly/biweekly/monthly DFT "
    "power split (the events_weekly_spectrum integer basis): near 0 "
    "= one calendar period dominates (schedule around it), near "
    "ln 3 = flat spectrum (no calendar rhythm at these scales) — "
    "the one-number summary of the spectrum table. Powers are exact "
    "int64 anchors; the entropy is a FIXED 3-term textual ln fold "
    "over power ratios quantized ONCE to millinats (the "
    "image-entropy discipline — a raw ln double measured a real "
    "JVM-vs-glibc 1-ulp divergence this round). Scale shape: one "
    "(type, day) count + an 84-row basis join.",
    tags=("events", "forecast", "stats"),
)
def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sent")
    return spark.sql(
        _spectral_entropy_sql("ts DIV 86400000000000", "ev_sent")
    )


# ------------------------------------------------ stratified k-fold --

_SKF_FOLDS = 5

# Stratified k-fold: folds assigned by md5-deterministic rank WITHIN
# each source stratum, so every fold holds floor/ceil(n_s/k) docs of
# EVERY source — the split that keeps per-fold source mix identical
# where plain k-fold can starve a rare source.  The md5 hex-string
# order IS the shuffle (both engines sort the same strings — the
# balanced-downsample discipline); fold = (rank - 1) % k.
_SKF_SQL = """
        WITH draws AS (
          SELECT source, doc_id,
                 md5(CONCAT('skf:', CAST(doc_id AS {str_t}))) AS h
          FROM documents
        ),
        ranked AS (
          SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY h, doc_id) AS r
          FROM draws
        ),
        folds AS (
          SELECT source, doc_id,
                 CAST((r - 1) % {k} AS INTEGER) AS fold
          FROM ranked
        )
        SELECT fold, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM folds
        GROUP BY fold, source
        ORDER BY fold, source
"""


@register(
    "curation_stratified_kfold",
    oracle=_SKF_SQL.format(str_t="VARCHAR", k=_SKF_FOLDS),
    doc="Stratified 5-fold split over documents: fold assignment by "
    "md5-deterministic rank WITHIN each source stratum "
    "(fold = (rank-1) % k), so every fold carries floor/ceil(n_s/5) "
    "docs of EVERY source — per-fold source mix stays constant "
    "where curation_kfold_split's global hash can starve a rare "
    "source in a fold. The md5 hex-string ORDER is the shuffle "
    "(both engines sort identical strings; no int conversion "
    "needed). Emits per-(fold, source) sizes and an exact doc-id "
    "checksum pinning the exact assignment. Scale shape: one rank "
    "window per stratum, one rollup.",
    tags=("curation",),
)
def curation_stratified_kfold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    ).createOrReplaceTempView("documents")
    return spark.sql(_SKF_SQL.format(str_t="STRING", k=_SKF_FOLDS))
