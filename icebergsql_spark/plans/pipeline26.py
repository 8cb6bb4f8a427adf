"""Round-11 gate wave #9 (pipeline26): two-sample log-rank survival
test and the theta-sketch a-not-b estimate.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    register,
    run_partial_stream,
)

# --------------------------------------------- log-rank test --

# Subjects are the inter-purchase gaps of events_survival_km (real
# right-censoring at dataset end), split by the user's arm.  Per-event-
# time hypergeometric terms are rationals over exact integers; each is
# quantized ONCE to 1e-9 units so the O-E and variance SUMS are
# integer-exact, and z is the single mirrored float tail.
# tail shared with the streaming twin (events_stream_logrank below),
# which substitutes a merged distinct-sighting `pd` head
_LOGRANK_TAIL_SQL = """
        mx AS (SELECT MAX(day) AS m FROM pd),
        gaps AS (
          SELECT user_id, day,
                 lead(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS nxt
          FROM pd
        ),
        obs AS (
          SELECT CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(COALESCE(nxt, mx.m) - day AS BIGINT) AS t,
                 CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
          FROM gaps CROSS JOIN mx
        ),
        times AS (SELECT DISTINCT t FROM obs WHERE ev = 1),
        risk AS (
          SELECT ti.t,
                 CAST(SUM(CASE WHEN o.arm = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN o.arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN o.arm = 1 AND o.t = ti.t
                               AND o.ev = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d1,
                 CAST(SUM(CASE WHEN o.arm = 0 AND o.t = ti.t
                               AND o.ev = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d0
          FROM times ti JOIN obs o ON o.t >= ti.t
          GROUP BY ti.t
        ),
        q AS (
          SELECT t,
                 CAST(ROUND(1000000000.0
                      * (CAST(d1 AS DOUBLE)
                         - CAST(d1 + d0 AS DOUBLE)
                           * CAST(n1 AS DOUBLE)
                           / CAST(n1 + n0 AS DOUBLE))) AS BIGINT)
                   AS oe_q,
                 CASE WHEN n1 + n0 > 1 THEN
                   CAST(ROUND(1000000000.0
                        * (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                           * CAST(d1 + d0 AS DOUBLE)
                           * CAST(n1 + n0 - d1 - d0 AS DOUBLE))
                        / (CAST(n1 + n0 AS DOUBLE)
                           * CAST(n1 + n0 AS DOUBLE)
                           * CAST(n1 + n0 - 1 AS DOUBLE))) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END AS v_q
          FROM risk
        ),
        tot AS (
          SELECT CAST(SUM(oe_q) AS BIGINT) AS oe_q,
                 CAST(SUM(v_q) AS BIGINT) AS v_q,
                 CAST(COUNT(*) AS BIGINT) AS n_times
          FROM q
        ),
        base AS (
          SELECT
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS subj1,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS subj0,
            CAST(SUM(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
              AS ev1,
            CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
              AS ev0
          FROM obs
        )
        SELECT base.subj1, base.subj0, base.ev1, base.ev0,
               tot.n_times, tot.oe_q, tot.v_q,
               CASE WHEN tot.v_q > 0
                    THEN (CAST(tot.oe_q AS DOUBLE) / 1000000000.0)
                         / sqrt(CAST(tot.v_q AS DOUBLE)
                                / 1000000000.0)
               END AS z
        FROM base CROSS JOIN tot
"""

_LOGRANK_SQL = (
    """
        WITH pd AS (
          SELECT DISTINCT user_id, {day_expr} AS day
          FROM {src} WHERE event_type = 'purchase'
        ),
"""
    + _LOGRANK_TAIL_SQL
)


@register(
    "events_logrank_test",
    oracle=_LOGRANK_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Two-sample log-rank test (Mantel-Cox) on the inter-purchase "
    "gap survival curves by arm — the hypothesis test that belongs "
    "next to events_survival_km's curve: at each distinct event "
    "time, the observed arm-1 deaths against the hypergeometric "
    "expectation given the pooled risk set, with the matching "
    "variance. Each per-time rational term quantizes ONCE to 1e-9 "
    "units so the O-E and variance sums are integer-exact (the "
    "float-sum-order hazard never arises); subjects/events per arm "
    "ride along exact, z is the single mirrored float. Censored "
    "final gaps enter risk sets but never the event times — the "
    "property that makes log-rank valid under right-censoring where "
    "a naive mean-gap t-test is biased. Scale shape: risk sets join "
    "distinct event times (bounded by the calendar) x subjects.",
    tags=("events", "stats"),
)
def events_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_lr")
    return spark.sql(
        _LOGRANK_SQL.format(day_expr="ts DIV 86400000000000", src="ev_lr")
    )


# ------------------------------------------ theta a-not-b estimate --

_KMV_SC = "4503599627370496.0"  # 16^13, exact in a double


def _kmv_diff_oracle() -> str:
    def sk(alias: str, etype: str) -> str:
        return f"""
        {alias} AS (
          SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
          FROM events WHERE event_type = '{etype}'
          ORDER BY h LIMIT 256
        ),
        {alias}_s AS (SELECT MAX(h) AS hk, COUNT(*) AS m FROM {alias})"""

    def pair(pid: str, t1: str, t2: str) -> str:
        return f"""
        {pid}_theta AS (
          SELECT LEAST(
            CASE WHEN a.m >= 256 THEN
              CAST(CAST('0x' || substr(a.hk, 1, 13) AS BIGINT) AS DOUBLE)
                / {_KMV_SC} ELSE 1.0 END,
            CASE WHEN b.m >= 256 THEN
              CAST(CAST('0x' || substr(b.hk, 1, 13) AS BIGINT) AS DOUBLE)
                / {_KMV_SC} ELSE 1.0 END) AS th
          FROM sk_{t1}_s a, sk_{t2}_s b
        ),
        {pid}_samp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT h FROM sk_{t1} EXCEPT SELECT h FROM sk_{t2}
          ) i, {pid}_theta t
          WHERE CAST(CAST('0x' || substr(i.h, 1, 13) AS BIGINT) AS DOUBLE)
                  / {_KMV_SC} < t.th
        ),
        {pid}_exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS x FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = '{t1}'
            EXCEPT
            SELECT DISTINCT user_id FROM events WHERE event_type = '{t2}'
          )
        ),
        {pid}_row AS (
          SELECT '{t1}' AS t1, '{t2}' AS t2, e.x AS exact_diff,
                 CAST(round(s.c / t.th) AS BIGINT) AS est_diff
          FROM {pid}_samp s, {pid}_theta t, {pid}_exact e
        )"""

    types = ["click", "purchase", "view"]
    parts = [sk(f"sk_{t}", t) for t in types]
    pairs = [
        ("p1", "click", "purchase"),
        ("p2", "view", "purchase"),
        ("p3", "purchase", "signup"),
    ]
    parts += [pair(pid, a, b) for pid, a, b in pairs]
    parts.insert(3, sk("sk_signup", "signup"))
    sel = " UNION ALL ".join(
        f"SELECT * FROM {pid}_row" for pid, _, _ in pairs
    )
    return (
        "WITH "
        + ",".join(parts)
        + f" SELECT t1, t2, exact_diff, est_diff,"
        f" CAST(abs(est_diff - exact_diff) * 1000000"
        f" // (CASE WHEN exact_diff > 0 THEN exact_diff ELSE 1 END)"
        f" AS BIGINT) AS err_ppm"
        f" FROM ({sel}) ORDER BY t1, t2"
    )


@register(
    "sketch_kmv_difference",
    oracle=_kmv_diff_oracle(),
    doc="Theta-style KMV a-not-b estimates (operators/sketch.py::"
    "kmv_difference_estimate — the third theta set operation next to "
    "union and intersection), CALIBRATED against the exact set "
    "difference in the same result: clicked-but-never-purchased, "
    "viewed-but-never-purchased, purchased-but-never-signed-up — the "
    "audience-exclusion questions every funnel dashboard asks. θ = "
    "min of the two k-th-hash fractions (1.0 while exhaustive — the "
    "estimate is then exact, which the small-SF rows demonstrate), "
    "sample = A's sub-θ hashes absent from B, estimate = |sample|/θ. "
    "The md5 bottom-k construction is bit-identical in DuckDB, so "
    "even the approximate answer hash-matches. At 100 TB: two k-row "
    "sketch scans per question.",
    tags=("sketch", "events"),
)
def sketch_kmv_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch
    from icebergsql_spark.plans.registry import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    types = ["click", "purchase", "view", "signup"]
    users = {
        t: ev.filter(F.col("event_type") == t).select("user_id").distinct()
        for t in types
    }
    sketches = {t: sketch.kmv_sketch(users[t], "user_id") for t in types}
    rows = []
    for t1, t2 in [
        ("click", "purchase"),
        ("view", "purchase"),
        ("purchase", "signup"),
    ]:
        est = sketch.kmv_difference_estimate(sketches[t1], sketches[t2])
        exact = (
            users[t1]
            .join(users[t2], "user_id", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_diff"))
        )
        rows.append(
            exact.crossJoin(est).select(
                F.lit(t1).alias("t1"),
                F.lit(t2).alias("t2"),
                "exact_diff",
                F.col("est").alias("est_diff"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "t1",
        "t2",
        "exact_diff",
        "est_diff",
        F.expr(
            "CAST(abs(est_diff - exact_diff) * 1000000"
            " DIV (CASE WHEN exact_diff > 0 THEN exact_diff ELSE 1 END)"
            " AS BIGINT)"
        ).alias("err_ppm"),
    ).orderBy("t1", "t2")


# ------------------------------------- log-rank streaming twin --


@register(
    "events_stream_logrank",
    oracle=_LOGRANK_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_logrank_test: each micro-batch "
    "appends DISTINCT (user, purchase-day) sighting markers "
    "(set-mergeable — replay/chopping collapse in the finalizer's "
    "DISTINCT), and the finalizer rebuilds the gap subjects and runs "
    "the IDENTICAL risk-set/hypergeometric tail SQL (shared "
    "_LOGRANK_TAIL_SQL template). Gap censoring is a property of the "
    "merged state, not of batch boundaries — an open gap stays "
    "censored only if no later batch closes it. The live survival "
    "A/B monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-lrssrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-lrsout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.filter(F.col("event_type") == "purchase")
            .select(
                "user_id", F.expr("ts DIV 86400000000000").alias("day")
            )
            .distinct()
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-lrsck-")
    (
        spark.read.parquet(out)
        .distinct()
        .createOrReplaceTempView("lr_sightings")
    )
    return spark.sql(
        """
        WITH pd AS (
          SELECT DISTINCT user_id, day FROM lr_sightings
        ),
"""
        + _LOGRANK_TAIL_SQL
    )
