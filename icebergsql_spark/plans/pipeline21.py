"""Round-11 gate wave #4 (pipeline21): WAP publish-by-id, capped
waterfilling budget allocation, Ljung-Box whiteness test, the
capture-recapture streaming twin, and silhouette clustering quality.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    local_result,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------- WAP publish by wap.id --


@register(
    "managed_wap_publish_by_id",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        WHERE o_orderkey % 3 IN (0, 1)
        GROUP BY 1 ORDER BY 1
    """,
    doc="Iceberg's wap.id publish flow (CALL system.publish_changes, "
    "sql.py): two audiences stage writes on separate branches with "
    "wap.id summaries; publish_changes locates the staged snapshot "
    "BY ID (not by branch name — the auditor does not need to know "
    "where the writer staged), cherry-picks it onto main with a "
    "published-wap-id marker, and REFUSES a second publish of the "
    "same id plus unknown/ambiguous ids. Asserted: main gains "
    "exactly audience A's rows, audience B stays staged-only, the "
    "publish commit records both cherry-picked-from and "
    "published-wap-id, and the duplicate publish raises. The "
    "decoupled write-audit-publish contract that lets a validation "
    "job gate data into production without coordinating with the "
    "writer. Final aggregate hash-matches the raw oracle over "
    "base + published rows.",
    tags=("managed", "sql", "wap"),
)
def managed_wap_publish_by_id(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-wapwh-"))
    tbl = eng.catalog.create_table(
        "t_wapid", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    tbl.insert(nonempty(base.filter(F.col("k") % 3 == 0)))
    eng.sql("ALTER TABLE t_wapid CREATE BRANCH wap_a")
    eng.sql("ALTER TABLE t_wapid CREATE BRANCH wap_b")
    tbl.insert(
        nonempty(base.filter(F.col("k") % 3 == 1)),
        branch="wap_a",
        extra_summary={"wap.id": "audit-1"},
    )
    tbl.insert(
        nonempty(base.filter(F.col("k") % 3 == 2)),
        branch="wap_b",
        extra_summary={"wap.id": "audit-2"},
    )
    mark_setup_done()  # staged fixture built; publish flow is the op
    tbl.refresh()
    main_before = tbl.meta.current_snapshot_id
    try:
        eng.sql(
            "CALL system.publish_changes(table => 't_wapid',"
            " wap_id => 'nope')"
        )
        raise AssertionError("unknown wap.id must be refused")
    except ValueError as ex:
        assert "no staged snapshot" in str(ex)
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == main_before, (
        "refused publish must not move main"
    )
    res = eng.sql(
        "CALL system.publish_changes(table => 't_wapid',"
        " wap_id => 'audit-1')"
    ).collect()[0]
    tbl.refresh()
    pub = tbl.meta.current_snapshot()
    assert pub.snapshot_id == res["current_snapshot_id"]
    assert pub.summary.get("published-wap-id") == "audit-1"
    assert pub.summary.get("cherry-picked-from") == str(
        res["source_snapshot_id"]
    )
    try:
        eng.sql(
            "CALL system.publish_changes(table => 't_wapid',"
            " wap_id => 'audit-1')"
        )
        raise AssertionError("duplicate publish must be refused")
    except ValueError as ex:
        assert "already published" in str(ex)
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM t_wapid GROUP BY m ORDER BY m"
    )


# ------------------------------------- capped waterfilling quotas --

# Integer waterfilling: demands d_s sorted ascending; the water level
# `cap` is the largest integer with sum(min(d_s, cap)) <= budget, found
# in ONE pass — at sorted position rn, if every smaller demand is fully
# granted, the level among the remaining (n - rn + 1) sources is
# (budget - pre_{rn-1}) DIV (n - rn + 1); the unique valid position has
# lag_d <= cap < d_rn.  The integer remainder (budget - granted) goes
# +1 to the first capped sources in (d, source) order, so the grant sum
# EQUALS the budget exactly.
_WF_SQL = """
        WITH srcs AS (
          SELECT source,
                 CAST(SUM(n_chars * (1 + doc_id % 7)) AS BIGINT)
                   AS demand
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT CAST(SUM(demand) * 5 {div} 10 AS BIGINT) AS budget,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM srcs
        ),
        ord AS (
          SELECT source, demand,
                 CAST(row_number() OVER (ORDER BY demand, source)
                      AS BIGINT) AS rn,
                 CAST(SUM(demand) OVER (ORDER BY demand, source)
                      AS BIGINT) AS pre
          FROM srcs
        ),
        cand AS (
          SELECT o.rn, o.demand, o.pre,
                 COALESCE(lag(o.demand) OVER (ORDER BY o.rn),
                          CAST(0 AS BIGINT)) AS prev_d,
                 CAST((t.budget - (o.pre - o.demand))
                      {div} (t.n - o.rn + 1) AS BIGINT) AS cap
          FROM ord o CROSS JOIN tot t
        ),
        pick AS (
          SELECT MIN(rn) AS rstar FROM cand
          WHERE cap < demand AND cap >= prev_d
        ),
        level AS (
          SELECT c.cap, c.rn AS rstar,
                 t.budget - (c.pre - c.demand)
                   - c.cap * (t.n - c.rn + 1) AS remainder
          FROM cand c CROSS JOIN tot t JOIN pick p ON p.rstar = c.rn
        ),
        grants AS (
          SELECT o.source, o.demand, o.rn,
                 CASE WHEN o.rn < l.rstar THEN o.demand
                      ELSE l.cap
                        + CASE WHEN o.rn - l.rstar < l.remainder
                               THEN 1 ELSE 0 END
                 END AS alloc,
                 CASE WHEN o.rn < l.rstar THEN 0 ELSE 1 END AS capped
          FROM ord o CROSS JOIN level l
        ),
        audit AS (
          SELECT CAST(SUM(alloc) AS BIGINT) AS granted FROM grants
        )
        SELECT g.source, g.demand, CAST(g.alloc AS BIGINT) AS alloc,
               CAST(g.capped AS INTEGER) AS capped,
               t.budget, a.granted
        FROM grants g CROSS JOIN tot t CROSS JOIN audit a
        ORDER BY g.source
"""


@register(
    "curation_capped_waterfill",
    oracle=_WF_SQL.format(div="//"),
    doc="Capped waterfilling allocation of a global token budget across "
    "sources (the max-min fair share every multi-source training-mix "
    "planner needs): each source demands its weighted char count, "
    "the budget is 50% of total demand, and the water level is the "
    "largest integer cap with sum(min(demand, cap)) <= budget — "
    "small sources get everything they asked for, large sources are "
    "clipped to the common level, and the integer remainder "
    "distributes +1 by deterministic (demand, source) order so the "
    "granted total equals the budget EXACTLY (emitted and asserted "
    "by column equality). Found in ONE sorted pass over 20 source "
    "rows via prefix sums — no iteration, no float. Scale shape: "
    "one per-source aggregate; everything after is O(sources).",
    tags=("curation",),
)
def curation_capped_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("documents",))[
        "documents"
    ].createOrReplaceTempView("documents")
    out = spark.sql(_WF_SQL.format(div="DIV"))
    return out


# --------------------------------------------- Ljung-Box whiteness --

# Deviations scaled by n so they stay integers: y_t = n*x_t - S.  The
# scale cancels in rho_k = sum(y_t y_{t+k}) / sum(y_t^2); rho is
# quantized to ppm ONCE and the Box statistic is then exact integer
# algebra: q_scaled = n(n+2) * sum_k rho_ppm_k^2 DIV (n-k).
# tail shared with the streaming twin (plans/pipeline30.py::
# events_stream_ljung_box), which substitutes a merged-partials
# `daily` head
_LB_TAIL_SQL = """
        idx AS (
          SELECT event_type, x,
                 CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn
          FROM daily
        ),
        st AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s
          FROM idx GROUP BY event_type
        ),
        y AS (
          SELECT i.event_type, i.rn,
                 CAST(st.n * i.x - st.s AS BIGINT) AS y
          FROM idx i JOIN st ON st.event_type = i.event_type
        ),
        den AS (
          SELECT event_type, CAST(SUM(y * y) AS BIGINT) AS den
          FROM y GROUP BY event_type
        ),
        ks AS (SELECT {kspine} AS k),
        num AS (
          SELECT a.event_type, ks.k,
                 CAST(SUM(a.y * b.y) AS BIGINT) AS num
          FROM y a
          CROSS JOIN ks
          JOIN y b ON b.event_type = a.event_type
                  AND b.rn = a.rn + ks.k
          GROUP BY 1, 2
        ),
        rho AS (
          SELECT n.event_type, n.k, n.num, d.den, st.n,
                 CASE WHEN d.den = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST(ROUND(1000000.0
                           * CAST(n.num AS DOUBLE)
                           / CAST(d.den AS DOUBLE)) AS BIGINT)
                 END AS rho_ppm
          FROM num n
          JOIN den d ON d.event_type = n.event_type
          JOIN st ON st.event_type = n.event_type
        )
        SELECT event_type, k, n, num, den, rho_ppm,
               CAST(n * (n + 2)
                    * SUM(rho_ppm * rho_ppm {div} (n - k)) OVER (
                        PARTITION BY event_type) AS BIGINT) AS q_scaled
        FROM rho
        ORDER BY event_type, k
"""

_LB_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
"""
    + _LB_TAIL_SQL
)


@register(
    "events_ljung_box",
    oracle=_LB_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        kspine="unnest(generate_series(1, 7))",
        div="//",
    ),
    doc="Ljung-Box whiteness test per event type over the daily volume "
    "series, lags 1..7: deviations scaled by n (y = n*x - S) keep "
    "every autocovariance an exact bigint, rho_k quantizes to ppm "
    "once, and the Box statistic n(n+2) sum rho_k^2/(n-k) is then "
    "pure integer algebra (emitted scaled by the ppm^2 factor). The "
    "is-anything-left-in-the-residuals portmanteau check a "
    "forecasting pipeline runs after detrending — a large Q says "
    "the series still carries structure (weekly seasonality shows "
    "up at lag 7). Per-(type, lag) sufficient statistics ride along "
    "exact. Scale shape: one (type, day) count, a 7-lag self-join "
    "over 30-row-per-type series (calendar-bounded, not "
    "data-sized).",
    tags=("events", "stats"),
)
def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_lb")
    return spark.sql(
        _LB_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_lb",
            kspine="explode(sequence(1, 7))",
            div="DIV",
        )
    )


# ----------------------------------- streaming capture-recapture --


def _cr_oracle() -> str:
    from icebergsql_spark.plans.pipeline20 import _CR_SQL

    return _CR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    )


@register(
    "events_stream_capture_recapture",
    oracle=_cr_oracle(),
    doc="STREAMING twin of events_capture_recapture: each micro-batch "
    "appends DISTINCT (type, user, day) sighting markers "
    "(set-mergeable — duplicates across batches collapse in the "
    "finalizer's DISTINCT, so replay/chopping cannot change the "
    "state), and the finalizer derives the survey halves from the "
    "merged span and runs the IDENTICAL Chapman-estimate SQL "
    "(shared _CR_SQL template with day_expr = the already-bucketed "
    "day). The live population estimate converging to the batch "
    "answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline20 import _CR_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-crssrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-crsout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                "event_type",
                "user_id",
                F.expr("ts DIV 86400000000000").alias("day"),
            )
            .distinct()
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-crsck-")
    (
        spark.read.parquet(out)
        .distinct()
        .createOrReplaceTempView("cr_merged")
    )
    return spark.sql(
        _CR_SQL.format(day_expr="day", src="cr_merged", div="DIV")
    )


# ------------------------------------------- silhouette score --

_SIL_MAX_ID = 300

# shared tail: consumes pd(i, j, dq) — exact pairwise quantized
# distances — and lab(vid, cell); everything after is identical on
# both engines (fraction compares happen on identical doubles, the
# silhouette quantizes to ppm, rollups are integer-exact)
_SIL_TAIL_SQL = """
        astat AS (
          SELECT p.i,
                 CAST(SUM(p.dq) AS BIGINT) AS an,
                 CAST(COUNT(*) AS BIGINT) AS ad
          FROM pd p
          JOIN lab li ON li.vid = p.i
          JOIN lab lj ON lj.vid = p.j
          WHERE li.cell = lj.cell
          GROUP BY p.i
        ),
        bmean AS (
          SELECT p.i, lj.cell AS oc,
                 CAST(SUM(p.dq) AS BIGINT) AS bn,
                 CAST(COUNT(*) AS BIGINT) AS bd
          FROM pd p
          JOIN lab li ON li.vid = p.i
          JOIN lab lj ON lj.vid = p.j
          WHERE li.cell <> lj.cell
          GROUP BY p.i, lj.cell
        ),
        bbest AS (
          SELECT i, bn, bd FROM (
            SELECT i, bn, bd,
                   row_number() OVER (PARTITION BY i
                     ORDER BY CAST(bn AS DOUBLE) / CAST(bd AS DOUBLE),
                              oc) AS rnk
            FROM bmean) t
          WHERE rnk = 1
        ),
        sil AS (
          SELECT l.vid, l.cell,
                 CASE WHEN a.ad IS NULL OR a.ad = 0
                        THEN CAST(0 AS BIGINT)
                      WHEN b.bn = 0 AND a.an = 0
                        THEN CAST(0 AS BIGINT)
                      ELSE CAST(ROUND(1000000.0
                           * (CAST(b.bn AS DOUBLE) / CAST(b.bd AS DOUBLE)
                              - CAST(a.an AS DOUBLE)
                                / CAST(a.ad AS DOUBLE))
                           / GREATEST(
                               CAST(b.bn AS DOUBLE) / CAST(b.bd AS DOUBLE),
                               CAST(a.an AS DOUBLE) / CAST(a.ad AS DOUBLE)))
                           AS BIGINT)
                 END AS sil_ppm
          FROM lab l
          LEFT JOIN astat a ON a.i = l.vid
          JOIN bbest b ON b.i = l.vid
        )
        SELECT cell,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(SUM(sil_ppm) AS BIGINT) AS sum_sil_ppm,
               CAST(MIN(sil_ppm) AS BIGINT) AS min_sil_ppm,
               CAST(MAX(sil_ppm) AS BIGINT) AS max_sil_ppm
        FROM sil
        GROUP BY cell
        ORDER BY cell
"""


def _sil_oracle() -> str:
    # kmeans replica (k = 8, 2 rounds + final assign) over the capped
    # id set — the plans/pipeline2._kmeans_oracle chain with a WHERE,
    # then exact pairwise quantized distances feed the shared tail.
    parts = [
        f"""xq AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
          WHERE vec_id < {_SIL_MAX_ID}
        ),
        c0 AS (SELECT vid AS cell, pos, q AS cq FROM xq WHERE vid < 8)"""
    ]
    argmin = "CAST(MIN(dq * 100 + cell) % 100 AS INTEGER)"
    for it in range(2):
        parts.append(f"""
        d{it + 1} AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c{it} c USING (pos) GROUP BY 1, 2
        ),
        a{it + 1} AS (
          SELECT vid, {argmin} AS cell
          FROM d{it + 1} GROUP BY vid
        ),
        c{it + 1} AS (
          SELECT a.cell, x.pos, CAST(SUM(x.q) // COUNT(*) AS BIGINT) AS cq
          FROM xq x JOIN a{it + 1} a USING (vid) GROUP BY 1, 2
        )""")
    parts.append("""
        dfin AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c2 c USING (pos) GROUP BY 1, 2
        ),
        lab AS MATERIALIZED (
          SELECT vid, CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS cell
          FROM dfin GROUP BY vid
        ),
        pd AS MATERIALIZED (
          SELECT i.vid AS i, j.vid AS j,
                 CAST(SUM((i.q - j.q) * (i.q - j.q)) AS BIGINT) AS dq
          FROM xq i JOIN xq j ON j.pos = i.pos AND j.vid <> i.vid
          GROUP BY 1, 2
        ),""")
    return "WITH " + ",".join(parts) + _SIL_TAIL_SQL


@register(
    "emb_silhouette_score",
    oracle=_sil_oracle(),
    doc="Silhouette clustering quality (Rousseeuw 1987) over the k-means "
    "partition (operators/ml.kmeans_assign, k=8, the reproducible "
    "integer-quantized clustering): per point, a = mean exact "
    "quantized squared distance to its own cluster, b = the smallest "
    "other-cluster mean (fraction compare on identical doubles with "
    "a deterministic cluster tiebreak), s = (b - a)/max(a, b) "
    "quantized to ppm; singletons take the s = 0 convention. The "
    "per-cluster rollup (count, sum/min/max sil_ppm) is the "
    "did-the-clustering-actually-separate audit run before anyone "
    "trusts semantic-dedup buckets. Capped probe set (vec_id < 300) "
    "bounds the quadratic pairwise pass exactly like the "
    "brute-force ANN baselines; the oracle replays the full kmeans "
    "round chain plus the pairwise algebra.",
    tags=("embeddings", "curation"),
)
def emb_silhouette_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import _quantized, kmeans_assign
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
        track_cache,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(
            F.col("vec_id") < _SIL_MAX_ID
        )
    )
    # localCheckpoint: SQL references would replay the kmeans lineage
    lab = kmeans_assign(emb, k=8, iterations=2).localCheckpoint()
    lab.createOrReplaceTempView("lab")
    xq = track_cache(_quantized(emb, "embedding", "vec_id"))
    a, b = xq.alias("a"), xq.alias("b")
    pd_df = a.join(b, F.col("a.vid") != F.col("b.vid")).select(
        F.col("a.vid").alias("i"),
        F.col("b.vid").alias("j"),
        F.expr(
            "aggregate(zip_with(a.xq, b.xq, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("dq"),
    )
    pd_df.createOrReplaceTempView("pd")
    out = spark.sql("WITH " + _SIL_TAIL_SQL.lstrip())
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)
