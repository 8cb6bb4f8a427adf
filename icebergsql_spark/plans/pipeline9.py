"""Round-8 operator wave: video frame-payload decoding, branch-retention
expiry, rank/sketch/survival statistics, JL random projection, BFS
distances, and a deterministic bootstrap.

Each query registers a PySpark callable plus a DuckDB oracle; names sit at
the head of ``plans/__init__.WINDOW_PRIORITY`` so every one receives a
driver CORRECTNESS row this round. Determinism contract as everywhere:
integer arithmetic on the hot path, sequential ``aggregate()`` folds for
float reductions (bit-matching DuckDB ``list_sum``), single final float
ops in matching operand order, and non-negative operands for integer
division (Spark ``div`` truncates, DuckDB ``//`` floors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    local_result,
    nonempty,
    register,
    run_partial_stream,
)


@register(
    "multimodal_frame_pixels",
    oracle="""
        WITH f AS (
          SELECT doc_id, CAST(3 + doc_id % 4 AS INTEGER) AS nf
          FROM documents
        ),
        per AS (
          SELECT doc_id, nf,
                 CAST((nf + 1) // 2 AS INTEGER) AS ns,
                 list_transform(generate_series(0, (nf - 1) // 2),
                                s -> s * 2) AS sampled
          FROM f
        )
        SELECT doc_id,
               nf AS n_frames,
               ns AS n_sampled,
               ns AS n_decoded,
               CAST(list_sum(list_transform(sampled, j ->
                 list_sum(list_transform(generate_series(0, 7), p ->
                   (doc_id * 7 + j * 13 + 3 * p) % 256)))) AS BIGINT)
                 AS r_sum,
               CAST(list_sum(list_transform(sampled, j ->
                 list_sum(list_transform(generate_series(0, 7), p ->
                   (doc_id * 7 + j * 13 + 3 * p + 1) % 256)))) AS BIGINT)
                 AS g_sum,
               CAST(list_sum(list_transform(sampled, j ->
                 list_sum(list_transform(generate_series(0, 7), p ->
                   (doc_id * 7 + j * 13 + 3 * p + 2) % 256)))) AS BIGINT)
                 AS b_sum
        FROM per
        ORDER BY doc_id
    """,
    doc="Video frame PAYLOAD decode (round 8 — frames stop being opaque "
    "bytes; closes the r7 verdict's video gap): each doc carries a RIFF "
    "AVI container of 3+doc_id%4 frames, each frame an EMBEDDED 4x2 PPM "
    "image (pixel byte b of frame j = (doc_id*7+j*13+b) % 256); "
    "operators/multimodal.riff_frame_pixels walks the real chunk index, "
    "samples every 2nd frame, routes each frame's bytes through the real "
    "decode_image, and reduces to exact int64 per-channel sums. The "
    "oracle recomputes every sampled frame's channel sums in closed "
    "form, so a chunk-walk desync, header mis-parse, or channel swap "
    "hash-mismatches. Demux→decode→reduce is one Arrow-batched narrow "
    "map — frame-local, no shuffle, scales with executors at 100 TB.",
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [
                    multimodal.encode_ppm(
                        4,
                        2,
                        bytes(
                            (d * 7 + j * 13 + b) % 256 for b in range(24)
                        ),
                    )
                    for j in range(3 + d % 4)
                ]
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.riff_frame_pixels(blobs, every=2).orderBy("doc_id")


@register(
    "managed_branch_expiry",
    oracle="""
        WITH o AS (SELECT o_orderkey AS k,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders)
        SELECT scope, n, total FROM (
          SELECT 'branch' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 5 IN (0, 1, 2)
          UNION ALL
          SELECT 'main' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 5 = 4
          UNION ALL
          SELECT 'tag' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 5 = 0
        ) ORDER BY scope
    """,
    doc="Branch-aware snapshot retention (round 8 — the third leg next "
    "to ref-pinned GC and branch-scoped rewrite_manifests): five commits "
    "build main/tag/branch lineages (appends b0,b1 → tag v1@s1, branch "
    "audit@s2 with min_snapshots_to_keep=2 → branch append b2 → main "
    "append b3 → main OVERWRITE b4), then expire_snapshots(retain_last="
    "1) runs. The query asserts in-DAG that exactly the unreferenced "
    "overwritten snapshot (s4) expired — current, tag, branch head AND "
    "its protected ancestor all survive — that s4's no-longer-referenced "
    "files were GC'd from disk, and that every surviving lineage still "
    "scans; it returns per-scope counts/totals the oracle recomputes "
    "from the raw table. Retention policy: table.py expire_snapshots "
    "(per-ref min_snapshots_to_keep walk) — metadata-only planning, no "
    "data IO beyond the bounded GC delete set.",
    tags=("managed", "maintenance"),
)
def managed_branch_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-brexp-"))
    tbl = eng.catalog.create_table("ord_brexp", "k bigint, c bigint, m int",
                                   ["m"])
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        (F.col("o_orderkey") % 5).cast("int").alias("m"),
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("m") == 0)))
    s2 = tbl.insert(nonempty(base.filter(F.col("m") == 1)))
    mark_setup_done()  # history built; branch-aware expiry is the op
    tbl.create_tag("v1", s1.snapshot_id)
    tbl.create_branch("audit", s2.snapshot_id, min_snapshots_to_keep=2)
    s3 = tbl.insert(nonempty(base.filter(F.col("m") == 2)), branch="audit")
    s4 = tbl.insert(nonempty(base.filter(F.col("m") == 3)))
    s5 = tbl.insert(nonempty(base.filter(F.col("m") == 4)), overwrite=True)

    res = tbl.expire_snapshots(retain_last=1)
    tbl.refresh()
    ids = {s.snapshot_id for s in tbl.meta.snapshots}
    assert ids == {
        s1.snapshot_id, s2.snapshot_id, s3.snapshot_id, s5.snapshot_id
    }, f"retention kept the wrong set: {sorted(ids)}"
    assert res["expired_snapshots"] == 1
    # b3's files were reachable ONLY from the expired s4 → GC'd
    assert res["deleted_data_files"] >= 1, "expected s4-only files GC'd"
    refs = {r["name"]: r for r in tbl.refs_df().collect()}
    assert refs["audit"]["minSnapshotsToKeep"] == 2
    # time travel to the expired snapshot must now fail
    try:
        tbl.to_df(snapshot_id=s4.snapshot_id)
        raise AssertionError("expired snapshot still resolvable")
    except ValueError:
        pass

    def agg(df, scope):
        return df.agg(
            F.lit(scope).alias("scope"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
        )

    return (
        agg(tbl.to_df(ref="audit"), "branch")
        .unionAll(agg(tbl.to_df(), "main"))
        .unionAll(agg(tbl.to_df(ref="v1"), "tag"))
        .orderBy("scope")
    )


@register(
    "events_mann_whitney_u",
    oracle="""
        WITH pc AS (
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS g,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        rk AS (
          SELECT g,
                 CAST(rank() OVER (ORDER BY c) AS BIGINT) AS m,
                 CAST(COUNT(*) OVER (PARTITION BY c) AS BIGINT) AS k
          FROM pc
        ),
        agg AS (
          SELECT
            CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(SUM(CASE WHEN g = 0 THEN 2 * m + k - 1 ELSE 0 END)
                 AS BIGINT) AS r1_2,
            CAST(SUM(CASE WHEN g = 1 THEN 2 * m + k - 1 ELSE 0 END)
                 AS BIGINT) AS r2_2
          FROM rk
        ),
        u AS (
          SELECT n1, n2,
                 CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
                 CAST(r2_2 - n2 * (n2 + 1) AS BIGINT) AS u2_x2
          FROM agg
        )
        SELECT n1, n2, u1_x2, u2_x2,
               CAST(u1_x2 - n1 * n2 AS DOUBLE)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        * CAST(n1 + n2 + 1 AS DOUBLE) / 3.0) AS z
        FROM u
    """,
    doc="Mann-Whitney U rank-sum test between even/odd user cohorts on "
    "per-user purchase counts — the nonparametric two-sample test a "
    "curation pipeline runs when count distributions are skewed and the "
    "Welch t-test's normality assumption is wrong (agg_welch_ttest's "
    "sibling). Tie handling is EXACT in integers: doubled average ranks "
    "2m+k-1 (min-rank window + per-value tie count), so U1/U2 are exact "
    "bigints (x2) and U1+U2 == 2*n1*n2 by construction. The z "
    "normalization is one sqrt/division in textually identical operand "
    "order. Scale shape: per-user counts are one shuffle, the rank is a "
    "single global sort of |users| rows (bounded, not event volume).",
    tags=("events", "stats", "agg"),
)
def events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH pc AS (
          SELECT user_id, CAST(user_id % 2 AS INT) AS g,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        rk AS (
          SELECT g,
                 CAST(rank() OVER (ORDER BY c) AS BIGINT) AS m,
                 CAST(COUNT(*) OVER (PARTITION BY c) AS BIGINT) AS k
          FROM pc
        ),
        agg AS (
          SELECT
            CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
            CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
            CAST(SUM(CASE WHEN g = 0 THEN 2 * m + k - 1 ELSE 0 END)
                 AS BIGINT) AS r1_2,
            CAST(SUM(CASE WHEN g = 1 THEN 2 * m + k - 1 ELSE 0 END)
                 AS BIGINT) AS r2_2
          FROM rk
        ),
        u AS (
          SELECT n1, n2,
                 CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
                 CAST(r2_2 - n2 * (n2 + 1) AS BIGINT) AS u2_x2
          FROM agg
        )
        SELECT n1, n2, u1_x2, u2_x2,
               CAST(u1_x2 - n1 * n2 AS DOUBLE)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        * CAST(n1 + n2 + 1 AS DOUBLE) / 3.0) AS z
        FROM u
    """)


@register(
    "sketch_ams_f2",
    oracle="""
        WITH pc AS (
          SELECT user_id AS u, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1
        ),
        exact AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2 FROM pc),
        signs AS (
          SELECT pc.u, pc.c, r.r,
                 CAST('0x' || substr(md5(CAST(pc.u AS VARCHAR) || '#'
                      || CAST(r.r AS VARCHAR)), 1, 6) AS BIGINT)
                   % 2 * 2 - 1 AS s
          FROM pc CROSS JOIN
               (SELECT unnest(generate_series(0, 8)) AS r) r
        ),
        ests AS (
          SELECT r, CAST(SUM(s * c) AS BIGINT) AS sr
          FROM signs GROUP BY 1
        ),
        med AS (
          SELECT CAST(list_sort(list(sr * sr))[5] AS BIGINT) AS m
          FROM ests
        )
        SELECT exact.f2 AS exact_f2,
               med.m AS median_est,
               CAST(abs(med.m - exact.f2) * 1000000 // exact.f2
                    AS BIGINT) AS err_ppm
        FROM exact CROSS JOIN med
    """,
    doc="AMS (Alon-Matias-Szegedy) F2 sketch of the per-user event-count "
    "vector: 9 independent {-1,+1} hash streams (md5-derived, "
    "bit-identical across engines), each collapsing the whole vector to "
    "ONE bigint inner product whose square estimates the second moment; "
    "the median of the 9 squares is the classic variance-bounded "
    "estimate, compared against the exact F2 in integer ppm. The sketch "
    "state is 9 numbers and merges by ADDITION across partitions/"
    "batches — the self-join-size / skew estimator that runs where the "
    "exact SUM(c^2) cannot (streaming, pre-shuffle planning). Everything "
    "is exact bigint arithmetic (no floats anywhere), so Spark and "
    "DuckDB agree to the last digit.",
    tags=("sketch", "agg"),
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    pc = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    signs = pc.select(
        "u", "c", F.explode(F.sequence(F.lit(0), F.lit(8))).alias("r")
    ).withColumn(
        "s",
        F.expr(
            "conv(substr(md5(concat(CAST(u AS STRING), '#',"
            " CAST(r AS STRING))), 1, 6), 16, 10) % 2 * 2 - 1"
        ).cast("bigint"),
    )
    ests = signs.groupBy("r").agg(F.sum(F.col("s") * F.col("c")).cast("bigint").alias("sr"))
    med = ests.agg(
        F.expr("sort_array(collect_list(sr * sr))[4]").cast("bigint").alias("m")
    )
    exact = pc.agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2"))
    return exact.crossJoin(med).select(
        F.col("f2").alias("exact_f2"),
        F.col("m").alias("median_est"),
        F.expr("CAST(abs(m - f2) * 1000000 DIV f2 AS BIGINT)").alias(
            "err_ppm"
        ),
    )


_EDGE_SQL = """
        WITH w AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   regexp_split_to_array(trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < 120
        ),
        half AS (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= 74
        ),
        e AS (SELECT a, b FROM half UNION ALL SELECT b, a FROM half)
"""


@register(
    "graph_bfs_distance",
    oracle=_EDGE_SQL + """,
        nodes AS (SELECT DISTINCT a AS n FROM e),
        seeds AS (SELECT n FROM nodes ORDER BY n LIMIT 3),
        f0 AS (SELECT n FROM seeds),
        f1 AS (
          SELECT DISTINCT e.b AS n FROM e JOIN f0 ON e.a = f0.n
          WHERE e.b NOT IN (SELECT n FROM f0)
        ),
        f2 AS (
          SELECT DISTINCT e.b AS n FROM e JOIN f1 ON e.a = f1.n
          WHERE e.b NOT IN (SELECT n FROM f0)
            AND e.b NOT IN (SELECT n FROM f1)
        ),
        f3 AS (
          SELECT DISTINCT e.b AS n FROM e JOIN f2 ON e.a = f2.n
          WHERE e.b NOT IN (SELECT n FROM f0)
            AND e.b NOT IN (SELECT n FROM f1)
            AND e.b NOT IN (SELECT n FROM f2)
        ),
        lv AS (
          SELECT 0 AS dist, n FROM f0
          UNION ALL SELECT 1, n FROM f1
          UNION ALL SELECT 2, n FROM f2
          UNION ALL SELECT 3, n FROM f3
        )
        SELECT CAST(dist AS INTEGER) AS dist,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CAST('0x' || substr(md5(n), 1, 6) AS BIGINT))
                    AS BIGINT) AS node_digest
        FROM lv GROUP BY dist ORDER BY dist
    """,
    doc="Multi-source BFS distances on the token co-occurrence graph "
    "(3 frontier expansions from the 3 lexicographically-smallest "
    "nodes): per-distance node counts plus an md5 node-set digest so a "
    "single mis-leveled node hash-mismatches. The Spark plan is the "
    "100-TB BFS shape — each round is ONE equi-join of the frontier "
    "against the edge list plus an anti-join against the visited set, "
    "with localCheckpoint per round to keep the unrolled lineage linear "
    "(the graph_kcore_trace lesson); frontiers/visited stay DataFrames "
    "end-to-end, no driver materialization. Oracle: unrolled frontier "
    "CTEs over the same edge build.",
    tags=("graph", "join"),
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 120
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    half = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 74)
        .select("a", "b")
        .localCheckpoint()
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    frontier = (
        e.select(F.col("a").alias("n"))
        .distinct()
        .orderBy("n")
        .limit(3)
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    visited = frontier
    for d in range(1, 4):
        frontier = (
            e.join(frontier.select(F.col("n").alias("a")), "a")
            .select(F.col("b").alias("n"))
            .distinct()
            .join(visited.select("n"), "n", "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint()
        )
        visited = visited.unionAll(frontier).localCheckpoint()
    return (
        visited.groupBy(F.col("dist").cast("int").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(
                F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            ).cast("bigint").alias("node_digest"),
        )
        .orderBy("dist")
    )


@register(
    "events_survival_km",
    oracle="""
        WITH pd AS (
          SELECT DISTINCT user_id,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events WHERE event_type = 'purchase'
        ),
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
        tbl AS (
          SELECT o1.t AS t,
                 CAST(SUM(o1.ev) AS BIGINT) AS d_t,
                 MAX(r.n_risk) AS n_risk
          FROM obs o1
          JOIN (
            SELECT a.t, CAST(COUNT(*) AS BIGINT) AS n_risk
            FROM (SELECT DISTINCT t FROM obs) a JOIN obs b ON b.t >= a.t
            GROUP BY a.t
          ) r ON r.t = o1.t
          GROUP BY o1.t
          HAVING SUM(o1.ev) > 0
        ),
        tbl2 AS (SELECT * FROM tbl WHERE n_risk > d_t)
        SELECT t, n_risk, d_t,
               CAST(round(exp(SUM(ln(CAST(n_risk - d_t AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t)) * 1000000.0) AS BIGINT)
                 AS surv_micro
        FROM tbl2 ORDER BY t
    """,
    doc="Kaplan-Meier survival of inter-purchase gaps: each subject is "
    "one (purchase-day -> next-purchase-day) interval per user, "
    "RIGHT-CENSORED at the dataset end for the final open interval "
    "(nxt IS NULL) — real censoring, unlike user lifetimes in this "
    "synthetic corpus where every user stays active to the last week. "
    "Per distinct gap t: risk set n_t (gaps >= t, censored included "
    "until exit), deaths d_t, product-limit estimator computed as exp "
    "of a CUMULATIVE ln-sum — the events_holt_smoothing determinism "
    "recipe (ln/exp/div bit-identical; the window cumulative sum adds "
    "in t-order on both sides; the estimate is emitted in rounded "
    "micro-units, the chi2_micro convention, because the engines's "
    "window accumulators differ in the last ulp). Day buckets from "
    "events_ts_to_nanos bigint-nanos layer (DIV 86400e9, non-negative "
    "operands). Scale shape: gaps are one window over purchase days; "
    "the risk-set count is bounded by distinct t, not event volume.",
    tags=("events", "stats", "window"),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH pd AS (
          SELECT DISTINCT user_id, ts DIV 86400000000000 AS day
          FROM events WHERE event_type = 'purchase'
        ),
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
        tbl AS (
          SELECT o1.t AS t,
                 CAST(SUM(o1.ev) AS BIGINT) AS d_t,
                 MAX(r.n_risk) AS n_risk
          FROM obs o1
          JOIN (
            SELECT a.t, CAST(COUNT(*) AS BIGINT) AS n_risk
            FROM (SELECT DISTINCT t FROM obs) a JOIN obs b ON b.t >= a.t
            GROUP BY a.t
          ) r ON r.t = o1.t
          GROUP BY o1.t
          HAVING SUM(o1.ev) > 0
        ),
        tbl2 AS (SELECT * FROM tbl WHERE n_risk > d_t)
        SELECT t, n_risk, d_t,
               CAST(round(exp(SUM(ln(CAST(n_risk - d_t AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t)) * 1000000.0) AS BIGINT)
                 AS surv_micro
        FROM tbl2 ORDER BY t
    """)


@register(
    "emb_random_projection_jl",
    oracle="""
        WITH e AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
          FROM embeddings
        ),
        per AS (
          SELECT vec_id,
            list_sum(list_transform(ed, x -> x * x)) AS nrm,
            list_transform(generate_series(0, 7), j ->
              list_sum(list_transform(generate_series(1, len(ed)), i ->
                (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || '#'
                      || CAST(j AS VARCHAR)), 1, 6) AS BIGINT)
                 % 2 * 2 - 1) * ed[i]))) AS pj
          FROM e
        ),
        r AS (
          SELECT vec_id,
            list_sum(list_transform(pj, p -> p * p)) / (8.0 * nrm)
              AS ratio
          FROM per WHERE nrm > 0
        )
        SELECT CAST(floor(ratio * 4.0) AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY 1 ORDER BY 1
    """,
    doc="Johnson-Lindenstrauss random projection audit: every embedding "
    "is projected to k=8 dimensions with a DETERMINISTIC +/-1 sign "
    "matrix (sign(i,j) from md5 — bit-identical across engines, no RNG "
    "state to ship), and the norm-preservation ratio "
    "||Px||^2 / (k*||x||^2) (expectation 1 under JL) is histogrammed in "
    "quarter-wide buckets. This is the dimensionality-reduction "
    "pre-pass for 100-TB ANN — project once, bucket/index in k dims — "
    "and the histogram is the check that the projection is usable "
    "before committing the index build. Determinism: projections and "
    "norms are sequential aggregate() folds (bit-matching DuckDB "
    "list_sum), one division in fixed operand order, floor-bucketed. "
    "Narrow map over vectors — no shuffle until the bounded histogram.",
    tags=("embeddings", "similarity"),
)
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    from icebergsql_spark.operators.util import ensure_parallelism

    sign = (
        "(CAST(conv(substr(md5(concat(CAST(i AS STRING), '#',"
        " CAST(j AS STRING))), 1, 6), 16, 10) AS BIGINT) % 2 * 2 - 1)"
    )
    return (
        ensure_parallelism(emb)
        .withColumn(
            "ed", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        )
        .withColumn(
            "nrm", F.expr("aggregate(ed, 0.0D, (acc, x) -> acc + x * x)")
        )
        .filter(F.col("nrm") > 0)
        .withColumn(
            "pj",
            F.expr(
                "transform(sequence(0, 7), j ->"
                " aggregate(sequence(1, size(ed)), 0.0D,"
                f" (acc, i) -> acc + {sign} * element_at(ed, i)))"
            ),
        )
        .withColumn(
            "ratio",
            F.expr("aggregate(pj, 0.0D, (acc, p) -> acc + p * p)")
            / (F.lit(8.0) * F.col("nrm")),
        )
        .groupBy(
            F.floor(F.col("ratio") * 4.0).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("bucket")
    )


@register(
    "events_bootstrap_ci",
    oracle="""
        WITH dc AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dc),
        idx AS (
          SELECT c,
                 CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i
          FROM dc
        ),
        draws AS (
          SELECT r.r,
                 CAST('0x' || substr(md5(CAST(r.r AS VARCHAR) || '#'
                      || CAST(d.i AS VARCHAR)), 1, 6) AS BIGINT)
                   % nn.n AS pick
          FROM (SELECT unnest(generate_series(0, 199)) AS r) r
          CROSS JOIN idx d CROSS JOIN nn
        ),
        sums AS (
          SELECT draws.r, CAST(SUM(idx.c) AS BIGINT) AS s
          FROM draws JOIN idx ON idx.i = draws.pick
          GROUP BY 1
        ),
        srt AS (SELECT list_sort(list(s)) AS l FROM sums)
        SELECT (SELECT n FROM nn) AS n_days,
               CAST(200 AS BIGINT) AS b,
               (SELECT CAST(SUM(c) AS BIGINT) FROM dc) AS obs_total,
               CAST(l[6] AS BIGINT) AS lo_sum,
               CAST(l[195] AS BIGINT) AS hi_sum
        FROM srt
    """,
    doc="Deterministic bootstrap confidence interval for the daily "
    "purchase volume: 200 resamples of the per-day count vector, where "
    "resample r's i-th draw picks day md5(r#i) % n — a reproducible "
    "'RNG' both engines compute bit-identically, so the bootstrap "
    "needs no seed shipping and re-runs byte-stable (the "
    "curation_negative_sampling recipe applied to uncertainty "
    "estimation). The 95% percentile interval is read as EXACT order "
    "statistics of the 200 bigint resample sums (1-based ranks 6 and "
    "195) — no float quantile interpolation anywhere. Scale shape: "
    "daily counts are one shuffle of |days| rows; the 200 x n draw "
    "matrix is bounded by days, never event volume, and the final "
    "order statistic is a 200-element sort.",
    tags=("events", "stats", "agg"),
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH dc AS (
          SELECT ts DIV 86400000000000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dc),
        idx AS (
          SELECT c,
                 CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS i
          FROM dc
        ),
        draws AS (
          SELECT r.r,
                 CAST(conv(substr(md5(concat(CAST(r.r AS STRING), '#',
                      CAST(d.i AS STRING))), 1, 6), 16, 10) AS BIGINT)
                   % nn.n AS pick
          FROM (SELECT explode(sequence(0, 199)) AS r) r
          CROSS JOIN idx d CROSS JOIN nn
        ),
        sums AS (
          SELECT draws.r, CAST(SUM(idx.c) AS BIGINT) AS s
          FROM draws JOIN idx ON idx.i = draws.pick
          GROUP BY 1
        ),
        srt AS (SELECT sort_array(collect_list(s)) AS l FROM sums)
        SELECT (SELECT n FROM nn) AS n_days,
               CAST(200 AS BIGINT) AS b,
               (SELECT CAST(SUM(c) AS BIGINT) FROM dc) AS obs_total,
               CAST(l[5] AS BIGINT) AS lo_sum,
               CAST(l[194] AS BIGINT) AS hi_sum
        FROM srt
    """)


@register(
    "managed_wap_publish",
    oracle="""
        WITH o AS (SELECT o_orderkey AS k,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders)
        SELECT phase, n, total FROM (
          SELECT 'audit_staging' AS phase,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 4 IN (0, 1)
          UNION ALL
          SELECT 'main_after' AS phase,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 4 IN (0, 1)
          UNION ALL
          SELECT 'main_before' AS phase,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 4 = 0
        ) ORDER BY phase
    """,
    doc="Write-audit-publish (WAP), the staging flow Iceberg branches "
    "exist for: the ingest lands on branch 'staging' (main pointer "
    "untouched — asserted in-DAG), an AUDIT pass scans the BRANCH and "
    "validates row count and a null-free invariant, and only then does "
    "fast_forward publish the branch head to main — one atomic pointer "
    "move, zero data IO. A second staging round that FAILS its audit is "
    "dropped via drop_ref and the query asserts main never saw its "
    "rows. Per-phase counts/totals are recomputed by the oracle from "
    "the raw table. Reference analogue: branch-scoped appends + "
    "pointer-move publish (the reference's snapshot-pointer commit, "
    "SparkTableOperations.scala:96-119, applied to a named ref).",
    tags=("managed", "maintenance", "dml"),
)
def managed_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-wap-"))
    tbl = eng.catalog.create_table("ord_wap", "k bigint, c bigint, m int",
                                   ["m"])
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        (F.col("o_orderkey") % 4).cast("int").alias("m"),
    )
    tbl.insert(nonempty(base.filter(F.col("m") == 0)))
    mark_setup_done()  # main seeded; stage/audit/publish is the op
    main_before = tbl.to_df().agg(
        F.lit("main_before").alias("phase"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("c").cast("double") / 100.0).alias("total"),
    ).collect()[0]
    main_head = tbl.meta.current_snapshot_id

    tbl.create_branch("staging")
    tbl.insert(nonempty(base.filter(F.col("m") == 1)), branch="staging")
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == main_head, (
        "branch write moved the main pointer"
    )
    # AUDIT the branch scan before publishing
    audit = tbl.to_df(ref="staging")
    bad = audit.filter(F.col("c").isNull()).limit(1).count()
    assert bad == 0, "staging audit failed: NULL totals"
    staging = audit.agg(
        F.lit("audit_staging").alias("phase"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("c").cast("double") / 100.0).alias("total"),
    ).collect()[0]
    tbl.fast_forward("staging")
    tbl.drop_ref("staging")

    # a second staging round whose audit REJECTS (simulated bad batch):
    # drop the branch, main must never see its rows
    tbl.create_branch("staging2")
    tbl.insert(
        nonempty(base.filter(F.col("m") == 2).withColumn("c", F.col("c") * 0 - 1)),
        branch="staging2",
    )
    tbl.drop_ref("staging2")
    tbl.refresh()
    negatives = tbl.to_df().filter(F.col("c") < 0).limit(1).count()
    assert negatives == 0, "rejected staging rows leaked into main"

    rows = [
        tuple(staging),
        tuple(
            tbl.to_df().agg(
                F.lit("main_after").alias("phase"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                (F.sum("c").cast("double") / 100.0).alias("total"),
            ).collect()[0]
        ),
        tuple(main_before),
    ]
    return local_result(
        spark, rows, "phase string, n bigint, total double"
    ).orderBy("phase")


@register(
    "curation_quality_funnel",
    oracle="""
        WITH t AS (
          SELECT doc_id, n_chars,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ),
        m AS (
          SELECT doc_id, n_chars,
                 CAST(len(toks) AS BIGINT) AS nt,
                 CAST(len(list_distinct(toks)) AS BIGINT) AS uq,
                 CAST(list_sum(list_transform(toks, w -> len(w)))
                      AS BIGINT) AS charsum,
                 CAST(len(list_filter(toks, w -> w IN
                      ('the','a','of','and','to','in','is','it','for','on')
                      )) AS BIGINT) AS sw
          FROM t WHERE len(toks) > 0
        ),
        flags AS (
          SELECT doc_id,
                 CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS f1,
                 CASE WHEN charsum * 10 >= nt * 44 THEN 1 ELSE 0 END AS f2,
                 CASE WHEN uq * 10 >= nt * 5 THEN 1 ELSE 0 END AS f3,
                 CASE WHEN sw * 100 >= nt * 5 THEN 1 ELSE 0 END AS f4
          FROM m
        )
        SELECT stage, survivors FROM (
          SELECT '0_all' AS stage, CAST(COUNT(*) AS BIGINT) AS survivors
          FROM flags
          UNION ALL
          SELECT '1_min_length', CAST(SUM(f1) AS BIGINT) FROM flags
          UNION ALL
          SELECT '2_word_shape',
                 CAST(SUM(f1 * f2) AS BIGINT) FROM flags
          UNION ALL
          SELECT '3_lexical_diversity',
                 CAST(SUM(f1 * f2 * f3) AS BIGINT) FROM flags
          UNION ALL
          SELECT '4_stopword_naturalness',
                 CAST(SUM(f1 * f2 * f3 * f4) AS BIGINT) FROM flags
        ) ORDER BY stage
    """,
    doc="Quality-filter funnel, the survivor accounting every LLM "
    "training-data pipeline publishes next to its corpus: four chained "
    "document filters — minimum length, mean word length >= 4.4 (word "
    "shape), type-token ratio >= 0.5 (lexical diversity), stopword "
    "ratio >= 5% (natural-language-ness) — with per-stage survivor "
    "counts so the cost of each rule is visible (each stage was "
    "probed to discriminate at all three SFs; no stage is a no-op). "
    "All thresholds are INTEGER cross-multiplications (charsum*10 >= "
    "nt*44, never a float ratio), so both engines agree exactly. One "
    "tokenize pass, one bounded aggregate — no shuffle beyond the "
    "5-row rollup; the per-doc flags pipeline into dedup/mixing "
    "downstream (curation_dp_mixture's input shape).",
    tags=("curation", "text"),
)
def curation_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    m = (
        ensure_parallelism(docs)
        .withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "n_chars",
            F.size("toks").cast("bigint").alias("nt"),
            F.size(F.array_distinct("toks")).cast("bigint").alias("uq"),
            F.expr(
                "aggregate(transform(toks, w -> CAST(length(w) AS BIGINT)),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("charsum"),
            F.expr(
                "CAST(size(filter(toks, w -> w IN ('the','a','of','and',"
                "'to','in','is','it','for','on'))) AS BIGINT)"
            ).alias("sw"),
        )
    )
    flags = m.select(
        F.when(F.col("n_chars") >= 100, 1).otherwise(0).alias("f1"),
        F.when(F.col("charsum") * 10 >= F.col("nt") * 44, 1)
        .otherwise(0).alias("f2"),
        F.when(F.col("uq") * 10 >= F.col("nt") * 5, 1)
        .otherwise(0).alias("f3"),
        F.when(F.col("sw") * 100 >= F.col("nt") * 5, 1)
        .otherwise(0).alias("f4"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("s0"),
        F.sum("f1").cast("bigint").alias("s1"),
        F.sum(F.col("f1") * F.col("f2")).cast("bigint").alias("s2"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3"))
        .cast("bigint").alias("s3"),
        F.sum(F.col("f1") * F.col("f2") * F.col("f3") * F.col("f4"))
        .cast("bigint").alias("s4"),
    )
    def st(label, col):
        return F.struct(
            F.lit(label).alias("stage"), F.col(col).alias("survivors")
        )

    stages = F.array(
        st("0_all", "s0"),
        st("1_min_length", "s1"),
        st("2_word_shape", "s2"),
        st("3_lexical_diversity", "s3"),
        st("4_stopword_naturalness", "s4"),
    )
    return (
        agg.select(F.explode(stages).alias("x"))
        .select(
            F.col("x.stage").alias("stage"),
            F.col("x.survivors").alias("survivors"),
        )
        .orderBy("stage")
    )


@register(
    "graph_adamic_adar",
    oracle=_EDGE_SQL + """,
        deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d
                FROM e GROUP BY 1),
        wt AS (
          SELECT n, CAST(floor(1000000000.0 / ln(CAST(d AS DOUBLE)))
                         AS BIGINT) AS w
          FROM deg WHERE d >= 2
        ),
        two_hop AS (
          SELECT e1.a AS a, e2.b AS c,
                 CAST(SUM(wt.w) AS BIGINT) AS aa_nano,
                 CAST(COUNT(*) AS BIGINT) AS common
          FROM e e1
          JOIN e e2 ON e1.b = e2.a AND e1.a < e2.b
          JOIN wt ON wt.n = e1.b
          GROUP BY 1, 2
        ),
        nonadj AS (
          SELECT t.a, t.c, t.common, t.aa_nano
          FROM two_hop t
          WHERE NOT EXISTS (
            SELECT 1 FROM half h WHERE h.a = t.a AND h.b = t.c
          )
        )
        SELECT a, c, common, aa_nano FROM nonadj
        ORDER BY aa_nano DESC, a, c
        LIMIT 20
    """,
    doc="Adamic-Adar link prediction on the token co-occurrence graph — "
    "graph_common_neighbors' degree-weighted sibling: each shared "
    "neighbor z contributes 1/ln(deg(z)), so hub neighbors count less. "
    "Float-sum order would be engine-dependent, so the weight is "
    "INTEGER-IZED first: floor(1e9 / ln(d)) per node (ln and the "
    "division are bit-identical IEEE ops on both engines; floor makes "
    "the per-node weight an exact bigint), then summed "
    "order-independently. Scale shape identical to common_neighbors: "
    "one 2-hop self-join keyed on the middle node with the weight "
    "joined as a broadcast, adjacency removed by anti-join, top-20 "
    "under a total deterministic order.",
    tags=("graph", "join"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 120
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    half = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 74)
        .select("a", "b")
        .localCheckpoint()
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = e.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wt = deg.filter(F.col("d") >= 2).select(
        "n",
        F.floor(F.lit(1000000000.0) / F.log(F.col("d").cast("double")))
        .cast("bigint")
        .alias("w"),
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    two_hop = (
        e1.join(
            e2,
            (F.col("e1.b") == F.col("e2.a"))
            & (F.col("e1.a") < F.col("e2.b")),
        )
        .join(F.broadcast(wt), F.col("e1.b") == F.col("n"))
        .groupBy(F.col("e1.a").alias("a"), F.col("e2.b").alias("c"))
        .agg(
            F.sum("w").cast("bigint").alias("aa_nano"),
            F.count(F.lit(1)).cast("bigint").alias("common"),
        )
    )
    nonadj = two_hop.join(
        half.withColumnRenamed("b", "c"), ["a", "c"], "left_anti"
    )
    return (
        nonadj.select("a", "c", "common", "aa_nano")
        .orderBy(F.desc("aa_nano"), "a", "c")
        .limit(20)
    )


@register(
    "events_did_uplift",
    oracle="""
        WITH span AS (
          SELECT MIN(epoch_ns(ts) // 86400000000000) AS d0,
                 MAX(epoch_ns(ts) // 86400000000000) AS d1
          FROM events
        ),
        base AS (
          SELECT CAST(user_id % 2 AS INTEGER) AS grp,
                 CASE WHEN epoch_ns(ts) // 86400000000000
                      >= span.d0 + (span.d1 - span.d0 + 1) // 2
                      THEN 1 ELSE 0 END AS period,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events CROSS JOIN span
        ),
        cells AS (
          SELECT grp, period,
                 CAST(SUM(y) AS BIGINT) AS conv,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2
        ),
        wide AS (
          SELECT
            MAX(CASE WHEN grp = 1 AND period = 0 THEN conv END) AS t0c,
            MAX(CASE WHEN grp = 1 AND period = 0 THEN n END) AS t0n,
            MAX(CASE WHEN grp = 1 AND period = 1 THEN conv END) AS t1c,
            MAX(CASE WHEN grp = 1 AND period = 1 THEN n END) AS t1n,
            MAX(CASE WHEN grp = 0 AND period = 0 THEN conv END) AS c0c,
            MAX(CASE WHEN grp = 0 AND period = 0 THEN n END) AS c0n,
            MAX(CASE WHEN grp = 0 AND period = 1 THEN conv END) AS c1c,
            MAX(CASE WHEN grp = 0 AND period = 1 THEN n END) AS c1n
          FROM cells
        )
        SELECT t0c, t0n, t1c, t1n, c0c, c0n, c1c, c1n,
               CAST(round(
                 ((CAST(t1c AS DOUBLE) / CAST(t1n AS DOUBLE)
                   - CAST(t0c AS DOUBLE) / CAST(t0n AS DOUBLE))
                  - (CAST(c1c AS DOUBLE) / CAST(c1n AS DOUBLE)
                     - CAST(c0c AS DOUBLE) / CAST(c0n AS DOUBLE)))
                 * 1000000.0) AS BIGINT) AS did_micro
        FROM wide
    """,
    doc="Difference-in-differences uplift on the purchase rate: odd "
    "user_ids are the 'treatment' cohort, the dataset's second half "
    "(by day, from min/max day span) is the 'post' period, and the DiD "
    "estimate (treatment post-pre delta minus control post-pre delta) "
    "is the causal-inference primitive every experimentation pipeline "
    "reports next to the raw A/B z-test (events_ab_test_ztest's "
    "sibling). The four cells are exact integer (conversions, trials) "
    "sufficient stats; the estimate is four divisions and three "
    "subtractions in textually identical operand order, emitted in "
    "rounded micro-units. Scale shape: one groupBy to 4 cells, "
    "pivoted by MAX-CASE — no joins, no window, volume-independent "
    "state.",
    tags=("events", "stats", "agg"),
)
def events_did_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH span AS (
          SELECT MIN(ts DIV 86400000000000) AS d0,
                 MAX(ts DIV 86400000000000) AS d1
          FROM events
        ),
        base AS (
          SELECT CAST(user_id % 2 AS INT) AS grp,
                 CASE WHEN ts DIV 86400000000000
                      >= span.d0 + (span.d1 - span.d0 + 1) DIV 2
                      THEN 1 ELSE 0 END AS period,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events CROSS JOIN span
        ),
        cells AS (
          SELECT grp, period,
                 CAST(SUM(y) AS BIGINT) AS conv,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY 1, 2
        ),
        wide AS (
          SELECT
            MAX(CASE WHEN grp = 1 AND period = 0 THEN conv END) AS t0c,
            MAX(CASE WHEN grp = 1 AND period = 0 THEN n END) AS t0n,
            MAX(CASE WHEN grp = 1 AND period = 1 THEN conv END) AS t1c,
            MAX(CASE WHEN grp = 1 AND period = 1 THEN n END) AS t1n,
            MAX(CASE WHEN grp = 0 AND period = 0 THEN conv END) AS c0c,
            MAX(CASE WHEN grp = 0 AND period = 0 THEN n END) AS c0n,
            MAX(CASE WHEN grp = 0 AND period = 1 THEN conv END) AS c1c,
            MAX(CASE WHEN grp = 0 AND period = 1 THEN n END) AS c1n
          FROM cells
        )
        SELECT t0c, t0n, t1c, t1n, c0c, c0n, c1c, c1n,
               CAST(round(
                 ((CAST(t1c AS DOUBLE) / CAST(t1n AS DOUBLE)
                   - CAST(t0c AS DOUBLE) / CAST(t0n AS DOUBLE))
                  - (CAST(c1c AS DOUBLE) / CAST(c1n AS DOUBLE)
                     - CAST(c0c AS DOUBLE) / CAST(c0n AS DOUBLE)))
                 * 1000000.0) AS BIGINT) AS did_micro
        FROM wide
    """)


@register(
    "text_heaps_law",
    oracle="""
        WITH mx AS (
          SELECT MAX(doc_id) + 1 AS nd FROM documents
        ),
        dec AS (SELECT unnest(generate_series(1, 10)) AS decile),
        pref AS (
          SELECT dec.decile,
                 CAST(COUNT(DISTINCT w.w) AS BIGINT) AS vocab
          FROM dec
          JOIN (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
            FROM documents
          ) w ON w.doc_id * 10 < (SELECT nd FROM mx) * dec.decile
          GROUP BY 1
        ),
        toksum AS (
          SELECT dec.decile,
                 CAST(SUM(len(regexp_split_to_array(trim(t.text), '\\s+')))
                      AS BIGINT) AS tokens
          FROM dec
          JOIN documents t
            ON t.doc_id * 10 < (SELECT nd FROM mx) * dec.decile
          GROUP BY 1
        )
        SELECT p.decile AS decile, t.tokens AS tokens, p.vocab AS vocab,
               CAST(round(ln(CAST(p.vocab AS DOUBLE))
                          / ln(CAST(t.tokens AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS beta_micro
        FROM pref p JOIN toksum t ON t.decile = p.decile
        ORDER BY decile
    """,
    doc="Heaps-law vocabulary growth curve: for each doc-id-prefix "
    "decile of the corpus, total tokens, distinct vocabulary, and the "
    "pointwise Heaps exponent ln(V)/ln(N) in micro-units — the "
    "saturation diagnostic a corpus curator reads before deciding "
    "whether more data still buys new vocabulary (text_zipf_fit's "
    "growth-side sibling). Prefixes are doc-id ordered (deterministic, "
    "not sample-order dependent); vocab is COUNT(DISTINCT token) per "
    "decile via one explode + dedup-by-decile shuffle; ln/div are "
    "bit-identical IEEE ops in fixed operand order. Scale shape: the "
    "decile join is a 10-row broadcast against the token stream; "
    "distinct-per-decile is the only real shuffle and is the point of "
    "the measurement.",
    tags=("text", "agg"),
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    docs = ensure_parallelism(docs)
    nd = docs.agg((F.max("doc_id") + 1).alias("nd"))
    dec = spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    joined = toks.crossJoin(F.broadcast(nd)).join(
        F.broadcast(dec),
        F.col("doc_id") * 10 < F.col("nd") * F.col("decile"),
    )
    toksum = joined.groupBy("decile").agg(
        F.sum(F.size("toks")).cast("bigint").alias("tokens")
    )
    vocab = (
        joined.select("decile", F.explode("toks").alias("w"))
        .groupBy("decile")
        .agg(F.countDistinct("w").cast("bigint").alias("vocab"))
    )
    return (
        vocab.join(toksum, "decile")
        .select(
            "decile",
            "tokens",
            "vocab",
            F.round(
                F.log(F.col("vocab").cast("double"))
                / F.log(F.col("tokens").cast("double"))
                * 1000000.0
            ).cast("bigint").alias("beta_micro"),
        )
        .orderBy("decile")
    )


@register(
    "sketch_theta_difference",
    oracle="""
        WITH a AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) || '#'
                 || CAST(epoch_ns(ts) // 86400000000000 AS VARCHAR) AS k
          FROM events WHERE event_type IN ('click', 'view')
        ),
        b AS (
          SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) || '#'
                 || CAST(epoch_ns(ts) // 86400000000000 AS VARCHAR) AS k
          FROM events WHERE event_type = 'purchase'
        ),
        ha AS (
          SELECT k, CAST('0x' || substr(md5(k), 1, 12) AS BIGINT) AS h
          FROM a
        ),
        hb AS (
          SELECT k, CAST('0x' || substr(md5(k), 1, 12) AS BIGINT) AS h
          FROM b
        ),
        bot AS (
          SELECT h, k FROM ha ORDER BY h LIMIT 256
        ),
        theta AS (SELECT MAX(h) AS th FROM bot),
        marked AS (
          SELECT bot.h,
                 CASE WHEN hb.k IS NULL THEN 1 ELSE 0 END AS only_a
          FROM bot LEFT JOIN hb ON hb.k = bot.k
        ),
        est AS (
          SELECT CAST(SUM(only_a) AS BIGINT) AS kd,
                 (SELECT th FROM theta) AS th
          FROM marked
        ),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS diff_exact
          FROM a LEFT JOIN hb ON hb.k = a.k WHERE hb.k IS NULL
        )
        SELECT est.kd AS sample_only_a,
               CAST(256 AS BIGINT) AS k_bottom,
               exact.diff_exact AS diff_exact,
               CAST(round(CAST(est.kd AS DOUBLE) / 256.0
                          * (255.0 * CAST(281474976710655 AS DOUBLE)
                             / CAST(est.th AS DOUBLE))) AS BIGINT)
                 AS diff_est
        FROM est CROSS JOIN exact
    """,
    doc="Theta-sketch set DIFFERENCE estimate |A \\\\ B| over (user, day) "
    "activity keys: A = click/view days, B = purchase days. The "
    "bottom-256 hash sample of A fixes theta; members of the sample "
    "absent from B estimate the difference as (k_onlyA / k) * "
    "(k-1)/theta-normalized cardinality — the KMV/theta identity that "
    "makes UNION/INTERSECT/DIFFERENCE all computable from mergeable "
    "bottom-k state (sketch_kmv_intersection's third set operation). "
    "Exact |A \\\\ B| rides along for the error check; both engines "
    "hash with the same md5-prefix integers so the sample and theta "
    "are bit-identical, and the single float normalization is in "
    "fixed operand order. Scale shape: bottom-k is an ORDER BY h "
    "LIMIT k (a top-k, not a global sort, under Spark's "
    "TakeOrderedAndProject); the membership probe joins only the "
    "256-row sample against B.",
    tags=("sketch", "events"),
)
def sketch_theta_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH a AS (
          SELECT DISTINCT concat('u', CAST(user_id AS STRING), '#',
                 CAST(ts DIV 86400000000000 AS STRING)) AS k
          FROM events WHERE event_type IN ('click', 'view')
        ),
        b AS (
          SELECT DISTINCT concat('u', CAST(user_id AS STRING), '#',
                 CAST(ts DIV 86400000000000 AS STRING)) AS k
          FROM events WHERE event_type = 'purchase'
        ),
        ha AS (
          SELECT k,
                 CAST(conv(substr(md5(k), 1, 12), 16, 10) AS BIGINT) AS h
          FROM a
        ),
        hb AS (
          SELECT k,
                 CAST(conv(substr(md5(k), 1, 12), 16, 10) AS BIGINT) AS h
          FROM b
        ),
        bot AS (
          SELECT h, k FROM ha ORDER BY h LIMIT 256
        ),
        theta AS (SELECT MAX(h) AS th FROM bot),
        marked AS (
          SELECT bot.h,
                 CASE WHEN hb.k IS NULL THEN 1 ELSE 0 END AS only_a
          FROM bot LEFT JOIN hb ON hb.k = bot.k
        ),
        est AS (
          SELECT CAST(SUM(only_a) AS BIGINT) AS kd,
                 (SELECT th FROM theta) AS th
          FROM marked
        ),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS diff_exact
          FROM a LEFT JOIN hb ON hb.k = a.k WHERE hb.k IS NULL
        )
        SELECT est.kd AS sample_only_a,
               CAST(256 AS BIGINT) AS k_bottom,
               exact.diff_exact AS diff_exact,
               CAST(round(CAST(est.kd AS DOUBLE) / 256.0
                          * (255.0 * CAST(281474976710655 AS DOUBLE)
                             / CAST(est.th AS DOUBLE))) AS BIGINT)
                 AS diff_est
        FROM est CROSS JOIN exact
    """)


@register(
    "events_cumulative_users",
    oracle="""
        WITH fd AS (
          SELECT user_id,
                 MIN(epoch_ns(ts) // 86400000000000) AS first_day
          FROM events GROUP BY 1
        ),
        days AS (
          SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        cum AS (
          SELECT d.day,
                 CAST((SELECT COUNT(*) FROM fd
                       WHERE fd.first_day <= d.day) AS BIGINT)
                   AS users_to_date
          FROM days d
        )
        SELECT CAST(day - (SELECT MIN(day) FROM days) AS BIGINT)
                 AS day_idx,
               users_to_date
        FROM cum
        WHERE (day - (SELECT MIN(day) FROM days)) % 7 = 0
        ORDER BY day_idx
    """,
    doc="Cumulative-distinct-users growth curve (weekly samples): the "
    "audience-growth metric computed WITHOUT a cumulative DISTINCT "
    "window (which would keep per-user state per day) — each user "
    "collapses to a first-seen day, and distinct-to-date(d) is just "
    "the count of first_days <= d: one |users|-sized groupBy plus a "
    "bounded day-spine join. Day indexes are emitted relative to "
    "min(day) (the CLAUDE rule: never absolute epoch-day literals). "
    "Everything is exact integers. Scale shape: the first-seen trick "
    "turns an O(users x days) stateful window into one shuffle and a "
    "days-sized broadcast join — the 100-TB way to compute any "
    "'cumulative unique' curve.",
    tags=("events", "agg", "window"),
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH fd AS (
          SELECT user_id, MIN(ts DIV 86400000000000) AS first_day
          FROM events GROUP BY 1
        ),
        days AS (
          SELECT DISTINCT ts DIV 86400000000000 AS day FROM events
        ),
        mind AS (SELECT MIN(day) AS m FROM days),
        cum AS (
          SELECT d.day,
                 CAST(COUNT(fd.user_id) AS BIGINT) AS users_to_date
          FROM days d LEFT JOIN fd ON fd.first_day <= d.day
          GROUP BY d.day
        )
        SELECT CAST(cum.day - mind.m AS BIGINT) AS day_idx,
               cum.users_to_date AS users_to_date
        FROM cum CROSS JOIN mind
        WHERE (cum.day - mind.m) % 7 = 0
        ORDER BY day_idx
    """)


@register(
    "events_stream_cumulative_users",
    oracle="""
        WITH fd AS (
          SELECT user_id,
                 MIN(epoch_ns(ts) // 86400000000000) AS first_day
          FROM events GROUP BY 1
        ),
        days AS (
          SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        cum AS (
          SELECT d.day,
                 CAST((SELECT COUNT(*) FROM fd
                       WHERE fd.first_day <= d.day) AS BIGINT)
                   AS users_to_date
          FROM days d
        )
        SELECT CAST(day - (SELECT MIN(day) FROM days) AS BIGINT)
                 AS day_idx,
               users_to_date
        FROM cum
        WHERE (day - (SELECT MIN(day) FROM days)) % 7 = 0
        ORDER BY day_idx
    """,
    doc="STREAMING twin of events_cumulative_users: the event stream is "
    "replayed as 3 chronological micro-batches (time-split parquet "
    "appends + maxFilesPerTrigger=1, the stream-gate rule) and each "
    "batch folds to per-user MIN(first-seen-day) partials plus "
    "distinct-day markers appended to a parquet sink. Both partials "
    "are MIN/set-mergeable, so micro-batch chopping and arrival order "
    "cannot change the final state — the finalizer merges mins and "
    "rebuilds the identical weekly cumulative curve the batch oracle "
    "computes from raw events. Sink state is |users| + |days| rows "
    "per batch regardless of event volume; at 100 TB the same sink is "
    "a managed table the finalizer reads (the "
    "events_stream_decayed_counts pattern with MIN instead of SUM).",
    tags=("events", "streaming"),
)
def events_stream_cumulative_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-scusrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-scuout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                "user_id", F.expr("ts DIV 86400000000000").alias("day")
            )
            .groupBy("user_id")
            .agg(F.min("day").cast("bigint").alias("fd"))
            .select("user_id", "fd", F.lit("user").alias("kind"))
            .unionAll(
                batch_df.select(
                    F.lit(-1).cast("bigint").alias("user_id"),
                    F.expr("ts DIV 86400000000000").alias("fd"),
                    F.lit("day").alias("kind"),
                ).distinct()
            )
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-scuck-")
    sink = spark.read.parquet(out)
    sink.filter(F.col("kind") == "user").groupBy("user_id").agg(
        F.min("fd").alias("first_day")
    ).createOrReplaceTempView("scu_fd")
    sink.filter(F.col("kind") == "day").select(
        F.col("fd").alias("day")
    ).distinct().createOrReplaceTempView("scu_days")
    return spark.sql("""
        WITH mind AS (SELECT MIN(day) AS m FROM scu_days),
        cum AS (
          SELECT d.day,
                 CAST(COUNT(fd.user_id) AS BIGINT) AS users_to_date
          FROM scu_days d LEFT JOIN scu_fd fd ON fd.first_day <= d.day
          GROUP BY d.day
        )
        SELECT CAST(cum.day - mind.m AS BIGINT) AS day_idx,
               cum.users_to_date AS users_to_date
        FROM cum CROSS JOIN mind
        WHERE (cum.day - mind.m) % 7 = 0
        ORDER BY day_idx
    """)


@register(
    "graph_clustering_coefficient",
    oracle=_EDGE_SQL + """,
        tri AS (
          SELECT h1.a AS a, h1.b AS b, h2.b AS c
          FROM half h1
          JOIN half h2 ON h2.a = h1.b
          JOIN half h3 ON h3.a = h1.a AND h3.b = h2.b
        ),
        pernode AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS t
          FROM (SELECT a AS n FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
          GROUP BY 1
        ),
        deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d
                FROM e GROUP BY 1)
        SELECT deg.n AS node, deg.d AS degree,
               CAST(COALESCE(pernode.t, 0) AS BIGINT) AS triangles,
               CAST((2000000 * COALESCE(pernode.t, 0))
                    // (deg.d * (deg.d - 1)) AS BIGINT) AS coeff_ppm
        FROM deg LEFT JOIN pernode ON pernode.n = deg.n
        WHERE deg.d >= 2
        ORDER BY coeff_ppm DESC, node
    """,
    doc="Per-node local clustering coefficient on the token co-occurrence "
    "graph (graph_kcore_trace / graph_adamic_adar's sibling): "
    "2*triangles(n) / (deg(n)*(deg(n)-1)) in exact ppm integers. "
    "Triangles are enumerated ONCE in canonical a<b<c orientation (the "
    "standard two-path + closing-edge semi-join — never an all-pairs "
    "neighborhood materialization), then unpivoted so each triangle "
    "credits its three corners; integer floor-division keeps the ratio "
    "engine-exact (non-negative operands, so Spark DIV == DuckDB //). "
    "Scale shape: the closing join is an equi-join on (a, c) over the "
    "bounded df-thresholded edge set; at 100 TB the same plan runs on a "
    "degree-capped edge list, and the unpivot is a map-side explode of "
    "3 rows per triangle.",
    tags=("graph", "join"),
)
def graph_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 120
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    half = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 74)
        .select("a", "b")
        .localCheckpoint()
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    h1, h2, h3 = half.alias("h1"), half.alias("h2"), half.alias("h3")
    tri = (
        h1.join(h2, F.col("h2.a") == F.col("h1.b"))
        .join(
            h3,
            (F.col("h3.a") == F.col("h1.a"))
            & (F.col("h3.b") == F.col("h2.b")),
        )
        .select(
            F.col("h1.a").alias("a"),
            F.col("h1.b").alias("b"),
            F.col("h2.b").alias("c"),
        )
    )
    pernode = (
        tri.select(F.col("a").alias("n"))
        .unionAll(tri.select(F.col("b").alias("n")))
        .unionAll(tri.select(F.col("c").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    deg = e.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(pernode, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias(
                "triangles"
            ),
            F.expr(
                "CAST((2000000 * COALESCE(t, 0)) DIV (d * (d - 1)) "
                "AS BIGINT)"
            ).alias("coeff_ppm"),
        )
        .orderBy(F.desc("coeff_ppm"), "node")
    )


def _hll_reg_cte(pred: str) -> str:
    """DuckDB register-table CTE body for the events.user_id HLL, filtered."""
    from icebergsql_spark.plans.pipeline3 import _REG_SQL, _RHO_SQL

    return f"""
          SELECT CAST({_REG_SQL} AS INT) AS reg, MAX(CAST({_RHO_SQL} AS INT))
                   AS max_rho
          FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS md5_h
                FROM events WHERE {pred})
          GROUP BY 1
    """


@register(
    "sketch_hll_union",
    oracle=f"""
        WITH a AS ({_hll_reg_cte("user_id % 2 = 0")}),
        b AS ({_hll_reg_cte("user_id % 2 = 1")}),
        g AS ({_hll_reg_cte("TRUE")}),
        merged AS (
          SELECT COALESCE(a.reg, b.reg) AS reg,
                 CAST(COALESCE(a.max_rho, 0) AS INTEGER) AS rho_even,
                 CAST(COALESCE(b.max_rho, 0) AS INTEGER) AS rho_odd,
                 CAST(greatest(COALESCE(a.max_rho, 0),
                               COALESCE(b.max_rho, 0)) AS INTEGER)
                   AS rho_merged
          FROM a FULL OUTER JOIN b ON a.reg = b.reg
        )
        SELECT m.reg, m.rho_even, m.rho_odd, m.rho_merged,
               CAST(g.max_rho AS INTEGER) AS rho_global,
               m.rho_merged = g.max_rho AS ok
        FROM merged m JOIN g ON g.reg = m.reg
        ORDER BY m.reg
    """,
    doc="HLL mergeability audit — the property that makes the sketch "
    "usable at 100 TB: registers built independently on the even-user "
    "and odd-user partitions, merged by per-register MAX, must equal the "
    "registers built over the whole stream (sketch_hll_registers' "
    "distributed-combine contract, exercised end-to-end). Every row "
    "carries both partial registers, the merge, the global register, and "
    "the equality verdict; the oracle replays the identical md5-nibble "
    "register/rho pipeline in DuckDB. Scale shape: each partition's "
    "register table is a 256-row partial aggregate (map-side combine), "
    "the merge is a bounded 256-row join — state size is O(m), "
    "independent of event volume.",
    tags=("sketch", "agg"),
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    a = sketch.hll_registers(
        ev.filter(F.col("user_id") % 2 == 0), "user_id"
    ).select("reg", F.col("max_rho").alias("ra"))
    b = sketch.hll_registers(
        ev.filter(F.col("user_id") % 2 == 1), "user_id"
    ).select("reg", F.col("max_rho").alias("rb"))
    g = sketch.hll_registers(ev, "user_id").select(
        "reg", F.col("max_rho").alias("rg")
    )
    merged = a.join(b, "reg", "full_outer").select(
        "reg",
        F.coalesce(F.col("ra"), F.lit(0)).cast("int").alias("rho_even"),
        F.coalesce(F.col("rb"), F.lit(0)).cast("int").alias("rho_odd"),
        F.greatest(
            F.coalesce(F.col("ra"), F.lit(0)),
            F.coalesce(F.col("rb"), F.lit(0)),
        )
        .cast("int")
        .alias("rho_merged"),
    )
    return (
        merged.join(g, "reg")
        .select(
            "reg",
            "rho_even",
            "rho_odd",
            "rho_merged",
            F.col("rg").cast("int").alias("rho_global"),
            (F.col("rho_merged") == F.col("rg")).alias("ok"),
        )
        .orderBy("reg")
    )


@register(
    "events_spearman_corr",
    oracle="""
        WITH daily AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                          END) AS BIGINT) AS e
          FROM events GROUP BY 1
        ),
        rk AS (
          SELECT
            CAST(2 * rank() OVER (ORDER BY p)
                 + COUNT(*) OVER (PARTITION BY p) - 1 AS BIGINT) AS rp,
            CAST(2 * rank() OVER (ORDER BY e)
                 + COUNT(*) OVER (PARTITION BY e) - 1 AS BIGINT) AS re
          FROM daily
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rp) AS BIGINT) AS sx,
                 CAST(SUM(re) AS BIGINT) AS sy,
                 CAST(SUM(rp * rp) AS BIGINT) AS sxx,
                 CAST(SUM(re * re) AS BIGINT) AS syy,
                 CAST(SUM(rp * re) AS BIGINT) AS sxy
          FROM rk
        )
        SELECT n AS n_days, sx, sy, sxx, syy, sxy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
        FROM agg
    """,
    doc="Spearman rank correlation between the daily purchase-count and "
    "daily error-count series — the monotone-association test a "
    "monitoring pipeline runs when Pearson's linearity assumption is "
    "wrong (events_autocorrelation's nonparametric sibling, tie handling "
    "borrowed from events_mann_whitney_u): doubled average ranks "
    "2*rank + tiecount - 1 keep every rank an exact bigint, so all six "
    "sufficient statistics are integers and the only float work is the "
    "final textually-mirrored division/sqrt. Scale shape: the rank is a "
    "window over |days| rows (bounded, not event volume) after one "
    "partial-aggregated groupBy.",
    tags=("events", "stats", "agg"),
)
def events_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH daily AS (
          SELECT ts DIV 86400000000000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                          END) AS BIGINT) AS p,
                 CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                          END) AS BIGINT) AS e
          FROM events GROUP BY 1
        ),
        rk AS (
          SELECT
            CAST(2 * rank() OVER (ORDER BY p)
                 + COUNT(*) OVER (PARTITION BY p) - 1 AS BIGINT) AS rp,
            CAST(2 * rank() OVER (ORDER BY e)
                 + COUNT(*) OVER (PARTITION BY e) - 1 AS BIGINT) AS re
          FROM daily
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rp) AS BIGINT) AS sx,
                 CAST(SUM(re) AS BIGINT) AS sy,
                 CAST(SUM(rp * rp) AS BIGINT) AS sxx,
                 CAST(SUM(re * re) AS BIGINT) AS syy,
                 CAST(SUM(rp * re) AS BIGINT) AS sxy
          FROM rk
        )
        SELECT n AS n_days, sx, sy, sxx, syy, sxy,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)) AS rho
        FROM agg
    """)


@register(
    "events_ols_trend",
    oracle="""
        WITH daily AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        xs AS (
          SELECT CAST(day - (SELECT MIN(day) FROM daily) AS BIGINT) AS x, y
          FROM daily
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM xs
        )
        SELECT n AS n_days,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        FROM agg
    """,
    doc="Ordinary-least-squares trend line over the daily purchase-count "
    "series — the linear-regression primitive under drift detection and "
    "capacity planning (events_holt_smoothing's closed-form sibling): "
    "slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) from five exact-bigint "
    "sufficient statistics, the rational numerator/denominator emitted "
    "as exact integers alongside the one final float division (and the "
    "intercept reuses the identical slope expression text so operand "
    "order matches bit-for-bit). Scale shape: one partial-aggregated "
    "groupBy to |days| rows, one scalar-subquery min, one single-row "
    "aggregate — no windows, no sort.",
    tags=("events", "stats", "agg"),
)
def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH daily AS (
          SELECT ts DIV 86400000000000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1
        ),
        xs AS (
          SELECT CAST(day - (SELECT MIN(day) FROM daily) AS BIGINT) AS x, y
          FROM daily
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM xs
        )
        SELECT n AS n_days,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE))
                  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        FROM agg
    """)


@register(
    "text_readability_score",
    oracle=r"""
        WITH per_doc AS (
          SELECT source,
                 CAST(len(regexp_split_to_array(trim(text), '\s+'))
                      AS BIGINT) AS w,
                 CAST(greatest(
                   length(regexp_replace(text, '[.!?]+', '.', 'g'))
                   - length(regexp_replace(text, '[.!?]+', '', 'g')), 1)
                      AS BIGINT) AS snt,
                 CAST(length(regexp_replace(lower(text), '[aeiou]+', 'a',
                                            'g'))
                      - length(regexp_replace(lower(text), '[aeiou]+', '',
                                              'g')) AS BIGINT) AS syl
          FROM documents
        ),
        agg AS (
          SELECT source,
                 CAST(COUNT(*) AS BIGINT) AS docs,
                 CAST(SUM(w) AS BIGINT) AS tw,
                 CAST(SUM(snt) AS BIGINT) AS tsnt,
                 CAST(SUM(syl) AS BIGINT) AS tsyl
          FROM per_doc GROUP BY source
        )
        SELECT source, docs, tw, tsnt, tsyl,
               206.835 - 1.015 * (CAST(tw AS DOUBLE)
                                  / CAST(tsnt AS DOUBLE))
                       - 84.6 * (CAST(tsyl AS DOUBLE)
                                 / CAST(tw AS DOUBLE)) AS fre
        FROM agg ORDER BY source
    """,
    doc="Flesch-reading-ease readability score per source — the classic "
    "quality-scoring signal a curation pipeline thresholds on (syllables "
    "approximated as vowel-group runs, the standard heuristic). Group "
    "counting is engine-exact via a LENGTH DIFFERENCE of two "
    "regexp_replace passes over the same pattern (collapse-to-one-char "
    "minus delete-all: groups = L1 - L2), avoiding any marker character "
    "that could collide with document text; word counts reuse the "
    "repo-wide split idiom and sentences are [.!?]+ runs floored at 1. "
    "All three sufficient statistics aggregate as exact bigints; the "
    "formula 206.835 - 1.015*(W/S) - 84.6*(Y/W) is one textually "
    "mirrored float expression. Scale shape: narrow per-doc projection "
    "fused into the scan, one partial-aggregated groupBy over |sources| "
    "keys.",
    tags=("text", "curation"),
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    low = F.lower(F.col("text"))
    per_doc = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("w"),
        F.greatest(
            F.length(F.regexp_replace(F.col("text"), r"[.!?]+", "."))
            - F.length(F.regexp_replace(F.col("text"), r"[.!?]+", "")),
            F.lit(1),
        )
        .cast("bigint")
        .alias("snt"),
        (
            F.length(F.regexp_replace(low, "[aeiou]+", "a"))
            - F.length(F.regexp_replace(low, "[aeiou]+", ""))
        )
        .cast("bigint")
        .alias("syl"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs"),
        F.sum("w").cast("bigint").alias("tw"),
        F.sum("snt").cast("bigint").alias("tsnt"),
        F.sum("syl").cast("bigint").alias("tsyl"),
    )
    return agg.select(
        "source",
        "docs",
        "tw",
        "tsnt",
        "tsyl",
        F.expr(
            "206.835 - 1.015 * (CAST(tw AS DOUBLE)"
            " / CAST(tsnt AS DOUBLE))"
            " - 84.6 * (CAST(tsyl AS DOUBLE)"
            " / CAST(tw AS DOUBLE))"
        ).alias("fre"),
    ).orderBy("source")


@register(
    "text_simpson_diversity",
    oracle=r"""
        WITH tok AS (
          SELECT source,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          FROM documents
        ),
        per_tok AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        agg AS (
          SELECT source,
                 CAST(SUM(c) AS BIGINT) AS toks,
                 CAST(COUNT(*) AS BIGINT) AS distinct_toks,
                 CAST(SUM(c * (c - 1)) AS BIGINT) AS s2
          FROM per_tok GROUP BY source
        )
        SELECT source, toks, distinct_toks,
               CAST((1000000 * s2) // (toks * (toks - 1)) AS BIGINT)
                 AS simpson_ppm
        FROM agg ORDER BY source
    """,
    doc="Simpson concentration index per source over the token "
    "distribution — sum c*(c-1) / (N*(N-1)) in exact ppm integers: the "
    "repetitiveness/diversity signal complementary to text_ttr_richness "
    "(TTR measures vocabulary breadth, Simpson measures how dominated "
    "the mass is by the top tokens — boilerplate spikes it while barely "
    "moving TTR). Both numerator and denominator are exact bigints from "
    "one (source, token) partial-aggregated count, so the ppm "
    "floor-division is engine-identical (non-negative operands). Scale "
    "shape: the same explode + two-level groupBy shuffle the TF-IDF "
    "path already pays; the final aggregate is |sources| rows.",
    tags=("text", "curation"),
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    per_tok = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    agg = per_tok.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("toks"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_toks"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("s2"),
    )
    return agg.select(
        "source",
        "toks",
        "distinct_toks",
        F.expr(
            "CAST((1000000 * s2) DIV (toks * (toks - 1)) AS BIGINT)"
        ).alias("simpson_ppm"),
    ).orderBy("source")


@register(
    "events_stream_survival_km",
    oracle="""
        WITH pd AS (
          SELECT DISTINCT user_id,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events WHERE event_type = 'purchase'
        ),
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
        tbl AS (
          SELECT o1.t AS t,
                 CAST(SUM(o1.ev) AS BIGINT) AS d_t,
                 MAX(r.n_risk) AS n_risk
          FROM obs o1
          JOIN (
            SELECT a.t, CAST(COUNT(*) AS BIGINT) AS n_risk
            FROM (SELECT DISTINCT t FROM obs) a JOIN obs b ON b.t >= a.t
            GROUP BY a.t
          ) r ON r.t = o1.t
          GROUP BY o1.t
          HAVING SUM(o1.ev) > 0
        ),
        tbl2 AS (SELECT * FROM tbl WHERE n_risk > d_t)
        SELECT t, n_risk, d_t,
               CAST(round(exp(SUM(ln(CAST(n_risk - d_t AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t)) * 1000000.0) AS BIGINT)
                 AS surv_micro
        FROM tbl2 ORDER BY t
    """,
    doc="STREAMING twin of events_survival_km (the last round-8 stream "
    "twin): the event stream replays as 3 chronological micro-batches "
    "(time-split parquet appends + maxFilesPerTrigger=1, the stream-gate "
    "rule) and each batch appends its DISTINCT (user, purchase-day) "
    "markers to a parquet sink — a set-mergeable partial (set union is "
    "idempotent/commutative), so micro-batch chopping, replays and "
    "arrival order cannot change the merged day set. The finalizer "
    "distinct-merges the sink and computes the identical Kaplan-Meier "
    "product-limit curve the batch oracle derives from raw events "
    "(censoring at the merged max day == the batch max day once all "
    "batches land). Sink state is |user x purchase-day| pairs per batch "
    "regardless of event volume; at 100 TB the sink is a managed table "
    "and the finalizer is the batch KM over it.",
    tags=("events", "streaming", "stats"),
)
def events_stream_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-skmsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-skmout-")
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

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-skmck-")
    spark.read.parquet(out).distinct().createOrReplaceTempView("skm_pd")
    return spark.sql("""
        WITH mx AS (SELECT MAX(day) AS m FROM skm_pd),
        gaps AS (
          SELECT user_id, day,
                 lead(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS nxt
          FROM skm_pd
        ),
        obs AS (
          SELECT CAST(COALESCE(nxt, mx.m) - day AS BIGINT) AS t,
                 CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
          FROM gaps CROSS JOIN mx
        ),
        tbl AS (
          SELECT o1.t AS t,
                 CAST(SUM(o1.ev) AS BIGINT) AS d_t,
                 MAX(r.n_risk) AS n_risk
          FROM obs o1
          JOIN (
            SELECT a.t, CAST(COUNT(*) AS BIGINT) AS n_risk
            FROM (SELECT DISTINCT t FROM obs) a JOIN obs b ON b.t >= a.t
            GROUP BY a.t
          ) r ON r.t = o1.t
          GROUP BY o1.t
          HAVING SUM(o1.ev) > 0
        ),
        tbl2 AS (SELECT * FROM tbl WHERE n_risk > d_t)
        SELECT t, n_risk, d_t,
               CAST(round(exp(SUM(ln(CAST(n_risk - d_t AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)))
                   OVER (ORDER BY t)) * 1000000.0) AS BIGINT)
                 AS surv_micro
        FROM tbl2 ORDER BY t
    """)
