"""Round-11 gate wave #6 (pipeline23): SQL changelog views, the
Davies-Bouldin index, Kruskal-Wallis, and deterministic k-fold splits.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import local_result, nonempty, register


# ------------------------------------------ changelog view (CDC SQL) --


@register(
    "managed_changelog_view",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 year(o_orderdate) AS m
          FROM orders WHERE o_orderkey % 4 = 1
        )
        SELECT k, c, m, 'delete' AS _change_type
        FROM base WHERE k % 10 = 5
        UNION ALL
        SELECT k, c, m, 'update_preimage' AS _change_type
        FROM base WHERE k % 10 = 3
        UNION ALL
        SELECT k, CAST(c + 7 AS BIGINT) AS c, m,
               'update_postimage' AS _change_type
        FROM base WHERE k % 10 = 3
        ORDER BY _change_type, k
    """,
    doc="CALL system.create_changelog_view — Iceberg's changelog-view "
    "procedure (sql.py): registers a named temp view over the "
    "row-level CDC between two snapshots (table.py::diff), with "
    "identifier_columns turning persisted-key payload changes into "
    "update_preimage/update_postimage rows. The gate runs a CoW "
    "UPDATE and DELETE through the SQL engine, creates the view over "
    "the whole range, and hash-matches the full changelog against "
    "the arithmetic oracle — deletes, both update images, zero "
    "spurious inserts (files common to both snapshots never re-read). "
    "The downstream-consumer surface: a feature-store refresh job "
    "reads `t_changes` instead of re-scanning the table.",
    tags=("managed", "cdc", "sql"),
)
def managed_changelog_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-clvwh-"))
    tbl = eng.catalog.create_table(
        "t_clv", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("k") % 4 == 1)))
    mark_setup_done()  # base built; DML + changelog view is the op
    eng.sql("UPDATE t_clv SET c = c + 7 WHERE k % 10 = 3")
    eng.sql("DELETE FROM t_clv WHERE k % 10 = 5")
    res = eng.sql(
        f"CALL system.create_changelog_view(table => 't_clv',"
        f" from_snapshot_id => {s1.snapshot_id},"
        f" identifier_columns => 'k')"
    )
    assert res.collect()[0]["changelog_view"] == "t_clv_changes"
    return spark.sql(
        "SELECT k, c, m, _change_type FROM t_clv_changes"
        " ORDER BY _change_type, k"
    )


# --------------------------------------------- Davies-Bouldin index --

# Squared-space DB variant: scatter s_i = mean squared quantized
# distance of members to their centroid, separation d_ij = squared
# centroid distance — both exact bigint-backed; the similarity ratio
# quantizes to ppm once, MAX/SUM after are integer-exact.
_DB_TAIL_SQL = """
        wsum AS (
          SELECT l.cell,
                 CAST(SUM((x.q - c.cq) * (x.q - c.cq)) AS BIGINT) AS w_i
          FROM xq x
          JOIN lab l ON l.vid = x.vid
          JOIN cents c ON c.cell = l.cell AND c.pos = x.pos
          GROUP BY l.cell
        ),
        csz AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_c
          FROM lab GROUP BY cell
        ),
        cdist AS (
          SELECT a.cell AS i, b.cell AS j,
                 CAST(SUM((a.cq - b.cq) * (a.cq - b.cq)) AS BIGINT)
                   AS d_ij
          FROM cents a JOIN cents b
            ON b.pos = a.pos AND b.cell <> a.cell
          GROUP BY 1, 2
        ),
        ratio AS (
          SELECT d.i, d.j,
                 CASE WHEN d.d_ij > 0 THEN
                   CAST(ROUND(1000000.0
                     * (CAST(wi.w_i AS DOUBLE) / CAST(ni.n_c AS DOUBLE)
                        + CAST(wj.w_i AS DOUBLE)
                          / CAST(nj.n_c AS DOUBLE))
                     / CAST(d.d_ij AS DOUBLE)) AS BIGINT)
                 END AS r_ppm
          FROM cdist d
          JOIN wsum wi ON wi.cell = d.i
          JOIN csz ni ON ni.cell = d.i
          JOIN wsum wj ON wj.cell = d.j
          JOIN csz nj ON nj.cell = d.j
        ),
        db_i AS (
          SELECT i AS cell, CAST(MAX(r_ppm) AS BIGINT) AS db_ppm
          FROM ratio WHERE r_ppm IS NOT NULL GROUP BY i
        ),
        tot AS (
          SELECT CAST(SUM(db_ppm) AS BIGINT) AS sum_db_ppm,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM db_i
        )
        SELECT d.cell, n.n_c, w.w_i, d.db_ppm,
               t.sum_db_ppm,
               CAST(t.sum_db_ppm AS DOUBLE)
                 / (1000000.0 * CAST(t.k AS DOUBLE)) AS db_index
        FROM db_i d
        JOIN csz n ON n.cell = d.cell
        JOIN wsum w ON w.cell = d.cell
        CROSS JOIN tot t
        ORDER BY d.cell
"""


def _db_oracle() -> str:
    from icebergsql_spark.plans.pipeline22 import kmeans_chain_cte

    return kmeans_chain_cte() + _DB_TAIL_SQL


@register(
    "emb_davies_bouldin",
    oracle=_db_oracle(),
    doc="Davies-Bouldin index over the k-means partition (kmeans_assign, "
    "k=8) — the third leg of the clustering-quality trio next to "
    "silhouette and Calinski-Harabasz: per cluster the worst "
    "similarity ratio (s_i + s_j)/d_ij against any other cluster "
    "(low = compact and well separated). Squared-space variant with "
    "scatter and separation both exact in quantized integer space; "
    "the ratio quantizes to ppm once so the per-cluster MAX and the "
    "index SUM stay integer-exact, the final /k the only mirrored "
    "float. Per-cluster worst-neighbor ratios emitted — THE "
    "actionable output (which clusters to re-split before trusting "
    "dedup buckets). Scale shape: one centroid join for scatter, "
    "one k x k centroid cross for separation — no pairwise point "
    "pass. Oracle replays the shared kmeans round chain "
    "(pipeline22.kmeans_chain_cte).",
    tags=("embeddings", "curation"),
)
def emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import (
        _quantized,
        _update,
        kmeans_assign,
    )
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
        track_cache,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    # localCheckpoint: every SQL reference to these views would
    # otherwise REPLAY the whole kmeans round lineage (measured 10-19s
    # per gate at sf0.1 before the cut; ~2-3s after)
    lab = kmeans_assign(emb, k=8, iterations=2).localCheckpoint()
    lab.createOrReplaceTempView("lab")
    xq_arr = track_cache(_quantized(emb, "embedding", "vec_id"))
    cents = _update(xq_arr, lab).localCheckpoint()
    xq_arr.select(
        "vid", F.posexplode("xq").alias("pos0", "q")
    ).selectExpr("vid", "pos0 + 1 AS pos", "q").createOrReplaceTempView(
        "xq"
    )
    cents.select(
        "cell", F.posexplode("cq").alias("pos0", "cq")
    ).selectExpr(
        "cell", "pos0 + 1 AS pos", "cq"
    ).createOrReplaceTempView("cents")
    out = spark.sql("WITH " + _DB_TAIL_SQL.lstrip())
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)


# ------------------------------------------------ Kruskal-Wallis --

_KW_TYPES = ("click", "error", "purchase", "signup", "view")

# Average ranks with ties stay exact when doubled: 2*avgrank =
# 2*minrank + tiecount - 1.  The five per-type doubled rank sums pivot
# wide, so sum_i R_i^2/n_i gets ONE common denominator and H is a
# single mirrored float expression over exact bigints.
# tail shared with the streaming twin (plans/pipeline24.py::
# events_stream_kruskal_wallis), which substitutes a merged-partials
# `daily` head
_KW_TAIL_SQL = """
        ranked AS (
          SELECT event_type, x,
                 CAST(RANK() OVER (ORDER BY x) AS BIGINT) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) AS tcnt
          FROM daily
        ),
        r2 AS (
          SELECT event_type,
                 CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2_i,
                 CAST(COUNT(*) AS BIGINT) AS n_i
          FROM ranked GROUP BY event_type
        ),
        ties AS (
          SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY x
          ) g
        ),
        wide AS (
          SELECT
            {wide_cols}
          FROM r2
        ),
        calc AS (
          SELECT w.*,
                 CAST(n_1 + n_2 + n_3 + n_4 + n_5 AS BIGINT) AS n,
                 CAST(n_1 * n_2 * n_3 * n_4 * n_5 AS BIGINT) AS p,
                 CAST(r2_1 * r2_1 * (n_2 * n_3 * n_4 * n_5)
                    + r2_2 * r2_2 * (n_1 * n_3 * n_4 * n_5)
                    + r2_3 * r2_3 * (n_1 * n_2 * n_4 * n_5)
                    + r2_4 * r2_4 * (n_1 * n_2 * n_3 * n_5)
                    + r2_5 * r2_5 * (n_1 * n_2 * n_3 * n_4)
                    AS BIGINT) AS s,
                 t.tie_term
          FROM wide w CROSS JOIN ties t
        )
        SELECT r2_1, n_1, r2_2, n_2, r2_3, n_3, r2_4, n_4, r2_5, n_5,
               n, p, s, tie_term,
               12.0 * CAST(s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                    * 4.0 * CAST(p AS DOUBLE))
                 - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
               CASE WHEN n * n * n - n > tie_term THEN
                 (12.0 * CAST(s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE)
                       * 4.0 * CAST(p AS DOUBLE))
                    - 3.0 * CAST(n + 1 AS DOUBLE))
                 / (1.0 - CAST(tie_term AS DOUBLE)
                          / CAST(n * n * n - n AS DOUBLE))
               END AS h_corrected
        FROM calc
"""

_KW_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
"""
    + _KW_TAIL_SQL
)

_KW_WIDE = ",\n            ".join(
    f"MAX(CASE WHEN event_type = '{t}' THEN r2_i END) AS r2_{i + 1},\n"
    f"            MAX(CASE WHEN event_type = '{t}' THEN n_i END)"
    f" AS n_{i + 1}"
    for i, t in enumerate(_KW_TYPES)
)


@register(
    "events_kruskal_wallis",
    oracle=_KW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        wide_cols=_KW_WIDE,
    ),
    doc="Kruskal-Wallis rank test across the five event types' daily "
    "volumes — one-way ANOVA's nonparametric sibling (the one to "
    "trust when daily counts are skewed): global ranks with exact "
    "tie handling (doubled average rank = 2*minrank + ties - 1 stays "
    "integer), per-type doubled rank sums pivot wide so "
    "sum R_i^2/n_i takes a single common denominator — H and its "
    "tie-corrected form are each ONE mirrored float expression over "
    "exact bigints, with an all-one-tie-group degeneracy guard. "
    "Every sufficient statistic emitted. Scale shape: one (type, "
    "day) count, one global rank window, a 5-row pivot.",
    tags=("events", "stats"),
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_kw")
    return spark.sql(
        _KW_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_kw",
            wide_cols=_KW_WIDE,
        )
    )


# ------------------------------------------- deterministic k-fold --

_KF_SQL = """
        WITH folds AS (
          SELECT doc_id, source, n_chars,
                 CAST({bucket} AS INTEGER) AS fold
          FROM documents
        ),
        per_fold AS (
          SELECT fold,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                 CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
                 CAST(MIN(doc_id) AS BIGINT) AS min_doc,
                 CAST(MAX(doc_id) AS BIGINT) AS max_doc
          FROM folds GROUP BY fold
        ),
        tot AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
                 CAST(COUNT(*) AS BIGINT) AS n_folds
          FROM per_fold
        )
        SELECT p.fold, p.n_docs, p.sum_chars, p.n_sources,
               p.min_doc, p.max_doc, t.total_docs, t.n_folds
        FROM per_fold p CROSS JOIN tot t
        ORDER BY p.fold
"""


@register(
    "curation_kfold_split",
    oracle=_KF_SQL.format(
        bucket="CAST('0x' || substr(md5('fold:' || CAST(doc_id AS "
        "VARCHAR)), 1, 8) AS BIGINT) % 5"
    ),
    doc="Deterministic 5-fold split of the corpus for cross-validation: "
    "fold = md5('fold:' || doc_id) % 5 — the hash-based assignment "
    "that is reproducible across runs, engines, and cluster sizes "
    "(no shuffle-order dependence, no RNG state), disjoint and "
    "exhaustive by construction (total_docs rides along as the "
    "audit column). Per-fold size, char mass, and source coverage "
    "emitted — the balance check run before trusting fold-wise "
    "eval numbers. The md5 parity construction both engines "
    "replay bit-identically. Scale shape: one narrow map + one "
    "5-group aggregate.",
    tags=("curation",),
)
def curation_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    load_tables(spark, sf_dir, ("documents",))[
        "documents"
    ].createOrReplaceTempView("documents")
    return spark.sql(
        _KF_SQL.format(
            bucket="CAST(conv(substring(md5(concat('fold:', "
            "CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) % 5"
        )
    )
