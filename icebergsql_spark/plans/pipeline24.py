"""Round-11 gate wave #7 (pipeline24): label-aware embedding evals
(kNN classifier, cluster purity), the Kruskal-Wallis streaming twin,
and word burstiness.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    local_result,
    register,
    run_partial_stream,
)

# ---------------------------------------- leave-one-out kNN eval --

_KNN_MAX_ID = 300
_KNN_K = 5

# tail consumes pd(i, j, dq) + lbl(vid, label); identical both engines
_KNN_TAIL_SQL = """
        rk AS {mat}(
          SELECT i, j, d2q,
                 row_number() OVER (PARTITION BY i ORDER BY d2q, j)
                   AS rn
          FROM pd
        ),
        knn AS (SELECT i, j FROM rk WHERE rn <= {k}),
        votes AS (
          SELECT knn.i, lj.label,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM knn JOIN lbl lj ON lj.vid = knn.j
          GROUP BY knn.i, lj.label
        ),
        pred AS (
          SELECT i, label AS pred FROM (
            SELECT i, label,
                   row_number() OVER (PARTITION BY i
                     ORDER BY c DESC, label) AS vr
            FROM votes) t
          WHERE vr = 1
        ),
        scored AS (
          SELECT li.label,
                 CASE WHEN p.pred = li.label THEN 1 ELSE 0 END AS ok
          FROM lbl li JOIN pred p ON p.i = li.vid
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ok) AS BIGINT) AS n_correct,
               CAST(1000000 * SUM(ok) {div} COUNT(*) AS BIGINT)
                 AS acc_ppm
        FROM scored
        GROUP BY label
        ORDER BY label
"""


def _knn_oracle() -> str:
    return f"""
        WITH base AS MATERIALIZED (
          SELECT vec_id, label,
                 list_transform(embedding, x -> x::DOUBLE) AS vd
          FROM embeddings WHERE vec_id < {_KNN_MAX_ID}
        ),
        lbl AS (SELECT vec_id AS vid, label FROM base),
        pd AS MATERIALIZED (
          SELECT a.vec_id AS i, b.vec_id AS j,
                 CAST(ROUND(list_sum(list_transform(
                      generate_series(1, 64),
                      d -> (a.vd[d] - b.vd[d]) * (a.vd[d] - b.vd[d])))
                      * 1000000000.0) AS BIGINT) AS d2q
          FROM base a JOIN base b ON a.vec_id <> b.vec_id
        ),
""" + _KNN_TAIL_SQL.format(mat="MATERIALIZED ", k=_KNN_K, div="//")


@register(
    "emb_knn_classifier_eval",
    oracle=_knn_oracle(),
    doc="Leave-one-out kNN classification over the labeled embedding "
    "table (k=5, majority vote, ties broken by smallest label): the "
    "embedding-quality eval every retrieval pipeline runs — if 5-NN "
    "cannot recover the label, neither will downstream search. "
    "Distances are the exact once-quantized squared L2 (the LOF "
    "discipline), the vote count and the per-label accuracy (ppm "
    "via integer division) are exact, so the WHOLE gate is "
    "float-free after one quantization. Per-true-label accuracy "
    "emitted — the confusion-prone classes surface immediately. "
    "Capped probe set bounds the quadratic pass; at corpus scale "
    "the kNN stage swaps to the IVF/LSH candidate generators while "
    "the vote algebra is unchanged.",
    tags=("embeddings", "curation"),
)
def emb_knn_classifier_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        .filter(F.col("vec_id") < _KNN_MAX_ID)
        .select(
            "vec_id",
            "label",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "vd"
            ),
        )
    )
    emb.select(F.col("vec_id").alias("vid"), "label").createOrReplaceTempView(
        "lbl"
    )
    a, b = emb.alias("a"), emb.alias("b")
    a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("i"),
        F.col("b.vec_id").alias("j"),
        F.expr(
            "CAST(ROUND(aggregate(zip_with(a.vd, b.vd,"
            " (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
            " * 1000000000.0) AS BIGINT)"
        ).alias("d2q"),
    ).createOrReplaceTempView("pd")
    return spark.sql(
        "WITH "
        + _KNN_TAIL_SQL.format(mat="", k=_KNN_K, div="DIV").lstrip()
    )


# ------------------------------------------- cluster label purity --

_PURITY_TAIL_SQL = """
        cont AS (
          SELECT l.cell, e.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM lab l JOIN lbl e ON e.vid = l.vid
          GROUP BY l.cell, e.label
        ),
        top AS (
          SELECT cell, label AS top_label, c AS top_cnt FROM (
            SELECT cell, label, c,
                   row_number() OVER (PARTITION BY cell
                     ORDER BY c DESC, label) AS vr
            FROM cont) t
          WHERE vr = 1
        ),
        csz AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_c
          FROM lab GROUP BY cell
        ),
        tot AS (
          SELECT CAST(SUM(top_cnt) AS BIGINT) AS pure,
                 CAST((SELECT COUNT(*) FROM lab) AS BIGINT) AS n
          FROM top
        )
        SELECT t.cell, c.n_c, t.top_label, t.top_cnt,
               CAST(1000000 * t.top_cnt {div} c.n_c AS BIGINT)
                 AS cell_purity_ppm,
               CAST(1000000 * tt.pure {div} tt.n AS BIGINT)
                 AS purity_ppm
        FROM top t
        JOIN csz c ON c.cell = t.cell
        CROSS JOIN tot tt
        ORDER BY t.cell
"""


def _purity_oracle() -> str:
    from icebergsql_spark.plans.pipeline22 import kmeans_chain_cte

    return (
        kmeans_chain_cte()
        + """
        lbl AS (SELECT vec_id AS vid, label FROM embeddings),
"""
        + _PURITY_TAIL_SQL.format(div="//")
    )


@register(
    "emb_cluster_purity",
    oracle=_purity_oracle(),
    doc="Label purity of the k-means partition (kmeans_assign, k=8, "
    "against the embedding table's ground-truth labels): per cluster "
    "the majority label and its share, plus the overall purity "
    "sum(max_label_count)/n — the external clustering validation "
    "that complements the internal trio (silhouette/CH/DB): did the "
    "unsupervised buckets recover the real classes? Contingency "
    "counts, majority votes (ties to the smallest label) and both "
    "purity numbers are ALL exact integers — zero float anywhere. "
    "Scale shape: one (cell, label) count over the assignment join; "
    "the oracle replays the shared kmeans round chain.",
    tags=("embeddings", "curation"),
)
def emb_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import kmeans_assign
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    # localCheckpoint: SQL references would replay the kmeans lineage
    kmeans_assign(emb, k=8, iterations=2).localCheckpoint(
    ).createOrReplaceTempView("lab")
    emb.select(F.col("vec_id").alias("vid"), "label").createOrReplaceTempView(
        "lbl"
    )
    out = spark.sql(
        "WITH " + _PURITY_TAIL_SQL.format(div="DIV").lstrip()
    )
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)


# ------------------------------- Kruskal-Wallis streaming twin --


def _kw_oracle() -> str:
    from icebergsql_spark.plans.pipeline23 import _KW_SQL, _KW_WIDE

    return _KW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        wide_cols=_KW_WIDE,
    )


@register(
    "events_stream_kruskal_wallis",
    oracle=_kw_oracle(),
    doc="STREAMING twin of events_kruskal_wallis: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL rank/tie/pivot tail SQL (shared _KW_TAIL_SQL "
    "template). The live nonparametric does-traffic-differ monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_kruskal_wallis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline23 import _KW_TAIL_SQL, _KW_WIDE
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-kwsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-kwout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                "event_type", F.expr("ts DIV 86400000000000").alias("day")
            )
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-kwck-")
    spark.read.parquet(out).createOrReplaceTempView("kw_partials")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS x
          FROM kw_partials GROUP BY 1, 2
        ),
"""
        + _KW_TAIL_SQL.format(wide_cols=_KW_WIDE)
    )


# ---------------------------------------------- word burstiness --

# Church & Gale: content words are BURSTY (variance-to-mean ratio of
# per-doc counts >> 1), function words are Poisson-ish (VMR ~ 1).
# With zeros included over all N docs: VMR = (N*Sxx - T^2)/((N-1)*T*?)
# — emitted as the exact bigint pair (vmr_num, vmr_den) with the
# single mirrored float division alongside.
_BURST_SQL = """
        WITH n_docs AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        ),
        occ AS (
          SELECT doc_id, {tok} AS tok FROM documents
        ),
        per_doc AS (
          SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS x
          FROM occ GROUP BY tok, doc_id
        ),
        w AS (
          SELECT tok,
                 CAST(SUM(x) AS BIGINT) AS t,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(COUNT(*) AS BIGINT) AS df
          FROM per_doc GROUP BY tok
        ),
        top AS (
          SELECT w.tok, w.t, w.sxx, w.df, n_docs.n
          FROM w CROSS JOIN n_docs
          ORDER BY w.t DESC, w.tok LIMIT 30
        )
        SELECT tok, t, sxx, df, n,
               CAST(n * sxx - t * t AS BIGINT) AS vmr_num,
               CAST((n - 1) * t AS BIGINT) AS vmr_den,
               CAST(n * sxx - t * t AS DOUBLE)
                 / CAST((n - 1) * t AS DOUBLE) AS vmr
        FROM top
        ORDER BY t DESC, tok
"""


@register(
    "text_word_burstiness",
    oracle=_BURST_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))"
    ),
    doc="Word burstiness (Church & Gale): the variance-to-mean ratio of "
    "per-document counts, zeros included over all N docs — content "
    "words cluster (VMR >> 1), function words scatter Poisson-like "
    "(VMR ~ 1), and the ratio is the classic signal for separating "
    "topical vocabulary from glue when building keyword lists or "
    "stopword filters. VMR = (N*Sxx - T^2)/((N-1)*T) needs only "
    "T/Sxx/N, so zeros never materialize — the numerator/denominator "
    "pair is an exact bigint (emitted) and the ratio the single "
    "mirrored float. Top-30 words by total count under a "
    "deterministic (count, word) order. Scale shape: one (word, doc) "
    "count, one word rollup.",
    tags=("text",),
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    ).createOrReplaceTempView("documents")
    return spark.sql(
        _BURST_SQL.format(tok="explode(split(trim(text), '\\\\s+'))")
    )
