"""Round-12 gate wave #7 (pipeline37): class-balanced downsampling,
the rich-club coefficient, and the per-dimension variance extremes
(dead-dimension) audit.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------ class-balanced downsample --

_BAL_SQL = """
        WITH lbl AS (
          SELECT vec_id AS vid, label FROM embeddings
        ),
        sz AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n
          FROM lbl GROUP BY label
        ),
        target AS (SELECT CAST(MIN(n) AS BIGINT) AS t FROM sz),
        drawn AS (
          SELECT vid, label,
                 row_number() OVER (PARTITION BY label
                   ORDER BY {h}, vid) AS rnk
          FROM lbl
        ),
        sel AS (
          SELECT vid, label FROM drawn
          WHERE rnk <= (SELECT t FROM target)
        )
        SELECT s.label,
               z.n AS n_before,
               CAST(COUNT(*) AS BIGINT) AS n_after,
               CAST(SUM(s.vid) AS BIGINT) AS vid_checksum
        FROM sel s JOIN sz z ON z.label = s.label
        GROUP BY s.label, z.n
        ORDER BY s.label
"""

_BAL_H_SPARK = "md5(concat('bal:', CAST(vid AS STRING)))"
_BAL_H_DUCK = "md5('bal:' || CAST(vid AS VARCHAR))"


@register(
    "curation_balanced_downsample",
    oracle=_BAL_SQL.format(h=_BAL_H_DUCK),
    doc="Class-balanced downsampling of the labeled embedding corpus to "
    "the MINORITY class size: every label keeps exactly min-class-"
    "count rows, chosen by the deterministic md5 draw both engines "
    "replay bit-identically (hex-string order — no conversion "
    "needed), so the 'random' balanced subset is reproducible and "
    "auditable. Emits per label the before/after counts and the "
    "exact vid checksum of the kept set — the classifier-training "
    "prep step that kills majority-class bias without a seed "
    "anybody has to remember. Scale shape: one per-label count, "
    "one rank window partitioned by label.",
    tags=("curation", "embeddings"),
)
def curation_balanced_downsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    return spark.sql(_BAL_SQL.format(h=_BAL_H_SPARK))


# ------------------------------------------ rich-club coefficient --

_RC_COOC = 74

# tail consumes e(a, b) and deg(node, d) — the standard 120-doc token
# co-occurrence graph
_RC_TAIL_SQL = """
        emin AS (
          SELECT e.a, e.b, LEAST(da.d, db.d) AS mind
          FROM e
          JOIN deg da ON da.node = e.a
          JOIN deg db ON db.node = e.b
        ),
        ks AS (
          SELECT r AS k
          FROM (VALUES (2),(4),(6),(8),(10),(12)) AS t(r)
        ),
        nk AS (
          SELECT k.k, CAST(COUNT(d.node) AS BIGINT) AS n_k
          FROM ks k LEFT JOIN deg d ON d.d > k.k
          GROUP BY k.k
        ),
        ek AS (
          SELECT k.k, CAST(COUNT(m.a) AS BIGINT) AS e_k
          FROM ks k LEFT JOIN emin m ON m.mind > k.k
          GROUP BY k.k
        )
        SELECT n.k, n.n_k, e.e_k,
               CASE WHEN n.n_k > 1
                    THEN CAST(2000000 * e.e_k {div}
                              (n.n_k * (n.n_k - 1)) AS BIGINT)
               END AS phi_ppm
        FROM nk n JOIN ek e ON e.k = n.k
        ORDER BY n.k
"""


def _rc_oracle() -> str:
    return (
        """
        WITH w AS (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                   trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < 120
        ),
        e AS MATERIALIZED (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= """ + str(_RC_COOC) + """
        ),
        deg AS MATERIALIZED (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
          ) GROUP BY node
        ),
"""
        + _RC_TAIL_SQL.format(div="//")
    )


@register(
    "graph_rich_club",
    oracle=_rc_oracle(),
    doc="Rich-club coefficient sweep over the token co-occurrence "
    "graph: phi(k) = 2*E_k / (N_k(N_k-1)) over the subgraph of "
    "nodes with degree > k, for k in 2..12 — do the hubs link to "
    "EACH OTHER more densely than chance (boilerplate vocab "
    "cliques, spam rings) or spread their edges? Edge eligibility "
    "is one LEAST(deg_a, deg_b) per edge, so the whole sweep is "
    "two small spine joins; counts exact, phi as exact ppm integer "
    "division with an N_k <= 1 guard. Scale shape: degree "
    "aggregate + edge min-degree join, both node-keyed; the k "
    "spine is 6 rows.",
    tags=("graph", "dedup"),
)
def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

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
    e = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _RC_COOC)
        .select("a", "b")
        .localCheckpoint()
    )
    e.createOrReplaceTempView("e")
    (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ).createOrReplaceTempView("deg")
    return spark.sql(
        "WITH " + _RC_TAIL_SQL.format(div="DIV").lstrip()
    )


# ------------------------------ per-dim variance extremes audit --

_DVE_SQL = """
        WITH s AS (
          SELECT dim,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q0) AS BIGINT) AS sq,
                 CAST(SUM(q0 * q0) AS BIGINT) AS sqq
          FROM xq0 GROUP BY dim
        ),
        v AS (
          SELECT dim, n, sq, sqq,
                 CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                   - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
                   AS var_num
          FROM s
        ),
        ranked AS (
          SELECT dim, n, sq, sqq, var_num,
                 row_number() OVER (ORDER BY var_num, dim) AS rlow,
                 row_number() OVER (ORDER BY var_num DESC, dim)
                   AS rhigh
          FROM v
        )
        SELECT dim, n, sq, sqq, var_num,
               CASE WHEN rlow <= 10 THEN 'low' ELSE 'high' END AS side,
               CAST(CASE WHEN rlow <= 10 THEN rlow ELSE rhigh END
                    AS BIGINT) AS rank_in_side
        FROM ranked
        WHERE rlow <= 10 OR rhigh <= 10
        ORDER BY side, rank_in_side
"""


def _dve_oracle() -> str:
    return (
        """
        WITH xq0 AS MATERIALIZED (
          SELECT CAST(i AS INTEGER) AS dim,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   AS q0
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        )
"""
        + _DVE_SQL.replace("WITH s AS", ", s AS", 1)
    )


@register(
    "emb_dim_variance_extremes",
    oracle=_dve_oracle(),
    doc="Per-dimension variance extremes over the embedding table: the "
    "10 lowest- and 10 highest-variance dimensions by the ranking "
    "key n*sum(q^2) - (sum q)^2 over quantized coordinates, "
    "evaluated in DOUBLE (the integer product would sit within 2x "
    "of the bigint ceiling at sf0.1 and wrap silently at larger n — "
    "the CLAUDE.md scaled-ranking-key rule; double products are "
    "bit-identical both engines, ties broken by dimension id; the "
    "sufficient statistics n/sq/sqq stay exact bigints). "
    "Near-zero-variance dimensions are DEAD — they waste index "
    "bytes and are the first candidates for Matryoshka truncation "
    "or PQ subspace merging; the extremes table is the audit that "
    "justifies cutting them. Complements emb_dimension_stats "
    "(min/max/sum) with second-moment ranking. Scale shape: one "
    "(dim) aggregate over map-side-combined partials, a 64-row "
    "rank window.",
    tags=("embeddings", "curation"),
)
def emb_dim_variance_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    emb.select(
        F.posexplode(F.col("embedding")).alias("pos0", "val")
    ).select(
        (F.col("pos0") + 1).cast("int").alias("dim"),
        F.expr(
            "CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("q0"),
    ).createOrReplaceTempView("xq0")
    return spark.sql(_DVE_SQL)
