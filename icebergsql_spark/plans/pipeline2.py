"""Pipeline operators, tranche 2: PageRank, Bloom membership, unigram-LM
scoring, PII scrubbing.

Each rides the repo's determinism discipline (integer/quantized state,
md5-derived hashing, shared double-op order) so even the iterative and
approximate operators hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

_PR_SCALE = 10**12


@register(
    "graph_pagerank",
    oracle=f"""
        WITH raw AS (
          SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                 's:' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY src),
        s0 AS (SELECT node, {_PR_SCALE} // n AS q FROM nodes CROSS JOIN nn),
        i1 AS (SELECT e.dst AS node, SUM(s0.q // od.od) AS s
               FROM e JOIN s0 ON e.src = s0.node JOIN od ON e.src = od.src
               GROUP BY e.dst),
        s1 AS (SELECT nodes.node,
                      (({_PR_SCALE} // n) * 15) // 100
                        + (85 * COALESCE(i1.s, 0)) // 100 AS q
               FROM nodes CROSS JOIN nn LEFT JOIN i1 ON nodes.node = i1.node),
        i2 AS (SELECT e.dst AS node, SUM(s1.q // od.od) AS s
               FROM e JOIN s1 ON e.src = s1.node JOIN od ON e.src = od.src
               GROUP BY e.dst),
        s2 AS (SELECT nodes.node,
                      (({_PR_SCALE} // n) * 15) // 100
                        + (85 * COALESCE(i2.s, 0)) // 100 AS q
               FROM nodes CROSS JOIN nn LEFT JOIN i2 ON nodes.node = i2.node),
        i3 AS (SELECT e.dst AS node, SUM(s2.q // od.od) AS s
               FROM e JOIN s2 ON e.src = s2.node JOIN od ON e.src = od.src
               GROUP BY e.dst),
        s3 AS (SELECT nodes.node,
                      (({_PR_SCALE} // n) * 15) // 100
                        + (85 * COALESCE(i3.s, 0)) // 100 AS q
               FROM nodes CROSS JOIN nn LEFT JOIN i3 ON nodes.node = i3.node)
        SELECT node, CAST(q AS BIGINT) AS score_q
        FROM s3 ORDER BY score_q DESC, node LIMIT 20
    """,
    doc="PageRank (3 rounds, damping 0.85) over the bipartite "
    "customer⇄supplier trade graph, as integer-quantized join+aggregate "
    "rounds composed into ONE lazy DAG — no driver actions between "
    "iterations. The oracle replays the identical integer updates as "
    "chained CTEs; scores match exactly, no float tolerance needed.",
    tags=("pipeline", "graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import pagerank

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    raw = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        pagerank(edges, iterations=3)
        .orderBy(F.desc("score_q"), "node")
        .limit(20)
    )


@register(
    "sketch_bloom_filter",
    oracle="""
        WITH build AS (
          SELECT DISTINCT o_custkey AS k FROM orders
          WHERE o_orderpriority = '1-URGENT'
        ),
        bpos AS (
          SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 3) AS BIGINT) AS p FROM build
          UNION ALL
          SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 4, 3) AS BIGINT) FROM build
          UNION ALL
          SELECT CAST('0x' || substr(md5(CAST(k AS VARCHAR)), 7, 3) AS BIGINT) FROM build
        ),
        bloom AS (
          SELECT p // 32 AS word_idx,
                 BIT_OR(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
          FROM bpos GROUP BY 1
        ),
        ppos AS (
          SELECT DISTINCT c_custkey,
                 CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1 + 3 * j, 3)
                      AS BIGINT) AS p
          FROM customer CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS j) js
        ),
        hits AS (
          SELECT c_custkey, COUNT(*) AS n_pos,
                 SUM(CASE WHEN bits & (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
                               = (CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
                          THEN 1 ELSE 0 END) AS n_hit
          FROM ppos LEFT JOIN bloom ON ppos.p // 32 = bloom.word_idx
          GROUP BY c_custkey
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bloom_pos,
               CAST(SUM(CASE WHEN c_custkey IN (SELECT k FROM build)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
        FROM customer JOIN hits USING (c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    doc="Deterministic Bloom filter (4096 bits, 3 md5-derived hashes) as "
    "relational state: build = one bit_or aggregate into ≤128 bitmap rows, "
    "probe = broadcast join + narrow map. Both engines build the identical "
    "bitmap, so even the false-positive count hash-matches. The 100 TB "
    "shape: pre-filter a huge probe table before the real join moves data.",
    tags=("pipeline", "sketch", "bloom"),
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    t = load_tables(spark, sf_dir, ("orders", "customer"))
    build = (
        t["orders"]
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bloom = sketch.bloom_build(build, "k")
    probed = sketch.bloom_probe(t["customer"], "c_custkey", bloom)
    exact = probed.join(
        build.withColumnRenamed("k", "c_custkey"), "c_custkey", "left_semi"
    ).select("c_custkey").withColumn("is_member", F.lit(1))
    return (
        probed.join(exact, "c_custkey", "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_probe"),
            F.sum(F.when(F.col("bloom_positive"), 1).otherwise(0)).alias(
                "n_bloom_pos"
            ),
            F.sum(F.coalesce(F.col("is_member"), F.lit(0))).alias("n_exact"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "text_unigram_logprob",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        vocab AS (SELECT tok, COUNT(*) AS cnt FROM tok2 GROUP BY tok),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM vocab),
        q AS (
          SELECT tok,
                 CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))
                            * 1000000000) AS BIGINT) AS lq
          FROM vocab CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               (CAST(SUM(lq) AS DOUBLE) / 1000000000.0)
                 / CAST(COUNT(*) AS DOUBLE) AS avg_logprob
        FROM tok2 JOIN q USING (tok)
        GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Corpus-fit unigram LM document scoring (mean token ln-prob) — the "
    "cheap quality/outlier signal for pretraining data. Per-token ln p is "
    "quantized to scaled bigint once, so the per-doc aggregation is an "
    "exact integer sum: order-free, bit-identical to the oracle.",
    tags=("pipeline", "text", "lm"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.text import unigram_logprob
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    return unigram_logprob(docs).orderBy("doc_id")


_PII_EMAIL = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
_PII_IP = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"


@register(
    "text_pii_scrub",
    oracle=f"""
        WITH synth AS (
          SELECT doc_id, source,
                 text || ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.0.' || CAST(doc_id % 250 AS VARCHAR) AS body
          FROM documents
        ),
        scrubbed AS (
          SELECT doc_id, source,
                 len(regexp_extract_all(body, '{_PII_EMAIL}')) AS n_emails,
                 len(regexp_extract_all(body, '{_PII_IP}')) AS n_ips,
                 md5(regexp_replace(regexp_replace(body, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                                    '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
          FROM synth
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_emails) AS BIGINT) AS n_emails,
               CAST(SUM(n_ips) AS BIGINT) AS n_ips,
               CAST(COUNT(DISTINCT redacted_md5) AS BIGINT) AS n_distinct_redacted
        FROM scrubbed GROUP BY source ORDER BY source
    """,
    doc="PII detect + redact over documents (emails/IPv4 appended "
    "deterministically per doc_id since the synthetic corpus contains "
    "none): regex extraction counts and md5 of the redacted body — "
    "regexp_replace/extract_all and md5 are bit-identical across engines "
    "for these escape-free patterns. Pure narrow map; no shuffle until "
    "the final per-source rollup.",
    tags=("pipeline", "text", "pii"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    body = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 250).cast("string"),
    )
    scrubbed = docs.withColumn("body", body).select(
        "source",
        F.size(F.expr(f"regexp_extract_all(body, '{_PII_EMAIL}', 0)")).alias(
            "n_emails"
        ),
        F.size(F.expr(f"regexp_extract_all(body, '{_PII_IP}', 0)")).alias("n_ips"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("body"), _PII_EMAIL, "<EMAIL>"),
                _PII_IP,
                "<IP>",
            )
        ).alias("redacted_md5"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_emails").alias("n_emails"),
            F.sum("n_ips").alias("n_ips"),
            F.countDistinct("redacted_md5").alias("n_distinct_redacted"),
        )
        .orderBy("source")
    )


def _kmeans_oracle(k: int = 8, iterations: int = 2) -> str:
    """Chained-CTE replica of operators/ml.kmeans_summary: same quantize →
    (assign, update) × iterations → final assign → final centroids →
    per-cluster rollup, all in integer arithmetic."""
    parts = [
        f"""xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
        c0 AS (SELECT vid AS cell, pos, q AS cq FROM xq WHERE vid < {k})"""
    ]
    n = 0
    for it in range(iterations):
        parts.append(f"""
        d{it + 1} AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c{it} c USING (pos) GROUP BY 1, 2
        ),
        a{it + 1} AS (
          SELECT vid, CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS cell
          FROM d{it + 1} GROUP BY vid
        ),
        c{it + 1} AS (
          SELECT a.cell, x.pos, CAST(SUM(x.q) // COUNT(*) AS BIGINT) AS cq
          FROM xq x JOIN a{it + 1} a USING (vid) GROUP BY 1, 2
        )""")
        n = it + 1
    parts.append(f"""
        dfin AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c{n} c USING (pos) GROUP BY 1, 2
        ),
        afin AS (
          SELECT vid, CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS cell
          FROM dfin GROUP BY vid
        ),
        cfin AS (
          SELECT a.cell, x.pos, CAST(SUM(x.q) // COUNT(*) AS BIGINT) AS cq
          FROM xq x JOIN afin a USING (vid) GROUP BY 1, 2
        ),
        dsum AS (
          SELECT x.vid, a.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN afin a USING (vid)
          JOIN cfin c ON c.cell = a.cell AND c.pos = x.pos
          GROUP BY 1, 2
        )""")
    return (
        "WITH " + ",".join(parts) + """
        SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               MIN(vid) AS min_vid, MAX(vid) AS max_vid,
               CAST(SUM(dq) // COUNT(*) AS BIGINT) AS mean_dist_q
        FROM dsum GROUP BY cell ORDER BY cell"""
    )


@register(
    "ml_kmeans_clusters",
    oracle=_kmeans_oracle(),
    doc="Integer-quantized k-means (k=8, 2 update rounds + final assign) "
    "over the embeddings table — reproducible clustering: every step is "
    "integer arithmetic (shifted quantized coords, integer argmin key, "
    "sum DIV count centroids), so the cluster sizes and exact mean "
    "intra-cluster distances hash-match the oracle's chained-CTE replay. "
    "Per round: broadcast k centroids + narrow integer fold for "
    "assignment, ONE k×dims shuffle for the update; iterations compose "
    "into a single lazy DAG with no driver actions.",
    tags=("pipeline", "ml", "iterative", "embedding"),
)
def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import kmeans_summary
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    return kmeans_summary(emb, k=8, iterations=2)
