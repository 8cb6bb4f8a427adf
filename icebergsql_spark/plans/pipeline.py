"""LLM-data-pipeline operators as oracle-checked gate queries.

Wires operators/{text,dedup,similarity,multimodal} into the driver contract.
Each oracle is an exact DuckDB mirror built on primitives that are
bit-identical across engines (md5, ascii, substr, integer→double division,
fixed-order float folds), so even the hash-based operators (minhash, LSH,
simhash) hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators import dedup, multimodal, similarity, text
from icebergsql_spark.plans.registry import load_tables, register

# ------------------------------------------------------------ text analysis --

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               len({_TOKS}) AS token_count,
               len(list_distinct({_TOKS})) AS distinct_tokens,
               length(text) AS char_len,
               (length(text) - len({_TOKS}) + 1) / len({_TOKS}) AS avg_token_len
        FROM documents
        ORDER BY doc_id
    """,
    doc="Token counting: whitespace tokens, distinct tokens, avg token len.",
    tags=("pipeline", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.with_token_stats(docs).select(
        "doc_id",
        "token_count",
        "distinct_tokens",
        F.col("char_len").cast("bigint").alias("char_len"),
        "avg_token_len",
    ).orderBy("doc_id")


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
    return f"len(list_filter({_TOKS}, t -> t IN ({words})))"


def _lang_case_sql() -> str:
    langs = list(text.LANG_MARKERS)
    clauses = []
    for i, lang in enumerate(langs):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs[i + 1 :]
        ) or "TRUE"
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + " END"


@register(
    "text_lang_id",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, lang,
                 {_lang_score_sql('en')} AS score_en,
                 {_lang_score_sql('de')} AS score_de,
                 {_lang_score_sql('es')} AS score_es,
                 {_lang_score_sql('fr')} AS score_fr,
                 {_lang_score_sql('zh')} AS score_zh
          FROM documents
        )
        SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
               {_lang_case_sql()} AS predicted_lang
        FROM scored
        ORDER BY doc_id
    """,
    doc="Language-ID heuristic: marker-word counts + deterministic argmax.",
    tags=("pipeline", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.with_lang_scores(docs).select(
        "doc_id", "lang", "score_en", "score_de", "score_es", "score_fr",
        "score_zh", "predicted_lang",
    ).orderBy("doc_id")


@register(
    "text_quality_fingerprint",
    oracle=f"""
        SELECT doc_id,
               CAST(CASE WHEN len({_TOKS}) BETWEEN 20 AND 200 THEN 40 ELSE 10 END
                  + CASE WHEN (length(text) - len({_TOKS}) + 1) / len({_TOKS})
                         BETWEEN 3 AND 8 THEN 30 ELSE 5 END
                  + round(len(list_distinct({_TOKS})) / len({_TOKS}) * 30, 2)
                 AS DOUBLE) AS quality_score,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents
        ORDER BY doc_id
    """,
    doc="Quality scoring (length/diversity bands) + md5 fingerprint.",
    tags=("pipeline", "text"),
)
def text_quality_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        text.with_fingerprint(text.with_quality_score(docs))
        .select("doc_id", "quality_score", "fingerprint")
        .orderBy("doc_id")
    )


# ------------------------------------------------------------------- dedup --


@register(
    "text_repetition_signals",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents),
        per_row AS (
          SELECT doc_id,
                 CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
                 round(1 - len(list_distinct(string_split(trim(text), ' ')))
                         / len(string_split(trim(text), ' ')), 6) AS dup_word_frac,
                 round(1 - len(list_distinct(list_transform(
                           generate_series(1, greatest(len(text) - 4, 1)),
                           i -> substr(text, i, 5))))
                         / greatest(len(text) - 4, 1), 6) AS dup_5gram_frac
          FROM docs
        ),
        bg AS (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(string_split(trim(text), ' ')) - 1, 1)),
            i -> array_to_string(
              list_slice(string_split(trim(text), ' '), i, i + 1), ' ')
          )) AS b
          FROM docs
        ),
        bgc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        top AS (
          SELECT doc_id, round(MAX(c) / SUM(c), 6) AS top_bigram_frac
          FROM bgc GROUP BY 1
        )
        SELECT p.doc_id, n_tokens, dup_word_frac, dup_5gram_frac, top_bigram_frac
        FROM per_row p JOIN top USING (doc_id)
        ORDER BY p.doc_id
    """,
    doc="Gopher-style repetition quality signals: duplicate-word fraction, "
    "duplicate char-5-gram fraction, top word-bigram share — the standard "
    "post-dedup boilerplate/spam gate for LLM training corpora.",
    tags=("pipeline", "text"),
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.repetition_signals(docs).orderBy("doc_id")


@register(
    "dedup_exact_stats",
    oracle="""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(text)) AS n_exact,
               COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                 AS n_normalized
        FROM documents
    """,
    doc="Exact + normalized dedup accounting over the corpus.",
    tags=("pipeline", "dedup"),
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.exact_dedup_stats(docs)


_WORDS_CTE = """
        words AS (
          SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS w
          FROM docs
        )"""

_SIG_COLS = ", ".join(
    f"min(md5('{j}:' || w)) AS sig_{j}" for j in range(dedup.MINHASH_K)
)


@register(
    "dedup_minhash_signatures",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents),
        {_WORDS_CTE}
        SELECT doc_id, {_SIG_COLS}
        FROM words GROUP BY doc_id ORDER BY doc_id
    """,
    doc="MinHash signatures (k=6 seeded md5 minima over the word set).",
    tags=("pipeline", "dedup"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.minhash_signatures(docs).orderBy("doc_id")


_BANDS_SQL = ", ".join(
    f"md5(sig_{2 * b} || sig_{2 * b + 1}) AS b{b}" for b in range(dedup.LSH_BANDS)
)
_CAND_UNION = " UNION ".join(
    f"SELECT x.doc_id AS a, y.doc_id AS b FROM bands x JOIN bands y "
    f"ON x.b{b} = y.b{b} AND x.doc_id < y.doc_id"
    for b in range(dedup.LSH_BANDS)
)


@register(
    "dedup_lsh_neardup_pairs",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        {_WORDS_CTE},
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM words GROUP BY doc_id),
        bands AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
        cand AS ({_CAND_UNION}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM words GROUP BY doc_id),
        common AS (
          SELECT wa.doc_id AS a, wb.doc_id AS b, COUNT(*) AS c
          FROM words wa JOIN words wb ON wa.w = wb.w AND wa.doc_id < wb.doc_id
          GROUP BY 1, 2
        )
        SELECT common.a, common.b,
               round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM common
        JOIN cand ON common.a = cand.a AND common.b = cand.b
        JOIN sizes sa ON sa.doc_id = common.a
        JOIN sizes sb ON sb.doc_id = common.b
        WHERE c / (sa.sz + sb.sz - c) >= 0.8
        ORDER BY common.a, common.b
    """,
    doc="MinHash-LSH near-dup pipeline: band buckets → candidate pairs → "
    "exact word-set Jaccard >= 0.8 verification.",
    tags=("pipeline", "dedup"),
)
def dedup_lsh_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    cand = dedup.lsh_candidate_pairs(docs)
    return (
        dedup.jaccard_pairs(docs, n=1, threshold=0.8, candidates=cand)
        .orderBy("a", "b")
    )


_VOTE_COLS = ", ".join(
    f"sum(CASE WHEN ascii(substr(md5(tok), {j + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END)"
    f" AS v_{j}"
    for j in range(16)
)
_SIMHASH_SUM = " + ".join(
    f"CASE WHEN v_{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(16)
)


@register(
    "dedup_simhash",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ),
        votes AS (SELECT doc_id, {_VOTE_COLS} FROM toks GROUP BY doc_id)
        SELECT doc_id, CAST({_SIMHASH_SUM} AS INTEGER) AS simhash
        FROM votes ORDER BY doc_id
    """,
    doc="16-bit SimHash: per-bit majority vote over token hashes.",
    tags=("pipeline", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return dedup.simhash16(docs).orderBy("doc_id")


@register(
    "dedup_ngram_jaccard_pairs",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
        sh AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(
              generate_series(1, greatest(len(string_split(trim(text), ' ')) - 2, 1)),
              i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + 2), ' ')
            ))) AS shingle
          FROM docs
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT common.a, common.b, round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = common.a
        JOIN sizes sb ON sb.doc_id = common.b
        WHERE c / (sa.sz + sb.sz - c) >= 0.2
        ORDER BY common.a, common.b
    """,
    doc="Exact 3-gram shingle-set Jaccard pairs (>= 0.2) via shingle join.",
    tags=("pipeline", "dedup"),
)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 150
    )
    return dedup.jaccard_pairs(docs, n=3, threshold=0.2).orderBy("a", "b")


@register(
    "dedup_jaccard_dfcap_pairs",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        {_WORDS_CTE},
        rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 30),
        sh AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT common.a, common.b, round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = common.a
        JOIN sizes sb ON sb.doc_id = common.b
        WHERE round(c / (sa.sz + sb.sz - c), 6) >= 0.5
        ORDER BY common.a, common.b
    """,
    doc="Word-set Jaccard with a document-frequency cap (df <= 30): the "
    "hot-key guard that drops stopword shingles before the self-join, so "
    "no single shingle key can generate a quadratic straggler partition.",
    tags=("pipeline", "dedup"),
)
def dedup_jaccard_dfcap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    return dedup.jaccard_pairs(docs, n=1, threshold=0.5, max_df=30).orderBy("a", "b")


_DFCAP_PAIRS_CTES = f"""
        docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        {_WORDS_CTE},
        rare AS (SELECT w FROM words GROUP BY w HAVING COUNT(*) <= 30),
        sh AS (SELECT doc_id, w FROM words WHERE w IN (SELECT w FROM rare)),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.w = b.w AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT common.a, common.b
          FROM common
          JOIN sizes sa ON sa.doc_id = common.a
          JOIN sizes sb ON sb.doc_id = common.b
          WHERE round(c / (sa.sz + sb.sz - c), 6) >= 0.5
        )"""


@register(
    "dedup_connected_components",
    oracle=f"""
        WITH RECURSIVE
        {_DFCAP_PAIRS_CTES},
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs
        ),
        cc(node, comp) AS (
            SELECT DISTINCT src, src FROM edges
          UNION
            SELECT e.src, c.comp FROM edges e JOIN cc c ON e.dst = c.node
        )
        SELECT CAST(node AS BIGINT) AS node,
               CAST(MIN(comp) AS BIGINT) AS component
        FROM cc GROUP BY node ORDER BY node
    """,
    doc="Connected components of the near-dup pair graph (min-label "
    "propagation; the dedup-group primitive — keep node = component). "
    "Oracle computes min reachable id via a recursive CTE.",
    tags=("pipeline", "dedup"),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    pairs = dedup.jaccard_pairs(docs, n=1, threshold=0.5, max_df=30)
    return dedup.connected_components(pairs).orderBy("node")


# -------------------------------------------------------- embeddings / ANN --

_COS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))
"""


@register(
    "emb_neardup_pairs",
    oracle=f"""
        SELECT a.vec_id AS a, b.vec_id AS b, round({_COS}, 4) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 0.45
        ORDER BY a, b
    """,
    doc="Embedding-cosine near-duplicate pairs (exact all-pairs baseline).",
    tags=("pipeline", "embedding"),
)
def emb_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dedup.embedding_neardup_pairs(emb, threshold=0.45).orderBy("a", "b")


_BUCKET4 = "(" + " + ".join(
    f"CASE WHEN {{t}}.embedding[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END"
    for i in range(4)
) + ")"


@register(
    "emb_neardup_pairs_lsh",
    oracle=f"""
        WITH bucketed AS (
          SELECT vec_id, embedding,
                 CAST({_BUCKET4.format(t='embeddings')} AS INTEGER) AS bucket
          FROM embeddings
        )
        SELECT a.vec_id AS a, b.vec_id AS b, round({_COS}, 4) AS cos
        FROM bucketed a JOIN bucketed b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.bucket, b.bucket)) <= 1 AND {_COS} >= 0.45
        ORDER BY a, b
    """,
    doc="Bucketed cosine near-dup (headline scale path): 4-bit sign-bit LSH "
    "bucket both sides, 1-bit multi-probe equi-join, exact cosine verify — "
    "O(n·(bits+1)) shuffle instead of the all-pairs nested loop.",
    tags=("pipeline", "embedding", "dedup"),
)
def emb_neardup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return dedup.embedding_neardup_pairs_lsh(emb, threshold=0.45, n_bits=4).orderBy(
        "a", "b"
    )


@register(
    "ann_knn_join",
    oracle=f"""
        WITH bucketed AS (
          SELECT vec_id, embedding,
                 CAST({_BUCKET4.format(t='embeddings')} AS INTEGER) AS bucket
          FROM embeddings
        ),
        scored AS (
          SELECT a.vec_id AS a, b.vec_id AS b, {_COS} AS cos
          FROM bucketed a JOIN bucketed b
            ON a.vec_id != b.vec_id
           AND bit_count(xor(a.bucket, b.bucket)) <= 1
        )
        SELECT a, b, rn, round(cos, 4) AS cos FROM (
          SELECT a, b, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY a
                                         ORDER BY cos DESC, b) AS INTEGER) AS rn
          FROM scored
        ) WHERE rn <= 3
        ORDER BY a, rn
    """,
    doc="k-NN join (batch ANN): top-3 cosine neighbors for EVERY vector via "
    "sign-bit LSH bucket + 1-bit multi-probe equi-join, per-query window "
    "rank — the semantic-dedup / retrieval-labeling primitive.",
    tags=("pipeline", "embedding", "ann"),
)
def ann_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.knn_join(emb, k=3, n_bits=4).orderBy("a", "rn")


@register(
    "ann_bruteforce_topk",
    oracle=f"""
        SELECT b.vec_id, round({_COS}, 4) AS cos
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 7) a
        CROSS JOIN embeddings b
        WHERE b.vec_id != 7
        ORDER BY {_COS} DESC, b.vec_id
        LIMIT 10
    """,
    doc="Exact top-10 cosine neighbors of vector 7 (brute-force baseline).",
    tags=("pipeline", "embedding", "ann"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.brute_force_topk(emb, query_id=7, k=10)


_BUCKET = "(" + " + ".join(
    f"CASE WHEN {{t}}.embedding[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END"
    for i in range(6)
) + ")"


@register(
    "ann_signbit_lsh_topk",
    oracle=f"""
        WITH bucketed AS (
          SELECT vec_id, embedding,
                 CAST({_BUCKET.format(t='embeddings')} AS INTEGER) AS bucket
          FROM embeddings
        )
        SELECT b.vec_id, b.bucket, round({_COS}, 4) AS cos
        FROM (SELECT embedding, bucket FROM bucketed WHERE vec_id = 7) a
        CROSS JOIN bucketed b
        WHERE b.bucket = a.bucket AND b.vec_id != 7
        ORDER BY {_COS} DESC, b.vec_id
        LIMIT 5
    """,
    doc="Sign-bit LSH ANN: 6-bit bucket on leading-dim signs; search only "
    "the query's bucket (the 100 TB partition-pruned layout).",
    tags=("pipeline", "embedding", "ann"),
)
def ann_signbit_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.signbit_lsh_topk(emb, query_id=7, k=5)


_CCOS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> b.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))
"""

_QCOS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> b.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
"""


@register(
    "ann_ivf_topk",
    oracle=f"""
        WITH cents AS (
          SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < 16
        ),
        scored AS (
          SELECT b.vec_id, c.cell, {_CCOS} AS ccos
          FROM embeddings b CROSS JOIN cents c
        ),
        assigned AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, cell) AS rk
            FROM scored
          ) WHERE rk = 1
        )
        SELECT b.vec_id, a.cell, round({_QCOS}, 4) AS cos
        FROM embeddings b
        JOIN assigned a ON a.vec_id = b.vec_id
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 7) q
        WHERE a.cell = (SELECT cell FROM assigned WHERE vec_id = 7)
          AND b.vec_id != 7
        ORDER BY {_QCOS} DESC, b.vec_id
        LIMIT 5
    """,
    doc="IVF-flat ANN (nprobe=1): coarse-quantize to 16 cells (first-16 "
    "centroids), search only the query's cell — the partitioned-layout "
    "scale path for similarity search.",
    tags=("pipeline", "embedding", "ann"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.ivf_topk(emb, query_id=7, k=5)


@register(
    "ann_ivf_multiprobe_topk",
    oracle=f"""
        WITH cents AS (
          SELECT vec_id AS cell, embedding FROM embeddings WHERE vec_id < 16
        ),
        scored AS (
          SELECT b.vec_id, c.cell, {_CCOS} AS ccos
          FROM embeddings b CROSS JOIN cents c
        ),
        assigned AS (
          SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, cell) AS rk
            FROM scored
          ) WHERE rk = 1
        ),
        probe AS (
          SELECT cell FROM (
            SELECT c.cell, {_CCOS.replace("b.embedding", "qq.embedding")} AS qcos
            FROM (SELECT embedding FROM embeddings WHERE vec_id = 7) qq
            CROSS JOIN cents c
            ORDER BY qcos DESC, c.cell
            LIMIT 4
          )
        )
        SELECT b.vec_id, a.cell, round({_QCOS}, 4) AS cos
        FROM embeddings b
        JOIN assigned a ON a.vec_id = b.vec_id
        CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 7) q
        WHERE a.cell IN (SELECT cell FROM probe)
          AND b.vec_id != 7
        ORDER BY {_QCOS} DESC, b.vec_id
        LIMIT 8
    """,
    doc="Multi-probe IVF ANN (nprobe=4): search the 4 cells nearest the "
    "query — the recall/scan-volume knob of the IVF layout; with cell as "
    "the partition key this is 4-partition pruning at 100 TB.",
    tags=("pipeline", "embedding", "ann"),
)
def ann_ivf_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.ivf_topk(emb, query_id=7, k=8, nprobe=4)


@register(
    "ann_bucket_histogram",
    oracle=f"""
        SELECT CAST({_BUCKET.format(t='embeddings')} AS INTEGER) AS bucket,
               COUNT(*) AS n
        FROM embeddings
        GROUP BY 1 ORDER BY 1
    """,
    doc="LSH bucket occupancy histogram (skew diagnostic for the layout).",
    tags=("pipeline", "embedding"),
)
def ann_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.bucket_histogram(emb)


@register(
    "text_winnowing_fingerprints",
    oracle="""
        WITH base AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
          FROM documents WHERE doc_id < 100
        ),
        toks AS (
          SELECT doc_id, unnest(generate_series(1, len(a))) AS pos, a FROM base
        ),
        hashed AS (SELECT doc_id, pos, md5(a[pos]) AS h FROM toks),
        wins AS (
          SELECT doc_id,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM hashed
        )
        SELECT DISTINCT doc_id, fp FROM wins ORDER BY doc_id, fp
    """,
    doc="Winnowing (rolling-window min-hash) document fingerprints — the "
    "MOSS scheme; shared fingerprints → near-dup candidates by equi-join.",
    tags=("pipeline", "text", "dedup"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 100
    )
    return text.winnowing_fingerprints(docs, window=4).orderBy("doc_id", "fp")


@register(
    "text_winnowing_neardup_pairs",
    oracle="""
        WITH base AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a
          FROM documents WHERE doc_id < 100
        ),
        toks AS (
          SELECT doc_id, unnest(generate_series(1, len(a))) AS pos, a FROM base
        ),
        hashed AS (SELECT doc_id, pos, md5(a[pos]) AS h FROM toks),
        wins AS (
          SELECT doc_id,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
          FROM hashed
        ),
        fps AS (SELECT DISTINCT doc_id, fp FROM wins)
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS shared_fps
        FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
        GROUP BY 1, 2
        HAVING COUNT(*) >= 8
        ORDER BY a, b
    """,
    doc="Winnowing near-dup detection: docs sharing >= 8 fingerprints "
    "(fingerprint equi-join instead of all-pairs).",
    tags=("pipeline", "text", "dedup"),
)
def text_winnowing_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 100
    )
    fps = text.winnowing_fingerprints(docs, window=4)
    a = fps.select(F.col("doc_id").alias("a"), "fp")
    b = fps.select(F.col("doc_id").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= 8)
        .orderBy("a", "b")
    )


@register(
    "text_heavy_hitters",
    oracle="""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
              FROM documents)
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 20
    """,
    doc="Corpus heavy hitters: top-20 tokens by frequency (explode + "
    "map-side partial count + top-k).",
    tags=("pipeline", "text"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@register(
    "pipeline_end_to_end",
    oracle=f"""
        WITH scored AS (
          SELECT doc_id, lang, source,
                 len({_TOKS}) AS token_count,
                 CASE WHEN len({_TOKS}) BETWEEN 20 AND 200 THEN 40 ELSE 10 END
                   + CASE WHEN (length(text) - len({_TOKS}) + 1) / len({_TOKS})
                          BETWEEN 3 AND 8 THEN 30 ELSE 5 END
                   + round(len(list_distinct({_TOKS})) / len({_TOKS}) * 30, 2)
                   AS quality_score,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
          FROM documents
        ),
        deduped AS (
          SELECT * FROM scored
          WHERE doc_id = (SELECT min(s2.doc_id) FROM scored s2 WHERE s2.fp = scored.fp)
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(token_count) AS BIGINT) AS total_tokens,
               CAST(round(CAST(SUM(CAST(quality_score AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(*), 4) AS DOUBLE) AS avg_quality
        FROM deduped
        WHERE quality_score >= 60
        GROUP BY lang
        ORDER BY lang
    """,
    doc="Composed training-data pipeline: quality score → normalized-text "
    "dedup (keep lowest doc_id) → quality filter → per-language stats.",
    tags=("pipeline", "composed"),
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = text.with_fingerprint(text.with_quality_score(docs))
    w = W.partitionBy("fingerprint")
    deduped = (
        scored.withColumn("min_doc", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_doc"))
    )
    return (
        deduped.filter(F.col("quality_score") >= 60)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.col("quality_score").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


@register(
    "ann_bruteforce_topk_blas",
    oracle=f"""
        SELECT b.vec_id, round({_COS}, 4) AS cos
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 7) a
        CROSS JOIN embeddings b
        WHERE b.vec_id != 7
        ORDER BY {_COS} DESC, b.vec_id
        LIMIT 10
    """,
    doc="Scale-path ANN: blocked numpy GEMV over Arrow batches (mapInPandas)"
    " generates a 3k candidate set; final scores come from exact-fold"
    " rescore of the candidates, so the result is bit-identical to the"
    " brute-force baseline (and its DuckDB list_sum oracle) at GEMV cost.",
    tags=("pipeline", "embedding", "ann"),
)
def ann_bruteforce_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.brute_force_topk_blas(emb, query_id=7, k=10)


@register(
    "dedup_char_shingle_jaccard",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 80),
        sh AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, greatest(length(text) - 4, 1)),
                           i -> substr(text, i, 5)))) AS s
          FROM docs
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT common.a, common.b, round(c / (sa.sz + sb.sz - c), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = common.a
        JOIN sizes sb ON sb.doc_id = common.b
        WHERE c / (sa.sz + sb.sz - c) >= 0.25
        ORDER BY common.a, common.b
    """,
    doc="Character 5-gram shingle Jaccard pairs (>= 0.25) — the classic "
    "text-dedup shingling, complementing the word-gram variant.",
    tags=("pipeline", "dedup"),
)
def dedup_char_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 80
    )
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 4, 1)),"
                    " i -> substr(text, i, 5))"
                )
            )
        ).alias("s"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "s")
    b = sh.select(F.col("doc_id").alias("b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("c") / (F.col("sz_a") + F.col("sz_b") - F.col("c")), 6),
        )
        .filter(F.col("jaccard") >= 0.25)
        .select("a", "b", "jaccard")
        .orderBy("a", "b")
    )


# ---------------------------------------------------------- temporal joins --


@register(
    "asof_join_click_purchase",
    oracle="""
        WITH purchases AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click'
        )
        SELECT p.event_id, p.user_id, p.ts_us AS purchase_us,
               c.ts_us AS click_us,
               p.ts_us - c.ts_us AS gap_us
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
        ORDER BY p.event_id
    """,
    doc="As-of join (operator Spark lacks): latest prior click per purchase "
    "via the union-sort trick — one shuffle, no pair blowup; oracle uses "
    "DuckDB's native ASOF JOIN.",
    tags=("pipeline", "temporal", "asof"),
)
def asof_join_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.temporal import asof_join

    ev = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "ts_us", F.expr("ts div 1000")  # DuckDB reads the nanos
        # column as micro-precision TIMESTAMP; align on epoch micros
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts_us", right_ts="ts_us",
        right_cols=["ts_us"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("purchase_us"),
        F.col("ts_us_asof").alias("click_us"),
        (F.col("ts_us") - F.col("ts_us_asof")).alias("gap_us"),
    ).orderBy("event_id")


@register(
    "range_join_click_window",
    oracle="""
        WITH purchases AS (
          SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase'
        ),
        clicks AS (
          SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click'
        )
        SELECT p.user_id, COUNT(*) AS n_pairs
        FROM purchases p JOIN clicks c
          ON p.user_id = c.user_id
         AND c.ts_us >= p.ts_us - 86400000000
         AND c.ts_us < p.ts_us
        GROUP BY p.user_id
        ORDER BY p.user_id
    """,
    doc="Range join: clicks within 24h before each purchase per user; the "
    "range predicate rides in the join condition.",
    tags=("pipeline", "temporal", "range-join"),
)
def range_join_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.temporal import range_join

    ev = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts_us")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    pairs = range_join(
        purchases, clicks, key="user_id", left_ts="ts_us", right_ts="ts_us",
        lower_delta=-86_400_000_000, upper_delta=0,
    )
    return (
        pairs.groupBy(F.col("l.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


# -------------------------------------------------------------- multimodal --


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id,
               CAST(length(text) // 16 AS INTEGER) AS n_frames,
               CAST(CASE WHEN length(text) // 16 = 0 THEN 0
                    ELSE ((length(text) // 16) + 3) // 4 END AS INTEGER)
                 AS n_sampled,
               CAST(CASE WHEN length(text) >= 16
                    THEN ascii(substr(text, 1, 1)) ELSE -1 END AS INTEGER)
                 AS first_frame_byte
        FROM documents
        ORDER BY doc_id
    """,
    doc="Frame sampling for RAW fixed-size frame streams: treat the "
    "payload as 16 B frames, sample every 4th — counts + first-frame "
    "byte verified. Container media with a real frame index goes "
    "through multimodal_riff_frames (RIFF chunk-walk parse).",
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    blobs = multimodal.to_blob_table(docs)
    return multimodal.sample_frames(blobs, frame_bytes=16, every=4).orderBy("doc_id")


@register(
    "multimodal_resize",
    oracle="""
        SELECT doc_id, 4 AS width, 3 AS height, 1 AS channels,
               23 AS byte_len,
               CAST(list_sum(list_transform(generate_series(0, 11), p ->
                    ( (doc_id * 29 + ((p // 4) * 2) * 8 + (p % 4) * 2) % 256
                    + (doc_id * 29 + ((p // 4) * 2) * 8 + (p % 4) * 2 + 1)
                      % 256
                    + (doc_id * 29 + ((p // 4) * 2 + 1) * 8 + (p % 4) * 2)
                      % 256
                    + (doc_id * 29 + ((p // 4) * 2 + 1) * 8 + (p % 4) * 2
                       + 1) % 256) // 4)) AS BIGINT) AS gray_sum
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL grayscale resize chain (round 7 — the byte-truncation stub "
    "is gone): per doc an 8x6 P5 (netpbm graymap) raster with pixel "
    "v(y,x) = (doc_id*29 + y*8 + x) % 256 is encoded to real bytes, "
    "DECODED, box-filtered 2x2 by exact integer pixel-area mean "
    "(truncated division), RE-ENCODED as P5, then decoded AGAIN by "
    "pixel_stats — so the oracle's closed-form block-mean sum verifies "
    "the full decode→resize→encode→decode round trip, and byte_len "
    "checks the re-encoded header ('P5\\n4 3\\n255\\n' + 12 raster "
    "bytes = 23). Both maps are Arrow-batched and shuffle-free.",
    tags=("pipeline", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                gray = bytes((int(d) * 29 + i) % 256 for i in range(48))
                payloads.append(b"P5\n8 6\n255\n" + gray)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    resized = multimodal.resize_image(blobs, factor=2)
    stats = multimodal.pixel_stats(resized.select("doc_id", "payload"))
    return (
        stats.join(resized.select("doc_id", "byte_len"), "doc_id")
        .select(
            "doc_id", "width", "height", "channels", "byte_len",
            F.col("r_sum").alias("gray_sum"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_blob_features",
    oracle="""
        SELECT doc_id,
               'application/octet-stream' AS media_type,
               CAST(length(text) AS INTEGER) AS byte_len,
               CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
               CAST(list_sum(list_transform(
                      generate_series(1, least(64, length(text))),
                      i -> ascii(substr(text, i, 1)))) % 997 AS INTEGER)
                 AS checksum_mod
        FROM documents
        ORDER BY doc_id
    """,
    doc="Multimodal plumbing: text→binary payload table, Arrow-batched "
    "mapInPandas byte-level statistics over OPAQUE payloads — the honest "
    "fallback when no codec applies (real decode paths: "
    "multimodal_pixel_stats / multimodal_wav_stats / "
    "multimodal_feature_real).",
    tags=("pipeline", "multimodal"),
)
def multimodal_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    blobs = multimodal.to_blob_table(docs)
    return multimodal.opaque_features(blobs).orderBy("doc_id")


@register(
    "multimodal_pixel_stats",
    oracle="""
        SELECT doc_id, 8 AS width, 6 AS height, 3 AS channels,
               CAST(list_sum(list_transform(generate_series(0, 143),
                    i -> CASE WHEN i % 3 = 0 THEN (doc_id * 31 + i) % 256
                         ELSE 0 END)) AS BIGINT) AS r_sum,
               CAST(list_sum(list_transform(generate_series(0, 143),
                    i -> CASE WHEN i % 3 = 1 THEN (doc_id * 31 + i) % 256
                         ELSE 0 END)) AS BIGINT) AS g_sum,
               CAST(list_sum(list_transform(generate_series(0, 143),
                    i -> CASE WHEN i % 3 = 2 THEN (doc_id * 31 + i) % 256
                         ELSE 0 END)) AS BIGINT) AS b_sum
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL image decode end-to-end (round-6: the codec stub is gone): "
    "per doc an 8x6 RGB raster with pixel byte i = (doc_id*31+i) % 256 is "
    "ENCODED to real image bytes — binary PPM (P6) for even doc_ids, "
    "24-bit BMP (bottom-up, padded rows, BGR) for odd — then DECODED by "
    "operators/multimodal.decode_image (pure numpy netpbm/BMP parsers) "
    "and reduced to exact int64 per-channel sums. The oracle recomputes "
    "the sums from the pixel formula, so a single mis-parsed header "
    "field, row order, channel swap, or padding byte hash-mismatches. "
    "Both encode and decode are Arrow-batched narrow maps — no shuffle, "
    "scales with executors.",
    tags=("pipeline", "multimodal"),
)
def multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                rgb = bytes((int(d) * 31 + i) % 256 for i in range(144))
                payloads.append(
                    multimodal.encode_ppm(8, 6, rgb)
                    if int(d) % 2 == 0
                    else multimodal.encode_bmp(8, 6, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.pixel_stats(blobs).orderBy("doc_id")


_FUNNEL_W = 3 * 24 * 3600 * 1_000_000_000  # 3 days in ns


@register(
    "events_funnel",
    oracle=f"""
        WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts FROM events),
        s1 AS (
          SELECT user_id, MIN(ts) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY 1
        ),
        s2 AS (
          SELECT e.user_id, ANY_VALUE(s1.t1) AS t1, MIN(e.ts) AS t2
          FROM e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
            AND e.ts - s1.t1 <= {_FUNNEL_W}
          GROUP BY 1
        ),
        s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
            AND e.ts - s2.t1 <= {_FUNNEL_W}
          GROUP BY 1
        )
        SELECT stage, step, users FROM (
          VALUES (1, 'view', (SELECT COUNT(*) FROM s1)),
                 (2, 'click', (SELECT COUNT(*) FROM s2)),
                 (3, 'purchase', (SELECT COUNT(*) FROM s3))
        ) AS t(stage, step, users)
        ORDER BY stage
    """,
    doc="Ordered view->click->purchase funnel within a 3-day window: one "
    "shuffle keyed by user + a codegen'd aggregate() fold over each user's "
    "sorted events (greedy earliest-match semantics; the oracle runs the "
    "equivalent iterated min-after-previous joins).",
    tags=("events", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import temporal

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.funnel_counts(
        ev, steps=("view", "click", "purchase"), within_ns=_FUNNEL_W
    )


_KMV_SCALE = float(16**13)  # 2^52, exact in a double


def _kmv_oracle_cte(alias: str, hash_src: str, k: int = 256) -> str:
    return f"""
        {alias}_h AS (
          SELECT DISTINCT {hash_src} ORDER BY h LIMIT {k}
        ),
        {alias}_a AS (
          SELECT MAX(h) AS hk, COUNT(*) AS m FROM {alias}_h
        ),
        {alias}_e AS (
          SELECT CAST(round(CASE WHEN m < {k} THEN CAST(m AS DOUBLE)
                       ELSE {float(k - 1)} / (CAST('0x' || substr(hk, 1, 13) AS BIGINT)
                                              / {_KMV_SCALE}) END) AS BIGINT)
                 AS dv_estimate
          FROM {alias}_a
        )"""


@register(
    "sketch_kmv_distinct",
    oracle=f"""
        WITH {_kmv_oracle_cte("pk", "md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem")},
        {_kmv_oracle_cte("sk", "md5(CAST(l_suppkey AS VARCHAR)) AS h FROM lineitem")},
        {_kmv_oracle_cte("cu", "h FROM (SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders "
                               "UNION SELECT md5(CAST(c_custkey AS VARCHAR)) FROM customer) u")}
        SELECT 'custkey_union' AS col_name, dv_estimate FROM cu_e
        UNION ALL SELECT 'l_partkey', dv_estimate FROM pk_e
        UNION ALL SELECT 'l_suppkey', dv_estimate FROM sk_e
        ORDER BY col_name
    """,
    doc="KMV (bottom-k) distinct-count sketch: deterministic md5 bottom-k, "
    "so the APPROXIMATE estimate itself hash-matches the oracle — and the "
    "union row exercises the associative sketch merge (per-shard rollup "
    "without rescanning). Shuffle is O(partitions x k), never O(rows).",
    tags=("pipeline", "sketch"),
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    pk = sketch.kmv_distinct_estimate(t["lineitem"], "l_partkey").withColumnRenamed(
        "column", "col_name"
    )
    sk = sketch.kmv_distinct_estimate(t["lineitem"], "l_suppkey").withColumnRenamed(
        "column", "col_name"
    )
    cu = sketch.kmv_union_estimate(
        [
            sketch.kmv_sketch(t["orders"], "o_custkey"),
            sketch.kmv_sketch(t["customer"], "c_custkey"),
        ],
        label="custkey_union",
    ).withColumnRenamed("column", "col_name")
    return pk.union(sk).union(cu).orderBy("col_name")


@register(
    "text_bm25_scores",
    oracle="""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM documents
        ),
        per_doc AS (
          SELECT doc_id,
                 COUNT(*) AS dl,
                 SUM(CASE WHEN tok = 'data' THEN 1 ELSE 0 END) AS tf0,
                 SUM(CASE WHEN tok = 'hash' THEN 1 ELSE 0 END) AS tf1,
                 SUM(CASE WHEN tok = 'window' THEN 1 ELSE 0 END) AS tf2
          FROM tok GROUP BY 1
        ),
        stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sdl,
                 SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                 SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                 SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
          FROM per_doc
        ),
        scored AS (
          SELECT doc_id,
                 round(
                   ln(1.0 + (n_docs - df0 + 0.5) / (df0 + 0.5))
                     * (CAST(tf0 AS DOUBLE) * 2.2
                        / (CAST(tf0 AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * (dl / (CAST(sdl AS DOUBLE) / n_docs)))))
                 + ln(1.0 + (n_docs - df1 + 0.5) / (df1 + 0.5))
                     * (CAST(tf1 AS DOUBLE) * 2.2
                        / (CAST(tf1 AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * (dl / (CAST(sdl AS DOUBLE) / n_docs)))))
                 + ln(1.0 + (n_docs - df2 + 0.5) / (df2 + 0.5))
                     * (CAST(tf2 AS DOUBLE) * 2.2
                        / (CAST(tf2 AS DOUBLE)
                           + 1.2 * (0.25 + 0.75 * (dl / (CAST(sdl AS DOUBLE) / n_docs)))))
                 , 6) AS bm25
          FROM per_doc, stats
        )
        SELECT doc_id, bm25 FROM scored WHERE bm25 > 0
        ORDER BY bm25 DESC, doc_id
    """,
    doc="BM25 relevance of every document against a fixed 3-term query — "
    "one explode + one per-doc aggregate; corpus stats broadcast back as a "
    "1-row frame; fixed-order float sum keeps the oracle hash exact.",
    tags=("pipeline", "text", "retrieval"),
)
def text_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return text.bm25_scores(docs, terms=("data", "hash", "window"))


@register(
    "events_cohort_retention",
    oracle="""
        WITH ud AS (
          SELECT DISTINCT user_id AS u,
                 CAST(epoch_ns(ts) // 86400000000000 AS INTEGER) AS day
          FROM events
        ),
        c AS (SELECT u, MIN(day) AS cohort_day FROM ud GROUP BY 1)
        SELECT strftime(DATE '1970-01-01' + INTERVAL (cohort_day) DAY,
                        '%Y-%m-%d') AS cohort,
               day - cohort_day AS day_offset,
               CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS n_users
        FROM ud JOIN c USING (u)
        WHERE day - cohort_day <= 7
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="Cohort retention matrix over the event stream: users bucketed by "
    "first-active day, distinct-counted per returning day offset. One "
    "(user, day) distinct + user-keyed join; nanos day bucketing is pure "
    "integer arithmetic (timezone-free).",
    tags=("events", "temporal", "retention"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import temporal

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return temporal.cohort_retention(ev, max_offset=7)


@register(
    "events_session_windows",
    oracle="""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        ),
        d AS (
          SELECT user_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 600000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ),
        s AS (
          SELECT user_id, us,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM d
        )
        SELECT user_id,
               MIN(us) AS session_start_us,
               MAX(us) + 600000000 AS session_end_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_us
    """,
    doc="Native session_window aggregation (10-min gap) over the event "
    "stream — Spark's built-in merging-session operator (one shuffle on "
    "user, sessions merged inside the aggregate; the same expression runs "
    "unchanged under readStream). Oracle reproduces it with the classic "
    "gaps-and-islands SQL. Timestamps flow as epoch micros (tz-free).",
    tags=("events", "temporal", "session"),
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    et = F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).alias("et")
    return (
        ev.select("user_id", et)
        .groupBy("user_id", F.session_window("et", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
    )
