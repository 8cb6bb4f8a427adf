"""Training-corpus curation gate queries (operators/curation.py wired into
the driver contract): deterministic splits, hash & stratified sampling,
sequence packing, quality-filter cascades, passage-level dedup.

Oracle portability notes:
  - md5 hex → int: Spark conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT).
  - fraction math stays in DOUBLE on both sides (DuckDB would otherwise
    parse 0.1 as DECIMAL and round differently from Spark's double).
  - DuckDB sum(int) is HUGEINT → explicit BIGINT casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators import curation
from icebergsql_spark.plans.registry import load_tables, register

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_BUCKET = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 100"


@register(
    "curation_split_counts",
    oracle=f"""
        WITH b AS (
          SELECT lang, {_BUCKET} AS bucket FROM documents
        )
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n
        FROM b GROUP BY 1, 2 ORDER BY split, lang
    """,
    doc="Deterministic 90/5/5 train/val/test split by id hash; counts per "
    "split×lang. Narrow map — the reproducible-split primitive.",
    tags=("curation",),
)
def curation_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        curation.split_assign(docs)
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "lang")
    )


@register(
    "curation_hash_sample",
    oracle=f"""
        SELECT doc_id, lang FROM documents
        WHERE {_BUCKET} < 10
        ORDER BY doc_id
    """,
    doc="Shuffle-free deterministic ~10% sample by id-hash cut — the "
    "100 TB sampling path (stable under reruns and repartitioning).",
    tags=("curation",),
)
def curation_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.hash_sample(docs, 10).select("doc_id", "lang").orderBy("doc_id")


@register(
    "curation_stratified_sample",
    oracle="""
        WITH ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT doc_id, lang FROM ranked
        WHERE rn <= CEIL(n * CAST(0.1 AS DOUBLE))
        ORDER BY doc_id
    """,
    doc="Exact-count 10% sample per lang stratum, chosen by hash order — "
    "deterministic and unbiased; one shuffle keyed by stratum.",
    tags=("curation",),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        curation.stratified_exact_sample(docs, 0.1, strata_col="lang")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "curation_pack_stats",
    oracle=f"""
        WITH sized AS (
          SELECT doc_id, lang, len({_TOKS}) AS token_count FROM documents
        ), packed AS (
          SELECT lang AS shard, doc_id, token_count,
                 CAST(FLOOR(COALESCE(SUM(token_count) OVER (
                     PARTITION BY lang ORDER BY token_count DESC, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) / 512) AS BIGINT) AS bin
          FROM sized
        )
        SELECT shard, bin, COUNT(*) AS n_docs,
               CAST(SUM(token_count) AS BIGINT) AS tokens,
               ROUND(SUM(token_count) / 512, 6) AS fill
        FROM packed GROUP BY shard, bin ORDER BY shard, bin
    """,
    doc="Sequence packing: greedy contiguous binning of docs into "
    "512-token context windows, independently per lang shard (no global "
    "sort); per-bin fill ratios.",
    tags=("curation",),
)
def curation_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sized = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "token_count"
        ),
    )
    packed = curation.pack_documents(sized, capacity=512, shard_col="lang")
    return curation.pack_stats(packed, capacity=512).orderBy("shard", "bin")


@register(
    "curation_quality_verdicts",
    oracle=f"""
        WITH stats AS (
          SELECT doc_id,
                 len({_TOKS}) AS token_count,
                 ROUND(len(list_distinct({_TOKS})) / len({_TOKS}), 6) AS distinct_ratio,
                 ROUND((length(text) - len({_TOKS}) + 1) / len({_TOKS}), 6) AS avg_token_len
          FROM documents
        )
        SELECT doc_id, token_count, distinct_ratio, avg_token_len,
               CASE WHEN token_count < 30 THEN 'too_short'
                    WHEN token_count > 5000 THEN 'too_long'
                    WHEN distinct_ratio < 0.12 THEN 'low_diversity'
                    WHEN avg_token_len < 2.5 THEN 'tokens_too_short'
                    ELSE NULL END AS drop_reason,
               (CASE WHEN token_count < 30 THEN 'too_short'
                    WHEN token_count > 5000 THEN 'too_long'
                    WHEN distinct_ratio < 0.12 THEN 'low_diversity'
                    WHEN avg_token_len < 2.5 THEN 'tokens_too_short'
                    ELSE NULL END) IS NULL AS keep
        FROM stats ORDER BY doc_id
    """,
    doc="Quality-filter cascade: first failing rule is the drop reason "
    "(production-filter shape); pure narrow map fused into the scan.",
    tags=("curation", "text"),
)
def curation_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.quality_verdicts(docs).orderBy("doc_id")


@register(
    "curation_passage_dedup",
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        ), pass AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(list_slice(w, i*8+1, i*8+8), ' ') AS passage
          FROM toks, LATERAL unnest(
            range(0, greatest(CAST(ceil(len(w)/8.0) AS BIGINT), 1))
          ) AS t(i)
        ), ranked AS (
          SELECT doc_id, pos,
                 ROW_NUMBER() OVER (PARTITION BY md5(passage)
                                    ORDER BY doc_id, pos) AS rn
          FROM pass
        )
        SELECT doc_id, COUNT(*) AS n_passages,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               ROUND((COUNT(*) - SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END))
                     / COUNT(*), 6) AS dup_ratio
        FROM ranked GROUP BY doc_id ORDER BY doc_id
    """,
    doc="C4-style passage dedup: 8-word passages, first corpus-wide "
    "occurrence kept; per-doc dup ratios. Shuffle key = passage hash "
    "(high cardinality — no stopword hot keys).",
    tags=("curation", "dedup"),
)
def curation_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.passage_dedup_stats(docs, k=8).orderBy("doc_id")


_SHINGLE3 = (
    "list_transform(generate_series(1, greatest(len(string_split(trim(text), ' ')) - 2, 1)), "
    "i -> array_to_string(list_slice(string_split(trim(text), ' '), i, i + 2), ' '))"
)


@register(
    "curation_decontaminate",
    oracle=f"""
        WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 480),
        bench AS (
          SELECT DISTINCT unnest(list_distinct({_SHINGLE3})) AS shingle
          FROM documents WHERE doc_id >= 480
        ),
        csh AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLE3})) AS shingle
          FROM corpus
        ),
        hits AS (
          SELECT doc_id, COUNT(*) AS hit_shingles
          FROM csh WHERE shingle IN (SELECT shingle FROM bench)
          GROUP BY 1
        )
        SELECT c.doc_id,
               COALESCE(h.hit_shingles, 0) AS hit_shingles,
               COALESCE(h.hit_shingles, 0) > 0 AS contaminated
        FROM corpus c LEFT JOIN hits h USING (doc_id)
        ORDER BY c.doc_id
    """,
    doc="Benchmark decontamination: corpus docs sharing any word 3-gram "
    "with the held-out benchmark slice are flagged (GPT-3-style n-gram "
    "overlap). Benchmark shingles broadcast; corpus side never shuffles "
    "except the per-doc count.",
    tags=("curation", "decontamination"),
)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return curation.decontaminate(
        docs.filter(F.col("doc_id") < 480),
        docs.filter(F.col("doc_id") >= 480),
        n=3,
    ).orderBy("doc_id")


@register(
    "curation_mix_resample",
    oracle="""
        WITH m(source, w) AS (
          VALUES ('src0', 40), ('src1', 30), ('src2', 20), ('src3', 10)
        ),
        counts AS (
          SELECT d.source, COUNT(*) AS n, m.w
          FROM documents d JOIN m ON d.source = m.source
          GROUP BY 1, 3
        ),
        ranked AS (
          SELECT source, n, w,
                 row_number() OVER (ORDER BY n * 1000000000 // w, source) AS rn
          FROM counts
        ),
        star AS (SELECT n AS n_star, w AS w_star FROM ranked WHERE rn = 1),
        rates AS (
          SELECT c.source, (10000 * s.n_star * c.w) // (s.w_star * c.n) AS cut
          FROM counts c CROSS JOIN star s
        )
        SELECT d.source, r.cut,
               CAST(COUNT(*) AS BIGINT) AS kept
        FROM documents d
        JOIN rates r ON d.source = r.source
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
              % 10000 < r.cut
        GROUP BY 1, 2
        ORDER BY 1
    """,
    doc="Deterministic domain-mix resampling: integer-exact keep-rates "
    "proportional to target weights (binding source kept in full), rows "
    "selected by id-hash cut — reproducible across engines and reruns.",
    tags=("curation", "mixing"),
)
def curation_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    kept = curation.resample_to_mix(
        docs, {"src0": 40, "src1": 30, "src2": 20, "src3": 10}
    )
    return (
        kept.groupBy("source", "cut")
        .agg(F.count(F.lit(1)).alias("kept"))
        .orderBy("source")
    )
