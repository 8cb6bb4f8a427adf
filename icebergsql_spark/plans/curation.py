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
