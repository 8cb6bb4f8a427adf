"""Round-7 operator wave: MERGE schema evolution, metadata-table
completions, production-width fingerprints, streaming changepoint twins,
and curation/text additions.

Each query registers a PySpark callable plus a DuckDB oracle; names sit at
the head of ``plans/__init__.WINDOW_PRIORITY`` so every one receives a
driver CORRECTNESS row this round. Determinism contract as everywhere:
integer arithmetic on the hot path, single final float ops in matching
operand order, non-negative operands for integer division (Spark ``div``
truncates, DuckDB ``//`` floors — identical only when non-negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

# DuckDB spelling of operators/curation.md5_bucket
_MD5_BUCKET = "CAST('0x' || substr(md5({expr}), 1, 6) AS BIGINT) % {m}"


@register(
    "managed_merge_schema_evolution",
    oracle="""
        WITH t0 AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderstatus AS st
          FROM orders WHERE o_orderkey % 2 = 0
        ),
        s0 AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) + 5 AS c,
                 o_orderstatus AS st,
                 'cdc-' || CAST(o_orderkey % 3 AS VARCHAR) AS src_tag
          FROM orders WHERE o_orderkey % 3 = 0
        ),
        merged AS (
          SELECT COALESCE(t0.st, s0.st) AS st,
                 CASE WHEN s0.k IS NOT NULL THEN s0.c ELSE t0.c END AS c,
                 s0.src_tag AS src_tag
          FROM t0 FULL OUTER JOIN s0 USING (k)
        )
        SELECT st AS o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS DOUBLE) / 100.0 AS total,
               CAST(SUM(CASE WHEN src_tag IS NULL THEN 0 ELSE 1 END)
                    AS BIGINT) AS tagged,
               CAST(SUM(CASE WHEN src_tag IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS backfilled
        FROM merged
        GROUP BY st ORDER BY st
    """,
    doc="MERGE WITH SCHEMA EVOLUTION (the Spark 4.0 keyword; "
    "sql.py:_merge_managed → table.py merge(schema_evolution=True)): the "
    "CDC source carries a column the target lacks (src_tag), the merge "
    "adds it to the target schema as a METADATA-ONLY commit, matched "
    "rows update it, not-matched rows insert it, and every "
    "pre-evolution row reads back NULL through the per-era path in "
    "read_files (field-id mapped NULL backfill — cf. reference "
    "utils/TypeConversions.scala:26-35). Runs under merge-on-read so "
    "the query also asserts append-only file behavior: old files are "
    "NEVER rewritten for a schema change, the 100-TB-critical property. "
    "Oracle reconstructs the decision table with a FULL OUTER JOIN.",
    tags=("managed", "dml", "sql", "cdc"),
)
def managed_merge_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-msewh-"))
    tbl = eng.catalog.create_table(
        "ord_mse",
        "k bigint, c bigint, st string",
        partition_cols=["st"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderstatus").alias("st"),
    )
    tbl.insert(base.filter(F.col("k") % 2 == 0))
    files_before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    base.filter(F.col("k") % 3 == 0).select(
        "k",
        (F.col("c") + 5).alias("c"),
        "st",
        F.concat(F.lit("cdc-"), (F.col("k") % 3).cast("string")).alias(
            "src_tag"
        ),
    ).createOrReplaceTempView("mse_src_v")
    eng.sql("""
        MERGE WITH SCHEMA EVOLUTION INTO ord_mse t USING mse_src_v s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET c = s.c, src_tag = s.src_tag
        WHEN NOT MATCHED THEN INSERT *
    """)
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    assert files_before <= {
        f.path for f in snap.live_files()
    }, "schema evolution must never rewrite pre-evolution files (MoR)"
    assert [f.name for f in tbl.schema.fields] == ["k", "c", "st", "src_tag"]
    return (
        tbl.to_df()
        .groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
            F.sum(
                F.when(F.col("src_tag").isNull(), 0).otherwise(1)
            ).cast("bigint").alias("tagged"),
            F.sum(
                F.when(F.col("src_tag").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("backfilled"),
        )
        .orderBy("o_orderstatus")
    )
