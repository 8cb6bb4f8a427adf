"""Round-12 gate wave #3 (pipeline33): the IDENTIFIER FIELDS DDL
scenario, audio peak-normalization gain audit, and per-label embedding
centroid drift.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import local_result, nonempty, register

# --------------------------------------- IDENTIFIER FIELDS DDL --


@register(
    "managed_identifier_fields",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 year(o_orderdate) AS m
          FROM orders WHERE o_orderkey % 4 = 2
        )
        SELECT k, c, m, 'delete' AS _change_type
        FROM base WHERE k % 10 = 6
        UNION ALL
        SELECT k, c, m, 'update_preimage' AS _change_type
        FROM base WHERE k % 10 = 4
        UNION ALL
        SELECT k, CAST(c + 11 AS BIGINT) AS c, m,
               'update_postimage' AS _change_type
        FROM base WHERE k % 10 = 4
        ORDER BY _change_type, k
    """,
    doc="ALTER TABLE ... SET IDENTIFIER FIELDS — Iceberg's row-identity "
    "DDL (sql.py:_IDENT_FIELDS_RE): the table DECLARES its key once, "
    "and CALL system.create_changelog_view with NO identifier_columns "
    "follows that contract, rendering an UPDATE as "
    "update_preimage/update_postimage keyed on the declared fields "
    "instead of each CDC consumer guessing its own join key. "
    "Asserted in-gate: the persisted `identifier.fields` property, "
    "unknown-column refusal, and that DROP IDENTIFIER FIELDS makes "
    "the SAME changelog CALL degrade to plain delete+insert rows "
    "(identity gone -> no update pairing). The changelog over the "
    "declared identity hash-matches the arithmetic oracle — deletes, "
    "both update images, zero spurious inserts.",
    tags=("managed", "cdc", "sql"),
)
def managed_identifier_fields(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-idfwh-"))
    tbl = eng.catalog.create_table(
        "t_idfg", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("k") % 4 == 2)))
    eng.sql("ALTER TABLE t_idfg SET IDENTIFIER FIELDS (k)")
    tbl.refresh()
    assert tbl.meta.properties["identifier.fields"] == "k"
    try:
        eng.sql("ALTER TABLE t_idfg SET IDENTIFIER FIELDS (ghost)")
        raise AssertionError("unknown identifier column must be refused")
    except ValueError as ex:
        assert "unknown columns" in str(ex)
    mark_setup_done()  # base + identity declared; DML + changelog is the op
    eng.sql("UPDATE t_idfg SET c = c + 11 WHERE k % 10 = 4")
    eng.sql("DELETE FROM t_idfg WHERE k % 10 = 6")
    # no identifier_columns passed: the table's declared identity rules
    res = eng.sql(
        f"CALL system.create_changelog_view(table => 't_idfg',"
        f" from_snapshot_id => {s1.snapshot_id},"
        f" view_name => 'idfg_changes')"
    )
    assert res.collect()[0]["changelog_view"] == "idfg_changes"
    out = spark.sql(
        "SELECT k, c, m, _change_type FROM idfg_changes"
        " ORDER BY _change_type, k"
    )
    rows = out.collect()
    # identity dropped -> the same CALL degrades to delete+insert
    eng.sql("ALTER TABLE t_idfg DROP IDENTIFIER FIELDS (k)")
    eng.sql(
        f"CALL system.create_changelog_view(table => 't_idfg',"
        f" from_snapshot_id => {s1.snapshot_id},"
        f" view_name => 'idfg_changes2')"
    )
    kinds = {
        r["_change_type"]
        for r in spark.sql(
            "SELECT DISTINCT _change_type FROM idfg_changes2"
        ).collect()
    }
    assert kinds == {"delete", "insert"}, kinds
    return local_result(spark, rows, out.schema)


# ------------------------------- audio peak-normalization gain --

_AG_TARGET = 30000

_AG_ROLLUP_SQL = """
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_clips,
               CAST(MIN(max_abs) AS BIGINT) AS min_peak,
               CAST(MAX(max_abs) AS BIGINT) AS max_peak,
               CAST(SUM(CASE WHEN max_abs > {target} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_attenuate,
               CAST(SUM({target_ppm} {div} max_abs) AS BIGINT)
                 AS sum_gain_ppm,
               CAST(SUM({target_ppm} {div} max_abs) {div}
                    COUNT(*) AS BIGINT) AS mean_gain_ppm
        FROM clips
        GROUP BY source
        ORDER BY source
"""


def _ag_oracle() -> str:
    return (
        """
        WITH amps AS (
          SELECT doc_id, source,
                 list_transform(generate_series(0, 255),
                   i -> (doc_id * 7 + i * 13) % 65536 - 32768) AS a
          FROM documents
        ),
        clips AS (
          SELECT source,
                 CAST(list_max(list_transform(a, x -> abs(x)))
                      AS BIGINT) AS max_abs
          FROM amps
        )
"""
        + _AG_ROLLUP_SQL.format(
            target=_AG_TARGET,
            target_ppm=f"CAST({_AG_TARGET * 1000000} AS BIGINT)",
            div="//",
        )
    )


@register(
    "multimodal_audio_gain",
    oracle=_ag_oracle(),
    doc="Peak-normalization gain audit over REAL decoded audio: per "
    "clip the exact integer peak |amplitude| from the RIFF/PCM "
    "decode chain (operators/multimodal.py::audio_stats — the WAV "
    "fixture s_i = (doc_id*7 + i*13) %% 65536 - 32768 encoded and "
    "genuinely re-parsed), then per source the gain each clip needs "
    "to hit the target peak 30000 as an EXACT ppm integer division "
    "(gain_ppm = 30000e6 DIV peak), how many clips must attenuate "
    "(peak already above target), and the exact mean gain. The "
    "pre-training loudness-normalization audit an audio corpus runs "
    "before feature extraction. Scale shape: Arrow-batched narrow "
    "decode map, one per-source aggregate — zero float anywhere.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"].select(
            "doc_id", "source"
        )
    )

    def build(batches):
        for pdf in batches:
            payloads = [
                multimodal.encode_wav(
                    ((int(d) * 7 + i * 13) % 65536 - 32768
                     for i in range(256)),
                    16000,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.select("doc_id").mapInPandas(
        build, schema="doc_id bigint, payload binary"
    )
    stats = multimodal.audio_stats(blobs).select("doc_id", "max_abs")
    stats.join(docs, "doc_id").select(
        "source", F.col("max_abs").cast("bigint").alias("max_abs")
    ).createOrReplaceTempView("clips")
    return spark.sql(
        "WITH clips AS (SELECT source, max_abs FROM clips)\n"
        + _AG_ROLLUP_SQL.format(
            target=_AG_TARGET,
            target_ppm=f"CAST({_AG_TARGET * 1000000} AS BIGINT)",
            div="DIV",
        )
    )


# ----------------------------- per-label embedding centroid drift --

_LCS_MID_SQL = """
        cent AS (
          SELECT label, half, pos,
                 CAST(SUM(q) {div} COUNT(*) AS BIGINT) AS cq,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM xq GROUP BY label, half, pos
        ),
        sz AS (
          SELECT label,
                 CAST(MAX(CASE WHEN half = 0 THEN n END) AS BIGINT)
                   AS n_even,
                 CAST(MAX(CASE WHEN half = 1 THEN n END) AS BIGINT)
                   AS n_odd
          FROM (SELECT label, half, MAX(n) AS n
                FROM cent GROUP BY label, half) t
          GROUP BY label
        ),
        shift AS (
          SELECT e.label,
                 CAST(SUM((e.cq - o.cq) * (e.cq - o.cq)) AS BIGINT)
                   AS shift_d2
          FROM cent e JOIN cent o
            ON o.label = e.label AND o.pos = e.pos
           AND e.half = 0 AND o.half = 1
          GROUP BY e.label
        )
        SELECT s.label, z.n_even, z.n_odd, s.shift_d2
        FROM shift s JOIN sz z ON z.label = s.label
        ORDER BY s.label
"""


def _lcs_oracle() -> str:
    return (
        """
        WITH xq AS MATERIALIZED (
          SELECT vec_id AS vid, label, vec_id % 2 AS half, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
"""
        + _LCS_MID_SQL.format(div="//")
    )


@register(
    "emb_label_centroid_shift",
    oracle=_lcs_oracle(),
    doc="Per-label embedding centroid drift between the even- and "
    "odd-vec_id halves of the corpus (the two-'batch' split an "
    "embedding pipeline compares after a model or preprocessing "
    "change): integer-mean centroids per (label, half) in the exact "
    "quantized space, and the squared centroid displacement per "
    "label as one exact bigint — a large shift_d2 on one label "
    "flags that the change moved THAT class's representation. "
    "Everything is exact integers (the kmeans quantization "
    "discipline; counts are balanced enough that integer means are "
    "stable). Scale shape: one (label, half, pos) mean — linear, "
    "no pairwise anything.",
    tags=("embeddings", "curation"),
)
def emb_label_centroid_shift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    emb.select(
        F.col("vec_id").alias("vid"),
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "vid",
        "label",
        "half",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.expr("CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT)")
            + 2000000
        ).alias("q"),
    ).createOrReplaceTempView("xq")
    return spark.sql(
        "WITH " + _LCS_MID_SQL.format(div="DIV").lstrip()
    )
