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

from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    local_result,
    nonempty,
    register,
    run_partial_stream,
)

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
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    mark_setup_done()  # seed built; the evolving MERGE is the op
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


@register(
    "multimodal_resize_stats",
    oracle="""
        SELECT doc_id, 4 AS width, 3 AS height, 3 AS channels,
               47 AS byte_len,
               CAST(list_sum(list_transform(generate_series(0, 11), p ->
                 ( (doc_id*31 + (((p//4)*2)*8 + (p%4)*2)*3 + 0) % 256
                 + (doc_id*31 + (((p//4)*2)*8 + (p%4)*2 + 1)*3 + 0) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2)*3 + 0) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2 + 1)*3 + 0) % 256
                 ) // 4)) AS BIGINT) AS r_sum,
               CAST(list_sum(list_transform(generate_series(0, 11), p ->
                 ( (doc_id*31 + (((p//4)*2)*8 + (p%4)*2)*3 + 1) % 256
                 + (doc_id*31 + (((p//4)*2)*8 + (p%4)*2 + 1)*3 + 1) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2)*3 + 1) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2 + 1)*3 + 1) % 256
                 ) // 4)) AS BIGINT) AS g_sum,
               CAST(list_sum(list_transform(generate_series(0, 11), p ->
                 ( (doc_id*31 + (((p//4)*2)*8 + (p%4)*2)*3 + 2) % 256
                 + (doc_id*31 + (((p//4)*2)*8 + (p%4)*2 + 1)*3 + 2) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2)*3 + 2) % 256
                 + (doc_id*31 + (((p//4)*2+1)*8 + (p%4)*2 + 1)*3 + 2) % 256
                 ) // 4)) AS BIGINT) AS b_sum
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL RGB resize chain (round 7, operators/multimodal."
    "resize_image — the byte-truncation stub is deleted): the "
    "multimodal_pixel_stats fixture (8x6 RGB, pixel byte i = "
    "(doc_id*31+i) % 256, PPM for even doc_ids / bottom-up padded BMP "
    "for odd) is decoded, box-filtered 2x2 by the exact integer "
    "pixel-area mean, re-encoded as P6, and decoded AGAIN by "
    "pixel_stats. The oracle computes each output pixel's truncated "
    "block mean in closed form per channel, so one wrong header field, "
    "row order, BGR swap, padding byte, or off-by-one in the block "
    "arithmetic hash-mismatches. byte_len locks the re-encoded P6 "
    "layout ('P6\\n4 3\\n255\\n' + 36 = 47). Decode→transform→encode "
    "are Arrow-batched narrow maps — no shuffle, scales with executors.",
    tags=("pipeline", "multimodal"),
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

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
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    resized = multimodal.resize_image(blobs, factor=2)
    stats = multimodal.pixel_stats(resized.select("doc_id", "payload"))
    return (
        stats.join(resized.select("doc_id", "byte_len"), "doc_id")
        .select(
            "doc_id", "width", "height", "channels", "byte_len",
            "r_sum", "g_sum", "b_sum",
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_feature_real",
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END
                 AS media_kind,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 155
                    ELSE 44 + 2 * (50 + doc_id % 20) END AS INTEGER)
                 AS byte_len,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE -1 END AS INTEGER)
                 AS width,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 6 ELSE -1 END AS INTEGER)
                 AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE -1 END AS INTEGER)
                 AS channels,
               CAST(CASE WHEN doc_id % 2 = 0 THEN
                      list_sum(list_transform(generate_series(0, 143),
                               i -> (doc_id * 31 + i) % 256))
                    ELSE -1 END AS BIGINT) AS px_sum,
               CAST(CASE WHEN doc_id % 2 = 1 THEN 50 + doc_id % 20
                    ELSE -1 END AS INTEGER) AS n_samples,
               CAST(CASE WHEN doc_id % 2 = 1
                    THEN 8000 + (doc_id % 3) * 4000
                    ELSE -1 END AS INTEGER) AS sample_rate,
               CAST(CASE WHEN doc_id % 2 = 1 THEN
                      list_sum(list_transform(
                        generate_series(0, 50 + doc_id % 20 - 1),
                        j -> abs((doc_id * 37 + j * 11) % 4001 - 2000)))
                    ELSE -1 END AS BIGINT) AS amp_abs_sum
        FROM documents
        ORDER BY doc_id
    """,
    doc="REAL mixed-media feature extraction (round 7, operators/"
    "multimodal.extract_features — the byte-checksum codec stand-in is "
    "deleted): even doc_ids carry a PPM image (8x6 RGB, pixel byte "
    "(doc_id*31+i) % 256), odd ones a PCM WAV (N = 50+doc_id%20 "
    "samples s_j = (doc_id*37+j*11) % 4001 - 2000, rate 8000+"
    "(doc_id%3)*4000); ONE Arrow-batched dispatcher sniffs magic bytes "
    "and routes each payload through the real decoder, emitting exact "
    "integer dims/pixel-sum or sample-count/rate/abs-amplitude-sum "
    "(kind-inapplicable columns NULL, coalesced to -1 in the gate "
    "projection on both sides). The oracle recomputes every feature in "
    "closed form — a misrouted payload, header mis-parse, or wrong "
    "PCM widths hash-mismatches. Narrow map, no shuffle.",
    tags=("pipeline", "multimodal"),
)
def multimodal_feature_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    rgb = bytes((d * 31 + i) % 256 for i in range(144))
                    payloads.append(multimodal.encode_ppm(8, 6, rgb))
                else:
                    n = 50 + d % 20
                    samples = [(d * 37 + j * 11) % 4001 - 2000
                               for j in range(n)]
                    payloads.append(
                        multimodal.encode_wav(
                            samples, sample_rate=8000 + (d % 3) * 4000
                        )
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    feats = multimodal.extract_features(blobs)
    neg1 = F.lit(-1)
    return feats.select(
        "doc_id", "media_kind", "byte_len",
        F.coalesce("width", neg1).cast("int").alias("width"),
        F.coalesce("height", neg1).cast("int").alias("height"),
        F.coalesce("channels", neg1).cast("int").alias("channels"),
        F.coalesce("px_sum", neg1.cast("bigint")).alias("px_sum"),
        F.coalesce("n_samples", neg1).cast("int").alias("n_samples"),
        F.coalesce("sample_rate", neg1).cast("int").alias("sample_rate"),
        F.coalesce("amp_abs_sum", neg1.cast("bigint")).alias("amp_abs_sum"),
    ).orderBy("doc_id")


@register(
    "multimodal_riff_frames",
    oracle="""
        WITH f AS (
          SELECT doc_id, CAST(3 + doc_id % 5 AS INTEGER) AS nf
          FROM documents
        )
        SELECT doc_id,
               nf AS n_frames,
               CAST((nf + 1) // 2 AS INTEGER) AS n_sampled,
               CAST(list_sum(list_transform(generate_series(0, nf - 1),
                    j -> CASE WHEN j % 2 = 0
                         THEN 10 + ((doc_id + j * 7) % 23)
                         ELSE 0 END)) AS BIGINT) AS sampled_bytes,
               CAST(list_sum(list_transform(generate_series(0, nf - 1),
                    j -> CASE WHEN j % 2 = 0 THEN
                      list_sum(list_transform(
                        generate_series(0, 10 + ((doc_id + j * 7) % 23) - 1),
                        b -> (doc_id * 13 + j * 5 + b) % 256))
                    ELSE 0 END)) AS BIGINT) AS sampled_sum
        FROM f
        ORDER BY doc_id
    """,
    doc="REAL video-container frame index (round 7, operators/multimodal."
    "parse_riff_frames — replaces the fixed-size-chunk assumption for "
    "container media): per doc a RIFF 'AVI ' container (header chunk + "
    "'movi' LIST of '00dc' frame chunks, even-offset padding) is built "
    "with 3+doc_id%5 VARIABLE-SIZE frames (frame j: 10+((doc_id+j*7)%23) "
    "bytes, byte b = (doc_id*13+j*5+b) % 256), then chunk-walked to a "
    "frame index; every 2nd frame is sampled and reduced to exact "
    "int64 byte totals/sums. Variable frame sizes mean a parser that "
    "assumes fixed strides, forgets the odd-size pad byte, or "
    "mis-reads a chunk length desynchronizes and hash-mismatches. "
    "Arrow-batched narrow map, no shuffle.",
    tags=("pipeline", "multimodal"),
)
def multimodal_riff_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = [
                    bytes((d * 13 + j * 5 + b) % 256
                          for b in range(10 + ((d + j * 7) % 23)))
                    for j in range(3 + d % 5)
                ]
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.riff_frame_index(blobs, every=2).orderBy("doc_id")


@register(
    "managed_all_files_audit",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n7,
                 CAST(SUM(CASE WHEN k % 11 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n11,
                 CAST(SUM(CASE WHEN k % 11 = 0 AND k % 7 <> 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS n11l
          FROM base
        )
        SELECT label, val FROM (
          SELECT 'all_data_records' AS label, 2 * n - n7 AS val FROM m
          UNION ALL
          SELECT 'all_pos_delete_records', n7 FROM m
          UNION ALL
          SELECT 'all_eq_delete_records', n11 FROM m
          UNION ALL
          SELECT 'live_data_records', n - n7 FROM m
          UNION ALL
          SELECT 'entries_added_records', 0 FROM m
          UNION ALL
          SELECT 'live_rows', n - n7 - n11l FROM m
        ) t ORDER BY label
    """,
    doc="The `$all_files` + `$entries` metadata views (round 7; completes "
    "the family next to $snapshots/$history/$manifests/$partitions/"
    "$delete_files — reference analogue: the $snapshots suffix-view "
    "convention, parsing/IceParser.scala:91-106) audited end-to-end: "
    "insert orders -> MoR predicate DELETE (k%7 DVs land on every file) "
    "-> rewrite_position_deletes (every DV'd file rewritten, so "
    "$all_files now carries BOTH eras: original n records non-live + "
    "n-n7 live) -> equality DELETE (k%11 keyset). Locks: per-content "
    "record sums over ALL retained snapshots match the predicate "
    "cardinalities; live data records reconcile with $manifests; the "
    "eq-delete commit adds no data files so $entries has zero "
    "status=1 records; live_row_count subtracts DV'd-then-rewritten "
    "and eq-masked rows exactly once.",
    tags=("managed", "metadata", "mor"),
)
def managed_all_files_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-allfwh-"))
    tbl = eng.catalog.create_table(
        "ord_allf",
        "k bigint, st string",
        partition_cols=["st"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    tbl.insert(
        orders.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
        )
    )
    mark_setup_done()  # base built; churn + $all_files audit is the op
    tbl.delete_where("k % 7 = 0")
    tbl.rewrite_position_deletes()
    tbl.delete_by_keys(
        nonempty(
            orders.filter(F.col("o_orderkey") % 11 == 0)
            .select(F.col("o_orderkey").alias("k"))
            .distinct()
        )
    )
    tbl.refresh()

    af = {
        (r["content"], bool(r["is_live"])): r["rc"]
        for r in eng.sql(
            "SELECT content, is_live, SUM(record_count) AS rc "
            "FROM `ord_allf$all_files` GROUP BY content, is_live"
        ).collect()
    }
    all_data = af.get(("data", True), 0) + af.get(("data", False), 0)
    all_pos = af.get(("position_deletes", True), 0) + af.get(
        ("position_deletes", False), 0
    )
    all_eq = af.get(("equality_deletes", True), 0) + af.get(
        ("equality_deletes", False), 0
    )
    live_data = af.get(("data", True), 0)
    # reconciliation invariants asserted in-query so the driver re-checks
    # them every round (the round-5 plan-assert pattern)
    man = eng.sql(
        "SELECT SUM(record_count) AS rc FROM `ord_allf$manifests`"
    ).collect()[0]["rc"]
    assert man == live_data, f"$manifests {man} != $all_files live {live_data}"
    delf = eng.sql(
        "SELECT SUM(record_count) AS rc FROM `ord_allf$delete_files` "
        "WHERE content = 'equality_deletes'"
    ).collect()[0]["rc"]
    assert delf == af.get(
        ("equality_deletes", True), 0
    ), "$delete_files eq sum must equal $all_files live eq sum"
    added_rec = eng.sql(
        "SELECT COALESCE(SUM(CASE WHEN status = 1 THEN record_count "
        "ELSE 0 END), 0) AS rc FROM `ord_allf$entries`"
    ).collect()[0]["rc"]
    entries_total = eng.sql(
        "SELECT SUM(record_count) AS rc FROM `ord_allf$entries`"
    ).collect()[0]["rc"]
    assert entries_total == live_data, "$entries must cover the live set"
    rows = [
        ("all_data_records", int(all_data)),
        ("all_pos_delete_records", int(all_pos)),
        ("all_eq_delete_records", int(all_eq)),
        ("live_data_records", int(live_data)),
        ("entries_added_records", int(added_rec)),
        ("live_rows", int(tbl.live_row_count())),
    ]
    return local_result(spark, rows, "label string, val bigint").orderBy(
        "label"
    )


@register(
    "managed_snapshot_totals",
    oracle="""
        WITH base AS (SELECT o_orderkey AS k FROM orders),
        app AS (SELECT k FROM base WHERE k % 3 = 0),
        m AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM app) AS a,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM base WHERE k % 5 = 0)
              AS n5,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM app WHERE k % 5 = 0)
              AS a5,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM base WHERE k % 11 = 0)
              AS n11,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM base
             WHERE k % 11 = 0 AND k % 5 <> 0) AS n11l,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM app
             WHERE k % 11 = 0 AND k % 5 <> 0) AS a11l
          FROM (VALUES (1)) v
        )
        SELECT label, total_records, pos_deletes, eq_deletes FROM (
          SELECT 't0_insert' AS label, n AS total_records,
                 CAST(0 AS BIGINT) AS pos_deletes,
                 CAST(0 AS BIGINT) AS eq_deletes FROM m
          UNION ALL
          SELECT 't1_append', n + a, 0, 0 FROM m
          UNION ALL
          SELECT 't2_mor_delete', n + a, n5 + a5, 0 FROM m
          UNION ALL
          SELECT 't3_rewrite', n + a - n5 - a5, 0, 0 FROM m
          UNION ALL
          SELECT 't4_eq_delete', n + a - n5 - a5, 0, n11 FROM m
          UNION ALL
          SELECT 't5_live', n + a - n5 - a5 - n11l - a11l, 0, n11 FROM m
        ) t ORDER BY label
    """,
    doc="Snapshot-summary running totals (round 7): _commit_snapshot "
    "maintains total-records / total-data-files / total-position-deletes "
    "/ total-equality-deletes incrementally (O(1) per commit from the "
    "parent's totals — at 100 TB a monitor reads table growth from ONE "
    "metadata row instead of scanning manifests; Iceberg summary parity: "
    "totals count raw data-file records, live rows = totals minus "
    "masked). Audited across a 5-commit DML sequence (insert, append, "
    "MoR delete, rewrite_position_deletes, equality delete) via the "
    "`$history` view, with the final row cross-checking live_row_count "
    "against the totals algebra. Reference exposes per-snapshot "
    "added/deleted counts (utils/TableUtils.scala:48-89); running totals "
    "are the cumulative completion of that view.",
    tags=("managed", "metadata", "mor"),
)
def managed_snapshot_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-tot1wh-"))
    tbl = eng.catalog.create_table(
        "ord_tot",
        "k bigint, st string",
        partition_cols=["st"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    src = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("st")
    )
    tbl.insert(src)
    mark_setup_done()  # base built; commit-chain totals are the op
    tbl.insert(nonempty(src.filter(F.col("k") % 3 == 0)))
    tbl.delete_where("k % 5 = 0")
    tbl.rewrite_position_deletes()
    tbl.delete_by_keys(
        nonempty(
            orders.filter(F.col("o_orderkey") % 11 == 0)
            .select(F.col("o_orderkey").alias("k"))
            .distinct()
        )
    )
    tbl.refresh()
    hist = eng.sql(
        "SELECT snapshot_id, total_records, total_position_deletes, "
        "total_equality_deletes FROM `ord_tot$history` "
        "ORDER BY made_current_at"
    ).collect()
    assert len(hist) == 5, f"expected 5 commits, saw {len(hist)}"
    # history totals must agree with the metadata summaries they mirror
    for r in hist:
        s = tbl.meta.snapshot_by_id(r["snapshot_id"])
        assert int(s.summary["total-records"]) == r["total_records"]
    labels = [
        "t0_insert", "t1_append", "t2_mor_delete", "t3_rewrite",
        "t4_eq_delete",
    ]
    rows = [
        (
            lab,
            int(r["total_records"]),
            int(r["total_position_deletes"]),
            int(r["total_equality_deletes"]),
        )
        for lab, r in zip(labels, hist)
    ]
    rows.append(("t5_live", int(tbl.live_row_count()), 0,
                 int(hist[-1]["total_equality_deletes"])))
    return local_result(
        spark, rows,
        "label string, total_records bigint, pos_deletes bigint, "
        "eq_deletes bigint",
    ).orderBy("label")


def _stream_daily_counts(spark, sf_dir: str):
    """Shared day-partial sink scaffold for streaming twins of daily-count
    analytics (the events_stream_decayed_counts template): the raw events
    stream is replayed as 3 chronological micro-batches (time-split parquet
    appends + maxFilesPerTrigger=1, the round-5 stream-gate rule), each
    batch folds into per-(type, day) PARTIAL counts appended to a parquet
    sink — a SUM-mergeable sketch, so micro-batch chopping and arrival
    order cannot change the final state. Returns the merged daily frame
    (event_type, day, c). State is types x days rows, independent of
    event volume; at 100 TB the same sink is a managed table the
    finalizer reads."""
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-dcsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-dcout-")
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

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-dcck-")
    return (
        spark.read.parquet(out)
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )


@register(
    "events_stream_cusum",
    oracle="""
        WITH RECURSIVE daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        idx AS (
          SELECT event_type, day, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
          FROM daily
        ),
        g AS (
          SELECT event_type, CAST(MAX(i) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS tot
          FROM idx GROUP BY event_type
        ),
        cu(event_type, i, s, m, md) AS (
            SELECT x.event_type, 1,
                   greatest(CAST(0 AS BIGINT), x.c * g.n - g.tot),
                   greatest(CAST(0 AS BIGINT), x.c * g.n - g.tot),
                   CASE WHEN x.c * g.n - g.tot > 0 THEN x.day
                        ELSE CAST(-1 AS BIGINT) END
            FROM idx x JOIN g ON g.event_type = x.event_type
            WHERE x.i = 1
          UNION ALL
            SELECT cu.event_type, cu.i + 1,
                   greatest(CAST(0 AS BIGINT),
                            cu.s + (x.c * g.n - g.tot)),
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot)) > cu.m
                        THEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot))
                        ELSE cu.m END,
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot)) > cu.m
                        THEN x.day ELSE cu.md END
            FROM cu
            JOIN idx x ON x.event_type = cu.event_type AND x.i = cu.i + 1
            JOIN g ON g.event_type = cu.event_type
        )
        SELECT cu.event_type, g.n AS n_days, cu.m AS max_cusum,
               cu.md AS peak_day, cu.s AS final_cusum
        FROM cu JOIN g ON g.event_type = cu.event_type AND cu.i = g.n
        ORDER BY cu.event_type
    """,
    doc="Streaming twin of events_cusum_changepoint (round 7): three "
    "chronological micro-batches fold into per-(type, day) partial "
    "counts (SUM-mergeable day-partial sink, the "
    "events_stream_decayed_counts pattern), and the read-side finalizer "
    "replays the IDENTICAL all-integer CUSUM recurrence (deviations "
    "scaled by n, max-reset-at-zero bigint fold) over the merged "
    "series. The detector needs the full-series mean, so it is "
    "finalize-time by construction — the streaming state stays the "
    "tiny mergeable count sketch. Bit-matches the batch recursive-CTE "
    "oracle.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _stream_daily_counts(spark, sf_dir)
    g = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("tot"),
    )
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('s', CAST(0 AS BIGINT), 'm', CAST(0 AS BIGINT),
                       'md', CAST(-1 AS BIGINT)),
          (acc, x) -> named_struct(
            's', greatest(CAST(0 AS BIGINT), acc.s + (x.c * n - tot)),
            'm', CASE WHEN greatest(CAST(0 AS BIGINT),
                                    acc.s + (x.c * n - tot)) > acc.m
                      THEN greatest(CAST(0 AS BIGINT),
                                    acc.s + (x.c * n - tot))
                      ELSE acc.m END,
            'md', CASE WHEN greatest(CAST(0 AS BIGINT),
                                     acc.s + (x.c * n - tot)) > acc.m
                       THEN x.day ELSE acc.md END))
        """
    )
    return (
        g.select("event_type", F.col("n").alias("n_days"), fold.alias("f"))
        .select(
            "event_type", "n_days",
            F.col("f.m").alias("max_cusum"),
            F.col("f.md").alias("peak_day"),
            F.col("f.s").alias("final_cusum"),
        )
        .orderBy("event_type")
    )


@register(
    "events_stream_bursts",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        base AS (
          SELECT event_type, day, c,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail,
                 COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_prior
          FROM daily
        ),
        bursts AS (
          SELECT event_type, day, c, trail,
                 c * 7000000 // trail AS ratio_ppm
          FROM base
          WHERE n_prior = 7 AND c * 20 > 3 * trail
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_burst_days,
               CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm,
               CAST(MIN(day) AS BIGINT) AS first_burst_day
        FROM bursts
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Streaming twin of events_burst_windows (round 7): the same "
    "day-partial sink feeds the calendar-correct RANGE-frame burst "
    "detector (trailing-week baseline, integer cross-multiplied "
    "threshold c*20 > 3*trail). A day straddling micro-batches arrives "
    "as multiple partials and the SUM-merge reassembles it exactly — "
    "the property that makes the detector replayable from any batch "
    "chopping. Bit-matches the batch oracle.",
    tags=("events", "streaming", "window"),
)
def events_stream_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _stream_daily_counts(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-7, -1)
    )
    base = daily.select(
        "event_type", "day", "c",
        F.sum("c").over(w).alias("trail"),
        F.count(F.lit(1)).over(w).alias("n_prior"),
    )
    bursts = base.filter(
        (F.col("n_prior") == 7) & (F.col("c") * 20 > 3 * F.col("trail"))
    ).select(
        "event_type", "day",
        F.expr("c * 7000000 DIV trail").alias("ratio_ppm"),
    )
    return (
        bursts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_burst_days"),
            F.max("ratio_ppm").cast("bigint").alias("max_ratio_ppm"),
            F.min("day").cast("bigint").alias("first_burst_day"),
        )
        .orderBy("event_type")
    )


def _simhash64_vote_sql() -> str:
    terms = []
    for j in range(64):
        seed = j // 32
        pos = (j % 32) + 1
        terms.append(
            f"sum(CASE WHEN ascii(substr(md5('{seed}:' || tok), {pos}, 1))"
            f" % 2 = 1 THEN 1 ELSE -1 END) AS v_{j}"
        )
    return ", ".join(terms)


def _simhash64_sum_sql() -> str:
    terms = []
    for j in range(64):
        w = -(1 << 63) if j == 63 else (1 << j)
        terms.append(f"CASE WHEN v_{j} > 0 THEN CAST({w} AS BIGINT) ELSE 0 END")
    # sign-bit term last so every partial sum stays inside BIGINT
    return " + ".join(terms)


@register(
    "dedup_simhash64_pairs",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ),
        votes AS (
          SELECT doc_id, {_simhash64_vote_sql()} FROM toks GROUP BY doc_id
        ),
        sh AS (
          SELECT doc_id, CAST({_simhash64_sum_sql()} AS BIGINT) AS h
          FROM votes
        ),
        bands AS (
          SELECT doc_id, h, band, (h >> (16 * band)) & 65535 AS bv
          FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) g
        ),
        cand AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.h AS ha, y.h AS hb
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
        )
        SELECT CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= 3
        GROUP BY 1 ORDER BY 1
    """,
    doc="PRODUCTION-WIDTH 64-bit SimHash near-dup pairs (round 7; closes "
    "the r6 verdict's 'demonstration width' gap): per-bit majority vote "
    "assembled into one signed BIGINT (sign bit = Long.MIN_VALUE weight "
    "in both engines), 4 bands x 16 bits — pigeonhole guarantees a "
    "COMPLETE candidate set at Hamming <= 3 — exact bit_count(a^b) "
    "verify, histogram by distance. The gate runs the md5 double-digest "
    "family (bit-identical in DuckDB via ascii/substr parity); the "
    "xxhash64 single-hash production family is locked by invariant "
    "tests (identical clone-pair recall, full 64-bit spread). Scale "
    "shape: band equi-joins on bigint keys, never a cross product; "
    "arithmetic-vs-logical shift on the sign band is masked to the same "
    "16 bits in both engines.",
    tags=("dedup", "sketch"),
)
def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    sh = dedup.simhash64(docs, hash_method="md5")
    return (
        dedup.simhash64_band_pairs(sh, max_hamming=3)
        .select(F.col("hamming").cast("int").alias("hamming"))
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

# Per-term Jensen-Shannon contribution, TEXTUALLY IDENTICAL in both
# engines so every IEEE intermediate matches bit-for-bit (ln and double
# division are bit-identical Spark vs DuckDB; only summation ORDER needs
# pinning, which the sorted list fold provides).
_JS_CONTRIB = (
    "0.5 * ((CAST({c1} AS DOUBLE) / {t1})"
    " * ln((CAST({c1} AS DOUBLE) / {t1})"
    " / ((CAST({c1} AS DOUBLE) / {t1} + CAST({c2} AS DOUBLE) / {t2}) / 2.0))"
    " + (CAST({c2} AS DOUBLE) / {t2})"
    " * ln((CAST({c2} AS DOUBLE) / {t2})"
    " / ((CAST({c1} AS DOUBLE) / {t1} + CAST({c2} AS DOUBLE) / {t2}) / 2.0)))"
)


@register(
    "text_source_js_divergence",
    oracle=f"""
        WITH tok AS (
          SELECT source, unnest({_TOKS}) AS t FROM documents
        ),
        cnt AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        tot AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS tt FROM cnt GROUP BY 1
        ),
        pairs AS (
          SELECT a.source AS s1, b.source AS s2, a.tt AS t1, b.tt AS t2
          FROM tot a JOIN tot b ON a.source < b.source
        ),
        terms AS (
          SELECT p.s1, p.s2, p.t1, p.t2, c1.t AS t, c1.c AS c1, c2.c AS c2,
                 {_JS_CONTRIB.format(c1="c1.c", c2="c2.c",
                                     t1="p.t1", t2="p.t2")} AS contrib
          FROM pairs p
          JOIN cnt c1 ON c1.source = p.s1
          JOIN cnt c2 ON c2.source = p.s2 AND c2.t = c1.t
        ),
        shared AS (
          SELECT s1, s2,
                 list_sum(list(contrib ORDER BY t)) AS fold,
                 CAST(SUM(c1) AS BIGINT) AS m1,
                 CAST(SUM(c2) AS BIGINT) AS m2
          FROM terms GROUP BY 1, 2
        )
        SELECT p.s1, p.s2,
               CAST(round((COALESCE(sh.fold, 0.0)
                 + 0.5 * ln(2.0)
                   * (CAST(p.t1 - COALESCE(sh.m1, 0) AS DOUBLE) / p.t1
                      + CAST(p.t2 - COALESCE(sh.m2, 0) AS DOUBLE) / p.t2))
                 * 1000000.0) AS BIGINT) AS js_ppm
        FROM pairs p LEFT JOIN shared sh ON sh.s1 = p.s1 AND sh.s2 = p.s2
        ORDER BY js_ppm DESC, p.s1, p.s2
        LIMIT 10
    """,
    doc="Pairwise Jensen-Shannon divergence between source unigram "
    "distributions — the TV query's float sibling (round 7): the "
    "smooth, symmetric mixture-shift metric curation dashboards trend. "
    "Determinism: the per-term contribution p*ln(p/m)+q*ln(q/m) is a "
    "textually identical IEEE expression in both engines, and the "
    "per-pair sum runs as a TERM-SORTED sequential fold (Spark "
    "aggregate() over a sorted struct array == DuckDB list_sum over "
    "list(... ORDER BY t)) — no float-summation-order ambiguity. Terms "
    "present in one source only reduce to the closed form "
    "0.5*ln2*(one-sided mass), recovered from integer shared-mass sums "
    "(the TV complement-identity trick), so the vocabulary is never "
    "crossed with the pair space and zero-overlap pairs emit the exact "
    "ln2 maximum. Scale shape: one (source, term) count table, one "
    "term-keyed self-join, broadcast pair totals.",
    tags=("text", "curation", "agg"),
)
def text_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    cnt = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("tt"))
    a = tot.select(F.col("source").alias("s1"), F.col("tt").alias("t1"))
    b = tot.select(F.col("source").alias("s2"), F.col("tt").alias("t2"))
    pairs = a.join(b, F.col("s1") < F.col("s2"))
    c1 = cnt.select(F.col("source").alias("s1"), "t", F.col("c").alias("c1"))
    c2 = cnt.select(F.col("source").alias("s2"), "t", F.col("c").alias("c2"))
    terms = (
        c1.join(c2, "t")
        .join(F.broadcast(pairs), ["s1", "s2"])
        .withColumn(
            "contrib",
            F.expr(_JS_CONTRIB.format(c1="c1", c2="c2", t1="t1", t2="t2")),
        )
    )
    shared = terms.groupBy("s1", "s2").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(t, contrib))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
        ).alias("fold"),
        F.sum("c1").cast("bigint").alias("m1"),
        F.sum("c2").cast("bigint").alias("m2"),
    )
    return (
        pairs.join(shared, ["s1", "s2"], "left")
        .select(
            "s1", "s2",
            F.round(
                (
                    F.coalesce(F.col("fold"), F.lit(0.0))
                    + F.lit(0.5) * F.expr("ln(2.0)")
                    * (
                        (F.col("t1") - F.coalesce(F.col("m1"), F.lit(0)))
                        .cast("double") / F.col("t1")
                        + (F.col("t2") - F.coalesce(F.col("m2"), F.lit(0)))
                        .cast("double") / F.col("t2")
                    )
                )
                * 1000000.0
            ).cast("bigint").alias("js_ppm"),
        )
        .orderBy(F.desc("js_ppm"), "s1", "s2")
        .limit(10)
    )


@register(
    "curation_reservoir_stratified",
    oracle="""
        WITH ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          FROM documents
        )
        SELECT doc_id, lang, CAST(rn AS INTEGER) AS sample_rank
        FROM ranked WHERE rn <= 25
        ORDER BY doc_id
    """,
    doc="Fixed-k (25) per-stratum reservoir sample (round 7): uniform "
    "k-without-replacement per lang, deterministic via (md5(id), id) "
    "rank — the hash order is a payload-independent random permutation, "
    "so bottom-k by hash IS a reservoir sample that reruns and engines "
    "agree on. Spark side runs the TOURNAMENT two-phase bottom-k "
    "(rank within (stratum, salt-16) first, survivors re-ranked per "
    "stratum) so no single task ever sorts a whole stratum — the skew "
    "trap of the naive window at 10^9-row strata; the oracle's one-pass "
    "window proves the two-phase is exact.",
    tags=("curation",),
)
def curation_reservoir_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import curation
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    return (
        curation.reservoir_sample_stratified(docs, 25, strata_col="lang")
        .select("doc_id", "lang", "sample_rank")
        .orderBy("doc_id")
    )


@register(
    "multimodal_audio_decimate",
    oracle="""
        WITH amps AS (
          SELECT doc_id,
                 list_transform(generate_series(0, 252, 4),
                   i -> (doc_id * 7 + i * 13) % 65536 - 32768) AS a
          FROM documents
        )
        SELECT doc_id,
               64 AS n_samples,
               4000 AS sample_rate,
               CAST(list_sum(a) AS BIGINT) AS amp_sum,
               CAST(list_sum(list_transform(a, x -> abs(x))) AS BIGINT)
                 AS abs_sum,
               CAST(list_max(list_transform(a, x -> abs(x))) AS INTEGER)
                 AS max_abs
        FROM amps
        ORDER BY doc_id
    """,
    doc="REAL audio resample round trip (round 7; the audio counterpart "
    "of multimodal_resize_stats): per doc a 256-sample int16 waveform "
    "(s_i = (doc_id*7 + i*13) % 65536 - 32768) is encoded as genuine "
    "RIFF/PCM WAV, DECIMATED by 4 via operators/multimodal."
    "decimate_audio (decode -> every-4th-sample -> re-encode at "
    "rate//4 = 4000 Hz — exact integer decimation, the deterministic "
    "core a production anti-aliased resampler swaps into), then decoded "
    "AGAIN by audio_stats. The oracle recomputes from the sample "
    "formula at stride 4, so a wrong stride, rate header, or re-encode "
    "byte order hash-mismatches. All stages Arrow-batched narrow maps.",
    tags=("pipeline", "multimodal"),
)
def multimodal_audio_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
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
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    small = multimodal.decimate_audio(blobs, factor=4)
    return multimodal.audio_stats(small.select("doc_id", "payload")).orderBy(
        "doc_id"
    )


# Per-cell chi-square contribution — textually identical in both engines.
# The residual d = O*N - r*c is EXACT bigint (|d| <= N^2, in range at any
# realistic cell table); the square and the single division go to double,
# and the cell sum is order-pinned by the sorted fold.
_CHI2_CONTRIB = (
    "CAST({d} AS DOUBLE) * CAST({d} AS DOUBLE)"
    " / CAST({n} * {r} * {c} AS DOUBLE)"
)


@register(
    "events_chi2_independence",
    oracle=f"""
        WITH base AS (
          SELECT event_type AS t,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS b
          FROM events
        ),
        cells AS (
          SELECT t, b, CAST(COUNT(*) AS BIGINT) AS o
          FROM base GROUP BY 1, 2
        ),
        rows_ AS (SELECT t, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        cols_ AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
        contribs AS (
          SELECT cells.t, cells.b,
                 {_CHI2_CONTRIB.format(
                     d="(cells.o * tot.n - rows_.r * cols_.c)",
                     n="tot.n", r="rows_.r", c="cols_.c")} AS contrib
          FROM cells
          JOIN rows_ USING (t) JOIN cols_ USING (b) CROSS JOIN tot
        )
        SELECT
          CAST((SELECT COUNT(*) FROM rows_) AS BIGINT) AS n_rows,
          CAST((SELECT COUNT(*) FROM cols_) AS BIGINT) AS n_cols,
          CAST(((SELECT COUNT(*) FROM rows_) - 1)
               * ((SELECT COUNT(*) FROM cols_) - 1) AS BIGINT) AS dof,
          (SELECT n FROM tot) AS n,
          CAST(round(list_sum(list(contrib ORDER BY t, b)) * 1000000.0)
               AS BIGINT) AS chi2_micro
        FROM contribs
    """,
    doc="Chi-square test of independence between event_type and a "
    "props-derived category (k % 4) — the contingency-table audit a "
    "feature pipeline runs to detect leakage/correlation between a "
    "categorical feature and the label. Determinism (round 7, the JS "
    "recipe): the per-cell residual O*N - r*c is EXACT bigint, the "
    "squared-over-expected contribution is a textually identical IEEE "
    "expression in both engines, and the cell sum runs as a "
    "(type, bucket)-SORTED sequential fold (Spark aggregate() over a "
    "sorted struct array == DuckDB list_sum over list(... ORDER BY)). "
    "Scale shape: the contingency table is |types| x |buckets| rows "
    "regardless of event volume — one groupBy plus broadcast margins.",
    tags=("events", "stats", "agg"),
)
def events_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cells = (
        ev.select(
            F.col("event_type").alias("t"),
            (F.get_json_object("props", "$.k").cast("bigint") % 4).alias("b"),
        )
        .groupBy("t", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows_ = cells.groupBy("t").agg(F.sum("o").cast("bigint").alias("r"))
    cols_ = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    contribs = (
        cells.join(F.broadcast(rows_), "t")
        .join(F.broadcast(cols_), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "contrib",
            F.expr(
                _CHI2_CONTRIB.format(
                    d="(o * n - r * c)", n="n", r="r", c="c"
                )
            ),
        )
    )
    return contribs.agg(
        F.countDistinct("t").cast("bigint").alias("n_rows"),
        F.countDistinct("b").cast("bigint").alias("n_cols"),
        (
            (F.countDistinct("t") - 1) * (F.countDistinct("b") - 1)
        ).cast("bigint").alias("dof"),
        F.max("n").cast("bigint").alias("n"),
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(t, b, contrib))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
            )
            * 1000000.0
        ).cast("bigint").alias("chi2_micro"),
    )


@register(
    "text_keyword_topk",
    oracle=f"""
        WITH tf AS (
          SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, unnest({_TOKS}) AS t FROM documents) x
          GROUP BY 1, 2
        ),
        df_ AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ),
        n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.t,
                 CAST(tf.tf AS DOUBLE)
                   * ln(CAST((SELECT n FROM n_) AS DOUBLE) / df_.df)
                   AS score
          FROM tf JOIN df_ USING (t)
        ),
        ranked AS (
          SELECT doc_id, t, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, t) AS rnk
          FROM scored
        )
        SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, t AS term,
               CAST(round(score * 1000000.0) AS BIGINT) AS score_micro
        FROM ranked WHERE rnk <= 3 AND doc_id < 100
        ORDER BY doc_id, rnk
    """,
    doc="Per-document keyword extraction: top-3 terms by tf-idf — the "
    "summarization/tagging primitive of a curation pipeline. "
    "Determinism: tf and df are integers, idf = ln(N/df) is one "
    "bit-identical IEEE op per term, score = tf * idf one multiply — "
    "no float SUMS anywhere, so ranking (score DESC, term) agrees "
    "across engines exactly; N rides in as a broadcast 1-row aggregate "
    "(no driver count). Scale shape: the tf table is the text stack's "
    "standard shuffle; ranking is a per-doc window over that doc's "
    "distinct terms only.",
    tags=("text", "curation"),
)
def text_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_ = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    scored = (
        tf.join(df_, "t")
        .crossJoin(F.broadcast(n_))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * F.expr("ln(CAST(n AS DOUBLE) / df)"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "t")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
        .select(
            "doc_id", "rnk", F.col("t").alias("term"),
            F.round(F.col("score") * 1000000.0).cast("bigint")
            .alias("score_micro"),
        )
        .orderBy("doc_id", "rnk")
    )


def _pca_oracle(dims: int = 8, iters: int = 3) -> str:
    """Chained-CTE replica of the Spark power iteration: same quantized
    integer covariance numerators, same all-ones start vector, same
    j-ordered matrix-vector folds and i-ordered norm folds, same
    per-iteration normalization — every IEEE op in the same order."""
    parts = [
        f"""q AS (
          SELECT list_transform(embedding[1:{dims}],
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                 AS q
          FROM embeddings
        ),
        pr AS (
          SELECT i.range AS i, j.range AS j
          FROM range(0, {dims}) i CROSS JOIN range(0, {dims}) j
          WHERE i.range <= j.range
        ),
        cov0 AS (
          SELECT pr.i, pr.j,
                 CAST(COUNT(*) * SUM(q[pr.i + 1] * q[pr.j + 1])
                      - SUM(q[pr.i + 1]) * SUM(q[pr.j + 1]) AS BIGINT)
                   AS cn
          FROM q CROSS JOIN pr GROUP BY 1, 2
        ),
        cov AS (
          SELECT i, j, CAST(cn AS DOUBLE) AS c FROM cov0
          UNION ALL
          SELECT j, i, CAST(cn AS DOUBLE) FROM cov0 WHERE i < j
        ),
        v0 AS (SELECT range AS j, 1.0 AS v FROM range(0, {dims}))"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"""
        u{t} AS (
          SELECT cov.i, list_sum(list(cov.c * v{t - 1}.v ORDER BY cov.j))
                   AS u
          FROM cov JOIN v{t - 1} ON v{t - 1}.j = cov.j
          GROUP BY cov.i
        ),
        n{t} AS (SELECT sqrt(list_sum(list(u * u ORDER BY i))) AS nrm
                 FROM u{t}),
        v{t} AS (SELECT i AS j, u / (SELECT nrm FROM n{t}) AS v FROM u{t})""")
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT CAST(j AS INTEGER) AS dim,
               CAST(round(v * 1000000.0) AS BIGINT) AS loading_micro,
               round((SELECT nrm FROM n{iters}) / 1000000000000000.0,
                     6) AS eigval_scaled
        FROM v{iters} ORDER BY dim"""
    )


@register(
    "emb_pca_power_iteration",
    oracle=_pca_oracle(),
    doc="Top principal component of the embedding covariance by POWER "
    "ITERATION (round 7) — the PCA/whitening primitive a training "
    "pipeline runs on activation/embedding stats. Data-scale work is "
    "ONE aggregate pass: the exact integer covariance numerators "
    "n*S_ij - S_i*S_j over 1e6-quantized values (the emb_cov_pairs "
    "sufficient-statistic trick — bigint, no mean pass); the iteration "
    "then runs on the tiny dims x dims matrix entirely in the DAG "
    "(cached cov frame, 3 matrix-vector rounds, per-round "
    "normalization) — no driver-side linear algebra. Determinism: "
    "u_i folds C[i][j]*v_j in j order, the norm folds u_i^2 in i "
    "order (Spark sorted-struct aggregate == DuckDB list_sum ORDER "
    "BY), division and sqrt are single bit-identical IEEE ops, and "
    "the all-ones start vector pins the eigenvector sign. At 100 TB "
    "the same plan holds: the quantized one-pass aggregate is the only "
    "thing that sees data.",
    tags=("embeddings", "ml", "agg"),
)
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import track_cache

    dims, iters = 8, 3
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.select(
        *[
            F.expr(
                f"CAST(round(CAST(embedding[{i}] AS DOUBLE) * 1000000)"
                f" AS BIGINT)"
            ).alias(f"q{i}")
            for i in range(dims)
        ]
    )
    pairs = [(i, j) for i in range(dims) for j in range(dims) if i <= j]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(F.col(f"q{i}")).alias(f"s{i}") for i in range(dims)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"p{i}_{j}")
        for i, j in pairs
    ]
    row = q.agg(*aggs)
    entries = [(i, j) for i, j in pairs] + [(j, i) for i, j in pairs if i < j]
    stack = (
        f"stack({len(entries)}, "
        + ", ".join(
            f"{i}, {j}, p{min(i, j)}_{max(i, j)}, s{i}, s{j}"
            for i, j in entries
        )
        + ") AS (i, j, s_ij, s_i, s_j)"
    )
    # the dims^2-row covariance is referenced once per iteration — cache
    # so the one-pass data aggregate behind it runs exactly once
    cov = track_cache(
        row.selectExpr("n", stack).select(
            "i", "j",
            (F.col("n") * F.col("s_ij") - F.col("s_i") * F.col("s_j"))
            .cast("double")
            .alias("c"),
        )
    )
    # all-ones start vector as a JVM VALUES LocalRelation — the r10 lesson:
    # a Python-RDD-backed createDataFrame local frame joined once per
    # iteration nests Python runners per reference (this gate measured 89
    # Spark jobs / 2.8 s; the VALUES form plans as LocalTableScan)
    v = spark.sql(
        "SELECT j, v FROM VALUES "
        + ", ".join(f"({j}, CAST(1.0 AS DOUBLE))" for j in range(dims))
        + " AS t(j, v)"
    ).select(F.col("j").cast("int").alias("j"), "v")
    nrm = None
    for _t in range(iters):
        u = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "named_struct('j', j, 'cv', c * v))),"
                    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.cv)"
                ).alias("u")
            )
        )
        nrm = u.agg(
            F.sqrt(
                F.expr(
                    "aggregate(array_sort(collect_list("
                    "named_struct('i', i, 'u2', u * u))),"
                    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.u2)"
                )
            ).alias("nrm")
        )
        v = u.crossJoin(F.broadcast(nrm)).select(
            F.col("i").alias("j"), (F.col("u") / F.col("nrm")).alias("v")
        )
    return (
        v.crossJoin(
            F.broadcast(
                nrm.select(
                    # quantized-unit norms are ~1e15; scale before rounding
                    # (round() at that magnitude is engine-divergent noise)
                    F.round(F.col("nrm") / F.lit(1e15), 6).alias(
                        "eigval_scaled"
                    )
                )
            )
        )
        .select(
            F.col("j").cast("int").alias("dim"),
            F.round(F.col("v") * 1000000.0).cast("bigint")
            .alias("loading_micro"),
            "eigval_scaled",
        )
        .orderBy("dim")
    )
