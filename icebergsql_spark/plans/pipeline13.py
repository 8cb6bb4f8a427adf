"""Round-10 gate wave: Hive-layout add_files import (partition values
parsed from ``col=value`` path segments, reference
PartitioningUtils.scala:57-71), plus later round-10 additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------- Hive-layout add_files --


@register(
    "managed_add_files_hive_import",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="Hive-layout add_files import (reference PartitioningUtils."
    "scala:57-71 path->partition parsing): orders written with Spark's "
    "partitionBy — so the partition column exists ONLY in the "
    "o_year=YYYY/ directory names, NOT in the data files (the classic "
    "external-Hive migration layout) — then registered zero-copy into a "
    "managed table. Partition values are parsed from the path segments, "
    "the DataFiles are flagged path_partition, and the read path "
    "materializes the column as a typed literal per partition group. "
    "In-DAG asserts: every live file is path_partition and zero-copy, "
    "metadata COUNT(*) still answers from manifests, a partition "
    "predicate prunes to that year's files only. Result: the per-year "
    "rollup THROUGH the managed read path (partition column exists only "
    "in metadata) vs the raw-parquet oracle.",
    tags=("managed", "import", "pruning", "hive"),
)
def managed_add_files_hive_import(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    src = tempfile.mkdtemp(prefix="icebergsql-hivesrc-")
    # partitionBy drops o_year from the data files — path-only layout;
    # repartition(2) gives each year dir several files so pruning counts
    # are meaningful
    orders.repartition(2).write.mode("overwrite").partitionBy(
        "o_year"
    ).parquet(src)
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-hivewh-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    tbl = eng.catalog.create_table("ord_hive", ddl, ["o_year"])
    mark_setup_done()  # staging done; the metadata-only import is the op
    res = eng.sql(
        f"CALL system.add_files(table => 'ord_hive', source_dir => '{src}')"
    ).collect()[0]
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    live = snap.live_files()
    assert res["added_files_count"] == len(live), res
    assert all(f.path_partition for f in live), "path-only import flag"
    assert all(f.path.startswith(src) for f in live), "import must not copy"
    years = sorted(
        r["o_year"] for r in orders.select("o_year").distinct().collect()
    )
    assert {f.partition["o_year"] for f in live} == {str(y) for y in years}
    # manifests carry exact partition point-ranges: metadata COUNT(*)
    # and partition pruning both work without the column in the files
    assert tbl.scan().count_from_stats() == orders.count()
    pruned = tbl.scan(where=f"o_year = {years[0]}")
    per_year = sum(
        1 for f in live if f.partition["o_year"] == str(years[0])
    )
    assert pruned.files_scanned == per_year, (
        pruned.files_scanned,
        per_year,
    )
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_hive GROUP BY o_year ORDER BY o_year"
    )


# ---------------------------------------------- CDC op-code MERGE --

_CDC_AGG = """
        agg AS (
          SELECT o_custkey AS k, COUNT(*) AS cnt,
                 CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS tot
          FROM orders GROUP BY 1
        ),
        src AS (
          SELECT k, tot AS bal, 'SRC' AS seg,
                 CASE CAST(cnt % 7 AS INTEGER) WHEN 0 THEN 'D'
                      WHEN 1 THEN 'U' WHEN 2 THEN 'U'
                      ELSE 'X' END AS op
          FROM agg
          UNION ALL
          SELECT k + 10000000, tot % 100000, 'NEW', 'I'
          FROM agg WHERE k % 5 = 0
        )"""


@register(
    "managed_merge_cdc_ops",
    oracle=f"""
        WITH {_CDC_AGG},
        tgt AS (
          SELECT c_custkey AS k,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
                 c_mktsegment AS seg
          FROM customer
        ),
        merged AS (
          SELECT t.k,
                 CASE WHEN s.op = 'U' THEN s.bal ELSE t.bal END AS bal,
                 t.seg
          FROM tgt t LEFT JOIN src s ON s.k = t.k
          WHERE s.k IS NULL OR s.op <> 'D'
          UNION ALL
          SELECT s.k, s.bal, s.seg
          FROM src s LEFT JOIN tgt t ON t.k = s.k
          WHERE t.k IS NULL AND s.op = 'I'
        )
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(bal) AS BIGINT) AS total_cents
        FROM merged GROUP BY 1 ORDER BY 1
    """,
    doc="Change-feed apply: MERGE whose DELETE / UPDATE / INSERT clause "
    "conditions read the CDC op-code column that exists ONLY in the "
    "source (WHEN MATCHED AND s.op='D' THEN DELETE ...), parsed through "
    "the SQL front door and executed under write.merge.mode="
    "merge-on-read — firing rows are DV-masked, original files stay "
    "live (in-DAG asserts), unfired 'X' rows keep their images. The op "
    "feed derives deterministically from orders (op by order-count mod "
    "7, balances as exact cents); the oracle replays the clause chain "
    "relationally. Completes the round-6 conditional-clause grammar "
    "(VERDICT_r09 item 7).",
    tags=("managed", "merge", "cdc", "mor"),
)
def managed_merge_cdc_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    load_tables(spark, sf_dir, ("orders", "customer"))
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-cdcops-"))
    tbl = eng.catalog.create_table(
        "cust_cdc",
        "k bigint, bal bigint, seg string",
        ["seg"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    tbl.insert(
        spark.sql(
            "SELECT c_custkey AS k, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal, "
            "c_mktsegment AS seg FROM customer"
        )
    )
    spark.sql(
        f"WITH {_CDC_AGG} SELECT * FROM src"
    ).createOrReplaceTempView("cdc_feed_v")
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    mark_setup_done()  # target seeded + feed staged; the MERGE is the op
    eng.sql("""
        MERGE INTO cust_cdc t USING cdc_feed_v s ON t.k = s.k
        WHEN MATCHED AND s.op = 'D' THEN DELETE
        WHEN MATCHED AND s.op = 'U' THEN UPDATE SET bal = s.bal
        WHEN NOT MATCHED AND s.op = 'I'
          THEN INSERT (k, bal, seg) VALUES (s.k, s.bal, s.seg)
    """)
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    live = {f.path for f in snap.live_files()}
    assert before <= live, "MoR MERGE must keep original files live"
    assert sum(e.count for e in snap.dv_entries()) > 0, (
        "CDC feed always fires some D/U clause at every SF"
    )
    return eng.sql(
        "SELECT seg, COUNT(*) AS n, CAST(SUM(bal) AS BIGINT) AS "
        "total_cents FROM cust_cdc GROUP BY seg ORDER BY seg"
    )


# ---------------------------------------------- $lineage export view --


@register(
    "managed_lineage_export",
    oracle="""
        WITH c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey < 10),
             c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey >= 10 AND n_nationkey < 20),
             c4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey >= 20 AND n_nationkey < 23)
        SELECT 0 AS depth, 'append' AS operation,
               CAST(c1.n + c2.n + c4.n AS BIGINT) AS total_records,
               TRUE AS is_current_ancestor
        FROM c1, c2, c4
        UNION ALL
        SELECT 1, 'append', CAST(c1.n + c2.n AS BIGINT), TRUE FROM c1, c2
        UNION ALL
        SELECT 2, 'append', c1.n, TRUE FROM c1
        ORDER BY depth
    """,
    doc="`$snapshots`-lineage export view (`<table>$lineage`, "
    "table.py:lineage_df): the ancestor CLOSURE of every snapshot as a "
    "joinable relation — (snapshot_id, ancestor_id, depth, timestamp, "
    "is_current). Scenario: three appends, a rollback to the second, a "
    "fourth append — so one snapshot is lineage-orphaned. In-DAG "
    "asserts: the is_current rows replay CALL ancestors_of exactly "
    "(ids AND order), the orphaned snapshot keeps its own 3-deep chain "
    "with is_current=false, closure size is sum of chain lengths. "
    "Result: `$lineage` JOIN `$history` on ancestor_id for the current "
    "head — depth, operation, and the running total-records of every "
    "feeding commit — vs a pure-count oracle over nation.",
    tags=("managed", "metadata", "lineage"),
)
def managed_lineage_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-linwh-"))
    tbl = eng.catalog.create_table(
        "nat_lin",
        "n_nationkey bigint, n_name string, n_regionkey bigint",
        ["n_regionkey"],
    )
    sel = nation.select("n_nationkey", "n_name", "n_regionkey")
    s1 = tbl.insert(nonempty(sel.filter(F.col("n_nationkey") < 10)))
    s2 = tbl.insert(
        nonempty(sel.filter(
            (F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 20)
        )))
    s3 = tbl.insert(nonempty(sel.filter(F.col("n_nationkey") >= 20)))
    tbl.rollback_to(s2.snapshot_id)
    s4 = tbl.insert(
        nonempty(sel.filter(
            (F.col("n_nationkey") >= 20) & (F.col("n_nationkey") < 23)
        )))
    mark_setup_done()  # history built; the lineage export is the op
    lin = tbl.lineage_df().collect()
    head_chain = [
        r["ancestor_id"]
        for r in sorted(
            (r for r in lin if r["is_current"]), key=lambda r: r["depth"]
        )
    ]
    proc = [
        r["snapshot_id"]
        for r in eng.sql(
            "CALL system.ancestors_of(table => 'nat_lin')"
        ).collect()
    ]
    assert head_chain == proc, (head_chain, proc)
    assert head_chain == [s4.snapshot_id, s2.snapshot_id, s1.snapshot_id]
    orphan = sorted(
        r["depth"] for r in lin if r["snapshot_id"] == s3.snapshot_id
    )
    assert orphan == [0, 1, 2] and not any(
        r["is_current"] for r in lin if r["snapshot_id"] == s3.snapshot_id
    ), "rolled-over snapshot keeps its own non-current chain"
    assert len(lin) == 1 + 2 + 3 + 3, "closure = sum of chain lengths"
    return eng.sql(
        "SELECT l.depth, h.operation, h.total_records, "
        "h.is_current_ancestor "
        "FROM `nat_lin$lineage` l "
        "JOIN `nat_lin$history` h ON h.snapshot_id = l.ancestor_id "
        "WHERE l.is_current ORDER BY l.depth"
    )


# ------------------------------------------- Louvain to convergence --


def _louvain_converge_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    max_rounds = 4
    blocks = []
    for k in range(1, max_rounds + 1):
        blocks.append(_louvain_round_sql(k, f"lab{k}"))
        blocks.append(
            f"lab{k + 1} AS (SELECT n, lbl_new AS lbl FROM moved{k})"
        )
    movers = ", ".join(
        f"mv{k} AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM moved{k} "
        "WHERE lbl_new <> lbl_old)"
        for k in range(1, max_rounds + 1)
    )
    case = (
        "CASE WHEN mv1.c = 0 THEN 1 WHEN mv2.c = 0 THEN 2 "
        "WHEN mv3.c = 0 THEN 3 ELSE 4 END"
    )
    sql = (
        _EDGE_SQL
        + f""",
        lab1 AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        {", ".join(blocks)},
        {movers},
        conv AS (
          SELECT CAST({case} AS INTEGER) AS rounds_run
          FROM mv1, mv2, mv3
        )
        SELECT CAST(lab5.lbl AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CAST('0x' || substr(md5(n), 1, 6) AS BIGINT))
                    AS BIGINT) AS node_digest,
               conv.rounds_run AS rounds_run
        FROM lab5 CROSS JOIN conv
        GROUP BY 1, 4 ORDER BY 1
    """
    )
    # Four chained rounds reference `e`/`lab{k}` many times; DuckDB
    # inlines CTEs by default, which re-opens documents.parquet per
    # reference and trips the fd limit — materialize every CTE (the
    # curation_facility_location lesson).
    return sql.replace(" AS (", " AS MATERIALIZED (")


@register(
    "graph_louvain_converge",
    oracle=_louvain_converge_oracle(),
    doc="Louvain TO CONVERGENCE (operators/graph.py:louvain_converge): "
    "chained synchronous refinement rounds until a round moves no node, "
    "hard-bounded at max_rounds=4 because simultaneous moves can "
    "oscillate — the bound is asserted in-DAG. The oracle chains four "
    "FIXED round-CTE blocks (a converged round is idempotent, so the "
    "fixed chain replays early stopping exactly) and derives rounds_run "
    "as min k with zero movers. Result: final community rollup (size + "
    "md5 node digest) with rounds_run. Scale shape: per round one "
    "bounded-join pass, localCheckpoint between rounds, LIMIT-1 movers "
    "probe on the checkpointed frame.",
    tags=("graph", "dedup", "window"),
)
def graph_louvain_converge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import louvain_converge
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir)
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    labels = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    )
    final, rounds_run = louvain_converge(half, labels, max_rounds=4)
    assert 1 <= rounds_run <= 4, rounds_run
    return (
        final.groupBy(F.col("lbl").cast("bigint").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(
                F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            ).cast("bigint").alias("node_digest"),
        )
        .withColumn("rounds_run", F.lit(int(rounds_run)).cast("int"))
        .orderBy("community")
    )


# ------------------------------------------------- integer-DCT pHash --


def _phash_hashes_sql(max_doc: int) -> str:
    """Shared oracle CTE chain doc->gray->DCT->bits->hashes, replaying
    operators/multimodal.py:image_dct_hash from the SAME integer DCT
    constants (dct_coef_values_sql literals — no trig in either
    engine's query)."""
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    return f"""
        coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 16) * 37 + i.i * 11) % 256 AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3
        ),
        dct AS (
          SELECT gray.doc_id, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT doc_id, u * 8 + v AS k,
                 CASE WHEN (u = 0 AND v = 0) OR d <= 0
                      THEN 0 ELSE 1 END AS bit
          FROM dct
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k // 16 = 0
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b0,
                 CAST(SUM(CASE WHEN k // 16 = 1
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b1,
                 CAST(SUM(CASE WHEN k // 16 = 2
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b2,
                 CAST(SUM(CASE WHEN k // 16 = 3
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b3,
                 CAST(SUM(bit) AS INTEGER) AS popcount
          FROM bits GROUP BY doc_id
        )"""


def _phash_blobs(spark: SparkSession, sf_dir: str, max_doc: int):
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < max_doc)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 256 for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.mapInPandas(build, schema="doc_id bigint, payload binary")


@register(
    "multimodal_image_phash",
    oracle=f"""
        WITH {_phash_hashes_sql(500)}
        SELECT b0, b1, b2, b3, CAST(MAX(popcount) AS INTEGER) AS popcount,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM hashes
        GROUP BY b0, b1, b2, b3
        ORDER BY b0, b1, b2, b3
    """,
    doc="Perceptual DCT hash (pHash) image dedup — the frequency-domain "
    "tier above aHash/dHash (operators/multimodal.py:image_dct_hash): "
    "integer grayscale -> quantized integer DCT-II on both axes -> "
    "sign-of-AC-coefficient bits, DC dropped. The trig runs ONCE on "
    "the driver (dct_int_coefs) and both engines consume the same "
    "integer literals, so the hash is exact end-to-end — no "
    "cross-engine cos()/median boundary exists. Same planted 16-class "
    "fixture and four 16-bit bands as the aHash/dHash gates; oracle "
    "replays the DCT relationally from the embedded constants.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import multimodal

    blobs = _phash_blobs(spark, sf_dir, 500)
    hashes = multimodal.image_dct_hash(blobs, size=16, block=8)
    return (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.max("popcount").cast("int").alias("popcount"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("b0", "b1", "b2", "b3")
    )


@register(
    "dedup_image_phash_tier",
    oracle=f"""
        WITH {_phash_hashes_sql(500)},
        tagged AS (
          SELECT doc_id, doc_id % 16 AS cls, b0, b1, b2, b3 FROM hashes
        ),
        pairs AS (
          SELECT CASE WHEN x.cls = y.cls THEN 1 ELSE 0 END AS is_dup,
                 CASE WHEN x.b0 = y.b0 OR x.b1 = y.b1
                        OR x.b2 = y.b2 OR x.b3 = y.b3
                      THEN 1 ELSE 0 END AS is_cand
          FROM tagged x JOIN tagged y ON x.doc_id < y.doc_id
        ),
        conf AS (
          SELECT CAST(SUM(is_dup * is_cand) AS BIGINT) AS tp,
                 CAST(SUM((1 - is_dup) * is_cand) AS BIGINT) AS fp,
                 CAST(SUM(is_dup * (1 - is_cand)) AS BIGINT) AS fn,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM pairs
        )
        SELECT tp, fp, fn, n_pairs,
               CAST((tp * 1000000) // (tp + fp) AS BIGINT)
                 AS precision_ppm,
               CAST((tp * 1000000) // (tp + fn) AS BIGINT)
                 AS recall_ppm
        FROM conf
    """,
    doc="Candidate-tier evaluation for the DCT pHash "
    "(dedup_image_tier_eval's sibling, one tier up): ground truth = "
    "planted pixel-identity classes (doc_id % 16), candidate tier = "
    "any shared 16-bit pHash band; exact-integer TP/FP/FN with "
    "precision/recall in ppm — the row that ranks aHash vs dHash vs "
    "pHash banding before an image-dedup pass scales out. Bounded "
    "audit-scale pair enumeration; production candidates come from "
    "the band equi-join only.",
    tags=("multimodal", "dedup", "stats"),
)
def dedup_image_phash_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import multimodal

    blobs = _phash_blobs(spark, sf_dir, 500)
    tagged = (
        multimodal.image_dct_hash(blobs, size=16, block=8)
        .select(
            "doc_id", (F.col("doc_id") % 16).alias("cls"),
            "b0", "b1", "b2", "b3",
        )
        .localCheckpoint()
    )
    x, y = tagged.alias("x"), tagged.alias("y")
    pairs = x.join(y, F.col("x.doc_id") < F.col("y.doc_id")).select(
        F.when(F.col("x.cls") == F.col("y.cls"), 1).otherwise(0)
        .alias("is_dup"),
        F.when(
            (F.col("x.b0") == F.col("y.b0"))
            | (F.col("x.b1") == F.col("y.b1"))
            | (F.col("x.b2") == F.col("y.b2"))
            | (F.col("x.b3") == F.col("y.b3")),
            1,
        ).otherwise(0).alias("is_cand"),
    )
    return pairs.agg(
        F.sum(F.expr("is_dup * is_cand")).cast("bigint").alias("tp"),
        F.sum(F.expr("(1 - is_dup) * is_cand")).cast("bigint").alias("fp"),
        F.sum(F.expr("is_dup * (1 - is_cand)")).cast("bigint").alias("fn"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    ).select(
        "tp", "fp", "fn", "n_pairs",
        F.expr("CAST((tp * 1000000) DIV (tp + fp) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST((tp * 1000000) DIV (tp + fn) AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


# ------------------------------------------------ stratified CUPED --

_CUPED_STRAT_BODY = """
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS {int_t}) AS arm,
                 CAST(SUM(CASE WHEN ev.day < d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ev.day >= d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        strat_user AS (
          SELECT user_id, arm, x, y,
                 CAST(LEAST(x {div} 4, 2) AS {int_t}) AS stratum
          FROM per_user
        ),
        pooled AS (
          SELECT stratum,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM strat_user GROUP BY stratum
        ),
        arms AS (
          SELECT stratum, arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM strat_user GROUP BY stratum, arm
        )
        SELECT a.stratum, a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CASE WHEN p.n * p.sxx - p.sx * p.sx = 0
                         THEN CAST(0 AS DOUBLE)
                         ELSE CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                              / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE)
                    END)
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_mean
        FROM arms a JOIN pooled p ON p.stratum = a.stratum
        ORDER BY a.stratum, a.arm
"""


@register(
    "events_cuped_stratified",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
    """
    + _CUPED_STRAT_BODY.format(int_t="INTEGER", div="//"),
    doc="STRATIFIED CUPED (events_cuped_adjustment's post-stratified "
    "form — Deng et al. 2013 §5): users are stratified by the "
    "PRE-TREATMENT covariate itself (pre-period purchase-count buckets "
    "x DIV 4 capped at 2), theta is fit per stratum from that "
    "stratum's pooled exact-integer sufficient stats, and each "
    "(stratum, arm) reports mean(Y) - theta_s * (mean(X) - mean(X_s)) "
    "— variance reduction beyond pooled CUPED because theta tracks "
    "heterogeneous covariate slopes. A zero-variance stratum (all "
    "users share one x — REAL at sf0.001) takes theta = 0 via a "
    "mirrored CASE guard instead of an ANSI divide-by-zero (the "
    "events_cuped_binary lesson). Exact bigint rationals, one "
    "textually mirrored float expression.",
    tags=("events", "stats", "curation"),
)
def events_cuped_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cuped_s")
    return spark.sql(
        """
        WITH ev AS (
          SELECT user_id, event_type, ts DIV 86400000000000 AS day
          FROM ev_cuped_s
        ),
        """
        + _CUPED_STRAT_BODY.format(int_t="INT", div="DIV")
    )


# ------------------------------- Lan-DeMets information-fraction A/B --

# OBF-shape spending boundary c(t) = C / sqrt(t); C = 2.004 is the
# terminal K=3 alpha=0.05 O'Brien-Fleming critical value, making this
# the general-information-fraction form of events_sequential_ab's fixed
# 3.471/2.454/2.004 ladder (those ARE 2.004/sqrt(k/3)).
_LD_C = 2.004

_LAN_DEMETS_SQL = """
        WITH ev AS (
          SELECT user_id, event_type,
                 {day_expr} AS day
          FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        pu AS (
          SELECT looks.k, ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN ev.event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          WHERE ev.day < d0.d0 + 7 * looks.k
          GROUP BY looks.k, ev.user_id
        ),
        arms AS (
          SELECT k, arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM pu GROUP BY 1, 2
        ),
        wide AS (
          SELECT k,
                 MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 0 THEN c END) AS c0,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 1 THEN c END) AS c1
          FROM wide_src
        ),
        info AS (
          SELECT k, n0, c0, n1, c1,
                 CAST(n0 + n1 AS BIGINT) AS i_k
          FROM wide
        ),
        imax AS (SELECT i_k AS im FROM info WHERE k = 3),
        z AS (
          SELECT info.k, n0, c0, n1, c1, i_k, imax.im,
                 CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1
                      THEN CAST(0.0 AS DOUBLE)
                      ELSE (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                            - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                           / sqrt((CAST(c0 + c1 AS DOUBLE)
                                   / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 - CAST(c0 + c1 AS DOUBLE)
                                         / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 / CAST(n0 AS DOUBLE)
                                     + 1.0 / CAST(n1 AS DOUBLE)))
                 END AS z
          FROM info CROSS JOIN imax
        )
        SELECT CAST(k AS INTEGER) AS look, n0, c0, n1, c1,
               CAST((i_k * 1000000) {div} im AS BIGINT) AS info_frac_ppm,
               {c} / sqrt(CAST(i_k AS DOUBLE) / CAST(im AS DOUBLE))
                 AS crit,
               z,
               CAST(CASE WHEN abs(z) >
                         {c} / sqrt(CAST(i_k AS DOUBLE)
                                    / CAST(im AS DOUBLE))
                    THEN 1 ELSE 0 END AS INTEGER) AS reject
        FROM z ORDER BY look
"""


@register(
    "events_lan_demets_ab",
    oracle=_LAN_DEMETS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        div="//",
        c=_LD_C,
    ).replace("FROM wide_src", "FROM arms GROUP BY k"),
    doc="Lan-DeMets group-sequential A/B readout at DATA-DRIVEN "
    "information fractions (Lan & DeMets 1983): unlike "
    "events_sequential_ab's pre-fixed 3-look ladder, each weekly look "
    "counts only the users ENROLLED so far (first event before the "
    "cutoff), the information fraction t_k = I_k / I_final is an exact "
    "ppm rational, and the boundary is the O'Brien-Fleming-SHAPE "
    "spending curve c(t) = 2.004 / sqrt(t) evaluated at the observed "
    "t_k — the fixed ladder is exactly this curve at t = k/3. "
    "Zero/full-conversion ANSI guard as in the fixed-look gate; sqrt "
    "and double division are bit-identical across engines. Scale "
    "shape: per-(look, user) aggregate + a 6-row arm rollup.",
    tags=("events", "stats", "curation"),
)
def events_lan_demets_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ldab")
    return spark.sql(
        _LAN_DEMETS_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_ldab",
            unnest_looks="explode(sequence(1, 3))",
            div="DIV",
            c=_LD_C,
        ).replace("FROM wide_src", "FROM arms GROUP BY k")
    )


# ------------------------------------------------ MSCK REPAIR TABLE --


@register(
    "managed_msck_repair",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="MSCK REPAIR TABLE end-to-end (reference TestTables.scala:72, "
    "the last reference-test statement without a spelling here; "
    "table.py:repair_table): a third of orders lands through the "
    "engine write path, the rest is dropped EXTERNALLY into the "
    "table's data dir as o_year=YYYY/ Hive partition directories; the "
    "repair discovers them by listing, registers them zero-copy "
    "through add_files (path-only partitions), never touches "
    "engine-written files, and is idempotent (second repair adds 0 — "
    "asserted in-DAG). Result: the healed table's per-year rollup vs "
    "the full raw-orders oracle.",
    tags=("managed", "import", "hive"),
)
def managed_msck_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-msckwh-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    tbl = eng.catalog.create_table("ord_msck", ddl, ["o_year"])
    tbl.insert(nonempty(orders.filter(F.col("o_orderkey") % 3 == 0)))
    stage = tempfile.mkdtemp(prefix="icebergsql-msckstage-")
    orders.filter(F.col("o_orderkey") % 3 != 0).write.mode(
        "overwrite"
    ).partitionBy("o_year").parquet(stage)
    for d in os.listdir(stage):
        if d.startswith("o_year="):
            shutil.move(
                os.path.join(stage, d), os.path.join(tbl.meta.data_dir, d)
            )
    mark_setup_done()  # drops staged; the listing repair is the op
    added = eng.sql("MSCK REPAIR TABLE ord_msck").collect()[0][
        "added_files_count"
    ]
    assert added > 0
    assert (
        eng.sql("MSCK REPAIR TABLE ord_msck").collect()[0][
            "added_files_count"
        ]
        == 0
    ), "repair must be idempotent"
    tbl.refresh()
    assert tbl.scan().count_from_stats() == orders.count()
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_msck GROUP BY o_year ORDER BY o_year"
    )


# ------------------------------------- pHash near-dup candidate pairs --

_PHASH_PERT_PIXEL = (
    "((doc_id % 16) * 37 + {i} * 11) % 224 "
    "+ CASE WHEN (doc_id {div} 16) % 2 = 1 AND {i} < 12 "
    "THEN 32 ELSE 0 END"
)


def _phash_pert_hashes_sql(max_doc: int) -> str:
    """Hash CTE chain over the PERTURBED fixture: 16 base classes plus a
    near-duplicate variant per class ((doc_id DIV 16) parity brightens
    the top-left 2x2 gray pixels by +96) — base formula runs mod 224 so
    the perturbed bytes stay in range. Same integer-DCT replay as
    _phash_hashes_sql."""
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    pix = _PHASH_PERT_PIXEL.format(i="i.i", div="//")
    return f"""
        coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i, {pix} AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3
        ),
        dct AS (
          SELECT gray.doc_id, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT doc_id, u * 8 + v AS k,
                 CASE WHEN (u = 0 AND v = 0) OR d <= 0
                      THEN 0 ELSE 1 END AS bit
          FROM dct
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k // 16 = 0
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b0,
                 CAST(SUM(CASE WHEN k // 16 = 1
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b1,
                 CAST(SUM(CASE WHEN k // 16 = 2
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b2,
                 CAST(SUM(CASE WHEN k // 16 = 3
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT) AS b3
          FROM bits GROUP BY doc_id
        )"""


@register(
    "dedup_phash_hamming_pairs",
    oracle=f"""
        WITH {_phash_pert_hashes_sql(500)},
        classes AS (
          SELECT b0, b1, b2, b3, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hashes GROUP BY 1, 2, 3, 4
        ),
        cand AS (
          SELECT DISTINCT x.rep AS rep_a, y.rep AS rep_b
          FROM classes x JOIN classes y ON x.rep < y.rep
          WHERE x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3
        ),
        scored AS (
          SELECT c.rep_a, c.rep_b,
                 CAST(bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
                      + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
                      + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
                      + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT))
                      AS INTEGER) AS hamming,
                 a.n_docs * b.n_docs AS n_pairs
          FROM cand c
          JOIN classes a ON a.rep = c.rep_a
          JOIN classes b ON b.rep = c.rep_b
        )
        SELECT rep_a, rep_b, hamming, CAST(n_pairs AS BIGINT) AS n_pairs
        FROM scored WHERE hamming <= 12
        ORDER BY hamming, rep_a, rep_b
    """,
    doc="Image near-duplicate candidate pairs from pHash BANDING "
    "(dedup_ahash_hamming_pairs one tier up): the fixture plants a "
    "near-dup VARIANT of each of the 16 classes (top-left 2x2 gray "
    "pixels +96 — hamming 4-19 from its base under the integer DCT, "
    "while cross-class distances sit at 34+), classes sharing any "
    "16-bit pHash band become candidates, exact Hamming via per-band "
    "XOR popcounts, pairs kept at hamming <= 12. Candidates come from "
    "band equi-joins over the CLASS table, never doc x doc; the "
    "4-band pigeonhole guarantees hamming <= 3 pairs, wider ones "
    "best-effort (9 of the 16 planted variant pairs band-match — "
    "measured, SF-independent). Oracle replays hashes from the "
    "embedded DCT constants and mirrors the banding.",
    tags=("multimodal", "dedup"),
)
def dedup_phash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 500)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                pert = (d // 16) % 2 == 1
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 224
                    + (32 if pert and i < 12 else 0)
                    for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    classes = (
        multimodal.image_dct_hash(blobs, size=16, block=8)
        .groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep"),
        )
        .localCheckpoint()
    )
    x, y = classes.alias("x"), classes.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.rep") < F.col("y.rep"))
            & (
                (F.col("x.b0") == F.col("y.b0"))
                | (F.col("x.b1") == F.col("y.b1"))
                | (F.col("x.b2") == F.col("y.b2"))
                | (F.col("x.b3") == F.col("y.b3"))
            ),
        )
        .select(
            F.col("x.rep").alias("rep_a"),
            F.col("y.rep").alias("rep_b"),
            (
                F.bit_count(F.col("x.b0").bitwiseXOR(F.col("y.b0")))
                + F.bit_count(F.col("x.b1").bitwiseXOR(F.col("y.b1")))
                + F.bit_count(F.col("x.b2").bitwiseXOR(F.col("y.b2")))
                + F.bit_count(F.col("x.b3").bitwiseXOR(F.col("y.b3")))
            ).cast("int").alias("hamming"),
            (F.col("x.n_docs") * F.col("y.n_docs"))
            .cast("bigint")
            .alias("n_pairs"),
        )
        .distinct()
    )
    return (
        cand.filter(F.col("hamming") <= 12)
        .orderBy("hamming", "rep_a", "rep_b")
    )


# ----------------------------------------------- SRM guardrail check --

_SRM_SQL = """
        WITH ev AS (
          SELECT user_id, {day_expr} AS day FROM {src}
        ),
        du AS (
          SELECT DISTINCT day, user_id,
                 CAST({hash_expr} % 2 AS INTEGER) AS arm
          FROM ev
        ),
        counts AS (
          SELECT day,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
          FROM du GROUP BY day
        )
        SELECT CAST(day AS BIGINT) AS day, n0, n1,
               CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS chi2_num,
               CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) AS chi2,
               CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                              / CAST(n0 + n1 AS DOUBLE) > 3.841
                    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        FROM counts ORDER BY day
"""


@register(
    "events_srm_check",
    oracle=_SRM_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        hash_expr="CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
        "1, 6) AS BIGINT)",
    ),
    doc="Sample-ratio-mismatch guardrail (the FIRST check every A/B "
    "platform runs before reading any metric — a biased assignment "
    "invalidates the experiment regardless of effect size): daily "
    "active users bucketed 50/50 by an md5 hash of user_id, and the "
    "1-df chi-square against the expected split reduces EXACTLY to "
    "(n0-n1)^2/(n0+n1) — numerator emitted as the exact bigint, the "
    "single float division mirrored, flag at the 3.841 (alpha=.05) "
    "boundary. md5/substr are bit-identical across engines (the "
    "minhash contract). Scale shape: one distinct-(day,user) "
    "aggregate, one per-day rollup.",
    tags=("events", "stats"),
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_srm")
    return spark.sql(
        _SRM_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_srm",
            hash_expr="conv(substring(md5(CAST(user_id AS STRING)), "
            "1, 6), 16, 10)",
        )
    )


# ------------------------------------------------- Bayesian A/B --

_BAYES_AB_SQL = """
        WITH ev AS (
          SELECT user_id, event_type FROM {src}
        ),
        pu AS (
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM ev GROUP BY user_id
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM pu GROUP BY arm
        ),
        wide AS (
          SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 0 THEN c END) AS c0,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 1 THEN c END) AS c1
          FROM arms
        )
        SELECT n0, c0, n1, c1,
               CAST(1 + c0 AS BIGINT) AS alpha0,
               CAST(1 + n0 - c0 AS BIGINT) AS beta0,
               CAST(1 + c1 AS BIGINT) AS alpha1,
               CAST(1 + n1 - c1 AS BIGINT) AS beta1,
               CAST(1 + c0 AS DOUBLE) / CAST(n0 + 2 AS DOUBLE)
                 AS post_mean0,
               CAST(1 + c1 AS DOUBLE) / CAST(n1 + 2 AS DOUBLE)
                 AS post_mean1,
               (CAST(1 + c1 AS DOUBLE) / CAST(n1 + 2 AS DOUBLE)
                - CAST(1 + c0 AS DOUBLE) / CAST(n0 + 2 AS DOUBLE))
               / sqrt(
                   CAST((1 + c0) * (1 + n0 - c0) AS DOUBLE)
                   / (CAST(n0 + 2 AS DOUBLE) * CAST(n0 + 2 AS DOUBLE)
                      * CAST(n0 + 3 AS DOUBLE))
                   + CAST((1 + c1) * (1 + n1 - c1) AS DOUBLE)
                   / (CAST(n1 + 2 AS DOUBLE) * CAST(n1 + 2 AS DOUBLE)
                      * CAST(n1 + 3 AS DOUBLE))
                 ) AS lift_z
        FROM wide
"""


@register(
    "events_bayesian_ab",
    oracle=_BAYES_AB_SQL.format(src="events"),
    doc="Bayesian A/B readout with Beta-Bernoulli conjugate posteriors "
    "(uniform Beta(1,1) prior): per arm the posterior is "
    "Beta(1+c, 1+n-c) — parameters emitted as exact bigints, the "
    "closed-form posterior mean a/(a+b) and the normal-approximation "
    "lift z = (m1-m0)/sqrt(v0+v1) (v = ab/((a+b)^2(a+b+1))) as ONE "
    "mirrored float expression per column — sqrt and double division "
    "are bit-identical across engines, and no erf/Phi is needed for "
    "the sufficient summary. Conversion = >= 5 purchases (the round-6 "
    "non-degeneracy rule). Scale shape: one per-user aggregate, a "
    "2-row arm rollup, a 1-row pivot.",
    tags=("events", "stats"),
)
def events_bayesian_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_bayes")
    return spark.sql(_BAYES_AB_SQL.format(src="ev_bayes"))


# -------------------------------------------- Louvain coarsen (L2) --


def _louvain_coarsen_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    return (
        _EDGE_SQL
        + f""",
        lab1 AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        {_louvain_round_sql(1, 'lab1')},
        lab2 AS (SELECT n, lbl_new AS lbl FROM moved1),
        super AS (
          SELECT LEAST(la.lbl, lb.lbl) AS ca,
                 GREATEST(la.lbl, lb.lbl) AS cb,
                 CAST(COUNT(*) AS BIGINT) AS weight
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b
          GROUP BY 1, 2
        ),
        sizes AS (
          SELECT lbl AS c, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM lab2
          GROUP BY 1
        )
        SELECT CAST(super.ca AS BIGINT) AS ca,
               CAST(super.cb AS BIGINT) AS cb,
               super.weight,
               sa.n_nodes AS ca_nodes, sb.n_nodes AS cb_nodes,
               CAST(CASE WHEN super.ca = super.cb THEN 1 ELSE 0 END
                    AS INTEGER) AS is_self_loop
        FROM super
        JOIN sizes sa ON sa.c = super.ca
        JOIN sizes sb ON sb.c = super.cb
        ORDER BY ca, cb
    """
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "graph_louvain_coarsen",
    oracle=_louvain_coarsen_oracle(),
    doc="Louvain LEVEL-2 coarsening: after one synchronous gain round, "
    "communities collapse to super-nodes and the coarsened MULTIGRAPH "
    "is the exact edge rollup — super-edge (ca <= cb) weight = count "
    "of original undirected edges between (within, for the self-loop "
    "row) the two communities, plus the member counts. This is "
    "precisely the graph the next Louvain level runs on (Blondel et "
    "al. 2008 phase 2); weights and sizes are exact bigints. Scale "
    "shape: the bounded-join round plus ONE two-way label join and a "
    "community-pair aggregate — output is |communities|^2-bounded "
    "metadata, never edge volume.",
    tags=("graph", "dedup"),
)
def graph_louvain_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import louvain_gain_round
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir)
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    labels = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    )
    lab2 = (
        louvain_gain_round(half, labels)
        .select("n", F.col("lbl_new").alias("lbl"))
        .localCheckpoint()
    )
    la = lab2.select(F.col("n").alias("a"), F.col("lbl").alias("la"))
    lb = lab2.select(F.col("n").alias("b"), F.col("lbl").alias("lb"))
    super_e = (
        half.join(la, "a")
        .join(lb, "b")
        .groupBy(
            F.least("la", "lb").cast("bigint").alias("ca"),
            F.greatest("la", "lb").cast("bigint").alias("cb"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("weight"))
    )
    sizes = lab2.groupBy(F.col("lbl").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    return (
        super_e.join(
            sizes.select(
                F.col("c").alias("ca"), F.col("n_nodes").alias("ca_nodes")
            ),
            "ca",
        )
        .join(
            sizes.select(
                F.col("c").alias("cb"), F.col("n_nodes").alias("cb_nodes")
            ),
            "cb",
        )
        .select(
            "ca", "cb", "weight", "ca_nodes", "cb_nodes",
            F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)
            .cast("int")
            .alias("is_self_loop"),
        )
        .orderBy("ca", "cb")
    )


# ------------------------------------------------ k-center coreset --


def _kcenter_oracle(query_id: int, k: int, candidates: int) -> str:
    """Unrolled greedy k-center: cov_r = each pool element's best
    similarity to the selected set; pick_{r} takes the element with the
    LOWEST cov (farthest point, tie lowest id). AS MATERIALIZED per
    step (the facility-location lesson)."""
    dot_ab = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    )

    def sq(t: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, 64), "
            f"i -> {t}.embedding[i]::DOUBLE * {t}.embedding[i]::DOUBLE))"
        )

    steps = []
    for r in range(2, k + 1):
        steps.append(f"""
        pick{r} AS MATERIALIZED (
          SELECT {r} AS rank, cov{r - 1}.u AS vec_id,
                 cov{r - 1}.cv AS maxsim_nano
          FROM cov{r - 1}
          WHERE cov{r - 1}.u NOT IN (SELECT vec_id FROM sel{r - 1})
          ORDER BY cov{r - 1}.cv ASC, cov{r - 1}.u ASC
          LIMIT 1
        ),
        sel{r} AS MATERIALIZED (
          SELECT vec_id FROM sel{r - 1} UNION ALL
          SELECT vec_id FROM pick{r}
        ),
        cov{r} AS MATERIALIZED (
          SELECT cov{r - 1}.u,
                 GREATEST(cov{r - 1}.cv, sf.s) AS cv
          FROM cov{r - 1}
          JOIN simfull sf ON sf.ia = cov{r - 1}.u
          JOIN pick{r} p ON p.vec_id = sf.ib
        )""")
    finals = " UNION ALL ".join(
        ["SELECT rank, vec_id, maxsim_nano FROM pick1"]
        + [
            f"SELECT rank, vec_id, maxsim_nano FROM pick{r}"
            for r in range(2, k + 1)
        ]
    )
    return f"""
        WITH q AS (SELECT embedding FROM embeddings
                   WHERE vec_id = {query_id}),
        cand AS MATERIALIZED (
          SELECT b.vec_id, b.embedding,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('b')} * {sq('a')})) AS BIGINT) AS rel
          FROM q a CROSS JOIN embeddings b
          WHERE b.vec_id != {query_id}
          ORDER BY rel DESC, b.vec_id
          LIMIT {candidates}
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('a')} * {sq('b')})) AS BIGINT) AS s
          FROM cand a JOIN cand b ON a.vec_id < b.vec_id
        ),
        simfull AS MATERIALIZED (
          SELECT ia, ib, s FROM sims
          UNION ALL SELECT ib, ia, s FROM sims
          UNION ALL SELECT vec_id AS ia, vec_id AS ib,
                           CAST(1000000000 AS BIGINT) AS s
          FROM cand
        ),
        pick1 AS MATERIALIZED (
          SELECT 1 AS rank, vec_id, rel AS maxsim_nano
          FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
        ),
        sel1 AS MATERIALIZED (SELECT vec_id FROM pick1),
        cov1 AS MATERIALIZED (
          SELECT cand.vec_id AS u, sf.s AS cv
          FROM cand
          JOIN simfull sf ON sf.ia = cand.vec_id
          JOIN pick1 p ON p.vec_id = sf.ib
        ){",".join([""] + steps) if steps else ""}
        SELECT CAST(rank AS INTEGER) AS rank,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(maxsim_nano AS BIGINT) AS maxsim_nano
        FROM ({finals}) ORDER BY rank
    """


@register(
    "curation_kcenter_coreset",
    oracle=_kcenter_oracle(query_id=1, k=5, candidates=24),
    doc="Greedy k-center (farthest-point) coreset selection "
    "(operators/similarity.py:kcenter_select — Gonzalez 1985 "
    "2-approximation): seed with vec 1's nearest neighbor, then "
    "repeatedly take the candidate LEAST similar to everything "
    "selected — maximal spread, the coverage complement of "
    "curation_facility_location's density objective. Two-phase "
    "100-TB shape (TakeOrdered relevance scan; bounded candidates^2 "
    "integer-nano sim matrix; sequential greedy over <=24 collected "
    "ints, result emitted as a VALUES LocalRelation). Oracle unrolls "
    "all 5 picks as MATERIALIZED CTEs over per-element best-coverage "
    "state.",
    tags=("curation", "embeddings", "similarity"),
)
def curation_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.similarity import kcenter_select

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return kcenter_select(emb, query_id=1, k=5, candidates=24).orderBy(
        "rank"
    )


# ---------------------------------------------- branch compare --


@register(
    "managed_branch_compare",
    oracle="""
        WITH c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey < 10),
             c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey >= 10 AND n_nationkey < 15),
             b1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey >= 15 AND n_nationkey < 20),
             b2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey >= 20),
             m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation
                    WHERE n_nationkey % 5 = 0)
        SELECT 2 AS branch_ahead, 1 AS main_behind,
               'append' AS base_operation,
               CAST(c1.n + c2.n AS BIGINT) AS base_total_records,
               CAST(c1.n + c2.n + b1.n + b2.n AS BIGINT)
                 AS branch_total_records,
               CAST(c1.n + c2.n + m1.n AS BIGINT) AS main_total_records
        FROM c1, c2, b1, b2, m1
    """,
    doc="Branch compare through the `$lineage` closure: after main and "
    "a dev branch diverge (2 branch commits, 1 main commit past the "
    "fork), ONE SQL query over `$lineage` x `$refs` x `$history` "
    "finds the merge base (the common ancestor at minimum main-side "
    "depth), how far each side is ahead, and the running "
    "total_records on base/branch/main heads — the git-style "
    "ahead/behind readout an auditor wants before fast_forward or "
    "cherry-pick, all from bounded metadata (no data IO). Counts "
    "oracle against pure nation predicates.",
    tags=("managed", "metadata", "lineage"),
)
def managed_branch_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    nation = load_tables(spark, sf_dir, ("nation",))["nation"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-bcmp-"))
    tbl = eng.catalog.create_table(
        "nat_cmp",
        "n_nationkey bigint, n_name string, n_regionkey bigint",
        ["n_regionkey"],
    )
    sel = nation.select("n_nationkey", "n_name", "n_regionkey")
    k = F.col("n_nationkey")
    tbl.insert(nonempty(sel.filter(k < 10)))
    tbl.insert(nonempty(sel.filter((k >= 10) & (k < 15))))
    tbl.create_branch("dev")
    tbl.insert(nonempty(sel.filter((k >= 15) & (k < 20))), branch="dev")
    tbl.insert(nonempty(sel.filter(k >= 20)), branch="dev")
    tbl.insert(nonempty(sel.filter(k % 5 == 0)))  # main diverges past the fork
    mark_setup_done()  # divergent history built; the compare is the op
    return eng.sql("""
        WITH mainc AS (
          SELECT ancestor_id, depth FROM `nat_cmp$lineage`
          WHERE is_current
        ),
        devh AS (
          SELECT snapshotId AS sid FROM `nat_cmp$refs` WHERE name = 'dev'
        ),
        devc AS (
          SELECT l.ancestor_id, l.depth
          FROM `nat_cmp$lineage` l JOIN devh ON devh.sid = l.snapshot_id
        ),
        base AS (
          SELECT mainc.ancestor_id, mainc.depth AS main_depth,
                 devc.depth AS dev_depth
          FROM mainc JOIN devc ON devc.ancestor_id = mainc.ancestor_id
          ORDER BY mainc.depth LIMIT 1
        )
        SELECT CAST(base.dev_depth AS INT) AS branch_ahead,
               CAST(base.main_depth AS INT) AS main_behind,
               hb.operation AS base_operation,
               hb.total_records AS base_total_records,
               hd.total_records AS branch_total_records,
               hm.total_records AS main_total_records
        FROM base
        JOIN `nat_cmp$history` hb ON hb.snapshot_id = base.ancestor_id
        JOIN devh ON 1 = 1
        JOIN `nat_cmp$history` hd ON hd.snapshot_id = devh.sid
        JOIN `nat_cmp$lineage` lm
          ON lm.is_current AND lm.depth = 0
        JOIN `nat_cmp$history` hm ON hm.snapshot_id = lm.ancestor_id
    """)


# ------------------------------------------------ HLL intersection --


def _hll_intersection_oracle() -> str:
    from icebergsql_spark.operators import sketch
    from icebergsql_spark.plans.pipeline9 import _hll_reg_cte

    est = (
        f"CASE WHEN ({sketch._RAW_EST_SQL}) <= {2.5 * sketch.HLL_M} "
        f"AND m_used < {sketch.HLL_M} "
        f"THEN {sketch.HLL_M} * ln(CAST({sketch.HLL_M} AS DOUBLE) "
        f"/ ({sketch.HLL_M} - m_used)) "
        f"ELSE ({sketch._RAW_EST_SQL}) END"
    )

    def agg(src: str, tag: str) -> str:
        return f"""
        agg_{tag} AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m_used,
                 CAST(SUM(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
                   AS harmonic_q
          FROM {src}
        ),
        est_{tag} AS (
          SELECT m_used AS m_used_{tag}, harmonic_q AS harmonic_q_{tag},
                 CAST(round({est}) AS BIGINT) AS est_{tag}
          FROM agg_{tag}
        )"""

    return f"""
        WITH a AS ({_hll_reg_cte("user_id % 3 != 0")}),
        b AS ({_hll_reg_cte("user_id % 2 = 0")}),
        u AS (
          SELECT COALESCE(a.reg, b.reg) AS reg,
                 CAST(greatest(COALESCE(a.max_rho, 0),
                               COALESCE(b.max_rho, 0)) AS INTEGER)
                   AS max_rho
          FROM a FULL OUTER JOIN b ON a.reg = b.reg
        ),
        {agg("a", "a")},
        {agg("b", "b")},
        {agg("u", "u")},
        exact AS (
          SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_inter
          FROM events
          WHERE user_id % 3 != 0 AND user_id % 2 = 0
        )
        SELECT est_a.*, est_b.*, est_u.*,
               CAST(est_a.est_a + est_b.est_b - est_u.est_u AS BIGINT)
                 AS est_intersection,
               exact.exact_inter
        FROM est_a CROSS JOIN est_b CROSS JOIN est_u CROSS JOIN exact
    """


@register(
    "sketch_hll_intersection",
    oracle=_hll_intersection_oracle(),
    doc="HLL set-intersection by inclusion-exclusion "
    "(operators/sketch.py:hll_intersection): |A n B| ~ est(A) + "
    "est(B) - est(A u B), the union sketch being the register-wise "
    "MAX merge the sketch_hll_union gate proves — the only "
    "intersection a mergeable sketch supports, with error growing as "
    "Jaccard shrinks. Sets A (user_id % 3 != 0) and B (even users) "
    "overlap at 1/3 of the key space; each sketch's exact register "
    "aggregates (m_used, harmonic_q) anchor the hash as bigints, and "
    "the exact distinct intersection rides along for the error audit. "
    "Scale shape: two O(m)-state partial aggregates + a 256-row "
    "full-outer merge — set size never matters.",
    tags=("sketch", "agg"),
)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    res = sketch.hll_intersection(
        ev.filter(F.col("user_id") % 3 != 0),
        ev.filter(F.col("user_id") % 2 == 0),
        "user_id",
    )
    exact = (
        ev.filter((F.col("user_id") % 3 != 0) & (F.col("user_id") % 2 == 0))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("exact_inter")
        )
    )
    return res.crossJoin(exact)


# --------------------------------------------- streaming SRM twin --


@register(
    "events_stream_srm",
    oracle=_SRM_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        hash_expr="CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
        "1, 6) AS BIGINT)",
    ),
    doc="STREAMING twin of events_srm_check: 3 chronological "
    "micro-batches (time-split parquet appends + maxFilesPerTrigger=1) "
    "each append their DISTINCT (day, user, arm) marker rows to a "
    "parquet sink — a set-mergeable partial, so batch chopping and "
    "replay cannot change the merged state — and the finalizer "
    "re-distincts and runs the identical per-day chi-square rollup "
    "the batch gate computes from raw events. Sink state is distinct "
    "(day, user) pairs per batch, never event volume; this is the "
    "guardrail that runs CONTINUOUSLY in production, flagging "
    "assignment bias while the experiment is still filling.",
    tags=("events", "streaming", "stats"),
)
def events_stream_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-ssrmsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-ssrmout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                F.expr("ts DIV 86400000000000").alias("day"),
                "user_id",
                F.expr(
                    "CAST(conv(substring(md5(CAST(user_id AS STRING)), "
                    "1, 6), 16, 10) % 2 AS INT)"
                ).alias("arm"),
            )
            .distinct()
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-ssrmck-")
    spark.read.parquet(out).distinct().createOrReplaceTempView("ssrm_du")
    return spark.sql("""
        WITH counts AS (
          SELECT day,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
          FROM ssrm_du GROUP BY day
        )
        SELECT CAST(day AS BIGINT) AS day, n0, n1,
               CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS chi2_num,
               CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                 / CAST(n0 + n1 AS DOUBLE) AS chi2,
               CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                              / CAST(n0 + n1 AS DOUBLE) > 3.841
                    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        FROM counts ORDER BY day
    """)


# ------------------------------------------- weighted Louvain (L2) --


def _louvain_level2_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    return (
        _EDGE_SQL
        + f""",
        lab1 AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        {_louvain_round_sql(1, 'lab1')},
        lab2 AS (SELECT n, lbl_new AS lbl FROM moved1),
        super AS (
          SELECT LEAST(la.lbl, lb.lbl) AS ca,
                 GREATEST(la.lbl, lb.lbl) AS cb,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b
          GROUP BY 1, 2
        ),
        wself AS (SELECT ca AS nn, w FROM super WHERE ca = cb),
        wplain AS (SELECT ca, cb, w FROM super WHERE ca <> cb),
        wsym AS (
          SELECT ca AS src, cb AS dst, w FROM wplain
          UNION ALL SELECT cb, ca, w FROM wplain
        ),
        wdeg AS (
          SELECT src, CAST(SUM(wt) AS BIGINT) AS k
          FROM (
            SELECT src, w AS wt FROM wsym
            UNION ALL SELECT nn AS src, 2 * w AS wt FROM wself
          ) x GROUP BY 1
        ),
        wm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM super),
        -- identity seed labels: every super-node is its own community,
        -- so k_iD = 0, tot_D = k_i, tot_C = k_C and the general gain
        -- collapses to 2m*w(i,C) - k_i * k_C (same bigint products the
        -- operator computes through the general form)
        wcand AS (
          SELECT s.src, s.dst AS c,
                 CAST(2 * wm.m * s.w - di.k * dc.k AS BIGINT) AS gain_num,
                 row_number() OVER (
                   PARTITION BY s.src
                   ORDER BY 2 * wm.m * s.w - di.k * dc.k DESC, s.dst ASC
                 ) AS rn
          FROM wsym s
          JOIN wdeg di ON di.src = s.src
          JOIN wdeg dc ON dc.src = s.dst
          CROSS JOIN wm
        ),
        wbest AS (
          SELECT src, c AS move_to, gain_num FROM wcand
          WHERE rn = 1 AND gain_num > 0
        ),
        sizes AS (
          SELECT lbl AS c, CAST(COUNT(*) AS BIGINT) AS members FROM lab2
          GROUP BY 1
        )
        SELECT CAST(wdeg.src AS BIGINT) AS community,
               CAST(COALESCE(wbest.move_to, wdeg.src) AS BIGINT)
                 AS lbl_new,
               CAST(COALESCE(wbest.gain_num, 0) AS BIGINT) AS gain_num,
               wdeg.k AS weighted_degree,
               sizes.members
        FROM wdeg
        LEFT JOIN wbest ON wbest.src = wdeg.src
        JOIN sizes ON sizes.c = wdeg.src
        ORDER BY community
    """
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "graph_louvain_level2",
    oracle=_louvain_level2_oracle(),
    doc="Multi-level Louvain completed: level-1 synchronous round -> "
    "community coarsening -> one WEIGHTED gain round on the super-"
    "graph (operators/graph.py:louvain_gain_round_weighted; self-loops "
    "carry the internal edge mass, contributing 2w to weighted degree "
    "but never to move gains). With identity seed labels on the "
    "super-nodes the general exact-bigint gain collapses to "
    "2m*w(i,C) - k_i*k_C, which the oracle replays after chaining the "
    "level-1 round and the coarsen rollup. Emits each super-node's "
    "move decision + weighted degree + member count. Scale shape: the "
    "level-2 graph is |communities|-bounded metadata; the round is "
    "the same bounded-join pass as level 1.",
    tags=("graph", "dedup"),
)
def graph_louvain_level2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import (
        louvain_gain_round,
        louvain_gain_round_weighted,
    )
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir)
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    labels = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    )
    lab2 = (
        louvain_gain_round(half, labels)
        .select("n", F.col("lbl_new").alias("lbl"))
        .localCheckpoint()
    )
    la = lab2.select(F.col("n").alias("a"), F.col("lbl").alias("la"))
    lb = lab2.select(F.col("n").alias("b"), F.col("lbl").alias("lb"))
    super_e = (
        half.join(la, "a")
        .join(lb, "b")
        .groupBy(
            F.least("la", "lb").alias("a"),
            F.greatest("la", "lb").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint()
    )
    wlab = super_e.select(F.col("a").alias("n")).unionAll(
        super_e.select(F.col("b").alias("n"))
    ).distinct().select("n", F.col("n").alias("lbl"))
    moved = louvain_gain_round_weighted(super_e, wlab)
    wdeg = (
        super_e.filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("n"), F.col("w").alias("wt"))
        .unionAll(
            super_e.filter(F.col("a") != F.col("b")).select(
                F.col("b").alias("n"), F.col("w").alias("wt")
            )
        )
        .unionAll(
            super_e.filter(F.col("a") == F.col("b")).select(
                F.col("a").alias("n"), (F.col("w") * 2).alias("wt")
            )
        )
        .groupBy("n")
        .agg(F.sum("wt").cast("bigint").alias("weighted_degree"))
    )
    sizes = lab2.groupBy(F.col("lbl").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("members")
    )
    return (
        moved.select(
            F.col("n").cast("bigint").alias("community"),
            F.col("lbl_new").cast("bigint").alias("lbl_new"),
            "gain_num",
        )
        .join(wdeg.withColumnRenamed("n", "community"), "community")
        .join(sizes.withColumnRenamed("n", "community"), "community")
        .orderBy("community")
    )


# ------------------------------------------------ RAKE keyphrases --

_RAKE_STOP = "('the', 'a', 'and', 'of', 'to', 'in', 'is', 'on')"

_RAKE_BODY = """
        seg AS (
          SELECT doc_id, pos, w,
                 SUM(CASE WHEN w IN {stop} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS seg_id
          FROM tok
        ),
        phrase AS (
          SELECT doc_id, seg_id,
                 {phrase_expr} AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS plen
          FROM seg WHERE w NOT IN {stop}
          GROUP BY doc_id, seg_id
        ),
        pw AS (
          SELECT s.doc_id, s.seg_id, s.w, p.plen
          FROM seg s
          JOIN phrase p
            ON p.doc_id = s.doc_id AND p.seg_id = s.seg_id
          WHERE s.w NOT IN {stop}
        ),
        wordstat AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(plen) AS BIGINT) AS deg,
                 CAST((SUM(plen) * 1000000) {div} COUNT(*) AS BIGINT)
                   AS wscore_ppm
          FROM pw GROUP BY w
        ),
        pscore AS (
          SELECT pw.doc_id, pw.seg_id,
                 CAST(SUM(ws.wscore_ppm) AS BIGINT) AS score_ppm
          FROM pw JOIN wordstat ws ON ws.w = pw.w
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS occurrences,
                 CAST(MAX(s.score_ppm) AS BIGINT) AS score_ppm
          FROM phrase p
          JOIN pscore s
            ON s.doc_id = p.doc_id AND s.seg_id = p.seg_id
          GROUP BY p.phrase
        )
        SELECT phrase, occurrences, score_ppm
        FROM ranked
        ORDER BY score_ppm DESC, phrase
        LIMIT 15
"""


@register(
    "text_rake_keyphrases",
    oracle=f"""
        WITH base AS (
          SELECT doc_id, string_split(trim(lower(text)), ' ') AS l
          FROM documents
        ),
        tok AS (
          SELECT doc_id,
                 unnest(generate_series(1, len(l))) AS pos, l
          FROM base
        ),
        tok2 AS (SELECT doc_id, pos, l[pos] AS w FROM tok),
        {_RAKE_BODY.format(
            stop=_RAKE_STOP,
            phrase_expr="string_agg(w, ' ' ORDER BY pos)",
            div="//",
        ).replace("FROM tok", "FROM tok2", 1)}
    """,
    doc="RAKE keyphrase extraction (Rose et al. 2010, integer-scored "
    "variant): candidate phrases are maximal stopword-free token runs "
    "(segment id = running stopword count), each word scores "
    "deg/freq over the phrase corpus — deg = total length of phrases "
    "containing the word, freq = occurrences — quantized to exact ppm "
    "via non-negative floor division BEFORE summing per phrase, so "
    "the whole ranking is integer arithmetic (the documented RAKE "
    "variant; float deg/freq sums would be order-dependent). Top 15 "
    "by (score, phrase). Scale shape: one narrow tokenize, two "
    "bounded aggregates over (doc, segment) and the vocabulary, one "
    "broadcast-size word-score join.",
    tags=("text", "curation"),
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias(
            "pos", "w"
        ),
    ).createOrReplaceTempView("rake_tok")
    return spark.sql(
        "WITH tok AS (SELECT doc_id, pos, w FROM rake_tok), "
        + _RAKE_BODY.format(
            stop=_RAKE_STOP,
            phrase_expr=(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, w))), x -> x.w), ' ')"
            ),
            div="DIV",
        )
    )
