"""Third-session round-10 gate wave: Leiden-style refinement round,
Hamilton-quota sampling applied, and shallow-clone materialization.

Each gate here was driver-sim verified at sf0.001 + 0.01 + 0.1 in a
fresh vanilla-session process (Spark vs the DuckDB oracle) before
registration; the Leiden oracle is bulk-MATERIALIZED (DuckDB inlines
CTEs — the un-materialized recursive-closure chain measured 312s at
sf0.001, 0.1s materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register


# ------------------------------------------ Leiden refinement round --


def _leiden_refine_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql
    from icebergsql_spark.plans.pipeline14 import _q_block_sql

    sql = (
        "WITH RECURSIVE "
        + _EDGE_SQL.replace("WITH ", "", 1)
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
        lab2 AS (
          SELECT n,
                 CAST('0x' || substr(md5(n), 1, 12) AS BIGINT) AS nid,
                 lbl_new AS lbl
          FROM moved1
        ),
        intra AS (
          SELECT la.nid AS ha, lb.nid AS hb, la.lbl
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b AND lb.lbl = la.lbl
        ),
        iedges AS (
          SELECT ha AS src, hb AS dst FROM intra
          UNION ALL SELECT hb, ha FROM intra
          UNION ALL SELECT nid, nid FROM lab2
        ),
        cc(node, comp) AS (
            SELECT DISTINCT src, src FROM iedges
          UNION
            SELECT e2.src, c.comp FROM iedges e2 JOIN cc c
              ON e2.dst = c.node
        ),
        mincomp AS (
          SELECT node, CAST(MIN(comp) AS BIGINT) AS comp
          FROM cc GROUP BY node
        ),
        -- Leiden refinement: every internal component becomes its own
        -- community (labels = the component's min node hash — already
        -- unique across communities because node hashes are unique)
        lab3 AS (
          SELECT lab2.n, mincomp.comp AS lbl
          FROM lab2 JOIN mincomp ON mincomp.node = lab2.nid
        ),
        {_q_block_sql('a', 'lab2', '1_louvain')},
        {_q_block_sql('b', 'lab3', '2_refined')},
        stats AS (
          SELECT
            (SELECT COUNT(DISTINCT lbl) FROM lab2) AS comms_before,
            (SELECT COUNT(DISTINCT lbl) FROM lab3) AS comms_after
        )
        SELECT q.stage, q.m, q.q_num, q.q_denom, q.q,
               CAST(stats.comms_before AS BIGINT) AS comms_before,
               CAST(stats.comms_after AS BIGINT) AS comms_after
        FROM (
          SELECT * FROM qa UNION ALL SELECT * FROM qb
        ) q CROSS JOIN stats
        ORDER BY q.stage
    """
    )
    # DuckDB inlines CTEs: lab2/lab3/qa/qb each re-expand the whole
    # token-edge build AND the recursive cc closure per reference
    # (measured 312s at sf0.001) — materialize everything except the
    # recursive cc member itself.
    return sql.replace(" AS (", " AS MATERIALIZED (").replace(
        "cc(node, comp) AS MATERIALIZED (", "cc(node, comp) AS ("
    )


@register(
    "graph_leiden_refine",
    oracle=_leiden_refine_oracle(),
    doc="Leiden REFINEMENT round (Traag et al. 2019 phase 2, the fix "
    "for graph_community_connectivity's finding): after one "
    "synchronous Louvain round, every internally-DISCONNECTED "
    "community is split into its connected components — each internal "
    "component becomes its own community (label = min node hash of "
    "the component, globally unique) — and Newman Q is scored before "
    "and after on the same graph, plus the community counts. "
    "Splitting a disconnected community can only move the intra-edge "
    "mass it actually keeps, so the refined partition is the honest "
    "one Leiden coarsens next. Oracle chains the round, the "
    "intra-subgraph recursive-CTE closure and two exact-bigint Q "
    "blocks. Scale shape: label joins + CC over intra edges + "
    "community-bounded aggregates.",
    tags=("graph", "dedup", "stats"),
)
def graph_leiden_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from icebergsql_spark.operators import dedup
    from icebergsql_spark.operators.graph import (
        louvain_gain_round,
        modularity_q,
    )
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir).localCheckpoint()
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
    nid = F.conv(F.substring(F.md5("n"), 1, 12), 16, 10).cast("bigint")
    lab2 = (
        louvain_gain_round(half, labels)
        .select("n", F.col("lbl_new").alias("lbl"))
        .withColumn("nid", nid)
        .localCheckpoint()
    )
    la = lab2.select(
        F.col("n").alias("a"), F.col("nid").alias("ha"),
        F.col("lbl").alias("la"),
    )
    lb = lab2.select(
        F.col("n").alias("b"), F.col("nid").alias("hb"),
        F.col("lbl").alias("lb"),
    )
    intra = (
        half.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") == F.col("lb"))
        .select("ha", "hb")
        .localCheckpoint()
    )
    pairs = intra.select(
        F.col("ha").alias("a"), F.col("hb").alias("b")
    ).unionAll(
        lab2.select(F.col("nid").alias("a"), F.col("nid").alias("b"))
    )
    comp = dedup.connected_components(pairs)
    lab3 = lab2.join(
        comp.withColumnRenamed("node", "nid"), "nid"
    ).select("n", F.col("component").alias("lbl")).localCheckpoint()
    stats = (
        lab2.agg(
            F.countDistinct("lbl").cast("bigint").alias("comms_before")
        )
        .crossJoin(
            lab3.agg(
                F.countDistinct("lbl").cast("bigint").alias("comms_after")
            )
        )
    )
    stages = [("1_louvain", lab2.select("n", "lbl")), ("2_refined", lab3)]
    parts = [
        modularity_q(half, lab).select(
            F.lit(name).alias("stage"), "m", "q_num", "q_denom", "q"
        )
        for name, lab in stages
    ]
    return (
        reduce(lambda x, y: x.unionAll(y), parts)
        .crossJoin(F.broadcast(stats))
        .orderBy("stage")
    )


# ------------------------------------------ quota sampling applied --


def _quota_sample_oracle() -> str:
    from icebergsql_spark.plans.pipeline14 import _QUOTA_SQL, _QUOTA_TARGET

    quotas = _QUOTA_SQL.format(target=_QUOTA_TARGET, div="//").replace(
        "SELECT source, c_s, base_quota,", "SELECT source, c_s,"
    )
    # reuse the quota CTE chain, then rank docs per source by md5 and
    # take exactly the quota
    return f"""
        WITH q AS MATERIALIZED (
          SELECT source,
                 CAST(base_quota
                      + CASE WHEN rn <= l THEN 1 ELSE 0 END AS BIGINT)
                   AS quota
          FROM (
            SELECT base.*, leftover.l,
                   row_number() OVER (
                     ORDER BY rem_num DESC, source ASC
                   ) AS rn
            FROM (
              SELECT c.source, c.c_s,
                     CAST(({_QUOTA_TARGET} * c.c_s) // tot.n AS BIGINT)
                       AS base_quota,
                     CAST(({_QUOTA_TARGET} * c.c_s) % tot.n AS BIGINT)
                       AS rem_num
              FROM (
                SELECT source, CAST(COUNT(*) AS BIGINT) AS c_s
                FROM documents GROUP BY source
              ) c
              CROSS JOIN (
                SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
              ) tot
            ) base
            CROSS JOIN (
              SELECT CAST({_QUOTA_TARGET} - SUM(base_quota) AS BIGINT)
                AS l
              FROM (
                SELECT CAST(({_QUOTA_TARGET} * c.c_s) // tot.n AS BIGINT)
                  AS base_quota
                FROM (
                  SELECT source, CAST(COUNT(*) AS BIGINT) AS c_s
                  FROM documents GROUP BY source
                ) c
                CROSS JOIN (
                  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
                ) tot
              ) b2
            ) leftover
          ) ranked
        ),
        ranked_docs AS MATERIALIZED (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('qs:' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC
                 ) AS rk
          FROM documents
        ),
        taken AS (
          SELECT rd.source, rd.doc_id
          FROM ranked_docs rd JOIN q ON q.source = rd.source
          WHERE rd.rk <= q.quota
        )
        SELECT taken.source,
               CAST(COUNT(*) AS BIGINT) AS n_taken,
               q.quota,
               CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        FROM taken JOIN q ON q.source = taken.source
        GROUP BY taken.source, q.quota
        ORDER BY taken.source
    """


@register(
    "curation_quota_sample",
    oracle=_quota_sample_oracle(),
    doc="Hamilton quotas APPLIED (curation_source_quota's second half): "
    "per source, documents are ranked by a seeded md5 (deterministic "
    "pseudo-random order, the reservoir-stratified contract) and "
    "exactly the apportioned quota is taken — emitted per-source "
    "taken counts equal the quotas, which sum to the target exactly, "
    "and the doc-id digest pins the SELECTION not just the size. The "
    "complete proportional-sampling pass a training-mix builder "
    "ships: one source rollup, one per-source rank window, one "
    "broadcast quota join.",
    tags=("curation", "stats"),
)
def curation_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline14 import _QUOTA_SQL, _QUOTA_TARGET

    load_tables(spark, sf_dir, ("documents",))
    quotas = spark.sql(
        _QUOTA_SQL.format(target=_QUOTA_TARGET, div="DIV")
    ).select("source", "quota")
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.concat(F.lit("qs:"), F.col("doc_id").cast("string"))),
            F.col("doc_id"),
        )
    )
    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .select("source", "doc_id")
        .withColumn("rk", rk)
    )
    taken = docs.join(F.broadcast(quotas), "source").filter(
        F.col("rk") <= F.col("quota")
    )
    return (
        taken.groupBy("source", "quota")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_taken"),
            F.sum("doc_id").cast("bigint").alias("doc_id_sum"),
        )
        .select("source", "n_taken", "quota", "doc_id_sum")
        .orderBy("source")
    )


# ------------------------------------------ clone materialization --


@register(
    "managed_clone_materialize",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="Shallow-clone MATERIALIZATION — closing the documented "
    "shared-fate hazard of CREATE TABLE LIKE ... WITH DATA: the clone "
    "initially references the SOURCE's physical files (asserted), so "
    "a compaction ON THE CLONE rewrites them into the clone's own "
    "data dir (every live file asserted under the clone's tree, zero "
    "overlap with the source's files) — after which expire-GC on the "
    "source provably cannot strand the clone: the source is truncated "
    "and expired down to one snapshot WITH GC, and the clone's "
    "per-year rollup still equals the full raw-orders oracle. The "
    "promote-a-fork-to-independent-table runbook, end-to-end.",
    tags=("managed", "import", "lineage"),
)
def managed_clone_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-clmat-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    src = eng.catalog.create_table("ord_cms", ddl, ["o_year"])
    src.insert(orders)
    n_orders = orders.count()
    mark_setup_done()  # source built; clone + materialize is the op
    eng.sql("CREATE TABLE ord_cmc LIKE ord_cms WITH DATA")
    cln = eng.catalog.load_table("ord_cmc")
    src_live = {f.path for f in src.meta.current_snapshot().live_files()}
    assert {
        f.path for f in cln.meta.current_snapshot().live_files()
    } == src_live, "clone must start shared"
    # materialize: compaction rewrites shared bytes into the clone's
    # own tree, dissolving the shared fate (min_input_files=1 so
    # single-file partitions rewrite too — the point is ownership,
    # not packing)
    cln.compact(min_input_files=1)
    cln.refresh()
    cln_live = {f.path for f in cln.meta.current_snapshot().live_files()}
    assert all(p.startswith(cln.meta.data_dir) for p in cln_live), (
        "materialized clone must own its files"
    )
    assert not (cln_live & src_live), "no shared files may remain"
    assert cln.scan().count_from_stats() == n_orders
    # now the hazard is gone: gut the source and GC it
    eng.sql("TRUNCATE TABLE ord_cms")
    src.refresh()
    src.expire_snapshots(retain_last=1)
    cln.refresh()
    assert cln.scan().count_from_stats() == n_orders
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_cmc GROUP BY o_year ORDER BY o_year"
    )
