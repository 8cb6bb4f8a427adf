"""Managed-table operators exposed to the driver's correctness gate.

Each query builds a managed table (fresh temp warehouse per call) from the
driver's lineitem parquet, exercises a snapshot/pruning/time-travel feature,
and returns a result whose DuckDB oracle is computable from the raw parquet
alone — so the gate verifies the managed layer end-to-end: write → snapshot
→ manifest stats → pruned scan → read.

Reference surfaces exercised: snapshotting insert (InsertIntoIcebergTable.
scala:81-330), partition overwrite (:206-250), time travel
(IceParser.scala:108-114 + TableUtils.scala:123-132), manifest/stats pruning
(IceTableScanExec.scala:76-82).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import nonempty, register
from icebergsql_spark.plans.common import money
from icebergsql_spark.table import Catalog

_LI_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz, "
    "l_shipyear int"
)


def _lineitem_with_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.withColumn("l_shipyear", F.year("l_shipdate"))


def _fresh_catalog(spark: SparkSession) -> Catalog:
    return Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-wh-"))


@register(
    "managed_pruned_scan",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE year(l_shipdate) = 1996 AND l_quantity < 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Write lineitem into a managed table partitioned by ship year, scan "
    "with partition + stats predicates (manifest pruning), aggregate.",
    tags=("managed", "pruning"),
)
def managed_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li", _LI_DDL, partition_cols=["l_shipyear"]
    )
    tbl.insert(_lineitem_with_year(spark, sf_dir))
    scan = tbl.scan(where="l_shipyear = 1996 AND l_quantity < 10")
    assert scan.files_scanned < len(tbl.meta.current_snapshot().live_files())
    return (
        scan.dataframe()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "managed_time_travel",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey % 2 = 0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Two snapshots (even keys, then odd); `as of` the first snapshot "
    "returns only the even half — time-travel correctness via the gate.",
    tags=("managed", "time-travel"),
)
def managed_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_tt", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)
    s1 = tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 1)))
    return (
        tbl.to_df(as_of_millis=s1.timestamp_ms)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "managed_sql_scenario",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE year(l_shipdate) = 1996
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="SQL front door end-to-end: managed CTAS via Engine.sql, then a "
    "WHERE-pruned SELECT through the same SQL surface.",
    tags=("managed", "sql"),
)
def managed_sql_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-sqlwh-"))
    _lineitem_with_year(spark, sf_dir).createOrReplaceTempView("lineitem_src")
    eng.sql(
        "CREATE TABLE li_sql USING parquet "
        "OPTIONS (addTableManagement 'true') "
        "PARTITIONED BY (l_shipyear) "
        "AS SELECT * FROM lineitem_src"
    )
    return eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price "
        "FROM li_sql WHERE l_shipyear = 1996 "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


@register(
    "managed_join_pruned",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE year(l_shipdate) = 1996 AND year(o_orderdate) = 1995
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    doc="Two managed tables joined through Engine.sql; per-table WHERE "
    "conjuncts are scoped to their join input and prune each table's file "
    "planning independently (the manifest-level PushDownPredicates).",
    tags=("managed", "pruning", "join"),
)
def managed_join_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-jwh-"))
    cat = eng.catalog
    li_tbl = cat.create_table("li_j", _LI_DDL, partition_cols=["l_shipyear"])
    li_tbl.insert(_lineitem_with_year(spark, sf_dir))
    ord_tbl = cat.create_table(
        "ord_j",
        "o_orderkey bigint, o_orderpriority string, o_orderdate timestamp_ntz, "
        "o_year int",
        partition_cols=["o_year"],
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_orderdate",
        F.year("o_orderdate").alias("o_year"),
    )
    ord_tbl.insert(orders)
    mark_setup_done()  # both fixtures built; the pruned join is the op
    df = eng.sql(
        "SELECT o_orderpriority, COUNT(*) AS n "
        "FROM li_j l JOIN ord_j o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipyear = 1996 AND o.o_year = 1995 "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    )
    # both sides' registered views must be manifest-pruned
    assert len(spark.table("li_j").inputFiles()) < li_tbl.scan().files_scanned
    assert len(spark.table("ord_j").inputFiles()) < ord_tbl.scan().files_scanned
    return df


@register(
    "managed_compaction",
    oracle="""
        SELECT CAST(year(l_shipdate) AS INTEGER) AS l_shipyear,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Three appends accrete small files; compact() bin-packs them into a "
    "'replace' snapshot and expire_snapshots() GCs the old layout — the "
    "post-maintenance scan must still match the raw-parquet oracle.",
    tags=("managed", "maintenance"),
)
def managed_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_cp", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)
    for i in range(3):
        tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == i)))
    mark_setup_done()  # small files accreted; compact + expire is the op
    before = len(tbl.meta.current_snapshot().live_files())
    snap = tbl.compact()
    assert snap is not None and snap.operation == "replace"
    after = len(tbl.meta.current_snapshot().live_files())
    assert after < before
    gc = tbl.expire_snapshots(retain_last=1)
    assert gc["expired_snapshots"] == 3 and gc["deleted_data_files"] > 0
    return (
        tbl.to_df()
        .groupBy("l_shipyear")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("l_shipyear")
    )


@register(
    "managed_clustered_scan",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE l_partkey < 200
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="compact(sort_by=[l_partkey]) clusters each partition's rewrite so "
    "footer min/max stats skip files on a NON-partition column; the pruned "
    "scan must still match the raw-parquet oracle.",
    tags=("managed", "maintenance", "clustering"),
)
def managed_clustered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_cl", _LI_DDL, partition_cols=["l_shipyear"]
    )
    tbl.insert(_lineitem_with_year(spark, sf_dir))
    mark_setup_done()  # fixture built; sorted compact + pruned scan is the op
    files = tbl.meta.current_snapshot().live_files()
    n_parts = len({tuple(f.partition.items()) for f in files})
    target = max(1 << 16, sum(f.file_size for f in files) // (n_parts * 4))
    snap = tbl.compact(sort_by=["l_partkey"], target_file_size=target)
    assert snap is not None and snap.operation == "replace"
    scan = tbl.scan(where="l_partkey < 200")
    total = len(tbl.meta.current_snapshot().live_files())
    # min/max skipping can only bite once partitions split into >1 sorted
    # file (tiny SFs pack to one file per partition — nothing to skip)
    if total > n_parts:
        assert scan.files_scanned < total
    return (
        scan.dataframe()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "managed_incremental_read",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey % 2 = 1
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Incremental append scan (Iceberg-style changes reader): after two "
    "appends, changes(first_snapshot) returns exactly the second append's "
    "rows — the checkpoint-and-read-delta pattern downstream pipelines "
    "use instead of full rescans.",
    tags=("managed", "incremental"),
)
def managed_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_inc", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)
    s1 = tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 1)))
    return (
        tbl.changes(s1.snapshot_id)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@register(
    "managed_metadata_count",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_1996,
               CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_total
        FROM lineitem
        WHERE year(l_shipdate) = 1996
    """,
    doc="COUNT(*) answered from manifest metadata alone (Trino/Iceberg "
    "stats-aggregate): partition-aligned predicate and the bare count both "
    "plan as a driver-local relation (OneRowRelation) — zero data IO — "
    "and must equal the oracle's "
    "scan-computed counts.",
    tags=("managed", "metadata"),
)
def managed_metadata_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-mcwh-"))
    li = _lineitem_with_year(spark, sf_dir)
    tbl = eng.catalog.create_table("li_mc", _LI_DDL, partition_cols=["l_shipyear"])
    tbl.insert(li)
    mark_setup_done()  # fixture built; the metadata count is the operator
    d1 = eng.sql("SELECT count(*) AS n_1996 FROM li_mc WHERE l_shipyear = 1996")
    d2 = eng.sql("SELECT count(*) AS n_total FROM li_mc")
    for d in (d1, d2):
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert (
            "LocalTableScan" in plan
            or "OneRowRelation" in plan
            or "Scan ExistingRDD" in plan
        ), plan
    return d1.crossJoin(d2)


@register(
    "managed_zorder_scan",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_suppkey < 20
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="compact(zorder_by=[l_partkey, l_suppkey]) Morton-clusters the "
    "rewrite; the scan predicates on the NON-leading curve column, which "
    "only interleaved ordering (not a lexicographic sort) can skip files "
    "for, and must match the raw-parquet oracle.",
    tags=("managed", "maintenance", "clustering"),
)
def managed_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_z", _LI_DDL, partition_cols=["l_shipyear"]
    )
    tbl.insert(_lineitem_with_year(spark, sf_dir))
    mark_setup_done()  # fixture built; z-order compact + scan is the op
    files = tbl.meta.current_snapshot().live_files()
    n_parts = len({tuple(f.partition.items()) for f in files})
    target = max(1 << 16, sum(f.file_size for f in files) // (n_parts * 4))
    snap = tbl.compact(zorder_by=["l_partkey", "l_suppkey"], target_file_size=target)
    assert snap is not None and snap.operation == "replace"
    scan = tbl.scan(where="l_suppkey < 20")
    total = len(tbl.meta.current_snapshot().live_files())
    if total > n_parts:
        assert scan.files_scanned < total
    return (
        scan.dataframe()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "managed_partition_evolution",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        WHERE year(l_shipdate) = 1996
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Half the rows written under PARTITIONED BY (l_shipyear), the spec "
    "evolved to (l_returnflag), the other half written under it; a scan "
    "predicated on the OLD partition column must stay exact across the "
    "mixed-spec file set (old files prune by partition tuple, new ones by "
    "footer stats).",
    tags=("managed", "evolution"),
)
def managed_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_ev", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    tbl.alter_partition_spec(["l_returnflag"])
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 1)))
    specs = {
        frozenset(f.partition)
        for f in tbl.meta.current_snapshot().live_files()
    }
    assert frozenset({"l_shipyear"}) in specs and frozenset({"l_returnflag"}) in specs
    return (
        tbl.scan(where="l_shipyear = 1996")
        .dataframe()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "managed_partition_overwrite",
    oracle="""
        SELECT CAST(year(l_shipdate) AS INTEGER) AS l_shipyear, COUNT(*) AS n
        FROM lineitem
        WHERE year(l_shipdate) != 1997 OR l_quantity < 25
        GROUP BY 1
        ORDER BY 1
    """,
    doc="INSERT OVERWRITE PARTITION (year=1997) with a source predicate; "
    "per-year counts reflect the partial rewrite, other partitions intact.",
    tags=("managed", "overwrite"),
)
def managed_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_ow", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(li)
    tbl.insert(
        nonempty(li.filter((F.col("l_shipyear") == 1997) & (F.col("l_quantity") < 25)).drop(
            "l_shipyear"
        )),
        overwrite=True,
        static_partition={"l_shipyear": "1997"},
    )
    return (
        tbl.to_df()
        .groupBy("l_shipyear")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_shipyear")
    )


@register(
    "managed_tagged_travel",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem
        WHERE l_orderkey % 3 = 0
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Snapshot tags: tag the first of three appends, expire everything "
    "retention allows, then read `as of '<tag>'` through Engine.sql — the "
    "tag must survive GC and still resolve to the first third.",
    tags=("managed", "tags", "time-travel"),
)
def managed_tagged_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-tagwh-"))
    cat = eng.catalog
    tbl = cat.create_table("li_tag", _LI_DDL, partition_cols=["l_shipyear"])
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 0)))
    tbl.create_tag("first_third")
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 1)))
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 2)))
    mark_setup_done()  # history built; expire + tagged travel is the op
    gc = tbl.expire_snapshots(retain_last=1)
    assert gc["expired_snapshots"] == 1  # middle snapshot; tag pins first
    return eng.sql(
        "as of 'first_third' "
        "SELECT l_returnflag, COUNT(*) AS n FROM li_tag "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )


@register(
    "managed_branch_wap",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Write-audit-publish through the SQL surface: stage the odd half on "
    "a branch (main pointer untouched), audit it via `as of '<branch>'`, "
    "FAST FORWARD to publish; the published table must equal full lineitem.",
    tags=("managed", "branches", "sql"),
)
def managed_branch_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-wapwh-"))
    tbl = eng.catalog.create_table("li_wap", _LI_DDL, partition_cols=["l_shipyear"])
    li = _lineitem_with_year(spark, sf_dir)
    s1 = tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    eng.sql("ALTER TABLE li_wap CREATE BRANCH audit")
    li.filter(F.col("l_orderkey") % 2 == 1).createOrReplaceTempView("li_wap_src")
    eng.sql("INSERT INTO li_wap BRANCH audit SELECT * FROM li_wap_src")
    # audit: main is still the pre-branch snapshot; the branch sees both.
    # Both sides of the audit come from manifest record counts — the gate
    # query stays action-free (no mid-plan .collect()); at scale this is a
    # metadata lookup, not a job.
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == s1.snapshot_id
    branch_snap = tbl.meta.snapshot_by_id(
        tbl.meta.refs["audit"]["snapshot_id"]
    )
    staged = sum(f.record_count for f in branch_snap.live_files())
    main_n = sum(f.record_count for f in tbl.meta.current_snapshot().live_files())
    assert staged > main_n
    eng.sql("ALTER TABLE li_wap FAST FORWARD audit")
    return eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty "
        "FROM li_wap GROUP BY l_returnflag ORDER BY l_returnflag"
    )


@register(
    "managed_schema_evolution",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price,
               CAST(SUM(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_era,
               CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Schema evolution end-to-end through SQL DDL: rename + widen + add "
    "over the even half, insert the odd half under the new schema, and "
    "aggregate across both file eras — renamed columns must surface old "
    "files' data, the added column NULL-backfills, the widened int sums "
    "as bigint. Metadata-only; no file is rewritten.",
    tags=("managed", "schema-evolution", "sql"),
)
def managed_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-evwh-"))
    tbl = eng.catalog.create_table(
        "li_ev",
        "l_orderkey bigint, l_linenumber int, l_extendedprice double, "
        "l_returnflag string, l_shipyear int",
        partition_cols=["l_shipyear"],
    )
    li = _lineitem_with_year(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag", "l_shipyear"
    )
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    eng.sql("ALTER TABLE li_ev RENAME COLUMN l_extendedprice TO price")
    eng.sql("ALTER TABLE li_ev ALTER COLUMN l_linenumber TYPE BIGINT")
    eng.sql("ALTER TABLE li_ev ADD COLUMN era STRING")
    tbl.insert(
        nonempty(li.filter(F.col("l_orderkey") % 2 == 1)
        .withColumnRenamed("l_extendedprice", "price")
        .withColumn("era", F.lit("v2"))))
    return eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(price AS DECIMAL(14,2))) AS DOUBLE) AS sum_price, "
        "COUNT(era) AS n_era, SUM(l_linenumber) AS sum_ln "
        "FROM li_ev GROUP BY l_returnflag ORDER BY l_returnflag"
    )


@register(
    "managed_incremental_rollup",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Incremental view maintenance over the managed table: a per-flag "
    "count/revenue rollup is seeded from the first snapshot's scan, then "
    "MAINTAINED by folding in only changes(since) deltas for the next two "
    "appends (partial-aggregate union + re-aggregate — counts and integer "
    "cents merge exactly). The maintained rollup must equal the oracle's "
    "full recompute; at 100 TB this is how downstream marts track an "
    "append-only fact table without rescans.",
    tags=("managed", "incremental", "ivm"),
)
def managed_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_ivm", _LI_DDL, partition_cols=["l_shipyear"]
    )
    li = _lineitem_with_year(spark, sf_dir)

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")).alias(
                "revenue_cents"
            ),
        )

    s1 = tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 0)))
    maintained = rollup(tbl.scan().dataframe())  # seed from snapshot 1

    s2 = tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 1)))
    maintained = maintained.union(rollup(tbl.changes(s1.snapshot_id, s2.snapshot_id)))

    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 2)))
    maintained = maintained.union(rollup(tbl.changes(s2.snapshot_id)))

    # merge of partial aggregates: counts and integer cents add exactly
    return (
        maintained.groupBy("l_returnflag")
        .agg(F.sum("n").alias("n"), F.sum("revenue_cents").alias("revenue_cents"))
        .orderBy("l_returnflag")
    )


@register(
    "managed_merge_upsert",
    oracle="""
        WITH base AS (
          SELECT l_orderkey AS ok, MIN(l_returnflag) AS rf,
                 CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS qty,
                 CAST(MIN(year(l_shipdate)) AS INT) AS yr
          FROM lineitem GROUP BY l_orderkey
        ),
        final AS (
          SELECT rf, CASE WHEN ok % 2 = 0 THEN qty * 2 ELSE qty END AS q
          FROM base WHERE ok % 4 IN (0, 1, 2)
        )
        SELECT rf, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(q AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        FROM final GROUP BY rf ORDER BY rf
    """,
    doc="MERGE INTO end-to-end (copy-on-write CDC upsert, table.py:merge) "
    "over a per-order rollup keyed by l_orderkey: seed the %4 in (0,1) "
    "half, MERGE a doubled-quantity source covering %2=0 — %4=0 rows must "
    "be UPDATED in place, %4=2 rows INSERTED, %4=1 rows left untouched. "
    "Affected files come from a column-pruned key equi-join; only they "
    "are rewritten. The aggregate proves all three row classes landed.",
    tags=("managed", "dml", "sql"),
)
def managed_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-mergewh-"))
    tbl = eng.catalog.create_table(
        "li_mg", "ok bigint, rf string, qty double, yr int",
        partition_cols=["yr"],
    )
    base = (
        _lineitem_with_year(spark, sf_dir)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.min("l_returnflag").alias("rf"),
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                .cast("double")
                / 100.0
            ).alias("qty"),
            F.min("l_shipyear").cast("int").alias("yr"),
        )
    )
    tbl.insert(nonempty(base.filter(F.col("ok") % 4 <= 1)))
    mark_setup_done()  # seed built; the MERGE is the operator under test
    base.filter(F.col("ok") % 2 == 0).withColumn(
        "qty", F.col("qty") * 2
    ).createOrReplaceTempView("li_mg_src")
    eng.sql(
        "MERGE INTO li_mg t USING li_mg_src s ON t.ok = s.ok "
        "WHEN MATCHED THEN UPDATE SET qty = s.qty "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    return eng.sql(
        "SELECT rf, COUNT(*) AS n, "
        "CAST(SUM(CAST(qty AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty "
        "FROM li_mg GROUP BY rf ORDER BY rf"
    )


@register(
    "managed_delete_update",
    oracle="""
        WITH final AS (
          SELECT l_returnflag,
                 l_quantity,
                 CASE WHEN l_returnflag = 'R' THEN 0.0 ELSE l_discount END
                   AS d
          FROM lineitem
          WHERE l_orderkey % 2 = 0
            AND year(l_shipdate) <> 1997
            AND l_quantity >= 10
        )
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_qty,
               CAST(SUM(CAST(d AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc
        FROM final GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="DELETE + UPDATE end-to-end (copy-on-write, table.py:delete_where/"
    "update_where): a partition-aligned DELETE (l_shipyear=1997) drops "
    "whole files from metadata with zero data IO, a straddling DELETE "
    "(l_quantity<10) rewrites only files whose stats admit a match, and "
    "an UPDATE zeroes discounts on 'R' rows in place. The final aggregate "
    "proves precision: untouched rows identical, affected rows exact.",
    tags=("managed", "dml", "sql"),
)
def managed_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-dmlwh-"))
    tbl = eng.catalog.create_table("li_dml", _LI_DDL, partition_cols=["l_shipyear"])
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 2 == 0)))
    mark_setup_done()  # seed built; DELETE/UPDATE DML is the op
    # partition-aligned: whole-file metadata drop (assert no rewrite)
    s1 = tbl.delete_where("l_shipyear = 1997")
    assert s1.num_added_files == 0
    eng.sql("DELETE FROM li_dml WHERE l_quantity < 10")
    eng.sql("UPDATE li_dml SET l_discount = 0.0 WHERE l_returnflag = 'R'")
    return eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty, "
        "CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc "
        "FROM li_dml GROUP BY l_returnflag ORDER BY l_returnflag"
    )


@register(
    "managed_streaming_upsert",
    oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                 / 100.0 AS total_value,
               CAST(MAX(epoch_ns(ts)) AS BIGINT) AS last_ts
        FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Streaming MERGE upsert end-to-end (streaming/ingest.py:"
    "ManagedTableUpsertWriter): the events stream arrives in three "
    "micro-batches (file source, maxFilesPerTrigger=1, availableNow); "
    "each batch is pre-aggregated to one partial row per user and "
    "MERGE'd into a bucket-partitioned managed mart with ACCUMULATING "
    "update expressions (t.n + s.n / greatest(last_ts)), so the final "
    "state equals the batch-independent aggregate the oracle computes "
    "directly — the replay-convergence property a recovered stream "
    "needs. Beyond-reference: the reference's streaming story stops at "
    "INSERT (InsertIntoIcebergTable.scala:81-330); this composes the "
    "copy-on-write MERGE primitive (table.py:merge) under foreachBatch "
    "with exactly-once batch markers.",
    tags=("managed", "streaming", "dml"),
)
def managed_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos
    from icebergsql_spark.sql import Engine
    from icebergsql_spark.streaming.ingest import ManagedTableUpsertWriter

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # stage the stream source: three parquet splits -> three micro-batches
    src_dir = tempfile.mkdtemp(prefix="icebergsql-upsrc-")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-upwh-"))
    tbl = eng.catalog.create_table(
        "ev_upsert",
        "user_id bigint, ub int, n bigint, cents bigint, last_ts bigint",
        partition_cols=["ub"],
    )

    def prepare(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("bigint")).alias(
                    "cents"
                ),
                F.max("ts").alias("last_ts"),
            )
            .select(
                "user_id",
                (F.col("user_id") % 8).cast("int").alias("ub"),
                "n",
                "cents",
                "last_ts",
            )
        )

    mark_setup_done()  # source staged + mart created; the stream is the op
    writer = ManagedTableUpsertWriter(
        tbl,
        keys=["user_id"],
        prepare=prepare,
        set_exprs={
            "n": "t.n + s.n",
            "cents": "t.cents + s.cents",
            "last_ts": "greatest(t.last_ts, s.last_ts)",
        },
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = writer.attach(stream, tempfile.mkdtemp(prefix="icebergsql-upck-"))
    q.awaitTermination()
    return eng.sql(
        "SELECT user_id, n, CAST(cents AS DOUBLE) / 100.0 AS total_value, "
        "last_ts FROM ev_upsert ORDER BY user_id"
    )


@register(
    "managed_snapshot_diff",
    oracle="""
        WITH base AS (
          SELECT l_orderkey AS ok,
                 CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS qty
          FROM lineitem GROUP BY l_orderkey
        ),
        classes AS (
          SELECT 'insert' AS _change_type, qty * 2 AS q
          FROM base WHERE ok % 4 = 2
          UNION ALL
          SELECT 'update_preimage', qty FROM base WHERE ok % 4 = 0
          UNION ALL
          SELECT 'update_postimage', qty * 2 FROM base WHERE ok % 4 = 0
          UNION ALL
          SELECT 'delete', qty FROM base WHERE ok % 8 = 1
        )
        SELECT _change_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(q AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
        FROM classes GROUP BY _change_type ORDER BY _change_type
    """,
    doc="Row-level CDC between snapshots (table.py:diff): seed a per-order "
    "rollup, MERGE a doubled-quantity source (updates %4=0, inserts %4=2), "
    "DELETE %8=1, then diff(seed -> current) keyed by ok. The changelog "
    "must contain exactly the four change classes with exact payloads — "
    "and nothing for rows that were merely rewritten into new files by "
    "copy-on-write (co-located but untouched rows must NOT appear). "
    "File-level short-circuit: snapshots' common files are skipped, so "
    "diff IO is proportional to churn, not table size — the property that "
    "makes state-diff CDC viable on a 100 TB table. Beyond-reference "
    "(Iceberg changelog-scan parity; the reference stops at $snapshots "
    "introspection, utils/TableUtils.scala:48-103).",
    tags=("managed", "dml", "cdc"),
)
def managed_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-diffwh-"))
    tbl = eng.catalog.create_table(
        "li_cdc", "ok bigint, qty double, okb int", partition_cols=["okb"]
    )
    base = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            (
                F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
                .cast("double")
                / 100.0
            ).alias("qty")
        )
        .select("ok", "qty", (F.col("ok") % 4).cast("int").alias("okb"))
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("ok") % 4 <= 1)))
    mark_setup_done()  # seed built; MERGE/DELETE + diff() is the op
    base.filter(F.col("ok") % 2 == 0).withColumn(
        "qty", F.col("qty") * 2
    ).createOrReplaceTempView("li_cdc_src")
    eng.sql(
        "MERGE INTO li_cdc t USING li_cdc_src s ON t.ok = s.ok "
        "WHEN MATCHED THEN UPDATE SET qty = s.qty "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    eng.sql("DELETE FROM li_cdc WHERE ok % 8 = 1")
    changes = tbl.diff(s1.snapshot_id, key_cols=["ok"])
    return (
        changes.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("qty").cast("decimal(14,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("_change_type")
    )


@register(
    "managed_bloom_scan",
    oracle="""
        SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_qty
        FROM lineitem WHERE l_orderkey IN (1, 2, 32)
        GROUP BY l_orderkey ORDER BY l_orderkey
    """,
    doc="Per-file Bloom-filter skipping end-to-end (catalog/stats.py:"
    "collect_blooms + expressions.py:_bloom_admits): lineitem written "
    "hash-distributed by l_orderkey into a table with "
    "bloom.filter.columns=l_orderkey, then an IN-list point lookup must "
    "plan at most |IN| files (the blooms separate files whose min/max "
    "ranges all overlap) while returning exactly the oracle's rows. "
    "This is the needle-in-haystack shape where range stats are useless "
    "— at 100 TB the difference between scanning 3 files and 10,000. "
    "Beyond-reference (min/max + partition pruning only, "
    "IceTableScanExec.scala:76-82); follows the Iceberg-spec/Delta "
    "file-level bloom design.",
    tags=("managed", "pruning", "bloom"),
)
def managed_bloom_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _fresh_catalog(spark).create_table(
        "li_bloom",
        _LI_DDL,
        partition_cols=["l_shipyear"],
        properties={"bloom.filter.columns": "l_orderkey"},
    )
    tbl.insert(
        _lineitem_with_year(spark, sf_dir), distribute_by=["l_orderkey"]
    )
    mark_setup_done()  # fixture built; the bloom-pruned point scan is the op
    scan = tbl.scan(where="l_orderkey IN (1, 2, 32)")
    live = len(tbl.meta.current_snapshot().live_files())
    # bloom pruning must beat min/max: at most one file per probed key per
    # partition that truly contains it (false positives permitted but the
    # hash-distributed layout makes them vanishingly unlikely to add many)
    assert scan.files_scanned < live, (scan.files_scanned, live)
    return (
        scan.dataframe()
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .orderBy("l_orderkey")
    )
