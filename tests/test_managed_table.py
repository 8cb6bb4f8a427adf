"""End-to-end replay of the reference's golden scenario on managed tables.

Mirrors BasicCreateAndInsertTest.scala:131-202 ("test1") and the README
walkthrough (/root/reference/README.md:104-362), with our engine's
snapshot/pruning surface instead of plan reflection:

  insert → 2109 rows / +30 files ▸ filtered count 236 with derived
  ss_sold_month='09' ▸ 2nd insert → 4218 ▸ as-of → 2109 ▸ full overwrite
  +30/−60 → 2109 ▸ single-partition overwrite +5/−5 → 2109 ▸ predicated
  partition overwrite → 1877 ▸ as-of still 2109 ▸ inverted predicate scans
  0 files (NullScan).
"""

from __future__ import annotations

import pytest

from icebergsql_spark.catalog.metadata import CommitConflict, TableMetadata
from icebergsql_spark.expressions import Comparison
from icebergsql_spark.table import Catalog, TableValidationError
from tests.store_sales_fixture import (
    COLUMN_DEPENDENCIES,
    SCHEMA_DDL,
    build_store_sales_df,
)


@pytest.fixture(scope="module")
def src(spark):
    df = build_store_sales_df(spark)
    df.cache()
    assert df.count() == 2109
    return df


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _pred_leaves(p):
    out = []
    stack = [p]
    while stack:
        node = stack.pop()
        if hasattr(node, "left"):
            stack.extend([node.left, node.right])
        elif hasattr(node, "child"):
            stack.append(node.child)
        else:
            out.append(node)
    return out


def test_reference_golden_scenario(spark, catalog, src):
    tbl = catalog.create_table(
        "store_sales_out",
        SCHEMA_DDL,
        partition_cols=["ss_sold_date_sk"],
        properties={"columnDependencies": COLUMN_DEPENDENCIES},
    )

    # --- 1st insert: +30 files, 2109 rows (README.md:138-158)
    s1 = tbl.insert(src)
    assert (s1.num_added_files, s1.num_deleted_files) == (30, 0)
    assert tbl.to_df().count() == 2109

    # --- filtered scan: 236 rows, 5 files, derived month predicate
    # (README.md:160-180; plan assertion parity with
    # BasicCreateAndInsertTest.scala:150-155)
    scan = tbl.scan(where="ss_sold_date_sk = '0906245'")
    assert scan.files_scanned == 5
    assert scan.dataframe().count() == 236
    assert Comparison("=", "ss_sold_month", "09") in _pred_leaves(scan.augmented)
    assert Comparison("=", "ss_sold_day", "0906") in _pred_leaves(scan.augmented)

    # --- 2nd insert: append → 4218 (README.md:182-210)
    s2 = tbl.insert(src)
    assert s2.operation == "append" and s2.parent_id == s1.snapshot_id
    assert tbl.to_df().count() == 4218

    # --- time travel to first insert → 2109 (README.md:212-224)
    assert tbl.to_df(as_of_millis=s1.timestamp_ms).count() == 2109

    # --- full insert overwrite: +30 / −60, back to 2109 (README.md:226-257)
    s3 = tbl.insert(src, overwrite=True)
    assert (s3.num_added_files, s3.num_deleted_files) == (30, 60)
    assert s3.operation == "overwrite"
    assert tbl.to_df().count() == 2109

    # --- single-partition overwrite: +5 / −5, still 2109 (README.md:259-296)
    part_src = src.filter("ss_sold_date_sk = '0906245'").drop("ss_sold_date_sk")
    s4 = tbl.insert(
        part_src, overwrite=True, static_partition={"ss_sold_date_sk": "0906245"}
    )
    assert (s4.num_added_files, s4.num_deleted_files) == (5, 5)
    assert tbl.to_df().count() == 2109

    # --- predicated partition overwrite → 1877 (README.md:298-337)
    pred_src = src.filter(
        "ss_sold_date_sk = '0905245' AND ss_item_sk < 5000"
    ).drop("ss_sold_date_sk")
    s5 = tbl.insert(
        pred_src, overwrite=True, static_partition={"ss_sold_date_sk": "0905245"}
    )
    assert (s5.num_added_files, s5.num_deleted_files) == (5, 5)
    assert tbl.to_df().count() == 1877

    # --- time travel still exact after overwrites (README.md:339-351)
    assert tbl.to_df(as_of_millis=s1.timestamp_ms).count() == 2109

    # --- NullScan: inverted predicate prunes to 0 files via parquet min/max
    # (README.md:353-362, BasicCreateAndInsertTest.scala:186-189)
    null_scan = tbl.scan(where="ss_item_sk > 5000 AND ss_sold_date_sk = '0905245'")
    assert null_scan.files_scanned == 0
    assert null_scan.dataframe().count() == 0

    # --- $snapshots legacy view schema incl. the numdDeletedFiles typo
    snaps = tbl.snapshots_df()
    assert snaps.columns == [
        "id", "parentId", "timeMillis", "numAddedFiles",
        "numdDeletedFiles", "manifestListLocation", "schemaId",
    ]
    rows = {r["id"]: r for r in snaps.collect()}
    assert rows[s1.snapshot_id]["parentId"] == -1
    assert rows[s3.snapshot_id]["numdDeletedFiles"] == 60
    assert len(rows) == 5
    # schemaId records the schema era in effect at commit time
    assert all(r["schemaId"] == 0 for r in rows.values())


def test_data_column_stats_pruning(spark, catalog, src):
    """Pruning on a non-partition data column via parquet min/max stats:
    ss_sold_day is constant per partition, so 5 of 30 files survive."""
    tbl = catalog.create_table(
        "store_sales_stats", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl.insert(src)
    scan = tbl.scan(where="ss_sold_day = '0907'")
    assert scan.files_scanned == 5
    assert scan.dataframe().count() == 380


def test_dynamic_partition_overwrite(spark, catalog, src):
    tbl = catalog.create_table(
        "store_sales_dyn", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl.insert(src)
    two_parts = src.filter("ss_sold_date_sk IN ('0905245','0906245')")
    s = tbl.insert(two_parts, overwrite=True, dynamic=True)
    # only the two written partitions were replaced
    assert s.num_deleted_files == 10 and s.num_added_files == 10
    assert tbl.to_df().count() == 2109


def test_validations(spark, catalog, src):
    with pytest.raises(TableValidationError, match="must be partitioned"):
        catalog.create_table("bad1", SCHEMA_DDL, partition_cols=[])
    with pytest.raises(TableValidationError, match="not in schema"):
        catalog.create_table("bad2", SCHEMA_DDL, partition_cols=["nope"])
    with pytest.raises(Exception, match="unknown source column"):
        catalog.create_table(
            "bad3", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"],
            properties={"columnDependencies": "nope=ss_sold_month:truncate[2]"},
        )
    tbl = catalog.create_table("ok", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"])
    with pytest.raises(TableValidationError, match="already exists"):
        catalog.create_table("ok", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"])
    with pytest.raises(TableValidationError, match="missing columns"):
        tbl.insert(src.drop("ss_item_sk"))
    with pytest.raises(TableValidationError, match="not a partition column"):
        tbl.insert(src, overwrite=True, static_partition={"ss_item_sk": "1"})


def test_scan_by_snapshot_id(spark, catalog, src):
    tbl = catalog.create_table(
        "by_id", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    s1 = tbl.insert(src.limit(40))
    s2 = tbl.insert(src.limit(25))
    assert tbl.to_df(snapshot_id=s1.snapshot_id).count() == 40
    assert tbl.to_df(snapshot_id=s2.snapshot_id).count() == 65
    with pytest.raises(ValueError, match="unknown snapshot"):
        tbl.scan(snapshot_id=999)


def test_append_reuses_parent_manifests(spark, catalog, src):
    """Appends must reference the parent's manifest files unchanged (commit
    cost O(new files), the Iceberg manifest-reuse model)."""
    tbl = catalog.create_table(
        "reuse", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    s1 = tbl.insert(src.limit(100))
    s2 = tbl.insert(src.limit(50))
    s3 = tbl.insert(src.limit(20))
    m1, m2, m3 = (set(s.manifest_paths) for s in (s1, s2, s3))
    assert m1 < m2 < m3  # strictly growing by ONE new manifest each
    assert len(m2 - m1) == 1 and len(m3 - m2) == 1


def test_commit_conflict(spark, catalog, src):
    tbl = catalog.create_table(
        "conflict", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl.insert(src.limit(50))
    # stale writer: loaded metadata at v2, another commit lands first
    stale = TableMetadata.load(tbl.meta.location)
    tbl.insert(src.limit(10))
    stale.snapshots = list(stale.snapshots)
    with pytest.raises(CommitConflict):
        stale.commit()


def test_overwrite_conflict_cleans_up_written_files(spark, catalog, src):
    """A conflicted OVERWRITE surfaces the error AND removes the files it
    wrote (cleanup-on-failure, SparkTableOperations.scala:120-149)."""
    import os

    tbl_a = catalog.create_table(
        "race_ow", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl_a.insert(src.limit(30))
    tbl_b = catalog.load_table("race_ow")

    real_refresh = tbl_a.refresh
    state = {"stale": 1}

    def fake_refresh():
        if state["stale"]:
            state["stale"] -= 1
            return tbl_a
        return real_refresh()

    tbl_a.refresh = fake_refresh
    tbl_b.insert(src.limit(20))
    data_dirs_before = set(os.listdir(tbl_a.meta.data_dir))
    with pytest.raises(CommitConflict):
        tbl_a.insert(src.limit(10), overwrite=True)
    tbl_a.refresh = real_refresh
    # the failed overwrite's data directory was removed
    assert set(os.listdir(tbl_a.meta.data_dir)) == data_dirs_before
    tbl_a.refresh()
    assert tbl_a.to_df().count() == 50  # both appends intact, no overwrite


def test_append_commit_retry_rebases(spark, catalog, src):
    """A racing append rebases onto the winner's snapshot instead of failing
    (the reference's optimistic retry, SparkTableOperations.scala:91-149)."""
    tbl_a = catalog.create_table(
        "race", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl_a.insert(src.limit(30))
    tbl_b = catalog.load_table("race")

    # freeze A's view of the metadata for ONE refresh (the race window),
    # while B commits underneath
    real_refresh = tbl_a.refresh
    state = {"stale_calls": 1}

    def fake_refresh():
        if state["stale_calls"] > 0:
            state["stale_calls"] -= 1
            return tbl_a
        return real_refresh()

    tbl_a.refresh = fake_refresh
    tbl_b.insert(src.limit(20))  # the winner
    snap = tbl_a.insert(src.limit(10))  # stale base → conflict → rebase
    tbl_a.refresh = real_refresh

    tbl_a.refresh()
    assert tbl_a.meta.current_snapshot_id == snap.snapshot_id
    assert len(tbl_a.meta.snapshots) == 3
    assert tbl_a.to_df().count() == 60
    # the rebased snapshot chains onto the winner, not the stale parent
    ids = {s.snapshot_id: s for s in tbl_a.meta.snapshots}
    assert ids[snap.snapshot_id].parent_id == tbl_b.meta.current_snapshot_id


def test_empty_append_retry_does_not_duplicate_manifests(spark, catalog, src):
    """ADVICE.md regression: an EMPTY append that hits a commit conflict must
    rebase with no new manifest — rebasing with manifest_paths[-1:] used to
    re-append the stale parent's last manifest, double-counting its rows."""
    tbl_a = catalog.create_table(
        "race_empty", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"]
    )
    tbl_a.insert(src.limit(30))
    tbl_b = catalog.load_table("race_empty")

    real_refresh = tbl_a.refresh
    state = {"stale_calls": 1}

    def fake_refresh():
        if state["stale_calls"] > 0:
            state["stale_calls"] -= 1
            return tbl_a
        return real_refresh()

    tbl_a.refresh = fake_refresh
    tbl_b.insert(src.limit(20))  # the winner
    snap = tbl_a.insert(src.limit(0))  # empty append on a stale base
    tbl_a.refresh = real_refresh

    tbl_a.refresh()
    assert tbl_a.meta.current_snapshot_id == snap.snapshot_id
    cur = tbl_a.meta.current_snapshot()
    assert len(cur.manifest_paths) == len(set(cur.manifest_paths))
    assert tbl_a.to_df().count() == 50  # 30 + 20 + 0, not 70


def test_delete_files_metadata_view(spark, tmp_path):
    """`t$delete_files` (Iceberg delete_files metadata table): one row
    per position-delete vector and equality-delete rowset of the current
    snapshot; maintenance folds drain it."""
    import pyspark.sql.functions as F
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_delf"))
    eng.sql(
        "CREATE TABLE tdf (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        (F.col("id") % 2).cast("int").alias("part"),
    ).createOrReplaceTempView("tdf_src")
    eng.sql("INSERT INTO tdf SELECT * FROM tdf_src")
    t = eng.catalog.load_table("tdf")
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.delete_where("k < 10")                       # -> position DVs
    t.delete_by_keys(
        spark.createDataFrame([(50,), (51,)], "k bigint"), ["k"]
    )                                              # -> equality deletes

    rows = eng.sql(
        "SELECT content, referenced_data_file, equality_ids, record_count, "
        "sequence_number FROM `tdf$delete_files` ORDER BY content"
    ).collect()
    by_content = {}
    for r in rows:
        by_content.setdefault(r["content"], []).append(r)
    dvs = by_content["position_deletes"]
    eqs = by_content["equality_deletes"]
    # files FULLY covered by the predicate are metadata-dropped, not
    # DV-masked — only boundary files carry DVs, so the DV total is
    # 1..10 depending on file layout; live_row_count checks the rest
    assert 1 <= sum(r["record_count"] for r in dvs) <= 10
    assert all(r["referenced_data_file"] for r in dvs)
    assert sum(r["record_count"] for r in eqs) == 2
    assert eqs[0]["equality_ids"] == "k" and eqs[0]["sequence_number"] >= 1
    assert t.live_row_count() == 88

    # converting + rewriting folds ALL delete debris out of the view
    t.convert_equality_deletes()
    t.rewrite_position_deletes()
    assert eng.sql("SELECT COUNT(*) AS n FROM `tdf$delete_files`").collect()[0][
        "n"
    ] == 0
    assert t.live_row_count() == 88
