"""Merge-on-read DELETE via position delete vectors (Iceberg v2 MoR).

With ``write.delete.mode = 'merge-on-read'``, a DELETE whose predicate
straddles files records the MATCHING row positions as a delete vector
(parquet (path, pos) rowset + per-file counts in a DV manifest) instead of
rewriting the files — write cost ∝ deleted rows. Scans anti-join the DV
rowset; ``rewrite_position_deletes`` folds DVs back into the layout as a
rowset-preserving 'replace'. The reference delegates row-level deletes to
the Iceberg format spec (v2 position deletes); this re-expresses that
contract on the pure-Python snapshot layer with Spark's
``_metadata.file_path`` / ``_metadata.row_index`` as the row coordinates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from icebergsql_spark.table import Catalog, TableValidationError

DDL = "k bigint, v double, cat string, part int"


@pytest.fixture()
def tbl(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "t",
        DDL,
        partition_cols=["part"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    src = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("cat"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    t.insert(src)
    return t


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mor_delete_writes_no_data_files(spark, tbl):
    """A straddling MoR DELETE adds zero data files, drops zero data
    files, and leaves the live file set untouched — only a DV appears."""
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.delete_where("k % 10 = 3")
    assert snap.operation == "delete"
    assert snap.num_added_files == 0
    assert snap.num_deleted_files == 0
    assert {f.path for f in snap.live_files()} == before
    assert snap.dv_manifest_paths
    assert sum(e.count for e in snap.dv_entries()) == 30
    assert tbl.to_df().count() == 270
    assert rows(tbl.to_df().filter("k % 10 = 3")) == []


def test_mor_partition_aligned_still_metadata_only(spark, tbl):
    """must_match_all files are DROPPED without a DV even in MoR mode —
    the metadata-only fast path wins when it applies."""
    snap = tbl.delete_where("part = 1")
    assert snap.num_added_files == 0
    assert snap.num_deleted_files > 0
    assert not snap.dv_manifest_paths
    assert tbl.to_df().filter("part = 1").count() == 0


def test_mor_counts_exact_and_overlapping_deletes_additive(spark, tbl):
    """count_from_stats subtracts DV counts exactly; re-deleting already-
    deleted rows adds nothing (positions are de-duplicated at write)."""
    tbl.delete_where("k % 10 = 3")
    assert tbl.scan().count_from_stats() == 270
    tbl.delete_where("k % 5 = 3")  # k%10 in {3,8}: the 3s are already gone
    assert tbl.to_df().count() == 240
    assert tbl.scan().count_from_stats() == 240
    # predicate-scoped metadata count on a DV'd partition-aligned slice
    assert tbl.scan(where="part = 2").count_from_stats() == (
        tbl.to_df().filter("part = 2").count()
    )


def test_mor_time_travel_and_diff(spark, tbl):
    """Pre-delete snapshots still see all rows; diff() across a DV-only
    commit reports the deleted rows (common files, changed DV sets)."""
    s0 = tbl.meta.current_snapshot()
    tbl.delete_where("k < 30 AND k % 2 = 0")
    assert tbl.to_df(snapshot_id=s0.snapshot_id).count() == 300
    d = tbl.diff(s0.snapshot_id)
    got = d.groupBy("_change_type").count().collect()
    by_type = {r["_change_type"]: r["count"] for r in got}
    assert by_type.get("delete") == 15
    assert "insert" not in by_type


def test_mor_update_and_merge_on_dvd_table(spark, tbl):
    """UPDATE/MERGE read LIVE rows (no resurrect) and a MoR-deleted key
    can be re-inserted by MERGE."""
    tbl.delete_where("k = 7")
    tbl.update_where({"v": "v + 1000"}, "k = 8")
    assert tbl.to_df().filter("k = 7").count() == 0  # rewrite didn't resurrect
    assert tbl.to_df().filter("k = 8").collect()[0]["v"] == 1008.0
    src = spark.createDataFrame([(7, -1.0, "odd", 1)], DDL)
    tbl.merge(src, on=["k"], when_matched="update", when_not_matched_insert=True)
    assert rows(tbl.to_df().filter("k = 7").select("v")) == [(-1.0,)]


def test_rewrite_position_deletes_preserves_rows(spark, tbl):
    """rewrite_position_deletes: same live rowset, DVs retired, commit is
    a 'replace'; a fully-DV'd file vanishes."""
    tbl.delete_where("k % 3 = 1")
    expect = rows(tbl.to_df())
    snap = tbl.rewrite_position_deletes()
    assert snap.operation == "replace"
    assert not snap.dv_manifest_paths
    assert rows(tbl.to_df()) == expect
    assert tbl.scan().count_from_stats() == len(expect)
    # idempotent: nothing left to rewrite
    assert tbl.rewrite_position_deletes() is None


def test_compaction_retires_dvs(spark, tbl):
    """compact() reads live rows and its rewrite retires the inputs' DV
    entries — deleted rows do not resurrect through bin-packing."""
    tbl.delete_where("k % 10 = 9")
    expect = rows(tbl.to_df())
    snap = tbl.compact(min_input_files=2)
    assert snap is not None
    assert rows(tbl.to_df()) == expect
    assert not tbl.meta.current_snapshot().dv_manifest_paths


def test_mor_requires_parquet(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh_orc"))
    t = cat.create_table(
        "t_orc",
        "k bigint, part int",
        partition_cols=["part"],
        properties={"write.delete.mode": "merge-on-read"},
        file_format="orc",
    )
    t.insert(
        spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
        )
    )
    with pytest.raises(TableValidationError, match="merge-on-read"):
        t.delete_where("k = 3")


def test_mor_sql_route(spark, tmp_path):
    """DELETE FROM via the SQL front door honors the table property, and
    `$files` exposes per-file position_delete counts."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, warehouse=str(tmp_path / "wh_sql"))
    eng.sql(
        "CREATE TABLE tm (k BIGINT, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    eng.sql(
        "ALTER TABLE tm SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    ).createOrReplaceTempView("srcv")
    eng.sql("INSERT INTO tm SELECT * FROM srcv")
    t = eng.catalog.load_table("tm")
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    eng.sql("DELETE FROM tm WHERE k % 10 = 1")
    t.refresh()
    assert {f.path for f in t.meta.current_snapshot().live_files()} == before
    assert eng.sql("SELECT COUNT(*) AS n FROM tm").collect()[0]["n"] == 90
    fdf = eng.sql(
        "SELECT SUM(position_deletes) AS pd FROM `tm$files`"
    ).collect()
    assert fdf[0]["pd"] == 10


def test_mor_update_appends_images(spark, tmp_path):
    """write.update.mode=merge-on-read: UPDATE masks old images with a DV
    and appends the new images — affected files are not rewritten."""
    cat = Catalog(spark, str(tmp_path / "wh_u"))
    t = cat.create_table(
        "tu",
        DDL,
        partition_cols=["part"],
        properties={"write.update.mode": "merge-on-read"},
    )
    src = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("x").alias("cat"),
        (F.col("id") % 2).cast("int").alias("part"),
    )
    t.insert(src)
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    snap = t.update_where({"v": "v + 0.5"}, "k < 20")
    assert snap.operation == "overwrite"
    assert before <= {f.path for f in snap.live_files()}  # nothing rewritten
    assert snap.dv_manifest_paths
    assert sum(e.count for e in snap.dv_entries()) == 20
    assert t.to_df().count() == 200
    assert t.to_df().filter("k = 3").collect()[0]["v"] == 3.5
    assert t.to_df().filter("k = 100").collect()[0]["v"] == 100.0
    # second MoR update over the same rows stacks correctly
    t.update_where({"v": "v * 2"}, "k < 10")
    assert t.to_df().count() == 200
    assert t.to_df().filter("k = 3").collect()[0]["v"] == 7.0


def test_mor_merge_upsert(spark, tmp_path):
    """write.merge.mode=merge-on-read: matched rows masked by DV + new
    images appended; not-matched inserted; matched-delete emits DV only."""
    cat = Catalog(spark, str(tmp_path / "wh_m"))
    t = cat.create_table(
        "tmg",
        DDL,
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    src = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("x").alias("cat"),
        (F.col("id") % 2).cast("int").alias("part"),
    )
    t.insert(src)
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    upd = spark.createDataFrame(
        [(5, -5.0, "u", 1), (999, 1.0, "n", 1)], DDL
    )
    snap = t.merge(upd, on=["k"], when_matched="update", when_not_matched_insert=True)
    assert snap.operation == "overwrite"
    assert before <= {f.path for f in snap.live_files()}
    assert sum(e.count for e in snap.dv_entries()) == 1
    assert t.to_df().count() == 101
    assert t.to_df().filter("k = 5").collect()[0]["v"] == -5.0
    assert t.to_df().filter("k = 999").count() == 1
    # matched-delete: DV only, no images
    dl = spark.createDataFrame([(6, 0.0, "d", 0)], DDL)
    snap2 = t.merge(dl, on=["k"], when_matched="delete", when_not_matched_insert=False)
    assert t.to_df().filter("k = 6").count() == 0
    assert t.to_df().count() == 100
    # rewrite folds everything back; rows preserved
    expect = rows(t.to_df())
    t.rewrite_position_deletes()
    assert rows(t.to_df()) == expect


def test_append_rebase_preserves_concurrent_mor_deletes(spark, tmp_path):
    """A concurrent MoR delete (position DV) and equality delete must
    survive an append's conflict-rebase: the rebased snapshot adopts the
    winner's dv/eq manifest sets instead of its stale parent's, and the
    appended files are re-stamped to a sequence number ABOVE the
    concurrent equality delete's so their rows are not masked."""
    cat = Catalog(spark, str(tmp_path / "wh_race"))
    a = cat.create_table(
        "race_mor",
        DDL,
        partition_cols=["part"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    src = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("x").alias("cat"),
        (F.col("id") % 2).cast("int").alias("part"),
    )
    a.insert(src)
    b = cat.load_table("race_mor")

    real_refresh = a.refresh
    state = {"stale": 1}

    def fake_refresh():
        if state["stale"] > 0:
            state["stale"] -= 1
            return a
        return real_refresh()

    a.refresh = fake_refresh
    # winners: a position DV on k%10==3 and an equality delete of k=4
    b.delete_where("k % 10 = 3")
    b.delete_by_keys(spark.createDataFrame([(4,)], "k bigint"), ["k"])
    eq_seq = b.meta.current_snapshot().eq_entries()[0].seq
    # loser: stale-base append INCLUDING a new row with the eq-deleted key
    extra = spark.createDataFrame([(4, -4.0, "n", 0), (500, 1.0, "n", 0)], DDL)
    snap = a.insert(extra)
    a.refresh = fake_refresh  # (restore not needed; fake delegates now)

    a.refresh()
    assert a.meta.current_snapshot_id == snap.snapshot_id
    cur = a.meta.current_snapshot()
    assert cur.dv_manifest_paths and cur.eq_manifest_paths  # adopted
    assert cur.sequence_number > eq_seq
    # DV'd rows stay deleted, old k=4 masked, appended k=4 SURVIVES
    got = a.to_df()
    assert got.filter("k % 10 = 3").count() == 0
    assert got.filter("k = 4").count() == 1
    assert got.filter("k = 4").collect()[0]["v"] == -4.0
    assert got.count() == 100 - 10 - 1 + 2


def test_expire_gcs_delete_vector_debris(spark, tbl):
    """expire_snapshots reclaims DV/eq manifests and payload rowsets
    referenced only by expired snapshots — live ones survive."""
    import os

    tbl.delete_where("k % 10 = 3")  # DV #1 (still live at the end)
    tbl.delete_by_keys(
        spark.createDataFrame([(4,)], "k bigint"), ["k"]
    )  # eq delete, retired below by conversion
    tbl.convert_equality_deletes()  # eq payload now history-only
    expect = sorted(tuple(r) for r in tbl.to_df().collect())
    meta_dir = tbl.meta.metadata_dir

    def debris():
        return {
            f
            for f in os.listdir(meta_dir)
            if f.startswith(("dv-", "eq-"))
        }

    before = debris()
    assert any(f.startswith("eq-") for f in before)
    res = tbl.expire_snapshots(retain_last=1)
    assert res["deleted_delete_files"] > 0
    after = debris()
    assert not any(f.startswith("eq-") for f in after)  # eq debris gone
    assert any(f.startswith("dv-") for f in after)  # live DVs kept
    assert sorted(tuple(r) for r in tbl.to_df().collect()) == expect
    assert tbl.scan().count_from_stats() == len(expect)


def test_mor_merge_duplicate_source_keys_exact_dv_counts(spark, tmp_path):
    """merge(cardinality_check=False) with duplicate source keys must not
    write the same (file, pos) twice into the DV rowset: the per-file DV
    counts stay exact, so count_from_stats == the real live count."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "t_dup",
        DDL,
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(
        spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.lit("x").alias("cat"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    # two source images of k=7 (and one of k=8): matched target rows get
    # delete-vector entries; duplicates must collapse to one position each
    src = spark.createDataFrame(
        [(7, -1.0, "a", 1), (7, -2.0, "a", 1), (8, -3.0, "b", 0)], DDL
    )
    t.merge(src, on=["k"], cardinality_check=False)
    snap = t.meta.current_snapshot()
    live = t.to_df().count()
    assert t.scan().count_from_stats() == live
    # every DV count is exact: record_count - dv == distinct surviving rows per file
    dv_total = sum(e.count for e in snap.dv_entries())
    rec_total = sum(f.record_count for f in snap.live_files())
    assert rec_total - dv_total == live


def test_truncate_and_delete_report_mor_live_rows(spark, tmp_path):
    """TRUNCATE/DELETE deleted_rows accounts for MoR masks (DV counts
    subtracted; equality deletes force a real masked count)."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    t = eng.catalog.create_table(
        "t_trunc",
        DDL,
        partition_cols=["part"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        spark.range(50).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.lit("x").alias("cat"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    t.delete_where("k < 10")  # MoR: 10 rows masked by DVs
    assert t.live_row_count() == 40
    t.delete_by_keys(spark.createDataFrame([(10,), (11,)], "k bigint"), ["k"])
    assert t.live_row_count() == 38  # eq deletes → real masked count
    row = eng.sql("TRUNCATE TABLE t_trunc").collect()[0]
    assert row["deleted_rows"] == 38
    t.refresh()
    assert t.live_row_count() == 0
