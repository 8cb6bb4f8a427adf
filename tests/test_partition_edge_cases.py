"""Partition-value edge cases: NULL partitions, special characters, and the
files metadata view (test introspection per SURVEY §2.A #25 — replaces the
reference's reflection-based filesScanned helper, utils/utils.scala:43-69).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icebergsql_spark.table import Catalog


def test_null_and_special_partition_values(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    tbl = catalog.create_table(
        "edge", "id int, k string", partition_cols=["k"]
    )
    rows = [(1, "plain"), (2, None), (3, "a b/c=d:e"), (4, "plain")]
    tbl.insert(spark.createDataFrame(rows, "id int, k string"))

    got = {(r["id"], r["k"]) for r in tbl.to_df().collect()}
    assert got == set(rows)

    # partition map round-trips the decoded values
    parts = {f.partition["k"] for f in tbl.meta.current_snapshot().live_files()}
    assert parts == {"plain", None, "a b/c=d:e"}

    # pruning on the special-char partition value
    scan = tbl.scan(where="k = 'a b/c=d:e'")
    assert scan.files_scanned == 1
    assert [r["id"] for r in scan.dataframe().collect()] == [3]

    # IS NULL pruning hits only the null partition
    null_scan = tbl.scan(where="k IS NULL")
    assert null_scan.files_scanned == 1
    assert [r["id"] for r in null_scan.dataframe().collect()] == [2]

    # IS NOT NULL excludes it
    nn = tbl.scan(where="k IS NOT NULL")
    assert {r["id"] for r in nn.dataframe().collect()} == {1, 3, 4}


def test_files_metadata_view(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh2"))
    tbl = catalog.create_table("f", "id int, k string", partition_cols=["k"])
    tbl.insert(spark.createDataFrame([(i, f"p{i % 2}") for i in range(10)], "id int, k string"))
    files = tbl.files_df().collect()
    assert sum(f["record_count"] for f in files) == 10
    assert all(f["file_size"] > 0 for f in files)
    # dataframe inputFiles ⊆ files view paths
    scan_paths = {f["file_path"] for f in files}
    input_files = {p.replace("file://", "") for p in tbl.to_df().inputFiles()}
    assert input_files <= scan_paths


def test_multi_column_partitioning(spark, tmp_path):
    """Two partition columns: nested hive dirs, tuple pruning, and a
    PARTIAL static-partition overwrite (pin one of two partition cols)."""
    catalog = Catalog(spark, str(tmp_path / "wh_multi"))
    tbl = catalog.create_table(
        "m", "id int, region string, yr int", partition_cols=["region", "yr"]
    )
    rows = [(i, r, y) for i, (r, y) in enumerate(
        (r, y) for r in ("eu", "us") for y in (2023, 2024) for _ in range(3)
    )]
    df = spark.createDataFrame(rows, "id int, region string, yr int")
    tbl.insert(df)
    assert tbl.to_df().count() == 12

    # tuple pruning: both partition values exact
    scan = tbl.scan(where="region = 'eu' AND yr = 2024")
    assert scan.dataframe().count() == 3
    for f in scan.planned_files:
        assert f.partition == {"region": "eu", "yr": "2024"}

    # partial static overwrite: pin region only → replaces BOTH years of eu
    repl = spark.createDataFrame([(100, 2024)], "id int, yr int")
    s = tbl.insert(repl, overwrite=True, static_partition={"region": "eu"})
    assert s.num_deleted_files == len(
        [1 for f in tbl.meta.snapshot_by_id(s.parent_id).live_files()
         if f.partition["region"] == "eu"]
    )
    got = {(r["id"], r["region"], r["yr"]) for r in tbl.to_df().collect()}
    assert {(i, "us", y) for i, _, y in rows if _ == "us"} | {(100, "eu", 2024)} == got


def test_empty_insert_and_empty_overwrite(spark, tmp_path):
    """INSERT of 0 rows commits an empty append; OVERWRITE with an empty
    source becomes a pure delete snapshot; scans keep working."""
    catalog = Catalog(spark, str(tmp_path / "wh_empty"))
    tbl = catalog.create_table("e", "id int, k string", partition_cols=["k"])
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, k string")
    empty = df.filter("id > 100")

    s0 = tbl.insert(empty)
    assert (s0.num_added_files, s0.num_deleted_files) == (0, 0)
    assert tbl.to_df().count() == 0

    tbl.insert(df)
    assert tbl.to_df().count() == 2

    s2 = tbl.insert(empty, overwrite=True)
    assert s2.operation == "delete"
    assert s2.num_deleted_files == 2 and s2.num_added_files == 0
    assert tbl.to_df().count() == 0
    # history intact: time travel back to the populated snapshot
    populated = tbl.meta.snapshots[-2]
    assert tbl.to_df(as_of_millis=populated.timestamp_ms).count() == 2


def test_insert_distribution(spark, tmp_path):
    """distribute_by controls files-per-partition (write.distribution-mode
    parity: one shuffle to co-locate rows before the write)."""
    catalog = Catalog(spark, str(tmp_path / "wh3"))
    tbl = catalog.create_table("d", "id int, k string", partition_cols=["k"])
    df = spark.createDataFrame([(i, f"p{i % 3}") for i in range(3000)], "id int, k string")
    snap = tbl.insert(df.repartition(24), distribute_by=["k"])
    # hash distribution by partition key → exactly one file per partition
    assert snap.num_added_files == 3
