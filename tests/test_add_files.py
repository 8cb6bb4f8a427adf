"""add_files import procedure (Iceberg migrate-in-place): zero-copy
registration, stats-inferred partitions, guards, and coexistence with
the managed write/maintenance surface."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.table import Catalog, TableValidationError


def _stage(spark, df, key, values, prefix="addf"):
    src = tempfile.mkdtemp(prefix=f"icebergsql-{prefix}-")
    for v in values:
        df.filter(F.col(key) == v).coalesce(1).write.mode("append").parquet(
            src
        )
    return src


def test_add_files_zero_copy_and_pruning(spark, tmp_path):
    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).withColumn("l_shipyear", F.year("l_shipdate"))
    years = sorted(
        r["l_shipyear"]
        for r in li.select("l_shipyear").distinct().collect()
    )
    src = _stage(spark, li, "l_shipyear", years)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in li.schema.fields
    )
    tbl = Catalog(spark, str(tmp_path / "wh")).create_table(
        "li_addf", ddl, ["l_shipyear"]
    )
    snap = tbl.add_files(src)
    assert snap.operation == "append"
    assert snap.summary["added-files-by-import"] == str(len(years))
    live = snap.live_files()
    assert all(f.path.startswith(src) for f in live)  # zero copy
    assert {f.partition["l_shipyear"] for f in live} == {
        str(y) for y in years
    }
    # footer stats are real: metadata count + partition pruning
    assert tbl.scan().count_from_stats() == li.count()
    assert tbl.scan(where=f"l_shipyear = {years[0]}").files_scanned == 1
    # content round-trips exactly
    got = tbl.to_df().agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
    ).collect()[0][0]
    want = li.agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("bigint"))
    ).collect()[0][0]
    assert got == want


def test_add_files_guards(spark, tmp_path):
    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).withColumn("l_shipyear", F.year("l_shipdate"))
    src = _stage(spark, li, "l_shipyear", [1995])
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in li.schema.fields
    )
    tbl = Catalog(spark, str(tmp_path / "wh")).create_table(
        "li_addg", ddl, ["l_shipyear"]
    )
    tbl.add_files(src)
    # duplicate registration refused (Iceberg check_duplicate_files)
    with pytest.raises(TableValidationError, match="already registered"):
        tbl.add_files(src)
    # ... unless forced
    with pytest.raises(TableValidationError, match="no .parquet files"):
        tbl.add_files(str(tmp_path / "empty"))
    # straddling file rejected: one file spanning several years
    bad = tempfile.mkdtemp(prefix="icebergsql-addbad-")
    li.coalesce(1).write.mode("overwrite").parquet(bad)
    with pytest.raises(TableValidationError, match="straddles"):
        tbl.add_files(bad)
    # schema mismatch rejected
    narrow = tempfile.mkdtemp(prefix="icebergsql-addnar-")
    li.filter(F.col("l_shipyear") == 1996).select(
        "l_orderkey", "l_shipyear"
    ).coalesce(1).write.mode("overwrite").parquet(narrow)
    with pytest.raises(TableValidationError, match="file schema"):
        tbl.add_files(narrow)
    # partition assertion: wrong expected value rejected
    src96 = _stage(spark, li, "l_shipyear", [1996])
    with pytest.raises(TableValidationError, match="belongs to"):
        tbl.add_files(src96, partition_values={"l_shipyear": 1997})


def test_add_files_coexists_with_writes_and_maintenance(spark, tmp_path):
    li = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).withColumn("l_shipyear", F.year("l_shipdate"))
    src = _stage(spark, li.filter(F.col("l_orderkey") % 2 == 0),
                 "l_shipyear", [1995, 1996])
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in li.schema.fields
    )
    tbl = Catalog(spark, str(tmp_path / "wh")).create_table(
        "li_addc", ddl, ["l_shipyear"]
    )
    tbl.add_files(src)
    # ordinary insert after import
    tbl.insert(
        li.filter(
            (F.col("l_orderkey") % 2 == 1)
            & F.col("l_shipyear").isin(1995, 1996)
        )
    )
    want = li.filter(F.col("l_shipyear").isin(1995, 1996)).count()
    assert tbl.to_df().count() == want
    # compact rewrites imported + written files into the table's own dir
    snap = tbl.compact()
    assert snap is not None and snap.operation == "replace"
    assert tbl.to_df().count() == want
    live = tbl.meta.current_snapshot().live_files()
    assert all(not f.path.startswith(src) for f in live)
    # the imported originals are OUTSIDE the table tree: orphan scan
    # must not count (or delete) them
    removed = tbl.remove_orphan_files(older_than_s=0)
    import os

    assert all(
        os.path.exists(f)
        for f in __import__("glob").glob(f"{src}/*.parquet")
    ), removed
