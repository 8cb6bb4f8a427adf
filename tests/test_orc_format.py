"""Non-parquet (ORC) managed tables.

Parity analogue of the reference's parquet-else fallback in
utils/utils.scala:168-198: `iceFormat` resolves the table's declared
format, and `iceMetrics` returns None for non-parquet files — so ORC data
files carry record counts but NO column stats. Partition pruning (exact
dir-encoded values) still applies; min/max stats pruning degrades to
scan-everything, never to wrong results.
"""

from __future__ import annotations

import pytest

from icebergsql_spark.sql import Engine
from icebergsql_spark.table import Catalog, TableValidationError


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "warehouse"))


def _src(spark):
    rows = [(i, i % 4, f"name-{i}", float(i) * 1.5) for i in range(200)]
    return spark.createDataFrame(rows, "id int, bucket int, name string, score double")


def test_orc_roundtrip_and_partition_pruning(spark, catalog):
    tbl = catalog.create_table(
        "t_orc", "id int, bucket int, name string, score double",
        partition_cols=["bucket"], file_format="orc",
    )
    assert tbl.file_format == "orc"
    tbl.insert(_src(spark))

    # data files on disk really are ORC
    files = [f.path for f in tbl.meta.current_snapshot().live_files()]
    assert files and all(p.endswith(".orc") for p in files)
    # reference parity: no column metrics for non-parquet, counts present
    snap_files = tbl.meta.current_snapshot().live_files()
    assert all(f.stats == {} for f in snap_files)
    assert sum(f.record_count for f in snap_files) == 200

    # full read round-trips
    assert tbl.to_df().count() == 200

    # partition pruning still applies (dir-encoded exact values)
    scan = tbl.scan(where="bucket = 2")
    assert scan.files_scanned < len(files)
    assert scan.dataframe().count() == 50

    # stats predicate can't prune (no min/max) but results stay correct
    scan2 = tbl.scan(where="id < 10")
    assert scan2.files_scanned == len(files)  # conservative: no stats
    assert scan2.dataframe().count() == 10


def test_orc_time_travel_and_overwrite(spark, catalog):
    tbl = catalog.create_table(
        "t_orc_tt", "id int, bucket int, name string, score double",
        partition_cols=["bucket"], file_format="orc",
    )
    tbl.insert(_src(spark))
    snap1 = tbl.meta.current_snapshot().snapshot_id
    tbl.insert(_src(spark))
    assert tbl.to_df().count() == 400
    assert tbl.scan(snapshot_id=snap1).dataframe().count() == 200


def test_orc_sql_front_door(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    _src(spark).createOrReplaceTempView("orc_src")
    eng.sql(
        "CREATE TABLE orc_tbl (id int, bucket int, name string, score double) "
        "USING orc PARTITIONED BY (bucket) OPTIONS ('addTableManagement'='true')"
    )
    eng.sql("INSERT INTO orc_tbl SELECT * FROM orc_src")
    assert eng.sql("SELECT count(*) AS n FROM orc_tbl").collect()[0]["n"] == 200
    assert (
        eng.sql("SELECT count(*) AS n FROM orc_tbl WHERE bucket = 1").collect()[0]["n"]
        == 50
    )


def test_unsupported_format_rejected(spark, catalog, tmp_path):
    with pytest.raises(TableValidationError, match="parquet, orc or avro"):
        catalog.create_table(
            "t_csv", "id int", partition_cols=["id"], file_format="csv"
        )
    eng = Engine(spark, str(tmp_path / "wh2"))
    with pytest.raises(ValueError, match="parquet\\|orc\\|avro"):
        eng.sql(
            "CREATE TABLE c (id int) USING csv OPTIONS ('addTableManagement'='true')"
        )
