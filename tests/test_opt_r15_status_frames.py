"""Round-15 optimization lock: DDL/CALL status frames are JVM-local.

Round 14's change 11 converted gate result frames to VALUES
LocalRelations; round 15 finishes the class inside Engine.sql — every
DDL/CALL status frame (ALTER, OPTIMIZE, SHOW, CALL procedures, MERGE/
UPDATE accounting) must plan as a LocalTableScan, never a Python-RDD
``Scan ExistingRDD`` (one Python-runner job per consumer action at any
scale).  Values are identical either way — only the physical plan
changes.
"""

from __future__ import annotations

import tempfile

import pytest

from icebergsql_spark.sql import Engine


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-r15sf-"))
    e.sql(
        "CREATE TABLE sf15 (k BIGINT, v STRING, p INT) USING parquet "
        "PARTITIONED BY (p) OPTIONS (addTableManagement 'true')"
    )
    e.sql("INSERT INTO sf15 SELECT 1, 'a', 0")
    return e


def test_ddl_status_frames_are_local(eng):
    checks = [
        ("ALTER TABLE sf15 CREATE TAG t1", None),  # empty status frame
        ("ALTER TABLE sf15 SET TBLPROPERTIES ('x'='1')", ("x", "1")),
        ("SHOW TBLPROPERTIES sf15", ("x", "1")),
        ("OPTIMIZE sf15", None),
        ("ALTER TABLE sf15 WRITE ORDERED BY (k)", ("k",)),
        ("SHOW TABLES", ("sf15",)),
        ("DESCRIBE sf15", ("k", "bigint", False)),
    ]
    for stmt, expect_row in checks:
        df = eng.sql(stmt)
        plan = _plan(df)
        assert "Scan ExistingRDD" not in plan, f"{stmt}: Python-RDD frame"
        if expect_row is not None:
            assert tuple(df.collect()[0]) == expect_row, stmt


def test_call_procedure_frames_are_local(eng):
    sid = eng.table("sf15").meta.current_snapshot_id
    df = eng.sql(f"CALL system.ancestors_of(table => 'sf15', snapshot_id => {sid})")
    assert "Scan ExistingRDD" not in _plan(df)
    assert df.collect()[0]["snapshot_id"] == sid
    df = eng.sql("CALL system.rewrite_manifests(table => 'sf15')")
    assert "Scan ExistingRDD" not in _plan(df)


def test_dml_accounting_frames_are_local(eng):
    df = eng.sql("UPDATE sf15 SET v = 'b' WHERE k = 1")
    assert "Scan ExistingRDD" not in _plan(df)
    df = eng.sql("DELETE FROM sf15 WHERE k = 99")
    assert "Scan ExistingRDD" not in _plan(df)
    assert df.collect()[0]["deleted_rows"] == 0


def test_empty_values_local_df_is_typed_local(spark):
    from icebergsql_spark.table import _values_local_df

    df = _values_local_df(spark, [], "a bigint, b string")
    assert "Scan ExistingRDD" not in _plan(df)
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
    assert df.count() == 0
