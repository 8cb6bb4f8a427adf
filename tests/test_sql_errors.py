"""Engine.sql error paths and lesser-used shapes."""

from __future__ import annotations

import pytest

from icebergsql_spark.sql import Engine
from icebergsql_spark.table import TableValidationError


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "wh"))


def test_managed_create_requires_parquet(engine):
    with pytest.raises(ValueError, match="USING parquet"):
        engine.sql(
            "CREATE TABLE t (a int, p string) USING csv "
            "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
        )


def test_managed_create_requires_partitioning(engine):
    with pytest.raises(TableValidationError, match="must be partitioned"):
        engine.sql(
            "CREATE TABLE t (a int, p string) USING parquet "
            "OPTIONS (addTableManagement 'true')"
        )


def test_bad_column_dependencies_surface(engine):
    with pytest.raises(Exception, match="unknown source column"):
        engine.sql(
            "CREATE TABLE t (a int, p string) USING parquet "
            "OPTIONS (addTableManagement 'true', "
            "columnDependencies 'zzz=a:truncate[2]') PARTITIONED BY (p)"
        )


def test_insert_values_form(engine, spark):
    engine.sql(
        "CREATE TABLE v (a int, b string, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql("INSERT INTO v VALUES (1, 'x', 'p1'), (2, 'y', 'p2')")
    rows = {tuple(r) for r in engine.sql("SELECT a, b, p FROM v").collect()}
    assert rows == {(1, "x", "p1"), (2, "y", "p2")}


def test_as_of_before_first_snapshot_errors(engine, spark):
    engine.sql(
        "CREATE TABLE e (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql("INSERT INTO e VALUES (1, 'p1')")
    with pytest.raises(ValueError, match="no snapshot at or before"):
        engine.sql("as of '5' SELECT * FROM e")


def test_second_engine_sees_committed_state(engine, spark, tmp_path):
    """Reader/writer separation: a second Engine over the same warehouse
    observes commits without shared in-memory state (metadata reload path)."""
    from icebergsql_spark.sql import Engine

    engine.sql(
        "CREATE TABLE shared (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql("INSERT INTO shared VALUES (1, 'x'), (2, 'y')")

    reader = Engine(spark, engine.catalog.warehouse)
    assert reader.sql("SELECT count(*) AS n FROM shared").collect()[0].n == 2
    engine.sql("INSERT INTO shared VALUES (3, 'z')")
    assert reader.sql("SELECT count(*) AS n FROM shared").collect()[0].n == 3


def test_drop_table(engine, spark):
    engine.sql(
        "CREATE TABLE dropme (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql("INSERT INTO dropme VALUES (1, 'p1')")
    assert engine.catalog.table_exists("dropme")
    engine.sql("DROP TABLE dropme")
    assert not engine.catalog.table_exists("dropme")
    engine.sql("DROP TABLE IF EXISTS dropme")  # no-op, no error


def test_as_of_joins_two_managed_tables(engine, spark):
    engine.sql(
        "CREATE TABLE j1 (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql(
        "CREATE TABLE j2 (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    engine.sql("INSERT INTO j1 VALUES (1, 'p')")
    engine.sql("INSERT INTO j2 VALUES (1, 'p')")
    ts = engine.table("j2").meta.current_snapshot().timestamp_ms
    engine.sql("INSERT INTO j1 VALUES (2, 'p')")
    engine.sql("INSERT INTO j2 VALUES (2, 'p')")
    # `as of` applies to EVERY managed table in the statement (reference
    # semantics via ThreadLocal, IceParser.scala:108-114 — here per-table)
    n = engine.sql(
        f"as of '{ts}' SELECT count(*) AS n FROM j1 JOIN j2 ON j1.a = j2.a"
    ).collect()[0].n
    assert n == 1
