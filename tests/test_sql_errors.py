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


def test_insert_rejects_duplicate_columns(engine, spark):
    """Parity with SchemaUtils.checkColumnNameDuplication on insert
    (InsertIntoIcebergTable.scala:185-190), case-insensitive like Spark."""
    engine.sql(
        "CREATE TABLE dup (a int, b string, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    tbl = engine.table("dup")
    src = spark.createDataFrame([(1, "x", "x2", "p1")], "a int, b string, B string, p string")
    with pytest.raises(TableValidationError, match="duplicate column"):
        tbl.insert(src)


def test_savemode_error_if_exists(engine, spark):
    """SaveMode.ErrorIfExists → AnalysisException-style 'already exists.'
    (InsertIntoIcebergTable.scala:236-237)."""
    from icebergsql_spark.table import TableAlreadyExistsError

    engine.sql(
        "CREATE TABLE sm1 (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    tbl = engine.table("sm1")
    src = spark.createDataFrame([(1, "p1")], "a int, p string")
    tbl.write(src, mode="errorIfExists")  # empty table → insertion proceeds
    assert tbl.to_df().count() == 1
    with pytest.raises(TableAlreadyExistsError, match="already exists\\."):
        tbl.write(src, mode="errorIfExists")


def test_savemode_ignore_skips_when_data_exists(engine, spark):
    """SaveMode.Ignore → doInsertion = !exists
    (InsertIntoIcebergTable.scala:244-245)."""
    engine.sql(
        "CREATE TABLE sm2 (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    tbl = engine.table("sm2")
    first = spark.createDataFrame([(1, "p1")], "a int, p string")
    assert tbl.write(first, mode="ignore") is not None  # empty → writes
    second = spark.createDataFrame([(2, "p2")], "a int, p string")
    assert tbl.write(second, mode="ignore") is None  # has data → no-op
    assert tbl.to_df().count() == 1
    assert len(tbl.meta.snapshots) == 1  # the no-op produced NO snapshot


def test_savemode_unknown_rejected(engine, spark):
    engine.sql(
        "CREATE TABLE sm3 (a int, p string) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    with pytest.raises(TableValidationError, match="unsupported save mode"):
        engine.table("sm3").write(
            spark.createDataFrame([(1, "p1")], "a int, p string"), mode="replace"
        )


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


def test_merge_unsupported_clause_fails_loudly(engine, spark):
    """A WHEN clause the parser cannot match must raise — never be
    silently dropped while sibling clauses execute."""
    import pyspark.sql.functions as F

    engine.sql(
        "CREATE TABLE m_t (k BIGINT, v BIGINT, p INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (p)"
    )
    spark.range(10).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        (F.col("id") % 2).cast("int").alias("p"),
    ).createOrReplaceTempView("m_src")
    engine.sql("INSERT INTO m_t SELECT * FROM m_src")
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        engine.sql(
            "MERGE INTO m_t t USING m_src s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED THEN UPSERT EVERYTHING"
        )
    # nothing executed: the DELETE clause did not run
    assert engine.sql("SELECT COUNT(*) AS n FROM m_t").collect()[0]["n"] == 10


def test_merge_column_list_insert(engine, spark):
    """WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): listed columns
    take their expressions, unlisted columns become NULL."""
    import pyspark.sql.functions as F

    engine.sql(
        "CREATE TABLE mci_t (k BIGINT, v BIGINT, note STRING, p INT) "
        "USING parquet OPTIONS (addTableManagement 'true') "
        "PARTITIONED BY (p)"
    )
    spark.range(5).select(
        F.col("id").alias("k"), F.col("id").alias("v"),
        F.lit("x").alias("note"), (F.col("id") % 2).cast("int").alias("p"),
    ).createOrReplaceTempView("mci_src0")
    engine.sql("INSERT INTO mci_t SELECT * FROM mci_src0")
    spark.createDataFrame(
        [(3, 30, "y", 1), (7, 70, "y", 1)], "k bigint, v bigint, note string, p int"
    ).createOrReplaceTempView("mci_src")
    out = engine.sql(
        "MERGE INTO mci_t t USING mci_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (s.k, s.v * 10, s.p)"
    )
    assert out.collect()
    rows = {
        r["k"]: (r["v"], r["note"])
        for r in engine.sql("SELECT k, v, note FROM mci_t").collect()
    }
    assert rows[3] == (30, "x")      # matched: updated, note kept
    assert rows[7] == (700, None)    # inserted: expr applied, note NULL
    assert len(rows) == 6
    # unknown column in the list fails loudly
    with pytest.raises(TableValidationError, match="unknown column"):
        engine.sql(
            "MERGE INTO mci_t t USING mci_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (zzz) VALUES (s.k)"
        )
    # arity mismatch fails loudly
    with pytest.raises(ValueError, match="must match"):
        engine.sql(
            "MERGE INTO mci_t t USING mci_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)"
        )


def test_merge_column_list_insert_mor(spark, tmp_path):
    """Column-list insert composes with the merge-on-read MERGE path."""
    import pyspark.sql.functions as F

    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_mci_mor"))
    t = cat.create_table(
        "t", "k bigint, v bigint, note string, p int",
        partition_cols=["p"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").alias("v"),
            F.lit("x").alias("note"), (F.col("id") % 2).cast("int").alias("p"),
        )
    )
    src = spark.createDataFrame(
        [(3, 30, 1), (7, 70, 1)], "k bigint, v bigint, p int"
    )
    snap = t.merge(
        src, on=["k"], set_exprs={"v": "s.v"},
        when_not_matched_insert={"k": "s.k", "v": "s.v * 10", "p": "s.p"},
    )
    assert snap.dv_manifest_paths  # MoR: matched old image masked, not rewritten
    rows = {r["k"]: (r["v"], r["note"]) for r in t.to_df().collect()}
    assert rows[3] == (30, "x")
    assert rows[7] == (700, None)
    assert len(rows) == 6
