"""Metadata-answered COUNT(*): manifests decide, zero Spark jobs.

The Trino/Iceberg stats-aggregate optimization: when every planned file's
stats prove the predicate for all rows, Engine.sql answers count(*) from
the manifest record counts. Any straddling file falls back to the scan, so
results can never differ from the distributed path."""

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.sql import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE TABLE mc (k bigint, part int) USING parquet "
            "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)")
    spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("int").alias("part")
    ).createOrReplaceTempView("mc_src")
    eng.sql("INSERT INTO mc SELECT * FROM mc_src")
    return eng


def _is_metadata_plan(df) -> bool:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        "LocalTableScan" in plan
        or "OneRowRelation" in plan
        or "Scan ExistingRDD" in plan
    )


def test_plain_count_is_metadata_only(engine):
    df = engine.sql("SELECT count(*) AS n FROM mc")
    assert _is_metadata_plan(df) and df.collect()[0].n == 400
    # spark's default output name is preserved without an alias
    df2 = engine.sql("SELECT count(*) FROM mc")
    assert df2.columns == ["count(1)"] and df2.collect()[0][0] == 400


def test_partition_predicate_count_is_metadata_only(engine):
    df = engine.sql("SELECT count(*) AS n FROM mc WHERE part = 2")
    assert _is_metadata_plan(df) and df.collect()[0].n == 100
    df = engine.sql("SELECT count(*) AS n FROM mc WHERE part IN (1, 3)")
    assert _is_metadata_plan(df) and df.collect()[0].n == 200


def test_straddling_predicate_falls_back_exactly(engine):
    df = engine.sql("SELECT count(*) AS n FROM mc WHERE k < 10")
    assert not _is_metadata_plan(df)
    assert df.collect()[0].n == 10


def test_zero_matching_partitions_is_metadata_zero(engine):
    df = engine.sql("SELECT count(*) AS n FROM mc WHERE part = 99")
    assert _is_metadata_plan(df) and df.collect()[0].n == 0


def test_time_travel_count_is_metadata_only(engine, spark):
    tbl = engine.table("mc")
    s1 = tbl.meta.current_snapshot()
    engine.sql("INSERT INTO mc SELECT k + 400, part FROM mc_src")
    df = engine.sql(f"as of '{s1.timestamp_ms}' SELECT count(*) AS n FROM mc")
    assert _is_metadata_plan(df) and df.collect()[0].n == 400
    assert engine.sql("SELECT count(*) AS n FROM mc").collect()[0].n == 800


def test_null_partition_values_still_decide(engine, spark):
    spark.sql("SELECT CAST(NULL AS BIGINT) AS k, CAST(NULL AS INT) AS part") \
        .createOrReplaceTempView("null_src")
    engine.sql("INSERT INTO mc SELECT * FROM null_src")
    # IS NULL on the partition column: the null-partition file is all-null
    df = engine.sql("SELECT count(*) AS n FROM mc WHERE part IS NULL")
    assert df.collect()[0].n == 1
    df = engine.sql("SELECT count(*) AS n FROM mc")
    assert _is_metadata_plan(df) and df.collect()[0].n == 401


def test_incremental_changes_reader(engine, spark):
    tbl = engine.table("mc")
    s1 = tbl.meta.current_snapshot()
    engine.sql("INSERT INTO mc SELECT k + 400, part FROM mc_src")
    s2 = engine.table("mc").meta.current_snapshot()
    engine.sql("INSERT INTO mc SELECT k + 800, part FROM mc_src")

    delta = tbl.changes(s1.snapshot_id, s2.snapshot_id)
    assert delta.count() == 400
    assert delta.agg({"k": "min"}).collect()[0][0] == 400
    full_delta = tbl.changes(s1.snapshot_id)
    assert full_delta.count() == 800
    # empty range
    assert tbl.changes(s2.snapshot_id, s2.snapshot_id).count() == 0

    # an overwrite breaks append-only incremental semantics
    spark.sql("SELECT CAST(5 AS BIGINT) AS k, CAST(0 AS INT) AS part") \
        .createOrReplaceTempView("ow_src")
    engine.sql("INSERT OVERWRITE mc PARTITION (part=0) SELECT k FROM ow_src")
    import pytest as _pt
    with _pt.raises(ValueError, match="non-append"):
        tbl.changes(s1.snapshot_id)


def test_show_and_describe_verbs(engine):
    assert engine.sql("SHOW TABLES").collect()[0].tableName == "mc"
    parts = [r.partition for r in engine.sql("SHOW PARTITIONS mc").collect()]
    assert parts == ["part=0", "part=1", "part=2", "part=3"]
    desc = {r.col_name: (r.data_type, r.is_partition)
            for r in engine.sql("DESCRIBE mc").collect()}
    assert desc == {"k": ("bigint", False), "part": ("int", True)}
