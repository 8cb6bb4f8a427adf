"""Schema evolution: add / drop / rename / widen, all metadata-only.

Iceberg-style name-independent columns (the capability the reference
inherits from its Iceberg dependency): each evolution appends a schema
version; data files keep the schema_id they were written under, and scans
translate era names/types to current via field ids — so a rename follows
old files' data AND stats, a dropped-then-readded name is a fresh column,
and a widened type casts on read. No data file is ever rewritten.
"""

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.table import Catalog, TableValidationError

DDL = "k bigint, qty int, price double, part int"


def _mk(spark, tmp_path, name="ev", rows=120):
    cat = Catalog(spark, str(tmp_path / "wh"))
    tbl = cat.create_table(name, DDL, partition_cols=["part"])
    src = spark.range(rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("qty"),
        (F.col("id") * 1.5).alias("price"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    tbl.insert(src)
    return tbl, src


def test_add_column_null_backfill(spark, tmp_path):
    tbl, src = _mk(spark, tmp_path)
    tbl.add_column("era", "string")
    assert [f.name for f in tbl.schema.fields][-1] == "era"
    # old rows read back NULL for the new column
    assert tbl.to_df().filter(F.col("era").isNull()).count() == 120
    # new writes carry it
    tbl.insert(src.withColumn("era", F.lit("v2")).filter(F.col("k") < 10))
    assert tbl.to_df().filter(F.col("era") == "v2").count() == 10
    assert tbl.to_df().count() == 130


def test_rename_column_reads_and_prunes_old_files(spark, tmp_path):
    tbl, src = _mk(spark, tmp_path)
    tbl.rename_column("qty", "quantity")
    # data written under the old name reads through the new one
    assert tbl.to_df().filter(F.col("quantity") == 3).count() == src.filter(
        F.col("qty") == 3
    ).count()
    # stats follow the rename: a predicate on the NEW name still prunes
    # files via the OLD files' footer stats (k is monotone per file? use
    # k-range instead: k bounds are per-file tight)
    tbl.rename_column("k", "key")
    total = len(tbl.meta.current_snapshot().live_files())
    scan = tbl.scan(where="key < 0")
    assert scan.files_scanned == 0 < total
    assert scan.dataframe().count() == 0
    # SQL surface sees current names end-to-end
    assert set(tbl.to_df().columns) == {"key", "quantity", "price", "part"}


def test_rename_swap_is_id_strict(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path)
    # swap qty <-> price through a temp name; values must follow ids
    tbl.rename_column("qty", "tmp_x")
    tbl.rename_column("price", "qty")
    tbl.rename_column("tmp_x", "price")
    row = tbl.to_df().filter(F.col("k") == 6).collect()[0]
    assert row["price"] == 6  # originally qty = k % 7
    assert row["qty"] == 9.0  # originally price = k * 1.5
    # pruning on the swapped names uses the right (remapped) stats
    assert tbl.scan(where="qty > 1000000").files_scanned == 0
    assert tbl.scan(where="price >= 0").dataframe().count() == 120


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    tbl, src = _mk(spark, tmp_path)
    tbl.drop_column("qty")
    assert "qty" not in tbl.to_df().columns
    tbl.add_column("qty", "int")
    # same name, NEW field id: old files must surface NULL, not old bytes
    assert tbl.to_df().filter(F.col("qty").isNull()).count() == 120
    # and dead stats must not prune the new column: old files' qty ranged
    # 0..6, but a predicate qty = 100 on the NEW column may only be pruned
    # by NEW files' stats
    tbl.insert(
        src.withColumn("qty", F.lit(100)).filter(F.col("k") < 5)
    )
    assert tbl.to_df().filter(F.col("qty") == 100).count() == 5


def test_widen_int_to_bigint(spark, tmp_path):
    tbl, src = _mk(spark, tmp_path)
    tbl.alter_column_type("qty", "bigint")
    assert tbl.schema["qty"].dataType.typeName() == "long"
    # old int32-written files cast on read; sums agree
    assert (
        tbl.to_df().agg(F.sum("qty")).collect()[0][0]
        == src.agg(F.sum("qty")).collect()[0][0]
    )
    # new writes land as int64 and mix freely
    tbl.insert(
        src.withColumn("qty", F.col("k") + 2_200_000_000).filter(F.col("k") < 3)
    )
    assert tbl.to_df().filter(F.col("qty") > 2_000_000_000).count() == 3
    with pytest.raises(TableValidationError):
        tbl.alter_column_type("qty", "int")  # narrowing rejected


def test_partition_column_rename(spark, tmp_path):
    tbl, _ = _mk(spark, tmp_path)
    tbl.rename_column("part", "bucket")
    assert tbl.meta.partition_cols == ["bucket"]
    total = len(tbl.meta.current_snapshot().live_files())
    scan = tbl.scan(where="bucket = 1")
    assert 0 < scan.files_scanned < total  # old dirs still prune
    assert scan.dataframe().count() == 40
    # and new writes under the new spec coexist
    src2 = tbl.to_df().filter(F.col("k") < 6)
    tbl.insert(src2)
    assert tbl.scan(where="bucket = 1").dataframe().count() == 42


def test_evolution_guards(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "whg"))
    tbl = cat.create_table(
        "g",
        "a int, b int, part int",
        partition_cols=["part"],
        properties={"columnDependencies": "a=b:identity"},
    )
    with pytest.raises(TableValidationError):
        tbl.drop_column("part")  # partition column
    with pytest.raises(TableValidationError):
        tbl.drop_column("a")  # dependency source
    with pytest.raises(TableValidationError):
        tbl.rename_column("b", "c")  # dependency target
    with pytest.raises(TableValidationError):
        tbl.add_column("A", "int")  # case-insensitive duplicate
    with pytest.raises(TableValidationError):
        tbl.alter_column_type("a", "string")  # not a widening


def test_changes_and_compact_across_evolution(spark, tmp_path):
    tbl, src = _mk(spark, tmp_path)
    s1 = tbl.meta.current_snapshot()
    tbl.rename_column("qty", "quantity")
    tbl.add_column("era", "string")
    tbl.insert(
        src.withColumnRenamed("qty", "quantity")
        .withColumn("era", F.lit("v2"))
        .filter(F.col("k") < 20)
    )
    # incremental read returns CURRENT schema over the delta only
    delta = tbl.changes(s1.snapshot_id)
    assert delta.count() == 20
    assert set(delta.columns) == {"k", "quantity", "price", "part", "era"}
    # compaction rewrites everything under the current era
    tbl.compact(target_file_size=1 << 30)
    sids = {f.schema_id for f in tbl.meta.current_snapshot().live_files()}
    assert sids == {tbl.meta.current_schema_id}
    assert tbl.to_df().filter(F.col("era").isNull()).count() == 120
    assert tbl.to_df().count() == 140


def test_sql_evolution_surface(spark, tmp_path):
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "whs"))
    eng.sql(
        "CREATE TABLE es (k BIGINT, qty INT, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("qty"),
        (F.col("id") % 2).cast("int").alias("part"),
    ).createOrReplaceTempView("es_src")
    eng.sql("INSERT INTO es SELECT * FROM es_src")
    eng.sql("ALTER TABLE es RENAME COLUMN qty TO quantity")
    eng.sql("ALTER TABLE es ADD COLUMN note STRING")
    eng.sql("ALTER TABLE es ALTER COLUMN quantity TYPE BIGINT")
    desc = {r["col_name"]: r["data_type"] for r in eng.sql("DESCRIBE es").collect()}
    assert desc == {
        "k": "bigint",
        "quantity": "bigint",
        "note": "string",
        "part": "int",
    }
    assert (
        eng.sql("SELECT count(*) AS n FROM es WHERE quantity = 4").collect()[0][0]
        == 10
    )
    eng.sql("ALTER TABLE es DROP COLUMN note")
    assert "note" not in eng.sql("SELECT * FROM es").columns
