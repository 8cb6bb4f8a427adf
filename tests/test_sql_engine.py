"""SQL front-door tests: the reference's README walkthrough, in SQL.

Exercises the legacy surface of /root/reference/README.md:104-362 through
Engine.sql: managed CREATE TABLE with OPTIONS, INSERT INTO / OVERWRITE
[PARTITION], `as of` prefix time travel, and the `t$snapshots` view."""

from __future__ import annotations

import datetime as dt

import pytest

from icebergsql_spark.sql import Engine, convert_to_epoch_millis
from tests.store_sales_fixture import build_store_sales_df


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    eng = Engine(spark, str(tmp_path_factory.mktemp("warehouse")))
    build_store_sales_df(spark).createOrReplaceTempView("store_sales_src")
    return eng


ALL_COLS = (
    "ss_sold_time_sk, ss_item_sk, ss_customer_sk, ss_cdemo_sk, ss_hdemo_sk, "
    "ss_addr_sk, ss_store_sk, ss_promo_sk, ss_quantity, ss_wholesale_cost, "
    "ss_list_price, ss_sales_price, ss_ext_sales_price, ss_sold_month, "
    "ss_sold_day"
)


def test_epoch_conversion():
    # reference accepts 'yyyy-MM-dd HH:mm:ss.S' strings and raw millis
    # (utils/utils.scala:114-122)
    assert convert_to_epoch_millis("1000") == 1000
    ms = convert_to_epoch_millis("2019-09-15 20:32:24.062")
    expect = int(
        dt.datetime(2019, 9, 15, 20, 32, 24, 62000, tzinfo=dt.timezone.utc).timestamp()
        * 1000
    )
    assert ms == expect


def test_readme_walkthrough(engine, spark):
    # managed CREATE TABLE with OPTIONS (README.md:104-122)
    engine.sql("""
        CREATE TABLE store_sales_out (
          ss_sold_time_sk int, ss_item_sk int, ss_customer_sk int,
          ss_cdemo_sk int, ss_hdemo_sk int, ss_addr_sk int, ss_store_sk int,
          ss_promo_sk int, ss_quantity int, ss_wholesale_cost decimal(7,2),
          ss_list_price decimal(7,2), ss_sales_price decimal(7,2),
          ss_ext_sales_price decimal(7,2), ss_sold_month string,
          ss_sold_day string, ss_sold_date_sk string
        ) USING parquet
        OPTIONS (
          addTableManagement 'true',
          columnDependencies 'ss_sold_date_sk=ss_sold_month:truncate[2], ss_sold_date_sk=ss_sold_day:truncate[4]'
        )
        PARTITIONED BY (ss_sold_date_sk)
    """)
    assert engine.catalog.table_exists("store_sales_out")

    # INSERT INTO ... SELECT (README.md:124-136)
    engine.sql(
        f"INSERT INTO store_sales_out SELECT {ALL_COLS}, ss_sold_date_sk "
        "FROM store_sales_src"
    )
    assert engine.sql("SELECT count(*) AS n FROM store_sales_out").collect()[0].n == 2109

    # filtered count with file pruning (README.md:160-180)
    n = engine.sql(
        "SELECT count(*) AS n FROM store_sales_out WHERE ss_sold_date_sk='0906245'"
    ).collect()[0].n
    assert n == 236

    # $snapshots legacy view (README.md:138-147)
    snaps = engine.sql("SELECT * FROM `store_sales_out$snapshots`").collect()
    assert len(snaps) == 1 and snaps[0].numAddedFiles == 30
    first_ts = snaps[0].timeMillis

    # second insert → 4218 (README.md:182-210)
    engine.sql(
        f"INSERT INTO store_sales_out SELECT {ALL_COLS}, ss_sold_date_sk "
        "FROM store_sales_src"
    )
    assert engine.sql("SELECT count(*) AS n FROM store_sales_out").collect()[0].n == 4218

    # `as of` prefix time travel (README.md:212-224): raw-millis form
    n = engine.sql(
        f"as of '{first_ts}' SELECT count(*) AS n FROM store_sales_out"
    ).collect()[0].n
    assert n == 2109

    # formatted-timestamp form ('yyyy-MM-dd HH:mm:ss.S', UTC)
    ts_text = dt.datetime.fromtimestamp(first_ts / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )[:-3]
    n = engine.sql(
        f"as of '{ts_text}' SELECT count(*) AS n FROM store_sales_out"
    ).collect()[0].n
    assert n == 2109

    # full INSERT OVERWRITE (README.md:226-257)
    engine.sql(
        f"INSERT OVERWRITE store_sales_out SELECT {ALL_COLS}, ss_sold_date_sk "
        "FROM store_sales_src"
    )
    assert engine.sql("SELECT count(*) AS n FROM store_sales_out").collect()[0].n == 2109

    # single-partition overwrite, count unchanged (README.md:259-296)
    engine.sql(
        "INSERT OVERWRITE store_sales_out PARTITION (ss_sold_date_sk='0906245') "
        f"SELECT {ALL_COLS} FROM store_sales_src WHERE ss_sold_date_sk='0906245'"
    )
    assert engine.sql("SELECT count(*) AS n FROM store_sales_out").collect()[0].n == 2109

    # static partition overwrite with source predicate (README.md:298-337)
    engine.sql(
        "INSERT OVERWRITE store_sales_out PARTITION (ss_sold_date_sk='0905245') "
        f"SELECT {ALL_COLS} FROM store_sales_src "
        "WHERE ss_sold_date_sk='0905245' AND ss_item_sk < 5000"
    )
    assert engine.sql("SELECT count(*) AS n FROM store_sales_out").collect()[0].n == 1877

    # time travel still valid (README.md:339-351)
    n = engine.sql(
        f"as of '{first_ts}' SELECT count(*) AS n FROM store_sales_out"
    ).collect()[0].n
    assert n == 2109

    # NullScan through SQL: engine prunes to zero files (README.md:353-362)
    tbl = engine.table("store_sales_out")
    scan = tbl.scan(where="ss_item_sk > 5000 AND ss_sold_date_sk = '0905245'")
    assert scan.files_scanned == 0
    n = engine.sql(
        "SELECT count(*) AS n FROM store_sales_out "
        "WHERE ss_item_sk > 5000 AND ss_sold_date_sk='0905245'"
    ).collect()[0].n
    assert n == 0

    # pruning is visible through the SQL path: the registered view's scan
    # reads only the matching partition's files
    df = engine.sql(
        "SELECT ss_item_sk FROM store_sales_out WHERE ss_sold_date_sk='0906245'"
    )
    assert len(df.inputFiles()) == 5

    # snapshot history intact: 5 snapshots (2 inserts + 3 overwrites)
    assert engine.sql(
        "SELECT count(*) AS n FROM `store_sales_out$snapshots`"
    ).collect()[0].n == 5


def test_ctas_managed(engine, spark):
    engine.sql("""
        CREATE TABLE sales_summary USING parquet
        OPTIONS (addTableManagement 'true')
        PARTITIONED BY (ss_sold_date_sk)
        AS SELECT ss_item_sk, ss_quantity, ss_sold_date_sk FROM store_sales_src
    """)
    assert engine.sql("SELECT count(*) AS n FROM sales_summary").collect()[0].n == 2109


def test_join_with_managed_table(engine, spark):
    # managed table joined against a temp view — delegated to Spark SQL,
    # mirrors the reference's join regression (BasicCreateAndInsertTest.
    # scala:192-201)
    out = engine.sql("""
        SELECT s.ss_sold_date_sk, count(*) AS n
        FROM store_sales_out s
        JOIN store_sales_src r ON s.ss_item_sk = r.ss_item_sk
        GROUP BY s.ss_sold_date_sk ORDER BY s.ss_sold_date_sk
    """).collect()
    assert len(out) == 6


def test_describe_show_create_show_props(engine, spark):
    engine.sql(
        "CREATE TABLE ddl_t (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    engine.sql(
        "ALTER TABLE ddl_t SET TBLPROPERTIES ('bloom.filter.columns'='k')"
    )
    d = engine.sql("DESCRIBE TABLE ddl_t").collect()
    names = [r["col_name"] for r in d]
    assert names == ["k", "v", "part"]
    assert {r["col_name"]: r["is_partition"] for r in d}["part"] is True
    stmt = engine.sql("SHOW CREATE TABLE ddl_t").collect()[0]["createtab_stmt"]
    assert "CREATE TABLE ddl_t" in stmt
    assert "PARTITIONED BY (part)" in stmt
    assert "'bloom.filter.columns'='k'" in stmt
    props = {
        r["key"]: r["value"]
        for r in engine.sql("SHOW TBLPROPERTIES ddl_t").collect()
    }
    assert props.get("bloom.filter.columns") == "k"


def test_inline_version_timestamp_as_of(engine, spark):
    """FROM t VERSION AS OF <id> / TIMESTAMP AS OF '<ts>' — including two
    pins of the SAME table in one query, which the statement-level
    `as of` prefix cannot express."""
    import pyspark.sql.functions as F

    engine.sql(
        "CREATE TABLE tt_t (k BIGINT, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    ).createOrReplaceTempView("tt_src")
    engine.sql("INSERT INTO tt_t SELECT * FROM tt_src")
    t = engine.catalog.load_table("tt_t")
    v1 = t.meta.snapshots[0].snapshot_id
    ts1 = t.meta.snapshots[0].timestamp_ms
    engine.sql("INSERT INTO tt_t SELECT k + 100, part FROM tt_src")

    assert (
        engine.sql(f"SELECT COUNT(*) AS n FROM tt_t VERSION AS OF {v1}")
        .collect()[0]["n"]
        == 10
    )
    assert (
        engine.sql(
            f"SELECT COUNT(*) AS n FROM tt_t FOR SYSTEM_VERSION AS OF {v1}"
        ).collect()[0]["n"]
        == 10
    )
    assert (
        engine.sql(f"SELECT COUNT(*) AS n FROM tt_t TIMESTAMP AS OF '{ts1}'")
        .collect()[0]["n"]
        == 10
    )
    assert engine.sql("SELECT COUNT(*) AS n FROM tt_t").collect()[0]["n"] == 20
    # two pins of the same table joined in one statement
    row = engine.sql(
        f"SELECT (SELECT COUNT(*) FROM tt_t VERSION AS OF {v1}) AS old_n, "
        "(SELECT COUNT(*) FROM tt_t) AS new_n"
    ).collect()[0]
    assert (row["old_n"], row["new_n"]) == (10, 20)


def test_add_drop_partition_field(engine, spark):
    """Iceberg partition-evolution DDL: ADD/DROP PARTITION FIELD updates
    the spec for FUTURE writes; old-spec files remain scannable (per-file
    specs), and dropping the last field is rejected."""
    import pyspark.sql.functions as F
    import pytest as _pytest

    engine.sql(
        "CREATE TABLE pe_t (k BIGINT, a INT, b INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (a)"
    )
    spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("int").alias("a"),
        (F.col("id") % 4).cast("int").alias("b"),
    ).createOrReplaceTempView("pe_src")
    engine.sql("INSERT INTO pe_t SELECT * FROM pe_src")
    row = engine.sql("ALTER TABLE pe_t ADD PARTITION FIELD b").collect()[0]
    assert row["partition_spec"] == "a, b"
    engine.sql("INSERT INTO pe_t SELECT * FROM pe_src")
    assert engine.sql("SELECT COUNT(*) AS n FROM pe_t").collect()[0]["n"] == 40
    assert (
        engine.sql("SELECT COUNT(*) AS n FROM pe_t WHERE a = 1").collect()[0]["n"]
        == 20
    )
    row = engine.sql("ALTER TABLE pe_t DROP PARTITION FIELD a").collect()[0]
    assert row["partition_spec"] == "b"
    with _pytest.raises(Exception):
        engine.sql("ALTER TABLE pe_t DROP PARTITION FIELD b")  # last field


def test_truncate_table(engine, spark):
    import pyspark.sql.functions as F

    engine.sql(
        "CREATE TABLE trunc_t (k BIGINT, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.range(30).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    ).createOrReplaceTempView("trunc_src")
    engine.sql("INSERT INTO trunc_t SELECT * FROM trunc_src")
    t = engine.catalog.load_table("trunc_t")
    s0 = t.meta.current_snapshot().snapshot_id
    row = engine.sql("TRUNCATE TABLE trunc_t").collect()[0]
    assert row["deleted_rows"] == 30
    assert engine.sql("SELECT COUNT(*) AS n FROM trunc_t").collect()[0]["n"] == 0
    t.refresh()
    assert t.meta.current_snapshot().num_added_files == 0  # metadata-only
    assert t.to_df(snapshot_id=s0).count() == 30  # time travel intact


def test_write_ordered_by_ddl(spark, tmp_path):
    import pyspark.sql.functions as F

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wowh"))
    tbl = eng.catalog.create_table(
        "t_wo_ddl", "k bigint, v bigint, m int", partition_cols=["m"]
    )
    assert (
        eng.sql("ALTER TABLE t_wo_ddl WRITE ORDERED BY (v)")
        .collect()[0]["sort_order"]
        == "v"
    )
    tbl.refresh()
    assert tbl.meta.properties["sort.order"] == "v"
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        ((F.col("id") * 7919) % 500).alias("v"),
        (F.col("id") % 2).cast("int").alias("m"),
    )
    tbl.insert(df.repartition(2))
    viol = (
        tbl.to_df()
        .select(
            "v",
            F.expr("_metadata.file_path").alias("fp"),
            F.expr("_metadata.row_index").alias("ri"),
        )
        .selectExpr(
            "CASE WHEN lag(v) OVER (PARTITION BY fp ORDER BY ri) > v"
            " THEN 1 ELSE 0 END AS x"
        )
        .agg(F.sum("x").alias("s"))
        .collect()[0]["s"]
    )
    assert viol == 0
    import pytest

    with pytest.raises(ValueError, match="unknown"):
        eng.sql("ALTER TABLE t_wo_ddl WRITE ORDERED BY (missing_col)")
    assert (
        eng.sql("ALTER TABLE t_wo_ddl WRITE UNORDERED")
        .collect()[0]["sort_order"]
        == ""
    )
    tbl.refresh()
    assert "sort.order" not in tbl.meta.properties


def test_write_ordered_malformed_and_backticks(spark, tmp_path):
    import pytest

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "womwh"))
    eng.catalog.create_table(
        "t_wo_strict", "k bigint, v bigint, m int", partition_cols=["m"]
    )
    # backticked column list parses (backticks stripped before the
    # schema check)
    assert (
        eng.sql("ALTER TABLE t_wo_strict WRITE ORDERED BY (`v`, `k`)")
        .collect()[0]["sort_order"]
        == "v,k"
    )
    # bare (paren-less) form still accepted
    assert (
        eng.sql("ALTER TABLE t_wo_strict WRITE ORDERED BY v")
        .collect()[0]["sort_order"]
        == "v"
    )
    # unbalanced parens / stray tokens fail loudly instead of falling
    # through to the next handler
    with pytest.raises(ValueError, match="cannot parse"):
        eng.sql("ALTER TABLE t_wo_strict WRITE ORDERED BY (v, k")
    with pytest.raises(ValueError, match="cannot parse"):
        eng.sql("ALTER TABLE t_wo_strict WRITE ORDERED BY v, k)")
    with pytest.raises(ValueError, match="cannot parse"):
        eng.sql("ALTER TABLE t_wo_strict WRITE SORTED BY (v)")


def test_identifier_fields_ddl(spark, tmp_path):
    """SET/DROP IDENTIFIER FIELDS persists the row-identity contract and
    create_changelog_view defaults its identifier_columns to it."""
    import pyspark.sql.functions as F
    import pytest

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "idfwh"))
    tbl = eng.catalog.create_table(
        "t_idf", "k bigint, v bigint, m int", partition_cols=["m"]
    )
    tbl.insert(
        spark.range(40).select(
            F.col("id").alias("k"),
            (F.col("id") * 3).alias("v"),
            (F.col("id") % 2).cast("int").alias("m"),
        )
    )
    s1 = tbl.meta.current_snapshot()
    assert (
        eng.sql("ALTER TABLE t_idf SET IDENTIFIER FIELDS (`k`)")
        .collect()[0]["identifier_fields"]
        == "k"
    )
    tbl.refresh()
    assert tbl.meta.properties["identifier.fields"] == "k"
    with pytest.raises(ValueError, match="unknown columns"):
        eng.sql("ALTER TABLE t_idf SET IDENTIFIER FIELDS (nope)")
    with pytest.raises(ValueError, match="not identifier fields"):
        eng.sql("ALTER TABLE t_idf DROP IDENTIFIER FIELDS (v)")
    # malformed statements on a managed table fail with a TARGETED error
    # (the WRITE ORDERED probe discipline), never an unrelated Spark one
    with pytest.raises(ValueError, match="cannot parse ALTER TABLE"):
        eng.sql("ALTER TABLE t_idf SET IDENTIFIER FIELDS (k, v")
    with pytest.raises(ValueError, match="cannot parse ALTER TABLE"):
        eng.sql("ALTER TABLE t_idf DROP IDENTIFIER FIELDS")
    # changelog view with NO identifier_columns follows the contract:
    # an UPDATE appears as pre/post images keyed on k
    eng.sql("UPDATE t_idf SET v = v + 1 WHERE k % 10 = 3")
    eng.sql(
        f"CALL system.create_changelog_view(table => 't_idf',"
        f" from_snapshot_id => {s1.snapshot_id},"
        f" view_name => 'idf_changes')"
    )
    kinds = {
        r["_change_type"]
        for r in spark.sql(
            "SELECT DISTINCT _change_type FROM idf_changes"
        ).collect()
    }
    assert kinds == {"update_preimage", "update_postimage"}
    # after DROP, the same CALL degrades to delete+insert rows
    assert (
        eng.sql("ALTER TABLE t_idf DROP IDENTIFIER FIELDS (k)")
        .collect()[0]["identifier_fields"]
        == ""
    )
    tbl.refresh()
    assert "identifier.fields" not in tbl.meta.properties
    eng.sql(
        f"CALL system.create_changelog_view(table => 't_idf',"
        f" from_snapshot_id => {s1.snapshot_id},"
        f" view_name => 'idf_changes2')"
    )
    kinds2 = {
        r["_change_type"]
        for r in spark.sql(
            "SELECT DISTINCT _change_type FROM idf_changes2"
        ).collect()
    }
    assert kinds2 == {"delete", "insert"}


def test_rename_table_ddl(spark, tmp_path):
    """ALTER TABLE ... RENAME TO: identifier moves, location stays —
    snapshots, tags, time travel and subsequent writes all survive."""
    import pyspark.sql.functions as F
    import pytest

    from icebergsql_spark.sql import Engine
    from icebergsql_spark.table import TableValidationError

    eng = Engine(spark, str(tmp_path / "rnwh"))
    tbl = eng.catalog.create_table(
        "rn_old", "k bigint, part int", ["part"]
    )
    src = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    )
    tbl.insert(src.filter(F.col("k") < 20))
    eng.sql("ALTER TABLE rn_old CREATE TAG first20")
    # register a temp view for the old name, then rename
    assert eng.sql("SELECT COUNT(*) AS n FROM rn_old").collect()[0][0] == 20
    row = eng.sql("ALTER TABLE rn_old RENAME TO rn_new").collect()[0]
    assert (row["old_name"], row["new_name"]) == ("rn_old", "rn_new")
    assert eng.catalog.table_exists("rn_new")
    assert not eng.catalog.table_exists("rn_old")
    # reads, refs, time travel, writes under the NEW identifier
    assert eng.sql("SELECT COUNT(*) AS n FROM rn_new").collect()[0][0] == 20
    t2 = eng.catalog.load_table("rn_new")
    assert "first20" in t2.meta.refs
    t2.insert(src.filter(F.col("k") >= 20))
    assert eng.sql("SELECT COUNT(*) AS n FROM rn_new").collect()[0][0] == 50
    assert (
        eng.sql("as of 'first20' SELECT COUNT(*) AS n FROM rn_new")
        .collect()[0][0]
        == 20
    )
    # the old identifier no longer answers
    with pytest.raises(Exception):
        eng.sql("SELECT COUNT(*) AS n FROM rn_old").collect()
    # rename refusals: missing source, occupied destination
    with pytest.raises(TableValidationError, match="does not exist"):
        eng.catalog.rename_table("ghost", "x")
    eng.catalog.create_table("rn_other", "k bigint, part int", ["part"])
    with pytest.raises(TableValidationError, match="already exists"):
        eng.catalog.rename_table("rn_new", "rn_other")
    # rename chain: the second rename drops the intermediate pointer
    eng.sql("ALTER TABLE rn_new RENAME TO rn_final")
    assert not eng.catalog.table_exists("rn_new")
    assert (
        eng.sql("SELECT COUNT(*) AS n FROM rn_final").collect()[0][0] == 50
    )
    # drop removes both the physical dir and the pointer dir
    eng.sql("DROP TABLE rn_final")
    assert not eng.catalog.table_exists("rn_final")
    import os

    assert not os.path.exists(str(tmp_path / "rnwh" / "rn_final"))


def test_register_table_procedure(spark, tmp_path):
    """CALL system.register_table adopts an existing table dir zero-copy;
    live-owner duplicates and metadata-less dirs are refused."""
    import pyspark.sql.functions as F
    import pytest

    from icebergsql_spark.sql import Engine
    from icebergsql_spark.table import Catalog, TableValidationError

    # source table built by a DIFFERENT warehouse/catalog
    ext = Catalog(spark, str(tmp_path / "external_wh"))
    src = ext.create_table("orphan_src", "k bigint, part int", ["part"])
    src.insert(
        spark.range(30).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    eng = Engine(spark, str(tmp_path / "main_wh"))
    res = eng.sql(
        f"CALL system.register_table(table => 'adopted', "
        f"metadata_location => '{ext.table_location('orphan_src')}')"
    ).collect()[0]
    assert res["table"] == "adopted"
    assert (
        eng.sql("SELECT COUNT(*) AS n FROM adopted").collect()[0][0] == 30
    )
    # the adopted identifier is fully writable
    eng.catalog.load_table("adopted").insert(
        spark.range(30, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    assert (
        eng.sql("SELECT COUNT(*) AS n FROM adopted").collect()[0][0] == 40
    )
    # duplicate registration of a live-owned location refused
    with pytest.raises(TableValidationError, match="already registered"):
        eng.catalog.register_table(
            "alias2", ext.table_location("orphan_src")
        )
    # a dir without table metadata refused
    with pytest.raises(TableValidationError, match="no table metadata"):
        eng.catalog.register_table("junk", str(tmp_path))
    # occupied identifier refused
    with pytest.raises(TableValidationError, match="already exists"):
        eng.catalog.register_table(
            "adopted", ext.table_location("orphan_src")
        )


def test_rename_register_create_interplay(spark, tmp_path):
    """The renamed-away identifier's dir is another table's physical
    location: create_table and register_table must refuse it, and
    dropping an ADOPTED external table only unregisters."""
    import os

    import pyspark.sql.functions as F
    import pytest

    from icebergsql_spark.sql import Engine
    from icebergsql_spark.table import Catalog, TableValidationError

    eng = Engine(spark, str(tmp_path / "irwh"))
    tbl = eng.catalog.create_table("ir_a", "k bigint, part int", ["part"])
    tbl.insert(
        spark.range(10).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    eng.catalog.rename_table("ir_a", "ir_b")
    # re-creating the renamed-away name would hijack ir_b's metadata
    with pytest.raises(TableValidationError, match="renamed away"):
        eng.catalog.create_table("ir_a", "k bigint, part int", ["part"])
    # registering another location under that name would plant a
    # pointer inside ir_b's physical dir (and a later drop would
    # delete ir_b's data)
    ext = Catalog(spark, str(tmp_path / "ir_ext"))
    src = ext.create_table("ir_src", "k bigint, part int", ["part"])
    src.insert(
        spark.range(5).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    with pytest.raises(TableValidationError, match="physical location"):
        eng.catalog.register_table(
            "ir_a", ext.table_location("ir_src")
        )
    # RENAMING another table onto the tombstoned name would write
    # link.text into ir_b's physical dir, making ir_b unreachable under
    # ANY name (table_exists checks renamed-to.text before link.text)
    other = eng.catalog.create_table("ir_c", "k bigint, part int", ["part"])
    other.insert(
        spark.range(3).select(
            F.col("id").alias("k"),
            (F.col("id") % 2).cast("int").alias("part"),
        )
    )
    with pytest.raises(TableValidationError, match="physical location"):
        eng.catalog.rename_table("ir_c", "ir_a")
    assert eng.catalog.load_table("ir_c").to_df().count() == 3  # intact
    eng.catalog.drop_table("ir_c")
    assert eng.catalog.load_table("ir_b").to_df().count() == 10  # intact
    # dropping an adopted EXTERNAL table unregisters without touching
    # the other catalog's data
    eng.catalog.register_table("ir_adopt", ext.table_location("ir_src"))
    assert eng.catalog.load_table("ir_adopt").to_df().count() == 5
    eng.catalog.drop_table("ir_adopt")
    assert not eng.catalog.table_exists("ir_adopt")
    assert ext.table_exists("ir_src")
    assert ext.load_table("ir_src").to_df().count() == 5
    # warehouse-owned tables still delete fully on drop
    eng.catalog.drop_table("ir_b")
    assert not os.path.exists(str(tmp_path / "irwh" / "ir_a"))
    assert not os.path.exists(str(tmp_path / "irwh" / "ir_b"))
