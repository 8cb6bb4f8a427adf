"""Per-table manifest pruning for JOIN queries through Engine.sql.

The single-table WHERE-extraction path (see test_sql_engine) generalizes to
joins: top-level AND conjuncts are attributed to the one join input whose
columns they reference, and each managed table's file planning applies only
its own conjuncts — the manifest-level analogue of Catalyst's
PushDownPredicates. Soundness cases (outer-join IS NULL, self-joins,
cross-table conjuncts, unknown schemas) must all degrade to "don't prune",
never to a wrong file set.
"""

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.sql import (
    Engine,
    _column_refs,
    _parse_from_relations,
    _split_conjuncts,
)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    facts = spark.range(400).select(
        F.col("id").alias("fk"),
        (F.col("id") % 8).cast("int").alias("fpart"),
        (F.col("id") * 2.0).alias("amount"),
    )
    dims = spark.range(64).select(
        F.col("id").alias("dk"),
        (F.col("id") / 16).cast("int").alias("dpart"),
        F.concat(F.lit("n"), F.col("id")).alias("dname"),
    )
    eng.sql("CREATE TABLE facts (fk bigint, fpart int, amount double) USING parquet "
            "OPTIONS (addTableManagement 'true') PARTITIONED BY (fpart)")
    eng.sql("CREATE TABLE dims (dk bigint, dpart int, dname string) USING parquet "
            "OPTIONS (addTableManagement 'true') PARTITIONED BY (dpart)")
    facts.createOrReplaceTempView("facts_src")
    dims.createOrReplaceTempView("dims_src")
    eng.sql("INSERT INTO facts SELECT * FROM facts_src")
    eng.sql("INSERT INTO dims SELECT * FROM dims_src")
    return eng


def _total_files(engine, name):
    return engine.table(name).scan().files_scanned


def _files_of(engine, view):
    """File count of the (pruned) temp view the last engine.sql registered."""
    return len(engine.spark.table(view).inputFiles())


def test_join_prunes_both_sides(engine):
    total_f = _total_files(engine, "facts")
    total_d = _total_files(engine, "dims")
    df = engine.sql(
        "SELECT f.fk, d.dname FROM facts f JOIN dims d ON f.fk % 64 = d.dk "
        "WHERE f.fpart = 3 AND d.dpart = 1 AND f.amount > 0"
    )
    # the registered views now hold the pruned scans
    assert _files_of(engine, "facts") < total_f
    assert _files_of(engine, "dims") < total_d
    rows = df.collect()
    assert rows and all(r.fk % 8 == 3 for r in rows)


def test_unqualified_conjuncts_attributed_by_schema(engine):
    total_f = _total_files(engine, "facts")
    total_d = _total_files(engine, "dims")
    df = engine.sql(
        "SELECT fk, dname FROM facts JOIN dims ON fk % 64 = dk "
        "WHERE fpart = 5 AND dpart = 2"
    )
    assert _files_of(engine, "facts") < total_f
    assert _files_of(engine, "dims") < total_d
    assert df.count() == sum(1 for i in range(400) if i % 8 == 5 and (i % 64) // 16 == 2)


def test_outer_join_is_null_never_prunes_nullable_side(engine):
    """`f LEFT JOIN d ... WHERE d.dk IS NULL` is the anti-join idiom:
    pruning dims pre-join would fabricate null-extended matches."""
    total_d = _total_files(engine, "dims")
    df = engine.sql(
        "SELECT f.fk FROM facts f LEFT JOIN dims d ON f.fk = d.dk "
        "WHERE d.dk IS NULL"
    )
    assert _files_of(engine, "dims") == total_d  # untouched
    # fk 0..63 match dims, 64..399 do not
    assert df.count() == 400 - 64


def test_outer_join_null_rejecting_conjunct_prunes(engine):
    total_d = _total_files(engine, "dims")
    df = engine.sql(
        "SELECT f.fk, d.dname FROM facts f LEFT JOIN dims d ON f.fk = d.dk "
        "WHERE d.dpart = 1"
    )
    assert _files_of(engine, "dims") < total_d
    assert df.count() == sum(1 for i in range(64) if i // 16 == 1)


def test_self_join_not_pruned(engine):
    total_f = _total_files(engine, "facts")
    df = engine.sql(
        "SELECT a.fk FROM facts a JOIN facts b ON a.fk = b.fk + 1 "
        "WHERE a.fpart = 2 AND b.fpart = 1"
    )
    assert _files_of(engine, "facts") == total_f  # both aliases share the view
    assert df.count() == sum(
        1 for i in range(1, 400) if i % 8 == 2 and (i - 1) % 8 == 1
    )


def test_cross_table_conjunct_not_used(engine):
    total_f = _total_files(engine, "facts")
    total_d = _total_files(engine, "dims")
    engine.sql(
        "SELECT f.fk FROM facts f JOIN dims d ON f.fk = d.dk "
        "WHERE f.fpart > d.dpart"
    ).collect()
    assert _files_of(engine, "facts") == total_f
    assert _files_of(engine, "dims") == total_d


def test_subquery_shape_bails(engine):
    total_f = _total_files(engine, "facts")
    df = engine.sql(
        "SELECT s.fk FROM (SELECT fk, fpart FROM facts) s JOIN dims d "
        "ON s.fk = d.dk WHERE s.fpart = 3 AND d.dpart = 0"
    )
    assert _files_of(engine, "facts") == total_f
    assert df.count() == sum(1 for i in range(64) if i % 8 == 3 and i // 16 == 0)


# ----------------------------------------------------------- unit pieces --


def test_split_conjuncts_respects_parens_and_strings():
    assert _split_conjuncts("a = 1 AND (b = 2 OR c = 3) AND d = 'x AND y'") == [
        "a = 1",
        "(b = 2 OR c = 3)",
        "d = 'x AND y'",
    ]
    assert _split_conjuncts("a和=1") == ["a和=1"]


def test_column_refs_shapes():
    assert _column_refs("t.a = 1 AND b < 2") == [("t", "a"), (None, "b")]
    assert _column_refs("year(ship) = 1996") == [(None, "ship")]
    assert _column_refs("a IN (1, 2)") == [(None, "a")]
    assert _column_refs("cast(x as int) = 1") == [(None, "x")]
    assert _column_refs("`q` = 1") is None  # quoted: unanalyzable
    assert _column_refs("a = (select max(b) from t)") is None
    assert _column_refs("db.t.c = 1") is None  # 3-part
    assert _column_refs("x = '1996-01-01'") == [(None, "x")]


def test_parse_from_relations():
    assert _parse_from_relations(" t1 a JOIN t2 AS b ON a.x = b.y ") == [
        ("t1", "a"),
        ("t2", "b"),
    ]
    assert _parse_from_relations(" t1, t2 b ") == [("t1", "t1"), ("t2", "b")]
    assert _parse_from_relations(" t1 LEFT OUTER JOIN t2 ON t1.x = t2.y ") == [
        ("t1", "t1"),
        ("t2", "t2"),
    ]
    assert _parse_from_relations(" (select 1) s ") is None
