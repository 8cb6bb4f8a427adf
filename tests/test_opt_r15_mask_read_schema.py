"""Round-15: pinned read schemas on DV / equality-delete rowsets.

Every Spark parquet read of a mask payload (DV rowsets, eq-delete
rowsets, just-written bloom inputs) carries an explicit schema so no
footer-sampling schema-inference job runs per masked read / commit.
That is only sound if the payloads' physical types are always readable
under the pinned (current-era) schema:

- DV rowsets are written as (path string, pos long) by construction.
- eq rowsets are CAST to the table schema's key types at write time.
- the one legal later evolution of a key column — lossless widening
  (int->bigint, float->double) — must still read, via Spark's parquet
  type promotion under an explicit schema (renames/drops of live eq
  key columns are refused by _guard_eq_delete_keys).

These tests lock the two hazard cases and the exact-mask invariant.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.session import get_spark
from icebergsql_spark.table import Catalog


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="mask-read-schema-tests")


def _fresh(spark, name, ddl, **kw):
    return Catalog(spark, tempfile.mkdtemp(prefix="maskwh-")).create_table(
        name, ddl + ", p int", partition_cols=["p"], **kw
    )


def test_eq_mask_survives_key_column_widening(spark):
    """delete_by_keys on an int key, then ALTER COLUMN TYPE to bigint:
    the eq payload holds int32 while the pinned read schema says long —
    Spark's parquet promotion must keep the mask exact."""
    tbl = _fresh(spark, "widen_eq", "k int, v string")
    tbl.insert(spark.sql("SELECT CAST(id AS INT) AS k, CAST(id AS STRING) AS v, CAST(id % 2 AS INT) AS p FROM range(100)"))
    keys = spark.sql("SELECT CAST(id * 10 AS INT) AS k FROM range(5)")
    tbl.delete_by_keys(keys, ["k"])
    assert tbl.to_df().count() == 95
    tbl.alter_column_type("k", "bigint")
    df = tbl.to_df()
    assert dict(df.schema["k"].jsonValue(), )["type"] == "long"
    assert df.count() == 95
    masked = {r["k"] for r in df.select("k").collect()}
    assert masked == set(range(100)) - {0, 10, 20, 30, 40}


def test_eq_keys_cast_to_table_types_at_write(spark):
    """Caller passes int-typed keys against a bigint key column: the
    write-side cast normalizes the payload, and the mask is exact."""
    tbl = _fresh(spark, "narrow_eq", "k bigint, v string")
    tbl.insert(spark.sql("SELECT id AS k, CAST(id AS STRING) AS v, CAST(id % 2 AS INT) AS p FROM range(50)"))
    keys = spark.sql("SELECT CAST(id AS INT) AS k FROM range(3)")
    tbl.delete_by_keys(keys, ["k"])
    entry = tbl.meta.current_snapshot().eq_entries()[0]
    payload = spark.read.parquet(entry.eq_path)
    assert dict(payload.schema["k"].jsonValue())["type"] == "long"
    assert tbl.to_df().count() == 47
    assert {r["k"] for r in tbl.to_df().select("k").collect()} == set(
        range(3, 50)
    )


def test_dv_rowset_reads_under_pinned_schema_stay_exact(spark):
    """Two stacked MoR predicate deletes: the second commit anti-joins
    the PRIOR DV rowset under the pinned schema; counts and the masked
    rowset must stay exact (the additive count invariant)."""
    tbl = _fresh(
        spark,
        "dvpin",
        "k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    tbl.insert(spark.sql("SELECT id AS k, CAST(id AS STRING) AS v, CAST(id % 2 AS INT) AS p FROM range(200)"))
    tbl.delete_where("k % 7 = 0")
    tbl.delete_where("k % 7 IN (0, 1)")  # overlaps the first commit's rows
    expect = {k for k in range(200) if k % 7 not in (0, 1)}
    got = {r["k"] for r in tbl.to_df().select("k").collect()}
    assert got == expect
    assert tbl.scan().count_from_stats() == len(expect)


def test_eq_then_convert_under_pinned_schema(spark):
    """convert_equality_deletes reads the eq payload under the pinned
    schema and folds it to DVs; the fast-path count must match."""
    tbl = _fresh(
        spark,
        "eqconv",
        "k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    tbl.insert(spark.sql("SELECT id AS k, CAST(id AS STRING) AS v, CAST(id % 2 AS INT) AS p FROM range(120)"))
    tbl.delete_by_keys(spark.sql("SELECT id * 11 AS k FROM range(6)"), ["k"])
    assert tbl.scan().count_from_stats() is None
    tbl.convert_equality_deletes()
    assert tbl.scan().count_from_stats() == 114
    assert tbl.to_df().count() == 114
