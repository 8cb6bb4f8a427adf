"""Type-coverage fixture (FIXTURES.md §3): every supported type round-trips
through a managed table; unsupported types raise clean errors.

Mirrors the reference's type matrix (/root/reference/src/main/scala/org/
apache/spark/sql/iceberg/utils/TypeConversions.scala:37-100): boolean,
byte/short/int (widened), long, float, double, string, date, timestamp,
decimal (small + max precision), binary, array, map, struct, nested
combinations; CalendarInterval / UDT / Null are rejected
(TypeConversions.scala:42-43, :99).
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from icebergsql_spark.table import (
    Catalog,
    TableValidationError,
    validate_schema_types,
)

FULL_DDL = (
    "id int, b boolean, tiny byte, small short, big bigint, f float, d double, "
    "s string, dte date, ts timestamp_ntz, dec_small decimal(7,2), "
    "dec_big decimal(38,10), bin binary, arr array<int>, "
    "mp map<string,int>, st struct<a:int,b:string>, "
    "nested struct<xs:array<map<string,int>>>, part string"
)

ROWS = [
    (
        1, True, 1, 2, 3, 1.5, 2.5, "hello", dt.date(2024, 1, 2),
        dt.datetime(2024, 1, 2, 3, 4, 5), Decimal("12345.67"),
        Decimal("123.4567890123"), b"\x01\x02", [1, 2, 3], {"k": 1},
        (7, "x"), ([{"m": 1}],), "p1",
    ),
    (
        2, False, None, None, None, None, None, None, None, None, None,
        None, None, None, None, None, None, "p1",
    ),
]


def test_full_type_roundtrip(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh"))
    tbl = catalog.create_table("types", FULL_DDL, partition_cols=["part"])
    src = spark.createDataFrame(ROWS, T.StructType.fromDDL(FULL_DDL))
    tbl.insert(src)
    got = {r["id"]: r for r in tbl.to_df().collect()}
    assert len(got) == 2
    r1 = got[1]
    assert r1["dec_big"] == Decimal("123.4567890123")
    assert r1["bin"] == b"\x01\x02"
    assert r1["arr"] == [1, 2, 3] and r1["mp"] == {"k": 1}
    assert r1["st"]["a"] == 7 and r1["nested"]["xs"] == [{"m": 1}]
    assert r1["ts"] == dt.datetime(2024, 1, 2, 3, 4, 5)
    r2 = got[2]
    assert r2["s"] is None and r2["arr"] is None and r2["st"] is None

    # stats-based pruning still works alongside exotic columns
    scan = tbl.scan(where="id = 99")
    assert scan.files_scanned == 0


def test_unsupported_types_rejected(spark, tmp_path):
    catalog = Catalog(spark, str(tmp_path / "wh2"))
    bad = T.StructType(
        [
            T.StructField("a", T.IntegerType()),
            T.StructField("iv", T.CalendarIntervalType()),
            T.StructField("part", T.StringType()),
        ]
    )
    with pytest.raises(TableValidationError, match="unsupported column type"):
        catalog.create_table("bad_types", bad, partition_cols=["part"])
    with pytest.raises(TableValidationError, match="unsupported column type"):
        validate_schema_types(
            T.StructType([T.StructField("n", T.NullType())])
        )
    # nested unsupported type is caught with its path
    with pytest.raises(TableValidationError, match=r"xs\[\]"):
        validate_schema_types(
            T.StructType(
                [T.StructField("xs", T.ArrayType(T.CalendarIntervalType()))]
            )
        )
