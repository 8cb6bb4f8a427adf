"""Local replica of the driver's duckdb-oracle correctness gate.

Mirrors the reference's correctness harness idea (`cTest`/`isTwoDataFrameEqual`
at /root/reference/src/test/scala/org/apache/spark/sql/hive/test/iceberg/
AbstractTest.scala:86-100,130-220): run the engine query and an oracle SQL,
sort-normalize, compare. Here the oracle engine is DuckDB over the same
parquet files, and comparison is exact on canonicalized values (our queries
are engineered to be bit-deterministic — see plans/tpch.py docstring).
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from icebergsql_spark.plans.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        if isinstance(v, pd.Timestamp) and v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s_rows, d_rows = canon_rows(spark_pdf), canon_rows(duck_pdf)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def run_compare(spark, name: str, sf_dir: str) -> int:
    """Run registry query `name` on Spark and DuckDB; assert equal. Returns rows."""
    from icebergsql_spark.plans.registry import REGISTRY

    spec = REGISTRY[name]
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) >= 0
        return len(spark_pdf)
    con = duck_connection(sf_dir)
    duck_pdf = con.execute(spec.oracle).df()
    compare_frames(spark_pdf, duck_pdf, name)
    return len(spark_pdf)
