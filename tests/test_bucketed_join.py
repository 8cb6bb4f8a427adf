"""Bucketed co-located join: no shuffle Exchange in the plan, same results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.operators.bucketed import cobucketed_join, write_bucketed
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is static; bucketed saveAsTable lands in the
    # session default warehouse — tables are dropped (managed → files
    # removed) in teardown
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_bucketed(li, "li_bkt", "l_orderkey", n_buckets=8)
    write_bucketed(o, "o_bkt", "o_orderkey", n_buckets=8)
    yield "li_bkt", "o_bkt"
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join strategy decision is bucketing's to win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # correctness: same count as the plain join
        li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    df = spark.table(lt).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key still shuffles"
