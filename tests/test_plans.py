"""Physical-plan assertions — parity with the reference's plan introspection
tests (BasicCreateAndInsertTest.scala:150-155 asserts on derived filters;
utils/utils.scala:43-69 lists scanned files). Here: broadcast strategy for
dimension joins, parquet filter pushdown, and no-Python-UDF in JVM-path
operators."""

from __future__ import annotations

import pytest

from icebergsql_spark.plans import REGISTRY, load_all
from tests.conftest import SF_SMOKE

load_all()


def plan_of(spark, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = REGISTRY[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"])
def test_dimension_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan
    # no accidental cartesian products
    assert "CartesianProduct" not in plan


def test_filters_push_to_parquet(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # ReadSchema should include only the 4 referenced columns, not all 11
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema and "l_returnflag" not in read_schema
    assert "l_discount" in read_schema and "l_quantity" in read_schema


def test_jvm_operators_have_no_python_eval(spark):
    # hash/dedup/text operators must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython nodes); only the multimodal mapInPandas is allowed
    # Python
    for name in ["dedup_minhash_signatures", "dedup_simhash", "text_token_stats",
                 "ann_bruteforce_topk"]:
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
    assert "MapInPandas" in plan_of(spark, "multimodal_blob_features")


def test_topk_plans_as_take_ordered(spark):
    plan = plan_of(spark, "sort_multi_key_limit")
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k
