"""Hypothesis fuzz: random predicate trees never change scan results.

Generates random comparison/IN/null predicates over the store_sales fixture
columns, combines them with AND/OR/NOT, and asserts the pruned scan equals
full-scan + filter — the same invariant as test_pruning_soundness, explored
randomly."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from icebergsql_spark.table import Catalog
from tests.store_sales_fixture import COLUMN_DEPENDENCIES, SCHEMA_DDL, build_store_sales_df

DATES = ["0905245", "0906245", "0907245", "0908245", "0909245", "0910245", "0999999"]


def leaf_strategy():
    int_col = st.sampled_from(["ss_item_sk", "ss_quantity"])
    int_val = st.integers(min_value=-10, max_value=20000)
    str_val = st.sampled_from(DATES)
    op = st.sampled_from(["=", "!=", "<", "<=", ">", ">="])
    int_cmp = st.builds(lambda c, o, v: f"{c} {o} {v}", int_col, op, int_val)
    str_cmp = st.builds(
        lambda o, v: f"ss_sold_date_sk {o} '{v}'", st.sampled_from(["=", "!="]), str_val
    )
    in_list = st.builds(
        lambda vs: "ss_sold_date_sk IN (" + ", ".join(f"'{v}'" for v in vs) + ")",
        st.lists(st.sampled_from(DATES), min_size=1, max_size=3),
    )
    null_chk = st.sampled_from(
        ["ss_item_sk IS NOT NULL", "ss_sold_month IS NULL", "ss_sold_day = '0907'"]
    )
    like = st.builds(
        lambda neg, pat: f"ss_sold_date_sk {neg}LIKE '{pat}'",
        st.sampled_from(["", "NOT "]),
        st.sampled_from(["09%", "0906%", "%245", "09_6245", "0906245", "%09%"]),
    )
    return st.one_of(int_cmp, str_cmp, in_list, null_chk, like)


def tree_strategy():
    return st.recursive(
        leaf_strategy(),
        lambda children: st.one_of(
            st.builds(lambda a, b: f"({a}) AND ({b})", children, children),
            st.builds(lambda a, b: f"({a}) OR ({b})", children, children),
            st.builds(lambda a: f"NOT ({a})", children),
        ),
        max_leaves=4,
    )


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    catalog = Catalog(spark, str(tmp_path_factory.mktemp("wh_fuzz")))
    tbl = catalog.create_table(
        "fuzz", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"],
        properties={"columnDependencies": COLUMN_DEPENDENCIES},
    )
    tbl.insert(build_store_sales_df(spark))
    return tbl


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=tree_strategy())
def test_random_predicates_sound(spark, table, pred):
    expected = table.scan().dataframe().filter(pred).count()
    scan = table.scan(where=pred)
    got = scan.dataframe().count()
    assert got == expected, f"pruning changed results for: {pred}"
