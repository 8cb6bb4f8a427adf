"""Self-check of the driver's t2 gate: every registered query vs DuckDB.

Runs at sf0.001 (fast); the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from icebergsql_spark.plans import REGISTRY, load_all
from tests.conftest import SF_SMOKE
from tests.oracle import run_compare

load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    run_compare(spark, name, SF_SMOKE)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)
