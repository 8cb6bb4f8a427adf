"""Locks for the r15 emb_top_eigvec driver-tail restructure.

The gate's only Spark work is now the xq quantization pass; the bounded
64x64 power-iteration chain runs driver-side as a bit-exact replica of
the former one-statement SQL (plans/pipeline44._eig_driver_tail). These
tests pin (a) the ROUND(double) replica against Spark's own ROUND on the
known hard cases, and (b) frame identity of the new gate against the old
full-SQL formulation.
"""

from __future__ import annotations

import random
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest


def _rhu(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def test_round_replica_matches_spark(spark):
    vals = [
        2.5, 3.5, -2.5, -3.5,
        0.49999999999999994, -0.49999999999999994,
        0.5000000000000001, 1e15 + 0.5, 123.456, -999.9999999999999,
    ]
    rng = random.Random(7)
    vals += [rng.uniform(-1e6, 1e6) for _ in range(300)]
    exprs = ", ".join(
        f"CAST(ROUND(CAST({v!r} AS DOUBLE)) AS BIGINT) AS r{i}"
        for i, v in enumerate(vals)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for i, v in enumerate(vals):
        assert row[i] == _rhu(v), f"ROUND mismatch at {v!r}"


def test_driver_tail_matches_old_sql(spark):
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans import REGISTRY, load_all
    from icebergsql_spark.plans.pipeline44 import _eig_sql
    from icebergsql_spark.plans.registry import load_tables

    load_all()
    sf = "/root/testdata/sf0.001"
    new = REGISTRY["emb_top_eigvec"].spark(spark, sf).toPandas()
    ensure_parallelism(
        load_tables(spark, sf, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    old = spark.sql(_eig_sql("spark")).toPandas()
    pd.testing.assert_frame_equal(
        new.reset_index(drop=True), old.reset_index(drop=True)
    )


def test_composed_template_unchanged():
    # the registered oracle is built from the composed template; the
    # split must never drift from head + tail
    from icebergsql_spark.plans.pipeline44 import (
        _EIG_HEAD_SQL,
        _EIG_SQL,
        _EIG_TAIL_SQL,
        _EIG_XQ_SQL,
    )

    assert _EIG_SQL == _EIG_HEAD_SQL + _EIG_TAIL_SQL
    assert _EIG_HEAD_SQL.startswith(_EIG_XQ_SQL)


def test_sum_fold_is_sequential():
    from icebergsql_spark.plans.pipeline44 import sum_fold

    # a pairwise/compensated sum would differ on this classic series;
    # the SQL fold is strictly sequential from 0.0
    terms = [1e16, 1.0, -1e16, 1.0]
    assert sum_fold(iter(terms)) == (((0.0 + 1e16) + 1.0) + -1e16) + 1.0
