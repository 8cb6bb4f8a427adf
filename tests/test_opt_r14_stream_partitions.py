"""Round-14 optimization lock: size-adaptive streaming partitions.

``stream_partitions`` derives a streaming query's shuffle/state
partition count from the source dirs' on-disk bytes, capped at the
session's configured value, and restores the conf on exit — so at
cluster scale it is a no-op and local fixtures collapse to a handful
of state stores.
"""

from __future__ import annotations

import os

from tests.conftest import *  # noqa: F401,F403 — spark fixture

from icebergsql_spark.operators.util import stream_partitions


def test_small_source_collapses_and_restores(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"x" * 1024)
    (d / "_SUCCESS").write_bytes(b"")  # metadata files don't count
    old = spark.conf.get("spark.sql.shuffle.partitions")
    with stream_partitions(spark, str(d)) as n:
        assert n == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
    assert spark.conf.get("spark.sql.shuffle.partitions") == old


def test_large_source_capped_at_session_value(spark, tmp_path):
    d = tmp_path / "big"
    d.mkdir()
    # fake a large source via target_bytes=1 so ceil(size/1) >> cap
    (d / "part-0.parquet").write_bytes(b"x" * 4096)
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    with stream_partitions(spark, str(d), target_bytes=1) as n:
        assert n == cap  # session value wins at scale


def test_restore_on_exception(spark, tmp_path):
    d = tmp_path / "err"
    d.mkdir()
    (d / "f.parquet").write_bytes(b"x")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        with stream_partitions(spark, str(d)):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == old
