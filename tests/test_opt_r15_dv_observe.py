"""Lock for the r15 observed-metric DV counts (_commit_dv_rowset).

Per-file delete-vector counts now ride the DV write action as observed
metrics instead of a second Spark job re-reading the written rowset.
Exactness is the invariant everything downstream leans on
(count_from_stats = record_count - Σ DV counts), so this test recounts
every committed DV rowset with an independent groupBy and compares.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def _recount(spark, dv_path):
    return {
        r["path"]: r["n"]
        for r in spark.read.parquet(dv_path)
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_observed_dv_counts_match_recount(spark):
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-dvobs-"))
    tbl = cat.create_table(
        "t_dvobs",
        "k bigint, grp bigint, v string",
        partition_cols=["grp"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    rows = spark.range(0, 5000).selectExpr(
        "id AS k", "id % 4 AS grp", "concat('v', id) AS v"
    )
    tbl.insert(rows)
    # two DV commits: the second exercises the prior-DV anti-join path
    tbl.delete_where("k % 7 = 0")
    tbl.delete_where("k % 11 = 0")
    snap = tbl.meta.current_snapshot()
    entries = snap.dv_entries()
    assert entries, "fixture produced no delete vectors"
    by_dir: dict[str, dict[str, int]] = {}
    for e in entries:
        by_dir.setdefault(e.dv_path, {})[e.data_path] = e.count
    for dv_path, want in by_dir.items():
        got = _recount(spark, dv_path)
        assert got == want, f"observed counts diverge in {dv_path}"
    # the headline invariant: metadata count == true masked count
    assert tbl.scan().count_from_stats() == tbl.to_df().count()


def test_observe_fallback_above_cap(spark, monkeypatch):
    import icebergsql_spark.table as T

    # force the fallback path and assert identical entry counts
    monkeypatch.setattr(T, "_DV_OBSERVE_MAX_FILES", 0)
    cat = T.Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-dvfb-"))
    tbl = cat.create_table(
        "t_dvfb",
        "k bigint, grp bigint, v string",
        partition_cols=["grp"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    tbl.insert(
        spark.range(0, 2000).selectExpr(
            "id AS k", "id % 2 AS grp", "concat('v', id) AS v"
        )
    )
    tbl.delete_where("k % 5 = 0")
    snap = tbl.meta.current_snapshot()
    for e in snap.dv_entries():
        got = _recount(spark, e.dv_path)
        assert got[e.data_path] == e.count
    assert tbl.scan().count_from_stats() == tbl.to_df().count()
