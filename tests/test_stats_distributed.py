"""Distributed stats collection (the >256-file Spark fan-out path) and
planning cost on a many-file table."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from icebergsql_spark.catalog.stats import DISTRIBUTE_THRESHOLD, collect_stats
from icebergsql_spark.table import Catalog
from tests.conftest import SF_SMOKE


def test_distributed_stats_path(spark, tmp_path):
    """Above DISTRIBUTE_THRESHOLD files, stats collect via Spark executors
    (ColStats must survive pickling); results must equal the local path."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    out = str(tmp_path / "many")
    n_files = DISTRIBUTE_THRESHOLD + 20
    li.repartition(n_files).write.parquet(out)
    import os

    paths = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(paths) > DISTRIBUTE_THRESHOLD

    dist = collect_stats(paths, spark=spark)
    local = collect_stats(paths[:8], spark=None)
    assert len(dist) == len(paths)
    for p in paths[:8]:
        dn, dsz, dst = dist[p]
        ln, lsz, lst = local[p]
        assert (dn, dsz) == (ln, lsz)
        assert dst.keys() == lst.keys()
        for c in dst:
            assert (dst[c].min, dst[c].max, dst[c].null_count) == (
                lst[c].min, lst[c].max, lst[c].null_count
            )


def test_many_file_planning_cost(spark, tmp_path):
    """Driver-side planning over a few hundred files stays sub-second —
    the manifest model's point (no file listing, no footer reads at plan
    time)."""
    catalog = Catalog(spark, str(tmp_path / "wh"))
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").withColumn(
        "bucket", (F.col("l_orderkey") % 40).cast("int")
    )
    tbl = catalog.create_table(
        "many", li.schema, partition_cols=["bucket"]
    )
    tbl.insert(li.repartition(8))  # 40 partitions × ≤8 tasks ≈ 300 files
    n_files = len(tbl.meta.current_snapshot().live_files())
    assert n_files > 100

    t0 = time.time()
    scan = tbl.scan(where="bucket = 7 AND l_quantity < 10")
    plan_s = time.time() - t0
    assert plan_s < 1.0, f"planning took {plan_s:.2f}s for {n_files} files"
    assert 0 < scan.files_scanned <= n_files // 40 + 8
    assert scan.dataframe().count() > 0
