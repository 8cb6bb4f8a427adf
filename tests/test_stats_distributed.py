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


def test_long_string_bounds_truncated_and_sound(spark, tmp_path):
    """Manifest bounds for long string columns truncate to 16 chars
    (Iceberg truncate(16)): lower = prefix, upper = prefix with last char
    incremented — wider, therefore sound for pruning, and kilobytes of
    document text never reach the metadata layer."""
    import pyspark.sql.functions as F

    from icebergsql_spark.catalog.stats import (
        STAT_TRUNCATE_LEN,
        _truncate_max,
        _truncate_min,
    )
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_trunc"))
    t = cat.create_table(
        "tt", "k bigint, txt string, part int", partition_cols=["part"]
    )
    rows = [
        (1, "aardvark " * 500, 0),
        (2, "zebra " * 500, 0),
        (3, "m" + "x" * 400, 1),
    ]
    t.insert(spark.createDataFrame(rows, "k bigint, txt string, part int"))
    for f in t.meta.current_snapshot().live_files():
        st = f.stats.get("txt")
        if st is None:
            continue
        assert len(st.min) <= STAT_TRUNCATE_LEN
        assert len(st.max) <= STAT_TRUNCATE_LEN
    # bounds remain sound: every row's predicate evaluation is preserved
    assert t.scan(where="txt = 'zzzz'").dataframe().count() == 0
    got = t.scan(where="txt >= 'z'").dataframe().count()
    assert got == 1  # the zebra row
    # direct bound algebra
    assert _truncate_min("a" * 40) == "a" * 16
    assert _truncate_max("a" * 40) == "a" * 15 + "b"
    assert _truncate_max("a" * 40) > "a" * 40
    assert _truncate_min(b"\x01" * 40) == b"\x01" * 16
    assert _truncate_max(b"\xff" * 40) == b"\xff" * 40  # cannot upper-bound
    assert _truncate_max(chr(0x10FFFF) * 20) == chr(0x10FFFF) * 20


def test_truncate_max_skips_surrogate_block():
    """Incrementing into U+D800..U+DFFF would make a bound that is not
    UTF-8-encodable; the increment must jump to U+E000 (still a sound
    upper bound)."""
    from icebergsql_spark.catalog.stats import _truncate_max

    s = "a" * 15 + "\ud7ff" + "tail-beyond-limit"
    out = _truncate_max(s)
    assert out == "a" * 15 + "\ue000"
    assert out > s[:16]
    out.encode("utf-8")  # must be encodable
