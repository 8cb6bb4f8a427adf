"""Parquet manifests above the entry threshold (VERDICT r1 #8): driver
planning must stay metadata-bounded when one commit lands 10^4+ files."""

from __future__ import annotations

import datetime as dt
import time
from decimal import Decimal

import pytest

from icebergsql_spark.catalog import metadata as M
from icebergsql_spark.catalog.metadata import ColStats, DataFile, Manifest
from icebergsql_spark.expressions import may_match, parse_predicate


def _synthetic_files(n: int) -> list[DataFile]:
    out = []
    for i in range(n):
        out.append(
            DataFile(
                path=f"/data/commit/p={i % 50}/part-{i:06d}.parquet",
                partition={"p": str(i % 50)},
                record_count=1000 + i,
                file_size=10_000 + i,
                stats={
                    "x": ColStats(i, i + 10, 0, 1000 + i),
                    "d": ColStats(
                        dt.date(2020, 1, 1 + i % 28),
                        dt.date(2020, 2, 1 + i % 28),
                        5,
                        1000 + i,
                    ),
                    "m": ColStats(Decimal("1.50"), Decimal("99.75"), None, 1000 + i),
                },
            )
        )
    return out


def test_large_manifest_round_trips_as_parquet(tmp_path):
    files = _synthetic_files(10_000)
    m = Manifest.write(str(tmp_path / "manifest-big.json"), files)
    assert m.path.endswith(".parquet")

    back = Manifest(m.path).files()  # fresh reader, no cache
    assert len(back) == len(files)
    for orig, rt in zip(files[:100], back[:100]):
        assert rt.path == orig.path
        assert rt.partition == orig.partition
        assert rt.record_count == orig.record_count
        assert rt.stats["x"].min == orig.stats["x"].min
        assert rt.stats["d"].max == orig.stats["d"].max  # date round-trip
        assert rt.stats["m"].min == orig.stats["m"].min  # decimal round-trip
        assert rt.stats["m"].null_count is None  # unknown stays unknown


def test_small_manifest_stays_json(tmp_path):
    files = _synthetic_files(3)
    m = Manifest.write(str(tmp_path / "manifest-small.json"), files)
    assert m.path.endswith(".json")
    assert [f.path for f in Manifest(m.path).files()] == [f.path for f in files]


def test_10k_file_planning_is_metadata_bounded(tmp_path):
    """Plan (read manifest + evaluate pruning predicate on every file) over
    10k entries in well under 5s — the driver-side cost that must not grow
    past metadata scale at 100×."""
    m = Manifest.write(str(tmp_path / "manifest-plan.json"), _synthetic_files(10_000))
    pred = parse_predicate("x >= 5000 AND x < 5500 AND p = '7'")
    t0 = time.time()
    files = Manifest(m.path).files()
    survivors = [f for f in files if may_match(pred, f.stats)]
    elapsed = time.time() - t0
    assert 0 < len(survivors) < len(files)
    assert elapsed < 5.0, f"planning took {elapsed:.2f}s over 10k entries"


def test_insert_uses_parquet_manifest_above_threshold(spark, tmp_path, monkeypatch):
    """End-to-end: with the threshold lowered, a real insert writes a parquet
    manifest and scans/prunes through it unchanged."""
    from icebergsql_spark.table import Catalog

    monkeypatch.setattr(M, "PARQUET_MANIFEST_THRESHOLD", 2)
    catalog = Catalog(spark, str(tmp_path / "wh"))
    tbl = catalog.create_table("pm", "a int, p string", partition_cols=["p"])
    src = spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(30)], "a int, p string"
    )
    tbl.insert(src)  # 3 partitions → 3 files ≥ threshold
    snap = tbl.meta.current_snapshot()
    assert any(p.endswith(".parquet") for p in snap.manifest_paths)
    assert tbl.to_df().count() == 30
    scan = tbl.scan(where="p = 'p1'")
    assert scan.files_scanned < len(snap.live_files())  # pruning worked
    assert scan.dataframe().count() == 10
