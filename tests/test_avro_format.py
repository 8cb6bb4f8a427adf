"""Avro managed tables — the reference's literal fallback format.

utils/utils.scala:168-198 maps every non-parquet table to avro with NO
column metrics (`iceMetrics` is None), so avro files carry record counts
only and never stats-prune; partition pruning still applies. pip pyspark
ships without the external spark-avro datasource, so:

  * metadata/stats parity (avro_file_stats: a pure-Python Object Container
    File block-header scan, Avro 1.11 spec) is tested unconditionally on a
    hand-built OCF file — no avro library exists in this container, which
    is exactly why the parser reads the public wire format directly;
  * the Spark read/write round-trip tests run only when the datasource is
    on the classpath (skipif), and the gate error is asserted otherwise.
"""

from __future__ import annotations

import struct

import pytest

from icebergsql_spark.catalog.stats import avro_file_stats, collect_stats
from icebergsql_spark.table import (
    Catalog,
    TableValidationError,
    _avro_datasource_available,
)


def _zigzag(n: int) -> bytes:
    """Avro long: zig-zag + varint (spec 'Primitive Types')."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_ocf(path, block_counts, codec=b"null"):
    """Minimal Avro OCF: long records, null codec, given per-block counts."""
    schema = b'{"type":"record","name":"r","fields":[{"name":"k","type":"long"}]}'
    sync = bytes(range(16))
    buf = bytearray(b"Obj\x01")
    # metadata map: one block of 2 entries, then end-of-map
    buf += _zigzag(2)
    for k, v in ((b"avro.schema", schema), (b"avro.codec", codec)):
        buf += _zigzag(len(k)) + k + _zigzag(len(v)) + v
    buf += _zigzag(0)
    buf += sync
    val = 0
    for cnt in block_counts:
        data = b"".join(_zigzag(val + i) for i in range(cnt))
        val += cnt
        buf += _zigzag(cnt) + _zigzag(len(data)) + data + sync
    path.write_bytes(bytes(buf))
    return str(path)


def test_avro_ocf_record_count(tmp_path):
    p = _avro_ocf(tmp_path / "a.avro", [100, 37, 0, 63])
    n, size, stats = avro_file_stats(p)
    assert n == 200
    assert size == (tmp_path / "a.avro").stat().st_size
    assert stats == {}  # reference parity: no column metrics for avro


def test_avro_ocf_negative_block_count_metadata(tmp_path):
    """Writers may emit negative map block counts (count, byte-size) —
    the parser must handle that framing variant from the spec."""
    p = tmp_path / "b.avro"
    schema = b'{"type":"record","name":"r","fields":[]}'
    sync = b"\x00" * 16
    entry = _zigzag(len(b"avro.schema")) + b"avro.schema"
    entry += _zigzag(len(schema)) + schema
    buf = bytearray(b"Obj\x01")
    buf += _zigzag(-1) + _zigzag(len(entry)) + entry + _zigzag(0)
    buf += sync
    buf += _zigzag(5) + _zigzag(0) + sync  # 5 empty records
    p.write_bytes(bytes(buf))
    assert avro_file_stats(str(p))[0] == 5


def test_avro_rejects_non_ocf(tmp_path):
    p = tmp_path / "notavro.avro"
    p.write_bytes(b"PAR1 nope")
    with pytest.raises(ValueError, match="not an Avro"):
        avro_file_stats(str(p))


def test_collect_stats_dispatches_avro(tmp_path):
    p1 = _avro_ocf(tmp_path / "f1.avro", [10])
    p2 = _avro_ocf(tmp_path / "f2.avro", [20, 20])
    out = collect_stats([p1, p2], file_format="avro")
    assert out[p1][0] == 10 and out[p2][0] == 40
    assert out[p1][2] == {} and out[p2][2] == {}


_HAVE_AVRO = None


def _have_avro(spark):
    global _HAVE_AVRO
    if _HAVE_AVRO is None:
        _HAVE_AVRO = _avro_datasource_available(spark)
    return _HAVE_AVRO


def test_avro_create_table_gate(spark, tmp_path):
    """Without spark-avro on the classpath, create_table('avro') must fail
    loudly at CREATE time (not at first write) with a deploy hint; with it,
    the table round-trips like the ORC fallback."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    if not _have_avro(spark):
        with pytest.raises(TableValidationError, match="spark-avro"):
            cat.create_table(
                "t_avro", "id int, bucket int", partition_cols=["bucket"],
                file_format="avro",
            )
        return
    tbl = cat.create_table(
        "t_avro", "id int, bucket int", partition_cols=["bucket"],
        file_format="avro",
    )
    src = spark.createDataFrame(
        [(i, i % 4) for i in range(200)], "id int, bucket int"
    )
    tbl.insert(src)
    files = tbl.meta.current_snapshot().live_files()
    assert sum(f.record_count for f in files) == 200
    assert all(f.stats == {} for f in files)
    assert tbl.to_df().count() == 200
    scan = tbl.scan(where="bucket = 2")
    assert scan.files_scanned < len(files)
    assert scan.dataframe().count() == 50
