"""Round-14 ADVICE guards, implemented in round 15.

1. ``register_data_files`` validates its entries at commit time
   (paths exist, single source schema era) instead of trusting the
   caller.
2. ``expire_snapshots`` GC only deletes files under the table's OWN
   data dir — a clone that adopted the source's files zero-copy can
   overwrite + expire without deleting the source's live data.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.sql import Engine
from icebergsql_spark.table import TableValidationError


@pytest.fixture()
def eng(spark):
    e = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-r15gd-"))
    e.sql(
        "CREATE TABLE gsrc (k BIGINT, p INT) USING parquet "
        "PARTITIONED BY (p) OPTIONS (addTableManagement 'true')"
    )
    e.sql("INSERT INTO gsrc SELECT id, CAST(id % 2 AS INT) FROM range(100)")
    return e


def test_register_data_files_refuses_missing_paths(eng):
    src = eng.table("gsrc")
    entry = src.meta.current_snapshot().live_files()[0]
    ghost = dataclasses.replace(entry, path=entry.path + ".missing")
    with pytest.raises(TableValidationError, match="do not exist"):
        src.register_data_files([ghost])


def test_register_data_files_refuses_mixed_eras(eng):
    src = eng.table("gsrc")
    files = src.meta.current_snapshot().live_files()
    assert len(files) >= 2
    mixed = [files[0], dataclasses.replace(files[1], schema_id=99)]
    with pytest.raises(TableValidationError, match="schema eras"):
        src.register_data_files(mixed)


def test_expire_gc_never_deletes_adopted_out_of_tree_files(eng, spark):
    eng.sql("CREATE TABLE gclone LIKE gsrc WITH DATA")
    clone = eng.table("gclone")
    src = eng.table("gsrc")
    src_paths = [f.path for f in src.meta.current_snapshot().live_files()]
    # the clone's first snapshot references the SOURCE's physical files;
    # overwrite makes them dead in the clone's history...
    clone.insert(
        spark.range(5).select(
            F.col("id").alias("k"), F.lit(0).alias("p")
        ),
        overwrite=True,
    )
    res = clone.expire_snapshots(retain_last=1)
    assert res["expired_snapshots"] >= 1
    # ...but GC must not reach into the source's data dir
    for p in src_paths:
        assert os.path.exists(p), f"clone GC deleted source file {p}"
    assert src.to_df().count() == 100
