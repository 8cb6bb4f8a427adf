"""Round-14 optimization lock: the single-pass keyed diff().

The keyed changelog used to be a 4-way unionAll of filtered selects over
the full-outer join — each branch re-referenced the join (and the
churned-file reads feeding it), 4x the IO.  It is now ONE pass: each
joined row maps to 0-2 structs (insert | delete | update pre+post |
unchanged->NULL) and explodes.  These tests lock the reformulation's
edge cases: NULL payload values must survive the struct/explode path,
and unchanged rows (equal fingerprints) must still vanish.
"""

from __future__ import annotations

import pytest

from tests.conftest import *  # noqa: F401,F403 — spark fixture


@pytest.fixture()
def ntbl(spark, tmp_path):
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        "t_nulldiff", "k bigint, v double, s string, part int",
        partition_cols=["part"]
    )
    t.insert(
        spark.createDataFrame(
            [(1, 1.0, "a", 0), (2, None, "b", 0), (3, 3.0, None, 1),
             (4, 4.0, "d", 1)],
            t.schema,
        )
    )
    return t


def test_keyed_diff_null_payloads(spark, ntbl):
    """NULL->value, value->NULL, NULL-equal rows through explode."""
    s1 = ntbl.meta.current_snapshot()
    # k=1 untouched, k=2 NULL v -> 2.0, k=3 s NULL->NULL (v changes),
    # k=4 v -> NULL
    ntbl.update_where({"v": "2.0"}, "k = 2")
    ntbl.update_where({"v": "v + 1"}, "k = 3")
    ntbl.update_where({"v": "CAST(NULL AS DOUBLE)"}, "k = 4")
    got = {
        (r["k"], r["_change_type"], r["v"], r["s"], r["part"])
        for r in ntbl.diff(s1.snapshot_id, key_cols=["k"]).collect()
    }
    assert got == {
        (2, "update_preimage", None, "b", 0),
        (2, "update_postimage", 2.0, "b", 0),
        (3, "update_preimage", 3.0, None, 1),
        (3, "update_postimage", 4.0, None, 1),
        (4, "update_preimage", 4.0, "d", 1),
        (4, "update_postimage", None, "d", 1),
    }
    # k=1 rewritten into the same churned files but unchanged: the
    # equal-fingerprint row must map to NULL and be dropped by explode
    assert not any(k == 1 for k, *_ in got)


def test_keyed_diff_insert_delete_paths(spark, ntbl):
    s1 = ntbl.meta.current_snapshot()
    ntbl.delete_where("k = 2")
    ntbl.insert(
        spark.createDataFrame([(9, None, None, 0)], ntbl.schema)
    )
    got = {
        (r["k"], r["_change_type"], r["v"], r["s"], r["part"])
        for r in ntbl.diff(s1.snapshot_id, key_cols=["k"]).collect()
    }
    assert got == {
        (2, "delete", None, "b", 0),
        (9, "insert", None, None, 0),
    }
