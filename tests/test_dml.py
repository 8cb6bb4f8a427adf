"""Row-level DML (DELETE / UPDATE / MERGE) — copy-on-write over the
snapshot model. The reference never mutates files, only de-references them
(InsertIntoIcebergTable.scala:142-179); DML rides the same machinery:
affected files are found via manifest stats pruning (delete/update) or a
key equi-join (merge), rewritten in one distributed job, and committed as
an overwrite/delete snapshot. Time travel to the pre-DML snapshot keeps
working because data files are immutable."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from icebergsql_spark.sql import Engine
from icebergsql_spark.table import Catalog, TableValidationError

DDL = "k bigint, v double, cat string, part int"


@pytest.fixture()
def tbl(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table("t", DDL, partition_cols=["part"])
    src = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("cat"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    t.insert(src)
    return t


def test_delete_partition_aligned_is_metadata_only(spark, tbl):
    """A partition-exact DELETE drops whole files from metadata — zero
    rewrite (added == 0), and only that partition's rows vanish."""
    before_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.delete_where("part = 1")
    assert snap.operation == "delete"
    assert snap.num_added_files == 0  # no file was read or rewritten
    after = tbl.to_df()
    assert after.filter("part = 1").count() == 0
    assert after.count() == 200
    # untouched partitions kept their identical files
    after_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    assert after_files < before_files


def test_delete_straddling_rewrites_only_affected(spark, tbl):
    """A value predicate straddles files: matching files are rewritten,
    rows with k < 30 disappear, everything else survives byte-for-byte."""
    pre = {r.k for r in tbl.to_df().select("k").collect()}
    snap = tbl.delete_where("k < 30")
    assert snap.operation == "overwrite"
    got = {r.k for r in tbl.to_df().select("k").collect()}
    assert got == {k for k in pre if k >= 30}


def test_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE removes rows where the predicate is TRUE; NULL keeps."""
    cat = Catalog(spark, str(tmp_path / "whn"))
    t = cat.create_table("tn", DDL, partition_cols=["part"])
    t.insert(
        spark.createDataFrame(
            [(1, 5.0, "a", 0), (2, None, "b", 0), (3, 50.0, "c", 0)], DDL
        )
    )
    t.delete_where("v < 10")
    got = sorted(r.k for r in t.to_df().select("k").collect())
    assert got == [2, 3]  # NULL v survives


def test_delete_time_travel_sees_pre_delete_state(spark, tbl):
    s0 = tbl.meta.current_snapshot()
    tbl.delete_where("part = 0")
    assert tbl.to_df().count() == 200
    assert tbl.scan(snapshot_id=s0.snapshot_id).dataframe().count() == 300


def test_update_rewrites_only_matching_files(spark, tbl):
    before_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.update_where({"v": "v * 10"}, "part = 2")
    after_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    # partitions 0/1 files untouched
    untouched = {p for p in after_files if "part=2" not in p}
    assert untouched and untouched <= before_files
    assert snap.operation == "overwrite"
    got = tbl.to_df().filter("part = 2").agg(F.sum("v")).collect()[0][0]
    want = sum(k * 10.0 for k in range(300) if k % 3 == 2)
    assert got == want
    # non-matching rows unchanged
    assert tbl.to_df().filter("part = 0").agg(F.sum("v")).collect()[0][0] == sum(
        float(k) for k in range(300) if k % 3 == 0
    )


def test_update_can_move_rows_across_partitions(spark, tbl):
    tbl.update_where({"part": "0"}, "part = 2")
    df = tbl.to_df()
    assert df.filter("part = 2").count() == 0
    assert df.count() == 300
    # the moved rows' files live under part=0 directories now
    moved = {f.path for f in tbl.meta.current_snapshot().live_files()}
    assert all("part=2" not in p for p in moved)


def test_update_unknown_column_rejected(spark, tbl):
    with pytest.raises(TableValidationError, match="unknown column"):
        tbl.update_where({"nope": "1"}, "part = 0")


def test_merge_upsert_updates_and_inserts(spark, tbl):
    """Classic CDC upsert: half the source matches (v overwritten), half is
    new (appended); unmatched target rows are untouched."""
    src = spark.range(250, 350).select(
        F.col("id").alias("k"),
        F.lit(-1.0).alias("v"),
        F.lit("merged").alias("cat"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    snap = tbl.merge(src, on=["k"])
    assert snap.operation == "overwrite"
    df = tbl.to_df()
    assert df.count() == 350
    assert df.filter("v = -1.0").count() == 100
    assert df.filter("k < 250 AND cat = 'merged'").count() == 0
    # untouched rows keep original v
    assert df.filter("k = 10").collect()[0].v == 10.0


def test_merge_set_exprs_with_aliases(spark, tbl):
    src = spark.createDataFrame([(0, 1000.0)], "k bigint, v double")
    tbl.merge(
        src,
        on=["k"],
        set_exprs={"v": "t.v + s.v"},
        when_not_matched_insert=False,
    )
    assert tbl.to_df().filter("k = 0").collect()[0].v == 1000.0  # 0 + 1000


def test_merge_matched_delete(spark, tbl):
    src = spark.range(0, 50).select(F.col("id").alias("k"))
    snap = tbl.merge(
        src, on=["k"], when_matched="delete", when_not_matched_insert=False
    )
    assert tbl.to_df().count() == 250
    assert tbl.to_df().filter("k < 50").count() == 0
    assert snap.operation in ("overwrite", "delete")


def test_merge_insert_only_is_pure_append(spark, tbl):
    """No WHEN MATCHED → matched rows untouched, no file rewritten."""
    src = spark.range(200, 400).select(
        F.col("id").alias("k"),
        F.lit(7.0).alias("v"),
        F.lit("new").alias("cat"),
        (F.col("id") % 3).cast("int").alias("part"),
    )
    before_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.merge(src, on=["k"], when_matched=None)
    assert snap.operation == "append"
    after_files = {f.path for f in tbl.meta.current_snapshot().live_files()}
    assert before_files <= after_files  # nothing replaced
    df = tbl.to_df()
    assert df.count() == 400
    assert df.filter("k = 250").collect()[0].cat == "even"  # matched untouched


def test_merge_duplicate_source_keys_rejected(spark, tbl):
    src = spark.createDataFrame(
        [(1, 1.0, "x", 0), (1, 2.0, "y", 0)], DDL
    )
    with pytest.raises(ValueError, match="duplicate join keys"):
        tbl.merge(src, on=["k"])


def test_dml_sql_verbs(spark, tmp_path):
    """DELETE / UPDATE / MERGE through the SQL front door."""
    eng = Engine(spark, str(tmp_path / "whsql"))
    spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit("a").alias("cat"),
        (F.col("id") % 2).cast("int").alias("part"),
    ).createOrReplaceTempView("dml_src")
    eng.sql(
        "CREATE TABLE d (k bigint, v double, cat string, part int) USING parquet "
        "PARTITIONED BY (part) OPTIONS ('addTableManagement'='true')"
    )
    eng.sql("INSERT INTO d SELECT * FROM dml_src")

    out = eng.sql("DELETE FROM d WHERE k < 10").collect()[0]
    assert out.deleted_rows == 10
    assert eng.sql("SELECT COUNT(*) AS n FROM d").collect()[0].n == 90

    eng.sql("UPDATE d SET v = v + 0.5 WHERE part = 0")
    assert (
        eng.sql("SELECT v FROM d WHERE k = 10").collect()[0].v == 10.5
    )

    spark.range(95, 105).select(
        F.col("id").alias("k"),
        F.lit(-2.0).alias("v"),
        F.lit("m").alias("cat"),
        (F.col("id") % 2).cast("int").alias("part"),
    ).createOrReplaceTempView("m_src")
    eng.sql(
        "MERGE INTO d t USING m_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, cat = s.cat "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM d").collect()[0].n == 95
    assert (
        eng.sql("SELECT COUNT(*) AS n FROM d WHERE cat = 'm'").collect()[0].n
        == 10
    )


def test_diff_keyed_changelog(spark, tbl):
    """diff(): keyed CDC emits exactly insert/delete/update pre+post rows;
    rows co-located in rewritten files but untouched must NOT appear."""
    s1 = tbl.meta.current_snapshot()
    tbl.update_where({"v": "v + 1000"}, "k % 10 = 0")
    ch = tbl.diff(s1.snapshot_id, key_cols=["k"])
    rows = {(r["k"], r["_change_type"], r["v"]) for r in ch.collect()}
    expected = set()
    for k in range(0, 300, 10):
        expected.add((k, "update_preimage", float(k)))
        expected.add((k, "update_postimage", float(k) + 1000.0))
    assert rows == expected


def test_diff_whole_row_and_file_short_circuit(spark, tbl):
    """Whole-row diff labels multiplicity-correct inserts/deletes; common
    files are skipped so an append-only delta reads zero old files."""
    s1 = tbl.meta.current_snapshot()
    extra = spark.createDataFrame(
        [(1000, 5.0, "even", 0), (1001, 6.0, "odd", 1)], tbl.schema
    )
    tbl.insert(extra)
    tbl.delete_where("k = 7")
    ch = tbl.diff(s1.snapshot_id)
    got = {(r["k"], r["_change_type"], r["_change_count"]) for r in ch.collect()}
    assert got == {
        (1000, "insert", 1),
        (1001, "insert", 1),
        (7, "delete", 1),
    }
    # append-only range: no old-side files at all (pure churn IO)
    s2 = tbl.meta.snapshots[-2]  # snapshot after the extra insert
    old = {f.path for f in s1.live_files()}
    new = {f.path for f in s2.live_files()}
    assert old <= new  # common files all skipped; old-only set is empty


def test_diff_key_errors(spark, tbl):
    with pytest.raises(ValueError, match="not in schema"):
        tbl.diff(tbl.meta.current_snapshot().snapshot_id, key_cols=["nope"])
    with pytest.raises(ValueError, match="unknown snapshot"):
        tbl.diff(123456789)


def test_diff_matches_state_recompute(spark, tbl):
    """Cross-check: after a mixed DML sequence (update + delete + insert),
    diff(s1) keyed by k must equal the change set derived independently
    from the two full table states (time-travel read vs current read)."""
    s1 = tbl.meta.current_snapshot()
    tbl.update_where({"v": "v * 2"}, "k % 7 = 0")
    tbl.delete_where("k % 11 = 3")
    extra = spark.createDataFrame(
        [(900, 1.5, "even", 0), (901, 2.5, "odd", 1)], tbl.schema
    )
    tbl.insert(extra)

    old = {r["k"]: r for r in tbl.scan(snapshot_id=s1.snapshot_id)
           .dataframe().collect()}
    new = {r["k"]: r for r in tbl.to_df().collect()}
    expected = set()
    for k in old.keys() - new.keys():
        expected.add((k, "delete"))
    for k in new.keys() - old.keys():
        expected.add((k, "insert"))
    for k in old.keys() & new.keys():
        if old[k]["v"] != new[k]["v"]:
            expected.add((k, "update_preimage"))
            expected.add((k, "update_postimage"))

    got = {
        (r["k"], r["_change_type"])
        for r in tbl.diff(s1.snapshot_id, key_cols=["k"]).collect()
    }
    assert got == expected
    # payload integrity on a sampled update
    some_k = next(k for k, t in expected if t == "update_postimage")
    post = [
        r["v"]
        for r in tbl.diff(s1.snapshot_id, key_cols=["k"]).collect()
        if r["k"] == some_k and r["_change_type"] == "update_postimage"
    ]
    assert post == [new[some_k]["v"]]


def test_diff_duplicate_keys_rejected(spark, tbl):
    """Keyed diff() must refuse duplicate keys in the churned files — a
    dup would cross-product the full-outer join and multiply pre/post
    rows silently (same cardinality rule as MERGE)."""
    s1 = tbl.meta.current_snapshot()
    dup = spark.createDataFrame(
        [(5, 99.0, "even", 0), (5, 98.0, "odd", 1)], tbl.schema
    )
    tbl.insert(dup)  # key 5 now appears 3x in the current state
    with pytest.raises(ValueError, match="duplicate keys"):
        tbl.diff(s1.snapshot_id, key_cols=["k"]).collect()
    # whole-row multiplicity mode still works on the same history: the
    # two new rows are distinct payloads, each an insert of count 1
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_count"])
        for r in tbl.diff(s1.snapshot_id).collect()
    )
    assert got == [(5, 98.0, "insert", 1), (5, 99.0, "insert", 1)]


def test_merge_conditional_multi_clause(spark, tmp_path):
    """Full conditional MERGE grammar: ordered WHEN MATCHED AND <cond>
    chains — first firing clause wins, unfired matched rows stay."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_mc"))
    eng.sql(
        "CREATE TABLE mt (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(10)], "k bigint, v double, part int"
    ).createOrReplaceTempView("mt_tgt")
    eng.sql("INSERT INTO mt SELECT * FROM mt_tgt")
    spark.createDataFrame(
        [(1, 100.0, 1), (2, -1.0, 0), (3, 5.0, 1), (20, 7.0, 0)],
        "k bigint, v double, part int",
    ).createOrReplaceTempView("mt_src")
    eng.sql("""
        MERGE INTO mt t USING mt_src s ON t.k = s.k
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN MATCHED AND s.v > 50 THEN UPDATE SET v = t.v + s.v
        WHEN MATCHED AND s.v > 100 THEN UPDATE SET v = 0
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = {r["k"]: r["v"] for r in eng.sql("SELECT k, v FROM mt").collect()}
    assert 2 not in got                    # delete clause fired
    assert got[1] == 101.0                 # first matching update fired
    assert got[3] == 3.0                   # matched, no clause fired: kept
    assert got[20] == 7.0                  # not-matched insert
    assert len(got) == 10                  # 10 - 1 deleted + 1 inserted


def test_merge_conditional_multi_clause_mor(spark, tmp_path):
    """Same grammar under write.merge.mode=merge-on-read: only FIRING rows
    are DV-masked; unfired matched rows keep their original file images."""
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_mcm"))
    t = cat.create_table(
        "mtm",
        "k bigint, v double, part int",
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(
        spark.createDataFrame(
            [(i, float(i), i % 2) for i in range(10)],
            "k bigint, v double, part int",
        )
    )
    src = spark.createDataFrame(
        [(1, 100.0, 1), (2, -1.0, 0), (3, 5.0, 1), (20, 7.0, 0)],
        "k bigint, v double, part int",
    )
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    snap = t.merge(
        src,
        on=["k"],
        matched_clauses=[
            ("s.v < 0", "delete", None),
            ("s.v > 50", "update", {"v": "t.v + s.v"}),
        ],
        when_not_matched_insert=True,
    )
    assert before <= {f.path for f in snap.live_files()}  # append-only
    assert sum(e.count for e in snap.dv_entries()) == 2   # only k=1, k=2 masked
    got = {r["k"]: r["v"] for r in t.to_df().select("k", "v").collect()}
    assert 2 not in got and got[1] == 101.0 and got[3] == 3.0 and got[20] == 7.0
    assert len(got) == 10


def test_merge_not_matched_by_source(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE/UPDATE — full snapshot
    sync: target rows absent from the source are deleted (or flagged),
    matched rows update, new rows insert, in ONE statement."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_nmbs"))
    eng.sql(
        "CREATE TABLE sync_t (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(8)], "k bigint, v double, part int"
    ).createOrReplaceTempView("sync_tgt")
    eng.sql("INSERT INTO sync_t SELECT * FROM sync_tgt")
    # source snapshot: keys 0-3 (v+10), new key 100; keys 4-7 vanish
    spark.createDataFrame(
        [(i, float(i) + 10, i % 2) for i in range(4)] + [(100, 1.0, 0)],
        "k bigint, v double, part int",
    ).createOrReplaceTempView("sync_src")
    eng.sql("""
        MERGE INTO sync_t t USING sync_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE AND t.k >= 6 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1
        WHEN NOT MATCHED THEN INSERT *
    """)
    got = {r["k"]: r["v"] for r in eng.sql("SELECT k, v FROM sync_t").collect()}
    assert got == {
        0: 10.0, 1: 11.0, 2: 12.0, 3: 13.0,  # matched updates
        4: -1.0, 5: -1.0,                    # unmatched, flagged
        100: 1.0,                            # inserted
    }  # 6,7 deleted by the conditional NMBS clause


def test_merge_not_matched_by_source_mor(spark, tmp_path):
    """NMBS under merge-on-read: unmatched firing rows are DV-masked via
    the LEFT-join position read; new images appended."""
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_nmbs_m"))
    t = cat.create_table(
        "sync_m",
        "k bigint, v double, part int",
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(
        spark.createDataFrame(
            [(i, float(i), i % 2) for i in range(8)],
            "k bigint, v double, part int",
        )
    )
    src = spark.createDataFrame(
        [(0, 50.0, 0)], "k bigint, v double, part int"
    )
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    snap = t.merge(
        src,
        on=["k"],
        matched_clauses=[(None, "update", {"v": "s.v"})],
        not_matched_by_source_clauses=[("t.k >= 6", "delete", None)],
        when_not_matched_insert=False,
    )
    assert before <= {f.path for f in snap.live_files()}  # append-only
    assert sum(e.count for e in snap.dv_entries()) == 3   # k=0 update + 6,7
    got = {r["k"]: r["v"] for r in t.to_df().select("k", "v").collect()}
    assert got == {0: 50.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0, 5: 5.0}


def test_merge_conditional_not_matched_insert(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT chains — first firing
    clause wins per source row; a row firing no clause is NOT inserted
    (Spark/Iceberg conditional-insert semantics)."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_cnm"))
    eng.sql(
        "CREATE TABLE cnm (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(5)], "k bigint, v double, part int"
    ).createOrReplaceTempView("cnm_tgt")
    eng.sql("INSERT INTO cnm SELECT * FROM cnm_tgt")
    spark.createDataFrame(
        [(1, 9.0, 1), (10, 5.0, 0), (11, 50.0, 1), (12, -3.0, 0)],
        "k bigint, v double, part int",
    ).createOrReplaceTempView("cnm_src")
    eng.sql("""
        MERGE INTO cnm t USING cnm_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED AND s.v > 40 THEN INSERT (k, v) VALUES (s.k, s.v * 2)
        WHEN NOT MATCHED AND s.v > 0 THEN INSERT *
    """)
    got = {
        r["k"]: (r["v"], r["part"])
        for r in eng.sql("SELECT k, v, part FROM cnm").collect()
    }
    assert got[1] == (9.0, 1)            # matched update
    assert got[10] == (5.0, 0)           # second clause: INSERT *
    assert got[11] == (100.0, None)      # first clause wins: column-list
    assert 12 not in got                 # no clause fired -> not inserted
    assert len(got) == 7


def test_merge_insert_duplicate_column_rejected(spark, tmp_path):
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_dupins"))
    eng.sql(
        "CREATE TABLE dupi (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.createDataFrame(
        [(1, 1.0, 0)], "k bigint, v double, part int"
    ).createOrReplaceTempView("dupi_src")
    with pytest.raises(ValueError, match="duplicate target column"):
        eng.sql(
            "MERGE INTO dupi t USING dupi_src s ON t.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, k) VALUES (s.k, s.k + 1)"
        )


def test_merge_conditional_not_matched_insert_mor(spark, tmp_path):
    """Conditional NOT MATCHED chains under merge-on-read: unfired source
    rows are not inserted; fired ones append images (no rewrite)."""
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_cnm_m"))
    t = cat.create_table(
        "cnm_m",
        "k bigint, v double, part int",
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(
        spark.createDataFrame(
            [(i, float(i), i % 2) for i in range(5)],
            "k bigint, v double, part int",
        )
    )
    src = spark.createDataFrame(
        [(1, 9.0, 1), (10, 5.0, 0), (11, 50.0, 1), (12, -3.0, 0)],
        "k bigint, v double, part int",
    )
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    snap = t.merge(
        src,
        on=["k"],
        matched_clauses=[(None, "update", {"v": "s.v"})],
        when_not_matched_insert=[
            ("s.v > 40", {"k": "s.k", "v": "s.v * 2"}),
            ("s.v > 0", True),
        ],
    )
    assert before <= {f.path for f in snap.live_files()}  # append-only
    got = {r["k"]: (r["v"], r["part"]) for r in t.to_df().collect()}
    assert got[1] == (9.0, 1)
    assert got[10] == (5.0, 0)
    assert got[11] == (100.0, None)
    assert 12 not in got
    assert len(got) == 7


def test_merge_clause_semantics_fuzz(spark, tmp_path):
    """Randomized conditional-clause chains (matched update/delete + NOT
    MATCHED conditional inserts) against a pure-Python reference of the
    first-firing-clause rule, under BOTH copy-on-write and merge-on-read.
    Locks the round-6 ordered-insert-clause machinery the same way
    test_mor_fuzz locks the delete model."""
    import random

    from icebergsql_spark.table import Catalog

    rng = random.Random(60)
    cat = Catalog(spark, str(tmp_path / "wh_mfz"))

    M_CONDS = [
        (None, lambda tv, tk, sv: True),
        ("s.v > 15", lambda tv, tk, sv: sv > 15),
        ("t.k % 3 = 0", lambda tv, tk, sv: tk % 3 == 0),
        ("t.v < 10", lambda tv, tk, sv: tv < 10),
    ]
    M_ACTS = [
        ("update", {"v": "t.v + s.v"}, lambda tv, sv: tv + sv),
        ("update", {"v": "s.v"}, lambda tv, sv: sv),
        ("delete", None, None),
    ]
    N_CONDS = [
        (None, lambda sv: True),
        ("s.v > 15", lambda sv: sv > 15),
        ("s.v < 5", lambda sv: sv < 5),
    ]
    N_SPECS = [
        (True, lambda k, v, p: (k, v, p)),
        ({"k": "s.k", "v": "s.v * 2"}, lambda k, v, p: (k, 2 * v, None)),
    ]

    for case in range(8):
        mor = case % 2 == 1
        name = f"mfz{case}"
        t = cat.create_table(
            name,
            "k bigint, v double, part int",
            partition_cols=["part"],
            properties=(
                {"write.merge.mode": "merge-on-read"} if mor else {}
            ),
        )
        tgt = {k: float(k) for k in range(30)}
        t.insert(
            spark.createDataFrame(
                [(k, v, k % 2) for k, v in tgt.items()],
                "k bigint, v double, part int",
            )
        )
        src_keys = rng.sample(range(40), 12)
        src = {k: float(rng.randrange(0, 30)) for k in src_keys}

        mc = [
            (*rng.choice(M_CONDS), rng.choice(M_ACTS))
            for _ in range(rng.randrange(1, 4))
        ]
        nc = [
            (*rng.choice(N_CONDS), rng.choice(N_SPECS))
            for _ in range(rng.randrange(0, 3))
        ]

        # ---- pure-Python reference (first-firing-clause rule) ----
        expect: dict[int, tuple[float, object]] = {
            k: (v, k % 2) for k, v in tgt.items()
        }
        for k, sv in src.items():
            if k in tgt:
                for cond_sql, cond_fn, (act, _sets, fn) in mc:
                    if cond_fn(tgt[k], k, sv):
                        if act == "delete":
                            expect.pop(k, None)
                        else:
                            expect[k] = (fn(tgt[k], sv), k % 2)
                        break
            else:
                for cond_sql, cond_fn, (spec, mk) in nc:
                    if cond_fn(sv):
                        expect[k] = mk(k, sv, k % 2)[1:]
                        break

        t.merge(
            spark.createDataFrame(
                [(k, v, k % 2) for k, v in src.items()],
                "k bigint, v double, part int",
            ),
            on=["k"],
            matched_clauses=[
                (c, act, sets) for c, _f, (act, sets, _fn) in mc
            ],
            when_not_matched_insert=(
                [(c, spec) for c, _f, (spec, _mk) in nc] or False
            ),
        )
        got = {
            r["k"]: (r["v"], r["part"]) for r in t.to_df().collect()
        }
        assert got == expect, (case, mor, mc, nc, got, expect)


def test_merge_schema_evolution_cow(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION (Spark 4.0 grammar): source-only
    columns are added to the target — pre-evolution rows read back NULL
    (metadata-only, no rewrite of unaffected files), matched updates and
    not-matched inserts carry the new column."""
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, str(tmp_path / "wh_mse"))
    eng.sql(
        "CREATE TABLE mse (k BIGINT, v DOUBLE, part INT) USING parquet "
        "OPTIONS (addTableManagement 'true') PARTITIONED BY (part)"
    )
    spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(10)], "k bigint, v double, part int"
    ).createOrReplaceTempView("mse_tgt")
    eng.sql("INSERT INTO mse SELECT * FROM mse_tgt")
    spark.createDataFrame(
        [(1, 100.0, 1, "upd"), (20, 7.0, 0, "new")],
        "k bigint, v double, part int, note string",
    ).createOrReplaceTempView("mse_src")
    eng.sql("""
        MERGE WITH SCHEMA EVOLUTION INTO mse t USING mse_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, note = s.note
        WHEN NOT MATCHED THEN INSERT *
    """)
    t = eng.catalog.load_table("mse")
    assert [f.name for f in t.schema.fields] == ["k", "v", "part", "note"]
    got = {r["k"]: (r["v"], r["note"]) for r in t.to_df().collect()}
    assert got[1] == (100.0, "upd")
    assert got[20] == (7.0, "new")
    assert got[3] == (3.0, None)          # pre-evolution row: NULL backfill
    assert len(got) == 11


def test_merge_schema_evolution_insert_star_null_fills(spark, tmp_path):
    """Under evolution INSERT * NULL-fills target columns the source
    lacks (autoMerge semantics) instead of raising; without the keyword
    the same statement still fails loudly."""
    import pytest

    from icebergsql_spark.table import Catalog, TableValidationError

    cat = Catalog(spark, str(tmp_path / "wh_msen"))
    t = cat.create_table("msen", "k bigint, v double, part int",
                         partition_cols=["part"])
    t.insert(spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(5)],
        "k bigint, v double, part int"))
    src = spark.createDataFrame(
        [(7, 0, "x")], "k bigint, part int, note string")  # no v column
    with pytest.raises(TableValidationError, match="needs source columns"):
        t.merge(src, on=["k"], matched_clauses=[], when_not_matched_insert=True)
    t.merge(src, on=["k"], matched_clauses=[], when_not_matched_insert=True,
            schema_evolution=True)
    got = {r["k"]: (r["v"], r["note"]) for r in t.to_df().collect()}
    assert got[7] == (None, "x")
    assert got[2] == (2.0, None)
    assert len(got) == 6


def test_merge_schema_evolution_mor(spark, tmp_path):
    """Schema evolution under merge-on-read: the new column lands via
    append-only images + DV masking; pre-evolution unfired rows stay in
    their original files and NULL-backfill through the per-era read."""
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path / "wh_msem"))
    t = cat.create_table(
        "msem",
        "k bigint, v double, part int",
        partition_cols=["part"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    t.insert(spark.createDataFrame(
        [(i, float(i), i % 2) for i in range(10)],
        "k bigint, v double, part int"))
    before = {f.path for f in t.meta.current_snapshot().live_files()}
    src = spark.createDataFrame(
        [(1, 100.0, 1, "upd"), (20, 7.0, 0, "new")],
        "k bigint, v double, part int, note string",
    )
    snap = t.merge(
        src,
        on=["k"],
        matched_clauses=[(None, "update", None)],
        when_not_matched_insert=True,
        schema_evolution=True,
    )
    assert before <= {f.path for f in snap.live_files()}  # append-only
    assert sum(e.count for e in snap.dv_entries()) == 1   # only k=1 masked
    got = {r["k"]: (r["v"], r["note"]) for r in t.to_df().collect()}
    assert got[1] == (100.0, "upd")
    assert got[20] == (7.0, "new")
    assert got[3] == (3.0, None)
    assert len(got) == 11


def test_merge_delete_condition_on_source_only_column(spark, tmp_path):
    """CDC op-code MERGE: DELETE/UPDATE/INSERT clause conditions on a
    column that exists ONLY in the source (the op code) — the classic
    change-feed apply. Covered in copy-on-write AND merge-on-read via
    the programmatic API, and through the SQL front door's clause
    parser, against one pure-Python model."""
    import random

    from icebergsql_spark.sql import Engine
    from icebergsql_spark.table import Catalog

    rng = random.Random(1007)
    for mode in ("cow", "mor", "sql"):
        tgt = {k: float(k * 10) for k in range(24)}
        ops = {
            k: rng.choice(["D", "U", "X", "I"])
            for k in rng.sample(range(36), 18)
        }
        sval = {k: float(rng.randrange(100, 200)) for k in ops}
        # pure-Python model of the clause chain below
        expect = dict(tgt)
        for k, op in ops.items():
            if k in tgt:
                if op == "D":
                    expect.pop(k)
                elif op == "U":
                    expect[k] = sval[k]
                # X / I matched: no clause fires, row kept
            elif op == "I":
                expect[k] = sval[k]
        src_rows = [(k, sval[k], k % 2, ops[k]) for k in ops]
        src_schema = "k bigint, v double, part int, op string"
        if mode == "sql":
            eng = Engine(spark, str(tmp_path / "wh_cdc_sql"))
            eng.sql(
                "CREATE TABLE cdc_sql (k BIGINT, v DOUBLE, part INT) "
                "USING parquet OPTIONS (addTableManagement 'true') "
                "PARTITIONED BY (part)"
            )
            spark.createDataFrame(
                [(k, v, k % 2) for k, v in tgt.items()],
                "k bigint, v double, part int",
            ).createOrReplaceTempView("cdc_tgt")
            eng.sql("INSERT INTO cdc_sql SELECT * FROM cdc_tgt")
            spark.createDataFrame(
                src_rows, src_schema
            ).createOrReplaceTempView("cdc_src")
            eng.sql("""
                MERGE INTO cdc_sql t USING cdc_src s ON t.k = s.k
                WHEN MATCHED AND s.op = 'D' THEN DELETE
                WHEN MATCHED AND s.op = 'U' THEN UPDATE SET v = s.v
                WHEN NOT MATCHED AND s.op = 'I'
                  THEN INSERT (k, v, part) VALUES (s.k, s.v, s.part)
            """)
            got = {
                r["k"]: r["v"]
                for r in eng.sql("SELECT k, v FROM cdc_sql").collect()
            }
        else:
            cat = Catalog(spark, str(tmp_path / f"wh_cdc_{mode}"))
            t = cat.create_table(
                f"cdc_{mode}",
                "k bigint, v double, part int",
                partition_cols=["part"],
                properties=(
                    {"write.merge.mode": "merge-on-read"}
                    if mode == "mor"
                    else {}
                ),
            )
            t.insert(
                spark.createDataFrame(
                    [(k, v, k % 2) for k, v in tgt.items()],
                    "k bigint, v double, part int",
                )
            )
            before = {f.path for f in t.meta.current_snapshot().live_files()}
            snap = t.merge(
                spark.createDataFrame(src_rows, src_schema),
                on=["k"],
                matched_clauses=[
                    ("s.op = 'D'", "delete", None),
                    ("s.op = 'U'", "update", {"v": "s.v"}),
                ],
                when_not_matched_insert=[
                    (
                        "s.op = 'I'",
                        {"k": "s.k", "v": "s.v", "part": "s.part"},
                    )
                ],
            )
            if mode == "mor":
                # MoR: original files untouched, only firing rows masked
                assert before <= {f.path for f in snap.live_files()}
                fired = sum(
                    1
                    for k, op in ops.items()
                    if k in tgt and op in ("D", "U")
                )
                assert sum(e.count for e in snap.dv_entries()) == fired
            got = {
                r["k"]: r["v"] for r in t.to_df().select("k", "v").collect()
            }
        assert got == expect, (mode, got, expect)
