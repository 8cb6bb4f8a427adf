"""Streaming operator tests: file-source stream → memory sink, availableNow.

The streaming results are cross-checked against their batch twins computed
from the same events parquet — the streaming analogue of the duckdb-oracle
strategy."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.streaming import ops
from icebergsql_spark.plans.registry import events_ts_to_nanos
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split into time-range parquet files with ascending mtimes, so
    the file source delivers micro-batches in event-time order — the
    ordering contract a log-backed source (Kafka per-partition) provides,
    which gap-sessionization relies on (see ops.sessionize docstring)."""
    import os
    import time

    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = events_ts_to_nanos(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    ev.repartitionByRange(8, F.col("ts")).write.mode("overwrite").parquet(out)
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    base = time.time() - len(parts) * 60
    for i, fn in enumerate(parts):
        os.utime(os.path.join(out, fn), (base + i * 60, base + i * 60))
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _run_stream(spark, df, name: str):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = ops.read_event_stream(spark, events_dir)
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark = max(event_time) - 2h, so assert against the batch
    # twin restricted to closed windows
    result = _run_stream(spark, ops.windowed_counts(stream), "win_counts")

    batch = ops.with_event_time(spark.read.parquet(events_dir))
    expected = (
        batch.groupBy(F.window("event_time", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "sum_value",
        )
    )
    max_time = batch.agg(F.max("event_time")).collect()[0][0]
    import datetime as dt

    horizon = max_time - dt.timedelta(hours=2)
    expected_closed = expected.filter(F.col("window_end") <= horizon)

    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in expected_closed.collect()}
    assert want, "test needs at least one closed window"
    assert got == want


def test_sessionize_matches_batch_twin(spark, events_dir):
    stream = ops.read_event_stream(spark, events_dir)
    result = _run_stream(spark, ops.sessionize(stream), "sessions")

    events = spark.read.parquet(events_dir)
    batch = ops.batch_sessions(events)
    # the stream emits sessions closed by observed data; each user's LAST
    # session stays open in state — exclude it from the expectation
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("session_start"))
    expected = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .select("user_id", "session_start", "session_end", "n_events")
    )
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert want, "test needs at least one closed session"
    assert got == want


def test_dedup_stream_drops_duplicates(spark, events_dir, tmp_path):
    """Duplicate events (an at-least-once redelivery) are dropped within the
    watermark; output matches batch distinct-by-key."""
    import shutil

    dup_dir = str(tmp_path / "dup_events")
    ev = spark.read.parquet(events_dir)
    # duplicate ~10% of events, same event_id/ts (redelivery semantics)
    dups = ev.filter(F.col("event_id") % 10 == 0)
    ev.unionAll(dups).repartitionByRange(4, F.col("ts")).write.parquet(dup_dir)

    stream = ops.read_event_stream(spark, dup_dir)
    result = _run_stream(spark, ops.dedup_stream(stream), "dedup_out")
    n_unique = ev.select("event_id").distinct().count()
    assert result.select("event_id").distinct().count() == n_unique
    assert result.count() == n_unique
    shutil.rmtree(dup_dir, ignore_errors=True)


def test_stream_is_incremental(spark, events_dir):
    """The file source must process in multiple triggers (maxFilesPerTrigger)
    — guards against accidentally collapsing to a single batch."""
    stream = ops.read_event_stream(spark, events_dir)
    q = (
        ops.windowed_counts(stream)
        .writeStream.format("memory")
        .queryName("inc_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(q.recentProgress) >= 2


@pytest.fixture(scope="module")
def disordered_events_dir(spark, tmp_path_factory):
    """Events split into files by JITTERED time (±30 min on a 2 h
    watermark): cross-batch delivery is out of order within the watermark
    horizon, which breaks the ordered-input contract of plain sessionize
    and is exactly what sessionize_reordered must absorb. Two far-future
    sentinel files (their own micro-batches) push the final watermark past
    every real event so all real sessions close and the comparison with
    the batch twin is exact equality."""
    import os
    import time

    out = str(tmp_path_factory.mktemp("events_disordered"))
    ev = events_ts_to_nanos(spark.read.parquet(f"{SF_SMOKE}/events.parquet"))
    jitter = (F.col("event_id") * 2654435761) % F.lit(3_600_000_000_000) - F.lit(
        1_800_000_000_000
    )
    ev.repartitionByRange(8, (F.col("ts") + jitter)).write.mode("overwrite").parquet(out)
    parts = sorted(
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".parquet")
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    day_ns = 24 * 3600 * 1_000_000_000
    for i in (1, 2):
        spark.createDataFrame(
            [(-i, max_ts + i * day_ns, -1, "sentinel", 0.0, "{}")],
            ops.EVENTS_SCHEMA,
        ).coalesce(1).write.mode("overwrite").parquet(f"{out}_s{i}")
        import shutil as _sh

        src = next(
            f for f in os.listdir(f"{out}_s{i}") if f.endswith(".parquet")
        )
        _sh.copy(os.path.join(f"{out}_s{i}", src), os.path.join(out, f"zz-sentinel-{i}.parquet"))
        parts.append(f"zz-sentinel-{i}.parquet")
    base = time.time() - len(parts) * 60
    for i, fn in enumerate(parts):
        os.utime(os.path.join(out, fn), (base + i * 60, base + i * 60))
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_sessionize_reordered_matches_batch_under_disorder(
    spark, disordered_events_dir
):
    stream = ops.read_event_stream(
        spark, disordered_events_dir, max_files_per_trigger=1
    )
    result = _run_stream(spark, ops.sessionize_reordered(stream), "sessions_reord")
    got = {
        tuple(r)
        for r in result.filter(F.col("user_id") >= 0).collect()
    }
    real = spark.read.parquet(disordered_events_dir).filter(F.col("user_id") >= 0)
    want = {
        tuple(r)
        for r in ops.batch_sessions(real)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_stream_join_matches_batch(spark, events_dir):
    clicks = ops.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = ops.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    result = _run_stream(
        spark, ops.click_purchase_join(clicks, purchases), "cp_join"
    )
    got = {tuple(r) for r in result.collect()}

    ev = ops.with_event_time(spark.read.parquet(events_dir))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_time").alias("click_time"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_time").alias("purchase_time"),
    )
    want = {
        tuple(r)
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_time") >= F.col("click_time"))
            & (F.col("purchase_time") <= F.col("click_time") + F.expr("INTERVAL 1 hour")),
        )
        .select(
            F.col("c_user").alias("user_id"), "click_ts", "purchase_ts",
            "purchase_value",
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_join(spark, events_dir):
    """Outer rows (unconverted clicks) emit when the watermark passes the
    click's attribution window. The final availableNow watermark is
    max(event_time) − 2h, so: matched rows must equal the batch inner join
    exactly; every null row must be a genuinely unmatched click; and every
    unmatched click whose window closed strictly before the final watermark
    must have been emitted."""
    clicks = ops.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "click"
    )
    purchases = ops.read_event_stream(spark, events_dir).filter(
        F.col("event_type") == "purchase"
    )
    result = _run_stream(
        spark,
        ops.click_purchase_join(clicks, purchases, how="left_outer"),
        "cp_louter",
    )
    got = result.collect()
    got_matched = {tuple(r) for r in got if r.purchase_ts is not None}
    got_null_clicks = {
        (r.user_id, r.click_ts) for r in got if r.purchase_ts is None
    }

    ev = ops.with_event_time(spark.read.parquet(events_dir))
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_time").alias("click_time"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_time").alias("purchase_time"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (F.col("purchase_time") <= F.col("click_time") + F.expr("INTERVAL 1 hour"))
    )
    want_matched = {
        tuple(r)
        for r in c.join(p, cond)
        .select(F.col("c_user").alias("user_id"), "click_ts", "purchase_ts",
                "purchase_value")
        .collect()
    }
    assert got_matched == want_matched

    unmatched = c.join(p, cond, "left_anti")
    want_null = {(r.c_user, r.click_ts) for r in unmatched.collect()}
    assert got_null_clicks <= want_null

    import datetime

    # the global watermark is the MIN of the two sides' watermarks (each
    # side only sees its own event type after the filter)
    max_c = c.agg(F.max("click_time")).collect()[0][0]
    max_p = p.agg(F.max("purchase_time")).collect()[0][0]
    final_wm = min(max_c, max_p) - datetime.timedelta(hours=2)
    # 1-minute slack: Spark's state watermark applies sub-second
    # adjustments around the eviction boundary
    must_emit = {
        (r.c_user, r.click_ts)
        for r in unmatched.collect()
        if r.click_time + datetime.timedelta(hours=1, minutes=1) < final_wm
    }
    assert must_emit <= got_null_clicks
    assert len(got_null_clicks) > 0


def test_streaming_cms_merges_to_batch_sketch(spark, events_dir):
    """Count-Min counters built per micro-batch and MERGED BY ADDITION must
    equal the one-shot batch sketch — the mergeability property that lets
    per-shard / per-trigger sketches roll up at 100 TB without rescans."""
    from collections import defaultdict

    from icebergsql_spark.operators import sketch

    merged = defaultdict(int)

    def absorb(batch_df, _bid):
        for r in sketch.cms_build(batch_df, "event_type").collect():
            merged[(r.depth, r.bucket)] += r.cnt

    stream = ops.read_event_stream(spark, events_dir)
    q = (
        stream.writeStream.foreachBatch(absorb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = {
        (r.depth, r.bucket): r.cnt
        for r in sketch.cms_build(
            spark.read.parquet(events_dir), "event_type"
        ).collect()
    }
    assert dict(merged) == batch and len(batch) > 0
