"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §1.1: 'streams — none'); this module
is beyond-reference surface for the training-data-pipeline north star:
event-time windowed aggregation with watermarks (late-data handling) and
custom stateful sessionization via ``applyInPandasWithState``.

Scale notes: windowed aggregation state is bounded by the watermark horizon;
sessionization state is per-user and evicted on gap timeout. Both are
shuffle-partitioned by key, so a 1000-executor cluster shards state
horizontally. The batch twins of these queries (plans/relational.py
events_json_time_bucket) let the DuckDB oracle cover the same semantics the
stream computes incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)
# ts arrives as bigint nanos — the repo-wide events convention (see
# plans/registry.events_ts_to_nanos). Stage raw TIMESTAMP(NANOS) parquet
# through that normalizer before pointing this source at it: a streaming
# source needs a declared schema, so it can't sniff-and-convert per file.


def read_event_stream(
    spark, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def with_event_time(df: DataFrame) -> DataFrame:
    """bigint nanos → timestamp event_time column (micros precision)."""
    return df.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )


def windowed_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window event counts per type with a late-data watermark.

    State is dropped once the watermark passes a window's end, so memory is
    bounded by (watermark horizon / window) × key cardinality.
    """
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 min session gap

SESSION_SCHEMA = (
    "user_id bigint, session_start bigint, session_end bigint, n_events int"
)
STATE_SCHEMA = "open_start bigint, open_end bigint, open_count int"


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Assemble gap-based sessions for one user.

    Emits every session CLOSED by the data seen so far; the trailing open
    session is carried in state (a production stream would also flush it on
    gap timeout via ProcessingTimeTimeout — elided here).

    Ordering contract: micro-batches must arrive per-key in approximate
    event-time order (what a log-backed source delivers per partition);
    events are sorted within a batch, and an event older than the open
    session's span would belong to an already-emitted session (late data —
    ``sessionize_reordered`` is the watermark-buffered variant without
    this contract).
    """
    (user_id,) = key
    ts_sorted: list[int] = []
    for pdf in batches:
        ts_sorted.extend(int(t) for t in pdf["ts"])
    ts_sorted.sort()

    if state.exists:
        open_start, open_end, open_count = state.get
    else:
        open_start = open_end = open_count = None

    closed: list[tuple[int, int, int]] = []
    for t in ts_sorted:
        if open_start is None:
            open_start, open_end, open_count = t, t, 1
        elif t - open_end <= SESSION_GAP_NS:
            open_end, open_count = t, open_count + 1
        else:
            closed.append((open_start, open_end, open_count))
            open_start, open_end, open_count = t, t, 1
    if open_start is not None:
        state.update((open_start, open_end, open_count))

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize(stream: DataFrame) -> DataFrame:
    """Gap-based sessionization (30 min) via applyInPandasWithState —
    the custom stateful operator Spark's built-ins don't provide directly."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


REORDER_STATE_SCHEMA = (
    "pending array<bigint>, open_start bigint, open_end bigint, open_count int"
)


def _sessionize_reordered_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Watermark-buffered sessionization for one user: events are held in a
    reorder buffer until the event-time watermark passes them, so sessions
    are EXACTLY those of the batch twin under any within-watermark disorder
    (the upgrade over _sessionize_group's per-key-ordered-input contract).

    Why this is safe: Spark drops rows older than the watermark before the
    operator, so every future delivered event has ts >= wm. Folding only
    events with ts <= wm therefore never finalizes ahead of a straggler,
    and the trailing open session closes only when wm > open_end + gap —
    the point after which no deliverable event can extend it. State per key
    is the open session plus the <= watermark-horizon reorder buffer, so
    memory stays bounded by delay x per-key event rate."""
    (user_id,) = key
    if state.exists:
        pending_raw, open_start, open_end, open_count = state.get
        pending = list(pending_raw or [])
    else:
        pending, open_start, open_end, open_count = [], None, None, None
    for pdf in batches:
        pending.extend(int(t) for t in pdf["ts"])

    wm_ns = state.getCurrentWatermarkMs() * 1_000_000
    mature = sorted(t for t in pending if t <= wm_ns)
    pending = [t for t in pending if t > wm_ns]

    closed: list[tuple[int, int, int]] = []
    for t in mature:
        if open_start is None:
            open_start, open_end, open_count = t, t, 1
        elif t - open_end <= SESSION_GAP_NS:
            open_end, open_count = t, open_count + 1
        else:
            closed.append((open_start, open_end, open_count))
            open_start, open_end, open_count = t, t, 1
    if open_start is not None and wm_ns > open_end + SESSION_GAP_NS:
        closed.append((open_start, open_end, open_count))
        open_start = open_end = open_count = None

    if pending or open_start is not None:
        state.update((pending, open_start, open_end, open_count))
        # EventTimeTimeout drives draining for keys with NO new data: wake
        # when the watermark reaches the next actionable instant — the
        # oldest buffered event, or the point where the open session's gap
        # has provably elapsed. Without this, a key's last sessions would
        # sit in state forever (the function is only invoked for keys
        # present in a batch or timed out).
        nxt = []
        if pending:
            nxt.append(min(pending))
        if open_start is not None:
            nxt.append(open_end + SESSION_GAP_NS + 1)
        target_ms = min(nxt) // 1_000_000 + 1
        state.setTimeoutTimestamp(max(target_ms, state.getCurrentWatermarkMs() + 1))
    elif state.exists:
        state.remove()
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize_reordered(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessionization that tolerates out-of-order delivery up to
    ``watermark``: the watermark-buffered variant of ``sessionize`` (the
    upgrade flagged in its docstring). Requires the watermark so late rows
    are bounded and the reorder buffer drains."""
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_reordered_group,
            outputStructType=SESSION_SCHEMA,
            stateStructType=REORDER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop duplicate keys within the watermark
    horizon (`dropDuplicatesWithinWatermark`), so state is bounded — the
    streaming twin of the batch exact-dedup operator (operators/dedup.py).
    Typical keys: event_id for at-least-once source dedup, or a content
    fingerprint for payload dedup."""
    keys = keys or ["event_id"]
    return (
        with_event_time(stream)
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def batch_sessions(events: DataFrame) -> DataFrame:
    """Batch twin of ``sessionize`` (windowed lag + cumulative session ids) —
    used to cross-check the streaming operator's output."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    with_gap = events.withColumn(
        "new_session",
        (F.col("ts") - F.lag("ts").over(w) > SESSION_GAP_NS).cast("int"),
    ).withColumn(
        "session_no",
        F.sum(F.coalesce(F.col("new_session"), F.lit(0))).over(
            w.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return with_gap.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    )


def click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: purchases attributed to a same-user click they
    follow within ``within`` — the streaming attribution join.

    Both sides carry watermarks and the join condition carries the
    event-time range, so Spark bounds each side's join state to the
    watermark + range horizon and evicts behind it (unbounded state is the
    failure mode of naive stream joins at 100 TB/day). Inner-join matches
    emit as soon as both rows exist; completeness lags only by delivery.
    State is shuffle-partitioned by user — per-key, horizontally sharded.

    ``how='left_outer'`` additionally emits every UNCONVERTED click (null
    purchase columns) once the watermark passes the end of its attribution
    window — the funnel-drop feed; state bounds are identical because the
    null row is produced exactly at state eviction time.
    """
    c = (
        with_event_time(clicks)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_time").alias("click_time"),
        )
    )
    p = (
        with_event_time(purchases)
        .withWatermark("event_time", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            F.col("event_time").alias("purchase_time"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (
            F.col("purchase_time")
            <= F.col("click_time") + F.expr(f"INTERVAL {within}")
        ),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


# ---------------------------------------------------------------- CEP --

CEP_STATE_SCHEMA = "last_view bigint, last_error bigint"
CEP_OUT_SCHEMA = "day bigint, hit int"


def _cep_group(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user CEP state machine: track the latest 'view' and 'error'
    timestamps; each 'purchase' scores a hit iff a view happened within
    30 minutes before it with no error in between. State is two bigints
    per user (-1 = never seen) — the minimal MATCH_RECOGNIZE prefix
    state. Rows within a batch are sorted by (ts, event_id); cross-batch
    order is the source's responsibility (chronological chunks)."""
    lv, le = state.get if state.exists else (-1, -1)
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    days: list[int] = []
    hits: list[int] = []
    for ts, etype in zip(rows["ts"], rows["event_type"]):
        ts = int(ts)
        if etype == "purchase":
            hit = int(
                lv != -1
                and ts - lv <= 1_800_000_000_000
                and (le == -1 or le < lv)
            )
            days.append(ts // 86_400_000_000_000)
            hits.append(hit)
        elif etype == "view":
            lv = ts
        elif etype == "error":
            le = ts
    state.update((lv, le))
    yield pd.DataFrame({"day": days, "hit": hits})


def cep_view_purchase(stream: DataFrame) -> DataFrame:
    """Streaming complex-event-pattern detection ('view then purchase
    within 30 min, no error between') via applyInPandasWithState — the
    incremental twin of the batch window plan (plans/pipeline6.
    events_cep_pattern), whose oracle checks both. State is two
    timestamps per user, shuffle-partitioned by user_id: a
    1000-executor cluster shards it horizontally and the per-event work
    is O(1), the property that lets CEP keep up with the firehose."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _cep_group,
        outputStructType=CEP_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
