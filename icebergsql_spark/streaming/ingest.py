"""Streaming ingestion into managed tables.

Bridges Structured Streaming and the snapshot layer: each micro-batch is
appended as ONE snapshot via ``foreachBatch``, giving a commit history that
mirrors the trigger sequence (and therefore batch-granular time travel /
replay). Idempotence note: foreachBatch delivers (batch_id, df) at-least-
once on recovery; the writer records the last committed batch_id in the
snapshot summary and skips batches it has already committed — the standard
exactly-once-per-batch recipe for transactional sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from icebergsql_spark.table import ManagedTable


def _last_batch_id(table: ManagedTable) -> int:
    """Highest ``streaming-batch-id`` over the WHOLE snapshot history.

    Reading only the current snapshot's summary would lose the marker as
    soon as any other commit (compaction, VACUUM, manual DML, a second
    writer) lands between the streaming commit and a recovery replay —
    the replayed batch would then be applied twice.
    """
    table.refresh()
    ids = [
        int(s.summary.get("streaming-batch-id", -1))
        for s in table.meta.snapshots
    ]
    return max(ids, default=-1)


class ManagedTableWriter:
    def __init__(self, table: ManagedTable, distribute_by: list[str] | None = None):
        self.table = table
        self.distribute_by = distribute_by

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch_id(self.table):
            return  # replayed batch after recovery — already committed
        # the batch-id marker rides in the SAME snapshot commit as the
        # data (extra_summary), so a crash can't record one without the
        # other — the transactional-sink exactly-once recipe
        self.table.insert(
            batch_df,
            distribute_by=self.distribute_by,
            extra_summary={"streaming-batch-id": str(batch_id)},
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        """Start the streaming write (availableNow by default)."""
        if not trigger_kwargs:
            trigger_kwargs = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger_kwargs)
            .start()
        )


class ManagedTableUpsertWriter:
    """Streaming MERGE upsert: each micro-batch is pre-aggregated to one
    partial row per key, then MERGE'd into the managed table with
    ACCUMULATING update expressions (``t.n + s.n`` style), so the final
    table state is independent of how the stream was chopped into batches
    — the property that makes a replayed/recovered stream converge to the
    same answer. Exactly-once per batch via the same snapshot-summary
    batch-id marker as :class:`ManagedTableWriter`.

    The Iceberg-world analogue is a streaming `MERGE INTO` maintained mart;
    the reference's surface stops at INSERT
    (InsertIntoIcebergTable.scala:81-330), so this is a beyond-reference
    extension built on the copy-on-write merge primitive (table.py:merge).

    ``prepare``: callable batch_df -> per-key partial DataFrame (must emit
    every key column plus the accumulator columns, one row per key).
    ``set_exprs``: matched-row update expressions over aliases ``t``
    (target) and ``s`` (source partial), e.g.
    ``{"n": "t.n + s.n", "total": "t.total + s.total"}``.
    """

    def __init__(
        self,
        table: ManagedTable,
        keys: list[str],
        prepare,
        set_exprs: dict[str, str],
    ):
        self.table = table
        self.keys = list(keys)
        self.prepare = prepare
        self.set_exprs = dict(set_exprs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch_id(self.table):
            return  # replayed batch after recovery — already merged
        partial = self.prepare(batch_df)
        if not partial.take(1):
            return  # empty batch: re-merging it on replay is a no-op
        # marker + merge land in ONE atomic snapshot commit — a crash
        # between "merge applied" and "marker recorded" is impossible, so
        # a replay can never re-apply the accumulating set_exprs
        self.table.merge(
            partial,
            on=self.keys,
            when_matched="update",
            set_exprs=self.set_exprs,
            when_not_matched_insert=True,
            extra_summary={"streaming-batch-id": str(batch_id)},
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        """Start the streaming upsert (availableNow by default)."""
        if not trigger_kwargs:
            trigger_kwargs = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger_kwargs)
            .start()
        )


class ManagedTableCDCWriter:
    """Streaming upsert via EQUALITY DELETES (the Flink→Iceberg CDC sink
    shape): each micro-batch lands as ONE commit containing the batch's
    new row images plus an equality delete of their keys at the same
    sequence number — old images are masked by seq ordering, with ZERO
    read-before-write. Unlike :class:`ManagedTableUpsertWriter` (a
    copy-on-write MERGE whose cost scales with touched files), this
    writer's per-batch cost is proportional to the batch alone, the only
    sustainable shape for high-rate CDC into a 100 TB table; the read tax
    it accrues is bounded by delete churn and reclaimed by
    ``convert_equality_deletes`` + ``rewrite_position_deletes``.

    ``prepare`` (optional) reduces a batch to one FINAL image per key
    (e.g. latest by timestamp); without it the batch must already be
    key-unique. Exactly-once per batch via the same atomic
    snapshot-summary batch-id marker as the other writers."""

    def __init__(self, table: ManagedTable, keys: list[str], prepare=None):
        self.table = table
        self.keys = list(keys)
        self.prepare = prepare

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch_id(self.table):
            return  # replayed batch after recovery — already committed
        final = self.prepare(batch_df) if self.prepare else batch_df
        if not final.take(1):
            return
        self.table.upsert_by_keys(
            final,
            self.keys,
            extra_summary={"streaming-batch-id": str(batch_id)},
        )

    def attach(self, stream: DataFrame, checkpoint_dir: str, **trigger_kwargs):
        """Start the streaming CDC upsert (availableNow by default)."""
        if not trigger_kwargs:
            trigger_kwargs = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger_kwargs)
            .start()
        )
