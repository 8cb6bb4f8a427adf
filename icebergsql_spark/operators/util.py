"""Shared operator plumbing."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

# Iterative operators (pagerank, kmeans) persist loop-invariant frames so a
# lazy multi-round DAG doesn't re-derive its inputs once per round. In a
# long-lived session (the 144-query gate, repeated bench iterations) those
# cached blocks would otherwise accumulate unboundedly — LRU eviction keeps
# results correct but memory/disk pressure grows per call. Operators route
# every persist through track_cache(); callers that materialize the result
# (bench.py, tests, any driver loop) call release_caches() afterwards.
_LIVE_CACHES: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for a later ``release_caches()``."""
    df.persist()
    _LIVE_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked frame (non-blocking); returns the count.

    Safe to call at any time: unpersisting only drops cached blocks — a
    still-referenced plan recomputes from lineage, never errors.
    """
    n = 0
    while _LIVE_CACHES:
        df = _LIVE_CACHES.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            pass  # session already stopped
    return n


# Scenario gate queries (fresh managed table + inserts built INSIDE the
# timed callable) dominate their bench row with fixture cost, which the
# 100×-scale reading misattributes to the operator under test.  Gates
# call mark_setup_done() after the fixture is built; bench.py pops the
# mark and reports [setup, query] separately for those rows.  A no-op
# everywhere else — correctness comparisons ignore it entirely.
_SETUP_MARK: list[float] = []


def mark_setup_done() -> None:
    """Record 'the scenario fixture is built; what follows is the query'."""
    import time

    _SETUP_MARK.clear()
    _SETUP_MARK.append(time.time())


def pop_setup_mark() -> float | None:
    """Return and clear the last mark (None if the gate never set one)."""
    if _SETUP_MARK:
        t = _SETUP_MARK[0]
        _SETUP_MARK.clear()
        return t
    return None


def ensure_parallelism(df: DataFrame, min_rows_per_split: int = 1) -> DataFrame:
    """Spread a narrow-input DataFrame across all cores before a CPU-heavy
    per-row map.

    Spark sizes scan partitions by bytes (``spark.sql.files.maxPartitionBytes``),
    which is right for IO-bound scans but serializes compute-bound maps over
    small-but-expensive inputs (a 1 MB documents file = 1 split = 1 task
    doing ALL the tokenize/shingle/hash work while 31 cores idle).

    The repartition is GATED: it only fires when the scan produced fewer
    splits than the cluster's parallelism. At corpus scale (thousands of
    file splits >> cores) this is a no-op and adds no shuffle; at bench/test
    scale it shuffles the raw input once (tiny) to unlock the cores.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


@contextmanager
def stream_partitions(spark, *src_dirs: str, target_bytes: int = 32 << 20):
    """Scale a streaming query's shuffle/state partitions with SOURCE SIZE.

    Streaming micro-batches do not get AQE partition coalescing, so every
    stateful operator pays a fixed per-partition cost (state-store open +
    commit per micro-batch, 2-4 stores per partition for joins/dedup) at
    whatever ``spark.sql.shuffle.partitions`` the session was built with.
    That cost is right when state is large and catastrophic when state is
    small: the stream-stream attribution join measured 8 s at 32
    partitions vs 2.7 s at 8 on the same data (the state is KB-sized).

    The partition count is derived from the on-disk byte size of the
    stream's source dirs (one partition per ``target_bytes`` of input,
    ~32 MB) and CAPPED at the session's configured value, so at cluster
    scale the setting is a no-op (size/32 MB exceeds the cap and the
    session value wins) while bounded local fixtures collapse to a
    handful of state stores.  Scale-adaptive per the same rule as
    ``ensure_parallelism`` — derived from data, not hard-coded for any
    one machine.

    Use as a context manager around ``start()`` + ``awaitTermination()``:
    the conf is pinned into the stream at start and restored after, so
    surrounding batch queries are unaffected.

    NOT for Python-stateful streams (``applyInPandasWithState``): there
    the partition count is the Python-worker parallelism and the
    per-group compute dominates the store commits (events_stream_cep
    measured 5.7 s at 32 partitions vs 14 s at 1).  JVM-stateful
    operators (stream-stream joins, dropDuplicates*, windowed
    aggregations) and stateless foreachBatch partial sinks (no AQE in
    micro-batches either — see plans/registry.run_partial_stream).

    SINGLE-THREADED assumption (round-14 ADVICE): this mutates the
    session-global ``spark.sql.shuffle.partitions`` for the stream's
    duration, so any query planned concurrently on the same session
    (a second thread, parallel gates) would silently inherit the
    reduced parallelism.  The bench and the driver run gates
    sequentially; a concurrent harness must scope the setting
    per-query instead.
    """
    import math
    import os

    total = 0
    for d in src_dirs:
        for root, _dirs, files in os.walk(d):
            for fn in files:
                if fn.startswith((".", "_")):
                    continue
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    old = spark.conf.get("spark.sql.shuffle.partitions")
    n = min(int(old), max(1, math.ceil(total / target_bytes)))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
