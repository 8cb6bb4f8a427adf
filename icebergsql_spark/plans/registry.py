"""Registry mapping query names to (spark callable, duckdb oracle SQL).

Contract (driver `__spark_entry__.py`):
  - spark callable: (SparkSession, sf_dir) -> DataFrame
  - oracle: ANSI SQL string for DuckDB over pre-registered views named
    region nation customer supplier part orders lineitem events documents
    embeddings; ``None`` for non-SQL-expressible operators (driver then
    records a weaker rows-only check).

Column names of the Spark result and the oracle result MUST match: the
driver sorts columns by name before hashing. Aggregates in oracle SQL are
cast explicitly (DuckDB sum(int) is HUGEINT, Spark's is BIGINT, etc.).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
):
    """Decorator registering a query spec under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def load_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read the driver parquet tables and register them as temp views.

    Scans stay declarative (``spark.read.parquet``) so Catalyst keeps
    predicate pushdown / column pruning into the parquet reader.
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = events_ts_to_nanos(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# events.ts is parquet TIMESTAMP(NANOS). Older Sparks read it as bigint
# nanos under spark.sql.legacy.parquet.nanosAsLong; PySpark 4.1 dropped that
# conf and reads TIMESTAMP_NTZ (nanos truncated to micros — lossless for
# this data, whose nanos are micros*1000). Every consumer in the repo works
# on bigint epoch nanos (tz-free integer arithmetic that bit-matches DuckDB
# epoch_ns), so raw reads are normalized here, at one choke point.
_EPOCH_NS_EXPR = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) "
    "* CAST(1000 AS BIGINT)"
)


def events_ts_to_nanos(df: DataFrame) -> DataFrame:
    """Normalize an events frame so ``ts`` is bigint epoch-nanos.

    No-op when the reader already produced bigint (legacy nanosAsLong
    Sparks); converts via tz-free timestampdiff otherwise. The expression
    is a narrow projection — it fuses into the scan under whole-stage
    codegen, costs no shuffle, and pushdown on other columns is unaffected.
    """
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        return df
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.expr(_EPOCH_NS_EXPR))


def local_result(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-computed result rows as a JVM ``VALUES`` LocalRelation.

    The r10 lesson, applied to gate RETURN frames: ``spark.
    createDataFrame(rows)`` plans a Python-RDD scan with
    defaultParallelism partitions, so a 6-row label/value result costs a
    32-slice Python-runner job plus a shuffle for its ORDER BY (measured
    0.56 s vs 0.10 s for the VALUES form at local[32]).  ``schema`` may
    be a DDL string or a ``StructType`` (e.g. ``out.schema`` from the
    collect-then-rewrap pattern scenario gates use around mid-query
    table mutations); non-scalar or exotic columns fall back to
    ``createDataFrame`` unchanged, so rows are identical either way.
    """
    from icebergsql_spark.table import _values_local_df

    if isinstance(schema, str):
        return _values_local_df(spark, rows, schema)
    scalars = {
        "long", "bigint", "int", "integer", "string", "boolean",
        "double", "float",
    }
    if all(f.dataType.simpleString() in scalars for f in schema.fields):
        ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in schema.fields
        )
        return _values_local_df(spark, rows, ddl)
    return spark.createDataFrame(rows, schema)


def events_min_day(events_path: str, spark: SparkSession | None = None) -> int:
    """Smallest epoch-day of ``events.ts``, answered from the parquet
    FOOTER statistics — no Spark job.

    Thirty streaming-fixture gates anchor their chronological chunk
    split at ``min(ts) DIV 86400000000000`` and each ran a full
    scan+aggregate job just to learn that constant.  Row-group stats on
    the INT64 timestamp column are exact, and the footer min is
    microsecond-truncated at worst, which cannot move the floor-day
    (truncation shaves < 1 us and day boundaries sit on whole seconds).
    Parity with the Spark-computed value is locked per SF in
    tests/test_opt_r14_min_day.py.  No memoization: every call re-reads
    the footer (~1 ms), so no state is carried between bench runs.

    The footer path assumes a single local parquet FILE with datetime
    stats on ``ts`` (true of every current fixture); when ``spark`` is
    given, any footer failure (multi-file directory, regenerated
    fixture without stats) degrades to the old Spark ``min(day)``
    aggregate instead of breaking 30 streaming gates at once
    (round-14 ADVICE).
    """
    from datetime import datetime

    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(events_path).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index("ts")
        best: int | None = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"no ts min/max stats in {events_path}")
            v = st.min
            if not isinstance(v, datetime):
                raise ValueError(f"unexpected ts stat type {type(v)!r}")
            delta = v.replace(tzinfo=None) - datetime(1970, 1, 1)
            ns = (delta.days * 86400 + delta.seconds) * 1_000_000_000 \
                + delta.microseconds * 1_000
            best = ns if best is None else min(best, ns)
        assert best is not None and best >= 0
        return best // 86_400_000_000_000
    except (ValueError, OSError):
        if spark is None:
            raise
        ev = events_ts_to_nanos(spark.read.parquet(events_path))
        return int(
            ev.selectExpr("min(ts DIV 86400000000000) AS d")
            .collect()[0]["d"]
        )


def parquet_date_min_year(path: str, col: str) -> int:
    """Smallest ``year(col)`` of a parquet DATE column, from FOOTER
    statistics — no Spark job (the events_min_day sibling for the
    orders table).  ``year`` is monotone non-decreasing in the date, so
    ``year(min(col))`` IS ``min(year(col))``; date32 footer stats are
    exact (no truncation class at all)."""
    import datetime as _dt

    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    idx = names.index(col)
    best: _dt.date | None = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            raise ValueError(f"no {col} min/max stats in {path}")
        v = st.min
        if not isinstance(v, _dt.date):
            raise ValueError(f"unexpected {col} stat type {type(v)!r}")
        best = v if best is None else min(best, v)
    assert best is not None
    return best.year


def run_partial_stream(
    spark: SparkSession, src: str, schema, fold, ck_prefix: str
) -> None:
    """Run the standard stateless foreachBatch fixture stream
    (time-split parquet source, maxFilesPerTrigger=1, availableNow)
    with scale-adaptive shuffle partitions.

    Streaming micro-batches get no AQE coalescing, so each batch's
    fold ran its partial-aggregate shuffle at the full session
    partition count (32 tasks for KB-sized partials, once per batch).
    ``stream_partitions`` sizes the count from the SOURCE bytes and
    caps it at the session conf — a no-op at cluster scale, a
    single-task shuffle on the bounded local fixture (guide §2).
    Partials are SUM/set-mergeable by contract, so the partition count
    cannot change any merged value.  Extracted in round 15 so the ~29
    stateless stream gates share one code site (the r14 fixture-
    unification rule)."""
    import tempfile

    from icebergsql_spark.operators.util import stream_partitions

    with stream_partitions(spark, src):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix=ck_prefix),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def nonempty(df: DataFrame, label: str = "wave") -> DataFrame:
    """Assert a fixture wave selects at least one row, then return it.

    A multi-wave scenario gate whose wave predicate is VACUOUSLY EMPTY
    (impossible against the base filter) stays oracle-green because the
    mirrored oracle replays the same impossible predicate — the round-13
    era-audit gate shipped exactly that way (`%6` base made every key
    even AND divisible by 3, so the odd-key waves selected zero rows).
    The class is oracle-invisible by construction, so this in-gate
    assert is the ONLY guard. `limit(1)` short-circuits the scan, so
    the extra action is cheap at any scale.
    """
    assert df.limit(1).count() == 1, f"vacuously empty fixture wave: {label}"
    return df
