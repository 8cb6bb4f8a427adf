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
        if name == "events":
            # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
            # reader rejects; read it as bigint nanos and convert downstream
            # with tz-free arithmetic (see plans/relational.py events query).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
