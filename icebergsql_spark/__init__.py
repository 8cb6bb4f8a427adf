"""icebergsql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of hbutani/icebergSQL, rebuilt Spark-first.

The reference (a Spark 2.4 Scala extension integrating Netflix Iceberg 0.6.3)
adds snapshot-managed parquet tables on top of stock Spark: managed CREATE
TABLE, snapshotting INSERT/OVERWRITE, manifest+stats file pruning, derived
predicates via column dependencies, time travel, and a ``$snapshots`` view.
This package provides the same capabilities as a pure-Python metadata layer
over PySpark DataFrames (no JVM extension needed), plus the relational query
surface the reference delegates to Spark and a set of large-scale
training-data pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Layout:
  session.py       Spark session factory tuned for local[N] / cluster use
  catalog/         table metadata, snapshots, manifests, parquet stats
  expressions.py   predicate AST, parser, min/max-stats evaluation
  transforms.py    Iceberg-semantics partition transforms (truncate, bucket,
                   year/month/day/hour) with inclusive predicate projection
  deps.py          columnDependencies parsing + derived-predicate augmentation
  table.py         ManagedTable: insert / overwrite / scan / time travel
  sql.py           Engine: SQL compat front door (`as of`, `$snapshots`, DDL)
  plans/           the query surface (TPC-H-ish + relational operators)
  operators/       dedup, similarity search, text analysis, multimodal
  streaming/       Structured Streaming operators (windowed aggs, sessions)
"""

__version__ = "0.1.0"

from icebergsql_spark.session import get_spark  # noqa: F401
