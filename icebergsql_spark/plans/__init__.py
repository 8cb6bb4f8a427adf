"""Query-surface registry.

Every operator/query the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a PySpark callable plus (where SQL-expressible) an ANSI-SQL
oracle that DuckDB can run on the same parquet tables. The driver's
correctness gate runs both sides and hash-compares; ``tests/test_queries.py``
runs the identical comparison locally at sf0.001 before the driver does.
"""

from icebergsql_spark.plans.registry import REGISTRY, QuerySpec, register  # noqa: F401


def load_all() -> None:
    """Import every plan module so their @register decorators run.

    ORDER MATTERS: the driver's correctness gate samples roughly the first
    50 registry entries in registration order.  The managed-table surface
    (the reference's core: write -> snapshot -> stats -> pruned scan,
    IceTableScanExec.scala:51-163 / InsertIntoIcebergTable.scala:81-330),
    curation, and pipeline2 queries therefore register FIRST; the TPC-H and
    relational rows already have green driver rows from rounds 1-2 and can
    rotate out of the window (they stay covered by the identical local
    oracle in tests/test_queries.py).
    """
    import icebergsql_spark.plans.managed  # noqa: F401
    import icebergsql_spark.plans.curation  # noqa: F401
    import icebergsql_spark.plans.pipeline2  # noqa: F401
    import icebergsql_spark.plans.relational3  # noqa: F401
    import icebergsql_spark.plans.relational4  # noqa: F401
    import icebergsql_spark.plans.pipeline  # noqa: F401
    import icebergsql_spark.plans.relational  # noqa: F401
    import icebergsql_spark.plans.relational2  # noqa: F401
    import icebergsql_spark.plans.tpch  # noqa: F401
    import icebergsql_spark.plans.tpch2  # noqa: F401
    import icebergsql_spark.plans.tpch3  # noqa: F401
    import icebergsql_spark.plans.pipeline3  # noqa: F401
    import icebergsql_spark.plans.pipeline4  # noqa: F401
