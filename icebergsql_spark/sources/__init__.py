from icebergsql_spark.sources.datasource import (  # noqa: F401
    IcebergSQLDataSource,
    register_datasource,
)
