"""Skew mitigation: salted aggregation and salted broadcast-side join.

At 100 TB a single hot key (one viral user_id, one default partition value)
can pin an entire shuffle behind one reducer. Two standard remedies, both
pure DataFrame compositions:

  - salted two-phase aggregation: group on (key, salt) first — N partial
    rows per hot key — then re-aggregate on key. Works for any algebraic
    aggregate (sum/count/min/max; avg via sum+count).
  - replicated ("salt-and-explode") join: salt the skewed fact side,
    explode the dimension side across all salt values, join on (key, salt).
    Shuffle-free when the dimension side broadcasts anyway — included for
    the shuffle-join case AQE's skew handling doesn't cover (e.g. full
    outer).

Spark's AQE (`spark.sql.adaptive.skewJoin.enabled`, on in our session
factory) already splits skewed SMJ partitions at runtime; these operators
cover aggregations and join shapes AQE doesn't touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: returns key_cols + sum_value +
    n_rows, numerically identical to a direct groupBy for integral/decimal
    values (sum over decimal is associative-exact)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.sum(F.col(value_col).cast("decimal(28,2)")).alias("__psum"),
        F.count(F.lit(1)).alias("__pcnt"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__psum").cast("double").alias("sum_value"),
        F.sum("__pcnt").alias("n_rows"),
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed fact table against a small-ish dimension by
    replicating the dimension across n_salts and salting the fact rows —
    each hot key's rows spread over n_salts reducers."""
    fact_salted = fact.withColumn(
        "__salt", (F.rand(seed=7) * n_salts).cast("int")
    )
    dim_replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = fact_salted.join(dim_replicated, [key, "__salt"], how)
    return out.drop("__salt")
