"""Round-13 gate wave #12 (pipeline50): runs up-down randomness test.

(A second-eigenvector-by-deflation gate was designed, replica-tested,
and DROPPED: few-round power iteration + deflation is not semantically
robust — the numpy replica measured cos 0.0003 against the true second
eigenvector on double-spiked covariances, and the real embedding
table's near-isotropic spectrum (lambda2/lambda1 = 0.955) makes
fixed-round convergence claims dishonest. The formula-review pass
exists to catch exactly this before registration.)

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ----------------------------------------------- runs up and down --

# Runs up-and-down (successive-difference signs): a different null
# than the above/below-median runs test already shipped — it catches
# short-scale zigzag/momentum structure the level-based test misses.
# Zero diffs are dropped (both engines identically); with m retained
# diffs the exact moments are E = (2m+1)/3 and Var = (16m-13)/90,
# emitted as the exact integers 3E = 2m+1 and 90Var = 16m-13; z is
# one mirrored double expression.
_RUD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
        d AS (
          SELECT event_type, day,
                 x - LAG(x) OVER (PARTITION BY event_type
                   ORDER BY day) AS diff
          FROM daily
        ),
        sgn AS (
          SELECT event_type, day,
                 CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
          FROM d WHERE diff IS NOT NULL AND diff <> 0
        ),
        flips AS (
          SELECT event_type, s,
                 LAG(s) OVER (PARTITION BY event_type
                   ORDER BY day) AS prev
          FROM sgn
        ),
        agg AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(1 + SUM(CASE WHEN prev IS NOT NULL
                       AND s <> prev THEN 1 ELSE 0 END) AS BIGINT)
                   AS runs
          FROM flips GROUP BY event_type
        )
        SELECT event_type, m, runs,
               CAST(2 * m + 1 AS BIGINT) AS e3,
               CAST(16 * m - 13 AS BIGINT) AS var90,
               CASE WHEN 16 * m - 13 > 0
                    THEN (CAST(runs AS DOUBLE)
                          - CAST(2 * m + 1 AS DOUBLE) / 3.0)
                         / sqrt(CAST(16 * m - 13 AS DOUBLE) / 90.0)
               END AS z
        FROM agg
        ORDER BY event_type
"""


@register(
    "events_runs_up_down",
    oracle=_RUD_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Runs up-and-down test on each type's daily-count series: "
    "count the runs of successive-difference SIGNS — the "
    "short-scale randomness null (catches zigzag/momentum "
    "structure) complementing the above/below-median runs test "
    "already shipped (which sees only level structure). Zero "
    "diffs dropped identically in both engines; exact moments "
    "emitted as integers (3E = 2m+1, 90Var = 16m-13); z one "
    "mirrored double. Scale shape: one (type, day) count + LAG "
    "windows over 30-row partitions.",
    tags=("events", "stats"),
)
def events_runs_up_down(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_rud")
    return spark.sql(
        _RUD_SQL.format(day_expr="ts DIV 86400000000000", src="ev_rud")
    )
