"""Round-13 gate wave #7 (pipeline45): the schema-era audit over the
new `$snapshots.schemaId` column, the EWMA control chart, and the
type-EMD streaming twin.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# --------------------------------------------- schema-era audit --


@register(
    "managed_schema_era_audit",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 CAST(o_orderkey % 4 AS INTEGER) AS m
          FROM orders WHERE o_orderkey % 5 = 0
        )
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS DOUBLE) / 100.0 AS total,
               CAST(SUM(CASE WHEN k % 2 = 1 AND k % 3 = 0 THEN k END)
                 AS BIGINT) AS extra_sum
        FROM base GROUP BY m ORDER BY m
    """,
    doc="Schema-era audit through the `$snapshots.schemaId` column "
    "(surfaced this round): a table takes an insert at schema 0, a "
    "RENAME COLUMN (era 1), a second insert, an ADD COLUMN (era 2) "
    "and a third-era insert; the gate asserts the per-commit "
    "schemaId trail in `$snapshots` — era 0 for the first commit, "
    "1 for the post-rename commit, 2 for the post-add commit — "
    "i.e. each snapshot records the schema IN EFFECT when it "
    "committed, joinable against $history for who-wrote-under-"
    "which-schema forensics. Every era's wave is asserted NON-EMPTY "
    "in-gate (a review caught an earlier base filter that made the "
    "later waves provably empty — the mirrored oracle cannot see "
    "vacuity), and reads across all three eras hash-match the "
    "arithmetic oracle (renamed column readable in old files, added "
    "column NULL there).",
    tags=("managed", "sql"),
)
def managed_schema_era_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-erawh-"))
    tbl = eng.catalog.create_table(
        "g_era_audit", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        (F.col("o_orderkey") % 4).cast("int").alias("m"),
    ).filter(F.col("k") % 5 == 0)
    w1 = base.filter(F.col("k") % 2 == 0)
    w2 = base.filter((F.col("k") % 2 == 1) & (F.col("k") % 3 != 0))
    w3 = base.filter((F.col("k") % 2 == 1) & (F.col("k") % 3 == 0))
    # each era's wave must be NON-EMPTY or the cross-era read claims
    # are vacuous (a review caught the original %6 base making waves
    # 2 and 3 provably empty — the mirrored-oracle gate stayed green)
    assert w1.limit(1).count() == 1
    assert w2.limit(1).count() == 1 and w3.limit(1).count() == 1
    s1 = tbl.insert(w1)
    tbl.rename_column("c", "val")
    s2 = tbl.insert(w2.withColumnRenamed("c", "val"))
    tbl.add_column("extra", "bigint")
    s3 = tbl.insert(
        w3.withColumnRenamed("c", "val").withColumn("extra", F.col("k"))
    )
    mark_setup_done()  # three eras committed; the audit is the op
    eras = {
        r["id"]: r["schemaId"]
        for r in eng.sql(
            "SELECT id, schemaId FROM `g_era_audit$snapshots`"
        ).collect()
    }
    assert eras[s1.snapshot_id] == 0, eras
    assert eras[s2.snapshot_id] == 1, eras
    assert eras[s3.snapshot_id] == 2, eras
    # joinable against $history: every era commit is a current ancestor
    anc = eng.sql(
        "SELECT s.schemaId, h.is_current_ancestor "
        "FROM `g_era_audit$snapshots` s "
        "JOIN `g_era_audit$history` h ON h.snapshot_id = s.id"
    ).collect()
    assert len(anc) == 3 and all(r["is_current_ancestor"] for r in anc)
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(val) AS DOUBLE) / 100.0 AS total, "
        "SUM(extra) AS extra_sum "
        "FROM g_era_audit GROUP BY m ORDER BY m"
    )


# ---------------------------------------------- EWMA control chart --

# lambda = 1/2 makes every EWMA value a DYADIC rational: the scaled
# numerator S_t = x_1 + sum_{i=2..t} x_i * 2^(i-2) is an exact bigint
# (window sum of shifted counts), and z_t = S_t / 2^(t-1) is an exact
# dyadic double — bit-identical across engines AND summation orders.
# The +-3-sigma control limit 3*sigma*sqrt((1 - 4^-t)/3) is one
# mirrored double expression over the exact variance integers.
_EWMA_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary; composed batch string character-identical).
_EWMA_TAIL_SQL = """
        idx AS (
          SELECT event_type, day, x,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS rk
          FROM daily
        ),
        g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s,
                 CAST(SUM(x * x) AS BIGINT) AS s2
          FROM idx GROUP BY event_type
        ),
        acc AS (
          SELECT event_type, day, x, rk,
                 CAST(SUM(x * (CASE WHEN rk = 1 THEN 1
                   ELSE {shift_rk2} END)) OVER (
                   PARTITION BY event_type ORDER BY rk)
                   AS BIGINT) AS s_t
          FROM idx
        )
        SELECT a.event_type, a.rk, a.x, a.s_t,
               CAST(a.s_t AS DOUBLE)
                 / CAST({shift_rk1} AS DOUBLE) AS ewma,
               CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE) AS center,
               3.0 * (sqrt(CAST(g.n AS DOUBLE) * CAST(g.s2 AS DOUBLE)
                        - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
                      / CAST(g.n AS DOUBLE))
                 * sqrt((1.0 - 1.0 / CAST({shift_2rk} AS DOUBLE))
                        / 3.0) AS limit3,
               CASE WHEN ABS(CAST(a.s_t AS DOUBLE)
                        / CAST({shift_rk1} AS DOUBLE)
                      - CAST(g.s AS DOUBLE) / CAST(g.n AS DOUBLE))
                      > 3.0 * (sqrt(CAST(g.n AS DOUBLE)
                            * CAST(g.s2 AS DOUBLE)
                            - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE))
                          / CAST(g.n AS DOUBLE))
                        * sqrt((1.0 - 1.0 / CAST({shift_2rk} AS DOUBLE))
                               / 3.0)
                    THEN 1 ELSE 0 END AS flag
        FROM acc a JOIN g ON g.event_type = a.event_type
        ORDER BY a.event_type, a.rk
"""
_EWMA_SQL = _EWMA_HEAD_SQL + _EWMA_TAIL_SQL


def _ewma_shift(engine: str) -> str:
    if engine == "duck":
        return "(CAST(1 AS BIGINT) << CAST({k} AS INTEGER))"
    return "shiftleft(CAST(1 AS BIGINT), CAST({k} AS INT))"


def _ewma_tail(engine: str) -> str:
    sh = _ewma_shift(engine)
    return _EWMA_TAIL_SQL.format(
        shift_rk2=sh.format(k="rk - 2"),
        shift_rk1=sh.format(k="a.rk - 1"),
        shift_2rk=sh.format(k="2 * a.rk"),
    )


def _ewma_sql(engine: str) -> str:
    return (
        _EWMA_HEAD_SQL.format(
            day_expr=(
                "epoch_ns(ts) // 86400000000000"
                if engine == "duck"
                else "ts DIV 86400000000000"
            ),
            src="events" if engine == "duck" else "ev_ewma",
        )
        + _ewma_tail(engine)
    )


@register(
    "events_ewma_control",
    oracle=_ewma_sql("duck"),
    doc="EWMA control chart (lambda = 1/2, +-3 sigma) over each type's "
    "daily-count series — the drift detector that reacts faster than "
    "a Shewhart chart on small persistent shifts. Dyadic exactness: "
    "the scaled numerator S_t = x_1 + sum x_i 2^(i-2) is an exact "
    "bigint window sum and z_t = S_t / 2^(t-1) an exact dyadic "
    "double, so the EWMA line is bit-identical across engines and "
    "summation orders (the decayed-counts shift trick applied to a "
    "recurrence); the time-varying control limit "
    "3*sigma*sqrt((1 - 4^-t)/3) is one mirrored double expression "
    "over exact variance integers, 4^-t itself dyadic. Emits the "
    "full per-day chart with the out-of-control flag. Scale shape: "
    "one (type, day) count + window sums over 30-row partitions.",
    tags=("events", "stats", "streaming"),
)
def events_ewma_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ewma")
    return spark.sql(_ewma_sql("spark"))


# ------------------------------------------ type-EMD streaming twin --


def _emd_oracle() -> str:
    from icebergsql_spark.plans.pipeline44 import _TYPE_EMD_SQL

    return _TYPE_EMD_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    )


@register(
    "events_stream_type_emd",
    oracle=_emd_oracle(),
    doc="STREAMING twin of events_type_emd: per-(type, hour) count "
    "partials (SUM-mergeable, the pipeline40 _hourly_partial_stream "
    "fixture) from 3 chronological micro-batches merge into the "
    "`hist` contract (hour-of-day folded AFTER the merge); the "
    "finalizer runs the IDENTICAL cumulative-difference tail SQL "
    "(shared _TYPE_EMD_TAIL_SQL template). The live daypart-shift "
    "monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_type_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline40 import _hourly_partial_stream
    from icebergsql_spark.plans.pipeline44 import _TYPE_EMD_TAIL_SQL

    _hourly_partial_stream(spark, sf_dir, "temd")
    return spark.sql(
        """
        WITH hist AS (
          SELECT event_type, hour % 24 AS hod,
                 CAST(SUM(c) AS BIGINT) AS c
          FROM temd_hourly GROUP BY 1, 2
        ),"""
        + _TYPE_EMD_TAIL_SQL
    )
