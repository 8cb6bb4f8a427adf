"""Round-12 gate wave #8 (pipeline38): the register_table procedure
scenario and weekly seasonal-strength decomposition.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import nonempty, register

# ------------------------------------------ register_table CALL --


@register(
    "managed_register_table",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders WHERE o_orderkey % 5 = 0
        GROUP BY 1 ORDER BY 1
    """,
    doc="CALL system.register_table — Iceberg's register_table "
    "procedure (sql.py, Catalog.register_table): adopt a table "
    "directory built by ANOTHER warehouse/catalog under this "
    "catalog's identifier, zero-copy (the link.text pointer the "
    "rename path introduced), keeping its whole snapshot history "
    "writable — the lost-catalog / cross-catalog-migration recovery "
    "verb. Asserted in-gate: reads and a NEW insert through the "
    "adopted identifier, time travel into the pre-adoption snapshot "
    "history, duplicate registration of a live-owned location "
    "refused, and metadata-less dirs refused. Aggregate hash-matches "
    "the raw oracle over the adopted-plus-appended rowset.",
    tags=("managed", "sql"),
)
def managed_register_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine
    from icebergsql_spark.table import Catalog

    ext = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-extwh-"))
    src = ext.create_table(
        "g_orphan", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    ).filter(F.col("k") % 5 == 0)
    s1 = src.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-regwh-"))
    mark_setup_done()  # external table built; adoption is the op
    res = eng.sql(
        f"CALL system.register_table(table => 'g_adopted', "
        f"metadata_location => '{ext.table_location('g_orphan')}')"
    ).collect()[0]
    assert res["current_snapshot_id"] == s1.snapshot_id
    # the pre-adoption snapshot history is intact and writable
    t = eng.catalog.load_table("g_adopted")
    t.insert(nonempty(base.filter(F.col("k") % 2 == 1)))
    n_hist = t.to_df(snapshot_id=s1.snapshot_id).count()
    assert 0 < n_hist
    try:
        eng.catalog.register_table(
            "g_alias", ext.table_location("g_orphan")
        )
        raise AssertionError("duplicate registration must be refused")
    except Exception as ex:
        assert "already registered" in str(ex)
    import tempfile as _tf

    try:
        eng.catalog.register_table("g_junk", _tf.mkdtemp())
        raise AssertionError("metadata-less dir must be refused")
    except Exception as ex:
        assert "no table metadata" in str(ex)
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM g_adopted GROUP BY m ORDER BY m"
    )


# --------------------------------------- weekly seasonal strength --

# Deseasonalized residual d_i = x_i - seasonal_mean(phase) and centered
# t_i = x_i - grand_mean are rationals over exact integer sums with
# MIXED denominators (phases carry 4 or 5 of the 30 days) — so both are
# evaluated as mirrored double expressions and quantized ONCE to 1e-3
# units (the Durbin-Watson discipline); the two sums of squares are
# then exact bigints and the strength ratio is one float expression.
_SS_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, day % 7 AS phase,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `daily` CTE boundary — the composed batch string is character-identical
# to the pre-split template, so the batch gate is not plan-changed).
_SS_TAIL_SQL = """
        g AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sy
          FROM daily GROUP BY event_type
        ),
        p AS (
          SELECT event_type, phase,
                 CAST(COUNT(*) AS BIGINT) AS n_p,
                 CAST(SUM(x) AS BIGINT) AS s_p
          FROM daily GROUP BY event_type, phase
        ),
        q AS (
          SELECT d.event_type,
                 CAST(ROUND((CAST(d.x AS DOUBLE)
                        - CAST(p.s_p AS DOUBLE)
                          / CAST(p.n_p AS DOUBLE)) * 1000.0)
                      AS BIGINT) AS dq,
                 CAST(ROUND((CAST(d.x AS DOUBLE)
                        - CAST(g.sy AS DOUBLE)
                          / CAST(g.n AS DOUBLE)) * 1000.0)
                      AS BIGINT) AS tq
          FROM daily d
          JOIN p ON p.event_type = d.event_type AND p.phase = d.phase
          JOIN g ON g.event_type = d.event_type
        ),
        agg AS (
          SELECT event_type,
                 CAST(SUM(dq * dq) AS BIGINT) AS ss_resid_q,
                 CAST(SUM(tq * tq) AS BIGINT) AS ss_total_q
          FROM q GROUP BY event_type
        )
        SELECT a.event_type, g.n, a.ss_resid_q, a.ss_total_q,
               CASE WHEN a.ss_total_q > 0
                    THEN GREATEST(CAST(0.0 AS DOUBLE),
                           1.0 - CAST(a.ss_resid_q AS DOUBLE)
                                 / CAST(a.ss_total_q AS DOUBLE))
               END AS seasonal_strength
        FROM agg a JOIN g ON g.event_type = a.event_type
        ORDER BY a.event_type
"""
_SS_SQL = _SS_HEAD_SQL + _SS_TAIL_SQL


@register(
    "events_seasonal_strength",
    oracle=_SS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Weekly seasonal-strength score per event type (Hyndman's "
    "STL-strength form on a weekday-mean decomposition): F_s = "
    "max(0, 1 - Var(x - weekday_mean) / Var(x - grand_mean)) — near "
    "1 means the weekday profile explains the series (schedule the "
    "pipeline around it), near 0 means no weekly rhythm. Residuals "
    "have mixed exact denominators (phases hold 4 or 5 of the 30 "
    "days), so each is one mirrored double expression quantized "
    "ONCE to 1e-3 units, after which both sums of squares are exact "
    "bigints and the score is one float expression (GREATEST "
    "mirrors on both engines). Scale shape: one (type, day) count, "
    "two small rollups, one join back.",
    tags=("events", "stats"),
)
def events_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ss")
    return spark.sql(
        _SS_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ss")
    )


# --------------------------------- REPLACE BRANCH (WAP repair) --


@register(
    "managed_replace_branch",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 year(o_orderdate) AS m
          FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS DOUBLE) / 100.0 AS total
        FROM base WHERE k % 3 IN (0, 1)
        GROUP BY m ORDER BY m
    """,
    doc="ALTER TABLE ... REPLACE BRANCH as the write-audit-publish "
    "REPAIR verb: a staging branch takes a good wave then a bad one; "
    "the audit catches it and REPLACE BRANCH retargets the branch "
    "head back to the last audited snapshot (branch rollback — the "
    "bad commit stays in history but off the branch), after which "
    "FAST FORWARD publishes exactly base+good to main. Asserted "
    "in-gate: the branch pointer after replace, main untouched until "
    "publish, and the bad wave's rows absent from the published "
    "state. The un-ship-the-bad-batch flow every WAP pipeline "
    "eventually needs. Aggregate hash-matches the arithmetic oracle "
    "over base + good rows only.",
    tags=("managed", "sql"),
)
def managed_replace_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-rbwh-"))
    tbl = eng.catalog.create_table(
        "g_rbr", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    ).filter(F.col("k") % 7 == 0)
    s1 = tbl.insert(nonempty(base.filter(F.col("k") % 3 == 0)))
    eng.sql(
        f"ALTER TABLE g_rbr CREATE BRANCH staging "
        f"AS OF VERSION {s1.snapshot_id}"
    )
    s2 = tbl.insert(nonempty(base.filter(F.col("k") % 3 == 1)), branch="staging")
    tbl.insert(nonempty(base.filter(F.col("k") % 3 == 2)), branch="staging")  # bad
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == s1.snapshot_id  # main untouched
    mark_setup_done()  # staged good+bad waves; the repair is the op
    # audit failed on the bad wave: roll the branch back to s2
    eng.sql(
        f"ALTER TABLE g_rbr REPLACE BRANCH staging "
        f"AS OF VERSION {s2.snapshot_id}"
    )
    tbl.refresh()
    assert tbl.meta.refs["staging"]["snapshot_id"] == s2.snapshot_id
    assert tbl.meta.refs["staging"]["type"] == "branch"
    eng.sql("ALTER TABLE g_rbr FAST FORWARD staging")
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == s2.snapshot_id
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM g_rbr GROUP BY m ORDER BY m"
    )
