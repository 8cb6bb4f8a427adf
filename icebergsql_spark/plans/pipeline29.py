"""Round-11 gate wave #12 (pipeline29): the Friedman streaming twin,
a per-type SPRT monitor, and clone-at-tag (AS OF REF).

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    nonempty,
    register,
    run_partial_stream,
)


# -------------------------------------- Friedman streaming twin --


def _fried_oracle() -> str:
    from icebergsql_spark.plans.pipeline28 import _FRIED_SQL

    return _FRIED_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_friedman",
    oracle=_fried_oracle(),
    doc="STREAMING twin of events_friedman_test: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `cnt` contract; the finalizer runs the IDENTICAL "
    "within-day rank/tie tail SQL (shared _FRIED_TAIL_SQL template). "
    "The live is-the-type-ordering-stable monitor converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline28 import _FRIED_TAIL_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-frsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-frout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                "event_type", F.expr("ts DIV 86400000000000").alias("day")
            )
            .groupBy("event_type", "day")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-frck-")
    spark.read.parquet(out).createOrReplaceTempView("fr_partials")
    return spark.sql(
        """
        WITH cnt AS (
          SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS c
          FROM fr_partials GROUP BY 1, 2
        ),
"""
        + _FRIED_TAIL_SQL
    )


# ------------------------------------------- per-type SPRT compose --

_SPRTT_SQL = """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        first_seen AS (
          SELECT user_id, CAST(MIN(day) AS BIGINT) AS f
          FROM ev GROUP BY user_id
        ),
        tday AS (
          SELECT event_type, user_id, day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2, 3
        ),
        cum AS (
          SELECT event_type, user_id, day,
                 CAST(SUM(c) OVER (PARTITION BY event_type, user_id
                      ORDER BY day) AS BIGINT) AS cc
          FROM tday
        ),
        t20 AS (
          SELECT event_type, user_id, CAST(MIN(day) AS BIGINT) AS t
          FROM cum WHERE cc >= 20 GROUP BY 1, 2
        ),
        spine AS (
          SELECT t.event_type, d.day
          FROM (SELECT DISTINCT event_type FROM ev) t
          CROSS JOIN (SELECT DISTINCT day FROM ev) d
        ),
        trace AS (
          SELECT s.event_type, s.day,
                 CAST((SELECT COUNT(*) FROM first_seen fs
                       WHERE fs.f <= s.day) AS BIGINT) AS n_users,
                 CAST((SELECT COUNT(*) FROM t20
                       WHERE t20.event_type = s.event_type
                         AND t20.t <= s.day) AS BIGINT) AS n_conv
          FROM spine s
        ),
        llr AS (
          SELECT event_type, day, n_users, n_conv,
                 CAST(n_conv AS DOUBLE) * CAST({lr1} AS DOUBLE)
                 + CAST(n_users - n_conv AS DOUBLE)
                   * CAST({lr0} AS DOUBLE) AS llr
          FROM trace
        ),
        decided AS (
          SELECT event_type, day, n_users, n_conv, llr,
                 CASE WHEN llr >= CAST({up} AS DOUBLE)
                        THEN 'accept_h1'
                      WHEN llr <= CAST({lo} AS DOUBLE)
                        THEN 'accept_h0'
                      ELSE 'continue' END AS decision
          FROM llr
        ),
        firstdec AS (
          SELECT event_type,
                 MIN(CASE WHEN decision <> 'continue' THEN day END)
                   AS stop_day
          FROM decided GROUP BY event_type
        )
        SELECT d.event_type, d.day, d.n_users, d.n_conv, d.llr,
               d.decision,
               CAST(CASE WHEN f.stop_day IS NOT NULL
                         AND d.day >= f.stop_day
                    THEN 1 ELSE 0 END AS INTEGER) AS stopped
        FROM decided d
        JOIN firstdec f ON f.event_type = d.event_type
        ORDER BY d.event_type, d.day
"""


def _sprtt_oracle() -> str:
    from icebergsql_spark.plans.pipeline27 import (
        _SPRT_LO,
        _SPRT_LR0,
        _SPRT_LR1,
        _SPRT_UP,
    )

    return _SPRTT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        lr1=_SPRT_LR1,
        lr0=_SPRT_LR0,
        up=_SPRT_UP,
        lo=_SPRT_LO,
    )


@register(
    "events_sprt_by_type",
    oracle=_sprtt_oracle(),
    doc="Per-surface SPRT compose (the events_srm_by_type shape applied "
    "to events_sprt_monitor): one Wald sequential test per event "
    "type, conversion = the user's 20th event OF THAT TYPE landing, "
    "against the shared H0 p=0.02 / H1 p=0.04 literal LLR increments "
    "and ln(19) boundaries. The trace adds a `stopped` flag from "
    "each type's FIRST boundary crossing — sequential testing "
    "discipline means everything after the stop day is "
    "post-decision monitoring, not evidence. High-volume surfaces "
    "(click/view) cross on day one, sparse ones (signup) may run "
    "the whole month — exactly the per-surface triage an "
    "experimentation platform dashboards. All counts exact; the "
    "float surface is integer-count x literal.",
    tags=("events", "stats"),
)
def events_sprt_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline27 import (
        _SPRT_LO,
        _SPRT_LR0,
        _SPRT_LR1,
        _SPRT_UP,
    )
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sprtt")
    return spark.sql(
        _SPRTT_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_sprtt",
            lr1=_SPRT_LR1,
            lr0=_SPRT_LR0,
            up=_SPRT_UP,
            lo=_SPRT_LO,
        )
    )


# ------------------------------------------------- clone at tag --


@register(
    "managed_clone_at_tag",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        WHERE o_orderkey % 2 = 0
        GROUP BY 1 ORDER BY 1
    """,
    doc="CREATE TABLE <t> LIKE <src> AS OF REF <tag> WITH DATA — the "
    "human-addressable form of the AS OF VERSION clone "
    "(sql.py:_LIKE_RE ref branch): the tag pins the snapshot, so "
    "'fork the release-2026-08 training set' needs no snapshot-id "
    "bookkeeping; tags also PROTECT the pinned state from expire GC "
    "(ref retention), making the tag+clone pair the durable "
    "reproduce-this-dataset recipe. Asserted: the clone equals the "
    "tagged state (rows written AFTER the tag absent), an unknown "
    "ref is refused with no destination husk, and $refs still lists "
    "the tag on the SOURCE (cloning never moves refs). Aggregate "
    "hash-matches the raw oracle over the tagged rowset.",
    tags=("managed", "sql"),
)
def managed_clone_at_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-catwh-"))
    tbl = eng.catalog.create_table(
        "src_cat", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng.sql("ALTER TABLE src_cat CREATE TAG release_tag")
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 1)))  # after the tag
    mark_setup_done()  # tagged fixture built; the ref clone is the op
    try:
        eng.sql(
            "CREATE TABLE dst_cat LIKE src_cat AS OF REF nope WITH DATA"
        )
        raise AssertionError("unknown ref must be refused")
    except ValueError as ex:
        assert "unknown ref" in str(ex)
    assert not eng.catalog.table_exists("dst_cat")
    res = eng.sql(
        "CREATE TABLE dst_cat LIKE src_cat AS OF REF release_tag"
        " WITH DATA"
    )
    assert res.collect()[0]["added_files_count"] > 0
    refs = {
        r["name"]
        for r in eng.sql("SELECT name FROM `src_cat$refs`").collect()
    }
    assert "release_tag" in refs, "cloning must not move source refs"
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM dst_cat GROUP BY m ORDER BY m"
    )
