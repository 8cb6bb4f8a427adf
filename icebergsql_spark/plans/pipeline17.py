"""Third-session round-10 gate wave #3 (pipeline17): the Count-Min
heavy-change STREAMING twin and the per-event-type sequential SRM
monitor.

Each gate driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration, and the full registry
re-swept at sf0.01 after they were wired into load_all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    register,
    run_partial_stream,
)


def _stream_cms_change_oracle() -> str:
    from icebergsql_spark.plans.pipeline16 import _cms_change_oracle

    return _cms_change_oracle()


@register(
    "sketch_stream_cms_heavy_change",
    oracle=_stream_cms_change_oracle(),
    doc="STREAMING twin of sketch_cms_heavy_change — the fifth "
    "mergeable-through-time sketch pairing (HLL by MAX, CMS by SUM, "
    "KMV by set-union, Bloom by OR; here the SAME additive CMS merge "
    "carries a change detector): each of 3 chronological "
    "micro-batches appends its per-(half, depth, bucket) counter "
    "PARTIALS plus per-(half, user) count partials to parquet sinks "
    "(both sum-mergeable, so batch chopping and replay cannot change "
    "the merged sketches), and the finalizer sums the counters, "
    "ranks the 3 most + 3 least active users, and scores estimated "
    "vs exact traffic change across the month halves with the "
    "IDENTICAL min-over-depths probe the batch gate runs. Per-batch "
    "state is two 3x256 counter tables + per-user partials — the "
    "always-on traffic-shift monitor shape.",
    tags=("sketch", "countmin", "streaming", "stats"),
)
def sketch_stream_cms_heavy_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from pyspark.sql import Window as W

    from icebergsql_spark.operators import sketch
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-scmssrc-")
    cnt_out = tempfile.mkdtemp(prefix="icebergsql-scmscnt-")
    usr_out = tempfile.mkdtemp(prefix="icebergsql-scmsusr-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        b = batch_df.select(
            F.col("user_id").cast("string").alias("uid"),
            "user_id",
            F.expr("ts DIV 86400000000000").alias("day"),
        ).withColumn(
            "half", F.when(F.col("day") < d0 + 15, 1).otherwise(2)
        )
        for h in (1, 2):
            (
                sketch.cms_build(b.filter(F.col("half") == h), "uid")
                .withColumn("half", F.lit(h))
                .write.mode("append")
                .parquet(cnt_out)
            )
        (
            b.groupBy("user_id", "half")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .write.mode("append")
            .parquet(usr_out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-scmsck-")
    counters = (
        spark.read.parquet(cnt_out)
        .groupBy("half", "depth", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    per_user = (
        spark.read.parquet(usr_out)
        .groupBy("user_id", "half")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .localCheckpoint()
    )
    ucnt = per_user.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("cnt")
    )
    probes = (
        ucnt.withColumn(
            "r1", F.row_number().over(W.orderBy(F.desc("cnt"), "user_id"))
        )
        .withColumn(
            "r2", F.row_number().over(W.orderBy(F.asc("cnt"), "user_id"))
        )
        .filter((F.col("r1") <= 3) | (F.col("r2") <= 3))
        .select("user_id", F.col("user_id").cast("string").alias("uid"))
        .localCheckpoint()
    )
    pb = probes.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        sketch._cms_bucket(F.col("uid"), j).alias("bucket"),
                    )
                    for j in range(3)
                ]
            )
        ).alias("p"),
    ).select("user_id", "p.depth", "p.bucket")
    ests = []
    for h in (1, 2):
        ests.append(
            pb.join(
                F.broadcast(counters.filter(F.col("half") == h)),
                ["depth", "bucket"],
                "left",
            )
            .groupBy("user_id")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("bigint")
                .alias(f"est{h}")
            )
        )
    exacts = [
        per_user.filter(F.col("half") == h).select(
            "user_id", F.col("n").alias(f"exact{h}")
        )
        for h in (1, 2)
    ]
    out = (
        probes.select("user_id")
        .join(ests[0], "user_id")
        .join(ests[1], "user_id")
        .join(exacts[0], "user_id", "left")
        .join(exacts[1], "user_id", "left")
    )
    return out.select(
        "user_id",
        "est1",
        "est2",
        (F.col("est2") - F.col("est1")).cast("bigint").alias("est_change"),
        F.coalesce("exact1", F.lit(0)).cast("bigint").alias("exact1"),
        F.coalesce("exact2", F.lit(0)).cast("bigint").alias("exact2"),
        (
            F.coalesce("exact2", F.lit(0)) - F.coalesce("exact1", F.lit(0))
        ).cast("bigint").alias("exact_change"),
    ).orderBy("user_id")


# --------------------------------------- per-type sequential SRM --

# The tail (counts -> boundary test) is shared verbatim with the
# streaming twin (plans/pipeline18.py::events_stream_srm_by_type),
# whose finalizer supplies its own du relation from MIN-merged
# per-(type, user) first-day partials.
_SRM_TYPE_TAIL_SQL = """
        counts AS (
          SELECT event_type, k,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
          FROM du GROUP BY 1, 2
        ),
        imax AS (
          SELECT event_type, CAST(n0 + n1 AS BIGINT) AS im
          FROM counts WHERE k = 3
        ),
        z AS (
          SELECT counts.event_type, k, n0, n1,
                 CAST(n0 + n1 AS BIGINT) AS i_k, imax.im,
                 sqrt(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                      / CAST(n0 + n1 AS DOUBLE)) AS absz
          FROM counts
          JOIN imax ON imax.event_type = counts.event_type
        )
        SELECT event_type, CAST(k AS INTEGER) AS look, n0, n1,
               CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS chi2_num,
               CAST((i_k * 1000000) {div} im AS BIGINT) AS info_frac_ppm,
               {c} / sqrt(CAST(i_k AS DOUBLE) / CAST(im AS DOUBLE))
                 AS crit,
               absz,
               CAST(CASE WHEN absz >
                         {c} / sqrt(CAST(i_k AS DOUBLE)
                                    / CAST(im AS DOUBLE))
                    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag_seq
        FROM z ORDER BY event_type, look
"""

_SRM_TYPE_SQL = (
    """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        du AS (
          SELECT DISTINCT ev.event_type, looks.k, ev.user_id,
                 CAST({hash_expr} % 2 AS INTEGER) AS arm
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          WHERE ev.day < d0.d0 + 7 * looks.k
        ),
"""
    + _SRM_TYPE_TAIL_SQL
)


@register(
    "events_srm_by_type",
    oracle=_SRM_TYPE_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        hash_expr="CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
        "1, 6) AS BIGINT)",
        div="//",
        c=2.004,
    ),
    doc="Per-event-type SEQUENTIAL sample-ratio-mismatch monitor — "
    "events_srm_sequential drilled into segments (an experiment can "
    "pass the global SRM check while one surface's logging is "
    "broken): per type, cumulative per-arm distinct users at three "
    "weekly looks, |z| tested against the Lan-DeMets "
    "2.004/sqrt(t_k) boundary at the TYPE's own observed information "
    "fraction. Exact bigint counts; mirrored sqrt/div only. Scale "
    "shape: one distinct (type, look, user, arm) projection and a "
    "15-row aggregate.",
    tags=("events", "stats"),
)
def events_srm_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_srmtyp")
    return spark.sql(
        _SRM_TYPE_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_srmtyp",
            unnest_looks="explode(sequence(1, 3))",
            hash_expr="conv(substring(md5(CAST(user_id AS STRING)), "
            "1, 6), 16, 10)",
            div="DIV",
            c=2.004,
        )
    )


# --------------------------------------- source vocabulary overlap --

_VOCAB_TOPK = 40


@register(
    "text_vocab_overlap_pairs",
    oracle=f"""
        WITH tok AS MATERIALIZED (
          SELECT DISTINCT source,
                 unnest(string_split(trim(text), ' ')) AS w
          FROM documents
        ),
        tok2 AS (SELECT source, w FROM tok WHERE w <> ''),
        vs AS MATERIALIZED (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS v
          FROM tok2 GROUP BY source
        ),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM tok2 a JOIN tok2 b
            ON a.w = b.w AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT src_a, src_b, n_common, va.v AS v_a, vb.v AS v_b,
               CAST(n_common * 1000000
                    // (va.v + vb.v - n_common) AS BIGINT)
                 AS jaccard_ppm
        FROM inter
        JOIN vs va ON va.source = inter.src_a
        JOIN vs vb ON vb.source = inter.src_b
        ORDER BY jaccard_ppm DESC, src_a, src_b
        LIMIT {_VOCAB_TOPK}
    """,
    doc="Pairwise source VOCABULARY overlap (the redundancy matrix a "
    "training-mix builder consults before weighting sources: two "
    "sources with near-identical vocabularies add diversity only "
    "once): distinct (source, token) sets, pair intersection via a "
    "token equi-join (never a source x source x vocab cross), exact "
    "Jaccard in integer ppm over the inclusion-exclusion union, "
    "top-40 by (ppm DESC, pair) total order. Complements "
    "text_source_tv_distance (distribution shape) with set overlap. "
    "Scale shape: the join is keyed on token — the same shuffle "
    "profile as the inverted index.",
    tags=("text", "curation", "stats"),
)
def text_vocab_overlap_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    vs = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    a = tok.select(F.col("source").alias("src_a"), "w")
    b = tok.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    return (
        inter.join(
            vs.select(F.col("source").alias("src_a"),
                      F.col("v").alias("v_a")), "src_a")
        .join(
            vs.select(F.col("source").alias("src_b"),
                      F.col("v").alias("v_b")), "src_b")
        .select(
            "src_a", "src_b", "n_common", "v_a", "v_b",
            F.expr("n_common * 1000000 DIV (v_a + v_b - n_common)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "src_a", "src_b")
        .limit(_VOCAB_TOPK)
    )


# --------------------------------------- weekday volume profile --

_WEEKDAY_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cells AS (
          SELECT event_type,
                 CAST(day % 7 AS INTEGER) AS weekday,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ev GROUP BY 1, 2
        ),
        tot AS (
          SELECT event_type, CAST(SUM(n) AS BIGINT) AS t
          FROM cells GROUP BY 1
        )
        SELECT cells.event_type, weekday, n,
               CAST(n * 1000000 {div} tot.t AS BIGINT) AS share_ppm
        FROM cells JOIN tot ON tot.event_type = cells.event_type
        ORDER BY cells.event_type, weekday
"""


@register(
    "events_weekday_profile",
    oracle=_WEEKDAY_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Day-of-week volume profile per event type (epoch-day mod 7 — "
    "a fixed 7-phase bucketing, deliberately calendar-library-free so "
    "both engines agree by arithmetic): exact counts and integer-ppm "
    "shares, the seasonality fingerprint events_weekly_spectrum "
    "summarizes spectrally, emitted as the raw table dashboards "
    "want. One event-scale aggregate; 35 output rows.",
    tags=("events", "window", "stats"),
)
def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_wkd")
    return spark.sql(
        _WEEKDAY_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_wkd", div="DIV"
        )
    )
