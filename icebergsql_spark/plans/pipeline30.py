"""Round-11 gate wave #13 (pipeline30): adjusted Rand index, Page's
trend test, and the isotonic / Ljung-Box streaming twins.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    local_result,
    register,
    run_partial_stream,
)

# ------------------------------------------- adjusted Rand index --

# Pair-counting with every C(x,2) kept DOUBLED (x*(x-1)) so all four
# sufficient statistics are exact bigints; clearing denominators gives
#   ARI = 2(s2*t2 - ra2*cb2) / (t2*(ra2 + cb2) - 2*ra2*cb2)
# as one exact integer fraction (emitted) + the mirrored float.
_ARI_TAIL_SQL = """
        cont AS (
          SELECT l.cell, e.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM lab l JOIN lbl e ON e.vid = l.vid
          GROUP BY l.cell, e.label
        ),
        s AS (
          SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS s2 FROM cont
        ),
        ra AS (
          SELECT CAST(SUM(a * (a - 1)) AS BIGINT) AS ra2 FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS a FROM cont GROUP BY cell
          ) t
        ),
        cb AS (
          SELECT CAST(SUM(b * (b - 1)) AS BIGINT) AS cb2 FROM (
            SELECT CAST(SUM(c) AS BIGINT) AS b FROM cont GROUP BY label
          ) t
        ),
        nn AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(c) * (SUM(c) - 1) AS BIGINT) AS t2
          FROM cont
        )
        SELECT nn.n, s.s2, ra.ra2, cb.cb2, nn.t2,
               CAST(2 * (s.s2 * nn.t2 - ra.ra2 * cb.cb2) AS BIGINT)
                 AS ari_num,
               CAST(nn.t2 * (ra.ra2 + cb.cb2)
                    - 2 * ra.ra2 * cb.cb2 AS BIGINT) AS ari_den,
               CASE WHEN nn.t2 * (ra.ra2 + cb.cb2)
                         - 2 * ra.ra2 * cb.cb2 <> 0
                    THEN CAST(2 * (s.s2 * nn.t2 - ra.ra2 * cb.cb2)
                              AS DOUBLE)
                         / CAST(nn.t2 * (ra.ra2 + cb.cb2)
                                - 2 * ra.ra2 * cb.cb2 AS DOUBLE)
               END AS ari
        FROM nn CROSS JOIN s CROSS JOIN ra CROSS JOIN cb
"""


def _ari_oracle() -> str:
    from icebergsql_spark.plans.pipeline22 import kmeans_chain_cte

    return (
        kmeans_chain_cte()
        + """
        lbl AS (SELECT vec_id AS vid, label FROM embeddings),
"""
        + _ARI_TAIL_SQL
    )


@register(
    "emb_adjusted_rand_index",
    oracle=_ari_oracle(),
    doc="Adjusted Rand index between the k-means partition and the "
    "ground-truth labels (Hubert & Arabie 1985) — cluster purity's "
    "chance-corrected sibling: purity rewards shattering (singleton "
    "clusters score 1.0), ARI does not, because agreement is "
    "measured on PAIRS and corrected by its expectation under "
    "random partitions with the same marginals. Every C(x,2) is "
    "kept doubled so the four sufficient statistics are exact "
    "bigints, and clearing denominators makes ARI one exact integer "
    "fraction (num/den emitted) + the single mirrored float. Scale "
    "shape: one (cell, label) contingency count; the oracle replays "
    "the shared kmeans round chain.",
    tags=("embeddings", "curation"),
)
def emb_adjusted_rand_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.ml import kmeans_assign
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    # localCheckpoint: SQL references would replay the kmeans lineage
    kmeans_assign(emb, k=8, iterations=2).localCheckpoint(
    ).createOrReplaceTempView("lab")
    emb.select(F.col("vec_id").alias("vid"), "label").createOrReplaceTempView(
        "lbl"
    )
    out = spark.sql("WITH " + _ARI_TAIL_SQL.lstrip())
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)


# ------------------------------------------------ Page trend test --

# Page's L over the Friedman rank blocks with the PRESCRIBED type
# order = alphabetical position j (the monotone-alternative
# hypothesis); doubled ranks keep L2 = sum j*R2_j = 2L exact.  Under
# H0: E[L] = n k (k+1)^2 / 4, Var[L] = n k^2 (k+1) (k^2-1) / 144 —
# emitted as the exact integers 4E and 144Var next to the mirrored z.
# tail shared with the streaming twin (plans/pipeline34.py::
# events_stream_page_trend), which substitutes a merged-partials `cnt`
# head; types/days derive FROM cnt (same sets — every type and day
# appears in some count row), re-verified at 3 SFs after the split.
_PAGE_TAIL_SQL = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        ),
        ranked AS (
          SELECT event_type, day,
                 CAST(RANK() OVER (PARTITION BY day ORDER BY x)
                      AS BIGINT) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY day, x) AS BIGINT)
                   AS tcnt
          FROM daily
        ),
        r2j AS (
          SELECT event_type,
                 CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2_j
          FROM ranked GROUP BY event_type
        ),
        ordj AS (
          SELECT event_type, r2_j,
                 CAST(row_number() OVER (ORDER BY event_type)
                      AS BIGINT) AS j
          FROM r2j
        ),
        dims AS (
          SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM daily
        ),
        stat AS (
          SELECT CAST(SUM(j * r2_j) AS BIGINT) AS l2 FROM ordj
        ),
        calc AS (
          SELECT d.n, d.k, s.l2,
                 CAST(d.n * d.k * (d.k + 1) * (d.k + 1) AS BIGINT)
                   AS e_times4,
                 CAST(d.n * d.k * d.k * (d.k + 1)
                      * (d.k * d.k - 1) AS BIGINT) AS var_times144
          FROM dims d CROSS JOIN stat s
        )
        SELECT o.event_type, o.j, o.r2_j,
               c.n, c.k, c.l2, c.e_times4, c.var_times144,
               CASE WHEN c.var_times144 > 0
                    THEN (CAST(2 * c.l2 - c.e_times4 AS DOUBLE) / 4.0)
                         / sqrt(CAST(c.var_times144 AS DOUBLE)
                                / 144.0)
               END AS z
        FROM ordj o CROSS JOIN calc c
        ORDER BY o.j
"""

_PAGE_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
    + _PAGE_TAIL_SQL
)


@register(
    "events_page_trend",
    oracle=_PAGE_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Page's L trend test over the Friedman rank blocks (Page 1963): "
    "where Friedman only asks WHETHER the five types differ, Page "
    "tests the ORDERED alternative that their within-day ranks "
    "follow the prescribed sequence (alphabetical type position "
    "here — the hypothesis slot a real pipeline fills with its "
    "expected ordering). L = sum j*R_j stays exact via doubled "
    "ranks; the H0 moments are emitted as the exact integers 4E and "
    "144Var so z = (L - E)/sqrt(Var) is one mirrored float over "
    "exact bigints. Same scale shape as Friedman: one spine count, "
    "one per-day rank window.",
    tags=("events", "stats"),
)
def events_page_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_page")
    return spark.sql(
        _PAGE_SQL.format(day_expr="ts DIV 86400000000000", src="ev_page")
    )


# ------------------------------------- isotonic streaming twin --


def _iso_oracle() -> str:
    from icebergsql_spark.plans.pipeline20 import _ISO_SQL

    return _ISO_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


def _partial_stream(
    spark: SparkSession,
    sf_dir: str,
    prefix: str,
    cols,
    keys,
    out_alias: str,
    suffix: str,
    pre_filter=None,
    distinct_markers: bool = False,
) -> None:
    """ONE parameterized count-partial streaming fixture (round-14
    cleanup of three near-copies — r13 lesson 8 / r13 ADVICE): 3
    chronological micro-batches (time-split parquet appends offset
    from min(day), maxFilesPerTrigger=1, availableNow) append
    SUM-mergeable per-``keys`` count partials via foreachBatch; the
    merged result is registered as view ``{prefix}_{suffix}`` with
    the count column aliased ``out_alias``. ``cols`` is the per-batch
    projection (list of Columns) whose output columns are ``keys``.
    Batch-order-invariant by algebra: counts are summed after the
    merge, so micro-batch chopping cannot change the final state.
    ``pre_filter`` (a Column condition) filters each batch before the
    projection. ``distinct_markers=True`` switches from count partials
    to DISTINCT key markers (set-mergeable, the stream_logrank
    sighting pattern): the merged view holds the distinct key tuples
    and ``out_alias`` is unused.
    Wrappers: ``_daily_partial_stream`` (here),
    ``pipeline40._hourly_partial_stream``,
    ``pipeline42._cell_partial_stream``."""
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix=f"icebergsql-{prefix}src-")
    out = tempfile.mkdtemp(prefix=f"icebergsql-{prefix}out-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        b = batch_df
        if pre_filter is not None:
            b = b.filter(pre_filter)
        b = b.select(*cols)
        if distinct_markers:
            b.distinct().write.mode("append").parquet(out)
        else:
            (
                b.groupBy(*keys)
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
                .write.mode("append")
                .parquet(out)
            )

    run_partial_stream(
        spark, src, ev.schema, fold, f"icebergsql-{prefix}ck-"
    )
    merged = spark.read.parquet(out)
    if distinct_markers:
        merged.distinct().createOrReplaceTempView(f"{prefix}_{suffix}")
    else:
        (
            merged.groupBy(*keys)
            .agg(F.sum("c").cast("bigint").alias(out_alias))
            .createOrReplaceTempView(f"{prefix}_{suffix}")
        )


def _daily_partial_stream(
    spark: SparkSession, sf_dir: str, prefix: str
) -> None:
    """The shared daily-count-partial streaming fixture: 3
    chronological micro-batches append SUM-mergeable (type, day, c)
    partials; registers the merged result as view ``{prefix}_daily``
    with the (event_type, day, x) `daily` contract."""
    _partial_stream(
        spark,
        sf_dir,
        prefix,
        cols=[
            F.col("event_type"),
            F.expr("ts DIV 86400000000000").alias("day"),
        ],
        keys=["event_type", "day"],
        out_alias="x",
        suffix="daily",
    )


@register(
    "events_stream_isotonic",
    oracle=_iso_oracle(),
    doc="STREAMING twin of events_isotonic_regression: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL max-min PAVA tail SQL (shared _ISO_TAIL_SQL "
    "template). The live shape-constrained trend fit converging to "
    "the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline20 import _ISO_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "iso")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM iso_daily
        ),
"""
        + _ISO_TAIL_SQL
    )


# ------------------------------------ Ljung-Box streaming twin --


def _lb_oracle() -> str:
    from icebergsql_spark.plans.pipeline21 import _LB_SQL

    return _LB_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        kspine="unnest(generate_series(1, 7))",
        div="//",
    )


@register(
    "events_stream_ljung_box",
    oracle=_lb_oracle(),
    doc="STREAMING twin of events_ljung_box: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL n-scaled deviation / quantized-rho / Box-sum tail "
    "SQL (shared _LB_TAIL_SQL template). The live whiteness monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_ljung_box(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline21 import _LB_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "slb")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM slb_daily
        ),
"""
        + _LB_TAIL_SQL.format(kspine="explode(sequence(1, 7))", div="DIV")
    )
