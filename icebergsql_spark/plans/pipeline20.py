"""Round-11 gate wave #3 (pipeline20): Wald-Wolfowitz runs test, the
ANOVA streaming twin, isotonic (PAVA) regression via the exact max-min
formulation, resource-allocation link prediction, audio zero-crossing
rate (new operator), and a property-driven delete-mode switch on the
managed table.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    register,
    run_partial_stream,
)

# ------------------------------------------ Wald-Wolfowitz runs test --

# Randomness-of-sequence test on the per-type daily volume series:
# days above the interpolated median map to 1, below to 0 (exact-median
# days drop, the classical convention), R = number of runs.  Under H0
# mu = 2*n1*n2/(n1+n2) + 1 and sigma^2 = (mu-1)(mu-2)/(n-1); n1/n2/R
# ride along as exact bigints, mu/z are the mirrored float tail.
# tail shared with the streaming twin (events_stream_runs_test below),
# which substitutes a merged-partials `daily` head
_RUNS_TAIL_SQL = """
        med AS (
          SELECT event_type, {median} AS med
          FROM daily GROUP BY event_type
        ),
        seq AS (
          SELECT d.event_type, d.day,
                 CASE WHEN CAST(d.x AS DOUBLE) > m.med
                      THEN 1 ELSE 0 END AS sgn
          FROM daily d JOIN med m ON m.event_type = d.event_type
          WHERE CAST(d.x AS DOUBLE) <> m.med
        ),
        runs AS (
          SELECT event_type, day, sgn,
                 CASE WHEN lag(sgn) OVER (
                        PARTITION BY event_type ORDER BY day) IS NULL
                      OR lag(sgn) OVER (
                        PARTITION BY event_type ORDER BY day) <> sgn
                      THEN 1 ELSE 0 END AS new_run
          FROM seq
        ),
        stats AS (
          SELECT event_type,
                 CAST(SUM(sgn) AS BIGINT) AS n1,
                 CAST(SUM(1 - sgn) AS BIGINT) AS n2,
                 CAST(SUM(new_run) AS BIGINT) AS r
          FROM runs GROUP BY event_type
        ),
        mm AS (
          SELECT event_type, n1, n2, r,
                 CAST(n1 + n2 AS BIGINT) AS n,
                 CASE WHEN n1 > 0 AND n2 > 0
                      THEN 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                           / CAST(n1 + n2 AS DOUBLE) + 1.0 END AS mu
          FROM stats
        ),
        vv AS (
          SELECT event_type, n1, n2, r, n, mu,
                 CASE WHEN mu IS NOT NULL AND n > 1
                      THEN (mu - 1.0) * (mu - 2.0)
                           / CAST(n - 1 AS DOUBLE) END AS vr
          FROM mm
        )
        SELECT event_type, n1, n2, r, mu,
               CASE WHEN vr IS NOT NULL AND vr > 0.0
                    THEN (CAST(r AS DOUBLE) - mu) / sqrt(vr) END AS z
        FROM vv
        ORDER BY event_type
"""

_RUNS_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
"""
    + _RUNS_TAIL_SQL
)


@register(
    "events_runs_test",
    oracle=_RUNS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        median="quantile_cont(x, 0.50)",
    ),
    doc="Wald-Wolfowitz runs test per event type on the daily volume "
    "series: is day-to-day traffic a random scatter around its median, "
    "or does it trend/cluster (too few runs) or oscillate (too many)? "
    "Days above the interpolated median (Spark percentile == DuckDB "
    "quantile_cont) map to 1, below to 0, exact-median days drop per "
    "the classical convention; runs counted by a LAG transition sum. "
    "n1/n2/R are exact bigints; mu = 2 n1 n2/(n1+n2)+1 and z = "
    "(R-mu)/sqrt((mu-1)(mu-2)/(n-1)) are the mirrored float tail with "
    "degenerate one-sided sequences NULL-guarded on both engines. The "
    "nonparametric stationarity smoke test that belongs next to "
    "Mann-Kendall in a telemetry-quality battery. Scale shape: one "
    "(type, day) count, one 5-group median, one window pass.",
    tags=("events", "stats"),
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_runs")
    return spark.sql(
        _RUNS_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_runs",
            median="percentile(x, CAST(50 AS DOUBLE) / 100.0)",
        )
    )


# ------------------------------------------- streaming ANOVA twin --


def _anova_oracle() -> str:
    from icebergsql_spark.plans.pipeline19 import _ANOVA_SQL

    return _ANOVA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    )


@register(
    "events_stream_anova",
    oracle=_anova_oracle(),
    doc="STREAMING twin of events_anova_oneway: each of 3 chronological "
    "micro-batches appends per-(type, day) count partials (SUM-"
    "mergeable, replay/chopping safe) to a parquet sink; the finalizer "
    "merges them into the `cnt` contract and runs the IDENTICAL "
    "spine/sums-of-squares tail SQL (shared _ANOVA_TAIL_SQL template "
    "with the batch gate). The live does-traffic-differ-by-surface "
    "F-statistic converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline19 import _ANOVA_TAIL_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-anvsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-anvout-")
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

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-anvck-")
    spark.read.parquet(out).createOrReplaceTempView("anova_partials")
    return spark.sql(
        """
        WITH cnt AS (
          SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS c
          FROM anova_partials GROUP BY 1, 2
        ),
"""
        + _ANOVA_TAIL_SQL.format(div="DIV")
    )


# ------------------------------------- isotonic regression (PAVA) --

# Exact pool-adjacent-violators fit via the classical max-min identity
# (Robertson/Wright/Dykstra 1988): the isotonic fit at position i is
#   fit_i = max_{j<=i} min_{k>=i} mean(x_j..x_k)
# which needs no sequential pooling loop — every candidate mean is one
# prefix-sum difference, so both engines evaluate the SAME finite set
# of double divisions and take MIN/MAX over identical values.  n = 30
# days per type, so the (j<=i<=k) triple space is ~5k rows per type.
# tail shared with the streaming twin (plans/pipeline30.py::
# events_stream_isotonic), which substitutes a merged-partials
# `daily` head
_ISO_TAIL_SQL = """
        idx AS (
          SELECT event_type, day, x,
                 CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn,
                 CAST(SUM(x) OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS p
          FROM daily
        ),
        pairs AS (
          SELECT j.event_type, j.rn AS jr, k.rn AS kr,
                 CAST(k.p - j.p + j.x AS DOUBLE)
                   / CAST(k.rn - j.rn + 1 AS DOUBLE) AS avgv
          FROM idx j JOIN idx k
            ON k.event_type = j.event_type AND k.rn >= j.rn
        ),
        mji AS (
          SELECT p.event_type, p.jr, i.rn AS ir, MIN(p.avgv) AS m
          FROM pairs p JOIN idx i
            ON i.event_type = p.event_type
           AND p.jr <= i.rn AND p.kr >= i.rn
          GROUP BY 1, 2, 3
        ),
        fit AS (
          SELECT event_type, ir, MAX(m) AS fit FROM mji GROUP BY 1, 2
        )
        SELECT i.event_type, i.day, CAST(i.x AS BIGINT) AS x, f.fit,
               CAST(CASE WHEN lag(f.fit) OVER (
                      PARTITION BY i.event_type ORDER BY i.day) IS NULL
                    OR f.fit >= lag(f.fit) OVER (
                      PARTITION BY i.event_type ORDER BY i.day)
                    THEN 1 ELSE 0 END AS INTEGER) AS is_mono
        FROM idx i JOIN fit f
          ON f.event_type = i.event_type AND f.ir = i.rn
        ORDER BY i.event_type, i.day
"""

_ISO_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
"""
    + _ISO_TAIL_SQL
)


@register(
    "events_isotonic_regression",
    oracle=_ISO_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Isotonic (PAVA) regression of each event type's daily volume "
    "onto a monotone-nondecreasing trend — the shape-constrained fit "
    "calibration pipelines use where a parametric curve would be a "
    "lie. Computed via the exact max-min identity fit_i = max_{j<=i} "
    "min_{k>=i} mean(x_j..x_k) (Robertson et al. 1988) instead of the "
    "sequential pooling loop: every candidate mean is one prefix-sum "
    "difference, both engines evaluate the identical finite set of "
    "double divisions, and MIN/MAX over identical doubles cannot "
    "diverge. A per-row monotonicity flag (LAG comparison) audits the "
    "defining constraint inside the gate itself. Scale shape: the "
    "triple join is O(n^3) in the SERIES length (30 days — a bounded "
    "calendar window, not the data volume); the data-sized work is "
    "one (type, day) count.",
    tags=("events", "stats"),
)
def events_isotonic_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_iso")
    return spark.sql(
        _ISO_SQL.format(day_expr="ts DIV 86400000000000", src="ev_iso")
    )


# ------------------------------- resource-allocation link prediction --


def _ra_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    return (
        _EDGE_SQL
        + """,
        deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d
                FROM e GROUP BY 1),
        wt AS (SELECT n, CAST(1000000 // d AS BIGINT) AS w FROM deg),
        two_hop AS (
          SELECT e1.a AS a, e2.b AS c,
                 CAST(SUM(wt.w) AS BIGINT) AS ra_ppm,
                 CAST(COUNT(*) AS BIGINT) AS common
          FROM e e1
          JOIN e e2 ON e1.b = e2.a AND e1.a < e2.b
          JOIN wt ON wt.n = e1.b
          GROUP BY 1, 2
        ),
        nonadj AS (
          SELECT t.a, t.c, t.common, t.ra_ppm
          FROM two_hop t
          WHERE NOT EXISTS (
            SELECT 1 FROM half h WHERE h.a = t.a AND h.b = t.c
          )
        )
        SELECT a, c, common, ra_ppm FROM nonadj
        ORDER BY ra_ppm DESC, a, c
        LIMIT 20
    """
    )


@register(
    "graph_resource_allocation",
    oracle=_ra_oracle(),
    doc="Resource-allocation link prediction on the token co-occurrence "
    "graph (Zhou/Lu/Zhang 2009) — Adamic-Adar's FULLY-EXACT sibling: "
    "each shared neighbor z contributes 1/deg(z), integer-ized as "
    "1000000 DIV deg (truncating integer division, identical to "
    "DuckDB // on the non-negative degrees) so the score is an exact "
    "bigint ppm with NO float anywhere — ranking included. Empirically "
    "RA beats AA on dense graphs because hub neighbors are damped "
    "harder (1/d vs 1/ln d). Same scale shape as common_neighbors: "
    "one 2-hop self-join keyed on the middle node, the degree weight "
    "broadcast, adjacency removed by anti-join, top-20 under a total "
    "deterministic (ra_ppm, a, c) order.",
    tags=("graph", "join"),
)
def graph_resource_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 120
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    half = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 74)
        .select("a", "b")
        .localCheckpoint()
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = e.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wt = deg.select("n", F.expr("CAST(1000000 DIV d AS BIGINT)").alias("w"))
    e1, e2 = e.alias("e1"), e.alias("e2")
    two_hop = (
        e1.join(
            e2,
            (F.col("e1.b") == F.col("e2.a"))
            & (F.col("e1.a") < F.col("e2.b")),
        )
        .join(F.broadcast(wt), F.col("e1.b") == F.col("n"))
        .groupBy(F.col("e1.a").alias("a"), F.col("e2.b").alias("c"))
        .agg(
            F.sum("w").cast("bigint").alias("ra_ppm"),
            F.count(F.lit(1)).cast("bigint").alias("common"),
        )
    )
    nonadj = two_hop.join(
        half.withColumnRenamed("b", "c"), ["a", "c"], "left_anti"
    )
    return (
        nonadj.select("a", "c", "common", "ra_ppm")
        .orderBy(F.desc("ra_ppm"), "a", "c")
        .limit(20)
    )


# ------------------------------------------ audio zero-crossing rate --

_ZCR_MAX_DOC = 400


def _zcr_oracle() -> str:
    from icebergsql_spark.plans.pipeline18 import (
        _GOER_AMP,
        _GOER_N,
        _GOER_WINS,
    )

    half_p = (
        "CASE (doc_id + win * (doc_id % 2)) % 3"
        " WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END"
    )
    return f"""
        WITH samp AS MATERIALIZED (
          SELECT doc_id, w.win AS win, i.i AS i,
                 CASE WHEN ((i.i // ({half_p})) % 2) = 0
                      THEN {_GOER_AMP} ELSE -{_GOER_AMP} END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_GOER_WINS - 1}))
                      AS win) w
          CROSS JOIN (SELECT unnest(generate_series(0, {_GOER_N - 1}))
                      AS i) i
          WHERE doc_id < {_ZCR_MAX_DOC}
        ),
        cross_flags AS MATERIALIZED (
          SELECT doc_id, win, i,
                 CASE WHEN s * lag(s) OVER (
                        PARTITION BY doc_id, win ORDER BY i) < 0
                      THEN 1 ELSE 0 END AS flips
          FROM samp
        ),
        zcr AS MATERIALIZED (
          SELECT doc_id, win, CAST(SUM(flips) AS BIGINT) AS zcr
          FROM cross_flags GROUP BY doc_id, win
        )
        SELECT CAST(doc_id % 2 AS INTEGER) AS hopping,
               CAST(win AS INTEGER) AS frame,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(zcr) AS BIGINT) AS sum_zcr,
               CAST(MIN(zcr) AS BIGINT) AS min_zcr,
               CAST(MAX(zcr) AS BIGINT) AS max_zcr
        FROM zcr
        GROUP BY 1, 2 ORDER BY 1, 2
    """


@register(
    "multimodal_audio_zcr",
    oracle=_zcr_oracle(),
    doc="Zero-crossing rate over REAL WAV payloads — the cheapest "
    "voiced/unvoiced & noisiness feature in the audio-curation "
    "toolbox: per non-overlapping 64-sample frame, the count of "
    "strict sign flips s[i-1]*s[i] < 0 (operators/multimodal.py::"
    "audio_zcr — zero samples never count, so the quantity is an "
    "exact integer both engines replay). The frequency-hopping "
    "square-wave fixture makes ZCR fully predictable: a frame with "
    "half-period p crosses exactly 63 DIV p times, so constant docs "
    "hold one value across frames while hopping docs walk 31/15/7 — "
    "the per-(class, frame) rollup separates every class with zero "
    "tolerance. Arrow-batched narrow map, no shuffle; the oracle "
    "replays the planted samples and counts LAG sign products.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.pipeline18 import (
        _GOER_AMP,
        _GOER_HOPS,
        _GOER_N,
        _GOER_WINS,
    )
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _ZCR_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = []
                for j in range(_GOER_WINS):
                    half_p = _GOER_HOPS[(d + j * (d % 2)) % 3]
                    samples.extend(
                        _GOER_AMP if (i // half_p) % 2 == 0 else -_GOER_AMP
                        for i in range(_GOER_N)
                    )
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    multimodal.audio_zcr(blobs, frame_len=_GOER_N).createOrReplaceTempView(
        "zcr_frames"
    )
    return spark.sql("""
        SELECT CAST(doc_id % 2 AS INT) AS hopping,
               CAST(frame AS INT) AS frame,
               COUNT(*) AS n_docs,
               CAST(SUM(zcr) AS BIGINT) AS sum_zcr,
               CAST(MIN(zcr) AS BIGINT) AS min_zcr,
               CAST(MAX(zcr) AS BIGINT) AS max_zcr
        FROM zcr_frames
        GROUP BY doc_id % 2, frame
        ORDER BY hopping, frame
    """)


# ------------------------------------ delete-mode switch mid-life --


@register(
    "managed_delete_mode_switch",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        WHERE o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 3
        GROUP BY 1 ORDER BY 1
    """,
    doc="Property-driven write-mode switch mid-life: the table starts "
    "on the default copy-on-write delete mode (first DELETE rewrites "
    "the straddling files — asserted: new data files written, zero "
    "DVs), then ALTER TABLE SET TBLPROPERTIES flips "
    "write.delete.mode to merge-on-read and the SECOND delete writes "
    "position delete vectors instead (asserted: zero data files "
    "added, live file set unchanged, DV manifests present) — "
    "table.py reads the mode from properties AT CALL TIME "
    "(table.py:829), so the switch needs no rewrite, exactly like "
    "Iceberg's write-config properties. The metadata COUNT fast path "
    "stays exact across both regimes, and the final cross-era "
    "aggregate hash-matches the raw oracle. The lifecycle every "
    "production table walks when delete traffic outgrows "
    "copy-on-write economics.",
    tags=("managed", "dml", "mor", "sql"),
)
def managed_delete_mode_switch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-dmswh-"))
    tbl = eng.catalog.create_table(
        "t_modesw", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    tbl.insert(base)
    mark_setup_done()  # fixture built; CoW delete + switch + MoR delete
    snap1 = tbl.delete_where("k % 5 = 0")
    assert snap1.num_added_files > 0, "CoW delete must rewrite files"
    assert not snap1.dv_manifest_paths, "CoW delete must not write DVs"
    assert tbl.scan().count_from_stats() == tbl.to_df().count()
    eng.sql(
        "ALTER TABLE t_modesw SET TBLPROPERTIES "
        "('write.delete.mode'='merge-on-read')"
    )
    tbl.refresh()
    assert (
        tbl.meta.properties.get("write.delete.mode") == "merge-on-read"
    )
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap2 = tbl.delete_where("k % 7 = 3")
    assert snap2.num_added_files == 0, "MoR delete must not write files"
    assert {f.path for f in snap2.live_files()} == before
    assert snap2.dv_manifest_paths, "MoR delete must record DVs"
    assert tbl.scan().count_from_stats() == tbl.to_df().count()
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM t_modesw GROUP BY m ORDER BY m"
    )


# --------------------------------------------- streaming BH-FDR twin --


def _bh_oracle() -> str:
    from icebergsql_spark.plans.pipeline19 import _BH_CRIT, _BH_SQL

    return _BH_SQL.format(
        src="events",
        c1=_BH_CRIT[1],
        c2=_BH_CRIT[2],
        c3=_BH_CRIT[3],
        c4=_BH_CRIT[4],
        c5=_BH_CRIT[5],
    )


@register(
    "events_stream_bh_fdr",
    oracle=_bh_oracle(),
    doc="STREAMING twin of events_bh_fdr: each of 3 chronological "
    "micro-batches appends per-(type, user) event-count partials "
    "(SUM-mergeable, replay/chopping safe) to a parquet sink; the "
    "finalizer rebuilds the users/armn/ucnt contract from the merged "
    "partials (the distinct-user set equals the batch one because "
    "every user appears in some partial) and runs the IDENTICAL "
    "z-rank/step-up tail SQL (shared _BH_TAIL_SQL template with the "
    "batch gate, same published quantile literals). Live "
    "multiple-testing governance converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline19 import _BH_CRIT, _BH_TAIL_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-bhfsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-bhfout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.groupBy("event_type", "user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-bhfck-")
    spark.read.parquet(out).createOrReplaceTempView("bh_partials")
    return spark.sql(
        """
        WITH users AS (
          SELECT DISTINCT user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm
          FROM bh_partials
        ),
        armn AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n
          FROM users GROUP BY arm
        ),
        ucnt AS (
          SELECT event_type, user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(SUM(c) AS BIGINT) AS c
          FROM bh_partials GROUP BY 1, 2, 3
        ),
"""
        + _BH_TAIL_SQL.format(
            c1=_BH_CRIT[1],
            c2=_BH_CRIT[2],
            c3=_BH_CRIT[3],
            c4=_BH_CRIT[4],
            c5=_BH_CRIT[5],
        )
    )


# ------------------------------------- deterministic Poisson bootstrap --

# Poisson(1) CDF thresholds quantized to the 60-bit md5 draw space:
# T_k = floor(P(Poisson(1) <= k) * 2^60).  Draws above T_5 take weight 6
# (a deterministic truncation at P ~ 6e-4 — both engines apply the same
# literal ladder, so the truncated-Poisson bootstrap stays exact).
_BOOT_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480832,
    1148701988496035200,
    1152236456152946048,
)
_BOOT_B = 100

_BOOT_SQL = """
        WITH users AS (
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                              THEN 1 ELSE 0 END) >= 20
                      THEN 1 ELSE 0 END AS conv
          FROM {src} GROUP BY user_id
        ),
        raw AS (
          SELECT
            CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT)
              AS c1,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT)
              AS c0,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n0
          FROM users
        ),
        bs AS (SELECT {bspine} AS b),
        draws AS (
          SELECT u.arm, u.conv, bs.b,
                 CASE WHEN {h} < {t0} THEN 0
                      WHEN {h} < {t1} THEN 1
                      WHEN {h} < {t2} THEN 2
                      WHEN {h} < {t3} THEN 3
                      WHEN {h} < {t4} THEN 4
                      WHEN {h} < {t5} THEN 5
                      ELSE 6 END AS w
          FROM users u CROSS JOIN bs
        ),
        cells AS (
          SELECT b, arm,
                 CAST(SUM(w * conv) AS BIGINT) AS wc,
                 CAST(SUM(w) AS BIGINT) AS wn
          FROM draws GROUP BY b, arm
        ),
        diffs AS (
          SELECT b,
                 (CASE WHEN COALESCE(
                         MAX(CASE WHEN arm = 1 THEN wn END), 0) > 0
                       THEN CAST(MAX(CASE WHEN arm = 1 THEN wc END)
                                 AS DOUBLE)
                            / CAST(MAX(CASE WHEN arm = 1 THEN wn END)
                                   AS DOUBLE)
                       ELSE 0.0 END
                  - CASE WHEN COALESCE(
                          MAX(CASE WHEN arm = 0 THEN wn END), 0) > 0
                        THEN CAST(MAX(CASE WHEN arm = 0 THEN wc END)
                                  AS DOUBLE)
                             / CAST(MAX(CASE WHEN arm = 0 THEN wn END)
                                    AS DOUBLE)
                        ELSE 0.0 END) AS d
          FROM cells GROUP BY b
        ),
        ranked AS (
          SELECT b, d,
                 CAST(row_number() OVER (ORDER BY d, b) AS BIGINT) AS rn
          FROM diffs
        )
        SELECT raw.n1, raw.c1, raw.n0, raw.c0,
               CAST(raw.c1 AS DOUBLE) / CAST(raw.n1 AS DOUBLE)
                 - CAST(raw.c0 AS DOUBLE) / CAST(raw.n0 AS DOUBLE)
                 AS point,
               MAX(CASE WHEN rn = 3 THEN d END) AS lo,
               MAX(CASE WHEN rn = 98 THEN d END) AS hi,
               CAST(SUM(CASE WHEN d < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_neg
        FROM ranked CROSS JOIN raw
        GROUP BY raw.n1, raw.c1, raw.n0, raw.c0
"""

_BOOT_H_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(u.user_id AS STRING), '#', "
    "CAST(bs.b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
)
_BOOT_H_DUCK = (
    "CAST('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || '#' || "
    "CAST(bs.b AS VARCHAR)), 1, 15) AS BIGINT)"
)


@register(
    "events_poisson_bootstrap_ci",
    oracle=_BOOT_SQL.format(
        src="events",
        bspine=f"unnest(generate_series(0, {_BOOT_B - 1}))",
        h=_BOOT_H_DUCK,
        t0=_BOOT_T[0],
        t1=_BOOT_T[1],
        t2=_BOOT_T[2],
        t3=_BOOT_T[3],
        t4=_BOOT_T[4],
        t5=_BOOT_T[5],
    ),
    doc="Deterministic Poisson bootstrap CI for the A/B conversion "
    "difference (conversion = >= 20 purchases; odd user_ids treated): "
    "resample b's weight for user u is the truncated-Poisson(1) "
    "inverse-CDF of a 60-bit md5 draw md5(user#b) against a fixed "
    "quantized threshold ladder — both engines replay the identical "
    "integer draws, so the 'random' resampling is exact (the Kleiner "
    "et al. streaming-bootstrap trick: Poisson weights need no "
    "global n, making resampling embarrassingly parallel — THE "
    "bootstrap shape at 100 TB). 100 resampled rate diffs rank under "
    "a total (diff, b) order; the 2.5/97.5 percentile order stats "
    "are the CI, with the unresampled point estimate and the "
    "bootstrap sign count alongside. Scale shape: one user rollup, "
    "one narrow x100 spine expansion, one groupBy(b, arm).",
    tags=("events", "stats"),
)
def events_poisson_bootstrap_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_boot")
    return spark.sql(
        _BOOT_SQL.format(
            src="ev_boot",
            bspine=f"explode(sequence(0, {_BOOT_B - 1}))",
            h=_BOOT_H_SPARK,
            t0=_BOOT_T[0],
            t1=_BOOT_T[1],
            t2=_BOOT_T[2],
            t3=_BOOT_T[3],
            t4=_BOOT_T[4],
            t5=_BOOT_T[5],
        )
    )


# ---------------------------------------------- Count-Sketch median --

# d = 3 signed-hash rows, w = 64 buckets; the median-of-3 estimate is
# computed EXACTLY as sum - max - min of the three signed counter reads.
# mid/tail segments shared with the streaming twin
# (plans/pipeline22.py::sketch_stream_countsketch): the twin merges
# SUM-mergeable per-batch counter partials instead of deriving
# counters from `hashed`, then reuses the probe/median tail verbatim
_CSK_MID_SQL = """
        rs AS (SELECT r FROM (VALUES (0), (1), (2)) AS t(r)),
        hashed AS (
          SELECT c.tok, c.cnt, r.r,
                 {bucket} AS bkt,
                 CASE WHEN {signh} % 2 = 0 THEN 1 ELSE -1 END AS sgn
          FROM cnts c CROSS JOIN rs r
        ),
"""

_CSK_TAIL_SQL = """
        probe AS (
          SELECT tok, cnt FROM cnts ORDER BY cnt DESC, tok LIMIT 20
        ),
        est3 AS (
          SELECT p.tok, p.cnt, h.sgn * c.ctr AS sv
          FROM probe p
          JOIN hashed h ON h.tok = p.tok
          JOIN counters c ON c.r = h.r AND c.bkt = h.bkt
        ),
        est AS (
          SELECT tok, CAST(MIN(cnt) AS BIGINT) AS cnt,
                 CAST(SUM(sv) - MAX(sv) - MIN(sv) AS BIGINT) AS est
          FROM est3 GROUP BY tok
        )
        SELECT tok, cnt, est, CAST(est - cnt AS BIGINT) AS err
        FROM est ORDER BY cnt DESC, tok
"""

_CSK_SQL = (
    """
        WITH toks AS (
          SELECT {tok} AS tok FROM documents WHERE doc_id < 300
        ),
        cnts AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM toks GROUP BY tok
        ),
"""
    + _CSK_MID_SQL
    + """
        counters AS (
          SELECT r, bkt, CAST(SUM(sgn * cnt) AS BIGINT) AS ctr
          FROM hashed GROUP BY r, bkt
        ),
"""
    + _CSK_TAIL_SQL
)

_CSK_BKT_SPARK = (
    "CAST(conv(substring(md5(concat(c.tok, '#b', CAST(r.r AS STRING))),"
    " 1, 8), 16, 10) AS BIGINT) % 64"
)
_CSK_BKT_DUCK = (
    "CAST('0x' || substr(md5(c.tok || '#b' || CAST(r.r AS VARCHAR)),"
    " 1, 8) AS BIGINT) % 64"
)
_CSK_SGN_SPARK = (
    "CAST(conv(substring(md5(concat(c.tok, '#s', CAST(r.r AS STRING))),"
    " 1, 8), 16, 10) AS BIGINT)"
)
_CSK_SGN_DUCK = (
    "CAST('0x' || substr(md5(c.tok || '#s' || CAST(r.r AS VARCHAR)),"
    " 1, 8) AS BIGINT)"
)


@register(
    "sketch_countsketch_median",
    oracle=_CSK_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))",
        bucket=_CSK_BKT_DUCK,
        signh=_CSK_SGN_DUCK,
    ),
    doc="Count-Sketch frequency estimation (Charikar/Chen/Farach-Colton "
    "2002) over the token stream: d=3 signed hash rows x w=64 "
    "buckets, counter C[r][h_r(t)] += s_r(t) per occurrence, estimate "
    "= median over rows of s_r(t)*C[r][h_r(t)]. Unlike CMS the signed "
    "collisions cancel in expectation, so the estimate is UNBIASED — "
    "the sketch of choice for heavy-hitter residual error. The "
    "median of three integers is computed exactly as sum - max - min; "
    "every counter is an exact bigint on both engines (md5 bucket "
    "and sign, the established parity construction), so the gate "
    "emits estimate and signed error per top-20 token with zero "
    "float anywhere. Scale shape: one token count, one 3x spine "
    "expansion, one (r, bucket) aggregation — counters are "
    "SUM-mergeable across partitions, days, and micro-batches.",
    tags=("sketch",),
)
def sketch_countsketch_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    ).createOrReplaceTempView("documents")
    return spark.sql(
        _CSK_SQL.format(
            tok="explode(split(trim(text), '\\\\s+'))",
            bucket=_CSK_BKT_SPARK,
            signh=_CSK_SGN_SPARK,
        )
    )


# --------------------------------------------------- LOF outliers --

_LOF_K = 5
_LOF_MAX_ID = 300

_LOF_SQL = """
        WITH pairs AS {mat}(
          SELECT a.vec_id AS a, b.vec_id AS b,
                 CAST(ROUND({d2} * 1000000000.0) AS BIGINT) AS d2q
          FROM {base} a JOIN {base} b ON a.vec_id <> b.vec_id
        ),
        rk AS {mat}(
          SELECT a, b, d2q,
                 row_number() OVER (PARTITION BY a ORDER BY d2q, b)
                   AS rn
          FROM pairs
        ),
        knn AS {mat}(SELECT a, b, d2q FROM rk WHERE rn <= {k}),
        kdist AS (
          SELECT a AS n, CAST(MAX(d2q) AS BIGINT) AS kd
          FROM knn GROUP BY a
        ),
        reach AS (
          SELECT knn.a, knn.b, GREATEST(knn.d2q, kd.kd) AS rd
          FROM knn JOIN kdist kd ON kd.n = knn.b
        ),
        lrd AS (
          SELECT a,
                 CAST(ROUND(5000000000000000000.0
                      / CAST(GREATEST(CAST(SUM(rd) AS BIGINT), 1)
                             AS DOUBLE)) AS BIGINT) AS lrd_q
          FROM reach GROUP BY a
        ),
        lof AS (
          SELECT knn.a,
                 CAST(MIN(la.lrd_q) AS BIGINT) AS lrd_q,
                 CAST(ROUND(1000000.0
                      * CAST(SUM(lb.lrd_q) AS DOUBLE)
                      / ({k}.0 * CAST(MIN(la.lrd_q) AS DOUBLE)))
                   AS BIGINT) AS lof_ppm
          FROM knn
          JOIN lrd lb ON lb.a = knn.b
          JOIN lrd la ON la.a = knn.a
          GROUP BY knn.a
        )
        SELECT a AS vec_id, lrd_q, lof_ppm
        FROM lof ORDER BY lof_ppm DESC, a LIMIT 10
"""

_LOF_D2_SPARK = (
    "aggregate(zip_with(a.vd, b.vd, (x, y) -> (x - y) * (x - y)),"
    " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
)
_LOF_D2_DUCK = (
    "list_sum(list_transform(generate_series(1, 64),"
    " i -> (a.vd[i] - b.vd[i]) * (a.vd[i] - b.vd[i])))"
)


def _lof_oracle() -> str:
    return (
        f"""
        WITH lof_base AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, x -> x::DOUBLE) AS vd
          FROM embeddings WHERE vec_id < {_LOF_MAX_ID}
        ),
"""
        + _LOF_SQL.format(
            mat="MATERIALIZED ",
            base="lof_base",
            d2=_LOF_D2_DUCK,
            k=_LOF_K,
        ).replace("        WITH pairs", "        pairs", 1)
    )


@register(
    "emb_lof_outliers",
    oracle=_lof_oracle(),
    doc="Local Outlier Factor (Breunig et al. 2000) over the embedding "
    "table, k=5: kNN by exact squared L2 (the sequential-fold "
    "distance, quantized ONCE to bigint nano-units so every "
    "downstream rank/max/sum is integer-exact), k-distance, "
    "reachability rd(a,b) = max(d2(a,b), kdist(b)), local "
    "reachability density as a single mirrored division quantized to "
    "ppb, and LOF = mean neighbor lrd over own lrd in ppm. Top-10 "
    "under a total (lof_ppm, vec_id) order — the density-adaptive "
    "outlier score that flags points thin relative to their OWN "
    "neighborhood, where a global distance threshold fails across "
    "clusters of different density. Scale shape: the quadratic "
    "candidate pass is capped (vec_id < 300) exactly like the "
    "brute-force ANN baselines; at corpus scale the kNN stage swaps "
    "to the IVF/LSH candidate generators already in "
    "operators/similarity.py while the LOF algebra is unchanged.",
    tags=("embeddings", "curation"),
)
def emb_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = (
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        .filter(F.col("vec_id") < _LOF_MAX_ID)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "vd"
            ),
        )
    )
    ensure_parallelism(emb).createOrReplaceTempView("lof_base")
    return spark.sql(
        _LOF_SQL.format(mat="", base="lof_base", d2=_LOF_D2_SPARK, k=_LOF_K)
    )


# --------------------------------------------- streaming runs-test twin --


@register(
    "events_stream_runs_test",
    oracle=_RUNS_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        median="quantile_cont(x, 0.50)",
    ),
    doc="STREAMING twin of events_runs_test: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches, "
    "merged into the `daily` contract; the finalizer runs the "
    "IDENTICAL median/sign/LAG-runs tail SQL (shared _RUNS_TAIL_SQL "
    "template). The live is-traffic-still-random monitor converging "
    "to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-rtsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-rtout-")
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

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-rtck-")
    spark.read.parquet(out).createOrReplaceTempView("runs_partials")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(SUM(c) AS BIGINT) AS x
          FROM runs_partials GROUP BY 1, 2
        ),
"""
        + _RUNS_TAIL_SQL.format(
            median="percentile(x, CAST(50 AS DOUBLE) / 100.0)"
        )
    )


# ------------------------------------------------- Katz centrality --


def _katz_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    return (
        _EDGE_SQL
        + """,
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS p1
          FROM e GROUP BY 1
        ),
        p2 AS (
          SELECT e.a AS n, CAST(SUM(d.p1) AS BIGINT) AS p2
          FROM e JOIN deg d ON d.n = e.b GROUP BY 1
        ),
        p3 AS (
          SELECT e.a AS n, CAST(SUM(p2.p2) AS BIGINT) AS p3
          FROM e JOIN p2 ON p2.n = e.b GROUP BY 1
        )
        SELECT deg.n AS node, deg.p1, p2.p2, p3.p3,
               CAST(4 * deg.p1 + 2 * p2.p2 + p3.p3 AS BIGINT)
                 AS katz_q8
        FROM deg JOIN p2 ON p2.n = deg.n JOIN p3 ON p3.n = deg.n
        ORDER BY katz_q8 DESC, node
        LIMIT 15
    """
    )


@register(
    "graph_katz_centrality",
    oracle=_katz_oracle(),
    doc="Katz centrality on the token co-occurrence graph, truncated at "
    "path length 3 with attenuation alpha = 1/2: katz(v) ~ sum_k "
    "alpha^k * walks_k(v), and the DYADIC alpha makes the whole "
    "score exact — walks_1 = deg, walks_2/3 are one neighbor-sum "
    "join each, and the weighted sum is the bigint 4*w1 + 2*w2 + w3 "
    "(alpha^k scaled by 8; the events_decayed_counts shift trick "
    "applied to graph walks). The influence measure that, unlike "
    "degree, credits nodes for having well-connected neighbors — "
    "and, unlike PageRank, needs no iteration to convergence. "
    "Top-15 under a total (katz_q8, node) order, component scores "
    "emitted. Scale shape: two join+groupBy rounds over the edge "
    "list, exactly the pagerank round shape without the dangling-"
    "mass broadcast.",
    tags=("graph", "join"),
)
def graph_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 120
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    half = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 74)
        .select("a", "b")
        .localCheckpoint()
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = e.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("p1")
    )
    p2 = (
        e.join(F.broadcast(deg.withColumnRenamed("n", "b")), "b")
        .groupBy(F.col("a").alias("n"))
        .agg(F.sum("p1").cast("bigint").alias("p2"))
    )
    p3 = (
        e.join(
            F.broadcast(
                p2.select(F.col("n").alias("b"), F.col("p2").alias("pb"))
            ),
            "b",
        )
        .groupBy(F.col("a").alias("n"))
        .agg(F.sum("pb").cast("bigint").alias("p3"))
    )
    return (
        deg.join(p2, "n")
        .join(p3, "n")
        .select(
            F.col("n").alias("node"),
            "p1",
            "p2",
            "p3",
            (4 * F.col("p1") + 2 * F.col("p2") + F.col("p3"))
            .cast("bigint")
            .alias("katz_q8"),
        )
        .orderBy(F.desc("katz_q8"), "node")
        .limit(15)
    )


# ------------------------------------------ capture-recapture (C-R) --

_CR_SQL = """
        WITH ev AS (
          SELECT event_type, user_id, {day_expr} AS day FROM {src}
        ),
        span AS (
          SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
        ),
        marked AS (
          SELECT DISTINCT ev.event_type, ev.user_id,
                 CASE WHEN ev.day < span.d0
                           + (span.d1 - span.d0 + 1) {div} 2
                      THEN 0 ELSE 1 END AS half
          FROM ev CROSS JOIN span
        ),
        flags AS (
          SELECT event_type, user_id,
                 MAX(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS s1,
                 MAX(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS s2
          FROM marked GROUP BY 1, 2
        ),
        agg AS (
          SELECT event_type,
                 CAST(SUM(s1) AS BIGINT) AS n1,
                 CAST(SUM(s2) AS BIGINT) AS n2,
                 CAST(SUM(s1 * s2) AS BIGINT) AS m,
                 CAST(COUNT(*) AS BIGINT) AS true_n
          FROM flags GROUP BY event_type
        )
        SELECT event_type, n1, n2, m, true_n,
               CAST((n1 + 1) * (n2 + 1) AS BIGINT) AS chap_num,
               CAST(m + 1 AS BIGINT) AS chap_den,
               CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
                 / CAST(m + 1 AS DOUBLE) - 1.0 AS chapman_est
        FROM agg
        ORDER BY event_type
"""


@register(
    "events_capture_recapture",
    oracle=_CR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Capture-recapture population estimate per event type (the "
    "Lincoln-Petersen design with Chapman's bias correction): the "
    "month's first half is the marking survey, the second half the "
    "recapture; n1/n2 users sighted per half, m in both, and the "
    "Chapman estimator (n1+1)(n2+1)/(m+1) - 1 estimates the total "
    "user population a finite observation window undercounts — the "
    "coverage-estimation trick ecology lends to telemetry (how many "
    "users does this surface REALLY have?). Exact bigint numerator/"
    "denominator emitted next to the single mirrored float division, "
    "with the directly-observed union count alongside for "
    "calibration. Scale shape: one distinct-(type, user, half) "
    "pass, one per-user flag rollup, one 5-row aggregate.",
    tags=("events", "stats"),
)
def events_capture_recapture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cr")
    return spark.sql(
        _CR_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_cr", div="DIV"
        )
    )


# --------------------------------------- WRITE ORDERED BY scenario --


@register(
    "managed_write_ordered",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="ALTER TABLE ... WRITE ORDERED BY — Iceberg's standing "
    "write.sort-order DDL (sql.py:_WRITE_ORDERED_RE): after the "
    "metadata-only ALTER, EVERY subsequent insert locally sorts its "
    "tasks' rows on the declared columns (table.py:498-518), so new "
    "files keep selective row-group/page min-max indexes without a "
    "rewrite. The gate inserts deliberately shuffled rows, then "
    "asserts per-file sortedness DISTRIBUTEDLY — a LAG over "
    "(_metadata.file_path, _metadata.row_index) counts order "
    "violations, which must be zero — plus WRITE UNORDERED "
    "round-trip and unknown-column refusal. The aggregate "
    "hash-matches the raw oracle. At 100 TB: a standing sort order "
    "is the difference between pages that prune and pages that "
    "don't, at zero rewrite cost.",
    tags=("managed", "sql"),
)
def managed_write_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-wowh-"))
    tbl = eng.catalog.create_table(
        "t_wo", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    res = eng.sql("ALTER TABLE t_wo WRITE ORDERED BY (c)")
    assert res.collect()[0]["sort_order"] == "c"
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    # shuffle the insert order so the local sort has real work to do
    tbl.insert(base.orderBy(F.expr("md5(CAST(k AS STRING))")))
    mark_setup_done()  # table built; the sortedness audit is the op
    viol = (
        tbl.to_df()
        .select(
            "c",
            F.expr("_metadata.file_path").alias("fp"),
            F.expr("_metadata.row_index").alias("ri"),
        )
        .selectExpr(
            "CASE WHEN lag(c) OVER (PARTITION BY fp ORDER BY ri) > c"
            " THEN 1 ELSE 0 END AS v"
        )
        .agg(F.sum("v").alias("violations"))
        .collect()[0]["violations"]
    )
    assert viol == 0, f"standing sort order violated {viol} times"
    try:
        eng.sql("ALTER TABLE t_wo WRITE ORDERED BY (nope)")
        raise AssertionError("unknown column must be refused")
    except ValueError as ex:
        assert "unknown" in str(ex)
    assert (
        eng.sql("ALTER TABLE t_wo WRITE UNORDERED").collect()[0][
            "sort_order"
        ]
        == ""
    )
    tbl.refresh()
    assert "sort.order" not in tbl.meta.properties
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM t_wo GROUP BY m ORDER BY m"
    )
