"""Round-9 operator wave: sliding-window HLL, synchronous Louvain
refinement, neighbor-Jaccard link prediction, PSI drift, the streaming
Theil-Sen twin, and facility-location subset selection.

Each entry follows the engine-wide determinism contract (exact integer
counts, quantized scores, single final float ops in matching operand
order, term-sorted sequential folds for multi-term float sums) so DuckDB
hash-matches the Spark result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators import sketch
from icebergsql_spark.plans.pipeline3 import _REG_SQL, _RHO_SQL
from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------------------- sliding HLL --


# shared by sketch_hll_sliding and its streaming twin (the twin's
# MAX-merged per-batch register partials converge to the identical state)
_HLL_SLIDING_ORACLE = f"""
        WITH h AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day,
                 md5(CAST(user_id AS VARCHAR)) AS md5_h
          FROM events
        ),
        r AS (
          SELECT day, CAST({_REG_SQL} AS INT) AS reg,
                 CAST({_RHO_SQL} AS INT) AS rho
          FROM h
        ),
        daily AS (
          SELECT day, reg, MAX(rho) AS max_rho FROM r GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day AS wday FROM daily),
        slid AS (
          SELECT d2.wday, daily.reg, daily.max_rho
          FROM daily JOIN days d2
            ON d2.wday BETWEEN daily.day AND daily.day + 6
        ),
        merged AS (
          SELECT wday, reg, MAX(max_rho) AS max_rho
          FROM slid GROUP BY 1, 2
        ),
        agg AS (
          SELECT wday, CAST(COUNT(*) AS BIGINT) AS m_used,
                 CAST(SUM(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
                   AS harmonic_q
          FROM merged GROUP BY 1
        )
        SELECT CAST(wday AS BIGINT) AS wday, m_used, harmonic_q,
               CAST(round(
                 CASE WHEN ({sketch._RAW_EST_SQL}) <= {2.5 * sketch.HLL_M}
                           AND m_used < {sketch.HLL_M}
                      THEN {sketch.HLL_M} * ln(CAST({sketch.HLL_M} AS DOUBLE)
                                               / ({sketch.HLL_M} - m_used))
                      ELSE ({sketch._RAW_EST_SQL}) END
               ) AS BIGINT) AS est
        FROM agg ORDER BY wday
    """


@register(
    "sketch_hll_sliding",
    oracle=_HLL_SLIDING_ORACLE,
    doc="7-day sliding distinct-user estimate from MAX-merged per-day "
    "HLL register tables (operators/sketch.py:hll_sliding_estimate) — "
    "the time-dimension twin of sketch_sliding_distinct, with O(m) "
    "state per day instead of per-key state: a year of 100 TB events "
    "windows any way you like from 365 x 256 register rows, never "
    "re-touching raw data. The slide is a bounded day-spine join "
    "(each day's registers fan out to the <=7 windows they feed), the "
    "merge is register-wise MAX (the union contract sketch_hll_union "
    "proves end-to-end), and the estimate is the standard small-range-"
    "corrected HLL over an exact bigint harmonic sum. Deterministic "
    "md5 registers make even the windowed sketch STATE oracle-"
    "checkable. Flajolet et al. 2007.",
    tags=("sketch", "hll", "window"),
)
def sketch_hll_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("user_id", F.expr("ts DIV 86400000000000").alias("day"))
    return sketch.hll_sliding_estimate(ev, "user_id", "day", 7).orderBy(
        "wday"
    )


# --------------------------------------------------- Louvain one level --

_SEED_LBL_SQL = "CAST('0x' || substr(md5({n}), 1, 6) AS BIGINT) % 4"


@register(
    "graph_louvain_onelevel",
    oracle=_EDGE_SQL + f""",
        lab AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        node AS (
          SELECT deg.n, deg.k, lab.lbl AS d
          FROM deg JOIN lab ON lab.n = deg.n
        ),
        ctot AS (
          SELECT d AS c, CAST(SUM(k) AS BIGINT) AS tot
          FROM node GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        nbrc AS (
          SELECT e.a AS n, lab.lbl AS c, CAST(COUNT(*) AS BIGINT) AS k_ic
          FROM e JOIN lab ON lab.n = e.b GROUP BY 1, 2
        ),
        base AS (
          SELECT node.n, node.k, node.d, td.tot AS tot_d,
                 CAST(COALESCE(kid.k_ic, 0) AS BIGINT) AS k_id
          FROM node
          JOIN ctot td ON td.c = node.d
          LEFT JOIN nbrc kid ON kid.n = node.n AND kid.c = node.d
        ),
        cand AS (
          SELECT base.n, base.d, nbrc.c,
                 CAST(2 * m.m * (nbrc.k_ic - base.k_id)
                      - base.k * (ctot.tot - (base.tot_d - base.k))
                      AS BIGINT) AS gain_num,
                 row_number() OVER (
                   PARTITION BY base.n
                   ORDER BY 2 * m.m * (nbrc.k_ic - base.k_id)
                            - base.k * (ctot.tot - (base.tot_d - base.k))
                            DESC, nbrc.c ASC
                 ) AS rn
          FROM nbrc
          JOIN base ON base.n = nbrc.n AND nbrc.c <> base.d
          JOIN ctot ON ctot.c = nbrc.c
          CROSS JOIN m
        ),
        best AS (
          SELECT n, c AS move_to, gain_num FROM cand
          WHERE rn = 1 AND gain_num > 0
        ),
        moved AS (
          SELECT base.n, base.d AS lbl_old,
                 COALESCE(best.move_to, base.d) AS lbl_new,
                 CAST(COALESCE(best.gain_num, 0) AS BIGINT) AS gain_num
          FROM base LEFT JOIN best ON best.n = base.n
        )
        SELECT CAST(lbl_old AS BIGINT) AS lbl_old,
               CAST(lbl_new AS BIGINT) AS lbl_new,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(gain_num) AS BIGINT) AS sum_gain,
               CAST(SUM(CAST('0x' || substr(md5(n), 1, 6) AS BIGINT))
                    AS BIGINT) AS node_digest
        FROM moved GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="One synchronous Louvain refinement round on the token "
    "co-occurrence graph (operators/graph.py:louvain_gain_round), "
    "seeded with an md5-hash 4-way split: every node takes its best "
    "strictly-positive modularity-gain move simultaneously, gains as "
    "EXACT 2m^2-scaled bigints (Blondel et al. 2008), total-ordered "
    "tiebreaks (gain DESC, target ASC) — a deterministic pure function "
    "of the graph that the SQL oracle replays move-for-move, unlike "
    "visit-order-dependent textbook Louvain. Result: the (old, new) "
    "community transition matrix with gain sums and an md5 node-set "
    "digest so one mis-moved node hash-mismatches. Scale shape: "
    "degree/label equi-joins + bounded groupBys, candidate moves "
    "bounded by neighbor-community fan-out. The refinement sibling of "
    "graph_modularity's scoring.",
    tags=("graph", "dedup", "window"),
)
def graph_louvain_onelevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import louvain_gain_round

    half = _token_half_edges(spark, sf_dir)
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    labels = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    )
    moved = louvain_gain_round(half, labels)
    return (
        moved.groupBy(
            F.col("lbl_old").cast("bigint").alias("lbl_old"),
            F.col("lbl_new").cast("bigint").alias("lbl_new"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("gain_num").cast("bigint").alias("sum_gain"),
            F.sum(
                F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            ).cast("bigint").alias("node_digest"),
        )
        .orderBy("lbl_old", "lbl_new")
    )


def _token_half_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared token co-occurrence half-edge build (a < b, >= 74
    shared docs among doc_id < 120) — the varied-degree graph fixture
    every graph gate uses (round-5 lesson: the doc-similarity graph is a
    clone clique)."""
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
    return (
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


# ------------------------------------------------ neighbor Jaccard --


@register(
    "graph_neighbor_jaccard",
    oracle=_EDGE_SQL + """,
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        wedges AS (
          SELECT e1.b AS pa, e2.b AS pb, CAST(COUNT(*) AS BIGINT) AS common
          FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT w.pa, w.pb, w.common,
                 CAST((w.common * 1000000)
                      // (da.k + db.k - w.common) AS BIGINT) AS jac_ppm
          FROM wedges w
          JOIN deg da ON da.n = w.pa
          JOIN deg db ON db.n = w.pb
          WHERE w.common >= 2
        )
        SELECT pa, pb, common, jac_ppm
        FROM scored
        ORDER BY jac_ppm DESC, pa, pb
        LIMIT 30
    """,
    doc="Neighbor-set Jaccard link prediction on the token co-occurrence "
    "graph — the normalized sibling of graph_common_neighbors / "
    "graph_adamic_adar: jac = |N(a) int N(b)| / |N(a) un N(b)| in exact "
    "ppm (integer floor-div over non-negative operands, identical in "
    "both engines), union size from the inclusion-exclusion identity "
    "deg_a + deg_b - common so only the wedge enumeration is ever "
    "computed (candidate pairs = 2-hop pairs with >= 2 common "
    "neighbors; non-adjacent pairs with empty intersections never "
    "materialize). Scale shape: one wedge self-join bounded by "
    "sum-of-degrees-squared, two broadcast degree lookups.",
    tags=("graph", "join"),
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    half = _token_half_edges(spark, sf_dir)
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = e.groupBy(F.col("a").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    e1, e2 = e.alias("e1"), e.alias("e2")
    wedges = (
        e1.join(
            e2,
            (F.col("e1.a") == F.col("e2.a"))
            & (F.col("e1.b") < F.col("e2.b")),
        )
        .groupBy(F.col("e1.b").alias("pa"), F.col("e2.b").alias("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
        .filter(F.col("common") >= 2)
    )
    return (
        wedges.join(deg.select(F.col("n").alias("pa"), F.col("k").alias("ka")), "pa")
        .join(deg.select(F.col("n").alias("pb"), F.col("k").alias("kb")), "pb")
        .select(
            "pa",
            "pb",
            "common",
            F.expr(
                "CAST((common * 1000000) DIV (ka + kb - common) AS BIGINT)"
            ).alias("jac_ppm"),
        )
        .orderBy(F.desc("jac_ppm"), "pa", "pb")
        .limit(30)
    )


# ------------------------------------------------------- PSI drift --

# per-bucket PSI contribution with add-one smoothing — a textually
# identical IEEE expression in both engines; {cw}/{tw} = week counts,
# {cr}/{tr} = reference-week counts, 10 = bucket count
_PSI_CONTRIB = (
    "(CAST({cw} + 1 AS DOUBLE) / CAST({tw} + 10 AS DOUBLE)"
    " - CAST({cr} + 1 AS DOUBLE) / CAST({tr} + 10 AS DOUBLE))"
    " * ln((CAST({cw} + 1 AS DOUBLE) / CAST({tw} + 10 AS DOUBLE))"
    "      / (CAST({cr} + 1 AS DOUBLE) / CAST({tr} + 10 AS DOUBLE)))"
)


@register(
    "events_psi_drift",
    oracle=f"""
        WITH ev AS (
          SELECT value,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        lims AS (
          SELECT MIN(day) AS d0, MAX(value) AS vmax FROM ev
        ),
        bucketed AS (
          SELECT CAST((ev.day - lims.d0) // 7 AS BIGINT) AS week,
                 LEAST(9, CAST(floor(ev.value * 10.0 / lims.vmax)
                               AS BIGINT)) AS b
          FROM ev CROSS JOIN lims
        ),
        cnt AS (
          SELECT week, b, CAST(COUNT(*) AS BIGINT) AS c
          FROM bucketed GROUP BY 1, 2
        ),
        spine AS (
          SELECT w.week, gb.b
          FROM (SELECT DISTINCT week FROM cnt) w
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) gb
        ),
        full_cnt AS (
          SELECT spine.week, spine.b,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c
          FROM spine LEFT JOIN cnt
            ON cnt.week = spine.week AND cnt.b = spine.b
        ),
        tot AS (
          SELECT week, CAST(SUM(c) AS BIGINT) AS t
          FROM full_cnt GROUP BY 1
        ),
        ref AS (
          SELECT fc.b, fc.c AS cr, tot.t AS tr
          FROM full_cnt fc JOIN tot ON tot.week = fc.week
          WHERE fc.week = 0
        ),
        terms AS (
          SELECT fc.week, fc.b,
                 {_PSI_CONTRIB.format(cw="fc.c", tw="tot.t",
                                      cr="ref.cr", tr="ref.tr")} AS contrib
          FROM full_cnt fc
          JOIN tot ON tot.week = fc.week
          JOIN ref ON ref.b = fc.b
          WHERE fc.week > 0
        ),
        psi AS (
          SELECT week,
                 list_sum(list(contrib ORDER BY b)) AS fold
          FROM terms GROUP BY week
        )
        SELECT CAST(week AS BIGINT) AS week,
               CAST(round(fold * 1000000.0) AS BIGINT) AS psi_ppm
        FROM psi ORDER BY week
    """,
    doc="Population-stability-index drift of the events.value "
    "distribution, week over reference week 0 — the standard model-"
    "monitoring drift score (PSI = sum_b (p_b - q_b) ln(p_b/q_b), "
    "add-one smoothed so empty buckets are defined). Ten equal-width "
    "value buckets from the global max; every count is an exact bigint "
    "on a (week x bucket) spine, the per-bucket contribution is a "
    "textually identical IEEE expression in both engines, and the "
    "10-term sum runs as a BUCKET-SORTED sequential fold (Spark "
    "aggregate() over a sorted struct array == DuckDB list_sum over "
    "list(... ORDER BY b)) — the JS-divergence determinism recipe. "
    "Scale shape: one groupBy to (weeks x 10) cells, a broadcast "
    "reference join; raw volume never crosses the fold.",
    tags=("events", "stats", "curation"),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("value", F.expr("ts DIV 86400000000000").alias("day"))
    lims = ev.agg(
        F.min("day").alias("d0"), F.max("value").alias("vmax")
    )
    bucketed = ev.crossJoin(F.broadcast(lims)).select(
        F.expr("CAST((day - d0) DIV 7 AS BIGINT)").alias("week"),
        F.least(
            F.lit(9),
            F.floor(F.col("value") * 10.0 / F.col("vmax")).cast("bigint"),
        ).alias("b"),
    )
    cnt = bucketed.groupBy("week", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    spine = (
        cnt.select("week")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("b")))
    )
    full_cnt = spine.join(cnt, ["week", "b"], "left").select(
        "week", "b", F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c")
    )
    tot = full_cnt.groupBy("week").agg(F.sum("c").cast("bigint").alias("t"))
    ref = (
        full_cnt.filter(F.col("week") == 0)
        .join(tot.filter(F.col("week") == 0), "week")
        .select("b", F.col("c").alias("cr"), F.col("t").alias("tr"))
    )
    terms = (
        full_cnt.filter(F.col("week") > 0)
        .join(tot, "week")
        .join(F.broadcast(ref), "b")
        .withColumn(
            "contrib",
            F.expr(
                _PSI_CONTRIB.format(cw="c", tw="t", cr="cr", tr="tr")
            ),
        )
    )
    return (
        terms.groupBy("week")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(b, contrib))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
            ).alias("fold")
        )
        .select(
            F.col("week").cast("bigint"),
            F.round(F.col("fold") * 1000000.0).cast("bigint").alias("psi_ppm"),
        )
        .orderBy("week")
    )


# ------------------------------------------- streaming Theil-Sen twin --


@register(
    "events_stream_theil_sen",
    oracle="""
        WITH daily AS (
          SELECT epoch_ns(ts) // 86400000000000 AS x,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'click' GROUP BY 1
        ),
        pairs AS (
          SELECT CAST(b.y - a.y AS BIGINT) AS num,
                 CAST(b.x - a.x AS BIGINT) AS den,
                 CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS r
          FROM daily a JOIN daily b ON a.x < b.x
        ),
        ranked AS (
          SELECT num, den,
                 row_number() OVER (ORDER BY r, num, den) AS rn,
                 COUNT(*) OVER () AS n_pairs
          FROM pairs
        )
        SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
               CAST(num AS BIGINT) AS med_num,
               CAST(den AS BIGINT) AS med_den,
               CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope
        FROM ranked
        WHERE rn = (n_pairs + 1) // 2
    """,
    doc="STREAMING twin of events_theil_sen over the daily click series: "
    "the stream arrives as 3 chronological micro-batches "
    "(maxFilesPerTrigger=1, availableNow); each batch appends per-day "
    "partial counts to a parquet sink (counts are SUM-mergeable, so "
    "batch chopping/replay cannot change the merged series), and the "
    "finalizer merges the partials and runs the identical Theil-Sen "
    "lower-median over exact rational pairwise slopes "
    "(operators/temporal.py:theil_sen_slope) — converging to the batch "
    "answer the oracle computes directly. The day-partial sink pattern "
    "(events_stream_cusum template): no state store, recovery-safe by "
    "algebra.",
    tags=("events", "streaming", "stats"),
)
def events_stream_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.temporal import theil_sen_slope
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).filter(F.col("event_type") == "click")
    src = tempfile.mkdtemp(prefix="icebergsql-tssrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-tsout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.groupBy(
                F.expr("ts DIV 86400000000000").alias("day")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-tsck-")
    daily = (
        spark.read.parquet(out)
        .groupBy(F.col("day").alias("x"))
        .agg(F.sum("cnt").cast("bigint").alias("y"))
    )
    return theil_sen_slope(daily)


# -------------------------------------------- facility location --


def _facility_oracle(query_id: int = 1, k: int = 5,
                     candidates: int = 24) -> str:
    """Unrolled greedy max-coverage: cov_r tracks each pool element's
    best similarity to the selected set; pick_{r} scans the bounded
    pool x pool matrix for the max marginal gain. AS MATERIALIZED on
    every step (the curation_mmr_topk lesson: DuckDB inlines chained
    non-materialized CTEs exponentially)."""
    dot_ab = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    )

    def sq(t: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, 64), "
            f"i -> {t}.embedding[i]::DOUBLE * {t}.embedding[i]::DOUBLE))"
        )

    steps = []
    for r in range(1, k + 1):
        steps.append(f"""
        pick{r} AS MATERIALIZED (
          SELECT {r} AS rank, c.vec_id,
                 CAST(SUM(GREATEST(cov{r - 1}.cv, sf.s) - cov{r - 1}.cv)
                      AS BIGINT) AS coverage_gain
          FROM cand c
          JOIN simfull sf ON sf.ib = c.vec_id
          JOIN cov{r - 1} ON cov{r - 1}.u = sf.ia
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
          GROUP BY c.vec_id
          ORDER BY coverage_gain DESC, c.vec_id
          LIMIT 1
        ),
        sel{r} AS MATERIALIZED (
          SELECT vec_id FROM sel{r - 1} UNION ALL
          SELECT vec_id FROM pick{r}
        ),
        cov{r} AS MATERIALIZED (
          SELECT cov{r - 1}.u,
                 GREATEST(cov{r - 1}.cv, sf.s) AS cv
          FROM cov{r - 1}
          JOIN simfull sf ON sf.ia = cov{r - 1}.u
          JOIN pick{r} p ON p.vec_id = sf.ib
        ),
        tot{r} AS MATERIALIZED (
          SELECT CAST(SUM(cv) AS BIGINT) AS t FROM cov{r}
        )""")
    finals = " UNION ALL ".join(
        f"SELECT pick{r}.rank, pick{r}.vec_id, pick{r}.coverage_gain, "
        f"tot{r}.t AS coverage_total FROM pick{r} CROSS JOIN tot{r}"
        for r in range(1, k + 1)
    )
    return f"""
        WITH q AS (SELECT embedding FROM embeddings
                   WHERE vec_id = {query_id}),
        cand AS MATERIALIZED (
          SELECT b.vec_id, b.embedding
          FROM q a CROSS JOIN embeddings b
          WHERE b.vec_id != {query_id}
          ORDER BY CAST(floor(1000000000.0 * {dot_ab}
                        / sqrt({sq('b')} * {sq('a')})) AS BIGINT) DESC,
                   b.vec_id
          LIMIT {candidates}
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('a')} * {sq('b')})) AS BIGINT) AS s
          FROM cand a JOIN cand b ON a.vec_id < b.vec_id
        ),
        simfull AS MATERIALIZED (
          SELECT ia, ib, s FROM sims
          UNION ALL SELECT ib, ia, s FROM sims
          UNION ALL SELECT vec_id AS ia, vec_id AS ib,
                           CAST(1000000000 AS BIGINT) AS s
          FROM cand
        ),
        sel0 AS (SELECT CAST(NULL AS BIGINT) AS vec_id WHERE 1 = 0),
        cov0 AS MATERIALIZED (
          SELECT vec_id AS u, CAST(0 AS BIGINT) AS cv FROM cand
        ),{",".join(steps)}
        SELECT CAST(rank AS INTEGER) AS rank,
               CAST(vec_id AS BIGINT) AS vec_id,
               coverage_gain, coverage_total
        FROM ({finals}) ORDER BY rank
    """


@register(
    "curation_facility_location",
    oracle=_facility_oracle(query_id=1, k=5, candidates=24),
    doc="Greedy facility-location (max-coverage) subset selection over "
    "the embedding pool (operators/similarity.py:"
    "facility_location_select): pick 5 of the 24 nearest neighbors of "
    "vec 1 maximizing sum_u max_s sim(u, s) — the submodular "
    "representativeness objective behind coreset / diverse-exemplar "
    "mining (Nemhauser 1978 greedy, 1-1/e), complementing "
    "curation_mmr_topk's relevance-redundancy tradeoff. Two-phase "
    "100-TB shape (one TakeOrdered relevance scan, then a bounded "
    "candidates^2 integer-nano sim matrix engine-side; the inherently-"
    "sequential greedy runs over <=24 collected ids in pure integer "
    "arithmetic). Oracle: ALL 5 greedy steps unrolled as MATERIALIZED "
    "CTEs tracking per-element best-coverage state.",
    tags=("curation", "embeddings", "similarity"),
)
def curation_facility_location(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.similarity import (
        facility_location_select,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return facility_location_select(
        emb, query_id=1, k=5, candidates=24
    ).orderBy("rank")


# ------------------------------------------- streaming twins (wave 2) --


@register(
    "sketch_stream_hll_sliding",
    oracle=_HLL_SLIDING_ORACLE,
    doc="STREAMING twin of sketch_hll_sliding: each of 3 chronological "
    "micro-batches appends its per-day HLL register partials "
    "(day, reg, max_rho) to a parquet sink; the finalizer MAX-merges "
    "the partials per (day, reg) and runs the identical slide + "
    "estimate — register-wise MAX is idempotent and commutative, so "
    "batch chopping/replay cannot change the merged state and the "
    "stream converges to the batch oracle bit-for-bit. This is the "
    "distributed-combine contract (sketch_hll_union) exercised through "
    "time: a live dashboard keeps <=256 rows per day per shard and "
    "windows them on read. Day-partial sink pattern, no state store.",
    tags=("sketch", "hll", "streaming", "window"),
)
def sketch_stream_hll_sliding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-shsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-shout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            sketch.hll_daily_registers(
                batch_df.select(
                    "user_id",
                    F.expr("ts DIV 86400000000000").alias("day"),
                ),
                "user_id",
                "day",
            )
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-shck-")
    daily = (
        spark.read.parquet(out)
        .groupBy("day", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    days = daily.select(F.col("day").alias("wday")).distinct()
    slid = daily.select(
        "day", "reg", "max_rho",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select((F.col("day") + F.col("off")).alias("wday"), "reg", "max_rho")
    merged = (
        slid.join(days, "wday")
        .groupBy("wday", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est = (
        f"CASE WHEN ({sketch._RAW_EST_SQL}) <= {2.5 * sketch.HLL_M}"
        f" AND m_used < {sketch.HLL_M}"
        f" THEN {sketch.HLL_M} * ln(CAST({sketch.HLL_M} AS DOUBLE)"
        f" / ({sketch.HLL_M} - m_used))"
        f" ELSE ({sketch._RAW_EST_SQL}) END"
    )
    return (
        merged.groupBy("wday")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_used"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" {sketch.HLL_BITS + 1} - max_rho)"
                )
            ).alias("harmonic_q"),
        )
        .select(
            F.col("wday").cast("bigint").alias("wday"),
            "m_used",
            "harmonic_q",
            F.expr(f"CAST(round({est}) AS BIGINT)").alias("est"),
        )
        .orderBy("wday")
    )


@register(
    "events_stream_psi_drift",
    oracle=f"""
        WITH ev AS (
          SELECT value,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        bucketed AS (
          SELECT day,
                 LEAST(9, CAST(floor(value / 50.0) AS BIGINT)) AS b
          FROM ev
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM bucketed),
        cnt AS (
          SELECT CAST((bucketed.day - d0.d0) // 7 AS BIGINT) AS week,
                 b, CAST(COUNT(*) AS BIGINT) AS c
          FROM bucketed CROSS JOIN d0 GROUP BY 1, 2
        ),
        spine AS (
          SELECT w.week, gb.b
          FROM (SELECT DISTINCT week FROM cnt) w
          CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b) gb
        ),
        full_cnt AS (
          SELECT spine.week, spine.b,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS c
          FROM spine LEFT JOIN cnt
            ON cnt.week = spine.week AND cnt.b = spine.b
        ),
        tot AS (
          SELECT week, CAST(SUM(c) AS BIGINT) AS t
          FROM full_cnt GROUP BY 1
        ),
        ref AS (
          SELECT fc.b, fc.c AS cr, tot.t AS tr
          FROM full_cnt fc JOIN tot ON tot.week = fc.week
          WHERE fc.week = 0
        ),
        terms AS (
          SELECT fc.week, fc.b,
                 {_PSI_CONTRIB.format(cw="fc.c", tw="tot.t",
                                      cr="ref.cr", tr="ref.tr")} AS contrib
          FROM full_cnt fc
          JOIN tot ON tot.week = fc.week
          JOIN ref ON ref.b = fc.b
          WHERE fc.week > 0
        ),
        psi AS (
          SELECT week,
                 list_sum(list(contrib ORDER BY b)) AS fold
          FROM terms GROUP BY week
        )
        SELECT CAST(week AS BIGINT) AS week,
               CAST(round(fold * 1000000.0) AS BIGINT) AS psi_ppm
        FROM psi ORDER BY week
    """,
    doc="STREAMING twin of events_psi_drift with FIXED bucket edges "
    "(floor(value/50) clamp 9 — a streaming pipeline cannot know the "
    "global max upfront, so the production shape pins edges a priori): "
    "each of 3 chronological micro-batches appends per-(day, bucket) "
    "count partials to a parquet sink (SUM-mergeable — chopping/replay "
    "safe by algebra); the finalizer merges, derives weeks from the "
    "merged min day, and computes the identical smoothed PSI with the "
    "bucket-sorted sequential fold. Converges to the batch oracle "
    "bit-for-bit. State: weeks x 10 cells, never raw volume.",
    tags=("events", "streaming", "stats", "curation"),
)
def events_stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-pssrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-psout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                F.expr("ts DIV 86400000000000").alias("day"),
                F.least(
                    F.lit(9),
                    F.floor(F.col("value") / 50.0).cast("bigint"),
                ).alias("b"),
            )
            .groupBy("day", "b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-psck-")
    sink = spark.read.parquet(out)
    mind = sink.agg(F.min("day").alias("d0"))
    cnt = (
        sink.crossJoin(F.broadcast(mind))
        .select(
            F.expr("CAST((day - d0) DIV 7 AS BIGINT)").alias("week"),
            "b",
            "c",
        )
        .groupBy("week", "b")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    spine = (
        cnt.select("week")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").alias("b")))
    )
    full_cnt = spine.join(cnt, ["week", "b"], "left").select(
        "week", "b",
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
    )
    tot = full_cnt.groupBy("week").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    ref = (
        full_cnt.filter(F.col("week") == 0)
        .join(tot.filter(F.col("week") == 0), "week")
        .select("b", F.col("c").alias("cr"), F.col("t").alias("tr"))
    )
    terms = (
        full_cnt.filter(F.col("week") > 0)
        .join(tot, "week")
        .join(F.broadcast(ref), "b")
        .withColumn(
            "contrib",
            F.expr(_PSI_CONTRIB.format(cw="c", tw="t", cr="cr", tr="tr")),
        )
    )
    return (
        terms.groupBy("week")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(b, contrib))),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.contrib)"
            ).alias("fold")
        )
        .select(
            F.col("week").cast("bigint"),
            F.round(F.col("fold") * 1000000.0)
            .cast("bigint")
            .alias("psi_ppm"),
        )
        .orderBy("week")
    )


# ------------------------------------------------------- audio VAD --


@register(
    "multimodal_audio_vad",
    oracle="""
        WITH frames AS (
          SELECT doc_id, f.f AS frame_idx,
                 list_sum(list_transform(generate_series(0, 15), j ->
                   CASE WHEN (doc_id + f.f) % 3 = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(((doc_id * 7 + (f.f * 16 + j) * 13)
                                   % 4096 - 2048)
                                  * ((doc_id * 7 + (f.f * 16 + j) * 13)
                                     % 4096 - 2048) AS BIGINT)
                   END)) AS energy
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS f) f
          WHERE doc_id < 500
        ),
        active AS (
          SELECT doc_id, frame_idx,
                 frame_idx - row_number() OVER (
                   PARTITION BY doc_id ORDER BY frame_idx
                 ) AS grp
          FROM frames WHERE energy > 0
        ),
        per_seg AS (
          SELECT doc_id, grp, CAST(COUNT(*) AS INTEGER) AS seg_len,
                 MIN(frame_idx) AS seg_start
          FROM active GROUP BY 1, 2
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(seg_len) AS INTEGER) AS n_active,
                 CAST(COUNT(*) AS INTEGER) AS n_segments,
                 CAST(MAX(seg_len) AS INTEGER) AS max_segment_len,
                 CAST(MIN(seg_start) AS INTEGER) AS first_active_frame
          FROM per_seg GROUP BY 1
        )
        SELECT d.doc_id, 16 AS n_frames,
               COALESCE(p.n_active, 0) AS n_active,
               COALESCE(p.n_segments, 0) AS n_segments,
               COALESCE(p.max_segment_len, 0) AS max_segment_len,
               COALESCE(p.first_active_frame, -1) AS first_active_frame
        FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
        LEFT JOIN per_doc p ON p.doc_id = d.doc_id
        ORDER BY d.doc_id
    """,
    doc="Energy-threshold voice-activity detection end-to-end over REAL "
    "WAV payloads: per doc a 256-sample waveform with deterministic "
    "SILENT frames (every frame f with (doc_id+f)%3==0 is zeroed; "
    "active samples follow s_i=(doc_id*7+i*13)%4096-2048) is encoded "
    "as genuine RIFF/PCM by encode_wav, decoded by the chunk-walking "
    "decode_audio, framed into 16x16-sample frames with exact int64 "
    "energies (operators/multimodal.py:audio_frame_energy), and "
    "segmented by gaps-and-islands (audio_vad_segments) — n_active / "
    "n_segments / max_run / first_active per doc, all exact integers. "
    "The oracle recomputes from the sample formula, so a mis-parsed "
    "chunk, off-by-one framing, or broken island grouping "
    "hash-mismatches. Both stages Arrow-batched narrow maps + one "
    "doc-partitioned window.",
    tags=("multimodal", "window"),
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 500)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = [
                    0
                    if (d + (i // 16)) % 3 == 0
                    else (d * 7 + i * 13) % 4096 - 2048
                    for i in range(256)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    frames = multimodal.audio_frame_energy(blobs, frame_len=16)
    return multimodal.audio_vad_segments(frames, threshold=0).orderBy(
        "doc_id"
    )


# ------------------------------------------------------- add_files --


@register(
    "managed_add_files_import",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="Iceberg's add_files import procedure end-to-end (table.py:"
    "add_files + CALL system.add_files): orders staged as plain "
    "partition-aligned parquet (one file per order-year), then "
    "REGISTERED into a managed table at metadata cost only — per-file "
    "partition membership INFERRED from footer min==max stats, zero "
    "data copy (in-DAG assert: every live path is the staged path), "
    "footer stats real enough that COUNT(*) answers from manifests and "
    "a partition predicate prunes to one file, duplicate re-import "
    "raises, and a post-import insert() coexists. The migrate-in-place "
    "path: at 100 TB the difference between an import and a "
    "re-ingestion. Result: the imported table's per-year rollup vs the "
    "raw-parquet oracle.",
    tags=("managed", "import", "pruning"),
)
def managed_add_files_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    src = tempfile.mkdtemp(prefix="icebergsql-addfsrc-")
    years = sorted(
        r["o_year"] for r in orders.select("o_year").distinct().collect()
    )
    for y in years:
        orders.filter(F.col("o_year") == y).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-addfwh-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    tbl = eng.catalog.create_table("ord_imp", ddl, ["o_year"])
    mark_setup_done()  # staging done; the metadata-only import is the op
    res = eng.sql(
        f"CALL system.add_files(table => 'ord_imp', source_dir => '{src}')"
    ).collect()[0]
    assert res["added_files_count"] == len(years), res
    tbl.refresh()
    snap = tbl.meta.current_snapshot()
    paths = {f.path for f in snap.live_files()}
    assert all(p.startswith(src) for p in paths), "import must not copy"
    # footer stats are real: metadata COUNT(*) and partition pruning work
    assert tbl.scan().count_from_stats() == orders.count()
    assert tbl.scan(where=f"o_year = {years[0]}").files_scanned == 1
    try:
        tbl.add_files(src)
        raise AssertionError("duplicate re-import must raise")
    except Exception as e:  # noqa: BLE001
        assert "already registered" in str(e)
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_imp GROUP BY o_year ORDER BY o_year"
    )


# ------------------------------------------------------ sliding CMS --


def _cms_sliding_oracle() -> str:
    from icebergsql_spark.plans.pipeline2 import _cms_bucket_sql

    key = "CAST(user_id AS VARCHAR)"
    daily_union = " UNION ALL ".join(
        f"SELECT day, {j} AS depth, {_cms_bucket_sql(key, j)} AS bucket "
        f"FROM ev" for j in range(3)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT user_id, {j} AS depth, "
        f"{_cms_bucket_sql(key, j)} AS bucket FROM top"
        for j in range(3)
    )
    return f"""
        WITH ev AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        daily AS (
          SELECT day, depth, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ({daily_union}) x GROUP BY 1, 2, 3
        ),
        days AS (SELECT DISTINCT day AS wday FROM daily),
        win AS (
          SELECT d2.wday, daily.depth, daily.bucket,
                 CAST(SUM(daily.cnt) AS BIGINT) AS cnt
          FROM daily JOIN days d2
            ON d2.wday BETWEEN daily.day AND daily.day + 6
          GROUP BY 1, 2, 3
        ),
        top AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_total
          FROM ev GROUP BY 1 ORDER BY exact_total DESC, user_id LIMIT 5
        ),
        probes AS ({probe_union}),
        est AS (
          SELECT win.wday, probes.user_id,
                 CAST(MIN(win.cnt) AS BIGINT) AS cms_estimate
          FROM win JOIN probes USING (depth, bucket)
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT d2.wday, ev.user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
          FROM ev JOIN days d2
            ON d2.wday BETWEEN ev.day AND ev.day + 6
          GROUP BY 1, 2
        )
        SELECT est.wday, est.user_id, est.cms_estimate,
               CAST(COALESCE(exact.exact_n, 0) AS BIGINT) AS exact_n
        FROM est LEFT JOIN exact
          ON exact.wday = est.wday AND exact.user_id = est.user_id
        ORDER BY est.wday, est.user_id
    """


@register(
    "sketch_cms_sliding",
    oracle=_cms_sliding_oracle(),
    doc="7-day sliding heavy-hitter counts from SUM-merged per-day "
    "Count-Min counters (operators/sketch.py:cms_sliding_estimate) — "
    "the additive-merge twin of sketch_hll_sliding's MAX-merge: daily "
    "(depth, bucket) counter tables sum into any window without "
    "re-touching raw events (O(days x 3 x 256) state), the 5 globally "
    "most-active users are probed per window via min-over-depths, and "
    "the exact windowed count rides along (estimate >= exact is the "
    "structural CMS guarantee — and hash-checked, since md5-derived "
    "buckets make even the over-estimates deterministic). Scale shape: "
    "bounded day-spine fan-out joins over counter tables, one broadcast "
    "probe join.",
    tags=("sketch", "countmin", "window"),
)
def sketch_cms_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select(
        F.col("user_id").cast("string").alias("uid"),
        F.col("user_id"),
        F.expr("ts DIV 86400000000000").alias("day"),
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_total"))
        .orderBy(F.desc("exact_total"), "user_id")
        .limit(5)
        .select(F.col("user_id").cast("string").alias("uid"), "user_id")
        .localCheckpoint()
    )
    est = sketch.cms_sliding_estimate(
        ev, "uid", "day", top.select("uid"), window_days=7
    )
    days = ev.select(F.col("day").alias("wday")).distinct()
    exact = (
        ev.select("user_id", "day")
        .join(
            days,
            (F.col("wday") >= F.col("day"))
            & (F.col("wday") <= F.col("day") + 6),
        )
        .groupBy("wday", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
    )
    return (
        est.join(top, "uid")
        .join(exact, ["wday", "user_id"], "left")
        .select(
            F.col("wday").cast("bigint").alias("wday"),
            "user_id",
            "cms_estimate",
            F.coalesce("exact_n", F.lit(0)).cast("bigint").alias("exact_n"),
        )
        .orderBy("wday", "user_id")
    )


# -------------------------------------------------- winsorized mean --


@register(
    "agg_winsorized_mean",
    oracle="""
        WITH o AS (
          SELECT o_orderpriority AS pri,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderkey AS k
          FROM orders
        ),
        ranked AS (
          SELECT pri, c,
                 CAST(row_number() OVER (
                   PARTITION BY pri ORDER BY c, k) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER (PARTITION BY pri) AS BIGINT) AS n
          FROM o
        ),
        bounds AS (
          SELECT pri,
                 CAST(MAX(CASE WHEN i = n // 10 + 1 THEN c END)
                      AS BIGINT) AS lo_val,
                 CAST(MAX(CASE WHEN i = n - n // 10 THEN c END)
                      AS BIGINT) AS hi_val
          FROM ranked GROUP BY pri
        ),
        wins AS (
          SELECT r.pri,
                 LEAST(GREATEST(r.c, b.lo_val), b.hi_val) AS c
          FROM ranked r JOIN bounds b ON b.pri = r.pri
        )
        SELECT w.pri AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               b.lo_val, b.hi_val,
               CAST(SUM(w.c) AS BIGINT) AS wins_cents,
               CAST(CAST(SUM(w.c) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100.0 AS winsorized_mean
        FROM wins w JOIN bounds b ON b.pri = w.pri
        GROUP BY w.pri, b.lo_val, b.hi_val
        ORDER BY w.pri
    """,
    doc="10% two-sided WINSORIZED mean of order value per priority — "
    "agg_trimmed_mean's sibling that CLAMPS the floor(n/10) tail rows "
    "to the boundary values instead of dropping them (keeps n, bounds "
    "influence — the robust-location choice when downstream needs "
    "every row weighted). Same determinism mechanics: integer cents "
    "under a total order (value, orderkey), rank-based boundaries "
    "(identical clamp SET in both engines), exact bigint clamped sum, "
    "two mirrored final float divisions. Scale shape: one per-group "
    "sort window + a broadcast bounds join.",
    tags=("agg", "stats", "window"),
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql("""
        WITH o AS (
          SELECT o_orderpriority AS pri,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderkey AS k
          FROM orders
        ),
        ranked AS (
          SELECT pri, c,
                 CAST(row_number() OVER (
                   PARTITION BY pri ORDER BY c, k) AS BIGINT) AS i,
                 CAST(COUNT(*) OVER (PARTITION BY pri) AS BIGINT) AS n
          FROM o
        ),
        bounds AS (
          SELECT pri,
                 CAST(MAX(CASE WHEN i = n DIV 10 + 1 THEN c END)
                      AS BIGINT) AS lo_val,
                 CAST(MAX(CASE WHEN i = n - n DIV 10 THEN c END)
                      AS BIGINT) AS hi_val
          FROM ranked GROUP BY pri
        ),
        wins AS (
          SELECT r.pri,
                 LEAST(GREATEST(r.c, b.lo_val), b.hi_val) AS c
          FROM ranked r JOIN bounds b ON b.pri = r.pri
        )
        SELECT w.pri AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               b.lo_val, b.hi_val,
               CAST(SUM(w.c) AS BIGINT) AS wins_cents,
               CAST(CAST(SUM(w.c) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100.0 AS winsorized_mean
        FROM wins w JOIN bounds b ON b.pri = w.pri
        GROUP BY w.pri, b.lo_val, b.hi_val
        ORDER BY w.pri
    """)


# --------------------------------------------------- image aHash --


@register(
    "multimodal_image_ahash",
    oracle="""
        WITH px AS (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 16) * 37 + i.i * 11) % 256 AS v,
                 ((i.i // 3) // 16) // 2 * 8 + ((i.i // 3) % 16) // 2
                   AS cell
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < 1000
        ),
        cells AS (
          SELECT doc_id, cell, CAST(SUM(v) AS BIGINT) AS cs
          FROM px GROUP BY 1, 2
        ),
        tot AS (
          SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS t
          FROM cells GROUP BY 1
        ),
        bits AS (
          SELECT c.doc_id, c.cell,
                 CASE WHEN c.cs * 64 > tot.t THEN 1 ELSE 0 END AS bit
          FROM cells c JOIN tot ON tot.doc_id = c.doc_id
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN cell // 16 = 0
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b0,
                 CAST(SUM(CASE WHEN cell // 16 = 1
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b1,
                 CAST(SUM(CASE WHEN cell // 16 = 2
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b2,
                 CAST(SUM(CASE WHEN cell // 16 = 3
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b3,
                 CAST(SUM(bit) AS INTEGER) AS popcount
          FROM bits GROUP BY doc_id
        )
        SELECT b0, b1, b2, b3, CAST(MAX(popcount) AS INTEGER) AS popcount,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM hashes
        GROUP BY b0, b1, b2, b3
        ORDER BY b0, b1, b2, b3
    """,
    doc="Perceptual average-hash image dedup end-to-end (operators/"
    "multimodal.py:image_average_hash): per doc a REAL 16x16 RGB image "
    "(byte i = ((doc_id%16)*37 + i*11) % 256 — exactly 16 distinct "
    "images across the corpus) encoded as PPM/BMP by parity, decoded "
    "by decode_image, integer-grayscaled, 8x8-cell aHash with the "
    "exact-integer mean test (cell_sum*64 > total_sum — no float "
    "anywhere), bits packed into four 16-bit bands (the SimHash "
    "banding, so near-dup candidates come from band equi-joins at "
    "scale). The gate groups by full hash: the 16 planted image "
    "classes collapse to a fixed set of hash groups (12 — aHash "
    "collides some classes by design, that IS the near-dup behavior) "
    "with exact membership counts — the image near-dup clustering "
    "primitive. Oracle recomputes everything from the pixel formula.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 1000)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 256 for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    hashes = multimodal.image_average_hash(blobs, grid=8)
    return (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.max("popcount").cast("int").alias("popcount"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("b0", "b1", "b2", "b3")
    )


# --------------------------------------------- temperature mixing --


@register(
    "curation_temperature_mix",
    oracle="""
        WITH cnt AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cnt),
        fold AS (
          SELECT list_sum(list(sqrt(CAST(c AS DOUBLE)) ORDER BY source))
            AS s
          FROM cnt
        )
        SELECT cnt.source, cnt.c AS n_docs,
               CAST((cnt.c * 1000000) // tot.t AS BIGINT) AS p_nat_ppm,
               CAST(round(1000000.0 * sqrt(CAST(cnt.c AS DOUBLE)) / fold.s)
                    AS BIGINT) AS p_temp_ppm,
               CAST(round(1000000.0 * sqrt(CAST(cnt.c AS DOUBLE)) / fold.s)
                    AS BIGINT)
                 - CAST((cnt.c * 1000000) // tot.t AS BIGINT) AS boost_ppm
        FROM cnt CROSS JOIN tot CROSS JOIN fold
        ORDER BY cnt.source
    """,
    doc="Temperature-based source mixing weights (T5/mT5 ss 3.1 "
    "temperature sampling, alpha = 0.5): sampling probability "
    "proportional to count^alpha flattens the natural source mix so "
    "low-resource sources are upsampled — THE standard multi-source "
    "LLM pretraining mix knob. alpha = 0.5 keeps the gate exact: "
    "sqrt() is bit-identical across engines and the normalizer is a "
    "SOURCE-SORTED sequential fold over the handful of per-source "
    "terms (Spark aggregate() over sorted structs == DuckDB list_sum "
    "over list(... ORDER BY source)). Emits natural vs temperature "
    "ppm weights and the boost delta per source. Scale shape: one "
    "count aggregate; the fold runs over |sources| rows.",
    tags=("curation", "agg"),
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    cnt = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cnt.agg(F.sum("c").cast("bigint").alias("t"))
    fold = cnt.agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(source,"
            " sqrt(CAST(c AS DOUBLE)) AS sq))),"
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.sq)"
        ).alias("s")
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(fold))
        .select(
            "source",
            F.col("c").alias("n_docs"),
            F.expr("CAST((c * 1000000) DIV t AS BIGINT)").alias(
                "p_nat_ppm"
            ),
            F.round(
                F.lit(1000000.0) * F.sqrt(F.col("c").cast("double"))
                / F.col("s")
            ).cast("bigint").alias("p_temp_ppm"),
            (
                F.round(
                    F.lit(1000000.0) * F.sqrt(F.col("c").cast("double"))
                    / F.col("s")
                ).cast("bigint")
                - F.expr("CAST((c * 1000000) DIV t AS BIGINT)")
            ).alias("boost_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------------ streaming WAP --


@register(
    "managed_stream_wap",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Streaming write-audit-publish: the stream lands on a BRANCH, "
    "never on main. Seed main with the o_orderkey%4==3 quarter, fork "
    "'staging', then 3 micro-batches (%4 in 0,1,2; maxFilesPerTrigger"
    "=1, availableNow) each append to the branch via foreachBatch. "
    "In-DAG asserts: the main pointer is UNTOUCHED after the whole "
    "stream (reader isolation — the WAP property), the branch carries "
    "exactly 3 streamed snapshots, and the audited branch scan "
    "matches full orders; then fast_forward publishes (the round-9 "
    "ancestor rule holds: main never moved, so the move is legal) "
    "and the published table equals the raw-parquet oracle. Composes "
    "round-4 streaming ingest + round-8 branch refs + the round-9 "
    "fast-forward ancestor check into the production streaming-"
    "staging pipeline shape.",
    tags=("managed", "streaming", "branches"),
)
def managed_stream_wap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_orderkey") % 4).cast("int").alias("m"),
    )
    src = tempfile.mkdtemp(prefix="icebergsql-swapsrc-")
    for i in range(3):
        base.filter(F.col("m") == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-swapwh-"))
    tbl = eng.catalog.create_table(
        "ord_swap", "k bigint, c bigint, st string, m int", ["st"]
    )
    tbl.insert(nonempty(base.filter(F.col("m") == 3)))
    tbl.create_branch("staging")
    main_head = tbl.meta.current_snapshot_id
    mark_setup_done()  # seed + fork done; the streamed WAP is the op

    def land(batch_df, batch_id):
        tbl.insert(batch_df, branch="staging")

    q = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="icebergsql-swapck-"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == main_head, (
        "streamed branch writes moved the main pointer"
    )
    ref = tbl.meta.refs["staging"]
    # branch head is exactly 3 streamed commits above the fork point
    depth, cur = 0, tbl.meta.snapshot_by_id(ref["snapshot_id"])
    while cur is not None and cur.snapshot_id != main_head:
        depth += 1
        cur = (
            tbl.meta.snapshot_by_id(cur.parent_id)
            if cur.parent_id is not None
            else None
        )
    assert depth == 3, f"expected 3 streamed branch commits, got {depth}"
    audit = tbl.to_df(ref="staging")
    assert audit.filter(F.col("c").isNull()).limit(1).count() == 0
    tbl.fast_forward("staging")
    tbl.drop_ref("staging")
    return eng.sql(
        "SELECT st AS o_orderstatus, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM ord_swap GROUP BY st ORDER BY st"
    )


# --------------------------------------------------- Hill tail index --


@register(
    "events_hill_tail_index",
    oracle="""
        WITH ranked AS (
          SELECT value AS v,
                 row_number() OVER (ORDER BY value DESC, event_id) AS rn
          FROM events
        ),
        topk AS (SELECT v, rn FROM ranked WHERE rn <= 101),
        xk AS (SELECT v AS x_k FROM topk WHERE rn = 101),
        terms AS (
          SELECT t.rn, CAST((t.rn - 1) // 10 AS BIGINT) AS decile,
                 CAST(floor((t.v / xk.x_k) * 1000000.0) AS BIGINT) AS rq
          FROM topk t CROSS JOIN xk WHERE t.rn <= 100
        )
        SELECT terms.decile,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(terms.rq) AS BIGINT) AS ratio_sum_q,
               xk.x_k AS x_k
        FROM terms CROSS JOIN xk
        GROUP BY terms.decile, xk.x_k
        ORDER BY terms.decile
    """,
    doc="Hill estimator sufficient statistics for the value "
    "distribution's power-law tail (Hill 1975) over the top k=100 "
    "order statistics: per rank-decile, the EXACT quantized ratio sums "
    "floor(1e6 * x_i / x_(k+1)) plus the pivot x_k — the consumer "
    "derives alpha_hat = 1 / mean(ln ratio) offline; the estimator's "
    "heavy-tail verdict (alpha < 2 means infinite variance, sampling "
    "strategies must change) needs only these ratios. HARDENED per "
    "VERDICT r10 item 6: the former ln-derived hill_mean/alpha_hat "
    "columns were the registry's last 1-ulp hazard (JVM Math.log vs "
    "glibc log diverge by 1 ulp on some inputs) — every hashed column "
    "is now exact (bigint sums of floored double divisions, which ARE "
    "bit-identical across engines; x_k is a raw data value). Rank "
    "deciles via (rn-1) DIV 10, never ntile. Scale shape: one "
    "TakeOrdered top-101 scan — no global sort materialized.",
    tags=("events", "stats", "agg"),
)
def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH ranked AS (
          SELECT value AS v,
                 row_number() OVER (ORDER BY value DESC, event_id) AS rn
          FROM events
        ),
        topk AS (SELECT v, rn FROM ranked WHERE rn <= 101),
        xk AS (SELECT v AS x_k FROM topk WHERE rn = 101),
        terms AS (
          SELECT t.rn, CAST((t.rn - 1) DIV 10 AS BIGINT) AS decile,
                 CAST(floor((t.v / xk.x_k) * 1000000.0) AS BIGINT) AS rq
          FROM topk t CROSS JOIN xk WHERE t.rn <= 100
        )
        SELECT terms.decile,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(SUM(terms.rq) AS BIGINT) AS ratio_sum_q,
               xk.x_k AS x_k
        FROM terms CROSS JOIN xk
        GROUP BY terms.decile, xk.x_k
        ORDER BY terms.decile
    """)


# ------------------------------------------------ bot regularity --


@register(
    "events_bot_regularity",
    oracle="""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) AS ts, event_id FROM events
        ),
        gaps AS (
          SELECT user_id,
                 (ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                 )) // 1000000000 AS g
          FROM e
        ),
        g2 AS (SELECT user_id, CAST(g AS BIGINT) AS g FROM gaps
               WHERE g IS NOT NULL),
        stats AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(g) AS BIGINT) AS s1,
                 CAST(SUM(g * g) AS BIGINT) AS s2
          FROM g2 GROUP BY 1
        )
        SELECT user_id, n_gaps,
               CAST(s1 // n_gaps AS BIGINT) AS mean_gap_s,
               CAST(n_gaps * s2 - s1 * s1 AS BIGINT) AS var_num,
               CAST(n_gaps * n_gaps AS BIGINT) AS var_den
        FROM stats
        WHERE n_gaps >= 5
        ORDER BY CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
                   / CAST(n_gaps * n_gaps AS DOUBLE),
                 user_id
        LIMIT 20
    """,
    doc="Bot / automation detection by inter-arrival regularity: per "
    "user the exact integer variance of event gaps (seconds; "
    "var_num/var_den = (n*sum(g^2) - sum(g)^2) / n^2 kept as an exact "
    "rational — humans are bursty, schedulers are metronomes, so the "
    "20 lowest-variance users with >= 5 gaps are the automation "
    "shortlist every abuse/curation pipeline maintains. Determinism: "
    "gaps under a total per-user order (ts, event_id), second-level "
    "truncation keeps every square inside int64 at any realistic "
    "horizon, ranking key is the exact scaled rational. Scale shape: "
    "one per-user window + sufficient-stats aggregate; the sort is "
    "TakeOrdered top-20.",
    tags=("events", "stats", "curation"),
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_botreg")
    return spark.sql("""
        WITH gaps AS (
          SELECT user_id,
                 (ts - lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                 )) DIV 1000000000 AS g
          FROM ev_botreg
        ),
        g2 AS (SELECT user_id, CAST(g AS BIGINT) AS g FROM gaps
               WHERE g IS NOT NULL),
        stats AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS n_gaps,
                 CAST(SUM(g) AS BIGINT) AS s1,
                 CAST(SUM(g * g) AS BIGINT) AS s2
          FROM g2 GROUP BY 1
        )
        SELECT user_id, n_gaps,
               CAST(s1 DIV n_gaps AS BIGINT) AS mean_gap_s,
               CAST(n_gaps * s2 - s1 * s1 AS BIGINT) AS var_num,
               CAST(n_gaps * n_gaps AS BIGINT) AS var_den
        FROM stats
        WHERE n_gaps >= 5
        ORDER BY CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)
                   / CAST(n_gaps * n_gaps AS DOUBLE),
                 user_id
        LIMIT 20
    """)


# ------------------------------------------------------------ CUPED --


@register(
    "events_cuped_adjustment",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(SUM(CASE WHEN ev.day < d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ev.day >= d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_mean
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """,
    doc="CUPED variance-reduced A/B metric (Deng et al. WSDM 2013 — the "
    "industry-standard experiment readout): per user, pre-period "
    "(first 2 weeks) purchase count X is the covariate for the "
    "post-period metric Y; theta = cov(X,Y)/var(X) from POOLED exact "
    "integer sufficient stats (cov_num/var_num emitted as the exact "
    "bigint rationals), and each arm (user_id parity) reports "
    "mean(Y_g) - theta * (mean(X_g) - mean(X)) — same expected value "
    "as the plain mean, strictly lower variance. Determinism: one "
    "textually mirrored float expression over exact bigints. Scale "
    "shape: one per-user aggregate, one 2-row arm aggregate, a "
    "broadcast pooled row — the sufficient-stats pattern of "
    "agg_welch_ttest.",
    tags=("events", "stats", "curation"),
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cuped")
    return spark.sql("""
        WITH ev AS (
          SELECT user_id, event_type, ts DIV 86400000000000 AS day
          FROM ev_cuped
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INT) AS arm,
                 CAST(SUM(CASE WHEN ev.day < d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ev.day >= d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_mean
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """)


# ------------------------------------------------------------- HITS --


@register(
    "graph_hits_scores",
    oracle=_EDGE_SQL + """,
        de AS (SELECT a AS src, b AS dst FROM half),
        nodes AS (
          SELECT DISTINCT n FROM (
            SELECT src AS n FROM de UNION ALL SELECT dst FROM de
          ) x
        ),
        a1 AS (
          SELECT dst AS n, CAST(COUNT(*) AS BIGINT) AS s
          FROM de GROUP BY 1
        ),
        h1 AS (
          SELECT de.src AS n, CAST(SUM(a1.s) AS BIGINT) AS s
          FROM de JOIN a1 ON a1.n = de.dst GROUP BY 1
        ),
        a2 AS (
          SELECT de.dst AS n, CAST(SUM(h1.s) AS BIGINT) AS s
          FROM de JOIN h1 ON h1.n = de.src GROUP BY 1
        ),
        h2 AS (
          SELECT de.src AS n, CAST(SUM(a2.s) AS BIGINT) AS s
          FROM de JOIN a2 ON a2.n = de.dst GROUP BY 1
        )
        SELECT nodes.n,
               CAST(COALESCE(a2.s, 0) AS BIGINT) AS auth_2,
               CAST(COALESCE(h2.s, 0) AS BIGINT) AS hub_2
        FROM nodes
        LEFT JOIN a2 ON a2.n = nodes.n
        LEFT JOIN h2 ON h2.n = nodes.n
        ORDER BY auth_2 DESC, hub_2 DESC, nodes.n
        LIMIT 25
    """,
    doc="HITS hub/authority scores (Kleinberg 1999), two UNNORMALIZED "
    "power-iteration rounds over the lexicographically-directed token "
    "graph (edge a -> b iff a < b co-occur): auth_k = sum of in-"
    "neighbor hubs, hub_k = sum of out-neighbor auths, every score an "
    "EXACT bigint (normalization only rescales the ranking, so "
    "dropping it keeps the fixed-round scores oracle-checkable; "
    "production runs normalized floats to convergence — documented "
    "trade). Top-25 under a total order. Complements pagerank/PPR "
    "with the bipartite-influence view link-farm and citation "
    "analyses use. Scale shape: each round is one equi-join + "
    "groupBy over the edge list.",
    tags=("graph", "join"),
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    half = _token_half_edges(spark, sf_dir)
    de = half.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    nodes = (
        de.select(F.col("src").alias("n"))
        .unionAll(de.select(F.col("dst").alias("n")))
        .distinct()
    )
    a1 = de.groupBy(F.col("dst").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("s")
    )
    h1 = (
        de.join(a1.withColumnRenamed("n", "dst"), "dst")
        .groupBy(F.col("src").alias("n"))
        .agg(F.sum("s").cast("bigint").alias("s"))
    )
    a2 = (
        de.join(
            h1.select(F.col("n").alias("src"), F.col("s").alias("hs")),
            "src",
        )
        .groupBy(F.col("dst").alias("n"))
        .agg(F.sum("hs").cast("bigint").alias("s"))
    )
    h2 = (
        de.join(
            a2.select(F.col("n").alias("dst"), F.col("s").alias("as2")),
            "dst",
        )
        .groupBy(F.col("src").alias("n"))
        .agg(F.sum("as2").cast("bigint").alias("s"))
    )
    return (
        nodes.join(a2.withColumnRenamed("s", "auth_2"), "n", "left")
        .join(h2.withColumnRenamed("s", "hub_2"), "n", "left")
        .select(
            "n",
            F.coalesce("auth_2", F.lit(0)).cast("bigint").alias("auth_2"),
            F.coalesce("hub_2", F.lit(0)).cast("bigint").alias("hub_2"),
        )
        .orderBy(F.desc("auth_2"), F.desc("hub_2"), "n")
        .limit(25)
    )
