"""Third-session round-10 gate wave #2 (pipeline16, 25 gates):
time-series (Haar energy, motif discovery, Page-Hinkley + stream
twin, binary segmentation, weekly DFT spectrum), text (TextRank
keywords, boilerplate bigrams), graph (closeness/harmonic
centrality, degree assortativity), images over real decoded bytes
(luminance histograms, L1 + EMD dedup tiers, gradient quality),
audio (integer-DFT tone detection), embeddings (sign-bit LSH recall
sweep), sketches (bloom-AND prefilter join, streaming sliding bloom,
CMS heavy-change), experimentation (uplift deciles, power/MDE,
DAU/WAU/MAU stickiness + stream twin), curation (dedup-aware
sampling) and managed tables (cherry-pick audit).

Value-bearing columns are exact bigint arithmetic wherever possible
(counts, squared integer distances, integer-ppm ranks, quantized DFT
bases computed once on the driver); the few float columns replay the
IDENTICAL op sequence in both engines (folds vs recursive CTEs,
mirrored guarded divisions) — the established round-6+ discipline.
Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity)

from icebergsql_spark.plans.registry import (
    events_min_day,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------------ Haar wavelet energy --

_HAAR_DAYS = 16  # 2^4 -> 4 detail levels + 1 smooth coefficient


def _haar_levels_sql(xform: str, idx, agg_sq: str) -> str:
    """The shared 4-level Haar pyramid CTE chain over an `a0(event_type,
    a)` relation holding the first 16 daily counts as a list.  `xform`
    renders a half-length pairwise map, `idx(arr, expr)` renders
    1-based list indexing, `agg_sq` renders sum-of-squares over a list
    — the only engine-specific spellings."""
    lv = []
    n = _HAAR_DAYS
    prev = "a0"
    for level in (1, 2, 3, 4):
        n //= 2
        s = xform.format(
            n=n - 1,
            body=f"{idx('a', '2*k+1')} + {idx('a', '2*k+2')}",
        )
        d = xform.format(
            n=n - 1,
            body=f"{idx('a', '2*k+1')} - {idx('a', '2*k+2')}",
        )
        lv.append(
            f"l{level} AS (SELECT event_type, {s} AS a, {d} AS d "
            f"FROM {prev})"
        )
        prev = f"l{level}"
    return ",\n        ".join(lv)


def _haar_final_sql(idx, agg_sq: str) -> str:
    return f"""
        SELECT l4.event_type,
               CAST({idx('l4.a', '1')} AS BIGINT) AS smooth,
               CAST({agg_sq.format(l='l1.d')} AS BIGINT) AS energy_l1,
               CAST({agg_sq.format(l='l2.d')} AS BIGINT) AS energy_l2,
               CAST({agg_sq.format(l='l3.d')} AS BIGINT) AS energy_l3,
               CAST({agg_sq.format(l='l4.d')} AS BIGINT) AS energy_l4,
               CAST({idx('l4.d', '1')} AS BIGINT) AS detail_l4
        FROM l4
        JOIN l3 ON l3.event_type = l4.event_type
        JOIN l2 ON l2.event_type = l4.event_type
        JOIN l1 ON l1.event_type = l4.event_type
        ORDER BY l4.event_type
    """


def _haar_oracle() -> str:
    def idx(arr: str, expr: str) -> str:
        return f"{arr}[{expr}]"

    xform = "list_transform(generate_series(0, {n}), k -> {body})"
    agg_sq = "list_sum(list_transform({l}, x -> x * x))"
    return f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        a0 AS MATERIALIZED (
          SELECT event_type, list(c ORDER BY day)[1:{_HAAR_DAYS}] AS a
          FROM daily GROUP BY event_type
        ),
        {_haar_levels_sql(xform, idx, agg_sq)}
        {_haar_final_sql(idx, agg_sq)}
    """


@register(
    "events_haar_energy",
    oracle=_haar_oracle(),
    doc="Haar wavelet energy signature of the per-type daily volume "
    "series (the classic multi-resolution burst detector: level-1 "
    "energy = day-to-day churn, level-4 = week-scale swings): the "
    "first 16 days form a dyadic pyramid of pairwise sums (smooth) "
    "and differences (detail); per level the unnormalized detail "
    "energy sum(d^2) is an exact bigint, as is the final smooth "
    "coefficient (= 16-day total). Both engines build the identical "
    "integer pyramid via list transforms — no float op anywhere. "
    "Scale shape: event-scale work is one (type, day) count; the "
    "pyramid folds a 16-element list per type.",
    tags=("events", "forecast", "stats"),
)
def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_haar")

    def idx(arr: str, expr: str) -> str:
        return f"element_at({arr}, CAST({expr} AS INT))"

    xform = "transform(sequence(0, {n}), k -> {body})"
    agg_sq = (
        "aggregate({l}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
    )
    return spark.sql(
        f"""
        WITH daily AS (
          SELECT event_type, ts DIV 86400000000000 AS day,
                 COUNT(*) AS c
          FROM ev_haar GROUP BY 1, 2
        ),
        a0 AS (
          SELECT event_type,
                 slice(transform(array_sort(collect_list(struct(day, c))),
                                 s -> s.c), 1, {_HAAR_DAYS}) AS a
          FROM daily GROUP BY event_type
        ),
        {_haar_levels_sql(xform, idx, agg_sq)}
        {_haar_final_sql(idx, agg_sq)}
    """
    )


# ------------------------------------------------ motif discovery --

_MOTIF_W = 7  # window length (one week of daily counts)
_MOTIF_TOPK = 3


def _motif_pairs_sql(
    src_arr: str, unnest_ij: str, idx, fold_sq: str
) -> str:
    return f"""
        pairs AS (
          SELECT ij.i AS i, ij.j AS j,
                 CAST({fold_sq} AS BIGINT) AS dist
          FROM {src_arr}, {unnest_ij}
          WHERE ij.j >= ij.i + {_MOTIF_W}
        )
        SELECT CAST(i AS BIGINT) AS win_i, CAST(j AS BIGINT) AS win_j,
               dist
        FROM pairs
        ORDER BY dist, i, j LIMIT {_MOTIF_TOPK}
    """


def _motif_oracle() -> str:
    def idx(arr: str, expr: str) -> str:
        return f"{arr}[{expr}]"

    fold_sq = (
        "list_sum(list_transform(generate_series(0, "
        f"{_MOTIF_W - 1}), t -> "
        "(a[ij.i+t+1] - a[ij.j+t+1]) * (a[ij.i+t+1] - a[ij.j+t+1])))"
    )
    unnest_ij = f"""(
            SELECT x.i AS i, y.j AS j
            FROM (SELECT unnest(generate_series(0,
                     CAST((SELECT n FROM a0) AS BIGINT) - {_MOTIF_W}))
                     AS i) x,
                 (SELECT unnest(generate_series(0,
                     CAST((SELECT n FROM a0) AS BIGINT) - {_MOTIF_W}))
                     AS j) y
          ) ij"""
    return f"""
        WITH daily AS (
          SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1
        ),
        a0 AS MATERIALIZED (
          SELECT list(c ORDER BY day) AS a, COUNT(*) AS n FROM daily
        ),
        {_motif_pairs_sql("a0", unnest_ij, idx, fold_sq)}
    """


@register(
    "events_motif_topk",
    oracle=_motif_oracle(),
    doc="Matrix-profile-lite motif discovery over the global daily "
    "volume series: all non-overlapping pairs of 7-day windows are "
    "scored by exact integer squared Euclidean distance "
    "sum((a_t - b_t)^2) and the top-3 closest pairs (the repeated "
    "weekly 'motifs') are emitted with a (dist, i, j) total order. "
    "The window count is bounded by the calendar (24 starts at 30 "
    "days), so the pair matrix is tiny even at 100 TB of events — "
    "the event-scale work is the single daily count; the O(windows^2) "
    "profile is driver-free list arithmetic both engines replay "
    "identically in integers.",
    tags=("events", "forecast", "stats"),
)
def events_motif_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_motif")

    def idx(arr: str, expr: str) -> str:
        return f"element_at({arr}, CAST({expr} AS INT))"

    fold_sq = (
        f"aggregate(sequence(0, {_MOTIF_W - 1}), CAST(0 AS BIGINT), "
        "(acc, t) -> acc + "
        "(element_at(a, CAST(ij.i+t+1 AS INT)) "
        " - element_at(a, CAST(ij.j+t+1 AS INT))) * "
        "(element_at(a, CAST(ij.i+t+1 AS INT)) "
        " - element_at(a, CAST(ij.j+t+1 AS INT))))"
    )
    unnest_ij = f"""(
            SELECT x.i AS i, y.j AS j
            FROM (SELECT explode(sequence(0,
                     (SELECT n FROM a0) - {_MOTIF_W})) AS i) x,
                 (SELECT explode(sequence(0,
                     (SELECT n FROM a0) - {_MOTIF_W})) AS j) y
          ) ij"""
    return spark.sql(
        f"""
        WITH daily AS (
          SELECT ts DIV 86400000000000 AS day, COUNT(*) AS c
          FROM ev_motif GROUP BY 1
        ),
        a0 AS (
          SELECT transform(array_sort(collect_list(struct(day, c))),
                           s -> s.c) AS a,
                 COUNT(*) AS n
          FROM daily
        ),
        {_motif_pairs_sql("a0", unnest_ij, idx, fold_sq)}
    """
    )


# ------------------------------------------------ TextRank keywords --

_TR_DAMP_PPM = 850_000  # damping 0.85 in parts-per-million
_TR_BASE_PPM = 150_000  # (1 - damping) in ppm
_TR_TOPK = 15


def _textrank_sql(div: str, sum_big: str, alias: str = "word") -> str:
    """Two exact integer-ppm TextRank rounds over a node-adjacency
    graph supplied as a CTE ``big(a, b)``.  `div` is the truncating
    integer division spelling (both operands non-negative, so Spark
    DIV == DuckDB //); `sum_big` wraps SUM so DuckDB's HUGEINT
    promotion is cast back down before the ppm multiply; `alias`
    names the emitted node column (word nodes for
    text_textrank_keywords, RAKE phrase nodes for
    text_textrank_phrases)."""
    return f"""
        edges AS (
          SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
          FROM big WHERE a <> b AND a <> '' AND b <> ''
        ),
        und AS (
          SELECT a AS v, b AS u FROM edges
          UNION ALL
          SELECT b AS v, a AS u FROM edges
        ),
        deg AS (
          SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY v
        ),
        r1 AS (
          SELECT und.v,
                 CAST({_TR_BASE_PPM} + ({_TR_DAMP_PPM}
                      * {sum_big.format(x=f'1000000 {div} dj.d')})
                      {div} 1000000 AS BIGINT) AS r
          FROM und JOIN deg dj ON dj.v = und.u
          GROUP BY und.v
        ),
        r2 AS (
          SELECT und.v,
                 CAST({_TR_BASE_PPM} + ({_TR_DAMP_PPM}
                      * {sum_big.format(x=f'r1.r {div} dj.d')})
                      {div} 1000000 AS BIGINT) AS r
          FROM und
          JOIN deg dj ON dj.v = und.u
          JOIN r1 ON r1.v = und.u
          GROUP BY und.v
        )
        SELECT r2.v AS {alias}, deg.d AS degree,
               r1.r AS rank1_ppm, r2.r AS rank2_ppm
        FROM r2
        JOIN r1 ON r1.v = r2.v
        JOIN deg ON deg.v = r2.v
        ORDER BY r2.r DESC, r2.v LIMIT {_TR_TOPK}
    """


def _textrank_oracle() -> str:
    sum_big = "CAST(SUM({x}) AS BIGINT)"
    sql = f"""
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS w
          FROM documents
        ),
        pos AS (
          SELECT doc_id, w,
                 unnest(generate_series(0, len(w) - 2)) AS k
          FROM toks
        ),
        big AS MATERIALIZED (
          SELECT w[k + 1] AS a, w[k + 2] AS b FROM pos
        ),
        {_textrank_sql("//", sum_big)}
    """
    # oracle-only: materialize every CTE (DuckDB re-expands inlined CTE
    # references; und/deg/r1 are each referenced 2-3 times downstream)
    return sql.replace(" AS (", " AS MATERIALIZED (")


@register(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): the "
    "word-adjacency graph (distinct undirected bigram edges over the "
    "corpus) is ranked by two PageRank rounds at damping 0.85 from a "
    "uniform 1e6-ppm seed, ALL in exact bigint ppm arithmetic — "
    "contribution of neighbor j is r_j DIV deg_j (non-negative, so "
    "Spark's truncating DIV and DuckDB's floor // agree), the round "
    "update is 150000 + (850000 * sum) DIV 1e6 — so the trajectory "
    "and the (rank DESC, word) top-15 total order are pure functions "
    "of the data. Scale shape: bigram explode is linear in corpus "
    "tokens, ranking is two hash-aggregate joins keyed on word; no "
    "driver loop, no floats.",
    tags=("text", "graph", "keywords"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("tr_docs")
    sum_big = "SUM({x})"
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, split(trim(text), ' ') AS w FROM tr_docs
        ),
        big AS (
          SELECT element_at(w, CAST(k + 1 AS INT)) AS a,
                 element_at(w, CAST(k + 2 AS INT)) AS b
          FROM toks
          LATERAL VIEW explode(sequence(0, size(w) - 2)) t AS k
        ),
        {_textrank_sql("DIV", sum_big)}
    """
    )


# ------------------------------------------------ Page-Hinkley drift --

_PH_DELTA = 0.0
_PH_LAMBDA = 50.0


def _ph_oracle() -> str:
    mean = "(ph.s + CAST(x.c AS DOUBLE)) / CAST(ph.i + 1 AS DOUBLE)"
    mnew = f"ph.m + (CAST(x.c AS DOUBLE) - ({mean}) - {_PH_DELTA})"
    mmin = f"CASE WHEN ({mnew}) < ph.mmin THEN ({mnew}) ELSE ph.mmin END"
    phv = f"({mnew}) - ({mmin})"
    return f"""
        WITH RECURSIVE daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        idx AS MATERIALIZED (
          SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   - 1 AS i
          FROM daily
        ),
        n AS MATERIALIZED (
          SELECT event_type, MAX(i) + 1 AS mx FROM idx GROUP BY 1
        ),
        ph(event_type, i, s, m, mmin, maxph, alarms, first_alarm) AS (
            SELECT event_type, 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM n
          UNION ALL
            SELECT ph.event_type, ph.i + 1,
                   ph.s + CAST(x.c AS DOUBLE),
                   {mnew},
                   {mmin},
                   CASE WHEN ({phv}) > ph.maxph
                        THEN ({phv}) ELSE ph.maxph END,
                   ph.alarms + CASE WHEN ({phv}) > {_PH_LAMBDA}
                                    THEN 1 ELSE 0 END,
                   CASE WHEN ph.first_alarm = 0
                             AND ({phv}) > {_PH_LAMBDA}
                        THEN ph.i + 1 ELSE ph.first_alarm END
            FROM ph JOIN idx x
              ON x.event_type = ph.event_type AND x.i = ph.i
        )
        SELECT ph.event_type, CAST(n.mx AS BIGINT) AS n_days,
               round(ph.m, 6) AS m_final,
               round(ph.mmin, 6) AS m_min,
               round(ph.maxph, 6) AS max_ph,
               ph.alarms AS n_alarms,
               ph.first_alarm AS first_alarm_t
        FROM ph JOIN n
          ON n.event_type = ph.event_type AND ph.i = n.mx
        ORDER BY ph.event_type
    """


@register(
    "events_page_hinkley",
    oracle=_ph_oracle(),
    doc="Page-Hinkley drift detection over the per-type daily volume "
    "series (the sequential mean-shift test streaming monitors run): "
    "m_t = m_(t-1) + (x_t - mean_t - delta) with mean_t the running "
    "mean INCLUDING x_t, PH_t = m_t - min_(k<=t) m_k, alarm when "
    "PH_t > lambda=50. Both engines replay the IDENTICAL float-op "
    "sequence (Spark: one aggregate() fold; oracle: a recursive CTE "
    "stepping i -> i+1 with the same inlined expressions), so the "
    "trajectory, alarm count and first-alarm index bit-match. delta=0 "
    "keeps the statistic scale-free enough that all three SFs emit "
    "rows (alarms vary by SF, which is the point). Scale shape: the "
    "event-scale work is one (type, day) count; the fold runs over a "
    "30-element series.",
    tags=("events", "stats", "stream"),
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ph")
    daily = spark.sql(
        "SELECT event_type, ts DIV 86400000000000 AS day, COUNT(*) AS c "
        "FROM ev_ph GROUP BY 1, 2"
    )
    return _ph_fold(daily)


def _ph_fold(daily: DataFrame) -> DataFrame:
    """The Page-Hinkley aggregate() fold over a (event_type, day, c)
    relation — shared verbatim by the batch gate and the streaming
    twin so both replay the IDENTICAL float-op sequence."""

    def step(acc, x):
        xc = x["c"].cast("double")
        mean = (acc["s"] + xc) / (acc["i"] + 1).cast("double")
        mnew = acc["m"] + (xc - mean - F.lit(_PH_DELTA))
        mmin = F.when(mnew < acc["mmin"], mnew).otherwise(acc["mmin"])
        phv = mnew - mmin
        return F.struct(
            (acc["i"] + 1).alias("i"),
            (acc["s"] + xc).alias("s"),
            mnew.alias("m"),
            mmin.alias("mmin"),
            F.when(phv > acc["maxph"], phv)
            .otherwise(acc["maxph"])
            .alias("maxph"),
            (
                acc["alarms"]
                + F.when(phv > F.lit(_PH_LAMBDA), 1).otherwise(0)
            ).alias("alarms"),
            F.when(
                (acc["first_alarm"] == 0) & (phv > F.lit(_PH_LAMBDA)),
                acc["i"] + 1,
            )
            .otherwise(acc["first_alarm"])
            .alias("first_alarm"),
        )

    res = daily.groupBy("event_type").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "c"))),
            F.struct(
                F.lit(0).cast("bigint").alias("i"),
                F.lit(0.0).alias("s"),
                F.lit(0.0).alias("m"),
                F.lit(0.0).alias("mmin"),
                F.lit(0.0).alias("maxph"),
                F.lit(0).cast("bigint").alias("alarms"),
                F.lit(0).cast("bigint").alias("first_alarm"),
            ),
            step,
        ).alias("st")
    )
    return res.select(
        "event_type",
        F.col("st.i").cast("bigint").alias("n_days"),
        F.round("st.m", 6).alias("m_final"),
        F.round("st.mmin", 6).alias("m_min"),
        F.round("st.maxph", 6).alias("max_ph"),
        F.col("st.alarms").alias("n_alarms"),
        F.col("st.first_alarm").alias("first_alarm_t"),
    ).orderBy("event_type")


# ------------------------------------------ closeness centrality --

_CLOSE_SEEDS = 3
_CLOSE_HOPS = 4


def _closeness_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    frontiers = []
    for d in range(1, _CLOSE_HOPS + 1):
        prev = ", ".join(f"f{k}" for k in range(d))
        seen = " OR ".join(
            f"EXISTS (SELECT 1 FROM f{k} v WHERE v.src = f{d-1}.src "
            f"AND v.n = e.b)"
            for k in range(d)
        )
        frontiers.append(
            f"""f{d} AS MATERIALIZED (
          SELECT DISTINCT f{d-1}.src, e.b AS n, {d} AS dist
          FROM e JOIN f{d-1} ON e.a = f{d-1}.n
          WHERE NOT ({seen})
        )"""
        )
    levels = "\n          UNION ALL ".join(
        f"SELECT src, n, dist FROM f{d}" for d in range(_CLOSE_HOPS + 1)
    )
    sql = (
        _EDGE_SQL
        + f""",
        nodes AS (SELECT DISTINCT a AS n FROM e),
        seeds AS (SELECT n FROM nodes ORDER BY n LIMIT {_CLOSE_SEEDS}),
        f0 AS (SELECT n AS src, n, 0 AS dist FROM seeds),
        """
        + ",\n        ".join(frontiers)
        + f""",
        lv AS ({levels})
        SELECT src,
               CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
               CAST(SUM(dist) AS BIGINT) AS sum_dist,
               CAST(SUM(CASE WHEN dist > 0
                        THEN 1000000 // dist ELSE 0 END) AS BIGINT)
                 AS harmonic_ppm,
               CAST(CASE WHEN SUM(dist) > 0
                    THEN (COUNT(*) - 1) * 1000000 // SUM(dist)
                    ELSE 0 END AS BIGINT) AS closeness_ppm
        FROM lv GROUP BY src ORDER BY src
    """
    )
    return sql.replace(" AS (", " AS MATERIALIZED (", 1).replace(
        "half AS (", "half AS MATERIALIZED ("
    )


@register(
    "graph_closeness_centrality",
    oracle=_closeness_oracle(),
    doc="Hop-bounded closeness + harmonic centrality on the token "
    "co-occurrence graph, per-source BFS from the 3 smallest nodes "
    "(4 frontier expansions, the graph_bfs_distance shape keyed by "
    "(src, n) so distances stay per-source): classic closeness "
    "(n_reached * 1e6 DIV sum_dist) and harmonic centrality "
    "(sum of 1e6 DIV d — the disconnected-graph-safe variant) both "
    "in exact integer ppm. Spark: per-round frontier equi-join + "
    "visited anti-join with localCheckpoint (lineage stays linear); "
    "oracle: unrolled per-source frontier CTEs with NOT EXISTS "
    "dedup. Scale shape: each round is one shuffle join keyed by "
    "node; the seed set bounds the state to seeds x nodes.",
    tags=("graph", "join", "stats"),
)
def graph_closeness_centrality(
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
    seeds = (
        e.select(F.col("a").alias("n"))
        .distinct()
        .orderBy("n")
        .limit(_CLOSE_SEEDS)
    )
    frontier = (
        seeds.select(F.col("n").alias("src"), "n")
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    visited = frontier
    for d in range(1, _CLOSE_HOPS + 1):
        frontier = (
            e.join(
                frontier.select("src", F.col("n").alias("a")), "a"
            )
            .select("src", F.col("b").alias("n"))
            .distinct()
            .join(visited.select("src", "n"), ["src", "n"], "left_anti")
            .withColumn("dist", F.lit(d))
            .localCheckpoint()
        )
        visited = visited.unionAll(frontier).localCheckpoint()
    return (
        visited.groupBy("src")
        .agg(
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_reached"),
            F.sum("dist").cast("bigint").alias("sum_dist"),
            F.sum(
                F.when(
                    F.col("dist") > 0,
                    F.expr("1000000 DIV dist"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("harmonic_ppm"),
        )
        .select(
            "src",
            "n_reached",
            "sum_dist",
            "harmonic_ppm",
            F.when(
                F.col("sum_dist") > 0,
                F.expr("n_reached * 1000000 DIV sum_dist"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("closeness_ppm"),
        )
        .orderBy("src")
    )


# ------------------------------------------ bloom-AND prefilter join --


@register(
    "join_bloom_and_prefilter",
    oracle="""
        SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                         AS DOUBLE) / 100.0 AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 350000
          AND o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    doc="Bloom-AND runtime prefilter (the round-12 seed composing "
    "sketch_bloom_and_intersection with join_bloom_prefilter): TWO "
    "build-side predicates each hash their o_orderkey sets into k=2 "
    "position sets; the AND of the blooms is the PER-HASH POSITION-SET "
    "INTERSECTION (a key in both sets has its positions in both "
    "bitmaps, so true members of the conjunction can never be "
    "rejected); the probe side drops lineitem rows failing either "
    "intersected membership BEFORE the exact join against the "
    "conjunction build, which removes the bloom's false positives. "
    "Result is exactly the plain two-predicate join (oracle). "
    "Asserted: no SortMergeJoin anywhere — prefilter semis and the "
    "final join all broadcast. The 100-TB shape for a fact-dim join "
    "whose dim predicate is a conjunction from two subsystems: ship "
    "two small bitmaps, intersect for free, scan the fact once.",
    tags=("pipeline", "join", "sketch"),
)
def join_bloom_and_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket
    from icebergsql_spark.plans.registry import load_tables

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li, orders = t["lineitem"], t["orders"]
    build_a = orders.filter(F.col("o_totalprice") > 350000).select(
        F.col("o_orderkey").alias("k")
    )
    build_b = orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(F.col("o_orderkey").alias("k"))
    both = orders.filter(
        (F.col("o_totalprice") > 350000)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select(F.col("o_orderkey").alias("k"))

    def hashes(col):
        return [
            md5_bucket(
                F.concat(F.lit(f"b{i}:"), F.col(col).cast("string")), 65536
            ).alias(f"h{i}")
            for i in (0, 1)
        ]

    # per-hash position sets of each build side; bloom-AND = positionwise
    # intersection (inner join of the distinct position sets)
    bits = []
    for i in (0, 1):
        pa = build_a.select(hashes("k")[i]).distinct()
        pb = build_b.select(hashes("k")[i]).distinct()
        bits.append(pa.join(pb, f"h{i}"))
    probe = li.select("l_orderkey", "l_returnflag", "l_extendedprice")
    pre = probe.select("*", *hashes("l_orderkey"))
    for i in (0, 1):
        pre = pre.join(F.broadcast(bits[i]), f"h{i}", "left_semi")
    out = (
        pre.join(
            F.broadcast(both), pre.l_orderkey == F.col("k"), "left_semi"
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, "bloom-AND prefilter shuffled"
    return out


# ---------------------------------------- image histogram signatures --

_HIST_MAX_DOC = 500


def _pert_blobs(spark: SparkSession, sf_dir: str, max_doc: int):
    """The PERTURBED image fixture shared with dedup_phash_hamming_pairs
    (plans/pipeline13.py): 16 deterministic pixel classes, and
    (doc_id DIV 16) parity brightens the top-left 2x2 gray pixels by
    +96 (base formula runs mod 224 so the perturbed bytes stay in
    range); even docs encode netpbm P6, odd docs 24-bit BMP."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < max_doc)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                pert = (d // 16) % 2 == 1
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 224
                    + (32 if pert and i < 12 else 0)
                    for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.mapInPandas(build, schema="doc_id bigint, payload binary")


def _hist_cte() -> str:
    """Oracle CTE chain replaying the fixture pixels -> integer gray ->
    8-bucket histogram per doc (bucket = gray DIV 96, gray in
    [0, 765])."""
    from icebergsql_spark.plans.pipeline13 import _PHASH_PERT_PIXEL

    pix = _PHASH_PERT_PIXEL.format(i="i.i", div="//")
    hcols = ", ".join(
        f"CAST(SUM(CASE WHEN g // 96 = {k} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS h{k}"
        for k in range(8)
    )
    return f"""
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i, {pix} AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {_HIST_MAX_DOC}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, i // 3 AS p, CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2
        ),
        hist AS MATERIALIZED (
          SELECT doc_id, {hcols} FROM gray GROUP BY doc_id
        )"""


@register(
    "multimodal_image_histogram",
    oracle=f"""
        WITH {_hist_cte()}
        SELECT h0, h1, h2, h3, h4, h5, h6, h7,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM hist
        GROUP BY h0, h1, h2, h3, h4, h5, h6, h7
        ORDER BY min_doc
    """,
    doc="Per-image 8-bucket luminance histograms over REAL decoded "
    "bytes (netpbm P6 / 24-bit BMP alternating per doc): gray = "
    "channel sum in [0, 765], bucket = gray DIV 96, exact integer "
    "counts — the cheap content signature a 100-TB image corpus "
    "computes in one Arrow-batched narrow map for dedup prefilters "
    "and quality audits. Identical pixel classes collapse to one "
    "signature regardless of container format (the decode-parity "
    "check); each perturbed variant sits at exactly L1=8 from its "
    "base (+96 gray = exactly one bucket hop for 4 pixels) — but the "
    "32 planted (class, variant) combos collapse to only 26 "
    "signatures, because the fixture's near-uniform gradients make "
    "unrelated classes histogram-collide: the measured coarseness "
    "that motivates the L1 tier-eval gate. Oracle replays the "
    "fixture's pixel formula in SQL.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_histogram

    hist = image_gray_histogram(_pert_blobs(spark, sf_dir, _HIST_MAX_DOC))
    return (
        hist.groupBy(*[f"h{k}" for k in range(8)])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("min_doc")
    )


_HIST_L1_MAX = 8


@register(
    "dedup_image_histogram_l1",
    oracle=f"""
        WITH {_hist_cte()},
        classes AS MATERIALIZED (
          SELECT h0, h1, h2, h3, h4, h5, h6, h7,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hist
          GROUP BY h0, h1, h2, h3, h4, h5, h6, h7
        )
        SELECT a.rep AS rep_a, b.rep AS rep_b,
               CAST(abs(a.h0 - b.h0) + abs(a.h1 - b.h1)
                    + abs(a.h2 - b.h2) + abs(a.h3 - b.h3)
                    + abs(a.h4 - b.h4) + abs(a.h5 - b.h5)
                    + abs(a.h6 - b.h6) + abs(a.h7 - b.h7) AS BIGINT)
                 AS l1,
               a.n_docs * b.n_docs AS n_pairs
        FROM classes a JOIN classes b ON a.rep < b.rep
        WHERE abs(a.h0 - b.h0) + abs(a.h1 - b.h1)
              + abs(a.h2 - b.h2) + abs(a.h3 - b.h3)
              + abs(a.h4 - b.h4) + abs(a.h5 - b.h5)
              + abs(a.h6 - b.h6) + abs(a.h7 - b.h7) <= {_HIST_L1_MAX}
        ORDER BY l1, rep_a, rep_b
    """,
    doc="Histogram-L1 candidate pairs — an honest TIER EVAL of the "
    "luminance-histogram prefilter: per-signature CLASSES (never "
    "doc x doc) are cross-scored by exact integer L1 distance over "
    "the 8 buckets. A local k-pixel edit moves at most 2k of L1 mass "
    "(every planted 2x2-corner variant lands at exactly L1=8 from "
    "its base), but the fixture's near-uniform gradients ALSO pull "
    "unrelated classes under the threshold — the emitted pair list "
    "pins that recall/precision trade, which is WHY a histogram "
    "prefilter always feeds an exact verify stage (the pHash/aHash "
    "tiers above it). The class rollup bounds the pair matrix at "
    "(distinct signatures)^2 — at 100 TB the signature cardinality, "
    "not the corpus, drives the join. Oracle replays pixels -> "
    "histograms -> the same class pairing.",
    tags=("multimodal", "dedup"),
)
def dedup_image_histogram_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_histogram

    hist = image_gray_histogram(_pert_blobs(spark, sf_dir, _HIST_MAX_DOC))
    classes = (
        hist.groupBy(*[f"h{k}" for k in range(8)])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep"),
        )
        .localCheckpoint()
    )
    a = classes.select(
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(8)],
        F.col("n_docs").alias("na"),
        F.col("rep").alias("rep_a"),
    )
    b = classes.select(
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(8)],
        F.col("n_docs").alias("nb"),
        F.col("rep").alias("rep_b"),
    )
    l1 = sum(
        F.abs(F.col(f"a{k}") - F.col(f"b{k}")) for k in range(8)
    )
    return (
        a.join(b, F.col("rep_a") < F.col("rep_b"))
        .select(
            "rep_a",
            "rep_b",
            l1.cast("bigint").alias("l1"),
            (F.col("na") * F.col("nb")).cast("bigint").alias("n_pairs"),
        )
        .filter(F.col("l1") <= _HIST_L1_MAX)
        .orderBy("l1", "rep_a", "rep_b")
    )


# ---------------------------------------- image gradient quality --

_GRAD_THRESH = 100


@register(
    "multimodal_image_gradients",
    oracle=f"""
        WITH {_hist_cte()},
        dx AS (
          SELECT a.doc_id, abs(a.g - b.g) AS d
          FROM gray a JOIN gray b
            ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND a.p % 16 < 15
        ),
        dy AS (
          SELECT a.doc_id, abs(a.g - b.g) AS d
          FROM gray a JOIN gray b
            ON b.doc_id = a.doc_id AND b.p = a.p + 16
        ),
        per_doc AS MATERIALIZED (
          SELECT doc_id, CAST(SUM(d) AS BIGINT) AS tv,
                 CAST(SUM(CASE WHEN d >= {_GRAD_THRESH} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_edges,
                 CAST(COUNT(*) AS BIGINT) AS n_grads
          FROM (SELECT * FROM dx UNION ALL SELECT * FROM dy)
          GROUP BY doc_id
        )
        SELECT tv, n_edges, n_grads,
               CAST(n_edges * 1000000 // n_grads AS BIGINT) AS edge_ppm,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM per_doc
        GROUP BY tv, n_edges, n_grads
        ORDER BY min_doc
    """,
    doc="Image gradient quality scores over REAL decoded bytes: per "
    "image the exact total variation (sum of |adjacent gray diff|, "
    "horizontal + vertical), the count of strong edges "
    "(|d| >= 100 on the [0,765] gray scale) and the edge density in "
    "integer ppm — the blur/flatness keep-drop signal an image "
    "curation pipeline computes per shard in one narrow map (a "
    "near-uniform image scores tv ~ 0). Signature rollup per "
    "(tv, n_edges) class pins every pixel: one wrong byte anywhere "
    "moves tv. Oracle replays the pixel formula with positional "
    "self-joins.",
    tags=("multimodal", "curation"),
)
def multimodal_image_gradients(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gradient_stats

    stats = image_gradient_stats(
        _pert_blobs(spark, sf_dir, _HIST_MAX_DOC), thresh=_GRAD_THRESH
    )
    return (
        stats.groupBy("tv", "n_edges", "n_grads")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .select(
            "tv",
            "n_edges",
            "n_grads",
            F.expr("n_edges * 1000000 DIV n_grads")
            .cast("bigint")
            .alias("edge_ppm"),
            "n_docs",
            "min_doc",
        )
        .orderBy("min_doc")
    )


# --------------------------------------- streaming Page-Hinkley twin --


@register(
    "events_stream_page_hinkley",
    oracle=_ph_oracle(),
    doc="STREAMING twin of events_page_hinkley: 3 chronological "
    "micro-batches append per-(type, day) count PARTIALS to a parquet "
    "sink (sum-mergeable — batch chopping and replay cannot change "
    "the merged daily totals), and the finalizer rebuilds the daily "
    "series and runs the IDENTICAL aggregate() fold (_ph_fold, shared "
    "verbatim), so the drift trajectory bit-matches the batch oracle. "
    "The always-on drift monitor shape: per-batch state is one row "
    "per active (type, day), never event volume.",
    tags=("events", "streaming", "stats"),
)
def events_stream_page_hinkley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sphsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-sphout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.groupBy(
                "event_type", F.expr("ts DIV 86400000000000").alias("day")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-sphck-")
    daily = (
        spark.read.parquet(out)
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    return _ph_fold(daily)


# --------------------------------------- streaming sliding bloom twin --


def _stream_bloom_oracle() -> str:
    from icebergsql_spark.plans.registry import REGISTRY

    return REGISTRY["sketch_bloom_sliding"].oracle


@register(
    "sketch_stream_bloom_sliding",
    oracle=_stream_bloom_oracle(),
    doc="STREAMING twin of sketch_bloom_sliding — the fourth "
    "mergeable-through-time sketch pairing (HLL merges by MAX, CMS by "
    "SUM, KMV by set-union, Bloom by OR): each of 3 chronological "
    "micro-batches appends its per-day bloom bitmap WORDS "
    "(day, word_idx, bits) to a parquet sink, plus distinct "
    "(day, user) markers for the exact audit column and per-user "
    "count partials for probe selection; the finalizer ORs the bitmap "
    "partials per (day, word_idx) — bitwise OR is idempotent and "
    "commutative, so batch chopping and replay cannot change the "
    "merged filter — and runs the IDENTICAL window/probe tail "
    "(_bloom_sliding_result, shared verbatim with the batch gate). "
    "Per-batch streaming state is <=128 bitmap words per active day "
    "regardless of user cardinality: exactly what an always-on "
    "membership monitor ships at 100 TB.",
    tags=("sketch", "bloom", "window", "streaming"),
)
def sketch_stream_bloom_sliding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline12 import (
        _bloom_daily_bits,
        _bloom_sliding_result,
    )
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sblsrc-")
    bits_out = tempfile.mkdtemp(prefix="icebergsql-sblbits-")
    du_out = tempfile.mkdtemp(prefix="icebergsql-sbldu-")
    cnt_out = tempfile.mkdtemp(prefix="icebergsql-sblcnt-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        b = batch_df.select(
            "user_id", F.expr("ts DIV 86400000000000").alias("day")
        )
        du_b = b.distinct()
        _bloom_daily_bits(du_b).write.mode("append").parquet(bits_out)
        du_b.write.mode("append").parquet(du_out)
        b.groupBy("user_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        ).write.mode("append").parquet(cnt_out)

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-sblck-")
    daily = (
        spark.read.parquet(bits_out)
        .groupBy("day", "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    du = spark.read.parquet(du_out).distinct()
    ucnt = (
        spark.read.parquet(cnt_out)
        .groupBy("user_id")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    return _bloom_sliding_result(daily, du, ucnt)


# ------------------------------------------------ audio tone detection --

_TONE_MAX_DOC = 500
_TONE_N = 64
_TONE_BINS = (4, 8, 16)
_TONE_AMP = 1024


def _tone_top_bin_sql(p4: str, p8: str, p16: str) -> str:
    return (
        f"CASE WHEN {p4} >= {p8} AND {p4} >= {p16} THEN 4 "
        f"WHEN {p8} >= {p16} THEN 8 ELSE 16 END"
    )


def _tone_oracle() -> str:
    from icebergsql_spark.operators.multimodal import dft_coef_values_sql

    half_p = "CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END"
    pcols = ", ".join(
        f"CAST(MAX(CASE WHEN k = {k} THEN re * re + im * im END)"
        f" AS BIGINT) AS p{k}"
        for k in _TONE_BINS
    )
    return f"""
        WITH coef(k, i, cq, sq) AS (
          VALUES {dft_coef_values_sql(_TONE_N, _TONE_BINS)}
        ),
        samp AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 CASE WHEN ((i.i // ({half_p})) % 2) = 0
                      THEN {_TONE_AMP} ELSE -{_TONE_AMP} END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_TONE_N - 1}))
                      AS i) i
          WHERE doc_id < {_TONE_MAX_DOC}
        ),
        pw AS MATERIALIZED (
          SELECT samp.doc_id, coef.k,
                 CAST(SUM(samp.s * coef.cq) AS BIGINT) AS re,
                 CAST(SUM(samp.s * coef.sq) AS BIGINT) AS im
          FROM samp JOIN coef ON coef.i = samp.i
          GROUP BY 1, 2
        ),
        per_doc AS MATERIALIZED (
          SELECT doc_id, {pcols} FROM pw GROUP BY doc_id
        )
        SELECT p4, p8, p16,
               CAST({_tone_top_bin_sql('p4', 'p8', 'p16')} AS INTEGER)
                 AS top_bin,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM per_doc
        GROUP BY p4, p8, p16
        ORDER BY min_doc
    """


@register(
    "multimodal_audio_tone",
    oracle=_tone_oracle(),
    doc="Tone detection by EXACT integer DFT over REAL WAV payloads "
    "(the dct_int_coefs discipline applied to audio): each doc plants "
    "a square wave of period 4/8/16 samples by class; the quantized "
    "cos/sin basis (trig computed ONCE on the driver, identical "
    "literals in both engines) scores DFT power re^2 + im^2 at probe "
    "bins 16/8/4 of a 64-sample frame in pure int64 — the planted "
    "fundamental dominates and top_bin recovers every class. The "
    "DTMF/beep/watermark detector a media-curation pipeline runs per "
    "shard: decode + one integer matmul per frame, no FFT library, "
    "no floats. Oracle replays samples from the class formula against "
    "the same VALUES coefficients.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_tone(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _TONE_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                half_p = (2, 4, 8)[int(d) % 3]
                samples = [
                    _TONE_AMP if (i // half_p) % 2 == 0 else -_TONE_AMP
                    for i in range(_TONE_N)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    powers = multimodal.audio_tone_powers(
        blobs, n=_TONE_N, bins=_TONE_BINS
    )
    per_doc = powers.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(F.col("bin") == k, F.col("power"))
            ).cast("bigint").alias(f"p{k}")
            for k in _TONE_BINS
        ]
    )
    return (
        per_doc.groupBy("p4", "p8", "p16")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .select(
            "p4",
            "p8",
            "p16",
            F.expr(_tone_top_bin_sql("p4", "p8", "p16"))
            .cast("int")
            .alias("top_bin"),
            "n_docs",
            "min_doc",
        )
        .orderBy("min_doc")
    )


# --------------------------------------- binary-segmentation splits --

_BINSEG_SQL = """
        WITH ev AS (
          SELECT {day_expr} AS day, event_type FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev WHERE event_type = 'purchase' GROUP BY day
        ),
        cum AS (
          SELECT day,
                 CAST(SUM(x) OVER (ORDER BY day) AS BIGINT) AS s_k,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
          FROM daily
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS t
          FROM daily
        ),
        lvl1 AS (
          SELECT k, day FROM (
            SELECT cum.k, cum.day,
                   row_number() OVER (
                     ORDER BY abs(tot.n * cum.s_k - cum.k * tot.t)
                       DESC, cum.day ASC
                   ) AS rn
            FROM cum CROSS JOIN tot WHERE cum.k < tot.n
          ) z WHERE rn = 1
        ),
        segs AS (
            SELECT CAST(1 AS BIGINT) AS lv,
                   CAST(1 AS BIGINT) AS lo, tot.n AS hi
            FROM tot
          UNION ALL
            SELECT CAST(2 AS BIGINT), CAST(1 AS BIGINT), lvl1.k
            FROM lvl1
          UNION ALL
            SELECT CAST(2 AS BIGINT), lvl1.k + 1, tot.n
            FROM lvl1 CROSS JOIN tot
        ),
        base AS (
          SELECT segs.lv, segs.lo, segs.hi,
                 CAST(COALESCE(lo_c.s_k, 0) AS BIGINT) AS s_lo,
                 CAST(hi_c.s_k - COALESCE(lo_c.s_k, 0) AS BIGINT) AS t_s
          FROM segs
          LEFT JOIN cum lo_c ON lo_c.k = segs.lo - 1
          JOIN cum hi_c ON hi_c.k = segs.hi
        ),
        dev AS (
          SELECT base.lv, base.lo, base.hi, cum.k, cum.day,
                 CAST(base.hi - base.lo + 1 AS BIGINT) AS n_seg,
                 CAST(cum.s_k - base.s_lo AS BIGINT) AS pre_sum,
                 CAST(base.t_s - (cum.s_k - base.s_lo) AS BIGINT)
                   AS post_sum,
                 CAST(abs((base.hi - base.lo + 1)
                          * (cum.s_k - base.s_lo)
                          - (cum.k - base.lo + 1) * base.t_s)
                      AS BIGINT) AS dev_num
          FROM base JOIN cum
            ON cum.k >= base.lo AND cum.k < base.hi
        ),
        best AS (
          SELECT * FROM (
            SELECT dev.*,
                   row_number() OVER (
                     PARTITION BY lv, lo
                     ORDER BY dev_num DESC, day ASC
                   ) AS rn
            FROM dev
          ) z WHERE rn = 1
        )
        SELECT lv AS level, lo AS seg_lo, hi AS seg_hi, n_seg,
               k AS split_k, CAST(day AS BIGINT) AS split_day,
               dev_num, pre_sum, post_sum
        FROM best
        ORDER BY lv, lo
"""


@register(
    "events_binseg_changepoints",
    oracle=_BINSEG_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Two-level BINARY SEGMENTATION over the daily purchase series "
    "(the hierarchical changepoint detector events_cusum_split is "
    "step one of): level 1 finds the global CUSUM max-deviation "
    "split; level 2 re-runs the identical rule INSIDE each resulting "
    "half using segment-local sums derived algebraically from the ONE "
    "global cumulative-sum window (n_s*S_seg - k_s*T_s — exact "
    "bigints, no per-segment rescan, no driver recursion). Emits the "
    "three (level, segment) best splits with exact pre/post sums. "
    "Scale shape: one daily rollup + one window + a 3-row segment "
    "join; depth-d segmentation is d chained CTEs over the same "
    "cumulative relation.",
    tags=("events", "stats"),
)
def events_binseg_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_binseg")
    return spark.sql(
        _BINSEG_SQL.format(day_expr="ts DIV 86400000000000", src="ev_binseg")
    )


# --------------------------------------------- weekly spectrum (DFT) --

_SPEC_N = 28
_SPEC_BINS = (1, 2, 4)  # periods 28 / 14 / 7 days
_SPEC_SCALE = 4096


def _spectrum_sql(day_expr: str, src: str, div: str = "DIV") -> str:
    """Shared (engine-identical) SQL: per event type, integer DFT of
    the first 28 daily counts at the period-28/14/7 bins from the
    driver-quantized VALUES basis.

    ``div`` is the integer-division spelling (Spark ``DIV``, DuckDB
    ``//``) — threaded as a placeholder so oracle derivation never
    needs a blanket string replace over the composed SQL (r13 ADVICE:
    a post-hoc ``.replace(" DIV ", " // ")`` would silently rewrite
    any future DIV added to a shared template, including in literals).
    """
    from icebergsql_spark.operators.multimodal import dft_coef_values_sql

    return f"""
        WITH coef (k, i, cq, sq) AS (
          VALUES {dft_coef_values_sql(_SPEC_N, _SPEC_BINS, _SPEC_SCALE)}
        ),
        ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
        idx AS (
          SELECT event_type, x,
                 CAST(ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY day
                 ) - 1 AS BIGINT) AS i
          FROM daily
        ),
        pw AS (
          SELECT idx.event_type, coef.k,
                 CAST(SUM(idx.x * coef.cq) AS BIGINT) AS re_q,
                 CAST(SUM(idx.x * coef.sq) AS BIGINT) AS im_q
          FROM idx JOIN coef ON coef.i = idx.i
          WHERE idx.i < {_SPEC_N}
          GROUP BY 1, 2
        )
        SELECT event_type, CAST(k AS INTEGER) AS bin,
               CAST({_SPEC_N} {div} k AS BIGINT) AS period_days,
               re_q, im_q,
               CAST(re_q * re_q + im_q * im_q AS BIGINT) AS power
        FROM pw
        ORDER BY event_type, bin
    """


@register(
    "events_weekly_spectrum",
    oracle=_spectrum_sql(
        "epoch_ns(ts) // 86400000000000", "events", div="//"
    ),
    doc="Weekly/biweekly/monthly spectral signature of the per-type "
    "daily volume series by EXACT integer DFT (the dft_int_coefs "
    "basis shared with multimodal_audio_tone, trig quantized ONCE on "
    "the driver): bins 1/2/4 of a 28-day window = periods 28/14/7 "
    "days; re/im/power are pure int64 sums, so the seasonality "
    "strength ranking is a pure function of the data — the "
    "capacity-planning complement to events_haar_energy (which bins "
    "by dyadic scale, not by calendar period). Scale shape: one "
    "(type, day) count, then a 28-row-per-type join against an "
    "84-row VALUES basis.",
    tags=("events", "forecast", "stats"),
)
def events_weekly_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_spec")
    return spark.sql(_spectrum_sql("ts DIV 86400000000000", "ev_spec"))


# --------------------------------------- signbit LSH recall sweep --

_SWEEP_BITS = (4, 6, 8)
_SWEEP_Q = 7
_SWEEP_K = 10

_SWEEP_COS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> b.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)))
"""


def _sweep_bucket(nbits: int, t: str) -> str:
    return (
        "("
        + " + ".join(
            f"CASE WHEN {t}.embedding[{i + 1}] >= 0 THEN {2 ** i}"
            " ELSE 0 END"
            for i in range(nbits)
        )
        + ")"
    )


def _sweep_oracle() -> str:
    per_bits = []
    for nb in _SWEEP_BITS:
        per_bits.append(f"""
        SELECT {nb} AS bits,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(COALESCE(SUM(CASE WHEN t.vec_id IS NULL
                                  THEN 0 ELSE 1 END), 0)
                    AS BIGINT) AS n_hits
        FROM embeddings b
        CROSS JOIN (SELECT embedding FROM embeddings
                    WHERE vec_id = {_SWEEP_Q}) q
        LEFT JOIN top{_SWEEP_K} t ON t.vec_id = b.vec_id
        WHERE b.vec_id != {_SWEEP_Q}
          AND {_sweep_bucket(nb, 'b')} = (
            SELECT {_sweep_bucket(nb, 'qq')} FROM embeddings qq
            WHERE qq.vec_id = {_SWEEP_Q})""")
    body = "\n        UNION ALL\n".join(per_bits)
    return f"""
        WITH top{_SWEEP_K} AS MATERIALIZED (
          SELECT b.vec_id
          FROM embeddings b
          CROSS JOIN (SELECT embedding FROM embeddings
                      WHERE vec_id = {_SWEEP_Q}) q
          WHERE b.vec_id != {_SWEEP_Q}
          ORDER BY {_SWEEP_COS} DESC, b.vec_id
          LIMIT {_SWEEP_K}
        )
        SELECT bits, n_candidates, n_hits,
               CAST(n_hits * 1000000 // {_SWEEP_K} AS BIGINT)
                 AS recall_ppm
        FROM ({body})
        ORDER BY bits
    """


@register(
    "emb_signbit_band_sweep",
    oracle=_sweep_oracle(),
    doc="Sign-bit LSH precision knob swept end-to-end (the embedding "
    "sibling of dedup_lsh_band_sweep): for 4/6/8 leading-dim sign "
    "bits, how many vectors share the query's bucket (scan volume) "
    "and how many of the EXACT cosine top-10 are among them (recall) "
    "— the recall-vs-candidates curve that picks the bucket width "
    "before anyone ships an ANN index. Counts are exact integers; the "
    "top-10 set comes from the same sequential-fold cosine both "
    "engines replay. Scale shape: each sweep point is one broadcast "
    "scalar (the query bucket) + one bucket-pruned scan; the exact "
    "top-k baseline is the one all-pairs pass, amortized across the "
    "sweep.",
    tags=("embedding", "ann", "dedup"),
)
def emb_signbit_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from icebergsql_spark.operators import similarity
    from icebergsql_spark.plans.registry import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    top = (
        similarity.brute_force_topk(emb, query_id=_SWEEP_Q, k=_SWEEP_K)
        .select("vec_id")
        .withColumn("is_top", F.lit(1))
        .localCheckpoint()
    )
    parts = []
    for nb in _SWEEP_BITS:
        bucket = F.expr(_sweep_bucket(nb, "e").replace("e.embedding[", "element_at(embedding, ").replace("]", ")"))
        bucketed = emb.select("vec_id", bucket.alias("bucket"))
        qb = bucketed.filter(F.col("vec_id") == _SWEEP_Q).select(
            F.col("bucket").alias("qbucket")
        )
        cand = (
            bucketed.filter(F.col("vec_id") != _SWEEP_Q)
            .crossJoin(F.broadcast(qb))
            .filter(F.col("bucket") == F.col("qbucket"))
        )
        parts.append(
            cand.join(F.broadcast(top), "vec_id", "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
                F.coalesce(
                    F.sum(F.coalesce(F.col("is_top"), F.lit(0))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_hits"),
            )
            .select(
                F.lit(nb).alias("bits"), "n_candidates", "n_hits"
            )
        )
    return (
        reduce(lambda x, y: x.unionAll(y), parts)
        .select(
            "bits",
            "n_candidates",
            "n_hits",
            F.expr(f"n_hits * 1000000 DIV {_SWEEP_K}")
            .cast("bigint")
            .alias("recall_ppm"),
        )
        .orderBy("bits")
    )


# --------------------------------------- dedup-aware sampling --

_DSAMP_T = 100
_DSAMP_KEY = "substr(text, 1, 32)"


@register(
    "curation_dedup_aware_sample",
    oracle=f"""
        WITH clus AS MATERIALIZED (
          SELECT {_DSAMP_KEY} AS ck, CAST(MIN(doc_id) AS BIGINT) AS rep,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM documents GROUP BY 1
        ),
        naive AS MATERIALIZED (
          SELECT doc_id FROM (
            SELECT doc_id, row_number() OVER (
              ORDER BY md5('ds:' || CAST(doc_id AS VARCHAR)), doc_id
            ) AS rk FROM documents
          ) z WHERE rk <= {_DSAMP_T}
        ),
        dedup AS MATERIALIZED (
          SELECT rep FROM (
            SELECT rep, row_number() OVER (
              ORDER BY md5('ds:' || CAST(rep AS VARCHAR)), rep
            ) AS rk FROM clus
          ) z WHERE rk <= {_DSAMP_T}
        ),
        src AS MATERIALIZED (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT {_DSAMP_KEY}) AS BIGINT)
                   AS n_clusters
          FROM documents GROUP BY source
        ),
        nsrc AS (
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS naive_n
          FROM naive JOIN documents d ON d.doc_id = naive.doc_id
          GROUP BY 1
        ),
        dsrc AS (
          SELECT d.source, CAST(COUNT(*) AS BIGINT) AS dedup_n
          FROM dedup JOIN documents d ON d.doc_id = dedup.rep
          GROUP BY 1
        )
        SELECT src.source, src.n_docs, src.n_clusters,
               CAST(COALESCE(nsrc.naive_n, 0) AS BIGINT) AS naive_n,
               CAST(COALESCE(dsrc.dedup_n, 0) AS BIGINT) AS dedup_n
        FROM src
        LEFT JOIN nsrc ON nsrc.source = src.source
        LEFT JOIN dsrc ON dsrc.source = src.source
        ORDER BY src.source
    """,
    doc="Dedup-aware corpus sampling (the training-mix step after "
    "near-dup clustering: sample CLUSTERS, not documents, or "
    "boilerplate-heavy sources are over-represented): documents "
    "cluster by a 32-char prefix fingerprint (min-doc rep); a naive "
    "seeded-md5 sample of 100 DOCS and a dedup-aware sample of 100 "
    "CLUSTER REPS are rolled up per source side by side — sources "
    "whose docs share prefixes lose mass under the cluster sample, "
    "which is the bias being corrected. Fully deterministic (seeded "
    "md5 ranks), exact counts. Scale shape: one fingerprint groupBy, "
    "two rank windows, broadcast-sized sample joins.",
    tags=("curation", "dedup", "stats"),
)
def curation_dedup_aware_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ck = F.expr(_DSAMP_KEY)
    clus = docs.groupBy(ck.alias("ck")).agg(
        F.min("doc_id").cast("bigint").alias("rep"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    naive = (
        docs.select("doc_id")
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(
                    F.md5(F.concat(F.lit("ds:"),
                                   F.col("doc_id").cast("string"))),
                    "doc_id",
                )
            ),
        )
        .filter(F.col("rk") <= _DSAMP_T)
        .select("doc_id")
    )
    dedup_s = (
        clus.select("rep")
        .withColumn(
            "rk",
            F.row_number().over(
                W.orderBy(
                    F.md5(F.concat(F.lit("ds:"),
                                   F.col("rep").cast("string"))),
                    "rep",
                )
            ),
        )
        .filter(F.col("rk") <= _DSAMP_T)
        .select(F.col("rep").alias("doc_id"))
    )
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(ck).cast("bigint").alias("n_clusters"),
    )
    nsrc = (
        naive.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("naive_n"))
    )
    dsrc = (
        dedup_s.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dedup_n"))
    )
    return (
        src.join(nsrc, "source", "left")
        .join(dsrc, "source", "left")
        .select(
            "source",
            "n_docs",
            "n_clusters",
            F.coalesce("naive_n", F.lit(0)).cast("bigint").alias("naive_n"),
            F.coalesce("dedup_n", F.lit(0)).cast("bigint").alias("dedup_n"),
        )
        .orderBy("source")
    )


# --------------------------------------- cherry-pick audit scenario --


@register(
    "managed_cherrypick_audit",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="Cherry-pick after rollback, audited end-to-end (the undo/redo "
    "runbook of snapshot-based tables): wave 1 (keys % 3 != 0) and "
    "wave 2 (keys % 3 = 0) land as separate snapshots; CALL "
    "system.rollback_to_snapshot rewinds main to wave 1 (asserted: "
    "wave-2 rows gone); CALL system.cherrypick_snapshot re-applies "
    "wave 2's files as a NEW commit (cherry-picked files belong to "
    "the source snapshot, so cleanup-on-failure must not delete them "
    "— the round-4 invariant this gate re-exercises through SQL). "
    "Final per-year rollup equals the full raw-orders oracle, and "
    "$history grew by both the rollback and the pick. Scale shape: "
    "all metadata ops; the only data pass is the final rollup.",
    tags=("managed", "lineage", "maintenance"),
)
def managed_cherrypick_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.plans.registry import load_tables
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-cpk-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    t = eng.catalog.create_table("ord_cpk", ddl, ["o_year"])
    n_all = orders.count()
    t.insert(nonempty(orders.filter(F.col("o_orderkey") % 3 != 0)))
    t.refresh()
    wave1 = t.meta.current_snapshot().snapshot_id
    n_wave1 = t.scan().count_from_stats()
    t.insert(nonempty(orders.filter(F.col("o_orderkey") % 3 == 0)))
    t.refresh()
    wave2 = t.meta.current_snapshot().snapshot_id
    assert t.scan().count_from_stats() == n_all
    mark_setup_done()  # fixture built; rollback + cherry-pick is the op
    eng.sql(
        f"CALL system.rollback_to_snapshot(table => 'ord_cpk',"
        f" snapshot_id => {wave1})"
    )
    t.refresh()
    assert t.scan().count_from_stats() == n_wave1, "rollback lost rows"
    eng.sql(
        f"CALL system.cherrypick_snapshot(table => 'ord_cpk',"
        f" snapshot_id => {wave2})"
    )
    t.refresh()
    assert t.scan().count_from_stats() == n_all, "cherry-pick incomplete"
    hist = eng.sql(
        "SELECT COUNT(*) AS n,"
        " SUM(CASE WHEN is_current_ancestor THEN 0 ELSE 1 END)"
        " AS orphans FROM `ord_cpk$history`"
    ).collect()
    # wave1 + the rolled-back wave2 (off the current ancestry) + the
    # cherry-picked head
    assert hist[0]["n"] >= 3, "history must keep all three snapshots"
    assert hist[0]["orphans"] == 1, "rollback must orphan exactly wave2"
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_cpk GROUP BY o_year ORDER BY o_year"
    )


# --------------------------------------------- uplift decile table --

# The decile tail is shared verbatim with the streaming twin
# (plans/pipeline18.py::events_stream_uplift_deciles), whose finalizer
# supplies its own per_user relation from merged per-user partials.
_UPLIFT_TAIL_SQL = """
        ranked AS (
          SELECT per_user.*,
                 CAST(row_number() OVER (ORDER BY x DESC, user_id)
                      AS BIGINT) AS rk,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM per_user) AS n
          FROM per_user
        ),
        dec AS (
          SELECT CAST((rk - 1) * 10 {div} n AS BIGINT) AS decile,
                 arm, x, y
          FROM ranked
        ),
        cells AS (
          SELECT decile,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_t,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_c,
                 CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END)
                      AS BIGINT) AS y_t,
                 CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END)
                      AS BIGINT) AS y_c
          FROM dec GROUP BY decile
        )
        SELECT decile, n_t, n_c, y_t, y_c,
               CASE WHEN n_t > 0 AND n_c > 0
                    THEN CAST(y_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                         - CAST(y_c AS DOUBLE) / CAST(n_c AS DOUBLE)
               END AS uplift,
               CAST(SUM(y_t) OVER w AS BIGINT) AS cum_y_t,
               CAST(SUM(y_c) OVER w AS BIGINT) AS cum_y_c,
               CAST(SUM(n_t) OVER w AS BIGINT) AS cum_n_t,
               CAST(SUM(n_c) OVER w AS BIGINT) AS cum_n_c
        FROM cells
        WINDOW w AS (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY decile
"""

_UPLIFT_SQL = (
    """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(SUM(CASE WHEN ev.event_type = 'purchase'
                               AND ev.day < d0.d + 10
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ev.event_type = 'purchase'
                               AND ev.day >= d0.d + 10
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
"""
    + _UPLIFT_TAIL_SQL
)


@register(
    "events_uplift_deciles",
    oracle=_UPLIFT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Uplift-by-decile (Qini-style) A/B table: users rank by their "
    "pre-period purchase count (first 10 days; total order via "
    "(x DESC, user_id)), split into 10 arithmetic deciles "
    "((rk-1)*10 DIV n — not ntile, whose remainder placement is an "
    "engine detail), and per decile the treatment/control post-period "
    "outcome sums are exact bigints with the mirrored float uplift "
    "and running cumulative cells for the Qini curve. The "
    "heterogeneous-treatment-effect readout every experimentation "
    "platform ships next to the pooled z-test. Scale shape: one "
    "per-user rollup, one rank window, one 10-row aggregate.",
    tags=("events", "stats"),
)
def events_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_uplift")
    return spark.sql(
        _UPLIFT_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_uplift", div="DIV"
        )
    )


# --------------------------------------------- boilerplate shingles --

_BOIL_N = 2  # words per shingle
_BOIL_PCT = 10  # keep shingles present in >= source_docs / 10 documents
_BOIL_TOPK = 50


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, source, string_split(trim(text), ' ') AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, source, t,
                 unnest(generate_series(1, len(t) - {_BOIL_N - 1})) AS p
          FROM toks WHERE len(t) >= {_BOIL_N}
        ),
        sh AS MATERIALIZED (
          SELECT DISTINCT doc_id, source,
                 array_to_string(t[p:p + {_BOIL_N - 1}], ' ') AS shingle
          FROM pos
        ),
        srcn AS MATERIALIZED (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS source_docs
          FROM documents GROUP BY source
        ),
        df AS (
          SELECT sh.source, sh.shingle,
                 CAST(COUNT(*) AS BIGINT) AS df
          FROM sh GROUP BY 1, 2
        )
        SELECT df.source, df.shingle, df.df, srcn.source_docs,
               CAST(df.df * 1000000 // srcn.source_docs AS BIGINT)
                 AS df_ppm
        FROM df JOIN srcn ON srcn.source = df.source
        WHERE df.df * {_BOIL_PCT} >= srcn.source_docs
        ORDER BY df_ppm DESC, df.source, df.shingle LIMIT {_BOIL_TOPK}
    """,
    doc="Per-source boilerplate n-gram detection (the C4/RefinedWeb "
    f"cleanup pass: a word {_BOIL_N}-gram shared by >={100 // _BOIL_PCT}% "
    "of a source's documents is template text, not content): distinct "
    f"per-doc word {_BOIL_N}-gram "
    "shingles, document frequency per (source, shingle), the "
    "threshold band emitted with exact df and integer-ppm rates. "
    "What a crawl-curation pipeline subtracts before quality scoring "
    "— and the shingle DF rollup is the same shape minhash dedup "
    "already shuffles, so it rides along at 100 TB. Exact integers "
    "end-to-end.",
    tags=("text", "curation", "dedup"),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("boil_docs")
    return spark.sql(f"""
        WITH toks AS (
          SELECT doc_id, source, split(trim(text), ' ') AS t
          FROM boil_docs
        ),
        sh AS (
          SELECT DISTINCT doc_id, source, shingle
          FROM toks
          LATERAL VIEW explode(
            transform(sequence(1, size(t) - {_BOIL_N - 1}),
                      i -> concat_ws(' ', slice(t, i, {_BOIL_N})))
          ) x AS shingle
          WHERE size(t) >= {_BOIL_N}
        ),
        srcn AS (
          SELECT source, COUNT(*) AS source_docs
          FROM boil_docs GROUP BY source
        ),
        df AS (
          SELECT source, shingle, COUNT(*) AS df FROM sh GROUP BY 1, 2
        )
        SELECT df.source, df.shingle, df.df, srcn.source_docs,
               df.df * 1000000 DIV srcn.source_docs AS df_ppm
        FROM df JOIN srcn ON srcn.source = df.source
        WHERE df.df * {_BOIL_PCT} >= srcn.source_docs
        ORDER BY df_ppm DESC, df.source, df.shingle LIMIT {_BOIL_TOPK}
    """)


# --------------------------------------------- A/B power and MDE --

_MDE_SQL = """
        WITH ev AS (
          SELECT user_id, event_type FROM {src}
        ),
        per_user AS (
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 20
                      THEN 1 ELSE 0 END AS conv
          FROM ev GROUP BY user_id
        ),
        cells AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_t,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_c,
                 CAST(SUM(conv) AS BIGINT) AS conv_all
          FROM per_user
        )
        SELECT n, n_t, n_c, conv_all,
               CAST(conv_all AS DOUBLE) / CAST(n AS DOUBLE) AS p_pool,
               (1.959964 + 0.841621)
                 * sqrt((CAST(conv_all AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(conv_all AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                        * (1.0 / CAST(n_t AS DOUBLE)
                           + 1.0 / CAST(n_c AS DOUBLE)))
                 AS mde_abs
        FROM cells
"""


@register(
    "events_ab_power_mde",
    oracle=_MDE_SQL.format(src="events"),
    doc="Minimal detectable effect for the standing A/B split (the "
    "pre-experiment power check every platform runs before launching "
    "a test): pooled conversion (>=20 purchases, the discriminating "
    "threshold from events_ab_test_ztest), arm sizes from the "
    "user_id%2 assignment, and MDE = (z_0.975 + z_0.80) * "
    "sqrt(p(1-p)(1/n_t + 1/n_c)) — the z constants are shared "
    "literals, and sqrt/division are the bit-identical float ops "
    "(no erf/ln anywhere). Exact integer sufficient stats ride "
    "alongside so the float column is auditable. Scale shape: one "
    "per-user rollup + one global aggregate.",
    tags=("events", "stats"),
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_mde")
    return spark.sql(_MDE_SQL.format(src="ev_mde"))


# --------------------------------------------- degree assortativity --

_ASSORT_SQL = """
        , deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k
          FROM e GROUP BY 1
        ),
        tagged AS (
          SELECT da.k AS ka, db.k AS kb
          FROM half
          JOIN deg da ON da.n = half.a
          JOIN deg db ON db.n = half.b
        ),
        sums AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(ka + kb) AS BIGINT) AS s1,
                 CAST(SUM(ka * ka + kb * kb) AS BIGINT) AS s2,
                 CAST(SUM(ka * kb) AS BIGINT) AS sp
          FROM tagged
        )
        SELECT m, s1, s2, sp,
               CAST(4 * m * sp - s1 * s1 AS BIGINT) AS r_num,
               CAST(2 * m * s2 - s1 * s1 AS BIGINT) AS r_denom,
               CAST(4 * m * sp - s1 * s1 AS DOUBLE)
                 / CAST(2 * m * s2 - s1 * s1 AS DOUBLE) AS assortativity
        FROM sums
"""


def _assort_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    return (_EDGE_SQL + _ASSORT_SQL).replace(
        "half AS (", "half AS MATERIALIZED ("
    )


@register(
    "graph_assortativity",
    oracle=_assort_oracle(),
    doc="Degree assortativity of the token co-occurrence graph "
    "(Newman 2002: do hubs attach to hubs?): over each undirected "
    "edge's endpoint degrees, the Pearson correlation collapses to "
    "the exact rational (4m*sum(ka*kb) - s1^2) / (2m*sum(ka^2+kb^2) "
    "- s1^2) with s1 = sum(ka+kb) — every term an exact bigint from "
    "two aggregates (per-node degree, then one edge-level sum pass), "
    "the single float division mirrored. The graph-health probe run "
    "before committing to a partitioning strategy: disassortative "
    "graphs (hubs-to-leaves) are the ones that skew joins. Scale "
    "shape: one groupBy + one broadcastable degree join + one "
    "aggregate; no iteration.",
    tags=("graph", "stats"),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    tagged = (
        half.join(deg.select(F.col("n").alias("a"),
                             F.col("k").alias("ka")), "a")
        .join(deg.select(F.col("n").alias("b"),
                         F.col("k").alias("kb")), "b")
    )
    sums = tagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum(F.col("ka") + F.col("kb")).cast("bigint").alias("s1"),
        F.sum(F.col("ka") * F.col("ka") + F.col("kb") * F.col("kb"))
        .cast("bigint")
        .alias("s2"),
        F.sum(F.col("ka") * F.col("kb")).cast("bigint").alias("sp"),
    )
    return sums.select(
        "m", "s1", "s2", "sp",
        F.expr("4 * m * sp - s1 * s1").cast("bigint").alias("r_num"),
        F.expr("2 * m * s2 - s1 * s1").cast("bigint").alias("r_denom"),
        (
            F.expr("CAST(4 * m * sp - s1 * s1 AS DOUBLE)")
            / F.expr("CAST(2 * m * s2 - s1 * s1 AS DOUBLE)")
        ).alias("assortativity"),
    )


# --------------------------------------------- DAU/WAU stickiness --

_STICKY_SQL = """
        WITH ev AS (
          SELECT user_id, {day_expr} AS day FROM {src}
        ),
        du AS (SELECT DISTINCT day, user_id FROM ev),
        days AS (SELECT DISTINCT day FROM du),
        dau AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY 1
        ),
        wau AS (
          SELECT d.day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
          FROM days d JOIN du ON du.day BETWEEN d.day - 6 AND d.day
          GROUP BY 1
        ),
        mau AS (
          SELECT d.day, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS mau
          FROM days d JOIN du ON du.day BETWEEN d.day - 27 AND d.day
          GROUP BY 1
        )
        SELECT dau.day, dau.dau, wau.wau, mau.mau,
               CAST(dau.dau * 1000000 {div} wau.wau AS BIGINT)
                 AS dau_wau_ppm,
               CAST(wau.wau * 1000000 {div} mau.mau AS BIGINT)
                 AS wau_mau_ppm
        FROM dau
        JOIN wau ON wau.day = dau.day
        JOIN mau ON mau.day = dau.day
        ORDER BY dau.day
"""


@register(
    "events_dau_stickiness",
    oracle=_STICKY_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="DAU / trailing-7-day WAU / trailing-28-day MAU with the "
    "DAU/WAU and WAU/MAU stickiness ratios in exact integer ppm — "
    "the product-health dashboard row, computed EXACTLY (the "
    "linear-counting sibling sketch_sliding_distinct estimates this "
    "same shape; here the distinct-user windows are exact so the "
    "sketch's error is auditable against it). Scale shape: the "
    "event-scale work is one distinct (day, user) projection; the "
    "window expansion joins 7/28 day keys, not event volume — at "
    "100 TB the du relation is the per-day active set, shuffled "
    "once.",
    tags=("events", "window", "stats"),
)
def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sticky")
    return spark.sql(
        _STICKY_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_sticky", div="DIV"
        )
    )


# --------------------------------------------- CMS heavy change --


def _cms_change_oracle() -> str:
    from icebergsql_spark.plans.pipeline2 import _cms_bucket_sql
    from icebergsql_spark.plans.pipeline12 import _bloom_probe_keys_sql

    key = "CAST(user_id AS VARCHAR)"
    half_union = " UNION ALL ".join(
        f"SELECT half, {j} AS depth, {_cms_bucket_sql(key, j)} AS bucket "
        f"FROM evh" for j in range(3)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT user_id, {j} AS depth, "
        f"{_cms_bucket_sql(key, j)} AS bucket FROM probes"
        for j in range(3)
    )
    return f"""
        WITH ev AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        d0 AS (SELECT MIN(day) AS d FROM ev),
        evh AS MATERIALIZED (
          SELECT user_id,
                 CASE WHEN day < d0.d + 15 THEN 1 ELSE 2 END AS half
          FROM ev CROSS JOIN d0
        ),
        {_bloom_probe_keys_sql().replace("FROM ev ", "FROM evh ")},
        counters AS MATERIALIZED (
          SELECT half, depth, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ({half_union}) x GROUP BY 1, 2, 3
        ),
        pb AS MATERIALIZED ({probe_union}),
        est AS (
          SELECT h.half, pb.user_id,
                 CAST(MIN(COALESCE(counters.cnt, 0)) AS BIGINT) AS est
          FROM (SELECT 1 AS half UNION ALL SELECT 2) h
          CROSS JOIN pb
          LEFT JOIN counters
            ON counters.half = h.half AND counters.depth = pb.depth
           AND counters.bucket = pb.bucket
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT evh.half, evh.user_id,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM evh GROUP BY 1, 2
        )
        SELECT p.user_id,
               CAST(e1.est AS BIGINT) AS est1,
               CAST(e2.est AS BIGINT) AS est2,
               CAST(e2.est - e1.est AS BIGINT) AS est_change,
               CAST(COALESCE(x1.n, 0) AS BIGINT) AS exact1,
               CAST(COALESCE(x2.n, 0) AS BIGINT) AS exact2,
               CAST(COALESCE(x2.n, 0) - COALESCE(x1.n, 0) AS BIGINT)
                 AS exact_change
        FROM probes p
        JOIN est e1 ON e1.user_id = p.user_id AND e1.half = 1
        JOIN est e2 ON e2.user_id = p.user_id AND e2.half = 2
        LEFT JOIN exact x1 ON x1.user_id = p.user_id AND x1.half = 1
        LEFT JOIN exact x2 ON x2.user_id = p.user_id AND x2.half = 2
        ORDER BY p.user_id
    """


@register(
    "sketch_cms_heavy_change",
    oracle=_cms_change_oracle(),
    doc="Heavy-CHANGE detection from two Count-Min sketches (Cormode & "
    "Muthukrishnan's change-detection application: CMS counters are "
    "LINEAR, so est(H2) - est(H1) estimates a key's traffic shift "
    "without storing keys): the month splits at day 15, each half "
    "builds its depth-3 counter table, and the 3 most + 3 least "
    "active users are probed in both halves — estimated change next "
    "to the exact change (estimate >= exact per half is the CMS "
    "guarantee, hash-checked since md5 buckets are deterministic). "
    "Missing buckets coalesce to 0 (the round-9 ADVICE emitted-rows "
    "contract, applied). Scale shape: two 3x256 counter tables "
    "regardless of volume; probes broadcast.",
    tags=("sketch", "countmin", "stats"),
)
def sketch_cms_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from icebergsql_spark.operators import sketch
    from icebergsql_spark.plans.registry import (
        events_min_day,
        events_ts_to_nanos,
    )

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select(
        F.col("user_id").cast("string").alias("uid"),
        "user_id",
        F.expr("ts DIV 86400000000000").alias("day"),
    )
    # scan-for-a-constant removed (r14 change-10 class): the month-half
    # anchor day comes from the parquet footer, not a full scan+agg job
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    evh = ev.withColumn(
        "half", F.when(F.col("day") < d0 + 15, 1).otherwise(2)
    ).localCheckpoint()
    ucnt = evh.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
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
    halves = []
    for h in (1, 2):
        counters = sketch.cms_build(
            evh.filter(F.col("half") == h), "uid"
        )
        pb = probes.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("depth"),
                            sketch._cms_bucket(F.col("uid"), j).alias(
                                "bucket"
                            ),
                        )
                        for j in range(3)
                    ]
                )
            ).alias("p"),
        ).select("user_id", "p.depth", "p.bucket")
        est = (
            pb.join(F.broadcast(counters), ["depth", "bucket"], "left")
            .groupBy("user_id")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("bigint")
                .alias(f"est{h}")
            )
        )
        exact = (
            evh.filter(F.col("half") == h)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"exact{h}"))
        )
        halves.append((est, exact))
    out = (
        probes.select("user_id")
        .join(halves[0][0], "user_id")
        .join(halves[1][0], "user_id")
        .join(halves[0][1], "user_id", "left")
        .join(halves[1][1], "user_id", "left")
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


# --------------------------------------- streaming stickiness twin --


@register(
    "events_stream_dau_stickiness",
    oracle=_STICKY_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="STREAMING twin of events_dau_stickiness: each of 3 "
    "chronological micro-batches appends its DISTINCT (day, user) "
    "markers to a parquet sink (set semantics — batch chopping and "
    "replay merge by dedup, the events_stream_cumulative_users "
    "pattern), and the finalizer runs the IDENTICAL exact "
    "DAU/WAU/MAU window SQL over the merged marker set. Per-batch "
    "state is the active (day, user) set, never event volume — the "
    "always-on product-health dashboard shape.",
    tags=("events", "streaming", "window"),
)
def events_stream_dau_stickiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sdausrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-sdauout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                F.expr("ts DIV 86400000000000").alias("day"), "user_id"
            )
            .distinct()
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-sdauck-")
    spark.read.parquet(out).distinct().createOrReplaceTempView(
        "sdau_sink"
    )
    return spark.sql(
        _STICKY_SQL.format(day_expr="day", src="sdau_sink", div="DIV")
    )


# --------------------------------------- image histogram EMD tier --

_EMD_MAX = 4


@register(
    "dedup_image_histogram_emd",
    oracle=f"""
        WITH {_hist_cte()},
        classes AS MATERIALIZED (
          SELECT h0, h1, h2, h3, h4, h5, h6, h7,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hist
          GROUP BY h0, h1, h2, h3, h4, h5, h6, h7
        ),
        cum AS MATERIALIZED (
          SELECT rep, n_docs,
                 h0 AS c0, h0 + h1 AS c1, h0 + h1 + h2 AS c2,
                 h0 + h1 + h2 + h3 AS c3,
                 h0 + h1 + h2 + h3 + h4 AS c4,
                 h0 + h1 + h2 + h3 + h4 + h5 AS c5,
                 h0 + h1 + h2 + h3 + h4 + h5 + h6 AS c6
          FROM classes
        )
        SELECT a.rep AS rep_a, b.rep AS rep_b,
               CAST(abs(a.c0 - b.c0) + abs(a.c1 - b.c1)
                    + abs(a.c2 - b.c2) + abs(a.c3 - b.c3)
                    + abs(a.c4 - b.c4) + abs(a.c5 - b.c5)
                    + abs(a.c6 - b.c6) AS BIGINT) AS emd,
               a.n_docs * b.n_docs AS n_pairs
        FROM cum a JOIN cum b ON a.rep < b.rep
        WHERE abs(a.c0 - b.c0) + abs(a.c1 - b.c1)
              + abs(a.c2 - b.c2) + abs(a.c3 - b.c3)
              + abs(a.c4 - b.c4) + abs(a.c5 - b.c5)
              + abs(a.c6 - b.c6) <= {_EMD_MAX}
        ORDER BY emd, rep_a, rep_b
    """,
    doc="Earth Mover's Distance image near-dup pairs — the ORDERED "
    "histogram metric the plain-L1 tier lacks: for 1-D histograms, "
    "EMD = L1 of CUMULATIVE sums (an exact bigint; the 8th cumulative "
    "term is the pixel count, identical for all images, so 7 terms "
    "suffice), which charges mass by how FAR it moved across "
    "brightness buckets, not just that it moved — a one-bucket hop of "
    "k pixels scores exactly k (the planted 2x2 variants land at "
    "EMD=4) while an equal-count swap across distant buckets scores "
    "high. Same class-rollup shape as the L1 gate: the pair matrix is "
    "bounded by distinct signatures, never docs. Oracle replays "
    "pixels -> histograms -> cumulative pairing.",
    tags=("multimodal", "dedup"),
)
def dedup_image_histogram_emd(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_histogram

    hist = image_gray_histogram(_pert_blobs(spark, sf_dir, _HIST_MAX_DOC))
    classes = (
        hist.groupBy(*[f"h{k}" for k in range(8)])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep"),
        )
        .localCheckpoint()
    )
    cums = [
        sum(F.col(f"h{j}") for j in range(k + 1)).alias(f"c{k}")
        for k in range(7)
    ]
    cum = classes.select("rep", "n_docs", *cums)
    a = cum.select(
        F.col("rep").alias("rep_a"), F.col("n_docs").alias("na"),
        *[F.col(f"c{k}").alias(f"a{k}") for k in range(7)],
    )
    b = cum.select(
        F.col("rep").alias("rep_b"), F.col("n_docs").alias("nb"),
        *[F.col(f"c{k}").alias(f"b{k}") for k in range(7)],
    )
    emd = sum(F.abs(F.col(f"a{k}") - F.col(f"b{k}")) for k in range(7))
    return (
        a.join(b, F.col("rep_a") < F.col("rep_b"))
        .select(
            "rep_a",
            "rep_b",
            emd.cast("bigint").alias("emd"),
            (F.col("na") * F.col("nb")).cast("bigint").alias("n_pairs"),
        )
        .filter(F.col("emd") <= _EMD_MAX)
        .orderBy("emd", "rep_a", "rep_b")
    )


# --------------------------------------- depth-3 binseg trace --

_BINSEG_DEPTH = 3


def _binseg_trace_sql(day_expr: str, src: str) -> str:
    """Binary segmentation unrolled to depth 3 (7 candidate splits):
    every level re-applies the CUSUM max-deviation rule inside each
    surviving segment, with segment-local sums derived algebraically
    from the ONE global cumulative relation — the same engine-neutral
    exact-bigint algebra as _BINSEG_SQL, chained."""
    levels = []
    prev_segs = "segs1"
    for lv in range(1, _BINSEG_DEPTH + 1):
        nxt = f"""
        base{lv} AS (
          SELECT s.lo, s.hi,
                 CAST(COALESCE(lo_c.s_k, 0) AS BIGINT) AS s_lo,
                 CAST(hi_c.s_k - COALESCE(lo_c.s_k, 0) AS BIGINT) AS t_s
          FROM {prev_segs} s
          LEFT JOIN cum lo_c ON lo_c.k = s.lo - 1
          JOIN cum hi_c ON hi_c.k = s.hi
          WHERE s.hi > s.lo
        ),
        dev{lv} AS (
          SELECT b.lo, b.hi, cum.k, cum.day,
                 CAST(cum.s_k - b.s_lo AS BIGINT) AS pre_sum,
                 CAST(b.t_s - (cum.s_k - b.s_lo) AS BIGINT) AS post_sum,
                 CAST(abs((b.hi - b.lo + 1) * (cum.s_k - b.s_lo)
                          - (cum.k - b.lo + 1) * b.t_s) AS BIGINT)
                   AS dev_num
          FROM base{lv} b JOIN cum ON cum.k >= b.lo AND cum.k < b.hi
        ),
        best{lv} AS (
          SELECT * FROM (
            SELECT dev{lv}.*,
                   row_number() OVER (
                     PARTITION BY lo, hi
                     ORDER BY dev_num DESC, day ASC
                   ) AS rn
            FROM dev{lv}
          ) z WHERE rn = 1
        ),
        segs{lv + 1} AS (
            SELECT lo, k AS hi FROM best{lv}
          UNION ALL
            SELECT k + 1 AS lo, hi FROM best{lv}
        )"""
        levels.append(nxt)
        prev_segs = f"segs{lv + 1}"
    union = "\n          UNION ALL ".join(
        f"SELECT {lv} AS level, lo, hi, k, day, pre_sum, post_sum,"
        f" dev_num FROM best{lv}"
        for lv in range(1, _BINSEG_DEPTH + 1)
    )
    return f"""
        WITH ev AS (
          SELECT {day_expr} AS day, event_type FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev WHERE event_type = 'purchase' GROUP BY day
        ),
        cum AS (
          SELECT day,
                 CAST(SUM(x) OVER (ORDER BY day) AS BIGINT) AS s_k,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
          FROM daily
        ),
        segs1 AS (
          SELECT CAST(1 AS BIGINT) AS lo,
                 CAST(COUNT(*) AS BIGINT) AS hi
          FROM daily
        ),
        {",".join(levels)}
        SELECT CAST(level AS BIGINT) AS level,
               lo AS seg_lo, hi AS seg_hi, k AS split_k,
               CAST(day AS BIGINT) AS split_day,
               dev_num, pre_sum, post_sum
        FROM ({union}) u
        ORDER BY level, lo
    """


@register(
    "events_binseg_trace",
    oracle=_binseg_trace_sql(
        "epoch_ns(ts) // 86400000000000", "events"
    ),
    doc="Binary segmentation unrolled to DEPTH 3 (up to 7 splits) over "
    "the daily purchase series — the full hierarchical changepoint "
    "trace events_binseg_changepoints is the first two levels of: "
    "each level derives every surviving segment's local sums "
    "algebraically from the ONE global cumulative-sum window (exact "
    "bigints, no per-segment rescan, no driver recursion; segments "
    "shrunk to a single point drop out via the hi > lo guard). Both "
    "engines run the IDENTICAL generated CTE chain. Scale shape: one "
    "daily rollup + one window + 3 chained joins against a <=2^d-row "
    "segment relation — depth is a compile-time unroll, the 100-TB "
    "cost stays the single event-scale count.",
    tags=("events", "stats"),
)
def events_binseg_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_binseg3")
    return spark.sql(
        _binseg_trace_sql("ts DIV 86400000000000", "ev_binseg3")
    )


# --------------------------------------- per-type stickiness --

_STICKY_TYPE_SQL = """
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        du AS (SELECT DISTINCT event_type, day, user_id FROM ev),
        days AS (SELECT DISTINCT event_type, day FROM du),
        dau AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS dau
          FROM du GROUP BY 1, 2
        ),
        wau AS (
          SELECT d.event_type, d.day,
                 CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
          FROM days d JOIN du
            ON du.event_type = d.event_type
           AND du.day BETWEEN d.day - 6 AND d.day
          GROUP BY 1, 2
        )
        SELECT dau.event_type, dau.day, dau.dau, wau.wau,
               CAST(dau.dau * 1000000 {div} wau.wau AS BIGINT)
                 AS dau_wau_ppm
        FROM dau JOIN wau
          ON wau.event_type = dau.event_type AND wau.day = dau.day
        WHERE dau.day >= (SELECT MIN(day) + 6 FROM du)
        ORDER BY dau.event_type, dau.day
"""


@register(
    "events_stickiness_by_type",
    oracle=_STICKY_TYPE_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Per-event-type DAU / trailing-7-day WAU stickiness (the "
    "segment-level drill-down of events_dau_stickiness — engagement "
    "health per surface, not just globally): exact distinct-user "
    "windows keyed by (type, day), integer-ppm ratio, warm-up days "
    "(first 6) excluded so every emitted window is full-width. Scale "
    "shape: one distinct (type, day, user) projection; the 7-day "
    "expansion joins day keys per type, never event volume.",
    tags=("events", "window", "stats"),
)
def events_stickiness_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_sticky_t")
    return spark.sql(
        _STICKY_TYPE_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_sticky_t", div="DIV"
        )
    )
