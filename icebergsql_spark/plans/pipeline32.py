"""Round-12 gate wave #2 (pipeline32): ordered-alternative and
effect-size rank statistics (Jonckheere-Terpstra, Cliff's delta),
Durbin-Watson residual autocorrelation (+ streaming twin), Yule's K
lexical concentration, k-truss graph peeling, and two embedding
geometry audits (Hopkins clusterability, k-NN distance histogram).

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------ Jonckheere-Terpstra trend --

# Ordered-alternative rank test across the five event types (a priori
# order = alphabetical): JT = sum over ordered type pairs of the
# Mann-Whitney U, with DOUBLED counts (2*less + ties) so ties stay
# integer.  Null moments are exact integers too: E[2*JT] =
# (N^2 - sum n_i^2)/2 and 72*Var[JT] = N^2(2N+3) - sum n_i^2(2n_i+3)
# (no-ties form, labeled as such); z is one mirrored float expression.
# Heads/tails are split so the streaming twins reuse each tail
# VERBATIM over the merged-partials `cnt` contract.

_SPINE_BATCH_HEAD = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""

_SPINE_STREAM_HEAD = """
        WITH cnt AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS c
          FROM {view}
        ),"""

_SPINE_BODY = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        )"""

_JT_TAIL_SQL = """,
        u AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 CAST(SUM(CASE WHEN a.x < b.x THEN 2
                               WHEN a.x = b.x THEN 1
                               ELSE 0 END) AS BIGINT) AS u2
          FROM daily a JOIN daily b ON a.event_type < b.event_type
          GROUP BY 1, 2
        ),
        dims AS (
          SELECT CAST(SUM(cnt_d) AS BIGINT) AS n_total,
                 CAST(SUM(cnt_d * cnt_d) AS BIGINT) AS sum_n2,
                 CAST(SUM(cnt_d * cnt_d * (2 * cnt_d + 3)) AS BIGINT)
                   AS sum_n23
          FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt_d
                FROM daily GROUP BY event_type) g
        ),
        tots AS (SELECT CAST(SUM(u2) AS BIGINT) AS jt2 FROM u),
        mom AS (
          SELECT d.n_total,
                 CAST((d.n_total * d.n_total - d.sum_n2) {div} 2
                      AS BIGINT) AS mean2,
                 CAST(d.n_total * d.n_total * (2 * d.n_total + 3)
                      - d.sum_n23 AS BIGINT) AS var72
          FROM dims d
        )
        SELECT u.ta, u.tb, u.n_pairs, u.u2,
               m.n_total, m.mean2, m.var72, t.jt2,
               CASE WHEN m.var72 > 0
                    THEN (CAST(t.jt2 - m.mean2 AS DOUBLE) / 2.0)
                         / sqrt(CAST(m.var72 AS DOUBLE) / 72.0)
               END AS z_no_ties
        FROM u CROSS JOIN mom m CROSS JOIN tots t
        ORDER BY u.ta, u.tb
"""

_JT_SQL = _SPINE_BATCH_HEAD + _SPINE_BODY + _JT_TAIL_SQL


@register(
    "events_jonckheere_trend",
    oracle=_JT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="Jonckheere-Terpstra ordered-alternative test across the five "
    "event types (a priori ordering = alphabetical type name, fixed "
    "before looking at the data — the test's defining discipline): "
    "JT = sum of Mann-Whitney U statistics over ordered type pairs, "
    "kept exact by DOUBLING (u2 = 2*#less + #ties), with exact "
    "integer null moments E[2JT] = (N^2-sum n_i^2)/2 and 72*Var = "
    "N^2(2N+3) - sum n_i^2(2n_i+3) (no-ties form, labeled) and z as "
    "one mirrored float expression. More powerful than "
    "Kruskal-Wallis when the alternative is monotone across ordered "
    "groups — dose-response / tiered-rollout reads. Scale shape: "
    "one (type, day) count on a spine, one 10-pair x 900-row join, "
    "scalar aggregates.",
    tags=("events", "stats"),
)
def events_jonckheere_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_jt")
    return spark.sql(
        _JT_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_jt", div="DIV"
        )
    )


# ----------------------------------------------- Cliff's delta --

_CD_TAIL_SQL = """
        SELECT a.event_type AS ta, b.event_type AS tb,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN a.x > b.x THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_gt,
               CAST(SUM(CASE WHEN a.x < b.x THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_lt,
               CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_eq,
               (CAST(SUM(CASE WHEN a.x > b.x THEN 1 ELSE 0 END)
                     AS DOUBLE)
                - CAST(SUM(CASE WHEN a.x < b.x THEN 1 ELSE 0 END)
                       AS DOUBLE))
               / CAST(COUNT(*) AS DOUBLE) AS cliffs_delta
        FROM daily a JOIN daily b ON a.event_type < b.event_type
        GROUP BY 1, 2
        ORDER BY 1, 2
"""

_CD_SQL = _SPINE_BATCH_HEAD + _SPINE_BODY + _CD_TAIL_SQL


@register(
    "events_cliffs_delta",
    oracle=_CD_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Cliff's delta ordinal effect size between every pair of event "
    "types' daily-count distributions: delta = (#(x>y) - #(x<y)) / "
    "(n1*n2) over all cross-group pairs — the dominance statistic "
    "that tells you HOW MUCH two distributions differ after a rank "
    "test says they do, robust to outliers and requiring no "
    "normality. Dominance counts are exact integers; delta is one "
    "mirrored float division. The effect-size companion every "
    "rank-test readout should ship with. Scale shape: one (type, "
    "day) count on a spine, one 10-pair x 900-row join.",
    tags=("events", "stats"),
)
def events_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cd")
    return spark.sql(
        _CD_SQL.format(day_expr="ts DIV 86400000000000", src="ev_cd")
    )


# --------------------------------------- Durbin-Watson statistic --

# Residuals of the per-type OLS day trend are rationals over the same
# exact integer sufficient statistics as events_ols_trend; the
# mirrored double residual is quantized ONCE to 1e-3 units (identical
# doubles -> identical ROUND both engines), after which the DW
# numerator/denominator are exact bigint sums — the
# quantize-per-term-once-then-SUM discipline.
# tail shared with the streaming twin below (consumes daily).
_DW_TAIL_SQL = """
        idx AS (
          SELECT event_type, day, x,
                 CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn
          FROM daily
        ),
        s AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rn) AS BIGINT) AS sx,
                 CAST(SUM(x) AS BIGINT) AS sy,
                 CAST(SUM(rn * rn) AS BIGINT) AS sxx,
                 CAST(SUM(rn * x) AS BIGINT) AS sxy
          FROM idx GROUP BY event_type
        ),
        coef AS (
          SELECT event_type, n, sx, sy,
                 CAST(n * sxy - sx * sy AS BIGINT) AS b_num,
                 CAST(n * sxx - sx * sx AS BIGINT) AS b_den
          FROM s
        ),
        resid AS (
          SELECT i.event_type, i.rn,
                 CAST(ROUND((CAST(i.x AS DOUBLE)
                        - (CAST(c.sy AS DOUBLE)
                           - (CAST(c.b_num AS DOUBLE)
                              / CAST(c.b_den AS DOUBLE))
                             * CAST(c.sx AS DOUBLE))
                          / CAST(c.n AS DOUBLE)
                        - (CAST(c.b_num AS DOUBLE)
                           / CAST(c.b_den AS DOUBLE))
                          * CAST(i.rn AS DOUBLE)) * 1000.0)
                      AS BIGINT) AS eq
          FROM idx i JOIN coef c ON c.event_type = i.event_type
        ),
        lagged AS (
          SELECT event_type, rn, eq,
                 lag(eq) OVER (PARTITION BY event_type ORDER BY rn)
                   AS peq
          FROM resid
        ),
        dw AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN peq IS NOT NULL
                          THEN (eq - peq) * (eq - peq) END) AS BIGINT)
                   AS dw_num_q,
                 CAST(SUM(eq * eq) AS BIGINT) AS dw_den_q
          FROM lagged GROUP BY event_type
        )
        SELECT c.event_type, c.n, c.b_num, c.b_den,
               d.dw_num_q, d.dw_den_q,
               CASE WHEN d.dw_den_q > 0
                    THEN CAST(d.dw_num_q AS DOUBLE)
                         / CAST(d.dw_den_q AS DOUBLE)
               END AS dw
        FROM coef c JOIN dw d ON d.event_type = c.event_type
        ORDER BY c.event_type
"""

_DW_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""
    + _DW_TAIL_SQL
)


@register(
    "events_durbin_watson",
    oracle=_DW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Durbin-Watson residual-autocorrelation statistic on each event "
    "type's daily-volume OLS trend: DW = sum (e_i - e_{i-1})^2 / "
    "sum e_i^2 over the trend residuals — the is-my-regression-lying "
    "check (DW << 2 means the residuals trend together and every "
    "OLS confidence interval is overconfident). The residual is a "
    "ratio of exact bigint sufficient statistics evaluated as one "
    "mirrored double expression, quantized ONCE to 1e-3 units "
    "(identical doubles -> identical ROUND), after which both DW "
    "sums are exact bigints and DW is one float division. Scale "
    "shape: one (type, day) count, one 30-row LAG window per type.",
    tags=("events", "stats"),
)
def events_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_dw")
    return spark.sql(
        _DW_SQL.format(day_expr="ts DIV 86400000000000", src="ev_dw")
    )


@register(
    "events_stream_durbin_watson",
    oracle=_DW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_durbin_watson: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `daily` contract; the finalizer runs the "
    "IDENTICAL quantized-residual tail SQL (shared _DW_TAIL_SQL "
    "template). The live residual-autocorrelation monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_durbin_watson(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "dw")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM dw_daily
        ),"""
        + _DW_TAIL_SQL
    )


# ------------------------------------------------------ Yule's K --

_YK_SQL = """
        WITH tok AS (
          SELECT source, {tok} AS t FROM documents
        ),
        f AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        s AS (
          SELECT source,
                 CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(c * c) AS BIGINT) AS s2,
                 CAST(COUNT(*) AS BIGINT) AS vocab
          FROM f GROUP BY source
        )
        SELECT source, n, vocab,
               CAST(s2 - n AS BIGINT) AS k_num,
               CAST(s2 - n AS DOUBLE) / CAST(n AS DOUBLE)
                 / CAST(n AS DOUBLE) * 10000000000.0
                 AS yule_k_micro
        FROM s
        ORDER BY source
"""


@register(
    "text_yule_k",
    oracle=_YK_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))", div="//"
    ),
    doc="Yule's K lexical-concentration characteristic per source: "
    "K = 10^4 * (sum_m m^2 V_m - N) / N^2, computed via the "
    "frequency identity sum_m m^2 V_m = sum_t f_t^2 — so the whole "
    "statistic is exact integers (k_num = sum f^2 - N; the emitted "
    "yule_k_micro is K x 10^6 as a factor-wise DOUBLE — a 10^10-scaled "
    "integer product would sit within 2x of the bigint ceiling at "
    "larger corpora, where Spark wraps silently while DuckDB promotes "
    "to HUGEINT; double div/mult are bit-identical engines-wise). K is "
    "text-length-invariant where TTR is not — the repetitiveness "
    "score that flags template/boilerplate-heavy sources for "
    "curation at any document-count mix. Scale shape: one (source, "
    "token) count, one per-source aggregate — the same shuffle "
    "profile as word count.",
    tags=("text", "curation"),
)
def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(
        _YK_SQL.format(
            tok="explode(split(trim(text), '\\\\s+'))", div="DIV"
        )
    )


# ------------------------------------------------- k-truss peel --

_TRUSS_SUPPORT = 8  # k-truss with k = 10: every edge needs >= k-2
_TRUSS_ROUNDS = 3
_TRUSS_COOC = 74


def _ktruss_oracle(rounds: int = _TRUSS_ROUNDS) -> str:
    parts = [
        """
        w AS (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                   trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < 120
        ),
        e0 AS MATERIALIZED (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= """ + str(_TRUSS_COOC) + """
        )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
        adj{r} AS MATERIALIZED (
          SELECT a AS u, b AS v FROM e{p}
          UNION ALL SELECT b, a FROM e{p}
        ),
        sup{r} AS (
          SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS s
          FROM e{p} e
          JOIN adj{r} x ON x.u = e.a
          JOIN adj{r} y ON y.u = e.b AND y.v = x.v
          GROUP BY 1, 2
        ),
        e{r} AS MATERIALIZED (
          SELECT e.a, e.b
          FROM e{p} e LEFT JOIN sup{r} s ON s.a = e.a AND s.b = e.b
          WHERE COALESCE(s.s, 0) >= {_TRUSS_SUPPORT}
        )""")
    rows = []
    for r in range(0, rounds + 1):
        rows.append(f"""
        SELECT {r} AS round,
               CAST((SELECT COUNT(*) FROM (
                 SELECT a FROM e{r} UNION SELECT b FROM e{r})) AS BIGINT)
                 AS n_nodes,
               CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT) AS n_edges""")
    return (
        "WITH " + ",".join(parts)
        + "\nSELECT * FROM (" + "\nUNION ALL".join(rows)
        + ") ORDER BY round"
    )


@register(
    "graph_ktruss_trace",
    oracle=_ktruss_oracle(),
    doc="k-truss decomposition (k=10, 3 peeling rounds) over the token "
    "co-occurrence graph: each round computes per-edge SUPPORT (the "
    "number of triangles through the edge, via the adjacency "
    "self-join) and drops edges with support < k-2 — the "
    "triangle-reinforced community core, strictly stronger than "
    "k-core (degree counts acquaintances; support counts mutual "
    "ones). Emits the (nodes, edges) convergence trace per round. "
    "Scale shape per round: the support join is adjacency x "
    "adjacency on node keys (never all-pairs), and each round "
    "localCheckpoints so the unrolled lineage never replicates the "
    "edge build — the k-core/pagerank iterative-operator rule.",
    tags=("pipeline", "graph", "dedup"),
)
def graph_ktruss_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    e = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _TRUSS_COOC)
        .select("a", "b")
        .localCheckpoint()
    )

    def trace_row(r: int, edges: DataFrame) -> DataFrame:
        nodes = (
            edges.select(F.col("a").alias("n"))
            .union(edges.select(F.col("b").alias("n")))
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        )
        cnt = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        return nodes.crossJoin(cnt).select(
            F.lit(r).alias("round"), "n_nodes", "n_edges"
        )

    out = [trace_row(0, e)]
    for _ in range(_TRUSS_ROUNDS):
        adj = e.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        sup = (
            e.alias("e")
            .join(adj.alias("xx"), F.col("xx.u") == F.col("e.a"))
            .join(
                adj.alias("yy"),
                (F.col("yy.u") == F.col("e.b"))
                & (F.col("yy.v") == F.col("xx.v")),
            )
            .groupBy(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("s"))
        )
        e = (
            e.join(sup, ["a", "b"], "left")
            .filter(F.coalesce(F.col("s"), F.lit(0)) >= _TRUSS_SUPPORT)
            .select("a", "b")
            .localCheckpoint()
        )
        out.append(trace_row(len(out), e))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("round")


# --------------------------------------- Hopkins clusterability --

_HOP_M = 40
_HOP_CAP = 500

# Shared mid/tail SQL over the quantized-integer coordinate view
# xq(vid, pos, q): all distances are exact bigints; the only floats
# are the final Hopkins ratio (one mirrored division).  The synthetic
# uniform probes draw per-dimension md5 coordinates both engines
# replay bit-identically (the PPS deterministic-coin discipline).
_HOP_MID_SQL = """
        bounds AS (
          SELECT pos, CAST(MIN(q) AS BIGINT) AS mn,
                 CAST(MAX(q) AS BIGINT) AS mx
          FROM xq GROUP BY pos
        ),
        probes AS (SELECT s FROM {sspine}),
        synth AS (
          SELECT p.s, b.pos,
                 b.mn + ({hx} % (b.mx - b.mn + 1)) AS q
          FROM probes p CROSS JOIN bounds b
        ),
        ud AS (
          SELECT s.s, x.vid,
                 CAST(SUM((s.q - x.q) * (s.q - x.q)) AS BIGINT) AS d2
          FROM synth s JOIN xq x ON x.pos = s.pos
          GROUP BY 1, 2
        ),
        umin AS (SELECT s, MIN(d2) AS u FROM ud GROUP BY s),
        rdraw AS (
          SELECT vid, {hr} AS draw
          FROM (SELECT DISTINCT vid FROM xq) v
        ),
        rsel AS (
          SELECT vid FROM (
            SELECT vid, row_number() OVER (ORDER BY draw, vid) AS rnk
            FROM rdraw) t
          WHERE rnk <= {m}
        ),
        wd AS (
          SELECT r.vid AS i, x2.vid AS j,
                 CAST(SUM((x1.q - x2.q) * (x1.q - x2.q)) AS BIGINT) AS d2
          FROM rsel r
          JOIN xq x1 ON x1.vid = r.vid
          JOIN xq x2 ON x2.pos = x1.pos AND x2.vid <> r.vid
          GROUP BY 1, 2
        ),
        wmin AS (SELECT i, MIN(d2) AS w FROM wd GROUP BY i),
        tots AS (
          SELECT (SELECT CAST(SUM(u) AS BIGINT) FROM umin) AS su,
                 (SELECT CAST(SUM(w) AS BIGINT) FROM wmin) AS sw
        )
        SELECT CAST({m} AS BIGINT) AS m, su, sw,
               CAST(su AS DOUBLE)
                 / (CAST(su AS DOUBLE) + CAST(sw AS DOUBLE)) AS hopkins
        FROM tots
"""

_HOP_HX_SPARK = (
    "CAST(conv(substring(md5(concat('hops:', CAST(p.s AS STRING), ':',"
    " CAST(b.pos AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)
_HOP_HX_DUCK = (
    "CAST('0x' || substr(md5('hops:' || CAST(p.s AS VARCHAR) || ':'"
    " || CAST(b.pos AS VARCHAR)), 1, 13) AS BIGINT)"
)
_HOP_HR_SPARK = (
    "CAST(conv(substring(md5(concat('hopr:', CAST(vid AS STRING))),"
    " 1, 13), 16, 10) AS BIGINT)"
)
_HOP_HR_DUCK = (
    "CAST('0x' || substr(md5('hopr:' || CAST(vid AS VARCHAR)),"
    " 1, 13) AS BIGINT)"
)


def _hop_oracle() -> str:
    return (
        f"""
        WITH xq AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
          WHERE vec_id < {_HOP_CAP}
        ),
"""
        + _HOP_MID_SQL.format(
            sspine=f"(SELECT unnest(generate_series(0, {_HOP_M - 1}))"
            " AS s)",
            hx=_HOP_HX_DUCK,
            hr=_HOP_HR_DUCK,
            m=_HOP_M,
        )
    )


@register(
    "emb_hopkins_statistic",
    oracle=_hop_oracle(),
    doc="Hopkins clusterability statistic over the embedding table "
    "(squared-distance variant, bounded probe universe vec_id < "
    "500): H = sum(u) / (sum(u) + sum(w)) where u = nearest-real "
    "squared distance from 40 synthetic UNIFORM probes (per-dim md5 "
    "coordinates inside the data's exact integer bounding box — the "
    "deterministic-coin discipline, replayed bit-identically by "
    "both engines) and w = nearest-OTHER distance from 40 "
    "md5-sampled real points. H near 0.5 = uniform (don't bother "
    "clustering), H near 1 = strongly clustered — the "
    "should-we-even-run-kmeans gate before the k-means battery. "
    "All distances exact bigints in the quantized integer space; "
    "the only float is the final ratio. Scale shape: probe-count x "
    "universe equi-joins on the dimension key, never all-pairs.",
    tags=("embeddings", "curation", "stats"),
)
def emb_hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).filter(F.col("vec_id") < _HOP_CAP)
    emb.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "vid",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.expr("CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT)")
            + 2000000
        ).alias("q"),
    ).createOrReplaceTempView("xq")
    return spark.sql(
        "WITH "
        + _HOP_MID_SQL.format(
            sspine=f"(SELECT explode(sequence(0, {_HOP_M - 1})) AS s)",
            hx=_HOP_HX_SPARK,
            hr=_HOP_HR_SPARK,
            m=_HOP_M,
        ).lstrip()
    )


# ------------------------------------ k-NN distance histogram --

_KDIST_CAP = 300
_KDIST_K = 5
_KDIST_WIDTH = 20_000_000_000

_KDIST_MID_SQL = """
        d2 AS (
          SELECT a.vid AS i, b.vid AS j,
                 CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2
          FROM xq a JOIN xq b ON a.pos = b.pos AND a.vid < b.vid
          GROUP BY 1, 2
        ),
        sym AS (
          SELECT i, j, d2 FROM d2
          UNION ALL SELECT j, i, d2 FROM d2
        ),
        knn AS (
          SELECT i, d2,
                 row_number() OVER (PARTITION BY i ORDER BY d2, j) AS r
          FROM sym
        ),
        kd AS (SELECT i, d2 FROM knn WHERE r = {k})
        SELECT CAST(d2 {div} {width} AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(MIN(d2) AS BIGINT) AS min_d2,
               CAST(MAX(d2) AS BIGINT) AS max_d2
        FROM kd
        GROUP BY 1
        ORDER BY 1
"""


def _kdist_oracle() -> str:
    return (
        f"""
        WITH xq AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
          WHERE vec_id < {_KDIST_CAP}
        ),
"""
        + _KDIST_MID_SQL.format(
            k=_KDIST_K, width=_KDIST_WIDTH, div="//"
        )
    )


@register(
    "emb_kdist_histogram",
    oracle=_kdist_oracle(),
    doc="k-distance histogram (k=5) over the embedding table — the "
    "DBSCAN/HDBSCAN eps-selection plot: each point's 5th-nearest-"
    "neighbor squared distance in the exact quantized integer space "
    "(ties broken by neighbor id), bucketed by integer division "
    "into fixed-width bins. The knee of this histogram IS the eps "
    "parameter; shipping it as a gate makes the choice auditable "
    "instead of folklore. Everything is exact integers — no float "
    "anywhere. Scale shape: the pairwise pass is capped to the "
    "vec_id < 300 probe set (the LOF/silhouette discipline — the "
    "production path would use the LSH-bucketed neighbor "
    "generator); the histogram itself is one integer-key count.",
    tags=("embeddings", "curation"),
)
def emb_kdist_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).filter(F.col("vec_id") < _KDIST_CAP)
    emb.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "vid",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.expr("CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT)")
            + 2000000
        ).alias("q"),
    ).createOrReplaceTempView("xq")
    return spark.sql(
        "WITH "
        + _KDIST_MID_SQL.format(
            k=_KDIST_K, width=_KDIST_WIDTH, div="DIV"
        ).lstrip()
    )


# ----------------------- Jonckheere / Cliff's delta stream twins --


@register(
    "events_stream_jonckheere",
    oracle=_JT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="STREAMING twin of events_jonckheere_trend: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `cnt` contract; the finalizer "
    "runs the IDENTICAL doubled-U / exact-moments tail SQL (shared "
    "_JT_TAIL_SQL template). The live ordered-trend monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_jonckheere(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "jt")
    return spark.sql(
        (_SPINE_STREAM_HEAD + _SPINE_BODY + _JT_TAIL_SQL).format(
            view="jt_daily", div="DIV"
        )
    )


@register(
    "events_stream_cliffs_delta",
    oracle=_CD_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_cliffs_delta: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `cnt` contract; the finalizer runs the "
    "IDENTICAL dominance-count tail SQL (shared _CD_TAIL_SQL "
    "template). The live effect-size readout converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cliffs_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "cd")
    return spark.sql(
        (_SPINE_STREAM_HEAD + _SPINE_BODY + _CD_TAIL_SQL).format(
            view="cd_daily"
        )
    )
