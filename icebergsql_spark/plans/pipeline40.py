"""Round-13 gate wave #2 (pipeline40): the DGIM sliding bit-count
sketch (batch + streaming twin) and 2-round quantized SimRank.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import register

# ------------------------------------------------- DGIM sketch --

# DGIM (Datar-Gionis-Indyk-Motwani) maintains O(log N) buckets of
# power-of-two sizes with at most two buckets per size.  The key
# determinism insight: the maintenance recurrence (new 1 -> size-1
# bucket; three of a size -> merge the two OLDEST into the next size)
# is EXACTLY a binary counter over digits {1, 2}, so after n ones the
# bucket-size multiset is the unique BIJECTIVE BASE-2 representation
# of n — d_k = 2 - (n_k % 2) with n_k = (n - (2^k - 1)) DIV 2^k — and
# the whole structure is CLOSED FORM over (n, the ones' positions): no
# sequential fold, no recursive CTE, and the oracle replays the same
# algebra.  Bucket at offset `off` (ones more recent than it) has its
# most-recent-1 at reverse index off.
#
# Bit stream: per (event_type, hour), bit = hourly count % 2 — a
# ~50%-density deterministic stream at every SF (presence would
# saturate to all-1s at sf0.1).  Estimate for the last W hours:
# every qualifying bucket (most-recent-1 inside the window) counts
# fully except the oldest, which counts half — emitted in DOUBLED
# units (est2) so everything stays exact bigint.
_DGIM_HEAD_SQL = """
        WITH hourly AS (
          SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT event_type, {hour_expr} AS hour FROM {src}) e
          GROUP BY 1, 2
        ),"""
_DGIM_TAIL_SQL = """
        ones AS (
          SELECT event_type, hour,
                 ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY hour) AS rn,
                 COUNT(*) OVER (PARTITION BY event_type) AS n
          FROM hourly WHERE c % 2 = 1
        ),
        maxh AS (
          SELECT event_type, CAST(MAX(hour) AS BIGINT) AS mh
          FROM hourly GROUP BY 1
        ),
        nn AS (SELECT DISTINCT event_type, n FROM ones),
        digits AS (
          SELECT nn.event_type, s.k, CAST(s.pw AS BIGINT) AS pw,
                 2 - (((nn.n - (s.pw - 1)) {div} s.pw) % 2) AS dk
          FROM nn
          CROSS JOIN (SELECT k, pw FROM (VALUES
            (0, 1), (1, 2), (2, 4), (3, 8), (4, 16), (5, 32),
            (6, 64), (7, 128), (8, 256), (9, 512), (10, 1024)
          ) AS t(k, pw)) s
          WHERE nn.n - (s.pw - 1) >= s.pw
        ),
        pref AS (
          SELECT event_type, k, pw, dk,
                 COALESCE(SUM(dk * pw) OVER (
                   PARTITION BY event_type ORDER BY k
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pre
          FROM digits
        ),
        buckets AS (
          SELECT p.event_type, p.pw AS size,
                 p.pre + (c.copy - 1) * p.pw AS off
          FROM pref p
          JOIN (SELECT r AS copy
                FROM (VALUES (1), (2)) AS t(r)) c
            ON c.copy <= p.dk
        ),
        bts AS (
          SELECT b.event_type, b.size, b.off, o.hour AS bhour
          FROM buckets b
          JOIN ones o ON o.event_type = b.event_type
                     AND o.n - o.rn = b.off
        ),
        frame AS (
          SELECT h.event_type, w.w, m.mh
          FROM (SELECT DISTINCT event_type FROM hourly) h
          JOIN maxh m ON m.event_type = h.event_type
          CROSS JOIN (SELECT r AS w
                      FROM (VALUES (64), (128), (256)) AS t(r)) w
        ),
        qual AS (
          SELECT f.event_type, f.w, t.size, t.off,
                 MAX(t.off) OVER (
                   PARTITION BY f.event_type, f.w) AS mx
          FROM frame f
          JOIN bts t ON t.event_type = f.event_type
                    AND t.bhour >= f.mh - f.w + 1
        ),
        est AS (
          SELECT event_type, w,
                 CAST(SUM(2 * size)
                      - MAX(CASE WHEN off = mx THEN size ELSE 0 END)
                      AS BIGINT) AS est2,
                 CAST(COUNT(*) AS BIGINT) AS n_buckets
          FROM qual GROUP BY 1, 2
        ),
        exact AS (
          SELECT f.event_type, f.w,
                 CAST(2 * COUNT(o.hour) AS BIGINT) AS exact2
          FROM frame f
          LEFT JOIN ones o ON o.event_type = f.event_type
                          AND o.hour >= f.mh - f.w + 1
          GROUP BY 1, 2
        )
        SELECT x.event_type, CAST(x.w AS BIGINT) AS w,
               COALESCE(n.n, 0) AS n_ones_total,
               x.exact2,
               COALESCE(e.est2, 0) AS est2,
               COALESCE(e.n_buckets, 0) AS n_buckets,
               COALESCE(e.est2, 0) - x.exact2 AS err2
        FROM exact x
        LEFT JOIN est e ON e.event_type = x.event_type AND e.w = x.w
        LEFT JOIN nn n ON n.event_type = x.event_type
        ORDER BY x.event_type, x.w
"""
_DGIM_SQL = _DGIM_HEAD_SQL + _DGIM_TAIL_SQL


@register(
    "sketch_dgim_bitcount",
    oracle=_DGIM_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events", div="//"
    ),
    doc="DGIM sliding-window bit-count sketch over the per-(type, hour) "
    "parity bit stream (bit = hourly count % 2, ~50% density at every "
    "SF): estimates the number of 1s in the last 64/128/256 hours "
    "from O(log N) power-of-two buckets instead of the raw window. "
    "Determinism: the DGIM merge recurrence is a binary counter over "
    "digits {1,2}, so the bucket multiset after n ones is the unique "
    "bijective base-2 representation of n (d_k = 2 - (n_k % 2), "
    "n_k = (n - (2^k - 1)) DIV 2^k) and the whole structure — bucket "
    "sizes, offsets, most-recent-1 timestamps — is CLOSED FORM over "
    "window functions; no sequential fold. est2/exact2 in doubled "
    "units keep the half-bucket rule exact bigint; err2 pins the "
    "sketch's guarantee (|err| <= oldest bucket / 2). Scale shape: "
    "one (type, hour) count, ~11-row digit spine, window functions "
    "over per-type partitions.",
    tags=("sketch", "events"),
)
def sketch_dgim_bitcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_dgim")
    return spark.sql(
        _DGIM_SQL.format(
            hour_expr="ts DIV 3600000000000", src="ev_dgim", div="DIV"
        )
    )


def _hourly_partial_stream(
    spark: SparkSession, sf_dir: str, prefix: str
) -> None:
    """Hourly sibling of pipeline30's _daily_partial_stream: 3
    chronological micro-batches append SUM-mergeable
    (type, hour, c) count partials; registers the merged result as
    view ``{prefix}_hourly`` with the (event_type, hour, c)
    `hourly` contract. Delegates to the ONE parameterized fixture
    (pipeline30._partial_stream)."""
    from icebergsql_spark.plans.pipeline30 import _partial_stream

    _partial_stream(
        spark,
        sf_dir,
        prefix,
        cols=[
            F.col("event_type"),
            F.expr("ts DIV 3600000000000").alias("hour"),
        ],
        keys=["event_type", "hour"],
        out_alias="c",
        suffix="hourly",
    )


@register(
    "sketch_stream_dgim",
    oracle=_DGIM_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events", div="//"
    ),
    doc="STREAMING twin of sketch_dgim_bitcount: per-(type, hour) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `hourly` contract — parity bits are computed "
    "AFTER the merge, so micro-batch chopping cannot flip a bit — "
    "and the finalizer runs the IDENTICAL closed-form bucket tail "
    "SQL (shared _DGIM_TAIL_SQL template). The live sliding "
    "bit-count monitor converging to the batch answer bit-for-bit.",
    tags=("sketch", "streaming", "events"),
)
def sketch_stream_dgim(spark: SparkSession, sf_dir: str) -> DataFrame:
    _hourly_partial_stream(spark, sf_dir, "dgim")
    return spark.sql(
        """
        WITH hourly AS (
          SELECT event_type, hour, CAST(c AS BIGINT) AS c
          FROM dgim_hourly
        ),"""
        + _DGIM_TAIL_SQL.format(div="DIV")
    )


# ---------------------------------------------- SimRank (2 rounds) --

_SR_COOC = 74  # shared with the k-truss/closeness graph family
_SR_MAXDOC = 120

# Quantized pair propagation (the integer-ppm PageRank/TextRank
# discipline): C = 0.8 = 4/5 so every round is
#   s_ppm(a,b) = (4 * T) DIV (5 * deg_a * deg_b)
# with T an exact bigint sum of the previous round's ppm scores over
# N(a) x N(b) (identity pairs contribute 1e6 each).  The DIV
# truncation IS the spec (both engines replay it; operands
# non-negative so DuckDB // == Spark DIV).
# Chain/final split (round-14): pipeline52's 3-round extension reuses
# the chain VERBATIM and appends one more propagation block; the
# composed _SR_TAIL_SQL stays character-identical to the r13 string.
_SR_CHAIN_SQL = """
        adj AS {mat}(
          SELECT a AS u, b AS v FROM sr_edges
          UNION ALL SELECT b, a FROM sr_edges
        ),
        deg AS {mat}(
          SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1
        ),
        common AS {mat}(
          SELECT x.v AS a, y.v AS b, CAST(COUNT(*) AS BIGINT) AS cm
          FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
          GROUP BY 1, 2
        ),
        s1 AS {mat}(
          SELECT c.a, c.b,
                 (4 * 1000000 * c.cm) {div} (5 * da.d * db.d) AS s
          FROM common c
          JOIN deg da ON da.u = c.a
          JOIN deg db ON db.u = c.b
        ),
        s1x AS {mat}(
          SELECT a AS i, b AS j, s FROM s1
          UNION ALL SELECT b, a, s FROM s1
        ),
        cross_ AS (
          SELECT na.v AS a, nb.v AS b, CAST(SUM(sx.s) AS BIGINT) AS sc
          FROM s1x sx
          JOIN adj na ON na.u = sx.i
          JOIN adj nb ON nb.u = sx.j
          WHERE na.v < nb.v
          GROUP BY 1, 2
        ),
        t2 AS (
          SELECT COALESCE(c.a, x.a) AS a, COALESCE(c.b, x.b) AS b,
                 1000000 * COALESCE(c.cm, 0) + COALESCE(x.sc, 0) AS t
          FROM common c
          FULL OUTER JOIN cross_ x ON x.a = c.a AND x.b = c.b
        ),
        s2 AS (
          SELECT t2.a, t2.b,
                 COALESCE(s1.s, 0) AS s1_ppm,
                 (4 * t2.t) {div} (5 * da.d * db.d) AS s2_ppm
          FROM t2
          JOIN deg da ON da.u = t2.a
          JOIN deg db ON db.u = t2.b
          LEFT JOIN s1 ON s1.a = t2.a AND s1.b = t2.b
        )"""
_SR_FINAL_SQL = """
        SELECT a, b, s1_ppm, s2_ppm
        FROM s2
        ORDER BY s2_ppm DESC, a, b
        LIMIT 30
"""
_SR_TAIL_SQL = _SR_CHAIN_SQL + _SR_FINAL_SQL

_SR_EDGES_ORACLE = f"""
        w AS MATERIALIZED (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                   trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < {_SR_MAXDOC}
        ),
        sr_edges AS MATERIALIZED (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= {_SR_COOC}
        ),
"""


@register(
    "graph_simrank",
    oracle="WITH "
    + _SR_EDGES_ORACLE
    + _SR_TAIL_SQL.format(div="//", mat="MATERIALIZED "),
    doc="2-round SimRank over the token co-occurrence graph "
    "('two nodes are similar if their neighbors are similar'): "
    "C = 0.8, s0 = identity, each round s(a,b) = C/(deg_a*deg_b) * "
    "sum of the previous round's scores over N(a) x N(b). Quantized "
    "pair propagation per the integer-ppm PageRank/TextRank "
    "discipline — every round's score is one exact bigint product "
    "and one truncating division, so the 2-round chain replays "
    "bit-identically in both engines (the DIV truncation IS the "
    "spec). Top-30 pairs under a total order. Scale shape: "
    "candidates come from the 2-path join (never node x node); "
    "round 2 joins the s1 pair list against two adjacency fans — "
    "bounded by sum over s1 pairs of deg_i * deg_j; Spark side "
    "localCheckpoints the edge list so the co-occurrence build runs "
    "once.",
    tags=("graph", "stats"),
)
def graph_simrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < _SR_MAXDOC
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _SR_COOC)
        .select("a", "b")
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("sr_edges")
    return spark.sql(
        "WITH " + _SR_TAIL_SQL.format(div="DIV", mat="")
    )
