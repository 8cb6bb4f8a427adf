"""Third-session round-10 gate wave #2 (pipeline16): time-series
wavelets and motifs, plus TextRank keyword extraction.

Every value-bearing column is exact bigint arithmetic (counts, squared
integer distances, integer-ppm ranks), so the oracle hash can never
drift on float order — the established round-6+ discipline.  Each gate
is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (kept for parity)

from icebergsql_spark.plans.registry import register


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


def _textrank_sql(div: str, sum_big: str) -> str:
    """Two exact integer-ppm TextRank rounds over the word-adjacency
    graph.  `div` is the truncating integer division spelling (both
    operands non-negative, so Spark DIV == DuckDB //); `sum_big`
    wraps SUM so DuckDB's HUGEINT promotion is cast back down before
    the ppm multiply."""
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
        SELECT r2.v AS word, deg.d AS degree,
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
