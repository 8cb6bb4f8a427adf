"""Round-6 operator wave: training-pipeline curation + analytics additions.

Each query registers a PySpark callable plus a DuckDB oracle; names sit at
the head of ``plans/__init__.WINDOW_PRIORITY`` so every one receives a
driver CORRECTNESS row this round. Determinism contract as everywhere:
integer arithmetic on the hot path, single final float ops in matching
operand order, non-negative operands for integer division (Spark ``div``
truncates, DuckDB ``//`` floors — identical only when non-negative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    local_result,
    nonempty,
    register,
    run_partial_stream,
)

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

# DuckDB spelling of operators/curation.md5_bucket
_MD5_BUCKET = "CAST('0x' || substr(md5({expr}), 1, 6) AS BIGINT) % {m}"


@register(
    "curation_train_val_split",
    oracle=f"""
        WITH tagged AS (
          SELECT source, n_chars,
                 {_MD5_BUCKET.format(
                     expr="'split:' || CAST(doc_id AS VARCHAR)", m=100)}
                   AS b
          FROM documents
        )
        SELECT source,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars_total
        FROM tagged
        GROUP BY 1, 2
        ORDER BY source, split
    """,
    doc="Deterministic hash-stratified train/val/test split (90/5/5 on "
    "md5(doc_id)) with per-source accounting — the reproducible-split "
    "primitive every training pipeline needs: membership is a pure "
    "function of the id, so re-runs, backfills, and incremental appends "
    "land each doc in the same split with no stored assignment table. "
    "Scale: one narrow map + one partial-aggregated groupBy; no joins.",
    tags=("curation", "pipeline"),
)
def curation_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    b = md5_bucket(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string")), 100
    )
    return (
        docs.select(
            "source",
            "n_chars",
            F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
            .alias("split"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_total"),
        )
        .orderBy("source", "split")
    )


@register(
    "text_ttr_richness",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS t
          FROM documents
        ),
        per_tok AS (
          SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        per_doc AS (
          SELECT d.doc_id, d.lang,
                 SUM(p.c) AS n_tok,
                 COUNT(*) AS n_distinct,
                 SUM(CASE WHEN p.c = 1 THEN 1 ELSE 0 END) AS n_hapax
          FROM per_tok p JOIN documents d USING (doc_id)
          GROUP BY 1, 2
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(n_tok) AS BIGINT) AS toks,
               CAST(SUM(n_distinct) * 1000000 // SUM(n_tok) AS BIGINT)
                 AS ttr_ppm,
               CAST(SUM(n_hapax) * 1000000 // SUM(n_tok) AS BIGINT)
                 AS hapax_ppm
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
    doc="Vocabulary-richness quality signals per language: type-token "
    "ratio and hapax-legomenon share (both ppm-integer) — low TTR flags "
    "boilerplate/spam, high hapax share flags OCR noise; standard "
    "corpus-curation filters. One explode + two partial-aggregated "
    "groupBys; the (doc_id, token) aggregate is the same shuffle shape "
    "the TF-IDF/BM25 path already pays, so the signal is nearly free in "
    "a fused curation pipeline.",
    tags=("text", "curation"),
)
def text_ttr_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    per_tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = (
        per_tok.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n_tok").cast("bigint").alias("toks"),
            F.expr(
                "CAST(SUM(n_distinct) * 1000000 DIV SUM(n_tok) AS BIGINT)"
            ).alias("ttr_ppm"),
            F.expr(
                "CAST(SUM(n_hapax) * 1000000 DIV SUM(n_tok) AS BIGINT)"
            ).alias("hapax_ppm"),
        )
        .orderBy("lang")
    )


@register(
    "events_user_overlap",
    oracle="""
        WITH ut AS (
          SELECT DISTINCT user_id, event_type FROM events
        ),
        sizes AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ut GROUP BY 1
        ),
        inter AS (
          SELECT x.event_type AS t1, y.event_type AS t2,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM ut x JOIN ut y
            ON x.user_id = y.user_id AND x.event_type < y.event_type
          GROUP BY 1, 2
        )
        SELECT i.t1, i.t2, s1.n AS n1, s2.n AS n2, i.n_both,
               CAST(i.n_both * 1000000 //
                    (s1.n + s2.n - i.n_both) AS BIGINT) AS jaccard_ppm
        FROM inter i
        JOIN sizes s1 ON s1.event_type = i.t1
        JOIN sizes s2 ON s2.event_type = i.t2
        ORDER BY i.t1, i.t2
    """,
    doc="Audience-overlap matrix: Jaccard similarity (ppm-integer) of the "
    "user sets behind every event-type pair — the segment-overlap "
    "question behind campaign targeting and funnel design. Scale shape: "
    "the (user, type) distinct is one shuffle; the pair join is keyed on "
    "user_id so co-located; the per-type audience sizes are a tiny "
    "broadcast. Type cardinality is small, so the pair space never "
    "explodes — the user dimension (the big one) is never crossed.",
    tags=("events", "join"),
)
def events_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    x, y = ut.alias("x"), ut.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("t1"),
            F.col("y.event_type").alias("t2"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    s1 = sizes.select(F.col("event_type").alias("t1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("event_type").alias("t2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "t1")
        .join(F.broadcast(s2), "t2")
        .select(
            "t1", "t2", "n1", "n2", "n_both",
            F.expr(
                "CAST(n_both * 1000000 DIV (n1 + n2 - n_both) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("t1", "t2")
    )


@register(
    "events_decayed_counts",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        aged AS (
          SELECT event_type, c,
                 LEAST((MAX(day) OVER (PARTITION BY event_type) - day) // 7,
                       40) AS k
          FROM daily
        ),
        capped AS (
          SELECT event_type, c, k,
                 MAX(k) OVER (PARTITION BY event_type) AS maxk
          FROM aged
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(SUM(c * (CAST(1 AS BIGINT) << (maxk - k))) AS BIGINT)
                 AS decayed_num,
               CAST(CAST(SUM(c * (CAST(1 AS BIGINT) << (maxk - k)))
                         AS DOUBLE)
                    / CAST(CAST(1 AS BIGINT) << MAX(maxk) AS DOUBLE)
                 AS DOUBLE) AS decayed
        FROM capped
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Exponentially time-decayed event counts (half-life = 1 week, "
    "integer week buckets): the freshness-weighted popularity score "
    "behind trending feeds and decayed frequency features. All-integer "
    "trick: weight 2^-k becomes a bigint shift 2^(maxk-k) so the decayed "
    "sum is EXACT integer arithmetic; the single final division by "
    "2^maxk is a dyadic-rational double — bit-identical across engines "
    "and summation orders. Mergeable across shards/micro-batches "
    "(shift-renormalize then add), so the same sketch works in the "
    "streaming twin.",
    tags=("events", "agg"),
)
def events_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select("event_type", F.expr("ts DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wt = W.partitionBy("event_type")
    aged = daily.select(
        "event_type",
        "c",
        # Clamp the week-bucket age at 40: Spark shiftleft masks shifts
        # mod 64 (silent wrap at >=64-week spans, where DuckDB's <<
        # diverges instead of matching) and c * 2^k overflows bigint even
        # earlier.  Weeks older than 40 half-lives carry weight 2^-40
        # (~1e-12 of the newest week) — an exact, engine-identical floor.
        F.expr(
            "LEAST((MAX(day) OVER (PARTITION BY event_type) - day) DIV 7,"
            " CAST(40 AS BIGINT))"
        ).alias("k"),
    )
    capped = aged.withColumn("maxk", F.max("k").over(wt))
    return (
        capped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("c").cast("bigint").alias("total"),
            F.expr(
                "CAST(SUM(c * shiftleft(CAST(1 AS BIGINT),"
                " CAST(maxk - k AS INT))) AS BIGINT)"
            ).alias("decayed_num"),
            F.expr(
                "CAST(CAST(SUM(c * shiftleft(CAST(1 AS BIGINT),"
                " CAST(maxk - k AS INT))) AS DOUBLE)"
                " / CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(MAX(maxk) AS INT)) AS DOUBLE) AS DOUBLE)"
            ).alias("decayed"),
        )
        .orderBy("event_type")
    )


@register(
    "events_ab_test_ztest",
    oracle=f"""
        WITH assign AS (
          SELECT DISTINCT user_id,
                 {_MD5_BUCKET.format(
                     expr="'ab:' || CAST(user_id AS VARCHAR)", m=2)} AS grp
          FROM events
        ),
        conv AS (
          SELECT user_id FROM events WHERE event_type = 'purchase'
          GROUP BY 1 HAVING COUNT(*) >= 20
        ),
        cells AS (
          SELECT a.grp,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
                      AS BIGINT) AS x
          FROM assign a LEFT JOIN conv c USING (user_id)
          GROUP BY 1
        ),
        wide AS (
          SELECT
            MAX(CASE WHEN grp = 0 THEN n END) AS na,
            MAX(CASE WHEN grp = 0 THEN x END) AS xa,
            MAX(CASE WHEN grp = 1 THEN n END) AS nb,
            MAX(CASE WHEN grp = 1 THEN x END) AS xb
          FROM cells
        )
        SELECT na, xa, nb, xb,
               round((CAST(xa AS DOUBLE) / na - CAST(xb AS DOUBLE) / nb)
                 / sqrt((CAST(xa + xb AS DOUBLE) / (na + nb))
                        * (1.0 - CAST(xa + xb AS DOUBLE) / (na + nb))
                        * (CAST(1 AS DOUBLE) / na
                           + CAST(1 AS DOUBLE) / nb)), 6) AS z
        FROM wide
    """,
    doc="Two-proportion z-test on a deterministic md5 A/B assignment "
    "(purchase conversion, pooled-variance z): the experiment-readout "
    "primitive. Integer sufficient statistics (n, x per arm) are the "
    "only thing aggregated at scale; the z formula runs once on four "
    "scalars in a pinned operand order (div/sqrt are bit-identical "
    "across engines). The same cell-count shape extends to CUPED or "
    "sequential tests by swapping the final scalar formula.",
    tags=("events", "agg", "stats"),
)
def events_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    assign = ev.select("user_id").distinct().select(
        "user_id",
        md5_bucket(
            F.concat(F.lit("ab:"), F.col("user_id").cast("string")), 2
        ).alias("grp"),
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np") >= 20)
        .select("user_id", F.lit(1).alias("conv"))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.coalesce(F.col("conv"), F.lit(0))).cast("bigint")
            .alias("x"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == 0, F.col("x"))).alias("xa"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == 1, F.col("x"))).alias("xb"),
    )
    return wide.select(
        "na", "xa", "nb", "xb",
        F.round(
            (F.col("xa").cast("double") / F.col("na")
             - F.col("xb").cast("double") / F.col("nb"))
            / F.sqrt(
                ((F.col("xa") + F.col("xb")).cast("double")
                 / (F.col("na") + F.col("nb")))
                * (F.lit(1.0)
                   - (F.col("xa") + F.col("xb")).cast("double")
                   / (F.col("na") + F.col("nb")))
                * (F.lit(1).cast("double") / F.col("na")
                   + F.lit(1).cast("double") / F.col("nb"))
            ),
            6,
        ).alias("z"),
    )


@register(
    "curation_pareto_frontier",
    oracle=f"""
        WITH tok AS (
          SELECT doc_id, unnest(list_distinct({_TOKS})) AS t FROM documents
        ),
        per_doc AS (
          SELECT d.doc_id, d.n_chars AS x,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM tok JOIN documents d USING (doc_id)
          GROUP BY 1, 2
        ),
        pts AS (
          SELECT x, MAX(y) AS y FROM per_doc GROUP BY x
        ),
        flagged AS (
          SELECT x, y,
                 MAX(y) OVER (ORDER BY x
                   RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS best_right
          FROM pts
        )
        SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
        FROM flagged
        WHERE best_right IS NULL OR y > best_right
        ORDER BY x
    """,
    doc="2-D Pareto frontier of the corpus over (length, distinct "
    "vocabulary): the non-dominated docs define the quality/length "
    "trade-off curve curation sampling walks. The naive frontier is an "
    "O(n^2) self-join; this is ONE sort-window pass — collapse to "
    "distinct (x, max y) points, then a point is on the frontier iff "
    "its y beats the running max over strictly larger x (RANGE frame "
    "1 FOLLOWING..UNBOUNDED). At 100 TB the distinct-point set after "
    "the (x -> max y) collapse is bounded by the x-domain, not the row "
    "count, so the window runs on a tiny frame.",
    tags=("curation", "window"),
)
def curation_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    per_doc = (
        docs.select(
            "doc_id",
            F.col("n_chars").alias("x"),
            F.explode(
                F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
            ).alias("t"),
        )
        .groupBy("doc_id", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    pts = per_doc.groupBy("x").agg(F.max("y").alias("y"))
    w = Window.orderBy("x").rangeBetween(1, Window.unboundedFollowing)
    return (
        pts.withColumn("best_right", F.max("y").over(w))
        .filter(F.col("best_right").isNull() | (F.col("y") > F.col("best_right")))
        .select(F.col("x").cast("bigint"), F.col("y").cast("bigint"))
        .orderBy("x")
    )


@register(
    "events_burst_windows",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        base AS (
          SELECT event_type, day, c,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail,
                 COUNT(*) OVER (PARTITION BY event_type ORDER BY day
                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_prior
          FROM daily
        ),
        bursts AS (
          SELECT event_type, day, c, trail,
                 c * 7000000 // trail AS ratio_ppm
          FROM base
          WHERE n_prior = 7 AND c * 20 > 3 * trail
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_burst_days,
               CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm,
               CAST(MIN(day) AS BIGINT) AS first_burst_day
        FROM bursts
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Burst detection against a trailing-week baseline: a day is a "
    "burst when its count exceeds the previous 7 calendar days' average "
    "by >5% (integer cross-multiplied — c*20 > 3*trail — no "
    "division on the hot path; the reported intensity ratio is ppm-"
    "integer). The RANGE frame is calendar-correct across gaps, unlike "
    "a ROWS frame. Scale shape: daily pre-aggregation shrinks the "
    "window input to (types x days), so the window pass is trivial "
    "regardless of raw event volume.",
    tags=("events", "window"),
)
def events_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select("event_type", F.expr("ts DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rangeBetween(-7, -1)
    )
    base = daily.select(
        "event_type", "day", "c",
        F.sum("c").over(w).alias("trail"),
        F.count(F.lit(1)).over(w).alias("n_prior"),
    )
    bursts = base.filter(
        (F.col("n_prior") == 7) & (F.col("c") * 20 > 3 * F.col("trail"))
    ).select(
        "event_type", "day",
        F.expr("c * 7000000 DIV trail").alias("ratio_ppm"),
    )
    return (
        bursts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_burst_days"),
            F.max("ratio_ppm").cast("bigint").alias("max_ratio_ppm"),
            F.min("day").cast("bigint").alias("first_burst_day"),
        )
        .orderBy("event_type")
    )


def _labelprop_oracle(rounds: int = 3) -> str:
    parts = [f"""
        w AS (
          SELECT doc_id, unnest(list_distinct({_TOKS})) AS w
          FROM documents WHERE doc_id < 120
        ),
        pairs AS (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= 74
        ),
        e AS (
          SELECT a, b FROM pairs
          UNION ALL SELECT b, a FROM pairs
        ),
        l0 AS (
          SELECT DISTINCT a AS n, a AS lbl FROM e
        )"""]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
        l{r} AS (
          SELECT l.n, LEAST(l.lbl, MIN(nb.lbl)) AS lbl
          FROM l{p} l
          JOIN e ON e.a = l.n
          JOIN l{p} nb ON nb.n = e.b
          GROUP BY l.n, l.lbl
        )""")
    return (
        "WITH " + ",".join(parts)
        + " SELECT * FROM ("
        + " UNION ALL ".join(
            f"""
        SELECT {r} AS round,
               CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_communities,
               CAST(MAX(sz) AS BIGINT) AS largest
        FROM (SELECT lbl, COUNT(*) AS sz FROM l{r} GROUP BY lbl)"""
            for r in range(1, rounds + 1)
        )
        + ") ORDER BY round"
    )


@register(
    "graph_label_propagation",
    oracle=_labelprop_oracle(),
    doc="Min-label propagation (3 synchronous rounds) over the token "
    "co-occurrence graph — the cheap community/connected-component "
    "primitive: every node starts as its own label and each round takes "
    "the min over its neighborhood, so labels flood the component from "
    "its lexicographic root. Emits the convergence trace (distinct "
    "labels, largest community) after each round. Scale "
    "shape per round: one key-partitioned join edge->labels + one "
    "groupBy-min — the same two-shuffle round as PageRank but with a "
    "min (idempotent, re-execution-safe) instead of a sum; each round "
    "localCheckpoints so the unrolled lineage never replicates the "
    "edge build (the iterative-operator rule kcore/pagerank follow).",
    tags=("graph", "dedup"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 74)
        .select("a", "b")
    )
    e = half.unionAll(
        half.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    lbl = e.select(F.col("a").alias("n")).distinct().select(
        "n", F.col("n").alias("lbl")
    )
    trace = []
    for r in range(1, 4):
        nb_min = (
            e.join(lbl.withColumnRenamed("n", "b_n"),
                   F.col("b") == F.col("b_n"))
            .groupBy(F.col("a").alias("n"))
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        lbl = (
            lbl.join(nb_min, "n")
            .select("n", F.least(F.col("lbl"), F.col("nb_lbl")).alias("lbl"))
            .localCheckpoint()
        )
        trace.append(
            lbl.groupBy("lbl")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.lit(r).alias("round"),
                F.count(F.lit(1)).cast("bigint").alias("n_communities"),
                F.max("sz").cast("bigint").alias("largest"),
            )
        )
    out = trace[0]
    for t in trace[1:]:
        out = out.unionAll(t)
    return out.orderBy("round")


@register(
    "emb_cov_pairs",
    oracle="""
        WITH q AS (
          SELECT list_transform(embedding[1:8],
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                 AS q
          FROM embeddings
        ),
        pairs AS (
          SELECT i.range AS i, j.range AS j
          FROM range(0, 8) i CROSS JOIN range(0, 8) j
          WHERE i.range <= j.range
        )
        SELECT p.i, p.j,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q[p.i + 1] * q[p.j + 1]) AS BIGINT) AS s_ij,
               CAST(COUNT(*) * SUM(q[p.i + 1] * q[p.j + 1])
                    - SUM(q[p.i + 1]) * SUM(q[p.j + 1]) AS BIGINT)
                 AS cov_num
        FROM q CROSS JOIN pairs p
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    doc="Exact integer covariance sufficient statistics over the first 8 "
    "embedding dimensions (quantized 1e6): per pair (i<=j) the raw sums "
    "and the covariance numerator n*S_ij - S_i*S_j — the whitening/PCA "
    "input, computed EXACTLY (bigint products; shift-invariant form "
    "needs no mean pass). Scale shape: ONE aggregate pass emits all 36 "
    "pair sums as partial-aggregated columns (no explode shuffle of "
    "n*36 rows); the single-row result unpivots via stack(). The full "
    "64-dim matrix is the same plan with 2080 columns, chunked.",
    tags=("embeddings", "agg", "ml"),
)
def emb_cov_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.select(
        *[
            F.expr(
                f"CAST(round(CAST(embedding[{i}] AS DOUBLE) * 1000000)"
                f" AS BIGINT)"
            ).alias(f"q{i}")
            for i in range(8)
        ]
    )
    pairs = [(i, j) for i in range(8) for j in range(8) if i <= j]
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(F.col(f"q{i}")).alias(f"s{i}") for i in range(8)]
    aggs += [
        F.sum(F.col(f"q{i}") * F.col(f"q{j}")).alias(f"p{i}_{j}")
        for i, j in pairs
    ]
    row = q.agg(*aggs)
    stack = (
        f"stack({len(pairs)}, "
        + ", ".join(f"{i}, {j}, p{i}_{j}, s{i}, s{j}" for i, j in pairs)
        + ") AS (i, j, s_ij, s_i, s_j)"
    )
    return (
        row.selectExpr("n", stack)
        .select(
            "i", "j", "n",
            F.col("s_ij").cast("bigint").alias("s_ij"),
            (F.col("n") * F.col("s_ij") - F.col("s_i") * F.col("s_j"))
            .cast("bigint")
            .alias("cov_num"),
        )
        .orderBy("i", "j")
    )


@register(
    "emb_quantile_clip_bounds",
    oracle="""
        WITH dims AS (SELECT unnest(generate_series(0, 7)) AS dim),
        x AS (
          SELECT d.dim, CAST(e.embedding[d.dim + 1] AS DOUBLE) AS v
          FROM embeddings e CROSS JOIN dims d
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               round(quantile_cont(v, 0.01), 6) AS p01,
               round(quantile_cont(v, 0.99), 6) AS p99,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM x
        GROUP BY dim
        ORDER BY dim
    """,
    doc="Per-dimension p1/p99 clip bounds over the first 8 embedding "
    "dimensions — the activation/feature clipping stats a training "
    "pipeline computes before normalization (winsorizing outliers "
    "without a second data pass). Spark `percentile` and DuckDB "
    "`quantile_cont` share linear-interpolation semantics "
    "(CLAUDE.md-locked parity). Scale shape: posexplode is a narrow "
    "map; the aggregate is keyed by dim (64 groups) so partials "
    "combine map-side; at 100 TB swap exact percentile for "
    "percentile_approx with documented error, same plan.",
    tags=("embeddings", "agg", "ml"),
)
def emb_quantile_clip_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    x = emb.select(
        F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    return (
        x.groupBy("dim")
        .agg(
            F.round(F.expr("percentile(v, 0.01)"), 6).alias("p01"),
            F.round(F.expr("percentile(v, 0.99)"), 6).alias("p99"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("dim")
    )


@register(
    "managed_delete_files_audit",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k FROM orders
        ),
        dv AS (SELECT CAST(COUNT(*) AS BIGINT) AS r FROM base WHERE k % 7 = 0),
        eq AS (SELECT CAST(COUNT(*) AS BIGINT) AS r FROM base WHERE k % 11 = 0),
        live AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS r FROM base
          WHERE k % 7 <> 0 AND k % 11 <> 0
        )
        SELECT * FROM (
          VALUES ('eq_rows_pending',       (SELECT r FROM eq)),
                 ('dv_rows_masked',        (SELECT r FROM dv)),
                 ('live_before_maintenance', (SELECT r FROM live)),
                 ('live_after_maintenance',  (SELECT r FROM live)),
                 ('delete_files_after',    CAST(0 AS BIGINT))
        ) t(label, rows)
        ORDER BY label
    """,
    doc="The `$delete_files` metadata view (round-6; Iceberg "
    "delete_files-table parity) audited end-to-end: a merge-on-read "
    "table takes a predicate DELETE (position DVs; k%7 spreads over "
    "every file so no file is metadata-dropped) then an equality "
    "DELETE (k%11 key rowset, zero read-before-write); the view's "
    "per-content record_count sums must equal the predicate "
    "cardinalities, live_row_count must subtract both (the k%77 "
    "overlap is masked by the DV first and must NOT double-count), "
    "and convert_equality_deletes + rewrite_position_deletes must "
    "drain the view to zero rows while count_from_stats returns the "
    "exact live count metadata-only.",
    tags=("managed", "mor", "metadata"),
)
def managed_delete_files_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-delfwh-"))
    tbl = eng.catalog.create_table(
        "ord_delf",
        "k bigint, st string",
        partition_cols=["st"],
        properties={
            "write.delete.mode": "merge-on-read",
        },
    )
    tbl.insert(
        orders.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
        )
    )
    mark_setup_done()  # base built; deletes + $delete_files audit are the op
    tbl.delete_where("k % 7 = 0")
    tbl.delete_by_keys(
        nonempty(
            orders.filter(F.col("o_orderkey") % 11 == 0)
            .select(F.col("o_orderkey").alias("k"))
            .distinct()
        )
    )

    view = {
        r["content"]: r["rows"]
        for r in tbl.delete_files_df()
        .groupBy("content")
        .agg(F.sum("record_count").alias("rows"))
        .collect()
    }
    live_before = tbl.live_row_count()
    tbl.convert_equality_deletes()
    tbl.rewrite_position_deletes()
    tbl.refresh()
    live_after = tbl.scan().count_from_stats()
    assert live_after is not None, "count_from_stats must be exact post-fold"
    n_view_after = tbl.delete_files_df().count()
    rows = [
        ("eq_rows_pending", int(view.get("equality_deletes", 0))),
        ("dv_rows_masked", int(view.get("position_deletes", 0))),
        ("live_before_maintenance", int(live_before)),
        ("live_after_maintenance", int(live_after)),
        ("delete_files_after", int(n_view_after)),
    ]
    return local_result(spark, rows, "label string, rows bigint").orderBy(
        "label"
    )


@register(
    "events_stream_decayed_counts",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        aged AS (
          SELECT event_type, c,
                 LEAST((MAX(day) OVER (PARTITION BY event_type) - day) // 7,
                       40) AS k
          FROM daily
        ),
        capped AS (
          SELECT event_type, c, k,
                 MAX(k) OVER (PARTITION BY event_type) AS maxk
          FROM aged
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(SUM(c * (CAST(1 AS BIGINT) << (maxk - k))) AS BIGINT)
                 AS decayed_num,
               CAST(CAST(SUM(c * (CAST(1 AS BIGINT) << (maxk - k)))
                         AS DOUBLE)
                    / CAST(CAST(1 AS BIGINT) << MAX(maxk) AS DOUBLE)
                 AS DOUBLE) AS decayed
        FROM capped
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Streaming twin of events_decayed_counts: three chronological "
    "micro-batches (availableNow, maxFilesPerTrigger=1) each fold their "
    "events into per-(type, day) partial counts appended to the sink — "
    "a SUM-mergeable sketch, so micro-batch chopping and arrival order "
    "cannot change the final state (the round-3 stream-gate rule); the "
    "read-side finalizer applies the half-life shift weights exactly as "
    "the batch plan does (decay weights depend on the moving max day, "
    "so they are finalize-time by construction — the state itself stays "
    "integer and tiny: types x days rows, independent of event volume). "
    "Bit-matches the batch oracle.",
    tags=("events", "streaming", "agg"),
)
def events_stream_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-decsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-decout-")
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

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-decck-")

    wt = W.partitionBy("event_type")
    daily = (
        spark.read.parquet(out)
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    capped = daily.select(
        "event_type",
        "c",
        # Clamp the week-bucket age at 40: Spark shiftleft masks shifts
        # mod 64 (silent wrap at >=64-week spans, where DuckDB's <<
        # diverges instead of matching) and c * 2^k overflows bigint even
        # earlier.  Weeks older than 40 half-lives carry weight 2^-40
        # (~1e-12 of the newest week) — an exact, engine-identical floor.
        F.expr(
            "LEAST((MAX(day) OVER (PARTITION BY event_type) - day) DIV 7,"
            " CAST(40 AS BIGINT))"
        ).alias("k"),
    ).withColumn("maxk", F.max("k").over(wt))
    return (
        capped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("c").cast("bigint").alias("total"),
            F.expr(
                "CAST(SUM(c * shiftleft(CAST(1 AS BIGINT),"
                " CAST(maxk - k AS INT))) AS BIGINT)"
            ).alias("decayed_num"),
            F.expr(
                "CAST(CAST(SUM(c * shiftleft(CAST(1 AS BIGINT),"
                " CAST(maxk - k AS INT))) AS DOUBLE)"
                " / CAST(shiftleft(CAST(1 AS BIGINT),"
                " CAST(MAX(maxk) AS INT)) AS DOUBLE) AS DOUBLE)"
            ).alias("decayed"),
        )
        .orderBy("event_type")
    )


@register(
    "text_bpe_pair_stats",
    oracle="""
        WITH pos AS (
          SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
          FROM documents
        ),
        pairs AS (
          SELECT substr(text, i, 1) AS c1, substr(text, i + 1, 1) AS c2
          FROM pos
        ),
        counted AS (
          SELECT c1 || c2 AS pair, CAST(COUNT(*) AS BIGINT) AS c
          FROM pairs
          WHERE c1 <> ' ' AND c2 <> ' '
          GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM counted),
        ranked AS (
          SELECT pair, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, pair) AS r
          FROM counted
        )
        SELECT CAST(r AS INTEGER) AS rank, pair, c,
               CAST(c * 1000000 // (SELECT t FROM tot) AS BIGINT)
                 AS share_ppm
        FROM ranked WHERE r <= 20
        ORDER BY rank
    """,
    doc="The first BPE merge step, corpus-wide: count adjacent "
    "non-space character pairs and rank the top 20 with corpus share "
    "(ppm) — the inner loop of byte-pair-encoding tokenizer training. "
    "Spark side is O(L) per doc (split-to-chars array + element_at "
    "indexing, NOT substring-in-HOF which is O(L^2) by UTF8String "
    "char seek — the CLAUDE.md-documented trap); one explode + one "
    "partial-aggregated groupBy. At 100 TB the pair-count table is "
    "bounded by alphabet^2, so the reduce side is trivial and each BPE "
    "iteration is one linear scan — the production shape for "
    "tokenizer training over a crawl.",
    tags=("text", "curation"),
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    pair = (
        docs.select(F.split(F.col("text"), "").alias("cs"))
        .select(
            # Guard docs that split to <2 chars: sequence(1, 0) in Spark
            # is the DESCENDING [1, 0] and element_at(cs, 0) throws
            # INVALID_INDEX_OF_ZERO (DuckDB's generate_series(1,0) is
            # simply empty) — emit an empty pair array instead.
            F.explode(
                F.expr(
                    "CASE WHEN size(cs) < 2 THEN array()"
                    " ELSE transform(sequence(1, size(cs) - 1),"
                    " i -> concat(element_at(cs, i), element_at(cs, i + 1)))"
                    " END"
                )
            ).alias("pair")
        )
        .filter(~F.col("pair").contains(" "))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = pair.agg(F.sum("c").cast("bigint").alias("t"))
    w = Window.orderBy(F.desc("c"), "pair")
    return (
        pair.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 20)
        .crossJoin(F.broadcast(tot))
        .select(
            "rank", "pair", "c",
            F.expr("CAST(c * 1000000 DIV t AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("rank")
    )


@register(
    "text_charset_profile",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(length(text)) AS BIGINT) AS chars_total,
               CAST(SUM(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
                    * 1000000 // SUM(length(text)) AS BIGINT) AS alpha_ppm,
               CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g')))
                    * 1000000 // SUM(length(text)) AS BIGINT) AS digit_ppm,
               CAST(SUM(length(text)
                        - length(regexp_replace(text, ' ', '', 'g')))
                    * 1000000 // SUM(length(text)) AS BIGINT) AS space_ppm,
               CAST(SUM(length(regexp_replace(text, '[ -~]', '', 'g')))
                    * 1000000 // SUM(length(text)) AS BIGINT)
                 AS non_ascii_ppm
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
    doc="Charset/character-class profile per source (ppm-integer alpha/"
    "digit/space/non-ASCII shares): the encoding-sanity audit run before "
    "ingesting a crawl source — a spike in non-ASCII or digit share "
    "flags mojibake, markup debris, or table dumps. Pure narrow map "
    "(regexp_replace length deltas) + one partial-aggregated groupBy; "
    "zero joins, zero explodes — at 100 TB this is scan-bound and "
    "embarrassingly parallel.",
    tags=("text", "curation"),
)
def text_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ln = F.length("text")
    return (
        docs.select(
            "source",
            ln.alias("n"),
            F.length(F.regexp_replace(F.col("text"), r"[^a-zA-Z]", "")).alias("n_alpha"),
            F.length(F.regexp_replace(F.col("text"), r"[^0-9]", "")).alias("n_digit"),
            (ln - F.length(F.regexp_replace(F.col("text"), r" ", ""))).alias("n_space"),
            F.length(F.regexp_replace(F.col("text"), r"[ -~]", "")).alias("n_nonascii"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n").cast("bigint").alias("chars_total"),
            F.expr("CAST(SUM(n_alpha) * 1000000 DIV SUM(n) AS BIGINT)").alias("alpha_ppm"),
            F.expr("CAST(SUM(n_digit) * 1000000 DIV SUM(n) AS BIGINT)").alias("digit_ppm"),
            F.expr("CAST(SUM(n_space) * 1000000 DIV SUM(n) AS BIGINT)").alias("space_ppm"),
            F.expr("CAST(SUM(n_nonascii) * 1000000 DIV SUM(n) AS BIGINT)").alias("non_ascii_ppm"),
        )
        .orderBy("source")
    )


_KMV_SC = "4503599627370496.0"  # 16^13, exact in a double


def _kmv_inter_oracle() -> str:
    def sk(alias: str, etype: str) -> str:
        return f"""
        {alias} AS (
          SELECT DISTINCT md5(CAST(user_id AS VARCHAR)) AS h
          FROM events WHERE event_type = '{etype}'
          ORDER BY h LIMIT 256
        ),
        {alias}_s AS (SELECT MAX(h) AS hk, COUNT(*) AS m FROM {alias})"""

    def pair(pid: str, t1: str, t2: str) -> str:
        return f"""
        {pid}_theta AS (
          SELECT LEAST(
            CASE WHEN a.m >= 256 THEN
              CAST(CAST('0x' || substr(a.hk, 1, 13) AS BIGINT) AS DOUBLE)
                / {_KMV_SC} ELSE 1.0 END,
            CASE WHEN b.m >= 256 THEN
              CAST(CAST('0x' || substr(b.hk, 1, 13) AS BIGINT) AS DOUBLE)
                / {_KMV_SC} ELSE 1.0 END) AS th
          FROM sk_{t1}_s a, sk_{t2}_s b
        ),
        {pid}_samp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT h FROM sk_{t1} INTERSECT SELECT h FROM sk_{t2}
          ) i, {pid}_theta t
          WHERE CAST(CAST('0x' || substr(i.h, 1, 13) AS BIGINT) AS DOUBLE)
                  / {_KMV_SC} < t.th
        ),
        {pid}_exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS x FROM (
            SELECT DISTINCT user_id FROM events WHERE event_type = '{t1}'
            INTERSECT
            SELECT DISTINCT user_id FROM events WHERE event_type = '{t2}'
          )
        ),
        {pid}_row AS (
          SELECT '{t1}' AS t1, '{t2}' AS t2, e.x AS exact_inter,
                 CAST(round(s.c / t.th) AS BIGINT) AS est_inter
          FROM {pid}_samp s, {pid}_theta t, {pid}_exact e
        )"""

    types = ["click", "purchase", "view"]
    parts = [sk(f"sk_{t}", t) for t in types]
    pairs = [("p1", "click", "purchase"), ("p2", "click", "view"),
             ("p3", "purchase", "view")]
    parts += [pair(pid, a, b) for pid, a, b in pairs]
    sel = " UNION ALL ".join(f"SELECT * FROM {pid}_row" for pid, _, _ in pairs)
    return (
        "WITH " + ",".join(parts)
        + f" SELECT t1, t2, exact_inter, est_inter,"
          f" CAST(abs(est_inter - exact_inter) * 1000000"
          f" // (CASE WHEN exact_inter > 0 THEN exact_inter ELSE 1 END)"
          f" AS BIGINT) AS err_ppm"
          f" FROM ({sel}) ORDER BY t1, t2"
    )


@register(
    "sketch_kmv_intersection",
    oracle=_kmv_inter_oracle(),
    doc="Theta-style KMV audience-intersection estimates, CALIBRATED "
    "against the exact intersection in the same result (err_ppm): for "
    "each event-type pair, θ = min of the two sketches' k-th-hash "
    "fractions (1.0 while a sketch is exhaustive — the estimate is then "
    "exact by construction, which the small-SF rows demonstrate), the "
    "sample is common hashes below θ, estimate = |sample|/θ. The md5 "
    "bottom-k construction is bit-identical in DuckDB, so even the "
    "APPROXIMATE answer hash-matches. At 100 TB the estimate touches "
    "only two 256-row hash sets per pair — the exact column is the "
    "audit, not the production path.",
    tags=("sketch", "events"),
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import sketch

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    types = ["click", "purchase", "view"]
    users = {
        t: ev.filter(F.col("event_type") == t).select("user_id").distinct()
        for t in types
    }
    sketches = {t: sketch.kmv_sketch(users[t], "user_id") for t in types}
    rows = []
    for t1, t2 in [("click", "purchase"), ("click", "view"),
                   ("purchase", "view")]:
        est = sketch.kmv_intersection_estimate(sketches[t1], sketches[t2])
        exact = (
            users[t1].join(users[t2], "user_id", "left_semi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
        )
        rows.append(
            exact.crossJoin(est).select(
                F.lit(t1).alias("t1"), F.lit(t2).alias("t2"),
                "exact_inter",
                F.col("est").alias("est_inter"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.select(
        "t1", "t2", "exact_inter", "est_inter",
        F.expr(
            "CAST(abs(est_inter - exact_inter) * 1000000"
            " DIV (CASE WHEN exact_inter > 0 THEN exact_inter ELSE 1 END)"
            " AS BIGINT)"
        ).alias("err_ppm"),
    ).orderBy("t1", "t2")


@register(
    "events_pit_feature_join",
    oracle="""
        WITH daily AS (
          SELECT user_id,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        feat AS (
          SELECT user_id, day,
                 CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY day)
                      AS BIGINT) AS f
          FROM daily
        ),
        labels AS (
          SELECT user_id,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        merged AS (
          SELECT user_id, day, 0 AS is_feat, NULL AS f, n FROM labels
          UNION ALL
          SELECT user_id, day, 1 AS is_feat, f, NULL FROM feat
        ),
        pit AS (
          SELECT user_id, day, is_feat, n,
                 LAST_VALUE(f IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day, is_feat
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS pit_f
          FROM merged
        )
        SELECT CAST(COALESCE(pit_f // 50, -1) AS BIGINT) AS f_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_label_days,
               CAST(SUM(n) AS BIGINT) AS purchases
        FROM pit WHERE is_feat = 0
        GROUP BY 1
        ORDER BY 1
    """,
    doc="Point-in-time-correct feature join (the feature-store primitive "
    "that prevents training-serving leakage): per-user daily cumulative "
    "activity snapshots join purchase 'label' days at the LATEST "
    "snapshot STRICTLY BEFORE the label day — a same-day snapshot would "
    "leak the label's own events into its feature. Implemented as the "
    "union-sort trick: one user-keyed shuffle, labels sort before "
    "features within a day, and LAST_VALUE(ignore nulls) over rows up "
    "to 1 PRECEDING resolves the as-of lookup in a single window pass — "
    "no per-label range join, no skew amplification; first-day labels "
    "(no prior snapshot) land in the -1 bucket instead of silently "
    "joining a leaked value.",
    tags=("events", "join", "ml"),
)
def events_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.expr("ts DIV 86400000000000").alias("day")
    daily = (
        ev.select("user_id", day)
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    feat = daily.select(
        "user_id", "day",
        F.sum("c")
        .over(Window.partitionBy("user_id").orderBy("day"))
        .cast("bigint")
        .alias("f"),
    )
    labels = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day)
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    merged = labels.select(
        "user_id", "day", F.lit(0).alias("is_feat"),
        F.lit(None).cast("bigint").alias("f"), "n",
    ).unionAll(
        feat.select(
            "user_id", "day", F.lit(1).alias("is_feat"),
            "f", F.lit(None).cast("bigint").alias("n"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day", "is_feat")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pit = merged.select(
        "is_feat", "n",
        F.last("f", ignorenulls=True).over(w).alias("pit_f"),
    )
    return (
        pit.filter(F.col("is_feat") == 0)
        .select(
            F.coalesce(
                F.expr("pit_f DIV 50"), F.lit(-1).cast("bigint")
            ).alias("f_bucket"),
            "n",
        )
        .groupBy("f_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_label_days"),
            F.sum("n").cast("bigint").alias("purchases"),
        )
        .orderBy("f_bucket")
    )


@register(
    "curation_negative_sampling",
    oracle="""
        WITH pmax AS (SELECT MAX(p_partkey) AS pm FROM part),
        sampled AS (
          SELECT o_orderkey AS ok FROM orders WHERE o_orderkey % 37 = 0
        ),
        cand AS (
          SELECT ok, i,
                 CAST('0x' || substr(md5('neg:' || CAST(ok AS VARCHAR)
                        || ':' || CAST(i AS VARCHAR)), 1, 6) AS BIGINT)
                   % (SELECT pm FROM pmax) + 1 AS pk
          FROM sampled, (SELECT unnest(generate_series(1, 6)) AS i)
        ),
        flagged AS (
          SELECT c.ok, c.pk,
                 CASE WHEN l.l_orderkey IS NULL THEN 0 ELSE 1 END AS hit
          FROM cand c
          LEFT JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
            ON l.l_orderkey = c.ok AND l.l_partkey = c.pk
        )
        SELECT CAST((SELECT COUNT(*) FROM sampled) AS BIGINT) AS n_orders,
               CAST(COUNT(*) AS BIGINT) AS n_candidates,
               CAST(SUM(hit) AS BIGINT) AS n_rejected,
               CAST(COUNT(*) - SUM(hit) AS BIGINT) AS n_kept,
               CAST(COUNT(DISTINCT pk) AS BIGINT) AS distinct_parts
        FROM flagged
    """,
    doc="Deterministic negative sampling with positive rejection — the "
    "contrastive-pair generator for recommendation/retrieval training: "
    "per sampled order, 6 candidate 'negative' parts drawn by md5 hash "
    "(reproducible across runs and engines — no RNG state to ship), "
    "then candidates that are actually positives (present in the order) "
    "are rejected by an anti-join against the order's lineitems. Scale "
    "shape: the candidate explode is a narrow map (6x the sampled "
    "orders, not 6x lineitem); the rejection join is keyed on "
    "(orderkey, partkey) so it co-partitions with the fact table; the "
    "max-partkey bound is a 1-row broadcast.",
    tags=("curation", "join", "ml"),
)
def curation_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem", "part"))
    pmax = t["part"].agg(F.max("p_partkey").alias("pm"))
    sampled = t["orders"].filter(F.col("o_orderkey") % 37 == 0).select(
        F.col("o_orderkey").alias("ok")
    )
    cand = (
        sampled.select("ok", F.explode(F.sequence(F.lit(1), F.lit(6))).alias("i"))
        .crossJoin(F.broadcast(pmax))
        .select(
            "ok",
            (
                # md5_bucket with a DYNAMIC modulus (pm is a column), so
                # the same construction is spelled inline
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"), F.col("ok").cast("string"),
                                F.lit(":"), F.col("i").cast("string"),
                            )
                        ),
                        1, 6,
                    ),
                    16, 10,
                ).cast("bigint")
                % F.col("pm")
                + 1
            ).alias("pk"),
        )
    )
    pos = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    flagged = cand.join(
        pos.withColumn("hit", F.lit(1)), ["ok", "pk"], "left"
    ).select("ok", "pk", F.coalesce(F.col("hit"), F.lit(0)).alias("hit"))
    n_orders = sampled.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("hit").cast("bigint").alias("n_rejected"),
        (F.count(F.lit(1)) - F.sum("hit")).cast("bigint").alias("n_kept"),
        F.countDistinct("pk").cast("bigint").alias("distinct_parts"),
    ).crossJoin(F.broadcast(n_orders)).select(
        "n_orders", "n_candidates", "n_rejected", "n_kept", "distinct_parts"
    )


@register(
    "emb_int8_quantization_error",
    oracle="""
        WITH dims AS (SELECT unnest(generate_series(0, 7)) AS dim),
        x AS (
          SELECT d.dim,
                 CAST(round(CAST(e.embedding[d.dim + 1] AS DOUBLE) * 1000000)
                      AS BIGINT) AS qx
          FROM embeddings e CROSS JOIN dims d
        ),
        scales AS (
          SELECT dim, CAST(MAX(abs(qx)) AS BIGINT) AS s FROM x GROUP BY dim
        ),
        coded AS (
          SELECT x.dim, x.qx, sc.s,
                 CAST(round(CAST(x.qx * 127 AS DOUBLE) / sc.s) AS BIGINT)
                   AS q8
          FROM x JOIN scales sc USING (dim)
        )
        SELECT CAST(dim AS INTEGER) AS dim,
               CAST(MAX(s) AS BIGINT) AS scale_q,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(abs(q8)) AS BIGINT) AS max_code,
               CAST(SUM((qx * 127 - q8 * s) * (qx * 127 - q8 * s))
                    AS BIGINT) AS sq_err_sum
        FROM coded
        GROUP BY dim
        ORDER BY dim
    """,
    doc="Int8 symmetric-quantization error audit over the first 8 "
    "embedding dimensions — the compression check run before shipping "
    "an int8 embedding index: per-dim scale = max|x| (absmax "
    "quantization), codes = round(x*127/scale). The error is computed "
    "EXACTLY: residual e = qx*127 - q8*scale lives in integer units of "
    "1e-6/127, so the squared-error sum is bigint arithmetic — no "
    "float-summation order anywhere (the single float op is the "
    "per-element division inside round, bit-identical across engines). "
    "Two passes (scales, then codes) with the 8-row scale table "
    "broadcast — the standard shape for global-calibration quantization "
    "at any corpus size.",
    tags=("embeddings", "ml", "agg"),
)
def emb_int8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    x = emb.select(
        F.posexplode(F.slice(F.col("embedding"), 1, 8)).alias("dim", "v")
    ).select(
        "dim",
        F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias(
            "qx"
        ),
    )
    scales = x.groupBy("dim").agg(F.max(F.abs("qx")).alias("s"))
    coded = x.join(F.broadcast(scales), "dim").select(
        "dim", "qx", "s",
        F.expr(
            "CAST(round(CAST(qx * 127 AS DOUBLE) / s) AS BIGINT)"
        ).alias("q8"),
    )
    return (
        coded.groupBy("dim")
        .agg(
            F.max("s").cast("bigint").alias("scale_q"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max(F.abs("q8")).cast("bigint").alias("max_code"),
            F.sum(
                (F.col("qx") * 127 - F.col("q8") * F.col("s"))
                * (F.col("qx") * 127 - F.col("q8") * F.col("s"))
            ).cast("bigint").alias("sq_err_sum"),
        )
        .orderBy("dim")
    )


def _minhash_calibration_oracle() -> str:
    from icebergsql_spark.operators import dedup
    from icebergsql_spark.plans.pipeline import (
        _BANDS_SQL,
        _CAND_UNION,
        _SIG_COLS,
        _WORDS_CTE,
    )

    k = dedup.MINHASH_K
    est_k = " + ".join(
        f"CASE WHEN sa.sig_{j} = sb.sig_{j} THEN 1 ELSE 0 END"
        for j in range(k)
    )
    return f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        {_WORDS_CTE},
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM words GROUP BY doc_id),
        bands AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
        cand AS ({_CAND_UNION}),
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM words GROUP BY doc_id),
        common AS (
          SELECT wa.doc_id AS a, wb.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS c
          FROM words wa JOIN words wb
            ON wa.w = wb.w AND wa.doc_id < wb.doc_id
          GROUP BY 1, 2
        ),
        scored AS (
          SELECT cand.a, cand.b,
                 CAST(({est_k}) * 1000000 // {k} AS BIGINT) AS est_ppm,
                 CAST(COALESCE(common.c, 0) * 1000000
                   // (sa2.sz + sb2.sz - COALESCE(common.c, 0)) AS BIGINT)
                   AS exact_ppm
          FROM cand
          JOIN sigs sa ON sa.doc_id = cand.a
          JOIN sigs sb ON sb.doc_id = cand.b
          JOIN sizes sa2 ON sa2.doc_id = cand.a
          JOIN sizes sb2 ON sb2.doc_id = cand.b
          LEFT JOIN common ON common.a = cand.a AND common.b = cand.b
        )
        SELECT CAST(abs(est_ppm - exact_ppm) // 100000 AS BIGINT)
                 AS err_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(est_ppm) // COUNT(*) AS BIGINT) AS mean_est_ppm,
               CAST(SUM(exact_ppm) // COUNT(*) AS BIGINT) AS mean_exact_ppm
        FROM scored
        GROUP BY 1
        ORDER BY 1
    """


@register(
    "dedup_minhash_calibration",
    oracle=_minhash_calibration_oracle(),
    doc="MinHash estimator calibration, in-result: for every LSH "
    "candidate pair, the signature-agreement estimate (matching sigs / "
    "k, ppm) sits next to the EXACT token-set Jaccard, histogrammed by "
    "absolute-error decile — the measure-your-sketch audit that tells "
    "you whether k and the band layout are adequate BEFORE trusting the "
    "sketch at 100 TB (clone pairs must land in bucket 0; mid-Jaccard "
    "pairs show the k=6 variance). All integer ppm arithmetic; the "
    "exact side is candidate-driven (cost ∝ candidate set, not corpus²).",
    tags=("dedup", "sketch"),
)
def dedup_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import dedup

    k = dedup.MINHASH_K
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    sigs = dedup.minhash_signatures(docs)
    cand = dedup.lsh_candidate_pairs(docs)
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    sizes = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    wa, wb = words.alias("wa"), words.alias("wb")
    common = (
        wa.join(
            wb,
            (F.col("wa.w") == F.col("wb.w"))
            & (F.col("wa.doc_id") < F.col("wb.doc_id")),
        )
        .groupBy(
            F.col("wa.doc_id").alias("a"), F.col("wb.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    est_k = sum(
        F.when(F.col(f"sa.sig_{j}") == F.col(f"sb.sig_{j}"), 1).otherwise(0)
        for j in range(k)
    )
    scored = (
        cand.join(sigs.alias("sa"), F.col("a") == F.col("sa.doc_id"))
        .join(sigs.alias("sb"), F.col("b") == F.col("sb.doc_id"))
        .join(
            sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza")),
            "a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb")),
            "b",
        )
        .join(common, ["a", "b"], "left")
        .select(
            est_k.alias("ek"),
            F.coalesce(F.col("c"), F.lit(0)).alias("c0"),
            "sza", "szb",
        )
        .select(
            F.expr("CAST(ek * 1000000 DIV " + str(k) + " AS BIGINT)").alias(
                "est_ppm"
            ),
            F.expr(
                "CAST(c0 * 1000000 DIV (sza + szb - c0) AS BIGINT)"
            ).alias("exact_ppm"),
        )
    )
    return (
        scored.groupBy(
            F.expr(
                "CAST(abs(est_ppm - exact_ppm) DIV 100000 AS BIGINT)"
            ).alias("err_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("CAST(SUM(est_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_est_ppm"
            ),
            F.expr("CAST(SUM(exact_ppm) DIV COUNT(*) AS BIGINT)").alias(
                "mean_exact_ppm"
            ),
        )
        .orderBy("err_bucket")
    )


@register(
    "events_cusum_changepoint",
    oracle="""
        WITH RECURSIVE daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        idx AS (
          SELECT event_type, day, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
          FROM daily
        ),
        g AS (
          SELECT event_type, CAST(MAX(i) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS tot
          FROM idx GROUP BY event_type
        ),
        cu(event_type, i, s, m, md) AS (
            SELECT x.event_type, 1,
                   greatest(CAST(0 AS BIGINT), x.c * g.n - g.tot),
                   greatest(CAST(0 AS BIGINT), x.c * g.n - g.tot),
                   CASE WHEN x.c * g.n - g.tot > 0 THEN x.day
                        ELSE CAST(-1 AS BIGINT) END
            FROM idx x JOIN g ON g.event_type = x.event_type
            WHERE x.i = 1
          UNION ALL
            SELECT cu.event_type, cu.i + 1,
                   greatest(CAST(0 AS BIGINT),
                            cu.s + (x.c * g.n - g.tot)),
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot)) > cu.m
                        THEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot))
                        ELSE cu.m END,
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      cu.s + (x.c * g.n - g.tot)) > cu.m
                        THEN x.day ELSE cu.md END
            FROM cu
            JOIN idx x ON x.event_type = cu.event_type AND x.i = cu.i + 1
            JOIN g ON g.event_type = cu.event_type
        )
        SELECT cu.event_type, g.n AS n_days, cu.m AS max_cusum,
               cu.md AS peak_day, cu.s AS final_cusum
        FROM cu JOIN g ON g.event_type = cu.event_type AND cu.i = g.n
        ORDER BY cu.event_type
    """,
    doc="CUSUM changepoint scan over the per-type daily volume series — "
    "the classic drift detector for pipeline monitoring: the one-sided "
    "cumulative sum of deviations from the series mean, reset at zero, "
    "peaks where an upward level shift begins. ALL-INTEGER trick: "
    "deviations are scaled by n (d = c*n - total), so the recurrence "
    "s' = max(0, s + d), its max, and the argmax day are exact bigint "
    "arithmetic — no float drift, no tolerance in the oracle (a "
    "recursive CTE replays the identical recurrence). Scale shape: the "
    "event-scale work is one (type, day) aggregate; the sequential fold "
    "runs over the tiny day series per key — same rule as Holt.",
    tags=("events", "agg", "stats"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select("event_type", F.expr("ts DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    g = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "c"))).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("tot"),
    )
    fold = F.expr(
        """
        aggregate(
          arr,
          named_struct('s', CAST(0 AS BIGINT), 'm', CAST(0 AS BIGINT),
                       'md', CAST(-1 AS BIGINT)),
          (acc, x) -> named_struct(
            's', greatest(CAST(0 AS BIGINT), acc.s + (x.c * n - tot)),
            'm', CASE WHEN greatest(CAST(0 AS BIGINT),
                                    acc.s + (x.c * n - tot)) > acc.m
                      THEN greatest(CAST(0 AS BIGINT),
                                    acc.s + (x.c * n - tot))
                      ELSE acc.m END,
            'md', CASE WHEN greatest(CAST(0 AS BIGINT),
                                     acc.s + (x.c * n - tot)) > acc.m
                       THEN x.day ELSE acc.md END))
        """
    )
    return (
        g.select("event_type", F.col("n").alias("n_days"), fold.alias("f"))
        .select(
            "event_type", "n_days",
            F.col("f.m").alias("max_cusum"),
            F.col("f.md").alias("peak_day"),
            F.col("f.s").alias("final_cusum"),
        )
        .orderBy("event_type")
    )


@register(
    "graph_common_neighbors",
    oracle=f"""
        WITH w AS (
          SELECT doc_id, unnest(list_distinct({_TOKS})) AS w
          FROM documents WHERE doc_id < 120
        ),
        half AS (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= 74
        ),
        e AS (SELECT a, b FROM half UNION ALL SELECT b, a FROM half),
        deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d
                FROM e GROUP BY 1),
        two_hop AS (
          SELECT e1.a AS a, e2.b AS c, CAST(COUNT(*) AS BIGINT) AS common
          FROM e e1 JOIN e e2 ON e1.b = e2.a AND e1.a < e2.b
          GROUP BY 1, 2
        ),
        nonadj AS (
          SELECT t.a, t.c, t.common
          FROM two_hop t
          WHERE NOT EXISTS (
            SELECT 1 FROM half h WHERE h.a = t.a AND h.b = t.c
          )
        ),
        scored AS (
          SELECT n.a, n.c, n.common,
                 CAST(n.common * 1000000
                      // (da.d + dc.d - n.common) AS BIGINT) AS jaccard_ppm
          FROM nonadj n
          JOIN deg da ON da.n = n.a
          JOIN deg dc ON dc.n = n.c
        )
        SELECT a, c, common, jaccard_ppm FROM scored
        ORDER BY jaccard_ppm DESC, a, c
        LIMIT 20
    """,
    doc="Common-neighbors link prediction on the token co-occurrence "
    "graph: for each NON-adjacent 2-hop pair, the neighbor-set Jaccard "
    "(ppm-integer) — the classic missing-edge/recommendation score. "
    "Scale shape: the 2-hop enumeration is one self-join keyed on the "
    "middle node (the only place degree skew bites — salting the "
    "top-degree hubs bounds it), adjacency is removed by an anti-join "
    "on the half-edge set, degrees are a tiny broadcast. Top-20 with a "
    "total deterministic order.",
    tags=("graph", "join"),
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    e1, e2 = e.alias("e1"), e.alias("e2")
    two_hop = (
        e1.join(
            e2,
            (F.col("e1.b") == F.col("e2.a"))
            & (F.col("e1.a") < F.col("e2.b")),
        )
        .groupBy(F.col("e1.a").alias("a"), F.col("e2.b").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    nonadj = two_hop.join(
        half.withColumnRenamed("b", "c"), ["a", "c"], "left_anti"
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("da"))
    dc = deg.select(F.col("n").alias("c"), F.col("d").alias("dc"))
    return (
        nonadj.join(F.broadcast(da), "a")
        .join(F.broadcast(dc), "c")
        .select(
            "a", "c", "common",
            F.expr(
                "CAST(common * 1000000 DIV (da + dc - common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), "a", "c")
        .limit(20)
    )


@register(
    "text_source_tv_distance",
    oracle=f"""
        WITH tok AS (
          SELECT source, unnest({_TOKS}) AS t FROM documents
        ),
        cnt AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2
        ),
        tot AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS tt
          FROM cnt GROUP BY 1
        ),
        pairs AS (
          SELECT a.source AS s1, b.source AS s2, a.tt AS t1, b.tt AS t2
          FROM tot a JOIN tot b ON a.source < b.source
        ),
        num AS (
          SELECT p.s1, p.s2, p.t1, p.t2,
                 CAST(SUM(abs(COALESCE(c1.c, 0) * p.t2
                              - COALESCE(c2.c, 0) * p.t1)) AS BIGINT) AS nm
          FROM pairs p
          JOIN (SELECT DISTINCT t FROM cnt) v ON TRUE
          LEFT JOIN cnt c1 ON c1.source = p.s1 AND c1.t = v.t
          LEFT JOIN cnt c2 ON c2.source = p.s2 AND c2.t = v.t
          GROUP BY 1, 2, 3, 4
        )
        SELECT s1, s2,
               CAST(round(CAST(nm AS DOUBLE) * 1000000.0
                    / (2.0 * t1 * t2)) AS BIGINT) AS tv_ppm
        FROM num
        ORDER BY tv_ppm DESC, s1, s2
        LIMIT 10
    """,
    doc="Pairwise total-variation distance between source unigram "
    "distributions — the corpus-drift / mixture-shift metric curation "
    "uses to see which crawl sources diverge: per term the numerator "
    "|c1*T2 - c2*T1| is EXACT bigint (cross-multiplied, no per-term "
    "division), summed exactly, with ONE final float division into ppm "
    "— no float-summation order anywhere. Scale shape: one token count "
    "per (source, term) — the TF table the text stack already builds — "
    "then ONE term-keyed self-join (terms present in both sources; the "
    "one-sided mass falls out of the complement identity, so the "
    "vocabulary is never crossed with the pair space).",
    tags=("text", "curation", "agg"),
)
def text_source_tv_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    cnt = (
        docs.select(
            "source",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("tt"))
    a = tot.select(F.col("source").alias("s1"), F.col("tt").alias("t1"))
    b = tot.select(F.col("source").alias("s2"), F.col("tt").alias("t2"))
    pairs = a.join(b, F.col("s1") < F.col("s2"))
    # Complement identity: terms present in only ONE source contribute
    # |c*T_other|, and the sum of c1*T2 over s1's ENTIRE vocab is exactly
    # T1*T2 — so the numerator needs only the terms present in BOTH:
    #   nm = Σ_both |c1*T2 - c2*T1|
    #      + (T1*T2 - Σ_both c1*T2) + (T1*T2 - Σ_both c2*T1)
    # One term-keyed self-join; no vocab × pairs blow-up (the r6 first
    # cut cross-joined the vocabulary against every source pair, which
    # amplifies the term table |pairs|-fold at scale).
    c1 = cnt.select(F.col("source").alias("s1"), "t", F.col("c").alias("c1"))
    c2 = cnt.select(F.col("source").alias("s2"), "t", F.col("c").alias("c2"))
    shared = (
        c1.join(c2, "t")
        .filter(F.col("s1") < F.col("s2"))
        .join(F.broadcast(pairs), ["s1", "s2"])
        .groupBy("s1", "s2")
        .agg(
            F.sum(
                F.abs(F.col("c1") * F.col("t2") - F.col("c2") * F.col("t1"))
            ).cast("bigint").alias("nm_both"),
            F.sum(F.col("c1") * F.col("t2")).cast("bigint").alias("m1"),
            F.sum(F.col("c2") * F.col("t1")).cast("bigint").alias("m2"),
        )
    )
    # a pair sharing ZERO terms has no `shared` row but a numerator of
    # 2*T1*T2 (maximal divergence) — left-join from the pair table
    num = pairs.join(shared, ["s1", "s2"], "left").select(
        "s1", "s2", "t1", "t2",
        (
            F.coalesce(F.col("nm_both"), F.lit(0))
            + (F.col("t1") * F.col("t2")
               - F.coalesce(F.col("m1"), F.lit(0)))
            + (F.col("t1") * F.col("t2")
               - F.coalesce(F.col("m2"), F.lit(0)))
        ).cast("bigint").alias("nm"),
    )
    return (
        num.select(
            "s1", "s2",
            F.round(
                F.col("nm").cast("double") * 1000000.0
                / (2.0 * F.col("t1") * F.col("t2"))
            ).cast("bigint").alias("tv_ppm"),
        )
        .orderBy(F.desc("tv_ppm"), "s1", "s2")
        .limit(10)
    )


@register(
    "events_forecast_backtest",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ),
        lagged AS (
          SELECT event_type, day, c,
                 LAG(c) OVER (PARTITION BY event_type ORDER BY day)
                   AS yhat,
                 LAG(day) OVER (PARTITION BY event_type ORDER BY day)
                   AS prev_day
          FROM daily
        ),
        scored AS (
          SELECT event_type, abs(c - yhat) AS ae, c
          FROM lagged
          WHERE yhat IS NOT NULL AND day = prev_day + 1
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_forecasts,
               CAST(SUM(ae) AS BIGINT) AS abs_err_total,
               CAST(SUM(ae) * 1000000 // SUM(c) AS BIGINT) AS mae_ppm
        FROM scored
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Rolling-origin backtest of the naive persistence forecast "
    "(yhat_t = c_{t-1}, consecutive days only): per type the MAE as a "
    "ppm share of actual volume — the baseline every fancier forecast "
    "(Holt, seasonal) must beat, and the standard way to VALIDATE a "
    "forecasting operator instead of trusting it. All-integer (counts, "
    "absolute errors, ppm by integer division). One window pass over "
    "the tiny (type, day) series.",
    tags=("events", "stats", "window"),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select("event_type", F.expr("ts DIV 86400000000000").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "c",
        F.lag("c").over(w).alias("yhat"),
        F.lag("day").over(w).alias("prev_day"),
    )
    scored = lagged.filter(
        F.col("yhat").isNotNull() & (F.col("day") == F.col("prev_day") + 1)
    ).select("event_type", F.abs(F.col("c") - F.col("yhat")).alias("ae"), "c")
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_forecasts"),
            F.sum("ae").cast("bigint").alias("abs_err_total"),
            F.expr(
                "CAST(SUM(ae) * 1000000 DIV SUM(c) AS BIGINT)"
            ).alias("mae_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_welch_ttest",
    oracle=f"""
        WITH cells AS (
          SELECT {_MD5_BUCKET.format(
              expr="'ab:' || CAST(user_id AS VARCHAR)", m=2)} AS grp,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)
                          * CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS ssq
          FROM events WHERE event_type = 'purchase'
          GROUP BY 1
        ),
        wide AS (
          SELECT MAX(CASE WHEN grp = 0 THEN n END) AS na,
                 MAX(CASE WHEN grp = 0 THEN s END) AS sa,
                 MAX(CASE WHEN grp = 0 THEN ssq END) AS qa,
                 MAX(CASE WHEN grp = 1 THEN n END) AS nb,
                 MAX(CASE WHEN grp = 1 THEN s END) AS sb,
                 MAX(CASE WHEN grp = 1 THEN ssq END) AS qb
          FROM cells
        ),
        v AS (
          SELECT na, nb,
                 (CAST(qa AS DOUBLE)
                  - CAST(sa AS DOUBLE) * sa / na) / (na - 1) / na AS wa,
                 (CAST(qb AS DOUBLE)
                  - CAST(sb AS DOUBLE) * sb / nb) / (nb - 1) / nb AS wb,
                 CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb AS md
          FROM wide
        )
        SELECT na, nb, round(md / 100.0, 6) AS mean_diff_dollars,
               round(md / sqrt(wa + wb), 6) AS t,
               round((wa + wb) * (wa + wb)
                     / (wa * wa / (na - 1) + wb * wb / (nb - 1)), 3) AS df
        FROM v
    """,
    doc="Welch unequal-variance t-test on purchase value between the "
    "deterministic md5 A/B arms (mean-metric counterpart of the "
    "conversion z-test): the ONLY thing aggregated at event scale is "
    "integer sufficient statistics (n, sum-of-cents, sum-of-squared-"
    "cents — all exact bigint), so partial aggregation combines "
    "map-side and the whole test is one reduce; the Welch statistic and "
    "Satterthwaite df run once on six scalars in a pinned float-op "
    "order (bit-identical across engines).",
    tags=("events", "agg", "stats"),
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    cents = F.round(F.col("value") * 100).cast("bigint")
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            md5_bucket(
                F.concat(F.lit("ab:"), F.col("user_id").cast("string")), 2
            ).alias("grp"),
            cents.alias("c"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("c").cast("bigint").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ssq"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == 0, F.col("s"))).alias("sa"),
        F.max(F.when(F.col("grp") == 0, F.col("ssq"))).alias("qa"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("grp") == 1, F.col("s"))).alias("sb"),
        F.max(F.when(F.col("grp") == 1, F.col("ssq"))).alias("qb"),
    )
    v = wide.select(
        "na", "nb",
        (
            (F.col("qa").cast("double")
             - F.col("sa").cast("double") * F.col("sa") / F.col("na"))
            / (F.col("na") - 1) / F.col("na")
        ).alias("wa"),
        (
            (F.col("qb").cast("double")
             - F.col("sb").cast("double") * F.col("sb") / F.col("nb"))
            / (F.col("nb") - 1) / F.col("nb")
        ).alias("wb"),
        (
            F.col("sa").cast("double") / F.col("na")
            - F.col("sb").cast("double") / F.col("nb")
        ).alias("md"),
    )
    return v.select(
        "na", "nb",
        F.round(F.col("md") / 100.0, 6).alias("mean_diff_dollars"),
        F.round(F.col("md") / F.sqrt(F.col("wa") + F.col("wb")), 6).alias("t"),
        F.round(
            (F.col("wa") + F.col("wb")) * (F.col("wa") + F.col("wb"))
            / (
                F.col("wa") * F.col("wa") / (F.col("na") - 1)
                + F.col("wb") * F.col("wb") / (F.col("nb") - 1)
            ),
            3,
        ).alias("df"),
    )


@register(
    "text_sentence_stats",
    oracle="""
        WITH seg AS (
          SELECT source,
                 len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                 s -> length(trim(s)) > 0)) AS n_sent,
                 length(text) AS n_chars
          FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS docs,
               CAST(SUM(n_sent) AS BIGINT) AS sentences,
               CAST(SUM(n_chars) * 100 // SUM(n_sent) AS BIGINT)
                 AS chars_per_sentence_x100
        FROM seg
        GROUP BY source
        ORDER BY source
    """,
    doc="Sentence-segmentation stats per source (punctuation-split, "
    "empty segments dropped identically in both engines via an explicit "
    "trimmed-length filter): sentences per doc and chars-per-sentence "
    "(x100 integer) — the readability/fragmentation signal that "
    "separates prose sources from listy or table-dump ones. Pure narrow "
    "map + one partial-aggregated groupBy.",
    tags=("text", "curation"),
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(
            "source",
            F.expr(
                "size(filter(split(text, '[.!?]+'),"
                " s -> length(trim(s)) > 0))"
            ).alias("n_sent"),
            F.length("text").alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("docs"),
            F.sum("n_sent").cast("bigint").alias("sentences"),
            F.expr(
                "CAST(SUM(n_chars) * 100 DIV SUM(n_sent) AS BIGINT)"
            ).alias("chars_per_sentence_x100"),
        )
        .orderBy("source")
    )


@register(
    "dedup_simhash_hamming_pairs",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
          FROM documents
        ),
        votes AS (
          SELECT doc_id, sum(CASE WHEN ascii(substr(md5(tok), 1, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_0, sum(CASE WHEN ascii(substr(md5(tok), 2, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_1, sum(CASE WHEN ascii(substr(md5(tok), 3, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_2, sum(CASE WHEN ascii(substr(md5(tok), 4, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_3, sum(CASE WHEN ascii(substr(md5(tok), 5, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_4, sum(CASE WHEN ascii(substr(md5(tok), 6, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_5, sum(CASE WHEN ascii(substr(md5(tok), 7, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_6, sum(CASE WHEN ascii(substr(md5(tok), 8, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_7, sum(CASE WHEN ascii(substr(md5(tok), 9, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_8, sum(CASE WHEN ascii(substr(md5(tok), 10, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_9, sum(CASE WHEN ascii(substr(md5(tok), 11, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_10, sum(CASE WHEN ascii(substr(md5(tok), 12, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_11, sum(CASE WHEN ascii(substr(md5(tok), 13, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_12, sum(CASE WHEN ascii(substr(md5(tok), 14, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_13, sum(CASE WHEN ascii(substr(md5(tok), 15, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_14, sum(CASE WHEN ascii(substr(md5(tok), 16, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v_15 FROM toks GROUP BY doc_id
        ),
        sh AS (
          SELECT doc_id, CAST(CASE WHEN v_0 > 0 THEN 1 ELSE 0 END + CASE WHEN v_1 > 0 THEN 2 ELSE 0 END + CASE WHEN v_2 > 0 THEN 4 ELSE 0 END + CASE WHEN v_3 > 0 THEN 8 ELSE 0 END + CASE WHEN v_4 > 0 THEN 16 ELSE 0 END + CASE WHEN v_5 > 0 THEN 32 ELSE 0 END + CASE WHEN v_6 > 0 THEN 64 ELSE 0 END + CASE WHEN v_7 > 0 THEN 128 ELSE 0 END + CASE WHEN v_8 > 0 THEN 256 ELSE 0 END + CASE WHEN v_9 > 0 THEN 512 ELSE 0 END + CASE WHEN v_10 > 0 THEN 1024 ELSE 0 END + CASE WHEN v_11 > 0 THEN 2048 ELSE 0 END + CASE WHEN v_12 > 0 THEN 4096 ELSE 0 END + CASE WHEN v_13 > 0 THEN 8192 ELSE 0 END + CASE WHEN v_14 > 0 THEN 16384 ELSE 0 END + CASE WHEN v_15 > 0 THEN 32768 ELSE 0 END AS BIGINT) AS h FROM votes
        ),
        banded AS (
          SELECT doc_id, h,
                 h % 64 AS b0, (h // 64) % 32 AS b1, h // 2048 AS b2
          FROM sh
        ),
        cand AS (
          SELECT x.doc_id AS a, y.doc_id AS b, x.h AS ha, y.h AS hb
          FROM banded x JOIN banded y
            ON x.b0 = y.b0 AND x.doc_id < y.doc_id
          UNION
          SELECT x.doc_id, y.doc_id, x.h, y.h
          FROM banded x JOIN banded y
            ON x.b1 = y.b1 AND x.doc_id < y.doc_id
          UNION
          SELECT x.doc_id, y.doc_id, x.h, y.h
          FROM banded x JOIN banded y
            ON x.b2 = y.b2 AND x.doc_id < y.doc_id
        )
        SELECT CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM cand
        WHERE bit_count(xor(ha, hb)) <= 2
        GROUP BY 1
        ORDER BY 1
    """,
    doc="SimHash near-dup pairs at Hamming distance <= 2 via the "
    "pigeonhole band trick (the crawl-dedup construction): split the "
    "16-bit fingerprint into 3 bands (6/5/5 bits) — any pair within "
    "Hamming 2 must agree on at least one band, so the band equi-joins "
    "generate a COMPLETE candidate set (no recall loss, unlike minhash "
    "LSH) and the exact bit_count(xor) filter keeps true pairs only. "
    "Scale shape: three hash-keyed self-joins on band buckets, never a "
    "cross product; candidate volume is sum of squared bucket sizes — "
    "at 64-bit fingerprints and more bands the same plan holds.",
    tags=("dedup", "sketch"),
)
def dedup_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from icebergsql_spark.operators.util import track_cache

    sh = dedup.simhash16(docs).withColumnRenamed("simhash", "h")
    # one 2-int row per doc, referenced SIX times (two sides x three
    # band joins) — without a cache the token-explode vote aggregate
    # behind simhash16 executes six times
    banded = track_cache(sh.select(
        "doc_id",
        F.col("h").cast("bigint").alias("h"),
        F.expr("CAST(h % 64 AS BIGINT)").alias("b0"),
        F.expr("CAST((h DIV 64) % 32 AS BIGINT)").alias("b1"),
        F.expr("CAST(h DIV 2048 AS BIGINT)").alias("b2"),
    ))
    cand = None
    for b in ("b0", "b1", "b2"):
        x = banded.select(
            F.col("doc_id").alias("a"), F.col("h").alias("ha"),
            F.col(b).alias("bv"),
        )
        y = banded.select(
            F.col("doc_id").alias("b"), F.col("h").alias("hb"),
            F.col(b).alias("bv"),
        )
        p = (
            x.join(y, "bv")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "ha", "hb")
        )
        cand = p if cand is None else cand.unionAll(p)
    return (
        cand.distinct()
        .select(F.expr("CAST(bit_count(ha ^ hb) AS INT)").alias("hamming"))
        .filter(F.col("hamming") <= 2)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


@register(
    "events_stream_kmv_distinct",
    oracle="""
        WITH h AS (
          SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
          FROM events
        ),
        ranked AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h)
                   AS r
          FROM h
        ),
        agg AS (
          SELECT event_type, MAX(h) AS hk, COUNT(*) AS m
          FROM ranked WHERE r <= 256
          GROUP BY 1
        )
        SELECT event_type,
               CAST(round(CASE WHEN m < 256 THEN CAST(m AS DOUBLE)
                    ELSE 255.0 / (CAST(CAST('0x' || substr(hk, 1, 13)
                                   AS BIGINT) AS DOUBLE)
                                  / 4503599627370496.0) END) AS BIGINT)
                 AS dv_estimate
        FROM agg
        ORDER BY event_type
    """,
    doc="Streaming twin of the KMV distinct sketch: each micro-batch "
    "appends its per-type bottom-k hash set to the sink (a SUM-free, "
    "UNION-mergeable sketch — arrival order and batch chopping cannot "
    "change bottom-k of the union, the associativity that makes KMV "
    "the per-shard/per-day distinct counter at 100 TB); the finalizer "
    "merges with one more bottom-k and applies the (k-1)/frac "
    "estimator. Exact below k per key (the sf<=0.01 rows), estimate "
    "above; both hash-match the batch oracle because md5 bottom-k is "
    "deterministic.",
    tags=("sketch", "events", "streaming"),
)
def events_stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import Window

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-kmvsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-kmvout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        w = Window.partitionBy("event_type").orderBy("h")
        (
            batch_df.select(
                "event_type",
                F.md5(F.col("user_id").cast("string")).alias("h"),
            )
            .distinct()
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 256)
            .select("event_type", "h")
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-kmvck-")

    w = Window.partitionBy("event_type").orderBy("h")
    merged = (
        spark.read.parquet(out)
        .distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 256)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
    )
    frac = (
        F.conv(F.substring("hk", 1, 13), 16, 10).cast("double")
        / F.lit(4503599627370496.0)
    )
    return merged.select(
        "event_type",
        F.round(
            F.when(F.col("m") < 256, F.col("m").cast("double")).otherwise(
                F.lit(255.0) / frac
            )
        ).cast("bigint").alias("dv_estimate"),
    ).orderBy("event_type")


@register(
    "multimodal_wav_stats",
    oracle="""
        WITH amps AS (
          SELECT doc_id,
                 list_transform(generate_series(0, 255),
                   i -> (doc_id * 7 + i * 13) % 65536 - 32768) AS a
          FROM documents
        )
        SELECT doc_id,
               256 AS n_samples,
               16000 AS sample_rate,
               CAST(list_sum(a) AS BIGINT) AS amp_sum,
               CAST(list_sum(list_transform(a, x -> abs(x))) AS BIGINT)
                 AS abs_sum,
               CAST(list_max(list_transform(a, x -> abs(x))) AS INTEGER)
                 AS max_abs
        FROM amps
        ORDER BY doc_id
    """,
    doc="REAL audio decode end-to-end (the audio counterpart of "
    "multimodal_pixel_stats): per doc a 256-sample int16 waveform "
    "(s_i = (doc_id*7 + i*13) % 65536 - 32768) is ENCODED as a genuine "
    "RIFF/PCM WAV payload and DECODED by operators/multimodal."
    "decode_audio (chunk-walking RIFF parser — fmt/data located by "
    "chunk id, padding honored), then reduced to exact int64 amplitude "
    "sums. The oracle recomputes from the sample formula, so a "
    "mis-parsed header field, byte order, or chunk offset "
    "hash-mismatches. Both stages are Arrow-batched narrow maps.",
    tags=("pipeline", "multimodal"),
)
def multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = [
                multimodal.encode_wav(
                    ((int(d) * 7 + i * 13) % 65536 - 32768
                     for i in range(256)),
                    16000,
                )
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.audio_stats(blobs).orderBy("doc_id")
