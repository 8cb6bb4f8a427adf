"""Round-9 gate wave, PRE-AUTHORED in late round 8 (not yet imported by
``plans/__init__.load_all`` — importing it is round 9's registration
step, after the WINDOW_PRIORITY rotation the round-8 comment mandates).

Gates over the round-8 seed operators: Theil-Sen robust trend,
hash-sample quantile sketch, Markov removal-effect attribution,
personalized PageRank, LSH-tier precision/recall, MMR diversity,
whitening audit, modularity. Every oracle here was verified green at
sf0.001 + sf0.01 + sf0.1 in round 8 via the driver-sim recipe with this
module imported explicitly.
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


@register(
    "events_theil_sen",
    oracle="""
        WITH daily AS (
          SELECT epoch_ns(ts) // 86400000000000 AS x,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events WHERE event_type = 'purchase' GROUP BY 1
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
    doc="Theil-Sen robust trend over the daily purchase series — the "
    "outlier-proof sibling of events_ols_trend (median of all pairwise "
    "slopes, 29% breakdown point vs OLS's zero). The lower median is "
    "selected under a total order (double ratio as sort key with "
    "(num, den) tiebreak; the exact bigint rational rides along and is "
    "emitted beside the one final float division). Scale shape: the "
    "pairwise self-join is over the AGGREGATED |days|-row series — "
    "bounded by the calendar, never event volume.",
    tags=("events", "stats", "join"),
)
def events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.temporal import theil_sen_slope

    load_tables(spark, sf_dir, ("events",))
    daily = spark.sql("""
        SELECT ts DIV 86400000000000 AS x, CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    """)
    return theil_sen_slope(daily)


@register(
    "sketch_sample_quantiles",
    oracle="""
        WITH s AS (
          SELECT value AS v FROM events
          WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                       1, 8) AS BIGINT) % 16 = 0
        ),
        q AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS sample_n,
                 quantile_cont(v, [CAST(25 AS DOUBLE) / 100.0,
                                   CAST(50 AS DOUBLE) / 100.0,
                                   CAST(75 AS DOUBLE) / 100.0,
                                   CAST(90 AS DOUBLE) / 100.0,
                                   CAST(99 AS DOUBLE) / 100.0]) AS vals
          FROM s
        ),
        idx AS (SELECT unnest([1, 2, 3, 4, 5]) AS i,
                       unnest([25, 50, 75, 90, 99]) AS q_pct)
        SELECT CAST(idx.q_pct AS INTEGER) AS q_pct,
               q.sample_n,
               q.vals[idx.i] AS value
        FROM q CROSS JOIN idx
        ORDER BY q_pct
    """,
    doc="Deterministic mergeable quantile sketch over events.value: rows "
    "whose md5(event_id) bucket is 0 mod 16 form the sample (no RNG — "
    "the sample is a pure function of the data, identical across "
    "engines/partitionings/retries; merging two sketches is a bare "
    "union, the property KLL buys with randomized compaction), exact "
    "interpolated quantiles over the sample (Spark percentile == DuckDB "
    "quantile_cont bit-for-bit per the engine-parity rules). Scale "
    "shape: the sketch state is n/16 sampled rows — pick the divisor so "
    "the sample fits the exchange budget at the target volume.",
    tags=("sketch", "agg"),
)
def sketch_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.sketch import hash_sample_quantiles

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return hash_sample_quantiles(
        ev, "event_id", "value", divisor=16
    ).orderBy("q_pct")


def _markov_steps_sql(steps: int) -> str:
    """Unrolled absorption steps: v0 = START mass, each step joins the
    scenario-filtered transition table and floor-divides per product —
    textually the same integer recurrence markov_removal_effect runs."""
    ctes = [
        "v0 AS (SELECT removed, 'START' AS s, CAST(1000000 AS BIGINT) AS q "
        "FROM scen)"
    ]
    for k in range(1, steps + 1):
        ctes.append(
            f"v{k} AS (SELECT v.removed, t.nxt AS s, "
            f"CAST(SUM((v.q * t.p) // 1000000) AS BIGINT) AS q "
            f"FROM v{k - 1} v JOIN t ON t.removed = v.removed "
            f"AND t.cur = v.s "
            f"WHERE v.s NOT IN ('CONV', 'NULL') GROUP BY 1, 2)"
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM v{k}" for k in range(1, steps + 1)
    )
    return ",\n        ".join(ctes) + f""",
        absorbed AS (
          SELECT removed, CAST(SUM(q) AS BIGINT) AS pconv
          FROM ({union}) WHERE s = 'CONV' GROUP BY 1
        )"""


_MARKOV_ORACLE = f"""
        WITH seq AS (
          SELECT user_id,
                 CASE WHEN event_type = 'purchase' THEN 'CONV'
                      ELSE event_type END AS state,
                 row_number() OVER (
                   PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                 ) AS rn
          FROM events
        ),
        crn AS (
          SELECT user_id, MIN(rn) AS crn FROM seq
          WHERE state = 'CONV' GROUP BY 1
        ),
        path AS (
          SELECT s.user_id, s.state, s.rn,
                 lead(s.state) OVER (
                   PARTITION BY s.user_id ORDER BY s.rn
                 ) AS nxt
          FROM seq s LEFT JOIN crn ON crn.user_id = s.user_id
          WHERE crn.crn IS NULL OR s.rn <= crn.crn
        ),
        trans_rows AS (
          SELECT 'START' AS cur, state AS nxt FROM path WHERE rn = 1
          UNION ALL
          SELECT state, nxt FROM path WHERE nxt IS NOT NULL
          UNION ALL
          SELECT state, 'NULL' FROM path
          WHERE nxt IS NULL AND state <> 'CONV'
        ),
        counts AS (
          SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
          FROM trans_rows GROUP BY 1, 2
        ),
        totals AS (
          SELECT cur, CAST(SUM(c) AS BIGINT) AS tt FROM counts GROUP BY 1
        ),
        trans AS (
          SELECT counts.cur, counts.nxt,
                 CAST((c * 1000000) // tt AS BIGINT) AS p
          FROM counts JOIN totals ON totals.cur = counts.cur
        ),
        channels AS (
          SELECT DISTINCT cur AS ch FROM trans WHERE cur <> 'START'
        ),
        scen AS (
          SELECT 'BASE' AS removed UNION ALL SELECT ch FROM channels
        ),
        t AS (
          SELECT s.removed, tr.cur, tr.nxt, tr.p
          FROM scen s JOIN trans tr
            ON s.removed = 'BASE' OR tr.cur <> s.removed
        ),
        {_markov_steps_sql(4)},
        base AS (SELECT pconv AS pb FROM absorbed WHERE removed = 'BASE')
        SELECT c.ch AS channel,
               CAST(base.pb AS BIGINT) AS p_base_ppm,
               CAST(COALESCE(a.pconv, 0) AS BIGINT) AS p_removed_ppm,
               CASE WHEN base.pb = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(((base.pb - COALESCE(a.pconv, 0)) * 1000000)
                              // base.pb AS BIGINT) END
                 AS removal_effect_ppm
        FROM channels c
        CROSS JOIN base
        LEFT JOIN absorbed a ON a.removed = c.ch
        ORDER BY channel
"""


@register(
    "events_markov_attribution",
    oracle=_MARKOV_ORACLE,
    doc="Markov-chain removal-effect attribution over per-user event "
    "paths (operators/temporal.markov_removal_effect): sequences "
    "truncate at the FIRST conversion, first-order transition "
    "probabilities are exact ppm integers from one pair-count shuffle, "
    "and each channel's removal effect is the drop in 4-step absorbed "
    "conversion mass when its outgoing transitions vanish — the "
    "data-driven alternative to last-touch attribution. The oracle "
    "UNROLLS the identical integer absorption recurrence (per-product "
    "floor, then sum — order-independent bigints), so Spark and DuckDB "
    "bit-match; the pure-Python fuzz in tests/test_seed_operators.py "
    "pins the same recurrence. Scale shape: the chain is channels+2 "
    "states (bounded metadata); only the pair-count aggregate touches "
    "event volume.",
    tags=("events", "stats", "graph"),
)
def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.temporal import markov_removal_effect

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return markov_removal_effect(ev, steps=4).orderBy("channel")


def _ppr_round_sql(k: int) -> str:
    """One unrolled PPR round: inflow from v{k-1}, then teleport +
    damped inflow — textually the operator's exact bigint recurrence."""
    return f"""
        i{k} AS (
          SELECT e.b AS n, CAST(SUM(v.q // o.od) AS BIGINT) AS s
          FROM e JOIN v{k - 1} v ON v.n = e.a
          JOIN outdeg o ON o.a = e.a
          GROUP BY 1
        ),
        v{k} AS (
          SELECT f.n,
                 CAST(CASE WHEN f.is_seed = 1
                       THEN ((1000000000000 // ns.k) * 15) // 100
                       ELSE 0 END
                      + (85 * COALESCE(i{k}.s, 0)) // 100 AS BIGINT) AS q
          FROM flag f CROSS JOIN ns LEFT JOIN i{k} ON i{k}.n = f.n
        )"""


def _ppr_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    rounds = ",".join(_ppr_round_sql(k) for k in (1, 2, 3))
    return (
        _EDGE_SQL
        + f""",
        nodes AS (SELECT DISTINCT a AS n FROM e),
        seeds AS (SELECT n FROM nodes ORDER BY n LIMIT 2),
        ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM seeds),
        outdeg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS od
                   FROM e GROUP BY 1),
        flag AS (
          SELECT n, CASE WHEN n IN (SELECT n FROM seeds) THEN 1 ELSE 0 END
                   AS is_seed
          FROM nodes
        ),
        v0 AS (
          SELECT f.n,
                 CAST(CASE WHEN f.is_seed = 1
                      THEN 1000000000000 // ns.k ELSE 0 END AS BIGINT) AS q
          FROM flag f CROSS JOIN ns
        ),
        {rounds}
        SELECT n AS node, q AS score_q FROM v3
        ORDER BY score_q DESC, node
    """
    )


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(),
    doc="Personalized PageRank on the token co-occurrence graph "
    "(operators/graph.personalized_pagerank): teleport mass lands only "
    "on the two lexicographically-smallest nodes, so the stationary "
    "mass concentrates around the seed neighborhood — the related-item "
    "primitive uniform pagerank can't express. Exact bigint rounds "
    "(teleport ((SCALE DIV ns)*15) DIV 100 + damped integer inflow; "
    "non-negative operands, so Spark DIV == DuckDB //); the oracle "
    "unrolls the identical 3-round recurrence, and the pure-Python fuzz "
    "in tests/test_seed_operators.py pins the same algebra on random "
    "digraphs. Scale shape: identical to graph_pagerank — the per-round "
    "cost is one contribution join on the cached edge list; the seed "
    "flag rides a broadcast join, adding no shuffle.",
    tags=("graph", "join"),
)
def graph_personalized_pagerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.graph import personalized_pagerank

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
    nodes = e.select(F.col("a").alias("node")).distinct()
    seeds = nodes.orderBy("node").limit(2)
    return personalized_pagerank(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        seeds,
        iterations=3,
    ).orderBy(F.desc("score_q"), "node")


def _tier_eval_oracle() -> str:
    from icebergsql_spark.plans.pipeline import (
        _BANDS_SQL,
        _CAND_UNION,
        _SIG_COLS,
        _WORDS_CTE,
    )

    return f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
        {_WORDS_CTE},
        sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                  FROM words GROUP BY doc_id),
        common AS (
          SELECT wa.doc_id AS a, wb.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS c
          FROM words wa JOIN words wb
            ON wa.w = wb.w AND wa.doc_id < wb.doc_id
          GROUP BY 1, 2
        ),
        truth AS (
          SELECT common.a, common.b
          FROM common
          JOIN sizes sa ON sa.doc_id = common.a
          JOIN sizes sb ON sb.doc_id = common.b
          WHERE round(c / (sa.sz + sb.sz - c), 6) >= 0.5
        ),
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM words GROUP BY doc_id),
        bands AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
        cand AS ({_CAND_UNION}),
        joined AS (
          SELECT COALESCE(t.a, c.a) AS a, COALESCE(t.b, c.b) AS b,
                 CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END AS in_truth,
                 CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS in_cand
          FROM truth t FULL OUTER JOIN cand c ON t.a = c.a AND t.b = c.b
        ),
        agg AS (
          SELECT CAST(SUM(in_truth) AS BIGINT) AS n_truth,
                 CAST(SUM(in_cand) AS BIGINT) AS n_candidates,
                 CAST(SUM(in_truth * in_cand) AS BIGINT) AS n_hits
          FROM joined
        )
        SELECT n_truth, n_candidates, n_hits,
               CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST((n_hits * 1000000) // n_candidates AS BIGINT)
               END AS precision_ppm,
               CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST((n_hits * 1000000) // n_truth AS BIGINT)
               END AS recall_ppm
        FROM agg
    """


@register(
    "dedup_tier_eval",
    oracle=_tier_eval_oracle(),
    doc="Candidate-tier evaluation harness "
    "(operators/dedup.neardup_tier_eval): precision/recall of the "
    "banded-minhash LSH tier against EXACT word-set Jaccard ground "
    "truth on the bounded doc_id<150 slice — "
    "dedup_minhash_calibration's decision-level sibling (that gate "
    "audits estimator error; this one audits whether the candidate SET "
    "recalls the duplicates it claims). Both tiers reuse the engine-"
    "parity spellings the existing gates lock (md5 signatures, banded "
    "self-join, shingle-join exact Jaccard); the verdict is one "
    "full-outer join + a single integer-ppm aggregate. Scale: ground "
    "truth cost is slice-bounded; band collision probability depends "
    "only on similarity, so the measured recall transfers to the full "
    "corpus.",
    tags=("dedup", "sketch"),
)
def dedup_tier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.dedup import neardup_tier_eval

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 150
    )
    return neardup_tier_eval(docs, threshold=0.5, n=1)


@register(
    "multimodal_keyframes",
    oracle="""
        WITH f AS (
          SELECT doc_id, CAST(4 + doc_id % 3 AS INTEGER) AS nf
          FROM documents
        ),
        lv AS (
          SELECT doc_id, nf,
                 list_transform(generate_series(0, nf - 1),
                   j -> CASE WHEN (doc_id * 7 + j * j) % 5 < 2
                             THEN 190 ELSE 40 END) AS L
          FROM f
        ),
        kf AS (
          SELECT doc_id, nf,
                 list_prepend(0, list_filter(generate_series(1, nf - 1),
                   j -> L[j + 1] != L[j])) AS kept,
                 CASE WHEN len(list_filter(generate_series(1, nf - 1),
                        j -> L[j + 1] != L[j])) > 0
                      THEN 150000000 ELSE 0 END AS mj
          FROM lv
        )
        SELECT doc_id,
               nf AS n_frames,
               CAST(len(kept) AS INTEGER) AS n_keyframes,
               array_to_string(kept, ',') AS keyframe_idx,
               CAST(mj AS BIGINT) AS mean_jump_q
        FROM kf
        ORDER BY doc_id
    """,
    doc="Content-based keyframe selection over RIFF frame payloads "
    "(operators/multimodal.keyframe_select, the scene-change policy next "
    "to riff_frame_index's blind stride): each doc carries 4+doc_id%3 "
    "FLAT 4x2 PPM frames whose level is two-valued (190/40 by "
    "(doc_id*7+j*j)%5<2), so the sequential keep-vs-last-KEPT policy "
    "provably collapses to a per-frame lag rule — with two levels, the "
    "previous frame's level always equals the last kept frame's level — "
    "and the oracle recomputes the kept index list and the 150e6-q max "
    "jump in closed form (a decode drift, level mis-average, or "
    "off-by-one in the kept semantics hash-mismatches). Decode→policy "
    "is one Arrow-batched narrow map, frame-local at any corpus size.",
    tags=("pipeline", "multimodal"),
)
def multimodal_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id"
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for j in range(4 + d % 3):
                    level = 190 if (d * 7 + j * j) % 5 < 2 else 40
                    frames.append(
                        multimodal.encode_ppm(4, 2, bytes([level] * 24))
                    )
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.keyframe_select(blobs, threshold_q=5_000_000).orderBy(
        "doc_id"
    )


def _modularity_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL

    return (
        _EDGE_SQL
        + """,
        lbl AS (
          SELECT a AS n, least(a, MIN(b)) AS c FROM e GROUP BY a
        ),
        tagged AS (
          SELECT h.a, h.b, la.c AS ca, lb.c AS cb
          FROM half h JOIN lbl la ON la.n = h.a JOIN lbl lb ON lb.n = h.b
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM tagged),
        intra AS (
          SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS e_c
          FROM tagged WHERE ca = cb GROUP BY 1
        ),
        deg AS (
          SELECT c, CAST(COUNT(*) AS BIGINT) AS d_c FROM (
            SELECT ca AS c FROM tagged
            UNION ALL SELECT cb AS c FROM tagged
          ) GROUP BY 1
        ),
        per_c AS (
          SELECT deg.c, CAST(COALESCE(intra.e_c, 0) AS BIGINT) AS e_c,
                 deg.d_c
          FROM deg LEFT JOIN intra ON intra.c = deg.c
        )
        SELECT m.m,
               CAST(SUM(4 * m.m * e_c - d_c * d_c) AS BIGINT) AS q_num,
               CAST(4 * m.m * m.m AS BIGINT) AS q_denom,
               CAST(SUM(4 * m.m * e_c - d_c * d_c) AS DOUBLE)
                 / CAST(4 * m.m * m.m AS DOUBLE) AS q
        FROM per_c CROSS JOIN m
        GROUP BY m.m
    """
    )


@register(
    "graph_modularity",
    oracle=_modularity_oracle(),
    doc="Newman modularity (operators/graph.modularity_q) of a one-round "
    "min-label community assignment on the token co-occurrence graph — "
    "the quality score that makes community detection auditable (run "
    "label propagation, SCORE it, compare rounds): Q as the exact "
    "rational Q_num/(4m^2) with Q_num = sum_c(4*m*e_c - d_c^2), every "
    "term a bigint (intra-edge counts, community degree sums), one "
    "final float division in mirrored operand order. Scale shape: label "
    "lookup is a broadcast join per edge endpoint; both aggregates are "
    "bounded by communities, and the null model comes from the degree "
    "sums — no non-edge enumeration anywhere.",
    tags=("graph", "agg"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import modularity_q

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
    labels = e.groupBy(F.col("a").alias("n")).agg(
        F.least(F.col("n"), F.min("b")).alias("lbl")
    )
    return modularity_q(half, labels)


def _mmr_oracle(query_id: int = 1, k: int = 8, lam: int = 70,
                candidates: int = 40) -> str:
    dot_ab = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    )

    def sq(t: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, 64), "
            f"i -> {t}.embedding[i]::DOUBLE * {t}.embedding[i]::DOUBLE))"
        )

    inv = 100 - lam
    picks = []
    for r in range(2, k + 1):
        picks.append(f"""
        pick{r} AS MATERIALIZED (
          SELECT {r} AS rank, c.vec_id, c.rel_nano,
                 CAST(MAX(ss.s) AS BIGINT) AS ms
          FROM cand c
          JOIN simsym ss ON ss.ia = c.vec_id
          JOIN sel{r - 1} s ON ss.ib = s.vec_id
          WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
          GROUP BY c.vec_id, c.rel_nano
          ORDER BY {lam} * c.rel_nano - {inv} * MAX(ss.s) DESC, c.vec_id
          LIMIT 1
        ),
        sel{r} AS MATERIALIZED (SELECT * FROM sel{r - 1} UNION ALL SELECT * FROM pick{r})""")
    return f"""
        WITH q AS (SELECT embedding FROM embeddings
                   WHERE vec_id = {query_id}),
        cand AS MATERIALIZED (
          SELECT b.vec_id,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('b')} * {sq('a')})) AS BIGINT) AS rel_nano
          FROM q a CROSS JOIN embeddings b
          WHERE b.vec_id != {query_id}
          ORDER BY rel_nano DESC, b.vec_id
          LIMIT {candidates}
        ),
        cvec AS (
          SELECT c.vec_id, e.embedding, c.rel_nano
          FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('a')} * {sq('b')})) AS BIGINT) AS s
          FROM cvec a JOIN cvec b ON a.vec_id < b.vec_id
        ),
        simsym AS MATERIALIZED (
          SELECT ia, ib, s FROM sims
          UNION ALL SELECT ib AS ia, ia AS ib, s FROM sims
        ),
        sel1 AS MATERIALIZED (
          SELECT 1 AS rank, vec_id, rel_nano, CAST(0 AS BIGINT) AS ms
          FROM cand ORDER BY rel_nano DESC, vec_id LIMIT 1
        ),{",".join(picks)}
        SELECT CAST(rank AS INTEGER) AS rank, vec_id, rel_nano,
               ms AS maxsim_nano,
               CAST({lam} * rel_nano - {inv} * ms AS BIGINT) AS mmr_nano
        FROM sel{k} ORDER BY rank
    """


@register(
    "curation_mmr_topk",
    oracle=_mmr_oracle(),
    doc="Maximal-marginal-relevance diversity selection "
    "(operators/similarity.mmr_select): top-40 candidates by exact "
    "cosine relevance in one narrow scan, candidate-pair cosine matrix "
    "engine-side, every score quantized to integer nanos, then the "
    "inherently-sequential greedy (lambda*rel - (1-lambda)*max-sim vs "
    "the selected set, lowest-id tiebreak) runs in pure integer "
    "arithmetic over the bounded matrix — the retrieval-diversification "
    "primitive behind dedup-aware context packing. The oracle UNROLLS "
    "all 8 greedy picks as chained CTEs over the identical nano-"
    "quantized scores, so the full pick ORDER hash-matches, not just "
    "the selected set. Scale shape: only the relevance scan touches "
    "corpus volume; everything after is candidates^2-bounded.",
    tags=("embeddings", "ann", "curation"),
)
def curation_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.similarity import mmr_select

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return mmr_select(
        emb, query_id=1, k=8, lambda_pct=70, candidates=40
    ).orderBy("rank")


@register(
    "emb_whitening_audit",
    # no SQL oracle: W comes from a driver-side eigh over EXACT bigint
    # covariance stats (bitwise partition-invariant input, deterministic
    # LAPACK output) — the gate self-asserts the whitening property
    # in-query instead (the plan-assert pattern), and the driver records
    # the rows-only check.
    oracle=None,
    doc="ZCA whitening audit (operators/ml.whitening_transform / "
    "apply_whitening): the transform is derived from one exact-bigint "
    "covariance pass (partitioning/retry-invariant input to a "
    "deterministic dims^3 driver-side eigh — the bounded-metadata "
    "budget of a k-means centroid table), applied as fixed per-"
    "dimension expressions fused into the scan. The query recomputes "
    "the WHITENED data's covariance with the same exact-stats pass and "
    "ASSERTS in-DAG that it is the identity within 5% (off-diagonals "
    "near 0, diagonals near 1) — a wrong mean, transposed W, or "
    "un-centered apply fails the assert. Emits the 21 whitened "
    "covariance entries in ppm.",
    tags=("embeddings", "ml", "agg"),
)
def emb_whitening_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import (
        apply_whitening,
        whitening_transform,
    )

    dims = 6
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    mean, w = whitening_transform(emb, dims=dims)
    white = apply_whitening(emb, mean, w, dims=dims)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for i in range(dims):
        aggs.append(F.sum(F.col(f"white_{i}")).alias(f"s{i}"))
        for j in range(i, dims):
            aggs.append(
                F.sum(F.col(f"white_{i}") * F.col(f"white_{j}")).alias(
                    f"p{i}_{j}"
                )
            )
    row = white.agg(*aggs).collect()[0]
    n = int(row["n"])
    out = []
    for i in range(dims):
        for j in range(i, dims):
            cov = (n * row[f"p{i}_{j}"] - row[f"s{i}"] * row[f"s{j}"]) / (
                float(n) * n
            )
            target = 1.0 if i == j else 0.0
            assert abs(cov - target) < 0.05, (
                f"whitened cov[{i},{j}]={cov} is not {target}"
            )
            out.append((i, j, int(round(cov * 1_000_000))))
    return local_result(spark, out, "i int, j int, cov_ppm long").orderBy(
        "i", "j"
    )


@register(
    "managed_ref_retention",
    oracle="""
        WITH o AS (SELECT o_orderkey AS k,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders)
        SELECT scope, n, total FROM (
          SELECT 'branch' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 5 IN (0, 1)
          UNION ALL
          SELECT 'main' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 5 IN (0, 1, 2)
        ) ORDER BY scope
    """,
    doc="Per-ref retention policy end-to-end (round-8 managed feature "
    "through its SQL grammar): three appends build s1..s3; `CREATE TAG "
    "pin AS OF VERSION s1 RETAIN 1 MINUTES` and `CREATE BRANCH audit AS "
    "OF VERSION s2 WITH SNAPSHOT RETENTION 1 SNAPSHOTS` land policy "
    "fields $refs exposes; expire_snapshots(now_ms = s1+10min) then (a) "
    "expires the aged-out TAG with the pass (max-ref-age-ms), so s1 — "
    "whose only pin it was — GCs, while (b) the branch keeps exactly "
    "its head s2 alive. In-DAG asserts: expired_refs == 1, 'pin' gone, "
    "'audit' alive, exactly one snapshot expired, time travel to s1 "
    "raises. Result: main + branch scan aggregates (integer cents), "
    "oracled against raw orders. Reference analogue: "
    "SparkTableOperations' snapshot lifecycle, extended by the Iceberg "
    "ref-retention semantics the jar provides upstream.",
    tags=("managed", "maintenance", "tags"),
)
def managed_ref_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-refret-"))
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    src = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        (F.col("o_orderkey") % 5).cast("int").alias("part"),
    )
    cat = eng.catalog
    tbl = cat.create_table(
        "refret", "k bigint, c bigint, part int", partition_cols=["part"]
    )
    s1 = tbl.insert(nonempty(src.filter(F.col("part") == 0)))
    s2 = tbl.insert(nonempty(src.filter(F.col("part") == 1)))
    s3 = tbl.insert(nonempty(src.filter(F.col("part") == 2)))
    mark_setup_done()  # history built; ref retention + expiry is the op
    eng.sql(
        f"ALTER TABLE refret CREATE TAG pin AS OF VERSION "
        f"{s1.snapshot_id} RETAIN 1 MINUTES"
    )
    eng.sql(
        f"ALTER TABLE refret CREATE BRANCH audit AS OF VERSION "
        f"{s2.snapshot_id} WITH SNAPSHOT RETENTION 1 SNAPSHOTS"
    )
    res = tbl.expire_snapshots(
        retain_last=1, now_ms=s1.timestamp_ms + 10 * 60_000
    )
    assert res["expired_refs"] == 1, res
    assert res["expired_snapshots"] == 1, res
    tbl.refresh()
    assert "pin" not in tbl.meta.refs and "audit" in tbl.meta.refs
    try:
        tbl.to_df(snapshot_id=s1.snapshot_id)
        raise AssertionError("time travel to the GC'd s1 must raise")
    except ValueError:
        pass
    # `$metadata_log` audit trail (table.py:3311): one row per committed
    # metadata.json version — create + 3 inserts + tag + branch + expire.
    # The POINTER trail is append-only: it still remembers the era whose
    # snapshot (s1) the expire pass just GC'd, and its final row reflects
    # the post-expire current state.
    log = eng.sql("SELECT * FROM `refret$metadata_log`").collect()
    assert len(log) >= 7, len(log)
    ts = [r["timestamp_ms"] for r in log]
    assert ts == sorted(ts), ts
    assert log[0]["latest_snapshot_id"] is None, log[0]
    assert any(r["latest_snapshot_id"] == s1.snapshot_id for r in log)
    assert log[-1]["latest_snapshot_id"] == tbl.meta.current_snapshot_id
    assert log[-1]["latest_sequence_number"] == s3.sequence_number, log[-1]

    def agg(df, scope):
        return df.agg(
            F.lit(scope).alias("scope"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
        )

    return (
        agg(tbl.to_df(ref="audit"), "branch")
        .unionAll(agg(tbl.to_df(), "main"))
        .orderBy("scope")
    )


@register(
    "text_burstiness",
    oracle="""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS t,
                 generate_subscripts(
                   regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
          FROM documents
        ),
        seq AS (
          SELECT t,
                 row_number() OVER (ORDER BY doc_id, pos) AS gi
          FROM tok
        ),
        top AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c
          FROM seq GROUP BY t ORDER BY c DESC, t LIMIT 20
        ),
        gaps AS (
          SELECT s.t,
                 CAST(s.gi - lag(s.gi) OVER (PARTITION BY s.t ORDER BY s.gi)
                      AS BIGINT) AS g
          FROM seq s JOIN top ON top.t = s.t
        ),
        agg AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(g) AS BIGINT) AS sg,
                 CAST(SUM(g * g) AS BIGINT) AS sgg
          FROM gaps WHERE g IS NOT NULL GROUP BY t
        )
        SELECT t AS token, n AS n_gaps, sg AS gap_sum,
               CAST(((n * sgg - sg * sg) * 1000000) // (n * sg) AS BIGINT)
                 AS fano_ppm
        FROM agg
        ORDER BY fano_ppm DESC, token
    """,
    doc="Token burstiness via the Fano factor of recurrence gaps: for "
    "the 20 most frequent tokens, the gap series between consecutive "
    "occurrences (global corpus position = row_number over (doc, pos)) "
    "yields var/mean = (n*Sgg - Sg^2)/(n*Sg) in exact ppm integers — "
    "bursty tokens (topic words, boilerplate runs) score far above "
    "Poisson (1x mean in position units), the classic signal separating "
    "content words from function words and flagging template spam. One "
    "explode + one global position window + bounded top-20 join; gap "
    "stats are exact bigints, engine-identical.",
    tags=("text", "stats"),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias(
            "pos0", "t"
        ),
    )
    seq = tok.select(
        "t",
        F.row_number().over(W.orderBy("doc_id", "pos0")).alias("gi"),
    )
    top = (
        seq.groupBy("t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.desc("c"), "t")
        .limit(20)
        .select("t")
    )
    gaps = (
        seq.join(F.broadcast(top), "t")
        .withColumn(
            "g",
            (
                F.col("gi")
                - F.lag("gi").over(W.partitionBy("t").orderBy("gi"))
            ).cast("bigint"),
        )
        .filter(F.col("g").isNotNull())
    )
    agg = gaps.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("sgg"),
    )
    return agg.select(
        F.col("t").alias("token"),
        F.col("n").alias("n_gaps"),
        F.col("sg").alias("gap_sum"),
        F.expr(
            "CAST(((n * sgg - sg * sg) * 1000000) DIV (n * sg) AS BIGINT)"
        ).alias("fano_ppm"),
    ).orderBy(F.desc("fano_ppm"), "token")


@register(
    "events_gini_trend",
    oracle="""
        WITH pc AS (
          SELECT epoch_ns(ts) // 86400000000000 AS day, user_id
          FROM events WHERE event_type = 'purchase'
        ),
        mind AS (SELECT MIN(day) AS m FROM pc),
        weekly AS (
          SELECT CAST((day - mind.m) // 7 AS BIGINT) AS week, user_id,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM pc CROSS JOIN mind
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT week, x,
                 CAST(row_number() OVER (
                   PARTITION BY week ORDER BY x, user_id) AS BIGINT) AS i
          FROM weekly
        ),
        agg AS (
          SELECT week, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(i * x) AS BIGINT) AS six
          FROM ranked GROUP BY week
        )
        SELECT week, n AS n_users, sx AS purchases,
               CAST(((2 * six - (n + 1) * sx) * 1000000) // (n * sx)
                    AS BIGINT) AS gini_ppm
        FROM agg
        ORDER BY week
    """,
    doc="Weekly Gini trend of per-user purchase concentration — "
    "events_user_gini's time axis: is engagement concentrating into "
    "power users week over week? Gini from the rank formulation "
    "G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) over counts ranked "
    "by (x, user_id) — the tiebreak makes the rank a total order, so "
    "both engines rank identically and every term is an exact bigint "
    "(ppm floor division at the end; numerator non-negative by the "
    "rearrangement inequality). Scale shape: one groupBy to per-user "
    "weekly counts, a per-week window over bounded user rows, one "
    "aggregate per week.",
    tags=("events", "stats", "window"),
)
def events_gini_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql("""
        WITH pc AS (
          SELECT ts DIV 86400000000000 AS day, user_id
          FROM events WHERE event_type = 'purchase'
        ),
        mind AS (SELECT MIN(day) AS m FROM pc),
        weekly AS (
          SELECT CAST((day - mind.m) DIV 7 AS BIGINT) AS week, user_id,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM pc CROSS JOIN mind
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT week, x,
                 CAST(row_number() OVER (
                   PARTITION BY week ORDER BY x, user_id) AS BIGINT) AS i
          FROM weekly
        ),
        agg AS (
          SELECT week, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(i * x) AS BIGINT) AS six
          FROM ranked GROUP BY week
        )
        SELECT week, n AS n_users, sx AS purchases,
               CAST(((2 * six - (n + 1) * sx) * 1000000) DIV (n * sx)
                    AS BIGINT) AS gini_ppm
        FROM agg
        ORDER BY week
    """)


@register(
    "sketch_stream_sample_quantiles",
    oracle="""
        WITH s AS (
          SELECT value AS v FROM events
          WHERE CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                       1, 8) AS BIGINT) % 16 = 0
        ),
        q AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS sample_n,
                 quantile_cont(v, [CAST(25 AS DOUBLE) / 100.0,
                                   CAST(50 AS DOUBLE) / 100.0,
                                   CAST(75 AS DOUBLE) / 100.0,
                                   CAST(90 AS DOUBLE) / 100.0,
                                   CAST(99 AS DOUBLE) / 100.0]) AS vals
          FROM s
        ),
        idx AS (SELECT unnest([1, 2, 3, 4, 5]) AS i,
                       unnest([25, 50, 75, 90, 99]) AS q_pct)
        SELECT CAST(idx.q_pct AS INTEGER) AS q_pct,
               q.sample_n,
               q.vals[idx.i] AS value
        FROM q CROSS JOIN idx
        ORDER BY q_pct
    """,
    doc="STREAMING twin of sketch_sample_quantiles — the union-merge "
    "property exercised end-to-end: the event stream replays as 3 "
    "chronological micro-batches and each batch appends ITS OWN "
    "hash-sampled rows (md5(event_id) % 16 = 0 — a row-local predicate, "
    "so the union of per-batch samples IS the batch sample, independent "
    "of chopping, replay or arrival order) to a parquet sink; the "
    "finalizer computes exact interpolated quantiles over the merged "
    "sample and must hash-match the batch oracle. Sink state is n/16 "
    "rows; at 100 TB the sink is a managed table and the divisor sets "
    "the budget.",
    tags=("sketch", "streaming"),
)
def sketch_stream_sample_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sqsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-sqout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.filter(
                F.expr(
                    "CAST(conv(substring(md5(CAST(event_id AS STRING)),"
                    " 1, 8), 16, 10) AS BIGINT) % 16 = 0"
                )
            )
            .select(F.col("value").alias("v"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-sqck-")
    sample = spark.read.parquet(out)
    qs = (25, 50, 75, 90, 99)
    q_arr = ", ".join(f"CAST({p} AS DOUBLE) / 100.0" for p in qs)
    pct = sample.agg(
        F.count(F.lit(1)).cast("bigint").alias("sample_n"),
        F.expr(f"percentile(v, array({q_arr}))").alias("vals"),
    )
    return pct.select(
        "sample_n",
        F.expr(
            "stack("
            + str(len(qs))
            + ", "
            + ", ".join(
                f"CAST({p} AS INT), vals[{i}]" for i, p in enumerate(qs)
            )
            + ") AS (q_pct, value)"
        ),
    ).select("q_pct", "sample_n", "value").orderBy("q_pct")


@register(
    "curation_importance_weights",
    oracle="""
        WITH per AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source
        ),
        tot AS (
          SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM per
        )
        SELECT per.source, per.n_docs,
               CAST((tot.total * 1000000) // (tot.k * per.n_docs)
                    AS BIGINT) AS weight_ppm,
               CAST(per.n_docs * ((tot.total * 1000000)
                    // (tot.k * per.n_docs)) AS BIGINT) AS mass_ppm
        FROM per CROSS JOIN tot
        ORDER BY per.source
    """,
    doc="Importance weights toward a UNIFORM source mixture: "
    "w(s) = target_share / empirical_share = N/(k*n_s), the reweighting "
    "a curation pipeline applies when one crawl dominates the corpus "
    "(curation_dp_mixture's importance-sampling dual — that gate "
    "RESAMPLES to a target, this one weights in place). Exact ppm "
    "integer weights from one bounded groupBy; mass_ppm = n_s * w(s) "
    "shows each source's post-weighting share is ~total/k by "
    "construction (floor-division exactness, engine-identical).",
    tags=("curation", "agg"),
)
def curation_importance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.expr(
                "CAST((total * 1000000) DIV (k * n_docs) AS BIGINT)"
            ).alias("weight_ppm"),
            F.expr(
                "CAST((n_docs * ((total * 1000000) DIV (k * n_docs)))"
                " AS BIGINT)"
            ).alias("mass_ppm"),
        )
        .orderBy("source")
    )


@register(
    "agg_trimmed_mean",
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
        kept AS (
          SELECT pri, c, n FROM ranked
          WHERE i > n // 10 AND i <= n - n // 10
        )
        SELECT pri AS priority,
               CAST(MAX(n) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(c) AS BIGINT) AS kept_cents,
               CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100.0 AS trimmed_mean
        FROM kept
        GROUP BY pri
        ORDER BY pri
    """,
    doc="10% two-sided trimmed mean of order value per priority — the "
    "robust location estimate next to median/MAD for heavy-tailed "
    "money columns (a handful of mega-orders move the plain mean; the "
    "trimmed mean ignores exactly floor(n/10) rows per tail). "
    "Determinism: integer-cents values ranked under a total order "
    "(value, orderkey tiebreak) so both engines drop the identical row "
    "SET; the kept-sum is an exact bigint and the mean is two mirrored "
    "float divisions. Scale shape: one per-group sort window over the "
    "grouped rows — the same shape as agg_weighted_quantiles; no "
    "driver-side percentile collection.",
    tags=("agg", "stats", "window"),
)
def agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        kept AS (
          SELECT pri, c, n FROM ranked
          WHERE i > n DIV 10 AND i <= n - n DIV 10
        )
        SELECT pri AS priority,
               CAST(MAX(n) AS BIGINT) AS n_total,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(c) AS BIGINT) AS kept_cents,
               CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 100.0 AS trimmed_mean
        FROM kept
        GROUP BY pri
        ORDER BY pri
    """)
