"""Round-3 pipeline wave: HyperLogLog, bigram LM scoring, market-basket
lift, interval-follow joins, embedding dimension stats, containment dedup.

Each entry follows the engine-wide determinism contract (exact integer
counts, quantized scores, single final float ops in matching operand
order) so DuckDB hash-matches the Spark result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import load_tables, register
from icebergsql_spark.operators import dedup, sketch

_NIB = "instr('0123456789abcdef', {c}) - 1"
_T12 = "trim(LEADING '0' FROM substring(md5_h, 3, 12))"
_RHO_SQL = (
    f"CASE WHEN {_T12} = '' THEN {sketch.HLL_BITS + 1} "
    f"ELSE (12 - length({_T12})) * 4 "
    f"+ CASE WHEN ({_NIB.format(c=f'substring({_T12}, 1, 1)')}) >= 8 THEN 0 "
    f"WHEN ({_NIB.format(c=f'substring({_T12}, 1, 1)')}) >= 4 THEN 1 "
    f"WHEN ({_NIB.format(c=f'substring({_T12}, 1, 1)')}) >= 2 THEN 2 "
    f"ELSE 3 END + 1 END"
)
_REG_SQL = (
    f"({_NIB.format(c='substring(md5_h, 1, 1)')}) * 16"
    f" + ({_NIB.format(c='substring(md5_h, 2, 1)')})"
)


@register(
    "sketch_hll_registers",
    oracle=f"""
        WITH h AS (
          SELECT md5(CAST(user_id AS VARCHAR)) AS md5_h FROM events
        ),
        r AS (
          SELECT CAST({_REG_SQL} AS INT) AS reg,
                 CAST({_RHO_SQL} AS INT) AS rho
          FROM h
        )
        SELECT reg, MAX(rho) AS max_rho
        FROM r GROUP BY reg ORDER BY reg
    """,
    doc="HyperLogLog register table over events.user_id (m=256, md5-"
    "derived registers + 48-bit rank — deterministic, so even the sketch "
    "STATE is oracle-checkable). Registers merge by MAX: 1000 executors "
    "each fold their partition into <=256 rows and one tiny shuffle "
    "combines them — the standard approx-COUNT(DISTINCT) shape at 100 TB. "
    "Flajolet et al. 2007; hex-char arithmetic only (instr/substr/trim), "
    "portable to any engine with md5.",
    tags=("pipeline", "sketch", "hll"),
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return sketch.hll_registers(ev, "user_id").orderBy("reg")


@register(
    "sketch_hll_estimate",
    oracle=f"""
        WITH h AS (
          SELECT md5(CAST(user_id AS VARCHAR)) AS md5_h FROM events
        ),
        r AS (
          SELECT CAST({_REG_SQL} AS INT) AS reg,
                 CAST({_RHO_SQL} AS INT) AS rho
          FROM h
        ),
        regs AS (SELECT reg, MAX(rho) AS max_rho FROM r GROUP BY reg),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m_used,
                 CAST(SUM(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
                   AS harmonic_q
          FROM regs
        )
        SELECT m_used, harmonic_q,
               CAST(round(
                 CASE WHEN ({sketch._RAW_EST_SQL}) <= {2.5 * sketch.HLL_M}
                           AND m_used < {sketch.HLL_M}
                      THEN {sketch.HLL_M} * ln(CAST({sketch.HLL_M} AS DOUBLE)
                                               / ({sketch.HLL_M} - m_used))
                      ELSE ({sketch._RAW_EST_SQL}) END
               ) AS BIGINT) AS est
        FROM agg
    """,
    doc="HLL distinct-user estimate from the register table: harmonic sum "
    "as an EXACT bigint (order-independent shiftleft fold), one final "
    "double division + the standard linear-counting small-range "
    "correction — bit-identical across engines.",
    tags=("pipeline", "sketch", "hll"),
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    return sketch.hll_estimate(ev, "user_id").select(
        F.col("m_used").cast("bigint"), "harmonic_q", "est"
    )


@register(
    "text_bigram_logprob",
    oracle="""
        WITH toks AS (
          SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents
        ),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(tk) - 1),
                                       i -> tk[i] || ' ' || tk[i + 1])) AS bg
          FROM toks WHERE len(tk) >= 2
        ),
        cbg AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
        clw AS (
          SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
          FROM bg GROUP BY 1
        ),
        scored AS (
          SELECT cbg.bg,
                 CAST(round(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))
                            * 1000000000) AS BIGINT) AS lq
          FROM cbg JOIN clw ON clw.w1 = split_part(cbg.bg, ' ', 1)
        ),
        per_doc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                 CAST(SUM(lq) AS BIGINT) AS slq
          FROM bg JOIN scored USING (bg)
          GROUP BY doc_id
        )
        SELECT doc_id, n_bigrams,
               (CAST(slq AS DOUBLE) / 1000000000.0)
                 / CAST(n_bigrams AS DOUBLE) AS avg_logprob
        FROM per_doc ORDER BY doc_id
    """,
    doc="Per-document mean bigram conditional log-probability "
    "ln p(w2|w1) = ln(c(w1w2)/c(w1·)) — the step up from the unigram LM "
    "quality signal (operators/text.py:unigram_logprob): fluency scoring "
    "that penalizes shuffled/boilerplate text unigram stats cannot see. "
    "Per-bigram ln is quantized to bigint once, so the per-doc aggregate "
    "is an exact integer sum; two count shuffles + one vocab join that "
    "broadcasts at scale.",
    tags=("pipeline", "text", "lm"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    bg = (
        docs.select(
            "doc_id", F.split(F.trim(F.col("text")), " ").alias("tk")
        )
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1),"
                    " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))"
                )
            ).alias("bg"),
        )
    )
    cbg = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    clw = (
        bg.select(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    scored = cbg.join(
        clw, F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == F.col("w1")
    ).select(
        "bg",
        F.expr(
            "CAST(round(ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))"
            " * 1000000000) AS BIGINT)"
        ).alias("lq"),
    )
    return (
        bg.join(scored, "bg")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("lq").alias("slq"))
        .select(
            "doc_id",
            "n_bigrams",
            F.expr(
                "(CAST(slq AS DOUBLE) / 1000000000.0)"
                " / CAST(n_bigrams AS DOUBLE)"
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "basket_brand_lift",
    oracle="""
        WITH items AS (
          SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS br
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        ),
        n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM items),
        singles AS (SELECT br, COUNT(*) AS na FROM items GROUP BY br),
        pairs AS (
          SELECT a.br AS br_a, b.br AS br_b, COUNT(*) AS nab
          FROM items a JOIN items b ON a.ok = b.ok AND a.br < b.br
          GROUP BY 1, 2
        )
        SELECT br_a, br_b, CAST(nab AS BIGINT) AS n_both,
               CAST(round(CAST(nab AS DOUBLE) * n_orders
                          / (CAST(sa.na AS DOUBLE) * sb.na) * 1000000)
                    AS BIGINT) AS lift_q
        FROM pairs CROSS JOIN n
        JOIN singles sa ON sa.br = pairs.br_a
        JOIN singles sb ON sb.br = pairs.br_b
        WHERE nab >= 5
        ORDER BY lift_q DESC, br_a, br_b LIMIT 40
    """,
    doc="Market-basket association lift over orders×brands "
    "(lift = P(a,b)/(P(a)P(b)), quantized): the co-occurrence-mining "
    "shape. Baskets reduce to DISTINCT (order, brand) first — the brand "
    "domain is small (25), so the per-basket pair join is bounded at "
    "C(25,2) rows/order and the dimension join broadcasts; same per-key "
    "fan-out discipline as the PMI df-band.",
    tags=("pipeline", "association"),
)
def basket_brand_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    items = (
        t["lineitem"]
        .select(F.col("l_orderkey").alias("ok"), "l_partkey")
        .join(
            F.broadcast(t["part"].select("p_partkey", F.col("p_brand").alias("br"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("ok", "br")
        .distinct()
    )
    n = items.agg(F.countDistinct("ok").alias("n_orders"))
    singles = items.groupBy("br").agg(F.count(F.lit(1)).alias("na"))
    a = items.select(F.col("ok"), F.col("br").alias("br_a"))
    b = items.select(F.col("ok"), F.col("br").alias("br_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("br_a") < F.col("br_b"))
        .groupBy("br_a", "br_b")
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 5)
    )
    return (
        pairs.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(singles.select(F.col("br").alias("br_a"), F.col("na").alias("na_a"))),
            "br_a",
        )
        .join(
            F.broadcast(singles.select(F.col("br").alias("br_b"), F.col("na").alias("na_b"))),
            "br_b",
        )
        .select(
            "br_a",
            "br_b",
            F.col("nab").alias("n_both"),
            F.expr(
                "CAST(round(CAST(nab AS DOUBLE) * n_orders"
                " / (CAST(na_a AS DOUBLE) * na_b) * 1000000) AS BIGINT)"
            ).alias("lift_q"),
        )
        .orderBy(F.desc("lift_q"), "br_a", "br_b")
        .limit(40)
    )


@register(
    "events_click_purchase_follow",
    oracle="""
        WITH c AS (
          SELECT user_id, epoch_ns(ts) AS t FROM events
          WHERE event_type = 'click'
        ),
        p AS (
          SELECT user_id, epoch_ns(ts) AS t FROM events
          WHERE event_type = 'purchase'
        ),
        j AS (
          SELECT c.user_id, c.t AS ct
          FROM c JOIN p ON c.user_id = p.user_id
           AND p.t > c.t AND p.t <= c.t + 600000000000
        )
        SELECT user_id,
               CAST(COUNT(DISTINCT ct) AS BIGINT) AS n_clicks_followed,
               CAST(COUNT(*) AS BIGINT) AS n_follow_events
        FROM j GROUP BY user_id ORDER BY user_id
    """,
    doc="Interval-follow join (conversion attribution): purchases within "
    "10 minutes after a click by the same user. The join is an equi-join "
    "on user_id with a range residual — at scale the shuffle is keyed on "
    "user, per-user event lists are small, and the residual evaluates "
    "post-shuffle without a cross product; integer nanosecond arithmetic "
    "end-to-end (plans/registry.events_ts_to_nanos).",
    tags=("pipeline", "events", "temporal"),
)
def events_click_purchase_follow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ct")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    j = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("pt") > F.col("ct"))
        & (F.col("pt") <= F.col("ct") + F.lit(600000000000)),
    )
    return (
        j.groupBy("user_id")
        .agg(
            F.countDistinct("ct").alias("n_clicks_followed"),
            F.count(F.lit(1)).alias("n_follow_events"),
        )
        .orderBy("user_id")
    )


@register(
    "emb_dimension_stats",
    oracle="""
        WITH x AS (
          SELECT unnest(generate_series(1, len(embedding))) AS i,
                 embedding
          FROM embeddings
        ),
        q AS (
          SELECT CAST(i AS INT) AS dim,
                 CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000)
                      AS BIGINT) AS q
          FROM x
        )
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               MIN(q) AS min_q, MAX(q) AS max_q,
               CAST(SUM(q) AS BIGINT) AS sum_q
        FROM q GROUP BY dim ORDER BY dim
    """,
    doc="Per-dimension distribution stats over the embedding column "
    "(quantized min/max/sum) — the calibration pass a scalar/product "
    "quantizer or normalization layer needs before compressing a 100 TB "
    "vector corpus. posexplode + ONE hash aggregate keyed by (dim): "
    "64·n rows shuffle as map-side-combined partials, never raw vectors.",
    tags=("pipeline", "vector"),
)
def emb_dimension_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .select(
            (F.col("pos") + 1).cast("int").alias("dim"),
            F.expr("CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").alias("q"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.sum("q").alias("sum_q"),
        )
        .orderBy("dim")
    )


# reuse the LSH SQL fragments so candidate generation matches the Spark
# operator exactly (same k=6 signatures, 3 bands)
from icebergsql_spark.plans.pipeline import (  # noqa: E402
    _BANDS_SQL,
    _CAND_UNION,
    _SIG_COLS,
    _WORDS_CTE,
)


@register(
    "dedup_containment_pairs",
    oracle=f"""
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        {_WORDS_CTE},
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM words GROUP BY doc_id),
        bands AS (SELECT doc_id, {_BANDS_SQL} FROM sigs),
        cand AS ({_CAND_UNION}),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM words GROUP BY doc_id),
        common AS (
          SELECT wa.doc_id AS a, wb.doc_id AS b, COUNT(*) AS c
          FROM words wa JOIN words wb ON wa.w = wb.w AND wa.doc_id < wb.doc_id
          GROUP BY 1, 2
        )
        SELECT common.a, common.b,
               round(c / sa.sz, 6) AS cont_a,
               round(c / sb.sz, 6) AS cont_b
        FROM common
        JOIN cand ON common.a = cand.a AND common.b = cand.b
        JOIN sizes sa ON sa.doc_id = common.a
        JOIN sizes sb ON sb.doc_id = common.b
        WHERE c / sa.sz >= 0.8 OR c / sb.sz >= 0.8
        ORDER BY common.a, common.b
    """,
    doc="Containment near-superset pairs |A∩B|/|A| >= 0.8 over LSH "
    "candidates (operators/dedup.py:containment_pairs): catches partial "
    "copies — a doc embedded in a larger one has tiny Jaccard but "
    "containment ~1. Same candidate-driven O(Σ|A|) shape as the Jaccard "
    "verify; only the denominator differs.",
    tags=("pipeline", "dedup"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    cand = dedup.lsh_candidate_pairs(docs)
    return (
        dedup.containment_pairs(docs, n=1, threshold=0.8, candidates=cand)
        .orderBy("a", "b")
    )


@register(
    "datasource_read_pruned",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 AS sum_price
        FROM lineitem
        WHERE year(l_shipdate) = 1997 AND l_discount >= 0.07
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="End-to-end Python Data Source loop: write lineitem into a managed "
    "table partitioned by ship year, then read it back on the SAME vanilla "
    "session via spark.read.format('icebergsql') — pushFilters prunes "
    "non-1997 partitions from footer/partition stats before any executor "
    "work (sources/datasource.py) — filter, aggregate. Exercises "
    "registration, schema projection, Arrow batch decode, and filter "
    "pushdown in one oracle-checked query.",
    tags=("managed", "datasource"),
)
def datasource_read_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.common import money
    from icebergsql_spark.sources.datasource import register_datasource
    from icebergsql_spark.table import Catalog

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "l_shipyear", F.year("l_shipdate")
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-dswh-"))
    tbl = cat.create_table("li_ds", li.schema, partition_cols=["l_shipyear"])
    tbl.insert(li)
    mark_setup_done()  # fixture built; the pruned DataSource read is the op
    register_datasource(spark)
    return (
        spark.read.format("icebergsql")
        .load(tbl.meta.location)
        .where("l_shipyear = 1997 AND l_discount >= 0.07")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )
