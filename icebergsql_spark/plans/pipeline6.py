"""Round-5 operator wave: MoR churn stress + pipeline/text/event additions.

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
from icebergsql_spark.plans.registry import events_min_day, load_tables, local_result, nonempty, register


@register(
    "managed_mor_churn_stress",
    oracle="""
        WITH base AS (
          SELECT l_returnflag, l_quantity FROM lineitem
          WHERE l_orderkey % 3 = 0
            AND l_orderkey % 101 NOT IN (0, 1, 2, 3, 4, 5)
            AND l_orderkey % 97 NOT IN (0, 1, 2)
        ),
        agg AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_qty
          FROM base GROUP BY l_returnflag
        )
        SELECT stage, l_returnflag, n, sum_qty
        FROM agg
        CROSS JOIN (SELECT unnest(['churn', 'clean']) AS stage) s
        ORDER BY stage, l_returnflag
    """,
    doc="Merge-on-read read path under HEAVY delete churn: six predicate-"
    "delete commits (each touching every file → one DV entry per file per "
    "commit) plus three equality-delete commits accumulate before any "
    "maintenance runs. Asserts the scale-critical plan shape: the masked "
    "read keeps every DV/eq join BROADCAST (build sides are churn-sized, "
    "never table-sized — zero SortMergeJoin in the executed plan), the "
    "metadata count is honestly undecidable while equality deletes are "
    "unconverted, and convert_equality_deletes + rewrite_position_deletes "
    "restore the exact metadata fast path (count_from_stats == live "
    "count). The aggregate is emitted at both stages and must be "
    "identical — the churned MoR read and the rewritten clean layout "
    "agree bit-for-bit. At 100 TB this is the shape that decides whether "
    "a CDC table stays queryable between maintenance windows: read tax "
    "∝ accumulated churn, not table size. Cites reference delegation of "
    "row-level deletes to the Iceberg v2 spec (equality + position "
    "deletes, file sequence numbers).",
    tags=("managed", "dml", "mor", "stress"),
)
def managed_mor_churn_stress(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.managed import _LI_DDL, _lineitem_with_year
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-churnwh-"))
    tbl = cat.create_table(
        "li_churn",
        _LI_DDL,
        partition_cols=["l_shipyear"],
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        },
    )
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 3 == 0)))
    mark_setup_done()  # base built; 9 churn commits + masked reads are the op
    n_files = len(tbl.meta.current_snapshot().live_files())

    # -- churn: 6 predicate-delete commits; each predicate matches ~1% of
    # rows spread across EVERY file, so DV entries ≈ commits × files --
    for i in range(6):
        snap = tbl.delete_where(f"l_orderkey % 101 = {i}")
        assert snap.num_added_files == 0, "MoR delete wrote data files"
    dv_n = len(tbl.meta.current_snapshot().dv_entries())
    assert dv_n >= 4 * n_files, f"expected per-file-per-commit DVs, got {dv_n}"

    # -- plus 3 equality-delete commits (zero read-before-write CDC) --
    # r15 (guide §1.2, don't compute things you throw away): keys come
    # from the CDC SIDE (the source feed `li`, one pruned column), not a
    # masked self-read of the table — each self-read re-materialized
    # every DV/eq broadcast build (~5 broadcast-future jobs per action).
    # The key SET may now include keys whose rows the %101 DV churn
    # already masked; equality masking is idempotent on dead rows, so
    # the live rowset, the emitted aggregate, and the oracle contract
    # are identical (delete_by_keys stays zero read-before-write — this
    # IS the CDC shape: the feed names keys, the table never pre-reads).
    for i in range(3):
        keys = (
            li.filter(
                (F.col("l_orderkey") % 3 == 0)
                & (F.col("l_orderkey") % 97 == i)
            )
            .select("l_orderkey")
            .distinct()
        )
        tbl.delete_by_keys(nonempty(keys), ["l_orderkey"])
    assert len(tbl.meta.current_snapshot().eq_entries()) == 3
    # metadata count is honestly undecidable under unconverted eq deletes
    assert tbl.scan().count_from_stats() is None

    # -- the scale-critical plan shape: every MoR mask join must be
    # broadcast (build sides are churn-sized), never a sort-merge join --
    masked = tbl.to_df()
    plan = masked._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "MoR mask joins must broadcast"
    assert "SortMergeJoin" not in plan, (
        "table-sized shuffle join in the MoR read path:\n" + plan
    )

    def agg(stage: str) -> DataFrame:
        return (
            tbl.to_df()
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(12,2)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .select(F.lit(stage).alias("stage"), "*")
        )

    churn_rows = agg("churn").collect()  # materialize BEFORE maintenance
    # the churn aggregate already visited every live row, so the live
    # count is the sum of its group counts — the second full masked
    # read (10 jobs / ~2.5 s) bought nothing (r15: guide §1.2, don't
    # compute things twice)
    live = sum(r["n"] for r in churn_rows)

    # -- maintenance restores the metadata fast path exactly --
    tbl.convert_equality_deletes()
    assert not tbl.meta.current_snapshot().eq_manifest_paths
    assert tbl.scan().count_from_stats() == live, "DV subtraction inexact"
    tbl.rewrite_position_deletes()
    assert not tbl.meta.current_snapshot().dv_manifest_paths
    assert tbl.scan().count_from_stats() == live

    clean = agg("clean")
    return (
        local_result(spark, churn_rows, clean.schema)
        .unionByName(clean)
        .orderBy("stage", "l_returnflag")
    )


# ---------------------------------------------------------------- text --

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _lang_conf_oracle() -> str:
    from icebergsql_spark.plans.pipeline import _lang_case_sql, _lang_score_sql

    scores = ", ".join(
        f"{_lang_score_sql(la)} AS score_{la}"
        for la in ("en", "de", "es", "fr", "zh")
    )
    return _LANG_CONF_ORACLE_TMPL.format(
        scores=scores, case_sql=_lang_case_sql()
    )


_LANG_CONF_ORACLE_TMPL = """
        WITH scored AS (
          SELECT doc_id, lang, predicted_lang,
                 list_sort([score_en, score_de, score_es, score_fr,
                            score_zh], 'DESC') AS sl
          FROM (
            SELECT doc_id, lang, {scores}, {case_sql} AS predicted_lang
            FROM documents
          )
        ),
        conf AS (
          SELECT doc_id, lang, predicted_lang,
                 (CAST(sl[1] - sl[2] AS BIGINT) * 1000000)
                   // (CAST(sl[1] + sl[2] AS BIGINT) + 1) AS margin_ppm
          FROM scored
        )
        SELECT predicted_lang,
               CAST(margin_ppm >= 200000 AS VARCHAR) AS confident,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN predicted_lang = lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM conf
        GROUP BY predicted_lang, confident
        ORDER BY predicted_lang, confident
    """


@register(
    "text_lang_confidence",
    oracle=_lang_conf_oracle(),
    doc="Language-ID with CONFIDENCE: marker-word argmax (text_lang_id) "
    "plus the margin between the best and second-best language score in "
    "ppm — the triage signal a curation pipeline uses to route low-margin "
    "docs to a heavier classifier. Integer arithmetic end-to-end (sorted "
    "score array, integer margin), one narrow map + one small aggregate; "
    "no shuffle beyond the final groupBy at 100 TB.",
    tags=("pipeline", "text"),
)
def text_lang_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import text

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    scored = text.with_lang_scores(docs)
    langs = list(text.LANG_MARKERS)
    sl = F.sort_array(
        F.array(*[F.col(f"score_{la}").cast("bigint") for la in langs]),
        asc=False,
    )
    conf = scored.withColumn("sl", sl).withColumn(
        "margin_ppm",
        F.expr(
            "CAST((sl[0] - sl[1]) * 1000000 AS BIGINT) "
            "DIV (CAST(sl[0] + sl[1] AS BIGINT) + 1)"
        ),
    )
    return (
        conf.withColumn(
            "confident", (F.col("margin_ppm") >= 200000).cast("string")
        )
        .groupBy("predicted_lang", "confident")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("predicted_lang") == F.col("lang"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .orderBy("predicted_lang", "confident")
    )


@register(
    "text_idf_novelty",
    oracle=f"""
        WITH terms AS (
          SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok
          FROM documents
        ),
        dfreq AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        perdoc AS (
          SELECT t.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_terms,
                 list_sum(list(ln(CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE))
                               ORDER BY t.tok)) AS idf_sum
          FROM terms t JOIN dfreq d ON t.tok = d.tok CROSS JOIN n
          GROUP BY t.doc_id
        )
        SELECT doc_id, n_terms, round(idf_sum / n_terms, 6) AS novelty
        FROM perdoc
        ORDER BY novelty DESC, doc_id
        LIMIT 15
    """,
    doc="Per-document NOVELTY score: mean inverse-document-frequency of "
    "the doc's distinct tokens — high = vocabulary rarely seen elsewhere "
    "in the corpus (dedup complement: finds the docs that add the most "
    "new information). IDF per token is one ln of one division (bit-"
    "identical across engines); the per-doc sum folds token-sorted so the "
    "float order is deterministic. Scale: explode distinct tokens (map-"
    "side), one token-keyed shuffle for df, one doc-keyed shuffle back — "
    "the inverted-index build cost, nothing quadratic.",
    tags=("pipeline", "text"),
)
def text_idf_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    # N rides along as a broadcast 1-row frame (the operators/text.py
    # idiom) instead of a driver-side count() — one DAG, one scan, no
    # extra job before the main query (round-7 fix of the r6 verdict's
    # anti-pattern note).
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("tok"),
    )
    dfreq = terms.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        terms.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "idf",
            F.log(
                F.col("n_docs").cast("double") / F.col("df").cast("double")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("tok", "idf"))),
                F.lit(0.0),
                lambda acc, x: acc + x["idf"],
            ).alias("idf_sum"),
        )
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("idf_sum") / F.col("n_terms"), 6).alias("novelty"),
        )
        .orderBy(F.desc("novelty"), "doc_id")
        .limit(15)
    )


# -------------------------------------------------------------- events --


@register(
    "events_rolling_entropy",
    oracle="""
        WITH daily AS (
          SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 event_type, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY day, event_type
        ),
        ent AS (
          SELECT day, CAST(SUM(c) AS BIGINT) AS n,
                 ln(CAST(SUM(c) AS DOUBLE))
                   - list_sum(list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                                   ORDER BY event_type))
                     / CAST(SUM(c) AS DOUBLE) AS entropy
          FROM daily GROUP BY day
        )
        SELECT day, n, round(entropy, 6) AS entropy,
               CASE WHEN lag(entropy, 2) OVER w IS NOT NULL THEN
                 round((entropy + lag(entropy, 1) OVER w
                        + lag(entropy, 2) OVER w) / 3.0, 6)
               END AS smooth3
        FROM ent
        WINDOW w AS (ORDER BY day)
        ORDER BY day
    """,
    doc="Daily event-type Shannon entropy + 3-day rolling mean: the drift "
    "monitor for an event pipeline (entropy collapse = one type flooding; "
    "spike = new behavior). H = ln(n) - Σc·ln(c)/n with the Σ folded in "
    "event_type order (deterministic float order); smoothing uses two "
    "lags in fixed operand order, not a frame sum. One shuffle to "
    "(day, type), a tiny day-level window — at 100 TB the day×type "
    "matrix is KBs regardless of event volume.",
    tags=("pipeline", "events"),
)
def events_rolling_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            F.expr("ts DIV 86400000000000").alias("day"),
            "event_type",
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = (
        daily.groupBy("day")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("event_type", "c"))),
                F.lit(0.0),
                lambda acc, x: acc
                + x["c"].cast("double") * F.log(x["c"].cast("double")),
            ).alias("clnc"),
        )
        .withColumn(
            "entropy",
            F.log(F.col("n").cast("double"))
            - F.col("clnc") / F.col("n").cast("double"),
        )
    )
    w = W.orderBy("day")
    return (
        ent.withColumn("l1", F.lag("entropy", 1).over(w))
        .withColumn("l2", F.lag("entropy", 2).over(w))
        .select(
            "day",
            "n",
            F.round("entropy", 6).alias("entropy"),
            F.when(
                F.col("l2").isNotNull(),
                F.round(
                    (F.col("entropy") + F.col("l1") + F.col("l2")) / 3.0, 6
                ),
            ).alias("smooth3"),
        )
        .orderBy("day")
    )


@register(
    "curation_dp_mixture",
    oracle="""
        WITH w AS (
          SELECT doc_id, source,
                 CASE source WHEN 'src0' THEN 700000 WHEN 'src1' THEN 400000
                      WHEN 'src2' THEN 250000 ELSE 150000 END AS keep_ppm,
                 CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
                                     1, 6) AS BIGINT) % 1000000 AS u_ppm
          FROM documents
        ),
        agg AS (
          SELECT source, keep_ppm,
                 CAST(COUNT(*) AS BIGINT) AS n_total,
                 CAST(SUM(CASE WHEN u_ppm < keep_ppm THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_kept
          FROM w GROUP BY source, keep_ppm
        )
        SELECT source, keep_ppm, n_total, n_kept,
               (n_kept * 1000000)
                 // CAST(SUM(n_kept) OVER () AS BIGINT) AS mix_share_ppm
        FROM agg
        ORDER BY source
    """,
    doc="Domain-proportioned mixture sampling (the DoReMi/Pile recipe "
    "shape): per-source keep probabilities applied via a DETERMINISTIC "
    "id-hash uniform — shuffle-free, rerun-stable, partition-layout-"
    "independent, which is what makes a 100 TB resample reproducible. "
    "Reports realized per-source kept counts and the resulting corpus "
    "mix in ppm. All-integer (md5 bucket, integer shares).",
    tags=("curation",),
)
def curation_dp_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    w = docs.select(
        "doc_id",
        "source",
        F.when(F.col("source") == "src0", 700000)
        .when(F.col("source") == "src1", 400000)
        .when(F.col("source") == "src2", 250000)
        .otherwise(150000)
        .alias("keep_ppm"),
        md5_bucket(
            F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), 1000000
        ).alias("u_ppm"),
    )
    agg = w.groupBy("source", "keep_ppm").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("u_ppm") < F.col("keep_ppm"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )
    return (
        agg.withColumn(
            "mix_share_ppm",
            F.expr(
                "CAST(n_kept * 1000000 AS BIGINT) "
                "DIV CAST(SUM(n_kept) OVER () AS BIGINT)"
            ),
        )
        .select("source", "keep_ppm", "n_total", "n_kept", "mix_share_ppm")
        .orderBy("source")
    )


@register(
    "events_path_conversion",
    oracle="""
        WITH ranked AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts), event_id) AS rn
          FROM events
        ),
        paths AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM ranked WHERE rn <= 5 GROUP BY user_id
        )
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN path LIKE '%purchase%' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_converted
        FROM paths
        GROUP BY path
        ORDER BY n_users DESC, path
        LIMIT 20
    """,
    doc="User journey paths: each user's first five events (deterministic "
    "(ts, event_id) order) joined into a path string, counted across the "
    "population with a conversion flag — the top-paths report behind "
    "funnel design. One user-keyed shuffle for the window, one path-keyed "
    "aggregate; path strings are bounded (5 hops) so the groupBy key "
    "stays small at 100 TB.",
    tags=("pipeline", "events"),
)
def events_path_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x["event_type"],
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.when(F.col("path").contains("purchase"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_converted"),
        )
        .orderBy(F.desc("n_users"), "path")
        .limit(20)
    )


@register(
    "events_seasonal_decompose",
    oracle="""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        marked AS (SELECT event_type, day, (day + 4) % 7 AS dow, c FROM daily),
        per_dow AS (
          SELECT event_type, dow,
                 CAST(SUM(c) AS BIGINT) AS n_dow,
                 CAST(COUNT(*) AS BIGINT) AS days_dow
          FROM marked GROUP BY event_type, dow
        ),
        per_type AS (
          SELECT event_type,
                 CAST(SUM(c) AS BIGINT) AS n_total,
                 CAST(COUNT(*) AS BIGINT) AS days_total
          FROM marked GROUP BY event_type
        )
        SELECT d.event_type, d.dow, d.n_dow,
               (d.n_dow * t.days_total * 1000000)
                 // (d.days_dow * t.n_total) AS seasonal_ppm
        FROM per_dow d JOIN per_type t ON d.event_type = t.event_type
        ORDER BY d.event_type, d.dow
    """,
    doc="Day-of-week seasonal index per event type: mean daily volume on "
    "each weekday over the type's overall daily mean, in ppm (1000000 = "
    "no seasonality). Weekday from integer epoch-day arithmetic "
    "((day+4)%7, anchored to 1970-01-01 = Thursday) — no timezone, no "
    "calendar library, bit-identical across engines. The day×type matrix "
    "is tiny regardless of event volume; everything after the first "
    "aggregate is metadata-sized.",
    tags=("pipeline", "events"),
)
def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            "event_type",
            F.expr("ts DIV 86400000000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("dow", (F.col("day") + 4) % 7)
    )
    per_dow = daily.groupBy("event_type", "dow").agg(
        F.sum("c").cast("bigint").alias("n_dow"),
        F.count(F.lit(1)).alias("days_dow"),
    )
    per_type = daily.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).alias("days_total"),
    )
    return (
        per_dow.join(per_type, "event_type")
        .select(
            "event_type",
            "dow",
            "n_dow",
            F.expr(
                "(n_dow * days_total * 1000000) DIV (days_dow * n_total)"
            ).alias("seasonal_ppm"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "events_interarrival_gaps",
    oracle="""
        WITH gaps AS (
          SELECT user_id, event_type,
                 epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                 ) AS gap_ns
          FROM events
        ),
        b AS (
          SELECT event_type,
                 CASE
                   WHEN gap_ns < 600000000000 THEN 'lt_10m'
                   WHEN gap_ns < 3600000000000 THEN 'lt_1h'
                   WHEN gap_ns < 86400000000000 THEN 'lt_1d'
                   ELSE 'ge_1d'
                 END AS bucket
          FROM gaps WHERE gap_ns IS NOT NULL
        )
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n,
               (CAST(COUNT(*) AS BIGINT) * 1000000)
                 // CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type)
                         AS BIGINT) AS share_ppm
        FROM b GROUP BY event_type, bucket
        ORDER BY event_type, bucket
    """,
    doc="Per-user inter-arrival gap distribution, banded per event type — "
    "THE pre-deployment measurement behind every stateful-streaming knob "
    "in this repo: the session_window gap, dropDuplicatesWithinWatermark "
    "horizon, and stream-join state TTL are all chosen from where this "
    "histogram's mass sits (a 10-minute TTL keeps state for the lt_10m "
    "band only). One user-keyed window over integer nanos, then a "
    "type×band aggregate that is KBs at any event volume.",
    tags=("pipeline", "events", "streaming"),
)
def events_interarrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type", (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns")
    ).filter(F.col("gap_ns").isNotNull())
    b = gaps.select(
        "event_type",
        F.when(F.col("gap_ns") < 600000000000, "lt_10m")
        .when(F.col("gap_ns") < 3600000000000, "lt_1h")
        .when(F.col("gap_ns") < 86400000000000, "lt_1d")
        .otherwise("ge_1d")
        .alias("bucket"),
    )
    return (
        b.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST(n * 1000000 AS BIGINT) DIV CAST("
                "SUM(n) OVER (PARTITION BY event_type) AS BIGINT)"
            ),
        )
        .orderBy("event_type", "bucket")
    )


# ---------------------------------------------------------- embeddings --

_XQ = """
        xq AS (
          SELECT vec_id AS vid, label, i AS pos, ((i - 1) // 8) AS b,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        )
"""


@register(
    "emb_pq_codes",
    oracle=f"""
        WITH {_XQ},
        cb AS (
          SELECT CAST(vid AS INTEGER) AS cid, pos, q AS cq
          FROM xq WHERE vid < 16
        ),
        d AS (
          SELECT x.vid, x.b, c.cid,
                 SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN cb c USING (pos)
          GROUP BY 1, 2, 3
        ),
        amin AS (
          SELECT vid, b, MIN(dq * 100 + cid) AS packed
          FROM d GROUP BY vid, b
        )
        SELECT b, CAST(packed % 100 AS INTEGER) AS code,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(packed // 100) AS BIGINT) AS total_err
        FROM amin
        GROUP BY b, code
        ORDER BY b, code
    """,
    doc="Product-quantization code assignment (operators/similarity."
    "pq_codes — the IVF-PQ compression step): 64 dims → 8 sub-blocks, "
    "each assigned to the nearest of 16 per-block codewords by integer-"
    "quantized L2 with dist*100+code tie packing (exact in any engine). "
    "Output is the per-(block, code) occupancy + summed quantization "
    "error — the codebook-quality report. At 100 TB the 8-byte code "
    "tuple replaces 256 bytes of floats per vector: the compressed index "
    "that makes billion-vector ANN fit in memory.",
    tags=("pipeline", "embedding", "ann"),
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import similarity
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    return similarity.pq_codes(emb)


@register(
    "emb_cluster_balance",
    oracle=f"""
        WITH {_XQ},
        cent AS (
          SELECT label, pos, CAST(SUM(q) // COUNT(*) AS BIGINT) AS cq
          FROM xq GROUP BY label, pos
        ),
        dist AS (
          SELECT x.vid, x.label,
                 SUM((x.q - c.cq) * (x.q - c.cq)) AS d2
          FROM xq x JOIN cent c ON x.label = c.label AND x.pos = c.pos
          GROUP BY 1, 2
        )
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
               (CAST(COUNT(*) AS BIGINT) * 1000000)
                 // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS share_ppm,
               CAST(SUM(d2) // COUNT(*) AS BIGINT) AS mean_dist2
        FROM dist
        GROUP BY label
        ORDER BY label
    """,
    doc="Cluster balance audit over the labeled embeddings: per label its "
    "population share (skew detector — one giant cluster breaks IVF cell "
    "pruning) and the integer-exact mean squared distance to the label "
    "centroid (within-cluster spread; centroids are shifted-integer "
    "sum DIV count, the operators/ml determinism contract). Two shuffles "
    "total (label×dim centroid, then per-vector distance) regardless of "
    "corpus size.",
    tags=("pipeline", "embedding", "ml"),
)
def emb_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    xq = emb.select(
        F.col("vec_id").alias("vid"),
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
                " * 1000000) AS BIGINT) + 2000000)"
            )
        ).alias("pos0", "q"),
    )
    cent = xq.groupBy("label", "pos0").agg(
        F.expr("CAST(SUM(q) DIV COUNT(*) AS BIGINT)").alias("cq")
    )
    dist = (
        xq.join(cent, ["label", "pos0"])
        .groupBy("vid", "label")
        .agg(
            F.sum((F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq")))
            .alias("d2")
        )
    )
    return (
        dist.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(SUM(d2) DIV COUNT(*) AS BIGINT)").alias("mean_dist2"),
        )
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST(n * 1000000 AS BIGINT) "
                "DIV CAST(SUM(n) OVER () AS BIGINT)"
            ),
        )
        .select("label", "n", "share_ppm", "mean_dist2")
        .orderBy("label")
    )


@register(
    "dedup_semantic_centroid_pairs",
    oracle=f"""
        WITH {_XQ},
        cent AS (
          SELECT label, pos,
                 CAST(SUM(q) // COUNT(*) AS BIGINT) - 2000000 AS c
          FROM xq GROUP BY label, pos
        ),
        norms AS (
          SELECT label, CAST(SUM(c * c) AS BIGINT) AS n2
          FROM cent GROUP BY label
        ),
        dots AS (
          SELECT a.label AS label_a, b.label AS label_b,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS dot
          FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
          GROUP BY 1, 2
        )
        SELECT d.label_a, d.label_b,
               round(CAST(d.dot AS DOUBLE)
                     / (sqrt(CAST(na.n2 AS DOUBLE))
                        * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
        FROM dots d
        JOIN norms na ON na.label = d.label_a
        JOIN norms nb ON nb.label = d.label_b
        ORDER BY cos DESC, d.label_a, d.label_b
        LIMIT 10
    """,
    doc="Semantic cluster-merge candidates: cosine between every pair of "
    "label centroids, highest first — the 'are these two clusters the "
    "same concept?' report that drives semantic-dedup merge decisions. "
    "Centroids are integer-exact (sum DIV count in shifted space, then "
    "unshifted); dot and norms are order-independent integer sums, so "
    "the only float ops are two sqrts and one division in fixed order. "
    "The pair space is labels², never vectors² — metadata-sized at any "
    "corpus scale.",
    tags=("pipeline", "embedding", "dedup"),
)
def dedup_semantic_centroid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    xq = emb.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
                " * 1000000) AS BIGINT) + 2000000)"
            )
        ).alias("pos0", "q"),
    )
    cent = xq.groupBy("label", "pos0").agg(
        F.expr("CAST(SUM(q) DIV COUNT(*) AS BIGINT) - 2000000").alias("c")
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "pos0", F.col("c").alias("ca")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos0", F.col("c").alias("cb")
    )
    dots = (
        a.join(b, "pos0")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), "label_a", "label_b")
        .limit(10)
    )


# ---------------------------------------------------- sketches / joins --


@register(
    "sketch_linear_counting",
    oracle="""
        WITH h AS (
          SELECT event_type, user_id,
                 CAST('0x' || substr(md5('lc:' || CAST(user_id AS VARCHAR)),
                                     1, 6) AS BIGINT) % 4096 AS bucket
          FROM events
        ),
        agg AS (
          SELECT event_type,
                 CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
          FROM h GROUP BY event_type
        )
        SELECT event_type, n_buckets, exact_distinct,
               CAST(round(-(4096.0 * ln(CAST(4096 - n_buckets AS DOUBLE)
                                        / 4096.0))) AS BIGINT) AS est_distinct
        FROM agg
        ORDER BY event_type
    """,
    doc="Linear counting (bitmap distinct sketch — the low-cardinality "
    "complement to HLL/KMV already in the registry): hash users into a "
    "4096-slot bitmap per event type; estimate = -m·ln(empty/m). The "
    "bitmap ORs associatively across partitions (COUNT DISTINCT bucket ≡ "
    "popcount of the OR), so the shuffle carries ≤4096 values per group "
    "regardless of event volume; the only float ops are one ln and one "
    "multiply in fixed order. Exact distinct rides along to expose the "
    "estimator error.",
    tags=("pipeline", "sketch"),
)
def sketch_linear_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    h = ev.select(
        "event_type",
        "user_id",
        md5_bucket(
            F.concat(F.lit("lc:"), F.col("user_id").cast("string")), 4096
        ).alias("bucket"),
    )
    return (
        h.groupBy("event_type")
        .agg(
            F.countDistinct("bucket").cast("bigint").alias("n_buckets"),
            F.countDistinct("user_id").cast("bigint").alias("exact_distinct"),
        )
        .withColumn(
            "est_distinct",
            F.round(
                -(
                    F.lit(4096.0)
                    * F.log(
                        (F.lit(4096) - F.col("n_buckets")).cast("double")
                        / F.lit(4096.0)
                    )
                )
            ).cast("bigint"),
        )
        .select("event_type", "n_buckets", "exact_distinct", "est_distinct")
        .orderBy("event_type")
    )


@register(
    "join_bloom_prefilter",
    oracle="""
        SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                         AS DOUBLE) / 100.0 AS DOUBLE) AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_totalprice > 400000
        GROUP BY l.l_returnflag
        ORDER BY l.l_returnflag
    """,
    doc="Bloom-prefiltered join (the runtime-filter pattern made "
    "explicit): the build side's join keys hash into two bit sets "
    "(k=2, m=65536 — the md5 construction whose Spark/Python parity the "
    "bloom-stats tests lock); the probe side drops rows failing either "
    "membership BEFORE the exact join, which then removes the bloom's "
    "false positives — the result is exactly the plain join. Asserted: "
    "the prefilter semi-joins and the final join are all broadcast, and "
    "the prefilter actually discards probe rows. At 100 TB this is the "
    "shape that keeps a selective dim-fact join from shuffling the fact "
    "table: only ~fp-rate of non-matching rows ever reach the join.",
    tags=("pipeline", "join"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li, orders = t["lineitem"], t["orders"]
    build = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("k")
    )

    def hashes(df, col):
        return [
            md5_bucket(
                F.concat(F.lit(f"b{i}:"), F.col(col).cast("string")), 65536
            ).alias(f"h{i}")
            for i in (0, 1)
        ]

    bits = [
        build.select(hashes(build, "k")[i]).distinct() for i in (0, 1)
    ]
    probe = li.select("l_orderkey", "l_returnflag", "l_extendedprice")
    pre = probe.select("*", *hashes(probe, "l_orderkey"))
    for i in (0, 1):
        pre = pre.join(F.broadcast(bits[i]), f"h{i}", "left_semi")
    # the bloom is a PREFILTER: the exact join still runs, so false
    # positives cannot survive. Discard accounting rides the single pass
    # as an observe() metric instead of extra count() scans (the r5
    # bench showed the two asserts cost ~2 lineitem scans); the
    # discarded-rows assertion lives in tests/test_bloom_prefilter.
    pre = pre.observe(
        "bloom_prefilter", F.count(F.lit(1)).alias("rows_past_bloom")
    )
    out = (
        pre.join(F.broadcast(build), pre.l_orderkey == F.col("k"), "left_semi")
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
    assert "SortMergeJoin" not in plan, "bloom prefilter plan shuffled"
    return out


# ------------------------------------------------------- text (cont.) --


@register(
    "text_ngram_lm_perplexity",
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, {_TOKS} AS t FROM documents
          WHERE len({_TOKS}) >= 2
        ),
        bi AS (
          SELECT doc_id,
                 unnest(generate_series(1, len(t) - 1)) AS pos, t
          FROM toks
        ),
        bigrams AS (
          SELECT doc_id, pos, t[pos] AS w1, t[pos + 1] AS w2 FROM bi
        ),
        c12 AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
          FROM bigrams GROUP BY w1, w2
        ),
        c1 AS (
          SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
          FROM bigrams GROUP BY w1
        ),
        v AS (
          SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM
            (SELECT unnest({_TOKS}) AS tok FROM documents)
        ),
        scored AS (
          SELECT b.doc_id, b.pos,
                 ln(CAST(c12.c12 + 1 AS DOUBLE)
                    / CAST(c1.c1 + v.v AS DOUBLE)) AS lnp
          FROM bigrams b
          JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
          JOIN c1 ON b.w1 = c1.w1
          CROSS JOIN v
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               round(-list_sum(list(lnp ORDER BY pos)) / COUNT(*), 6)
                 AS avg_nll
        FROM scored
        GROUP BY doc_id
        ORDER BY avg_nll DESC, doc_id
        LIMIT 12
    """,
    doc="Per-document bigram language-model surprise: add-one-smoothed "
    "conditional p(w2|w1) trained on the corpus itself, reported as "
    "average negative log-likelihood per document (highest = least "
    "corpus-like — the statistical-outlier detector a curation pipeline "
    "runs before heavier classifiers). Each ln is one op on one "
    "division; the per-doc sum folds in bigram-position order so the "
    "float order is deterministic. Scale: two count shuffles (bigram, "
    "prefix) + one doc-keyed fold — the LM table build cost, linear in "
    "corpus size.",
    tags=("pipeline", "text"),
)
def text_ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS w1, t[i + 1] AS w2))"
            )
        ).alias("pos", "bg"),
    ).select("doc_id", (F.col("pos") + 1).alias("pos"), "bg.w1", "bg.w2")
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).agg(F.countDistinct("tok").alias("v"))
    scored = (
        bigrams.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "pos",
            F.log(
                (F.col("c12") + 1).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("lnp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "lnp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["lnp"],
            ).alias("lnp_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(-F.col("lnp_sum") / F.col("n_bigrams"), 6).alias(
                "avg_nll"
            ),
        )
        .orderBy(F.desc("avg_nll"), "doc_id")
        .limit(12)
    )


@register(
    "text_dedup_cascade",
    oracle=f"""
        WITH fp AS (
          SELECT doc_id, text,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS fingerprint
          FROM documents
        ),
        reps AS (
          SELECT min(doc_id) AS doc_id, any_value(text) AS text
          FROM fp GROUP BY fingerprint
        ),
        sk AS (
          SELECT doc_id,
                 array_to_string(list_slice(list_sort(list(DISTINCT
                   md5('c:' || w))), 1, 12), '|') AS sketch
          FROM (SELECT doc_id,
                       unnest(list_distinct(regexp_split_to_array(
                         trim(text), '\\s+'))) AS w
                FROM reps)
          GROUP BY doc_id
        )
        SELECT stage, n_docs FROM (
          SELECT '00_total' AS stage,
                 CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
          UNION ALL
          SELECT '10_exact', CAST(COUNT(*) AS BIGINT) FROM reps
          UNION ALL
          SELECT '20_near',
                 CAST(COUNT(DISTINCT sketch) AS BIGINT) FROM sk
        ) ORDER BY stage
    """,
    doc="The standard dedup CASCADE as one operator: exact dedup "
    "(normalized-text md5, keep lowest doc_id) feeds near-dup collapse "
    "(bottom-12 minhash sketch identity) — cheap stages first so each "
    "later, costlier stage sees only survivors. Reports the corpus "
    "funnel (total → exact-unique → near-unique), the before/after "
    "numbers every dedup run is judged by. Scale: stage 1 is one "
    "fingerprint shuffle; stage 2 runs on stage-1 SURVIVORS only — the "
    "cascade property that makes full-corpus near-dedup affordable.",
    tags=("pipeline", "dedup"),
)
def text_dedup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    fp = docs.select(
        "doc_id",
        "text",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fingerprint"),
    )
    reps = fp.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"), F.first("text").alias("text")
    )
    sk = (
        reps.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
            ).alias("w"),
        )
        .select("doc_id", F.md5(F.concat(F.lit("c:"), F.col("w"))).alias("h"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "|", F.slice(F.array_sort(F.collect_set("h")), 1, 12)
            ).alias("sketch")
        )
    )
    n0 = docs.agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.lit("00_total").alias("stage"), "n_docs"
    )
    n1 = reps.agg(F.count(F.lit(1)).alias("n_docs")).select(
        F.lit("10_exact").alias("stage"), "n_docs"
    )
    n2 = sk.agg(
        F.countDistinct("sketch").cast("bigint").alias("n_docs")
    ).select(F.lit("20_near").alias("stage"), "n_docs")
    return n0.unionByName(n1).unionByName(n2).orderBy("stage")


_PQCOS = """
        list_sum(list_transform(generate_series(1, 64),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, 64),
                     i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, 64),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))
"""


@register(
    "emb_ivf_pq_topk",
    oracle=f"""
        WITH {_XQ},
        coarse_d AS (
          SELECT x.vid, CAST(c.vid AS INTEGER) AS cell,
                 SUM((x.q - c.q) * (x.q - c.q)) AS dq
          FROM xq x JOIN xq c ON x.pos = c.pos AND c.vid < 16
          GROUP BY 1, 2
        ),
        cells AS (
          SELECT vid, CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS cell
          FROM coarse_d GROUP BY vid
        ),
        probe AS (
          SELECT cell FROM coarse_d WHERE vid = 7
          ORDER BY dq * 100 + cell LIMIT 2
        ),
        cand AS (
          SELECT vid FROM cells
          WHERE cell IN (SELECT cell FROM probe) AND vid != 7
        ),
        codes AS (
          SELECT vid, b, CAST(MIN(dq * 100 + cid) % 100 AS INTEGER) AS code
          FROM (
            SELECT x.vid, x.b, CAST(c.vid AS INTEGER) AS cid,
                   SUM((x.q - c.q) * (x.q - c.q)) AS dq
            FROM xq x JOIN xq c ON x.pos = c.pos AND c.vid < 16
            WHERE x.vid IN (SELECT vid FROM cand)
            GROUP BY 1, 2, 3
          ) GROUP BY vid, b
        ),
        adc AS (
          SELECT qx.b, CAST(c.vid AS INTEGER) AS cid,
                 SUM((qx.q - c.q) * (qx.q - c.q)) AS adc
          FROM xq qx JOIN xq c ON qx.pos = c.pos AND c.vid < 16
          WHERE qx.vid = 7
          GROUP BY 1, 2
        ),
        approx AS (
          SELECT codes.vid, SUM(adc.adc) AS approx
          FROM codes JOIN adc ON codes.b = adc.b AND codes.code = adc.cid
          GROUP BY 1
        ),
        shortlist AS (
          SELECT vid FROM approx ORDER BY approx, vid LIMIT 40
        )
        SELECT b.vec_id, round({_PQCOS}, 4) AS cos
        FROM (SELECT embedding FROM embeddings WHERE vec_id = 7) a
        CROSS JOIN embeddings b
        WHERE b.vec_id IN (SELECT vid FROM shortlist)
        ORDER BY {_PQCOS} DESC, b.vec_id
        LIMIT 10
    """,
    doc="IVF-PQ ANN end-to-end (operators/similarity.ivf_pq_topk): coarse "
    "cells prune to nprobe=2 partitions, 8-block product-quantization "
    "codes give an integer asymmetric-distance estimate from a 128-entry "
    "lookup table, the 40 best by ADC are exact-rescored with the "
    "sequential cosine fold. The billion-vector serving architecture in "
    "one plan: IO ∝ candidates (code columns + 40 raw vectors), never "
    "corpus; every pruning decision is integer arithmetic so the oracle "
    "replays it exactly.",
    tags=("pipeline", "embedding", "ann"),
)
def emb_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import similarity
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    return similarity.ivf_pq_topk(emb, query_id=7, k=10)


@register(
    "events_cep_pattern",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type, epoch_ns(ts) AS tsn,
                 MAX(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view,
                 MAX(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_error
          FROM events
        ),
        p AS (
          SELECT CAST(tsn // 86400000000000 AS BIGINT) AS day,
                 CASE WHEN last_view IS NOT NULL
                       AND tsn - last_view <= 1800000000000
                       AND (last_error IS NULL OR last_error < last_view)
                      THEN 1 ELSE 0 END AS hit
          FROM seq WHERE event_type = 'purchase'
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(hit) AS BIGINT) AS n_matched,
               (CAST(SUM(hit) AS BIGINT) * 1000000)
                 // CAST(COUNT(*) AS BIGINT) AS match_ppm
        FROM p GROUP BY day ORDER BY day
    """,
    doc="Complex-event-pattern detection as a window plan: 'view, then "
    "purchase within 30 minutes, with no error in between' — the "
    "MATCH_RECOGNIZE-shaped query expressed with two conditional running "
    "maxima over the per-user event sequence (one shuffle, no self-"
    "join). Per-day hit counts and match rate in ppm, all integer nanos "
    "arithmetic. At scale this is also the Structured Streaming shape: "
    "the same state (two timestamps per user) fits "
    "applyInPandasWithState with a watermark-bounded TTL.",
    tags=("pipeline", "events"),
)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    w = (
        W.partitionBy("user_id")
        .orderBy("tsn", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("tsn"),
    ).select(
        "*",
        F.max(
            F.when(F.col("event_type") == "view", F.col("tsn"))
        ).over(w).alias("last_view"),
        F.max(
            F.when(F.col("event_type") == "error", F.col("tsn"))
        ).over(w).alias("last_error"),
    )
    p = seq.filter(F.col("event_type") == "purchase").select(
        F.expr("tsn DIV 86400000000000").alias("day"),
        F.when(
            F.col("last_view").isNotNull()
            & (F.col("tsn") - F.col("last_view") <= 1800000000000)
            & (
                F.col("last_error").isNull()
                | (F.col("last_error") < F.col("last_view"))
            ),
            1,
        )
        .otherwise(0)
        .alias("hit"),
    )
    return (
        p.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("hit").cast("bigint").alias("n_matched"),
        )
        .withColumn(
            "match_ppm",
            F.expr(
                "CAST(n_matched * 1000000 AS BIGINT) "
                "DIV CAST(n_purchases AS BIGINT)"
            ),
        )
        .orderBy("day")
    )


@register(
    "events_funnel_time_to_convert",
    oracle="""
        WITH firsts AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'signup' THEN epoch_ns(ts) END)
                   AS first_signup,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
                   AS first_purchase
          FROM events GROUP BY user_id
        ),
        conv AS (
          SELECT (first_purchase - first_signup) // 1000000000 AS delay_s
          FROM firsts
          WHERE first_signup IS NOT NULL
            AND first_purchase IS NOT NULL
            AND first_purchase >= first_signup
        ),
        b AS (
          SELECT CASE
                   WHEN delay_s < 3600 THEN 'lt_1h'
                   WHEN delay_s < 86400 THEN 'lt_1d'
                   WHEN delay_s < 604800 THEN 'lt_7d'
                   ELSE 'ge_7d'
                 END AS bucket, delay_s
          FROM conv
        )
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(delay_s) // COUNT(*) AS BIGINT) AS mean_delay_s
        FROM b GROUP BY bucket ORDER BY bucket
    """,
    doc="Funnel time-to-convert: per user the gap between first signup "
    "and first purchase-after-signup, banded into the latency buckets a "
    "growth report uses, with integer-exact mean delay per band (sum DIV "
    "count over non-negative seconds). One conditional-min aggregate per "
    "user then a 4-row rollup — the user-keyed shuffle is the only cost "
    "at any event volume. Complements events_funnel (stage counts) and "
    "events_cohort_retention (calendar buckets) with the latency axis.",
    tags=("pipeline", "events"),
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    firsts = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("first_signup"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    conv = firsts.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        F.expr(
            "CAST((first_purchase - first_signup) DIV 1000000000 AS BIGINT)"
        ).alias("delay_s")
    )
    b = conv.select(
        "delay_s",
        F.when(F.col("delay_s") < 3600, "lt_1h")
        .when(F.col("delay_s") < 86400, "lt_1d")
        .when(F.col("delay_s") < 604800, "lt_7d")
        .otherwise("ge_7d")
        .alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("CAST(SUM(delay_s) DIV COUNT(*) AS BIGINT)").alias(
                "mean_delay_s"
            ),
        )
        .orderBy("bucket")
    )


@register(
    "events_stream_cep",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type, epoch_ns(ts) AS tsn,
                 MAX(CASE WHEN event_type = 'view' THEN epoch_ns(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view,
                 MAX(CASE WHEN event_type = 'error' THEN epoch_ns(ts) END)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_error
          FROM events
        ),
        p AS (
          SELECT CAST(tsn // 86400000000000 AS BIGINT) AS day,
                 CASE WHEN last_view IS NOT NULL
                       AND tsn - last_view <= 1800000000000
                       AND (last_error IS NULL OR last_error < last_view)
                      THEN 1 ELSE 0 END AS hit
          FROM seq WHERE event_type = 'purchase'
        )
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(hit) AS BIGINT) AS n_matched,
               (CAST(SUM(hit) AS BIGINT) * 1000000)
                 // CAST(COUNT(*) AS BIGINT) AS match_ppm
        FROM p GROUP BY day ORDER BY day
    """,
    doc="STREAMING complex-event-pattern detection (streaming/ops."
    "cep_view_purchase): the same 'view → purchase within 30 min, no "
    "error between' pattern as events_cep_pattern, computed "
    "incrementally by an applyInPandasWithState state machine (two "
    "timestamps per user) over THREE chronological micro-batches — the "
    "oracle is the batch window plan, so the stream must reproduce it "
    "exactly across batch boundaries (state carries the open prefix). "
    "Per-event work is O(1) and state is user-sharded: the CEP shape "
    "that keeps up with a firehose where the window replay cannot.",
    tags=("pipeline", "events", "streaming"),
)
def events_stream_cep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos
    from icebergsql_spark.streaming.ops import cep_view_purchase

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-cepsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-cepout-")
    # three CHRONOLOGICAL chunks -> three micro-batches; per-user order
    # across batches is preserved because the chunks split on event time
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def absorb(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        cep_view_purchase(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.foreachBatch(absorb)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="icebergsql-cepck-")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("hit").cast("bigint").alias("n_matched"),
        )
        .withColumn(
            "match_ppm",
            F.expr(
                "CAST(n_matched * 1000000 AS BIGINT) "
                "DIV CAST(n_purchases AS BIGINT)"
            ),
        )
        .orderBy("day")
    )


@register(
    "sketch_sliding_distinct",
    oracle="""
        WITH pairs AS (
          SELECT DISTINCT
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST('0x' || substr(md5('lc:' || CAST(user_id AS VARCHAR)),
                                     1, 6) AS BIGINT) % 4096 AS bucket
          FROM events
        ),
        days AS (SELECT DISTINCT day FROM pairs),
        win AS (
          SELECT d.day,
                 CAST(COUNT(DISTINCT p.bucket) AS BIGINT) AS n_buckets
          FROM days d JOIN pairs p
            ON p.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day
        ),
        exact AS (
          SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS exact_7d
          FROM days d JOIN (
            SELECT DISTINCT
                   CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                   user_id
            FROM events) u
            ON u.day BETWEEN d.day - 6 AND d.day
          GROUP BY d.day
        )
        SELECT w.day, w.n_buckets,
               CAST(round(-(4096.0 * ln(CAST(4096 - w.n_buckets AS DOUBLE)
                                        / 4096.0))) AS BIGINT) AS est_7d,
               e.exact_7d
        FROM win w JOIN exact e ON w.day = e.day
        ORDER BY w.day
    """,
    doc="SLIDING-window distinct users (trailing 7 days, per day) via "
    "mergeable bitmap sketches: per-day linear-counting bitmaps OR "
    "together across the window (COUNT DISTINCT bucket over the day "
    "range ≡ popcount of the OR), so the window union costs "
    "days×4096 tiny rows instead of re-scanning events per window — THE "
    "sketch property that makes sliding distinct affordable at 100 TB, "
    "where the exact per-window recount (included here to expose the "
    "estimator error) would rescan the stream 7×.",
    tags=("pipeline", "sketch", "events"),
)
def sketch_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    day = F.expr("ts DIV 86400000000000").alias("day")
    pairs = ev.select(
        day, md5_bucket(F.concat(F.lit("lc:"), F.col("user_id").cast("string")), 4096).alias("bucket")
    ).distinct()
    days = pairs.select("day").distinct()
    win = (
        F.broadcast(days.withColumnRenamed("day", "d"))
        .join(
            pairs,
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("bucket").cast("bigint").alias("n_buckets"))
    )
    upairs = ev.select(day, "user_id").distinct()
    exact = (
        F.broadcast(days.withColumnRenamed("day", "d"))
        .join(
            upairs,
            (F.col("day") >= F.col("d") - 6) & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact_7d"))
    )
    return (
        win.join(exact, "d")
        .select(
            F.col("d").alias("day"),
            "n_buckets",
            F.round(
                -(
                    F.lit(4096.0)
                    * F.log(
                        (F.lit(4096) - F.col("n_buckets")).cast("double")
                        / F.lit(4096.0)
                    )
                )
            )
            .cast("bigint")
            .alias("est_7d"),
            "exact_7d",
        )
        .orderBy("day")
    )


@register(
    "curation_shard_packing",
    oracle="""
        WITH c AS (
          SELECT source, doc_id, n_chars,
                 SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cum
          FROM documents
        ),
        assigned AS (
          SELECT source, doc_id, n_chars,
                 CAST((cum - n_chars) // 65536 AS BIGINT) AS shard
          FROM c
        )
        SELECT source, shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS bytes,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM assigned
        GROUP BY source, shard
        ORDER BY source, shard
    """,
    doc="Dataloader shard packing (the WebDataset/TFRecord manifest "
    "step): docs pack greedily into ~64 KiB shards by running byte "
    "count, assignment keyed on the PREFIX sum so a doc never splits "
    "and the manifest is deterministic under re-runs. Packing is "
    "PER-SOURCE (window partitioned by source) — the scale-honest "
    "layout: a global ordering would serialize the cumsum on one "
    "task, per-source streams pack independently on their own "
    "executors. Emits the shard manifest a training job consumes.",
    tags=("curation",),
)
def curation_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    assigned = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.expr(
            "CAST((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)"
            " DIV 65536 AS BIGINT)"
        ).alias("shard"),
    )
    return (
        assigned.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("bytes"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("source", "shard")
    )


_KS_PAIRS = (("click", "purchase"), ("click", "error"), ("view", "signup"))


def _ks_pair_sql(t1: str, t2: str) -> str:
    return f"""
          SELECT '{t1}|{t2}' AS pair, n1, n2,
                 CAST(MAX(gap) * 1000000 // (n1 * n2) AS BIGINT) AS d_ppm,
                 CAST(MIN(CASE WHEN gap = mx THEN vq END) AS BIGINT) AS at_vq
          FROM (
            SELECT vq, n1, n2, gap, MAX(gap) OVER () AS mx
            FROM (
              SELECT vq,
                     abs((SUM(c1) OVER w) * n2 - (SUM(c2) OVER w) * n1)
                       AS gap,
                     n1, n2
              FROM (
                SELECT vq, c1, c2,
                       CAST(SUM(c1) OVER () AS BIGINT) AS n1,
                       CAST(SUM(c2) OVER () AS BIGINT) AS n2
                FROM (
                  SELECT vq, CAST(SUM(cc1) AS BIGINT) AS c1,
                         CAST(SUM(cc2) AS BIGINT) AS c2
                  FROM (
                    SELECT CAST(round(value * 1000) AS BIGINT) AS vq,
                           CASE WHEN event_type = '{t1}' THEN 1 ELSE 0 END
                             AS cc1,
                           CASE WHEN event_type = '{t2}' THEN 1 ELSE 0 END
                             AS cc2
                    FROM events WHERE event_type IN ('{t1}', '{t2}')
                  ) GROUP BY vq
                )
              )
              WINDOW w AS (ORDER BY vq ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW)
            )
          )
          GROUP BY n1, n2
    """


@register(
    "agg_ks_drift",
    oracle="SELECT * FROM (\n"
    + "\nUNION ALL\n".join(_ks_pair_sql(a, b) for a, b in _KS_PAIRS)
    + "\n) ORDER BY pair",
    doc="Two-sample Kolmogorov-Smirnov distance between event-value "
    "distributions, in ppm — the distribution-drift test a training "
    "pipeline runs when comparing data slices (source A vs source B, "
    "this week vs last week). ALL-INTEGER formulation: D = max|cum1·n2 "
    "- cum2·n1|/(n1·n2) over quantized values, so the statistic "
    "hash-matches exactly (no float ECDFs). Scale shape: the per-value "
    "counts aggregate distributedly; the cumulative pass runs over the "
    "COMPRESSED value domain (distinct quantized values, ≤ thousands), "
    "so the single-partition window is metadata-sized — never over raw "
    "events. Also reports the value where the max gap occurs.",
    tags=("pipeline", "agg", "ml"),
)
def agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    outs = []
    for t1, t2 in _KS_PAIRS:
        sub = ev.filter(F.col("event_type").isin(t1, t2)).select(
            F.expr("CAST(round(value * 1000) AS BIGINT)").alias("vq"),
            F.when(F.col("event_type") == t1, 1).otherwise(0).alias("c1"),
            F.when(F.col("event_type") == t2, 1).otherwise(0).alias("c2"),
        )
        per_vq = sub.groupBy("vq").agg(
            F.sum("c1").alias("c1"), F.sum("c2").alias("c2")
        )
        w = W.orderBy("vq").rowsBetween(W.unboundedPreceding, 0)
        tot = W.partitionBy()
        gaps = per_vq.select(
            "vq",
            F.sum("c1").over(w).alias("cum1"),
            F.sum("c2").over(w).alias("cum2"),
            F.sum("c1").over(tot).cast("bigint").alias("n1"),
            F.sum("c2").over(tot).cast("bigint").alias("n2"),
        ).withColumn(
            "gap", F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        )
        outs.append(
            gaps.withColumn("mx", F.max("gap").over(W.partitionBy()))
            .groupBy("n1", "n2")
            .agg(
                F.expr(
                    "CAST(MAX(gap) * 1000000 DIV (n1 * n2) AS BIGINT)"
                ).alias("d_ppm"),
                F.min(F.when(F.col("gap") == F.col("mx"), F.col("vq")))
                .cast("bigint")
                .alias("at_vq"),
            )
            .select(
                F.lit(f"{t1}|{t2}").alias("pair"), "n1", "n2", "d_ppm", "at_vq"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("pair")


_KCORE_K = 8
_KCORE_COOC = 74


def _kcore_oracle(k: int = _KCORE_K, rounds: int = 3) -> str:
    parts = [
        """
        w AS (
          SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
                   trim(text), '\\s+'))) AS w
          FROM documents WHERE doc_id < 120
        ),
        pairs AS (
          SELECT x.w AS a, y.w AS b
          FROM w x JOIN w y ON x.doc_id = y.doc_id AND x.w < y.w
          GROUP BY 1, 2
          HAVING COUNT(*) >= """ + str(_KCORE_COOC) + """
        )""",
        "e0 AS (SELECT a, b FROM pairs)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(f"""
        d{r} AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM e{p} UNION ALL SELECT b FROM e{p}
          ) GROUP BY node
        ),
        s{r} AS (SELECT node FROM d{r} WHERE d >= {k}),
        e{r} AS (
          SELECT a, b FROM e{p}
          WHERE a IN (SELECT node FROM s{r})
            AND b IN (SELECT node FROM s{r})
        )""")
    rows = ["""
        SELECT 0 AS round,
               CAST((SELECT COUNT(*) FROM (
                 SELECT a FROM e0 UNION SELECT b FROM e0)) AS BIGINT)
                 AS n_nodes,
               CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges"""]
    for r in range(1, rounds + 1):
        rows.append(f"""
        SELECT {r},
               CAST((SELECT COUNT(*) FROM (
                 SELECT a FROM e{r} UNION SELECT b FROM e{r})) AS BIGINT),
               CAST((SELECT COUNT(*) FROM e{r}) AS BIGINT)""")
    return (
        "WITH " + ",".join(parts)
        + "\nSELECT * FROM (" + "\nUNION ALL".join(rows)
        + ") ORDER BY round"
    )


@register(
    "graph_kcore_trace",
    oracle=_kcore_oracle(),
    doc="k-core decomposition (k=8, 3 pruning rounds) over the token "
    "co-occurrence graph (edge = two words sharing >= 74 documents): "
    "each round drops nodes with degree < k and the edges touching "
    "them — the standard graph-peeling primitive (spam rings, dense "
    "boilerplate vocab, community cores). Emits the (nodes, edges) "
    "convergence trace per round; rounds genuinely peel here because "
    "co-occurrence degrees vary. Scale shape per round: one degree "
    "aggregate + two semi-joins, all key-partitioned; each round "
    "materializes (localCheckpoint) so the unrolled lineage never "
    "replicates the edge-build subplan — the iterative-operator rule "
    "graph.pagerank established.",
    tags=("pipeline", "graph", "dedup"),
)
def graph_kcore_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, ROUNDS = _KCORE_K, 3
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
    # each round references the edge set several times (trace, degree,
    # two semi-joins) — materialize per round (localCheckpoint truncates
    # lineage) or the unrolled DAG replicates the edge-build subplan
    # exponentially, the iterative-operator rule graph.pagerank follows
    e = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _KCORE_COOC)
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
    for r in range(1, ROUNDS + 1):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionAll(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        surv = deg.filter(F.col("d") >= K).select("node")
        e = (
            e.join(surv.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(surv.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint()
        )
        out.append(trace_row(r, e))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res.orderBy("round")


@register(
    "events_benford_digits",
    oracle="""
        WITH v AS (
          SELECT event_type,
                 CAST(substr(CAST(CAST(round(value * 100) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INTEGER) AS digit
          FROM events
          WHERE CAST(round(value * 100) AS BIGINT) > 0
        ),
        agg AS (
          SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
          FROM v GROUP BY event_type, digit
        )
        SELECT event_type, digit, n,
               (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY event_type)
                                     AS BIGINT) AS share_ppm,
               CAST(round(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000000)
                    AS BIGINT) AS benford_ppm
        FROM agg
        ORDER BY event_type, digit
    """,
    doc="Benford first-digit audit per event type: observed leading-digit "
    "shares (integer-cents string prefix — no float log-binning) against "
    "the Benford expectation ln(1+1/d)/ln(10), both in ppm. The "
    "fabricated-data / pipeline-corruption smoke test run over monetary "
    "columns at ingest. One narrow map + a 45-row aggregate; the only "
    "floats are per-digit constants.",
    tags=("pipeline", "events", "quality"),
)
def events_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    v = ev.select(
        "event_type",
        F.expr(
            "CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS STRING),"
            " 1, 1) AS INT)"
        ).alias("digit"),
    ).filter(F.expr("CAST(round(value * 100) AS BIGINT) > 0"))
    return (
        v.groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST(n * 1000000 AS BIGINT) DIV CAST("
                "SUM(n) OVER (PARTITION BY event_type) AS BIGINT)"
            ),
        )
        .withColumn(
            "benford_ppm",
            F.round(
                F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
                * 1000000
            ).cast("bigint"),
        )
        .orderBy("event_type", "digit")
    )


@register(
    "events_autocorrelation",
    oracle="""
        WITH daily AS (
          SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY day
        ),
        lagged AS (
          SELECT k.k, a.c AS x, b.c AS y
          FROM (SELECT unnest(generate_series(1, 7)) AS k) k
          JOIN daily a ON TRUE
          JOIN daily b ON b.day = a.day - k.k
        ),
        stats AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM lagged GROUP BY k
        )
        SELECT k, n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy
                               - CAST(sy AS DOUBLE) * sy)), 6) AS acf
        FROM stats
        ORDER BY k
    """,
    doc="Daily-volume autocorrelation at calendar lags 1-7: Pearson r "
    "between the day series and its k-day-shifted self (self-join on "
    "day - k, so missing days never misalign the lag), computed from "
    "INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy² — order-"
    "independent bigint sums) with floats touching only the final "
    "closed-form in fixed operand order — the weekly-cycle detector "
    "complementing events_seasonal_decompose with the time-domain view. "
    "All lag arithmetic runs over the tiny day-level series; the "
    "per-day count is the only event-scale aggregate.",
    tags=("pipeline", "events"),
)
def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            F.expr("ts DIV 86400000000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ks = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    a = daily.select(F.col("day").alias("aday"), F.col("c").alias("x"))
    b = daily.select(F.col("day").alias("bday"), F.col("c").alias("y"))
    lagged = (
        a.crossJoin(F.broadcast(ks))
        .join(b, F.col("bday") == F.col("aday") - F.col("k"))
    )
    stats = lagged.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    return (
        stats.select(
            "k",
            "n",
            F.round(
                (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
                / (
                    F.sqrt(
                        nd * F.col("sxx")
                        - F.col("sx").cast("double") * F.col("sx")
                    )
                    * F.sqrt(
                        nd * F.col("syy")
                        - F.col("sy").cast("double") * F.col("sy")
                    )
                ),
                6,
            ).alias("acf"),
        )
        .orderBy("k")
    )


@register(
    "events_holt_smoothing",
    oracle="""
        WITH RECURSIVE daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        idx AS (
          SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   AS i
          FROM daily
        ),
        n AS (SELECT event_type, MAX(i) AS mx FROM idx GROUP BY event_type),
        hw(event_type, i, l, b) AS (
            SELECT event_type, 1, CAST(c AS DOUBLE), CAST(0 AS DOUBLE)
            FROM idx WHERE i = 1
          UNION ALL
            SELECT hw.event_type, hw.i + 1,
                   0.5 * CAST(x.c AS DOUBLE) + 0.5 * (hw.l + hw.b),
                   0.3 * ((0.5 * CAST(x.c AS DOUBLE)
                           + 0.5 * (hw.l + hw.b)) - hw.l) + 0.7 * hw.b
            FROM hw JOIN idx x
              ON x.event_type = hw.event_type AND x.i = hw.i + 1
        )
        SELECT hw.event_type, CAST(n.mx AS BIGINT) AS n_days,
               round(hw.l, 6) AS level, round(hw.b, 6) AS trend,
               round(hw.l + 3 * hw.b, 6) AS forecast_3d
        FROM hw JOIN n ON n.event_type = hw.event_type AND hw.i = n.mx
        ORDER BY hw.event_type
    """,
    doc="Holt double-exponential smoothing (α=0.5, β=0.3) over the daily "
    "volume series per event type, with the 3-day-ahead linear forecast "
    "— the classic capacity-planning recurrence. The recurrence is "
    "SEQUENTIAL by construction; both engines replay the identical "
    "float-op sequence (Spark: one aggregate() fold over the day-sorted "
    "list; oracle: a recursive CTE stepping i→i+1 with the same inlined "
    "expressions), so the trajectory bit-matches. Scale shape: the "
    "event-scale work is one (type, day) count; the fold runs over the "
    "tiny day series per type — a per-key sequential recurrence is "
    "EXACTLY what aggregate() folds are for (never a driver loop).",
    tags=("pipeline", "events", "forecast"),
)
def events_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            "event_type",
            F.expr("ts DIV 86400000000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def step(acc, x):
        xc = x["c"].cast("double")
        newl = F.lit(0.5) * xc + F.lit(0.5) * (acc["l"] + acc["b"])
        newb = (
            F.lit(0.3)
            * ((F.lit(0.5) * xc + F.lit(0.5) * (acc["l"] + acc["b"])) - acc["l"])
            + F.lit(0.7) * acc["b"]
        )
        return F.struct(
            (acc["i"] + 1).alias("i"),
            F.when(acc["i"] == 0, xc).otherwise(newl).alias("l"),
            F.when(acc["i"] == 0, F.lit(0.0)).otherwise(newb).alias("b"),
        )

    return (
        daily.groupBy("event_type")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                F.struct(
                    F.lit(0).alias("i"),
                    F.lit(0.0).alias("l"),
                    F.lit(0.0).alias("b"),
                ),
                step,
            ).alias("s")
        )
        .select(
            "event_type",
            F.col("s.i").cast("bigint").alias("n_days"),
            F.round("s.l", 6).alias("level"),
            F.round("s.b", 6).alias("trend"),
            F.round(F.col("s.l") + 3 * F.col("s.b"), 6).alias("forecast_3d"),
        )
        .orderBy("event_type")
    )


@register(
    "events_user_gini",
    oracle="""
        WITH per_user AS (
          SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY event_type, user_id
        ),
        ranked AS (
          SELECT event_type, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY x, user_id) AS BIGINT) AS i
          FROM per_user
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x) AS BIGINT) AS n_events,
               CAST((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x)) * 1000000
                    // (COUNT(*) * SUM(x)) AS BIGINT) AS gini_ppm
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Gini coefficient of per-user activity per event type, in ppm — "
    "the concentration audit (0 = uniform engagement, →1 = a few power "
    "users dominate) that decides whether per-user keys need skew "
    "handling downstream. The closed form G = (2Σi·xᵢ - (n+1)Σx)/(nΣx) "
    "over rank-sorted counts is ALL integer (rank window + bigint sums), "
    "so it hash-matches exactly. One user-keyed count, one type-keyed "
    "rank window over the per-user rollup (users, not events).",
    tags=("pipeline", "events"),
)
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("x")
    )
    w = W.partitionBy("event_type").orderBy("x", "user_id")
    ranked = per_user.select(
        "event_type", "x", F.row_number().over(w).cast("bigint").alias("i")
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("x").cast("bigint").alias("n_events"),
            F.expr(
                "CAST((2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x)) * 1000000"
                " DIV (COUNT(*) * SUM(x)) AS BIGINT)"
            ).alias("gini_ppm"),
        )
        .orderBy("event_type")
    )


@register(
    "text_zipf_fit",
    oracle=f"""
        WITH freq AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
          FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
          GROUP BY tok
        ),
        ranked AS (
          SELECT f, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS BIGINT)
                   AS r
          FROM freq
        ),
        pts AS (
          SELECT r, ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y
          FROM ranked WHERE r <= 100
        ),
        sums AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 list_sum(list(x ORDER BY r)) AS sx,
                 list_sum(list(y ORDER BY r)) AS sy,
                 list_sum(list(x * y ORDER BY r)) AS sxy,
                 list_sum(list(x * x ORDER BY r)) AS sxx
          FROM pts
        )
        SELECT n,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                     / n, 6) AS intercept
        FROM sums
    """,
    doc="Zipf rank-frequency fit: least-squares slope of ln(freq) on "
    "ln(rank) over the top-100 vocabulary ranks (natural text ≈ -1; a "
    "flat slope flags synthetic/templated corpora — this corpus IS "
    "synthetic, which the fit exposes). Each ln is a single op; the "
    "four regression sums fold in RANK order on both engines "
    "(aggregate() struct fold ≡ ordered list_sums componentwise), so "
    "the floats bit-match. Corpus-scale work is one token count; the "
    "fit runs over 100 rows.",
    tags=("pipeline", "text"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.select(
        "f",
        F.row_number()
        .over(W.orderBy(F.desc("f"), "tok"))
        .cast("bigint")
        .alias("r"),
    ).filter(F.col("r") <= 100)
    pts = ranked.select(
        "r",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    folded = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("r", "x", "y"))),
            F.struct(
                F.lit(0.0).alias("sx"),
                F.lit(0.0).alias("sy"),
                F.lit(0.0).alias("sxy"),
                F.lit(0.0).alias("sxx"),
            ),
            lambda acc, p: F.struct(
                (acc["sx"] + p["x"]).alias("sx"),
                (acc["sy"] + p["y"]).alias("sy"),
                (acc["sxy"] + p["x"] * p["y"]).alias("sxy"),
                (acc["sxx"] + p["x"] * p["x"]).alias("sxx"),
            ),
        ).alias("s"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("s.sxy") - F.col("s.sx") * F.col("s.sy")) / (
        n * F.col("s.sxx") - F.col("s.sx") * F.col("s.sx")
    )
    return folded.select(
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("s.sy") - slope * F.col("s.sx")) / n, 6).alias(
            "intercept"
        ),
    )


@register(
    "dedup_rate_by_source",
    oracle="""
        WITH fp AS (
          SELECT source,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                   AS fingerprint
          FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_unique,
               (CAST(COUNT(*) - COUNT(DISTINCT fingerprint) AS BIGINT)
                * 1000000) // CAST(COUNT(*) AS BIGINT) AS dup_ppm
        FROM fp
        GROUP BY source
        ORDER BY source
    """,
    doc="Exact-duplicate rate PER SOURCE (normalized-text fingerprints) — "
    "the triage table that tells a curation run WHERE its duplication "
    "lives before any pair-level work, and the per-source health metric "
    "tracked across crawl snapshots. One fingerprint map + one "
    "two-level aggregate; no pairs, no joins.",
    tags=("pipeline", "dedup", "curation"),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    fp = docs.select(
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fingerprint"),
    )
    return (
        fp.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("fingerprint").cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "dup_ppm",
            F.expr(
                "CAST((n_docs - n_unique) * 1000000 AS BIGINT) "
                "DIV CAST(n_docs AS BIGINT)"
            ),
        )
        .orderBy("source")
    )


@register(
    "events_rfm_segments",
    oracle="""
        WITH ao AS (SELECT MAX(epoch_ns(ts)) AS t FROM events),
        rfm AS (
          SELECT user_id,
                 (ao.t - MAX(epoch_ns(ts))) // 86400000000000 AS recency_d,
                 CAST(COUNT(*) AS BIGINT) AS freq,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS monetary_c
          FROM events CROSS JOIN ao
          GROUP BY user_id, ao.t
        ),
        scored AS (
          SELECT user_id, monetary_c,
                 NTILE(4) OVER (ORDER BY recency_d, user_id) AS r,
                 NTILE(4) OVER (ORDER BY freq, user_id) AS f,
                 NTILE(4) OVER (ORDER BY monetary_c, user_id) AS m
          FROM rfm
        )
        SELECT CAST(r * 100 + f * 10 + m AS INTEGER) AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(monetary_c) // COUNT(*) AS BIGINT)
                 AS mean_monetary_c
        FROM scored
        GROUP BY segment
        ORDER BY segment
    """,
    doc="RFM (recency / frequency / monetary) user segmentation: per-user "
    "metrics quartiled by deterministic NTILE(4) (full tiebreak on "
    "user_id so both engines cut identically), composed into the classic "
    "3-digit segment code with per-segment population and integer-exact "
    "mean spend. One user-keyed aggregate + three windows over the "
    "per-user rollup (users, not events) — the marketing-analytics "
    "staple on event streams.",
    tags=("pipeline", "events"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    asof = ev.agg(F.max("ts").alias("t"))
    rfm = (
        ev.crossJoin(F.broadcast(asof))
        .groupBy("user_id", "t")
        .agg(
            F.expr(
                "CAST((any_value(t) - MAX(ts)) DIV 86400000000000 AS BIGINT)"
            ).alias("recency_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("monetary_c"),
        )
    )
    scored = rfm.select(
        "user_id",
        "monetary_c",
        F.ntile(4).over(W.orderBy("recency_d", "user_id")).alias("r"),
        F.ntile(4).over(W.orderBy("freq", "user_id")).alias("f"),
        F.ntile(4).over(W.orderBy("monetary_c", "user_id")).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("int")
            .alias("segment")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.expr(
                "CAST(SUM(monetary_c) DIV COUNT(*) AS BIGINT)"
            ).alias("mean_monetary_c"),
        )
        .orderBy("segment")
    )


@register(
    "sketch_bloom_fpr_audit",
    oracle="""
        WITH build AS (
          SELECT DISTINCT o_orderkey AS k FROM orders
          WHERE o_totalprice > 400000
        ),
        bits0 AS (
          SELECT DISTINCT CAST('0x' || substr(md5('b0:' ||
            CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % 65536 AS h FROM build
        ),
        bits1 AS (
          SELECT DISTINCT CAST('0x' || substr(md5('b1:' ||
            CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % 65536 AS h FROM build
        ),
        probes AS (
          SELECT DISTINCT o_orderkey AS k FROM orders
          WHERE o_totalprice <= 400000
        ),
        hits AS (
          SELECT k FROM probes
          WHERE CAST('0x' || substr(md5('b0:' || CAST(k AS VARCHAR)), 1, 6)
                     AS BIGINT) % 65536 IN (SELECT h FROM bits0)
            AND CAST('0x' || substr(md5('b1:' || CAST(k AS VARCHAR)), 1, 6)
                     AS BIGINT) % 65536 IN (SELECT h FROM bits1)
        )
        SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
               CAST((SELECT COUNT(*) FROM bits0) AS BIGINT) AS occ0,
               CAST((SELECT COUNT(*) FROM bits1) AS BIGINT) AS occ1,
               CAST((SELECT COUNT(*) FROM probes) AS BIGINT) AS n_probes,
               CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS false_pos,
               CAST((SELECT COUNT(*) FROM hits) * 1000000
                    // (SELECT COUNT(*) FROM probes) AS BIGINT)
                 AS observed_ppm,
               CAST((SELECT COUNT(*) FROM bits0)
                    * (SELECT COUNT(*) FROM bits1) * 1000000
                    // (CAST(65536 AS BIGINT) * 65536) AS BIGINT)
                 AS expected_ppm
    """,
    doc="Bloom-filter false-positive audit for the exact construction "
    "join_bloom_prefilter deploys (k=2 md5 hashes, m=65536): probes "
    "every NON-member key, reports the observed fp rate against the "
    "occupancy-product expectation (occ0·occ1/m²) — both in ppm, both "
    "integer-exact. The measurement that tells you whether a runtime "
    "filter is still worth its probe cost as the build side grows. "
    "Scale: two distinct-sets (bit positions, ≤m rows each, broadcast) "
    "+ one probe pass.",
    tags=("pipeline", "sketch", "join"),
)
def sketch_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]

    def h(i):
        return md5_bucket(
            F.concat(F.lit(f"b{i}:"), F.col("k").cast("string")), 65536
        )

    build = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    bits = [build.select(h(i).alias("h")).distinct() for i in (0, 1)]
    probes = (
        orders.filter(F.col("o_totalprice") <= 400000)
        .select(F.col("o_orderkey").alias("k"))
        .distinct()
    )
    hits = probes
    for i in (0, 1):
        hits = hits.withColumn(f"h{i}", h(i)).join(
            F.broadcast(bits[i].withColumnRenamed("h", f"h{i}")),
            f"h{i}",
            "left_semi",
        )
    counts = (
        build.agg(F.count(F.lit(1)).cast("bigint").alias("n_build"))
        .crossJoin(bits[0].agg(F.count(F.lit(1)).cast("bigint").alias("occ0")))
        .crossJoin(bits[1].agg(F.count(F.lit(1)).cast("bigint").alias("occ1")))
        .crossJoin(probes.agg(F.count(F.lit(1)).cast("bigint").alias("n_probes")))
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("bigint").alias("false_pos")))
    )
    return counts.select(
        "*",
        F.expr(
            "CAST(false_pos * 1000000 DIV n_probes AS BIGINT)"
        ).alias("observed_ppm"),
        F.expr(
            "CAST(occ0 * occ1 * 1000000 DIV "
            "(CAST(65536 AS BIGINT) * 65536) AS BIGINT)"
        ).alias("expected_ppm"),
    )


@register(
    "events_session_stats",
    oracle="""
        WITH e AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        ),
        d AS (
          SELECT user_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 600000000
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ),
        s AS (
          SELECT user_id, us,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM d
        ),
        sess AS (
          SELECT user_id, sid,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
          FROM s GROUP BY user_id, sid
        ),
        banded AS (
          SELECT CASE WHEN n_events = 1 THEN '1_bounce'
                      WHEN n_events <= 5 THEN '2_short'
                      WHEN n_events <= 20 THEN '3_medium'
                      ELSE '4_long' END AS band,
                 n_events, dur_us
          FROM sess
        )
        SELECT band,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               (CAST(COUNT(*) AS BIGINT) * 1000000)
                 // CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS share_ppm,
               CAST(SUM(n_events) // COUNT(*) AS BIGINT) AS mean_events,
               CAST(SUM(dur_us) // COUNT(*) AS BIGINT) AS mean_dur_us
        FROM banded
        GROUP BY band
        ORDER BY band
    """,
    doc="Session-level rollup over 10-minute-gap sessions (the native "
    "session_window operator events_session_windows exposes): bounce "
    "rate and the short/medium/long engagement mix with integer-exact "
    "mean events and duration per band — the product-analytics summary "
    "consumed daily. Session durations use first→last event (end-gap "
    "padding excluded). Everything after the sessionize shuffle is a "
    "bands-sized aggregate.",
    tags=("pipeline", "events", "session"),
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    et = F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")).alias("et")
    sess = (
        ev.select("user_id", et)
        .groupBy("user_id", F.session_window("et", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "n_events",
            (
                F.unix_micros("w.end")
                - F.unix_micros("w.start")
                - F.lit(600000000)
            ).alias("dur_us"),
        )
    )
    banded = sess.select(
        "n_events",
        "dur_us",
        F.when(F.col("n_events") == 1, "1_bounce")
        .when(F.col("n_events") <= 5, "2_short")
        .when(F.col("n_events") <= 20, "3_medium")
        .otherwise("4_long")
        .alias("band"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.expr("CAST(SUM(n_events) DIV COUNT(*) AS BIGINT)").alias(
                "mean_events"
            ),
            F.expr("CAST(SUM(dur_us) DIV COUNT(*) AS BIGINT)").alias(
                "mean_dur_us"
            ),
        )
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST(n_sessions * 1000000 AS BIGINT) "
                "DIV CAST(SUM(n_sessions) OVER () AS BIGINT)"
            ),
        )
        .select("band", "n_sessions", "share_ppm", "mean_events", "mean_dur_us")
        .orderBy("band")
    )


@register(
    "sketch_join_size_estimate",
    oracle="""
        WITH ds AS (SELECT unnest(generate_series(0, 2)) AS d),
        ca AS (
          SELECT d.d,
                 CAST('0x' || substr(md5('j' || CAST(d.d AS VARCHAR) || ':'
                   || CAST(o_orderkey AS VARCHAR)), 1, 6) AS BIGINT) % 1024
                   AS bkt,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM orders CROSS JOIN ds d GROUP BY 1, 2
        ),
        cb AS (
          SELECT d.d,
                 CAST('0x' || substr(md5('j' || CAST(d.d AS VARCHAR) || ':'
                   || CAST(l_orderkey AS VARCHAR)), 1, 6) AS BIGINT) % 1024
                   AS bkt,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem CROSS JOIN ds d GROUP BY 1, 2
        ),
        ests AS (
          SELECT ca.d, CAST(SUM(ca.c * cb.c) AS BIGINT) AS est
          FROM ca JOIN cb ON ca.d = cb.d AND ca.bkt = cb.bkt
          GROUP BY ca.d
        ),
        exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        )
        SELECT CAST((SELECT MIN(est) FROM ests) AS BIGINT) AS est_join_rows,
               exact.n AS exact_join_rows,
               CAST(((SELECT MIN(est) FROM ests) - exact.n) * 1000000
                    // exact.n AS BIGINT) AS over_ppm
        FROM exact
    """,
    doc="Count-min join-cardinality estimate: |orders ⋈ lineitem| "
    "predicted as min over 3 hash rows of Σ_bucket cntA·cntB (the CM "
    "inner-product estimator — always an OVERestimate, collision bias "
    "reported in ppm) against the exact join count. The sketch side "
    "costs two narrow counts into 3×1024 integer buckets — what a "
    "query planner consults BEFORE committing to a join order at "
    "100 TB, where the exact count is the expensive thing being "
    "avoided. All-integer (md5 buckets, bigint products).",
    tags=("pipeline", "sketch", "join"),
)
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    ds = spark.range(3).select(F.col("id").cast("int").alias("d"))

    def cm(df, key):
        return (
            df.select(F.col(key).alias("k"))
            .crossJoin(F.broadcast(ds))
            .select(
                "d",
                md5_bucket(
                    F.concat(
                        F.lit("j"),
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("k").cast("string"),
                    ),
                    1024,
                ).alias("bkt"),
            )
            .groupBy("d", "bkt")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    ca, cb = cm(t["orders"], "o_orderkey"), cm(t["lineitem"], "l_orderkey")
    ests = (
        ca.join(cb.withColumnRenamed("c", "c2"), ["d", "bkt"])
        .groupBy("d")
        .agg(F.sum(F.col("c") * F.col("c2")).cast("bigint").alias("est"))
        .agg(F.min("est").cast("bigint").alias("est_join_rows"))
    )
    exact = (
        t["orders"]
        .join(
            t["lineitem"],
            t["orders"].o_orderkey == t["lineitem"].l_orderkey,
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_join_rows"))
    )
    return ests.crossJoin(exact).select(
        "est_join_rows",
        "exact_join_rows",
        F.expr(
            "CAST((est_join_rows - exact_join_rows) * 1000000 "
            "DIV exact_join_rows AS BIGINT)"
        ).alias("over_ppm"),
    )


_SWEEP_CAP = 50


def _band_sweep_oracle() -> str:
    from icebergsql_spark.operators import dedup

    k = dedup.MINHASH_K
    sig_cols = ", ".join(f"min(md5('{j}:' || w)) AS sig_{j}" for j in range(k))
    bands_ctes = []
    blocks = []
    for b in (1, 2, 3, 6):
        rows = k // b
        defs = ", ".join(
            "md5(" + " || ".join(f"sig_{bb * rows + r}" for r in range(rows))
            + f") AS b{bb}"
            for bb in range(b)
        )
        bands_ctes.append(f"bands{b} AS (SELECT doc_id, {defs} FROM sigs)")
        for bb in range(b):
            bands_ctes.append(
                f"ok{b}_{bb} AS (SELECT b{bb} AS key FROM bands{b} "
                f"GROUP BY 1 HAVING COUNT(*) <= {_SWEEP_CAP})"
            )
        cand = " UNION ".join(
            f"SELECT x.doc_id AS a, y.doc_id AS b FROM bands{b} x "
            f"JOIN bands{b} y ON x.b{bb} = y.b{bb} AND x.doc_id < y.doc_id "
            f"WHERE x.b{bb} IN (SELECT key FROM ok{b}_{bb})"
            for bb in range(b)
        )
        keys = " + ".join(
            f"(SELECT COUNT(DISTINCT b{bb}) FROM bands{b})" for bb in range(b)
        )
        hot = " + ".join(
            f"(SELECT COUNT(DISTINCT b{bb}) FROM bands{b}) "
            f"- (SELECT COUNT(*) FROM ok{b}_{bb})"
            for bb in range(b)
        )
        blocks.append(f"""
        SELECT {b} AS bands, {rows} AS rows_per_band,
               CAST({keys} AS BIGINT) AS n_band_keys,
               CAST({hot} AS BIGINT) AS n_hot_buckets,
               CAST((SELECT COUNT(*) FROM ({cand})) AS BIGINT)
                 AS n_candidate_pairs
        FROM (SELECT 1) one""")
    ctes = ",\n        ".join(bands_ctes)
    return f"""
        WITH docs AS (SELECT doc_id, text FROM documents),
        words AS (
          SELECT doc_id,
                 unnest(list_distinct(string_split(trim(text), ' '))) AS w
          FROM docs
        ),
        sigs AS (SELECT doc_id, {sig_cols} FROM words GROUP BY doc_id),
        {ctes}
        SELECT * FROM ({" UNION ALL ".join(blocks)})
        ORDER BY bands
    """


@register(
    "dedup_lsh_band_sweep",
    oracle=_band_sweep_oracle(),
    doc="LSH banding sweep over the k=6 minhash signatures: for every "
    "(bands, rows) factorization — (1,6) strictest through (6,1) most "
    "permissive — the distinct band-key count (index size), the HOT "
    "buckets excluded by the df-cap (>" + str(_SWEEP_CAP) + " docs: a "
    "bucket that size yields quadratic pairs and near-zero precision — "
    "the same guard the production jaccard/containment operators apply),"
    " and the capped candidate-pair yield. THE tuning table for near-dup"
    " recall vs verification cost before a 100 TB run: each extra band "
    "lowers the S-curve threshold and multiplies verifier work, and the "
    "hot-bucket column shows exactly when a config degenerates.",
    tags=("pipeline", "dedup"),
)
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.functions.hashing import combine_hash
    from icebergsql_spark.operators import dedup
    from icebergsql_spark.operators.util import track_cache

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    k = dedup.MINHASH_K
    sigs = dedup.minhash_signatures(docs).localCheckpoint()
    # r15 restructure (guide §2.4 — one pass, not 12): the old plan built
    # 12 per-(bands, band) subtrees (3 tiny aggregates + a bucket self-
    # join each) and cross-joined them into 4 rows — 102 broadcast-future
    # stages. The SAME counts come from ONE unpivoted (bands, bb, key)
    # frame: n_band_keys = distinct (bb, key) per bands, hot = those with
    # sz > cap, candidate pairs = the bucket self-join keyed on (bands,
    # bb, key) deduped per bands — the UNION-across-bands dedup of the
    # oracle, verbatim. Counting semantics unchanged (oracle untouched,
    # MATCH re-verified at 3 SFs).
    structs = []
    for b in (1, 2, 3, 6):
        rows = k // b
        for bb in range(b):
            structs.append(
                F.struct(
                    F.lit(b).alias("bands"),
                    F.lit(bb).alias("bb"),
                    combine_hash(
                        [F.col(f"sig_{bb * rows + r}") for r in range(rows)]
                    ).alias("key"),
                )
            )
    long = sigs.select(
        "doc_id", F.explode(F.array(*structs)).alias("x")
    ).select("doc_id", "x.bands", "x.bb", "x.key")
    sizes = track_cache(
        long.groupBy("bands", "bb", "key").agg(
            F.count(F.lit(1)).alias("sz")
        )
    )
    stats = sizes.groupBy("bands").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_band_keys"),
        F.sum((F.col("sz") > _SWEEP_CAP).cast("bigint"))
        .cast("bigint")
        .alias("n_hot_buckets"),
    )
    ok = sizes.filter(F.col("sz") <= _SWEEP_CAP).select("bands", "bb", "key")
    member = long.join(ok, ["bands", "bb", "key"], "left_semi")
    x = member.alias("x")
    y = member.select(
        "bands", "bb", "key", F.col("doc_id").alias("doc_b")
    ).alias("y")
    pair_counts = (
        x.join(y, ["bands", "bb", "key"])
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select("bands", "doc_id", "doc_b")
        .distinct()
        .groupBy("bands")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"))
    )
    return (
        stats.join(pair_counts, "bands", "left")
        .select(
            "bands",
            (F.lit(k) / F.col("bands")).cast("int").alias("rows_per_band"),
            "n_band_keys",
            "n_hot_buckets",
            F.coalesce(
                "n_candidate_pairs", F.lit(0).cast("bigint")
            ).alias("n_candidate_pairs"),
        )
        .orderBy("bands")
    )
