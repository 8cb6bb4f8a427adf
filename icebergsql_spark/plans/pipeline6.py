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

from icebergsql_spark.plans.registry import load_tables, register


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
    tbl.insert(li.filter(F.col("l_orderkey") % 3 == 0))
    n_files = len(tbl.meta.current_snapshot().live_files())

    # -- churn: 6 predicate-delete commits; each predicate matches ~1% of
    # rows spread across EVERY file, so DV entries ≈ commits × files --
    for i in range(6):
        snap = tbl.delete_where(f"l_orderkey % 101 = {i}")
        assert snap.num_added_files == 0, "MoR delete wrote data files"
    dv_n = len(tbl.meta.current_snapshot().dv_entries())
    assert dv_n >= 4 * n_files, f"expected per-file-per-commit DVs, got {dv_n}"

    # -- plus 3 equality-delete commits (zero read-before-write CDC) --
    for i in range(3):
        keys = (
            tbl.to_df()
            .filter(F.col("l_orderkey") % 97 == i)
            .select("l_orderkey")
            .distinct()
        )
        tbl.delete_by_keys(keys, ["l_orderkey"])
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
    live = tbl.to_df().count()

    # -- maintenance restores the metadata fast path exactly --
    tbl.convert_equality_deletes()
    assert not tbl.meta.current_snapshot().eq_manifest_paths
    assert tbl.scan().count_from_stats() == live, "DV subtraction inexact"
    tbl.rewrite_position_deletes()
    assert not tbl.meta.current_snapshot().dv_manifest_paths
    assert tbl.scan().count_from_stats() == live

    clean = agg("clean")
    return (
        spark.createDataFrame(churn_rows, clean.schema)
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
    n_docs = docs.count()
    terms = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("tok"),
    )
    dfreq = terms.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        terms.join(dfreq, "tok")
        .withColumn(
            "idf",
            F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
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
            (F.col("ts") / F.lit(86400000000000)).cast("bigint").alias("day"),
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
            (F.col("ts") / F.lit(86400000000000)).cast("bigint").alias("day"),
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
