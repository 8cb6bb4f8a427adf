"""Round-4 operator wave: training-data pipeline + temporal additions.

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
from icebergsql_spark.plans.registry import load_tables, local_result, nonempty, register

# ±6 h in epoch micros — the nearest-match tolerance
_NEAR_TOL_US = 21_600_000_000


@register(
    "text_domain_mix_report",
    oracle="""
        WITH g AS (
          SELECT source, lang,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY source, lang
        )
        SELECT source, lang, n_docs, total_chars,
               total_chars // n_docs AS mean_chars,
               (n_docs * 1000000)
                 // CAST(SUM(n_docs) OVER () AS BIGINT) AS share_ppm
        FROM g
        ORDER BY source, lang
    """,
    doc="Training-corpus composition report: per (source, lang) doc count, "
    "char volume, mean doc length, and corpus share in ppm — the mix table "
    "a data-curation pipeline checks before sampling. Scale shape: one "
    "map-side-combined groupBy; the share window runs over the tiny "
    "POST-aggregation frame (|sources|x|langs| rows), never the corpus. "
    "Integer ppm (non-negative div) keeps it hash-exact.",
    tags=("pipeline", "text", "curation"),
)
def text_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    return (
        g.withColumn("__corpus", F.sum("n_docs").over(W.partitionBy()))
        .select(
            "source",
            "lang",
            "n_docs",
            "total_chars",
            F.expr("total_chars div n_docs").alias("mean_chars"),
            F.expr("(n_docs * 1000000) div __corpus").alias("share_ppm"),
        )
        .orderBy("source", "lang")
    )


@register(
    "agg_weighted_quantiles",
    oracle="""
        WITH g AS (
          SELECT l_returnflag AS flag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
          FROM lineitem
          GROUP BY 1, 2
        ),
        c AS (
          SELECT flag, cents, w,
                 CAST(SUM(w) OVER (
                   PARTITION BY flag ORDER BY cents) AS BIGINT) AS cum,
                 CAST(SUM(w) OVER (PARTITION BY flag) AS BIGINT) AS tot
          FROM g
        )
        SELECT flag AS l_returnflag,
               CAST(MIN(CASE WHEN cum >= (tot * 25 + 99) // 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p25,
               CAST(MIN(CASE WHEN cum >= (tot * 50 + 99) // 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p50,
               CAST(MIN(CASE WHEN cum >= (tot * 75 + 99) // 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p75
        FROM c GROUP BY flag ORDER BY flag
    """,
    doc="Weighted quantiles (p25/p50/p75 of extended price weighted by "
    "quantity, per return flag) via the cumulative-weight rule: smallest "
    "value whose running weight reaches ceil(q·W). Spark's percentile "
    "family is unweighted; this is the exact weighted analogue. Scale "
    "shape: pre-aggregating to DISTINCT (group, value) rows shrinks the "
    "window input from row count to value-cardinality before the one "
    "per-group sort — integer cents end to end, one final double cast.",
    tags=("pipeline", "agg", "quantiles"),
)
def agg_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        WITH g AS (
          SELECT l_returnflag AS flag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                 SUM(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem
          GROUP BY 1, 2
        ),
        c AS (
          SELECT flag, cents, w,
                 SUM(w) OVER (PARTITION BY flag ORDER BY cents) AS cum,
                 SUM(w) OVER (PARTITION BY flag) AS tot
          FROM g
        )
        SELECT flag AS l_returnflag,
               CAST(MIN(CASE WHEN cum >= (tot * 25 + 99) div 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p25,
               CAST(MIN(CASE WHEN cum >= (tot * 50 + 99) div 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p50,
               CAST(MIN(CASE WHEN cum >= (tot * 75 + 99) div 100
                             THEN cents END) AS DOUBLE) / 100.0 AS p75
        FROM c GROUP BY flag ORDER BY flag
    """)


@register(
    "events_asof_nearest",
    oracle=f"""
        WITH p AS (
          SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'purchase'
        ),
        c AS (
          SELECT user_id, epoch_us(ts) AS ts_us FROM events
          WHERE event_type = 'click'
        ),
        cand AS (
          SELECT p.event_id, c.ts_us AS c_us,
                 abs(p.ts_us - c.ts_us) AS g,
                 CASE WHEN c.ts_us <= p.ts_us THEN 0 ELSE 1 END AS pref
          FROM p JOIN c ON p.user_id = c.user_id
           AND c.ts_us BETWEEN p.ts_us - {_NEAR_TOL_US}
                           AND p.ts_us + {_NEAR_TOL_US}
        ),
        best AS (
          SELECT event_id, c_us,
                 row_number() OVER (
                   PARTITION BY event_id ORDER BY g, pref, c_us) AS rn
          FROM cand
        )
        SELECT p.event_id, p.user_id, p.ts_us AS purchase_us,
               b.c_us AS nearest_click_us,
               p.ts_us - b.c_us AS gap_us
        FROM p LEFT JOIN best b ON b.event_id = p.event_id AND b.rn = 1
        ORDER BY p.event_id
    """,
    doc="Nearest-match as-of join (pandas merge_asof direction='nearest', "
    "which Spark lacks): for each purchase the closest click within ±6 h, "
    "ties preferring the earlier click. operators/temporal.py:asof_nearest "
    "— union-sort, ONE shuffle on user_id, two window frames over the "
    "same sort (no pair materialization); the oracle cross-checks with a "
    "tolerance-bounded join + rank, feasible only at oracle scale.",
    tags=("pipeline", "temporal", "asof"),
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.temporal import asof_nearest

    ev = load_tables(spark, sf_dir, ("events",))["events"].withColumn(
        "ts_us", F.expr("ts div 1000")  # nanos → epoch micros (tz-free)
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us"
    )
    joined = asof_nearest(
        purchases, clicks, key="user_id", left_ts="ts_us",
        right_ts="ts_us", tolerance=_NEAR_TOL_US,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("purchase_us"),
        F.col("nearest_ts").alias("nearest_click_us"),
        (F.col("ts_us") - F.col("nearest_ts")).alias("gap_us"),
    ).orderBy("event_id")


@register(
    "dedup_span_overlap",
    oracle="""
        WITH docs AS (
          SELECT doc_id, text FROM documents WHERE doc_id < 300
        ),
        sh AS (
          SELECT doc_id, unnest(list_distinct(
            list_transform(
              generate_series(
                1, greatest(len(string_split(trim(text), ' ')) - 4, 1)),
              i -> array_to_string(
                list_slice(string_split(trim(text), ' '), i, i + 4), ' ')
            ))) AS shingle
          FROM docs
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        shared AS (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS shared_spans
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING COUNT(*) >= 5
        )
        SELECT shared.a, shared.b, shared_spans,
               round(shared_spans / least(sa.sz, sb.sz), 6)
                 AS span_containment
        FROM shared
        JOIN sizes sa ON sa.doc_id = shared.a
        JOIN sizes sb ON sb.doc_id = shared.b
        ORDER BY shared.a, shared.b
    """,
    doc="Verbatim-span dedup — the distributed approximation of "
    "suffix-array substring dedup (Lee et al. 2022): doc pairs sharing "
    ">= 5 distinct word 5-gram spans, with span containment over the "
    "smaller doc. A copied passage of L words yields L-4 shared spans "
    "while unigram Jaccard stays low. operators/dedup.py:"
    "span_overlap_pairs — explode + rare-key equi-join, never a doc-pair "
    "cross product; long spans keep per-key fan-out tiny at corpus scale.",
    tags=("pipeline", "dedup"),
)
def dedup_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import dedup

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 300
    )
    return dedup.span_overlap_pairs(docs, n=5, min_shared=5).orderBy("a", "b")


@register(
    "managed_rewrite_predicate_dv",
    oracle="""
        WITH base AS (
          SELECT l_returnflag, l_quantity FROM lineitem
          WHERE l_orderkey % 4 = 1 AND NOT (l_quantity < 5)
        ),
        agg AS (
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS sum_qty
          FROM base GROUP BY l_returnflag
        )
        SELECT stage, l_returnflag, n, sum_qty
        FROM agg
        CROSS JOIN (SELECT unnest(['mor', 'rewritten']) AS stage) s
        ORDER BY stage, l_returnflag
    """,
    doc="Merge-on-read DELETE via position delete vectors, then "
    "rewrite_position_deletes (table.py:delete_where/_write_delete_vectors/"
    "rewrite_position_deletes — Iceberg v2 MoR re-expressed on the pure-"
    "Python snapshot layer with _metadata.file_path/row_index as row "
    "coordinates). The predicate delete records ONLY matching positions "
    "(asserted: zero data files added, live file set unchanged), scans "
    "anti-join the DV rowset, the metadata COUNT fast path subtracts DV "
    "counts exactly, and the rewrite folds DVs back into the layout as a "
    "rowset-preserving 'replace'. The aggregate is emitted at BOTH stages "
    "and must be identical — the MoR read path and the rewritten layout "
    "agree bit-for-bit. At 100 TB: delete cost ∝ deleted rows instead of "
    "rewritten bytes, the trade that makes frequent small deletes (GDPR "
    "erasure, label fixes) affordable between maintenance windows.",
    tags=("managed", "dml", "mor"),
)
def managed_rewrite_predicate_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.managed import _LI_DDL, _lineitem_with_year
    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-morwh-"))
    tbl = cat.create_table(
        "li_mor",
        _LI_DDL,
        partition_cols=["l_shipyear"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    li = _lineitem_with_year(spark, sf_dir)
    tbl.insert(nonempty(li.filter(F.col("l_orderkey") % 4 == 1)))
    mark_setup_done()  # fixture built; MoR delete + rewrite is the op
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.delete_where("l_quantity < 5")
    assert snap.num_added_files == 0, "MoR delete must not write data files"
    assert {f.path for f in snap.live_files()} == before
    assert snap.dv_manifest_paths, "straddling MoR delete must record a DV"

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

    mor = agg("mor")
    mor_rows = mor.collect()  # materialize BEFORE the layout rewrite
    # metadata-only COUNT subtracts DV counts exactly (zero Spark jobs);
    # the mor aggregate just visited every live row — its group counts
    # ARE the true masked count, so no second full read (r15, §1.2)
    assert tbl.scan().count_from_stats() == sum(r["n"] for r in mor_rows)
    rs = tbl.rewrite_position_deletes()
    assert rs is not None and rs.operation == "replace"
    assert not tbl.meta.current_snapshot().dv_manifest_paths
    return (
        local_result(spark, mor_rows, mor.schema)
        .unionByName(agg("rewritten"))
        .orderBy("stage", "l_returnflag")
    )


@register(
    "text_minhash_containment",
    oracle="""
        WITH words AS (
          SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' ')))
            AS w
          FROM documents
        ),
        hashed AS (SELECT doc_id, md5('c:' || w) AS h FROM words),
        sk0 AS (
          SELECT doc_id,
                 list_slice(list_sort(list(DISTINCT h)), 1, 12) AS sk,
                 min(h) AS sig0
          FROM hashed GROUP BY doc_id
        ),
        sk AS (
          -- one representative per DISTINCT signature: exact clones
          -- collapse (plain exact-dedup's job), so pairing is quadratic
          -- only in near-dup variety, never in clone-cluster size
          SELECT min(doc_id) AS doc_id, any_value(sk) AS sk,
                 any_value(sig0) AS sig0
          FROM sk0 GROUP BY array_to_string(sk, '|')
        ),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sk AS ask
          FROM sk a JOIN sk b
            ON a.sig0 = b.sig0 AND a.doc_id < b.doc_id
        ),
        expl AS (SELECT doc_a, doc_b, unnest(ask) AS h FROM pairs),
        m AS (
          SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS matches
          FROM expl
          JOIN hashed ON hashed.doc_id = expl.doc_b AND hashed.h = expl.h
          GROUP BY doc_a, doc_b
        )
        SELECT doc_a, doc_b, matches,
               (matches * 1000000) // 12 AS cont_ppm
        FROM m ORDER BY doc_a, doc_b LIMIT 500
    """,
    doc="Bottom-k (KMV) minhash CONTAINMENT estimate — 'is doc A "
    "substantially contained in doc B?', the asymmetric question Jaccard "
    "misses (a quote inside a long article has low Jaccard but high "
    "containment). Per doc: the 12 smallest md5 token hashes form the "
    "sketch; candidate pairs come from equal minimum hash (sig0 LSH "
    "blocking — never all-pairs); the estimate is the fraction of A's "
    "sketch elements present in B's token-hash set, found by exploding "
    "the 12-element sketch and one equi-join against the token table. "
    "Scale shape: tokenize+hash is a narrow map, the sketch groupBy is "
    "map-side combined, the probe join is keyed on (doc, hash), and — "
    "the scale-decisive step — docs are CANONICALIZED to one "
    "representative per distinct signature BEFORE pairing, so block "
    "fan-out is quadratic only in near-dup VARIETY, never in "
    "clone-cluster size (a corpus of 10^4 identical boilerplate pages "
    "contributes one representative, not 10^8 pairs; finding the clones "
    "is exact-dedup's job). md5 bit-equality makes the estimate "
    "oracle-checkable (CLAUDE.md md5 parity).",
    tags=("pipeline", "text", "dedup"),
)
def text_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism, track_cache

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    # the token-hash table is referenced TWICE (the sketch build and the
    # probe join) — persist it so the tokenize+md5 pass over the corpus
    # runs once, not once per reference (guide §5 caching rule; rows
    # unchanged, measured ~5.0 s → ~3.3 s at sf0.1)
    hashed = track_cache(
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.trim(F.col("text")), " "))
            ).alias("w"),
        ).select("doc_id", F.md5(F.concat(F.lit("c:"), F.col("w"))).alias("h"))
    )
    sk0 = hashed.groupBy("doc_id").agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, 12).alias("sk"),
        F.min("h").alias("sig0"),
    )
    # collapse exact-signature clones to their min-doc_id representative
    # (every row in a group carries the identical sk/sig0)
    sk = (
        sk0.groupBy(F.array_join("sk", "|").alias("__sigkey"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("sk").alias("sk"),
            F.first("sig0").alias("sig0"),
        )
        .drop("__sigkey")
    )
    pairs = (
        sk.alias("a")
        .join(
            sk.alias("b"),
            (F.col("a.sig0") == F.col("b.sig0"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sk").alias("ask"),
        )
    )
    expl = pairs.select("doc_a", "doc_b", F.explode("ask").alias("h"))
    m = (
        expl.join(
            hashed.select(F.col("doc_id").alias("doc_b"), "h"),
            ["doc_b", "h"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("matches"))
    )
    return (
        m.select(
            "doc_a",
            "doc_b",
            "matches",
            F.expr("(matches * 1000000) div 12").alias("cont_ppm"),
        )
        .orderBy("doc_a", "doc_b")
        .limit(500)
    )


@register(
    "managed_mor_merge_cdc",
    oracle="""
        WITH tgt AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 2 = 0
        ),
        src AS (
          SELECT o_orderkey,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 4 IN (0, 1)
        ),
        merged AS (
          SELECT COALESCE(t.o_orderstatus, s.o_orderstatus) AS o_orderstatus,
                 COALESCE(t.c, 0) + COALESCE(s.c, 0) AS c
          FROM tgt t FULL OUTER JOIN src s USING (o_orderkey)
        )
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS DOUBLE) / 100.0 AS total
        FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Merge-on-read MERGE as the CDC-upsert primitive (table.py:"
    "_merge_mor): a change batch upserts into a managed table whose "
    "write.merge.mode is merge-on-read — matched target rows are masked "
    "by a position delete vector (key semi-join on the position-annotated "
    "read, never a file rewrite: asserted zero files deleted, prior file "
    "set preserved) while accumulated update images and new-key inserts "
    "append in one job. The trade vs copy-on-write MERGE "
    "(managed_merge_upsert): write amplification bounded by churned rows "
    "instead of touched FILES — at 100 TB a 0.1% CDC batch scattered "
    "across every file rewrites nothing. Money kept in integer cents "
    "until the final division (order-independent float contract).",
    tags=("managed", "dml", "mor", "cdc"),
)
def managed_mor_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.table import Catalog

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        "o_orderstatus",
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-morcdc-"))
    tbl = cat.create_table(
        "ord_cdc",
        "o_orderkey bigint, c bigint, o_orderstatus string",
        partition_cols=["o_orderstatus"],
        properties={"write.merge.mode": "merge-on-read"},
    )
    tbl.insert(nonempty(base.filter(F.col("o_orderkey") % 2 == 0)))
    mark_setup_done()  # seed built; the MoR MERGE is the op
    before = {f.path for f in tbl.meta.current_snapshot().live_files()}
    snap = tbl.merge(
        base.filter(F.col("o_orderkey") % 4 < 2),
        on=["o_orderkey"],
        when_matched="update",
        set_exprs={"c": "t.c + s.c"},
        when_not_matched_insert=True,
    )
    assert snap.operation == "overwrite"
    assert snap.num_deleted_files == 0, "MoR merge must not drop data files"
    assert before <= {f.path for f in snap.live_files()}
    assert snap.dv_manifest_paths, "matched rows must be masked by a DV"
    return (
        tbl.to_df()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "managed_eq_delete_cdc",
    oracle="""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderstatus
          FROM orders WHERE o_orderkey % 3 = 0
        ),
        final AS (
          SELECT k,
                 CASE WHEN k % 12 = 0 THEN c + 2
                      WHEN k % 6 = 0 THEN c + 1
                      ELSE c END AS c,
                 o_orderstatus
          FROM base WHERE k % 9 <> 0
        ),
        agg AS (
          SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM final GROUP BY o_orderstatus
        )
        SELECT stage, o_orderstatus, n, total
        FROM agg
        CROSS JOIN (SELECT unnest(['converted', 'eq']) AS stage) s
        ORDER BY stage, o_orderstatus
    """,
    doc="Equality-delete CDC (table.py:upsert_by_keys/delete_by_keys/"
    "convert_equality_deletes — Iceberg v2 equality deletes + sequence "
    "numbers on the pure-Python snapshot layer): two upsert batches "
    "(new images + key delete at ONE sequence number, zero "
    "read-before-write) then a key delete, masking by strict seq "
    "ordering so last-writer-wins per key; the aggregate is emitted "
    "BEFORE and AFTER converting the key rowsets into position DVs and "
    "must be identical. Asserted: no data file is ever rewritten by the "
    "CDC commits, and the metadata COUNT honestly degrades to "
    "undecidable (None) while unconverted equality deletes exist. At "
    "100 TB this is THE sustainable streaming-CDC sink shape: per-batch "
    "cost ∝ batch size, read tax ∝ delete churn, reclaimed by the "
    "convert + rewrite maintenance cadence.",
    tags=("managed", "dml", "mor", "cdc", "streaming"),
)
def managed_eq_delete_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.table import Catalog

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        "o_orderstatus",
    )
    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-eqcdc-"))
    tbl = cat.create_table(
        "ord_eq",
        "k bigint, c bigint, o_orderstatus string",
        partition_cols=["o_orderstatus"],
    )
    tbl.insert(base)
    mark_setup_done()  # seed built; eq-delete CDC + conversion is the op
    written = {f.path for f in tbl.meta.current_snapshot().live_files()}
    tbl.upsert_by_keys(
        nonempty(base.filter(F.col("k") % 6 == 0).withColumn("c", F.col("c") + 1)),
        ["k"],
    )
    tbl.upsert_by_keys(
        nonempty(base.filter(F.col("k") % 12 == 0).withColumn("c", F.col("c") + 2)),
        ["k"],
    )
    snap = tbl.delete_by_keys(
        nonempty(base.filter(F.col("k") % 9 == 0).select("k")), ["k"]
    )
    # CDC commits only ever APPEND: every pre-existing file is still live
    assert written <= {f.path for f in snap.live_files()}
    assert snap.eq_manifest_paths, "unconverted equality deletes expected"
    assert tbl.scan().count_from_stats() is None  # honest undecidability

    def agg(stage: str) -> DataFrame:
        return (
            tbl.to_df()
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum("c").cast("double") / 100.0).alias("total"),
            )
            .select(F.lit(stage).alias("stage"), "*")
        )

    eq_stage = agg("eq")
    eq_rows = eq_stage.collect()  # materialize BEFORE conversion
    cs = tbl.convert_equality_deletes()
    assert cs is not None and cs.operation == "replace"
    assert not tbl.meta.current_snapshot().eq_manifest_paths
    # the eq-stage aggregate already visited every live row, and
    # conversion preserves the live rowset (the returned 'converted'
    # aggregate hash-checks that against the oracle) — reuse its group
    # counts instead of a second full masked count (r15, guide §1.2)
    assert tbl.scan().count_from_stats() == sum(r["n"] for r in eq_rows)
    return (
        local_result(spark, eq_rows, eq_stage.schema)
        .unionByName(agg("converted"))
        .orderBy("stage", "o_orderstatus")
    )


@register(
    "join_skew_salted",
    oracle="""
        SELECT l_returnflag,
               'flag_' || l_returnflag AS label,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                 AS DOUBLE) AS sum_value,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    doc="Skew-mitigation operators end-to-end (operators/skew.py): the "
    "3-hot-key l_returnflag aggregation runs as salted two-phase "
    "sum/count (group on (key, salt) then re-aggregate — N partial rows "
    "per hot key instead of one reducer pinned behind millions), and the "
    "label dimension attaches via the salt-and-explode replicated join "
    "(fact salted, dim exploded across salts, equi-join on (key, salt)) "
    "— the shape for join cases AQE's skew splitting doesn't cover. "
    "Result is bit-identical to the direct plan: cents are integral so "
    "the decimal partial sums are associative-exact under ANY salt "
    "split, which is the whole point — salting is a layout choice, "
    "never a semantics choice.",
    tags=("pipeline", "skew", "join"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.skew import (
        replicated_skew_join,
        salted_sum_count,
    )

    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    fact = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    dim = (
        fact.select("l_returnflag")
        .distinct()
        .withColumn("label", F.concat(F.lit("flag_"), F.col("l_returnflag")))
    )
    labeled = replicated_skew_join(fact, dim, "l_returnflag")
    return (
        salted_sum_count(labeled, ["l_returnflag", "label"], "c")
        .orderBy("l_returnflag")
    )


def _mcos(d: int) -> str:
    return f"""
        list_sum(list_transform(generate_series(1, {d}),
                 i -> b.embedding[i]::DOUBLE * q.qv[i]::DOUBLE))
        / sqrt(
            list_sum(list_transform(generate_series(1, {d}),
                     i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
          * list_sum(list_transform(generate_series(1, {d}),
                     i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
    """


@register(
    "emb_matryoshka_recall",
    oracle=f"""
        WITH q AS (
          SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id % 50 = 7
        ),
        r AS (
          SELECT q.qid, b.vec_id AS nid,
                 ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ({_mcos(64)}) DESC, b.vec_id) AS rn64,
                 ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ({_mcos(16)}) DESC, b.vec_id) AS rn16,
                 ROW_NUMBER() OVER (PARTITION BY q.qid
                   ORDER BY ({_mcos(32)}) DESC, b.vec_id) AS rn32
          FROM q JOIN embeddings b ON b.vec_id != q.qid
        ),
        ov AS (
          SELECT 16 AS prefix_dim, qid,
                 CAST(COUNT(*) FILTER (rn64 <= 5 AND rn16 <= 5) AS BIGINT)
                   AS overlap
          FROM r GROUP BY qid
          UNION ALL
          SELECT 32 AS prefix_dim, qid,
                 CAST(COUNT(*) FILTER (rn64 <= 5 AND rn32 <= 5) AS BIGINT)
                   AS overlap
          FROM r GROUP BY qid
        )
        SELECT prefix_dim, overlap, CAST(COUNT(*) AS BIGINT) AS n_queries
        FROM ov GROUP BY prefix_dim, overlap
        ORDER BY prefix_dim, overlap
    """,
    doc="Matryoshka-prefix retrieval recall (operators/similarity.py:"
    "matryoshka_prefix_recall): per-query overlap histogram between the "
    "exact top-5 under full 64-dim cosine and under 16-/32-dim PREFIX "
    "cosine, over a deterministic modulus query sample — the eval a "
    "team runs before serving truncated embeddings (dims/d memory and "
    "compute win vs recall price). One broadcast pass scores all three "
    "cosines per pair (per-row prefix norms precomputed), the three "
    "rank windows share one query-id shuffle, and the intersection "
    "needs no self-join: a pair is in BOTH top-ks iff both row_numbers "
    "are <= k. Sequential aggregate() folds bit-match DuckDB list_sum "
    "(CLAUDE.md float contract), so even the float rank order is "
    "oracle-exact.",
    tags=("pipeline", "embedding", "ann", "eval"),
)
def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import similarity

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.matryoshka_prefix_recall(
        emb, prefix_dims=[16, 32], k=5, query_mod=50, query_rem=7
    ).orderBy("prefix_dim", "overlap")


@register(
    "managed_streaming_eq_upsert",
    oracle="""
        WITH ranked AS (
          SELECT user_id, event_id, epoch_ns(ts) AS tsn,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
          FROM events
        )
        SELECT user_id, event_id AS last_event_id, tsn AS last_ts, cents
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
    doc="Streaming CDC sink via EQUALITY DELETES end-to-end (streaming/"
    "ingest.py:ManagedTableCDCWriter over table.py:upsert_by_keys): a "
    "managed mart is pre-loaded with a sentinel baseline row per user, "
    "then the events stream arrives in micro-batches (file source, "
    "maxFilesPerTrigger=1) each reduced to one FINAL image per user "
    "(argmax by ts, event_id) and committed as new images + an equality "
    "delete of the keys at ONE sequence number — zero read-before-write, "
    "per-batch cost proportional to the batch. Users are partitioned into "
    "DISJOINT batches, so the final state is independent of the file "
    "source's batch pickup order (which Spark does not guarantee); the "
    "baseline sentinels (cents=-1) must all be masked, which the oracle "
    "verifies by computing the pure per-user argmax directly. Asserted: "
    "streaming commits never drop a data file, and the eq rowsets are "
    "retired by convert_equality_deletes + rewrite before the final read "
    "— the full ingest→maintenance cadence in one query.",
    tags=("managed", "streaming", "dml", "mor", "cdc"),
)
def managed_streaming_eq_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos
    from icebergsql_spark.streaming.ingest import ManagedTableCDCWriter
    from icebergsql_spark.table import Catalog

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src_dir = tempfile.mkdtemp(prefix="icebergsql-eqsrc-")
    # DISJOINT user sets per file -> final state independent of batch order
    for i in range(3):
        ev.filter(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-eqswh-"))
    tbl = cat.create_table(
        "ev_cdc",
        "user_id bigint, last_event_id bigint, last_ts bigint, cents bigint, "
        "ub int",
        partition_cols=["ub"],
    )
    baseline = ev.select("user_id").distinct().select(
        "user_id",
        F.lit(-1).cast("bigint").alias("last_event_id"),
        F.lit(0).cast("bigint").alias("last_ts"),
        F.lit(-1).cast("bigint").alias("cents"),
        (F.col("user_id") % 8).cast("int").alias("ub"),
    )
    tbl.insert(baseline)

    def prepare(batch_df: DataFrame) -> DataFrame:
        img = F.max(
            F.struct(
                F.col("ts").alias("ts"),
                F.col("event_id").alias("event_id"),
                F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            )
        ).alias("img")
        return (
            batch_df.groupBy("user_id")
            .agg(img)
            .select(
                "user_id",
                F.col("img.event_id").alias("last_event_id"),
                F.col("img.ts").alias("last_ts"),
                F.col("img.cents").alias("cents"),
                (F.col("user_id") % 8).cast("int").alias("ub"),
            )
        )

    mark_setup_done()  # source staged + baseline built; the stream is the op
    writer = ManagedTableCDCWriter(tbl, keys=["user_id"], prepare=prepare)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = writer.attach(stream, tempfile.mkdtemp(prefix="icebergsql-eqck-"))
    q.awaitTermination()

    tbl.refresh()
    # streaming CDC commits are append-only: no data file is ever dropped
    streamed = [
        s
        for s in tbl.meta.snapshots
        if "streaming-batch-id" in s.summary
    ]
    assert len(streamed) == 3
    assert all(s.num_deleted_files == 0 for s in streamed)
    assert tbl.meta.current_snapshot().eq_manifest_paths
    # maintenance cadence: fold eq -> DVs -> clean files, rows unchanged
    tbl.convert_equality_deletes()
    tbl.rewrite_position_deletes()
    assert not tbl.meta.current_snapshot().eq_manifest_paths
    assert not tbl.meta.current_snapshot().dv_manifest_paths
    return (
        tbl.to_df()
        .select("user_id", "last_event_id", "last_ts", "cents")
        .orderBy("user_id")
    )


@register(
    "events_markov_transitions",
    oracle="""
        WITH o AS (
          SELECT user_id, event_type, epoch_ns(ts) AS tsn, event_id FROM events
        ),
        seq AS (
          SELECT event_type AS src,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY tsn, event_id) AS dst
          FROM o
        ),
        t AS (
          SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
        )
        SELECT src, dst, n,
               (n * 1000000) // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
                 AS p_ppm
        FROM t ORDER BY src, dst
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (session-flow analysis: after a click, what comes next "
    "and with what probability?). ONE shuffle on user_id orders each "
    "user's history (lead window; event_id tiebreak makes equal "
    "timestamps deterministic), transitions reduce map-side-combined, "
    "and row probabilities are integer ppm over the tiny "
    "|types|x|types| frame. At 100 TB the user-id window is the "
    "sessionization shuffle every event pipeline already pays — the "
    "transition count rides it for free.",
    tags=("pipeline", "events", "analytics"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    t = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        t.withColumn("__row", F.sum("n").over(W.partitionBy("src")))
        .select(
            "src",
            "dst",
            "n",
            F.expr("(n * 1000000) div __row").alias("p_ppm"),
        )
        .orderBy("src", "dst")
    )


@register(
    "events_twap_daily",
    oracle="""
        WITH o AS (
          SELECT user_id, epoch_ns(ts) // 1000 AS us,
                 CAST(round(value * 100) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase'
        ),
        seq AS (
          SELECT us // 86400000000 AS day, c, us,
                 lead(us) OVER (ORDER BY us, c) - us AS dt_us
          FROM o
        ),
        w AS (
          SELECT day,
                 CAST(SUM(c * dt_us) AS BIGINT) AS num,
                 CAST(SUM(dt_us) AS BIGINT) AS den
          FROM seq WHERE dt_us IS NOT NULL AND dt_us > 0
            AND (us + dt_us) // 86400000000 = day
          GROUP BY day
        )
        SELECT CAST(day AS BIGINT) AS day,
               CAST(num AS DOUBLE) / den / 100.0 AS twap
        FROM w ORDER BY day
    """,
    doc="Time-weighted average price (TWAP) per day over the purchase "
    "event stream: each observation holds until the next one, so the "
    "day's average weights every price by its holding duration — the "
    "metric order-book / metering pipelines need where plain AVG "
    "overweights bursts. Integer cents x integer microsecond durations "
    "keep the weighted sum exact (one final double division); intervals "
    "crossing midnight are excluded (closed-form day attribution), and "
    "the lead window's (ts, cents) tiebreak makes equal timestamps "
    "deterministic. Shape: one global time sort for the lead — at scale "
    "the same op runs per instrument key, turning it into the standard "
    "keyed window shuffle.",
    tags=("pipeline", "events", "timeseries"),
)
def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    o = ev.filter(F.col("event_type") == "purchase").select(
        F.expr("ts div 1000").alias("us"),
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    seq = o.select(
        F.expr("us div 86400000000").alias("day"),
        "c",
        "us",
        (F.lead("us").over(W.orderBy("us", "c")) - F.col("us")).alias("dt_us"),
    )
    w = (
        seq.filter(
            F.col("dt_us").isNotNull()
            & (F.col("dt_us") > 0)
            & (F.expr("(us + dt_us) div 86400000000") == F.col("day"))
        )
        .groupBy("day")
        .agg(
            F.sum(F.col("c") * F.col("dt_us")).alias("num"),
            F.sum("dt_us").alias("den"),
        )
    )
    return w.select(
        F.col("day").cast("bigint").alias("day"),
        (F.col("num").cast("double") / F.col("den") / 100.0).alias("twap"),
    ).orderBy("day")


@register(
    "managed_merge_snapshot_sync",
    oracle="""
        WITH t0 AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderstatus AS st
          FROM orders WHERE o_orderkey % 2 = 0
        ),
        s0 AS (
          SELECT o_orderkey AS k,
                 CAST(round(o_totalprice * 100) AS BIGINT) + 5 AS c,
                 o_orderstatus AS st
          FROM orders WHERE o_orderkey % 3 = 0
        ),
        merged AS (
          SELECT COALESCE(t0.st, s0.st) AS st,
                 CASE
                   WHEN t0.k IS NOT NULL AND s0.k IS NOT NULL THEN
                     CASE WHEN s0.c % 2 = 0 THEN s0.c ELSE NULL END
                   WHEN t0.k IS NOT NULL THEN
                     CASE WHEN t0.k % 5 = 0 THEN NULL ELSE -t0.c END
                   ELSE CASE WHEN s0.c % 7 = 0 THEN s0.c + 1
                             WHEN s0.c % 2 = 1 THEN s0.c
                             ELSE NULL END
                 END AS c
          FROM t0 FULL OUTER JOIN s0 USING (k)
        )
        SELECT st AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS DOUBLE) / 100.0 AS total
        FROM merged WHERE c IS NOT NULL
        GROUP BY st ORDER BY st
    """,
    doc="Full SQL MERGE grammar as a snapshot-sync in ONE statement "
    "(sql.py:_merge_managed + table.py ordered-clause machinery): "
    "conditional WHEN MATCHED chains (first-firing-clause-wins: even "
    "source cents update, odd ones delete), WHEN NOT MATCHED BY SOURCE "
    "chains over vanished keys (k%5 deletes, the rest flag by negating "
    "cents — conditions see only t, source columns are NULL there), and "
    "conditional NOT MATCHED chains (round 6: c%7 rows insert via a "
    "column-list with c+1, odd-c rows INSERT *, the rest are skipped — "
    "first-firing-clause-wins), all evaluated in one codegen-able CASE "
    "over a single left join per side. The oracle reconstructs the same "
    "decision table with a FULL OUTER JOIN. Integer cents throughout; "
    "NMBS honestly makes every file a rewrite candidate (docstring'd "
    "with the keyed-anti-join alternative for small sync sets).",
    tags=("managed", "dml", "sql", "cdc"),
)
def managed_merge_snapshot_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-syncwh-"))
    tbl = eng.catalog.create_table(
        "ord_sync", "k bigint, c bigint, st string", partition_cols=["st"]
    )
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderstatus").alias("st"),
    )
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    base.filter(F.col("k") % 3 == 0).withColumn(
        "c", F.col("c") + 5
    ).createOrReplaceTempView("sync_src_v")
    eng.sql("""
        MERGE INTO ord_sync t USING sync_src_v s ON t.k = s.k
        WHEN MATCHED AND s.c % 2 = 0 THEN UPDATE SET c = s.c
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED BY SOURCE AND t.k % 5 = 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c = -t.c
        WHEN NOT MATCHED AND s.c % 7 = 0
            THEN INSERT (k, c, st) VALUES (s.k, s.c + 1, s.st)
        WHEN NOT MATCHED AND s.c % 2 = 1 THEN INSERT *
    """)
    return (
        tbl.to_df()
        .groupBy(F.col("st").alias("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "join_interval_overlap",
    oracle="""
        WITH a AS (
          SELECT o_orderkey AS id,
                 o_orderkey * 7 AS s,
                 o_orderkey * 7 + 1 + o_orderkey % 40 AS e
          FROM orders WHERE o_orderkey % 5 = 0
        ),
        b AS (
          SELECT o_orderkey AS id,
                 o_orderkey * 7 + 3 AS s,
                 o_orderkey * 7 + 4 + o_orderkey % 60 AS e
          FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT a.id AS a_id, b.id AS b_id,
               CAST(least(a.e, b.e) - greatest(a.s, b.s) AS BIGINT)
                 AS overlap_len
        FROM a JOIN b
          ON a.s < b.e AND b.s < a.e
        ORDER BY a_id, b_id
    """,
    doc="Interval-overlap join (genomics/IP-range/reservation shape: "
    "find all pairs of overlapping ranges) via BUCKET EXPANSION: each "
    "interval explodes to the fixed-width buckets it touches "
    "(sequence(s div B, e div B) — O(len/B) rows), candidates equi-join "
    "on bucket id, the exact overlap predicate verifies, and "
    "de-duplication keeps the pair whose overlap STARTS in the joined "
    "bucket (greatest(s1,s2) div B = bucket — allocation-free dedup, no "
    "distinct shuffle). Spark has no native interval join; the naive "
    "theta-join is a broadcast nested loop over n^2 — bucket expansion "
    "turns it into an equi-join whose cost tracks overlap density, THE "
    "standard distributed interval-join recipe. Oracle: the direct "
    "theta join, feasible only at oracle scale.",
    tags=("pipeline", "join", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    B = 64
    a = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("a_id"),
        (F.col("o_orderkey") * 7).alias("a_s"),
        (F.col("o_orderkey") * 7 + 1 + F.col("o_orderkey") % 40).alias("a_e"),
    )
    b = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        (F.col("o_orderkey") * 7 + 3).alias("b_s"),
        (F.col("o_orderkey") * 7 + 4 + F.col("o_orderkey") % 60).alias("b_e"),
    )

    def bucketed(df, s, e):
        return df.withColumn(
            "bk",
            F.explode(F.expr(f"sequence({s} div {B}, {e} div {B})")),
        )

    pairs = (
        bucketed(a, "a_s", "a_e")
        .join(bucketed(b, "b_s", "b_e"), "bk")
        .filter(
            (F.col("a_s") < F.col("b_e"))
            & (F.col("b_s") < F.col("a_e"))
            # dedup without a distinct: count the pair only in the bucket
            # where the overlap starts
            & (F.expr(f"greatest(a_s, b_s) div {B}") == F.col("bk"))
        )
    )
    return pairs.select(
        "a_id",
        "b_id",
        (F.least("a_e", "b_e") - F.greatest("a_s", "b_s")).alias("overlap_len"),
    ).orderBy("a_id", "b_id")


@register(
    "events_stream_attribution_join",
    oracle="""
        WITH c AS (
          SELECT user_id,
                 CAST(trunc(epoch_ns(ts) / 1000.0) AS BIGINT) AS c_us,
                 epoch_ns(ts) AS c_ns
          FROM events WHERE event_type = 'click'
        ),
        p AS (
          SELECT user_id,
                 CAST(trunc(epoch_ns(ts) / 1000.0) AS BIGINT) AS p_us,
                 epoch_ns(ts) AS p_ns,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'
        ),
        m AS (
          SELECT c.user_id, p.cents
          FROM c JOIN p ON c.user_id = p.user_id
           AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 3600000000
        )
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_attributions,
               CAST(SUM(cents) AS DOUBLE) / 100.0 AS attributed_value
        FROM m GROUP BY user_id ORDER BY user_id
    """,
    doc="Stream-stream attribution join end-to-end (streaming/ops.py:"
    "click_purchase_join): the click and purchase streams run as "
    "Structured Streaming sources (one file each -> one deterministic "
    "micro-batch) and inner-join on user within a 1-hour event-time "
    "range; both sides carry watermarks so join state is bounded by "
    "watermark + range horizon — the shape that keeps a 100 TB/day "
    "attribution pipeline's state finite. Aggregated per user and "
    "checked against the equivalent batch range join. The oracle "
    "mirrors the op's micros truncation exactly "
    "(trunc(ns/1000.0) — Spark casts the double division to long).",
    tags=("pipeline", "streaming", "temporal"),
)
def events_stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import stream_partitions
    from icebergsql_spark.plans.registry import events_ts_to_nanos
    from icebergsql_spark.streaming.ops import click_purchase_join

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    c_dir = tempfile.mkdtemp(prefix="icebergsql-attr-c-")
    p_dir = tempfile.mkdtemp(prefix="icebergsql-attr-p-")
    out = tempfile.mkdtemp(prefix="icebergsql-attr-out-")
    ev.filter(F.col("event_type") == "click").coalesce(1).write.mode(
        "append"
    ).parquet(c_dir)
    ev.filter(F.col("event_type") == "purchase").coalesce(1).write.mode(
        "append"
    ).parquet(p_dir)
    clicks = spark.readStream.schema(ev.schema).parquet(c_dir)
    purchases = spark.readStream.schema(ev.schema).parquet(p_dir)
    joined = click_purchase_join(clicks, purchases, within="1 hour")

    def absorb(batch_df, _bid):
        batch_df.write.mode("append").parquet(out)

    # state partitions sized by source bytes (stream state is KB-sized
    # here; the per-partition store-commit floor dominated at the
    # session default — see operators/util.stream_partitions)
    with stream_partitions(spark, c_dir, p_dir):
        q = (
            joined.writeStream.foreachBatch(absorb)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="icebergsql-attr-ck-"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributions"),
            (
                F.sum(F.round(F.col("purchase_value") * 100).cast("bigint"))
                .cast("double")
                / 100.0
            ).alias("attributed_value"),
        )
        .orderBy("user_id")
    )
