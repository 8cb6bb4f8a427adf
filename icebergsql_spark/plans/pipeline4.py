"""Round-3 pipeline wave 2: sliding-window chunking, vocabulary build,
dedup-cluster canonical selection, deterministic histogram quantiles.

The operators a training-data curation pipeline runs between "dedup" and
"pack": chunk long documents into overlapping passages, build the token
vocabulary that the tokenizer trainer consumes, pick one canonical
representative per near-duplicate cluster, and summarize value
distributions with a mergeable fixed-width histogram (the sketch shape
that survives a 100 TB merge tree, unlike exact percentiles).

Determinism contract as everywhere in this repo: integer counts, md5
fingerprints (bit-identical in DuckDB), fixed-operand-order float ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.operators import dedup
from icebergsql_spark.plans.pipeline import _DFCAP_PAIRS_CTES
from icebergsql_spark.operators.util import mark_setup_done
from icebergsql_spark.plans.registry import load_tables, nonempty, register

# ------------------------------------------------------------- chunking --

_CHUNK_SIZE = 40
_CHUNK_STRIDE = 20


@register(
    "text_sliding_chunks",
    oracle=f"""
        WITH docs AS (
          SELECT doc_id, string_split(trim(text), ' ') AS t
          FROM documents WHERE doc_id < 300
        ),
        starts AS (
          SELECT doc_id, t,
                 unnest(generate_series(
                   0, CAST(ceil(len(t) / {_CHUNK_STRIDE}.0) AS BIGINT) - 1
                 )) AS j
          FROM docs
        ),
        chunks AS (
          SELECT doc_id,
                 CAST(j AS INT) AS pos,
                 array_to_string(
                   list_slice(t, j * {_CHUNK_STRIDE} + 1,
                              j * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')
                   AS chunk
          FROM starts
        )
        SELECT doc_id, pos,
               CAST(len(string_split(chunk, ' ')) AS INT) AS n_toks,
               substring(md5(chunk), 1, 8) AS fp
        FROM chunks
        ORDER BY doc_id, pos
    """,
    doc="Overlapping sliding-window passage extraction (size=40 tokens, "
    "stride=20) — the retrieval/pretraining chunking step. One narrow "
    "map per doc (sequence + slice + concat inside codegen, no shuffle "
    "until the final sort); chunk identity is an md5 fingerprint so the "
    "output stays narrow. Tail chunks shorter than the window are kept, "
    "matching the HuggingFace `return_overflowing_tokens` convention.",
    tags=("pipeline", "text"),
)
def text_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 300
    )
    # tokenization hoisted to a projection: a split Column referenced from
    # the transform lambda is re-evaluated per element (O(tokens²)/doc)
    t = F.col("__toks")
    starts = F.expr(
        f"sequence(0, cast(ceil(size(__toks) "
        f"/ {_CHUNK_STRIDE}.0) as bigint) - 1)"
    )
    chunks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("__toks")
    ).select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts,
                lambda j: F.concat_ws(
                    " ",
                    F.slice(
                        t,
                        (j * _CHUNK_STRIDE + 1).cast("int"),
                        F.lit(_CHUNK_SIZE),
                    ),
                ),
            )
        ).alias("pos", "chunk"),
    )
    return (
        chunks.select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.size(F.split(F.col("chunk"), " ")).alias("n_toks"),
            F.substring(F.md5(F.col("chunk")), 1, 8).alias("fp"),
        )
        .orderBy("doc_id", "pos")
    )


# ----------------------------------------------------------- vocabulary --


@register(
    "text_vocab_topn",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents),
        toks AS (
          SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
          FROM docs
        ),
        vocab AS (
          SELECT tok,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
                 CAST(COUNT(*) AS BIGINT) AS tf
          FROM toks GROUP BY tok HAVING COUNT(DISTINCT doc_id) >= 5
        )
        SELECT tok, df, tf FROM vocab
        ORDER BY df DESC, tok LIMIT 30
    """,
    doc="Corpus vocabulary build: document frequency + term frequency per "
    "token, min_df=5 cut, top-30 by (df DESC, tok) — the input a "
    "WordPiece/BPE trainer consumes. One explode + one shuffle on token; "
    "COUNT(DISTINCT doc_id) partial-aggregates map-side. At 100 TB the "
    "min_df cut is what keeps the vocabulary shuffle bounded: hapax "
    "legomena (the vast majority of distinct tokens) never survive the "
    "partial aggregate's combiner.",
    tags=("pipeline", "text"),
)
def text_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
        )
        .filter(F.col("df") >= 5)
        .orderBy(F.col("df").desc(), "tok")
        .limit(30)
    )


# ------------------------------------------------- canonical per cluster --


@register(
    "dedup_cluster_canonical",
    oracle=f"""
        WITH RECURSIVE
        {_DFCAP_PAIRS_CTES},
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs
        ),
        cc(node, comp) AS (
            SELECT DISTINCT src, src FROM edges
          UNION
            SELECT e.src, c.comp FROM edges e JOIN cc c ON e.dst = c.node
        ),
        labeled AS (
          SELECT node, MIN(comp) AS component FROM cc GROUP BY node
        ),
        members AS (
          SELECT l.component, l.node, d.n_chars
          FROM labeled l JOIN documents d ON d.doc_id = l.node
        ),
        ranked AS (
          SELECT component, node, n_chars,
                 row_number() OVER (
                   PARTITION BY component
                   ORDER BY n_chars DESC, node
                 ) AS rk
          FROM members
        )
        SELECT CAST(component AS BIGINT) AS component,
               CAST(MAX(CASE WHEN rk = 1 THEN node END) AS BIGINT)
                 AS keep_doc,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                 AS chars_kept,
               CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
                 AS chars_dropped
        FROM ranked GROUP BY component ORDER BY component
    """,
    doc="Canonical-representative selection per near-duplicate cluster: "
    "connected components over the candidate-driven Jaccard pair graph, "
    "then keep the longest document (ties -> smallest doc_id) of each "
    "cluster — the step that turns a dedup pair list into an actual "
    "keep/drop decision (RefinedWeb / FineWeb keep-one policy). Component "
    "labels come from the same min-label propagation as "
    "dedup_connected_components; the representative is one windowed "
    "rank over cluster members (shuffle keyed by component, which is "
    "already the small side after dedup).",
    tags=("pipeline", "dedup"),
)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    pairs = dedup.jaccard_pairs(docs, n=1, threshold=0.5, max_df=30)
    comp = dedup.connected_components(pairs)
    members = comp.join(
        docs.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("node")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("component")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("node"))).alias("keep_doc"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("rk") == 1, F.col("n_chars")).otherwise(0)).alias(
                "chars_kept"
            ),
            F.sum(F.when(F.col("rk") > 1, F.col("n_chars")).otherwise(0)).alias(
                "chars_dropped"
            ),
        )
        .orderBy("component")
    )


# ------------------------------------------- histogram-sketch quantiles --

_HBUCKET_CENTS = 10_000_00  # $10,000-wide buckets over o_totalprice


@register(
    "agg_histogram_quantiles",
    oracle=f"""
        WITH h AS (
          SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                   // {_HBUCKET_CENTS} AS bucket,
                 COUNT(*) AS n
          FROM orders GROUP BY 1
        ),
        c AS (
          SELECT bucket, n,
                 SUM(n) OVER (ORDER BY bucket) AS cum_n,
                 SUM(n) OVER () AS total_n
          FROM h
        ),
        q AS (
          SELECT p, MIN(bucket) AS bucket,
                 MIN(cum_n) AS cum_n, MIN(total_n) AS total_n
          FROM c, (VALUES (50), (90), (99)) AS ps(p)
          WHERE cum_n * 100 >= p * total_n
          GROUP BY p
        )
        SELECT CAST(p AS INT) AS p,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(bucket * {_HBUCKET_CENTS} AS BIGINT) / 100.0
                 AS bucket_lo,
               CAST(cum_n AS BIGINT) AS cum_n,
               CAST(total_n AS BIGINT) AS total_n
        FROM q ORDER BY p
    """,
    doc="Deterministic quantiles from a fixed-width histogram sketch over "
    "o_totalprice: bucket counts (one map-side-combined shuffle, state = "
    "O(buckets) and mergeable — the property exact percentiles lack at "
    "100 TB), cumulative counts, then the smallest bucket whose cumulative "
    "count covers p%% of rows. Integer arithmetic end to end; the bucket "
    "boundary reported as dollars only in the final projection. Non-"
    "negative domain so DuckDB's floor-div // and Spark's truncating DIV "
    "agree (CLAUDE.md rule).",
    tags=("relational", "sketch"),
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    h = (
        orders.select(
            (
                F.round(F.col("o_totalprice") * 100).cast("bigint")
            ).alias("cents")
        )
        .select(F.expr(f"cents div {_HBUCKET_CENTS}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c = h.select(
        "bucket",
        "n",
        F.sum("n")
        .over(Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_n"),
        F.sum("n")
        .over(
            Window.orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("total_n"),
    )
    ps = spark.range(1).select(
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("p")
    )
    q = (
        c.crossJoin(F.broadcast(ps))
        .filter(F.col("cum_n") * 100 >= F.col("p") * F.col("total_n"))
        .groupBy("p")
        .agg(
            F.min("bucket").alias("bucket"),
            F.min("cum_n").alias("cum_n"),
            F.min("total_n").alias("total_n"),
        )
    )
    return q.select(
        F.col("p").cast("int").alias("p"),
        F.col("bucket").cast("bigint").alias("bucket"),
        ((F.col("bucket") * _HBUCKET_CENTS).cast("bigint") / F.lit(100.0)).alias(
            "bucket_lo"
        ),
        F.col("cum_n").cast("bigint").alias("cum_n"),
        F.col("total_n").cast("bigint").alias("total_n"),
    ).orderBy("p")


# ------------------------------------------------------ triangle counting --


@register(
    "graph_triangle_count",
    oracle=f"""
        WITH
        {_DFCAP_PAIRS_CTES},
        deg AS (
          SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs
          ) GROUP BY node
        ),
        tri AS (
          SELECT COUNT(*) AS n FROM pairs e1
          JOIN pairs e2 ON e2.a = e1.b
          JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
               CAST((SELECT SUM(d * (d - 1) // 2) FROM deg) AS BIGINT)
                 AS n_wedges,
               CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
    """,
    doc="Exact triangle counting over the near-duplicate pair graph "
    "(a<b<c ordered-edge two-hop join — the standard distributed "
    "triangle algorithm; ordering each edge low->high makes every "
    "triangle counted exactly once and caps the join fan-out by the "
    "ordered out-degree). Wedge count (sum d*(d-1)/2) comes from one "
    "aggregate, giving the global clustering coefficient 3T/W of the "
    "dup graph — the density diagnostic that tells a curation pipeline "
    "whether its duplicate clusters are cliques (true dup groups) or "
    "chains (threshold too loose). Degrees are non-negative so DuckDB "
    "// floor-div and Spark div agree.",
    tags=("pipeline", "graph"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < 200
    )
    e = dedup.jaccard_pairs(docs, n=1, threshold=0.5, max_df=30).select("a", "b")
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges")
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return edges.crossJoin(wedges).crossJoin(tri)


# ------------------------------------------------------ robust outliers --


@register(
    "events_anomaly_mad",
    oracle="""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type, e.value, m.med,
                 abs(e.value - m.med) AS d
          FROM events e JOIN med m ON e.event_type = m.event_type
        ),
        mad AS (
          SELECT event_type, quantile_cont(d, 0.5) AS mad
          FROM dev GROUP BY event_type
        )
        SELECT dev.event_type,
               round(MIN(dev.med), 6) AS med,
               round(MIN(mad.mad), 6) AS mad,
               CAST(SUM(CASE WHEN dev.d > 5 * mad.mad THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_outliers,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        GROUP BY dev.event_type ORDER BY dev.event_type
    """,
    doc="Robust anomaly detection per event type: median + median absolute "
    "deviation (the outlier-resistant alternative to z-scores — one wild "
    "value cannot move the threshold the way it moves a mean/stddev), "
    "flagging |x - med| > 5*MAD. Exact medians via percentile (DuckDB "
    "quantile_cont bit-matches Spark percentile); the per-group median is "
    "broadcast back over the events in one small-side join, so the shape "
    "is two grouped aggregates + two broadcast joins — no window over the "
    "full table. At 100 TB exact medians would switch to the histogram-"
    "sketch quantiles (agg_histogram_quantiles) with identical plumbing.",
    tags=("pipeline", "events"),
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("d") > 5 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- streaming exact dedup --


@register(
    "events_stream_dedup",
    oracle="""
        SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Stateful streaming exact dedup with BOUNDED state "
    "(withWatermark + dropDuplicatesWithinWatermark on event_id): the "
    "full events table arrives TWICE in two file-source micro-batches, "
    "and the deduped sink must equal the batch COUNT(DISTINCT) — "
    "exactly-once event semantics over an at-least-once transport, the "
    "kafka-consumer reality. Both copies of every id land inside the "
    "watermark window (the watermark only advances between batches and "
    "the full time range repeats), so dedup is exact here while state is "
    "bounded by the delay window — the production shape, not the "
    "unbounded dropDuplicates seen-key set.",
    tags=("pipeline", "streaming"),
)
def events_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import stream_partitions
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sdsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-sdout-")
    # the same rows twice -> two micro-batches -> duplicates SPAN batches
    ev.coalesce(1).write.mode("append").parquet(src)
    ev.coalesce(1).write.mode("append").parquet(src)

    def absorb(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    # event-time column for the watermark (ts is bigint nanos; state is
    # keyed on event_id and expires once the watermark passes
    # event_time + delay). The delay spans the whole synthetic time range
    # so the batch-2 duplicates are still in state — at real scale the
    # delay is the transport's redelivery bound (minutes), keeping state
    # proportional to the window, not the stream.
    # state partitions sized by source bytes (util.stream_partitions)
    with stream_partitions(spark, src):
        q = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .withColumn(
                "event_time",
                F.timestamp_micros((F.col("ts") / 1000).cast("long")),
            )
            .withWatermark("event_time", "365 days")
            .dropDuplicatesWithinWatermark(["event_id"])
            .writeStream.foreachBatch(absorb)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix="icebergsql-sdck-"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .orderBy("event_type")
    )


# ----------------------------------------- incremental dedup-index (IVM) --


@register(
    "managed_incremental_minhash",
    oracle="""
        WITH docs AS (SELECT doc_id, text FROM documents),
        words AS (
          SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' ')))
            AS w
          FROM docs
        ),
        sigs AS (
          SELECT doc_id,
                 min(md5('0:' || w)) AS sig_0, min(md5('1:' || w)) AS sig_1,
                 min(md5('2:' || w)) AS sig_2, min(md5('3:' || w)) AS sig_3,
                 min(md5('4:' || w)) AS sig_4, min(md5('5:' || w)) AS sig_5
          FROM words GROUP BY doc_id
        )
        ,
        bsig AS (
          SELECT doc_id % 16 AS bk,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 md5(string_agg(
                   sig_0 || sig_1 || sig_2 || sig_3 || sig_4 || sig_5, ','
                   ORDER BY doc_id)) AS d
          FROM sigs GROUP BY doc_id % 16
        )
        SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
               substring(md5(string_agg(d, ',' ORDER BY bk)), 1, 16)
                 AS index_digest
        FROM bsig
    """,
    doc="Incrementally-maintained MinHash dedup index over a managed "
    "corpus (the IVM pattern applied to the dedup pipeline): batch 1 of "
    "documents lands in a managed table and its signatures in a managed "
    "index table; batch 2 arrives, and ONLY changes() rows — the delta "
    "since the recorded snapshot — are signed and appended, never a full "
    "recompute. The digest of the final index must equal a from-scratch "
    "signature build over the whole corpus (the oracle). At 100 TB this "
    "is the difference between re-shingling the corpus on every ingest "
    "and signing just the day's arrivals; the same checkpoint-snapshot-id "
    "contract as the streaming data source offsets. Composes "
    "table.py:changes (hops compactions) with operators/dedup.py:"
    "minhash_signatures.",
    tags=("managed", "dedup", "ivm"),
)
def managed_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.table import Catalog

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    cat = Catalog(spark, tempfile.mkdtemp(prefix="icebergsql-mhwh-"))
    corpus = cat.create_table(
        "docs_m", "doc_id bigint, text string, db int", partition_cols=["db"]
    )
    sig_ddl = "doc_id bigint, " + ", ".join(
        f"sig_{j} string" for j in range(6)
    ) + ", db int"
    index = cat.create_table("sigs_m", sig_ddl, partition_cols=["db"])

    def with_db(df):
        return df.withColumn("db", (F.col("doc_id") % 4).cast("int"))

    def sign(df):
        return with_db(dedup.minhash_signatures(df))

    # batch 1: build the index from scratch
    s1 = corpus.insert(nonempty(with_db(docs.filter(F.col("doc_id") % 2 == 0))))
    index.insert(sign(corpus.to_df()))
    mark_setup_done()  # initial index built; the incremental delta is the op
    # batch 2: sign ONLY the delta (changes() since the recorded snapshot)
    corpus.insert(nonempty(with_db(docs.filter(F.col("doc_id") % 2 == 1))))
    delta = nonempty(corpus.changes(s1.snapshot_id), "incremental delta")
    index.insert(sign(delta))

    sigs = index.to_df()
    concat = F.concat(*[F.col(f"sig_{j}") for j in range(6)])
    # verification digest with BOUNDED aggregation state: per-bucket
    # ordered digests (doc_id % B keys a parallel groupBy whose buffers
    # hold n_docs/B signatures each), then an ordered digest-of-digests
    # over the B bucket rows — deterministic like a global sort-concat,
    # without ever collecting the whole index into one reducer.
    n_buckets = 16
    per_bucket = (
        sigs.withColumn(
            "bk", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("long")
        )
        .groupBy("bk")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("doc_id"), concat.alias("c"))
                            )
                        ),
                        lambda x: x["c"],
                    ),
                    ",",
                )
            ).alias("d"),
        )
    )
    return per_bucket.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.substring(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("bk"), F.col("d")))
                        ),
                        lambda x: x["d"],
                    ),
                    ",",
                )
            ),
            1,
            16,
        ).alias("index_digest"),
    )
