"""Round-11 gate wave #5 (pipeline22): historical AS-OF shallow clone,
Calinski-Harabasz clustering quality, lead-lag regression, the
Count-Sketch streaming twin, and audio crest factor.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    local_result,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------- AS OF VERSION clone --


@register(
    "managed_clone_as_of",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        WHERE o_orderkey % 2 = 0
        GROUP BY 1 ORDER BY 1
    """,
    doc="CREATE TABLE <t> LIKE <src> AS OF VERSION <id> WITH DATA — the "
    "HISTORICAL shallow clone (sql.py:_create_like): forks the table "
    "STATE at a retained snapshot, carrying that snapshot's schema "
    "ERA (here: the pre-rename column name, resolved via "
    "schema_json_at) and registering exactly its live files "
    "zero-copy. Asserted: the clone's schema is the old era's, its "
    "rowset is the historical one (current-head rows absent), an "
    "unknown/expired version is refused, and a snapshot spanning two "
    "schema eras is refused like the current-head clone. The "
    "reproduce-last-week's-training-set move: fork the exact "
    "historical state into an independently evolvable table without "
    "copying a byte.",
    tags=("managed", "schema-evolution", "sql"),
)
def managed_clone_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-caowh-"))
    tbl = eng.catalog.create_table(
        "src_cao", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng.sql("ALTER TABLE src_cao RENAME COLUMN c TO val")
    s2 = tbl.insert(
        nonempty(base.filter(F.col("k") % 2 == 1).withColumnRenamed("c", "val")))
    mark_setup_done()  # two-era source built; the AS OF clone is the op
    try:
        eng.sql(
            "CREATE TABLE dst_cao LIKE src_cao AS OF VERSION 999999999"
            " WITH DATA"
        )
        raise AssertionError("unknown version must be refused")
    except ValueError as ex:
        assert "unknown or expired" in str(ex)
    try:
        eng.sql(
            f"CREATE TABLE dst_cao LIKE src_cao AS OF VERSION "
            f"{s2.snapshot_id} WITH DATA"
        )
        raise AssertionError("two-era snapshot must be refused")
    except ValueError as ex:
        assert "schema eras" in str(ex)
    res = eng.sql(
        f"CREATE TABLE dst_cao LIKE src_cao AS OF VERSION "
        f"{s1.snapshot_id} WITH DATA"
    )
    assert res.collect()[0]["added_files_count"] > 0
    dst = eng.catalog.load_table("dst_cao")
    assert [f.name for f in dst.schema.fields] == ["k", "c", "m"], (
        "AS OF clone must carry the historical schema era"
    )
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM dst_cao GROUP BY m ORDER BY m"
    )


# --------------------------------------- Calinski-Harabasz index --

# Everything in quantized integer space: W = sum of per-point squared
# distances to the OWN integer-mean centroid, B = sum over clusters of
# n_c * ||centroid - global integer mean||^2.  CH = (B/(k-1))/(W/(n-k))
# is the single mirrored float division over exact bigints.
_CH_TAIL_SQL = """
        n_tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT cell) AS BIGINT) AS k
          FROM lab
        ),
        gmean AS (
          SELECT pos, CAST(SUM(q) {div} COUNT(*) AS BIGINT) AS gq
          FROM xq GROUP BY pos
        ),
        w AS (
          SELECT CAST(SUM((x.q - c.cq) * (x.q - c.cq)) AS BIGINT) AS w_q
          FROM xq x
          JOIN lab l ON l.vid = x.vid
          JOIN cents c ON c.cell = l.cell AND c.pos = x.pos
        ),
        csz AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_c FROM lab
          GROUP BY cell
        ),
        b AS (
          SELECT CAST(SUM(csz.n_c * (c.cq - g.gq) * (c.cq - g.gq))
                      AS BIGINT) AS b_q
          FROM cents c
          JOIN csz ON csz.cell = c.cell
          JOIN gmean g ON g.pos = c.pos
        )
        SELECT n_tot.n, n_tot.k, w.w_q, b.b_q,
               CASE WHEN w.w_q > 0 AND n_tot.k > 1
                    THEN (CAST(b.b_q AS DOUBLE)
                          * CAST(n_tot.n - n_tot.k AS DOUBLE))
                         / (CAST(w.w_q AS DOUBLE)
                            * CAST(n_tot.k - 1 AS DOUBLE))
               END AS ch
        FROM n_tot CROSS JOIN w CROSS JOIN b
"""


def kmeans_chain_cte() -> str:
    """The integer k-means (k=8, 2 rounds + final assign) oracle chain
    over the full embeddings table, ending at ``lab`` (vid, cell) and
    ``cents`` (cell, pos, cq) — shared by the clustering-quality oracles
    (Calinski-Harabasz here, Davies-Bouldin in pipeline23).  Same
    recurrence as plans/pipeline2._kmeans_oracle / operators/ml."""
    parts = [
        """xq AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
        c0 AS (SELECT vid AS cell, pos, q AS cq FROM xq WHERE vid < 8)"""
    ]
    argmin = "CAST(MIN(dq * 100 + cell) % 100 AS INTEGER)"
    for it in range(2):
        parts.append(f"""
        d{it + 1} AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c{it} c USING (pos) GROUP BY 1, 2
        ),
        a{it + 1} AS (
          SELECT vid, {argmin} AS cell
          FROM d{it + 1} GROUP BY vid
        ),
        c{it + 1} AS (
          SELECT a.cell, x.pos, CAST(SUM(x.q) // COUNT(*) AS BIGINT) AS cq
          FROM xq x JOIN a{it + 1} a USING (vid) GROUP BY 1, 2
        )""")
    parts.append("""
        dfin AS (
          SELECT x.vid, c.cell, SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq x JOIN c2 c USING (pos) GROUP BY 1, 2
        ),
        lab AS MATERIALIZED (
          SELECT vid, CAST(MIN(dq * 100 + cell) % 100 AS INTEGER) AS cell
          FROM dfin GROUP BY vid
        ),
        cents AS MATERIALIZED (
          SELECT l.cell, x.pos,
                 CAST(SUM(x.q) // COUNT(*) AS BIGINT) AS cq
          FROM xq x JOIN lab l ON l.vid = x.vid GROUP BY 1, 2
        ),""")
    return "WITH " + ",".join(parts)


def _ch_oracle() -> str:
    return kmeans_chain_cte() + _CH_TAIL_SQL.format(div="//")


@register(
    "emb_calinski_harabasz",
    oracle=_ch_oracle(),
    doc="Calinski-Harabasz variance-ratio index over the k-means "
    "partition (kmeans_assign, k=8): within dispersion W = exact "
    "quantized squared distances to the own integer-mean centroid, "
    "between dispersion B = cluster-size-weighted centroid spread "
    "around the global integer mean — BOTH exact bigints in q-space "
    "(emitted), CH = (B/(k-1))/(W/(n-k)) the single mirrored float "
    "division. Silhouette's O(n) sibling: no pairwise pass, so THIS "
    "is the clustering-quality number that still computes at corpus "
    "scale (one centroid join + one 64-row global mean). The oracle "
    "replays the full integer kmeans round chain plus the dispersion "
    "algebra.",
    tags=("embeddings", "curation"),
)
def emb_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import (
        _quantized,
        _update,
        kmeans_assign,
    )
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
        track_cache,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    # localCheckpoint: every SQL reference to these views would
    # otherwise REPLAY the whole kmeans round lineage (measured 10-19s
    # per gate at sf0.1 before the cut; ~2-3s after)
    lab = kmeans_assign(emb, k=8, iterations=2).localCheckpoint()
    lab.createOrReplaceTempView("lab")
    xq_arr = track_cache(_quantized(emb, "embedding", "vec_id"))
    cents = _update(xq_arr, lab).localCheckpoint()
    # unpack array frames into the (vid/cell, pos, q/cq) row contract
    xq_arr.select(
        "vid", F.posexplode("xq").alias("pos0", "q")
    ).selectExpr("vid", "pos0 + 1 AS pos", "q").createOrReplaceTempView(
        "xq"
    )
    cents.select(
        "cell", F.posexplode("cq").alias("pos0", "cq")
    ).selectExpr(
        "cell", "pos0 + 1 AS pos", "cq"
    ).createOrReplaceTempView("cents")
    out = spark.sql(
        "WITH " + _CH_TAIL_SQL.format(div="DIV").lstrip()
    )
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)


# ----------------------------------------- lead-lag regression --

# Exact sufficient statistics for the lag-1 OLS of tomorrow's series
# on today's: beta = (n'Sxy - SxSy) / (n'Sxx - Sx^2), all bigints;
# beta and r^2 are the mirrored float tail.
# tail shared with the streaming twin (plans/pipeline31.py::
# events_stream_leadlag), which substitutes a merged-partials
# `daily` head (the per-day px/er counts are SUM-mergeable)
_LL_TAIL_SQL = """
        idx AS (
          SELECT px, er,
                 CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
          FROM daily
        ),
        pairs AS (
          SELECT 'purchase->error' AS direction,
                 a.px AS x, b.er AS y
          FROM idx a JOIN idx b ON b.rn = a.rn + 1
          UNION ALL
          SELECT 'error->purchase' AS direction,
                 a.er AS x, b.px AS y
          FROM idx a JOIN idx b ON b.rn = a.rn + 1
        ),
        s AS (
          SELECT direction,
                 CAST(COUNT(*) AS BIGINT) AS np,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM pairs GROUP BY direction
        ),
        nd AS (
          SELECT direction, np, sx, sy, sxx, syy, sxy,
                 CAST(np * sxy - sx * sy AS BIGINT) AS b_num,
                 CAST(np * sxx - sx * sx AS BIGINT) AS b_den,
                 CAST(np * syy - sy * sy AS BIGINT) AS y_den
          FROM s
        )
        SELECT direction, np, sx, sy, sxx, syy, sxy, b_num, b_den,
               CASE WHEN b_den > 0
                    THEN CAST(b_num AS DOUBLE) / CAST(b_den AS DOUBLE)
               END AS beta,
               CASE WHEN b_den > 0 AND y_den > 0
                    THEN (CAST(b_num AS DOUBLE) * CAST(b_num AS DOUBLE))
                         / (CAST(b_den AS DOUBLE)
                            * CAST(y_den AS DOUBLE))
               END AS r2
        FROM nd
        ORDER BY direction
"""

_LL_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
          WHERE event_type IN ('purchase', 'error')
        ),
        days AS (SELECT DISTINCT day FROM ev),
        daily AS (
          SELECT d.day,
                 CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                   THEN 1 ELSE 0 END), 0) AS BIGINT) AS px,
                 CAST(COALESCE(SUM(CASE WHEN e.event_type = 'error'
                                   THEN 1 ELSE 0 END), 0) AS BIGINT) AS er
          FROM days d LEFT JOIN ev e ON e.day = d.day
          GROUP BY d.day
        ),"""
    + _LL_TAIL_SQL
)


@register(
    "events_leadlag_regression",
    oracle=_LL_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Lead-lag (Granger-style) screen between the purchase and error "
    "daily series: the lag-1 OLS slope of tomorrow's series on "
    "today's, BOTH directions, from exact bigint sufficient "
    "statistics (n'Sxy - SxSy over n'Sxx - Sx^2 — emitted) with "
    "beta/r^2 as the mirrored float tail and zero-variance guards. "
    "An asymmetric r^2 is the do-errors-foreshadow-revenue-drops "
    "triage every incident-review pipeline wants before investing "
    "in a full VAR model. Scale shape: one (day) rollup on a day "
    "spine, one rn+1 self-join over the 30-row series, one 2-row "
    "aggregate.",
    tags=("events", "stats"),
)
def events_leadlag_regression(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_ll")
    return spark.sql(
        _LL_SQL.format(day_expr="ts DIV 86400000000000", src="ev_ll")
    )


# ----------------------------------- Count-Sketch streaming twin --


def _csk_oracle() -> str:
    from icebergsql_spark.plans.pipeline20 import (
        _CSK_BKT_DUCK,
        _CSK_SGN_DUCK,
        _CSK_SQL,
    )

    return _CSK_SQL.format(
        tok="unnest(regexp_split_to_array(trim(text), '\\s+'))",
        bucket=_CSK_BKT_DUCK,
        signh=_CSK_SGN_DUCK,
    )


@register(
    "sketch_stream_countsketch",
    oracle=_csk_oracle(),
    doc="STREAMING twin of sketch_countsketch_median: each of 3 "
    "doc-range micro-batches appends per-batch SIGNED counter "
    "partials (r, bucket, sum of sign*count — SUM-mergeable, the "
    "linearity that makes Count-Sketch a streaming structure) plus "
    "per-batch token-count partials for the probe side; the "
    "finalizer merges both and runs the IDENTICAL probe/median tail "
    "SQL (shared _CSK_MID/_CSK_TAIL templates with the batch gate). "
    "Live unbiased heavy-hitter estimates converging to the batch "
    "answer bit-for-bit.",
    tags=("sketch", "streaming"),
)
def sketch_stream_countsketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline20 import (
        _CSK_BKT_SPARK,
        _CSK_MID_SQL,
        _CSK_SGN_SPARK,
        _CSK_TAIL_SQL,
    )
    from icebergsql_spark.plans.registry import load_tables

    docs = (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    src = tempfile.mkdtemp(prefix="icebergsql-csksrc-")
    out_tok = tempfile.mkdtemp(prefix="icebergsql-csktok-")
    out_ctr = tempfile.mkdtemp(prefix="icebergsql-cskctr-")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        chunk = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        chunk.coalesce(1).write.mode("append").parquet(src)

    bkt = _CSK_BKT_SPARK.replace("c.tok", "tok").replace("r.r", "r")
    sgn = _CSK_SGN_SPARK.replace("c.tok", "tok").replace("r.r", "r")

    def fold(batch_df, batch_id):
        c = (
            batch_df.select(
                F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        c.write.mode("append").parquet(out_tok)
        rs = batch_df.sparkSession.range(3).select(
            F.col("id").cast("int").alias("r")
        )
        (
            c.crossJoin(F.broadcast(rs))
            .select(
                "c",
                F.expr(bkt).alias("bkt"),
                F.expr(
                    f"CASE WHEN {sgn} % 2 = 0 THEN 1 ELSE -1 END"
                ).alias("sgn"),
                "r",
            )
            .groupBy("r", "bkt")
            .agg(
                F.sum(F.col("sgn") * F.col("c"))
                .cast("bigint")
                .alias("ctr")
            )
            .write.mode("append")
            .parquet(out_ctr)
        )

    run_partial_stream(spark, src, docs.schema, fold, "icebergsql-cskck-")
    spark.read.parquet(out_tok).createOrReplaceTempView("csk_tok_parts")
    spark.read.parquet(out_ctr).createOrReplaceTempView("csk_ctr_parts")
    return spark.sql(
        """
        WITH cnts AS (
          SELECT tok, CAST(SUM(c) AS BIGINT) AS cnt
          FROM csk_tok_parts GROUP BY tok
        ),
"""
        + _CSK_MID_SQL.format(
            bucket=_CSK_BKT_SPARK, signh=_CSK_SGN_SPARK
        )
        + """
        counters AS (
          SELECT r, bkt, CAST(SUM(ctr) AS BIGINT) AS ctr
          FROM csk_ctr_parts GROUP BY r, bkt
        ),
"""
        + _CSK_TAIL_SQL
    )


# ------------------------------------------- audio crest factor --

_CREST_MAX_DOC = 400
_CREST_N = 128
_CREST_AMP = 1200


def _crest_oracle() -> str:
    # even docs: full-scale square wave (crest^2 = 1 exactly); odd
    # docs: an impulse train — one +/-AMP sample every 16, the rest
    # at amplitude AMP/8 (crest^2 = peak^2 * n / energy, exact)
    samp = f"""
        WITH samp AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 CASE WHEN doc_id % 2 = 0
                      THEN CASE WHEN ((i.i // 4) % 2) = 0
                                THEN {_CREST_AMP} ELSE -{_CREST_AMP} END
                      ELSE CASE WHEN i.i % 16 = 0
                                THEN CASE WHEN ((i.i // 16) % 2) = 0
                                          THEN {_CREST_AMP}
                                          ELSE -{_CREST_AMP} END
                                ELSE {_CREST_AMP // 8} END
                 END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_CREST_N - 1}))
                      AS i) i
          WHERE doc_id < {_CREST_MAX_DOC}
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(MAX(abs(s)) AS BIGINT) AS peak,
                 CAST(SUM(s * s) AS BIGINT) AS energy,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM samp GROUP BY doc_id
        )
        SELECT CAST(doc_id % 2 AS INTEGER) AS impulse,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(peak * peak * n) AS BIGINT) AS min_c2_num,
               CAST(MAX(peak * peak * n) AS BIGINT) AS max_c2_num,
               CAST(MIN(energy) AS BIGINT) AS min_energy,
               CAST(MAX(energy) AS BIGINT) AS max_energy,
               MIN(sqrt(CAST(peak * peak * n AS DOUBLE)
                        / CAST(energy AS DOUBLE))) AS min_crest,
               MAX(sqrt(CAST(peak * peak * n AS DOUBLE)
                        / CAST(energy AS DOUBLE))) AS max_crest
        FROM per_doc
        GROUP BY 1 ORDER BY 1
    """
    return samp


@register(
    "multimodal_audio_crest",
    oracle=_crest_oracle(),
    doc="Crest factor (peak over RMS) over REAL WAV payloads — the "
    "dynamics/impulsiveness audit an audio-curation pipeline runs to "
    "separate steady program material from clicky/impulsive content: "
    "crest^2 = peak^2 * n / energy is an exact integer RATIO "
    "(numerator and denominator emitted), the crest itself one "
    "mirrored sqrt. The fixture plants full-scale square waves "
    "(crest exactly 1) against impulse trains (crest >> 1) — the "
    "two classes separate with zero tolerance. Composes the TWO "
    "existing operators (audio_stats for peak/n, audio_frame_energy "
    "at frame_len = clip length for the exact energy), proving the "
    "generic audio stats carry this audit with no new executor "
    "code. Oracle replays the planted samples.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_crest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _CREST_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    samples = [
                        _CREST_AMP if (i // 4) % 2 == 0 else -_CREST_AMP
                        for i in range(_CREST_N)
                    ]
                else:
                    samples = [
                        (
                            _CREST_AMP
                            if (i // 16) % 2 == 0
                            else -_CREST_AMP
                        )
                        if i % 16 == 0
                        else _CREST_AMP // 8
                        for i in range(_CREST_N)
                    ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    st = multimodal.audio_stats(blobs).select(
        "doc_id", "n_samples", "max_abs"
    )
    en = multimodal.audio_frame_energy(blobs, frame_len=_CREST_N).select(
        "doc_id", "energy"
    )
    st.join(en, "doc_id").createOrReplaceTempView("crest_stats")
    return spark.sql("""
        SELECT CAST(doc_id % 2 AS INT) AS impulse,
               COUNT(*) AS n_docs,
               CAST(MIN(CAST(max_abs AS BIGINT) * max_abs * n_samples)
                    AS BIGINT) AS min_c2_num,
               CAST(MAX(CAST(max_abs AS BIGINT) * max_abs * n_samples)
                    AS BIGINT) AS max_c2_num,
               CAST(MIN(energy) AS BIGINT) AS min_energy,
               CAST(MAX(energy) AS BIGINT) AS max_energy,
               MIN(sqrt(CAST(CAST(max_abs AS BIGINT) * max_abs
                             * n_samples AS DOUBLE)
                        / CAST(energy AS DOUBLE))) AS min_crest,
               MAX(sqrt(CAST(CAST(max_abs AS BIGINT) * max_abs
                             * n_samples AS DOUBLE)
                        / CAST(energy AS DOUBLE))) AS max_crest
        FROM crest_stats
        GROUP BY doc_id % 2 ORDER BY impulse
    """)
