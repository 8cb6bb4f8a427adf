"""Round-10 gate wave, PRE-AUTHORED in late round 9 (not yet imported by
``plans/__init__.load_all`` — importing it is round 10's registration
step, after the WINDOW_PRIORITY rotation the round-9 comment mandates).

Gates composed over already-tested round-9 operators (louvain_gain_round,
audio_frame_energy, image_average_hash / image_difference_hash,
decontaminate, branch-scoped rewrite_manifests, the bloom bit idiom,
$partitions) plus SQL-only additions: ROUGE overlap, Poisson rate CIs,
the CUPED streaming twin, sliding OR-merged bloom, the partition-skew
report.  Every oracle verified green at
sf0.001 + sf0.01 + sf0.1 via the driver-sim recipe with this module
imported explicitly (see CLAUDE.md round-9 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL, _token_half_edges
from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    nonempty,
    register,
    run_partial_stream,
)


# ------------------------------------------------- Louvain 2-round trace --


def _louvain_round_sql(k: int, lab: str) -> str:
    """CTE block for one synchronous Louvain round over label table
    ``lab`` (columns n, lbl) — textually the same recurrence
    operators/graph.py:louvain_gain_round runs; suffix ``k`` namespaces
    the round."""
    return f"""
        node{k} AS (
          SELECT deg.n, deg.k, {lab}.lbl AS d
          FROM deg JOIN {lab} ON {lab}.n = deg.n
        ),
        ctot{k} AS (
          SELECT d AS c, CAST(SUM(k) AS BIGINT) AS tot
          FROM node{k} GROUP BY 1
        ),
        nbrc{k} AS (
          SELECT e.a AS n, {lab}.lbl AS c, CAST(COUNT(*) AS BIGINT) AS k_ic
          FROM e JOIN {lab} ON {lab}.n = e.b GROUP BY 1, 2
        ),
        base{k} AS (
          SELECT node{k}.n, node{k}.k, node{k}.d, td.tot AS tot_d,
                 CAST(COALESCE(kid.k_ic, 0) AS BIGINT) AS k_id
          FROM node{k}
          JOIN ctot{k} td ON td.c = node{k}.d
          LEFT JOIN nbrc{k} kid
            ON kid.n = node{k}.n AND kid.c = node{k}.d
        ),
        cand{k} AS (
          SELECT base{k}.n, base{k}.d, nbrc{k}.c,
                 CAST(2 * m.m * (nbrc{k}.k_ic - base{k}.k_id)
                      - base{k}.k * (ctot{k}.tot
                                     - (base{k}.tot_d - base{k}.k))
                      AS BIGINT) AS gain_num,
                 row_number() OVER (
                   PARTITION BY base{k}.n
                   ORDER BY 2 * m.m * (nbrc{k}.k_ic - base{k}.k_id)
                            - base{k}.k * (ctot{k}.tot
                                           - (base{k}.tot_d - base{k}.k))
                            DESC, nbrc{k}.c ASC
                 ) AS rn
          FROM nbrc{k}
          JOIN base{k} ON base{k}.n = nbrc{k}.n AND nbrc{k}.c <> base{k}.d
          JOIN ctot{k} ON ctot{k}.c = nbrc{k}.c
          CROSS JOIN m
        ),
        best{k} AS (
          SELECT n, c AS move_to, gain_num FROM cand{k}
          WHERE rn = 1 AND gain_num > 0
        ),
        moved{k} AS (
          SELECT base{k}.n, base{k}.d AS lbl_old,
                 COALESCE(best{k}.move_to, base{k}.d) AS lbl_new,
                 CAST(COALESCE(best{k}.gain_num, 0) AS BIGINT) AS gain_num
          FROM base{k} LEFT JOIN best{k} ON best{k}.n = base{k}.n
        )"""


@register(
    "graph_louvain_trace",
    oracle=_EDGE_SQL + f""",
        lab1 AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        {_louvain_round_sql(1, 'lab1')},
        lab2 AS (SELECT n, lbl_new AS lbl FROM moved1),
        {_louvain_round_sql(2, 'lab2')},
        trace AS (
          SELECT 1 AS round, lbl_old, lbl_new, gain_num, n FROM moved1
          UNION ALL
          SELECT 2, lbl_old, lbl_new, gain_num, n FROM moved2
        )
        SELECT CAST(round AS INTEGER) AS round,
               CAST(lbl_old AS BIGINT) AS lbl_old,
               CAST(lbl_new AS BIGINT) AS lbl_new,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(gain_num) AS BIGINT) AS sum_gain,
               CAST(SUM(CAST('0x' || substr(md5(n), 1, 6) AS BIGINT))
                    AS BIGINT) AS node_digest
        FROM trace GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="TWO chained synchronous Louvain rounds on the token "
    "co-occurrence graph: round 2 refines the communities round 1 "
    "produced (labels relabeled between rounds — the multi-round "
    "convergence loop of real Louvain, deterministic because every "
    "round is the simultaneous-move pure function the single-round "
    "gate proves). Emits both rounds' (old, new) transition matrices "
    "with gain sums and md5 node-set digests; the oracle chains two "
    "textually identical round CTE blocks through the relabel. Scale "
    "shape: each round is the bounded-join round of "
    "graph_louvain_onelevel; the Spark side localCheckpoints between "
    "rounds so the unrolled lineage stays linear (the kcore lesson).",
    tags=("graph", "dedup", "window"),
)
def graph_louvain_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.graph import louvain_gain_round

    half = _token_half_edges(spark, sf_dir)
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    labels = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    )
    out = []
    for rnd in (1, 2):
        moved = louvain_gain_round(half, labels).localCheckpoint()
        out.append(moved.withColumn("round", F.lit(rnd)))
        labels = moved.select("n", F.col("lbl_new").alias("lbl"))
    trace = out[0].unionAll(out[1])
    return (
        trace.groupBy(
            F.col("round").cast("int").alias("round"),
            F.col("lbl_old").cast("bigint").alias("lbl_old"),
            F.col("lbl_new").cast("bigint").alias("lbl_new"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("gain_num").cast("bigint").alias("sum_gain"),
            F.sum(
                F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            ).cast("bigint").alias("node_digest"),
        )
        .orderBy("round", "lbl_old", "lbl_new")
    )


# ----------------------------------------------------------- audio SNR --


@register(
    "multimodal_audio_snr",
    oracle="""
        WITH frames AS (
          SELECT doc_id, f.f AS frame_idx,
                 CASE WHEN (doc_id + f.f) % 3 = 0
                      THEN CAST(16 AS BIGINT)
                      ELSE list_sum(list_transform(
                             generate_series(0, 15), j ->
                             CAST(((doc_id * 7 + (f.f * 16 + j) * 13)
                                   % 4096 - 2048)
                                  * ((doc_id * 7 + (f.f * 16 + j) * 13)
                                     % 4096 - 2048) AS BIGINT)))
                 END AS energy
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS f) f
          WHERE doc_id < 500
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN energy > 64 THEN energy ELSE 0 END)
                      AS BIGINT) AS act_energy,
                 CAST(SUM(CASE WHEN energy > 64 THEN 1 ELSE 0 END)
                      AS BIGINT) AS act_frames,
                 CAST(SUM(CASE WHEN energy <= 64 THEN energy ELSE 0 END)
                      AS BIGINT) AS sil_energy,
                 CAST(SUM(CASE WHEN energy <= 64 THEN 1 ELSE 0 END)
                      AS BIGINT) AS sil_frames
          FROM frames GROUP BY 1
        )
        SELECT doc_id, act_frames, sil_frames, act_energy, sil_energy,
               (CAST(act_energy AS DOUBLE) / CAST(act_frames AS DOUBLE))
                 / (CAST(sil_energy AS DOUBLE)
                    / CAST(sil_frames AS DOUBLE)) AS snr_ratio
        FROM per_doc
        WHERE act_frames > 0 AND sil_frames > 0
        ORDER BY doc_id
    """,
    doc="Per-document signal-to-noise estimate over REAL WAV payloads: "
    "the VAD fixture's silent frames carry a +/-1 noise floor "
    "(energy exactly 16/frame) while active frames follow the loud "
    "formula; frames split at energy > 64, SNR emitted as the RAW "
    "active/silent mean-energy ratio — exact int64 energy sums from "
    "decode_audio + audio_frame_energy, mirrored float divisions "
    "only (an ln() here is NOT safe: JVM Math.log and glibc log "
    "differ by 1 ulp on some inputs — measured in round 9; callers "
    "take the log downstream if they want dB). The audio-quality "
    "filter a speech-data curation pipeline thresholds on. Oracle "
    "recomputes from the sample formula (noise frames: 16 samples "
    "of amplitude 1).",
    tags=("multimodal", "curation"),
)
def multimodal_audio_snr(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 500)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = [
                    ((i % 2) * 2 - 1)
                    if (d + (i // 16)) % 3 == 0
                    else (d * 7 + i * 13) % 4096 - 2048
                    for i in range(256)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    frames = multimodal.audio_frame_energy(blobs, frame_len=16)
    per_doc = frames.groupBy("doc_id").agg(
        F.sum(F.when(F.col("energy") > 64, F.col("energy")).otherwise(0))
        .cast("bigint").alias("act_energy"),
        F.sum(F.when(F.col("energy") > 64, 1).otherwise(0))
        .cast("bigint").alias("act_frames"),
        F.sum(F.when(F.col("energy") <= 64, F.col("energy")).otherwise(0))
        .cast("bigint").alias("sil_energy"),
        F.sum(F.when(F.col("energy") <= 64, 1).otherwise(0))
        .cast("bigint").alias("sil_frames"),
    )
    return (
        per_doc.filter((F.col("act_frames") > 0) & (F.col("sil_frames") > 0))
        .select(
            "doc_id", "act_frames", "sil_frames", "act_energy",
            "sil_energy",
            F.expr(
                "(CAST(act_energy AS DOUBLE)"
                " / CAST(act_frames AS DOUBLE))"
                " / (CAST(sil_energy AS DOUBLE)"
                " / CAST(sil_frames AS DOUBLE))"
            ).alias("snr_ratio"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------- contamination by source --

_SHINGLE3_12 = (
    "list_transform(generate_series(1, greatest(len(string_split("
    "trim(text), ' ')) - 2, 1)), i -> array_to_string(string_split("
    "trim(text), ' ')[i:i+2], ' '))"
)


@register(
    "curation_contamination_by_source",
    oracle=f"""
        WITH corpus AS (
          SELECT doc_id, source, text FROM documents WHERE doc_id < 480
        ),
        bench AS (
          SELECT DISTINCT unnest(list_distinct({_SHINGLE3_12})) AS shingle
          FROM documents WHERE doc_id >= 480
        ),
        csh AS (
          SELECT doc_id, unnest(list_distinct({_SHINGLE3_12})) AS shingle
          FROM corpus
        ),
        hits AS (
          SELECT doc_id, COUNT(*) AS hit_shingles
          FROM csh WHERE shingle IN (SELECT shingle FROM bench)
          GROUP BY 1
        )
        SELECT c.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN COALESCE(h.hit_shingles, 0) > 0
                        THEN 1 ELSE 0 END) AS BIGINT) AS contaminated,
               CAST(SUM(COALESCE(h.hit_shingles, 0)) AS BIGINT)
                 AS total_hits,
               CAST((SUM(CASE WHEN COALESCE(h.hit_shingles, 0) > 0
                         THEN 1 ELSE 0 END) * 1000000)
                    // COUNT(*) AS BIGINT) AS rate_ppm
        FROM corpus c LEFT JOIN hits h USING (doc_id)
        GROUP BY c.source
        ORDER BY c.source
    """,
    doc="Benchmark-contamination rate PER SOURCE (the dashboard view of "
    "curation_decontaminate): corpus docs sharing any word 3-gram with "
    "the held-out benchmark slice, rolled up to per-source counts and "
    "exact ppm rates — the report a data-sourcing review reads before "
    "deciding which feed to quarantine. Scale shape unchanged from the "
    "operator (broadcast benchmark shingles, map-side semi-join); the "
    "rollup adds one bounded groupBy.",
    tags=("curation", "decontamination"),
)
def curation_contamination_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators import curation

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corpus = docs.filter(F.col("doc_id") < 480)
    hits = curation.decontaminate(
        corpus, docs.filter(F.col("doc_id") >= 480), n=3
    )
    return (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("hit_shingles") > 0, 1).otherwise(0))
            .cast("bigint").alias("contaminated"),
            F.sum("hit_shingles").cast("bigint").alias("total_hits"),
            F.expr(
                "CAST((SUM(CASE WHEN hit_shingles > 0 THEN 1 ELSE 0 END)"
                " * 1000000) DIV COUNT(*) AS BIGINT)"
            ).alias("rate_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------- branch-scoped rewrite --


@register(
    "managed_branch_rewrite",
    oracle="""
        WITH o AS (SELECT o_orderkey AS k,
                          CAST(round(o_totalprice * 100) AS BIGINT) AS c
                   FROM orders)
        SELECT scope, n, total FROM (
          SELECT 'branch' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 4 IN (0, 1, 2)
          UNION ALL
          SELECT 'main' AS scope,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS DOUBLE) / 100.0 AS total
          FROM o WHERE k % 4 = 0
        ) ORDER BY scope
    """,
    doc="Branch-scoped rewrite_manifests (round-7 seed, table.py:"
    "rewrite_manifests(branch=...)): a staging branch accretes 2 "
    "commits of its own (one manifest each), the branch-scoped rewrite "
    "consolidates the branch HEAD's manifest list as a metadata-only "
    "snapshot and advances ONLY the branch ref — in-DAG asserts: main "
    "pointer + main manifest count untouched, branch manifest count "
    "dropped to 1, branch data identical through the rewrite, branch "
    "lineage gains exactly one 'replace' snapshot. The maintenance "
    "shape for long-lived audit branches whose planning would "
    "otherwise read one manifest per staged commit. Result: main + "
    "branch scan aggregates vs raw orders.",
    tags=("managed", "maintenance", "branches"),
)
def managed_branch_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    src = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        (F.col("o_orderkey") % 4).cast("int").alias("m"),
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-brrw-"))
    tbl = eng.catalog.create_table(
        "ord_brrw", "k bigint, c bigint, m int", ["m"]
    )
    tbl.insert(nonempty(src.filter(F.col("m") == 0)))
    tbl.create_branch("staging")
    tbl.insert(nonempty(src.filter(F.col("m") == 1)), branch="staging")
    tbl.insert(nonempty(src.filter(F.col("m") == 2)), branch="staging")
    mark_setup_done()  # branch history built; the scoped rewrite is the op
    main_head = tbl.meta.current_snapshot_id
    main_manifests = len(tbl.meta.current_snapshot().manifest_paths)
    branch_head = tbl.meta.refs["staging"]["snapshot_id"]
    b_before = len(
        tbl.meta.snapshot_by_id(branch_head).manifest_paths
    )
    assert b_before == 3, b_before  # fork + 2 staged commits
    res = tbl.rewrite_manifests(branch="staging")
    assert res["rewritten_manifests"] == 3 and res["added_manifests"] == 1
    tbl.refresh()
    assert tbl.meta.current_snapshot_id == main_head, "main moved"
    assert (
        len(tbl.meta.current_snapshot().manifest_paths) == main_manifests
    )
    new_head = tbl.meta.snapshot_by_id(tbl.meta.refs["staging"]["snapshot_id"])
    assert new_head.snapshot_id != branch_head
    assert new_head.operation == "replace"
    assert new_head.parent_id == branch_head
    assert len(new_head.manifest_paths) == 1

    def agg(df, scope):
        return df.agg(
            F.lit(scope).alias("scope"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.sum("c").cast("double") / 100.0).alias("total"),
        )

    return (
        agg(tbl.to_df(ref="staging"), "branch")
        .unionAll(agg(tbl.to_df(), "main"))
        .orderBy("scope")
    )


# ---------------------------------------------------- ROUGE overlap --


@register(
    "text_rouge_overlap",
    oracle="""
        WITH pairs AS (
          SELECT doc_id AS ref_id, doc_id + 1 AS cand_id
          FROM documents WHERE doc_id % 2 = 0 AND doc_id < 200
        ),
        uni AS (
          SELECT doc_id,
                 list_distinct(string_split(trim(text), ' ')) AS u
          FROM documents WHERE doc_id <= 200
        ),
        bi AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(string_split(
                     trim(text), ' ')) - 1, 1)),
                   i -> array_to_string(string_split(
                     trim(text), ' ')[i:i+1], ' '))) AS b
          FROM documents WHERE doc_id <= 200
        ),
        r1 AS (
          SELECT p.ref_id, p.cand_id,
                 CAST(len(list_intersect(ur.u, uc.u)) AS BIGINT) AS o1,
                 CAST(len(ur.u) AS BIGINT) AS n1
          FROM pairs p
          JOIN uni ur ON ur.doc_id = p.ref_id
          JOIN uni uc ON uc.doc_id = p.cand_id
        ),
        r2 AS (
          SELECT p.ref_id,
                 CAST(len(list_intersect(br.b, bc.b)) AS BIGINT) AS o2,
                 CAST(len(br.b) AS BIGINT) AS n2
          FROM pairs p
          JOIN bi br ON br.doc_id = p.ref_id
          JOIN bi bc ON bc.doc_id = p.cand_id
        )
        SELECT r1.ref_id, r1.cand_id, r1.o1, r1.n1, r2.o2, r2.n2,
               CAST(r1.o1 AS DOUBLE) / CAST(r1.n1 AS DOUBLE) AS rouge1,
               CAST(r2.o2 AS DOUBLE) / CAST(r2.n2 AS DOUBLE) AS rouge2
        FROM r1 JOIN r2 ON r2.ref_id = r1.ref_id
        ORDER BY r1.ref_id
    """,
    doc="ROUGE-1/ROUGE-2 recall between paired documents (even doc -> "
    "its successor; distinct-n-gram overlap over reference size — the "
    "summarization/grounding eval primitive run at corpus scale when "
    "scoring model outputs against references): exact integer overlap "
    "and size counts with two mirrored final divisions. ROUGE-2 here "
    "uses distinct word bigrams built with the engine-parity slice "
    "idiom. Scale shape: per-doc distinct n-gram arrays, one "
    "pair-keyed equi-join — never a token-level shuffle.",
    tags=("text", "agg"),
)
def text_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql("""
        WITH pairs AS (
          SELECT doc_id AS ref_id, doc_id + 1 AS cand_id
          FROM documents WHERE doc_id % 2 = 0 AND doc_id < 200
        ),
        uni AS (
          SELECT doc_id,
                 array_distinct(split(trim(text), ' ')) AS u
          FROM documents WHERE doc_id <= 200
        ),
        bi AS (
          SELECT doc_id,
                 array_distinct(transform(
                   sequence(1, greatest(size(split(trim(text), ' '))
                                        - 1, 1)),
                   i -> array_join(slice(split(trim(text), ' '), i, 2),
                                   ' '))) AS b
          FROM documents WHERE doc_id <= 200
        ),
        r1 AS (
          SELECT p.ref_id, p.cand_id,
                 CAST(size(array_intersect(ur.u, uc.u)) AS BIGINT) AS o1,
                 CAST(size(ur.u) AS BIGINT) AS n1
          FROM pairs p
          JOIN uni ur ON ur.doc_id = p.ref_id
          JOIN uni uc ON uc.doc_id = p.cand_id
        ),
        r2 AS (
          SELECT p.ref_id,
                 CAST(size(array_intersect(br.b, bc.b)) AS BIGINT) AS o2,
                 CAST(size(br.b) AS BIGINT) AS n2
          FROM pairs p
          JOIN bi br ON br.doc_id = p.ref_id
          JOIN bi bc ON bc.doc_id = p.cand_id
        )
        SELECT r1.ref_id, r1.cand_id, r1.o1, r1.n1, r2.o2, r2.n2,
               CAST(r1.o1 AS DOUBLE) / CAST(r1.n1 AS DOUBLE) AS rouge1,
               CAST(r2.o2 AS DOUBLE) / CAST(r2.n2 AS DOUBLE) AS rouge2
        FROM r1 JOIN r2 ON r2.ref_id = r1.ref_id
        ORDER BY r1.ref_id
    """)


# ---------------------------------------------- Poisson rate CIs --


@register(
    "events_poisson_rate_ci",
    oracle="""
        WITH ev AS (
          SELECT event_type, epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        span AS (
          SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS days FROM ev
        ),
        cnt AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev
          GROUP BY 1
        )
        SELECT cnt.event_type, cnt.n, span.days,
               CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE) AS rate,
               (CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE))
                 - 1.96 * sqrt(CAST(cnt.n AS DOUBLE))
                   / CAST(span.days AS DOUBLE) AS ci_lo,
               (CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE))
                 + 1.96 * sqrt(CAST(cnt.n AS DOUBLE))
                   / CAST(span.days AS DOUBLE) AS ci_hi
        FROM cnt CROSS JOIN span
        ORDER BY cnt.event_type
    """,
    doc="Per-event-type Poisson rate with a normal-approximation 95% CI "
    "(rate = n/days, half-width 1.96*sqrt(n)/days — the count-metric "
    "uncertainty readout monitoring dashboards band their charts "
    "with): exact bigint counts and day span, three textually "
    "mirrored float expressions (sqrt is bit-identical). Scale shape: "
    "one groupBy + a broadcast 1-row span.",
    tags=("events", "stats"),
)
def events_poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_poisson")
    return spark.sql("""
        WITH ev AS (
          SELECT event_type, ts DIV 86400000000000 AS day FROM ev_poisson
        ),
        span AS (
          SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS days FROM ev
        ),
        cnt AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev
          GROUP BY 1
        )
        SELECT cnt.event_type, cnt.n, span.days,
               CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE) AS rate,
               (CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE))
                 - 1.96 * sqrt(CAST(cnt.n AS DOUBLE))
                   / CAST(span.days AS DOUBLE) AS ci_lo,
               (CAST(cnt.n AS DOUBLE) / CAST(span.days AS DOUBLE))
                 + 1.96 * sqrt(CAST(cnt.n AS DOUBLE))
                   / CAST(span.days AS DOUBLE) AS ci_hi
        FROM cnt CROSS JOIN span
        ORDER BY cnt.event_type
    """)


# ------------------------------------------ aHash near-dup pairs --


@register(
    "dedup_ahash_hamming_pairs",
    oracle="""
        WITH px AS (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 16) * 37 + i.i * 11) % 256 AS v,
                 ((i.i // 3) // 16) // 2 * 8 + ((i.i // 3) % 16) // 2
                   AS cell
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < 1000
        ),
        cells AS (
          SELECT doc_id, cell, CAST(SUM(v) AS BIGINT) AS cs
          FROM px GROUP BY 1, 2
        ),
        tot AS (
          SELECT doc_id, CAST(SUM(cs) AS BIGINT) AS t
          FROM cells GROUP BY 1
        ),
        bits AS (
          SELECT c.doc_id, c.cell,
                 CASE WHEN c.cs * 64 > tot.t THEN 1 ELSE 0 END AS bit
          FROM cells c JOIN tot ON tot.doc_id = c.doc_id
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN cell // 16 = 0
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b0,
                 CAST(SUM(CASE WHEN cell // 16 = 1
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b1,
                 CAST(SUM(CASE WHEN cell // 16 = 2
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b2,
                 CAST(SUM(CASE WHEN cell // 16 = 3
                          THEN bit << (cell % 16) ELSE 0 END) AS BIGINT)
                   AS b3
          FROM bits GROUP BY doc_id
        ),
        classes AS (
          SELECT b0, b1, b2, b3, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hashes GROUP BY 1, 2, 3, 4
        ),
        cand AS (
          SELECT DISTINCT x.rep AS rep_a, y.rep AS rep_b
          FROM classes x JOIN classes y ON x.rep < y.rep
          WHERE x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3
        ),
        scored AS (
          SELECT c.rep_a, c.rep_b,
                 CAST(bit_count(CAST(xor(a.b0, b.b0) AS BIGINT))
                      + bit_count(CAST(xor(a.b1, b.b1) AS BIGINT))
                      + bit_count(CAST(xor(a.b2, b.b2) AS BIGINT))
                      + bit_count(CAST(xor(a.b3, b.b3) AS BIGINT))
                      AS INTEGER) AS hamming,
                 a.n_docs * b.n_docs AS n_pairs
          FROM cand c
          JOIN classes a ON a.rep = c.rep_a
          JOIN classes b ON b.rep = c.rep_b
        )
        SELECT rep_a, rep_b, hamming, CAST(n_pairs AS BIGINT) AS n_pairs
        FROM scored WHERE hamming <= 8
        ORDER BY hamming, rep_a, rep_b
    """,
    doc="Image near-duplicate candidate pairs from aHash BANDING: the 16 "
    "planted image classes hash to 12 distinct aHashes; classes "
    "sharing ANY 16-bit band are candidates (4-band pigeonhole — "
    "every pair with hamming <= 3 is guaranteed caught, wider ones "
    "best-effort, the dedup_simhash_hamming_pairs contract applied "
    "to images), exact Hamming distance via per-band XOR popcounts, "
    "pairs kept at hamming <= 8 with the exact cross-class pair "
    "count. Candidates come from band equi-joins over the CLASS "
    "table (distinct hashes), never doc x doc. Oracle recomputes "
    "hashes from the pixel formula and mirrors the banding.",
    tags=("multimodal", "dedup"),
)
def dedup_ahash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 1000)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 256 for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    classes = (
        multimodal.image_average_hash(blobs, grid=8)
        .groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep"),
        )
        .localCheckpoint()
    )
    x, y = classes.alias("x"), classes.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.rep") < F.col("y.rep"))
            & (
                (F.col("x.b0") == F.col("y.b0"))
                | (F.col("x.b1") == F.col("y.b1"))
                | (F.col("x.b2") == F.col("y.b2"))
                | (F.col("x.b3") == F.col("y.b3"))
            ),
        )
        .select(
            F.col("x.rep").alias("rep_a"),
            F.col("y.rep").alias("rep_b"),
            (
                F.bit_count(F.col("x.b0").bitwiseXOR(F.col("y.b0")))
                + F.bit_count(F.col("x.b1").bitwiseXOR(F.col("y.b1")))
                + F.bit_count(F.col("x.b2").bitwiseXOR(F.col("y.b2")))
                + F.bit_count(F.col("x.b3").bitwiseXOR(F.col("y.b3")))
            ).cast("int").alias("hamming"),
            (F.col("x.n_docs") * F.col("y.n_docs"))
            .cast("bigint")
            .alias("n_pairs"),
        )
        .distinct()
    )
    return (
        cand.filter(F.col("hamming") <= 8)
        .orderBy("hamming", "rep_a", "rep_b")
    )


# --------------------------------------------- streaming CUPED twin --


@register(
    "events_stream_cuped",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(SUM(CASE WHEN ev.day < d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN ev.day >= d0.d0 + 14
                               AND ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_mean
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """,
    doc="STREAMING twin of events_cuped_adjustment: each of 3 "
    "chronological micro-batches appends per-user (x_partial, "
    "y_partial) purchase-count partials (each event lands in exactly "
    "one batch, so the per-user sums are SUM-mergeable — replay/"
    "chopping safe by algebra; the pre/post boundary day is fixed "
    "up-front like every stream gate's day offsets); the finalizer "
    "merges partials per user and computes the identical pooled-"
    "theta CUPED readout — the LIVE experiment dashboard shape, "
    "converging to the batch oracle bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-cupsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-cupout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                "user_id",
                F.expr("ts DIV 86400000000000").alias("day"),
                "event_type",
            )
            .groupBy("user_id")
            .agg(
                F.sum(
                    F.when(
                        (F.col("day") < d0 + 14)
                        & (F.col("event_type") == "purchase"),
                        1,
                    ).otherwise(0)
                ).cast("bigint").alias("x"),
                F.sum(
                    F.when(
                        (F.col("day") >= d0 + 14)
                        & (F.col("event_type") == "purchase"),
                        1,
                    ).otherwise(0)
                ).cast("bigint").alias("y"),
            )
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-cupck-")
    (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.sum("x").cast("bigint").alias("x"),
            F.sum("y").cast("bigint").alias("y"),
        )
        .createOrReplaceTempView("cuped_partials")
    )
    return spark.sql("""
        WITH per_user AS (
          SELECT user_id, CAST(user_id % 2 AS INT) AS arm, x, y
          FROM cuped_partials
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_mean
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """)


# ---------------------------------------------------- sliding bloom --


def _bloom_probe_keys_sql() -> str:
    """3 most + 3 least active users globally, total-ordered."""
    return """
        ucnt AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ev GROUP BY 1
        ),
        probes AS (
          SELECT user_id FROM (
            SELECT user_id, row_number() OVER
              (ORDER BY cnt DESC, user_id) AS r1,
              row_number() OVER (ORDER BY cnt ASC, user_id) AS r2
            FROM ucnt
          ) x WHERE r1 <= 3 OR r2 <= 3
        )"""


@register(
    "sketch_bloom_sliding",
    oracle=f"""
        WITH ev AS (
          SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        {_bloom_probe_keys_sql()},
        du AS (SELECT DISTINCT day, user_id FROM ev),
        bpos AS (
          SELECT day,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                     1 + 3 * j.j, 3) AS BIGINT) AS p
          FROM du CROSS JOIN
               (SELECT unnest(generate_series(0, 2)) AS j) j
        ),
        daily AS (
          SELECT day, p // 32 AS word_idx,
                 BIT_OR(CAST(1 AS BIGINT)
                        << CAST(p % 32 AS INTEGER)) AS bits
          FROM bpos GROUP BY 1, 2
        ),
        days AS (SELECT DISTINCT day AS wday FROM daily),
        win AS (
          SELECT d2.wday, daily.word_idx, BIT_OR(daily.bits) AS bits
          FROM daily JOIN days d2
            ON d2.wday BETWEEN daily.day AND daily.day + 6
          GROUP BY 1, 2
        ),
        ppos AS (
          SELECT user_id,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                     1 + 3 * j.j, 3) AS BIGINT) AS p
          FROM probes CROSS JOIN
               (SELECT unnest(generate_series(0, 2)) AS j) j
        ),
        hits AS (
          SELECT win.wday, ppos.user_id,
                 SUM(CASE WHEN win2.bits
                          & (CAST(1 AS BIGINT)
                             << CAST(ppos.p % 32 AS INTEGER))
                          = (CAST(1 AS BIGINT)
                             << CAST(ppos.p % 32 AS INTEGER))
                     THEN 1 ELSE 0 END) AS n_hit
          FROM (SELECT DISTINCT wday FROM win) win
          CROSS JOIN ppos
          LEFT JOIN win win2
            ON win2.wday = win.wday AND win2.word_idx = ppos.p // 32
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT d2.wday, du.user_id
          FROM du JOIN days d2
            ON d2.wday BETWEEN du.day AND du.day + 6
          GROUP BY 1, 2
        )
        SELECT h.wday, h.user_id,
               CAST(CASE WHEN h.n_hit = 3 THEN 1 ELSE 0 END AS INTEGER)
                 AS bloom_hit,
               CAST(CASE WHEN e.user_id IS NULL THEN 0 ELSE 1 END
                    AS INTEGER) AS exact_present
        FROM hits h
        LEFT JOIN exact e
          ON e.wday = h.wday AND e.user_id = h.user_id
        ORDER BY h.wday, h.user_id
    """,
    doc="7-day sliding Bloom membership from OR-merged per-day bitmaps — "
    "the third mergeable-through-time sketch twin (HLL merges by MAX, "
    "CMS by SUM, Bloom by OR): per-day 4096-bit/3-hash bitmaps fan out "
    "to the windows they feed and OR into a window filter; the 3 most "
    "and 3 least active users are probed per window with the exact "
    "windowed presence alongside (hit >= present is the structural "
    "guarantee; md5-derived bits make even the false positives "
    "hash-checkable). Scale shape: window state is <=128 bitmap words "
    "per day regardless of user cardinality; probes are a broadcast "
    "join.",
    tags=("sketch", "bloom", "window", "streaming"),
)
def sketch_bloom_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("user_id", F.expr("ts DIV 86400000000000").alias("day"))
    ucnt = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    du = ev.distinct()
    return _bloom_sliding_result(_bloom_daily_bits(du), du, ucnt)


def _bloom_pos(col):
    """The 3 md5-derived 12-bit bloom positions of a user id."""
    return [
        F.conv(
            F.substring(F.md5(col.cast("string")), 1 + 3 * j, 3),
            16, 10,
        ).cast("bigint").alias(f"p{j}")
        for j in range(3)
    ]


def _bloom_daily_bits(du: DataFrame) -> DataFrame:
    """Per-day bloom bitmap words from distinct (day, user) rows —
    (day, word_idx, bits); OR-mergeable across any partitioning of the
    input (the property the streaming twin exercises)."""
    bpos = du.select(
        "day",
        F.explode(F.array(*_bloom_pos(F.col("user_id")))).alias("p"),
    )
    return bpos.select(
        "day",
        F.expr("p DIV 32").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").alias(
            "m"
        ),
    ).groupBy("day", "word_idx").agg(F.bit_or("m").alias("bits"))


def _bloom_sliding_result(
    daily: DataFrame, du: DataFrame, ucnt: DataFrame
) -> DataFrame:
    """Shared window/probe tail of the sliding-bloom gates: OR the
    per-day bitmaps into 7-day windows, probe the 3 most / 3 least
    active users, and ride the exact windowed presence alongside.
    ``daily`` is the (day, word_idx, bits) relation (however it was
    accumulated), ``du`` the distinct (day, user) set for the exact
    column, ``ucnt`` the per-user activity counts for probe choice."""
    from pyspark.sql import Window as W

    def pos(col):
        return _bloom_pos(col)

    probes = (
        ucnt.withColumn(
            "r1", F.row_number().over(W.orderBy(F.desc("cnt"), "user_id"))
        )
        .withColumn(
            "r2", F.row_number().over(W.orderBy(F.asc("cnt"), "user_id"))
        )
        .filter((F.col("r1") <= 3) | (F.col("r2") <= 3))
        .select("user_id")
        .localCheckpoint()
    )
    days = daily.select(F.col("day").alias("wday")).distinct()
    win = (
        daily.select(
            "day", "word_idx", "bits",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        )
        .select((F.col("day") + F.col("off")).alias("wday"), "word_idx",
                "bits")
        .join(days, "wday")
        .groupBy("wday", "word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    ppos = probes.select(
        "user_id",
        F.explode(F.array(*pos(F.col("user_id")))).alias("p"),
    )
    w2 = win.select(
        F.col("wday").alias("wwday"),
        F.col("word_idx").alias("widx"),
        F.col("bits").alias("wbits"),
    )
    hits = (
        win.select("wday").distinct()
        .crossJoin(F.broadcast(ppos))
        .join(
            w2,
            (F.col("wday") == F.col("wwday"))
            & (F.expr("p DIV 32") == F.col("widx")),
            "left",
        )
        .groupBy("wday", "user_id")
        .agg(
            F.sum(
                F.when(
                    F.expr(
                        "wbits & shiftleft(CAST(1 AS BIGINT),"
                        " CAST(p % 32 AS INT))"
                        " = shiftleft(CAST(1 AS BIGINT),"
                        " CAST(p % 32 AS INT))"
                    ),
                    1,
                ).otherwise(0)
            ).alias("n_hit")
        )
    )
    exact = (
        du.select(
            "user_id", "day",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        )
        .select((F.col("day") + F.col("off")).alias("wday"), "user_id")
        .join(days, "wday")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    return (
        hits.join(exact, ["wday", "user_id"], "left")
        .select(
            F.col("wday").cast("bigint").alias("wday"),
            "user_id",
            F.when(F.col("n_hit") == 3, 1).otherwise(0)
            .cast("int").alias("bloom_hit"),
            F.coalesce(F.col("present"), F.lit(0))
            .cast("int").alias("exact_present"),
        )
        .orderBy("wday", "user_id")
    )


# ---------------------------------------------- partitions skew report --


@register(
    "managed_partitions_skew",
    oracle="""
        WITH cnt AS (
          SELECT o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders WHERE o_orderkey % 3 != 2 GROUP BY 1
        ),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS n_parts,
                 CAST(MAX(n) AS BIGINT) AS max_n
          FROM cnt
        )
        SELECT cnt.pri, cnt.n AS record_count,
               CAST((tot.max_n * tot.n_parts * 1000000) // tot.t
                    AS BIGINT) AS skew_ppm
        FROM cnt CROSS JOIN tot
        ORDER BY cnt.pri
    """,
    doc="Partition-skew report straight from the `$partitions` metadata "
    "view (table.py:partitions_df — per-partition totals aggregated "
    "from manifests, zero data IO): a priority-partitioned managed "
    "table's per-partition record counts plus the skew ratio "
    "max/mean in exact ppm (max_n * n_parts * 1e6 // total) — the "
    "number a repartition/salting decision reads before a big join. "
    "The metadata view's counts are oracled against the raw data "
    "(two appends so manifests span commits), proving $partitions "
    "aggregates the LIVE file set correctly across manifest reuse.",
    tags=("managed", "metadata", "stats"),
)
def managed_partitions_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    src = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderpriority").alias("pri"),
        (F.col("o_orderkey") % 3).cast("int").alias("m"),
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-pskew-"))
    tbl = eng.catalog.create_table(
        "ord_skew", "k bigint, c bigint, pri string", ["pri"]
    )
    tbl.insert(nonempty(src.filter(F.col("m") == 0).drop("m")))
    tbl.insert(nonempty(src.filter(F.col("m") == 1).drop("m")))
    mark_setup_done()  # two appends in; the metadata read is the op
    parts = eng.sql(
        "SELECT get_json_object(partition, '$.pri') AS pri, "
        "record_count FROM `ord_skew$partitions`"
    )
    return spark.sql(
        """
        WITH cnt AS (SELECT pri, CAST(SUM(record_count) AS BIGINT) AS n
                     FROM {parts} GROUP BY pri),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS n_parts,
                 CAST(MAX(n) AS BIGINT) AS max_n
          FROM cnt
        )
        SELECT cnt.pri, cnt.n AS record_count,
               CAST((tot.max_n * tot.n_parts * 1000000) DIV tot.t
                    AS BIGINT) AS skew_ppm
        FROM cnt CROSS JOIN tot
        ORDER BY cnt.pri
        """,
        parts=parts,
    )


# ---------------------------------------------------- image dHash --


@register(
    "multimodal_image_dhash",
    oracle="""
        WITH px AS (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 16) * 37 + i.i * 11) % 256 AS v,
                 ((i.i // 3) // 16) // 2 AS gr,
                 (((i.i // 3) % 16) // 2) AS gc
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < 1000
        ),
        cells AS (
          SELECT doc_id, gr, gc, CAST(SUM(v) AS BIGINT) AS cs
          FROM px GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT a.doc_id, a.gr * 7 + a.gc AS k,
                 CASE WHEN b.cs > a.cs THEN 1 ELSE 0 END AS bit
          FROM cells a
          JOIN cells b ON b.doc_id = a.doc_id AND b.gr = a.gr
                      AND b.gc = a.gc + 1
          WHERE a.gc < 7
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k // 14 = 0
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b0,
                 CAST(SUM(CASE WHEN k // 14 = 1
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b1,
                 CAST(SUM(CASE WHEN k // 14 = 2
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b2,
                 CAST(SUM(CASE WHEN k // 14 = 3
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b3,
                 CAST(SUM(bit) AS INTEGER) AS popcount
          FROM bits GROUP BY doc_id
        )
        SELECT b0, b1, b2, b3, CAST(MAX(popcount) AS INTEGER) AS popcount,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM hashes
        GROUP BY b0, b1, b2, b3
        ORDER BY b0, b1, b2, b3
    """,
    doc="Perceptual difference-hash (dHash) image dedup — "
    "image_average_hash's gradient sibling (operators/multimodal.py:"
    "image_difference_hash): bit (r, c) set iff the integer-grayscale "
    "cell to the RIGHT is brighter, so the fingerprint tracks "
    "horizontal luminance gradients and survives global brightness "
    "shifts that flip aHash bits; 56 bits as four 14-bit bands for "
    "band-equi-join candidate generation. Same planted 16-class "
    "fixture as the aHash gates; the oracle recomputes the gradient "
    "matrix straight from the pixel formula via a cell self-join.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 1000)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 256 for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    hashes = multimodal.image_difference_hash(blobs, grid=8)
    return (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.max("popcount").cast("int").alias("popcount"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("b0", "b1", "b2", "b3")
    )


# ------------------------------------------ image dedup tier eval --


@register(
    "dedup_image_tier_eval",
    oracle="""
        WITH px AS (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 16) * 37 + i.i * 11) % 256 AS v,
                 ((i.i // 3) // 16) // 2 AS gr,
                 (((i.i // 3) % 16) // 2) AS gc
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < 1000
        ),
        cells AS (
          SELECT doc_id, gr, gc, CAST(SUM(v) AS BIGINT) AS cs
          FROM px GROUP BY 1, 2, 3
        ),
        bits AS (
          SELECT a.doc_id, a.gr * 7 + a.gc AS k,
                 CASE WHEN b.cs > a.cs THEN 1 ELSE 0 END AS bit
          FROM cells a
          JOIN cells b ON b.doc_id = a.doc_id AND b.gr = a.gr
                      AND b.gc = a.gc + 1
          WHERE a.gc < 7
        ),
        hashes AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN k // 14 = 0
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b0,
                 CAST(SUM(CASE WHEN k // 14 = 1
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b1,
                 CAST(SUM(CASE WHEN k // 14 = 2
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b2,
                 CAST(SUM(CASE WHEN k // 14 = 3
                          THEN bit << (k % 14) ELSE 0 END) AS BIGINT) AS b3
          FROM bits GROUP BY doc_id
        ),
        tagged AS (
          SELECT doc_id, doc_id % 16 AS cls, b0, b1, b2, b3 FROM hashes
        ),
        pairs AS (
          SELECT x.doc_id AS da, y.doc_id AS db,
                 CASE WHEN x.cls = y.cls THEN 1 ELSE 0 END AS is_dup,
                 CASE WHEN x.b0 = y.b0 OR x.b1 = y.b1
                        OR x.b2 = y.b2 OR x.b3 = y.b3
                      THEN 1 ELSE 0 END AS is_cand
          FROM tagged x JOIN tagged y ON x.doc_id < y.doc_id
        ),
        conf AS (
          SELECT CAST(SUM(is_dup * is_cand) AS BIGINT) AS tp,
                 CAST(SUM((1 - is_dup) * is_cand) AS BIGINT) AS fp,
                 CAST(SUM(is_dup * (1 - is_cand)) AS BIGINT) AS fn,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM pairs
        )
        SELECT tp, fp, fn, n_pairs,
               CAST((tp * 1000000) // (tp + fp) AS BIGINT)
                 AS precision_ppm,
               CAST((tp * 1000000) // (tp + fn) AS BIGINT)
                 AS recall_ppm
        FROM conf
    """,
    doc="Candidate-tier evaluation for IMAGE near-dup detection (the "
    "dedup_tier_eval pattern applied to perceptual hashing): ground "
    "truth = the planted pixel-identity classes (doc_id % 16), "
    "candidate tier = any shared 14-bit dHash band; exact-integer "
    "TP/FP/FN over all doc pairs with precision/recall in ppm — the "
    "measurement that decides band width before scaling an image-"
    "dedup pass to a billion images. The pair enumeration here is "
    "bounded for audit (1000 docs); the production tier generates "
    "candidates from the band equi-join only.",
    tags=("multimodal", "dedup", "stats"),
)
def dedup_image_tier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 1000)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 256 for i in range(768)
                )
                payloads.append(
                    multimodal.encode_ppm(16, 16, rgb)
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, rgb)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    tagged = (
        multimodal.image_difference_hash(blobs, grid=8)
        .select(
            "doc_id", (F.col("doc_id") % 16).alias("cls"),
            "b0", "b1", "b2", "b3",
        )
        .localCheckpoint()
    )
    x, y = tagged.alias("x"), tagged.alias("y")
    pairs = x.join(y, F.col("x.doc_id") < F.col("y.doc_id")).select(
        F.when(F.col("x.cls") == F.col("y.cls"), 1).otherwise(0)
        .alias("is_dup"),
        F.when(
            (F.col("x.b0") == F.col("y.b0"))
            | (F.col("x.b1") == F.col("y.b1"))
            | (F.col("x.b2") == F.col("y.b2"))
            | (F.col("x.b3") == F.col("y.b3")),
            1,
        ).otherwise(0).alias("is_cand"),
    )
    return pairs.agg(
        F.sum(F.expr("is_dup * is_cand")).cast("bigint").alias("tp"),
        F.sum(F.expr("(1 - is_dup) * is_cand")).cast("bigint").alias("fp"),
        F.sum(F.expr("is_dup * (1 - is_cand)")).cast("bigint").alias("fn"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    ).select(
        "tp", "fp", "fn", "n_pairs",
        F.expr("CAST((tp * 1000000) DIV (tp + fp) AS BIGINT)").alias(
            "precision_ppm"
        ),
        F.expr("CAST((tp * 1000000) DIV (tp + fn) AS BIGINT)").alias(
            "recall_ppm"
        ),
    )


# ------------------------------------------ streaming add_files --


@register(
    "managed_stream_add_files",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Streaming zero-copy ingestion: each of 3 micro-batches is "
    "written partition-aligned to its own landing dir and REGISTERED "
    "into the managed table via add_files — metadata-cost-only "
    "streaming ingestion (the landing write is the producer's; the "
    "table never copies). In-DAG asserts: exactly 3 import snapshots "
    "each tagged added-files-by-import, every live path is a landing "
    "path outside the table tree, and the manifest COUNT(*) answers "
    "without IO. The continuous-migrate shape: a feed drops parquet, "
    "the table tracks it at O(metadata). Composes round-9 add_files "
    "with the stream-batch commit pattern; oracle = raw orders "
    "rollup.",
    tags=("managed", "streaming", "import"),
)
def managed_stream_add_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        F.col("o_orderstatus").alias("st"),
        (F.col("o_orderkey") % 3).cast("int").alias("m"),
    )
    src = tempfile.mkdtemp(prefix="icebergsql-saddsrc-")
    for i in range(3):
        base.filter(F.col("m") == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-saddwh-"))
    tbl = eng.catalog.create_table(
        "ord_sadd", "k bigint, c bigint, st string, m int", ["st"]
    )
    land_root = tempfile.mkdtemp(prefix="icebergsql-saddland-")
    mark_setup_done()  # source staged; the streamed imports are the op

    def land(batch_df, batch_id):
        import os

        landing = os.path.join(land_root, f"batch-{batch_id}")
        # the producer writes partition-aligned files (one per status);
        # the table only ever registers them
        for row in batch_df.select("st").distinct().collect():
            batch_df.filter(F.col("st") == row["st"]).coalesce(1).write.mode(
                "append"
            ).parquet(landing)
        tbl.add_files(landing)

    q = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="icebergsql-saddck-"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    tbl.refresh()
    imports = [
        s
        for s in tbl.meta.snapshots
        if "added-files-by-import" in s.summary
    ]
    assert len(imports) == 3, f"expected 3 import commits, got {len(imports)}"
    live = tbl.meta.current_snapshot().live_files()
    assert all(f.path.startswith(land_root) for f in live), (
        "streamed import must never copy into the table tree"
    )
    assert tbl.scan().count_from_stats() == orders.count()
    return eng.sql(
        "SELECT st AS o_orderstatus, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM ord_sadd GROUP BY st ORDER BY st"
    )


# ------------------------------------------------- binary CUPED --


@register(
    "events_cuped_binary",
    oracle="""
        WITH ev AS (
          SELECT user_id, event_type,
                 epoch_ns(ts) // 86400000000000 AS day
          FROM events
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN ev.day < d0.d0 + 14
                                    AND ev.event_type = 'error'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS x,
                 CAST(CASE WHEN SUM(CASE WHEN ev.day >= d0.d0 + 14
                                    AND ev.event_type = 'error'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_rate
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """,
    doc="CUPED on a BINARY metric (regression-adjusted proportions, the "
    "Deng et al. extension experimentation platforms run for "
    "conversion/error rates): x = had an error in the pre-period, "
    "y = had one post (0/1 via MAX), theta from the same pooled exact "
    "bigint sufficient stats — for binaries sxx = sx, and the "
    "adjusted rate stays a plain mirrored float expression. "
    "Complements events_cuped_adjustment's count metric; the indicator "
    "is >= 5 pre/post errors (the round-6 lesson squared: EVERY user "
    "errors at least once at every SF, so a did-it-once flag is "
    "all-ones and var(x) = 0 — ANSI mode then throws on the theta "
    "division; a count threshold keeps incidence at 60-80%).",
    tags=("events", "stats", "curation"),
)
def events_cuped_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cupedb")
    return spark.sql("""
        WITH ev AS (
          SELECT user_id, event_type, ts DIV 86400000000000 AS day
          FROM ev_cupedb
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        per_user AS (
          SELECT ev.user_id,
                 CAST(ev.user_id % 2 AS INT) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN ev.day < d0.d0 + 14
                                    AND ev.event_type = 'error'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS x,
                 CAST(CASE WHEN SUM(CASE WHEN ev.day >= d0.d0 + 14
                                    AND ev.event_type = 'error'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS y
          FROM ev CROSS JOIN d0
          GROUP BY ev.user_id
        ),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per_user
        ),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g
          FROM per_user GROUP BY arm
        )
        SELECT a.arm, a.n_g, a.sx_g, a.sy_g,
               CAST(p.n * p.sxy - p.sx * p.sy AS BIGINT) AS cov_num,
               CAST(p.n * p.sxx - p.sx * p.sx AS BIGINT) AS var_num,
               (CAST(a.sy_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                 - (CAST(p.n * p.sxy - p.sx * p.sy AS DOUBLE)
                    / CAST(p.n * p.sxx - p.sx * p.sx AS DOUBLE))
                   * ((CAST(a.sx_g AS DOUBLE) / CAST(a.n_g AS DOUBLE))
                      - (CAST(p.sx AS DOUBLE) / CAST(p.n AS DOUBLE)))
                 AS cuped_adjusted_rate
        FROM arms a CROSS JOIN pooled p
        ORDER BY a.arm
    """)


# ------------------------------------------------ sequential A/B --

# O'Brien-Fleming-style critical values for 3 equally-spaced looks at
# overall alpha 0.05 (Pocock/OBF tables) — literals shared by both sides
_OBF_CRITS = (3.471, 2.454, 2.004)

_SEQ_AB_SQL = """
        WITH ev AS (
          SELECT user_id, event_type,
                 {day_expr} AS day
          FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        pu AS (
          SELECT looks.k, ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN ev.day < d0.d0 + 7 * looks.k
                                    AND ev.event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          GROUP BY looks.k, ev.user_id
        ),
        arms AS (
          SELECT k, arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM pu GROUP BY 1, 2
        ),
        wide AS (
          SELECT k,
                 MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 0 THEN c END) AS c0,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 1 THEN c END) AS c1
          FROM arms GROUP BY k
        ),
        z AS (
          SELECT k, n0, c0, n1, c1,
                 CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1
                      THEN CAST(0.0 AS DOUBLE)
                      ELSE (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                            - CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                           / sqrt((CAST(c0 + c1 AS DOUBLE)
                                   / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 - CAST(c0 + c1 AS DOUBLE)
                                         / CAST(n0 + n1 AS DOUBLE))
                                  * (1.0 / CAST(n0 AS DOUBLE)
                                     + 1.0 / CAST(n1 AS DOUBLE)))
                 END AS z
          FROM wide
        )
        SELECT CAST(k AS INTEGER) AS look, n0, c0, n1, c1, z,
               CASE k WHEN 1 THEN {c1} WHEN 2 THEN {c2}
                      ELSE {c3} END AS crit,
               CAST(CASE WHEN abs(z) > (CASE k WHEN 1 THEN {c1}
                                        WHEN 2 THEN {c2}
                                        ELSE {c3} END)
                    THEN 1 ELSE 0 END AS INTEGER) AS reject
        FROM z ORDER BY look
"""


@register(
    "events_sequential_ab",
    oracle=_SEQ_AB_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        c1=_OBF_CRITS[0], c2=_OBF_CRITS[1], c3=_OBF_CRITS[2],
    ),
    doc="Group-sequential A/B test with O'Brien-Fleming-style spending "
    "(3 equally-spaced looks at weeks 1/2/3, critical values 3.471/"
    "2.454/2.004 for overall alpha 0.05): at each look, the cumulative "
    "conversion z-statistic (>= 5 purchases to date — the round-6 "
    "non-degeneracy rule cumulatively; the zero/full-conversion guard "
    "keeps ANSI division defined at tiny SFs) against that look's "
    "boundary — the peeking-safe experiment readout every platform "
    "implements on top of the plain z-test. Exact bigint counts, one "
    "mirrored float z expression per look. Scale shape: one per-"
    "(look, user) aggregate + a 6-row arm rollup.",
    tags=("events", "stats", "curation"),
)
def events_sequential_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_seqab")
    return spark.sql(
        _SEQ_AB_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_seqab",
            unnest_looks="explode(sequence(1, 3))",
            c1=_OBF_CRITS[0], c2=_OBF_CRITS[1], c3=_OBF_CRITS[2],
        )
    )


# ------------------------------------------- tokenizer fertility --

_SUBWORD_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "text_tokenizer_fertility",
    oracle=f"""
        WITH t AS (
          SELECT source,
                 CAST(len(string_split(trim(lower(text)), ' '))
                      AS BIGINT) AS words,
                 CAST(len(regexp_extract_all(trim(lower(text)),
                                             '{_SUBWORD_RE}'))
                      AS BIGINT) AS subwords
          FROM documents
        )
        SELECT source,
               CAST(SUM(words) AS BIGINT) AS words,
               CAST(SUM(subwords) AS BIGINT) AS subwords,
               CAST((SUM(subwords) * 1000000) // SUM(words) AS BIGINT)
                 AS fertility_ppm
        FROM t GROUP BY source ORDER BY source
    """,
    doc="Tokenizer fertility per source (subword tokens per whitespace "
    "word — THE tokenizer-evaluation metric for multilingual/"
    "domain-shift corpora; high fertility = the tokenizer fragments "
    "this source, inflating training cost): subword count via a "
    "GPT-2-ish pre-tokenizer split (letter runs | digit runs | single "
    "punctuation — the regex is engine-portable: no \\s class, whose "
    "vertical-tab membership differs between Java regex and RE2), "
    "exact bigint counts, ppm ratio via non-negative floor division. "
    "Scale shape: one narrow map + a per-source aggregate.",
    tags=("text", "curation", "agg"),
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    t = docs.select(
        "source",
        F.size(F.split(F.trim(F.lower(F.col("text"))), " "))
        .cast("bigint").alias("words"),
        F.size(
            F.expr(
                f"regexp_extract_all(trim(lower(text)), '{_SUBWORD_RE}', 0)"
            )
        ).cast("bigint").alias("subwords"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.sum("words").cast("bigint").alias("words"),
            F.sum("subwords").cast("bigint").alias("subwords"),
            F.expr(
                "CAST((SUM(subwords) * 1000000) DIV SUM(words) AS BIGINT)"
            ).alias("fertility_ppm"),
        )
        .orderBy("source")
    )


# ------------------------------------------- per-source ROUGE --


@register(
    "text_rouge_by_source",
    oracle="""
        WITH pairs AS (
          SELECT doc_id AS ref_id, doc_id + 1 AS cand_id
          FROM documents WHERE doc_id % 2 = 0 AND doc_id < 400
        ),
        uni AS (
          SELECT doc_id, source,
                 list_distinct(string_split(trim(text), ' ')) AS u
          FROM documents WHERE doc_id <= 400
        ),
        r1 AS (
          SELECT ur.source,
                 CAST(len(list_intersect(ur.u, uc.u)) AS BIGINT) AS o1,
                 CAST(len(ur.u) AS BIGINT) AS n1
          FROM pairs p
          JOIN uni ur ON ur.doc_id = p.ref_id
          JOIN uni uc ON uc.doc_id = p.cand_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(o1) AS BIGINT) AS overlap_sum,
               CAST(SUM(n1) AS BIGINT) AS ref_sum,
               CAST((SUM(o1) * 1000000) // SUM(n1) AS BIGINT)
                 AS micro_rouge1_ppm
        FROM r1 GROUP BY source ORDER BY source
    """,
    doc="Micro-averaged ROUGE-1 recall rolled up per reference SOURCE "
    "(the eval dashboard view of text_rouge_overlap: which feed's "
    "references are best covered by their paired candidates): exact "
    "overlap/size sums per source with one ppm floor division — "
    "micro averaging (sum of overlaps over sum of sizes) rather than "
    "a float mean-of-ratios, so the whole rollup stays integer-exact. "
    "Scale shape unchanged: per-doc distinct-unigram arrays, one "
    "pair-keyed equi-join, a per-source aggregate.",
    tags=("text", "agg", "curation"),
)
def text_rouge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql("""
        WITH pairs AS (
          SELECT doc_id AS ref_id, doc_id + 1 AS cand_id
          FROM documents WHERE doc_id % 2 = 0 AND doc_id < 400
        ),
        uni AS (
          SELECT doc_id, source,
                 array_distinct(split(trim(text), ' ')) AS u
          FROM documents WHERE doc_id <= 400
        ),
        r1 AS (
          SELECT ur.source,
                 CAST(size(array_intersect(ur.u, uc.u)) AS BIGINT) AS o1,
                 CAST(size(ur.u) AS BIGINT) AS n1
          FROM pairs p
          JOIN uni ur ON ur.doc_id = p.ref_id
          JOIN uni uc ON uc.doc_id = p.cand_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(o1) AS BIGINT) AS overlap_sum,
               CAST(SUM(n1) AS BIGINT) AS ref_sum,
               CAST((SUM(o1) * 1000000) DIV SUM(n1) AS BIGINT)
                 AS micro_rouge1_ppm
        FROM r1 GROUP BY source ORDER BY source
    """)
