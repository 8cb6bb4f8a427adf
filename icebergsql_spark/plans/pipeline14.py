"""Round-11 gate wave (staged late in round 10): composed seeds from
CLAUDE.md — Mann-Kendall trend, audio clipping audit, RAKE-fingerprint
containment dedup, HLL Jaccard error sweep, CREATE TABLE LIKE / shallow
clone, expire-safety lineage audit, weighted Louvain convergence,
per-stratum sequential A/B, dihedral-canonical pHash, streaming
Bayesian A/B, k-center coverage eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    load_tables,
    nonempty,
    register,
    run_partial_stream,
)


# --------------------------------------------- Mann-Kendall trend --

# tail shared with the streaming twin: everything downstream of the
# ``daily`` (day, x) relation is identical batch vs merged-sink
_MK_TAIL = """
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        s AS (
          SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                               WHEN b.x < a.x THEN -1
                               ELSE 0 END) AS BIGINT) AS s_stat
          FROM daily a JOIN daily b ON a.day < b.day
        ),
        ties AS (
          SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                      AS BIGINT) AS tie_term
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY x
          ) g
        ),
        z AS (
          SELECT n.n AS n_days, s.s_stat,
                 CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term
                      AS BIGINT) AS var_num18,
                 CASE
                   WHEN s.s_stat > 0 THEN
                     CAST(s.s_stat - 1 AS DOUBLE)
                     / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                                 - ties.tie_term AS DOUBLE) / 18.0)
                   WHEN s.s_stat < 0 THEN
                     CAST(s.s_stat + 1 AS DOUBLE)
                     / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5)
                                 - ties.tie_term AS DOUBLE) / 18.0)
                   ELSE CAST(0.0 AS DOUBLE)
                 END AS z
          FROM n CROSS JOIN s CROSS JOIN ties
        )
        SELECT n_days, s_stat, var_num18, z,
               CAST(CASE WHEN z > 1.96 THEN 1
                         WHEN z < -1.96 THEN -1
                         ELSE 0 END AS INTEGER) AS trend
        FROM z
"""

_MANN_KENDALL_SQL = (
    """
        WITH ev AS (
          SELECT {day_expr} AS day, event_type FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev WHERE event_type = 'purchase' GROUP BY day
        ),
"""
    + _MK_TAIL
)


@register(
    "events_mann_kendall_trend",
    oracle=_MANN_KENDALL_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Mann-Kendall non-parametric trend test over daily purchase "
    "counts (Mann 1945 / Kendall 1975 — the monotone-trend detector "
    "that needs no distributional assumption, the standard pre-check "
    "before fitting any forecast): S = sum over day pairs of "
    "sign(x_j - x_i), tie-corrected variance "
    "n(n-1)(2n+5) - sum_t t(t-1)(2t+5) (both exact bigints, emitted "
    "as the 18-scaled numerator), continuity-corrected "
    "z = (S -/+ 1)/sqrt(Var) as ONE mirrored float expression, flag "
    "at +/-1.96. Scale shape: the pair join runs over the DAILY "
    "rollup (days^2 metadata rows), never event volume.",
    tags=("events", "stats"),
)
def events_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_mk")
    return spark.sql(
        _MANN_KENDALL_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_mk"
        )
    )


# ------------------------------------------------ audio clipping --

_CLIP_CEIL = 2047


@register(
    "multimodal_audio_clipping",
    oracle=f"""
        WITH raw AS (
          SELECT doc_id, i.i AS i,
                 ((doc_id * 11 + i.i * 17) % 8192) - 4096 AS r
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS i) i
          WHERE doc_id < 500
        ),
        samp AS (
          SELECT doc_id,
                 CASE WHEN r > {_CLIP_CEIL} THEN {_CLIP_CEIL}
                      WHEN r < {-_CLIP_CEIL - 1} THEN {-_CLIP_CEIL - 1}
                      ELSE r END AS s
          FROM raw
        )
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_samples,
               CAST(SUM(CASE WHEN s >= {_CLIP_CEIL}
                             OR s <= {-_CLIP_CEIL - 1}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
               CAST((SUM(CASE WHEN s >= {_CLIP_CEIL}
                              OR s <= {-_CLIP_CEIL - 1}
                         THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
                    AS BIGINT) AS clip_ppm,
               CAST(MAX(abs(s)) AS INTEGER) AS max_abs,
               CAST(SUM(abs(s)) AS BIGINT) AS abs_sum
        FROM samp GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Audio clipping audit over REAL WAV payloads "
    "(operators/multimodal.py:audio_clipping): the fixture generates "
    "samples on a +/-4096 ramp and clamps them to the +/-2048 rail "
    "before encoding (so roughly half of every doc's samples are "
    "rail-pinned), the operator decodes via the RIFF chunk walker and "
    "counts samples at the rail (s >= 2047 or s <= -2048) — the "
    "unrecoverable-distortion gate a speech-curation pipeline runs "
    "before paying for transcription. All columns exact integers "
    "(clip_ppm by non-negative floor division); the oracle replays "
    "the clamp formula relationally. Arrow-batched narrow map, no "
    "shuffle.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_clipping(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                    max(
                        -_CLIP_CEIL - 1,
                        min(_CLIP_CEIL, (d * 11 + i * 17) % 8192 - 4096),
                    )
                    for i in range(256)
                ]
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    return multimodal.audio_clipping(blobs, ceiling=_CLIP_CEIL).orderBy(
        "doc_id"
    )


# ------------------------------------- RAKE-fingerprint containment --

_RAKE_CONT_BODY = """
        seg AS (
          SELECT doc_id, pos, w,
                 SUM(CASE WHEN w IN {stop} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS seg_id
          FROM tok
        ),
        cw AS (
          SELECT doc_id, seg_id, pos, w FROM seg WHERE w NOT IN {stop}
        ),
        fp AS (
          SELECT DISTINCT x.doc_id,
                 {hash48} AS fp
          FROM cw x
          JOIN cw y ON y.doc_id = x.doc_id AND y.seg_id = x.seg_id
                    AND y.pos = x.pos + 1
        ),
        pc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS pc
          FROM fp GROUP BY doc_id
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM fp x JOIN fp y ON y.fp = x.fp AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ),
        cont AS (
          SELECT pairs.a, pairs.b, pairs.shared,
                 CAST((pairs.shared * 1000000)
                      {div} LEAST(pa.pc, pb.pc) AS BIGINT) AS cont_ppm
          FROM pairs
          JOIN pc pa ON pa.doc_id = pairs.a
          JOIN pc pb ON pb.doc_id = pairs.b
        )
        SELECT CAST(cont_ppm {div} 100000 AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(shared) AS BIGINT) AS shared_sum,
               CAST(MAX(cont_ppm) AS BIGINT) AS max_cont_ppm
        FROM cont GROUP BY 1 ORDER BY 1
"""


def _rake_cont_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _RAKE_STOP

    return (
        """
        WITH base AS (
          SELECT doc_id, string_split(trim(lower(text)), ' ') AS l
          FROM documents WHERE doc_id < 1000
        ),
        tok0 AS (
          SELECT doc_id,
                 unnest(generate_series(1, len(l))) AS pos, l
          FROM base
        ),
        tok AS (SELECT doc_id, pos, l[pos] AS w FROM tok0),
    """
        + _RAKE_CONT_BODY.format(
            stop=_RAKE_STOP,
            hash48="CAST('0x' || substr(md5(x.w || ' ' || y.w), 1, 12)"
            " AS BIGINT)",
            div="//",
        )
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "dedup_rake_containment",
    oracle=_rake_cont_oracle(),
    doc="RAKE-fingerprint containment dedup: candidate phrases are the "
    "stopword-free token runs RAKE extracts (the text_rake_keyphrases "
    "segmentation), each phrase contributes its internal word BIGRAMS "
    "as 48-bit md5 fingerprints (stopword-crossing bigrams never "
    "fingerprint — they carry no topical signal), and doc-pair "
    "containment = |shared fps| / |smaller fp set| in exact ppm. "
    "Emitted as the containment-decile histogram (pair lists are "
    "unbounded output; the histogram is the calibration artifact that "
    "picks the production threshold — the dedup_minhash_calibration "
    "shape). Audit-scale doc cap 1000; production candidates come "
    "from the fingerprint equi-join exactly as here, never doc x doc. "
    "md5/substr are bit-identical across engines (the minhash "
    "contract); floor division on non-negative operands.",
    tags=("text", "dedup"),
)
def dedup_rake_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.pipeline13 import _RAKE_STOP

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"].filter(
            F.col("doc_id") < 1000
        )
    )
    docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias(
            "pos", "w"
        ),
    ).createOrReplaceTempView("rakec_tok")
    return spark.sql(
        "WITH tok AS (SELECT doc_id, pos, w FROM rakec_tok), "
        + _RAKE_CONT_BODY.format(
            stop=_RAKE_STOP,
            hash48="CAST(conv(substring(md5(x.w || ' ' || y.w), 1, 12), "
            "16, 10) AS BIGINT)",
            div="DIV",
        )
    )


# ------------------------------------------ HLL Jaccard error sweep --

_HLL_SWEEPS = (
    (1, "user_id % 12 < 6", "user_id % 12 < 6"),
    (2, "user_id % 12 < 6", "user_id % 12 >= 3 AND user_id % 12 < 9"),
    (3, "user_id % 12 < 6", "user_id % 12 >= 5 AND user_id % 12 < 11"),
    (4, "user_id % 12 < 6", "user_id % 12 >= 6"),
)


def _hll_sweep_oracle() -> str:
    from icebergsql_spark.operators import sketch
    from icebergsql_spark.plans.pipeline9 import _hll_reg_cte

    est = (
        f"CASE WHEN ({sketch._RAW_EST_SQL}) <= {2.5 * sketch.HLL_M} "
        f"AND m_used < {sketch.HLL_M} "
        f"THEN {sketch.HLL_M} * ln(CAST({sketch.HLL_M} AS DOUBLE) "
        f"/ ({sketch.HLL_M} - m_used)) "
        f"ELSE ({sketch._RAW_EST_SQL}) END"
    )

    def agg(src: str, tag: str, s: int) -> str:
        return f"""
        est_{tag}{s} AS (
          SELECT m_used AS m_used_{tag}, harmonic_q AS harmonic_q_{tag},
                 CAST(round({est}) AS BIGINT) AS est_{tag}
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS m_used,
                   CAST(SUM(CAST(1 AS BIGINT) << (49 - max_rho)) AS BIGINT)
                     AS harmonic_q
            FROM {src}
          )
        )"""

    blocks, rows = [], []
    for s, pa, pb in _HLL_SWEEPS:
        blocks.append(f"a{s} AS ({_hll_reg_cte(pa)})")
        blocks.append(f"b{s} AS ({_hll_reg_cte(pb)})")
        blocks.append(f"""
        u{s} AS (
          SELECT COALESCE(a{s}.reg, b{s}.reg) AS reg,
                 CAST(greatest(COALESCE(a{s}.max_rho, 0),
                               COALESCE(b{s}.max_rho, 0)) AS INTEGER)
                   AS max_rho
          FROM a{s} FULL OUTER JOIN b{s} ON a{s}.reg = b{s}.reg
        )""")
        blocks.append(agg(f"a{s}", "a", s))
        blocks.append(agg(f"b{s}", "b", s))
        blocks.append(agg(f"u{s}", "u", s))
        blocks.append(f"""
        exact{s} AS (
          SELECT
            (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
             WHERE ({pa}) AND ({pb})) AS exact_inter,
            (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
             WHERE ({pa}) OR ({pb})) AS exact_union
        )""")
        rows.append(f"""
          SELECT {s} AS sweep, ea.*, eb.*, eu.*,
                 CAST(ea.est_a + eb.est_b - eu.est_u AS BIGINT)
                   AS est_intersection,
                 ex.exact_inter, ex.exact_union
          FROM est_a{s} ea CROSS JOIN est_b{s} eb
          CROSS JOIN est_u{s} eu CROSS JOIN exact{s} ex""")
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
        SELECT CAST(sweep AS INTEGER) AS sweep,
               m_used_a, harmonic_q_a, est_a,
               m_used_b, harmonic_q_b, est_b,
               m_used_u, harmonic_q_u, est_u,
               est_intersection, exact_inter, exact_union,
               CAST((exact_inter * 1000000) // exact_union AS BIGINT)
                 AS jaccard_ppm,
               CAST(est_intersection - exact_inter AS BIGINT) AS err
        FROM ({" UNION ALL ".join(rows)})
        ORDER BY sweep
    """
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "sketch_hll_jaccard_sweep",
    oracle=_hll_sweep_oracle(),
    doc="HLL intersection ERROR-vs-Jaccard sweep "
    "(sketch_hll_intersection run across four overlap settings of "
    "user_id % 12 residue bands: Jaccard 1, 1/3, 1/11, 0): each row "
    "carries both sketches' exact register anchors (m_used, "
    "harmonic_q — bigints), the three estimates, the "
    "inclusion-exclusion intersection, the exact intersection/union, "
    "the exact Jaccard in ppm and the signed estimation error — the "
    "calibration table that tells an engine WHEN the "
    "inclusion-exclusion trick is usable (error blows up as Jaccard "
    "shrinks, the documented HLL-intersection failure mode). Scale "
    "shape: every sweep is two O(m)-state partial aggregates plus a "
    "256-row merge; exact columns are one distinct-aggregate pass "
    "each, audit-only at production scale.",
    tags=("sketch", "agg", "stats"),
)
def sketch_hll_jaccard_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from icebergsql_spark.operators import sketch

    ev = load_tables(spark, sf_dir, ("events",))["events"].select("user_id")
    parts = []
    for s, pa, pb in _HLL_SWEEPS:
        res = sketch.hll_intersection(
            ev.filter(F.expr(pa)), ev.filter(F.expr(pb)), "user_id"
        )
        exact = ev.agg(
            F.countDistinct(
                F.when(F.expr(f"({pa}) AND ({pb})"), F.col("user_id"))
            ).cast("bigint").alias("exact_inter"),
            F.countDistinct(
                F.when(F.expr(f"({pa}) OR ({pb})"), F.col("user_id"))
            ).cast("bigint").alias("exact_union"),
        )
        parts.append(
            res.crossJoin(exact).select(
                F.lit(s).cast("int").alias("sweep"), "*"
            )
        )
    return (
        reduce(lambda x, y: x.unionAll(y), parts)
        .select(
            "sweep",
            "m_used_a", "harmonic_q_a", "est_a",
            "m_used_b", "harmonic_q_b", "est_b",
            "m_used_u", "harmonic_q_u", "est_u",
            "est_intersection", "exact_inter", "exact_union",
            F.expr(
                "CAST((exact_inter * 1000000) DIV exact_union AS BIGINT)"
            ).alias("jaccard_ppm"),
            F.expr(
                "CAST(est_intersection - exact_inter AS BIGINT)"
            ).alias("err"),
        )
        .orderBy("sweep")
    )


# --------------------------------------------- shallow clone gate --


@register(
    "managed_clone_table",
    oracle="""
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="CREATE TABLE LIKE / shallow clone end-to-end "
    "(sql.py:_create_like): orders lands in a partitioned source "
    "table over two commits, `CREATE TABLE ord_cln LIKE ord_csrc "
    "WITH DATA` forks it as a METADATA-ONLY clone — the clone's first "
    "snapshot references the SAME physical files via add_files (zero "
    "copy, asserted by path identity), partition spec and properties "
    "are carried over, and metadata COUNT(*) answers from the cloned "
    "manifests. Post-fork the tables evolve independently: an insert "
    "into the SOURCE leaves the clone's count untouched (asserted "
    "in-DAG). Result: the per-year rollup THROUGH the clone's read "
    "path vs the raw-orders oracle. The Delta-style shallow-clone "
    "hazard (source GC can strand the clone) is enforced at clone "
    "time for MoR debris and documented for expire.",
    tags=("managed", "import", "lineage"),
)
def managed_clone_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-clonewh-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    src = eng.catalog.create_table(
        "ord_csrc", ddl, ["o_year"],
        properties={"bloom.filter.columns": "o_orderkey"},
    )
    src.insert(nonempty(orders.filter(F.col("o_orderkey") % 2 == 0)))
    src.insert(nonempty(orders.filter(F.col("o_orderkey") % 2 == 1)))
    n_orders = orders.count()
    mark_setup_done()  # source built; the metadata-only clone is the op
    res = eng.sql("CREATE TABLE ord_cln LIKE ord_csrc WITH DATA").collect()[
        0
    ]
    cln = eng.catalog.load_table("ord_cln")
    src_live = {f.path for f in src.meta.current_snapshot().live_files()}
    cln_live = {f.path for f in cln.meta.current_snapshot().live_files()}
    assert res["added_files_count"] == len(src_live)
    assert cln_live == src_live, "shallow clone must reference, not copy"
    assert cln.meta.partition_cols == ["o_year"]
    assert (
        cln.meta.properties.get("bloom.filter.columns") == "o_orderkey"
    )
    assert cln.scan().count_from_stats() == n_orders
    # divergence: the source moves on, the clone must not see it
    extra = nonempty(
        orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 100000000
        )
    )
    src.insert(extra)
    cln.refresh()
    assert cln.scan().count_from_stats() == n_orders
    assert src.scan().count_from_stats() > n_orders
    return eng.sql(
        "SELECT o_year, COUNT(*) AS n, "
        "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
        " / 100.0 AS total "
        "FROM ord_cln GROUP BY o_year ORDER BY o_year"
    )


# ------------------------------------- expire-safety lineage audit --


@register(
    "managed_expire_safety_audit",
    oracle="""
        WITH c AS (
          SELECT CAST(o_orderkey % 6 AS INTEGER) AS m,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY 1
        ),
        tot AS (
          SELECT
            (SELECT SUM(n) FROM c WHERE m IN (0, 1, 2, 3)) AS dev_n,
            (SELECT SUM(n) FROM c WHERE m IN (0, 1, 4, 5)) AS main_n
        )
        SELECT 'dev' AS ref_name, 2 AS ancestors_retained,
               CAST(dev_n AS BIGINT) AS total_records FROM tot
        UNION ALL
        SELECT 'main', 1, CAST(main_n AS BIGINT) FROM tot
        ORDER BY ref_name
    """,
    doc="Expire-safety audit through the `$lineage` closure: main and a "
    "dev branch (min_snapshots_to_keep=2) diverge, expire_snapshots("
    "retain_last=1) ages out the unreferenced main mid-history AND the "
    "branch's pre-fork ancestry — but the branch head stays fully "
    "READABLE because GC is reference-counting over RETAINED "
    "manifests, never snapshot-local: files committed before the fork "
    "are still referenced by the branch head's manifests and survive "
    "(every retained snapshot's live file asserted present on disk, "
    "both heads' real read counts asserted). The emitted rows are the "
    "post-expire audit an operator runs: per ref, the ancestor count "
    "still resolvable through `$lineage` and the head's total_records "
    "from `$history` — all bounded metadata.",
    tags=("managed", "metadata", "lineage"),
)
def managed_expire_safety_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        (F.col("o_orderkey") % 6).cast("int").alias("m"),
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-expaud-"))
    tbl = eng.catalog.create_table("ord_exps", "k bigint, c bigint, m int",
                                   ["m"])
    s1 = tbl.insert(nonempty(base.filter(F.col("m") == 0)))
    s2 = tbl.insert(nonempty(base.filter(F.col("m") == 1)))
    tbl.create_branch("dev", s2.snapshot_id, min_snapshots_to_keep=2)
    s3 = tbl.insert(nonempty(base.filter(F.col("m") == 2)), branch="dev")
    s4 = tbl.insert(nonempty(base.filter(F.col("m") == 3)), branch="dev")
    s5 = tbl.insert(nonempty(base.filter(F.col("m") == 4)))
    s6 = tbl.insert(nonempty(base.filter(F.col("m") == 5)))
    mark_setup_done()  # divergent history built; expire + audit is the op
    res = tbl.expire_snapshots(retain_last=1)
    tbl.refresh()
    ids = {s.snapshot_id for s in tbl.meta.snapshots}
    assert ids == {s3.snapshot_id, s4.snapshot_id, s6.snapshot_id}, (
        sorted(ids)
    )
    assert res["expired_snapshots"] == 3
    # the safety property: GC never touched a file any RETAINED
    # snapshot references — pre-fork files survive via the branch
    # head's manifests even though their snapshots are gone
    for s in tbl.meta.snapshots:
        for f in s.live_files():
            assert os.path.exists(f.path), f"GC dropped live {f.path}"
    n_dev = base.filter(F.col("m") < 4).count()
    n_main = base.filter(F.col("m").isin(0, 1, 4, 5)).count()
    assert (
        tbl.scan(snapshot_id=s4.snapshot_id).dataframe().count() == n_dev
    )
    assert tbl.scan().dataframe().count() == n_main
    return eng.sql("""
        WITH devh AS (
          SELECT snapshotId AS sid FROM `ord_exps$refs` WHERE name = 'dev'
        ),
        devanc AS (
          SELECT CAST(COUNT(*) AS INT) AS anc
          FROM `ord_exps$lineage` l JOIN devh ON devh.sid = l.snapshot_id
        ),
        mainanc AS (
          SELECT CAST(COUNT(*) AS INT) AS anc
          FROM `ord_exps$lineage` WHERE is_current
        ),
        mainh AS (
          SELECT ancestor_id FROM `ord_exps$lineage`
          WHERE is_current AND depth = 0
        )
        SELECT 'dev' AS ref_name, devanc.anc AS ancestors_retained,
               hd.total_records
        FROM devanc
        JOIN devh ON 1 = 1
        JOIN `ord_exps$history` hd ON hd.snapshot_id = devh.sid
        UNION ALL
        SELECT 'main', mainanc.anc, hm.total_records
        FROM mainanc
        JOIN mainh ON 1 = 1
        JOIN `ord_exps$history` hm ON hm.snapshot_id = mainh.ancestor_id
        ORDER BY ref_name
    """)


# ----------------------------------- weighted Louvain convergence --


def _wround_sql(k: int, lab: str) -> str:
    """CTE block for one synchronous WEIGHTED Louvain round over label
    table ``lab`` (columns n, lbl), given fixed wsym/wself/wdeg/wm CTEs
    — textually the recurrence operators/graph.py:
    louvain_gain_round_weighted runs; suffix ``k`` namespaces the
    round."""
    gain = (
        f"2 * wm.m * (wnbrc{k}.k_ic - wbase{k}.k_id) "
        f"- wbase{k}.k * (wctot{k}.tot - (wbase{k}.tot_d - wbase{k}.k))"
    )
    return f"""
        wctot{k} AS (
          SELECT {lab}.lbl AS c, CAST(SUM(wdeg.k) AS BIGINT) AS tot
          FROM wdeg JOIN {lab} ON {lab}.n = wdeg.src GROUP BY 1
        ),
        wnbrc{k} AS (
          SELECT s.src, {lab}.lbl AS c, CAST(SUM(s.w) AS BIGINT) AS k_ic
          FROM wsym s JOIN {lab} ON {lab}.n = s.dst GROUP BY 1, 2
        ),
        wbase{k} AS (
          SELECT wdeg.src AS n, wdeg.k, {lab}.lbl AS d, td.tot AS tot_d,
                 CAST(COALESCE(kid.k_ic, 0) AS BIGINT) AS k_id
          FROM wdeg
          JOIN {lab} ON {lab}.n = wdeg.src
          JOIN wctot{k} td ON td.c = {lab}.lbl
          LEFT JOIN wnbrc{k} kid
            ON kid.src = wdeg.src AND kid.c = {lab}.lbl
        ),
        wcand{k} AS (
          SELECT wbase{k}.n, wbase{k}.d, wnbrc{k}.c,
                 CAST({gain} AS BIGINT) AS gain_num,
                 row_number() OVER (
                   PARTITION BY wbase{k}.n
                   ORDER BY {gain} DESC, wnbrc{k}.c ASC
                 ) AS rn
          FROM wnbrc{k}
          JOIN wbase{k}
            ON wbase{k}.n = wnbrc{k}.src AND wnbrc{k}.c <> wbase{k}.d
          JOIN wctot{k} ON wctot{k}.c = wnbrc{k}.c
          CROSS JOIN wm
        ),
        wbest{k} AS (
          SELECT n, c AS move_to, gain_num FROM wcand{k}
          WHERE rn = 1 AND gain_num > 0
        ),
        wmoved{k} AS (
          SELECT wbase{k}.n, wbase{k}.d AS lbl_old,
                 COALESCE(wbest{k}.move_to, wbase{k}.d) AS lbl_new,
                 CAST(COALESCE(wbest{k}.gain_num, 0) AS BIGINT) AS gain_num
          FROM wbase{k} LEFT JOIN wbest{k} ON wbest{k}.n = wbase{k}.n
        )"""


def _louvain_wconverge_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    return (
        _EDGE_SQL
        + f""",
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
        super AS (
          SELECT LEAST(la.lbl, lb.lbl) AS ca,
                 GREATEST(la.lbl, lb.lbl) AS cb,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b
          GROUP BY 1, 2
        ),
        wself AS (SELECT ca AS nn, w FROM super WHERE ca = cb),
        wplain AS (SELECT ca, cb, w FROM super WHERE ca <> cb),
        wsym AS (
          SELECT ca AS src, cb AS dst, w FROM wplain
          UNION ALL SELECT cb, ca, w FROM wplain
        ),
        wdeg AS (
          SELECT src, CAST(SUM(wt) AS BIGINT) AS k
          FROM (
            SELECT src, w AS wt FROM wsym
            UNION ALL SELECT nn AS src, 2 * w AS wt FROM wself
          ) x GROUP BY 1
        ),
        wm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM super),
        wlab1 AS (SELECT src AS n, src AS lbl FROM wdeg),
        {_wround_sql(1, 'wlab1')},
        wlab2 AS (SELECT n, lbl_new AS lbl FROM wmoved1),
        {_wround_sql(2, 'wlab2')},
        wlab3 AS (SELECT n, lbl_new AS lbl FROM wmoved2),
        {_wround_sql(3, 'wlab3')},
        movers AS (
          SELECT
            (SELECT COUNT(*) FROM wmoved1 WHERE lbl_new <> lbl_old) AS m1,
            (SELECT COUNT(*) FROM wmoved2 WHERE lbl_new <> lbl_old) AS m2
        ),
        rounds AS (
          SELECT CAST(CASE WHEN m1 = 0 THEN 1
                           WHEN m2 = 0 THEN 2
                           ELSE 3 END AS INTEGER) AS rounds_run
          FROM movers
        ),
        sizes AS (
          SELECT lbl AS c, CAST(COUNT(*) AS BIGINT) AS members FROM lab2
          GROUP BY 1
        )
        SELECT CAST(wmoved3.n AS BIGINT) AS community,
               CAST(wmoved3.lbl_new AS BIGINT) AS lbl_final,
               rounds.rounds_run,
               wdeg.k AS weighted_degree,
               sizes.members
        FROM wmoved3
        JOIN wdeg ON wdeg.src = wmoved3.n
        JOIN sizes ON sizes.c = wmoved3.n
        CROSS JOIN rounds
        ORDER BY community
    """
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "graph_louvain_weighted_converge",
    oracle=_louvain_wconverge_oracle(),
    doc="Multi-level Louvain with the level-2 loop run to CONVERGENCE "
    "(operators/graph.py:louvain_converge_weighted): level-1 "
    "synchronous round -> community coarsening -> weighted gain "
    "rounds on the super-graph chained until no super-node moves, "
    "bounded at 3 (synchronous moves can oscillate — the "
    "louvain_converge rule). A converged round is idempotent, so the "
    "oracle's FIXED 3-round weighted CTE chain reproduces both the "
    "final labels and rounds_run (min k with zero movers, else the "
    "bound) without knowing the stop point. Emits each super-node's "
    "converged community, the executed round count, weighted degree "
    "(self-loops contribute 2w) and level-1 member count. Scale "
    "shape: each round is one bounded-join pass over "
    "|communities|-sized metadata; localCheckpoint per round keeps "
    "lineage linear.",
    tags=("graph", "dedup"),
)
def graph_louvain_weighted_converge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.graph import (
        louvain_converge_weighted,
        louvain_gain_round,
    )
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

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
    lab2 = (
        louvain_gain_round(half, labels)
        .select("n", F.col("lbl_new").alias("lbl"))
        .localCheckpoint()
    )
    la = lab2.select(F.col("n").alias("a"), F.col("lbl").alias("la"))
    lb = lab2.select(F.col("n").alias("b"), F.col("lbl").alias("lb"))
    super_e = (
        half.join(la, "a")
        .join(lb, "b")
        .groupBy(
            F.least("la", "lb").alias("a"),
            F.greatest("la", "lb").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint()
    )
    wlab = (
        super_e.select(F.col("a").alias("n"))
        .unionAll(super_e.select(F.col("b").alias("n")))
        .distinct()
        .select("n", F.col("n").alias("lbl"))
    )
    final_lab, rounds_run = louvain_converge_weighted(
        super_e, wlab, max_rounds=3
    )
    wdeg = (
        super_e.filter(F.col("a") != F.col("b"))
        .select(F.col("a").alias("n"), F.col("w").alias("wt"))
        .unionAll(
            super_e.filter(F.col("a") != F.col("b")).select(
                F.col("b").alias("n"), F.col("w").alias("wt")
            )
        )
        .unionAll(
            super_e.filter(F.col("a") == F.col("b")).select(
                F.col("a").alias("n"), (F.col("w") * 2).alias("wt")
            )
        )
        .groupBy("n")
        .agg(F.sum("wt").cast("bigint").alias("weighted_degree"))
    )
    sizes = lab2.groupBy(F.col("lbl").alias("n")).agg(
        F.count(F.lit(1)).cast("bigint").alias("members")
    )
    return (
        final_lab.select(
            F.col("n").cast("bigint").alias("community"),
            F.col("lbl").cast("bigint").alias("lbl_final"),
            F.lit(rounds_run).cast("int").alias("rounds_run"),
        )
        .join(wdeg.withColumnRenamed("n", "community"), "community")
        .join(sizes.withColumnRenamed("n", "community"), "community")
        .orderBy("community")
    )


# ------------------------------- per-stratum sequential A/B (LD) --

_SEQ_STRAT_SQL = """
        WITH ev AS (
          SELECT user_id, event_type,
                 {day_expr} AS day
          FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        strat AS (
          SELECT ev.user_id,
                 CAST(LEAST(SUM(CASE WHEN ev.event_type = 'purchase'
                                     AND ev.day < d0.d0 + 7
                                THEN 1 ELSE 0 END) {div} 4, 2)
                      AS INTEGER) AS stratum
          FROM ev CROSS JOIN d0 GROUP BY ev.user_id
        ),
        pu AS (
          SELECT looks.k, ev.user_id,
                 CAST(ev.user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN ev.event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          WHERE ev.day < d0.d0 + 7 * looks.k
          GROUP BY looks.k, ev.user_id
        ),
        arms AS (
          SELECT s.stratum, pu.k, pu.arm,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(pu.conv) AS BIGINT) AS c
          FROM pu JOIN strat s ON s.user_id = pu.user_id
          GROUP BY 1, 2, 3
        ),
        wide AS (
          SELECT stratum, k,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN n END), 0)
                      AS BIGINT) AS n0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN c END), 0)
                      AS BIGINT) AS c0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN n END), 0)
                      AS BIGINT) AS n1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN c END), 0)
                      AS BIGINT) AS c1
          FROM arms GROUP BY 1, 2
        ),
        info AS (
          SELECT stratum, k, n0, c0, n1, c1,
                 CAST(n0 + n1 AS BIGINT) AS i_k
          FROM wide
        ),
        imax AS (SELECT stratum, i_k AS im FROM info WHERE k = 3),
        z AS (
          SELECT info.stratum, info.k, n0, c0, n1, c1, i_k, imax.im,
                 CASE WHEN n0 = 0 OR n1 = 0
                      OR c0 + c1 = 0 OR c0 + c1 = n0 + n1
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
          FROM info JOIN imax ON imax.stratum = info.stratum
        )
        SELECT CAST(stratum AS INTEGER) AS stratum,
               CAST(k AS INTEGER) AS look, n0, c0, n1, c1,
               CAST((i_k * 1000000) {div} im AS BIGINT) AS info_frac_ppm,
               {c} / sqrt(CAST(i_k AS DOUBLE) / CAST(im AS DOUBLE))
                 AS crit,
               z,
               CAST(CASE WHEN abs(z) >
                         {c} / sqrt(CAST(i_k AS DOUBLE)
                                    / CAST(im AS DOUBLE))
                    THEN 1 ELSE 0 END AS INTEGER) AS reject
        FROM z ORDER BY stratum, look
"""

_LD_C14 = 2.004


@register(
    "events_sequential_stratified",
    oracle=_SEQ_STRAT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        div="//",
        c=_LD_C14,
    ),
    doc="PER-STRATUM group-sequential A/B readout — events_lan_demets_ab "
    "composed with the events_cuped_stratified stratification: users "
    "are post-stratified by week-1 purchase-count buckets (x DIV 4 "
    "capped at 2), each stratum runs its OWN three weekly looks with "
    "its own enrolled-so-far information fraction t_k = I_k / I_3 "
    "(exact ppm) and the O'Brien-Fleming-shape Lan-DeMets boundary "
    "c(t) = 2.004/sqrt(t) evaluated at the stratum's observed t_k — "
    "heterogeneous enrollment speed per stratum moves the boundary, "
    "which a pooled test cannot see. Degenerate cells (an empty arm, "
    "zero or full conversion — REAL in small strata at sf0.001) take "
    "z = 0 via the mirrored ANSI guard. One per-(look,user) aggregate "
    "+ a strata x looks x arms rollup — 9 metadata rows out.",
    tags=("events", "stats", "curation"),
)
def events_sequential_stratified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_seqstrat")
    return spark.sql(
        _SEQ_STRAT_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_seqstrat",
            unnest_looks="explode(sequence(1, 3))",
            div="DIV",
            c=_LD_C14,
        )
    )


# -------------------------------------- dihedral-canonical pHash --


def _phash_dihedral_hashes_sql(max_doc: int) -> str:
    """Oracle CTE chain for the ORIENTED fixture -> gray -> integer DCT
    -> all 8 dihedral variant hashes -> canonical minimum + plain
    bands, replaying operators/multimodal.py:image_dct_hash_canonical
    from the same dct_coef_values_sql literals.  Fixture: class =
    doc_id % 8, orientation = (doc_id // 8) % 4 in {identity, hflip,
    vflip, transpose}; pixel v = (cls*37 + ys*53 + xs*11 + ch*5) % 256
    over the PRE-orientation coordinates."""
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    ys = (
        "CASE (doc_id // 8) % 4 WHEN 2 THEN 15 - ((i.i // 3) // 16) "
        "WHEN 3 THEN (i.i // 3) % 16 ELSE (i.i // 3) // 16 END"
    )
    xs = (
        "CASE (doc_id // 8) % 4 WHEN 1 THEN 15 - ((i.i // 3) % 16) "
        "WHEN 3 THEN (i.i // 3) // 16 ELSE (i.i // 3) % 16 END"
    )
    return f"""
        coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i,
                 ((doc_id % 8) * 37 + ({ys}) * 53 + ({xs}) * 11
                  + (i.i % 3) * 5) % 256 AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3
        ),
        dct AS MATERIALIZED (
          SELECT gray.doc_id, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3
        ),
        var8(fu, fv, sw, vid) AS (VALUES
          (0, 0, 0, 0), (0, 1, 0, 1), (1, 0, 0, 2), (1, 1, 0, 3),
          (0, 0, 1, 4), (0, 1, 1, 5), (1, 0, 1, 6), (1, 1, 1, 7)),
        vbits AS MATERIALIZED (
          SELECT d.doc_id, v8.vid, d.u * 8 + d.v AS k,
                 CASE WHEN d.u = 0 AND d.v = 0 THEN 0
                      WHEN (CASE WHEN v8.sw = 1 THEN t.d ELSE d.d END)
                           * (CASE WHEN (v8.fu * d.u + v8.fv * d.v) % 2
                                   = 1 THEN -1 ELSE 1 END) > 0
                      THEN 1 ELSE 0 END AS bit
          FROM dct d
          JOIN dct t ON t.doc_id = d.doc_id AND t.u = d.v AND t.v = d.u
          CROSS JOIN var8 v8
        ),
        vhash AS MATERIALIZED (
          SELECT doc_id, vid,
                 CAST(SUM(CASE WHEN k // 16 = 0
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT)
                   AS b0,
                 CAST(SUM(CASE WHEN k // 16 = 1
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT)
                   AS b1,
                 CAST(SUM(CASE WHEN k // 16 = 2
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT)
                   AS b2,
                 CAST(SUM(CASE WHEN k // 16 = 3
                          THEN bit << (k % 16) ELSE 0 END) AS BIGINT)
                   AS b3,
                 CAST(SUM(bit) AS INTEGER) AS popcount
          FROM vbits GROUP BY 1, 2
        ),
        canon AS MATERIALIZED (
          SELECT doc_id, b0, b1, b2, b3, popcount,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY b3, b2, b1, b0, vid
                 ) AS rn
          FROM vhash
        ),
        hashes AS MATERIALIZED (
          SELECT c.doc_id, c.b0, c.b1, c.b2, c.b3, c.popcount,
                 p.b0 AS p0, p.b1 AS p1, p.b2 AS p2, p.b3 AS p3
          FROM canon c
          JOIN vhash p ON p.doc_id = c.doc_id AND p.vid = 0
          WHERE c.rn = 1
        )"""


def _phash_dihedral_blobs(spark: SparkSession, sf_dir: str, max_doc: int):
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < max_doc)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                cls, o = d % 8, (d // 8) % 4
                buf = bytearray(768)
                for i in range(768):
                    y, x, ch = (i // 3) // 16, (i // 3) % 16, i % 3
                    if o == 1:
                        ys, xs = y, 15 - x
                    elif o == 2:
                        ys, xs = 15 - y, x
                    elif o == 3:
                        ys, xs = x, y
                    else:
                        ys, xs = y, x
                    buf[i] = (cls * 37 + ys * 53 + xs * 11 + ch * 5) % 256
                payloads.append(
                    multimodal.encode_ppm(16, 16, bytes(buf))
                    if d % 2 == 0
                    else multimodal.encode_bmp(16, 16, bytes(buf))
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    return docs.mapInPandas(build, schema="doc_id bigint, payload binary")


@register(
    "multimodal_image_phash_dihedral",
    oracle=f"""
        WITH {_phash_dihedral_hashes_sql(500)}
        SELECT b0, b1, b2, b3,
               CAST(MAX(popcount) AS INTEGER) AS popcount,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT (doc_id // 8) % 4) AS BIGINT)
                 AS n_orients,
               CAST(COUNT(DISTINCT CAST(p0 AS VARCHAR) || '_'
                          || CAST(p1 AS VARCHAR) || '_'
                          || CAST(p2 AS VARCHAR) || '_'
                          || CAST(p3 AS VARCHAR)) AS BIGINT) AS n_plain,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM hashes
        GROUP BY 1, 2, 3, 4
        ORDER BY 1, 2, 3, 4
    """,
    doc="Dihedral-CANONICAL pHash (operators/multimodal.py:"
    "image_dct_hash_canonical): the quantized integer DCT basis is "
    "EXACTLY antisymmetric under coordinate reversal (C[u][n-1-x] = "
    "(-1)^u C[u][x] survives symmetric rounding), so all 8 dihedral "
    "images map to {{optional transpose}} x {{u/v-parity sign flips}} "
    "of ONE coefficient matrix and the canonical hash = min of the 8 "
    "variant hashes — no extra DCTs, still exact integers end-to-end. "
    "The fixture plants 8 pixel classes in 4 orientations (identity / "
    "hflip / vflip / transpose); each class collapses to ONE canonical "
    "hash spanning all 4 orientations while carrying 4 DISTINCT plain "
    "hashes (n_orients / n_plain columns prove both). Oracle replays "
    "every variant from the shared DCT literals.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_phash_dihedral(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators import multimodal

    blobs = _phash_dihedral_blobs(spark, sf_dir, 500)
    hashes = multimodal.image_dct_hash_canonical(blobs, size=16, block=8)
    return (
        hashes.groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.max("popcount").cast("int").alias("popcount"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct(F.expr("(doc_id DIV 8) % 4"))
            .cast("bigint")
            .alias("n_orients"),
            F.countDistinct(
                F.expr(
                    "CAST(p0 AS STRING) || '_' || CAST(p1 AS STRING) "
                    "|| '_' || CAST(p2 AS STRING) || '_' "
                    "|| CAST(p3 AS STRING)"
                )
            ).cast("bigint").alias("n_plain"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
        .orderBy("b0", "b1", "b2", "b3")
    )


@register(
    "dedup_phash_dihedral_tier",
    oracle=f"""
        WITH {_phash_dihedral_hashes_sql(500)},
        tagged AS MATERIALIZED (
          SELECT doc_id, doc_id % 8 AS cls,
                 b0, b1, b2, b3, p0, p1, p2, p3
          FROM hashes
        ),
        pairs AS MATERIALIZED (
          SELECT CASE WHEN x.cls = y.cls THEN 1 ELSE 0 END AS is_dup,
                 CASE WHEN x.b0 = y.b0 OR x.b1 = y.b1
                        OR x.b2 = y.b2 OR x.b3 = y.b3
                      THEN 1 ELSE 0 END AS cand_canon,
                 CASE WHEN x.p0 = y.p0 OR x.p1 = y.p1
                        OR x.p2 = y.p2 OR x.p3 = y.p3
                      THEN 1 ELSE 0 END AS cand_plain
          FROM tagged x JOIN tagged y ON x.doc_id < y.doc_id
        )
        SELECT tier,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               CAST((tp * 1000000) // (tp + fp) AS BIGINT)
                 AS precision_ppm,
               CAST((tp * 1000000) // (tp + fn) AS BIGINT) AS recall_ppm
        FROM (
          SELECT 'canonical' AS tier,
                 SUM(is_dup * cand_canon) AS tp,
                 SUM((1 - is_dup) * cand_canon) AS fp,
                 SUM(is_dup * (1 - cand_canon)) AS fn
          FROM pairs
          UNION ALL
          SELECT 'plain',
                 SUM(is_dup * cand_plain),
                 SUM((1 - is_dup) * cand_plain),
                 SUM(is_dup * (1 - cand_plain))
          FROM pairs
        ) ORDER BY tier
    """,
    doc="Candidate-tier evaluation of dihedral canonicalization: ground "
    "truth = planted pixel classes UP TO ORIENTATION (doc_id % 8), "
    "candidates = any shared 16-bit band, once over the CANONICAL "
    "bands and once over the plain pHash bands. Mirrored/rotated "
    "variants of a class carry different plain hashes, so the plain "
    "tier misses most cross-orientation duplicate pairs; the "
    "canonical tier recovers them (within a class every orientation "
    "shares ONE hash -> recall 1e6 ppm by construction, the row that "
    "justifies paying for canonicalization before an image-dedup pass "
    "scales out). Exact-integer TP/FP/FN; audit-scale pair "
    "enumeration — production candidates come from the band "
    "equi-join.",
    tags=("multimodal", "dedup", "stats"),
)
def dedup_phash_dihedral_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators import multimodal

    blobs = _phash_dihedral_blobs(spark, sf_dir, 500)
    tagged = (
        multimodal.image_dct_hash_canonical(blobs, size=16, block=8)
        .select(
            "doc_id", (F.col("doc_id") % 8).alias("cls"),
            "b0", "b1", "b2", "b3", "p0", "p1", "p2", "p3",
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
        ).otherwise(0).alias("cand_canon"),
        F.when(
            (F.col("x.p0") == F.col("y.p0"))
            | (F.col("x.p1") == F.col("y.p1"))
            | (F.col("x.p2") == F.col("y.p2"))
            | (F.col("x.p3") == F.col("y.p3")),
            1,
        ).otherwise(0).alias("cand_plain"),
    ).localCheckpoint()

    def conf(tier: str, cand: str) -> DataFrame:
        return pairs.agg(
            F.lit(tier).alias("tier"),
            F.sum(F.expr(f"is_dup * {cand}")).cast("bigint").alias("tp"),
            F.sum(F.expr(f"(1 - is_dup) * {cand}"))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.expr(f"is_dup * (1 - {cand})"))
            .cast("bigint")
            .alias("fn"),
        )
    return (
        conf("canonical", "cand_canon")
        .unionAll(conf("plain", "cand_plain"))
        .select(
            "tier", "tp", "fp", "fn",
            F.expr("CAST((tp * 1000000) DIV (tp + fp) AS BIGINT)").alias(
                "precision_ppm"
            ),
            F.expr("CAST((tp * 1000000) DIV (tp + fn) AS BIGINT)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("tier")
    )


# --------------------------------------- k-center coverage eval --


def _kcenter_coverage_oracle(query_id: int, k: int, candidates: int) -> str:
    """Unrolled greedy k-center chain (the pipeline13 _kcenter_oracle
    recurrence) ending in COVERAGE rollups: cov{k} is each pool
    element's best similarity to the full selection, compared against
    the coverage of the naive top-k-by-relevance pick."""
    dot_ab = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))"
    )

    def sq(t: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, 64), "
            f"i -> {t}.embedding[i]::DOUBLE * {t}.embedding[i]::DOUBLE))"
        )

    steps = []
    for r in range(2, k + 1):
        steps.append(f"""
        pick{r} AS MATERIALIZED (
          SELECT {r} AS rank, cov{r - 1}.u AS vec_id,
                 cov{r - 1}.cv AS maxsim_nano
          FROM cov{r - 1}
          WHERE cov{r - 1}.u NOT IN (SELECT vec_id FROM sel{r - 1})
          ORDER BY cov{r - 1}.cv ASC, cov{r - 1}.u ASC
          LIMIT 1
        ),
        sel{r} AS MATERIALIZED (
          SELECT vec_id FROM sel{r - 1} UNION ALL
          SELECT vec_id FROM pick{r}
        ),
        cov{r} AS MATERIALIZED (
          SELECT cov{r - 1}.u,
                 GREATEST(cov{r - 1}.cv, sf.s) AS cv
          FROM cov{r - 1}
          JOIN simfull sf ON sf.ia = cov{r - 1}.u
          JOIN pick{r} p ON p.vec_id = sf.ib
        )""")
    return f"""
        WITH q AS (SELECT embedding FROM embeddings
                   WHERE vec_id = {query_id}),
        cand AS MATERIALIZED (
          SELECT b.vec_id, b.embedding,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('b')} * {sq('a')})) AS BIGINT) AS rel
          FROM q a CROSS JOIN embeddings b
          WHERE b.vec_id != {query_id}
          ORDER BY rel DESC, b.vec_id
          LIMIT {candidates}
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(floor(1000000000.0 * {dot_ab}
                      / sqrt({sq('a')} * {sq('b')})) AS BIGINT) AS s
          FROM cand a JOIN cand b ON a.vec_id < b.vec_id
        ),
        simfull AS MATERIALIZED (
          SELECT ia, ib, s FROM sims
          UNION ALL SELECT ib, ia, s FROM sims
          UNION ALL SELECT vec_id AS ia, vec_id AS ib,
                           CAST(1000000000 AS BIGINT) AS s
          FROM cand
        ),
        pick1 AS MATERIALIZED (
          SELECT 1 AS rank, vec_id, rel AS maxsim_nano
          FROM cand ORDER BY rel DESC, vec_id ASC LIMIT 1
        ),
        sel1 AS MATERIALIZED (SELECT vec_id FROM pick1),
        cov1 AS MATERIALIZED (
          SELECT cand.vec_id AS u, sf.s AS cv
          FROM cand
          JOIN simfull sf ON sf.ia = cand.vec_id
          JOIN pick1 p ON p.vec_id = sf.ib
        ){",".join([""] + steps) if steps else ""},
        selt AS MATERIALIZED (
          SELECT vec_id FROM cand ORDER BY rel DESC, vec_id LIMIT {k}
        ),
        covt AS MATERIALIZED (
          SELECT cand.vec_id AS u, CAST(MAX(sf.s) AS BIGINT) AS cv
          FROM cand
          JOIN simfull sf ON sf.ia = cand.vec_id
          JOIN selt p ON p.vec_id = sf.ib
          GROUP BY 1
        )
        SELECT method, min_cov_nano, sum_cov_nano, n_pool FROM (
          SELECT 'kcenter' AS method,
                 CAST(MIN(cv) AS BIGINT) AS min_cov_nano,
                 CAST(SUM(cv) AS BIGINT) AS sum_cov_nano,
                 CAST(COUNT(*) AS BIGINT) AS n_pool
          FROM cov{k}
          UNION ALL
          SELECT 'top_rel', CAST(MIN(cv) AS BIGINT),
                 CAST(SUM(cv) AS BIGINT), CAST(COUNT(*) AS BIGINT)
          FROM covt
        ) ORDER BY method
    """


@register(
    "curation_kcenter_coverage",
    oracle=_kcenter_coverage_oracle(query_id=1, k=5, candidates=24),
    doc="Coverage evaluation of the greedy k-center coreset "
    "(operators/similarity.py:kcenter_coverage_eval) against the naive "
    "top-k-by-relevance selection over the SAME 24-candidate pool: "
    "per-element coverage = best integer-nano similarity to any "
    "selected element, and the emitted min/sum coverage per method "
    "quantify the k-center objective — farthest-point greedy maximizes "
    "min-coverage, so its min_cov_nano dominates the clustered top-k "
    "baseline. The quantitative row a curation pipeline reads before "
    "paying for coreset selection. Oracle unrolls the identical greedy "
    "chain (pipeline13 _kcenter_oracle recurrence) plus two coverage "
    "rollups; bounded candidates^2 work in both engines.",
    tags=("curation", "embeddings", "similarity"),
)
def curation_kcenter_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.similarity import kcenter_coverage_eval

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return kcenter_coverage_eval(
        emb, query_id=1, k=5, candidates=24
    ).orderBy("method")


# --------------------------------------- streaming Bayesian A/B --

_BAYES_STREAM_TMPL = """
        WITH pu AS ({pu}),
        arms AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS c
          FROM pu GROUP BY arm
        ),
        wide AS (
          SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 0 THEN c END) AS c0,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 1 THEN c END) AS c1
          FROM arms
        )
        SELECT n0, c0, n1, c1,
               CAST(1 + c0 AS BIGINT) AS alpha0,
               CAST(1 + n0 - c0 AS BIGINT) AS beta0,
               CAST(1 + c1 AS BIGINT) AS alpha1,
               CAST(1 + n1 - c1 AS BIGINT) AS beta1,
               CAST(1 + c0 AS DOUBLE) / CAST(n0 + 2 AS DOUBLE)
                 AS post_mean0,
               CAST(1 + c1 AS DOUBLE) / CAST(n1 + 2 AS DOUBLE)
                 AS post_mean1,
               (CAST(1 + c1 AS DOUBLE) / CAST(n1 + 2 AS DOUBLE)
                - CAST(1 + c0 AS DOUBLE) / CAST(n0 + 2 AS DOUBLE))
               / sqrt(
                   CAST((1 + c0) * (1 + n0 - c0) AS DOUBLE)
                   / (CAST(n0 + 2 AS DOUBLE) * CAST(n0 + 2 AS DOUBLE)
                      * CAST(n0 + 3 AS DOUBLE))
                   + CAST((1 + c1) * (1 + n1 - c1) AS DOUBLE)
                   / (CAST(n1 + 2 AS DOUBLE) * CAST(n1 + 2 AS DOUBLE)
                      * CAST(n1 + 3 AS DOUBLE))
                 ) AS lift_z
        FROM wide
"""

_BAYES_PU_EVENTS = """
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM events GROUP BY user_id
"""

_BAYES_PU_SINK = """
          SELECT user_id, CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(CASE WHEN SUM(pc) >= 5
                      THEN 1 ELSE 0 END AS BIGINT) AS conv
          FROM sbayes_sink GROUP BY user_id
"""


@register(
    "events_stream_bayesian_ab",
    oracle=_BAYES_STREAM_TMPL.format(pu=_BAYES_PU_EVENTS),
    doc="STREAMING twin of events_bayesian_ab: 3 chronological "
    "micro-batches (time-split parquet appends + maxFilesPerTrigger=1) "
    "each append per-user PURCHASE-COUNT PARTIALS to a parquet sink — "
    "a sum-mergeable state, so batch chopping and replay cannot change "
    "the merged per-user totals — and the finalizer thresholds the "
    "summed counts (conversion = >= 5 purchases) and computes the "
    "identical Beta(1+c, 1+n-c) posterior summary the batch gate "
    "derives from raw events: exact bigint posterior parameters, "
    "mirrored posterior means and normal-approximation lift z. The "
    "always-on Bayesian dashboard shape: per-batch state is one row "
    "per active user, never event volume.",
    tags=("events", "streaming", "stats"),
)
def events_stream_bayesian_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-sbayessrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-sbayesout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.groupBy("user_id")
            .agg(
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(
                        0
                    )
                ).cast("bigint").alias("pc")
            )
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-sbayesck-")
    spark.read.parquet(out).createOrReplaceTempView("sbayes_sink")
    return spark.sql(_BAYES_STREAM_TMPL.format(pu=_BAYES_PU_SINK))


# --------------------------------------- modularity trace (levels) --


def _q_block_sql(s: str, lab: str, stage: str) -> str:
    """Newman-Q CTE block over label table ``lab`` (columns n, lbl) —
    the pipeline10 _modularity_oracle recurrence, namespaced by ``s``
    and tagged with ``stage``."""
    return f"""
        tag{s} AS (
          SELECT h.a, h.b, la.lbl AS ca, lb.lbl AS cb
          FROM half h
          JOIN {lab} la ON la.n = h.a
          JOIN {lab} lb ON lb.n = h.b
        ),
        intra{s} AS (
          SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS e_c
          FROM tag{s} WHERE ca = cb GROUP BY 1
        ),
        qdeg{s} AS (
          SELECT c, CAST(COUNT(*) AS BIGINT) AS d_c FROM (
            SELECT ca AS c FROM tag{s}
            UNION ALL SELECT cb AS c FROM tag{s}
          ) x GROUP BY 1
        ),
        perc{s} AS (
          SELECT qdeg{s}.c,
                 CAST(COALESCE(intra{s}.e_c, 0) AS BIGINT) AS e_c,
                 qdeg{s}.d_c
          FROM qdeg{s} LEFT JOIN intra{s} ON intra{s}.c = qdeg{s}.c
        ),
        q{s} AS (
          SELECT '{stage}' AS stage, m.m,
                 CAST(SUM(4 * m.m * e_c - d_c * d_c) AS BIGINT) AS q_num,
                 CAST(4 * m.m * m.m AS BIGINT) AS q_denom,
                 CAST(SUM(4 * m.m * e_c - d_c * d_c) AS DOUBLE)
                   / CAST(4 * m.m * m.m AS DOUBLE) AS q
          FROM perc{s} CROSS JOIN m
          GROUP BY m.m
        )"""


def _modularity_trace_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    return (
        _EDGE_SQL
        + f""",
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
        super AS (
          SELECT LEAST(la.lbl, lb.lbl) AS ca,
                 GREATEST(la.lbl, lb.lbl) AS cb,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b
          GROUP BY 1, 2
        ),
        wself AS (SELECT ca AS nn, w FROM super WHERE ca = cb),
        wplain AS (SELECT ca, cb, w FROM super WHERE ca <> cb),
        wsym AS (
          SELECT ca AS src, cb AS dst, w FROM wplain
          UNION ALL SELECT cb, ca, w FROM wplain
        ),
        wdeg AS (
          SELECT src, CAST(SUM(wt) AS BIGINT) AS k
          FROM (
            SELECT src, w AS wt FROM wsym
            UNION ALL SELECT nn AS src, 2 * w AS wt FROM wself
          ) x GROUP BY 1
        ),
        wm AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM super),
        wlab1 AS (SELECT src AS n, src AS lbl FROM wdeg),
        {_wround_sql(1, 'wlab1')},
        wlab2 AS (SELECT n, lbl_new AS lbl FROM wmoved1),
        {_wround_sql(2, 'wlab2')},
        wlab3 AS (SELECT n, lbl_new AS lbl FROM wmoved2),
        {_wround_sql(3, 'wlab3')},
        lab3 AS (
          SELECT lab2.n, wmoved3.lbl_new AS lbl
          FROM lab2 JOIN wmoved3 ON wmoved3.n = lab2.lbl
        ),
        {_q_block_sql('a', 'lab1', '1_seed')},
        {_q_block_sql('b', 'lab2', '2_level1')},
        {_q_block_sql('c', 'lab3', '3_level2')}
        SELECT stage, m, q_num, q_denom, q FROM (
          SELECT * FROM qa UNION ALL
          SELECT * FROM qb UNION ALL
          SELECT * FROM qc
        ) ORDER BY stage
    """
    ).replace(" AS (", " AS MATERIALIZED (")


@register(
    "graph_modularity_trace",
    oracle=_modularity_trace_oracle(),
    doc="Modularity trace across Louvain LEVELS — the audit that proves "
    "each level paid for itself: Newman Q (operators/graph."
    "modularity_q, exact rational q_num/(4m^2)) scored on the ORIGINAL "
    "token graph for (1) the md5%4 seed labels, (2) the level-1 "
    "synchronous-round labels, (3) the level-2 weighted-converged "
    "super-labels PROJECTED back onto the nodes (node -> its level-1 "
    "community -> that community's converged label). Oracle chains the "
    "round + coarsen + weighted-converge recurrences and three Q "
    "blocks. Scale shape: each Q is two label joins + "
    "community-bounded aggregates; the projection is a broadcast-size "
    "label-to-label join.",
    tags=("graph", "agg"),
)
def graph_modularity_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from icebergsql_spark.operators.graph import (
        louvain_converge_weighted,
        louvain_gain_round,
        modularity_q,
    )
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir).localCheckpoint()
    nodes = (
        half.select(F.col("a").alias("n"))
        .unionAll(half.select(F.col("b").alias("n")))
        .distinct()
    )
    lab1 = nodes.select(
        "n",
        (
            F.conv(F.substring(F.md5("n"), 1, 6), 16, 10).cast("bigint")
            % 4
        ).alias("lbl"),
    ).localCheckpoint()
    lab2 = (
        louvain_gain_round(half, lab1)
        .select("n", F.col("lbl_new").alias("lbl"))
        .localCheckpoint()
    )
    la = lab2.select(F.col("n").alias("a"), F.col("lbl").alias("la"))
    lb = lab2.select(F.col("n").alias("b"), F.col("lbl").alias("lb"))
    super_e = (
        half.join(la, "a")
        .join(lb, "b")
        .groupBy(
            F.least("la", "lb").alias("a"),
            F.greatest("la", "lb").alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .localCheckpoint()
    )
    wlab = (
        super_e.select(F.col("a").alias("n"))
        .unionAll(super_e.select(F.col("b").alias("n")))
        .distinct()
        .select("n", F.col("n").alias("lbl"))
    )
    final_lab, _rounds = louvain_converge_weighted(
        super_e, wlab, max_rounds=3
    )
    lab3 = lab2.join(
        final_lab.select(
            F.col("n").alias("lbl"), F.col("lbl").alias("lbl_final")
        ),
        "lbl",
    ).select("n", F.col("lbl_final").alias("lbl"))
    stages = [
        ("1_seed", lab1), ("2_level1", lab2), ("3_level2", lab3)
    ]
    parts = [
        modularity_q(half, lab).select(
            F.lit(name).alias("stage"), "m", "q_num", "q_denom", "q"
        )
        for name, lab in stages
    ]
    return reduce(lambda x, y: x.unionAll(y), parts).orderBy("stage")


# -------------------------------------------- video scene cuts --

_SCENE_CUT_TAIL = """
        lagd AS (
          SELECT doc_id, frame_idx, b0, b1, b2, b3,
                 LAG(b0) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS pb0,
                 LAG(b1) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS pb1,
                 LAG(b2) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS pb2,
                 LAG(b3) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS pb3
          FROM {hashes}
        ),
        ham AS (
          SELECT doc_id, frame_idx,
                 CASE WHEN pb0 IS NULL THEN CAST(NULL AS INTEGER)
                      ELSE CAST(bit_count({x0}) + bit_count({x1})
                                + bit_count({x2}) + bit_count({x3})
                           AS INTEGER) END AS hamming
          FROM lagd
        )
        SELECT doc_id,
               CAST(COUNT(*) AS INTEGER) AS n_frames,
               CAST(SUM(CASE WHEN hamming > 8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cuts,
               CAST(SUM(CASE WHEN hamming > 8 THEN frame_idx ELSE 0 END)
                    AS BIGINT) AS cut_pos_sum,
               CAST(MAX(hamming) AS INTEGER) AS max_hamming,
               CAST(SUM(CASE WHEN hamming = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_still
        FROM ham GROUP BY doc_id ORDER BY doc_id
"""


def _scene_cut_oracle(max_doc: int) -> str:
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    return (
        f"""
        WITH coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, f.f AS f, i.i AS i,
                 (doc_id * 37
                  + (f.f // (2 + doc_id % 3)) * 101
                  + ((i.i // 3) // 16) * 53
                  + ((i.i // 3) % 16) * 11
                  + (i.i % 3) * 5) % 200 + f.f * 3 AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, f, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3, 4
        ),
        dct AS MATERIALIZED (
          SELECT gray.doc_id, gray.f, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3, 4
        ),
        vh AS MATERIALIZED (
          SELECT doc_id, f AS frame_idx,
                 CAST(SUM(CASE WHEN (u * 8 + v) // 16 = 0 THEN
                   (CASE WHEN (u = 0 AND v = 0) OR d <= 0 THEN 0 ELSE 1
                    END) << ((u * 8 + v) % 16) ELSE 0 END) AS BIGINT)
                   AS b0,
                 CAST(SUM(CASE WHEN (u * 8 + v) // 16 = 1 THEN
                   (CASE WHEN (u = 0 AND v = 0) OR d <= 0 THEN 0 ELSE 1
                    END) << ((u * 8 + v) % 16) ELSE 0 END) AS BIGINT)
                   AS b1,
                 CAST(SUM(CASE WHEN (u * 8 + v) // 16 = 2 THEN
                   (CASE WHEN (u = 0 AND v = 0) OR d <= 0 THEN 0 ELSE 1
                    END) << ((u * 8 + v) % 16) ELSE 0 END) AS BIGINT)
                   AS b2,
                 CAST(SUM(CASE WHEN (u * 8 + v) // 16 = 3 THEN
                   (CASE WHEN (u = 0 AND v = 0) OR d <= 0 THEN 0 ELSE 1
                    END) << ((u * 8 + v) % 16) ELSE 0 END) AS BIGINT)
                   AS b3
          FROM dct GROUP BY 1, 2
        ),
        """
        + _SCENE_CUT_TAIL.format(
            hashes="vh",
            x0="CAST(xor(b0, pb0) AS BIGINT)",
            x1="CAST(xor(b1, pb1) AS BIGINT)",
            x2="CAST(xor(b2, pb2) AS BIGINT)",
            x3="CAST(xor(b3, pb3) AS BIGINT)",
        )
    )


@register(
    "multimodal_video_scene_cuts",
    oracle=_scene_cut_oracle(60),
    doc="Shot-boundary (scene-cut) detection over RIFF video containers "
    "(operators/multimodal.py:video_frame_phash): every frame is "
    "demuxed by the real chunk walker, decoded, pHashed with the "
    "shared integer DCT, and a cut fires where consecutive frames' "
    "band-XOR Hamming distance exceeds 8. The fixture gives each doc "
    "8 frames in scenes of length 2+doc%3 with a uniform per-frame "
    "brightness drift INSIDE each scene — drift moves only the "
    "dropped DC coefficient, so within-scene hamming is exactly 0 "
    "(n_still proves it) while scene changes flip many sign bits. "
    "Emits per doc the cut count, cut-position digest and max "
    "hamming. Oracle replays frames -> DCT -> bands -> LAG hamming "
    "relationally from the embedded constants. One Arrow-batched "
    "narrow map + a per-doc window — frame-local at 100 TB.",
    tags=("multimodal", "pipeline"),
)
def multimodal_video_scene_cuts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(8):
                    scene = f // (2 + d % 3)
                    buf = bytearray(768)
                    for i in range(768):
                        y, x, ch = (i // 3) // 16, (i // 3) % 16, i % 3
                        buf[i] = (
                            d * 37 + scene * 101 + y * 53 + x * 11
                            + ch * 5
                        ) % 200 + f * 3
                    frames.append(
                        multimodal.encode_ppm(16, 16, bytes(buf))
                    )
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    multimodal.video_frame_phash(
        blobs, size=16, block=8
    ).createOrReplaceTempView("vsc_hashes")
    return spark.sql(
        "WITH "
        + _SCENE_CUT_TAIL.format(
            hashes="vsc_hashes",
            x0="b0 ^ pb0",
            x1="b1 ^ pb1",
            x2="b2 ^ pb2",
            x3="b3 ^ pb3",
        )
    )


# ---------------------------------- CUPED-adjusted sequential A/B --


def _cuped_seq_sql(day_expr: str, src: str, unnest_looks: str,
                   div: str, c: float) -> str:
    """Shared Spark/DuckDB text: CUPED variance reduction inside a
    Lan-DeMets group-sequential frame. Week 1 is the pre-period
    covariate X; looks at days 14/21/28 score Y = post-period
    purchases of users enrolled so far (first post-period event before
    the cutoff); theta comes from that look's pooled exact-integer
    sufficient stats; z uses the delta-method variance of the adjusted
    metric y - theta*x per arm (population form), every float
    expression textually mirrored. GREATEST(n,1) keeps degenerate
    cells ANSI-safe; the final CASE zeroes them."""

    def mean(s: str, n: str) -> str:
        return f"(CAST({s} AS DOUBLE) / CAST(GREATEST({n}, 1) AS DOUBLE))"

    def adj(g: str) -> str:
        return f"({mean(f'sy{g}', f'n{g}')} - th.theta * {mean(f'sx{g}', f'n{g}')})"

    def var(g: str) -> str:
        return (
            f"((CAST(syy{g} AS DOUBLE) - 2.0 * th.theta "
            f"* CAST(sxy{g} AS DOUBLE) + th.theta * th.theta "
            f"* CAST(sxx{g} AS DOUBLE)) "
            f"/ CAST(GREATEST(n{g}, 1) AS DOUBLE) "
            f"- {adj(g)} * {adj(g)})"
        )

    se2 = (
        f"({var('0')} / CAST(GREATEST(n0, 1) AS DOUBLE) "
        f"+ {var('1')} / CAST(GREATEST(n1, 1) AS DOUBLE))"
    )
    return f"""
        WITH ev AS (
          SELECT user_id, event_type, {day_expr} AS day FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        pre AS (
          SELECT ev.user_id,
                 CAST(SUM(CASE WHEN ev.event_type = 'purchase'
                               AND ev.day < d0.d0 + 7
                          THEN 1 ELSE 0 END) AS BIGINT) AS x
          FROM ev CROSS JOIN d0 GROUP BY ev.user_id
        ),
        post AS (
          SELECT looks.k, ev.user_id,
                 CAST(SUM(CASE WHEN ev.event_type = 'purchase'
                          THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          WHERE ev.day >= d0.d0 + 7 AND ev.day < d0.d0 + 7 + 7 * looks.k
          GROUP BY looks.k, ev.user_id
        ),
        pu AS (
          SELECT post.k, post.user_id,
                 CAST(post.user_id % 2 AS INTEGER) AS arm,
                 CAST(COALESCE(pre.x, 0) AS BIGINT) AS x, post.y
          FROM post LEFT JOIN pre ON pre.user_id = post.user_id
        ),
        pooled AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM pu GROUP BY k
        ),
        th AS (
          SELECT k,
                 CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                           / CAST(n * sxx - sx * sx AS DOUBLE)
                 END AS theta
          FROM pooled
        ),
        arms AS (
          SELECT k, arm, CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS sx_g,
                 CAST(SUM(y) AS BIGINT) AS sy_g,
                 CAST(SUM(x * x) AS BIGINT) AS sxx_g,
                 CAST(SUM(x * y) AS BIGINT) AS sxy_g,
                 CAST(SUM(y * y) AS BIGINT) AS syy_g
          FROM pu GROUP BY k, arm
        ),
        wide AS (
          SELECT k,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN n_g END), 0)
                      AS BIGINT) AS n0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sx_g END), 0)
                      AS BIGINT) AS sx0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sy_g END), 0)
                      AS BIGINT) AS sy0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sxx_g END), 0)
                      AS BIGINT) AS sxx0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN sxy_g END), 0)
                      AS BIGINT) AS sxy0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 0 THEN syy_g END), 0)
                      AS BIGINT) AS syy0,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN n_g END), 0)
                      AS BIGINT) AS n1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sx_g END), 0)
                      AS BIGINT) AS sx1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sy_g END), 0)
                      AS BIGINT) AS sy1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sxx_g END), 0)
                      AS BIGINT) AS sxx1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN sxy_g END), 0)
                      AS BIGINT) AS sxy1,
                 CAST(COALESCE(MAX(CASE WHEN arm = 1 THEN syy_g END), 0)
                      AS BIGINT) AS syy1
          FROM arms GROUP BY k
        ),
        imax AS (
          SELECT CAST(n0 + n1 AS BIGINT) AS im FROM wide WHERE k = 3
        ),
        calc AS (
          SELECT wide.k, n0, n1, sy0, sy1, th.theta,
                 CAST(n0 + n1 AS BIGINT) AS i_k, imax.im,
                 CASE WHEN n0 = 0 OR n1 = 0 THEN CAST(0.0 AS DOUBLE)
                      ELSE {adj('0')} - {adj('1')} END AS adj_diff,
                 CASE WHEN n0 = 0 OR n1 = 0 OR {se2} <= 0.0
                      THEN CAST(0.0 AS DOUBLE)
                      ELSE ({adj('0')} - {adj('1')}) / sqrt({se2})
                 END AS z
          FROM wide
          JOIN th ON th.k = wide.k
          CROSS JOIN imax
        )
        SELECT CAST(k AS INTEGER) AS look, n0, n1, sy0, sy1, theta,
               adj_diff, z,
               CAST((i_k * 1000000) {div} im AS BIGINT) AS info_frac_ppm,
               {c} / sqrt(CAST(i_k AS DOUBLE) / CAST(im AS DOUBLE))
                 AS crit,
               CAST(CASE WHEN abs(z) >
                         {c} / sqrt(CAST(i_k AS DOUBLE)
                                    / CAST(im AS DOUBLE))
                    THEN 1 ELSE 0 END AS INTEGER) AS reject
        FROM calc ORDER BY look
    """


@register(
    "events_cuped_sequential",
    oracle=_cuped_seq_sql(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        div="//",
        c=2.004,
    ),
    doc="CUPED-adjusted GROUP-SEQUENTIAL A/B — variance reduction "
    "(events_cuped_adjustment) inside the Lan-DeMets frame "
    "(events_lan_demets_ab): week 1 is the pre-period covariate, each "
    "weekly look scores the post-period purchase totals of users "
    "enrolled so far, theta is refit per look from that look's pooled "
    "EXACT-INTEGER sufficient stats, and the z uses the delta-method "
    "per-arm variance of y - theta*x — the continuous-metric "
    "sequential test every experimentation platform actually runs "
    "(smaller SE -> earlier boundary crossings than the raw-metric "
    "test). Boundary = 2.004/sqrt(t_k) at the observed information "
    "fraction; degenerate cells (empty arm, zero variance) take z = 0 "
    "through GREATEST-guarded mirrored expressions. One per-(look, "
    "user) aggregate + bounded rollups.",
    tags=("events", "stats", "curation"),
)
def events_cuped_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_cupedseq")
    return spark.sql(
        _cuped_seq_sql(
            day_expr="ts DIV 86400000000000",
            src="ev_cupedseq",
            unnest_looks="explode(sequence(1, 3))",
            div="DIV",
            c=2.004,
        )
    )


# ------------------------------------------- CUSUM best split --

_CUSUM_SPLIT_SQL = """
        WITH ev AS (
          SELECT {day_expr} AS day, event_type FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev WHERE event_type = 'purchase' GROUP BY day
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS t
          FROM daily
        ),
        cum AS (
          SELECT day,
                 CAST(SUM(x) OVER (ORDER BY day) AS BIGINT) AS s_k,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
          FROM daily
        ),
        dev AS (
          SELECT cum.day, cum.k, cum.s_k, tot.n, tot.t,
                 CAST(abs(tot.n * cum.s_k - cum.k * tot.t) AS BIGINT)
                   AS dev_num
          FROM cum CROSS JOIN tot
          WHERE cum.k < tot.n
        )
        SELECT CAST(day AS BIGINT) AS split_day,
               CAST(k AS BIGINT) AS k_idx,
               n AS n_days, s_k AS pre_sum,
               CAST(t - s_k AS BIGINT) AS post_sum, dev_num,
               CAST(s_k AS DOUBLE) / CAST(k AS DOUBLE) AS pre_mean,
               CAST(t - s_k AS DOUBLE) / CAST(n - k AS DOUBLE)
                 AS post_mean
        FROM dev
        ORDER BY dev_num DESC, day ASC
        LIMIT 1
"""


@register(
    "events_cusum_split",
    oracle=_CUSUM_SPLIT_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Single best changepoint by the CUSUM max-deviation rule — the "
    "first step of binary segmentation: over daily purchase counts, "
    "the split k maximizing |n*S_k - k*T| (the n-scaled distance of "
    "the cumulative sum from the uniform ramp — an EXACT bigint, no "
    "divisions inside the argmax), tie broken to the earliest day. "
    "Emits the split day plus exact pre/post sums and the two "
    "mirrored float means — where events_cusum_changepoint traces the "
    "full recurrence, this gate answers the operational question "
    "('when did the level shift?') in one pass. Scale shape: a "
    "days-sized window over the daily rollup; the windowed SUM is "
    "cast back to BIGINT immediately (the HUGEINT lesson).",
    tags=("events", "stats"),
)
def events_cusum_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_csplit")
    return spark.sql(
        _CUSUM_SPLIT_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_csplit"
        )
    )


# ------------------------------------ streaming Mann-Kendall twin --


@register(
    "events_stream_mann_kendall",
    oracle=_MANN_KENDALL_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_mann_kendall_trend: 3 chronological "
    "micro-batches append per-day purchase-count PARTIALS to a parquet "
    "sink (sum-mergeable — batch chopping and replay cannot change the "
    "merged daily totals), and the finalizer rebuilds the daily series "
    "and runs the IDENTICAL tie-corrected S/variance/z tail the batch "
    "gate computes from raw events (shared _MK_TAIL text). The "
    "always-on trend monitor shape: per-batch state is one row per "
    "active day, never event volume.",
    tags=("events", "streaming", "stats"),
)
def events_stream_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-smksrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-smkout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.filter(F.col("event_type") == "purchase")
            .groupBy(F.expr("ts DIV 86400000000000").alias("day"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-smkck-")
    spark.read.parquet(out).createOrReplaceTempView("smk_sink")
    return spark.sql(
        """
        WITH daily AS (
          SELECT day, CAST(SUM(c) AS BIGINT) AS x
          FROM smk_sink GROUP BY day
        ),
"""
        + _MK_TAIL
    )


# ---------------------------------------- kNN graph degree histogram --

_KNN_DEG_K = 3


@register(
    "emb_knn_graph_degree",
    oracle=f"""
        WITH base AS MATERIALIZED (
          SELECT vec_id, embedding,
                 list_sum(list_transform(generate_series(1, 64),
                   i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))
                   AS nrm
          FROM embeddings WHERE vec_id < 500
        ),
        sims AS MATERIALIZED (
          SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(floor(1000000000.0
                      * list_sum(list_transform(generate_series(1, 64),
                          i -> a.embedding[i]::DOUBLE
                               * b.embedding[i]::DOUBLE))
                      / sqrt(a.nrm * b.nrm)) AS BIGINT) AS s
          FROM base a JOIN base b ON a.vec_id < b.vec_id
        ),
        sym AS MATERIALIZED (
          SELECT ia AS src, ib AS dst, s FROM sims
          UNION ALL SELECT ib, ia, s FROM sims
        ),
        topk AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT src, dst,
                   row_number() OVER (
                     PARTITION BY src ORDER BY s DESC, dst ASC
                   ) AS rn
            FROM sym
          ) WHERE rn <= {_KNN_DEG_K}
        ),
        edges AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM topk
        ),
        deg AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT a AS n FROM edges UNION ALL SELECT b FROM edges
          ) GROUP BY n
        )
        SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY degree ORDER BY degree
    """,
    doc="Degree histogram of the SYMMETRIZED k-nearest-neighbour graph "
    "over the embedding corpus (k = 3, integer-nano cosine, ties to "
    "the lower id): mutualized kNN edges are the backbone of "
    "graph-based semantic dedup and hub detection — a node whose "
    "degree far exceeds k is a HUB (everyone's neighbour, the "
    "curse-of-dimensionality symptom that poisons kNN classifiers), "
    "and the histogram is the audit that decides whether hub-capping "
    "is needed before a kNN-graph pass scales out. Audit cap 500 "
    "vectors; at scale the same topology comes from the banded ANN "
    "candidate join, never all-pairs. Exact integer ranking, "
    "deterministic tie order, bit-identical engines.",
    tags=("embeddings", "similarity", "graph"),
)
def emb_knn_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from icebergsql_spark.functions import dot_expr, with_double_vec_and_norm

    emb = with_double_vec_and_norm(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"].filter(
            F.col("vec_id") < 500
        ),
        "embedding",
    ).localCheckpoint()
    a, b = emb.alias("a"), emb.alias("b")
    sims = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("ia"),
        F.col("b.vec_id").alias("ib"),
        F.floor(
            F.lit(1e9)
            * dot_expr("a.vd", "b.vd")
            / F.sqrt(F.col("a.nrm") * F.col("b.nrm"))
        ).cast("bigint").alias("s"),
    )
    sym = sims.select(
        F.col("ia").alias("src"), F.col("ib").alias("dst"), "s"
    ).unionAll(
        sims.select(
            F.col("ib").alias("src"), F.col("ia").alias("dst"), "s"
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("s"), F.asc("dst"))
    topk = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KNN_DEG_K)
        .select("src", "dst")
    )
    edges = topk.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        edges.select(F.col("a").alias("n"))
        .unionAll(edges.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .orderBy("degree")
    )


# ------------------------------------ largest-remainder quotas --

_QUOTA_TARGET = 100

_QUOTA_SQL = """
        WITH c AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS c_s
          FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(SUM(c_s) AS BIGINT) AS n FROM c),
        base AS (
          SELECT c.source, c.c_s,
                 CAST(({target} * c.c_s) {div} tot.n AS BIGINT)
                   AS base_quota,
                 CAST(({target} * c.c_s) % tot.n AS BIGINT) AS rem_num
          FROM c CROSS JOIN tot
        ),
        leftover AS (
          SELECT CAST({target} - SUM(base_quota) AS BIGINT) AS l
          FROM base
        ),
        ranked AS (
          SELECT base.*, leftover.l,
                 row_number() OVER (
                   ORDER BY rem_num DESC, source ASC
                 ) AS rn
          FROM base CROSS JOIN leftover
        )
        SELECT source, c_s, base_quota,
               CAST(CASE WHEN rn <= l THEN 1 ELSE 0 END AS INTEGER)
                 AS extra,
               CAST(base_quota
                    + CASE WHEN rn <= l THEN 1 ELSE 0 END AS BIGINT)
                 AS quota
        FROM ranked ORDER BY source
"""


@register(
    "curation_source_quota",
    oracle=_QUOTA_SQL.format(target=_QUOTA_TARGET, div="//"),
    doc="Proportional sampling quotas by LARGEST-REMAINDER apportionment "
    "(Hamilton's method — the exact-integer answer to 'give me a "
    "100-doc sample proportional to source sizes' that naive "
    "per-source rounding gets wrong by over- or under-shooting the "
    "total): base quota = floor(target * c_s / N), then the leftover "
    "seats go to the largest remainders (tie: source name). The "
    "emitted quotas sum to the target EXACTLY by construction — the "
    "allocation a stratified sampler feeds into per-source top-k "
    "selection. All integer arithmetic (non-negative floor division); "
    "scale shape: one source rollup + a sources-sized window.",
    tags=("curation", "stats"),
)
def curation_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("documents",))  # registers the view
    return spark.sql(_QUOTA_SQL.format(target=_QUOTA_TARGET, div="DIV"))


# ------------------------------------ PQ distortion vs block count --

_PQ_MS = (4, 8, 16)


def _pq_sweep_oracle() -> str:
    blocks = ["""
        xq0 AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings CROSS JOIN
               (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
        cb0 AS MATERIALIZED (
          SELECT CAST(vid AS INTEGER) AS cid, pos, q AS cq
          FROM xq0 WHERE vid < 16
        )"""]
    rows = []
    for m in _PQ_MS:
        sub = 64 // m
        blocks.append(f"""
        d{m} AS MATERIALIZED (
          SELECT x.vid, (x.pos - 1) // {sub} AS b, c.cid,
                 SUM((x.q - c.cq) * (x.q - c.cq)) AS dq
          FROM xq0 x JOIN cb0 c USING (pos)
          GROUP BY 1, 2, 3
        ),
        amin{m} AS MATERIALIZED (
          SELECT vid, b, MIN(dq * 100 + cid) AS packed
          FROM d{m} GROUP BY vid, b
        )""")
        rows.append(f"""
          SELECT {m} AS n_blocks,
                 CAST(SUM(cell_err) AS BIGINT) AS total_err,
                 CAST(MAX(cell_err) AS BIGINT) AS max_cell_err,
                 CAST(SUM(n) AS BIGINT) AS n_assignments,
                 CAST(COUNT(*) AS BIGINT) AS used_cells
          FROM (
            SELECT b, packed % 100 AS code,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(packed // 100) AS BIGINT) AS cell_err
            FROM amin{m} GROUP BY 1, 2
          )""")
    return (
        "WITH "
        + ",".join(blocks)
        + """
        SELECT CAST(n_blocks AS INTEGER) AS n_blocks, total_err,
               max_cell_err, n_assignments, used_cells
        FROM ("""
        + " UNION ALL ".join(rows)
        + ") ORDER BY n_blocks"
    )


@register(
    "emb_pq_distortion_by_m",
    oracle=_pq_sweep_oracle(),
    doc="Product-quantization distortion sweep over the sub-vector "
    "count m in {4, 8, 16} (operators/similarity.pq_codes at three "
    "block widths, same 16 codewords per block): total and max "
    "integer-unit quantization error plus codebook occupancy per "
    "setting — total distortion FALLS as m grows (finer sub-spaces) "
    "while the code footprint grows m bytes/vector, and this table is "
    "exactly the trade a billion-vector ANN deployment reads before "
    "fixing its PQ layout. Exact integers end-to-end (the dist*100+"
    "code tie packing); one narrow unpivot feeds all three sweeps.",
    tags=("embeddings", "ann", "stats"),
)
def emb_pq_distortion_by_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from icebergsql_spark.operators import similarity
    from icebergsql_spark.operators.util import ensure_parallelism

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    parts = []
    for m in _PQ_MS:
        rep = similarity.pq_codes(emb, n_blocks=m)
        parts.append(
            rep.agg(
                F.lit(m).cast("int").alias("n_blocks"),
                F.sum("total_err").cast("bigint").alias("total_err"),
                F.max("total_err").cast("bigint").alias("max_cell_err"),
                F.sum("n").cast("bigint").alias("n_assignments"),
                F.count(F.lit(1)).cast("bigint").alias("used_cells"),
            )
        )
    return reduce(lambda x, y: x.unionAll(y), parts).orderBy("n_blocks")


# --------------------------------------- SHOW PARTITIONS gate --


@register(
    "managed_show_partitions",
    oracle="""
        SELECT 'o_year=' || CAST(year(o_orderdate) AS VARCHAR)
                 AS partition,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY 1
    """,
    doc="SHOW PARTITIONS end-to-end (sql.py Engine dispatch over the "
    "manifest list — the `$partitions` metadata's Spark-SQL spelling): "
    "orders lands across per-year partitions over two commits, SHOW "
    "PARTITIONS lists every live partition as a Hive path segment "
    "with ZERO data IO, and the gate joins the listing back to the "
    "per-partition row counts read through the managed path. In-DAG "
    "asserts: the listing equals the distinct years, stays stable "
    "across commits that add no new partition, and grows by exactly "
    "one segment after an insert into a fresh synthetic year.",
    tags=("managed", "metadata"),
)
def managed_show_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    orders = load_tables(spark, sf_dir, ("orders",))["orders"].withColumn(
        "o_year", F.year("o_orderdate")
    )
    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-showp-"))
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in orders.schema.fields
    )
    tbl = eng.catalog.create_table("ord_showp", ddl, ["o_year"])
    tbl.insert(nonempty(orders.filter(F.col("o_orderkey") % 2 == 0)))
    tbl.insert(nonempty(orders.filter(F.col("o_orderkey") % 2 == 1)))
    mark_setup_done()  # table built; the metadata listing is the op
    years = sorted(
        r["o_year"] for r in orders.select("o_year").distinct().collect()
    )
    listing = [
        r["partition"]
        for r in eng.sql("SHOW PARTITIONS ord_showp").collect()
    ]
    assert listing == [f"o_year={y}" for y in years], listing
    # a same-partition append must not change the listing
    tbl.insert(
        nonempty(orders.filter(F.col("o_orderkey") % 97 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + 200000000
        )))
    # ... but those duplicate rows must not reach the emitted rollup:
    # scope the gate's output to the original key range
    listing2 = [
        r["partition"]
        for r in eng.sql("SHOW PARTITIONS ord_showp").collect()
    ]
    assert listing2 == listing, "append added no partition"
    # an insert into a brand-new year grows the listing by one
    tbl.insert(
        nonempty(orders.filter(F.col("o_orderkey") % 101 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 300000000)
        .withColumn("o_year", F.lit(2099))))
    listing3 = [
        r["partition"]
        for r in eng.sql("SHOW PARTITIONS ord_showp").collect()
    ]
    assert listing3 == listing + ["o_year=2099"], listing3
    return eng.sql(
        "SELECT 'o_year=' || CAST(o_year AS STRING) AS partition, "
        "COUNT(*) AS n FROM ord_showp "
        "WHERE o_orderkey < 200000000 GROUP BY o_year ORDER BY 1"
    )


# --------------------------------------- per-source RAKE profile --


def _rake_source_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _RAKE_STOP

    return f"""
        WITH base AS (
          SELECT doc_id, source,
                 string_split(trim(lower(text)), ' ') AS l
          FROM documents
        ),
        tok0 AS (
          SELECT doc_id, source,
                 unnest(generate_series(1, len(l))) AS pos, l
          FROM base
        ),
        tok AS (SELECT doc_id, source, pos, l[pos] AS w FROM tok0),
        seg AS (
          SELECT doc_id, source, pos, w,
                 SUM(CASE WHEN w IN {_RAKE_STOP} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS seg_id
          FROM tok
        ),
        cw AS (
          SELECT doc_id, source, seg_id, pos, w FROM seg
          WHERE w NOT IN {_RAKE_STOP}
        ),
        phrase AS (
          SELECT doc_id, source, seg_id,
                 string_agg(w, ' ' ORDER BY pos) AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS plen
          FROM cw GROUP BY doc_id, source, seg_id
        ),
        wordstat AS (
          SELECT w,
                 CAST((SUM(plen) * 1000000) // COUNT(*) AS BIGINT)
                   AS wscore_ppm
          FROM (
            SELECT cw.w, p.plen
            FROM cw JOIN phrase p
              ON p.doc_id = cw.doc_id AND p.seg_id = cw.seg_id
          ) GROUP BY w
        ),
        pscore AS (
          SELECT cw.doc_id, cw.source, cw.seg_id,
                 CAST(SUM(ws.wscore_ppm) AS BIGINT) AS score_ppm
          FROM cw JOIN wordstat ws ON ws.w = cw.w
          GROUP BY 1, 2, 3
        ),
        best AS (
          SELECT p.source, p.phrase,
                 CAST(COUNT(*) AS BIGINT) AS occurrences,
                 CAST(MAX(s.score_ppm) AS BIGINT) AS score_ppm
          FROM phrase p
          JOIN pscore s
            ON s.doc_id = p.doc_id AND s.seg_id = p.seg_id
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT source, phrase, occurrences, score_ppm,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY score_ppm DESC, phrase ASC
                 ) AS rn
          FROM best
        )
        SELECT source, CAST(rn AS INTEGER) AS rank, phrase,
               occurrences, score_ppm
        FROM ranked WHERE rn <= 3
        ORDER BY source, rank
    """.replace(" AS (", " AS MATERIALIZED (")


@register(
    "text_rake_source_profile",
    oracle=_rake_source_oracle(),
    doc="Per-SOURCE keyphrase profile: corpus-level RAKE word scores "
    "(the text_rake_keyphrases integer-ppm contract — deg/freq "
    "quantized BEFORE the phrase sum, order-independent) score every "
    "stopword-free phrase, and each source reports its top-3 by "
    "(score, phrase) — the per-domain topical fingerprint a curation "
    "pipeline reads when balancing a training mix. Word scores stay "
    "GLOBAL (cross-source comparable) while ranking is per-source; "
    "deterministic total order. Scale shape: one tokenize, bounded "
    "(doc, segment) and vocabulary aggregates, a sources-bounded "
    "window.",
    tags=("text", "curation"),
)
def text_rake_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.pipeline13 import _RAKE_STOP

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.select(
        "doc_id", "source",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), " ")).alias(
            "pos", "w"
        ),
    ).createOrReplaceTempView("rakesp_tok")
    return spark.sql(f"""
        WITH tok AS (SELECT doc_id, source, pos, w FROM rakesp_tok),
        seg AS (
          SELECT doc_id, source, pos, w,
                 SUM(CASE WHEN w IN {_RAKE_STOP} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS seg_id
          FROM tok
        ),
        cw AS (
          SELECT doc_id, source, seg_id, pos, w FROM seg
          WHERE w NOT IN {_RAKE_STOP}
        ),
        phrase AS (
          SELECT doc_id, source, seg_id,
                 array_join(transform(array_sort(
                   collect_list(struct(pos, w))), x -> x.w), ' ')
                   AS phrase,
                 CAST(COUNT(*) AS BIGINT) AS plen
          FROM cw GROUP BY doc_id, source, seg_id
        ),
        wordstat AS (
          SELECT w,
                 CAST((SUM(plen) * 1000000) DIV COUNT(*) AS BIGINT)
                   AS wscore_ppm
          FROM (
            SELECT cw.w, p.plen
            FROM cw JOIN phrase p
              ON p.doc_id = cw.doc_id AND p.seg_id = cw.seg_id
          ) GROUP BY w
        ),
        pscore AS (
          SELECT cw.doc_id, cw.source, cw.seg_id,
                 CAST(SUM(ws.wscore_ppm) AS BIGINT) AS score_ppm
          FROM cw JOIN wordstat ws ON ws.w = cw.w
          GROUP BY 1, 2, 3
        ),
        best AS (
          SELECT p.source, p.phrase,
                 CAST(COUNT(*) AS BIGINT) AS occurrences,
                 CAST(MAX(s.score_ppm) AS BIGINT) AS score_ppm
          FROM phrase p
          JOIN pscore s
            ON s.doc_id = p.doc_id AND s.seg_id = p.seg_id
          GROUP BY 1, 2
        ),
        ranked AS (
          SELECT source, phrase, occurrences, score_ppm,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY score_ppm DESC, phrase ASC
                 ) AS rn
          FROM best
        )
        SELECT source, CAST(rn AS INT) AS rank, phrase,
               occurrences, score_ppm
        FROM ranked WHERE rn <= 3
        ORDER BY source, rank
    """)


# ------------------------------------------- video near-dup pairs --


def _video_neardup_oracle(max_doc: int) -> str:
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    return f"""
        WITH coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, f.f AS f, i.i AS i,
                 ((doc_id % 10) * 37
                  + (f.f // 2) * 101
                  + ((i.i // 3) // 16) * 53
                  + ((i.i // 3) % 16) * 11
                  + (i.i % 3) * 5) % 200 + (doc_id // 10) * 3 AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, f, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3, 4
        ),
        dct AS MATERIALIZED (
          SELECT gray.doc_id, gray.f, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3, 4
        ),
        vh AS MATERIALIZED (
          SELECT doc_id, f,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 0
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b0,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 1
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b1,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 2
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b2,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 3
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b3
          FROM dct GROUP BY 1, 2
        ),
        fset AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 CAST(b0 AS VARCHAR) || '_' || CAST(b1 AS VARCHAR)
                 || '_' || CAST(b2 AS VARCHAR) || '_'
                 || CAST(b3 AS VARCHAR) AS fh
          FROM vh
        ),
        fc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf
          FROM fset GROUP BY doc_id
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM fset x JOIN fset y
            ON y.fh = x.fh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ),
        cont AS (
          SELECT pairs.a, pairs.b, pairs.shared,
                 CAST((pairs.shared * 1000000)
                      // LEAST(fa.nf, fb.nf) AS BIGINT) AS cont_ppm
          FROM pairs
          JOIN fc fa ON fa.doc_id = pairs.a
          JOIN fc fb ON fb.doc_id = pairs.b
        )
        SELECT CAST(cont_ppm // 100000 AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN a % 10 = b % 10 THEN 1 ELSE 0 END)
                    AS BIGINT) AS same_class_pairs,
               CAST(MIN(shared) AS BIGINT) AS min_shared
        FROM cont GROUP BY 1 ORDER BY 1
    """


@register(
    "multimodal_video_neardup",
    oracle=_video_neardup_oracle(60),
    doc="Video NEAR-DUPLICATE detection by frame-hash set containment "
    "(video_frame_phash composed with the dedup_rake_containment "
    "shape): each doc's distinct per-frame pHashes form its "
    "fingerprint set, candidate pairs come from the frame-hash "
    "equi-join (never video x video), and containment = |shared "
    "hashes| / |smaller set| in exact ppm. The fixture plants 10 "
    "content classes x 6 brightness-shifted copies — a uniform "
    "per-doc brightness offset moves only the dropped DC coefficient, "
    "so re-graded copies of the same cut land at containment 1e6 "
    "while cross-class pairs never become candidates (the "
    "re-encode-robust video dedup a training pipeline needs). Emits "
    "the containment-decile histogram with the planted-class "
    "agreement column.",
    tags=("multimodal", "dedup"),
)
def multimodal_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 60)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                cls, bright = d % 10, (d // 10) * 3
                frames = []
                for f in range(8):
                    scene = f // 2
                    buf = bytearray(768)
                    for i in range(768):
                        y, x, ch = (i // 3) // 16, (i // 3) % 16, i % 3
                        buf[i] = (
                            cls * 37 + scene * 101 + y * 53 + x * 11
                            + ch * 5
                        ) % 200 + bright
                    frames.append(
                        multimodal.encode_ppm(16, 16, bytes(buf))
                    )
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    fset = (
        multimodal.video_frame_phash(blobs, size=16, block=8)
        .select(
            "doc_id",
            F.expr(
                "CAST(b0 AS STRING) || '_' || CAST(b1 AS STRING) || '_' "
                "|| CAST(b2 AS STRING) || '_' || CAST(b3 AS STRING)"
            ).alias("fh"),
        )
        .distinct()
        .localCheckpoint()
    )
    fc = fset.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nf")
    )
    x, y = fset.alias("x"), fset.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.fh") == F.col("y.fh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    cont = (
        pairs.join(fc.withColumnRenamed("doc_id", "a").withColumnRenamed(
            "nf", "nfa"), "a")
        .join(fc.withColumnRenamed("doc_id", "b").withColumnRenamed(
            "nf", "nfb"), "b")
        .select(
            "a", "b", "shared",
            F.expr(
                "CAST((shared * 1000000) DIV LEAST(nfa, nfb) AS BIGINT)"
            ).alias("cont_ppm"),
        )
    )
    return (
        cont.groupBy(
            F.expr("CAST(cont_ppm DIV 100000 AS INT)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                F.when(F.col("a") % 10 == F.col("b") % 10, 1).otherwise(0)
            ).cast("bigint").alias("same_class_pairs"),
            F.min("shared").cast("bigint").alias("min_shared"),
        )
        .orderBy("decile")
    )


# --------------------------------------- bloom AND-intersection --

_BLOOM_AND_M = 65536
_BLOOM_PRED_A = "user_id % 3 != 0"
_BLOOM_PRED_B = "user_id % 2 = 0"


@register(
    "sketch_bloom_and_intersection",
    oracle=f"""
        WITH ua AS (SELECT DISTINCT user_id AS k FROM events
                    WHERE {_BLOOM_PRED_A}),
        ub AS (SELECT DISTINCT user_id AS k FROM events
               WHERE {_BLOOM_PRED_B}),
        probes AS (SELECT DISTINCT user_id AS k FROM events),
        a0 AS (SELECT DISTINCT CAST('0x' || substr(md5('b0:' ||
          CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % {_BLOOM_AND_M} AS h
          FROM ua),
        a1 AS (SELECT DISTINCT CAST('0x' || substr(md5('b1:' ||
          CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % {_BLOOM_AND_M} AS h
          FROM ua),
        b0 AS (SELECT DISTINCT CAST('0x' || substr(md5('b0:' ||
          CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % {_BLOOM_AND_M} AS h
          FROM ub),
        b1 AS (SELECT DISTINCT CAST('0x' || substr(md5('b1:' ||
          CAST(k AS VARCHAR)), 1, 6) AS BIGINT) % {_BLOOM_AND_M} AS h
          FROM ub),
        and0 AS (SELECT h FROM a0 INTERSECT SELECT h FROM b0),
        and1 AS (SELECT h FROM a1 INTERSECT SELECT h FROM b1),
        pos AS (
          SELECT k FROM probes
          WHERE CAST('0x' || substr(md5('b0:' || CAST(k AS VARCHAR)),
                     1, 6) AS BIGINT) % {_BLOOM_AND_M}
                  IN (SELECT h FROM and0)
            AND CAST('0x' || substr(md5('b1:' || CAST(k AS VARCHAR)),
                     1, 6) AS BIGINT) % {_BLOOM_AND_M}
                  IN (SELECT h FROM and1)
        ),
        ex AS (SELECT k FROM ua INTERSECT SELECT k FROM ub)
        SELECT CAST((SELECT COUNT(*) FROM ua) AS BIGINT) AS n_a,
               CAST((SELECT COUNT(*) FROM ub) AS BIGINT) AS n_b,
               CAST((SELECT COUNT(*) FROM probes) AS BIGINT) AS n_probes,
               CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS exact_inter,
               CAST((SELECT COUNT(*) FROM pos) AS BIGINT) AS n_positive,
               CAST((SELECT COUNT(*) FROM pos
                     WHERE k IN (SELECT k FROM ex)) AS BIGINT) AS true_pos,
               CAST((SELECT COUNT(*) FROM pos
                     WHERE k NOT IN (SELECT k FROM ex)) AS BIGINT)
                 AS false_pos,
               CAST((SELECT COUNT(*) FROM and0) AS BIGINT) AS occ0,
               CAST((SELECT COUNT(*) FROM and1) AS BIGINT) AS occ1
    """,
    doc="Bloom-filter INTERSECTION by bitmap AND (the third mergeable "
    "bloom operation after OR-union in sketch_bloom_sliding and the "
    "membership probe): per hash function the AND bitmap's set "
    "positions are the intersection of the two sides' position sets, "
    "and a probe is positive iff every hashed position survives. True "
    "members of A n B can NEVER be rejected (their bits are set on "
    "both sides — true_pos = exact_inter, asserted by the emitted "
    "columns), while false positives now come from cross-set bit "
    "collisions too, so the AND-bloom FPR exceeds the single-set FPR "
    "— the documented cost of intersecting filters instead of "
    "rebuilding one. Same md5 bit contract as sketch_bloom_fpr_audit; "
    "sets are the HLL sweep's residue bands. Scale shape: four "
    "distinct bit-position sets (<= m rows, broadcast) + one probe "
    "pass.",
    tags=("sketch", "join"),
)
def sketch_bloom_and_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators.curation import md5_bucket

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ua = ev.filter(F.expr(_BLOOM_PRED_A)).select(
        F.col("user_id").alias("k")
    ).distinct()
    ub = ev.filter(F.expr(_BLOOM_PRED_B)).select(
        F.col("user_id").alias("k")
    ).distinct()
    probes = ev.select(F.col("user_id").alias("k")).distinct()

    def h(i):
        return md5_bucket(
            F.concat(F.lit(f"b{i}:"), F.col("k").cast("string")),
            _BLOOM_AND_M,
        )

    ands = []
    for i in (0, 1):
        sa = ua.select(h(i).alias("h")).distinct()
        sb = ub.select(h(i).alias("h")).distinct()
        ands.append(sa.intersect(sb).localCheckpoint())
    pos = probes
    for i in (0, 1):
        pos = pos.withColumn(f"h{i}", h(i)).join(
            F.broadcast(ands[i].withColumnRenamed("h", f"h{i}")),
            f"h{i}",
            "left_semi",
        )
    pos = pos.select("k").localCheckpoint()
    ex = ua.intersect(ub)
    return (
        ua.agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
        .crossJoin(ub.agg(F.count(F.lit(1)).cast("bigint").alias("n_b")))
        .crossJoin(
            probes.agg(F.count(F.lit(1)).cast("bigint").alias("n_probes"))
        )
        .crossJoin(
            ex.agg(F.count(F.lit(1)).cast("bigint").alias("exact_inter"))
        )
        .crossJoin(
            pos.agg(F.count(F.lit(1)).cast("bigint").alias("n_positive"))
        )
        .crossJoin(
            pos.join(ex, "k", "left_semi").agg(
                F.count(F.lit(1)).cast("bigint").alias("true_pos")
            )
        )
        .crossJoin(
            pos.join(ex, "k", "left_anti").agg(
                F.count(F.lit(1)).cast("bigint").alias("false_pos")
            )
        )
        .crossJoin(
            ands[0].agg(F.count(F.lit(1)).cast("bigint").alias("occ0"))
        )
        .crossJoin(
            ands[1].agg(F.count(F.lit(1)).cast("bigint").alias("occ1"))
        )
    )


# ------------------------------- Holt-Winters seasonal smoothing --

_HW_A, _HW_B, _HW_G, _HW_P = 0.5, 0.3, 0.2, 7


def _hw_lnew(x: str, l: str, b: str, sm: str) -> str:
    return f"{_HW_A} * ({x} - {sm}) + {1 - _HW_A} * ({l} + {b})"


def _hw_oracle() -> str:
    sm = (
        "(CASE (hw.i + 1) % 7 WHEN 0 THEN hw.s0 WHEN 1 THEN hw.s1 "
        "WHEN 2 THEN hw.s2 WHEN 3 THEN hw.s3 WHEN 4 THEN hw.s4 "
        "WHEN 5 THEN hw.s5 ELSE hw.s6 END)"
    )
    lnew = _hw_lnew("CAST(x.c AS DOUBLE)", "hw.l", "hw.b", sm)
    s_cols = ", ".join(
        f"CASE WHEN (hw.i + 1) % 7 = {k} THEN {_HW_G} "
        f"* (CAST(x.c AS DOUBLE) "
        f"- ({lnew})) + {1 - _HW_G} * hw.s{k} ELSE hw.s{k} END"
        for k in range(7)
    )
    fslot = (
        "(CASE (n.mx + 2) % 7 WHEN 0 THEN hw.s0 WHEN 1 THEN hw.s1 "
        "WHEN 2 THEN hw.s2 WHEN 3 THEN hw.s3 WHEN 4 THEN hw.s4 "
        "WHEN 5 THEN hw.s5 ELSE hw.s6 END)"
    )
    return f"""
        WITH RECURSIVE daily AS (
          SELECT event_type,
                 CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, day
        ),
        idx AS (
          SELECT event_type, c,
                 row_number() OVER (PARTITION BY event_type ORDER BY day)
                   - 1 AS i
          FROM daily
        ),
        n AS (
          SELECT event_type, MAX(i) + 1 AS mx FROM idx GROUP BY event_type
        ),
        hw(event_type, i, l, b, s0, s1, s2, s3, s4, s5, s6) AS (
            SELECT event_type, 0, CAST(c AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                   CAST(0 AS DOUBLE)
            FROM idx WHERE i = 0
          UNION ALL
            SELECT hw.event_type, hw.i + 1,
                   {lnew},
                   {_HW_B} * (({lnew}) - hw.l) + {1 - _HW_B} * hw.b,
                   {s_cols}
            FROM hw JOIN idx x
              ON x.event_type = hw.event_type AND x.i = hw.i + 1
        )
        SELECT hw.event_type, CAST(n.mx AS BIGINT) AS n_days,
               round(hw.l, 6) AS level, round(hw.b, 6) AS trend,
               round(hw.s0, 6) AS s0, round(hw.s3, 6) AS s3,
               round(hw.s6, 6) AS s6,
               round(hw.l + 3 * hw.b + {fslot}, 6) AS forecast_3d
        FROM hw JOIN n
          ON n.event_type = hw.event_type AND hw.i = n.mx - 1
        ORDER BY hw.event_type
    """


@register(
    "events_holt_winters",
    oracle=_hw_oracle(),
    doc="Holt-Winters ADDITIVE triple exponential smoothing (alpha=0.5, "
    "beta=0.3, gamma=0.2, period 7) over the daily volume series per "
    "event type — the seasonal capacity-planning recurrence completing "
    "events_holt_smoothing (level+trend) with a 7-slot weekly seasonal "
    "state: l' = a(x - s_m) + (1-a)(l+b), b' = B(l'-l) + (1-B)b, "
    "s_m' = g(x - l') + (1-g)s_m, deterministic zero-seasonal init at "
    "the first observation. The recurrence is sequential by "
    "construction; both engines replay the IDENTICAL float-op "
    "sequence (Spark: one aggregate() fold whose struct carries "
    "i/l/b/s0..s6; oracle: a recursive CTE stepping i -> i+1 with the "
    "same inlined expressions), so the trajectory bit-matches — the "
    "3-day-ahead forecast adds the right seasonal slot. Scale shape: "
    "event-scale work is one (type, day) count; the fold runs over "
    "the tiny per-type day series.",
    tags=("pipeline", "events", "forecast"),
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    daily = (
        ev.select(
            "event_type",
            F.expr("ts DIV 86400000000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _hw_fold(daily)


def _hw_fold(daily: DataFrame) -> DataFrame:
    """The Holt-Winters aggregate() fold over a (event_type, day, c)
    relation — shared verbatim by the batch gate and the streaming
    twin so both run the IDENTICAL float-op sequence."""

    def step(acc, x):
        xc = x["c"].cast("double")
        m = acc["i"] % _HW_P
        sm = acc["s"][m]
        lnew = (
            F.lit(_HW_A) * (xc - sm)
            + F.lit(1 - _HW_A) * (acc["l"] + acc["b"])
        )
        bnew = (
            F.lit(_HW_B)
            * (
                (
                    F.lit(_HW_A) * (xc - sm)
                    + F.lit(1 - _HW_A) * (acc["l"] + acc["b"])
                )
                - acc["l"]
            )
            + F.lit(1 - _HW_B) * acc["b"]
        )
        snew = F.transform(
            acc["s"],
            lambda sv, k: F.when(
                k == m,
                F.lit(_HW_G)
                * (
                    xc
                    - (
                        F.lit(_HW_A) * (xc - sm)
                        + F.lit(1 - _HW_A) * (acc["l"] + acc["b"])
                    )
                )
                + F.lit(1 - _HW_G) * sv,
            ).otherwise(sv),
        )
        return F.struct(
            (acc["i"] + 1).alias("i"),
            F.when(acc["i"] == 0, xc).otherwise(lnew).alias("l"),
            F.when(acc["i"] == 0, F.lit(0.0)).otherwise(bnew).alias("b"),
            F.when(acc["i"] == 0, acc["s"]).otherwise(snew).alias("s"),
        )

    zeros = F.array(*[F.lit(0.0) for _ in range(_HW_P)])
    res = (
        daily.groupBy("event_type")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("day", "c"))),
                F.struct(
                    F.lit(0).alias("i"),
                    F.lit(0.0).alias("l"),
                    F.lit(0.0).alias("b"),
                    zeros.alias("s"),
                ),
                step,
            ).alias("st")
        )
    )
    fslot = F.col("st.s")[(F.col("st.i") + 2) % _HW_P]
    return res.select(
        "event_type",
        F.col("st.i").cast("bigint").alias("n_days"),
        F.round("st.l", 6).alias("level"),
        F.round("st.b", 6).alias("trend"),
        F.round(F.col("st.s")[0], 6).alias("s0"),
        F.round(F.col("st.s")[3], 6).alias("s3"),
        F.round(F.col("st.s")[6], 6).alias("s6"),
        F.round(
            F.col("st.l") + 3 * F.col("st.b") + fslot, 6
        ).alias("forecast_3d"),
    ).orderBy("event_type")


# ------------------------------------ image dedup pipeline (e2e) --


def _image_pipeline_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _phash_pert_hashes_sql

    return f"""
        WITH RECURSIVE {_phash_pert_hashes_sql(500)},
        classes AS MATERIALIZED (
          SELECT b0, b1, b2, b3, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(MIN(doc_id) AS BIGINT) AS rep
          FROM hashes GROUP BY 1, 2, 3, 4
        ),
        pairs AS MATERIALIZED (
          SELECT x.rep AS a, y.rep AS b
          FROM classes x JOIN classes y ON x.rep < y.rep
          WHERE (x.b0 = y.b0 OR x.b1 = y.b1
                 OR x.b2 = y.b2 OR x.b3 = y.b3)
            AND bit_count(CAST(xor(x.b0, y.b0) AS BIGINT))
                + bit_count(CAST(xor(x.b1, y.b1) AS BIGINT))
                + bit_count(CAST(xor(x.b2, y.b2) AS BIGINT))
                + bit_count(CAST(xor(x.b3, y.b3) AS BIGINT)) <= 12
        ),
        edges AS (
          SELECT a AS src, b AS dst FROM pairs
          UNION ALL SELECT b, a FROM pairs
          UNION ALL SELECT rep, rep FROM classes
        ),
        cc(node, comp) AS (
            SELECT DISTINCT src, src FROM edges
          UNION
            SELECT e.src, c.comp FROM edges e JOIN cc c ON e.dst = c.node
        ),
        comp AS (
          SELECT node, CAST(MIN(comp) AS BIGINT) AS component
          FROM cc GROUP BY node
        )
        SELECT comp.component,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(classes.n_docs) AS BIGINT) AS n_docs,
               CAST(MIN(comp.node) AS BIGINT) AS representative
        FROM comp JOIN classes ON classes.rep = comp.node
        GROUP BY comp.component
        ORDER BY comp.component
    """


@register(
    "dedup_image_pipeline",
    oracle=_image_pipeline_oracle(),
    doc="Image dedup END-TO-END: hash -> band -> verify -> cluster -> "
    "canonical representative in one DAG — integer-DCT pHash over the "
    "perturbed 16-class fixture (near-dup variants at hamming 4-19), "
    "identical hashes collapse to hash-classes, candidate edges come "
    "from the 16-bit band equi-join verified at hamming <= 12 (never "
    "class x class beyond band matches), connected components by "
    "min-label propagation merge base+variant classes, and each "
    "component reports its doc count and canonical (min-id) "
    "representative — the keep-one-per-cluster decision a production "
    "image-dedup pass ships. Self-loop edges keep singleton classes "
    "as their own components. Oracle replays hashing, banding, exact "
    "Hamming AND the closure (recursive CTE) relationally.",
    tags=("multimodal", "dedup", "pipeline"),
)
def dedup_image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import dedup, multimodal
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
                pert = (d // 16) % 2 == 1
                rgb = bytes(
                    ((d % 16) * 37 + i * 11) % 224
                    + (32 if pert and i < 12 else 0)
                    for i in range(768)
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
        multimodal.image_dct_hash(blobs, size=16, block=8)
        .groupBy("b0", "b1", "b2", "b3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("rep"),
        )
        .localCheckpoint()
    )
    x, y = classes.alias("x"), classes.alias("y")
    pairs = (
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
        .filter(
            (
                F.bit_count(F.col("x.b0").bitwiseXOR(F.col("y.b0")))
                + F.bit_count(F.col("x.b1").bitwiseXOR(F.col("y.b1")))
                + F.bit_count(F.col("x.b2").bitwiseXOR(F.col("y.b2")))
                + F.bit_count(F.col("x.b3").bitwiseXOR(F.col("y.b3")))
            )
            <= 12
        )
        .select(F.col("x.rep").alias("a"), F.col("y.rep").alias("b"))
    )
    # singleton classes stay their own components via self-loop edges
    pairs = pairs.unionAll(
        classes.select(F.col("rep").alias("a"), F.col("rep").alias("b"))
    )
    comp = dedup.connected_components(pairs)
    return (
        comp.join(classes.withColumnRenamed("rep", "node"), "node")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.min("node").cast("bigint").alias("representative"),
        )
        .orderBy("component")
    )


# ------------------------------------------- sequential SRM --

_SRM_SEQ_SQL = """
        WITH ev AS (
          SELECT user_id, {day_expr} AS day FROM {src}
        ),
        d0 AS (SELECT MIN(day) AS d0 FROM ev),
        looks AS (SELECT {unnest_looks} AS k),
        du AS (
          SELECT DISTINCT looks.k, ev.user_id,
                 CAST({hash_expr} % 2 AS INTEGER) AS arm
          FROM ev CROSS JOIN d0 CROSS JOIN looks
          WHERE ev.day < d0.d0 + 7 * looks.k
        ),
        counts AS (
          SELECT k,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
          FROM du GROUP BY k
        ),
        imax AS (SELECT CAST(n0 + n1 AS BIGINT) AS im FROM counts
                 WHERE k = 3),
        z AS (
          SELECT k, n0, n1, CAST(n0 + n1 AS BIGINT) AS i_k, imax.im,
                 sqrt(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                      / CAST(n0 + n1 AS DOUBLE)) AS absz
          FROM counts CROSS JOIN imax
        )
        SELECT CAST(k AS INTEGER) AS look, n0, n1,
               CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS chi2_num,
               CAST((i_k * 1000000) {div} im AS BIGINT) AS info_frac_ppm,
               {c} / sqrt(CAST(i_k AS DOUBLE) / CAST(im AS DOUBLE))
                 AS crit,
               absz,
               CAST(CASE WHEN absz >
                         {c} / sqrt(CAST(i_k AS DOUBLE)
                                    / CAST(im AS DOUBLE))
                    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag_seq,
               CAST(CASE WHEN absz * absz > 3.841
                    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag_naive
        FROM z ORDER BY look
"""


@register(
    "events_srm_sequential",
    oracle=_SRM_SEQ_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        unnest_looks="unnest(generate_series(1, 3))",
        hash_expr="CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
        "1, 6) AS BIGINT)",
        div="//",
        c=2.004,
    ),
    doc="SEQUENTIAL sample-ratio-mismatch monitor — events_srm_check "
    "composed with the Lan-DeMets boundary: cumulative per-arm "
    "distinct-user counts at three weekly looks, |z| = "
    "sqrt((n0-n1)^2/(n0+n1)) tested against the O'Brien-Fleming-shape "
    "2.004/sqrt(t_k) spending curve at the observed information "
    "fraction — the always-on guardrail that can HALT an experiment "
    "early on assignment bias without inflating the false-alarm rate "
    "the way repeated naive 3.841 chi-square checks do (both flags "
    "emitted for the comparison). Exact bigint counts; mirrored "
    "sqrt/div only.",
    tags=("events", "stats", "streaming"),
)
def events_srm_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_srmseq")
    return spark.sql(
        _SRM_SEQ_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_srmseq",
            unnest_looks="explode(sequence(1, 3))",
            hash_expr="conv(substring(md5(CAST(user_id AS STRING)), "
            "1, 6), 16, 10)",
            div="DIV",
            c=2.004,
        )
    )


# --------------------------------- streaming Holt-Winters twin --


@register(
    "events_stream_holt_winters",
    oracle=_hw_oracle(),
    doc="STREAMING twin of events_holt_winters: 3 chronological "
    "micro-batches append per-(type, day) count PARTIALS to a parquet "
    "sink — sum-mergeable, so batch chopping and replay cannot change "
    "the merged daily series — and the finalizer rebuilds the series "
    "and runs the IDENTICAL aggregate() fold (shared _hw_fold), so "
    "the seasonal trajectory bit-matches the batch gate and the "
    "recursive-CTE oracle. The always-on seasonal forecaster shape: "
    "per-batch state is one row per (type, active day), never event "
    "volume.",
    tags=("events", "streaming", "forecast"),
)
def events_stream_holt_winters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-shwsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-shwout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.groupBy(
                "event_type",
                F.expr("ts DIV 86400000000000").alias("day"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-shwck-")
    daily = (
        spark.read.parquet(out)
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("c"))
    )
    return _hw_fold(daily)


# ---------------------------------- community connectivity audit --


def _community_connectivity_oracle() -> str:
    from icebergsql_spark.plans.pipeline9 import _EDGE_SQL
    from icebergsql_spark.plans.pipeline11 import _SEED_LBL_SQL
    from icebergsql_spark.plans.pipeline12 import _louvain_round_sql

    sql = (
        "WITH RECURSIVE "
        + _EDGE_SQL.replace("WITH ", "", 1)
        + f""",
        lab1 AS (
          SELECT DISTINCT a AS n, {_SEED_LBL_SQL.format(n='a')} AS lbl
          FROM e
        ),
        deg AS (
          SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS k FROM e GROUP BY 1
        ),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM half),
        {_louvain_round_sql(1, 'lab1')},
        lab2 AS (
          SELECT n,
                 CAST('0x' || substr(md5(n), 1, 12) AS BIGINT) AS nid,
                 lbl_new AS lbl
          FROM moved1
        ),
        intra AS (
          SELECT la.nid AS ha, lb.nid AS hb, la.lbl
          FROM half
          JOIN lab2 la ON la.n = half.a
          JOIN lab2 lb ON lb.n = half.b AND lb.lbl = la.lbl
        ),
        iedges AS (
          SELECT ha AS src, hb AS dst FROM intra
          UNION ALL SELECT hb, ha FROM intra
          UNION ALL SELECT nid, nid FROM lab2
        ),
        cc(node, comp) AS (
            SELECT DISTINCT src, src FROM iedges
          UNION
            SELECT e2.src, c.comp FROM iedges e2 JOIN cc c
              ON e2.dst = c.node
        ),
        mincomp AS (
          SELECT node, MIN(comp) AS comp FROM cc GROUP BY node
        ),
        percomm AS (
          SELECT lab2.lbl AS community,
                 CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(COUNT(DISTINCT mincomp.comp) AS BIGINT)
                   AS n_components
          FROM lab2 JOIN mincomp ON mincomp.node = lab2.nid
          GROUP BY lab2.lbl
        ),
        ie AS (
          SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_intra
          FROM intra GROUP BY lbl
        ),
        iso AS (
          SELECT lab2.lbl AS community,
                 CAST(SUM(CASE WHEN x.ha IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_isolated
          FROM lab2
          LEFT JOIN (
            SELECT DISTINCT ha FROM intra
            UNION SELECT DISTINCT hb FROM intra
          ) x ON x.ha = lab2.nid
          GROUP BY lab2.lbl
        )
        SELECT CAST(percomm.community AS BIGINT) AS community,
               percomm.n_nodes,
               CAST(COALESCE(ie.n_intra, 0) AS BIGINT) AS n_intra_edges,
               percomm.n_components,
               iso.n_isolated,
               CAST(CASE WHEN percomm.n_components = 1
                    THEN 1 ELSE 0 END AS INTEGER) AS is_connected
        FROM percomm
        LEFT JOIN ie ON ie.community = percomm.community
        JOIN iso ON iso.community = percomm.community
        ORDER BY community
    """
    )
    # DuckDB inlines CTEs: every reference to intra/lab2/mincomp
    # re-expands the token-edge build and the recursive closure
    # (measured 8.5s at sf0.01; sub-second materialized) — materialize
    # all but the recursive cc member.
    return sql.replace(" AS (", " AS MATERIALIZED (").replace(
        "cc(node, comp) AS MATERIALIZED (", "cc(node, comp) AS ("
    )


@register(
    "graph_community_connectivity",
    oracle=_community_connectivity_oracle(),
    doc="Leiden-motivation connectivity audit of Louvain communities "
    "(Traag et al. 2019's core finding: Louvain routinely emits "
    "INTERNALLY DISCONNECTED communities): after one synchronous "
    "round on the token graph, each community's intra-community "
    "subgraph is decomposed by min-label connected components — "
    "emitting per community the node count, intra-edge count, number "
    "of internal components, isolated members (no intra edge at all) "
    "and the is_connected verdict. A community with n_components > 1 "
    "is exactly what Leiden's refinement phase would split; this "
    "audit is the cheap detector that says whether refinement is "
    "worth running. Oracle chains the round + intra-subgraph closure "
    "(recursive CTE). Scale shape: label joins + CC over "
    "intra-community edges only.",
    tags=("graph", "dedup", "stats"),
)
def graph_community_connectivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.operators import dedup
    from icebergsql_spark.operators.graph import louvain_gain_round
    from icebergsql_spark.plans.pipeline11 import _token_half_edges

    half = _token_half_edges(spark, sf_dir).localCheckpoint()
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
    # token nodes are STRINGS; connected_components keys on longs, so
    # hash to 48-bit ids first (same md5 contract as the oracle)
    nid = F.conv(F.substring(F.md5("n"), 1, 12), 16, 10).cast("bigint")
    lab2 = (
        louvain_gain_round(half, labels)
        .select("n", F.col("lbl_new").alias("lbl"))
        .withColumn("nid", nid)
        .localCheckpoint()
    )
    la = lab2.select(
        F.col("n").alias("a"), F.col("nid").alias("ha"),
        F.col("lbl").alias("la"),
    )
    lb = lab2.select(
        F.col("n").alias("b"), F.col("nid").alias("hb"),
        F.col("lbl").alias("lb"),
    )
    intra = (
        half.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") == F.col("lb"))
        .select("ha", "hb", F.col("la").alias("lbl"))
        .localCheckpoint()
    )
    # self-loop edges keep edgeless nodes as their own components
    pairs = intra.select(
        F.col("ha").alias("a"), F.col("hb").alias("b")
    ).unionAll(
        lab2.select(F.col("nid").alias("a"), F.col("nid").alias("b"))
    )
    comp = dedup.connected_components(pairs)
    percomm = (
        lab2.join(comp.withColumnRenamed("node", "nid"), "nid")
        .groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.countDistinct("component").cast("bigint").alias(
                "n_components"
            ),
        )
    )
    ie = intra.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intra_edges")
    )
    touched = (
        intra.select(F.col("ha").alias("nid"))
        .unionAll(intra.select(F.col("hb").alias("nid")))
        .distinct()
    )
    iso = (
        lab2.join(touched, "nid", "left_anti")
        .groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_isolated"))
    )
    return (
        percomm.join(ie, "community", "left")
        .join(iso, "community", "left")
        .select(
            F.col("community").cast("bigint").alias("community"),
            "n_nodes",
            F.coalesce("n_intra_edges", F.lit(0))
            .cast("bigint")
            .alias("n_intra_edges"),
            "n_components",
            F.coalesce("n_isolated", F.lit(0))
            .cast("bigint")
            .alias("n_isolated"),
            F.when(F.col("n_components") == 1, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_connected"),
        )
        .orderBy("community")
    )


# --------------------------------------------- shot-level dedup --


def _shot_dedup_oracle(max_doc: int) -> str:
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    return f"""
        WITH coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, f.f AS f, i.i AS i,
                 (((doc_id + f.f // 2) % 12) * 37
                  + ((i.i // 3) // 16) * 53
                  + ((i.i // 3) % 16) * 11
                  + (i.i % 3) * 5) % 200 + f.f * 3 AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {max_doc}
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, f, (i // 3) % 16 AS x, (i // 3) // 16 AS y,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2, 3, 4
        ),
        dct AS MATERIALIZED (
          SELECT gray.doc_id, gray.f, cu.u AS u, cv.u AS v,
                 CAST(SUM(gray.g * cu.c * cv.c) AS BIGINT) AS d
          FROM gray
          JOIN coef cu ON cu.x = gray.y
          JOIN coef cv ON cv.x = gray.x
          GROUP BY 1, 2, 3, 4
        ),
        vh AS MATERIALIZED (
          SELECT doc_id, f,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 0
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b0,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 1
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b1,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 2
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b2,
                 CAST(SUM((CASE WHEN (u = 0 AND v = 0) OR d <= 0
                           THEN 0 ELSE 1 END)
                          << ((u * 8 + v) % 16)
                          * (CASE WHEN (u * 8 + v) // 16 = 3
                             THEN 1 ELSE 0 END)) AS BIGINT) AS b3
          FROM dct GROUP BY 1, 2
        ),
        shots AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 CAST(b0 AS VARCHAR) || '_' || CAST(b1 AS VARCHAR)
                 || '_' || CAST(b2 AS VARCHAR) || '_'
                 || CAST(b3 AS VARCHAR) AS sh
          FROM vh
        ),
        sc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns
          FROM shots GROUP BY doc_id
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM shots x JOIN shots y
            ON y.sh = x.sh AND x.doc_id < y.doc_id
          GROUP BY 1, 2
        ),
        cont AS (
          SELECT pairs.a, pairs.b, pairs.shared,
                 CAST((pairs.shared * 1000000)
                      // LEAST(sa.ns, sb.ns) AS BIGINT) AS overlap_ppm
          FROM pairs
          JOIN sc sa ON sa.doc_id = pairs.a
          JOIN sc sb ON sb.doc_id = pairs.b
        )
        SELECT shared AS shared_shots,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(overlap_ppm) AS BIGINT) AS min_overlap_ppm,
               CAST(MAX(overlap_ppm) AS BIGINT) AS max_overlap_ppm,
               CAST(SUM(CASE WHEN abs(a - b) <= 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS adjacent_pairs
        FROM cont GROUP BY shared ORDER BY shared
    """


@register(
    "multimodal_shot_dedup",
    oracle=_shot_dedup_oracle(48),
    doc="SHOT-level video dedup — the partial-overlap tier under "
    "multimodal_video_neardup (clip reuse / compilation detection): "
    "each video's 4 shots draw content from a shared 12-class pool "
    "(shot s of video d shows class (d + s) % 12, with a DC-invariant "
    "per-frame brightness drift inside each shot), so videos d and "
    "d+1 share exactly 3 shot classes, d and d+2 share 2, d and d+3 "
    "share 1 — the emitted shared-shot histogram proves the ladder "
    "(adjacent_pairs column pins locality). Candidates come from the "
    "shot-hash equi-join, never video x video; overlap = |shared "
    "shots| / |smaller shot set| in exact ppm. One Arrow-batched "
    "frame-hash pass + bounded joins.",
    tags=("multimodal", "dedup"),
)
def multimodal_shot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < 48)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                frames = []
                for f in range(8):
                    cls = (d + f // 2) % 12
                    buf = bytearray(768)
                    for i in range(768):
                        y, x, ch = (i // 3) // 16, (i // 3) % 16, i % 3
                        buf[i] = (
                            cls * 37 + y * 53 + x * 11 + ch * 5
                        ) % 200 + f * 3
                    frames.append(
                        multimodal.encode_ppm(16, 16, bytes(buf))
                    )
                payloads.append(multimodal.encode_rvid(frames))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    shots = (
        multimodal.video_frame_phash(blobs, size=16, block=8)
        .select(
            "doc_id",
            F.expr(
                "CAST(b0 AS STRING) || '_' || CAST(b1 AS STRING) || '_' "
                "|| CAST(b2 AS STRING) || '_' || CAST(b3 AS STRING)"
            ).alias("sh"),
        )
        .distinct()
        .localCheckpoint()
    )
    sc = shots.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ns")
    )
    x, y = shots.alias("x"), shots.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.sh") == F.col("y.sh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
    )
    cont = (
        pairs.join(
            sc.withColumnRenamed("doc_id", "a").withColumnRenamed(
                "ns", "nsa"
            ),
            "a",
        )
        .join(
            sc.withColumnRenamed("doc_id", "b").withColumnRenamed(
                "ns", "nsb"
            ),
            "b",
        )
        .select(
            "a", "b", "shared",
            F.expr(
                "CAST((shared * 1000000) DIV LEAST(nsa, nsb) AS BIGINT)"
            ).alias("overlap_ppm"),
        )
    )
    return (
        cont.groupBy(F.col("shared").alias("shared_shots"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("overlap_ppm").cast("bigint").alias("min_overlap_ppm"),
            F.max("overlap_ppm").cast("bigint").alias("max_overlap_ppm"),
            F.sum(
                F.when(F.abs(F.col("a") - F.col("b")) <= 3, 1).otherwise(0)
            ).cast("bigint").alias("adjacent_pairs"),
        )
        .orderBy("shared_shots")
    )
