"""Round-14 gate wave #2 (pipeline52): 3-round SimRank, Burrows' Delta
cosine variant, and pHash-scene video keyframe selection.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration; the SimRank extension is
locked against a 3-round textbook replica in
tests/test_round14_formulas.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import load_tables, register

# ------------------------------------------------ SimRank round 3 --

# One more propagation block appended to pipeline40's chain (reused
# VERBATIM through s2): s3(a,b) = (4 * t3) DIV (5 * deg_a * deg_b)
# with t3 = 1e6 * |common| + sum of s2 ppm over N(a) x N(b). The DIV
# truncation is the spec; operands non-negative so DuckDB // == Spark
# DIV. Support grows honestly: pairs reachable only through s2-positive
# fan pairs enter at round 3 with s1 = s2 = 0 (COALESCE).
_SR3_EXT_SQL = """,
        s2x AS {mat}(
          SELECT a AS i, b AS j, s2_ppm AS s FROM s2
          UNION ALL SELECT b, a, s2_ppm FROM s2
        ),
        cross3 AS (
          SELECT na.v AS a, nb.v AS b, CAST(SUM(sx.s) AS BIGINT) AS sc
          FROM s2x sx
          JOIN adj na ON na.u = sx.i
          JOIN adj nb ON nb.u = sx.j
          WHERE na.v < nb.v
          GROUP BY 1, 2
        ),
        t3 AS (
          SELECT COALESCE(c.a, x.a) AS a, COALESCE(c.b, x.b) AS b,
                 1000000 * COALESCE(c.cm, 0) + COALESCE(x.sc, 0) AS t
          FROM common c
          FULL OUTER JOIN cross3 x ON x.a = c.a AND x.b = c.b
        ),
        s3 AS (
          SELECT t3.a, t3.b,
                 COALESCE(s2.s1_ppm, 0) AS s1_ppm,
                 COALESCE(s2.s2_ppm, 0) AS s2_ppm,
                 (4 * t3.t) {div} (5 * da.d * db.d) AS s3_ppm
          FROM t3
          JOIN deg da ON da.u = t3.a
          JOIN deg db ON db.u = t3.b
          LEFT JOIN s2 ON s2.a = t3.a AND s2.b = t3.b
        )
        SELECT a, b, s1_ppm, s2_ppm, s3_ppm
        FROM s3
        ORDER BY s3_ppm DESC, a, b
        LIMIT 30
"""


def _sr3_oracle() -> str:
    from icebergsql_spark.plans.pipeline40 import (
        _SR_CHAIN_SQL,
        _SR_EDGES_ORACLE,
    )

    return (
        "WITH "
        + _SR_EDGES_ORACLE
        + _SR_CHAIN_SQL.format(div="//", mat="MATERIALIZED ")
        + _SR3_EXT_SQL.format(div="//", mat="MATERIALIZED ")
    )


@register(
    "graph_simrank3",
    oracle=_sr3_oracle(),
    doc="3-round SimRank over the token co-occurrence graph: one more "
    "quantized-ppm propagation appended to graph_simrank's chain "
    "(reused VERBATIM through round 2, so the two gates' first two "
    "rounds are the same computation). Round 3 is where SimRank "
    "starts ranking structurally-similar NON-neighbors above "
    "mere co-neighbors — the extra hop the 2-round gate cannot see; "
    "pairs reachable only through s2-positive fan pairs enter with "
    "s1 = s2 = 0, so the support growth is explicit in the output. "
    "All-integer (exact bigint sums + truncating DIV = the spec), "
    "locked against a 3-round textbook replica in "
    "tests/test_round14_formulas.py. Scale shape: round 3 joins the "
    "s2 pair list against two adjacency fans — bounded by "
    "sum(deg_i * deg_j) over s2 pairs, never node x node.",
    tags=("graph", "stats"),
)
def graph_simrank3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline40 import (
        _SR_CHAIN_SQL,
        _SR_COOC,
        _SR_MAXDOC,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].filter(
        F.col("doc_id") < _SR_MAXDOC
    )
    words = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
        ).alias("w"),
    )
    x, y = words.alias("x"), words.alias("y")
    edges = (
        x.join(
            y,
            (F.col("x.doc_id") == F.col("y.doc_id"))
            & (F.col("x.w") < F.col("y.w")),
        )
        .groupBy(F.col("x.w").alias("a"), F.col("y.w").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _SR_COOC)
        .select("a", "b")
        .localCheckpoint()
    )
    edges.createOrReplaceTempView("sr_edges")
    return spark.sql(
        "WITH "
        + _SR_CHAIN_SQL.format(div="DIV", mat="")
        + _SR3_EXT_SQL.format(div="DIV", mat="")
    )


# --------------------------------------- Burrows' Delta cosine --

# Cosine-Delta (Smith-Aldridge / Evert et al.): cosine similarity
# between per-source z-score vectors instead of the mean |z| distance
# — robust to a few extreme marker words that dominate classic Delta.
# Over pipeline42's exact z chain (num_w = S*q - sum q, den_w =
# S*sum q^2 - (sum q)^2): z1*z2 = num1*num2/den_w and z^2 =
# num^2/den_w are per-word RATIONALS over exact bigints — each term
# quantized ONCE to 1e-6 units (mirrored ROUND over identical
# doubles), the word sums exact bigints, and the final cosine one
# mirrored double expression over those three sums.
_BDC_FINAL_SQL = """
        terms AS (
          SELECT a.source AS s1, b.source AS s2,
                 CASE WHEN a.den > 0
                      THEN CAST(ROUND(1000000.0
                             * CAST(a.num AS DOUBLE)
                             * CAST(b.num AS DOUBLE)
                             / CAST(a.den AS DOUBLE)) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS dot_t
          FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        ),
        dots AS (
          SELECT s1, s2, CAST(SUM(dot_t) AS BIGINT) AS dot_q
          FROM terms GROUP BY 1, 2
        ),
        norms AS (
          SELECT source,
                 CAST(SUM(CASE WHEN den > 0
                      THEN CAST(ROUND(1000000.0
                             * CAST(num AS DOUBLE)
                             * CAST(num AS DOUBLE)
                             / CAST(den AS DOUBLE)) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS norm_q
          FROM z GROUP BY source
        )
        SELECT d.s1, d.s2, d.dot_q, n1.norm_q AS norm1_q,
               n2.norm_q AS norm2_q,
               CASE WHEN n1.norm_q > 0 AND n2.norm_q > 0
                    THEN CAST(d.dot_q AS DOUBLE)
                         / sqrt(CAST(n1.norm_q AS DOUBLE)
                                * CAST(n2.norm_q AS DOUBLE))
               END AS cos_delta
        FROM dots d
        JOIN norms n1 ON n1.source = d.s1
        JOIN norms n2 ON n2.source = d.s2
        ORDER BY d.s1, d.s2
"""


def _bdc_sql(tok: str) -> str:
    from icebergsql_spark.plans.pipeline42 import (
        _BD_CHAIN_SQL,
        _BD_QSCALE,
        _BD_TOPW,
    )

    return (
        _BD_CHAIN_SQL.format(tok=tok, topw=_BD_TOPW, qscale=_BD_QSCALE)
        + _BDC_FINAL_SQL
    )


@register(
    "text_burrows_cosine",
    oracle=_bdc_sql(
        "unnest(regexp_split_to_array(trim(text), '\\s+'))"
    ),
    doc="Cosine-Delta stylometric similarity between sources (Evert "
    "et al.'s angular variant of Burrows' Delta, reusing "
    "text_burrows_delta's exact z chain VERBATIM): cosine between "
    "per-source z-score vectors over the shared top-30 marker "
    "words — robust to the few extreme marker words that dominate "
    "the classic mean-|z| Delta. Per-word dot/norm terms are "
    "rationals num1*num2/den_w over exact bigints, quantized ONCE "
    "to 1e-6 units; the word sums are exact bigint anchors and the "
    "cosine one mirrored double. Scale shape: identical to "
    "Burrows' Delta — a |sources| x 30 dense frame.",
    tags=("text", "curation"),
)
def text_burrows_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(_bdc_sql("explode(split(trim(text), '\\\\s+'))"))


# ------------------------------------- pHash-scene video keyframes --

# Keyframe selection composing the two shipped ingredients: per-frame
# integer pHash (video_frame_phash) segments each video into scenes at
# LAG-hamming > 20, then each scene elects its MEDOID frame (minimum
# total hamming to the other scene frames; earliest-index tie-break) —
# the representative a dedup/captioning pass stores instead of every
# frame. Fixture (audited offline over all 48 docs): 8 frames, scenes
# of 4, uniform within-scene brightness drift (hamming 0 between
# non-flash frames) plus one FLASH frame per scene (top-left 2x2 block
# +16 -> hamming 0-8, below the cut threshold; scene changes measured
# 35+). Docs with even id put the flash at the scene START, so the
# medoid is provably NOT the first frame whenever the flash is
# visible — the selection logic is exercised, not vacuous (in-gate
# assert).
_VKF_CUT = 20
_VKF_MAXDOC = 48

_VKF_TAIL_SQL = """
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
                 CASE WHEN pb0 IS NULL THEN 0
                      ELSE CAST(bit_count({x0}) + bit_count({x1})
                                + bit_count({x2}) + bit_count({x3})
                           AS INTEGER) END AS hamming
          FROM lagd
        ),
        sc AS (
          SELECT doc_id, frame_idx,
                 CAST(SUM(CASE WHEN hamming > {cut} THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY frame_idx)
                   AS BIGINT) AS scene_id
          FROM ham
        ),
        fr AS (
          SELECT h.doc_id, h.frame_idx, s.scene_id,
                 h.b0, h.b1, h.b2, h.b3
          FROM {hashes} h
          JOIN sc s ON s.doc_id = h.doc_id
                   AND s.frame_idx = h.frame_idx
        ),
        pdist AS (
          SELECT a.doc_id, a.scene_id, a.frame_idx,
                 CAST(SUM(CASE WHEN b.frame_idx = a.frame_idx THEN 0
                      ELSE bit_count({y0}) + bit_count({y1})
                           + bit_count({y2}) + bit_count({y3}) END)
                   AS BIGINT) AS dist_sum,
                 CAST(COUNT(*) AS BIGINT) AS n_frames
          FROM fr a
          JOIN fr b ON b.doc_id = a.doc_id
                   AND b.scene_id = a.scene_id
          GROUP BY 1, 2, 3
        ),
        rep AS (
          SELECT doc_id, scene_id, frame_idx, dist_sum, n_frames,
                 ROW_NUMBER() OVER (PARTITION BY doc_id, scene_id
                   ORDER BY dist_sum, frame_idx) AS rn,
                 MIN(frame_idx) OVER (PARTITION BY doc_id, scene_id)
                   AS scene_start_idx
          FROM pdist
        )
        SELECT doc_id, scene_id, n_frames,
               frame_idx AS rep_idx, dist_sum AS rep_dist_sum,
               CAST(scene_start_idx AS INTEGER) AS scene_start_idx
        FROM rep WHERE rn = 1
        ORDER BY doc_id, scene_id
"""


def _vkf_oracle() -> str:
    from icebergsql_spark.operators.multimodal import dct_coef_values_sql

    return (
        f"""
        WITH coef(u, x, c) AS (VALUES {dct_coef_values_sql()}),
        px AS MATERIALIZED (
          SELECT doc_id, f.f AS f, i.i AS i,
                 (doc_id * 37
                  + (f.f // 4) * 101
                  + ((i.i // 3) // 16) * 53
                  + ((i.i // 3) % 16) * 11
                  + (i.i % 3) * 5) % 200 + f.f * 3
                 + (CASE WHEN (f.f % 4) =
                          (CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 2 END)
                         AND ((i.i // 3) // 16) < 2
                         AND ((i.i // 3) % 16) < 2
                    THEN 16 ELSE 0 END) AS v
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS f) f
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
          WHERE doc_id < {_VKF_MAXDOC}
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
        + _VKF_TAIL_SQL.format(
            hashes="vh",
            cut=_VKF_CUT,
            x0="CAST(xor(b0, pb0) AS BIGINT)",
            x1="CAST(xor(b1, pb1) AS BIGINT)",
            x2="CAST(xor(b2, pb2) AS BIGINT)",
            x3="CAST(xor(b3, pb3) AS BIGINT)",
            y0="CAST(xor(a.b0, b.b0) AS BIGINT)",
            y1="CAST(xor(a.b1, b.b1) AS BIGINT)",
            y2="CAST(xor(a.b2, b.b2) AS BIGINT)",
            y3="CAST(xor(a.b3, b.b3) AS BIGINT)",
        )
    )


@register(
    "multimodal_video_keyframes",
    oracle=_vkf_oracle(),
    doc="Scene-aware video keyframe selection composing the shipped "
    "ingredients (multimodal_video_scene_cuts' pHash segmentation + "
    "the pairwise-hamming discipline): frames are demuxed by the "
    "real RIFF walker, pHashed with the shared integer DCT, "
    "segmented at LAG-hamming > 20, and each scene elects its "
    "MEDOID frame (min total hamming to the scene's other frames, "
    "earliest-index tie-break) — the per-scene representative a "
    "dedup/captioning pass stores instead of every frame. The "
    "fixture plants one sub-threshold FLASH frame per scene at the "
    "scene START for even docs (offline audit over all 48 docs: "
    "within-scene hamming <= 8, scene changes >= 35), so the medoid "
    "is provably not the first frame whenever the flash is visible "
    "— asserted non-vacuous in-gate. All-integer; oracle replays "
    "frames -> DCT -> bands -> segmentation -> medoid relationally. "
    "Scale shape: one Arrow-batched narrow map, per-(doc, scene) "
    "pair frames bounded by scene length.",
    tags=("multimodal", "pipeline", "dedup"),
)
def multimodal_video_keyframes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _VKF_MAXDOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                lf = 0 if d % 2 == 0 else 2
                frames = []
                for f in range(8):
                    scene = f // 4
                    flash = (f % 4) == lf
                    buf = bytearray(768)
                    for i in range(768):
                        y, x, ch = (i // 3) // 16, (i // 3) % 16, i % 3
                        v = (
                            d * 37 + scene * 101 + y * 53 + x * 11
                            + ch * 5
                        ) % 200 + f * 3
                        if flash and y < 2 and x < 2:
                            v += 16
                        buf[i] = v
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
    ).createOrReplaceTempView("vkf_hashes")
    out = spark.sql(
        "WITH "
        + _VKF_TAIL_SQL.format(
            hashes="vkf_hashes",
            cut=_VKF_CUT,
            x0="b0 ^ pb0",
            x1="b1 ^ pb1",
            x2="b2 ^ pb2",
            x3="b3 ^ pb3",
            y0="a.b0 ^ b.b0",
            y1="a.b1 ^ b.b1",
            y2="a.b2 ^ b.b2",
            y3="a.b3 ^ b.b3",
        )
    )
    # the flash-at-start plant must make at least one medoid differ
    # from the scene's first frame, or the selection logic is vacuous
    # (the r13 vacuous-wave lesson applied to a fixture CLAIM).
    assert (
        out.filter(F.col("rep_idx") != F.col("scene_start_idx"))
        .limit(1)
        .count()
        == 1
    ), "keyframe fixture vacuous: every medoid is the scene start"
    return out
