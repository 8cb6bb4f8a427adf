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

from icebergsql_spark.plans.registry import load_tables, register


# --------------------------------------------- Mann-Kendall trend --

_MANN_KENDALL_SQL = """
        WITH ev AS (
          SELECT {day_expr} AS day, event_type FROM {src}
        ),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev WHERE event_type = 'purchase' GROUP BY day
        ),
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
