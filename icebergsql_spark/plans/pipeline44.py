"""Round-13 gate wave #6 (pipeline44): PACF + sample-entropy streaming
twins, hour-of-day EMD between event types, and the power-iteration
top principal component.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# ----------------------------------------------- streaming twins --


def _pacf_oracle() -> str:
    from icebergsql_spark.plans.pipeline43 import _PACF_SQL

    return _PACF_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_pacf",
    oracle=_pacf_oracle(),
    doc="STREAMING twin of events_pacf: per-(type, day) count partials "
    "(SUM-mergeable) from 3 chronological micro-batches merge into "
    "the `daily` contract; the finalizer runs the IDENTICAL "
    "Durbin-Levinson tail SQL (shared _PACF_TAIL_SQL template). The "
    "live AR-order monitor converging to the batch answer "
    "bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline43 import _PACF_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "pacf")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM pacf_daily
        ),"""
        + _PACF_TAIL_SQL
    )


def _sampen_oracle() -> str:
    from icebergsql_spark.plans.pipeline43 import _SAMPEN_SQL

    return _SAMPEN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    )


@register(
    "events_stream_sample_entropy",
    oracle=_sampen_oracle(),
    doc="STREAMING twin of events_sample_entropy: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the `daily` contract; the finalizer "
    "runs the IDENTICAL exact template-match tail SQL (shared "
    "_SAMPEN_TAIL_SQL template). The live regularity monitor "
    "converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_sample_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream
    from icebergsql_spark.plans.pipeline43 import _SAMPEN_TAIL_SQL

    _daily_partial_stream(spark, sf_dir, "sen")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM sen_daily
        ),"""
        + _SAMPEN_TAIL_SQL.format(div="DIV")
    )


# -------------------------------------- hour-of-day EMD by type --

# 1-D Wasserstein between two types' hour-of-day distributions =
# L1 of cumulative differences (the dedup_image_histogram_emd
# identity), cross-normalized n-scaled so everything is exact bigint:
# emd_scaled = sum_h |cumA_h * nB - cumB_h * nA|; the true EMD in
# bin units is emd_scaled / (nA * nB), one mirrored double division.
_TYPE_EMD_HEAD_SQL = """
        WITH ev AS (
          SELECT event_type, ({hour_expr}) % 24 AS hod FROM {src}
        ),
        hist AS (
          SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
# Tail shared VERBATIM with the streaming twin (head/tail split at the
# `hist` CTE boundary; composed batch string character-identical).
_TYPE_EMD_TAIL_SQL = """
        dense AS (
          SELECT t.event_type, s.hod,
                 CAST(COALESCE(h.c, 0) AS BIGINT) AS c
          FROM (SELECT DISTINCT event_type FROM hist) t
          CROSS JOIN (SELECT r AS hod FROM (VALUES
            (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),
            (12),(13),(14),(15),(16),(17),(18),(19),(20),(21),
            (22),(23)) AS t(r)) s
          LEFT JOIN hist h ON h.event_type = t.event_type
                          AND h.hod = s.hod
        ),
        cum AS (
          SELECT event_type, hod,
                 CAST(SUM(c) OVER (PARTITION BY event_type
                   ORDER BY hod) AS BIGINT) AS cc,
                 CAST(SUM(c) OVER (PARTITION BY event_type)
                   AS BIGINT) AS n
          FROM dense
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               MAX(a.n) AS n_a, MAX(b.n) AS n_b,
               CAST(SUM(abs(a.cc * b.n - b.cc * a.n)) AS BIGINT)
                 AS emd_scaled,
               CAST(SUM(abs(a.cc * b.n - b.cc * a.n)) AS DOUBLE)
                 / (CAST(MAX(a.n) AS DOUBLE) * CAST(MAX(b.n) AS DOUBLE))
                 AS emd_bins
        FROM cum a
        JOIN cum b ON b.hod = a.hod AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
        ORDER BY type_a, type_b
"""
_TYPE_EMD_SQL = _TYPE_EMD_HEAD_SQL + _TYPE_EMD_TAIL_SQL


@register(
    "events_type_emd",
    oracle=_TYPE_EMD_SQL.format(
        hour_expr="epoch_ns(ts) // 3600000000000", src="events"
    ),
    doc="1-D Wasserstein (earth mover's) distance between every event-"
    "type pair's hour-of-day distribution: EMD = L1 of cumulative "
    "differences (the histogram-EMD identity), cross-normalized "
    "n-scaled so emd_scaled = sum |cumA*nB - cumB*nA| is an EXACT "
    "bigint despite unequal type volumes; emd_bins = "
    "emd_scaled/(nA*nB) is the one mirrored double — the "
    "daypart-shift detector that tells 'errors cluster at night' "
    "from 'errors track traffic' in one number. Scale shape: one "
    "(type, hod) count, a 24-bin dense frame, a 10-row pair join — "
    "volume only enters the first groupBy.",
    tags=("events", "stats"),
)
def events_type_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_emd")
    return spark.sql(
        _TYPE_EMD_SQL.format(
            hour_expr="ts DIV 3600000000000", src="ev_emd"
        )
    )


# ------------------------------- power-iteration top eigenvector --

_EIG_CAP = 500

# Top principal component by 2 power iterations over the n-scaled
# integer covariance: C_ij = sum_v D_vi D_vj with D = n*q - S exact
# bigints (coarse 1e3 q-space keeps |C| ~ 4.5e15, 2000x under the
# ceiling).  Each matrix-vector product would overflow bigint, so it
# runs as a DIMENSION-SORTED double fold (the chi2 sorted-fold
# discipline pins the summation order) and the iterate is quantized
# ONCE per round.  The Rayleigh quotient v1'Cv1 / v1'v1 is a pure
# double ratio.  An ORACLED principal-component gate — the rows-only
# emb_whitening_audit's hash-checked sibling.
# Split at the xq and cov/w1 CTE boundaries (the r13/r14 head/tail
# discipline): the composed _EIG_SQL stays character-identical, so the
# ORACLE string is unchanged, while the Spark side can run the xq
# quantization (the only part that touches data, with ENGINE round()
# semantics) once and hand the bounded rest to the driver (see
# emb_top_eigvec).
_EIG_XQ_SQL = """
        WITH xq AS (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round({emb_i} * 1000) AS BIGINT) + 2000 AS q
          FROM embeddings {spine}
          WHERE vec_id < {cap}
        ),"""

_EIG_HEAD_SQL = _EIG_XQ_SQL + """
        s AS (
          SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q) AS BIGINT) AS sq
          FROM xq GROUP BY pos
        ),
        dev AS (
          SELECT x.vid, x.pos, s.n * x.q - s.sq AS d
          FROM xq x JOIN s ON s.pos = x.pos
        ),
        cov AS (
          SELECT a.pos AS i, b.pos AS j,
                 CAST(SUM(a.d * b.d) AS BIGINT) AS c
          FROM dev a JOIN dev b ON b.vid = a.vid
          GROUP BY 1, 2
        ),"""

_EIG_TAIL_SQL = """
        w1 AS (
          SELECT j, {fold1} AS w FROM cov GROUP BY j
        ),
        m1 AS (SELECT MAX(ABS(w)) AS m FROM w1),
        v1 AS (
          SELECT j AS i,
                 CAST(ROUND(1000.0 * w / (SELECT m FROM m1))
                      AS BIGINT) AS v
          FROM w1
        ),
        w2 AS (
          SELECT cov.j, {fold2} AS w
          FROM cov JOIN v1 ON v1.i = cov.i
          GROUP BY cov.j
        ),
        m2 AS (SELECT MAX(ABS(w)) AS m FROM w2),
        v2 AS (
          SELECT j AS i,
                 CAST(ROUND(1000000.0 * w / (SELECT m FROM m2))
                      AS BIGINT) AS v
          FROM w2
        ),
        w3 AS (
          SELECT cov.j, {fold4} AS w
          FROM cov JOIN v2 ON v2.i = cov.i
          GROUP BY cov.j
        ),
        ray AS (
          SELECT {fold5} AS num,
                 (SELECT CAST(SUM(v * v) AS BIGINT) FROM v2) AS den
          FROM w3 JOIN v2 ON v2.i = w3.j
        )
        SELECT v2.i AS pos, d.c AS var_n2,
               v1.v AS v1_q, v2.v AS v2_q,
               ray.num / CAST(ray.den AS DOUBLE) AS rayleigh
        FROM v2
        JOIN v1 ON v1.i = v2.i
        JOIN cov d ON d.i = v2.i AND d.j = v2.i
        CROSS JOIN ray
        ORDER BY pos
"""

# composed template — character-identical to the pre-split string, so the
# registered oracle is unchanged (worktree string-identity proof, r14
# lesson 1)
_EIG_SQL = _EIG_HEAD_SQL + _EIG_TAIL_SQL


def _eig_params(engine: str) -> dict:
    if engine == "duck":
        fold1 = "list_sum(list(CAST(c AS DOUBLE) * 1000.0 ORDER BY i))"
        fold2 = (
            "list_sum(list(CAST(cov.c AS DOUBLE) * CAST(v1.v AS DOUBLE)"
            " ORDER BY cov.i))"
        )
        fold4 = (
            "list_sum(list(CAST(cov.c AS DOUBLE) * CAST(v2.v AS DOUBLE)"
            " ORDER BY cov.i))"
        )
        fold5 = (
            "list_sum(list(CAST(v2.v AS DOUBLE) * w3.w ORDER BY w3.j))"
        )
        emb_i = "embedding[i]::DOUBLE"
        spine = (
            "CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g"
        )
    else:
        fold1 = (
            "aggregate(array_sort(collect_list(struct(i, "
            "CAST(c AS DOUBLE) * 1000.0 AS term))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        )
        fold2 = (
            "aggregate(array_sort(collect_list(struct(cov.i, "
            "CAST(cov.c AS DOUBLE) * CAST(v1.v AS DOUBLE) AS term))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        )
        fold4 = (
            "aggregate(array_sort(collect_list(struct(cov.i, "
            "CAST(cov.c AS DOUBLE) * CAST(v2.v AS DOUBLE) AS term))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        )
        fold5 = (
            "aggregate(array_sort(collect_list(struct(w3.j, "
            "CAST(v2.v AS DOUBLE) * w3.w AS term))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        )
        emb_i = "CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)"
        spine = "CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) g"
    return dict(
        fold1=fold1,
        fold2=fold2,
        fold4=fold4,
        fold5=fold5,
        emb_i=emb_i,
        spine=spine,
        cap=_EIG_CAP,
    )


def _eig_sql(engine: str) -> str:
    return _EIG_SQL.format(**_eig_params(engine))


def _eig_driver_tail(xq_rows) -> list[tuple]:
    """Bit-exact driver replica of the _EIG_TAIL_SQL chain over the
    collected xq quantization (r15, the VERDICT item-7 / intrinsic-dim
    shape: the whole chain is 64×64-bounded by construction, but as
    Spark SQL it planned ~28 tiny stages — scalar subqueries, fold
    aggregates, self-join replays — each paying a scheduling floor).

    Exactness argument, op by op against the SQL text:
      - s/dev/cov are pure int64 arithmetic (numpy int64 GEMM; the
        worst-case |C| bound is asserted against 2^62 before trusting
        it — coarse 1e3 q-space keeps it ~2000× under the ceiling);
      - every fold is ``aggregate(array_sort(...struct(i, term)...))``
        = a SEQUENTIAL double sum in ascending dimension order —
        replayed as an ascending Python loop over the same IEEE ops
        (int64→double casts, double mult/add are bit-identical);
      - ``CAST(ROUND(x) AS BIGINT)`` on DOUBLE is BigDecimal-of-
        shortest-repr HALF_UP in Spark — replicated with
        Decimal(repr(x)).quantize(HALF_UP), verified on 210 probes
        including the 0.49999999999999994 / ±.5 hard cases and locked
        by the old-vs-new frame-identity test
        (tests/test_opt_r15_eig_driver.py);
      - rayleigh = num / CAST(den AS DOUBLE): double division,
        bit-identical.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    def rhu(x: float) -> int:
        return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    vids = sorted({r["vid"] for r in xq_rows})
    poss = sorted({r["pos"] for r in xq_rows})
    vidx = {v: k for k, v in enumerate(vids)}
    pidx = {p: k for k, p in enumerate(poss)}
    n_v, n_p = len(vids), len(poss)
    Q = np.zeros((n_v, n_p), dtype=np.int64)
    for r in xq_rows:
        Q[vidx[r["vid"]], pidx[r["pos"]]] = r["q"]
    # s: every (vid, pos) cell exists (the spine is a cross join), so
    # n = n_v for every pos and sq is the column sum
    sq = Q.sum(axis=0, dtype=np.int64)
    D = n_v * Q - sq  # dev: s.n * q - s.sq, exact int64
    dmax = int(np.abs(D).max())
    assert dmax * dmax * n_v < (1 << 62), "covariance would overflow int64"
    C = D.T @ D  # exact int64 GEMM (bound asserted above)
    # w1: per j, sequential fold over ascending i of c*1000.0
    w1 = [
        sum_fold(float(C[i, j]) * 1000.0 for i in range(n_p)) for j in range(n_p)
    ]
    m1 = max(abs(w) for w in w1)
    assert m1 > 0.0
    v1 = [rhu(1000.0 * w / m1) for w in w1]
    w2 = [
        sum_fold(float(C[i, j]) * float(v1[i]) for i in range(n_p))
        for j in range(n_p)
    ]
    m2 = max(abs(w) for w in w2)
    assert m2 > 0.0
    v2 = [rhu(1000000.0 * w / m2) for w in w2]
    w3 = [
        sum_fold(float(C[i, j]) * float(v2[i]) for i in range(n_p))
        for j in range(n_p)
    ]
    num = sum_fold(float(v2[j]) * w3[j] for j in range(n_p))
    den = sum(v * v for v in v2)  # exact int
    ray = num / float(den)
    return [
        (poss[j], int(C[j, j]), v1[j], v2[j], ray) for j in range(n_p)
    ]


def sum_fold(terms) -> float:
    """Sequential IEEE double sum from 0.0 — the exact op order of the
    SQL ``aggregate(array_sort(...), 0.0D, (acc, x) -> acc + x.term)``
    fold when ``terms`` is supplied in ascending sort-key order."""
    acc = 0.0
    for t in terms:
        acc += t
    return acc


@register(
    "emb_top_eigvec",
    oracle=_eig_sql("duck"),
    doc="Two-round power iteration on the embedding covariance "
    "(bounded universe vec_id < 500): C = n-scaled exact integer "
    "covariance (64x64 bigint cells from one vid-keyed self-join), "
    "matrix-vector products as dimension-SORTED double folds (a "
    "bigint product chain would overflow; the sorted fold pins IEEE "
    "summation order), iterate quantized ONCE per round, Rayleigh "
    "quotient as a pure double ratio. HONEST SEMANTICS: the Rayleigh "
    "quotient at ANY iterate is a certified LOWER BOUND on lambda_1, "
    "and v2 is the 2-step Krylov iterate — on spiked spectra it IS "
    "the top eigenvector (formula test: cos > 0.98), but this "
    "synthetic embedding table measures lambda2/lambda1 = 0.955 "
    "(near-isotropic), where two rounds deliberately do NOT isolate "
    "the top direction (measured cos 0.27 vs numpy) — the useful "
    "audit number here is the anisotropy lower bound "
    "rayleigh / (trace/64), with trace = sum of the emitted exact "
    "var_n2 diagonal. Hash-checked sibling of the rows-only "
    "emb_whitening_audit. Scale shape: covariance is one self-join "
    "groupBy (dims^2 cells regardless of corpus); the iteration "
    "touches only the 64x64 matrix.",
    tags=("embeddings", "curation", "stats"),
)
def emb_top_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables, local_result

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    # r15 (guide §5 multiple-reference replay + the VERDICT item-7 shape):
    # as one SQL statement the tail referenced `cov` FOUR times and
    # planned ~28 tiny stages (7.2 s warm at sf0.1 for a 64×64-bounded
    # computation). Now the ONLY Spark work is the xq quantization (the
    # part that touches data, with engine round() semantics); the
    # bounded dev/cov/power-iteration chain runs driver-side as a
    # bit-exact replica (see _eig_driver_tail) and the result returns as
    # a VALUES LocalRelation. The oracle string is the identical
    # composed template, untouched.
    p = _eig_params("spark")
    xq = _EIG_XQ_SQL.format(**p).rstrip().rstrip(",")
    rows = spark.sql(xq + "\n        SELECT vid, pos, q FROM xq").collect()
    out = _eig_driver_tail(rows)
    return local_result(
        spark,
        out,
        "pos int, var_n2 bigint, v1_q bigint, v2_q bigint, rayleigh double",
    ).orderBy("pos")
