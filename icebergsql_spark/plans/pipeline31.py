"""Round-12 gate wave #1 (pipeline31): REPLACE TAG DDL scenario, the
lead-lag streaming twin, Kendall's W concordance (+ streaming twin),
NMI / V-measure external cluster validation, the exact-MSE PSNR tier,
and unimodal (peak-constrained) isotonic regression.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import local_result, nonempty, register

# ------------------------------------------------ REPLACE TAG DDL --


@register(
    "managed_replace_tag",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="ALTER TABLE ... REPLACE TAG (+ CREATE OR REPLACE) — Iceberg's "
    "replaceTag SQL-extension verb (sql.py:_ALTER_REF_RE, "
    "table.py::replace_ref): retargets an existing tag at a new "
    "snapshot while KEEPING its retention policy (RETAIN carries "
    "over — REPLACE moves the pointer, it does not reset the "
    "contract), refuses a missing ref unless spelled CREATE OR "
    "REPLACE, and refuses cross-kind replacement (a tag silently "
    "becoming a writable branch is a semantics change). Asserted "
    "in-gate: the moved pointer in $refs, carried max_ref_age_ms, "
    "the missing-ref refusal, expire_snapshots GC'ing the formerly "
    "tagged snapshot while the retargeted tag pins the new one, and "
    "clone-at-tag resolving to the retargeted state. The release-"
    "promotion flow (model_current -> this month's snapshot) every "
    "training-set registry runs. Aggregate hash-matches the raw "
    "oracle over the full rowset the retargeted tag now pins.",
    tags=("managed", "sql"),
)
def managed_replace_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-rtagwh-"))
    tbl = eng.catalog.create_table(
        "src_rtag", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    s1 = tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng.sql(
        f"ALTER TABLE src_rtag CREATE TAG model_current "
        f"AS OF VERSION {s1.snapshot_id} RETAIN 3650 DAYS"
    )
    s2 = tbl.insert(nonempty(base.filter(F.col("k") % 2 == 1)))
    tbl.refresh()
    age0 = tbl.meta.refs["model_current"]["max_ref_age_ms"]
    mark_setup_done()  # tagged two-snapshot fixture built
    # promote: the tag moves to the new head; retention carries over
    eng.sql(
        f"ALTER TABLE src_rtag REPLACE TAG model_current "
        f"AS OF VERSION {s2.snapshot_id}"
    )
    tbl.refresh()
    assert tbl.meta.refs["model_current"]["snapshot_id"] == s2.snapshot_id
    assert tbl.meta.refs["model_current"]["max_ref_age_ms"] == age0
    try:
        eng.sql(
            f"ALTER TABLE src_rtag REPLACE TAG ghost "
            f"AS OF VERSION {s2.snapshot_id}"
        )
        raise AssertionError("REPLACE of a missing tag must be refused")
    except ValueError as ex:
        assert "CREATE OR REPLACE" in str(ex)
    eng.sql(
        f"ALTER TABLE src_rtag CREATE OR REPLACE TAG aux "
        f"AS OF VERSION {s1.snapshot_id}"
    )
    eng.sql("ALTER TABLE src_rtag DROP TAG aux")
    # the formerly tagged snapshot is now unpinned and ages out; the
    # retargeted tag pins the new head
    res = tbl.expire_snapshots(retain_last=1)
    assert res["expired_snapshots"] >= 1
    tbl.refresh()
    assert tbl.meta.snapshot_by_id(s1.snapshot_id) is None
    assert tbl.meta.snapshot_by_id(s2.snapshot_id) is not None
    r = eng.sql(
        "CREATE TABLE dst_rtag LIKE src_rtag AS OF REF 'model_current' "
        "WITH DATA"
    )
    assert r.collect()[0]["added_files_count"] > 0
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM dst_rtag GROUP BY m ORDER BY m"
    )


# ------------------------------------- lead-lag streaming twin --


def _ll_oracle() -> str:
    from icebergsql_spark.plans.pipeline22 import _LL_SQL

    return _LL_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_leadlag",
    oracle=_ll_oracle(),
    doc="STREAMING twin of events_leadlag_regression: per-(type, day) "
    "count partials (SUM-mergeable) from 3 chronological "
    "micro-batches merge into the per-day purchase/error `daily` "
    "contract; the finalizer runs the IDENTICAL lag-1 OLS tail SQL "
    "(shared _LL_TAIL_SQL template with the batch gate). The live "
    "do-errors-foreshadow-revenue screen converging to the batch "
    "answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.pipeline22 import _LL_TAIL_SQL
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "ll")
    return spark.sql(
        """
        WITH pe AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM ll_daily
          WHERE event_type IN ('purchase', 'error')
        ),
        daily AS (
          SELECT day,
                 CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                   THEN x END), 0) AS BIGINT) AS px,
                 CAST(COALESCE(SUM(CASE WHEN event_type = 'error'
                                   THEN x END), 0) AS BIGINT) AS er
          FROM pe GROUP BY day
        ),"""
        + _LL_TAIL_SQL
    )


# ----------------------------------------- Kendall's W concordance --

# Friedman's rank algebra rescaled to the [0, 1] agreement coefficient:
# with doubled within-day average ranks r2_j (ties stay integer),
# 12*S = 3*sum(r2_j^2) - 3*n^2*k*(k+1)^2 and
#   W = 12S / (n^2 k (k^2-1)),  W_ties = 12S / (n^2 k (k^2-1) - n*T),
# so BOTH numerator and denominators are exact bigints and W is one
# mirrored float division.  tail consumes cnt(event_type, day, c) —
# shared with the streaming twin below.
_KNW_TAIL_SQL = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        ),
        ranked AS (
          SELECT event_type, day,
                 CAST(RANK() OVER (PARTITION BY day ORDER BY x)
                      AS BIGINT) AS rk,
                 CAST(COUNT(*) OVER (PARTITION BY day, x) AS BIGINT)
                   AS tcnt
          FROM daily
        ),
        r2j AS (
          SELECT event_type,
                 CAST(SUM(2 * rk + tcnt - 1) AS BIGINT) AS r2_j
          FROM ranked GROUP BY event_type
        ),
        dims AS (
          SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM daily
        ),
        s AS (
          SELECT CAST(SUM(r2_j * r2_j) AS BIGINT) AS s4 FROM r2j
        ),
        ties AS (
          SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY day, x
          ) g
        ),
        calc AS (
          SELECT d.n, d.k, s.s4, t.tie_term,
                 CAST(3 * s.s4
                      - 3 * d.n * d.n * d.k * (d.k + 1) * (d.k + 1)
                      AS BIGINT) AS w_num,
                 CAST(d.n * d.n * d.k * (d.k * d.k - 1) AS BIGINT)
                   AS w_den
          FROM dims d CROSS JOIN s CROSS JOIN ties t
        )
        SELECT n, k, s4, tie_term, w_num, w_den,
               CASE WHEN w_den > 0
                    THEN CAST(w_num AS DOUBLE) / CAST(w_den AS DOUBLE)
               END AS w,
               CASE WHEN w_den - n * tie_term > 0
                    THEN CAST(w_num AS DOUBLE)
                         / CAST(w_den - n * tie_term AS DOUBLE)
               END AS w_tie_corrected
        FROM calc
"""

_KNW_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),"""
    + _KNW_TAIL_SQL
)


@register(
    "events_kendall_w",
    oracle=_KNW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Kendall's W coefficient of concordance across the five event "
    "types with days as judges — the Friedman rank algebra "
    "(plans/pipeline28.py) rescaled to the [0, 1] agreement "
    "coefficient W = chi2/(n(k-1)): with doubled within-day average "
    "ranks, 12S = 3*sum(r2_j^2) - 3n^2k(k+1)^2 and both the "
    "numerator and the (tie-corrected) denominators are exact "
    "bigints, so W and W_ties are single mirrored float divisions "
    "over emitted integers. W near 1 = the type ordering is the "
    "same every day (a stable traffic mix); W near 0 = daily "
    "shuffles. Scale shape: one (type, day) count on a spine, one "
    "per-day rank window over 5 rows, one scalar aggregate.",
    tags=("events", "stats"),
)
def events_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_knw")
    return spark.sql(
        _KNW_SQL.format(day_expr="ts DIV 86400000000000", src="ev_knw")
    )


@register(
    "events_stream_kendall_w",
    oracle=_KNW_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="STREAMING twin of events_kendall_w: per-(type, day) count "
    "partials (SUM-mergeable) from 3 chronological micro-batches "
    "merge into the `cnt` contract; the finalizer runs the "
    "IDENTICAL doubled-rank concordance tail SQL (shared "
    "_KNW_TAIL_SQL template). The live is-the-traffic-mix-stable "
    "monitor converging to the batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_kendall_w(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.pipeline30 import _daily_partial_stream

    _daily_partial_stream(spark, sf_dir, "knw")
    return spark.sql(
        """
        WITH cnt AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS c
          FROM knw_daily
        ),"""
        + _KNW_TAIL_SQL
    )


# --------------------------------- NMI / V-measure vs labels --

# Per-cell mutual-information and entropy contributions: textually
# identical IEEE expressions in both engines (ln and double division
# are bit-identical with a documented 1-ulp JVM-vs-glibc caveat per
# the hill rule); the sums run as key-SORTED sequential folds (Spark
# aggregate() over a sorted struct array == DuckDB list_sum over
# list(... ORDER BY ...)) so summation order can never diverge.  The
# exact-integer anchors (n, sum_c2, k_cells, k_labels) carry the gate
# even if a ulp ever moves a float column.
_MI_TERM = (
    "CAST({c} AS DOUBLE) * ln(CAST({c} AS DOUBLE) * CAST({n} AS DOUBLE)"
    " / (CAST({nc} AS DOUBLE) * CAST({nl} AS DOUBLE)))"
)
_ENT_TERM = (
    "CAST({m} AS DOUBLE) * ln(CAST({n} AS DOUBLE) / CAST({m} AS DOUBLE))"
)

_NMI_FINAL_SQL = """
        SELECT t.n, d.k_cells, d.k_labels, t.sum_c2,
               mi.mi_n / CAST(t.n AS DOUBLE) AS mi,
               hc.hc_n / CAST(t.n AS DOUBLE) AS h_cluster,
               hl.hl_n / CAST(t.n AS DOUBLE) AS h_label,
               CASE WHEN hl.hl_n > 0 THEN mi.mi_n / hl.hl_n
               END AS homogeneity,
               CASE WHEN hc.hc_n > 0 THEN mi.mi_n / hc.hc_n
               END AS completeness,
               CASE WHEN hc.hc_n + hl.hl_n > 0
                    THEN 2.0 * mi.mi_n / (hc.hc_n + hl.hl_n)
               END AS v_measure,
               CASE WHEN hc.hc_n > 0 AND hl.hl_n > 0
                    THEN mi.mi_n / sqrt(hc.hc_n * hl.hl_n)
               END AS nmi_sqrt
        FROM tot t CROSS JOIN dims d CROSS JOIN mi
        CROSS JOIN hc CROSS JOIN hl
"""


def _nmi_shared_mid(n: str) -> str:
    """The engine-shared middle CTEs (cont is provided upstream)."""
    return f"""
        csz AS (
          SELECT cell, CAST(SUM(c) AS BIGINT) AS n_c
          FROM cont GROUP BY cell
        ),
        lsz AS (
          SELECT label, CAST(SUM(c) AS BIGINT) AS n_l
          FROM cont GROUP BY label
        ),
        tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n,
                 CAST(SUM(c * c) AS BIGINT) AS sum_c2
          FROM cont
        ),
        dims AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM csz) AS k_cells,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lsz) AS k_labels
        ),
        terms AS (
          SELECT co.cell, co.label,
                 {_MI_TERM.format(c="co.c", n=n, nc="cs.n_c", nl="ls.n_l")}
                   AS term
          FROM cont co
          JOIN csz cs ON cs.cell = co.cell
          JOIN lsz ls ON ls.label = co.label
        ),
        centt AS (
          SELECT cs.cell,
                 {_ENT_TERM.format(m="cs.n_c", n=n)} AS term
          FROM csz cs
        ),
        lentt AS (
          SELECT ls.label,
                 {_ENT_TERM.format(m="ls.n_l", n=n)} AS term
          FROM lsz ls
        ),
"""


def _nmi_oracle() -> str:
    from icebergsql_spark.plans.pipeline22 import kmeans_chain_cte

    return (
        kmeans_chain_cte()
        + """
        lbl AS (SELECT vec_id AS vid, label FROM embeddings),
        cont AS MATERIALIZED (
          SELECT l.cell, e.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM lab l JOIN lbl e ON e.vid = l.vid
          GROUP BY l.cell, e.label
        ),
"""
        + _nmi_shared_mid(n="(SELECT n FROM tot)")
        + """
        mi AS (
          SELECT list_sum(list(term ORDER BY cell, label)) AS mi_n
          FROM terms
        ),
        hc AS (
          SELECT list_sum(list(term ORDER BY cell)) AS hc_n FROM centt
        ),
        hl AS (
          SELECT list_sum(list(term ORDER BY label)) AS hl_n FROM lentt
        )
"""
        + _NMI_FINAL_SQL
    )


@register(
    "emb_nmi_v_measure",
    oracle=_nmi_oracle(),
    doc="Normalized mutual information + V-measure between the k-means "
    "partition (kmeans_assign, k=8) and the embedding table's "
    "ground-truth labels — the entropy-based external validation "
    "that completes the battery next to purity (majority-blind) and "
    "adjusted Rand (pair-counting): homogeneity = I/H(label), "
    "completeness = I/H(cluster), V = their harmonic mean = "
    "arithmetic-normalized NMI, plus sqrt-normalized NMI. "
    "Determinism: every ln term is a textually identical IEEE "
    "expression over exact bigint contingency counts, and each sum "
    "runs as a key-SORTED sequential fold (the JS-divergence "
    "discipline), so only the documented 1-ulp JVM-vs-glibc ln "
    "caveat remains (hill rule): the float columns are hashed "
    "bit-exactly, so on a platform where any contingency ratio hits "
    "a divergent ln input this gate would mismatch — if that ever "
    "happens, drop the ln columns and keep the exact integer anchors "
    "(n, sum_c2, k_cells, k_labels), which are ulp-proof. Green at "
    "all three SFs on this platform. Scale shape: one "
    "(cell, label) contingency count; every fold is over <= 80 "
    "rows regardless of corpus size.",
    tags=("embeddings", "curation", "stats"),
)
def emb_nmi_v_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.ml import kmeans_assign
    from icebergsql_spark.operators.util import (
        ensure_parallelism,
        release_caches,
    )
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    # localCheckpoint: SQL references would replay the kmeans lineage
    kmeans_assign(emb, k=8, iterations=2).localCheckpoint(
    ).createOrReplaceTempView("lab")
    emb.select(
        F.col("vec_id").alias("vid"), "label"
    ).createOrReplaceTempView("lbl")
    out = spark.sql(
        """
        WITH cont AS (
          SELECT l.cell, e.label, CAST(COUNT(*) AS BIGINT) AS c
          FROM lab l JOIN lbl e ON e.vid = l.vid
          GROUP BY l.cell, e.label
        ),
"""
        + _nmi_shared_mid(n="(SELECT n FROM tot)")
        + """
        mi AS (
          SELECT aggregate(array_sort(collect_list(
                   struct(cell, label, term))),
                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term) AS mi_n
          FROM terms
        ),
        hc AS (
          SELECT aggregate(array_sort(collect_list(struct(cell, term))),
                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term) AS hc_n
          FROM centt
        ),
        hl AS (
          SELECT aggregate(array_sort(collect_list(struct(label, term))),
                 CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term) AS hl_n
          FROM lentt
        )
"""
        + _NMI_FINAL_SQL
    )
    rows = out.collect()
    release_caches()
    return local_result(spark, rows, out.schema)


# --------------------------------------- exact-MSE PSNR tier --

# PSNR's dB form 10*log10(peak^2/MSE) is a 1-ulp log10 hazard (hill
# rule), and the dB is a monotone relabeling anyway — so the tier
# emits the EXACT integers (sse, n, peak_energy = 765^2 * n) and the
# peak-to-noise RATIO as one mirrored float division, classifying
# pairs at exact integer MSE thresholds.
_PSNR_TAIL_SQL = """
        pairs AS (
          SELECT 'variant' AS pair_type, doc_id AS a,
                 doc_id + 16 AS b
          FROM docs
          WHERE (doc_id {div} 16) % 2 = 0 AND doc_id + 16 < {maxd}
          UNION ALL
          SELECT 'cross' AS pair_type, doc_id AS a, doc_id + 1 AS b
          FROM docs
          WHERE (doc_id {div} 16) % 2 = 0 AND doc_id % 16 < 15
            AND doc_id + 1 < {maxd}
        ),
        st AS (
          SELECT p.pair_type, p.a, p.b,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((x.g - y.g) * (x.g - y.g)) AS BIGINT) AS sse
          FROM pairs p
          JOIN gray x ON x.doc_id = p.a
          JOIN gray y ON y.doc_id = p.b AND y.p = x.p
          GROUP BY 1, 2, 3
        ),
        tiered AS (
          SELECT pair_type, a, b, n, sse,
                 CAST(585225 * n AS BIGINT) AS peak_energy,
                 CASE WHEN sse = 0 THEN 'identical'
                      WHEN sse <= 200 * n THEN 'near'
                      ELSE 'far' END AS tier,
                 CASE WHEN sse > 0
                      THEN CAST(585225 * n AS DOUBLE)
                           / CAST(sse AS DOUBLE)
                 END AS psnr_ratio
          FROM st
        )
        SELECT pair_type, tier,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(MIN(sse) AS BIGINT) AS min_sse,
               CAST(MAX(sse) AS BIGINT) AS max_sse,
               MIN(psnr_ratio) AS min_psnr_ratio,
               MAX(psnr_ratio) AS max_psnr_ratio
        FROM tiered
        GROUP BY pair_type, tier
        ORDER BY pair_type, tier
"""


def _psnr_oracle() -> str:
    from icebergsql_spark.plans.pipeline13 import _PHASH_PERT_PIXEL
    from icebergsql_spark.plans.pipeline25 import _SSIM_MAX_DOC

    pix = _PHASH_PERT_PIXEL.format(i="i.i", div="//")
    return (
        f"""
        WITH docs AS (
          SELECT doc_id FROM documents WHERE doc_id < {_SSIM_MAX_DOC}
        ),
        px AS MATERIALIZED (
          SELECT doc_id, i.i AS i, {pix} AS v
          FROM docs
          CROSS JOIN (SELECT unnest(generate_series(0, 767)) AS i) i
        ),
        gray AS MATERIALIZED (
          SELECT doc_id, CAST(i // 3 AS INTEGER) AS p,
                 CAST(SUM(v) AS BIGINT) AS g
          FROM px GROUP BY 1, 2
        ),
"""
        + _PSNR_TAIL_SQL.format(div="//", maxd=_SSIM_MAX_DOC)
    )


@register(
    "multimodal_image_psnr",
    oracle=_psnr_oracle(),
    doc="Peak-signal-to-noise tier over REAL decoded pixels: per pair "
    "the EXACT integer SSE and pixel count over the luminance plane "
    "(operators/multimodal.py::image_gray_pixels) plus the "
    "peak-to-noise ratio 765^2*n/SSE as one mirrored float division "
    "— the dB form 10*log10(...) is deliberately NOT emitted (log10 "
    "is a 1-ulp JVM-vs-glibc hazard per the hill rule, and dB is a "
    "monotone relabeling of the exact ratio). Pairs classify at "
    "exact integer MSE thresholds: the planted +96-gray 4-pixel "
    "variants land at SSE exactly 36864 (MSE 144 -> 'near'), "
    "cross-class pairs far above. The codec-regression separator a "
    "media pipeline trends per batch. Scale shape: arithmetic pair "
    "spine, pixel equi-join on doc_id, 256 rows per pair.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_psnr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.multimodal import image_gray_pixels
    from icebergsql_spark.plans.pipeline16 import _pert_blobs
    from icebergsql_spark.plans.pipeline25 import _SSIM_MAX_DOC
    from icebergsql_spark.plans.registry import load_tables

    image_gray_pixels(
        _pert_blobs(spark, sf_dir, _SSIM_MAX_DOC)
    ).createOrReplaceTempView("gray")
    (
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _SSIM_MAX_DOC)
        .select("doc_id")
    ).createOrReplaceTempView("docs")
    return spark.sql(
        "WITH "
        + _PSNR_TAIL_SQL.format(div="DIV", maxd=_SSIM_MAX_DOC).lstrip()
    )


# -------------------------- unimodal (umbrella) isotonic regression --

# Peak-constrained shape fit: anchor the mode at the series argmax
# (ties -> earliest day), then TWO max-min PAVA passes meeting there —
# isotonic increasing on [1..peak] (fit_i = max_{j<=i} min_{i<=k<=pk}
# mean) and its antitonic dual on (peak..n] (fit_i = min_{pk<j<=i}
# max_{k>=i} mean).  Every candidate mean is one prefix-sum
# difference, so both engines evaluate the SAME finite set of double
# divisions and MIN/MAX over identical doubles cannot diverge.
_UNI_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
        idx AS (
          SELECT event_type, day, x,
                 CAST(row_number() OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS rn,
                 CAST(SUM(x) OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT) AS p
          FROM daily
        ),
        peak AS (
          SELECT event_type,
                 CAST(MIN(CASE WHEN is_max = 1 THEN rn END) AS BIGINT)
                   AS pk
          FROM (
            SELECT event_type, rn,
                   CASE WHEN x = MAX(x) OVER (PARTITION BY event_type)
                        THEN 1 ELSE 0 END AS is_max
            FROM idx
          ) t
          GROUP BY event_type
        ),
        pairs AS (
          SELECT j.event_type, j.rn AS jr, k.rn AS kr,
                 CAST(k.p - j.p + j.x AS DOUBLE)
                   / CAST(k.rn - j.rn + 1 AS DOUBLE) AS avgv
          FROM idx j JOIN idx k
            ON k.event_type = j.event_type AND k.rn >= j.rn
        ),
        upmji AS (
          SELECT p.event_type, p.jr, i.rn AS ir, MIN(p.avgv) AS m
          FROM pairs p
          JOIN peak z ON z.event_type = p.event_type
          JOIN idx i ON i.event_type = p.event_type
           AND p.jr <= i.rn AND p.kr >= i.rn
          WHERE p.kr <= z.pk AND i.rn <= z.pk
          GROUP BY 1, 2, 3
        ),
        upfit AS (
          SELECT event_type, ir, MAX(m) AS fit FROM upmji GROUP BY 1, 2
        ),
        downmji AS (
          SELECT p.event_type, p.jr, i.rn AS ir, MAX(p.avgv) AS m
          FROM pairs p
          JOIN peak z ON z.event_type = p.event_type
          JOIN idx i ON i.event_type = p.event_type
           AND p.jr <= i.rn AND p.kr >= i.rn
          WHERE p.jr > z.pk AND i.rn > z.pk
          GROUP BY 1, 2, 3
        ),
        downfit AS (
          SELECT event_type, ir, MIN(m) AS fit FROM downmji GROUP BY 1, 2
        ),
        fit AS (
          SELECT * FROM upfit UNION ALL SELECT * FROM downfit
        ),
        joined AS (
          SELECT i.event_type, i.day, i.x, i.rn, z.pk, f.fit,
                 CASE WHEN i.rn <= z.pk THEN 0 ELSE 1 END AS side
          FROM idx i
          JOIN peak z ON z.event_type = i.event_type
          JOIN fit f ON f.event_type = i.event_type AND f.ir = i.rn
        ),
        flagged AS (
          SELECT event_type, day, x, rn, pk, fit, side,
                 lag(fit) OVER (PARTITION BY event_type, side
                                ORDER BY rn) AS prevfit
          FROM joined
        )
        SELECT event_type, day, CAST(x AS BIGINT) AS x,
               CAST(pk AS BIGINT) AS peak_rn, fit,
               CAST(CASE WHEN rn = pk THEN 1 ELSE 0 END AS INTEGER)
                 AS is_peak,
               CAST(CASE WHEN prevfit IS NULL THEN 1
                         WHEN side = 0 AND fit >= prevfit THEN 1
                         WHEN side = 1 AND fit <= prevfit THEN 1
                         ELSE 0 END AS INTEGER) AS shape_ok
        FROM flagged
        ORDER BY event_type, day
"""


@register(
    "events_isotonic_unimodal",
    oracle=_UNI_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Unimodal (umbrella) isotonic regression of each event type's "
    "daily volume: mode anchored at the series argmax (ties -> "
    "earliest day), then TWO exact max-min PAVA passes meeting "
    "there — increasing fit_i = max_{j<=i} min_{i<=k<=peak} mean on "
    "the prefix and the antitonic dual min_{peak<j<=i} max_{k>=i} "
    "mean on the suffix (Robertson et al. 1988, both directions). "
    "The rise-then-decay shape a launch/campaign response curve "
    "follows, where a monotone fit would be a lie in one half. "
    "Every candidate mean is one prefix-sum difference — both "
    "engines take MIN/MAX over the IDENTICAL finite set of double "
    "divisions. Per-row shape flags audit the constraint in-gate. "
    "Scale shape: the triple space is O(series_len^3) in the "
    "30-day calendar window, not the data volume; the data-sized "
    "work is one (type, day) count.",
    tags=("events", "stats"),
)
def events_isotonic_unimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_uni")
    return spark.sql(
        _UNI_SQL.format(day_expr="ts DIV 86400000000000", src="ev_uni")
    )
