"""Round-12 gate wave #5 (pipeline35): ALTER TABLE RENAME TO scenario,
three randomness/paired rank tests (turning points, Bartels rank von
Neumann, Wilcoxon signed-rank + sign counts), and md5-deterministic
random-grid isolation scoring over embeddings.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import nonempty, register

# ------------------------------------------- RENAME TO scenario --


@register(
    "managed_rename_table",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY 1 ORDER BY 1
    """,
    doc="ALTER TABLE ... RENAME TO — Iceberg rename semantics "
    "(sql.py:_RENAME_TABLE_RE, Catalog.rename_table): ONLY the "
    "catalog identifier changes; the table location and every "
    "absolute data/manifest path already written into the metadata "
    "stay put, so snapshots, tags, time travel and subsequent "
    "writes all survive. The new identifier is a pointer "
    "(link.text), the old one a tombstone (renamed-to.text) — "
    "nothing is copied or rewritten, the rename is O(1) at any "
    "table size. Asserted in-gate: old identifier gone (including "
    "its stale temp view), tag-addressed time travel under the new "
    "name, a post-rename insert landing, and occupied-destination "
    "refusal. Aggregate hash-matches the raw oracle over the full "
    "post-rename rowset.",
    tags=("managed", "sql"),
)
def managed_rename_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-rnwh-"))
    tbl = eng.catalog.create_table(
        "g_rn_old", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    ).filter(F.col("k") % 3 == 0)
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng.sql("ALTER TABLE g_rn_old CREATE TAG evens")
    # a stale temp view for the old name exists before the rename
    assert eng.sql("SELECT COUNT(*) AS n FROM g_rn_old").collect()
    mark_setup_done()  # tagged fixture built; the rename is the op
    row = eng.sql("ALTER TABLE g_rn_old RENAME TO g_rn_new").collect()[0]
    assert row["new_name"] == "g_rn_new"
    assert not eng.catalog.table_exists("g_rn_old")
    t2 = eng.catalog.load_table("g_rn_new")
    assert "evens" in t2.meta.refs  # refs survive the rename
    t2.insert(nonempty(base.filter(F.col("k") % 2 == 1)))  # writes under new name
    n_tagged = eng.sql(
        "as of 'evens' SELECT COUNT(*) AS n FROM g_rn_new"
    ).collect()[0][0]
    n_now = eng.sql("SELECT COUNT(*) AS n FROM g_rn_new").collect()[0][0]
    assert 0 < n_tagged < n_now  # time travel to the pre-rename tag
    try:
        eng.catalog.rename_table("g_rn_new", "g_rn_new")
        raise AssertionError("occupied destination must be refused")
    except Exception as ex:
        assert "already exists" in str(ex)
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(c) AS DOUBLE) / 100.0 AS total "
        "FROM g_rn_new GROUP BY m ORDER BY m"
    )


# ---------------------------------------- turning-points test --

# tail shared with the streaming twin (plans/pipeline36.py), which
# substitutes a merged-partials `daily` head
_TP_TAIL_SQL = """
        lagged AS (
          SELECT event_type, day, x,
                 lag(x) OVER (PARTITION BY event_type ORDER BY day)
                   AS xp,
                 lead(x) OVER (PARTITION BY event_type ORDER BY day)
                   AS xn
          FROM daily
        ),
        tp AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN xp IS NOT NULL AND xn IS NOT NULL
                          AND ((x > xp AND x > xn)
                               OR (x < xp AND x < xn))
                          THEN 1 ELSE 0 END) AS BIGINT) AS t,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lagged GROUP BY event_type
        )
        SELECT event_type, n, t,
               CAST(2 * (n - 2) AS BIGINT) AS e_times3,
               CAST(16 * n - 29 AS BIGINT) AS var_times90,
               CASE WHEN 16 * n - 29 > 0
                    THEN (CAST(t AS DOUBLE)
                          - CAST(2 * (n - 2) AS DOUBLE) / 3.0)
                         / sqrt(CAST(16 * n - 29 AS DOUBLE) / 90.0)
               END AS z
        FROM tp
        ORDER BY event_type
"""

_DAILY_BATCH_HEAD = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),"""

_DAILY_STREAM_HEAD = """
        WITH daily AS (
          SELECT event_type, day, CAST(x AS BIGINT) AS x
          FROM {view}
        ),"""

_TP_SQL = _DAILY_BATCH_HEAD + _TP_TAIL_SQL


@register(
    "events_turning_points",
    oracle=_TP_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Turning-points randomness test per event type's daily series: "
    "count of STRICT local peaks/troughs (ties count as no turn — "
    "documented, since the continuous-series null assumes no ties), "
    "against the exact H0 moments E = 2(n-2)/3 and Var = "
    "(16n-29)/90, emitted as the exact integers 3E and 90Var with z "
    "as one mirrored float. Too few turns = trending/sticky, too "
    "many = oscillating faster than chance — the quickest "
    "is-this-series-random triage before reaching for "
    "autocorrelation machinery. Scale shape: one (type, day) "
    "count, one lag/lead window.",
    tags=("events", "stats"),
)
def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_tp")
    return spark.sql(
        _TP_SQL.format(day_expr="ts DIV 86400000000000", src="ev_tp")
    )


# ------------------------------------ Bartels rank von Neumann --

# tail shared with the streaming twin (plans/pipeline36.py)
_BR_TAIL_SQL = """
        ranked AS (
          SELECT event_type, day,
                 CAST(2 * RANK() OVER (PARTITION BY event_type
                        ORDER BY x)
                      + COUNT(*) OVER (PARTITION BY event_type, x)
                      - 1 AS BIGINT) AS r2
          FROM daily
        ),
        seq AS (
          SELECT event_type, r2,
                 lead(r2) OVER (PARTITION BY event_type ORDER BY day)
                   AS r2n,
                 CAST(COUNT(*) OVER (PARTITION BY event_type)
                      AS BIGINT) AS n
          FROM ranked
        ),
        agg AS (
          SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN r2n IS NOT NULL
                          THEN (r2 - r2n) * (r2 - r2n) END) AS BIGINT)
                   AS nm4,
                 CAST(SUM((r2 - (n + 1)) * (r2 - (n + 1))) AS BIGINT)
                   AS d4
          FROM seq GROUP BY event_type
        )
        SELECT event_type, n, nm4, d4,
               CASE WHEN d4 > 0
                    THEN CAST(nm4 AS DOUBLE) / CAST(d4 AS DOUBLE)
               END AS rvn
        FROM agg
        ORDER BY event_type
"""

_BR_SQL = _DAILY_BATCH_HEAD + _BR_TAIL_SQL


@register(
    "events_bartels_rank",
    oracle=_BR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Bartels rank von Neumann randomness ratio per event type: "
    "RVN = sum of squared successive rank differences over the rank "
    "sum of squares, on DOUBLED average ranks (ties stay integer; "
    "the doubling cancels in the ratio since both sums scale by 4, "
    "and the doubled mean rank is exactly n+1). RVN near 2 = "
    "random ordering; << 2 = positive serial dependence — the "
    "nonparametric sibling of Durbin-Watson that needs no trend "
    "model at all. Both sums are exact bigints; RVN is one "
    "mirrored float division. Scale shape: one (type, day) count, "
    "one rank window, one lead window.",
    tags=("events", "stats"),
)
def events_bartels_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_br")
    return spark.sql(
        _BR_SQL.format(day_expr="ts DIV 86400000000000", src="ev_br")
    )


# ------------------------------------ Wilcoxon signed-rank test --

# tail consumes diffs(day, d) — shared with the streaming twin
# (plans/pipeline36.py), which substitutes merged per-(type, day)
# partials pivoted to the same paired difference
_WSR_TAIL_SQL = """
        nz AS (SELECT day, d FROM diffs WHERE d <> 0),
        ranked AS (
          SELECT day, d, abs(d) AS ad,
                 CAST(2 * RANK() OVER (ORDER BY abs(d))
                      + COUNT(*) OVER (PARTITION BY abs(d)) - 1
                      AS BIGINT) AS r2
          FROM nz
        ),
        ties AS (
          SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT)
                   AS tie_term
          FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                FROM nz GROUP BY abs(d)) g
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END)
                      AS BIGINT) AS w2_plus,
                 CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_pos,
                 CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_neg
          FROM ranked
        )
        SELECT a.m, a.n_pos, a.n_neg, a.w2_plus, t.tie_term,
               CAST(a.m * (a.m + 1) AS BIGINT) AS e_times2,
               CAST(2 * a.m * (a.m + 1) * (2 * a.m + 1) - t.tie_term
                    AS BIGINT) AS var_times48,
               CASE WHEN 2 * a.m * (a.m + 1) * (2 * a.m + 1)
                         - t.tie_term > 0
                    THEN (CAST(2 * a.w2_plus - a.m * (a.m + 1)
                               AS DOUBLE) / 4.0)
                         / sqrt(CAST(2 * a.m * (a.m + 1)
                                     * (2 * a.m + 1) - t.tie_term
                                     AS DOUBLE) / 48.0)
               END AS z,
               CASE WHEN a.n_pos + a.n_neg > 0
                    THEN CAST(a.n_pos - a.n_neg AS DOUBLE)
                         / sqrt(CAST(a.n_pos + a.n_neg AS DOUBLE))
               END AS sign_z
        FROM agg a CROSS JOIN ties t
"""

_WSR_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
          WHERE event_type IN ('purchase', 'error')
        ),
        days AS (SELECT DISTINCT day FROM ev),
        diffs AS (
          SELECT d.day,
                 CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                                   THEN 1 ELSE 0 END), 0) AS BIGINT)
                   - CAST(COALESCE(SUM(CASE WHEN e.event_type = 'error'
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS d
          FROM days d LEFT JOIN ev e ON e.day = d.day
          GROUP BY d.day
        ),"""
    + _WSR_TAIL_SQL
)


@register(
    "events_wilcoxon_signed_rank",
    oracle=_WSR_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    ),
    doc="Wilcoxon signed-rank test on the PAIRED daily purchase-minus-"
    "error differences (zero differences dropped, per the classic "
    "procedure): |d| ranked with DOUBLED average ranks so ties stay "
    "integer, W+ summed over positive days, with exact integer "
    "moments 2E = m(m+1) and 48Var = 2m(m+1)(2m+1) - sum(t^3-t) "
    "(tie-corrected) so z is one mirrored float over exact bigints "
    "— plus the sign-test z from the same pairing as the "
    "magnitude-free cross-check. The paired sibling of the "
    "Mann-Whitney U gate: same days, same blocks, so day-level "
    "swings cancel. Scale shape: one per-day pivot, one 30-row "
    "rank window.",
    tags=("events", "stats"),
)
def events_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_wsr")
    return spark.sql(
        _WSR_SQL.format(day_expr="ts DIV 86400000000000", src="ev_wsr")
    )


# ------------------------------- random-grid isolation scoring --

_IG_TREES = 8
_IG_DEPTH = 6

# Per-(tree, level) split: dimension and threshold are md5 draws both
# engines replay bit-identically (threshold uniform inside the data's
# exact per-dim integer bounding box).  Leaf occupancy is exact; the
# isolation score (sum of own-leaf occupancies across trees) is an
# exact bigint — low score = isolated in many random grids.
_IG_MID_SQL = """
        bounds AS (
          SELECT pos, CAST(MIN(q) AS BIGINT) AS mn,
                 CAST(MAX(q) AS BIGINT) AS mx
          FROM xq GROUP BY pos
        ),
        spine AS (
          SELECT t.r AS t, l.r AS l, CAST(l.w AS BIGINT) AS w
          FROM (SELECT r FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7))
                AS tt(r)) t
          CROSS JOIN (SELECT r, w FROM (VALUES (0,1),(1,2),(2,4),(3,8),
                      (4,16),(5,32)) AS ll(r, w)) l
        ),
        splits AS (
          SELECT s.t, s.l, s.w,
                 1 + ({hdim} % 64) AS dim
          FROM spine s
        ),
        thr AS (
          SELECT s.t, s.l, s.w, s.dim,
                 b.mn + ({hthr} % (b.mx - b.mn + 1)) AS cut
          FROM splits s JOIN bounds b ON b.pos = s.dim
        ),
        bits AS (
          SELECT x.vid, s.t,
                 CAST(SUM(CASE WHEN x.q > s.cut THEN s.w ELSE 0 END)
                      AS BIGINT) AS leaf
          FROM xq x JOIN thr s ON s.dim = x.pos
          GROUP BY x.vid, s.t
        ),
        occ AS (
          SELECT t, leaf, CAST(COUNT(*) AS BIGINT) AS o
          FROM bits GROUP BY t, leaf
        ),
        score AS (
          SELECT b.vid, CAST(SUM(o.o) AS BIGINT) AS score
          FROM bits b JOIN occ o ON o.t = b.t AND o.leaf = b.leaf
          GROUP BY b.vid
        ),
        topk AS (
          SELECT vid, score,
                 row_number() OVER (ORDER BY score, vid) AS rnk
          FROM score
        )
        SELECT vid, score, CAST(rnk AS BIGINT) AS rnk
        FROM topk WHERE rnk <= 20
        ORDER BY rnk
"""

_IG_HDIM_SPARK = (
    "CAST(conv(substring(md5(concat('ig:dim:', CAST(s.t AS STRING), ':',"
    " CAST(s.l AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)
_IG_HDIM_DUCK = (
    "CAST('0x' || substr(md5('ig:dim:' || CAST(s.t AS VARCHAR) || ':'"
    " || CAST(s.l AS VARCHAR)), 1, 13) AS BIGINT)"
)
_IG_HTHR_SPARK = (
    "CAST(conv(substring(md5(concat('ig:thr:', CAST(s.t AS STRING), ':',"
    " CAST(s.l AS STRING))), 1, 13), 16, 10) AS BIGINT)"
)
_IG_HTHR_DUCK = (
    "CAST('0x' || substr(md5('ig:thr:' || CAST(s.t AS VARCHAR) || ':'"
    " || CAST(s.l AS VARCHAR)), 1, 13) AS BIGINT)"
)


def _ig_oracle() -> str:
    return (
        """
        WITH xq AS MATERIALIZED (
          SELECT vec_id AS vid, i AS pos,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT)
                   + 2000000 AS q
          FROM embeddings
          CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g
        ),
"""
        + _IG_MID_SQL.format(hdim=_IG_HDIM_DUCK, hthr=_IG_HTHR_DUCK)
    )


@register(
    "emb_isolation_grid",
    oracle=_ig_oracle(),
    doc="Random-grid isolation scoring over the embedding table — the "
    "exact-arithmetic cousin of Isolation Forest: 8 'trees' of 6 "
    "md5-drawn (dimension, threshold) splits (thresholds uniform "
    "inside the data's exact integer bounding box — the "
    "deterministic-coin discipline) assign every vector a 6-bit "
    "leaf per tree; a vector's isolation score is the exact bigint "
    "sum of its own leaves' occupancies across trees, and the 20 "
    "lowest-score vectors are the anomaly shortlist (isolated in "
    "many independent random grids = anomalous, the iForest "
    "insight without its data-dependent recursion). Everything is "
    "exact integers. Scale shape: one 48-row split spine broadcast "
    "against the corpus, two linear aggregates — no pairwise "
    "anything, unlike LOF/kdist this one runs UNCAPPED.",
    tags=("embeddings", "curation", "stats"),
)
def emb_isolation_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    emb = ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    )
    emb.select(
        F.col("vec_id").alias("vid"),
        F.posexplode(F.col("embedding")).alias("pos0", "val"),
    ).select(
        "vid",
        (F.col("pos0") + 1).alias("pos"),
        (
            F.expr("CAST(round(CAST(val AS DOUBLE) * 1000000) AS BIGINT)")
            + 2000000
        ).alias("q"),
    ).createOrReplaceTempView("xq")
    return spark.sql(
        "WITH "
        + _IG_MID_SQL.format(
            hdim=_IG_HDIM_SPARK, hthr=_IG_HTHR_SPARK
        ).lstrip()
    )
