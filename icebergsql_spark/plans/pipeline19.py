"""Round-11 gate wave #2 (pipeline19): rename/clone interplay, the
drawdown streaming twin, and a classical-stats battery (one-way ANOVA,
Benjamini-Hochberg FDR, Tukey fences) plus audio spectral flux.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebergsql_spark.plans.registry import (
    events_min_day,
    nonempty,
    register,
    run_partial_stream,
)


# --------------------------------------- clone of a renamed source --


@register(
    "managed_clone_renamed_source",
    oracle="""
        SELECT year(o_orderdate) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY 1 ORDER BY 1
    """,
    doc="CREATE TABLE LIKE x ALTER TABLE RENAME COLUMN interplay: a "
    "source whose live files span TWO schema eras (half written "
    "before a column rename, half after) must REFUSE a shallow clone "
    "— the old files carry the pre-rename physical column name, and "
    "the clone's fresh field-id space has no era mapping for them "
    "(silent data corruption if registered naively). The gate asserts "
    "the refusal, then rewrite_data_files (compact) collapses every "
    "live file into the current era, the clone succeeds zero-copy, "
    "and the CLONE's cross-era aggregate hash-matches the raw oracle. "
    "The lifecycle guard that makes metadata-only renames and "
    "Delta-style shallow clones composable.",
    tags=("managed", "schema-evolution", "sql"),
)
def managed_clone_renamed_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.operators.util import mark_setup_done
    from icebergsql_spark.sql import Engine

    eng = Engine(spark, tempfile.mkdtemp(prefix="icebergsql-crnwh-"))
    tbl = eng.catalog.create_table(
        "src_crn", "k bigint, c bigint, m int", partition_cols=["m"]
    )
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("k"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        F.year("o_orderdate").alias("m"),
    )
    tbl.insert(nonempty(base.filter(F.col("k") % 2 == 0)))
    eng.sql("ALTER TABLE src_crn RENAME COLUMN c TO val")
    tbl.insert(
        nonempty(base.filter(F.col("k") % 2 == 1).withColumnRenamed("c", "val")))
    mark_setup_done()  # two-era source built; refusal + compact + clone op
    cur_sid = tbl.meta.current_schema_id
    assert any(
        f.schema_id != cur_sid
        for f in tbl.meta.current_snapshot().live_files()
    ), "fixture must span two schema eras"
    try:
        eng.sql("CREATE TABLE dst_crn LIKE src_crn WITH DATA")
        raise AssertionError(
            "clone of a multi-era source must be refused"
        )
    except ValueError as ex:
        assert "schema eras" in str(ex)
    tbl.compact(target_file_size=1 << 40, min_input_files=2)
    tbl.refresh()
    assert all(
        f.schema_id == tbl.meta.current_schema_id
        for f in tbl.meta.current_snapshot().live_files()
    ), "compact must collapse eras"
    res = eng.sql("CREATE TABLE dst_crn LIKE src_crn WITH DATA")
    assert res.collect()[0]["added_files_count"] > 0
    return eng.sql(
        "SELECT m, COUNT(*) AS n, "
        "CAST(SUM(val) AS DOUBLE) / 100.0 AS total "
        "FROM dst_crn GROUP BY m ORDER BY m"
    )


# ------------------------------------ streaming max-drawdown twin --


def _drawdown_oracle() -> str:
    from icebergsql_spark.plans.pipeline18 import _DRAWDOWN_SQL

    return _DRAWDOWN_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events"
    )


@register(
    "events_stream_max_drawdown",
    oracle=_drawdown_oracle(),
    doc="STREAMING twin of events_max_drawdown: each of 3 chronological "
    "micro-batches appends per-day net-flow partials (purchase cents "
    "minus error cents — SUM-mergeable, replay/chopping safe) to a "
    "parquet sink; the finalizer merges per day and runs the "
    "IDENTICAL cumulative/peak/drawdown tail SQL (shared template "
    "with the batch gate). The live risk readout converging to the "
    "batch answer bit-for-bit.",
    tags=("events", "streaming", "stats"),
)
def events_stream_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from icebergsql_spark.plans.pipeline18 import _DRAWDOWN_TAIL_SQL
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    src = tempfile.mkdtemp(prefix="icebergsql-mddsrc-")
    out = tempfile.mkdtemp(prefix="icebergsql-mddout-")
    day = F.expr("ts DIV 86400000000000")
    d0 = events_min_day(f"{sf_dir}/events.parquet", spark)
    for lo, hi in ((0, 10), (10, 20), (20, 1 << 40)):
        chunk = ev.filter((day >= d0 + lo) & (day < d0 + hi))
        chunk.coalesce(1).write.mode("append").parquet(src)

    def fold(batch_df, batch_id):
        (
            batch_df.select(
                F.expr("ts DIV 86400000000000").alias("day"),
                "event_type",
                "value",
            )
            .groupBy("day")
            .agg(
                F.sum(
                    F.expr(
                        "CASE WHEN event_type = 'purchase'"
                        " THEN CAST(ROUND(value * 100) AS BIGINT)"
                        " WHEN event_type = 'error'"
                        " THEN -CAST(ROUND(value * 100) AS BIGINT)"
                        " ELSE 0 END"
                    )
                ).cast("bigint").alias("flow")
            )
            .write.mode("append")
            .parquet(out)
        )

    run_partial_stream(spark, src, ev.schema, fold, "icebergsql-mddck-")
    (
        spark.read.parquet(out)
        .groupBy("day")
        .agg(F.sum("flow").cast("bigint").alias("flow"))
        .createOrReplaceTempView("mdd_partials")
    )
    return spark.sql(
        """
        WITH daily AS (SELECT day, flow FROM mdd_partials),
"""
        + _DRAWDOWN_TAIL_SQL
    )


# ------------------------------------------------ one-way ANOVA --

# Per-type daily counts over a (type x day) spine, so every group has
# the SAME n_g = n_days — which makes both sums of squares exact
# integer rationals with a single denominator:
#   SSB * nd * N = N * sum(s_g^2) - nd * T^2
#   SSW * nd    = nd * SS - sum(s_g^2)
#   F = (N*sum(s_g^2) - nd*T^2) * (N-k) / (N * (k-1) * (nd*SS - sum(s_g^2)))
# so f_num / f_den are exact bigints and the only float op is the one
# mirrored final division.
_ANOVA_TAIL_SQL = """
        types AS (SELECT DISTINCT event_type FROM cnt),
        days AS (SELECT DISTINCT day FROM cnt),
        daily AS (
          SELECT t.event_type, d.day,
                 CAST(COALESCE(cnt.c, 0) AS BIGINT) AS x
          FROM types t CROSS JOIN days d
          LEFT JOIN cnt ON cnt.event_type = t.event_type
                       AND cnt.day = d.day
        ),
        grp AS (
          SELECT event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_g,
                 CAST(SUM(x) AS BIGINT) AS s_g,
                 CAST(SUM(x * x) AS BIGINT) AS ss_g
          FROM daily GROUP BY event_type
        ),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(n_g) AS BIGINT) AS n,
                 CAST(SUM(n_g) {div} COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(s_g) AS BIGINT) AS t,
                 CAST(SUM(ss_g) AS BIGINT) AS ss,
                 CAST(SUM(s_g * s_g) AS BIGINT) AS sg2
          FROM grp
        )
        SELECT grp.event_type, grp.n_g, grp.s_g, grp.ss_g,
               CAST((tot.n * tot.sg2 - tot.nd * tot.t * tot.t)
                    * (tot.n - tot.k) AS BIGINT) AS f_num,
               CAST(tot.n * (tot.k - 1)
                    * (tot.nd * tot.ss - tot.sg2) AS BIGINT) AS f_den,
               CAST((tot.n * tot.sg2 - tot.nd * tot.t * tot.t)
                    * (tot.n - tot.k) AS DOUBLE)
                 / CAST(tot.n * (tot.k - 1)
                        * (tot.nd * tot.ss - tot.sg2) AS DOUBLE)
                 AS f_stat
        FROM grp CROSS JOIN tot
        ORDER BY grp.event_type
"""

# the batch query = raw-events head + the shared tail; the streaming twin
# (plans/pipeline20.py::events_stream_anova) substitutes a merged-partials
# `cnt` head and reuses _ANOVA_TAIL_SQL verbatim
_ANOVA_SQL = (
    """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        cnt AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2
        ),
"""
    + _ANOVA_TAIL_SQL
)


@register(
    "events_anova_oneway",
    oracle=_ANOVA_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000", src="events", div="//"
    ),
    doc="One-way ANOVA F-statistic across the five event types' daily "
    "volume series (does traffic level differ by surface?): the "
    "(type x day) spine guarantees equal group sizes, which folds "
    "between/within sums of squares into EXACT bigint numerator and "
    "denominator (emitted) — the F value itself is the single "
    "mirrored float division. Per-group sufficient statistics ride "
    "along exact. The classical k-sample location test that "
    "complements the pairwise Welch battery. Scale shape: one "
    "(type, day) count, a 5-row group aggregate, a 1-row total.",
    tags=("events", "stats"),
)
def events_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_anova")
    return spark.sql(
        _ANOVA_SQL.format(
            day_expr="ts DIV 86400000000000", src="ev_anova", div="DIV"
        )
    )


# ------------------------------------- Benjamini-Hochberg FDR --

# Two-sided normal critical values for BH at alpha = 0.05 over m = 5
# hypotheses: rank r rejects when p <= 0.05*r/5, i.e. |z| >= z_crit(r)
# with z_crit = Phi^-1(1 - 0.05*r/10). Standard published quantiles —
# fixed literals consumed identically by both engines (the Lan-DeMets
# 2.004 discipline).
_BH_CRIT = {
    1: "2.5758293035489004",
    2: "2.3263478740408408",
    3: "2.170090378034251",
    4: "2.0537489106318225",
    5: "1.959963984540054",
}

# tail shared with the streaming twin (plans/pipeline20.py::
# events_stream_bh_fdr), which substitutes a merged-partials head
# providing the same users/armn/ucnt contract
_BH_TAIL_SQL = """
        g AS (
          SELECT event_type, arm,
                 CAST(SUM(c) AS BIGINT) AS s,
                 CAST(SUM(c * c) AS BIGINT) AS ss
          FROM ucnt GROUP BY 1, 2
        ),
        wide AS (
          SELECT g.event_type,
                 MAX(CASE WHEN g.arm = 0 THEN g.s END) AS s0,
                 MAX(CASE WHEN g.arm = 0 THEN g.ss END) AS ss0,
                 MAX(CASE WHEN g.arm = 1 THEN g.s END) AS s1,
                 MAX(CASE WHEN g.arm = 1 THEN g.ss END) AS ss1,
                 MAX(CASE WHEN a.arm = 0 THEN a.n END) AS n0,
                 MAX(CASE WHEN a.arm = 1 THEN a.n END) AS n1
          FROM g CROSS JOIN armn a
          GROUP BY g.event_type
        ),
        z AS (
          SELECT event_type, n0, n1, s0, s1, ss0, ss1,
                 abs(
                   (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
                   / sqrt(
                       ((CAST(ss1 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST(n1 AS DOUBLE))
                        / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
                     + ((CAST(ss0 AS DOUBLE)
                         - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)
                           / CAST(n0 AS DOUBLE))
                        / CAST(n0 - 1 AS DOUBLE)) / CAST(n0 AS DOUBLE)
                   )
                 ) AS absz
          FROM wide
        ),
        ranked AS (
          SELECT z.*,
                 CAST(row_number() OVER (ORDER BY absz DESC, event_type)
                      AS BIGINT) AS rk
          FROM z
        ),
        crit AS (
          SELECT ranked.*,
                 CASE rk WHEN 1 THEN CAST({c1} AS DOUBLE)
                         WHEN 2 THEN CAST({c2} AS DOUBLE)
                         WHEN 3 THEN CAST({c3} AS DOUBLE)
                         WHEN 4 THEN CAST({c4} AS DOUBLE)
                         WHEN 5 THEN CAST({c5} AS DOUBLE) END AS z_crit
          FROM ranked
        ),
        cutoff AS (
          SELECT MAX(CASE WHEN absz >= z_crit THEN rk END) AS rstar
          FROM crit
        )
        SELECT crit.event_type, crit.rk, crit.n0, crit.n1,
               crit.s0, crit.s1, crit.ss0, crit.ss1,
               crit.absz, crit.z_crit,
               CAST(CASE WHEN cutoff.rstar IS NOT NULL
                         AND crit.rk <= cutoff.rstar
                    THEN 1 ELSE 0 END AS INTEGER) AS rejected
        FROM crit CROSS JOIN cutoff
        ORDER BY crit.rk
"""

_BH_SQL = (
    """
        WITH ev AS (
          SELECT user_id, event_type FROM {src}
        ),
        users AS (
          SELECT DISTINCT user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm
          FROM ev
        ),
        armn AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n
          FROM users GROUP BY arm
        ),
        ucnt AS (
          SELECT event_type, user_id,
                 CAST(user_id % 2 AS INTEGER) AS arm,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM ev GROUP BY 1, 2, 3
        ),
"""
    + _BH_TAIL_SQL
)


@register(
    "events_bh_fdr",
    oracle=_BH_SQL.format(
        src="events",
        c1=_BH_CRIT[1],
        c2=_BH_CRIT[2],
        c3=_BH_CRIT[3],
        c4=_BH_CRIT[4],
        c5=_BH_CRIT[5],
    ),
    doc="Benjamini-Hochberg FDR control over the per-event-type A/B "
    "battery (Benjamini & Hochberg 1995): per type, a Welch-style "
    "z on mean events-per-user by arm (zero-count users enter "
    "through the all-users denominators, so the sufficient "
    "statistics stay exact bigints), then |z| ranks descending "
    "(equivalent to ascending p) and rank r rejects iff "
    "|z| >= Phi^-1(1 - 0.05r/10) — fixed published quantile "
    "literals; all hypotheses at or above the largest passing rank "
    "reject (the step-up rule). The multiple-testing governance an "
    "experimentation platform applies before anyone ships five "
    "per-surface 'wins'. Mirrored sqrt/div floats, deterministic "
    "(absz, type) rank order.",
    tags=("events", "stats"),
)
def events_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_bh")
    return spark.sql(
        _BH_SQL.format(
            src="ev_bh",
            c1=_BH_CRIT[1],
            c2=_BH_CRIT[2],
            c3=_BH_CRIT[3],
            c4=_BH_CRIT[4],
            c5=_BH_CRIT[5],
        )
    )


# ------------------------------------------ audio spectral flux --

_FLUX_MAX_DOC = 400
# basis scale 256 (not the default 16384): power <= (n*amp*scale)^2*2
# ~ 2^49 per (win, bin), so the doc- and class-level flux sums stay
# far inside int64 (the default scale would put a single power at
# ~2^61 and the class rollup past the bigint range)
_FLUX_SCALE = 256


def _flux_oracle() -> str:
    from icebergsql_spark.operators.multimodal import dft_coef_values_sql
    from icebergsql_spark.plans.pipeline16 import _TONE_BINS
    from icebergsql_spark.plans.pipeline18 import (
        _GOER_AMP,
        _GOER_N,
        _GOER_WINS,
    )

    half_p = (
        "CASE (doc_id + win * (doc_id % 2)) % 3"
        " WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 8 END"
    )
    return f"""
        WITH coef(k, i, cq, sq) AS (
          VALUES {dft_coef_values_sql(_GOER_N, _TONE_BINS, _FLUX_SCALE)}
        ),
        samp AS MATERIALIZED (
          SELECT doc_id, w.win AS win, i.i AS i,
                 CASE WHEN ((i.i // ({half_p})) % 2) = 0
                      THEN {_GOER_AMP} ELSE -{_GOER_AMP} END AS s
          FROM documents
          CROSS JOIN (SELECT unnest(generate_series(0, {_GOER_WINS - 1}))
                      AS win) w
          CROSS JOIN (SELECT unnest(generate_series(0, {_GOER_N - 1}))
                      AS i) i
          WHERE doc_id < {_FLUX_MAX_DOC}
        ),
        pw AS MATERIALIZED (
          SELECT samp.doc_id, samp.win, coef.k,
                 CAST(SUM(samp.s * coef.cq) AS BIGINT) AS re,
                 CAST(SUM(samp.s * coef.sq) AS BIGINT) AS im
          FROM samp JOIN coef ON coef.i = samp.i
          GROUP BY 1, 2, 3
        ),
        flux_bin AS MATERIALIZED (
          SELECT doc_id, win, k,
                 abs(re * re + im * im
                     - lag(re * re + im * im) OVER (
                         PARTITION BY doc_id, k ORDER BY win))
                   AS df
          FROM pw
        ),
        flux_win AS MATERIALIZED (
          SELECT doc_id, win, CAST(SUM(df) AS BIGINT) AS flux
          FROM flux_bin WHERE df IS NOT NULL
          GROUP BY doc_id, win
        ),
        per_doc AS MATERIALIZED (
          SELECT doc_id,
                 CAST(SUM(flux) AS BIGINT) AS total_flux,
                 CAST(SUM(CASE WHEN flux > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_onsets
          FROM flux_win GROUP BY doc_id
        )
        SELECT CAST(doc_id % 2 AS INTEGER) AS hopping,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(total_flux) AS BIGINT) AS sum_flux,
               CAST(MAX(total_flux) AS BIGINT) AS max_flux,
               CAST(SUM(n_onsets) AS BIGINT) AS sum_onsets
        FROM per_doc
        GROUP BY 1 ORDER BY 1
    """


@register(
    "multimodal_audio_spectral_flux",
    oracle=_flux_oracle(),
    doc="Spectral-flux onset detection over REAL WAV payloads: per "
    "sliding window position the exact-integer DFT powers at the "
    "probe bins (audio_tone_windows), then flux = sum over bins of "
    "|p(w) - p(w-1)| — the standard onset/novelty function, here an "
    "exact bigint. Even docs plant a CONSTANT tone (flux exactly 0, "
    "zero onsets), odd docs hop frequency every window (two onsets "
    "each) — the detector separates the classes with no threshold "
    "tuning. What an audio-curation pipeline runs to find scene/"
    "segment boundaries before chunking. Oracle replays the planted "
    "samples against the same VALUES coefficients.",
    tags=("multimodal", "curation"),
)
def multimodal_audio_spectral_flux(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.pipeline16 import _TONE_BINS
    from icebergsql_spark.plans.pipeline18 import (
        _GOER_AMP,
        _GOER_HOPS,
        _GOER_N,
        _GOER_WINS,
    )
    from icebergsql_spark.plans.registry import load_tables

    docs = ensure_parallelism(
        load_tables(spark, sf_dir, ("documents",))["documents"]
        .filter(F.col("doc_id") < _FLUX_MAX_DOC)
        .select("doc_id")
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                samples = []
                for j in range(_GOER_WINS):
                    half_p = _GOER_HOPS[(d + j * (d % 2)) % 3]
                    samples.extend(
                        _GOER_AMP if (i // half_p) % 2 == 0 else -_GOER_AMP
                        for i in range(_GOER_N)
                    )
                payloads.append(multimodal.encode_wav(samples, 16000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    multimodal.audio_tone_windows(
        blobs, n=_GOER_N, hop=_GOER_N, bins=_TONE_BINS, scale=_FLUX_SCALE
    ).createOrReplaceTempView("flux_pw")
    return spark.sql("""
        WITH flux_bin AS (
          SELECT doc_id, win, bin,
                 abs(power - lag(power) OVER (
                       PARTITION BY doc_id, bin ORDER BY win)) AS df
          FROM flux_pw
        ),
        flux_win AS (
          SELECT doc_id, win, CAST(SUM(df) AS BIGINT) AS flux
          FROM flux_bin WHERE df IS NOT NULL
          GROUP BY doc_id, win
        ),
        per_doc AS (
          SELECT doc_id,
                 CAST(SUM(flux) AS BIGINT) AS total_flux,
                 CAST(SUM(CASE WHEN flux > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_onsets
          FROM flux_win GROUP BY doc_id
        )
        SELECT CAST(doc_id % 2 AS INT) AS hopping,
               COUNT(*) AS n_docs,
               CAST(SUM(total_flux) AS BIGINT) AS sum_flux,
               CAST(MAX(total_flux) AS BIGINT) AS max_flux,
               CAST(SUM(n_onsets) AS BIGINT) AS sum_onsets
        FROM per_doc
        GROUP BY doc_id % 2 ORDER BY hopping
    """)


# ------------------------------------------- Tukey fence outliers --

_TUKEY_SQL = """
        WITH ev AS (
          SELECT event_type, {day_expr} AS day FROM {src}
        ),
        daily AS (
          SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2
        ),
        q AS (
          SELECT event_type,
                 {q1} AS q1,
                 {q3} AS q3
          FROM daily GROUP BY event_type
        ),
        fence AS (
          SELECT event_type, q1, q3,
                 q1 - (CAST(3 AS DOUBLE) / 2.0) * (q3 - q1) AS lo,
                 q3 + (CAST(3 AS DOUBLE) / 2.0) * (q3 - q1) AS hi
          FROM q
        ),
        flags AS (
          SELECT d.event_type, d.day, d.x, f.q1, f.q3, f.lo, f.hi,
                 CASE WHEN CAST(d.x AS DOUBLE) < f.lo
                        OR CAST(d.x AS DOUBLE) > f.hi
                      THEN 1 ELSE 0 END AS is_out
          FROM daily d JOIN fence f ON f.event_type = d.event_type
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(is_out) AS BIGINT) AS n_outliers,
               MIN(q1) AS q1, MIN(q3) AS q3,
               MIN(lo) AS lo, MIN(hi) AS hi,
               CAST(MIN(x) AS BIGINT) AS min_x,
               CAST(MAX(x) AS BIGINT) AS max_x,
               {outdays} AS outlier_days
        FROM flags
        GROUP BY event_type
        ORDER BY event_type
"""


@register(
    "events_tukey_fences_outliers",
    oracle=_TUKEY_SQL.format(
        day_expr="epoch_ns(ts) // 86400000000000",
        src="events",
        q1="quantile_cont(x, 0.25)",
        q3="quantile_cont(x, 0.75)",
        outdays="COALESCE(string_agg(CASE WHEN is_out = 1 THEN "
        "CAST(day AS VARCHAR) END, ',' ORDER BY day), '')",
    ),
    doc="Tukey-fence outlier audit of the per-type daily volume series: "
    "per type the interquartile range from the linearly interpolated "
    "quartiles (Spark percentile == DuckDB quantile_cont), fences at "
    "1.5 IQR, days outside flagged and emitted as a sorted "
    "comma-joined list next to exact min/max/counts — the boxplot "
    "rule every telemetry dashboard draws, robust where z-scores "
    "break (a single 10x day inflates the stddev it is tested "
    "against, but not the quartiles). Mirrored float fences; counts "
    "exact. Scale shape: one (type, day) count, one 5-group quantile "
    "aggregate.",
    tags=("events", "stats"),
)
def events_tukey_fences_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    events_ts_to_nanos(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).createOrReplaceTempView("ev_tukey")
    return spark.sql(
        _TUKEY_SQL.format(
            day_expr="ts DIV 86400000000000",
            src="ev_tukey",
            q1="percentile(x, CAST(25 AS DOUBLE) / 100.0)",
            q3="percentile(x, CAST(75 AS DOUBLE) / 100.0)",
            outdays="COALESCE(array_join(transform(array_sort("
            "collect_list(CASE WHEN is_out = 1 THEN day END)), "
            "d -> CAST(d AS STRING)), ','), '')",
        )
    )
