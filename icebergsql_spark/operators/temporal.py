"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Named explicitly in the build brief as custom-operator targets. Both are
compositions of existing DataFrame ops (no UDFs):

  - as-of join: for each left row, the single latest right row with
    right.ts <= left.ts per key. Implemented with the union-sort trick:
    union both sides tagged, sort per key by time, carry the last right
    value forward with a window `last(ignorenulls)` — one shuffle on the
    key, NO range-join blowup. This is the standard large-scale as-of plan
    (a naive equi-join + filter + row_number materializes every candidate
    pair; the union form touches each row once).
  - range join: all pairs within a time window per key — an equi-join on
    the key with the range predicate in the join condition so Catalyst
    evaluates it during the join.

Scale: both shuffle once on the join key; the as-of union-sort form is
linear in input size. Skewed keys (one hot user) fall back to AQE skew
handling or operators/skew.py salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns of the latest right row with
    right_ts <= left_ts for the same key (nulls when no prior right row).

    Tie rule: a right row at exactly left_ts matches (<=), and when several
    right rows share one timestamp the LAST in (ts, is_left) sort order
    wins — deterministic given unique (key, ts) pairs per side.
    """
    lt = left.withColumn("__is_left", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt_cols = [F.col(c).alias(f"__r_{c}") for c in right_cols]
    rt = (
        right.select(F.col(key), F.col(right_ts).alias("__ts"), *rt_cols)
        .withColumn("__is_left", F.lit(0))
    )
    lt_aligned = lt.select(
        *[F.col(c) for c in left.columns],
        "__ts",
        "__is_left",
        *[F.lit(None).cast(rt.schema[f"__r_{c}"].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    rt_aligned = rt.select(
        *[
            F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        "__ts",
        "__is_left",
        *[F.col(f"__r_{c}") for c in right_cols],
    )
    unioned = lt_aligned.unionByName(rt_aligned)
    # right rows sort BEFORE left rows at the same __ts so `<=` semantics
    # hold; last(ignorenulls) carries the most recent right value forward
    w = (
        W.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        "__is_left",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_delta,
    upper_delta,
) -> DataFrame:
    """Pairs with right_ts in [left_ts + lower_delta, left_ts + upper_delta)
    per key. The range rides in the join condition (evaluated during the
    hash join, not as a post-filter on a cross product)."""
    lo = F.col(f"l.{left_ts}") + F.lit(lower_delta)
    hi = F.col(f"l.{left_ts}") + F.lit(upper_delta)
    return left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= lo)
        & (F.col(f"r.{right_ts}") < hi),
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    within_ns: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users completed step 1, steps 1-2,
    ... steps 1-k, where each step's event must be strictly later than the
    previous step's and (optionally) within ``within_ns`` of the FIRST
    step — the greedy earliest-match semantics every funnel tool uses
    (equivalent to the iterated min-after-previous join formulation, which
    the DuckDB oracle runs).

    Scale shape: filter to the k step types, ONE shuffle keyed by user to
    build each user's time-sorted event array, then a codegen'd
    ``aggregate()`` fold walks the sequence — O(events) total, no joins,
    no per-step passes. The per-user array is bounded by that user's step
    events (hot users are data skew, not key explosion; cap with a
    per-user event limit upstream if a bot user can log millions).
    """
    k = len(steps)
    steps_sql = ", ".join(f"'{s}'" for s in steps)
    ev = events.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("typ"),
    )
    per_user = ev.groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("ts", "typ"))).alias("evs")
    )
    window_ok = (
        "true" if within_ns is None else f"e.ts - s.start <= {int(within_ns)}"
    )
    fold = F.expr(
        f"""aggregate(
              evs,
              struct(0 AS matched, CAST(-1 AS BIGINT) AS last,
                     CAST(-1 AS BIGINT) AS start),
              (s, e) -> IF(
                s.matched < {k}
                AND e.typ = element_at(array({steps_sql}), s.matched + 1)
                AND (s.matched = 0 OR (e.ts > s.last AND {window_ok})),
                struct(s.matched + 1 AS matched, e.ts AS last,
                       IF(s.matched = 0, e.ts, s.start) AS start),
                s))"""
    )
    depth = per_user.select(fold.getField("matched").alias("m"))
    agg = depth.agg(
        *[
            F.sum((F.col("m") >= i).cast("long")).alias(f"u{i}")
            for i in range(1, k + 1)
        ]
    )
    stack = ", ".join(f"{i}, '{s}', u{i}" for i, s in enumerate(steps, 1))
    return agg.select(
        F.expr(f"stack({k}, {stack}) AS (stage, step, users)")
    ).orderBy("stage")


def cohort_retention(
    events: DataFrame,
    max_offset: int = 7,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day, counted
    on each subsequent day they return — the standard product-analytics
    rollup (and, for a training pipeline, the freshness/recurrence profile
    of a crawled source).

    ``ts_col`` is bigint epoch NANOS (the events table's raw form); day
    bucketing is pure integer arithmetic so results are timezone-free.

    Scale shape: one distinct over (user, day) — the only corpus-sized
    shuffle, keyed by user+day so no hot keys; the per-user first-day
    aggregate and the join back are both keyed by user (AQE coalesces the
    exchange); the final matrix is tiny (days × offsets). No window
    functions, no Python.
    """
    day = F.floor(F.col(ts_col) / F.lit(86_400_000_000_000)).cast("int")
    user_days = events.select(
        F.col(user_col).alias("u"), day.alias("day")
    ).distinct()
    cohorts = user_days.groupBy("u").agg(F.min("day").alias("cohort_day"))
    return (
        user_days.join(cohorts, "u")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy(
            F.date_format(
                F.date_from_unix_date(F.col("cohort_day")), "yyyy-MM-dd"
            ).alias("cohort"),
            "day_offset",
        )
        .agg(F.count_distinct(F.col("u")).alias("n_users"))
        .orderBy("cohort", "day_offset")
    )

def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance,
) -> DataFrame:
    """Nearest-match as-of join: for each left row, the right timestamp
    closest in EITHER direction within ``tolerance`` (ties prefer the
    earlier/backward match; a right row at exactly left_ts counts as
    backward). Returns the left columns plus ``nearest_ts`` (nullable).

    Pandas calls this ``merge_asof(direction='nearest')``; Spark has no
    built-in. Same union-sort shape as :func:`asof_join` — ONE shuffle on
    the key, then two window frames over the SAME sort order (carry last
    prior right ts backward, first following right ts forward), so the
    sort/exchange is reused and no candidate pair set is ever
    materialized. Linear in input size at any scale.
    """
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    rt = right.select(
        F.col(key),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != key
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__r_ts"),
    ).select(*[F.col(c) for c in left.columns], "__ts", "__is_left", "__r_ts")
    unioned = lt.unionByName(rt)
    order = [F.col("__ts"), F.col("__is_left")]
    w_back = (
        W.partitionBy(key).orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(key).orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        "__ts",
        "__is_left",
        F.last("__r_ts", ignorenulls=True).over(w_back).alias("__prev"),
        F.first("__r_ts", ignorenulls=True).over(w_fwd).alias("__next"),
    ).filter(F.col("__is_left") == 1)
    back_gap = F.col("__ts") - F.col("__prev")
    fwd_gap = F.col("__next") - F.col("__ts")
    back_ok = F.col("__prev").isNotNull() & (back_gap <= F.lit(tolerance))
    fwd_ok = F.col("__next").isNotNull() & (fwd_gap <= F.lit(tolerance))
    nearest = (
        F.when(back_ok & (~fwd_ok | (back_gap <= fwd_gap)), F.col("__prev"))
        .when(fwd_ok, F.col("__next"))
        .otherwise(F.lit(None))
    )
    return carried.select(
        *[F.col(c) for c in left.columns], nearest.alias("nearest_ts")
    )


def markov_removal_effect(
    events: DataFrame,
    conv_type: str = "purchase",
    steps: int = 8,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Markov-chain removal-effect attribution over per-user event paths.

    The standard data-driven attribution model: each user's event
    sequence (ordered by (ts, id), truncated at the FIRST conversion)
    becomes a path START -> channel -> ... -> {CONV | NULL}; first-order
    transition probabilities are estimated from pair counts; a channel's
    removal effect is how much the chain's conversion probability drops
    when that channel's outgoing mass is redirected to NULL:
    ``removal_ppm = (P_base - P_removed) * 1e6 / P_base``.

    Determinism contract: transition probabilities are exact ppm integers
    (count * 1e6 DIV row-total), the absorption probability is a fixed
    ``steps``-step integer recurrence (mass products floor-divide by 1e6
    identically in any engine), so the result is a pure function of the
    data — reproducible by a recursive-CTE oracle.

    Scale shape: ONE shuffle builds the (cur, next) pair counts; the
    transition matrix after that aggregate is bounded at (channels+2)^2
    rows — pure metadata, never event volume — so it is collected ONCE
    and the per-channel absorption re-solves run in pure Python integer
    arithmetic (the bounded-collect pattern of similarity.mmr_select).
    The old shape — steps x (channels+1) tiny Spark jobs with a
    per-step ``.collect()`` — spent ~9s of scheduler round-trips to
    propagate a 6-state chain.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, id_col)
    seq = events.select(
        F.col(user_col).alias("u"),
        F.when(F.col(type_col) == conv_type, F.lit("CONV"))
        .otherwise(F.col(type_col))
        .alias("state"),
        F.row_number().over(w).alias("rn"),
    )
    conv_rn = seq.filter(F.col("state") == "CONV").groupBy("u").agg(
        F.min("rn").alias("crn")
    )
    path = (
        seq.join(conv_rn, "u", "left")
        .filter(F.col("crn").isNull() | (F.col("rn") <= F.col("crn")))
        .withColumn(
            "nxt",
            F.lead("state").over(W.partitionBy("u").orderBy("rn")),
        )
    )
    # START -> first state, interior pairs, dangling last state -> NULL
    trans_rows = (
        path.filter(F.col("rn") == 1)
        .select(F.lit("START").alias("cur"), F.col("state").alias("nxt"))
        .unionAll(
            path.filter(F.col("nxt").isNotNull()).select(
                F.col("state").alias("cur"), "nxt"
            )
        )
        .unionAll(
            path.filter(F.col("nxt").isNull() & (F.col("state") != "CONV"))
            .select(F.col("state").alias("cur"), F.lit("NULL").alias("nxt"))
        )
    )
    counts = trans_rows.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    totals = counts.groupBy("cur").agg(F.sum("c").cast("bigint").alias("t"))
    trans = counts.join(totals, "cur").select(
        "cur", "nxt", F.expr("(c * 1000000) DIV t").alias("p_ppm")
    )

    # Bounded collect: (channels+2)^2 rows of metadata, one Spark action.
    trans_map: dict[str, list[tuple[str, int]]] = {}
    for r in trans.collect():
        trans_map.setdefault(r["cur"], []).append((r["nxt"], int(r["p_ppm"])))
    channels = sorted(c for c in trans_map if c != "START")

    def conv_mass(removed: str | None) -> int:
        # Dropping the removed channel's outgoing rows sends any mass
        # entering it to the (implicit) NULL sink — identical to the old
        # Spark-side `trans.filter(cur != removed)` recurrence: per-pair
        # (q * p_ppm) // 1e6 (non-negative, so floor == DIV), summed per
        # destination state each step.
        vec = {"START": 1000000}
        absorbed = 0
        for _ in range(steps):
            stepped: dict[str, int] = {}
            for s, q in vec.items():
                if s == removed:
                    continue
                for nxt, p_ppm in trans_map.get(s, ()):
                    stepped[nxt] = stepped.get(nxt, 0) + (q * p_ppm) // 1000000
            absorbed += stepped.pop("CONV", 0)
            stepped.pop("NULL", None)
            vec = stepped
        return absorbed

    p_base = conv_mass(None)
    rows = []
    for ch in channels:
        p_removed = conv_mass(ch)
        eff = ((p_base - p_removed) * 1000000) // p_base if p_base else 0
        rows.append((ch, p_base, p_removed, int(eff)))
    # Emit the bounded result via VALUES (JVM LocalRelation) — never
    # createDataFrame, which plans a Python-RDD scan (CLAUDE.md rule).
    if not rows:
        return events.sparkSession.sql(
            "SELECT * FROM VALUES ('', CAST(0 AS BIGINT), CAST(0 AS BIGINT),"
            " CAST(0 AS BIGINT)) AS t(channel, p_base_ppm, p_removed_ppm,"
            " removal_effect_ppm) WHERE FALSE"
        )
    values = ", ".join(
        "('{0}', CAST({1} AS BIGINT), CAST({2} AS BIGINT), "
        "CAST({3} AS BIGINT))".format(
            ch.replace("\\", "\\\\").replace("'", "''"), pb, pr, ef
        )
        for ch, pb, pr, ef in rows
    )
    return events.sparkSession.sql(
        "SELECT * FROM VALUES "
        + values
        + " AS t(channel, p_base_ppm, p_removed_ppm, removal_effect_ppm)"
    )


def theil_sen_slope(
    series: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Theil–Sen robust trend estimator: the median of all pairwise
    slopes (y_j - y_i)/(x_j - x_i) over x_i < x_j — the outlier-proof
    sibling of the OLS trend (a single corrupted day can move OLS
    arbitrarily; Theil–Sen has a 29% breakdown point, so it is the
    right trend estimate over volatile pipeline telemetry).

    Determinism: the numerator/denominator of every pairwise slope are
    exact bigints; the LOWER median is selected by a total order
    (double ratio, then num, then den — the double is only a sort key,
    the exact rational rides along), so the chosen (med_num, med_den)
    pair is a pure function of the data and the final float division is
    one op. Scale shape: pairs are a self-join over the AGGREGATED
    series (|days|^2 rows, bounded by the calendar, never event
    volume) and the median is one sort of that bounded set.
    """
    a = series.select(
        F.col(x_col).cast("bigint").alias("xa"),
        F.col(y_col).cast("bigint").alias("ya"),
    )
    b = series.select(
        F.col(x_col).cast("bigint").alias("xb"),
        F.col(y_col).cast("bigint").alias("yb"),
    )
    pairs = (
        a.join(b, F.col("xa") < F.col("xb"))
        .select(
            (F.col("yb") - F.col("ya")).alias("num"),
            (F.col("xb") - F.col("xa")).alias("den"),
        )
        .withColumn(
            "r", F.col("num").cast("double") / F.col("den").cast("double")
        )
    )
    w = W.orderBy("r", "num", "den")
    ranked = pairs.select(
        "num",
        "den",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) DIV 2")
    ).select(
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("num").cast("bigint").alias("med_num"),
        F.col("den").cast("bigint").alias("med_den"),
        (F.col("num").cast("double") / F.col("den").cast("double")).alias(
            "slope"
        ),
    )
