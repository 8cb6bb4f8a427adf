"""Distinct-count sketching: K-minimum-values (KMV / bottom-k).

The distributed-cardinality operator for 100 TB pipelines (vocabulary
sizes, key-cardinality audits before joins, dedup-rate monitoring) with a
property Spark's approx_count_distinct (HLL++) lacks: the sketch is a pure
DETERMINISTIC function of the value set — md5 is bit-identical across
engines, so the same data yields the same estimate in Spark and the DuckDB
oracle, and the correctness gate can hash-match an *approximate* operator.

Estimator (Bar-Yossef et al. 2002): keep the k smallest distinct hash
values; if fewer than k exist the count is exact; otherwise
DV ≈ (k-1) / frac(h_k) with frac the k-th smallest hash scaled to [0,1).
Hashes order as hex strings (md5 is uniform); the fraction uses the first
13 hex digits (52 bits — exactly representable in a double, so the
division is bit-stable everywhere).

Scale shape: partial distinct-aggregate on the hash (map-side combine),
then TakeOrdered k — shuffle volume is O(partitions · k), never O(rows).
Sketches MERGE associatively (union hash sets, keep k smallest), which is
what lets per-partition / per-day sketches roll up without rescanning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX_DIGITS = 13  # 52 bits: exact in a double
_SCALE = float(16**HEX_DIGITS)


def _estimate(hk: Column, m: Column, k: int) -> Column:
    frac = F.conv(F.substring(hk, 1, HEX_DIGITS), 16, 10).cast("double") / F.lit(
        _SCALE
    )
    return F.when(m < k, m.cast("double")).otherwise(F.lit(float(k - 1)) / frac)


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct md5 hashes of ``col`` — the mergeable sketch
    state (one row per kept hash, column ``h``)."""
    return (
        df.select(F.md5(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One row: (column, dv_estimate) — exact below k distinct values."""
    agg = kmv_sketch(df, col, k).agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")
    )
    return agg.select(
        F.lit(col).alias("column"),
        F.round(_estimate(F.col("hk"), F.col("m"), k)).cast("bigint").alias(
            "dv_estimate"
        ),
    )


def kmv_union_estimate(
    sketches: list[DataFrame], label: str, k: int = 256
) -> DataFrame:
    """Cardinality of the UNION of the sketched sets: merge = union the
    hash sets, keep the k smallest, apply the same estimator. This
    associative merge is the whole point at scale — per-shard sketches
    roll up without touching the data again."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.union(s)
    agg = (
        merged.distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
    )
    return agg.select(
        F.lit(label).alias("column"),
        F.round(_estimate(F.col("hk"), F.col("m"), k)).cast("bigint").alias(
            "dv_estimate"
        ),
    )


# --------------------------------------------------------------- Bloom --
# A deterministic Bloom filter with the same portability property as KMV:
# bit positions come from md5 hex digits, so Spark and the DuckDB oracle
# build IDENTICAL bitmaps and even the false positives hash-match. The
# bitmap is relational state — (word_idx, bits) rows ORed together by a
# single aggregate — so it builds in one shuffle of ≤BLOOM_WORDS rows per
# partition (map-side combine), broadcasts to the probe side, and merges
# across shards with another bit_or (associative, like the KMV union).
# The classic 100 TB use: pre-filter a huge probe table against a selective
# build side before the real join ships any data.

BLOOM_BITS = 4096
BLOOM_WORD = 32  # bits per word: masks stay < 2^31, no sign games
BLOOM_HASHES = 3


def _bloom_pos(col, j: int):
    """j-th bit position: 3 md5 hex digits -> 0..4095 (uniform)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1 + 3 * j, 3), 16, 10).cast(
        "int"
    )


def bloom_build(df: DataFrame, col: str, hashes: int = BLOOM_HASHES) -> DataFrame:
    """Aggregate the build side into (word_idx, bits) bitmap rows."""
    pos = F.explode(F.array(*[_bloom_pos(F.col(col), j) for j in range(hashes)]))
    return (
        df.select(pos.alias("p"))
        .select(
            F.expr(f"p DIV {BLOOM_WORD}").alias("word_idx"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD} AS INT))").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, col: str, bloom: DataFrame, hashes: int = BLOOM_HASHES
) -> DataFrame:
    """Adds boolean ``bloom_positive``: all `hashes` bits set in the bitmap.

    The bitmap (≤BLOOM_BITS/BLOOM_WORD rows) is broadcast, so the probe is
    a narrow map + local join — no shuffle of the probe table.
    """
    key = F.col(col)
    pos = F.explode(F.array(*[_bloom_pos(key, j) for j in range(hashes)]))
    probes = df.select(key.alias("_k"), pos.alias("p")).distinct().select(
        "_k",
        "p",
        F.expr(f"p DIV {BLOOM_WORD}").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD} AS INT))").alias("m"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("n_pos"),
            F.sum(
                F.when(F.col("bits").bitwiseAND(F.col("m")) == F.col("m"), 1).otherwise(0)
            ).alias("n_hit"),
        )
        .select(
            F.col("_k"), (F.col("n_hit") == F.col("n_pos")).alias("bloom_positive")
        )
    )
    # LEFT join + coalesce(false): a NULL probe key generates no probe rows
    # (md5(NULL) is NULL), so an inner join would silently drop those input
    # rows — a general-purpose probe must preserve the input frame.
    return (
        df.join(hits, df[col] == hits["_k"], "left")
        .drop("_k")
        .withColumn(
            "bloom_positive", F.coalesce(F.col("bloom_positive"), F.lit(False))
        )
    )


# ----------------------------------------------------------- Count-Min --
# Same determinism trick as Bloom/KMV: md5-derived buckets make the sketch
# a pure function of the multiset, so the (over-)estimates themselves are
# oracle-checkable. The counter table is (depth, bucket) rows — ONE
# aggregate with map-side combine builds it (shuffle ≤ depth × width rows
# per partition), counters merge across shards by plain addition, and
# point queries are a broadcast join against depth rows per key. The
# streaming-friendly heavy-hitter shape: memory is O(depth × width), never
# O(distinct keys).

CMS_DEPTH = 3
CMS_WIDTH = 256  # 2 md5 hex digits


def _cms_bucket(col, j: int):
    """j-th row's bucket: first 2 hex digits of the seeded md5 → 0..255."""
    h = F.md5(F.concat(F.lit(f"{j}:"), col))
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def cms_build(df: DataFrame, col: str, depth: int = CMS_DEPTH) -> DataFrame:
    """(depth, bucket, cnt) counter rows for the value multiset."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_bucket(F.col(col), j).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("db")
    )
    return rows.groupBy("db.depth", "db.bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    keys: DataFrame, col: str, counters: DataFrame, depth: int = CMS_DEPTH
) -> DataFrame:
    """Adds ``cms_estimate``: min over depths of the key's bucket counter
    (the classic Count-Min upper bound; never underestimates)."""
    probes = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_bucket(F.col(col), j).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("db"),
    ).select(col, "db.depth", "db.bucket")
    return (
        probes.join(F.broadcast(counters), ["depth", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# ------------------------------------------------------------ HyperLogLog --
# Same determinism discipline as Bloom/KMV/CMS: md5-derived registers make
# the sketch a pure function of the SET, so registers AND estimate are
# oracle-checkable. m=256 registers (first 2 hex chars), rank from the next
# 12 hex chars (48 bits). State is O(m) and registers merge by MAX — the
# mergeable-sketch shape that lets 1000 executors each build a partial and
# combine in one tiny shuffle, the standard approx-COUNT(DISTINCT) at
# 100 TB (Flajolet et al., HyperLogLog, AofA 2007).

HLL_M = 256  # registers
HLL_BITS = 48  # rank bits per hash

_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# raw HLL estimate over (m_used, harmonic_q) columns — an ANSI-SQL
# fragment shared verbatim by the Spark expression and the DuckDB oracle
# (plans/pipeline3.py) so the float op ORDER is identical in both engines
_RAW_EST_SQL = (
    # alpha must be CAST AS DOUBLE: DuckDB parses a bare float literal as
    # DECIMAL and the decimal product overflows; Spark treats it as DOUBLE
    # either way
    f"CAST({_HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M} /"
    f" ((CAST(harmonic_q AS DOUBLE) / POW(CAST(2 AS DOUBLE), {HLL_BITS + 1}))"
    f"  + ({HLL_M} - m_used))"
)


def _rho_rank_expr(h12: str) -> str:
    """Rank (leading-zero count + 1) of a 12-hex-char (48-bit) string,
    hex-char arithmetic only: whole-nibble zeros via TRIM(LEADING '0'),
    then the first surviving nibble's high-bit position."""
    t = f"trim(LEADING '0' FROM {h12})"
    nib = f"instr('0123456789abcdef', substring({t}, 1, 1)) - 1"
    return (
        f"CASE WHEN {t} = '' THEN {HLL_BITS + 1} "
        f"ELSE (12 - length({t})) * 4 "
        f"+ CASE WHEN ({nib}) >= 8 THEN 0 WHEN ({nib}) >= 4 THEN 1 "
        f"WHEN ({nib}) >= 2 THEN 2 ELSE 3 END + 1 END"
    )


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(reg, max_rho) register table — the mergeable HLL state."""
    reg = (
        "(instr('0123456789abcdef', substring(md5_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5_h, 2, 1)) - 1)"
    )
    return (
        df.select(F.md5(F.col(col).cast("string")).alias("md5_h"))
        .select(
            F.expr(f"CAST({reg} AS INT)").alias("reg"),
            F.expr(
                f"CAST({_rho_rank_expr('substring(md5_h, 3, 12)')} AS INT)"
            ).alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row (m_used, harmonic_q, est) distinct-count estimate.

    harmonic_q = Σ 2^(HLL_BITS+1-max_rho) over hit registers — an EXACT
    bigint (order-independent), so the double arithmetic is one final
    division: bit-identical across engines. Raw HLL estimate without
    small-range correction (documented; registers are the ground truth)."""
    regs = hll_registers(df, col)
    # standard small-range (linear counting) correction: when the raw
    # estimate is below 2.5m and empty registers remain, m*ln(m/empty) is
    # the unbiased occupancy estimator — raw HLL alone reads ~2.4x high at
    # n << m. Every term is a deterministic double fold over exact bigints.
    est = (
        f"CASE WHEN ({_RAW_EST_SQL}) <= {2.5 * HLL_M} AND m_used < {HLL_M}"
        f" THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - m_used))"
        f" ELSE ({_RAW_EST_SQL}) END"
    )
    return regs.agg(
        F.count(F.lit(1)).alias("m_used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_BITS + 1} - max_rho)")).alias(
            "harmonic_q"
        ),
    ).select(
        "m_used",
        "harmonic_q",
        F.expr(f"CAST(round({est}) AS BIGINT)").alias("est"),
    )


def kmv_intersection_estimate(
    ska: DataFrame, skb: DataFrame, k: int = 256
) -> DataFrame:
    """Theta-style intersection estimate from two KMV sketches: θ = the
    smaller of the two sketches' k-th-smallest hash fractions (1.0 while
    a sketch still holds its whole set — the estimate is then EXACT on
    that side), the sample is the common hashes below θ, and the
    estimate is |sample| / θ. One row, column ``est``. The entire
    computation touches only the two k-row hash sets — the audience-
    intersection answer at 100 TB costs two sketch scans that the
    distinct-count pipeline already pays, plus a k-row join."""
    scale = float(16**13)

    def frac(c):
        return (
            F.conv(F.substring(c, 1, 13), 16, 10).cast("double")
            / F.lit(scale)
        )

    astat = ska.agg(F.max("h").alias("ha"), F.count(F.lit(1)).alias("ma"))
    bstat = skb.agg(F.max("h").alias("hb"), F.count(F.lit(1)).alias("mb"))
    stats = astat.crossJoin(bstat).select(
        F.least(
            F.when(F.col("ma") >= k, frac(F.col("ha"))).otherwise(F.lit(1.0)),
            F.when(F.col("mb") >= k, frac(F.col("hb"))).otherwise(F.lit(1.0)),
        ).alias("theta")
    )
    sample = (
        ska.join(skb, "h")
        .crossJoin(F.broadcast(stats))
        .filter(frac(F.col("h")) < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return sample.crossJoin(F.broadcast(stats)).select(
        F.round(F.col("c") / F.col("theta")).cast("bigint").alias("est")
    )


def kmv_difference_estimate(
    ska: DataFrame, skb: DataFrame, k: int = 256
) -> DataFrame:
    """Theta-style a-not-b estimate from two KMV sketches (the third
    theta-sketch set operation next to union and intersection): θ = the
    smaller of the two sketches' k-th-smallest hash fractions (1.0
    while a sketch is exhaustive), the sample is A's hashes below θ
    that B does NOT hold, and the estimate is |sample| / θ.  One row,
    column ``est``.  The audience-exclusion answer (users who clicked
    but never purchased) at two k-row sketch scans."""
    scale = float(16**13)

    def frac(c):
        return (
            F.conv(F.substring(c, 1, 13), 16, 10).cast("double")
            / F.lit(scale)
        )

    astat = ska.agg(F.max("h").alias("ha"), F.count(F.lit(1)).alias("ma"))
    bstat = skb.agg(F.max("h").alias("hb"), F.count(F.lit(1)).alias("mb"))
    stats = astat.crossJoin(bstat).select(
        F.least(
            F.when(F.col("ma") >= k, frac(F.col("ha"))).otherwise(F.lit(1.0)),
            F.when(F.col("mb") >= k, frac(F.col("hb"))).otherwise(F.lit(1.0)),
        ).alias("theta")
    )
    sample = (
        ska.join(skb, "h", "left_anti")
        .crossJoin(F.broadcast(stats))
        .filter(frac(F.col("h")) < F.col("theta"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return sample.crossJoin(F.broadcast(stats)).select(
        F.round(F.col("c") / F.col("theta")).cast("bigint").alias("est")
    )


def hash_sample_quantiles(
    df: DataFrame,
    key_col: str,
    val_col: str,
    divisor: int = 16,
    qs: tuple[int, ...] = (25, 50, 75, 90, 99),
) -> DataFrame:
    """Deterministic, mergeable quantile sketch via hash row-sampling.

    Rows whose ``md5(key)`` bucket lands on 0 mod ``divisor`` form the
    sample (the repo-wide md5 idiom — no RNG, so the sample is a pure
    function of the data and identical across engines, partitionings and
    retries); quantiles are computed exactly over the sample.  The
    sketch state IS the sampled row set, so merging two sketches is a
    bare union — the property KLL/t-digest buy with randomized
    compaction, bought here with determinism instead (sample size is
    n/divisor in expectation rather than a hard cap; pick ``divisor``
    so n/divisor fits the driver/exchange budget at the target scale).

    Returns one row per requested quantile: (q_pct, sample_n, value).
    ``value`` uses Spark ``percentile`` (exact over the sample, linear
    interpolation — DuckDB ``quantile_cont`` is the bit-identical
    oracle spelling per the engine-parity rules).
    """
    sample = df.filter(
        F.expr(
            f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), 1, 8),"
            f" 16, 10) AS BIGINT) % {divisor} = 0"
        )
    ).select(F.col(val_col).alias("v"))
    q_arr = ", ".join(f"CAST({q} AS DOUBLE) / 100.0" for q in qs)
    pct = sample.agg(
        F.count(F.lit(1)).cast("bigint").alias("sample_n"),
        F.expr(f"percentile(v, array({q_arr}))").alias("vals"),
    )
    return pct.select(
        "sample_n",
        F.expr(
            "stack("
            + str(len(qs))
            + ", "
            + ", ".join(
                f"CAST({q} AS INT), vals[{i}]" for i, q in enumerate(qs)
            )
            + ") AS (q_pct, value)"
        ),
    ).select("q_pct", "sample_n", "value")


def hll_daily_registers(df: DataFrame, col: str, day_col: str) -> DataFrame:
    """Per-day HLL register table: (day, reg, max_rho).

    The per-day state is the unit a windowed distinct-count pipeline
    stores at scale: one <=m-row register set per (day, shard) that any
    later window can MAX-merge without touching raw events again."""
    reg = (
        "(instr('0123456789abcdef', substring(md5_h, 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5_h, 2, 1)) - 1)"
    )
    return (
        df.select(
            F.col(day_col).cast("long").alias("day"),
            F.md5(F.col(col).cast("string")).alias("md5_h"),
        )
        .select(
            "day",
            F.expr(f"CAST({reg} AS INT)").alias("reg"),
            F.expr(
                f"CAST({_rho_rank_expr('substring(md5_h, 3, 12)')} AS INT)"
            ).alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_sliding_estimate(
    df: DataFrame, col: str, day_col: str, window_days: int = 7
) -> DataFrame:
    """Sliding-window distinct estimate from MAX-merged daily HLLs.

    Each day's register set contributes to the ``window_days`` windows
    ending on days [day, day + window_days - 1]; merging across a window
    is register-wise MAX (the HLL union property the sketch_hll_union
    gate proves end-to-end), then the standard estimate with the
    small-range linear-counting correction.  Only windows whose END day
    exists in the data are emitted (no phantom trailing windows).

    Scale shape: the slide operates on per-day register tables —
    O(days × m) rows total, never the raw events — so a year of 100 TB
    event data costs 365 × 256 rows to window any way you like.  This is
    the time-dimension twin of sliding_distinct (exact dyadic windows):
    there the state is per-key, here it is O(m) regardless of
    cardinality.
    """
    daily = hll_daily_registers(df, col, day_col)
    days = daily.select(F.col("day").alias("wday")).distinct()
    slid = daily.select(
        "day",
        "reg",
        "max_rho",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window_days) - 1))
        ).alias("off"),
    ).select((F.col("day") + F.col("off")).alias("wday"), "reg", "max_rho")
    merged = (
        slid.join(days, "wday")
        .groupBy("wday", "reg")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    est = (
        f"CASE WHEN ({_RAW_EST_SQL}) <= {2.5 * HLL_M} AND m_used < {HLL_M}"
        f" THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - m_used))"
        f" ELSE ({_RAW_EST_SQL}) END"
    )
    return (
        merged.groupBy("wday")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m_used"),
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {HLL_BITS + 1} - max_rho)"
                )
            ).alias("harmonic_q"),
        )
        .select(
            "wday",
            "m_used",
            "harmonic_q",
            F.expr(f"CAST(round({est}) AS BIGINT)").alias("est"),
        )
    )


def cms_daily_build(
    df: DataFrame, col: str, day_col: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Per-day Count-Min counter table: (day, depth, bucket, cnt) — the
    unit a windowed heavy-hitter pipeline stores at scale (CMS counters
    merge by ADDITION, so any day range sums into a window sketch
    without re-touching raw events; O(days x d x w) rows total)."""
    rows = df.select(
        F.col(day_col).cast("long").alias("day"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_bucket(F.col(col), j).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("db"),
    )
    return rows.groupBy("day", "db.depth", "db.bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_sliding_estimate(
    df: DataFrame,
    col: str,
    day_col: str,
    probes: DataFrame,
    window_days: int = 7,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Sliding-window Count-Min estimates from SUM-merged daily counters
    — the additive-merge twin of hll_sliding_estimate's MAX-merge: each
    day's counters feed the ``window_days`` windows ending on days
    [day, day + window_days - 1]; a window's sketch is the plain sum,
    and each probe key reads min-over-depths as usual (estimate >= true
    windowed count is the structural CMS guarantee).  Only windows whose
    end day exists in the data are emitted.

    ``probes`` is a one-column DataFrame of keys (column name ``col``).
    Returns (wday, <col>, cms_estimate).

    Emitted-rows contract (ADVICE_r09): the probe join is an INNER join
    against the windowed counters, so a probe key that hashes into
    buckets untouched in EVERY depth of a window produces NO row for
    that (wday, probe) — not a ``cms_estimate = 0`` row.  Counter
    sparsity like that essentially requires the window to be empty;
    callers needing a dense (wday x probe) spine should left-join from
    one and ``coalesce(cms_estimate, 0)``.
    """
    daily = cms_daily_build(df, col, day_col, depth=depth)
    days = daily.select(F.col("day").alias("wday")).distinct()
    slid = daily.select(
        "day", "depth", "bucket", "cnt",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(window_days) - 1))
        ).alias("off"),
    ).select(
        (F.col("day") + F.col("off")).alias("wday"),
        "depth", "bucket", "cnt",
    )
    win = (
        slid.join(days, "wday")
        .groupBy("wday", "depth", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    probe_rows = probes.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        _cms_bucket(F.col(col), j).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("db"),
    ).select(col, "db.depth", "db.bucket")
    return (
        win.join(F.broadcast(probe_rows), ["depth", "bucket"])
        .groupBy("wday", col)
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )


def hll_intersection(
    df_a: DataFrame, df_b: DataFrame, col: str
) -> DataFrame:
    """HLL set-intersection estimate by inclusion-exclusion: registers
    are built independently per set, the UNION sketch is the
    register-wise MAX merge (the distributed-combine property
    sketch_hll_union proves), and |A ∩ B| ≈ est(A) + est(B) - est(A∪B)
    — the only intersection a mergeable sketch supports (HLLs cannot
    intersect directly; this is how every engine does it, with error
    growing as the Jaccard shrinks).  Emits one row with each sketch's
    exact register aggregates (m_used, harmonic_q — bigint anchors),
    the three estimates, and the inclusion-exclusion intersection.

    Scale shape: each side is an O(m)-state partial aggregate; the
    merge is a 256-row full-outer join — independent of set size.
    """
    est = (
        f"CASE WHEN ({_RAW_EST_SQL}) <= {2.5 * HLL_M} AND m_used < {HLL_M}"
        f" THEN {HLL_M} * ln(CAST({HLL_M} AS DOUBLE) / ({HLL_M} - m_used))"
        f" ELSE ({_RAW_EST_SQL}) END"
    )

    def agg_est(regs: DataFrame, tag: str) -> DataFrame:
        return (
            regs.agg(
                F.count(F.lit(1)).cast("bigint").alias("m_used"),
                F.sum(
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), "
                        f"{HLL_BITS + 1} - max_rho)"
                    )
                ).alias("harmonic_q"),
            )
            .select(
                F.col("m_used").alias(f"m_used_{tag}"),
                F.col("harmonic_q").alias(f"harmonic_q_{tag}"),
                F.expr(f"CAST(round({est}) AS BIGINT)").alias(
                    f"est_{tag}"
                ),
            )
        )

    ra = hll_registers(df_a, col)
    rb = hll_registers(df_b, col)
    ru = (
        ra.select("reg", F.col("max_rho").alias("qa"))
        .join(
            rb.select("reg", F.col("max_rho").alias("qb")),
            "reg",
            "full_outer",
        )
        .select(
            "reg",
            F.greatest(
                F.coalesce(F.col("qa"), F.lit(0)),
                F.coalesce(F.col("qb"), F.lit(0)),
            ).alias("max_rho"),
        )
    )
    return (
        agg_est(ra, "a")
        .crossJoin(agg_est(rb, "b"))
        .crossJoin(agg_est(ru, "u"))
        .select(
            "*",
            (
                F.col("est_a") + F.col("est_b") - F.col("est_u")
            ).cast("bigint").alias("est_intersection"),
        )
    )
