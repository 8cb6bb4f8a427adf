"""Training-corpus curation operators: deterministic splits, stratified
sampling, sequence packing, quality-filter cascades, passage-level dedup.

Beyond-reference surface (same tier as operators/dedup.py): the operations a
100 TB pretraining-data pipeline runs between raw ingest and tokenization.
Every operator is pure JVM DataFrame ops; the hash primitives (md5 hex →
int via base-16 conv) are bit-identical in Spark and the DuckDB oracle.

Scale notes per operator:
  - split/hash-sample: NARROW maps — no shuffle at all; the split decision
    is a pure function of the row key, so it is stable under re-partitioning,
    retries, and incremental re-runs (the property that matters for a
    reproducible 100 TB train/val split).
  - stratified_exact_sample: one shuffle keyed by stratum. Use only for
    strata counts ≫ executor count; for a handful of giant strata prefer
    hash_sample (fraction is approximate but the plan is shuffle-free).
  - pack_documents: windows are PARTITIONED BY a shard column — packing is
    embarrassingly parallel across shards and never sees a global sort.
    A global (unsharded) pack of 100 TB would funnel into one partition;
    shard first (by lang/source/date), pack within shards.
  - passage_dedup: explode to word-window passages, first-occurrence rank
    over md5(passage) — the C4/RefinedWeb "line dedup" shape with a word
    tokenizer standing in for newline splitting. Shuffle keys are passage
    hashes (high cardinality, no hot keys at stopword level because
    passages are k words long).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def md5_bucket(col: Column | str, modulus: int, nhex: int = 6) -> Column:
    """Deterministic bucket in [0, modulus): first ``nhex`` hex chars of
    md5 as an integer, mod ``modulus``. Portable: DuckDB spells the same
    thing CAST('0x' || substr(md5(x), 1, nhex) AS BIGINT) % modulus."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, nhex), 16, 10)
        .cast("bigint")
        % modulus
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Assign every row to a named split by hashing its id — the standard
    reproducible train/val/test partition. Percentages must sum to 100.
    Narrow map: no shuffle, stable under reruns and late-arriving data."""
    total = sum(w for _, w in weights)
    if total != 100:
        raise ValueError(f"split weights must sum to 100, got {total}")
    bucket = md5_bucket(id_col, 100)
    expr, cum = None, 0
    for name, w in weights[:-1]:
        cum += w
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(weights[-1][0]) if expr is not None else F.lit(weights[-1][0])
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, percent: int, id_col: str = "doc_id", modulus: int = 100
) -> DataFrame:
    """Deterministic ~percent% sample: keep rows whose hash bucket falls
    below the cut. Shuffle-free; the 100 TB sampling path. The realized
    fraction is binomial around percent/100 (exact-count sampling needs
    stratified_exact_sample's window)."""
    return df.filter(md5_bucket(id_col, modulus) < percent)


def stratified_exact_sample(
    df: DataFrame,
    fraction: float,
    strata_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ceil(fraction·|stratum|) rows per stratum, chosen by hash
    order (md5 of id, ties by id) — deterministic, engine-portable, and
    unbiased wrt any column correlated with the id. One shuffle keyed by
    stratum; see module scale notes for the low-cardinality caveat."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    wc = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * fraction))
        .drop("_rn", "_n")
    )


def reservoir_sample_stratified(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — reservoir-sampling
    semantics (uniform fixed-k without replacement) made DETERMINISTIC by
    ranking on (md5(id), id): the hash order is a random permutation
    independent of any payload column, so bottom-k by hash IS a uniform
    k-subset, and reruns/engines agree bit-for-bit.

    Scale shape (round 7): a single per-stratum window sorts the WHOLE
    stratum on one reducer — the skew trap when one stratum holds 10^9
    rows. Instead: tournament two-phase bottom-k. Phase 1 ranks within
    (stratum, salt) — ``salt_buckets`` hash-derived subgroups — keeping
    ≤ salt_buckets*k rows per stratum; phase 2 ranks the survivors per
    stratum. Exact: every true bottom-k row is bottom-k within its salt
    group too. Both phases are window functions over bounded groups, so
    the max single-task sort is |stratum|/salt_buckets — turn the knob
    with the skew. Same mergeable-bottom-k idea as the KMV sketch."""
    hkey = F.md5(F.col(id_col).cast("string"))
    salt = md5_bucket(
        F.concat(F.lit("rs:"), F.col(id_col).cast("string")), salt_buckets
    )
    w1 = Window.partitionBy(strata_col, salt).orderBy(hkey, F.col(id_col))
    phase1 = (
        df.withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_rn1")
    )
    w2 = Window.partitionBy(strata_col).orderBy(hkey, F.col(id_col))
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .withColumn("sample_rank", F.col("_rn").cast("int"))
        .drop("_rn")
    )


def pack_documents(
    df: DataFrame,
    capacity: int,
    shard_col: str = "lang",
    token_col: str = "token_count",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequential greedy packing of documents into fixed-capacity context
    windows, independently per shard: docs are laid out in (tokens desc, id)
    order and each doc's bin is the window its start offset falls in —
    bin = floor(cumulative_tokens_before / capacity). Deterministic, one
    window per shard, no global sort. Returns (shard, bin, doc assignment).

    This is contiguous packing (a doc straddling a boundary belongs to the
    bin it starts in); splitting/truncating the straddler is the
    tokenizer's job downstream."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(F.col(token_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col),
        F.col(token_col),
        F.floor(prev / capacity).cast("bigint").alias("bin"),
    )


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-(shard, bin) packing efficiency: doc count, token sum, fill
    ratio (can exceed 1 for a straddling doc — see pack_documents)."""
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("token_count").alias("tokens"),
        )
        .withColumn("fill", F.round(F.col("tokens") / capacity, 6))
    )


# Quality-filter cascade: ordered (name, predicate-builder) rules; the
# verdict is the FIRST failing rule, mirroring how production filters
# report drop reasons. Thresholds are tuned for the synthetic corpus so
# both outcomes occur; the shape (not the constants) is the operator.
def quality_verdicts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc keep/drop verdict with the first failing rule as reason.
    Pure narrow map — token stats and rule evaluation are JVM expressions;
    at 100 TB this is a single pass fused into the scan."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tc = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / tc
    avg_tok_len = (F.length(F.col(text_col)) - tc + 1) / tc
    rules = [
        ("too_short", tc < 30),
        ("too_long", tc > 5000),
        ("low_diversity", distinct_ratio < 0.12),
        ("tokens_too_short", avg_tok_len < 2.5),
    ]
    reason = None
    for name, cond in rules:
        reason = F.when(cond, name) if reason is None else reason.when(cond, name)
    reason = reason.otherwise(F.lit(None))
    return df.select(
        "doc_id",
        tc.cast("bigint").alias("token_count"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        reason.alias("drop_reason"),
    ).withColumn("keep", F.col("drop_reason").isNull())


def passage_dedup_stats(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-level passage dedup accounting: split each doc into
    consecutive k-word passages, keep only the FIRST occurrence of each
    distinct passage corpus-wide (first = smallest (doc_id, position)),
    report per-doc passage counts and the dup ratio.

    The C4-style line-dedup shape: explode O(tokens) passages, rank by
    md5(passage) — one wide shuffle whose key space is the distinct-passage
    set. Keeping rank 1 (instead of dropping all duplicated passages)
    preserves exactly one copy of boilerplate, which is the semantics
    training pipelines want."""
    # tokenization hoisted out of the transform lambda: Spark re-evaluates
    # lambda-body subexpressions per element, so split-in-lambda is
    # O(tokens²) per doc (same fix as dedup.word_shingles; rows identical)
    passages = F.expr(
        f"transform(sequence(0, greatest(cast(ceil(size(__toks) / {k}) as int), 1) - 1),"
        f" i -> array_join(slice(__toks, i * {k} + 1, {k}), ' '))"
    )
    exploded = df.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__toks")
    ).select(F.col(id_col), F.posexplode(passages).alias("pos", "passage"))
    w = Window.partitionBy(F.md5(F.col("passage"))).orderBy(id_col, "pos")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
        .withColumn(
            "dup_ratio",
            F.round((F.col("n_passages") - F.col("n_kept")) / F.col("n_passages"), 6),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with a benchmark/eval set — the published n-gram-overlap
    procedure (GPT-3 appendix C, PaLM §6; 8-13-gram windows in production,
    ``n`` is the knob). Returns per-corpus-doc ``hit_shingles`` (distinct
    own n-grams that appear anywhere in the benchmark) and ``contaminated``.

    Scale shape: the benchmark side is eval data — MBs against a 100 TB
    corpus — so its distinct-shingle set is BROADCAST and the probe is a
    map-side semi-join inside the corpus scan: no corpus shuffle at all
    except the per-doc count aggregation (keyed by doc, no hot keys).
    n >= 3 keeps stopword n-grams from mattering; for n=1 apply a df-cap
    first (see dedup.jaccard_pairs).
    """
    from icebergsql_spark.operators.util import ensure_parallelism

    corpus = ensure_parallelism(corpus)
    benchmark = ensure_parallelism(benchmark)

    def shingles(df: DataFrame) -> DataFrame:
        # split hoisted out of the lambda (see passage_dedup note): the
        # in-lambda form re-tokenizes the doc per n-gram position
        arr = F.expr(
            f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 1)),"
            f" i -> array_join(slice(__toks, i, {n}), ' '))"
        )
        return df.select(
            F.col(id_col), F.split(F.trim(F.col(text_col)), " ").alias("__toks")
        ).select(
            F.col(id_col), F.explode(F.array_distinct(arr)).alias("shingle")
        )

    bench = F.broadcast(shingles(benchmark).select("shingle").distinct())
    hits = (
        shingles(corpus)
        .join(bench, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_shingles"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("hit_shingles", F.lit(0)).alias("hit_shingles"),
        )
        .withColumn("contaminated", F.col("hit_shingles") > 0)
    )


def resample_to_mix(
    df: DataFrame,
    mix: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    modulus: int = 10000,
) -> DataFrame:
    """Deterministic down-sampling to a target domain mix: keep-rates are
    chosen so the surviving per-source counts are proportional to ``mix``
    weights with the binding source (largest weight-relative deficit) kept
    in full — the standard pretraining domain-reweighting step (e.g. the
    Pile / DoReMi-style static mixes). Sources absent from ``mix`` are
    dropped.

    Every decision is integer arithmetic + md5 bucketing, so reruns,
    engine ports, and incremental re-ingests all select the SAME rows:
      ratio_s   = n_s * 10^9 div w_s          (scaled, exact)
      binding   = argmin ratio (ties: source)  -> (n*, w*)
      cut_s     = modulus * n* * w_s div (w* * n_s)
      keep row  <=> md5_bucket(id, modulus) < cut_s
    Plan: per-source counts (tiny agg) -> 1-row binding source broadcast ->
    rates broadcast-joined back on source -> narrow filter. The 100 TB data
    path is one scan + one map-side join; no data-sized shuffle.
    """
    wmap = F.create_map(*[F.lit(x) for kv in mix.items() for x in kv])
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", wmap[F.col(source_col)].cast("bigint"))
        .filter(F.col("w").isNotNull())
        .withColumn("ratio", F.expr("n * 1000000000 div w"))
    )
    w_rank = Window.orderBy("ratio", source_col)
    binding = (
        counts.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(F.col("n").alias("n_star"), F.col("w").alias("w_star"))
    )
    rates = counts.crossJoin(F.broadcast(binding)).select(
        source_col,
        F.expr(f"({modulus} * n_star * w) div (w_star * n)").alias("cut"),
    )
    return df.join(F.broadcast(rates), source_col).filter(
        md5_bucket(id_col, modulus) < F.col("cut")
    )
