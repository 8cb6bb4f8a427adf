"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference surface (BASELINE.json north star): language-ID heuristic,
quality scoring, token counting, document fingerprinting — all as
DataFrame-in/DataFrame-out operators built from JVM-side functions (no
Python UDFs in the hot path), so they run inside whole-stage codegen and
scale linearly with executors on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import ensure_parallelism

# deterministic marker words per language for the n-gram/stopword heuristic;
# scoring mechanics are what matters — swap for real stopword lists in a
# production corpus
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value"),
    "de": ("hash", "vector", "filter"),
    "es": ("data", "row", "scan"),
    "fr": ("window", "query", "order"),
    "zh": ("merge", "batch", "join"),
}


def tokens(text_col: str = "text") -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count, distinct_tokens, avg_token_len, char len."""
    toks = tokens(text_col)
    return (
        df.withColumn("token_count", F.size(toks))
        .withColumn("distinct_tokens", F.size(F.array_distinct(toks)))
        .withColumn("char_len", F.length(F.col(text_col)))
        .withColumn(
            "avg_token_len",
            (
                (F.length(F.col(text_col)) - F.size(toks) + F.lit(1))
                / F.size(toks)
            ),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 0–100 quality score from length / diversity ratios
    (the shape of a production quality heuristic: length band + lexical
    diversity + mean word length band)."""
    df = with_token_stats(df, text_col)
    diversity = F.col("distinct_tokens") / F.col("token_count")
    length_band = F.when(F.col("token_count").between(20, 200), 40).otherwise(10)
    word_len_band = F.when(F.col("avg_token_len").between(3, 8), 30).otherwise(5)
    return ensure_parallelism(df).withColumn(
        "quality_score",
        (length_band + word_len_band + F.round(diversity * 30, 2)).cast("double"),
    )


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word counts per language + argmax prediction (deterministic
    tiebreak by language code order). Token counting happens JVM-side via
    array ops — at 100 TB this is a narrow map, no shuffle."""
    toks = tokens(text_col)
    out = df
    for lang, words in LANG_MARKERS.items():
        cnt = F.size(
            F.filter(toks, lambda t: t.isin(*words))  # noqa: B023
        )
        out = out.withColumn(f"score_{lang}", cnt)
    # argmax with lexicographic tiebreak: pack (score, neg-ord) and take max
    structs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(-i).alias("ord"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_MARKERS)
        ]
    )
    return out.withColumn("predicted_lang", F.array_max(structs)["lang"])


def winnowing_fingerprints(
    df: DataFrame, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of MOSS):
    hash every token, slide a window of ``window`` positions, keep each
    window's minimum hash, dedupe per document.

    Two docs sharing content share fingerprints, so near-dup detection is a
    fingerprint equi-join instead of an all-pairs comparison. One explode +
    one window function + one distinct — all shuffle-partitioned by doc.
    Hashes stay as md5 hex strings (lexicographic min), which keeps the
    operator portable to the SQL oracle byte-for-byte.
    """
    from pyspark.sql import Window as W

    df = ensure_parallelism(df)
    toks = df.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("pos", "tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, window - 1)
    )
    return (
        toks.withColumn("fp", F.min("h").over(w))
        .select("doc_id", "fp")
        .distinct()
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, appendix
    A1.1 — the published filter set for LLM training corpora): per document,

      - ``dup_word_frac``    1 − |distinct tokens| / |tokens|
      - ``dup_5gram_frac``   1 − |distinct char 5-grams| / |char 5-grams|
      - ``top_bigram_frac``  occurrences of the most frequent word bigram
                             over all bigram occurrences

    High values on any of them mark boilerplate/spam documents that repeat
    themselves — the standard pre-training quality gate after dedup.

    Scale shape: ALL three signals are per-row array expressions — a
    zero-shuffle narrow map. The top-bigram share, which naively needs
    per-(doc, bigram) counts (an O(total-bigrams) explode + shuffle,
    unacceptable at corpus scale), instead sorts the row's bigram array
    and folds the longest equal run: max count == longest run in sorted
    order, and the counts are exact integers so the ratio is bit-identical
    to the grouped formulation. No Python in any path.
    """
    df = ensure_parallelism(df)
    t = tokens(text_col)
    g5 = F.expr(
        f"transform(sequence(1, greatest(length({text_col})-4, 1)), "
        f"i -> substring({text_col}, i, 5))"
    )
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(__t)-1, 1)), "
        "i -> array_join(slice(__t, i, 2), ' '))"
    )
    max_bigram_count = F.expr(
        "aggregate(array_sort(__b), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        "(a, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x <=> a.prev, a.run + 1L, 1L), "
        "  'best', GREATEST(a.best, IF(x <=> a.prev, a.run + 1L, 1L))), "
        "a -> a.best)"
    )
    return (
        df.select(id_col, text_col)
        .withColumn("__t", t)
        .withColumn("__b", bigrams)
        .select(
            F.col(id_col),
            F.size("__t").cast("long").alias("n_tokens"),
            F.round(
                F.lit(1) - F.size(F.array_distinct("__t")) / F.size("__t"), 6
            ).alias("dup_word_frac"),
            F.round(F.lit(1) - F.size(F.array_distinct(g5)) / F.size(g5), 6).alias(
                "dup_5gram_frac"
            ),
            F.round(max_bigram_count / F.size("__b"), 6).alias("top_bigram_frac"),
        )
    )


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 relevance of every document against a fixed query-term set —
    the standard retrieval/labeling scorer (Robertson & Zaragoza 2009).

    Scale shape: ONE token explode + ONE aggregate keyed by doc produces
    per-doc length and per-term frequencies (conditional aggregation — the
    term list is a query, small and fixed, so tf columns beat a (doc, term)
    shuffle). Corpus statistics (N, total length, per-term document
    frequencies) are a second aggregate over the per-doc frame — a 1-row
    broadcast, no second corpus scan. Per-doc scoring is then a narrow map.

    Float determinism: contributions are summed in the FIXED order of
    ``terms`` (generated column expression, not an aggregate), and the
    division order matches the SQL oracle exactly.
    """
    df = ensure_parallelism(df)
    toks = df.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    avgdl = F.col("sdl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        contrib = idf * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)))
        )
        score = contrib if score is None else score + contrib
    return (
        scored.withColumn("bm25", F.round(score, 6))
        .filter(F.col("bm25") > 0)
        .select(id_col, "bm25")
        .orderBy(F.desc("bm25"), id_col)
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stable document fingerprint: md5 of the whitespace-normalized,
    lowercased text — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn("fingerprint", F.md5(normalized))


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", scale: int = 10**9
) -> DataFrame:
    """Per-document mean unigram log-probability (corpus-fit LM scoring).

    The classic cheap quality/outlier signal for pretraining corpora: fit a
    unigram LM to the corpus itself (token relative frequencies), score each
    document by its average token ln-probability. Rare-token-heavy docs
    (boilerplate, code dumps, other languages) score low.

    Determinism: per-token ln p is quantized to a scaled BIGINT once, so the
    per-document aggregation is an integer sum — order-independent and
    bit-identical to the DuckDB oracle (ln and double division match
    bit-for-bit given identical operand order; CLAUDE.md BM25 note).

    Scale: two shuffles (vocab count, per-doc sum) plus a token⇄vocab join
    that Catalyst can map to SMJ or broadcast depending on vocab size. The
    1-row total rides a broadcast cross join, not a driver action.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.expr(
            f"CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))"
            f" * {scale}) AS BIGINT)"
        ).alias("lq"),
    )
    return (
        tok.join(scored, "tok")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lq").alias("slq"))
        .select(
            id_col,
            "n_tokens",
            F.expr(
                f"(CAST(slq AS DOUBLE) / {float(scale)}) / CAST(n_tokens AS DOUBLE)"
            ).alias("avg_logprob"),
        )
    )
