"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Beyond-reference surface (BASELINE.json north star). Every operator is a
composition of built-in DataFrame ops (explode → hash → group/join), so the
heavy lifting is shuffle-based and scales horizontally:

  - exact/normalized dedup: md5-fingerprint groupBy — one shuffle on the
    fingerprint, the classic first pass over a 100 TB corpus.
  - MinHash: explode shingles, k independent min(md5(seed:shingle)) partial
    aggregates — map-side combine collapses each doc's shingles before the
    shuffle, so shuffle volume is O(docs·k), not O(tokens).
  - LSH: band the signature, hash bands, self-join on band hash — candidate
    generation without the quadratic all-pairs join; exact Jaccard verifies
    candidates only.
  - SimHash: per-bit majority vote over token hashes (explode + conditional
    sums), one aggregate pass.
  - embedding near-dup: all-pairs cosine via a self-join; at scale, gate the
    join with the sign-bit LSH buckets from operators/similarity.py.

Portability: md5 + ascii + substr are the only hash primitives, chosen
because they are bit-identical in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebergsql_spark.operators.util import ensure_parallelism

from icebergsql_spark.functions import (  # noqa: F401  (re-exported surface)
    cosine_expr,
    dot_expr,
    with_double_vec_and_norm,
)
from icebergsql_spark.functions.hashing import hex_bit as _hex_bit_fn

MINHASH_K = 6
LSH_BANDS = 3  # 2 rows per band


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """doc_id → exploded distinct word n-gram shingles (JVM array ops).

    The tokenization (``split(trim(text), ' ')``) is hoisted into its own
    projection BEFORE the n-gram ``transform`` lambda: Spark does not
    subexpression-eliminate inside higher-order-function lambdas, so a
    ``split`` written in the lambda body re-tokenizes the whole document
    once PER ELEMENT — O(tokens²) per doc (measured 2.0 s → 0.5 s for
    n=1 and 1.35 s → 0.42 s for n=3 on the sf0.1 corpus; same rows
    bit-for-bit). For n=1 the n-gram lambda degenerates to the identity,
    so the shingle set is just the distinct token array."""
    base = ensure_parallelism(df)
    toks = F.split(F.trim(F.col(text_col)), " ")
    if n == 1:
        return base.select(
            "doc_id", F.explode(F.array_distinct(toks)).alias("shingle")
        )
    return (
        base.select("doc_id", toks.alias("__toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(size(__toks) - {n - 1}, 1)),"
                        f" i -> array_join(slice(__toks, i, {n}), ' '))"
                    )
                )
            ).alias("shingle"),
        )
    )


def exact_dedup_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level dedup accounting: total / distinct-exact / distinct-
    normalized. The normalized key lowercases and collapses whitespace."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col))).alias("n_exact"),
        F.countDistinct(F.md5(normalized)).alias("n_normalized"),
    )


def minhash_signatures(
    df: DataFrame,
    n: int = 1,
    k: int = MINHASH_K,
    text_col: str = "text",
    hash_method: str = "md5",
) -> DataFrame:
    """doc_id → k minhash values (per-seed minima over shingles).

    k seeded hash functions; the signature is the per-seed minimum —
    P[sig_j(A)=sig_j(B)] = Jaccard(A,B).

    ``hash_method='md5'`` (default) keeps signatures as 32-char hex so the
    DuckDB oracle reproduces them bit-for-bit; ``'xxhash64'`` is the
    production variant — each signature value shuffles as ONE bigint
    (~4× narrower shuffle rows), the right choice at 100 TB where the
    oracle is not in the loop. Same minhash guarantee either way.
    """
    sh = word_shingles(df, n=n, text_col=text_col)
    from icebergsql_spark.functions.hashing import seeded_hash

    aggs = [
        F.min(seeded_hash("shingle", j, hash_method)).alias(f"sig_{j}")
        for j in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    n: int = 1,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    text_col: str = "text",
    hash_method: str = "md5",
) -> DataFrame:
    """Near-dup candidate pairs (a < b) from banded minhash signatures.

    With ``hash_method='xxhash64'`` the band keys are bigints — the band
    self-join shuffles 8-byte keys instead of 32-char hex strings."""
    from icebergsql_spark.functions.hashing import combine_hash

    sigs = minhash_signatures(
        df, n=n, k=k, text_col=text_col, hash_method=hash_method
    )
    rows = k // bands
    band_cols = [
        combine_hash(
            [F.col(f"sig_{b * rows + r}") for r in range(rows)], hash_method
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", *band_cols)
    pairs = None
    for b in range(bands):
        left = banded.select(F.col("doc_id").alias("a"), F.col(f"band_{b}").alias("bv"))
        right = banded.select(F.col("doc_id").alias("b"), F.col(f"band_{b}").alias("bv"))
        p = left.join(right, "bv").filter(F.col("a") < F.col("b")).select("a", "b")
        pairs = p if pairs is None else pairs.unionAll(p)
    return pairs.distinct()


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-set Jaccard over all pairs (or candidate pairs): returns
    (a, b, jaccard) with jaccard >= threshold. The shingle equi-join computes
    |A∩B| without materializing the cross product.

    Scale shape (the 100 TB path):
      - With ``candidates``, the intersection is CANDIDATE-DRIVEN: explode
        each candidate pair by A's shingles (one equi-join on doc id), then
        match against B's shingles (one equi-join on (doc id, shingle)).
        Total work is O(Σ|A| over candidate pairs) — proportional to the
        LSH candidate set, independent of corpus size — and the candidate
        subtree is referenced ONCE (a semi-join formulation re-evaluates
        the whole MinHash pipeline per reference; measured 2.7× slower).
      - ``max_df`` drops shingles appearing in more than ``max_df`` docs
        before any join — the hot-key guard: a stopword shingle shared by
        f docs alone generates f² join rows and a straggler partition.
        Jaccard is then computed over the capped shingle sets (sizes use
        the same capped sets, so |A∪B| stays consistent).
    """
    sh = word_shingles(df, n=n, text_col=text_col)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        sh_a = sh.select(F.col("doc_id").alias("a"), "shingle")
        sh_b = sh.select(F.col("doc_id").alias("b"), "shingle")
        common = (
            candidates.join(sh_a, "a")
            .join(sh_b, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("a"), "shingle")
        b = sh.select(F.col("doc_id").alias("b"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    n: int = 1,
    threshold: float = 0.9,
    text_col: str = "text",
    candidates: DataFrame | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-superset detection: (a, b, cont_a, cont_b) where
    cont_a = |A∩B|/|A| — the containment coefficient. Catches partial
    copies (a quote, a boilerplate block, a doc embedded in a larger one)
    that symmetric Jaccard misses: a 100-word doc fully contained in a
    10k-word doc has Jaccard ≈ 0.01 but containment 1.0. Pairs survive
    when EITHER direction reaches ``threshold``.

    Same candidate-driven scale shape as ``jaccard_pairs`` (one equi-join
    per side, work O(Σ|A| over candidates), optional ``max_df`` hot-key
    guard); only the denominator differs.
    """
    sh = word_shingles(df, n=n, text_col=text_col)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        sh_a = sh.select(F.col("doc_id").alias("a"), "shingle")
        sh_b = sh.select(F.col("doc_id").alias("b"), "shingle")
        common = (
            candidates.join(sh_a, "a")
            .join(sh_b, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        a = sh.select(F.col("doc_id").alias("a"), "shingle")
        b = sh.select(F.col("doc_id").alias("b"), "shingle")
        common = (
            a.join(b, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn("cont_a", F.round(F.col("common") / F.col("sz_a"), 6))
        .withColumn("cont_b", F.round(F.col("common") / F.col("sz_b"), 6))
        .filter(
            (F.col("common") / F.col("sz_a") >= threshold)
            | (F.col("common") / F.col("sz_b") >= threshold)
        )
        .select("a", "b", "cont_a", "cont_b")
    )


_hex_bit = _hex_bit_fn  # portable per-bit token hash (functions.hashing)


def simhash16(
    df: DataFrame, text_col: str = "text", hash_method: str = "md5"
) -> DataFrame:
    """16-bit SimHash over the token multiset: per-bit majority vote.
    One explode + one aggregate — shuffle keyed by doc_id.
    ``hash_method='xxhash64'``: native bigint token hash + bit-shift vote
    (no hex-char decode) — the production path."""
    from icebergsql_spark.functions.hashing import hash_bit, seeded_hash

    toks = ensure_parallelism(df).select(
        "doc_id", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn(
        "h",
        F.md5(F.col("tok")) if hash_method == "md5"
        else seeded_hash("tok", 0, hash_method),
    )
    votes = [
        F.sum(hash_bit(F.col("h"), j, hash_method) * 2 - 1).alias(f"v_{j}")
        for j in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(16):
        bit = F.when(F.col(f"v_{j}") > 0, 2**j).otherwise(0)
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("int").alias("simhash"))


def simhash64(
    df: DataFrame, text_col: str = "text", hash_method: str = "xxhash64"
) -> DataFrame:
    """Production-width 64-bit SimHash (round 7): per-bit majority vote
    over the token multiset, assembled into one signed BIGINT — the width
    real near-dup pipelines run at (16 bits saturates: birthday collisions
    at ~2^8 docs; 64 bits holds to ~2^32).

    ``hash_method='xxhash64'`` (production): ONE Spark-native bigint hash
    per token feeds all 64 bit votes via shift-and-mask — no hex decode,
    narrow shuffle. No DuckDB twin, so gates validate it by invariant
    (identical texts → identical hash; banded pair recall equals the
    md5 family's on the clone corpus).

    ``hash_method='md5'`` (oracle-portable): bit j reads the parity of
    hex char j%32 of md5('<j//32>:' || tok) — two seeded digests cover
    64 bits with the ascii/substr/md5 primitives DuckDB reproduces
    bit-identically.

    Bit 63 is the sign bit: its weight is Long.MIN_VALUE in both engines
    (DuckDB raises on 1<<63, so assembly inlines power literals; the sum
    of distinct powers stays in-range at every partial step because the
    positive bits total at most 2^63-1 and the sign term is added last).
    """
    from icebergsql_spark.functions.hashing import seeded_hash

    toks = ensure_parallelism(df).select(
        "doc_id",
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    if hash_method == "xxhash64":
        toks = toks.withColumn("h", seeded_hash("tok", 0, "xxhash64"))

        def bit(j):
            return F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))

    elif hash_method == "md5":
        toks = toks.withColumn("h0", seeded_hash("tok", 0, "md5")).withColumn(
            "h1", seeded_hash("tok", 1, "md5")
        )

        def bit(j):
            src = "h0" if j < 32 else "h1"
            return F.ascii(F.substring(F.col(src), (j % 32) + 1, 1)) % 2

    else:
        raise ValueError(f"unknown hash method {hash_method!r}")
    votes = [
        F.sum(bit(j).cast("long") * 2 - 1).alias(f"v_{j}") for j in range(64)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(64):
        w = -(1 << 63) if j == 63 else (1 << j)
        bitw = F.when(F.col(f"v_{j}") > 0, F.lit(w)).otherwise(F.lit(0))
        sim = bitw if sim is None else sim + bitw
    return agg.select("doc_id", sim.cast("bigint").alias("simhash"))


def simhash64_band_pairs(
    sh: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Banded Hamming near-dup pairs over 64-bit simhashes: 4 bands of 16
    bits each; by pigeonhole, two hashes within Hamming distance 3 agree
    on at least one full band, so the band equi-join's candidate set is
    COMPLETE at ≤3 — no all-pairs cross join anywhere. Arithmetic-vs-
    logical shift ambiguity on the sign-carrying high band is masked away
    (`(h >> 16k) & 65535` reads the same 16 bits in Spark and DuckDB).
    Exact bit_count(a^b) verify on the candidate set, distinct pairs."""
    from icebergsql_spark.operators.util import track_cache

    h = sh.select(F.col(id_col).alias("id"), F.col("simhash").alias("h"))
    bands = h.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.expr(f"(h >> {16 * k}) & 65535").alias("bv"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "h", F.col("b.band").alias("band"), F.col("b.bv").alias("bv"))
    # 4 small rows per doc, referenced twice (both join sides) — cache so
    # the token-explode vote aggregate behind simhash64 runs once
    bands = track_cache(bands)
    left = bands.select(
        F.col("id").alias("a"), F.col("h").alias("ha"), "band", "bv"
    )
    right = bands.select(
        F.col("id").alias("b"), F.col("h").alias("hb"), "band", "bv"
    )
    return (
        left.join(right, ["band", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.expr("bit_count(ha ^ hb)").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.45,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter: str = "blas",
) -> DataFrame:
    """Bucketed (scale-path) cosine near-dup: sign-bit LSH bucket both
    sides, equi-join on bucket with 1-bit multi-probe, exact cosine verify.

    Replaces the all-pairs ``a < b`` non-equi join (a broadcast nested loop,
    O(n²)) with a shuffle equi-join keyed by the integer bucket: side B is
    exploded over the n_bits+1 XOR masks {0, 1, 2, ..., 2^(n_bits-1)} so a
    pair whose buckets differ in at most ONE sign bit (a vector sitting on a
    hyperplane boundary) still meets. For a fixed pair the matching mask is
    unique (mask = bucket_a XOR bucket_b), so no dedup pass is needed.
    Shuffle volume is O(n·(n_bits+1)); per-bucket work is quadratic only
    within a bucket — check operators.similarity.bucket_histogram before
    trusting the layout. Pairs with Hamming distance > 1 are missed by
    design (recall/throughput trade, tunable via n_bits).

    ``prefilter='blas'`` (default): per-bucket numpy GEMM selects the
    candidate pairs (with a 1e-9 margin so no true pair is lost to float
    summation order), then the tiny survivor set is re-scored with the
    oracle-exact sequential fold — same output bits, ~7× less wall time
    than folding every candidate pair (see similarity.bucketed_scores_blas).
    ``prefilter='fold'`` keeps the all-JVM equi-join + per-pair fold."""
    from icebergsql_spark.functions import signbit_bucket
    from icebergsql_spark.operators import similarity

    if prefilter == "blas":
        cand = similarity.bucketed_scores_blas(
            df, n_bits=n_bits, id_col=id_col, vec_col=vec_col,
            threshold=threshold, pairs="lt",
        ).select("a", "b")
        return (
            similarity.exact_rescore(cand, df, id_col=id_col, vec_col=vec_col)
            .filter(F.col("cos") >= threshold)
            .select("a", "b", F.round("cos", 4).alias("cos"))
        )

    base = with_double_vec_and_norm(df, vec_col).withColumn(
        "bucket", signbit_bucket(vec_col, n_bits)
    )
    a = base.select(
        F.col(id_col).alias("a"),
        F.col("vd").alias("va"),
        F.col("nrm").alias("na"),
        F.col("bucket").alias("ba"),
    )
    masks = F.array(*[F.lit(m) for m in [0] + [1 << j for j in range(n_bits)]])
    b = (
        base.withColumn("m", F.explode(masks))
        .select(
            F.col(id_col).alias("b"),
            F.col("vd").alias("vb"),
            F.col("nrm").alias("nb"),
            F.expr("cast(bucket ^ m as int)").alias("pb"),
        )
    )
    return (
        a.join(b, (F.col("ba") == F.col("pb")) & (F.col("a") < F.col("b")))
        .withColumn("cos", dot_expr("va", "vb") / F.sqrt(F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 50
) -> DataFrame:
    """Connected components of the near-dup pair graph → (node, component),
    component = smallest doc id reachable. The dedup-group primitive: keep
    ``node == component``, drop the rest.

    Min-label propagation (the Pregel/GraphX CC algorithm): each round every
    node takes the min of its own label and its neighbors' labels; converges
    in graph-diameter rounds — near-dup clusters are shallow (dup groups,
    not social graphs), so rounds stay single-digit in practice. Each round
    is one shuffle join + one aggregate; the convergence check is a driver
    action by necessity (iterate-until-fixpoint is not expressible as one
    Catalyst plan). ``localCheckpoint`` truncates lineage so plan size stays
    constant across rounds.
    """
    edges = pairs.select(
        F.col(a_col).cast("long").alias("src"), F.col(b_col).cast("long").alias("dst")
    )
    edges = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nmin"))
        )
        # the moved flag rides along in the SAME materialization, so the
        # convergence check is a cheap scan of the checkpointed frame
        # instead of an extra old-vs-new shuffle join per round
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))).alias(
                    "new_comp"
                ),
                (F.coalesce(F.col("nmin"), F.col("comp")) < F.col("comp")).alias(
                    "moved"
                ),
            )
            .localCheckpoint()
        )
        labels = new_labels.select("node", F.col("new_comp").alias("comp"))
        if new_labels.filter(F.col("moved")).isEmpty():
            break
    return labels.select(F.col("node"), F.col("comp").alias("component"))


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.45,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefilter: str = "blas",
) -> DataFrame:
    """All-pairs cosine near-dup (a < b, cos >= threshold). Quadratic: the
    small-n verification baseline for embedding_neardup_pairs_lsh, which is
    the headline (bucketed, equi-join) path at scale.

    ``prefilter='blas'`` (default, r15): the n² candidate scoring runs as
    ONE numpy GEMM (``bucketed_scores_blas`` with the degenerate
    single-bucket id), with a 1e-9 margin so no true pair is lost to
    summation-order noise, and only survivors are re-scored with the
    oracle-exact sequential fold — same output bits as the all-JVM
    nested-loop fold, which evaluated the 64-element interpreted lambda
    once per PAIR (measured 4.5 s for 2M pairs at sf0.1). The single
    group is executor-side and bounded by the baseline's own quadratic
    small-n contract. ``prefilter='fold'`` keeps the pure-JVM plan."""
    if prefilter == "blas":
        from icebergsql_spark.operators import similarity

        cand = similarity.bucketed_scores_blas(
            df, n_bits=0, id_col=id_col, vec_col=vec_col,
            threshold=threshold, pairs="lt",
        ).select("a", "b")
        return (
            similarity.exact_rescore(cand, df, id_col=id_col, vec_col=vec_col)
            .filter(F.col("cos") >= threshold)
            .select("a", "b", F.round("cos", 4).alias("cos"))
        )
    base = with_double_vec_and_norm(df, vec_col)
    a = base.select(F.col(id_col).alias("a"), F.col("vd").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col(id_col).alias("b"), F.col("vd").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", dot_expr("va", "vb") / F.sqrt(F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.round("cos", 4).alias("cos"))
    )


def span_overlap_pairs(
    df: DataFrame,
    n: int = 5,
    min_shared: int = 5,
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Verbatim-span dedup: pairs sharing >= ``min_shared`` distinct word
    ``n``-gram SPANS, with span containment |S_A ∩ S_B| / min(|S_A|,|S_B|).

    The distributed approximation of suffix-array substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better"):
    a long verbatim overlap of length L words shows up as L-n+1 shared
    n-gram spans, so thresholding shared-span count finds copied passages
    while unigram Jaccard stays low. Long spans (n>=5) are naturally
    selective — df explosion is milder than unigram shingles — and
    ``max_df`` guards residual boilerplate spans (the hot-key rule as
    jaccard_pairs).

    Scale shape: one explode O(words), optional df-cap semi-join, one
    equi-join on the span key (rare keys only), one pair aggregation.
    Never materializes a doc-pair cross product.
    """
    sh = word_shingles(df, n=n, text_col=text_col)
    if max_df is not None:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_spans"))
        .filter(F.col("shared_spans") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            "shared_spans",
            F.round(
                F.col("shared_spans") / F.least(F.col("sz_a"), F.col("sz_b")), 6
            ).alias("span_containment"),
        )
    )


def neardup_tier_eval(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    text_col: str = "text",
    hash_method: str = "md5",
) -> DataFrame:
    """Precision/recall of the banded-LSH candidate tier against exact
    n-gram Jaccard ground truth — the calibration harness that tells a
    100 TB dedup pipeline whether its band configuration is recalling
    the duplicates it claims to (dedup_minhash_calibration's decision-
    level sibling: that gate audits the ESTIMATOR error, this one audits
    the CANDIDATE SET itself).

    Run it on a BOUNDED slice (the caller filters df): ground truth is
    exact all-pairs Jaccard, so slice size governs cost; the verdict
    transfers because band collision probability depends only on the
    similarity, not the corpus size. Returns one row of exact integer
    counts plus ppm precision/recall (floor division, engine-identical):
    hits are truth pairs the LSH tier surfaced; precision penalizes
    wasted verification work, recall is the miss rate of the tier.
    """
    truth = jaccard_pairs(
        df, n=n, threshold=threshold, text_col=text_col
    ).select("a", "b", F.lit(1).alias("in_truth"))
    cand = lsh_candidate_pairs(
        df, n=n, text_col=text_col, hash_method=hash_method
    ).select("a", "b", F.lit(1).alias("in_cand"))
    joined = truth.join(cand, ["a", "b"], "full_outer")
    return joined.agg(
        F.sum(F.coalesce(F.col("in_truth"), F.lit(0)))
        .cast("bigint")
        .alias("n_truth"),
        F.sum(F.coalesce(F.col("in_cand"), F.lit(0)))
        .cast("bigint")
        .alias("n_candidates"),
        F.sum(
            F.when(
                F.col("in_truth").isNotNull() & F.col("in_cand").isNotNull(),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_hits"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.expr(
            "CASE WHEN n_candidates = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (n_hits * 1000000) DIV n_candidates END"
        ).alias("precision_ppm"),
        F.expr(
            "CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (n_hits * 1000000) DIV n_truth END"
        ).alias("recall_ppm"),
    )
