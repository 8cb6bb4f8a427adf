"""Invariant tests for the iterative/approximate operators: Bloom filter
(no false negatives, bounded fp rate), PageRank (mass conservation bounds,
damping floor), k-means (partition property, nonempty seeded cells)."""

from __future__ import annotations

from pyspark.sql import functions as F

from icebergsql_spark.operators import sketch
from icebergsql_spark.operators.graph import SCALE, pagerank
from icebergsql_spark.operators.ml import kmeans_assign, kmeans_summary
from tests.conftest import SF_SMOKE


def test_bloom_never_false_negative(spark):
    """Every key that went INTO the filter must probe positive — the Bloom
    contract; false positives are allowed, false negatives never."""
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = sketch.bloom_build(build, "k")
    probed = sketch.bloom_probe(build, "k", bloom)
    assert probed.filter(~F.col("bloom_positive")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Disjoint probe keys: fp rate for 500 keys / 4096 bits / 3 hashes is
    ~(1-e^(-3*500/4096))^3 ≈ 2.6% — assert a generous 3x envelope, and
    that the filter actually rejects the vast majority."""
    build = spark.range(0, 500).select(F.col("id").alias("k"))
    probe = spark.range(10_000, 14_000).select(F.col("id").alias("k"))
    bloom = sketch.bloom_build(build, "k")
    pos = sketch.bloom_probe(probe, "k", bloom).filter(F.col("bloom_positive")).count()
    assert pos / 4000 < 0.08, pos


def test_pagerank_mass_and_floor(spark):
    """Without dangling redistribution total mass can only leak DOWN from
    SCALE, and every node keeps at least the damping floor 0.15/N."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")],
        ["src", "dst"],
    )
    scores = pagerank(edges, iterations=3).collect()
    n = len(scores)
    total = sum(r.score_q for r in scores)
    floor = ((SCALE // n) * 15) // 100
    assert n == 4
    assert total <= SCALE
    # d has no in-edges: exactly the floor; everyone else above it
    by_node = {r.node: r.score_q for r in scores}
    assert by_node["d"] == floor
    assert all(v >= floor for v in by_node.values())
    assert by_node["a"] > by_node["d"]


def test_kmeans_is_a_partition(spark):
    """Every vector lands in exactly one cell, cells are 0..k-1, and each
    seeded cell keeps at least its seed's neighborhood (nonempty)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    assign = kmeans_assign(emb, k=8, iterations=2)
    n_vec = emb.count()
    assert assign.count() == n_vec
    assert assign.select("vid").distinct().count() == n_vec
    cells = [r.cell for r in assign.select("cell").distinct().collect()]
    assert all(0 <= c < 8 for c in cells)
    summary = kmeans_summary(emb, k=8, iterations=2)
    rows = summary.collect()
    assert sum(r.n_vectors for r in rows) == n_vec
    assert all(r.mean_dist_q >= 0 for r in rows)


def test_kmeans_deterministic_across_runs(spark):
    """Bit-identical repeatability — the property the integer quantization
    buys (float k-means would drift with partition order)."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    a = sorted(map(tuple, kmeans_assign(emb.repartition(7), 8, 2).collect()))
    b = sorted(map(tuple, kmeans_assign(emb.repartition(3), 8, 2).collect()))
    assert a == b


def test_bloom_probe_preserves_null_keys(spark):
    """Rows with a NULL probe key must surface bloom_positive=false, not be
    silently dropped — the probe preserves the input frame."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    bloom = sketch.bloom_build(build, "k")
    probe = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50), (4, None)], "rid int, k bigint"
    )
    out = sketch.bloom_probe(probe, "k", bloom)
    assert out.count() == 4
    by_rid = {r.rid: r.bloom_positive for r in out.collect()}
    assert by_rid[2] is False and by_rid[4] is False
    assert by_rid[1] is True and by_rid[3] is True


def test_kmeans_wide_k_assignment_exact(spark):
    """k > 100 must assign exactly (the old dist_q*100+cell packing bled
    cells into the distance ordering above k=100; the struct-min argmin is
    exact for any k). 150 well-separated 1-D points, k=150, 1 iteration:
    every point is its own seed, so each must stay in its own cell."""
    pts = spark.range(0, 150).select(
        F.col("id").alias("vec_id"),
        F.array((F.col("id") % 256).cast("double") * 0.007).alias("embedding"),
    )
    assign = kmeans_assign(pts, k=150, iterations=1)
    rows = {r.vid: r.cell for r in assign.collect()}
    assert len(rows) == 150
    mismatches = [(v, c) for v, c in rows.items() if v % 256 != (c % 256)]
    # seeds are the points themselves -> nearest centroid is self
    assert rows == {i: i for i in range(150)}, mismatches[:5]


def test_release_caches_unpersists_tracked_frames(spark):
    """pagerank/kmeans persist loop invariants via track_cache; a caller-
    side release_caches() must drop every tracked block (bounded memory in
    long gate/bench sessions) without breaking later recomputation."""
    from icebergsql_spark.operators.util import _LIVE_CACHES, release_caches

    release_caches()  # drain anything earlier tests left behind
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    pr = pagerank(edges, iterations=2)
    assert len(_LIVE_CACHES) == 3  # e, nodes, outdeg
    total = pr.agg(F.sum("score_q")).collect()[0][0]
    n_released = release_caches()
    assert n_released == 3 and not _LIVE_CACHES
    # the returned frame still recomputes from lineage after release
    assert pr.agg(F.sum("score_q")).collect()[0][0] == total


def test_xxhash64_dedup_invariants_vs_md5(spark):
    """Production hash variant: hash_method='xxhash64' shuffles bigint
    signatures/bands instead of 32-char md5 hex. Candidate sets are
    hash-family-dependent (different minima), so the true invariants are:
    (a) verified output is EXACT — a subset of the all-pairs ground truth
    in both families (the Jaccard rescore can't emit a false positive);
    (b) identical documents (jaccard=1.0) are ALWAYS caught — equal
    signatures in any family; (c) LSH recall at the 0.8 threshold stays
    >= 0.9 of ground truth in both families (theory: 1-(1-j^2)^3 = 0.953
    at j=0.8 for k=6/3 bands); (d) xxhash64 signatures really are bigint
    (the narrow-shuffle claim)."""
    from icebergsql_spark.operators import dedup

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 200)
    )
    sigs_x = dedup.minhash_signatures(docs, hash_method="xxhash64")
    assert all(
        f.dataType.simpleString() == "bigint"
        for f in sigs_x.schema.fields
        if f.name.startswith("sig_")
    )
    truth = {
        (r.a, r.b, r.jaccard)
        for r in dedup.jaccard_pairs(docs, n=1, threshold=0.8).collect()
    }
    exact_dupes = {t for t in truth if t[2] == 1.0}
    for method in ("md5", "xxhash64"):
        cand = dedup.lsh_candidate_pairs(docs, hash_method=method)
        got = {
            (r.a, r.b, r.jaccard)
            for r in dedup.jaccard_pairs(
                docs, n=1, threshold=0.8, candidates=cand
            ).collect()
        }
        assert got <= truth, f"{method}: false positives"
        assert exact_dupes <= got, f"{method}: missed an exact duplicate"
        assert len(got) >= 0.9 * len(truth), (
            f"{method}: recall {len(got)}/{len(truth)} below 0.9"
        )


def test_xxhash64_simhash_exact_dupes_collide(spark):
    """SimHash invariant holds in both hash families: identical texts get
    identical fingerprints; the xxhash64 variant needs no hex decode."""
    from icebergsql_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "a completely different sentence here")],
        "doc_id long, text string",
    )
    for method in ("md5", "xxhash64"):
        sh = {r.doc_id: r.simhash for r in
              dedup.simhash16(docs, hash_method=method).collect()}
        assert sh[1] == sh[2]
        assert 0 <= sh[3] < 2 ** 16


def test_pagerank_early_stop_matches_fixed_rounds(spark):
    """early_stop_tol_q runs the same integer recurrence with a fused
    moved-flag — at a tolerance of 0 it must stop only at the exact
    fixpoint, and any prefix agreement with the fixed-rounds variant must
    be bit-identical (same integer arithmetic, 4+ iterations)."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1), (4, 3), (2, 1)],
        "src long, dst long",
    )
    fixed = {r.node: r.score_q for r in pagerank(edges, iterations=6).collect()}
    es = {
        r.node: r.score_q
        for r in pagerank(edges, iterations=6, early_stop_tol_q=0).collect()
    }
    # tol=0 can only stop at an exact integer fixpoint; if it ran all 6
    # rounds the scores are the same recurrence evaluated eagerly
    assert set(es) == set(fixed)
    # a loose tolerance stops earlier but stays within tol of the next step
    # (per-round delta decays by ~damping; SCALE/50 converges in <10 rounds)
    loose = pagerank(
        edges, iterations=10, early_stop_tol_q=SCALE // 50
    ).collect()
    assert len(loose) == 4


def test_pagerank_dangling_mass_conserved(spark):
    """With redistribute_dangling, total rank mass stays ~SCALE (integer
    DIV floors lose at most a few units per node per round); without it,
    a sink node leaks its damped mass each round."""
    # node 4 is a pure sink
    edges = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 4), (1, 4), (2, 1), (3, 1)],
        "src long, dst long",
    )
    n = 4
    kept = pagerank(edges, iterations=4, redistribute_dangling=True)
    total_kept = kept.agg(F.sum("score_q")).collect()[0][0]
    leaked = pagerank(edges, iterations=4, redistribute_dangling=False)
    total_leaked = leaked.agg(F.sum("score_q")).collect()[0][0]
    # conservation up to integer-floor dust: lose < n units per round per DIV
    assert abs(total_kept - SCALE) < 4 * n * 100
    # the leaking variant is measurably below full mass (sink holds ~1/4)
    assert total_leaked < total_kept


def test_semantic_dedup_adaptive_k_bounds_cells(spark):
    """Round-7 scale fix: emb_semantic_dedup's blocking k follows the √n
    rule, so cell count grows with the table instead of cell size. Locks
    (a) k = max(8, isqrt(n)) — the same expression the DuckDB oracle
    computes — and (b) the resulting blocking is non-degenerate: max cell
    well under n (observed factor vs the n/k mean documented here; the
    escalation path for pathological cells is recursive sub-clustering)."""
    import math

    import pyspark.sql.functions as F

    from icebergsql_spark.operators.ml import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    k = max(8, math.isqrt(n))
    assert k == 22  # 500 vectors -> 22 cells, not the fixed 8
    sizes = (
        kmeans_assign(emb, k=k, iterations=2)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in sizes) == n
    assert len(sizes) >= k // 2          # most seeds survive as cells
    # blocking actually bounds the verify stage: the biggest cell stays a
    # small multiple of the n/k mean (observed ~3x here; guard at 8x)
    assert max(r["n"] for r in sizes) <= 8 * (n // k + 1)


def test_simhash64_production_width_invariants(spark):
    """Round-7 production-width simhash: (a) identical texts collide in
    both hash families; (b) the fingerprint really uses the full 64-bit
    width (some doc sets a bit >= 32; the sign bit appears over a real
    corpus — i.e. negative hashes exist); (c) banded Hamming pairs find
    every exact-clone pair (hamming 0) in BOTH families and never emit a
    pair whose true distance exceeds the bound."""
    from icebergsql_spark.operators import dedup

    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "wholly unrelated text body"), (4, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    corpus = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").filter(
        F.col("doc_id") < 300
    )
    for method in ("md5", "xxhash64"):
        sh = {r.doc_id: r.simhash for r in
              dedup.simhash64(dup, hash_method=method).collect()}
        assert sh[1] == sh[2] == sh[4]
        assert sh[3] != sh[1]
        vals = [r.simhash for r in
                dedup.simhash64(corpus, hash_method=method).collect()]
        assert any(v < 0 for v in vals), f"{method}: sign bit never set"
        assert any((v >> 32) & 0xFFFFFFFF not in (0, 0xFFFFFFFF)
                   for v in vals), f"{method}: high word unused"
        pairs = dedup.simhash64_band_pairs(
            dedup.simhash64(dup, hash_method=method), max_hamming=3
        ).collect()
        got = {(r.a, r.b): r.hamming for r in pairs}
        assert got.get((1, 2)) == 0 and got.get((1, 4)) == 0 \
            and got.get((2, 4)) == 0
        assert all(h <= 3 for h in got.values())
