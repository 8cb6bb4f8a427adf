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
