"""BLAS-path ANN vs exact-fold ANN: same ranking, ~equal scores."""

from __future__ import annotations

from icebergsql_spark.operators import similarity
from tests.conftest import SF_SMOKE


def test_blas_topk_matches_exact(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = similarity.brute_force_topk(emb, query_id=7, k=10).collect()
    # default path: GEMV candidates + exact-fold rescore → bit-identical
    blas = similarity.brute_force_topk_blas(emb, query_id=7, k=10).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in blas]
    # raw GEMV path: same ranking, rounded scores coincide (~1e-15 noise)
    raw = similarity.brute_force_topk_blas(
        emb, query_id=7, k=10, rescore_exact=False
    ).collect()
    assert [r["vec_id"] for r in exact] == [r["vec_id"] for r in raw]
    assert [r["cos"] for r in exact] == [r["cos"] for r in raw]


def test_kmv_estimate_accuracy(spark):
    """KMV with k=256 has ~1/sqrt(k) ≈ 6% relative error; assert a
    generous 20% band plus exactness below k."""
    from icebergsql_spark.operators import sketch
    from pyspark.sql import functions as F

    df = spark.range(10000).select((F.col("id") % 5000).alias("v"))
    est = sketch.kmv_distinct_estimate(df, "v").collect()[0].dv_estimate
    assert abs(est - 5000) / 5000 < 0.20, est

    small = spark.range(100).select(F.col("id").alias("v"))
    assert sketch.kmv_distinct_estimate(small, "v").collect()[0].dv_estimate == 100

    # merge == sketch of the union
    a = spark.range(3000).select(F.col("id").alias("v"))
    b = spark.range(1500, 4500).select(F.col("id").alias("v"))
    merged = sketch.kmv_union_estimate(
        [sketch.kmv_sketch(a, "v"), sketch.kmv_sketch(b, "v")], "u"
    ).collect()[0].dv_estimate
    direct = sketch.kmv_distinct_estimate(
        a.union(b), "v"
    ).collect()[0].dv_estimate
    assert merged == direct
