"""BLAS-path ANN vs exact-fold ANN: same ranking, ~equal scores."""

from __future__ import annotations

from icebergsql_spark.operators import similarity
from tests.conftest import SF_SMOKE


def test_blas_topk_matches_exact(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    exact = similarity.brute_force_topk(emb, query_id=7, k=10).collect()
    blas = similarity.brute_force_topk_blas(emb, query_id=7, k=10).collect()
    assert [r["vec_id"] for r in exact] == [r["vec_id"] for r in blas]
    # both round to 4dp; fold vs GEMV raw values differ ~1e-15, so the
    # rounded scores coincide
    assert [r["cos"] for r in exact] == [r["cos"] for r in blas]
