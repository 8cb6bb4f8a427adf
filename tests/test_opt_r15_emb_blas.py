"""Round-15 optimization locks: BLAS candidate paths stay bit-identical.

1. ``embedding_neardup_pairs(prefilter='blas')`` (one GEMM candidate
   pass + oracle-exact fold rescore) must emit exactly the rows of the
   all-JVM nested-loop fold — the margin argument proven for the LSH
   path in round 5, applied to the all-pairs baseline.
2. ``signbit_bucket(n_bits=0)`` is the degenerate single-bucket id the
   global candidate pass relies on.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from icebergsql_spark.operators.dedup import embedding_neardup_pairs


def _vecs(spark, n=60, dims=8, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(n)
    ]
    # plant a few exact near-dups so the threshold band is populated
    rows += [(n + j, [v * 1.01 for v in rows[j][1]]) for j in range(5)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blas_prefilter_bit_identical(spark):
    df = _vecs(spark)
    fold = embedding_neardup_pairs(df, threshold=0.45, prefilter="fold")
    blas = embedding_neardup_pairs(df, threshold=0.45, prefilter="blas")
    a = sorted(map(tuple, fold.collect()))
    b = sorted(map(tuple, blas.collect()))
    assert a == b and len(a) > 0


def test_signbit_bucket_zero_bits_single_bucket(spark):
    from icebergsql_spark.functions.vector import signbit_bucket

    df = _vecs(spark, n=10).withColumn("b", signbit_bucket("embedding", 0))
    assert df.select("b").distinct().collect() == [
        df.select("b").distinct().collect()[0]
    ]
    assert df.select(F.max("b"), F.min("b")).collect()[0] == (0, 0)
