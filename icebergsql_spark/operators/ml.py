"""Iterative ML primitives on the relational engine: integer-quantized
k-means.

Textbook k-means is float-order-dependent twice over (centroid means are
float sums; distance ties break arbitrarily), so distributed runs are not
reproducible and can never hash-match an oracle. This variant is EXACT:

- coordinates quantize once to shifted bigints  q = round(x*SCALE)+OFFSET
  (OFFSET makes every value non-negative, so truncating and flooring
  integer division agree across engines);
- distances are integer sums of squares — order-independent;
- the argmin is  min(struct(dist_q, cell))  — a lexicographic total
  order (smallest distance, then smallest cell id), so ties cannot
  diverge and the decode is exact for ANY k (the previous
  dist_q*100+cell packing silently corrupted assignments at k>100; the
  DuckDB oracles keep the packed form, which is identical for k<=100);
- centroid updates are integer  sum DIV count  (shift-invariant: distances
  in shifted space equal distances in the original space).

Every step is deterministic integer arithmetic, so Spark and DuckDB agree
bit-for-bit after any number of iterations — reproducible clustering, the
property that matters when a 100 TB corpus is bucketed for near-dup
removal and the run must be re-creatable.

Scale shape per iteration: distances ride a broadcast join against k
centroid rows + a narrow array fold (no shuffle); the update is ONE
shuffle of (k × dims) partial sums (posexplode + map-side combine).
Iterations compose lazily — no driver actions in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6
OFFSET = 2 * 10**6  # |x| < 2.0 → shifted coords always non-negative


def _quantized(df: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.expr(
            f"transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE) * {SCALE})"
            f" AS BIGINT) + {OFFSET})"
        ).alias("xq"),
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Cluster vectors; returns (vid, cell) after `iterations` rounds from
    centroids seeded by the vectors with ids 0..k-1."""
    # xq is referenced by every assign/update round — persist the
    # iteration-invariant quantized vectors (standard iterative-ML caching;
    # lineage stays a lazy DAG, no driver actions). track_cache registers
    # it so callers can release_caches() after materializing.
    from icebergsql_spark.operators.util import track_cache

    xq = track_cache(_quantized(df, vec_col, id_col))
    return _kmeans_core(xq, k, iterations)


def _kmeans_core(xq: DataFrame, k: int, iterations: int) -> DataFrame:
    """assign/update rounds over an already-cached quantized frame."""
    cents = (
        xq.filter(F.col("vid") < k)
        .select(F.col("vid").cast("int").alias("cell"), F.col("xq").alias("cq"))
    )
    assign = None
    for _ in range(iterations):
        assign = _assign(xq, cents)
        cents = _update(xq, assign)
    return _assign(xq, cents)


def _assign(xq: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector: broadcast k rows, integer fold, then a
    lexicographic struct-min argmin (dist_q, cell) — deterministic tie-break
    on the smallest cell id, exact for any k."""
    scored = xq.crossJoin(F.broadcast(cents)).select(
        "vid",
        F.struct(
            F.expr(
                "aggregate(zip_with(xq, cq, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dq"),
            F.col("cell"),
        ).alias("key"),
    )
    return scored.groupBy("vid").agg(
        F.min("key").getField("cell").cast("int").alias("cell")
    )


def _update(xq: DataFrame, assign: DataFrame) -> DataFrame:
    """New centroids: per-coordinate integer mean (sum DIV count) of the
    members — one shuffle of (k × dims) combined partials."""
    exploded = xq.join(assign, "vid").select(
        "cell", F.posexplode("xq").alias("pos", "q")
    )
    percoord = exploded.groupBy("cell", "pos").agg(
        F.expr("SUM(q) DIV COUNT(*)").alias("cq")
    )
    return percoord.groupBy("cell").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, cq))), s -> s.cq)").alias(
            "cq"
        )
    )


def kmeans_summary(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-cluster rollup: size, min/max member id, exact mean intra-cluster
    distance (quantized) — the oracle-checkable face of the clustering."""
    from icebergsql_spark.operators.util import track_cache

    # ONE cached quantized frame feeds both the clustering rounds and the
    # rollup below (previously this built a second persisted copy on top
    # of kmeans_assign's).
    xq = track_cache(_quantized(df, vec_col, id_col))
    assign = _kmeans_core(xq, k, iterations)
    cents = _update(xq, assign)
    dist = (
        xq.join(assign, "vid")
        .join(F.broadcast(cents), "cell")
        .select(
            "cell",
            "vid",
            F.expr(
                "aggregate(zip_with(xq, cq, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dq"),
        )
    )
    return (
        dist.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vid").alias("min_vid"),
            F.max("vid").alias("max_vid"),
            F.expr("SUM(dq) DIV COUNT(*)").alias("mean_dist_q"),
        )
        .orderBy("cell")
    )
