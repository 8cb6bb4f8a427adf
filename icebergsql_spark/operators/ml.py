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

from pyspark.sql import DataFrame, Window as W
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
# --- to append to operators/ml.py after benches finish ---


def _assign_grouped(mem: DataFrame, cents: DataFrame) -> DataFrame:
    """Per-parent-cell 2-way assignment: centroids are keyed by (cell,
    sub), broadcast (2 rows per oversized cell), argmin by the same
    lexicographic (dist_q, sub) struct-min as ``_assign``."""
    scored = mem.join(F.broadcast(cents), "cell").select(
        "vid",
        "cell",
        F.struct(
            F.expr(
                "aggregate(zip_with(xq, cq, (a, b) -> (a - b) * (a - b)),"
                " CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dq"),
            F.col("sub"),
        ).alias("key"),
    )
    return scored.groupBy("vid", "cell").agg(
        F.min("key").getField("sub").cast("int").alias("sub")
    )


def _update_grouped(mem: DataFrame, sub: DataFrame) -> DataFrame:
    """Sub-centroid update keyed by (cell, sub) — the ``_update``
    integer-mean shuffle with a composite key."""
    exploded = mem.join(sub, ["vid", "cell"]).select(
        "cell", "sub", F.posexplode("xq").alias("pos", "q")
    )
    percoord = exploded.groupBy("cell", "sub", "pos").agg(
        F.expr("SUM(q) DIV COUNT(*)").alias("cq")
    )
    return percoord.groupBy("cell", "sub").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, cq))),"
            " s -> s.cq)"
        ).alias("cq")
    )


def kmeans_assign_bounded(
    df: DataFrame,
    k: int = 8,
    iterations: int = 2,
    max_cell_size: int = 1024,
    max_depth: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Size-bounded clustering: ``kmeans_assign`` rounds, then every cell
    larger than ``max_cell_size`` is recursively BISECTED (2-way k-means
    within the cell, seeded from its two smallest member ids) up to
    ``max_depth`` levels — the escalation path for pathological cells the
    sqrt(n)-adaptive semantic dedup documents (a near-duplicate-heavy
    corpus can put a constant fraction of all vectors in one k-means
    cell, and within-cell O(cell^2) pair work then defeats the blocking).

    Cell ids stay deterministic and collision-free: every depth remaps
    cell -> cell*2 (+ sub for split members), so unsplit lineages and
    split halves never collide. Degenerate cells (identical vectors —
    nothing separates) tie-break every member into sub 0 and stop
    shrinking; ``max_depth`` bounds the recursion, so termination never
    depends on separability.

    Scale shape: the oversized-cell list is metadata-sized (cells over
    the bound, not vectors), sub-centroids are a 2-rows-per-cell
    broadcast, and each depth is one join + one integer-mean shuffle over
    ONLY the oversized cells' members. localCheckpoint per depth keeps
    the unrolled lineage linear (the iterative-operator rule)."""
    from icebergsql_spark.operators.util import track_cache

    xq = track_cache(_quantized(df, vec_col, id_col))
    assign = _kmeans_core(xq, k, iterations)
    for _depth in range(max_depth):
        sizes = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
        big = [
            r["cell"]
            for r in sizes.filter(F.col("n") > max_cell_size).collect()
        ]
        if not big:
            break
        is_big = F.col("cell").isin(big)
        mem = track_cache(xq.join(assign, "vid").filter(is_big))
        w = W.partitionBy("cell").orderBy("vid")
        cents = (
            mem.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select(
                "cell",
                (F.col("rn") - 1).cast("int").alias("sub"),
                F.col("xq").alias("cq"),
            )
        )
        sub = None
        for _i in range(iterations):
            sub = _assign_grouped(mem, cents)
            cents = _update_grouped(mem, sub)
        sub = _assign_grouped(mem, cents)
        assign = (
            assign.filter(~is_big)
            .select("vid", (F.col("cell") * 2).cast("int").alias("cell"))
            .unionAll(
                sub.select(
                    "vid",
                    (F.col("cell") * 2 + F.col("sub")).cast("int").alias(
                        "cell"
                    ),
                )
            )
            .localCheckpoint()
        )
    return assign


def cov_sufficient_stats(
    df: DataFrame, dims: int = 8, vec_col: str = "embedding"
) -> tuple[int, list[int], list[list[int]]]:
    """EXACT integer covariance sufficient statistics over the first
    ``dims`` vector dimensions: one aggregate pass over q = round(x*1e6)
    bigints emits n, per-dim sums S_i, and per-pair product sums S_ij —
    partitioning-invariant by construction (bigint additions commute),
    so everything derived from them is a pure function of the data.
    The single collected row is dims(dims+3)/2 + 1 integers: bounded
    metadata, never row volume (the emb_cov_pairs gate plan, packaged
    as an operator input for whitening/PCA)."""
    qcols = [
        F.expr(
            f"CAST(round(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            f" * {SCALE}) AS BIGINT)"
        ).alias(f"q{i}")
        for i in range(dims)
    ]
    q = df.select(*qcols)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(f"q{i}").cast("bigint").alias(f"s{i}") for i in range(dims)]
    for i in range(dims):
        for j in range(i, dims):
            aggs.append(
                F.sum(F.col(f"q{i}") * F.col(f"q{j}"))
                .cast("bigint")
                .alias(f"s_{i}_{j}")
            )
    row = q.agg(*aggs).collect()[0]
    n = int(row["n"])
    s = [int(row[f"s{i}"]) for i in range(dims)]
    sij = [[0] * dims for _ in range(dims)]
    for i in range(dims):
        for j in range(i, dims):
            sij[i][j] = sij[j][i] = int(row[f"s_{i}_{j}"])
    return n, s, sij


def whitening_transform(
    df: DataFrame, dims: int = 8, vec_col: str = "embedding", eps: float = 1e-9
) -> tuple[list[float], list[list[float]]]:
    """ZCA whitening from exact covariance stats: returns (mean, W) with
    W = U diag(1/sqrt(l+eps)) U^T over the eigen-decomposition of the
    empirical covariance. The covariance matrix is built from EXACT
    bigint sufficient statistics (cov_sufficient_stats), so the numpy
    eigh input — and therefore W — is identical under any partitioning
    or retry; eigh itself is a deterministic bounded dims^3 solve on the
    driver (the same bounded-metadata budget as a k-means centroid
    table). Mean/W are in ORIGINAL units (quantization divides out)."""
    import numpy as np

    n, s, sij = cov_sufficient_stats(df, dims=dims, vec_col=vec_col)
    mean = [si / (n * SCALE) for si in s]
    cov = np.empty((dims, dims), dtype="float64")
    for i in range(dims):
        for j in range(dims):
            # exact integers until this single final division
            cov[i, j] = (n * sij[i][j] - s[i] * s[j]) / (
                float(n) * n * SCALE * SCALE
            )
    vals, vecs = np.linalg.eigh(cov)
    inv_sqrt = np.diag(1.0 / np.sqrt(np.maximum(vals, 0.0) + eps))
    w = vecs @ inv_sqrt @ vecs.T
    return mean, w.tolist()


def apply_whitening(
    df: DataFrame,
    mean: list[float],
    w: list[list[float]],
    dims: int = 8,
    vec_col: str = "embedding",
    out_col: str = "white",
) -> DataFrame:
    """Project vectors through a whitening transform as a narrow map:
    out_k = sum_i W[k][i] * (x_i - mean_i), expanded to a fixed
    per-dimension expression (sequential adds in index order — the
    deterministic fold idiom), with W/mean inlined as literals. Fuses
    into the scan under codegen; no shuffle, no UDF."""
    outs = []
    for k in range(dims):
        terms = " + ".join(
            f"({w[k][i]!r} * (CAST(element_at({vec_col}, {i + 1}) AS DOUBLE)"
            f" - {mean[i]!r}))"
            for i in range(dims)
        )
        outs.append(F.expr(terms).alias(f"{out_col}_{k}"))
    return df.select("*", *outs)
