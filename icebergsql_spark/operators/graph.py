"""Iterative graph algorithms as chained DataFrame plans.

PageRank here is the "iterative algorithm on a relational engine" pattern
(complements dedup.connected_components): a FIXED number of join+aggregate
rounds composed lazily into one DAG — no driver-side .count()/.collect()
between rounds, so Catalyst/AQE still own the whole physical plan and the
shuffle count is exactly `iterations` (plus one for out-degrees).

Determinism: scores are held as scaled BIGINTs and every update step is
integer arithmetic (integer division by out-degree, integer damping
`85*s DIV 100`), so results are exact, order-independent, and
bit-identical to the DuckDB oracle's chained-CTE replica. The float
round-off of textbook PageRank is the price; ranking quality is the same.
Dangling-node mass is dropped (not redistributed) — callers that need the
textbook variant can add the constant-per-iteration correction, but for
dedup/importance pipelines the ranking is what matters.

Scale: each iteration is one shuffle on dst (the aggregate); the
scores⋈edges join reuses the edges partitioning when edges are bucketed
by src. At 100 TB the edge list dominates — scores are O(nodes) and
stay hash-partitioned; no per-iteration driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-quantized PageRank over an edge list.

    Returns (node, score_q) with score_q the scaled-bigint rank after
    ``iterations`` rounds from a uniform start of SCALE/N per node.
    """
    # Loop-invariant frames (edge list, node list, out-degrees) are
    # referenced by every iteration of the lazy DAG; without persistence
    # Spark re-derives them — including whatever joins produced `edges` —
    # once per reference. Caching the iteration-invariant state is the
    # canonical Spark pattern for iterative algorithms (same reasoning as
    # GraphX/MLlib); it is storage, not a driver action, so the DAG still
    # plans end-to-end.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # N as a broadcast 1-row aggregate column — no driver action; the same
    # lazy DAG carries the constant through every iteration.
    n_row = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od")).persist()

    base = nodes.crossJoin(F.broadcast(n_row))
    scores = base.select("node", F.expr(f"{SCALE} DIV n").alias("q"))
    for _ in range(iterations):
        # scores(i) is referenced exactly ONCE per round (the contrib join)
        # and the new frame rebuilds from the cached node list — lineage
        # stays linear in `iterations` instead of doubling per round.
        contrib = (
            e.join(
                scores.select(F.col("node").alias("src"), F.col("q").alias("src_q")),
                "src",
            )
            .join(outdeg, "src")
            .select("dst", F.expr("src_q DIV od").alias("share"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("share").alias("s"))
        scores = (
            base.join(inflow.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.expr(
                    f"((({SCALE} DIV n) * 15) DIV 100)"
                    f" + (({damping_pct} * coalesce(s, CAST(0 AS BIGINT))) DIV 100)"
                ).alias("q"),
            )
        )
    return scores.select("node", F.col("q").alias("score_q"))
