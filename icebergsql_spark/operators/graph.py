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
    early_stop_tol_q: int | None = None,
    redistribute_dangling: bool = False,
    edges_distinct: bool = False,
    broadcast_ranks: bool = False,
    broadcast_max_nodes: int = 10_000_000,
) -> DataFrame:
    """Integer-quantized PageRank over an edge list.

    Returns (node, score_q) with score_q the scaled-bigint rank after
    ``iterations`` rounds from a uniform start of SCALE/N per node.

    ``early_stop_tol_q``: when set, each round materializes (localCheckpoint,
    same fused moved-flag pattern as connected_components) and the loop
    stops once no node's score moved by more than the tolerance — the
    convergence check is a driver action by necessity, so the default
    (None) keeps the gate-friendly fixed-rounds single lazy DAG.

    ``redistribute_dangling``: textbook parity — the rank mass of nodes
    with no out-edges is redistributed uniformly each round (damped),
    instead of leaking out of the system. Integer-exact: the dangling sum
    is a 1-row broadcast aggregate folded into the same round expression.

    ``broadcast_ranks``: the vertex-broadcast formulation for graphs whose
    NODE set fits in executor memory even when the edge list does not
    (node count ≪ edge count is the common shape). The rank vector and
    out-degrees ride as broadcast hash relations, so the cached edge list
    is never re-shuffled: per iteration the only exchange is the map-side
    pre-aggregated contribution sum — O(tasks × nodes) shuffle bytes
    instead of O(edges). Node list and out-degrees are additionally
    derived in ONE pass over the edges (explode src/dst with an
    out-marker, one groupBy) instead of a union-distinct plus a second
    groupBy. Same integer recurrence, bit-identical scores.

    ``broadcast_max_nodes``: the broadcast path is an executor-memory
    assertion, so it is VERIFIED, not trusted — a bounded count over the
    cached node frame (which every iteration probes anyway, so the count
    doubles as the cache warm-up) degrades to the distributed iteration
    body when the node set exceeds the cap, instead of OOMing the
    broadcast build. 10M nodes ≈ 300 MB built hash relation — inside the
    "few hundred MB is fine" broadcast envelope and far from the 8 GB /
    512M-row hard cap. Scores are bit-identical on either body (locked
    in tests/test_opt_r14_pagerank.py / test_opt_r15_pagerank_guard.py).
    """
    # Loop-invariant frames (edge list, node list, out-degrees) are
    # referenced by every iteration of the lazy DAG; without persistence
    # Spark re-derives them — including whatever joins produced `edges` —
    # once per reference. Caching the iteration-invariant state is the
    # canonical Spark pattern for iterative algorithms (same reasoning as
    # GraphX/MLlib); it is storage, not a driver action, so the DAG still
    # plans end-to-end.
    from icebergsql_spark.operators.util import track_cache

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        # callers that already deduped their edge list pass
        # edges_distinct=True to skip this full shuffle of the edge list
        # (distinct-of-distinct is the identity — same rows either way)
        e = e.distinct()
    e = track_cache(e)
    if broadcast_ranks:
        # node list + out-degrees in ONE shuffle: explode each edge into
        # (src, 1) and (dst, 0) markers, sum per node — od = 0 marks sinks
        nd = track_cache(
            e.select(
                F.explode(
                    F.array(
                        F.struct(F.col("src").alias("node"), F.lit(1).alias("o")),
                        F.struct(F.col("dst").alias("node"), F.lit(0).alias("o")),
                    )
                ).alias("x")
            )
            .select("x.node", "x.o")
            .groupBy("node")
            .agg(F.sum("o").cast("bigint").alias("od"))
        )
        nodes = nd.select("node")
        outdeg = nd.filter(F.col("od") > 0).select(
            F.col("node").alias("src"), "od"
        )
        # size guard (see docstring): one bounded job over the cached node
        # frame; above the cap the iteration body degrades to distributed
        # joins (bit-identical recurrence). The known count also replaces
        # the n_row broadcast-aggregate subtree with a folded literal.
        n_nodes = nd.count()
        if n_nodes > broadcast_max_nodes:
            broadcast_ranks = False
            base = nodes.select(
                "node", F.lit(n_nodes).cast("bigint").alias("n")
            )
        else:
            # r15: carry od INSIDE the rank frame so the per-iteration
            # share is a projection of the broadcast build, not a
            # node-sized join — one broadcast build per iteration
            # instead of two (outdeg + pre-joined share), and the
            # dangling sum becomes a filter. Same integer recurrence.
            base = nd.select(
                "node", "od", F.lit(n_nodes).cast("bigint").alias("n")
            )
    else:
        nodes = track_cache(
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = track_cache(e.groupBy("src").agg(F.count(F.lit(1)).alias("od")))
        # N as a broadcast 1-row aggregate column — no driver action; the
        # same lazy DAG carries the constant through every iteration.
        n_row = nodes.agg(F.count(F.lit(1)).alias("n"))
        base = nodes.crossJoin(F.broadcast(n_row))
    # identity wrapper when ranks stay distributed; broadcast hint when the
    # (verified) node set is executor-memory sized
    bcast = F.broadcast if broadcast_ranks else (lambda df: df)
    rank_cols = ["node", "od"] if broadcast_ranks else ["node"]
    scores = base.select(*rank_cols, F.expr(f"{SCALE} DIV n").alias("q"))
    if early_stop_tol_q is not None:
        scores = scores.localCheckpoint()
    teleport = f"((({SCALE} DIV n) * {100 - damping_pct}) DIV 100)"
    for _ in range(iterations):
        # scores(i) is referenced exactly ONCE per round (the contrib join)
        # and the new frame rebuilds from the cached node list — lineage
        # stays linear in `iterations` instead of doubling per round.
        if broadcast_ranks:
            # broadcast the per-source share — the cached edge list is
            # probed map-side, never re-shuffled; the groupBy partial-
            # aggregates map-side so the only exchange carries
            # O(tasks × nodes) rows, not O(edges). od rides in the rank
            # frame (see base), so the share is a pure projection of the
            # broadcast build: ONE broadcast build per iteration. Sinks
            # (od = 0) project a NULL share and match no edge.
            contrib = e.join(
                F.broadcast(
                    scores.select(
                        F.col("node").alias("src"),
                        F.expr(
                            "CASE WHEN od > 0 THEN q DIV od END"
                        ).alias("share"),
                    )
                ),
                "src",
            ).select("dst", "share")
        else:
            contrib = (
                e.join(
                    scores.select(
                        F.col("node").alias("src"), F.col("q").alias("src_q")
                    ),
                    "src",
                )
                .join(outdeg, "src")
                .select("dst", F.expr("src_q DIV od").alias("share"))
            )
        inflow = contrib.groupBy("dst").agg(F.sum("share").alias("s"))
        nxt = base.join(
            bcast(inflow.withColumnRenamed("dst", "node")), "node", "left"
        )
        if redistribute_dangling:
            # mass parked on sink nodes, as a 1-row broadcast aggregate —
            # stays inside the lazy DAG, no driver action (on the
            # broadcast path od rides in the rank frame, so "dangling"
            # is a filter, not an anti-join)
            if broadcast_ranks:
                dang = scores.filter(F.col("od") == 0).agg(
                    F.sum("q").alias("dangq")
                )
            else:
                dang = (
                    scores.join(
                        bcast(outdeg), scores.node == outdeg.src, "left_anti"
                    )
                    .agg(F.sum("q").alias("dangq"))
                )
            nxt = nxt.crossJoin(F.broadcast(dang))
            share_expr = (
                f"coalesce(s, CAST(0 AS BIGINT))"
                f" + (coalesce(dangq, CAST(0 AS BIGINT)) DIV n)"
            )
        else:
            share_expr = "coalesce(s, CAST(0 AS BIGINT))"
        new_q = f"{teleport} + (({damping_pct} * ({share_expr})) DIV 100)"
        if early_stop_tol_q is None:
            scores = nxt.select(*rank_cols, F.expr(new_q).alias("q"))
            continue
        # fused moved-flag (same pattern as connected_components): the
        # convergence signal rides in the checkpointed frame, so the check
        # is a scan, not an extra old-vs-new join
        stepped = (
            nxt.join(
                bcast(
                    scores.select(
                        F.col("node").alias("node2"), F.col("q").alias("q_old")
                    )
                ),
                F.col("node") == F.col("node2"),
            )
            .select(
                *rank_cols,
                F.expr(new_q).alias("q"),
                (F.abs(F.expr(new_q) - F.col("q_old")) > early_stop_tol_q).alias(
                    "moved"
                ),
            )
            .localCheckpoint()
        )
        scores = stepped.select(*rank_cols, "q")
        if stepped.filter(F.col("moved")).isEmpty():
            break
    return scores.select("node", F.col("q").alias("score_q"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """Integer-quantized personalized PageRank: teleport mass lands only
    on the ``seeds`` node set instead of uniformly.

    Same determinism contract as :func:`pagerank` — every round is exact
    bigint arithmetic (``DIV`` truncation with non-negative operands), so
    the result is independent of partitioning and matches a recursive-CTE
    oracle bit-for-bit.  The teleport share per seed is
    ``((SCALE DIV n_seeds) * (100-d)) DIV 100`` via a broadcast 1-row
    seed-count aggregate; non-seeds get teleport 0, which is what makes
    the stationary mass concentrate around the seed neighborhood (the
    similar-item / related-query primitive).

    Scale shape: identical to pagerank — the per-round cost is one
    contribution join + one groupBy on the cached edge list; seeds ride
    along as a broadcast-joined flag column, adding no shuffle.
    """
    from icebergsql_spark.operators.util import track_cache

    e = track_cache(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    )
    nodes = track_cache(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    ns_row = seed_nodes.agg(F.count(F.lit(1)).alias("ns"))
    flagged = track_cache(
        nodes.join(
            F.broadcast(seed_nodes.withColumn("is_seed", F.lit(1))),
            "node",
            "left",
        )
        .crossJoin(F.broadcast(ns_row))
        .select(
            "node",
            F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed"),
            "ns",
        )
    )
    outdeg = track_cache(e.groupBy("src").agg(F.count(F.lit(1)).alias("od")))
    teleport = (
        f"CASE WHEN is_seed = 1 THEN "
        f"((({SCALE} DIV ns) * {100 - damping_pct}) DIV 100) "
        f"ELSE CAST(0 AS BIGINT) END"
    )
    # start from the teleport distribution itself (all mass on seeds)
    scores = flagged.select(
        "node", F.expr(f"CASE WHEN is_seed = 1 THEN {SCALE} DIV ns "
                       f"ELSE CAST(0 AS BIGINT) END").alias("q")
    )
    for _ in range(iterations):
        contrib = (
            e.join(
                scores.select(
                    F.col("node").alias("src"), F.col("q").alias("src_q")
                ),
                "src",
            )
            .join(outdeg, "src")
            .select("dst", F.expr("src_q DIV od").alias("share"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("share").alias("s"))
        nxt = flagged.join(
            inflow.withColumnRenamed("dst", "node"), "node", "left"
        )
        scores = nxt.select(
            "node",
            F.expr(
                f"{teleport} + (({damping_pct} * "
                f"coalesce(s, CAST(0 AS BIGINT))) DIV 100)"
            ).alias("q"),
        )
    return scores.select("node", F.col("q").alias("score_q"))


def modularity_q(
    half_edges: DataFrame,
    labels: DataFrame,
    a: str = "a",
    b: str = "b",
    node_col: str = "n",
    label_col: str = "lbl",
) -> DataFrame:
    """Newman modularity of a community assignment — EXACT integers.

    ``half_edges`` lists each undirected edge once (a < b); ``labels``
    maps node -> community. Q = sum_c (e_c/m - (d_c/2m)^2) is computed
    as the exact rational  Q_num / (4 m^2)  with
    ``Q_num = sum_c (4*m*e_c - d_c^2)``  — every term a bigint (edge
    counts and degree sums), so the score is a pure function of the
    data; the single final double division is the only float op. The
    quality gate after any community detection (label propagation,
    connected components): run detection, score it, compare runs.

    Scale shape: one broadcast-joinable label lookup per edge endpoint,
    two bounded groupBys (per-community intra-edge counts and degree
    sums) — never an all-pairs term; the null-model d_c^2 comes from
    the degree aggregate, not from enumerating non-edges.
    """
    la = labels.select(
        F.col(node_col).alias(a), F.col(label_col).alias("ca")
    )
    lb = labels.select(
        F.col(node_col).alias(b), F.col(label_col).alias("cb")
    )
    tagged = half_edges.join(la, a).join(lb, b)
    m_row = tagged.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    intra = (
        tagged.filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        tagged.select(F.col(a).alias("node"), F.col("ca").alias("c"))
        .unionAll(tagged.select(F.col(b).alias("node"), F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    per_c = deg.join(intra, "c", "left").select(
        "c",
        F.coalesce(F.col("e_c"), F.lit(0)).cast("bigint").alias("e_c"),
        "d_c",
    )
    return (
        per_c.crossJoin(F.broadcast(m_row))
        .agg(
            F.max("m").cast("bigint").alias("m"),
            F.sum(
                F.expr("4 * m * e_c - d_c * d_c")
            )
            .cast("bigint")
            .alias("q_num"),
        )
        .select(
            "m",
            "q_num",
            F.expr("4 * m * m").cast("bigint").alias("q_denom"),
            F.expr(
                "CAST(q_num AS DOUBLE) / CAST(4 * m * m AS DOUBLE)"
            ).alias("q"),
        )
    )


def louvain_gain_round(
    half_edges: DataFrame,
    labels: DataFrame,
    a: str = "a",
    b: str = "b",
    node_col: str = "n",
    label_col: str = "lbl",
) -> DataFrame:
    """One synchronous Louvain refinement round — EXACT integers.

    For every node i (community D) and every community C found among its
    neighbors, the modularity gain of moving i to C is, scaled by 2m^2
    so every term is a bigint (Blondel et al. 2008, eq. 2, unweighted):

        gain_num(i -> C) = 2m*(k_iC - k_iD) - k_i*(tot_C - (tot_D - k_i))

    with k_iC = edges from i into C, k_iD = edges from i into its own
    community (i excluded), tot_C = total degree of C.  Each node takes
    its best strictly-positive move under a total order (gain DESC,
    target community ASC) — all nodes move SIMULTANEOUSLY, making the
    round a deterministic pure function of (graph, labels) that an SQL
    oracle can replay row-for-row, unlike the sequential sweep of
    textbook Louvain (whose result depends on visit order).

    Returns (n, lbl_old, lbl_new, gain_num): gain_num = 0 for stayers.

    Scale shape: degree/label joins and two bounded groupBys — state is
    O(nodes + edges); candidate moves are bounded by the neighbor-
    community fan-out, never all (node, community) pairs.  Reference has
    no graph surface; beyond-reference for the dedup-cluster /
    community-curation pipelines (cites operators/graph.py:225
    modularity_q as the scoring twin).
    """
    from pyspark.sql import Window

    sym = half_edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionAll(half_edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    lab_src = labels.select(
        F.col(node_col).alias("src"), F.col(label_col).alias("d")
    )
    lab_dst = labels.select(
        F.col(node_col).alias("dst"), F.col(label_col).alias("c")
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    node = deg.join(lab_src, "src")
    ctot = node.groupBy(F.col("d").alias("c")).agg(
        F.sum("k").cast("bigint").alias("tot")
    )
    m_row = half_edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    nbrc = (
        sym.join(lab_dst, "dst")
        .groupBy("src", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("k_ic"))
    )
    base = (
        node.join(
            ctot.select(F.col("c").alias("d"), F.col("tot").alias("tot_d")),
            "d",
        )
        .join(
            nbrc.select("src", F.col("c").alias("d"), F.col("k_ic").alias("k_id")),
            ["src", "d"],
            "left",
        )
        .select(
            "src", "k", "d", "tot_d",
            F.coalesce(F.col("k_id"), F.lit(0)).cast("bigint").alias("k_id"),
        )
    )
    cand = (
        nbrc.join(base, "src")
        .filter(F.col("c") != F.col("d"))
        .join(ctot, "c")
        .crossJoin(F.broadcast(m_row))
        .select(
            "src", "d", "c",
            (
                F.lit(2) * F.col("m") * (F.col("k_ic") - F.col("k_id"))
                - F.col("k") * (F.col("tot") - (F.col("tot_d") - F.col("k")))
            ).cast("bigint").alias("gain_num"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("gain_num"), F.asc("c"))
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("gain_num") > 0))
        .select("src", F.col("c").alias("move_to"), "gain_num")
    )
    return (
        base.join(best, "src", "left")
        .select(
            F.col("src").alias(node_col),
            F.col("d").alias("lbl_old"),
            F.coalesce(F.col("move_to"), F.col("d")).alias("lbl_new"),
            F.coalesce(F.col("gain_num"), F.lit(0))
            .cast("bigint")
            .alias("gain_num"),
        )
    )


def louvain_converge(
    half_edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 4,
    a: str = "a",
    b: str = "b",
    node_col: str = "n",
    label_col: str = "lbl",
) -> tuple[DataFrame, int]:
    """Louvain to convergence: chain ``louvain_gain_round`` until a round
    moves NO node, bounded by ``max_rounds`` (synchronous simultaneous
    moves can oscillate on bipartite-ish structure, so an unbounded loop
    is never safe). Returns ``(final_labels, rounds_run)`` where
    ``rounds_run`` counts EXECUTED rounds — the round that observes zero
    movers is counted, matching min{k : movers_k = 0} (else max_rounds).

    Determinism: every round is the exact-bigint pure function of
    (graph, labels) that louvain_gain_round proves, and a converged
    round is IDEMPOTENT (all gains <= 0, everyone stays), so an oracle
    that chains a FIXED max_rounds of round-CTEs reproduces both the
    final labels and rounds_run without knowing the stop point up
    front. Scale shape: per round one bounded-join pass (state
    O(nodes+edges)); localCheckpoint per round keeps the unrolled
    lineage linear (the k-core lesson), and the movers probe is a
    LIMIT-1 count on the checkpointed frame, not a recompute.
    """
    rounds_run = 0
    for _ in range(max_rounds):
        moved = louvain_gain_round(
            half_edges, labels, a=a, b=b, node_col=node_col,
            label_col=label_col,
        ).localCheckpoint()
        rounds_run += 1
        labels = moved.select(
            F.col("n").alias(node_col), F.col("lbl_new").alias(label_col)
        )
        movers = (
            moved.filter(F.col("lbl_new") != F.col("lbl_old"))
            .limit(1)
            .count()
        )
        if movers == 0:
            break
    return labels, rounds_run


def louvain_gain_round_weighted(
    half_edges: DataFrame,
    labels: DataFrame,
    a: str = "a",
    b: str = "b",
    w: str = "w",
    node_col: str = "n",
    label_col: str = "lbl",
) -> DataFrame:
    """One synchronous WEIGHTED Louvain round — the refinement step that
    runs on the coarsened community multigraph (Blondel et al. 2008
    phase-2 input, weights = collapsed edge counts), completing
    multi-level Louvain on top of ``louvain_gain_round`` (unweighted)
    and the coarsen rollup.

    ``half_edges`` carries integer weights with ``a <= b``; a row with
    ``a == b`` is a SELF-LOOP (the community's internal edge mass). A
    self-loop contributes 2w to its node's weighted degree k_i (the
    standard A_ii = 2w convention) but never to the neighbor-community
    gains k_iC — it moves with the node, so it cancels out of every
    gain difference. With m = total half-edge weight, the move gain
    scaled by 2m^2 stays an exact bigint:

        gain_num(i -> C) = 2m*(k_iC - k_iD) - k_i*(tot_C - (tot_D - k_i))

    Same total order (gain DESC, target ASC), simultaneous moves,
    returns (n, lbl_old, lbl_new, gain_num). Scale shape: identical to
    the unweighted round — degree/label joins + two bounded groupBys,
    state O(nodes + edges).
    """
    self_rows = half_edges.filter(F.col(a) == F.col(b))
    plain = half_edges.filter(F.col(a) != F.col(b))
    sym = plain.select(
        F.col(a).alias("src"), F.col(b).alias("dst"), F.col(w).alias("wt")
    ).unionAll(
        plain.select(
            F.col(b).alias("src"), F.col(a).alias("dst"), F.col(w).alias("wt")
        )
    )
    lab_src = labels.select(
        F.col(node_col).alias("src"), F.col(label_col).alias("d")
    )
    lab_dst = labels.select(
        F.col(node_col).alias("dst"), F.col(label_col).alias("c")
    )
    deg = (
        sym.select("src", "wt")
        .unionAll(
            self_rows.select(
                F.col(a).alias("src"), (F.col(w) * 2).alias("wt")
            )
        )
        .groupBy("src")
        .agg(F.sum("wt").cast("bigint").alias("k"))
    )
    node = deg.join(lab_src, "src")
    ctot = node.groupBy(F.col("d").alias("c")).agg(
        F.sum("k").cast("bigint").alias("tot")
    )
    m_row = half_edges.agg(F.sum(w).cast("bigint").alias("m"))
    nbrc = (
        sym.join(lab_dst, "dst")
        .groupBy("src", "c")
        .agg(F.sum("wt").cast("bigint").alias("k_ic"))
    )
    base = (
        node.join(
            ctot.select(F.col("c").alias("d"), F.col("tot").alias("tot_d")),
            "d",
        )
        .join(
            nbrc.select(
                "src", F.col("c").alias("d"), F.col("k_ic").alias("k_id")
            ),
            ["src", "d"],
            "left",
        )
        .select(
            "src",
            "k",
            "d",
            "tot_d",
            F.coalesce(F.col("k_id"), F.lit(0)).cast("bigint").alias("k_id"),
        )
    )
    from pyspark.sql import Window

    cand = (
        nbrc.join(base, "src")
        .filter(F.col("c") != F.col("d"))
        .join(ctot, "c")
        .crossJoin(F.broadcast(m_row))
        .withColumn(
            "gain_num",
            (
                F.lit(2) * F.col("m") * (F.col("k_ic") - F.col("k_id"))
                - F.col("k")
                * (F.col("tot") - (F.col("tot_d") - F.col("k")))
            ).cast("bigint"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("src").orderBy(
                    F.desc("gain_num"), F.asc("c")
                )
            ),
        )
    )
    best = cand.filter((F.col("rn") == 1) & (F.col("gain_num") > 0)).select(
        "src", F.col("c").alias("move_to"), "gain_num"
    )
    return (
        base.join(best, "src", "left")
        .select(
            F.col("src").alias("n"),
            F.col("d").alias("lbl_old"),
            F.coalesce(F.col("move_to"), F.col("d")).alias("lbl_new"),
            F.coalesce(F.col("gain_num"), F.lit(0))
            .cast("bigint")
            .alias("gain_num"),
        )
    )


def louvain_converge_weighted(
    half_edges: DataFrame,
    labels: DataFrame,
    max_rounds: int = 3,
    a: str = "a",
    b: str = "b",
    w: str = "w",
    node_col: str = "n",
    label_col: str = "lbl",
) -> tuple[DataFrame, int]:
    """WEIGHTED Louvain to convergence — the level-2+ refinement loop
    that completes multi-level Louvain: chain
    ``louvain_gain_round_weighted`` on the coarsened community
    multigraph until a round moves no super-node, bounded by
    ``max_rounds`` (synchronous simultaneous moves can oscillate, so an
    unbounded loop is never safe — the ``louvain_converge`` rule).
    Returns ``(final_labels, rounds_run)`` with ``rounds_run`` counting
    EXECUTED rounds including the one that observes zero movers.

    Determinism mirrors the unweighted converge exactly: every round is
    an exact-bigint pure function of (weighted graph, labels) and a
    converged round is idempotent, so a fixed ``max_rounds`` chain of
    weighted round CTEs replays both outputs. Scale shape: per round one
    bounded-join pass over the |communities|-sized super-graph;
    localCheckpoint per round keeps the unrolled lineage linear and the
    movers probe is a LIMIT-1 count on the checkpointed frame.
    """
    rounds_run = 0
    for _ in range(max_rounds):
        moved = louvain_gain_round_weighted(
            half_edges, labels, a=a, b=b, w=w, node_col=node_col,
            label_col=label_col,
        ).localCheckpoint()
        rounds_run += 1
        labels = moved.select(
            F.col("n").alias(node_col), F.col("lbl_new").alias(label_col)
        )
        movers = (
            moved.filter(F.col("lbl_new") != F.col("lbl_old"))
            .limit(1)
            .count()
        )
        if movers == 0:
            break
    return labels, rounds_run
