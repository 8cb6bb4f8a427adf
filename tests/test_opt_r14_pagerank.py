"""Round-14 optimization lock: broadcast-rank PageRank parity.

The ``broadcast_ranks=True`` formulation (one-pass node+degree derivation,
rank vector as a broadcast hash relation, map-side edge probe) must produce
bit-identical integer scores to the distributed formulation for every
option combination — same recurrence, different physical plan.
"""

from __future__ import annotations

import random

import pytest

from icebergsql_spark.operators.graph import pagerank


@pytest.mark.parametrize(
    "kw",
    [
        {"iterations": 3},
        {"iterations": 4, "redistribute_dangling": True},
        {"iterations": 6, "early_stop_tol_q": 0},
        {"iterations": 10, "early_stop_tol_q": 10**9},
    ],
    ids=["plain", "dangling", "converge-exact", "converge-loose"],
)
def test_broadcast_ranks_parity(spark, kw):
    rng = random.Random(20240814)
    rows = [
        (f"n{rng.randrange(37)}", f"n{rng.randrange(37)}") for _ in range(250)
    ]
    # guarantee at least one dangling (sink-only) node
    rows.append(("n1", "sink_only"))
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = {
        r.node: r.score_q
        for r in pagerank(edges, broadcast_ranks=False, **kw).collect()
    }
    b = {
        r.node: r.score_q
        for r in pagerank(edges, broadcast_ranks=True, **kw).collect()
    }
    assert a == b


def test_broadcast_ranks_plan_probes_edges_map_side(spark):
    """The broadcast formulation's per-iteration edge probe must be a
    BroadcastHashJoin — the edge list is never re-shuffled by a join."""
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    df = pagerank(edges, iterations=2, broadcast_ranks=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
