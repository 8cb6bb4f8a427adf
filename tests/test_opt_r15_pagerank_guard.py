"""Round-15 optimization lock: the pagerank broadcast-path size guard.

``broadcast_ranks=True`` is an executor-memory assertion; round 15 makes
it verified instead of trusted — a bounded count of the node frame picks
the distributed iteration body when the node set exceeds
``broadcast_max_nodes``, rather than building an unbounded broadcast.
Scores must be bit-identical on either body.
"""

from __future__ import annotations

import random

from icebergsql_spark.operators.graph import pagerank


def _scores(df):
    return {r.node: r.score_q for r in df.collect()}


def test_guard_triggers_distributed_fallback(spark):
    rng = random.Random(20260818)
    rows = [
        (f"n{rng.randrange(23)}", f"n{rng.randrange(23)}") for _ in range(120)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    # cap below the actual node count: the fallback body must run ...
    guarded = pagerank(
        edges, iterations=3, broadcast_ranks=True, broadcast_max_nodes=5
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    # ... which probes the rank vector with a non-broadcast join per round
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # and the scores stay bit-identical to both unguarded bodies
    want = _scores(pagerank(edges, iterations=3, broadcast_ranks=False))
    assert _scores(guarded) == want
    assert _scores(pagerank(edges, iterations=3, broadcast_ranks=True)) == want


def test_guard_noop_below_cap(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    edges = spark.createDataFrame(rows, "src string, dst string")
    df = pagerank(edges, iterations=2, broadcast_ranks=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
