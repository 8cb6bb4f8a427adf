"""Size-bounded recursive k-means: the escalation path for pathological
cells (operators/ml.kmeans_assign_bounded).

A skewed-but-separable fixture must end with every cell at or under the
bound; a degenerate fixture (identical vectors — nothing separates) must
terminate at max_depth without loops. Membership is always a partition:
every vector in exactly one cell."""

from pyspark.sql import functions as F

from icebergsql_spark.operators.ml import kmeans_assign, kmeans_assign_bounded


def _vecs(spark, spec):
    """spec: list of (base, count) blobs; vec v = [base + (i % 5)] * 8."""
    rows = []
    vid = 0
    for base, count in spec:
        for i in range(count):
            rows.append((vid, [float(base + (i % 5) + d) for d in range(8)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_bounded_split_enforces_max_cell_size(spark):
    # two far blobs, each itself two separable sub-blobs: 4 x 60 vectors.
    # Plain k=2 leaves 120-vector cells; the bound forces one bisection.
    df = _vecs(
        spark, [(0, 60), (40, 60), (1000, 60), (1040, 60)]
    )
    plain = kmeans_assign(df, k=2, iterations=2)
    sizes = {r["cell"]: r["n"] for r in plain.groupBy("cell")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert max(sizes.values()) > 70, "fixture must overflow the bound"

    bounded = kmeans_assign_bounded(
        df, k=2, iterations=2, max_cell_size=70, max_depth=3
    )
    rows = bounded.collect()
    assert len(rows) == 240 and len({r["vid"] for r in rows}) == 240
    bsizes = {}
    for r in rows:
        bsizes[r["cell"]] = bsizes.get(r["cell"], 0) + 1
    assert max(bsizes.values()) <= 70, f"bound violated: {bsizes}"
    assert sum(bsizes.values()) == 240


def test_bounded_split_terminates_on_degenerate_cell(spark):
    # 100 identical vectors: no split is possible; recursion must stop at
    # max_depth with the full cell intact (tie-break sends all to sub 0)
    df = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(100)],
        "vec_id bigint, embedding array<float>",
    )
    bounded = kmeans_assign_bounded(
        df, k=2, iterations=1, max_cell_size=10, max_depth=2
    )
    rows = bounded.collect()
    assert len(rows) == 100 and len({r["vid"] for r in rows}) == 100
    cells = {r["cell"] for r in rows}
    assert len(cells) <= 2  # the degenerate mass stays together


def test_bounded_noop_when_under_bound(spark):
    df = _vecs(spark, [(0, 30), (1000, 30)])
    plain = kmeans_assign(df, k=2, iterations=2).collect()
    bounded = kmeans_assign_bounded(
        df, k=2, iterations=2, max_cell_size=1000, max_depth=3
    ).collect()
    # no split fired: same partition of vids into cells (ids unchanged)
    assert {(r["vid"], r["cell"]) for r in bounded} == {
        (r["vid"], r["cell"]) for r in plain
    }
