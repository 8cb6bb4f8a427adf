"""Lock for the r15 emb_gap_statistic driver-tail restructure: the gate's
only Spark work is the dq0 quantization; the md5 reference draws and the
three 2-round integer k-means chains run driver-side. This pins frame
identity against the old one-statement SQL formulation (the registered
oracle is that same template, untouched)."""

from __future__ import annotations

import pandas as pd


def test_gap_driver_matches_old_sql(spark):
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans import REGISTRY, load_all
    from icebergsql_spark.plans.pipeline41 import _GAP_HX_SPARK, _gap_chain
    from icebergsql_spark.plans.registry import load_tables

    load_all()
    sf = "/root/testdata/sf0.001"
    new = REGISTRY["emb_gap_statistic"].spark(spark, sf).toPandas()
    ensure_parallelism(
        load_tables(spark, sf, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    old_sql = _gap_chain(_GAP_HX_SPARK, "DIV", "").format(
        emb_i="CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)",
        spine="CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) g",
    )
    old = spark.sql(old_sql).toPandas()
    pd.testing.assert_frame_equal(
        new.reset_index(drop=True), old.reset_index(drop=True)
    )
