"""Physical-plan assertions — parity with the reference's plan introspection
tests (BasicCreateAndInsertTest.scala:150-155 asserts on derived filters;
utils/utils.scala:43-69 lists scanned files). Here: broadcast strategy for
dimension joins, parquet filter pushdown, and no-Python-UDF in JVM-path
operators."""

from __future__ import annotations

import pytest

from icebergsql_spark.plans import REGISTRY, load_all
from tests.conftest import SF_SMOKE

load_all()


def plan_of(spark, name: str) -> str:
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = REGISTRY[name].spark(spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items", "q8_market_share", "q9_product_profit", "q17_small_quantity_revenue", "q11_important_stock", "q16_supplier_part_count", "q21_waiting_suppliers"])
def test_dimension_joins_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan
    # no accidental cartesian products
    assert "CartesianProduct" not in plan


def test_q21_decorrelates_to_one_fact_aggregate(spark):
    """q21's EXISTS + NOT EXISTS must not plan as two extra correlated
    fact scans: the per-order supplier counts come from ONE grouped
    aggregate, so the lineitem parquet appears at most twice in the plan
    (the late-rows branch and the per-order-aggregate branch)."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln and "lineitem" in ln]
    assert 0 < len(scans) <= 2, plan


def test_filters_push_to_parquet(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_column_pruning_reaches_scan(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    # ReadSchema should include only the 4 referenced columns, not all 11
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema and "l_returnflag" not in read_schema
    assert "l_discount" in read_schema and "l_quantity" in read_schema


def test_jvm_operators_have_no_python_eval(spark):
    # hash/dedup/text operators must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython nodes); only the multimodal mapInPandas is allowed
    # Python
    for name in ["dedup_minhash_signatures", "dedup_simhash", "text_token_stats",
                 "ann_bruteforce_topk", "text_bm25_scores", "text_repetition_signals",
                 "events_cohort_retention", "events_session_windows"]:
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"
    assert "MapInPandas" in plan_of(spark, "multimodal_blob_features")


def test_topk_plans_as_take_ordered(spark):
    plan = plan_of(spark, "sort_multi_key_limit")
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def _depth(line: str) -> int:
    import re

    return len(re.match(r"^[:+\- ]*", line).group(0))


def test_emb_neardup_lsh_is_an_equi_join(spark):
    """The bucketed near-dup must never plan the all-pairs
    BroadcastNestedLoop the exact baseline uses (VERDICT r1 #2): candidate
    generation is the Arrow-grouped per-bucket GEMM (FlatMapGroupsInPandas)
    and the exact re-verification joins are id EQUI-joins."""
    plan = plan_of(spark, "emb_neardup_pairs_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_emb_neardup_lsh_subset_of_exact(spark):
    """Every LSH-recovered pair is a true near-dup pair with the identical
    cosine (precision = 1; only recall is traded)."""
    exact = {
        (r.a, r.b): r.cos
        for r in REGISTRY["emb_neardup_pairs"].spark(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.a, r.b): r.cos
        for r in REGISTRY["emb_neardup_pairs_lsh"].spark(spark, SF_SMOKE).collect()
    }
    assert lsh, "LSH variant found no pairs at smoke scale"
    assert set(lsh).issubset(set(exact))
    assert all(exact[p] == c for p, c in lsh.items())


def test_lsh_candidates_drive_the_shingle_join(spark):
    """The shingle-intersection join must be CANDIDATE-DRIVEN (VERDICT r1
    #1): the optimized plan's shingle equi-join has the candidate-pair join
    nested INSIDE its subtree (work ∝ candidate set), rather than a bare
    corpus self-join with the candidate filter applied above the aggregate."""
    df = REGISTRY["dedup_lsh_neardup_pairs"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    inner = [
        i for i, ln in enumerate(lines) if "Join Inner" in ln and "shingle" in ln
    ]
    assert inner, f"no shingle inner join in plan:\n{plan}"
    i0, d0 = inner[0], _depth(lines[inner[0]])
    nested = [
        ln for ln in lines[i0 + 1 :] if "Join" in ln and _depth(ln) > d0
    ]
    assert nested, f"shingle join is a bare corpus self-join — candidates did not drive it:\n{plan}"
    # and no candidate gating bolted on ABOVE the aggregate (the r1 shape)
    assert not any("Join LeftSemi" in ln for ln in lines[:i0]), plan


def test_dfcap_semi_join_below_shingle_join(spark):
    """max_df hot-key guard: the rare-shingle semi-join also sits below the
    shingle self-join."""
    df = REGISTRY["dedup_jaccard_dfcap_pairs"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    inner = [i for i, ln in enumerate(lines) if "Join Inner" in ln and "#" in ln]
    assert inner
    i0, d0 = inner[0], _depth(lines[inner[0]])
    assert any(
        "Join LeftSemi" in ln and _depth(ln) > d0 for ln in lines[i0 + 1 :]
    ), f"df-cap semi-join not below the shingle join:\n{plan}"


def test_pmi_df_band_below_pair_join(spark):
    """text_token_pmi's lossless df>=40 vocabulary band must sit BELOW the
    token-pair self-join (mirror of the dedup shingle DF cap): without it a
    single 50k-distinct-token document emits O(tokens²) join rows."""
    df = REGISTRY["text_token_pmi"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    inner = [i for i, ln in enumerate(lines) if "Join Inner" in ln and "#" in ln]
    assert inner
    i0, d0 = inner[0], _depth(lines[inner[0]])
    assert any(
        "Join LeftSemi" in ln and _depth(ln) > d0 for ln in lines[i0 + 1 :]
    ), f"df-band semi-join not below the pair join:\n{plan}"


def test_pmi_long_document_bounded(spark):
    """A pathological document with many unique tokens (each df=1) must be
    eliminated by the df band BEFORE pairing — the pair join's inputs carry
    zero rows from it, so the query completes without quadratic blowup."""
    from pyspark.sql import functions as F

    long_doc = " ".join(f"uniqtok{i}" for i in range(20000))
    docs = spark.createDataFrame(
        [(0, long_doc)] + [(i, "alpha beta") for i in range(1, 45)],
        "doc_id long, text string",
    )
    tok = (
        docs.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("na"))
    eligible = uni.filter(F.col("na") >= 40).select("tok")
    tok_f = tok.join(eligible, "tok", "left_semi")
    pairs = (
        tok_f.alias("a")
        .join(tok_f.alias("b"), "doc_id")
        .filter(F.col("a.tok") < F.col("b.tok"))
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("nab"))
        .filter(F.col("nab") >= 40)
    )
    rows = pairs.collect()
    assert rows == [] or all(r.nab >= 40 for r in rows)
    # the band keeps only alpha/beta (df=44): exactly one candidate pair
    assert {(r.tok_a, r.tok_b) for r in rows} == {("alpha", "beta")}


@pytest.mark.parametrize(
    "name", ["curation_split_counts", "curation_hash_sample", "curation_quality_verdicts"]
)
def test_curation_narrow_ops_shuffle_at_most_once(spark, name):
    # split/sample/quality are narrow maps; the only allowed Exchange is the
    # final count aggregation (split_counts) or the presentation sort.
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hash_sample_filter_is_shuffle_free(spark):
    # the 100 TB sampling path: pure filter, no Exchange before the sort
    from icebergsql_spark.operators import curation
    from icebergsql_spark.plans.registry import load_tables

    docs = load_tables(spark, SF_SMOKE, ("documents",))["documents"]
    plan = (
        curation.hash_sample(docs, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_pack_documents_partitions_by_shard(spark):
    # packing must window per shard: the window's Exchange hash-partitions
    # on the shard column — a global (SinglePartition) sort would serialize
    # 100 TB through one task
    plan = plan_of(spark, "curation_pack_stats")
    assert "hashpartitioning(lang" in plan
    assert "SinglePartition" not in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set is eval-set-sized; it must broadcast as a
    semi-join probe so the 100 TB corpus side never shuffles for it."""
    plan = plan_of(spark, "curation_decontaminate")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_mix_resample_joins_are_broadcast(spark):
    """Rate assignment joins tiny per-source tables; the corpus-sized side
    must see only broadcast joins (the filter is a narrow map)."""
    plan = plan_of(spark, "curation_mix_resample")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_funnel_is_single_shuffle_no_join(spark):
    """The fold formulation's whole point: no per-step joins — one
    hash-partitioning of events by user plus the codegen'd fold."""
    plan = plan_of(spark, "events_funnel")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("hashpartitioning") <= 2  # user agg + final 1-row agg


def test_repetition_signals_stays_jvm(spark):
    plan = plan_of(spark, "text_repetition_signals")
    assert "EvalPython" not in plan


def test_repetition_signals_has_no_shuffle(spark):
    """All three Gopher signals are per-row expressions now — the only
    exchanges allowed are the gated input repartition (RoundRobin) and the
    output sort; no hash-partitioned aggregate exchange."""
    plan = plan_of(spark, "text_repetition_signals")
    assert "hashpartitioning" not in plan, plan


def test_bm25_reuses_the_per_doc_exchange(spark):
    """BM25's per-doc tf aggregate feeds both the scoring join and the
    corpus-stats branch; AQE must REUSE that exchange so the token explode
    runs once — not re-scan the corpus for the stats row."""
    df = REGISTRY["text_bm25_scores"].spark(spark, SF_SMOKE)
    df.collect()  # materialize so AQE finalizes the plan
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_bloom_probe_broadcasts_the_bitmap(spark):
    """The Bloom bitmap (≤128 rows) must reach the probe side as a
    broadcast — shuffling the probe table would defeat the operator's
    whole purpose (pre-filtering BEFORE data moves)."""
    plan = plan_of(spark, "sketch_bloom_filter")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_stays_jvm_and_joins_hash(spark):
    """3 integer PageRank rounds: no Python evaluation anywhere (pure
    integer expressions), and no nested-loop joins — every per-iteration
    join is an equi-join on node."""
    plan = plan_of(spark, "graph_pagerank")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the 1-row N constant rides broadcast cross joins; anything unbroadcast
    # (CartesianProduct) would be a real nested loop over data
    assert "CartesianProduct" not in plan


def test_kmeans_assignment_broadcasts_centroids(spark):
    """Each k-means round joins vectors against k=8 centroid rows — that
    must be a broadcast (narrow map per round), never a shuffle of the
    vector table; and the integer folds stay JVM-side."""
    plan = plan_of(spark, "ml_kmeans_clusters")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ohlc_is_single_aggregate_no_join(spark):
    """5-min OHLC bars: one hash aggregate over the scan (min_by/max_by
    fold open/close inside the same aggregate) — no window, no join."""
    plan = plan_of(spark, "events_resample_ohlc")
    assert "Join" not in plan
    assert "Window" not in plan


def test_unigram_logprob_has_no_python(spark):
    plan = plan_of(spark, "text_unigram_logprob")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sliding_chunks_no_shuffle_before_sort(spark):
    """Chunking is a per-doc narrow map: the only Exchange in the plan is
    the final ORDER BY's range partitioning — no shuffle in the chunk
    generation itself."""
    plan = plan_of(spark, "text_sliding_chunks")
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("rangepartitioning" in ln.lower() for ln in exchanges), plan


def test_vocab_partial_aggregates_map_side(spark):
    """Vocabulary build must partial-aggregate below its one token
    shuffle: HashAggregate appears both before and after the Exchange."""
    plan = plan_of(spark, "text_vocab_topn")
    assert "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_join_no_cartesian(spark):
    """The two-hop triangle join is equi-keyed end to end — any cartesian
    product would be quadratic in edges at scale."""
    plan = plan_of(spark, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    # edges frame is reused three ways; the final combine of the three
    # scalar aggregates may broadcast — that's the 1-row frames, fine.


def test_histogram_quantiles_single_scan_aggregate(spark):
    """The histogram sketch reads orders once and partial-aggregates the
    bucket counts map-side before its shuffle."""
    plan = plan_of(spark, "agg_histogram_quantiles")
    scans = [ln for ln in plan.splitlines() if "Scan parquet" in ln]
    assert len(scans) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_mad_uses_broadcast_joins(spark):
    """events_anomaly_mad joins per-group medians back to the events via
    broadcast — never a shuffle join keyed by the full table."""
    plan = plan_of(spark, "events_anomaly_mad")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_mor_dv_scan_is_broadcast_anti_join(spark, tmp_path_factory):
    """A DV-masked scan plans as vectorized parquet scan + BROADCAST
    LeftAnti hash join against the (churn-sized) DV rowset — no shuffle
    on the data side, no Python in the plan."""
    import pyspark.sql.functions as F

    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_plan_dv")))
    t = cat.create_table(
        "pdv",
        "k bigint, part int",
        partition_cols=["part"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
        )
    )
    t.delete_where("k % 100 = 7")
    df = t.to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning" not in plan  # data side unshuffled
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() == 5000 - 50


def test_eq_delete_scan_masks_via_broadcast_joins(spark, tmp_path_factory):
    """An equality-masked scan stays JVM-side and broadcasts both the
    file-seq map and the max-seq-per-key delete rowset."""
    import pyspark.sql.functions as F

    from icebergsql_spark.table import Catalog

    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_plan_eq")))
    t = cat.create_table("peq", "k bigint, part int", partition_cols=["part"])
    t.insert(
        spark.range(5000).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("int").alias("part")
        )
    )
    t.delete_by_keys(
        spark.createDataFrame([(i,) for i in range(0, 5000, 100)], "k bigint"),
        ["k"],
    )
    df = t.to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert df.count() == 5000 - 50


def test_bpe_pair_stats_survives_degenerate_docs(spark, tmp_path_factory):
    """Round-7 ADVICE: a doc whose text splits to <2 chars made
    sequence(1, 0) yield the DESCENDING [1, 0] and element_at(cs, 0)
    throw INVALID_INDEX_OF_ZERO — the guard must emit zero pairs for it
    (DuckDB's generate_series(1, 0) is empty) instead of crashing."""
    import pyspark.sql.functions as F

    from icebergsql_spark.plans.pipeline7 import text_bpe_pair_stats

    d = tmp_path_factory.mktemp("bpe_degen")
    spark.createDataFrame(
        [
            (1, "", "en", "web", 0),
            (2, "x", "en", "web", 1),
            (3, "abab", "en", "web", 4),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    rows = {r["pair"]: r["c"] for r in text_bpe_pair_stats(spark, str(d)).collect()}
    assert rows == {"ab": 2, "ba": 1}
