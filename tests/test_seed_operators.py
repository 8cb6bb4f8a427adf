"""Round-9 seed operators: deterministic hash-sample quantile sketch and
personalized PageRank.

Both follow the engine-wide determinism contract (md5-derived sampling,
exact bigint rank arithmetic) so their round-9 gate queries can be
oracled; these tests lock the operator-level invariants ahead of
registration: mergeability and sampling determinism for the sketch,
teleport-mass concentration and exactness-under-repartitioning for PPR.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icebergsql_spark.operators.graph import pagerank, personalized_pagerank
from icebergsql_spark.operators.sketch import hash_sample_quantiles


def test_hash_sample_quantiles_mergeable(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    whole = hash_sample_quantiles(ev, "event_id", "value", divisor=4)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hash_sample_quantiles(
        a.unionAll(b), "event_id", "value", divisor=4
    )
    # merge == bare union: the sample is a pure row-local hash predicate,
    # so chopping the input any way yields the identical sample set
    assert whole.toPandas().equals(merged.toPandas())


def test_hash_sample_quantiles_partitioning_invariant(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    base = hash_sample_quantiles(ev, "event_id", "value", divisor=4)
    shuffled = hash_sample_quantiles(
        ev.repartition(13, "user_id"), "event_id", "value", divisor=4
    )
    assert base.toPandas().equals(shuffled.toPandas())


def test_hash_sample_quantiles_accuracy(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        r["q_pct"]: r["value"]
        for r in hash_sample_quantiles(
            ev, "event_id", "value", divisor=4, qs=(50,)
        ).collect()
    }
    exact = ev.agg(
        F.expr("percentile(value, CAST(50 AS DOUBLE) / 100.0)").alias("v")
    ).collect()[0]["v"]
    # ~n/4 sample of a 6k-row table: the median should land within 15%
    assert abs(got[50] - exact) / exact < 0.15


def test_personalized_pagerank_concentrates_on_seed(spark):
    # two symmetric 2-cycles, disconnected: only the seeded one should
    # hold mass (the unseeded side gets no teleport and decays ~0.85^k)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(1,)], "node int")
    scores = {
        r["node"]: r["score_q"]
        for r in personalized_pagerank(edges, seeds, iterations=6).collect()
    }
    assert scores[1] > 10 * scores[3]
    assert scores[2] > 10 * scores[4]
    # uniform pagerank scores the two symmetric cycles identically
    uni = {
        r["node"]: r["score_q"] for r in pagerank(edges, iterations=6).collect()
    }
    assert uni[1] == uni[3] and uni[2] == uni[4]


def test_personalized_pagerank_partitioning_invariant(spark):
    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7],
        "src int, dst int",
    )
    seeds = spark.createDataFrame([(0,), (1,)], "node int")
    a = (
        personalized_pagerank(edges, seeds, iterations=3)
        .orderBy("node")
        .toPandas()
    )
    b = (
        personalized_pagerank(
            edges.repartition(11, "dst"), seeds, iterations=3
        )
        .orderBy("node")
        .toPandas()
    )
    # exact bigint rounds: any partitioning yields the identical scores
    assert a.equals(b)


def test_markov_removal_effect_hand_computed(spark):
    """Four hand-built paths with exactly derivable transition ppms and
    absorption masses (integer floor arithmetic throughout):
      u1: view->click->purchase   u2: view->error
      u3: click->purchase         u4: view->click
    """
    from icebergsql_spark.operators.temporal import markov_removal_effect

    rows = []
    paths = {
        1: ["view", "click", "purchase"],
        2: ["view", "error"],
        3: ["click", "purchase"],
        4: ["view", "click"],
    }
    eid = 0
    for u, evs in paths.items():
        for i, t in enumerate(evs):
            rows.append((eid, u, i + 1, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        r["channel"]: r
        for r in markov_removal_effect(ev, steps=4).collect()
    }
    assert set(out) == {"view", "click", "error"}
    # P_base: START->click->CONV floor path 166666 plus
    # START->view->click->CONV floor path 333332
    assert out["view"]["p_base_ppm"] == 499998
    assert out["click"]["p_removed_ppm"] == 0
    assert out["click"]["removal_effect_ppm"] == 1000000
    assert out["view"]["p_removed_ppm"] == 166666
    assert out["view"]["removal_effect_ppm"] == (333332 * 1000000) // 499998
    assert out["error"]["removal_effect_ppm"] == 0


def test_markov_removal_effect_quoted_channel(spark):
    """Channel names carrying apostrophes/backslashes must survive the
    VALUES emission verbatim (ADVICE r10: escape before formatting)."""
    from icebergsql_spark.operators.temporal import markov_removal_effect

    rows = []
    eid = 0
    for u, evs in {
        1: ["it's a view", "purchase"],
        2: ["back\\slash", "it's a view"],
    }.items():
        for i, t in enumerate(evs):
            rows.append((eid, u, i + 1, t))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    out = {
        r["channel"]: r for r in markov_removal_effect(ev, steps=4).collect()
    }
    assert "it's a view" in out and "back\\slash" in out


def test_markov_removal_effect_partitioning_invariant(spark):
    from icebergsql_spark.operators.temporal import markov_removal_effect

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("event_id") % 3 == 0)
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts"),
            "event_type",
        )
    )
    a = markov_removal_effect(ev, steps=4).orderBy("channel").toPandas()
    b = (
        markov_removal_effect(ev.repartition(17, "event_id"), steps=4)
        .orderBy("channel")
        .toPandas()
    )
    assert a.equals(b)


def test_mmr_select_diversifies(spark):
    """MMR at lambda<100 must pick a MORE diverse set than pure
    relevance: with clustered vectors, relevance top-k collapses into
    the query's cluster while MMR spreads across clusters."""
    from icebergsql_spark.operators.similarity import (
        brute_force_topk,
        mmr_select,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = mmr_select(emb, query_id=1, k=8, lambda_pct=60, candidates=40)
    rows = got.collect()
    assert [r["rank"] for r in rows] == list(range(1, 9))
    assert len({r["vec_id"] for r in rows}) == 8
    # rank 1 is the pure-relevance argmax (no selected set yet)
    top_rel = brute_force_topk(emb, query_id=1, k=1).collect()[0]["vec_id"]
    assert rows[0]["vec_id"] == top_rel
    # with selection pressure on, later picks trade relevance for
    # distance: the selected set's mean max-sim must be lower than the
    # pure-relevance top-8's would be against itself
    assert all(r["maxsim_nano"] < 10**9 for r in rows[1:])
    # lambda=100 degenerates to pure relevance order
    pure = mmr_select(emb, query_id=1, k=8, lambda_pct=100, candidates=40)
    rel_order = [
        r["vec_id"]
        for r in brute_force_topk(emb, query_id=1, k=8).collect()
    ]
    assert [r["vec_id"] for r in pure.collect()] == rel_order


def test_mmr_select_partitioning_invariant(spark):
    from icebergsql_spark.operators.similarity import mmr_select

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = mmr_select(emb, query_id=7, k=5, candidates=30).toPandas()
    b = mmr_select(
        emb.repartition(9, "vec_id"), query_id=7, k=5, candidates=30
    ).toPandas()
    assert a.equals(b)


def test_whitening_identity_covariance(spark):
    """Whitened data must have ~identity covariance; the transform is a
    pure function of exact bigint stats, so any partitioning yields the
    identical W."""
    import numpy as np

    from icebergsql_spark.operators.ml import (
        apply_whitening,
        whitening_transform,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    mean, w = whitening_transform(emb, dims=6)
    mean2, w2 = whitening_transform(
        emb.repartition(13, "vec_id"), dims=6
    )
    assert mean == mean2 and w == w2  # bigint stats -> bitwise identical

    white = apply_whitening(emb, mean, w, dims=6).select(
        *[f"white_{k}" for k in range(6)]
    )
    x = np.array(white.collect(), dtype="float64")
    cov = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(6), atol=0.05)


def test_modularity_exact_two_cliques(spark):
    """Two 3-cliques joined by one bridge edge, labeled by clique:
    m=7, intra e_c=3 each, degrees: bridge endpoints 3, others 2 ->
    d_c = 7 per community. Q_num = 2*(4*7*3 - 49) = 70, denom 196."""
    from icebergsql_spark.operators.graph import modularity_q

    half = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "a int, b int",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 1), (5, 1), (6, 1)], "n int, lbl int"
    )
    row = modularity_q(half, labels).collect()[0]
    assert row["m"] == 7
    assert row["q_num"] == 70 and row["q_denom"] == 196
    assert abs(row["q"] - 70 / 196) < 1e-12
    # the degenerate all-one-community labeling scores 0 exactly:
    # e_c = m and d_c = 2m -> 4m*m - 4m^2 = 0
    one = labels.select("n", F.lit(0).alias("lbl"))
    assert modularity_q(half, one).collect()[0]["q_num"] == 0


def test_neardup_tier_eval_counts(spark):
    """On the clone-heavy documents slice the LSH tier must surface
    every exact near-dup (recall 1e6 at the calibration threshold) and
    the counts must be internally consistent."""
    from icebergsql_spark.operators.dedup import neardup_tier_eval

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 150)
    )
    row = neardup_tier_eval(docs, threshold=0.5, n=1).collect()[0]
    assert row["n_hits"] <= min(row["n_truth"], row["n_candidates"])
    assert row["n_truth"] > 0 and row["n_candidates"] > 0
    assert row["recall_ppm"] == (row["n_hits"] * 1000000) // row["n_truth"]
    assert (
        row["precision_ppm"]
        == (row["n_hits"] * 1000000) // row["n_candidates"]
    )
    # clones are verbatim-ish: single-word shingle Jaccard >= 0.5 pairs
    # collide in every band, so the tier recalls them all
    assert row["recall_ppm"] >= 900000


def _py_markov_removal(paths, conv="purchase", steps=4):
    """Pure-Python replica of markov_removal_effect's exact integer
    recurrence — the reference a round-9 recursive-CTE oracle must also
    match. paths: {user: [event_type, ...]} in time order."""
    trans_counts: dict = {}
    for evs in paths.values():
        states = []
        for t in evs:
            states.append("CONV" if t == conv else t)
            if t == conv:
                break
        seq = ["START"] + states
        if states[-1] != "CONV":
            seq.append("NULL")
        for cur, nxt in zip(seq, seq[1:]):
            trans_counts[(cur, nxt)] = trans_counts.get((cur, nxt), 0) + 1
    totals: dict = {}
    for (cur, _), c in trans_counts.items():
        totals[cur] = totals.get(cur, 0) + c
    trans = {
        pair: (c * 1000000) // totals[pair[0]]
        for pair, c in trans_counts.items()
    }

    def conv_mass(removed):
        vec = {"START": 1000000}
        absorbed = 0
        for _ in range(steps):
            nxt_vec: dict = {}
            for (cur, nxt), p in trans.items():
                if cur == removed or cur not in vec:
                    continue
                q = (vec[cur] * p) // 1000000
                nxt_vec[nxt] = nxt_vec.get(nxt, 0) + q
            absorbed += nxt_vec.pop("CONV", 0)
            nxt_vec.pop("NULL", None)
            vec = nxt_vec
        return absorbed

    p_base = conv_mass(None)
    out = {}
    for ch in sorted(totals):
        if ch == "START":
            continue
        p_rem = conv_mass(ch)
        eff = ((p_base - p_rem) * 1000000) // p_base if p_base else 0
        out[ch] = (p_base, p_rem, eff)
    return out


def test_markov_removal_effect_fuzz_vs_python(spark):
    """Random path sets: the Spark operator must BIT-match the pure
    Python integer recurrence (the pre-oracle contract; same pattern as
    the MERGE clause-semantics fuzz)."""
    import random

    from icebergsql_spark.operators.temporal import markov_removal_effect

    rng = random.Random(42)
    channels = ["view", "click", "signup", "error"]
    for trial in range(3):
        paths = {}
        for u in range(1, rng.randint(8, 20)):
            length = rng.randint(1, 6)
            evs = [rng.choice(channels) for _ in range(length)]
            if rng.random() < 0.5:
                evs.append("purchase")
            paths[u] = evs
        rows, eid = [], 0
        for u, evs in paths.items():
            for i, t in enumerate(evs):
                rows.append((eid, u, i + 1, t))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts long, event_type string"
        )
        got = {
            r["channel"]: (
                r["p_base_ppm"], r["p_removed_ppm"], r["removal_effect_ppm"]
            )
            for r in markov_removal_effect(ev, steps=4).collect()
        }
        want = _py_markov_removal(paths, steps=4)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_personalized_pagerank_fuzz_vs_python(spark):
    """Random digraphs: bit-match the pure-Python integer PPR rounds."""
    import random

    SCALE = 10**12

    def py_ppr(edge_list, seed_nodes, iterations=3, d=85):
        e = sorted(set(edge_list))
        nodes = sorted({a for a, _ in e} | {b for _, b in e})
        ns = len(seed_nodes)
        outdeg: dict = {}
        for a, _ in e:
            outdeg[a] = outdeg.get(a, 0) + 1
        tele = {
            n: ((SCALE // ns) * 15) // 100 if n in seed_nodes else 0
            for n in nodes
        }
        q = {
            n: SCALE // ns if n in seed_nodes else 0 for n in nodes
        }
        for _ in range(iterations):
            inflow = {n: 0 for n in nodes}
            for a, b in e:
                inflow[b] += q[a] // outdeg[a]
            q = {n: tele[n] + (d * inflow[n]) // 100 for n in nodes}
        return q

    from icebergsql_spark.operators.graph import personalized_pagerank

    rng = random.Random(7)
    for trial in range(3):
        n_nodes = rng.randint(5, 12)
        edge_list = list(
            {
                (rng.randrange(n_nodes), rng.randrange(n_nodes))
                for _ in range(rng.randint(8, 30))
            }
        )
        edge_list = [(a, b) for a, b in edge_list if a != b]
        nodes_present = {a for a, _ in edge_list} | {b for _, b in edge_list}
        seeds = sorted(nodes_present)[:2]
        edges = spark.createDataFrame(edge_list, "src int, dst int")
        seeds_df = spark.createDataFrame(
            [(s,) for s in seeds], "node int"
        )
        got = {
            r["node"]: r["score_q"]
            for r in personalized_pagerank(
                edges, seeds_df, iterations=3
            ).collect()
        }
        want = py_ppr(edge_list, set(seeds))
        assert got == want, f"trial {trial}"


def test_theil_sen_exact_and_robust(spark):
    """Hand-computed series with one gross outlier: OLS moves, Theil-Sen
    doesn't. Series y = 2x at x=0..4 except y(2)=100: pairwise slopes
    are mostly 2; the lower median must be exactly 2 (num/den reported
    as an exact rational)."""
    from icebergsql_spark.operators.temporal import theil_sen_slope

    rows = [(0, 0), (1, 2), (2, 100), (3, 6), (4, 8)]
    s = spark.createDataFrame(rows, "x long, y long")
    got = theil_sen_slope(s).collect()[0]
    assert got["n_pairs"] == 10
    assert got["med_num"] / got["med_den"] == 2.0
    assert got["slope"] == 2.0
    # clean series: exact slope 3
    clean = spark.createDataFrame(
        [(i, 3 * i + 7) for i in range(6)], "x long, y long"
    )
    g2 = theil_sen_slope(clean).collect()[0]
    assert g2["slope"] == 3.0 and g2["n_pairs"] == 15


def test_theil_sen_partitioning_invariant(spark):
    from icebergsql_spark.operators.temporal import theil_sen_slope

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
        )
        .select(F.expr("us DIV 86400000000").alias("x"))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    a = theil_sen_slope(daily).toPandas()
    b = theil_sen_slope(daily.repartition(7, "x")).toPandas()
    assert a.equals(b)
