"""Pure-Python replica fuzzes for the pipeline16 sequential/graph
recurrences (the pre-oracle contract from tests/test_seed_operators:
the Spark implementation must bit-match a dict-based replica on
random inputs, independently of the DuckDB oracle)."""

import random

from pyspark.sql import functions as F

from icebergsql_spark.plans.pipeline16 import (
    _PH_DELTA,
    _PH_LAMBDA,
    _ph_fold,
    _textrank_sql,
)


def _ph_replica(xs):
    i, s, m, mmin, maxph, alarms, first = 0, 0.0, 0.0, 0.0, 0.0, 0, 0
    for x in xs:
        s += float(x)
        mean = s / (i + 1)
        m = m + (float(x) - mean - _PH_DELTA)
        mmin = m if m < mmin else mmin
        ph = m - mmin
        maxph = ph if ph > maxph else maxph
        if ph > _PH_LAMBDA:
            alarms += 1
            if first == 0:
                first = i + 1
        i += 1
    return i, round(m, 6), round(mmin, 6), round(maxph, 6), alarms, first


def test_page_hinkley_fold_matches_python_replica(spark):
    rng = random.Random(11)
    rows = []
    series = {}
    for t in ("a", "b", "c"):
        xs = [rng.randrange(0, 400) for _ in range(rng.randrange(5, 40))]
        series[t] = xs
        rows += [(t, d, x) for d, x in enumerate(xs)]
    daily = spark.createDataFrame(
        rows, "event_type string, day bigint, c bigint"
    )
    got = {r["event_type"]: r for r in _ph_fold(daily).collect()}
    for t, xs in series.items():
        i, m, mmin, maxph, alarms, first = _ph_replica(xs)
        r = got[t]
        assert r["n_days"] == i
        assert r["m_final"] == m and r["m_min"] == mmin
        assert r["max_ph"] == maxph
        assert (r["n_alarms"], r["first_alarm_t"]) == (alarms, first)


def _textrank_replica(edges):
    """Two integer-ppm PageRank rounds over undirected distinct edges."""
    und = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in und.items()}
    r1 = {
        v: 150_000
        + (850_000 * sum(1_000_000 // deg[u] for u in ns)) // 1_000_000
        for v, ns in und.items()
    }
    r2 = {
        v: 150_000
        + (850_000 * sum(r1[u] // deg[u] for u in ns)) // 1_000_000
        for v, ns in und.items()
    }
    return deg, r1, r2


def test_textrank_rounds_match_python_replica(spark):
    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(8):
        docs.append(
            (d, " ".join(rng.choice(vocab) for _ in range(20)))
        )
    spark.createDataFrame(docs, "doc_id bigint, text string") \
        .createOrReplaceTempView("tr_docs")
    sql = f"""
        WITH toks AS (
          SELECT doc_id, split(trim(text), ' ') AS w FROM tr_docs
        ),
        big AS (
          SELECT element_at(w, CAST(k + 1 AS INT)) AS a,
                 element_at(w, CAST(k + 2 AS INT)) AS b
          FROM toks
          LATERAL VIEW explode(sequence(0, size(w) - 2)) t AS k
        ),
        {_textrank_sql("DIV", "SUM({x})")}
    """
    got = {r["word"]: r for r in spark.sql(sql).collect()}
    # replica over the same distinct undirected edge set
    edges = set()
    for _d, text in docs:
        ws = text.split(" ")
        for i in range(len(ws) - 1):
            a, b = ws[i], ws[i + 1]
            if a != b:
                edges.add((min(a, b), max(a, b)))
    deg, r1, r2 = _textrank_replica(edges)
    top = sorted(r2.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert len(got) == min(15, len(top))
    for w, score in top[: len(got)]:
        assert got[w]["rank2_ppm"] == score, w
        assert got[w]["rank1_ppm"] == r1[w]
        assert got[w]["degree"] == deg[w]


def test_haar_levels_exact_on_known_series(spark):
    # 16-day series with a known pyramid: constant series -> all detail
    # energies 0, smooth = 16 * c
    daily = spark.createDataFrame(
        [("t", d, 7) for d in range(16)],
        "event_type string, day bigint, c bigint",
    )
    daily.createOrReplaceTempView("ev_haar_t")
    from icebergsql_spark.plans.pipeline16 import (
        _HAAR_DAYS,
        _haar_final_sql,
        _haar_levels_sql,
    )

    def idx(arr, expr):
        return f"element_at({arr}, CAST({expr} AS INT))"

    xform = "transform(sequence(0, {n}), k -> {body})"
    agg_sq = "aggregate({l}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
    row = spark.sql(f"""
        WITH a0 AS (
          SELECT event_type,
                 slice(transform(array_sort(collect_list(struct(day, c))),
                                 s -> s.c), 1, {_HAAR_DAYS}) AS a
          FROM ev_haar_t GROUP BY event_type
        ),
        {_haar_levels_sql(xform, idx, agg_sq)}
        {_haar_final_sql(idx, agg_sq)}
    """).collect()[0]
    assert row["smooth"] == 16 * 7
    for k in (1, 2, 3, 4):
        assert row[f"energy_l{k}"] == 0
    assert row["detail_l4"] == 0


def _binseg_replica(xs):
    """Two-level binary segmentation replica (dict-based, exact ints)."""
    n = len(xs)
    cum = [0]
    for x in xs:
        cum.append(cum[-1] + x)

    def best(lo, hi):
        # k in [lo, hi-1]; returns (k, dev, pre, post)
        s_lo, t_s, n_s = cum[lo - 1], cum[hi] - cum[lo - 1], hi - lo + 1
        out = None
        for k in range(lo, hi):
            pre = cum[k] - s_lo
            dev = abs(n_s * pre - (k - lo + 1) * t_s)
            if out is None or dev > out[1]:
                out = (k, dev, pre, t_s - pre)
        return out

    k1, d1, p1, q1 = best(1, n)
    res = {(1, 1, n): (k1, d1, p1, q1)}
    for lo, hi in ((1, k1), (k1 + 1, n)):
        if hi > lo:
            res[(2, lo, hi)] = best(lo, hi)
    return res


def test_binseg_sql_matches_python_replica(spark):
    rng = random.Random(41)
    xs = [rng.randrange(0, 500) for _ in range(27)]
    # feed the template a synthetic events-like relation: x copies of a
    # purchase row per day (the SQL re-counts them)
    ev_rows = [
        (d, "purchase") for d, x in enumerate(xs) for _ in range(x)
    ] or [(0, "purchase")]
    spark.createDataFrame(
        ev_rows, "day bigint, event_type string"
    ).createOrReplaceTempView("binseg_fuzz")
    from icebergsql_spark.plans.pipeline16 import _BINSEG_SQL

    got = {
        (r["level"], r["seg_lo"], r["seg_hi"]): r
        for r in spark.sql(
            _BINSEG_SQL.format(day_expr="day", src="binseg_fuzz")
        ).collect()
    }
    # replica over the NONZERO-day series (days with count 0 produce no
    # daily row, matching the SQL's GROUP BY semantics)
    nz = [x for x in xs if x > 0]
    rep = _binseg_replica(nz)
    assert len(got) == len(rep)
    for (lv, lo, hi), (k, dev, pre, post) in rep.items():
        r = got[(lv, lo, hi)]
        assert r["split_k"] == k and r["dev_num"] == dev
        assert (r["pre_sum"], r["post_sum"]) == (pre, post)
