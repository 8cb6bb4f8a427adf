"""Round-9 wave operators: sliding-window HLL, synchronous Louvain
refinement, facility-location selection.

Each is locked against a pure-Python replica (bit-equality on real
fixture data) ahead of its pipeline11 gate registration, per the
pre-oracle contract: the gate's SQL oracle must match the same exact
recurrence these replicas encode.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from icebergsql_spark.operators.graph import louvain_gain_round
from icebergsql_spark.operators.similarity import facility_location_select
from icebergsql_spark.operators.sketch import (
    HLL_BITS,
    HLL_M,
    hll_sliding_estimate,
)


# ------------------------------------------------------------ sliding HLL --


def _py_registers(values):
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        reg = int(h[:2], 16)
        t = h[2:14].lstrip("0")
        if not t:
            rho = HLL_BITS + 1
        else:
            nib = int(t[0], 16)
            lead = (
                0 if nib >= 8 else 1 if nib >= 4 else 2 if nib >= 2 else 3
            )
            rho = (12 - len(t)) * 4 + lead + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _py_estimate(regs):
    m_used = len(regs)
    harmonic_q = sum(1 << (HLL_BITS + 1 - r) for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    raw = (
        alpha
        * HLL_M
        * HLL_M
        / ((harmonic_q / 2.0 ** (HLL_BITS + 1)) + (HLL_M - m_used))
    )
    if raw <= 2.5 * HLL_M and m_used < HLL_M:
        return round(HLL_M * math.log(HLL_M / (HLL_M - m_used)))
    return round(raw)


def test_hll_sliding_matches_python_replica(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(ev).select(
        "user_id", F.expr("ts DIV 86400000000000").alias("day")
    )
    got = {
        r["wday"]: (r["m_used"], r["harmonic_q"], r["est"])
        for r in hll_sliding_estimate(ev, "user_id", "day", 7).collect()
    }
    rows = ev.collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["user_id"])
    days = sorted(by_day)
    for d in days:
        vals = [
            v
            for dd in range(d - 6, d + 1)
            for v in by_day.get(dd, [])
        ]
        regs = _py_registers(vals)
        hq = sum(1 << (HLL_BITS + 1 - r) for r in regs.values())
        assert got[d] == (len(regs), hq, _py_estimate(regs)), d


def test_hll_sliding_partitioning_invariant(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(ev).select(
        "user_id", F.expr("ts DIV 86400000000000").alias("day")
    )
    a = hll_sliding_estimate(ev, "user_id", "day", 7).orderBy("wday")
    b = hll_sliding_estimate(
        ev.repartition(13, "user_id"), "user_id", "day", 7
    ).orderBy("wday")
    assert a.toPandas().equals(b.toPandas())


def test_hll_sliding_window_one_equals_daily(spark):
    """window_days=1 degenerates to the per-day estimate — each window
    holds exactly its own day's registers."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(ev).select(
        "user_id", F.expr("ts DIV 86400000000000").alias("day")
    )
    got = {
        r["wday"]: r["est"]
        for r in hll_sliding_estimate(ev, "user_id", "day", 1).collect()
    }
    rows = ev.collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["user_id"])
    for d, vals in by_day.items():
        assert got[d] == _py_estimate(_py_registers(vals)), d


# -------------------------------------------------------- Louvain round --


def _py_louvain_round(half, labels):
    sym = {}
    for a, b in half:
        sym.setdefault(a, []).append(b)
        sym.setdefault(b, []).append(a)
    m = len(half)
    k = {n: len(vs) for n, vs in sym.items()}
    tot = {}
    for n in sym:
        tot[labels[n]] = tot.get(labels[n], 0) + k[n]
    out = {}
    for n in sym:
        d = labels[n]
        nbr_c = {}
        for v in sym[n]:
            nbr_c[labels[v]] = nbr_c.get(labels[v], 0) + 1
        k_id = nbr_c.get(d, 0)
        best = None
        for c in sorted(cc for cc in nbr_c if cc != d):
            gain = 2 * m * (nbr_c[c] - k_id) - k[n] * (
                tot[c] - (tot[d] - k[n])
            )
            if best is None or gain > best[0]:
                best = (gain, c)
        if best is not None and best[0] > 0:
            out[n] = (d, best[1], best[0])
        else:
            out[n] = (d, d, 0)
    return out


def test_louvain_round_matches_python_replica(spark):
    # two 4-cliques joined by one bridge edge, seeded with a BAD split
    # that straddles the cliques — the round must repair it
    cliq1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cliq2 = [(i, j) for i in range(4, 8) for j in range(i + 1, 8)]
    half = cliq1 + cliq2 + [(3, 4)]
    labels = {n: n % 2 for n in range(8)}
    he = spark.createDataFrame(half, "a long, b long")
    lab = spark.createDataFrame(list(labels.items()), "n long, lbl long")
    got = {
        r["n"]: (r["lbl_old"], r["lbl_new"], r["gain_num"])
        for r in louvain_gain_round(he, lab).collect()
    }
    assert got == _py_louvain_round(half, labels)
    # at least one node moved (the seed split is strictly improvable)
    assert any(o != n for (o, n, _) in got.values())


def test_louvain_round_fuzz_random_graphs(spark):
    import random

    rng = random.Random(9)
    for trial in range(4):
        n = 14
        half = sorted(
            {
                (a, b)
                for a in range(n)
                for b in range(a + 1, n)
                if rng.random() < 0.3
            }
        )
        if not half:
            continue
        nodes = sorted({x for e in half for x in e})
        labels = {v: v % 3 for v in nodes}
        he = spark.createDataFrame(half, "a long, b long")
        lab = spark.createDataFrame(
            list(labels.items()), "n long, lbl long"
        )
        got = {
            r["n"]: (r["lbl_old"], r["lbl_new"], r["gain_num"])
            for r in louvain_gain_round(he, lab).collect()
        }
        assert got == _py_louvain_round(half, labels), trial


# ------------------------------------------------- facility location --


def test_facility_location_matches_python_replica(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [
        (r["rank"], r["vec_id"], r["coverage_gain"], r["coverage_total"])
        for r in facility_location_select(
            emb, query_id=1, k=4, candidates=10
        ).collect()
    ]
    # python replica over the exact same quantized sims
    from icebergsql_spark.operators.similarity import (
        dot_expr,
        with_double_vec_and_norm,
    )

    base = with_double_vec_and_norm(emb, "embedding")
    q = base.filter(F.col("vec_id") == 1).select(
        F.col("vd").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = (
        base.filter(F.col("vec_id") != 1)
        .crossJoin(F.broadcast(q))
        .withColumn(
            "rel_nano",
            F.floor(
                F.lit(1e9)
                * dot_expr("vd", "qv")
                / F.sqrt(F.col("nrm") * F.col("qn"))
            ).cast("bigint"),
        )
        .orderBy(F.desc("rel_nano"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "vd", "nrm")
    )
    a, b = cand.alias("a"), cand.alias("b")
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            F.floor(
                F.lit(1e9)
                * dot_expr("a.vd", "b.vd")
                / F.sqrt(F.col("a.nrm") * F.col("b.nrm"))
            )
            .cast("bigint")
            .alias("s"),
        )
        .collect()
    )
    ids = sorted(r["vec_id"] for r in cand.select("vec_id").collect())
    sim = {(i, i): 10**9 for i in ids}
    for r in pairs:
        sim[(r["ia"], r["ib"])] = r["s"]
        sim[(r["ib"], r["ia"])] = r["s"]
    covered = {u: 0 for u in ids}
    sel, expect = [], []
    while len(sel) < 4:
        best = None
        for cid in ids:
            if cid in sel:
                continue
            g = sum(max(covered[u], sim[(u, cid)]) - covered[u] for u in ids)
            if best is None or g > best[0]:
                best = (g, cid)
        g, cid = best
        sel.append(cid)
        for u in ids:
            covered[u] = max(covered[u], sim[(u, cid)])
        expect.append((len(sel), cid, g, sum(covered.values())))
    assert got == expect


def test_facility_location_monotone_submodular(spark):
    """Coverage totals are nondecreasing and marginal gains nonincreasing
    (submodularity of max-coverage) — the property the 1-1/e greedy
    guarantee rests on."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = facility_location_select(
        emb, query_id=2, k=6, candidates=16
    ).collect()
    gains = [r["coverage_gain"] for r in rows]
    totals = [r["coverage_total"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert totals == sorted(totals)


# ----------------------------------------------------------- audio VAD --


def test_audio_vad_segments_edges(spark):
    """Island grouping edge cases: all-silent doc (zero segments,
    first_active=-1), leading/trailing silence, single-frame islands,
    and a trailing PARTIAL frame (17 samples -> 2 frames)."""
    from icebergsql_spark.operators import multimodal

    import pandas as pd

    cases = {
        1: [0] * 64,                     # all silent: 4 frames, 0 active
        2: [0] * 16 + [100] * 16 + [0] * 16 + [5] * 16,  # two islands
        3: [7] * 17,                     # 2 frames incl. 1-sample tail
    }

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        multimodal.encode_wav(cases[int(d)], 8000)
                        for d in pdf["doc_id"]
                    ],
                }
            )

    docs = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    frames = multimodal.audio_frame_energy(blobs, frame_len=16)
    got = {
        r["doc_id"]: (
            r["n_frames"], r["n_active"], r["n_segments"],
            r["max_segment_len"], r["first_active_frame"],
        )
        for r in multimodal.audio_vad_segments(frames, threshold=0).collect()
    }
    assert got[1] == (4, 0, 0, 0, -1)
    assert got[2] == (4, 2, 2, 1, 1)   # frames 1 and 3 active, separated
    assert got[3] == (2, 2, 1, 2, 0)   # both frames active, one island


def test_audio_vad_threshold(spark):
    """Threshold splits on exact integer energy: a frame of sixteen 1s
    has energy 16 — threshold 15 keeps it, 16 drops it."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    docs = spark.createDataFrame([(1,)], "doc_id long")

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [multimodal.encode_wav([1] * 16, 8000)],
                }
            )

    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    frames = multimodal.audio_frame_energy(blobs, frame_len=16)
    keep = multimodal.audio_vad_segments(frames, threshold=15).collect()[0]
    drop = multimodal.audio_vad_segments(frames, threshold=16).collect()[0]
    assert keep["n_active"] == 1 and drop["n_active"] == 0


def test_image_ahash_nonsquare(spark):
    """decode_image returns (h, w, ch, px) — a non-square image locks
    the unpack order (a square fixture masks a swapped h/w)."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    w, h = 24, 16  # cells are 3x2 pixels on an 8x8 grid
    rgb = bytes((i * 7) % 256 for i in range(w * h * 3))

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [multimodal.encode_ppm(w, h, rgb)],
                }
            )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    got = multimodal.image_average_hash(blobs, grid=8).collect()[0]

    # pure-python replica straight from the byte formula
    gray = [[0] * w for _ in range(h)]
    for i in range(w * h * 3):
        p = i // 3
        gray[p // w][p % w] += (i * 7) % 256
    ch, cw = h // 8, w // 8
    cells = [
        sum(
            gray[r][c]
            for r in range(gy * ch, (gy + 1) * ch)
            for c in range(gx * cw, (gx + 1) * cw)
        )
        for gy in range(8)
        for gx in range(8)
    ]
    total = sum(cells)
    bits = [1 if cs * 64 > total else 0 for cs in cells]
    bands = [
        sum(bits[j * 16 + t] << t for t in range(16)) for j in range(4)
    ]
    assert (got["b0"], got["b1"], got["b2"], got["b3"]) == tuple(bands)
    assert got["popcount"] == sum(bits)


def test_image_dhash_nonsquare(spark):
    """dHash gradient bits from a pure-python replica on a non-square
    image (locks unpack order and the row-major bit layout)."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    w, h = 24, 16
    rgb = bytes((i * 13 + 5) % 256 for i in range(w * h * 3))

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [multimodal.encode_ppm(w, h, rgb)],
                }
            )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    got = multimodal.image_difference_hash(blobs, grid=8).collect()[0]

    gray = [[0] * w for _ in range(h)]
    for i in range(w * h * 3):
        p = i // 3
        gray[p // w][p % w] += (i * 13 + 5) % 256
    ch, cw = h // 8, w // 8
    cells = [
        [
            sum(
                gray[r][c]
                for r in range(gy * ch, (gy + 1) * ch)
                for c in range(gx * cw, (gx + 1) * cw)
            )
            for gx in range(8)
        ]
        for gy in range(8)
    ]
    bits = [
        1 if cells[r][c + 1] > cells[r][c] else 0
        for r in range(8)
        for c in range(7)
    ]
    bands = [
        sum(bits[j * 14 + t] << t for t in range(14)) for j in range(4)
    ]
    assert (got["b0"], got["b1"], got["b2"], got["b3"]) == tuple(bands)
    assert got["popcount"] == sum(bits)


# ------------------------------------------------------- sliding CMS --


def test_cms_sliding_matches_python_replica(spark):
    from icebergsql_spark.operators.sketch import (
        CMS_DEPTH,
        cms_sliding_estimate,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(ev).select(
        F.col("user_id").cast("string").alias("uid"),
        F.expr("ts DIV 86400000000000").alias("day"),
    )
    probes = ev.select("uid").distinct().orderBy("uid").limit(4)
    got = {
        (r["wday"], r["uid"]): r["cms_estimate"]
        for r in cms_sliding_estimate(
            ev, "uid", "day", probes, window_days=7
        ).collect()
    }

    rows = ev.collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["uid"])
    days = sorted(by_day)
    probe_ids = [r["uid"] for r in probes.collect()]

    def bucket(key, j):
        return int(
            hashlib.md5(f"{j}:{key}".encode()).hexdigest()[:2], 16
        )

    for d in days:
        vals = [
            v for dd in range(d - 6, d + 1) for v in by_day.get(dd, [])
        ]
        counters = {}
        for v in vals:
            for j in range(CMS_DEPTH):
                k = (j, bucket(v, j))
                counters[k] = counters.get(k, 0) + 1
        for pid in probe_ids:
            est = min(
                counters.get((j, bucket(pid, j)), 0)
                for j in range(CMS_DEPTH)
            )
            # the operator only emits probes whose buckets were hit
            assert got.get((d, pid), 0) == est or (
                (d, pid) not in got and est == 0
            ), (d, pid)


def test_cms_sliding_overestimates_exact(spark):
    """estimate >= exact windowed count — the structural CMS guarantee,
    held per (window, key)."""
    from icebergsql_spark.operators.sketch import cms_sliding_estimate

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    ev = events_ts_to_nanos(ev).select(
        F.col("user_id").cast("string").alias("uid"),
        F.expr("ts DIV 86400000000000").alias("day"),
    )
    probes = ev.select("uid").distinct().orderBy("uid").limit(6)
    est = {
        (r["wday"], r["uid"]): r["cms_estimate"]
        for r in cms_sliding_estimate(
            ev, "uid", "day", probes, window_days=7
        ).collect()
    }
    rows = ev.collect()
    by_day = {}
    for r in rows:
        by_day.setdefault(r["day"], []).append(r["uid"])
    for d in sorted(by_day):
        window = [
            v for dd in range(d - 6, d + 1) for v in by_day.get(dd, [])
        ]
        for r in probes.collect():
            exact = sum(1 for v in window if v == r["uid"])
            assert est.get((d, r["uid"]), 0) >= exact


def test_louvain_converge_stops_and_is_idempotent(spark):
    """louvain_converge runs until a round moves no node (bounded), and
    its final labels are a fixed point: replaying rounds from the
    pure-Python replica reaches the same labels in the same number of
    rounds."""
    from icebergsql_spark.operators.graph import louvain_converge

    cliq1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cliq2 = [(i, j) for i in range(4, 8) for j in range(i + 1, 8)]
    half = cliq1 + cliq2 + [(3, 4)]
    # nearly-correct seed: clique communities with ONE misplaced node —
    # it snaps back in round 1, round 2 observes zero movers.
    # (The n%2 seed OSCILLATES forever under synchronous moves — both
    # cliques swap labels every round — which is exactly why the
    # max_rounds bound exists; asserted below.)
    labels = {n: (0 if n < 4 else 1) for n in range(8)}
    labels[3] = 1
    he = spark.createDataFrame(half, "a long, b long")
    lab = spark.createDataFrame(list(labels.items()), "n long, lbl long")
    final, rounds_run = louvain_converge(he, lab, max_rounds=6)
    got = {r["n"]: r["lbl"] for r in final.collect()}

    # python replica of the converge loop, same stop rule
    py, py_rounds = dict(labels), 0
    for _ in range(6):
        moved = _py_louvain_round(half, py)
        py_rounds += 1
        py = {n: new for n, (_old, new, _g) in moved.items()}
        if all(old == new for (old, new, _g) in moved.values()):
            break
    assert got == py == {n: (0 if n < 4 else 1) for n in range(8)}
    assert rounds_run == py_rounds == 2
    # fixed point: one more round moves nobody
    moved = _py_louvain_round(half, py)
    assert all(o == n for (o, n, _g) in moved.values())

    # the oscillating seed hits the bound — never converges, stays exact
    lab2 = spark.createDataFrame(
        [(n, n % 2) for n in range(8)], "n long, lbl long"
    )
    _final2, rounds2 = louvain_converge(he, lab2, max_rounds=3)
    assert rounds2 == 3, "oscillating seed must run to the bound"


def test_image_dct_hash_matches_python_replica(spark):
    """pHash bits from a pure-python integer-DCT replica on a 32x32
    image (exercises the exact SUM pooling path down to 16x16) — locks
    the coefficient table, the axis orientation (u over rows, v over
    cols), the DC drop, and the band layout."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal
    from icebergsql_spark.operators.multimodal import dct_int_coefs

    w = h = 32
    rgb = bytes((i * 17 + 3) % 256 for i in range(w * h * 3))

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [multimodal.encode_ppm(w, h, rgb)],
                }
            )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    blobs = docs.mapInPandas(build, schema="doc_id bigint, payload binary")
    got = multimodal.image_dct_hash(blobs, size=16, block=8).collect()[0]

    # pure-python replica: gray, 2x2 SUM pool, integer DCT, sign bits
    gray = [[0] * w for _ in range(h)]
    for i in range(w * h * 3):
        p = i // 3
        gray[p // w][p % w] += (i * 17 + 3) % 256
    pooled = [
        [
            gray[2 * r][2 * c] + gray[2 * r][2 * c + 1]
            + gray[2 * r + 1][2 * c] + gray[2 * r + 1][2 * c + 1]
            for c in range(16)
        ]
        for r in range(16)
    ]
    C = dct_int_coefs(16, 8)
    bits = []
    for u in range(8):
        for v in range(8):
            d = sum(
                C[u][r] * pooled[r][c] * C[v][c]
                for r in range(16)
                for c in range(16)
            )
            bits.append(0 if (u == 0 and v == 0) or d <= 0 else 1)
    bands = [
        sum(bits[j * 16 + t] << t for t in range(16)) for j in range(4)
    ]
    assert (got["b0"], got["b1"], got["b2"], got["b3"]) == tuple(bands)
    assert got["popcount"] == sum(bits)
    # DC slot is always clear
    assert bands[0] % 2 == 0


def _py_wlouvain_round(half_w, labels):
    """half_w: {(a,b): w} with a <= b; a == b rows are self-loops."""
    sym = {}
    selfw = {}
    for (a, b), w in half_w.items():
        if a == b:
            selfw[a] = selfw.get(a, 0) + w
        else:
            sym.setdefault(a, []).append((b, w))
            sym.setdefault(b, []).append((a, w))
    nodes = set(sym) | set(selfw)
    m = sum(half_w.values())
    k = {
        n: sum(w for _v, w in sym.get(n, [])) + 2 * selfw.get(n, 0)
        for n in nodes
    }
    tot = {}
    for n in nodes:
        tot[labels[n]] = tot.get(labels[n], 0) + k[n]
    out = {}
    for n in nodes:
        d = labels[n]
        nbr_c = {}
        for v, w in sym.get(n, []):
            nbr_c[labels[v]] = nbr_c.get(labels[v], 0) + w
        k_id = nbr_c.get(d, 0)
        best = None
        for c in sorted(cc for cc in nbr_c if cc != d):
            gain = 2 * m * (nbr_c[c] - k_id) - k[n] * (
                tot[c] - (tot[d] - k[n])
            )
            if best is None or gain > best[0]:
                best = (gain, c)
        if best is not None and best[0] > 0:
            out[n] = (d, best[1], best[0])
        else:
            out[n] = (d, d, 0)
    return out


def test_weighted_louvain_round_fuzz(spark):
    """louvain_gain_round_weighted vs a pure-Python replica on random
    weighted graphs WITH self-loops and general (non-identity) labels."""
    import random

    from icebergsql_spark.operators.graph import louvain_gain_round_weighted

    rng = random.Random(23)
    for trial in range(4):
        n = 10
        half_w = {}
        for a in range(n):
            for b in range(a, n):
                if a == b:
                    if rng.random() < 0.4:
                        half_w[(a, b)] = rng.randrange(1, 6)
                elif rng.random() < 0.35:
                    half_w[(a, b)] = rng.randrange(1, 5)
        if not any(a != b for a, b in half_w):
            continue
        nodes = sorted({x for e in half_w for x in e})
        labels = {v: v % 3 for v in nodes}
        he = spark.createDataFrame(
            [(a, b, w) for (a, b), w in sorted(half_w.items())],
            "a long, b long, w long",
        )
        lab = spark.createDataFrame(
            list(labels.items()), "n long, lbl long"
        )
        got = {
            r["n"]: (r["lbl_old"], r["lbl_new"], r["gain_num"])
            for r in louvain_gain_round_weighted(he, lab).collect()
        }
        assert got == _py_wlouvain_round(half_w, labels), trial


def test_weighted_louvain_converge_stops_and_matches_replica(spark):
    """louvain_converge_weighted chains weighted rounds until a round
    moves no super-node (bounded), matching a pure-Python replay of the
    same stop rule; the oscillating seed runs to the bound."""
    from icebergsql_spark.operators.graph import louvain_converge_weighted

    # two weighted 3-cliques with self-loops, bridged by one light edge
    half_w = {
        (0, 1): 3, (0, 2): 3, (1, 2): 3, (0, 0): 2,
        (3, 4): 3, (3, 5): 3, (4, 5): 3, (5, 5): 1,
        (2, 3): 1,
    }
    labels = {n: (0 if n < 3 else 1) for n in range(6)}
    labels[2] = 1  # misplaced: snaps back round 1, round 2 sees 0 movers
    he = spark.createDataFrame(
        [(a, b, w) for (a, b), w in sorted(half_w.items())],
        "a long, b long, w long",
    )
    lab = spark.createDataFrame(list(labels.items()), "n long, lbl long")
    final, rounds_run = louvain_converge_weighted(he, lab, max_rounds=5)
    got = {r["n"]: r["lbl"] for r in final.collect()}

    py, py_rounds = dict(labels), 0
    for _ in range(5):
        moved = _py_wlouvain_round(half_w, py)
        py_rounds += 1
        py = {n: new for n, (_old, new, _g) in moved.items()}
        if all(old == new for (old, new, _g) in moved.values()):
            break
    assert got == py == {n: (0 if n < 3 else 1) for n in range(6)}
    assert rounds_run == py_rounds == 2
    # fixed point: one more replica round moves nobody
    moved = _py_wlouvain_round(half_w, py)
    assert all(o == n for (o, n, _g) in moved.values())

    # the alternating seed oscillates under synchronous moves -> bound
    lab2 = spark.createDataFrame(
        [(n, n % 2) for n in range(6)], "n long, lbl long"
    )
    _f2, rounds2 = louvain_converge_weighted(he, lab2, max_rounds=3)
    assert rounds2 == 3, "oscillating seed must run to the bound"


def test_image_dct_hash_canonical_dihedral_invariance(spark):
    """image_dct_hash_canonical emits the SAME canonical bands for an
    image and all 7 of its non-trivial dihedral transforms, while the
    plain bands differ across orientations of asymmetric content."""
    import numpy as np
    import pandas as pd

    from icebergsql_spark.operators.multimodal import (
        encode_ppm,
        image_dct_hash_canonical,
    )

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (16, 16, 3)).astype("uint8")
    imgs = [
        base,
        base[:, ::-1],            # hflip
        base[::-1, :],            # vflip
        base[::-1, ::-1],         # rot180
        base.transpose(1, 0, 2),  # transpose
        np.rot90(base),           # rot90
        np.rot90(base, 3),        # rot270
        base[::-1, ::-1].transpose(1, 0, 2),  # antitranspose
    ]
    blobs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(8)),
                "payload": [
                    encode_ppm(16, 16, np.ascontiguousarray(im).tobytes())
                    for im in imgs
                ],
            }
        )
    )
    rows = {
        r["doc_id"]: r
        for r in image_dct_hash_canonical(blobs).collect()
    }
    canon = {
        (r["b0"], r["b1"], r["b2"], r["b3"]) for r in rows.values()
    }
    assert len(canon) == 1, "canonical hash must be dihedral-invariant"
    plain = {
        (r["p0"], r["p1"], r["p2"], r["p3"]) for r in rows.values()
    }
    assert len(plain) > 1, "asymmetric content must vary the plain hash"
    # identity doc's plain popcount consistency: canonical popcount
    # belongs to the minimum variant, bounded by 63 AC bits
    assert 0 < rows[0]["popcount"] < 64
